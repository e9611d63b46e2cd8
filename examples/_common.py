"""Shared harness for the example scripts — the engine analog of the
reference's examples/ (load a dense numeric CSV, stream it through a
feature-selection kernel with batch_size=50 / num_features=5, report
per-window accuracy, wall time and stability; reference
examples/example_ofs.py:14-36). Plots are out of scope (SURVEY §2.1 #10) —
the same quantities print as a run summary and remain available as
DataFrames via pystreamfs_spark.metrics.

Usage from any example: run_example("ofs") — optionally pass a CSV path on
the command line (first column = binary target, like the reference's
datasets/credit.csv). Without one, the script uses the reference CSV if
present, else a deterministic synthetic table of the same shape.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import numpy as np

REFERENCE_CSV = "/root/reference/datasets/credit.csv"


def _load_matrix(csv_path: str | None) -> tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    path = csv_path or (REFERENCE_CSV if os.path.exists(REFERENCE_CSV) else None)
    if path:
        arr = pd.read_csv(path).to_numpy(dtype=np.float64)
        return np.delete(arr, 0, axis=1), arr[:, 0]
    rng = np.random.default_rng(42)  # credit.csv-shaped stand-in: 965×23 + target
    X = rng.standard_normal((965, 23))
    y = (X[:, :5].sum(axis=1) + 0.5 * rng.standard_normal(965) > 0).astype(np.float64)
    return X, y


def run_example(kernel: str, kernel_kwargs: dict | None = None) -> None:
    from pyspark.sql import functions as F

    from pystreamfs_spark import get_spark
    from pystreamfs_spark.checkpoint import metrics_rows
    from pystreamfs_spark.fold import fold_weights
    from pystreamfs_spark.operators import fscr

    csv_path = sys.argv[1] if len(sys.argv) > 1 else None
    X, y = _load_matrix(csv_path)

    spark = get_spark(app_name=f"example_{kernel}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("stream", i, t0 + dt.timedelta(seconds=i), X[i].tolist(), float(y[i]))
        for i in range(len(y))
    ]
    stream = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, features array<double>, label double"
    )

    weights = fold_weights(
        stream, kernel=kernel, batch_size=50, num_features=5,
        kernel_kwargs=kernel_kwargs or {}, with_accuracy=True,
    ).cache()
    with_stability = fscr(weights, num_features=5)

    print(f"== {kernel.upper()} | rows={len(y)} m={X.shape[1]} batch=50 num_features=5 ==")
    with_stability.select(
        "window_id", "win_rows", F.round("acc", 4).alias("acc"),
        F.round("fscr", 2).alias("fscr"),
        F.round(F.col("elapsed_sec") * 1000, 3).alias("kernel_ms"),
        F.concat_ws(",", "selected").alias("selected"),
    ).orderBy("window_id").show(25, truncate=False)
    print("run averages (reference pystreamfs.py:95-98 analog):")
    metrics_rows(weights).show(truncate=False)
    spark.stop()
