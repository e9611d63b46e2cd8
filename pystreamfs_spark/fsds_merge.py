"""FSDS mergeable fast path — ``--fast-sketch`` (SURVEY.md §7, opt-in).

The exact FSDS fold is strictly ordered per entity: window t's sketch chains
off window t−1's (reference fsds.py:37). Frequent-Directions sketches are
*mergeable* (Ghashami et al.: shrink(svd([B₁|B₂])) approximates the sketch
of the concatenated data with additive error ‖A‖²_F/ℓ), which unlocks
parallelism INSIDE one giant conversation at the cost of exactness:

  Phase A (parallel over (entity, chunk)):  sketch each chunk of
      ``chunk_windows`` windows independently (ordered within the chunk).
  Phase B (per entity, cheap):  ordered prefix-merge of the chunk sketches —
      state is m×ℓ matrices, not rows, so this sequential pass is O(chunks)
      tiny SVDs.
  Phase C (parallel over (entity, chunk)):  re-fold each chunk's windows
      seeded with the merged prefix sketch of all PRIOR chunks → per-window
      weight vectors at full granularity.

Exactness: with a single chunk the prefix is empty and the result is
bit-identical to the exact fold (tested); with multiple chunks, per-window
weights are approximate because the prefix is a merged sketch rather than
the reference's raw hstack chain. Use the exact fold when allclose parity
matters; use this when one conversation holds a cluster's worth of turns.
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pystreamfs_spark.kernels.base import select_top_m
from pystreamfs_spark.kernels.fsds import FSDSState, fsds_update
from pystreamfs_spark.operators.windows import assign_count_windows

_SKETCH_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("chunk", LongType()),
        StructField("sketch", BinaryType()),
    ]
)

_PREFIX_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("chunk", LongType()),
        StructField("prefix", BinaryType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("window_id", LongType()),
        StructField("win_rows", LongType()),
        StructField("w", ArrayType(DoubleType())),
        StructField("selected", ArrayType(IntegerType())),
    ]
)


def _sketch_update(B: np.ndarray | None, Yt: np.ndarray, ell: int) -> np.ndarray:
    """One FD hstack+svd+shrink step WITHOUT the ridge/weights tail — phase A
    only needs the sketch, and skipping the weights step avoids the
    reference's s[k−1] indexing on degenerate (few-column) windows."""
    if B is None or B.size == 0:
        C = Yt
    else:
        C = np.hstack((B, Yt))
    U, s, _ = np.linalg.svd(C, full_matrices=False)
    U = U[:, :ell]
    s = s[:ell]
    with np.errstate(invalid="ignore"):
        s = np.sqrt(s**2 - s[-1] ** 2)
    s = np.nan_to_num(s)
    return np.dot(U, np.diag(s))


def _merge_sketches(B1: np.ndarray | None, B2: np.ndarray, ell: int) -> np.ndarray:
    """FD merge: treat B2's columns as a batch appended to sketch B1 —
    the same hstack+svd+shrink step the per-window update performs."""
    C = B2 if B1 is None or B1.size == 0 else np.hstack((B1, B2))
    U, s, _ = np.linalg.svd(C, full_matrices=False)
    U = U[:, :ell]
    s = s[:ell]
    with np.errstate(invalid="ignore"):
        s = np.sqrt(s**2 - s[-1] ** 2)
    s = np.nan_to_num(s)
    return np.dot(U, np.diag(s))


def fold_fsds_fast(
    df: DataFrame,
    batch_size: int = 50,
    num_features: int = 5,
    k: int = 2,
    ell: int = 0,
    chunk_windows: int = 8,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx", "ts"),
    features_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """Approximate FSDS per-window weights with intra-entity parallelism.
    Output: (conv_id, window_id, win_rows, w, selected)."""
    order = list(order_cols)
    win = assign_count_windows(
        df.select(entity_col, *order, features_col), entity_col=entity_col,
        order_cols=order_cols, batch_size=batch_size,
    ).withColumn("chunk", F.floor(F.col("window_id") / chunk_windows))

    # NOTE: eager action at plan-build time — one head(1) job to learn the
    # feature width m (the array length is not in the schema). Cost: one
    # tiny job before the transformation is assembled.
    head = df.select(features_col).head(1)
    if not head or head[0][0] is None:
        raise ValueError(
            f"fold_fsds_fast: input has no rows (or null {features_col!r}) — "
            "cannot infer the feature width m"
        )
    sample_m = len(head[0][0])
    resolved_ell = ell if ell >= 1 else int(np.sqrt(sample_m))
    FSDSState.init(sample_m, k=k, ell=ell)  # surface the ell>=k contract early

    def sketch_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        X = np.stack(pdf[features_col].to_numpy()).astype(np.float64, copy=False)
        B = None
        for s in range(0, len(X), batch_size):
            B = _sketch_update(B, X[s : s + batch_size].T, resolved_ell)
        return pd.DataFrame(
            [(str(pdf[entity_col].iloc[0]), int(pdf["chunk"].iloc[0]), pickle.dumps(B))],
            columns=["conv_id", "chunk", "sketch"],
        )

    sketches = win.groupBy(entity_col, "chunk").applyInPandas(sketch_chunk, _SKETCH_SCHEMA)

    def prefix_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk")
        out = []
        prefix: np.ndarray | None = None
        for _, row in pdf.iterrows():
            out.append((row["conv_id"], int(row["chunk"]), pickle.dumps(prefix)))
            B = pickle.loads(row["sketch"])
            prefix = _merge_sketches(prefix, B, resolved_ell)
        return pd.DataFrame(out, columns=["conv_id", "chunk", "prefix"])

    prefixes = sketches.groupBy("conv_id").applyInPandas(prefix_scan, _PREFIX_SCHEMA)

    joined = win.join(
        F.broadcast(prefixes.withColumnRenamed("conv_id", entity_col)), [entity_col, "chunk"]
    )

    def refold_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        X = np.stack(pdf[features_col].to_numpy()).astype(np.float64, copy=False)
        wids = pdf["window_id"].to_numpy()
        prefix = pickle.loads(pdf["prefix"].iloc[0])
        state = FSDSState.init(X.shape[1], k=k, ell=ell)
        if prefix is not None:
            state.B = prefix
            state.ell = resolved_ell
        out = []
        start = 0
        while start < len(X):
            stop = min(start + batch_size, len(X))
            state, w = fsds_update(state, X[start:stop])
            sel = select_top_m(w, num_features)
            out.append(
                (
                    str(pdf[entity_col].iloc[0]),
                    int(wids[start]),
                    stop - start,
                    w.tolist(),
                    [int(j) for j in sel],
                )
            )
            start = stop
        return pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])

    return joined.groupBy(entity_col, "chunk").applyInPandas(refold_chunk, _OUT_SCHEMA)
