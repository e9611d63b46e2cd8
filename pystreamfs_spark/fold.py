"""Per-entity ordered stateful fold — the engine's one custom operator.

The reference threads one global weight vector through a strictly-ordered
window loop (/root/reference/pystreamfs/pystreamfs.py:59-69). The engine's
state scope is the entity (``conv_id``): parallel across conversations,
strictly ordered within one — the faithful transcript semantics AND the
scalability unlock (SURVEY.md §7).

Two physical strategies, identical results:

- :func:`fold_weights` — ``groupBy(conv_id).applyInPandas``: one Arrow call
  per conversation. Simple; materializes a whole conversation per call.
- :func:`fold_weights_stream` — ``repartitionByRange(conv_id) +
  sortWithinPartitions + mapInPandas``: a partition-local streaming scan that
  carries kernel state across Arrow batches. Memory is O(arrow batch +
  kernel state + current window), not O(conversation) — this is the 100 TB
  path (a 10⁹-turn conversation streams through one task without
  materializing).

Both do exactly one shuffle (hash vs range partition on conv_id); everything
upstream (featurization) and downstream (stability, joins) stays in
whole-stage codegen.
"""

from __future__ import annotations

import time
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pystreamfs_spark.classify import prequential_accuracy
from pystreamfs_spark.kernels import KERNELS, init_state, select_top_m, update

try:  # optional: per-worker USS memory metric (reference pystreamfs.py:74)
    import psutil  # type: ignore

    def _mem_bytes() -> int:
        return psutil.Process().memory_full_info().uss

except Exception:  # pragma: no cover - psutil absent in target env

    def _mem_bytes() -> int:
        return -1


def _rows_to_pdf(rows: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=[f.name for f in WEIGHTS_SCHEMA.fields])
    # np.datetime64 scalars in an object column confuse Arrow; normalize
    out["ts_end"] = pd.to_datetime(out["ts_end"])
    return out


WEIGHTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("window_id", LongType()),
        StructField("win_rows", LongType()),
        StructField("ts_end", TimestampType()),
        StructField("w", ArrayType(DoubleType())),
        StructField("selected", ArrayType(IntegerType())),
        StructField("acc", DoubleType()),
        StructField("train_rows", LongType()),
        StructField("elapsed_sec", DoubleType()),
        StructField("mem_bytes", LongType()),
    ]
)


def _fold_one_conv(
    conv_id: str,
    X: np.ndarray,
    y: np.ndarray,
    ts: np.ndarray,
    kernel: str,
    batch_size: int,
    num_features: int,
    kernel_kwargs: dict[str, Any],
    with_accuracy: bool,
    max_train_rows: int | None,
) -> list[tuple]:
    """Run the window loop for one fully-materialized conversation."""
    m = X.shape[1]
    state = init_state(kernel, m, num_features=num_features, **kernel_kwargs)
    out: list[tuple] = []
    n = X.shape[0]
    for wid, start in enumerate(range(0, n, batch_size)):
        stop = min(start + batch_size, n)
        t0 = time.perf_counter()
        state, w = update(kernel, state, X[start:stop], y[start:stop])
        selected = select_top_m(w, num_features)
        elapsed = time.perf_counter() - t0
        acc = None
        train_rows = 0
        if with_accuracy:
            acc = prequential_accuracy(X, y, start, stop, selected, max_train_rows=max_train_rows)
            train_rows = stop - start if start == 0 else start
        out.append(
            (
                conv_id,
                wid,
                stop - start,
                ts[stop - 1],
                w.tolist(),
                [int(j) for j in selected],
                acc,
                train_rows,
                elapsed,
                _mem_bytes(),
            )
        )
    return out


def fold_weights(
    df: DataFrame,
    kernel: str = "ofs",
    batch_size: int = 50,
    num_features: int = 5,
    kernel_kwargs: dict[str, Any] | None = None,
    with_accuracy: bool = False,
    max_train_rows: int | None = None,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx", "ts"),
    features_col: str = "features",
    label_col: str = "label",
    ts_col: str = "ts",
) -> DataFrame:
    """Grouped-map fold: one applyInPandas call per conversation.

    Input must have (entity_col, *order_cols, features array<double>,
    label double, ts timestamp). Output: one row per (conv_id, window_id)
    with the post-window weight vector, top-m selection and metrics.
    """
    if kernel not in KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}; available: {sorted(KERNELS)}")
    kk = dict(kernel_kwargs or {})
    order = list(order_cols)

    def fold_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        X = np.stack(pdf[features_col].to_numpy()).astype(np.float64, copy=False)
        y = pdf[label_col].to_numpy(dtype=np.float64)
        ts = pdf[ts_col].to_numpy()
        rows = _fold_one_conv(
            str(pdf[entity_col].iloc[0]),
            X,
            y,
            ts,
            kernel,
            batch_size,
            num_features,
            kk,
            with_accuracy,
            max_train_rows,
        )
        return _rows_to_pdf(rows)

    cols = [entity_col, *order, features_col, label_col]
    if ts_col not in cols:
        cols.append(ts_col)
    return df.select(*dict.fromkeys(cols)).groupBy(entity_col).applyInPandas(fold_fn, WEIGHTS_SCHEMA)


def fold_weights_stream(
    df: DataFrame,
    kernel: str = "ofs",
    batch_size: int = 50,
    num_features: int = 5,
    kernel_kwargs: dict[str, Any] | None = None,
    num_partitions: int | None = None,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx", "ts"),
    features_col: str = "features",
    label_col: str = "label",
    ts_col: str = "ts",
) -> DataFrame:
    """Partition-streaming fold: range-partition by entity, sort within
    partitions, then scan Arrow batches carrying kernel state across batch
    and conversation boundaries. Bounded memory per task regardless of
    conversation length (accuracy evaluation, which needs the full prefix,
    is deliberately unsupported here — use :func:`fold_weights`).
    """
    if kernel not in KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}; available: {sorted(KERNELS)}")
    kk = dict(kernel_kwargs or {})
    order = list(order_cols)
    cols = list(dict.fromkeys([entity_col, *order, features_col, label_col, ts_col]))

    cols_out = [f.name for f in WEIGHTS_SCHEMA.fields]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_conv: str | None = None
        state: Any = None
        wid = 0
        carry_X: np.ndarray | None = None  # incomplete-window rows carried over
        carry_y: np.ndarray | None = None
        out_rows: list[tuple] = []

        def run_windows(X: np.ndarray, y: np.ndarray, ts: np.ndarray, final: bool) -> None:
            """Consume full windows from (carry + X); keep any tail as carry
            unless ``final`` (conversation is ending → flush partial)."""
            nonlocal state, wid, carry_X, carry_y
            if carry_X is not None and len(carry_X):
                X = np.concatenate([carry_X, X]) if len(X) else carry_X
                y = np.concatenate([carry_y, y]) if len(y) else carry_y
                # ts only needed at window ends; pad carried rows with first ts
                ts = (
                    np.concatenate([np.repeat(ts[:1], len(carry_X)), ts])
                    if len(ts)
                    else np.repeat(_last_ts_holder[0:1], len(carry_X))
                )
                carry_X = carry_y = None
            n = len(X)
            start = 0
            while n - start >= batch_size or (final and start < n):
                stop = min(start + batch_size, n)
                t0 = time.perf_counter()
                new_state, w = update(kernel, state, X[start:stop], y[start:stop])
                state = new_state
                selected = select_top_m(w, num_features)
                out_rows.append(
                    (
                        cur_conv,
                        wid,
                        stop - start,
                        ts[stop - 1],
                        w.tolist(),
                        [int(j) for j in selected],
                        None,
                        0,
                        time.perf_counter() - t0,
                        _mem_bytes(),
                    )
                )
                wid += 1
                start = stop
            if start < n:
                carry_X, carry_y = X[start:].copy(), y[start:].copy()
                _last_ts_holder[0] = ts[-1]

        _last_ts_holder = np.empty(1, dtype="datetime64[us]")

        for pdf in batches:
            if not len(pdf):
                continue
            convs = pdf[entity_col].to_numpy()
            Xb = np.stack(pdf[features_col].to_numpy()).astype(np.float64, copy=False)
            yb = pdf[label_col].to_numpy(dtype=np.float64)
            tsb = pdf[ts_col].to_numpy()
            # segment the batch at conversation boundaries
            bounds = np.flatnonzero(convs[1:] != convs[:-1]) + 1
            segs = np.split(np.arange(len(pdf)), bounds)
            for seg in segs:
                conv = convs[seg[0]]
                if conv != cur_conv:
                    if cur_conv is not None and carry_X is not None:
                        run_windows(
                            np.empty((0, carry_X.shape[1])), np.empty(0), np.empty(0, dtype=tsb.dtype), final=True
                        )
                    cur_conv = conv
                    state = init_state(kernel, Xb.shape[1], num_features=num_features, **kk)
                    wid = 0
                run_windows(Xb[seg], yb[seg], tsb[seg], final=False)
            if out_rows:
                yield _rows_to_pdf(out_rows)
                out_rows = []
        if cur_conv is not None and carry_X is not None:
            run_windows(np.empty((0, carry_X.shape[1])), np.empty(0), np.empty(0, dtype="datetime64[us]"), final=True)
        if out_rows:
            yield _rows_to_pdf(out_rows)

    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    prepared = (
        df.select(*cols)
        .repartitionByRange(int(parts), entity_col)
        .sortWithinPartitions(entity_col, *order)
    )
    return prepared.mapInPandas(scan, WEIGHTS_SCHEMA)
