"""Windowed feature library — all built-in window functions, zero Python.

Re-expresses the reference's window machinery declaratively:

- tumbling count windows (reference's batch loop, pystreamfs.py:59)
- lag/lead features
- backfill / forward fill (``last(col, ignorenulls=True)``)
- rolling row-frame aggregates
- strict-prefix (leakage-free) expanding aggregates — the frame equivalent
  of the reference's train-on-[0, i) rule (utils.py:44-45)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _w(entity_col: str, order_cols: tuple[str, ...]) -> WindowSpec:
    return Window.partitionBy(entity_col).orderBy(*[F.col(c) for c in order_cols])


def assign_count_windows(
    df: DataFrame,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx", "ts"),
    batch_size: int = 50,
    window_col: str = "window_id",
) -> DataFrame:
    """Tumbling count windows: window_id = floor((row_number − 1) / B)."""
    rn = F.row_number().over(_w(entity_col, order_cols))
    return df.withColumn(window_col, F.floor((rn - 1) / batch_size))


def with_lag_lead(
    df: DataFrame,
    cols: list[str],
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx", "ts"),
    offsets: tuple[int, ...] = (1,),
) -> DataFrame:
    """Append ``{col}_lag{k}`` / ``{col}_lead{k}`` for each col and offset."""
    w = _w(entity_col, order_cols)
    for c in cols:
        for k in offsets:
            df = df.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
            df = df.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return df


def backfill(
    df: DataFrame,
    cols: list[str],
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx", "ts"),
    suffix: str = "_ffill",
) -> DataFrame:
    """Forward-fill nulls with the latest non-null prior value per entity."""
    w = _w(entity_col, order_cols).rowsBetween(Window.unboundedPreceding, 0)
    for c in cols:
        df = df.withColumn(c + suffix, F.last(c, ignorenulls=True).over(w))
    return df


def rolling_agg(
    df: DataFrame,
    aggs: dict[str, Column],
    n_preceding: int,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx", "ts"),
    include_current: bool = True,
) -> DataFrame:
    """Rolling row-frame aggregates over the last ``n_preceding`` rows
    (plus the current row unless ``include_current=False``).

    ``aggs`` maps output column name → aggregate Column, e.g.
    ``{"v_sum5": F.sum("value")}``.
    """
    hi = 0 if include_current else -1
    w = _w(entity_col, order_cols).rowsBetween(-n_preceding, hi)
    for name, col in aggs.items():
        df = df.withColumn(name, col.over(w))
    return df


def strict_prefix_agg(
    df: DataFrame,
    aggs: dict[str, Column],
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx", "ts"),
) -> DataFrame:
    """Leakage-free expanding aggregates: frame = (unbounded preceding, −1),
    i.e. every row sees only strictly-prior rows of its entity — the exact
    point-in-time frame of the reference's training rule (utils.py:44-45).
    First row per entity gets NULL (empty frame)."""
    w = _w(entity_col, order_cols).rowsBetween(Window.unboundedPreceding, -1)
    for name, col in aggs.items():
        df = df.withColumn(name, col.over(w))
    return df
