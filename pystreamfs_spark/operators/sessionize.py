"""Sessionization: gap-rule session ids per entity.

A new session starts when the gap to the previous event exceeds
``gap_seconds``. Pure window functions (two passes over one partition spec —
one shuffle, whole-stage codegen throughout); the streaming-mode equivalent
is ``F.session_window`` (see streaming/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: tuple[str, ...] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Append ``session_col``: 0-based session index within each entity.

    Ordering is by (ts, *order_cols) — pass tie-breaker columns for stable
    ordering when timestamps can collide.
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    # running sum of session starts − 1 → 0-based session id
    return df.withColumn(
        session_col,
        (F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("long"),
    )
