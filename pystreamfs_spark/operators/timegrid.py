"""Time-grid resampling (gap filling): align an irregular event stream to a
fixed-interval grid per entity, carrying the last observation forward — the
standard regularization step before windowed feature extraction (the
reference's ``simulate_stream`` assumes a regular stream; this operator is
how a real event table becomes one).

Plan shape (100 TB): one per-entity min/max aggregate (map-side combined),
a ``sequence``+``explode`` grid fan-out (map-only — the grid is generated
next to the data, never joined in from a driver-side range), then ONE
window pass over the union of grid points and events ordered by time —
shuffled volume is O(events + grid points) on the entity key, no as-of
join, no per-entity collect. Grid density is the caller's lever: the
fan-out is bounded by (max_ts − min_ts)/interval per entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_last(
    df: DataFrame,
    interval_s: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per entity per ``interval_s`` grid step from the entity's
    first to last event (inclusive, epoch-aligned floor), with ``v_last`` =
    the latest observation at-or-before the grid instant. Deterministic:
    ties at the same timestamp resolve to the event (grid rows sort after
    events at the same instant), and among same-ts events the largest value
    wins (a total order both engines share).

    Output: (entity, grid_ts timestamp, v_last double).
    """
    if int(interval_s) < 1:
        # fail fast with a contract error instead of an opaque F.sequence
        # step-of-zero runtime failure deep inside the grid job (same
        # convention as pack_token_stream's context_len validation)
        raise ValueError(f"resample_last: interval_s must be >= 1, got {interval_s}")
    ep = F.unix_timestamp(F.col(ts_col))
    step = F.lit(int(interval_s))
    bounds = df.groupBy(entity_col).agg(
        (F.floor(F.min(ep) / step) * step).cast("long").alias("__t0"),
        (F.floor(F.max(ep) / step) * step).cast("long").alias("__t1"),
    )
    grid = bounds.select(
        entity_col,
        F.explode(F.sequence(F.col("__t0"), F.col("__t1"), step)).alias("__gt"),
    ).select(
        entity_col,
        F.col("__gt"),
        F.lit(None).cast("double").alias("__v"),
        F.lit(1).alias("__is_grid"),
    )
    # NULL-ts events are dropped: Spark orders NULLS FIRST ascending, so an
    # unfiltered NULL instant would poison the carry from before the
    # entity's first real event (and diverge from SQL engines that default
    # NULLS LAST). A timestamp-less observation has no place on a time grid.
    events = df.where(ep.isNotNull()).select(
        F.col(entity_col),
        ep.alias("__gt"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(0).alias("__is_grid"),
    )
    # one window pass: events first at equal instants, then grid markers read
    # the running last non-null value. Secondary __v ordering makes same-ts
    # duplicate events deterministic across engines.
    w = (
        Window.partitionBy(entity_col)
        .orderBy(F.col("__gt"), F.col("__is_grid"), F.col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = grid.unionByName(events).withColumn(
        "__last", F.last("__v", ignorenulls=True).over(w)
    )
    return merged.where(F.col("__is_grid") == 1).select(
        F.col(entity_col),
        F.timestamp_seconds(F.col("__gt")).alias("grid_ts"),
        F.col("__last").alias("v_last"),
    )
