"""Mergeable sketches: approximate distinct counts (HLL) and quantiles
(KLL) whose per-group summaries UNION into coarser groups without
rescanning the data — the hierarchical-rollup pattern (hourly → daily →
monthly → total) that exact aggregates cannot give you at 100 TB.

Why sketches and not exact: an exact COUNT(DISTINCT) must shuffle every
distinct key once per grouping level; a sketch is a few KB per group, built
in ONE scan with map-side partial aggregation, and every coarser level is a
metadata-only merge of child sketches (`hll_union_agg` /
`kll_sketch_merge_*`). Spark ships Apache DataSketches implementations
(`hll_sketch_agg`, Spark 3.5+), so the binary sketch columns persist to
Parquet and merge across jobs and days — the streaming/batch-unified
summary store.

Error model (asserted in tests): HLL relative standard error ≈
1.04 / sqrt(2^lg_k) (≈1.6% at the lg_k=12 default); KLL rank error ≈ 1.33%
at the default k=200. Estimates are deterministic for a given dataset (the
sketches hash values, no RNG) but engine-specific — no DuckDB oracle, so
driver queries are rows-only and correctness is pinned by error-bound and
merge-consistency tests against exact aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group HLL sketch + distinct estimate in one scan. Keep the
    binary ``sketch_col`` if coarser rollups are wanted (feed it to
    :func:`hll_rollup`); drop it for a plain approximate report."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    ).withColumn(estimate_col, F.hll_sketch_estimate(F.col(sketch_col)))


def hll_rollup(
    sketches: DataFrame,
    to_cols: list[str],
    sketch_col: str = "hll_sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge finer-grained HLL sketches up to ``to_cols`` WITHOUT touching
    the base data — a metadata-only union (each output sketch is a few KB).
    ``to_cols=[]`` yields the single grand-total row. Distinct counts are
    NOT additive across groups (members overlap); sketch union is the
    correct — and cheap — way to roll them up."""
    gb = sketches.groupBy(*to_cols) if to_cols else sketches.groupBy()
    return gb.agg(F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)).withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    )


def kll_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    k: int = 200,
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Per-group KLL quantile sketch with the requested quantiles
    materialized as ``q_<prob>`` columns. The binary sketch column rides
    along for :func:`kll_rollup`."""
    out = df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(sketch_col)
    )
    for p in probs:
        out = out.withColumn(
            f"q_{str(p).replace('.', '_')}",
            F.kll_sketch_get_quantile_double(F.col(sketch_col), F.lit(float(p))),
        )
    return out


def kll_rollup(
    sketches: DataFrame,
    to_cols: list[str],
    probs: list[float],
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Merge per-group KLL sketches to ``to_cols`` granularity and
    re-extract quantiles — again metadata-only, no rescan. (Exact
    percentiles are NOT mergeable at all; this is the only way to get
    hierarchical quantiles in one pass over the base data.)"""
    gb = sketches.groupBy(*to_cols) if to_cols else sketches.groupBy()
    # kll_sketch_merge_double is a BINARY scalar (unlike hll_union_agg), so
    # the group's sketches are collected (a few KB each, group-count many)
    # and folded pairwise; bind the list to a column before the lambda
    out = gb.agg(F.collect_list(F.col(sketch_col)).alias("__sks"))
    # try_element_at: an all-NULL-value group has an empty sketch list
    # (collect_list drops NULLs) — merge to a NULL sketch instead of an
    # ANSI INVALID_ARRAY_INDEX crash (Spark 4 ANSI mode is on)
    out = out.withColumn(
        sketch_col,
        F.aggregate(
            F.slice(F.col("__sks"), 2, F.greatest(F.size("__sks") - 1, F.lit(0))),
            F.try_element_at(F.col("__sks"), F.lit(1)),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ),
    ).drop("__sks")
    for p in probs:
        out = out.withColumn(
            f"q_{str(p).replace('.', '_')}",
            F.kll_sketch_get_quantile_double(F.col(sketch_col), F.lit(float(p))),
        )
    return out
