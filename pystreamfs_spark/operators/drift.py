"""Distribution-drift detection: the two-sample Kolmogorov–Smirnov
statistic between two slices of a numeric column — the classic
nonparametric "did this feature's distribution move?" test behind data
drift monitors. The reference's whole domain is feature selection under
concept drift (pystreamfs/algorithms/mcnn.py drives cluster death /
re-selection off detected drift); this operator surfaces the drift
measurement itself as a relational primitive, per the north rule's
superset mandate (the reference exposes no drift statistic API).

KS = max over the merged sample of |F̂_a(v) − F̂_b(v)|, where F̂ is the
empirical CDF. Everything up to the final division is exact integer
arithmetic (per-value counts, cumulative sums), and the division / abs /
max are order-independent IEEE double ops — so a SQL oracle replaying the
same expressions is bit-identical (unlike sum-of-doubles statistics, a
MAX of exact divisions has no reassociation hazard).

Scale notes (100 TB):
- One groupBy(value) count (shuffle O(distinct values), map-side combined)
  collapses the data to the distinct-value relation before any ordering.
  Four branches reference that counts frame (cumsum, axis bounds, bucket
  totals, sample sizes); its exchange is identical in each, so runtime
  exchange reuse computes it ONCE (ReusedExchange in the executed plan —
  asserted in test_plans) and the raw table is scanned once.
- The cumulative count is a DISTRIBUTED prefix sum, not one global window
  (which would serialize every distinct value through a single task): the
  value range is cut into ``n_buckets`` order-aligned range buckets (one
  single-row min/max broadcast), cumsums run partition-parallel within
  buckets, and only the n_buckets-row bucket-total table sees an ordered
  window before broadcasting back — the pack_token_stream pattern
  (operators/chunk.py:56).
- The result is a single row; nothing is collected driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _usable(v: Column) -> Column:
    """NULL *and NaN* have no position on the value axis: isNotNull()
    passes NaN, and one NaN poisons the min/max bounds (every bucket
    expression goes NaN -> floor NaN -> one bucket), silently collapsing
    the statistic. Exclude both up front."""
    return v.isNotNull() & ~F.isnan(v.cast("double"))


def _equal_width_bucket(v: Column, lo: Column, hi: Column, n: int) -> Column:
    """Equal-width bin index over [lo, hi] — floor of a monotone map, so
    bucket(v1) <= bucket(v2) whenever v1 <= v2 (order-aligned: a bucket
    prefix + within-bucket cumsum IS the global cumsum). Constant axis
    (hi == lo) lands everything in bucket 0 via try_divide/coalesce; the
    top edge clamps to n-1. Shared by ks_2sample and psi — fix bucket
    semantics HERE, once."""
    return F.least(
        F.coalesce(
            F.floor(F.try_divide((v.cast("double") - lo) * n, hi - lo)),
            F.lit(0),
        ),
        F.lit(n - 1),
    ).cast("int")


def ks_2sample(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    slice_a,
    slice_b,
    n_buckets: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sample KS statistic between the rows where ``slice_col`` equals
    ``slice_a`` vs ``slice_b``. Returns ONE row (ks double, n_a bigint,
    n_b bigint) — or one row per group when ``group_cols`` is given (the
    production monitoring shape: every feature/source/day pair scored in
    a single pass; the value axis is bucketized per group against that
    group's own min/max). NULL and NaN values are excluded from both
    samples (neither has a position on the value axis); an empty side
    yields ks = NULL via try_divide — test for it rather than crashing a
    monitoring job.

    Ties are handled exactly: both CDFs step at each distinct value by
    that value's full count, which is the correct KS treatment of tied
    observations."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if slice_a == slice_b:
        raise ValueError("slice_a and slice_b must differ")
    g = list(group_cols or [])

    v = F.col(value_col)
    s = F.col(slice_col)
    base = df.where(_usable(v) & s.isin([slice_a, slice_b]))
    counts = base.groupBy(*g, v.alias("__v")).agg(
        F.sum(F.when(s == slice_a, 1).otherwise(0)).cast("long").alias("__ca"),
        F.sum(F.when(s == slice_b, 1).otherwise(0)).cast("long").alias("__cb"),
    )

    bounds = counts.groupBy(*g).agg(
        F.min("__v").cast("double").alias("__lo"),
        F.max("__v").cast("double").alias("__hi"),
    )
    bucket = _equal_width_bucket(
        F.col("__v"), F.col("__lo"), F.col("__hi"), n_buckets
    )
    joined_bounds = (
        counts.join(F.broadcast(bounds), g) if g else counts.crossJoin(F.broadcast(bounds))
    )
    with_b = joined_bounds.withColumn("__b", bucket).drop("__lo", "__hi")

    w_in = (
        Window.partitionBy(*g, "__b")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = with_b.withColumn("__cum_a", F.sum("__ca").over(w_in)).withColumn(
        "__cum_b", F.sum("__cb").over(w_in)
    )
    totals = cum.groupBy(*g, "__b").agg(
        F.sum("__ca").alias("__ta"), F.sum("__cb").alias("__tb")
    )
    # the only ordered step: n_groups × n_buckets rows (per-group when
    # grouped — partitionBy keeps it parallel across groups)
    w_b = (
        Window.partitionBy(*g).orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
        if g
        else Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = totals.select(
        *g,
        "__b",
        F.coalesce(F.sum("__ta").over(w_b), F.lit(0)).alias("__pre_a"),
        F.coalesce(F.sum("__tb").over(w_b), F.lit(0)).alias("__pre_b"),
    )
    # totals come from the already-aggregated counts frame — a second
    # scan of the raw data would double the dominant cost for the same
    # integers (the psi implementation and the SQL oracle do the same)
    n = counts.groupBy(*g).agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum("__cb").cast("long").alias("n_b"),
    )
    withpre = cum.join(F.broadcast(prefix), g + ["__b"])
    joined = withpre.join(F.broadcast(n), g) if g else withpre.crossJoin(F.broadcast(n))
    cdf_a = F.try_divide(
        (F.col("__pre_a") + F.col("__cum_a")).cast("double"),
        F.col("n_a").cast("double"),
    )
    cdf_b = F.try_divide(
        (F.col("__pre_b") + F.col("__cum_b")).cast("double"),
        F.col("n_b").cast("double"),
    )
    return joined.groupBy(*g).agg(
        F.max(F.abs(cdf_a - cdf_b)).alias("ks"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )


def psi(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    slice_a,
    slice_b,
    n_bins: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Population Stability Index between two slices — the industry
    monitoring score (rule of thumb: < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted): equal-width bins over the COMBINED value range (both
    slices share one axis, or the comparison is meaningless), add-one
    (Laplace) smoothing so empty bins stay finite WITHOUT an arbitrary
    epsilon — p = (count+1)/(n+n_bins), all-integer until the division —
    then PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b).

    ln is transcendental (engine-specific last-ulp), so this is a
    rows-only driver check like BM25/DSIR — but the arithmetic is pinned:
    the per-bin terms are summed by a deterministic ascending-bin fold
    (sort_array + aggregate over ≤ n_bins elements), never a
    reassociating SUM, so the result is bit-stable run to run and matches
    a Python reference iterating bins in order to ~1 ulp (JVM Math.log vs
    libm log may differ in the last bit; everything else is exact).

    Returns (psi double, n_a bigint, n_b bigint), one row per group (or
    one row total). NULL and NaN values excluded (one NaN would poison
    the min/max axis and collapse every bin). An EMPTY side yields
    psi = NULL like ks_2sample — Laplace smoothing would otherwise score
    slice_a against a uniform distribution and report a plausible finite
    "drift" for a misconfigured slice label. Scale shape: one groupBy
    histogram (shuffle O(groups × n_bins)) after a broadcast bounds join —
    the data is never re-shuffled or collected."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    if slice_a == slice_b:
        raise ValueError("slice_a and slice_b must differ")
    g = list(group_cols or [])

    v = F.col(value_col)
    s = F.col(slice_col)
    base = df.where(_usable(v) & s.isin([slice_a, slice_b]))
    bounds = base.groupBy(*g).agg(
        F.min(v.cast("double")).alias("__lo"), F.max(v.cast("double")).alias("__hi")
    )
    wb = base.join(F.broadcast(bounds), g) if g else base.crossJoin(F.broadcast(bounds))
    bin_ = _equal_width_bucket(v, F.col("__lo"), F.col("__hi"), n_bins)
    hist = wb.groupBy(*g, bin_.alias("__bin")).agg(
        F.sum(F.when(s == slice_a, 1).otherwise(0)).cast("long").alias("__ca"),
        F.sum(F.when(s == slice_b, 1).otherwise(0)).cast("long").alias("__cb"),
    )
    n = hist.groupBy(*g).agg(
        F.sum("__ca").alias("n_a"), F.sum("__cb").alias("n_b")
    )
    # full bin grid: a bin empty in BOTH slices still contributes under
    # Laplace smoothing whenever n_a != n_b — left-join the histogram
    # onto groups × [0, n_bins) and zero-fill
    grid = n.withColumn("__bin", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))))
    j = (
        grid.join(hist, g + ["__bin"], "left")
        .withColumn("__ca", F.coalesce("__ca", F.lit(0)))
        .withColumn("__cb", F.coalesce("__cb", F.lit(0)))
    )
    pa = F.try_divide(
        (F.col("__ca") + 1).cast("double"), (F.col("n_a") + n_bins).cast("double")
    )
    pb = F.try_divide(
        (F.col("__cb") + 1).cast("double"), (F.col("n_b") + n_bins).cast("double")
    )
    term = (pa - pb) * F.ln(F.try_divide(pa, pb))
    per_bin = j.select(*g, F.col("__bin"), term.alias("__term"), "n_a", "n_b")
    # deterministic ascending-bin fold, not a reassociating SUM
    folded = per_bin.groupBy(*g).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(F.col("__bin"), F.col("__term")))),
            F.lit(0.0),
            lambda acc, x: acc + x["__term"],
        ).alias("__psi"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
    return folded.select(
        *g,
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("__psi")).alias("psi"),
        "n_a",
        "n_b",
    )
