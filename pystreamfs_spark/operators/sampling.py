"""Deterministic sampling and dataset splitting for training-data
pipelines — all pure column expressions (JVM-side, whole-stage codegen).

Everything here is HASH-based, not RNG-based, on purpose:

- **reproducible**: the assignment of a row depends only on its key (and a
  salt), never on partitioning, task order, or a sampler's RNG stream —
  re-running at any parallelism, any scale, any engine gives the same
  split. (``df.sample``/``sampleBy`` are partition-order-dependent and
  engine-specific, which is exactly what a 100 TB train/test split must
  not be.)
- **stable under growth**: adding new rows never moves an existing row to
  a different split — the property that keeps yesterday's held-out set
  held out after today's ingest.
- **portable**: md5-prefix arithmetic, identical in Spark and DuckDB, so
  every operator has an exact SQL oracle.

The hash bucket is the integer value of the first 8 md5 hex chars of
``salt || key`` modulo ``n_buckets`` — uniform to ~2^-32.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(
    key: Column, n_buckets: int = 10_000, salt: str = "", on_null: str = "error"
) -> Column:
    """Deterministic uniform bucket in [0, n_buckets) from a key column.

    NULL keys raise an ANSI-style contract error at execution time
    (default). A NULL would otherwise hash to a NULL bucket, which
    *silently* falls through every WHEN into the last-named split in
    :func:`hash_split` but vanishes entirely under the ``<`` filter in
    :func:`stratified_hash_sample` — two different corruptions of the
    held-out set (ADVICE r03). Pass ``on_null="keep"`` to propagate the
    NULL bucket instead and handle it yourself."""
    if on_null not in ("error", "keep"):
        raise ValueError("on_null must be 'error' or 'keep'")
    ks = key.cast("string")
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), ks)), 1, 8), 16, 10)
    b = h.cast("long") % n_buckets
    if on_null == "error":
        b = F.when(
            ks.isNull(),
            F.raise_error(
                F.lit(
                    "hash_bucket: NULL key - a NULL cannot be deterministically "
                    "bucketed; filter or coalesce the key column first "
                    "(or pass on_null='keep')"
                )
            ).cast("long"),
        ).otherwise(b)
    return b


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
    n_buckets: int = 10_000,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a named split (train/val/test/...) by hash bucket.

    ``fractions`` maps split name -> fraction, in priority order; they are
    quantized to whole buckets (with ``n_buckets=10_000`` the resolution is
    0.01%). The last split absorbs rounding so the buckets always
    partition. Map-only: no shuffle, no action, no RNG. NULL keys raise at
    execution time (see :func:`hash_bucket`) — they cannot be split
    deterministically.
    """
    if fractions is None:
        fractions = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not fractions or any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be a non-empty dict of non-negative floats")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    b = hash_bucket(F.col(key_col), n_buckets, salt)
    names = list(fractions)
    # cumulative integer thresholds; the final split takes the remainder
    expr = None
    cum = 0
    for name in names[:-1]:
        cum += round(fractions[name] * n_buckets)
        cond = b < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls under its stratum's quantized rate. The workhorse of
    corpus mixing (e.g. keep 100% of books, 10% of web, 1% of logs) —
    map-only, reproducible, and stable under corpus growth, unlike
    ``sampleBy``. Unlisted strata get ``default_rate``. NULL keys raise at
    execution time (see :func:`hash_bucket`) — they cannot be sampled
    deterministically.
    """
    if any(not (0.0 <= r <= 1.0) for r in rates.values()):
        raise ValueError("rates must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    b = hash_bucket(F.col(key_col), n_buckets, salt)
    thresh = None
    for stratum, rate in rates.items():
        t = F.lit(round(rate * n_buckets))
        cond = F.col(stratum_col) == stratum
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    default = F.lit(round(default_rate * n_buckets))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.where(b < thresh)


def mix_to_proportions(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Down-sample a multi-source corpus to target mixture proportions —
    the data-mixing step of a pretraining pipeline ("web:books:code at
    70:20:10"), with the per-source rates DERIVED from the targets rather
    than hand-supplied (contrast :func:`stratified_hash_sample`).

    The limiting source is the one most over-asked relative to its size:
    ``scale = min_s(count_s / weight_s)``. It is kept whole (rate 1.0);
    every other source keeps ``weight_s·scale / count_s`` of its rows, so
    the surviving corpus hits the target ratios at the largest total size
    achievable without upsampling. Selection is the engine's deterministic
    md5 rule quantized to whole buckets — reproducible, growth-stable, and
    expressible as an exact SQL oracle; realized counts deviate from the
    quantized targets only by the hash's binomial noise (~±√n per source).

    Sources absent from ``weights`` are dropped (the inner join *is* the
    filter). NULL keys raise (see :func:`hash_bucket`).

    Plan shape at 100 TB: one map-side-combined count per source (shuffle
    of n_sources rows), a scalar min over that tiny table, thresholds
    broadcast back, then a map-only hash filter over the corpus — the
    corpus itself is never shuffled, and nothing is collected to the
    driver."""
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive (drop a source by omitting it)")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in weights.items()], f"{source_col} string, __w double"
    )
    counts = df.groupBy(source_col).agg(F.count("*").alias("__cnt"))
    j = counts.join(F.broadcast(wdf), source_col)
    scale = j.agg(F.min(F.col("__cnt") / F.col("__w")).alias("__scale"))
    thr = (
        j.crossJoin(F.broadcast(scale))
        .select(
            source_col,
            # the limiting source's rate is exactly 1.0 only in real
            # arithmetic; w*scale/cnt in doubles can land at 0.999...,
            # silently dropping ~1/n_buckets of the source the docstring
            # promises to keep whole. Its __cnt/__w IS the double the min
            # picked, so the equality test is exact — clamp it to
            # n_buckets. Others: left-assoc double chain, written
            # identically in the SQL oracle.
            F.when(F.col("__cnt") / F.col("__w") == F.col("__scale"), F.lit(n_buckets))
            .otherwise(
                F.floor(F.col("__w") * F.col("__scale") / F.col("__cnt") * n_buckets)
            )
            .cast("long")
            .alias("__thr"),
        )
    )
    b = hash_bucket(F.col(key_col), n_buckets, salt)
    return df.join(F.broadcast(thr), source_col).where(b < F.col("__thr")).drop("__thr")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str = "doc_id",
    salt: str = "cap",
    n_salts: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by deterministic md5
    order — the per-domain document cap of web curation ("no single host
    may contribute more than N pages"), which bounds any one source's
    influence on the training mixture without an RNG.

    Selection order is ``(md5(salt || key), key)`` — uniform-random-like
    but reproducible at any parallelism and expressible as an exact SQL
    oracle (``ROW_NUMBER() OVER (PARTITION BY group ORDER BY md5 rule)``).
    Unlike the rate-based operators above, a cap is NOT growth-stable by
    nature: a newly ingested row with a smaller hash can displace a
    previous survivor — inherent to "at most N", not to this
    implementation.

    Plan shape at 100 TB: the default is one shuffle on the group plus a
    bounded per-group sort. A viral domain with 10^9 pages pins that sort
    into one task, so for skewed group sizes pass ``n_salts``: phase 1
    ranks within (group, hash-salt) and keeps ``cap`` per sub-group — the
    hot group's rows split across ``n_salts`` tasks — phase 2 re-ranks the
    ≤ cap·n_salts survivors per group. Exact for any top-N because the
    global top ``cap`` of a group is contained in the union of its
    per-salt top ``cap``'s; asserted equal to the one-phase plan in tests.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    key = F.col(key_col)
    order = F.md5(F.concat(F.lit(salt), key.cast("string")))
    cols = df.columns
    if n_salts is not None:
        if n_salts < 2:
            raise ValueError("n_salts must be >= 2 (or None for the one-phase plan)")
        sub = F.pmod(F.xxhash64(key.cast("string")), F.lit(n_salts))
        w1 = Window.partitionBy(F.col(group_col), sub).orderBy(order, key)
        df = df.withColumn("__rn1", F.row_number().over(w1)).where(
            F.col("__rn1") <= cap
        )
    w = Window.partitionBy(group_col).orderBy(order, key)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .select(*cols)
    )


def leakage_safe_split(
    df: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    fractions: dict[str, float] | None = None,
    salt: str = "split",
    n_buckets: int = 10_000,
    split_col: str = "split",
    component_col: str = "component",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across splits:
    rows are hash-split by their DUPLICATE-GROUP label, not their own id,
    so every member of a duplicate group lands in the same split — the
    standard fix for eval contamination via near-identical documents
    straddling the train/test boundary.

    ``edges`` is any duplicate-pair table (MinHash-LSH candidates, SimHash
    pairs, :func:`~pystreamfs_spark.operators.semdedup.semantic_dedup`
    edges); groups are their transitive closure via
    :func:`~pystreamfs_spark.operators.graph.connected_components`, labeled
    by MIN member id. Rows in no pair are their own group, so they receive
    EXACTLY the split :func:`hash_split` on ``id_col`` would give them —
    adding dedup evidence only ever moves actual duplicates, never
    reshuffles the clean corpus (asserted in tests).

    Output: the input rows + ``component_col`` + ``split_col``.

    Plan shape at 100 TB: CC runs over the duplicate-pair set (duplicate-
    sized, not corpus-sized, O(log d) rounds); the label join shuffles on
    the id; the split itself is the map-only deterministic md5 rule. NULL
    ids raise (see :func:`hash_bucket`)."""
    from pystreamfs_spark.operators.graph import connected_components

    comp = connected_components(edges, src=src, dst=dst)
    out = df.join(
        comp.select(F.col("id").alias(id_col), F.col("component").alias("__comp")),
        id_col,
        "left",
    ).withColumn(component_col, F.coalesce(F.col("__comp"), F.col(id_col))).drop("__comp")
    return hash_split(out, component_col, fractions, salt, n_buckets, split_col)
