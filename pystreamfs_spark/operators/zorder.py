"""Z-order (Morton) clustering keys: interleave the bits of several
columns so that sorting by ONE key keeps rows close in EVERY dimension —
the data-layout primitive behind lakehouse multi-dimensional clustering
(Delta's OPTIMIZE ZORDER BY, Iceberg's sort-order z-curves). Rows written
in z-key order concentrate any multi-dim range predicate into few files /
row groups, so min-max pruning skips most of a 100 TB table instead of
only pruning on the leading sort column.

No reference counterpart (north-rule superset — the reference has no
storage-layout surface at all).

Scale notes (100 TB):
- :func:`add_zorder_key` costs one tiny min/max aggregate (a single-row
  broadcast, the tfidf corpus-stats pattern) + a map-only key projection;
  the actual clustering is then ``repartitionByRange(zkey)`` + sorted
  write, which Spark executes as ONE range-partitioned shuffle — the same
  cost as any global sort, but paid once at layout time and amortized by
  every pruned read after.
- The interleave is a static ``bits × n_dims``-term integer expression
  (shift/mask/or), fully inside whole-stage codegen; no UDF, no explode.
- Bit budget: ``bits_per_dim × n_dims`` must fit a signed 64-bit long
  (<= 62 bits used, keeping the sign bit clear so z-key ORDER BY equals
  unsigned Morton order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(int_cols: list[Column], bits_per_dim: int = 16) -> Column:
    """Morton-interleave already-bucketed NONNEGATIVE integer columns:
    bit ``b`` of dimension ``i`` lands at output position ``b*n_dims + i``
    (dimension 0 owns the least-significant interleaved bit). Inputs are
    clamped to ``bits_per_dim`` bits (callers bucketize first — see
    :func:`add_zorder_key`). Pure shift/and/or over long arithmetic,
    identical in any ANSI engine."""
    d = len(int_cols)
    if d < 2:
        raise ValueError(f"interleave_bits: need >= 2 dims, got {d}")
    if bits_per_dim < 1 or bits_per_dim * d > 62:
        raise ValueError(
            f"interleave_bits: bits_per_dim*n_dims must be in [1, 62], "
            f"got {bits_per_dim}*{d}"
        )
    out = F.lit(0).cast("long")
    for i, c in enumerate(int_cols):
        v = c.cast("long")
        for b in range(bits_per_dim):
            # ((v >> b) & 1) << (b*d + i); python-int shift amounts keep
            # the plain pyspark shiftleft/shiftright wrappers usable
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, b).bitwiseAND(F.lit(1).cast("long")),
                    b * d + i,
                )
            )
    return out


def add_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_dim: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Append a z-order key over numeric columns: each column is linearly
    bucketized to ``[0, 2^bits_per_dim)`` against its own min/max (one
    single-row aggregate, broadcast with the plan) and the buckets are
    Morton-interleaved. Constant columns (min == max) bucketize to 0 via
    ``try_divide`` (ANSI-safe). NULLs bucketize to 0 — they sort first,
    like NULLS FIRST.

    Bucketization is plain IEEE double arithmetic in a fixed evaluation
    order (``floor((v - min) * (2^b - 1) / (max - min))``, clamped), so a
    SQL oracle replaying the same expression gets bit-identical keys.

    Layout usage: ``add_zorder_key(df, ["lat", "lon"]).repartitionByRange
    (n, "zkey").sortWithinPartitions("zkey").write...`` — after which
    min-max file pruning works for BOTH columns at once."""
    kmax = (1 << bits_per_dim) - 1
    stats = df.agg(
        *[
            x
            for c in cols
            for x in (
                F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            )
        ]
    )
    joined = df.crossJoin(F.broadcast(stats))
    buckets = []
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        v = F.col(c).cast("double")
        raw = F.floor(
            F.try_divide((v - lo) * F.lit(float(kmax)), hi - lo)
        )
        # coalesce BEFORE the clamp: Spark's least() SKIPS nulls, so
        # least(NULL, kmax) would be kmax, sending NULL/constant rows to
        # the top bucket instead of 0
        buckets.append(F.least(F.coalesce(raw, F.lit(0)), F.lit(kmax)).cast("long"))
    # bind the bucket expressions to real columns before interleave_bits
    # references each one bits_per_dim times (the shingles_from_tokens rule)
    bound = joined.select(
        *df.columns, *[b.alias(f"__zb_{i}") for i, b in enumerate(buckets)]
    )
    return bound.withColumn(
        key_col,
        interleave_bits(
            [F.col(f"__zb_{i}") for i in range(len(cols))], bits_per_dim
        ),
    ).drop(*[f"__zb_{i}" for i in range(len(cols))])


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits_per_dim: int = 16,
    key_col: str = "zkey",
    keep_key: bool = False,
) -> DataFrame:
    """Physically cluster rows on the z-curve: :func:`add_zorder_key` +
    ``repartitionByRange(n_partitions, zkey)`` + ``sortWithinPartitions`` —
    write the result and every multi-dim range predicate over ``cols``
    lands in few files (matching rows are z-contiguous, so parquet min/max
    footer pruning skips the rest without decompressing them).

    ONE range shuffle (sampled range bounds, the same cost as a global
    sort on one column) buys locality in EVERY listed dimension — this is
    the whole trade of lakehouse OPTIMIZE ZORDER BY. ``n_partitions``
    should target the post-write file size (~128 MB-1 GB each at scale);
    the clustering quality is independent of it.

    ``keep_key=False`` (default) drops the key after partitioning — the
    layout survives in row order, readers never see the helper column."""
    if n_partitions < 1:
        raise ValueError("n_partitions must be >= 1")
    if key_col in df.columns:
        # add_zorder_key would overwrite it and keep_key=False would then
        # DROP the user's column — silent data loss; make them rename
        raise ValueError(
            f"cluster_by_zorder: input already has a {key_col!r} column - "
            "pass a different key_col"
        )
    k = add_zorder_key(df, cols, bits_per_dim, key_col)
    out = k.repartitionByRange(n_partitions, key_col).sortWithinPartitions(key_col)
    return out if keep_key else out.drop(key_col)
