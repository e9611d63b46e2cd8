"""Key-skew audit: the measurement that decides the scale knobs.

Every skew remedy in this engine — AQE skew-join splitting, the dedup
``max_bucket_size`` cap, the tfidf/ngram ``max_df`` stop-key cut, salting a
hot aggregation key — needs the same fact first: HOW skewed is the key?
``skew_audit`` answers it with one pass: per-key counts (map-side combined),
the top-N heaviest keys with their share of all rows, and summary factors
(max/mean ratio, share of the single heaviest key). Exact integers and
integer ratios — exact SQL oracle, no sampling.

At 100 TB this is one shuffle of O(distinct keys) partial counts; run it on
the join/group key BEFORE sizing a job, the same way the dedup audits run
next to the dedup pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_audit(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Top-``top_n`` heaviest keys with global skew context on every row:

    (key..., n, rank, share, n_rows, n_keys, skew_factor) where ``share`` =
    n / n_rows, ``skew_factor`` = n_max / mean-per-key = n_max · n_keys /
    n_rows (1.0 = perfectly uniform). Deterministic total order: count
    DESC, then the key columns ASC. The single-row global aggregate joins
    back as a broadcast — the per-key table never shuffles twice."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("__n_max"),
    )
    order = [F.col("n").desc(), *[F.col(c).asc() for c in key_cols]]
    # orderBy+limit is a parallel TakeOrdered (per-partition top-N, merged
    # on the driver) — a bare global rank window would funnel EVERY distinct
    # key through one task, the exact failure this audit exists to prevent.
    # The row_number window then runs over ≤ top_n rows only.
    top = (
        counts.orderBy(*order)
        .limit(top_n)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    )
    return top.crossJoin(F.broadcast(totals)).select(
        *key_cols,
        "n",
        F.col("rank").cast("int").alias("rank"),
        (F.col("n").cast("double") / F.col("n_rows").cast("double")).alias("share"),
        "n_rows",
        "n_keys",
        (
            F.col("__n_max").cast("double")
            * F.col("n_keys").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_factor"),
    )


def salt_key(id_col, n_salts: int) -> "F.Column":
    """Deterministic salt in [0, n_salts) from a row-unique column — the
    standard remedy once :func:`skew_audit` shows a hot key. Hash-based
    (no RNG): the same row always lands in the same salt bucket, so
    retries and resumed jobs stay deterministic."""
    return F.pmod(F.xxhash64(id_col, F.lit(0x5A17)), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple],
    id_col: str,
    n_salts: int = 16,
    verify_sample: float | None = None,
) -> DataFrame:
    """Two-phase aggregation over a skewed key: phase 1 groups by
    (key, salt) — the hot key's rows split across ``n_salts`` tasks —
    phase 2 merges the per-salt partials on the key alone (a tiny shuffle:
    n_keys × n_salts rows).

    ``aggs`` maps output column → (partial_fn, merge_fn, src_col), e.g.
    ``{"n": (F.count, F.sum, "value"), "v_sum": (F.sum, F.sum, "value"),
    "v_max": (F.max, F.max, "value")}`` — the algebraic decomposition the
    caller asserts. For Spark's own algebraic aggregates Catalyst already
    does map-side partial aggregation; use this form when the partial
    state itself is per-key heavy (distinct sub-key counts, collect-style
    states) or when a downstream window/group would pin the hot key into
    one task.

    ``verify_sample``: debug guard against a WRONG decomposition (which
    would otherwise silently produce wrong numbers — ADVICE r04). Pass a
    key-sampling fraction (e.g. 0.05) and the call EAGERLY runs the plain
    one-shot ``groupBy(keys).agg(partial_fn)`` on a deterministic
    hash-sampled key subset, compares it to the salted result on those
    keys (1e-6 relative tolerance — two-phase float sums differ from
    one-shot by FP ordering only), and raises ``ValueError`` on mismatch.
    Costs two extra jobs over the sampled keys; leave ``None`` in
    production plans."""
    salted = df.withColumn("__salt", salt_key(F.col(id_col), n_salts))
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[pf(F.col(src)).alias(out) for out, (pf, _mf, src) in aggs.items()]
    )
    result = phase1.groupBy(*key_cols).agg(
        *[mf(F.col(out)).alias(out) for out, (_pf, mf, _src) in aggs.items()]
    )
    if verify_sample is not None:
        if not 0.0 < verify_sample <= 1.0:
            raise ValueError(
                f"salted_agg: verify_sample must be in (0, 1], got {verify_sample}"
            )
        m = max(1, int(round(1.0 / verify_sample)))
        in_sample = (
            F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(0x7E57)), F.lit(m))
            == 0
        )
        direct = (
            df.where(in_sample)
            .groupBy(*key_cols)
            .agg(*[pf(F.col(src)).alias(out) for out, (pf, _mf, src) in aggs.items()])
        )
        joined = direct.alias("d").join(result.where(in_sample).alias("s"), key_cols, "full_outer")
        mismatch = F.lit(False)
        for out in aggs:
            dcol, scol = F.col(f"d.{out}"), F.col(f"s.{out}")
            tol_ok = (
                F.abs(dcol.cast("double") - scol.cast("double"))
                <= F.lit(1e-6)
                * F.greatest(F.abs(dcol.cast("double")), F.abs(scol.cast("double")), F.lit(1.0))
            )
            mismatch = mismatch | ~(dcol.eqNullSafe(scol) | F.coalesce(tol_ok, F.lit(False)))
        bad = joined.where(mismatch).limit(1).collect()
        if bad:
            raise ValueError(
                "salted_agg: decomposition failed identity check on sampled keys "
                f"(first offending row: {bad[0].asDict()}). The (partial_fn, "
                "merge_fn) pair in `aggs` is not a valid algebraic split of the "
                "intended aggregate."
            )
    return result
