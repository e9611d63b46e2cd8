"""Token-budget corpus selection: greedy highest-priority-first fill.

The "cut the corpus to the training budget" step of an LLM data pipeline:
rank documents by a priority score (quality, recency, a classifier logit),
walk the ranking in order, and keep documents while the running token
total fits the budget. One number in, a reproducible subset out.

The running total over the (score desc, id) order is a DISTRIBUTED prefix
sum in the same shape as :func:`pystreamfs_spark.operators.chunk.
pack_token_stream` — but bucketed on the SCORE range (the ordering key
here) instead of the id range: a tiny min/max aggregate cuts the score
range into ``n_buckets`` order-aligned buckets, the cumulative sum runs
partition-parallel within each bucket, and only the n_buckets-row
bucket-total table sees an ordered window before its prefix offsets
broadcast-join back. The serial step is O(n_buckets) rows at any scale —
never the single global window a naive ``SUM() OVER (ORDER BY score)``
would plan (WindowExec with no partition = the whole corpus through one
task). Bucket boundaries are float cuts of the score range, but the
result is bucket-invariant: the global order (bucket asc, score desc, id)
equals (score desc, id) because the bucket is a monotone function of the
score alone — equal scores always share a bucket.

Exact SQL oracle: integer token sums over a deterministic total order —
DuckDB's ``SUM() OVER (ORDER BY score DESC, id)`` computes the identical
cumulative values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_to_budget(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    mode: str = "strict",
    n_buckets: int = 256,
) -> DataFrame:
    """Keep the best-scoring documents whose cumulative token count fits
    ``budget``, walking (score desc, id asc). Output: the selected rows
    with an extra ``cum_tokens`` column (the running total INCLUDING the
    row, over the full ranking).

    ``mode="strict"`` keeps a row iff its running total is ≤ budget — the
    result never exceeds the budget. ``mode="overfill"`` keeps a row iff
    the total BEFORE it is < budget — the classic greedy fill where the
    boundary document is included and the result may overshoot by at most
    one document.

    NULL scores raise at execution time (a NULL has no rank position —
    same ANSI-style contract as ``pack_token_stream``'s NULL ids); NULL
    token counts consume 0 budget (coalesced, documented in the oracle
    too)."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if mode not in ("strict", "overfill"):
        raise ValueError(f"mode must be 'strict' or 'overfill', got {mode!r}")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from pyspark.sql import Window

    score = F.col(score_col).cast("double")
    toks = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))

    bounds = df.agg(
        F.min(score).alias("__lo"), F.max(score).alias("__hi")
    )
    # score-range bucket, ascending as score DESCENDS: floor((hi - s) / w).
    # w is max(range/n_buckets, tiny) so the all-equal-scores corpus
    # degrades to one bucket (correct, serial — documented) instead of a
    # divide-by-zero NULL.
    width = F.greatest(
        (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets)), F.lit(1e-300)
    )
    bucket = F.when(
        score.isNull(),
        F.raise_error(
            F.lit(
                "select_to_budget: NULL score - rows without a score have no "
                "rank position; filter or coalesce the score column first"
            )
        ).cast("int"),
    ).otherwise(
        F.least(
            F.floor((F.col("__hi") - score) / width).cast("int"),
            F.lit(n_buckets - 1),  # s == lo lands exactly on the edge
        )
    )
    with_b = (
        df.crossJoin(F.broadcast(bounds)).withColumn("__b", bucket).drop("__lo", "__hi")
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(score.desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = with_b.withColumn("__cum", F.sum(toks).over(w_in))
    totals = cum.groupBy("__b").agg(F.sum(toks).alias("__bt"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.select(
        "__b", F.coalesce(F.sum("__bt").over(w_b), F.lit(0)).alias("__pre")
    )
    out = cum.join(F.broadcast(prefix), "__b")
    running = (F.col("__pre") + F.col("__cum")).cast("long")
    if mode == "strict":
        keep = running <= F.lit(int(budget))
    else:
        keep = (running - toks) < F.lit(int(budget))
    return (
        out.where(keep)
        .withColumn("cum_tokens", running)
        .drop("__b", "__cum", "__pre")
    )
