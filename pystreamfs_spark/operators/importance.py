"""Data-selection importance weighting — the DSIR recipe (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") re-expressed
as a pure DataFrame plan: score every raw-corpus document by how much more
likely its hashed n-gram bag is under a TARGET domain's distribution than
under the raw corpus's own.

    log_w(doc) = Σ_b c_doc(b) · [ ln p_target(b) − ln p_raw(b) ]

with hashed n-gram buckets b = xxhash64(gram) mod n_buckets and add-``s``
smoothed bucket probabilities p(b) = (count(b)+s) / (N + s·B). High log_w
means "looks like the target domain"; selection is a deterministic rank cut
composed downstream (operators/quality.py::percentile_band on ``avg_logw``,
or operators/budget.py::select_to_budget with ``logw`` as the score) — the
paper's Gumbel-noise resampling is a randomized tie-breaker we deliberately
replace with the engine-wide deterministic (score, id) total order.

No reference counterpart (north-rule superset, like quality.py). The ln is
transcendental, so the driver check is rows-only and correctness is pinned
by a NumPy parity test (the bm25 / unigram_lm contract).

Scale notes (100 TB):
- Raw-corpus grams are exploded ONCE into per-(doc, bucket) counts
  (map-side combined; shuffled volume O(distinct (doc, bucket)), and the
  bucket space is capped at n_buckets so the combine is dense).
- The bucket log-ratio table is <= n_buckets rows (default 10k) — built
  from two aggregates (target side O(target), a broadcast-sized eval/domain
  sample by assumption; raw side reuses the per-doc counts) and BROADCAST
  into the final join: the corpus is never shuffled on gram keys, so a
  stopword-grade hot bucket cannot skew the job.
- One final per-doc aggregate. No window, no collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pystreamfs_spark.operators.quality import _gram_table


def _bucket_table(df: DataFrame, text_col: str, id_col: str, n: int, n_buckets: int) -> DataFrame:
    """(id, bucket, c): occurrence counts of hashed n-gram buckets per doc."""
    return (
        _gram_table(df, text_col, id_col, n)
        .select(
            F.col(id_col),
            F.pmod(F.xxhash64("gram"), F.lit(n_buckets)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance log-weights of ``corpus`` toward
    ``target``. Output, one row per corpus document:

    - ``n_grams`` — the document's n-gram occurrence count (0 when the doc
      is shorter than n tokens);
    - ``logw``    — Σ_b c_doc(b)·(ln p_t(b) − ln p_r(b)) (0.0 for gramless
      docs: an empty product of likelihood ratios);
    - ``avg_logw`` — logw / n_grams, the length-normalized form that keeps
      long documents from dominating a rank cut (0.0 when gramless).

    ``smoothing`` must be > 0: buckets the target never saw would otherwise
    send ln p_t to -inf and veto a whole document on one n-gram."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if not smoothing > 0.0:
        raise ValueError("smoothing must be > 0 (unsmoothed ratios diverge)")
    s = float(smoothing)

    doc_counts = _bucket_table(corpus, text_col, id_col, n, n_buckets)
    raw = doc_counts.groupBy("bucket").agg(F.sum("c").alias("__cr"))
    tgt = (
        _bucket_table(target, text_col, id_col, n, n_buckets)
        .groupBy("bucket")
        .agg(F.sum("c").alias("__ct"))
    )
    raw_tot = raw.agg(F.sum("__cr").alias("__nr"))
    tgt_tot = tgt.agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__nt"))

    # every bucket the corpus can produce appears in `raw` (doc grams are a
    # subset of corpus grams), so raw LEFT JOIN target covers the join space;
    # target-absent buckets get the smoothed floor count
    sB = F.lit(s) * F.lit(float(n_buckets))
    ratio = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("__ct", F.lit(0)).cast("double") + F.lit(s))
                    / (F.col("__nt").cast("double") + sB)
                )
                - F.log(
                    (F.col("__cr").cast("double") + F.lit(s))
                    / (F.col("__nr").cast("double") + sB)
                )
            ).alias("__lr"),
        )
    )

    scored = (
        doc_counts.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c").cast("double") * F.col("__lr")).alias("logw"),
        )
    )
    return (
        corpus.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
            F.coalesce(
                F.col("logw") / F.nullif(F.col("n_grams"), F.lit(0)).cast("double"),
                F.lit(0.0),
            ).alias("avg_logw"),
        )
    )
