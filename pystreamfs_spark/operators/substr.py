"""Exact-substring deduplication (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better"): find — and optionally strip — every
token span of length >= k that occurs more than once in the corpus.

The reference paper builds one giant suffix array; the Spark-first
re-expression uses the k-gram seed property instead: a duplicated substring
of length >= k appears as a RUN OF CONSECUTIVE duplicated k-gram start
positions, so

  1. emit (doc, pos, gram) for every k-token gram           (map-only)
  2. keep grams occurring >= min_count times in the corpus  (one agg)
  3. join the flag back onto positions                      (one join)
  4. merge consecutive flagged positions into maximal spans (one window
     pass per doc: the classic gaps-and-islands ``pos - row_number()``
     grouping)

This finds exactly the maximal spans whose every k-window repeats somewhere
— the same spans the suffix array yields for duplicates of length >= k
(shorter repeats are invisible at either construction).

Scale notes (100 TB):
- Step 2 is a map-side-combined count over gram keys — shuffled volume
  O(distinct grams), and the HAVING cut discards the (vast) unique tail
  before anything joins.
- Step 3 shuffles positions on the gram key; a stop-gram hot key splits
  under AQE skew-join. The alternative single-shuffle plan
  (``collect_list(positions)`` per gram, then re-explode) was rejected: one
  boilerplate gram occurring 10^8 times would pin its whole position list
  in a single task, while the agg+join shape degrades gracefully.
- Step 4 shuffles only the FLAGGED positions on the doc key — for a
  typically-deduplicated corpus that is a few percent of tokens.
- The gram strings themselves are the join/agg keys so the DuckDB oracle
  is bit-exact; at 100 TB pass ``hash_grams=True`` to agg/join on
  ``xxhash64(gram)`` (8-byte keys, ~10x less shuffle bytes; collisions at
  2^-64 merge unrelated seeds — harmless for dedup, wrong for an audit).

No counterpart in the reference repo (it has no text surface); this is
north-rule superset territory alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pystreamfs_spark.functions.text import shingles_from_tokens, tokens


def _positional_grams(
    df: DataFrame, text_col: str, id_col: str, k: int, hash_grams: bool
) -> DataFrame:
    """(id, pos, gram) with 0-based token start positions; docs shorter than
    k tokens contribute no rows (a < k-token doc cannot hold a >= k-token
    duplicate span). Built by text.gram_rows (r06): positional explode +
    codegen concat_ws instead of the interpreted in-row shingle transform —
    identical rows, no HOF."""
    from pystreamfs_spark.functions.text import gram_rows

    # NULL text coalesces to '' (one empty token < k → no grams) rather than
    # poisoning size() with NULL arrays — chunk_by_tokens' rule
    src = df.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__txt")
    )
    out = gram_rows(src, "__txt", id_col, k, short_docs="drop")
    if hash_grams:
        out = out.withColumn("gram", F.xxhash64("gram"))
    return out


def duplicate_spans(
    df: DataFrame,
    k: int = 50,
    min_count: int = 2,
    cross_doc_only: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A position is a *seed* when its k-token gram occurs >= ``min_count``
    times corpus-wide (``cross_doc_only=True`` instead requires the gram in
    >= 2 distinct documents, exempting within-document repetition — that
    axis is ``quality.repetition_signals``'s job). Maximal runs of
    consecutive seeds become spans ``[span_start, span_end]`` (0-based
    token indices, inclusive).

    Output: (id, span_start, span_end, span_tokens, n_grams) — all BIGINT,
    so the DuckDB oracle compare is exact. ``span_tokens`` is the span
    length in tokens; ``n_grams`` the number of seed positions merged.
    """
    if k < 2:
        raise ValueError(f"duplicate_spans: k must be >= 2, got {k}")
    if min_count < 2:
        raise ValueError(f"duplicate_spans: min_count must be >= 2, got {min_count}")
    pg = _positional_grams(df, text_col, id_col, k, hash_grams)
    dup = pg.groupBy("gram").agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(F.col(id_col)).alias("__nd"),
    )
    flag = F.col("__nd") >= 2 if cross_doc_only else F.col("__n") >= min_count
    seeds = pg.join(dup.where(flag).select("gram"), "gram")
    # gaps-and-islands: consecutive positions share (pos - row_number()).
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = seeds.withColumn("__grp", F.col("pos") - F.row_number().over(w))
    return (
        runs.groupBy(id_col, "__grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + k).cast("long").alias("span_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
        .drop("__grp")
    )


def strip_duplicate_spans(
    df: DataFrame,
    k: int = 50,
    min_count: int = 2,
    cross_doc_only: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
) -> DataFrame:
    """Remove every duplicated span's tokens from each document (the Lee
    et al. 2022 treatment: cut the repeated bytes, keep the remainder —
    every occurrence is cut; which copy to spare is a policy layered on
    top via ``duplicate_spans`` + an exemption list).

    Spans are aggregated per doc into a (start, end) array (bounded by the
    doc's own token count), joined back, and tokens are dropped by index —
    one ``filter``+``exists`` pass over the token array, no Python. Tokens
    are rejoined with single spaces on the NORMALIZED token stream (the
    original whitespace inside a cut region is gone by construction).

    Output: (id, text_clean, n_tokens, n_tokens_removed).
    """
    spans = duplicate_spans(df, k, min_count, cross_doc_only, text_col, id_col, hash_grams)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = (
        df.select(
            F.col(id_col), tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__t")
        )
        .join(per_doc, id_col, "left")
        # bind the coalesce to a real column BEFORE the HOF lambda touches
        # it — Catalyst re-evaluates expression trees once per reference,
        # i.e. once per token element (see text.shingles_from_tokens)
        .withColumn(
            "__sp",
            F.coalesce(
                F.col("__spans"),
                F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
            ),
        )
    )
    indexed = F.transform(
        F.col("__t"), lambda x, i: F.struct(x.alias("x"), i.cast("long").alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("__sp"),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] <= sp["span_end"]),
        ),
    )
    return toks.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["x"]), " ").alias("text_clean"),
        F.size("__t").cast("long").alias("n_tokens"),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )
