"""Corpus-level term weighting (TF-IDF) — pure DataFrame plans.

Shape at 100 TB: the token explode + per-doc tf aggregate runs at most
TWICE (once for the tf side, once under the document-frequency aggregate —
dfreq shuffles on a different key, so Catalyst's ReuseExchange cannot
dedupe the subtrees; a window over the token would compute it once but
buffers a stopword's whole corpus-sized group in one task, the same trade
rejected in ngram_jaccard). Both passes are map-side-combined, so shuffled
volume is O(distinct (doc,token)) and O(distinct token), never
O(occurrences). The tf–dfreq equi-join is AQE-skew-splittable
(stopword-grade tokens are the classic skew keys — pass ``max_df`` to cut
them before the join, same recipe as the dedup stop-shingle cut), and the
corpus size joins as a single-row broadcast. No Python, no window over the
whole corpus, no collect. Plan budget asserted in test_plans.

Two idf weightings:

- ``idf="ln"`` (default): sklearn's smooth idf, ``ln((1+N)/(1+df)) + 1``.
  The natural log is transcendental — bit-identity across engines is NOT
  guaranteed (JVM ``Math.log`` vs libm may differ in the last ulp), so
  ln-weighted scores are for in-engine use and allclose tests.
- ``idf="ratio"``: plain rarity ratio ``N/df`` — two exact integer casts
  and one IEEE division, bit-identical in any engine, so driver queries
  and SQL oracles use this mode for exact-hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pystreamfs_spark.functions.text import tokens


def term_frequencies(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, token, tf): occurrence counts of each token per document."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    return tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf: str = "ln",
    max_df: int | None = None,
) -> DataFrame:
    """Per (doc, token) TF-IDF scores.
    Output: (id, token, tf, doc_freq, score). ``max_df`` drops tokens
    appearing in more than max_df documents BEFORE the join — the skew cut
    for stopword-grade keys."""
    if idf not in ("ln", "ratio"):
        raise ValueError("idf must be 'ln' or 'ratio'")
    tf = term_frequencies(df, text_col, id_col)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("doc_freq") <= max_df)
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    joined = tf.join(dfreq, "token").crossJoin(F.broadcast(n_docs))
    if idf == "ln":
        w = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("doc_freq"))) + 1.0
    else:
        w = F.col("n_docs").cast("double") / F.col("doc_freq").cast("double")
    return joined.select(
        F.col(id_col),
        "token",
        "tf",
        "doc_freq",
        (F.col("tf").cast("double") * w).alias("score"),
    )


def bm25(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
) -> DataFrame:
    """Per (doc, token) Okapi BM25 weights — the retrieval-grade scorer the
    ln-idf TF-IDF approximates. Same plan shape as :func:`tf_idf` plus one
    more single-row broadcast (the average document length):

        idf  = ln(1 + (N − df + 0.5) / (df + 0.5))
        norm = tf · (k1+1) / (tf + k1 · (1 − b + b · len/avglen))
        bm25 = idf · norm

    The ln makes scores engine-internal (no cross-engine exact oracle —
    same caveat as ``idf="ln"``); parity is pinned against a NumPy
    reference in tests. Output: (id, token, tf, doc_freq, bm25)."""
    tf = term_frequencies(df, text_col, id_col)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("doc_freq") <= max_df)
    dlen = tf.groupBy(id_col).agg(F.sum("tf").alias("__dl"))
    corpus = dlen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("__dl").alias("avg_dl")
    )
    joined = (
        tf.join(dfreq, "token")
        .join(dlen, id_col)
        .crossJoin(F.broadcast(corpus))
    )
    n, dfq = F.col("n_docs").cast("double"), F.col("doc_freq").cast("double")
    idf = F.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
    tf_d = F.col("tf").cast("double")
    norm = (
        tf_d * (k1 + 1.0)
        / (tf_d + k1 * (1.0 - b + b * F.col("__dl").cast("double") / F.col("avg_dl")))
    )
    return joined.select(
        F.col(id_col), "token", "tf", "doc_freq", (idf * norm).alias("bm25")
    )


def top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    idf: str = "ln",
    max_df: int | None = None,
) -> DataFrame:
    """Top-n highest-TF-IDF terms per document (the standard keyword
    extractor). Deterministic total order: score DESC, then token ASC —
    ties cannot reorder across engines. One window over (id) on the scored
    rows; per-doc groups are token-vocabulary-sized, never corpus-sized."""
    scored = tf_idf(df, text_col, id_col, idf=idf, max_df=max_df)
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select(id_col, "token", "tf", "doc_freq", "score", "rank")
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int | None = None,
    min_df: int = 1,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Corpus vocabulary with frequency stats and a dense deterministic
    token id — the token-inventory step before tokenizer training or
    embedding-table sizing.

    Output: (token, n_occurrences, doc_freq, token_id), token_id dense in
    [0, |vocab|) ordered by (n_occurrences DESC, token ASC) — a total
    order, so ids are identical across engines and runs. ``min_df`` drops
    hapax-grade noise; ``max_df_frac`` drops stopword-grade tokens
    appearing in more than that fraction of documents; ``size`` keeps the
    most frequent ``size`` tokens.

    Plan shape at 100 TB: the token explode feeds ONE map-side-combined
    aggregate keyed by token (shuffled volume O(distinct (doc,token)) for
    doc_freq partials — tf partials combine to O(distinct token)); the
    doc-count side joins as a single-row broadcast. The final id
    assignment is a row_number over the SURVIVING vocabulary — vocab-sized
    (bounded by ``size``), never corpus-sized; with ``size=None`` on an
    open-ended corpus that window is the one place the plan concentrates,
    so set ``size`` (any real tokenizer does)."""
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    if max_df_frac is not None and not 0.0 < max_df_frac <= 1.0:
        raise ValueError("max_df_frac must be in (0, 1]")
    if size is not None and size < 1:
        raise ValueError("size must be >= 1")
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    stats = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct(F.col(id_col)).alias("doc_freq"),
    )
    stats = stats.where(F.col("doc_freq") >= min_df)
    if max_df_frac is not None:
        n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("__n_docs"))
        stats = stats.crossJoin(F.broadcast(n_docs)).where(
            F.col("doc_freq")
            <= F.floor(F.lit(float(max_df_frac)) * F.col("__n_docs"))
        ).drop("__n_docs")
    order = [F.col("n_occurrences").desc(), F.col("token").asc()]
    if size is not None:
        # TakeOrdered-style parallel cut before the single-task id window
        stats = stats.orderBy(*order).limit(size)
    w = Window.orderBy(*order)
    return stats.select(
        "token",
        "n_occurrences",
        "doc_freq",
        (F.row_number().over(w) - 1).alias("token_id"),
    )


def encode_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
    strategy: str = "join",
) -> DataFrame:
    """Tokenizer-apply: encode each document as its dense token-id sequence
    under a :func:`build_vocab`-shaped vocabulary (columns ``token``,
    ``token_id``) — the text→ids step that turns a curated corpus into
    trainable sequences (feeds chunk_by_tokens / pack_token_stream).
    Out-of-vocabulary tokens map to ``oov_id``.

    Output: (id, n_tokens, n_oov, token_ids array<long>), position order
    preserved.

    Two plans, asserted row-identical in tests:

    - ``strategy="join"`` (default, the exact-SQL-oracle path): posexplode
      → left equi-join on the token → re-assemble per doc via
      sort_array(collect_list(struct(pos, id))). The re-assembly shuffles
      O(occurrences) — corpus-sized — which is the price of staying in
      pure relational ops.
    - ``strategy="map"`` (the 100 TB path): the vocab is collected once
      (vocab-sized, bounded by build_vocab's ``size`` — same contract as
      the k-means codebook collect in ann.py) and shipped as a broadcast
      dict into ONE mapInPandas pass: tokenize + dict-lookup per Arrow
      batch, ZERO shuffle, no explode, no re-assembly. Python-side
      tokenization replicates the engine's normalize() exactly for ASCII
      (Java ``\\s``/lower vs Python re semantics agree on the explicit
      ``[ \\t\\n\\x0B\\f\\r]`` class; exotic-unicode case mappings are the
      documented caveat) — the parity test pins the two strategies equal
      on the shared corpus fixture.
    """
    if strategy not in ("join", "map"):
        raise ValueError("strategy must be 'join' or 'map'")
    if strategy == "map":
        return _encode_map(df, vocab, text_col, id_col, oov_id)
    # NULL text == empty text (one empty token), matching the map path;
    # posexplode would otherwise silently drop the whole document
    tok = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("pos", "token"),
    )
    v = vocab.select("token", F.col("token_id").cast("long").alias("__tid"))
    enc = tok.join(F.broadcast(v), "token", "left")
    return (
        enc.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__tid").isNull(), 1).otherwise(0)).alias("n_oov"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "__tid"))),
                lambda s: F.coalesce(s["__tid"], F.lit(int(oov_id)).cast("long")),
            ).alias("token_ids"),
        )
        .select(id_col, "n_tokens", "n_oov", "token_ids")
    )


def _encode_map(
    df: DataFrame, vocab: DataFrame, text_col: str, id_col: str, oov_id: int
) -> DataFrame:
    """Broadcast-dict encode: one mapInPandas pass, zero shuffle."""
    import re

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    # vocab-sized collect (bounded by build_vocab's size cut)
    mapping = {r["token"]: int(r["token_id"]) for r in vocab.select("token", "token_id").collect()}
    bc = df.sparkSession.sparkContext.broadcast(mapping)
    oov = int(oov_id)
    # exact twin of functions/text.py::normalize for the Java \s class
    ws = re.compile(r"[ \t\n\x0B\f\r]+")

    in_fields = df.select(F.col(id_col), F.col(text_col)).schema
    out_schema = StructType(
        [
            in_fields[0],
            StructField("n_tokens", LongType(), False),
            StructField("n_oov", LongType(), False),
            StructField("token_ids", ArrayType(LongType(), False), False),
        ]
    )

    def encode_batches(batches):
        import pandas as pd

        m = bc.value
        for pdf in batches:
            ids, n_tok, n_oov, seqs = [], [], [], []
            for rid, text in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                toks = ws.sub(" ", ("" if text is None else text).lower()).strip().split(" ")
                seq = [m.get(t, oov) for t in toks]
                ids.append(rid)
                n_tok.append(len(seq))
                n_oov.append(sum(1 for t in toks if t not in m))
                seqs.append(seq)
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": n_tok, "n_oov": n_oov, "token_ids": seqs}
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        encode_batches, schema=out_schema
    )
