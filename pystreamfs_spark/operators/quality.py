"""Corpus quality filters a large-scale training-data pipeline runs before
training: n-gram repetition signals (the Gopher/MassiveText rule family,
Rae et al. 2021 §A1.1) and benchmark decontamination (n-gram overlap against
an eval set, GPT-3 appendix C / PaLM style).

Both are pure DataFrame plans over the existing shingle machinery
(functions.text.shingles_from_tokens) — no Python in the hot path, exact
integer-ratio outputs so every operator has a bit-identical DuckDB oracle.

Scale notes (100 TB):
- repetition_signals: two explode→map-side-combined aggs (unigrams,
  k-grams), shuffled volume O(distinct (doc, gram)) — never O(occurrences)
  — joined per doc; the join keys are doc ids (uniform, AQE-friendly).
- decontaminate: the benchmark side of the join is an eval set (thousands
  of docs) whose DISTINCT n-grams are corpus-independent and tiny →
  broadcast; the corpus side is one explode + one broadcast-hash join +
  one per-doc agg. The corpus is never shuffled on gram keys, so one
  stop-gram cannot skew the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pystreamfs_spark.functions.text import shingles_from_tokens, tokens


def _gram_table(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram) with one row per OCCURRENCE (not distinct — repetition
    counting needs multiplicity). A doc with < n tokens has NO n-grams —
    no rows → left joins see NULL → 0.0 frac. n > 1 uses text.gram_rows
    (r06): positional explode + codegen concat_ws instead of the
    interpreted in-row shingle transform — identical rows, no HOF."""
    if n == 1:
        toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
        return toks.select(F.col(id_col), F.explode(F.col("__t")).alias("gram"))
    from pystreamfs_spark.functions.text import gram_rows

    return gram_rows(df, text_col, id_col, n, short_docs="drop").select(
        F.col(id_col), "gram"
    )


def _repetition_agg(df: DataFrame, text_col: str, id_col: str, n: int, prefix: str) -> DataFrame:
    """Per-doc gram stats: total, distinct, and max single-gram count."""
    counts = (
        _gram_table(df, text_col, id_col, n)
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy(id_col).agg(
        F.sum("c").alias(f"{prefix}_total"),
        F.count(F.lit(1)).alias(f"{prefix}_distinct"),
        F.max("c").alias(f"{prefix}_top"),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top_token_frac``  — occurrences of the most frequent token / total
      tokens (Gopher's "fraction of characters in the most common word",
      token-count form);
    - ``dup_token_frac``  — 1 − distinct/total tokens;
    - ``top_kgram_frac``  — occurrences of the most frequent k-gram / total
      k-grams (Gopher's top n-gram rule, default k=3);
    - ``dup_kgram_frac``  — 1 − distinct/total k-grams (Gopher's duplicate
      n-gram rule).

    The standard MassiveText cut drops docs with top_2gram_frac > 0.2 or
    dup_3gram_frac beyond threshold; this operator emits the raw fractions
    so the caller picks thresholds per corpus. Docs shorter than k tokens
    get 0.0 k-gram fractions (no k-grams exist). All outputs are ratios of
    exact integer counts — IEEE-identical in any engine.
    Output: (id, n_tokens, top_token_frac, dup_token_frac, top_kgram_frac,
    dup_kgram_frac)."""
    uni = _repetition_agg(df, text_col, id_col, 1, "u")
    kg = _repetition_agg(df, text_col, id_col, k, "g")
    base = df.select(F.col(id_col)).join(uni, id_col, "left").join(kg, id_col, "left")

    def frac(num, den):
        return F.coalesce(
            num.cast("double") / F.nullif(den, F.lit(0)).cast("double"), F.lit(0.0)
        )

    return base.select(
        F.col(id_col),
        F.coalesce(F.col("u_total"), F.lit(0)).alias("n_tokens"),
        frac(F.col("u_top"), F.col("u_total")).alias("top_token_frac"),
        frac(F.col("u_total") - F.col("u_distinct"), F.col("u_total")).alias("dup_token_frac"),
        frac(F.col("g_top"), F.col("g_total")).alias("top_kgram_frac"),
        frac(F.col("g_total") - F.col("g_distinct"), F.col("g_total")).alias("dup_kgram_frac"),
    )


def repetition_signals_rowwise(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Row-wise twin of :func:`repetition_signals`: the SAME four Gopher
    fractions computed as pure per-row array expressions — no explode, no
    shuffle, no state. Every count is within-document, so the grouped plan's
    corpus-wide shuffle is pure overhead when the input arrives one document
    at a time; this form runs unchanged on a STREAMING DataFrame (it is the
    ingest-time quality gate ``streaming.adapter.stream_quality_signals``
    wraps) and on a batch frame when docs are small enough that the
    O(distinct×n) per-row token scan beats a shuffle.

    Outputs are ratios of the identical exact integers the grouped operator
    produces, so the two plans are bit-identical per document (asserted in
    tests). Prefer the grouped :func:`repetition_signals` for batch jobs
    with pathological single documents (the HOF scan is quadratic in the
    worst case); prefer this form for streams and map-only pipelines."""
    # NULL text -> zero tokens, matching the grouped twin (whose explode
    # emits no rows for a NULL array, left-joining back as count 0); a bare
    # tokens(NULL) would propagate NULL through size() into n_tokens
    t = F.when(
        F.col(text_col).isNull(), F.array().cast("array<string>")
    ).otherwise(tokens(F.col(text_col)))
    g = F.when(F.size(t) >= k, shingles_from_tokens(t, k)).otherwise(
        F.array().cast("array<string>")
    )
    # bind arrays (and their distinct projections) to real columns before
    # the counting lambdas touch them — Catalyst re-evaluates expression
    # trees once per reference (see text.shingles_from_tokens)
    bound = df.select(
        F.col(id_col),
        t.alias("__t"),
        g.alias("__g"),
        F.array_distinct(t).alias("__td"),
        F.array_distinct(g).alias("__gd"),
    )

    def top_count(arr, dis):
        # occurrences of the most frequent element: max over distinct
        # elements of that element's count
        return F.coalesce(
            F.array_max(
                F.transform(dis, lambda x: F.size(F.filter(arr, lambda y: y == x)))
            ),
            F.lit(0),
        ).cast("long")

    def frac(num, den):
        return F.coalesce(
            num.cast("double") / F.nullif(den, F.lit(0)).cast("double"), F.lit(0.0)
        )

    n_tok = F.size("__t").cast("long")
    n_gram = F.size("__g").cast("long")
    return bound.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        frac(top_count(F.col("__t"), F.col("__td")), n_tok).alias("top_token_frac"),
        frac(n_tok - F.size("__td"), n_tok).alias("dup_token_frac"),
        frac(top_count(F.col("__g"), F.col("__gd")), n_gram).alias("top_kgram_frac"),
        frac(n_gram - F.size("__gd"), n_gram).alias("dup_kgram_frac"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ≥
    ``min_overlap`` distinct n-grams with ANY benchmark document (the GPT-3
    appendix-C recipe; n=8..13 word-grams approximate exact-substring
    leakage at a fraction of the cost).

    The benchmark's distinct gram set is broadcast (an eval set is tiny by
    definition — if yours is corpus-sized, it is a corpus, use the dedup
    operators); every corpus document gets its overlap count. Output:
    (id, n_overlap, contaminated) for EVERY corpus document — the training
    split is ``WHERE NOT contaminated``, the audit is the flagged rows."""
    bench_grams = (
        _gram_table(benchmark, text_col, id_col, n).select("gram").distinct()
    )
    # join occurrence-level grams against the broadcast FIRST (a map-side
    # filter that discards ~the whole corpus), THEN count distinct matched
    # grams per doc — only the rare overlapping rows are ever shuffled. A
    # corpus-wide distinct before the join would shuffle every (doc, gram)
    # row just to throw almost all of them away.
    doc_grams = _gram_table(corpus, text_col, id_col, n)
    overlap = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("gram")).alias("n_overlap"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(overlap, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_overlap: int = 1,
    k_hashes: int = 5,
    m_bits: int = 1 << 20,
) -> DataFrame:
    """:func:`decontaminate` with the benchmark gram set compressed into a
    fixed-size Bloom filter (operators/sketches.py:bloom_build) instead of
    an exact broadcast — for when the eval suite itself is large (dozens
    of benchmarks × millions of grams) or when many decontamination passes
    reuse one persisted, mergeable filter.

    The error is ONE-SIDED in the safe direction: a Bloom filter never
    misses a present gram, so every truly contaminated document is flagged
    and ``n_overlap`` never under-counts — false positives only ever
    over-remove training data (rate ≈ (1-e^(-k·n/m))^k per probed gram).
    Same output contract as :func:`decontaminate`: (id, n_overlap,
    contaminated) for every corpus document.

    Scale shape: the filter is m/63 longs regardless of benchmark size
    (vs an exact gram set growing with the eval suite); the corpus side is
    unchanged — occurrence-level grams, map-side probe, only matching rows
    reach the per-doc count-distinct shuffle."""
    from pystreamfs_spark.operators.sketches import (
        bloom_build,
        bloom_densify,
        bloom_might_contain_dense,
    )

    bench_grams = (
        _gram_table(benchmark, text_col, id_col, n).select("gram").distinct()
    )
    # densify the one-row broadcast side before probing: MapType lookups
    # are linear scans, the dense word array is O(1) per probe — measured
    # 4.4 s → 2.0 s for this pass at sf0.1, identical matches (r06)
    bloom = bloom_densify(
        bloom_build(bench_grams, "gram", k_hashes=k_hashes, m_bits=m_bits)
    )
    doc_grams = _gram_table(corpus, text_col, id_col, n)
    overlap = (
        doc_grams.crossJoin(F.broadcast(bloom))
        .where(bloom_might_contain_dense(F.col("gram"), k_hashes, m_bits))
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("gram")).alias("n_overlap"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(overlap, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


def decontaminate_bloom_rowwise(
    corpus: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_overlap: int = 1,
    k_hashes: int = 5,
    m_bits: int = 1 << 20,
) -> DataFrame:
    """Row-wise twin of :func:`decontaminate_bloom` against a PREBUILT
    filter (the one-row frame :func:`~pystreamfs_spark.operators.sketches.
    bloom_build` returns over the benchmark's grams): the document's
    distinct n-grams stay a per-row ARRAY and each is probed with the
    membership expression — no explode, no shuffle, no state. Per-document
    output is bit-identical to :func:`decontaminate_bloom` (the probe is a
    deterministic per-gram function; asserted in tests), and the plan runs
    unchanged on a STREAMING DataFrame — the ingest-time decontamination
    gate ``streaming.adapter.stream_decontaminate`` wraps. Build the bloom
    once from the eval suite, persist it, and every ingest pipeline reuses
    the same few-KB row.

    Prefer the exploded :func:`decontaminate_bloom` for batch jobs with
    pathological single documents (the per-row probe loop is linear per
    gram but single-task per document); prefer this form for streams."""
    from pystreamfs_spark.operators.sketches import (
        bloom_densify,
        bloom_might_contain_dense,
    )

    t = tokens(F.col(text_col))
    g = F.when(F.size(t) >= n, shingles_from_tokens(t, n)).otherwise(
        F.array().cast("array<string>")
    )
    bound = corpus.select(F.col(id_col), F.array_distinct(g).alias("__gd"))
    # densify the static filter side before the cross join (MapType lookups
    # are linear scans — the r06 decontaminate_bloom note); probes per gram
    # then index the dense word array O(1). Bit-identical membership.
    joined = bound.crossJoin(F.broadcast(bloom_densify(bloom)))
    n_overlap = F.size(
        F.filter(
            F.col("__gd"),
            lambda x: bloom_might_contain_dense(x, k_hashes, m_bits),
        )
    ).cast("long")
    # two Projects: the probe expression is non-cheap, so referencing it
    # twice in one select would re-run every md5 probe per reference
    # (CollapseProject's used-once guard protects the split form)
    counted = joined.select(F.col(id_col), n_overlap.alias("n_overlap"))
    return counted.select(
        F.col(id_col),
        F.col("n_overlap"),
        (F.col("n_overlap") >= min_overlap).alias("contaminated"),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_other_docs: int = 1,
) -> DataFrame:
    """Cross-document commonness of each document's k-grams — the
    "templatedness" signal of web curation: a page whose 3-grams mostly
    appear in other pages is boilerplate/SEO-mill material even when no
    single near-duplicate partner exists (so MinHash/SimHash never pair
    it).

    For every document: ``n_grams`` distinct k-grams, ``common_grams`` of
    those appearing in at least ``min_other_docs`` OTHER documents, and
    ``common_frac = common_grams / n_grams`` (novelty is its complement).
    Documents with fewer than k tokens have no k-grams and report
    (0, 0, 0.0). Counts are exact integers, the fraction one IEEE division
    — bit-identical in any engine.

    Plan shape at 100 TB: the (doc, gram) distinct runs TWICE — once under
    the gram-keyed doc-frequency aggregate (map-side-combined, shuffled
    volume O(distinct gram)) and once as the probe side of the membership
    join (the two subtrees shuffle on different keys, so ReuseExchange
    cannot dedupe them — the same two-pass shape as tf_idf); the join's
    flagged output collapses into ONE per-doc aggregate carrying both
    counts. Stopword-grade grams are the classic hot keys of the join and
    here they are exactly the signal, so they cannot be cut — the join is
    equi on the gram and AQE skew-splittable. Nothing is collected; no
    window.
    """
    if min_other_docs < 1:
        raise ValueError("min_other_docs must be >= 1")
    grams = _gram_table(df, text_col, id_col, k).distinct()
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    # gram is in >= min_other_docs OTHER docs <=> doc_freq >= min_other + 1
    # (the doc itself always counts once in the distinct table)
    common = freq.where(F.col("__df") >= min_other_docs + 1).select(
        "gram", F.lit(1).alias("__c")
    )
    per_doc = (
        grams.join(common, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__c").alias("common_grams"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("common_grams", F.lit(0)).alias("common_grams"),
            F.coalesce(
                F.col("common_grams").cast("double")
                / F.nullif(F.col("n_grams"), F.lit(0)).cast("double"),
                F.lit(0.0),
            ).alias("common_frac"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality score: the mean per-token log
    probability of each document under the corpus's own unigram
    distribution. Boilerplate and keyword-stuffed pages score HIGH (common
    tokens), gibberish and OCR noise score LOW (rare tokens) — both tails
    are cut by composing with :func:`percentile_band`, which is exactly the
    CCNet recipe with the (unavailable-here) KenLM 5-gram replaced by the
    corpus unigram LM.

        logp(doc) = (1/n) · Σ_t tf(doc,t) · ln(count(t) / total)

    The ln is transcendental, so scores are engine-internal (rows-only
    driver check + NumPy parity test — same contract as bm25). Counts in
    the plan are exact integers.

    Plan shape at 100 TB: one token explode feeding the per-(doc,token) tf
    aggregate (map-side combined); the token-count side is a second
    aggregate off the same tf relation (shuffle O(distinct token)); the
    corpus total joins as a single-row broadcast; the tf–logp equi-join is
    AQE-skew-splittable on stopword-grade hot tokens; ONE final per-doc
    aggregate. No window, no collect, no Python.
    """
    from pystreamfs_spark.operators.tfidf import term_frequencies

    tf = term_frequencies(df, text_col, id_col)
    counts = tf.groupBy("token").agg(F.sum("tf").alias("__ct"))
    total = counts.agg(F.sum("__ct").alias("__total"))
    logp = counts.crossJoin(F.broadcast(total)).select(
        "token",
        F.log(F.col("__ct").cast("double") / F.col("__total").cast("double")).alias("__lp"),
    )
    return (
        tf.join(logp, "token")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(F.col("tf").cast("double") * F.col("__lp"))
                / F.sum("tf").cast("double")
            ).alias("avg_logprob"),
        )
        .select(id_col, "n_tokens", "avg_logprob")
    )


def percentile_band(
    df: DataFrame,
    score_col: str,
    lo: float,
    hi: float,
    id_col: str = "doc_id",
    approx: bool = False,
    relative_error: float = 0.001,
) -> DataFrame:
    """Keep the rows whose score falls in the global percentile band
    [lo, hi) — the rank-based quality gate ("drop the worst 20% and the
    suspiciously-perfect top 1%") that adapts to the corpus instead of a
    hand-tuned absolute threshold.

    Exact mode ranks every row by ``(score, id)`` — a deterministic total
    order, so the survivors are reproducible and SQL-oracle-exact — and
    keeps ranks in [floor(lo·N), floor(hi·N)). That global sort
    concentrates in one window task: correct at any size, but the wrong
    plan for 100 TB.

    ``approx=True`` is the scale path: per-score-band thresholds come from
    one ``percentile_approx`` aggregate (a mergeable sketch, map-side
    combined, driver sees one row) broadcast back into a map-only range
    filter — no global sort, no shuffle of the corpus. The band boundary
    is then approximate (±relative_error of N rows) and rows TIED on the
    boundary score are all kept or all dropped together, so the two modes
    agree only up to boundary ties — use exact mode for oracles, approx
    for production scale."""
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError("need 0 <= lo < hi <= 1")
    score = F.col(score_col)
    if approx:
        acc = int(round(1.0 / relative_error))
        q = df.agg(
            F.percentile_approx(score, F.lit(lo), F.lit(acc)).alias("__lo"),
            F.percentile_approx(score, F.lit(hi), F.lit(acc)).alias("__hi"),
        )
        out = df.crossJoin(F.broadcast(q)).where(
            (score >= F.col("__lo")) & ((F.lit(hi) >= 1.0) | (score < F.col("__hi")))
        )
        return out.drop("__lo", "__hi")
    cols = df.columns
    w = Window.orderBy(score.asc(), F.col(id_col).asc())
    cnt = df.agg(F.count(F.lit(1)).alias("__n"))
    lo_rank = F.floor(F.lit(float(lo)) * F.col("__n")).cast("long")
    hi_rank = F.floor(F.lit(float(hi)) * F.col("__n")).cast("long")
    return (
        df.withColumn("__rn", (F.row_number().over(w) - 1).cast("long"))
        .crossJoin(F.broadcast(cnt))
        .where((F.col("__rn") >= lo_rank) & (F.col("__rn") < hi_rank))
        .select(*cols)
    )
