"""Text-analysis functions for training-data pipelines — all native Spark
column expressions (JVM-side, whole-stage codegen; no Python UDFs).

Every definition here is deliberately ANSI-SQL-portable so the DuckDB oracle
can compute the identical value: tokenization is single-space split,
hashing is md5 (lowercase hex in both engines), ratios are divisions of
exact integer counts (IEEE-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 25 common English stopwords — fixed, sorted, lowercase
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with",
]


def normalize(text: Column) -> Column:
    """Lowercase + collapse whitespace runs + trim — the canonical form used
    by fingerprinting and dedup."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    return F.split(normalize(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def chars_per_token(text: Column) -> Column:
    return char_count(text).cast("double") / F.greatest(token_count(text), F.lit(1)).cast("double")


def stopword_count(text: Column) -> Column:
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def stopword_ratio(text: Column) -> Column:
    return stopword_count(text).cast("double") / F.greatest(token_count(text), F.lit(1)).cast("double")


def punct_count(text: Column) -> Column:
    # count of non-alphanumeric, non-space characters
    return F.length(F.regexp_replace(text, r"[A-Za-z0-9 ]", ""))


def punct_ratio(text: Column) -> Column:
    return punct_count(text).cast("double") / F.greatest(char_count(text), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards stopword presence and
    moderate token length, penalizes punctuation soup. A linear blend of
    exact integer-ratio terms (portable)."""
    sw = stopword_ratio(text)
    pr = punct_ratio(text)
    cpt = chars_per_token(text)
    len_ok = F.when((cpt >= 3.0) & (cpt <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    score = F.lit(0.4) * F.least(sw * 4.0, F.lit(1.0)) + F.lit(0.3) * (1.0 - F.least(pr * 5.0, F.lit(1.0))) + F.lit(0.3) * len_ok
    return score


def lang_id(text: Column) -> Column:
    """Tiny n-gram-free language heuristic: 'en' when English stopwords hit
    ≥ 5% of tokens, 'und' otherwise. (Real corpora would swap in a fastText
    model via a pandas UDF; the Spark-side contract is identical.)"""
    return F.when(stopword_ratio(text) >= 0.05, F.lit("en")).otherwise(F.lit("und"))


# GPT-2-style pre-tokenizer pattern, restricted to the RE2 ∩ Java-regex
# dialect (no lookahead, ASCII classes) so Spark and DuckDB count the same
# matches: contraction suffixes, space-prefixed letter runs, digit runs,
# symbol runs, residual whitespace runs. Whitespace is the EXPLICIT class
# [ \t\n\f\r] rather than \s: Java's \s includes \x0B (vertical tab) while
# RE2's does not, so \s would make the two engines diverge on documents
# containing \x0B (ADVICE r02). \x0B therefore counts as a symbol here,
# identically in both engines.
_WS = r" \t\n\f\r"
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    rf"| ?[^A-Za-z0-9{_WS}]+|[{_WS}]+"
)


def bpe_token_estimate(text: Column) -> Column:
    """Subword-ish token count: matches of the BPE pre-tokenizer split
    pattern. Cheaper than a real BPE merge pass and within ~10-30% of GPT-2
    counts on English prose — the standard budget estimator for training-data
    pipelines. Pure regexp_count: JVM codegen, no Python."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_PATTERN)).cast("int")


# PII patterns, restricted (like BPE_SPLIT_PATTERN) to the RE2 ∩ Java-regex
# dialect — plain character classes and counted quantifiers only, no
# lookaround, no \s/\w shorthands — so Spark's regexp_replace/regexp_count
# and DuckDB's produce byte-identical results.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# digit runs joined by phone separators, 7+ digits total, optional leading +
PHONE_PATTERN = r"\+?[0-9]{2,4}[ .-][0-9]{2,4}[ .-][0-9]{2,6}"


def mask_pii(text: Column) -> Column:
    """Redact email addresses then phone-shaped number groups with typed
    placeholders — the minimal PII scrub pass of a training-data pipeline.
    Order matters (emails contain digits); both engines apply global
    replacement. Pure regexp_replace: JVM codegen, no Python."""
    no_email = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_PATTERN, "<PHONE>")


def pii_counts(text: Column) -> Column:
    """Struct of (n_emails, n_phones) found by the masking patterns —
    the audit counterpart of :func:`mask_pii` (count what you scrub)."""
    return F.struct(
        F.regexp_count(text, F.lit(EMAIL_PATTERN)).cast("int").alias("n_emails"),
        F.regexp_count(text, F.lit(PHONE_PATTERN)).cast("int").alias("n_phones"),
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Identical hex in any engine; used as the exact-dedup key."""
    return F.md5(normalize(text))


def shingles_from_tokens(t: Column, k: int = 3) -> Column:
    """Word k-grams from an ALREADY-MATERIALIZED token-array column.

    Callers must bind the token array to a real column first
    (``df.withColumn("t", tokens(text))``): Spark re-evaluates expression
    *trees* per reference, so passing ``tokens(text)`` directly would rerun
    the regex+split once per element_at inside the lambda — measured 15s vs
    <1s on 5k docs. Short docs (< k tokens) yield one whole-text shingle."""
    n = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(k)]),
    )
    return F.when(n >= k, grams).otherwise(F.array(F.array_join(t, " ")))


def gram_rows(df, text_col: str, id_col: str, k: int, short_docs: str = "whole"):
    """(id, pos, gram) rows — the EXPLODED word-k-gram table, built without
    any higher-order function.

    Value-identical to ``explode(shingles_from_tokens(tokens(text), k))``
    (including the NULL-text and short-document cases), but an order of
    magnitude cheaper per row: ``shingles_from_tokens`` builds the gram
    array with an interpreted ``transform`` lambda (HOFs are
    CodegenFallback — the whole expression evaluates row-at-a-time), while
    this plan explodes a ``sequence`` of start positions and assembles each
    gram with ``concat_ws`` + ``try_element_at`` in a fully codegen'd
    projection AFTER the Generate. Measured on the 1.15M-turn transcripts
    corpus (minhash signature job end to end): 1.44 s vs 2.82 s.

    ``pos`` is the 0-based token index of the gram's first token.

    ``short_docs="whole"`` reproduces the dedup semantics: a document with
    fewer than ``k`` tokens yields ONE gram at pos 0 — the whole normalized
    text (``concat_ws`` skips the NULL tail slots, which equals
    ``array_join(tokens, ' ')``), and a NULL text yields one NULL gram
    (exactly what ``shingles_from_tokens`` produces on a NULL array).
    ``short_docs="drop"`` reproduces the quality/substr semantics: < k
    tokens (or NULL text) → no rows."""
    if short_docs not in ("whole", "drop"):
        raise ValueError(f"short_docs must be 'whole' or 'drop', got {short_docs!r}")
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    n_start = F.size(F.col("__t")) - (k - 1)
    if short_docs == "whole":
        # greatest skips NULL, so a NULL token array still yields pos 1
        # (one row), whose gram is forced to NULL below
        starts = F.sequence(F.lit(1), F.greatest(n_start, F.lit(1)))
    else:
        # sequence(1, 0) would generate a DESCENDING ramp — emit an empty
        # array instead so explode drops the document
        starts = F.when(n_start >= 1, F.sequence(F.lit(1), n_start)).otherwise(
            F.array().cast("array<int>")
        )
    pos = toks.select(F.col(id_col), F.col("__t"), F.explode(starts).alias("__p"))
    gram = F.concat_ws(
        " ", *[F.try_element_at(F.col("__t"), F.col("__p") + j) for j in range(k)]
    )
    if short_docs == "whole":
        gram = F.when(F.col("__t").isNull(), F.lit(None).cast("string")).otherwise(gram)
    return pos.select(
        F.col(id_col), (F.col("__p") - 1).alias("pos"), gram.alias("gram")
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Word k-grams of the normalized text — convenience wrapper; prefer
    materializing :func:`tokens` into a column and using
    :func:`shingles_from_tokens` in anything performance-sensitive."""
    return shingles_from_tokens(tokens(text), k)


def lexicon_score(text: Column, weights: dict[str, float], bias: float = 0.0) -> Column:
    """Weighted-lexicon score: ``bias + Σ_tokens weight[token]`` over the
    normalized single-space tokens, unknown tokens contributing 0 — the
    classic lexicon-based quality / toxicity / domain scorer (bad-word
    lists, hand-tuned quality terms, an exported linear classifier's
    largest weights).

    ONE pass over the token array: the lexicon becomes a map literal
    (broadcast with the plan — lexicons are hundreds to thousands of
    terms, never corpus-sized) and a single ``aggregate`` fold does a map
    lookup per token. The token array is referenced exactly once (Catalyst
    re-evaluates an expression tree per reference — the
    ``shingles_from_tokens`` rule).

    Summation is the fold's left-to-right token order. With arbitrary
    float weights the last ulp of the total depends on that order; with
    DYADIC weights (multiples of 2^-k, e.g. 0.25, -1.5) every partial sum
    is exact, so ANY evaluation order — including a SQL oracle written as
    ``Σ_terms weight·count(term)`` — produces the bit-identical double.
    The driver contract query uses dyadic weights for exactly this reason.
    """
    if not weights:
        raise ValueError("lexicon_score: weights must be a non-empty dict")
    pairs = sorted(weights.items())
    m = F.create_map(
        *[x for term, w in pairs for x in (F.lit(term), F.lit(float(w)))]
    )
    toks = tokens(F.coalesce(text, F.lit("")))
    # try_element_at, not m[t]: ANSI mode makes a plain map access THROW on
    # a missing key, and unknown tokens are the common case here
    return F.aggregate(
        toks,
        F.lit(float(bias)),
        lambda acc, t: acc + F.coalesce(F.try_element_at(m, t), F.lit(0.0)),
    )
