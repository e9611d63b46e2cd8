"""Line-level corpus cleaning — the C4 / RefinedWeb rule family that runs
BEFORE document-level dedup in a web-scale training-data pipeline:

- :func:`filter_lines` — per-document line gates (minimum word count,
  banned-term lines, terminal-punctuation requirement), the C4 recipe
  (Raffel et al. 2020 §2.2) re-expressed as pure higher-order-function
  column expressions: zero shuffle, zero Python, whole-stage codegen.
- :func:`dedup_lines_corpus` — cross-DOCUMENT removal of lines whose
  normalized form appears in >= ``min_doc_freq`` distinct documents (the
  RefinedWeb / CCNet line-dedup pass that strips navigation bars, cookie
  banners and footers that exact- and near-dedup never see because the
  surrounding page differs).

No reference counterpart (the reference pystreamfs has no text surface);
these are north-rule superset operators alongside quality.py / dedup.py.

Scale notes (100 TB):
- filter_lines is MAP-ONLY: each row is rewritten in place by array
  expressions; the plan has no exchange at any corpus size.
- dedup_lines_corpus computes line document-frequencies with one
  posexplode -> map-side-combined aggregate (shuffled volume
  O(distinct (doc, line)), never O(line occurrences)); the frequent set
  (lines in >= k docs) is tiny by construction — boilerplate is, by
  definition, few distinct strings repeated across many pages — so the
  default ``strategy="broadcast"`` folds it into a single array row and
  removes lines with a map-only array filter: the corpus itself is NEVER
  shuffled. ``strategy="shuffle"`` is the adversarial-corpus fallback
  (frequent set too big to broadcast): explode -> equi-join on the line
  key (AQE-skew-splittable) -> one per-doc reassembly aggregate. The two
  strategies are output-identical (asserted in tests).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Column

from pystreamfs_spark.functions.text import normalize

TERMINAL_PUNCT = [".", "!", "?", '"']


def split_lines(text: Column, sep: str = "\n") -> Column:
    """Split ``text`` on the LITERAL separator (regex-escaped: F.split takes
    a pattern) — NULL text yields a single empty line, mirroring the
    engine-portable ``string_split`` semantics the DuckDB oracles use."""
    return F.split(F.coalesce(text, F.lit("")), re.escape(sep))


def _line_word_count(line: Column) -> Column:
    """Whitespace-separated word count of one line — counted as non-empty
    single-space split fields so '  a  b ' is 2 in any engine."""
    return F.size(F.filter(F.split(F.trim(line), " "), lambda w: w != ""))


def filter_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_words: int = 3,
    banned_terms: list[str] | None = None,
    require_terminal: bool = False,
) -> DataFrame:
    """C4-style line filtering: keep only lines with >= ``min_words``
    whitespace words, containing none of ``banned_terms`` (case-insensitive
    substring match — C4 drops lines with "javascript", pages with "lorem
    ipsum"), and — when ``require_terminal`` — ending in terminal
    punctuation (., !, ?, ") after right-trim.

    Output: (id, text_clean, n_lines, n_kept) for EVERY input document;
    a document whose lines are all dropped keeps an empty ``text_clean``
    (callers typically follow with ``WHERE n_kept > 0``). All counts are
    exact integers and the string ops are engine-portable, so the operator
    has a bit-identical DuckDB oracle.

    Plan shape: map-only (see module docstring)."""
    if min_words < 0:
        raise ValueError("min_words must be >= 0")
    banned = [b.lower() for b in (banned_terms or [])]
    banned_arr = F.array(*[F.lit(b) for b in banned])
    punct_arr = F.array(*[F.lit(p) for p in TERMINAL_PUNCT])

    # bind the split array to a real column before the lambdas touch it —
    # Catalyst re-evaluates expression trees once per reference
    bound = df.select(
        F.col(id_col), split_lines(F.col(text_col), sep).alias("__lines")
    )

    def keep(line: Column) -> Column:
        ok = _line_word_count(line) >= F.lit(min_words)
        if banned:
            low = F.lower(line)
            ok = ok & ~F.exists(banned_arr, lambda b: low.contains(b))
        if require_terminal:
            rt = F.rtrim(line)
            ok = ok & F.exists(punct_arr, lambda p: rt.endswith(p))
        return ok

    # materialize the kept array once (Spark >= 3.3 will not inline a
    # non-cheap alias referenced twice), then derive text + count from it
    kept = bound.select(
        F.col(id_col),
        F.size("__lines").cast("long").alias("n_lines"),
        F.filter(F.col("__lines"), keep).alias("__kept"),
    )
    return kept.select(
        F.col(id_col),
        F.array_join(F.col("__kept"), sep).alias("text_clean"),
        F.col("n_lines"),
        F.size("__kept").cast("long").alias("n_kept"),
    )


def line_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Document frequency of each normalized non-empty line:
    (line, doc_freq). The audit half of :func:`dedup_lines_corpus` — run it
    alone to eyeball what a threshold would remove. One posexplode +
    distinct + map-side-combined count; shuffled volume
    O(distinct (doc, line))."""
    lines = (
        df.select(
            F.col(id_col),
            F.explode(split_lines(F.col(text_col), sep)).alias("__raw"),
        )
        .select(F.col(id_col), normalize(F.col("__raw")).alias("line"))
        .where(F.col("line") != "")
        .distinct()
    )
    return lines.groupBy("line").agg(F.count(F.lit(1)).alias("doc_freq"))


def dedup_lines_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_doc_freq: int = 2,
    strategy: str = "broadcast",
) -> DataFrame:
    """Remove every line whose NORMALIZED form (lowercase, collapsed
    whitespace) appears in >= ``min_doc_freq`` distinct documents — the
    cross-document boilerplate strip of RefinedWeb / CCNet. Lines that
    normalize to the empty string are never counted and never removed.

    Output: (id, text_clean, n_lines, n_kept) for every input document,
    original line order preserved. Exact integer counts + portable string
    ops -> bit-identical DuckDB oracle.

    ``strategy="broadcast"`` (default, the 100 TB plan): the frequent-line
    set is collapsed to ONE array row and cross-joined broadcast into a
    map-only array filter — the corpus is never shuffled.
    ``strategy="shuffle"``: posexplode -> left join on the line key ->
    per-doc ordered reassembly; for adversarial corpora whose frequent set
    exceeds the broadcast budget. Identical output (tested)."""
    if min_doc_freq < 2:
        raise ValueError("min_doc_freq must be >= 2 (1 would remove every line)")
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError("strategy must be 'broadcast' or 'shuffle'")

    frequent = line_frequencies(df, text_col, id_col, sep).where(
        F.col("doc_freq") >= min_doc_freq
    )

    if strategy == "broadcast":
        # one row: the sorted frequent-line array (sort only for plan
        # determinism; membership is order-independent)
        freq_row = frequent.agg(
            F.coalesce(
                F.sort_array(F.collect_set("line")),
                F.array().cast("array<string>"),
            ).alias("__freq")
        )
        bound = df.select(
            F.col(id_col), split_lines(F.col(text_col), sep).alias("__lines")
        ).crossJoin(F.broadcast(freq_row))
        # empty-normalized lines are never IN the frequent set (filtered at
        # the source), so plain non-membership already keeps them
        kept = bound.select(
            F.col(id_col),
            F.size("__lines").cast("long").alias("n_lines"),
            F.filter(
                F.col("__lines"),
                lambda l: ~F.array_contains(F.col("__freq"), normalize(l)),
            ).alias("__kept"),
        )
        return kept.select(
            F.col(id_col),
            F.array_join(F.col("__kept"), sep).alias("text_clean"),
            F.col("n_lines"),
            F.size("__kept").cast("long").alias("n_kept"),
        )

    # shuffle strategy: positional explode, join, ordered reassembly
    exploded = df.select(
        F.col(id_col),
        F.posexplode(split_lines(F.col(text_col), sep)).alias("__pos", "__raw"),
    ).withColumn("line", normalize(F.col("__raw")))
    flagged = exploded.join(
        frequent.select("line", F.lit(1).alias("__hot")), "line", "left"
    )
    kept = flagged.where(F.col("__hot").isNull())
    # array_sort on (pos, raw) structs gives the original order back without
    # a window; collect_list order inside a group is nondeterministic, the
    # sort makes it exact
    per_doc = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__raw"))),
                lambda s: s["__raw"],
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(split_lines(F.col(text_col), sep)).cast("long").alias("n_lines"),
    )
    return totals.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        F.col("n_lines"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )
