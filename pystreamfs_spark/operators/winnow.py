"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
2003 — "Winnowing: Local Algorithms for Document Fingerprinting"): the
classic robust fingerprint-selection scheme behind MOSS-style duplicate and
near-duplicate detection. From each document's k-gram hash sequence, every
window of ``w`` consecutive hashes contributes its MINIMUM (rightmost on
ties), giving a position-robust fingerprint set with guaranteed detection of
any shared substring of length >= k + w - 1 and expected density 2/(w+1) —
a deterministic, alignment-free alternative to MinHash for exact-ish overlap
mining.

No reference counterpart (north-rule superset, like operators/substr.py —
winnowing trades substr.py's exact span extents for an index ~w× smaller).

Scale notes (100 TB):
- Fingerprint selection is MAP-ONLY: the whole sliding-window scan is ONE
  left-to-right ``aggregate`` fold over the per-document hash array,
  carrying a ring buffer of the last ``w`` hashes — no explode until the
  final distinct-selection fan-out, no shuffle, no Python. Per-document
  cost is O(n_grams × w) element compares; w is a small constant (4-10).
- CRITICAL plan-shape constraint (measured, not theoretical): Spark's
  optimizer inlines the Projects below a Generate (explode) into the
  generator expression EVEN when they hold non-cheap expressions referenced
  many times — the CollapseProject used-once guard does not protect across
  Generate. A per-window formulation (``transform(sequence(0, n_win-1),
  window_sel)`` with ``element_at(__h, …)`` inside) therefore re-evaluates
  the full md5 k-gram hash transform once per element access after the
  explode: 533 s vs ~1 s at sf0.001 (5k docs). The single-fold form
  references ``__h`` exactly ONCE, so inlining is harmless. Keep it that
  way: any future edit must not add a second reference to ``__h`` (or
  ``__t``) inside an expression that feeds ``explode``.
- The emitted (doc, pos, fp) table is ~2/(w+1) the size of the full k-gram
  postings list — joins on ``fp`` downstream (shared-fingerprint pair
  mining, composed exactly like dedup.ngram_jaccard_pairs' inverted index)
  shuffle proportionally less than gram-level indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pystreamfs_spark.functions.text import shingles_from_tokens, tokens


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Distinct winnowed fingerprints per document: (id, pos, fp) where
    ``pos`` is the 0-based k-gram position whose hash was selected and
    ``fp`` the 32-bit md5-prefix hash value (the same portable token-hash
    the SimHash operator uses, exact in any engine).

    Window semantics: hash sequence H of length L (documents shorter than
    k tokens contribute their single whole-text shingle — the
    shingles_from_tokens rule); windows are H[i..i+w-1] for
    i in [0, max(L-w, 0)] (one truncated window when L < w); each window
    selects its minimum, RIGHTMOST position on ties (the paper's robust
    tie-break, computable per-window because equal hash values make the
    choice independent of neighboring windows); selections are emitted
    once (DISTINCT on (pos, fp)).

    Implementation is a SINGLE aggregate fold over the hash array (ring
    buffer of the last ``w`` (pos, fp) pairs, emitting each full window's
    rightmost minimum as it slides) so the hash array is referenced exactly
    once — the module-docstring Generate-inlining constraint."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if w < 1:
        raise ValueError("w must be >= 1")

    t = tokens(F.col(text_col))
    bound = df.select(F.col(id_col), t.alias("__t"))
    grams = shingles_from_tokens(F.col("__t"), k)
    hashed = bound.select(
        F.col(id_col),
        F.transform(
            grams,
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
        ).alias("__h"),
    )

    # the ONLY reference to __h anywhere downstream (see module docstring)
    zipped = F.transform(
        F.col("__h"),
        lambda h, i: F.struct(i.cast("long").alias("pos"), h.alias("fp")),
    )
    sel_t = "array<struct<pos:bigint,fp:bigint>>"

    def rightmost_min(buf):
        # left-to-right fold; `<=` makes later equal hashes win -> the
        # paper's rightmost tie-break
        return F.aggregate(
            buf,
            F.struct(
                F.lit(-1).cast("long").alias("pos"),
                F.lit(2**63 - 1).cast("long").alias("fp"),
            ),
            lambda a, s: F.when(s["fp"] <= a["fp"], s).otherwise(a),
        )

    def step(a, s):
        grown = F.concat(a["buf"], F.array(s))
        buf = F.when(F.size(grown) > w, F.slice(grown, 2, w)).otherwise(grown)
        return F.struct(
            buf.alias("buf"),
            F.when(
                F.size(buf) == w,
                F.concat(a["out"], F.array(rightmost_min(buf))),
            )
            .otherwise(a["out"])
            .alias("out"),
        )

    fold = F.aggregate(
        zipped,
        F.struct(
            F.array().cast(sel_t).alias("buf"), F.array().cast(sel_t).alias("out")
        ),
        step,
        # L < w: no full window ever formed -> one truncated window [0, L-1]
        lambda a: F.array_distinct(
            F.when(
                F.size(a["out"]) == 0, F.array(rightmost_min(a["buf"]))
            ).otherwise(a["out"])
        ),
    )
    sels = hashed.select(F.col(id_col), fold.alias("__s"))
    ex = sels.select(F.col(id_col), F.explode("__s").alias("__e"))
    return ex.select(
        F.col(id_col),
        F.col("__e.pos").cast("long").alias("pos"),
        F.col("__e.fp").alias("fp"),
    )


def winnow_shared_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Candidate duplicate pairs sharing >= ``min_shared`` winnowed
    fingerprints — the MOSS matching step as an inverted-index equi-join
    (the dedup.ngram_jaccard_pairs shape, over an index ~2/(w+1) the
    size). Output: (id_a, id_b, n_shared) with id_a < id_b, each pair once.

    ``max_df`` drops fingerprints present in more than that many documents
    before the self-join — the stop-shingle cut: an agg + join on the
    fingerprint key, never a collect. At 100 TB the join is equi on ``fp``
    and AQE-skew-splittable; without a ``max_df`` cut a boilerplate-heavy
    corpus concentrates pairs under few fps exactly like stop-shingles do
    in the jaccard index (same remedy, same audit reasoning)."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    fps = winnow_fingerprints(df, text_col, id_col, k, w).select(id_col, "fp").distinct()
    if max_df is not None:
        rare = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("fp")
        )
        fps = fps.join(rare, "fp")
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
