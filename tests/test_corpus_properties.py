"""Property-based invariants (hypothesis) over randomly generated corpora.

Each example runs real Spark jobs, so example counts are kept small — the
value is the generator exploring corpus shapes (dup densities, short docs,
token repetition) that hand fixtures miss, pinned by invariants that must
hold for EVERY corpus:

- chunk_by_tokens is a partition of the token stream (lossless, ordered,
  exact sizes);
- hash_split is a partition of the corpus AND growth-stable (a row's split
  never changes when the corpus grows);
- banded SimHash (pigeonhole) and probe-expansion SimHash are two
  independent plans for the same mathematical object — their pair sets
  must be identical at the same d;
- near_dedup emits every doc exactly once with min-label components and
  one canonical doc per component.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

texts = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=12,
)

PROP = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _docs(spark, txts):
    return spark.createDataFrame(list(enumerate(txts)), "doc_id bigint, text string")


@PROP
@given(txts=texts)
def test_chunking_partitions_the_token_stream(spark, txts):
    from pystreamfs_spark.functions.text import tokens
    from pystreamfs_spark.operators.chunk import chunk_by_tokens

    d = _docs(spark, txts)
    chunks = chunk_by_tokens(d, chunk_size=4).collect()
    toks = {r.doc_id: r.t for r in d.select("doc_id", tokens(F.col("text")).alias("t")).collect()}
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        rebuilt = [t for r in rows for t in r.chunk_text.split(" ")]
        assert rebuilt == toks[doc_id]  # lossless and ordered
        assert all(r.n_tokens == 4 for r in rows[:-1])  # full chunks except tail
        assert 1 <= rows[-1].n_tokens <= 4
    assert set(by_doc) == set(toks)


@PROP
@given(txts=texts, frac=st.sampled_from([0.5, 0.8, 0.98]))
def test_hash_split_partitions_and_growth_stability(spark, txts, frac):
    from pystreamfs_spark.operators.sampling import hash_split

    d = _docs(spark, txts)
    fr = {"train": frac, "rest": round(1.0 - frac, 10)}
    full = {r.doc_id: r.split for r in hash_split(d, key_col="doc_id", fractions=fr).collect()}
    assert set(full) == set(range(len(txts)))  # a partition: every row, once
    # growth stability: the same keys in a HALF corpus get the same split
    half = d.where(F.col("doc_id") % 2 == 0)
    sub = {r.doc_id: r.split for r in hash_split(half, key_col="doc_id", fractions=fr).collect()}
    assert all(full[k] == v for k, v in sub.items())


@PROP
@given(txts=texts)
def test_simhash_banded_equals_probe_expansion(spark, txts):
    from pystreamfs_spark.operators.dedup import (
        simhash_banded_near_duplicates,
        simhash_near_duplicates,
    )

    d = _docs(spark, txts)
    probe = {(r.id_a, r.id_b, r.hamming) for r in simhash_near_duplicates(d, n_bits=16, d=2).collect()}
    banded_rows = simhash_banded_near_duplicates(d, n_bits=16, d=2, n_bands=4).collect()
    banded = {(r.id_a, r.id_b, r.hamming) for r in banded_rows}
    assert len(banded_rows) == len(banded)  # exactly-once
    assert banded == probe  # two plans, one mathematical object


@PROP
@given(txts=texts)
def test_near_dedup_output_invariants(spark, txts):
    from pystreamfs_spark.operators.dedup import near_dedup

    d = _docs(spark, txts)
    rows = near_dedup(d, n_bands=4, k=3, min_shared_bands=2).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(txts)))  # each doc once
    comp = {r.doc_id: r.component for r in rows}
    for r in rows:
        assert comp[r.component] == r.component  # components are min-labeled roots
        assert r.component <= r.doc_id
        assert r.is_canonical == (r.doc_id == r.component)
    roots = {c for c in comp.values()}
    assert sum(1 for r in rows if r.is_canonical) == len(roots)  # one keeper per cluster


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
