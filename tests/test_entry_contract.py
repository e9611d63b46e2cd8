"""Driver-contract conformance: every queries() entry runs; every oracle_sql()
entry produces the identical relation in DuckDB (same columns, dtypes-kind,
row multiset) at sf0.001 — a stricter local version of the driver's
row-count + schema + value-hash comparison at sf0.01."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    rows = []
    for tup in pdf.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                row.append(round(v, 9))
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


ORACLES = sorted(entry_mod.oracle_sql())
ALL = sorted(entry_mod.queries())
ROWS_ONLY = [q for q in ALL if q not in ORACLES]


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, sf_dir).toPandas()
    duck_pdf = ddb.sql(entry_mod.oracle_sql()[name]).df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), f"{name}: column names"
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {a[mism[0]]} vs {b[mism[0]]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    assert df.count() > 0, name
    assert len(df.schema.fields) > 0


def test_bpe_pattern_identity_and_vtab_parity(spark, ddb):
    """The oracle's inlined BPE regex must stay byte-identical to the
    engine's, and the explicit [ \\t\\n\\f\\r] whitespace class must make
    Spark (Java regex) and DuckDB (RE2) agree on \\x0B, where \\s diverges
    (ADVICE r02)."""
    from pystreamfs_spark.functions.text import BPE_SPLIT_PATTERN, bpe_token_estimate

    assert entry_mod._BPE_SQL == BPE_SPLIT_PATTERN.replace("'", "''")

    docs = ["a\x0bb", "one two\x0b\x0bthree", "plain text", "tab\there", "'s\x0b'll"]
    import pyspark.sql.functions as F

    sdf = spark.createDataFrame([(d,) for d in docs], ["text"])
    got = [r.n for r in sdf.select(bpe_token_estimate(F.col("text")).alias("n")).collect()]
    pat = entry_mod._BPE_SQL
    want = [
        ddb.sql(
            f"SELECT len(regexp_extract_all(?, '{pat}')) AS n", params=[d]
        ).fetchone()[0]
        for d in docs
    ]
    assert got == want, f"engine {got} vs duckdb {want}"


def test_pii_pattern_identity(spark, ddb):
    """The oracle's inlined PII regexes must stay byte-identical to the
    engine's (same no-drift guarantee as the BPE pattern), and Spark (Java
    regex) and DuckDB (RE2) must count/mask identically on boundary cases."""
    from pystreamfs_spark.functions.text import EMAIL_PATTERN, PHONE_PATTERN, mask_pii

    assert entry_mod._EMAIL_SQL == EMAIL_PATTERN.replace("'", "''")
    assert entry_mod._PHONE_SQL == PHONE_PATTERN.replace("'", "''")

    docs = [
        "a@b.io plus +49 30-901820 end",
        "dotty..name@x.y.zz 12 34-567890123",
        "no match 1234567",
        "e@d.c f@g.hh 00 00-00",
    ]
    import pyspark.sql.functions as F

    sdf = spark.createDataFrame([(d,) for d in docs], ["text"])
    got = [r.m for r in sdf.select(mask_pii(F.col("text")).alias("m")).collect()]
    want = [
        ddb.sql(
            f"SELECT regexp_replace(regexp_replace(?, '{entry_mod._EMAIL_SQL}', '<EMAIL>', 'g'),"
            f" '{entry_mod._PHONE_SQL}', '<PHONE>', 'g')",
            params=[d],
        ).fetchone()[0]
        for d in docs
    ]
    assert got == want, f"engine {got} vs duckdb {want}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "fscr" in df.columns
