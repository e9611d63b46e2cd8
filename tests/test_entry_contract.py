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


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "fscr" in df.columns
