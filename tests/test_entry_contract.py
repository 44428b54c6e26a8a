"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and diff it against its oracle_sql() twin via DuckDB — row counts,
column names, and order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows(it):
    return sorted(tuple(_norm(x) for x in row) for row in it)


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    q = E.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    rel = duck.sql(E.oracle_sql()[name])
    duck_cols = [c.lower() for c in rel.columns]
    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    srows = _rows(tuple(r) for r in sdf.collect())
    drows = _rows(rel.fetchall())
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    mism = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
    assert not mism, f"{name}: first mismatch {srows[mism[0]]} != {drows[mism[0]]}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "pos"}


@pytest.mark.parametrize("name", sorted(set(E.queries()) - set(E.oracle_sql())))
def test_oracle_free_queries_run(spark, name):
    df = E.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
