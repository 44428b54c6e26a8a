"""Versioned zone-mapped tables (operators/vtable.py): snapshot isolation
under upsert/delete, time travel byte-parity, expiry deletes only
unreferenced files, guards."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators import vtable as V

N = 5_000


def _base(spark):
    return spark.range(N).select(
        F.col("id").alias("k"),
        (F.col("id") % 101).alias("v"))


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "v").collect())


@pytest.fixture()
def table(spark):
    base = tempfile.mkdtemp(prefix="hbi_vtable_")
    path = f"{base}/t"
    V.create_table(_base(spark), path, stat_cols=("k",), sum_cols=("v",),
                   n_files=8)
    yield path
    shutil.rmtree(base, ignore_errors=True)


def test_snapshot_isolation_and_time_travel(spark, table):
    v0_rows = _rows(V.read_table(spark, table, 0))
    assert v0_rows == _rows(_base(spark))
    # v1: upsert a narrow key slab + inserts
    updates = _base(spark).where(F.col("k").between(1000, 1400)).select(
        "k", (F.col("v") + 1000).alias("v"))
    inserts = spark.range(5).select((F.col("id") + N + 100).alias("k"),
                                    F.lit(7).alias("v"))
    res1 = V.upsert(spark, table, updates.unionByName(inserts), "k")
    assert res1["version"] == 1
    assert 0 < res1["n_files_touched"] < res1["n_files_total"]
    # v2: delete the middle band
    res2 = V.delete_range(spark, table, "k", 2000, 4000)
    assert res2["version"] == 2
    assert res2["n_files_dropped"] > 0  # metadata-only in the map
    # EVERY snapshot still reads its own state
    assert _rows(V.read_table(spark, table, 0)) == v0_rows
    want1 = {k: v for k, v in v0_rows}
    for k in range(1000, 1401):
        want1[k] = (k % 101) + 1000
    for i in range(5):
        want1[N + 100 + i] = 7
    got1 = _rows(V.read_table(spark, table, 1))
    assert got1 == sorted(want1.items())
    want2 = sorted((k, v) for k, v in want1.items() if not 2000 <= k <= 4000)
    assert _rows(V.read_table(spark, table, 2)) == want2
    # latest == v2; range read matches
    assert _rows(V.read_table(spark, table)) == want2
    got_rng = _rows(V.read_table_range(spark, table, "k", 500, 1200))
    assert got_rng == [p for p in want2 if 500 <= p[0] <= 1200]
    assert V.list_versions(table) == [0, 1, 2]


def test_expiry_keeps_only_referenced_files(spark, table):
    updates = _base(spark).where(F.col("k").between(100, 400)).select(
        "k", (F.col("v") * 2).alias("v"))
    V.upsert(spark, table, updates, "k")
    V.delete_range(spark, table, "k", 3000, 4500)
    before = _rows(V.read_table(spark, table, 2))
    res = V.expire_snapshots(spark, table, keep_from_version=2)
    assert res["n_versions_expired"] == 2
    assert res["n_files_deleted"] > 0
    assert V.list_versions(table) == [2]
    assert _rows(V.read_table(spark, table, 2)) == before
    with pytest.raises(ValueError, match="expired or never committed"):
        V.read_table(spark, table, 0)
    # every file the survivor references still exists on disk
    for r in V.table_map(spark, table, 2).select("_file").collect():
        p = r["_file"]
        assert os.path.exists(p[5:] if p.startswith("file:") else p)
    # idempotent
    assert V.expire_snapshots(spark, table, 2)["n_versions_expired"] == 0


def test_guards(spark, table):
    with pytest.raises(ValueError, match="already holds"):
        V.create_table(_base(spark), table, stat_cols=("k",))
    with pytest.raises(ValueError, match="NULL source keys"):
        V.upsert(spark, table,
                 spark.createDataFrame([(None, 1)], "k long, v long"), "k")
    with pytest.raises(ValueError, match="duplicate source keys"):
        V.upsert(spark, table,
                 spark.createDataFrame([(1, 1), (1, 2)], "k long, v long"),
                 "k")
    with pytest.raises(ValueError, match="drop EVERY version"):
        V.expire_snapshots(spark, table, keep_from_version=99)
    # a TORN commit (dir without _SUCCESS) is invisible and gets replaced
    os.makedirs(f"{table}/versions/v000001")
    assert V.list_versions(table) == [0]
    res = V.upsert(spark, table,
                   spark.createDataFrame([(1, 5)], "k long, v long"), "k")
    assert res["version"] == 1 and V.list_versions(table) == [0, 1]
    # a COMMITTED version refuses re-commit (single-writer contract)
    with pytest.raises(ValueError, match="single-writer"):
        V._commit(spark, table, 1, V.table_map(spark, table, 1))


def test_pure_insert_and_null_rows(spark):
    base = tempfile.mkdtemp(prefix="hbi_vtable_null_")
    try:
        path = f"{base}/t"
        df = _base(spark).withColumn(
            "k", F.when(F.col("v") % 37 == 0, None).otherwise(F.col("k")))
        V.create_table(df, path, stat_cols=("k",), n_files=4)
        far = spark.createDataFrame([(10**7, 1)], "k long, v long")
        res = V.upsert(spark, path, far, "k")
        assert res["n_files_touched"] == 0
        # NULL-k rows survive any range delete (boundary scan keeps them)
        V.delete_range(spark, path, "k", 0, 10**8)
        left = V.read_table(spark, path).collect()
        assert all(r["k"] is None for r in left)
        assert len(left) == df.where(F.col("k").isNull()).count()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_metadata_stats_and_diff_through_versions(spark):
    base = tempfile.mkdtemp(prefix="hbi_vtable_stats_")
    try:
        path = f"{base}/t"
        df = _base(spark)
        V.create_table(df, path, stat_cols=("k",), sum_cols=("v",), n_files=8)
        updates = df.where(F.col("k").between(800, 1200)).select(
            "k", (F.col("v") + 500).alias("v"))
        V.upsert(spark, path, updates, "k")
        lo, hi = 500, 3500
        for ver, frame in ((0, df),
                           (1, df.where(~F.col("k").between(800, 1200))
                            .unionByName(updates))):
            want_n = frame.where(F.col("k").between(lo, hi)).count()
            want_s = int(frame.where(F.col("k").between(lo, hi))
                         .agg(F.sum("v")).first()[0])
            assert V.table_count_range(spark, path, "k", lo, hi,
                                       version=ver) == want_n
            assert V.table_sum_range(spark, path, "k", "v", lo, hi,
                                     version=ver) == want_s
        # diff_versions: exactly the updated keys read 'changed'
        d = {r["k"]: r["status"] for r in V.diff_versions(
            spark, path, 0, 1, "k", ["v"]).collect()}
        assert set(d.values()) == {"changed"}
        assert set(d) == set(range(800, 1201))
    finally:
        shutil.rmtree(base, ignore_errors=True)
