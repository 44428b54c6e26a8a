"""Catalog layer (operators/catalog.py): names, immutable tags, CAS
branches, ref-pinned retention."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators import catalog as CAT
from hierarchical_bloom_filter_index_spark.operators import vtable as V


def _df(spark, n=2000, off=0):
    return spark.range(n).select(
        (F.col("id") + off).alias("k"), (F.col("id") % 31).alias("v"))


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "v").collect())


@pytest.fixture()
def root(spark):
    base = tempfile.mkdtemp(prefix="hbi_catalog_")
    yield base
    shutil.rmtree(base, ignore_errors=True)


def test_create_list_drop_and_name_guards(spark, root):
    assert CAT.list_tables(root) == []
    CAT.create_catalog_table(_df(spark), root, "t1", stat_cols=("k",))
    CAT.create_catalog_table(_df(spark), root, "t2", stat_cols=("k",))
    assert CAT.list_tables(root) == ["t1", "t2"]
    with pytest.raises(ValueError):  # duplicate name
        CAT.create_catalog_table(_df(spark), root, "t1", stat_cols=("k",))
    with pytest.raises(ValueError):  # unsafe name
        CAT.create_catalog_table(_df(spark), root, "../esc", stat_cols=("k",))
    CAT.drop_table(root, "t1")
    assert CAT.list_tables(root) == ["t2"]
    with pytest.raises(ValueError):
        CAT.drop_table(root, "t1")
    # a bare directory without commits is invisible
    os.makedirs(f"{root}/tables/ghost/versions", exist_ok=True)
    assert CAT.list_tables(root) == ["t2"]


def test_tags_branches_resolution(spark, root):
    CAT.create_catalog_table(_df(spark), root, "t", stat_cols=("k",))
    path = CAT.table_path(root, "t")
    V.upsert(spark, path, _df(spark, 50, off=10_000), "k")  # v1
    V.upsert(spark, path, _df(spark, 50, off=20_000), "k")  # v2

    assert CAT.create_tag(root, "t", "rel0", version=0) == 0
    with pytest.raises(ValueError):  # tags are immutable
        CAT.create_tag(root, "t", "rel0", version=1)
    with pytest.raises(ValueError):  # uncommitted version
        CAT.create_tag(root, "t", "future", version=9)

    assert CAT.set_branch(root, "t", "main") == 2  # create at current
    with pytest.raises(ValueError):  # CAS: wrong expectation
        CAT.set_branch(root, "t", "main", version=1, expect=0)
    assert CAT.set_branch(root, "t", "main", version=1, expect=2) == 1

    assert CAT.list_refs(root, "t") == {"tag.rel0": 0, "branch.main": 1}
    assert CAT.resolve_ref(root, "t", "tag.rel0") == 0
    assert CAT.resolve_ref(root, "t", "branch.main") == 1
    assert CAT.resolve_ref(root, "t", None) == 2
    with pytest.raises(ValueError):
        CAT.resolve_ref(root, "t", "tag.nope")

    # reads by ref == time-travel reads by the resolved version
    assert _rows(CAT.load_table(spark, root, "t", "tag.rel0")) == _rows(
        V.read_table(spark, path, 0))
    assert _rows(CAT.load_table(spark, root, "t", "branch.main")) == _rows(
        V.read_table(spark, path, 1))
    assert _rows(CAT.load_table(spark, root, "t")) == _rows(
        V.read_table(spark, path, 2))


def test_branch_lock_and_recovery(spark, root):
    CAT.create_catalog_table(_df(spark), root, "t", stat_cols=("k",))
    CAT.set_branch(root, "t", "main")
    lock = f"{root}/refs/t/branch.main.lock"
    open(lock, "w").close()  # simulate a crashed writer holding the lock
    with pytest.raises(ValueError):
        CAT.set_branch(root, "t", "main", expect=0)
    assert CAT.break_branch_lock(root, "t", "main") is True
    assert CAT.break_branch_lock(root, "t", "main") is False
    assert CAT.set_branch(root, "t", "main", expect=0) == 0


def test_refs_pin_retention(spark, root):
    CAT.create_catalog_table(_df(spark), root, "t", stat_cols=("k",))
    path = CAT.table_path(root, "t")
    V.upsert(spark, path, _df(spark, 50, off=10_000), "k")  # v1
    V.upsert(spark, path, _df(spark, 50, off=20_000), "k")  # v2
    CAT.create_tag(root, "t", "rel0", version=0)
    with pytest.raises(ValueError):  # the tag pins v0
        CAT.expire_table_snapshots(spark, root, "t", keep_from_version=1)
    CAT.drop_ref(root, "t", "tag.rel0")
    with pytest.raises(ValueError):
        CAT.drop_ref(root, "t", "tag.rel0")  # already gone
    res = CAT.expire_table_snapshots(spark, root, "t", keep_from_version=1)
    assert res["n_versions_expired"] == 1
    assert V.list_versions(path) == [1, 2]
    with pytest.raises(ValueError):  # expired version refuses cleanly
        CAT.load_table(spark, root, "t", 0)
    # surviving snapshots still read
    assert len(_rows(CAT.load_table(spark, root, "t"))) == 2100
