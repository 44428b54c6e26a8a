"""Per-doc takedown lifecycle over persisted artifacts: the doc-sharded
layout (sources/io), the MinHash signature index, and the IVF inverted
lists. Contracts: takedown == scratch build on the remaining corpus,
untouched partitions' files are never rewritten, emptied directories are
dropped, absent ids are a no-op (replay idempotence)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import dedup as D
from hierarchical_bloom_filter_index_spark.operators import similarity as S
from hierarchical_bloom_filter_index_spark.operators.build import build_index
from hierarchical_bloom_filter_index_spark.sources import io as IO

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=11)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text").cache()
    d.count()
    return d


def _rows(df):
    return sorted(
        (r["doc_id"], r["level"], r["w_id"], bytes(r["bloom"]),
         r["n_items"], r["bits_set"])
        for r in df.collect())


def _shard_files(path):
    """{shard_dir: {(filename, mtime_ns)}} snapshot of a partitioned dir."""
    out = {}
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if not os.path.isdir(full):
            continue
        out[d] = {(f, os.stat(os.path.join(full, f)).st_mtime_ns)
                  for f in os.listdir(full) if not f.startswith(".")}
    return out


@pytest.fixture(scope="module")
def doc_index(spark, sf_dir):
    from hierarchical_bloom_filter_index_spark.corpus import corpus_from_documents

    idx = build_index(corpus_from_documents(spark, sf_dir), CFG).cache()
    idx.count()
    return idx


def test_takedown_equals_scratch_filter(spark, docs, doc_index, tmp_path):
    idx = doc_index
    path = str(tmp_path / "doc_idx")
    IO.write_index_doc_sharded(idx, path, id_col="doc_id")

    removed = [r["doc_id"] for r in docs.limit(7).collect()]
    n = IO.takedown_doc_index(spark, path, removed)
    assert n > 0

    back = IO.read_index_doc_sharded(spark, path)
    expect = idx.filter(~F.col("doc_id").isin(removed))
    assert _rows(back) == _rows(expect)

    # replay idempotence: same takedown again touches nothing
    assert IO.takedown_doc_index(spark, path, removed) == 0
    # absent ids are a no-op too
    assert IO.takedown_doc_index(spark, path, ["no-such-doc-xyz"]) == 0


def test_untouched_shards_not_rewritten(spark, docs, doc_index, tmp_path):
    idx = doc_index
    path = str(tmp_path / "doc_idx2")
    IO.write_index_doc_sharded(idx, path, id_col="doc_id")
    before = _shard_files(f"{path}/shards")

    removed = [docs.first()["doc_id"]]
    n = IO.takedown_doc_index(spark, path, removed)
    assert n >= 1
    after = _shard_files(f"{path}/shards")

    # the removed doc's shard(s) changed; every other shard is byte-stable
    changed = {d for d in before if before[d] != after.get(d)}
    assert len(changed) == n
    for d in before:
        if d not in changed:
            assert after[d] == before[d]


def test_emptied_shard_dir_removed(spark, tmp_path):
    # two docs per shard-candidate; remove every row of one shard
    df = spark.createDataFrame(
        [(f"d{i}", i) for i in range(40)], "doc_id string, v int")
    path = str(tmp_path / "small")
    IO.write_index_doc_sharded(df, path, id_col="doc_id", shard_bits=3)
    # find all docs in one shard
    full = spark.read.parquet(f"{path}/shards")
    one = full.filter(F.col("doc_shard") == full.first()["doc_shard"])
    shard = one.first()["doc_shard"]
    ids = [r["doc_id"] for r in one.collect()]
    IO.takedown_doc_index(spark, path, ids)
    assert not os.path.exists(f"{path}/shards/doc_shard={shard}")
    kept = IO.read_index_doc_sharded(spark, path)
    assert kept.count() == 40 - len(ids)


def test_dataframe_removal_set_matches_list(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"d{i}", i) for i in range(30)], "doc_id string, v int")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    IO.write_index_doc_sharded(df, p1, id_col="doc_id", shard_bits=3)
    IO.write_index_doc_sharded(df, p2, id_col="doc_id", shard_bits=3)
    ids = [f"d{i}" for i in range(0, 30, 4)]
    ids_df = spark.createDataFrame([(x,) for x in ids], "doc_id string")
    assert IO.takedown_doc_index(spark, p1, ids) == \
        IO.takedown_doc_index(spark, p2, ids_df)
    a = sorted(map(tuple, IO.read_index_doc_sharded(spark, p1).collect()))
    b = sorted(map(tuple, IO.read_index_doc_sharded(spark, p2).collect()))
    assert a == b
    assert len(a) == 30 - len(ids)


def test_point_lookup_pruned_read(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"d{i}", i) for i in range(50)], "doc_id string, v int")
    path = str(tmp_path / "pl")
    IO.write_index_doc_sharded(df, path, id_col="doc_id", shard_bits=4)
    got = sorted(map(tuple, IO.read_index_doc_sharded(
        spark, path, doc_ids=["d3", "d17"]).collect()))
    assert got == [("d17", 17), ("d3", 3)]


def test_minhash_takedown_parity(spark, docs, tmp_path):
    path = str(tmp_path / "mh")
    D.write_minhash_index(docs, path, n_perm=64, bands=16)
    removed = [r["doc_id"] for r in docs.limit(5).collect()]
    assert D.takedown_minhash_index(spark, path, removed) > 0

    sig_back, meta = D.read_minhash_index(spark, path)
    rebuilt = D.minhash_signatures(
        docs.filter(~F.col("doc_id").isin(removed)),
        meta["n_perm"], meta["shingle_n"], meta["seed"])
    a = sorted((r["doc_id"], tuple(r["sig"])) for r in sig_back.collect())
    b = sorted((r["doc_id"], tuple(r["sig"])) for r in rebuilt.collect())
    assert a == b

    # a batch re-ingesting a removed doc's text can no longer pair with it
    victim = removed[0]
    batch = docs.filter(F.col("doc_id") == victim).select(
        F.lit("reingest-1").alias("doc_id"), "text")
    pairs = D.neardup_against_index(batch, docs, path, threshold=0.8)
    assert not {r["corpus_id"] for r in pairs.collect()} & set(removed)


def test_ivf_takedown(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p1, p2 = str(tmp_path / "ivf_a"), str(tmp_path / "ivf_b")
    # training is deterministic (hash-ordered sample): two writes agree
    S.write_ivf_index(emb, p1, n_centroids=8)
    S.write_ivf_index(emb, p2, n_centroids=8)

    removed = [r["vec_id"] for r in emb.limit(6).collect()]
    before = _shard_files(f"{p1}/lists")
    n = S.takedown_ivf_index(spark, p1, removed)
    assert n >= 1
    after = _shard_files(f"{p1}/lists")
    changed = {d for d in before if before[d] != after.get(d)}
    assert len(changed) == n  # only the touched lists were rewritten

    got = sorted(
        (r["vec_id"], r["list_id"], tuple(np.round(r["embedding"], 5)))
        for r in spark.read.parquet(f"{p1}/lists").collect())
    expect = sorted(
        (r["vec_id"], r["list_id"], tuple(np.round(r["embedding"], 5)))
        for r in spark.read.parquet(f"{p2}/lists")
        .filter(~F.col("vec_id").isin(removed)).collect())
    assert got == expect

    # idempotent; absent ids no-op
    assert S.takedown_ivf_index(spark, p1, removed) == 0


def test_ivf_emptied_list_removed(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_empty")
    S.write_ivf_index(emb, path, n_centroids=8)
    lists = spark.read.parquet(f"{path}/lists")
    lid = lists.groupBy("list_id").count().orderBy("count", "list_id") \
        .first()["list_id"]
    members = [r["vec_id"]
               for r in lists.filter(F.col("list_id") == lid).collect()]
    S.takedown_ivf_index(spark, path, members)
    assert not os.path.exists(f"{path}/lists/list_id={lid}")
    left = spark.read.parquet(f"{path}/lists")
    assert left.filter(F.col("list_id") == lid).count() == 0


def test_window_sketch_index_takedown(spark, sf_dir, tmp_path):
    """The sharded layout is schema-agnostic: the CMS window-sketch index
    (per-doc blob rows) rides write/takedown/read unchanged — takedown ==
    scratch filter byte-for-byte (doc-axis rows are per-doc pure)."""
    from hierarchical_bloom_filter_index_spark.corpus import (
        corpus_from_documents)
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_cms_window_index)

    idx = build_cms_window_index(
        corpus_from_documents(spark, sf_dir), CFG).cache()
    idx.count()
    path = str(tmp_path / "sk")
    IO.write_index_doc_sharded(idx, path, id_col="doc_id")
    removed = [r["doc_id"] for r in
               idx.select("doc_id").distinct().orderBy("doc_id")
               .limit(5).collect()]
    assert IO.takedown_doc_index(spark, path, removed) > 0

    def rows(d):
        return sorted(
            (r["doc_id"], r["level"], r["w_id"], bytes(r["sketch"]))
            for r in d.collect())

    back = IO.read_index_doc_sharded(spark, path)
    expect = idx.filter(~F.col("doc_id").isin(removed))
    assert rows(back) == rows(expect)
    idx.unpersist()
