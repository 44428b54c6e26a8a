"""Incremental near-dup against a persisted MinHash index: parity with the
full-corpus LSH run, meta pinning, and the streaming replay guard."""

import shutil

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators import dedup as D


@pytest.fixture(scope="module")
def split(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text").cache()
    docs.count()
    is_new = F.col("doc_id").cast("long") % 5 == 0
    return docs, docs.filter(is_new), docs.filter(~is_new)


def _pairs(df):
    return {(r["new_id"], r["corpus_id"], r["jaccard"]) for r in df.collect()}


def test_against_index_matches_full_run(split, tmp_path):
    docs, new, old = split
    path = str(tmp_path / "mh")
    D.write_minhash_index(old, path, n_perm=128, bands=16)
    inc = _pairs(D.neardup_against_index(new, old, path, threshold=0.8))
    assert inc, "no crossing near-dup pairs — vacuous fixture"
    full = D.minhash_lsh_pairs(docs, threshold=0.8, n_perm=128, bands=16)
    a_new = F.col("doc_a").cast("long") % 5 == 0
    b_new = F.col("doc_b").cast("long") % 5 == 0
    crossing = _pairs(full.filter(a_new != b_new).select(
        F.when(a_new, F.col("doc_a")).otherwise(F.col("doc_b")).alias("new_id"),
        F.when(a_new, F.col("doc_b")).otherwise(F.col("doc_a")).alias("corpus_id"),
        "jaccard"))
    assert inc == crossing


def test_meta_is_pinned(split, tmp_path):
    """Queries take signature geometry from the index, never the caller:
    an index written with non-default params still pairs correctly."""
    _, new, old = split
    path = str(tmp_path / "mh_alt")
    D.write_minhash_index(old, path, n_perm=64, bands=8, shingle_n=4, seed=7)
    _, meta = D.read_minhash_index(new.sparkSession, path)
    assert meta == {"n_perm": 64, "bands": 8, "shingle_n": 4, "seed": 7}
    inc = D.neardup_against_index(new, old, path, threshold=0.8)
    # same-geometry manual run must agree exactly
    sig_new = D.minhash_signatures(new, 64, 4, 7)
    sig_old = D.minhash_signatures(old, 64, 4, 7)
    bn = D.band_buckets(sig_new, 8, 64).alias("a")
    bo = D.band_buckets(sig_old, 8, 64).alias("b")
    cand = bn.join(bo, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.doc_id") != F.col("b.doc_id"))).select(
        F.col("a.doc_id").alias("new_id"),
        F.col("b.doc_id").alias("corpus_id")).distinct()
    paired = D._join_texts(cand, new, old, "text", "doc_id",
                           "new_id", "corpus_id")
    want = D._verify_jaccard(paired, 4, 0.8, "new_id", "corpus_id")
    assert _pairs(inc) == _pairs(want)


def test_stream_replay_guard(split, spark, tmp_path):
    """A second drain of the SAME input through a FRESH checkpoint (the
    at-least-once replay in the extreme) must not duplicate pairs — the
    batch_id probe suppresses re-appends."""
    _, new, old = split
    work = str(tmp_path)
    D.write_minhash_index(old, f"{work}/mh", n_perm=128, bands=16)
    half = F.col("doc_id").cast("long") % 2
    new.filter(half == 0).write.mode("overwrite").parquet(f"{work}/in")
    new.filter(half == 1).write.mode("append").parquet(f"{work}/in")

    def drain(chk):
        stream = spark.readStream.schema(new.schema).option(
            "maxFilesPerTrigger", "1").parquet(f"{work}/in")
        q = D.incremental_neardup_stream(
            stream, old, f"{work}/mh", f"{work}/out", chk, threshold=0.8)
        assert q.awaitTermination(300)

    drain(f"{work}/chk1")
    got1 = spark.read.parquet(f"{work}/out").drop("batch_id")
    want = D.neardup_against_index(new, old, f"{work}/mh", threshold=0.8)
    assert _pairs(got1) == _pairs(want) and _pairs(want)
    # full replay: fresh checkpoint re-delivers every batch with the same
    # batch ids — the output must be byte-identical afterwards
    drain(f"{work}/chk2")
    got2 = spark.read.parquet(f"{work}/out").drop("batch_id")
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, got1.collect()))
    shutil.rmtree(f"{work}/out", ignore_errors=True)


def test_batched_signatures_match_per_doc_reference(split):
    """minhash_signatures (whatever its kernel/partitioning) is
    byte-identical to the straightforward per-doc reference — pins the
    wire contract across kernel experiments (round 5 tried and reverted
    a cross-doc reduceat batch; the rebalance must not change values)."""
    import numpy as np

    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        _U64, char_shingle_hashes)
    from hierarchical_bloom_filter_index_spark.sketches.hashing import (
        splitmix64)

    docs, _, _ = split
    n_perm, shingle_n, seed = 64, 5, 42
    sig = {r["doc_id"]: np.array(r["sig"])
           for r in D.minhash_signatures(
               docs.limit(200), n_perm, shingle_n, seed).collect()}
    perm_seeds = splitmix64(
        np.arange(n_perm, dtype=np.uint64) ^ _U64(seed * 0x9E3779B1))
    rows = docs.limit(200).collect()
    assert len(sig) == len(rows)
    for r in rows:
        h = char_shingle_hashes(r["text"], shingle_n)
        ref = splitmix64(h[:, None] ^ perm_seeds[None, :]).min(axis=0)
        assert (sig[r["doc_id"]].astype(np.uint64) == ref).all(), r["doc_id"]
