"""Streaming lifecycle: batch-incremental append == full rebuild; whole-window
eviction predicate; Structured Streaming foreachBatch maintenance."""

import os
import time

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import build_index
from hierarchical_bloom_filter_index_spark.streaming.incremental import (
    append_increment,
    expire,
    incremental_index_stream,
)

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=9)


def _state(df):
    return sorted(
        (r["doc_id"], r["level"], r["w_id"], bytes(r["bloom"]))
        for r in df.select("doc_id", "level", "w_id", "bloom").collect()
    )


def test_append_increment_equals_rebuild(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=3).cache()
    old = corp.filter(F.col("source") != "markov")
    new = corp.filter(F.col("source") == "markov")
    idx_old = build_index(old, CFG)
    combined = append_increment(idx_old, new, CFG)
    assert _state(combined) == _state(build_index(corp, CFG))


def test_expire_scales_horizon_per_level(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=3)
    cfg = CFG.with_(axis="global")
    idx = build_index(corp, cfg).cache()
    horizon = 64  # leaf windows below 64 evicted
    kept = expire(idx, cfg, horizon)
    rows = kept.groupBy("level").agg(F.min("w_id").alias("mn")).collect()
    for r in rows:
        assert r["mn"] >= horizon >> (cfg.deepest - r["level"])
    # nothing above the horizon was dropped
    assert kept.count() == idx.filter(
        F.expr(f"w_id >= shiftright(CAST({horizon} AS BIGINT), {cfg.deepest} - level)")
    ).count()


def test_structured_streaming_foreachbatch(spark, tmp_path):
    inp = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    corp = C.generate_corpus(spark, sf=0.002, seed=4).cache()
    b1 = corp.filter(F.col("source") == "uniform")
    b2 = corp.filter(F.col("source") == "blocks")

    b1.write.mode("append").parquet(inp)
    q = incremental_index_stream(spark, inp, chk, out, CFG)
    q.awaitTermination(120)

    b2.write.mode("append").parquet(inp)
    q = incremental_index_stream(spark, inp, chk, out, CFG)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expected = build_index(b1.unionByName(b2), CFG)
    assert got.count() == expected.count()
    # exactly-once: batch 2 only processed the new files
    assert got.select("batch_id").distinct().count() == 2
    gs = sorted((r["doc_id"], r["level"], r["w_id"]) for r in got.collect())
    es = sorted((r["doc_id"], r["level"], r["w_id"]) for r in expected.collect())
    assert gs == es
