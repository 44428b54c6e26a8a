"""Dyadic HLL rollup: parent-from-children merge == from-scratch build
(exact merge law), estimates within the HLL envelope vs exact distincts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators.rollup import (
    build_hll_window_index,
    window_distinct_estimates,
)
from hierarchical_bloom_filter_index_spark.sketches import HyperLogLog, from_bytes

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=12)


@pytest.fixture(scope="module")
def built(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()
    idx = build_hll_window_index(corp, CFG, p=12).cache()
    idx.count()
    return corp, idx


def test_rolled_up_levels_equal_scratch_build(spark, built):
    corp, idx = built
    # pick a mid-level window and rebuild its HLL from raw tokens
    row = idx.filter("level = 1").first()
    doc = corp.filter(F.col("doc_id") == row["doc_id"]).first()
    span = CFG.span(1)
    toks = np.asarray(doc["tokens"], dtype=np.int64)[row["w_id"] * span : (row["w_id"] + 1) * span]
    scratch = HyperLogLog(p=12, seed=CFG.seed + 7)
    scratch.update(toks)
    rolled = from_bytes(bytes(row["sketch"]))
    assert np.array_equal(rolled.regs, scratch.regs)  # merge law, register-exact


def test_estimates_within_envelope(spark, built):
    corp, idx = built
    ests = {(r["doc_id"], r["w_id"]): r["est_distinct"]
            for r in window_distinct_estimates(idx, 0).collect()}
    docs = {r["doc_id"]: np.asarray(r["tokens"]) for r in corp.limit(40).collect()}
    span = CFG.span(0)
    checked = 0
    for did, toks in docs.items():
        for w in range(0, (len(toks) + span - 1) // span):
            exact = len(np.unique(toks[w * span : (w + 1) * span]))
            est = ests[(did, w)]
            assert abs(est - exact) / max(exact, 1) <= 5 * 1.04 / np.sqrt(2**12)
            checked += 1
    assert checked >= 40


def test_all_levels_present_with_halving_windows(spark, built):
    _, idx = built
    counts = {r["level"]: r["c"] for r in idx.groupBy("level").agg(F.count("*").alias("c")).collect()}
    assert sorted(counts) == CFG.levels
    for L in range(1, CFG.deepest + 1):
        assert counts[L] >= counts[L - 1]
