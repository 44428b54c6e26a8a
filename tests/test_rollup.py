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


def test_bloom_rollup_equals_scratch_build(spark):
    """uniform_bloom: parents OR-rolled from children must be BYTE-equal to
    the from-scratch multi-level build (Bloom merge law + shared hash
    family), and a non-uniform config must refuse to roll up."""
    from hierarchical_bloom_filter_index_spark.operators.build import (
        build_index,
        build_index_rollup,
    )
    from hierarchical_bloom_filter_index_spark.operators.route import (
        brute_force_search,
        pattern_search,
    )

    cfg = CFG.with_(uniform_bloom=True)
    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()

    def rows(df):
        return sorted(
            (r["doc_id"], r["level"], r["w_id"], bytes(r["bloom"]), r["n_items"], r["bits_set"])
            for r in df.collect()
        )

    scratch = build_index(corp, cfg)
    rolled = build_index_rollup(corp, cfg)
    assert rows(scratch) == rows(rolled)

    with pytest.raises(ValueError):
        build_index_rollup(corp, CFG)  # per-level (m,k): cannot OR children

    # the rolled index answers exactly
    doc = corp.filter(F.col("n_tok") >= 64).orderBy("doc_id").first()
    pat = doc["tokens"][10:22]
    got = sorted(map(tuple, pattern_search(corp, rolled, cfg, pat).collect()))
    exp = sorted(map(tuple, brute_force_search(corp, pat).collect()))
    assert got == exp and len(exp) > 0
    rolled.unpersist()
    corp.unpersist()


def test_bloom_rollup_global_axis(spark):
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.build import (
        build_index,
        build_index_rollup,
    )

    cfg = CFG.with_(uniform_bloom=True, axis="global")
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=13)).cache()

    def rows(df):
        return sorted(
            (r["level"], r["w_id"], bytes(r["bloom"]), r["n_items"], r["bits_set"])
            for r in df.collect()
        )

    scratch = build_index(corp, cfg)
    rolled = build_index_rollup(corp, cfg)
    assert rows(scratch) == rows(rolled)
    rolled.unpersist()
    corp.unpersist()
