"""Memory policy: reactive coarse-level dropping keeps answers exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import (
    brute_force_search,
    build_index,
    frequency_summary,
    index_stats,
    pattern_search,
)
from hierarchical_bloom_filter_index_spark.operators.aggregates import (
    collect_sketch,
    sketch_aggregate,
)
from hierarchical_bloom_filter_index_spark.plans.policy import (
    apply_memory_policy,
    choose_drop_level,
    low_quantile_token_prob,
)
from hierarchical_bloom_filter_index_spark.sketches import HopsSampler

CFG = HbiConfig(tree_span=512, leaf_span=32, fpr=0.02, vocab=4096, seed=44)


def test_reactive_policy_end_to_end(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=44).cache()
    idx = build_index(corp, CFG).cache()
    stats = index_stats(idx, CFG)
    freq = frequency_summary(corp, CFG)
    sampler = collect_sketch(
        sketch_aggregate(corp, "tokens", lambda: HopsSampler(b=8, seed=44), values_are_arrays=True)
    )
    p_low = low_quantile_token_prob(freq, sampler, 0.05)
    assert p_low >= 0.0
    compacted, lp = apply_memory_policy(idx, stats, freq, sampler)
    assert 0 <= lp <= CFG.deepest
    kept = sorted(r["level"] for r in compacted.select("level").distinct().collect())
    assert kept == [L for L in CFG.levels if L >= lp]
    # answers stay exact on the compacted index (start at or below lp)
    row = corp.filter(F.col("n_tok") >= 40).first()
    pat = row["tokens"][5:21]
    got = sorted((r["doc_id"], r["pos"]) for r in
                 pattern_search(corp, compacted, CFG, pat, start_level=lp).collect())
    exp = sorted((r["doc_id"], r["pos"]) for r in brute_force_search(corp, pat).collect())
    assert got == exp


def test_compacted_index_long_pattern_falls_back_exact(spark):
    """A compacted index whose shallowest surviving span is SHORTER than the
    pattern has no level that can prune it — the search must fall back to the
    exact scan, not silently return empty (regression: the seed-level clamp
    used to push the start level past deepest_usable_level, making the
    descent range empty)."""
    from hierarchical_bloom_filter_index_spark.operators.build import compact_index
    from hierarchical_bloom_filter_index_spark.operators.route import window_membership

    corp = C.generate_corpus(spark, sf=0.002, seed=45).cache()
    idx = build_index(corp, CFG).cache()
    # drop every level with span > 64: kept spans {64, 32} (levels 3, 4)
    lp = 3
    compacted = compact_index(idx, lp).cache()
    stats = index_stats(compacted, CFG)
    assert int(stats["level"].min()) == lp

    row = corp.filter(F.col("n_tok") >= 140).first()
    pat = row["tokens"][10:110]  # m=100 > kept span 64 -> no usable level
    exp = sorted((r["doc_id"], r["pos"]) for r in brute_force_search(corp, pat).collect())
    assert exp  # the pattern really occurs
    for sl in (None, "auto"):
        freq = frequency_summary(corp, CFG) if sl == "auto" else None
        got = sorted(
            (r["doc_id"], r["pos"])
            for r in pattern_search(corp, compacted, CFG, pat, start_level=sl,
                                    stats=stats, freq=freq).collect()
        )
        assert got == exp

    # window_membership at a DROPPED level: Bloom can't prune there — exact
    # corpus fallback, not an empty result
    token = int(row["tokens"][0])
    span0 = CFG.tree_span  # level 0 span
    exp_w = sorted(
        {(r["doc_id"], p // span0)
         for r in corp.collect() for p, t in enumerate(r["tokens"]) if t == token}
    )
    got_w = sorted(
        (r["doc_id"], r["w_id"])
        for r in window_membership(corp, compacted, CFG, token, level=0,
                                   stats=stats).collect()
    )
    assert got_w == exp_w
    idx.unpersist(); compacted.unpersist(); corp.unpersist()


def test_choose_drop_level_monotone():
    import pandas as pd

    rows = []
    span = 512
    for L in range(5):
        rows.append({"level": L, "span": span >> L, "fill_fpr": 1e-4, "n_windows": 10 * (1 << L),
                     "m": 100, "k": 5, "avg_fill": 0.1, "total_items": 1000, "avg_items": 10})
    stats = pd.DataFrame(rows)
    # more common low-quantile tokens => coarse levels less useful => higher lp
    assert choose_drop_level(stats, 0.05) >= choose_drop_level(stats, 1e-7)


def test_predictive_build_never_materializes_dropped_levels(spark):
    """PREDICTIVE policy: lp is decided from a prior sample and the coarse
    levels are never built — rows equal REACTIVE's build-then-compact
    exactly, and auto-planned search on the compacted stats stays exact
    (regression: seeding below min present level returned no matches)."""
    from hierarchical_bloom_filter_index_spark.operators import (
        brute_force_search,
        build_index,
        frequency_summary,
        index_stats,
        pattern_search,
    )
    from hierarchical_bloom_filter_index_spark.operators.aggregates import (
        collect_sketch,
        sketch_aggregate,
    )
    from hierarchical_bloom_filter_index_spark.operators.build import compact_index
    from hierarchical_bloom_filter_index_spark.plans.policy import predictive_build
    from hierarchical_bloom_filter_index_spark.sketches import HopsSampler

    corp = C.generate_corpus(spark, sf=0.002, seed=31).cache()
    freq = frequency_summary(corp, CFG)
    sampler = collect_sketch(
        sketch_aggregate(corp, "tokens", lambda: HopsSampler(b=6, seed=CFG.seed),
                         values_are_arrays=True)
    )
    # q=0.95: plan for the common-token regime — coarse windows provably
    # reject nothing for them, so lp lands > 0 and those levels are skipped
    idx_pred, lp = predictive_build(corp, CFG, freq, sampler, q=0.95)
    assert lp > 0

    def rows(df):
        return sorted(
            (r["doc_id"], r["level"], r["w_id"], bytes(r["bloom"]))
            for r in df.select("doc_id", "level", "w_id", "bloom").collect()
        )

    reactive = compact_index(build_index(corp, CFG), lp)  # same lp, built fully
    assert rows(idx_pred) == rows(reactive)
    assert idx_pred.agg(F.min("level")).first()[0] == lp

    # auto-planned search against the compacted index: stats reflect only
    # the surviving levels; the seed level is clamped to them
    idx_pred = idx_pred.cache()
    stats = index_stats(idx_pred, CFG)
    doc = corp.filter(F.col("n_tok") >= 64).orderBy("doc_id").first()
    pat = doc["tokens"][5:17]
    sout: dict = {}
    got = sorted(map(tuple, pattern_search(
        corp, idx_pred, CFG, pat, start_level="auto", freq=freq, stats=stats,
        stats_out=sout).collect()))
    exp = sorted(map(tuple, brute_force_search(corp, pat).collect()))
    assert got == exp and len(exp) > 0
    assert sout["start_level"] >= lp
    # even a pinned start level below lp must not lose matches
    got0 = sorted(map(tuple, pattern_search(
        corp, idx_pred, CFG, pat, start_level=0, stats=stats).collect()))
    assert got0 == exp
    idx_pred.unpersist(); corp.unpersist()
