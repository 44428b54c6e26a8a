"""Query statistics (HbiStats analog): probe counters and per-level survivor
counts reported from the routing cascade."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import build_index, pattern_search

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=66)


def test_stats_out_populated(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=66).cache()
    idx = build_index(corp, CFG).cache()
    row = corp.filter(F.col("n_tok") >= 40).first()
    pat = row["tokens"][3:19]
    stats = {}
    df = pattern_search(corp, idx, CFG, pat, start_level=0, stats_out=stats)
    n = df.count()
    assert stats["start_level"] == 0 and stats["deepest"] == CFG.deepest
    levels = list(range(0, CFG.deepest + 1))
    assert sorted(stats["windows_probed"]) == levels
    assert sorted(stats["survivors"]) == levels
    # probes at level 0 cover every tree; survivors never exceed probes
    assert stats["windows_probed"][0] >= stats["survivors"][0] >= 1
    for L in levels[1:]:
        assert stats["windows_probed"][L] >= stats["survivors"][L]
    assert stats["candidate_docs"] >= 1 and n >= 1


def test_stats_on_missing_pattern(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=66).cache()
    idx = build_index(corp, CFG).cache()
    stats = {}
    pat = [99_999] * 8
    assert pattern_search(corp, idx, CFG, pat, start_level=0, stats_out=stats).count() == 0
    # Bloom FPs may keep a few windows alive (fpr=0.02) but the frontier must
    # collapse far below the full window count, and verification returns 0
    assert stats["survivors"][0] <= max(3, stats["windows_probed"][0] // 5)
    last_level = max(stats["survivors"])
    if stats["survivors"][last_level] == 0:
        assert last_level < CFG.deepest or stats["survivors"][CFG.deepest] == 0
