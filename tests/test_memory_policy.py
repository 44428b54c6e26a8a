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
