"""Cost-model accuracy vs reality — the ConfidenceExperiment role
(ConfidenceExperiment.java:40-77): compare the model's expected surviving
windows per level against the cascade's actual probe statistics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import (
    build_index,
    frequency_summary,
    index_stats,
    pattern_keys,
    pattern_search,
)
from hierarchical_bloom_filter_index_spark.plans.cost import expected_survivors

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=77)


def test_expected_survivors_tracks_reality(spark):
    corp = C.generate_corpus(spark, sf=0.003, seed=77).cache()
    idx = build_index(corp, CFG).cache()
    stats = index_stats(idx, CFG)
    freq = frequency_summary(corp, CFG)

    rows = corp.filter(F.col("n_tok") >= 48).orderBy("doc_id").limit(4).collect()
    ratios = []
    for i, r in enumerate(rows):
        pat = r["tokens"][i * 5 : i * 5 + 16]
        keys, _ = pattern_keys(pat, CFG)
        probs = freq.estimate(keys.astype(np.int64)) / max(1, freq.total)
        sout: dict = {}
        pattern_search(corp, idx, CFG, pat, start_level=0, stats_out=sout).count()
        actual0 = sout["survivors"][0]
        predicted0 = expected_survivors(stats, probs, 0)
        # the iid model is rough; require order-of-magnitude agreement at the
        # root (the level the seed decision depends on)
        ratios.append((predicted0 + 1) / (actual0 + 1))
    ratios = np.asarray(ratios)
    assert ((ratios > 1 / 30) & (ratios < 30)).all(), f"model off by >30x: {ratios}"

    # directional sanity: a pattern of rare tokens must predict (and get)
    # fewer root survivors than a pattern of the most common tokens
    counts = {r["t"]: r["c"] for r in corp.select(F.explode("tokens").alias("t"))
              .groupBy("t").agg(F.count("*").alias("c")).collect()}
    common = sorted(counts, key=counts.get)[-4:]
    rare = sorted(counts, key=counts.get)[:4]
    p_common = freq.estimate(np.asarray(common, dtype=np.int64)) / freq.total
    p_rare = freq.estimate(np.asarray(rare, dtype=np.int64)) / freq.total
    assert expected_survivors(stats, p_rare, 0) <= expected_survivors(stats, p_common, 0)
