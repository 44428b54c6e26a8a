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


def test_markov_model_beats_iid_on_blocks(spark):
    """On the autocorrelated blocks fixture (32-token homogeneous runs), the
    bigram-chain survivor model must (a) predict leaf survivors much closer
    to reality than iid for a block-boundary pattern, and (b) choose a start
    level whose measured probe total is no worse — the ConfidenceExperiment
    methodology applied to CostFunctionMarkov."""
    from hierarchical_bloom_filter_index_spark.plans.markov import (
        MarkovModel,
        markov_expected_survivors,
    )
    from hierarchical_bloom_filter_index_spark.plans.cost import choose_start_level

    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=64, seed=11)
    corp = C.generate_corpus(spark, sf=0.003, seed=11).filter(F.col("source") == "blocks").cache()
    idx = build_index(corp, cfg).cache()
    stats = index_stats(idx, cfg)
    freq = frequency_summary(corp, cfg)
    model = MarkovModel.fit(corp)

    # a real block-boundary pattern [a,a,b,b]: tokens individually common,
    # the SEQUENCE rare (only at block boundaries)
    doc = corp.filter(F.col("n_tok") >= 96).orderBy("doc_id").first()
    toks = doc["tokens"]
    i = next(j for j in range(1, len(toks) - 2) if toks[j] != toks[j + 1])
    pat = [toks[i - 1], toks[i], toks[i + 1], toks[i + 2]]
    assert pat[0] == pat[1] != pat[2] == pat[3]

    keys, _ = pattern_keys(pat, cfg)
    probs = freq.estimate(keys.astype(np.int64)) / max(1, freq.total)
    deep = int(stats["level"].max())

    sout: dict = {}
    pattern_search(corp, idx, cfg, pat, start_level=0, stats_out=sout).count()
    actual = sout["survivors"][deep]
    pred_iid = expected_survivors(stats, probs, deep)
    pred_mkv = markov_expected_survivors(model, pat, stats, deep)
    err = lambda p: abs(np.log((p + 1.0) / (actual + 1.0)))
    assert err(pred_mkv) < err(pred_iid), (
        f"markov {pred_mkv:.1f} vs iid {pred_iid:.1f}, actual {actual}"
    )

    # planner quality: run the cascade from each model's chosen seed level
    lvl_mkv = choose_start_level(stats, probs, len(pat), model="markov",
                                 markov=model, pattern=pat)
    lvl_iid = choose_start_level(stats, probs, len(pat), model="iid")
    def probed(lvl):
        so: dict = {}
        pattern_search(corp, idx, cfg, pat, start_level=lvl, stats_out=so).count()
        return sum(so["windows_probed"].values())
    assert probed(lvl_mkv) <= probed(lvl_iid)

    # the markov= route through pattern_search returns identical matches
    a = sorted(map(tuple, pattern_search(corp, idx, cfg, pat, start_level="auto",
                                         freq=freq, stats=stats, markov=model).collect()))
    b = sorted(map(tuple, pattern_search(corp, idx, cfg, pat, start_level=0).collect()))
    assert a == b
    corp.unpersist(); idx.unpersist()


def test_variable_order_ngram_model_fits_and_plans(spark):
    """NgramModel (variable-order context, the reference's NgramModel role):
    distributed fit, longer-context probabilities sharper than order-1 on
    autocorrelated data, and drop-in use as the planner's chain model."""
    from hierarchical_bloom_filter_index_spark.plans.markov import (
        MarkovModel,
        NgramModel,
    )
    from hierarchical_bloom_filter_index_spark.plans.cost import choose_start_level

    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=64, seed=19)
    corp = C.generate_corpus(spark, sf=0.003, seed=19).filter(F.col("source") == "blocks").cache()
    idx = build_index(corp, cfg).cache()
    stats = index_stats(idx, cfg)
    m2 = NgramModel.fit(corp, order=2)
    m1 = MarkovModel.fit(corp)

    doc = corp.filter(F.col("n_tok") >= 96).orderBy("doc_id").first()
    toks = doc["tokens"]
    pat = list(toks[:4])  # an in-block run: actually occurs
    assert m2.occurrence_prob(pat) > 0
    # inside a homogeneous run, [a,a] -> a is near-certain; order-2 context
    # must price the run at least as high as order-1 (it can only sharpen)
    run = list(toks[:3])
    assert m2.occurrence_prob(run) >= 0.9 * m1.occurrence_prob(run)

    keys, _ = pattern_keys(pat, cfg)
    lvl = choose_start_level(stats, np.zeros(len(keys)), len(pat),
                             model="markov", markov=m2, pattern=pat)
    assert 0 <= lvl <= int(stats["level"].max())
    got = sorted(map(tuple, pattern_search(corp, idx, cfg, pat, start_level="auto",
                                           stats=stats, markov=m2).collect()))
    exp = sorted(map(tuple, pattern_search(corp, idx, cfg, pat, start_level=0).collect()))
    assert got == exp and len(exp) > 0
    corp.unpersist(); idx.unpersist()
