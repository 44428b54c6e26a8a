"""Cost-model unit tests (pure python — no Spark needed)."""

import numpy as np
import pandas as pd

from hierarchical_bloom_filter_index_spark.plans.cost import (
    choose_start_level,
    closed_form_pruning_level,
    expected_survivors,
    ie_all_present_prob,
)


def test_ie_all_present_prob_bonferroni():
    probs = np.asarray([0.01, 0.02, 0.005])
    span = 100
    # exact under independence-of-positions model via monte carlo
    rng = np.random.default_rng(0)
    vocab_p = np.concatenate([probs, [1 - probs.sum()]])
    hits = 0
    trials = 4000
    for _ in range(trials):
        draw = rng.choice(4, size=span, p=vocab_p)
        if all((draw == i).any() for i in range(3)):
            hits += 1
    mc = hits / trials
    lower = ie_all_present_prob(probs, span, order=1)   # odd order: lower bound
    upper = ie_all_present_prob(probs, span, order=2)   # even order: upper bound
    assert lower - 0.03 <= mc <= upper + 0.03
    assert ie_all_present_prob(probs, span, order=3) <= upper + 1e-9


def _stats(tree_span=1024, leaf_span=32, n_trees=100, fill=0.3, k=5):
    rows = []
    L = 0
    span = tree_span
    while span >= leaf_span:
        rows.append(
            {"level": L, "n_windows": n_trees * (tree_span // span), "m": 1000, "k": k,
             "span": span, "avg_fill": fill, "fill_fpr": fill**k,
             "total_items": n_trees * tree_span, "avg_items": span}
        )
        L += 1
        span >>= 1
    return pd.DataFrame(rows)


def test_closed_form_monotone_in_pmin():
    # rarer tokens (smaller p_min) allow shallower (coarser) start levels
    lvl_common = closed_form_pruning_level(0.95, 0.1, 6, 1024)
    lvl_rare = closed_form_pruning_level(0.95, 0.00001, 6, 1024)
    assert lvl_rare <= lvl_common


def test_expected_survivors_decreasing_with_depth_for_rare_keys():
    stats = _stats()
    probs = np.asarray([1e-5, 1e-5, 1e-5])
    e0 = expected_survivors(stats, probs, 0)
    e_deep = expected_survivors(stats, probs, int(stats["level"].max()))
    # rare keys: deeper levels have more windows but far lower hit prob each
    assert e_deep < stats[stats["level"] == stats["level"].max()].iloc[0]["n_windows"]
    assert e0 <= stats.iloc[0]["n_windows"]


def test_choose_start_level_common_vs_rare():
    stats = _stats()
    rare = choose_start_level(stats, np.asarray([1e-6] * 4), pattern_len=8)
    common = choose_start_level(stats, np.asarray([0.5] * 4), pattern_len=8)
    # rare tokens prune at coarse levels: seed near the root and let the
    # cascade cut; ubiquitous tokens never prune, so seeding at the deepest
    # usable level skips pointless intermediate probes — the same direction
    # as the reference's MostFreqPruning (higher pMin => deeper Lp,
    # search/MostFreqPruning.java:31-52)
    assert rare == 0
    assert common == int(stats["level"].max())
    # respects the pattern-length descent guard: span(L) >= m forces level 0
    deep_guarded = choose_start_level(stats, np.asarray([1e-6]), pattern_len=1024)
    assert deep_guarded == 0


def test_ie_model_usable_in_planner():
    stats = _stats()
    probs = np.asarray([0.02, 0.03, 0.01])
    lvl_iid = choose_start_level(stats, probs, pattern_len=8, model="iid")
    lvl_ie = choose_start_level(stats, probs, pattern_len=8, model="ie")
    assert 0 <= lvl_ie <= int(stats["level"].max())
    # IE's joint-absence terms only tighten (reduce) the per-window hit
    # probability, so its seed level is never deeper than iid's
    assert lvl_ie <= lvl_iid
    # IE falls back to iid past its subset limit (no blowup for long patterns)
    many = np.full(20, 0.01)
    assert choose_start_level(stats, many, 8, model="ie") == choose_start_level(stats, many, 8, model="iid")


def test_markov_model_wired_into_planner():
    """model='markov' prices survivors with the bigram chain
    (CostFunctionMarkov role): a pattern the chain forbids predicts ~zero
    survivors even when its tokens are individually common — the case where
    the iid model is maximally wrong."""
    from hierarchical_bloom_filter_index_spark.plans.markov import (
        MarkovModel,
        markov_expected_survivors,
    )

    stats = _stats()
    # 2-state chain with strong self-transitions: [0, 1] almost never occurs
    vocab = np.asarray([0, 1])
    pi = np.asarray([0.5, 0.5])
    t = np.asarray([[0.999, 0.001], [0.001, 0.999]])
    model = MarkovModel(vocab, pi, t)
    pattern = [0, 1, 1, 1]
    probs = np.asarray([0.5, 0.5])  # what the iid model sees: common tokens

    deep = int(stats["level"].max())
    e_iid = expected_survivors(stats, probs, deep)
    e_mkv = markov_expected_survivors(model, pattern, stats, deep)
    assert e_mkv < 0.1 * e_iid  # chain knows the pattern is rare; iid doesn't

    lvl = choose_start_level(stats, probs, pattern_len=4, model="markov",
                             markov=model, pattern=pattern)
    assert 0 <= lvl <= deep
    # strong early pruning => the markov planner never seeds deeper than iid
    lvl_iid = choose_start_level(stats, probs, pattern_len=4, model="iid")
    assert lvl <= lvl_iid

    import pytest

    with pytest.raises(ValueError):
        choose_start_level(stats, probs, 4, model="markov")  # missing inputs


def test_choose_start_level_on_compacted_stats():
    """Memory-policy compaction drops coarse levels from stats; the planner
    must skip them (regression: IndexError on missing level lookups)."""
    stats = _stats()
    compacted = stats[stats["level"] >= 2].reset_index(drop=True)
    lvl = choose_start_level(compacted, np.asarray([1e-6] * 4), pattern_len=8)
    assert lvl >= 2  # can only choose levels that still exist
    lvl2 = choose_start_level(compacted, np.asarray([0.5] * 4), pattern_len=8)
    assert 2 <= lvl2 <= int(stats["level"].max())
