"""Design helpers, solvers, and the Markov cost model."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.plans.design import (
    bisection,
    block_length_for_target,
    design_buckets_chebyshev,
    newton_with_fallback,
    required_sample_size_dkw,
)
from hierarchical_bloom_filter_index_spark.plans.markov import MarkovModel, bigram_counts


def test_dkw_sample_size():
    n = required_sample_size_dkw(0.05, 0.05)
    assert n == math.ceil(math.log(2 / 0.05) / (2 * 0.05**2)) == 738
    with pytest.raises(ValueError):
        required_sample_size_dkw(0, 0.1)


def test_chebyshev_buckets_monotone():
    assert design_buckets_chebyshev(10_000, 0.05, 0.05) <= design_buckets_chebyshev(10_000, 0.01, 0.05)


def test_bisection_and_newton():
    root = bisection(lambda x: x * x - 2, 0, 2)
    assert abs(root - math.sqrt(2)) < 1e-6
    root2 = newton_with_fallback(lambda x: x * x - 2, lambda x: 2 * x, 1.0, 0, 2)
    assert abs(root2 - math.sqrt(2)) < 1e-6
    # newton diverging outside bracket falls back to bisection
    root3 = newton_with_fallback(lambda x: x**3 - 2, lambda x: 1e-12, 1.0, 0, 2)
    assert abs(root3 - 2 ** (1 / 3)) < 1e-5


def test_block_length_solver_matches_equation():
    probs = [0.01, 0.02, 0.005]
    b = block_length_for_target(probs, 0.5)
    val = math.prod(1 - (1 - p) ** b for p in probs)
    assert abs(val - 0.5) < 1e-4
    # monotone: higher target needs longer blocks
    assert block_length_for_target(probs, 0.9) > b


def test_markov_model_fit_and_probs(spark):
    # deterministic alternating corpus: 1->2->1->2...
    docs = [("d%d" % i, [1, 2] * 50, 100, "s") for i in range(8)]
    df = spark.createDataFrame(docs, C.CORPUS_SCHEMA)
    bi = {(r["prev"], r["cur"]): r["cnt"] for r in bigram_counts(df).collect()}
    assert bi[(1, 2)] == 8 * 50 and bi[(2, 1)] == 8 * 49
    model = MarkovModel.fit(df)
    assert model.occurrence_prob([1, 2, 1, 2]) == pytest.approx(0.5, abs=1e-6)
    assert model.occurrence_prob([1, 1]) == 0.0  # never observed
    assert model.occurrence_prob([7]) == 0.0  # unseen token
    assert 0.99 < model.window_hit_prob([1, 2], 100) <= 1.0


def test_ngram_model_backoff_pure():
    """Variable-order NgramModel: longest-context conditioning with suffix
    backoff (PMIndex/NgramModel.java role), no Spark needed."""
    from hierarchical_bloom_filter_index_spark.plans.markov import NgramModel

    # corpus: "1 2 3" x90 + "1 2 4" x10  (order-2 context disambiguates)
    counts = {
        (1,): 100, (2,): 100, (3,): 90, (4,): 10,
        (1, 2): 100, (2, 3): 90, (2, 4): 10,
        (1, 2, 3): 90, (1, 2, 4): 10,
    }
    m = NgramModel(counts, order=2, total=300)
    assert abs(m.cond_prob((1, 2), 3) - 0.9) < 1e-12      # full context
    assert abs(m.cond_prob((9, 2), 3) - 0.9) < 1e-12      # backoff to (2,)
    assert abs(m.cond_prob((9, 9), 3) - 90 / 300) < 1e-12  # unigram fallback
    p = m.occurrence_prob([1, 2, 3])
    assert abs(p - (100 / 300) * 1.0 * 0.9) < 1e-12
    assert m.occurrence_prob([7, 7]) == 0.0
    assert 0.0 < m.window_hit_prob([1, 2, 3], 64) <= 1.0


def test_selective_fanout_regime():
    """SelectiveFanout (estimators/SelectiveFanout.java): multiplier stays in
    [1,2], grows with depth/feasibility/cost-efficiency, and enabling the
    regime in choose_start_level only reprices (level stays valid; cheaper
    descents bias the argmin no deeper than the fixed-2 pricing)."""
    import pandas as pd
    from hierarchical_bloom_filter_index_spark.plans.cost import (
        choose_start_level,
        selective_cost_efficiency,
        selective_fanout_multiplier,
    )

    # bounds + monotonicity in each score component
    for args in [(0, 0, 0, 0.0, 0.0), (5, 0, 5, 1.0, 1.0), (3, 1, 7, 0.4, 0.9)]:
        m = selective_fanout_multiplier(*args)
        assert 1.0 <= m <= 2.0
    assert selective_fanout_multiplier(5, 0, 5, 1.0, 1.0) == 2.0
    assert selective_fanout_multiplier(0, 0, 5, 0.0, 0.0) == 1.0
    assert (selective_fanout_multiplier(4, 0, 8, 0.2, 0.2)
            > selective_fanout_multiplier(1, 0, 8, 0.2, 0.2))
    assert (selective_fanout_multiplier(2, 0, 8, 0.9, 0.2)
            > selective_fanout_multiplier(2, 0, 8, 0.1, 0.2))

    assert selective_cost_efficiency(1.0, 0.0) == 0.0
    assert selective_cost_efficiency(0.0, 1.0) == 1.0
    assert selective_cost_efficiency(3.0, 6.0) == 0.5
    assert selective_cost_efficiency(9.0, 3.0) == 1.0  # clamped

    rows = [
        {"level": L, "span": 256 >> L, "n_windows": 100 * 2**L, "fill_fpr": 0.02}
        for L in range(6)
    ]
    stats = pd.DataFrame(rows)
    probs = np.array([5e-3, 2e-4, 1e-4])
    fixed = choose_start_level(stats, probs, 3)
    sel = choose_start_level(stats, probs, 3, selective=True)
    assert 0 <= sel <= 5 and 0 <= fixed <= 5
    # multiplier <= 2 => every descent is priced cheaper => the selective
    # argmin never moves deeper than the fixed-2 choice
    assert sel <= fixed
