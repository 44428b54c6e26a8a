"""Vocabulary coverage (operators/text.py) and robust MAD stats
(operators/stats.py) vs pure-python brute force."""

import statistics

import pytest

from hierarchical_bloom_filter_index_spark.operators.stats import (
    group_median2,
    mad_outlier_rows,
    mad_outlier_stats,
)
from hierarchical_bloom_filter_index_spark.operators.text import (
    oov_top_terms,
    vocab_coverage,
    word_vocab,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma alpha", "s0"),
        (1, "alpha  beta   rare1", "s0"),        # double spaces -> empties dropped
        (2, "gamma gamma gamma rare2 rare3", "s1"),
        (3, "", "s1"),                            # empty doc: no words
        (4, "beta beta alpha zeta zeta zeta", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_word_vocab_deterministic(spark, docs):
    v = word_vocab(docs, 3).collect()
    # counts: gamma 4, alpha 4, beta 4, zeta 3 -> (cnt DESC, word ASC)
    assert [(r.word, r.cnt) for r in v] == [("alpha", 4), ("beta", 4), ("gamma", 4)]


def test_vocab_coverage_exact(spark, docs):
    v = word_vocab(docs, 3)
    got = {r.source: r for r in vocab_coverage(docs, v).collect()}
    # s0: words alpha x3, beta x2, gamma, rare1 -> 7 tokens, 6 covered
    assert (got["s0"].n_tokens, got["s0"].n_covered) == (7, 6)
    assert (got["s0"].n_types, got["s0"].n_oov_types) == (4, 1)
    # s1: gamma x3 rare2 rare3 beta x2 alpha zeta x3 -> 11 tokens
    assert (got["s1"].n_tokens, got["s1"].n_covered) == (11, 6)
    assert (got["s1"].n_types, got["s1"].n_oov_types) == (6, 3)


def test_oov_top_terms(spark, docs):
    v = word_vocab(docs, 3)
    got = sorted(map(tuple, oov_top_terms(docs, v, k=2).collect()))
    assert got == [("s0", "rare1", 1), ("s1", "rare2", 1), ("s1", "zeta", 3)]


def _median2(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[(n + 1) // 2 - 1] + xs[(n + 2) // 2 - 1]


@pytest.mark.parametrize("values", [
    [1, 2, 3, 4, 5],
    [1, 2, 3, 4],           # even n: med2 = 5 (median 2.5)
    [7],
    [5, 5, 5, 5, 9],        # MAD = 0
    [-3, -1, 0, 2, 100],    # negative values + heavy tail
])
def test_group_median2(spark, values):
    df = spark.createDataFrame([(v, "g") for v in values], "x bigint, g string")
    r = group_median2(df, "x", ("g",)).collect()[0]
    assert (r.n, r.med2) == (len(values), _median2(values))
    assert r.med2 == round(2 * statistics.median(values))


def test_mad_outliers_match_brute(spark):
    import random

    rng = random.Random(3)
    rows = [(i, rng.choice("ab"), rng.randrange(-50, 50) if rng.random() < 0.9
             else rng.randrange(500, 900)) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, g string, x bigint")
    k_num, k_den = 7, 2  # k = 3.5
    stats = {r.g: r for r in
             mad_outlier_stats(df, "x", ("g",), k_num, k_den).collect()}
    flagged = {(r.id,) for r in
               mad_outlier_rows(df, "x", ("g",), k_num, k_den).collect()}
    for g in "ab":
        xs = [x for _, gg, x in rows if gg == g]
        med2 = _median2(xs)
        devs = [abs(2 * x - med2) for x in xs]
        mad2 = _median2(devs)
        exp = [i for i, gg, x in rows
               if gg == g and 2 * abs(2 * x - med2) * k_den > k_num * mad2]
        assert stats[g].med2 == med2 and stats[g].mad2 == mad2
        assert stats[g].n_outliers == len(exp)
        assert {(i,) for i in exp} <= flagged
    assert len(flagged) == sum(stats[g].n_outliers for g in "ab")


def test_mad_zero_spread_flags_everything_off_center(spark):
    df = spark.createDataFrame([(i, "g", 5) for i in range(4)] + [(9, "g", 6)],
                               "id bigint, g string, x bigint")
    r = mad_outlier_stats(df, "x", ("g",), 3).collect()[0]
    # median 5, MAD 0 -> any deviation is an outlier
    assert (r.med2, r.mad2, r.n_outliers) == (10, 0, 1)


def test_mad_validation(spark, docs):
    with pytest.raises(ValueError):
        mad_outlier_stats(docs, "doc_id", ("source",), 0)
    with pytest.raises(ValueError):
        group_median2(docs, "doc_id", ())


def test_grouped_centroid_sums_order_free(spark):
    import random

    from hierarchical_bloom_filter_index_spark.operators.similarity import (
        grouped_centroid_sums)

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    a = sorted(map(tuple, grouped_centroid_sums(df.repartition(1)).collect()))
    b = sorted(map(tuple, grouped_centroid_sums(
        df.repartition(13, "vec_id")).collect()))
    assert a == b
    # exact vs python floor on the same float32 values
    import numpy as np
    pdf = df.toPandas()
    for (grp, dim, n, s) in a:
        vals = [np.float32(r[dim]) for r, l in zip(pdf["embedding"], pdf["label"])
                if l == grp]
        assert n == len(vals)
        assert s == sum(int(np.floor(float(v) * (1 << 20))) for v in vals)


def test_mad_refuses_fractional_input(spark):
    """Review fix: fractional metric values must REFUSE in-plan, never
    truncate toward zero into plausible-but-wrong medians."""
    from pyspark.sql.utils import PythonException
    import py4j.protocol

    df = spark.createDataFrame(
        [(0, "g", 1.5), (1, "g", 2.0), (2, "g", 3.0)],
        "id bigint, g string, x double")
    with pytest.raises(Exception) as ei:
        mad_outlier_stats(df, "x", ("g",), 3).collect()
    assert "integral column required" in str(ei.value)
    # integral-valued doubles pass (the cast is lossless there)
    ok = spark.createDataFrame(
        [(0, "g", 1.0), (1, "g", 2.0), (2, "g", 9.0)],
        "id bigint, g string, x double")
    r = mad_outlier_stats(ok, "x", ("g",), 3).collect()[0]
    assert r.med2 == 4


def test_vocab_duplicate_rows_are_a_set(spark, docs):
    """Review fix: duplicate vocab rows must not multiply (source, word)
    rows through the >4096-word broadcast-join path; both paths treat
    the vocab as a set."""
    from hierarchical_bloom_filter_index_spark.operators.text import (
        _VOCAB_INLINE_MAX, vocab_coverage)

    vocab = spark.createDataFrame(
        [("alpha",), ("beta",), ("alpha",)], "word string")
    base = {r["source"]: r.asDict() for r in
            vocab_coverage(docs, vocab).collect()}
    # pad the vocab past the inline cap with junk words (+ more dups)
    junk = [(f"zz{i}",) for i in range(_VOCAB_INLINE_MAX + 8)]
    big = vocab.unionByName(spark.createDataFrame(
        junk + [("beta",)], "word string"))
    joined = {r["source"]: r.asDict() for r in
              vocab_coverage(docs, big).collect()}
    assert base == joined
