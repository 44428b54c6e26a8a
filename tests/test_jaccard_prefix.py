"""Exact prefix-filtered Jaccard join (dedup.jaccard_prefix_pairs): parity
with brute force over thresholds incl. exact-boundary pairs, guards."""

import itertools

import pytest

from hierarchical_bloom_filter_index_spark.operators.dedup import (
    jaccard_prefix_pairs,
)

SETS = {
    0: ["a", "b", "c", "d"],
    1: ["a", "b", "c", "e"],
    2: ["a", "b"],
    3: ["a", "b", "c", "d"],        # identical to 0
    4: ["x", "y", "z"],
    5: ["x", "y", "z", "w", "v"],
    6: ["q"],
    7: ["q"],                       # identical singleton
    8: ["a", "b", "c", "d", "e", "f", "g", "h"],
    9: ["m", "n"],
    10: ["m", "n", "o", "p"],       # J with 9 = 2/4 = exactly 0.5
    11: ["b", "c", "d", "e"],
}


def _brute(threshold):
    out = []
    for i, j in itertools.combinations(sorted(SETS), 2):
        a, b = set(SETS[i]), set(SETS[j])
        inter = len(a & b)
        uni = len(a | b)
        if inter / uni >= threshold - 1e-12 and inter * 1 >= 0:
            # rational compare to avoid float drift at the boundary
            from fractions import Fraction
            t = Fraction(str(threshold))
            if Fraction(inter, uni) >= t:
                out.append((i, j, inter, uni, inter / uni))
    return sorted(out)


def _frame(spark, extra=()):
    rows = [(k, v) for k, v in SETS.items()] + list(extra)
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


@pytest.mark.parametrize("t", [0.3, 0.5, 0.75, 0.8, 1.0])
def test_matches_brute_force(spark, t):
    got = sorted(tuple(r) for r in
                 jaccard_prefix_pairs(_frame(spark), "doc_id", "toks", t).collect())
    assert got == _brute(t), t


def test_exact_boundary_pair_kept(spark):
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in
           jaccard_prefix_pairs(_frame(spark), "doc_id", "toks", 0.5).collect()}
    assert (9, 10) in got  # J exactly 1/2 at threshold 0.5


def test_duplicates_nulls_empties(spark):
    extra = [(20, ["a", "a", "b", "b", "c", "c", "d"]),  # dups collapse -> = set 0
             (21, []), (None, ["a", "b"])]
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in
           jaccard_prefix_pairs(_frame(spark, extra), "doc_id", "toks", 1.0).collect()}
    assert (0, 20) in got and (3, 20) in got
    assert all(a is not None and b is not None for a, b in got)
    assert not any(21 in p for p in got)


def test_hot_prefix_refusal(spark):
    rows = [(i, ["hot"]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    with pytest.raises(ValueError, match="blocks 10 sets"):
        jaccard_prefix_pairs(df, "doc_id", "toks", 0.9, max_bucket=5).collect()
    assert jaccard_prefix_pairs(df, "doc_id", "toks", 0.9,
                                max_bucket=None).count() == 45


def test_threshold_validation(spark):
    with pytest.raises(ValueError, match="threshold"):
        jaccard_prefix_pairs(_frame(spark), "doc_id", "toks", 0.0)
    with pytest.raises(ValueError, match="threshold"):
        jaccard_prefix_pairs(_frame(spark), "doc_id", "toks", 1.5)
