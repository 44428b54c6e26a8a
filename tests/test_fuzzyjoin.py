"""Edit-distance similarity joins (operators/fuzzyjoin.py): deletion-variant
expression vs a python reference, self/two-table joins vs brute-force
Levenshtein, dedup/refusal guards."""

import itertools

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.fuzzyjoin import (
    deletion_variants_expr,
    edit_self_pairs,
    edit_similarity_join,
)

WORDS = [
    "kitten", "sitten", "sittin", "sitting", "kittens", "mitten", "mittens",
    "flour", "floor", "flow", "flown", "ab", "ba", "abc", "", "a", "b",
    "hello", "héllo", "hxllo", "merge", "marge", "margin",
]


def _lev(x: str, y: str) -> int:
    if len(x) < len(y):
        x, y = y, x
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i]
        for j, cy in enumerate(y, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cx != cy)))
        prev = cur
    return prev[-1]


def _brute_pairs(words, d):
    ws = sorted(set(words))
    return sorted(
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(ws, 2)
        if _lev(a, b) <= d
    )


def _py_variants(s: str, d: int) -> set:
    out = {s}
    frontier = {s}
    for _ in range(d):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        out |= nxt
        frontier = nxt
    return out


@pytest.mark.parametrize("d", [1, 2])
def test_variant_expr_matches_python(spark, d):
    df = spark.createDataFrame([(w,) for w in WORDS if w is not None], "w string")
    got = {
        r["w"]: set(r["vs"])
        for r in df.select(
            "w", deletion_variants_expr("w", d).alias("vs")).collect()
    }
    for w in WORDS:
        assert got[w] == _py_variants(w, d), w


@pytest.mark.parametrize("d", [1, 2])
def test_self_pairs_match_brute_force(spark, d):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    got = sorted(
        tuple(r) for r in edit_self_pairs(df, "w", max_dist=d).collect())
    assert got == _brute_pairs(WORDS, d)


def test_transposition_needs_two_edits(spark):
    df = spark.createDataFrame([("ab",), ("ba",)], "w string")
    assert edit_self_pairs(df, "w", max_dist=1).count() == 0
    rows = edit_self_pairs(df, "w", max_dist=2).collect()
    assert [(r["w_a"], r["w_b"], r["dist"]) for r in rows] == [("ab", "ba", 2)]


def test_two_table_join_matches_brute_force(spark):
    left = ["merge", "forge", "xyzzy", "flow"]
    right = ["marge", "gorge", "flown", "gown", "merge"]
    a = spark.createDataFrame([(w,) for w in left], "wl string")
    b = spark.createDataFrame([(w,) for w in right], "wr string")
    got = sorted(tuple(r) for r in
                 edit_similarity_join(a, "wl", b, "wr", max_dist=2).collect())
    want = sorted(
        (x, y, _lev(x, y))
        for x in set(left) for y in set(right) if _lev(x, y) <= 2
    )
    assert got == want


def test_duplicates_collapse(spark):
    df = spark.createDataFrame([(w,) for w in WORDS * 5], "w string")
    got = sorted(tuple(r) for r in edit_self_pairs(df, "w").collect())
    assert got == _brute_pairs(WORDS, 1)


def test_null_strings_dropped(spark):
    df = spark.createDataFrame([("flow",), (None,), ("flown",)], "w string")
    got = [tuple(r) for r in edit_self_pairs(df, "w").collect()]
    assert got == [("flow", "flown", 1)]


def test_hot_variant_refusal(spark):
    hot = [f"a{i}" for i in range(10)]  # every string has variant "a"
    df = spark.createDataFrame([(w,) for w in hot], "w string")
    with pytest.raises(ValueError, match="blocks 10 strings"):
        edit_self_pairs(df, "w", max_bucket=3).collect()
    # and the cap is per-bucket, not total: a clean vocab under the cap runs
    assert edit_self_pairs(df, "w", max_bucket=100).count() == len(
        _brute_pairs(hot, 1))


def test_same_column_name_refused(spark):
    df = spark.createDataFrame([("x",)], "w string")
    with pytest.raises(ValueError, match="must differ"):
        edit_similarity_join(df, "w", df, "w")
