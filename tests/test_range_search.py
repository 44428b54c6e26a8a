"""Range-restricted pattern search == full search post-filtered to the
range, on both axes — including unaligned bounds, boundary-straddling
matches, and empty slices."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import (
    build_index,
    global_pattern_search,
    pattern_search,
)
from hierarchical_bloom_filter_index_spark.operators.route import (
    global_pattern_search_range,
    pattern_search_range,
)

CFG = HbiConfig(tree_span=512, leaf_span=32, fpr=0.05, vocab=4096, seed=42)
GCFG = HbiConfig(tree_span=512, leaf_span=32, fpr=0.05, vocab=4096, seed=42,
                 axis="global")


@pytest.fixture(scope="module")
def corpus(spark):
    df = C.generate_corpus(spark, sf=0.002, seed=42)
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets

    df = with_global_offsets(df).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def index(spark, corpus):
    idx = build_index(corpus, CFG).cache()
    idx.count()
    return idx


@pytest.fixture(scope="module")
def gindex(spark, corpus):
    idx = build_index(corpus, GCFG).cache()
    idx.count()
    return idx


@pytest.fixture(scope="module")
def pat(corpus):
    r = corpus.filter(F.col("n_tok") >= 200).orderBy("doc_id").first()
    # a slice that exists mid-doc, so doc-axis ranges can straddle it
    return list(r["tokens"][90:104])


# unaligned bounds, a window-boundary-straddling span, a slice shorter
# than the pattern, and a slice clipped at 0
RANGES = [(64, 200), (90, 104), (91, 104), (90, 103), (0, 96), (100, 101), (3, 7000)]


def test_doc_axis_range_equals_postfilter(spark, corpus, index, pat):
    m = len(pat)
    full = pattern_search(corpus, index, CFG, pat).collect()
    assert full, "fixture pattern not found — test is vacuous"
    for lo, hi in RANGES:
        got = sorted(
            (r["doc_id"], r["pos"])
            for r in pattern_search_range(corpus, index, CFG, pat, lo, hi).collect()
        )
        want = sorted(
            (r["doc_id"], r["pos"]) for r in full if lo <= r["pos"] <= hi - m
        )
        assert got == want, f"range [{lo}, {hi})"


def test_global_axis_range_equals_postfilter(spark, corpus, gindex, pat):
    m = len(pat)
    full = sorted(r["gpos"] for r in
                  global_pattern_search(corpus, gindex, GCFG, pat).collect())
    assert full, "fixture pattern not found on the stream — test is vacuous"
    # centre ranges on a real stream match so the slice is never all-empty
    g0 = full[len(full) // 2]
    for lo, hi in [(g0 - 40, g0 + 40), (g0, g0 + m), (g0 + 1, g0 + m + 5),
                   (max(0, g0 - 7000), g0 + 9000), (0, 33)]:
        got = sorted(
            r["gpos"]
            for r in global_pattern_search_range(corpus, gindex, GCFG, pat, lo, hi).collect()
        )
        want = [g for g in full if lo <= g <= hi - m]
        assert got == want, f"range [{lo}, {hi})"


def test_pattern_completions_vs_local(spark, corpus, index, pat):
    from hierarchical_bloom_filter_index_spark.operators.route import (
        pattern_completions,
    )

    m, ell, k = len(pat), 3, 12
    got = [
        (r["completion"], r["n"])
        for r in pattern_completions(corpus, index, CFG, pat, ell, k).collect()
    ]
    counts = {}
    for r in corpus.select("tokens").collect():
        toks = list(r["tokens"])
        for i in range(len(toks) - m + 1):
            if toks[i : i + m] == pat and i + m + ell <= len(toks):
                key = "|".join(str(t) for t in toks[i + m : i + m + ell])
                counts[key] = counts.get(key, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want
    assert got, "fixture pattern has no continuations — test is vacuous"


def test_global_pattern_completions_vs_local(spark, corpus, gindex, pat):
    from hierarchical_bloom_filter_index_spark.operators.route import (
        global_pattern_completions,
    )

    m, ell, k = len(pat), 3, 12
    got = [
        (r["completion"], r["n"])
        for r in global_pattern_completions(corpus, gindex, GCFG, pat, ell, k).collect()
    ]
    rows = sorted(corpus.select("doc_id", "tokens").collect(),
                  key=lambda r: r["doc_id"])
    stream = [t for r in rows for t in r["tokens"]]
    counts = {}
    for i in range(len(stream) - m + 1):
        if stream[i : i + m] == pat and i + m + ell <= len(stream):
            key = "|".join(str(t) for t in stream[i + m : i + m + ell])
            counts[key] = counts.get(key, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want
    assert got, "fixture pattern has no stream continuations — vacuous"


def test_global_completions_cross_doc_boundary(spark):
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.route import (
        global_pattern_completions,
    )

    # 'xy' ends doc a — its continuation 'zq...' lives entirely in doc b
    rows = [("a", [7] * 30 + [120, 121]), ("b", [122, 113] + [8] * 30)]
    df = spark.createDataFrame(
        [(d, t, len(t), "s") for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    corp = with_global_offsets(df)
    from hierarchical_bloom_filter_index_spark.operators import build_index

    idx = build_index(corp, GCFG)
    got = [
        (r["completion"], r["n"])
        for r in global_pattern_completions(corp, idx, GCFG, [120, 121], 2, 5).collect()
    ]
    assert got == [("122|113", 1)]


def test_range_search_validation(spark, corpus, index, pat):
    with pytest.raises(ValueError):
        pattern_search_range(corpus, index, CFG, pat, 10, 10)
    with pytest.raises(ValueError):
        global_pattern_search_range(corpus, index, GCFG, pat, -1, 10)
    # slice shorter than the pattern: exactly empty, not an error
    assert pattern_search_range(corpus, index, CFG, pat, 5, 5 + len(pat) - 1).count() == 0
