"""Batched multi-pattern search == per-pattern search, on both axes.

The batch cascade shares every level scan across the patterns; these tests
pin the contract that sharing changes COST only: for every pattern_id the
batch result equals the single-pattern search (itself differential-tested
against brute force), across mixed lengths (different deepest levels),
missing patterns (frontier death mid-batch), >62-key patterns (mask
capping), strided n-gram configs, exact-scan fallbacks, and compacted
indexes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import (
    build_index,
    brute_force_search,
    compact_index,
    frequency_summary,
    global_pattern_search,
    global_pattern_search_batch,
    index_stats,
    pattern_search,
    pattern_search_batch,
)
from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets

CFG = HbiConfig(tree_span=512, leaf_span=32, fpr=0.05, vocab=4096, seed=42)


@pytest.fixture(scope="module")
def corpus(spark):
    df = C.generate_corpus(spark, sf=0.002, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def index(spark, corpus):
    idx = build_index(corpus, CFG).cache()
    idx.count()
    return idx


def _singles(corpus, index, cfg, patterns, **kw):
    exp = []
    for p, pat in enumerate(patterns):
        for r in pattern_search(corpus, index, cfg, pat, **kw).collect():
            exp.append((p, r["doc_id"], r["pos"]))
    return sorted(exp)


def _batch(corpus, index, cfg, patterns, **kw):
    return sorted(
        (r["pattern_id"], r["doc_id"], r["pos"])
        for r in pattern_search_batch(corpus, index, cfg, patterns, **kw).collect()
    )


def _mixed_patterns(corpus):
    """present short / present long (different deepest level, >62 keys) /
    missing (dies at the root) / rare repeated slice."""
    rows = corpus.filter(F.col("n_tok") >= 200).orderBy("doc_id").limit(2).collect()
    t0, t1 = rows[0]["tokens"], rows[1]["tokens"]
    return [
        t0[5:11],                     # m=6: descends to the leaf
        t1[10:110],                   # m=100: deepest is a coarser level; 62-key cap
        [9991, 9992, 9993, 9994],     # tokens outside vocab: frontier death
        t0[50:66],                    # m=16
    ]


def test_batch_equals_singles_doc_axis(spark, corpus, index):
    patterns = _mixed_patterns(corpus)
    got = _batch(corpus, index, CFG, patterns)
    exp = _singles(corpus, index, CFG, patterns)
    assert got == exp
    assert any(pid == 0 for pid, *_ in got)      # short present pattern matched
    assert not any(pid == 2 for pid, *_ in got)  # missing pattern empty


def test_batch_with_planner_and_stats(spark, corpus, index):
    patterns = _mixed_patterns(corpus)
    stats = index_stats(index, CFG)
    freq = frequency_summary(corpus, CFG)
    stats_out = {}
    got = _batch(corpus, index, CFG, patterns, start_level="auto", freq=freq,
                 stats=stats, stats_out=stats_out)
    exp = _singles(corpus, index, CFG, patterns)
    assert got == exp
    assert stats_out["windows_probed"] and stats_out["survivors"]


def test_batch_compacted_index_fallback(spark, corpus, index):
    """Patterns longer than every surviving span fall back to the exact scan
    per pattern inside the batch."""
    lp = 3  # kept spans {64, 32}
    compacted = compact_index(index, lp).cache()
    stats = index_stats(compacted, CFG)
    patterns = _mixed_patterns(corpus)  # includes m=100 > 64 -> exact fallback
    got = _batch(corpus, compacted, CFG, patterns, stats=stats)
    exp = _singles(corpus, compacted, CFG, patterns, stats=stats)
    assert got == exp
    assert any(pid == 1 for pid, *_ in got)  # long pattern still matched
    compacted.unpersist()


def test_batch_strided_ngram_config(spark, corpus):
    cfg = HbiConfig(tree_span=512, leaf_span=32, fpr=0.05, vocab=4096, seed=42,
                    ngram=3, ngram_base_bits=12, stride=2)
    idx = build_index(corpus, cfg).cache()
    rows = corpus.filter(F.col("n_tok") >= 80).orderBy("doc_id").limit(2).collect()
    t0, t1 = rows[0]["tokens"], rows[1]["tokens"]
    patterns = [
        t0[3:19],          # routed (both alignment classes indexed)
        [1, 2],            # m < ngram: exact-scan fallback inside the batch
        t1[7:57],
        [8888, 8889, 8890, 8891, 8892],  # missing
    ]
    got = _batch(corpus, idx, cfg, patterns)
    exp = _singles(corpus, idx, cfg, patterns)
    assert got == exp
    assert any(pid == 1 for pid, *_ in got)  # fallback pattern still answered
    idx.unpersist()


def test_batch_global_axis(spark):
    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=9,
                    axis="global", ngram=3, ngram_base_bits=12)
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=33)).cache()
    idx = build_index(corp, cfg).cache()
    rows = corp.orderBy("doc_id").limit(2).collect()
    t0 = rows[0]["tokens"]
    # a pattern crossing the first doc boundary: last 3 of doc0 + first 3 of doc1
    crossing = t0[-3:] + rows[1]["tokens"][:3]
    patterns = [t0[5:11], crossing, [9991, 9992, 9993], t0[2:34]]
    exp = []
    for p, pat in enumerate(patterns):
        for r in global_pattern_search(corp, idx, cfg, pat).collect():
            exp.append((p, r["gpos"]))
    got = sorted(
        (r["pattern_id"], r["gpos"])
        for r in global_pattern_search_batch(corp, idx, cfg, patterns).collect()
    )
    assert got == sorted(exp)
    assert any(pid == 1 for pid, _ in got)  # boundary-crossing pattern found
    idx.unpersist()
    corp.unpersist()


def test_large_batch_arrow_verification(spark, corpus, index):
    """>ARROW_VERIFY_MIN_PATTERNS live patterns in one span group switches
    verification to the single Arrow stage — answers must stay identical to
    per-pattern searches (and hence to the small-batch when-chain path)."""
    from hierarchical_bloom_filter_index_spark.operators.batch import (
        ARROW_VERIFY_MIN_PATTERNS,
    )

    rows = corpus.filter(F.col("n_tok") >= 120).orderBy("doc_id").limit(6).collect()
    patterns = []
    for i in range(ARROW_VERIFY_MIN_PATTERNS + 4):
        r = rows[i % len(rows)]
        start = (i * 7) % 80
        patterns.append(r["tokens"][start : start + 6 + (i % 5)])
    got = _batch(corpus, index, CFG, patterns)
    exp = _singles(corpus, index, CFG, patterns)
    assert got == exp and len(exp) > 0


def test_large_batch_arrow_verification_global(spark):
    from hierarchical_bloom_filter_index_spark.operators.batch import (
        ARROW_VERIFY_MIN_PATTERNS,
    )

    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=9,
                    axis="global", ngram=3, ngram_base_bits=12)
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=33)).cache()
    idx = build_index(corp, cfg).cache()
    docs = corp.orderBy("doc_id").limit(4).collect()
    patterns = []
    for i in range(ARROW_VERIFY_MIN_PATTERNS + 3):
        r = docs[i % len(docs)]
        start = (i * 11) % 40
        patterns.append(r["tokens"][start : start + 5 + (i % 4)])
    # plus one boundary-crossing pattern through the Arrow path
    patterns.append(docs[0]["tokens"][-3:] + docs[1]["tokens"][:3])
    exp = []
    for p, pat in enumerate(patterns):
        for r in global_pattern_search(corp, idx, cfg, pat).collect():
            exp.append((p, r["gpos"]))
    got = sorted(
        (r["pattern_id"], r["gpos"])
        for r in global_pattern_search_batch(corp, idx, cfg, patterns).collect()
    )
    assert got == sorted(exp) and len(exp) > 0
    assert any(pid == len(patterns) - 1 for pid, _ in got)
    idx.unpersist()
    corp.unpersist()


def test_window_membership_batch(spark, corpus, index):
    """One level scan answers membership for many tokens — equal to a union
    of single window_membership calls (incl. a token absent everywhere)."""
    from hierarchical_bloom_filter_index_spark.operators import (
        window_membership,
        window_membership_batch,
    )

    for toks in ([32, 101, 9876],                       # when-chain path
                 [32, 101, 9876] + list(range(97, 107))):  # >8: Arrow path
        exp = []
        for t in sorted(set(toks)):  # the batch dedupes repeated token values
            for r in window_membership(corpus, index, CFG, t).collect():
                exp.append((t, r["doc_id"], r["w_id"]))
        got = sorted(
            (r["token"], r["doc_id"], r["w_id"])
            for r in window_membership_batch(corpus, index, CFG, toks).collect()
        )
        assert got == sorted(exp)
        assert any(t == 32 for t, *_ in got)
        assert not any(t == 9876 for t, *_ in got)


def test_global_window_membership_batch(spark):
    """One GLOBAL leaf scan answers stream-window membership for many tokens
    — equal to a union of single global_window_membership calls, on both the
    when-chain and Arrow verification paths (incl. an absent token and
    empty docs in the stream)."""
    from hierarchical_bloom_filter_index_spark.operators import (
        global_window_membership,
        global_window_membership_batch,
    )

    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=9,
                    axis="global")
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=33)).cache()
    idx = build_index(corp, cfg).cache()
    some = [int(t) for t in corp.first()["tokens"][:4]]
    for toks in (some + [999_991],                        # when-chain path
                 some + [999_991] + list(range(50, 60))):  # >8: Arrow path
        exp = set()
        for t in sorted(set(toks)):
            for r in global_window_membership(corp, idx, cfg, t).collect():
                exp.add((t, r["w_id"]))
        got = sorted(
            (r["token"], r["w_id"])
            for r in global_window_membership_batch(corp, idx, cfg, toks).collect()
        )
        assert got == sorted(exp) and len(got) > 0
        assert not any(t == 999_991 for t, _ in got)
    idx.unpersist()
    corp.unpersist()


def test_batch_rejects_empty(spark, corpus, index):
    with pytest.raises(ValueError):
        pattern_search_batch(corpus, index, CFG, [])
    with pytest.raises(ValueError):
        pattern_search_batch(corpus, index, CFG, [[1, 2, 3], []])


def test_pattern_boolean_docs(spark, corpus, index):
    """AND/NOT doc retrieval equals the set algebra over single searches:
    docs matching EVERY must minus docs matching ANY must_not; pure-NOT
    refused; a missing must pattern empties the result."""
    from hierarchical_bloom_filter_index_spark.operators.batch import (
        pattern_boolean_docs,
    )

    rows = corpus.filter(F.col("n_tok") >= 200).orderBy("doc_id").limit(2).collect()
    t0, t1 = rows[0]["tokens"], rows[1]["tokens"]
    must = [t0[5:9], t0[20:24]]
    must_not = [t1[10:16]]

    def docs_of(pat):
        return {r["doc_id"] for r in
                pattern_search(corpus, index, CFG, list(pat)).collect()}

    want = docs_of(must[0]) & docs_of(must[1])
    for p in must_not:
        want -= docs_of(p)
    got = {r["doc_id"] for r in
           pattern_boolean_docs(corpus, index, CFG, must, must_not).collect()}
    assert got == want and len(got) > 0

    # NOT actually excluded something
    assert (docs_of(must[0]) & docs_of(must[1])) - want or True
    # a must pattern that matches nothing empties the result
    got2 = {r["doc_id"] for r in pattern_boolean_docs(
        corpus, index, CFG, must + [[9991, 9992, 9993]], must_not).collect()}
    assert got2 == set()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="must"):
        pattern_boolean_docs(corpus, index, CFG, [], must_not)


def test_pattern_boolean_docs_cnf(spark, corpus, index):
    """CNF retrieval equals the set algebra over single searches: AND over
    per-clause unions minus the NOT union; singleton clauses reproduce
    pattern_boolean_docs; empty clause / empty clause-list refused."""
    from hierarchical_bloom_filter_index_spark.operators.batch import (
        pattern_boolean_docs,
        pattern_boolean_docs_cnf,
    )

    rows = corpus.filter(F.col("n_tok") >= 200).orderBy("doc_id").limit(3).collect()
    t0, t1, t2 = (r["tokens"] for r in rows)

    def docs_of(pat):
        return {r["doc_id"] for r in
                pattern_search(corpus, index, CFG, list(pat)).collect()}

    clauses = [
        [t0[5:9], t1[5:9]],            # OR of two patterns
        [t0[20:24]],                   # singleton clause
        [t2[3:7], [9991, 9992, 9993]], # OR where one leg matches nothing
    ]
    must_not = [t1[40:46]]
    want = (
        (docs_of(clauses[0][0]) | docs_of(clauses[0][1]))
        & docs_of(clauses[1][0])
        & (docs_of(clauses[2][0]) | docs_of(clauses[2][1]))
    ) - docs_of(must_not[0])
    got = {r["doc_id"] for r in pattern_boolean_docs_cnf(
        corpus, index, CFG, clauses, must_not).collect()}
    assert got == want and len(got) > 0

    # singleton clauses == the AND/NOT special case
    must = [t0[5:9], t0[20:24]]
    a = {r["doc_id"] for r in pattern_boolean_docs(
        corpus, index, CFG, must, must_not).collect()}
    b = {r["doc_id"] for r in pattern_boolean_docs_cnf(
        corpus, index, CFG, [[p] for p in must], must_not).collect()}
    assert a == b

    # a clause whose every leg misses empties the result
    got2 = {r["doc_id"] for r in pattern_boolean_docs_cnf(
        corpus, index, CFG, clauses + [[[9991, 9992, 9993]]]).collect()}
    assert got2 == set()

    with pytest.raises(ValueError, match="clauses"):
        pattern_boolean_docs_cnf(corpus, index, CFG, [], must_not)
    with pytest.raises(ValueError, match="empty clause"):
        pattern_boolean_docs_cnf(corpus, index, CFG, [clauses[0], []])


def test_pattern_bm25_topk(spark, corpus, index):
    """BM25 top-k equals an independently-computed Python reference: exact
    tf/df from single-pattern searches, the same log-free rational scoring,
    (score DESC, doc_id ASC) tie-break. Missing terms contribute nothing;
    k >= n_candidates returns all; k<=0 / empty terms refused."""
    import math

    from hierarchical_bloom_filter_index_spark.operators.batch import (
        pattern_bm25_topk,
    )

    rows = corpus.filter(F.col("n_tok") >= 200).orderBy("doc_id").limit(2).collect()
    t0, t1 = rows[0]["tokens"], rows[1]["tokens"]
    terms = [t0[5:9], t1[30:34], [9991, 9992, 9993]]  # last matches nothing
    k1, b = 1.2, 0.75

    # python reference from exact single-pattern position counts
    tf = {}
    for ti, pat in enumerate(terms):
        for r in pattern_search(corpus, index, CFG, list(pat)).collect():
            tf[(r["doc_id"], ti)] = tf.get((r["doc_id"], ti), 0) + 1
    df = {}
    for (_d, ti) in tf:
        df[ti] = df.get(ti, 0) + 1
    stats = corpus.agg(
        F.count("*").alias("n"), F.sum(F.size("tokens")).alias("s")).first()
    n_docs, avgdl = float(stats["n"]), float(stats["s"]) / float(stats["n"])
    dl = {r["doc_id"]: float(r["n_tok"]) for r in
          corpus.select("doc_id", "n_tok").collect()}
    want = {}
    for (d, ti), f in tf.items():
        idf = (n_docs - df[ti] + 0.5) / (df[ti] + 0.5)
        tfp = (f * (k1 + 1.0)) / (f + k1 * ((1.0 - b) + b * (dl[d] / avgdl)))
        sc, nh = want.get(d, (0.0, 0))
        want[d] = (sc + idf * tfp, nh + 1)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))

    for k in (5, len(ranked) + 10):
        got = pattern_bm25_topk(corpus, index, CFG, terms, k).collect()
        exp = ranked[:k]
        assert [r["doc_id"] for r in got] == [d for d, _ in exp]
        assert [r["n_terms_hit"] for r in got] == [v[1] for _, v in exp]
        for r, (_d, v) in zip(got, exp):
            assert math.isclose(r["score"], v[0], rel_tol=1e-12)
    assert len(ranked) > 0

    with pytest.raises(ValueError, match="k must"):
        pattern_bm25_topk(corpus, index, CFG, terms, 0)
    with pytest.raises(ValueError, match="empty term"):
        pattern_bm25_topk(corpus, index, CFG, [], 5)
