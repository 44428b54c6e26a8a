"""Global-axis pattern search: one concatenated stream, matches may cross
document boundaries (the reference's actual semantics — one token stream)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
from hierarchical_bloom_filter_index_spark.operators import build_index, global_pattern_search

CFG_G = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=33, axis="global")


def _global_stream(corp_rows):
    rows = sorted(corp_rows, key=lambda r: r["doc_id"])
    out = []
    for r in rows:
        out.extend(r["tokens"])
    return np.asarray(out, dtype=np.int64)


def _brute(stream: np.ndarray, pattern) -> list[int]:
    pat = np.asarray(pattern, dtype=np.int64)
    if len(stream) < len(pat):
        return []
    win = np.lib.stride_tricks.sliding_window_view(stream, len(pat))
    return np.where((win == pat).all(axis=1))[0].tolist()


@pytest.fixture(scope="module")
def setup(spark):
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=33)).cache()
    corp.count()
    idx = build_index(corp, CFG_G).cache()
    idx.count()
    stream = _global_stream(corp.collect())
    return corp, idx, stream


def test_global_search_matches_stream_bruteforce(spark, setup):
    corp, idx, stream = setup
    for start in (1000, 5000, 12345):
        pat = stream[start : start + 12].tolist()
        got = sorted(r["gpos"] for r in global_pattern_search(corp, idx, CFG_G, pat).collect())
        assert got == _brute(stream, pat)
        assert start in got


def test_global_search_cross_document_match(spark, setup):
    corp, idx, stream = setup
    # construct a pattern straddling a doc boundary: take tokens around the
    # second doc's offset
    row2 = corp.orderBy("doc_id").limit(2).collect()[1]
    b = row2["doc_offset"]
    pat = stream[b - 5 : b + 5].tolist()  # 5 tokens from doc1 + 5 from doc2
    got = sorted(r["gpos"] for r in global_pattern_search(corp, idx, CFG_G, pat).collect())
    assert got == _brute(stream, pat)
    assert (b - 5) in got, "cross-document match must be found"


def test_global_search_missing(spark, setup):
    corp, idx, stream = setup
    pat = stream[100:110].tolist()
    pat[5] = 99_999
    assert global_pattern_search(corp, idx, CFG_G, pat).count() == 0


def test_global_search_single_token(spark, setup):
    corp, idx, stream = setup
    tok = int(stream[7])
    got = sorted(r["gpos"] for r in global_pattern_search(corp, idx, CFG_G, [tok]).collect())
    assert got == _brute(stream, [tok])


def _mini_corpus(spark, docs):
    rows = [(f"d{i:02d}", toks, len(toks), "s") for i, toks in enumerate(docs)]
    return with_global_offsets(spark.createDataFrame(rows, C.CORPUS_SCHEMA))


def test_match_spanning_three_docs(spark):
    """A match running from doc A through ALL of a short doc B into doc C
    must be found: the stitch must accumulate successor docs until m-1
    tokens, not stop at the immediate neighbor (soundness regression)."""
    docs = [
        [5, 6, 7, 8],        # match starts here (gpos 2)
        [9],                 # 1-token doc, entirely inside the match
        [10, 11, 12, 13],
        [9],                 # another short doc
        [7],                 # match 2 starts here (gpos 10), spans 3 docs
        [8],
        [9, 10, 11, 2, 3],
    ]
    corp = _mini_corpus(spark, docs).cache()
    cfg = HbiConfig(tree_span=8, leaf_span=2, fpr=0.01, vocab=64, seed=3, axis="global")
    idx = build_index(corp, cfg).cache()
    pattern = [7, 8, 9, 10, 11]
    got = sorted(r["gpos"] for r in global_pattern_search(corp, idx, cfg, pattern).collect())
    stream = _global_stream(corp.collect())
    assert got == _brute(stream, pattern)
    assert got == [2, 10]  # the two 3-doc spanning matches
    corp.unpersist(); idx.unpersist()


def test_ngram_index_spanning_three_docs(spark):
    """Boundary n-grams crossing a shorter-than-(n-1) doc must be INDEXED
    (build-side stitch), or the cascade would prune a true match."""
    docs = [
        [5, 6, 7, 8],
        [9],
        [10, 11, 12, 13, 1, 2],
    ]
    corp = _mini_corpus(spark, docs).cache()
    cfg = HbiConfig(
        tree_span=8, leaf_span=2, fpr=0.01, vocab=64, seed=5, axis="global",
        ngram=3, ngram_base_bits=8,
    )
    idx = build_index(corp, cfg).cache()
    pattern = [8, 9, 10, 11]  # its first 3-gram [8,9,10] spans all three docs
    got = sorted(r["gpos"] for r in global_pattern_search(corp, idx, cfg, pattern).collect())
    stream = _global_stream(corp.collect())
    assert got == _brute(stream, pattern) == [3]
    corp.unpersist(); idx.unpersist()


def test_global_search_auto_planned_matches_root(spark, setup):
    """Cost-planned seeding on the GLOBAL index (the reference plans over
    exactly this one stream — minCostLp): 'auto' + per-level stats + the
    corpus frequency summary returns the identical exact positions as a
    root-seeded cascade, and deeper-than-root seeds actually happen."""
    from hierarchical_bloom_filter_index_spark.operators import (
        frequency_summary,
        index_stats,
    )
    from hierarchical_bloom_filter_index_spark.operators.route import _plan_start_level, pattern_probe_plan, deepest_usable_level

    corp, idx, stream = setup
    pat = stream[1000:1012].tolist()
    freq = frequency_summary(corp, CFG_G)
    stats = index_stats(idx, CFG_G)
    sout: dict = {}
    got = sorted(r["gpos"] for r in global_pattern_search(
        corp, idx, CFG_G, pat, start_level="auto", freq=freq, stats=stats,
        stats_out=sout).collect())
    exp = sorted(r["gpos"] for r in global_pattern_search(corp, idx, CFG_G, pat).collect())
    assert got == exp == _brute(stream, pat)
    # HbiStats parity on the global axis: per-level probe/survivor counters
    assert sout["start_level"] >= 0 and sout["windows_probed"] and sout["survivors"]
    assert all(v >= 0 for v in sout["windows_probed"].values())
    keys, _, _ = pattern_probe_plan(pat, CFG_G)
    lvl = _plan_start_level("auto", stats, freq, None, None, keys, len(pat), pat,
                            deepest_usable_level(CFG_G, len(pat)))
    assert lvl > 0  # a 12-token pattern of common tokens should seed deeper


def test_stitch_early_exit_with_pathological_min_doc(spark):
    """One 1-token doc must not force ceil(need/1) chained join rounds: the
    stitch exits as soon as every row is finished (plan-explosion guard),
    and stays exact. need=200 here would otherwise be 200 joins."""
    import time as _t

    from hierarchical_bloom_filter_index_spark.corpus import stitch_stream_tail

    docs = [[int(x) for x in range(7, 57)], [9], [int(x) for x in range(10, 60)],
            [int(x) for x in range(20, 70)]]
    corp = _mini_corpus(spark, docs).cache()
    t0 = _t.time()
    rows = {r["doc_id"]: list(r["stitched"]) for r in
            stitch_stream_tail(corp, 200).collect()}
    wall = _t.time() - t0
    stream = _global_stream(corp.collect())
    offs = {r["doc_id"]: (r["doc_offset"], r["n_tok"]) for r in corp.collect()}
    for did, (off, n) in offs.items():
        assert rows[did] == list(stream[off : off + n + 200]), did
    # 200 sequential join rounds would take minutes; the early exit finishes
    # in the 3 rounds the data actually needs
    assert wall < 60
    corp.unpersist()


def test_global_window_membership(spark, setup):
    """exists() over the one-stream index: exact global leaf-window set for
    a present token, empty for an absent one, across doc boundaries."""
    from hierarchical_bloom_filter_index_spark.operators import (
        global_window_membership,
    )

    corp, idx, stream = setup
    span = CFG_G.leaf_span
    tok = int(stream[1000])
    exp = sorted(set((np.nonzero(stream == tok)[0] // span).tolist()))
    got = sorted(
        r["w_id"] for r in global_window_membership(corp, idx, CFG_G, tok).collect()
    )
    assert got == exp and len(exp) > 0
    assert global_window_membership(corp, idx, CFG_G, 99991).count() == 0


def test_global_window_membership_empty_docs(spark):
    """n_tok = 0 docs are in-contract and must not break the window math:
    unguarded, sequence(off/span, (off+n_tok-1)/span) DESCENDS (phantom
    w_ids) and sequence(0, -1) feeds element_at(tokens, 0) -> runtime error
    (ADVICE r2). Empty docs contribute nothing to the stream."""
    from hierarchical_bloom_filter_index_spark.operators import (
        global_window_membership,
    )

    docs = [[5, 6, 7, 8], [], [7, 5, 9, 5], [], [5]]
    corp = _mini_corpus(spark, docs).cache()
    cfg = HbiConfig(tree_span=8, leaf_span=2, fpr=0.01, vocab=64, seed=3, axis="global")
    idx = build_index(corp, cfg).cache()
    stream = np.asarray([t for d in docs for t in d], dtype=np.int64)
    exp = sorted(set((np.nonzero(stream == 5)[0] // cfg.leaf_span).tolist()))
    got = sorted(r["w_id"] for r in global_window_membership(corp, idx, cfg, 5).collect())
    assert got == exp
    corp.unpersist(); idx.unpersist()


def test_prestitched_corpus_identical_answers(spark, setup):
    """A caller-prestitched corpus (longer shared tail) must yield exactly
    the per-query-stitch answers, on both the single and batch paths —
    including matches that run into the stitched tail."""
    from hierarchical_bloom_filter_index_spark.corpus import stitch_stream_tail
    from hierarchical_bloom_filter_index_spark.operators import (
        global_pattern_search_batch,
    )

    corp, idx, stream = setup
    pre = stitch_stream_tail(corp, 64).cache()
    pats = [stream[1000:1012].tolist(), stream[5000:5040].tolist(),
            [9991, 9992, 9993]]
    for pat in pats:
        base = sorted(r["gpos"] for r in
                      global_pattern_search(corp, idx, CFG_G, pat).collect())
        got = sorted(r["gpos"] for r in
                     global_pattern_search(pre, idx, CFG_G, pat,
                                           prestitched_tail=64).collect())
        assert got == base
    base_b = sorted((r["pattern_id"], r["gpos"]) for r in
                    global_pattern_search_batch(corp, idx, CFG_G, pats).collect())
    got_b = sorted((r["pattern_id"], r["gpos"]) for r in
                   global_pattern_search_batch(pre, idx, CFG_G, pats,
                                               prestitched_tail=64).collect())
    assert got_b == base_b
    pre.unpersist()


def test_global_wildcard_matches_stream_bruteforce(spark, setup):
    """Gapped-literal report() on the one-stream axis: positions equal brute
    force over the concatenated stream (wildcard-leading patterns drop the
    anchor soundly; matches may cross doc boundaries)."""
    from hierarchical_bloom_filter_index_spark.operators.route import (
        global_wildcard_pattern_search,
    )

    corp, idx, stream = setup
    pats = [
        [int(stream[1000]), None, int(stream[1002]), None, int(stream[1004])],
        [None, int(stream[5001]), int(stream[5002])],
        [int(stream[42]), None, None, None, None, None, int(stream[48])],
        [987654, None, 987654],  # absent literals -> empty
    ]
    for pat in pats:
        m = len(pat)
        got = sorted(
            r["gpos"]
            for r in global_wildcard_pattern_search(corp, idx, CFG_G, pat).collect()
        )
        want = sorted(
            int(i) for i in range(len(stream) - m + 1)
            if all(pat[j] is None or stream[i + j] == pat[j] for j in range(m))
        )
        assert got == want, pat


def test_global_wildcard_cross_boundary_at_wildcard(spark):
    """A match whose WILDCARD position is exactly the doc boundary: doc 1
    ends ...A, doc 2 starts B... and the pattern is [A, ?, B'] shifted so the
    ? straddles the boundary token."""
    from hierarchical_bloom_filter_index_spark.operators.route import (
        global_wildcard_pattern_search,
    )

    toks1 = [7] * 30 + [111]            # A=111 at gpos 30
    toks2 = [55, 222] + [7] * 40        # ? matches 55 (gpos 31), B=222 at 32
    corp = with_global_offsets(spark.createDataFrame(
        [("d0", toks1, len(toks1)), ("d1", toks2, len(toks2))],
        "doc_id string, tokens array<int>, n_tok int"))
    idx = build_index(corp, CFG_G)
    try:
        got = sorted(
            r["gpos"] for r in global_wildcard_pattern_search(
                corp, idx, CFG_G, [111, None, 222]).collect()
        )
        assert got == [30]
    finally:
        idx.unpersist()
