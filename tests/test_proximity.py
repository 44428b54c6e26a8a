"""Proximity search (token A within w of token B): exact position pairs vs
brute force over random corpora, for every radius regime (w inside one
window, w spanning several windows, w longer than docs), equal-token pairs,
coarser probe levels, and the refusal paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators.build import build_index
from hierarchical_bloom_filter_index_spark.operators.proximity import (
    proximity_counts,
    proximity_search,
)

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=12)


@pytest.fixture(scope="module")
def built(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()
    idx = build_index(corp, CFG).cache()
    idx.count()
    yield corp, idx
    idx.unpersist()
    corp.unpersist()


def _brute(corp, a, b, w):
    want = set()
    for r in corp.select("doc_id", "tokens").collect():
        t = np.asarray(r["tokens"], dtype=np.int64)
        pa = np.flatnonzero(t == a)
        pb = np.flatnonzero(t == b)
        for i in pa:
            for j in pb:
                if i != j and abs(int(i) - int(j)) <= w:
                    want.add((r["doc_id"], int(i), int(j)))
    return want


def _pick_tokens(corp):
    """One frequent and one mid-frequency token actually present."""
    freq = (
        corp.select(F.explode("tokens").alias("t"))
        .groupBy("t").count().orderBy(F.desc("count")).collect()
    )
    return int(freq[0]["t"]), int(freq[len(freq) // 3]["t"])


@pytest.mark.parametrize("w", [0, 1, 5, 40, 10_000])
def test_pairs_match_brute_force(spark, built, w):
    corp, idx = built
    a, b = _pick_tokens(corp)
    got = {(r["doc_id"], r["pos_a"], r["pos_b"])
           for r in proximity_search(corp, idx, CFG, a, b, w).collect()}
    assert got == _brute(corp, a, b, w)


def test_equal_tokens_and_counts(spark, built):
    corp, idx = built
    a, _ = _pick_tokens(corp)
    got = {(r["doc_id"], r["pos_a"], r["pos_b"])
           for r in proximity_search(corp, idx, CFG, a, a, 3).collect()}
    want = _brute(corp, a, a, 3)
    assert got == want and len(want) > 0
    counts = {r["doc_id"]: r["n_pairs"]
              for r in proximity_counts(corp, idx, CFG, a, a, 3).collect()}
    from collections import Counter

    assert counts == dict(Counter(d for d, _, _ in want))


def test_coarser_level_same_answer(spark, built):
    corp, idx = built
    a, b = _pick_tokens(corp)
    fine = {(r["doc_id"], r["pos_a"], r["pos_b"])
            for r in proximity_search(corp, idx, CFG, a, b, 7).collect()}
    coarse = {(r["doc_id"], r["pos_a"], r["pos_b"])
              for r in proximity_search(corp, idx, CFG, a, b, 7, level=1).collect()}
    assert fine == coarse


def test_absent_token_yields_empty(spark, built):
    corp, idx = built
    a, _ = _pick_tokens(corp)
    assert proximity_search(corp, idx, CFG, a, 99_999_999, 5).count() == 0


def test_refusals(spark, built):
    corp, idx = built
    with pytest.raises(ValueError, match="w must be"):
        proximity_search(corp, idx, CFG, 1, 2, -1)
    with pytest.raises(ValueError, match="token-keyed"):
        proximity_search(corp, idx, CFG.with_(ngram=3), 1, 2, 5)
    with pytest.raises(ValueError, match="no level"):
        proximity_search(corp, idx.filter(F.col("level") != CFG.deepest),
                         CFG, 1, 2, 5)


def test_global_twin_matches_stream_brute_force(spark, built):
    """Stream-axis proximity: pairs over the CONCATENATED stream equal brute
    force, including pairs whose endpoints live in DIFFERENT docs."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_proximity_search,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        rows = sorted(gcorp.select("doc_offset", "tokens").collect(),
                      key=lambda r: r["doc_offset"])
        stream = np.concatenate([np.asarray(r["tokens"]) for r in rows])
        bounds = np.cumsum([len(r["tokens"]) for r in rows])[:-1]
        a, b = _pick_tokens(corp)
        for w in (1, 6, 50):
            got = {(r["gpos_a"], r["gpos_b"])
                   for r in global_proximity_search(gcorp, gidx, gcfg, a, b, w).collect()}
            pa = np.flatnonzero(stream == a)
            pb = np.flatnonzero(stream == b)
            want = set()
            for i in pa:
                for j in pb[np.searchsorted(pb, i - w):
                            np.searchsorted(pb, i + w, side="right")]:
                    if i != j:
                        want.add((int(i), int(j)))
            assert got == want
        assert len(bounds) > 1  # multi-doc stream (boundaries exist)
    finally:
        gidx.unpersist()
        gcorp.unpersist()


def test_global_cross_doc_pair(spark):
    """A pair whose endpoints live in DIFFERENT docs must be found — doc 1
    ends with token A, doc 2 begins with token B, and that boundary pair is
    the ONLY occurrence of either token."""
    gcfg = CFG.with_(axis="global")
    toks1 = [5] * 40 + [777]          # A at global pos 40
    toks2 = [888] + [5] * 50          # B at global pos 41
    corp = C.with_global_offsets(spark.createDataFrame(
        [("d0", toks1, len(toks1)), ("d1", toks2, len(toks2))],
        "doc_id string, tokens array<int>, n_tok int"))
    gidx = build_index(corp, gcfg)
    try:
        from hierarchical_bloom_filter_index_spark.operators.proximity import (
            global_proximity_search,
        )

        got = {(r["gpos_a"], r["gpos_b"])
               for r in global_proximity_search(corp, gidx, gcfg, 777, 888, 4).collect()}
        assert got == {(40, 41)}
        # and the pair disappears when w cannot bridge the boundary gap
        assert global_proximity_search(corp, gidx, gcfg, 777, 888, 0).count() == 0
    finally:
        gidx.unpersist()


def test_global_axis_refusal(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_proximity_search,
    )

    corp, idx = built
    with pytest.raises(ValueError, match="axis"):
        global_proximity_search(corp, idx, CFG, 1, 2, 5)


def _brute_ordered(corp, a, b, w):
    want = set()
    for r in corp.select("doc_id", "tokens").collect():
        t = np.asarray(r["tokens"], dtype=np.int64)
        for i in np.flatnonzero(t == a):
            for j in np.flatnonzero(t == b):
                if 0 < int(j) - int(i) <= w:
                    want.add((r["doc_id"], int(i), int(j)))
    return want


@pytest.mark.parametrize("w", [0, 1, 5, 40])
def test_ordered_pairs_match_brute_force(spark, built, w):
    """ordered=True returns exactly the DIRECTED pairs 0 < pos_b - pos_a
    <= w — the forward-only candidate windows lose nothing."""
    corp, idx = built
    a, b = _pick_tokens(corp)
    got = {(r["doc_id"], r["pos_a"], r["pos_b"])
           for r in proximity_search(corp, idx, CFG, a, b, w, ordered=True).collect()}
    assert got == _brute_ordered(corp, a, b, w)
    if w >= 5:
        assert len(got) > 0


def test_ordered_equal_tokens(spark, built):
    """A == B ordered: every unordered pair appears in exactly ONE direction
    (the forward one) — ordered pairs are half the symmetric set."""
    corp, idx = built
    a, _ = _pick_tokens(corp)
    sym = {(r["doc_id"], r["pos_a"], r["pos_b"])
           for r in proximity_search(corp, idx, CFG, a, a, 3).collect()}
    fwd = {(r["doc_id"], r["pos_a"], r["pos_b"])
           for r in proximity_search(corp, idx, CFG, a, a, 3, ordered=True).collect()}
    assert fwd == {(d, i, j) for d, i, j in sym if j > i}
    assert len(fwd) * 2 == len(sym) > 0


def test_global_ordered_matches_stream_brute_force(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_proximity_search,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        rows = sorted(gcorp.select("doc_offset", "tokens").collect(),
                      key=lambda r: r["doc_offset"])
        stream = np.concatenate([np.asarray(r["tokens"]) for r in rows])
        a, b = _pick_tokens(corp)
        for w in (1, 6, 50):
            got = {(r["gpos_a"], r["gpos_b"])
                   for r in global_proximity_search(
                       gcorp, gidx, gcfg, a, b, w, ordered=True).collect()}
            pa = np.flatnonzero(stream == a)
            pb = np.flatnonzero(stream == b)
            want = {(int(i), int(j)) for i in pa
                    for j in pb[np.searchsorted(pb, i + 1):
                                np.searchsorted(pb, i + w, side="right")]}
            assert got == want
    finally:
        gidx.unpersist()
        gcorp.unpersist()


def test_batch_equals_singles(spark, built):
    """One-scan batched proximity must return EXACTLY the per-query answers
    (same candidates soundness, shared probe) — including an equal-token
    pair, w=0, and an absent token."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        proximity_search,
        proximity_search_batch,
    )

    corp, idx = built
    a, b = _pick_tokens(corp)
    # mixed 3-/4-tuples: ordered entries share the one scan with unordered
    queries = [(a, b, 6), (b, a, 2), (a, a, 4), (a, b, 0), (a, 987654321, 9),
               (a, b, 6, True), (a, a, 4, True)]
    got = {(r["pair_id"], r["doc_id"], r["pos_a"], r["pos_b"])
           for r in proximity_search_batch(corp, idx, CFG, queries).collect()}
    want = set()
    for pid, q in enumerate(queries):
        ta, tb, w = q[0], q[1], q[2]
        o = q[3] if len(q) > 3 else False
        for r in proximity_search(corp, idx, CFG, ta, tb, w, ordered=o).collect():
            want.add((pid, r["doc_id"], r["pos_a"], r["pos_b"]))
    assert got == want and len(want) > 0
    assert any(pid >= 5 for pid, *_ in got)  # ordered entries found pairs


def test_batch_refusals(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        proximity_search_batch,
    )

    corp, idx = built
    with pytest.raises(ValueError, match="empty"):
        proximity_search_batch(corp, idx, CFG, [])
    with pytest.raises(ValueError, match="w must be"):
        proximity_search_batch(corp, idx, CFG, [(1, 2, -3)])


def test_global_batch_equals_singles(spark, built):
    """One-scan batched STREAM-axis proximity returns EXACTLY the per-query
    answers — mixed radii (shared halo is the max), an equal-token pair,
    and an absent token."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_proximity_search,
        global_proximity_search_batch,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        a, b = _pick_tokens(corp)
        queries = [(a, b, 6), (b, a, 50), (a, a, 3), (a, 987654321, 9), (b, a, 0),
                   (a, b, 6, True), (b, a, 50, True)]
        got = {(r["pair_id"], r["gpos_a"], r["gpos_b"])
               for r in global_proximity_search_batch(gcorp, gidx, gcfg, queries).collect()}
        want = set()
        for pid, q in enumerate(queries):
            ta, tb, w = q[0], q[1], q[2]
            o = q[3] if len(q) > 3 else False
            for r in global_proximity_search(
                    gcorp, gidx, gcfg, ta, tb, w, ordered=o).collect():
                want.add((pid, r["gpos_a"], r["gpos_b"]))
        assert got == want and len(want) > 0
        assert any(pid >= 5 for pid, *_ in got)
    finally:
        gidx.unpersist()
        gcorp.unpersist()


def test_global_batch_refusals(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_proximity_search_batch,
    )

    corp, idx = built
    gcfg = CFG.with_(axis="global")
    with pytest.raises(ValueError, match="empty"):
        global_proximity_search_batch(corp, idx, gcfg, [])
    with pytest.raises(ValueError, match="w must be"):
        global_proximity_search_batch(corp, idx, gcfg, [(1, 2, -3)])
    with pytest.raises(ValueError, match="axis"):
        global_proximity_search_batch(corp, idx, CFG, [(1, 2, 3)])


def _brute_chain(corp, chain, w):
    """Naive DFS existence of an ordered chain from each start position."""
    want = set()
    for r in corp.select("doc_id", "tokens").collect():
        t = np.asarray(r["tokens"], dtype=np.int64)

        def ok_from(p, i):
            if i == len(chain):
                return True
            nxt = np.flatnonzero(t == chain[i])
            return any(ok_from(int(q), i + 1)
                       for q in nxt[(nxt > p) & (nxt <= p + w)])

        for p in np.flatnonzero(t == chain[0]):
            if ok_from(int(p), 1):
                want.add((r["doc_id"], int(p)))
    return want


@pytest.mark.parametrize("w", [1, 3, 9])
def test_chain_matches_brute_force(spark, built, w):
    """Ordered chain (phrase-with-slop): start positions equal naive DFS —
    including a repeated token in the chain."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        ordered_chain_search,
    )

    corp, idx = built
    a, b = _pick_tokens(corp)
    for chain in ([a, b], [a, b, a], [b, b, b]):
        got = {(r["doc_id"], r["pos"])
               for r in ordered_chain_search(corp, idx, CFG, chain, w).collect()}
        assert got == _brute_chain(corp, chain, w), (chain, w)


def test_chain_singleton_and_greedy_trap(spark, built):
    """k=1 returns every position of the token; and the DP must NOT be
    greedy-earliest — a crafted doc where the earliest middle token dead-ends
    but a later one completes the chain."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        ordered_chain_search,
    )

    corp, idx = built
    a, _ = _pick_tokens(corp)
    got = {(r["doc_id"], r["pos"])
           for r in ordered_chain_search(corp, idx, CFG, [a], 1).collect()}
    want = {(r["doc_id"], int(p)) for r in corp.select("doc_id", "tokens").collect()
            for p in np.flatnonzero(np.asarray(r["tokens"]) == a)}
    assert got == want and len(want) > 0

    # doc: A at 0; B at 1 (earliest, dead end) and at 4; C at 6.
    # greedy earliest B=1 fails (1+4 < 6); B=4 reaches C=6. w=4.
    toks = [7, 8, 5, 5, 8, 5, 9] + [5] * 40
    from hierarchical_bloom_filter_index_spark.operators.build import build_index
    crafted = spark.createDataFrame(
        [("g0", toks, len(toks))], "doc_id string, tokens array<int>, n_tok int")
    cidx = build_index(crafted, CFG)
    got = {(r["doc_id"], r["pos"]) for r in
           ordered_chain_search(crafted, cidx, CFG, [7, 8, 9], 4).collect()}
    assert got == {("g0", 0)}


def test_chain_refusals(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        ordered_chain_search,
    )

    corp, idx = built
    with pytest.raises(ValueError, match="empty chain"):
        ordered_chain_search(corp, idx, CFG, [], 3)
    with pytest.raises(ValueError, match="w must be"):
        ordered_chain_search(corp, idx, CFG, [1, 2], -1)
    # absent token anywhere in the chain -> empty, not an error
    a, _ = _pick_tokens(corp)
    assert ordered_chain_search(corp, idx, CFG, [a, 987654321], 5).count() == 0


def test_global_chain_matches_stream_brute_force(spark, built):
    """Stream-axis ordered chain: start positions over the CONCATENATED
    stream equal naive DFS, for chains spanning several windows."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_ordered_chain_search,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        rows = sorted(gcorp.select("doc_offset", "tokens").collect(),
                      key=lambda r: r["doc_offset"])
        stream = np.concatenate([np.asarray(r["tokens"]) for r in rows])
        a, b = _pick_tokens(corp)
        for chain, w in (([a, b], 6), ([a, b, a], 4), ([a, a, a], 40), ([a], 1)):
            got = {r["gpos"] for r in global_ordered_chain_search(
                gcorp, gidx, gcfg, chain, w).collect()}
            pos = {c: np.flatnonzero(stream == c) for c in set(chain)}
            good = pos[chain[-1]]
            for i in range(len(chain) - 2, -1, -1):
                pi = pos[chain[i]]
                lo = np.searchsorted(good, pi + 1, side="left")
                hi = np.searchsorted(good, pi + w, side="right")
                good = pi[hi > lo]
            want = {int(p) for p in good}
            assert got == want, (chain, w)
            if len(chain) > 1 and w >= 4:
                assert len(got) > 0
    finally:
        gidx.unpersist()
        gcorp.unpersist()


def test_global_chain_cross_doc(spark):
    """A chain whose links live in THREE different docs must be found."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_ordered_chain_search,
    )

    gcfg = CFG.with_(axis="global")
    # A ends doc 0 (gpos 39), B begins doc 1 (gpos 40), C begins doc 2
    # (gpos 40 + 33 = 73): gaps 1 and 33, so w=33 finds it, w=5 does not.
    corp = C.with_global_offsets(spark.createDataFrame(
        [("d0", [5] * 39 + [777], 40),
         ("d1", [888] + [5] * 32, 33),
         ("d2", [999] + [5] * 50, 51)],
        "doc_id string, tokens array<int>, n_tok int"))
    gidx = build_index(corp, gcfg)
    try:
        got = {r["gpos"] for r in global_ordered_chain_search(
            corp, gidx, gcfg, [777, 888, 999], 33).collect()}
        assert got == {39}
        assert global_ordered_chain_search(
            corp, gidx, gcfg, [777, 888, 999], 5).count() == 0
    finally:
        gidx.unpersist()


def _brute_negated(corp, a, b, w, ordered=False):
    want = set()
    for r in corp.select("doc_id", "tokens").collect():
        t = np.asarray(r["tokens"], dtype=np.int64)
        pb = np.flatnonzero(t == b)
        for i in np.flatnonzero(t == a):
            lo = int(i) + 1 if ordered else int(i) - w
            near = pb[(pb >= lo) & (pb <= int(i) + w) & (pb != int(i))]
            if len(near) == 0:
                want.add((r["doc_id"], int(i)))
    return want


@pytest.mark.parametrize("w", [0, 1, 5, 40, 10_000])
def test_negated_matches_brute_force(spark, built, w):
    """NOT-proximity (A with no B within w) equals brute force for every
    radius regime — including w longer than docs (only B-free docs survive)."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        negated_proximity_search,
    )

    corp, idx = built
    a, b = _pick_tokens(corp)
    got = {(r["doc_id"], r["pos_a"])
           for r in negated_proximity_search(corp, idx, CFG, a, b, w).collect()}
    assert got == _brute_negated(corp, a, b, w)


def test_negated_complement_and_ordered(spark, built):
    """Negated + positive partition A's positions exactly; ordered flavor
    ignores Bs BEFORE the A position; equal-token case means 'no OTHER A'."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        negated_proximity_search,
        proximity_search,
    )

    corp, idx = built
    a, b = _pick_tokens(corp)
    all_a = {(r["doc_id"], int(p)) for r in corp.select("doc_id", "tokens").collect()
             for p in np.flatnonzero(np.asarray(r["tokens"]) == a)}
    for ta, tb, w, o in [(a, b, 6, False), (b, a, 3, True), (a, a, 4, False),
                         (a, a, 4, True), (a, 987654321, 7, False)]:
        neg = {(r["doc_id"], r["pos_a"]) for r in negated_proximity_search(
            corp, idx, CFG, ta, tb, w, ordered=o).collect()}
        assert neg == _brute_negated(corp, ta, tb, w, ordered=o), (ta, tb, w, o)
        pos = {(r["doc_id"], r["pos_a"]) for r in proximity_search(
            corp, idx, CFG, ta, tb, w, ordered=o).collect()}
        base = all_a if ta == a else {
            (r["doc_id"], int(p)) for r in corp.select("doc_id", "tokens").collect()
            for p in np.flatnonzero(np.asarray(r["tokens"]) == ta)}
        assert neg == base - pos, (ta, tb, w, o)  # exact complement
    # absent B: every A position is isolated
    assert _brute_negated(corp, a, 987654321, 7) == all_a


def test_negated_certificate_fires(spark):
    """A rare B leaves most A-windows' neighborhoods B-negative — the crafted
    corpus has exactly one B, so every A beyond the radius is emitted via the
    certificate path and the one nearby A is correctly rejected."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        negated_proximity_search,
    )

    toks = [5] * 200
    toks[100] = 777  # the only B
    toks[98] = 9     # A within w=4 of B -> rejected
    toks[10] = 9     # far A -> certified
    toks[190] = 9    # far A -> certified
    corp = spark.createDataFrame(
        [("n0", toks, len(toks))], "doc_id string, tokens array<int>, n_tok int")
    idx = build_index(corp, CFG)
    got = {(r["doc_id"], r["pos_a"]) for r in
           negated_proximity_search(corp, idx, CFG, 9, 777, 4).collect()}
    assert got == {("n0", 10), ("n0", 190)}


def test_global_negated_matches_stream_brute_force(spark, built):
    """Stream-axis NOT-proximity: a B just across a doc boundary DOES
    disqualify an A (boundaries invisible)."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_negated_proximity_search,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        rows = sorted(gcorp.select("doc_offset", "tokens").collect(),
                      key=lambda r: r["doc_offset"])
        stream = np.concatenate([np.asarray(r["tokens"]) for r in rows])
        a, b = _pick_tokens(corp)
        for ta, tb, w, o in [(a, b, 6, False), (b, a, 50, False),
                             (a, a, 3, False), (a, b, 6, True)]:
            got = {r["gpos_a"] for r in global_negated_proximity_search(
                gcorp, gidx, gcfg, ta, tb, w, ordered=o).collect()}
            pa = np.flatnonzero(stream == ta)
            pb = np.flatnonzero(stream == tb)
            lo = np.searchsorted(pb, pa + (1 if o else -w), side="left")
            hi = np.searchsorted(pb, pa + w, side="right")
            cnt = hi - lo
            if ta == tb and not o:
                cnt = cnt - 1  # self hit
            want = {int(p) for p in pa[cnt == 0]}
            assert got == want, (ta, tb, w, o)
            assert len(got) > 0 or (ta, tb) == (a, b)
    finally:
        gidx.unpersist()
        gcorp.unpersist()


def test_global_negated_cross_doc_disqualifies(spark):
    """The ONLY B sits at the start of the NEXT doc: doc-axis would call the
    A isolated, stream-axis must not (and must again once w shrinks)."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_negated_proximity_search,
    )

    gcfg = CFG.with_(axis="global")
    corp = C.with_global_offsets(spark.createDataFrame(
        [("d0", [5] * 39 + [777], 40),   # A at gpos 39
         ("d1", [888] + [5] * 50, 51)],  # B at gpos 40
        "doc_id string, tokens array<int>, n_tok int"))
    gidx = build_index(corp, gcfg)
    try:
        assert global_negated_proximity_search(
            corp, gidx, gcfg, 777, 888, 4).count() == 0
        got = {r["gpos_a"] for r in global_negated_proximity_search(
            corp, gidx, gcfg, 777, 888, 0).collect()}
        assert got == {39}
    finally:
        gidx.unpersist()


def test_negated_refusals(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_negated_proximity_search,
        negated_proximity_search,
    )

    corp, idx = built
    with pytest.raises(ValueError, match="w must be"):
        negated_proximity_search(corp, idx, CFG, 1, 2, -1)
    with pytest.raises(ValueError, match="token-keyed"):
        negated_proximity_search(corp, idx, CFG.with_(ngram=3), 1, 2, 5)
    with pytest.raises(ValueError, match="axis"):
        global_negated_proximity_search(corp, idx, CFG, 1, 2, 5)


def test_negated_batch_equals_singles(spark, built):
    """One-scan batched NOT-proximity must return EXACTLY the per-query
    answers — including an equal-token pair (no OTHER A within w), an
    absent B (everything certified), and ordered entries."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        negated_proximity_search,
        negated_proximity_search_batch,
    )

    corp, idx = built
    a, b = _pick_tokens(corp)
    queries = [(b, a, 6), (a, b, 2), (a, a, 4), (a, 987654321, 9),
               (b, a, 6, True), (a, a, 4, True)]
    got = {(r["pair_id"], r["doc_id"], r["pos_a"])
           for r in negated_proximity_search_batch(corp, idx, CFG, queries).collect()}
    want = set()
    for pid, q in enumerate(queries):
        o = q[3] if len(q) > 3 else False
        for r in negated_proximity_search(
                corp, idx, CFG, q[0], q[1], q[2], ordered=o).collect():
            want.add((pid, r["doc_id"], r["pos_a"]))
    assert got == want and len(want) > 0
    assert any(pid >= 4 for pid, *_ in got)  # ordered entries produced rows
    assert any(pid == 3 for pid, *_ in got)  # absent-B certified path


def test_global_negated_batch_equals_singles(spark, built):
    """One-scan batched STREAM-axis NOT-proximity returns EXACTLY the
    per-query answers (cross-doc disqualification included) — mixed radii
    share the max-radius halo, per-query certificates over shared lists."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_negated_proximity_search,
        global_negated_proximity_search_batch,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        a, b = _pick_tokens(corp)
        queries = [(b, a, 6), (a, b, 2), (a, a, 3), (a, 987654321, 9),
                   (b, a, 50), (b, a, 6, True), (a, a, 3, True)]
        got = {(r["pair_id"], r["gpos_a"])
               for r in global_negated_proximity_search_batch(
                   gcorp, gidx, gcfg, queries).collect()}
        want = set()
        for pid, q in enumerate(queries):
            o = q[3] if len(q) > 3 else False
            for r in global_negated_proximity_search(
                    gcorp, gidx, gcfg, q[0], q[1], q[2], ordered=o).collect():
                want.add((pid, r["gpos_a"]))
        assert got == want and len(want) > 0
        assert any(pid >= 5 for pid, *_ in got)
    finally:
        gidx.unpersist()
        gcorp.unpersist()


def test_negated_batch_refusals(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_negated_proximity_search_batch,
        negated_proximity_search_batch,
    )

    corp, idx = built
    gcfg = CFG.with_(axis="global")
    with pytest.raises(ValueError, match="empty"):
        negated_proximity_search_batch(corp, idx, CFG, [])
    with pytest.raises(ValueError, match="w must be"):
        negated_proximity_search_batch(corp, idx, CFG, [(1, 2, -3)])
    with pytest.raises(ValueError, match="axis"):
        global_negated_proximity_search_batch(corp, idx, CFG, [(1, 2, 3)])


def test_chain_batch_equals_singles(spark, built):
    """One-scan batched chain search must return EXACTLY the per-chain
    answers — mixed lengths (incl. the k=1 degenerate), mixed slops, a
    repeated-token chain, and an absent-token chain."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        ordered_chain_search,
        ordered_chain_search_batch,
    )

    corp, idx = built
    a, b = _pick_tokens(corp)
    chains = [([a, b], 3), ([b, a, b], 5), ([a], 2), ([a, a], 4),
              ([a, 987654321, b], 6), ([b, a], 0)]
    got = {(r["chain_id"], r["doc_id"], r["pos"])
           for r in ordered_chain_search_batch(corp, idx, CFG, chains).collect()}
    want = set()
    for cid, (toks, w) in enumerate(chains):
        for r in ordered_chain_search(corp, idx, CFG, toks, w).collect():
            want.add((cid, r["doc_id"], r["pos"]))
    assert got == want and len(want) > 0
    assert any(cid == 2 for cid, *_ in got)  # k=1 chain produced rows


def test_global_chain_batch_equals_singles(spark, built):
    """One-scan batched STREAM-axis chain search returns EXACTLY the
    per-chain answers — the max-reach halo shared by shorter chains,
    cross-doc chains included."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_ordered_chain_search,
        global_ordered_chain_search_batch,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        a, b = _pick_tokens(corp)
        chains = [([a, b], 3), ([b, a, b], 40), ([b], 2), ([a, a], 4),
                  ([a, 987654321], 6)]
        got = {(r["chain_id"], r["gpos"])
               for r in global_ordered_chain_search_batch(
                   gcorp, gidx, gcfg, chains).collect()}
        want = set()
        for cid, (toks, w) in enumerate(chains):
            for r in global_ordered_chain_search(gcorp, gidx, gcfg, toks, w).collect():
                want.add((cid, r["gpos"]))
        assert got == want and len(want) > 0
    finally:
        gidx.unpersist()
        gcorp.unpersist()


def test_chain_batch_refusals(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_ordered_chain_search_batch,
        ordered_chain_search_batch,
    )

    corp, idx = built
    with pytest.raises(ValueError, match="empty chain workload"):
        ordered_chain_search_batch(corp, idx, CFG, [])
    with pytest.raises(ValueError, match="empty chain"):
        ordered_chain_search_batch(corp, idx, CFG, [([], 3)])
    with pytest.raises(ValueError, match="w must be"):
        ordered_chain_search_batch(corp, idx, CFG, [([1, 2], -3)])
    with pytest.raises(ValueError, match="axis"):
        global_ordered_chain_search_batch(corp, idx, CFG, [([1, 2], 3)])


# ---------------------------------------------------------------------------
# disjunctive SET proximity (any-of on both sides)
# ---------------------------------------------------------------------------
def test_set_batch_equals_pair_union(spark, built):
    """A set query (A, B, w) must return EXACTLY the union of the |A|x|B|
    single-pair answers (each (doc, pos_a, pos_b) arises from one token
    pair, so the union is duplicate-free) — including overlapping sides
    (shared token), singleton sides, an absent token, and ordered entries
    sharing the one scan."""
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        proximity_search,
        set_proximity_search_batch,
    )

    corp, idx = built
    a, b = _pick_tokens(corp)
    c = int(corp.select(F.explode("tokens").alias("t"))
            .groupBy("t").count().orderBy("count").first()["t"])  # rarest
    queries = [
        ((a, c), (b,), 6),
        ((a,), (a, b), 4),            # sides overlap: pos_a != pos_b guards
        ((a, 987654321), (b, c), 3),  # absent member is just ignored
        ((b, c), (a, c), 5, True),    # ordered
    ]
    got = {(r["set_id"], r["doc_id"], r["pos_a"], r["pos_b"])
           for r in set_proximity_search_batch(corp, idx, CFG, queries).collect()}
    want = set()
    for sid, q in enumerate(queries):
        o = q[3] if len(q) > 3 else False
        for ta in q[0]:
            for tb in q[1]:
                for r in proximity_search(corp, idx, CFG, ta, tb, q[2],
                                          ordered=o).collect():
                    want.add((sid, r["doc_id"], r["pos_a"], r["pos_b"]))
    assert got == want and len(want) > 0
    assert any(sid == 3 for sid, *_ in got)  # the ordered entry found pairs


def test_set_batch_refusals(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        set_proximity_search_batch,
    )

    corp, idx = built
    with pytest.raises(ValueError, match="empty"):
        set_proximity_search_batch(corp, idx, CFG, [])
    with pytest.raises(ValueError, match="empty token set"):
        set_proximity_search_batch(corp, idx, CFG, [((), (1,), 3)])
    with pytest.raises(ValueError, match="w must be"):
        set_proximity_search_batch(corp, idx, CFG, [((1,), (2,), -3)])


def test_global_set_batch_equals_pair_union(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_proximity_search,
        global_set_proximity_search_batch,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        a, b = _pick_tokens(corp)
        queries = [
            ((a, b), (b,), 6),
            ((a,), (a, b), 50),       # radius spans windows (shared halo = max)
            ((a, 987654321), (b,), 3),
            ((b,), (a, b), 40, True),
        ]
        got = {(r["set_id"], r["gpos_a"], r["gpos_b"])
               for r in global_set_proximity_search_batch(
                   gcorp, gidx, gcfg, queries).collect()}
        want = set()
        for sid, q in enumerate(queries):
            o = q[3] if len(q) > 3 else False
            for ta in q[0]:
                for tb in q[1]:
                    for r in global_proximity_search(
                            gcorp, gidx, gcfg, ta, tb, q[2], ordered=o).collect():
                        want.add((sid, r["gpos_a"], r["gpos_b"]))
        assert got == want and len(want) > 0
        assert any(sid == 3 for sid, *_ in got)
    finally:
        gidx.unpersist()
        gcorp.unpersist()


# ---------------------------------------------------------------------------
# negated SET proximity + SET chains
# ---------------------------------------------------------------------------
def _brute_neg_set(docs, ta, tb, w, ordered):
    """docs: {doc_id: np tokens}. Positions of any A-set token with NO B-set
    token within the window (other than the position itself)."""
    want = set()
    sa, sb = set(ta), set(tb)
    for did, t in docs.items():
        for i in range(len(t)):
            if int(t[i]) not in sa:
                continue
            lo = i + 1 if ordered else i - w
            bad = any(
                j != i and 0 <= j < len(t) and int(t[j]) in sb
                for j in range(lo, i + w + 1))
            if not bad:
                want.add((did, i))
    return want


def _brute_set_chain(docs, slots, w):
    want = set()
    sets = [set(s) for s in slots]
    for did, t in docs.items():
        pos = [[i for i in range(len(t)) if int(t[i]) in s] for s in sets]
        good = set(pos[-1])
        for lvl in range(len(sets) - 2, -1, -1):
            good = {i for i in pos[lvl]
                    if any(i < j <= i + w for j in good)}
        want.update((did, i) for i in good)
    return want


def test_negated_set_batch_matches_brute_force(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        negated_set_proximity_search_batch,
    )

    corp, idx = built
    a, b = _pick_tokens(corp)
    docs = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64)
            for r in corp.select("doc_id", "tokens").collect()}
    queries = [
        ((a,), (b,), 4),
        ((a, b), (b,), 3),            # A∩B: per-position self-hit handling
        ((a,), (b, 987654321), 6),    # absent B member changes nothing
        ((b,), (a, b), 2, True),      # ordered negation
        ((a,), (987654321,), 5),      # B absent everywhere: all A positions
    ]
    got = {(r["set_id"], r["doc_id"], r["pos_a"])
           for r in negated_set_proximity_search_batch(
               corp, idx, CFG, queries).collect()}
    want = set()
    for sid, q in enumerate(queries):
        o = q[3] if len(q) > 3 else False
        for did, i in _brute_neg_set(docs, q[0], q[1], q[2], o):
            want.add((sid, did, i))
    assert got == want and len(want) > 0
    assert any(sid == 1 for sid, *_ in got)  # overlap query returned rows


def test_global_negated_set_batch_matches_brute_force(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_negated_set_proximity_search_batch,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        a, b = _pick_tokens(corp)
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        sdocs = {"": np.asarray(stream, dtype=np.int64)}
        queries = [
            ((a,), (b,), 4),
            ((a, b), (b,), 40),       # radius spans windows; A∩B self-hits
            ((b,), (a, b), 2, True),
            ((a,), (987654321,), 5),
        ]
        got = {(r["set_id"], r["gpos_a"])
               for r in global_negated_set_proximity_search_batch(
                   gcorp, gidx, gcfg, queries).collect()}
        want = set()
        for sid, q in enumerate(queries):
            o = q[3] if len(q) > 3 else False
            for _d, i in _brute_neg_set(sdocs, q[0], q[1], q[2], o):
                want.add((sid, i))
        assert got == want and len(want) > 0
    finally:
        gidx.unpersist()
        gcorp.unpersist()


def test_set_chain_batch_matches_brute_force(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        set_chain_search_batch,
    )

    corp, idx = built
    a, b = _pick_tokens(corp)
    c = int(corp.select(F.explode("tokens").alias("t"))
            .groupBy("t").count().orderBy("count").first()["t"])
    docs = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64)
            for r in corp.select("doc_id", "tokens").collect()}
    chains = [
        ([(a, c), (b,)], 4),
        ([(a,), (a, b), (b,)], 9),      # 3-slot with overlap
        ([(a, b)], 7),                  # k=1 degenerates to any-of positions
        ([(a,), (987654321,)], 5),      # impossible slot: no rows
    ]
    got = {(r["chain_id"], r["doc_id"], r["pos"])
           for r in set_chain_search_batch(corp, idx, CFG, chains).collect()}
    want = set()
    for cid, (slots, w) in enumerate(chains):
        for did, i in _brute_set_chain(docs, slots, w):
            want.add((cid, did, i))
    assert got == want and len(want) > 0
    assert not any(cid == 3 for cid, *_ in got)
    assert any(cid == 1 for cid, *_ in got)


def test_global_set_chain_batch_matches_brute_force(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        global_set_chain_search_batch,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    gidx = build_index(gcorp, gcfg)
    try:
        a, b = _pick_tokens(corp)
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        sdocs = {"": np.asarray(stream, dtype=np.int64)}
        chains = [
            ([(a, b), (b,)], 4),
            ([(a,), (a, b), (b,)], 40),  # reach spans windows + doc bounds
            ([(a, b)], 7),
        ]
        got = {(r["chain_id"], r["gpos"])
               for r in global_set_chain_search_batch(
                   gcorp, gidx, gcfg, chains).collect()}
        want = set()
        for cid, (slots, w) in enumerate(chains):
            for _d, i in _brute_set_chain(sdocs, slots, w):
                want.add((cid, i))
        assert got == want and len(want) > 0
    finally:
        gidx.unpersist()
        gcorp.unpersist()


def test_set_chain_refusals(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.proximity import (
        set_chain_search_batch,
    )

    corp, idx = built
    with pytest.raises(ValueError, match="empty"):
        set_chain_search_batch(corp, idx, CFG, [])
    with pytest.raises(ValueError, match="empty chain"):
        set_chain_search_batch(corp, idx, CFG, [([], 3)])
    with pytest.raises(ValueError, match="empty chain"):
        set_chain_search_batch(corp, idx, CFG, [([(1,), ()], 3)])
    with pytest.raises(ValueError, match="w must be"):
        set_chain_search_batch(corp, idx, CFG, [([(1,), (2,)], -1)])
