"""Misra-Gries window-sketch family: leaf/merge kernel laws (byte-determinism
in content, order-free flat merges, association-free undercount bound) and
the dyadic RANGE HEAVY-HITTERS queries — candidates certified superset,
exact verification decides, both axes checked against brute force."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators.rollup import (
    build_global_mg_window_index,
    build_mg_window_index,
    global_mg_window_totals,
    global_range_heavy_hitters,
    mg_window_totals,
    range_heavy_candidates,
    range_heavy_hitters,
    window_sketch_family,
)
from hierarchical_bloom_filter_index_spark.sketches import spacesaving as mg

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=12)


# ---------------------------------------------------------------------------
# kernel laws
# ---------------------------------------------------------------------------
def test_leaf_blobs_match_object_path_including_prune():
    """A leaf node is the object path's one-update summary byte for byte —
    both with k >= window (exact, no prune) and k < window (one prune of the
    exact window counts)."""
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 40, 130).astype(np.int64)
    for k in (32, 5):
        blobs = mg.leaf_window_blobs(toks, 32, k)
        assert len(blobs) == 5
        for i, b in enumerate(blobs):
            ref = mg.MisraGries(k)
            ref.update(toks[i * 32 : (i + 1) * 32])
            assert b == ref.to_bytes()
        assert np.array_equal(mg.blob_totals(blobs),
                              [32, 32, 32, 32, 2])


def test_slot_kernel_equals_phased_leaf_path():
    rng = np.random.default_rng(7)
    span = 16
    docs = [rng.integers(0, 1 << 12, n).astype(np.int64) for n in (1, 5, 33, 100)]
    offs = np.cumsum([0] + [len(d) for d in docs[:-1]])
    want = []
    for off, toks in zip(offs, docs):
        want.extend(mg.leaf_window_blobs(toks, span, 8, phase=int(off) % span))
    lens = np.asarray([len(d) for d in docs], dtype=np.int64)
    cat = np.concatenate(docs)
    doc_idx = np.repeat(np.arange(len(docs)), lens)
    starts = np.cumsum(lens) - lens
    pos = np.arange(cat.size, dtype=np.int64) - starts[doc_idx]
    w = (offs[doc_idx] + pos) // span
    npart = (offs % span + lens + span - 1) // span
    base_slot = np.cumsum(npart) - npart
    first_w = offs // span
    slots = base_slot[doc_idx] + (w - first_w[doc_idx])
    got = mg.partial_blobs_by_slot(cat, slots, int(npart.sum()), 8)
    assert got == want


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_merge_blob_groups_order_free_and_bound_preserving(data):
    """Randomized differential: random streams / k / group partitions —
    merged n_total is EXACT, a shuffled within-group child order gives
    IDENTICAL bytes (flat sum-then-prune is a pure function of the child
    multiset), every stored count underestimates truth within the
    state-computable bound, and the phi-candidate cut is a superset of the
    true phi-heavy keys for every phi tried."""
    n = data.draw(st.integers(min_value=8, max_value=300))
    vocab = data.draw(st.sampled_from([4, 30, 1000]))
    toks = np.asarray(
        data.draw(st.lists(st.integers(0, vocab), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    window = data.draw(st.sampled_from([8, 32]))
    k = data.draw(st.sampled_from([3, 8, 33]))
    blobs = mg.leaf_window_blobs(toks, window, k)
    nw = len(blobs)
    counts = []
    i = 0
    while i < nw:
        g = data.draw(st.integers(1, min(4, nw - i)))
        counts.append(g)
        i += g
    counts = np.asarray(counts, dtype=np.int64)
    merged = mg.merge_blob_groups(blobs, counts, k)
    i = 0
    for g, c in enumerate(counts):
        seg = toks[i * window : (i + c) * window]
        assert mg.blob_totals([merged[g]])[0] == len(seg)
        if c >= 2:
            perm = data.draw(st.permutations(list(range(c))))
            again = mg.merge_blob_groups(
                [blobs[i + j] for j in perm], np.array([c]), k)[0]
            assert again == merged[g]
        keys, cnts = mg._mg_entries(merged[g])
        uniq, true = np.unique(seg, return_counts=True)
        exact = dict(zip(uniq.tolist(), true.tolist()))
        resid = len(seg) - int(cnts.sum())
        bound = resid / (k + 1)
        for key, cnt in zip(keys.tolist(), cnts.tolist()):
            assert cnt <= exact.get(key, 0) <= cnt + bound
        for num, den in ((1, 2), (1, 4)):
            if resid * den >= num * len(seg) * (k + 1):
                with pytest.raises(ValueError, match="certify"):
                    mg.heavy_candidate_blobs([merged[g]], num, den)
                continue
            cand = set(mg.heavy_candidate_blobs([merged[g]], num, den)[0][0].tolist())
            heavy = {t for t, x in exact.items() if x * den >= num * len(seg)}
            assert heavy <= cand
        i += c


def test_refusal_and_family_wiring():
    # k=1 over many distinct keys: resid ~ n, certainly uncertifiable at 1/100
    toks = np.arange(500, dtype=np.int64)
    (b,) = mg.leaf_window_blobs(toks, 512, 1)
    with pytest.raises(ValueError, match="certify"):
        mg.heavy_candidate_blobs([b], 1, 100)
    with pytest.raises(ValueError, match="unknown mg"):
        window_sketch_family(CFG, "mg", nope=3)
    with pytest.raises(ValueError, match="MisraGries blob k"):
        mg.merge_blob_groups([b], np.array([1]), 7)


# ---------------------------------------------------------------------------
# Spark: dyadic builds + range heavy hitters vs brute force, both axes
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def built(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()
    idx = build_mg_window_index(corp, CFG, k=32)
    yield corp, idx
    idx.unpersist()
    corp.unpersist()


def test_mg_totals_equal_window_geometry(spark, built):
    corp, idx = built
    got = {(r["doc_id"], r["level"], r["w_id"]): r["n_window"]
           for r in mg_window_totals(idx).collect()}
    docs = {r["doc_id"]: len(r["tokens"]) for r in corp.collect()}
    want = {}
    for did, n in docs.items():
        for L in CFG.levels:
            span = CFG.span(L)
            for w in range((n + span - 1) // span):
                want[(did, L, w)] = min(span, n - w * span)
    assert got == want


RANGES = [(1, 9), (0, 3), (2, 4)]
PHI = (1, 16)


def _brute_doc_heavy(corp, ranges, num, den, span):
    exp = set()
    for r in corp.select("doc_id", "tokens").collect():
        toks = r["tokens"]
        for a, b in ranges:
            sl = toks[a * span : b * span]
            if not sl:
                continue
            uniq, cnt = np.unique(np.asarray(sl), return_counts=True)
            for t, c in zip(uniq.tolist(), cnt.tolist()):
                if c * den >= num * len(sl):
                    exp.add((r["doc_id"], a, b, t, c))
    return exp


def test_range_heavy_hitters_exact_vs_brute_force(spark, built):
    corp, idx = built
    got = {(r["doc_id"], r["a"], r["b"], r["token"], r["cnt"])
           for r in range_heavy_hitters(idx, corp, RANGES, *PHI,
                                        CFG.leaf_span, CFG.deepest).collect()}
    want = _brute_doc_heavy(corp, RANGES, *PHI, CFG.leaf_span)
    assert got == want and len(want) > 0
    # the candidate stage really is a superset of the exact answer
    cand = {(r["doc_id"], r["a"], r["b"], r["token"])
            for r in range_heavy_candidates(idx, RANGES, *PHI, CFG.deepest).collect()}
    assert {x[:4] for x in want} <= cand


def test_global_range_heavy_hitters_exact_vs_brute_force(spark, built):
    corp, _ = built
    gcorp = C.with_global_offsets(corp)
    gidx = build_global_mg_window_index(gcorp, CFG.with_(axis="global"), k=32)
    try:
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        span = CFG.leaf_span
        ranges = [(0, 6), (3, 97), (1, 2)]
        want = set()
        for a, b in ranges:
            sl = stream[a * span : b * span]
            if not sl:
                continue
            uniq, cnt = np.unique(np.asarray(sl), return_counts=True)
            for t, c in zip(uniq.tolist(), cnt.tolist()):
                if c * PHI[1] >= PHI[0] * len(sl):
                    want.add((a, b, t, c))
        got = {(r["a"], r["b"], r["token"], r["cnt"])
               for r in global_range_heavy_hitters(
                   gidx, gcorp, ranges, *PHI, span, CFG.deepest).collect()}
        assert got == want and len(want) > 0
        # exact stream-window totals (same closed form as the CMS/KLL twins)
        tot = {(r["level"], r["w_id"]): r["n_window"]
               for r in global_mg_window_totals(gidx).collect()}
        n = len(stream)
        for L in CFG.levels:
            sp = CFG.span(L)
            assert sum(v for (lv, _), v in tot.items() if lv == L) == n
            assert tot[(L, 0)] == min(sp, n)
    finally:
        gidx.unpersist()


def test_doc_axis_append_is_pure_union(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        append_window_sketch_index,
    )

    corp, _ = built
    ids = sorted(r["doc_id"] for r in corp.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    old = build_mg_window_index(corp.filter(F.col("doc_id") < mid), CFG, k=32)
    appended = append_window_sketch_index(
        old, corp.filter(F.col("doc_id") >= mid), CFG, family="mg", k=32)
    scratch = build_mg_window_index(corp, CFG, k=32)
    try:
        a = {tuple(r[:3]): bytes(r[3]) for r in appended.collect()}
        s = {tuple(r[:3]): bytes(r[3]) for r in scratch.collect()}
        assert a == s
    finally:
        old.unpersist()
        appended.unpersist()
        scratch.unpersist()


# ---------------------------------------------------------------------------
# certified range TOP-K: exact vs brute force (resid = 0 regime), exactness
# UNDER pruning with the certification inequality engaged, loud refusal when
# the index k cannot certify, short ranges with fewer distinct than k_top
# ---------------------------------------------------------------------------
def _brute_topk(tokens, a, b, span, k_top):
    sl = np.asarray(tokens[a * span : b * span])
    if len(sl) == 0:
        return []
    uniq, cnt = np.unique(sl, return_counts=True)
    order = sorted(zip(uniq.tolist(), cnt.tolist()), key=lambda tc: (-tc[1], tc[0]))
    return [(t, c, i + 1) for i, (t, c) in enumerate(order[:k_top])]


def test_range_topk_exact_vs_brute_force(spark, built):
    """k=256 >= any queried range's token count, so every merged summary is
    an exact counter table (resid = 0) — the ranking must equal brute force
    on every doc and range, including ranges with < k_top distinct tokens."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_topk_tokens,
    )

    corp, _ = built
    idx = build_mg_window_index(corp, CFG, k=256)
    try:
        got = {(r["doc_id"], r["a"], r["b"], r["token"], r["cnt"], r["rank"])
               for r in range_topk_tokens(idx, corp, RANGES, 5,
                                          CFG.leaf_span, CFG.deepest).collect()}
        want = set()
        for r in corp.select("doc_id", "tokens").collect():
            for a, b in RANGES:
                for t, c, rk in _brute_topk(r["tokens"], a, b, CFG.leaf_span, 5):
                    want.add((r["doc_id"], a, b, t, c, rk))
        assert got == want and len(want) > 0
        # plan shape: the rank window and the group-count window stack on
        # ONE exchange (same partition keys) — no shuffle between them
        plan = (range_topk_tokens(idx, corp, RANGES, 5, CFG.leaf_span,
                                  CFG.deepest)
                ._jdf.queryExecution().executedPlan().toString())
        first = plan.index("Window [")
        second = plan.index("Window [", first + 1)
        assert "Exchange" not in plan[first:second]
    finally:
        idx.unpersist()


def test_range_topk_certifies_under_pruning(spark):
    """Skewed doc whose distinct count exceeds k: the merged cover summary
    HAS residual mass (pruning engaged), yet the top-5 certify and equal
    brute force; a second doc with 2 distinct tokens returns 2 ranked rows."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_topk_tokens,
    )

    rng = np.random.default_rng(5)
    heavy = np.repeat(np.arange(5, dtype=np.int64), [100, 60, 40, 30, 20])
    tail = np.arange(100, 106, dtype=np.int64)  # 6 singletons -> 11 distinct
    toks = np.concatenate([heavy, tail])
    rng.shuffle(toks)
    corp = spark.createDataFrame(
        [("d0", [int(t) for t in toks], len(toks), "s"),
         ("d1", [7, 7, 7, 5], 4, "s")],
        "doc_id string, tokens array<int>, n_tok long, source string")
    k = 8  # < 11 distinct => merges prune, resid > 0
    idx = build_mg_window_index(corp, CFG, k=k)
    try:
        rows = range_topk_tokens(idx, corp, [(0, 9)], 5,
                                 CFG.leaf_span, CFG.deepest).collect()
        got = {(r["doc_id"], r["token"], r["cnt"], r["rank"]) for r in rows}
        want = {("d0", t, c, rk)
                for t, c, rk in _brute_topk([int(t) for t in toks], 0, 9,
                                            CFG.leaf_span, 5)}
        want |= {("d1", t, c, rk)
                 for t, c, rk in _brute_topk([7, 7, 7, 5], 0, 9,
                                             CFG.leaf_span, 5)}
        assert got == want
        # the certification path was genuinely exercised: the merged root
        # summary of d0's cover really carries residual mass
        blobs = [bytes(r["sketch"]) for r in idx.filter(
            (F.col("doc_id") == "d0") & (F.col("level") == CFG.deepest)
        ).collect()]
        merged = mg.merge_blob_groups(blobs, np.asarray([len(blobs)]), k)
        _keys, _cnts, _n, resid = mg.tracked_blobs(merged)[0]
        assert resid > 0
    finally:
        idx.unpersist()


def test_range_topk_refuses_when_uncertifiable(spark):
    """Near-uniform tokens with k far below the distinct count: no top-5 is
    certifiable and the operator must raise, never return a wrong ranking."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_topk_tokens,
    )

    rng = np.random.default_rng(9)
    toks = rng.integers(0, 4096, 288).astype(int).tolist()
    corp = spark.createDataFrame(
        [("d0", toks, len(toks), "s")],
        "doc_id string, tokens array<int>, n_tok long, source string")
    idx = build_mg_window_index(corp, CFG, k=8)
    try:
        with pytest.raises(Exception, match="cannot certify|tracks no tokens"):
            range_topk_tokens(idx, corp, [(0, 9)], 5,
                              CFG.leaf_span, CFG.deepest).collect()
    finally:
        idx.unpersist()


def test_global_range_topk_vs_brute_force(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_topk_tokens,
    )

    corp, _ = built
    gcorp = C.with_global_offsets(corp)
    gidx = build_global_mg_window_index(gcorp, CFG.with_(axis="global"), k=256)
    try:
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        ranges = [(0, 6), (3, 97), (1, 2)]
        got = {(r["a"], r["b"], r["token"], r["cnt"], r["rank"])
               for r in global_range_topk_tokens(
                   gidx, gcorp, ranges, 5, CFG.leaf_span, CFG.deepest).collect()}
        want = set()
        for a, b in ranges:
            for t, c, rk in _brute_topk(stream, a, b, CFG.leaf_span, 5):
                want.add((a, b, t, c, rk))
        assert got == want and len(want) > 0
    finally:
        gidx.unpersist()
