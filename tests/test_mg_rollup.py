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
