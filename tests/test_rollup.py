"""Dyadic HLL rollup: parent-from-children merge == from-scratch build
(exact merge law), estimates within the HLL envelope vs exact distincts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators.rollup import (
    build_hll_window_index,
    window_distinct_estimates,
)
from hierarchical_bloom_filter_index_spark.sketches import HyperLogLog, from_bytes

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=12)


@pytest.fixture(scope="module")
def built(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()
    idx = build_hll_window_index(corp, CFG, p=12).cache()
    idx.count()
    return corp, idx


def test_rolled_up_levels_equal_scratch_build(spark, built):
    corp, idx = built
    # pick a mid-level window and rebuild its HLL from raw tokens
    row = idx.filter("level = 1").first()
    doc = corp.filter(F.col("doc_id") == row["doc_id"]).first()
    span = CFG.span(1)
    toks = np.asarray(doc["tokens"], dtype=np.int64)[row["w_id"] * span : (row["w_id"] + 1) * span]
    scratch = HyperLogLog(p=12, seed=CFG.seed + 7)
    scratch.update(toks)
    rolled = from_bytes(bytes(row["sketch"]))
    assert np.array_equal(rolled.regs, scratch.regs)  # merge law, register-exact


def test_estimates_within_envelope(spark, built):
    corp, idx = built
    ests = {(r["doc_id"], r["w_id"]): r["est_distinct"]
            for r in window_distinct_estimates(idx, 0).collect()}
    docs = {r["doc_id"]: np.asarray(r["tokens"]) for r in corp.limit(40).collect()}
    span = CFG.span(0)
    checked = 0
    for did, toks in docs.items():
        for w in range(0, (len(toks) + span - 1) // span):
            exact = len(np.unique(toks[w * span : (w + 1) * span]))
            est = ests[(did, w)]
            assert abs(est - exact) / max(exact, 1) <= 5 * 1.04 / np.sqrt(2**12)
            checked += 1
    assert checked >= 40


def test_all_levels_present_with_halving_windows(spark, built):
    _, idx = built
    counts = {r["level"]: r["c"] for r in idx.groupBy("level").agg(F.count("*").alias("c")).collect()}
    assert sorted(counts) == CFG.levels
    for L in range(1, CFG.deepest + 1):
        assert counts[L] >= counts[L - 1]


def test_bloom_rollup_equals_scratch_build(spark):
    """uniform_bloom: parents OR-rolled from children must be BYTE-equal to
    the from-scratch multi-level build (Bloom merge law + shared hash
    family), and a non-uniform config must refuse to roll up."""
    from hierarchical_bloom_filter_index_spark.operators.build import (
        build_index,
        build_index_rollup,
    )
    from hierarchical_bloom_filter_index_spark.operators.route import (
        brute_force_search,
        pattern_search,
    )

    cfg = CFG.with_(uniform_bloom=True)
    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()

    def rows(df):
        return sorted(
            (r["doc_id"], r["level"], r["w_id"], bytes(r["bloom"]), r["n_items"], r["bits_set"])
            for r in df.collect()
        )

    scratch = build_index(corp, cfg)
    rolled = build_index_rollup(corp, cfg)
    assert rows(scratch) == rows(rolled)

    with pytest.raises(ValueError):
        build_index_rollup(corp, CFG)  # per-level (m,k): cannot OR children

    # the rolled index answers exactly
    doc = corp.filter(F.col("n_tok") >= 64).orderBy("doc_id").first()
    pat = doc["tokens"][10:22]
    got = sorted(map(tuple, pattern_search(corp, rolled, cfg, pat).collect()))
    exp = sorted(map(tuple, brute_force_search(corp, pat).collect()))
    assert got == exp and len(exp) > 0
    rolled.unpersist()
    corp.unpersist()


def test_bloom_rollup_global_axis(spark):
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.build import (
        build_index,
        build_index_rollup,
    )

    cfg = CFG.with_(uniform_bloom=True, axis="global")
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=13)).cache()

    def rows(df):
        return sorted(
            (r["level"], r["w_id"], bytes(r["bloom"]), r["n_items"], r["bits_set"])
            for r in df.collect()
        )

    scratch = build_index(corp, cfg)
    rolled = build_index_rollup(corp, cfg)
    assert rows(scratch) == rows(rolled)
    rolled.unpersist()
    corp.unpersist()


# ---------------------------------------------------------------------------
# CMS frequency rollup (the linear-sketch analog): byte-exact rollup,
# overestimate-only within eps*N_window, exact window totals
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def built_cms(spark):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_cms_window_index,
    )

    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()
    idx = build_cms_window_index(corp, CFG, depth=3, width=256).cache()
    idx.count()
    return corp, idx


def test_cms_kernel_byte_identity():
    """Canonical window nodes: densify_blob(kernel output) == object-path
    CMS byte for byte (leaf build, grouped merge); representation follows
    the pure content rule (sparse IFF nnz <= sparse_max_nnz); estimates
    are EXACT on sparse nodes, min-over-rows on dense."""
    from hierarchical_bloom_filter_index_spark.sketches import cms

    rng = np.random.default_rng(5)
    toks = rng.integers(0, 5000, 1000).astype(np.int64)
    # W=128 -> sparse_max_nnz=192 > any 64-token window: leaves stay sparse
    D, W, S, span = 3, 128, 17, 64
    blobs = cms.leaf_window_blobs(toks, span, D, W, S)
    assert len(blobs) == (len(toks) + span - 1) // span
    max_nnz = cms.sparse_max_nnz(D, W)
    for i, b in enumerate(blobs):
        sl = toks[i * span : (i + 1) * span]
        ref = cms.CountMinSketch(D, W, S)
        ref.update(sl)
        assert cms.densify_blob(b) == ref.to_bytes()
        assert (b[0] == cms._MAGIC_CMS_SP) == (len(np.unique(sl)) <= max_nnz)
    counts = np.full(len(blobs) // 2, 2, dtype=np.int64)
    for i, b in enumerate(cms.merge_blob_groups(blobs[: len(counts) * 2], counts, D, W, S)):
        sl = toks[i * 2 * span : (i + 1) * 2 * span]
        ref = cms.CountMinSketch(D, W, S)
        ref.update(sl)
        assert cms.densify_blob(b) == ref.to_bytes()
        assert (b[0] == cms._MAGIC_CMS_SP) == (len(np.unique(sl)) <= max_nnz)
    keys = np.array([1, 2, 3, 4999], dtype=np.int64)
    est = cms.estimate_blobs(blobs, keys, D, W, S)
    # leaf 0 is sparse -> exact counts for the probes
    exact0 = np.array([(toks[:span] == k).sum() for k in keys])
    assert np.array_equal(est[0], exact0)
    # a DENSE blob estimates min-over-rows like the object path
    dense0 = cms.densify_blob(blobs[0])
    ref0 = cms.CountMinSketch(D, W, S)
    ref0.update(toks[:span])
    assert np.array_equal(cms.estimate_blobs([dense0], keys, D, W, S)[0], ref0.estimate(keys))
    assert np.array_equal(cms.window_totals(blobs),
                          [min(span, len(toks) - i * span) for i in range(len(blobs))])
    with pytest.raises(ValueError):
        cms.estimate_blobs([dense0], keys, D, 64, S)  # param mismatch refused


def test_cms_hll_mixed_representation_merge():
    """Sparse/dense MIXED groups merge correctly and order-independently:
    force densification with tiny dense params, merge [sparse, dense],
    [dense, sparse], and shuffled orders — identical dense bytes every time,
    equal to the object path over the concatenated content."""
    from hierarchical_bloom_filter_index_spark.sketches import cms, hll

    rng = np.random.default_rng(6)
    a = rng.integers(0, 4000, 300).astype(np.int64)   # wide content -> dense
    b = rng.integers(0, 50, 20).astype(np.int64)      # narrow content -> sparse
    D, W, S = 2, 64, 3                                 # max_nnz = 64
    blob_a = cms.leaf_window_blobs(a, 512, D, W, S)[0]
    blob_b = cms.leaf_window_blobs(b, 512, D, W, S)[0]
    assert blob_a[0] == cms._MAGIC_CMS and blob_b[0] == cms._MAGIC_CMS_SP
    ref = cms.CountMinSketch(D, W, S)
    ref.update(np.concatenate([a, b]))
    m1 = cms.merge_blob_groups([blob_a, blob_b], np.array([2]), D, W, S)[0]
    m2 = cms.merge_blob_groups([blob_b, blob_a], np.array([2]), D, W, S)[0]
    assert m1 == m2 == ref.to_bytes()
    # all-sparse group that must DENSIFY (union nnz > max)
    c = np.arange(40, dtype=np.int64)
    d = np.arange(40, 80, dtype=np.int64)
    bc = cms.leaf_window_blobs(c, 64, D, W, S)[0]
    bd = cms.leaf_window_blobs(d, 64, D, W, S)[0]
    assert bc[0] == bd[0] == cms._MAGIC_CMS_SP
    refcd = cms.CountMinSketch(D, W, S)
    refcd.update(np.concatenate([c, d]))
    mcd = cms.merge_blob_groups([bc, bd], np.array([2]), D, W, S)[0]
    assert mcd[0] == cms._MAGIC_CMS and mcd == refcd.to_bytes()

    P, HS = 4, 9                                       # hll max_nnz = 2
    ha = hll.leaf_window_blobs(a, 512, P, HS)[0]
    hb = hll.leaf_window_blobs(b[:2], 512, P, HS)[0]
    assert ha[0] == hll._MAGIC and hb[0] == hll._MAGIC_HLL_SP
    href = hll.HyperLogLog(P, HS)
    href.update(np.concatenate([a, b[:2]]))
    h1 = hll.merge_blob_groups([ha, hb], np.array([2]), P)[0]
    h2 = hll.merge_blob_groups([hb, ha], np.array([2]), P)[0]
    assert h1 == h2 == href.to_bytes()
    # multi-group call with mixed output representations in one batch
    got = cms.merge_blob_groups([blob_a, blob_b, bc, blob_b], np.array([2, 1, 1]), D, W, S)
    assert got[0] == ref.to_bytes() and got[1] == bc and got[2] == blob_b


def test_cms_rollup_byte_equal_scratch(spark, built_cms):
    """CMS is linear: every rolled-up parent densifies to the from-scratch
    build of its window, byte for byte (stronger than the HLL
    register-equality law), and the stored form is canonical (sparse IFF
    nnz <= sparse_max_nnz — pure function of the window's content)."""
    from hierarchical_bloom_filter_index_spark.sketches import CountMinSketch, cms

    corp, idx = built_cms
    for L in (0, 1):
        row = idx.filter(F.col("level") == L).first()
        doc = corp.filter(F.col("doc_id") == row["doc_id"]).first()
        span = CFG.span(L)
        toks = np.asarray(doc["tokens"], dtype=np.int64)[row["w_id"] * span : (row["w_id"] + 1) * span]
        scratch = CountMinSketch(3, 256, CFG.seed + 11)
        scratch.update(toks)
        blob = bytes(row["sketch"])
        assert cms.densify_blob(blob) == scratch.to_bytes()
        assert (blob[0] == cms._MAGIC_CMS_SP) == \
            (len(np.unique(toks)) <= cms.sparse_max_nnz(3, 256))


def test_cms_window_estimates_overestimate_within_eps(spark, built_cms):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        window_freq_estimates,
    )

    corp, idx = built_cms
    probes = [1, 2, 3, 5, 8, 4001]
    ests = {(r["doc_id"], r["w_id"], r["token"]): r["est_count"]
            for r in window_freq_estimates(idx, 0, probes).collect()}
    span = CFG.span(0)
    eps = np.e / 256
    n_checked = n_exceed = 0
    for doc in corp.limit(30).collect():
        toks = np.asarray(doc["tokens"], dtype=np.int64)
        for w in range(0, (len(toks) + span - 1) // span):
            sl = toks[w * span : (w + 1) * span]
            for t in probes:
                exact = int((sl == t).sum())
                est = ests[(doc["doc_id"], w, t)]
                assert est >= exact, "CMS must overestimate only"
                n_checked += 1
                if est - exact > eps * len(sl):
                    n_exceed += 1
    # per-pair failure prob <= exp(-depth) ~ 5%; allow generous slack
    assert n_checked > 200 and n_exceed / n_checked <= 0.10


def test_cms_window_totals_exact(spark, built_cms):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        window_token_totals,
    )

    corp, idx = built_cms
    tots = {(r["doc_id"], r["level"], r["w_id"]): r["n_window"]
            for r in window_token_totals(idx).collect()}
    for doc in corp.limit(20).collect():
        n = int(doc["n_tok"])
        for L in CFG.levels:
            span = CFG.span(L)
            for w in range(0, (n + span - 1) // span):
                assert tots[(doc["doc_id"], L, w)] == min(span, n - w * span)


def test_cms_window_index_persist_and_incremental(spark, built_cms, tmp_path):
    """The window-sketch index persists through the generic level-partitioned
    writer byte-for-byte, and the doc-axis build is embarrassingly
    incremental: build(old ∪ new) == build(old) ∪ build(new) (per-doc rows,
    no cross-doc state)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_cms_window_index,
    )
    from hierarchical_bloom_filter_index_spark.sources.io import read_index, write_index

    corp, idx = built_cms
    path = str(tmp_path / "cms_idx")
    write_index(idx, path)
    back = read_index(spark, path)
    key = lambda r: (r["doc_id"], r["level"], r["w_id"])
    orig = {key(r): bytes(r["sketch"]) for r in idx.collect()}
    rt = {key(r): bytes(r["sketch"]) for r in back.collect()}
    assert rt == orig and len(orig) > 0

    docs = [r["doc_id"] for r in corp.select("doc_id").distinct().orderBy("doc_id").limit(4).collect()]
    old = corp.filter(F.col("doc_id").isin(docs[:2]))
    new = corp.filter(F.col("doc_id").isin(docs[2:]))
    both = corp.filter(F.col("doc_id").isin(docs))
    inc = build_cms_window_index(old, CFG, depth=3, width=256).unionByName(
        build_cms_window_index(new, CFG, depth=3, width=256)
    )
    full = build_cms_window_index(both, CFG, depth=3, width=256)
    assert {key(r): bytes(r["sketch"]) for r in inc.collect()} == \
           {key(r): bytes(r["sketch"]) for r in full.collect()}


# ---------------------------------------------------------------------------
# Dyadic range queries: cover correctness, exact totals, bounded estimates
# ---------------------------------------------------------------------------

def test_dyadic_cover_tiles_exactly():
    from hierarchical_bloom_filter_index_spark.operators.rollup import dyadic_cover

    rng = np.random.default_rng(3)
    cases = [(0, 1), (3, 11), (0, 32), (7, 8), (5, 29), (0, 0), (13, 64)]
    cases += [tuple(sorted(rng.integers(0, 200, 2).tolist())) for _ in range(50)]
    for a, b in cases:
        for deepest in (3, 5, 6):
            leaves = []
            for L, w in dyadic_cover(a, b, deepest):
                assert 0 <= L <= deepest
                k = deepest - L
                leaves.extend(range(w << k, (w + 1) << k))
            assert leaves == list(range(a, b)), (a, b, deepest)
            if b > a:
                # O(log) within one tree span; ranges longer than the root
                # span need (b-a)/2^deepest root-size blocks (inherent)
                assert len(dyadic_cover(a, b, deepest)) <= \
                    (b - a) // (1 << deepest) + 2 * deepest + 2
    with pytest.raises(ValueError):
        dyadic_cover(-1, 3, 5)


def test_range_totals_exact_and_estimates_bounded(spark, built_cms):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_hll_window_index,
        range_distinct_estimates,
        range_freq_estimates,
        range_token_totals,
    )

    corp, cms_idx = built_cms
    hll_idx = build_hll_window_index(corp, CFG, p=12)
    docs = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64)
            for r in corp.limit(20).collect()}
    span, deepest = CFG.leaf_span, CFG.deepest
    rqs = [(0, 2), (1, 7), (3, 4), (0, 64)]
    ranges = [(d, a, b) for d in docs for a, b in rqs]

    tots = {(r["doc_id"], r["a"], r["b"]): r["n_tokens"]
            for r in range_token_totals(cms_idx, ranges, deepest).collect()}
    dists = {(r["doc_id"], r["a"], r["b"]): r["est_distinct"]
             for r in range_distinct_estimates(hll_idx, ranges, deepest).collect()}
    probes = [1, 2, 3]
    freqs = {(r["doc_id"], r["a"], r["b"], r["token"]): r["est_count"]
             for r in range_freq_estimates(cms_idx, ranges, probes, deepest).collect()}

    eps = np.e / 256
    n_rows = 0
    for d, toks in docs.items():
        for a, b in rqs:
            sl = toks[a * span : b * span]
            if len(sl) == 0:
                assert (d, a, b) not in tots  # empty range -> no row
                continue
            n_rows += 1
            assert tots[(d, a, b)] == len(sl), "range totals must be exact"
            exact_d = len(np.unique(sl))
            assert abs(dists[(d, a, b)] - exact_d) / max(exact_d, 1) <= 5 * 1.04 / np.sqrt(2**12)
            for t in probes:
                exact_c = int((sl == t).sum())
                est = freqs[(d, a, b, t)]
                assert est >= exact_c
                assert est - exact_c <= eps * len(sl) * 3  # merged-node slack
    assert n_rows >= 40
    hll_idx.unpersist()


def test_range_all_docs_pair_form_equals_per_doc_triples(spark, built_cms):
    """(a, b) pair ranges = the same query fanned out to EVERY doc, without
    materializing the doc catalog on the driver: rows must equal the
    explicit-triple form over all docs (the broadcast side is only the
    O(log) shared cover nodes)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_token_totals,
    )

    corp, cms_idx = built_cms
    rqs = [(0, 2), (1, 7), (0, 64)]
    all_doc_ids = [r["doc_id"] for r in corp.select("doc_id").collect()]
    triples = [(d, a, b) for d in all_doc_ids for a, b in rqs]

    got = sorted(
        tuple(r) for r in range_token_totals(cms_idx, rqs, CFG.deepest).collect()
    )
    want = sorted(
        tuple(r) for r in range_token_totals(cms_idx, triples, CFG.deepest).collect()
    )
    assert got == want and len(got) > 0


def test_range_all_docs_degenerate_doc_count(spark):
    """Pair-form range queries on a 1-doc corpus (and an empty range) —
    the degenerate fan-out the driver-collect version special-cased."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_cms_window_index,
        range_token_totals,
    )

    corp = spark.createDataFrame(
        [("only", list(range(100)), 100, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    idx = build_cms_window_index(corp, CFG, depth=3, width=256)
    rows = {(r["doc_id"], r["a"], r["b"]): r["n_tokens"]
            for r in range_token_totals(idx, [(0, 2), (40, 50)], CFG.deepest).collect()}
    # doc has 100 tokens = 4 leaf windows (span 32): [0,2) holds 64 tokens,
    # [40,50) is past the end -> no covering node -> no row
    assert rows == {("only", 0, 2): 64}
    idx.unpersist()


# ---------------------------------------------------------------------------
# KLL quantile rollup: per-window quantile sketches, bound-preserving parent
# merges, EXACT item counts, dyadic range quantiles on both axes
# ---------------------------------------------------------------------------

def test_kll_leaf_kernel_byte_identity():
    from hierarchical_bloom_filter_index_spark.sketches import KLL
    from hierarchical_bloom_filter_index_spark.sketches.kll import (
        blob_totals,
        leaf_window_blobs,
        quantile_blobs,
    )

    rng = np.random.default_rng(4)
    toks = rng.integers(0, 4096, 173).astype(np.int64)
    blobs = leaf_window_blobs(toks, 32, 200, 99)
    assert len(blobs) == 6
    for i, b in enumerate(blobs):
        obj = KLL(k=200, seed=99)
        obj.update(toks[i * 32 : (i + 1) * 32].astype(np.float64))
        assert b == obj.to_bytes()
    assert blob_totals(blobs).tolist() == [32, 32, 32, 32, 32, 13]
    # phased: the two partials of a split window merge to the unsplit
    # window's content (same multiset -> identical quantiles, exact n)
    head = leaf_window_blobs(toks[:10], 32, 200, 99)
    tail = leaf_window_blobs(toks[10:], 32, 200, 99, phase=10)
    merged = KLL.from_bytes(head[0]).merge(KLL.from_bytes(tail[0]))
    whole = KLL(k=200, seed=99)
    whole.update(toks[:32].astype(np.float64))
    assert merged.n == whole.n == 32
    qs = [0.25, 0.5, 0.75]
    assert np.allclose(merged.quantiles(qs), whole.quantiles(qs))
    assert np.allclose(quantile_blobs([whole.to_bytes()], qs)[0], whole.quantiles(qs))


@pytest.fixture(scope="module")
def built_kll(spark):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_kll_window_index,
    )

    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()
    idx = build_kll_window_index(corp, CFG, k=200).cache()
    idx.count()
    return corp, idx


def test_kll_rollup_totals_exact_and_quantiles_bounded(spark, built_kll):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        kll_window_totals,
        window_quantile_estimates,
    )

    corp, idx = built_kll
    docs = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64)
            for r in corp.limit(15).collect()}
    # exact totals at every level (geometry + coverage, the oracle's check)
    tots = {(r["doc_id"], r["level"], r["w_id"]): r["n_window"]
            for r in kll_window_totals(idx).collect()}
    for d, toks in docs.items():
        for L in CFG.levels:
            span = CFG.span(L)
            for w in range((len(toks) + span - 1) // span):
                assert tots[(d, L, w)] == len(toks[w * span : (w + 1) * span])
    # root-level quantiles: rank error within the k=200 envelope (tie-aware)
    ests = {(r["doc_id"], r["w_id"], r["q"]): r["est"]
            for r in window_quantile_estimates(idx, 0, [0.25, 0.5, 0.75]).collect()}
    checked = 0
    for d, toks in docs.items():
        span = CFG.span(0)
        for w in range((len(toks) + span - 1) // span):
            sl = np.sort(toks[w * span : (w + 1) * span].astype(np.float64))
            for q in (0.25, 0.5, 0.75):
                est = ests[(d, w, q)]
                lo = np.searchsorted(sl, est, side="left") / len(sl)
                hi = np.searchsorted(sl, est, side="right") / len(sl)
                assert lo - 0.05 <= q <= hi + 0.05, (d, w, q, est)
                checked += 1
    assert checked >= 30


def test_kll_range_quantiles_both_axes(spark, built_kll):
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_kll_window_index,
        global_kll_window_totals,
        global_range_quantile_estimates,
        range_quantile_estimates,
    )

    corp, idx = built_kll
    span, deepest = CFG.leaf_span, CFG.deepest
    qs = [0.1, 0.5, 0.9]
    rqs = [(0, 4), (1, 7)]
    docs = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64)
            for r in corp.limit(10).collect()}
    ests = {(r["doc_id"], r["a"], r["b"], r["q"]): r["est"]
            for r in range_quantile_estimates(idx, rqs, qs, deepest).collect()}
    checked = 0
    for d, toks in docs.items():
        for a, b in rqs:
            sl = np.sort(toks[a * span : b * span].astype(np.float64))
            if len(sl) == 0:
                continue
            for q in qs:
                est = ests[(d, a, b, q)]
                lo = np.searchsorted(sl, est, side="left") / len(sl)
                hi = np.searchsorted(sl, est, side="right") / len(sl)
                assert lo - 0.06 <= q <= hi + 0.06
                checked += 1
    assert checked >= 20

    # global twin: stream-window slice quantiles + exact stream totals
    gcorp = with_global_offsets(corp)
    gidx = build_global_kll_window_index(gcorp, CFG, k=200)
    stream = np.concatenate(
        [np.asarray(r["tokens"], dtype=np.int64)
         for r in gcorp.orderBy("doc_id").collect()]
    )
    gtots = {(r["level"], r["w_id"]): r["n_window"]
             for r in global_kll_window_totals(gidx).collect()}
    n_leaf = (len(stream) + span - 1) // span
    assert gtots[(deepest, 0)] == span
    assert gtots[(deepest, n_leaf - 1)] == len(stream) - (n_leaf - 1) * span
    grqs = [(0, 8), (3, 21)]
    gests = {(r["a"], r["b"], r["q"]): r["est"]
             for r in global_range_quantile_estimates(gidx, grqs, qs, deepest).collect()}
    for a, b in grqs:
        sl = np.sort(stream[a * span : b * span].astype(np.float64))
        for q in qs:
            est = gests[(a, b, q)]
            lo = np.searchsorted(sl, est, side="left") / len(sl)
            hi = np.searchsorted(sl, est, side="right") / len(sl)
            assert lo - 0.06 <= q <= hi + 0.06
    gidx.unpersist()


# ---------------------------------------------------------------------------
# GLOBAL-axis window sketches: stream windows cross doc boundaries; leaf
# sketches are byte-exact vs the concatenated stream, range queries follow
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def built_global(spark):
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_cms_window_index,
        build_global_hll_window_index,
    )

    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=12)).cache()
    stream = np.concatenate([
        np.asarray(r["tokens"], dtype=np.int64)
        for r in corp.orderBy("doc_id").collect()
    ])
    cms_idx = build_global_cms_window_index(corp, CFG, depth=3, width=256)
    hll_idx = build_global_hll_window_index(corp, CFG, p=12)
    yield stream, cms_idx, hll_idx
    cms_idx.unpersist()
    hll_idx.unpersist()
    corp.unpersist()


def test_global_window_sketches_byte_exact_vs_stream(spark, built_global):
    """Every (level, w_id) sketch equals the object-path sketch of that
    STREAM slice — doc boundaries fully invisible (CMS byte-equal incl.
    exact totals; HLL register-equal)."""
    from hierarchical_bloom_filter_index_spark.sketches import (
        CountMinSketch,
        HyperLogLog,
        from_bytes,
    )

    from hierarchical_bloom_filter_index_spark.sketches import cms as cms_k

    stream, cms_idx, hll_idx = built_global
    for L in (CFG.deepest, 1, 0):
        span = CFG.span(L)
        for r in cms_idx.filter(F.col("level") == L).limit(12).collect():
            sl = stream[r["w_id"] * span : (r["w_id"] + 1) * span]
            ref = CountMinSketch(3, 256, CFG.seed + 11)
            ref.update(sl)
            blob = bytes(r["sketch"])
            assert cms_k.densify_blob(blob) == ref.to_bytes()
            assert (blob[0] == cms_k._MAGIC_CMS_SP) == \
                (len(np.unique(sl)) <= cms_k.sparse_max_nnz(3, 256))
        for r in hll_idx.filter(F.col("level") == L).limit(12).collect():
            sl = stream[r["w_id"] * span : (r["w_id"] + 1) * span]
            ref = HyperLogLog(p=12, seed=CFG.seed + 7)
            ref.update(sl)
            assert np.array_equal(from_bytes(bytes(r["sketch"])).regs, ref.regs)


def test_global_range_queries(spark, built_global):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_distinct_estimates,
        global_range_totals,
    )

    stream, cms_idx, hll_idx = built_global
    span = CFG.leaf_span
    n_leaves = (len(stream) + span - 1) // span
    rqs = [(0, 5), (3, 97), (n_leaves - 2, n_leaves + 4), (7, 8)]
    tots = {(r["a"], r["b"]): r["n_tokens"]
            for r in global_range_totals(cms_idx, rqs, CFG.deepest).collect()}
    dists = {(r["a"], r["b"]): r["est_distinct"]
             for r in global_range_distinct_estimates(hll_idx, rqs, CFG.deepest).collect()}
    for a, b in rqs:
        sl = stream[a * span : b * span]
        assert tots[(a, b)] == len(sl)
        exact_d = len(np.unique(sl))
        assert abs(dists[(a, b)] - exact_d) / max(exact_d, 1) <= 5 * 1.04 / np.sqrt(2**12)


def test_global_window_append_equals_rebuild(spark):
    """Incremental stream append (boundary re-merge + suffix ancestor
    recompute) is byte-equal to a from-scratch build of the whole stream,
    for both sketch families, with the boundary mid-window."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        append_global_cms_window_index,
        append_global_hll_window_index,
        build_global_cms_window_index,
        build_global_hll_window_index,
    )

    corp = with_global_offsets(C.generate_corpus(spark, sf=0.001, seed=21)).cache()
    docs = [r["doc_id"] for r in corp.select("doc_id").orderBy("doc_id").collect()]
    cut = docs[len(docs) // 2]
    old = corp.filter(F.col("doc_id") <= cut)
    # keep the carried (already-global) doc_offset: append must IGNORE
    # it and recompute from n_so_far (double-shift regression)
    new = corp.filter(F.col("doc_id") > cut)
    n_so_far = old.agg(F.sum("n_tok")).first()[0]
    assert n_so_far % CFG.leaf_span != 0  # boundary mid-window, the hard case

    def rows(df):
        return sorted((r["level"], r["w_id"], bytes(r["sketch"])) for r in df.collect())

    for build, append, kw in (
        (build_global_cms_window_index, append_global_cms_window_index, dict(depth=3, width=256)),
        (build_global_hll_window_index, append_global_hll_window_index, dict(p=10)),
    ):
        old_idx = build(old, CFG, **kw)
        appended = append(old_idx, new, CFG, int(n_so_far), **kw)
        full = build(corp, CFG, **kw)
        assert rows(appended) == rows(full) and len(rows(full)) > 0
        for df in (old_idx, appended, full):
            df.unpersist()
    corp.unpersist()


def test_global_range_freq_bounded(spark, built_global):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_freq_estimates,
    )

    stream, cms_idx, _hll_idx = built_global
    span = CFG.leaf_span
    rqs = [(0, 6), (2, 40), (11, 12)]
    probes = [1, 2, 3]
    eps = np.e / 256
    got = {(r["a"], r["b"], r["token"]): r["est_count"]
           for r in global_range_freq_estimates(cms_idx, rqs, probes, CFG.deepest).collect()}
    for a, b in rqs:
        sl = stream[a * span : b * span]
        for t in probes:
            exact = int((sl == t).sum())
            est = got[(a, b, t)]
            assert est >= exact
            assert est - exact <= eps * len(sl) * 3


def test_duplicate_ranges_do_not_double_count(spark, built_cms):
    """A repeated range must answer identically to a single occurrence —
    duplicated cover nodes would fold into one group and double CMS sums."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_token_totals,
    )

    corp, idx = built_cms
    d = corp.select("doc_id").orderBy("doc_id").first()["doc_id"]
    once = {(r["doc_id"], r["a"], r["b"]): r["n_tokens"]
            for r in range_token_totals(idx, [(d, 0, 4)], CFG.deepest).collect()}
    twice = {(r["doc_id"], r["a"], r["b"]): r["n_tokens"]
             for r in range_token_totals(idx, [(d, 0, 4), (d, 0, 4)], CFG.deepest).collect()}
    assert once == twice and len(once) == 1


def test_expire_window_index_horizon(spark, built_global):
    """Eviction keeps exactly the windows overlapping the horizon at every
    level, and surviving sketches are untouched (byte-equal)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        expire_window_index,
    )

    stream, cms_idx, _hll = built_global
    horizon = 24
    kept = expire_window_index(cms_idx, CFG, horizon)
    before = {(r["level"], r["w_id"]): bytes(r["sketch"]) for r in cms_idx.collect()}
    after = {(r["level"], r["w_id"]): bytes(r["sketch"]) for r in kept.collect()}
    assert 0 < len(after) < len(before)
    for (L, w), blob in before.items():
        expected_kept = w >= (horizon >> (CFG.deepest - L))
        assert ((L, w) in after) == expected_kept
        if expected_kept:
            assert after[(L, w)] == blob


def test_append_window_sketch_index_doc_axis(spark):
    """Doc-axis sketch append == full rebuild, byte for byte (per-doc trees
    are independent: append is a pure union, zero shuffles)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        append_window_sketch_index,
        build_cms_window_index,
    )

    full = C.generate_corpus(spark, sf=0.002, seed=31).cache()
    ids = sorted(r["doc_id"] for r in full.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    old = build_cms_window_index(full.filter(F.col("doc_id") < mid), CFG)
    appended = append_window_sketch_index(
        old, full.filter(F.col("doc_id") >= mid), CFG, family="cms"
    )
    rebuilt = build_cms_window_index(full, CFG)
    key = lambda df: sorted(
        (r["doc_id"], r["level"], r["w_id"], bytes(r["sketch"])) for r in df.collect()
    )
    assert key(appended) == key(rebuilt)
    import pytest as _pt
    with _pt.raises(ValueError, match="family"):
        append_window_sketch_index(old, full, CFG, family="nope")
    for df in (old, rebuilt):
        df.unpersist()
    full.unpersist()


def test_window_sketch_segmented_expire_roundtrip(spark, tmp_path):
    """The GLOBAL window-sketch index persists through the same segmented
    (level, w_seg) layout as the Bloom index: metadata-only segment drops,
    read-back rows byte-equal to expire_window_index over the live table —
    the full lifecycle (build / append / stream / EXPIRE+PERSIST) now holds
    for the sketch family too."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_cms_window_index,
        expire_window_index,
    )
    from hierarchical_bloom_filter_index_spark.sources.io import (
        expire_segments,
        read_index_expired,
        write_index_segmented,
    )

    cfg = CFG.with_(axis="global")
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=19))
    idx = build_global_cms_window_index(corp, cfg)
    path = str(tmp_path / "gsketch_seg")
    write_index_segmented(idx, path, seg_bits=2)
    horizon = int(idx.filter(F.col("level") == cfg.deepest).count() // 2)
    dropped = expire_segments(spark, path, cfg, horizon, seg_bits=2)
    assert dropped > 0

    def rows(df):
        return sorted((r["level"], r["w_id"], bytes(r["sketch"]))
                      for r in df.select("level", "w_id", "sketch").collect())

    assert rows(read_index_expired(spark, path, cfg, horizon)) == \
        rows(expire_window_index(idx, cfg, horizon))
    idx.unpersist()


# ---------------------------------------------------------------------------
# pair-of-ranges SET ALGEBRA (hll family): |A|, |B|, |A∪B|, |A∩B| between two
# leaf-window ranges — exact in the sparse-node regime, HLL envelopes dense
# ---------------------------------------------------------------------------
def _brute_setops(sa, sb):
    A, B = set(sa.tolist()), set(sb.tolist())
    return (float(len(A)), float(len(B)), float(len(A | B)), float(len(A & B)))


def test_range_setops_sparse_exact_and_missing_side(spark, built):
    """Every (doc, pair) answer is EXACT while all merged nodes stay sparse
    (ranges of <= 8 leaf windows hold <= 256 tokens << sparse_max_nnz(12));
    a pair whose side B lies beyond every doc still yields a row with B the
    empty set; a (doc, pair) with NEITHER side overlapping yields no row."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import range_setops

    corp, idx = built
    pairs = [((0, 4), (4, 8)), ((0, 3), (1, 6)), ((0, 2), (100000, 100004))]
    got = {(r["doc_id"], r["a1"], r["b1"], r["a2"], r["b2"]):
           (r["est_a"], r["est_b"], r["est_union"], r["est_intersect"])
           for r in range_setops(idx, pairs, CFG.deepest).collect()}
    span = CFG.leaf_span
    n_checked = n_missing = 0
    for r in corp.select("doc_id", "tokens").collect():
        toks = r["tokens"]
        for (a1, b1), (a2, b2) in pairs:
            key = (r["doc_id"], a1, b1, a2, b2)
            sa = np.asarray(toks[a1 * span: b1 * span], dtype=np.int64)
            sb = np.asarray(toks[a2 * span: b2 * span], dtype=np.int64)
            if len(sa) == 0 and len(sb) == 0:
                assert key not in got
                continue
            assert got[key] == _brute_setops(sa, sb), key
            n_checked += 1
            n_missing += int(len(sb) == 0)
    assert n_checked > 0 and n_missing > 0
    assert len(got) == n_checked


def test_range_setops_dense_envelope(spark, built):
    """p=6 forces the dense regime (sparse_max_nnz = 8): |A|, |B|, |A∪B|
    within the HLL relative envelope, |A∩B| within the inclusion-exclusion
    ADDITIVE envelope (scales with the union, not the intersection)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_hll_window_index,
        range_setops,
    )

    corp, _ = built
    idx6 = build_hll_window_index(corp, CFG, p=6)
    pairs = [((0, 8), (4, 12)), ((0, 16), (16, 32))]
    got = {(r["doc_id"], r["a1"], r["b1"], r["a2"], r["b2"]):
           (r["est_a"], r["est_b"], r["est_union"], r["est_intersect"])
           for r in range_setops(idx6, pairs, CFG.deepest).collect()}
    span = CFG.leaf_span
    rel = 5 * 1.04 / np.sqrt(64)
    n_dense = 0
    for r in corp.select("doc_id", "tokens").collect():
        toks = r["tokens"]
        for (a1, b1), (a2, b2) in pairs:
            key = (r["doc_id"], a1, b1, a2, b2)
            if key not in got:
                continue
            sa = np.asarray(toks[a1 * span: b1 * span], dtype=np.int64)
            sb = np.asarray(toks[a2 * span: b2 * span], dtype=np.int64)
            ta, tb, tu, ti = _brute_setops(sa, sb)
            ea, eb, eu, ei = got[key]
            for est, true in ((ea, ta), (eb, tb), (eu, tu)):
                assert abs(est - true) <= rel * max(true, 1.0), key
            assert abs(ei - ti) <= 3 * rel * max(tu, 1.0), key
            n_dense += int(max(ta, tb) > 8)
    assert n_dense > 0  # the dense regime is actually exercised
    idx6.unpersist()


def test_global_range_setops_vs_brute_force(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_hll_window_index,
        global_range_setops,
    )

    corp, _ = built
    gcorp = C.with_global_offsets(corp)
    gidx = build_global_hll_window_index(gcorp, CFG, p=12)
    try:
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        pairs = [((0, 6), (3, 9)), ((1, 2), (1, 2)), ((0, 4), (100000, 100004))]
        span = CFG.leaf_span
        got = {(r["a1"], r["b1"], r["a2"], r["b2"]):
               (r["est_a"], r["est_b"], r["est_union"], r["est_intersect"])
               for r in global_range_setops(gidx, pairs, CFG.deepest).collect()}
        assert len(got) == len(pairs)
        for (a1, b1), (a2, b2) in pairs:
            sa = np.asarray(stream[a1 * span: b1 * span], dtype=np.int64)
            sb = np.asarray(stream[a2 * span: b2 * span], dtype=np.int64)
            assert got[(a1, b1, a2, b2)] == _brute_setops(sa, sb)
        # identical ranges: intersection == union == each side
        ea, eb, eu, ei = got[(1, 2, 1, 2)]
        assert ea == eb == eu == ei > 0
        # missing side: B empty, union == A, intersection 0
        ea, eb, eu, ei = got[(0, 4, 100000, 100004)]
        assert (eb, ei) == (0.0, 0.0) and eu == ea > 0
    finally:
        gidx.unpersist()


# ---------------------------------------------------------------------------
# CERTIFIED EXACT range quantiles / trimmed sums: KLL brackets, exact pass
# decides, sentinel landing refuses — never a silently wrong order statistic
# ---------------------------------------------------------------------------


def test_range_exact_quantiles_both_axes(spark, built_kll):
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_kll_window_index,
        global_range_exact_quantiles,
        global_range_trimmed_sum,
        range_exact_quantiles,
        range_trimmed_sum,
    )

    corp, idx = built_kll
    span, deepest = CFG.leaf_span, CFG.deepest
    qs = [0.1, 0.5, 0.9]
    rqs = [(0, 4), (1, 7)]
    docs = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64)
            for r in corp.collect()}
    res = {(r["doc_id"], r["a"], r["b"], r["q"]): r["q_value"]
           for r in range_exact_quantiles(
               idx, corp, rqs, qs, span, deepest).collect()}
    ts = {(r["doc_id"], r["a"], r["b"]): (r["trimmed_sum"], r["n_kept"])
          for r in range_trimmed_sum(
              idx, corp, rqs, 0.1, 0.9, span, deepest).collect()}
    checked = 0
    for d, toks in docs.items():
        for a, b in rqs:
            sl = np.sort(toks[a * span : b * span])
            n = len(sl)
            if n == 0:
                assert all((d, a, b, q) not in res for q in qs)
                continue
            for q in qs:
                r_ = max(1, int(np.ceil(q * n)))
                assert res[(d, a, b, q)] == sl[r_ - 1]  # EXACT, not bounded
                checked += 1
            r1, r2 = int(np.floor(0.1 * n)) + 1, int(np.floor(0.9 * n))
            if r2 >= r1:
                assert ts[(d, a, b)] == (int(sl[r1 - 1 : r2].sum()), r2 - r1 + 1)
            else:
                assert (d, a, b) not in ts
    assert checked >= 30

    gcorp = with_global_offsets(corp)
    gidx = build_global_kll_window_index(gcorp, CFG, k=200)
    stream = np.concatenate(
        [docs[d] for d in sorted(docs)])
    grqs = [(0, 8), (3, 21)]
    gres = {(r["a"], r["b"], r["q"]): r["q_value"]
            for r in global_range_exact_quantiles(
                gidx, gcorp, grqs, qs, span, deepest).collect()}
    gts = {(r["a"], r["b"]): (r["trimmed_sum"], r["n_kept"])
           for r in global_range_trimmed_sum(
               gidx, gcorp, grqs, 0.1, 0.9, span, deepest).collect()}
    for a, b in grqs:
        sl = np.sort(stream[a * span : b * span])
        n = len(sl)
        for q in qs:
            r_ = max(1, int(np.ceil(q * n)))
            assert gres[(a, b, q)] == sl[r_ - 1]
        r1, r2 = int(np.floor(0.1 * n)) + 1, int(np.floor(0.9 * n))
        assert gts[(a, b)] == (int(sl[r1 - 1 : r2].sum()), r2 - r1 + 1)
    gidx.unpersist()


def test_exact_quantile_bracket_miss_refuses(spark, built_kll):
    """A bracket that provably excludes the true rank must raise IN the plan
    (sentinel landing), for both the quantile and the trimmed-sum readouts —
    never return a silently wrong value."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        _doc_range_slices,
        _exact_quantile_verify,
        _trimmed_sum_verify,
    )

    corp, _idx = built_kll
    span, rqs = CFG.leaf_span, [(0, 4)]
    sliced = _doc_range_slices(corp, rqs, span)
    one_doc = corp.select("doc_id").first()["doc_id"]
    # bracket entirely BELOW every token (tokens are printable codepoints):
    # the rank read lands on the above-bracket sentinel
    bad = spark.createDataFrame(
        [(one_doc, 0, 4, 0.5, -10, -5)],
        "doc_id string, a long, b long, q double, lo long, hi long",
    )
    with pytest.raises(SparkRuntimeException, match="bracket missed"):
        _exact_quantile_verify(bad, sliced, ("doc_id", "a", "b")).collect()
    bad2 = spark.createDataFrame(
        [(one_doc, 0, 4, -10, -5)], "doc_id string, a long, b long, lo long, hi long"
    )
    with pytest.raises(SparkRuntimeException, match="bracket missed"):
        _trimmed_sum_verify(bad2, sliced, ("doc_id", "a", "b"), 0.25, 0.75).collect()


# ---------------------------------------------------------------------------
# Global window-sketch CONTENT TAKEDOWN (linear subtraction, no rebuild)
# ---------------------------------------------------------------------------


def test_global_cms_takedown_parity_both_regimes(spark):
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_cms_window_index,
        takedown_global_window_sketch_index,
        window_sketch_family,
        _global_window_sketch_plan,
    )
    from hierarchical_bloom_filter_index_spark.sketches import cms as cmsk

    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=12)).cache()
    removed = corp.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0)
    survivors = corp.join(removed.select("doc_id"), "doc_id", "left_anti")
    assert 0 < removed.count() < corp.count()

    def node_map(df):
        return {(r["level"], r["w_id"]): bytes(r["sketch"]) for r in df.collect()}

    # SPARSE regime (default width 256: every ASCII node sparse) — takedown
    # must be BYTE-EQUAL to a scratch build over survivors at original offsets
    idx = build_global_cms_window_index(corp, CFG)
    after = node_map(takedown_global_window_sketch_index(idx, removed, CFG, "cms"))
    scratch = node_map(build_global_cms_window_index(survivors, CFG))
    assert after == scratch  # keysets AND bytes (emptied nodes dropped)
    idx.unpersist()

    # DENSE regime (width 16: max_nnz 24 < leaf distinct) — dense nodes stay
    # dense; parity is byte-equality against densify(scratch) per node
    sb, mg, _b = window_sketch_family(CFG, "cms", depth=3, width=16)
    idx16 = _global_window_sketch_plan(corp, CFG, sb, mg)
    after16 = node_map(takedown_global_window_sketch_index(
        idx16, removed, CFG, "cms", depth=3, width=16))
    scratch16 = node_map(_global_window_sketch_plan(survivors, CFG, sb, mg))
    assert set(after16) == set(scratch16)
    n_dense_kept = 0
    for k, sv in scratch16.items():
        got = after16[k]
        if got == sv:
            continue
        assert got == cmsk.densify_blob(sv), k  # content-equal, denser form
        n_dense_kept += 1
    assert n_dense_kept > 0  # the regime was actually exercised

    # cs (signed) twin rides the same kernel with sign-aware subtraction
    sbc, mgc, _bc = window_sketch_family(CFG, "cs", depth=3, width=256)
    idx_cs = _global_window_sketch_plan(corp, CFG, sbc, mgc)
    after_cs = node_map(takedown_global_window_sketch_index(
        idx_cs, removed, CFG, "cs", depth=3, width=256))
    scratch_cs = node_map(_global_window_sketch_plan(survivors, CFG, sbc, mgc))
    assert after_cs == scratch_cs

    # refusals: non-linear family, missing build-time offsets, over-removal
    idx2 = build_global_cms_window_index(corp, CFG)
    with pytest.raises(ValueError, match="LINEAR"):
        takedown_global_window_sketch_index(idx2, removed, CFG, "hll")
    with pytest.raises(ValueError, match="doc_offset"):
        takedown_global_window_sketch_index(idx2, removed.drop("doc_offset"), CFG)
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from py4j.protocol import Py4JJavaError
    doubled = removed.union(removed)  # removes content twice: must blow up
    with pytest.raises((SparkRuntimeException, Py4JJavaError, Exception)):
        takedown_global_window_sketch_index(idx2, doubled, CFG, "cms").collect()
    idx2.unpersist()
