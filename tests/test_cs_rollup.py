"""Signed count-sketch (AMS) window family: kernel laws (densify parity with
the CountSketch object path, order-free content-pure merges, sparse-exact
estimates), the published error bounds through dense nodes, and the dyadic
range F2 / unbiased-frequency queries on both axes vs brute force."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators.rollup import (
    build_cs_window_index,
    build_global_cs_window_index,
    cs_window_totals,
    global_range_f2_estimates,
    range_f2_estimates,
    range_signed_freq_estimates,
    window_sketch_family,
)
from hierarchical_bloom_filter_index_spark.sketches import cms as k

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=12)
SEED = CFG.seed + 23  # the family's seed offset (window_sketch_family "cs")
D, W = 3, 256


def _exact_counts(tokens):
    u, c = np.unique(np.asarray(tokens, dtype=np.int64), return_counts=True)
    return dict(zip(u.tolist(), c.tolist()))


def _exact_f2(tokens):
    _, c = np.unique(np.asarray(tokens, dtype=np.int64), return_counts=True)
    return float(np.square(c.astype(np.float64)).sum())


def _scratch_dense(tokens, depth=D, width=W, seed=SEED) -> bytes:
    ref = k.CountSketch(depth, width, seed)
    ref.update(np.asarray(tokens, dtype=np.int64))
    return ref.to_bytes()


# ---------------------------------------------------------------------------
# kernel laws
# ---------------------------------------------------------------------------
def test_leaf_blobs_densify_to_object_path():
    """Every leaf node, sparse or dense, densifies to the byte-exact
    CountSketch.update state of its window — the wire-parity invariant all
    build paths hang off."""
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 50_000, 4 * 32).astype(np.int64)
    blobs = k.cs_leaf_window_blobs(toks, 32, D, W, SEED)
    assert len(blobs) == 4
    for i, b in enumerate(blobs):
        assert b[0] == 14  # small windows stay sparse under default params
        assert k.densify_blob(b) == _scratch_dense(toks[i * 32 : (i + 1) * 32])
    # tiny width forces dense leaves: bytes equal the object path DIRECTLY
    dense = k.cs_leaf_window_blobs(toks, 32, 2, 8, SEED)
    for i, b in enumerate(dense):
        assert b[0] == k.CountSketch.MAGIC
        ref = k.CountSketch(2, 8, SEED)
        ref.update(toks[i * 32 : (i + 1) * 32])
        assert b == ref.to_bytes()


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_merge_content_pure_and_estimates_exact_when_sparse(data):
    """A group merge densifies to the from-scratch CountSketch of the
    group's concatenated tokens (content purity across sparse/dense mixes),
    shuffled child order gives identical bytes, and sparse outputs answer
    frequency AND F2 exactly."""
    n = data.draw(st.integers(min_value=8, max_value=300))
    vocab = data.draw(st.sampled_from([4, 30, 100_000]))
    toks = np.asarray(
        data.draw(st.lists(st.integers(0, vocab), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    window = data.draw(st.sampled_from([8, 32]))
    depth, width = data.draw(st.sampled_from([(3, 8), (3, 64)]))
    blobs = k.cs_leaf_window_blobs(toks, window, depth, width, SEED)
    nw = len(blobs)
    counts = []
    i = 0
    while i < nw:
        g = data.draw(st.integers(1, min(4, nw - i)))
        counts.append(g)
        i += g
    counts = np.asarray(counts, dtype=np.int64)
    merged = k.cs_merge_blob_groups(blobs, counts, depth, width, SEED)
    i = 0
    for g, c in enumerate(counts):
        seg = toks[i * window : (i + c) * window]
        assert k.densify_blob(merged[g]) == _scratch_dense(seg, depth, width)
        if c >= 2:
            perm = data.draw(st.permutations(list(range(c))))
            again = k.cs_merge_blob_groups(
                [blobs[i + j] for j in perm], np.array([c]), depth, width, SEED)[0]
            assert again == merged[g]
        if merged[g][0] == 14:  # sparse: exact answers
            want = _exact_counts(seg)
            probes = np.asarray(sorted(want) + [10**9], dtype=np.int64)
            got = k.cs_estimate_blobs([merged[g]], probes, depth, width, SEED)[0]
            assert got.tolist() == [want[t] for t in sorted(want)] + [0]
            assert k.f2_blobs([merged[g]])[0] == _exact_f2(seg)
        i += c


def test_dense_estimator_bounds():
    """Dense-path contracts on a zipf stream: the count-sketch frequency
    estimate is within 3*sqrt(F2/width) (Charikar) for >= 90% of probes,
    and the AMS F2 estimate is within 25% (width 2048, depth 7 — per-row
    Var <= 2*F2^2/width, median concentrates)."""
    rng = np.random.default_rng(5)
    toks = rng.zipf(1.3, 200_000).astype(np.int64)
    depth, width = 7, 2048
    blobs = k.cs_partial_blobs_by_slot(
        toks, np.zeros(len(toks), dtype=np.int64), 1, depth, width, SEED)
    assert blobs[0][0] == k.CountSketch.MAGIC  # genuinely dense
    want = _exact_counts(toks)
    f2 = _exact_f2(toks)
    probes = np.asarray(sorted(want)[:500], dtype=np.int64)
    est = k.cs_estimate_blobs([blobs[0]], probes, depth, width, SEED)[0]
    err = np.abs(est - np.asarray([want[t] for t in probes.tolist()]))
    assert (err <= 3.0 * np.sqrt(f2 / width)).mean() >= 0.90
    est_f2 = k.f2_blobs([blobs[0]])[0]
    assert abs(est_f2 - f2) <= 0.25 * f2
    # object-path F2 agrees with the blob kernel
    obj = k.CountSketch.from_bytes(bytes(blobs[0]))
    assert obj.f2() == est_f2


def test_family_wiring_and_refusals():
    with pytest.raises(ValueError, match="unknown cs"):
        window_sketch_family(CFG, "cs", nope=3)
    toks = np.arange(64, dtype=np.int64)
    b = k.cs_leaf_window_blobs(toks, 32, D, W, SEED)
    with pytest.raises(ValueError, match="magic"):
        k.f2_blobs([b"\x00garbage"])
    with pytest.raises(ValueError, match="magic"):
        # CMS nodes must not slip into the signed estimator path
        cms_b = k.leaf_window_blobs(toks, 32, D, W, SEED)
        k.f2_blobs([k.densify_blob(cms_b[0])])
    # CMS dense bytes are untouched by the refactor (regression guard)
    dense_cms = k.leaf_window_blobs(np.arange(500, dtype=np.int64), 500, 2, 8, SEED)
    ref = k.CountMinSketch(2, 8, SEED)
    ref.update(np.arange(500, dtype=np.int64))
    assert dense_cms[0] == ref.to_bytes()
    assert len(b) == 2


# ---------------------------------------------------------------------------
# Spark: dyadic builds + range F2 / unbiased freq vs brute force, both axes
# ---------------------------------------------------------------------------
RANGES = [(1, 9), (0, 3), (2, 4)]


@pytest.fixture(scope="module")
def built(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()
    idx = build_cs_window_index(corp, CFG, depth=D, width=W)
    yield corp, idx
    idx.unpersist()
    corp.unpersist()


def test_every_node_densifies_to_scratch_object_path(spark, built):
    corp, idx = built
    docs = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64)
            for r in corp.collect()}
    rows = idx.collect()
    assert rows
    for r in rows:
        span = CFG.span(r["level"])
        sl = docs[r["doc_id"]][r["w_id"] * span : (r["w_id"] + 1) * span]
        assert k.densify_blob(bytes(r["sketch"])) == _scratch_dense(sl)


def test_totals_exact(spark, built):
    corp, idx = built
    tot = {}
    for r in cs_window_totals(idx).collect():
        if r["level"] == CFG.deepest:
            tot[r["doc_id"]] = tot.get(r["doc_id"], 0) + r["n_window"]
    for r in corp.select("doc_id", F.size("tokens").alias("n")).collect():
        assert tot[r["doc_id"]] == r["n"]


def test_range_f2_and_freq_exact_vs_brute_force(spark, built):
    """This corpus's windows stay sparse (vocab 4096 < sparse_max per
    range), so both range answers are EXACT — the zero-error end of the
    estimate contract."""
    corp, idx = built
    got_f2 = {(r["doc_id"], r["a"], r["b"]): r["est_f2"]
              for r in range_f2_estimates(idx, RANGES, CFG.deepest).collect()}
    span = CFG.leaf_span
    probes = [32, 101, 113]
    got_fr = {(r["doc_id"], r["a"], r["b"], r["token"]): r["est_count"]
              for r in range_signed_freq_estimates(
                  idx, RANGES, probes, CFG.deepest).collect()}
    n_checked = 0
    for r in corp.select("doc_id", "tokens").collect():
        for a, b in RANGES:
            sl = r["tokens"][a * span : b * span]
            key = (r["doc_id"], a, b)
            if key not in got_f2:
                assert len(sl) == 0
                continue
            assert got_f2[key] == _exact_f2(sl)
            cnts = _exact_counts(sl)
            for t in probes:
                assert got_fr[key + (t,)] == cnts.get(t, 0)
            n_checked += 1
    assert n_checked > 0


def test_global_build_and_range_f2(spark, built):
    corp, _ = built
    gcorp = C.with_global_offsets(corp)
    gcfg = CFG.with_(axis="global")
    gidx = build_global_cs_window_index(gcorp, gcfg, depth=D, width=W)
    try:
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        ranges = [(0, 6), (3, 97), (1, 2)]
        span = CFG.leaf_span
        got = {(r["a"], r["b"]): r["est_f2"]
               for r in global_range_f2_estimates(gidx, ranges, CFG.deepest).collect()}
        for a, b in ranges:
            assert got[(a, b)] == _exact_f2(stream[a * span : b * span])
        # global build byte-equal to a single concatenated doc's build
        one = spark.createDataFrame(
            [("all", [int(t) for t in stream], 0)],
            "doc_id string, tokens array<int>, doc_offset long")
        gidx_one = build_global_cs_window_index(one, gcfg, depth=D, width=W)
        try:
            a_ = {(r["level"], r["w_id"]): bytes(r["sketch"]) for r in gidx.collect()}
            b_ = {(r["level"], r["w_id"]): bytes(r["sketch"]) for r in gidx_one.collect()}
            assert a_ == b_
        finally:
            gidx_one.unpersist()
    finally:
        gidx.unpersist()


def test_doc_axis_append_is_pure_union(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        append_window_sketch_index,
    )

    corp, _ = built
    ids = sorted(r["doc_id"] for r in corp.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    old = build_cs_window_index(corp.filter(F.col("doc_id") < mid), CFG)
    appended = append_window_sketch_index(
        old, corp.filter(F.col("doc_id") >= mid), CFG, family="cs")
    scratch = build_cs_window_index(corp, CFG)
    try:
        a = {tuple(r[:3]): bytes(r[3]) for r in appended.collect()}
        s = {tuple(r[:3]): bytes(r[3]) for r in scratch.collect()}
        assert a == s
    finally:
        old.unpersist()
        appended.unpersist()
        scratch.unpersist()


def test_even_depth_blob_estimates_match_object_path():
    """Review regression: even depths give HALF-INTEGER medians — the blob
    estimator must preserve them exactly like CountSketch.estimate (an
    earlier version truncated toward zero, biasing the unbiased
    estimator)."""
    rng = np.random.default_rng(9)
    toks = rng.zipf(1.3, 50_000).astype(np.int64)
    depth, width = 4, 64  # even depth, dense regime
    blobs = k.cs_partial_blobs_by_slot(
        toks, np.zeros(len(toks), dtype=np.int64), 1, depth, width, SEED)
    assert blobs[0][0] == k.CountSketch.MAGIC
    probes = np.unique(toks)[:200]
    got = k.cs_estimate_blobs([blobs[0]], probes, depth, width, SEED)[0]
    obj = k.CountSketch.from_bytes(bytes(blobs[0]))
    want = obj.estimate(probes)
    assert got.dtype == np.float64
    assert np.array_equal(got, want)
    assert (got != np.trunc(got)).any()  # half-integers actually occur


def test_registry_and_object_bridge_for_sparse_cs_nodes():
    """Review regression: sparse cs nodes (magic 14) must deserialize
    through the generic registry into a CountSketch byte-equal to the
    densified path; zero-count merge groups are refused loudly."""
    from hierarchical_bloom_filter_index_spark import sketches as S

    toks = np.arange(40, dtype=np.int64)
    b = k.cs_leaf_window_blobs(toks, 32, D, W, SEED)[0]
    assert b[0] == 14
    obj = S.from_bytes(bytes(b))
    assert isinstance(obj, k.CountSketch)
    assert obj.to_bytes() == k.densify_blob(bytes(b))
    # CMS sparse nodes keep round-tripping identically via densify
    cb = k.leaf_window_blobs(toks, 32, D, W, SEED)[0]
    assert S.from_bytes(bytes(cb)).to_bytes() == k.densify_blob(bytes(cb))
    with pytest.raises(ValueError, match="positive"):
        k.cs_merge_blob_groups([b, b], np.array([0, 2]), D, W, SEED)
    with pytest.raises(ValueError, match="params"):
        other = k.cs_leaf_window_blobs(toks, 32, D, W, SEED + 1)[0]
        k.cs_merge_blob_groups([b, other], np.array([2]), D, W, SEED)


# ---------------------------------------------------------------------------
# cross-range inner product (pair-of-ranges family)
# ---------------------------------------------------------------------------
def test_inner_product_kernel_laws():
    """sparse x sparse is the EXACT dot over common tokens; dense pairs run
    the AMS sketch-dot estimator (unbiased, deviation O(sqrt(F2a*F2b/w)));
    mismatched params are refused."""
    rng = np.random.default_rng(7)
    A = rng.integers(0, 60, 50).astype(np.int64)
    B = rng.integers(30, 90, 70).astype(np.int64)
    ba = k.cs_leaf_window_blobs(A, 128, D, W, SEED)[0]
    bb = k.cs_leaf_window_blobs(B, 128, D, W, SEED)[0]
    fa, fb = np.bincount(A, minlength=100), np.bincount(B, minlength=100)
    assert k.cs_inner_product_blobs([ba], [bb])[0] == float((fa * fb).sum())
    # disjoint supports -> exactly zero
    bc = k.cs_leaf_window_blobs(np.arange(200, 240, dtype=np.int64), 64, D, W, SEED)[0]
    assert k.cs_inner_product_blobs([ba], [bc])[0] == 0.0
    # dense regime: within the AMS deviation bound
    d2, w2 = 5, 64
    A2 = rng.integers(0, 2000, 20_000).astype(np.int64)
    B2 = rng.integers(500, 2500, 20_000).astype(np.int64)
    ba2 = k.cs_leaf_window_blobs(A2, 1 << 20, d2, w2, SEED)[0]
    bb2 = k.cs_leaf_window_blobs(B2, 1 << 20, d2, w2, SEED)[0]
    assert ba2[0] == k.CountSketch.MAGIC and bb2[0] == k.CountSketch.MAGIC
    fa2 = np.bincount(A2, minlength=2500).astype(np.float64)
    fb2 = np.bincount(B2, minlength=2500).astype(np.float64)
    ip = float((fa2 * fb2).sum())
    got = k.cs_inner_product_blobs([ba2], [bb2])[0]
    sigma = np.sqrt(float((fa2 ** 2).sum()) * float((fb2 ** 2).sum()) / w2)
    assert abs(got - ip) <= 6 * sigma
    # mixed sparse x dense runs through densification
    small = k.cs_leaf_window_blobs(rng.integers(0, 10, 30).astype(np.int64),
                                   64, d2, w2, SEED)[0]
    assert small[0] == 14
    k.cs_inner_product_blobs([small], [ba2])
    with pytest.raises(ValueError, match="params"):
        k.cs_inner_product_blobs([ba], [ba2])
    with pytest.raises(ValueError, match="magic"):
        k.cs_inner_product_blobs([k.leaf_window_blobs(A, 128, D, W, SEED)[0]], [bb])


PAIRS = [((0, 4), (4, 8)), ((1, 9), (0, 3)), ((0, 2), (4096, 4100))]


def test_range_inner_product_exact_vs_brute_force(spark, built):
    """Sparse corpus => every pair answer is the exact <f_A, f_B>; a pair
    whose second range lies beyond every doc still yields rows (zero
    vector, est_ip 0)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_inner_product_estimates,
    )

    corp, idx = built
    got = {(r["doc_id"], r["a1"], r["b1"], r["a2"], r["b2"]): r["est_ip"]
           for r in range_inner_product_estimates(idx, PAIRS, CFG.deepest).collect()}
    span = CFG.leaf_span
    n_checked = n_zero_side = 0
    for r in corp.select("doc_id", "tokens").collect():
        toks = r["tokens"]
        for (a1, b1), (a2, b2) in PAIRS:
            key = (r["doc_id"], a1, b1, a2, b2)
            sa, sb = toks[a1 * span: b1 * span], toks[a2 * span: b2 * span]
            if len(sa) == 0 and len(sb) == 0:
                assert key not in got
                continue
            ca, cb = _exact_counts(sa), _exact_counts(sb)
            want = float(sum(c * cb.get(t, 0) for t, c in ca.items()))
            assert got[key] == want
            n_checked += 1
            if not sa or not sb:
                n_zero_side += 1
    assert n_checked > 0 and n_zero_side > 0
    assert len(got) == n_checked


def test_global_range_inner_product_exact(spark, built):
    """Global twin vs the concatenated stream, including an IDENTICAL pair
    (A == B, so est_ip == exact F2 — the side-tagged join must keep the
    shared cover nodes apart)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_inner_product_estimates,
    )

    corp, _ = built
    gcorp = C.with_global_offsets(corp)
    gidx = build_global_cs_window_index(gcorp, CFG.with_(axis="global"), depth=D, width=W)
    try:
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        pairs = [((0, 6), (3, 97)), ((1, 2), (1, 2)), ((0, 4), (100000, 100004))]
        span = CFG.leaf_span
        got = {(r["a1"], r["b1"], r["a2"], r["b2"]): r["est_ip"]
               for r in global_range_inner_product_estimates(
                   gidx, pairs, CFG.deepest).collect()}
        assert len(got) == len(pairs)
        for (a1, b1), (a2, b2) in pairs:
            ca = _exact_counts(stream[a1 * span: b1 * span])
            cb = _exact_counts(stream[a2 * span: b2 * span])
            want = float(sum(c * cb.get(t, 0) for t, c in ca.items()))
            assert got[(a1, b1, a2, b2)] == want
        assert got[(1, 2, 1, 2)] == _exact_f2(stream[span: 2 * span])
        assert got[(0, 4, 100000, 100004)] == 0.0
    finally:
        gidx.unpersist()
