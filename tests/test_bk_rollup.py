"""BottomK window-sketch family: kernel laws (byte-identity with the object
path, order-free merges, content-purity — a node is a pure function of its
window's distinct-token set) and the dyadic RANGE DISTINCT-SAMPLE queries,
both axes checked against brute force. Unlike CMS/HLL/KLL, every answer here
is an EXACT VALUE (bottom-k mergeability), not an estimate."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators.rollup import (
    build_bk_window_index,
    build_global_bk_window_index,
    global_range_distinct_sample,
    range_distinct_sample,
    window_sketch_family,
)
from hierarchical_bloom_filter_index_spark.sketches import samplers as bk
from hierarchical_bloom_filter_index_spark.sketches.hashing import hash64

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=12)
SEED = CFG.seed + 17  # the family's seed offset (window_sketch_family "bk")


def _brute_bottomk(tokens, k, seed=SEED) -> set:
    """Ground truth: the k distinct tokens with the smallest hash priority."""
    u = np.unique(np.asarray(tokens, dtype=np.int64))
    if len(u) == 0:
        return set()
    order = np.argsort(hash64(u, seed), kind="stable")
    return set(u[order][:k].tolist())


# ---------------------------------------------------------------------------
# kernel laws
# ---------------------------------------------------------------------------
def test_leaf_blobs_match_object_path():
    """A leaf node is the object path's one-update state byte for byte —
    both with k >= distinct (whole set kept) and k < distinct (truncated)."""
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 40, 130).astype(np.int64)
    for k in (64, 5):
        blobs = bk.leaf_window_blobs(toks, 32, k, SEED)
        assert len(blobs) == 5
        for i, b in enumerate(blobs):
            ref = bk.BottomKSampler(k, SEED)
            ref.update(toks[i * 32 : (i + 1) * 32])
            assert b == ref.to_bytes()
            assert set(bk.sample_blob_tokens([b])[0].tolist()) == _brute_bottomk(
                toks[i * 32 : (i + 1) * 32], k
            )


def test_slot_kernel_equals_phased_leaf_path():
    rng = np.random.default_rng(7)
    span = 16
    docs = [rng.integers(0, 1 << 12, n).astype(np.int64) for n in (1, 5, 33, 100)]
    offs = np.cumsum([0] + [len(d) for d in docs[:-1]])
    want = []
    for off, toks in zip(offs, docs):
        want.extend(bk.leaf_window_blobs(toks, span, 8, SEED, phase=int(off) % span))
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
    got = bk.partial_blobs_by_slot(cat, slots, int(npart.sum()), 8, SEED)
    assert got == want


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_merge_blob_groups_content_pure_and_exact(data):
    """Randomized differential: a group merge is BYTE-IDENTICAL to a
    from-scratch build over the group's concatenated tokens (the node is a
    pure function of the window's distinct set — the exactness claim behind
    the oracle), and a shuffled within-group child order gives identical
    bytes. The sampled set always equals brute-force bottom-k."""
    n = data.draw(st.integers(min_value=8, max_value=300))
    vocab = data.draw(st.sampled_from([4, 30, 1000]))
    toks = np.asarray(
        data.draw(st.lists(st.integers(0, vocab), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    window = data.draw(st.sampled_from([8, 32]))
    k = data.draw(st.sampled_from([3, 8, 33]))
    blobs = bk.leaf_window_blobs(toks, window, k, SEED)
    nw = len(blobs)
    counts = []
    i = 0
    while i < nw:
        g = data.draw(st.integers(1, min(4, nw - i)))
        counts.append(g)
        i += g
    counts = np.asarray(counts, dtype=np.int64)
    merged = bk.merge_blob_groups(blobs, counts, k, SEED)
    i = 0
    for g, c in enumerate(counts):
        seg = toks[i * window : (i + c) * window]
        scratch = bk.BottomKSampler(k, SEED)
        scratch.update(seg)
        assert merged[g] == scratch.to_bytes()
        assert set(bk.sample_blob_tokens([merged[g]])[0].tolist()) == _brute_bottomk(seg, k)
        if c >= 2:
            perm = data.draw(st.permutations(list(range(c))))
            again = bk.merge_blob_groups(
                [blobs[i + j] for j in perm], np.array([c]), k, SEED)[0]
            assert again == merged[g]
        # KMV estimate agrees with the object path's formula
        est = bk.estimate_distinct_blobs([merged[g]])[0]
        assert est == pytest.approx(
            bk.BottomKSampler.from_bytes(merged[g]).estimate_distinct())
        i += c


def test_family_wiring_and_refusals():
    toks = np.arange(64, dtype=np.int64)
    (b0, b1) = bk.leaf_window_blobs(toks, 32, 8, SEED)
    with pytest.raises(ValueError, match="unknown bk"):
        window_sketch_family(CFG, "bk", nope=3)
    with pytest.raises(ValueError, match="BottomK blob"):
        bk.merge_blob_groups([b0, b1], np.array([2]), 9, SEED)
    with pytest.raises(ValueError, match="BottomK blob"):
        bk.merge_blob_groups([b0, b1], np.array([2]), 8, SEED + 1)
    with pytest.raises(ValueError, match="magic"):
        bk.sample_blob_tokens([b"\x00garbage"])
    # empty-slot blobs round-trip and sample to nothing
    empties = bk.partial_blobs_by_slot(np.empty(0, np.int64), np.empty(0, np.int64),
                                       3, 8, SEED)
    assert len(empties) == 3
    assert all(len(t) == 0 for t in bk.sample_blob_tokens(empties))


# ---------------------------------------------------------------------------
# Spark: dyadic builds + range distinct-sample vs brute force, both axes
# ---------------------------------------------------------------------------
K = 16
RANGES = [(1, 9), (0, 3), (2, 4)]


@pytest.fixture(scope="module")
def built(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()
    idx = build_bk_window_index(corp, CFG, k=K)
    yield corp, idx
    idx.unpersist()
    corp.unpersist()


def test_every_node_equals_scratch_object_path(spark, built):
    corp, idx = built
    docs = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64)
            for r in corp.collect()}
    rows = idx.collect()
    assert rows
    for r in rows:
        span = CFG.span(r["level"])
        sl = docs[r["doc_id"]][r["w_id"] * span : (r["w_id"] + 1) * span]
        ref = bk.BottomKSampler(K, SEED)
        ref.update(sl)
        assert bytes(r["sketch"]) == ref.to_bytes()


def test_range_distinct_sample_exact_vs_brute_force(spark, built):
    corp, idx = built
    got = {(r["doc_id"], r["a"], r["b"], r["token"])
           for r in range_distinct_sample(idx, RANGES, CFG.deepest).collect()}
    span = CFG.leaf_span
    want = set()
    for r in corp.select("doc_id", "tokens").collect():
        for a, b in RANGES:
            sl = r["tokens"][a * span : b * span]
            for t in _brute_bottomk(sl, K):
                want.add((r["doc_id"], a, b, t))
    assert got == want and len(want) > 0


def test_global_range_distinct_sample_exact_vs_brute_force(spark, built):
    corp, _ = built
    gcorp = C.with_global_offsets(corp)
    gidx = build_global_bk_window_index(gcorp, CFG.with_(axis="global"), k=K)
    try:
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        span = CFG.leaf_span
        ranges = [(0, 6), (3, 97), (1, 2)]
        want = set()
        for a, b in ranges:
            for t in _brute_bottomk(stream[a * span : b * span], K):
                want.add((a, b, t))
        got = {(r["a"], r["b"], r["token"])
               for r in global_range_distinct_sample(gidx, ranges, CFG.deepest).collect()}
        assert got == want and len(want) > 0
        # global build is byte-exact vs a single-doc (concatenated) build
        one = spark.createDataFrame(
            [("all", [int(t) for t in stream], 0)],
            "doc_id string, tokens array<int>, doc_offset long")
        gidx_one = build_global_bk_window_index(one, CFG.with_(axis="global"), k=K)
        try:
            a = {(r["level"], r["w_id"]): bytes(r["sketch"]) for r in gidx.collect()}
            b = {(r["level"], r["w_id"]): bytes(r["sketch"]) for r in gidx_one.collect()}
            assert a == b
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
    old = build_bk_window_index(corp.filter(F.col("doc_id") < mid), CFG, k=K)
    appended = append_window_sketch_index(
        old, corp.filter(F.col("doc_id") >= mid), CFG, family="bk", k=K)
    scratch = build_bk_window_index(corp, CFG, k=K)
    try:
        a = {tuple(r[:3]): bytes(r[3]) for r in appended.collect()}
        s = {tuple(r[:3]): bytes(r[3]) for r in scratch.collect()}
        assert a == s
    finally:
        old.unpersist()
        appended.unpersist()
        scratch.unpersist()


def test_global_append_equals_rebuild(spark, built):
    """Incremental stream append (boundary re-merge + suffix ancestor
    recompute) is byte-equal to a from-scratch build — union merges are
    content-pure, so the mid-window boundary case loses nothing."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        append_increment_global_window,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = with_global_offsets(corp).cache()
    docs = [r["doc_id"] for r in gcorp.select("doc_id").orderBy("doc_id").collect()]
    cut = docs[len(docs) // 2]
    old = gcorp.filter(F.col("doc_id") <= cut)
    new = gcorp.filter(F.col("doc_id") > cut)
    n_so_far = int(old.agg(F.sum(F.size("tokens"))).first()[0])
    assert n_so_far % CFG.leaf_span != 0  # boundary mid-window, the hard case

    slot_blobs, merge_groups, builder = window_sketch_family(gcfg, "bk", k=K)
    old_idx = builder(old, gcfg)
    appended = append_increment_global_window(
        old_idx, new, gcfg, n_so_far, slot_blobs, merge_groups)
    full = builder(gcorp, gcfg)
    try:
        def rows(df):
            return sorted((r["level"], r["w_id"], bytes(r["sketch"]))
                          for r in df.collect())
        assert rows(appended) == rows(full) and len(rows(full)) > 0
    finally:
        for df in (old_idx, appended, full):
            df.unpersist()
        gcorp.unpersist()


# ---------------------------------------------------------------------------
# KMV range Jaccard (pair-of-ranges family)
# ---------------------------------------------------------------------------
def _brute_jaccard_state(sl_a, sl_b, k, seed=SEED):
    """Ground truth for (n_sample, n_match, est_jaccard): merged = the k
    distinct union tokens with smallest priority; match = merged tokens in
    both sides' own bottom-k samples."""
    sa, sb = _brute_bottomk(sl_a, k, seed), _brute_bottomk(sl_b, k, seed)
    u = np.unique(np.asarray(sl_a + sl_b if isinstance(sl_a, list)
                             else np.concatenate([sl_a, sl_b]), dtype=np.int64))
    if len(u) == 0:
        return 0, 0, 0.0
    order = np.argsort(hash64(u, seed), kind="stable")
    merged = u[order][:k].tolist()
    m = len(merged)
    x = sum(1 for t in merged if t in sa and t in sb)
    return m, x, x / m


def test_jaccard_kernel_matches_brute_and_exact_regime():
    rng = np.random.default_rng(11)
    A = rng.integers(0, 80, 60).astype(np.int64)
    B = rng.integers(40, 120, 60).astype(np.int64)
    for k in (8, 16):  # estimator regime (union > k)
        ba = bk.partial_blobs_by_slot(A, np.zeros(len(A), np.int64), 1, k, SEED)[0]
        bb = bk.partial_blobs_by_slot(B, np.zeros(len(B), np.int64), 1, k, SEED)[0]
        ns, nm, ej = bk.jaccard_blobs([ba], [bb], k, SEED)
        m, x, j = _brute_jaccard_state(A, B, k)
        assert (int(ns[0]), int(nm[0]), float(ej[0])) == (m, x, j)
        assert m == k  # genuinely approximate here
    # exact regime: k >= |union| -> est_jaccard IS the true Jaccard
    k = 512
    ba = bk.partial_blobs_by_slot(A, np.zeros(len(A), np.int64), 1, k, SEED)[0]
    bb = bk.partial_blobs_by_slot(B, np.zeros(len(B), np.int64), 1, k, SEED)[0]
    ns, nm, ej = bk.jaccard_blobs([ba], [bb], k, SEED)
    inter = len(np.intersect1d(np.unique(A), np.unique(B)))
    union = len(np.union1d(A, B))
    assert int(ns[0]) == union and int(nm[0]) == inter
    assert float(ej[0]) == inter / union
    # empty sides
    be = bk.partial_blobs_by_slot(np.empty(0, np.int64), np.empty(0, np.int64),
                                  1, k, SEED)[0]
    ns, nm, ej = bk.jaccard_blobs([ba, be], [be, be], k, SEED)
    assert int(ns[0]) == len(np.unique(A)) and int(nm[0]) == 0 and float(ej[0]) == 0.0
    assert (int(ns[1]), int(nm[1]), float(ej[1])) == (0, 0, 0.0)


PAIRS = [((0, 4), (4, 8)), ((1, 9), (0, 3)), ((0, 2), (4096, 4100))]


def test_range_jaccard_vs_brute_force(spark, built):
    """Every output of the pair query is a deterministic VALUE — recompute
    all three from the raw slices per (doc, pair). Includes an overlapping
    pair and a pair whose side B lies beyond every doc (empty set)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import range_jaccard

    corp, idx = built
    got = {(r["doc_id"], r["a1"], r["b1"], r["a2"], r["b2"]):
           (r["n_sample"], r["n_match"], r["est_jaccard"])
           for r in range_jaccard(idx, PAIRS, CFG.deepest).collect()}
    span = CFG.leaf_span
    n_checked = n_approx = 0
    for r in corp.select("doc_id", "tokens").collect():
        toks = r["tokens"]
        for (a1, b1), (a2, b2) in PAIRS:
            key = (r["doc_id"], a1, b1, a2, b2)
            sa = np.asarray(toks[a1 * span: b1 * span], dtype=np.int64)
            sb = np.asarray(toks[a2 * span: b2 * span], dtype=np.int64)
            if len(sa) == 0 and len(sb) == 0:
                assert key not in got
                continue
            m, x, j = _brute_jaccard_state(sa, sb, K)
            assert got[key] == (m, x, j)
            n_checked += 1
            if m == K:
                n_approx += 1
    assert n_checked > 0 and n_approx > 0  # the estimator regime is exercised
    assert len(got) == n_checked


def test_global_range_jaccard_vs_brute_force(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_jaccard,
    )

    corp, _ = built
    gcorp = C.with_global_offsets(corp)
    gidx = build_global_bk_window_index(gcorp, CFG.with_(axis="global"), k=K)
    try:
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        pairs = [((0, 6), (3, 97)), ((1, 2), (1, 2)), ((0, 4), (100000, 100004))]
        span = CFG.leaf_span
        got = {(r["a1"], r["b1"], r["a2"], r["b2"]):
               (r["n_sample"], r["n_match"], r["est_jaccard"])
               for r in global_range_jaccard(gidx, pairs, CFG.deepest).collect()}
        assert len(got) == len(pairs)
        for (a1, b1), (a2, b2) in pairs:
            sa = np.asarray(stream[a1 * span: b1 * span], dtype=np.int64)
            sb = np.asarray(stream[a2 * span: b2 * span], dtype=np.int64)
            assert got[(a1, b1, a2, b2)] == _brute_jaccard_state(sa, sb, K)
        # identical ranges -> Jaccard exactly 1 even in the estimator regime
        assert got[(1, 2, 1, 2)][2] == 1.0
    finally:
        gidx.unpersist()
