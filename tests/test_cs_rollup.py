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
