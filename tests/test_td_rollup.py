"""t-digest window-sketch family: kernel laws (byte-identity with the object
path, ORDER-FREE merges — stronger than KLL's bound-preservation, because
sketches/tdigest._compact is a pure function of the centroid multiset and has
no RNG), exact item totals, and the dyadic RANGE QUANTILE queries on both
axes checked against exact empirical quantiles within the k1-scale rank
bound. Completes the north_rule's named sketch set (Bloom/CMS/HLL/KLL/
t-digest) as first-class window-index families."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators.rollup import (
    build_global_td_window_index,
    build_td_window_index,
    global_range_tdigest_quantiles,
    global_td_window_totals,
    range_tdigest_quantiles,
    td_window_totals,
    window_sketch_family,
)
from hierarchical_bloom_filter_index_spark.sketches import tdigest as td

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=12)
DELTA = 100.0
QS = [0.01, 0.1, 0.5, 0.9, 0.99]


def _rank_err(values, est, q) -> float:
    """|empirical rank of the estimate - q|, the t-digest accuracy metric."""
    v = np.asarray(values, dtype=np.float64)
    lo = (v < est).sum() / len(v)
    hi = (v <= est).sum() / len(v)
    return 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))


# ---------------------------------------------------------------------------
# kernel laws
# ---------------------------------------------------------------------------
def test_leaf_blobs_match_object_path_both_regimes():
    """Leaves are byte-identical to TDigest(delta).update(slice).to_bytes()
    both below _raw_max (direct sorted-raw packing) and above it (greedy
    compaction path)."""
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 4096, 1000).astype(np.int64)
    assert td._raw_max(DELTA) == 63
    for win in (32, 63, 64, 200):
        blobs = td.leaf_window_blobs(vals, win, DELTA)
        assert len(blobs) == (len(vals) + win - 1) // win
        for i, b in enumerate(blobs):
            ref = td.TDigest(DELTA)
            ref.update(vals[i * win : (i + 1) * win])
            assert b == ref.to_bytes()


def test_slot_kernel_equals_phased_leaf_path():
    rng = np.random.default_rng(7)
    span = 16
    docs = [rng.integers(0, 1 << 12, n).astype(np.int64) for n in (1, 5, 33, 100)]
    offs = np.cumsum([0] + [len(d) for d in docs[:-1]])
    want = []
    for off, toks in zip(offs, docs):
        want.extend(td.leaf_window_blobs(toks, span, DELTA, phase=int(off) % span))
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
    got = td.partial_blobs_by_slot(cat, slots, int(npart.sum()), DELTA)
    assert got == want


def test_merges_order_free_and_split_indifferent():
    """Group merges are byte-deterministic under ANY child order, and a raw
    window node equals the merge of any split of its values — the property
    that makes every build path (doc leaf / global partials / append /
    stream) byte-identical."""
    import random

    rng = np.random.default_rng(11)
    vals = rng.normal(0, 100, 2048)
    blobs = td.leaf_window_blobs(vals, 32, DELTA)
    g = blobs[:8]
    m1 = td.merge_blob_groups(g, np.array([8]), DELTA)[0]
    for s in range(5):
        random.Random(s).shuffle(g)
        assert td.merge_blob_groups(g, np.array([8]), DELTA)[0] == m1
    # raw-regime split indifference
    w32 = np.sort(vals[:32])
    whole = td._pack_node(w32, DELTA)
    for cut in (1, 7, 16, 31):
        a = td._pack_node(np.sort(vals[:cut]), DELTA)
        b = td._pack_node(np.sort(vals[cut:32]), DELTA)
        assert td.merge_blob_groups([a, b], np.array([2]), DELTA)[0] == whole
    # single-blob groups pass through byte-identically (rollup._merge_sparse
    # skips the kernel for them — both paths must agree)
    assert td.merge_blob_groups([m1], np.array([1]), DELTA)[0] == m1


def test_totals_exact_and_quantiles_within_bound():
    rng = np.random.default_rng(13)
    vals = np.concatenate([rng.normal(0, 1, 3000), rng.exponential(5, 1096)])
    blobs = td.leaf_window_blobs(vals, 32, DELTA)
    assert td.blob_totals(blobs).sum() == len(vals)
    deep = td.merge_blob_groups(blobs, np.array([len(blobs)]), DELTA)[0]
    assert td.blob_totals([deep])[0] == len(vals)
    for q, est in zip(QS, td.quantile_blobs([deep], QS)[0]):
        # k1-scale rank error ~ q(1-q)/delta; 3x envelope, tails tighter
        assert _rank_err(vals, est, q) <= max(0.03 * q * (1 - q) * 40, 0.002), q


def test_refusals_and_guards():
    toks = np.arange(64, dtype=np.float64)
    with pytest.raises(ValueError, match="unknown td"):
        window_sketch_family(CFG, "td", nope=3)
    with pytest.raises(ValueError, match="NaN"):
        td.leaf_window_blobs(np.array([1.0, np.nan]), 32, DELTA)
    with pytest.raises(ValueError, match="NaN"):
        td.partial_blobs_by_slot(np.array([np.nan]), np.array([0]), 1, DELTA)
    (b0, b1) = td.leaf_window_blobs(toks, 32, DELTA)
    with pytest.raises(ValueError, match="delta mismatch"):
        td.merge_blob_groups([b0, b1], np.array([2]), 50.0)
    other = td.leaf_window_blobs(toks, 32, 50.0)[0]
    with pytest.raises(ValueError, match="mixed"):
        td.merge_blob_groups([b0, other], np.array([2]))
    with pytest.raises(ValueError, match="magic"):
        td.blob_totals([b"\x00garbage"])
    # empty-slot blobs round-trip: n = 0, quantile NaN
    empties = td.partial_blobs_by_slot(np.empty(0, np.float64), np.empty(0, np.int64), 2, DELTA)
    assert len(empties) == 2
    assert (td.blob_totals(empties) == 0).all()
    assert np.isnan(td.quantile_blobs(empties, [0.5])).all()


# ---------------------------------------------------------------------------
# Spark: dyadic builds + range quantiles vs exact, both axes
# ---------------------------------------------------------------------------
RANGES = [(1, 9), (0, 3), (2, 4)]


@pytest.fixture(scope="module")
def built(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=12).cache()
    idx = build_td_window_index(corp, CFG, delta=DELTA)
    yield corp, idx
    idx.unpersist()
    corp.unpersist()


def test_every_node_equals_local_reference_tree(spark, built):
    """The distributed build is byte-equal to a LOCAL reference recomputation
    of each doc's whole tree (leaf packing + level-by-level kernel merges).
    Nodes whose window still fits the raw regime (n <= _raw_max) are
    additionally pure functions of the raw window multiset — byte-equal to a
    one-shot digest of the window slice; deeper parents are pure functions
    of their CHILD multiset (deterministic and order-free, which is what
    makes every build path byte-identical — the KLL family promises neither)."""
    corp, idx = built
    docs = {r["doc_id"]: np.asarray(r["tokens"], dtype=np.int64)
            for r in corp.collect()}
    rows = idx.collect()
    assert rows
    want = {}
    for doc_id, toks in docs.items():
        level_blobs = td.leaf_window_blobs(toks, CFG.leaf_span, DELTA)
        for L in range(CFG.deepest, -1, -1):
            for w, b in enumerate(level_blobs):
                want[(doc_id, L, w)] = b
            if L == 0:
                break
            counts = [2] * (len(level_blobs) // 2) + ([1] if len(level_blobs) % 2 else [])
            level_blobs = td.merge_blob_groups(
                level_blobs, np.asarray(counts, dtype=np.int64))
    deeper_than_raw = 0
    for r in rows:
        got = bytes(r["sketch"])
        assert got == want[(r["doc_id"], r["level"], r["w_id"])]
        span = CFG.span(r["level"])
        sl = docs[r["doc_id"]][r["w_id"] * span : (r["w_id"] + 1) * span]
        if len(sl) <= td._raw_max(DELTA):
            assert got == td._pack_node(np.sort(sl.astype(np.float64)), DELTA)
        else:
            deeper_than_raw += 1
    assert len(rows) == len(want) and deeper_than_raw > 0


def test_totals_oracle_shape_and_range_quantiles(spark, built):
    corp, idx = built
    tok = {r["doc_id"]: r["tokens"] for r in corp.collect()}
    # exact totals at every node
    for r in td_window_totals(idx).collect():
        span = CFG.span(r["level"])
        sl = tok[r["doc_id"]][r["w_id"] * span : (r["w_id"] + 1) * span]
        assert r["n_window"] == len(sl)
    # range quantiles within the rank bound vs the exact range slice
    span = CFG.leaf_span
    got = range_tdigest_quantiles(idx, RANGES, QS, CFG.deepest).collect()
    assert got
    for r in got:
        sl = tok[r["doc_id"]][r["a"] * span : r["b"] * span]
        if len(sl) == 0:
            continue
        assert _rank_err(sl, r["est"], r["q"]) <= 0.05, (r["doc_id"], r["a"], r["b"], r["q"])


def test_global_build_byte_equal_concat_and_range_quantiles(spark, built):
    corp, _ = built
    gcorp = C.with_global_offsets(corp)
    gcfg = CFG.with_(axis="global")
    gidx = build_global_td_window_index(gcorp, gcfg, delta=DELTA)
    try:
        stream = []
        for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                        key=lambda x: x["doc_offset"]):
            stream.extend(r["tokens"])
        one = spark.createDataFrame(
            [("all", [int(t) for t in stream], 0)],
            "doc_id string, tokens array<int>, doc_offset long")
        gidx_one = build_global_td_window_index(one, gcfg, delta=DELTA)
        try:
            a = {(r["level"], r["w_id"]): bytes(r["sketch"]) for r in gidx.collect()}
            b = {(r["level"], r["w_id"]): bytes(r["sketch"]) for r in gidx_one.collect()}
            assert a == b and len(a) > 0
        finally:
            gidx_one.unpersist()
        # exact stream-window totals
        for r in global_td_window_totals(gidx).collect():
            span = CFG.span(r["level"])
            assert r["n_window"] == len(stream[r["w_id"] * span : (r["w_id"] + 1) * span])
        # stream-range quantiles within bound
        span = CFG.leaf_span
        ranges = [(0, 6), (3, 97), (1, 2)]
        for r in global_range_tdigest_quantiles(gidx, ranges, QS, CFG.deepest).collect():
            sl = stream[r["a"] * span : r["b"] * span]
            assert _rank_err(sl, r["est"], r["q"]) <= 0.05, (r["a"], r["b"], r["q"])
    finally:
        gidx.unpersist()


def test_doc_axis_append_is_pure_union(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        append_window_sketch_index,
    )

    corp, _ = built
    ids = sorted(r["doc_id"] for r in corp.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    old = build_td_window_index(corp.filter(F.col("doc_id") < mid), CFG, delta=DELTA)
    appended = append_window_sketch_index(
        old, corp.filter(F.col("doc_id") >= mid), CFG, family="td", delta=DELTA)
    scratch = build_td_window_index(corp, CFG, delta=DELTA)
    try:
        a = {tuple(r[:3]): bytes(r[3]) for r in appended.collect()}
        s = {tuple(r[:3]): bytes(r[3]) for r in scratch.collect()}
        assert a == s
    finally:
        old.unpersist()
        appended.unpersist()
        scratch.unpersist()


def test_global_append_equals_rebuild(spark, built):
    """Incremental stream append is byte-equal to a from-scratch build even
    with the boundary mid-window — content-pure merges lose nothing."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        append_increment_global_window,
    )

    corp, _ = built
    gcfg = CFG.with_(axis="global")
    gcorp = C.with_global_offsets(corp).cache()
    docs = [r["doc_id"] for r in gcorp.select("doc_id").orderBy("doc_id").collect()]
    cut = docs[len(docs) // 2]
    old = gcorp.filter(F.col("doc_id") <= cut)
    new = gcorp.filter(F.col("doc_id") > cut)
    n_so_far = int(old.agg(F.sum(F.size("tokens"))).first()[0])
    assert n_so_far % CFG.leaf_span != 0  # boundary mid-window, the hard case

    slot_blobs, merge_groups, builder = window_sketch_family(gcfg, "td", delta=DELTA)
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
        old_idx.unpersist()
        appended.unpersist()
        full.unpersist()
        gcorp.unpersist()

# ---------------------------------------------------------------------------
# Inverse-quantile family: t-digest CDF (estimate) + sparse-CMS exact rank
# ---------------------------------------------------------------------------
def _cdf_interval(values, v):
    """Tie-aware empirical CDF interval of v: [P(x < v), P(x <= v)]."""
    x = np.asarray(values, dtype=np.float64)
    return (x < v).sum() / len(x), (x <= v).sum() / len(x)


def test_cdf_inverse_and_bound():
    rng = np.random.default_rng(17)
    vals = np.concatenate([rng.normal(0, 1, 2500), rng.exponential(4, 1500)])
    blobs = td.leaf_window_blobs(vals, 32, DELTA)
    deep = td.merge_blob_groups(blobs, np.array([len(blobs)]), DELTA)[0]
    d = td.TDigest.from_bytes(deep)
    # tie-aware rank bound at assorted probes incl. edges
    for v in np.percentile(vals, [0.1, 1, 10, 50, 90, 99, 99.9]):
        lo, hi = _cdf_interval(vals, v)
        est = d.cdf(float(v))
        assert lo - 0.02 <= est <= hi + 0.02, v
    assert d.cdf(vals.min() - 1) == 0.0 and d.cdf(vals.max() + 1) == 1.0
    # inverse consistency away from the edges
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        assert abs(d.cdf(d.quantile(q)) - q) <= 0.02, q
    # kernel batch path == object path; empty blob -> NaN
    probes = [-1.0, 0.0, 2.5]
    got = td.cdf_blobs([deep], probes)[0]
    assert got.tolist() == [d.cdf(v) for v in probes]
    empty = td.partial_blobs_by_slot(np.empty(0, np.float64), np.empty(0, np.int64), 1, DELTA)
    assert np.isnan(td.cdf_blobs(empty, [0.5])).all()
    # raw-regime node: cdf midpoint convention is exactly (i + 0.5)/n at a
    # distinct value, and ties average their midpoint span
    raw = td._pack_node(np.array([1.0, 2.0, 2.0, 5.0]), DELTA)
    r = td.TDigest.from_bytes(raw)
    assert r.cdf(1.0) == pytest.approx(0.5 / 4)
    assert r.cdf(2.0) == pytest.approx((1 + 3) / 2 / 4)
    # between the last tied centroid (mean 2, midpoint-cum 2.5) and mean 5
    assert r.cdf(3.0) == pytest.approx((2.5 + (3 - 2) / (5 - 2) * (3.5 - 2.5)) / 4)


def test_range_cdf_vs_exact(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_tdigest_cdf,
    )

    corp, idx = built
    tok = {r["doc_id"]: r["tokens"] for r in corp.collect()}
    span = CFG.leaf_span
    probes = [32.0, 101.0, 116.0]
    got = range_tdigest_cdf(idx, RANGES, probes, CFG.deepest).collect()
    assert got
    for r in got:
        sl = tok[r["doc_id"]][r["a"] * span : r["b"] * span]
        if len(sl) == 0:
            continue
        lo, hi = _cdf_interval(sl, r["v"])
        assert lo - 0.05 <= r["est_cdf"] <= hi + 0.05, (r["doc_id"], r["a"], r["b"], r["v"])


def test_range_rank_exact_both_axes(spark, built):
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_cms_window_index,
        build_global_cms_window_index,
        global_range_rank_counts,
        range_rank_counts,
    )

    corp, _ = built
    probes = [32, 101, 116]
    span = CFG.leaf_span
    tok = {r["doc_id"]: r["tokens"] for r in corp.collect()}
    cidx = build_cms_window_index(corp, CFG)
    try:
        got = range_rank_counts(cidx, RANGES, probes, CFG.deepest).collect()
        assert got
        for r in got:
            sl = tok[r["doc_id"]][r["a"] * span : r["b"] * span]
            assert r["rank_le"] == sum(1 for t in sl if t <= r["v"]), r
        # every (doc-with-overlap, range, probe) is present — exactness is a
        # statement about the full cross product, zero rows included
        n_overlap = sum(1 for ts in tok.values() for a, b in RANGES
                        if min(len(ts), b * span) - min(len(ts), a * span) > 0)
        assert len(got) == n_overlap * len(probes)
    finally:
        cidx.unpersist()

    gcorp = C.with_global_offsets(corp)
    stream = []
    for r in sorted(gcorp.select("doc_offset", "tokens").collect(),
                    key=lambda x: x["doc_offset"]):
        stream.extend(r["tokens"])
    gidx = build_global_cms_window_index(gcorp, CFG.with_(axis="global"))
    try:
        granges = [(0, 6), (3, 97), (1, 2)]
        ggot = global_range_rank_counts(gidx, granges, probes, CFG.deepest).collect()
        assert ggot
        for r in ggot:
            sl = stream[r["a"] * span : r["b"] * span]
            assert r["rank_le"] == sum(1 for t in sl if t <= r["v"]), r
    finally:
        gidx.unpersist()


def test_rank_blobs_refuses_dense():
    from hierarchical_bloom_filter_index_spark.sketches.cms import (
        CountMinSketch,
        rank_blobs,
        sparse_max_nnz,
    )

    depth, width = 3, 256
    sk = CountMinSketch(depth, width, seed=1)
    sk.update(np.arange(sparse_max_nnz(depth, width) + 10, dtype=np.int64))
    with pytest.raises(ValueError, match="not sparse-exact"):
        rank_blobs([sk.to_bytes()], np.array([5]))


def test_union_readouts_match_object_path_and_bounds():
    """The union readouts (no recompaction — the hot range path) equal the
    object path EXACTLY on single-node groups (union of one = the node;
    np.interp == TDigest.quantile midpoint interpolation) and stay within
    the rank bound on multi-node groups."""
    rng = np.random.default_rng(23)
    vals = rng.normal(0, 10, 500)
    blobs = td.leaf_window_blobs(vals, 32, DELTA)
    deep = td.merge_blob_groups(blobs, np.array([len(blobs)]), DELTA)
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    assert np.array_equal(td.quantile_union_groups(deep, np.array([1]), qs),
                          td.quantile_blobs(deep, qs))
    probes = [-25.0, -3.2, 0.0, 4.4, 30.0, float(vals.min()) - 1, float(vals.max()) + 1]
    assert np.array_equal(td.cdf_union_groups(deep, np.array([1]), probes),
                          td.cdf_blobs(deep, probes))
    # multi-node union: tie-aware rank bound holds in both directions
    for q, est in zip(qs, td.quantile_union_groups(blobs, np.array([len(blobs)]), qs)[0]):
        assert _rank_err(vals, est, q) <= 0.02, q
    for v, est in zip(probes, td.cdf_union_groups(blobs, np.array([len(blobs)]), probes)[0]):
        lo, hi = _cdf_interval(vals, v)
        assert lo - 0.02 <= est <= hi + 0.02, v
    # empty group -> NaN; group structure respected
    two = td.quantile_union_groups(deep + deep, np.array([1, 1]), qs)
    assert np.array_equal(two[0], two[1])
