"""Property-based merge-law tests (hypothesis): for arbitrary streams and
arbitrary partitionings, distributed-style merge == whole-stream state for
the exactly-mergeable sketch families."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hierarchical_bloom_filter_index_spark.sketches import (
    BloomFilter,
    BottomKSampler,
    CountMinSketch,
    HopsSampler,
    HyperLogLog,
)

streams = st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=400)
cuts = st.lists(st.integers(min_value=0, max_value=400), min_size=0, max_size=5)


def _split(arr: np.ndarray, cut_points):
    cuts_sorted = sorted(set(min(c, len(arr)) for c in cut_points))
    return np.split(arr, cuts_sorted)


FACTORIES = [
    ("bloom", lambda: BloomFilter.for_capacity(500, 0.02, seed=9), lambda s: s.words.tobytes()),
    ("cms", lambda: CountMinSketch(3, 256, seed=9), lambda s: s.table.tobytes()),
    ("hll", lambda: HyperLogLog(p=8, seed=9), lambda s: s.regs.tobytes()),
    ("hops", lambda: HopsSampler(b=5, seed=9), lambda s: s.rep_prio.tobytes() + s.rep_key.tobytes()),
    ("bottomk", lambda: BottomKSampler(k=32, seed=9), lambda s: s.prios.tobytes()),
]


@settings(max_examples=25, deadline=None)
@given(stream=streams, cut_points=cuts)
def test_partition_merge_equals_whole(stream, cut_points):
    arr = np.asarray(stream, dtype=np.int64)
    for name, factory, state in FACTORIES:
        whole = factory()
        if len(arr):
            whole.update(arr)
        acc = None
        for part in _split(arr, cut_points):
            s = factory()
            if len(part):
                s.update(part)
            acc = s if acc is None else acc.merge(s)
        if acc is None:
            acc = factory()
        assert state(acc) == state(whole), name


@settings(max_examples=15, deadline=None)
@given(stream=streams)
def test_serialization_roundtrip_preserves_state(stream):
    arr = np.asarray(stream, dtype=np.int64)
    for name, factory, state in FACTORIES:
        s = factory()
        if len(arr):
            s.update(arr)
        rt = type(s).from_bytes(s.to_bytes())
        assert state(rt) == state(s), name


@settings(max_examples=25, deadline=None)
@given(stream=streams, cut_points=cuts, k=st.integers(min_value=1, max_value=40))
def test_misra_gries_invariants_any_partitioning(stream, cut_points, k):
    """MG's deterministic contract for arbitrary streams/partitionings:
    exact n_total, <= k counters, underestimate-only within err_bound,
    heavy_hitters(phi) a superset of the true phi-heavy keys."""
    from hierarchical_bloom_filter_index_spark.sketches import MisraGries

    arr = np.asarray(stream, dtype=np.int64)
    acc = None
    for part in _split(arr, cut_points):
        s = MisraGries(k=k)
        if len(part):
            s.update(part)
        acc = s if acc is None else acc.merge(s)
    if acc is None:
        acc = MisraGries(k=k)
    assert acc.n_total == len(arr)
    assert len(acc.keys) <= k
    keys, counts = (np.unique(arr, return_counts=True) if len(arr)
                    else (np.empty(0, np.int64), np.empty(0, np.int64)))
    est = acc.estimate(keys)
    assert np.all(est <= counts)
    assert np.all(counts - est <= acc.err_bound() + 1e-9)
    assert acc.err_bound() <= len(arr) / (k + 1) + 1e-9
    for phi in (0.5, 0.1, 0.02):
        required = set(keys[counts >= phi * max(len(arr), 1)].tolist())
        try:
            hh = set(acc.heavy_hitters(phi).tolist())
        except ValueError:
            # honest refusal is allowed exactly when the bound can't certify
            assert acc.err_bound() >= phi * acc.n_total
            continue
        assert required <= hh


@settings(max_examples=20, deadline=None)
@given(stream=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=600),
       cut_points=cuts, span=st.sampled_from([8, 16, 32]))
def test_phased_window_partials_merge_to_stream_windows(stream, cut_points, span):
    """The global-axis core invariant: splitting a stream into arbitrary
    'docs' and building phase-aligned window partials per doc, then merging
    partials of the same window, is BYTE-identical to sketching each stream
    window whole — for both CMS (add) and HLL (max)."""
    from hierarchical_bloom_filter_index_spark.sketches import cms, hll

    arr = np.asarray(stream, dtype=np.int64)
    D, W, S, P = 2, 32, 9, 6
    parts_c, parts_h = {}, {}
    offset = 0
    for piece in _split(arr, cut_points):
        if len(piece) == 0:
            continue
        first_w = offset // span
        for i, b in enumerate(cms.leaf_window_blobs(piece, span, D, W, S, phase=offset % span)):
            parts_c.setdefault(first_w + i, []).append(b)
        for i, b in enumerate(hll.leaf_window_blobs(piece, span, P, S, phase=offset % span)):
            parts_h.setdefault(first_w + i, []).append(b)
        offset += len(piece)
    whole_c = cms.leaf_window_blobs(arr, span, D, W, S)
    whole_h = hll.leaf_window_blobs(arr, span, P, S)
    for w, flat in parts_c.items():
        merged = cms.merge_blob_groups(flat, np.array([len(flat)]), D, W, S)[0]
        # canonical-form equality with the whole-stream build path, and
        # dense-form equality with the object path
        assert merged == whole_c[w]
        ref = cms.CountMinSketch(D, W, S)
        ref.update(arr[w * span : (w + 1) * span])
        assert cms.densify_blob(merged) == ref.to_bytes()
    for w, flat in parts_h.items():
        merged = hll.merge_blob_groups(flat, np.array([len(flat)]), P)[0]
        assert merged == whole_h[w]
        ref = hll.HyperLogLog(p=P, seed=S)
        ref.update(arr[w * span : (w + 1) * span])
        assert hll.densify_blob(merged) == ref.to_bytes()


@pytest.mark.parametrize("kind", ["hll", "cms", "kll"])
def test_slot_kernels_equal_phased_per_doc_path(kind):
    """partial_blobs_by_slot (the batch-vectorized global leaf kernel) must
    produce byte-identical partials to the per-doc phased kernel it
    replaced, for every doc layout: the slot construction is exactly
    'concatenate each doc's phased windows'."""
    import numpy as np

    from hierarchical_bloom_filter_index_spark.sketches import cms, hll, kll

    rng = np.random.default_rng(21)
    span = 16
    docs = [rng.integers(0, 1 << 20, n).astype(np.int64)
            for n in (1, 5, 16, 33, 100, 240)]
    offs = np.cumsum([0] + [len(d) for d in docs[:-1]])

    def phased(toks, phase):
        if kind == "hll":
            return hll.leaf_window_blobs(toks, span, 10, 3, phase=phase)
        if kind == "cms":
            return cms.leaf_window_blobs(toks, span, 3, 32, 3, phase=phase)
        return kll.leaf_window_blobs(toks, span, 64, 3, phase=phase)

    # expected: per-doc phased kernels, concatenated
    want = []
    for off, toks in zip(offs, docs):
        want.extend(phased(toks, int(off) % span))

    # batch slot construction (mirrors rollup._global_leaf_partials)
    lens = np.asarray([len(d) for d in docs], dtype=np.int64)
    cat = np.concatenate(docs)
    doc_idx = np.repeat(np.arange(len(docs)), lens)
    starts = np.cumsum(lens) - lens
    pos = np.arange(cat.size, dtype=np.int64) - starts[doc_idx]
    w = (offs[doc_idx] + pos) // span
    first_w = offs // span
    npart = (offs % span + lens + span - 1) // span
    base_slot = np.cumsum(npart) - npart
    slots = base_slot[doc_idx] + (w - first_w[doc_idx])
    n_slots = int(npart.sum())
    if kind == "hll":
        got = hll.partial_blobs_by_slot(cat, slots, n_slots, 10, 3)
    elif kind == "cms":
        got = cms.partial_blobs_by_slot(cat, slots, n_slots, 3, 32, 3)
    else:
        got = kll.partial_blobs_by_slot(cat, slots, n_slots, 64, 3)
    assert len(got) == len(want) and got == want


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_merge_blob_groups_randomized_mixed_representation(data):
    """Randomized differential for the canonical sparse/dense node merge:
    random streams / widths / window sizes / group partitions produce
    arbitrary sparse-dense mixes; every merged group must densify to the
    object-path sketch of its concatenated content, keep the pure content
    rule (sparse IFF nnz <= sparse_max_nnz), and be byte-identical under a
    shuffled within-group child order."""
    from hierarchical_bloom_filter_index_spark.sketches import cms, hll

    n = data.draw(st.integers(min_value=10, max_value=400))
    vocab = data.draw(st.sampled_from([8, 64, 2000]))
    toks = np.asarray(
        data.draw(st.lists(st.integers(0, vocab), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    window = data.draw(st.sampled_from([8, 32]))
    D, W, S = 2, data.draw(st.sampled_from([16, 64])), 5
    P = data.draw(st.sampled_from([4, 6]))
    nw = (n + window - 1) // window
    counts = []
    i = 0
    while i < nw:
        k = data.draw(st.integers(1, min(4, nw - i)))
        counts.append(k)
        i += k
    counts = np.asarray(counts, dtype=np.int64)

    cblobs = cms.leaf_window_blobs(toks, window, D, W, S)
    hblobs = hll.leaf_window_blobs(toks, window, P, S)
    cgot = cms.merge_blob_groups(cblobs, counts, D, W, S)
    hgot = hll.merge_blob_groups(hblobs, counts, P)
    i = 0
    for g, k in enumerate(counts):
        seg = toks[i * window : (i + k) * window]
        nnz = len(np.unique(seg))
        cref = cms.CountMinSketch(D, W, S)
        cref.update(seg)
        assert cms.densify_blob(cgot[g]) == cref.to_bytes()
        assert (cgot[g][0] == cms._MAGIC_CMS_SP) == (nnz <= cms.sparse_max_nnz(D, W))
        href = hll.HyperLogLog(P, S)
        href.update(seg)
        assert hll.densify_blob(hgot[g]) == href.to_bytes()
        assert (hgot[g][0] == hll._MAGIC_HLL_SP) == (nnz <= hll.sparse_max_nnz(P))
        if k >= 2:  # shuffled within-group child order -> identical bytes
            children_c = cblobs[i : i + k]
            children_h = hblobs[i : i + k]
            perm = data.draw(st.permutations(list(range(k))))
            assert cms.merge_blob_groups(
                [children_c[j] for j in perm], np.array([k]), D, W, S
            )[0] == cgot[g]
            assert hll.merge_blob_groups(
                [children_h[j] for j in perm], np.array([k]), P
            )[0] == hgot[g]
        i += k
