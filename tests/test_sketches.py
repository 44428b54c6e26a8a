"""Error-bound + serialization unit tests for the pure-numpy sketch kernels.

Mirrors the reference's accuracy-experiment methodology
(SamplingSketchExperiment.java:92-110, ConfidenceExperiment.java:40-77):
empirical Bloom FPR <= configured p (+slack), CMS overestimate-only within
eps*N, HLL within the 1.04/sqrt(m) envelope, KLL/t-digest rank error <= eps.
"""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_spark.sketches import (
    BloomFilter,
    BottomKSampler,
    CountMinSketch,
    CountSketch,
    HopsSampler,
    HyperLogLog,
    KLL,
    TDigest,
    from_bytes,
)
from hierarchical_bloom_filter_index_spark.sketches.base import MergeError
from hierarchical_bloom_filter_index_spark.sketches.hashing import (
    bit_length_u64,
    hash64,
    pack_ngrams_u64,
    splitmix64,
)

RNG = np.random.default_rng(42)


# --------------------------------------------------------------------------
# hashing
# --------------------------------------------------------------------------
def test_splitmix_deterministic_and_uniform():
    x = np.arange(100_000, dtype=np.uint64)
    h1, h2 = splitmix64(x), splitmix64(x)
    assert np.array_equal(h1, h2)
    # top bit should be ~50/50
    frac = (h1 >> np.uint64(63)).mean()
    assert 0.49 < frac < 0.51


def test_hash64_seed_independence():
    x = np.arange(10_000, dtype=np.uint64)
    a, b = hash64(x, 1), hash64(x, 2)
    assert (a == b).mean() < 0.001


def test_bit_length_exact():
    vals = np.array([0, 1, 2, 3, 4, 255, 256, 2**52, 2**63, 2**64 - 1], dtype=np.uint64)
    expected = np.array([v.bit_length() for v in vals.tolist()])
    assert np.array_equal(bit_length_u64(vals), expected)


def test_pack_ngrams():
    toks = np.array([1, 2, 3, 4], dtype=np.int32)
    grams = pack_ngrams_u64(toks, 2, base_bits=21)
    assert len(grams) == 3
    assert grams[0] == (1 << 21) | 2
    assert len(pack_ngrams_u64(np.array([7], dtype=np.int32), 2)) == 0


# --------------------------------------------------------------------------
# Bloom
# --------------------------------------------------------------------------
@pytest.mark.parametrize("p", [0.01, 0.05])
def test_bloom_fpr_bound(p):
    n = 20_000
    present = RNG.integers(0, 2**62, n, dtype=np.int64)
    bf = BloomFilter.for_capacity(n, p, seed=7)
    bf.update(present)
    assert bf.contains(present).all()  # zero false negatives
    absent = RNG.integers(2**62, 2**63, 50_000, dtype=np.int64)
    fpr = bf.contains(absent).mean()
    assert fpr <= p * 1.5 + 3 * np.sqrt(p / 50_000)


def test_bloom_fill_metadata():
    n = 5_000
    keys = np.arange(n, dtype=np.int64)
    bf = BloomFilter.for_capacity(n, 0.01, seed=1)
    bf.update(keys)
    est = bf.estimate_distinct()
    assert abs(est - n) / n < 0.05
    assert 0 < bf.fill_fpr() < 0.05


def test_bloom_roundtrip_and_merge():
    a = BloomFilter.for_capacity(1000, 0.01, seed=3)
    b = BloomFilter.for_capacity(1000, 0.01, seed=3)
    ka = np.arange(0, 500, dtype=np.int64)
    kb = np.arange(500, 1000, dtype=np.int64)
    a.update(ka)
    b.update(kb)
    m = a.merge(b)
    assert m.contains(ka).all() and m.contains(kb).all()
    rt = BloomFilter.from_bytes(m.to_bytes())
    assert np.array_equal(rt.words, m.words) and rt.n_added == m.n_added
    with pytest.raises(MergeError):
        a.merge(BloomFilter.for_capacity(2000, 0.01, seed=3))
    with pytest.raises(MergeError):
        a.merge(BloomFilter(a.m, a.k, seed=4))


# --------------------------------------------------------------------------
# CMS / CountSketch
# --------------------------------------------------------------------------
def _zipf_stream(n, vocab, s=1.2):
    ranks = np.arange(1, vocab + 1)
    probs = ranks ** (-s)
    probs /= probs.sum()
    return RNG.choice(vocab, size=n, p=probs).astype(np.int64)


def test_cms_bound():
    eps, delta = 0.005, 0.01
    stream = _zipf_stream(200_000, 5_000)
    cms = CountMinSketch.from_eps_delta(eps, delta, seed=11)
    cms.update(stream)
    true = np.bincount(stream, minlength=5_000)
    probe = np.arange(5_000, dtype=np.int64)
    est = cms.estimate(probe)
    assert (est >= true).all()  # overestimate-only
    viol = (est - true > eps * len(stream)).mean()
    assert viol <= delta


def test_count_sketch_bound():
    eps, delta = 0.02, 0.01
    stream = _zipf_stream(100_000, 2_000)
    cs = CountSketch.from_eps_delta(eps, delta, seed=13)
    cs.update(stream)
    true = np.bincount(stream, minlength=2_000)
    probe = np.arange(2_000, dtype=np.int64)
    est = cs.estimate(probe)
    l2 = np.sqrt((true.astype(np.float64) ** 2).sum())
    viol = (np.abs(est - true) > eps * l2).mean()
    assert viol <= 2 * delta


def test_cms_weighted_update_matches_unit():
    keys = np.array([5, 9, 5, 5, 9, 1], dtype=np.int64)
    a = CountMinSketch(4, 128, seed=2)
    a.update(keys)
    b = CountMinSketch(4, 128, seed=2)
    b.update(np.array([5, 9, 1], dtype=np.int64), np.array([3, 2, 1]))
    assert np.array_equal(a.table, b.table) and a.total == b.total


# --------------------------------------------------------------------------
# HLL
# --------------------------------------------------------------------------
@pytest.mark.parametrize("true_n", [100, 10_000, 500_000])
def test_hll_envelope(true_n):
    hll = HyperLogLog(p=14, seed=5)
    keys = RNG.integers(0, 2**63, true_n, dtype=np.int64)
    hll.update(keys)
    hll.update(keys[: true_n // 2])  # duplicates must not change cardinality
    est = hll.estimate()
    rel = abs(est - true_n) / true_n
    assert rel <= 4 * hll.rel_error(), f"rel err {rel} vs bound {4 * hll.rel_error()}"


def test_hll_roundtrip():
    hll = HyperLogLog(p=10, seed=5)
    hll.update(np.arange(1000, dtype=np.int64))
    rt = HyperLogLog.from_bytes(hll.to_bytes())
    assert np.array_equal(rt.regs, hll.regs)
    assert rt.estimate() == hll.estimate()


@pytest.mark.parametrize("p,window", [(12, 32), (8, 64), (4, 16)])
def test_hll_vectorized_kernels_byte_identical(p, window):
    """Canonical window nodes: densify_blob(leaf) is BYTE-identical to the
    per-window object path, representation follows the pure content rule
    (sparse IFF nnz <= sparse_max_nnz), grouped merges equal chained
    .merge() after densification AND preserve the rule, and estimates are
    EXACT on sparse nodes / match estimate() on dense ones."""
    from hierarchical_bloom_filter_index_spark.sketches.hll import (
        _MAGIC_HLL_SP,
        densify_blob,
        estimate_blobs,
        leaf_window_blobs,
        merge_blob_groups,
        sparse_max_nnz,
    )

    toks = RNG.integers(0, 5000, size=1037).astype(np.int64)
    fast = leaf_window_blobs(toks, window, p, seed=99)
    slow, nnzs = [], []
    for w in range((len(toks) + window - 1) // window):
        sl = toks[w * window : (w + 1) * window]
        sk = HyperLogLog(p=p, seed=99)
        sk.update(sl)
        slow.append(sk.to_bytes())
        nnzs.append(len(np.unique(sl)))
    assert [densify_blob(b) for b in fast] == slow
    for b, nnz in zip(fast, nnzs):
        assert (b[0] == _MAGIC_HLL_SP) == (nnz <= sparse_max_nnz(p))
    # grouped merge (pairs + a trailing singleton) vs .merge()
    counts, flat, exp, seg_nnz = [], [], [], []
    i = 0
    while i < len(fast):
        k = 2 if i + 1 < len(fast) else 1
        counts.append(k)
        flat.extend(fast[i : i + k])
        acc = HyperLogLog.from_bytes(fast[i])
        for b in fast[i + 1 : i + k]:
            acc = acc.merge(HyperLogLog.from_bytes(b))
        exp.append(acc.to_bytes())
        seg_nnz.append(len(np.unique(toks[i * window : (i + k) * window])))
        i += k
    got = merge_blob_groups(flat, np.asarray(counts), p)
    assert [densify_blob(b) for b in got] == exp
    for b, nnz in zip(got, seg_nnz):
        assert (b[0] == _MAGIC_HLL_SP) == (nnz <= sparse_max_nnz(p))
    est_fast = estimate_blobs(fast, p)
    for w, b in enumerate(fast):
        if b[0] == _MAGIC_HLL_SP:
            assert est_fast[w] == nnzs[w]  # sparse nodes answer exactly
        else:
            assert np.isclose(est_fast[w], HyperLogLog.from_bytes(b).estimate(), rtol=1e-12)
    # garbage magic refused; empty inputs are empty outputs
    with pytest.raises(ValueError, match="magic"):
        estimate_blobs([b"\x09" + bytes(64 + (1 << p))], p)
    assert leaf_window_blobs(np.array([], dtype=np.int64), window, p, 1) == []
    assert merge_blob_groups([], np.array([]), p) == []


# --------------------------------------------------------------------------
# KLL / t-digest
# --------------------------------------------------------------------------
def test_kll_rank_error():
    n = 200_000
    data = RNG.normal(0, 1, n)
    kll = KLL(k=200, seed=9)
    kll.update(data)
    assert kll.n == n
    data_sorted = np.sort(data)
    for q in [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]:
        est = kll.quantile(q)
        true_rank = np.searchsorted(data_sorted, est) / n
        assert abs(true_rank - q) <= 0.025, f"q={q}: rank err {abs(true_rank - q)}"


def test_kll_roundtrip():
    kll = KLL(k=64, seed=9)
    kll.update(RNG.uniform(0, 1, 10_000))
    rt = KLL.from_bytes(kll.to_bytes())
    assert rt.n == kll.n
    for q in (0.1, 0.5, 0.9):
        assert rt.quantile(q) == kll.quantile(q)


def test_tdigest_rank_error():
    n = 200_000
    data = RNG.exponential(2.0, n)
    td = TDigest(delta=100)
    td.update(data)
    data_sorted = np.sort(data)
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        est = td.quantile(q)
        true_rank = np.searchsorted(data_sorted, est) / n
        assert abs(true_rank - q) <= 0.02, f"q={q}: rank err {abs(true_rank - q)}"


def test_tdigest_roundtrip():
    td = TDigest(delta=50)
    td.update(RNG.uniform(0, 100, 5_000))
    rt = TDigest.from_bytes(td.to_bytes())
    assert rt.quantile(0.5) == pytest.approx(td.quantile(0.5))


# --------------------------------------------------------------------------
# samplers
# --------------------------------------------------------------------------
def test_hops_representatives_are_real_keys():
    keys = RNG.integers(0, 2**62, 50_000, dtype=np.int64).astype(np.uint64)
    h = HopsSampler(b=8, seed=21)
    h.update(keys)
    reps = h.representatives()
    assert h.occupancy() == len(reps) > 200
    assert np.isin(reps, keys).all()


def test_bottomk_uniform_distinct_sample():
    keys = np.arange(100_000, dtype=np.int64)
    bk = BottomKSampler(k=512, seed=31)
    bk.update(keys)
    bk.update(keys[:50])  # duplicates don't distort
    assert len(bk.sample()) == 512
    est = bk.estimate_distinct()
    assert abs(est - 100_000) / 100_000 < 0.15


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------
def test_registry_dispatch():
    objs = [
        BloomFilter.for_capacity(100, 0.01, seed=1),
        CountMinSketch(3, 64, seed=1),
        CountSketch(3, 64, seed=1),
        HyperLogLog(p=6, seed=1),
        KLL(k=16, seed=1),
        HopsSampler(b=4, seed=1),
        BottomKSampler(k=8, seed=1),
        TDigest(delta=25),
    ]
    for o in objs:
        o.update(np.arange(50, dtype=np.int64))
        rt = from_bytes(o.to_bytes())
        assert type(rt) is type(o)


def test_int_count_sketch_parity_and_saturation():
    """IntCountSketch (estimators/IntCountSketch.java:233-246 parity): same
    estimates as the int64 CountSketch away from the rails, half the state
    bytes, and SATURATING (never wrapping) arithmetic at ±2^31."""
    from hierarchical_bloom_filter_index_spark.sketches import (
        CountSketch,
        IntCountSketch,
        from_bytes,
    )

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 500, 20_000).astype(np.int64)
    a64, a32 = CountSketch(5, 1 << 12, seed=3), IntCountSketch(5, 1 << 12, seed=3)
    a64.update(keys)
    a32.update(keys)
    probe = np.arange(50, dtype=np.int64)
    assert np.array_equal(a64.estimate(probe), a32.estimate(probe))
    assert a32.table.dtype == np.int32
    assert a32.to_bytes() != a64.to_bytes()  # distinct wire format (magic 9)
    rt = from_bytes(a32.to_bytes())
    assert isinstance(rt, IntCountSketch) and np.array_equal(rt.table, a32.table)

    # saturation: a near-max cell clamps instead of wrapping, on update and merge
    big = IntCountSketch(1, 8, seed=1)
    big.table[0, :] = 2**31 - 5
    k = np.asarray([0], dtype=np.int64)
    big.update(k, counts=np.asarray([10**12]))
    assert big.table.min() >= -(2**31) and big.table.max() == 2**31 - 1
    m = big.merge(big)
    assert m.table.max() == 2**31 - 1 and m.table.min() >= -(2**31)

    # merge incompatibility still enforced
    import pytest
    from hierarchical_bloom_filter_index_spark.sketches.base import MergeError

    with pytest.raises(MergeError):
        a32.merge(IntCountSketch(5, 1 << 12, seed=4))
    with pytest.raises(MergeError):
        a32.merge(a64)  # int32 and int64 families never merge silently


def test_int_count_sketch_shuffled_merge_order():
    """Away from the rails, IntCountSketch merge is order-independent
    byte-for-byte (the same shuffled-merge law the other sketches obey)."""
    from hierarchical_bloom_filter_index_spark.sketches import IntCountSketch, merge_blobs

    rng = np.random.default_rng(6)
    parts = []
    for i in range(8):
        sk = IntCountSketch(4, 1 << 10, seed=2)
        sk.update(rng.integers(0, 1000, 5000).astype(np.int64))
        parts.append(sk.to_bytes())
    a = merge_blobs(parts)
    order = rng.permutation(len(parts))
    b = merge_blobs([parts[i] for i in order])
    assert a == b


def test_int_countsketch_strict_per_element_saturation():
    """update_strict = the Java reference's per-element clamp semantics
    (IntCountSketch.java:233-246): identical to the batched update away from
    the rails; at the rails a mixed-sign sequence that transiently crosses
    int32 PINS under strict (Java) semantics while the batched
    post-aggregation clamp lets it cancel — the documented deviation, now
    testable in both directions."""
    from hierarchical_bloom_filter_index_spark.sketches import IntCountSketch

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 300, 5_000).astype(np.int64)
    counts = rng.integers(-50, 50, 5_000).astype(np.int64)
    a = IntCountSketch(3, 1 << 10, seed=7)
    b = IntCountSketch(3, 1 << 10, seed=7)
    a.update(keys, counts)
    b.update_strict(keys, counts)
    assert np.array_equal(a.table, b.table)  # no rail touched: identical
    assert a.total == b.total

    # rails: +big then -big on one cell — strict pins at INT32_MAX (the
    # second add starts FROM the clamped value), batched cancels to ~0
    one = np.asarray([0], dtype=np.int64)
    up, down = np.asarray([2**33]), np.asarray([-(2**33)])
    sat_strict = IntCountSketch(1, 8, seed=1)
    sat_strict.update_strict(one, up)
    sat_strict.update_strict(one, down)
    sat_batch = IntCountSketch(1, 8, seed=1)
    sat_batch.update(np.asarray([0, 0], dtype=np.int64),
                     np.asarray([2**33, -(2**33)]))
    # strict: first add pins at one rail, second add clamps at the OTHER
    # (it starts from the clamped value and overshoots) — |cell| = 2^31.
    # NB cast before abs: np.abs(INT32_MIN) wraps on int32 (the same trap
    # the sketch itself guards against)
    assert int(np.abs(sat_strict.table.astype(np.int64)).max()) == 2**31
    assert int(np.abs(sat_batch.table.astype(np.int64)).max()) == 0


def test_kll_leaf_packing_rejects_nan():
    """Direct leaf byte-packing skips KLL.update's NaN filter, so a NaN
    would land in level 0 AND be counted in the exact n field — the kernels
    refuse instead (inputs here are int tokens cast to float64, so the
    guard is free in practice)."""
    import pytest

    from hierarchical_bloom_filter_index_spark.sketches.kll import (
        KLL,
        leaf_window_blobs,
        partial_blobs_by_slot,
    )

    bad = np.asarray([1.0, float("nan"), 3.0])
    with pytest.raises(ValueError, match="NaN"):
        leaf_window_blobs(bad, 4, 200, seed=1)
    with pytest.raises(ValueError, match="NaN"):
        partial_blobs_by_slot(bad, np.zeros(3, dtype=np.int64), 1, 200, seed=1)
    # the object path filters instead of failing (documented contract)
    s = KLL(k=200, seed=1)
    s.update(bad)
    assert s.n == 2
