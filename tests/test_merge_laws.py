"""Shuffled-merge-order tests required by the north_rule: sketch(all) ==
merge(partials) for any partition count and any merge order.

Bloom (OR), CMS/CountSketch (add), HLL (max), HOPS (min), BottomK (bottom-k
of union) are *exactly* order-independent — byte-identical states. KLL and
t-digest are order-dependent in their internal layout, so their contract is
the error bound under every merge order (the weaker, correct law).
"""

import random

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
)

RNG = np.random.default_rng(7)
STREAM = RNG.integers(0, 100_000, 60_000, dtype=np.int64)


def _partials(factory, n_parts, stream=STREAM):
    chunks = np.array_split(stream, n_parts)
    out = []
    for c in chunks:
        s = factory()
        s.update(c)
        out.append(s)
    return out


def _merge_in_order(parts, order):
    acc = parts[order[0]]
    for i in order[1:]:
        acc = acc.merge(parts[i])
    return acc


EXACT_FAMILIES = [
    ("bloom", lambda: BloomFilter.for_capacity(100_000, 0.01, seed=3), lambda s: s.words.tobytes()),
    ("cms", lambda: CountMinSketch(4, 1024, seed=3), lambda s: s.table.tobytes()),
    ("countsketch", lambda: CountSketch(4, 1024, seed=3), lambda s: s.table.tobytes()),
    ("hll", lambda: HyperLogLog(p=12, seed=3), lambda s: s.regs.tobytes()),
    ("hops", lambda: HopsSampler(b=8, seed=3), lambda s: s.rep_prio.tobytes() + s.rep_key.tobytes()),
    ("bottomk", lambda: BottomKSampler(k=256, seed=3), lambda s: s.prios.tobytes()),
]


@pytest.mark.parametrize("name,factory,state", EXACT_FAMILIES, ids=[f[0] for f in EXACT_FAMILIES])
@pytest.mark.parametrize("n_parts", [2, 7, 32])
def test_exact_merge_order_invariance(name, factory, state, n_parts):
    whole = factory()
    whole.update(STREAM)
    parts = _partials(factory, n_parts)
    rng = random.Random(99)
    for _ in range(4):
        order = list(range(n_parts))
        rng.shuffle(order)
        merged = _merge_in_order(parts, order)
        assert state(merged) == state(whole), f"{name}: merge order changed the state"


@pytest.mark.parametrize("n_parts", [3, 16])
def test_kll_merge_any_order_keeps_bound(n_parts):
    data = RNG.normal(0, 1, 120_000)
    data_sorted = np.sort(data)
    chunks = np.array_split(data, n_parts)
    rng = random.Random(5)
    for _ in range(3):
        parts = []
        for c in chunks:
            s = KLL(k=200, seed=17)
            s.update(c)
            parts.append(s)
        order = list(range(n_parts))
        rng.shuffle(order)
        merged = _merge_in_order(parts, order)
        assert merged.n == len(data)
        for q in (0.05, 0.5, 0.95):
            true_rank = np.searchsorted(data_sorted, merged.quantile(q)) / len(data)
            assert abs(true_rank - q) <= 0.035


@pytest.mark.parametrize("n_parts", [3, 16])
def test_tdigest_merge_any_order_keeps_bound(n_parts):
    data = RNG.exponential(1.0, 120_000)
    data_sorted = np.sort(data)
    chunks = np.array_split(data, n_parts)
    rng = random.Random(5)
    for _ in range(3):
        parts = []
        for c in chunks:
            s = TDigest(delta=100)
            s.update(c)
            parts.append(s)
        order = list(range(n_parts))
        rng.shuffle(order)
        merged = _merge_in_order(parts, order)
        for q in (0.05, 0.5, 0.95):
            true_rank = np.searchsorted(data_sorted, merged.quantile(q)) / len(data)
            assert abs(true_rank - q) <= 0.035


@pytest.mark.parametrize("n_parts", [3, 16])
def test_misra_gries_merge_any_order_keeps_bound(n_parts):
    """MG is bound-preserving under any merge order (Mergeable Summaries,
    PODS'12): underestimate-only, error <= err_bound(), n_total exact."""
    from hierarchical_bloom_filter_index_spark.sketches import MisraGries

    data = RNG.zipf(1.3, 80_000).astype(np.int64)
    true_keys, true_counts = np.unique(data, return_counts=True)
    chunks = np.array_split(data, n_parts)
    rng = random.Random(5)
    for _ in range(3):
        parts = []
        for c in chunks:
            s = MisraGries(k=128)
            s.update(c)
            parts.append(s)
        order = list(range(n_parts))
        rng.shuffle(order)
        merged = _merge_in_order(parts, order)
        assert merged.n_total == len(data)
        assert len(merged.keys) <= 128
        assert merged.err_bound() <= len(data) / 129
        est = merged.estimate(true_keys)
        assert np.all(est <= true_counts), "MG must underestimate only"
        assert np.all(true_counts - est <= merged.err_bound() + 1e-9)
        for phi in (0.01, 0.003):
            hh = set(merged.heavy_hitters(phi).tolist())
            required = set(true_keys[true_counts >= phi * len(data)].tolist())
            assert required <= hh, "heavy_hitters must be a superset"
