"""Misra-Gries heavy-hitters: exactness regime, deterministic bounds,
error paths, and the Spark two-phase aggregate end-to-end."""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_spark.sketches import MisraGries, from_bytes
from hierarchical_bloom_filter_index_spark.sketches.base import MergeError

RNG = np.random.default_rng(11)


def test_exact_when_distinct_fits():
    """With <= k distinct keys MG is an exact counter (err_bound 0)."""
    data = np.repeat(np.arange(10, dtype=np.int64), [5, 1, 9, 2, 2, 7, 3, 1, 1, 4])
    RNG.shuffle(data)
    mg = MisraGries(k=16)
    for chunk in np.array_split(data, 5):
        mg.update(chunk)
    assert mg.err_bound() == 0.0
    keys, counts = np.unique(data, return_counts=True)
    assert np.array_equal(mg.estimate(keys), counts)
    assert mg.estimate(np.array([999]))[0] == 0


def test_weighted_update_matches_repeats():
    a, b = MisraGries(k=8), MisraGries(k=8)
    keys = np.array([3, 7, 9], dtype=np.int64)
    w = np.array([100, 5, 1], dtype=np.int64)
    a.update_weighted(keys, w)
    b.update(np.repeat(keys, w))
    assert a.n_total == b.n_total == 106
    assert np.array_equal(a.estimate(keys), b.estimate(keys))
    with pytest.raises(ValueError):
        a.update_weighted(keys, np.array([1, -2, 3]))


def test_serialization_roundtrip_and_empty():
    mg = MisraGries(k=32)
    mg.update(RNG.zipf(1.5, 5000).astype(np.int64))
    rt = from_bytes(mg.to_bytes())
    assert isinstance(rt, MisraGries)
    assert rt.k == mg.k and rt.n_total == mg.n_total
    assert np.array_equal(rt.keys, mg.keys) and np.array_equal(rt.counts, mg.counts)
    empty = from_bytes(MisraGries(k=32).to_bytes())
    assert empty.n_total == 0 and len(empty.keys) == 0
    assert len(empty.heavy_hitters(0.1)) == 0
    assert empty.estimate(np.array([1, 2])).tolist() == [0, 0]
    empty.update(np.empty(0, dtype=np.int64))
    assert empty.n_total == 0


def test_merge_incompatible_raises():
    a, b = MisraGries(k=8), MisraGries(k=16)
    with pytest.raises(MergeError):
        a.merge(b)
    from hierarchical_bloom_filter_index_spark.sketches import BottomKSampler

    with pytest.raises(MergeError):
        a.merge(BottomKSampler(k=8, seed=1))


def test_candidate_verify_is_exact():
    """The operational contract: MG candidates + one exact count over them
    reproduce the exact phi-heavy-hitter set."""
    data = RNG.zipf(1.2, 50_000).astype(np.int64)
    keys, counts = np.unique(data, return_counts=True)
    phi = 0.005
    truth = set(keys[counts >= phi * len(data)].tolist())
    mg = MisraGries.for_phi(phi)
    for chunk in np.array_split(data, 13):
        mg.update(chunk)
    cand = mg.heavy_hitters(phi)
    assert truth <= set(cand.tolist())
    # exact verification pass over candidates only
    exact = {int(c) for c in cand if int(counts[np.searchsorted(keys, c)]) >= phi * len(data)
             and keys[np.searchsorted(keys, c)] == c}
    assert exact == truth


def test_spark_two_phase_aggregate(spark):
    """Distributed partial -> shuffled merge equals a single-process MG's
    contract on the same stream (bounds, not bytes)."""
    from hierarchical_bloom_filter_index_spark.operators.aggregates import (
        collect_sketch,
        sketch_aggregate,
    )

    data = RNG.zipf(1.4, 40_000).astype(np.int64)
    keys, counts = np.unique(data, return_counts=True)
    df = spark.createDataFrame(
        [(int(i), chunk.tolist()) for i, chunk in enumerate(np.array_split(data, 64))],
        "id long, tokens array<long>",
    ).repartition(16)
    mg = collect_sketch(
        sketch_aggregate(df, "tokens", lambda: MisraGries(k=128), values_are_arrays=True)
    )
    assert mg.n_total == len(data)
    est = mg.estimate(keys)
    assert np.all(est <= counts)
    assert np.all(counts - est <= mg.err_bound() + 1e-9)
    phi = 0.004
    truth = set(keys[counts >= phi * len(data)].tolist())
    assert truth and truth <= set(mg.heavy_hitters(phi).tolist())


def test_refusal_when_uncertifiable_and_for_phi_never_refuses():
    """k too small for phi -> loud refusal (a dropped key could be heavy);
    for_phi sizing makes refusal impossible for any input."""
    mg = MisraGries(k=1)
    mg.update(np.array([0, 1], dtype=np.int64))
    assert mg.err_bound() >= 0.5 * mg.n_total
    with pytest.raises(ValueError):
        mg.heavy_hitters(0.5)
    sized = MisraGries.for_phi(0.5)
    assert sized.k + 1 > 2
    sized.update(np.array([0, 1], dtype=np.int64))
    assert {0, 1} <= set(sized.heavy_hitters(0.5).tolist())
    with pytest.raises(ValueError):
        MisraGries.for_phi(0.0)
