"""Probe/verify cost calibration — the reference measures ns-per-Bloom-probe
and ns-per-leaf-probe with micro-benchmark loops (PMIndex/HBI.java:39-40,
618-670) and feeds the constants to its cost functions. Our analog measures
the two vectorized kernels the router actually runs and returns per-unit
costs for plans.cost.choose_start_level's probe_cost/verify_cost knobs.
"""

from __future__ import annotations

import time

import numpy as np

from ..sketches.bloom import BloomFilter
from ..operators.probe import probe_blobs


def calibrate(n_filters: int = 2048, n_keys: int = 8, span: int = 64, reps: int = 5) -> dict:
    """Returns {'probe_cost': sec per window-probe, 'verify_cost': sec per
    token compared} measured on this machine (single core — the units cancel
    in the argmin, only the ratio matters)."""
    rng = np.random.default_rng(0)
    blobs = []
    for i in range(n_filters):
        bf = BloomFilter.for_capacity(span, 0.01, seed=7)
        bf.update(rng.integers(0, 1 << 40, span))
        blobs.append(bf.to_bytes())
    keys = rng.integers(0, 1 << 40, n_keys).astype(np.uint64)

    best_probe = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        probe_blobs(blobs, keys)
        best_probe = min(best_probe, (time.perf_counter() - t0) / n_filters)

    hay = rng.integers(0, 256, 1 << 20).astype(np.int64)
    pat = hay[500 : 500 + 16].copy()
    best_verify = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        win = np.lib.stride_tricks.sliding_window_view(hay, len(pat))
        (win == pat).all(axis=1).sum()
        best_verify = min(best_verify, (time.perf_counter() - t0) / len(hay))

    return {"probe_cost": best_probe, "verify_cost": best_verify,
            "ratio_probe_to_verify": best_probe / best_verify}
