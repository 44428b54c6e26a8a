"""HyperLogLog cardinality sketch (Flajolet et al. 2007), mergeable via max.

Standard error ~ 1.04/sqrt(m) with m = 2^p registers. Small-range correction
uses linear counting. Merge = elementwise register max — exactly associative
and commutative, the property the north_rule's shuffled-merge tests require.
Replaces the reference's fill-based distinct estimate
(membership/BloomFilter.java:61-66) as the primary cardinality sketch.
"""

from __future__ import annotations

import math

import numpy as np

from . import base
from .hashing import bit_length_u64, hash64

_U64 = np.uint64
_MAGIC = 4


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog:
    MAGIC = _MAGIC
    __slots__ = ("p", "seed", "regs")

    def __init__(self, p: int, seed: int, regs: np.ndarray | None = None):
        if not (4 <= p <= 18):
            raise ValueError(f"p must be in [4,18], got {p}")
        self.p = int(p)
        self.seed = int(seed)
        self.regs = np.zeros(1 << self.p, dtype=np.uint8) if regs is None else regs

    @property
    def m(self) -> int:
        return 1 << self.p

    def rel_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def update(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        h = hash64(keys, self.seed)
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        low = h & ((_U64(1) << _U64(64 - self.p)) - _U64(1))
        # rho = leading-zero count of the low (64-p) bits, + 1
        rho = ((64 - self.p) - bit_length_u64(low) + 1).astype(np.uint8)
        np.maximum.at(self.regs, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        base.check_same_type(self, other)
        base.check_compatible(
            "HyperLogLog", {"p": self.p, "seed": self.seed}, {"p": other.p, "seed": other.seed}
        )
        return HyperLogLog(self.p, self.seed, np.maximum(self.regs, other.regs))

    def estimate(self) -> float:
        m = self.m
        inv_sum = np.power(2.0, -self.regs.astype(np.float64)).sum()
        e = _alpha(m) * m * m / inv_sum
        if e <= 2.5 * m:
            zeros = int((self.regs == 0).sum())
            if zeros > 0:
                return m * math.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return base.pack(_MAGIC, [self.p, self.seed], [self.regs])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HyperLogLog":
        magic, (p, seed), (regs,) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC, "HyperLogLog")
        return cls(p, seed, regs)


# header bytes before the register array in the wire format: magic/version/
# n_params (4) + two int64 params (16) + n_arrays (1) + dtype/len (9)
_REG_OFFSET = 30
# 2^-rho for every possible register value (rho <= 64-p+1 < 256 by wire format)
_INV_POW2 = np.power(2.0, -np.arange(256, dtype=np.float64))


def leaf_window_blobs(tokens: np.ndarray, window: int, p: int, seed: int,
                      phase: int = 0) -> list[bytes]:
    """Serialized HLLs for every consecutive ``window``-token slice of
    ``tokens`` in ONE hash pass + ONE scatter-max — no per-window python
    objects (the naive loop was the leaf-build hotspot: tens of thousands of
    4 KB register allocations per partition). Byte-identical to
    ``HyperLogLog(p, seed).update(slice).to_bytes()`` per window.

    ``phase`` (0 <= phase < window): the stream offset of tokens[0] WITHIN
    its window — for global-axis builds where a doc starts mid-window, the
    first blob covers only ``window - phase`` tokens; blob i is then the
    PARTIAL sketch of stream window ``tokens0_w + i`` (merge partials of
    the same w_id across docs to finish the window)."""
    n = len(tokens)
    if n == 0:
        return []
    m = 1 << p
    nw = (phase + n + window - 1) // window
    h = hash64(np.asarray(tokens, dtype=np.int64), seed)
    idx = (h >> _U64(64 - p)).astype(np.int64)
    low = h & ((_U64(1) << _U64(64 - p)) - _U64(1))
    rho = ((64 - p) - bit_length_u64(low) + 1).astype(np.uint8)
    w = (phase + np.arange(n, dtype=np.int64)) // window
    regs = np.zeros(nw * m, dtype=np.uint8)
    np.maximum.at(regs, w * m + idx, rho)
    return [base.pack(_MAGIC, [p, seed], [regs[i * m : (i + 1) * m]]) for i in range(nw)]


def partial_blobs_by_slot(tokens: np.ndarray, slots: np.ndarray, n_slots: int,
                          p: int, seed: int) -> list[bytes]:
    """Serialized HLLs for an ARBITRARY per-token slot assignment: one hash
    pass + one scatter-max covers every slot at once. This is the cross-doc
    generalization of ``leaf_window_blobs`` — a whole Arrow batch of docs'
    phase-aligned window partials builds in ONE kernel call (slot = running
    partial index across the batch), instead of a per-doc Python loop.
    Blob i is byte-identical to an HLL updated with exactly the tokens whose
    slot == i, so per-doc and batched builds produce the same partials."""
    m = 1 << p
    regs = np.zeros(n_slots * m, dtype=np.uint8)
    if len(tokens):
        h = hash64(np.asarray(tokens, dtype=np.int64), seed)
        idx = (h >> _U64(64 - p)).astype(np.int64)
        low = h & ((_U64(1) << _U64(64 - p)) - _U64(1))
        rho = ((64 - p) - bit_length_u64(low) + 1).astype(np.uint8)
        np.maximum.at(regs, np.asarray(slots, dtype=np.int64) * m + idx, rho)
    return [base.pack(_MAGIC, [p, seed], [regs[i * m : (i + 1) * m]]) for i in range(n_slots)]


def estimate_blobs(blobs: list[bytes], p: int) -> np.ndarray:
    """Cardinality estimates for a batch of serialized HLLs in one
    vectorized pass — same math as ``HyperLogLog.estimate()`` (bias-corrected
    harmonic mean + linear-counting small-range correction), without
    per-blob object construction."""
    if not blobs:
        return np.empty(0, dtype=np.float64)
    m = 1 << p
    mats = np.empty((len(blobs), m), dtype=np.uint8)
    for i, b in enumerate(blobs):
        if b[0] != _MAGIC:
            raise ValueError(f"unknown sketch magic {b[0]} (expected HyperLogLog)")
        mats[i] = np.frombuffer(b, dtype=np.uint8, count=m, offset=_REG_OFFSET)
    # chunk the float scratch: a single np.power over the full matrix
    # allocates 8x the register bytes and pays first-touch page faults on
    # every call in a fresh worker (profiled: 13s first call at 10k x 4096);
    # a 2^-rho lookup table + bounded gather keeps scratch cache-resident
    inv_sum = np.empty(len(blobs), dtype=np.float64)
    zeros = np.empty(len(blobs), dtype=np.int64)
    chunk = max(1, (4 << 20) // (8 * m))
    for s in range(0, len(blobs), chunk):
        part = mats[s : s + chunk]
        inv_sum[s : s + chunk] = _INV_POW2[part].sum(axis=1)
        zeros[s : s + chunk] = (part == 0).sum(axis=1)
    e = _alpha(m) * m * m / inv_sum
    small = (e <= 2.5 * m) & (zeros > 0)
    if small.any():
        e[small] = m * np.log(m / zeros[small])
    return e


def merge_blob_groups(blobs: list[bytes], counts: np.ndarray, p: int) -> list[bytes]:
    """Merge consecutive groups of serialized HLLs (group i = the next
    ``counts[i]`` blobs) in one vectorized register-max — the rollup's
    parent-from-children step without per-parent object churn. All blobs
    must share (p, seed) (true by construction inside one index level);
    magic is checked, byte-identity with .merge() holds (register max is the
    merge)."""
    if not blobs:
        return []
    m = 1 << p
    mats = np.empty((len(blobs), m), dtype=np.uint8)
    for i, b in enumerate(blobs):
        if b[0] != _MAGIC:
            raise ValueError(f"unknown sketch magic {b[0]} (expected HyperLogLog)")
        mats[i] = np.frombuffer(b, dtype=np.uint8, count=m, offset=_REG_OFFSET)
    merged = base.grouped_reduce(np.maximum, mats, counts)
    header = bytes(blobs[0][:_REG_OFFSET])
    return [header + merged[i].tobytes() for i in range(merged.shape[0])]
