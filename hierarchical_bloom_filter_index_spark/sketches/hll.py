"""HyperLogLog cardinality sketch (Flajolet et al. 2007), mergeable via max.

Standard error ~ 1.04/sqrt(m) with m = 2^p registers. Small-range correction
uses linear counting. Merge = elementwise register max — exactly associative
and commutative, the property the north_rule's shuffled-merge tests require.
Replaces the reference's fill-based distinct estimate
(membership/BloomFilter.java:61-66) as the primary cardinality sketch.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import base
from .hashing import bit_length_u64, hash64

_U64 = np.uint64
_MAGIC = 4
# Sparse-exact window node: an HLL whose content has few distinct keys is
# stored as the exact sorted distinct-token set (8 B/token) instead of the
# dense 2^p register array. Lossless: the register image of a token SET is
# a pure function of the set (scatter-max of per-token (idx, rho)), so
# densifying reproduces ``HyperLogLog.update(slice)`` byte-identically, and
# estimates from sparse nodes are EXACT counts. Representation is a pure
# function of content (sparse iff nnz <= sparse_max_nnz); nnz is monotone
# under union, so merge order independence and cross-build-path
# byte-equality are preserved.
# Wire: params [p, seed, nnz], arrays [tokens int64 SORTED ASC, distinct].
_MAGIC_HLL_SP = 13


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
        if bytes(buf)[:1] == bytes([_MAGIC_HLL_SP]):
            magic, (p, seed, _nnz), (toks,) = base.unpack(buf)
            out = cls(p, seed)
            out.update(toks)
            return out
        magic, (p, seed), (regs,) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC, "HyperLogLog")
        return cls(p, seed, regs)


# header bytes before the register array in the wire format: magic/version/
# n_params (4) + two int64 params (16) + n_arrays (1) + dtype/len (9)
_REG_OFFSET = 30
# 2^-rho for every possible register value (rho <= 64-p+1 < 256 by wire format)
_INV_POW2 = np.power(2.0, -np.arange(256, dtype=np.float64))


def sparse_max_nnz(p: int) -> int:
    """Largest distinct count at which the sparse set (8 B/token) is no
    bigger than the dense register array (1 B/register): the canonical
    representation rule — a node is sparse IFF nnz <= this."""
    return (1 << p) // 8


_HLL_SP_NNZ_OFFSET = 4 + 2 * 8
_HLL_SP_TOK_OFFSET = 4 + 3 * 8 + 1 + 9


def _sp_tokens(b: bytes) -> np.ndarray:
    (nnz,) = struct.unpack_from("<q", b, _HLL_SP_NNZ_OFFSET)
    return np.frombuffer(b, dtype=np.int64, count=nnz, offset=_HLL_SP_TOK_OFFSET)


def blob_p(b: bytes) -> int:
    """p of a dense OR sparse HLL node blob."""
    b = bytes(b)
    if b[0] not in (_MAGIC, _MAGIC_HLL_SP):
        raise ValueError(f"unknown sketch magic {b[0]} (expected HyperLogLog)")
    (p,) = struct.unpack_from("<q", b, 4)
    return int(p)


def blob_seed(b: bytes) -> int:
    """seed of a dense OR sparse HLL node blob."""
    b = bytes(b)
    if b[0] not in (_MAGIC, _MAGIC_HLL_SP):
        raise ValueError(f"unknown sketch magic {b[0]} (expected HyperLogLog)")
    (seed,) = struct.unpack_from("<q", b, 12)
    return int(seed)


def empty_blob(p: int, seed: int) -> bytes:
    """Canonical EMPTY node (sparse, nnz 0) — the identity of the merge.
    Used for a pair-query side whose range lies wholly beyond the data."""
    return base.pack(_MAGIC_HLL_SP, [p, seed, 0], [np.empty(0, np.int64)])


def _idx_rho(tokens: np.ndarray, p: int, seed: int):
    h = hash64(np.asarray(tokens, dtype=np.int64), seed)
    idx = (h >> _U64(64 - p)).astype(np.int64)
    low = h & ((_U64(1) << _U64(64 - p)) - _U64(1))
    rho = ((64 - p) - bit_length_u64(low) + 1).astype(np.uint8)
    return idx, rho


def densify_blob(b: bytes) -> bytes:
    """Dense-format bytes of any HLL node blob: identity on dense; on sparse
    the register image of the stored set — byte-identical to
    ``HyperLogLog.update`` over the same content."""
    b = bytes(b)
    if b[0] == _MAGIC:
        return b
    _, (p, seed, _nnz), (toks,) = base.unpack(b)
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(toks):
        idx, rho = _idx_rho(toks, p, seed)
        np.maximum.at(regs, idx, rho)
    return base.pack(_MAGIC, [p, seed], [regs])


def _pack_slot_blobs(tokens: np.ndarray, slots: np.ndarray, n_slots: int,
                     p: int, seed: int) -> list[bytes]:
    keys = np.asarray(tokens, dtype=np.int64)
    s = np.asarray(slots, dtype=np.int64)
    max_nnz = sparse_max_nnz(p)
    m = 1 << p
    if len(keys) == 0:
        empty = base.pack(_MAGIC_HLL_SP, [p, seed, 0], [np.empty(0, np.int64)])
        return [empty] * n_slots
    # distinct (slot, token) pairs, sorted — one lexsort for the whole
    # batch (the shared canonical-dedup primitive; counts unused here)
    from .cms import _unique_slot_pairs

    u_tok, _u_cnt, u_slot, nnz = _unique_slot_pairs(keys, s, n_slots)
    bounds = np.zeros(n_slots + 1, dtype=np.int64)
    np.cumsum(nnz, out=bounds[1:])
    dense_slots = np.flatnonzero(nnz > max_nnz)
    if len(dense_slots):
        drow = np.full(n_slots, -1, dtype=np.int64)
        drow[dense_slots] = np.arange(len(dense_slots))
        sel = drow[u_slot] >= 0
        idx, rho = _idx_rho(u_tok[sel], p, seed)
        regs = np.zeros(len(dense_slots) * m, dtype=np.uint8)
        np.maximum.at(regs, drow[u_slot[sel]] * m + idx, rho)
    out: list[bytes] = []
    for i in range(n_slots):
        if nnz[i] > max_nnz:
            r = drow[i]
            out.append(base.pack(_MAGIC, [p, seed], [regs[r * m : (r + 1) * m]]))
        else:
            sl = slice(bounds[i], bounds[i + 1])
            out.append(base.pack(_MAGIC_HLL_SP, [p, seed, int(nnz[i])], [u_tok[sl]]))
    return out


def leaf_window_blobs(tokens: np.ndarray, window: int, p: int, seed: int,
                      phase: int = 0) -> list[bytes]:
    """Serialized HLL nodes for every consecutive ``window``-token slice of
    ``tokens`` in one lexsort pass. Each window is stored in CANONICAL form:
    the exact sorted distinct-token set while nnz <= sparse_max_nnz
    (lossless — see densify_blob), dense registers otherwise.

    ``phase`` (0 <= phase < window): the stream offset of tokens[0] WITHIN
    its window — for global-axis builds where a doc starts mid-window, the
    first blob covers only ``window - phase`` tokens; blob i is then the
    PARTIAL sketch of stream window ``tokens0_w + i`` (merge partials of
    the same w_id across docs to finish the window)."""
    n = len(tokens)
    if n == 0:
        return []
    nw = (phase + n + window - 1) // window
    w = (phase + np.arange(n, dtype=np.int64)) // window
    return _pack_slot_blobs(tokens, w, nw, p, seed)


def partial_blobs_by_slot(tokens: np.ndarray, slots: np.ndarray, n_slots: int,
                          p: int, seed: int) -> list[bytes]:
    """Serialized HLL nodes for an ARBITRARY per-token slot assignment: the
    cross-doc generalization of ``leaf_window_blobs`` — a whole Arrow batch
    of docs' phase-aligned window partials builds in ONE kernel call (slot =
    running partial index across the batch), instead of a per-doc Python
    loop. Blob i covers exactly the tokens whose slot == i, in the same
    canonical sparse/dense form as every other build path."""
    return _pack_slot_blobs(tokens, slots, n_slots, p, seed)


def estimate_blobs(blobs: list[bytes], p: int) -> np.ndarray:
    """Cardinality estimates for a batch of serialized HLLs in one
    vectorized pass — same math as ``HyperLogLog.estimate()`` (bias-corrected
    harmonic mean + linear-counting small-range correction), without
    per-blob object construction."""
    if not blobs:
        return np.empty(0, dtype=np.float64)
    m = 1 << p
    blobs = [bytes(b) for b in blobs]
    out = np.empty(len(blobs), dtype=np.float64)
    is_sp = np.fromiter((b[0] == _MAGIC_HLL_SP for b in blobs), dtype=bool, count=len(blobs))
    for i in np.flatnonzero(is_sp):
        # sparse node: the stored set is exact — zero-error estimate (one
        # fixed-offset header read per blob, no register pass)
        out[i] = float(struct.unpack_from("<q", blobs[i], _HLL_SP_NNZ_OFFSET)[0])
    dn = np.flatnonzero(~is_sp)
    if len(dn) == 0:
        return out
    mats = np.empty((len(dn), m), dtype=np.uint8)
    for j, i in enumerate(dn):
        b = blobs[i]
        if b[0] != _MAGIC:
            raise ValueError(f"unknown sketch magic {b[0]} (expected HyperLogLog)")
        mats[j] = np.frombuffer(b, dtype=np.uint8, count=m, offset=_REG_OFFSET)
    # chunk the float scratch: a single np.power over the full matrix
    # allocates 8x the register bytes and pays first-touch page faults on
    # every call in a fresh worker (profiled: 13s first call at 10k x 4096);
    # a 2^-rho lookup table + bounded gather keeps scratch cache-resident
    inv_sum = np.empty(len(dn), dtype=np.float64)
    zeros = np.empty(len(dn), dtype=np.int64)
    chunk = max(1, (4 << 20) // (8 * m))
    for s in range(0, len(dn), chunk):
        part = mats[s : s + chunk]
        inv_sum[s : s + chunk] = _INV_POW2[part].sum(axis=1)
        zeros[s : s + chunk] = (part == 0).sum(axis=1)
    e = _alpha(m) * m * m / inv_sum
    small = (e <= 2.5 * m) & (zeros > 0)
    if small.any():
        e[small] = m * np.log(m / zeros[small])
    out[dn] = e
    return out


def merge_blob_groups(blobs: list[bytes], counts: np.ndarray, p: int) -> list[bytes]:
    """Merge consecutive groups of serialized HLL nodes (group i = the next
    ``counts[i]`` blobs), sparse/dense mixed. Sparse children union their
    sets; the output stays sparse while the union's nnz <= sparse_max_nnz
    and no child had densified (equivalent by nnz monotonicity — the
    canonical content rule, hence order-independent). Dense outputs are
    byte-identical to the all-dense pipeline (register max over the same
    element images). All blobs must share (p, seed) (true by construction
    inside one index level)."""
    if not blobs:
        return []
    m = 1 << p
    blobs = [bytes(b) for b in blobs]
    counts = np.asarray(counts, dtype=np.int64)
    ngroups = len(counts)
    is_sp = np.fromiter((b[0] == _MAGIC_HLL_SP for b in blobs), dtype=bool, count=len(blobs))
    if not is_sp.any():
        mats = np.empty((len(blobs), m), dtype=np.uint8)
        for i, b in enumerate(blobs):
            if b[0] != _MAGIC:
                raise ValueError(f"unknown sketch magic {b[0]} (expected HyperLogLog)")
            mats[i] = np.frombuffer(b, dtype=np.uint8, count=m, offset=_REG_OFFSET)
        merged = base.grouped_reduce(np.maximum, mats, counts)
        header = bytes(blobs[0][:_REG_OFFSET])
        return [header + merged[i].tobytes() for i in range(merged.shape[0])]
    max_nnz = sparse_max_nnz(p)
    (seed,) = struct.unpack_from("<q", blobs[0], 12)
    gid = np.repeat(np.arange(ngroups, dtype=np.int64), counts)
    sp_idx = np.flatnonzero(is_sp)
    toks = [_sp_tokens(blobs[i]) for i in sp_idx]
    sp_tok = np.concatenate(toks) if toks else np.empty(0, np.int64)
    sp_gid = np.repeat(gid[sp_idx], [len(t) for t in toks])
    if len(sp_tok):
        from .cms import _unique_slot_pairs

        u_tok, _u_cnt, u_gid, g_nnz = _unique_slot_pairs(sp_tok, sp_gid, ngroups)
    else:
        u_tok = u_gid = np.empty(0, np.int64)
        g_nnz = np.zeros(ngroups, dtype=np.int64)
    g_nnz = np.asarray(g_nnz, dtype=np.int64)
    has_dense = np.bincount(gid[~is_sp], minlength=ngroups) > 0
    out_sparse = (~has_dense) & (g_nnz <= max_nnz)
    dense_groups = np.flatnonzero(~out_sparse)
    drow = np.full(ngroups, -1, dtype=np.int64)
    if len(dense_groups):
        drow[dense_groups] = np.arange(len(dense_groups))
        acc = np.zeros((len(dense_groups), m), dtype=np.uint8)
        dn_idx = np.flatnonzero(~is_sp)
        if len(dn_idx):
            mats = np.empty((len(dn_idx), m), dtype=np.uint8)
            for j, i in enumerate(dn_idx):
                mats[j] = np.frombuffer(blobs[i], dtype=np.uint8, count=m, offset=_REG_OFFSET)
            np.maximum.at(acc, drow[gid[dn_idx]], mats)
        if len(u_gid):
            sel = drow[u_gid] >= 0
            if sel.any():
                idx, rho = _idx_rho(u_tok[sel], p, seed)
                np.maximum.at(acc, (drow[u_gid[sel]], idx), rho)
    sp_bounds = np.zeros(ngroups + 1, dtype=np.int64)
    np.cumsum(g_nnz, out=sp_bounds[1:])
    out: list[bytes] = []
    for g in range(ngroups):
        if out_sparse[g]:
            sl = slice(sp_bounds[g], sp_bounds[g + 1])
            out.append(base.pack(_MAGIC_HLL_SP, [p, seed, int(g_nnz[g])], [u_tok[sl]]))
        else:
            out.append(base.pack(_MAGIC, [p, seed], [acc[drow[g]]]))
    return out


def is_sparse_blob(b: bytes) -> bool:
    """True iff the node stores its exact distinct set (estimates from it
    are zero-error).  The public regime probe callers use to CLAIM
    exactness (keystats.key_setops, sessions.rolling_distinct_daily)."""
    b = bytes(b)
    if b[0] not in (_MAGIC, _MAGIC_HLL_SP):
        raise ValueError(f"unknown sketch magic {b[0]} (expected HyperLogLog)")
    return b[0] == _MAGIC_HLL_SP
