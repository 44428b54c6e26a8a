"""Mergeable distinct-item samplers: HOPS (one-permutation bucket sampler)
and BottomK, reference-parity components.

HOPS (estimators/HOPS.java:41-82,163-194): B = 2^b buckets; each key's single
64-bit hash supplies both its bucket (top b bits) and its priority (low bits);
each bucket keeps the minimum-priority representative key. Merge = elementwise
min-priority — associative/commutative (same seed & B required, mirroring
HOPS.mergeFrom's checks).

BottomK (estimators/BottomKSampler.java:17-58): the k distinct keys with the
smallest hash priorities — a uniform distinct-item sample. Merge = union then
re-take bottom k.
"""

from __future__ import annotations

import struct

import numpy as np

from . import base
from .hashing import hash64

_U64 = np.uint64
_MAGIC_HOPS = 6
_MAGIC_BOTTOMK = 7
_EMPTY_PRIO = np.uint64(0xFFFFFFFFFFFFFFFF)


class HopsSampler:
    MAGIC = _MAGIC_HOPS
    __slots__ = ("b", "seed", "rep_key", "rep_prio")

    def __init__(self, b: int, seed: int, rep_key: np.ndarray | None = None, rep_prio: np.ndarray | None = None):
        if not (1 <= b <= 24):
            raise ValueError("b (log2 buckets) must be in [1,24]")
        self.b = int(b)
        self.seed = int(seed)
        n = 1 << self.b
        self.rep_key = np.zeros(n, dtype=np.uint64) if rep_key is None else rep_key
        self.rep_prio = np.full(n, _EMPTY_PRIO, dtype=np.uint64) if rep_prio is None else rep_prio

    @property
    def n_buckets(self) -> int:
        return 1 << self.b

    def update(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        keys = np.asarray(keys)
        if keys.dtype != np.uint64:
            keys = keys.astype(np.int64).astype(np.uint64)
        h = hash64(keys, self.seed)
        bucket = (h >> _U64(64 - self.b)).astype(np.int64)
        prio = h & ((_U64(1) << _U64(64 - self.b)) - _U64(1))
        # two-pass vectorized argmin-per-bucket: min prio, then recover the key
        np.minimum.at(self.rep_prio, bucket, prio)
        winners = prio == self.rep_prio[bucket]
        self.rep_key[bucket[winners]] = keys[winners]

    def merge(self, other: "HopsSampler") -> "HopsSampler":
        base.check_same_type(self, other)
        base.check_compatible("HopsSampler", {"b": self.b, "seed": self.seed}, {"b": other.b, "seed": other.seed})
        take_other = other.rep_prio < self.rep_prio
        return HopsSampler(
            self.b,
            self.seed,
            np.where(take_other, other.rep_key, self.rep_key),
            np.where(take_other, other.rep_prio, self.rep_prio),
        )

    def representatives(self) -> np.ndarray:
        """Distinct-key sample: representative key of every occupied bucket."""
        return self.rep_key[self.rep_prio != _EMPTY_PRIO]

    def occupancy(self) -> int:
        return int((self.rep_prio != _EMPTY_PRIO).sum())

    def to_bytes(self) -> bytes:
        return base.pack(_MAGIC_HOPS, [self.b, self.seed], [self.rep_key, self.rep_prio])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HopsSampler":
        magic, (b, seed), (rep_key, rep_prio) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC_HOPS, "HopsSampler")
        return cls(b, seed, rep_key, rep_prio)


class BottomKSampler:
    MAGIC = _MAGIC_BOTTOMK
    __slots__ = ("k", "seed", "keys", "prios")

    def __init__(self, k: int, seed: int, keys: np.ndarray | None = None, prios: np.ndarray | None = None):
        self.k = int(k)
        self.seed = int(seed)
        self.keys = np.empty(0, dtype=np.uint64) if keys is None else keys
        self.prios = np.empty(0, dtype=np.uint64) if prios is None else prios

    def _take_bottom(self, keys: np.ndarray, prios: np.ndarray) -> None:
        # priorities are a pure function of the key, so distinct priorities
        # <=> distinct keys (up to negligible 64-bit collisions)
        prios, idx = np.unique(prios, return_index=True)
        keys = keys[idx]
        if len(prios) > self.k:
            keys, prios = keys[: self.k], prios[: self.k]
        self.keys, self.prios = keys, prios

    def update(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        keys = np.asarray(keys)
        if keys.dtype != np.uint64:
            keys = keys.astype(np.int64).astype(np.uint64)
        prio = hash64(keys, self.seed)
        self._take_bottom(np.concatenate([self.keys, keys]), np.concatenate([self.prios, prio]))

    def merge(self, other: "BottomKSampler") -> "BottomKSampler":
        base.check_same_type(self, other)
        base.check_compatible("BottomKSampler", {"k": self.k, "seed": self.seed}, {"k": other.k, "seed": other.seed})
        out = BottomKSampler(self.k, self.seed)
        out._take_bottom(
            np.concatenate([self.keys, other.keys]), np.concatenate([self.prios, other.prios])
        )
        return out

    def sample(self) -> np.ndarray:
        return self.keys.copy()

    def estimate_distinct(self) -> float:
        """Bottom-k cardinality estimate: (k-1) / u_k with u_k = k-th smallest
        normalized priority (standard order-statistics estimator)."""
        if len(self.prios) < self.k:
            return float(len(self.prios))
        u_k = float(self.prios[self.k - 1]) / 2.0**64
        return (self.k - 1) / u_k if u_k > 0 else float("inf")

    def to_bytes(self) -> bytes:
        return base.pack(_MAGIC_BOTTOMK, [self.k, self.seed], [self.keys, self.prios])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BottomKSampler":
        magic, (k, seed), (keys, prios) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC_BOTTOMK, "BottomKSampler")
        return cls(k, seed, keys, prios)


# ---------------------------------------------------------------------------
# Window-index kernels (blob-level, vectorized) — the BottomK member of the
# window-sketch family (rollup.window_sketch_family "bk").
#
# Wire format: EXACTLY ``BottomKSampler.to_bytes()`` (magic 7, params
# [k, seed], arrays [keys uint64, prios uint64], entries sorted by priority
# ascending), so every window node round-trips through the object path
# unchanged.
#
# Merge discipline: a group merge is "union of all children's (key, prio)
# entries, dedupe by priority, keep the k smallest". The priority is a pure
# function of the key, so the node is a PURE FUNCTION of its window's
# DISTINCT-token set — child order never changes the bytes, and
# bottom-k(A ∪ B) is exactly recoverable from bottom-k(A) ∪ bottom-k(B)
# (classic bottom-k mergeability, reference BottomKSampler.java:17-58's
# merge generalized to groups). Hence every rolled-up node is the EXACT
# bottom-k distinct sample of its window, and a dyadic range merge is the
# EXACT bottom-k of the range's distinct tokens — VALUE-checkable in SQL
# via the bit-exact splitmix64 twin (__spark_entry__._splitmix_ctes).
# ---------------------------------------------------------------------------

# magic B | version B | n_params H | k q | seed q | n_arrays B
# | keys: dtype B, len Q, data | prios: dtype B, len Q, data
_BK_K_OFF = 4
_BK_NNZ_OFF = 22
_BK_KEYS_OFF = 30


def _bk_entries(b: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(keys, prios) of a BottomK node blob without base.unpack overhead."""
    (nnz,) = struct.unpack_from("<Q", b, _BK_NNZ_OFF)
    keys = np.frombuffer(b, dtype=np.uint64, count=nnz, offset=_BK_KEYS_OFF)
    prios = np.frombuffer(b, dtype=np.uint64, count=nnz,
                          offset=_BK_KEYS_OFF + 8 * nnz + 9)
    return keys, prios


def _check_bk_blob(b: bytes, k: int, seed: int) -> None:
    if b[0] != _MAGIC_BOTTOMK:
        raise ValueError(f"unknown sketch magic {b[0]} (expected BottomKSampler)")
    bk, bseed = struct.unpack_from("<qq", b, _BK_K_OFF)
    if bk != k or bseed != seed:
        raise ValueError(f"BottomK blob (k={bk}, seed={bseed}) != (k={k}, seed={seed})")


def blob_params(b: bytes) -> tuple[int, int]:
    """(k, seed) of a BottomK node blob (uniform per index by construction)."""
    b = bytes(b)
    if b[0] != _MAGIC_BOTTOMK:
        raise ValueError(f"unknown sketch magic {b[0]} (expected BottomKSampler)")
    k, seed = struct.unpack_from("<qq", b, _BK_K_OFF)
    return int(k), int(seed)


def _dedup_truncate(gids: np.ndarray, keys: np.ndarray, prios: np.ndarray,
                    n_groups: int, k: int, seed: int) -> list[bytes]:
    """Per group: dedupe entries by priority, sort ascending, keep the k
    smallest, pack. Stable lexsort keeps the FIRST occurrence among equal
    (group, prio) — the same tie rule as BottomKSampler._take_bottom's
    np.unique(return_index) (only reachable under a 64-bit hash collision)."""
    if len(keys):
        order = np.lexsort((prios, gids))
        gg, hh, kk = gids[order], prios[order], keys[order]
        first = np.empty(len(gg), dtype=bool)
        first[0] = True
        first[1:] = (gg[1:] != gg[:-1]) | (hh[1:] != hh[:-1])
        gg, hh, kk = gg[first], hh[first], kk[first]
        nnz = np.bincount(gg, minlength=n_groups)
    else:
        hh = kk = np.empty(0, np.uint64)
        nnz = np.zeros(n_groups, dtype=np.int64)
    bounds = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(nnz, out=bounds[1:])
    out: list[bytes] = []
    for g in range(n_groups):
        lo = bounds[g]
        hi = min(bounds[g + 1], lo + k)
        out.append(base.pack(_MAGIC_BOTTOMK, [k, seed], [kk[lo:hi], hh[lo:hi]]))
    return out


def leaf_window_blobs(tokens: np.ndarray, window: int, k: int, seed: int,
                      phase: int = 0) -> list[bytes]:
    """Serialized BottomK nodes for every consecutive ``window``-token slice
    of ``tokens`` (leaf-index shape of cms.leaf_window_blobs) — each node the
    EXACT bottom-k distinct sample of its window. ``phase`` = stream offset
    of tokens[0] within its window (global-axis partials)."""
    n = len(tokens)
    if n == 0:
        return []
    nw = (phase + n + window - 1) // window
    w = (phase + np.arange(n, dtype=np.int64)) // window
    return partial_blobs_by_slot(tokens, w, nw, k, seed)


def partial_blobs_by_slot(tokens: np.ndarray, slots: np.ndarray, n_slots: int,
                          k: int, seed: int) -> list[bytes]:
    """BottomK nodes for an arbitrary per-token slot assignment (the
    cross-doc global-leaf primitive — see cms.partial_blobs_by_slot)."""
    toks = np.asarray(tokens)
    if toks.dtype != np.uint64:
        toks = toks.astype(np.int64).astype(np.uint64)
    s = np.asarray(slots, dtype=np.int64)
    if len(toks) == 0:
        e = np.empty(0, np.uint64)
        return [base.pack(_MAGIC_BOTTOMK, [k, seed], [e, e])] * n_slots
    return _dedup_truncate(s, toks, hash64(toks, seed), n_slots, k, seed)


def merge_blob_groups(blobs: list[bytes], counts: np.ndarray, k: int,
                      seed: int) -> list[bytes]:
    """Merge consecutive groups of BottomK node blobs (group i = the next
    ``counts[i]`` blobs): union, dedupe by priority, keep the k smallest —
    byte-deterministic in the group's child multiset (order-free)."""
    if not blobs:
        return []
    blobs = [bytes(b) for b in blobs]
    counts = np.asarray(counts, dtype=np.int64)
    for b in blobs:
        _check_bk_blob(b, k, seed)
    gid = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    pairs = [_bk_entries(b) for b in blobs]
    lens = [len(t) for t, _ in pairs]
    if sum(lens):
        all_k = np.concatenate([t for t, _ in pairs])
        all_h = np.concatenate([h for _, h in pairs])
    else:
        all_k = all_h = np.empty(0, np.uint64)
    return _dedup_truncate(np.repeat(gid, lens), all_k, all_h, len(counts), k, seed)


def sample_blob_tokens(blobs: list[bytes]) -> list[np.ndarray]:
    """Per blob: the sampled keys as int64 tokens, priority-ascending — the
    EXACT bottom-k distinct sample of the node's window."""
    out: list[np.ndarray] = []
    for b in blobs:
        b = bytes(b)
        if not b or b[0] != _MAGIC_BOTTOMK:
            raise ValueError(
                f"unknown sketch magic {b[0] if b else '<empty>'} (expected BottomKSampler)")
        out.append(_bk_entries(b)[0].astype(np.int64))
    return out


def jaccard_blobs(blobs_a: list[bytes], blobs_b: list[bytes], k: int,
                  seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pairwise bottom-k (KMV) Jaccard state for blobs_a[i] vs blobs_b[i]:
    (n_sample, n_match, est_jaccard) per pair, where

    * merged  = bottom-k(A ∪ B), recovered losslessly from the two node
      samples (classic KMV union mergeability),
    * n_sample = |merged| (<= k; < k iff the union has < k distinct tokens,
      in which case everything below is EXACT),
    * n_match  = |{e in merged : e in sample(A) and e in sample(B)}| — sound
      because an entry of bottom-k(A ∪ B) that belongs to A necessarily
      belongs to bottom-k(A) (fewer A-priorities precede it than union
      priorities, and those number < k),
    * est_jaccard = n_match / n_sample, the standard KMV Jaccard estimator.

    All three outputs are DETERMINISTIC VALUES (pure functions of the two
    windows' distinct-token sets through the seed-fixed priority hash), so
    they are SQL-oracle-checkable in every regime — exactness of the
    estimate itself additionally needs n_sample < k."""
    if len(blobs_a) != len(blobs_b):
        raise ValueError("jaccard needs equal-length blob lists")
    n = len(blobs_a)
    n_sample = np.zeros(n, dtype=np.int64)
    n_match = np.zeros(n, dtype=np.int64)
    est = np.zeros(n, dtype=np.float64)
    for i, (ba, bb) in enumerate(zip(blobs_a, blobs_b)):
        ba, bb = bytes(ba), bytes(bb)
        _check_bk_blob(ba, k, seed)
        _check_bk_blob(bb, k, seed)
        ka, pa = _bk_entries(ba)
        kb, pb = _bk_entries(bb)
        prios = np.concatenate([pa, pb])
        if len(prios) == 0:
            continue
        keys = np.concatenate([ka, kb])
        u_prios, idx = np.unique(prios, return_index=True)
        u_keys = keys[idx][:k]
        m = len(u_keys)
        x = int((np.isin(u_keys, ka) & np.isin(u_keys, kb)).sum())
        n_sample[i] = m
        n_match[i] = x
        est[i] = x / m
    return n_sample, n_match, est


def estimate_distinct_blobs(blobs: list[bytes]) -> np.ndarray:
    """Bottom-k (KMV) cardinality estimate per blob — the blob-level twin of
    BottomKSampler.estimate_distinct (same order-statistics formula)."""
    out = np.empty(len(blobs), dtype=np.float64)
    for i, b in enumerate(blobs):
        b = bytes(b)
        (k,) = struct.unpack_from("<q", b, _BK_K_OFF)
        _keys, prios = _bk_entries(b)
        if len(prios) < k:
            out[i] = float(len(prios))
        else:
            u_k = float(prios[k - 1]) / 2.0**64
            out[i] = (k - 1) / u_k if u_k > 0 else float("inf")
    return out
