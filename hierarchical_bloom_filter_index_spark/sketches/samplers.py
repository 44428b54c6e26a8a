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
