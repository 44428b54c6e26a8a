"""Mergeable Bloom filter with fill-based FPR / cardinality metadata.

Sizing follows the classical formulas the reference uses
(membership/BloomFilter.java:23-35): ``m = ceil(-n ln p / ln^2 2)``,
``k = max(1, round(m/n * ln 2))``; double hashing ``idx_i = h1 + i*h2``
(membership/BloomFilter.java:69-173). Unlike the reference — whose per-level
filters are singletons and never merged — this filter MUST merge (bitwise OR)
because Spark builds per-partition partials that are OR-reduced per window
(two-phase partial+final aggregation). Merge requires identical (m, k, seed).

Fill-based achieved FPR and distinct estimates mirror
membership/BloomFilter.java:52-66 and feed the query router's cost model.
"""

from __future__ import annotations

import math

import numpy as np

from . import base
from .hashing import hash64, popcount_u64

_U64 = np.uint64
_MAGIC = 1
_STRIDE_SEED_XOR = 0x5851F42D4C957F2D


def design(n: int, p: float) -> tuple[int, int]:
    """(m_bits, k) for expected n distinct keys at design FPR p."""
    if not (0.0 < p < 1.0):
        raise ValueError(f"fpr must be in (0,1), got {p}")
    n = max(1, int(n))
    m = max(64, math.ceil(-n * math.log(p) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    return m, k


class BloomFilter:
    MAGIC = _MAGIC
    __slots__ = ("m", "k", "seed", "words", "n_added")

    def __init__(self, m: int, k: int, seed: int, words: np.ndarray | None = None, n_added: int = 0):
        self.m = int(m)
        self.k = int(k)
        self.seed = int(seed)
        n_words = (self.m + 63) // 64
        self.words = np.zeros(n_words, dtype=np.uint64) if words is None else words
        self.n_added = int(n_added)

    @classmethod
    def for_capacity(cls, n: int, p: float, seed: int) -> "BloomFilter":
        m, k = design(n, p)
        return cls(m, k, seed)

    def _hashes(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(h1, h2) double-hashing bases — reusable across filters that share
        this seed (e.g. all levels of the hierarchical index hash each key
        once; per-filter positions then differ only by the modulus)."""
        h1 = hash64(keys, self.seed)
        h2 = hash64(keys, self.seed ^ _STRIDE_SEED_XOR) | _U64(1)  # odd stride
        return h1, h2

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit positions via double hashing (vectorized)."""
        h1, h2 = self._hashes(keys)
        return self.positions_from_hashes(h1, h2)

    def positions_from_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) % _U64(self.m)

    def update(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.words, (pos >> _U64(6)).astype(np.int64), _U64(1) << (pos & _U64(63)))
        self.n_added += len(keys)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe: bool array, true = maybe present."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        bits = (self.words[(pos >> _U64(6)).astype(np.int64)] >> (pos & _U64(63))) & _U64(1)
        return bits.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        base.check_same_type(self, other)
        base.check_compatible(
            "BloomFilter",
            {"m": self.m, "k": self.k, "seed": self.seed},
            {"m": other.m, "k": other.k, "seed": other.seed},
        )
        return BloomFilter(self.m, self.k, self.seed, self.words | other.words, self.n_added + other.n_added)

    # --- metadata for the cost model -------------------------------------
    def bits_set(self) -> int:
        return popcount_u64(self.words)

    def fill_fpr(self) -> float:
        """Achieved FPR from fill ratio: rho^k (membership/BloomFilter.java:52-57)."""
        rho = self.bits_set() / self.m
        return rho**self.k

    def estimate_distinct(self) -> float:
        """Cardinality from fill: -(m/k) ln(1-rho) (membership/BloomFilter.java:61-66)."""
        rho = self.bits_set() / self.m
        if rho >= 1.0:
            return float("inf")
        return -(self.m / self.k) * math.log(1.0 - rho)

    # --- serialization -----------------------------------------------------
    def to_bytes(self) -> bytes:
        return base.pack(_MAGIC, [self.m, self.k, self.seed, self.n_added], [self.words])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        magic, (m, k, seed, n_added), (words,) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC, "BloomFilter")
        return cls(m, k, seed, words, n_added)
