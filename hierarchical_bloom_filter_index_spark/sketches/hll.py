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
