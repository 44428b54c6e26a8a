"""Merging t-digest (Dunning & Ertl) — mergeable quantile sketch, no RNG.

Centroids are size-bounded by the k1 scale function
``k(q) = delta/(2*pi) * asin(2q - 1)``, concentrating resolution at the
tails. Fully deterministic (greedy left-to-right merge, no randomness), so
partial+final aggregation over any partitioning yields reproducible digests
for a fixed merge order; accuracy holds for any order. Complements KLL as the
second quantile sketch named by the north_rule.
"""

from __future__ import annotations

import math

import numpy as np

from . import base

_MAGIC = 8


def _k_scale(q: np.ndarray | float, delta: float):
    return delta / (2.0 * math.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


class TDigest:
    MAGIC = _MAGIC
    __slots__ = ("delta", "means", "weights", "n", "_buf")

    def __init__(self, delta: float = 100.0, means: np.ndarray | None = None, weights: np.ndarray | None = None, n: int = 0):
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64) if means is None else means
        self.weights = np.empty(0, dtype=np.float64) if weights is None else weights
        self.n = int(n)
        self._buf: list[np.ndarray] = []

    def _flush(self, force: bool = False) -> None:
        if not force and not self._buf and len(self.means) <= 2 * self.delta:
            return
        vals = [self.means] + self._buf
        wts = [self.weights] + [np.ones(len(b), dtype=np.float64) for b in self._buf]
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        self._buf = []
        if len(v) == 0:
            return
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = w.sum()
        out_m, out_w = [], []
        cur_m, cur_w = v[0], w[0]
        q_left = 0.0
        k_left = _k_scale(q_left, self.delta)
        for i in range(1, len(v)):
            q_new = (q_left * total + cur_w + w[i]) / total
            if _k_scale(q_new, self.delta) - k_left <= 1.0:
                cur_m += (v[i] - cur_m) * (w[i] / (cur_w + w[i]))
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q_left += cur_w / total
                k_left = _k_scale(q_left, self.delta)
                cur_m, cur_w = v[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m, dtype=np.float64)
        self.weights = np.asarray(out_w, dtype=np.float64)

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self._buf.append(values)
        self.n += len(values)
        if sum(len(b) for b in self._buf) >= 4 * self.delta:
            self._flush()

    def merge(self, other: "TDigest") -> "TDigest":
        base.check_same_type(self, other)
        base.check_compatible("TDigest", {"delta": self.delta}, {"delta": other.delta})
        self._flush()
        other._flush()
        out = TDigest(self.delta, np.concatenate([self.means, other.means]),
                      np.concatenate([self.weights, other.weights]), self.n + other.n)
        out._flush(force=True)  # concatenated centroids are unsorted — must recompact
        return out

    def quantile(self, q: float) -> float:
        self._flush()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(w) - w / 2.0
        target = q * total
        idx = int(np.searchsorted(cum, target))
        if idx == 0:
            return float(self.means[0])
        if idx >= len(self.means):
            return float(self.means[-1])
        frac = (target - cum[idx - 1]) / (cum[idx] - cum[idx - 1])
        return float(self.means[idx - 1] + frac * (self.means[idx] - self.means[idx - 1]))

    def quantiles(self, qs) -> np.ndarray:
        return np.asarray([self.quantile(q) for q in qs], dtype=np.float64)

    def to_bytes(self) -> bytes:
        self._flush()
        return base.pack(_MAGIC, [int(self.delta * 1000), self.n], [self.means, self.weights])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        magic, (delta_milli, n), (means, weights) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC, "TDigest")
        return cls(delta_milli / 1000.0, means, weights, n)
