"""Misra-Gries / SpaceSaving heavy-hitters summary: a mergeable deterministic
frequent-items sketch (beyond-reference, like TDigest — the reference's
frequency surface stops at CountSketch point estimates,
estimators/CountSketch.java, and exact HashMapEstimator).

State: at most ``k`` (key, count) counters plus the EXACT total weight seen
(``n_total``).  Updates fold a batch's exact counts in keywise; when more
than ``k`` counters remain, every counter is decremented by the (k+1)-th
largest count and non-positive counters are dropped (the classic Misra-Gries
step, batched).  SpaceSaving is the same summary up to the stored-count
offset, so one kernel serves both names.

Guarantees (Misra-Gries 1982; merge per Agarwal et al., "Mergeable
Summaries", PODS'12):

* underestimate only:  ``est(x) <= true(x) <= est(x) + err_bound()``
* ``err_bound() = (n_total - sum(counts)) / (k + 1)``, computable from the
  state alone, and ``<= n_total / (k + 1)``.
* ``heavy_hitters(phi)`` returns EVERY key with true frequency
  ``>= phi * n_total`` (a guaranteed superset — pair it with one exact
  count over the candidates for an exact answer, the same
  sketch-prunes / verification-decides contract as the Bloom index).
  The superset is certifiable only when ``err_bound() < phi * n_total`` —
  otherwise a dropped key could itself be phi-heavy and the method REFUSES
  (ValueError) rather than silently under-reporting.  Sizing
  ``k + 1 > 1/phi`` (``MisraGries.for_phi``) makes refusal impossible for
  any input.
* merge = keywise sum then the same prune; the error bound above holds for
  any merge tree/order (bound-preserving like KLL/TDigest, not byte-equal —
  ``n_total`` and the bound are order-exact, the surviving counter set may
  differ at ties).
"""

from __future__ import annotations

import numpy as np

from . import base

_MAGIC_MG = 10


def _combine(keys_a, counts_a, keys_b, counts_b):
    """Keywise sum of two (keys, counts) multisets, keys returned sorted."""
    keys = np.concatenate([keys_a, keys_b])
    counts = np.concatenate([counts_a, counts_b])
    uk, inv = np.unique(keys, return_inverse=True)
    summed = np.zeros(len(uk), dtype=np.int64)
    np.add.at(summed, inv, counts)
    return uk, summed


class MisraGries:
    """Deterministic mergeable heavy-hitters summary (frequent-items)."""

    MAGIC = _MAGIC_MG
    __slots__ = ("k", "n_total", "keys", "counts")

    def __init__(self, k: int, n_total: int = 0,
                 keys: np.ndarray | None = None, counts: np.ndarray | None = None):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.n_total = int(n_total)
        self.keys = np.empty(0, dtype=np.int64) if keys is None else keys
        self.counts = np.empty(0, dtype=np.int64) if counts is None else counts

    def _prune(self) -> None:
        n = len(self.counts)
        if n <= self.k:
            return
        # (k+1)-th largest count: every counter <= d dies after the shared
        # decrement, so at most k (strictly greater) survive
        d = np.partition(self.counts, n - (self.k + 1))[n - (self.k + 1)]
        keep = self.counts > d
        self.keys = self.keys[keep]
        self.counts = self.counts[keep] - int(d)

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        vals = np.asarray(values).astype(np.int64, copy=False)
        uk, cnt = np.unique(vals, return_counts=True)
        self.update_weighted(uk, cnt.astype(np.int64))

    def update_weighted(self, keys: np.ndarray, counts: np.ndarray) -> None:
        """Fold pre-aggregated (key, count) pairs in (counts must be >= 0)."""
        if len(keys) == 0:
            return
        keys = np.asarray(keys).astype(np.int64, copy=False)
        counts = np.asarray(counts).astype(np.int64, copy=False)
        if np.any(counts < 0):
            raise ValueError("negative weights are not Misra-Gries-summarizable")
        self.n_total += int(counts.sum())
        self.keys, self.counts = _combine(self.keys, self.counts, keys, counts)
        self._prune()

    def merge(self, other: "MisraGries") -> "MisraGries":
        base.check_same_type(self, other)
        base.check_compatible("MisraGries", {"k": self.k}, {"k": other.k})
        out = MisraGries(self.k, self.n_total + other.n_total,
                         *_combine(self.keys, self.counts, other.keys, other.counts))
        out._prune()
        return out

    def err_bound(self) -> float:
        """Deterministic one-sided error: true(x) - estimate(x) <= this."""
        return (self.n_total - int(self.counts.sum())) / (self.k + 1)

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        """Stored count per key (0 if untracked) — a lower bound on truth."""
        keys = np.asarray(keys).astype(np.int64, copy=False)
        if len(self.keys) == 0:
            return np.zeros(len(keys), dtype=np.int64)
        idx_c = np.clip(np.searchsorted(self.keys, keys), 0, len(self.keys) - 1)
        return np.where(self.keys[idx_c] == keys, self.counts[idx_c], 0).astype(np.int64)

    @classmethod
    def for_phi(cls, phi: float) -> "MisraGries":
        """Summary sized so heavy_hitters(phi) can never refuse: with
        k + 1 > 1/phi, err_bound <= n/(k+1) < phi*n for every input."""
        if not (0.0 < phi <= 1.0):
            raise ValueError("phi must be in (0, 1]")
        return cls(k=int(np.ceil(1.0 / phi)))

    def heavy_hitters(self, phi: float) -> np.ndarray:
        """Candidate keys covering EVERY key with true freq >= phi*n_total
        (sorted): any such key has est >= phi*n - err_bound > 0, so it is
        tracked and passes the cut.  That argument needs
        err_bound() < phi*n_total; when it fails (k too small for phi) a
        dropped key could itself be phi-heavy, so refuse loudly."""
        if self.n_total == 0:
            return np.empty(0, dtype=np.int64)
        err = self.err_bound()
        if err >= phi * self.n_total:
            raise ValueError(
                f"cannot certify phi={phi} heavy hitters: err_bound {err:.1f} >= "
                f"phi*n {phi * self.n_total:.1f} — size k+1 > 1/phi (see for_phi)"
            )
        return np.sort(self.keys[self.counts >= phi * self.n_total - err])

    def to_bytes(self) -> bytes:
        return base.pack(_MAGIC_MG, [self.k, self.n_total], [self.keys, self.counts])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MisraGries":
        magic, (k, n_total), (keys, counts) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC_MG, "MisraGries")
        return cls(k, n_total, keys, counts)
