"""KLL quantile sketch (Karnin–Lang–Liberty 2016), mergeable.

Compactor-based: level h holds items of weight 2^h; a level over capacity is
sorted and every other item (random offset) is promoted one level up.
Capacities decay geometrically (c = 2/3) from k at the top level, giving
rank error eps = O(1/k) with high probability. The offset bit comes from a
seeded SplitMix64 counter so builds are deterministic and resumable; merge
order does NOT change the error bound (but may change exact bytes — the
merge-law test for KLL asserts the rank-error contract, not byte equality).

Replaces the reference's HOPS/BottomK rank estimation path
(estimators/HOPS.java:117-136) as the primary quantile sketch per north_rule;
DKW-style rank checks mirror SamplingSketchExperiment.java:92-110.
"""

from __future__ import annotations

import numpy as np

from . import base
from .hashing import splitmix64

_MAGIC = 5
_C = 2.0 / 3.0


class KLL:
    MAGIC = _MAGIC
    __slots__ = ("k", "seed", "n", "compactions", "levels")

    def __init__(self, k: int = 200, seed: int = 0, n: int = 0, compactions: int = 0, levels: list[np.ndarray] | None = None):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        self.n = int(n)
        self.compactions = int(compactions)
        self.levels: list[np.ndarray] = levels if levels is not None else [np.empty(0, dtype=np.float64)]

    # --- internals ---------------------------------------------------------
    def _cap(self, h: int) -> int:
        height = len(self.levels)
        return max(2, int(np.ceil(self.k * (_C ** (height - 1 - h)))))

    def _total_cap(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _offset_bit(self) -> int:
        x = (self.seed * 0x9E3779B9 + self.compactions) & 0xFFFFFFFFFFFFFFFF
        bit = int(splitmix64(np.asarray([x], dtype=np.uint64))[0] & np.uint64(1))
        self.compactions += 1
        return bit

    def _compress(self) -> None:
        while self._size() > self._total_cap():
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h):
                    buf = np.sort(self.levels[h])
                    if len(buf) % 2 == 1:
                        # keep one item at this level, compact the even rest
                        keep, buf = buf[:1], buf[1:]
                    else:
                        keep = np.empty(0, dtype=np.float64)
                    promoted = buf[self._offset_bit() :: 2]
                    self.levels[h] = keep
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
                    break
            else:
                break  # nothing individually over cap; tolerate slight overshoot

    # --- public API ----------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        # feed in chunks so level 0 never balloons past its cap by much
        chunk = max(self._cap(0), 64)
        for i in range(0, len(values), chunk):
            self.levels[0] = np.concatenate([self.levels[0], values[i : i + chunk]])
            self.n += len(values[i : i + chunk])
            self._compress()

    def merge(self, other: "KLL") -> "KLL":
        base.check_same_type(self, other)
        base.check_compatible("KLL", {"k": self.k, "seed": self.seed}, {"k": other.k, "seed": other.seed})
        height = max(len(self.levels), len(other.levels))
        levels = []
        for h in range(height):
            a = self.levels[h] if h < len(self.levels) else np.empty(0, dtype=np.float64)
            b = other.levels[h] if h < len(other.levels) else np.empty(0, dtype=np.float64)
            levels.append(np.concatenate([a, b]))
        out = KLL(self.k, self.seed, self.n + other.n, self.compactions + other.compactions, levels)
        out._compress()
        return out

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for h, lv in enumerate(self.levels):
            if len(lv):
                vals.append(lv)
                weights.append(np.full(len(lv), 1 << h, dtype=np.int64))
        if not vals:
            return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, x: float) -> float:
        """Estimated number of items <= x."""
        v, w = self._weighted_items()
        return float(w[v <= x].sum())

    def quantile(self, q: float) -> float:
        """Estimated q-quantile (0 <= q <= 1)."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, len(v) - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.asarray([self.quantile(q) for q in qs], dtype=np.float64)

    def to_bytes(self) -> bytes:
        lengths = np.asarray([len(lv) for lv in self.levels], dtype=np.int64)
        flat = np.concatenate(self.levels) if self._size() else np.empty(0, dtype=np.float64)
        return base.pack(_MAGIC, [self.k, self.seed, self.n, self.compactions], [lengths, flat])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        magic, (k, seed, n, compactions), (lengths, flat) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC, "KLL")
        levels, off = [], 0
        for ln in lengths:
            levels.append(flat[off : off + int(ln)].copy())
            off += int(ln)
        if not levels:
            levels = [np.empty(0, dtype=np.float64)]
        return cls(k, seed, n, compactions, levels)


# ---------------------------------------------------------------------------
# Per-window KLL kernels (the quantile analog of hll/cms leaf_window_blobs /
# merge_blob_groups): one serialized KLL per consecutive window of a value
# array. A window holding <= k values needs NO compaction — its KLL is just
# level 0 = the values in arrival order — so leaf blobs are built by direct
# byte packing (byte-identical to KLL(k, seed).update(slice).to_bytes()),
# no per-window object churn on the common path (leaf_span <= k).
# Parent merges go through the object API: KLL merge is BOUND-PRESERVING,
# not byte-deterministic (compaction offset bits depend on merge order), but
# the stored item count n IS exact and order-independent — which is what the
# SQL totals oracle checks.
# ---------------------------------------------------------------------------

# wire offset of params[2] (= n) in base.pack([k, seed, n, compactions]):
# 4-byte header, then int64 params
_KLL_N_OFFSET = 4 + 2 * 8


def leaf_window_blobs(values: np.ndarray, window: int, k: int, seed: int,
                      phase: int = 0) -> list[bytes]:
    """Serialized KLLs for every consecutive ``window``-value slice of
    ``values``. ``phase`` = stream offset of values[0] within its window
    (global-axis builds: blob i is the PARTIAL sketch of stream window
    first_w + i, and partials of a window merge into a valid window KLL).

    Inputs must be NaN-free (true for the token streams this indexes —
    int64 casts): direct byte-packing skips the NaN filter KLL.update
    applies, so a NaN would be stored in level 0 AND counted in the exact
    ``n`` field, breaking both byte-identity with the object path and
    exact-totals semantics. Guarded, not silently filtered."""
    n = len(values)
    if n == 0:
        return []
    vals = np.asarray(values, dtype=np.float64)
    if np.isnan(vals).any():
        raise ValueError("leaf_window_blobs: NaN input (route through KLL.update)")
    nw = (phase + n + window - 1) // window
    out: list[bytes] = []
    for i in range(nw):
        lo = max(0, i * window - phase)
        hi = min(n, (i + 1) * window - phase)
        wv = vals[lo:hi]
        if len(wv) <= k:
            out.append(
                base.pack(_MAGIC, [k, seed, len(wv), 0],
                          [np.asarray([len(wv)], dtype=np.int64), wv])
            )
        else:  # window wider than k: pay the object path (rare; leaf spans
            # are sized below k so parents are built by MERGE, not here)
            s = KLL(k=k, seed=seed)
            s.update(wv)
            out.append(s.to_bytes())
    return out


def partial_blobs_by_slot(values: np.ndarray, slots: np.ndarray, n_slots: int,
                          k: int, seed: int) -> list[bytes]:
    """Serialized KLLs for an ARBITRARY per-value slot assignment (cross-doc
    generalization of ``leaf_window_blobs`` — see hll.partial_blobs_by_slot).
    Blob i holds exactly the values whose slot == i, in their original
    relative order (stable grouping), so partials match the per-doc path.
    NaN-free inputs required, as in ``leaf_window_blobs``."""
    vals = np.asarray(values, dtype=np.float64)
    if np.isnan(vals).any():
        raise ValueError("partial_blobs_by_slot: NaN input (route through KLL.update)")
    s = np.asarray(slots, dtype=np.int64)
    order = np.argsort(s, kind="stable")
    sv = vals[order]
    counts = np.bincount(s, minlength=n_slots)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    out: list[bytes] = []
    for i in range(n_slots):
        wv = sv[bounds[i] : bounds[i + 1]]
        if len(wv) <= k:
            out.append(
                base.pack(_MAGIC, [k, seed, len(wv), 0],
                          [np.asarray([len(wv)], dtype=np.int64), wv])
            )
        else:
            sk = KLL(k=k, seed=seed)
            sk.update(wv)
            out.append(sk.to_bytes())
    return out


def merge_blob_groups(blobs: list[bytes], counts: np.ndarray) -> list[bytes]:
    """Merge consecutive groups of serialized KLLs (group i = the next
    ``counts[i]`` blobs). Object-path merges over sketch rows only; the
    result's rank-error bound and exact item count hold for any group
    order."""
    out: list[bytes] = []
    pos = 0
    for c in counts:
        acc = KLL.from_bytes(bytes(blobs[pos]))
        for b in blobs[pos + 1 : pos + int(c)]:
            acc = acc.merge(KLL.from_bytes(bytes(b)))
        out.append(acc.to_bytes())
        pos += int(c)
    return out


def blob_totals(blobs: list[bytes]) -> np.ndarray:
    """EXACT item count of each blob's window (the KLL ``n`` field counts
    every update exactly; merges add) — SQL-oracle-checkable."""
    import struct as _struct

    out = np.empty(len(blobs), dtype=np.int64)
    for i, b in enumerate(blobs):
        b = bytes(b)
        if b[0] != _MAGIC:
            raise ValueError(f"unknown sketch magic {b[0]} (expected KLL)")
        (out[i],) = _struct.unpack_from("<q", b, _KLL_N_OFFSET)
    return out


def quantile_blobs(blobs: list[bytes], qs) -> np.ndarray:
    """(len(blobs), len(qs)) quantile estimates — object path per blob
    (sketch rows only; rank error per the KLL k parameter)."""
    qs = np.asarray(qs, dtype=np.float64)
    out = np.empty((len(blobs), len(qs)), dtype=np.float64)
    for i, b in enumerate(blobs):
        out[i] = KLL.from_bytes(bytes(b)).quantiles(qs)
    return out


def ks_distance(a: "KLL", b: "KLL") -> float:
    """Two-sample Kolmogorov-Smirnov statistic estimated from two KLL
    sketches: sup_x |F_a(x) - F_b(x)| over the empirical step CDFs the
    sketches encode. The sup of a difference of right-continuous step
    functions is attained at a stored point of one of them, so scanning
    the union of stored items is exact FOR THE SKETCHED CDFs; each
    sketched CDF is within its sketch's normalized rank error eps of the
    true one, hence |estimate - true KS| <= eps_a + eps_b (triangle
    inequality on the sup norm). Uncompacted sketches (n <= capacity)
    store every item with weight 1, so the estimate is then the EXACT
    two-sample KS. Refuses empty sketches (KS of nothing is undefined)."""
    return ks_statistic(a, b)[0]


def ks_statistic(a: "KLL", b: "KLL") -> tuple[float, float]:
    """(ks, x) — the statistic plus the SMALLEST stored point attaining
    the sup (np.argmax over ascending points = first occurrence), so the
    attribution is deterministic and cross-engine reproducible: 'the
    distributions diverge most at/below x'."""
    if a.n == 0 or b.n == 0:
        raise ValueError("ks_distance: empty sketch")
    va, wa = a._weighted_items()
    vb, wb = b._weighted_items()
    xs = np.unique(np.concatenate([va, vb]))
    ca = np.concatenate([[0.0], np.cumsum(wa, dtype=np.float64)])
    cb = np.concatenate([[0.0], np.cumsum(wb, dtype=np.float64)])
    fa = ca[np.searchsorted(va, xs, side="right")] / float(ca[-1])
    fb = cb[np.searchsorted(vb, xs, side="right")] / float(cb[-1])
    d = np.abs(fa - fb)
    i = int(np.argmax(d))
    return float(d[i]), float(xs[i])


def ks_distance_blobs(blob_a: bytes, blob_b: bytes) -> float:
    return ks_distance(KLL.from_bytes(bytes(blob_a)),
                       KLL.from_bytes(bytes(blob_b)))


def quantile_blobs_rational(blobs: list[bytes],
                            qs: list[tuple[int, int]]
                            ) -> tuple[np.ndarray, list[bool], np.ndarray]:
    """Quantiles at RATIONAL ranks with exact integer target arithmetic:
    for q = num/den, the returned value sits at stored-weight rank
    r = max(1, ceil(num * n / den)) — the same rule as ``quantile`` but
    with the q*n target computed in integers, so an engine replaying
    ceil(num*n/den) in SQL lands on the SAME rank (a float 0.9*n can
    round to either side of an integer boundary; the rational form
    can't).  Returns (values[len(blobs) x len(qs)], exact_flags, n):
    exact[i] is True iff blob i never compacted — every item stored at
    weight 1, making each answer the EXACT order statistic; otherwise
    the KLL rank bound applies."""
    qs = [(int(a), int(b)) for a, b in qs]
    for a, b in qs:
        if b <= 0 or a < 0 or a > b:
            raise ValueError(f"quantile_blobs_rational: bad q {a}/{b}")
    out = np.full((len(blobs), len(qs)), np.nan, dtype=np.float64)
    exact: list[bool] = []
    ns = np.zeros(len(blobs), dtype=np.int64)
    for i, b in enumerate(blobs):
        sk = KLL.from_bytes(bytes(b))
        v, w = sk._weighted_items()
        exact.append(int(sk.compactions) == 0)
        ns[i] = int(sk.n)
        if len(v) == 0:
            continue
        cum = np.cumsum(w.astype(np.int64))
        for j, (num, den) in enumerate(qs):
            t = max((num * ns[i] + den - 1) // den, 1)
            idx = int(np.searchsorted(cum, t, side="left"))
            out[i, j] = float(v[min(idx, len(v) - 1)])
    return out, exact, ns
