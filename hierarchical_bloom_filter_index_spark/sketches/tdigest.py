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


def _compact(v: np.ndarray, w: np.ndarray, delta: float) -> tuple[np.ndarray, np.ndarray]:
    """THE canonical t-digest compaction: lexsort centroids by (mean, weight)
    and greedily merge left-to-right while the k1-scale span stays <= 1.
    A pure function of the centroid MULTISET (lexsort makes equal-(mean,
    weight) centroids interchangeable), so any merge path that feeds the
    same centroids through here yields byte-identical nodes — the window
    family's determinism contract. Shared by the object path (TDigest._flush)
    and the per-window kernels below."""
    if len(v) == 0:
        return v.astype(np.float64), w.astype(np.float64)
    order = np.lexsort((w, v))
    # scalar libm math in the greedy loop (same IEEE double ops in the same
    # order as the numpy-scalar original, so bytes are unchanged — the byte-
    # identity tests pin this); np scalar-call overhead made this loop the
    # hot spot of builds
    vl = v[order].astype(np.float64).tolist()
    wl = w[order].astype(np.float64).tolist()
    total = float(np.float64(w.sum()))
    c = delta / (2.0 * math.pi)
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = vl[0], wl[0]
    q_left = 0.0
    k_left = c * math.asin(-1.0)
    for i in range(1, len(vl)):
        q_new = (q_left * total + cur_w + wl[i]) / total
        qc = 0.0 if q_new < 0.0 else (1.0 if q_new > 1.0 else q_new)
        if c * math.asin(2.0 * qc - 1.0) - k_left <= 1.0:
            cur_m += (vl[i] - cur_m) * (wl[i] / (cur_w + wl[i]))
            cur_w += wl[i]
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q_left += cur_w / total
            ql = 0.0 if q_left < 0.0 else (1.0 if q_left > 1.0 else q_left)
            k_left = c * math.asin(2.0 * ql - 1.0)
            cur_m, cur_w = vl[i], wl[i]
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m, dtype=np.float64), np.asarray(out_w, dtype=np.float64)


def _raw_max(delta: float) -> int:
    """Largest n for which compacting n SINGLETON (weight-1) items is the
    identity: the k1 slope is >= delta/pi everywhere, so a 2-item span costs
    k-distance >= 2*delta/(pi*n); no greedy merge can fire while that
    exceeds 1, i.e. n < 2*delta/pi. Inside this regime a node is just its
    sorted raw values — packed directly, no greedy loop (the fast path every
    leaf_span <= raw_max leaf takes; identity with the object path is
    test-asserted, not assumed)."""
    return int((2.0 * delta) / math.pi * (1.0 - 1e-12))


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
        self.means, self.weights = _compact(v, w, self.delta)

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

    def cdf(self, v: float) -> float:
        """Estimated fraction of items <= v (inverse of ``quantile``: same
        centroid-midpoint interpolation, so cdf(quantile(q)) ~= q away from
        the edges). Midpoint convention at ties: v equal to one or more
        centroid means counts half the tied mass. Rank error follows the
        same k1-scale contract as quantile (O(q(1-q)/delta))."""
        self._flush()
        m, w = self.means, self.weights
        if len(m) == 0:
            return float("nan")
        if v < m[0]:
            return 0.0
        if v > m[-1]:
            return 1.0
        total = w.sum()
        if len(m) == 1:
            return 0.5  # all mass at one centroid; midpoint convention
        cum = np.cumsum(w) - w / 2.0
        lo = int(np.searchsorted(m, v, side="left"))
        hi = int(np.searchsorted(m, v, side="right"))
        if lo < hi:
            # v coincides with centroid mean(s) lo..hi-1: mass strictly
            # before + half the tied group's mass
            c0 = cum[lo] - w[lo] / 2.0
            c1 = cum[hi - 1] + w[hi - 1] / 2.0
            return float((c0 + c1) / (2.0 * total))
        frac = (v - m[lo - 1]) / (m[lo] - m[lo - 1])
        return float((cum[lo - 1] + frac * (cum[lo] - cum[lo - 1])) / total)

    def to_bytes(self) -> bytes:
        self._flush()
        return base.pack(_MAGIC, [int(self.delta * 1000), self.n], [self.means, self.weights])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        magic, (delta_milli, n), (means, weights) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC, "TDigest")
        return cls(delta_milli / 1000.0, means, weights, n)


# ---------------------------------------------------------------------------
# Per-window t-digest kernels (the quantile analog of kll.leaf_window_blobs /
# merge_blob_groups): one serialized digest per consecutive window of a value
# array. Stronger determinism contract than the KLL family: t-digest has NO
# RNG and ``_compact`` is a pure function of the centroid multiset, so EVERY
# node — leaves AND rolled-up parents — is byte-deterministic and merge
# ORDER-FREE (KLL parents are only bound-preserving). Leaves holding
# n <= _raw_max(delta) values compact to exactly their sorted raw values
# (singleton centroids), so the leaf pass is direct byte packing of sorted
# slices — byte-identical to TDigest(delta).update(slice).to_bytes(),
# asserted in tests. The stored item count n is EXACT and merges add, which
# is what the SQL totals oracle checks; quantile error is the k1-scale
# contract (q-quantile rank error O(q(1-q)/delta)), bound-checked in tests.
# ---------------------------------------------------------------------------

# wire offset of params[1] (= n) in base.pack([delta_milli, n]):
# 4-byte header, then int64 params
_TD_N_OFFSET = 4 + 8


def _pack_node(v_sorted: np.ndarray, delta: float) -> bytes:
    """Canonical node for a window's SORTED weight-1 values: raw singleton
    centroids while n <= _raw_max(delta) (compaction provably cannot fire),
    else the shared greedy compaction."""
    n = len(v_sorted)
    if n <= _raw_max(delta):
        return base.pack(_MAGIC, [int(delta * 1000), n],
                         [v_sorted, np.ones(n, dtype=np.float64)])
    m, w = _compact(v_sorted, np.ones(n, dtype=np.float64), delta)
    return base.pack(_MAGIC, [int(delta * 1000), n], [m, w])


def leaf_window_blobs(values: np.ndarray, window: int, delta: float,
                      phase: int = 0) -> list[bytes]:
    """Serialized t-digests for every consecutive ``window``-value slice of
    ``values``. ``phase`` = stream offset of values[0] within its window
    (global-axis builds: blob i is the PARTIAL digest of stream window
    first_w + i; partials of a window merge into its canonical node because
    _compact is content-pure). NaN-free inputs required (int64 token casts):
    direct packing skips the NaN filter TDigest.update applies — guarded,
    not silently filtered."""
    n = len(values)
    if n == 0:
        return []
    vals = np.asarray(values, dtype=np.float64)
    if np.isnan(vals).any():
        raise ValueError("leaf_window_blobs: NaN input (route through TDigest.update)")
    nw = (phase + n + window - 1) // window
    out: list[bytes] = []
    for i in range(nw):
        lo = max(0, i * window - phase)
        hi = min(n, (i + 1) * window - phase)
        out.append(_pack_node(np.sort(vals[lo:hi]), delta))
    return out


def partial_blobs_by_slot(values: np.ndarray, slots: np.ndarray, n_slots: int,
                          delta: float) -> list[bytes]:
    """Serialized t-digests for an ARBITRARY per-value slot assignment
    (cross-doc generalization of ``leaf_window_blobs`` — see
    hll.partial_blobs_by_slot). One lexsort by (slot, value) sorts every
    slot's slice in a single pass; blob i is the canonical node of the
    values whose slot == i. NaN-free inputs required."""
    vals = np.asarray(values, dtype=np.float64)
    if np.isnan(vals).any():
        raise ValueError("partial_blobs_by_slot: NaN input (route through TDigest.update)")
    s = np.asarray(slots, dtype=np.int64)
    order = np.lexsort((vals, s))
    sv = vals[order]
    counts = np.bincount(s, minlength=n_slots)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    return [_pack_node(sv[bounds[i] : bounds[i + 1]], delta) for i in range(n_slots)]


def merge_blob_groups(blobs: list[bytes], counts: np.ndarray,
                      delta: float | None = None) -> list[bytes]:
    """Merge consecutive groups of serialized t-digests (group i = the next
    ``counts[i]`` blobs). ORDER-FREE byte-deterministic: each group's
    centroids concatenate and go through the content-pure ``_compact``
    (single-blob groups pass through byte-identically, matching
    rollup._merge_sparse). A group whose children are all still raw
    singletons with total n <= _raw_max stays raw — so a window's node is
    the same bytes whether built from the whole window or merged from any
    split of it (the global build's doc-boundary partials). ``delta=None``
    derives the parameter from the blobs themselves (readout paths); passing
    it pins family consistency (build paths via window_sketch_family)."""
    dm = None
    out: list[bytes] = []
    pos = 0
    for c in counts:
        c = int(c)
        if c == 1:
            out.append(bytes(blobs[pos]))
            pos += 1
            continue
        ms, ws, n = [], [], 0
        for b in blobs[pos : pos + c]:
            magic, (delta_milli, bn), (m, w) = base.unpack(bytes(b))
            base.expect_magic(magic, _MAGIC, "TDigest")
            if dm is None:
                dm = delta_milli
                # compare in wire units: to_bytes truncates to millesimals
                if delta is not None and dm != int(delta * 1000):
                    raise ValueError(f"delta mismatch: blobs carry {dm / 1000.0}, caller passed {delta}")
                delta = dm / 1000.0
            elif delta_milli != dm:
                raise ValueError("merge_blob_groups: mixed t-digest deltas")
            ms.append(m)
            ws.append(w)
            n += bn
        v = np.concatenate(ms)
        w = np.concatenate(ws)
        if n <= _raw_max(delta) and len(v) == n:
            # all children raw (len == n ⟺ every centroid weight 1)
            out.append(base.pack(_MAGIC, [int(delta * 1000), n],
                                 [np.sort(v), np.ones(n, dtype=np.float64)]))
        else:
            m2, w2 = _compact(v, w, delta)
            out.append(base.pack(_MAGIC, [int(delta * 1000), n], [m2, w2]))
        pos += c
    return out


def blob_totals(blobs: list[bytes]) -> np.ndarray:
    """EXACT item count of each blob's window (the n field counts every
    update exactly; merges add) — SQL-oracle-checkable."""
    import struct as _struct

    out = np.empty(len(blobs), dtype=np.int64)
    for i, b in enumerate(blobs):
        b = bytes(b)
        if b[0] != _MAGIC:
            raise ValueError(f"unknown sketch magic {b[0]} (expected TDigest)")
        (out[i],) = _struct.unpack_from("<q", b, _TD_N_OFFSET)
    return out


def quantile_blobs(blobs: list[bytes], qs) -> np.ndarray:
    """(len(blobs), len(qs)) quantile estimates — object path per blob
    (sketch rows only; k1-scale accuracy contract)."""
    qs = np.asarray(qs, dtype=np.float64)
    out = np.empty((len(blobs), len(qs)), dtype=np.float64)
    for i, b in enumerate(blobs):
        out[i] = TDigest.from_bytes(bytes(b)).quantiles(qs)
    return out


def cdf_blobs(blobs: list[bytes], vs) -> np.ndarray:
    """(len(blobs), len(vs)) CDF estimates (fraction of the blob's items
    <= v) — the inverse-quantile readout; same determinism as every other
    t-digest readout (pure function of the node bytes)."""
    vs = np.asarray(vs, dtype=np.float64)
    out = np.empty((len(blobs), len(vs)), dtype=np.float64)
    for i, b in enumerate(blobs):
        d = TDigest.from_bytes(bytes(b))
        out[i] = [d.cdf(v) for v in vs]
    return out


# ---------------------------------------------------------------------------
# UNION readouts: answer quantile/CDF queries directly over the CONCATENATED
# centroid multiset of a group of nodes, skipping recompaction entirely. The
# union is itself a valid t-digest centroid set — just finer than the
# compacted one — so the estimate is at least as accurate as
# merge-then-read, still a deterministic pure function of the node multiset,
# and the hot range-readout path stays all-numpy (the greedy ``_compact``
# python loop per (doc, range) group made range_tdigest_quantiles ~5x its
# KLL sibling at sf0.1 before this). Build/maintenance paths keep
# ``merge_blob_groups`` — stored nodes must stay canonical.
# ---------------------------------------------------------------------------


def _group_centroids(blobs: list[bytes], counts: np.ndarray):
    """Yield (means_sorted, weights, n) per group of ``counts[i]`` blobs."""
    pos = 0
    for c in counts:
        c = int(c)
        ms, ws, n = [], [], 0
        for b in blobs[pos : pos + c]:
            magic, (_dm, bn), (m, w) = base.unpack(bytes(b))
            base.expect_magic(magic, _MAGIC, "TDigest")
            ms.append(m)
            ws.append(w)
            n += bn
        pos += c
        v = np.concatenate(ms)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="stable")
        yield v[order], w[order], n


def quantile_union_groups(blobs: list[bytes], counts: np.ndarray, qs) -> np.ndarray:
    """(len(counts), len(qs)) quantile estimates per consecutive group —
    centroid-midpoint interpolation (``TDigest.quantile`` semantics) over
    the group's union centroid multiset."""
    qs = np.asarray(qs, dtype=np.float64)
    out = np.empty((len(counts), len(qs)), dtype=np.float64)
    for i, (m, w, _n) in enumerate(_group_centroids(blobs, counts)):
        if len(m) == 0:
            out[i] = np.nan
        elif len(m) == 1:
            out[i] = m[0]
        else:
            # vectorized TDigest.quantile, same expression tree (bit-equal
            # to the object path on single-node groups — np.interp rounds
            # differently at the last ulp and would break that identity)
            cum = np.cumsum(w) - w / 2.0
            target = qs * w.sum()
            idx = np.clip(np.searchsorted(cum, target), 1, len(m) - 1)
            frac = (target - cum[idx - 1]) / (cum[idx] - cum[idx - 1])
            est = m[idx - 1] + frac * (m[idx] - m[idx - 1])
            est[target <= cum[0]] = m[0]   # object path: idx == 0
            est[target > cum[-1]] = m[-1]  # object path: idx == len
            out[i] = est
    return out


def cdf_union_groups(blobs: list[bytes], counts: np.ndarray, vs) -> np.ndarray:
    """(len(counts), len(vs)) CDF estimates per consecutive group —
    ``TDigest.cdf`` semantics (midpoint interpolation, half-mass at ties,
    0/1 outside the centroid span) over the union centroid multiset."""
    vs = np.asarray(vs, dtype=np.float64)
    out = np.empty((len(counts), len(vs)), dtype=np.float64)
    for i, (m, w, _n) in enumerate(_group_centroids(blobs, counts)):
        if len(m) == 0:
            out[i] = np.nan
            continue
        # collapse equal means so searchsorted tie logic sees unique keys
        mu, inv = np.unique(m, return_inverse=True)
        wu = np.bincount(inv, weights=w)
        total = wu.sum()
        if len(mu) == 1:
            out[i] = np.where(vs < mu[0], 0.0, np.where(vs > mu[0], 1.0, 0.5))
            continue
        cw = np.cumsum(wu)
        mid = cw - wu / 2.0
        lo = np.searchsorted(mu, vs, side="left")
        hi = np.searchsorted(mu, vs, side="right")
        est = np.empty(len(vs), dtype=np.float64)
        tie = lo < hi  # v equals a (unique) centroid mean
        ti = lo[tie]
        est[tie] = ((cw[ti] - wu[ti]) + cw[ti]) / (2.0 * total)
        nt = ~tie
        idx = lo[nt]
        below = idx == 0
        above = idx == len(mu)
        mid_band = ~(below | above)
        vals = np.zeros(nt.sum(), dtype=np.float64)
        vals[above] = 1.0
        if mid_band.any():
            j = idx[mid_band]
            vv = vs[nt][mid_band]
            frac = (vv - mu[j - 1]) / (mu[j] - mu[j - 1])
            vals[mid_band] = (mid[j - 1] + frac * (mid[j] - mid[j - 1])) / total
        est[nt] = vals
        out[i] = est
    return out
