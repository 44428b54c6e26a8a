"""Count-min sketch and (signed) count-sketch: mergeable frequency estimators.

Count-min: Cormode–Muthukrishnan; overestimate-only, err <= eps*N w.p. >= 1-delta
with width w = ceil(e/eps), depth d = ceil(ln(1/delta)).

Count-sketch: Charikar; unbiased, estimate = median of signed row values,
sized ``w = 2^ceil(log2(3/eps^2)), d = ceil(ln(1/delta))`` like the
reference's fromEpsDelta (estimators/CountSketch.java:134-159). Merge is
elementwise add with shape/seed checks (estimators/CountSketch.java:94-103,
232-241). CountSketch counters are int64 (the safe default); IntCountSketch
is the reference-parity int32 SATURATING variant
(estimators/IntCountSketch.java:233-246) — half the memory/shuffle bytes, and
like the reference it trades strict merge associativity at the ±2^31
extremes (saturation clamps; once a cell pins, order can matter). Use it
when counters provably stay far from the rails.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import base
from .hashing import hash64

_U64 = np.uint64
_MAGIC_CMS = 2
_MAGIC_CS = 3
_MAGIC_ICS = 9
_I32_MIN, _I32_MAX = np.int32(-(2**31)), np.int32(2**31 - 1)


def _row_buckets(keys: np.ndarray, seed: int, depth: int, width: int) -> np.ndarray:
    """(depth, len(keys)) bucket indices, one independent hash per row."""
    return np.stack([hash64(keys, seed + 1000003 * r) % _U64(width) for r in range(depth)]).astype(np.int64)


class CountMinSketch:
    MAGIC = _MAGIC_CMS
    __slots__ = ("depth", "width", "seed", "table", "total")

    def __init__(self, depth: int, width: int, seed: int, table: np.ndarray | None = None, total: int = 0):
        self.depth = int(depth)
        self.width = int(width)
        self.seed = int(seed)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64) if table is None else table
        self.total = int(total)

    @classmethod
    def from_eps_delta(cls, eps: float, delta: float, seed: int) -> "CountMinSketch":
        width = max(8, math.ceil(math.e / eps))
        depth = max(1, math.ceil(math.log(1.0 / delta)))
        return cls(depth, width, seed)

    def update(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(keys) == 0:
            return
        buckets = _row_buckets(keys, self.seed, self.depth, self.width)
        if counts is None:
            for r in range(self.depth):
                self.table[r] += np.bincount(buckets[r], minlength=self.width)
            self.total += len(keys)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            for r in range(self.depth):
                self.table[r] += np.bincount(buckets[r], weights=counts, minlength=self.width).astype(np.int64)
            self.total += int(counts.sum())

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        buckets = _row_buckets(keys, self.seed, self.depth, self.width)
        ests = np.stack([self.table[r][buckets[r]] for r in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        base.check_same_type(self, other)
        base.check_compatible(
            "CountMinSketch",
            {"d": self.depth, "w": self.width, "seed": self.seed},
            {"d": other.depth, "w": other.width, "seed": other.seed},
        )
        return CountMinSketch(self.depth, self.width, self.seed, self.table + other.table, self.total + other.total)

    def to_bytes(self) -> bytes:
        return base.pack(_MAGIC_CMS, [self.depth, self.width, self.seed, self.total], [self.table.ravel()])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMinSketch":
        magic, (depth, width, seed, total), (flat,) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC_CMS, "CountMinSketch")
        return cls(depth, width, seed, flat.reshape(depth, width), total)


class CountSketch:
    """Signed count-sketch (reference parity: estimators/CountSketch.java)."""

    MAGIC = _MAGIC_CS
    __slots__ = ("depth", "width", "seed", "table", "total")

    def __init__(self, depth: int, width: int, seed: int, table: np.ndarray | None = None, total: int = 0):
        self.depth = int(depth)
        self.width = int(width)
        self.seed = int(seed)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64) if table is None else table
        self.total = int(total)

    @classmethod
    def from_eps_delta(cls, eps: float, delta: float, seed: int) -> "CountSketch":
        # w = next pow2 >= 3/eps^2, d = ceil(ln(1/delta)) — CountSketch.java:134-159
        width = 1 << max(3, math.ceil(math.log2(3.0 / (eps * eps))))
        depth = max(1, math.ceil(math.log(1.0 / delta)))
        return cls(depth, width, seed)

    def _signs(self, keys: np.ndarray, row: int) -> np.ndarray:
        h = hash64(keys, self.seed + 7 + 1000003 * row)
        return ((h & _U64(1)).astype(np.int64) << 1) - 1  # ±1

    def update(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(keys) == 0:
            return
        buckets = _row_buckets(keys, self.seed, self.depth, self.width)
        c = np.ones(len(keys), dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
        for r in range(self.depth):
            signed = c * self._signs(keys, r)
            self.table[r] += np.bincount(buckets[r], weights=signed, minlength=self.width).astype(np.int64)
        self.total += int(c.sum())

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        buckets = _row_buckets(keys, self.seed, self.depth, self.width)
        ests = np.stack(
            [self.table[r][buckets[r]] * self._signs(keys, r) for r in range(self.depth)]
        )
        return np.median(ests, axis=0)

    def merge(self, other: "CountSketch") -> "CountSketch":
        base.check_same_type(self, other)
        base.check_compatible(
            "CountSketch",
            {"d": self.depth, "w": self.width, "seed": self.seed},
            {"d": other.depth, "w": other.width, "seed": other.seed},
        )
        return CountSketch(self.depth, self.width, self.seed, self.table + other.table, self.total + other.total)

    def to_bytes(self) -> bytes:
        return base.pack(_MAGIC_CS, [self.depth, self.width, self.seed, self.total], [self.table.ravel()])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountSketch":
        magic, (depth, width, seed, total), (flat,) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC_CS, "CountSketch")
        return cls(depth, width, seed, flat.reshape(depth, width), total)


class IntCountSketch(CountSketch):
    """int32 SATURATING count-sketch — reference parity with
    estimators/IntCountSketch.java:233-246. Same hashes/signs/median as
    CountSketch (estimates agree exactly until a cell saturates), but cells
    clamp at ±(2^31-1)/−2^31 instead of widening: half the state bytes per
    partial, at the documented cost of merge associativity at the rails.

    Saturation is applied POST-BATCH-AGGREGATION: ``update`` sums a whole
    batch in int64 and clamps once per row, so clamp points are batch
    boundaries — a mixed-sign batch that transiently crosses the int32 rails
    yields different cell values than the reference's per-element saturating
    adds. Deliberate deviation (element order inside a Spark partition is
    not meaningful anyway); estimates diverge from Java parity only for
    cells that actually touch the rails."""

    MAGIC = _MAGIC_ICS

    def __init__(self, depth: int, width: int, seed: int, table: np.ndarray | None = None, total: int = 0):
        super().__init__(depth, width, seed, table, total)
        if table is None:
            self.table = np.zeros((self.depth, self.width), dtype=np.int32)

    @classmethod
    def from_eps_delta(cls, eps: float, delta: float, seed: int) -> "IntCountSketch":
        width = 1 << max(3, math.ceil(math.log2(3.0 / (eps * eps))))
        depth = max(1, math.ceil(math.log(1.0 / delta)))
        return cls(depth, width, seed)

    @staticmethod
    def _saturate(wide: np.ndarray) -> np.ndarray:
        return np.clip(wide, int(_I32_MIN), int(_I32_MAX)).astype(np.int32)

    def update(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(keys) == 0:
            return
        buckets = _row_buckets(keys, self.seed, self.depth, self.width)
        c = np.ones(len(keys), dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
        for r in range(self.depth):
            signed = c * self._signs(keys, r)
            delta = np.bincount(buckets[r], weights=signed, minlength=self.width).astype(np.int64)
            self.table[r] = self._saturate(self.table[r].astype(np.int64) + delta)
        self.total += int(c.sum())

    def update_strict(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        """PER-ELEMENT saturating update — exact Java-reference semantics
        (IntCountSketch.java:233-246: every add clamps immediately, so a
        mixed-sign sequence that transiently crosses the int32 rails pins
        cells the batched ``update`` would let cancel back). Sequential by
        definition — the parity/testing path, not the hot path: element
        order inside a Spark partition is not meaningful, which is why the
        batched post-aggregation clamp is the default."""
        if len(keys) == 0:
            return
        keys = np.asarray(keys)
        buckets = _row_buckets(keys, self.seed, self.depth, self.width)
        c = np.ones(len(keys), dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
        signs = np.stack([self._signs(keys, r) for r in range(self.depth)])
        lo, hi = int(_I32_MIN), int(_I32_MAX)
        for i in range(len(keys)):
            for r in range(self.depth):
                v = int(self.table[r, buckets[r, i]]) + int(c[i]) * int(signs[r, i])
                self.table[r, buckets[r, i]] = min(max(v, lo), hi)
            self.total += int(c[i])

    def merge(self, other: "IntCountSketch") -> "IntCountSketch":
        base.check_same_type(self, other)
        base.check_compatible(
            "IntCountSketch",
            {"d": self.depth, "w": self.width, "seed": self.seed},
            {"d": other.depth, "w": other.width, "seed": other.seed},
        )
        table = self._saturate(self.table.astype(np.int64) + other.table.astype(np.int64))
        return IntCountSketch(self.depth, self.width, self.seed, table, self.total + other.total)

    def to_bytes(self) -> bytes:
        return base.pack(_MAGIC_ICS, [self.depth, self.width, self.seed, self.total], [self.table.ravel()])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "IntCountSketch":
        magic, (depth, width, seed, total), (flat,) = base.unpack(buf)
        base.expect_magic(magic, _MAGIC_ICS, "IntCountSketch")
        return cls(depth, width, seed, flat.reshape(depth, width), total)


# ---------------------------------------------------------------------------
# Vectorized per-window CMS kernels (the frequency analog of
# hll.leaf_window_blobs / merge_blob_groups / estimate_blobs): build one CMS
# per consecutive window of a token array without per-window Python objects.
# CMS is LINEAR (table(concat) = table(a) + table(b)), so a parent window's
# sketch rolled up from children is byte-identical to a from-scratch build.
# ---------------------------------------------------------------------------

# fixed wire layout of a CountMinSketch blob (base.pack with 4 params, one
# int64 array): header 4B | params 32B | n_arrays 1B | dtype+len 9B | table
_CMS_TABLE_OFFSET = 4 + 4 * 8 + 1 + 9
_CMS_TOTAL_OFFSET = 4 + 3 * 8  # params are [depth, width, seed, total]


def _check_cms_blob(b: bytes, depth: int, width: int, seed: int) -> None:
    if b[0] != _MAGIC_CMS:
        raise ValueError(f"unknown sketch magic {b[0]} (expected CountMinSketch)")
    d, w, s = struct.unpack_from("<3q", b, 4)
    if (d, w, s) != (depth, width, seed):
        raise ValueError(f"CountMinSketch blob params {(d, w, s)} != {(depth, width, seed)}")


def leaf_window_blobs(tokens: np.ndarray, window: int, depth: int, width: int, seed: int,
                      phase: int = 0) -> list[bytes]:
    """Serialized CMSs for every consecutive ``window``-token slice of
    ``tokens``: ``depth`` hash passes + ``depth`` bincounts cover ALL
    windows at once. Byte-identical to
    ``CountMinSketch(depth, width, seed).update(slice).to_bytes()``.
    ``phase`` = stream offset of tokens[0] within its window (global-axis
    builds: blob i is the PARTIAL sketch of stream window first_w + i)."""
    n = len(tokens)
    if n == 0:
        return []
    keys = np.asarray(tokens, dtype=np.int64)
    nw = (phase + n + window - 1) // window
    w = (phase + np.arange(n, dtype=np.int64)) // window
    tables = np.empty((nw, depth, width), dtype=np.int64)
    for r in range(depth):
        b = (hash64(keys, seed + 1000003 * r) % _U64(width)).astype(np.int64)
        tables[:, r, :] = np.bincount(w * width + b, minlength=nw * width).reshape(nw, width)
    totals = np.bincount(w, minlength=nw)
    return [
        base.pack(_MAGIC_CMS, [depth, width, seed, int(totals[i])], [tables[i].ravel()])
        for i in range(nw)
    ]


def partial_blobs_by_slot(tokens: np.ndarray, slots: np.ndarray, n_slots: int,
                          depth: int, width: int, seed: int) -> list[bytes]:
    """Serialized CMSs for an ARBITRARY per-token slot assignment (cross-doc
    generalization of ``leaf_window_blobs`` — see hll.partial_blobs_by_slot):
    ``depth`` hash passes + ``depth`` bincounts cover every slot in the
    batch at once. Blob i is byte-identical to a CMS updated with exactly
    the tokens whose slot == i."""
    keys = np.asarray(tokens, dtype=np.int64)
    s = np.asarray(slots, dtype=np.int64)
    tables = np.empty((n_slots, depth, width), dtype=np.int64)
    for r in range(depth):
        b = (hash64(keys, seed + 1000003 * r) % _U64(width)).astype(np.int64)
        tables[:, r, :] = np.bincount(s * width + b, minlength=n_slots * width).reshape(n_slots, width)
    totals = np.bincount(s, minlength=n_slots)
    return [
        base.pack(_MAGIC_CMS, [depth, width, seed, int(totals[i])], [tables[i].ravel()])
        for i in range(n_slots)
    ]


def _blob_tables(blobs: list[bytes], depth: int, width: int, seed: int) -> np.ndarray:
    mats = np.empty((len(blobs), depth * width), dtype=np.int64)
    for i, b in enumerate(blobs):
        _check_cms_blob(bytes(b), depth, width, seed)
        mats[i] = np.frombuffer(b, dtype=np.int64, count=depth * width, offset=_CMS_TABLE_OFFSET)
    return mats


def window_totals(blobs: list[bytes]) -> np.ndarray:
    """EXACT token count of each blob's window (every update adds 1 to every
    table row, so the stored total is exact — no estimation involved)."""
    out = np.empty(len(blobs), dtype=np.int64)
    for i, b in enumerate(blobs):
        b = bytes(b)
        if b[0] != _MAGIC_CMS:
            raise ValueError(f"unknown sketch magic {b[0]} (expected CountMinSketch)")
        (out[i],) = struct.unpack_from("<q", b, _CMS_TOTAL_OFFSET)
    return out


def merge_blob_groups(blobs: list[bytes], counts: np.ndarray, depth: int, width: int, seed: int) -> list[bytes]:
    """Merge consecutive groups of serialized CMSs (group i = the next
    ``counts[i]`` blobs) in one vectorized grouped add — byte-identical to
    chained ``.merge()`` (elementwise table add, totals add)."""
    if not blobs:
        return []
    mats = _blob_tables(blobs, depth, width, seed)
    totals = window_totals(blobs)
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    merged = base.grouped_reduce(np.add, mats, counts)
    merged_tot = np.add.reduceat(totals, starts)
    return [
        base.pack(_MAGIC_CMS, [depth, width, seed, int(merged_tot[i])], [merged[i]])
        for i in range(merged.shape[0])
    ]


def estimate_blobs(blobs: list[bytes], keys: np.ndarray, depth: int, width: int, seed: int) -> np.ndarray:
    """(len(blobs), len(keys)) frequency estimates in one vectorized pass —
    same min-over-rows math as ``CountMinSketch.estimate`` per blob."""
    if not blobs:
        return np.empty((0, len(keys)), dtype=np.int64)
    keys = np.asarray(keys, dtype=np.int64)
    mats = _blob_tables(blobs, depth, width, seed).reshape(len(blobs), depth, width)
    buckets = _row_buckets(keys, seed, depth, width)  # (depth, nk)
    ests = np.stack([mats[:, r, buckets[r]] for r in range(depth)])  # (depth, nb, nk)
    return ests.min(axis=0)
