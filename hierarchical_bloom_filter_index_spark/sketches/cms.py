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
# Sparse-exact window node: a CMS whose content has few distinct keys is
# stored as exact (token, count) pairs instead of a dense depth x width
# table. CMS is linear, so densifying the pairs reproduces the dense table
# BYTE-identically — the sparse form is a lossless, ~10-30x smaller encoding
# of the same sketch for small windows (a 32-token leaf never needs 6 KB of
# counters). Representation is a PURE FUNCTION of content (sparse iff
# nnz <= sparse_max_nnz), and nnz is monotone under merge, so merge order
# independence and cross-build-path byte-equality are preserved.
# Wire: params [depth, width, seed, total, nnz],
#       arrays [tokens int64 SORTED ASC, counts int64].
_MAGIC_CMS_SP = 12
# Signed count-sketch window nodes (the AMS family): same canonical
# sparse/dense rule as CMS — sparse nodes store the SAME exact (token,
# count) pairs (signs only matter when densifying), dense nodes are
# CountSketch tables (byte-identical to CountSketch.update of the window's
# content). Count-sketch is linear too, so parents stay byte-exact; the
# table additionally supports the Alon-Matias-Szegedy second-moment (F2)
# estimate: median over rows of the row's sum of squared counters.
_MAGIC_CS_SP = 14
_I32_MIN, _I32_MAX = np.int32(-(2**31)), np.int32(2**31 - 1)


def _cs_signs(keys: np.ndarray, seed: int, row: int) -> np.ndarray:
    """±1 count-sketch signs — ONE definition shared by the CountSketch
    object path and the cs window-node kernels (byte parity depends on it)."""
    h = hash64(keys, seed + 7 + 1000003 * row)
    return ((h & _U64(1)).astype(np.int64) << 1) - 1


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
        if bytes(buf)[:1] == bytes([_MAGIC_CMS_SP]):
            # ONE densification implementation (exact integer np.add.at):
            # a second one here would have to stay byte-synced by hand
            return cls.from_bytes(densify_blob(bytes(buf)))
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
        return _cs_signs(keys, self.seed, row)

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

    def f2(self) -> float:
        """Second frequency moment (sum over tokens of count^2) — the
        Alon-Matias-Szegedy tug-of-war estimate: each row's sum of squared
        counters is an unbiased F2 estimator with Var <= 2*F2^2/width;
        the median over ``depth`` independent rows concentrates it."""
        per_row = np.square(self.table.astype(np.float64)).sum(axis=1)
        return float(np.median(per_row))

    def to_bytes(self) -> bytes:
        return base.pack(_MAGIC_CS, [self.depth, self.width, self.seed, self.total], [self.table.ravel()])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountSketch":
        if bytes(buf)[:1] == bytes([_MAGIC_CS_SP]):
            # sparse cs window node: lossless signed densification
            return cls.from_bytes(densify_blob(bytes(buf)))
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


def _check_cms_blob(b: bytes, depth: int, width: int, seed: int,
                    magic_dense: int = _MAGIC_CMS) -> None:
    if b[0] != magic_dense:
        raise ValueError(f"unknown sketch magic {b[0]} (expected {magic_dense})")
    d, w, s = struct.unpack_from("<3q", b, 4)
    if (d, w, s) != (depth, width, seed):
        raise ValueError(f"table blob params {(d, w, s)} != {(depth, width, seed)}")


def sparse_max_nnz(depth: int, width: int) -> int:
    """Largest distinct-key count at which the sparse form is no bigger than
    the dense table (16 B/pair vs 8 B/cell): the canonical representation
    rule — a node is sparse IFF its content's nnz <= this. Pure function of
    content, monotone under merge, hence order-independent."""
    return (depth * width) // 2


def _unique_slot_pairs(keys: np.ndarray, slots: np.ndarray, n_slots: int,
                       weights: np.ndarray | None = None):
    """Per-slot exact frequency pairs: (u_tok, u_cnt, u_slot) sorted by
    (slot, token) plus per-slot nnz — ONE lexsort covers every slot in the
    batch (no per-slot python). ``weights`` (default 1 per key) are SUMMED
    per (slot, token) — the sparse-merge primitive."""
    order = np.lexsort((keys, slots))
    sk, ss = keys[order], slots[order]
    new = np.empty(len(sk), dtype=bool)
    new[0] = True
    new[1:] = (sk[1:] != sk[:-1]) | (ss[1:] != ss[:-1])
    starts = np.flatnonzero(new)
    u_tok = sk[starts]
    u_slot = ss[starts]
    if weights is None:
        u_cnt = np.diff(np.append(starts, len(sk))).astype(np.int64)
    else:
        u_cnt = np.add.reduceat(np.asarray(weights, dtype=np.int64)[order], starts)
    nnz = np.bincount(u_slot, minlength=n_slots)
    return u_tok, u_cnt, u_slot, nnz


def _pack_slot_blobs(keys: np.ndarray, slots: np.ndarray, n_slots: int,
                     depth: int, width: int, seed: int,
                     magic_dense: int = _MAGIC_CMS,
                     magic_sparse: int = _MAGIC_CMS_SP,
                     signed: bool = False) -> list[bytes]:
    """One blob per slot, canonical representation per slot: sparse exact
    pairs when nnz <= sparse_max_nnz, dense table otherwise (byte-identical
    to ``CountMinSketch.update`` — or ``CountSketch.update`` when
    ``signed``)."""
    keys = np.asarray(keys, dtype=np.int64)
    s = np.asarray(slots, dtype=np.int64)
    max_nnz = sparse_max_nnz(depth, width)
    if len(keys) == 0:
        empty = base.pack(magic_sparse, [depth, width, seed, 0, 0],
                          [np.empty(0, np.int64), np.empty(0, np.int64)])
        return [empty] * n_slots
    totals = np.bincount(s, minlength=n_slots)
    u_tok, u_cnt, u_slot, nnz = _unique_slot_pairs(keys, s, n_slots)
    bounds = np.zeros(n_slots + 1, dtype=np.int64)
    np.cumsum(nnz, out=bounds[1:])
    dense_slots = np.flatnonzero(nnz > max_nnz)
    if len(dense_slots):
        drow = np.full(n_slots, -1, dtype=np.int64)
        drow[dense_slots] = np.arange(len(dense_slots))
        sel = drow[u_slot] >= 0
        rows, d_tok, d_cnt = drow[u_slot[sel]], u_tok[sel], u_cnt[sel]
        tables = np.zeros((len(dense_slots), depth * width), dtype=np.int64)
        for r in range(depth):
            b = (hash64(d_tok, seed + 1000003 * r) % _U64(width)).astype(np.int64)
            w_cnt = d_cnt * _cs_signs(d_tok, seed, r) if signed else d_cnt
            np.add.at(tables, (rows, r * width + b), w_cnt)
    out: list[bytes] = []
    for i in range(n_slots):
        if nnz[i] > max_nnz:
            out.append(base.pack(magic_dense, [depth, width, seed, int(totals[i])],
                                 [tables[drow[i]]]))
        else:
            sl = slice(bounds[i], bounds[i + 1])
            out.append(base.pack(magic_sparse,
                                 [depth, width, seed, int(totals[i]), int(nnz[i])],
                                 [u_tok[sl], u_cnt[sl]]))
    return out


def leaf_window_blobs(tokens: np.ndarray, window: int, depth: int, width: int, seed: int,
                      phase: int = 0) -> list[bytes]:
    """Serialized CMS nodes for every consecutive ``window``-token slice of
    ``tokens`` in one lexsort pass. Each window is stored in CANONICAL form:
    sparse exact (token, count) pairs while nnz <= sparse_max_nnz (lossless
    — densifying reproduces ``CountMinSketch.update(slice).to_bytes()`` byte
    for byte; see densify_blob), dense otherwise.
    ``phase`` = stream offset of tokens[0] within its window (global-axis
    builds: blob i is the PARTIAL sketch of stream window first_w + i)."""
    n = len(tokens)
    if n == 0:
        return []
    nw = (phase + n + window - 1) // window
    w = (phase + np.arange(n, dtype=np.int64)) // window
    return _pack_slot_blobs(np.asarray(tokens, dtype=np.int64), w, nw, depth, width, seed)


def partial_blobs_by_slot(tokens: np.ndarray, slots: np.ndarray, n_slots: int,
                          depth: int, width: int, seed: int) -> list[bytes]:
    """Serialized CMS nodes for an ARBITRARY per-token slot assignment
    (cross-doc generalization of ``leaf_window_blobs`` — see
    hll.partial_blobs_by_slot). Blob i covers exactly the tokens whose
    slot == i, in the same canonical sparse/dense form as every other build
    path (so per-doc and batched builds stay byte-identical)."""
    return _pack_slot_blobs(tokens, slots, n_slots, depth, width, seed)


def _blob_tables(blobs: list[bytes], depth: int, width: int, seed: int,
                 magic_dense: int = _MAGIC_CMS) -> np.ndarray:
    mats = np.empty((len(blobs), depth * width), dtype=np.int64)
    for i, b in enumerate(blobs):
        _check_cms_blob(bytes(b), depth, width, seed, magic_dense)
        mats[i] = np.frombuffer(b, dtype=np.int64, count=depth * width, offset=_CMS_TABLE_OFFSET)
    return mats


_CMS_SP_NNZ_OFFSET = 4 + 4 * 8
_CMS_SP_TOK_OFFSET = 4 + 5 * 8 + 1 + 9


def _check_sp_blob(b: bytes, depth: int, width: int, seed: int) -> None:
    d, w, sd = struct.unpack_from("<3q", b, 4)
    if (d, w, sd) != (depth, width, seed):
        raise ValueError(f"sparse node params {(d, w, sd)} != {(depth, width, seed)}")


def _sp_entries(b: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(tokens, counts) of a sparse node blob without base.unpack overhead."""
    (nnz,) = struct.unpack_from("<q", b, _CMS_SP_NNZ_OFFSET)
    toks = np.frombuffer(b, dtype=np.int64, count=nnz, offset=_CMS_SP_TOK_OFFSET)
    cnts = np.frombuffer(b, dtype=np.int64, count=nnz,
                         offset=_CMS_SP_TOK_OFFSET + 8 * nnz + 9)
    return toks, cnts


def rank_blobs(blobs: list[bytes], vs: np.ndarray) -> np.ndarray:
    """(len(blobs), len(vs)) EXACT ranks — count of tokens <= v per node —
    defined ONLY for SPARSE-exact CMS nodes (magic 12), whose sorted
    (token, count) pairs enumerate the window content exactly (linear
    merges keep a merged range node sparse-exact while its nnz stays
    <= sparse_max_nnz, so on a low-vocab corpus the answer is exact all
    the way up the dyadic cover). REFUSES dense nodes loudly: a dense CMS
    table cannot enumerate its keys, so an exact rank is unrecoverable —
    callers fall back to a quantile-sketch CDF estimate (t-digest/KLL)
    there, exactly like range_f2's sparse-only exactness contract."""
    vs = np.asarray(vs, dtype=np.int64)
    out = np.empty((len(blobs), len(vs)), dtype=np.int64)
    for i, b in enumerate(blobs):
        b = bytes(b)
        if b[0] != _MAGIC_CMS_SP:
            raise ValueError(
                f"rank_blobs: node {i} is not sparse-exact (magic {b[0]}); "
                "exact ranks need enumerable content — use the t-digest cdf estimate"
            )
        toks, cnts = _sp_entries(b)  # tokens sorted ascending (np.unique)
        csum = np.concatenate([[0], np.cumsum(cnts)])
        out[i] = csum[np.searchsorted(toks, vs, side="right")]
    return out


def blob_params(b: bytes) -> tuple[int, int, int]:
    """(depth, width, seed) of a dense OR sparse CMS/CS node blob."""
    b = bytes(b)
    if b[0] not in (_MAGIC_CMS, _MAGIC_CMS_SP, _MAGIC_CS, _MAGIC_CS_SP):
        raise ValueError(f"unknown sketch magic {b[0]} (expected a CMS/CS node)")
    d, w, s = struct.unpack_from("<3q", b, 4)
    return int(d), int(w), int(s)


def densify_blob(b: bytes) -> bytes:
    """Dense-format bytes of any CMS or CS node blob: identity on dense,
    exact densification (both sketches are linear) on sparse —
    byte-identical to the table ``CountMinSketch.update`` (CMS family) /
    ``CountSketch.update`` (CS family) would have produced from the same
    content. The family is read off the magic byte."""
    b = bytes(b)
    if b[0] in (_MAGIC_CMS, _MAGIC_CS):
        return b
    if b[0] not in (_MAGIC_CMS_SP, _MAGIC_CS_SP):
        raise ValueError(f"unknown sketch magic {b[0]} (expected a CMS/CS node)")
    signed = b[0] == _MAGIC_CS_SP
    _, (depth, width, seed, total, _nnz), (toks, cnts) = base.unpack(b)
    table = np.zeros(depth * width, dtype=np.int64)
    for r in range(depth):
        bk = (hash64(toks, seed + 1000003 * r) % _U64(width)).astype(np.int64)
        w_cnt = cnts * _cs_signs(toks, seed, r) if signed else cnts
        np.add.at(table, r * width + bk, w_cnt)
    return base.pack(_MAGIC_CS if signed else _MAGIC_CMS,
                     [depth, width, seed, int(total)], [table])


def window_totals(blobs: list[bytes]) -> np.ndarray:
    """EXACT token count of each blob's window (dense: stored alongside the
    table at update time; sparse: sum of pair counts — every CMS/CS node
    form stores it in the same header slot)."""
    out = np.empty(len(blobs), dtype=np.int64)
    for i, b in enumerate(blobs):
        b = bytes(b)
        if b[0] not in (_MAGIC_CMS, _MAGIC_CMS_SP, _MAGIC_CS, _MAGIC_CS_SP):
            raise ValueError(f"unknown sketch magic {b[0]} (expected a CMS/CS node)")
        (out[i],) = struct.unpack_from("<q", b, _CMS_TOTAL_OFFSET)
    return out


def merge_blob_groups(blobs: list[bytes], counts: np.ndarray, depth: int, width: int, seed: int) -> list[bytes]:
    """Merge consecutive groups of serialized CMS nodes (group i = the next
    ``counts[i]`` blobs), sparse/dense mixed. Output representation follows
    the canonical content rule (sparse iff the merged content's nnz <=
    sparse_max_nnz and no child had already densified — equivalent, since
    nnz is monotone under merge): order-independent, and dense outputs are
    byte-identical to the all-dense pipeline (elementwise add is exact)."""
    return _merge_blob_groups_impl(blobs, counts, depth, width, seed,
                                   _MAGIC_CMS, _MAGIC_CMS_SP, False)


def _merge_blob_groups_impl(blobs, counts, depth: int, width: int, seed: int,
                            magic_dense: int, magic_sparse: int,
                            signed: bool) -> list[bytes]:
    if not blobs:
        return []
    blobs = [bytes(b) for b in blobs]
    counts = np.asarray(counts, dtype=np.int64)
    if (counts <= 0).any() or int(counts.sum()) != len(blobs):
        # reduceat's repeated-start semantics would silently hand a
        # zero-count group its neighbor's first child — refuse loudly
        raise ValueError("merge groups must be positive and cover every blob")
    ngroups = len(counts)
    starts = np.zeros(ngroups, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    totals = window_totals(blobs)
    merged_tot = np.add.reduceat(totals, starts)
    is_sp = np.fromiter((b[0] == magic_sparse for b in blobs), dtype=bool, count=len(blobs))
    if not is_sp.any():
        mats = _blob_tables(blobs, depth, width, seed, magic_dense)
        merged = base.grouped_reduce(np.add, mats, counts)
        return [
            base.pack(magic_dense, [depth, width, seed, int(merged_tot[i])], [merged[i]])
            for i in range(merged.shape[0])
        ]
    max_nnz = sparse_max_nnz(depth, width)
    gid = np.repeat(np.arange(ngroups, dtype=np.int64), counts)
    sp_idx = np.flatnonzero(is_sp)
    for i in sp_idx:
        _check_sp_blob(blobs[i], depth, width, seed)
    pairs = [_sp_entries(blobs[i]) for i in sp_idx]
    sp_tok = np.concatenate([t for t, _ in pairs]) if pairs else np.empty(0, np.int64)
    sp_cnt = np.concatenate([c for _, c in pairs]) if pairs else np.empty(0, np.int64)
    sp_gid = np.repeat(gid[sp_idx], [len(t) for t, _ in pairs])
    if len(sp_tok):
        u_tok, u_cnt, u_gid, g_nnz = _unique_slot_pairs(sp_tok, sp_gid, ngroups, weights=sp_cnt)
    else:
        u_tok = u_cnt = u_gid = np.empty(0, np.int64)
        g_nnz = np.zeros(ngroups, dtype=np.int64)
    has_dense = np.bincount(gid[~is_sp], minlength=ngroups) > 0
    out_sparse = (~has_dense) & (g_nnz <= max_nnz)
    dense_groups = np.flatnonzero(~out_sparse)
    drow = np.full(ngroups, -1, dtype=np.int64)
    if len(dense_groups):
        drow[dense_groups] = np.arange(len(dense_groups))
        acc = np.zeros((len(dense_groups), depth * width), dtype=np.int64)
        dn_idx = np.flatnonzero(~is_sp)
        if len(dn_idx):
            mats = _blob_tables([blobs[i] for i in dn_idx], depth, width, seed, magic_dense)
            np.add.at(acc, drow[gid[dn_idx]], mats)
        sel = drow[u_gid] >= 0 if len(u_gid) else np.empty(0, dtype=bool)
        if len(u_gid) and sel.any():
            r_tok, r_cnt, r_row = u_tok[sel], u_cnt[sel], drow[u_gid[sel]]
            for r in range(depth):
                bk = (hash64(r_tok, seed + 1000003 * r) % _U64(width)).astype(np.int64)
                w_cnt = r_cnt * _cs_signs(r_tok, seed, r) if signed else r_cnt
                np.add.at(acc, (r_row, r * width + bk), w_cnt)
    sp_bounds = np.zeros(ngroups + 1, dtype=np.int64)
    np.cumsum(g_nnz, out=sp_bounds[1:])
    out: list[bytes] = []
    for g in range(ngroups):
        if out_sparse[g]:
            sl = slice(sp_bounds[g], sp_bounds[g + 1])
            out.append(base.pack(magic_sparse,
                                 [depth, width, seed, int(merged_tot[g]), int(g_nnz[g])],
                                 [u_tok[sl], u_cnt[sl]]))
        else:
            out.append(base.pack(magic_dense, [depth, width, seed, int(merged_tot[g])],
                                 [acc[drow[g]]]))
    return out


def estimate_blobs(blobs: list[bytes], keys: np.ndarray, depth: int, width: int, seed: int) -> np.ndarray:
    """(len(blobs), len(keys)) frequency estimates in one vectorized pass —
    min-over-rows per dense blob (``CountMinSketch.estimate``), EXACT lookup
    per sparse blob (still within the overestimate-only eps*N contract:
    exact is the zero-error case)."""
    return _estimate_blobs_impl(blobs, keys, depth, width, seed,
                                _MAGIC_CMS, _MAGIC_CMS_SP, False)


def _estimate_blobs_impl(blobs, keys, depth: int, width: int, seed: int,
                         magic_dense: int, magic_sparse: int,
                         signed: bool) -> np.ndarray:
    """Shared estimate kernel: min-over-rows (CMS, int64) or median of
    signed rows (cs, float64 — the median of an even row count is a half
    integer; truncating it would bias the UNBIASED estimator toward zero).
    Sparse blobs answer exactly after the same param validation dense ones
    get."""
    out_dtype = np.float64 if signed else np.int64
    if not blobs:
        return np.empty((0, len(keys)), dtype=out_dtype)
    keys = np.asarray(keys, dtype=np.int64)
    blobs = [bytes(b) for b in blobs]
    is_sp = np.fromiter((b[0] == magic_sparse for b in blobs), dtype=bool, count=len(blobs))
    out = np.empty((len(blobs), len(keys)), dtype=out_dtype)
    dn = np.flatnonzero(~is_sp)
    if len(dn):
        mats = _blob_tables([blobs[i] for i in dn], depth, width, seed,
                            magic_dense).reshape(len(dn), depth, width)
        buckets = _row_buckets(keys, seed, depth, width)  # (depth, nk)
        if signed:
            ests = np.stack([
                mats[:, r, buckets[r]] * _cs_signs(keys, seed, r)[None, :]
                for r in range(depth)
            ])  # (depth, nb, nk)
            out[dn] = np.median(ests, axis=0)
        else:
            ests = np.stack([mats[:, r, buckets[r]] for r in range(depth)])
            out[dn] = ests.min(axis=0)
    sp = np.flatnonzero(is_sp)
    if len(sp):
        # batched exact lookup: concatenate every sparse blob's entries once
        # and answer all probes with one vector pass per key (tokens are
        # DISTINCT within a blob, so each (blob, key) has at most one hit) —
        # a per-blob searchsorted loop here was the window_freq_estimates
        # slow path when (as under default params) every leaf is sparse
        for i in sp:
            _check_sp_blob(blobs[i], depth, width, seed)
        pairs = [_sp_entries(blobs[i]) for i in sp]
        all_tok = np.concatenate([t for t, _ in pairs]) if pairs else np.empty(0, np.int64)
        all_cnt = np.concatenate([c for _, c in pairs]) if pairs else np.empty(0, np.int64)
        row_of = np.repeat(np.arange(len(sp)), [len(t) for t, _ in pairs])
        sp_out = np.zeros((len(sp), len(keys)), dtype=out_dtype)
        for j, k in enumerate(keys):
            m = all_tok == k
            sp_out[row_of[m], j] = all_cnt[m]
        out[sp] = sp_out
    return out


# ---------------------------------------------------------------------------
# Signed count-sketch (AMS) window-node kernels: the cs window family.
# Same canonical sparse/dense representation machinery as the CMS kernels
# (sparse nodes are EXACT (token, count) pairs — identical wire shape, own
# magic; dense nodes are CountSketch tables, byte-identical to
# CountSketch.update of the window's content). Linear, so parents are
# byte-exact rollups. One table answers two range questions:
#   frequency — UNBIASED (median of signed row values, two-sided error
#   3*sqrt(F2/width) w.h.p., vs CMS's overestimate-only eps*N), and
#   F2 (second moment / self-join size) — median over rows of the row's
#   sum of squares (Alon-Matias-Szegedy; Var <= 2*F2^2/width per row).
# Sparse nodes answer both EXACTLY (zero error, inside every bound).
# ---------------------------------------------------------------------------

def cs_leaf_window_blobs(tokens: np.ndarray, window: int, depth: int, width: int,
                         seed: int, phase: int = 0) -> list[bytes]:
    """cs twin of ``leaf_window_blobs`` (same slot geometry, signed dense
    packing, magics _MAGIC_CS/_MAGIC_CS_SP)."""
    n = len(tokens)
    if n == 0:
        return []
    nw = (phase + n + window - 1) // window
    w = (phase + np.arange(n, dtype=np.int64)) // window
    return _pack_slot_blobs(np.asarray(tokens, dtype=np.int64), w, nw,
                            depth, width, seed, _MAGIC_CS, _MAGIC_CS_SP, True)


def cs_partial_blobs_by_slot(tokens: np.ndarray, slots: np.ndarray, n_slots: int,
                             depth: int, width: int, seed: int) -> list[bytes]:
    """cs twin of ``partial_blobs_by_slot``."""
    return _pack_slot_blobs(tokens, slots, n_slots, depth, width, seed,
                            _MAGIC_CS, _MAGIC_CS_SP, True)


def cs_merge_blob_groups(blobs: list[bytes], counts: np.ndarray, depth: int,
                         width: int, seed: int) -> list[bytes]:
    """cs twin of ``merge_blob_groups`` — same canonical content rule,
    signed densification (count-sketch is linear too, so dense outputs are
    byte-identical to the all-dense pipeline)."""
    return _merge_blob_groups_impl(blobs, counts, depth, width, seed,
                                   _MAGIC_CS, _MAGIC_CS_SP, True)


def cs_estimate_blobs(blobs: list[bytes], keys: np.ndarray, depth: int, width: int,
                      seed: int) -> np.ndarray:
    """(len(blobs), len(keys)) UNBIASED frequency estimates (float64):
    median of signed row values per dense blob (``CountSketch.estimate``
    exactly — even depths give half-integer medians, preserved), EXACT
    lookup per sparse blob."""
    return _estimate_blobs_impl(blobs, keys, depth, width, seed,
                                _MAGIC_CS, _MAGIC_CS_SP, True)


def cs_inner_product_blobs(blobs_a: list[bytes], blobs_b: list[bytes]) -> np.ndarray:
    """Pairwise inner product <f_a, f_b> of the two token-frequency vectors
    summarized by blobs_a[i] and blobs_b[i] (float64): EXACT when both nodes
    are sparse (sum over common tokens of cnt_a * cnt_b — zero error), the
    AMS sketch-dot estimate otherwise (per row r: sum_w A[r,w]*B[r,w] is an
    unbiased estimator of <f_a, f_b> because the two sketches share sign and
    bucket hashes — same seed required — and cross terms cancel in
    expectation; median over rows, |err| = O(sqrt(F2_a*F2_b/width)) w.h.p.,
    Alon-Matias-Szegedy generalized to join-size estimation). Both blobs of
    a pair must carry identical (depth, width, seed) — validated."""
    if len(blobs_a) != len(blobs_b):
        raise ValueError("inner product needs equal-length blob lists")
    out = np.empty(len(blobs_a), dtype=np.float64)
    for i, (ba, bb) in enumerate(zip(blobs_a, blobs_b)):
        ba, bb = bytes(ba), bytes(bb)
        if ba[0] not in (_MAGIC_CS, _MAGIC_CS_SP) or bb[0] not in (_MAGIC_CS, _MAGIC_CS_SP):
            raise ValueError(
                f"unknown sketch magics ({ba[0]}, {bb[0]}) (expected cs nodes)")
        pa, pb = blob_params(ba), blob_params(bb)
        if pa != pb:
            raise ValueError(f"inner-product pair params differ: {pa} != {pb}")
        if ba[0] == _MAGIC_CS_SP and bb[0] == _MAGIC_CS_SP:
            # sparse x sparse: exact dot over the token intersection (entries
            # are token-sorted by construction — every pack path lexsorts)
            ta, ca = _sp_entries(ba)
            tb, cb = _sp_entries(bb)
            if len(ta) == 0 or len(tb) == 0:
                out[i] = 0.0
                continue
            pos = np.searchsorted(tb, ta)
            ok = pos < len(tb)
            hit = np.zeros(len(ta), dtype=bool)
            hit[ok] = tb[pos[ok]] == ta[ok]
            out[i] = float(
                (ca[hit].astype(np.float64) * cb[pos[hit]].astype(np.float64)).sum()
            )
        else:
            d, w, _s = pa
            da, db = densify_blob(ba), densify_blob(bb)
            ta = np.frombuffer(da, dtype=np.int64, count=d * w,
                               offset=_CMS_TABLE_OFFSET).reshape(d, w)
            tb = np.frombuffer(db, dtype=np.int64, count=d * w,
                               offset=_CMS_TABLE_OFFSET).reshape(d, w)
            out[i] = float(np.median(
                (ta.astype(np.float64) * tb.astype(np.float64)).sum(axis=1)))
    return out


def f2_blobs(blobs: list[bytes]) -> np.ndarray:
    """Second frequency moment of each blob's window content (float64):
    EXACT sum of squared counts per sparse blob, AMS median-of-rows
    estimate per dense blob. The node representation rule makes this a
    continuum — small windows are exact, large ones carry the published
    2*F2^2/width variance per row."""
    out = np.empty(len(blobs), dtype=np.float64)
    for i, b in enumerate(blobs):
        b = bytes(b)
        if b[0] == _MAGIC_CS_SP:
            _toks, cnts = _sp_entries(b)
            out[i] = float(np.square(cnts.astype(np.float64)).sum())
        elif b[0] == _MAGIC_CS:
            d, w, _s = blob_params(b)
            table = np.frombuffer(b, dtype=np.int64, count=d * w,
                                  offset=_CMS_TABLE_OFFSET).reshape(d, w)
            out[i] = float(np.median(np.square(table.astype(np.float64)).sum(axis=1)))
        else:
            raise ValueError(f"unknown sketch magic {b[0]} (expected a cs node)")
    return out


def subtract_blobs(pos: list[bytes], neg: list[bytes], depth: int, width: int,
                   seed: int, magic_dense: int = _MAGIC_CMS,
                   magic_sparse: int = _MAGIC_CMS_SP,
                   signed: bool = False) -> list[bytes]:
    """Pairwise LINEAR REMOVAL: ``pos[i] - neg[i]`` — the content-takedown
    primitive only the linear families (CMS add / CountSketch signed add)
    admit. The caller's contract is that each neg node's content is a
    SUBSET of its pos node's content (the takedown op builds neg from the
    indexed corpus rows themselves, so this holds by construction); the
    kernel refuses what it can detect: a neg token absent from a sparse pos
    node, a sparse count or unsigned dense cell driven negative, or a
    negative remaining total. (The dense cell guard is necessary, not
    sufficient — collisions can mask over-removal; the contract, not the
    guard, is the soundness argument.)

    Representation: sparse - sparse stays sparse (exact pairs, zeros
    dropped — byte-identical to a scratch build of the remaining content);
    dense pos stays DENSE even if the remaining nnz re-enters the sparse
    range (the pairs are unrecoverable from a table) — content-equal to
    densify(scratch) byte for byte, which is what the parity tests pin.
    A neg denser than its pos is impossible under the subset contract
    (nnz is monotone) and refuses."""
    if len(pos) != len(neg):
        raise ValueError("subtract_blobs: pos/neg must pair up")
    out: list[bytes] = []
    for p_, n_ in zip(pos, neg):
        p_, n_ = bytes(p_), bytes(n_)
        p_sp, n_sp = p_[0] == magic_sparse, n_[0] == magic_sparse
        for b, is_sp in ((p_, p_sp), (n_, n_sp)):
            if is_sp:
                _check_sp_blob(b, depth, width, seed)
            else:
                _check_cms_blob(b, depth, width, seed, magic_dense)
        (p_tot,) = struct.unpack_from("<q", p_, _CMS_TOTAL_OFFSET)
        (n_tot,) = struct.unpack_from("<q", n_, _CMS_TOTAL_OFFSET)
        tot = p_tot - n_tot
        if tot < 0:
            raise ValueError(
                f"subtract_blobs: removal total {n_tot} exceeds node total {p_tot}")
        if p_sp and not n_sp:
            raise ValueError(
                "subtract_blobs: dense removal from a sparse node — the "
                "removed content cannot exceed the indexed content (subset "
                "contract violated)")
        if p_sp:  # sparse - sparse: exact pair arithmetic
            pt, pc = _sp_entries(p_)
            nt, nc = _sp_entries(n_)
            idx = np.searchsorted(pt, nt)
            if len(nt) and ((idx >= len(pt)).any() or (pt[np.minimum(idx, len(pt) - 1)] != nt).any()):
                raise ValueError(
                    "subtract_blobs: removing a token the node never indexed")
            new_c = pc.copy()
            np.subtract.at(new_c, idx, nc)
            if (new_c < 0).any():
                raise ValueError(
                    "subtract_blobs: removal count exceeds indexed count")
            keep = new_c > 0
            out.append(base.pack(
                magic_sparse,
                [depth, width, seed, int(tot), int(keep.sum())],
                [pt[keep].copy(), new_c[keep].copy()]))
            continue
        table = np.frombuffer(
            p_, dtype=np.int64, count=depth * width,
            offset=_CMS_TABLE_OFFSET).copy()
        if n_sp:
            nt, nc = _sp_entries(n_)
            for r in range(depth):
                bk = (hash64(nt, seed + 1000003 * r) % _U64(width)).astype(np.int64)
                w_cnt = nc * _cs_signs(nt, seed, r) if signed else nc
                np.subtract.at(table, r * width + bk, w_cnt)
        else:
            ntab = np.frombuffer(n_, dtype=np.int64, count=depth * width,
                                 offset=_CMS_TABLE_OFFSET)
            table -= ntab
        if not signed and (table < 0).any():
            raise ValueError(
                "subtract_blobs: a cell went negative — removing content "
                "the node never indexed")
        out.append(base.pack(magic_dense, [depth, width, seed, int(tot)], [table]))
    return out


def cs_subtract_blobs(pos: list[bytes], neg: list[bytes], depth: int,
                      width: int, seed: int) -> list[bytes]:
    """CountSketch twin of subtract_blobs (signed rows: cells may legally
    go negative, so only the total and sparse-pair guards apply)."""
    return subtract_blobs(pos, neg, depth, width, seed,
                          _MAGIC_CS, _MAGIC_CS_SP, True)
