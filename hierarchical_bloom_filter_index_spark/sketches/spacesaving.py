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

import struct

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


# ---------------------------------------------------------------------------
# Window-index kernels (blob-level, vectorized) — the Misra-Gries member of
# the window-sketch family (rollup.window_sketch_family "mg").
#
# Wire format: EXACTLY ``MisraGries.to_bytes()`` (magic 10, params [k,
# n_total], arrays [keys, counts], keys sorted ascending), so every window
# node round-trips through the object path unchanged.
#
# Merge discipline: a GROUP merge is "keywise sum of all children, then ONE
# prune" (the Agarwal et al. mergeable-summaries merge applied flat). That
# makes each flat merge a PURE FUNCTION of the child blob multiset — child
# ORDER never changes the bytes (keywise sum commutes, the prune is
# deterministic), unlike the object path's sequential fold which prunes per
# step. The dyadic builds fix the merge TREE by geometry (leaf -> parent per
# level), so every build/append path over the same content produces
# byte-identical nodes; only arbitrary re-association (never used by an
# index path) is merely bound-preserving. The (n_total - sum(counts))/(k+1)
# error bound is association-free (each prune removes >= (k+1) * decrement
# of mass), so estimates/candidates stay certified under ANY merge tree.
#
# With ``k >= leaf_span`` a leaf never prunes — leaf nodes are EXACT
# (token, count) tables, the same sparse-exact economics as the CMS/HLL
# sparse nodes (cms.py magic 12 rationale).
# ---------------------------------------------------------------------------

# magic B | version B | n_params H | k q | n_total q | n_arrays B
# | keys: dtype B, len Q, data | counts: dtype B, len Q, data
_MG_K_OFF = 4
_MG_N_OFF = 12
_MG_NNZ_OFF = 22
_MG_KEYS_OFF = 30


def _mg_entries(b: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(keys, counts) of an MG node blob without base.unpack overhead."""
    (nnz,) = struct.unpack_from("<Q", b, _MG_NNZ_OFF)
    keys = np.frombuffer(b, dtype=np.int64, count=nnz, offset=_MG_KEYS_OFF)
    cnts = np.frombuffer(b, dtype=np.int64, count=nnz,
                         offset=_MG_KEYS_OFF + 8 * nnz + 9)
    return keys, cnts


def _check_mg_blob(b: bytes, k: int) -> None:
    if b[0] != _MAGIC_MG:
        raise ValueError(f"unknown sketch magic {b[0]} (expected MisraGries)")
    (bk,) = struct.unpack_from("<q", b, _MG_K_OFF)
    if bk != k:
        raise ValueError(f"MisraGries blob k {bk} != {k}")


def blob_k(b: bytes) -> int:
    b = bytes(b)
    if b[0] != _MAGIC_MG:
        raise ValueError(f"unknown sketch magic {b[0]} (expected MisraGries)")
    (k,) = struct.unpack_from("<q", b, _MG_K_OFF)
    return int(k)


def blob_totals(blobs: list[bytes]) -> np.ndarray:
    """EXACT item count of each blob's window (n_total adds under merge)."""
    out = np.empty(len(blobs), dtype=np.int64)
    for i, b in enumerate(blobs):
        b = bytes(b)
        if b[0] != _MAGIC_MG:
            raise ValueError(f"unknown sketch magic {b[0]} (expected MisraGries)")
        (out[i],) = struct.unpack_from("<q", b, _MG_N_OFF)
    return out


def _prune_pair(keys: np.ndarray, counts: np.ndarray, k: int):
    """One Misra-Gries prune of an exact/summed counter table to <= k."""
    n = len(counts)
    if n <= k:
        return keys, counts
    d = np.partition(counts, n - (k + 1))[n - (k + 1)]
    keep = counts > d
    return keys[keep], counts[keep] - int(d)


def _pack_slot_summaries(keys: np.ndarray, slots: np.ndarray, n_slots: int,
                         k: int) -> list[bytes]:
    """One MG blob per slot from raw (key, slot) pairs — exact per-slot
    counts in one lexsort pass (cms._unique_slot_pairs), pruned only where a
    slot's nnz exceeds k."""
    from .cms import _unique_slot_pairs

    keys = np.asarray(keys, dtype=np.int64)
    s = np.asarray(slots, dtype=np.int64)
    if len(keys) == 0:
        e = np.empty(0, np.int64)
        return [base.pack(_MAGIC_MG, [k, 0], [e, e])] * n_slots
    totals = np.bincount(s, minlength=n_slots)
    u_tok, u_cnt, _u_slot, nnz = _unique_slot_pairs(keys, s, n_slots)
    bounds = np.zeros(n_slots + 1, dtype=np.int64)
    np.cumsum(nnz, out=bounds[1:])
    out: list[bytes] = []
    for i in range(n_slots):
        sl = slice(bounds[i], bounds[i + 1])
        tk, ct = _prune_pair(u_tok[sl], u_cnt[sl], k)
        out.append(base.pack(_MAGIC_MG, [k, int(totals[i])], [tk, ct]))
    return out


def leaf_window_blobs(tokens: np.ndarray, window: int, k: int,
                      phase: int = 0) -> list[bytes]:
    """Serialized MG nodes for every consecutive ``window``-token slice of
    ``tokens`` (leaf-index shape of cms.leaf_window_blobs). ``phase`` =
    stream offset of tokens[0] within its window (global-axis partials)."""
    n = len(tokens)
    if n == 0:
        return []
    nw = (phase + n + window - 1) // window
    w = (phase + np.arange(n, dtype=np.int64)) // window
    return _pack_slot_summaries(np.asarray(tokens, dtype=np.int64), w, nw, k)


def partial_blobs_by_slot(tokens: np.ndarray, slots: np.ndarray, n_slots: int,
                          k: int) -> list[bytes]:
    """MG nodes for an arbitrary per-token slot assignment (the cross-doc
    global-leaf primitive — see cms.partial_blobs_by_slot)."""
    return _pack_slot_summaries(tokens, slots, n_slots, k)


def merge_blob_groups(blobs: list[bytes], counts: np.ndarray, k: int) -> list[bytes]:
    """Merge consecutive groups of MG node blobs (group i = the next
    ``counts[i]`` blobs): keywise sum over the WHOLE group, then one prune —
    byte-deterministic in the group's child multiset (order-free)."""
    if not blobs:
        return []
    from .cms import _unique_slot_pairs

    blobs = [bytes(b) for b in blobs]
    counts = np.asarray(counts, dtype=np.int64)
    ngroups = len(counts)
    starts = np.zeros(ngroups, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    for b in blobs:
        _check_mg_blob(b, k)
    totals = blob_totals(blobs)
    merged_tot = np.add.reduceat(totals, starts)
    gid = np.repeat(np.arange(ngroups, dtype=np.int64), counts)
    pairs = [_mg_entries(b) for b in blobs]
    lens = [len(t) for t, _ in pairs]
    all_tok = np.concatenate([t for t, _ in pairs]) if sum(lens) else np.empty(0, np.int64)
    all_cnt = np.concatenate([c for _, c in pairs]) if sum(lens) else np.empty(0, np.int64)
    tok_gid = np.repeat(gid, lens)
    if len(all_tok):
        u_tok, u_cnt, _u_gid, g_nnz = _unique_slot_pairs(all_tok, tok_gid, ngroups,
                                                         weights=all_cnt)
    else:
        u_tok = u_cnt = np.empty(0, np.int64)
        g_nnz = np.zeros(ngroups, dtype=np.int64)
    bounds = np.zeros(ngroups + 1, dtype=np.int64)
    np.cumsum(g_nnz, out=bounds[1:])
    out: list[bytes] = []
    for g in range(ngroups):
        sl = slice(bounds[g], bounds[g + 1])
        tk, ct = _prune_pair(u_tok[sl], u_cnt[sl], k)
        out.append(base.pack(_MAGIC_MG, [k, int(merged_tot[g])], [tk, ct]))
    return out


def tracked_blobs(blobs: list[bytes]
                  ) -> list[tuple[np.ndarray, np.ndarray, int, int]]:
    """Per blob: (keys, est_counts, n_total, resid) — the raw MG summary
    content plus its certification inputs. ``resid = n_total - sum(est)``
    is the total decrement mass: a key NOT in ``keys`` has true count
    <= resid / (k+1), and a tracked key's true count lies in
    [est, est + resid/(k+1)]. This is what lets a top-k query certify
    itself post-verification: once the k-th EXACT count strictly exceeds
    resid/(k+1), no untracked key can displace a reported one."""
    out: list[tuple[np.ndarray, np.ndarray, int, int]] = []
    for b in blobs:
        b = bytes(b)
        if b[0] != _MAGIC_MG:
            raise ValueError(f"unknown sketch magic {b[0]} (expected MisraGries)")
        (n,) = struct.unpack_from("<q", b, _MG_N_OFF)
        keys, cnts = _mg_entries(b)
        out.append((keys.copy(), cnts.copy(), int(n), int(n) - int(cnts.sum())))
    return out


def heavy_candidate_blobs(blobs: list[bytes], phi_num: int, phi_den: int
                          ) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per blob: candidate (keys, est_counts) covering EVERY key with true
    frequency >= (phi_num/phi_den) * n_total — the heavy_hitters() superset
    cut in exact integer arithmetic (a float rounding that excluded a heavy
    key would be unsound). REFUSES (ValueError) when the state's error bound
    cannot certify the superset (k too small for phi); sizing
    k + 1 > phi_den/phi_num makes refusal impossible."""
    if phi_num <= 0 or phi_den <= 0 or phi_num > phi_den:
        raise ValueError(f"phi must be a fraction in (0, 1]: {phi_num}/{phi_den}")
    out: list[tuple[np.ndarray, np.ndarray]] = []
    for b in blobs:
        b = bytes(b)
        k = blob_k(b)
        (n,) = struct.unpack_from("<q", b, _MG_N_OFF)
        keys, cnts = _mg_entries(b)
        resid = int(n) - int(cnts.sum())  # = err_bound * (k+1), exact
        if n > 0 and resid * phi_den >= phi_num * n * (k + 1):
            raise ValueError(
                f"cannot certify phi={phi_num}/{phi_den} heavy hitters: "
                f"err_bound {resid / (k + 1):.1f} >= phi*n — size k+1 > 1/phi"
            )
        # keep iff est + err >= phi*n  <=>  cnt*(k+1) + resid >= phi*n*(k+1)
        keep = (cnts * (k + 1) + resid) * phi_den >= phi_num * int(n) * (k + 1)
        out.append((keys[keep].copy(), cnts[keep].copy()))
    return out
