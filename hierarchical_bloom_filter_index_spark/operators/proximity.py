"""Proximity search: positions of token A within ``w`` tokens of token B.

A CONJUNCTIVE use of the Bloom window index the point-query surface lacks:
both tokens are probed in ONE leaf-level scan, a doc survives only if some
A-candidate window has a B-candidate window within the window radius, and
the exact position pairs are recovered by a numpy verification pass over the
survivors only. Same sketch-prunes / verification-decides contract as
pattern_search (reference: PMIndex/HBI.java report + BlockSearch probes —
this composes those probes conjunctively).

Soundness: Bloom probes have no false negatives, so for any true pair
(i, j) with |i - j| <= w the window of i is A-positive and the window of j
(within ``radius = ceil(w / span)`` windows) is B-positive — the candidate
set is a superset, and restricting verification to A-positions inside
candidate windows loses nothing.

Scale shape: one filtered level scan (vectorized probe, two keys per blob),
a per-doc sorted-array intersection (no |A-windows| x |B-windows| join — a
frequent token pair would make that quadratic per doc), and verification
that touches only surviving docs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import HbiConfig
from .probe import probe_blobs

PAIR_SCHEMA = "doc_id string, pos_a int, pos_b int"


# ---------------------------------------------------------------------------
# Shared kernels. Every proximity surface (single/batch x doc/global x
# conjunctive/chain/negated) is a composition of the SAME five primitives —
# probe, window-reach intersection, position-pair expansion, backward
# existence DP, fragment assembly. They were once copy-pasted per surface;
# the divergence caused a real bug (the absent-level refusal existed on some
# surfaces only), so they live here exactly once.
# ---------------------------------------------------------------------------

PAIR_PROBE_DOC_SCHEMA = "doc_id string, w_id long, ok_a boolean, ok_b boolean"
PAIR_PROBE_GLOBAL_SCHEMA = "w_id long, ok_a boolean, ok_b boolean"
SPARSE_PROBE_DOC_SCHEMA = "doc_id string, w_id long, k int"
SPARSE_PROBE_GLOBAL_SCHEMA = "w_id long, k int"


def _probe_pair_fn(keys: np.ndarray, with_doc: bool):
    """Two-key Bloom probe over level rows -> (doc_id?, w_id, ok_a, ok_b),
    keeping only windows positive for at least one key."""
    cols = ["doc_id", "w_id"] if with_doc else ["w_id"]

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ok = probe_blobs(pdf["bloom"].tolist(), keys)  # (n, 2)
            any_hit = ok.any(axis=1)
            out = pdf.loc[any_hit, cols].copy()
            out["ok_a"] = ok[any_hit, 0]
            out["ok_b"] = ok[any_hit, 1]
            yield out

    return probe


def _probe_sparse_fn(ukeys: np.ndarray, with_doc: bool):
    """Multi-key Bloom probe -> sparse positive rows (doc_id?, w_id, k):
    unbounded key count and only positive probes move to the shuffle."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ok = probe_blobs(pdf["bloom"].tolist(), ukeys)  # (n, n_keys)
            r, c = np.nonzero(ok)
            if len(r) == 0:
                continue
            out = {"w_id": pdf["w_id"].to_numpy()[r], "k": c.astype(np.int32)}
            if with_doc:
                out = {"doc_id": pdf["doc_id"].to_numpy()[r], **out}
            yield pd.DataFrame(out)

    return probe


def _reach_mask(wa: np.ndarray, wb: np.ndarray, back: int, fwd: int) -> np.ndarray:
    """Per wa entry: is there a wb entry in [wa - back, wa + fwd]? One
    searchsorted pass over the SORTED arrays — never a wa x wb join (a
    frequent token pair would make that quadratic)."""
    lo = np.searchsorted(wb, wa - back, side="left")
    hi = np.searchsorted(wb, wa + fwd, side="right")
    return hi > lo


def _expand_pairs(pa: np.ndarray, pb: np.ndarray, p_lo: int, w: int):
    """All (A, B) position pairs with ``pb in [pa + p_lo, pa + w]`` and
    ``pa != pb``, as (pa_rep, pb_hit) arrays — or None when empty. ``pa``
    and ``pb`` must be sorted (they are: flatnonzero output)."""
    lo = np.searchsorted(pb, pa + p_lo, side="left")
    hi = np.searchsorted(pb, pa + w, side="right")
    reps = hi - lo
    sel = reps > 0
    if not sel.any():
        return None
    pa_rep = np.repeat(pa[sel], reps[sel])
    idx = np.concatenate([np.arange(l, h) for l, h in zip(lo[sel], hi[sel])])
    pb_hit = pb[idx]
    ok = pa_rep != pb_hit
    if not ok.any():
        return None
    return pa_rep[ok], pb_hit[ok]


def _backward_reach(lists: list[np.ndarray], lo_off: int, hi_off: int) -> np.ndarray:
    """Backward existence DP over sorted arrays: the entries of lists[0]
    that can head a chain x_0, x_1, ..., x_{k-1} (x_i from lists[i]) with
    every step ``x_{i+1} in [x_i + lo_off, x_i + hi_off]``. Existence must
    be decided per LEVEL, not greedily (earliest-successor dead-ends are a
    tested trap); one searchsorted pass per level."""
    good = lists[-1]
    for i in range(len(lists) - 2, -1, -1):
        xi = lists[i]
        good = xi[_reach_mask(xi, good, -lo_off, hi_off)]
        if len(good) == 0:
            break
    return good


def _positions_fn(t: np.ndarray, base: int = 0):
    """Memoized sorted positions of a token in ``t`` (+ base): several
    queries / chain levels share one scan per distinct token."""
    cache: dict[int, np.ndarray] = {}

    def positions(tok: int) -> np.ndarray:
        if tok not in cache:
            cache[tok] = np.flatnonzero(t == tok) + base
        return cache[tok]

    return positions


def _stitch_parts(parts) -> tuple[int, np.ndarray]:
    """(base offset, concatenated tokens) of a window's sorted doc
    fragments — the contiguous [lo, hi) region around a candidate window."""
    base = int(parts[0]["off"])
    t = np.concatenate([np.asarray(p["frag"], dtype=np.int64) for p in parts])
    return base, t


def _in_window(p: np.ndarray, w_id, sp: int) -> np.ndarray:
    """Restrict positions to window ``w_id``'s own span — each true position
    belongs to exactly ONE candidate window, so this is what prevents
    duplicate results across the halo-overlapping groups."""
    return p[(p >= w_id * sp) & (p < (w_id + 1) * sp)]


def _assemble_fragments(corpus: DataFrame, cand: DataFrame, sp: int,
                        max_margin: int, margin=None, riders=()) -> DataFrame:
    """Fragment assembly for the GLOBAL surfaces: every doc overlapping a
    candidate window's [w*sp - margin, (w+1)*sp + margin) region contributes
    its slice — equi-join on w_id via each doc's margin-padded window range
    (never a range join), grouped to (w_id, parts, *riders) with parts
    sorted by offset. ``margin`` defaults to ``max_margin``; pass a Column
    for per-window conditional margins (the negated certificate path), but
    it must never exceed ``max_margin`` (which sizes the doc->window
    fan-out). ``riders`` are cand columns carried through (single-valued
    per w_id). Requires with_global_offsets columns on ``corpus``."""
    W = int(max_margin)
    mg = (F.lit(W) if margin is None else margin).cast("long")
    doc_windows = corpus.select(
        "doc_offset", "n_tok", "tokens",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0).cast("long"),
                           ((F.col("doc_offset") - W) / sp).cast("long")),
                ((F.col("doc_offset") + F.col("n_tok") - 1 + W) / sp).cast("long"),
            )
        ).alias("w_id"),
    )
    frags = (
        doc_windows.join(cand, "w_id")
        .select(
            "w_id", *riders,
            F.greatest(F.col("doc_offset"),
                       (F.col("w_id") * sp - mg).cast("long")).alias("_lo"),
            F.least(F.col("doc_offset") + F.col("n_tok"),
                    ((F.col("w_id") + 1) * sp + mg).cast("long")).alias("_hi"),
            "doc_offset", "tokens",
        )
        .filter(F.col("_hi") > F.col("_lo"))
        .select(
            "w_id", *riders, F.col("_lo").alias("off"),
            F.expr("slice(tokens, cast(_lo - doc_offset + 1 as int), "
                   "cast(_hi - _lo as int))").alias("frag"),
        )
    )
    aggs = [F.sort_array(F.collect_list(F.struct("off", "frag"))).alias("parts")]
    aggs += [F.first(r).alias(r) for r in riders]
    return frags.groupBy("w_id").agg(*aggs)


def _parse_pair_workload(queries, span: int, name: str):
    """Normalize a batched (token_a, token_b, w[, ordered]) workload:
    returns (queries as 4-tuples, distinct probe keys as uint64, per-query
    specs (A key idx, B key idx, forward window radius, backward window
    reach — 0 for ordered queries: B-windows never behind A's))."""
    queries = [(int(q[0]), int(q[1]), int(q[2]),
                bool(q[3]) if len(q) > 3 else False) for q in queries]
    if not queries:
        raise ValueError(f"{name}: empty query workload")
    if any(w < 0 for _a, _b, w, _o in queries):
        raise ValueError(f"{name}: w must be >= 0 for every query")
    keys = np.unique(np.asarray(
        [a for a, _b, _w, _o in queries] + [b for _a, b, _w, _o in queries],
        dtype=np.int64))
    specs = [
        (int(np.searchsorted(keys, a)), int(np.searchsorted(keys, b)),
         -(-w // span), 0 if o else -(-w // span))
        for a, b, w, o in queries
    ]
    return queries, keys.astype(np.uint64), specs


def _kw_map_doc(hits: DataFrame) -> DataFrame:
    """(doc_id, kw): per-doc map key_idx -> sorted positive window list —
    assembled ONCE and shared by every query in a batched workload."""
    return (
        hits.groupBy("doc_id", "k")
        .agg(F.sort_array(F.collect_list("w_id")).alias("ws"))
        .groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("k", "ws"))).alias("kw"))
    )


def _kw_map_chunks(hits: DataFrame, back: int, fwd: int) -> DataFrame:
    """(chunk, kw) for the GLOBAL surfaces: per-chunk map key_idx ->
    (wh = home positive windows, wl = haloed positive windows). Every
    positive window lands in its home chunk's ``wh`` AND in the ``wl`` of
    all chunks within [w_id - back, w_id + fwd] (the halo includes home, so
    ``wl`` is the complete per-chunk list); survivors are restricted to home
    windows by the caller — each true hit belongs to exactly ONE chunk, so
    no duplicate results."""
    home = hits.select(
        F.shiftright("w_id", _CHUNK_BITS).alias("chunk"), "w_id", "k",
        F.lit(True).alias("is_home"))
    halo = hits.select(
        F.explode(F.sequence(
            F.shiftright(F.col("w_id") - fwd, _CHUNK_BITS),
            F.shiftright(F.col("w_id") + back, _CHUNK_BITS),
        )).alias("chunk"), "w_id", "k", F.lit(False).alias("is_home"))
    return (
        home.unionByName(halo)
        .groupBy("chunk", "k")
        .agg(
            F.sort_array(F.collect_list(F.when(F.col("is_home"), F.col("w_id")))).alias("wh"),
            F.sort_array(F.collect_list(F.when(~F.col("is_home"), F.col("w_id")))).alias("wl"),
        )
        .groupBy("chunk")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("k", F.struct("wh", "wl")))).alias("kw"))
    )


def _level_rows_checked(index: DataFrame, L: int, doc_axis: bool) -> DataFrame:
    """Level slice with the absent-level refusal EVERY surface needs (doc
    and global alike): probing a compacted-away level would silently return
    nothing — and for the negated searches an empty result is a WRONG
    answer, not a conservative one. DataFrame-native isEmpty (take-1)
    replaces the old rdd round-trip, which deserialized a partition through
    the Python-RDD path just to test emptiness."""
    from .route import _level_rows

    rows = _level_rows(index, L, doc_axis=doc_axis)
    if rows.isEmpty():
        raise ValueError(
            f"index has no level-{L} rows (compacted?) — probe another level")
    return rows

def proximity_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    token_a: int,
    token_b: int,
    w: int,
    level: int | None = None,
    ordered: bool = False,
) -> DataFrame:
    """(doc_id, pos_a, pos_b): EXACT position pairs with
    ``tokens[pos_a] == token_a``, ``tokens[pos_b] == token_b``,
    ``|pos_a - pos_b| <= w`` and ``pos_a != pos_b``.

    ``ordered=True`` restricts to DIRECTED pairs — A strictly before B
    within the gap: ``0 < pos_b - pos_a <= w`` (the phrase / collocation-
    direction query). Window-level soundness: ``pos_b in (pos_a, pos_a+w]``
    implies ``w_b in [w_a, w_a + radius]``, so the candidate intersection
    only looks FORWARD and prunes ~2x harder than the symmetric query.

    ``level`` defaults to the leaf level; any level works — the window
    radius adapts (``ceil(w / span)``), finer levels prune harder. The
    probed level must be present in the index (compaction drops levels;
    probing an absent level would silently return nothing — refuse)."""
    if w < 0:
        raise ValueError(f"w must be >= 0: {w}")
    if cfg.ngram != 1:
        raise ValueError("proximity_search requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    radius = -(-int(w) // span)  # ceil(w / span): |i-j|<=w => window dist <= radius
    r_lo = 0 if ordered else radius  # ordered: B-windows never BEHIND A's
    keys = np.asarray([token_a, token_b], dtype=np.uint64)

    rows = _level_rows_checked(index, L, doc_axis=True)
    hits = rows.mapInPandas(_probe_pair_fn(keys, with_doc=True),
                            schema=PAIR_PROBE_DOC_SCHEMA)

    # per doc: sorted A-window / B-window arrays; candidate A-windows are
    # those with a B-window within `radius` (one searchsorted, linear — never
    # an A x B window join)
    per_doc = hits.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.when(F.col("ok_a"), F.col("w_id")))).alias("wa"),
        F.sort_array(F.collect_list(F.when(F.col("ok_b"), F.col("w_id")))).alias("wb"),
    )

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, wids = [], []
            for did, wa, wb in zip(pdf["doc_id"], pdf["wa"], pdf["wb"]):
                if len(wa) == 0 or len(wb) == 0:
                    continue
                wa = np.asarray(wa, dtype=np.int64)
                wb = np.asarray(wb, dtype=np.int64)
                keep = wa[_reach_mask(wa, wb, r_lo, radius)]
                if len(keep):
                    ids.append(did)
                    wids.append(keep)
            if ids:
                yield pd.DataFrame({"doc_id": ids, "cand_w": wids})

    cand = per_doc.mapInPandas(cands, schema="doc_id string, cand_w array<long>")

    a, b, ww, sp = int(token_a), int(token_b), int(w), int(span)
    p_lo = 1 if ordered else -ww  # verify lower bound: pb >= pa + p_lo

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_d, out_a, out_b = [], [], []
            for did, toks, cw in zip(pdf["doc_id"], pdf["tokens"], pdf["cand_w"]):
                t = np.asarray(toks, dtype=np.int64)
                pa = np.flatnonzero(t == a)
                if len(pa) == 0:
                    continue
                # soundness: any true pair's A-position lies in a candidate
                # window (see module docstring) — restrict pa, not pb
                cw = np.asarray(cw, dtype=np.int64)
                pa = pa[np.isin(pa // sp, cw)]
                if len(pa) == 0:
                    continue
                pairs = _expand_pairs(pa, np.flatnonzero(t == b), p_lo, ww)
                if pairs is None:
                    continue
                pa_hit, pb_hit = pairs
                out_d.extend([did] * len(pa_hit))
                out_a.append(pa_hit)
                out_b.append(pb_hit)
            if out_d:
                yield pd.DataFrame({
                    "doc_id": out_d,
                    "pos_a": np.concatenate(out_a).astype(np.int32),
                    "pos_b": np.concatenate(out_b).astype(np.int32),
                })

    survivors = corpus.join(cand, "doc_id").select("doc_id", "tokens", "cand_w")
    return survivors.mapInPandas(verify, schema=PAIR_SCHEMA)


def proximity_counts(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    token_a: int,
    token_b: int,
    w: int,
    level: int | None = None,
    ordered: bool = False,
) -> DataFrame:
    """(doc_id, n_pairs) — per-doc co-occurrence counts (the collocation /
    co-occurrence-statistics readout of proximity_search)."""
    return (
        proximity_search(corpus, index, cfg, token_a, token_b, w, level, ordered)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_pairs"))
    )


GLOBAL_PAIR_SCHEMA = "gpos_a long, gpos_b long"

# windows per candidate chunk in the global candidate pass: bounds each
# Arrow group while keeping the searchsorted amortized over many windows
_CHUNK_BITS = 10


def global_proximity_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    token_a: int,
    token_b: int,
    w: int,
    level: int | None = None,
    ordered: bool = False,
) -> DataFrame:
    """(gpos_a, gpos_b): EXACT stream-position pairs with
    ``stream[gpos_a] == token_a``, ``stream[gpos_b] == token_b`` and
    ``|gpos_a - gpos_b| <= w`` over the CONCATENATED stream — document
    boundaries invisible, cross-doc pairs included (the reference's
    one-stream model). Global twin of proximity_search.
    ``ordered=True`` restricts to ``0 < gpos_b - gpos_a <= w`` (A strictly
    before B); the symmetric B-halo replication stays (a superset is sound),
    only the candidate intersection and verification look forward.

    Distribution notes: the candidate pass chunks the stream's windows
    (2^_CHUNK_BITS per group) and gives every chunk a radius-wide B-window
    halo, so no single task ever holds the whole stream's window list; the
    verification assembles only each candidate window's [w_a*span - w,
    (w_a+1)*span + w) region from the overlapping docs' fragments (docs tile
    the stream contiguously) — O(span + 2w) tokens per candidate window,
    never a stream materialization."""
    if w < 0:
        raise ValueError(f"w must be >= 0: {w}")
    if cfg.axis != "global":
        raise ValueError("global_proximity_search needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError("global_proximity_search requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    corpus = corpus.filter(F.col("n_tok") > 0)

    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    radius = -(-int(w) // span)
    r_lo = 0 if ordered else radius
    keys = np.asarray([token_a, token_b], dtype=np.uint64)
    rows = _level_rows_checked(index, L, doc_axis=False)
    hits = rows.mapInPandas(_probe_pair_fn(keys, with_doc=False),
                            schema=PAIR_PROBE_GLOBAL_SCHEMA)
    # A windows live in their own chunk; B windows are replicated into every
    # chunk whose A-windows could see them (the halo — sequence covers ANY
    # radius, including radius > chunk size; 1-3 chunks in the common case)
    a_rows = hits.filter("ok_a").select(
        F.shiftright("w_id", _CHUNK_BITS).alias("chunk"), "w_id",
        F.lit(True).alias("is_a"))
    b_rows = hits.filter("ok_b").select(
        F.explode(F.sequence(
            F.shiftright(F.col("w_id") - radius, _CHUNK_BITS),
            F.shiftright(F.col("w_id") + radius, _CHUNK_BITS),
        )).alias("chunk"), "w_id", F.lit(False).alias("is_a"))
    per_chunk = a_rows.unionByName(b_rows).groupBy("chunk").agg(
        F.sort_array(F.collect_list(F.when(F.col("is_a"), F.col("w_id")))).alias("wa"),
        F.sort_array(F.collect_list(F.when(~F.col("is_a"), F.col("w_id")))).alias("wb"),
    )

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = []
            for wa, wb in zip(pdf["wa"], pdf["wb"]):
                if len(wa) == 0 or len(wb) == 0:
                    continue
                wa = np.asarray(wa, dtype=np.int64)
                wb = np.asarray(wb, dtype=np.int64)
                outs.append(wa[_reach_mask(wa, wb, r_lo, radius)])
            if outs:
                yield pd.DataFrame({"w_id": np.concatenate(outs)})

    cand = per_chunk.mapInPandas(cands, schema="w_id long")

    # fragments: every doc overlapping a candidate window's REGION
    # [wa*span - w, (wa+1)*span + w) contributes its slice
    ww, sp = int(w), int(span)
    grouped = _assemble_fragments(corpus, cand, sp, ww)

    a, b = int(token_a), int(token_b)
    p_lo = 1 if ordered else -int(w)  # verify lower bound: pb >= pa + p_lo

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_a, out_b = [], []
            for wa, parts in zip(pdf["w_id"], pdf["parts"]):
                base, t = _stitch_parts(parts)
                # A positions must lie in THIS window (each true A position
                # belongs to exactly one candidate window -> no dup pairs)
                pa = _in_window(np.flatnonzero(t == a) + base, wa, sp)
                if len(pa) == 0:
                    continue
                pairs = _expand_pairs(pa, np.flatnonzero(t == b) + base, p_lo, ww)
                if pairs is None:
                    continue
                out_a.append(pairs[0])
                out_b.append(pairs[1])
            if out_a:
                yield pd.DataFrame({"gpos_a": np.concatenate(out_a),
                                    "gpos_b": np.concatenate(out_b)})

    return grouped.mapInPandas(verify, schema=GLOBAL_PAIR_SCHEMA)


BATCH_PAIR_SCHEMA = "pair_id int, doc_id string, pos_a int, pos_b int"


def proximity_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    level: int | None = None,
) -> DataFrame:
    """Batched proximity: a whole workload of (token_a, token_b, w) queries
    answered with ONE leaf-level scan — every Bloom blob is probed once for
    the workload's distinct tokens, each doc's per-token window lists are
    assembled once, and the per-query candidate intersection + verification
    run over those shared structures. Answers are identical to running
    proximity_search per query (tested); the scan cost is paid once instead
    of |queries| times — the same design point as pattern_search_batch /
    window_membership_batch. Returns (pair_id, doc_id, pos_a, pos_b) with
    pair_id = the query's position in ``queries``.

    Each query is ``(token_a, token_b, w)`` or ``(token_a, token_b, w,
    ordered)`` — ordered entries return only ``0 < pos_b - pos_a <= w``
    (A strictly before B); mixed workloads share the one scan."""
    if cfg.ngram != 1:
        raise ValueError("proximity_search_batch requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    queries, ukeys, specs = _parse_pair_workload(
        queries, span, "proximity_search_batch")

    rows = _level_rows_checked(index, L, doc_axis=True)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=True),
                            schema=SPARSE_PROBE_DOC_SCHEMA)
    per_doc = _kw_map_doc(hits)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, pids, wids = [], [], []
            for did, kw in zip(pdf["doc_id"], pdf["kw"]):
                for pid, (ia, ib, radius, r_lo) in enumerate(specs):
                    wa = kw.get(ia)
                    wb = kw.get(ib)
                    if wa is None or wb is None:
                        continue
                    wa = np.asarray(wa, dtype=np.int64)
                    wb = np.asarray(wb, dtype=np.int64)
                    keep = wa[_reach_mask(wa, wb, r_lo, radius)]
                    if len(keep):
                        ids.append(did)
                        pids.append(pid)
                        wids.append(keep)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "pair_id": np.asarray(pids, np.int32),
                     "cand_w": wids})

    cand = per_doc.mapInPandas(
        cands, schema="doc_id string, pair_id int, cand_w array<long>")
    per_doc_cands = cand.groupBy("doc_id").agg(
        F.collect_list(F.struct("pair_id", "cand_w")).alias("pairs"))

    sp = int(span)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"pair_id": [], "doc_id": [], "pos_a": [], "pos_b": []}
            for did, toks, pairs in zip(pdf["doc_id"], pdf["tokens"], pdf["pairs"]):
                positions = _positions_fn(np.asarray(toks, dtype=np.int64))
                for p in pairs:
                    pid = int(p["pair_id"])
                    a, b, ww, o = queries[pid]
                    pa = positions(a)
                    if len(pa) == 0:
                        continue
                    cw = np.asarray(p["cand_w"], dtype=np.int64)
                    pa = pa[np.isin(pa // sp, cw)]
                    if len(pa) == 0:
                        continue
                    res = _expand_pairs(pa, positions(b), 1 if o else -ww, ww)
                    if res is None:
                        continue
                    pa_hit, pb_hit = res
                    n = len(pa_hit)
                    out["pair_id"].extend([pid] * n)
                    out["doc_id"].extend([did] * n)
                    out["pos_a"].append(pa_hit)
                    out["pos_b"].append(pb_hit)
            if out["doc_id"]:
                yield pd.DataFrame({
                    "pair_id": np.asarray(out["pair_id"], np.int32),
                    "doc_id": out["doc_id"],
                    "pos_a": np.concatenate(out["pos_a"]).astype(np.int32),
                    "pos_b": np.concatenate(out["pos_b"]).astype(np.int32),
                })

    survivors = corpus.join(per_doc_cands, "doc_id").select("doc_id", "tokens", "pairs")
    return survivors.mapInPandas(verify, schema=BATCH_PAIR_SCHEMA)


GLOBAL_BATCH_PAIR_SCHEMA = "pair_id int, gpos_a long, gpos_b long"


def global_proximity_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    level: int | None = None,
) -> DataFrame:
    """Batched STREAM-axis proximity: a workload of (token_a, token_b, w)
    queries over the concatenated stream answered with ONE global leaf scan.
    Every Bloom blob is probed once for the workload's distinct tokens; the
    chunked-with-halo window lists are assembled once per (chunk, token) and
    shared by every query (halo sized by the workload's MAX radius — a
    superset halo is sound for the smaller radii); fragment assembly covers
    each candidate window's span + 2*max(w) region once even when several
    queries share the window. Answers identical to per-query
    global_proximity_search (tested). Returns (pair_id, gpos_a, gpos_b)
    with pair_id = the query's position in ``queries``.

    Each query is ``(token_a, token_b, w)`` or ``(token_a, token_b, w,
    ordered)`` — ordered entries return only ``0 < gpos_b - gpos_a <= w``;
    mixed workloads share the one scan (the symmetric max-radius halo is a
    sound superset for ordered queries too)."""
    if cfg.axis != "global":
        raise ValueError("global_proximity_search_batch needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError(
            "global_proximity_search_batch requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    corpus = corpus.filter(F.col("n_tok") > 0)

    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    queries, ukeys, specs = _parse_pair_workload(
        queries, span, "global_proximity_search_batch")
    max_radius = max(r for _ia, _ib, r, _rl in specs)
    W = max(w for _a, _b, w, _o in queries)
    rows = _level_rows_checked(index, L, doc_axis=False)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=False),
                            schema=SPARSE_PROBE_GLOBAL_SCHEMA)
    # every positive window is a potential A (home chunk only) AND a
    # potential B (replicated into the symmetric max-radius halo)
    per_chunk = _kw_map_chunks(hits, max_radius, max_radius)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pids, wids = [], []
            for kw in pdf["kw"]:
                for pid, (ia, ib, radius, r_lo) in enumerate(specs):
                    ea = kw.get(ia)
                    eb = kw.get(ib)
                    if ea is None or eb is None:
                        continue
                    wa = np.asarray(ea["wh"], dtype=np.int64)
                    wb = np.asarray(eb["wl"], dtype=np.int64)
                    if len(wa) == 0 or len(wb) == 0:
                        continue
                    keep = wa[_reach_mask(wa, wb, r_lo, radius)]
                    if len(keep):
                        pids.append(np.full(len(keep), pid, dtype=np.int32))
                        wids.append(keep)
            if pids:
                yield pd.DataFrame({"pair_id": np.concatenate(pids),
                                    "w_id": np.concatenate(wids)})

    cand = per_chunk.mapInPandas(cands, schema="pair_id int, w_id long")
    # several queries may keep the same window: fragments are assembled ONCE
    # per window (max-w margins), the pid list rides along
    cand_w = cand.groupBy("w_id").agg(F.collect_list("pair_id").alias("pids"))

    sp = int(span)
    grouped = _assemble_fragments(corpus, cand_w, sp, W, riders=("pids",))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"pair_id": [], "gpos_a": [], "gpos_b": []}
            for wa_id, parts, pids in zip(pdf["w_id"], pdf["parts"], pdf["pids"]):
                base, t = _stitch_parts(parts)
                positions = _positions_fn(t, base)
                for pid in sorted(set(int(p) for p in pids)):
                    a, b, ww, o = queries[pid]
                    # each true A position belongs to exactly ONE candidate
                    # window per query -> no duplicate pairs
                    pa = _in_window(positions(a), wa_id, sp)
                    if len(pa) == 0:
                        continue
                    res = _expand_pairs(pa, positions(b), 1 if o else -ww, ww)
                    if res is None:
                        continue
                    pa_hit, pb_hit = res
                    out["pair_id"].extend([pid] * len(pa_hit))
                    out["gpos_a"].append(pa_hit)
                    out["gpos_b"].append(pb_hit)
            if out["pair_id"]:
                yield pd.DataFrame({
                    "pair_id": np.asarray(out["pair_id"], np.int32),
                    "gpos_a": np.concatenate(out["gpos_a"]),
                    "gpos_b": np.concatenate(out["gpos_b"]),
                })

    return grouped.mapInPandas(verify, schema=GLOBAL_BATCH_PAIR_SCHEMA)


CHAIN_SCHEMA = "doc_id string, pos int"


def ordered_chain_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    tokens,
    w: int,
    level: int | None = None,
) -> DataFrame:
    """(doc_id, pos): EXACT start positions of an ORDERED CHAIN — positions
    p_0 < p_1 < ... < p_{k-1} with ``tokens[p_i] == chain[i]`` and every
    consecutive gap ``0 < p_{i+1} - p_i <= w`` (the phrase-query-with-slop
    primitive; k == 1 degenerates to all positions of the single token).

    One leaf scan probes ALL chain tokens (distinct keys) per blob; window
    pruning runs the chain BACKWARD at window granularity (level-i windows
    survive only with a level-(i+1) survivor in ``[w_i, w_i + radius]`` —
    sound: p_{i+1} > p_i and p_{i+1} <= p_i + w bound the window delta to
    [0, radius]); verification runs the same backward existence DP over
    sorted position arrays (one searchsorted pass per chain level — never a
    cross-product of positions). Reference: PMIndex/HBI.java report() probes
    composed conjunctively; the reference has no slop-chain surface."""
    chain = [int(t) for t in tokens]
    if not chain:
        raise ValueError("empty chain")
    if w < 0:
        raise ValueError(f"w must be >= 0: {w}")
    if cfg.ngram != 1:
        raise ValueError("ordered_chain_search requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    radius = -(-int(w) // span)
    keys = np.unique(np.asarray(chain, dtype=np.int64))
    ukeys = keys.astype(np.uint64)
    kidx = [int(np.searchsorted(keys, t)) for t in chain]

    rows = _level_rows_checked(index, L, doc_axis=True)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=True),
                            schema=SPARSE_PROBE_DOC_SCHEMA)
    per_doc = _kw_map_doc(hits)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # backward window DP: good windows at chain level i need a good
        # level-(i+1) window within [w_i, w_i + radius] forward
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, wids = [], []
            for did, kw in zip(pdf["doc_id"], pdf["kw"]):
                lists = [kw.get(i) for i in kidx]
                if any(x is None for x in lists):
                    continue
                good = _backward_reach(
                    [np.asarray(x, dtype=np.int64) for x in lists], 0, radius)
                if len(good):
                    ids.append(did)
                    wids.append(good)
            if ids:
                yield pd.DataFrame({"doc_id": ids, "cand_w": wids})

    cand = per_doc.mapInPandas(cands, schema="doc_id string, cand_w array<long>")

    ww, sp = int(w), int(span)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_d, out_p = [], []
            for did, toks, cw in zip(pdf["doc_id"], pdf["tokens"], pdf["cand_w"]):
                positions = _positions_fn(np.asarray(toks, dtype=np.int64))
                p0 = positions(chain[0])
                if len(p0) == 0:
                    continue
                cw = np.asarray(cw, dtype=np.int64)
                p0 = p0[np.isin(p0 // sp, cw)]
                if len(p0) == 0:
                    continue
                # backward existence DP over sorted position arrays
                p0 = _backward_reach(
                    [p0] + [positions(c) for c in chain[1:]], 1, ww)
                if len(p0):
                    out_d.extend([did] * len(p0))
                    out_p.append(p0)
            if out_d:
                yield pd.DataFrame({
                    "doc_id": out_d,
                    "pos": np.concatenate(out_p).astype(np.int32),
                })

    survivors = corpus.join(cand, "doc_id").select("doc_id", "tokens", "cand_w")
    return survivors.mapInPandas(verify, schema=CHAIN_SCHEMA)


GLOBAL_CHAIN_SCHEMA = "gpos long"


def global_ordered_chain_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    tokens,
    w: int,
    level: int | None = None,
) -> DataFrame:
    """(gpos): EXACT stream start positions of an ORDERED CHAIN over the
    CONCATENATED stream — positions g_0 < g_1 < ... < g_{k-1} with
    ``stream[g_i] == chain[i]`` and every gap ``0 < g_{i+1} - g_i <= w``;
    document boundaries invisible (chains may span docs). Global twin of
    ordered_chain_search.

    Distribution notes: one global leaf scan probes all chain tokens; window
    pruning is chunk-local — every positive window is replicated into the
    chunks up to ``(k-1) * radius`` windows BEHIND it (the forward-reach
    halo; a chain starting in a chunk never looks back), the backward window
    DP runs per chunk over the haloed per-token lists, and only home-chunk
    level-0 windows survive. Verification assembles each candidate window's
    ``[w_a*span, (w_a+1)*span + (k-1)*w)`` region from overlapping doc
    fragments (chains found across doc boundaries without materializing the
    stream)."""
    chain = [int(t) for t in tokens]
    if not chain:
        raise ValueError("empty chain")
    if w < 0:
        raise ValueError(f"w must be >= 0: {w}")
    if cfg.axis != "global":
        raise ValueError("global_ordered_chain_search needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError(
            "global_ordered_chain_search requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    corpus = corpus.filter(F.col("n_tok") > 0)

    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    radius = -(-int(w) // span)
    reach = (len(chain) - 1) * radius  # max forward window distance of a chain
    keys = np.unique(np.asarray(chain, dtype=np.int64))
    ukeys = keys.astype(np.uint64)
    kidx = [int(np.searchsorted(keys, t)) for t in chain]
    rows = _level_rows_checked(index, L, doc_axis=False)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=False),
                            schema=SPARSE_PROBE_GLOBAL_SCHEMA)
    # forward-reach halo: each positive window serves every chunk whose
    # home level-0 windows could reach it (<= reach windows behind; a chain
    # starting in a chunk never looks back), so `wl` is the complete
    # per-chunk list for EVERY chain level and `wh` marks home (level-0
    # survivors must be home windows)
    per_chunk = _kw_map_chunks(hits, 0, reach)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = []
            for kw in pdf["kw"]:
                lists = []
                missing = False
                for i in kidx:
                    e = kw.get(i)
                    if e is None or len(e["wl"]) == 0:
                        missing = True
                        break
                    lists.append(np.asarray(e["wl"], dtype=np.int64))
                if missing:
                    continue
                good = _backward_reach(lists, 0, radius)
                if len(good) == 0:
                    continue
                e0 = kw.get(kidx[0])
                wh = np.asarray(e0["wh"], dtype=np.int64)
                keep = good[np.isin(good, wh)]
                if len(keep):
                    outs.append(keep)
            if outs:
                yield pd.DataFrame({"w_id": np.concatenate(outs)})

    cand = per_chunk.mapInPandas(cands, schema="w_id long")

    # fragment assembly: margin = the chain's max forward reach in tokens
    # (symmetric margins reuse the proximity fragment shape; the backward
    # margin is never read)
    Wt = (len(chain) - 1) * int(w)
    sp = int(span)
    grouped = _assemble_fragments(corpus, cand, sp, Wt)

    ww = int(w)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for wa_id, parts in zip(pdf["w_id"], pdf["parts"]):
                base, t = _stitch_parts(parts)
                positions = _positions_fn(t, base)
                # each true chain start belongs to exactly ONE candidate
                # window -> no duplicate results
                p0 = _in_window(positions(chain[0]), wa_id, sp)
                if len(p0) == 0:
                    continue
                p0 = _backward_reach(
                    [p0] + [positions(c) for c in chain[1:]], 1, ww)
                if len(p0):
                    out.append(p0)
            if out:
                yield pd.DataFrame({"gpos": np.concatenate(out)})

    return grouped.mapInPandas(verify, schema=GLOBAL_CHAIN_SCHEMA)

NEG_SCHEMA = "doc_id string, pos_a int"


def negated_proximity_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    token_a: int,
    token_b: int,
    w: int,
    level: int | None = None,
    ordered: bool = False,
) -> DataFrame:
    """(doc_id, pos_a): EXACT positions of ``token_a`` with NO occurrence of
    ``token_b`` within ``w`` tokens (the NOT of proximity_search — isolated
    occurrences). ``token_a == token_b`` means "no OTHER occurrence of A
    within w". ``ordered=True`` negates only the forward direction: A not
    FOLLOWED by B within w (positions before A are ignored).

    Negation flips which side of the index is useful: Bloom probes can prune
    where A might be (standard), but can never prune on B's ABSENCE — a
    B-positive window is only "maybe B". What no-false-negatives DOES give is
    the converse CERTIFICATE: if every window in an A-window's radius
    neighborhood is B-negative, then truly no B lies within w of any A
    position in that window, and those positions are emitted WITHOUT scanning
    for B. Only A-positions whose neighborhood has a B-positive window pay
    the exact anti-check. (Reference composes probes conjunctively only —
    PMIndex/HBI.java report; this is the complementary use of the same
    no-false-negatives contract.)"""
    if w < 0:
        raise ValueError(f"w must be >= 0: {w}")
    if cfg.ngram != 1:
        raise ValueError("negated_proximity_search requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    radius = -(-int(w) // span)
    r_lo = 0 if ordered else radius
    keys = np.asarray([token_a, token_b], dtype=np.uint64)

    rows = _level_rows_checked(index, L, doc_axis=True)
    hits = rows.mapInPandas(_probe_pair_fn(keys, with_doc=True),
                            schema=PAIR_PROBE_DOC_SCHEMA)

    per_doc = hits.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.when(F.col("ok_a"), F.col("w_id")))).alias("wa"),
        F.sort_array(F.collect_list(F.when(F.col("ok_b"), F.col("w_id")))).alias("wb"),
    )

    # candidates are ALL A-positive windows (absence of B prunes nothing);
    # chk_w marks the subset whose radius neighborhood has a B-positive
    # window — only those pay the exact anti-check in verification
    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, chks = [], []
            for did, wa, wb in zip(pdf["doc_id"], pdf["wa"], pdf["wb"]):
                if len(wa) == 0:
                    continue
                wa = np.asarray(wa, dtype=np.int64)
                wb = np.asarray(wb, dtype=np.int64)
                ids.append(did)
                chks.append(wa[_reach_mask(wa, wb, r_lo, radius)])
            if ids:
                yield pd.DataFrame({"doc_id": ids, "chk_w": chks})

    cand = per_doc.mapInPandas(cands, schema="doc_id string, chk_w array<long>")

    a, b, ww, sp = int(token_a), int(token_b), int(w), int(span)
    p_lo = 1 if ordered else -ww
    self_hits = 1 if (a == b and not ordered) else 0  # pa itself is in pb

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_d, out_a = [], []
            for did, toks, chk in zip(pdf["doc_id"], pdf["tokens"], pdf["chk_w"]):
                t = np.asarray(toks, dtype=np.int64)
                pa = np.flatnonzero(t == a)
                if len(pa) == 0:
                    continue
                # every true A position lies in an A-positive (candidate)
                # window, so pa needs no cand_w filter; split by certificate
                chk = np.asarray(chk, dtype=np.int64)
                need = np.isin(pa // sp, chk)
                keep = [pa[~need]]  # certified: no B-positive window in reach
                pan = pa[need]
                if len(pan):
                    pb = np.flatnonzero(t == b)
                    lo = np.searchsorted(pb, pan + p_lo, side="left")
                    hi = np.searchsorted(pb, pan + ww, side="right")
                    keep.append(pan[(hi - lo) == self_hits])
                pa_ok = np.concatenate(keep)
                if len(pa_ok):
                    out_d.extend([did] * len(pa_ok))
                    out_a.append(np.sort(pa_ok))
            if out_d:
                yield pd.DataFrame({
                    "doc_id": out_d,
                    "pos_a": np.concatenate(out_a).astype(np.int32),
                })

    survivors = corpus.join(cand, "doc_id").select("doc_id", "tokens", "chk_w")
    return survivors.mapInPandas(verify, schema=NEG_SCHEMA)


GLOBAL_NEG_SCHEMA = "gpos_a long"


def global_negated_proximity_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    token_a: int,
    token_b: int,
    w: int,
    level: int | None = None,
    ordered: bool = False,
) -> DataFrame:
    """(gpos_a): EXACT stream positions of ``token_a`` with NO ``token_b``
    within ``w`` over the CONCATENATED stream — document boundaries
    invisible, so a B just across a doc boundary DOES disqualify an A (the
    cross-doc twin of negated_proximity_search). Same certificate split:
    A-windows whose radius neighborhood is all B-negative emit their A
    positions without any B check; only B-possible neighborhoods assemble
    the +-w halo region from doc fragments and run the exact anti-check."""
    if w < 0:
        raise ValueError(f"w must be >= 0: {w}")
    if cfg.axis != "global":
        raise ValueError("global_negated_proximity_search needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError("global_negated_proximity_search requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    corpus = corpus.filter(F.col("n_tok") > 0)

    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    radius = -(-int(w) // span)
    r_lo = 0 if ordered else radius
    keys = np.asarray([token_a, token_b], dtype=np.uint64)
    rows = _level_rows_checked(index, L, doc_axis=False)
    hits = rows.mapInPandas(_probe_pair_fn(keys, with_doc=False),
                            schema=PAIR_PROBE_GLOBAL_SCHEMA)
    a_rows = hits.filter("ok_a").select(
        F.shiftright("w_id", _CHUNK_BITS).alias("chunk"), "w_id",
        F.lit(True).alias("is_a"))
    b_rows = hits.filter("ok_b").select(
        F.explode(F.sequence(
            F.shiftright(F.col("w_id") - radius, _CHUNK_BITS),
            F.shiftright(F.col("w_id") + radius, _CHUNK_BITS),
        )).alias("chunk"), "w_id", F.lit(False).alias("is_a"))
    per_chunk = a_rows.unionByName(b_rows).groupBy("chunk").agg(
        F.sort_array(F.collect_list(F.when(F.col("is_a"), F.col("w_id")))).alias("wa"),
        F.sort_array(F.collect_list(F.when(~F.col("is_a"), F.col("w_id")))).alias("wb"),
    )

    # every A-positive window is a candidate; chk marks B-possible ones
    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            w_out, chk_out = [], []
            for wa, wb in zip(pdf["wa"], pdf["wb"]):
                if len(wa) == 0:
                    continue
                wa = np.asarray(wa, dtype=np.int64)
                wb = np.asarray(wb, dtype=np.int64)
                w_out.append(wa)
                chk_out.append(_reach_mask(wa, wb, r_lo, radius))
            if w_out:
                yield pd.DataFrame({"w_id": np.concatenate(w_out),
                                    "chk": np.concatenate(chk_out)})

    cand = per_chunk.mapInPandas(cands, schema="w_id long, chk boolean")

    ww, sp = int(w), int(span)
    # certified (chk=false) windows only ever read their OWN span in verify
    # — assembling the ±w margin for them shipped up to 2w/span extra
    # fragment tokens per window on exactly the path the certificate makes
    # cheap; the margin is per-window conditional, and docs that only
    # touched a certified window's margin zone drop out inside the kernel
    mg = F.when(F.col("chk"), F.lit(ww)).otherwise(F.lit(0))
    grouped = _assemble_fragments(corpus, cand, sp, ww, margin=mg,
                                  riders=("chk",))

    a, b = int(token_a), int(token_b)
    p_lo = 1 if ordered else -ww
    self_hits = 1 if (a == b and not ordered) else 0

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for wa, chk, parts in zip(pdf["w_id"], pdf["chk"], pdf["parts"]):
                base, t = _stitch_parts(parts)
                # each true A position belongs to exactly ONE candidate
                # window -> no duplicates across groups
                pa = _in_window(np.flatnonzero(t == a) + base, wa, sp)
                if len(pa) == 0:
                    continue
                if not chk:  # certified: no B-positive window within reach
                    out.append(pa)
                    continue
                pb = np.flatnonzero(t == b) + base
                lo = np.searchsorted(pb, pa + p_lo, side="left")
                hi = np.searchsorted(pb, pa + ww, side="right")
                pa_ok = pa[(hi - lo) == self_hits]
                if len(pa_ok):
                    out.append(pa_ok)
            if out:
                yield pd.DataFrame({"gpos_a": np.concatenate(out)})

    return grouped.mapInPandas(verify, schema=GLOBAL_NEG_SCHEMA)


NEG_BATCH_SCHEMA = "pair_id int, doc_id string, pos_a int"


def negated_proximity_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    level: int | None = None,
) -> DataFrame:
    """Batched NOT-proximity: a workload of (token_a, token_b, w[, ordered])
    NEGATED queries — positions of A with NO B within w — answered with ONE
    leaf scan. The certificate logic of negated_proximity_search runs per
    query over SHARED per-doc window lists: every Bloom blob is probed once
    for the workload's distinct tokens, and each query splits its A-positive
    windows into certified (no B-positive window in reach — positions emitted
    with no B scan) vs B-possible (exact anti-check). Answers identical to
    per-query negated_proximity_search (tested). Returns
    (pair_id, doc_id, pos_a) with pair_id = the query's position in
    ``queries``. Ordered entries negate only the forward direction (A not
    FOLLOWED by B within w)."""
    if cfg.ngram != 1:
        raise ValueError(
            "negated_proximity_search_batch requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    queries, ukeys, specs = _parse_pair_workload(
        queries, span, "negated_proximity_search_batch")

    rows = _level_rows_checked(index, L, doc_axis=True)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=True),
                            schema=SPARSE_PROBE_DOC_SCHEMA)
    per_doc = _kw_map_doc(hits)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per (doc, query): candidates are ALL A-positive windows (B-absence
        # prunes nothing); chk_w marks the subset whose reach neighborhood
        # has a B-positive window. A doc with NO A-positive window has no A
        # positions at all (no false negatives) and emits nothing.
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, pids, chks = [], [], []
            for did, kw in zip(pdf["doc_id"], pdf["kw"]):
                for pid, (ia, ib, radius, r_lo) in enumerate(specs):
                    wa = kw.get(ia)
                    if wa is None:
                        continue
                    wa = np.asarray(wa, dtype=np.int64)
                    wb = kw.get(ib)
                    if wb is None:
                        chk = wa[:0]
                    else:
                        wb = np.asarray(wb, dtype=np.int64)
                        chk = wa[_reach_mask(wa, wb, r_lo, radius)]
                    ids.append(did)
                    pids.append(pid)
                    chks.append(chk)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "pair_id": np.asarray(pids, np.int32),
                     "chk_w": chks})

    cand = per_doc.mapInPandas(
        cands, schema="doc_id string, pair_id int, chk_w array<long>")
    per_doc_cands = cand.groupBy("doc_id").agg(
        F.collect_list(F.struct("pair_id", "chk_w")).alias("pairs"))

    sp = int(span)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"pair_id": [], "doc_id": [], "pos_a": []}
            for did, toks, pairs in zip(pdf["doc_id"], pdf["tokens"], pdf["pairs"]):
                positions = _positions_fn(np.asarray(toks, dtype=np.int64))
                for p in pairs:
                    pid = int(p["pair_id"])
                    a, b, ww, o = queries[pid]
                    pa = positions(a)
                    if len(pa) == 0:
                        continue
                    # every true A position lies in an A-positive window, so
                    # pa needs no candidate filter; split by certificate
                    chk = np.asarray(p["chk_w"], dtype=np.int64)
                    need = np.isin(pa // sp, chk)
                    keep = [pa[~need]]
                    pan = pa[need]
                    if len(pan):
                        pb = positions(b)
                        p_lo = 1 if o else -ww
                        self_hits = 1 if (a == b and not o) else 0
                        lo = np.searchsorted(pb, pan + p_lo, side="left")
                        hi = np.searchsorted(pb, pan + ww, side="right")
                        keep.append(pan[(hi - lo) == self_hits])
                    pa_ok = np.concatenate(keep)
                    if len(pa_ok):
                        out["pair_id"].extend([pid] * len(pa_ok))
                        out["doc_id"].extend([did] * len(pa_ok))
                        out["pos_a"].append(np.sort(pa_ok))
            if out["doc_id"]:
                yield pd.DataFrame({
                    "pair_id": np.asarray(out["pair_id"], np.int32),
                    "doc_id": out["doc_id"],
                    "pos_a": np.concatenate(out["pos_a"]).astype(np.int32),
                })

    survivors = corpus.join(per_doc_cands, "doc_id").select(
        "doc_id", "tokens", "pairs")
    return survivors.mapInPandas(verify, schema=NEG_BATCH_SCHEMA)


GLOBAL_NEG_BATCH_SCHEMA = "pair_id int, gpos_a long"


def global_negated_proximity_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    level: int | None = None,
) -> DataFrame:
    """Batched STREAM-axis NOT-proximity: the whole negated workload over the
    CONCATENATED stream answered with ONE global leaf scan — document
    boundaries invisible (a B just across a boundary DOES disqualify an A).
    Chunked-with-halo per-token window lists are built once (halo = the
    workload's max radius, a sound superset for the smaller radii) and every
    query runs its certificate split over them; fragment assembly covers each
    window once, with the max-w margin only where SOME query needs its exact
    anti-check (certified-everywhere windows read just their own span).
    Answers identical to per-query global_negated_proximity_search (tested).
    Returns (pair_id, gpos_a)."""
    if cfg.axis != "global":
        raise ValueError(
            "global_negated_proximity_search_batch needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError(
            "global_negated_proximity_search_batch requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    corpus = corpus.filter(F.col("n_tok") > 0)

    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    queries, ukeys, specs = _parse_pair_workload(
        queries, span, "global_negated_proximity_search_batch")
    max_radius = max(r for _ia, _ib, r, _rl in specs)
    W = max(w for _a, _b, w, _o in queries)
    rows = _level_rows_checked(index, L, doc_axis=False)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=False),
                            schema=SPARSE_PROBE_GLOBAL_SCHEMA)
    per_chunk = _kw_map_chunks(hits, max_radius, max_radius)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per (chunk, query): ALL home A-positive windows are candidates,
        # each tagged with its per-query certificate bit
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pids, wids, chks = [], [], []
            for kw in pdf["kw"]:
                for pid, (ia, ib, radius, r_lo) in enumerate(specs):
                    ea = kw.get(ia)
                    if ea is None:
                        continue
                    wa = np.asarray(ea["wh"], dtype=np.int64)
                    if len(wa) == 0:
                        continue
                    eb = kw.get(ib)
                    wb = (np.asarray(eb["wl"], dtype=np.int64)
                          if eb is not None else wa[:0])
                    pids.append(np.full(len(wa), pid, dtype=np.int32))
                    wids.append(wa)
                    chks.append(_reach_mask(wa, wb, r_lo, radius))
            if pids:
                yield pd.DataFrame({"pair_id": np.concatenate(pids),
                                    "w_id": np.concatenate(wids),
                                    "chk": np.concatenate(chks)})

    cand = per_chunk.mapInPandas(cands, schema="pair_id int, w_id long, chk boolean")
    # fragments are assembled ONCE per window even when several queries keep
    # it; the (pair_id, chk) list rides along, and the margin is the max-w
    # one only when some rider needs its exact anti-check
    cand_w = cand.groupBy("w_id").agg(
        F.collect_list(F.struct("pair_id", "chk")).alias("pq"),
        F.max(F.when(F.col("chk"), F.lit(int(W))).otherwise(F.lit(0))).alias("mg"),
    )

    sp = int(span)
    grouped = _assemble_fragments(corpus, cand_w, sp, W, margin=F.col("mg"),
                                  riders=("pq",))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"pair_id": [], "gpos_a": []}
            for wa_id, parts, pq in zip(pdf["w_id"], pdf["parts"], pdf["pq"]):
                base, t = _stitch_parts(parts)
                positions = _positions_fn(t, base)
                for entry in pq:
                    pid = int(entry["pair_id"])
                    a, b, ww, o = queries[pid]
                    # each true A position belongs to exactly ONE candidate
                    # window per query -> no duplicates
                    pa = _in_window(positions(a), wa_id, sp)
                    if len(pa) == 0:
                        continue
                    if not entry["chk"]:  # certified: no B-positive window in reach
                        out["pair_id"].extend([pid] * len(pa))
                        out["gpos_a"].append(pa)
                        continue
                    pb = positions(b)
                    p_lo = 1 if o else -ww
                    self_hits = 1 if (a == b and not o) else 0
                    lo = np.searchsorted(pb, pa + p_lo, side="left")
                    hi = np.searchsorted(pb, pa + ww, side="right")
                    pa_ok = pa[(hi - lo) == self_hits]
                    if len(pa_ok):
                        out["pair_id"].extend([pid] * len(pa_ok))
                        out["gpos_a"].append(pa_ok)
            if out["pair_id"]:
                yield pd.DataFrame({
                    "pair_id": np.asarray(out["pair_id"], np.int32),
                    "gpos_a": np.concatenate(out["gpos_a"]),
                })

    return grouped.mapInPandas(verify, schema=GLOBAL_NEG_BATCH_SCHEMA)


CHAIN_BATCH_SCHEMA = "chain_id int, doc_id string, pos int"


def _parse_chain_workload(chains, span: int, name: str):
    """Normalize a batched chain workload of (tokens, w) entries: returns
    (chains as (token-list, w) pairs, distinct probe keys as uint64,
    per-chain specs (key idx list, window radius))."""
    chains = [([int(t) for t in toks], int(w)) for toks, w in chains]
    if not chains:
        raise ValueError(f"{name}: empty chain workload")
    if any(not toks for toks, _w in chains):
        raise ValueError(f"{name}: empty chain")
    if any(w < 0 for _toks, w in chains):
        raise ValueError(f"{name}: w must be >= 0 for every chain")
    keys = np.unique(np.asarray(
        [t for toks, _w in chains for t in toks], dtype=np.int64))
    specs = [
        ([int(np.searchsorted(keys, t)) for t in toks], -(-w // span))
        for toks, w in chains
    ]
    return chains, keys.astype(np.uint64), specs


def ordered_chain_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    chains,
    level: int | None = None,
) -> DataFrame:
    """Batched ORDERED-CHAIN search: a whole dictionary of (tokens, w)
    phrase-with-slop queries answered with ONE leaf scan — every Bloom blob
    probed once for the workload's distinct tokens, each doc's per-token
    window lists assembled once, and every chain running its backward
    existence DP (window pruning AND position verification) over those
    shared structures. Answers identical to per-chain ordered_chain_search
    (tested). Returns (chain_id, doc_id, pos) with chain_id = the chain's
    position in ``chains``; chains of different lengths / slops mix freely
    (k == 1 degenerates to all positions of the single token)."""
    if cfg.ngram != 1:
        raise ValueError(
            "ordered_chain_search_batch requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    chains, ukeys, specs = _parse_chain_workload(
        chains, span, "ordered_chain_search_batch")

    rows = _level_rows_checked(index, L, doc_axis=True)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=True),
                            schema=SPARSE_PROBE_DOC_SCHEMA)
    per_doc = _kw_map_doc(hits)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, cids, wids = [], [], []
            for did, kw in zip(pdf["doc_id"], pdf["kw"]):
                for cid, (kidx, radius) in enumerate(specs):
                    lists = [kw.get(i) for i in kidx]
                    if any(x is None for x in lists):
                        continue
                    good = _backward_reach(
                        [np.asarray(x, dtype=np.int64) for x in lists],
                        0, radius)
                    if len(good):
                        ids.append(did)
                        cids.append(cid)
                        wids.append(good)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "chain_id": np.asarray(cids, np.int32),
                     "cand_w": wids})

    cand = per_doc.mapInPandas(
        cands, schema="doc_id string, chain_id int, cand_w array<long>")
    per_doc_cands = cand.groupBy("doc_id").agg(
        F.collect_list(F.struct("chain_id", "cand_w")).alias("pairs"))

    sp = int(span)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"chain_id": [], "doc_id": [], "pos": []}
            for did, toks, pairs in zip(pdf["doc_id"], pdf["tokens"], pdf["pairs"]):
                positions = _positions_fn(np.asarray(toks, dtype=np.int64))
                for p in pairs:
                    cid = int(p["chain_id"])
                    chain, ww = chains[cid]
                    p0 = positions(chain[0])
                    if len(p0) == 0:
                        continue
                    cw = np.asarray(p["cand_w"], dtype=np.int64)
                    p0 = p0[np.isin(p0 // sp, cw)]
                    if len(p0) == 0:
                        continue
                    p0 = _backward_reach(
                        [p0] + [positions(c) for c in chain[1:]], 1, ww)
                    if len(p0):
                        out["chain_id"].extend([cid] * len(p0))
                        out["doc_id"].extend([did] * len(p0))
                        out["pos"].append(p0)
            if out["doc_id"]:
                yield pd.DataFrame({
                    "chain_id": np.asarray(out["chain_id"], np.int32),
                    "doc_id": out["doc_id"],
                    "pos": np.concatenate(out["pos"]).astype(np.int32),
                })

    survivors = corpus.join(per_doc_cands, "doc_id").select(
        "doc_id", "tokens", "pairs")
    return survivors.mapInPandas(verify, schema=CHAIN_BATCH_SCHEMA)


GLOBAL_CHAIN_BATCH_SCHEMA = "chain_id int, gpos long"


def global_ordered_chain_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    chains,
    level: int | None = None,
) -> DataFrame:
    """Batched STREAM-axis ORDERED-CHAIN search: the whole phrase dictionary
    over the CONCATENATED stream in ONE global leaf scan — document
    boundaries invisible (chains may span docs). The forward-reach halo is
    sized by the workload's MAX chain reach (a superset halo is sound for
    shorter chains), each chain runs its backward window DP over the shared
    per-chunk lists with survivors restricted to ITS first token's home
    windows, and fragment assembly covers each candidate window once with
    the max-reach margin even when several chains share it. Answers
    identical to per-chain global_ordered_chain_search (tested). Returns
    (chain_id, gpos)."""
    if cfg.axis != "global":
        raise ValueError(
            "global_ordered_chain_search_batch needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError(
            "global_ordered_chain_search_batch requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    corpus = corpus.filter(F.col("n_tok") > 0)

    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    chains, ukeys, specs = _parse_chain_workload(
        chains, span, "global_ordered_chain_search_batch")
    max_reach = max((len(kidx) - 1) * radius for kidx, radius in specs)
    Wt = max((len(toks) - 1) * w for toks, w in chains)  # max reach in tokens
    rows = _level_rows_checked(index, L, doc_axis=False)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=False),
                            schema=SPARSE_PROBE_GLOBAL_SCHEMA)
    per_chunk = _kw_map_chunks(hits, 0, max_reach)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids, wids = [], []
            for kw in pdf["kw"]:
                for cid, (kidx, radius) in enumerate(specs):
                    lists = []
                    missing = False
                    for i in kidx:
                        e = kw.get(i)
                        if e is None or len(e["wl"]) == 0:
                            missing = True
                            break
                        lists.append(np.asarray(e["wl"], dtype=np.int64))
                    if missing:
                        continue
                    good = _backward_reach(lists, 0, radius)
                    if len(good) == 0:
                        continue
                    # chain starts must be HOME windows of the first token
                    # (each true start belongs to exactly ONE chunk)
                    wh = np.asarray(kw.get(kidx[0])["wh"], dtype=np.int64)
                    keep = good[np.isin(good, wh)]
                    if len(keep):
                        cids.append(np.full(len(keep), cid, dtype=np.int32))
                        wids.append(keep)
            if cids:
                yield pd.DataFrame({"chain_id": np.concatenate(cids),
                                    "w_id": np.concatenate(wids)})

    cand = per_chunk.mapInPandas(cands, schema="chain_id int, w_id long")
    # several chains may keep the same window: fragments assembled ONCE per
    # window (max-reach margin), the chain-id list rides along
    cand_w = cand.groupBy("w_id").agg(F.collect_list("chain_id").alias("cids"))

    sp = int(span)
    grouped = _assemble_fragments(corpus, cand_w, sp, Wt, riders=("cids",))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"chain_id": [], "gpos": []}
            for wa_id, parts, cids in zip(pdf["w_id"], pdf["parts"], pdf["cids"]):
                base, t = _stitch_parts(parts)
                positions = _positions_fn(t, base)
                for cid in sorted(set(int(c) for c in cids)):
                    chain, ww = chains[cid]
                    p0 = _in_window(positions(chain[0]), wa_id, sp)
                    if len(p0) == 0:
                        continue
                    p0 = _backward_reach(
                        [p0] + [positions(c) for c in chain[1:]], 1, ww)
                    if len(p0):
                        out["chain_id"].extend([cid] * len(p0))
                        out["gpos"].append(p0)
            if out["chain_id"]:
                yield pd.DataFrame({
                    "chain_id": np.asarray(out["chain_id"], np.int32),
                    "gpos": np.concatenate(out["gpos"]),
                })

    return grouped.mapInPandas(verify, schema=GLOBAL_CHAIN_BATCH_SCHEMA)


# ---------------------------------------------------------------------------
# DISJUNCTIVE (any-of) SET proximity: each query names two token SETS — all
# (pos_a, pos_b) with token[pos_a] ∈ A, token[pos_b] ∈ B and pos_b within w
# of pos_a (ordered: 0 < pos_b - pos_a <= w), pos_a != pos_b always. The
# synonym-set / entity-alias query. Answers equal the UNION of the |A|x|B|
# single-pair queries (tested — every (doc, pos_a, pos_b) arises from exactly
# one (a, b) token pair, so no dedup is needed), but the cost is per SIDE,
# not per pair: each side's positive window lists union (sorted merge) into
# ONE list, one reach test per query, one position scan per side per doc.
# Pure kernel compositions, like every other surface in this file.
# ---------------------------------------------------------------------------

SET_PAIR_SCHEMA = "set_id int, doc_id string, pos_a int, pos_b int"
GLOBAL_SET_PAIR_SCHEMA = "set_id int, gpos_a long, gpos_b long"


def _parse_set_workload(queries, span: int, name: str):
    """Normalize a batched (tokens_a, tokens_b, w[, ordered]) workload:
    (queries as 4-tuples with deduped sorted tuple sides, distinct probe
    keys as uint64, per-query specs (A key idxs, B key idxs, forward window
    radius, backward reach — 0 for ordered))."""
    norm = []
    for q in queries:
        ta = tuple(sorted({int(t) for t in q[0]}))
        tb = tuple(sorted({int(t) for t in q[1]}))
        w = int(q[2])
        o = bool(q[3]) if len(q) > 3 else False
        if not ta or not tb:
            raise ValueError(f"{name}: empty token set in a query")
        if w < 0:
            raise ValueError(f"{name}: w must be >= 0 for every query")
        norm.append((ta, tb, w, o))
    if not norm:
        raise ValueError(f"{name}: empty query workload")
    keys = np.unique(np.asarray(
        [t for ta, tb, _w, _o in norm for t in ta + tb], dtype=np.int64))
    specs = [
        (tuple(int(np.searchsorted(keys, t)) for t in ta),
         tuple(int(np.searchsorted(keys, t)) for t in tb),
         -(-w // span), 0 if o else -(-w // span))
        for ta, tb, w, o in norm
    ]
    return norm, keys.astype(np.uint64), specs


def _union_windows(kw, idxs, field=None):
    """Union (sorted, deduped) of one side's per-token positive window
    lists — kw is a per-doc map (field None) or per-chunk struct map
    (field 'wh'/'wl'). None when the side has no positive window at all."""
    arrs = []
    for i in idxs:
        e = kw.get(i)
        if e is None:
            continue
        a = np.asarray(e if field is None else e[field], dtype=np.int64)
        if len(a):
            arrs.append(a)
    if not arrs:
        return None
    return arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))


def _set_positions(t: np.ndarray, toks, base: int = 0) -> np.ndarray:
    """Sorted positions (+ base) where ``t`` holds ANY of ``toks``."""
    return np.flatnonzero(np.isin(t, np.asarray(toks, dtype=np.int64))) + base


def set_proximity_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    level: int | None = None,
) -> DataFrame:
    """Batched doc-axis SET proximity: a workload of (tokens_a, tokens_b,
    w[, ordered]) any-of queries answered with ONE leaf scan (every Bloom
    blob probed once for the workload's distinct tokens, per-doc per-token
    window lists assembled once and shared). Returns (set_id, doc_id,
    pos_a, pos_b) with set_id = the query's position in ``queries``."""
    if cfg.ngram != 1:
        raise ValueError(
            "set_proximity_search_batch requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    queries, ukeys, specs = _parse_set_workload(
        queries, span, "set_proximity_search_batch")

    rows = _level_rows_checked(index, L, doc_axis=True)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=True),
                            schema=SPARSE_PROBE_DOC_SCHEMA)
    per_doc = _kw_map_doc(hits)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, sids, wids = [], [], []
            for did, kw in zip(pdf["doc_id"], pdf["kw"]):
                for sid, (ia, ib, radius, r_lo) in enumerate(specs):
                    wa = _union_windows(kw, ia)
                    wb = _union_windows(kw, ib)
                    if wa is None or wb is None:
                        continue
                    keep = wa[_reach_mask(wa, wb, r_lo, radius)]
                    if len(keep):
                        ids.append(did)
                        sids.append(sid)
                        wids.append(keep)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "set_id": np.asarray(sids, np.int32),
                     "cand_w": wids})

    cand = per_doc.mapInPandas(
        cands, schema="doc_id string, set_id int, cand_w array<long>")
    per_doc_cands = cand.groupBy("doc_id").agg(
        F.collect_list(F.struct("set_id", "cand_w")).alias("qs"))

    sp = int(span)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"set_id": [], "doc_id": [], "pos_a": [], "pos_b": []}
            for did, toks, qs in zip(pdf["doc_id"], pdf["tokens"], pdf["qs"]):
                t = np.asarray(toks, dtype=np.int64)
                for q in qs:
                    sid = int(q["set_id"])
                    ta, tb, ww, o = queries[sid]
                    pa = _set_positions(t, ta)
                    if len(pa) == 0:
                        continue
                    cw = np.asarray(q["cand_w"], dtype=np.int64)
                    pa = pa[np.isin(pa // sp, cw)]
                    if len(pa) == 0:
                        continue
                    res = _expand_pairs(pa, _set_positions(t, tb),
                                        1 if o else -ww, ww)
                    if res is None:
                        continue
                    pa_hit, pb_hit = res
                    n = len(pa_hit)
                    out["set_id"].extend([sid] * n)
                    out["doc_id"].extend([did] * n)
                    out["pos_a"].append(pa_hit)
                    out["pos_b"].append(pb_hit)
            if out["doc_id"]:
                yield pd.DataFrame({
                    "set_id": np.asarray(out["set_id"], np.int32),
                    "doc_id": out["doc_id"],
                    "pos_a": np.concatenate(out["pos_a"]).astype(np.int32),
                    "pos_b": np.concatenate(out["pos_b"]).astype(np.int32),
                })

    survivors = corpus.join(per_doc_cands, "doc_id").select("doc_id", "tokens", "qs")
    return survivors.mapInPandas(verify, schema=SET_PAIR_SCHEMA)


def global_set_proximity_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    level: int | None = None,
) -> DataFrame:
    """Batched STREAM-axis SET proximity: any-of (tokens_a, tokens_b, w[,
    ordered]) queries over the concatenated stream, ONE global leaf scan —
    chunked-with-halo window lists built once per (chunk, token), each
    side's lists union per chunk, fragments assembled once per candidate
    window (max-w margins). Cross-doc pairs found without materializing the
    stream. Returns (set_id, gpos_a, gpos_b)."""
    if cfg.axis != "global":
        raise ValueError("global_set_proximity_search_batch needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError(
            "global_set_proximity_search_batch requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    corpus = corpus.filter(F.col("n_tok") > 0)

    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    queries, ukeys, specs = _parse_set_workload(
        queries, span, "global_set_proximity_search_batch")
    max_radius = max(r for _ia, _ib, r, _rl in specs)
    W = max(w for _ta, _tb, w, _o in queries)
    rows = _level_rows_checked(index, L, doc_axis=False)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=False),
                            schema=SPARSE_PROBE_GLOBAL_SCHEMA)
    per_chunk = _kw_map_chunks(hits, max_radius, max_radius)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sids, wids = [], []
            for kw in pdf["kw"]:
                for sid, (ia, ib, radius, r_lo) in enumerate(specs):
                    wa = _union_windows(kw, ia, "wh")
                    wb = _union_windows(kw, ib, "wl")
                    if wa is None or wb is None:
                        continue
                    keep = wa[_reach_mask(wa, wb, r_lo, radius)]
                    if len(keep):
                        sids.append(np.full(len(keep), sid, dtype=np.int32))
                        wids.append(keep)
            if sids:
                yield pd.DataFrame({"set_id": np.concatenate(sids),
                                    "w_id": np.concatenate(wids)})

    cand = per_chunk.mapInPandas(cands, schema="set_id int, w_id long")
    cand_w = cand.groupBy("w_id").agg(F.collect_list("set_id").alias("sids"))

    sp = int(span)
    grouped = _assemble_fragments(corpus, cand_w, sp, W, riders=("sids",))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"set_id": [], "gpos_a": [], "gpos_b": []}
            for wa_id, parts, sids in zip(pdf["w_id"], pdf["parts"], pdf["sids"]):
                base, t = _stitch_parts(parts)
                for sid in sorted(set(int(s) for s in sids)):
                    ta, tb, ww, o = queries[sid]
                    # each true A position belongs to exactly ONE candidate
                    # window per query -> no duplicate pairs
                    pa = _in_window(_set_positions(t, ta, base), wa_id, sp)
                    if len(pa) == 0:
                        continue
                    res = _expand_pairs(pa, _set_positions(t, tb, base),
                                        1 if o else -ww, ww)
                    if res is None:
                        continue
                    pa_hit, pb_hit = res
                    out["set_id"].extend([sid] * len(pa_hit))
                    out["gpos_a"].append(pa_hit)
                    out["gpos_b"].append(pb_hit)
            if out["set_id"]:
                yield pd.DataFrame({
                    "set_id": np.asarray(out["set_id"], np.int32),
                    "gpos_a": np.concatenate(out["gpos_a"]),
                    "gpos_b": np.concatenate(out["gpos_b"]),
                })

    return grouped.mapInPandas(verify, schema=GLOBAL_SET_PAIR_SCHEMA)


NEG_SET_SCHEMA = "set_id int, doc_id string, pos_a int"
GLOBAL_NEG_SET_SCHEMA = "set_id int, gpos_a long"


def _neg_set_survivors(pan, pb, t_pan_tokens, tb, ww, ordered):
    """Positions among ``pan`` (sorted) with NO B-set position in
    [p + p_lo, p + ww] other than the position itself. The self-hit count
    is PER POSITION for sets: p counts itself iff its own token ∈ B (and
    the window is unordered — the ordered range (p, p+ww] excludes p)."""
    p_lo = 1 if ordered else -ww
    lo = np.searchsorted(pb, pan + p_lo, side="left")
    hi = np.searchsorted(pb, pan + ww, side="right")
    if ordered:
        self_hits = np.zeros(len(pan), dtype=np.int64)
    else:
        self_hits = np.isin(t_pan_tokens, np.asarray(tb, dtype=np.int64)).astype(np.int64)
    return pan[(hi - lo) == self_hits]


def negated_set_proximity_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    level: int | None = None,
) -> DataFrame:
    """Batched NEGATED SET proximity: positions holding ANY token of set A
    with NO token of set B within w (ordered entries: not FOLLOWED by any B
    within w) — one leaf scan for the whole (tokens_a, tokens_b, w[,
    ordered]) workload. NOT the union of negated pairs (the B-absence
    condition is a conjunction over B's members); per query the certificate
    split of negated_proximity_search runs over the UNION window lists of
    each side. Returns (set_id, doc_id, pos_a)."""
    if cfg.ngram != 1:
        raise ValueError(
            "negated_set_proximity_search_batch requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    queries, ukeys, specs = _parse_set_workload(
        queries, span, "negated_set_proximity_search_batch")

    rows = _level_rows_checked(index, L, doc_axis=True)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=True),
                            schema=SPARSE_PROBE_DOC_SCHEMA)
    per_doc = _kw_map_doc(hits)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per (doc, query): candidates are ALL A-union-positive windows
        # (B-absence prunes nothing); chk_w marks those whose reach
        # neighborhood has a B-union-positive window
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, sids, chks = [], [], []
            for did, kw in zip(pdf["doc_id"], pdf["kw"]):
                for sid, (ia, ib, radius, r_lo) in enumerate(specs):
                    wa = _union_windows(kw, ia)
                    if wa is None:
                        continue
                    wb = _union_windows(kw, ib)
                    chk = wa[:0] if wb is None else wa[_reach_mask(wa, wb, r_lo, radius)]
                    ids.append(did)
                    sids.append(sid)
                    chks.append(chk)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "set_id": np.asarray(sids, np.int32),
                     "chk_w": chks})

    cand = per_doc.mapInPandas(
        cands, schema="doc_id string, set_id int, chk_w array<long>")
    per_doc_cands = cand.groupBy("doc_id").agg(
        F.collect_list(F.struct("set_id", "chk_w")).alias("qs"))

    sp = int(span)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"set_id": [], "doc_id": [], "pos_a": []}
            for did, toks, qs in zip(pdf["doc_id"], pdf["tokens"], pdf["qs"]):
                t = np.asarray(toks, dtype=np.int64)
                for q in qs:
                    sid = int(q["set_id"])
                    ta, tb, ww, o = queries[sid]
                    pa = _set_positions(t, ta)
                    if len(pa) == 0:
                        continue
                    # every true A position lies in an A-positive window;
                    # split by certificate
                    chk = np.asarray(q["chk_w"], dtype=np.int64)
                    need = np.isin(pa // sp, chk)
                    keep = [pa[~need]]
                    pan = pa[need]
                    if len(pan):
                        keep.append(_neg_set_survivors(
                            pan, _set_positions(t, tb), t[pan], tb, ww, o))
                    pa_ok = np.concatenate(keep)
                    if len(pa_ok):
                        out["set_id"].extend([sid] * len(pa_ok))
                        out["doc_id"].extend([did] * len(pa_ok))
                        out["pos_a"].append(np.sort(pa_ok))
            if out["doc_id"]:
                yield pd.DataFrame({
                    "set_id": np.asarray(out["set_id"], np.int32),
                    "doc_id": out["doc_id"],
                    "pos_a": np.concatenate(out["pos_a"]).astype(np.int32),
                })

    survivors = corpus.join(per_doc_cands, "doc_id").select("doc_id", "tokens", "qs")
    return survivors.mapInPandas(verify, schema=NEG_SET_SCHEMA)


def global_negated_set_proximity_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    level: int | None = None,
) -> DataFrame:
    """Batched STREAM-axis NEGATED SET proximity over the concatenated
    stream (a B-set member just across a doc boundary DOES disqualify an A)
    — one global leaf scan; per-window conditional fragment margins (the
    max-w margin only where some query needs its exact anti-check).
    Returns (set_id, gpos_a)."""
    if cfg.axis != "global":
        raise ValueError(
            "global_negated_set_proximity_search_batch needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError(
            "global_negated_set_proximity_search_batch requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    corpus = corpus.filter(F.col("n_tok") > 0)

    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    queries, ukeys, specs = _parse_set_workload(
        queries, span, "global_negated_set_proximity_search_batch")
    max_radius = max(r for _ia, _ib, r, _rl in specs)
    W = max(w for _ta, _tb, w, _o in queries)
    rows = _level_rows_checked(index, L, doc_axis=False)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=False),
                            schema=SPARSE_PROBE_GLOBAL_SCHEMA)
    per_chunk = _kw_map_chunks(hits, max_radius, max_radius)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sids, wids, chks = [], [], []
            for kw in pdf["kw"]:
                for sid, (ia, ib, radius, r_lo) in enumerate(specs):
                    wa = _union_windows(kw, ia, "wh")
                    if wa is None:
                        continue
                    wb = _union_windows(kw, ib, "wl")
                    sids.append(np.full(len(wa), sid, dtype=np.int32))
                    wids.append(wa)
                    chks.append(np.zeros(len(wa), dtype=bool) if wb is None
                                else _reach_mask(wa, wb, r_lo, radius))
            if sids:
                yield pd.DataFrame({"set_id": np.concatenate(sids),
                                    "w_id": np.concatenate(wids),
                                    "chk": np.concatenate(chks)})

    cand = per_chunk.mapInPandas(cands, schema="set_id int, w_id long, chk boolean")
    cand_w = cand.groupBy("w_id").agg(
        F.collect_list(F.struct("set_id", "chk")).alias("sq"),
        F.max(F.when(F.col("chk"), F.lit(int(W))).otherwise(F.lit(0))).alias("mg"),
    )

    sp = int(span)
    grouped = _assemble_fragments(corpus, cand_w, sp, W, margin=F.col("mg"),
                                  riders=("sq",))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"set_id": [], "gpos_a": []}
            for wa_id, parts, sq in zip(pdf["w_id"], pdf["parts"], pdf["sq"]):
                base, t = _stitch_parts(parts)
                for entry in sq:
                    sid = int(entry["set_id"])
                    ta, tb, ww, o = queries[sid]
                    pa = _in_window(_set_positions(t, ta, base), wa_id, sp)
                    if len(pa) == 0:
                        continue
                    if not entry["chk"]:  # certified: no B-positive window in reach
                        out["set_id"].extend([sid] * len(pa))
                        out["gpos_a"].append(pa)
                        continue
                    pa_ok = _neg_set_survivors(
                        pa, _set_positions(t, tb, base), t[pa - base], tb, ww, o)
                    if len(pa_ok):
                        out["set_id"].extend([sid] * len(pa_ok))
                        out["gpos_a"].append(pa_ok)
            if out["set_id"]:
                yield pd.DataFrame({
                    "set_id": np.asarray(out["set_id"], np.int32),
                    "gpos_a": np.concatenate(out["gpos_a"]),
                })

    return grouped.mapInPandas(verify, schema=GLOBAL_NEG_SET_SCHEMA)


# ---------------------------------------------------------------------------
# SET CHAINS: phrase-with-slop where every slot is a token SET (synonym
# phrase dictionary) — x_0 < x_1 < ... < x_{k-1}, token[x_i] ∈ set_i, every
# gap in (0, w]. Same backward existence DP as the token chains, over the
# union position/window lists per slot.
# ---------------------------------------------------------------------------

SET_CHAIN_SCHEMA = "chain_id int, doc_id string, pos int"
GLOBAL_SET_CHAIN_SCHEMA = "chain_id int, gpos long"


def _parse_set_chain_workload(chains, span: int, name: str):
    """Normalize a batched set-chain workload of (list-of-token-sets, w)
    entries: (chains as (tuple-of-sorted-tuples, w), distinct probe keys as
    uint64, per-chain specs (tuple of key-idx tuples, window radius))."""
    norm = []
    for slots, w in chains:
        slots = tuple(tuple(sorted({int(t) for t in s})) for s in slots)
        if not slots or any(not s for s in slots):
            raise ValueError(f"{name}: empty chain or empty slot set")
        if int(w) < 0:
            raise ValueError(f"{name}: w must be >= 0 for every chain")
        norm.append((slots, int(w)))
    if not norm:
        raise ValueError(f"{name}: empty chain workload")
    keys = np.unique(np.asarray(
        [t for slots, _w in norm for s in slots for t in s], dtype=np.int64))
    specs = [
        (tuple(tuple(int(np.searchsorted(keys, t)) for t in s) for s in slots),
         -(-w // span))
        for slots, w in norm
    ]
    return norm, keys.astype(np.uint64), specs


def set_chain_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    chains,
    level: int | None = None,
) -> DataFrame:
    """Batched SET-CHAIN search (synonym phrase dictionary): each chain is a
    (list-of-token-sets, w) — start positions where some x_0 < ... < x_{k-1}
    has token[x_i] ∈ set_i and every gap in (0, w]. One leaf scan for the
    whole dictionary; per-slot UNION window lists feed the same backward
    window DP as ordered_chain_search_batch, per-slot union positions the
    same backward position DP. Returns (chain_id, doc_id, pos)."""
    if cfg.ngram != 1:
        raise ValueError(
            "set_chain_search_batch requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    chains, ukeys, specs = _parse_set_chain_workload(
        chains, span, "set_chain_search_batch")

    rows = _level_rows_checked(index, L, doc_axis=True)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=True),
                            schema=SPARSE_PROBE_DOC_SCHEMA)
    per_doc = _kw_map_doc(hits)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, cids, wids = [], [], []
            for did, kw in zip(pdf["doc_id"], pdf["kw"]):
                for cid, (kidx, radius) in enumerate(specs):
                    lists = [_union_windows(kw, s) for s in kidx]
                    if any(x is None for x in lists):
                        continue
                    good = _backward_reach(lists, 0, radius)
                    if len(good):
                        ids.append(did)
                        cids.append(cid)
                        wids.append(good)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "chain_id": np.asarray(cids, np.int32),
                     "cand_w": wids})

    cand = per_doc.mapInPandas(
        cands, schema="doc_id string, chain_id int, cand_w array<long>")
    per_doc_cands = cand.groupBy("doc_id").agg(
        F.collect_list(F.struct("chain_id", "cand_w")).alias("pairs"))

    sp = int(span)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"chain_id": [], "doc_id": [], "pos": []}
            for did, toks, pairs in zip(pdf["doc_id"], pdf["tokens"], pdf["pairs"]):
                t = np.asarray(toks, dtype=np.int64)
                for p in pairs:
                    cid = int(p["chain_id"])
                    slots, ww = chains[cid]
                    p0 = _set_positions(t, slots[0])
                    if len(p0) == 0:
                        continue
                    cw = np.asarray(p["cand_w"], dtype=np.int64)
                    p0 = p0[np.isin(p0 // sp, cw)]
                    if len(p0) == 0:
                        continue
                    p0 = _backward_reach(
                        [p0] + [_set_positions(t, s) for s in slots[1:]], 1, ww)
                    if len(p0):
                        out["chain_id"].extend([cid] * len(p0))
                        out["doc_id"].extend([did] * len(p0))
                        out["pos"].append(p0)
            if out["doc_id"]:
                yield pd.DataFrame({
                    "chain_id": np.asarray(out["chain_id"], np.int32),
                    "doc_id": out["doc_id"],
                    "pos": np.concatenate(out["pos"]).astype(np.int32),
                })

    survivors = corpus.join(per_doc_cands, "doc_id").select(
        "doc_id", "tokens", "pairs")
    return survivors.mapInPandas(verify, schema=SET_CHAIN_SCHEMA)


def global_set_chain_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    chains,
    level: int | None = None,
) -> DataFrame:
    """Batched STREAM-axis SET-CHAIN search over the concatenated stream
    (chains may span docs): forward-reach halo sized by the workload's max
    chain reach, per-slot union window lists feed each chain's backward DP
    with survivors restricted to its first slot's HOME windows, fragments
    assembled once per candidate window (max-reach margin). Returns
    (chain_id, gpos)."""
    if cfg.axis != "global":
        raise ValueError("global_set_chain_search_batch needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError(
            "global_set_chain_search_batch requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    corpus = corpus.filter(F.col("n_tok") > 0)

    L = cfg.deepest if level is None else int(level)
    span = cfg.span(L)
    chains, ukeys, specs = _parse_set_chain_workload(
        chains, span, "global_set_chain_search_batch")
    max_reach = max((len(kidx) - 1) * radius for kidx, radius in specs)
    Wt = max((len(slots) - 1) * w for slots, w in chains)  # max reach in tokens
    rows = _level_rows_checked(index, L, doc_axis=False)
    hits = rows.mapInPandas(_probe_sparse_fn(ukeys, with_doc=False),
                            schema=SPARSE_PROBE_GLOBAL_SCHEMA)
    per_chunk = _kw_map_chunks(hits, 0, max_reach)

    def cands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids, wids = [], []
            for kw in pdf["kw"]:
                for cid, (kidx, radius) in enumerate(specs):
                    lists = [_union_windows(kw, s, "wl") for s in kidx]
                    if any(x is None for x in lists):
                        continue
                    good = _backward_reach(lists, 0, radius)
                    if len(good) == 0:
                        continue
                    # chain starts must be HOME windows of the first slot
                    wh = _union_windows(kw, kidx[0], "wh")
                    if wh is None:
                        continue
                    keep = good[np.isin(good, wh)]
                    if len(keep):
                        cids.append(np.full(len(keep), cid, dtype=np.int32))
                        wids.append(keep)
            if cids:
                yield pd.DataFrame({"chain_id": np.concatenate(cids),
                                    "w_id": np.concatenate(wids)})

    cand = per_chunk.mapInPandas(cands, schema="chain_id int, w_id long")
    cand_w = cand.groupBy("w_id").agg(F.collect_list("chain_id").alias("cids"))

    sp = int(span)
    grouped = _assemble_fragments(corpus, cand_w, sp, Wt, riders=("cids",))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"chain_id": [], "gpos": []}
            for wa_id, parts, cids in zip(pdf["w_id"], pdf["parts"], pdf["cids"]):
                base, t = _stitch_parts(parts)
                for cid in sorted(set(int(c) for c in cids)):
                    slots, ww = chains[cid]
                    p0 = _in_window(_set_positions(t, slots[0], base), wa_id, sp)
                    if len(p0) == 0:
                        continue
                    p0 = _backward_reach(
                        [p0] + [_set_positions(t, s, base) for s in slots[1:]],
                        1, ww)
                    if len(p0):
                        out["chain_id"].extend([cid] * len(p0))
                        out["gpos"].append(p0)
            if out["chain_id"]:
                yield pd.DataFrame({
                    "chain_id": np.asarray(out["chain_id"], np.int32),
                    "gpos": np.concatenate(out["gpos"]),
                })

    return grouped.mapInPandas(verify, schema=GLOBAL_SET_CHAIN_SCHEMA)
