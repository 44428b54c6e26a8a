"""Approximate (k-mismatch) pattern search over the Bloom cascade — both
axes.

A pattern occurrence with at most ``d`` token mismatches must contain at
least ONE of any ``d+1`` disjoint contiguous fragments of the pattern
matching EXACTLY (pigeonhole). So the index prunes approximately the same
way it prunes exactly:

1. split the pattern into ``s >= d+1`` near-equal contiguous fragments
   (filtration: with s fragments, >= s-d survive any <=d-error match
   exactly; s = d+2 for LONG patterns, so TWO independent fragments must
   agree — a near-intersection instead of pigeonhole's weak OR-union;
   short patterns stay at s = d+1: window candidates are token-SET
   membership tests, and a short fragment's letters sit in almost every
   window, so extra short fragments cost probe time without pruning);
2. search every fragment through ONE shared batched cascade
   (batch._descend_batch — a level is scanned once for all fragments);
3. shift each fragment's surviving windows back to PATTERN-START windows
   (fragment at offset ``off`` starting in window ``w`` puts the pattern
   start in ``w - off//span`` or one neighbor — a sound superset, widened
   by ±d for indels) and keep windows with >= s-d fragment VOTES
   (_vote_candidates_*: the true window gets a vote from every exact
   fragment, so the threshold never loses a match);
4. verify each candidate start with one Arrow stage per axis: a numpy
   sliding-window mismatch count (k-mismatch) or a Wagner-Fischer DP
   batched ACROSS candidate starts (k-edit), positions filtered to the
   candidate windows.

Extends the reference's exact ``report()`` surface
(search/BlockSearch.java:50-155) to approximate matching over the SAME
index bytes; the pigeonhole fragment filter is the classical
Wu-Manber/partition approach for k-mismatch search. The fallback and the
verifier are one primitive, so the index path can only ever prune, never
change the answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import HbiConfig
from ..functions import hamming_positions
from .batch import _descend_batch, _plan_batch
from .route import MATCH_SCHEMA, _stitched_corpus

__all__ = [
    "kmismatch_pattern_search",
    "global_kmismatch_pattern_search",
    "kedit_pattern_search",
    "global_kedit_pattern_search",
    "fuzzy_topk",
    "global_fuzzy_topk",
]


def _fragments(pattern: list[int], d: int) -> list[tuple[int, list[int]]]:
    """Split into d+1 near-equal contiguous (offset, fragment) pieces.
    Long fragments go FIRST (earlier fragments get the extra token) — the
    split is deterministic, so the driver query and its test agree."""
    m, k = len(pattern), d + 1
    base, rem = divmod(m, k)
    out, off = [], 0
    for i in range(k):
        ln = base + (1 if i < rem else 0)
        out.append((off, [int(t) for t in pattern[off : off + ln]]))
        off += ln
    return out


def _vote_candidates_doc(finished, frags, span, drift, need, spark):
    """(cand_df, cand_small) of per-doc pattern-start windows certified by
    >= ``need`` DISTINCT fragments' shifted survivor sets (filtration
    voting; ``drift`` widens shifts for indels). The true match window gets
    one vote from every exactly-occurring fragment, so the threshold never
    loses a match. Returns (None, None) when no window qualifies."""
    if all(rows is not None for _, _, rows in finished.values()):
        votes: dict[tuple, set] = {}
        for p, (off, _frag) in enumerate(frags):
            shifts = list(_edit_shifts(off, drift, span))
            for doc_id, w in finished[p][2]:
                for sh in shifts:
                    wid = int(w) + sh
                    if wid >= 0:
                        votes.setdefault((doc_id, wid), set()).add(p)
        by_doc: dict[str, list] = {}
        for (doc, wid), who in votes.items():
            if len(who) >= need:
                by_doc.setdefault(doc, []).append(wid)
        if not by_doc:
            return None, None
        return spark.createDataFrame(
            [(doc, sorted(ws)) for doc, ws in by_doc.items()],
            "doc_id string, wids array<long>",
        ), True
    parts = []
    for p, (off, _frag) in enumerate(frags):
        fdf, n, rows = finished[p]
        if fdf is None and not rows:
            continue
        src = (
            spark.createDataFrame(rows, "doc_id string, w_id long")
            if rows is not None
            else fdf
        )
        shifts = list(_edit_shifts(off, drift, span))
        parts.append(
            src.select(
                "doc_id",
                F.explode(F.array(*[F.col("w_id") + F.lit(sh) for sh in shifts])).alias("w_id"),
                F.lit(p).alias("frag"),
            )
        )
    if not parts:
        return None, None
    union = parts[0]
    for q_df in parts[1:]:
        union = union.unionByName(q_df)
    cand = (
        union.filter(F.col("w_id") >= 0)
        .distinct()
        .groupBy("doc_id", "w_id")
        .agg(F.count("*").alias("_v"))
        .filter(F.col("_v") >= need)
        .groupBy("doc_id")
        .agg(F.collect_set("w_id").alias("wids"))
    )
    return cand, False


def _vote_candidates_global(finished, frags, span, drift, need, spark):
    """Global twin of _vote_candidates_doc: (survivors_df, final_rows_flag)
    of stream windows certified by >= ``need`` fragments, or (None, None)."""
    if all(rows is not None for _, _, rows in finished.values()):
        votes: dict[int, set] = {}
        for p, (off, _frag) in enumerate(frags):
            shifts = list(_edit_shifts(off, drift, span))
            for (w,) in finished[p][2]:
                for sh in shifts:
                    wid = int(w) + sh
                    if wid >= 0:
                        votes.setdefault(wid, set()).add(p)
        wids = sorted(w for w, who in votes.items() if len(who) >= need)
        if not wids:
            return None, None
        return spark.createDataFrame([(w,) for w in wids], "w_id long"), [1]
    parts = []
    for p, (off, _frag) in enumerate(frags):
        fdf, n, rows = finished[p]
        if fdf is None and not rows:
            continue
        src = spark.createDataFrame(rows, "w_id long") if rows is not None else fdf
        shifts = list(_edit_shifts(off, drift, span))
        parts.append(
            src.select(
                F.explode(F.array(*[F.col("w_id") + F.lit(sh) for sh in shifts])).alias("w_id"),
                F.lit(p).alias("frag"),
            )
        )
    if not parts:
        return None, None
    union = parts[0]
    for q_df in parts[1:]:
        union = union.unionByName(q_df)
    survivors = (
        union.filter(F.col("w_id") >= 0)
        .distinct()
        .groupBy("w_id")
        .agg(F.count("*").alias("_v"))
        .filter(F.col("_v") >= need)
        .select("w_id")
    )
    return survivors, None


def _n_fragments(m: int, d: int, cfg: HbiConfig) -> int:
    """Fragment count s for the filtration scheme (Navarro): a <=d-edit
    match leaves >= s-d of s disjoint fragments EXACT, so candidates can
    require s-d fragment votes instead of 1 (s = d+1 is plain pigeonhole —
    OR-union; s = d+2 needs 2 votes, a near-intersection).

    The candidate test is token-SET membership per window, so a fragment
    prunes only while its DISTINCT-token set is unlikely in a window-sized
    bag — short fragments (a handful of common letters) are present in
    ~every window and extra ones only add probe cost (measured: the 10-char
    sf0.1 driver needle ran 12.9 s at s=3 vs 11.3 s at s=2). Demand at
    least half a leaf window per fragment before voting in."""
    if m // (d + 2) >= max(cfg.leaf_span // 2, cfg.ngram):
        return d + 2
    return d + 1


def _prepare(pattern, d, cfg, start_level, stats, freq, n_frags=None):
    """Shared plan step: fragments -> batch specs at ONE common level.
    Returns (frags, specs, firsts, level, span, need) or None when the
    cascade cannot prune (some fragment unprunable) and the caller must
    scan; ``need`` = s - d fragment votes certify a candidate window."""
    s = n_frags if n_frags is not None else _n_fragments(len(pattern), d, cfg)
    frags = _fragments(pattern, s - 1)  # s pieces
    cascade, exact = _plan_batch(
        [f for _, f in frags], cfg, start_level, stats, freq, None, None, False
    )
    if exact:
        # an unprunable fragment can't vote; retry at plain pigeonhole
        # (every vote required) before giving up entirely
        if s > d + 1:
            return _prepare(pattern, d, cfg, start_level, stats, freq, n_frags=d + 1)
        return None
    # one common stop level: the shallowest of the fragments' deepest
    # usable levels (shallower is always sound), so every survivor set
    # shares ONE window span for the shift arithmetic
    level = min(deepest for _, _, _, deepest in cascade)
    specs = [spec for _, spec, _, _ in cascade]
    firsts = [min(first, level) for _, _, first, _ in cascade]
    return frags, specs, firsts, level, cfg.span(level), s - d


def _candidate_docs(stitched, survivors, span, group_cols, do_broadcast):
    """Candidate-doc assembly shared by every global verification tail:
    docs expand to their window ranges ((doc_offset, w_id) pairs ONLY in
    the shuffle — empty docs own no window, guarded against the descending
    sequence() trap), join the surviving windows, group to per-doc wids,
    then join the token arrays back by doc_offset."""
    wid_df = F.broadcast(survivors) if do_broadcast else survivors
    doc_windows = stitched.filter(F.col("n_tok") > 0).select(
        "doc_offset", "n_tok",
        F.explode(
            F.sequence(
                (F.col("doc_offset") / span).cast("long"),
                ((F.col("doc_offset") + F.col("n_tok") - 1) / span).cast("long"),
            )
        ).alias("w_id"),
    )
    hit_docs = (
        doc_windows.join(wid_df, on="w_id", how="inner")
        .groupBy(*group_cols)
        .agg(F.collect_set("w_id").alias("wids"))
    )
    return stitched.join(
        F.broadcast(hit_docs) if do_broadcast else hit_docs,
        on="doc_offset", how="inner",
    )


def _hamming_verify_doc(joined: DataFrame, pattern: list[int], d: int, span: int) -> DataFrame:
    """Arrow verification of k-mismatch candidates: one vectorized
    sliding-window mismatch count per candidate doc (numpy, C speed —
    the per-position zip_with HOF this replaced allocated a slice per
    start and cost ~7 s of an 11 s sf0.1 query), positions filtered to the
    doc's candidate windows. Twin of batch._verify_arrow_doc."""
    pat = np.asarray(pattern, dtype=np.int64)
    m = len(pat)

    def ver(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_d, out_pos = [], []
            for did, toks, wids in zip(pdf["doc_id"], pdf["tokens"], pdf["wids"]):
                arr = np.asarray(toks, dtype=np.int64)
                if len(arr) < m:
                    continue
                sw = np.lib.stride_tricks.sliding_window_view(arr, m)
                pos = np.flatnonzero((sw != pat).sum(axis=1) <= d)
                if len(pos) == 0:
                    continue
                pos = pos[np.isin(pos // span, np.asarray(wids, dtype=np.int64))]
                out_d.extend([did] * len(pos))
                out_pos.extend(pos.tolist())
            yield pd.DataFrame(
                {"doc_id": out_d, "pos": np.asarray(out_pos, dtype=np.int32)}
            )

    return joined.select("doc_id", "tokens", "wids").mapInPandas(
        ver, schema=MATCH_SCHEMA
    )


def _global_hamming_tail(stitched, survivors, final_rows, span, pattern, d) -> DataFrame:
    """Global-axis candidate assembly (same joins as route._global_verify:
    (doc_offset, w_id) pairs only in the shuffle, token arrays joined back
    by doc_offset) + Arrow Hamming verification over each candidate doc's
    stitched span. Twin of batch._verify_arrow_global."""
    pat = np.asarray(pattern, dtype=np.int64)
    m = len(pat)
    cand_docs = _candidate_docs(
        stitched, survivors, span, ["doc_offset"], final_rows is not None)

    def ver(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_g = []
            for off, n_tok, st, wids in zip(
                pdf["doc_offset"], pdf["n_tok"], pdf["stitched"], pdf["wids"]
            ):
                arr = np.asarray(st, dtype=np.int64)[: int(n_tok) + m - 1]
                if len(arr) < m:
                    continue
                sw = np.lib.stride_tricks.sliding_window_view(arr, m)
                pos = np.flatnonzero((sw != pat).sum(axis=1) <= d)
                pos = pos[pos < n_tok]
                if len(pos) == 0:
                    continue
                g = pos + off
                g = g[np.isin(g // span, np.asarray(wids, dtype=np.int64))]
                out_g.extend(g.tolist())
            yield pd.DataFrame({"gpos": np.asarray(out_g, dtype=np.int64)})

    return cand_docs.select("doc_offset", "n_tok", "stitched", "wids").mapInPandas(
        ver, schema="gpos long"
    )


def _edit_ok_positions(arr: np.ndarray, cand: np.ndarray, pat: np.ndarray, d: int) -> np.ndarray:
    """Candidate starts (subset of ``cand``) where some substring of
    ``arr`` starting there is within Levenshtein distance ``d`` of ``pat``."""
    pos, _dist = _edit_best_dists(arr, cand, pat, d)
    return pos


def _edit_best_dists(arr: np.ndarray, cand: np.ndarray, pat: np.ndarray, d: int):
    """(positions, best_distances) over candidate starts whose BEST
    substring match is within Levenshtein distance ``d`` of ``pat``
    — a Wagner-Fischer DP batched ACROSS starts (every cell is one numpy
    vector op over the candidate axis; m*(m+d) cells total). Equivalent to
    min over L in [m-d, m+d] of levenshtein(arr[p:p+L], pat): column
    j of the final row IS the distance to the length-j substring."""
    m = len(pat)
    n = len(arr)
    if len(cand) == 0:
        return cand, cand
    width = m + d
    idx = cand[:, None] + np.arange(width)[None, :]
    t_mat = np.where(idx < n, arr[np.minimum(idx, n - 1)], np.int64(-1))
    prev = np.broadcast_to(
        np.arange(width + 1, dtype=np.int64), (len(cand), width + 1)
    ).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, width + 1):
            cost = (t_mat[:, j - 1] != pat[i - 1]).astype(np.int64)
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + cost, out=cur[:, j])
        prev = cur
    avail = n - cand  # longest real substring from each start
    js = np.arange(width + 1, dtype=np.int64)
    valid = (js[None, :] <= avail[:, None]) & (js[None, :] >= max(m - d, 0))
    best = np.where(valid, prev, np.int64(1 << 30)).min(axis=1)
    keep = best <= d
    return cand[keep], best[keep]


def _edit_verify_doc(joined: DataFrame, pattern: list[int], d: int, span: int) -> DataFrame:
    """Arrow verification of k-edit candidates: in-window starts filtered
    first (cheap window-id isin), then the batched-DP Levenshtein check
    (_edit_ok_positions) — replaces a per-position JVM levenshtein HOF that
    cost most of the sf0.1 query."""
    pat = np.asarray(pattern, dtype=np.int64)

    def ver(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_d, out_pos = [], []
            for did, toks, wids in zip(pdf["doc_id"], pdf["tokens"], pdf["wids"]):
                arr = np.asarray(toks, dtype=np.int64)
                if len(arr) == 0:
                    continue
                p_all = np.arange(len(arr), dtype=np.int64)
                cand = p_all[np.isin(p_all // span, np.asarray(wids, dtype=np.int64))]
                pos = _edit_ok_positions(arr, cand, pat, d)
                out_d.extend([did] * len(pos))
                out_pos.extend(pos.tolist())
            yield pd.DataFrame(
                {"doc_id": out_d, "pos": np.asarray(out_pos, dtype=np.int32)}
            )

    return joined.select("doc_id", "tokens", "wids").mapInPandas(
        ver, schema=MATCH_SCHEMA
    )


def kmismatch_pattern_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    d: int,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """All (doc_id, pos) where ``pattern`` occurs with at most ``d`` token
    mismatches (Hamming; matches never cross doc boundaries on this axis).
    d=0 is exact search through the same code path."""
    if cfg.axis != "doc":
        raise NotImplementedError("kmismatch_pattern_search routes on the doc axis")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if d < 0:
        raise ValueError("d must be >= 0")

    def brute() -> DataFrame:
        return corpus.select(
            "doc_id",
            F.explode(hamming_positions("tokens", pattern, d)).alias("pos"),
        )

    if d >= m:
        return brute()  # every full window matches: nothing to prune
    prep = _prepare(pattern, d, cfg, start_level, stats, freq)
    if prep is None:
        return brute()
    frags, specs, firsts, level, span, need = prep
    spark = corpus.sparkSession
    finished = _descend_batch(
        index, specs, firsts, [level] * len(specs), doc_axis=True, spark=spark,
        stats_out=stats_out,
    )
    cand, cand_small = _vote_candidates_doc(finished, frags, span, 0, need, spark)
    if cand is None:
        return spark.createDataFrame([], MATCH_SCHEMA)
    joined = corpus.join(
        F.broadcast(cand) if cand_small else cand, on="doc_id", how="inner")
    return _hamming_verify_doc(joined, pattern, d, span)


def global_kmismatch_pattern_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    d: int,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """All global positions (gpos) where ``pattern`` occurs with at most
    ``d`` mismatches over the ONE concatenated stream — approximate matches
    may cross document boundaries (a boundary token may even be one of the
    mismatches). Same pigeonhole plan as the doc axis; verification
    assembles only candidate docs' stitched spans (route._global_verify)."""
    if cfg.axis != "global":
        raise ValueError("global_kmismatch_pattern_search needs cfg.axis='global'")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if d < 0:
        raise ValueError("d must be >= 0")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    if m > 1:
        stitched = _stitched_corpus(corpus, m, min_doc_tokens=cfg.min_doc_tokens)
    else:
        stitched = corpus.withColumn("stitched", F.col("tokens"))
    scan_col = F.col("stitched")

    def exact_scan() -> DataFrame:
        return (
            stitched.select(
                F.explode(hamming_positions(scan_col, pattern, d)).alias("p"),
                "doc_offset", "n_tok",
            )
            .filter(F.col("p") < F.col("n_tok"))
            .select((F.col("doc_offset") + F.col("p")).alias("gpos"))
        )

    if d >= m:
        return exact_scan()
    prep = _prepare(pattern, d, cfg, start_level, stats, freq)
    if prep is None:
        return exact_scan()
    frags, specs, firsts, level, span, need = prep
    spark = corpus.sparkSession
    finished = _descend_batch(
        index, specs, firsts, [level] * len(specs), doc_axis=False, spark=spark,
        stats_out=stats_out,
    )
    survivors, final_rows = _vote_candidates_global(
        finished, frags, span, 0, need, spark)
    if survivors is None:
        return spark.createDataFrame([], "gpos long")
    return _global_hamming_tail(stitched, survivors, final_rows, span, pattern, d)


def _edit_shifts(off: int, d: int, span: int) -> range:
    """Candidate pattern-start window shifts for a fragment at offset
    ``off`` when up to ``d`` INDELS may precede it: the fragment's exact
    occurrence starts at p + off' with off' in [off-d, off+d], so
    wid(p) - w ranges over [-ceil((off+d)/span), floor((span-1-off+d)/span)]
    (python floor division is floor for negatives, which is what the bound
    needs)."""
    lo = -((off + d + span - 1) // span)
    hi = (span - 1 - off + d) // span
    return range(lo, hi + 1)


def kedit_pattern_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    d: int,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """All (doc_id, pos) where SOME substring starting at pos is within
    LEVENSHTEIN distance ``d`` of ``pattern`` — agrep semantics (edits =
    substitutions AND insertions/deletions, vs kmismatch's substitutions
    only): min over candidate lengths L in [m-d, m+d] of
    levenshtein(tokens[pos:pos+L], pattern) <= d. The same pigeonhole
    fragment pruning as kmismatch applies (a fragment untouched by edits
    still occurs EXACTLY, merely shifted by at most d), with the candidate
    window shifts widened by the ±d drift (_edit_shifts). Both the index
    path and the exact-scan fallback verify with the SAME numpy DP kernel
    (_edit_best_dists) — tokens are arbitrary ints, never narrowed to a
    char type (F.char wraps mod 256; it must not appear on this path)."""
    if cfg.axis != "doc":
        raise NotImplementedError("kedit_pattern_search routes on the doc axis")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if d < 0:
        raise ValueError("d must be >= 0")
    pat = np.asarray(pattern, dtype=np.int64)

    def brute() -> DataFrame:
        def ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_d, out_pos = [], []
                for did, toks in zip(pdf["doc_id"], pdf["tokens"]):
                    arr = np.asarray(toks, dtype=np.int64)
                    if len(arr) == 0:
                        continue
                    pos = _edit_ok_positions(
                        arr, np.arange(len(arr), dtype=np.int64), pat, d)
                    out_d.extend([did] * len(pos))
                    out_pos.extend(pos.tolist())
                yield pd.DataFrame(
                    {"doc_id": out_d, "pos": np.asarray(out_pos, dtype=np.int32)}
                )

        return corpus.select("doc_id", "tokens").mapInPandas(ver, schema=MATCH_SCHEMA)

    if d >= m:
        return brute()  # L=0 is a candidate: every position matches
    prep = _prepare(pattern, d, cfg, start_level, stats, freq)
    if prep is None:
        return brute()
    frags, specs, firsts, level, span, need = prep
    spark = corpus.sparkSession
    finished = _descend_batch(
        index, specs, firsts, [level] * len(specs), doc_axis=True, spark=spark,
        stats_out=stats_out,
    )
    cand, cand_small = _vote_candidates_doc(finished, frags, span, d, need, spark)
    if cand is None:
        return spark.createDataFrame([], MATCH_SCHEMA)
    joined = corpus.join(
        F.broadcast(cand) if cand_small else cand, on="doc_id", how="inner")
    return _edit_verify_doc(joined, pattern, d, span)


def _global_edit_tail(stitched, survivors, final_rows, span, pattern, d) -> DataFrame:
    """Global-axis k-edit tail: same candidate-doc assembly as
    _global_hamming_tail, verification via the batched Wagner-Fischer DP
    over in-window starts of each candidate doc's stitched span (a match
    starting at p < n_tok may consume up to m+d tokens of the stitched
    continuation)."""
    pat = np.asarray(pattern, dtype=np.int64)
    m = len(pat)
    cand_docs = _candidate_docs(
        stitched, survivors, span, ["doc_offset"], final_rows is not None)

    def ver(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_g = []
            for off, n_tok, st, wids in zip(
                pdf["doc_offset"], pdf["n_tok"], pdf["stitched"], pdf["wids"]
            ):
                n_tok = int(n_tok)
                arr = np.asarray(st, dtype=np.int64)[: n_tok + m + d - 1]
                if len(arr) == 0:
                    continue
                p_all = np.arange(min(n_tok, len(arr)), dtype=np.int64)
                g_all = p_all + int(off)
                sel = np.isin(g_all // span, np.asarray(wids, dtype=np.int64))
                pos = _edit_ok_positions(arr, p_all[sel], pat, d)
                out_g.extend((pos + int(off)).tolist())
            yield pd.DataFrame({"gpos": np.asarray(out_g, dtype=np.int64)})

    return cand_docs.select("doc_offset", "n_tok", "stitched", "wids").mapInPandas(
        ver, schema="gpos long"
    )


def global_kedit_pattern_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    d: int,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """All global positions (gpos) where SOME substring of the ONE
    concatenated stream starting there is within LEVENSHTEIN distance
    ``d`` of ``pattern`` — the stream-axis twin of kedit_pattern_search:
    approximate matches may cross document boundaries, and an indel may
    sit exactly on a boundary. Pigeonhole fragments with ±d-widened window
    shifts through the global cascade; verification is the batched DP over
    candidate docs' stitched spans (the stitch carries m+d-1 continuation
    tokens — the longest substring a match can consume)."""
    if cfg.axis != "global":
        raise ValueError("global_kedit_pattern_search needs cfg.axis='global'")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if d < 0:
        raise ValueError("d must be >= 0")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    if m + d > 1:
        stitched = _stitched_corpus(corpus, m + d, min_doc_tokens=cfg.min_doc_tokens)
    else:
        stitched = corpus.withColumn("stitched", F.col("tokens"))
    pat = np.asarray(pattern, dtype=np.int64)

    def exact_scan() -> DataFrame:
        def ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_g = []
                for off, n_tok, st in zip(
                    pdf["doc_offset"], pdf["n_tok"], pdf["stitched"]
                ):
                    n_tok = int(n_tok)
                    arr = np.asarray(st, dtype=np.int64)[: n_tok + m + d - 1]
                    if len(arr) == 0:
                        continue
                    p_all = np.arange(min(n_tok, len(arr)), dtype=np.int64)
                    pos = _edit_ok_positions(arr, p_all, pat, d)
                    out_g.extend((pos + int(off)).tolist())
                yield pd.DataFrame({"gpos": np.asarray(out_g, dtype=np.int64)})

        return stitched.select("doc_offset", "n_tok", "stitched").mapInPandas(
            ver, schema="gpos long"
        )

    if d >= m:
        return exact_scan()
    prep = _prepare(pattern, d, cfg, start_level, stats, freq)
    if prep is None:
        return exact_scan()
    frags, specs, firsts, level, span, need = prep
    spark = corpus.sparkSession
    finished = _descend_batch(
        index, specs, firsts, [level] * len(specs), doc_axis=False, spark=spark,
        stats_out=stats_out,
    )
    survivors, final_rows = _vote_candidates_global(
        finished, frags, span, d, need, spark)
    if survivors is None:
        return spark.createDataFrame([], "gpos long")
    return _global_edit_tail(stitched, survivors, final_rows, span, pattern, d)


APPROX_BATCH_SCHEMA = "query_id int, doc_id string, pos int"


def _parse_queries(queries) -> list[tuple[list[int], int, str]]:
    """Normalize a batch workload: (pattern, d) or (pattern, d, kind)
    entries -> (pattern, d, kind) with validation — ONE definition for
    both axes."""
    parsed = []
    for q in queries:
        if len(q) == 2:
            pat, d = q
            kind = "hamming"
        else:
            pat, d, kind = q
        if kind not in ("hamming", "edit"):
            raise ValueError(f"unknown approx kind {kind!r} (hamming|edit)")
        pat = [int(t) for t in pat]
        if not pat:
            raise ValueError("empty pattern in batch")
        if d < 0:
            raise ValueError("d must be >= 0")
        parsed.append((pat, int(d), kind))
    return parsed


def _hits_kernel(arr: np.ndarray, cand: np.ndarray, pat: np.ndarray, d: int,
                 kind: str) -> np.ndarray:
    """Candidate starts that verify under the query's kernel: sliding
    mismatch count ('hamming', full windows only) or the batched DP
    ('edit', any start)."""
    if kind == "edit":
        return _edit_ok_positions(arr, cand, pat, d)
    m = len(pat)
    cand = cand[cand <= len(arr) - m]
    if len(cand) == 0:
        return cand
    sw = np.lib.stride_tricks.sliding_window_view(arr, m)[cand]
    return cand[(sw != pat).sum(axis=1) <= d]


def approx_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """A whole workload of approximate needles answered through ONE shared
    cascade — the dictionary/spell-check design point: ``queries`` is a
    list of ``(pattern, d)`` or ``(pattern, d, kind)`` with kind
    'hamming' (substitutions only) or 'edit' (Levenshtein). Every query's
    fragments enter one batched descent (a level is scanned once for the
    whole workload), votes are counted per query, and ONE Arrow stage
    verifies all (candidate doc, query) pairs with the kind-dispatched
    kernel. Per-query answers equal the single-query searches
    (kmismatch_pattern_search / kedit_pattern_search); queries the cascade
    cannot prune fall back to an exact scan INSIDE the same output.
    Returns (query_id, doc_id, pos)."""
    if cfg.axis != "doc":
        raise NotImplementedError("approx_search_batch routes on the doc axis")
    parsed = _parse_queries(queries)
    spark = corpus.sparkSession
    if not parsed:
        return spark.createDataFrame([], APPROX_BATCH_SCHEMA)

    brute_ids = [qi for qi, (pat, d, _k) in enumerate(parsed) if d >= len(pat)]
    plan_ids = [qi for qi in range(len(parsed)) if qi not in brute_ids]
    frag_lists: dict[int, list] = {}
    flat_patterns, owner = [], []  # owner[i] = query index of flat fragment i
    for qi in plan_ids:
        pat, d, _k = parsed[qi]
        s = _n_fragments(len(pat), d, cfg)
        frag_lists[qi] = _fragments(pat, s - 1)
        for _off, frag in frag_lists[qi]:
            flat_patterns.append(frag)
            owner.append(qi)
    cand_df = None
    all_small = True
    if flat_patterns:
        cascade, exact = _plan_batch(
            flat_patterns, cfg, start_level, stats, freq, None, None, False
        )
        bad = {owner[i] for i in exact}
        brute_ids.extend(sorted(bad))
        cascade = [c for c in cascade if owner[c[0]] not in bad]
        if cascade:
            level = min(deepest for _, _, _, deepest in cascade)
            span = cfg.span(level)
            specs = [spec for _, spec, _, _ in cascade]
            firsts = [min(first, level) for _, _, first, _ in cascade]
            flat_ids = [c[0] for c in cascade]
            finished = _descend_batch(
                index, specs, firsts, [level] * len(specs), doc_axis=True,
                spark=spark, stats_out=stats_out,
            )
            # regroup the flat descent results per owning query and vote
            parts = []
            for qi in plan_ids:
                if qi in bad:
                    continue
                pat, d, kind = parsed[qi]
                drift = d if kind == "edit" else 0
                need = len(frag_lists[qi]) - d
                sub = {
                    j: finished[i]
                    for j, i in enumerate(
                        k for k, fid in enumerate(flat_ids) if owner[fid] == qi
                    )
                }
                cand, small = _vote_candidates_doc(
                    sub, frag_lists[qi], span, drift, need, spark)
                if cand is None:
                    continue
                all_small = all_small and small
                parts.append(cand.select(F.lit(qi).alias("query_id"), "doc_id", "wids"))
            if parts:
                cand_df = parts[0]
                for p_df in parts[1:]:
                    cand_df = cand_df.unionByName(p_df)

    pats = [np.asarray(p, dtype=np.int64) for p, _d, _k in parsed]
    ds = [d for _p, d, _k in parsed]
    kinds = [k for _p, _d, k in parsed]

    def _hits(arr: np.ndarray, cand: np.ndarray, qi: int) -> np.ndarray:
        return _hits_kernel(arr, cand, pats[qi], ds[qi], kinds[qi])

    out_parts = []
    if cand_df is not None:
        joined = corpus.join(
            F.broadcast(cand_df) if all_small else cand_df, on="doc_id", how="inner")

        def ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_q, out_d, out_pos = [], [], []
                for qi, did, toks, wids in zip(
                    pdf["query_id"], pdf["doc_id"], pdf["tokens"], pdf["wids"]
                ):
                    arr = np.asarray(toks, dtype=np.int64)
                    if len(arr) == 0:
                        continue
                    p_all = np.arange(len(arr), dtype=np.int64)
                    sel = p_all[np.isin(p_all // span, np.asarray(wids, dtype=np.int64))]
                    pos = _hits(arr, sel, int(qi))
                    out_q.extend([int(qi)] * len(pos))
                    out_d.extend([did] * len(pos))
                    out_pos.extend(pos.tolist())
                yield pd.DataFrame({
                    "query_id": np.asarray(out_q, dtype=np.int32),
                    "doc_id": out_d,
                    "pos": np.asarray(out_pos, dtype=np.int32),
                })

        out_parts.append(
            joined.select("query_id", "doc_id", "tokens", "wids").mapInPandas(
                ver, schema=APPROX_BATCH_SCHEMA
            )
        )
    if brute_ids:
        bset = sorted(set(brute_ids))

        def brute_ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_q, out_d, out_pos = [], [], []
                for did, toks in zip(pdf["doc_id"], pdf["tokens"]):
                    arr = np.asarray(toks, dtype=np.int64)
                    if len(arr) == 0:
                        continue
                    p_all = np.arange(len(arr), dtype=np.int64)
                    for qi in bset:
                        pos = _hits(arr, p_all, qi)
                        out_q.extend([qi] * len(pos))
                        out_d.extend([did] * len(pos))
                        out_pos.extend(pos.tolist())
                yield pd.DataFrame({
                    "query_id": np.asarray(out_q, dtype=np.int32),
                    "doc_id": out_d,
                    "pos": np.asarray(out_pos, dtype=np.int32),
                })

        out_parts.append(
            corpus.select("doc_id", "tokens").mapInPandas(
                brute_ver, schema=APPROX_BATCH_SCHEMA
            )
        )
    if not out_parts:
        return spark.createDataFrame([], APPROX_BATCH_SCHEMA)
    out = out_parts[0]
    for p_df in out_parts[1:]:
        out = out.unionByName(p_df)
    return out


GLOBAL_APPROX_BATCH_SCHEMA = "query_id int, gpos long"


def global_approx_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    queries,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Global-axis twin of approx_search_batch: the whole noisy-needle
    workload over the ONE concatenated stream through one shared cascade —
    matches may cross document boundaries. Candidate docs are assembled
    ONCE for the union of all queries' surviving windows ((doc_offset,
    query_id, wids) pairs only in the shuffle), then a single Arrow stage
    verifies each (candidate doc, query) with the kind-dispatched kernel
    over the stitched span. Per-query answers equal the single global
    searches. Returns (query_id, gpos)."""
    if cfg.axis != "global":
        raise ValueError("global_approx_search_batch needs cfg.axis='global'")
    parsed = _parse_queries(queries)
    spark = corpus.sparkSession
    if not parsed:
        return spark.createDataFrame([], GLOBAL_APPROX_BATCH_SCHEMA)
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    # one stitched corpus serves every query: the longest tail any query
    # can consume (m+d-1 for edit, m-1 for hamming — m+d-1 covers both)
    tail = max(len(p) + (d if k == "edit" else 0) for p, d, k in parsed)
    if tail > 1:
        stitched = _stitched_corpus(corpus, tail, min_doc_tokens=cfg.min_doc_tokens)
    else:
        stitched = corpus.withColumn("stitched", F.col("tokens"))
    pats = [np.asarray(p, dtype=np.int64) for p, _d, _k in parsed]
    ds = [d for _p, d, _k in parsed]
    kinds = [k for _p, _d, k in parsed]

    brute_ids = [qi for qi, (pat, d, _k) in enumerate(parsed) if d >= len(pat)]
    plan_ids = [qi for qi in range(len(parsed)) if qi not in brute_ids]
    frag_lists: dict[int, list] = {}
    flat_patterns, owner = [], []
    for qi in plan_ids:
        pat, d, _k = parsed[qi]
        s = _n_fragments(len(pat), d, cfg)
        frag_lists[qi] = _fragments(pat, s - 1)
        for _off, frag in frag_lists[qi]:
            flat_patterns.append(frag)
            owner.append(qi)
    surv_df = None
    all_small = True
    span = cfg.leaf_span
    if flat_patterns:
        cascade, exact = _plan_batch(
            flat_patterns, cfg, start_level, stats, freq, None, None, False
        )
        bad = {owner[i] for i in exact}
        brute_ids.extend(sorted(bad))
        cascade = [c for c in cascade if owner[c[0]] not in bad]
        if cascade:
            level = min(deepest for _, _, _, deepest in cascade)
            span = cfg.span(level)
            specs = [spec for _, spec, _, _ in cascade]
            firsts = [min(first, level) for _, _, first, _ in cascade]
            flat_ids = [c[0] for c in cascade]
            finished = _descend_batch(
                index, specs, firsts, [level] * len(specs), doc_axis=False,
                spark=spark, stats_out=stats_out,
            )
            parts = []
            for qi in plan_ids:
                if qi in bad:
                    continue
                pat, d, kind = parsed[qi]
                drift = d if kind == "edit" else 0
                need = len(frag_lists[qi]) - d
                sub = {
                    j: finished[i]
                    for j, i in enumerate(
                        k for k, fid in enumerate(flat_ids) if owner[fid] == qi
                    )
                }
                surv, fr = _vote_candidates_global(
                    sub, frag_lists[qi], span, drift, need, spark)
                if surv is None:
                    continue
                all_small = all_small and fr is not None
                parts.append(surv.select(F.lit(qi).alias("query_id"), "w_id"))
            if parts:
                surv_df = parts[0]
                for p_df in parts[1:]:
                    surv_df = surv_df.unionByName(p_df)

    out_parts = []
    if surv_df is not None:
        cand_docs = _candidate_docs(
            stitched, surv_df, span, ["doc_offset", "query_id"], all_small)

        def ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_q, out_g = [], []
                for qi, off, n_tok, st, wids in zip(
                    pdf["query_id"], pdf["doc_offset"], pdf["n_tok"],
                    pdf["stitched"], pdf["wids"],
                ):
                    qi, off, n_tok = int(qi), int(off), int(n_tok)
                    pat, d, kind = pats[qi], ds[qi], kinds[qi]
                    m = len(pat)
                    ext = m + d - 1 if kind == "edit" else m - 1
                    arr = np.asarray(st, dtype=np.int64)[: n_tok + ext]
                    if len(arr) == 0:
                        continue
                    p_all = np.arange(min(n_tok, len(arr)), dtype=np.int64)
                    sel = p_all[np.isin(
                        (p_all + off) // span, np.asarray(wids, dtype=np.int64))]
                    pos = _hits_kernel(arr, sel, pat, d, kind)
                    out_q.extend([qi] * len(pos))
                    out_g.extend((pos + off).tolist())
                yield pd.DataFrame({
                    "query_id": np.asarray(out_q, dtype=np.int32),
                    "gpos": np.asarray(out_g, dtype=np.int64),
                })

        out_parts.append(
            cand_docs.select(
                "query_id", "doc_offset", "n_tok", "stitched", "wids"
            ).mapInPandas(ver, schema=GLOBAL_APPROX_BATCH_SCHEMA)
        )
    if brute_ids:
        bset = sorted(set(brute_ids))

        def brute_ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_q, out_g = [], []
                for off, n_tok, st in zip(
                    pdf["doc_offset"], pdf["n_tok"], pdf["stitched"]
                ):
                    off, n_tok = int(off), int(n_tok)
                    base_arr = np.asarray(st, dtype=np.int64)
                    for qi in bset:
                        pat, d, kind = pats[qi], ds[qi], kinds[qi]
                        m = len(pat)
                        ext = m + d - 1 if kind == "edit" else m - 1
                        arr = base_arr[: n_tok + ext]
                        if len(arr) == 0:
                            continue
                        p_all = np.arange(min(n_tok, len(arr)), dtype=np.int64)
                        pos = _hits_kernel(arr, p_all, pat, d, kind)
                        out_q.extend([qi] * len(pos))
                        out_g.extend((pos + off).tolist())
                yield pd.DataFrame({
                    "query_id": np.asarray(out_q, dtype=np.int32),
                    "gpos": np.asarray(out_g, dtype=np.int64),
                })

        out_parts.append(
            stitched.select("doc_offset", "n_tok", "stitched").mapInPandas(
                brute_ver, schema=GLOBAL_APPROX_BATCH_SCHEMA
            )
        )
    if not out_parts:
        return spark.createDataFrame([], GLOBAL_APPROX_BATCH_SCHEMA)
    out = out_parts[0]
    for p_df in out_parts[1:]:
        out = out.unionByName(p_df)
    return out


def fuzzy_topk(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    d_max: int,
    k: int,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """RANKED fuzzy search: the ``k`` best positions by Levenshtein
    distance to ``pattern`` among matches within ``d_max``, deterministic
    tie-break (dist, doc_id, pos) — the search-box "did you mean" surface.
    Same pigeonhole candidates as kedit_pattern_search at d_max;
    verification keeps each candidate's BEST substring distance
    (_edit_best_dists) and the global top-k is Spark's distributed
    TakeOrdered (per-partition partial top-k, k rows shuffled per
    partition). Returns (doc_id, pos, dist)."""
    if cfg.axis != "doc":
        raise NotImplementedError("fuzzy_topk routes on the doc axis")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if d_max < 0 or k <= 0:
        raise ValueError("d_max must be >= 0 and k > 0")
    pat = np.asarray(pattern, dtype=np.int64)
    schema = "doc_id string, pos int, dist int"

    def dist_verify(joined, span=None):
        with_wids = span is not None

        def ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_d, out_pos, out_dist = [], [], []
                for row in pdf.itertuples(index=False):
                    arr = np.asarray(row.tokens, dtype=np.int64)
                    if len(arr) == 0:
                        continue
                    p_all = np.arange(len(arr), dtype=np.int64)
                    if with_wids:
                        p_all = p_all[np.isin(
                            p_all // span, np.asarray(row.wids, dtype=np.int64))]
                    pos, dd = _edit_best_dists(arr, p_all, pat, d_max)
                    out_d.extend([row.doc_id] * len(pos))
                    out_pos.extend(pos.tolist())
                    out_dist.extend(dd.tolist())
                yield pd.DataFrame({
                    "doc_id": out_d,
                    "pos": np.asarray(out_pos, dtype=np.int32),
                    "dist": np.asarray(out_dist, dtype=np.int32),
                })

        cols = ["doc_id", "tokens"] + (["wids"] if with_wids else [])
        return joined.select(*cols).mapInPandas(ver, schema=schema)

    def ranked(df):
        return df.orderBy(F.asc("dist"), F.asc("doc_id"), F.asc("pos")).limit(int(k))

    if d_max >= m:
        return ranked(dist_verify(corpus))
    prep = _prepare(pattern, d_max, cfg, start_level, stats, freq)
    if prep is None:
        return ranked(dist_verify(corpus))
    frags, specs, firsts, level, span, need = prep
    spark = corpus.sparkSession
    finished = _descend_batch(
        index, specs, firsts, [level] * len(specs), doc_axis=True, spark=spark,
        stats_out=stats_out,
    )
    cand, cand_small = _vote_candidates_doc(finished, frags, span, d_max, need, spark)
    if cand is None:
        return spark.createDataFrame([], schema)
    joined = corpus.join(
        F.broadcast(cand) if cand_small else cand, on="doc_id", how="inner")
    return ranked(dist_verify(joined, span))


def global_fuzzy_topk(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    d_max: int,
    k: int,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Stream-axis twin of fuzzy_topk: the k best GLOBAL positions by
    Levenshtein distance within d_max over the ONE concatenated stream
    (matches may cross doc boundaries), deterministic (dist, gpos) order.
    Returns (gpos, dist)."""
    if cfg.axis != "global":
        raise ValueError("global_fuzzy_topk needs cfg.axis='global'")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if d_max < 0 or k <= 0:
        raise ValueError("d_max must be >= 0 and k > 0")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    if m + d_max > 1:
        stitched = _stitched_corpus(corpus, m + d_max, min_doc_tokens=cfg.min_doc_tokens)
    else:
        stitched = corpus.withColumn("stitched", F.col("tokens"))
    pat = np.asarray(pattern, dtype=np.int64)
    schema = "gpos long, dist int"

    def dist_verify(cand_docs, span=None):
        with_wids = span is not None

        def ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_g, out_dist = [], []
                for row in pdf.itertuples(index=False):
                    off, n_tok = int(row.doc_offset), int(row.n_tok)
                    arr = np.asarray(row.stitched, dtype=np.int64)[: n_tok + m + d_max - 1]
                    if len(arr) == 0:
                        continue
                    p_all = np.arange(min(n_tok, len(arr)), dtype=np.int64)
                    if with_wids:
                        p_all = p_all[np.isin(
                            (p_all + off) // span, np.asarray(row.wids, dtype=np.int64))]
                    pos, dd = _edit_best_dists(arr, p_all, pat, d_max)
                    out_g.extend((pos + off).tolist())
                    out_dist.extend(dd.tolist())
                yield pd.DataFrame({
                    "gpos": np.asarray(out_g, dtype=np.int64),
                    "dist": np.asarray(out_dist, dtype=np.int32),
                })

        cols = ["doc_offset", "n_tok", "stitched"] + (["wids"] if with_wids else [])
        return cand_docs.select(*cols).mapInPandas(ver, schema=schema)

    def ranked(df):
        return df.orderBy(F.asc("dist"), F.asc("gpos")).limit(int(k))

    if d_max >= m:
        return ranked(dist_verify(stitched))
    prep = _prepare(pattern, d_max, cfg, start_level, stats, freq)
    if prep is None:
        return ranked(dist_verify(stitched))
    frags, specs, firsts, level, span, need = prep
    spark = corpus.sparkSession
    finished = _descend_batch(
        index, specs, firsts, [level] * len(specs), doc_axis=False, spark=spark,
        stats_out=stats_out,
    )
    survivors, final_rows = _vote_candidates_global(
        finished, frags, span, d_max, need, spark)
    if survivors is None:
        return spark.createDataFrame([], schema)
    cand_docs = _candidate_docs(
        stitched, survivors, span, ["doc_offset"], final_rows is not None)
    return ranked(dist_verify(cand_docs, span))
