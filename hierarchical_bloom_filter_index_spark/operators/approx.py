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
4. verify each candidate start IN-WINDOW-FIRST with a Hamming-counting /
   Levenshtein scan (JVM zip_with / built-in levenshtein, no Python).

Extends the reference's exact ``report()`` surface
(search/BlockSearch.java:50-155) to approximate matching over the SAME
index bytes; the pigeonhole fragment filter is the classical
Wu-Manber/partition approach for k-mismatch search. The fallback and the
verifier are one primitive, so the index path can only ever prune, never
change the answer.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..config import HbiConfig
from ..functions import hamming_positions
from .batch import _descend_batch, _plan_batch
from .route import MATCH_SCHEMA, _global_verify, _stitched_corpus

__all__ = [
    "kmismatch_pattern_search",
    "global_kmismatch_pattern_search",
    "kedit_pattern_search",
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
    # window-test FIRST, Hamming second: the wid test is a cheap int probe,
    # the Hamming check allocates a zip_with slice per position — with a
    # frequent fragment most docs are candidates, so running the Hamming
    # scan over every position (then filtering) costs O(n_tok * m) across
    # the corpus. Filtering to in-window starts first was measured 3x
    # faster on the sf0.1 driver query.
    pat = F.array(*[F.lit(int(x)) for x in pattern])

    def near(i):
        diffs = F.zip_with(F.slice(F.col("tokens"), i + 1, m), pat, lambda x, y: x != y)
        return F.size(F.filter(diffs, lambda b: b)) <= F.lit(int(d))

    return (
        corpus.join(F.broadcast(cand) if cand_small else cand, on="doc_id", how="inner")
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("tokens") >= m,
                    F.filter(
                        F.filter(
                            F.sequence(F.lit(0), F.size("tokens") - m),
                            lambda i: F.array_contains("wids", (i / span).cast("long")),
                        ),
                        near,
                    ),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
    )


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
    # window-test-first positions_fn (see the doc-axis comment): the wids /
    # doc_offset columns are in scope where _global_verify applies it, so
    # the Hamming check only runs on in-window starts; _global_verify's own
    # outer filter re-checks membership on the few survivors (harmless)
    pat = F.array(*[F.lit(int(x)) for x in pattern])

    def positions_fn(c):
        def in_wid(i):
            return F.array_contains(
                "wids", ((F.col("doc_offset") + i) / span).cast("long"))

        def near(i):
            diffs = F.zip_with(F.slice(c, i + 1, m), pat, lambda x, y: x != y)
            return F.size(F.filter(diffs, lambda b: b)) <= F.lit(int(d))

        return F.when(
            F.size(c) >= m,
            F.filter(F.filter(F.sequence(F.lit(0), F.size(c) - m), in_wid), near),
        ).otherwise(F.array().cast("array<int>"))

    return _global_verify(stitched, scan_col, survivors, final_rows, span, positions_fn)


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
    only). Char-level: corpus tokens are codepoints, so verification runs
    the JVM built-in ``levenshtein`` over the reconstructed string —
    min over candidate lengths L in [m-d, m+d] of
    levenshtein(substr(text, pos, L), pattern) <= d. The same pigeonhole
    fragment pruning as kmismatch applies (a fragment untouched by edits
    still occurs EXACTLY, merely shifted by at most d), with the candidate
    window shifts widened by the ±d drift (_edit_shifts)."""
    if cfg.axis != "doc":
        raise NotImplementedError("kedit_pattern_search routes on the doc axis")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if d < 0:
        raise ValueError("d must be >= 0")
    pat_str = "".join(chr(int(t)) for t in pattern)
    text = F.array_join(F.transform("tokens", lambda t: F.char(t)), "")
    lengths = list(range(max(m - d, 0), m + d + 1))

    def ed_ok(t):
        def ok(i):
            cands = [
                F.levenshtein(t.substr(i + 1, F.lit(L)), F.lit(pat_str))
                for L in lengths
            ]
            c = cands[0] if len(cands) == 1 else F.least(*cands)
            return c <= F.lit(int(d))

        return ok

    def brute() -> DataFrame:
        t = F.col("_t")
        return (
            corpus.select("doc_id", text.alias("_t"))
            .select(
                "doc_id",
                F.explode(
                    F.when(
                        F.length("_t") > 0,
                        F.filter(F.sequence(F.lit(0), F.length("_t") - 1), ed_ok(t)),
                    ).otherwise(F.array().cast("array<int>"))
                ).alias("pos"),
            )
        )

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
    t = F.col("_t")
    return (
        corpus.join(F.broadcast(cand) if cand_small else cand, on="doc_id", how="inner")
        .select("doc_id", text.alias("_t"), "wids")
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.length("_t") > 0,
                    F.filter(
                        F.filter(
                            F.sequence(F.lit(0), F.length("_t") - 1),
                            lambda i: F.array_contains("wids", (i / span).cast("long")),
                        ),
                        ed_ok(t),
                    ),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
    )
