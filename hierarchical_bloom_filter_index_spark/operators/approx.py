"""Approximate (k-mismatch) pattern search over the Bloom cascade — both
axes.

A pattern occurrence with at most ``d`` token mismatches must contain at
least ONE of any ``d+1`` disjoint contiguous fragments of the pattern
matching EXACTLY (pigeonhole). So the index prunes approximately the same
way it prunes exactly:

1. split the pattern into ``d+1`` near-equal contiguous fragments;
2. search every fragment through ONE shared batched cascade
   (batch._descend_batch — a level is scanned once for all fragments);
3. shift each fragment's surviving windows back to PATTERN-START windows
   (fragment at offset ``off`` starting in window ``w`` puts the pattern
   start in window ``w - off//span`` or ``w - off//span - 1`` — both kept,
   a sound superset) and take the UNION across fragments (OR semantics:
   any exact fragment certifies the candidate);
4. verify each candidate start with a Hamming-counting scan
   (functions.hamming_positions — JVM zip_with/filter, no Python).

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
from .route import (
    MATCH_SCHEMA,
    _candidates_by_doc,
    _global_verify,
    _stitched_corpus,
)

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


def _shifted_wids(w_id_col, off: int, span: int):
    """Candidate pattern-start windows for a fragment survivor window.
    fs in [w*span, (w+1)*span) and p = fs - off give
    wid(p) in {w - off//span - 1, w - off//span} (exactly, when
    off % span > 0; superset otherwise — soundness over tightness)."""
    q = off // span
    return F.explode(F.array(w_id_col - F.lit(q), w_id_col - F.lit(q + 1)))


def _prepare(pattern, d, cfg, start_level, stats, freq):
    """Shared plan step: fragments -> batch specs at ONE common level.
    Returns (frags, specs, firsts, level, span) or None when the cascade
    cannot prune (some fragment unprunable) and the caller must scan."""
    frags = _fragments(pattern, d)
    cascade, exact = _plan_batch(
        [f for _, f in frags], cfg, start_level, stats, freq, None, None, False
    )
    if exact:
        # OR-union semantics: one unprunable fragment voids all pruning
        return None
    # one common stop level: the shallowest of the fragments' deepest
    # usable levels (shallower is always sound), so every survivor set
    # shares ONE window span for the shift arithmetic
    level = min(deepest for _, _, _, deepest in cascade)
    specs = [spec for _, spec, _, _ in cascade]
    firsts = [min(first, level) for _, _, first, _ in cascade]
    return frags, specs, firsts, level, cfg.span(level)


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
    frags, specs, firsts, level, span = prep
    spark = corpus.sparkSession
    finished = _descend_batch(
        index, specs, firsts, [level] * len(specs), doc_axis=True, spark=spark,
        stats_out=stats_out,
    )
    all_collected = all(rows is not None for _, _, rows in finished.values())
    if all_collected:
        by_doc: dict[str, set[int]] = {}
        for p, (off, _frag) in enumerate(frags):
            q = off // span
            for doc_id, w in finished[p][2]:
                s = by_doc.setdefault(doc_id, set())
                s.add(int(w) - q)
                s.add(int(w) - q - 1)
        if not by_doc:
            return spark.createDataFrame([], MATCH_SCHEMA)
        cand = spark.createDataFrame(
            [(doc, sorted(ws)) for doc, ws in by_doc.items()],
            "doc_id string, wids array<long>",
        )
        cand_small = True
    else:
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
            parts.append(
                src.select("doc_id", _shifted_wids(F.col("w_id"), off, span).alias("w_id"))
            )
        if not parts:
            return spark.createDataFrame([], MATCH_SCHEMA)
        union = parts[0]
        for q_df in parts[1:]:
            union = union.unionByName(q_df)
        cand, cand_small = _candidates_by_doc(spark, union, None, stats_out)
    return (
        corpus.join(F.broadcast(cand) if cand_small else cand, on="doc_id", how="inner")
        .select(
            "doc_id",
            F.filter(
                hamming_positions("tokens", pattern, d),
                lambda i: F.array_contains("wids", (i / span).cast("long")),
            ).alias("positions"),
        )
        .select("doc_id", F.explode("positions").alias("pos"))
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
    frags, specs, firsts, level, span = prep
    spark = corpus.sparkSession
    finished = _descend_batch(
        index, specs, firsts, [level] * len(specs), doc_axis=False, spark=spark,
        stats_out=stats_out,
    )
    all_collected = all(rows is not None for _, _, rows in finished.values())
    if all_collected:
        wids: set[int] = set()
        for p, (off, _frag) in enumerate(frags):
            q = off // span
            for (w,) in finished[p][2]:
                wids.add(int(w) - q)
                wids.add(int(w) - q - 1)
        wids.discard(-1)
        if not wids:
            return spark.createDataFrame([], "gpos long")
        survivors = spark.createDataFrame([(w,) for w in sorted(wids)], "w_id long")
        final_rows = [1]  # small/collected: _global_verify broadcasts
    else:
        parts = []
        for p, (off, _frag) in enumerate(frags):
            fdf, n, rows = finished[p]
            if fdf is None and not rows:
                continue
            src = (
                spark.createDataFrame(rows, "w_id long")
                if rows is not None
                else fdf
            )
            parts.append(src.select(_shifted_wids(F.col("w_id"), off, span).alias("w_id")))
        if not parts:
            return spark.createDataFrame([], "gpos long")
        survivors = parts[0]
        for q_df in parts[1:]:
            survivors = survivors.unionByName(q_df)
        survivors = survivors.filter(F.col("w_id") >= 0).distinct()
        final_rows = None
    return _global_verify(
        stitched, scan_col, survivors, final_rows, span,
        lambda c: hamming_positions(c, pattern, d),
    )


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
    frags, specs, firsts, level, span = prep
    spark = corpus.sparkSession
    finished = _descend_batch(
        index, specs, firsts, [level] * len(specs), doc_axis=True, spark=spark,
        stats_out=stats_out,
    )
    all_collected = all(rows is not None for _, _, rows in finished.values())
    if all_collected:
        by_doc: dict[str, set[int]] = {}
        for p, (off, _frag) in enumerate(frags):
            shifts = _edit_shifts(off, d, span)
            for doc_id, w in finished[p][2]:
                s = by_doc.setdefault(doc_id, set())
                for sh in shifts:
                    s.add(int(w) + sh)
        if not by_doc:
            return spark.createDataFrame([], MATCH_SCHEMA)
        cand = spark.createDataFrame(
            [(doc, sorted(ws)) for doc, ws in by_doc.items()],
            "doc_id string, wids array<long>",
        )
        cand_small = True
    else:
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
            shifts = list(_edit_shifts(off, d, span))
            parts.append(
                src.select(
                    "doc_id",
                    F.explode(
                        F.array(*[F.col("w_id") + F.lit(sh) for sh in shifts])
                    ).alias("w_id"),
                )
            )
        if not parts:
            return spark.createDataFrame([], MATCH_SCHEMA)
        union = parts[0]
        for q_df in parts[1:]:
            union = union.unionByName(q_df)
        cand, cand_small = _candidates_by_doc(spark, union, None, stats_out)
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
