"""Batched multi-pattern search: N patterns share ONE cascade.

The reference replays its query workloads pattern-by-pattern (report() per
query, PMIndex/HBI.java:415-605, driven from the benchmark CSVs in
Benchmarks/): at 100 TB each pattern would re-scan every index level. Here
the level probe computes EVERY pattern's key bitmask in one Arrow pass over
each sketch blob (blobs are deserialized once per level for the whole
batch), the neighbor-union combine is one zip_with over the mask arrays,
and the descent keeps a (window, pattern_id) frontier — one Spark job per
level REGARDLESS of how many patterns are in flight. Verification stays
per-pattern exact (the same codegen'd subsequence scan, dispatched on
pattern_id), so batching changes cost, never answers.

Per-pattern answers are identical to running pattern_search /
global_pattern_search one pattern at a time (differential-tested); patterns
the index cannot prune (too short for the n-gram, longer than tree_span, or
longer than every surviving span of a compacted index) fall back to the
exact scan individually and are unioned into the result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..config import HbiConfig
from ..functions import subsequence_positions
from .probe import probe_blobs
from .route import (
    _candidates_by_doc,
    _cut_frontier,
    _level_rows,
    _pattern_spec,
    _plan_start_level,
    _stitched_corpus,
    brute_force_search,
    deepest_usable_level,
    pattern_probe_plan,
)

BATCH_MATCH_SCHEMA = "pattern_id int, doc_id string, pos int"
BATCH_GLOBAL_SCHEMA = "pattern_id int, gpos long"

# above this many live patterns in one span group, verification switches
# from the codegen'd pattern_id-dispatched when-chain to one Arrow stage
ARROW_VERIFY_MIN_PATTERNS = 8


def _verify_arrow_doc(joined: DataFrame, patterns: list[list[int]], span: int) -> DataFrame:
    """One Arrow stage verifies every (candidate doc, pattern) pair of a
    span group: exact sliding-window compare per pair, positions filtered to
    the pattern's surviving windows. Plan size is independent of the batch
    size (the when-chain alternative adds one subsequence expression per
    pattern)."""

    def ver(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_p, out_d, out_pos = [], [], []
            for pid, did, toks, wids in zip(
                pdf["pattern_id"], pdf["doc_id"], pdf["tokens"], pdf["wids"]
            ):
                pat = np.asarray(patterns[pid], dtype=np.int64)
                arr = np.asarray(toks, dtype=np.int64)
                m = len(pat)
                if len(arr) < m:
                    continue
                sw = np.lib.stride_tricks.sliding_window_view(arr, m)
                pos = np.nonzero((sw == pat).all(axis=1))[0]
                if len(pos) == 0:
                    continue
                pos = pos[np.isin(pos // span, np.asarray(wids, dtype=np.int64))]
                out_p.extend([pid] * len(pos))
                out_d.extend([did] * len(pos))
                out_pos.extend(pos.tolist())
            yield pd.DataFrame(
                {
                    "pattern_id": np.asarray(out_p, dtype=np.int32),
                    "doc_id": out_d,
                    "pos": np.asarray(out_pos, dtype=np.int32),
                }
            )

    return joined.select("pattern_id", "doc_id", "tokens", "wids").mapInPandas(
        ver, schema=BATCH_MATCH_SCHEMA
    )


def _verify_arrow_global(cand_docs: DataFrame, patterns: list[list[int]], span: int) -> DataFrame:
    """Arrow verification for the global axis: match starts must lie within
    the doc (i < n_tok, runs may finish in the stitched tail) and the
    start's GLOBAL window must have survived for that pattern."""

    def ver(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_p, out_g = [], []
            for pid, off, n_tok, stitched, wids in zip(
                pdf["pattern_id"], pdf["doc_offset"], pdf["n_tok"],
                pdf["stitched"], pdf["wids"],
            ):
                pat = np.asarray(patterns[pid], dtype=np.int64)
                m = len(pat)
                # bound the scan to doc + (m-1) continuation tokens (the
                # shared prestitched tail may be far longer)
                arr = np.asarray(stitched, dtype=np.int64)[: int(n_tok) + m - 1]
                if len(arr) < m:
                    continue
                sw = np.lib.stride_tricks.sliding_window_view(arr, m)
                pos = np.nonzero((sw == pat).all(axis=1))[0]
                pos = pos[pos < n_tok]
                if len(pos) == 0:
                    continue
                g = pos + off
                g = g[np.isin(g // span, np.asarray(wids, dtype=np.int64))]
                out_p.extend([pid] * len(g))
                out_g.extend(g.tolist())
            yield pd.DataFrame(
                {
                    "pattern_id": np.asarray(out_p, dtype=np.int32),
                    "gpos": np.asarray(out_g, dtype=np.int64),
                }
            )

    return cand_docs.select(
        "pattern_id", "doc_offset", "n_tok", "stitched", "wids"
    ).mapInPandas(ver, schema=BATCH_GLOBAL_SCHEMA)


def _probe_level_batch(
    level_rows: DataFrame,
    specs: list[tuple[np.ndarray, int, list[int]]],
    doc_axis: bool,
    probe_counter=None,
) -> DataFrame:
    """One level's batched probe: every window × every pattern in ONE Arrow
    stage. Each blob is deserialized once and probed against the UNION of
    all patterns' key lists; per-pattern masks are column gathers of the
    shared hit matrix. Emits (id cols, pattern_id) for surviving
    (window, pattern) pairs; the neighbor-union test per pattern is the
    same OR-of-AND-masks as the single-pattern probe, over
    element_at(umasks, p)."""
    P = len(specs)
    all_keys = np.unique(np.concatenate([s[0] for s in specs]))
    key_pos = [np.searchsorted(all_keys, s[0]) for s in specs]
    anchor_pos = [
        int(np.searchsorted(all_keys, s[0][s[1]])) if s[1] >= 0 else -1 for s in specs
    ]
    id_cols = ["doc_id", "w_id"] if doc_axis else ["w_id"]
    schema = (
        ("doc_id string, " if doc_axis else "")
        + "w_id long, anchor_oks array<boolean>, masks array<long>"
    )

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if probe_counter is not None:
                probe_counter.add(len(pdf))
            hits = probe_blobs(pdf["bloom"].tolist(), all_keys)  # (n, |union|)
            out = pdf[id_cols].copy()
            anch = np.ones((len(pdf), P), dtype=bool)
            masks = np.zeros((len(pdf), P), dtype=np.int64)
            for p in range(P):
                hp = hits[:, key_pos[p]]
                masks[:, p] = (
                    hp.astype(np.uint64)
                    << np.arange(hp.shape[1], dtype=np.uint64)[None, :]
                ).sum(axis=1, dtype=np.uint64).astype(np.int64)
                if anchor_pos[p] >= 0:
                    anch[:, p] = hits[:, anchor_pos[p]]
            out["anchor_oks"] = list(anch)
            out["masks"] = list(masks)
            yield out

    masks = level_rows.mapInPandas(probe, schema=schema)
    zero = F.array_repeat(F.lit(0).cast("long"), P)
    bor = lambda a, b: a.bitwiseOR(b)  # noqa: E731
    if doc_axis:
        w = Window.partitionBy("doc_id").orderBy("w_id")
        nxt = F.when(
            F.lead("w_id").over(w) == F.col("w_id") + 1, F.lead("masks").over(w)
        ).otherwise(zero)
        combined = masks.withColumn("umasks", F.zip_with(F.col("masks"), nxt, bor))
    else:
        nbr = masks.select((F.col("w_id") - 1).alias("w_id"), F.col("masks").alias("nmasks"))
        combined = masks.join(nbr, on="w_id", how="left").withColumn(
            "umasks", F.zip_with(F.col("masks"), F.coalesce(F.col("nmasks"), zero), bor)
        )
    surviving = []
    for p, (_keys, _anchor_idx, align_masks) in enumerate(specs):
        um = F.element_at("umasks", p + 1)
        cond = None
        for am in align_masks:
            c = um.bitwiseAND(F.lit(am)) == F.lit(am)
            cond = c if cond is None else (cond | c)
        surviving.append(F.when(F.element_at("anchor_oks", p + 1) & cond, F.lit(p)))
    surv = F.filter(F.array(*surviving), lambda x: x.isNotNull())
    return combined.select(*id_cols, F.explode(surv).alias("pattern_id"))


def window_membership_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    tokens: list[int],
    level: int | None = None,
) -> DataFrame:
    """'Which windows at level L contain token t?' for MANY tokens in ONE
    level scan (the batched report/exists slice — the reference replays its
    membership workloads token-by-token): each sketch blob is deserialized
    and probed once against every token, then one corpus join verifies all
    tokens with the occurrence scan dispatched on the token literal. Exact
    (token, doc_id, w_id) rows, equal to a union of window_membership
    calls."""
    if cfg.ngram != 1:
        raise ValueError("window_membership_batch requires a token-keyed index (ngram=1)")
    if not tokens:
        raise ValueError("empty token batch")
    L = cfg.deepest if level is None else level
    span = cfg.span(L)
    vals = sorted({int(t) for t in tokens})
    keys = np.asarray(vals, dtype=np.uint64)
    rows = _level_rows(index, L, doc_axis=True)

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hits = probe_blobs(pdf["bloom"].tolist(), keys)  # (n, K)
            ri, ci = np.nonzero(hits)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[ri],
                    "w_id": pdf["w_id"].to_numpy()[ri],
                    "token": np.asarray(vals, dtype=np.int32)[ci],
                }
            )

    cand = (
        rows.mapInPandas(probe, schema="doc_id string, w_id long, token int")
        .groupBy("doc_id", "token")
        .agg(F.collect_set("w_id").alias("wids"))
    )
    joined = corpus.join(cand, on="doc_id", how="inner")
    if len(vals) > ARROW_VERIFY_MIN_PATTERNS:
        # large token workloads: one Arrow stage instead of a when-chain
        # whose plan grows one occurrence expression per token
        def ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_t, out_d, out_w = [], [], []
                for t, did, toks, wids in zip(
                    pdf["token"], pdf["doc_id"], pdf["tokens"], pdf["wids"]
                ):
                    arr = np.asarray(toks, dtype=np.int64)
                    w = np.unique(np.nonzero(arr == t)[0] // span)
                    w = w[np.isin(w, np.asarray(wids, dtype=np.int64))]
                    out_t.extend([t] * len(w))
                    out_d.extend([did] * len(w))
                    out_w.extend(w.tolist())
                yield pd.DataFrame(
                    {
                        "token": np.asarray(out_t, dtype=np.int32),
                        "doc_id": out_d,
                        "w_id": np.asarray(out_w, dtype=np.int64),
                    }
                )

        return joined.select("token", "doc_id", "tokens", "wids").mapInPandas(
            ver, schema="token int, doc_id string, w_id long"
        )

    def occ_expr(t: int):
        # a helper (not a default-arg lambda) so `t` closes over correctly:
        # a two-parameter lambda would be read by F.filter as (element,
        # index) and silently compare against the POSITION
        return F.array_distinct(
            F.transform(
                F.filter(
                    F.sequence(F.lit(0).cast("long"), (F.col("n_tok") - 1).cast("long")),
                    lambda i: F.element_at("tokens", (i + 1).cast("int")) == F.lit(t),
                ),
                lambda i: (i / span).cast("long"),
            )
        )

    occ = None
    for t in vals:
        occ = (
            F.when(F.col("token") == t, occ_expr(t))
            if occ is None
            else occ.when(F.col("token") == t, occ_expr(t))
        )
    return joined.select(
        "token", "doc_id",
        F.explode(F.array_intersect(occ, F.col("wids"))).alias("w_id"),
    )


def global_window_membership_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    tokens: list[int],
    level: int | None = None,
) -> DataFrame:
    """'Which GLOBAL stream windows contain token t?' for MANY tokens in ONE
    leaf-level scan of the one-stream index — the global-axis twin of
    window_membership_batch (single-token global: route.py
    global_window_membership; the reference's axis IS the stream,
    PMIndex/HBI.java report/exists). Each sketch blob is probed once against
    every token; candidate docs are found via (doc_offset, w_id) pairs only
    (token arrays join back by doc_offset); verification runs one
    occurrence scan per surviving (doc, token) pair — the doc-axis batch's
    shape, so a doc's token array crosses the Arrow boundary once per
    candidate token, with Bloom pruning keeping that fan-out to tokens
    actually plausible in the doc. Exact DISTINCT (token, w_id) rows,
    equal to a union of per-token global_window_membership calls."""
    if cfg.axis != "global":
        raise ValueError("global_window_membership_batch needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError("global_window_membership_batch requires a token-keyed index (ngram=1)")
    if not tokens:
        raise ValueError("empty token batch")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    # n_tok = 0 docs: the window sequence would DESCEND (phantom w_ids) and
    # the verify scan would index tokens[0] — same guard as the single-token op
    corpus = corpus.filter(F.col("n_tok") > 0)
    L = cfg.deepest if level is None else level
    span = cfg.span(L)
    vals = sorted({int(t) for t in tokens})
    keys = np.asarray(vals, dtype=np.uint64)
    rows = _level_rows(index, L, doc_axis=False)

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hits = probe_blobs(pdf["bloom"].tolist(), keys)  # (n, K)
            ri, ci = np.nonzero(hits)
            yield pd.DataFrame(
                {
                    "w_id": pdf["w_id"].to_numpy()[ri],
                    "token": np.asarray(vals, dtype=np.int32)[ci],
                }
            )

    cand = rows.mapInPandas(probe, schema="w_id long, token int")
    doc_windows = corpus.select(
        "doc_offset", "n_tok",
        F.explode(
            F.sequence(
                (F.col("doc_offset") / span).cast("long"),
                ((F.col("doc_offset") + F.col("n_tok") - 1) / span).cast("long"),
            )
        ).alias("w_id"),
    )
    hit_docs = (
        doc_windows.join(cand, on="w_id", how="inner")
        .groupBy("doc_offset", "token")
        .agg(F.collect_set("w_id").alias("wids"))
    )
    joined = corpus.join(hit_docs, on="doc_offset", how="inner")
    if len(vals) > ARROW_VERIFY_MIN_PATTERNS:
        # large token workloads: one Arrow stage instead of a when-chain
        def ver(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out_t, out_w = [], []
                for t, off, toks, wids in zip(
                    pdf["token"], pdf["doc_offset"], pdf["tokens"], pdf["wids"]
                ):
                    arr = np.asarray(toks, dtype=np.int64)
                    w = np.unique((int(off) + np.nonzero(arr == t)[0]) // span)
                    w = w[np.isin(w, np.asarray(wids, dtype=np.int64))]
                    out_t.extend([t] * len(w))
                    out_w.extend(w.tolist())
                yield pd.DataFrame(
                    {
                        "token": np.asarray(out_t, dtype=np.int32),
                        "w_id": np.asarray(out_w, dtype=np.int64),
                    }
                )

        return joined.select("token", "doc_offset", "tokens", "wids").mapInPandas(
            ver, schema="token int, w_id long"
        ).distinct()

    def occ_expr(t: int):
        # nested def, not a default-arg lambda: a two-parameter lambda would
        # be read by F.filter as (element, index) and compare the POSITION
        return F.array_distinct(
            F.transform(
                F.filter(
                    F.sequence(F.lit(0).cast("long"), (F.col("n_tok") - 1).cast("long")),
                    lambda i: F.element_at("tokens", (i + 1).cast("int")) == F.lit(t),
                ),
                lambda i: ((F.col("doc_offset") + i) / span).cast("long"),
            )
        )

    occ = None
    for t in vals:
        occ = (
            F.when(F.col("token") == t, occ_expr(t))
            if occ is None
            else occ.when(F.col("token") == t, occ_expr(t))
        )
    return (
        joined.select(
            "token", F.explode(F.array_intersect(occ, F.col("wids"))).alias("w_id")
        )
        .distinct()
    )


def _descend_batch(
    index: DataFrame,
    specs: list[tuple[np.ndarray, int, list[int]]],
    firsts: list[int],
    deepests: list[int],
    doc_axis: bool,
    spark,
    stats_out: dict | None = None,
):
    """Shared children-of-survivors descent for a pattern batch. The frontier
    carries (window, pattern_id); each pattern ENTERS the cascade at its OWN
    planned level (a frequent pattern the planner seeds at the leaf must not
    drag a huge frontier through every coarse level — levels nobody is
    descending through or activating at are skipped entirely) and stops at
    ITS deepest usable level, handing its final frontier to verification
    while others continue. A level where some pattern activates scans the
    full level once, shared by every pattern probing there. Returns
    {pattern_index: (survivors_df_or_None, n, collected_rows_or_None)} with
    rows/dfs holding only the id columns (pattern_id stripped)."""
    id_cols = ["doc_id", "w_id"] if doc_axis else ["w_id"]
    schema = ("doc_id string, " if doc_axis else "") + "w_id long, pattern_id int"
    pending = set(range(len(specs)))
    active: list[int] = []
    frontier: DataFrame | None = None
    frontier_rows = None
    finished: dict[int, tuple[DataFrame | None, int, list | None]] = {}
    probe_counter = spark.sparkContext.accumulator(0) if stats_out is not None else None
    if stats_out is not None:
        stats_out.update({"start_levels": {p: int(f) for p, f in enumerate(firsts)},
                          "windows_probed": {}, "survivors": {}})
    for L in range(min(firsts), max(deepests) + 1):
        activators = [p for p in pending if firsts[p] == L]
        pending -= set(activators)
        if frontier is None and not activators:
            continue  # nothing descends through or enters at this level
        rows = _level_rows(index, L, doc_axis=doc_axis)
        children = None
        if frontier is not None:
            kids = F.explode(
                F.array(F.col("w_id") * 2, F.col("w_id") * 2 + 1, F.col("w_id") * 2 + 2)
            ).alias("w_id")
            sel = (["doc_id"] if doc_axis else []) + ["pattern_id"]
            children = frontier.select(*sel, kids).distinct()
            if frontier_rows is not None:  # collected → small → broadcast
                children = F.broadcast(children)
            if not activators:
                # no fresh entrant needs the full level: restrict the scan
                # to the descending frontier's children
                windows = children.select(*id_cols).distinct()
                rows = rows.join(windows, on=id_cols, how="left_semi")
        if probe_counter is not None:
            probe_counter.value = 0
        probed = _probe_level_batch(rows, specs, doc_axis, probe_counter)
        if children is not None:
            # active patterns only keep windows descending from THEIR
            # survivors; activators keep every surviving window
            constrained = probed.join(children, on=id_cols + ["pattern_id"], how="left_semi")
            if activators:
                fresh = probed.filter(F.col("pattern_id").isin(activators))
                probed = constrained.unionByName(fresh)
            else:
                probed = constrained
        else:
            probed = probed.filter(F.col("pattern_id").isin(activators))
        frontier, n_surv, frontier_rows = _cut_frontier(probed, schema, probe_counter)
        if stats_out is not None:
            stats_out["windows_probed"][L] = probe_counter.value
            stats_out["survivors"][L] = n_surv
        live = active + activators
        if n_surv == 0:
            for p in live:
                finished[p] = (None, 0, [])
            active, frontier, frontier_rows = [], None, None
            if not pending:
                return finished
            continue
        done_now = [p for p in live if deepests[p] == L]
        for p in done_now:
            if frontier_rows is not None:
                mine = [r[:-1] for r in frontier_rows if r[-1] == p]
                fdf = (
                    spark.createDataFrame(mine, ("doc_id string, " if doc_axis else "") + "w_id long")
                    if mine
                    else None
                )
                finished[p] = (fdf, len(mine), mine)
            else:
                fdf = frontier.filter(F.col("pattern_id") == p).select(*id_cols)
                finished[p] = (fdf, -1, None)  # n unknown; only emptiness matters later
        active = [p for p in live if deepests[p] > L]
        if not active and not pending:
            return finished
        if done_now:
            if frontier_rows is not None:
                frontier_rows = [r for r in frontier_rows if r[-1] in set(active)]
                frontier = spark.createDataFrame(frontier_rows, schema) if frontier_rows else None
            elif active:
                frontier = frontier.filter(F.col("pattern_id").isin(active))
            else:
                frontier, frontier_rows = None, None
            if frontier is None:
                frontier_rows = None
                for p in active:
                    finished[p] = (None, 0, [])
                active = []
                if not pending:
                    return finished
    # any pattern not yet recorded died with an empty frontier
    for p in list(active):
        finished.setdefault(p, (None, 0, []))
    return finished


def _plan_batch(patterns, cfg, start_level, stats, freq, markov, model, selective):
    """Per-pattern probe plans. Returns (cascade: list of
    (pattern_index, spec, first_level, deepest), exact: list of
    pattern_index). Each pattern keeps its OWN planner-chosen entry level —
    the batch descent activates it there (see _descend_batch)."""
    cascade, exact = [], []
    for p, pat in enumerate(patterns):
        m = len(pat)
        if m == 0:
            raise ValueError(f"empty pattern at index {p}")
        if (cfg.ngram > 1 and m < cfg.ngram) or m > cfg.tree_span:
            exact.append(p)
            continue
        keys, anchor, aligns = pattern_probe_plan(pat, cfg)
        if keys is None:
            exact.append(p)
            continue
        deepest = deepest_usable_level(cfg, m)
        first_p = _plan_start_level(
            start_level, stats, freq, markov, model, keys, m, pat,
            deepest, selective=selective,
        )
        if first_p > deepest:
            exact.append(p)  # compacted away — index can't prune this one
            continue
        cascade.append((p, _pattern_spec(keys, anchor, aligns), first_p, deepest))
    return cascade, exact


def pattern_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    patterns: list[list[int]],
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
    markov=None,
    model: str | None = None,
    selective: bool = False,
) -> DataFrame:
    """Exact match positions for EVERY pattern in one shared cascade:
    (pattern_id, doc_id, pos) — pattern_id is the pattern's index in
    ``patterns``. Equal row-for-row to a union of per-pattern
    pattern_search calls; the index levels are scanned once for the whole
    batch instead of once per pattern."""
    if cfg.axis != "doc":
        raise NotImplementedError(
            "pattern_search_batch routes on the doc axis; use "
            "global_pattern_search_batch for cfg.axis='global'"
        )
    if not patterns:
        raise ValueError("empty pattern batch")
    spark = corpus.sparkSession
    cascade, exact = _plan_batch(
        patterns, cfg, start_level, stats, freq, markov, model, selective
    )
    parts: list[DataFrame] = []
    for p in exact:
        parts.append(
            brute_force_search(corpus, patterns[p]).select(
                F.lit(p).alias("pattern_id"), "doc_id", "pos"
            )
        )
    if cascade:
        specs = [s for _p, s, _f, _d in cascade]
        firsts = [f for _p, _s, f, _d in cascade]
        deepests = [d for _p, _s, _f, d in cascade]
        finished = _descend_batch(
            index, specs, firsts, deepests, doc_axis=True, spark=spark,
            stats_out=stats_out,
        )
        # verify each pattern at its own span; group patterns sharing a span
        # into ONE corpus join. Small groups dispatch the codegen'd
        # subsequence scan on pattern_id (chained literal branches); large
        # groups verify in ONE Arrow stage instead — a 64-branch when-chain
        # defeats codegen and grows the plan per pattern, while the numpy
        # verifier's plan is O(1) in batch size.
        by_span: dict[int, list[int]] = {}
        for i, (_p, _s, _f, d) in enumerate(cascade):
            by_span.setdefault(cfg.span(d), []).append(i)
        for span, members in by_span.items():
            cand_parts, all_small = [], True
            live = []
            for i in members:
                fdf, n, rows = finished[i]
                if fdf is None:
                    continue
                live.append(i)
                cand, small = _candidates_by_doc(spark, fdf, rows)
                cand_parts.append(cand.select(F.lit(cascade[i][0]).alias("pattern_id"), "doc_id", "wids"))
                all_small = all_small and small
            if not live:
                continue
            cands = cand_parts[0]
            for c in cand_parts[1:]:
                cands = cands.unionByName(c)
            joined = corpus.join(
                F.broadcast(cands) if all_small else cands, on="doc_id", how="inner"
            )
            if len(live) > ARROW_VERIFY_MIN_PATTERNS:
                parts.append(_verify_arrow_doc(joined, patterns, span))
                continue
            pos_expr = None
            for i in live:
                p = cascade[i][0]
                pos = F.filter(
                    subsequence_positions("tokens", patterns[p]),
                    lambda idx: F.array_contains("wids", (idx / span).cast("long")),
                )
                pos_expr = (
                    F.when(F.col("pattern_id") == p, pos)
                    if pos_expr is None
                    else pos_expr.when(F.col("pattern_id") == p, pos)
                )
            parts.append(
                joined.select(
                    "pattern_id", "doc_id", F.explode(pos_expr).alias("pos")
                )
            )
    if not parts:
        return spark.createDataFrame([], BATCH_MATCH_SCHEMA)
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def global_pattern_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    patterns: list[list[int]],
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
    markov=None,
    model: str | None = None,
    selective: bool = False,
    prestitched_tail: int | None = None,
) -> DataFrame:
    """Batched exact GLOBAL pattern search over the one concatenated stream:
    (pattern_id, gpos). One shared cascade; the corpus is stitched ONCE with
    the longest pattern's tail need (a longer stitched suffix only completes
    true stream matches, never invents one). ``prestitched_tail`` declares a
    caller-provided ``stitched`` column as in global_pattern_search."""
    if cfg.axis != "global":
        raise ValueError("global_pattern_search_batch needs cfg.axis='global'")
    if not patterns:
        raise ValueError("empty pattern batch")
    spark = corpus.sparkSession
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    max_m = max(len(p) for p in patterns)
    prestitched = (
        prestitched_tail is not None
        and prestitched_tail >= max_m - 1
        and "stitched" in corpus.columns
    )
    if prestitched:
        stitched = corpus
    elif max_m > 1:
        stitched = _stitched_corpus(corpus, max_m, min_doc_tokens=cfg.min_doc_tokens)
    else:
        stitched = corpus.withColumn("stitched", F.col("tokens"))

    def scan_col(m: int):
        # prestitched corpora may carry a tail far longer than pattern m
        # needs — bound the scan; the per-batch stitch is exactly max_m-1
        # long, where slicing only for patterns shorter than max_m pays off
        if not prestitched and m == max_m:
            return F.col("stitched")
        return F.slice(F.col("stitched"), 1, (F.col("n_tok") + F.lit(m - 1)).cast("int"))

    def exact_scan(p: int) -> DataFrame:
        return stitched.select(
            F.lit(p).alias("pattern_id"),
            F.explode(subsequence_positions(scan_col(len(patterns[p])), patterns[p])).alias("pp"),
            "doc_offset", "n_tok",
        ).filter(F.col("pp") < F.col("n_tok")).select(
            "pattern_id", (F.col("doc_offset") + F.col("pp")).alias("gpos")
        )

    cascade, exact = _plan_batch(
        patterns, cfg, start_level, stats, freq, markov, model, selective
    )
    parts = [exact_scan(p) for p in exact]
    if cascade:
        specs = [s for _p, s, _f, _d in cascade]
        firsts = [f for _p, _s, f, _d in cascade]
        deepests = [d for _p, _s, _f, d in cascade]
        finished = _descend_batch(
            index, specs, firsts, deepests, doc_axis=False, spark=spark,
            stats_out=stats_out,
        )
        by_span: dict[int, list[int]] = {}
        for i, (_p, _s, _f, d) in enumerate(cascade):
            by_span.setdefault(cfg.span(d), []).append(i)
        for span, members in by_span.items():
            surv_parts, all_small = [], True
            live = []
            for i in members:
                fdf, n, rows = finished[i]
                if fdf is None:
                    continue
                live.append(i)
                surv_parts.append(
                    fdf.select(F.lit(cascade[i][0]).alias("pattern_id"), "w_id")
                )
                all_small = all_small and rows is not None
            if not live:
                continue
            surv = surv_parts[0]
            for s in surv_parts[1:]:
                surv = surv.unionByName(s)
            wid_df = F.broadcast(surv) if all_small else surv
            # window join + grouping over (doc_offset, pattern_id, w_id)
            # only; the token arrays join back by doc_offset afterwards
            # (see global_pattern_search — grouping on the array column
            # would shuffle the whole stitched corpus)
            # n_tok = 0 rows would make the sequence DESCEND (phantom w_ids)
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
                .groupBy("doc_offset", "pattern_id")
                .agg(F.collect_set("w_id").alias("wids"))
            )
            cand_docs = stitched.join(
                F.broadcast(hit_docs) if all_small else hit_docs,
                on="doc_offset", how="inner",
            )
            if len(live) > ARROW_VERIFY_MIN_PATTERNS:
                parts.append(_verify_arrow_global(cand_docs, patterns, span))
                continue
            pos_expr = None
            for i in live:
                p = cascade[i][0]
                pos = F.filter(
                    subsequence_positions(scan_col(len(patterns[p])), patterns[p]),
                    lambda idx: (idx < F.col("n_tok"))
                    & F.array_contains(
                        "wids", ((F.col("doc_offset") + idx) / span).cast("long")
                    ),
                )
                pos_expr = (
                    F.when(F.col("pattern_id") == p, pos)
                    if pos_expr is None
                    else pos_expr.when(F.col("pattern_id") == p, pos)
                )
            parts.append(
                cand_docs.select(
                    "pattern_id", "doc_offset", F.explode(pos_expr).alias("pp")
                ).select("pattern_id", (F.col("doc_offset") + F.col("pp")).alias("gpos"))
            )
    if not parts:
        return spark.createDataFrame([], BATCH_GLOBAL_SCHEMA)
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def pattern_boolean_docs(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    must: list[list[int]],
    must_not: list[list[int]] = (),
    **search_kw,
) -> DataFrame:
    """BOOLEAN document retrieval: doc_ids containing EVERY ``must`` pattern
    and NONE of the ``must_not`` patterns — the classic AND/NOT search-engine
    query, one shared cascade for the whole pattern set
    (pattern_search_batch). ``must`` must be non-empty (a pure-NOT query
    would enumerate the corpus complement — unbounded by construction).
    ONE shuffle: collect_set(pattern_id) per doc with map-side partial
    aggregation (each map partition ships at most |patterns| ids per doc,
    never positions), then an array counting predicate — all JVM-side.
    ``search_kw`` forwards to pattern_search_batch (planner inputs).
    Returns (doc_id)."""
    must = [list(p) for p in must]
    if not must:
        raise ValueError("pattern_boolean_docs: 'must' may not be empty "
                         "(a pure-NOT query is unbounded)")
    return pattern_boolean_docs_cnf(
        corpus, index, cfg, [[p] for p in must], must_not, **search_kw
    )


def pattern_boolean_docs_cnf(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    clauses: list[list[list[int]]],
    must_not: list[list[int]] = (),
    **search_kw,
) -> DataFrame:
    """CNF BOOLEAN retrieval: doc_ids satisfying EVERY clause (a clause is
    an OR over its patterns — the doc must contain at least one) and NONE of
    the ``must_not`` patterns. `(data OR info) AND (merge OR join) AND NOT
    phrase` style queries; pattern_boolean_docs is the all-singleton-clause
    special case and delegates here. The reference's report()
    (PMIndex/HBI.java:205) answers one pattern; clause composition is the
    search-engine layer the reference leaves to callers.

    Same one-shuffle shape as AND/NOT: ONE shared cascade for every pattern
    in the whole CNF (pattern_search_batch), collect_set(pattern_id) per doc
    with map-side partials, then a pure-JVM predicate — matched positive
    pattern_ids map to clause ids through a literal array and the doc
    qualifies iff the distinct clause count equals |clauses| and no negated
    id matched. ``clauses`` must be non-empty with non-empty clauses (an
    empty clause is unsatisfiable, a pure-NOT query is unbounded).
    Returns (doc_id)."""
    clauses = [[list(p) for p in cl] for cl in clauses]
    must_not = [list(p) for p in must_not]
    if not clauses:
        raise ValueError("pattern_boolean_docs_cnf: 'clauses' may not be "
                         "empty (a pure-NOT query is unbounded)")
    if any(not cl for cl in clauses):
        raise ValueError("pattern_boolean_docs_cnf: empty clause "
                         "(unsatisfiable by construction)")
    flat = [p for cl in clauses for p in cl]
    n_pos = len(flat)
    clause_of = [ci for ci, cl in enumerate(clauses) for _ in cl]
    hits = pattern_search_batch(corpus, index, cfg, flat + must_not, **search_kw)
    agg = hits.groupBy("doc_id").agg(F.collect_set("pattern_id").alias("_pids"))
    cmap = F.array(*[F.lit(c) for c in clause_of])
    pos_ids = F.filter("_pids", lambda p: p < F.lit(n_pos))
    n_clauses_hit = F.size(F.array_distinct(
        F.transform(pos_ids, lambda p: F.element_at(cmap, p + F.lit(1)))
    ))
    has_neg = F.size(F.filter("_pids", lambda p: p >= F.lit(n_pos))) > 0
    return (
        agg.filter((n_clauses_hit == len(clauses)) & ~has_neg)
        .select("doc_id")
    )


def pattern_bm25_topk(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    terms: list[list[int]],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    **search_kw,
) -> DataFrame:
    """RANKED RETRIEVAL with BM25 scoring: the top-k documents for a
    multi-term query, every term's EXACT occurrence counts coming out of ONE
    shared cascade (pattern_search_batch). Returns (doc_id, score,
    n_terms_hit), score DESC with doc_id ASC tie-break. Only docs containing
    at least one term are candidates (standard disjunctive retrieval).

    Scoring uses the LOG-FREE rational BM25 variant so the score is a pure
    composition of IEEE-754 +,-,*,/ (each correctly rounded, hence
    bit-reproducible across engines — the DuckDB oracle twin evaluates the
    identical expression tree and matches bit-for-bit):

        idf_t   = (N - df_t + 0.5) / (df_t + 0.5)        # raw Robertson-
                                                          # Sparck Jones odds,
                                                          # monotone in the
                                                          # usual log(idf)
        tfp_t,d = tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl))
        score   = sum_t idf_t * tfp_t,d                  # fixed term order

    The per-doc term sum is pivoted into per-term columns (max of the single
    (doc,term) row, order-free) and added LEFT-TO-RIGHT — never a float
    sum() aggregate, whose accumulation order Spark does not define.

    Distribution shape: tf is a map-side-partial count per (doc_id, term);
    df/N/avgdl are O(|terms|)+2 scalars broadcast back in; the only
    data-sized shuffles are the tf groupBy and the doc-length join (both on
    doc_id, values never positions); top-k compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    terms = [list(t) for t in terms]
    if not terms:
        raise ValueError("pattern_bm25_topk: empty term list")
    if k <= 0:
        raise ValueError("pattern_bm25_topk: k must be >= 1")
    n_terms = len(terms)
    k1 = float(k1)
    b = float(b)
    hits = pattern_search_batch(corpus, index, cfg, terms, **search_kw)
    tf = hits.groupBy("doc_id", "pattern_id").agg(
        F.count("*").cast("double").alias("tf")
    )
    dfreq = tf.groupBy("pattern_id").agg(
        F.count("*").cast("double").alias("df")
    )
    gstats = corpus.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum(F.size("tokens")).cast("double")
         / F.count("*").cast("double")).alias("avgdl"),
    )
    dl = corpus.select("doc_id", F.size("tokens").cast("double").alias("dl"))
    joined = (
        tf.join(F.broadcast(dfreq), "pattern_id")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(gstats))
    )
    # expression trees mirror the oracle SQL EXACTLY (same parenthesization,
    # all-double operands) — see _bm25_oracle in __spark_entry__.py
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tfp = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl")))
    )
    scored = joined.select("doc_id", "pattern_id", (idf * tfp).alias("s"))
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("pattern_id") == t, F.col("s"))), F.lit(0.0)
        ).alias(f"_s{t}")
        for t in range(n_terms)
    ]
    agg = scored.groupBy("doc_id").agg(*per_term,
                                       F.count("*").alias("n_terms_hit"))
    total = F.col("_s0")
    for t in range(1, n_terms):
        total = total + F.col(f"_s{t}")
    return (
        agg.select("doc_id", total.alias("score"), "n_terms_hit")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )
