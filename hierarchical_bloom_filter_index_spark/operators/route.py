"""Hierarchical query routing: the rebuild of report() / BlockSearch DFS /
IntervalScanner (PMIndex/HBI.java:415-605, search/BlockSearch.java:15-76,
search/IntervalScanner.java:28-88) as a level-by-level pruned join cascade.

Set-oriented reformulation of the reference's sequential-consumption DFS:

* A match starting at position p inside window w (span s >= |pattern|) lies
  entirely within w ∪ (w+1). Therefore window w is a **sound candidate** iff
  (a) its filter might contain the pattern's first key (anchor), and
  (b) every distinct pattern key might be in filter(w) ∪ filter(w+1).
  This replaces BlockSearch's prefix-consumption across interval boundaries
  (search/BlockSearch.java:95-128) with a neighbor-union probe — same
  guarantee (no true match is pruned), fully vectorizable.
* Descent: the ancestor of a true match's start window satisfies (a)+(b) at
  every level, so children-of-survivors is a sound frontier
  (tree/TreeLayout.java children arithmetic: w -> 2w, 2w+1).
* Verification is EXACT and runs JVM-side: SQL higher-order functions slice
  the original token arrays over surviving windows only
  (search/VerifierLinearLeafProbe.java:16-150 analog) — sketches affect
  cost, never answers, exactly like the reference.

Each level's probe is one Arrow-batched pandas stage over (candidate ∩ level)
sketch rows; pattern bit positions are computed once per level and gathered
across all windows at once (operators/probe.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..config import HbiConfig
from ..functions import subsequence_positions
from ..sketches.hashing import pack_ngrams_u64
from .probe import probe_blobs

MATCH_SCHEMA = "doc_id string, pos int"

# Cap on driver-side materialization of surviving candidates (bytes, not
# rows: 2M Row objects of long doc_ids is GB-scale on a small driver heap).
# Above the cap the cascade keeps the DataFrame path — no driver OOM ever.
# Env-overridable (HBI_DRIVER_MATERIALIZE_BYTES) for cap tuning.
import os as _os

DRIVER_MATERIALIZE_BYTES = int(
    _os.environ.get("HBI_DRIVER_MATERIALIZE_BYTES", 64 << 20)
)


def pattern_keys(pattern: list[int], cfg: HbiConfig) -> tuple[np.ndarray, int]:
    """(distinct probe keys, anchor key) for a token pattern
    (search/Pattern.java:22-97 analog: n-gram expansion + distinct set as in
    BlockSearchCharSet)."""
    arr = np.asarray(pattern, dtype=np.int64)
    if cfg.ngram == 1:
        keys = arr.astype(np.uint64)
    else:
        keys = pack_ngrams_u64(arr, cfg.ngram, cfg.ngram_base_bits)
        if len(keys) == 0:
            raise ValueError("pattern shorter than the index n-gram — index unusable")
    anchor = int(keys[0])
    return np.unique(keys), anchor


def pattern_probe_plan(pattern: list[int], cfg: HbiConfig):
    """(key_union, anchor_key|None, alignment key sets) for probing.

    stride == 1: one alignment = the full distinct key set, anchored on the
    first key (in-window condition is exact for the match's start window).

    stride > 1 (strided index, PMIndex/HBI.java:45,421 + the strided probe of
    search/BlockSearch.java:142-155): only n-grams starting at positions
    = 0 mod stride are indexed. A match at offset p contributes exactly the
    pattern n-grams of ONE alignment class o = (-p) mod stride, so a window
    is a sound candidate iff SOME alignment's full key set is present in the
    window∪neighbor union. The anchor condition is dropped (the first
    indexed gram may start in the neighbor window).
    """
    grams, anchor = pattern_keys(pattern, cfg)
    if cfg.stride == 1:
        return grams, anchor, [np.unique(grams)]
    arr = np.asarray(pattern, dtype=np.int64)
    seq = pack_ngrams_u64(arr, cfg.ngram, cfg.ngram_base_bits)
    aligns = []
    for o in range(cfg.stride):
        ks = seq[o :: cfg.stride]
        if len(ks) == 0:
            return None, None, None  # some alignment has no indexed gram: no pruning possible
        aligns.append(np.unique(ks))
    union = np.unique(np.concatenate(aligns))
    return union, None, aligns


def deepest_usable_level(cfg: HbiConfig, m: int) -> int:
    """Never descend below span < pattern length (the descent guard,
    search/BlockSearch.java:50-64, estimators/LevelCostMinimizer.java:32)."""
    L = cfg.deepest
    while L > 0 and cfg.span(L) < m:
        L -= 1
    return L


def _pattern_spec(
    keys: np.ndarray, anchor: int | None, align_keys: list[np.ndarray] | None
) -> tuple[np.ndarray, int, list[int]]:
    """Normalize one pattern's probe inputs into (sorted capped key list,
    anchor index or -1, per-alignment bitmasks over that key list). Patterns
    with more than 62 distinct keys prune on the first 62 (a subset of
    constraints — still a sound superset of candidates; verification stays
    exact); the mask must fit a positive int64 literal."""
    key_list = keys.astype(np.uint64)
    if len(key_list) > 62:
        if anchor is not None:
            a = np.uint64(anchor)
            rest = key_list[key_list != a][:61]
            key_list = np.concatenate([[a], rest]).astype(np.uint64)
        else:
            key_list = key_list[:62]
        key_list.sort()
    retained = set(key_list.tolist())
    if align_keys is None:
        align_keys = [key_list]
    align_masks = []
    for ks in align_keys:
        mask = 0
        for kv in ks.astype(np.uint64):
            if int(kv) in retained:  # dropped keys weaken (never break) pruning
                mask |= 1 << int(np.searchsorted(key_list, kv))
        align_masks.append(mask)
    anchor_idx = int(np.searchsorted(key_list, np.uint64(anchor))) if anchor is not None else -1
    return key_list, anchor_idx, align_masks


def _probe_level(
    level_rows: DataFrame,
    keys: np.ndarray,
    anchor: int | None,
    doc_axis: bool,
    align_keys: list[np.ndarray] | None = None,
    probe_counter=None,
) -> DataFrame:
    """Filter sketch rows at one level to surviving windows.

    One vectorized Arrow stage probes every window for every pattern key and
    emits a TINY (doc_id?, w_id, anchor_ok, key bitmask) row per window; the
    neighbor-union condition (all keys in filter(w) ∪ filter(w+1)) is then a
    JVM-side ``lead()`` over the masks — no blob self-join, the serialized
    filters are read exactly once per level. Patterns with more than 62
    distinct keys prune on the first 62 (a subset of constraints — still a
    sound superset of candidates; verification stays exact).

    ``align_keys``: alignment classes for the strided index — a window
    survives when ANY class's full key set is in the union (OR of ANDs).
    """
    key_list, anchor_idx, align_masks = _pattern_spec(keys, anchor, align_keys)
    id_cols = ["doc_id", "w_id"] if doc_axis else ["w_id"]
    mask_schema = ("doc_id string, " if doc_axis else "") + "w_id long, anchor_ok boolean, mask long"

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if probe_counter is not None:
                probe_counter.add(len(pdf))  # Bloom-probe counter (HbiStats analog)
            hits = probe_blobs(pdf["bloom"].tolist(), key_list)  # (n, n_keys)
            mask = (hits.astype(np.uint64) << np.arange(len(key_list), dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out = pdf[id_cols].copy()
            out["anchor_ok"] = hits[:, anchor_idx] if anchor_idx >= 0 else True
            out["mask"] = mask.astype(np.int64)
            yield out

    masks = level_rows.mapInPandas(probe, schema=mask_schema)
    if doc_axis:
        # neighbor mask via lead(): shuffle keyed by doc_id — scalable (one
        # doc's windows are few)
        w = Window.partitionBy("doc_id").orderBy("w_id")
        nxt = F.when(F.lead("w_id").over(w) == F.col("w_id") + 1, F.lead("mask").over(w)).otherwise(F.lit(0))
        combined = masks.withColumn("umask", F.col("mask").bitwiseOR(nxt))
    else:
        # global axis: a single-partition window over ALL windows would not
        # scale — combine neighbors with a hash self-join on w_id+1 instead
        nbr = masks.select((F.col("w_id") - 1).alias("w_id"), F.col("mask").alias("nmask"))
        combined = (
            masks.join(nbr, on="w_id", how="left")
            .withColumn("umask", F.col("mask").bitwiseOR(F.coalesce(F.col("nmask"), F.lit(0))))
        )
    align_cond = None
    for am in align_masks:
        c = F.col("umask").bitwiseAND(F.lit(am)) == F.lit(am)
        align_cond = c if align_cond is None else (align_cond | c)
    return combined.filter(F.col("anchor_ok") & align_cond).select(*id_cols)


def _level_rows(index: DataFrame, level: int, doc_axis: bool) -> DataFrame:
    cols = (["doc_id"] if doc_axis else []) + ["w_id", "bloom"]
    return index.filter(F.col("level") == level).select(*cols)


def _plan_start_level(
    start_level,
    stats,
    freq,
    markov,
    model,
    keys: np.ndarray,
    m: int,
    pattern: list[int],
    deepest: int,
    stats_out: dict | None = None,
    selective: bool = False,
) -> int:
    """Resolve the cascade's seed level — shared by the doc-axis and global
    searches (the reference plans over its ONE stream index, so the planner
    must serve both axes). "auto" runs the cost model (iid / ie / markov /
    multilevel, LevelCostMinimizer.java:15-55); an int pins; None seeds at
    the root (CostFunctionDefaultRoot). Always clamped to the levels present
    in ``stats`` (a compacted index has no coarse sketch rows — seeding
    there would probe an empty frontier and wrongly return no matches)."""
    if start_level == "auto" and stats is not None and (freq is not None or markov is not None):
        from ..plans.cost import choose_start_level, choose_start_level_multilevel

        probs = (
            freq.estimate(keys.astype(np.int64)) / max(1, freq.total)
            if freq is not None
            else np.zeros(len(keys))
        )
        mdl = model or ("markov" if markov is not None else "iid")
        if mdl == "multilevel":
            # per-key levels (search/MultiLevelPruning.java:23-32): seed at
            # the min; the per-key assignment is surfaced in stats_out
            chosen, per_key = choose_start_level_multilevel(stats, probs, m)
            if stats_out is not None:
                stats_out["per_key_levels"] = {
                    int(k): int(lv) for k, lv in zip(keys.tolist(), per_key.tolist())
                }
        else:
            chosen = choose_start_level(stats, probs, m, model=mdl, markov=markov,
                                        pattern=pattern, selective=selective)
        first = max(0, min(chosen, deepest))
    elif isinstance(start_level, int):
        first = max(0, min(start_level, deepest))
    else:
        first = 0
    if stats is not None and len(stats):
        first = max(first, int(stats["level"].min()))
    return first


def _cut_frontier(survivors: DataFrame, schema: str, probe_counter=None):
    """Materialize one level's survivor frontier and CUT ITS LINEAGE.

    The neighbor-union combine references each level's masks twice (the
    global axis self-joins on w_id+1), so chaining levels through raw
    logical plans DOUBLES the plan per level — a 9-level cascade reached a
    124 MB plan string and Catalyst re-analyzed it at every level. Physical
    work was fine (each level is persisted); the driver-side plan analysis
    was the scale bug. Frontiers shrink monotonically under Bloom pruning,
    so: collect small frontiers (byte-capped) into a fresh createDataFrame
    (plan = one leaf, broadcastable); above the cap, localCheckpoint — the
    plan becomes a scan of materialized blocks. Either way the next level's
    plan is O(1), keeping whole-cascade analysis linear in levels.

    Returns (frontier_df, n_rows, collected_rows_or_None). localCheckpoint
    trades recompute-on-executor-loss for bounded plans — the standard
    iterative-algorithm trade (GraphX/ALS do the same).

    One job resolves the common case: collect up to cap+1 rows — if the
    frontier fits, that IS the materialization (count = len), only an
    over-cap frontier pays the checkpoint + count pass.
    """
    spark = survivors.sparkSession
    # size the cap from what a collected row actually COSTS on the driver —
    # a PySpark Row is a few hundred bytes of Python object (+ interned
    # strings on the doc axis), not its 16-40 logical payload bytes; the old
    # payload-based estimate let the 64 MB default admit ~1.6M Rows (GB-scale
    # driver heap pressure)
    per_row = 400 if "doc_id" in survivors.columns else 300
    cap = DRIVER_MATERIALIZE_BYTES // per_row
    rows = [tuple(r) for r in survivors.limit(cap + 1).collect()]
    if len(rows) <= cap:
        if not rows:
            return spark.createDataFrame([], schema), 0, []
        return spark.createDataFrame(rows, schema), len(rows), rows
    # over-cap: the limit-collect above partially ran the probe; reset the
    # windows_probed accumulator so the checkpoint's full re-run (the one
    # whose output is kept) is counted exactly once
    if probe_counter is not None:
        probe_counter.value = 0
    out = survivors.localCheckpoint(eager=True)
    return out, out.count(), None


def frequency_summary(corpus: DataFrame, cfg: HbiConfig):
    """Global CMS over the index's KEY domain — raw tokens for ngram=1,
    packed n-gram keys otherwise — the reference's frequency estimator role
    (estimators/CSEstimator.java), feeding the cost model's key
    probabilities. Built once per corpus, ~100 KB, broadcastable."""
    from ..sketches.cms import CountMinSketch
    from .aggregates import collect_sketch, sketch_aggregate

    # eps=1e-3 keeps the summary ~100 KB; the cost model only needs coarse
    # occurrence probabilities, not tight counts
    factory = lambda: CountMinSketch.from_eps_delta(1e-3, 0.01, seed=cfg.seed + 99)  # noqa: E731
    keyed = corpus
    key_col = "tokens"
    if cfg.ngram != 1:
        ngram, bits = cfg.ngram, cfg.ngram_base_bits

        def pack(batches):
            for pdf in batches:
                out = []
                for toks in pdf["tokens"]:
                    arr = np.asarray(toks, dtype=np.int64)
                    # stride NOT applied: the model prices key occurrence
                    # probability; alignment is the probe's concern
                    out.append(pack_ngrams_u64(arr, ngram, bits).astype(np.int64))
                yield pd.DataFrame({"grams": out})

        keyed = corpus.select("tokens").mapInPandas(pack, schema="grams array<long>")
        key_col = "grams"
    return collect_sketch(
        sketch_aggregate(keyed, key_col, factory, values_are_arrays=True)
    )


def _descend(
    index: DataFrame,
    keys: np.ndarray,
    anchor: int | None,
    aligns,
    first: int,
    last: int,
    doc_axis: bool,
    spark,
    stats_out: dict | None = None,
):
    """Children-of-survivors descent from level ``first`` to ``last`` —
    the shared cascade core of pattern_search / global_pattern_search /
    window_membership. Each level: one vectorized probe over (frontier ∩
    level) sketch rows, then a lineage-cut materialization (_cut_frontier).
    Returns (survivors_df, n_survivors, collected_rows_or_None); n == 0
    means the frontier died (no matches anywhere)."""
    id_cols = ["doc_id", "w_id"] if doc_axis else ["w_id"]
    schema = ("doc_id string, " if doc_axis else "") + "w_id long"
    survivors: DataFrame | None = None
    final_rows = None
    n_surv = 0
    probe_counter = spark.sparkContext.accumulator(0) if stats_out is not None else None
    if stats_out is not None:
        stats_out.update({"start_level": first, "deepest": last,
                          "windows_probed": {}, "survivors": {}})
    for L in range(first, last + 1):
        rows = _level_rows(index, L, doc_axis=doc_axis)
        if survivors is not None:
            # probe set = children {2w, 2w+1} PLUS 2w+2: the right neighbor
            # of the last child, whose mask the union test of 2w+1 needs
            # even when window w+1 itself was pruned (straddling soundness)
            kids = F.explode(
                F.array(F.col("w_id") * 2, F.col("w_id") * 2 + 1, F.col("w_id") * 2 + 2)
            ).alias("w_id")
            children = (
                survivors.select("doc_id", kids) if doc_axis else survivors.select(kids)
            ).distinct()
            if final_rows is not None:  # collected → small → broadcast
                children = F.broadcast(children)
            rows = rows.join(children, on=id_cols, how="left_semi")
        if probe_counter is not None:
            probe_counter.value = 0
        survivors, n_surv, final_rows = _cut_frontier(
            _probe_level(rows, keys, anchor, doc_axis=doc_axis, align_keys=aligns,
                         probe_counter=probe_counter),
            schema,
            probe_counter=probe_counter,
        )
        if stats_out is not None:
            stats_out["windows_probed"][L] = probe_counter.value
            stats_out["survivors"][L] = n_surv
        if n_surv == 0:
            return None, 0, []
    return survivors, n_surv, final_rows


def global_window_membership(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    token: int,
    level: int | None = None,
) -> DataFrame:
    """'Does token X appear in GLOBAL window W?' — exact w_id rows over the
    one concatenated stream, the exists() slice on the reference's actual
    one-stream index (PMIndex/HBI.java report/exists). Bloom candidates
    prune which docs get scanned; the answer comes from exact verification
    (docs whose position range touches no surviving window are skipped
    entirely)."""
    if cfg.axis != "global":
        raise ValueError("global_window_membership needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError("global_window_membership requires a token-keyed index (ngram=1)")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    # n_tok = 0 docs hold no tokens but would BREAK the window math below:
    # sequence(off/span, (off + n_tok - 1)/span) DESCENDS (phantom w_ids) and
    # sequence(0, n_tok - 1) feeds i = -1 into element_at(tokens, 0), which
    # raises at runtime ("SQL array indices start at 1")
    corpus = corpus.filter(F.col("n_tok") > 0)
    L = cfg.deepest if level is None else level
    span = cfg.span(L)
    key = np.asarray([int(token)], dtype=np.uint64)
    rows = _level_rows(index, L, doc_axis=False)

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ok = probe_blobs(pdf["bloom"].tolist(), key)[:, 0]
            yield pdf.loc[ok, ["w_id"]]

    cand = rows.mapInPandas(probe, schema="w_id long")
    # candidate docs via (doc_offset, w_id) pairs only — token arrays join
    # back by doc_offset (same shuffle discipline as global_pattern_search)
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
        .groupBy("doc_offset")
        .agg(F.collect_set("w_id").alias("wids"))
    )
    occ = F.array_distinct(
        F.transform(
            F.filter(
                F.sequence(F.lit(0).cast("long"), (F.col("n_tok") - 1).cast("long")),
                lambda i: F.element_at("tokens", (i + 1).cast("int")) == F.lit(int(token)),
            ),
            lambda i: ((F.col("doc_offset") + i) / span).cast("long"),
        )
    )
    return (
        corpus.join(hit_docs, on="doc_offset", how="inner")
        .select(F.explode(F.array_intersect(occ, F.col("wids"))).alias("w_id"))
        .distinct()
    )


def _candidates_by_doc(spark, survivors, final_rows, stats_out: dict | None = None):
    """Group the final frontier's (doc_id, w_id) rows per doc — driver-side
    when the frontier was collected (no extra job, result broadcastable),
    else a shuffle over the checkpointed blocks, never an unbounded collect.
    Returns (cand_df, is_small): broadcast the join side iff is_small."""
    if final_rows is not None:
        by_doc: dict[str, list[int]] = {}
        for doc_id, w_id in final_rows:
            by_doc.setdefault(doc_id, []).append(w_id)
        if stats_out is not None:
            stats_out["candidate_docs"] = len(by_doc)
        cand = spark.createDataFrame(list(by_doc.items()), "doc_id string, wids array<long>")
        return cand, True
    return survivors.groupBy("doc_id").agg(F.collect_set("w_id").alias("wids")), False


def pattern_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
    markov=None,
    model: str | None = None,
    selective: bool = False,
) -> DataFrame:
    """Exact match positions of ``pattern``: (doc_id, pos), 0-based.

    Pass a dict as ``stats_out`` to receive query statistics (the HbiStats
    role, PMIndex/HbiStats.java:57-159): chosen start level, windows probed
    and survivors per level, candidate docs verified.

    The full report() lifecycle: route through the Bloom hierarchy from
    ``start_level``, then verify surviving windows exactly. Returns positions
    identical to a brute-force scan — Bloom false positives only cost
    verification work.

    start_level: int to pin; "auto" to let the cost model choose from a
    frequency summary (``freq``: CountMinSketch from frequency_summary) and
    per-level index stats (``stats``: from operators.build.index_stats) —
    the minCostLp path (estimators/LevelCostMinimizer.java:15-55); None
    seeds at the root (CostFunctionDefaultRoot behavior).

    Pass ``markov`` (a plans.markov.MarkovModel fitted on the corpus) to
    price survivors with the bigram chain instead of the iid model
    (CostFunctionMarkov, estimators/CostFunctionMarkov.java:29-93) —
    auto-selected whenever the snapshot is supplied; much tighter on
    autocorrelated corpora. Sketches never affect answers, only cost, so
    every model choice returns identical matches.
    """
    if cfg.axis != "doc":
        raise NotImplementedError(
            "pattern_search routes on the doc axis; use global_pattern_search "
            "for cfg.axis='global' (one concatenated stream, returns gpos)"
        )
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if cfg.ngram > 1 and m < cfg.ngram:
        # no pattern n-gram exists — the index cannot prune; exact scan
        return brute_force_search(corpus, pattern)
    if m > cfg.tree_span:
        # a match can span >2 windows even at the coarsest level, so the
        # neighbor-union probe is no longer a sound candidate test
        # (pattern-length guard, search/BlockSearch.java:50-64) — exact scan
        return brute_force_search(corpus, pattern)
    keys, anchor, aligns = pattern_probe_plan(pattern, cfg)
    if keys is None:
        # strided index and the pattern is too short to guarantee an indexed
        # n-gram under every alignment — the index cannot prune
        return brute_force_search(corpus, pattern)
    deepest = deepest_usable_level(cfg, m)
    first = _plan_start_level(
        start_level, stats, freq, markov, model, keys, m, pattern, deepest,
        stats_out=stats_out, selective=selective,
    )
    if first > deepest:
        # compacted index whose shallowest surviving span is < m: no present
        # level can prune this pattern — exact scan (mirrors the
        # m > tree_span guard; seeding past `deepest` would probe an empty
        # frontier and wrongly return no matches)
        return brute_force_search(corpus, pattern)

    # --- descent: children-of-survivors, one vectorized probe per level ----
    # (shared cascade core — see _descend; per-level lineage cut keeps
    # Catalyst's plan analysis O(1) per level instead of exponential)
    spark = corpus.sparkSession
    survivors, n_surv, final_rows = _descend(
        index, keys, anchor, aligns, first, deepest, doc_axis=True, spark=spark,
        stats_out=stats_out,
    )
    if n_surv == 0:
        return spark.createDataFrame([], MATCH_SCHEMA)

    # Final candidate set: the last frontier is already materialized and
    # lineage-cut; group it per doc (_candidates_by_doc).
    cand, cand_small = _candidates_by_doc(spark, survivors, final_rows, stats_out)

    # --- exact verification (JVM-side, codegen) -----------------------------
    span = cfg.span(deepest)
    verified = (
        corpus.join(F.broadcast(cand) if cand_small else cand, on="doc_id", how="inner")
        .select(
            "doc_id",
            F.filter(
                subsequence_positions("tokens", pattern),
                lambda i: F.array_contains("wids", (i / span).cast("long")),
            ).alias("positions"),
        )
        .select("doc_id", F.explode("positions").alias("pos"))
    )
    return verified


def brute_force_search(corpus: DataFrame, pattern: list[int]) -> DataFrame:
    """The exact oracle (role of PMIndex/RegexIndex.java): scan every doc."""
    return corpus.select(
        "doc_id", F.explode(subsequence_positions("tokens", pattern)).alias("pos")
    )


def _stitched_corpus(
    corpus: DataFrame, m: int, min_doc_tokens: int | None = None
) -> DataFrame:
    """Each doc + the next (m-1) tokens of the FOLLOWING stream — accumulated
    across multiple successor docs when an intervening doc is shorter than
    m-1 (a match may run through a whole short doc into the one after it) —
    the verification substrate for cross-document matches on the global
    stream axis. Requires doc_offset. Delegates to corpus.stitch_stream_tail
    (equi-joins on offsets, no window function, scales)."""
    from ..corpus import stitch_stream_tail

    return stitch_stream_tail(corpus, m - 1, out_col="stitched",
                              min_doc_tokens=min_doc_tokens)


def global_pattern_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    markov=None,
    model: str | None = None,
    selective: bool = False,
    stats_out: dict | None = None,
    prestitched_tail: int | None = None,
) -> DataFrame:
    """Exact GLOBAL match positions of ``pattern`` over the one concatenated
    token stream (docs in doc_id order) — the reference's actual semantics
    (one stream, matches may cross document boundaries). Returns (gpos long).

    ``prestitched_tail``: declare that ``corpus`` already carries a
    ``stitched`` column holding each doc's tokens plus AT LEAST this many
    following stream tokens (e.g. a cached ``stitch_stream_tail`` result
    shared across queries). A longer-than-needed tail is sound — tail
    tokens are the true stream continuation, so extra suffix only completes
    real matches — and skips the per-query stitch join when
    ``prestitched_tail >= len(pattern) - 1``.

    ``stats_out``: dict to receive query statistics (HbiStats parity with
    pattern_search): chosen start level, windows probed and survivors per
    level.

    Requires a global-axis index (cfg.axis == 'global'); the corpus gains
    doc_offset if missing. Routing is the same neighbor-union cascade, with
    the neighbor combine as a w_id hash join (no single-partition window);
    verification stitches each doc with the next doc's (m-1)-token prefix.

    start_level follows pattern_search: "auto" + ``freq``/``stats`` (and
    optionally ``markov``/``model``) runs the cost model over the global
    index's per-level stats — the reference plans over exactly this one
    stream (minCostLp, estimators/LevelCostMinimizer.java:15-55); an int
    pins; None seeds at the root.
    """
    if cfg.axis != "global":
        raise ValueError("global_pattern_search needs cfg.axis='global'")
    # n-gram keys are safe here: the global build stitches each doc with the
    # next doc's (n-1)-token prefix, so boundary-crossing n-grams ARE indexed
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    prestitched = (
        prestitched_tail is not None
        and prestitched_tail >= m - 1
        and "stitched" in corpus.columns
    )
    if prestitched:
        stitched = corpus
    elif m > 1:
        stitched = _stitched_corpus(corpus, m, min_doc_tokens=cfg.min_doc_tokens)
    else:
        stitched = corpus.withColumn("stitched", F.col("tokens"))

    # with a caller-prestitched corpus the shared tail can be much longer
    # than this pattern needs — bound every scan to doc + (m-1) continuation
    # tokens; with the per-query stitch the array is already exactly that
    # long and the slice would only pay a copy
    scan_col = (
        F.slice(F.col("stitched"), 1, (F.col("n_tok") + F.lit(m - 1)).cast("int"))
        if prestitched
        else F.col("stitched")
    )

    def exact_scan() -> DataFrame:
        return stitched.select(
            F.explode(subsequence_positions(scan_col, pattern)).alias("p"),
            "doc_offset", "n_tok",
        ).filter(F.col("p") < F.col("n_tok")).select((F.col("doc_offset") + F.col("p")).alias("gpos"))

    if (cfg.ngram > 1 and m < cfg.ngram) or m > cfg.tree_span:
        return exact_scan()
    keys, anchor, aligns = pattern_probe_plan(pattern, cfg)
    if keys is None:
        return exact_scan()
    deepest = deepest_usable_level(cfg, m)
    first = _plan_start_level(
        start_level, stats, freq, markov, model, keys, m, pattern, deepest,
        stats_out=stats_out, selective=selective,
    )
    if first > deepest:
        # compacted index: every surviving level's span is < m — the index
        # cannot prune this pattern (see pattern_search's matching guard)
        return exact_scan()
    spark = corpus.sparkSession
    # shared cascade core (_descend): per-level lineage cut — the global
    # neighbor combine self-joins each level's masks, so raw plan chaining
    # would DOUBLE the logical plan per level (observed 124 MB plan strings)
    survivors, n_surv, final_rows = _descend(
        index, keys, anchor, aligns, first, deepest, doc_axis=False, spark=spark,
        stats_out=stats_out,
    )
    if n_surv == 0:
        return spark.createDataFrame([], "gpos long")

    return _global_verify(
        stitched, scan_col, survivors, final_rows, cfg.span(deepest),
        lambda c: subsequence_positions(c, pattern),
    )


def _global_verify(stitched, scan_col, survivors, final_rows, span, positions_fn):
    """Shared tail of the global-axis searches: candidate docs from the
    surviving windows, then exact verification of each start position.

    candidate docs: any doc whose start-position range intersects a
    surviving window — explode the doc's own window range (few per doc).
    The window join + grouping runs over (doc_offset, w_id) PAIRS ONLY;
    the token arrays never enter that shuffle (grouping on a large array
    column would move the whole stitched corpus) — the surviving docs'
    arrays are joined back by doc_offset afterwards. ``positions_fn(col)``
    yields the candidate start positions of the (possibly gapped) pattern."""
    wid_df = F.broadcast(survivors) if final_rows is not None else survivors
    doc_windows = stitched.select(
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
        .groupBy("doc_offset")
        .agg(F.collect_set("w_id").alias("wids"))
    )
    cand_docs = stitched.join(
        F.broadcast(hit_docs) if final_rows is not None else hit_docs,
        on="doc_offset", how="inner",
    )
    # verify: start position i (0-based, within THIS doc), match may run into
    # the stitched prefix; keep only starts whose global window survived
    return (
        cand_docs.select(
            "doc_offset",
            F.explode(
                F.filter(
                    positions_fn(scan_col),
                    lambda i: (i < F.col("n_tok"))
                    & F.array_contains("wids", ((F.col("doc_offset") + i) / span).cast("long")),
                )
            ).alias("p"),
        )
        .select((F.col("doc_offset") + F.col("p")).alias("gpos"))
    )


def window_membership(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    token: int,
    level: int | None = None,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
) -> DataFrame:
    """'Does token X appear in window W?' — exact (doc_id, w_id) pairs after
    Bloom routing + verification. The minimum end-to-end slice (SURVEY §7.2).

    ``start_level=None`` (default) flat-probes only level ``L`` — right for
    frequent tokens, where coarse levels reject nothing and a cascade would
    probe MORE blobs than the single-level scan. ``start_level`` int/"auto"
    routes through the hierarchy from that seed (the cascade wins for rare
    tokens: coarse levels kill most of the tree before the leaf scan);
    "auto" prices the choice with the cost model (freq + stats), exactly
    the planner trade the reference makes per query.
    """
    if cfg.ngram != 1:
        raise ValueError("window_membership requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else level
    span = cfg.span(L)
    key = np.asarray([token], dtype=np.uint64)

    if stats is not None and len(stats) and L not in set(stats["level"]):
        # compacted index: level L's sketch rows were dropped, so Bloom
        # cannot prune — answer exactly from the corpus (probing an absent
        # level would wrongly return no windows)
        occ = F.array_distinct(
            F.transform(
                F.filter(
                    F.sequence(F.lit(0).cast("long"), (F.col("n_tok") - 1).cast("long")),
                    lambda i: F.element_at("tokens", (i + 1).cast("int")) == F.lit(int(token)),
                ),
                lambda i: (i / span).cast("long"),
            )
        )
        return corpus.select("doc_id", F.explode(occ).alias("w_id"))

    if start_level is not None:
        first = _plan_start_level(start_level, stats, freq, None, None, key, 1,
                                  [int(token)], L)
        survivors, n_surv, final_rows = _descend(
            index, key, int(token), [key], first, L, doc_axis=True,
            spark=corpus.sparkSession,
        )
        if n_surv == 0:
            return corpus.sparkSession.createDataFrame([], "doc_id string, w_id long")
        cand, _ = _candidates_by_doc(corpus.sparkSession, survivors, final_rows)
    else:
        rows = index.filter(F.col("level") == L).select("doc_id", "w_id", "bloom")

        def probe(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ok = probe_blobs(pdf["bloom"].tolist(), key)[:, 0]
                yield pdf.loc[ok, ["doc_id", "w_id"]]

        candidates = rows.mapInPandas(probe, schema="doc_id string, w_id long")
        cand = candidates.groupBy("doc_id").agg(F.collect_set("w_id").alias("wids"))
    # exact verify: windows actually holding the token, intersected with the
    # Bloom-candidate set — all JVM-side array functions
    occ_windows = F.array_distinct(
        F.transform(
            F.filter(
                F.sequence(F.lit(0).cast("long"), (F.col("n_tok") - 1).cast("long")),
                lambda i: F.element_at("tokens", (i + 1).cast("int")) == F.lit(int(token)),
            ),
            lambda i: (i / span).cast("long"),
        )
    )
    return (
        corpus.join(cand, on="doc_id", how="inner")
        .select("doc_id", F.explode(F.array_intersect(occ_windows, F.col("wids"))).alias("w_id"))
    )


def wildcard_pattern_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Exact match positions of a pattern with WILDCARDS (``None`` entries
    match any single token): (doc_id, pos), 0-based — report() extended to
    gapped literals ('t ? e' finds every t_e trigram).

    Same cascade as pattern_search, with the probe plan weakened soundly:
    only the LITERAL tokens are probed (dropping a constraint can only grow
    the candidate superset, never lose a match), the anchor condition is
    kept only when position 0 is literal (otherwise the match's first
    literal may start in the neighbor window), and the verifier checks the
    literal offsets only (functions.wildcard_subsequence_positions).
    Requires a token-keyed index (ngram=1 — a wildcard splits every n-gram
    that crosses it, so no gram key is computable)."""
    from ..functions import wildcard_subsequence_positions

    if cfg.axis != "doc":
        raise NotImplementedError("wildcard_pattern_search routes on the doc axis")
    if cfg.ngram != 1:
        raise ValueError("wildcard_pattern_search requires a token-keyed index (ngram=1)")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    # probe LITERAL positions only; class positions (list/set entries,
    # regex-lite [abc]) are a further sound weakening — the verifier
    # enforces them, the probe cannot (a window need only contain SOME
    # member, which a conjunctive key test cannot express)
    literals = [int(v) for v in pattern
                if v is not None and not isinstance(v, (list, tuple, set, frozenset))]

    def brute() -> DataFrame:
        return corpus.select(
            "doc_id",
            F.explode(wildcard_subsequence_positions("tokens", pattern)).alias("pos"),
        )

    if not literals or m > cfg.tree_span:
        # no literal (nothing to probe) or a match can span >2 windows at
        # every level: exact scan
        return brute()
    keys = np.unique(np.asarray(literals, dtype=np.int64)).astype(np.uint64)
    anchor = (int(pattern[0])
              if pattern[0] is not None
              and not isinstance(pattern[0], (list, tuple, set, frozenset))
              else None)
    deepest = deepest_usable_level(cfg, m)
    first = _plan_start_level(
        start_level, stats, freq, None, None, keys, m, literals, deepest,
        stats_out=stats_out,
    )
    if first > deepest:
        return brute()
    spark = corpus.sparkSession
    survivors, n_surv, final_rows = _descend(
        index, keys, anchor, [keys], first, deepest, doc_axis=True, spark=spark,
        stats_out=stats_out,
    )
    if n_surv == 0:
        return spark.createDataFrame([], MATCH_SCHEMA)
    cand, cand_small = _candidates_by_doc(spark, survivors, final_rows, stats_out)
    span = cfg.span(deepest)
    return (
        corpus.join(F.broadcast(cand) if cand_small else cand, on="doc_id", how="inner")
        .select(
            "doc_id",
            F.filter(
                wildcard_subsequence_positions("tokens", pattern),
                lambda i: F.array_contains("wids", (i / span).cast("long")),
            ).alias("positions"),
        )
        .select("doc_id", F.explode("positions").alias("pos"))
    )


def global_wildcard_pattern_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Exact GLOBAL match positions (gpos) of a WILDCARD pattern (``None``
    matches any single token) over the one concatenated stream — matches may
    cross document boundaries (a wildcard may even BE the boundary). Same
    cascade/verification shape as global_pattern_search with the probe plan
    weakened to the literal tokens (sound superset) and the wildcard-aware
    verifier over the stitched scan. Requires ngram=1 (a wildcard splits
    every crossing n-gram)."""
    from ..functions import wildcard_subsequence_positions

    if cfg.axis != "global":
        raise ValueError("global_wildcard_pattern_search needs cfg.axis='global'")
    if cfg.ngram != 1:
        raise ValueError(
            "global_wildcard_pattern_search requires a token-keyed index (ngram=1)")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
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
                F.explode(wildcard_subsequence_positions(scan_col, pattern)).alias("p"),
                "doc_offset", "n_tok",
            )
            .filter(F.col("p") < F.col("n_tok"))
            .select((F.col("doc_offset") + F.col("p")).alias("gpos"))
        )

    literals = [int(v) for v in pattern
                if v is not None and not isinstance(v, (list, tuple, set, frozenset))]
    if not literals or m > cfg.tree_span:
        return exact_scan()
    keys = np.unique(np.asarray(literals, dtype=np.int64)).astype(np.uint64)
    anchor = (int(pattern[0])
              if pattern[0] is not None
              and not isinstance(pattern[0], (list, tuple, set, frozenset))
              else None)
    deepest = deepest_usable_level(cfg, m)
    first = _plan_start_level(
        start_level, stats, freq, None, None, keys, m, literals, deepest,
        stats_out=stats_out,
    )
    if first > deepest:
        return exact_scan()
    spark = corpus.sparkSession
    survivors, n_surv, final_rows = _descend(
        index, keys, anchor, [keys], first, deepest, doc_axis=False, spark=spark,
        stats_out=stats_out,
    )
    if n_surv == 0:
        return spark.createDataFrame([], "gpos long")
    return _global_verify(
        stitched, scan_col, survivors, final_rows, cfg.span(deepest),
        lambda c: wildcard_subsequence_positions(c, pattern),
    )


def range_membership(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    ranges,
    token: int,
) -> DataFrame:
    """'Does ``token`` appear in leaf-window range [a, b)?' per doc — EXACT
    (doc_id, a, b) rows, the membership member of the dyadic range family
    (count/distinct/freq/quantile/heavy-hitters/MEMBERSHIP).

    Each range probes its <= 2*log2(b-a)+2 covering Bloom nodes instead of
    b-a leaves (rollup.dyadic_cover): a (doc, range) is a candidate iff ANY
    cover node may-contain the token (no false negatives — a true occurrence
    makes its covering node truly positive), then one JVM-side exists() over
    the range slice decides. Ranges are all-docs (a, b) pairs: only the
    shared cover nodes broadcast; the per-doc fan-out joins the index's own
    doc_id column (never a driver doc catalog)."""
    from .rollup import _range_nodes_df

    if cfg.ngram != 1:
        raise ValueError("range_membership requires a token-keyed index (ngram=1)")
    spark = corpus.sparkSession
    deepest = cfg.deepest
    span = cfg.leaf_span
    nodes = F.broadcast(_range_nodes_df(spark, ranges, deepest, ("a", "b")))
    joined = index.join(nodes, ["level", "w_id"]).select(
        "level", "doc_id", "a", "b", "bloom")
    key = np.asarray([int(token)], dtype=np.uint64)

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # a cover mixes LEVELS and per-level Bloom sizes differ — probe
            # each level's uniform-size blobs in its own vectorized call
            for _lv, sub in pdf.groupby("level", sort=False):
                ok = probe_blobs(sub["bloom"].tolist(), key)[:, 0]
                yield sub.loc[ok, ["doc_id", "a", "b"]]

    cand = joined.mapInPandas(probe, schema="doc_id string, a long, b long").distinct()
    # exact verify: one exists() over the clipped range slice, JVM codegen
    return (
        corpus.join(cand, "doc_id")
        .filter(
            F.exists(
                F.expr(f"slice(tokens, cast(a * {span} + 1 as int), "
                       f"cast((b - a) * {span} as int))"),
                lambda x: x == F.lit(int(token)),
            )
        )
        .select("doc_id", "a", "b")
    )


def _range_sliced_index(index: DataFrame, cfg: HbiConfig, lo: int, hi: int) -> DataFrame:
    """The index restricted to windows that a match starting in token range
    [lo, hi) can touch: per level, w in [lo // span, (hi-1) // span + 1].
    The +1 keeps the right NEIGHBOR of the boundary window present — the
    neighbor-union candidacy test of window w reads w+1's mask for matches
    straddling into it, and the descent's {2w, 2w+1, 2w+2} children probe
    expects it (dropping it could only lose matches ENDING past hi, which
    the caller's exact position post-filter excludes anyway — the margin is
    belt-and-braces, one extra window per level). One disjunctive filter on
    (level, w_id): Catalyst pushes it into the cached index scan, so a
    narrow range reads O(log + range/leaf_span) windows, not the index."""
    cond = None
    for L in cfg.levels:
        span = cfg.span(L)
        c = (
            (F.col("level") == F.lit(L))
            & (F.col("w_id") >= F.lit(lo // span))
            & (F.col("w_id") <= F.lit((hi - 1) // span + 1))
        )
        cond = c if cond is None else (cond | c)
    return index.filter(cond)


def pattern_search_range(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    lo: int,
    hi: int,
    **search_kw,
) -> DataFrame:
    """Range-restricted report(): exact matches of ``pattern`` whose start
    AND end lie in the per-doc token range [lo, hi) — (doc_id, pos) with
    pos in [lo, hi - m]. The cascade runs on a (level, w_id)-SLICED index
    (_range_sliced_index), so a narrow slice probes a few windows per level
    instead of every window — the pattern twin of the dyadic range family
    (range queries answer aggregates over [a, b); this answers WHERE in
    [a, b)). Exactness comes from the verifier plus the closing position
    filter; the slice only prunes work. ``search_kw`` forwards to
    pattern_search (start_level / freq / stats / markov / ...)."""
    m = len(pattern)
    if lo < 0 or hi <= lo:
        raise ValueError("pattern_search_range: need 0 <= lo < hi")
    spark = corpus.sparkSession
    if hi - lo < m:
        return spark.createDataFrame([], "doc_id string, pos int")
    out = pattern_search(corpus, _range_sliced_index(index, cfg, lo, hi), cfg,
                         pattern, **search_kw)
    return out.filter((F.col("pos") >= lo) & (F.col("pos") <= hi - m))


def global_pattern_search_range(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    lo: int,
    hi: int,
    **search_kw,
) -> DataFrame:
    """Range-restricted GLOBAL report(): stream matches with gpos in
    [lo, hi - m] — search a slice of the one concatenated stream (a stream
    offset window, e.g. 'this ingestion epoch only') without scanning or
    stitching anything outside it: the sliced index prunes the cascade to
    the range's windows per level, and only docs overlapping surviving
    windows are assembled by the verifier. Same exactness argument as
    pattern_search_range."""
    m = len(pattern)
    if lo < 0 or hi <= lo:
        raise ValueError("global_pattern_search_range: need 0 <= lo < hi")
    spark = corpus.sparkSession
    if hi - lo < m:
        return spark.createDataFrame([], "gpos long")
    out = global_pattern_search(corpus, _range_sliced_index(index, cfg, lo, hi),
                                cfg, pattern, **search_kw)
    return out.filter((F.col("gpos") >= lo) & (F.col("gpos") <= hi - m))


def pattern_topk_docs(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    k: int,
    **search_kw,
) -> DataFrame:
    """RANKED RETRIEVAL: the top-k documents by EXACT occurrence count of
    ``pattern`` — (doc_id, n_matches), n_matches DESC with doc_id ASC as the
    deterministic tie-break (ties are common: most docs hold the same small
    count). pattern_search's (doc_id, pos) stream aggregates per doc with
    map-side partial counts (only (doc_id, count) rows reach the shuffle)
    and orderBy+limit compiles to TakeOrderedAndProject — each partition
    keeps its own top-k, the driver merges k*n_partitions rows, no global
    sort at any scale. ``search_kw`` forwards to pattern_search
    (start_level/freq/stats/markov/... — wire the planner inputs, the
    cascade cost dominates)."""
    if k <= 0:
        raise ValueError("pattern_topk_docs: k must be >= 1")
    hits = pattern_search(corpus, index, cfg, pattern, **search_kw)
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
        .orderBy(F.desc("n_matches"), F.asc("doc_id"))
        .limit(int(k))
    )


def pattern_completions(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    ell: int,
    k: int,
    **search_kw,
) -> DataFrame:
    """AUTOCOMPLETE / n-gram-LM counts: the top-k length-``ell`` token
    continuations observed after exact occurrences of ``pattern`` —
    (completion, n) where completion is the '|'-joined codepoints of the
    ``ell`` tokens following the match (within the doc; matches too close
    to the doc edge contribute nothing), n its exact occurrence count.
    Deterministic (n DESC, completion ASC) order makes the k-th boundary a
    pure function of the corpus. Plan: the cascade finds matches, one
    corpus join slices the continuation JVM-side, map-side partial counts
    reach the one groupBy shuffle as (completion, count) rows, and
    orderBy+limit compiles to TakeOrderedAndProject — no global sort.
    ``search_kw`` forwards to pattern_search."""
    if ell < 1 or k < 1:
        raise ValueError("pattern_completions: need ell >= 1 and k >= 1")
    m = len(pattern)
    hits = pattern_search(corpus, index, cfg, pattern, **search_kw)
    return (
        hits.join(corpus.select("doc_id", "tokens", "n_tok"), "doc_id")
        .filter(F.col("pos") + F.lit(m + ell) <= F.col("n_tok"))
        .select(
            F.array_join(
                F.transform(
                    F.slice(F.col("tokens"), F.col("pos") + F.lit(m + 1), F.lit(ell)),
                    lambda t: t.cast("string"),
                ),
                "|",
            ).alias("completion")
        )
        .groupBy("completion")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("completion"))
        .limit(int(k))
    )


def global_pattern_completions(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    ell: int,
    k: int,
    **search_kw,
) -> DataFrame:
    """AUTOCOMPLETE on the one-stream axis: top-k length-``ell``
    continuations after exact GLOBAL matches of ``pattern`` — continuations
    are read from the concatenated stream, so they CROSS doc boundaries
    (the doc-axis twin pattern_completions cannot see those); matches whose
    continuation would pass the stream end contribute nothing. Same
    (completion, n) schema and (n DESC, completion ASC) determinism as the
    doc-axis twin.

    Plan: each match explodes into its ``ell`` continuation positions;
    position -> owning doc resolves through an EQUI-join on the position's
    leaf w_id against the corpus's exploded window list (the
    global_window_membership shuffle discipline — never a range join or a
    stream materialization), the containment filter closes it, and one
    groupBy per match reassembles the completion before the count."""
    if ell < 1 or k < 1:
        raise ValueError("global_pattern_completions: need ell >= 1 and k >= 1")
    m = len(pattern)
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    span = cfg.span(cfg.deepest)
    hits = global_pattern_search(corpus, index, cfg, pattern, **search_kw)
    pos = hits.select(
        "gpos",
        F.explode(F.sequence(F.lit(0), F.lit(ell - 1))).alias("j"),
    ).select("gpos", "j", (F.col("gpos") + F.lit(m) + F.col("j")).alias("p"))
    pos = pos.withColumn("w_id", (F.col("p") / span).cast("long"))
    live = corpus.filter(F.col("n_tok") > 0)
    doc_windows = live.select(
        "doc_offset", "n_tok", "tokens",
        F.explode(
            F.sequence(
                (F.col("doc_offset") / span).cast("long"),
                ((F.col("doc_offset") + F.col("n_tok") - 1) / span).cast("long"),
            )
        ).alias("w_id"),
    )
    toks = (
        doc_windows.join(pos, "w_id")
        .filter(
            (F.col("p") >= F.col("doc_offset"))
            & (F.col("p") < F.col("doc_offset") + F.col("n_tok"))
        )
        .select(
            "gpos", "j",
            F.element_at(
                "tokens", (F.col("p") - F.col("doc_offset") + 1).cast("int")
            ).alias("tok"),
        )
    )
    return (
        toks.groupBy("gpos")
        .agg(F.sort_array(F.collect_list(F.struct("j", "tok"))).alias("c"))
        .filter(F.size("c") == ell)  # continuation fully inside the stream
        .select(
            F.array_join(
                F.transform(F.col("c"), lambda s: s["tok"].cast("string")), "|"
            ).alias("completion")
        )
        .groupBy("completion")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("completion"))
        .limit(int(k))
    )


def pattern_contexts(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    context: int,
    **search_kw,
) -> DataFrame:
    """KWIC (keyword-in-context) extraction: every exact match of
    ``pattern`` with up to ``context`` surrounding tokens on each side,
    EXPLODED to one row per context token — (doc_id, pos, off, tok) with
    off in [-context, m+context) relative to the match start, clamped at
    document edges. The reference's report() returns bare positions
    (PMIndex/HBI.java:205); snippet assembly is the retrieval-UI layer on
    top.

    All JVM-side after the cascade: one join of the (doc_id, pos) match
    stream against the pruned (doc_id, tokens) projection, then
    sequence+explode+element_at inside whole-stage codegen — the off bounds
    guarantee 0 < pos+off+1 <= n_tok, so the 1-based element_at never
    faults under ANSI. ``search_kw`` forwards to pattern_search."""
    if context < 0:
        raise ValueError("pattern_contexts: context must be >= 0")
    m = len(pattern)
    hits = pattern_search(corpus, index, cfg, pattern, **search_kw)
    joined = hits.join(corpus.select("doc_id", "tokens", "n_tok"), "doc_id")
    lo = F.greatest(F.lit(-int(context)), -F.col("pos"))
    hi = F.least(F.lit(m + int(context)), F.col("n_tok") - F.col("pos")) - F.lit(1)
    return (
        joined.select(
            "doc_id", "pos", "tokens",
            F.explode(F.sequence(lo.cast("int"), hi.cast("int"))).alias("off"),
        )
        .select(
            "doc_id", "pos", "off",
            F.element_at("tokens", F.col("pos") + F.col("off") + F.lit(1)).alias("tok"),
        )
    )
