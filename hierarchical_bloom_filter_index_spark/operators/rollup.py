"""Dyadic sketch rollup: derive every coarser level from the leaf level by
MERGING child sketches — no second pass over the tokens.

SURVEY §2.7: "the dyadic level hierarchy IS a rollup over window granularity
... build level L by merging the two child sketches of level L+1 instead of
re-scanning the data per level." Bloom filters can't roll up here because
each level is sized differently (merge requires identical (m,k)); HLL/CMS
share parameters across levels, so parent = merge(children) exactly equals a
from-scratch build of the parent window (merge law), and each rollup step
touches only sketch rows (|windows at level L+1|), never the corpus.

At 100 TB this is the difference between L scans of the data and ONE scan
plus L-1 scans of an ever-halving sketch table.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..config import HbiConfig
from ..sketches import from_bytes

HLL_INDEX_SCHEMA = "doc_id string, level int, w_id long, sketch binary"


def _merge_partitions(rows: DataFrame, floor_parts: int | None = None) -> int:
    """Reduce-side partition count for a children-merge groupBy, sized from
    the DATA (input partition count, which tracks bytes) with a core-count
    floor — NOT the session's spark.sql.shuffle.partitions. With the default
    8 shuffle partitions, a 1.6M-window merge gave every reduce task a
    ~300 MB collect_list hash-agg state; 8 such concurrent tasks GC-thrashed
    so badly that local[8] ran 2x SLOWER than local[2] (measured at a 26M
    token global build: 94 s -> 24 s from this sizing alone)."""
    sc = rows.sparkSession.sparkContext
    n_in = floor_parts if floor_parts is not None else rows.rdd.getNumPartitions()
    # cap at ~16 waves/core: a 2-core box must not pay 64 tasks/core of
    # scheduling overhead just because the input arrived in many partitions
    return max(min(n_in, sc.defaultParallelism * 16), sc.defaultParallelism * 2)


def _grouped_merge(rows: DataFrame, keys, merge_children, schema: str,
                   n_parts: int) -> DataFrame:
    """repartition-by-keys THEN groupBy: hashpartitioning(keys, n) satisfies
    the aggregate's distribution, so the agg runs with n data-sized
    partitions instead of spark.sql.shuffle.partitions. Most windows have a
    single child row, so the lost map-side combine costs ~nothing."""
    return (
        rows.repartition(n_parts, *keys)
        .groupBy(*keys)
        .agg(F.collect_list("sketch").alias("children"))
        .mapInPandas(merge_children, schema=schema)
    )


def rollup_scaffold(leaf: DataFrame, deepest: int, pass_fn) -> DataFrame:
    """Assemble a full dyadic index from its leaf level. ``pass_fn(cur, L)``
    derives the level-L frame from the level-(L+1) frame ``cur``. Each level
    feeds BOTH the next rollup pass and the output union, so levels are
    persisted during construction (else level L is recomputed once per
    coarser level AND once in the union: O(L^2) stages); the assembled index
    is materialized, then the per-level scaffolding is released.

    The RETURNED DataFrame is persisted (MEMORY_AND_DISK): the CALLER owns
    the final ``unpersist()`` — repeated builds in one session without it
    accumulate cached index copies (the cache-leak trap in CLAUDE.md).
    Everything is a pure function of the corpus, so a later eviction costs
    recompute time, never answers."""
    from pyspark import StorageLevel

    frames = [leaf.persist(StorageLevel.MEMORY_AND_DISK)]
    cur = frames[0]
    for L in range(deepest - 1, -1, -1):
        cur = pass_fn(cur, L).persist(StorageLevel.MEMORY_AND_DISK)
        frames.append(cur)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    for f in frames:
        f.unpersist()
    return out


def _merge_sparse(flat: list, counts: np.ndarray, merge_groups) -> list:
    """Grouped merge with a SINGLE-CHILD PASSTHROUGH: a group of one blob
    merges to itself byte-identically (CMS/HLL/KLL wire formats round-trip),
    so only multi-child groups pay the decode+encode. On a global leaf merge
    almost every window has exactly one partial (only doc-boundary windows
    split), so this skips ~all of the kernel work."""
    counts = np.asarray(counts, dtype=np.int64)
    if len(counts) == len(flat):  # every group is a singleton
        return [bytes(b) for b in flat]
    starts = np.cumsum(counts) - counts
    out: list = [None] * len(counts)
    multi_flat: list = []
    multi_counts: list[int] = []
    multi_pos: list[int] = []
    for i in range(len(counts)):
        if counts[i] == 1:
            out[i] = bytes(flat[starts[i]])
        else:
            multi_pos.append(i)
            multi_counts.append(int(counts[i]))
            multi_flat.extend(flat[starts[i] : starts[i] + counts[i]])
    merged = merge_groups(multi_flat, np.asarray(multi_counts, dtype=np.int64))
    for p, b in zip(multi_pos, merged):
        out[p] = b
    return out


def _persisted(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    return out


def _build_window_sketch_index(corpus: DataFrame, cfg: HbiConfig,
                               leaf_blobs, merge_groups) -> DataFrame:
    """Shared shape of every window-sketch rollup build, doc axis:
    ZERO-SHUFFLE. A doc's whole dyadic tree is a pure function of its own
    tokens — the vectorized leaf pass (``leaf_blobs(tokens) -> list[bytes]``,
    one kernel call per doc) and EVERY coarser level (one
    ``merge_groups(flat_blobs, group_counts)`` call per level per Arrow
    batch, children sorted by (doc, w_id)) happen inside one mapInPandas.
    No level-by-level shuffles of sketch rows (the staged rollup paid L
    repartition+groupBy exchanges for merges that were local all along);
    parents are still MERGED from children — tokens are scanned once.
    The returned index is persisted; the CALLER owns unpersist()."""
    return _persisted(_window_sketch_plan(corpus, cfg, leaf_blobs, merge_groups))


def _window_sketch_plan(corpus: DataFrame, cfg: HbiConfig,
                        leaf_blobs, merge_groups) -> DataFrame:
    """The lazy doc-axis build plan (exposed separately so plan-shape tests
    can assert it contains ZERO Exchange before materialization)."""

    deepest = cfg.deepest

    def build_all_levels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_names: list = []
            blob_parts: list = []
            w_parts: list[np.ndarray] = []
            d_parts: list[np.ndarray] = []
            for did, toks in zip(pdf["doc_id"], pdf["tokens"]):
                blobs = leaf_blobs(np.asarray(toks, dtype=np.int64))
                if not blobs:
                    continue
                d_parts.append(np.full(len(blobs), len(doc_names), dtype=np.int64))
                doc_names.append(did)
                blob_parts.extend(blobs)
                w_parts.append(np.arange(len(blobs), dtype=np.int64))
            if not doc_names:
                continue
            names = np.asarray(doc_names, dtype=object)
            cur_w = np.concatenate(w_parts)
            cur_d = np.concatenate(d_parts)
            cur_blobs = blob_parts
            frames = [pd.DataFrame({"doc_id": names[cur_d], "level": deepest,
                                    "w_id": cur_w, "sketch": cur_blobs})]
            for L in range(deepest - 1, -1, -1):
                # (doc, w_id // 2) keys are already sorted (docs emitted in
                # order, w ascending within doc), so np.unique's sorted
                # groups line up with the flat blob order
                key = (cur_d << np.int64(40)) | (cur_w >> np.int64(1))
                uniq, counts = np.unique(key, return_counts=True)
                cur_blobs = merge_groups(cur_blobs, counts)
                cur_d = uniq >> np.int64(40)
                cur_w = uniq & np.int64((1 << 40) - 1)
                frames.append(pd.DataFrame({"doc_id": names[cur_d], "level": L,
                                            "w_id": cur_w, "sketch": cur_blobs}))
            yield pd.concat(frames, ignore_index=True)

    return corpus.select("doc_id", "tokens").mapInPandas(build_all_levels, schema=HLL_INDEX_SCHEMA)


def build_hll_window_index(corpus: DataFrame, cfg: HbiConfig, p: int = 12) -> DataFrame:
    """Approximate-distinct index: one HLL per (doc, level, window), built
    leaf-first then rolled up. Answers 'how many distinct tokens in window
    W at level L' within the 1.04/sqrt(2^p) envelope. The returned index is
    PERSISTED (see rollup_scaffold) — call ``unpersist()`` when done."""
    from ..sketches.hll import leaf_window_blobs, merge_blob_groups

    leaf_span, seed = cfg.leaf_span, cfg.seed + 7
    return _build_window_sketch_index(
        corpus, cfg,
        lambda toks: leaf_window_blobs(toks, leaf_span, p, seed),
        lambda flat, counts: merge_blob_groups(flat, counts, p),
    )


def window_distinct_estimates(hll_index: DataFrame, level: int) -> DataFrame:
    """(doc_id, w_id, est_distinct) at one level — whole batches estimated
    in one vectorized register pass (sketches.hll.estimate_blobs)."""
    from ..sketches.hll import blob_p, estimate_blobs

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = [bytes(b) for b in pdf["sketch"]]
            p = blob_p(blobs[0])
            out = pdf[["doc_id", "w_id"]].copy()
            out["est_distinct"] = estimate_blobs(blobs, p)
            yield out

    return hll_index.filter(F.col("level") == level).mapInPandas(
        est, schema="doc_id string, w_id long, est_distinct double"
    )


def build_cms_window_index(corpus: DataFrame, cfg: HbiConfig, depth: int = 3, width: int = 256) -> DataFrame:
    """Approximate-frequency index: one CMS per (doc, level, window), built
    leaf-first then rolled up. Answers 'how often does token t occur in
    window W at level L' within eps*N_window (eps = e/width) w.p.
    1 - exp(-depth). CMS is LINEAR, so every rolled-up parent is
    byte-identical to a from-scratch build of its window — the rollup is
    exact, only estimates carry error. Same scaffold/persistence contract
    as build_hll_window_index (caller unpersists)."""
    from ..sketches import cms as cms_kernels

    leaf_span, seed = cfg.leaf_span, cfg.seed + 11
    return _build_window_sketch_index(
        corpus, cfg,
        lambda toks: cms_kernels.leaf_window_blobs(toks, leaf_span, depth, width, seed),
        lambda flat, counts: cms_kernels.merge_blob_groups(flat, counts, depth, width, seed),
    )


def window_freq_estimates(cms_index: DataFrame, level: int, probe_tokens) -> DataFrame:
    """(doc_id, w_id, token, est_count) at one level for each probe token —
    whole batches estimated in one vectorized table pass
    (sketches.cms.estimate_blobs). Estimates overestimate only, within
    eps*N_window with prob 1-delta per (window, token)."""
    from ..sketches import cms as cms_kernels

    probes = np.asarray(sorted(int(t) for t in probe_tokens), dtype=np.int64)

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = [bytes(b) for b in pdf["sketch"]]
            d, w, s = cms_kernels.blob_params(blobs[0])
            ests = cms_kernels.estimate_blobs(blobs, probes, d, w, s)
            out = pdf[["doc_id", "w_id"]].loc[pdf.index.repeat(len(probes))].reset_index(drop=True)
            out["token"] = np.tile(probes, len(pdf))
            out["est_count"] = ests.ravel()
            yield out

    return cms_index.filter(F.col("level") == level).mapInPandas(
        est, schema="doc_id string, w_id long, token long, est_count long"
    )


def _totals_reader(index: DataFrame, key_cols: tuple, totals_fn, schema: str) -> DataFrame:
    """Shared shape of every exact-totals readout (CMS window totals, KLL
    item counts, doc or global keys): copy the key columns, decode each
    blob's exact count in one vectorized call per batch."""

    def tot(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[list(key_cols)].copy()
            out["n_window"] = totals_fn([bytes(b) for b in pdf["sketch"]])
            yield out

    return index.mapInPandas(tot, schema=schema)


def window_token_totals(cms_index: DataFrame) -> DataFrame:
    """(doc_id, level, w_id, n_window) for EVERY level — EXACT (the CMS
    total is the window's token count, no estimation), so the whole rollup
    geometry + coverage is SQL-oracle-checkable."""
    from ..sketches.cms import window_totals

    return _totals_reader(cms_index, ("doc_id", "level", "w_id"), window_totals,
                          "doc_id string, level int, w_id long, n_window long")


def build_kll_window_index(corpus: DataFrame, cfg: HbiConfig, k: int = 200) -> DataFrame:
    """Approximate-QUANTILE index: one KLL per (doc, level, window), built
    leaf-first then rolled up (KLL merge is bound-preserving, so every
    rolled-up parent answers rank/quantile queries within the k-parameter
    envelope; its item count n stays EXACT). Completes the per-window sketch
    family (HLL distinct / CMS frequency / KLL quantile) — the reference
    answers rank point queries from its samplers (estimators/HOPS.java:
    117-136, estimators/BottomKSampler.java:17-58). Same persistence
    contract as build_hll_window_index (caller unpersists)."""
    from ..sketches import kll as kll_kernels

    leaf_span, seed = cfg.leaf_span, cfg.seed + 13
    return _build_window_sketch_index(
        corpus, cfg,
        lambda toks: kll_kernels.leaf_window_blobs(toks, leaf_span, k, seed),
        lambda flat, counts: kll_kernels.merge_blob_groups(flat, counts),
    )


def build_td_window_index(corpus: DataFrame, cfg: HbiConfig, delta: float = 100.0) -> DataFrame:
    """Approximate-quantile index #2: one t-DIGEST per (doc, level, window)
    (Dunning & Ertl merging digest, the second quantile sketch the
    north_rule names alongside KLL). Tail-accurate (k1 scale concentrates
    centroids at q→0,1) and — unlike KLL — fully DETERMINISTIC: no RNG, and
    sketches/tdigest._compact is an ORDER-FREE pure function of the child
    centroid multiset, so every build path (leaf pass, append, global
    partials, stream maintenance) yields byte-identical nodes. Nodes whose
    window fits the raw regime (n <= tdigest._raw_max(delta)) are
    additionally pure functions of the raw window multiset (sorted
    singleton centroids). Item counts n stay EXACT (td_window_totals is
    the SQL oracle). Same persistence contract as build_kll_window_index
    (caller unpersists)."""
    from ..sketches import tdigest as tdk

    leaf_span = cfg.leaf_span
    return _build_window_sketch_index(
        corpus, cfg,
        lambda toks: tdk.leaf_window_blobs(toks, leaf_span, delta),
        lambda flat, counts: tdk.merge_blob_groups(flat, counts, delta),
    )


def td_window_totals(td_index: DataFrame) -> DataFrame:
    """(doc_id, level, w_id, n_window) for EVERY level — EXACT (the t-digest
    item count is exact and merges add), so the quantile-rollup geometry +
    coverage is SQL-oracle-checkable, mirroring kll_window_totals."""
    from ..sketches.tdigest import blob_totals

    return _totals_reader(td_index, ("doc_id", "level", "w_id"), blob_totals,
                          "doc_id string, level int, w_id long, n_window long")


def build_mg_window_index(corpus: DataFrame, cfg: HbiConfig, k: int = 32) -> DataFrame:
    """HEAVY-HITTERS index: one Misra-Gries summary per (doc, level, window),
    built leaf-first then rolled up (flat sum-then-prune merges — see
    sketches/spacesaving.py kernel notes: byte-deterministic in each node's
    content, order-free). With ``k >= cfg.leaf_span`` leaves are EXACT
    counter tables; coarser nodes carry the state-computable
    (n - sum(counts))/(k+1) undercount bound, so any node (or dyadic range
    merge of nodes) yields a CERTIFIED candidate superset of its phi-heavy
    tokens — the sketch-prunes / exact-verification-decides contract of the
    Bloom index, applied to frequency. Completes the per-window family:
    HLL distinct / CMS frequency / KLL quantile / MG heavy hitters. Same
    persistence contract as the other builders (caller unpersists)."""
    from ..sketches import spacesaving as mgk

    leaf_span = cfg.leaf_span
    return _build_window_sketch_index(
        corpus, cfg,
        lambda toks: mgk.leaf_window_blobs(toks, leaf_span, k),
        lambda flat, counts: mgk.merge_blob_groups(flat, counts, k),
    )


def build_bk_window_index(corpus: DataFrame, cfg: HbiConfig, k: int = 16) -> DataFrame:
    """DISTINCT-SAMPLE index: one BottomK sampler per (doc, level, window),
    built leaf-first then rolled up. The priority is a pure function of the
    token, so bottom-k(A ∪ B) is exactly recoverable from bottom-k(A) ∪
    bottom-k(B) — every rolled-up node is the EXACT bottom-k distinct sample
    of its window (not an approximation), and dyadic range merges stay exact
    (range_distinct_sample is VALUE-oracle-checkable via the bit-exact
    splitmix64 SQL twin, like bottomk_tokens). Completes the per-window
    family: HLL distinct-count / CMS frequency / KLL quantile / MG heavy
    hitters / BottomK distinct-SAMPLE (reference
    estimators/BottomKSampler.java:17-58 lifted onto the hierarchy). Same
    persistence contract as the other builders (caller unpersists)."""
    from ..sketches import samplers as bkk

    leaf_span, seed = cfg.leaf_span, cfg.seed + 17
    return _build_window_sketch_index(
        corpus, cfg,
        lambda toks: bkk.leaf_window_blobs(toks, leaf_span, k, seed),
        lambda flat, counts: bkk.merge_blob_groups(flat, counts, k, seed),
    )


def build_cs_window_index(corpus: DataFrame, cfg: HbiConfig, depth: int = 3, width: int = 256) -> DataFrame:
    """SIGNED-frequency / SECOND-MOMENT index: one count-sketch (AMS) node
    per (doc, level, window), built leaf-first then rolled up. Count-sketch
    is LINEAR like CMS, so every rolled-up parent is byte-identical to a
    from-scratch build; one node answers two range questions — UNBIASED
    token frequency (median of signed rows; two-sided ~3*sqrt(F2/width)
    error vs CMS's one-sided eps*N) and F2, the second frequency moment /
    self-join size (Alon-Matias-Szegedy: median over rows of the row's sum
    of squares). Sparse-exact nodes answer both with zero error. Extends
    the reference's CountSketch estimator (estimators/CountSketch.java) to
    the window hierarchy. Same persistence contract as the other builders
    (caller unpersists)."""
    from ..sketches import cms as cms_kernels

    leaf_span, seed = cfg.leaf_span, cfg.seed + 23
    return _build_window_sketch_index(
        corpus, cfg,
        lambda toks: cms_kernels.cs_leaf_window_blobs(toks, leaf_span, depth, width, seed),
        lambda flat, counts: cms_kernels.cs_merge_blob_groups(flat, counts, depth, width, seed),
    )


def cs_window_totals(cs_index: DataFrame) -> DataFrame:
    """(doc_id, level, w_id, n_window) for EVERY level — EXACT (cs nodes
    store the window's token count in the same header slot as CMS), so the
    signed-family rollup geometry + coverage is SQL-oracle-checkable."""
    from ..sketches.cms import window_totals

    return _totals_reader(cs_index, ("doc_id", "level", "w_id"), window_totals,
                          "doc_id string, level int, w_id long, n_window long")


def mg_window_totals(mg_index: DataFrame) -> DataFrame:
    """(doc_id, level, w_id, n_window) for EVERY level — EXACT (the MG
    n_total is exact and adds under merge), mirroring window_token_totals,
    so the heavy-hitter rollup's geometry + coverage is SQL-oracle-checkable."""
    from ..sketches.spacesaving import blob_totals

    return _totals_reader(mg_index, ("doc_id", "level", "w_id"), blob_totals,
                          "doc_id string, level int, w_id long, n_window long")


def kll_window_totals(kll_index: DataFrame) -> DataFrame:
    """(doc_id, level, w_id, n_window) for EVERY level — EXACT (the KLL item
    count is exact and merges add), so the whole quantile-rollup geometry +
    coverage is SQL-oracle-checkable, mirroring window_token_totals."""
    from ..sketches.kll import blob_totals

    return _totals_reader(kll_index, ("doc_id", "level", "w_id"), blob_totals,
                          "doc_id string, level int, w_id long, n_window long")


def window_quantile_estimates(kll_index: DataFrame, level: int, qs) -> DataFrame:
    """(doc_id, w_id, q, est) at one level for each requested quantile."""
    from ..sketches.kll import quantile_blobs

    qs = [float(q) for q in qs]

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ests = quantile_blobs([bytes(b) for b in pdf["sketch"]], qs)
            out = pdf[["doc_id", "w_id"]].loc[pdf.index.repeat(len(qs))].reset_index(drop=True)
            out["q"] = np.tile(qs, len(pdf))
            out["est"] = ests.ravel()
            yield out

    return kll_index.filter(F.col("level") == level).mapInPandas(
        est, schema="doc_id string, w_id long, q double, est double"
    )


# ---------------------------------------------------------------------------
# Dyadic range queries — the point of the hierarchy: any leaf-window range
# [a, b) decomposes into <= 2*log2(b-a)+2 aligned index nodes, so a range
# answer merges O(log) sketches instead of (b-a) leaves. HLL merge (max)
# gives the EXACT HLL of the range; CMS merge (add) gives the EXACT CMS of
# the range — so range estimates carry the same published bounds, with
# N = range token count.
# ---------------------------------------------------------------------------

def dyadic_cover(a: int, b: int, deepest: int) -> list[tuple[int, int]]:
    """Minimal dyadic cover of the leaf-window range [a, b): (level, w_id)
    nodes, disjoint, tiling exactly [a, b) in leaf units. Greedy: at each
    step take the largest aligned block that starts at ``lo`` and fits."""
    if a < 0 or b < a:
        raise ValueError(f"bad range [{a}, {b})")
    out: list[tuple[int, int]] = []
    lo = a
    while lo < b:
        size = (lo & -lo) if lo else (1 << deepest)
        size = min(size, 1 << deepest)
        while size > b - lo:
            size //= 2
        k = size.bit_length() - 1
        out.append((deepest - k, lo >> k))
        lo += size
    return out


def _range_nodes_df(spark, ranges, deepest: int, key_cols):
    """Cover rows for each queried range — query-side small
    (|ranges| * O(log)), broadcast against the index. Ranges are DEDUPED:
    a repeated range would join each child sketch twice and the groupBy
    would fold the copies into ONE group — CMS totals/estimates would come
    out exactly doubled (HLL survives only by max-idempotence)."""
    uniq = list(dict.fromkeys(tuple(r) for r in ranges))
    rows = [
        (*key[:-2], int(key[-2]), int(key[-1]), L, w)
        for key in uniq
        for L, w in dyadic_cover(int(key[-2]), int(key[-1]), deepest)
    ]
    schema = ", ".join(
        [f"{c} string" for c in key_cols[:-2]] + ["a long", "b long", "level int", "w_id long"]
    )
    return spark.createDataFrame(rows, schema)


def _key_schema(key_cols) -> str:
    return ", ".join(f"{c} string" if c == "doc_id" else f"{c} long" for c in key_cols)


def _partial_merge_fn(key_cols, merge_groups):
    """Map-side combine for the range-family merges: collapse each
    partition's child sketches per (range key) to ONE partial before the
    shuffle. The two-phase (partial -> final) shape is what survives scale:
    the shuffle then moves |keys touched per partition| blobs instead of
    every covering child. Only valid for ORDER-INDEPENDENT merges (CMS add /
    HLL max — byte-identical to the single-phase answer); KLL stays on the
    single-shuffle sorted-children path."""
    keys = list(key_cols)

    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        # concat first: one key's rows may straddle Arrow batch boundaries
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        codes = pdf.groupby(keys, sort=False).ngroup().to_numpy()
        order = np.argsort(codes, kind="stable")
        counts = np.bincount(codes)
        sketches = pdf["sketch"].to_numpy()
        flat = [bytes(sketches[i]) for i in order]
        merged = _merge_sparse(flat, counts, merge_groups)
        first_idx = order[np.searchsorted(codes[order], np.arange(len(counts)))]
        out = pdf.iloc[first_idx][keys].reset_index(drop=True)
        out["sketch"] = merged
        yield out

    return f


def _joined_range_groups(
    index: DataFrame, ranges, deepest: int, key_cols, partial_merge=None
) -> DataFrame:
    """Join the broadcast cover nodes against the index and group per
    (range key). Doc-axis ranges come in TWO forms:

    * ``(doc_id, a, b)`` triples — explicit per-doc ranges; the nodes frame
      carries doc_id and joins on (doc_id, level, w_id).
    * ``(a, b)`` pairs — the range applies to EVERY doc. The cover nodes are
      identical for all docs, so ONLY the |ranges| * O(log) literal
      (a, b, level, w_id) rows are broadcast and the per-doc fan-out happens
      distributedly against the index's own doc_id column. Never collect the
      doc catalog to the driver to build per-doc triples — at real scale
      that is a driver-side materialization of every doc_id.
    """
    ranges = [tuple(r) for r in ranges]
    per_doc_keys = len(key_cols) == 3
    if per_doc_keys and ranges and len(ranges[0]) == 2:
        # all-docs form: shared nodes, join on (level, w_id) only; the
        # groupBy pulls doc_id from the index rows themselves
        nodes = F.broadcast(
            _range_nodes_df(index.sparkSession, ranges, deepest, key_cols[1:])
        )
        join_cols = ["level", "w_id"]
    else:
        nodes = F.broadcast(_range_nodes_df(index.sparkSession, ranges, deepest, key_cols))
        join_cols = ([key_cols[0]] if per_doc_keys else []) + ["level", "w_id"]
    joined = index.join(nodes, join_cols)
    if partial_merge is not None:
        joined = joined.select(*key_cols, "sketch").mapInPandas(
            _partial_merge_fn(key_cols, partial_merge),
            schema=_key_schema(key_cols) + ", sketch binary",
        )
    return (
        joined.groupBy(*key_cols)
        # collect_list order is nondeterministic and KLL merge bytes depend
        # on merge order (CMS add / HLL max do not) — sort the collected
        # blobs lexicographically so range-quantile answers are reproducible
        # run-to-run (still only bound-accurate, but stable for bench rows)
        .agg(F.sort_array(F.collect_list("sketch")).alias("children"))
    )


def _flatten_children(pdf: pd.DataFrame):
    flat: list[bytes] = []
    counts = np.empty(len(pdf), dtype=np.int64)
    for i, children in enumerate(pdf["children"]):
        counts[i] = len(children)
        flat.extend(bytes(x) for x in children)
    return flat, counts


def _hll_range_est_fn(key_cols):
    from ..sketches.hll import blob_p, estimate_blobs, merge_blob_groups

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            p = blob_p(flat[0])
            merged = merge_blob_groups(flat, counts, p)
            out = pdf[list(key_cols)].copy()
            out["est_distinct"] = estimate_blobs(merged, p)
            yield out

    return est


def _cms_range_freq_fn(key_cols, probes):
    from ..sketches import cms as cms_kernels

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            d, w, s = cms_kernels.blob_params(flat[0])
            merged = cms_kernels.merge_blob_groups(flat, counts, d, w, s)
            ests = cms_kernels.estimate_blobs(merged, probes, d, w, s)
            out = pdf[list(key_cols)].loc[pdf.index.repeat(len(probes))].reset_index(drop=True)
            out["token"] = np.tile(probes, len(pdf))
            out["est_count"] = ests.ravel()
            yield out

    return est


def _cms_range_tot_fn(key_cols):
    from ..sketches.cms import window_totals

    def tot(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # one flat header-read pass + a 1-D segmented sum — a per-group
            # Python loop here was the totals query's hot spot
            flat, counts = _flatten_children(pdf)
            totals = window_totals(flat)
            starts = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            out = pdf[list(key_cols)].copy()
            out["n_tokens"] = np.add.reduceat(totals, starts)
            yield out

    return tot


_DOC_KEYS = ("doc_id", "a", "b")
_DOC_KEY_SCHEMA = "doc_id string, a long, b long"
_GLOBAL_KEYS = ("a", "b")
_GLOBAL_KEY_SCHEMA = "a long, b long"


def _hll_merge_auto(flat, counts):
    """merge_blob_groups with p read from the first blob (uniform per index)."""
    from ..sketches.hll import blob_p, merge_blob_groups

    return merge_blob_groups(flat, counts, blob_p(flat[0]))


def _cms_merge_auto(flat, counts):
    from ..sketches import cms as cms_kernels

    d, w, s = cms_kernels.blob_params(flat[0])
    return cms_kernels.merge_blob_groups(flat, counts, d, w, s)


def _cs_merge_auto(flat, counts):
    from ..sketches import cms as cms_kernels

    d, w, s = cms_kernels.blob_params(flat[0])
    return cms_kernels.cs_merge_blob_groups(flat, counts, d, w, s)


def range_distinct_estimates(hll_index: DataFrame, ranges, deepest: int) -> DataFrame:
    """(doc_id, a, b, est_distinct) per queried leaf-window range: the O(log)
    covering nodes merge (register max) into the exact range HLL, estimated
    within the standard 1.04/sqrt(2^p) envelope. Ranges with no tokens
    produce no row (no covering node exists). ``ranges`` may be
    (doc_id, a, b) triples or (a, b) pairs applied to every doc — the pair
    form broadcasts only the shared cover nodes (see _joined_range_groups)."""
    return _joined_range_groups(
        hll_index, ranges, deepest, _DOC_KEYS, partial_merge=_hll_merge_auto
    ).mapInPandas(
        _hll_range_est_fn(_DOC_KEYS), schema=_DOC_KEY_SCHEMA + ", est_distinct double"
    )


def range_freq_estimates(cms_index: DataFrame, ranges, probe_tokens, deepest: int) -> DataFrame:
    """(doc_id, a, b, token, est_count) per range and probe token: covering
    nodes add (CMS is linear) into the exact range CMS — overestimate-only
    within eps * N_range."""
    probes = np.asarray(sorted(int(t) for t in probe_tokens), dtype=np.int64)
    return _joined_range_groups(
        cms_index, ranges, deepest, _DOC_KEYS, partial_merge=_cms_merge_auto
    ).mapInPandas(
        _cms_range_freq_fn(_DOC_KEYS, probes),
        schema=_DOC_KEY_SCHEMA + ", token long, est_count long",
    )


def range_token_totals(cms_index: DataFrame, ranges, deepest: int) -> DataFrame:
    """(doc_id, a, b, n_tokens) per range — EXACT (node totals are exact and
    the cover is a disjoint tiling), hence SQL-oracle-checkable. Accepts
    (doc_id, a, b) triples or all-docs (a, b) pairs."""
    return _joined_range_groups(
        cms_index, ranges, deepest, _DOC_KEYS, partial_merge=_cms_merge_auto
    ).mapInPandas(
        _cms_range_tot_fn(_DOC_KEYS), schema=_DOC_KEY_SCHEMA + ", n_tokens long"
    )


def _cs_range_f2_fn(key_cols):
    from ..sketches import cms as cms_kernels

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            d, w, s = cms_kernels.blob_params(flat[0])
            merged = cms_kernels.cs_merge_blob_groups(flat, counts, d, w, s)
            out = pdf[list(key_cols)].copy()
            out["est_f2"] = cms_kernels.f2_blobs(merged)
            yield out

    return est


def _cs_range_freq_fn(key_cols, probes):
    from ..sketches import cms as cms_kernels

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            d, w, s = cms_kernels.blob_params(flat[0])
            merged = cms_kernels.cs_merge_blob_groups(flat, counts, d, w, s)
            ests = cms_kernels.cs_estimate_blobs(merged, probes, d, w, s)
            out = pdf[list(key_cols)].loc[pdf.index.repeat(len(probes))].reset_index(drop=True)
            out["token"] = np.tile(probes, len(pdf))
            out["est_count"] = ests.ravel()
            yield out

    return est


def range_f2_estimates(cs_index: DataFrame, ranges, deepest: int) -> DataFrame:
    """(doc_id, a, b, est_f2) per queried leaf-window range: covering nodes
    ADD (count-sketch is linear) into the exact range sketch, then the AMS
    median-of-rows second-moment estimate — the range's self-join size.
    Sparse-exact range nodes give the EXACT sum of squared counts. Accepts
    (doc_id, a, b) triples or all-docs (a, b) pairs (shared cover nodes
    broadcast; see _joined_range_groups)."""
    return _joined_range_groups(
        cs_index, ranges, deepest, _DOC_KEYS, partial_merge=_cs_merge_auto
    ).mapInPandas(
        _cs_range_f2_fn(_DOC_KEYS), schema=_DOC_KEY_SCHEMA + ", est_f2 double"
    )


def range_signed_freq_estimates(cs_index: DataFrame, ranges, probe_tokens,
                                deepest: int) -> DataFrame:
    """(doc_id, a, b, token, est_count) per range and probe token — the
    UNBIASED count-sketch twin of range_freq_estimates (two-sided
    ~3*sqrt(F2_range/width) error instead of CMS's one-sided eps*N;
    sparse-exact range nodes are exact)."""
    probes = np.asarray(sorted(int(t) for t in probe_tokens), dtype=np.int64)
    return _joined_range_groups(
        cs_index, ranges, deepest, _DOC_KEYS, partial_merge=_cs_merge_auto
    ).mapInPandas(
        _cs_range_freq_fn(_DOC_KEYS, probes),
        # double: the signed median of an even row count is a half integer
        schema=_DOC_KEY_SCHEMA + ", token long, est_count double",
    )


def _quant_range_fn(key_cols, qs, group_readout,
                    probe_col: str = "q", out_col: str = "est"):
    """Shared range-quantile/CDF readout: ``group_readout(flat, counts, qs)``
    answers every requested probe per group of covering quantile-sketch
    nodes. The kernel parameterizes the family (KLL merge-then-read, or
    t-digest union readout) and the direction (quantile: q -> value;
    cdf: value -> rank fraction — pass probe_col/out_col accordingly)."""
    qs = [float(q) for q in qs]

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            ests = group_readout(flat, counts, qs)
            out = pdf[list(key_cols)].loc[pdf.index.repeat(len(qs))].reset_index(drop=True)
            out[probe_col] = np.tile(qs, len(pdf))
            out[out_col] = ests.ravel()
            yield out

    return est


def _kll_range_quant_fn(key_cols, qs):
    from ..sketches.kll import merge_blob_groups, quantile_blobs

    return _quant_range_fn(
        key_cols, qs,
        lambda flat, counts, q: quantile_blobs(merge_blob_groups(flat, counts), q),
    )


def _td_range_quant_fn(key_cols, qs):
    # UNION readout: quantiles straight off the concatenated cover-node
    # centroids — no greedy recompaction in the hot path (the per-group
    # _compact python loop made this query ~5x its KLL sibling); estimate
    # is finer-or-equal to merge-then-read and still deterministic
    from ..sketches.tdigest import quantile_union_groups

    return _quant_range_fn(key_cols, qs, quantile_union_groups)


def range_quantile_estimates(kll_index: DataFrame, ranges, qs, deepest: int) -> DataFrame:
    """(doc_id, a, b, q, est) per queried leaf-window range and quantile:
    the O(log) covering KLL nodes merge into a valid KLL of the range
    (bound-preserving merge), so any [a, b) slice answers quantile queries
    without touching b - a leaves. Accepts (doc_id, a, b) triples or
    all-docs (a, b) pairs. Completes the dyadic range family:
    count (range_token_totals, exact) / distinct (HLL) / frequency (CMS) /
    quantile (KLL)."""
    return _joined_range_groups(kll_index, ranges, deepest, _DOC_KEYS).mapInPandas(
        _kll_range_quant_fn(_DOC_KEYS, qs), schema=_DOC_KEY_SCHEMA + ", q double, est double"
    )


def range_tdigest_quantiles(td_index: DataFrame, ranges, qs, deepest: int) -> DataFrame:
    """(doc_id, a, b, q, est) per queried leaf-window range and quantile from
    the dyadic t-DIGEST index — the tail-accurate, byte-deterministic twin of
    range_quantile_estimates (t-digest merges are content-pure, so the range
    answer is reproducible run-to-run, unlike KLL's bound-only determinism).
    Accepts (doc_id, a, b) triples or all-docs (a, b) pairs."""
    return _joined_range_groups(td_index, ranges, deepest, _DOC_KEYS).mapInPandas(
        _td_range_quant_fn(_DOC_KEYS, qs), schema=_DOC_KEY_SCHEMA + ", q double, est double"
    )


def _td_range_cdf_fn(key_cols, vs):
    from ..sketches.tdigest import cdf_union_groups

    return _quant_range_fn(key_cols, vs, cdf_union_groups,
                           probe_col="v", out_col="est_cdf")


def range_tdigest_cdf(td_index: DataFrame, ranges, vs, deepest: int) -> DataFrame:
    """(doc_id, a, b, v, est_cdf) — INVERSE-quantile (rank/CDF) readout of
    the dyadic t-digest index: estimated fraction of the range's tokens <= v
    per queried leaf-window range and probe value. Same O(log) cover-node
    merge as range_tdigest_quantiles, same byte-determinism; rank error is
    the k1-scale contract. For an EXACT rank on enumerable (sparse-regime)
    content use range_rank_counts on the CMS index instead."""
    return _joined_range_groups(td_index, ranges, deepest, _DOC_KEYS).mapInPandas(
        _td_range_cdf_fn(_DOC_KEYS, vs),
        schema=_DOC_KEY_SCHEMA + ", v double, est_cdf double",
    )


def _cms_range_rank_fn(key_cols, vs):
    from ..sketches import cms as cms_kernels

    vs_arr = np.asarray(sorted(int(v) for v in vs), dtype=np.int64)

    def rk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            d, w, s = cms_kernels.blob_params(flat[0])
            merged = cms_kernels.merge_blob_groups(flat, counts, d, w, s)
            ranks = cms_kernels.rank_blobs(merged, vs_arr)
            out = pdf[list(key_cols)].loc[pdf.index.repeat(len(vs_arr))].reset_index(drop=True)
            out["v"] = np.tile(vs_arr, len(pdf))
            out["rank_le"] = ranks.ravel()
            yield out

    return rk


def range_rank_counts(cms_index: DataFrame, ranges, vs, deepest: int) -> DataFrame:
    """(doc_id, a, b, v, rank_le) — EXACT count of tokens <= v in each
    queried leaf-window range, from the CMS window index's SPARSE-exact
    nodes (the O(log) covering nodes add linearly and stay sparse while the
    range's distinct-token count <= sparse_max_nnz, so their sorted
    (token, count) pairs enumerate the range content exactly — the same
    sparse-only exactness contract as range_f2, and like it the readout
    REFUSES loudly in the dense regime rather than estimating; the t-digest
    range_tdigest_cdf is the estimate fallback there). Accepts (doc_id, a,
    b) triples or all-docs (a, b) pairs."""
    return _joined_range_groups(
        cms_index, ranges, deepest, _DOC_KEYS, partial_merge=_cms_merge_auto
    ).mapInPandas(
        _cms_range_rank_fn(_DOC_KEYS, vs),
        schema=_DOC_KEY_SCHEMA + ", v long, rank_le long",
    )


def _mg_range_cand_fn(key_cols, phi_num: int, phi_den: int):
    """Per (range key): merge the O(log) covering MG nodes in ONE flat
    sum-then-prune call (order-free, so the candidate set is deterministic
    in the cover-node content) and emit the certified phi-heavy candidate
    superset. Raises inside the task when the merged bound cannot certify
    (k+1 <= phi_den/phi_num) — loud refusal, never silent under-reporting."""
    from ..sketches import spacesaving as mgk

    def cand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            k = mgk.blob_k(flat[0])
            merged = mgk.merge_blob_groups(flat, counts, k)
            cands = mgk.heavy_candidate_blobs(merged, phi_num, phi_den)
            reps = np.asarray([len(t) for t, _ in cands], dtype=np.int64)
            out = pdf[list(key_cols)].loc[pdf.index.repeat(reps)].reset_index(drop=True)
            total = int(reps.sum())
            out["token"] = (np.concatenate([t for t, _ in cands])
                            if total else np.empty(0, np.int64))
            out["est_count"] = (np.concatenate([c for _, c in cands])
                                if total else np.empty(0, np.int64))
            yield out

    return cand


def range_heavy_candidates(mg_index: DataFrame, ranges, phi_num: int, phi_den: int,
                           deepest: int) -> DataFrame:
    """(doc_id, a, b, token, est_count): a CERTIFIED superset of the tokens
    with frequency >= (phi_num/phi_den) * n_range in each queried leaf-window
    range [a, b) — the O(log) covering MG nodes merge into a valid MG of the
    range, whose candidate cut provably covers every heavy token. est_count
    is an underestimate within the merged bound. Accepts (doc_id, a, b)
    triples or all-docs (a, b) pairs (shared cover nodes broadcast)."""
    return _joined_range_groups(mg_index, ranges, deepest, _DOC_KEYS).mapInPandas(
        _mg_range_cand_fn(_DOC_KEYS, phi_num, phi_den),
        schema=_DOC_KEY_SCHEMA + ", token long, est_count long",
    )


def _heavy_verify(cand: DataFrame, sliced: DataFrame, phi_num: int, phi_den: int,
                  key_cols) -> DataFrame:
    """EXACT phi-heavy output from a candidate superset: explode the range
    slices, count ONLY candidate tokens (the inner join bounds the aggregate
    state to <= k tokens per range — the whole point of the MG index at
    scale), keep counts >= phi * n_range in exact integer arithmetic."""
    keys = list(key_cols)
    ex = sliced.select(*keys, "nr",
                       F.explode(F.col("rt").cast("array<long>")).alias("token"))
    return (
        ex.join(cand.select(*keys, "token"), keys + ["token"])
        .groupBy(*keys, "nr", "token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * F.lit(int(phi_den)) >= F.col("nr") * F.lit(int(phi_num)))
        .select(*keys, "token", "cnt")
    )


def range_heavy_hitters(mg_index: DataFrame, corpus: DataFrame, ranges,
                        phi_num: int, phi_den: int, leaf_span: int,
                        deepest: int) -> DataFrame:
    """(doc_id, a, b, token, cnt): the EXACT phi-heavy tokens of each queried
    leaf-window range [a, b) per doc — MG candidates (guaranteed superset,
    range_heavy_candidates) + one exact count over the range slice decides:
    the same sketch-prunes / verification-decides contract as the Bloom
    cascade, so the answer is SQL-oracle-checkable. The verification
    aggregates ONLY candidate (doc, token) pairs (state bounded by k per
    range, not the range's distinct-token count)."""
    cand = range_heavy_candidates(mg_index, ranges, phi_num, phi_den, deepest)
    sliced = _doc_range_slices(corpus, ranges, leaf_span)
    return _heavy_verify(cand, sliced, phi_num, phi_den, _DOC_KEYS)


def _doc_range_slices(corpus: DataFrame, ranges, leaf_span: int) -> DataFrame:
    """(doc_id, a, b, rt, nr): each doc's token slice for every queried
    leaf-window range [a, b) — the shared verification input of the
    exact-from-candidates range queries (heavy hitters, top-k). Ranges are
    deduped and broadcast; docs shorter than a*span drop out (nr = 0)."""
    uniq = list(dict.fromkeys((int(a), int(b)) for a, b in ranges))
    rng = F.broadcast(corpus.sparkSession.createDataFrame(uniq, "a long, b long"))
    span = int(leaf_span)
    return (
        corpus.join(rng)
        .select(
            "doc_id", "a", "b",
            F.expr(f"slice(tokens, a * {span} + 1, (b - a) * {span})").alias("rt"),
            F.expr(
                f"least(size(tokens), b * {span}) - least(size(tokens), a * {span})"
            ).cast("long").alias("nr"),
        )
        .filter(F.col("nr") > 0)
    )


def _bk_merge_auto(flat, counts):
    """merge_blob_groups with (k, seed) read from the first blob (uniform
    per index) — order-free, so eligible for the map-side partial merge."""
    from ..sketches import samplers as bkk

    k, seed = bkk.blob_params(flat[0])
    return bkk.merge_blob_groups(flat, counts, k, seed)


def _bk_range_sample_fn(key_cols):
    from ..sketches import samplers as bkk

    def samp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            merged = _bk_merge_auto(flat, counts)
            toks = bkk.sample_blob_tokens(merged)
            reps = np.asarray([len(t) for t in toks], dtype=np.int64)
            out = pdf[list(key_cols)].loc[pdf.index.repeat(reps)].reset_index(drop=True)
            out["token"] = (np.concatenate(toks) if reps.sum()
                            else np.empty(0, np.int64))
            yield out

    return samp


def range_distinct_sample(bk_index: DataFrame, ranges, deepest: int) -> DataFrame:
    """(doc_id, a, b, token): the EXACT bottom-k distinct-token sample of
    each queried leaf-window range [a, b) per doc — the O(log) covering
    BottomK nodes merge (union, keep k smallest priorities) into the exact
    bottom-k of the range's distinct-token set, so the answer is a
    deterministic VALUE (SQL-oracle-checkable via the bit-exact splitmix64
    twin), not an estimate. The SAMPLE member of the dyadic range family
    (count/distinct/freq/quantile/heavy-hitters/sample). Accepts
    (doc_id, a, b) triples or all-docs (a, b) pairs (shared cover nodes
    broadcast)."""
    return _joined_range_groups(
        bk_index, ranges, deepest, _DOC_KEYS, partial_merge=_bk_merge_auto
    ).mapInPandas(
        _bk_range_sample_fn(_DOC_KEYS), schema=_DOC_KEY_SCHEMA + ", token long"
    )


def global_range_distinct_sample(bk_index: DataFrame, ranges, deepest: int) -> DataFrame:
    """(a, b, token): EXACT bottom-k distinct-token sample of each STREAM
    leaf-window range — global twin of range_distinct_sample (phase-aligned
    partial samplers merged into stream-window nodes, doc boundaries
    invisible; union merges are split-indifferent so partials lose nothing)."""
    return _joined_range_groups(
        bk_index, ranges, deepest, _GLOBAL_KEYS, partial_merge=_bk_merge_auto
    ).mapInPandas(
        _bk_range_sample_fn(_GLOBAL_KEYS), schema=_GLOBAL_KEY_SCHEMA + ", token long"
    )


def global_range_heavy_candidates(mg_index: DataFrame, ranges, phi_num: int,
                                  phi_den: int, deepest: int) -> DataFrame:
    """(a, b, token, est_count): certified heavy-token candidate superset per
    STREAM leaf-window range — global twin of range_heavy_candidates."""
    return _joined_range_groups(mg_index, ranges, deepest, _GLOBAL_KEYS).mapInPandas(
        _mg_range_cand_fn(_GLOBAL_KEYS, phi_num, phi_den),
        schema=_GLOBAL_KEY_SCHEMA + ", token long, est_count long",
    )


def global_range_heavy_hitters(mg_index: DataFrame, corpus: DataFrame, ranges,
                               phi_num: int, phi_den: int, leaf_span: int,
                               deepest: int) -> DataFrame:
    """(a, b, token, cnt): EXACT phi-heavy tokens of each STREAM leaf-window
    range [a, b) — candidates from the global MG index, verified by one
    exact count over the stream slice. The slice never materializes the
    stream: each doc contributes only its overlap with [a*span, b*span)
    (doc_offset arithmetic — corpus must carry with_global_offsets columns),
    and docs outside the range are filtered before the explode."""
    cand = global_range_heavy_candidates(mg_index, ranges, phi_num, phi_den, deepest)
    sliced = _global_range_slices(corpus, ranges, leaf_span)
    return _heavy_verify(cand, sliced, phi_num, phi_den, _GLOBAL_KEYS)


def _global_range_slices(corpus: DataFrame, ranges, leaf_span: int) -> DataFrame:
    """(a, b, nr, rt): each doc's OVERLAP with every queried STREAM
    leaf-window range [a, b) — the global twin of _doc_range_slices. The
    stream never materializes: each doc contributes only its overlap
    (doc_offset arithmetic — corpus must carry with_global_offsets columns)
    and docs outside the range are filtered before any explode. nr = the
    range's total stream-token count, aggregated distributedly and joined
    back on the (tiny) range key."""
    uniq = list(dict.fromkeys((int(a), int(b)) for a, b in ranges))
    rng = F.broadcast(corpus.sparkSession.createDataFrame(uniq, "a long, b long"))
    span = int(leaf_span)
    sliced = (
        corpus.join(rng)
        .select(
            "a", "b", "tokens",
            F.expr(f"greatest(0L, a * {span} - doc_offset)").alias("_lo"),
            F.expr(f"least(cast(size(tokens) as long), b * {span} - doc_offset)")
            .alias("_hi"),
        )
        .filter(F.col("_hi") > F.col("_lo"))
        .select(
            "a", "b",
            F.expr("slice(tokens, cast(_lo + 1 as int), cast(_hi - _lo as int))")
            .alias("rt"),
            (F.col("_hi") - F.col("_lo")).alias("_n_part"),
        )
    )
    nr = sliced.groupBy("a", "b").agg(F.sum("_n_part").alias("nr"))
    return sliced.join(F.broadcast(nr), ["a", "b"]).select("a", "b", "nr", "rt")


# ---------------------------------------------------------------------------
# Certified range TOP-K: the most frequent k_top tokens of a leaf-window
# range, EXACT and self-certifying — merged MG cover nodes give every
# tracked (token, underestimate) plus the residual mass; one exact count
# over the range slice (state bounded by the tracked set, <= k per range)
# then proves the cut: once the k-th exact count strictly exceeds
# resid/(k+1), no untracked token (true count <= resid/(k+1)) can displace
# a reported one, and the order among reported tokens is exact. Uncertifiable
# ranges REFUSE loudly inside the task — never a silently-wrong ranking.
# ---------------------------------------------------------------------------


def _mg_range_tracked_fn(key_cols):
    """Per (range key): merge the O(log) covering MG nodes (one flat
    sum-then-prune call, order-free) and emit EVERY tracked token with its
    underestimate plus the merged summary's residual mass and k+1 — the
    certification inputs for range_topk_tokens. Raises when a non-empty
    range tracks nothing (resid = n: no top-k could ever certify)."""
    from ..sketches import spacesaving as mgk

    def cand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            k = mgk.blob_k(flat[0])
            tracked = mgk.tracked_blobs(mgk.merge_blob_groups(flat, counts, k))
            for keys_, _cnts, n, _resid in tracked:
                if n > 0 and len(keys_) == 0:
                    raise ValueError(
                        "range_topk_tokens: a non-empty range's merged MG "
                        "summary tracks no tokens — nothing is certifiable; "
                        "grow the index k"
                    )
            reps = np.asarray([len(t) for t, _, _, _ in tracked], dtype=np.int64)
            out = pdf[list(key_cols)].loc[pdf.index.repeat(reps)].reset_index(drop=True)
            total = int(reps.sum())
            out["token"] = (np.concatenate([t for t, _, _, _ in tracked])
                            if total else np.empty(0, np.int64))
            out["est_count"] = (np.concatenate([c for _, c, _, _ in tracked])
                                if total else np.empty(0, np.int64))
            out["resid"] = np.repeat(
                np.asarray([r for _, _, _, r in tracked], dtype=np.int64), reps)
            out["kp1"] = np.int64(k + 1)
            yield out

    return cand


_TRACKED_COLS = ", token long, est_count long, resid long, kp1 long"


def _topk_verify(cand: DataFrame, sliced: DataFrame, k_top: int,
                 key_cols) -> DataFrame:
    """EXACT certified top-k from the tracked-candidate superset: explode
    the range slices, count ONLY tracked tokens (the inner join bounds the
    aggregate state to <= k tokens per range), rank by (cnt DESC, token
    ASC) and CERTIFY — all JVM window functions (a per-group Python pass
    here cost ~1 ms x one invocation per (doc, range) group, 10 s at
    sf0.1). With residual mass every reported count must strictly beat
    resid/(k+1) AND the group must fill all k_top ranks (an untracked
    token could occupy a missing rank); violations raise IN the plan
    (raise_error on the kept rows — never a silently wrong ranking). With
    resid == 0 the merged summary is exact, so fewer than k_top rows just
    means the range has fewer distinct tokens. row_number and the group
    count share one window exchange (same partition keys)."""
    keys = list(key_cols)
    k_top = int(k_top)
    ex = sliced.select(*keys, F.explode(F.col("rt").cast("array<long>")).alias("token"))
    counted = (
        ex.join(cand.select(*keys, "token", "resid", "kp1"), keys + ["token"])
        .groupBy(*keys, "token", "resid", "kp1")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("cnt"), F.asc("token"))
    ranked = (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("_gn", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
        .filter(F.col("rank") <= k_top)
    )
    viol = (F.col("resid") > 0) & (
        (F.col("_gn") < k_top)
        | ~(F.col("cnt") * F.col("kp1") > F.col("resid"))
    )
    msg = F.concat(
        F.lit(f"range_topk_tokens cannot certify top-{k_top} for range ("),
        F.concat_ws(", ", *[F.col(c).cast("string") for c in keys]),
        F.lit("): an untracked token (count <= "),
        (F.col("resid") / F.col("kp1")).cast("long").cast("string"),
        F.lit(") could displace a reported one — grow the index k or lower k_top"),
    )
    return ranked.select(
        *keys, "token", "cnt",
        F.when(viol, F.raise_error(msg)).otherwise(F.col("rank")).alias("rank"),
    )


def range_topk_tokens(mg_index: DataFrame, corpus: DataFrame, ranges,
                      k_top: int, leaf_span: int, deepest: int) -> DataFrame:
    """(doc_id, a, b, token, cnt, rank): the EXACT top-``k_top`` most
    frequent tokens of each queried leaf-window range [a, b) per doc,
    (cnt DESC, token ASC) tie-break — certified from the Misra-Gries dyadic
    index: the O(log) covering nodes merge into a summary whose tracked set
    provably contains every token that could rank (untracked counts are
    bounded by resid/(k+1)); one exact count over the range slice decides
    and the certification inequality is checked in exact integer arithmetic,
    REFUSING loudly when the index k is too small to certify. The TOP-K
    member of the dyadic range family (count/distinct/freq/quantile/
    heavy-hitters/sample/top-k)."""
    cand = _joined_range_groups(mg_index, ranges, deepest, _DOC_KEYS).mapInPandas(
        _mg_range_tracked_fn(_DOC_KEYS), schema=_DOC_KEY_SCHEMA + _TRACKED_COLS
    )
    sliced = _doc_range_slices(corpus, ranges, leaf_span)
    return _topk_verify(cand, sliced, k_top, _DOC_KEYS)


def global_range_topk_tokens(mg_index: DataFrame, corpus: DataFrame, ranges,
                             k_top: int, leaf_span: int, deepest: int) -> DataFrame:
    """(a, b, token, cnt, rank): EXACT certified top-k tokens of STREAM
    leaf-window ranges — the global twin of range_topk_tokens (candidates
    from the global MG index, phase-aligned partials across doc boundaries;
    verification counts only each doc's overlap with the range, never a
    stream rescan)."""
    cand = _joined_range_groups(mg_index, ranges, deepest, _GLOBAL_KEYS).mapInPandas(
        _mg_range_tracked_fn(_GLOBAL_KEYS), schema=_GLOBAL_KEY_SCHEMA + _TRACKED_COLS
    )
    sliced = _global_range_slices(corpus, ranges, leaf_span)
    return _topk_verify(cand, sliced, k_top, _GLOBAL_KEYS)


# ---------------------------------------------------------------------------
# PAIR-of-ranges queries — two ranges answered against each other from the
# same dyadic index: cross-range inner product (cs family, the AMS join-size
# estimator between two slices) and bottom-k Jaccard (bk family, KMV set
# similarity). Same O(log)-cover-node contract as the single-range family;
# both sides' covers ride ONE broadcast join and ONE shuffle, tagged by a
# side column so overlapping ranges keep their nodes apart.
# ---------------------------------------------------------------------------


def _pair_nodes_df(spark, pairs, deepest: int):
    """Cover rows for each queried RANGE PAIR ((a1,b1),(a2,b2)) — one row
    per (pair, side, cover node), query-side small (|pairs| * 2 * O(log)),
    broadcast against the index. Pairs are deduped for the same
    double-count reason as _range_nodes_df; when the two ranges overlap,
    their covers may share (level, w_id) nodes — the side column keeps the
    two joined copies apart."""
    uniq = list(dict.fromkeys(
        ((int(p[0][0]), int(p[0][1])), (int(p[1][0]), int(p[1][1]))) for p in pairs))
    rows = [
        (a1, b1, a2, b2, side, L, w)
        for (a1, b1), (a2, b2) in uniq
        for side, (a, b) in ((0, (a1, b1)), (1, (a2, b2)))
        for L, w in dyadic_cover(a, b, deepest)
    ]
    schema = "a1 long, b1 long, a2 long, b2 long, side long, level int, w_id long"
    return spark.createDataFrame(rows, schema)


_DOC_PAIR_KEYS = ("doc_id", "a1", "b1", "a2", "b2")
_DOC_PAIR_SCHEMA = "doc_id string, a1 long, b1 long, a2 long, b2 long"
_GLOBAL_PAIR_KEYS = ("a1", "b1", "a2", "b2")
_GLOBAL_PAIR_SCHEMA = "a1 long, b1 long, a2 long, b2 long"


def _joined_pair_groups(index: DataFrame, pairs, deepest: int, key_cols,
                        partial_merge=None) -> DataFrame:
    """Join the broadcast pair-cover nodes against the index and group per
    (range-pair key), collecting (side, sketch) structs. The doc axis uses
    the all-docs form only: shared nodes broadcast, per-doc fan-out against
    the index's own doc_id column (same never-collect-the-doc-catalog scale
    argument as _joined_range_groups). Map-side partial merges run per
    (key, side), so the shuffle moves at most two partials per key per
    partition."""
    nodes = F.broadcast(_pair_nodes_df(index.sparkSession, pairs, deepest))
    joined = index.join(nodes, ["level", "w_id"])
    if partial_merge is not None:
        side_keys = list(key_cols) + ["side"]
        joined = joined.select(*side_keys, "sketch").mapInPandas(
            _partial_merge_fn(side_keys, partial_merge),
            schema=_key_schema(side_keys) + ", sketch binary",
        )
    return (
        joined.groupBy(*key_cols)
        # deterministic child order (side 0 first) for reproducible bytes
        .agg(F.sort_array(F.collect_list(F.struct("side", "sketch"))).alias("children"))
    )


def _split_pair_children(pdf: pd.DataFrame):
    """Flatten each row's (side, sketch) struct children into per-side flat
    blob lists + per-row counts. Zero counts are legal: a side whose range
    lies wholly beyond the data has no covering node — its frequency vector
    is the zero vector / its distinct set is empty."""
    n = len(pdf)
    a_cnt = np.zeros(n, dtype=np.int64)
    b_cnt = np.zeros(n, dtype=np.int64)
    a_flat: list[bytes] = []
    b_flat: list[bytes] = []
    for i, children in enumerate(pdf["children"]):
        for ch in children:
            if ch["side"] == 0:
                a_flat.append(bytes(ch["sketch"]))
                a_cnt[i] += 1
            else:
                b_flat.append(bytes(ch["sketch"]))
                b_cnt[i] += 1
    return a_flat, a_cnt, b_flat, b_cnt


def _cs_pair_ip_fn(key_cols):
    from ..sketches import cms as cms_kernels

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_flat, a_cnt, b_flat, b_cnt = _split_pair_children(pdf)
            ip = np.zeros(len(pdf), dtype=np.float64)
            both = (a_cnt > 0) & (b_cnt > 0)
            if both.any():
                d, w, s = cms_kernels.blob_params((a_flat if a_flat else b_flat)[0])
                # the cs merge refuses zero-count groups — merge only the
                # present sides, then index back via the nonzero prefix sums
                ma = cms_kernels.cs_merge_blob_groups(a_flat, a_cnt[a_cnt > 0], d, w, s)
                mb = cms_kernels.cs_merge_blob_groups(b_flat, b_cnt[b_cnt > 0], d, w, s)
                a_pos = np.cumsum(a_cnt > 0) - 1
                b_pos = np.cumsum(b_cnt > 0) - 1
                rows = np.flatnonzero(both)
                ip[rows] = cms_kernels.cs_inner_product_blobs(
                    [ma[a_pos[r]] for r in rows], [mb[b_pos[r]] for r in rows])
            out = pdf[list(key_cols)].copy()
            out["est_ip"] = ip
            yield out

    return est


def range_inner_product_estimates(cs_index: DataFrame, pairs, deepest: int) -> DataFrame:
    """(doc_id, a1, b1, a2, b2, est_ip): inner product <f_A, f_B> between
    the token-frequency vectors of two leaf-window ranges A=[a1,b1),
    B=[a2,b2) per doc — the cross-range correlation / equi-join-size query,
    answered from O(log) covering nodes per side instead of the slices
    themselves. Dense path: the AMS sketch-dot estimator (unbiased, error
    O(sqrt(F2_A*F2_B/width)) — sketches.cms.cs_inner_product_blobs); both
    merged range nodes sparse: EXACT, hence SQL-oracle-checkable on
    small-vocab corpora. ``pairs`` = ((a1, b1), (a2, b2)) tuples applied to
    every doc (shared cover nodes broadcast); a doc appears iff either range
    overlaps it — a missing side contributes the zero vector (est_ip 0)."""
    return _joined_pair_groups(
        cs_index, pairs, deepest, _DOC_PAIR_KEYS, partial_merge=_cs_merge_auto
    ).mapInPandas(
        _cs_pair_ip_fn(_DOC_PAIR_KEYS), schema=_DOC_PAIR_SCHEMA + ", est_ip double"
    )


def global_range_inner_product_estimates(cs_index: DataFrame, pairs,
                                         deepest: int) -> DataFrame:
    """Global twin of range_inner_product_estimates: inner product between
    two STREAM leaf-window ranges of the ONE concatenated token stream
    (phase-aligned partial sketches already merged into stream-window nodes
    by the global build — doc boundaries invisible)."""
    return _joined_pair_groups(
        cs_index, pairs, deepest, _GLOBAL_PAIR_KEYS, partial_merge=_cs_merge_auto
    ).mapInPandas(
        _cs_pair_ip_fn(_GLOBAL_PAIR_KEYS), schema=_GLOBAL_PAIR_SCHEMA + ", est_ip double"
    )


def _bk_pair_jac_fn(key_cols):
    from ..sketches import samplers as bkk

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_flat, a_cnt, b_flat, b_cnt = _split_pair_children(pdf)
            k, seed = bkk.blob_params((a_flat if a_flat else b_flat)[0])
            # zero-count groups are legal for the bk merge (empty node out),
            # so each side merges in ONE kernel call over the whole batch
            ma = bkk.merge_blob_groups(a_flat, a_cnt, k, seed)
            mb = bkk.merge_blob_groups(b_flat, b_cnt, k, seed)
            n_sample, n_match, est_j = bkk.jaccard_blobs(ma, mb, k, seed)
            out = pdf[list(key_cols)].copy()
            out["n_sample"] = n_sample
            out["n_match"] = n_match
            out["est_jaccard"] = est_j
            yield out

    return est


def range_jaccard(bk_index: DataFrame, pairs, deepest: int) -> DataFrame:
    """(doc_id, a1, b1, a2, b2, n_sample, n_match, est_jaccard): bottom-k
    (KMV) Jaccard similarity between the DISTINCT-token sets of two
    leaf-window ranges per doc. merged = bottom-k(A ∪ B) is recovered
    losslessly from the two range samples (KMV union mergeability), n_match
    counts its entries present in BOTH sides' samples (sound — see
    sketches.samplers.jaccard_blobs), est_jaccard = n_match / n_sample.
    All three outputs are deterministic VALUES (pure functions of the
    distinct-token sets through the seed-fixed priority hash), so the query
    is SQL-oracle-checkable via the bit-exact splitmix64 twin in EVERY
    regime; the estimate is additionally EXACT whenever n_sample < k.
    ``pairs`` apply to every doc; a doc appears iff either range overlaps
    it (missing side = empty set, est_jaccard 0)."""
    return _joined_pair_groups(
        bk_index, pairs, deepest, _DOC_PAIR_KEYS, partial_merge=_bk_merge_auto
    ).mapInPandas(
        _bk_pair_jac_fn(_DOC_PAIR_KEYS),
        schema=_DOC_PAIR_SCHEMA + ", n_sample long, n_match long, est_jaccard double",
    )


def global_range_jaccard(bk_index: DataFrame, pairs, deepest: int) -> DataFrame:
    """Global twin of range_jaccard: KMV Jaccard between the distinct-token
    sets of two STREAM leaf-window ranges (doc boundaries invisible)."""
    return _joined_pair_groups(
        bk_index, pairs, deepest, _GLOBAL_PAIR_KEYS, partial_merge=_bk_merge_auto
    ).mapInPandas(
        _bk_pair_jac_fn(_GLOBAL_PAIR_KEYS),
        schema=_GLOBAL_PAIR_SCHEMA + ", n_sample long, n_match long, est_jaccard double",
    )


def _hll_pair_setops_fn(key_cols):
    from ..sketches.hll import (
        blob_p,
        blob_seed,
        empty_blob,
        estimate_blobs,
        merge_blob_groups,
    )

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_flat, a_cnt, b_flat, b_cnt = _split_pair_children(pdf)
            first = (a_flat if a_flat else b_flat)[0]
            p, seed = blob_p(first), blob_seed(first)
            n = len(pdf)
            empty = empty_blob(p, seed)

            def side_merge(flat, cnt):
                # a side whose range lies beyond a doc/stream end has ZERO
                # cover nodes: pad those groups with the canonical empty
                # node — the all-dense fast path in merge_blob_groups
                # (base.grouped_reduce) does NOT tolerate zero-count groups
                # (a zero group's start row belongs to its neighbor)
                if not flat:
                    return [empty] * n
                if (cnt == 0).any():
                    bounds = np.cumsum(cnt)
                    starts = bounds - cnt
                    flat = [
                        blob
                        for i in range(n)
                        for blob in (flat[starts[i] : bounds[i]] if cnt[i] else [empty])
                    ]
                    cnt = np.maximum(cnt, 1)
                return merge_blob_groups(flat, cnt, p)

            ma = side_merge(a_flat, a_cnt)
            mb = side_merge(b_flat, b_cnt)
            # union = ONE canonical pairwise merge across the whole batch
            # (register max / sparse set-union — HLL union is lossless in
            # sketch space), so est_union carries the same error envelope
            # as a single-range estimate of A ∪ B
            inter = [blob for pair in zip(ma, mb) for blob in pair]
            mu = merge_blob_groups(inter, np.full(n, 2, dtype=np.int64), p)
            est_a = estimate_blobs(ma, p)
            est_b = estimate_blobs(mb, p)
            est_u = estimate_blobs(mu, p)
            out = pdf[list(key_cols)].copy()
            out["est_a"] = est_a
            out["est_b"] = est_b
            out["est_union"] = est_u
            out["est_intersect"] = np.maximum(0.0, est_a + est_b - est_u)
            yield out

    return est


def range_setops(hll_index: DataFrame, pairs, deepest: int) -> DataFrame:
    """(doc_id, a1, b1, a2, b2, est_a, est_b, est_union, est_intersect):
    SET-OPERATION CARDINALITIES between the distinct-token sets of two
    leaf-window ranges A=[a1,b1), B=[a2,b2) per doc, answered from O(log)
    covering HLL nodes per side. |A| and |B| come from the per-side range
    merges, |A ∪ B| from the pairwise register-max merge (lossless HLL
    union), |A ∩ B| by inclusion-exclusion (max(0, |A|+|B|-|A∪B|) —
    standard HLL intersection; its additive error scales with the UNION's
    1.04/sqrt(2^p) envelope, not the intersection's size). Set differences
    follow as est_a - est_intersect. While every merged node stays
    SPARSE-EXACT (content distinct count <= sparse_max_nnz) all four
    outputs are exact integers, hence SQL-oracle-checkable on small-vocab
    corpora; the dense regime's bounds are enforced in tests. ``pairs`` =
    ((a1, b1), (a2, b2)) applied to every doc (shared cover nodes
    broadcast); a doc appears iff either range overlaps it — a missing
    side is the empty set (est 0). Extends the reference's per-window
    distinct estimate (membership/BloomFilter.java:61-66) to set algebra
    BETWEEN arbitrary hierarchy slices."""
    return _joined_pair_groups(
        hll_index, pairs, deepest, _DOC_PAIR_KEYS, partial_merge=_hll_merge_auto
    ).mapInPandas(
        _hll_pair_setops_fn(_DOC_PAIR_KEYS),
        schema=_DOC_PAIR_SCHEMA
        + ", est_a double, est_b double, est_union double, est_intersect double",
    )


def global_range_setops(hll_index: DataFrame, pairs, deepest: int) -> DataFrame:
    """Global twin of range_setops: set-operation cardinalities between the
    distinct-token sets of two STREAM leaf-window ranges of the ONE
    concatenated token stream (doc boundaries invisible)."""
    return _joined_pair_groups(
        hll_index, pairs, deepest, _GLOBAL_PAIR_KEYS, partial_merge=_hll_merge_auto
    ).mapInPandas(
        _hll_pair_setops_fn(_GLOBAL_PAIR_KEYS),
        schema=_GLOBAL_PAIR_SCHEMA
        + ", est_a double, est_b double, est_union double, est_intersect double",
    )


# ---------------------------------------------------------------------------
# GLOBAL-axis window-sketch indexes: the reference's actual model is ONE
# concatenated token stream (PMIndex/HBI.java insert/report) — stream
# windows cross document boundaries. Docs contribute PARTIAL sketches of
# the stream windows they overlap (leaf kernels' phase argument); partials
# of a window merge exactly (HLL max / CMS add are split-indifferent), then
# the usual dyadic rollup derives every coarser level from sketch rows.
# ---------------------------------------------------------------------------

GLOBAL_SKETCH_SCHEMA = "level int, w_id long, sketch binary"


# max partial windows per kernel call inside the global leaf build: bounds
# the scratch allocation (HLL: slots * 4 KB regs; CMS: slots * depth*width*8)
# while amortizing Python/kernel overhead over ~hundreds of docs per call
_SLOT_CHUNK = 8192


def _global_leaf_partials(corpus: DataFrame, cfg: HbiConfig, slot_blobs) -> DataFrame:
    """Per-doc phase-aligned PARTIAL sketches of the stream windows each doc
    overlaps: (level=deepest, w_id, sketch) rows, possibly several per w_id.

    ``slot_blobs(values, slots, n_slots) -> list[bytes]`` builds the partial
    sketch of every slot in ONE kernel call (sketches.*.partial_blobs_by_slot)
    — the whole Arrow batch of docs is flattened into (token, slot) arrays
    with numpy, so there is no per-doc Python loop in the hot path (the
    per-doc loop made the partials stage scale ~0.6 at 2->8 cores; the
    kernel work itself is embarrassingly parallel). Kernel calls are chunked
    at ~_SLOT_CHUNK partial windows to bound scratch memory.
    Requires ``doc_offset`` (corpus.with_global_offsets)."""
    span = cfg.leaf_span
    deepest = cfg.deepest

    def leaf_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks_list = [np.asarray(t, dtype=np.int64) for t in pdf["tokens"]]
            lens = np.asarray([len(t) for t in toks_list], dtype=np.int64)
            offs = pdf["doc_offset"].to_numpy(dtype=np.int64)
            keep = lens > 0
            if not keep.any():
                continue
            toks_list = [t for t, kp in zip(toks_list, keep) if kp]
            lens, offs = lens[keep], offs[keep]
            first_w = offs // span
            npart = (offs % span + lens + span - 1) // span  # partials per doc
            cum = np.cumsum(npart)
            # chunk docs so each kernel call builds <= ~_SLOT_CHUNK partials
            doc_cuts = [0]
            while doc_cuts[-1] < len(lens):
                lo = doc_cuts[-1]
                target = (cum[lo - 1] if lo else 0) + _SLOT_CHUNK
                hi = max(lo + 1, int(np.searchsorted(cum, target, side="right")))
                doc_cuts.append(hi)
            for lo, hi in zip(doc_cuts[:-1], doc_cuts[1:]):
                sub = toks_list[lo:hi]
                sub_lens, sub_offs = lens[lo:hi], offs[lo:hi]
                sub_first = first_w[lo:hi]
                sub_np = npart[lo:hi]
                cat = np.concatenate(sub)
                doc_idx = np.repeat(np.arange(len(sub)), sub_lens)
                starts = np.cumsum(sub_lens) - sub_lens
                pos = np.arange(cat.size, dtype=np.int64) - starts[doc_idx]
                w = (sub_offs[doc_idx] + pos) // span
                base_slot = np.cumsum(sub_np) - sub_np
                slots = base_slot[doc_idx] + (w - sub_first[doc_idx])
                n_slots = int(sub_np.sum())
                blobs = slot_blobs(cat, slots, n_slots)
                doc_of_slot = np.repeat(np.arange(len(sub)), sub_np)
                w_ids = sub_first[doc_of_slot] + np.arange(n_slots) - base_slot[doc_of_slot]
                yield pd.DataFrame({"level": deepest, "w_id": w_ids, "sketch": blobs})

    # rebalance BEFORE the scan — same trap as _build_global_axis
    # (build.py:282): with_global_offsets leaves doc_id-range partitioning
    # and long-doc sources cluster, serializing the leaf pass
    spark_ctx = corpus.sparkSession.sparkContext
    n_parts = max(spark_ctx.defaultParallelism, corpus.rdd.getNumPartitions())
    balanced = corpus.select("doc_offset", "tokens").repartition(n_parts)
    return balanced.mapInPandas(leaf_build, schema=GLOBAL_SKETCH_SCHEMA)


def _merge_children_fn(merge_groups):
    """mapInPandas stage merging each row's collect_list of child blobs —
    ONE Arrow pass per batch (the merge_global_rows shape)."""

    def merge_children(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat: list[bytes] = []
            counts = np.empty(len(pdf), dtype=np.int64)
            for i, children in enumerate(pdf["children"]):
                counts[i] = len(children)
                flat.extend(bytes(b) for b in children)
            out = pdf[["level", "w_id"]].copy()
            out["sketch"] = merge_groups(flat, counts)
            yield out

    return merge_children


def _build_global_window_sketch_index(corpus: DataFrame, cfg: HbiConfig,
                                      slot_blobs, merge_groups) -> DataFrame:
    """Global-axis twin of _build_window_sketch_index: ONE shuffle total.

    Every parent in the dyadic hierarchy lives inside the same ROOT window
    (w_id >> deepest) as its children, so after the per-doc partials are
    repartitioned BY ROOT, the boundary-window merges and the entire rollup
    to level 0 are partition-local — one repartition of the leaf partials
    replaces the old leaf collect_list shuffle plus one repartition+groupBy
    per level (the staged path shuffled every sketch blob L+1 times; merges
    are commutative, so results are byte-identical for HLL/CMS and
    bound-identical for KLL). mapInPandas batches of one partition are
    accumulated before rolling up (a root's rows must not straddle an Arrow
    batch split); partition bytes stay bounded by the data-sized partition
    count. Same persistence contract (caller unpersists)."""
    return _persisted(_global_window_sketch_plan(corpus, cfg, slot_blobs, merge_groups))


def _global_window_sketch_plan(corpus: DataFrame, cfg: HbiConfig,
                               slot_blobs, merge_groups) -> DataFrame:
    """The lazy global-axis build plan (exposed for plan-shape tests: it
    must contain exactly TWO Exchanges — the token rebalance and the
    root-window repartition of the leaf partials)."""
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    deepest = cfg.deepest
    partials = _global_leaf_partials(corpus, cfg, slot_blobs)
    n_parts = _merge_partitions(partials)

    def local_rollup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        w = pdf["w_id"].to_numpy(dtype=np.int64)
        order = np.argsort(w, kind="stable")
        blobs = [pdf["sketch"].iat[i] for i in order]
        # finish the leaf: merge the (rare) multi-partial boundary windows,
        # pass every single-partial window through untouched
        cur_w, counts = np.unique(w[order], return_counts=True)
        cur_blobs = _merge_sparse(blobs, counts, merge_groups)
        frames = [pd.DataFrame({"level": deepest, "w_id": cur_w, "sketch": cur_blobs})]
        for L in range(deepest - 1, -1, -1):
            pw, counts = np.unique(cur_w >> np.int64(1), return_counts=True)
            cur_blobs = _merge_sparse(cur_blobs, counts, merge_groups)
            cur_w = pw
            frames.append(pd.DataFrame({"level": L, "w_id": cur_w, "sketch": cur_blobs}))
        yield pd.concat(frames, ignore_index=True)

    rooted = partials.repartition(n_parts, F.shiftright(F.col("w_id"), deepest))
    return rooted.mapInPandas(local_rollup, schema=GLOBAL_SKETCH_SCHEMA)


def build_global_hll_window_index(corpus: DataFrame, cfg: HbiConfig, p: int = 12) -> DataFrame:
    """One HLL per (level, STREAM window): distinct tokens of any dyadic
    slice of the concatenated stream, document boundaries invisible.
    Kernels/seed resolved through window_sketch_family (single source)."""
    _s, _m, builder = window_sketch_family(cfg, "hll", p=p)
    return builder(corpus, cfg)


def build_global_cms_window_index(corpus: DataFrame, cfg: HbiConfig,
                                  depth: int = 3, width: int = 256) -> DataFrame:
    """One CMS per (level, STREAM window): token frequencies of any dyadic
    stream slice; totals exact (linear merge of exact partials).
    Kernels/seed resolved through window_sketch_family (single source)."""
    _s, _m, builder = window_sketch_family(cfg, "cms", depth=depth, width=width)
    return builder(corpus, cfg)


def build_global_kll_window_index(corpus: DataFrame, cfg: HbiConfig, k: int = 200) -> DataFrame:
    """One KLL per (level, STREAM window): quantiles of any dyadic slice of
    the concatenated stream, document boundaries invisible. Docs contribute
    phase-aligned PARTIAL KLLs of the stream windows they overlap; partials
    of a window merge into a valid window KLL (merge handles any split),
    with the stream window's EXACT item count. Kernels/seed resolved
    through window_sketch_family (single source)."""
    _s, _m, builder = window_sketch_family(cfg, "kll", k=k)
    return builder(corpus, cfg)


def build_global_mg_window_index(corpus: DataFrame, cfg: HbiConfig, k: int = 32) -> DataFrame:
    """One Misra-Gries summary per (level, STREAM window): certified
    heavy-hitter candidates of any dyadic slice of the concatenated stream,
    document boundaries invisible. Docs contribute phase-aligned PARTIAL
    summaries; a window's partials sum-then-prune into its node (exact
    n_total, association-free undercount bound). Kernels resolved through
    window_sketch_family (single source)."""
    _s, _m, builder = window_sketch_family(cfg, "mg", k=k)
    return builder(corpus, cfg)


def build_global_bk_window_index(corpus: DataFrame, cfg: HbiConfig, k: int = 16) -> DataFrame:
    """One BottomK sampler per (level, STREAM window): the EXACT bottom-k
    distinct sample of any dyadic slice of the concatenated stream, document
    boundaries invisible. Docs contribute phase-aligned PARTIAL samplers;
    union merges are split-indifferent, so every node equals the bottom-k of
    the full stream window. Kernels/seed resolved through
    window_sketch_family (single source)."""
    _s, _m, builder = window_sketch_family(cfg, "bk", k=k)
    return builder(corpus, cfg)


def build_global_cs_window_index(corpus: DataFrame, cfg: HbiConfig,
                                 depth: int = 3, width: int = 256) -> DataFrame:
    """One count-sketch (AMS) node per (level, STREAM window): unbiased
    frequency + second-moment estimates over any dyadic slice of the
    concatenated stream, doc boundaries invisible. Docs contribute
    phase-aligned PARTIAL tables; count-sketch linearity makes every node
    byte-equal to a from-scratch build of the stream window.
    Kernels/seed resolved through window_sketch_family (single source)."""
    _s, _m, builder = window_sketch_family(cfg, "cs", depth=depth, width=width)
    return builder(corpus, cfg)


def global_cs_window_totals(cs_index: DataFrame) -> DataFrame:
    """(level, w_id, n_window) — EXACT stream-window token counts through
    the signed family's header slot (same closed-form oracle as the CMS
    twin)."""
    from ..sketches.cms import window_totals

    return _totals_reader(cs_index, ("level", "w_id"), window_totals,
                          "level int, w_id long, n_window long")


def global_range_f2_estimates(cs_index: DataFrame, ranges, deepest: int) -> DataFrame:
    """(a, b, est_f2) per STREAM leaf-window range — the global twin of
    range_f2_estimates (cover nodes add; AMS median-of-rows; sparse-exact
    ranges are exact)."""
    return _joined_range_groups(
        cs_index, ranges, deepest, _GLOBAL_KEYS, partial_merge=_cs_merge_auto
    ).mapInPandas(
        _cs_range_f2_fn(_GLOBAL_KEYS), schema=_GLOBAL_KEY_SCHEMA + ", est_f2 double"
    )


def global_range_signed_freq_estimates(cs_index: DataFrame, ranges, probe_tokens,
                                       deepest: int) -> DataFrame:
    """(a, b, token, est_count) per STREAM leaf-window range — global twin
    of range_signed_freq_estimates (unbiased; sparse-exact ranges exact)."""
    probes = np.asarray(sorted(int(t) for t in probe_tokens), dtype=np.int64)
    return _joined_range_groups(
        cs_index, ranges, deepest, _GLOBAL_KEYS, partial_merge=_cs_merge_auto
    ).mapInPandas(
        _cs_range_freq_fn(_GLOBAL_KEYS, probes),
        schema=_GLOBAL_KEY_SCHEMA + ", token long, est_count double",
    )


def global_mg_window_totals(mg_index: DataFrame) -> DataFrame:
    """(level, w_id, n_window) — EXACT stream-window item counts from the
    global MG index (merged partials add their exact counts)."""
    from ..sketches.spacesaving import blob_totals

    return _totals_reader(mg_index, ("level", "w_id"), blob_totals,
                          "level int, w_id long, n_window long")


def global_range_quantile_estimates(kll_index: DataFrame, ranges, qs, deepest: int) -> DataFrame:
    """(a, b, q, est) per STREAM leaf-window range and quantile — the
    global twin of range_quantile_estimates (covering KLL nodes merge into
    a valid KLL of the stream slice)."""
    return _joined_range_groups(kll_index, ranges, deepest, _GLOBAL_KEYS).mapInPandas(
        _kll_range_quant_fn(_GLOBAL_KEYS, qs), schema=_GLOBAL_KEY_SCHEMA + ", q double, est double"
    )


def build_global_td_window_index(corpus: DataFrame, cfg: HbiConfig,
                                 delta: float = 100.0) -> DataFrame:
    """One t-digest per (level, STREAM window): quantiles of any dyadic
    slice of the concatenated stream, doc boundaries invisible. Docs
    contribute phase-aligned PARTIAL digests; _compact is an order-free
    pure function of the merged centroid multiset, so leaf nodes are
    byte-equal however the stream splits across docs and every maintenance
    path (append, streaming deltas) reproduces the scratch build byte for
    byte (stronger than the KLL twin's bound-preservation). Kernels
    resolved through window_sketch_family (single source)."""
    _s, _m, builder = window_sketch_family(cfg, "td", delta=delta)
    return builder(corpus, cfg)


def global_range_tdigest_quantiles(td_index: DataFrame, ranges, qs, deepest: int) -> DataFrame:
    """(a, b, q, est) per STREAM leaf-window range and quantile — the global
    twin of range_tdigest_quantiles."""
    return _joined_range_groups(td_index, ranges, deepest, _GLOBAL_KEYS).mapInPandas(
        _td_range_quant_fn(_GLOBAL_KEYS, qs), schema=_GLOBAL_KEY_SCHEMA + ", q double, est double"
    )


def global_range_tdigest_cdf(td_index: DataFrame, ranges, vs, deepest: int) -> DataFrame:
    """(a, b, v, est_cdf) per STREAM leaf-window range and probe value — the
    global twin of range_tdigest_cdf (inverse quantile over the one-stream
    axis, doc boundaries invisible)."""
    return _joined_range_groups(td_index, ranges, deepest, _GLOBAL_KEYS).mapInPandas(
        _td_range_cdf_fn(_GLOBAL_KEYS, vs),
        schema=_GLOBAL_KEY_SCHEMA + ", v double, est_cdf double",
    )


def global_range_rank_counts(cms_index: DataFrame, ranges, vs, deepest: int) -> DataFrame:
    """(a, b, v, rank_le) — EXACT count of stream tokens <= v in each queried
    STREAM leaf-window range, the global twin of range_rank_counts (same
    sparse-only exactness contract; refuses dense range nodes)."""
    return _joined_range_groups(
        cms_index, ranges, deepest, _GLOBAL_KEYS, partial_merge=_cms_merge_auto
    ).mapInPandas(
        _cms_range_rank_fn(_GLOBAL_KEYS, vs),
        schema=_GLOBAL_KEY_SCHEMA + ", v long, rank_le long",
    )


def global_td_window_totals(td_index: DataFrame) -> DataFrame:
    """(level, w_id, n_window) — EXACT stream-window item counts from the
    global t-digest index (merged partials add their exact counts)."""
    from ..sketches.tdigest import blob_totals

    return _totals_reader(td_index, ("level", "w_id"), blob_totals,
                          "level int, w_id long, n_window long")


def global_kll_window_totals(kll_index: DataFrame) -> DataFrame:
    """(level, w_id, n_window) — EXACT stream-window item counts from the
    global KLL index (merged partials add their exact counts)."""
    from ..sketches.kll import blob_totals

    return _totals_reader(kll_index, ("level", "w_id"), blob_totals,
                          "level int, w_id long, n_window long")


def global_cms_window_totals(cms_index: DataFrame) -> DataFrame:
    """(level, w_id, n_window) — EXACT stream-window token counts from the
    global CMS index (the stored total is exact; sparse or dense node)."""
    from ..sketches.cms import window_totals

    return _totals_reader(cms_index, ("level", "w_id"), window_totals,
                          "level int, w_id long, n_window long")


def global_range_distinct_estimates(hll_index: DataFrame, ranges, deepest: int) -> DataFrame:
    """(a, b, est_distinct) per STREAM leaf-window range [a, b) — dyadic
    cover nodes merge into the exact range HLL (doc-axis twin:
    range_distinct_estimates)."""
    return _joined_range_groups(
        hll_index, ranges, deepest, _GLOBAL_KEYS, partial_merge=_hll_merge_auto
    ).mapInPandas(
        _hll_range_est_fn(_GLOBAL_KEYS), schema=_GLOBAL_KEY_SCHEMA + ", est_distinct double"
    )


def global_range_totals(cms_index: DataFrame, ranges, deepest: int) -> DataFrame:
    """(a, b, n_tokens) per STREAM leaf-window range — EXACT (disjoint
    tiling of exact node totals), SQL-oracle-checkable against SUM(n_tok)."""
    return _joined_range_groups(
        cms_index, ranges, deepest, _GLOBAL_KEYS, partial_merge=_cms_merge_auto
    ).mapInPandas(
        _cms_range_tot_fn(_GLOBAL_KEYS), schema=_GLOBAL_KEY_SCHEMA + ", n_tokens long"
    )


def global_range_freq_estimates(cms_index: DataFrame, ranges, probe_tokens, deepest: int) -> DataFrame:
    """(a, b, token, est_count) per STREAM leaf-window range and probe token
    — covering CMS nodes add into the exact range CMS (overestimate-only
    within eps * N_range). Global twin of range_freq_estimates."""
    probes = np.asarray(sorted(int(t) for t in probe_tokens), dtype=np.int64)
    return _joined_range_groups(
        cms_index, ranges, deepest, _GLOBAL_KEYS, partial_merge=_cms_merge_auto
    ).mapInPandas(
        _cms_range_freq_fn(_GLOBAL_KEYS, probes),
        schema=_GLOBAL_KEY_SCHEMA + ", token long, est_count long",
    )


def global_window_append_delta(index: DataFrame, new_docs: DataFrame, cfg: HbiConfig,
                               n_so_far: int, slot_blobs, merge_groups):
    """The DELTA of a stream append to a global window-sketch index:
    per level L, exactly the windows ``w_id >= boundary >> (deepest - L)``
    are (re)written — the re-merged boundary suffix plus every new window —
    and nothing below the cutoff is touched. This is the same version-delta
    contract as the Bloom stream's commits (streaming/incremental.py), so
    delta-per-commit persistence + cutoff-sliced reads work unchanged for
    the sketch family. Returns ``(delta, boundary, frames)`` — delta is the
    union of per-level suffix frames, ``frames`` are the persisted
    intermediates the CALLER unpersists after materializing delta."""
    from pyspark import StorageLevel

    from ..corpus import with_global_offsets

    span = cfg.leaf_span
    deepest = cfg.deepest
    boundary = int(n_so_far) // span

    # ALWAYS recompute the batch's offsets from n_so_far (the sibling Bloom
    # append's contract, streaming/incremental.py:136): trusting a carried
    # doc_offset and shifting it would double-shift the natural
    # "slice of an already-offset corpus" input and silently corrupt windows
    nd = with_global_offsets(new_docs.drop("doc_offset"), start=int(n_so_far))
    new_partials = _global_leaf_partials(nd, cfg, slot_blobs)
    merge_children = _merge_children_fn(merge_groups)

    def merged(children_rows: DataFrame) -> DataFrame:
        return _grouped_merge(children_rows, ("level", "w_id"), merge_children,
                              GLOBAL_SKETCH_SCHEMA, _merge_partitions(children_rows))

    frames = []
    # leaf: the boundary window re-merges its old (complete-so-far) sketch
    # with the new partials; windows below the boundary are untouched
    old_leaf = index.filter(F.col("level") == deepest)
    cur = merged(
        old_leaf.filter(F.col("w_id") >= boundary)
        .select("level", "w_id", "sketch")
        .unionByName(new_partials)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    frames.append(cur)
    for L in range(deepest - 1, -1, -1):
        child_cut = boundary >> (deepest - (L + 1))
        pcut = child_cut // 2
        # children of the recomputed parents: the level-(L+1) delta (all
        # w_id >= child_cut, inductively) plus at most ONE untouched old
        # child per level (the even sibling when child_cut is odd)
        children = (
            index.filter(
                (F.col("level") == L + 1)
                & (F.col("w_id") >= 2 * pcut) & (F.col("w_id") < child_cut)
            )
            .select("level", "w_id", "sketch")
            .unionByName(cur.select("level", "w_id", "sketch"))
        )
        cur = merged(
            children.select(F.lit(L).alias("level"),
                            (F.col("w_id") / 2).cast("long").alias("w_id"), "sketch")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        frames.append(cur)
    delta = frames[0]
    for f in frames[1:]:
        delta = delta.unionByName(f)
    return delta, boundary, frames


def append_increment_global_window(index: DataFrame, new_docs: DataFrame, cfg: HbiConfig,
                                   n_so_far: int, slot_blobs, merge_groups) -> DataFrame:
    """Incremental STREAM append for a global window-sketch index: the new
    batch continues the stream at token position ``n_so_far`` (the EXACT
    token count already indexed — the GlobalStreamState contract of
    streaming/incremental.py). Only the boundary leaf window is re-merged
    and, per coarser level, only the suffix of windows with a touched child
    is recomputed — O(new tokens + log * suffix) sketch rows, never a token
    rescan of old data (see global_window_append_delta). Result is
    byte-equal to a from-scratch build of the concatenated corpus (merges
    are commutative). Returned frame is persisted (caller unpersists), as
    the builders do."""
    from pyspark import StorageLevel

    delta, boundary, frames = global_window_append_delta(
        index, new_docs, cfg, n_so_far, slot_blobs, merge_groups
    )
    deepest = cfg.deepest
    untouched = index.filter(
        F.expr(f"w_id < shiftright(CAST({int(boundary)} AS BIGINT), {deepest} - level)")
    ).select("level", "w_id", "sketch")
    out = untouched.unionByName(delta).persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    for f in frames:
        f.unpersist()
    return out


def append_window_sketch_index(index: DataFrame, new_docs: DataFrame, cfg: HbiConfig,
                               family: str = "cms", **kw) -> DataFrame:
    """Doc-axis incremental append for a window-sketch index: windows are
    per-document, so the new documents' whole trees simply union in —
    insert() at batch granularity, the sketch twin of
    streaming.append_increment. Byte-equal to a full rebuild over old+new
    docs (per-doc builds are independent; zero shuffles).

    The returned frame is persisted and the new-docs build's own cache is
    RELEASED here (the builders persist internally; returning a lazy union
    over that hidden handle would leak it — the caller could never
    unpersist it). Caller owns the final unpersist(), same contract as the
    builders."""
    builders = {
        "cms": build_cms_window_index,
        "hll": build_hll_window_index,
        "kll": build_kll_window_index,
        "td": build_td_window_index,
        "mg": build_mg_window_index,
        "bk": build_bk_window_index,
        "cs": build_cs_window_index,
    }
    if family not in builders:
        raise ValueError(f"unknown window-sketch family {family!r} (cms|hll|kll|td|mg|bk|cs)")
    from pyspark import StorageLevel

    new_idx = builders[family](new_docs, cfg, **kw)
    out = index.unionByName(new_idx).persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    new_idx.unpersist()
    return out


def window_sketch_family(cfg: HbiConfig, family: str, **kw):
    """(slot_blobs, merge_groups, builder) for a global window-sketch
    family — THE single definition point for each family's kernels, seed
    offset and default params. The batch builders (build_global_*), the
    incremental append wrappers (append_global_*) and the Structured
    Streaming maintenance all resolve through here, so every path uses the
    same kernels (and hence the same canonical sparse/dense node
    representation — a seed or width diverging between paths would make
    their partials merge-incompatible). ``kw``: cms -> depth/width,
    hll -> p, kll -> k; unknown options are REJECTED, not ignored."""
    if family == "cms":
        from ..sketches import cms as k

        depth, width = int(kw.pop("depth", 3)), int(kw.pop("width", 256))
        seed = cfg.seed + 11
        slot_blobs = lambda toks, slots, n_slots: k.partial_blobs_by_slot(
            toks, slots, n_slots, depth, width, seed)
        merge_groups = lambda flat, counts: k.merge_blob_groups(
            flat, counts, depth, width, seed)
    elif family == "hll":
        from ..sketches import hll as k

        p = int(kw.pop("p", 12))
        seed = cfg.seed + 7
        slot_blobs = lambda toks, slots, n_slots: k.partial_blobs_by_slot(
            toks, slots, n_slots, p, seed)
        merge_groups = lambda flat, counts: k.merge_blob_groups(flat, counts, p)
    elif family == "kll":
        from ..sketches import kll as k

        kk = int(kw.pop("k", 200))
        seed = cfg.seed + 13
        slot_blobs = lambda toks, slots, n_slots: k.partial_blobs_by_slot(
            toks, slots, n_slots, kk, seed)
        merge_groups = lambda flat, counts: k.merge_blob_groups(flat, counts)
    elif family == "td":
        from ..sketches import tdigest as k

        # t-digest is deterministic (no RNG) and _compact is content-pure —
        # no seed; group merges are order-free byte-deterministic
        delta = float(kw.pop("delta", 100.0))
        slot_blobs = lambda toks, slots, n_slots: k.partial_blobs_by_slot(
            toks, slots, n_slots, delta)
        merge_groups = lambda flat, counts: k.merge_blob_groups(flat, counts, delta)
    elif family == "mg":
        from ..sketches import spacesaving as k

        # Misra-Gries is deterministic (comparison-based, no hashing) — no
        # seed; flat sum-then-prune merges are order-free byte-deterministic
        kk = int(kw.pop("k", 32))
        slot_blobs = lambda toks, slots, n_slots: k.partial_blobs_by_slot(
            toks, slots, n_slots, kk)
        merge_groups = lambda flat, counts: k.merge_blob_groups(flat, counts, kk)
    elif family == "bk":
        from ..sketches import samplers as k

        kk = int(kw.pop("k", 16))
        seed = cfg.seed + 17
        slot_blobs = lambda toks, slots, n_slots: k.partial_blobs_by_slot(
            toks, slots, n_slots, kk, seed)
        merge_groups = lambda flat, counts: k.merge_blob_groups(flat, counts, kk, seed)
    elif family == "cs":
        from ..sketches import cms as k

        depth, width = int(kw.pop("depth", 3)), int(kw.pop("width", 256))
        seed = cfg.seed + 23
        slot_blobs = lambda toks, slots, n_slots: k.cs_partial_blobs_by_slot(
            toks, slots, n_slots, depth, width, seed)
        merge_groups = lambda flat, counts: k.cs_merge_blob_groups(
            flat, counts, depth, width, seed)
    else:
        raise ValueError(f"unknown window-sketch family {family!r} (cms|hll|kll|td|mg|bk|cs)")
    if kw:
        raise ValueError(f"unknown {family} window-sketch options: {sorted(kw)}")

    def builder(corpus: DataFrame, c: HbiConfig) -> DataFrame:
        return _build_global_window_sketch_index(corpus, c, slot_blobs, merge_groups)

    return slot_blobs, merge_groups, builder


def append_global_cms_window_index(index: DataFrame, new_docs: DataFrame, cfg: HbiConfig,
                                   n_so_far: int, depth: int = 3, width: int = 256) -> DataFrame:
    slot_blobs, merge_groups, _b = window_sketch_family(cfg, "cms", depth=depth, width=width)
    return append_increment_global_window(
        index, new_docs, cfg, n_so_far, slot_blobs, merge_groups
    )


def append_global_hll_window_index(index: DataFrame, new_docs: DataFrame, cfg: HbiConfig,
                                   n_so_far: int, p: int = 12) -> DataFrame:
    slot_blobs, merge_groups, _b = window_sketch_family(cfg, "hll", p=p)
    return append_increment_global_window(
        index, new_docs, cfg, n_so_far, slot_blobs, merge_groups
    )


def expire_window_index(index: DataFrame, cfg: HbiConfig, min_leaf_w_id: int) -> DataFrame:
    """Horizon eviction for a GLOBAL window-sketch index: keep only windows
    whose span can still contain leaf windows >= ``min_leaf_w_id`` (per
    level the horizon is min_leaf_w_id >> (deepest - level), exactly the
    Bloom index's expire predicate, sources/io.read_index_expired). A pure
    pushdown-able filter: on a level-partitioned parquet layout coarse
    levels prune whole files. Boundary windows that still overlap the
    horizon are kept whole — eviction granularity is a window, matching the
    reference's whole-tree eviction (PMIndex/HBI.java:209-211)."""
    return index.filter(
        F.expr(f"w_id >= shiftright(CAST({int(min_leaf_w_id)} AS BIGINT), {cfg.deepest} - level)")
    )


# ---------------------------------------------------------------------------
# CERTIFIED EXACT range quantiles / trimmed sums — the KLL index BRACKETS
# the answer, one bounded exact pass DECIDES. The KLL cover-node merge gives
# a value bracket [lo, hi] that contains the true rank-r element whenever
# the published rank bound (+- eps*n) holds; the verification pass counts
# below-bracket mass as ONE collapsed bucket and enumerates only in-bracket
# values (aggregation state ~ O(eps * n_distinct) per range, never the
# range's vocabulary), then reads the exact rank off a cumulative window.
# If the bracket misses, the read lands on a sentinel bucket and the query
# REFUSES loudly inside the plan — the same sketch-prunes /
# verification-decides contract as range_topk_tokens and the Bloom cascade,
# so the answer is a deterministic VALUE, SQL-oracle-checkable.
# ---------------------------------------------------------------------------

# sentinel bucket for above-bracket tokens: far beyond any token value but
# small enough that long window sums over it cannot overflow
_ABOVE_BRACKET = 1 << 62


def _kll_range_bracket_fn(key_cols, qs, rank_eps: float):
    """Per (range key): merge the O(log) covering KLL nodes (exact n,
    bound-preserving ranks) and emit, for each requested quantile q, the
    value bracket [lo, hi] = [quantile(q - rank_eps), quantile(q + rank_eps)]
    (floor/ceil-widened to integers). A PRUNING device only — the exact
    verification decides, and refuses if the bracket missed."""
    from ..sketches.kll import merge_blob_groups, quantile_blobs

    qs = [float(q) for q in qs]
    lo_qs = [max(0.0, q - rank_eps) for q in qs]
    hi_qs = [min(1.0, q + rank_eps) for q in qs]

    def br(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            merged = merge_blob_groups(flat, counts)
            lo = quantile_blobs(merged, lo_qs)
            hi = quantile_blobs(merged, hi_qs)
            out = pdf[list(key_cols)].loc[pdf.index.repeat(len(qs))].reset_index(drop=True)
            out["q"] = np.tile(qs, len(pdf))
            out["lo"] = np.floor(lo).astype(np.int64).ravel()
            out["hi"] = np.ceil(hi).astype(np.int64).ravel()
            yield out

    return br


def _bucketed_counts(bracket: DataFrame, sliced: DataFrame, keys: list,
                     extra_keys: list) -> DataFrame:
    """Shared verification input: explode the range slices, join each
    token to its range's bracket, collapse below-bracket tokens to the -1
    bucket and above-bracket tokens to the _ABOVE_BRACKET sentinel, and
    count per bucket. Aggregation state per (range, q) is bounded by the
    bracket's distinct-value count + 2 — the whole point of bracketing at
    scale (the vocabulary never enters the aggregate)."""
    ex = sliced.select(*keys, F.explode(F.col("rt").cast("array<long>")).alias("token"))
    j = ex.join(bracket, keys)
    bucket = (
        F.when(F.col("token") < F.col("lo"), F.lit(-1).cast("long"))
        .when(F.col("token") > F.col("hi"), F.lit(_ABOVE_BRACKET).cast("long"))
        .otherwise(F.col("token"))
    )
    gkeys = keys + extra_keys
    return (
        j.select(*gkeys, bucket.alias("bucket"))
        .groupBy(*gkeys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _exact_quantile_verify(bracket: DataFrame, sliced: DataFrame, key_cols) -> DataFrame:
    """EXACT quantile from a value bracket: cumulative counts over buckets
    in value order give the exact rank boundaries; the answer is the first
    bucket whose cumulative count reaches r = max(1, ceil(q * n)) (1-based
    rank in ascending order, n = the range's exact token count). Landing on
    a sentinel bucket means the bracket missed the true rank — raise IN the
    plan, never a silently wrong value. The rank read and the group total
    share one window exchange."""
    keys = list(key_cols)
    g = _bucketed_counts(bracket, sliced, keys, ["q"])
    part = Window.partitionBy(*keys, "q")
    wcum = part.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        g.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n", F.sum("cnt").over(part))
        .withColumn("r", F.greatest(F.lit(1).cast("long"),
                                    F.ceil(F.col("q") * F.col("n")).cast("long")))
        .filter(F.col("cum") >= F.col("r"))
        .withColumn("rn", F.row_number().over(part.orderBy("bucket")))
        .filter(F.col("rn") == 1)
    )
    viol = (F.col("bucket") == -1) | (F.col("bucket") == _ABOVE_BRACKET)
    msg = F.concat(
        F.lit("range_exact_quantiles: the KLL bracket missed the true rank for range ("),
        F.concat_ws(", ", *[F.col(c).cast("string") for c in keys]),
        F.lit(") at q="), F.col("q").cast("string"),
        F.lit(" — widen rank_eps (the exact pass refuses rather than report a wrong value)"),
    )
    return ranked.select(
        *keys, "q",
        F.when(viol, F.raise_error(msg)).otherwise(F.col("bucket")).alias("q_value"),
    )


def range_exact_quantiles(kll_index: DataFrame, corpus: DataFrame, ranges, qs,
                          leaf_span: int, deepest: int,
                          rank_eps: float = 0.05) -> DataFrame:
    """(doc_id, a, b, q, q_value): the EXACT q-quantile token value (element
    at 1-based rank max(1, ceil(q*n)) in ascending order) of each queried
    leaf-window range [a, b) per doc — certified from the KLL dyadic index:
    the O(log) covering nodes merge into a valid KLL of the range whose
    (q -+ rank_eps)-quantile estimates bracket the true value under the
    published rank bound (~1.7/k, so the default 0.05 is a ~6x margin at
    k=200); one exact pass over the range slice with below/above-bracket
    mass collapsed to sentinels decides, REFUSING loudly if the bracket
    missed. Extends the exact-from-candidates discipline (heavy hitters,
    top-k) to ORDER STATISTICS: the approximate index yields an exact,
    SQL-oracle-checkable answer. Accepts (doc_id, a, b) triples or all-docs
    (a, b) pairs."""
    bracket = _joined_range_groups(kll_index, ranges, deepest, _DOC_KEYS).mapInPandas(
        _kll_range_bracket_fn(_DOC_KEYS, qs, rank_eps),
        schema=_DOC_KEY_SCHEMA + ", q double, lo long, hi long",
    )
    sliced = _doc_range_slices(corpus, ranges, leaf_span)
    return _exact_quantile_verify(bracket, sliced, _DOC_KEYS)


def global_range_exact_quantiles(kll_index: DataFrame, corpus: DataFrame, ranges,
                                 qs, leaf_span: int, deepest: int,
                                 rank_eps: float = 0.05) -> DataFrame:
    """(a, b, q, q_value): EXACT q-quantile of STREAM leaf-window ranges —
    global twin of range_exact_quantiles (brackets from the global KLL
    index's phase-aligned partials; verification counts only each doc's
    overlap with the range, never a stream rescan)."""
    bracket = _joined_range_groups(kll_index, ranges, deepest, _GLOBAL_KEYS).mapInPandas(
        _kll_range_bracket_fn(_GLOBAL_KEYS, qs, rank_eps),
        schema=_GLOBAL_KEY_SCHEMA + ", q double, lo long, hi long",
    )
    sliced = _global_range_slices(corpus, ranges, leaf_span)
    return _exact_quantile_verify(bracket, sliced, _GLOBAL_KEYS)


def _kll_range_bracket_pair_fn(key_cols, q_lo: float, q_hi: float, rank_eps: float):
    """One bracket per range covering BOTH trim cut points:
    [quantile(q_lo - eps), quantile(q_hi + eps)] — every rank in the kept
    band [r1, r2] falls inside it when the KLL rank bound holds."""
    from ..sketches.kll import merge_blob_groups, quantile_blobs

    lo_q = max(0.0, float(q_lo) - rank_eps)
    hi_q = min(1.0, float(q_hi) + rank_eps)

    def br(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_children(pdf)
            merged = merge_blob_groups(flat, counts)
            est = quantile_blobs(merged, [lo_q, hi_q])
            out = pdf[list(key_cols)].copy().reset_index(drop=True)
            out["lo"] = np.floor(est[:, 0]).astype(np.int64)
            out["hi"] = np.ceil(est[:, 1]).astype(np.int64)
            yield out

    return br


def _trimmed_sum_verify(bracket: DataFrame, sliced: DataFrame, key_cols,
                        q_lo: float, q_hi: float) -> DataFrame:
    """EXACT trimmed sum from a value bracket: keep ranks r1..r2 with
    r1 = floor(q_lo*n)+1 and r2 = floor(q_hi*n) (1-based ascending). Each
    bucket contributes value * |[cum-cnt+1, cum] ∩ [r1, r2]| — exact integer
    arithmetic; a sentinel bucket overlapping the kept band means the
    bracket missed a cut point and the query refuses. Equal values make the
    within-run rank order irrelevant to the sum, so the answer is
    deterministic and SQL-oracle-checkable."""
    keys = list(key_cols)
    g = _bucketed_counts(bracket, sliced, keys, [])
    part = Window.partitionBy(*keys)
    wcum = part.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (
        g.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n", F.sum("cnt").over(part))
        .withColumn("r1", F.floor(F.lit(float(q_lo)) * F.col("n")).cast("long") + 1)
        .withColumn("r2", F.floor(F.lit(float(q_hi)) * F.col("n")).cast("long"))
        .withColumn(
            "ov",
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.col("cum"), F.col("r2"))
                - F.greatest(F.col("cum") - F.col("cnt"), F.col("r1") - 1),
            ),
        )
    )
    sentinel = (F.col("bucket") == -1) | (F.col("bucket") == _ABOVE_BRACKET)
    agg = d.groupBy(*keys).agg(
        F.sum(F.when(sentinel, 0).otherwise(F.col("bucket") * F.col("ov"))).alias("trimmed_sum"),
        F.sum(F.when(sentinel, 0).otherwise(F.col("ov"))).alias("n_kept"),
        F.max(F.when(sentinel & (F.col("ov") > 0), 1).otherwise(0)).alias("_bad"),
    )
    msg = F.concat(
        F.lit("range_trimmed_sum: the KLL bracket missed a trim cut for range ("),
        F.concat_ws(", ", *[F.col(c).cast("string") for c in keys]),
        F.lit(") — widen rank_eps (the exact pass refuses rather than report a wrong sum)"),
    )
    # refusal must win over the empty-band omission: a fully-missed bracket
    # gives n_kept = 0 AND _bad = 1 — filter on n_kept alone would silently
    # drop the row before the raise projects (caught by
    # test_exact_quantile_bracket_miss_refuses)
    return (
        agg.filter((F.col("n_kept") > 0) | (F.col("_bad") == 1))
        .select(
            *keys,
            F.when(F.col("_bad") == 1, F.raise_error(msg))
            .otherwise(F.col("trimmed_sum")).alias("trimmed_sum"),
            "n_kept",
        )
    )


def range_trimmed_sum(kll_index: DataFrame, corpus: DataFrame, ranges,
                      q_lo: float, q_hi: float, leaf_span: int, deepest: int,
                      rank_eps: float = 0.05) -> DataFrame:
    """(doc_id, a, b, trimmed_sum, n_kept): the EXACT sum (and count) of the
    tokens ranked in (q_lo*n, q_hi*n] — ascending 1-based ranks
    floor(q_lo*n)+1 .. floor(q_hi*n) — of each queried leaf-window range
    per doc: the robust-statistics member of the dyadic range family
    (trimmed mean = trimmed_sum / n_kept). The KLL cover-node merge brackets
    both trim cut points; one exact pass with out-of-bracket mass collapsed
    to sentinel buckets computes the banded sum in pure integer arithmetic,
    refusing loudly if a cut point escaped the bracket. Ranges whose kept
    band is empty (n too small) are omitted. Accepts (doc_id, a, b) triples
    or all-docs (a, b) pairs."""
    if not (0.0 <= q_lo < q_hi <= 1.0):
        raise ValueError(f"require 0 <= q_lo < q_hi <= 1, got ({q_lo}, {q_hi})")
    bracket = _joined_range_groups(kll_index, ranges, deepest, _DOC_KEYS).mapInPandas(
        _kll_range_bracket_pair_fn(_DOC_KEYS, q_lo, q_hi, rank_eps),
        schema=_DOC_KEY_SCHEMA + ", lo long, hi long",
    )
    sliced = _doc_range_slices(corpus, ranges, leaf_span)
    return _trimmed_sum_verify(bracket, sliced, _DOC_KEYS, q_lo, q_hi)


def global_range_trimmed_sum(kll_index: DataFrame, corpus: DataFrame, ranges,
                             q_lo: float, q_hi: float, leaf_span: int,
                             deepest: int, rank_eps: float = 0.05) -> DataFrame:
    """(a, b, trimmed_sum, n_kept): EXACT trimmed sum of STREAM leaf-window
    ranges — global twin of range_trimmed_sum (brackets from the global KLL
    index; verification touches only each doc's overlap with the range)."""
    if not (0.0 <= q_lo < q_hi <= 1.0):
        raise ValueError(f"require 0 <= q_lo < q_hi <= 1, got ({q_lo}, {q_hi})")
    bracket = _joined_range_groups(kll_index, ranges, deepest, _GLOBAL_KEYS).mapInPandas(
        _kll_range_bracket_pair_fn(_GLOBAL_KEYS, q_lo, q_hi, rank_eps),
        schema=_GLOBAL_KEY_SCHEMA + ", lo long, hi long",
    )
    sliced = _global_range_slices(corpus, ranges, leaf_span)
    return _trimmed_sum_verify(bracket, sliced, _GLOBAL_KEYS, q_lo, q_hi)


def takedown_global_window_sketch_index(index: DataFrame, removed_docs: DataFrame,
                                        cfg: HbiConfig, family: str = "cms",
                                        **kw) -> DataFrame:
    """CONTENT TAKEDOWN on a GLOBAL window-sketch index WITHOUT a rebuild —
    the removal story the doc-axis takedown (sources/io doc-sharded layout)
    cannot give the one-stream axis, because stream windows mix documents.
    Only the LINEAR families admit it (cms: table(a+b) = table(a)+table(b);
    cs: signed twin) — hll/kll/mg/bk/td merges are not invertible and
    refuse.

    Semantics: the stream GEOMETRY is retained — windows keep their ids and
    every surviving doc its offset; the removed docs' tokens simply leave
    every node that counted them (what a legal takedown needs at 10^12
    tokens: the content becomes unfindable without re-offsetting the
    stream). ``removed_docs`` MUST carry its BUILD-TIME ``doc_offset``
    column — recomputing offsets on the filtered frame would land the
    negative partials in the wrong windows, so a missing column refuses.

    Shape: build a NEGATIVE index over only the removed docs (same
    one-shuffle build as any global increment — touched windows only),
    LEFT-join it onto the index on (level, w_id), subtract node-wise in one
    Arrow pass, drop emptied nodes. Representation after subtraction:
    sparse nodes stay BYTE-EQUAL to a scratch build over the surviving
    content; dense nodes stay dense even when the survivor re-enters the
    sparse range (pairs are unrecoverable from a table) — content-equal to
    densify(scratch), which the parity test pins node by node."""
    if family not in ("cms", "cs"):
        raise ValueError(
            f"takedown_global_window_sketch_index: only the LINEAR families "
            f"(cms, cs) support removal, got {family!r}")
    if "doc_offset" not in removed_docs.columns:
        raise ValueError(
            "takedown_global_window_sketch_index: removed_docs must carry its "
            "BUILD-TIME doc_offset column (recomputed offsets would subtract "
            "from the wrong windows)")
    from ..sketches import cms as cmsk

    slot_blobs, merge_groups, _b = window_sketch_family(cfg, family, **kw)
    neg = _global_window_sketch_plan(removed_docs, cfg, slot_blobs, merge_groups)
    sub = cmsk.cs_subtract_blobs if family == "cs" else cmsk.subtract_blobs
    joined = index.join(
        neg.select("level", "w_id", F.col("sketch").alias("_neg")),
        ["level", "w_id"], "left",
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sk = [bytes(b) for b in pdf["sketch"]]
            negs = list(pdf["_neg"])
            touched = [i for i, nb in enumerate(negs) if nb is not None]
            if touched:
                d, w, s = cmsk.blob_params(sk[touched[0]])
                subbed = sub([sk[i] for i in touched],
                             [bytes(negs[i]) for i in touched], d, w, s)
                for i, nb in zip(touched, subbed):
                    sk[i] = nb
            keep = np.flatnonzero(cmsk.window_totals(sk) > 0)
            out = pdf.iloc[keep][["level", "w_id"]].reset_index(drop=True)
            out["sketch"] = [sk[i] for i in keep]
            yield out

    return joined.mapInPandas(fn, schema=GLOBAL_SKETCH_SCHEMA)
