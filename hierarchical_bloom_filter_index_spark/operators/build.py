"""Hierarchical Bloom index build — the rebuild of insert/append/createTree
(PMIndex/HBI.java:215-267, tree/ImplicitTree.java:56-76) as a vectorized
Spark pipeline.

Output: the **sketch table** — one row per (doc_id?, level, w_id) holding a
serialized Bloom filter over that dyadic window's tokens (or n-gram ids),
plus metadata (n_items, bits_set, fill FPR feed the cost model, mirroring
membership/BloomFilter.java:52-66).

Scale design (the part that must survive 100 TB):

* axis='doc' (per-document windows): every document's tokens live in ONE
  corpus row, so every (doc, level, w) filter is built by exactly one task —
  the build is a single mapInPandas pass with **zero shuffle**. All hashing
  and bit-setting is batched numpy across every window in the Arrow batch at
  once (one bitwise_or.at per level per batch, not per window).
* axis='global' (one token stream, reference parity): windows cross document
  boundaries, so partials are merged per (level, w_id) via
  groupBy().applyInPandas (two-phase partial+final). Because documents are
  range-partitioned by doc order first, a window's partials land in at most
  two partitions — the shuffle moves ~|sketch table| bytes, not ~|data|.

Filters at one level share (m, k, seed), so probing N windows for T pattern
tokens is one vectorized gather, and level L-1 could be OR-rolled-up from
level L children — we still build all levels in one data pass because the
pass is token-bound, not level-bound (levels only add hashing, no extra scan).

Task-retry determinism (SURVEY §7.4): every stage here is a pure function of
its input partition — a retried task recomputes identical sketch rows and
Spark's shuffle/commit protocol replaces (never duplicates) its output, so
speculative execution and retries cannot double-count. The only stateful
writes are the checkpointed shards in sources/io.py, which are atomic per
shard and idempotent by lineage marker.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import HbiConfig
from ..sketches.bloom import BloomFilter, design
from ..sketches.hashing import pack_ngrams_u64, popcount_u64

DOC_INDEX_SCHEMA = "doc_id string, level int, w_id long, bloom binary, n_items long, bits_set long"
GLOBAL_INDEX_SCHEMA = "level int, w_id long, bloom binary, n_items long, bits_set long"


def level_params(cfg: HbiConfig) -> dict[int, tuple[int, int]]:
    """(m, k) per level; seed depends on (cfg.seed, level) so levels are
    independent hash families but all filters within a level are mergeable.

    uniform_bloom: one shared (m,k) sized for cfg.uniform_level's capacity —
    parents become OR-mergeable from children (build_index_rollup). Designed
    at level 0 every level keeps its FPR (leaves overspend memory); designed
    at the deepest level blobs are leaf-sized (cheap rollup, coarse levels
    saturate and just stop pruning)."""
    if cfg.uniform_bloom:
        L0 = min(max(cfg.uniform_level, 0), cfg.deepest)
        m, k = design(cfg.bloom_capacity(L0), cfg.fpr)
        return {L: (m, k) for L in cfg.levels}
    return {L: design(cfg.bloom_capacity(L), cfg.fpr) for L in cfg.levels}


def level_seed(cfg: HbiConfig, level: int) -> int:
    """All levels share one hash family: each key is hashed ONCE per batch
    and every level derives its bit positions from the same (h1, h2) pair
    (different modulus per level). Per-filter FPR is unchanged — only a weak
    cross-level FP correlation appears, which the exact verification absorbs
    (sketches cost, never answers)."""
    return cfg.seed * 1_000_003


def _batch_keys(
    tokens_list, cfg: HbiConfig, apply_stride: bool = True, max_starts=None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a batch of token arrays into (doc_idx, pos, key) numpy arrays.

    Keys are raw tokens (ngram=1) or packed n-gram ids; pos is the position
    of the key's FIRST symbol (n-gram i covers positions [i, i+n-1], we index
    it at i — matching the reference's n-gram-at-position semantics,
    search/Pattern.java:29-45). ``max_starts[i]`` caps key starts for row i
    (global axis feeds stitched arrays whose tail belongs to the next doc).
    """
    doc_idx_parts, pos_parts, key_parts = [], [], []
    for i, toks in enumerate(tokens_list):
        arr = np.asarray(toks, dtype=np.int64)
        if cfg.ngram == 1:
            keys = arr.astype(np.uint64)
        else:
            keys = pack_ngrams_u64(arr, cfg.ngram, cfg.ngram_base_bits)
        if max_starts is not None:
            keys = keys[: int(max_starts[i])]
        if len(keys) == 0:
            continue
        pos = np.arange(len(keys), dtype=np.int64)
        if cfg.stride > 1 and apply_stride:
            # strided indexing: keep n-grams starting at positions = 0 mod
            # stride — the reference's every-n-th-n-gram key-space reduction
            # (PMIndex/HBI.java:45,421). Positions stay TRUE positions so
            # window ids remain correct.
            keys = keys[:: cfg.stride]
            pos = pos[:: cfg.stride]
        doc_idx_parts.append(np.full(len(keys), i, dtype=np.int64))
        pos_parts.append(pos)
        key_parts.append(keys)
    if not key_parts:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=np.uint64)
    return np.concatenate(doc_idx_parts), np.concatenate(pos_parts), np.concatenate(key_parts)


def _build_level_filters(
    group_ids: np.ndarray,
    n_groups: int,
    keys: np.ndarray,
    m: int,
    k: int,
    seed: int,
    hashes: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Build n_groups Bloom filters at once: one vectorized scatter.

    ``hashes``: optional precomputed (h1, h2) for the keys — levels share the
    hash family, so the caller hashes each key once per batch.
    Returns (words matrix (n_groups, n_words) uint64, n_items per group).
    """
    proto = BloomFilter(m, k, seed)
    n_words = len(proto.words)
    big = np.zeros(n_groups * n_words, dtype=np.uint64)
    # Chunked scatter: combine duplicate (group, word) updates with one sort +
    # bitwise_or.reduceat per chunk — buffered vectorized ops throughout
    # (ufunc.at's unbuffered scatter is ~10x slower on this access pattern).
    # Chunking keeps scratch allocations small so the allocator reuses pages
    # instead of faulting fresh ones every batch (first-touch page faults are
    # very expensive in VM sandboxes and on fresh executors).
    chunk = max(1, 262_144 // max(1, k))
    for s in range(0, len(keys), chunk):
        sl = slice(s, s + chunk)
        if hashes is not None:
            flat = proto.positions_from_hashes(hashes[0][sl], hashes[1][sl]).ravel()
        else:
            flat = proto._positions(keys[sl]).ravel()
        lin = (
            np.repeat(group_ids[sl].astype(np.int64), k) * n_words
            + (flat >> np.uint64(6)).astype(np.int64)
        )
        masks = np.uint64(1) << (flat & np.uint64(63))
        order = np.argsort(lin, kind="stable")
        lin_s = lin[order]
        starts = np.flatnonzero(np.concatenate(([True], lin_s[1:] != lin_s[:-1])))
        np.bitwise_or.at(big, lin_s[starts], np.bitwise_or.reduceat(masks[order], starts))
    n_items = np.bincount(group_ids, minlength=n_groups)
    return big.reshape(n_groups, n_words), n_items


def _monotone_groups(composite: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(unique values, group ids) for a NON-DECREASING array — O(n) boundary
    detection instead of np.unique's O(n log n) sort. Window ids are
    monotone within each doc and docs are emitted in batch order, so both
    axes' composites qualify."""
    if len(composite) == 0:
        return composite, np.empty(0, dtype=np.int64)
    changed = composite[1:] != composite[:-1]
    uniq = composite[np.flatnonzero(np.concatenate(([True], changed)))]
    group_ids = np.cumsum(np.concatenate(([0], changed.astype(np.int64))))
    return uniq, group_ids


def build_index(corpus: DataFrame, cfg: HbiConfig) -> DataFrame:
    """Build the hierarchical sketch table from a corpus DataFrame."""
    if cfg.axis == "doc":
        return _build_doc_axis(corpus, cfg)
    return _build_global_axis(corpus, cfg)


def _build_doc_axis(corpus: DataFrame, cfg: HbiConfig, levels: list[int] | None = None) -> DataFrame:
    params = level_params(cfg)
    levels = cfg.levels if levels is None else levels
    spans = {L: cfg.span(L) for L in levels}
    seeds = {L: level_seed(cfg, L) for L in levels}

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids = pdf["doc_id"].to_numpy()
            doc_idx, pos, keys = _batch_keys(pdf["tokens"], cfg)
            if len(keys) == 0:
                continue
            shared_hashes = BloomFilter(8, 1, seeds[levels[0]])._hashes(keys)
            out_doc, out_level, out_w, out_blob, out_n, out_bits = [], [], [], [], [], []
            for L in levels:
                m, k = params[L]
                w = pos >> np.uint64(int(np.log2(spans[L])))
                composite = doc_idx * (1 << 40) + w  # doc-local windows: w < 2^40
                uniq, group_ids = _monotone_groups(composite)
                words, n_items = _build_level_filters(
                    group_ids, len(uniq), keys, m, k, seeds[L], hashes=shared_hashes
                )
                u_doc = (uniq >> 40).astype(np.int64)
                u_w = (uniq & ((1 << 40) - 1)).astype(np.int64)
                for g in range(len(uniq)):
                    bf = BloomFilter(m, k, seeds[L], words[g], int(n_items[g]))
                    out_doc.append(doc_ids[u_doc[g]])
                    out_level.append(L)
                    out_w.append(int(u_w[g]))
                    out_blob.append(bf.to_bytes())
                    out_n.append(int(n_items[g]))
                    out_bits.append(popcount_u64(words[g]))
            yield pd.DataFrame(
                {"doc_id": out_doc, "level": out_level, "w_id": out_w,
                 "bloom": out_blob, "n_items": out_n, "bits_set": out_bits}
            )

    return corpus.mapInPandas(build, schema=DOC_INDEX_SCHEMA)


def _build_global_axis(corpus: DataFrame, cfg: HbiConfig, levels: list[int] | None = None) -> DataFrame:
    """Global stream axis: requires doc_offset (see corpus.with_global_offsets).

    For n-gram keys the stream has no document boundaries, so each doc is
    stitched with the next (n-1) tokens of the FOLLOWING stream — accumulated
    across multiple successor docs when they are shorter than n-1
    (corpus.stitch_stream_tail) — before n-gramming: every global n-gram
    (including boundary-crossing ones) is indexed exactly once, at its true
    global start. Striding is applied on GLOBAL positions."""
    return merge_global_rows(_global_axis_partials(corpus, cfg, levels))


def _global_axis_partials(corpus: DataFrame, cfg: HbiConfig,
                          levels: list[int] | None = None) -> DataFrame:
    """Raw per-partition PARTIAL rows of the global index (several rows per
    (level, w_id) where a window straddles a partition/doc boundary) —
    _build_global_axis merges them; build_index_rollup repartitions the leaf
    partials by ROOT window and merges + rolls up locally instead."""
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    if cfg.ngram > 1:
        from ..corpus import stitch_stream_tail

        corpus = stitch_stream_tail(corpus, cfg.ngram - 1, out_col="tokens",
                                    min_doc_tokens=cfg.min_doc_tokens)
    params = level_params(cfg)
    levels = cfg.levels if levels is None else levels
    spans = {L: cfg.span(L) for L in levels}
    seeds = {L: level_seed(cfg, L) for L in levels}

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            offsets = pdf["doc_offset"].to_numpy()
            # stride applies to GLOBAL positions, selected after offsetting;
            # key starts are capped at n_tok (stitched tails belong to the
            # next doc, which indexes them itself)
            doc_idx, pos, keys = _batch_keys(
                pdf["tokens"], cfg, apply_stride=False, max_starts=pdf["n_tok"].to_numpy()
            )
            if len(keys) == 0:
                continue
            gpos = (offsets[doc_idx] + pos).astype(np.uint64)
            if cfg.stride > 1:
                sel = (gpos % np.uint64(cfg.stride)) == 0
                gpos, keys = gpos[sel], keys[sel]
                if len(keys) == 0:
                    continue
            shared_hashes = BloomFilter(8, 1, seeds[levels[0]])._hashes(keys)
            out = {c: [] for c in ("level", "w_id", "bloom", "n_items", "bits_set")}
            for L in levels:
                m, k = params[L]
                w = (gpos >> np.uint64(int(np.log2(spans[L])))).astype(np.int64)
                uniq, group_ids = _monotone_groups(w)
                words, n_items = _build_level_filters(
                    group_ids, len(uniq), keys, m, k, seeds[L], hashes=shared_hashes
                )
                for g in range(len(uniq)):
                    bf = BloomFilter(m, k, seeds[L], words[g], int(n_items[g]))
                    out["level"].append(L)
                    out["w_id"].append(int(uniq[g]))
                    out["bloom"].append(bf.to_bytes())
                    out["n_items"].append(int(n_items[g]))
                    out["bits_set"].append(popcount_u64(words[g]))
            yield pd.DataFrame(out)

    # Rebalance BEFORE the scan: with_global_offsets leaves the corpus
    # partitioned by doc_id-range buckets, and long-doc sources cluster in
    # contiguous doc_id ranges — one partition was holding ~80% of the
    # TOKENS, serializing the whole build (measured: no 2->8 core speedup).
    # Round-robin rows rebalance tokens by CLT; the merge stage is already
    # indifferent to row layout (any split of a window's key instances ORs
    # to the same filter), partials just gain a few per-doc boundary rows.
    # Column pruning keeps the rebalance shuffle to the three used columns.
    spark_ctx = corpus.sparkSession.sparkContext
    n_parts = max(spark_ctx.defaultParallelism, corpus.rdd.getNumPartitions())
    balanced = corpus.select("doc_offset", "n_tok", "tokens").repartition(n_parts)
    return balanced.mapInPandas(partials, schema=GLOBAL_INDEX_SCHEMA)


def merge_global_rows(rows: DataFrame) -> DataFrame:
    """OR-merge global sketch rows sharing (level, w_id) — order-independent
    and byte-exact (Bloom merge law), so partial tables from different passes
    (partition partials, incremental appends) combine into exactly the rows a
    from-scratch build would produce.

    Only windows straddling a partition (or old/new-batch) boundary have >1
    partial — a vanishing fraction. The aggregation is one JVM shuffle with
    map-side combine (collect_list), then ONE vectorized Arrow stage merges
    each group: singletons pass their blob through unparsed, straddlers are
    OR-merged. (Two earlier formulations were worse: applyInPandas-per-group
    paid a pandas round-trip for every one of the ~|windows| groups and was
    ~10x slower end-to-end; splitting singletons from straddlers with two
    filters on the UNCACHED aggregate evaluated it in two separate jobs,
    whose AQE-coalesced partitioning — and hence per-window partial COUNTS —
    could differ, silently dropping or duplicating windows. Everything after
    the shuffle now happens in one pass of one job.)"""
    agg = rows.groupBy("level", "w_id").agg(
        F.collect_list("bloom").alias("_blooms"),
        F.collect_list("n_items").alias("_ni"),
        F.collect_list("bits_set").alias("_bs"),
    )

    def or_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {c: [] for c in ("level", "w_id", "bloom", "n_items", "bits_set")}
            for lvl, wid, blooms, ni, bs in zip(
                pdf["level"], pdf["w_id"], pdf["_blooms"], pdf["_ni"], pdf["_bs"]
            ):
                out["level"].append(lvl)
                out["w_id"].append(wid)
                if len(blooms) == 1:  # untouched window: no parse, no re-pack
                    out["bloom"].append(bytes(blooms[0]))
                    out["n_items"].append(ni[0])
                    out["bits_set"].append(bs[0])
                    continue
                acc = BloomFilter.from_bytes(blooms[0])
                for b in blooms[1:]:
                    acc = acc.merge(BloomFilter.from_bytes(b))
                out["bloom"].append(acc.to_bytes())
                out["n_items"].append(acc.n_added)
                out["bits_set"].append(acc.bits_set())
            yield pd.DataFrame(out)

    return agg.mapInPandas(or_merge, schema=GLOBAL_INDEX_SCHEMA)


def _or_rollup_frames(hi: np.ndarray, w: np.ndarray, words: np.ndarray, n: np.ndarray,
                      deepest: int, emit) -> list[pd.DataFrame]:
    """Shared local OR-rollup: given LEAF filters sorted by (hi, w) — ``hi``
    is the grouping prefix (doc index on the doc axis, all-zeros on the
    global axis) that halving must never cross — derive every coarser level
    with one bitwise_or.reduceat per level. ``emit(L, hi, w, words,
    n_items)`` renders a level's rows (axis-specific columns)."""
    frames = [emit(deepest, hi, w, words, n)]
    for L in range(deepest - 1, -1, -1):
        w2 = w >> np.int64(1)
        key = hi * np.int64(1 << 40) + w2
        starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        words = np.bitwise_or.reduceat(words, starts, axis=0)
        n = np.add.reduceat(n, starts)
        hi, w = hi[starts], w2[starts]
        frames.append(emit(L, hi, w, words, n))
    return frames


def build_index_rollup(corpus: DataFrame, cfg: HbiConfig) -> DataFrame:
    """Single-pass hierarchical build: ONE data pass builds only the leaf
    level; every coarser level is OR-rolled-up from its two children
    (the dyadic hierarchy IS a rollup, SURVEY §2.7 /
    tree/TreeLayout.java:21-35). Requires cfg.uniform_bloom: parents can only
    OR children when every level shares (m, k) (and the hash family, which
    all levels share already).

    Byte-equal to build_index under the same config (merge-law: a parent
    window's scratch filter inserts exactly the union of its children's key
    instances). Every parent lives in the same ROOT window as its children,
    so the rollup is LOCAL: the doc axis derives a doc's whole tree inside
    the leaf mapInPandas (zero shuffles); the global axis repartitions the
    leaf partials by w_id >> deepest once and merges + rolls up partition-
    locally (one shuffle — the staged path paid the partial merge plus one
    exchange per level). At 100 TB: one token scan, one (or zero) sketch-row
    shuffles, log-depth reduceat passes in memory.

    The returned index is PERSISTED — call ``unpersist()`` when done.
    """
    if not cfg.uniform_bloom:
        raise ValueError("build_index_rollup requires uniform_bloom=True "
                         "(parent = OR(children) needs one shared (m, k))")
    from pyspark import StorageLevel

    out = (
        _build_doc_axis_rollup(corpus, cfg)
        if cfg.axis == "doc"
        else _build_global_axis_rollup(corpus, cfg)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    return out


def _build_doc_axis_rollup(corpus: DataFrame, cfg: HbiConfig) -> DataFrame:
    deepest = cfg.deepest
    m, k = level_params(cfg)[deepest]
    seed = level_seed(cfg, deepest)
    shift = int(np.log2(cfg.span(deepest)))
    mask = np.int64((1 << 40) - 1)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids = pdf["doc_id"].to_numpy()
            doc_idx, pos, keys = _batch_keys(pdf["tokens"], cfg)
            if len(keys) == 0:
                continue
            w = (pos >> np.uint64(shift)).astype(np.int64)
            composite = doc_idx * (1 << 40) + w  # doc-local windows: w < 2^40
            uniq, gids = _monotone_groups(composite)
            words, n_items = _build_level_filters(gids, len(uniq), keys, m, k, seed)

            def emit(L, hi, ww, wmat, n):
                return pd.DataFrame({
                    "doc_id": doc_ids[hi],
                    "level": L,
                    "w_id": ww,
                    "bloom": [BloomFilter(m, k, seed, wmat[g], int(n[g])).to_bytes()
                              for g in range(len(ww))],
                    "n_items": n.astype("int64"),
                    "bits_set": [popcount_u64(wmat[g]) for g in range(len(ww))],
                })

            frames = _or_rollup_frames(
                (uniq >> np.int64(40)).astype(np.int64), uniq & mask,
                words, n_items, deepest, emit,
            )
            yield pd.concat(frames, ignore_index=True)

    return corpus.select("doc_id", "tokens").mapInPandas(build, schema=DOC_INDEX_SCHEMA)


def _build_global_axis_rollup(corpus: DataFrame, cfg: HbiConfig) -> DataFrame:
    from .probe import words_matrix
    from .rollup import _merge_partitions

    deepest = cfg.deepest

    partials = _global_axis_partials(corpus, cfg, levels=[deepest])
    n_parts = _merge_partitions(partials)
    rooted = partials.repartition(n_parts, F.shiftright(F.col("w_id"), deepest))

    def local_rollup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        w = pdf["w_id"].to_numpy(dtype=np.int64)
        order = np.argsort(w, kind="stable")
        blobs = [bytes(pdf["bloom"].iat[i]) for i in order]
        n_in = pdf["n_items"].to_numpy(dtype=np.int64)[order]
        w = w[order]
        words, proto = words_matrix(blobs)
        # finish the leaf: OR the (rare) straddling partials per w_id
        starts = np.flatnonzero(np.concatenate(([True], w[1:] != w[:-1])))
        cur_words = np.bitwise_or.reduceat(words, starts, axis=0)
        cur_n = np.add.reduceat(n_in, starts)
        cur_w = w[starts]

        def emit(L, _hi, ww, wmat, n):
            return pd.DataFrame({
                "level": L,
                "w_id": ww,
                "bloom": [BloomFilter(proto.m, proto.k, proto.seed, wmat[g], int(n[g])).to_bytes()
                          for g in range(len(ww))],
                "n_items": n.astype("int64"),
                "bits_set": [popcount_u64(wmat[g]) for g in range(len(ww))],
            })

        hi0 = np.zeros(len(cur_w), dtype=np.int64)
        yield pd.concat(_or_rollup_frames(hi0, cur_w, cur_words, cur_n, deepest, emit),
                        ignore_index=True)

    return rooted.mapInPandas(local_rollup, schema=GLOBAL_INDEX_SCHEMA)


def index_stats(index: DataFrame, cfg: HbiConfig) -> pd.DataFrame:
    """Per-level summary feeding the cost model: window count, avg fill FPR.

    Pure relational aggregation over metadata columns — no blob reads
    (the analog of the reference's per-level fill-FPR lookups,
    membership/BloomFilter.java:52-57).
    """
    params = level_params(cfg)
    rows = (
        index.groupBy("level")
        .agg(
            F.count("*").alias("n_windows"),
            F.avg("bits_set").alias("avg_bits"),
            F.sum("n_items").alias("total_items"),
            F.avg("n_items").alias("avg_items"),
        )
        .collect()
    )
    recs = []
    for r in rows:
        m, k = params[r["level"]]
        rho = r["avg_bits"] / m
        recs.append(
            {"level": r["level"], "n_windows": r["n_windows"], "m": m, "k": k,
             "span": cfg.span(r["level"]), "avg_fill": rho, "fill_fpr": rho**k,
             "total_items": r["total_items"], "avg_items": r["avg_items"]}
        )
    return pd.DataFrame(recs).sort_values("level").reset_index(drop=True)


def compact_index(index: DataFrame, drop_below_level: int) -> DataFrame:
    """Memory policy: drop the coarsest levels (level < lp), the rebuild of
    dropFiltersUpToLp (tree/ImplicitTree.java:112-122, PMIndex/HBI.java:288-323).
    A predicate — Catalyst prunes the dropped rows at scan time."""
    return index.filter(F.col("level") >= drop_below_level)


# ---------------------------------------------------------------------------
# DELETABLE global Bloom index: a COUNTING maintenance artifact whose bitset
# VIEW is byte-equal to the ordinary global index. Bloom OR-merges are not
# invertible, so the bitset index alone cannot honor a takedown without a
# full rebuild (and bounded rebuilds blow up at coarse levels — the root
# window contains every surviving doc). The counting twin stores, per
# (level, window), the SPARSE (bit position, hash-instance count) pairs of
# every key occurrence (standard counting-Bloom discipline: all k positions
# increment, duplicates among the k included — so removal subtracts exactly
# what insertion added). Deletability costs the counter representation
# (~8-16x the bitset at realistic fills; pairs, never dense arrays, so
# coarse levels pay O(keys * k), not O(m)); the SERVING index is always the
# derived view. The reference's eviction (PMIndex/HBI.java:209-211) is
# whole-tree horizon expiry — content takedown is capability it does not
# have on this axis at all.
# ---------------------------------------------------------------------------

_COUNTING_MAGIC = 20
GLOBAL_COUNTING_SCHEMA = "level int, w_id long, counts binary, n_items long"


def _pack_counting(m: int, k: int, seed: int, n_items: int,
                   pos: np.ndarray, cnt: np.ndarray) -> bytes:
    from ..sketches import base as _base

    return _base.pack(_COUNTING_MAGIC, [m, k, seed, n_items],
                      [pos.astype(np.int64), cnt.astype(np.int64)])


def _unpack_counting(b: bytes):
    from ..sketches import base as _base

    magic, (m, k, seed, n_items), (pos, cnt) = _base.unpack(bytes(b))
    _base.expect_magic(magic, _COUNTING_MAGIC, "CountingBloom")
    return int(m), int(k), int(seed), int(n_items), pos, cnt


def _global_axis_counting_partials(corpus: DataFrame, cfg: HbiConfig,
                                   levels: list[int] | None = None) -> DataFrame:
    """Counting twin of _global_axis_partials: SAME key stream, SAME gpos /
    stride / stitching discipline, SAME per-level hash positions — but per
    (level, window) the sparse (position, count) multiset of hash instances
    instead of OR'd bits. Any drift between the two key pipelines would
    break the view byte-equality the tests pin, so both go through
    _batch_keys with identical arguments."""
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    if cfg.ngram > 1:
        from ..corpus import stitch_stream_tail

        corpus = stitch_stream_tail(corpus, cfg.ngram - 1, out_col="tokens",
                                    min_doc_tokens=cfg.min_doc_tokens)
    params = level_params(cfg)
    levels = cfg.levels if levels is None else levels
    spans = {L: cfg.span(L) for L in levels}
    seeds = {L: level_seed(cfg, L) for L in levels}

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            offsets = pdf["doc_offset"].to_numpy()
            doc_idx, pos, keys = _batch_keys(
                pdf["tokens"], cfg, apply_stride=False, max_starts=pdf["n_tok"].to_numpy()
            )
            if len(keys) == 0:
                continue
            gpos = (offsets[doc_idx] + pos).astype(np.uint64)
            if cfg.stride > 1:
                sel = (gpos % np.uint64(cfg.stride)) == 0
                gpos, keys = gpos[sel], keys[sel]
                if len(keys) == 0:
                    continue
            h1, h2 = BloomFilter(8, 1, seeds[levels[0]])._hashes(keys)
            out = {c: [] for c in ("level", "w_id", "counts", "n_items")}
            for L in levels:
                m, k = params[L]
                proto = BloomFilter(m, k, seeds[L])
                w = (gpos >> np.uint64(int(np.log2(spans[L])))).astype(np.int64)
                uniq, group_ids = _monotone_groups(w)
                bitpos = proto.positions_from_hashes(h1, h2)  # (n_keys, k)
                lin = (np.repeat(group_ids.astype(np.int64), k) * int(m)
                       + bitpos.ravel().astype(np.int64))
                u_lin, u_cnt = np.unique(lin, return_counts=True)
                grp = u_lin // int(m)
                p_ = u_lin % int(m)
                starts = np.searchsorted(grp, np.arange(len(uniq), dtype=np.int64))
                bounds = np.append(starts, len(grp))
                n_items = np.bincount(group_ids, minlength=len(uniq))
                for g in range(len(uniq)):
                    sl = slice(bounds[g], bounds[g + 1])
                    out["level"].append(L)
                    out["w_id"].append(int(uniq[g]))
                    out["counts"].append(_pack_counting(
                        m, k, seeds[L], int(n_items[g]), p_[sl], u_cnt[sl]))
                    out["n_items"].append(int(n_items[g]))
            yield pd.DataFrame(out)

    spark_ctx = corpus.sparkSession.sparkContext
    n_parts = max(spark_ctx.defaultParallelism, corpus.rdd.getNumPartitions())
    balanced = corpus.select("doc_offset", "n_tok", "tokens").repartition(n_parts)
    return balanced.mapInPandas(partials, schema=GLOBAL_COUNTING_SCHEMA)


def _sum_counting_pairs(blobs: list[bytes], negate_after_first: bool = False):
    """Sum (or subtract) sparse counting blobs: returns (m, k, seed,
    n_items, pos, cnt) of the combined multiset. With ``negate_after_first``
    every blob past the first SUBTRACTS; a position driven negative, or one
    never indexed, refuses (removing content the index never counted)."""
    m, k, seed, n_items, pos, cnt = _unpack_counting(blobs[0])
    pos, cnt = pos.copy(), cnt.copy()
    for b in blobs[1:]:
        m2, k2, s2, ni2, p2, c2 = _unpack_counting(b)
        if (m2, k2, s2) != (m, k, seed):
            raise ValueError(
                f"counting nodes incompatible: {(m2, k2, s2)} != {(m, k, seed)}")
        if negate_after_first:
            idx = np.searchsorted(pos, p2)
            if len(p2) and ((idx >= len(pos)).any()
                            or (pos[np.minimum(idx, len(pos) - 1)] != p2).any()):
                raise ValueError(
                    "counting takedown: removing a hash position the node "
                    "never counted (subset contract violated)")
            cnt = cnt.copy()
            np.subtract.at(cnt, idx, c2)
            if (cnt < 0).any():
                raise ValueError(
                    "counting takedown: a counter went negative — removal "
                    "exceeds indexed content")
            keep = cnt > 0
            pos, cnt = pos[keep], cnt[keep]
            n_items -= ni2
            if n_items < 0:
                raise ValueError("counting takedown: n_items went negative")
        else:
            allp = np.concatenate([pos, p2])
            allc = np.concatenate([cnt, c2])
            order = np.argsort(allp, kind="stable")
            sp, sc = allp[order], allc[order]
            new = np.concatenate(([True], sp[1:] != sp[:-1]))
            starts = np.flatnonzero(new)
            pos = sp[starts]
            cnt = np.add.reduceat(sc, starts)
            n_items += ni2
    return m, k, seed, n_items, pos, cnt


def build_global_counting_index(corpus: DataFrame, cfg: HbiConfig) -> DataFrame:
    """The deletable maintenance artifact: one sparse counting node per
    (level, STREAM window). Straddler partials merge by pair-sum (the same
    one-shuffle shape as merge_global_rows)."""
    partials = _global_axis_counting_partials(corpus, cfg)
    agg = partials.groupBy("level", "w_id").agg(
        F.collect_list("counts").alias("_c"))

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {c: [] for c in ("level", "w_id", "counts", "n_items")}
            for lvl, wid, blobs in zip(pdf["level"], pdf["w_id"], pdf["_c"]):
                if len(blobs) == 1:
                    b = bytes(blobs[0])
                    ni = _unpack_counting(b)[3]
                else:
                    m, k, s, ni, pos, cnt = _sum_counting_pairs(
                        [bytes(b) for b in blobs])
                    b = _pack_counting(m, k, s, ni, pos, cnt)
                out["level"].append(lvl)
                out["w_id"].append(wid)
                out["counts"].append(b)
                out["n_items"].append(ni)
            yield pd.DataFrame(out)

    return agg.mapInPandas(merge, schema=GLOBAL_COUNTING_SCHEMA)


def counting_index_view(counting: DataFrame) -> DataFrame:
    """The SERVING index: derive each node's bitset (position counted > 0
    <=> bit set) — rows BYTE-EQUAL to the ordinary global build
    (GLOBAL_INDEX_SCHEMA), so every existing search surface runs on the
    view unchanged."""
    def view(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {c: [] for c in ("level", "w_id", "bloom", "n_items", "bits_set")}
            for lvl, wid, blob in zip(pdf["level"], pdf["w_id"], pdf["counts"]):
                m, k, seed, n_items, pos, _cnt = _unpack_counting(bytes(blob))
                bf = BloomFilter(m, k, seed)
                upos = pos.astype(np.uint64)
                np.bitwise_or.at(
                    bf.words, (upos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (upos & np.uint64(63)))
                bf.n_added = n_items
                out["level"].append(lvl)
                out["w_id"].append(wid)
                out["bloom"].append(bf.to_bytes())
                out["n_items"].append(n_items)
                out["bits_set"].append(popcount_u64(bf.words))
            yield pd.DataFrame(out)

    return counting.mapInPandas(view, schema=GLOBAL_INDEX_SCHEMA)


def takedown_global_counting_index(counting: DataFrame, removed_docs: DataFrame,
                                   cfg: HbiConfig) -> DataFrame:
    """CONTENT TAKEDOWN on the deletable global Bloom index: negative
    counting partials over only the removed docs at their BUILD-TIME
    offsets (missing doc_offset refuses — recomputed offsets would subtract
    the wrong windows), pair-wise counter subtraction, emptied nodes
    dropped. counting_index_view of the result is byte-equal to a scratch
    global build over the survivors (pinned in tests/test_counting_bloom)."""
    if "doc_offset" not in removed_docs.columns:
        raise ValueError(
            "takedown_global_counting_index: removed_docs must carry its "
            "BUILD-TIME doc_offset column")
    neg = build_global_counting_index(removed_docs, cfg)
    joined = counting.join(
        neg.select("level", "w_id", F.col("counts").alias("_neg")),
        ["level", "w_id"], "left",
    )

    def sub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {c: [] for c in ("level", "w_id", "counts", "n_items")}
            for lvl, wid, blob, nb in zip(pdf["level"], pdf["w_id"],
                                          pdf["counts"], pdf["_neg"]):
                if nb is None:
                    ni = _unpack_counting(bytes(blob))[3]
                    b = bytes(blob)
                else:
                    m, k, s, ni, pos, cnt = _sum_counting_pairs(
                        [bytes(blob), bytes(nb)], negate_after_first=True)
                    if ni == 0:
                        continue  # emptied window: node leaves the index
                    b = _pack_counting(m, k, s, ni, pos, cnt)
                out["level"].append(lvl)
                out["w_id"].append(wid)
                out["counts"].append(b)
                out["n_items"].append(ni)
            yield pd.DataFrame(out)

    return joined.mapInPandas(sub, schema=GLOBAL_COUNTING_SCHEMA)


def append_global_counting_index(counting: DataFrame, new_docs: DataFrame,
                                 cfg: HbiConfig, n_so_far: int) -> DataFrame:
    """insert() for the DELETABLE index: continue the stream at
    ``n_so_far`` tokens, count the batch's hash instances, pair-sum into
    the existing nodes — byte-equal to a scratch counting build over
    old+new (counter addition is associative/commutative and old/new key
    instances partition disjointly, the same argument as the Bloom OR
    append). Unigram keys only: n-gram appends need the carried boundary
    tail the Bloom stream state machinery owns
    (streaming/incremental.append_increment_global) — refused here rather
    than silently dropping boundary-crossing n-grams."""
    if cfg.ngram > 1:
        raise ValueError(
            "append_global_counting_index: n-gram appends need the carried "
            "boundary tail (see streaming.incremental.append_increment_global)"
            " — build from scratch or keep ngram=1")
    from ..corpus import with_global_offsets

    batch = with_global_offsets(new_docs.drop("doc_offset") if "doc_offset"
                                in new_docs.columns else new_docs)
    batch = batch.withColumn(
        "doc_offset", F.col("doc_offset") + F.lit(int(n_so_far)))
    fresh = build_global_counting_index(batch, cfg)
    both = counting.unionByName(fresh)
    agg = both.groupBy("level", "w_id").agg(F.collect_list("counts").alias("_c"))

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {c: [] for c in ("level", "w_id", "counts", "n_items")}
            for lvl, wid, blobs in zip(pdf["level"], pdf["w_id"], pdf["_c"]):
                if len(blobs) == 1:
                    b = bytes(blobs[0])
                    ni = _unpack_counting(b)[3]
                else:
                    m, k, s, ni, pos, cnt = _sum_counting_pairs(
                        [bytes(b) for b in blobs])
                    b = _pack_counting(m, k, s, ni, pos, cnt)
                out["level"].append(lvl)
                out["w_id"].append(wid)
                out["counts"].append(b)
                out["n_items"].append(ni)
            yield pd.DataFrame(out)

    return agg.mapInPandas(merge, schema=GLOBAL_COUNTING_SCHEMA)
