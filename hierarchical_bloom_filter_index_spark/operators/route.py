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
from pyspark.sql import DataFrame, functions as F

from ..config import HbiConfig
from ..functions import subsequence_positions
from ..sketches.hashing import pack_ngrams_u64
from .probe import probe_blobs

MATCH_SCHEMA = "doc_id string, pos int"


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


def deepest_usable_level(cfg: HbiConfig, m: int) -> int:
    """Never descend below span < pattern length (the descent guard,
    search/BlockSearch.java:50-64, estimators/LevelCostMinimizer.java:32)."""
    L = cfg.deepest
    while L > 0 and cfg.span(L) < m:
        L -= 1
    return L


def _probe_level(
    level_rows: DataFrame, keys: np.ndarray, anchor: int, doc_axis: bool
) -> DataFrame:
    """Filter sketch rows at one level to surviving windows.

    Input columns: [doc_id?], w_id, bloom, nbloom (nbloom nullable).
    Output: surviving [doc_id?], w_id.
    """
    key_list = keys.astype(np.uint64)
    anchor_idx = int(np.searchsorted(key_list, np.uint64(anchor)))
    out_schema = "doc_id string, w_id long" if doc_axis else "w_id long"

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = pdf["bloom"].tolist()
            in_self = probe_blobs(blobs, key_list)  # (n, n_keys)
            has_nbr = pdf["nbloom"].notna().to_numpy()
            in_union = in_self.copy()
            if has_nbr.any():
                nbr_blobs = pdf.loc[has_nbr, "nbloom"].tolist()
                in_union[has_nbr] |= probe_blobs(nbr_blobs, key_list)
            ok = in_self[:, anchor_idx] & in_union.all(axis=1)
            cols = ["doc_id", "w_id"] if doc_axis else ["w_id"]
            yield pdf.loc[ok, cols]

    return level_rows.mapInPandas(probe, schema=out_schema)


def _level_with_neighbors(index: DataFrame, level: int, doc_axis: bool) -> DataFrame:
    """Sketch rows at ``level`` joined with their right-neighbor blob
    (w_id + 1), needed for the union probe. Self-join keyed on (doc?, w_id)."""
    base = index.filter(F.col("level") == level)
    keys = (["doc_id"] if doc_axis else []) + ["w_id"]
    left = base.select(*keys, "bloom")
    right = base.select(
        *(["doc_id"] if doc_axis else []),
        (F.col("w_id") - 1).alias("w_id"),
        F.col("bloom").alias("nbloom"),
    )
    return left.join(right, on=keys, how="left")


def pattern_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: list[int],
    start_level: int | None = None,
) -> DataFrame:
    """Exact match positions of ``pattern``: (doc_id, pos), 0-based.

    The full report() lifecycle: route through the Bloom hierarchy from
    ``start_level`` (default: cost-model choice if stats available, else 0),
    then verify surviving windows exactly. Returns positions identical to a
    brute-force scan — Bloom false positives only cost verification work.
    """
    if cfg.axis != "doc":
        raise NotImplementedError("pattern_search currently routes on the doc axis")
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    if cfg.ngram > 1 and m < cfg.ngram:
        # no pattern n-gram exists — the index cannot prune; exact scan
        return brute_force_search(corpus, pattern)
    keys, anchor = pattern_keys(pattern, cfg)
    deepest = deepest_usable_level(cfg, m)
    first = 0 if start_level is None else max(0, min(start_level, deepest))

    # --- descent: children-of-survivors, one vectorized probe per level ----
    survivors: DataFrame | None = None
    for L in range(first, deepest + 1):
        rows = _level_with_neighbors(index, L, doc_axis=True)
        if survivors is not None:
            children = survivors.select(
                "doc_id", F.explode(F.array(F.col("w_id") * 2, F.col("w_id") * 2 + 1)).alias("w_id")
            )
            rows = rows.join(children, on=["doc_id", "w_id"], how="left_semi")
        survivors = _probe_level(rows, keys, anchor, doc_axis=True)

    # --- exact verification (JVM-side, codegen) -----------------------------
    span = cfg.span(deepest)
    cand = survivors.groupBy("doc_id").agg(F.collect_set("w_id").alias("wids"))
    verified = (
        corpus.join(cand, on="doc_id", how="inner")
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


def window_membership(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    token: int,
    level: int | None = None,
) -> DataFrame:
    """'Does token X appear in window W?' — exact (doc_id, w_id) pairs after
    Bloom routing + verification. The minimum end-to-end slice (SURVEY §7.2)."""
    if cfg.ngram != 1:
        raise ValueError("window_membership requires a token-keyed index (ngram=1)")
    L = cfg.deepest if level is None else level
    span = cfg.span(L)
    rows = index.filter(F.col("level") == L).select("doc_id", "w_id", "bloom")
    key = np.asarray([token], dtype=np.uint64)

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
