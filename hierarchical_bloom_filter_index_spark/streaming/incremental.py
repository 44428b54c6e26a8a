"""Streaming semantics — the reference's insert/expire lifecycle, Spark-style.

The reference's window is COUNT-based (W tokens, whole-tree eviction,
PMIndex/HBI.java:263-266,209-211), which Structured Streaming does not model
natively (its windows are event-time). Per SURVEY §2.9 we keep the faithful
batch-incremental formulation and additionally provide a real Structured
Streaming pipeline (file source -> foreachBatch index maintenance) for
continuous ingestion:

* append_increment  — index new documents; on the doc axis the new sketch
  rows are simply unioned (windows are per-document, no overlap with old
  rows). This is insert() at batch granularity.
* append_increment_global — insert() on the ONE-STREAM axis
  (PMIndex/HBI.java:215-267): new docs continue the stream from the stored
  offset (GlobalStreamState.total_tokens); the carried stream tail re-creates
  the boundary-crossing n-grams the previous build could not index (no
  successor yet), and only windows at/after the boundary are re-merged — the
  resulting sketch table is BYTE-EQUAL to a from-scratch rebuild (Bloom merge
  law), while touching O(|batch| + boundary) rows instead of O(|stream|).
* expire            — drop whole windows older than a horizon (the w_id
  predicate analog of whole-tree eviction; on Iceberg this is a
  partition-drop / snapshot-expiry metadata operation).
* incremental_index_stream — Structured Streaming: every micro-batch of new
  corpus files becomes sketch rows appended to the index directory, with
  checkpointed progress (exactly-once per file source guarantees).
* incremental_global_index_stream — Structured Streaming on the ONE-STREAM
  axis with DELTA commits: each micro-batch persists ONLY the re-merged
  at/after-boundary windows (O(batch + boundary) rows, never an index
  rewrite); the exact index is reassembled from per-version w_id slices at
  read time (read_global_stream_index), folded by
  compact_global_stream_index. Continuation state is committed AFTER the
  delta lands, keyed by batch_id, so foreachBatch replays are idempotent.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import HbiConfig
from ..corpus import CORPUS_SCHEMA, with_global_offsets
from ..operators.build import build_index, merge_global_rows


def append_increment(index: DataFrame, new_docs: DataFrame, cfg: HbiConfig) -> DataFrame:
    """insert(): extend the sketch table with newly arrived documents."""
    if cfg.axis != "doc":
        raise NotImplementedError(
            "use append_increment_global (offset continuation + boundary re-merge) "
            "for the one-stream axis"
        )
    return index.unionByName(build_index(new_docs, cfg))


@dataclass
class GlobalStreamState:
    """Where the global stream left off: token count so far + the last
    (ngram-1) stream tokens (the starts the previous build could not index
    because they had no successor yet). The distributed analog of the
    reference's stream counter + ring buffer (PMIndex/HBI.java:215-267,
    tree/StreamBuffer.java)."""

    total_tokens: int = 0
    tail: list[int] = field(default_factory=list)


def _tail_tokens(
    corpus: DataFrame, total: int, need: int, carried: list[int] | None = None
) -> list[int]:
    """Last ``need`` tokens of the stream ending at offset ``total`` — the
    starts a build could not index because no successor existed yet. Collects
    only the docs overlapping that window; ``carried`` (a previous state's
    tail) is prepended before slicing so short batches extend, not replace,
    the boundary. THE single definition of boundary-tail semantics — shared
    by stream_state and the append path so the stored continuation state and
    the appender can never desynchronize."""
    stream_end: list[int] = list(carried or [])
    if need <= 0:
        return []
    if total > 0:
        # trim each boundary doc to its LAST <= need tokens server-side: a
        # single long tail doc would otherwise ship its whole array to the
        # driver just to keep ngram-1 tokens
        rows = (
            corpus.filter(F.col("doc_offset") + F.col("n_tok") > total - need)
            .orderBy("doc_offset")
            .select(
                F.slice(
                    "tokens",
                    F.greatest(F.lit(1), F.col("n_tok") - F.lit(need) + 1),
                    F.lit(need),
                ).alias("tokens")
            )
            .collect()
        )
        for r in rows:
            stream_end.extend(r["tokens"])
    return stream_end[-need:] if len(stream_end) >= need else stream_end


def stream_state(corpus: DataFrame, cfg: HbiConfig) -> GlobalStreamState:
    """Compute the continuation state of an already-indexed corpus. ``corpus``
    needs doc_offset (with_global_offsets). One tiny agg + one tiny collect
    (only the last ngram-1 tokens' docs)."""
    total = corpus.agg(F.sum("n_tok")).first()[0] or 0
    return GlobalStreamState(int(total), _tail_tokens(corpus, total, cfg.ngram - 1))


def append_increment_global(
    index: DataFrame,
    new_docs: DataFrame,
    cfg: HbiConfig,
    state: GlobalStreamState,
) -> tuple[DataFrame, GlobalStreamState]:
    """insert() on the global axis: continue the stream at
    ``state.total_tokens``, index the batch (plus the carried boundary tail),
    and re-merge ONLY the windows at/after the boundary. Returns
    (new_index, new_state); new_index is byte-equal to a from-scratch
    build over old+new docs (Bloom merge is associative/commutative and
    old/new key instances partition disjointly).

    Stream order is doc_id order within each batch, batches in arrival
    order — the caller appends batches whose doc_ids sort after the already
    indexed ones if it needs a reproducible global doc order.
    """
    if cfg.axis != "global":
        raise ValueError("append_increment_global needs cfg.axis='global'")
    if new_docs.isEmpty():
        return index, state
    untouched, merged, _boundary, new_state = _global_append_pieces(index, new_docs, cfg, state)
    return untouched.unionByName(merged), new_state


def _global_append_pieces(
    index: DataFrame, new_docs: DataFrame, cfg: HbiConfig, state: GlobalStreamState
) -> tuple[DataFrame, DataFrame, int, GlobalStreamState]:
    """The append, decomposed: (untouched old rows, re-merged at/after-
    boundary rows, boundary token offset, new state). append_increment_global
    unions the pieces; the streaming DELTA layout persists ONLY the merged
    piece (O(batch + boundary) rows) and reconstructs untouched rows from
    earlier versions by w_id slice at read time."""
    spark = new_docs.sparkSession
    batch = with_global_offsets(new_docs, start=state.total_tokens)
    boundary_start = state.total_tokens - len(state.tail)
    if state.tail:
        # synthetic doc holding the old stream's last (ngram-1) tokens at
        # their true global positions: its starts are exactly the ones the
        # previous build could not index (no successor existed yet)
        synth = spark.createDataFrame(
            [("\x00boundary", state.tail, len(state.tail), "boundary", boundary_start)],
            CORPUS_SCHEMA + ", doc_offset long",
        )
        batch_for_build = synth.unionByName(batch)
    else:
        batch_for_build = batch
    new_rows = build_index(batch_for_build, cfg)

    # windows strictly before the boundary cannot receive new keys — pass
    # them through untouched (at scale: partition pruning, no rewrite);
    # everything at/after the boundary is re-merged with the batch rows
    cutoff = _level_cutoff(cfg.tree_span, boundary_start)
    untouched = index.filter(F.col("w_id") < cutoff)
    merged = merge_global_rows(index.filter(F.col("w_id") >= cutoff).unionByName(new_rows))

    new_total = state.total_tokens + (batch.agg(F.sum("n_tok")).first()[0] or 0)
    new_tail = _tail_tokens(batch, new_total, cfg.ngram - 1, carried=state.tail)
    return untouched, merged, int(boundary_start), GlobalStreamState(int(new_total), new_tail)


def _level_cutoff(tree_span: int, boundary_tokens: int):
    """Per-level w_id horizon of a token offset: w >= boundary >> (log2(tree) - level)."""
    log2_tree = int(math.log2(tree_span))
    return F.expr(f"shiftright(CAST({int(boundary_tokens)} AS BIGINT), {log2_tree} - level)")


def expire(index: DataFrame, cfg: HbiConfig, min_leaf_w_id: int) -> DataFrame:
    """expire(): whole-window eviction by horizon predicate
    (PMIndex/HBI.java:209-211). ``min_leaf_w_id`` is the horizon at the
    deepest level; each coarser level L keeps w_id >= horizon >> (deepest-L).
    Pure predicate — Iceberg/Parquet partition pruning makes it a metadata
    operation at scale."""
    return index.filter(
        F.expr(f"w_id >= shiftright(CAST({int(min_leaf_w_id)} AS BIGINT), {cfg.deepest} - level)")
    )


def replay_guarded_append(out_path: str, batch_df: DataFrame,
                          batch_id: int, build) -> None:
    """THE foreachBatch append discipline, shared by every derived-output
    stream (incremental near-dup, streaming quality report, ...):
    foreachBatch is at-least-once, so a crash between the append and the
    checkpoint commit redelivers the batch — the guard probes the output
    for this batch_id BEFORE appending ``build(batch_df)`` (+ batch_id
    column). Empty batches are skipped outright (no point running the
    build job to append nothing). Only a MISSING output path reads as
    'not yet appended' (AnalysisException); any other read failure must
    propagate — treating a transient error as 'absent' would re-append a
    duplicate, the exact corruption the guard exists to prevent."""
    from pyspark.errors import AnalysisException

    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return
    try:
        done = (
            spark.read.parquet(out_path)
            .filter(F.col("batch_id") == batch_id).limit(1).count() > 0
        )
    except AnalysisException:
        done = False  # first commit: output does not exist yet
    if done:
        return
    build(batch_df).withColumn(
        "batch_id", F.lit(batch_id).cast("long")
    ).write.mode("append").parquet(out_path)


def incremental_index_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    output_path: str,
    cfg: HbiConfig,
):
    """Structured Streaming maintenance: corpus parquet files land in
    ``input_path``; each micro-batch's sketch rows are appended to
    ``output_path``. Returns the started query (trigger=availableNow drains
    what exists and stops — deterministic for tests; drop the trigger for
    continuous mode)."""
    if cfg.axis != "doc":
        raise NotImplementedError(
            "incremental_index_stream maintains the doc-axis index; use "
            "incremental_global_index_stream for the one-stream axis "
            "(per-batch global offsets must continue, not restart)")
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # foreachBatch is at-least-once: if this batch_id's rows already
        # landed (crash between the append and the checkpoint commit), a
        # replay must NOT append a second copy — batch_id is stable across
        # replays of the same checkpoint lineage
        try:
            already = (
                spark.read.parquet(output_path)
                .filter(F.col("batch_id") == batch_id)
                .limit(1)
                .count()
                > 0
            )
        except Exception:
            already = False  # first commit: output does not exist yet
        if already:
            return
        build_index(batch_df, cfg).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(output_path)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def incremental_global_index_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    work_dir: str,
    cfg: HbiConfig,
    max_files_per_trigger: int = 1,
):
    """Structured Streaming maintenance of the ONE-STREAM index with DELTA
    commits: each micro-batch writes ONLY the re-merged at/after-boundary
    windows plus the batch's new windows to ``work_dir/v<N>`` — O(|batch| +
    boundary) rows per commit, NEVER a rewrite of the whole index —  and
    records each version's boundary token offset in ``work_dir/STATE.json``.
    ``read_global_stream_index`` reconstructs the exact current index as the
    union of per-version w_id slices [cutoff_k, cutoff_k+1) (every predicate
    pushes down to the parquet scan; version k's rows past cutoff_{k+1} were
    superseded by version k+1's re-merge).

    Crash safety: the state file is written only after the delta lands, and
    replayed batch_ids (foreachBatch's at-least-once) are skipped — restarts
    resume exactly, never double-appending. Eviction: a delta directory
    wholly behind an expire horizon can simply be deleted; many small deltas
    can be folded with ``compact_global_stream_index``.
    """
    import json
    import os

    if cfg.axis != "global":
        raise ValueError("incremental_global_index_stream needs cfg.axis='global'")
    os.makedirs(work_dir, exist_ok=True)
    meta_path = os.path.join(work_dir, "STATE.json")
    stream = spark.readStream.schema(CORPUS_SCHEMA).option(
        "maxFilesPerTrigger", max_files_per_trigger
    ).parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # an empty v0 dir would have no inferable parquet schema
        _finish_fold(work_dir)  # recover an interrupted compaction, if any
        meta = json.load(open(meta_path)) if os.path.exists(meta_path) else None
        if meta is not None and batch_id <= meta["last_batch_id"]:
            return  # replayed batch after failure: already applied
        if meta is not None and (
            meta["tree_span"] != cfg.tree_span
            or meta["levels"] != [int(L) for L in cfg.levels]
        ):
            raise ValueError(
                f"stream work_dir was built with tree_span={meta['tree_span']} "
                f"levels={meta['levels']}; resuming with a different geometry "
                "would corrupt the index")
        if meta is None:
            batch = with_global_offsets(batch_df)
            delta = build_index(batch, cfg)
            new_state = stream_state(batch, cfg)
            boundaries = [0]
        else:
            state = GlobalStreamState(meta["total_tokens"], list(meta["tail"]))
            index = _assemble_deltas(
                spark, work_dir, meta["boundaries"], cfg.tree_span, meta["levels"]
            )
            _untouched, delta, boundary, new_state = _global_append_pieces(
                index, batch_df, cfg, state
            )
            boundaries = list(meta["boundaries"]) + [boundary]
        delta.write.mode("overwrite").partitionBy("level").parquet(
            os.path.join(work_dir, f"v{len(boundaries) - 1}")
        )
        # per-version continuation snapshots: version k's entry is the stream
        # state right after commit k, so time-travel reads can also resume
        history = (list(meta.get("history", [])) if meta is not None else [])
        history.append({"total_tokens": int(new_state.total_tokens),
                        "tail": [int(t) for t in new_state.tail]})
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"boundaries": boundaries, "tree_span": int(cfg.tree_span),
                 "levels": [int(L) for L in cfg.levels],
                 "total_tokens": int(new_state.total_tokens),
                 "tail": [int(t) for t in new_state.tail],
                 "history": history, "last_batch_id": int(batch_id)},
                f,
            )
        os.replace(tmp, meta_path)  # atomic pointer swap

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def incremental_global_window_sketch_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    work_dir: str,
    cfg: HbiConfig,
    family: str = "cms",
    family_kw: dict | None = None,
    max_files_per_trigger: int = 1,
):
    """Structured Streaming maintenance for a GLOBAL window-SKETCH index
    (family = 'cms' | 'hll' | 'kll') with DELTA commits — the sketch twin of
    ``incremental_global_index_stream``. Each micro-batch writes ONLY the
    re-merged boundary suffix per level plus the batch's new windows
    (rollup.global_window_append_delta: at level L exactly the windows
    ``w_id >= boundary >> (log2(tree_span) - L)`` — the same version-delta
    contract as the Bloom stream, so ``_assemble_deltas`` reassembles the
    exact index from per-(version, level) literal slices unchanged).

    State is simpler than the Bloom stream's: window sketches need no
    n-gram tail, only the exact token count so far. Crash safety identical:
    SKETCH_STATE.json is swapped in only after the delta lands, replayed
    batch_ids are skipped. ``read_global_window_sketch_stream`` time-travels
    by version; ``compact_global_window_sketch_stream`` folds history."""
    import json
    import os

    from ..operators import rollup as R

    if cfg.axis != "global":
        raise ValueError("incremental_global_window_sketch_stream needs cfg.axis='global'")
    slot_blobs, merge_groups, builder = R.window_sketch_family(cfg, family, **(family_kw or {}))
    os.makedirs(work_dir, exist_ok=True)
    meta_path = os.path.join(work_dir, "SKETCH_STATE.json")
    stream = spark.readStream.schema(CORPUS_SCHEMA).option(
        "maxFilesPerTrigger", max_files_per_trigger
    ).parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # an empty sv0 dir would have no inferable parquet schema
        _finish_fold(work_dir)  # recover an interrupted compaction, if any
        meta = json.load(open(meta_path)) if os.path.exists(meta_path) else None
        if meta is not None and batch_id <= meta["last_batch_id"]:
            return  # replayed batch after failure: already applied
        if meta is not None and (
            meta["family"] != family
            or meta["tree_span"] != cfg.tree_span
            or meta["levels"] != [int(L) for L in cfg.levels]
        ):
            raise ValueError(
                f"stream work_dir holds a {meta['family']!r} index with "
                f"tree_span={meta['tree_span']}; resuming with "
                f"family={family!r}/tree_span={cfg.tree_span} would merge "
                "incompatible blobs")
        n_batch = batch_df.agg(F.coalesce(F.sum("n_tok"), F.lit(0))).first()[0]
        frames: list = []
        if meta is None:
            delta = builder(with_global_offsets(batch_df), cfg)
            boundaries = [0]
            total = int(n_batch)
        else:
            index = _assemble_deltas(
                spark, work_dir, meta["boundaries"], cfg.tree_span, cfg.levels,
                prefix="sv",
            )
            delta, _leaf_boundary, frames = R.global_window_append_delta(
                index, batch_df, cfg, meta["total_tokens"], slot_blobs, merge_groups
            )
            # token-unit boundary: cutoff(L) = tokens >> (log2_tree - L)
            # equals the leaf-unit contract because tree_span = leaf << deepest
            boundaries = list(meta["boundaries"]) + [int(meta["total_tokens"])]
            total = int(meta["total_tokens"]) + int(n_batch)
        delta.write.mode("overwrite").partitionBy("level").parquet(
            os.path.join(work_dir, f"sv{len(boundaries) - 1}")
        )
        # release every cache this commit pinned: the first batch's builder
        # returns a PERSISTED index (the builders' contract), later batches
        # persist per-level delta frames — either way the commit's data now
        # lives in the parquet delta, not the cache
        delta.unpersist()
        for f in frames:
            f.unpersist()
        history = (list(meta.get("history", [])) if meta is not None else [])
        history.append({"total_tokens": total})
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"family": family, "boundaries": boundaries,
                 "tree_span": int(cfg.tree_span),
                 "levels": [int(L) for L in cfg.levels],
                 "total_tokens": total, "history": history,
                 "last_batch_id": int(batch_id)},
                f,
            )
        os.replace(tmp, meta_path)  # atomic pointer swap

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_global_window_sketch_stream(
    spark: SparkSession, work_dir: str, version: int | None = None
) -> tuple[DataFrame, int]:
    """Open a stream-maintained global window-sketch index: (index frame,
    total tokens indexed). ``version=k`` time-travels to commit k exactly
    (same slicing proof as read_global_stream_index — version k was the
    last writer of every window it holds at that point)."""
    import json
    import os

    _finish_fold(work_dir)  # recover an interrupted compaction, if any
    meta = json.load(open(os.path.join(work_dir, "SKETCH_STATE.json")))
    boundaries = meta["boundaries"]
    latest = len(boundaries) - 1
    if version is None or version == latest:
        idx = _assemble_deltas(spark, work_dir, boundaries, meta["tree_span"],
                               meta["levels"], prefix="sv")
        return idx, int(meta["total_tokens"])
    if not 0 <= version < latest:
        raise ValueError(f"version {version} not retained (have 0..{latest})")
    history = meta.get("history")
    if history is None or len(history) != latest + 1:
        raise ValueError("no per-version history in SKETCH_STATE.json")
    idx = _assemble_deltas(spark, work_dir, boundaries[: version + 1],
                           meta["tree_span"], meta["levels"], prefix="sv")
    return idx, int(history[version]["total_tokens"])


def compact_global_window_sketch_stream(spark: SparkSession, work_dir: str) -> None:
    """Fold all sketch-stream delta versions into a single sv0 (snapshot
    expiry; answers and continuation state unchanged). Crash-safe via the
    write-ahead fold marker (_fold_deltas)."""
    _fold_deltas(spark, work_dir, "sv", "SKETCH_STATE.json")


def _assemble_deltas(
    spark: SparkSession, work_dir: str, boundaries: list[int], tree_span: int,
    levels: list[int], prefix: str = "v",
) -> DataFrame:
    """Exact current index = union over (version k, level L) of delta_k's
    rows in [cutoff_k(L), cutoff_{k+1}(L)) — one branch per version and
    level so every predicate is a LITERAL: the level filter prunes the
    delta's partition directories and the w_id bounds push down to the
    parquet scan (a single shiftright(boundary, k - level) expression
    references the level column and could do neither)."""
    import os

    log2_tree = int(math.log2(tree_span))
    parts = []
    for k, b in enumerate(boundaries):
        df = spark.read.parquet(os.path.join(work_dir, f"{prefix}{k}"))
        nxt = boundaries[k + 1] if k + 1 < len(boundaries) else None
        for L in levels:
            sl = df.filter(
                (F.col("level") == L) & (F.col("w_id") >= int(b) >> (log2_tree - L))
            )
            if nxt is not None:
                sl = sl.filter(F.col("w_id") < int(nxt) >> (log2_tree - L))
            parts.append(sl)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_global_stream_index(
    spark: SparkSession, work_dir: str, version: int | None = None
) -> tuple[DataFrame, "GlobalStreamState"]:
    """Open a stream-maintained global index (assembled from its delta
    versions, every slice predicate pushed down) and its continuation state.

    ``version=k`` time-travels to the index exactly as of commit k (the
    Iceberg snapshot-read analog): version k's delta was the LAST writer of
    every window it holds at that point, so assembling the first k+1 deltas
    with version k unsliced reproduces the historical index byte-for-byte.
    The returned state is commit k's continuation snapshot — a reader can
    fork the stream from any retained version. Compaction expires history
    (folds every delta into v0) and RESTARTS version numbering: afterwards
    ``version=0`` is the fold itself (the then-current snapshot), not the
    original first commit.
    """
    import json
    import os

    _finish_fold(work_dir)  # recover an interrupted compaction, if any
    meta = json.load(open(os.path.join(work_dir, "STATE.json")))
    boundaries = meta["boundaries"]
    history = meta.get("history")
    latest = len(boundaries) - 1
    if version is None or version == latest:
        idx = _assemble_deltas(spark, work_dir, boundaries, meta["tree_span"], meta["levels"])
        return idx, GlobalStreamState(meta["total_tokens"], list(meta["tail"]))
    if not 0 <= version < latest:
        raise ValueError(f"version {version} not retained (have 0..{latest})")
    if history is None or len(history) != latest + 1:
        raise ValueError(
            "no per-version history in STATE.json (stream written by an older "
            "build, or history expired by compaction)"
        )
    idx = _assemble_deltas(
        spark, work_dir, boundaries[: version + 1], meta["tree_span"], meta["levels"]
    )
    snap = history[version]
    return idx, GlobalStreamState(snap["total_tokens"], list(snap["tail"]))


_FOLD_MARKER = "FOLD_IN_PROGRESS.json"


def _finish_fold(work_dir: str) -> None:
    """Complete (or re-complete) a pending compaction fold. Idempotent at
    every crash point AFTER the marker lands: if the fold tmp dir still
    exists, the old delta dirs are removed and the tmp moved into the v0
    slot; if it was already moved by an interrupted earlier attempt, only
    the stale later versions are swept. The meta swap and marker removal
    come last, so a reader either sees the old consistent state (marker +
    old meta, recovery re-runs) or the new one."""
    import json
    import os
    import shutil

    marker = os.path.join(work_dir, _FOLD_MARKER)
    if not os.path.exists(marker):
        return
    info = json.load(open(marker))
    prefix, n_versions = info["prefix"], int(info["n_versions"])
    tmp_dir = os.path.join(work_dir, f"{prefix}0_compact_tmp")
    if os.path.exists(tmp_dir):
        for k in range(n_versions):
            shutil.rmtree(os.path.join(work_dir, f"{prefix}{k}"), ignore_errors=True)
        os.replace(tmp_dir, os.path.join(work_dir, f"{prefix}0"))
    else:  # fold already moved into place; sweep stale later versions only
        for k in range(1, n_versions):
            shutil.rmtree(os.path.join(work_dir, f"{prefix}{k}"), ignore_errors=True)
    state_path = os.path.join(work_dir, info["state_file"])
    with open(state_path + ".tmp", "w") as f:
        json.dump(info["meta"], f)
    os.replace(state_path + ".tmp", state_path)
    os.remove(marker)


def _fold_deltas(spark: SparkSession, work_dir: str, prefix: str, state_file: str) -> None:
    """Shared compaction body with a WRITE-AHEAD fold marker: the folded
    parquet lands in a tmp dir first, then the marker (containing the final
    meta) commits the fold atomically — a crash at any later point is
    recovered by _finish_fold on the next read/compaction, so the index
    never becomes unreadable (the old code deleted every delta dir before
    renaming the fold into place, leaving a window where STATE pointed at
    missing directories)."""
    import json
    import os

    _finish_fold(work_dir)  # complete any previous interrupted fold first
    meta = json.load(open(os.path.join(work_dir, state_file)))
    full = _assemble_deltas(spark, work_dir, meta["boundaries"], meta["tree_span"],
                            meta["levels"], prefix=prefix)
    tmp_dir = os.path.join(work_dir, f"{prefix}0_compact_tmp")
    full.write.mode("overwrite").partitionBy("level").parquet(tmp_dir)
    new_meta = dict(meta)
    new_meta["boundaries"] = [0]
    if "history" in meta:  # snapshot expiry: only the folded version survives
        new_meta["history"] = [meta["history"][-1]]
    marker = os.path.join(work_dir, _FOLD_MARKER)
    with open(marker + ".tmp", "w") as f:
        json.dump({"prefix": prefix, "n_versions": len(meta["boundaries"]),
                   "state_file": state_file, "meta": new_meta}, f)
    os.replace(marker + ".tmp", marker)  # <- the commit point
    _finish_fold(work_dir)


def compact_global_stream_index(spark: SparkSession, work_dir: str) -> None:
    """Fold all delta versions into a single v0 (bounding the read-time union
    after many micro-batches — the LSM-compaction analog). State and answers
    are unchanged; subsequent appends continue from the folded version.
    Crash-safe via the write-ahead fold marker (_fold_deltas).

    Do NOT run concurrently with an active streaming query on the same
    work_dir: the fold deletes delta directories an in-flight micro-batch
    may still be reading (the query fails and must be restarted — state
    stays consistent, but the race is not coordinated)."""
    _fold_deltas(spark, work_dir, "v", "STATE.json")
