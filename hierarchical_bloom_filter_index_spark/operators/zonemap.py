"""File-level zone maps + Bloom pruning — data skipping over parquet layouts.

The hierarchical-Bloom pruning discipline (operators/route.py: probe a small
summary, descend only into windows that might match, verify exactly) lifted
to the STORAGE layer: one summary row per parquet file — row count, per-column
min/max, and optionally a Bloom filter over a key column — lets a query
decide which files can possibly contain matching rows BEFORE any of them is
scanned.  At 100 TB this is the single biggest lever a scan has: a range
predicate on a range-clustered layout or a point-lookup on a hash-clustered
layout touches O(matching) files instead of O(all).

Soundness contract (the same shape as every pruning surface in this engine):
pruning only ever SKIPS files certified non-matching — range pruning keeps
any file whose [min, max] envelope overlaps the query range, Bloom pruning
keeps any file whose filter reports a probe key maybe-present (no false
negatives by construction) — and the caller re-applies the EXACT predicate
to the pruned read, so the result equals the full scan byte-for-byte; the
zone map only buys speed.  Spark's own parquet row-group statistics do this
within a scan; the zone map makes the file-level decision available to the
engine itself (driver-side file lists feed ``spark.read.parquet(*files)``),
works for Bloom point-lookups parquet stats cannot express, and persists as
a tiny queryable table.

Scale shape: the builder is ONE pass over the layout — per-file partial
aggregates map-side, a groupBy on the file name that shuffles one tiny row
(plus one Bloom blob) per file; the zone map itself is ~1 row per file, so
pruning is a metadata operation (a filter over the zone-map table; only the
surviving FILE NAMES are collected, never data).  Appending new files to a
layout appends their zone-map rows (files are immutable — the map is
append-only, like sources/io's segment metadata).

Reference parity: the reference prunes windows through its Bloom hierarchy
(query/BlockSearch.java descend-or-skip); this is the same decision applied
to files of a distributed layout rather than windows of a token stream.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sketches.bloom import BloomFilter, design
from .aggregates import sketch_aggregate
from .joins import _key_expr

_ZONE_SEED = 41


def build_zone_map(
    df: DataFrame,
    stat_cols: tuple[str, ...] = (),
    bloom_col: str | None = None,
    bloom_fpp: float = 0.01,
    bloom_capacity: int | None = None,
    seed: int = _ZONE_SEED,
    sum_cols: tuple[str, ...] = (),
) -> DataFrame:
    """ONE zone-map row per underlying parquet file of ``df``: ``(_file,
    n_rows, min_<c>, max_<c> ...[, bloom])``.

    ``df`` must be a file-backed frame (``spark.read.parquet``) — provenance
    comes from ``input_file_name()``.  ``stat_cols`` get min/max envelopes
    (JVM aggregates, map-side partials — the shuffle carries one row per
    file).  ``bloom_col`` adds a per-file Bloom filter over the column's
    int64 key view (lossless cast for integral columns, xxhash64 otherwise),
    sized for ``bloom_capacity`` keys (default: 2x the mean file's rows —
    an overfull file only degrades its FPR, never soundness: ``contains``
    keeps no-false-negatives at any fill)."""
    if not df.inputFiles():
        raise ValueError(
            "build_zone_map needs a file-backed DataFrame (spark.read.parquet) "
            "— input_file_name() is empty on in-memory/derived frames")
    src = df.withColumn("_file", F.input_file_name())
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        # non-null count per stat column: what a metadata-only range count
        # may credit for a wholly-contained file (n_rows would over-count
        # rows whose column is NULL — a range predicate never matches those)
        aggs.append(F.count(c).alias(f"nvals_{c}"))
    for c in sum_cols:
        # per-file EXACT sum for metadata-accelerated range SUMs: BIGINT
        # (order-free, overflow refuses loudly under ANSI) — integral-
        # valued columns only; scale fractional columns to fixed point
        # upstream. NULLs are ignored, matching SQL SUM over matched rows.
        aggs.append(F.sum(F.col(c).cast("long")).alias(f"sum_{c}"))
    stats = src.groupBy("_file").agg(*aggs)
    if bloom_col is None:
        return stats
    if bloom_capacity is None:
        n_files = max(len(df.inputFiles()), 1)
        total = df.count()
        bloom_capacity = max(64, (2 * total) // n_files)
    m, k = design(bloom_capacity, bloom_fpp)
    keys = src.where(F.col(bloom_col).isNotNull()).select(
        "_file", _key_expr(df, bloom_col).alias("_k"))
    blooms = sketch_aggregate(
        keys, "_k", lambda: BloomFilter(m, k, seed), group_cols=("_file",)
    ).withColumnRenamed("sketch", "bloom")
    # a file with only NULL keys has no bloom row: empty filter (matches none)
    return stats.join(blooms, "_file", "left")


def _range_keep(zm: DataFrame, col: str, lo, hi) -> DataFrame:
    keep = F.lit(True)
    if lo is not None:
        keep = keep & (F.col(f"max_{col}") >= F.lit(lo))
    if hi is not None:
        keep = keep & (F.col(f"min_{col}") <= F.lit(hi))
    return zm.where(keep)


def prune_files(
    zone_map: DataFrame,
    range_col: str | None = None,
    lo=None,
    hi=None,
    bloom_keys=None,
) -> list[str]:
    """File names that MIGHT contain rows matching the conjunction of a
    closed range predicate (``lo <= range_col <= hi``; one-sided with
    lo/hi None) and a Bloom membership predicate (``bloom col IN
    bloom_keys``) — sound over-approximation, never under.

    The range cut runs as a filter on the zone-map table; only the
    surviving (file, bloom) rows are collected (~1 row per file — the file
    list must reach the driver anyway to feed ``spark.read.parquet``).
    ``bloom_keys`` are raw column values; they are hashed through the SAME
    Spark expression the builder used (one driver-local tiny job), so
    string keys probe bit-identically to how they were inserted."""
    zm = zone_map
    if range_col is not None:
        zm = _range_keep(zm, range_col, lo, hi)
    if bloom_keys is None:
        return [r["_file"] for r in zm.select("_file").collect()]
    if len(bloom_keys) == 0:
        return []
    spark = zone_map.sparkSession
    kdf = spark.createDataFrame([(v,) for v in bloom_keys], ["v"])
    hashed = np.array(
        [r["k"] for r in kdf.select(_key_expr(kdf, "v").alias("k")).collect()],
        dtype=np.int64)
    out = []
    for r in zm.select("_file", "bloom").collect():
        if r["bloom"] is None:  # no non-null keys in this file
            continue
        bf = BloomFilter.from_bytes(bytes(r["bloom"]))
        if bool(bf.contains(hashed).any()):
            out.append(r["_file"])
    return out


def prune_files_ranges(zone_map: DataFrame, ranges: dict) -> list[str]:
    """Conjunctive multi-column range pruning: file names whose envelope
    overlaps EVERY ``col -> (lo, hi)`` range in ``ranges`` (closed ends;
    one-sided with lo/hi None) — the sound over-approximation of an AND of
    range predicates.  This is what a multi-dimensionally clustered layout
    (operators/zorder.py) buys: each column's envelope is tight per file,
    so each conjunct prunes independently and the kept set is the
    intersection.  Same contract as ``prune_files``: the caller re-applies
    the exact predicates to the pruned read."""
    zm = zone_map
    for col, (lo, hi) in ranges.items():
        zm = _range_keep(zm, col, lo, hi)
    return [r["_file"] for r in zm.select("_file").collect()]


def read_pruned(spark: SparkSession, path: str, files: list[str]) -> DataFrame:
    """Read only ``files`` of the layout at ``path`` (empty list -> the
    layout's schema with zero rows).  The caller MUST re-apply the exact
    predicate — pruning is an over-approximation by contract."""
    if not files:
        return read_layout(spark, path).where(F.lit(False))
    return spark.read.parquet(*files)


def read_layout(spark: SparkSession, path: str) -> DataFrame:
    """Full scan of a layout — flat dirs and the stream-ingested
    ``b{batch_id}/`` sub-dir form alike (recursive lookup; the sub-dirs are
    deliberately NOT key=value partition dirs, so the schema is identical
    to what ``read_pruned`` returns for the same files)."""
    return spark.read.option("recursiveFileLookup", "true").parquet(path)


def zone_map_ingest_stream(
    stream_df: DataFrame,
    layout_dir: str,
    zone_dir: str,
    checkpoint_dir: str,
    stat_cols: tuple[str, ...] = (),
    bloom_col: str | None = None,
    bloom_fpp: float = 0.01,
    bloom_capacity: int | None = None,
    seed: int = _ZONE_SEED,
):
    """STREAMING layout ingest with zone-map maintenance: each micro-batch
    lands as its own ``b{batch_id}/`` sub-dir of the layout and appends its
    files' zone-map rows (tagged ``batch_id``) to ``zone_dir`` — so the
    layout is queryable through ``prune_files``/``read_pruned`` the moment
    the batch commits, with no rebuild ever.

    Replay discipline (foreachBatch is at-least-once — the engine-wide
    pattern of streaming/incremental.replay_guarded_append): the zone-map
    append is guarded by a ``batch_id`` probe; the DATA write is idempotent
    by construction (``mode=overwrite`` of the batch's own sub-dir — a torn
    or redelivered batch replaces its dir wholesale, never duplicates).
    Order matters: data first, then map rows — a crash in between replays
    into the overwrite, and the map never references files that don't
    exist.

    ``bloom_capacity`` should be PINNED by the caller for a streamed layout
    (per-batch auto-sizing would give each batch's files differently-sized
    filters — still correct, since every blob self-describes its params,
    but pinning keeps map rows comparable to a scratch rebuild).  Returns
    the started query (availableNow drain; await + stop is the caller's
    job)."""
    from pyspark.errors import AnalysisException

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        try:
            done = (
                spark.read.parquet(zone_dir)
                .filter(F.col("batch_id") == batch_id).limit(1).count() > 0
            )
        except AnalysisException:
            done = False
        if done:
            return
        bdir = f"{layout_dir}/b{batch_id}"
        batch_df.write.mode("overwrite").parquet(bdir)
        rows = build_zone_map(
            spark.read.parquet(bdir), stat_cols, bloom_col,
            bloom_fpp=bloom_fpp, bloom_capacity=bloom_capacity, seed=seed)
        rows.withColumn("batch_id", F.lit(batch_id).cast("long")).write.mode(
            "append").parquet(zone_dir)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def count_range(spark: SparkSession, path: str, zone_map: DataFrame,
                col: str, lo=None, hi=None) -> int:
    """EXACT ``COUNT(*) WHERE lo <= col <= hi`` answered mostly from
    METADATA: a file whose [min, max] envelope lies WHOLLY inside the range
    contributes its non-null count (``nvals_<col>``) without being opened;
    only BOUNDARY files (envelope overlaps the range but isn't contained)
    are scanned, with the exact predicate deciding row by row.  On a
    range-clustered layout the boundary set is O(1) files regardless of
    how wide the range is — the metadata answers the bulk.

    Exactness: contained-file credit counts exactly the rows the predicate
    would match there (every non-null value lies in [min, max] ⊆ [lo, hi];
    NULLs never match a range predicate and are excluded from ``nvals``);
    files whose envelope misses the range contain no matching rows (NULL
    envelopes — all-null files — prune the same way); boundary files are
    decided exactly.  The three sets partition the layout."""
    zm = zone_map.select(
        "_file", F.col(f"nvals_{col}").alias("_nv"),
        F.col(f"min_{col}").alias("_mn"), F.col(f"max_{col}").alias("_mx"))
    keep = F.lit(True)
    contained = F.lit(True)
    if lo is not None:
        keep = keep & (F.col("_mx") >= F.lit(lo))
        contained = contained & (F.col("_mn") >= F.lit(lo))
    if hi is not None:
        keep = keep & (F.col("_mn") <= F.lit(hi))
        contained = contained & (F.col("_mx") <= F.lit(hi))
    rows = zm.where(keep).withColumn("_in", contained).collect()
    meta_n = sum(r["_nv"] for r in rows if r["_in"])
    boundary = [r["_file"] for r in rows if not r["_in"]]
    if not boundary:
        return int(meta_n)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(col) <= F.lit(hi))
    return int(meta_n) + read_pruned(spark, path, boundary).where(pred).count()


def sum_range(spark: SparkSession, path: str, zone_map: DataFrame,
              range_col: str, sum_col: str, lo=None, hi=None) -> int:
    """EXACT ``SUM(sum_col) WHERE lo <= range_col <= hi`` answered mostly
    from METADATA — count_range's three-way split with the per-file
    ``sum_<sum_col>`` credit: a file wholly contained in the range whose
    ``range_col`` has NO NULLs (``nvals == n_rows`` — a NULL range key
    never matches, but its sum_col value is baked into the file's sum)
    credits its stored sum unopened; boundary/NULL-holding files are
    scanned with the exact predicate.  Returns 0 when nothing matches
    (COALESCE'd — the SQL twin should COALESCE too).  Exact by the same
    partition argument as count_range; BIGINT arithmetic throughout."""
    for need in (f"min_{range_col}", f"nvals_{range_col}", f"sum_{sum_col}"):
        if need not in zone_map.columns:
            raise ValueError(
                f"sum_range: zone map lacks {need} — build with the range "
                "column in stat_cols and the sum column in sum_cols")
    zm = zone_map.select(
        "_file", "n_rows", F.col(f"nvals_{range_col}").alias("_nv"),
        F.col(f"min_{range_col}").alias("_mn"),
        F.col(f"max_{range_col}").alias("_mx"),
        F.col(f"sum_{sum_col}").alias("_sm"))
    keep = F.lit(True)
    contained = F.lit(True)
    if lo is not None:
        keep = keep & (F.col("_mx") >= F.lit(lo))
        contained = contained & (F.col("_mn") >= F.lit(lo))
    if hi is not None:
        keep = keep & (F.col("_mn") <= F.lit(hi))
        contained = contained & (F.col("_mx") <= F.lit(hi))
    contained = contained & (F.col("_nv") == F.col("n_rows"))
    rows = zm.where(keep).withColumn("_in", contained).collect()
    meta_sum = sum(r["_sm"] or 0 for r in rows if r["_in"])
    boundary = [r["_file"] for r in rows if not r["_in"]]
    if not boundary:
        return int(meta_sum)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(range_col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(range_col) <= F.lit(hi))
    scanned = (read_pruned(spark, path, boundary).where(pred)
               .agg(F.sum(F.col(sum_col).cast("long"))).first()[0])
    return int(meta_sum) + int(scanned or 0)


def expire_batches(spark: SparkSession, layout_dir: str, zone_dir: str,
                   up_to_batch_id: int) -> int:
    """RETENTION for a stream-ingested layout: drop every ``b{k}`` sub-dir
    with ``k <= up_to_batch_id`` together with its zone-map rows — the
    whole-block eviction the reference's ``expire`` performs on its oldest
    tree (PMIndex/HBI.java:209-211), at batch granularity.

    Crash ordering: the surviving zone-map rows are localCheckpoint'ed
    (the map overwrite would otherwise delete files its own plan is still
    reading), the MAP is rewritten FIRST, the data dirs deleted after — a
    crash in between leaves unreferenced garbage dirs (harmless to every
    zone-map-driven reader), never a map row pointing at a deleted file.
    Must not run concurrently with an active ingest stream (same rule as
    every compaction in this engine), and any LAZY plan still reading
    ``zone_dir`` must be materialized (localCheckpoint/collect) before the
    call — the overwrite deletes the files such a plan would re-read (the
    engine-wide compaction trap).  Returns the number of expired batches."""
    import shutil

    zm = spark.read.parquet(zone_dir)
    doomed = sorted(
        r["batch_id"] for r in
        zm.select("batch_id").distinct()
          .where(F.col("batch_id") <= up_to_batch_id).collect())
    if not doomed:
        return 0
    keep = zm.where(F.col("batch_id") > up_to_batch_id).localCheckpoint()
    keep.write.mode("overwrite").parquet(zone_dir)
    for k in doomed:
        shutil.rmtree(f"{layout_dir}/b{k}", ignore_errors=True)
    return len(doomed)


def compact_batches(
    spark: SparkSession,
    layout_dir: str,
    zone_dir: str,
    up_to_batch_id: int,
    stat_cols: tuple[str, ...] = (),
    bloom_col: str | None = None,
    bloom_fpp: float = 0.01,
    bloom_capacity: int | None = None,
    seed: int = _ZONE_SEED,
    target_files: int = 1,
) -> int:
    """COMPACTION for a stream-ingested layout: merge every batch dir with
    ``batch_id <= up_to_batch_id`` into one ``c{up_to_batch_id}/`` dir of
    ``target_files`` files and replace their zone-map rows with the merged
    dir's (built with the SAME stat/bloom params the ingest pinned — pass
    them again; rows carry ``batch_id = up_to_batch_id``, the keep-the-max
    guard discipline of profile/gram-df compaction).  Small per-batch files
    are the streaming tax; this pays it back without a full rebuild —
    untouched batches' rows and files are byte-identical.

    Crash ordering (the engine-wide compaction discipline): compacted DATA
    first into a fresh dir (unreferenced until the map commits), then the
    MAP overwrite (survivors localCheckpoint'ed — the overwrite deletes
    files its own plan would re-read), old dirs deleted last — a crash
    leaves garbage dirs, never a map row pointing at a deleted file.
    Refuses if the target dir already exists (recompacting the same
    boundary; pick a later one) and must not run concurrently with an
    active ingest stream or pending replays — after compaction a replayed
    old batch would probe its batch_id, find nothing, and double-ingest
    (same contract as expire_batches).  Returns the number of batch dirs
    compacted (0 = no-op)."""
    import os
    import shutil

    zm = spark.read.parquet(zone_dir)
    doomed = zm.where(F.col("batch_id") <= up_to_batch_id)
    doomed_files = [r["_file"] for r in doomed.select("_file").collect()]
    if not doomed_files:
        return 0
    n_batches = doomed.select("batch_id").distinct().count()
    target = f"{layout_dir}/c{up_to_batch_id}"
    if os.path.isdir(target):
        raise ValueError(
            f"compact_batches: {target} already exists — this boundary was "
            "already compacted; pick a later up_to_batch_id")
    spark.read.parquet(*doomed_files).coalesce(int(target_files)).write.mode(
        "error").parquet(target)
    new_rows = build_zone_map(
        spark.read.parquet(target), stat_cols, bloom_col,
        bloom_fpp=bloom_fpp, bloom_capacity=bloom_capacity, seed=seed,
    ).withColumn("batch_id", F.lit(int(up_to_batch_id)).cast("long"))
    keep = (
        zm.where(F.col("batch_id") > up_to_batch_id)
        .unionByName(new_rows, allowMissingColumns=True)
        .localCheckpoint()
    )
    keep.write.mode("overwrite").parquet(zone_dir)
    root = os.path.abspath(layout_dir)
    for d in sorted({os.path.dirname(f) for f in doomed_files}):
        # _file values are Hadoop URIs (file:/...) — strip the scheme for
        # the local filesystem delete; NEVER rmtree the layout root (a
        # flat-laid file's parent IS the root, which now holds the c-dir)
        local = d[5:] if d.startswith("file:") else d
        if os.path.abspath(local) == root:
            for f in doomed_files:
                fl = f[5:] if f.startswith("file:") else f
                if os.path.dirname(os.path.abspath(fl)) == root:
                    try:
                        os.remove(fl)
                    except FileNotFoundError:
                        pass
            continue
        shutil.rmtree(local, ignore_errors=True)
    return int(n_batches)


def envelope_touched_files(zm: DataFrame, keys: DataFrame,
                           key_col: str) -> list[str]:
    """File names whose [min, max] key envelope can contain some key of
    ``keys`` (one distinct-key column frame) — the tiny map broadcasts
    against the keys, only file NAMES are collected.  Sound: a file whose
    envelope excludes every key cannot hold a matching row; NULL-envelope
    (all-NULL key) files never match non-null keys."""
    if f"min_{key_col}" not in zm.columns:
        raise ValueError(
            f"zone map lacks min_/max_{key_col} envelopes — build it with "
            "the key in stat_cols")
    env = F.broadcast(zm.select(
        "_file", F.col(f"min_{key_col}").alias("_mn"),
        F.col(f"max_{key_col}").alias("_mx")))
    return [r["_file"] for r in (
        keys.join(env, (F.col(key_col) >= F.col("_mn"))
                  & (F.col(key_col) <= F.col("_mx")))
        .select("_file").distinct().collect())]


def merge_into_layout(
    spark: SparkSession,
    layout_dir: str,
    zone_map_path: str,
    source: DataFrame,
    key_col: str,
    stat_cols: tuple[str, ...] = (),
    bloom_col: str | None = None,
    bloom_fpp: float = 0.01,
    bloom_capacity: int | None = None,
    seed: int = _ZONE_SEED,
    target_files: int = 1,
) -> dict:
    """COPY-ON-WRITE MERGE (upsert) into a zone-mapped layout — the
    Delta/Iceberg ``MERGE INTO`` shape: rows of ``source`` REPLACE target
    rows sharing their ``key_col`` and are INSERTED where unmatched, by
    rewriting ONLY the files whose zone-map key envelope can contain a
    source key.  On a key-clustered layout a batch of updates touches
    O(its key range) files; everything else is untouched bytes — at 100 TB
    that, not the join, is the whole game.

    Mechanics: the tiny zone map (1 row/file) is broadcast against the
    DISTINCT source keys (``min_key <= k <= max_key`` — sound: a file
    whose envelope excludes every source key cannot hold a matched row);
    only file NAMES are collected.  The rewrite is (touched rows
    LEFT ANTI source keys) ∪ source, written to a fresh ``u{n}/`` sub-dir;
    zone-map rows for the new files are built with the params passed
    (pin the same stat/bloom geometry the layout uses).  Crash ordering:
    new data first (unreferenced until the map commits), map overwrite
    second (survivors localCheckpoint'ed), touched FILES deleted last.
    NULL source keys are refused (MERGE on NULL is undefined on every
    engine); duplicate source keys are refused too (two updates for one
    key is a lost-update race — dedupe upstream, deterministically).
    Returns ``{"n_files_touched", "n_files_total", "n_source_rows"}``.

    Not for stream-guarded layouts mid-flight: like compaction/expire,
    must not run concurrently with an active ingest stream; on maps
    carrying ``batch_id`` the new rows take the current max (keep-the-max
    guard discipline)."""
    import os
    import shutil

    skeys = source.where(F.col(key_col).isNotNull()).select(key_col)
    n_src = source.count()
    if skeys.count() != n_src:
        raise ValueError("merge_into_layout: NULL source keys are refused")
    sdist = skeys.distinct()
    if sdist.count() != n_src:
        raise ValueError(
            "merge_into_layout: duplicate source keys are refused — two "
            "updates for one key is a lost-update race; dedupe upstream")
    zm = read_zone_map(spark, zone_map_path)
    touched = envelope_touched_files(zm, sdist, key_col)
    n_total = zm.count()
    if touched:
        old = spark.read.parquet(*touched)
        keep = old.join(sdist, key_col, "left_anti")
        new_data = keep.unionByName(source.select(*old.columns))
    else:
        new_data = source
    existing = [d for d in os.listdir(layout_dir)
                if d.startswith("u") and d[1:].isdigit()]
    nxt = max((int(d[1:]) for d in existing), default=-1) + 1
    target = f"{layout_dir}/u{nxt}"
    new_data.coalesce(int(target_files)).write.mode("error").parquet(target)
    new_rows = build_zone_map(
        spark.read.parquet(target), stat_cols, bloom_col,
        bloom_fpp=bloom_fpp, bloom_capacity=bloom_capacity, seed=seed)
    if "batch_id" in zm.columns:
        top = zm.agg(F.max("batch_id")).first()[0]
        new_rows = new_rows.withColumn(
            "batch_id", F.lit(int(top if top is not None else 0)).cast("long"))
    survivors = zm.where(~F.col("_file").isin(touched)) if touched else zm
    merged_map = survivors.unionByName(
        new_rows, allowMissingColumns=True).localCheckpoint()
    merged_map.write.mode("overwrite").parquet(zone_map_path)
    for f in touched:
        local = f[5:] if f.startswith("file:") else f
        try:
            os.remove(local)
        except FileNotFoundError:
            pass
    # a fully-rewritten SUB-dir may be left empty of parquet files; sweep
    # such dirs (never the layout root — flat layouts put files there, and
    # the fresh u-dir lives under it)
    root = os.path.abspath(layout_dir)
    for d in {os.path.dirname(f[5:] if f.startswith("file:") else f)
              for f in touched}:
        try:
            if os.path.abspath(d) != root and not any(
                    n.endswith(".parquet") for n in os.listdir(d)):
                shutil.rmtree(d, ignore_errors=True)
        except FileNotFoundError:
            pass
    return {"n_files_touched": len(touched), "n_files_total": int(n_total),
            "n_source_rows": int(n_src)}


def delete_range_from_layout(
    spark: SparkSession,
    layout_dir: str,
    zone_map_path: str,
    col: str,
    lo=None,
    hi=None,
    stat_cols: tuple[str, ...] = (),
    bloom_col: str | None = None,
    bloom_fpp: float = 0.01,
    bloom_capacity: int | None = None,
    seed: int = _ZONE_SEED,
    target_files: int = 1,
) -> dict:
    """COPY-ON-WRITE ``DELETE WHERE lo <= col <= hi`` (closed ends,
    one-sided with None) over a zone-mapped layout, with the count_range
    three-way split driving the I/O:

    * files whose envelope MISSES the range are untouched (no read, no
      write);
    * files wholly CONTAINED in the range with no NULL ``col`` rows
      (``nvals == n_rows`` — NULLs never match a range predicate and must
      survive) are dropped METADATA-ONLY: the file is deleted and its map
      row removed, zero rows read;
    * BOUNDARY files (envelope overlaps but isn't contained, or contained
      but holding NULL rows) are rewritten keeping the complement
      (``col < lo OR col > hi OR col IS NULL``) into a fresh ``d{n}/``
      sub-dir with new map rows.

    On a range-clustered layout a wide delete is almost entirely
    metadata-only — the same O(boundary) bound as count_range.  Crash
    ordering: rewrite data first, map overwrite second, doomed files
    deleted last (garbage dirs, never dangling map rows).  Same
    no-concurrent-writers contract as merge/compact/expire.  Returns
    ``{"n_files_dropped", "n_files_rewritten", "n_files_total"}``."""
    import os
    import shutil

    zm = read_zone_map(spark, zone_map_path)
    for need in (f"min_{col}", f"max_{col}", f"nvals_{col}"):
        if need not in zm.columns:
            raise ValueError(
                f"delete_range_from_layout: zone map lacks {need} — build "
                "it with the column in stat_cols")
    keep = F.lit(True)
    contained = F.lit(True)
    if lo is not None:
        keep = keep & (F.col(f"max_{col}") >= F.lit(lo))
        contained = contained & (F.col(f"min_{col}") >= F.lit(lo))
    if hi is not None:
        keep = keep & (F.col(f"min_{col}") <= F.lit(hi))
        contained = contained & (F.col(f"max_{col}") <= F.lit(hi))
    rows = zm.select(
        "_file", "n_rows", F.col(f"nvals_{col}").alias("_nv"),
        keep.alias("_touch"),
        (contained & (F.col(f"nvals_{col}") == F.col("n_rows"))).alias("_drop"),
    ).collect()
    n_total = len(rows)
    dropped = [r["_file"] for r in rows if r["_touch"] and r["_drop"]]
    boundary = [r["_file"] for r in rows if r["_touch"] and not r["_drop"]]
    new_rows = None
    if boundary:
        surv = F.lit(False) | F.col(col).isNull()
        if lo is not None:
            surv = surv | (F.col(col) < F.lit(lo))
        if hi is not None:
            surv = surv | (F.col(col) > F.lit(hi))
        existing = [d for d in os.listdir(layout_dir)
                    if d.startswith("d") and d[1:].isdigit()]
        nxt = max((int(d[1:]) for d in existing), default=-1) + 1
        target = f"{layout_dir}/d{nxt}"
        (spark.read.parquet(*boundary).where(surv)
         .coalesce(int(target_files)).write.mode("error").parquet(target))
        new_rows = build_zone_map(
            spark.read.parquet(target), stat_cols, bloom_col,
            bloom_fpp=bloom_fpp, bloom_capacity=bloom_capacity, seed=seed)
        if "batch_id" in zm.columns:
            top = zm.agg(F.max("batch_id")).first()[0]
            new_rows = new_rows.withColumn(
                "batch_id",
                F.lit(int(top if top is not None else 0)).cast("long"))
    doomed = dropped + boundary
    survivors = zm.where(~F.col("_file").isin(doomed)) if doomed else zm
    merged = (survivors.unionByName(new_rows, allowMissingColumns=True)
              if new_rows is not None else survivors).localCheckpoint()
    merged.write.mode("overwrite").parquet(zone_map_path)
    root = os.path.abspath(layout_dir)
    for f in doomed:
        local = f[5:] if f.startswith("file:") else f
        try:
            os.remove(local)
        except FileNotFoundError:
            pass
    for d in {os.path.dirname(f[5:] if f.startswith("file:") else f)
              for f in doomed}:
        try:
            if os.path.abspath(d) != root and not any(
                    n.endswith(".parquet") for n in os.listdir(d)):
                shutil.rmtree(d, ignore_errors=True)
        except FileNotFoundError:
            pass
    return {"n_files_dropped": len(dropped),
            "n_files_rewritten": len(boundary),
            "n_files_total": int(n_total)}


def vacuum_layout(spark: SparkSession, layout_dir: str,
                  zone_map_path: str) -> list[str]:
    """ORPHAN-FILE GC: delete every parquet data file under ``layout_dir``
    that the zone map does not reference — the garbage that this module's
    crash orderings deliberately leave behind (data written, crash before
    the map commit).  Zone-map-driven readers never see orphans, but the
    full recursive scan (``read_layout``) WOULD double-count them after a
    crash-and-replay, and they hold disk — vacuum restores the invariant
    that the map IS the layout.  Also sweeps sub-dirs left with no data
    files.  Must not run concurrently with a writer (a just-written,
    not-yet-committed dir looks exactly like garbage — same contract as
    every compaction here).  Returns the removed file paths."""
    import os
    import shutil

    zm = read_zone_map(spark, zone_map_path)
    norm = lambda f: os.path.abspath(  # noqa: E731
        f[5:] if f.startswith("file:") else f)
    referenced = {norm(r["_file"]) for r in zm.select("_file").collect()}
    removed = []
    root = os.path.abspath(layout_dir)
    for dirpath, _dirs, files in os.walk(root):
        for n in files:
            p = os.path.join(dirpath, n)
            if n.endswith(".parquet") and os.path.abspath(p) not in referenced:
                os.remove(p)
                removed.append(p)
    for dirpath, _dirs, _files in sorted(
            (t[0], t[1], t[2]) for t in os.walk(root)):
        if os.path.abspath(dirpath) == root:
            continue
        try:
            if not any(n.endswith(".parquet")
                       for _, _, fs in os.walk(dirpath) for n in fs):
                shutil.rmtree(dirpath, ignore_errors=True)
        except FileNotFoundError:
            pass
    return removed


def write_zone_map(zone_map: DataFrame, path: str) -> None:
    """Persist the zone map (tiny: ~1 row per data file)."""
    zone_map.coalesce(1).write.mode("overwrite").parquet(path)


def read_zone_map(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def append_zone_map(zone_map: DataFrame, new_rows: DataFrame) -> DataFrame:
    """Zone map of a layout after new files are added: files are immutable,
    so maintenance is a pure union of the new files' rows."""
    return zone_map.unionByName(new_rows, allowMissingColumns=True)
