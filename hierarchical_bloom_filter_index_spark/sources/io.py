"""Index persistence + checkpointed, resumable builds with per-shard lineage.

The sketch table is written as Parquet partitioned by ``level`` (and bucketed
by shard), so queries that touch one level prune every other level's files at
scan time (Iceberg would make this a partition spec + snapshot expiry; plain
Parquet directories are the sandbox stand-in — the layout is identical).

Resumable build (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"): the corpus is split into deterministic shards by
doc_id hash; each shard's sketch rows are written atomically under
``shard=<i>/`` followed by a lineage record (shard id, docs, tokens, rows,
state hash, wall time). A killed build re-runs only the missing shards; a
completed shard is never recomputed, and the final table is byte-identical to
an uninterrupted run (verified in tests). This is the distributed analog of
the reference's snapshot/detach buffers (tree/StreamBuffer.java:61-92).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import HbiConfig
from ..operators.build import build_index

LINEAGE_FILE = "_lineage.json"
CONFIG_FILE = "_hbi_config.json"


def write_index(index: DataFrame, path: str) -> None:
    index.write.mode("overwrite").partitionBy("level").parquet(path)


def read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Doc-sharded layout + per-doc TAKEDOWN (retention / right-to-be-forgotten)
#
# Any per-doc-keyed artifact (the doc-axis Bloom/window-sketch tables,
# MinHash signature tables, ...) written PARTITIONED BY
# doc_shard = pmod(xxhash64(id), n_shards) supports planned-maintenance
# removal: a takedown set hashes into a few shards, only those directories
# are read and rewritten (dynamic partition overwrite), everything else is
# never touched. The same discipline as the gram-df index maintenance
# (operators/contamination._merge_gram_df_buckets); Iceberg would express
# it as a bucket partition transform + overwrite-by-filter.
# ---------------------------------------------------------------------------
def write_index_doc_sharded(index: DataFrame, path: str,
                            id_col: str = "doc_id",
                            shard_bits: int = 6) -> None:
    """Persist a per-doc-keyed table partitioned by a hash shard of its id
    column. ``path/shards`` holds the data; ``path/meta`` pins (id_col,
    n_shards) — readers and takedowns take geometry from here, never from
    callers. ONE repartition by shard before the write keeps one writer
    task per directory."""
    n_shards = 1 << shard_bits
    spark = index.sparkSession
    (
        index.withColumn(
            "doc_shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)))
        .repartition("doc_shard")
        .write.mode("overwrite")
        .partitionBy("doc_shard")
        .parquet(f"{path}/shards")
    )
    spark.createDataFrame(
        [(id_col, int(n_shards))], "id_col string, n_shards int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def read_index_doc_sharded(spark: SparkSession, path: str,
                           doc_ids=None) -> DataFrame:
    """Open a ``write_index_doc_sharded`` layout. With ``doc_ids`` given,
    the scan prunes to the shards those ids hash into (partition filter)
    AND filters to the ids themselves — the per-doc point-lookup path."""
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    df = spark.read.parquet(f"{path}/shards")
    if doc_ids is not None:
        ids_df = _ids_frame(spark, df, meta["id_col"], doc_ids)
        shards = _ids_shards(ids_df, meta["id_col"], meta["n_shards"])
        df = df.filter(F.col("doc_shard").isin(shards)).join(
            F.broadcast(ids_df), on=meta["id_col"], how="left_semi")
    return df.drop("doc_shard")


def takedown_doc_index(spark: SparkSession, path: str, doc_ids) -> int:
    """Remove every row belonging to ``doc_ids`` from a
    ``write_index_doc_sharded`` layout, rewriting ONLY the shard
    directories that actually hold a removed doc's rows (dynamic partition
    overwrite; untouched shards' files are never read or written). Returns
    the number of shards rewritten — 0 when no removed id is present, so
    the operation is replay-idempotent. ``doc_ids`` may be a Python list
    (the legal-request shape) or a DataFrame with the id column (bulk
    retention sweeps). A shard emptied entirely is rmtree'd by hand —
    dynamic overwrite only replaces partitions PRESENT in the written
    data. Not concurrent-safe with an in-flight reader of the touched
    shards (the gram-df compaction discipline)."""
    import shutil

    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    id_col, n_shards = meta["id_col"], meta["n_shards"]
    data = spark.read.parquet(f"{path}/shards")
    ids_df = _ids_frame(spark, data, id_col, doc_ids)
    cand_shards = _ids_shards(ids_df, id_col, n_shards)
    if not cand_shards:
        return 0
    touched_rows = data.filter(F.col("doc_shard").isin(cand_shards)).join(
        F.broadcast(ids_df), on=id_col, how="left_semi")
    # shards that actually HOLD a removed doc's rows (absent ids = no-op)
    shards = sorted(
        int(r["doc_shard"])
        for r in touched_rows.select("doc_shard").distinct().collect())
    if not shards:
        return 0
    kept = (
        data.filter(F.col("doc_shard").isin(shards))
        .join(F.broadcast(ids_df), on=id_col, how="left_anti")
        .repartition("doc_shard")
        # materialize BEFORE the overwrite — Spark cannot overwrite a path
        # that still feeds the running plan
        .localCheckpoint()
    )
    present = {int(r["doc_shard"])
               for r in kept.select("doc_shard").distinct().collect()}
    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("doc_shard")
        .parquet(f"{path}/shards")
    )
    for s in shards:
        if s not in present:
            shutil.rmtree(f"{path}/shards/doc_shard={s}", ignore_errors=True)
    return len(shards)


def _ids_frame(spark: SparkSession, data: DataFrame, id_col: str,
               doc_ids) -> DataFrame:
    """Normalize a takedown set (list or DataFrame) to a one-column frame
    CAST to the index's id dtype — xxhash64 of a string and of a long
    differ, so shard computation must hash the exact stored type."""
    dtype = data.schema[id_col].dataType
    if isinstance(doc_ids, DataFrame):
        return doc_ids.select(F.col(id_col).cast(dtype).alias(id_col)).distinct()
    return spark.createDataFrame(
        [(str(x),) for x in doc_ids], f"{id_col} string"
    ).select(F.col(id_col).cast(dtype).alias(id_col)).distinct()


def _ids_shards(ids_df: DataFrame, id_col: str, n_shards: int) -> list[int]:
    """The shard ids a takedown set hashes into (bounded by n_shards, so
    the collect is driver-safe by construction)."""
    return sorted(
        int(r["s"])
        for r in ids_df.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(n_shards))).alias("s")
        ).distinct().collect())


def write_index_bucketed(index: DataFrame, table: str, n_buckets: int = 64) -> None:
    """Persist the sketch table partitioned by level AND bucketed+sorted by
    w_id: repeated candidate joins against one level read pre-clustered
    buckets, so the big (index) side of the join needs no Exchange — the
    co-located-join strategy for a long-lived index at 100 TB (Iceberg's
    bucket partition transform plays this role on a real catalog)."""
    (
        index.write.mode("overwrite")
        .partitionBy("level")
        .bucketBy(n_buckets, "w_id")
        .sortBy("w_id")
        .format("parquet")
        .saveAsTable(table)
    )


def read_index_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_index_segmented(index: DataFrame, path: str, seg_bits: int = 8) -> None:
    """Persist a GLOBAL-axis sketch table partitioned by (level, w_seg) with
    ``w_seg = w_id >> seg_bits``: the stream's time order IS the w_id order,
    so whole-window eviction (expire, PMIndex/HBI.java:209-211) maps to
    DROPPING fully-expired segment directories — a filesystem/metadata
    operation that never rewrites data (Iceberg's drop-partition / snapshot
    expiry; plain parquet directories are the sandbox stand-in)."""
    (
        index.withColumn("w_seg", F.shiftright(F.col("w_id"), seg_bits))
        .write.mode("overwrite")
        .partitionBy("level", "w_seg")
        .parquet(path)
    )


def expire_segments(spark: SparkSession, path: str, cfg: HbiConfig, min_leaf_w_id: int,
                    seg_bits: int = 8) -> int:
    """Evict everything older than ``min_leaf_w_id`` (a leaf-level horizon)
    from a segmented index: per level L the horizon is
    ``min_leaf_w_id >> (deepest - L)``; every segment directory whose windows
    all precede it is DELETED (metadata-only), and the one partial segment
    left at the boundary keeps a read-time w_id predicate (read back with
    read_index_expired). Returns the number of directories dropped."""
    import shutil

    dropped = 0
    for level_dir in sorted(os.listdir(path)):
        if not level_dir.startswith("level="):
            continue
        L = int(level_dir.split("=", 1)[1])
        horizon = min_leaf_w_id >> (cfg.deepest - L)
        full_segs_below = horizon >> seg_bits  # segments 0..this-1 are wholly expired
        for seg_dir in sorted(os.listdir(os.path.join(path, level_dir))):
            if not seg_dir.startswith("w_seg="):
                continue
            if int(seg_dir.split("=", 1)[1]) < full_segs_below:
                shutil.rmtree(os.path.join(path, level_dir, seg_dir))
                dropped += 1
    return dropped


def read_index_expired(spark: SparkSession, path: str, cfg: HbiConfig,
                       min_leaf_w_id: int) -> DataFrame:
    """Open a segmented index applying the expire predicate: dropped segments
    never appear in the scan (directory listing), the boundary segment is
    filtered by the pushed-down w_id predicate. Row-equal to
    streaming.expire() over the unpersisted table."""
    df = spark.read.parquet(path).drop("w_seg")
    return df.filter(
        F.expr(f"w_id >= shiftright(CAST({int(min_leaf_w_id)} AS BIGINT), {cfg.deepest} - level)")
    )


def _config_dict(cfg: HbiConfig) -> dict:
    return {
        "tree_span": cfg.tree_span, "leaf_span": cfg.leaf_span, "fpr": cfg.fpr,
        "vocab": cfg.vocab, "seed": cfg.seed, "ngram": cfg.ngram,
        "ngram_base_bits": cfg.ngram_base_bits, "axis": cfg.axis,
        "uniform_bloom": cfg.uniform_bloom, "uniform_level": cfg.uniform_level,
    }


def _read_lineage(path: str) -> dict:
    p = os.path.join(path, LINEAGE_FILE)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"shards": {}}


def _write_lineage(path: str, lineage: dict) -> None:
    tmp = os.path.join(path, LINEAGE_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(lineage, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, LINEAGE_FILE))


def build_index_checkpointed(
    corpus: DataFrame,
    cfg: HbiConfig,
    path: str,
    n_shards: int = 8,
) -> DataFrame:
    """Build the sketch table shard-by-shard with resume.

    Shard assignment is a deterministic hash of doc_id — independent of input
    partitioning, so a resumed run over a differently-partitioned corpus
    still produces identical shards. Each shard is one distributed job; a
    1000-executor cluster sets n_shards to a small multiple of its desired
    checkpoint granularity (checkpoint cost is one parquet write per shard).
    """
    spark = corpus.sparkSession
    os.makedirs(path, exist_ok=True)
    cfg_path = os.path.join(path, CONFIG_FILE)
    want = _config_dict(cfg) | {"n_shards": n_shards}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            have = json.load(f)
        if have != want:
            raise ValueError(f"checkpoint at {path} was built with different config: {have} != {want}")
    else:
        with open(cfg_path, "w") as f:
            json.dump(want, f, indent=1, sort_keys=True)

    lineage = _read_lineage(path)
    # pmod, not abs+%: abs(Long.MIN_VALUE) stays negative (or throws under
    # ANSI), which would silently drop that doc from every shard
    sharded = corpus.withColumn("_shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)))
    for shard in range(n_shards):
        if str(shard) in lineage["shards"]:
            continue
        t0 = time.time()
        part = sharded.filter(F.col("_shard") == shard).drop("_shard")
        idx = build_index(part, cfg)
        shard_dir = os.path.join(path, f"shard={shard}")
        idx.write.mode("overwrite").parquet(shard_dir)
        # metrics + state hash over the shard's sketch rows (order-free)
        written = spark.read.parquet(shard_dir)
        summary = written.agg(
            F.count("*").alias("rows"),
            F.sum("n_items").alias("items"),
            F.bit_xor(F.xxhash64(*[c for c in written.columns if c != "_shard"])).alias("h"),
        ).first()
        docs, toks = part.agg(F.count("*"), F.sum("n_tok")).first()
        lineage["shards"][str(shard)] = {
            "rows": summary["rows"] or 0,
            "items": int(summary["items"] or 0),
            "state_hash": hashlib.sha256(str(summary["h"]).encode()).hexdigest()[:16],
            "docs": docs,
            "tokens": int(toks or 0),
            "wall_sec": round(time.time() - t0, 3),
        }
        _write_lineage(path, lineage)
    return spark.read.option("basePath", path).parquet(os.path.join(path, "shard=*"))
