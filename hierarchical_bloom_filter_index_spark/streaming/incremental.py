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
* expire            — drop whole windows older than a horizon (the w_id
  predicate analog of whole-tree eviction; on Iceberg this is a
  partition-drop / snapshot-expiry metadata operation).
* incremental_index_stream — Structured Streaming: every micro-batch of new
  corpus files becomes sketch rows appended to the index directory, with
  checkpointed progress (exactly-once per file source guarantees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import HbiConfig
from ..corpus import CORPUS_SCHEMA
from ..operators.build import build_index


def append_increment(index: DataFrame, new_docs: DataFrame, cfg: HbiConfig) -> DataFrame:
    """insert(): extend the sketch table with newly arrived documents."""
    if cfg.axis != "doc":
        raise NotImplementedError(
            "incremental append on the global axis requires offset continuation; "
            "rebuild with build_index for now"
        )
    return index.unionByName(build_index(new_docs, cfg))


def expire(index: DataFrame, cfg: HbiConfig, min_leaf_w_id: int) -> DataFrame:
    """expire(): whole-window eviction by horizon predicate
    (PMIndex/HBI.java:209-211). ``min_leaf_w_id`` is the horizon at the
    deepest level; each coarser level L keeps w_id >= horizon >> (deepest-L).
    Pure predicate — Iceberg/Parquet partition pruning makes it a metadata
    operation at scale."""
    return index.filter(
        F.expr(f"w_id >= shiftright(CAST({int(min_leaf_w_id)} AS BIGINT), {cfg.deepest} - level)")
    )


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
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        build_index(batch_df, cfg).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(output_path)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
