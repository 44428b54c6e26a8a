"""Explicit skew handling (north_rule: "partitioning / shuffle / skew handled
explicitly").

Two mechanisms, used at different points:

1. ``salted_repartition`` — break hot keys BEFORE a wide stage: rows are
   spread over (key, salt) so one giant ``source`` (the zipf1.5 fixture is
   10x heavier by construction) cannot pin a single task. Used ahead of the
   index build and any per-source pandas stage.

2. The two-phase sketch aggregation itself (operators/aggregates.py) is the
   structural skew answer for grouped sketches: partial states are built
   per PARTITION per group, so the merge stage sees at most n_partitions
   rows per group regardless of how skewed the raw rows are — the map-side
   combine that Catalyst applies to built-in aggregates, made explicit.

AQE skew-join splitting stays enabled globally (conftest/bench configs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(df: DataFrame, key_col: str, n_salts: int = 16, n_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, random-but-deterministic salt) so each hot key
    spreads over n_salts tasks. Salt = xxhash of a stable row identity, not
    rand(): deterministic across retries (a rand() salt double-counts on
    task re-execution)."""
    salt = (F.abs(F.xxhash64(*df.columns)) % n_salts).alias("_salt")
    out = df.withColumn("_salt", salt)
    if n_partitions:
        out = out.repartition(n_partitions, F.col(key_col), F.col("_salt"))
    else:
        out = out.repartition(F.col(key_col), F.col("_salt"))
    return out.drop("_salt")


def partition_size_stats(df: DataFrame) -> list[int]:
    """Rows per partition — the skew measurement used by tests/benchmarks."""
    return [
        r["c"]
        for r in df.groupBy(F.spark_partition_id().alias("p")).agg(F.count("*").alias("c"))
        .orderBy("p")
        .collect()
    ]
