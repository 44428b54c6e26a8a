"""Recommended SparkSession configuration for this engine.

Encodes the settings the pipelines assume: Arrow everywhere (every custom
stage is Arrow-batched), AQE with skew handling (the corpus's `source`
dimension is deliberately skewed), and shuffle partitions sized to the
session's parallelism rather than the 200 default (sketch-state shuffles are
many small rows; 200 partitions of nothing costs scheduling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hbi-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    master = master or os.environ.get("HBI_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # deep lazy cascades can render plan strings big enough to OOM small
        # driver heaps when AQE logs plan changes — cap the rendered length
        .config("spark.sql.maxPlanStringLength", str(512 * 1024))
        .config("spark.ui.enabled", os.environ.get("HBI_UI", "false"))
    )
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 8
        except ValueError:
            n = 8
        shuffle_partitions = max(n, 8)
    b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if driver_memory or os.environ.get("SPARK_DRIVER_MEM"):
        b = b.config("spark.driver.memory", driver_memory or os.environ["SPARK_DRIVER_MEM"])
    return b.getOrCreate()
