"""applyInPandasWithState running sketches: streaming state after N
micro-batches must be register-identical to a batch-built sketch over the
same rows, and must survive a restart from checkpoint."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.sketches import HyperLogLog, from_bytes
from hierarchical_bloom_filter_index_spark.streaming.stateful import sketch_state_stream


def _run_stream(spark, inp, chk, out):
    stream = spark.readStream.schema(C.CORPUS_SCHEMA).parquet(inp)
    updated = sketch_state_stream(
        stream,
        factory=lambda: HyperLogLog(p=12, seed=3),
        estimate=lambda sk: sk.estimate(),
    )
    q = (
        updated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stateful_sketch_stream_matches_batch(spark, tmp_path):
    inp, chk, out = (str(tmp_path / d) for d in ("in", "chk", "out"))
    os.makedirs(inp)
    corp = C.generate_corpus(spark, sf=0.002, seed=8).cache()
    b1 = corp.filter(F.col("source").isin("uniform", "markov"))
    b2 = corp.filter(~F.col("source").isin("uniform", "markov"))

    b1.write.mode("append").parquet(inp)
    _run_stream(spark, inp, chk, out)
    # restart from checkpoint with new files — state must carry over
    b2.write.mode("append").parquet(inp)
    _run_stream(spark, inp, chk, out)

    res = spark.read.parquet(out)
    # latest row per source = final state
    latest = {r["source"]: r for r in res.orderBy("n_docs").collect()}
    batch_counts = {r["source"]: (r["d"], r["t"]) for r in
                    corp.groupBy("source").agg(F.count("*").alias("d"), F.sum("n_tok").alias("t")).collect()}
    assert set(latest) == set(batch_counts)
    for src, row in latest.items():
        assert (row["n_docs"], row["n_tokens"]) == batch_counts[src], src
        # streaming state == batch-built sketch, register for register
        local = HyperLogLog(p=12, seed=3)
        for r in corp.filter(F.col("source") == src).collect():
            local.update(np.asarray(r["tokens"], dtype=np.int64))
        streamed = from_bytes(bytes(row["sketch"]))
        assert np.array_equal(streamed.regs, local.regs), src
        assert row["estimate"] == pytest.approx(local.estimate())
