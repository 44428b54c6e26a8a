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


# ---------------------------------------------------------------------------
# stateful streaming sessionization (event-time gap + timeout)
# ---------------------------------------------------------------------------
SESS_SCHEMA = "user_id string, ts timestamp"
GAP_US = 600_000_000  # 600 s


def _drain_sessions(spark, inp, chk, out):
    from hierarchical_bloom_filter_index_spark.streaming.stateful import (
        session_state_stream,
    )

    stream = spark.readStream.schema(SESS_SCHEMA).parquet(inp)
    q = (
        session_state_stream(stream, GAP_US)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _ev_df(spark, rows):
    return spark.createDataFrame(rows, "user_id string, t_us long").select(
        "user_id", F.timestamp_micros("t_us").alias("ts"))


def test_session_stream_single_drain_closes_expired(spark, tmp_path):
    from hierarchical_bloom_filter_index_spark.operators.sessions import sessionize

    S = 1_000_000
    rows = [
        ("u1", 100 * S), ("u1", 200 * S), ("u1", 2000 * S), ("u1", 2100 * S),
        ("u2", 50 * S), ("u2", 5000 * S), ("u2", 5100 * S),
        ("u3", 400 * S),
    ]
    inp, chk, out = (str(tmp_path / d) for d in ("in", "chk", "out"))
    os.makedirs(inp)
    ev = _ev_df(spark, rows)
    ev.write.mode("append").parquet(inp)
    _drain_sessions(spark, inp, chk, out)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))

    # an availableNow drain ends with a no-data batch that advances the
    # watermark to the GLOBAL max event time, so every session whose
    # end + gap <= that watermark times out and closes; only sessions
    # within gap of the stream's end stay open (here u2's last)
    batch = sessionize(
        ev.select("user_id", F.unix_micros("ts").alias("t_us")), GAP_US)
    max_ts = max(t for _, t in rows)
    want = sorted(map(tuple, batch
                      .filter(F.col("t_end") + GAP_US <= max_ts)
                      .select("user_id", "t_start", "t_end", "n_events")
                      .collect()))
    assert got == want
    assert got == [("u1", 100 * S, 200 * S, 2),
                   ("u1", 2000 * S, 2100 * S, 2),
                   ("u2", 50 * S, 50 * S, 1),
                   ("u3", 400 * S, 400 * S, 1)]


def test_session_stream_cross_batch_merge_and_timeout(spark, tmp_path):
    S = 1_000_000
    inp, chk, out = (str(tmp_path / d) for d in ("in", "chk", "out"))
    os.makedirs(inp)
    # drain 1: both sessions stay open (end + gap > drain-1 max ts 650s)
    _ev_df(spark, [("u1", 100 * S), ("u1", 200 * S),
                   ("u2", 650 * S)]).write.mode("append").parquet(inp)
    _drain_sessions(spark, inp, chk, out)
    assert spark.read.parquet(out).count() == 0  # nothing closed yet

    # drain 2: u1's 750s event is IN-GAP vs the stored 200s tail (state
    # merge across batches) and not late (>= wm 650s); the 5000s event
    # then closes the merged session by gap; u2 (no data) times out when
    # the final no-data batch advances the watermark to 5000s
    _ev_df(spark, [("u1", 750 * S), ("u1", 5000 * S)]).write.mode(
        "append").parquet(inp)
    _drain_sessions(spark, inp, chk, out)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == [
        ("u1", 100 * S, 750 * S, 3),  # spans batches: 100,200 (+750 merged)
        ("u2", 650 * S, 650 * S, 1),  # closed by event-time timeout
    ]
