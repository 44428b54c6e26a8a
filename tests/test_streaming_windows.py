"""Event-time windowed aggregation with watermarks: stream == batch on the
same events, and LATE data beyond the watermark is dropped with its window
finalized — the bounded-state contract that makes an unbounded stream's
aggregation possible (the event-time analog of the count-axis expire())."""

import os
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.streaming.windows import (
    windowed_event_aggregate,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_equals_batch_windowed_agg(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = windowed_event_aggregate(events).collect()

    workdir = tempfile.mkdtemp(prefix="hbi_win_stream_")
    inp, chk = f"{workdir}/in", f"{workdir}/chk"
    events.write.mode("overwrite").parquet(inp)
    stream = spark.readStream.schema(events.schema).parquet(inp)
    agg = windowed_event_aggregate(stream, watermark="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("win_agg")
        .outputMode("complete").option("checkpointLocation", chk)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from win_agg").collect()
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch)) and len(batch) > 0


def test_late_rows_beyond_watermark_are_dropped(spark):
    """Two micro-batches (maxFilesPerTrigger=1): batch 1 advances the
    watermark past hour 3; batch 2's hour-3 event is LATE and must be
    dropped — its window never appears in the append-mode output, while the
    finalized early window appears exactly once."""
    workdir = tempfile.mkdtemp(prefix="hbi_win_late_")
    inp, chk, out = f"{workdir}/in", f"{workdir}/chk", f"{workdir}/out"
    os.makedirs(inp)
    schema = "ts timestamp, event_type string, value double"

    def ev(h, m=0):
        return datetime(2024, 1, 1, h, m)

    def run_available():
        # each run drains what's currently in the directory; the WATERMARK
        # persists in the shared checkpoint across runs, so run 2 filters
        # rows that run 1's max event time already aged out
        stream = spark.readStream.schema(schema).parquet(f"{inp}/*.parquet")
        agg = windowed_event_aggregate(stream, watermark="1 hour")
        q = (
            agg.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", chk).outputMode("append")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)

    batch1 = spark.createDataFrame(
        [(ev(1, 5), "click", 1.0), (ev(1, 40), "click", 2.0), (ev(10, 0), "click", 3.0)],
        schema,
    )
    batch1.write.parquet(f"{inp}/f1.parquet")
    run_available()  # watermark after run 1 = 10:00 - 1h = 09:00

    # hour-3 event: its window [03:00, 04:00) ended before the persisted
    # watermark -> row must be dropped on ingestion in run 2
    batch2 = spark.createDataFrame(
        [(ev(3, 30), "click", 99.0), (ev(11, 0), "click", 4.0)], schema
    )
    batch2.write.parquet(f"{inp}/f2.parquet")
    run_available()
    res = spark.read.parquet(out).collect()
    starts = {r["window_start"].hour for r in res}
    assert 3 not in starts, f"late hour-3 window must be dropped, got {res}"
    h1 = [r for r in res if r["window_start"].hour == 1]
    assert len(h1) == 1 and h1[0]["n"] == 2 and h1[0]["vmax"] == 2.0


def test_sliding_windows_and_custom_aggs(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    slid = windowed_event_aggregate(
        events, duration="2 hours", slide="1 hour",
        aggs=[F.count("*").alias("n"), F.sum("value").alias("vsum")],
    )
    rows = slid.collect()
    assert len(rows) > 0 and {"window_start", "window_end", "event_type", "n", "vsum"} <= set(slid.columns)
    # every event lands in exactly two 2h/1h sliding windows
    assert sum(r["n"] for r in rows) == 2 * events.count()


def test_stream_dedup_equals_batch_distinct(spark):
    """Doubled input (every row written twice) drains to exactly the
    original rows: state-store dedup across files/micro-batches."""
    from hierarchical_bloom_filter_index_spark.streaming.windows import (
        deduplicated_stream,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    workdir = tempfile.mkdtemp(prefix="hbi_dedup_stream_")
    inp, chk = f"{workdir}/in", f"{workdir}/chk"
    events.write.mode("overwrite").parquet(inp)
    events.write.mode("append").parquet(inp)  # the duplicates
    stream = spark.readStream.schema(events.schema).parquet(inp)
    q = (
        deduplicated_stream(stream, ("event_id",))
        .writeStream.format("memory").queryName("dedup_all")
        .outputMode("append").option("checkpointLocation", chk)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    got = spark.sql("select * from dedup_all").collect()
    want = events.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stream_dedup_suppresses_across_drains(spark):
    """A key seen in drain 1 is suppressed when it arrives AGAIN in drain 2
    through the shared checkpoint (the state store survives restarts)."""
    from hierarchical_bloom_filter_index_spark.streaming.windows import (
        deduplicated_stream,
    )

    workdir = tempfile.mkdtemp(prefix="hbi_dedup_replay_")
    inp, chk, out = f"{workdir}/in", f"{workdir}/chk", f"{workdir}/out"
    os.makedirs(inp)
    schema = "event_id long, v string"

    def drain():
        # memory sink can't recover a checkpoint — durable parquet sink
        stream = spark.readStream.schema(schema).parquet(f"{inp}/*.parquet")
        q = (
            deduplicated_stream(stream, ("event_id",))
            .writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", chk)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(300)
        return spark.read.parquet(out).collect()

    spark.createDataFrame([(1, "a"), (2, "b")], schema).coalesce(1).write.mode(
        "append").parquet(inp)
    got1 = drain()
    assert sorted((r["event_id"], r["v"]) for r in got1) == [(1, "a"), (2, "b")]
    # key 1 re-arrives with a DIFFERENT payload; only the new key 3 passes
    spark.createDataFrame([(1, "A2"), (3, "c")], schema).coalesce(1).write.mode(
        "append").parquet(inp)
    got2 = drain()
    assert sorted((r["event_id"], r["v"]) for r in got2) == [
        (1, "a"), (2, "b"), (3, "c")]
