"""Event-time windowed aggregation with late-data watermarks — the
Structured Streaming shape the reference's count-based window maintenance
maps onto when events carry real timestamps (PMIndex/HBI.java insert/expire
keep count-defined windows; an event-time deployment of the same hierarchy
keys windows by time instead, and the WATERMARK is what bounds state:
windows older than max(event_time) - delay are finalized and their state
dropped, exactly the role expire() plays on the count axis).

Everything here is built-in Spark (window() + withWatermark + hash aggs):
JVM-side, codegen'd, state bounded by the watermark — no Python in the
streaming hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def windowed_event_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time windowed aggregate
    over a STREAMING events frame: (window_start, window_end, *keys, aggs).

    ``watermark`` bounds both state and lateness: rows arriving more than
    ``watermark`` behind the observed max event time are DROPPED by the
    engine and their windows finalized (append mode emits each window
    exactly once, when the watermark passes its end). On a batch frame the
    same plan runs without the watermark semantics — used by the oracle
    twin and tests.

    Scale shape: one shuffle on (window, keys) with map-side partial
    aggregation; state store size is O(active windows x keys), independent
    of stream length — the watermark is what makes an unbounded stream's
    aggregation bounded.
    """
    if aggs is None:
        aggs = [
            F.count("*").alias("n"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        ]
    # withWatermark requires TIMESTAMP (TIMESTAMP_NTZ is rejected with
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE, verified on Spark 4.1); parquet
    # fixtures carry TIMESTAMP_NTZ — cast on BOTH paths so stream and batch
    # window the same instant. NOTE the cast interprets wall time in
    # spark.sql.session.timeZone: epoch-aligned windows line up with NTZ
    # wall-clock hours only when that zone has a whole-hour UTC offset (and
    # DST transitions can shift/duplicate wall times). Callers comparing
    # against wall-time oracles should pin the session timezone to UTC.
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    win = F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    return (
        src.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "*")
        .drop("w")
    )


def deduplicated_stream(
    stream: DataFrame,
    key_cols: tuple[str, ...],
    within_watermark: bool = False,
) -> DataFrame:
    """STREAMING EXACT DEDUP: emit the first row per key, suppress later
    duplicates ACROSS micro-batches (key state lives in the state store,
    so suppression survives restarts through the checkpoint — the
    streaming twin of dedup.exact_duplicates' batch semantics).

    Without a watermark the key state grows with the number of distinct
    keys forever; for an unbounded stream call ``withWatermark`` upstream
    and pass ``within_watermark=True`` (dropDuplicatesWithinWatermark) so
    keys older than the horizon are evicted — dedup-within-horizon is the
    bounded-state contract, exactly the role expire()/watermarks play for
    the windowed aggregates above. Built-in Spark end to end: no Python
    in the streaming path, state keyed by ``key_cols`` only (payload
    columns never enter the store beyond the first row)."""
    cols = list(key_cols)
    if not cols:
        raise ValueError("key_cols must name at least one column")
    if within_watermark:
        return stream.dropDuplicatesWithinWatermark(cols)
    return stream.dropDuplicates(cols)
