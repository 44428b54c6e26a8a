"""relational / lakehouse / streaming driver queries — moved verbatim from __spark_entry__.py."""
from __future__ import annotations

from .core import *  # noqa: F401,F403



def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): users completing each
    prefix at strictly increasing timestamps. Greedy earliest-feasible
    matching (exact for unbounded ordered funnels) via ONE
    groupBy(user) + codegen'd F.aggregate scan — no per-step join chain,
    no window exchange (operators/sessions.funnel_counts). DuckDB twin is
    the chain-of-mins formulation, which computes the same greedy
    earliest completion times."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        funnel_counts)

    # the fixture ts is TIMESTAMP_NTZ; pin UTC so the NTZ->TZ cast is
    # monotone (a DST fall-back session tz could reorder same-wall-hour
    # events and change strict-> chains)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_counts(ev, FUNNEL_STEPS)


def q_decayed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT exponentially-decayed event counts per type (1-hour half-life,
    40-half-life horizon): each event weighs 2^(39 - age_halflives), so the
    sum is ONE BIGINT — no float accumulation order to disagree across
    engines, unlike the textbook sum of 2^-d doubles. The recency-weighted
    activity readout, now = max(ts) over the table (a pure function of the
    data). operators/sessions.decayed_event_counts."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        decayed_event_counts)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return decayed_event_counts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over user journeys: consecutive
    event-type pair counts in (t, event_id) order — one window exchange
    + a map-side pair count (operators/sessions.event_transitions)."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        event_transitions)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return event_transitions(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATH ANALYSIS: top-20 user journey prefixes — each user's first 3
    event types in (t, event_id) order joined '>', ranked (n_users DESC,
    path ASC; unique key so the k-th boundary is deterministic). One
    window exchange + prefix filter BEFORE the per-user aggregation +
    TakeOrderedAndProject (operators/sessions.top_event_paths)."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        top_event_paths)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return top_event_paths(
        spark.read.parquet(f"{sf_dir}/events.parquet"), PATH_PREFIX, PATH_K)


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity day, counted at
    each later active-day offset (offset 0 = cohort size). Two map-side
    aggregations + one user-keyed join, no window
    (operators/sessions.cohort_retention)."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        cohort_retention)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return cohort_retention(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact equi-width histogram of event values per type:
    fixed-point scale once, then every bin edge is integer `div` math —
    bit-identical cross-engine, no float width (operators/stats.
    scaled_histogram). One map-side-combined groupBy."""
    from hierarchical_bloom_filter_index_spark.operators.stats import (
        scaled_histogram)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return scaled_histogram(ev, "value", HIST_LO, HIST_HI, HIST_BINS,
                            HIST_SCALE, group_cols=("event_type",))


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chebyshev outlier flags per event type: |x - mean| > k*sigma
    decided by the EXACT integer inequality (n*x - S)^2 > k^2*(n*Q - S^2)
    — no division/sqrt/float in the decision, DECIMAL(38,0) sums
    (operators/stats.group_outliers). Two-phase: one moments groupBy,
    broadcast back, one flag projection."""
    from hierarchical_bloom_filter_index_spark.operators.stats import (
        group_outliers)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value")
    return group_outliers(ev, "value", k=OUTLIER_K,
                          group_cols=("event_type",), scale=HIST_SCALE)


def q_event_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HORIZON-BOUNDED funnel: each adjacent step gap <= 6h. Greedy
    earliest matching is WRONG under a window (dead-end trap,
    pytest-pinned) — every prefix runs an exact per-user backward
    existence DP (np.searchsorted interval probes over the user's sorted
    step times; one groupBy(user) exchange)
    (operators/sessions.funnel_counts_windowed). DuckDB twin = per-prefix
    EXISTS chain joins with epoch-micros gap conditions."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        funnel_counts_windowed)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_counts_windowed(ev, FUNNEL_STEPS, FUNNEL_WITHIN_US)


def q_bucket_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data skipping through the sketch-bucketed LAYOUT: lineitem written
    partitionBy(bucket) with KLL-derived boundaries; a column-range
    predicate translates (via the persisted boundaries) into a PARTITION
    filter that prunes whole bucket directories at plan time, and the exact
    column predicate closes the contract — so the values equal a full-scan
    filter (the oracle) while the scan opens only the covering buckets.
    Pruning is plan-asserted in tests/test_sampling.py."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        read_bucket_pruned,
        write_bucketed_layout,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    key = ("bucket_layout", sf_dir)
    if key not in _CACHE:
        base = _tmpdir(prefix="hbi_bucketlay_")
        write_bucketed_layout(li, "l_extendedprice", 8, f"{base}/lay")
        _CACHE[key] = f"{base}/lay"
    return read_bucket_pruned(spark, _CACHE[key], *BUCKET_RANGE).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


def q_zonemap_pruned_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-LEVEL ZONE-MAP SKIPPING (operators/zonemap.py): the hierarchical
    descend-or-skip discipline at the storage layer. lineitem is
    range-clustered on l_orderkey; ONE zone-map row per file (min/max
    envelope) lets the middle-eighth range predicate certify most files
    non-matching before any is opened; the exact BETWEEN re-applied to the
    pruned read closes the contract, so the aggregate equals the full-scan
    oracle byte-for-byte. A hard in-query gate refuses if pruning didn't
    actually skip files (the layout is clustered — it must)."""
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        prune_files,
        read_pruned,
    )

    path, zm = _zonemap_range_layout(spark, sf_dir)
    b = zm.agg(F.min("min_l_orderkey").alias("mn"),
               F.max("max_l_orderkey").alias("mx"),
               F.count(F.lit(1)).alias("nf")).first()
    lo = b["mn"] + (b["mx"] - b["mn"]) // 4
    hi = b["mn"] + 3 * (b["mx"] - b["mn"]) // 8
    files = prune_files(zm, "l_orderkey", lo, hi)
    if not (0 < len(files) < b["nf"]):
        raise AssertionError(
            f"zone map failed to skip files on a range-clustered layout "
            f"({len(files)}/{b['nf']} kept)")
    return (
        read_pruned(spark, path, files)
        .where(F.col("l_orderkey").between(lo, hi))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
    )


def q_zonemap_fast_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ACCELERATED RANGE COUNT (operators/zonemap.count_range):
    COUNT over the middle three-quarters of the orderkey space — files
    wholly inside the range are credited their non-null counts from the
    zone map WITHOUT being opened; only the two boundary files are scanned
    with the exact predicate. Exact by construction (the oracle is the
    plain full-scan COUNT); an in-query gate refuses if no file was
    metadata-credited (the range-clustered layout must contain some)."""
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        count_range,
    )

    path, zm = _zonemap_range_layout(spark, sf_dir)
    b = zm.agg(F.min("min_l_orderkey").alias("mn"),
               F.max("max_l_orderkey").alias("mx")).first()
    lo = b["mn"] + (b["mx"] - b["mn"]) // 8
    hi = b["mn"] + 7 * (b["mx"] - b["mn"]) // 8
    n_contained = zm.where((F.col("min_l_orderkey") >= lo)
                           & (F.col("max_l_orderkey") <= hi)).count()
    if n_contained == 0:
        raise AssertionError(
            "no file wholly inside the range on a range-clustered layout")
    n = count_range(spark, path, zm, "l_orderkey", lo, hi)
    return spark.createDataFrame([(n,)], "n_matching bigint")


def q_zonemap_fast_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ACCELERATED RANGE SUM (operators/zonemap.sum_range):
    SUM(l_quantity) over the middle three-quarters of the orderkey space —
    wholly-contained files credit their per-file BIGINT sums without being
    opened (NULL-free key rule), only boundary files scan.  Exact by the
    count_range partition argument; the oracle is the plain full-scan
    SUM.  In-query gate: some file was metadata-credited."""
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        sum_range,
    )

    path, zm = _zonemap_range_layout(spark, sf_dir)
    b = zm.agg(F.min("min_l_orderkey").alias("mn"),
               F.max("max_l_orderkey").alias("mx")).first()
    lo = b["mn"] + (b["mx"] - b["mn"]) // 8
    hi = b["mn"] + 7 * (b["mx"] - b["mn"]) // 8
    n_credit = zm.where(
        (F.col("min_l_orderkey") >= lo) & (F.col("max_l_orderkey") <= hi)
        & (F.col("nvals_l_orderkey") == F.col("n_rows"))).count()
    if n_credit == 0:
        raise AssertionError(
            "no metadata-credited file inside the range on a "
            "range-clustered layout")
    s = sum_range(spark, path, zm, "l_orderkey", "l_quantity", lo, hi)
    return spark.createDataFrame([(s,)], "sum_qty bigint")


def q_zonemap_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-FILE BLOOM POINT-LOOKUP PRUNING (operators/zonemap.py): documents
    hash-clustered on doc_id with one Bloom filter per file; an IN-set probe
    keeps only files whose filter reports some key maybe-present (no false
    negatives — soundness is the Bloom contract), then the exact isin
    predicate decides. This is the skip parquet min/max statistics cannot
    express: a hash-clustered layout has useless envelopes but perfect
    membership locality."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        build_zone_map,
        prune_files,
        read_pruned,
    )

    key = ("zonemap_bloom", sf_dir)
    if key not in _CACHE:
        path = _tmpdir(prefix="hbi_zm_bloom_")
        (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .repartition(8, "doc_id")
         .write.mode("overwrite").parquet(path))
        zm = build_zone_map(spark.read.parquet(path), bloom_col="doc_id").persist()
        zm.count()
        _CACHE[key] = (path, zm)
    path, zm = _CACHE[key]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = [r["doc_id"] for r in
           docs.where(F.col("doc_id") % 199 == 42).select("doc_id").collect()]
    files = prune_files(zm, bloom_keys=ids)
    if not files:
        raise AssertionError("bloom prune dropped files holding probed keys")
    return (
        read_pruned(spark, path, files)
        .where(F.col("doc_id").isin(ids))
        .select("doc_id", "n_chars")
    )


def q_zonemap_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for STREAMING layout ingest + zone-map maintenance: docs
    drained through a file stream land as per-batch sub-dirs while each
    batch appends its files' zone-map rows (batch_id replay guard; data
    write idempotent via overwrite-own-dir) — the LIVE map must equal a
    scratch build over the ingested layout, per-file Bloom BYTES included
    (capacity pinned on both sides). Symmetric difference returned — the
    DuckDB twin is the empty relation (operators/zonemap.py)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        build_zone_map,
        read_layout,
        read_zone_map,
        zone_map_ingest_stream,
    )

    cap = 4096
    base = _tmpdir(prefix="hbi_zm_parity_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = F.col("doc_id") % 2
    docs.where(half == 0).write.mode("overwrite").parquet(f"{base}/in")
    docs.where(half == 1).write.mode("append").parquet(f"{base}/in")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(f"{base}/in"))
    q = zone_map_ingest_stream(
        stream, f"{base}/lay", f"{base}/zm", f"{base}/chk",
        stat_cols=("doc_id",), bloom_col="doc_id", bloom_capacity=cap)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("zonemap_stream_parity: drain exceeded 300s")
    live = read_zone_map(spark, f"{base}/zm")
    if live.select("batch_id").distinct().count() < 2:
        raise AssertionError("zonemap_stream_parity: expected >= 2 batches")
    want = build_zone_map(
        read_layout(spark, f"{base}/lay"), ("doc_id",),
        bloom_col="doc_id", bloom_capacity=cap)
    sel = lambda df: df.select(  # noqa: E731
        "_file", "n_rows", "min_doc_id", "max_doc_id",
        F.xxhash64("bloom").alias("bloom_h"))
    a, b = sel(live), sel(want)
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_zonemap_compact_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for zone-mapped layout COMPACTION: docs stream-ingested as
    per-batch sub-dirs, then the two oldest batches merge into one c-dir
    (operators/zonemap.compact_batches — data first, map overwrite second,
    old dirs deleted last).  The symmetric difference returned is the union
    of (a) the data diff: layout rows before vs after compaction (keyed by
    doc_id — nothing lost or duplicated) and (b) the map diff: live map vs
    a scratch build over the compacted layout, per-file Bloom bytes
    included (pinned capacity).  DuckDB twin = the empty relation."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        build_zone_map,
        compact_batches,
        read_layout,
        read_zone_map,
        zone_map_ingest_stream,
    )

    cap = 4096
    base = _tmpdir(prefix="hbi_zm_compact_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    third = F.col("doc_id") % 3
    docs.where(third == 0).write.mode("overwrite").parquet(f"{base}/in")
    docs.where(third == 1).write.mode("append").parquet(f"{base}/in")
    docs.where(third == 2).write.mode("append").parquet(f"{base}/in")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(f"{base}/in"))
    q = zone_map_ingest_stream(
        stream, f"{base}/lay", f"{base}/zm", f"{base}/chk",
        stat_cols=("doc_id",), bloom_col="doc_id", bloom_capacity=cap)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("zonemap_compact_parity: drain exceeded 300s")
    zm = read_zone_map(spark, f"{base}/zm")
    batches = sorted(r["batch_id"] for r in
                     zm.select("batch_id").distinct().collect())
    if len(batches) < 3:
        raise AssertionError("zonemap_compact_parity: expected >= 3 batches")
    data_before = read_layout(spark, f"{base}/lay").select(
        "doc_id").localCheckpoint()
    n = compact_batches(
        spark, f"{base}/lay", f"{base}/zm", batches[1],
        stat_cols=("doc_id",), bloom_col="doc_id", bloom_capacity=cap)
    if n != 2:
        raise AssertionError(f"zonemap_compact_parity: compacted {n} != 2")
    data_after = read_layout(spark, f"{base}/lay").select("doc_id")
    d1, d2 = data_before.exceptAll(data_after), data_after.exceptAll(data_before)
    data_diff = d1.unionByName(d2).select(
        F.col("doc_id").cast("string").alias("key"),
        F.lit("data").alias("kind"))
    live = read_zone_map(spark, f"{base}/zm")
    want = build_zone_map(
        read_layout(spark, f"{base}/lay"), ("doc_id",),
        bloom_col="doc_id", bloom_capacity=cap)
    sel = lambda df: df.select(  # noqa: E731
        "_file", "n_rows", "min_doc_id", "max_doc_id",
        F.xxhash64("bloom").alias("bloom_h"))
    a, b = sel(live), sel(want)
    map_diff = a.exceptAll(b).unionByName(b.exceptAll(a)).select(
        F.col("_file").alias("key"), F.lit("map").alias("kind"))
    return data_diff.unionByName(map_diff)


def q_zonemap_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY-ON-WRITE MERGE INTO a zone-mapped layout
    (operators/zonemap.merge_into_layout): documents key-clustered on
    doc_id; a source of updates (narrow key slab, text prefixed) plus
    inserts (keys past the max) upserts by rewriting ONLY the files whose
    key envelope can hold a source key — gate-asserted 0 < touched <
    total.  Returns the merged layout's (doc_id, text): the oracle builds
    the same MERGE result in SQL, so equality proves row-exact upsert
    semantics end to end (replaced, inserted, untouched).  Rebuilt fresh
    per call — merges mutate the layout."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        build_zone_map,
        merge_into_layout,
        read_layout,
        write_zone_map,
    )

    base = _tmpdir(prefix="hbi_zm_upsert_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    (docs.repartitionByRange(8, "doc_id")
     .write.mode("overwrite").parquet(f"{base}/lay"))
    write_zone_map(
        build_zone_map(spark.read.parquet(f"{base}/lay"),
                       stat_cols=("doc_id",)),
        f"{base}/zm")
    mx = docs.agg(F.max("doc_id")).first()[0]
    lo, hi = mx // 4, mx // 2
    updates = docs.where(
        F.col("doc_id").between(lo, hi) & (F.col("doc_id") % 3 == 0)
    ).select("doc_id", F.concat(F.lit("UPD "), F.col("text")).alias("text"))
    inserts = spark.range(5).select(
        (F.lit(mx) + 10 + F.col("id")).alias("doc_id"),
        F.concat(F.lit("ins "), F.col("id").cast("string")).alias("text"))
    res = merge_into_layout(
        spark, f"{base}/lay", f"{base}/zm",
        updates.unionByName(inserts), "doc_id", stat_cols=("doc_id",))
    if not (0 < res["n_files_touched"] < res["n_files_total"]):
        raise AssertionError(
            f"merge touched {res['n_files_touched']}/{res['n_files_total']} "
            "files on a key-clustered layout — pruning failed")
    return read_layout(spark, f"{base}/lay").select("doc_id", "text")


def q_zonemap_delete_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY-ON-WRITE RANGE DELETE + VACUUM over a zone-mapped layout
    (operators/zonemap.delete_range_from_layout): documents key-clustered
    on doc_id, the middle doc_id band deleted — interior files drop
    METADATA-ONLY (gate-asserted > 0), only boundary files are rewritten.
    Then a crash is simulated (an orphan data dir the map never committed)
    and vacuum_layout reclaims it — gate: the full recursive scan equals
    the map-driven read again.  Returns the surviving (doc_id, text); the
    oracle is the plain SQL complement filter."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        build_zone_map,
        delete_range_from_layout,
        read_layout,
        vacuum_layout,
        write_zone_map,
    )

    base = _tmpdir(prefix="hbi_zm_del_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    (docs.repartitionByRange(8, "doc_id")
     .write.mode("overwrite").parquet(f"{base}/lay"))
    write_zone_map(
        build_zone_map(spark.read.parquet(f"{base}/lay"),
                       stat_cols=("doc_id",)),
        f"{base}/zm")
    mx = docs.agg(F.max("doc_id")).first()[0]
    lo, hi = mx // 8, 6 * mx // 8
    res = delete_range_from_layout(
        spark, f"{base}/lay", f"{base}/zm", "doc_id", lo, hi,
        stat_cols=("doc_id",))
    if res["n_files_dropped"] == 0:
        raise AssertionError(
            "no metadata-only file drops on a wide delete over a "
            f"range-clustered layout ({res})")
    # crash simulation: orphan dir on disk, never committed to the map
    docs.limit(20).coalesce(1).write.parquet(f"{base}/lay/u99")
    removed = vacuum_layout(spark, f"{base}/lay", f"{base}/zm")
    if not removed:
        raise AssertionError("vacuum found no orphan after a planted crash")
    survivors = read_layout(spark, f"{base}/lay")
    n_full = survivors.count()
    n_map = docs.where(~F.col("doc_id").between(lo, hi)).count()
    if n_full != n_map:
        raise AssertionError(
            f"post-vacuum full scan {n_full} != expected {n_map}")
    return survivors.select("doc_id", "text")


def q_vtable_fast_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA ANALYTICS THROUGH TIME TRAVEL (vtable.table_count_range /
    table_sum_range): exact range COUNT + SUM(n_chars) over the SAME
    doc_id band at each of the three snapshots — answered mostly from
    each version's map (contained files credit nvals/sums unopened), no
    history scan.  The three (version, n, sum) rows differ by exactly
    what each commit did (UPD lengthens texts in-range at v1, the delete
    band removes part of the range at v2); oracle = the per-version SQL
    reconstructions aggregated.  In-query gate: v0 credits some file
    from metadata alone."""
    from hierarchical_bloom_filter_index_spark.operators import vtable as V

    path, mx = _vtable_fixture(spark, sf_dir)
    lo, hi = mx // 3, 2 * mx // 3
    zm0 = V.table_map(spark, path, 0)
    n_credit = zm0.where(
        (F.col("min_doc_id") >= lo) & (F.col("max_doc_id") <= hi)
        & (F.col("nvals_doc_id") == F.col("n_rows"))).count()
    if n_credit == 0:
        raise AssertionError("no metadata-credited file at v0")
    rows = []
    for v in (0, 1, 2):
        rows.append((
            v,
            V.table_count_range(spark, path, "doc_id", lo, hi, version=v),
            V.table_sum_range(spark, path, "doc_id", "n_chars", lo, hi,
                              version=v),
        ))
    return spark.createDataFrame(
        rows, "version int, n_docs bigint, sum_chars bigint")


def q_vtable_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIT between SNAPSHOTS (vtable.diff_versions = snapshot_diff over
    two time-travel reads): what the upsert+delete actually did between
    v0 and v2 — UPD-band survivors read ``changed``, deleted-band docs
    ``removed``, inserts ``added``.  Oracle reconstructs v2 relationally
    and diffs it against v0 in SQL."""
    from hierarchical_bloom_filter_index_spark.operators import vtable as V

    path, _mx = _vtable_fixture(spark, sf_dir)
    return V.diff_versions(spark, path, 0, 2, "doc_id", ["text"])


def q_vtable_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSIONED TABLE with TIME TRAVEL (operators/vtable.py — the Iceberg
    snapshot contract on parquet + zone maps): documents as snapshot v0,
    an UPSERT commits v1 (only envelope-touched files rewritten, old files
    kept), a range DELETE commits v2 (interior files leave the map
    metadata-only).  ALL THREE snapshots are then read back and must equal
    the SQL-reconstructed states — one result set tagged by version.
    After collecting (localCheckpoint — expiry deletes files lazy plans
    would re-read), snapshots < 2 are EXPIRED: gates assert versions
    [2] remain, v2 re-reads to the same count, and expiry deleted files.
    Rebuilt fresh per call (mutating)."""
    from hierarchical_bloom_filter_index_spark.operators import vtable as V

    path, _mx = _vtable_fixture(spark, sf_dir)
    out = None
    for v in (0, 1, 2):
        part = V.read_table(spark, path, v).select(
            F.lit(v).cast("int").alias("version"), "doc_id", "text")
        out = part if out is None else out.unionByName(part)
    out = out.localCheckpoint()  # expiry deletes files the lazy plan reads
    n2 = V.read_table(spark, path, 2).count()
    res = V.expire_snapshots(spark, path, keep_from_version=2)
    if res["n_versions_expired"] != 2 or res["n_files_deleted"] == 0:
        raise AssertionError(f"vtable expiry did not engage: {res}")
    if V.list_versions(path) != [2]:
        raise AssertionError("expiry left wrong versions")
    if V.read_table(spark, path, 2).count() != n2:
        raise AssertionError("surviving snapshot changed under expiry")
    return out


def q_zorder_pruned_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-COLUMN DATA SKIPPING via Z-ORDER (operators/zorder.py): ONE
    layout of lineitem, Morton-interleaved on (l_orderkey, l_partkey),
    prunes files for range predicates on EITHER column — here the
    SECONDARY column (l_partkey), exactly what a 1-D orderkey clustering
    cannot skip on.  The zone-map envelope certifies non-matching files,
    the exact BETWEEN closes the contract (equal to the full-scan oracle);
    a hard in-query gate refuses if the partkey predicate didn't skip
    files."""
    from hierarchical_bloom_filter_index_spark.operators.zorder import (
        prune_zorder_files,
    )
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        read_pruned,
    )

    path = _zorder_layout(spark, sf_dir)
    mn, mx, nf = _zorder_bounds(spark, path, "l_partkey")
    lo = mn + 3 * (mx - mn) // 8
    hi = mn + (mx - mn) // 2
    files, total = prune_zorder_files(spark, path, {"l_partkey": (lo, hi)})
    if not (0 < len(files) < total):
        raise AssertionError(
            f"z-order failed to skip files on the secondary column "
            f"({len(files)}/{total} kept)")
    return (
        read_pruned(spark, f"{path}/data", files)
        .where(F.col("l_partkey").between(lo, hi))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
    )


def q_zorder_pruned_orderkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same Z-ordered layout pruned on its FIRST column (l_orderkey) —
    both columns skip files from one clustering (the d-dim trade: each
    column's envelopes are ~sqrt-loose vs a dedicated 1-D layout, but every
    column gets them).  Exact predicate closes; in-query gate refuses a
    no-skip prune."""
    from hierarchical_bloom_filter_index_spark.operators.zorder import (
        prune_zorder_files,
    )
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        read_pruned,
    )

    path = _zorder_layout(spark, sf_dir)
    mn, mx, nf = _zorder_bounds(spark, path, "l_orderkey")
    lo = mn + (mx - mn) // 4
    hi = mn + 3 * (mx - mn) // 8
    files, total = prune_zorder_files(spark, path, {"l_orderkey": (lo, hi)})
    if not (0 < len(files) < total):
        raise AssertionError(
            f"z-order failed to skip files on the first column "
            f"({len(files)}/{total} kept)")
    return (
        read_pruned(spark, f"{path}/data", files)
        .where(F.col("l_orderkey").between(lo, hi))
        .groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
    )


def q_zorder_pruned_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONJUNCTIVE two-column range over the Z-ordered layout: the kept
    file set is the INTERSECTION of each column's survivors
    (zonemap.prune_files_ranges), so the conjunction prunes at least as
    hard as either conjunct — gate-asserted, then the exact predicates
    decide (equal to the full-scan oracle)."""
    from hierarchical_bloom_filter_index_spark.operators.zorder import (
        prune_zorder_files,
    )
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        read_pruned,
    )

    path = _zorder_layout(spark, sf_dir)
    omn, omx, _ = _zorder_bounds(spark, path, "l_orderkey")
    pmn, pmx, _ = _zorder_bounds(spark, path, "l_partkey")
    olo, ohi = omn + (omx - omn) // 4, omn + 3 * (omx - omn) // 4
    plo, phi = pmn + (pmx - pmn) // 4, pmn + 3 * (pmx - pmn) // 4
    ranges = {"l_orderkey": (olo, ohi), "l_partkey": (plo, phi)}
    both, total = prune_zorder_files(spark, path, ranges)
    f_o, _ = prune_zorder_files(spark, path, {"l_orderkey": (olo, ohi)})
    f_p, _ = prune_zorder_files(spark, path, {"l_partkey": (plo, phi)})
    if not (set(both) <= set(f_o) and set(both) <= set(f_p)):
        raise AssertionError("conjunction survivors not an intersection")
    if not (0 < len(both) <= min(len(f_o), len(f_p)) < total):
        raise AssertionError(
            f"conjunctive prune not tighter ({len(both)} vs "
            f"{len(f_o)}/{len(f_p)} of {total})")
    return (
        read_pruned(spark, f"{path}/data", both)
        .where(F.col("l_orderkey").between(olo, ohi)
               & F.col("l_partkey").between(plo, phi))
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
             F.countDistinct("l_orderkey").alias("n_orders"))
    )


def q_zorder_append_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER LIFECYCLE: a layout built from HALF of lineitem, the other
    half APPENDED with the persisted boundaries (geometry from meta, never
    recomputed — operators/zorder.append_zorder_layout), must answer a
    partkey-range aggregate over the WHOLE table equal to the full-scan
    oracle, with the pruned file set still skipping files (gated)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.zorder import (
        append_zorder_layout,
        prune_zorder_files,
        write_zorder_layout,
    )
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        read_pruned,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    key = ("zorder_append", sf_dir)
    if key not in _CACHE:
        base = _tmpdir(prefix="hbi_zorder_app_")
        path = f"{base}/lay"
        write_zorder_layout(li.where(F.col("l_orderkey") % 2 == 0),
                            ["l_orderkey", "l_partkey"], 16, path,
                            bits_per_col=6)
        append_zorder_layout(li.where(F.col("l_orderkey") % 2 == 1),
                             path, n_files=8)
        _CACHE[key] = path
    path = _CACHE[key]
    b = li.agg(F.min("l_partkey").alias("mn"),
               F.max("l_partkey").alias("mx")).first()
    lo = b["mn"] + (b["mx"] - b["mn"]) // 2
    hi = b["mn"] + 5 * (b["mx"] - b["mn"]) // 8
    files, total = prune_zorder_files(spark, path, {"l_partkey": (lo, hi)})
    if not (0 < len(files) < total):
        raise AssertionError(
            f"appended z-order layout failed to skip files "
            f"({len(files)}/{total} kept)")
    return (
        read_pruned(spark, f"{path}/data", files)
        .where(F.col("l_partkey").between(lo, hi))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
    )


def q_zorder_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Z-ORDER INGEST (operators/zorder.zorder_ingest_stream):
    half of lineitem seeds the layout, the other half streams in as
    micro-batches curve-assigned with the PERSISTED boundaries (zone-map
    batch_id replay guard; map commit is the append's last step).  After
    the drain, a partkey-range aggregate over the pruned read must equal
    the full-table oracle — the streamed layout answers for ALL of
    lineitem.  Gates: >= 2 stream batches in the map; pruning still skips
    files."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        read_pruned,
        read_zone_map,
    )
    from hierarchical_bloom_filter_index_spark.operators.zorder import (
        prune_zorder_files,
        write_zorder_layout,
        zorder_ingest_stream,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    key = ("zorder_stream", sf_dir)
    if key not in _CACHE:
        base = _tmpdir(prefix="hbi_zorder_stream_")
        path = f"{base}/lay"
        even = F.col("l_orderkey") % 2 == 0
        write_zorder_layout(li.where(even), ["l_orderkey", "l_partkey"], 16,
                            path, bits_per_col=6)
        rest = li.where(~even)
        half = F.col("l_linenumber") % 2 == 0
        rest.where(half).write.mode("overwrite").parquet(f"{base}/in")
        rest.where(~half).write.mode("append").parquet(f"{base}/in")
        stream = (spark.readStream.schema(li.schema)
                  .option("maxFilesPerTrigger", "1").parquet(f"{base}/in"))
        q = zorder_ingest_stream(stream, path, f"{base}/chk", n_files=4)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("zorder_stream_ingest: drain exceeded 300s")
        zm = read_zone_map(spark, f"{path}/zonemap")
        if zm.where(F.col("batch_id").isNotNull()).select(
                "batch_id").distinct().count() < 2:
            raise AssertionError("zorder_stream_ingest: expected >= 2 batches")
        _CACHE[key] = path
    path = _CACHE[key]
    b = li.agg(F.min("l_partkey").alias("mn"),
               F.max("l_partkey").alias("mx")).first()
    lo = b["mn"] + 5 * (b["mx"] - b["mn"]) // 8
    hi = b["mn"] + 3 * (b["mx"] - b["mn"]) // 4
    files, total = prune_zorder_files(spark, path, {"l_partkey": (lo, hi)})
    if not (0 < len(files) < total):
        raise AssertionError(
            f"streamed z-order layout failed to skip files "
            f"({len(files)}/{total} kept)")
    return (
        read_pruned(spark, f"{path}/data", files)
        .where(F.col("l_partkey").between(lo, hi))
        .groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
    )


def q_grouped_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP sketch profiles in one scan: lineitem.l_quantity profiled
    per l_returnflag — partial rows per (Arrow batch, group, column), one
    tiny-table fold, every certificate intact per group (HLL sparse-exact
    distinct, mg_resid = 0 oracle-checked, min-value top tie-break). The
    per-source data-health dashboard shape."""
    from hierarchical_bloom_filter_index_spark.operators.profile import (
        grouped_profile_columns,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return grouped_profile_columns(li, "l_returnflag", ["l_quantity"]).select(
        "grp", "col_name", "n", "n_null", "min", "max", "n_distinct",
        "top_value", "top_count", "mg_resid",
    )


def q_profile_incremental_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for incremental profile maintenance: base + replay-guarded
    increments + compaction must read out the SAME profile as one scan of
    the concatenated data — both symmetric differences returned (empty
    oracle). Projected to the exact columns (quantile estimates are
    batching-dependent within their bound BY DESIGN and excluded, like the
    driver projection of table_profile)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.profile import (
        append_profile_increment,
        compact_profile_state,
        profile_columns,
        read_profile,
        write_profile_state,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_linenumber", "l_quantity"]
    base = _tmpdir(prefix="hbi_profinc_")
    b = [li.filter(F.pmod(F.col("l_orderkey"), F.lit(3)) == i) for i in range(3)]
    write_profile_state(b[0], cols, f"{base}/p")
    append_profile_increment(b[1], f"{base}/p", 0)
    append_profile_increment(b[2], f"{base}/p", 1)
    compact_profile_state(spark, f"{base}/p")
    inc = read_profile(spark, f"{base}/p").select(*_PROFILE_PROJ)
    full = profile_columns(li, cols).select(*_PROFILE_PROJ)
    return inc.exceptAll(full).unionByName(full.exceptAll(inc))


def q_profile_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for STREAMING profile maintenance: the same table drained
    as micro-batches through foreachBatch (replay-guarded partial appends)
    must read out the batch profile exactly (empty-oracle symmetric
    difference). Stays OUT of bench.py — the timing is a stream drain, not
    a query."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.profile import (
        profile_columns,
        profile_stream,
        read_profile,
        write_profile_state,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_linenumber", "l_quantity"]
    base = _tmpdir(prefix="hbi_profstream_")
    write_profile_state(li.limit(0), cols, f"{base}/p")
    half = F.pmod(F.col("l_orderkey"), F.lit(2))
    li.filter(half == 0).write.mode("overwrite").parquet(f"{base}/in")
    li.filter(half == 1).write.mode("append").parquet(f"{base}/in")
    stream = spark.readStream.schema(li.schema).option(
        "maxFilesPerTrigger", "1").parquet(f"{base}/in")
    q = profile_stream(stream, f"{base}/p", f"{base}/chk")
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("profile_stream_parity: availableNow drain exceeded 300s")
    got = read_profile(spark, f"{base}/p").select(*_PROFILE_PROJ)
    full = profile_columns(li, cols).select(*_PROFILE_PROJ)
    return got.exceptAll(full).unionByName(full.exceptAll(got))


def q_sketch_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven balanced range partitioning: boundaries for 8 buckets
    of lineitem.l_extendedprice come from a ONE-PASS KLL merge (partials
    sorted before the driver merge — deterministic for a fixed input
    layout), bucket assignment is a pure codegen expression, and the output
    carries an IN-PLAN balance certificate (any bucket outside
    (1 +- 0.2) * n/8 raises — a refusal is the skew signal: salt or
    hash-partition instead). rows-only BY DESIGN: the boundaries are KLL
    sketch content (not SQL-derivable), so no DuckDB twin exists; the
    balance bound and boundary determinism are pytest-pinned
    (tests/test_sampling.py) and the certificate itself runs inside this
    query's plan."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        certified_bucket_counts,
        sketch_range_buckets,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bucketed, _bnds = sketch_range_buckets(li, "l_extendedprice", 8)
    return certified_bucket_counts(bucketed, 8, max_rel_dev=0.2)


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS-per-table sketch profiling of relational columns: exact
    scalars (n / nulls / min / max) + HLL distinct + Misra-Gries top value +
    KLL quantiles computed as mergeable blob partials per Arrow batch and
    folded treeAggregate-style (operators/profile.py). Every reported column
    here is in the EXACT regime and the certificate is itself checked: the
    merged HLL stays sparse (distinct <= 2^p/8 = 512) so n_distinct is
    exact, and mg_resid == 0 is an oracle-checked output column (no MG
    decrement happened, making top_value/top_count exact counts, min-value
    tie-break). Quantile estimates are bound-checked in tests, not here."""
    from hierarchical_bloom_filter_index_spark.operators.profile import (
        profile_columns,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prof = (
        profile_columns(cust, ["c_nationkey"])
        .unionByName(profile_columns(part, ["p_size"]))
        .unionByName(profile_columns(li, ["l_linenumber", "l_quantity"]))
    )
    return prof.select(
        "col_name", "n", "n_null", "min", "max", "n_distinct",
        "top_value", "top_count", "mg_resid",
    )


def q_orders_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational coverage: broadcast-joined fact/dim aggregate with
    integer-exact measures (float sums are order-dependent across engines)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_orderpriority")),
                li["l_orderkey"] == orders["o_orderkey"], "inner")
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
        )
    )


def q_bloom_semi_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-PRUNED SEMI-JOIN (operators/joins.bloom_semi_join): the big
    side (lineitem) is filtered by a broadcast Bloom over the keys side
    BEFORE any exchange; false positives are discarded by the exact
    verifying left_semi join, so the result is EXACT. The Bloom itself is
    built via the two-phase mergeable-UDAF path (sketch_aggregate)."""
    from hierarchical_bloom_filter_index_spark.operators.joins import bloom_semi_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    urgent = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    res = bloom_semi_join(li, urgent, ("l_orderkey", "o_orderkey"),
                          fpp=0.01, seed=CFG.seed)
    return res.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("long").alias("quantity"),
    )


def q_bloom_anti_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-PRUNED ANTI-JOIN twin: rows failing the Bloom probe are
    certified absent (no false negatives) and bypass the join entirely —
    at scale the exact anti-join shuffles only candidates."""
    from hierarchical_bloom_filter_index_spark.operators.joins import bloom_anti_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    urgent = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    res = bloom_anti_join(li, urgent, ("l_orderkey", "o_orderkey"),
                          fpp=0.01, seed=CFG.seed)
    return res.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH-BASED JOIN-SIZE ESTIMATION (operators/joins.join_size_estimate):
    |orders JOIN lineitem on orderkey| = <f_A, f_B> from ONE CountSketch
    blob per side (two-phase build, tree fan-in — no row ever shuffles),
    driver-side AMS inner product. Auto-sized width keeps both nodes in the
    canonical SPARSE-EXACT regime at this corpus's key cardinality, so the
    'estimate' IS the true cardinality — the oracle is the actual join
    count. Dense-regime AMS error bounds live in tests/test_joins.py."""
    from hierarchical_bloom_filter_index_spark.operators.joins import (
        join_size_estimate,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    res = join_size_estimate(orders, li, ("o_orderkey", "l_orderkey"),
                             seed=CFG.seed)
    if not res["exact"]:
        raise AssertionError(
            "join_size_estimate left the sparse-exact regime on the test "
            "corpus — the integer oracle would be checking an estimate")
    return spark.createDataFrame(
        [(int(res["est_join_size"]), res["n_left"], res["n_right"])],
        "est_join_size bigint, n_left bigint, n_right bigint",
    )


def q_custkey_skew_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-SKEW F2 (operators/joins.key_skew_f2): second frequency moment
    of orders.o_custkey — the SELF-join size sum_k f_k^2 that decides
    salting before a shuffle — from one CountSketch blob, exact in the
    sparse regime (loud failure if the corpus ever outgrows it)."""
    from hierarchical_bloom_filter_index_spark.operators.joins import key_skew_f2

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    res = key_skew_f2(orders, "o_custkey", seed=CFG.seed)
    if not res["exact"]:
        raise AssertionError(
            "key_skew_f2 left the sparse-exact regime on the test corpus")
    return spark.createDataFrame(
        [(int(res["f2"]), res["n_rows"])], "f2 bigint, n_rows bigint")


def q_shipments_in_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINNED INTERVAL/POINT RANGE JOIN (operators/joins.interval_point_join):
    shipments falling in each sampled order's 7-day window — a bare
    inequality join that Spark would plan as BroadcastNestedLoop (O(n*m)
    compares) runs instead as an EQUI-join on a bin column (intervals
    explode to covering bins, each point lands in exactly one bin, the
    exact BETWEEN closes the contract). Timestamps ride as epoch DAYS
    (integral binning path — exact, timezone-free; the corpus dates are
    midnights so day arithmetic equals the oracle's timestamp
    arithmetic)."""
    from hierarchical_bloom_filter_index_spark.operators.joins import (
        interval_point_join,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    iv = (orders.where(F.col("o_orderkey") % 997 == 0)
          .select("o_orderkey",
                  F.datediff(F.col("o_orderdate").cast("date"),
                             F.lit("1970-01-01").cast("date")).alias("w_start"))
          .withColumn("w_end", F.col("w_start") + 7))
    pts = li.select(
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).alias("ship_day"))
    j = interval_point_join(pts, "ship_day", iv, "w_start", "w_end",
                            bin_width=8)
    return (j.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n_shipments")))


def q_order_window_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP JOIN (operators/joins.interval_overlap_join): which
    sampled 7-day order windows overlap which (differently-sampled) 5-day
    windows — the binned equi-join dedup-free trick: an overlapping pair
    shares every bin of its overlap region, so only the bin holding the
    overlap's LEFT EDGE keeps the pair (exactly-once by construction, no
    distinct shuffle). Epoch-day arithmetic, exact-predicate contract."""
    from hierarchical_bloom_filter_index_spark.operators.joins import (
        interval_overlap_join,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = lambda c: F.datediff(  # noqa: E731
        F.col(c).cast("date"), F.lit("1970-01-01").cast("date"))
    a = (orders.where(F.col("o_orderkey") % 997 == 0)
         .select(F.col("o_orderkey").alias("a_orderkey"),
                 day("o_orderdate").alias("a_start"))
         .withColumn("a_end", F.col("a_start") + 7))
    b = (orders.where(F.col("o_orderkey") % 991 == 0)
         .select(F.col("o_orderkey").alias("b_orderkey"),
                 day("o_orderdate").alias("b_start"))
         .withColumn("b_end", F.col("b_start") + 5))
    j = interval_overlap_join(a, "a_start", "a_end", b, "b_start", "b_end")
    return j.select("a_orderkey", "b_orderkey")


def q_custkey_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV KEY-OVERLAP (operators/keystats.key_overlap): how much of the
    customer key space do URGENT orders touch?  Bottom-k Jaccard state
    between the two columns' distinct-key sets — every output a
    DETERMINISTIC VALUE (pure function of the key sets through the
    seed-fixed priority hash), so the DuckDB twin re-derives bottom-k of
    the union via the bit-exact HUGEINT SplitMix64 chain and the equality
    is a hard value gate even though k << |union|."""
    from hierarchical_bloom_filter_index_spark.operators.keystats import key_overlap

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    res = key_overlap(urgent, "o_custkey", cust, "c_custkey", k=OVERLAP_K)
    return spark.createDataFrame(
        [(res["n_sample"], res["n_match"], res["est_jaccard"])],
        "n_sample bigint, n_match bigint, est_jaccard double")


def q_custkey_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL KEY SET ALGEBRA (operators/keystats.key_setops): |A|, |B|,
    |A ∪ B|, |A ∩ B| between the URGENT-orders customer set and the
    customer table from one HLL node per side (lossless register-max
    union, inclusion-exclusion intersection).  Auto-sized p keeps both
    nodes sparse-exact at this corpus's cardinality, so all four outputs
    are exact integers — the oracle is plain COUNT(DISTINCT) algebra."""
    from hierarchical_bloom_filter_index_spark.operators.keystats import key_setops

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    res = key_setops(urgent, "o_custkey", cust, "c_custkey")
    if not res["exact"]:
        raise AssertionError(
            "key_setops left the sparse-exact regime on the test corpus")
    return spark.createDataFrame(
        [(int(res["est_a"]), int(res["est_b"]), int(res["est_union"]),
          int(res["est_intersect"]))],
        "n_a bigint, n_b bigint, n_union bigint, n_intersect bigint")


def q_customer_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE SIMILARITY SELF-JOIN (operators/fuzzyjoin.py): all
    customer-name pairs within Levenshtein distance 1, found by the
    SymSpell deletion-neighborhood equi-join (variants block, exact
    levenshtein() decides — never a cross join).  The oracle IS the brute
    force: DuckDB's levenshtein over all distinct-name pairs (with the
    |len| band, a lower-bound prefilter that changes nothing), so equality
    proves the blocking lost no pair and invented none."""
    from hierarchical_bloom_filter_index_spark.operators.fuzzyjoin import (
        edit_self_pairs,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return edit_self_pairs(
        cust, "c_name", max_dist=1, out_cols=("name_a", "name_b", "dist"))


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT DIFF (operators/snapshot.py): added/removed/changed keys
    between two corpus versions in ONE column-pruned full outer join — the
    audit/worklist inverse of the engine's append/takedown surfaces.  The
    'new' snapshot is derived deterministically from documents (drops,
    edits, additions by doc_id residue) on BOTH engines; statuses are
    exact NULL-safe column comparisons.  The hash comparison mode (what a
    100 TB diff ships through the shuffle: key + 8 bytes per side) is
    gate-checked in-query to agree with exact mode row-for-row."""
    from hierarchical_bloom_filter_index_spark.operators.snapshot import (
        snapshot_diff,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.select("doc_id", "text", "lang", "source")
    new = (
        docs.where(F.col("doc_id") % 7 != 3)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 11 == 5,
                   F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text")).alias("text"),
            "lang", "source")
        .unionByName(
            docs.where(F.col("doc_id") % 13 == 1).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat(F.lit("new "), F.col("text")).alias("text"),
                "lang", "source"))
    )
    cols = ["text", "lang", "source"]
    exact = snapshot_diff(old, new, "doc_id", cols)
    hashed = snapshot_diff(old, new, "doc_id", cols, method="hash")
    if exact.exceptAll(hashed).unionAll(hashed.exceptAll(exact)).count() != 0:
        raise AssertionError("snapshot_diff hash mode disagrees with exact mode")
    return exact


def q_event_type_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT COLUMN HEAVY VALUES (operators/keystats.column_heavy_hitters):
    event types covering >= 1/5 of the event stream — Misra-Gries candidate
    superset over hashed keys (integer for_phi sizing makes the certificate
    unconditional; collisions only ADD candidates), one exact count over
    the broadcast candidates decides with integer threshold arithmetic.
    The 1/5 cut lands INSIDE this corpus's event-type distribution (some
    types pass, some fail), so the oracle exercises both sides."""
    from hierarchical_bloom_filter_index_spark.operators.keystats import (
        column_heavy_hitters,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return column_heavy_hitters(ev, "event_type", 1, 5).orderBy("event_type")


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSIONIZATION: gap-based sessions (6h) over the event stream —
    lag + running-sum window pair sharing ONE exchange, per-session
    summary rows (operators/sessions.sessionize). Timestamps travel as
    epoch micros so the DuckDB window-function twin is timezone-free."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        sessionize,
        with_epoch_us,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return sessionize(ev, SESSION_GAP_US, order_cols=("event_id",))


def q_session_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL-STREAMING sessionization parity (streaming/stateful.
    session_state_stream): the event stream drained through
    applyInPandasWithState + EventTimeTimeout must emit EXACTLY the batch
    sessionize sessions whose end + gap is at or below the stream's final
    watermark (= the global max event time after the availableNow no-data
    batch; later sessions are still provably growable and stay open).
    Returns the symmetric difference (empty oracle). Stream drain — keep
    OUT of bench."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        sessionize,
        with_epoch_us,
    )
    from hierarchical_bloom_filter_index_spark.streaming.stateful import (
        session_state_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts")
    base = _tmpdir(prefix="hbi_sessstream_")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{base}/in")
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in ev.schema.fields)
    stream = spark.readStream.schema(schema).parquet(f"{base}/in")
    q = (
        session_state_stream(stream, SESSION_GAP_US)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/chk")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("session_stream_parity: drain exceeded 300s")
    import glob as _glob

    # probe for data files instead of a bare except: ONLY the zero-
    # closed-sessions case (no part files -> schema inference fails) maps
    # to an empty result; a torn/corrupt sink must still raise
    if _glob.glob(f"{base}/out/*.parquet"):
        got = spark.read.parquet(f"{base}/out")
    else:
        got = spark.createDataFrame(
            [], "user_id string, t_start long, t_end long, n_events long")
    batch = sessionize(with_epoch_us(ev), SESSION_GAP_US).select(
        F.col("user_id").cast("string").alias("user_id"),
        "session_idx", "t_start", "t_end", "n_events")
    # Emission semantics: every NON-last session of a user is closed by the
    # gap to the user's next event (always emitted in a full drain); a
    # user's LAST session is emitted iff its event-time timeout fired vs
    # the final watermark. Spark fires timeouts STRICTLY after the (ms-
    # truncated) timeout stamp, so last sessions whose end + gap sits
    # within a few ms of the global max event time are boundary-ambiguous:
    # exclude that band from BOTH sides instead of encoding the exact
    # truncation chain (band width 10ms >> the +2ms stamp slack).
    max_ts = batch.agg(F.max("t_end")).first()[0]
    last = (batch.groupBy("user_id")
            .agg(F.max("session_idx").alias("session_idx")))
    is_last = F.col("_is_last").isNotNull()
    tagged = batch.join(
        last.withColumn("_is_last", F.lit(1)),
        ["user_id", "session_idx"], "left")
    band = is_last & (F.col("t_end") + SESSION_GAP_US + 10_000 > max_ts) \
        & (F.col("t_end") + SESSION_GAP_US - 10_000 <= max_ts)
    fires = F.col("t_end") + SESSION_GAP_US + 10_000 <= max_ts
    want = (tagged.filter(~band & (~is_last | fires))
            .select("user_id", "t_start", "t_end", "n_events"))
    band_rows = (tagged.filter(band)
                 .select("user_id", "t_start", "t_end", "n_events"))
    got_f = got.join(band_rows, ["user_id", "t_start", "t_end", "n_events"],
                     "left_anti")
    return got_f.exceptAll(want).unionAll(want.exceptAll(got_f))


def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-TOUCH ATTRIBUTION: every purchase gains the EARLIEST click of
    the same user within the 12h lookback (strictly before; (t, id) struct
    min = deterministic tie-break), unattributed purchases kept with NULL
    touch columns. Runs as a (user, bin) EQUI-join through
    interval_point_join — never a range join
    (operators/sessions.attribution_touches; the last-touch twin of
    events_asof_purchase's as-of join)."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        attribution_touches,
        with_epoch_us,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return attribution_touches(ev, "click", "purchase", ATTR_WINDOW_US,
                               mode="first")


def q_events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: each error event gains the latest STRICTLY-prior
    purchase of the same user (union-tag + last(ignorenulls) over one
    sorted exchange — operators/sessions.asof_join; never a range-join
    cross product). Left semantics: unmatched errors keep nulls. Twin:
    DuckDB ASOF LEFT JOIN."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        asof_join,
        with_epoch_us,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "t_us")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "t_us", F.col("value").alias("purchase_value"))
    return asof_join(left, right, "user_id", "t_us", ["purchase_value"],
                     strict=True)


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's date_trunc casts TIMESTAMP_NTZ through the session timezone
    # (measured: a +05:45 zone shifts the truncation boundaries) — pin UTC
    # so the DuckDB wall-time oracle equality is environment-independent
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n"), F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )


def q_events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_hourly computed THROUGH Structured Streaming: file-source
    stream -> watermarked tumbling event-time windows
    (streaming/windows.windowed_event_aggregate) -> complete-mode sink.
    Tumbling 1-hour windows are epoch-aligned, so window_start equals the
    batch date_trunc('hour') closed form — the same oracle as events_hourly
    (late-data drop semantics are covered by
    tests/test_streaming_windows.py; a single availableNow drain emits
    every window in complete mode)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.streaming.windows import (
        windowed_event_aggregate,
    )

    import uuid

    # the NTZ->TIMESTAMP cast inside windowed_event_aggregate interprets
    # wall time in the SESSION timezone; epoch-aligned 1-hour windows equal
    # date_trunc('hour') of the NTZ wall time only under a whole-hour UTC
    # offset. Pin UTC so the stream/batch/DuckDB equality cannot depend on
    # the box's timezone (sticky for the session, which is what the driver's
    # later collect needs).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    workdir = _tmpdir(prefix="hbi_win_q_")
    inp, chk = f"{workdir}/in", f"{workdir}/chk"
    ev.write.mode("overwrite").parquet(inp)
    stream = spark.readStream.schema(ev.schema).parquet(inp)
    agg = windowed_event_aggregate(stream, watermark="1 hour")
    sink = f"events_win_{uuid.uuid4().hex[:8]}"  # memory sink: complete mode
    q = (
        agg.writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", chk).outputMode("complete")
        .trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        # a partially-drained memory sink would read as a windowing bug —
        # fail loudly with the real cause instead
        q.stop()
        raise TimeoutError("events_hourly_stream: availableNow drain exceeded 300s")
    return (
        spark.table(sink)
        .select("event_type",
                F.col("window_start").cast("timestamp_ntz").alias("hour"),
                "n", "vmin", "vmax")
    )


def q_events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING EXACT DEDUP: the events table written TWICE into the
    source directory, drained through dropDuplicates state
    (streaming/windows.deduplicated_stream) — the sink holds exactly the
    original rows, so per-type counts equal the batch table's (the
    streaming twin of dedup_exact_pairs' semantics; cross-drain
    suppression via the checkpointed state store is covered in
    tests/test_streaming_windows.py)."""
    import tempfile
    import uuid

    from hierarchical_bloom_filter_index_spark.streaming.windows import (
        deduplicated_stream,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    workdir = _tmpdir(prefix="hbi_dedup_q_")
    inp, chk = f"{workdir}/in", f"{workdir}/chk"
    ev.write.mode("overwrite").parquet(inp)
    ev.write.mode("append").parquet(inp)  # the duplicates
    stream = spark.readStream.schema(ev.schema).parquet(inp)
    sink = f"dedup_stream_{uuid.uuid4().hex[:8]}"
    q = (
        deduplicated_stream(stream, ("event_id",))
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", chk).outputMode("append")
        .trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("events_dedup_stream: availableNow drain exceeded 300s")
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_streaming_state_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming applyInPandasWithState: run the corpus through a
    file-source stream (availableNow) maintaining a per-source HLL state;
    return the final per-source counters (SQL-checkable) — the estimate and
    state bytes are covered by tests/test_stateful_streaming.py."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.sketches import HyperLogLog
    from hierarchical_bloom_filter_index_spark.streaming.stateful import sketch_state_stream

    workdir = _tmpdir(prefix="hbi_stream_q_")
    inp, chk, out = (f"{workdir}/{d}" for d in ("in", "chk", "out"))
    _corpus(spark, sf_dir).write.mode("overwrite").parquet(inp)
    stream = spark.readStream.schema(C.CORPUS_SCHEMA).parquet(inp)
    updated = sketch_state_stream(
        stream, factory=lambda: HyperLogLog(p=12, seed=CFG.seed), estimate=lambda sk: sk.estimate()
    )
    q = (
        updated.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", chk).outputMode("append")
        .trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming_state_by_source: availableNow drain exceeded 300s")
    res = spark.read.parquet(out)
    w = Window.partitionBy("source").orderBy(F.desc("n_docs"))
    return (
        res.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "n_docs", "n_tokens")
    )


def q_snapshot_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRIFT x TIME TRAVEL: pairwise TVD between the token distributions
    of the versioned table's three snapshots — 'how much did that
    upsert/delete shift the corpus mix', answered with exact integer
    numerators over time-travel reads (operators/drift.pairwise_tvd over
    vtable.read_table(version=k)). Oracle reconstructs each version
    relationally (the vtable_fast_stats CTEs) and runs the same TVD
    algebra."""
    from hierarchical_bloom_filter_index_spark.functions import (
        codepoint_tokens,
    )
    from hierarchical_bloom_filter_index_spark.operators import vtable as V

    path, _mx = _vtable_fixture(spark, sf_dir)
    parts = [
        V.read_table(spark, path, v).select(
            F.lit(str(v)).alias("source"),
            codepoint_tokens("text").alias("tokens"))
        for v in (0, 1, 2)
    ]
    allv = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return DR.pairwise_tvd(DR.group_token_counts(allv, "source"))


def q_expectations_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING data-quality gate parity: orders drained through a file
    stream in two drops, every micro-batch validated by the SAME
    check_constraints pass (replay-guarded per-batch report append);
    for ADDITIVE constraint kinds the per-batch violation/n_rows sums
    must equal the whole-corpus report exactly
    (operators/expectations.expectations_stream). Returns the symmetric
    difference of (constraint, violations, n_rows) (empty oracle)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import (
        expectations as EXP,
    )

    adds = [c for c in ORDERS_CONS if c[0] in EXP.ADDITIVE_KINDS]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 3 != 0)
    base = _tmpdir(prefix="hbi_expstream_")
    half = F.col("o_orderkey") % 2
    orders.where(half == 0).coalesce(2).write.mode("overwrite").parquet(
        f"{base}/in")
    orders.where(half == 1).coalesce(2).write.mode("append").parquet(
        f"{base}/in")
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in orders.schema.fields)
    q = EXP.expectations_stream(
        spark, f"{base}/in", f"{base}/chk", f"{base}/out", adds, schema,
        dims={"customer_dim": dim})
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "expectations_stream_parity: availableNow drain exceeded 300s")
    streamed = EXP.read_expectation_totals(spark, f"{base}/out")
    batch = EXP.check_constraints(orders, adds, dims={"customer_dim": dim}
                                  ).select("constraint", "violations", "n_rows")
    return streamed.exceptAll(batch).unionByName(batch.exceptAll(streamed))


def q_source_doclen_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS drift: pairwise two-sample Kolmogorov-Smirnov distance
    between every pair of sources' doc-LENGTH distributions, from
    per-group KLL sketches (operators/drift.grouped_ks; kernel
    sketches/kll.ks_distance, |est - true| <= eps_a + eps_b). k=1024
    exceeds the per-source doc counts at every sweep scale, so the
    sketches stay UNCOMPACTED and the estimate is the EXACT two-sample
    KS — which is what makes a value oracle possible here (the compacted
    regime's contract is the rank bound, tested in pytest). If a scale
    ever pushes a source past k docs, this oracle breaks BY DESIGN:
    estimates take over."""
    corp = _corpus(spark, sf_dir).select("source", "n_tok")
    return DR.grouped_ks(corp, "n_tok", "source", k=1024, seed=CFG.seed)


def q_doc_atypicality_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY OUTLIERS: the 20 most distributionally ATYPICAL docs —
    highest TVD between a doc's own token distribution and its source's
    corpus-wide one (gibberish inside a clean source scores high;
    operators/drift.doc_group_tvd — exact integer numerators, no
    doc-doc join anywhere, one linear (grp, token) join). Deterministic
    (tvd DESC, doc_id ASC) order; both engines compute the identical
    doubles from identical integers."""
    corp = _corpus(spark, sf_dir)
    return (
        DR.doc_group_tvd(corp)
        .orderBy(F.col("tvd").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def q_event_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift family on a RELATIONAL categorical: pairwise TVD between
    every pair of DAYS' event-type distributions (30 days -> 435 pairs) —
    the monitoring query that flags a day whose event mix shifted.
    pairwise_tvd is agnostic to what 'token' is (join/group key only), so
    the same exact-integer machinery serves event types as well as
    codepoints (operators/drift.pairwise_tvd). ts is TIMESTAMP_NTZ: day
    bucketing is pure wall time, no session-timezone dependence."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("grp"),
                   F.col("event_type").alias("token"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    return DR.pairwise_tvd(counts)


def q_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over orders: all five scalar
    constraints ride ONE aggregate over ONE scan (plan-asserted in
    tests), unique is one groupBy, the fk orphan check one LEFT ANTI
    broadcast join against a deliberately-thinned customer dim (so the
    violation count is non-zero and the oracle is a real equality).
    Exact integer violation counts per constraint
    (operators/expectations.check_constraints)."""
    from hierarchical_bloom_filter_index_spark.operators import (
        expectations as EXP,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 3 != 0)
    return EXP.check_constraints(orders, ORDERS_CONS,
                                 dims={"customer_dim": dim})


def q_orders_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-LEVEL routing (operators/expectations.quarantine): every
    violating orders row with the sorted '|'-joined names of the
    constraints it breaks — the actionable side of the expectations
    report (clean rows route on, these route to quarantine WITH
    reasons). Scalar checks are projections, unique is one window
    count, fk one broadcast left join; the oracle rebuilds the same
    reason lists per row in SQL."""
    from hierarchical_bloom_filter_index_spark.operators import (
        expectations as EXP,
    )

    cons = [c for c in ORDERS_CONS
            if c[0] not in ("row_count_between", "freshness")]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_custkey") % 3 != 0)
    q = EXP.quarantine(orders, cons, dims={"customer_dim": dim})
    return q.where(F.col("violated") != "").select("o_orderkey", "violated")


def q_profile_learned_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTO DATA CONTRACT: profile orders' key columns in one scan
    (operators/profile.profile_columns), mint constraints from the
    profile's EXACT fields only (operators/expectations.
    suggest_constraints — estimate-backed fields suggest nothing), then
    validate the learned contract with check_constraints on the same
    snapshot. The oracle re-derives the identical suggestions from SQL
    aggregates (conditional rows: not_null only when the null count is
    0) and recomputes every violation count exactly."""
    from hierarchical_bloom_filter_index_spark.operators import (
        expectations as EXP,
    )
    from hierarchical_bloom_filter_index_spark.operators import profile as PR

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prof = PR.profile_columns(orders, ["o_orderkey", "o_custkey"])
    return EXP.check_constraints(orders, EXP.suggest_constraints(prof))


def q_catalog_table_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATALOG layer gate (operators/catalog.py): documents registered as
    a NAMED table, upserted + range-deleted into three snapshots; an
    immutable TAG pins v0 and a BRANCH points at v1. Gates, in-query:
    (1) reads by tag/branch are row-identical to time-travel reads of the
    versions they resolve to; (2) retention REFUSES while the tag pins
    v0 (refs are promises); (3) after drop_ref + expiry, v0 is gone, the
    branch still reads exactly v1. Returns the union of the three
    symmetric differences (empty oracle)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import catalog as CG
    from hierarchical_bloom_filter_index_spark.operators import vtable as V

    root = _tmpdir(prefix="hbi_catalog_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    CG.create_catalog_table(docs, root, "docs", stat_cols=("doc_id",))
    path = CG.table_path(root, "docs")
    mx = docs.agg(F.max("doc_id")).first()[0]
    updates = docs.where(
        F.col("doc_id").between(mx // 4, mx // 2) & (F.col("doc_id") % 3 == 0)
    ).select("doc_id", F.concat(F.lit("UPD "), F.col("text")).alias("text"))
    V.upsert(spark, path, updates, "doc_id")                    # v1
    V.delete_range(spark, path, "doc_id", 3 * mx // 5, 9 * mx // 10)  # v2
    CG.create_tag(root, "docs", "rel0", version=0)
    CG.set_branch(root, "docs", "stable", version=1)

    def symdiff(a: DataFrame, b: DataFrame) -> DataFrame:
        a, b = a.select("doc_id", "text"), b.select("doc_id", "text")
        return a.exceptAll(b).unionByName(b.exceptAll(a))

    d_tag = symdiff(CG.load_table(spark, root, "docs", "tag.rel0"),
                    V.read_table(spark, path, 0)).localCheckpoint()
    d_br = symdiff(CG.load_table(spark, root, "docs", "branch.stable"),
                   V.read_table(spark, path, 1))
    try:
        CG.expire_table_snapshots(spark, root, "docs", keep_from_version=1)
        raise AssertionError("catalog_table_ops: expiry ignored the pinned tag")
    except ValueError:
        pass
    CG.drop_ref(root, "docs", "tag.rel0")
    CG.expire_table_snapshots(spark, root, "docs", keep_from_version=1)
    try:
        V.read_table(spark, path, 0)
        raise AssertionError("catalog_table_ops: expired v0 still readable")
    except ValueError:
        pass
    d_post = symdiff(CG.load_table(spark, root, "docs", "branch.stable"),
                     V.read_table(spark, path, 1))
    return d_tag.unionByName(d_br).unionByName(d_post)


def q_source_token_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise total-variation distance between every source's unigram
    token distribution: numerator sum|c_a*N_b - c_b*N_a| carried as exact
    DECIMAL(38,0) integers (HUGEINT in the twin) so `tvd_num` is a value
    equality, one float division at the end. Tokens private to one side
    enter via a closed-form correction — the inner token join never
    materializes the full outer matrix (operators/drift.pairwise_tvd)."""
    counts = DR.group_token_counts(_corpus(spark, sf_dir))
    return DR.pairwise_tvd(counts)


def q_tvd_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: top-20 tokens driving TVD(src0, src1), ordered by the
    exact integer contribution with token ASC tie-break (deterministic
    k-th boundary); tvd_share sums to the pair's TVD over all tokens
    (operators/drift.tvd_contributors)."""
    counts = DR.group_token_counts(_corpus(spark, sf_dir))
    return DR.tvd_contributors(counts, TVD_PAIR[0], TVD_PAIR[1], k=TVD_TOPK)


def q_token_drift_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING drift maintenance parity gate: the corpus drained through
    a file stream as replay-guarded per-batch count deltas
    (operators/drift.token_counts_stream), then the re-aggregated readout
    must equal the batch `group_token_counts` — counts are integer-
    mergeable so any batch split sums to the same table. Returns the
    symmetric difference (empty oracle)."""
    import tempfile

    docs = _docs(spark, sf_dir)
    base = _tmpdir(prefix="hbi_drift_stream_")
    half = _doc_num("doc_id") % 2
    docs.filter(half == 0).coalesce(2).write.mode("overwrite").parquet(
        f"{base}/in")
    docs.filter(half == 1).coalesce(2).write.mode("append").parquet(
        f"{base}/in")
    q = DR.token_counts_stream(
        spark, f"{base}/in", f"{base}/chk", f"{base}/out")
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("token_drift_stream: availableNow drain exceeded 300s")
    streamed = DR.read_group_token_counts(spark, f"{base}/out")
    batch = DR.group_token_counts(_corpus(spark, sf_dir))
    return streamed.exceptAll(batch).unionByName(batch.exceptAll(streamed))


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEHAVIORAL PATH MINING (operators/sessions.session_paths): the 10
    most common session event-type sequences (first 8 events, '|'
    joined) over 6h-gap sessions — (t_us, event_id) ordering makes each
    path a pure function of the data, (n DESC, path ASC) pins the top-k
    boundary.  Oracle = the session CTE + list(... ORDER BY) slice."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        session_paths, with_epoch_us)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return session_paths(ev, SESSION_GAP_US, k=10, max_len=8,
                         order_cols=("event_id",))


def q_event_rolling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING TIME-SERIES AGG (operators/sessions.rolling_daily_counts):
    per-type daily event counts + fixed-point value sums with a trailing
    7-day RANGE-frame rolling sum — integer epoch days, so gaps age out
    exactly and every output is a BIGINT both engines reproduce."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_daily_counts, with_epoch_us)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return rolling_daily_counts(ev, 7)


def q_rolling_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING QUANTILES (operators/sessions.rolling_value_quantiles):
    trailing-7-day p50/p90/p99 of event values per type from mergeable
    KLL day nodes — rational-rank readout (r = max(1, ceil(num*n/den)))
    so the uncompacted regime is the EXACT order statistic the oracle
    reproduces with ROW_NUMBER.  k=1024 holds every sf0.01 window
    uncompacted; a compacted node flips `exact` false and fails the
    gate BY DESIGN (the estimate regime's contract is the KLL rank
    bound, tested)."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_value_quantiles, with_epoch_us)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return rolling_value_quantiles(ev, 7, k=1024, seed=CFG.seed + 53)


def q_rolling_distinct_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING DAY-NODE MAINTENANCE GATE (operators/sessions.write_day_
    node_store family): base store on two thirds of the events, the rest
    arrives as a file stream (exactly-once delta commits via the
    batch_id _SUCCESS probe), and the store-served rolling distinct must
    equal the batch builder over ALL events — sketch nodes are
    mergeable, so base + deltas is exact by construction — before AND
    after compaction.  Empty symmetric difference; empty-relation
    oracle.  OUT of bench.py (stream drain)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        compact_day_nodes, day_node_stream, rolling_distinct_daily,
        rolling_distinct_from_store, with_epoch_us, write_day_node_store)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    old = ev.filter(F.col("event_id") % 3 != 0)
    new = ev.filter(F.col("event_id") % 3 == 0)
    base = _tmpdir(prefix="hbi_daynodes_")
    write_day_node_store(old, f"{base}/store", family="hll", p=12,
                         seed=CFG.seed + 47)
    new.coalesce(2).write.mode("overwrite").parquet(f"{base}/in")
    q = day_node_stream(
        spark.readStream.schema(new.schema).parquet(f"{base}/in"),
        f"{base}/store", f"{base}/chk")
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "rolling_distinct_stream_parity: drain exceeded 300s")
    batch = rolling_distinct_daily(ev, 7, p=12, seed=CFG.seed + 47)
    live = rolling_distinct_from_store(spark, f"{base}/store", 7)
    pre = live.exceptAll(batch).unionByName(batch.exceptAll(live))
    pre = pre.localCheckpoint()  # compaction deletes files the lazy plan reads
    compact_day_nodes(spark, f"{base}/store")
    post_live = rolling_distinct_from_store(spark, f"{base}/store", 7)
    post = post_live.exceptAll(batch).unionByName(batch.exceptAll(post_live))
    return pre.unionByName(post)


def q_label_centroid_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT EMBEDDING CENTROIDS (operators/similarity.grouped_centroid_
    sums): per-label per-dimension centroid numerators as ORDER-FREE
    integer sums (floor onto the 2^-20 fixed-point grid before summing —
    float accumulation is never cross-engine reproducible, this is).
    Oracle = the same floor/sum in SQL over the unnested vectors."""
    from hierarchical_bloom_filter_index_spark.operators.similarity import (
        grouped_centroid_sums)

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return grouped_centroid_sums(embs)


def q_rolling_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CERTIFIED EXACT SLIDING-WINDOW HEAVY HITTERS (operators/sessions.
    rolling_heavy_users): who generated >= 1/50 of each event type's
    trailing-7-day events — per-day Misra-Gries nodes, window-union
    candidate supersets cut by the exact integer certificate (refusing
    loudly if k can't certify phi; k=51 makes refusal impossible), one
    bounded exact counting pass decides.  The range_heavy_hitters
    discipline on the time axis.  Oracle = brute per-window counts."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_heavy_users, with_epoch_us)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return rolling_heavy_users(ev, 7, 1, 50)


def q_session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSITION GATE: sessionize × robust order statistics — per user
    cohort (user_id % 4; event replicas keep user_ids so the cohorts are
    scale-stable), the exact med2/mad2/outlier-count of session
    DURATIONS (t_end - t_start, epoch micros).  Every stage integer:
    the session summary, the doubled-scale medians, the rational-k MAD
    rule (k = 3).  Oracle = the session CTE + ROW_NUMBER order
    statistics."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        sessionize, with_epoch_us)
    from hierarchical_bloom_filter_index_spark.operators.stats import (
        mad_outlier_stats)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    sess = sessionize(ev, SESSION_GAP_US, order_cols=("event_id",))
    dur = sess.select(
        (F.col("user_id") % 4).alias("cohort"),
        (F.col("t_end") - F.col("t_start")).alias("dur_us"))
    return mad_outlier_stats(dur, "dur_us", ("cohort",), k_num=3)


def q_event_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING DISTINCT (operators/sessions.rolling_distinct_daily):
    trailing 7-day distinct users per event type from per-day HLL nodes
    — distinct is NOT additive across days, so the rolling answer is
    the lossless union of the window's day sketches.  At this corpus's
    cardinalities every node stays sparse-EXACT (p=12: 512-key sparse
    cap vs ~150 users), so both counts are exact integers and the
    oracle is plain COUNT(DISTINCT) over the day range; a dense node
    would flip `exact` false and fail the gate BY DESIGN (the estimate
    regime has no SQL twin — its contract is the HLL bound, tested)."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_distinct_daily, with_epoch_us)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return rolling_distinct_daily(ev, 7, p=12, seed=CFG.seed + 47)


def q_source_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY COVERAGE (operators/text.vocab_coverage): per-source
    running-word coverage + distinct OOV types against the corpus's own
    top-16 word vocabulary (word_vocab's (cnt DESC, word ASC) total
    order makes the vocab SET deterministic).  Broadcast vocab join; all
    outputs exact integers."""
    from hierarchical_bloom_filter_index_spark.operators.text import (
        vocab_coverage, word_vocab)

    docs = _docs(spark, sf_dir)
    return vocab_coverage(docs, word_vocab(docs, VOCAB_N))


def q_oov_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP OOV TERMS (operators/text.oov_top_terms): per source, the 3
    most frequent words OUTSIDE the top-16 vocabulary — what a tokenizer
    retrain should add first.  (cnt DESC, word ASC) tie-break pins the
    per-source top-k set on both engines."""
    from hierarchical_bloom_filter_index_spark.operators.text import (
        oov_top_terms, word_vocab)

    docs = _docs(spark, sf_dir)
    return oov_top_terms(docs, word_vocab(docs, VOCAB_N), k=3)


def q_doclen_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST OUTLIERS (operators/stats.mad_outlier_stats): per-source
    doc-length outlier counts under |x - median| > 2.5 * MAD, decided by
    the exact integer cross-product 2*dev*k_den > k_num*mad2 on the
    DOUBLED order-statistic scale (med2 = lower+upper middle — exact
    even-n medians with no x.5 float).  The robust twin of the
    mean/sigma rule in group_outliers; oracle re-derives the same order
    statistics via ROW_NUMBER (never the engine's median(), which
    returns an averaged DOUBLE)."""
    from hierarchical_bloom_filter_index_spark.operators.stats import (
        mad_outlier_stats)

    docs = _docs(spark, sf_dir).select(
        "source", F.length("text").alias("doclen"))
    return mad_outlier_stats(docs, "doclen", ("source",), k_num=5, k_den=2)


def q_events_pseudonymized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC PSEUDONYMIZATION: per-pseudonym event counts after
    tokenizing user_id through the bijective hash64 hex pid (collision-
    free, so the group cardinalities equal the raw user_id ones; the
    DuckDB twin reproduces every pseudonym via the HUGEINT SplitMix64
    chain + to_hex halves — operators/pii.pseudonymize_numeric)."""
    from hierarchical_bloom_filter_index_spark.operators.pii import (
        pseudonymize_numeric,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    return (pseudonymize_numeric(ev, "user_id", PSEUDO_SEED, out_col="pid")
            .groupBy("pid").agg(F.count(F.lit(1)).alias("n_events")))


def q_events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY RISK REPORT: (user_id, event_type) quasi-identifier
    combinations carried by fewer than k=5 events — exact counts, one
    groupBy (operators/pii.k_anonymity_report); plus the suppression twin
    checked in-query: k_suppress must drop EXACTLY the reported rows
    (count identity asserted in-plan via the returned totals)."""
    from hierarchical_bloom_filter_index_spark.operators.pii import (
        k_anonymity_report,
        k_suppress,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type")
    rep = k_anonymity_report(ev, ("user_id", "event_type"), KANON_K)
    # in-query suppression identity: rows dropped by k_suppress == sum of
    # reported group sizes (hard gate — a mismatch raises before returning)
    n_total = ev.count()
    n_kept = k_suppress(ev, ("user_id", "event_type"), KANON_K).count()
    n_rep = rep.agg(F.sum("n")).first()[0] or 0
    if n_total - n_kept != n_rep:
        raise AssertionError(
            f"k_suppress dropped {n_total - n_kept} rows but the report "
            f"covers {n_rep}")
    return rep


def q_doclen_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-source percentile ranks of doc length in ppm — the score
    normalization step before cross-source quality cuts (rank() ties count
    rows strictly below; rank and group count share ONE window exchange —
    operators/stats.percentile_rank)."""
    from hierarchical_bloom_filter_index_spark.operators.stats import (
        percentile_rank,
    )

    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.length("text").cast("bigint").alias("doclen"))
    return percentile_rank(docs, "doclen", ("source",))


def q_custsupp_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTEGER PAGERANK over the customer-supplier trade graph: distinct
    (custkey, suppkey) pairs from lineitem x orders, undirected (both
    directions), PR_ITERS power iterations in pure BIGINT fixed-point —
    per-node emit is floor(s/deg) computed ONCE per round, in-messages are
    order-free integer sums, so the scores are hash-exact vs the DuckDB
    unrolled-CTE twin (operators/graph.pagerank_scaled; float PageRank
    could never be — parallel float sums re-associate)."""
    from hierarchical_bloom_filter_index_spark.operators.graph import pagerank_scaled

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey")
    e = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .select(F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("u"),
                 F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("v"))
         .distinct())
    ed = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return pagerank_scaled(ed, iters=PR_ITERS, damping=PR_DAMPING,
                           scale=PR_SCALE)


__all__ = [k for k in list(globals()) if not k.startswith('__')]
