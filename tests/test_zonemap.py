"""File-level zone maps (operators/zonemap.py): pruned reads equal full
scans under the exact predicate, pruning actually skips files on clustered
layouts, Bloom probes have no false negatives, lifecycle (persist/append)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.zonemap import (
    append_zone_map,
    build_zone_map,
    prune_files,
    read_pruned,
    read_zone_map,
    write_zone_map,
)


@pytest.fixture(scope="module")
def layout(spark, sf_dir):
    """lineitem range-clustered on l_orderkey into 8 files."""
    path = tempfile.mkdtemp(prefix="hbi_zm_layout_")
    (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
     .repartitionByRange(8, "l_orderkey")
     .write.mode("overwrite").parquet(path))
    df = spark.read.parquet(path)
    zm = build_zone_map(df, stat_cols=("l_orderkey",)).persist()
    yield path, df, zm
    zm.unpersist()
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="module")
def doc_layout(spark, sf_dir):
    """documents hash-clustered on doc_id into 8 files, Bloom on doc_id."""
    path = tempfile.mkdtemp(prefix="hbi_zm_docs_")
    (spark.read.parquet(f"{sf_dir}/documents.parquet")
     .repartition(8, "doc_id")
     .write.mode("overwrite").parquet(path))
    df = spark.read.parquet(path)
    zm = build_zone_map(df, bloom_col="doc_id").persist()
    yield path, df, zm
    zm.unpersist()
    shutil.rmtree(path, ignore_errors=True)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_zone_map_shape(spark, layout):
    path, df, zm = layout
    files = {r["_file"] for r in zm.collect()}
    assert len(files) == len(df.inputFiles()) == 8
    assert zm.agg(F.sum("n_rows")).first()[0] == df.count()
    # envelopes hold
    bad = (df.withColumn("_file", F.input_file_name())
           .join(zm, "_file")
           .where((F.col("l_orderkey") < F.col("min_l_orderkey"))
                  | (F.col("l_orderkey") > F.col("max_l_orderkey"))))
    assert bad.count() == 0


def test_range_prune_equals_full_scan(spark, layout):
    path, df, zm = layout
    mn, mx = df.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    lo = mn + (mx - mn) // 4
    hi = mn + 3 * (mx - mn) // 8
    files = prune_files(zm, "l_orderkey", lo, hi)
    assert 0 < len(files) < 8  # range-clustered layout must actually skip
    pred = F.col("l_orderkey").between(lo, hi)
    got = read_pruned(spark, path, files).where(pred)
    want = df.where(pred)
    cols = df.columns
    assert _rows(got, cols) == _rows(want, cols)


def test_one_sided_and_empty_ranges(spark, layout):
    path, df, zm = layout
    mn, mx = df.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    assert sorted(prune_files(zm, "l_orderkey", None, mx)) == sorted(
        prune_files(zm))  # no-op bound keeps every file
    files = prune_files(zm, "l_orderkey", mx + 1, None)
    assert files == []
    got = read_pruned(spark, path, files)
    assert got.count() == 0 and got.columns == df.columns


def test_bloom_prune_point_lookup(spark, doc_layout):
    path, df, zm = doc_layout
    ids = [r["doc_id"] for r in df.orderBy("doc_id").limit(5).collect()]
    files = prune_files(zm, bloom_keys=ids)
    # each id lives in one file; FPR can add a few, never drop one
    assert 1 <= len(files) <= 8
    pred = F.col("doc_id").isin(ids)
    got = read_pruned(spark, path, files).where(pred)
    want = df.where(pred)
    assert _rows(got, ["doc_id", "n_chars"]) == _rows(want, ["doc_id", "n_chars"])
    assert got.count() == 5


def test_bloom_prune_absent_and_empty_keys(spark, doc_layout):
    path, df, zm = doc_layout
    absent = -987654321
    files = prune_files(zm, bloom_keys=[absent])
    # soundness: reading the (possibly empty) survivor set + exact predicate
    got = read_pruned(spark, path, files).where(F.col("doc_id") == absent)
    assert got.count() == 0
    assert prune_files(zm, bloom_keys=[]) == []


def test_bloom_prune_string_keys(spark, sf_dir):
    """String bloom column: probe values hash through the SAME xxhash64
    expression the builder used."""
    path = tempfile.mkdtemp(prefix="hbi_zm_str_")
    try:
        (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .repartition(4, "source").write.mode("overwrite").parquet(path))
        df = spark.read.parquet(path)
        zm = build_zone_map(df, bloom_col="source")
        src = df.select("source").first()["source"]
        files = prune_files(zm, bloom_keys=[src])
        assert 1 <= len(files) <= 4
        got = read_pruned(spark, path, files).where(F.col("source") == src)
        want = df.where(F.col("source") == src)
        assert got.count() == want.count() > 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_combined_range_and_bloom(spark, sf_dir):
    path = tempfile.mkdtemp(prefix="hbi_zm_comb_")
    try:
        (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .repartitionByRange(6, "o_orderkey")
         .write.mode("overwrite").parquet(path))
        df = spark.read.parquet(path)
        zm = build_zone_map(df, stat_cols=("o_orderkey",), bloom_col="o_custkey")
        mn, mx = df.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
        hi = mn + (mx - mn) // 3
        cks = [r["o_custkey"] for r in df.limit(3).collect()]
        files = prune_files(zm, "o_orderkey", None, hi, bloom_keys=cks)
        pred = (F.col("o_orderkey") <= hi) & F.col("o_custkey").isin(cks)
        got = read_pruned(spark, path, files).where(pred)
        want = df.where(pred)
        assert _rows(got, df.columns) == _rows(want, df.columns)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_zone_map_persist_and_append(spark, layout, sf_dir):
    path, df, zm = layout
    zpath = tempfile.mkdtemp(prefix="hbi_zm_meta_")
    extra = tempfile.mkdtemp(prefix="hbi_zm_extra_")
    try:
        write_zone_map(zm, zpath)
        rt = read_zone_map(spark, zpath)
        assert _rows(rt, ["_file", "n_rows"]) == _rows(zm, ["_file", "n_rows"])
        # append: new files' rows union in; totals track the grown layout
        (spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100)
         .coalesce(1).write.mode("overwrite").parquet(extra))
        new_rows = build_zone_map(
            spark.read.parquet(extra), stat_cols=("l_orderkey",))
        grown = append_zone_map(rt, new_rows)
        assert grown.count() == rt.count() + 1
        assert grown.agg(F.sum("n_rows")).first()[0] == df.count() + 100
    finally:
        shutil.rmtree(zpath, ignore_errors=True)
        shutil.rmtree(extra, ignore_errors=True)


# ---------------------------------------------------------------------------
# streaming ingest + zone-map maintenance
# ---------------------------------------------------------------------------

from hierarchical_bloom_filter_index_spark.operators.zonemap import (  # noqa: E402
    read_layout,
    zone_map_ingest_stream,
)

_ZM_CAP = 2048


def _zm_rows(zm):
    return sorted(
        (r["_file"], r["n_rows"], r["min_doc_id"], r["max_doc_id"],
         None if r["bloom"] is None else bytes(r["bloom"]))
        for r in zm.collect())


def test_zone_map_ingest_stream(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="hbi_zm_stream_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        half = F.col("doc_id") % 2
        docs.where(half == 0).write.mode("overwrite").parquet(f"{base}/in")
        docs.where(half == 1).write.mode("append").parquet(f"{base}/in")
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", "1").parquet(f"{base}/in"))
        q = zone_map_ingest_stream(
            stream, f"{base}/lay", f"{base}/zm", f"{base}/chk",
            stat_cols=("doc_id",), bloom_col="doc_id", bloom_capacity=_ZM_CAP)
        assert q.awaitTermination(300)
        live = read_zone_map(spark, f"{base}/zm")
        assert live.select("batch_id").distinct().count() >= 2
        # parity vs a scratch build over the ingested layout (same pinned
        # capacity -> per-file bloom BYTES equal, not just stats)
        want = build_zone_map(
            read_layout(spark, f"{base}/lay"), ("doc_id",),
            bloom_col="doc_id", bloom_capacity=_ZM_CAP)
        assert _zm_rows(live.drop("batch_id")) == _zm_rows(want)
        # the streamed layout is queryable through the pruning surface
        ids = [r["doc_id"] for r in docs.limit(4).collect()]
        files = prune_files(live, bloom_keys=ids)
        got = read_pruned(spark, f"{base}/lay", files).where(
            F.col("doc_id").isin(ids))
        assert got.count() == 4
        # full-replay drill: fresh checkpoint redelivers every batch; the
        # batch_id guard + overwrite-own-dir idempotence leave everything
        # byte-identical
        before = _zm_rows(live.drop("batch_id"))
        stream2 = (spark.readStream.schema(docs.schema)
                   .option("maxFilesPerTrigger", "1").parquet(f"{base}/in"))
        q2 = zone_map_ingest_stream(
            stream2, f"{base}/lay", f"{base}/zm", f"{base}/chk2",
            stat_cols=("doc_id",), bloom_col="doc_id", bloom_capacity=_ZM_CAP)
        assert q2.awaitTermination(300)
        after = read_zone_map(spark, f"{base}/zm")
        assert _zm_rows(after.drop("batch_id")) == before
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_expire_batches(spark, sf_dir):
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        expire_batches,
    )

    base = tempfile.mkdtemp(prefix="hbi_zm_expire_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        half = F.col("doc_id") % 2
        docs.where(half == 0).write.mode("overwrite").parquet(f"{base}/in")
        docs.where(half == 1).write.mode("append").parquet(f"{base}/in")
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", "1").parquet(f"{base}/in"))
        q = zone_map_ingest_stream(
            stream, f"{base}/lay", f"{base}/zm", f"{base}/chk",
            stat_cols=("doc_id",), bloom_col="doc_id", bloom_capacity=_ZM_CAP)
        assert q.awaitTermination(300)
        zm = read_zone_map(spark, f"{base}/zm")
        batches = sorted(r["batch_id"] for r in
                         zm.select("batch_id").distinct().collect())
        assert len(batches) >= 2
        cutoff = batches[0]
        survivors_want = sorted(
            r["doc_id"] for r in
            read_pruned(spark, f"{base}/lay",
                        prune_files(zm.where(F.col("batch_id") > cutoff)))
            .select("doc_id").collect())
        n = expire_batches(spark, f"{base}/lay", f"{base}/zm", cutoff)
        assert n == 1
        zm2 = read_zone_map(spark, f"{base}/zm")
        assert sorted(r["batch_id"] for r in
                      zm2.select("batch_id").distinct().collect()) == batches[1:]
        # the zone map IS the catalog: surviving rows read exactly the
        # surviving docs; the expired batch dir is gone from disk
        got = sorted(r["doc_id"] for r in
                     read_pruned(spark, f"{base}/lay", prune_files(zm2))
                     .select("doc_id").collect())
        assert got == survivors_want
        assert not os.path.exists(f"{base}/lay/b{cutoff}")
        # idempotent: nothing left at or below the cutoff
        assert expire_batches(spark, f"{base}/lay", f"{base}/zm", cutoff) == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_batches(spark, sf_dir):
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        compact_batches,
    )

    base = tempfile.mkdtemp(prefix="hbi_zm_compact_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        third = F.col("doc_id") % 3
        docs.where(third == 0).write.mode("overwrite").parquet(f"{base}/in")
        docs.where(third == 1).write.mode("append").parquet(f"{base}/in")
        docs.where(third == 2).write.mode("append").parquet(f"{base}/in")
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", "1").parquet(f"{base}/in"))
        q = zone_map_ingest_stream(
            stream, f"{base}/lay", f"{base}/zm", f"{base}/chk",
            stat_cols=("doc_id",), bloom_col="doc_id", bloom_capacity=_ZM_CAP)
        assert q.awaitTermination(300)
        zm = read_zone_map(spark, f"{base}/zm")
        batches = sorted(r["batch_id"] for r in
                         zm.select("batch_id").distinct().collect())
        assert len(batches) >= 3
        all_before = sorted(
            r["doc_id"] for r in
            read_layout(spark, f"{base}/lay").select("doc_id").collect())
        n_files_before = len(prune_files(zm))
        cutoff = batches[1]  # merge the two oldest batches, keep the rest
        n = compact_batches(
            spark, f"{base}/lay", f"{base}/zm", cutoff,
            stat_cols=("doc_id",), bloom_col="doc_id",
            bloom_capacity=_ZM_CAP)
        assert n == 2
        zm2 = read_zone_map(spark, f"{base}/zm")
        # DATA parity: nothing lost, nothing duplicated
        all_after = sorted(
            r["doc_id"] for r in
            read_layout(spark, f"{base}/lay").select("doc_id").collect())
        assert all_after == all_before
        # fewer files; old dirs gone, compacted dir present
        assert len(prune_files(zm2)) < n_files_before
        assert os.path.isdir(f"{base}/lay/c{cutoff}")
        assert not os.path.exists(f"{base}/lay/b{batches[0]}")
        assert not os.path.exists(f"{base}/lay/b{batches[1]}")
        # MAP parity vs a scratch build over the compacted layout (pinned
        # capacity -> bloom bytes equal); batch_id keeps the max-guard rule
        want = build_zone_map(
            read_layout(spark, f"{base}/lay"), ("doc_id",),
            bloom_col="doc_id", bloom_capacity=_ZM_CAP)
        assert _zm_rows(zm2.drop("batch_id")) == _zm_rows(want)
        assert sorted(r["batch_id"] for r in
                      zm2.select("batch_id").distinct().collect()
                      ) == sorted({cutoff, *batches[2:]})
        # the compacted layout still serves point lookups via the map
        ids = [r["doc_id"] for r in docs.limit(3).collect()]
        got = read_pruned(
            spark, f"{base}/lay", prune_files(zm2, bloom_keys=ids)
        ).where(F.col("doc_id").isin(ids))
        assert got.count() == 3
        # same-boundary recompaction refuses (target dir exists)
        with pytest.raises(ValueError, match="already compacted"):
            compact_batches(spark, f"{base}/lay", f"{base}/zm", cutoff,
                            stat_cols=("doc_id",), bloom_col="doc_id",
                            bloom_capacity=_ZM_CAP)
        # compacting everything (incl. the earlier c-dir) into a later
        # boundary works and stays parity-clean
        top = batches[-1]
        assert compact_batches(
            spark, f"{base}/lay", f"{base}/zm", top,
            stat_cols=("doc_id",), bloom_col="doc_id",
            bloom_capacity=_ZM_CAP) == len({cutoff, *batches[2:]})
        zm3 = read_zone_map(spark, f"{base}/zm")
        want3 = build_zone_map(
            read_layout(spark, f"{base}/lay"), ("doc_id",),
            bloom_col="doc_id", bloom_capacity=_ZM_CAP)
        assert _zm_rows(zm3.drop("batch_id")) == _zm_rows(want3)
        assert sorted(
            r["doc_id"] for r in
            read_layout(spark, f"{base}/lay").select("doc_id").collect()
        ) == all_before
        # below-cutoff no-op
        assert compact_batches(spark, f"{base}/lay", f"{base}/zm", -1) == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_merge_into_layout(spark, sf_dir):
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        merge_into_layout,
        write_zone_map,
    )

    base = tempfile.mkdtemp(prefix="hbi_zm_merge_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text")
        (docs.repartitionByRange(8, "doc_id")
         .write.mode("overwrite").parquet(f"{base}/lay"))
        write_zone_map(
            build_zone_map(spark.read.parquet(f"{base}/lay"),
                           stat_cols=("doc_id",)),
            f"{base}/zm")
        mx = docs.agg(F.max("doc_id")).first()[0]
        lo, hi = mx // 4, mx // 2  # narrow key slab -> few files touched
        updates = docs.where(
            F.col("doc_id").between(lo, hi) & (F.col("doc_id") % 3 == 0)
        ).select("doc_id", F.concat(F.lit("UPD "), F.col("text")).alias("text"))
        inserts = spark.createDataFrame(
            [(mx + 10 + i, f"ins {i}") for i in range(5)],
            "doc_id long, text string")
        source = updates.unionByName(inserts)
        res = merge_into_layout(
            spark, f"{base}/lay", f"{base}/zm", source, "doc_id",
            stat_cols=("doc_id",))
        assert 0 < res["n_files_touched"] < res["n_files_total"]
        # MERGE semantics: updates replace, inserts append, rest untouched
        want = sorted(
            (r["doc_id"],
             ("UPD " + r["text"]) if (lo <= r["doc_id"] <= hi
                                      and r["doc_id"] % 3 == 0) else r["text"])
            for r in docs.collect())
        want += sorted((mx + 10 + i, f"ins {i}") for i in range(5))
        got = sorted((r["doc_id"], r["text"]) for r in
                     read_layout(spark, f"{base}/lay").collect())
        assert got == sorted(want)
        # live map == scratch build over the merged layout
        live = read_zone_map(spark, f"{base}/zm")
        scratch = build_zone_map(read_layout(spark, f"{base}/lay"),
                                 stat_cols=("doc_id",))
        key = lambda df: sorted(  # noqa: E731
            tuple(r) for r in df.select(
                "_file", "n_rows", "min_doc_id", "max_doc_id").collect())
        assert key(live) == key(scratch)
        # the map still serves exact pruned reads
        files = prune_files(live, "doc_id", lo, hi)
        got_rng = sorted(
            r["doc_id"] for r in
            read_pruned(spark, f"{base}/lay", files)
            .where(F.col("doc_id").between(lo, hi)).collect())
        assert got_rng == sorted(
            d for d, _ in want if lo <= d <= hi)
        # refusals: NULL and duplicate source keys
        with pytest.raises(ValueError, match="NULL source keys"):
            merge_into_layout(
                spark, f"{base}/lay", f"{base}/zm",
                spark.createDataFrame([(None, "x")], "doc_id long, text string"),
                "doc_id", stat_cols=("doc_id",))
        with pytest.raises(ValueError, match="duplicate source keys"):
            merge_into_layout(
                spark, f"{base}/lay", f"{base}/zm",
                spark.createDataFrame([(1, "x"), (1, "y")],
                                      "doc_id long, text string"),
                "doc_id", stat_cols=("doc_id",))
        # pure-insert merge (keys beyond every envelope): zero files touched
        far = spark.createDataFrame([(mx + 1000, "far")],
                                    "doc_id long, text string")
        res2 = merge_into_layout(
            spark, f"{base}/lay", f"{base}/zm", far, "doc_id",
            stat_cols=("doc_id",))
        assert res2["n_files_touched"] == 0
        assert read_layout(spark, f"{base}/lay").count() == len(want) + 1
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_delete_range_from_layout(spark, sf_dir):
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        delete_range_from_layout,
        write_zone_map,
    )

    base = tempfile.mkdtemp(prefix="hbi_zm_delete_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text")
        # plant NULL keys: they must SURVIVE any range delete
        docs = docs.withColumn(
            "doc_id", F.when(F.col("doc_id") % 41 == 0, None)
            .otherwise(F.col("doc_id")))
        (docs.repartitionByRange(8, "doc_id")
         .write.mode("overwrite").parquet(f"{base}/lay"))
        write_zone_map(
            build_zone_map(spark.read.parquet(f"{base}/lay"),
                           stat_cols=("doc_id",)),
            f"{base}/zm")
        mx = docs.agg(F.max("doc_id")).first()[0]
        lo, hi = mx // 8, 6 * mx // 8  # wide band -> interior files drop
        res = delete_range_from_layout(
            spark, f"{base}/lay", f"{base}/zm", "doc_id", lo, hi,
            stat_cols=("doc_id",))
        assert res["n_files_dropped"] > 0  # metadata-only drops happened
        assert res["n_files_dropped"] + res["n_files_rewritten"] \
            <= res["n_files_total"]
        # NB sorted() can't order None doc_ids against ints — sort by str
        want = sorted(
            ((r["doc_id"], r["text"]) for r in docs.collect()
             if r["doc_id"] is None or not (lo <= r["doc_id"] <= hi)),
            key=str)
        got = sorted(((r["doc_id"], r["text"]) for r in
                      read_layout(spark, f"{base}/lay").collect()), key=str)
        assert got == want
        # live map == scratch build over the post-delete layout
        live = read_zone_map(spark, f"{base}/zm")
        scratch = build_zone_map(read_layout(spark, f"{base}/lay"),
                                 stat_cols=("doc_id",))
        key = lambda df: sorted(  # noqa: E731
            tuple(r) for r in df.select(
                "_file", "n_rows", "min_doc_id", "max_doc_id",
                "nvals_doc_id").collect())
        assert key(live) == key(scratch)
        # one-sided delete: everything above a cutoff goes
        res2 = delete_range_from_layout(
            spark, f"{base}/lay", f"{base}/zm", "doc_id", lo=7 * mx // 8,
            stat_cols=("doc_id",))
        got2 = sorted(
            ((r["doc_id"], r["text"]) for r in
             read_layout(spark, f"{base}/lay").collect()), key=str)
        want2 = sorted(((d, t) for d, t in want
                        if d is None or d < 7 * mx // 8), key=str)
        assert got2 == want2
        # missing stat column refuses
        with pytest.raises(ValueError, match="lacks"):
            delete_range_from_layout(
                spark, f"{base}/lay", f"{base}/zm", "text", "a", "b")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_vacuum_layout(spark, sf_dir):
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        vacuum_layout,
        write_zone_map,
    )

    base = tempfile.mkdtemp(prefix="hbi_zm_vacuum_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text")
        docs.repartition(4).write.mode("overwrite").parquet(f"{base}/lay")
        write_zone_map(
            build_zone_map(spark.read.parquet(f"{base}/lay"),
                           stat_cols=("doc_id",)),
            f"{base}/zm")
        n_docs = docs.count()
        # simulate a crash: data written to a sub-dir, map never committed
        docs.limit(50).coalesce(1).write.parquet(f"{base}/lay/u99")
        assert read_layout(spark, f"{base}/lay").count() == n_docs + 50
        removed = vacuum_layout(spark, f"{base}/lay", f"{base}/zm")
        assert removed and all("u99" in p for p in removed)
        assert not os.path.exists(f"{base}/lay/u99")
        # the map's files are untouched; full scan agrees with the map again
        assert read_layout(spark, f"{base}/lay").count() == n_docs
        zm = read_zone_map(spark, f"{base}/zm")
        assert read_pruned(spark, f"{base}/lay",
                           prune_files(zm)).count() == n_docs
        # idempotent
        assert vacuum_layout(spark, f"{base}/lay", f"{base}/zm") == []
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_build_zone_map_refuses_derived_frames(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="file-backed"):
        build_zone_map(df, stat_cols=("k",))


# ---------------------------------------------------------------------------
# metadata-accelerated range counts
# ---------------------------------------------------------------------------

from hierarchical_bloom_filter_index_spark.operators.zonemap import (  # noqa: E402
    count_range,
)


def test_count_range_exact(spark, layout):
    path, df, zm = layout
    mn, mx = df.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    cases = [
        (mn + (mx - mn) // 8, mn + 7 * (mx - mn) // 8),  # wide: contained files
        (mn, mx),                                        # everything
        (mx + 1, None),                                  # empty
        (None, mn),                                      # one-sided
        (mn + (mx - mn) // 2, mn + (mx - mn) // 2),      # point range
    ]
    for lo, hi in cases:
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col("l_orderkey") >= lo)
        if hi is not None:
            pred = pred & (F.col("l_orderkey") <= hi)
        assert count_range(spark, path, zm, "l_orderkey", lo, hi) == \
            df.where(pred).count(), (lo, hi)


def test_count_range_with_nulls(spark, sf_dir):
    """NULL key rows must not be credited by the metadata path."""
    path = tempfile.mkdtemp(prefix="hbi_zm_null_")
    try:
        (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .withColumn("o_custkey", F.when(F.col("o_orderkey") % 3 == 0,
                                         F.col("o_custkey")))
         .repartitionByRange(4, "o_custkey")
         .write.mode("overwrite").parquet(path))
        df = spark.read.parquet(path)
        zm = build_zone_map(df, stat_cols=("o_custkey",))
        mn, mx = df.agg(F.min("o_custkey"), F.max("o_custkey")).first()
        got = count_range(spark, path, zm, "o_custkey", mn, mx)
        want = df.where(F.col("o_custkey").between(mn, mx)).count()
        assert got == want
        assert got < df.count()  # the NULLed rows are excluded
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_sum_range(spark):
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        sum_range,
        write_zone_map,
    )

    base = tempfile.mkdtemp(prefix="hbi_zm_sum_")
    try:
        df = spark.range(10_000).select(
            F.when(F.col("id") % 53 == 0, None)
            .otherwise(F.col("id")).alias("k"),
            F.when(F.col("id") % 29 == 0, None)
            .otherwise((F.col("id") % 97).cast("double")).alias("v"))
        (df.repartitionByRange(8, "k")
         .write.mode("overwrite").parquet(f"{base}/lay"))
        zm = build_zone_map(spark.read.parquet(f"{base}/lay"),
                            stat_cols=("k",), sum_cols=("v",))
        write_zone_map(zm, f"{base}/zm")
        zm = read_zone_map(spark, f"{base}/zm")

        def want(lo, hi):
            d = df
            if lo is not None:
                d = d.where(F.col("k") >= lo)
            if hi is not None:
                d = d.where(F.col("k") <= hi)
            r = d.agg(F.sum(F.col("v").cast("long"))).first()[0]
            return int(r or 0)

        for lo, hi in [(1000, 9000), (None, 4000), (7000, None),
                       (0, 10_000), (50_000, 60_000), (None, None)]:
            got = sum_range(spark, f"{base}/lay", zm, "k", "v", lo, hi)
            assert got == want(lo, hi), (lo, hi)
        with pytest.raises(ValueError, match="lacks"):
            sum_range(spark, f"{base}/lay", zm, "k", "missing", 0, 1)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_sum_range_metadata_credit(spark):
    # no NULL keys -> interior files of a clustered layout credit unopened
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        sum_range,
    )

    base = tempfile.mkdtemp(prefix="hbi_zm_sumc_")
    try:
        df = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        (df.repartitionByRange(8, "k")
         .write.mode("overwrite").parquet(f"{base}/lay"))
        zm = build_zone_map(spark.read.parquet(f"{base}/lay"),
                            stat_cols=("k",), sum_cols=("v",))
        contained = zm.where(
            (F.col("min_k") >= 500) & (F.col("max_k") <= 9500)).count()
        assert contained > 0
        got = sum_range(spark, f"{base}/lay", zm, "k", "v", 500, 9500)
        want = df.where(F.col("k").between(500, 9500)).agg(
            F.sum("v")).first()[0]
        assert got == int(want)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_batches_flat_root_safe(spark):
    """A batch-tagged map over files lying DIRECTLY in the layout root:
    compaction must delete only the doomed files, never rmtree the root
    (which holds the fresh c-dir)."""
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        compact_batches,
        write_zone_map,
    )

    base = tempfile.mkdtemp(prefix="hbi_zm_flatc_")
    try:
        df = spark.range(1000).select(F.col("id").alias("k"))
        df.repartition(4).write.mode("overwrite").parquet(f"{base}/lay")
        zm = build_zone_map(spark.read.parquet(f"{base}/lay"),
                            stat_cols=("k",)).withColumn(
            "batch_id", F.lit(0).cast("long"))
        write_zone_map(zm, f"{base}/zm")
        n = compact_batches(spark, f"{base}/lay", f"{base}/zm", 0,
                            stat_cols=("k",))
        assert n == 1
        assert os.path.isdir(f"{base}/lay/c0")
        got = sorted(r["k"] for r in
                     read_layout(spark, f"{base}/lay").collect())
        assert got == list(range(1000))
        zm2 = read_zone_map(spark, f"{base}/zm")
        assert zm2.count() == 1  # one compacted file
        assert zm2.agg(F.sum("n_rows")).first()[0] == 1000
    finally:
        shutil.rmtree(base, ignore_errors=True)
