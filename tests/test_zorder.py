"""Z-order multi-column clustering (operators/zorder.py): interleave
correctness, pruned-read parity with the full scan, and the point of the
whole exercise — range predicates on EITHER clustered column (and their
conjunction) actually skip files of the same single layout."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.zorder import (
    interleave_expr,
    prune_zorder_files,
    read_zorder_pruned,
    write_zorder_layout,
    zorder_value,
)

N = 40_000
N_FILES = 32


def _source(spark):
    # two pseudo-independent uniform columns; a third payload column rides
    return spark.range(N).select(
        (F.col("id") % 997).alias("x"),
        ((F.col("id") * 7919 + 13) % 1009).alias("y"),
        F.col("id").alias("payload"),
    )


@pytest.fixture(scope="module")
def layout(spark):
    base = tempfile.mkdtemp(prefix="hbi_zorder_")
    path = f"{base}/lay"
    bnds = write_zorder_layout(_source(spark), ["x", "y"], N_FILES, path,
                               bits_per_col=5)
    yield path, bnds
    shutil.rmtree(base, ignore_errors=True)


def _morton(bx: int, by: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((bx >> j) & 1) << (2 * j)
        z |= ((by >> j) & 1) << (2 * j + 1)
    return z


def test_interleave_matches_python(spark):
    rows = [(bx, by) for bx in (0, 1, 5, 17, 31) for by in (0, 2, 9, 30, 31)]
    df = spark.createDataFrame(rows, "bx long, by long")
    got = df.select(
        "bx", "by",
        interleave_expr([F.col("bx"), F.col("by")], 5).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == _morton(r["bx"], r["by"], 5), (r["bx"], r["by"])


def test_zorder_value_refuses_single_column(spark):
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_value(_source(spark), ["x"])


def _full_filter(spark, ranges):
    df = _source(spark)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.where(F.col(col) >= lo)
        if hi is not None:
            df = df.where(F.col(col) <= hi)
    return df


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.select("x", "y", "payload").collect())


@pytest.mark.parametrize("ranges", [
    {"x": (200, 400)},
    {"y": (100, 350)},
    {"x": (200, 500), "y": (300, 700)},
    {"x": (None, 120)},          # one-sided
    {"y": (990, None)},
    {"x": (5000, 6000)},         # empty: past the domain
])
def test_pruned_read_equals_full_scan(spark, layout, ranges):
    path, _ = layout
    got = _sorted_rows(read_zorder_pruned(spark, path, ranges))
    want = _sorted_rows(_full_filter(spark, ranges))
    assert got == want


def test_both_columns_prune_and_conjunction_tightens(spark, layout):
    path, _ = layout
    fx, total = prune_zorder_files(spark, path, {"x": (400, 520)})
    fy, _ = prune_zorder_files(spark, path, {"y": (400, 520)})
    both, _ = prune_zorder_files(spark, path,
                                 {"x": (400, 520), "y": (400, 520)})
    assert total >= N_FILES // 2  # the range exchange produced a real layout
    # EACH single-column eighth-ish range must skip files on the shared
    # layout — the property a 1-D clustering cannot give the second column
    assert 0 < len(fx) < total
    assert 0 < len(fy) < total
    assert len(both) <= min(len(fx), len(fy))
    assert set(both) <= set(fx) and set(both) <= set(fy)


def test_null_values_stay_sound(spark, layout):
    # NULLs bucket to 0 wherever they land; the exact predicate excludes
    # them, so parity holds on a layout containing NULL rows
    base = tempfile.mkdtemp(prefix="hbi_zorder_null_")
    try:
        df = _source(spark).withColumn(
            "y", F.when(F.col("payload") % 37 == 0, None).otherwise(F.col("y")))
        write_zorder_layout(df, ["x", "y"], 8, f"{base}/lay", bits_per_col=4)
        ranges = {"y": (100, 600)}
        got = _sorted_rows(read_zorder_pruned(spark, f"{base}/lay", ranges))
        want = sorted(
            tuple(r) for r in
            df.where(F.col("y").between(100, 600))
            .select("x", "y", "payload").collect())
        assert got == want
        assert all(r[1] is not None for r in got)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_append_layout(spark):
    from hierarchical_bloom_filter_index_spark.operators.zorder import (
        append_zorder_layout,
    )

    base = tempfile.mkdtemp(prefix="hbi_zorder_append_")
    try:
        src = _source(spark)
        first = src.where(F.col("payload") % 2 == 0)
        second = src.where(F.col("payload") % 2 == 1)
        bnds = write_zorder_layout(first, ["x", "y"], 8, f"{base}/lay",
                                   bits_per_col=4)
        got_bnds = append_zorder_layout(second, f"{base}/lay", n_files=2)
        assert got_bnds == bnds  # geometry pinned by meta, not recomputed
        # parity over the full (appended) content on both columns
        for ranges in ({"x": (200, 500)}, {"y": (100, 400)},
                       {"x": (100, 800), "y": (200, 600)}):
            got = _sorted_rows(read_zorder_pruned(spark, f"{base}/lay", ranges))
            want = _sorted_rows(_full_filter(spark, ranges))
            assert got == want
        # the map grew by exactly the appended files
        files, total = prune_zorder_files(spark, f"{base}/lay", {})
        assert total == len(files)
        assert total == len(
            spark.read.parquet(f"{base}/lay/data").inputFiles())
        # appending a batch missing a clustered column refuses
        with pytest.raises(ValueError, match="lacks clustered columns"):
            append_zorder_layout(second.drop("y"), f"{base}/lay")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ingest_stream(spark):
    from hierarchical_bloom_filter_index_spark.operators.zorder import (
        zorder_ingest_stream,
    )
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        read_zone_map,
    )

    base = tempfile.mkdtemp(prefix="hbi_zorder_stream_")
    try:
        src = _source(spark)
        third = F.col("payload") % 3
        write_zorder_layout(src.where(third == 0), ["x", "y"], 8,
                            f"{base}/lay", bits_per_col=4)
        src.where(third == 1).write.mode("overwrite").parquet(f"{base}/in")
        src.where(third == 2).write.mode("append").parquet(f"{base}/in")
        schema = spark.read.parquet(f"{base}/in").schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(f"{base}/in"))
        q = zorder_ingest_stream(stream, f"{base}/lay", f"{base}/chk",
                                 n_files=2)
        assert q.awaitTermination(300)
        zm = read_zone_map(spark, f"{base}/lay/zonemap")
        assert zm.where(F.col("batch_id").isNotNull()).select(
            "batch_id").distinct().count() >= 2
        # pruned reads over the streamed layout == full filters
        for ranges in ({"x": (300, 600)}, {"y": (100, 500)}):
            got = _sorted_rows(read_zorder_pruned(spark, f"{base}/lay", ranges))
            want = _sorted_rows(_full_filter(spark, ranges))
            assert got == want
        # replay drill: a fresh checkpoint redelivers every batch; the map
        # guard skips them all, leaving map + data byte-identical
        rows_before = sorted(map(tuple, zm.drop("batch_id").collect()))
        n_before = spark.read.parquet(f"{base}/lay/data").count()
        stream2 = (spark.readStream.schema(schema)
                   .option("maxFilesPerTrigger", "1").parquet(f"{base}/in"))
        q2 = zorder_ingest_stream(stream2, f"{base}/lay", f"{base}/chk2",
                                  n_files=2)
        assert q2.awaitTermination(300)
        zm2 = read_zone_map(spark, f"{base}/lay/zonemap")
        rows_after = sorted(map(tuple, zm2.drop("batch_id").collect()))
        assert rows_after == rows_before
        assert spark.read.parquet(f"{base}/lay/data").count() == n_before
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_boundaries_deterministic(spark, layout):
    path, bnds = layout
    _, again = zorder_value(_source(spark), ["x", "y"], bits_per_col=5)
    assert bnds == again


def test_three_column_curve(spark):
    """d=3: the interleave/boundary machinery is dimension-generic — every
    clustered column of a single 3-col layout prunes files, parity holds."""
    from hierarchical_bloom_filter_index_spark.operators.zorder import (
        interleave_expr as _ix,
    )

    # interleave correctness at d=3 vs python
    def morton3(b, bits):
        z = 0
        for j in range(bits):
            for i in range(3):
                z |= ((b[i] >> j) & 1) << (3 * j + i)
        return z

    rows = [(a, b, c) for a in (0, 3, 7) for b in (1, 5, 6) for c in (0, 2, 7)]
    df3 = spark.createDataFrame(rows, "ba long, bb long, bc long")
    for r in df3.select("ba", "bb", "bc", _ix(
            [F.col("ba"), F.col("bb"), F.col("bc")], 3).alias("z")).collect():
        assert r["z"] == morton3((r["ba"], r["bb"], r["bc"]), 3)

    base = tempfile.mkdtemp(prefix="hbi_zorder3_")
    try:
        src = spark.range(60_000).select(
            (F.col("id") % 499).alias("x"),
            ((F.col("id") * 7919 + 13) % 503).alias("y"),
            ((F.col("id") * 104729 + 7) % 509).alias("w"),
            F.col("id").alias("payload"))
        write_zorder_layout(src, ["x", "y", "w"], 64, f"{base}/lay",
                            bits_per_col=4)
        for col in ("x", "y", "w"):
            files, total = prune_zorder_files(
                spark, f"{base}/lay", {col: (100, 160)})
            assert 0 < len(files) < total, col
            got = sorted(
                tuple(r) for r in read_zorder_pruned(
                    spark, f"{base}/lay", {col: (100, 160)})
                .select("x", "y", "w", "payload").collect())
            want = sorted(
                tuple(r) for r in src.where(F.col(col).between(100, 160))
                .select("x", "y", "w", "payload").collect())
            assert got == want, col
    finally:
        shutil.rmtree(base, ignore_errors=True)
