"""Z-ORDER (Morton-curve) multi-column clustering — data skipping on ANY of
several columns from ONE layout.

A range-clustered layout (sampling.write_bucketed_layout, the zone-map range
fixtures) prunes perfectly on its ONE clustering column and not at all on any
other.  At 100 TB a table is queried through several columns — the lakehouse
answer (Delta/Iceberg OPTIMIZE ZORDER BY) is to sort the layout by the
interleaved bits of the columns' RANK buckets: a file then covers a small
contiguous stretch of the Z space-filling curve, which is a compact tile in
every dimension at once, so every clustered column gets a tight per-file
min/max envelope in the zone map and a range predicate on ANY of them prunes
files.  (d-dim intuition: a predicate selecting fraction s of one column's
space keeps ~s^(1/d)-curve-adjacent tiles instead of every file.)

Composition — this module writes NO new machinery for the hard parts:

* per-column rank buckets come from the same one-pass deterministic KLL
  boundaries that drive ``sampling.sketch_range_buckets`` (equi-DEPTH
  buckets, so skewed value distributions still spread over the curve);
* the bit interleave is a pure whole-stage-codegen expression (shift/AND/OR
  over the bucket ids — no UDF, no shuffle beyond the ONE range exchange
  that every clustered write pays);
* file skipping is ``zonemap.build_zone_map`` + ``prune_files_ranges`` —
  the layout just makes the envelopes tight on every clustered column.

Soundness is inherited: pruning only skips files whose envelope certifies
non-matching, and readers re-apply the exact predicate, so a pruned read
equals the full-scan filter byte-for-byte (the engine-wide prune-then-verify
discipline; tests/test_zorder.py proves parity and that BOTH columns prune).

Reference parity: the reference's hierarchy prunes one token axis
(query/BlockSearch.java descend-or-skip); the Z curve is how the same
skip decision is bought on several value axes of a relational layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .sampling import kll_column_boundaries
from .zonemap import (
    build_zone_map,
    prune_files_ranges,
    read_pruned,
    read_zone_map,
    write_zone_map,
)

_Z_SEED = 43


def bucket_expr(col: str, boundaries: list[float]) -> Column:
    """Equi-depth bucket id of ``col`` against sorted ``boundaries`` — a sum
    of codegen comparisons (the sketch_range_buckets assignment expression);
    NULLs land in bucket 0 and are closed out by the exact predicate."""
    expr = F.lit(0).cast("long")
    for b in boundaries:
        expr = expr + F.when(F.col(col) >= F.lit(b), 1).otherwise(0)
    return expr.cast("long")


def interleave_expr(bucket_cols: list[Column], bits_per_col: int) -> Column:
    """Morton interleave of ``d`` bucket ids, ``bits_per_col`` bits each:
    bit j of column i lands at position ``j*d + i`` of the Z value (low
    bits vary fastest, so nearby Z values are nearby in EVERY dimension).
    Pure shift/AND arithmetic — whole-stage codegen, no UDF."""
    d = len(bucket_cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(bucket_cols):
        for j in range(bits_per_col):
            z = z + F.shiftleft(
                F.shiftright(c, j).bitwiseAND(F.lit(1)), j * d + i
            )
    return z


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 6,
    k: int = 200,
    seed: int = _Z_SEED,
) -> tuple[Column, dict[str, list[float]]]:
    """(z column, per-column boundaries) for ``df``: each column is ranked
    into ``2**bits_per_col`` equi-depth buckets by its deterministic KLL
    boundaries, then the bucket ids are bit-interleaved.  One KLL pass per
    column; the z expression itself is shuffle-free."""
    if len(cols) < 2:
        raise ValueError("zorder_value wants >= 2 columns — use "
                         "sampling.write_bucketed_layout for one")
    n_buckets = 1 << bits_per_col
    bnds = {c: kll_column_boundaries(df, c, n_buckets, k=k, seed=seed)
            for c in cols}
    z = interleave_expr([bucket_expr(c, bnds[c]) for c in cols], bits_per_col)
    return z, bnds


def write_zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    path: str,
    bits_per_col: int = 6,
    k: int = 200,
    seed: int = _Z_SEED,
) -> dict[str, list[float]]:
    """Persist ``df`` Z-ordered on ``cols``: ``path/data`` holds ~``n_files``
    parquet files, each covering a contiguous Z range (ONE range exchange —
    ``repartitionByRange`` on the z value — plus an in-partition sort to
    tighten parquet row-group stats too); ``path/zonemap`` holds one
    envelope row per file over every clustered column; ``path/meta`` pins
    (cols, bits, boundaries).  Returns the boundaries.

    Scale shape: the cost over a plain write is one KLL profile pass per
    column (tiny blob collect) + the one range shuffle every clustered
    write pays.  Appending: z-order the new batch with the SAME persisted
    boundaries and ``zonemap.append_zone_map`` its files' rows — files are
    immutable, the curve assignment is a pure function of row values."""
    z, bnds = zorder_value(df, cols, bits_per_col, k=k, seed=seed)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("error")
        .parquet(f"{path}/data")
    )
    spark = df.sparkSession
    spark.createDataFrame(
        [(c, int(bits_per_col), [float(b) for b in bnds[c]]) for c in cols],
        "col string, bits int, boundaries array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    zm = build_zone_map(spark.read.parquet(f"{path}/data"),
                        stat_cols=tuple(cols))
    write_zone_map(zm, f"{path}/zonemap")
    return bnds


def append_zorder_layout(
    df: DataFrame, path: str, n_files: int = 1,
    batch_id: int | None = None,
) -> dict[str, list[float]]:
    """APPEND a batch to a Z-ordered layout without rebuilding: the batch is
    curve-assigned with the layout's PERSISTED boundaries (readers never
    take geometry from callers — the engine-wide meta-pinning discipline),
    written as ``n_files`` new files under ``path/data``, and the zone map
    grows by exactly the new files' envelope rows
    (``zonemap.append_zone_map`` — files are immutable).  Drifted value
    distributions only LOOSEN pruning (new data clusters by the old
    boundaries' buckets), never correctness; re-write the layout when drift
    makes envelopes useless.  Returns the pinned boundaries."""
    spark = df.sparkSession
    meta = spark.read.parquet(f"{path}/meta").collect()
    cols = [r["col"] for r in meta]
    bits = int(meta[0]["bits"])
    bnds = {r["col"]: [float(b) for b in r["boundaries"]] for r in meta}
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"append batch lacks clustered columns {missing}")
    old_files = set(spark.read.parquet(f"{path}/data").inputFiles())
    z = interleave_expr([bucket_expr(c, bnds[c]) for c in cols], bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(int(n_files), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("append")
        .parquet(f"{path}/data")
    )
    new_files = [f for f in spark.read.parquet(f"{path}/data").inputFiles()
                 if f not in old_files]
    rows = build_zone_map(spark.read.parquet(*new_files),
                          stat_cols=tuple(cols))
    if batch_id is not None:
        rows = rows.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
    from .zonemap import append_zone_map, read_zone_map as _rzm

    merged = append_zone_map(_rzm(spark, f"{path}/zonemap"), rows)
    merged = merged.localCheckpoint()  # the overwrite deletes its own input
    write_zone_map(merged, f"{path}/zonemap")
    return bnds


def zorder_ingest_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    n_files: int = 1,
):
    """STREAMING ingest into an EXISTING Z-ordered layout: each micro-batch
    is curve-assigned with the persisted boundaries and appended
    (``append_zorder_layout``), its zone-map rows tagged ``batch_id``.

    Replay discipline (foreachBatch is at-least-once): the guard probes the
    ZONE MAP for the batch_id before appending — the map overwrite is the
    append's LAST step, so a redelivered committed batch is skipped.  A
    crash BETWEEN the data append and the map commit leaves the batch's
    files on disk but unmapped: the replay re-appends cleanly (the diff
    against pre-append files never maps the orphans), map-driven readers
    (``read_zorder_pruned``) stay exact throughout, and
    ``zonemap.vacuum_layout(path + '/data', path + '/zonemap')`` reclaims
    the orphans and restores full-recursive-scan parity.  Same
    no-concurrent-writers contract as every maintenance surface here.
    Returns the started query (availableNow; await + stop is the
    caller's job)."""
    from .zonemap import read_zone_map as _rzm

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        zm = _rzm(spark, f"{path}/zonemap")
        if "batch_id" in zm.columns and (
                zm.filter(F.col("batch_id") == batch_id).limit(1).count() > 0):
            return
        append_zorder_layout(batch_df, path, n_files=n_files,
                             batch_id=batch_id)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def prune_zorder_files(
    spark: SparkSession, path: str, ranges: dict
) -> tuple[list[str], int]:
    """(kept file names, total files) for a conjunction of closed ranges
    ``col -> (lo, hi)`` over a Z-ordered layout — a metadata decision on the
    persisted zone map (~1 row per file)."""
    zm = read_zone_map(spark, f"{path}/zonemap")
    return prune_files_ranges(zm, ranges), zm.count()


def read_zorder_pruned(spark: SparkSession, path: str, ranges: dict) -> DataFrame:
    """Rows of a Z-ordered layout matching ``lo <= col <= hi`` for EVERY
    entry of ``ranges`` — files skipped via the zone map, the exact
    predicates re-applied (pruning only prunes; byte-equal to a full-scan
    filter)."""
    files, _ = prune_zorder_files(spark, path, ranges)
    out = read_pruned(spark, f"{path}/data", files)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            out = out.where(F.col(col) >= F.lit(lo))
        if hi is not None:
            out = out.where(F.col(col) <= F.lit(hi))
    return out
