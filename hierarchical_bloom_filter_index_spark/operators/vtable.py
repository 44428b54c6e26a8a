"""VERSIONED zone-mapped tables — snapshot isolation, time travel, and
snapshot expiry (the Iceberg/Delta table contract on plain parquet + the
engine's zone maps).

The mutable-layout ops (zonemap.merge_into_layout /
delete_range_from_layout) are DESTRUCTIVE: they delete replaced files, so
history is gone the moment a mutation commits.  A versioned table instead
treats data files as strictly IMMUTABLE and APPEND-ONLY, and makes the
zone map itself the versioned catalog:

    path/data/d{n}/...            data files written by version n (never
                                  rewritten, never deleted until expiry)
    path/versions/v{n}/           the FULL zone map of snapshot n
                                  (~1 tiny row per live file)

A snapshot is just the set of files its map references, so commits are
one tiny map write (data first, map second — a crash leaves unreferenced
files, never a map naming missing data: the same ordering discipline as
every maintenance surface here, and the exact mechanism of Iceberg's
snapshot manifests).  Reads pin a version and are immune to concurrent
commits; ``version=None`` reads the latest.  Time travel =
``read_table(version=k)``.  Retention = ``expire_snapshots``: drop old
version manifests, then delete every data file no SURVIVING version
references (the vacuum rule generalized across versions).

Single-writer contract (like every compaction here): concurrent commits
would race the version counter.  Engine parity: the global stream index
has the same delta-commit + time-travel + compaction-as-expiry shape
(streaming/incremental.read_global_stream_index); this module gives the
RELATIONAL layouts the same powers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .zonemap import (
    build_zone_map,
    envelope_touched_files,
    prune_files,
    read_pruned,
    write_zone_map,
)

__all__ = [
    "create_table",
    "delete_range",
    "expire_snapshots",
    "list_versions",
    "read_table",
    "read_table_range",
    "table_map",
    "upsert",
]


def _vdir(path: str, n: int) -> str:
    return f"{path}/versions/v{n:06d}"


def list_versions(path: str) -> list[int]:
    """COMMITTED versions only: a manifest dir counts iff its parquet
    ``_SUCCESS`` marker exists — a dir without one is a TORN commit (crash
    mid-write) and is invisible to readers (and replaced by the next
    commit)."""
    vd = f"{path}/versions"
    if not os.path.isdir(vd):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(vd)
        if d.startswith("v") and d[1:].isdigit()
        and os.path.exists(os.path.join(vd, d, "_SUCCESS")))


def _resolve(path: str, version: int | None) -> int:
    vs = list_versions(path)
    if not vs:
        raise ValueError(f"no versions at {path} — create_table first")
    if version is None:
        return vs[-1]
    if version not in vs:
        raise ValueError(
            f"version {version} not present at {path} (have {vs}) — "
            "expired or never committed")
    return version


def table_map(spark: SparkSession, path: str,
              version: int | None = None) -> DataFrame:
    """The zone map of a snapshot (~1 row per live file)."""
    return spark.read.parquet(_vdir(path, _resolve(path, version)))


def read_table(spark: SparkSession, path: str,
               version: int | None = None) -> DataFrame:
    """Every row of snapshot ``version`` (latest when None) — reads exactly
    the files that snapshot's map references, so concurrent later commits
    and unexpired garbage are invisible."""
    zm = table_map(spark, path, version)
    return read_pruned(spark, f"{path}/data", prune_files(zm))


def read_table_range(spark: SparkSession, path: str, col: str, lo, hi,
                     version: int | None = None) -> DataFrame:
    """Snapshot read with zone-map file skipping + the exact predicate."""
    zm = table_map(spark, path, version)
    out = read_pruned(spark, f"{path}/data", prune_files(zm, col, lo, hi))
    if lo is not None:
        out = out.where(F.col(col) >= F.lit(lo))
    if hi is not None:
        out = out.where(F.col(col) <= F.lit(hi))
    return out


def _commit(spark: SparkSession, path: str, n: int, zm: DataFrame) -> None:
    target = _vdir(path, n)
    if os.path.isdir(target):
        if os.path.exists(f"{target}/_SUCCESS"):
            raise ValueError(
                f"version {n} already committed at {path} — concurrent "
                "writer? (single-writer contract)")
        shutil.rmtree(target, ignore_errors=True)  # torn commit: replace
    write_zone_map(zm, target)


def create_table(
    df: DataFrame,
    path: str,
    stat_cols: tuple[str, ...],
    sum_cols: tuple[str, ...] = (),
    n_files: int = 8,
) -> int:
    """Snapshot 0: ``df`` written as ``n_files`` files range-clustered on
    the FIRST stat column, plus its map.  Returns the version (0)."""
    if list_versions(path):
        raise ValueError(f"{path} already holds a versioned table")
    spark = df.sparkSession
    (df.repartitionByRange(int(n_files), stat_cols[0])
     .write.mode("error").parquet(f"{path}/data/d0"))
    zm = build_zone_map(spark.read.parquet(f"{path}/data/d0"),
                        stat_cols=stat_cols, sum_cols=sum_cols)
    _commit(spark, path, 0, zm)
    return 0


def _meta_cols(zm: DataFrame) -> tuple[tuple[str, ...], tuple[str, ...]]:
    stat = tuple(c[4:] for c in zm.columns if c.startswith("min_"))
    sums = tuple(c[4:] for c in zm.columns if c.startswith("sum_"))
    return stat, sums


def upsert(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_col: str,
    target_files: int = 1,
) -> dict:
    """COPY-ON-WRITE MERGE as a NEW SNAPSHOT: rows of ``source`` replace
    same-key rows and insert where unmatched — but replaced files are only
    dropped from the new map, never from disk, so every older snapshot
    stays readable until expiry.  Envelope pruning bounds the rewrite to
    the touched files (the merge_into_layout discipline); NULL / duplicate
    source keys refuse.  Geometry (stat/sum columns) is taken from the
    CURRENT map, never from callers.  Returns ``{"version",
    "n_files_touched", "n_files_total"}``."""
    cur = _resolve(path, None)
    zm = table_map(spark, path, cur)
    stat_cols, sum_cols = _meta_cols(zm)
    skeys = source.where(F.col(key_col).isNotNull()).select(key_col)
    n_src = source.count()
    if skeys.count() != n_src:
        raise ValueError("upsert: NULL source keys are refused")
    sdist = skeys.distinct()
    if sdist.count() != n_src:
        raise ValueError("upsert: duplicate source keys are refused — "
                         "dedupe upstream, deterministically")
    touched = envelope_touched_files(zm, sdist, key_col)
    if touched:
        old = spark.read.parquet(*touched)
        new_data = old.join(sdist, key_col, "left_anti").unionByName(
            source.select(*old.columns))
    else:
        new_data = source
    nxt = cur + 1
    ddir = f"{path}/data/d{nxt}"
    new_data.coalesce(int(target_files)).write.mode("error").parquet(ddir)
    rows = build_zone_map(spark.read.parquet(ddir),
                          stat_cols=stat_cols, sum_cols=sum_cols)
    survivors = zm.where(~F.col("_file").isin(touched)) if touched else zm
    _commit(spark, path, nxt, survivors.unionByName(rows))
    return {"version": nxt, "n_files_touched": len(touched),
            "n_files_total": zm.count()}


def delete_range(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    target_files: int = 1,
) -> dict:
    """``DELETE WHERE lo <= col <= hi`` as a NEW SNAPSHOT — the
    delete_range_from_layout three-way split, non-destructively: contained
    NULL-free files just leave the new map (METADATA-ONLY, zero I/O — and
    still readable through older snapshots), boundary files are rewritten
    to the complement in a fresh d-dir.  Returns ``{"version",
    "n_files_dropped", "n_files_rewritten"}``."""
    cur = _resolve(path, None)
    zm = table_map(spark, path, cur)
    stat_cols, sum_cols = _meta_cols(zm)
    for need in (f"min_{col}", f"nvals_{col}"):
        if need not in zm.columns:
            raise ValueError(f"delete_range: map lacks {need}")
    keep = F.lit(True)
    contained = F.lit(True)
    if lo is not None:
        keep = keep & (F.col(f"max_{col}") >= F.lit(lo))
        contained = contained & (F.col(f"min_{col}") >= F.lit(lo))
    if hi is not None:
        keep = keep & (F.col(f"min_{col}") <= F.lit(hi))
        contained = contained & (F.col(f"max_{col}") <= F.lit(hi))
    contained = contained & (F.col(f"nvals_{col}") == F.col("n_rows"))
    rows = zm.select("_file", keep.alias("_touch"),
                     contained.alias("_drop")).collect()
    dropped = [r["_file"] for r in rows if r["_touch"] and r["_drop"]]
    boundary = [r["_file"] for r in rows if r["_touch"] and not r["_drop"]]
    nxt = cur + 1
    new_rows = None
    if boundary:
        surv = F.col(col).isNull()
        if lo is not None:
            surv = surv | (F.col(col) < F.lit(lo))
        if hi is not None:
            surv = surv | (F.col(col) > F.lit(hi))
        ddir = f"{path}/data/d{nxt}"
        (spark.read.parquet(*boundary).where(surv)
         .coalesce(int(target_files)).write.mode("error").parquet(ddir))
        new_rows = build_zone_map(spark.read.parquet(ddir),
                                  stat_cols=stat_cols, sum_cols=sum_cols)
    doomed = set(dropped) | set(boundary)
    survivors = zm.where(~F.col("_file").isin(list(doomed))) if doomed else zm
    _commit(spark, path, nxt,
            survivors.unionByName(new_rows) if new_rows is not None
            else survivors)
    return {"version": nxt, "n_files_dropped": len(dropped),
            "n_files_rewritten": len(boundary)}


def table_count_range(spark: SparkSession, path: str, col: str,
                      lo=None, hi=None, version: int | None = None) -> int:
    """EXACT range COUNT over a SNAPSHOT, mostly from metadata
    (zonemap.count_range against that version's map) — analytics through
    time travel without scanning history."""
    from .zonemap import count_range

    return count_range(spark, f"{path}/data",
                       table_map(spark, path, version), col, lo, hi)


def table_sum_range(spark: SparkSession, path: str, col: str, sum_col: str,
                    lo=None, hi=None, version: int | None = None) -> int:
    """EXACT range SUM over a SNAPSHOT from per-file sums
    (zonemap.sum_range; the table must have been created with the column
    in ``sum_cols``)."""
    from .zonemap import sum_range

    return sum_range(spark, f"{path}/data",
                     table_map(spark, path, version), col, sum_col, lo, hi)


def diff_versions(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    id_col: str,
    compare_cols: list[str],
    method: str = "exact",
) -> DataFrame:
    """WHAT CHANGED between two snapshots — ``snapshot.snapshot_diff``
    over two time-travel reads: (id, added/removed/changed).  The audit
    view a versioned table exists to answer ('what did that upsert/delete
    actually do'), and the incremental-processing worklist (re-index
    changed+added, take down removed) between any two committed states."""
    from .snapshot import snapshot_diff

    return snapshot_diff(
        read_table(spark, path, v_old), read_table(spark, path, v_new),
        id_col, compare_cols, method=method)


def expire_snapshots(spark: SparkSession, path: str,
                     keep_from_version: int) -> dict:
    """RETENTION: drop every snapshot manifest with version <
    ``keep_from_version``, then delete every data file no SURVIVING
    snapshot references (the vacuum rule across versions) and sweep
    emptied d-dirs.  Time travel to expired versions then refuses with
    the versions that remain.  Must not run concurrently with a writer.
    Returns ``{"n_versions_expired", "n_files_deleted"}``."""
    vs = list_versions(path)
    doomed_vs = [v for v in vs if v < keep_from_version]
    if not doomed_vs:
        return {"n_versions_expired": 0, "n_files_deleted": 0}
    if not [v for v in vs if v >= keep_from_version]:
        raise ValueError(
            f"expire_snapshots would drop EVERY version at {path} — "
            "keep at least the latest")
    norm = lambda f: os.path.abspath(  # noqa: E731
        f[5:] if f.startswith("file:") else f)
    referenced: set[str] = set()
    for v in vs:
        if v >= keep_from_version:
            for r in table_map(spark, path, v).select("_file").collect():
                referenced.add(norm(r["_file"]))
    # manifests first: a crash mid-way leaves extra data files (harmless,
    # re-expire later), never a manifest naming deleted data
    for v in doomed_vs:
        shutil.rmtree(_vdir(path, v), ignore_errors=True)
    n_deleted = 0
    droot = f"{path}/data"
    for dirpath, _dirs, files in os.walk(droot):
        for n in files:
            p = os.path.join(dirpath, n)
            if n.endswith(".parquet") and os.path.abspath(p) not in referenced:
                os.remove(p)
                n_deleted += 1
    for d in sorted(os.listdir(droot)):
        sub = os.path.join(droot, d)
        if os.path.isdir(sub) and not any(
                n.endswith(".parquet")
                for _, _, fs in os.walk(sub) for n in fs):
            shutil.rmtree(sub, ignore_errors=True)
    return {"n_versions_expired": len(doomed_vs),
            "n_files_deleted": n_deleted}
