"""One-pass relational TABLE PROFILING from mergeable sketch states.

The north-star shape end to end: ONE scan of the table computes, per
profiled column, exact scalars (count / nulls / min / max) plus serialized
sketch partials (HLL distinct, Misra-Gries top values, KLL quantiles) per
Arrow batch; a two-phase treeAggregate-style merge (tiny partial table —
one row per (input partition batch, column) — grouped per column) folds the
partials with the library's order-free merge kernels; a single readout pass
reports the profile. At 100 TB this is the difference between one scan and
one scan PER STATISTIC — and every estimate degrades gracefully:

* ``n_distinct`` is EXACT while the merged HLL stays sparse (union nnz <=
  2^p/8 — the canonical sparse-exact representation), the published
  +-1.04/sqrt(2^p) envelope beyond;
* ``top_value``/``top_count`` are EXACT whenever ``mg_resid == 0`` (no MG
  decrement ever happened: every batch tracked all its values), and the
  residual is REPORTED so the caller can see the certificate, never guess;
* quantiles carry the KLL rank bound.

Columns must be integral-valued (int types, or floats that happen to be
integers — Spark hands nullable int columns to Arrow as float64+NaN).
Hash or cast strings/doubles upstream; fractional values refuse loudly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_PARTIAL_SCHEMA = (
    "col_name string, n long, n_null long, mn long, mx long, "
    "hll binary, mg binary, kll binary"
)

PROFILE_SCHEMA = (
    "col_name string, n long, n_null long, min long, max long, "
    "n_distinct long, top_value long, top_count long, mg_resid long, "
    "p25 double, p50 double, p75 double"
)


def _integral_values(s: pd.Series, col: str) -> tuple[np.ndarray, int]:
    """Non-null values of a batch column as int64 (+ null count). Accepts
    float representations of integers (Arrow's nullable-int transport);
    refuses genuinely fractional values instead of silently truncating."""
    mask = s.isna()
    n_null = int(mask.sum())
    v = s[~mask].to_numpy()
    if len(v) == 0:
        return np.empty(0, dtype=np.int64), n_null
    if not np.issubdtype(v.dtype, np.integer):
        vf = v.astype(np.float64)
        if not np.all(vf == np.floor(vf)):
            raise ValueError(
                f"profile_columns: column {col!r} has fractional values — "
                "profile integral columns only (hash/cast upstream)"
            )
        v = vf
    return v.astype(np.int64), n_null


def _partials_fn(cols: list[str], hll_p: int, mg_k: int, kll_k: int, seed: int,
                 group_col: str | None = None):
    from ..sketches import hll as hllk
    from ..sketches import kll as kllk
    from ..sketches import spacesaving as mgk

    def col_rows(pdf: pd.DataFrame, prefix: tuple) -> list[tuple]:
        rows = []
        for c in cols:
            v, n_null = _integral_values(pdf[c], c)
            if len(v):
                rows.append(prefix + (
                    c, len(pdf), n_null, int(v.min()), int(v.max()),
                    hllk.leaf_window_blobs(v, len(v), hll_p, seed)[0],
                    mgk.leaf_window_blobs(v, len(v), mg_k)[0],
                    kllk.leaf_window_blobs(
                        v.astype(np.float64), len(v), kll_k, seed)[0],
                ))
            else:  # all-null batch: scalars only, no sketch partials
                rows.append(prefix + (c, len(pdf), n_null,
                                      None, None, None, None, None))
        return rows

    stat_cols = ["col_name", "n", "n_null", "mn", "mx", "hll", "mg", "kll"]

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if group_col is None:
                rows, columns = col_rows(pdf, ()), stat_cols
            else:
                rows, columns = [], ["grp"] + stat_cols
                for gval, gpdf in pdf.groupby(group_col, dropna=False, sort=True):
                    g = None if pd.isna(gval) else str(gval)
                    rows.extend(col_rows(gpdf, (g,)))
            yield pd.DataFrame(rows, columns=columns).astype(
                {"mn": "Int64", "mx": "Int64"})

    return part


def _readout_fn(hll_p: int, mg_k: int, key_cols: tuple = ("col_name",)):
    from ..sketches import hll as hllk
    from ..sketches import kll as kllk
    from ..sketches import spacesaving as mgk

    def read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                prefix = tuple(getattr(r, k) for k in key_cols)
                hlls = [bytes(b) for b in r.hlls]
                if not hlls:  # column entirely null
                    rows.append(prefix + (r.n, r.n_null, r.mn, r.mx,
                                          0, None, None, 0, None, None, None))
                    continue
                merged_h = hllk.merge_blob_groups(
                    hlls, np.asarray([len(hlls)], dtype=np.int64), hll_p)
                n_distinct = int(round(float(
                    hllk.estimate_blobs(merged_h, hll_p)[0])))
                merged_m = mgk.merge_blob_groups(
                    [bytes(b) for b in r.mgs],
                    np.asarray([len(r.mgs)], dtype=np.int64), mg_k)
                keys, cnts, _n, resid = mgk.tracked_blobs(merged_m)[0]
                if len(keys):
                    top = int(np.lexsort((keys, -cnts))[0])
                    top_value, top_count = int(keys[top]), int(cnts[top])
                else:
                    top_value = top_count = None
                merged_k = kllk.merge_blob_groups(
                    [bytes(b) for b in r.klls],
                    np.asarray([len(r.klls)], dtype=np.int64))
                p25, p50, p75 = kllk.quantile_blobs(
                    merged_k, [0.25, 0.5, 0.75])[0]
                rows.append(prefix + (r.n, r.n_null, r.mn, r.mx,
                                      n_distinct, top_value, top_count, int(resid),
                                      float(p25), float(p50), float(p75)))
            yield pd.DataFrame(rows, columns=list(key_cols) + [
                "n", "n_null", "min", "max", "n_distinct",
                "top_value", "top_count", "mg_resid", "p25", "p50", "p75",
            ]).astype({"top_value": "Int64", "top_count": "Int64",
                       "min": "Int64", "max": "Int64"})

    return read


def profile_columns(df: DataFrame, cols: list[str], hll_p: int = 12,
                    mg_k: int = 64, kll_k: int = 200, seed: int = 0) -> DataFrame:
    """Profile ``cols`` of ``df`` in ONE data scan: per column —
    (col_name, n, n_null, min, max, n_distinct, top_value, top_count,
    mg_resid, p25, p50, p75).

    Phase 1 maps each Arrow batch to one partial row per column (exact
    scalars + HLL/MG/KLL blobs); phase 2 groups the tiny partial table per
    column — scalars fold in the JVM (null-safe min/max/sum), sketch blobs
    in one Arrow readout via the library's order-free merge kernels. Exactly
    the mergeable-UDAF contract the sketch kernels are built for, applied to
    an arbitrary relational table rather than the token corpus.

    Exactness certificates (see module docstring): n_distinct exact while
    the merged HLL is sparse; top_value/top_count exact iff mg_resid == 0
    (reported, so the caller never guesses); quantiles carry the KLL bound.
    """
    return fold_profile_partials(
        column_partials(df, cols, hll_p, mg_k, kll_k, seed), hll_p, mg_k)


def column_partials(df: DataFrame, cols: list[str], hll_p: int = 12,
                    mg_k: int = 64, kll_k: int = 200, seed: int = 0,
                    group_col: str | None = None) -> DataFrame:
    """Phase 1 alone: one partial row per (Arrow batch, column) — exact
    scalars + HLL/MG/KLL blobs. This is the MERGEABLE STATE: any partition
    of the input into batches yields partials that fold to the same profile
    (bit-exact for the scalars and HLL; MG/KLL within their bounds, exact
    in the exact regime), which is what the incremental/streaming profile
    maintenance persists."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing}")
    sel = list(cols) + ([group_col] if group_col else [])
    schema = ("grp string, " if group_col else "") + _PARTIAL_SCHEMA
    return df.select(*sel).mapInPandas(
        _partials_fn(list(cols), hll_p, mg_k, kll_k, seed, group_col),
        schema=schema,
    )


def fold_profile_partials(partials: DataFrame, hll_p: int = 12,
                          mg_k: int = 64,
                          key_cols: tuple = ("col_name",)) -> DataFrame:
    """Phase 2 alone: fold a partial table (any number of rows per column,
    from any mix of scans/increments) into the profile — scalars in the JVM
    (null-safe min/max/sum), sketch blobs in one Arrow readout via the
    order-free merge kernels. ``key_cols`` is ("grp", "col_name") for the
    grouped form."""
    folded = partials.groupBy(*key_cols).agg(
        F.sum("n").alias("n"),
        F.sum("n_null").alias("n_null"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.collect_list("hll").alias("hlls"),   # collect_list drops nulls:
        F.collect_list("mg").alias("mgs"),     # all-null batches contribute
        F.collect_list("kll").alias("klls"),   # scalars only
    )
    schema = ("grp string, " if "grp" in key_cols else "") + PROFILE_SCHEMA
    return folded.mapInPandas(_readout_fn(hll_p, mg_k, key_cols), schema=schema)


def grouped_profile_columns(df: DataFrame, group_col: str, cols: list[str],
                            hll_p: int = 12, mg_k: int = 64, kll_k: int = 200,
                            seed: int = 0) -> DataFrame:
    """Per-GROUP column profiles in the same one scan: (grp, col_name, ...
    the profile_columns outputs) for every value of ``group_col`` (cast to
    string; null group kept as a null grp). Partial rows are per (Arrow
    batch, group, column), so the fold stays a tiny-table groupBy — the
    per-source data-health dashboard shape at 100 TB (one scan, one small
    shuffle, every sketch certificate intact per group)."""
    if group_col not in df.columns:
        raise ValueError(f"grouped_profile_columns: unknown group {group_col!r}")
    return fold_profile_partials(
        column_partials(df, cols, hll_p, mg_k, kll_k, seed, group_col=group_col),
        hll_p, mg_k, key_cols=("grp", "col_name"))


# ---------------------------------------------------------------------------
# Persisted profile state + incremental / streaming maintenance: the partial
# table IS the state (one tiny row per (increment batch, column)), appended
# under the shared replay guard and folded on read — the same delta-commit
# discipline as the gram-df index, with params pinned in meta so readers
# never take geometry from callers.
# ---------------------------------------------------------------------------

_BASE_BATCH_ID = -1  # stream batch ids start at 0; the base write must not collide


def _profile_meta(spark, path: str):
    r = spark.read.parquet(f"{path}/meta").first()
    return (r["cols"].split(","), int(r["hll_p"]), int(r["mg_k"]),
            int(r["kll_k"]), int(r["seed"]))


def write_profile_state(df: DataFrame, cols: list[str], path: str,
                        hll_p: int = 12, mg_k: int = 64, kll_k: int = 200,
                        seed: int = 0) -> None:
    """Persist the mergeable profile state for ``df``: ``path/partials``
    holds the phase-1 partial rows (batch_id = -1), ``path/meta`` pins
    (cols, hll_p, mg_k, kll_k, seed) — increments MUST reuse them or the
    merges are meaningless, so readers take params from meta, never from
    callers (the minhash-index discipline)."""
    spark = df.sparkSession
    (column_partials(df, cols, hll_p, mg_k, kll_k, seed)
     .withColumn("batch_id", F.lit(_BASE_BATCH_ID).cast("long"))
     .write.mode("error").parquet(f"{path}/partials"))
    spark.createDataFrame(
        [(",".join(cols), int(hll_p), int(mg_k), int(kll_k), int(seed))],
        "cols string, hll_p int, mg_k int, kll_k int, seed int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def append_profile_increment(new_df: DataFrame, path: str, batch_id: int) -> None:
    """Fold a new data batch into the persisted profile: compute its partial
    rows (params from meta) and append them under the shared replay guard
    (streaming/incremental.replay_guarded_append — foreachBatch is
    at-least-once; a redelivered batch_id is a no-op)."""
    from ..streaming.incremental import replay_guarded_append

    cols, hll_p, mg_k, kll_k, seed = _profile_meta(new_df.sparkSession, path)
    replay_guarded_append(
        f"{path}/partials", new_df, batch_id,
        lambda b: column_partials(b, cols, hll_p, mg_k, kll_k, seed),
    )


def read_profile(spark, path: str) -> DataFrame:
    """The profile of everything folded into the state so far — identical
    to ``profile_columns`` over the concatenated data for every column in
    the exact regime (scalars and HLL distinct are bit-exact under ANY
    batching — canonical content-pure representations; MG exact while no
    partial ever pruned; KLL quantile estimates are bound-preserving but
    batching-dependent, so parity gates must project them out)."""
    cols, hll_p, mg_k, _kll_k, _seed = _profile_meta(spark, path)
    return fold_profile_partials(
        spark.read.parquet(f"{path}/partials").drop("batch_id"), hll_p, mg_k)


def compact_profile_state(spark, path: str) -> int:
    """Fold the accumulated partial rows into ONE row per column (blobs
    merged with the same order-free kernels the readout uses) and rewrite
    ``path/partials``; returns the compacted row count. The compacted rows
    keep batch_id = max(applied) so the replay guard still recognizes the
    one batch at-least-once delivery can redeliver (the LAST uncommitted
    one — checkpoint commits are monotone; like every compactor here, this
    must not run concurrently with an active stream). Readouts after
    compaction are byte-identical in the exact regime and bound-preserving
    beyond (MG sum-then-prune / KLL merges lose nothing certifiable)."""
    from ..sketches import hll as hllk
    from ..sketches import kll as kllk
    from ..sketches import spacesaving as mgk

    cols, hll_p, mg_k, _kll_k, _seed = _profile_meta(spark, path)
    pdf = spark.read.parquet(f"{path}/partials").toPandas()
    if len(pdf) == 0:
        return 0
    rows = []
    for c, g in pdf.groupby("col_name", sort=True):
        def _merge(mod, blobs, *args):
            blobs = [bytes(b) for b in blobs if b is not None]
            if not blobs:
                return None
            return mod.merge_blob_groups(
                blobs, np.asarray([len(blobs)], dtype=np.int64), *args)[0]
        mn = g["mn"].dropna()
        mx = g["mx"].dropna()
        rows.append((
            c, int(g["n"].sum()), int(g["n_null"].sum()),
            int(mn.min()) if len(mn) else None,
            int(mx.max()) if len(mx) else None,
            _merge(hllk, g["hll"], hll_p),
            _merge(mgk, g["mg"], mg_k),
            _merge(kllk, g["kll"]),
            int(pdf["batch_id"].max()),
        ))
    out = spark.createDataFrame(
        pd.DataFrame(rows, columns=["col_name", "n", "n_null", "mn", "mx",
                                    "hll", "mg", "kll", "batch_id"])
        .astype({"mn": "Int64", "mx": "Int64"}),
        schema=_PARTIAL_SCHEMA + ", batch_id long",
    ).localCheckpoint()  # sever lineage from the files the overwrite deletes
    out.write.mode("overwrite").parquet(f"{path}/partials")
    return len(rows)


def profile_stream(stream_df: DataFrame, path: str, checkpoint: str):
    """Structured Streaming profile maintenance: each micro-batch's partial
    rows append to the persisted state (replay-guarded foreachBatch), so
    ``read_profile`` always reflects everything drained so far. The state
    must exist (write_profile_state) before the stream starts — params come
    from meta. Returns the started query (availableNow drain)."""
    return (
        stream_df.writeStream
        .foreachBatch(lambda b, bid: append_profile_increment(b, path, bid))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
