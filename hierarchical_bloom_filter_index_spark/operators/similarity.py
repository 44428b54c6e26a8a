"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force top-k: the baseline/oracle. Per
  partition, one numpy matmul against the broadcast query matrix produces a
  PARTIAL top-k; only n_partitions*k tiny rows shuffle to the final top-k.
  At 100 TB this is the classic map-side-combine shape: the crossJoin never
  materializes.
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets candidates,
  exact re-rank inside buckets; recall measured against brute force in tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..sketches.hashing import splitmix64


def _topk_schema() -> str:
    return "query_id long, vec_id long, score double"


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_source: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors of each query vector (excluding itself):
    (query_id, vec_id, score), score = cosine similarity in float64.

    Queries are collected (small by contract) and broadcast; candidates never
    leave their partitions until reduced to per-partition top-k.

    FILTERED search: pass the metadata-restricted frame as ``embeddings``
    (the predicate pushes down to its scan — brute-force-over-subset is the
    EXACT baseline every filtered-ANN system re-ranks against) and the
    unrestricted table as ``query_source`` so query vectors resolve even
    when they don't satisfy the filter themselves.
    """
    spark = embeddings.sparkSession
    qsrc = embeddings if query_source is None else query_source
    qrows = qsrc.filter(F.col(id_col).isin([int(q) for q in query_ids])).select(id_col, vec_col).collect()
    if not qrows:
        return spark.createDataFrame([], _topk_schema())
    qids = np.asarray([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.asarray([r[vec_col] for r in qrows], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids, qnorm))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qn = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = qn @ mat.T  # (n_queries, n_batch)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(qids_)):
                s = sims[qi]
                mask = ids != qids_[qi]
                cand_idx = np.where(mask)[0]
                if len(cand_idx) == 0:
                    continue
                # tie-break on vec_id ASC at the rank-k boundary (lexsort:
                # last key is primary) so the partial keeps exactly the rows
                # the global (score DESC, vec_id ASC) window would — equal
                # scores must not be dropped by partition row order
                take = cand_idx[np.lexsort((ids[cand_idx], -s[cand_idx]))[:k]]
                out_q.extend([qids_[qi]] * len(take))
                out_v.extend(ids[take])
                out_s.extend(s[take])
            yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    partials = embeddings.select(id_col, vec_col).mapInPandas(partial, schema=_topk_schema())
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")
    )


def _gaussian_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic (n_planes, dim) gaussian hyperplanes from a seeded
    splitmix stream (Box-Muller) — pure function of (n_planes, dim, seed)."""
    u = splitmix64(np.arange(2 * n_planes * dim, dtype=np.uint64) ^ np.uint64(seed * 0x9E3779B1))
    uniform = (u.astype(np.float64) + 0.5) / 2.0**64
    g = np.sqrt(-2.0 * np.log(uniform[: n_planes * dim])) * np.cos(
        2.0 * np.pi * uniform[n_planes * dim :]
    )
    return g.reshape(n_planes, dim)


def _buckets_from_bits(bits: np.ndarray, n_planes: int) -> np.ndarray:
    """(n, n_tables * n_planes) sign bits -> (n, n_tables) int64 bucket ids
    (bit i of table t = column t * n_planes + i)."""
    n_tables = bits.shape[1] // n_planes
    out = np.zeros((bits.shape[0], n_tables), dtype=np.int64)
    for t in range(n_tables):
        for i in range(n_planes):
            out[:, t] |= bits[:, t * n_planes + i].astype(np.int64) << i
    return out


def hyperplane_signatures(
    embeddings: DataFrame,
    n_planes: int = 16,
    seed: int = 123,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane (sign) LSH signature per vector as a long bucket id."""
    return hyperplane_signatures_multi(
        embeddings, n_planes, [seed], id_col=id_col, vec_col=vec_col, dim=dim
    ).select(id_col, "bucket")


def hyperplane_signatures_multi(
    embeddings: DataFrame,
    n_planes: int,
    seeds: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, table, bucket) for EVERY table in ONE mapInPandas pass: all
    tables' planes stack into one (n_tables * n_planes, dim) broadcast and
    one matmul per Arrow batch covers every table — vs one signature job
    (each with its own dim-probe job) per table. Table t's buckets are
    bit-identical to ``hyperplane_signatures(seed=seeds[t])``."""
    spark = embeddings.sparkSession
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = np.concatenate([_gaussian_planes(n_planes, dim, s) for s in seeds])
    bp = spark.sparkContext.broadcast(planes)
    n_tables = len(seeds)

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = bp.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            buckets = _buckets_from_bits(mat @ P.T > 0, n_planes)  # (n, T)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(dtype=np.int64), n_tables),
                    "table": np.tile(np.arange(n_tables, dtype=np.int32), len(mat)),
                    "bucket": buckets.ravel(),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        sig, schema=f"{id_col} long, table int, bucket long"
    )


def _grouped_rerank_fn(bq, id_col: str, vec_col: str):
    """Exact-cosine re-rank of (query_id, id, vec) candidate rows: one
    normalization + one matmul PER QUERY GROUP per Arrow batch (not a
    per-row Python comprehension). ``bq`` broadcasts {query_id: unit vec}."""

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qm = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            qarr = pdf["query_id"].to_numpy(dtype=np.int64)
            scores = np.empty(len(pdf), dtype=np.float64)
            for q in np.unique(qarr):
                m = qarr == q
                scores[m] = mat[m] @ qm[int(q)]
            yield pd.DataFrame(
                {"query_id": qarr, "vec_id": pdf[id_col].to_numpy(dtype=np.int64), "score": scores}
            )

    return rerank


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample_rows: int = 4096,
    iters: int = 12,
    seed: int = 77,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample — the coarse
    quantizer of an IVF index. At 100 TB the sample is a tiny fraction;
    training cost is independent of corpus size.

    The sample is the ``sample_rows`` lowest id-hashes (TakeOrdered, no full
    sort) — a pure function of row VALUES, so retraining yields identical
    centroids under any partitioning (a bare .limit() would not: it takes
    whichever partitions answer first)."""
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(id_col), F.col(id_col))
        .limit(sample_rows)
        .select(vec_col)
        .collect()
    )
    mat = np.asarray([r[vec_col] for r in sample], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)  # cosine assignment
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id): nearest-centroid partition of the vectors — the IVF
    inverted lists. One Arrow-batched matmul per partition; at scale the
    output is written partitioned by list_id so queries prune to nprobe
    lists' files."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            out = pdf[[id_col]].copy()
            out["list_id"] = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(assign, schema=f"{id_col} long, list_id int")


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: search only the ``nprobe`` inverted lists whose
    centroids are nearest each query; exact cosine re-rank within them.
    Recall < 1 possible (a true neighbor may live in an unprobed list)."""
    spark = embeddings.sparkSession
    cents = train_ivf_centroids(embeddings, n_centroids, vec_col=vec_col, id_col=id_col)
    lists = ivf_assign(embeddings, cents, id_col, vec_col)
    qrows = embeddings.filter(F.col(id_col).isin([int(q) for q in query_ids])).select(id_col, vec_col).collect()
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qv = qv / np.linalg.norm(qv)
        order = np.argsort(-(cents @ qv))[:nprobe]
        for lid in order:
            probe_rows.append((int(r[id_col]), int(lid)))
    probes = F.broadcast(spark.createDataFrame(probe_rows, "query_id long, list_id int"))
    cand = (
        lists.join(probes, on="list_id", how="inner")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
    )
    qmap = {int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64) for r in qrows}
    for q in qmap:
        qmap[q] = qmap[q] / np.linalg.norm(qmap[q])
    bq = spark.sparkContext.broadcast(qmap)
    joined = cand.join(embeddings.select(id_col, vec_col), on=id_col, how="inner")
    scored = joined.mapInPandas(_grouped_rerank_fn(bq, id_col, vec_col), schema=_topk_schema())
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")
    )


# ---------------------------------------------------------------------------
# IVF persistence: inverted lists on disk, partitioned by list_id, so a
# query READS only its nprobe lists' files (partition pruning at the scan)
# ---------------------------------------------------------------------------
def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **train_kw,
) -> np.ndarray:
    """Persist an IVF index: ``path/lists`` holds (id, vec) parquet
    PARTITIONED BY list_id (one directory per inverted list — the layout
    that lets a reader prune to nprobe lists' files), ``path/centroids``
    holds the trained coarse quantizer. Returns the centroids.

    Scale shape: assignment is one Arrow matmul pass; the single shuffle is
    the repartition("list_id") before the write, without which every input
    partition would write a file into every list directory
    (n_partitions x n_lists small files)."""
    spark = embeddings.sparkSession
    cents = train_ivf_centroids(
        embeddings, n_centroids, vec_col=vec_col, id_col=id_col, **train_kw
    )
    bc = spark.sparkContext.broadcast(cents)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            out = pdf[[id_col, vec_col]].copy()
            out["list_id"] = np.argmax(mat @ c.T, axis=1).astype(np.int32)
            yield out

    rows = embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} array<float>, list_id int"
    )
    rows.repartition("list_id").write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/lists"
    )
    spark.createDataFrame(
        [(i, [float(x) for x in cents[i]]) for i in range(len(cents))],
        "list_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return cents


def read_ivf_centroids(spark, path: str) -> np.ndarray:
    rows = spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()
    return np.asarray([r["centroid"] for r in rows], dtype=np.float64)


def read_ivf_lists(spark, path: str, list_ids=None) -> DataFrame:
    """The persisted inverted lists, PRUNED to ``list_ids`` when given: the
    isin filter is on the partition column, so Spark's file index skips
    every other list's directory — the scan touches only the probed lists'
    files (asserted via input_file_name in tests)."""
    df = spark.read.parquet(f"{path}/lists")
    if list_ids is not None:
        df = df.filter(F.col("list_id").isin([int(x) for x in list_ids]))
    return df


def ivf_topk_persisted(
    spark,
    path: str,
    queries: dict[int, np.ndarray],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``ivf_topk`` against a ``write_ivf_index`` layout: probe lists are
    chosen driver-side from the stored centroids, the scan reads ONLY those
    lists' files, and the exact cosine re-rank matches the in-memory path
    row-for-row (same quantizer -> same lists -> same candidates)."""
    cents = read_ivf_centroids(spark, path)
    qmap = {}
    probe_rows = []
    for qid, qv in queries.items():
        qv = np.asarray(qv, dtype=np.float64)
        qmap[int(qid)] = qv / np.linalg.norm(qv)
        for lid in np.argsort(-(cents @ qmap[int(qid)]))[:nprobe]:
            probe_rows.append((int(qid), int(lid)))
    lists = read_ivf_lists(spark, path, sorted({lid for _, lid in probe_rows}))
    probes = F.broadcast(spark.createDataFrame(probe_rows, "query_id long, list_id int"))
    cand = (
        lists.join(probes, on="list_id", how="inner")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, vec_col)
    )
    bq = spark.sparkContext.broadcast(qmap)
    scored = cand.mapInPandas(_grouped_rerank_fn(bq, id_col, vec_col), schema=_topk_schema())
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")
    )


def takedown_ivf_index(spark, path: str, vec_ids,
                       id_col: str = "vec_id") -> int:
    """Per-vector removal from a ``write_ivf_index`` layout (retention /
    right-to-be-forgotten): rewrites ONLY the inverted-list directories
    that hold a removed vector (dynamic partition overwrite — every other
    list's files are never read past the id-column probe, which is a
    column-pruned scan of (id, list_id) only). Centroids are untouched:
    the coarse quantizer is a trained model, not per-row state, so the
    post-takedown index answers exactly like the full index minus the
    removed rows (same lists -> same candidates minus removed). A list
    emptied entirely is rmtree'd by hand (dynamic overwrite only replaces
    partitions present in the written data). Returns lists rewritten
    (0 = no removed id present; replay-idempotent)."""
    import shutil

    lists = spark.read.parquet(f"{path}/lists")
    dtype = lists.schema[id_col].dataType
    ids_df = spark.createDataFrame(
        [(str(x),) for x in vec_ids], f"{id_col} string"
    ).select(F.col(id_col).cast(dtype).alias(id_col)).distinct()
    # column-pruned probe: which lists hold a removed vector?
    touched = sorted(
        int(r["list_id"])
        for r in lists.select(id_col, "list_id")
        .join(F.broadcast(ids_df), on=id_col, how="left_semi")
        .select("list_id").distinct().collect())
    if not touched:
        return 0
    kept = (
        lists.filter(F.col("list_id").isin(touched))
        .join(F.broadcast(ids_df), on=id_col, how="left_anti")
        .repartition("list_id")
        # materialize BEFORE the overwrite — Spark cannot overwrite a path
        # that still feeds the running plan
        .localCheckpoint()
    )
    present = {int(r["list_id"])
               for r in kept.select("list_id").distinct().collect()}
    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("list_id")
        .parquet(f"{path}/lists")
    )
    for lid in touched:
        if lid not in present:
            shutil.rmtree(f"{path}/lists/list_id={lid}", ignore_errors=True)
    return len(touched)


def semantic_neardup_against_index(
    spark,
    new_emb: DataFrame,
    path: str,
    threshold: float = 0.9,
    nprobe: int = 1,
    max_list: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """INCREMENTAL SemDeDup: (new_id, corpus_id, cosine) pairs between an
    ingestion batch of embeddings and an ALREADY-INDEXED corpus (a
    write_ivf_index layout) — the embedding twin of
    dedup.neardup_against_index: the corpus is never re-embedded or
    re-scanned wholesale per batch. Each new vector probes its ``nprobe``
    nearest inverted lists from the STORED centroids; ONLY those lists'
    parquet directories are read (partition pruning at the scan), and exact
    cosine over the probed lists decides — reported pairs are never false
    positives; recall < 1 is the probe-granularity trade (an index trained
    at n_centroids=1 makes the probe exhaustive — the driver oracle trick).
    A vec_id present on both sides is excluded (re-ingestion is not a
    near-dup of itself).

    Scale shape: the batch side (with its nprobe fan-out) BROADCASTS — an
    ingestion batch is MBs next to a 100 TB corpus — so corpus vectors
    never shuffle: the probed lists stream map-side through the broadcast
    hash join into the Arrow scoring pass. ``max_list`` drops degenerate
    lists (drop-with-log, the cap_bucket_sizes discipline; recall-only)."""
    from .dedup import cap_bucket_sizes

    cents = read_ivf_centroids(spark, path)
    bc = spark.sparkContext.broadcast(cents)
    npb = min(int(nprobe), len(cents))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            order = np.argsort(-(mat @ c.T), axis=1)[:, :npb]
            out = pdf[[id_col, vec_col]].loc[pdf.index.repeat(npb)].reset_index(drop=True)
            out.columns = ["new_id", "nvec"]
            out["list_id"] = order.ravel().astype(np.int32)
            yield out

    probes = new_emb.select(id_col, vec_col).mapInPandas(
        assign, schema="new_id long, nvec array<float>, list_id int")
    lids = sorted(r["list_id"] for r in probes.select("list_id").distinct().collect())
    lists = cap_bucket_sizes(
        read_ivf_lists(spark, path, lids), ["list_id"], max_list,
        "semantic_neardup_against_index")
    paired = (
        F.broadcast(probes)
        .join(lists, "list_id")
        .filter(F.col("new_id") != F.col(id_col))
        .select("new_id", "nvec", F.col(id_col).alias("corpus_id"),
                F.col(vec_col).alias("cvec"))
    )
    thr = float(threshold)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["nvec"]])
            vb = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["cvec"]])
            va = va / np.linalg.norm(va, axis=1, keepdims=True)
            vb = vb / np.linalg.norm(vb, axis=1, keepdims=True)
            cos = (va * vb).sum(axis=1)
            out = pdf[["new_id", "corpus_id"]].copy()
            out["cosine"] = np.round(cos, 6)
            yield out[cos >= thr]

    # nprobe > 1 can find the same (new, corpus) pair via several probed
    # lists of the same stored row only if ids collide across lists — they
    # cannot (each corpus row lives in exactly one list) — so no distinct
    return paired.mapInPandas(
        score, schema="new_id long, corpus_id long, cosine double")


def incremental_semantic_stream(
    stream_emb: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.9,
    nprobe: int = 1,
    max_list: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Structured-Streaming twin of semantic_neardup_against_index: each
    micro-batch of arriving embeddings is checked against the persisted IVF
    index and surviving pairs appended to ``out_path`` parquet. foreachBatch
    is at-least-once, so the shared REPLAY GUARD probes the output for the
    batch_id before appending (streaming/incremental.py discipline).
    Cross-batch new-new pairs are out of scope by the same contract as the
    batch op. Returns the StreamingQuery."""
    from ..streaming.incremental import replay_guarded_append

    def step(batch_df: DataFrame, batch_id: int) -> None:
        replay_guarded_append(
            out_path, batch_df, batch_id,
            lambda b: semantic_neardup_against_index(
                b.sparkSession, b, index_path, threshold, nprobe,
                max_list, id_col, vec_col,
            ),
        )

    return (
        stream_emb.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 6,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (id_a < id_b, cos >= threshold)
    via hyperplane-LSH bucketing + exact re-scoring of candidate pairs only
    — the embedding analog of MinHash near-dup for training-data dedup.

    Recall < 1 is possible (LSH misses); candidates are exactly re-scored so
    there are no false positives. All-pairs work is bounded by bucket sizes.
    All tables' buckets come from ONE signature pass (stacked planes, one
    dim probe); the self-join keys on (table, bucket) so bucket ids never
    collide across tables.

    ``max_bucket`` bounds the in-bucket self-join: a degenerate bucket
    (e.g. many near-zero vectors landing on one signature in every table)
    is k^2 candidates on one shuffle key — oversized buckets are dropped
    WITH a warning (dedup.cap_bucket_sizes), costing recall only.
    """
    from .dedup import cap_bucket_sizes

    sig = hyperplane_signatures_multi(
        embeddings, n_planes, [7000 + t for t in range(n_tables)],
        id_col=id_col, vec_col=vec_col,
    )
    sig = cap_bucket_sizes(sig, ["table", "bucket"], max_bucket, "embedding_neardup_pairs")
    a, b = sig.alias("a"), sig.alias("b")
    cands = (
        a.join(b, (F.col("a.table") == F.col("b.table"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    vecs = embeddings.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    paired = (
        cands.join(vecs.withColumnRenamed("_vid", "id_a").withColumnRenamed("_v", "va"), "id_a")
        .join(vecs.withColumnRenamed("_vid", "id_b").withColumnRenamed("_v", "vb"), "id_b")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["va"]])
            vb = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
            va = va / np.linalg.norm(va, axis=1, keepdims=True)
            vb = vb / np.linalg.norm(vb, axis=1, keepdims=True)
            cos = (va * vb).sum(axis=1)
            out = pdf[["id_a", "id_b"]].copy()
            out["cosine"] = np.round(cos, 6)
            yield out[cos >= threshold]

    return paired.mapInPandas(score, schema="id_a long, id_b long, cosine double")


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    max_cluster: int | None = None,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate PAIRS (id_a < id_b,
    cos >= threshold): k-means-cluster the embedding space (the IVF coarse
    quantizer — deterministic, hash-ordered training sample), then exact
    pairwise cosine WITHIN each cluster only (Abbas et al. 2023,
    arXiv:2303.09540). Every reported pair is exactly scored — NO false
    positives ever; recall < 1 is the cluster-granularity trade (a
    cross-cluster near-dup pair is never examined). With ``n_centroids=1``
    the operator degrades to exact all-pairs — the driver oracle trick.

    Scale shape: all-pairs work is the sum of squared CLUSTER sizes (the
    whole point vs a corpus-squared scan); each cluster's pair scan is one
    in-memory matmul inside its own task. ``max_cluster`` drops degenerate
    clusters WITH a warning (dedup.cap_bucket_sizes) — recall-only loss."""
    from .dedup import cap_bucket_sizes

    cents = centroids if centroids is not None else train_ivf_centroids(
        embeddings, n_centroids, id_col=id_col, vec_col=vec_col)
    lists = ivf_assign(embeddings, cents, id_col, vec_col)
    joined = embeddings.select(id_col, vec_col).join(lists, id_col)
    joined = cap_bucket_sizes(joined, ["list_id"], max_cluster, "semantic_dedup_pairs")
    thr = float(threshold)

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({
                "id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
                "cosine": np.empty(0, np.float64)})
        order = np.argsort(pdf[id_col].to_numpy())
        ids = pdf[id_col].to_numpy()[order]
        mat = np.asarray([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col].to_numpy()[order]])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        ia, ib = np.nonzero(np.triu(sims >= thr, k=1))
        return pd.DataFrame({
            "id_a": ids[ia], "id_b": ids[ib],
            "cosine": np.round(sims[ia, ib], 6)})

    return joined.groupBy("list_id").applyInPandas(
        pairs, schema="id_a long, id_b long, cosine double")


def semantic_dedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    max_cluster: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The embedding table AFTER semantic dedup: connected components over
    the semantic pair graph (edge-only star-contraction shuffles), keep the
    minimum-id member of each component plus every unpaired row — the
    SemDeDup keep-list composed from the engine's own dedup machinery
    (dedup.neardup_canonical_corpus). Columns = ``embeddings``'s id column."""
    from .dedup import neardup_canonical_corpus

    pairs = semantic_dedup_pairs(
        embeddings, threshold, n_centroids, max_cluster,
        id_col=id_col, vec_col=vec_col,
    ).select("id_a", "id_b")
    return neardup_canonical_corpus(
        embeddings.select(id_col), pairs, id_col=id_col,
        left="id_a", right="id_b",
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: union of ``n_tables`` hyperplane-LSH bucket
    probes, exact re-rank of the candidate union. Recall < 1 possible (missed
    neighbors); tests measure it vs cosine_topk.

    Plan shape: the query vectors are collected ONCE (small by contract) —
    their buckets are computed driver-side with the same stacked planes and
    broadcast, so the corpus signature frame is scanned exactly once
    (one mapInPandas + one dim probe total, vs 2 jobs per table before);
    the re-rank does one matmul per query group per batch."""
    spark = embeddings.sparkSession
    qrows = embeddings.filter(F.col(id_col).isin([int(x) for x in query_ids])).select(id_col, vec_col).collect()
    if not qrows:
        return spark.createDataFrame(
            [], _topk_schema() + ", rank int"
        ).select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")
    dim = len(qrows[0][vec_col])
    seeds = [1000 + t for t in range(n_tables)]
    planes = np.concatenate([_gaussian_planes(n_planes, dim, s) for s in seeds])
    qids = np.asarray([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.asarray([r[vec_col] for r in qrows], dtype=np.float64)
    qbuckets = _buckets_from_bits(qmat @ planes.T > 0, n_planes)  # (nq, T)
    qbucket_rows = [
        (int(qids[i]), int(t), int(qbuckets[i, t]))
        for i in range(len(qids)) for t in range(n_tables)
    ]
    qb = F.broadcast(
        spark.createDataFrame(qbucket_rows, "query_id long, table int, bucket long")
    )

    sig = hyperplane_signatures_multi(
        embeddings, n_planes, seeds, id_col=id_col, vec_col=vec_col, dim=dim
    )
    cands = (
        sig.join(qb, on=["table", "bucket"], how="inner")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col)
        .distinct()
    )

    qmap = {int(qids[i]): qmat[i] / np.linalg.norm(qmat[i]) for i in range(len(qids))}
    bq = spark.sparkContext.broadcast(qmap)
    joined = cands.join(embeddings.select(id_col, vec_col), on=id_col, how="inner")
    scored = joined.mapInPandas(_grouped_rerank_fn(bq, id_col, vec_col), schema=_topk_schema())
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized inverted lists. The 100 TB embedding path —
# full float32 vectors do not fit hot storage at that scale, but M uint8
# codes per vector (e.g. 8 bytes for a 64-dim vector, a 32x compression)
# do. Queries scan codes with an ADC table (one np.take + sum per list,
# no decode), then exact-rerank only the top ADC candidates' true vectors.
# ---------------------------------------------------------------------------
def train_pq_codebooks(
    embeddings: DataFrame,
    coarse: np.ndarray,
    m_subspaces: int = 8,
    n_codes: int = 16,
    sample_rows: int = 4096,
    iters: int = 12,
    seed: int = 177,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Per-subspace Lloyd k-means over RESIDUALS (normalized vector minus
    its coarse centroid — the classic IVF-PQ composition: the coarse
    quantizer removes the large-scale structure, PQ encodes what is left)
    on the SAME deterministic hash-ordered driver sample as
    train_ivf_centroids. Returns codebooks of shape
    (m_subspaces, n_codes, dim // m_subspaces). Training cost is
    independent of corpus size."""
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(id_col), F.col(id_col))
        .limit(sample_rows)
        .select(vec_col)
        .collect()
    )
    mat = np.asarray([r[vec_col] for r in sample], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    dim = mat.shape[1]
    if dim % m_subspaces != 0:
        raise ValueError(
            f"train_pq_codebooks: dim {dim} not divisible by "
            f"m_subspaces {m_subspaces}")
    if not (1 < n_codes <= 256):
        raise ValueError("train_pq_codebooks: need 2 <= n_codes <= 256")
    res = mat - coarse[np.argmax(mat @ coarse.T, axis=1)]
    sub = dim // m_subspaces
    books = np.empty((m_subspaces, n_codes, sub), dtype=np.float64)
    for m in range(m_subspaces):
        x = res[:, m * sub:(m + 1) * sub]
        rng = np.random.default_rng(seed + m)
        k = min(n_codes, len(x))
        cb = x[rng.choice(len(x), size=k, replace=False)].copy()
        for _ in range(iters):
            # squared-L2 assignment; ties -> lowest code (argmin), so the
            # whole training is a pure function of (sample, seed)
            d = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)
            for c in range(k):
                members = x[a == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        if k < n_codes:  # degenerate tiny sample: pad with copies
            cb = np.concatenate([cb, np.repeat(cb[:1], n_codes - k, 0)])
        books[m] = cb
    return books


def _pq_encode_batch(mat: np.ndarray, coarse: np.ndarray,
                     books: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(list_ids, codes) for a batch of RAW vectors: normalize, coarse
    assign, residual-encode each subspace to its nearest codeword."""
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    lids = np.argmax(mat @ coarse.T, axis=1)
    res = mat - coarse[lids]
    m_sub, n_codes, sub = books.shape
    codes = np.empty((len(mat), m_sub), dtype=np.int16)
    for m in range(m_sub):
        x = res[:, m * sub:(m + 1) * sub]
        d = ((x[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = np.argmin(d, axis=1).astype(np.int16)
    return lids.astype(np.int32), codes


def ivfpq_encode(
    embeddings: DataFrame,
    coarse: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id, codes): the PQ-compressed corpus — M smallint codes
    per vector instead of dim floats. One Arrow-batched numpy pass, no
    shuffle (write partitioned by list_id to get the prunable layout)."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((coarse, books))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents, bks = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            lids, codes = _pq_encode_batch(mat, cents, bks)
            out = pdf[[id_col]].copy()
            out["list_id"] = lids
            out["codes"] = list(codes)
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} long, list_id int, codes array<smallint>")


def _query_probe_plan(embeddings, coarse, query_ids, nprobe, id_col, vec_col):
    """({query_id: unit vec}, [(query_id, list_id)]) — the driver-side
    probe plan shared by the in-memory and persisted IVF-PQ paths."""
    qrows = embeddings.filter(
        F.col(id_col).isin([int(q) for q in query_ids])
    ).select(id_col, vec_col).collect()
    qmap, probe_rows = {}, []
    for r in qrows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qmap[int(r[id_col])] = qv / np.linalg.norm(qv)
        for lid in np.argsort(-(coarse @ qmap[int(r[id_col])]))[:nprobe]:
            probe_rows.append((int(r[id_col]), int(lid)))
    return qmap, probe_rows


def _adc_fn(bq, id_col: str):
    """mapInPandas closure scoring PQ code rows by ADC: per-query lookup
    tables (table[m][j] = q_m . books[m][j]) and per-(query, list)
    constants q . c_list built ONCE per task; each candidate costs M
    np.take lookups + adds, never a decode. ``bq`` broadcasts
    (qmap, coarse, books)."""

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qm, cents, bks = bq.value
        m_sub, _, sub = bks.shape
        tables = {q: np.array([
            bks[m] @ qv[m * sub:(m + 1) * sub] for m in range(m_sub)
        ]) for q, qv in qm.items()}  # (M, n_codes) per query
        qdotc = {q: cents @ qv for q, qv in qm.items()}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for q, g in pdf.groupby("query_id"):
                cds = np.vstack(g["codes"].to_numpy())  # (n, M)
                t = tables[int(q)]
                s = qdotc[int(q)][g["list_id"].to_numpy()]
                for m in range(m_sub):
                    s = s + t[m][cds[:, m]]
                out = g[["query_id"]].copy()
                out["vec_id"] = g[id_col].to_numpy()
                out["adc"] = s
                yield out

    return adc


def _adc_pool_rerank(codes_or_lists, probes, bq, embeddings, qmap,
                     k, rerank, id_col, vec_col):
    """The shared IVF-PQ query tail: ADC-score the probed code rows, keep
    the top ``rerank`` ADC candidates per query (ties vec_id ASC), join
    their TRUE vectors back, exact-cosine re-rank, final top-k."""
    spark = embeddings.sparkSession
    cand = (
        codes_or_lists.join(probes, on="list_id", how="inner")
        .filter(F.col(id_col) != F.col("query_id"))
    )
    scored = cand.mapInPandas(
        _adc_fn(bq, id_col), schema="query_id long, vec_id long, adc double")
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    pool = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(rerank))
        .select("query_id", "vec_id")
    )
    joined = pool.join(
        embeddings.select(F.col(id_col).alias("vec_id"), vec_col),
        on="vec_id", how="inner")
    bqv = spark.sparkContext.broadcast(qmap)
    exact = joined.mapInPandas(
        _grouped_rerank_fn(bqv, "vec_id", vec_col), schema=_topk_schema())
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id",
                F.round("score", 6).alias("score"), "rank")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m_subspaces: int = 8,
    n_codes: int = 16,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k with exact re-rank: probe the ``nprobe``
    nearest inverted lists, score their PQ codes by ADC (score(v) =
    q . c_list + sum_m table[m][code_m] where table[m][j] =
    q_m . books[m][j] — a per-QUERY table, M np.take lookups per
    candidate, never a decode), keep the top ``rerank`` ADC candidates
    per query, then exact-cosine re-rank their TRUE vectors for the final
    (query_id, vec_id, score, rank) — output scores are always exact
    cosines, PQ only decides who reaches the re-rank.

    With nprobe >= n_centroids and rerank >= corpus size this degrades to
    exact brute force — the driver parity gate (`ivfpq_exhaustive_parity`)
    pins that equality so the assignment/encode/ADC plumbing is
    row-checked, while recall at realistic settings is a suite contract.

    Scale shape: codes scan is 32x smaller than the vector scan and prunes
    to nprobe list partitions; the ONLY per-candidate state that crosses
    an exchange is (query_id, vec_id, adc) for rerank winners; true
    vectors are joined back for re-rank candidates only."""
    spark = embeddings.sparkSession
    coarse = train_ivf_centroids(
        embeddings, n_centroids, vec_col=vec_col, id_col=id_col)
    books = train_pq_codebooks(
        embeddings, coarse, m_subspaces, n_codes,
        vec_col=vec_col, id_col=id_col)
    codes = ivfpq_encode(embeddings, coarse, books, id_col, vec_col)
    qmap, probe_rows = _query_probe_plan(
        embeddings, coarse, query_ids, nprobe, id_col, vec_col)
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "query_id long, list_id int"))
    bq = spark.sparkContext.broadcast((qmap, coarse, books))
    return _adc_pool_rerank(
        codes, probes, bq, embeddings, qmap, k, rerank, id_col, vec_col)


def write_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    m_subspaces: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **train_kw,
) -> None:
    """Persist an IVF-PQ index: ``path/lists`` holds (id, codes) parquet
    PARTITIONED BY list_id — the 100 TB hot artifact, M smallint codes per
    vector instead of dim floats — plus ``path/centroids`` (coarse),
    ``path/books`` (flattened PQ codebooks) and ``path/meta`` (pinned
    geometry: readers NEVER take m/k from callers — the
    write_minhash_index discipline). ONE repartition('list_id') before
    the write keeps one writer task per list directory. Per-vector
    takedown rides takedown_ivf_index unchanged (it only touches id_col
    and list_id)."""
    spark = embeddings.sparkSession
    coarse = train_ivf_centroids(
        embeddings, n_centroids, vec_col=vec_col, id_col=id_col, **train_kw)
    books = train_pq_codebooks(
        embeddings, coarse, m_subspaces, n_codes,
        vec_col=vec_col, id_col=id_col, **train_kw)
    codes = ivfpq_encode(embeddings, coarse, books, id_col, vec_col)
    (codes.repartition("list_id").write.mode("overwrite")
     .partitionBy("list_id").parquet(f"{path}/lists"))
    spark.createDataFrame(
        [(i, [float(x) for x in coarse[i]]) for i in range(len(coarse))],
        "list_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    m_sub, n_cd, sub = books.shape
    spark.createDataFrame(
        [(m, j, [float(x) for x in books[m, j]])
         for m in range(m_sub) for j in range(n_cd)],
        "m int, code int, word array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/books")
    spark.createDataFrame(
        [(int(m_sub), int(n_cd), int(sub))],
        "m_subspaces int, n_codes int, sub_dim int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def read_ivfpq_codebooks(spark, path: str) -> np.ndarray:
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    books = np.empty((meta["m_subspaces"], meta["n_codes"],
                      meta["sub_dim"]), dtype=np.float64)
    for r in spark.read.parquet(f"{path}/books").collect():
        books[r["m"], r["code"]] = r["word"]
    return books


def ivfpq_topk_persisted(
    spark,
    path: str,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 4,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``ivfpq_topk`` against a ``write_ivfpq_index`` layout: centroids +
    codebooks load driver-side (tiny), the ADC scan reads ONLY the probed
    lists' code files (partition pruning — 32x less IO than the vector
    scan even before pruning), and the exact re-rank joins the top-ADC
    pool's TRUE vectors from the caller's base table. Row-identical to
    the in-memory path for the same geometry (deterministic training)."""
    coarse = read_ivf_centroids(spark, path)
    books = read_ivfpq_codebooks(spark, path)
    qmap, probe_rows = _query_probe_plan(
        embeddings, coarse, query_ids, nprobe, id_col, vec_col)
    lists = read_ivf_lists(spark, path, sorted({l for _, l in probe_rows}))
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "query_id long, list_id int"))
    bq = spark.sparkContext.broadcast((qmap, coarse, books))
    return _adc_pool_rerank(
        lists, probes, bq, embeddings, qmap, k, rerank, id_col, vec_col)


def grouped_centroid_sums(
    embs: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale_pow2: int = 20,
) -> DataFrame:
    """(group, dim, n, sum_scaled): exact per-group embedding centroid
    NUMERATORS — sum over vectors of floor(x * 2^scale_pow2) per
    dimension, with the count to divide by.  Floating-point centroid
    averages are accumulation-order-dependent (never cross-engine
    reproducible); flooring each float32 onto a power-of-two fixed-point
    grid FIRST makes the sum an order-free integer, bit-identical on
    every engine and partitioning (the repo's no-float-accumulation
    discipline; 2^-20 grid error is ~1e-6 per element, far below any
    embedding's own noise).  One posexplode + one map-side-combined
    groupBy — (groups x dims) output rows."""
    dim = F.posexplode(F.col(vec_col))
    scale = float(1 << int(scale_pow2))
    base = embs.select(F.col(group_col).alias("grp"), dim)
    return (base.select(
                "grp", F.col("pos").alias("dim"),
                F.floor(F.col("col").cast("double") * F.lit(scale))
                .alias("_v"))
            .groupBy("grp", "dim")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("_v").alias("sum_scaled")))
