"""Content-defined chunking (CDC) and chunk-level deduplication.

Fixed-size chunking (operators/chunk.py) breaks identity under insertion:
one added character shifts every later chunk boundary, so storage/dedup
systems use CONTENT-DEFINED boundaries — a cut is declared wherever a
rolling hash of the last ``window`` characters lands in a sparse set, so
an edit only disturbs the chunks it touches (the classic LBFS/rsync
design; same role as the reference's fixed token windows but
edit-stable).  Chunk-level dedup is the storage-side complement of the
document-level dedup family (operators/dedup.py): two near-identical
documents share almost all their chunks even when no document-level
fingerprint matches.

Boundary rule (STATELESS, so it is a pure function of content and every
engine can replay it):

    key(e)   = sum_{j=0..w-1} codepoint(text[e-w+1+j]) * B^(w-1-j)  mod 2^64
    cut after char e  iff  hash64(key(e), seed) & (2^mask_bits - 1) == 0

with B the public FNV-1a 64-bit prime (0x100000001B3) and ``hash64`` the
repo-wide seeded SplitMix64 (sketches/hashing.py), which already has a
bit-exact DuckDB HUGEINT twin (__spark_entry__._key_hash_ctes) — so the
driver gates on chunk spans are VALUE equalities.  Expected chunk length
is ~2^mask_bits characters.  No min/max chunk clamp: a clamp makes each
boundary depend on the previous one (sequential state) and would break
both the stateless SQL twin and edit-locality; degenerate 1-char chunks
are possible and allowed (documented, deterministic).

Invariants (tested):
- concat(chunks of doc) == text, char_start strictly increasing;
- docs shorter than ``window`` form one whole-text chunk; empty docs
  produce NO chunks (operators/chunk.py discipline);
- boundaries are a pure function of (text, window, mask_bits, seed) —
  identical across partitionings, replicas and engines;
- edit-locality: appending a suffix never changes cuts that end more
  than ``window-1`` chars before the old end.

Scale shape: the chunker is one Arrow pass (mapInPandas; per-doc numpy
polynomial + one vectorized hash64 — no per-char Python), zero shuffles.
Dedup stats shuffle (source, chunk) once; chunk payloads are ~2^mask_bits
chars so the shuffle rows stay small.  At 100 TB the group keys can be
pre-bucketed by xxhash64(chunk) exactly like dedup.dedup_exact_pairs if
chunk texts ever grow past a cache line.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sketches.hashing import hash64

_P64 = 1 << 64
_FNV_PRIME = 0x100000001B3


def _weights(window: int) -> np.ndarray:
    return np.array(
        [pow(_FNV_PRIME, window - 1 - j, _P64) for j in range(window)],
        dtype=np.uint64)


def _check_params(window: int, mask_bits: int) -> None:
    if window < 2:
        raise ValueError(f"cdc: window must be >= 2, got {window}")
    if not (1 <= mask_bits <= 32):
        raise ValueError(f"cdc: need 1 <= mask_bits <= 32, got {mask_bits}")


def chunk_starts(text: str, window: int, mask_bits: int, seed: int) -> list[int]:
    """0-based chunk start offsets for one document (the boundary rule
    above; first chunk always starts at 0).  The single-doc kernel the
    distributed pass and the tests share."""
    n = len(text)
    if n == 0:
        return []
    if n < window:
        return [0]
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    acc = np.zeros(n - window + 1, dtype=np.uint64)
    w = _weights(window)
    with np.errstate(over="ignore"):
        for j in range(window):
            acc += cps[j:n - window + 1 + j] * w[j]
    h = hash64(acc, seed)
    mask = np.uint64((1 << mask_bits) - 1)
    ends = np.flatnonzero((h & mask) == 0) + (window - 1)  # 0-based end chars
    return [0] + [int(e) + 1 for e in ends if int(e) + 1 < n]


def batch_chunk_starts(texts: list[str], window: int, mask_bits: int,
                       seed: int) -> list[list[int]]:
    """chunk_starts for a whole BATCH of documents in one vectorized
    pass: every doc's codepoints concatenate into one stream, the
    polynomial and the seeded hash run ONCE over all positions, and
    each doc reads its boundary mask back as a slice — per-doc Python
    shrinks to a mask slice + chunk-list build.  Windows never cross a
    doc boundary because only positions with a full in-doc window are
    sliced.  Byte-identical to per-doc chunk_starts (tested) — the
    per-doc kernel measured 0.60 N->4N core efficiency at 37M chars
    purely on ~40us/doc numpy dispatch overhead; this shape restores
    compute-bound scaling (the partial_blobs_by_slot discipline)."""
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    offs = np.concatenate([[0], np.cumsum(lens)])
    total = int(offs[-1])
    if total == 0:
        return [[] if n == 0 else [0] for n in lens]
    cps = np.frombuffer("".join(texts).encode("utf-32-le"),
                        dtype=np.uint32).astype(np.uint64)
    w = _weights(window)
    n_keys = total - window + 1
    boundary = None
    if n_keys > 0:
        acc = np.zeros(n_keys, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(window):
                acc += cps[j:n_keys + j] * w[j]
        h = hash64(acc, seed)
        mask = np.uint64((1 << mask_bits) - 1)
        boundary = (h & mask) == 0  # boundary[j]: cut after char j+window-1
    out: list[list[int]] = []
    for i, n in enumerate(lens):
        n = int(n)
        if n == 0:
            out.append([])
            continue
        if n < window:
            out.append([0])
            continue
        o = int(offs[i])
        ends = np.flatnonzero(boundary[o:o + n - window + 1]) + (window - 1)
        out.append([0] + [int(e) + 1 for e in ends if int(e) + 1 < n])
    return out


def cdc_chunks(
    docs: DataFrame,
    window: int = 8,
    mask_bits: int = 5,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, source, chunk_idx, char_start, chunk): content-defined
    chunks of every document.  One mapInPandas scan, zero shuffles;
    boundaries batch-vectorized across the Arrow batch's docs
    (batch_chunk_starts)."""
    _check_params(window, mask_bits)
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = (f"doc_id {id_type}, source string, chunk_idx int, "
              f"char_start bigint, chunk string")
    cols = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(text_col).alias("text"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(did, src, t) for did, src, t in
                    zip(pdf["doc_id"], pdf["source"], pdf["text"])
                    if t is not None]
            if not rows:
                continue
            all_starts = batch_chunk_starts([t for _, _, t in rows],
                                            window, mask_bits, seed)
            ids: list = []
            srcs: list = []
            idxs: list = []
            starts_out: list = []
            chunks: list = []
            for (did, src, text), starts in zip(rows, all_starts):
                n = len(text)
                for k, s in enumerate(starts):
                    e = starts[k + 1] if k + 1 < len(starts) else n
                    ids.append(did)
                    srcs.append(src)
                    idxs.append(k)
                    starts_out.append(s)
                    chunks.append(text[s:e])
            if ids:  # empty-yield guard: see pyspark-empty-pandas-batch-arrow-trap
                yield pd.DataFrame({
                    "doc_id": ids,
                    "source": srcs,
                    "chunk_idx": np.asarray(idxs, dtype=np.int32),
                    "char_start": np.asarray(starts_out, dtype=np.int64),
                    "chunk": chunks,
                })

    return cols.mapInPandas(gen, schema)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Per-source chunk-store dedup accounting over a ``cdc_chunks``
    output: (source, n_chunks, total_chars, n_distinct_chunks,
    distinct_chars).  total_chars always equals the source's corpus
    chars (concat invariant); distinct_chars is what a chunk store would
    actually hold — the dedup win is the gap.  All four outputs exact
    integers.  The chunk pass is materialized ONCE (localCheckpoint —
    two aggregation subtrees share no CSE in Spark, so the expensive
    Arrow chunking would otherwise run twice; the drift counts-input
    lesson); the distinct leg shuffles (source, chunk) once."""
    ch = chunks.select("source", "chunk").localCheckpoint()
    per_src = ch.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.length("chunk")).alias("total_chars"))
    dist = (
        ch.distinct()
        .groupBy("source").agg(
            F.count(F.lit(1)).alias("n_distinct_chunks"),
            F.sum(F.length("chunk")).alias("distinct_chars")))
    return per_src.join(dist, "source")


def cdc_global_dedup(chunks: DataFrame) -> DataFrame:
    """Corpus-wide single-row twin of :func:`cdc_dedup_stats` — the
    numbers a shared (cross-source) chunk store would see.  Same
    materialize-once discipline."""
    ch = chunks.select("chunk").localCheckpoint()
    tot = ch.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.length("chunk")).alias("total_chars"))
    dist = ch.distinct().agg(
        F.count(F.lit(1)).alias("n_distinct_chunks"),
        F.sum(F.length("chunk")).alias("distinct_chars"))
    return tot.crossJoin(dist)


def _doc_chunk_set(chunks: DataFrame) -> DataFrame:
    """Distinct (doc_id, h=xxhash64(chunk), chunk) rows, materialized
    once — the shared input of every pair/similarity/novelty surface
    (each fans out into 2+ subtrees; without the checkpoint the Arrow
    chunking pass re-executes per subtree)."""
    return (chunks.select("doc_id", F.xxhash64("chunk").alias("h"), "chunk")
            .distinct().localCheckpoint())


def cdc_shared_chunk_pairs(
    chunks: DataFrame,
    min_shared: int = 2,
    max_chunk_df: int | None = None,
    _d: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs sharing at least
    ``min_shared`` DISTINCT chunk contents — chunk-level near-dup
    candidates (the CDC analogue of contamination_pairs' shared grams).
    Join key is the chunk CONTENT via xxhash64 (8-byte shuffle keys),
    verified exactly by grouping on the chunk string itself within the
    hash bucket.  A chunk shared by k docs emits k^2 pairs, so a
    ubiquitous chunk (tiny-vocab corpora, boilerplate) is a single-key
    shuffle bomb at scale — ``max_chunk_df`` drops chunks appearing in
    MORE than that many distinct docs from pair generation (the
    dedup.ngram_jaccard_pairs / winnowing max_fp_df discipline: a
    boilerplate chunk says nothing about pairwise similarity anyway).
    The cut is logged via one extra count, never silent; None keeps the
    exact all-pairs semantics (the oracle contract)."""
    d = _d if _d is not None else _doc_chunk_set(chunks)
    if max_chunk_df is not None:
        if max_chunk_df < 2:
            raise ValueError("cdc_shared_chunk_pairs: max_chunk_df must "
                             "be >= 2 (pairs need 2 docs)")
        df_tab = d.groupBy("h", "chunk").agg(
            F.count(F.lit(1)).alias("_df"))
        hot = df_tab.filter(F.col("_df") > int(max_chunk_df))
        n_hot = hot.count()
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "cdc_shared_chunk_pairs: dropping %d chunks with df > %d "
                "from pair generation", n_hot, max_chunk_df)
        d = d.join(hot.select("h", "chunk"), ["h", "chunk"], "left_anti")
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared)))
    return pairs


# ---------------------------------------------------------------------------
# persisted chunk store: build / append / remove lifecycle
# ---------------------------------------------------------------------------
def write_chunk_store(
    docs: DataFrame,
    path: str,
    window: int = 8,
    mask_bits: int = 5,
    seed: int = 0,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> None:
    """Persist the corpus's chunk reference-count table — (bucket, source,
    chunk, n_refs) parquet PARTITIONED BY bucket = pmod(xxhash64(chunk),
    n_buckets) — so ingestion batches can be dedup-accounted without
    rescanning the corpus (the gram-df index discipline,
    operators/contamination.write_gram_df_index).  ``path/meta`` pins
    (window, mask_bits, seed, n_buckets); maintenance calls NEVER take
    geometry from callers — a mismatched chunking would silently corrupt
    every count.  ONE repartition by bucket keeps one writer task per
    directory.  An EMPTY corpus is REFUSED: a refs dir with zero parquet
    files fails schema inference on every later read — the bricked-
    work_dir trap the streaming paths guard against (review finding)."""
    spark = docs.sparkSession
    if docs.filter(F.length(text_col) > 0).limit(1).isEmpty():
        raise ValueError(
            "write_chunk_store: corpus has no non-empty documents — an "
            "empty refs dir would be unreadable (no inferable schema)")
    ch = cdc_chunks(docs, window, mask_bits, seed, text_col, id_col, source_col)
    tab = (ch.groupBy("source", "chunk")
           .agg(F.count(F.lit(1)).cast("long").alias("n_refs"))
           .withColumn("bucket",
                       F.pmod(F.xxhash64("chunk"), F.lit(int(n_buckets)))))
    tab.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket").parquet(f"{path}/refs")
    spark.createDataFrame(
        [(int(window), int(mask_bits), int(seed), int(n_buckets))],
        "window int, mask_bits int, seed bigint, n_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def _chunk_store_delta(docs: DataFrame, meta: dict, negate: bool,
                       text_col: str, id_col: str,
                       source_col: str) -> DataFrame:
    ch = cdc_chunks(docs, meta["window"], meta["mask_bits"], meta["seed"],
                    text_col, id_col, source_col)
    cnt = F.count(F.lit(1))
    return (ch.groupBy("source", "chunk")
            .agg(((-cnt) if negate else cnt).cast("long").alias("n_refs"))
            .withColumn("bucket", F.pmod(F.xxhash64("chunk"),
                                         F.lit(int(meta["n_buckets"])))))


def _merge_chunk_store(spark, path: str, delta: DataFrame, sign: int) -> int:
    """Signed touched-bucket merge (the _merge_gram_df_buckets shape):
    union delta with the base rows of the touched buckets only, sum
    per (bucket, source, chunk), localCheckpoint BEFORE the dynamic
    partition overwrite (Spark cannot overwrite a path still feeding
    the plan).  Removal: negative merged counts raise (doc set never /
    differently counted), zeros drop, emptied bucket dirs are rmtree'd
    by hand (dynamic overwrite only replaces partitions PRESENT in the
    written data).  Returns buckets rewritten."""
    buckets = [int(r["bucket"])
               for r in delta.select("bucket").distinct().collect()]
    if not buckets:
        return 0
    old = spark.read.parquet(f"{path}/refs").filter(
        F.col("bucket").isin(buckets)).select(
        F.col("bucket").cast("long").alias("bucket"), "source", "chunk",
        "n_refs")
    merged = (
        delta.select("bucket", "source", "chunk", "n_refs").unionByName(old)
        .groupBy("bucket", "source", "chunk")
        .agg(F.sum("n_refs").cast("long").alias("n_refs"))
        .select("source", "chunk", "n_refs", "bucket")
        .repartition("bucket")
        .localCheckpoint())
    emptied: list[int] = []
    if sign < 0:
        if merged.filter(F.col("n_refs") < 0).limit(1).count() > 0:
            raise ValueError(
                "remove_chunk_store: removal would drive a chunk's n_refs "
                "negative — the doc set was never (or differently) counted")
        merged = merged.filter(F.col("n_refs") > 0)
        present = {int(r["bucket"])
                   for r in merged.select("bucket").distinct().collect()}
        emptied = [b for b in buckets if b not in present]
    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("bucket").parquet(f"{path}/refs"))
    if emptied:
        import shutil

        for b in emptied:
            shutil.rmtree(f"{path}/refs/bucket={b}", ignore_errors=True)
    return len(buckets)


def append_chunk_store(new_docs: DataFrame, path: str,
                       text_col: str = "text", id_col: str = "doc_id",
                       source_col: str = "source") -> int:
    """INCREMENTAL chunk-store maintenance: chunk the batch with the
    PINNED geometry and merge its (source, chunk) counts into the
    touched buckets only.  Counts are additive over disjoint doc sets,
    so append(C, B) == rebuild(C ∪ B) row-for-row (a driver hard gate)
    and appends associate.  The ingest contract is doc disjointness —
    re-appending an already-counted doc double-counts (exact dedup is
    the caller's gate).  Not concurrent-safe with readers of the
    touched buckets."""
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    return _merge_chunk_store(
        spark, path,
        _chunk_store_delta(new_docs, meta, False, text_col, id_col,
                           source_col), 1)


def remove_chunk_store(removed_docs: DataFrame, path: str,
                       text_col: str = "text", id_col: str = "doc_id",
                       source_col: str = "source") -> int:
    """RETENTION twin of append_chunk_store: un-count departing docs
    (takedown / TTL) by the same merge with negated counts.  Refuses on
    any negative result; chunks reaching 0 refs drop; emptied bucket
    directories are deleted.  Refuses while delta commits are pending —
    the removal rewrites the BASE, and a later compaction would re-add
    what the deltas hold."""
    import glob as _glob

    if _glob.glob(f"{path}/delta/batch=*"):
        raise ValueError(
            "remove_chunk_store: pending delta commits — compact first")
    spark = removed_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    return _merge_chunk_store(
        spark, path,
        _chunk_store_delta(removed_docs, meta, True, text_col, id_col,
                           source_col), -1)


def read_chunk_store(spark, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/refs").select(
        F.col("bucket").cast("long").alias("bucket"), "source", "chunk",
        "n_refs")


def chunk_store_stats(spark, path: str) -> DataFrame:
    """Per-source dedup accounting straight from the persisted store —
    same shape and (for a store holding exactly corpus C) same VALUES as
    cdc_dedup_stats(cdc_chunks(C)): the parity the driver gates on
    across build/append/remove."""
    refs = read_chunk_store(spark, path)
    return refs.groupBy("source").agg(
        F.sum("n_refs").alias("n_chunks"),
        F.sum(F.col("n_refs") * F.length("chunk")).alias("total_chars"),
        F.count(F.lit(1)).alias("n_distinct_chunks"),
        F.sum(F.length("chunk")).alias("distinct_chars"))


# ---------------------------------------------------------------------------
# streaming ingest: exactly-once delta commits + compaction
# ---------------------------------------------------------------------------
def append_chunk_store_delta(new_docs: DataFrame, path: str,
                             batch_id: int, text_col: str = "text",
                             id_col: str = "doc_id",
                             source_col: str = "source") -> bool:
    """EXACTLY-ONCE delta commit of an ingestion batch's chunk counts
    into ``path/delta/batch={id}`` — the _SUCCESS probe IS the replay
    guard (foreachBatch is at-least-once; this write is the commit's
    ONLY effect, so redelivery skips; a torn no-_SUCCESS dir is simply
    overwritten by the retry).  The read-merge-overwrite of
    append_chunk_store is NOT replay-idempotent and belongs to planned
    maintenance, never streams (the gram-df discipline,
    operators/contamination.append_gram_df_delta)."""
    import os

    dest = f"{path}/delta/batch={int(batch_id)}"
    if os.path.exists(f"{dest}/_SUCCESS"):
        return False
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    delta = _chunk_store_delta(new_docs, meta, False, text_col, id_col,
                               source_col)
    # localCheckpoint BEFORE the emptiness probe: isEmpty + write on the
    # lazy frame would run the full chunking pass twice per micro-batch
    # (review finding).
    delta = delta.localCheckpoint(eager=True)
    if delta.isEmpty():
        return False
    delta.select("source", "chunk", "n_refs", "bucket").write.mode(
        "overwrite").parquet(dest)
    return True


def chunk_store_table(spark, path: str) -> DataFrame:
    """The LIVE chunk-ref table: compacted base plus pending delta
    commits summed per (bucket, source, chunk) — THE read-side
    definition chunk_store_stats_live composes.  With no pending deltas
    the plan is exactly the base read."""
    import glob as _glob

    base = read_chunk_store(spark, path)
    deltas = sorted(_glob.glob(f"{path}/delta/batch=*"))
    if not deltas:
        return base
    d = spark.read.parquet(*deltas).select(
        F.col("bucket").cast("long").alias("bucket"), "source", "chunk",
        "n_refs")
    return (base.unionByName(d)
            .groupBy("bucket", "source", "chunk")
            .agg(F.sum("n_refs").cast("long").alias("n_refs")))


def chunk_store_ingest_stream(stream: DataFrame, path: str,
                              checkpoint_path: str, text_col: str = "text",
                              id_col: str = "doc_id",
                              source_col: str = "source"):
    """STREAMING chunk-store maintenance: one exactly-once delta commit
    per micro-batch; readers see base + deltas live (chunk_store_table);
    compact_chunk_store folds the tail back into the bucket layout.
    Returns the started availableNow query."""
    return (stream.writeStream.foreachBatch(
        lambda bdf, bid: append_chunk_store_delta(
            bdf, path, bid, text_col, id_col, source_col))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start())


def compact_chunk_store(spark, path: str) -> int:
    """Fold pending delta commits into the bucket-partitioned base
    (touched buckets only, dynamic partition overwrite) and drop the
    delta dirs; the live table is identical before and after by
    construction.  NOT concurrent-safe with an active stream or reader
    of the touched buckets.  Returns delta commits folded."""
    import glob as _glob
    import shutil

    deltas = sorted(_glob.glob(f"{path}/delta/batch=*"))
    if not deltas:
        return 0
    d = spark.read.parquet(*deltas)
    buckets = [int(r["bucket"])
               for r in d.select("bucket").distinct().collect()]
    merged = (chunk_store_table(spark, path)
              .filter(F.col("bucket").isin(buckets))
              .select("source", "chunk", "n_refs", "bucket")
              .repartition("bucket")
              .localCheckpoint())
    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("bucket").parquet(f"{path}/refs"))
    for dd in deltas:
        shutil.rmtree(dd)
    return len(deltas)


def cdc_topk_similar_pairs(
    chunks: DataFrame,
    k: int,
    min_shared: int = 2,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_shared, n_union, jaccard_x1e9): the top-k doc
    pairs by CHUNK-SET Jaccard — ranked chunk-level near-dup retrieval.
    jaccard_x1e9 = (n_shared * 10^9) div n_union is integer-exact, and
    (jaccard DESC, doc_a ASC, doc_b ASC) pins the k-th boundary, so the
    top-k SET is a pure function of the corpus on both engines.
    Candidate pairs come from cdc_shared_chunk_pairs; per-doc chunk-set
    sizes join in from the UNCAPPED distinct sets, so with a
    ``max_chunk_df`` cap the surviving pairs' n_shared (and so jaccard)
    is a LOWER BOUND (hot chunks still count in |A|, |B| but not in the
    intersection) — exact when the cap is None (the oracle contract).
    TakeOrdered limit — no global sort."""
    if k < 1:
        raise ValueError("cdc_topk_similar_pairs: k must be >= 1")
    d = _doc_chunk_set(chunks)  # one chunking pass feeds pairs AND sizes
    pairs = cdc_shared_chunk_pairs(chunks, min_shared, max_chunk_df, _d=d)
    sizes = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("_na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("_nb"))
    return (pairs.join(na, "doc_a").join(nb, "doc_b")
            .select(
                "doc_a", "doc_b", "n_shared",
                (F.col("_na") + F.col("_nb") - F.col("n_shared"))
                .alias("n_union"))
            .withColumn("jaccard_x1e9",
                        F.expr("(n_shared * 1000000000) div n_union"))
            .orderBy(F.desc("jaccard_x1e9"), F.asc("doc_a"), F.asc("doc_b"))
            .limit(int(k)))


def chunk_novelty_against_store(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, n_chunks, n_known_chunks, known_chars): per ingestion
    doc, how much of its DISTINCT chunk set already exists in the
    persisted chunk store — chunk-level novelty scoring without
    rescanning the corpus (the novelty_against_index discipline).
    Chunking uses the PINNED store geometry; the store read prunes to
    exactly the bucket partitions the batch's chunks hash into
    (partition filter on the pmod(xxhash64) column the writer used), so
    a small batch reads a small slice of a 100 TB store.  All outputs
    exact integers; 'known' means present in ANY source."""
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    # materialize the batch's chunking once: the bucket collect AND the
    # store join both consume it (two jobs otherwise)
    dch = (cdc_chunks(new_docs, meta["window"], meta["mask_bits"],
                      meta["seed"], text_col, id_col, source_col)
           .select("doc_id", "chunk").distinct()
           .withColumn("bucket", F.pmod(F.xxhash64("chunk"),
                                        F.lit(int(meta["n_buckets"]))))
           .localCheckpoint())
    buckets = [int(r["bucket"])
               for r in dch.select("bucket").distinct().collect()]
    store = (chunk_store_table(spark, path)
             .filter(F.col("bucket").isin(buckets))
             .select("bucket", "chunk").distinct()
             .withColumn("_known", F.lit(True)))
    joined = dch.join(store, ["bucket", "chunk"], "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("_known"), 1).otherwise(0)
              ).alias("n_known_chunks"),
        F.sum(F.when(F.col("_known"), F.length("chunk")).otherwise(0)
              ).alias("known_chars"))
