"""Deduplication operators for large-scale training corpora.

Beyond reference parity (SURVEY is an index/sketch library), these are the
document-level dedup primitives a 100 TB pipeline needs, built on the same
kernel toolbox:

* exact duplicates            — hash groupBy (one shuffle of 8-byte keys)
* n-gram Jaccard (exact)      — shingle co-occurrence join; the oracle
* MinHash + LSH banding       — the scale path: candidates meet only inside
                                 tiny band buckets, never all-pairs
* SimHash                     — Hamming-ball near-dup via chunk banding

Scale notes: all-pairs comparisons only ever happen WITHIN an LSH bucket or
between exact-Jaccard candidates that already share a shingle. The shuffles
move (key, doc_id) pairs, not documents. Signatures are computed in one
Arrow-batched numpy pass per partition.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..sketches.hashing import hash64, splitmix64

_U64 = np.uint64


def cap_bucket_sizes(buckets: DataFrame, key_cols, cap: int | None, what: str) -> DataFrame:
    """Drop every bucket with more than ``cap`` members before a
    within-bucket self-join — the guard against the one degenerate key that
    turns a bucketed O(sum k_i^2) join into a single-task k^2 explosion at
    scale (a ubiquitous shingle, a bucket full of near-zero vectors, a
    corpus of byte-identical docs).

    NEVER silent: when the cap engages, the dropped buckets are counted
    (one extra aggregation job over the bucket keys — only paid when a cap
    is configured) and logged at WARNING with the membership they covered.
    ``cap=None`` disables (exact/oracle paths). Dropping a bucket can only
    LOSE candidate pairs (recall), never invent them — downstream exact
    verification is unaffected."""
    if cap is None:
        return buckets
    key_cols = list(key_cols)
    sizes = buckets.groupBy(*key_cols).agg(F.count("*").alias("_bsz"))
    over = sizes.filter(F.col("_bsz") > cap).cache()
    stats = over.agg(
        F.count("*").alias("n_buckets"), F.sum("_bsz").alias("n_members")
    ).first()
    if stats["n_buckets"]:
        import logging

        logging.getLogger(__name__).warning(
            "%s: bucket-size cap %d engaged — dropping %d oversized bucket(s) "
            "covering %d members from candidate generation (pairs inside them "
            "are NOT considered; raise the cap or pre-split if this is load-"
            "bearing)", what, cap, stats["n_buckets"], stats["n_members"],
        )
        drop = over.select(*key_cols)
        if stats["n_buckets"] <= 100_000:
            drop = F.broadcast(drop)
        out = buckets.join(drop, on=key_cols, how="left_anti")
    else:
        out = buckets
    over.unpersist()
    return out


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------
def char_shingle_hashes(text: str, n: int = 5) -> np.ndarray:
    """Distinct char n-gram hashes of a string, vectorized (bytes -> packed
    uint64 windows -> splitmix). n <= 8 so a shingle packs into one word."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < n:
        b = np.pad(b, (0, n - len(b)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(b, n).astype(np.uint64)
    packed = np.zeros(len(win), dtype=np.uint64)
    for i in range(n):
        packed = (packed << _U64(8)) | win[:, i]
    return np.unique(splitmix64(packed))


def winnowing_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_fp_df: int | None = None,
) -> DataFrame:
    """MOSS-style similarity pairs (doc_a < doc_b, shared) — documents
    sharing >= ``min_shared`` winnowing fingerprints (Schleimer et al.; the
    plagiarism/boilerplate detector built on text.winnowing_fingerprints).
    Guarantee inherited from winnowing: any shared substring of length
    >= k + window - 1 contributes a shared fingerprint, so long-overlap
    pairs are never missed; ``shared`` is an exact count over the selected
    fingerprint sets (each doc's set is distinct).

    Pairs materialize only through a co-occurrence join on fingerprint
    value — no all-pairs stage. ``max_fp_df`` caps join-eligible
    fingerprints (a boilerplate fingerprint shared by f docs emits f^2
    rows; drops are LOGGED via cap_bucket_sizes, recall-only). None =
    exact (the oracle setting)."""
    from .text import winnowing_fingerprints

    fp = (
        winnowing_fingerprints(docs, k=k, window=window, text_col=text_col, id_col=id_col)
        .select("doc_id", F.explode("fps").alias("fp"))
    )
    if max_fp_df is not None:
        fp = cap_bucket_sizes(fp, ["fp"], max_fp_df, "winnowing_pairs")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= int(min_shared))
    )


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------
def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (dup_key, n_dups, doc_ids),
    keyed by xxhash64 so the shuffle carries 8-byte keys, not documents."""
    return (
        docs.select(F.xxhash64(text_col).alias("dup_key"), F.col(id_col))
        .groupBy("dup_key")
        .agg(F.count("*").alias("n_dups"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (the oracle; quadratic only within shared shingles)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Pairs (doc_a < doc_b, jaccard) with char-n-gram Jaccard >= threshold.

    Exact: |A∩B| via a co-occurrence self-join on shingle hash, |A∪B| from
    set sizes. Pairs sharing no shingle never materialize.

    ``max_shingle_df``: document-frequency cap on join-eligible shingles —
    a shingle shared by k docs emits k^2 co-occurrence rows, so one
    ubiquitous shingle (a whitespace run, a boilerplate header) is a
    single-key shuffle explosion at scale. Shingles above the cap are
    dropped from BOTH the intersection and the set sizes (Jaccard over the
    surviving shingle universe — still symmetric and well-defined), and the
    drop is LOGGED (cap_bucket_sizes). None = exact (the oracle setting).
    """
    def shingles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                h = char_shingle_hashes(txt, n)
                ids.extend([did] * len(h))
                hs.extend(h.astype(np.int64))
            yield pd.DataFrame({"doc_id": ids, "sh": hs})

    sh = docs.select(id_col, text_col).mapInPandas(shingles, schema="doc_id string, sh long")
    if max_shingle_df is not None:
        # shingle hashes are distinct per doc, so count(*) per sh IS the df
        sh = cap_bucket_sizes(sh, ["sh"], max_shingle_df, "ngram_jaccard_pairs")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signatures(
    docs: DataFrame,
    n_perm: int = 128,
    shingle_n: int = 5,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig array<long>): sig[i] = min over shingles of h_i(shingle).

    Vectorized: one (n_shingles, n_perm) hash matrix per doc via seeded
    SplitMix64 re-mixing of the base shingle hashes — no per-row Python.
    The per-doc matrix (~len(text) x n_perm) is deliberately the unit of
    work: it fits L2 and a round-5 experiment showed a cross-doc
    reduceat-batched variant 2x SLOWER at these shapes (segment-min along
    axis 0 defeats the contiguous inner loop).

    The (id, text) projection is REBALANCED before the Arrow pass when the
    source has fewer partitions than the session's parallelism: the
    documents table often arrives as one small parquet file, which silently
    serialized the whole CPU-heavy signature pass onto one core (measured
    ~1.7 s of the old 2.6 s call at sf0.1; the _build_global_axis lesson).
    Well-partitioned inputs are left untouched — no shuffle added at scale.
    """
    perm_seeds = splitmix64(np.arange(n_perm, dtype=np.uint64) ^ _U64(seed * 0x9E3779B1))

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_sigs = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                h = char_shingle_hashes(txt, shingle_n)
                # h_i(x) = splitmix(x ^ seed_i): (n_shingles, n_perm)
                mat = splitmix64(h[:, None] ^ perm_seeds[None, :])
                out_ids.append(did)
                out_sigs.append(mat.min(axis=0).astype(np.int64))
            yield pd.DataFrame({"doc_id": out_ids, "sig": out_sigs})

    src = docs.select(id_col, text_col)
    par = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(sigs, schema="doc_id string, sig array<long>")


def band_buckets(sig: DataFrame, bands: int, n_perm: int) -> DataFrame:
    """(doc_id, band, bh) LSH bucket rows of a signature table: bh =
    xxhash64 of the band's signature slice. THE one band-hash definition —
    within-corpus pairs, the persisted index, and incremental queries all
    bucket through here, so their candidate sets are mutually consistent.
    bands must divide n_perm: bands > n_perm would make every band slice
    EMPTY (one constant hash — the whole corpus in one bucket, silently
    degrading LSH to the all-pairs join it exists to avoid), and a
    non-divisor would silently drop the trailing permutations."""
    if bands < 1 or n_perm % bands != 0:
        raise ValueError(
            f"band_buckets: bands ({bands}) must be >= 1 and divide "
            f"n_perm ({n_perm})")
    rows = n_perm // bands
    band_cols = F.explode(
        F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice("sig", b * rows + 1, rows)).alias("bh"),
            )
            for b in range(bands)
        ])
    ).alias("bs")
    return sig.select("doc_id", band_cols).select("doc_id", "bs.band", "bs.bh")


def _verify_jaccard(paired: DataFrame, shingle_n: int, threshold: float,
                    a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Exact-Jaccard verification of CANDIDATE pairs only (never all-pairs):
    input (a_col, b_col, text_a, text_b), output (a_col, b_col, jaccard)
    for survivors — one Arrow stage."""

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            js = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                ha = char_shingle_hashes(ta, shingle_n)
                hb = char_shingle_hashes(tb, shingle_n)
                inter = len(np.intersect1d(ha, hb, assume_unique=True))
                js.append(inter / (len(ha) + len(hb) - inter))
            out = pdf[[a_col, b_col]].copy()
            out["jaccard"] = np.round(np.asarray(js), 6)
            yield out[np.asarray(js) >= threshold]

    return paired.mapInPandas(
        verify, schema=f"{a_col} string, {b_col} string, jaccard double")


def _join_texts(cand: DataFrame, a_src: DataFrame, b_src: DataFrame,
                text_col: str, id_col: str,
                a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Attach each candidate side's text (a from a_src, b from b_src)."""
    ta = a_src.select(F.col(id_col).alias(a_col),
                      F.col(text_col).alias("text_a"))
    tb = b_src.select(F.col(id_col).alias(b_col),
                      F.col(text_col).alias("text_b"))
    return cand.join(ta, a_col).join(tb, b_col)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 5,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified by exact Jaccard.

    bands * rows = n_perm; candidate pairs collide on at least one band hash
    (P[candidate] ~= 1-(1-j^rows)^bands). Survivors are re-checked with the
    EXACT shingle Jaccard, so false-positive candidates never reach the
    output — only LSH false negatives (missed pairs) remain, which the recall
    test bounds. Scale: bucket join shuffles (band_hash, doc_id) only.
    """
    # localCheckpoint, not cache(): the signature table is self-join'd and
    # joined again by verification, so materializing once is right — but a
    # .cache() here outlives the call (CacheManager entries are never
    # auto-dropped; CLAUDE.md records a cache leak evicting the corpus
    # cache and 10x-ing later queries), while a localCheckpoint's backing
    # RDD is cleaned by the ContextCleaner when this frame is GC'd
    sig = minhash_signatures(
        docs, n_perm, shingle_n, seed, text_col, id_col).localCheckpoint()
    buckets = band_buckets(sig, bands, n_perm)
    buckets = cap_bucket_sizes(buckets, ["band", "bh"], max_bucket, "minhash_lsh_pairs")
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    paired = _join_texts(cand, docs, docs, text_col, id_col)
    return _verify_jaccard(paired, shingle_n, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# Persisted MinHash index + incremental near-dup (new batch vs corpus)
# ---------------------------------------------------------------------------
def write_minhash_index(
    docs: DataFrame,
    path: str,
    n_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 5,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist a corpus's MinHash signatures so ingestion batches can be
    near-dup-checked WITHOUT re-shingling the corpus: ``path/sigs`` holds
    (doc_id, sig) parquet in the doc-SHARDED layout (sources/io.
    write_index_doc_sharded — partitioned by a hash shard of doc_id, so a
    per-doc takedown rewrites only its shard directories); ``path/meta``
    pins the signature geometry (n_perm, bands, shingle_n, seed) — queries
    MUST reuse it or buckets are meaningless, so readers take params from
    here, never from callers. Band buckets are NOT materialized: deriving
    them is a narrow JVM slice+xxhash64 pass over sigs, and storing sigs
    once instead of bands x buckets keeps the index n_perm * 8 bytes/doc."""
    if bands < 1 or n_perm % bands != 0:
        # validate at WRITE time: a bad geometry pinned in meta poisons
        # every later query against this index
        raise ValueError(
            f"write_minhash_index: bands ({bands}) must be >= 1 and "
            f"divide n_perm ({n_perm})")
    from ..sources.io import write_index_doc_sharded

    spark = docs.sparkSession
    sig = minhash_signatures(docs, n_perm, shingle_n, seed, text_col, id_col)
    write_index_doc_sharded(sig, f"{path}/sigs", id_col="doc_id")
    spark.createDataFrame(
        [(int(n_perm), int(bands), int(shingle_n), int(seed))],
        "n_perm int, bands int, shingle_n int, seed int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def read_minhash_index(spark, path: str) -> tuple[DataFrame, dict]:
    """(signatures DataFrame, meta dict) of a write_minhash_index layout."""
    from ..sources.io import read_index_doc_sharded

    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    return read_index_doc_sharded(spark, f"{path}/sigs"), meta


def takedown_minhash_index(spark, path: str, doc_ids) -> int:
    """Per-doc removal from a persisted MinHash index (retention /
    right-to-be-forgotten): drops the removed docs' signature rows,
    rewriting only the shard directories they hash into
    (sources/io.takedown_doc_index). Signatures are a pure per-doc
    function of text, so the post-takedown index is byte-equal to
    rebuilding over the remaining corpus — a driver parity gate. Returns
    shards rewritten (0 = no removed id was present; replay-idempotent).
    After takedown, neardup_against_index can no longer pair any batch
    with a removed doc — its buckets are derived from sigs at query time
    and the rows are gone."""
    from ..sources.io import takedown_doc_index

    return takedown_doc_index(spark, f"{path}/sigs", doc_ids)


def neardup_against_index(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    path: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """INCREMENTAL near-dup: (new_id, corpus_id, jaccard) pairs between an
    ingestion batch and an ALREADY-INDEXED corpus — the crawl-dedup op
    that must not rescan 100 TB per batch. Only the new batch is shingled;
    the corpus side is the persisted signature table. Candidates collide
    in band buckets exactly as minhash_lsh_pairs would have found them in
    a full run (band_buckets is the shared definition), then exact-Jaccard
    verification decides — corpus TEXT is touched only for candidates
    (``corpus_docs`` is the text source; the join key pushes down to its
    scan). Pairs within the new batch are out of scope — that is
    minhash_lsh_pairs on the batch. A doc_id present on both sides is
    excluded (re-ingestion is not a near-dup of itself).

    Scale: new-side buckets are batch-sized; the bucket join shuffles
    (band, bh, doc_id) rows only; ``max_bucket`` caps degenerate corpus
    buckets (drop-with-log, the cap_bucket_sizes discipline)."""
    spark = new_docs.sparkSession
    sig_old, meta = read_minhash_index(spark, path)
    sig_new = minhash_signatures(
        new_docs, meta["n_perm"], meta["shingle_n"], meta["seed"],
        text_col, id_col)
    b_new = band_buckets(sig_new, meta["bands"], meta["n_perm"]).alias("a")
    b_old = cap_bucket_sizes(
        band_buckets(sig_old, meta["bands"], meta["n_perm"]),
        ["band", "bh"], max_bucket, "neardup_against_index",
    ).alias("b")
    cand = (
        b_new.join(
            b_old,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("new_id"),
                F.col("b.doc_id").alias("corpus_id"))
        .distinct()
    )
    paired = _join_texts(cand, new_docs, corpus_docs, text_col, id_col,
                         "new_id", "corpus_id")
    return _verify_jaccard(paired, meta["shingle_n"], threshold,
                           "new_id", "corpus_id")


def incremental_neardup_stream(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
):
    """Structured-Streaming twin of neardup_against_index: each micro-batch
    of arriving docs is checked against the persisted corpus index and the
    surviving pairs appended to ``out_path`` parquet. foreachBatch is
    at-least-once, so a REPLAY GUARD probes the output for the batch_id
    before appending (the streaming/incremental.py doc-axis discipline:
    without it a crash between append and checkpoint commit doubles the
    batch). Cross-batch new-new pairs are out of scope by the same
    contract as the batch op. Returns the StreamingQuery."""
    from ..streaming.incremental import replay_guarded_append

    def step(batch_df: DataFrame, batch_id: int) -> None:
        replay_guarded_append(
            out_path, batch_df, batch_id,
            lambda b: neardup_against_index(
                b, corpus_docs, index_path, threshold,
                text_col, id_col, max_bucket,
            ),
        )

    return (
        stream_docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def simhash_signatures(
    docs: DataFrame, shingle_n: int = 4, seed: int = 7, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc: sign of the per-bit sum of shingle hashes."""

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, out = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                h = hash64(char_shingle_hashes(txt, shingle_n), seed)
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U64(1)).astype(np.int64)
                acc = (2 * bits - 1).sum(axis=0)
                word = _U64(0)
                for i in np.where(acc > 0)[0]:
                    word |= _U64(1) << _U64(int(i))
                ids.append(did)
                out.append(np.int64(word.astype(np.int64)))
            yield pd.DataFrame({"doc_id": ids, "simhash": out})

    return docs.select(id_col, text_col).mapInPandas(sig, schema="doc_id string, simhash long")


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    shingle_n: int = 4,
    seed: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= max_hamming via chunk banding:
    split 64 bits into max_hamming+1 chunks — any pair within distance d
    agrees exactly on >= 1 chunk (pigeonhole), so candidates collide on a
    (chunk_id, chunk_value) bucket; exact Hamming re-check after.

    ``max_bucket`` bounds the in-bucket self-join (a corpus slice of
    near-identical docs puts them ALL in one (chunk, value) bucket — k^2
    candidates on one shuffle key); oversized buckets are dropped WITH a
    warning (cap_bucket_sizes), costing recall only."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sig = simhash_signatures(docs, shingle_n, seed, text_col, id_col).cache()
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright("simhash", c * width).bitwiseAND(F.lit((1 << width) - 1)).alias("cv"),
                )
                for c in range(n_chunks)
            ])
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk", "ch.cv")
    chunks = cap_bucket_sizes(chunks, ["chunk", "cv"], max_bucket, "simhash_near_pairs")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return cand.select("doc_a", "doc_b", "hamming")


def lexical_cosine_pairs(
    docs: DataFrame,
    threshold: tuple[int, int] = (4, 5),
    max_word_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT weighted-cosine near-dup pairs over word-COUNT vectors — the
    magnitude-aware twin of the set-based family (jaccard counts presence,
    cosine counts repetition): pairs (doc_a < doc_b) with
    cos(a, b) >= t_num/t_den, decided WITHOUT float sqrt via the squared
    integer inequality  (dot * t_den)^2 >= t_num^2 * |a|^2 * |b|^2
    (both sides DECIMAL(38,0) — bigint products of two squared norms
    overflow; sign-safe since every factor is non-negative). Output
    (doc_a, doc_b, dot, na2, nb2) — all exact integers, so the cross-
    engine twin is an equality, not a float tolerance.

    Word semantics: RAW single-space split with empties dropped (the
    bm25/tfidf corpus discipline). The ``max_word_df`` cap drops hot
    ubiquitous words from CANDIDATE GENERATION ONLY — candidate pairs are
    the distinct pairs sharing >= 1 surviving word (the winnowing
    max_fp_df discipline, logged via cap_bucket_sizes), and the dot
    product is then recomputed EXACTLY over the candidates from the
    UNCAPPED vectors, so every emitted (dot, na2, nb2) is the true value
    and the threshold test never sees a truncated dot. The only loss is
    recall of pairs whose EVERY shared word is hot. None = exact path.

    Scale shape: one explode + one (doc, word) groupBy builds the sparse
    vectors; candidate generation is a word-bucketed self-join bounded by
    sum df^2 over surviving words (cap-bounded at scale like every
    blocking surface here); the exact-dot verify joins only the candidate
    pairs back to the vectors — bounded by pairs x doc vocabulary."""
    t_num, t_den = threshold
    if not (0 < t_num <= t_den):
        raise ValueError(f"lexical_cosine_pairs: need 0 < t_num <= t_den, got {threshold}")
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != F.lit(""))
    wc = (docs.select(F.col(id_col).alias("doc_id"), F.explode(ws).alias("word"))
          .groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
          .localCheckpoint())  # feeds norms + candidates + both verify sides
    norms = wc.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("n2"))
    cand = cap_bucket_sizes(wc, ["word"], max_word_df, "lexical_cosine_pairs")
    a, b = cand.alias("a"), cand.alias("b")
    capped_join = a.join(
        b, (F.col("a.word") == F.col("b.word"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
    if max_word_df is None:
        # exact path: cand == wc, so the self-join aggregate IS the true
        # dot — no distinct / re-join round trip needed
        dots = (capped_join
                .groupBy(F.col("a.doc_id").alias("doc_a"),
                         F.col("b.doc_id").alias("doc_b"))
                .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot")))
    else:
        # capped path: the cap bounds CANDIDATE GENERATION only — the dot
        # is recomputed exactly over the candidate pairs from the UNCAPPED
        # vectors (a capped-frame dot would silently truncate hot-word
        # mass and could reject true pairs)
        pairs = (capped_join
                 .select(F.col("a.doc_id").alias("doc_a"),
                         F.col("b.doc_id").alias("doc_b"))
                 .distinct())
        pa = wc.select(F.col("doc_id").alias("doc_a"), "word",
                       F.col("cnt").alias("_ca"))
        pb = wc.select(F.col("doc_id").alias("doc_b"), "word",
                       F.col("cnt").alias("_cb"))
        dots = (
            pairs.join(pa, "doc_a").join(pb, ["doc_b", "word"])
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("dot"))
        )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    dec = "decimal(38,0)"
    return (
        dots.join(na, "doc_a").join(nb, "doc_b")
        .filter(
            (F.col("dot").cast(dec) * t_den) * (F.col("dot").cast(dec) * t_den)
            >= F.lit(t_num * t_num).cast(dec)
            * F.col("na2").cast(dec) * F.col("nb2").cast(dec))
        .select("doc_a", "doc_b", "dot", "na2", "nb2")
    )


# ---------------------------------------------------------------------------
# near-dup clusters: pairs -> connected components -> canonical doc
# ---------------------------------------------------------------------------
def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in MapReduce
    and Beyond"): every neighbor v > u re-attaches to m(u) = min of u's
    neighborhood (incl. u). One groupBy + one join per round; edges only —
    never the documents."""
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (nbrs.groupBy("u").agg(F.min("v").alias("_mn"))
         .select("u", F.least("_mn", F.col("u")).alias("m")))
    return (
        nbrs.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient every edge toward its larger endpoint, then
    attach each node's SMALLER neighbors (and itself) to their minimum."""
    o = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = o.groupBy("u").agg(F.min("v").alias("m"))
    re_attached = (
        o.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return re_attached.union(m.select("u", F.col("m").alias("v"))).distinct()


def connected_components(pairs: DataFrame, left: str = "doc_a", right: str = "doc_b",
                         max_iter: int = 30) -> DataFrame:
    """(doc_id, cluster_id) for every node of ``pairs``: cluster_id = the
    MINIMUM node id in its connected component (deterministic canonical
    representative). Alternating large-star / small-star rounds converge in
    O(log^2 n) — each round is one groupBy + one join over EDGES (near-dup
    pairs), never documents, so the shuffle volume is |pairs|, independent
    of corpus size. The label-propagation alternative pays O(diameter)
    rounds — a duplicate CHAIN (a~b~c~...) at 100 TB can be very deep, which
    is exactly what star contraction collapses exponentially.

    Each round is localCheckpoint'ed: iterative plan chaining otherwise
    grows lineage exponentially (the cascade trap in operators/route.py).
    Raises if the edge set has not stabilized after ``max_iter`` rounds
    (loud, not silently-partial clusters)."""
    edges = (
        pairs.select(F.col(left).alias("u"), F.col(right).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    if edges.rdd.isEmpty():
        return pairs.sparkSession.createDataFrame(
            [], "doc_id string, cluster_id string")

    def _sig(e: DataFrame):
        # order-free set fingerprint; summing raw 64-bit hashes overflows
        # under ANSI mode, so sum the two 32-bit halves separately
        h = F.xxhash64("u", "v")
        r = e.agg(
            F.count("*").alias("n"),
            F.sum(F.shiftright(h, 32)).alias("hi"),
            F.sum(h.bitwiseAND(F.lit(0xFFFFFFFF))).alias("lo"),
        ).first()
        return (r["n"], r["hi"], r["lo"])

    prev = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        cur = _sig(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # converged: edges form stars (node -> component minimum); roots map to
    # themselves (a root never appears as a left endpoint of a star edge)
    nodes = (
        pairs.select(F.col(left).alias("doc_id"))
        .union(pairs.select(F.col(right).alias("doc_id")))
        .distinct()
    )
    assign = edges.groupBy("u").agg(F.min("v").alias("cluster_id"))
    return (
        nodes.join(assign, nodes["doc_id"] == assign["u"], "left")
        .select("doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id"))
    )


def dedup_clusters(pairs: DataFrame, left: str = "doc_a", right: str = "doc_b") -> DataFrame:
    """(doc_id, cluster_id, cluster_sz, is_canonical) — the keep/drop list a
    dedup pipeline actually consumes: connected components over the near-dup
    pair graph, canonical = the cluster's minimum doc_id. Keep the canonical
    row per cluster, drop the rest."""
    cc = connected_components(pairs, left, right)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_sz"))
    return cc.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_sz",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def neardup_canonical_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left: str = "doc_a",
    right: str = "doc_b",
) -> DataFrame:
    """The corpus AFTER near-dup clustering: docs in no pair pass through,
    and of each connected component only the minimum-id member survives —
    the manifest a dedup pipeline writes shards from (the near-dup
    counterpart of contamination.clean_corpus's exact-dedup leg). Columns
    = ``docs``'s, untouched. Shapes: the cluster computation is
    connected_components' edge-only shuffles (O(log^2) rounds); the final
    cut is a left-anti join on ids only — the corpus text never moves."""
    losers = (
        dedup_clusters(pairs, left, right)
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id").alias("__loser_id"))
    )
    return docs.join(
        losers, docs[id_col] == losers["__loser_id"], "left_anti"
    )


def triangle_counts(pairs: DataFrame, left: str = "doc_a",
                    right: str = "doc_b") -> DataFrame:
    """Per-node TRIANGLE counts over an undirected pair graph — the local
    clustering signal that separates a genuine duplicate CLIQUE (every
    member pairs with every other: triangles everywhere) from a chain of
    borderline matches linked by one hub (no triangles). Dedup pipelines
    use it to decide whether a connected component is safe to collapse to
    one keeper or needs human review. Returns (doc_id, n_triangles) for
    every node in >= 1 triangle; each triangle credits all 3 corners.

    Algorithm: degree-ordered edge orientation (Cohen / Suri-Vassilvitskii
    MapReduce triangle counting) — every edge points from the lower
    (degree, id) endpoint to the higher, making the graph a DAG where each
    triangle has EXACTLY one node with two out-edges. Wedge generation is
    a self-join on that apex node, bounded by sum(out_deg^2) <= O(m^1.5)
    TOTAL regardless of skew — a hub of degree d contributes d wedges as a
    spoke, not d^2, because its edges point INTO it. The closing-edge
    check is one more equi-join. All joins are edge-keyed shuffles; no
    adjacency list ever materializes per node."""
    e = (
        pairs.select(
            F.least(F.col(left), F.col(right)).alias("u"),
            F.greatest(F.col(left), F.col(right)).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select("v"))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): a -> b with (d_a, a) < (d_b, b); carry both
    # endpoint degrees so the wedge ordering below needs no extra join
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    ukey = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    vkey = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, vkey).otherwise(ukey).alias("bkey"),
    )
    w1 = oriented.select("a", F.col("b").alias("x"), F.col("bkey").alias("xk"))
    w2 = oriented.select("a", F.col("b").alias("y"), F.col("bkey").alias("yk"))
    wedges = w1.join(w2, "a").filter(F.col("xk") < F.col("yk")).select(
        "a", "x", "y")
    closing = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select("a", "x", "y")
    corners = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select("x"))
        .unionAll(tri.select("y"))
    )
    return corners.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles"))


# ---------------------------------------------------------------------------
# exact all-pairs Jaccard join via prefix filtering (AllPairs / PPJoin)
# ---------------------------------------------------------------------------


def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str,
    set_col: str,
    threshold: float,
    max_bucket: int | None = 1_000_000,
) -> DataFrame:
    """EXACT all pairs with ``J(toks_a, toks_b) >= threshold`` — the
    deterministic scale path the MinHash/LSH surfaces approximate, via
    PREFIX FILTERING (Chaudhuri et al. SSJoin / Bayardo et al. AllPairs):

    order every set's tokens by GLOBAL rarity (document frequency asc,
    token asc — rarest first; the (df, tok) TUPLE is the total order, so no
    contiguous global rank / single-partition pass is ever built), and
    index only each set's first ``|x| - ceil(t*|x|) + 1`` tokens.  If
    ``J >= t`` then ``|x ∩ y| >= ceil(t*max(|x|,|y|))`` (J >= t forces the
    intersection over the union, which contains the larger set), and the
    globally-SMALLEST common token must sit within the first
    ``|s| - |x∩y| + 1`` positions of BOTH sets (all other common tokens
    rank above it), i.e. inside both prefixes — so the prefix-token
    equi-join loses no qualifying pair.  Size filter
    ``ceil(t*|x|) <= |y| <= floor(|x|/t)`` (a J necessary condition) cuts
    candidates before the verify; the exact intersection decides with
    RATIONAL arithmetic (``inter * den >= num * uni`` with threshold =
    num/den via Fraction(str(t)) — no float boundary drift between
    engines).

    Output: (id_col + '_a', id_col + '_b', n_inter, n_union, jaccard) with
    a < b, each qualifying pair exactly once.  Duplicate tokens in a set
    collapse; empty sets and NULL ids never pair.  ``max_bucket`` REFUSES
    (loudly, never truncates — this surface is exact) when one prefix
    token would block more than that many sets: a degenerate corpus makes
    ANY token-sharing join quadratic, and the honest answers are a rarer
    tokenization upstream or the LSH path.
    """
    from fractions import Fraction

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator

    a_id, b_id = f"{id_col}_a", f"{id_col}_b"
    base = (
        df.where(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("_id"),
                F.array_distinct(F.col(set_col)).alias("_toks"))
        .withColumn("_s", F.size("_toks"))
        .where(F.col("_s") > 0)
    )
    ex = base.select("_id", F.explode("_toks").alias("_tok"))
    dfreq = ex.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    # re-collect each set sorted by (df, tok); one shuffle join + one groupBy
    ordered = (
        ex.join(dfreq, "_tok")
        .groupBy("_id")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("_df", "_tok"))),
            lambda x: x["_tok"]).alias("_ord"))
        .withColumn("_s", F.size("_ord"))
    )
    # prefix length p = s - ceil(t*s) + 1  (ceil via exact integer `div` —
    # float division would drift at large s, the engine-wide discipline)
    ceil_ts = F.expr(f"(({num} * _s + {den} - 1) div {den})")
    prefix = ordered.select(
        "_id", "_s",
        F.slice("_ord", 1, (F.col("_s") - ceil_ts + 1).cast("int")).alias("_p"),
    ).select("_id", "_s", F.explode("_p").alias("_tok"))
    if max_bucket is not None:
        top = (prefix.groupBy("_tok").agg(F.count(F.lit(1)).alias("n"))
               .agg(F.max("n")).first()[0])
        if top is not None and top > max_bucket:
            raise ValueError(
                f"jaccard_prefix_pairs: a prefix token blocks {top} sets "
                f"(cap {max_bucket}) — the candidate join would be quadratic "
                "in that bucket; raise max_bucket knowingly, use a rarer "
                "tokenization, or take the LSH path")
    left = prefix.select(F.col("_id").alias(a_id), F.col("_s").alias("_sa"), "_tok")
    right = prefix.select(F.col("_id").alias(b_id), F.col("_s").alias("_sb"), "_tok")
    cand = (
        left.join(right, "_tok")
        .where((F.col(a_id) < F.col(b_id))
               # size filter: ceil(t*sa) <= sb and ceil(t*sb) <= sa
               & (F.lit(num) * F.col("_sa") <= F.lit(den) * F.col("_sb"))
               & (F.lit(num) * F.col("_sb") <= F.lit(den) * F.col("_sa")))
        .select(a_id, b_id)
        .distinct()
    )
    ta = base.select(F.col("_id").alias(a_id), F.col("_toks").alias("_ta"),
                     F.col("_s").alias("_na"))
    tb = base.select(F.col("_id").alias(b_id), F.col("_toks").alias("_tb"),
                     F.col("_s").alias("_nb"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    uni = F.col("_na") + F.col("_nb") - F.col("_inter")
    return (
        cand.join(ta, a_id).join(tb, b_id)
        .withColumn("_inter", inter)
        .withColumn("_uni", uni)
        .where(F.lit(den) * F.col("_inter") >= F.lit(num) * F.col("_uni"))
        .select(
            a_id, b_id,
            F.col("_inter").cast("long").alias("n_inter"),
            F.col("_uni").cast("long").alias("n_union"),
            (F.col("_inter").cast("double") / F.col("_uni")).alias("jaccard"),
        )
    )


def leakage_safe_splits(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    splits: dict,
    seed: int,
    left: str = "doc_a",
    right: str = "doc_b",
    out_col: str = "split",
    rep_cast: str = "long",
) -> DataFrame:
    """CLUSTER-AWARE train/val/test assignment — the guard against the
    best-documented form of benchmark leakage in LLM training data:
    hashing each DOCUMENT id into a split puts near-duplicate documents on
    both sides of the train/test fence, so held-out loss is silently
    memorized.  Here every near-dup COMPONENT (connected_components over
    the pair graph — large-star/small-star, edge-only shuffles) is
    assigned as a unit: the split key is the component's canonical
    representative (cluster_id = component min; singletons represent
    themselves), pushed through the same deterministic u64 hash-space
    range partition as ``sampling.split_column`` — so assignment is a pure
    function of (component, seed): stable under dataset growth, identical
    on any cluster size, and members of one component CANNOT straddle
    splits (they share the key).

    ``pairs`` is any near-dup pair table (exact Jaccard, LSH, semantic —
    whatever the pipeline trusts); ``rep_cast`` is the dtype the
    representative hashes through (ids castable to long keep the
    SplitMix64 SQL twin available).  Returns ``docs`` + ``out_col``.
    """
    from .sampling import split_column

    cc = dedup_clusters(pairs, left, right).select(
        F.col("doc_id").alias(id_col), "cluster_id")
    tagged = docs.join(cc, id_col, "left").withColumn(
        "_rep", F.coalesce(F.col("cluster_id"), F.col(id_col)).cast(rep_cast))
    return split_column(tagged, "_rep", splits, seed, out_col=out_col).drop(
        "_rep", "cluster_id")
