"""Corpus construction: the input_hint table (doc_id, tokens:array<int32>,
n_tok:int32, source:string).

Two producers:

* ``corpus_from_documents`` — deterministic codepoint tokenization of the
  driver testdata ``documents`` table (shared definition with the DuckDB
  oracles, so results are comparable bit-for-bit).
* ``generate_corpus`` — seeded synthetic corpus mirroring the reference's
  generator families (datagenerators/Generator.java:27-75 uniform/Zipf,
  MarkovChainGenerator.java, AdversarialGenerators.java:14-93 blocks +
  De Bruijn), generated **distributed**: a range of doc ids is partitioned
  and each executor synthesizes its own docs from per-doc seeds — no driver
  materialization, so it scales to any SF.

Also ``with_global_offsets``: a scale-safe exclusive prefix sum of n_tok in
doc order (deterministic range buckets -> per-bucket subtotals -> driver
prefix -> per-bucket window sum), avoiding the single-partition shuffle a
naive ``sum() over (order by doc_id rows unbounded preceding)`` would cost.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .config import HbiConfig
from .functions import codepoint_tokens
from .sketches.hashing import splitmix64

CORPUS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"

# FIXTURES.md §1 regimes; zipf1.5 docs are ~10x longer => skewed `source`,
# exercising the explicit repartition/salting path.
SOURCES = ("uniform", "zipf1.0", "zipf1.5", "markov", "debruijn", "blocks")
_DOCS_PER_SF = 20_000  # docs at SF=1 per source


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenized corpus derived from the driver's documents table:
    tokens = UTF codepoints of text (engine-agnostic, oracle-shareable).

    The testdata parquet is a single row group, which Spark reads as ONE
    partition — that would serialize every downstream Arrow stage. Repartition
    to the session's parallelism up front (cheap: the table is small relative
    to the work per token; at real scale the source is already many files and
    this becomes a no-op coalesce guard)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    if docs.rdd.getNumPartitions() < n_part:
        docs = docs.repartition(n_part)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        codepoint_tokens("text").alias("tokens"),
        F.length("text").cast("int").alias("n_tok"),
        F.col("source"),
    )


# ---------------------------------------------------------------------------
# synthetic generator (deterministic, distributed)
# ---------------------------------------------------------------------------
def _doc_seed(global_seed: int, source: str, idx: int) -> int:
    h = np.asarray([hash_source(source) ^ (global_seed * 0x9E3779B1) ^ idx], dtype=np.uint64)
    return int(splitmix64(h)[0])


def hash_source(source: str) -> int:
    h = 0xCBF29CE484222325
    for b in source.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _zipf_tokens(rng: np.random.Generator, n: int, vocab: int, s: float) -> np.ndarray:
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    cdf = np.cumsum(ranks**-s)
    cdf /= cdf[-1]
    return np.searchsorted(cdf, rng.random(n)).astype(np.int32)


def _markov_tokens(rng: np.random.Generator, n: int, vocab: int, seed: int) -> np.ndarray:
    # order-1 chain with a seeded sparse transition structure: from state v,
    # next is one of 8 deterministic successors chosen by a seeded hash
    succ = (
        splitmix64((np.arange(vocab, dtype=np.uint64)[:, None] * np.uint64(8) + np.arange(8, dtype=np.uint64)[None, :]) ^ np.uint64(seed))
        % np.uint64(vocab)
    ).astype(np.int32)
    out = np.empty(n, dtype=np.int32)
    state = int(rng.integers(0, vocab))
    choices = rng.integers(0, 8, n)
    for i in range(n):
        state = succ[state, choices[i]]
        out[i] = state
    return out


def _debruijn_tokens(n: int, sigma: int = 4, k: int = 6, offset: int = 0) -> np.ndarray:
    # standard greedy ("prefer-largest") De Bruijn sequence B(sigma, k):
    # every k-gram occurs exactly once (AdversarialGenerators.java:42-93)
    a = [0] * (sigma * k)
    seq: list[int] = []

    def db(t: int, p: int) -> None:
        if t > k:
            if k % p == 0:
                seq.extend(a[1 : p + 1])
        else:
            a[t] = a[t - p]
            db(t + 1, p)
            for j in range(a[t - p] + 1, sigma):
                a[t] = j
                db(t + 1, t)

    db(1, 1)
    full = np.asarray(seq, dtype=np.int32)
    reps = int(np.ceil((offset + n) / len(full)))
    return np.tile(full, max(1, reps))[offset : offset + n]


def _blocks_tokens(rng: np.random.Generator, n: int, vocab: int = 16, block: int = 32) -> np.ndarray:
    # alternating homogeneous blocks (AdversarialGenerators.java:14-40)
    n_blocks = n // block + 2
    symbols = rng.integers(0, vocab, n_blocks).astype(np.int32)
    return np.repeat(symbols, block)[:n]


def generate_doc_tokens(source: str, idx: int, seed: int, vocab: int = 4096) -> np.ndarray:
    """Deterministic token array for one (source, idx) doc — pure function."""
    dseed = _doc_seed(seed, source, idx)
    rng = np.random.default_rng(dseed)
    n = int(rng.integers(64, 513))
    if source == "uniform":
        return rng.integers(0, vocab, n).astype(np.int32)
    if source == "zipf1.0":
        return _zipf_tokens(rng, n, vocab, 1.0)
    if source == "zipf1.5":
        return _zipf_tokens(rng, n * 10, vocab, 1.5)  # 10x longer: skew
    if source == "markov":
        return _markov_tokens(rng, n, 256, dseed)
    if source == "debruijn":
        return _debruijn_tokens(n, 4, 6, offset=int(rng.integers(0, 4096)))
    if source == "blocks":
        return _blocks_tokens(rng, n)
    raise ValueError(f"unknown source {source}")


def generate_corpus(
    spark: SparkSession,
    sf: float = 0.01,
    seed: int = 42,
    vocab: int = 4096,
    n_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus at scale factor ``sf``.

    spark.range partitions the id space; each executor synthesizes its own
    rows inside mapInPandas (Arrow-batched). At 1000 executors this generates
    any SF with zero driver memory — the pattern a 100 TB fixture build needs.
    """
    docs_per_source = max(4, int(_DOCS_PER_SF * sf))
    total = docs_per_source * len(SOURCES)
    n_partitions = n_partitions or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, total, 1, n_partitions)

    sources = list(SOURCES)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                src = sources[int(gid) % len(sources)]
                idx = int(gid) // len(sources)
                toks = generate_doc_tokens(src, idx, seed, vocab)
                rows.append((f"{src}-{idx:08d}", toks, len(toks), src))
            out = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])
            yield out

    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)


# ---------------------------------------------------------------------------
# global position axis
# ---------------------------------------------------------------------------
def stitch_stream_tail(
    corpus: DataFrame, need: int, out_col: str = "stitched",
    min_doc_tokens: int | None = None,
) -> DataFrame:
    """``out_col`` = each doc's tokens + the next ``need`` tokens of the
    concatenated stream — accumulated across however many FOLLOWING documents
    it takes (a single short doc in between must not break a spanning n-gram
    or match). Requires ``doc_offset``.

    Successors are found by equi-joins on doc_offset (no window function —
    scales); the number of rounds is bounded by ceil(need / min nonempty doc
    length) WITH an early exit as soon as no row is still unfinished — one
    pathological 1-token doc must not force need-many chained joins (plan
    explosion) when every other row finishes in round one. Each round
    processes only the still-unfinished rows, so for realistic corpora this
    is ONE join. Empty docs are skipped (they share their successor's offset
    and carry no tokens).

    ``min_doc_tokens``: declared minimum NONEMPTY doc length (see
    HbiConfig.min_doc_tokens). When given, the round bound comes from it and
    the per-call min(n_tok) scan is skipped — construction is then fully
    lazy. Declaring more than the true minimum can under-stitch (missed
    spanning matches); the scan is the safe default.
    """
    if need <= 0:
        return corpus.withColumn(out_col, F.col("tokens"))
    if min_doc_tokens is not None:
        min_n = int(min_doc_tokens)
    else:
        min_n = corpus.filter(F.col("n_tok") > 0).agg(F.min("n_tok")).first()[0]
    rounds = 1 if not min_n else -(-need // int(min_n))  # ceil
    succ = corpus.filter(F.col("n_tok") > 0).select(
        F.col("doc_offset").alias("_s_off"),
        F.slice("tokens", 1, need).alias("_s_toks"),  # only the head is ever used
        F.col("n_tok").alias("_s_n"),
    )
    cur = corpus.withColumn("_tail", F.array().cast("array<int>")).withColumn(
        "_end", (F.col("doc_offset") + F.col("n_tok")).cast("long")
    )
    parts: list[DataFrame] = []
    for rnd in range(max(1, rounds)):
        if rnd > 0 and cur.limit(1).isEmpty():
            break  # every row finished: skip the remaining worst-case rounds
        joined = cur.join(succ, cur["_end"] == succ["_s_off"], "left")
        ext = (
            joined.withColumn(
                "_tail",
                F.when(
                    F.col("_s_toks").isNotNull(),
                    F.concat(
                        F.col("_tail"),
                        F.slice(F.col("_s_toks"), F.lit(1), F.lit(need) - F.size("_tail")),
                    ),
                ).otherwise(F.col("_tail")),
            )
            .withColumn(
                "_end",
                F.when(F.col("_s_n").isNotNull(), F.col("_end") + F.col("_s_n")).otherwise(
                    F.col("_end")
                ),
            )
            .withColumn("_done", F.col("_s_toks").isNull() | (F.size("_tail") >= need))
            .drop("_s_off", "_s_toks", "_s_n")
        )
        parts.append(ext.filter(F.col("_done")).drop("_done"))
        cur = ext.filter(~F.col("_done")).drop("_done")
    parts.append(cur)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(out_col, F.concat("tokens", "_tail")).drop("_tail", "_end")


def _bucket_boundaries(df: DataFrame, order_col: str, n_buckets: int) -> list:
    """Deterministic range-bucket boundaries for ``order_col``: a seeded
    hash-threshold sample (pure column function — identical keys every run),
    sorted, thinned to n_buckets-1 cut points. Sample size is bounded
    (~32 keys per bucket) regardless of table size."""
    n = df.count()
    target = n_buckets * 32
    rate_ppm = max(1, min(1_000_000, (1_000_000 * target) // max(1, n)))
    keys = sorted(
        r[0]
        for r in df.filter(F.pmod(F.xxhash64(order_col), F.lit(1_000_000)) < rate_ppm)
        .select(order_col)
        .collect()
    )
    if not keys:
        return []
    step = max(1, len(keys) // n_buckets)
    return keys[step::step][: n_buckets - 1]


def with_global_offsets(
    df: DataFrame, order_col: str = "doc_id", start: int = 0, n_buckets: int | None = None
) -> DataFrame:
    """Add ``doc_offset`` = ``start`` + exclusive prefix-sum of n_tok in
    ``order_col`` order, computed without a single-partition window.

    Every step is a pure function of the row values — NOT of physical
    partition ids — so re-executing the plan (second action, lost executor,
    evicted cache) always reproduces identical offsets. (The earlier
    repartitionByRange + spark_partition_id design was unsound: Spark's
    RangePartitioner re-samples per job, so partition contents could differ
    between the totals job and the offsets job.)

    1. Deterministic range buckets: boundaries from a seeded hash sample of
       ``order_col``; bucket(row) = #boundaries <= key (ordered by key).
    2. Per-bucket token totals -> driver prefix (one tiny collect).
    3. doc_offset = bucket prefix (broadcast join) + within-bucket exclusive
       window sum, each bucket ~ |table|/n_buckets rows — no global sort.

    This is the distributed analog of the reference's global stream counter
    (PMIndex/HBI.java:215-267 `counter`). ``order_col`` must be unique per
    row (doc_id is). ``start`` continues an existing stream (incremental
    append on the global axis).
    """
    spark = df.sparkSession
    n_buckets = n_buckets or max(df.rdd.getNumPartitions(), 1)
    boundaries = _bucket_boundaries(df, order_col, n_buckets) if n_buckets > 1 else []
    if boundaries:
        barr = F.array(*[F.lit(b) for b in boundaries])
        bucket = F.size(F.filter(barr, lambda b: b <= F.col(order_col)))
    else:
        bucket = F.lit(0)
    with_b = df.withColumn("_bucket", bucket)
    totals = {
        int(r["_bucket"]): int(r["tot"])
        for r in with_b.groupBy("_bucket").agg(F.sum("n_tok").alias("tot")).collect()
    }
    prefix, acc = {}, int(start)
    for b in sorted(totals):
        prefix[b] = acc
        acc += totals[b]
    pref_df = spark.createDataFrame(
        [(b, p) for b, p in sorted(prefix.items())] or [(0, int(start))], "_bucket int, _base long"
    )
    w = Window.partitionBy("_bucket").orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return (
        with_b.join(F.broadcast(pref_df), on="_bucket")
        .withColumn(
            "doc_offset", (F.col("_base") + F.coalesce(F.sum("n_tok").over(w), F.lit(0))).cast("long")
        )
        .drop("_bucket", "_base")
    )
