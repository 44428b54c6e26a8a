"""Corpus construction tests: schema, determinism, token-array invariant
(input_hint: the pipeline must never mutate tokens), offset correctness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.functions import (
    codepoint_tokens,
    ngram_struct,
    subsequence_positions,
    window_id,
    with_positions,
)


def test_corpus_from_documents_schema_and_tokens(spark, sf_dir):
    df = C.corpus_from_documents(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]
    rows = df.orderBy("doc_id").limit(5).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").orderBy(F.col("doc_id").cast("string")).limit(5).collect()
    by_id = {str(d["doc_id"]): d["text"] for d in docs}
    for r in rows:
        expected = [ord(ch) for ch in by_id[r["doc_id"]]]
        assert r["tokens"] == expected  # token-array equality invariant
        assert r["n_tok"] == len(expected)


def test_generate_corpus_deterministic(spark):
    a = C.generate_corpus(spark, sf=0.002, seed=42).orderBy("doc_id").collect()
    b = C.generate_corpus(spark, sf=0.002, seed=42).orderBy("doc_id").collect()
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["doc_id"] == rb["doc_id"] and ra["tokens"] == rb["tokens"]
    # partitioning must not change content (distributed-generation safety)
    c = C.generate_corpus(spark, sf=0.002, seed=42, n_partitions=3).orderBy("doc_id").collect()
    assert [r["tokens"] for r in c] == [r["tokens"] for r in a]
    # per-source regimes present; zipf1.5 docs ~10x longer (skew fixture)
    import pandas as pd

    pdf = pd.DataFrame([(r["source"], r["n_tok"]) for r in a], columns=["source", "n"])
    means = pdf.groupby("source")["n"].mean()
    assert set(means.index) == set(C.SOURCES)
    assert means["zipf1.5"] > 4 * means["uniform"]


def test_generate_doc_tokens_pure_function():
    t1 = C.generate_doc_tokens("markov", 3, 42)
    t2 = C.generate_doc_tokens("markov", 3, 42)
    assert np.array_equal(t1, t2)
    assert t1.dtype == np.int32
    # debruijn: every 6-gram within one period occurs at most once
    db = C.generate_doc_tokens("debruijn", 0, 42)
    assert set(np.unique(db)) <= {0, 1, 2, 3}


def test_with_global_offsets(spark):
    df = C.generate_corpus(spark, sf=0.002, seed=1)
    out = C.with_global_offsets(df).orderBy("doc_id").collect()
    acc = 0
    for r in out:
        assert r["doc_offset"] == acc, f"offset mismatch at {r['doc_id']}"
        acc += r["n_tok"]


def test_with_global_offsets_stable_across_actions_and_partitioning(spark):
    """Offsets must be a pure function of row values: re-executing the SAME
    uncached plan (two actions) and changing the input partitioning must both
    reproduce identical offsets. Regression for the spark_partition_id-based
    design, where a re-sampled RangePartitioner could silently shift every
    offset between jobs."""
    df = C.generate_corpus(spark, sf=0.002, seed=9, n_partitions=5)
    out = C.with_global_offsets(df)  # NOT cached: each action re-executes
    a = {r["doc_id"]: r["doc_offset"] for r in out.collect()}
    b = {r["doc_id"]: r["doc_offset"] for r in out.collect()}
    assert a == b
    repart = C.with_global_offsets(df.repartition(3), n_buckets=2)
    c = {r["doc_id"]: r["doc_offset"] for r in repart.collect()}
    assert a == c
    # exclusive-prefix correctness independently of bucket count
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    acc = 0
    for r in rows:
        assert r["doc_offset"] == acc
        acc += r["n_tok"]


def test_with_global_offsets_start_continuation(spark):
    """start= continues an existing stream: offsets of an appended batch
    equal the full-corpus offsets of the same docs."""
    full = C.generate_corpus(spark, sf=0.002, seed=4)
    old = full.filter(F.col("doc_id") < "u")   # doc_ids sort: prefix split
    new = full.filter(F.col("doc_id") >= "u")
    total_old = old.agg(F.sum("n_tok")).first()[0]
    whole = {r["doc_id"]: r["doc_offset"] for r in C.with_global_offsets(full).collect()}
    cont = {
        r["doc_id"]: r["doc_offset"]
        for r in C.with_global_offsets(new, start=int(total_old)).collect()
    }
    for did, off in cont.items():
        assert whole[did] == off


def test_functions_window_and_positions(spark):
    df = spark.createDataFrame([("d1", [10, 20, 30, 40, 50], 5, "s")], C.CORPUS_SCHEMA)
    pos = with_positions(df).select("pos", "token", window_id("pos", 2).alias("w")).collect()
    assert [(r["pos"], r["token"], r["w"]) for r in pos] == [
        (0, 10, 0), (1, 20, 0), (2, 30, 1), (3, 40, 1), (4, 50, 2)]


def test_subsequence_positions_matches_python(spark):
    data = [("a", [1, 2, 1, 2, 1], 5, "s"), ("b", [2, 2, 2], 3, "s"), ("c", [1], 1, "s")]
    df = spark.createDataFrame(data, C.CORPUS_SCHEMA)
    got = {r["doc_id"]: r["m"] for r in df.select("doc_id", subsequence_positions("tokens", [1, 2, 1]).alias("m")).collect()}
    assert got == {"a": [0, 2], "b": [], "c": []}
    # pattern longer than doc: guard against descending-sequence bug
    got2 = {r["doc_id"]: r["m"] for r in df.select("doc_id", subsequence_positions("tokens", [9, 9, 9, 9, 9, 9]).alias("m")).collect()}
    assert got2 == {"a": [], "b": [], "c": []}


def test_ngram_struct(spark):
    df = spark.createDataFrame([("a", [1, 2, 3], 3, "s")], C.CORPUS_SCHEMA)
    r = df.select(ngram_struct("tokens", 2).alias("g")).first()
    assert r["g"] == [[1, 2], [2, 3]]
    r1 = df.select(ngram_struct("tokens", 5).alias("g")).first()
    assert r1["g"] == []
