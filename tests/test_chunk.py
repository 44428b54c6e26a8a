"""Document chunking: geometry vs local reference, coverage/reassembly
invariants, empty docs, validation."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.chunk import (
    chunk_by_chars, chunk_by_words)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    extra = spark.createDataFrame(
        [("tiny", "ab"), ("exact", "x" * 10), ("empty", "")],
        "doc_id string, text string")
    d = base.unionByName(extra).cache()
    d.count()
    return d


def _char_ref(text, size, overlap):
    stride = size - overlap
    return [(i, s, text[s:s + size])
            for i, s in enumerate(range(0, max(len(text), 0), stride))]


def test_chars_matches_reference(spark, docs):
    size, overlap = 10, 3
    got = {}
    for r in chunk_by_chars(docs, size, overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["char_start"], r["chunk"]))
    for r in docs.collect():
        want = _char_ref(r["text"], size, overlap)
        assert sorted(got.get(r["doc_id"], [])) == want, r["doc_id"]
    assert "empty" not in got
    assert got["tiny"] == [(0, 0, "ab")]


def test_chars_reassembly(spark, docs):
    # overlap=0 chunks concatenate back to the original text
    got = {}
    for r in chunk_by_chars(docs, 7, 0).orderBy("doc_id", "chunk_idx") \
            .collect():
        got.setdefault(r["doc_id"], []).append(r["chunk"])
    for r in docs.collect():
        if r["text"]:
            assert "".join(got[r["doc_id"]]) == r["text"]


def test_words_matches_reference(spark, docs):
    size, overlap = 6, 2
    stride = size - overlap
    got = {}
    for r in chunk_by_words(docs, size, overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["word_start"], r["chunk"], r["n_words"]))
    for r in docs.collect():
        ws = [w for w in r["text"].split(" ") if w]
        want = [(i, s, " ".join(ws[s:s + size]), min(len(ws) - s, size))
                for i, s in enumerate(range(0, len(ws), stride))]
        assert sorted(got.get(r["doc_id"], [])) == want, r["doc_id"]


def test_words_full_coverage(spark, docs):
    # every word index lands in >= 1 chunk; with overlap o, interior
    # words land in ceil(size/stride) chunks at most
    size, overlap = 5, 2
    r = chunk_by_words(docs, size, overlap)
    per = r.groupBy("doc_id").agg(
        F.max(F.col("word_start") + F.col("n_words")).alias("covered"))
    ws = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "),
                        lambda w: w != F.lit(""))).alias("n"))
    j = per.join(ws, "doc_id").collect()
    assert j
    for row in j:
        assert row["covered"] == row["n"]


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        chunk_by_chars(docs, 0)
    with pytest.raises(ValueError):
        chunk_by_chars(docs, 5, 5)
    with pytest.raises(ValueError):
        chunk_by_words(docs, 5, -1)
