"""n-gram-keyed index (cfg.ngram > 1): the reference's primary mode indexes
sliding n-grams rather than raw symbols (utilities/RingBuffer.java:48-77,
search/Pattern.java:29-45). Answers must stay exact."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import (
    brute_force_search,
    build_index,
    pattern_search,
)

CFG2 = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=13, ngram=2)


@pytest.fixture(scope="module")
def corp(spark):
    df = C.generate_corpus(spark, sf=0.002, seed=13).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def idx(spark, corp):
    df = build_index(corp, CFG2).cache()
    df.count()
    return df


def _rows(df):
    return sorted((r["doc_id"], r["pos"]) for r in df.collect())


def test_ngram_index_exact_answers(spark, corp, idx):
    rows = corp.filter(F.col("n_tok") >= 64).orderBy("doc_id").limit(3).collect()
    for i, r in enumerate(rows):
        pat = r["tokens"][i * 7 : i * 7 + 12]
        got = _rows(pattern_search(corp, idx, CFG2, pat))
        exp = _rows(brute_force_search(corp, pat))
        assert got == exp and len(exp) >= 1


def test_ngram_index_missing_pattern(spark, corp, idx):
    row = corp.first()
    pat = list(row["tokens"][:10])
    pat[5] = 99_999
    assert _rows(pattern_search(corp, idx, CFG2, pat)) == []


def test_pattern_shorter_than_n_falls_back_to_scan(spark, corp, idx):
    tok = int(corp.first()["tokens"][0])
    got = _rows(pattern_search(corp, idx, CFG2, [tok]))
    exp = _rows(brute_force_search(corp, [tok]))
    assert got == exp and len(exp) >= 1


def test_token_arrays_never_mutated(spark, corp, idx):
    """input_hint invariant: running the full pipeline must not change the
    corpus token arrays (compare against a fresh deterministic generation)."""
    fresh = C.generate_corpus(spark, sf=0.002, seed=13)
    a = {r["doc_id"]: r["tokens"] for r in corp.collect()}
    b = {r["doc_id"]: r["tokens"] for r in fresh.collect()}
    assert a == b
