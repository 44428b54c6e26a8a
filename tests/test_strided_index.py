"""Strided n-gram index (cfg.stride > 1): n-x smaller key space, exact
answers preserved via alignment-class probing."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import (
    brute_force_search,
    build_index,
    pattern_search,
)

CFG_S = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=21, ngram=3, stride=3)


@pytest.fixture(scope="module")
def corp(spark):
    df = C.generate_corpus(spark, sf=0.002, seed=21).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def idx(spark, corp):
    df = build_index(corp, CFG_S).cache()
    df.count()
    return df


def _rows(df):
    return sorted((r["doc_id"], r["pos"]) for r in df.collect())


def test_strided_index_is_smaller(spark, corp, idx):
    dense = build_index(corp, CFG_S.with_(stride=1))
    strided_items = idx.agg(F.sum("n_items")).first()[0]
    dense_items = dense.agg(F.sum("n_items")).first()[0]
    assert strided_items * 2.5 < dense_items  # ~3x fewer keys indexed


@pytest.mark.parametrize("plen", [8, 16, 40])
def test_strided_exact_answers(spark, corp, idx, plen):
    rows = corp.filter(F.col("n_tok") >= plen + 16).orderBy("doc_id").limit(3).collect()
    for i, r in enumerate(rows):
        # deliberately unaligned starts (i mod stride varies)
        pat = r["tokens"][i + 3 : i + 3 + plen]
        got = _rows(pattern_search(corp, idx, CFG_S, pat))
        exp = _rows(brute_force_search(corp, pat))
        assert got == exp and len(exp) >= 1, f"plen={plen} i={i}"


def test_strided_missing_pattern(spark, corp, idx):
    row = corp.filter(F.col("n_tok") >= 24).first()
    pat = list(row["tokens"][:12])
    pat[6] = 99_999
    assert _rows(pattern_search(corp, idx, CFG_S, pat)) == []


def test_strided_short_pattern_falls_back(spark, corp, idx):
    # m - n + 1 < stride for m=3,n=3,stride=3 (one gram, but alignment classes
    # 1 and 2 are empty) => brute-force fallback, still exact
    row = corp.filter(F.col("n_tok") >= 8).first()
    pat = list(row["tokens"][2:5])
    got = _rows(pattern_search(corp, idx, CFG_S, pat))
    exp = _rows(brute_force_search(corp, pat))
    assert got == exp and len(exp) >= 1
