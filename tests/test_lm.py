"""Bigram LM quality scoring: model vs local reference, unseen-bigram
generalization, fixed-point determinism, cap reporting."""

import math

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators import lm as L

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text").cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def model(docs):
    return L.train_bigram_lm(docs)


def _local_model(rows, alpha):
    c2, words = {}, set()
    for t in rows:
        ws = [w for w in t.split(" ") if w]
        words.update(ws)
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1 = {}
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    v = len(words)
    return c2, c1, v


def test_model_matches_local(docs, model):
    lp, meta = model
    rows = [r["text"] for r in docs.collect()]
    c2, c1, v = _local_model(rows, 0.5)
    assert meta["v"] == v
    assert meta["stats"]["dropped_bigrams"] == 0
    assert set(lp) == set(c2)
    for k, c in c2.items():
        assert lp[k] == math.log((c + 0.5) / (c1[k[0]] + 0.5 * v))


def test_scores_match_local(docs, model):
    lp, meta = model
    got = {r["doc_id"]: (r["n_pairs"], r["logprob_x1e9"],
                         r["avg_logprob_x1e9"])
           for r in L.doc_lm_scores(docs, lp, meta).collect()}
    scaled = {k: int(math.floor(x * 1e9 + 0.5)) for k, x in lp.items()}
    for r in docs.collect():
        ws = [w for w in r["text"].split(" ") if w]
        if len(ws) < 2:
            assert r["doc_id"] not in got
            continue
        s = sum(scaled[(a, b)] for a, b in zip(ws, ws[1:]))
        n = len(ws) - 1
        assert got[r["doc_id"]] == (n, s, int(s / n) if s >= 0
                                    else -((-s) // n) if (-s) % n == 0
                                    else -((-s) // n + 1) + 1)


def test_unseen_bigrams_scoreable(spark, docs, model):
    lp, meta = model
    new = spark.createDataFrame(
        [("n1", "zzzq wwwk zzzq"), ("n2", "table zzzq")],
        "doc_id string, text string")
    got = {r["doc_id"]: r for r in L.doc_lm_scores(new, lp, meta).collect()}
    assert set(got) == {"n1", "n2"}
    # unseen pairs score the smoothed floor: ln(a / (c1 + a*V)) < 0
    assert got["n1"]["logprob_x1e9"] < 0
    # seen-context unseen-continuation ('table' has context mass) is
    # LESS likely than its seen continuations but still finite
    assert got["n2"]["n_pairs"] == 1


def test_cap_reported(docs):
    lp, meta = L.train_bigram_lm(docs, cap=10)
    assert meta["stats"]["kept_bigrams"] == 10
    assert meta["stats"]["dropped_bigrams"] == \
        meta["stats"]["distinct_bigrams"] - 10
    assert len(lp) == 10
