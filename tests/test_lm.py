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


# ---------------------------------------------------------------------------
# persisted model + incremental scoring
# ---------------------------------------------------------------------------
def test_write_read_roundtrip_equals_train(spark, docs, model, tmp_path):
    """read_lm_model reconstructs EXACTLY what train_bigram_lm returns on
    the same corpus — same lp floats (same ints through the same glibc ln),
    same c1/v/alpha — so persisted scoring == in-memory scoring."""
    lp, meta = model
    path = str(tmp_path / "lm")
    stats = L.write_lm_model(docs, path)
    lp2, meta2 = L.read_lm_model(spark, path)
    assert lp2 == lp
    assert meta2["c1"] == meta["c1"]
    assert (meta2["v"], meta2["alpha"]) == (meta["v"], meta["alpha"])
    assert stats == meta["stats"]


def test_read_cap_is_deterministic_cut(spark, docs, model, tmp_path):
    """A cap below the distinct-bigram count keeps the top bigrams by
    (count DESC, pair ASC) — identical to training with that cap."""
    path = str(tmp_path / "lm_cap")
    L.write_lm_model(docs, path, cap=100)
    lp_r, meta_r = L.read_lm_model(spark, path)
    lp_t, meta_t = L.train_bigram_lm(docs, cap=100)
    assert lp_r == lp_t and meta_r["c1"] == meta_t["c1"]
    assert meta_r["stats"]["kept_bigrams"] == 100
    assert meta_r["stats"]["dropped_bigrams"] > 0


def test_incremental_scores_match_inmemory(spark, docs, tmp_path):
    """score_against_lm on a batch the model never saw == doc_lm_scores
    with the in-memory model trained on the same split (unseen bigrams
    take the smoothed closed form on both paths)."""
    train = docs.filter(F.col("doc_id").cast("long") % 5 != 0)
    batch = docs.filter(F.col("doc_id").cast("long") % 5 == 0)
    path = str(tmp_path / "lm_inc")
    L.write_lm_model(train, path)
    got = sorted(map(tuple, L.score_against_lm(spark, batch, path).collect()))
    lp, meta = L.train_bigram_lm(train)
    want = sorted(map(tuple, L.doc_lm_scores(batch, lp, meta).collect()))
    assert got == want and len(got) > 0


def test_lm_stream_equals_batch(spark, docs, tmp_path):
    train = docs.filter(F.col("doc_id").cast("long") % 5 != 0)
    batch = docs.filter(F.col("doc_id").cast("long") % 5 == 0)
    model_path = str(tmp_path / "lm_s")
    L.write_lm_model(train, model_path)
    inp = str(tmp_path / "in")
    half = F.col("doc_id").cast("long") % 2
    batch.filter(half == 0).write.mode("overwrite").parquet(inp)
    batch.filter(half == 1).write.mode("append").parquet(inp)
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1").parquet(inp)
    q = L.lm_score_stream(stream, model_path, str(tmp_path / "out"),
                          str(tmp_path / "chk"))
    assert q.awaitTermination(300)
    got = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "out")).drop("batch_id").collect()))
    want = sorted(map(tuple, L.score_against_lm(
        spark, batch, model_path).collect()))
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# model lifecycle maintenance: append/remove == retrain from scratch
# ---------------------------------------------------------------------------
def _tables(spark, path):
    bg = sorted(map(tuple, spark.read.parquet(f"{path}/bigrams").collect()))
    wd = sorted(map(tuple, spark.read.parquet(f"{path}/words").collect()))
    mt = spark.read.parquet(f"{path}/meta").first()
    return bg, wd, (mt["alpha"], mt["cap"], mt["vocab"], mt["distinct_bigrams"])


def test_append_equals_scratch(spark, docs, tmp_path):
    third = F.col("doc_id").cast("long") % 3
    a, b = docs.filter(third != 0), docs.filter(third == 0)
    p1 = str(tmp_path / "m1")
    L.write_lm_model(a, p1)
    L.append_lm_model(b, p1)
    p2 = str(tmp_path / "m2")
    L.write_lm_model(docs, p2)
    assert _tables(spark, p1) == _tables(spark, p2)
    assert L.read_lm_model(spark, p1)[0] == L.read_lm_model(spark, p2)[0]


def test_remove_equals_scratch_on_complement(spark, docs, tmp_path):
    third = F.col("doc_id").cast("long") % 3
    keep, gone = docs.filter(third != 0), docs.filter(third == 0)
    p1 = str(tmp_path / "m1")
    L.write_lm_model(docs, p1)
    L.remove_lm_model(gone, p1)
    p2 = str(tmp_path / "m2")
    L.write_lm_model(keep, p2)
    assert _tables(spark, p1) == _tables(spark, p2)


def test_remove_foreign_docs_refuses(spark, docs, tmp_path):
    third = F.col("doc_id").cast("long") % 3
    p = str(tmp_path / "m")
    L.write_lm_model(docs.filter(third != 0), p)
    with pytest.raises(ValueError, match="below zero"):
        # removing the whole corpus from a model trained on 2/3 of it
        L.remove_lm_model(docs, p)
