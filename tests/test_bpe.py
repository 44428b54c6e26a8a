"""BPE tokenizer: classic-example merges, encode/decode round trip,
char conservation, determinism, graceful degradation on unseen text."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators import bpe as B

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text").cache()
    d.count()
    return d


def test_classic_sennrich_merges():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = B._train_merges_local(wc, 4)
    # es=9 and st=9 tie -> lexicographically smallest pair first; after
    # (e,s) the st mass moves to (es,t)=9 which beats we(8-6)=2, lo=7, ow=7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert ("l", "o") in merges[2:] or ("o", "w") in merges[2:]


def test_encode_word_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B._encode_word("lowest", ranks) == ["low", "est"]
    assert B._encode_word("stes", ranks) == ["s", "t", "es"]
    assert B._encode_word("x", ranks) == ["x"]
    assert B._encode_word("zzz", ranks) == ["z", "z", "z"]


def test_train_encode_decode_roundtrip(spark, docs):
    merges, stats = B.bpe_train(docs, n_merges=60)
    assert stats["n_merges"] == 60 and stats["dropped_words"] == 0
    enc = B.bpe_encode_words(docs, merges)
    back = {r["doc_id"]: r["text"] for r in B.bpe_decode(enc).collect()}
    for r in docs.collect():
        canon = " ".join(w for w in r["text"].split(" ") if w)
        assert back[r["doc_id"]] == canon, r["doc_id"]


def test_unseen_text_roundtrip(spark):
    # unicode, unseen chars, single chars — merges from an unrelated corpus
    rows = [("u1", "héllo wörld"), ("u2", "a b c"), ("u3", "zzzzzz")]
    d = spark.createDataFrame(rows, "doc_id string, text string")
    merges = [("l", "o"), ("lo", "w")]
    back = {r["doc_id"]: r["text"]
            for r in B.bpe_decode(B.bpe_encode_words(d, merges)).collect()}
    assert back == dict(rows)


def test_char_conservation_and_counts(spark, docs):
    merges, _ = B.bpe_train(docs, n_merges=40)
    enc = B.bpe_encode(docs, merges)
    got = enc.select(
        "doc_id", "n_tokens",
        F.aggregate("tokens", F.lit(0),
                    lambda a, t: a + F.length(t)).alias("tok_chars"),
        F.size("tokens").alias("sz")).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in got:
        words = [w for w in texts[r["doc_id"]].split(" ") if w]
        assert r["tok_chars"] == sum(len(w) for w in words)
        assert r["n_tokens"] == r["sz"]
        # merges only ever shrink the token count vs characters
        assert r["n_tokens"] <= sum(len(w) for w in words)


def test_train_deterministic(spark, docs):
    a, _ = B.bpe_train(docs, n_merges=30)
    b, _ = B.bpe_train(docs, n_merges=30)
    assert a == b


def test_distributed_encode_matches_local(spark, docs):
    merges, _ = B.bpe_train(docs, n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: list(r["tokens"])
           for r in B.bpe_encode(docs, merges).collect()}
    for r in docs.collect():
        want = []
        for w in r["text"].split(" "):
            if w:
                want.extend(B._encode_word(w, ranks))
        assert got[r["doc_id"]] == want


def test_vocab_cap_reported(spark, docs):
    merges, stats = B.bpe_train(docs, n_merges=10, vocab_cap=5)
    assert stats["trained_on"] == 5
    assert stats["dropped_words"] == stats["distinct_words"] - 5
    assert len(merges) == 10


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        B.bpe_train(docs, n_merges=0)
    with pytest.raises(ValueError):
        B.bpe_train(docs, n_merges=5, vocab_cap=0)


def test_model_persistence_roundtrip(spark, docs, tmp_path):
    merges, stats = B.bpe_train(docs, n_merges=40)
    path = str(tmp_path / "model")
    B.write_bpe_model(spark, path, merges, stats)
    back = B.read_bpe_model(spark, path)
    assert back == merges
    a = sorted((r["doc_id"], tuple(r["tokens"]))
               for r in B.bpe_encode(docs, merges).collect())
    b = sorted((r["doc_id"], tuple(r["tokens"]))
               for r in B.bpe_encode(docs, back).collect())
    assert a == b


def test_encode_stream_parity_and_replay(spark, docs, tmp_path):
    work = str(tmp_path)
    merges, stats = B.bpe_train(docs, n_merges=30)
    B.write_bpe_model(spark, f"{work}/model", merges, stats)
    d = docs.select("doc_id", "text")
    d.filter(F.col("doc_id").cast("long") % 2 == 0) \
        .write.mode("overwrite").parquet(f"{work}/in")
    d.filter(F.col("doc_id").cast("long") % 2 == 1) \
        .write.mode("append").parquet(f"{work}/in")

    def drain(chk):
        stream = spark.readStream.schema(d.schema).option(
            "maxFilesPerTrigger", "1").parquet(f"{work}/in")
        q = B.bpe_encode_stream(stream, f"{work}/model", f"{work}/out", chk)
        assert q.awaitTermination(120)

    drain(f"{work}/chk1")
    got = sorted((r["doc_id"], tuple(r["tokens"]), r["n_tokens"])
                 for r in spark.read.parquet(f"{work}/out")
                 .drop("batch_id").collect())
    want = sorted((r["doc_id"], tuple(r["tokens"]), r["n_tokens"])
                  for r in B.bpe_encode(d, merges).collect())
    assert got == want and got
    # full-replay drill: fresh checkpoint redelivers; replay guard holds
    drain(f"{work}/chk2")
    again = sorted((r["doc_id"], tuple(r["tokens"]), r["n_tokens"])
                   for r in spark.read.parquet(f"{work}/out")
                   .drop("batch_id").collect())
    assert again == got
