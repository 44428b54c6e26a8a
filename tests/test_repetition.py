"""Gopher-style repetition metrics: value differentials vs a local Python
oracle on adversarial toy docs AND the real documents table (the DuckDB
cross-engine twin runs in tests/test_entry_contract.py)."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.repetition import (
    dup_ngram_coverage,
    merge_intervals,
    top_ngram_stats,
    word_ngram_spans,
)


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b a b c"),          # top bigram x3; overlap chain
            (2, "xx yy xx yy zz xx yy"),   # two separated islands
            (3, "one two three"),          # no dup
            (4, "a  b a  b"),              # doubled space -> empty words
            (5, "solo"),                   # < n words
            (6, ""),                       # empty text
            (7, "t t t t t t t t"),        # total repetition
        ],
        "doc_id long, text string",
    )


def _local_spans(text, n):
    if not text:  # empty text emits nothing (n_chars=0 never reaches a div)
        return []
    ws = text.split(" ")
    offs, o = [], 0
    for w in ws:
        offs.append(o)
        o += len(w) + 1
    out = []
    for i in range(len(ws) - n + 1):
        g = " ".join(ws[i:i + n])
        out.append((i, g, offs[i], offs[i + n - 1] + len(ws[i + n - 1])))
    return out


def _local_top(text, n):
    occ = {}
    for _, g, _, _ in _local_spans(text, n):
        occ[g] = occ.get(g, 0) + 1
    if not occ:
        return None
    g, c = min(occ.items(), key=lambda kv: (-kv[1], kv[0]))
    return g, c, (c * len(g) * 1_000_000) // len(text)

def _local_cov(text, n):
    occ = {}
    for _, g, s, e in _local_spans(text, n):
        occ.setdefault(g, []).append((s, e))
    spans = sorted(sp for l in occ.values() if len(l) >= 2 for sp in l)
    if not spans:
        return None
    cov, cs, ce = 0, None, None
    for s, e in spans:
        if ce is None or s > ce:
            if ce is not None:
                cov += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    cov += ce - cs
    return len(text), cov, (cov * 1_000_000) // len(text)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_spans_match_local(toy, n):
    got = {}
    for r in word_ngram_spans(toy, n).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["pos"], r["gram"], r["s"], r["e"]))
    for r in toy.collect():
        want = _local_spans(r["text"], n)
        assert sorted(got.get(r["doc_id"], [])) == sorted(want), r["doc_id"]


@pytest.mark.parametrize("n", [2, 3])
def test_top_and_coverage_match_local_toy(toy, n):
    rows = {r["doc_id"]: r["text"] for r in toy.collect()}
    top = {r["doc_id"]: (r["gram"], r["n_occ"], r["frac_x1e6"])
           for r in top_ngram_stats(toy, n).collect()}
    cov = {r["doc_id"]: (r["n_chars"], r["covered_chars"], r["frac_x1e6"])
           for r in dup_ngram_coverage(toy, n).collect()}
    assert top == {d: _local_top(t, n) for d, t in rows.items()
                   if _local_top(t, n) is not None}
    assert cov == {d: _local_cov(t, n) for d, t in rows.items()
                   if _local_cov(t, n) is not None}
    if n == 2:
        # doc 7 is pure repetition: full coverage, frac == 1e6 exactly
        assert cov[7] == (15, 15, 1_000_000)
        # doc 1's overlapping "a b"/"b a" spans merge into ONE island
        assert cov[1][1] == 11
        # doc 2 keeps two separated islands
        assert cov[2][1] == 15


def test_real_corpus_differential(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    n = 2
    top = {r["doc_id"]: (r["gram"], r["n_occ"], r["frac_x1e6"])
           for r in top_ngram_stats(docs, n).collect()}
    assert top == {d: _local_top(t, n) for d, t in rows.items()
                   if _local_top(t, n) is not None}
    cov = {r["doc_id"]: (r["n_chars"], r["covered_chars"], r["frac_x1e6"])
           for r in dup_ngram_coverage(docs, n).collect()}
    want = {d: _local_cov(t, n) for d, t in rows.items()
            if _local_cov(t, n) is not None}
    assert cov == want
    assert cov, "no duplicated bigram anywhere — vacuous fixture"


def test_merge_intervals_general(spark):
    """Variable-length interval algebra: containment, chains, ties and
    exact adjacency ([0,5)+[5,8) do NOT merge under s > prev_max? they
    DO: 5 > 5 is false -> same island; the half-open union is contiguous
    so one island of [0,8) is the correct union)."""
    rows = spark.createDataFrame(
        [
            ("a", 0, 10), ("a", 2, 3),     # contained
            ("a", 10, 12),                 # adjacent -> same island
            ("a", 20, 25), ("a", 24, 30),  # overlap chain
            ("a", 40, 41),                 # separate
            ("b", 0, 1), ("b", 0, 5),      # tie on s
        ],
        "k string, s long, e long",
    )
    got = {(r["k"], r["s"], r["e"])
           for r in merge_intervals(rows, ["k"]).collect()}
    assert got == {("a", 0, 12), ("a", 20, 30), ("a", 40, 41), ("b", 0, 5)}


def test_rejects_bad_n(toy):
    with pytest.raises(ValueError):
        word_ngram_spans(toy, 0)
