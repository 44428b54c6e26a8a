"""Char-diversity (Renyi-2 collision) quality metrics: value differentials
vs a local Python oracle on adversarial toy docs AND the real documents
table (the DuckDB cross-engine twin runs in tests/test_entry_contract.py)."""

from collections import Counter

import pytest

from hierarchical_bloom_filter_index_spark.operators.text import (
    char_diversity_stats,
    low_diversity_report,
)


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [
            (1, "aaaa"),            # single char: collision = 1e9 exactly
            (2, "abcd"),            # uniform: collision = 1e9/4
            (3, "aab"),             # 5/9 -> floor
            (4, ""),                # empty: defined as all-zero row
            (5, "naïve 世界"),  # multi-byte codepoints
            (6, "ab" * 500),        # long doc, 2 chars
        ],
        "doc_id long, text string",
    )


def _local(text):
    if not text:
        return (0, 0, 0, 0)
    c = Counter(text)
    n = len(text)
    ss = sum(v * v for v in c.values())
    return (n, len(c), max(c.values()), ss * 10**9 // (n * n))


def test_matches_local_oracle(toy):
    got = {
        r["doc_id"]: (r["n_chars"], r["distinct_chars"], r["top_char_count"],
                      r["collision_x1e9"])
        for r in char_diversity_stats(toy).collect()
    }
    want = {r["doc_id"]: _local(r["text"]) for r in toy.collect()}
    assert got == want
    assert got[1][3] == 10**9          # degenerate doc pegs the scale
    assert got[2][3] == 10**9 // 4     # uniform 4-char alphabet


def test_real_corpus_differential(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    got = {
        r["doc_id"]: (r["n_chars"], r["distinct_chars"], r["top_char_count"],
                      r["collision_x1e9"])
        for r in char_diversity_stats(docs).collect()
    }
    for row in docs.collect():
        assert got[row["doc_id"]] == _local(row["text"])


def test_report_flags_and_totals(spark, toy):
    src = toy.withColumn(
        "source",
        (toy["doc_id"] % 2 == 0).cast("string"),
    )
    rep = {r["source"]: r for r in
           low_diversity_report(src, 400_000_000, 3).collect()}
    # odd group: doc 1 (collision 1e9) + doc 3 (coll 5/9e9 >= 4e8) flagged,
    # doc 5 diverse -> 2 of 3 flagged
    assert rep["false"]["n_docs"] == 3 and rep["false"]["n_flagged"] == 2
    # even group: doc 2 uniform (2.5e8, 4 distinct) ok; doc 4 empty has
    # 0 distinct chars < 3 -> flagged; doc 6 two-char alphabet: coll 5e8
    # AND distinct 2 < 3 -> flagged once
    assert rep["true"]["n_docs"] == 3 and rep["true"]["n_flagged"] == 2
    assert rep["false"]["max_collision_x1e9"] == 10**9
