"""Global axis with n-gram (and strided) keys: boundary-crossing n-grams are
indexed via build-time stitching, so cross-doc matches stay findable."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
from hierarchical_bloom_filter_index_spark.operators import build_index, global_pattern_search

from tests.test_global_search import _brute, _global_stream


@pytest.fixture(scope="module")
def setup(spark):
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=55)).cache()
    corp.count()
    stream = _global_stream(corp.collect())
    return corp, stream


@pytest.mark.parametrize("ngram,stride", [(2, 1), (3, 3)])
def test_global_ngram_cross_doc_match(spark, setup, ngram, stride):
    corp, stream = setup
    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=55,
                    axis="global", ngram=ngram, stride=stride)
    idx = build_index(corp, cfg).cache()
    idx.count()
    row2 = corp.orderBy("doc_id").limit(2).collect()[1]
    b = row2["doc_offset"]
    cases = [
        stream[b - 6 : b + 6].tolist(),   # straddles the doc boundary
        stream[1000 : 1012].tolist(),     # interior
        stream[b - 1 : b + 9].tolist(),   # 1 token before boundary
    ]
    for pat in cases:
        got = sorted(r["gpos"] for r in global_pattern_search(corp, idx, cfg, pat).collect())
        assert got == _brute(stream, pat), f"ngram={ngram} stride={stride} pat@{pat[:3]}"
    # missing
    pat = stream[50:62].tolist()
    pat[6] = 99_999
    assert global_pattern_search(corp, idx, cfg, pat).count() == 0
    idx.unpersist()
