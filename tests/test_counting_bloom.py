"""Deletable global Bloom index: the counting maintenance artifact's bitset
VIEW is byte-equal to the ordinary global build — before AND after content
takedown — so every search surface serves from the view unchanged, and the
takedown argument reduces to byte-identity with a scratch build over the
survivors."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
from hierarchical_bloom_filter_index_spark.operators.build import (
    _build_global_axis,
    _sum_counting_pairs,
    build_global_counting_index,
    counting_index_view,
    takedown_global_counting_index,
)

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=12)


def _rows(df):
    return {(r["level"], r["w_id"]): (bytes(r["bloom"]), r["n_items"], r["bits_set"])
            for r in df.collect()}


@pytest.fixture(scope="module")
def gcorp(spark):
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=12)).cache()
    corp.count()
    yield corp
    corp.unpersist()


def test_counting_view_byte_equals_build(spark, gcorp):
    cnt = build_global_counting_index(gcorp, CFG)
    assert _rows(counting_index_view(cnt)) == _rows(_build_global_axis(gcorp, CFG))


def test_counting_view_byte_equals_build_ngram(spark, gcorp):
    # stitched stream boundaries go through the same key pipeline
    cfg3 = CFG.with_(ngram=3)
    cnt = build_global_counting_index(gcorp, cfg3)
    assert _rows(counting_index_view(cnt)) == _rows(_build_global_axis(gcorp, cfg3))


def test_counting_takedown_byte_equals_scratch(spark, gcorp):
    cnt = build_global_counting_index(gcorp, CFG).cache()
    removed = gcorp.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0)
    survivors = gcorp.join(removed.select("doc_id"), "doc_id", "left_anti")
    assert 0 < removed.count() < gcorp.count()
    after = takedown_global_counting_index(cnt, removed, CFG)
    assert _rows(counting_index_view(after)) == _rows(_build_global_axis(survivors, CFG))
    # removing EVERYTHING empties the index (every node drops, none go negative)
    assert takedown_global_counting_index(cnt, gcorp, CFG).count() == 0
    with pytest.raises(ValueError, match="doc_offset"):
        takedown_global_counting_index(cnt, removed.drop("doc_offset"), CFG)
    cnt.unpersist()


def test_counting_pair_kernel_guards():
    import numpy as np
    from hierarchical_bloom_filter_index_spark.operators.build import _pack_counting

    a = _pack_counting(64, 2, 7, 3, np.array([1, 5, 9]), np.array([2, 1, 3]))
    b = _pack_counting(64, 2, 7, 1, np.array([5]), np.array([1]))
    m, k, s, ni, pos, cnt = _sum_counting_pairs([a, b], negate_after_first=True)
    assert (ni, list(pos), list(cnt)) == (2, [1, 9], [2, 3])
    # subtracting a never-counted position refuses
    c = _pack_counting(64, 2, 7, 1, np.array([6]), np.array([1]))
    with pytest.raises(ValueError, match="never counted"):
        _sum_counting_pairs([a, c], negate_after_first=True)
    # over-removal refuses
    d = _pack_counting(64, 2, 7, 2, np.array([5]), np.array([4]))
    with pytest.raises(ValueError, match="negative"):
        _sum_counting_pairs([a, d], negate_after_first=True)
    # incompatible geometry refuses
    e = _pack_counting(128, 2, 7, 1, np.array([5]), np.array([1]))
    with pytest.raises(ValueError, match="incompatible"):
        _sum_counting_pairs([a, e])


def test_counting_append_byte_equals_scratch(spark, gcorp):
    from hierarchical_bloom_filter_index_spark.operators.build import (
        append_global_counting_index,
    )

    docs = gcorp.orderBy("doc_id")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    cut = len(ids) // 2
    old = gcorp.filter(F.col("doc_id").isin(ids[:cut]))
    new = gcorp.filter(F.col("doc_id").isin(ids[cut:])).drop("doc_offset")
    n_old = old.agg(F.sum("n_tok")).first()[0]
    base = build_global_counting_index(old, CFG)
    appended = append_global_counting_index(base, new, CFG, int(n_old))
    scratch = build_global_counting_index(gcorp, CFG)

    def cmap(df):
        return {(r["level"], r["w_id"]): (bytes(r["counts"]), r["n_items"])
                for r in df.collect()}

    assert cmap(appended) == cmap(scratch)
    with pytest.raises(ValueError, match="boundary tail"):
        append_global_counting_index(base, new, CFG.with_(ngram=3), int(n_old))
