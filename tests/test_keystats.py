"""Column-level key-set statistics (operators/keystats.py): KMV overlap
values vs a numpy re-derivation, HLL set-ops exact/dense regimes, exact
heavy values vs brute force (skew, collisions-only-add, refusal edges)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.keystats import (
    _OVERLAP_SEED,
    column_heavy_hitters,
    key_bottomk,
    key_overlap,
    key_setops,
)
from hierarchical_bloom_filter_index_spark.sketches.hashing import hash64


@pytest.fixture(scope="module")
def kframes(spark):
    # A: 0..599 with duplicates (each key 1 + k%3 times) and NULLs;
    # B: 400..999 each twice — overlap = {400..599}, |A∪B| = 1000
    a = (spark.range(600)
         .select(F.col("id").alias("k"),
                 (F.col("id") % 3 + 1).alias("reps"))
         .select(F.explode(F.sequence(F.lit(1), F.col("reps"))).alias("_i"), "k")
         .select(F.when(F.col("k") == 7, F.lit(None)).otherwise(F.col("k")).alias("k")))
    b = (spark.range(600).select((F.col("id") + 400).alias("rk"))
         .unionAll(spark.range(600).select((F.col("id") + 400).alias("rk"))))
    return a.persist(), b.persist()


def _np_bottomk(keys: np.ndarray, k: int, seed: int):
    """Reference bottom-k over a distinct key set (same hash kernel)."""
    keys = np.unique(keys.astype(np.int64))
    prios = hash64(keys.astype(np.uint64), seed)
    order = np.argsort(prios)
    return keys[order][:k].astype(np.uint64), np.sort(prios)[:k]


def test_key_bottomk_matches_numpy(spark, kframes):
    a, _ = kframes
    sk = key_bottomk(a, "k", 32)
    keys_np, prios_np = _np_bottomk(
        np.array([r["k"] for r in a.where(F.col("k").isNotNull()).collect()]),
        32, _OVERLAP_SEED)
    assert np.array_equal(np.sort(sk.sample()), np.sort(keys_np))
    assert np.array_equal(sk.prios, prios_np)


def test_key_overlap_values_vs_numpy(spark, kframes):
    a, b = kframes
    k = 64
    res = key_overlap(a, "k", b, "rk", k=k)
    ka = np.unique(np.array(
        [r["k"] for r in a.where(F.col("k").isNotNull()).collect()]))
    kb = np.unique(np.array([r["rk"] for r in b.collect()]))
    union = np.union1d(ka, kb)
    uk, up = _np_bottomk(union, k, _OVERLAP_SEED)
    in_both = np.isin(uk.astype(np.int64), ka) & np.isin(uk.astype(np.int64), kb)
    assert res["n_sample"] == len(uk) == k
    assert res["n_match"] == int(in_both.sum())
    assert res["est_jaccard"] == in_both.sum() / len(uk)
    assert res["exact"] is False  # union has 1000 > 64 distinct keys
    # estimator sanity at this k: within 3x the ~1/sqrt(k) envelope
    true_j = len(np.intersect1d(ka, kb)) / len(union)
    assert abs(res["est_jaccard"] - true_j) <= 3.0 / np.sqrt(k)


def test_key_overlap_exact_small_union(spark):
    a = spark.createDataFrame([(i,) for i in range(20)], "k bigint")
    b = spark.createDataFrame([(i + 10,) for i in range(20)], "rk bigint")
    res = key_overlap(a, "k", b, "rk", k=256)
    assert res["exact"] is True
    assert res["n_sample"] == 30 and res["n_match"] == 10
    assert res["est_jaccard"] == 10 / 30
    assert res["est_distinct_a"] == 20.0 and res["est_distinct_b"] == 20.0


def test_key_setops_exact_regime(spark, kframes):
    a, b = kframes
    res = key_setops(a, "k", b, "rk")  # auto-p: sparse-exact by construction
    assert res["exact"] is True
    assert res["est_a"] == 599.0  # 600 minus the NULLed key 7
    assert res["est_b"] == 600.0
    assert res["est_union"] == 999.0
    assert res["est_intersect"] == 200.0
    assert (1 << res["p"]) // 8 >= 1399  # covers max side row count


def test_key_setops_dense_regime_bound(spark, kframes):
    a, b = kframes
    res = key_setops(a, "k", b, "rk", p=8)  # sparse cap 32 << 599 distinct
    assert res["exact"] is False
    rel = 3 * 1.04 / np.sqrt(1 << 8)
    assert abs(res["est_union"] - 999.0) <= rel * 999.0
    assert abs(res["est_a"] - 599.0) <= rel * 599.0


def test_key_setops_autowidth_refusal(spark, kframes):
    a, b = kframes
    with pytest.raises(ValueError, match="explicit p"):
        key_setops(a, "k", b, "rk", max_exact_bytes=64)


def test_key_setops_empty_side(spark, kframes):
    a, b = kframes
    res = key_setops(a, "k", b.where(F.col("rk") < 0), ("rk", "rk")[0])
    assert res["exact"] is True
    assert res["est_b"] == 0.0 and res["est_union"] == res["est_a"] == 599.0
    assert res["est_intersect"] == 0.0


@pytest.fixture(scope="module")
def skewed(spark):
    # value v repeated 2^(9-v) times for v in 0..9: n=1023, v=0 is 50%
    rows = [(v,) for v in range(10) for _ in range(1 << (9 - v))]
    return spark.createDataFrame(rows, "v int").persist()


def _brute_heavy(df, col, num, den):
    total = df.where(F.col(col).isNotNull()).count()
    return sorted(
        (r[col], r["n"]) for r in
        df.where(F.col(col).isNotNull()).groupBy(col)
          .agg(F.count(F.lit(1)).alias("n"))
          .where(F.col("n") * den >= num * total).collect())


def test_column_heavy_hitters_exact(spark, skewed):
    for num, den in [(1, 4), (1, 10), (1, 100), (1, 2), (1, 1)]:
        got = sorted((r["v"], r["n_rows"])
                     for r in column_heavy_hitters(skewed, "v", num, den).collect())
        assert got == _brute_heavy(skewed, "v", num, den), (num, den)


def test_column_heavy_hitters_none_pass(spark):
    df = spark.createDataFrame([(i % 50,) for i in range(500)], "v int")
    # uniform 2% each, threshold 10% -> empty
    assert column_heavy_hitters(df, "v", 1, 10).count() == 0


def test_column_heavy_hitters_strings(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = sorted((r["event_type"], r["n_rows"]) for r in
                 column_heavy_hitters(ev, "event_type", 1, 5).collect())
    assert got == _brute_heavy(ev, "event_type", 1, 5)


def test_column_heavy_hitters_nulls_and_bounds(spark):
    df = spark.createDataFrame([(1,), (1,), (None,), (2,)], "v int")
    got = sorted((r["v"], r["n_rows"]) for r in
                 column_heavy_hitters(df, "v", 1, 2).collect())
    assert got == [(1, 2)]  # NULLs excluded from n_total and output
    with pytest.raises(ValueError, match="fraction"):
        column_heavy_hitters(df, "v", 3, 2)
    with pytest.raises(ValueError, match="fraction"):
        column_heavy_hitters(df, "v", 0, 2)


def test_column_heavy_hitters_empty(spark):
    df = spark.createDataFrame([], "v int")
    assert column_heavy_hitters(df, "v", 1, 2).collect() == []
