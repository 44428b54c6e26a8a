"""Bloom-pruned semi/anti-join: row-identity vs Spark's own joins, pruning
effectiveness, size refusal."""

import pytest
from pyspark.sql import Row, functions as F

from hierarchical_bloom_filter_index_spark.operators.joins import (
    bloom_anti_join,
    bloom_maybe_contains,
    bloom_semi_join,
    expected_candidate_bound,
    key_bloom,
)


def _rows(df, cols):
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


@pytest.fixture(scope="module")
def frames(spark):
    # big: 5000 rows, long keys 0..999 with duplicates + NULL keys
    big = spark.range(5000).select(
        F.when(F.col("id") % 97 == 0, F.lit(None)).otherwise(F.col("id") % 1000).alias("k"),
        F.col("id").alias("payload"),
    )
    # keys: 0..299 step 3 with duplicates + a NULL row
    keys = spark.createDataFrame(
        [Row(rk=i % 300) for i in range(0, 600, 3)] + [Row(rk=None)],
        "rk bigint",
    )
    return big.persist(), keys.persist()


def test_semi_matches_spark(spark, frames):
    big, keys = frames
    got = bloom_semi_join(big, keys, ("k", "rk"), fpp=0.05, seed=7)
    want = big.join(keys.where(F.col("rk").isNotNull()).select("rk"),
                    big["k"] == F.col("rk"), "left_semi")
    assert _rows(got, ["k", "payload"]) == _rows(want, ["k", "payload"])


def test_anti_matches_spark(spark, frames):
    big, keys = frames
    got = bloom_anti_join(big, keys, ("k", "rk"), fpp=0.05, seed=7)
    want = big.join(keys.select("rk"), big["k"] == F.col("rk"), "left_anti")
    assert _rows(got, ["k", "payload"]) == _rows(want, ["k", "payload"])


def test_semi_anti_partition_big(spark, frames):
    big, keys = frames
    semi = bloom_semi_join(big, keys, ("k", "rk"), seed=7)
    anti = bloom_anti_join(big, keys, ("k", "rk"), seed=7)
    assert semi.count() + anti.count() == big.count()


def test_same_name_on(spark):
    big = spark.range(400).select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    keys = spark.range(20).select((F.col("id") * 2).alias("k"))
    got = bloom_semi_join(big, keys, "k", seed=11, broadcast_verify=True)
    want = big.join(keys, on="k", how="left_semi")
    assert _rows(got, ["k", "v"]) == _rows(want, ["k", "v"])


def test_string_keys(spark):
    big = spark.createDataFrame(
        [Row(s=f"doc-{i % 40}", v=i) for i in range(500)] + [Row(s=None, v=-1)]
    )
    keys = spark.createDataFrame([Row(t=f"doc-{i}") for i in range(0, 40, 4)])
    got = bloom_anti_join(big, keys, ("s", "t"), seed=3)
    want = big.join(keys, big["s"] == F.col("t"), "left_anti")
    assert _rows(got, ["s", "v"]) == _rows(want, ["s", "v"])


def test_pruning_is_effective(spark):
    """Disjoint key domains: the Bloom must certify ~all of the big side
    absent before the verify join (the entire point at scale)."""
    n_big, fpp = 20_000, 0.01
    big = spark.range(n_big).select((F.col("id") + 1_000_000).alias("k"))
    keys = spark.range(5_000).select(F.col("id").alias("rk"))
    bf = key_bloom(keys, "rk", fpp=fpp, seed=5)
    n_cand = big.where(bloom_maybe_contains(big, "k", bf)).count()
    assert n_cand <= expected_candidate_bound(n_big, 0, fpp)


def test_bloom_too_big_refused(spark):
    keys = spark.range(10).select(F.col("id").alias("rk"))
    with pytest.raises(ValueError, match="too large"):
        key_bloom(keys, "rk", fpp=0.01, n_keys=10_000_000, max_bytes=1024)


def test_n_keys_hint_skips_count(spark):
    keys = spark.range(100).select(F.col("id").alias("rk"))
    bf = key_bloom(keys, "rk", fpp=0.01, seed=9, n_keys=1000)
    big = spark.range(200).select(F.col("id").alias("rk"))
    got = bloom_semi_join(big, keys, "rk", seed=9, n_keys=1000)
    want = big.join(keys, on="rk", how="left_semi")
    assert bf.n_added == 100
    assert _rows(got, ["rk"]) == _rows(want, ["rk"])


# ---------------------------------------------------------------------------
# join-size / key-skew estimation
# ---------------------------------------------------------------------------

from hierarchical_bloom_filter_index_spark.operators.joins import (  # noqa: E402
    join_size_estimate,
    key_skew_f2,
)


@pytest.fixture(scope="module")
def jframes(spark):
    # a: keys 0..199 each repeated (k % 7) + 1 times, plus NULLs
    a = spark.range(200).select((F.col("id") % 200).alias("k")).withColumn(
        "reps", F.col("k") % 7 + 1).select(
        F.explode(F.sequence(F.lit(1), F.col("reps"))).alias("_i"), "k"
    ).select(F.when(F.col("k") == 13, F.lit(None)).otherwise(F.col("k")).alias("k"))
    # b: keys 100..399 each twice
    b = spark.range(300).select((F.col("id") + 100).alias("rk")).unionAll(
        spark.range(300).select((F.col("id") + 100).alias("rk")))
    return a.persist(), b.persist()


def _true_join_size(a, b, left, right):
    return (a.where(F.col(left).isNotNull())
             .join(b, F.col(left) == F.col(right), "inner").count())


def test_join_size_exact_regime(spark, jframes):
    a, b = jframes
    res = join_size_estimate(a, b, ("k", "rk"))
    assert res["exact"] is True
    assert res["est_join_size"] == float(_true_join_size(a, b, "k", "rk"))


def test_join_size_empty_side(spark, jframes):
    a, b = jframes
    res = join_size_estimate(a, b.where(F.col("rk") < 0), ("k", "rk"))
    assert res["exact"] is True and res["est_join_size"] == 0.0


def test_join_size_dense_regime_bound(spark, jframes):
    a, b = jframes
    # force dense: sparse capacity depth*width/2 = 45 < 199 distinct keys
    res = join_size_estimate(a, b, ("k", "rk"), depth=9, width=10)
    assert res["exact"] is False
    true = _true_join_size(a, b, "k", "rk")
    f2a = key_skew_f2(a, "k")["f2"]
    f2b = key_skew_f2(b, "rk")["f2"]
    bound = 3.0 * (f2a * f2b / 10) ** 0.5
    assert abs(res["est_join_size"] - true) <= bound


def test_key_skew_f2_exact(spark, jframes):
    a, _ = jframes
    res = key_skew_f2(a, "k")
    true = (a.where(F.col("k").isNotNull()).groupBy("k").count()
             .agg(F.sum(F.col("count") * F.col("count"))).collect()[0][0])
    assert res["exact"] is True and res["f2"] == float(true)
    assert res["n_rows"] == a.where(F.col("k").isNotNull()).count()


def test_join_size_string_keys(spark):
    a = spark.createDataFrame([("x",), ("x",), ("y",), ("z",), (None,)], "s string")
    b = spark.createDataFrame([("x",), ("y",), ("y",), ("w",)], "t string")
    res = join_size_estimate(a, b, ("s", "t"))
    assert res["exact"] is True
    assert res["est_join_size"] == float(_true_join_size(a, b, "s", "t"))


def test_join_size_autowidth_refusal(spark, jframes):
    a, b = jframes
    with pytest.raises(ValueError, match="explicit width"):
        join_size_estimate(a, b, ("k", "rk"), max_exact_bytes=64)


# ---------------------------------------------------------------------------
# join-strategy advisor
# ---------------------------------------------------------------------------

from hierarchical_bloom_filter_index_spark.operators.joins import plan_join  # noqa: E402


def test_plan_join_broadcast(spark, jframes):
    a, b = jframes
    n_a = a.where(F.col("k").isNotNull()).count()
    n_b = b.count()
    res = plan_join(a, b, ("k", "rk"))  # both tiny: broadcast wins
    assert res["strategy"] == "broadcast"
    assert res["broadcast_side"] == ("left" if n_a <= n_b else "right")
    assert res["n_left"] == n_a and res["n_right"] == n_b


def test_plan_join_shuffle_uniform(spark, jframes):
    a, b = jframes
    res = plan_join(a, b, ("k", "rk"), broadcast_max_bytes=0, skew_phi=(1, 64))
    # max key multiplicity is 7 on a, 2 on b — far under 1/64 of the rows
    assert res["strategy"] == "shuffle"
    assert res["hot_left"] == [] and res["hot_right"] == []


def test_plan_join_salted_on_skew(spark):
    hot = spark.createDataFrame(
        [(0,) for _ in range(500)] + [(i,) for i in range(1, 501)], "k bigint")
    dim = spark.createDataFrame([(i,) for i in range(400)], "rk bigint")
    res = plan_join(hot, dim, ("k", "rk"),
                    broadcast_max_bytes=0, skew_phi=(1, 4))
    assert res["strategy"] == "salted_shuffle"
    assert res["hot_left"] == [(0, 500)] and res["hot_right"] == []
    assert res["salt_buckets"] == 2  # ceil(500 * 4 / 1000)


def test_plan_join_estimate_size(spark, jframes):
    a, b = jframes
    res = plan_join(a, b, ("k", "rk"), estimate_size=True)
    assert res["est_join_size"] == float(_true_join_size(a, b, "k", "rk"))


# ---------------------------------------------------------------------------
# binned interval/point range join
# ---------------------------------------------------------------------------

from hierarchical_bloom_filter_index_spark.operators.joins import (  # noqa: E402
    interval_point_join,
)


def _brute_interval(points, pcol, intervals, s, e):
    return (points.where(F.col(pcol).isNotNull())
            .join(intervals, F.col(pcol).between(F.col(s), F.col(e)))
            .drop("_bin", "")).collect()


@pytest.fixture(scope="module")
def iframes(spark):
    pts = spark.createDataFrame(
        [(i, i * 3 % 101 - 50) for i in range(300)] + [(999, None)],
        "pid bigint, p bigint")
    iv = spark.createDataFrame(
        [(j, j * 7 - 60, j * 7 - 60 + (j % 13)) for j in range(40)]
        + [(100, 5, 3), (101, None, 10), (102, 2, None)],  # degenerate/NULL
        "iid bigint, s bigint, e bigint")
    return pts.persist(), iv.persist()


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


def test_interval_join_matches_brute(spark, iframes):
    pts, iv = iframes
    got = interval_point_join(pts, "p", iv, "s", "e")
    want = (pts.where(F.col("p").isNotNull())
            .join(iv, F.col("p").between(F.col("s"), F.col("e"))))
    assert _pairs(got) == _pairs(want)
    assert len(_pairs(got)) > 0
    # negative values straddle bin 0: the floor (not truncate) binning is
    # what makes this hold — and every pair appears exactly once
    assert len(_pairs(got)) == len(set(_pairs(got)))


def test_interval_join_explicit_width(spark, iframes):
    pts, iv = iframes
    for w in (1, 3, 64):
        got = interval_point_join(pts, "p", iv, "s", "e", bin_width=w)
        want = (pts.where(F.col("p").isNotNull())
                .join(iv, F.col("p").between(F.col("s"), F.col("e"))))
        assert _pairs(got) == _pairs(want), w


def test_interval_join_refuses_bin_bomb(spark, iframes):
    pts, iv = iframes
    wide = iv.unionByName(spark.createDataFrame(
        [(999, -100000, 100000)], "iid bigint, s bigint, e bigint"))
    with pytest.raises(ValueError, match="raise bin_width"):
        interval_point_join(pts, "p", wide, "s", "e",
                            bin_width=1, max_bins_per_interval=1000)


def test_interval_join_refuses_collisions(spark, iframes):
    pts, iv = iframes
    with pytest.raises(ValueError, match="collision"):
        interval_point_join(pts, "p", iv.withColumnRenamed("s", "p"), "p", "e")


def test_interval_join_double_path(spark):
    pts = spark.createDataFrame([(i, i * 0.37 - 5,) for i in range(100)],
                                "pid bigint, p double")
    iv = spark.createDataFrame([(j, j * 1.1 - 6, j * 1.1 - 3.5) for j in range(30)],
                               "iid bigint, s double, e double")
    got = interval_point_join(pts, "p", iv, "s", "e")
    want = pts.join(iv, F.col("p").between(F.col("s"), F.col("e")))
    assert _pairs(got) == _pairs(want) != []


def test_interval_join_plan_is_equi(spark, iframes):
    """The point of the binning: Spark plans a bare inequality join as
    BroadcastNestedLoop; the binned join must plan as a hash equi-join."""
    pts, iv = iframes
    plan = interval_point_join(
        pts, "p", iv, "s", "e")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# interval-overlap join
# ---------------------------------------------------------------------------

from hierarchical_bloom_filter_index_spark.operators.joins import (  # noqa: E402
    interval_overlap_join,
)


@pytest.fixture(scope="module")
def oframes(spark):
    a = spark.createDataFrame(
        [(i, i * 5 - 40, i * 5 - 40 + (i % 11)) for i in range(60)]
        + [(900, None, 5), (901, 9, 3)],
        "aid bigint, a_s bigint, a_e bigint")
    b = spark.createDataFrame(
        [(j, j * 7 - 55, j * 7 - 55 + (j % 9) + 2) for j in range(45)],
        "bid bigint, b_s bigint, b_e bigint")
    return a.persist(), b.persist()


def _opairs(df):
    return sorted((r["aid"], r["bid"]) for r in df.collect())


def test_overlap_join_matches_brute(spark, oframes):
    a, b = oframes
    got = interval_overlap_join(a, "a_s", "a_e", b, "b_s", "b_e")
    want = (a.where(F.col("a_s").isNotNull() & (F.col("a_s") <= F.col("a_e")))
            .join(b, (F.col("a_s") <= F.col("b_e"))
                  & (F.col("b_s") <= F.col("a_e"))))
    assert _opairs(got) == _opairs(want) != []
    assert len(_opairs(got)) == len(set(_opairs(got)))  # exactly-once


def test_overlap_join_widths(spark, oframes):
    a, b = oframes
    want = (a.where(F.col("a_s").isNotNull() & (F.col("a_s") <= F.col("a_e")))
            .join(b, (F.col("a_s") <= F.col("b_e"))
                  & (F.col("b_s") <= F.col("a_e"))))
    for w in (1, 4, 100):
        got = interval_overlap_join(a, "a_s", "a_e", b, "b_s", "b_e",
                                    bin_width=w)
        assert _opairs(got) == _opairs(want), w


def test_overlap_join_plan_and_refusals(spark, oframes):
    a, b = oframes
    plan = interval_overlap_join(
        a, "a_s", "a_e", b, "b_s", "b_e")._jdf.queryExecution(
        ).executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    with pytest.raises(ValueError, match="collision"):
        interval_overlap_join(a, "a_s", "a_e",
                              b.withColumnRenamed("b_s", "a_s"), "a_s", "b_e")
    wide = b.unionByName(spark.createDataFrame(
        [(999, -100000, 100000)], "bid bigint, b_s bigint, b_e bigint"))
    with pytest.raises(ValueError, match="raise bin_width"):
        interval_overlap_join(a, "a_s", "a_e", wide, "b_s", "b_e",
                              bin_width=1, max_bins_per_interval=500)
