"""Exact distributional QA ops: integer-exact histogram + Chebyshev
outlier flags vs local references; edge-landing values; validation."""

import math

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.stats import (
    group_outliers, scaled_histogram)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    df.count()
    return df


def test_histogram_matches_local(events):
    lo, hi, bins, scale = 0.0, 20.0, 10, 100
    got = {(r["event_type"], r["bin"]): (r["bin_lo_scaled"], r["n"])
           for r in scaled_histogram(
               events, "value", lo, hi, bins, scale,
               group_cols=("event_type",)).collect()}
    want = {}
    for r in events.select("event_type", "value").collect():
        x = round(r["value"] * scale)
        if not (0 <= x < 2000):
            continue
        b = x // 200
        want[(r["event_type"], b)] = want.get((r["event_type"], b), 0) + 1
    assert {k: v[1] for k, v in got.items()} == want
    for (_, b), (blo, _) in got.items():
        assert blo == b * 200
    assert got, "fixture produced an empty histogram — vacuous"


def test_histogram_edge_landing(spark):
    # values exactly on bin edges go to the UPPER bin; hi is exclusive
    df = spark.createDataFrame(
        [(0.0,), (2.0,), (4.0,), (19.99,), (20.0,), (-0.01,)], "value double")
    got = sorted((r["bin"], r["n"]) for r in scaled_histogram(
        df, "value", 0.0, 20.0, 10).collect())
    assert got == [(0, 1), (1, 1), (2, 1), (9, 1)]


def test_outliers_match_local(events):
    k, scale = 2, 100
    got = {r["event_id"] for r in group_outliers(
        events, "value", k=k, group_cols=("event_type",)).collect()}
    rows = [(r["event_type"], r["event_id"], round(r["value"] * scale))
            for r in events.select("event_type", "event_id", "value")
            .collect()]
    by = {}
    for et, eid, x in rows:
        by.setdefault(et, []).append((eid, x))
    want = set()
    for et, xs in by.items():
        n = len(xs)
        s = sum(x for _, x in xs)
        q = sum(x * x for _, x in xs)
        for eid, x in xs:
            if (n * x - s) ** 2 > k * k * (n * q - s * s):
                want.add(eid)
    assert got == want
    # sanity vs the float formulation (no boundary case in the fixture)
    for et, xs in by.items():
        n = len(xs)
        mu = sum(x for _, x in xs) / n
        var = sum((x - mu) ** 2 for _, x in xs) / n
        for eid, x in xs:
            assert (abs(x - mu) > k * math.sqrt(var)) == (eid in want) or \
                abs(abs(x - mu) - k * math.sqrt(var)) < 1e-6


def test_outlier_group_moments_exposed(events):
    r = group_outliers(events, "value", k=2,
                       group_cols=("event_type",)).first()
    if r is not None:
        assert r["group_n"] > 0
        assert int(r["group_sum_scaled"]) > 0


def test_validation(events):
    with pytest.raises(ValueError):
        scaled_histogram(events, "value", 0.0, 20.0, 7)  # 2000 % 7 != 0
    with pytest.raises(ValueError):
        scaled_histogram(events, "value", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        group_outliers(events, "value", k=0)
    with pytest.raises(ValueError):
        group_outliers(events, "value", k=2, group_cols=())


# ---------------------------------------------------------------------------
# percentile_rank
# ---------------------------------------------------------------------------
def test_percentile_rank_vs_brute(spark):
    from hierarchical_bloom_filter_index_spark.operators.stats import (
        percentile_rank,
    )

    rows = [("a", "g1", 10), ("b", "g1", 20), ("c", "g1", 20), ("d", "g1", 30),
            ("e", "g2", 5), ("f", "g2", 7)]
    df = spark.createDataFrame(rows, "id string, g string, m long")
    got = {(r["id"], r["pct_x1e6"])
           for r in percentile_rank(df, "m", ("g",)).collect()}
    want = set()
    by_g = {}
    for i, g, m in rows:
        by_g.setdefault(g, []).append((i, m))
    for g, ms in by_g.items():
        n = len(ms)
        for i, m in ms:
            below = sum(1 for _, m2 in ms if m2 < m)
            want.add((i, (below * 1_000_000) // n))
    assert got == want
    # ties share the strictly-below count; max is < 1e6
    assert dict(got)["b"] == dict(got)["c"] == 250_000
    assert max(p for _, p in got) < 1_000_000


def test_percentile_rank_one_exchange(spark):
    from hierarchical_bloom_filter_index_spark.operators.stats import (
        percentile_rank,
    )

    df = spark.createDataFrame(
        [(str(i), "g", i % 17) for i in range(100)], "id string, g string, m long")
    plan = percentile_rank(df, "m", ("g",))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_percentile_rank_refuses_fractional(spark):
    import pytest as _pt

    from hierarchical_bloom_filter_index_spark.operators.stats import (
        percentile_rank,
    )

    df = spark.createDataFrame([("a", "g", 1.5)], "id string, g string, m double")
    with _pt.raises(Exception):
        percentile_rank(df, "m", ("g",)).collect()


def test_percentile_rank_refuses_null(spark):
    import pytest as _pt

    from hierarchical_bloom_filter_index_spark.operators.stats import (
        percentile_rank,
    )

    df = spark.createDataFrame(
        [("a", "g", 1), ("b", "g", None)], "id string, g string, m long")
    with _pt.raises(Exception, match="NULL"):
        percentile_rank(df, "m", ("g",)).collect()
