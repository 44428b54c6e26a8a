"""One-pass table profiler: exact scalars, sparse-exact HLL distinct,
certified MG top values (resid reported), KLL quantile bounds — all from
mergeable blob partials folded treeAggregate-style."""

import numpy as np
import pandas as pd
import pytest

from hierarchical_bloom_filter_index_spark.operators.profile import profile_columns


@pytest.fixture(scope="module")
def fixture_df(spark):
    rng = np.random.default_rng(7)
    n = 50_000
    pdf = pd.DataFrame({
        "small": rng.integers(0, 30, n),          # exact regime everywhere
        "zipf": rng.zipf(1.6, n).astype(np.int64),  # skewed, dense HLL regime
    })
    pdf.loc[rng.choice(n, 500, replace=False), "small"] = None
    return pdf, spark.createDataFrame(pdf).repartition(8)


def test_profile_exact_regime(spark, fixture_df):
    pdf, df = fixture_df
    prof = {r["col_name"]: r.asDict()
            for r in profile_columns(df, ["small", "zipf"]).collect()}
    s = pdf["small"].dropna().astype(np.int64)
    p = prof["small"]
    assert (p["n"], p["n_null"]) == (len(pdf), 500)
    assert (p["min"], p["max"]) == (s.min(), s.max())
    assert p["n_distinct"] == s.nunique()  # merged HLL sparse => EXACT
    vc = s.value_counts()
    top_cnt = int(vc.max())
    top_val = int(min(vc[vc == top_cnt].index))  # min-value tie-break
    # 30 distinct <= mg_k per batch => no decrement ever => certified exact
    assert p["mg_resid"] == 0
    assert (p["top_value"], p["top_count"]) == (top_val, top_cnt)


def test_profile_dense_regime_bounded_and_honest(spark, fixture_df):
    pdf, df = fixture_df
    prof = {r["col_name"]: r.asDict()
            for r in profile_columns(df, ["zipf"]).collect()}
    p = prof["zipf"]
    true_d = pdf["zipf"].nunique()
    assert true_d > 512  # genuinely past the sparse-exact threshold
    assert abs(p["n_distinct"] - true_d) <= 5 * 1.04 / np.sqrt(2**12) * true_d
    # per-batch distinct exceeds mg_k: the residual must be REPORTED nonzero
    # (honest underestimate), and the zipf head still wins the top slot
    assert p["mg_resid"] > 0
    assert p["top_value"] == 1
    assert p["top_count"] <= int((pdf["zipf"] == 1).sum())
    # KLL quantiles: tie-aware rank-bound check
    sl = np.sort(pdf["zipf"].to_numpy().astype(np.float64))
    for q, key in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
        est = p[key]
        lo = np.searchsorted(sl, est, "left") / len(sl)
        hi = np.searchsorted(sl, est, "right") / len(sl)
        assert lo - 0.05 <= q <= hi + 0.05


def test_profile_all_null_and_integral_float(spark):
    pdf = pd.DataFrame({
        "allnull": pd.array([None] * 100, dtype="Int64"),
        "fl": np.arange(100, dtype=np.float64),  # integral floats accepted
    })
    df = spark.createDataFrame(pdf).repartition(4)
    prof = {r["col_name"]: r.asDict()
            for r in profile_columns(df, ["allnull", "fl"]).collect()}
    a = prof["allnull"]
    assert (a["n"], a["n_null"], a["n_distinct"]) == (100, 100, 0)
    assert a["min"] is None and a["top_value"] is None
    f = prof["fl"]
    assert (f["min"], f["max"], f["n_distinct"]) == (0, 99, 100)


def test_profile_refuses_fractional_and_unknown(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1.5, 2.0]}))
    with pytest.raises(Exception, match="fractional"):
        profile_columns(df, ["x"]).collect()
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, ["nope"])
