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


PROJ = ["col_name", "n", "n_null", "min", "max", "n_distinct",
        "top_value", "top_count", "mg_resid"]


def test_profile_incremental_and_stream_lifecycle(spark, tmp_path):
    """Persisted partial state: base + replay-guarded increments fold to the
    same profile as one scan of the concatenated data (exact columns —
    quantile estimates are batching-dependent by bound and projected out);
    redelivery is a no-op; compaction preserves the readout; the Structured
    Streaming twin drains to the same state."""
    from pyspark.sql import functions as F
    from hierarchical_bloom_filter_index_spark.operators.profile import (
        append_profile_increment,
        compact_profile_state,
        profile_stream,
        read_profile,
        write_profile_state,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cols = ["l_linenumber", "l_quantity"]
    full = sorted(map(tuple, profile_columns(li, cols).select(*PROJ).collect()))
    b = [li.filter(F.pmod(F.col("l_orderkey"), F.lit(3)) == i) for i in range(3)]

    p = str(tmp_path / "prof")
    write_profile_state(b[0], cols, p)
    append_profile_increment(b[1], p, 0)
    append_profile_increment(b[2], p, 1)
    got = sorted(map(tuple, read_profile(spark, p).select(*PROJ).collect()))
    assert got == full
    append_profile_increment(b[2], p, 1)  # at-least-once redelivery: no-op
    assert sorted(map(tuple, read_profile(spark, p).select(*PROJ).collect())) == full
    assert compact_profile_state(spark, p) == len(cols)
    assert sorted(map(tuple, read_profile(spark, p).select(*PROJ).collect())) == full

    # streaming twin over a file stream (empty base; params from meta)
    p2, sdir, ckpt = str(tmp_path / "p2"), str(tmp_path / "in"), str(tmp_path / "ck")
    write_profile_state(li.limit(0), cols, p2)
    for i, part in enumerate(b):
        part.write.parquet(f"{sdir}/f{i}")
    stream = spark.readStream.schema(li.schema).option(
        "maxFilesPerTrigger", "2").parquet(f"{sdir}/*")
    q = profile_stream(stream, p2, ckpt)
    assert q.awaitTermination(300), "profile stream drain exceeded 300s"
    got_s = sorted(map(tuple, read_profile(spark, p2).select(*PROJ).collect()))
    assert got_s == full


def test_grouped_profile_matches_pandas(spark):
    from hierarchical_bloom_filter_index_spark.operators.profile import (
        grouped_profile_columns,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    prof = {(r["grp"], r["col_name"]): r.asDict()
            for r in grouped_profile_columns(li, "l_returnflag", ["l_quantity"]).collect()}
    pdf = li.select("l_returnflag", "l_quantity").toPandas()
    for g, gp in pdf.groupby("l_returnflag"):
        v = gp["l_quantity"].astype(np.int64)
        p = prof[(str(g), "l_quantity")]
        assert p["n"] == len(gp) and p["n_null"] == 0
        assert (p["min"], p["max"]) == (v.min(), v.max())
        assert p["n_distinct"] == v.nunique()     # sparse-exact per group
        vc = v.value_counts()
        top_cnt = int(vc.max())
        top_val = int(min(vc[vc == top_cnt].index))
        assert p["mg_resid"] == 0                 # per-batch-group distinct <= k
        assert (p["top_value"], p["top_count"]) == (top_val, top_cnt)
    assert len(prof) == pdf["l_returnflag"].nunique()
