"""Expectations family (operators/expectations.py): exact violation
counts, one-scan scalar pass, guards."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators import expectations as EX


@pytest.fixture(scope="module")
def data(spark):
    rows = [
        (1, 10.0, "A", "x1"),
        (2, 20.0, "B", "x2"),
        (2, -5.0, "C", "x3"),     # dup id, below range, bad status
        (None, 5000.0, "A", "y4"),  # null id, above range
        (5, 50.0, "B", None),     # null code
        (5, 60.0, "A", "zz"),     # dup id, bad code format
    ]
    df = spark.createDataFrame(
        rows, "id bigint, amount double, status string, code string")
    dim = spark.createDataFrame([(1,), (2,), (99,)], "ref_id bigint")
    return df, dim


CONS = [
    ("not_null", "id"),
    ("unique", "id"),
    ("in_range", "amount", 0.0, 1000.0),
    ("accepted_values", "status", ["A", "B"]),
    ("regex_match", "code", "[a-z][0-9]"),
    ("row_count_between", 1, 100),
    ("fk", "id", "refs", "ref_id"),
]


def test_exact_violation_counts(spark, data):
    df, dim = data
    out = {r["constraint"]: r for r in
           EX.check_constraints(df, CONS, dims={"refs": dim}).collect()}
    assert len(out) == 7
    assert all(r["n_rows"] == 6 for r in out.values())
    assert out["not_null(id)"]["violations"] == 1
    assert out["unique(id)"]["violations"] == 2      # one extra 2, one extra 5
    assert out["in_range(amount, 0.0, 1000.0)"]["violations"] == 2
    assert out["accepted_values(status, [A, B])"]["violations"] == 1
    assert out["regex_match(code, [a-z][0-9])"]["violations"] == 1  # 'zz'
    assert out["row_count_between(1, 100)"]["violations"] == 0
    # fk: non-null ids not in {1,2,99} -> the two 5s
    assert out["fk(id -> refs.ref_id)"]["violations"] == 2
    assert out["fk(id -> refs.ref_id)"]["passed"] is False
    assert out["row_count_between(1, 100)"]["passed"] is True
    names = [r for r in out]
    assert names == sorted(names)


def test_row_count_violation_and_all_green(spark, data):
    df, _ = data
    out = {r["constraint"]: r for r in EX.check_constraints(
        df, [("row_count_between", 10, 20)]).collect()}
    assert out["row_count_between(10, 20)"]["violations"] == 1
    clean = df.where(F.col("id") == 1)
    out2 = EX.check_constraints(
        clean, [("not_null", "id"), ("unique", "id")]).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in out2)


def test_scalar_pass_is_one_aggregate(spark, data):
    df, _ = data
    scal = [("not_null", "id"), ("in_range", "amount", 0.0, 1000.0),
            ("accepted_values", "status", ["A", "B"]),
            ("row_count_between", 1, 100)]
    plan = EX.check_constraints(df, scal)._jdf.queryExecution().executedPlan().toString()
    # one global aggregate: exactly one exchange (to the single partition)
    assert plan.count("Exchange") == 1, plan


def test_guards(spark, data):
    df, dim = data
    with pytest.raises(ValueError):
        EX.check_constraints(df, [])
    with pytest.raises(ValueError):
        EX.check_constraints(df, [("not_null", "id"), ("not_null", "id")])
    with pytest.raises(ValueError):
        EX.check_constraints(df, [("fk", "id", "missing", "x")])
    with pytest.raises(ValueError):
        EX.check_constraints(df, [("mystery", "id")])


def test_expectations_stream_additive_parity(spark, data, tmp_path):
    df, dim = data
    adds = [("not_null", "id"), ("in_range", "amount", 0.0, 1000.0),
            ("accepted_values", "status", ["A", "B"]),
            ("regex_match", "code", "[a-z][0-9]"),
            ("fk", "id", "refs", "ref_id")]
    inp, chk, out = (str(tmp_path / p) for p in ("in", "chk", "out"))
    schema = "id bigint, amount double, status string, code string"
    df.limit(3).coalesce(1).write.mode("append").parquet(inp)
    q = EX.expectations_stream(spark, inp, chk, out, adds, schema,
                               dims={"refs": dim})
    assert q.awaitTermination(300)
    # second drop + a REPLAY drill: fresh drain over the same checkpoint
    df.exceptAll(df.limit(3)).coalesce(1).write.mode("append").parquet(inp)
    q2 = EX.expectations_stream(spark, inp, chk, out, adds, schema,
                                dims={"refs": dim})
    assert q2.awaitTermination(300)
    totals = {r["constraint"]: r for r in
              EX.read_expectation_totals(spark, out).collect()}
    batch = {r["constraint"]: r for r in
             EX.check_constraints(df, adds, dims={"refs": dim}).collect()}
    assert set(totals) == set(batch)
    for name, b in batch.items():
        assert totals[name]["violations"] == b["violations"], name
        assert totals[name]["n_rows"] == b["n_rows"], name
    # per-batch reports exist for both batches
    bids = sorted(set(r["batch_id"] for r in
                      spark.read.parquet(out).select("batch_id").collect()))
    assert len(bids) == 2


def test_suggest_constraints_from_profile(spark):
    from hierarchical_bloom_filter_index_spark.operators import profile as PR

    df = spark.createDataFrame(
        [(1, 5), (2, 9), (3, None), (4, 7)], "a bigint, b bigint")
    prof = PR.profile_columns(df, ["a", "b"])
    cons = EX.suggest_constraints(prof)
    # a: no nulls -> not_null + range; b: has a null -> range only
    assert cons == [("not_null", "a"), ("in_range", "a", 1, 4),
                    ("in_range", "b", 5, 9)]
    # learned contract validates green on its own snapshot
    rep = EX.check_constraints(df, cons).collect()
    assert all(r["passed"] for r in rep)
    # and flags drift on a shifted snapshot
    shifted = spark.createDataFrame([(9, 5), (None, 6)], "a bigint, b bigint")
    rep2 = {r["constraint"]: r["violations"]
            for r in EX.check_constraints(shifted, cons).collect()}
    assert rep2["not_null(a)"] == 1
    assert rep2["in_range(a, 1, 4)"] == 1


def test_quarantine_row_routing(spark, data):
    df, dim = data
    cons = [c for c in CONS if c[0] != "row_count_between"]
    rows = {r["code"]: r["violated"] for r in
            EX.quarantine(df, cons, dims={"refs": dim}).collect()}
    assert rows["x1"] == ""  # (1, 10.0, A, x1) is clean
    assert rows["x2"] == "unique(id)"  # dup id 2, fk ok
    assert set(rows["x3"].split("|")) == {
        "unique(id)", "in_range(amount, 0.0, 1000.0)",
        "accepted_values(status, [A, B])"}
    assert set(rows["y4"].split("|")) == {
        "not_null(id)", "in_range(amount, 0.0, 1000.0)"}
    # the two 5s: dup + fk orphan (+ null code is NOT a regex violation)
    assert set(rows[None].split("|")) == {"unique(id)", "fk(id -> refs.ref_id)"}
    assert set(rows["zz"].split("|")) == {
        "unique(id)", "fk(id -> refs.ref_id)", "regex_match(code, [a-z][0-9])"}
    # clean split == rows with empty marker; counts consistent
    q = EX.quarantine(df, cons, dims={"refs": dim})
    assert q.filter(F.col("violated") == "").count() == 1
    with pytest.raises(ValueError):
        EX.quarantine(df, [("row_count_between", 1, 10)])
    with pytest.raises(ValueError):
        EX.quarantine(df, [])


def test_freshness_constraint(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-03-01 12:00:00",)], "ts string"
    ).select(F.col("ts").cast("timestamp_ntz").alias("ts"))
    out = {r["constraint"]: r for r in EX.check_constraints(df, [
        ("freshness", "ts", "2024-02-01 00:00:00"),
        ("freshness", "ts", "2024-06-01 00:00:00"),
    ]).collect()}
    assert out["freshness(ts, 2024-02-01 00:00:00)"]["violations"] == 0
    assert out["freshness(ts, 2024-06-01 00:00:00)"]["violations"] == 1
    # all-null column is never fresh
    nulls = spark.createDataFrame([(None,), (None,)], "ts string").select(
        F.col("ts").cast("timestamp_ntz").alias("ts"))
    out2 = EX.check_constraints(
        nulls, [("freshness", "ts", "2024-01-01 00:00:00")]).collect()
    assert out2[0]["violations"] == 1
    with pytest.raises(ValueError):
        EX.quarantine(df, [("freshness", "ts", "2024-01-01 00:00:00")])
