"""Sessionization + as-of join: differential vs pandas (groupby scan /
merge_asof) on the real events fixture, plus crafted boundary cases for
strictness and tolerance."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.sessions import (
    asof_join,
    sessionize,
    with_epoch_us,
    with_sessions,
)

GAP_US = 6 * 3600 * 1_000_000


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = with_epoch_us(spark.read.parquet(f"{sf_dir}/events.parquet")).cache()
    df.count()
    return df


def _sessions_pandas(pdf: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    rows = []
    for uid, g in pdf.sort_values(["user_id", "t_us", "event_id"]).groupby("user_id"):
        idx = -1
        prev = None
        for t in g["t_us"]:
            if prev is None or t - prev > gap_us:
                idx += 1
            rows.append((uid, idx, t))
            prev = t
    out = pd.DataFrame(rows, columns=["user_id", "session_idx", "t_us"])
    return (
        out.groupby(["user_id", "session_idx"])
        .agg(t_start=("t_us", "min"), t_end=("t_us", "max"), n_events=("t_us", "size"))
        .reset_index()
    )


def test_sessionize_matches_pandas(events):
    got = sessionize(events, GAP_US, order_cols=("event_id",)).toPandas()
    want = _sessions_pandas(events.select("user_id", "event_id", "t_us").toPandas(), GAP_US)
    got = got.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    for c in ["user_id", "session_idx", "t_start", "t_end", "n_events"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_with_sessions_boundary_is_strict(spark):
    # gap == delta stays in the SAME session; gap+1 starts a new one
    rows = [(1, 0), (1, 100), (1, 201)]
    df = spark.createDataFrame(rows, "user_id long, t_us long")
    out = {r["t_us"]: r["session_idx"] for r in with_sessions(df, 100).collect()}
    assert out == {0: 0, 100: 0, 201: 1}


def test_sessionize_rejects_bad_gap(spark):
    df = spark.createDataFrame([(1, 0)], "user_id long, t_us long")
    with pytest.raises(ValueError):
        sessionize(df, 0)


def _asof_pandas(l: pd.DataFrame, r: pd.DataFrame, strict: bool, tol=None):
    kw = {"by": "user_id", "on": "t_us", "allow_exact_matches": not strict}
    if tol is not None:
        kw["tolerance"] = tol
    return pd.merge_asof(
        l.sort_values("t_us"), r.sort_values("t_us"), **kw
    ).sort_values("event_id").reset_index(drop=True)


@pytest.mark.parametrize("strict", [True, False])
def test_asof_matches_pandas(events, strict):
    l = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "t_us")
    r = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "t_us", F.col("value").alias("purchase_value"))
    got = (
        asof_join(l, r, "user_id", "t_us", ["purchase_value"], strict=strict)
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    rp = r.toPandas().rename(columns={"t_us": "t_us"})
    rp["matched_t"] = rp["t_us"]
    want = _asof_pandas(l.toPandas(), rp[["user_id", "t_us", "purchase_value", "matched_t"]], strict)
    assert len(got) == len(want)
    for c in ["event_id", "user_id", "t_us"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    for c in ["purchase_value", "matched_t"]:
        a, b = got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c


def test_asof_strictness_at_equal_t(spark):
    l = spark.createDataFrame([(1, 100, 7)], "user_id long, t_us long, event_id long")
    r = spark.createDataFrame([(1, 100, 5.0)], "user_id long, t_us long, v double")
    strict = asof_join(l, r, "user_id", "t_us", ["v"], strict=True).collect()[0]
    loose = asof_join(l, r, "user_id", "t_us", ["v"], strict=False).collect()[0]
    assert strict["v"] is None and strict["matched_t"] is None
    assert loose["v"] == 5.0 and loose["matched_t"] == 100


def test_asof_tolerance(spark):
    l = spark.createDataFrame([(1, 100, 1), (1, 500, 2)],
                              "user_id long, t_us long, event_id long")
    r = spark.createDataFrame([(1, 90, 9.0)], "user_id long, t_us long, v double")
    out = {r_["event_id"]: (r_["v"], r_["matched_t"])
           for r_ in asof_join(l, r, "user_id", "t_us", ["v"],
                               tolerance_us=50).collect()}
    assert out[1] == (9.0, 90)
    assert out[2] == (None, None)


def test_asof_rejects_colliding_payload(spark):
    df = spark.createDataFrame([(1, 0)], "user_id long, t_us long")
    with pytest.raises(ValueError):
        asof_join(df, df, "user_id", "t_us", ["t_us"])


def _funnel_local(rows, steps):
    """Greedy earliest ordered-funnel reference: rows = (user, t_us, type)."""
    per = {}
    for u, t, et in sorted(rows):
        per.setdefault(u, []).append((t, et))
    counts = {k: 0 for k in range(1, len(steps) + 1)}
    for u, evs in per.items():
        cur, last = 0, -1
        for t, et in sorted(evs):
            if cur < len(steps) and et == steps[cur] and t > last:
                cur, last = cur + 1, t
        for k in range(1, cur + 1):
            counts[k] += 1
    return counts


def test_funnel_matches_local(events):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        funnel_counts)

    steps = ["view", "click", "purchase"]
    got = {r["step"]: (r["event_type"], r["n_users"])
           for r in funnel_counts(events, steps).collect()}
    rows = [(r["user_id"], r["t_us"], r["event_type"])
            for r in events.select("user_id", "t_us", "event_type").collect()]
    want = _funnel_local(rows, steps)
    assert {k: v[1] for k, v in got.items()} == {
        k: v for k, v in want.items() if v > 0}
    for k, (et, _) in got.items():
        assert et == steps[k - 1]
    # funnel is monotone nonincreasing
    ns = [got[k][1] for k in sorted(got)]
    assert ns == sorted(ns, reverse=True)
    assert ns and ns[0] > 0, "fixture produced an empty funnel — vacuous"


def test_funnel_same_instant_cannot_chain(spark):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        funnel_counts)

    t0 = "2024-01-01 00:00:00"
    rows = [
        # u1: a,b at the SAME instant -> only step 1
        (1, t0, 1, "a"), (2, t0, 1, "b"),
        # u2: a then b strictly later -> step 2
        (3, t0, 2, "a"), (4, "2024-01-01 00:00:01", 2, "b"),
        # u3: b before a only -> step 1 (needs a first)
        (5, t0, 3, "b"), (6, "2024-01-01 00:00:01", 3, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "user_id", "event_type")
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(ev, ["a", "b"]).collect()}
    assert got == {1: 3, 2: 1}


def test_funnel_validation(events):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        funnel_counts)

    with pytest.raises(ValueError):
        funnel_counts(events, [])


def _funnel_windowed_local(rows, steps, w):
    """Brute-force reference: enumerate all chains (tiny fixtures only)."""
    from itertools import product

    per = {}
    for u, t, et in rows:
        per.setdefault(u, {}).setdefault(et, []).append(t)
    counts = {k: 0 for k in range(1, len(steps) + 1)}
    for u, by in per.items():
        max_p = 0
        for p in range(len(steps), 0, -1):
            if any(s not in by for s in steps[:p]):
                continue
            for chain in product(*[sorted(by[s]) for s in steps[:p]]):
                if all(0 < chain[i + 1] - chain[i] <= w
                       for i in range(p - 1)):
                    max_p = p
                    break
            if max_p:
                break
        for k in range(1, max_p + 1):
            counts[k] += 1
    return {k: v for k, v in counts.items() if v > 0}


def test_funnel_windowed_dead_end_trap(spark):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        funnel_counts_windowed)

    # u1: early 'a' at t=0 dead-ends (b at 100 is outside w=10); the LATER
    # a at t=95 converts via b@100, c@105 — greedy earliest would miss it
    rows = [(1, 0, "a"), (1, 95, "a"), (1, 100, "b"), (1, 105, "c"),
            # u2: a->b within w but c too far -> prefix 2
            (2, 0, "a"), (2, 5, "b"), (2, 100, "c")]
    ev = spark.createDataFrame(
        [(i, u, t, et) for i, (u, t, et) in enumerate(rows)],
        "event_id long, user_id long, t long, event_type string"
    ).select("event_id", "user_id",
             F.timestamp_micros(F.col("t")).alias("ts"), "event_type")
    got = {r["step"]: r["n_users"] for r in funnel_counts_windowed(
        ev, ["a", "b", "c"], within_us=10).collect()}
    assert got == {1: 2, 2: 2, 3: 1}


def test_funnel_windowed_matches_brute(events):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        funnel_counts_windowed)

    steps, w = ["view", "click", "purchase"], 3 * 3600 * 1_000_000
    got = {r["step"]: r["n_users"] for r in funnel_counts_windowed(
        events, steps, within_us=w).collect()}
    # brute reference on a 40-user slice (product enumeration explodes on
    # the full fixture)
    sub = events.filter(F.col("user_id") < 40)
    rows = [(r["user_id"], r["t_us"], r["event_type"])
            for r in sub.select("user_id", "t_us", "event_type").collect()]
    want = _funnel_windowed_local(rows, steps, w)
    got_sub = {r["step"]: r["n_users"] for r in funnel_counts_windowed(
        sub, steps, within_us=w).collect()}
    assert got_sub == want
    # windowed counts can never exceed the unbounded funnel's
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        funnel_counts)
    unb = {r["step"]: r["n_users"]
           for r in funnel_counts(events, steps).collect()}
    for k, v in got.items():
        assert v <= unb[k]
    assert got.get(3, 0) > 0, "fixture produced no 3-step conversions"


def test_funnel_windowed_validation(events):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        funnel_counts_windowed)

    with pytest.raises(ValueError):
        funnel_counts_windowed(events, [], within_us=10)
    with pytest.raises(ValueError):
        funnel_counts_windowed(events, ["view"], within_us=0)


def test_event_transitions_matches_local(events):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        event_transitions)

    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in event_transitions(events).collect()}
    rows = sorted(
        (r["user_id"], r["t_us"], r["event_id"], r["event_type"])
        for r in events.select(
            "user_id", "t_us", "event_id", "event_type").collect())
    want = {}
    prev = {}
    for u, t, eid, et in rows:
        if u in prev:
            k = (prev[u], et)
            want[k] = want.get(k, 0) + 1
        prev[u] = et
    assert got == want and got


def test_cohort_retention_matches_local(events):
    import datetime

    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        cohort_retention)

    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in cohort_retention(events).collect()}
    act = set()
    for r in events.select("user_id", "t_us").collect():
        d = datetime.datetime.fromtimestamp(
            r["t_us"] / 1e6, datetime.timezone.utc).date()
        act.add((r["user_id"], d))
    first = {}
    for u, d in act:
        first[u] = min(first.get(u, d), d)
    want = {}
    for u, d in act:
        k = (first[u].isoformat(), (d - first[u]).days)
        want[k] = want.get(k, 0) + 1
    assert got == want and got
    # offset 0 rows total the user count
    assert sum(v for (c, o), v in got.items() if o == 0) == len(first)


def test_top_event_paths_matches_pandas(events):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        top_event_paths,
    )

    pdf = events.select("user_id", "t_us", "event_id", "event_type").toPandas()
    paths = (
        pdf.sort_values(["user_id", "t_us", "event_id"])
        .groupby("user_id")["event_type"]
        .apply(lambda s: ">".join(s.head(3)))
    )
    counts = paths.value_counts()
    want = sorted(
        ((int(n), p) for p, n in counts.items()),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    got = [
        (r["n_users"], r["path"])
        for r in top_event_paths(events, 3, 20).collect()
    ]
    assert got == want


def test_top_event_paths_short_users_and_ties(spark):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        top_event_paths,
    )
    import pytest as _pt

    ev = spark.createDataFrame(
        [
            # user 1: full prefix a>b>c (4th event ignored)
            (1, "2024-01-01 00:00:01", 1, "a"),
            (2, "2024-01-01 00:00:02", 1, "b"),
            (3, "2024-01-01 00:00:03", 1, "c"),
            (4, "2024-01-01 00:00:04", 1, "zz"),
            # user 2: only 2 events -> shorter path a>b
            (5, "2024-01-01 00:00:01", 2, "a"),
            (6, "2024-01-01 00:00:02", 2, "b"),
            # user 3: same-ts tie broken by event_id: a then b
            (8, "2024-01-01 00:00:05", 3, "b"),
            (7, "2024-01-01 00:00:05", 3, "a"),
            # user 4: single event
            (9, "2024-01-01 00:00:09", 4, "c"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["path"]: r["n_users"] for r in top_event_paths(ev, 3, 10).collect()}
    assert got == {"a>b>c": 1, "a>b": 2, "c": 1}
    with _pt.raises(ValueError, match="prefix_len"):
        top_event_paths(ev, 0, 5)


def test_decayed_event_counts_exact(spark):
    """Integer-scaled decay equals a brute float recomputation (scaled), the
    horizon drops old events, and out-of-range horizons refuse."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        decayed_event_counts,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = pd.Timestamp("2024-03-01 12:00:00")
    rows = [("a", base - pd.Timedelta(hours=h)) for h in [0, 1, 1, 5, 39, 40, 100]]
    rows += [("b", base - pd.Timedelta(hours=h)) for h in [2, 3]]
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["event_type", "ts"]))
    got = {r["grp"]: (r["decayed_num"], r["n_window"], r["scale_exp"])
           for r in decayed_event_counts(ev).collect()}
    # group a: ages 0,1,1,5,39 in horizon (40,100 dropped)
    num_a = sum(2 ** (39 - d) for d in [0, 1, 1, 5, 39])
    assert got["a"] == (num_a, 5, 39)
    assert got["b"] == (2 ** 37 + 2 ** 36, 2, 39)
    # scaled value equals the float definition
    assert abs(got["a"][0] / 2 ** 39
               - sum(0.5 ** d for d in [0, 1, 1, 5, 39])) < 1e-9
    with _pytest.raises(ValueError, match="horizon_halflives"):
        decayed_event_counts(ev, horizon_halflives=63)


# ---------------------------------------------------------------------------
# attribution_touches
# ---------------------------------------------------------------------------
def test_attribution_first_and_last_vs_brute(spark):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        attribution_touches,
    )

    W = 100
    rows = [
        # (event_id, user, type, t)
        (1, "u1", "click", 10), (2, "u1", "click", 50),
        (3, "u1", "purchase", 60),           # first=1 (10>=60-100), last=2
        (4, "u1", "purchase", 111),          # window [11,110]: only t=50 -> 2
        (5, "u2", "click", 200),
        (6, "u2", "purchase", 200),          # strictly-before: NOT attributed
        (7, "u2", "purchase", 300),          # 200 >= 300-100 -> 5
        (8, "u3", "purchase", 40),           # no clicks at all
        (9, "u4", "click", 400), (10, "u4", "click", 400),
        (11, "u4", "purchase", 410),         # tie at t=400 -> min id 9 / max id 10
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, t_us long")
    first = {r["conv_id"]: r["touch_id"]
             for r in attribution_touches(ev, "click", "purchase", W,
                                          mode="first").collect()}
    last = {r["conv_id"]: r["touch_id"]
            for r in attribution_touches(ev, "click", "purchase", W,
                                         mode="last").collect()}
    assert first == {3: 1, 4: 2, 6: None, 7: 5, 8: None, 11: 9}
    assert last == {3: 2, 4: 2, 6: None, 7: 5, 8: None, 11: 10}
    import pytest as _pt
    with _pt.raises(ValueError, match="mode"):
        attribution_touches(ev, "click", "purchase", W, mode="best")
    with _pt.raises(ValueError, match="window_us"):
        attribution_touches(ev, "click", "purchase", 0)


def test_interval_point_join_keys(spark):
    from hierarchical_bloom_filter_index_spark.operators.joins import (
        interval_point_join,
    )

    pts = spark.createDataFrame(
        [("a", 5), ("b", 5)], "k string, p long")
    ivs = spark.createDataFrame(
        [("a", 0, 10), ("b", 6, 10)], "k string, s long, e long")
    got = sorted((r["k"], r["p"]) for r in
                 interval_point_join(pts, "p", ivs, "s", "e",
                                     bin_width=4, keys=("k",)).collect())
    # without keys, ("b",5) would match a's interval through the shared bin
    assert got == [("a", 5)]
    import pytest as _pt
    with _pt.raises(ValueError, match="must exist"):
        interval_point_join(pts, "p", ivs, "s", "e", keys=("zz",))
