"""session_paths / rolling_daily_counts (operators/sessions.py) vs
pure-python brute force."""

from collections import Counter, defaultdict

import pytest

from hierarchical_bloom_filter_index_spark.operators.sessions import (
    rolling_daily_counts,
    session_paths,
)

GAP = 1000


@pytest.fixture(scope="module")
def events(spark):
    import random

    rng = random.Random(11)
    rows = []
    t = 0
    for i in range(400):
        t += rng.choice([10, 100, 1500, 5000])  # gaps straddle GAP
        rows.append((i, rng.randrange(12), t + rng.randrange(3),
                     rng.choice("abcde"), rng.randrange(-500, 500) / 100))
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")


def _sessions(rows, gap):
    by_u = defaultdict(list)
    for eid, u, t, ty, v in rows:
        by_u[u].append((t, eid, ty))
    out = []
    for u, evs in by_u.items():
        evs.sort()
        cur = []
        prev = None
        for t, eid, ty in evs:
            if prev is not None and t - prev > gap:
                out.append(cur)
                cur = []
            cur.append(ty)
            prev = t
        out.append(cur)
    return out


def test_session_paths_match_brute(spark, events):
    rows = [tuple(r) for r in events.collect()]
    paths = Counter("|".join(s[:4]) for s in _sessions(rows, GAP))
    exp = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:6]
    got = [(r.path, r.n_sessions) for r in
           session_paths(events, GAP, k=6, max_len=4,
                         order_cols=("event_id",)).collect()]
    assert got == exp


def test_session_paths_tie_order_deterministic(spark):
    # two events at the SAME t_us: event_id must break the tie
    rows = [(1, 7, 100, "b", 0.0), (0, 7, 100, "a", 0.0)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")
    got = session_paths(ev, GAP, k=1, order_cols=("event_id",)).collect()
    assert got[0].path == "a|b"


def test_rolling_daily_counts_match_brute(spark, events):
    # stretch the fixture's ~660ms of activity over ~15 real days so the
    # RANGE frame sees both dense runs and gaps
    ev = events.withColumn("t_us", events.t_us * 2_000_000)
    rows = [tuple(r) for r in ev.collect()]
    daily = defaultdict(lambda: [0, 0])
    for eid, u, t, ty, v in rows:
        key = (ty, t // 86_400_000_000)
        daily[key][0] += 1
        daily[key][1] += round(v * 100)
    got = {(r.event_type, r.day): r for r in
           rolling_daily_counts(ev, 3, t_col="t_us").collect()}
    assert set(got) == set(daily)
    for (ty, d), (n, s) in daily.items():
        r = got[(ty, d)]
        assert (r.n, r.sum_scaled) == (n, s)
        rn = sum(daily[(ty, dd)][0] for dd in range(d - 2, d + 1)
                 if (ty, dd) in daily)
        rs = sum(daily[(ty, dd)][1] for dd in range(d - 2, d + 1)
                 if (ty, dd) in daily)
        assert (r.roll_n, r.roll_sum_scaled) == (rn, rs), (ty, d)


def test_rolling_gaps_age_out(spark):
    us = 86_400_000_000
    rows = [(0, 1, 0 * us + 5, "a", 1.0),
            (1, 1, 1 * us + 5, "a", 1.0),
            (2, 1, 9 * us + 5, "a", 1.0)]  # 8-day gap: window must reset
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")
    got = {r.day: r.roll_n for r in rolling_daily_counts(ev, 7).collect()}
    assert got == {0: 1, 1: 2, 9: 1}


def test_validation(spark, events):
    with pytest.raises(ValueError):
        session_paths(events, GAP, k=0)
    with pytest.raises(ValueError):
        rolling_daily_counts(events, 0)


def test_rolling_distinct_daily_exact_regime(spark):
    import random
    from collections import defaultdict

    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_distinct_daily)

    rng = random.Random(5)
    us = 86_400_000_000
    rows = []
    for i in range(3000):
        d = rng.randrange(20)
        if rng.random() < 0.15:
            d = rng.choice([0, 1, 9])  # gaps + dense days
        rows.append((i, rng.randrange(80), d * us + rng.randrange(us),
                     rng.choice("xyz"), 0.0))
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")
    W_DAYS = 4
    got = {(r.event_type, r.day): r for r in
           rolling_distinct_daily(ev, W_DAYS, p=12, seed=9).collect()}
    per_day = defaultdict(set)
    for eid, u, t, ty, v in rows:
        per_day[(ty, t // us)].add(u)
    assert set(got) == set(per_day)
    for (ty, d), users in per_day.items():
        r = got[(ty, d)]
        roll = set().union(*[per_day.get((ty, dd), set())
                             for dd in range(d - W_DAYS + 1, d + 1)])
        assert r.exact, (ty, d)
        assert (r.n_distinct, r.roll_distinct) == (len(users), len(roll)), (ty, d)


def test_rolling_distinct_daily_dense_regime_bound(spark):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_distinct_daily)

    # 5000 distinct keys >> sparse_max_nnz(8) = 32 -> dense, ±1.04/sqrt(256)
    rows = [(i, i, (i % 3) * 86_400_000_000 + i, "t", 0.0)
            for i in range(5000)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")
    out = rolling_distinct_daily(ev, 3, p=8, seed=9).collect()
    last = max(out, key=lambda r: r.day)
    assert not last.exact
    # generous 4-sigma envelope on the 3-day union (all 5000 keys)
    assert abs(last.roll_distinct - 5000) <= 4 * 1.04 / (256 ** 0.5) * 5000


def test_rolling_heavy_users_matches_brute(spark):
    import random
    from collections import Counter, defaultdict

    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_heavy_users)

    rng = random.Random(17)
    us = 86_400_000_000
    rows = []
    for i in range(4000):
        # zipf-ish users: heavy hitters exist but aren't universal
        u = min(int(rng.paretovariate(1.2)), 60)
        d = rng.randrange(12)
        rows.append((i, u, d * us + rng.randrange(us), rng.choice("pq"), 0.0))
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")
    W_DAYS, PN, PD = 3, 1, 12
    got = sorted((r.event_type, r.day, r.user_id, r.cnt, r.n_window)
                 for r in rolling_heavy_users(ev, W_DAYS, PN, PD).collect())
    per_day = defaultdict(Counter)
    for eid, u, t, ty, v in rows:
        per_day[(ty, t // us)][u] += 1
    exp = []
    for (ty, d) in per_day:
        win = Counter()
        for dd in range(d - W_DAYS + 1, d + 1):
            win.update(per_day.get((ty, dd), Counter()))
        n = sum(win.values())
        for u, c in win.items():
            if c * PD >= PN * n:
                exp.append((ty, d, u, c, n))
    assert got == sorted(exp)
    assert got  # non-trivial fixture


def test_rolling_heavy_users_refuses_small_k(spark):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_heavy_users)

    rows = [(i, i % 40, i, "t", 0.0) for i in range(400)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")
    with pytest.raises(Exception, match="certify|phi"):
        # k=3 cannot certify phi=1/20 on a 40-distinct-user day
        rolling_heavy_users(ev, 2, 1, 20, k=3).collect()


def test_rolling_value_quantiles_exact_regime(spark):
    import random
    from collections import defaultdict

    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_value_quantiles)

    rng = random.Random(23)
    us = 86_400_000_000
    rows = [(i, 0, rng.randrange(10) * us + rng.randrange(us), rng.choice("ab"),
             round(rng.uniform(-50, 50), 2)) for i in range(2500)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")
    W_DAYS = 3
    got = {(r.event_type, r.day): r for r in
           rolling_value_quantiles(ev, W_DAYS, k=4096, seed=3).collect()}
    per_day = defaultdict(list)
    for eid, u, t, ty, v in rows:
        per_day[(ty, t // us)].append(v)
    for (ty, d), _ in per_day.items():
        win = sorted(sum([per_day.get((ty, dd), [])
                          for dd in range(d - W_DAYS + 1, d + 1)], []))
        n = len(win)
        r = got[(ty, d)]
        assert r.exact and r.n_window == n
        for (num, den), col in [((1, 2), "q_1_2"), ((9, 10), "q_9_10"),
                                ((99, 100), "q_99_100")]:
            rk = max((num * n + den - 1) // den, 1)
            assert getattr(r, col) == win[rk - 1], (ty, d, col)


def test_rolling_value_quantiles_compacted_bound(spark):
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        rolling_value_quantiles)

    # one day, 20000 values >> k=256 -> compacted; check the rank bound
    rows = [(i, 0, i, "t", float(i)) for i in range(20000)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")
    r = rolling_value_quantiles(ev, 2, k=256, seed=3).collect()[0]
    assert not r.exact and r.n_window == 20000
    # k=256 normalized rank error ~1.77/k; allow a generous 5x envelope
    assert abs(r.q_1_2 - 10000) <= 5 * (1.77 / 256) * 20000


def test_day_node_store_lifecycle(spark, tmp_path):
    import glob
    import random

    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        compact_day_nodes, day_node_delta, day_node_stream,
        read_day_nodes, rolling_distinct_daily, rolling_distinct_from_store,
        write_day_node_store)

    rng = random.Random(31)
    us = 86_400_000_000
    rows = [(i, rng.randrange(70), rng.randrange(15) * us + rng.randrange(us),
             rng.choice("mn"), 0.0) for i in range(3000)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t_us bigint, "
              "event_type string, value double")
    old = ev.filter("event_id % 3 != 0")
    new = ev.filter("event_id % 3 = 0")
    path = str(tmp_path / "store")
    write_day_node_store(old, path, family="hll", p=12, seed=7)

    # stream the new half in as delta commits
    in_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    new.coalesce(2).write.mode("overwrite").parquet(in_dir)
    q = day_node_stream(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(in_dir), path, chk)
    assert q.awaitTermination(180)

    batch_ans = sorted(map(tuple,
                           rolling_distinct_daily(ev, 4, p=12, seed=7).collect()))
    live = sorted(map(tuple,
                      rolling_distinct_from_store(spark, path, 4).collect()))
    assert live == batch_ans

    # replay drill: recommitting an existing batch id is a no-op
    committed = sorted(glob.glob(f"{path}/delta/batch=*"))
    assert committed
    bid = int(committed[0].rsplit("=", 1)[1])
    assert day_node_delta(new, path, bid) is False

    # compaction: live table identical before/after, deltas gone
    assert compact_day_nodes(spark, path) >= 1
    assert not glob.glob(f"{path}/delta/batch=*")
    assert sorted(map(tuple,
                      rolling_distinct_from_store(spark, path, 4).collect())) \
        == batch_ans
    # base now holds one canonical node per group
    nodes = read_day_nodes(spark, path)
    assert nodes.groupBy("event_type", "day").count().filter(
        "count > 1").count() == 0
