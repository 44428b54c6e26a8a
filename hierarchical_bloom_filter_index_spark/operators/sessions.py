"""Event-stream relational operators: sessionization and as-of joins.

Pipeline ops a training-data/analytics engine needs around the sketch
index (same positioning as operators/dedup and operators/text — the
reference stops at pattern queries; a user of a 100 TB corpus also owns
the event logs that describe it). Both operators are single-shuffle
window-function plans — no range-join explosion, no driver collection —
and both are exact, with DuckDB twins (window functions / ASOF JOIN) as
driver oracles.

Scale notes:
* Both shuffle ONCE on the partition key and sort within partitions
  (Spark window exchange); two window expressions over the same
  (partitionBy, orderBy) share one exchange+sort.
* Per-key work is sequential by nature (sessions and as-of matches are
  defined by per-key event order). A pathologically hot key is bounded by
  that key's own event count, never by the table; keys are hashed across
  executors so 1000 executors see 1000-way parallelism across keys.
* Timestamps travel as epoch MICROSECONDS (bigint) — window arithmetic
  and the cross-engine oracle equality are then timezone-free (the
  TIMESTAMP_NTZ session-timezone trap documented in streaming/windows.py
  never enters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def with_epoch_us(df: DataFrame, ts_col: str = "ts", out_col: str = "t_us") -> DataFrame:
    """Epoch-microsecond bigint for a TIMESTAMP/TIMESTAMP_NTZ column. NTZ
    wall times are interpreted in the SESSION timezone by the cast — pin
    spark.sql.session.timeZone to UTC (as every events driver query does)
    so the value equals DuckDB's epoch_us(ts) regardless of the box."""
    return df.withColumn(out_col, F.unix_micros(F.col(ts_col).cast("timestamp")))


def with_sessions(
    events: DataFrame,
    gap_us: int,
    key_col: str = "user_id",
    t_col: str = "t_us",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-based session assignment: within a key, a new session starts at
    the first event and whenever the time since the PREVIOUS event exceeds
    ``gap_us`` (strictly). Adds ``session_idx`` (0-based per key). One
    window exchange; lag + running-sum share it. ``order_cols`` breaks
    timestamp ties deterministically (boundaries only depend on ``t_col``,
    so ties never move a session edge — the tiebreak just pins row order)."""
    if gap_us <= 0:
        raise ValueError(f"gap_us must be positive: {gap_us}")
    w = Window.partitionBy(key_col).orderBy(t_col, *order_cols)
    prev = F.lag(t_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(t_col) - prev > F.lit(int(gap_us))), 1
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(t_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("_new", is_new).withColumn(
        "session_idx", F.sum("_new").over(run) - F.lit(1)
    ).drop("_new")


def sessionize(
    events: DataFrame,
    gap_us: int,
    key_col: str = "user_id",
    t_col: str = "t_us",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-session summary rows: (key, session_idx, t_start, t_end,
    n_events). The groupBy reuses the window shuffle's hash partitioning on
    ``key_col`` only when Catalyst proves co-partitioning; either way the
    aggregate is map-side-combined and keyed by (key, session_idx) — never
    wider than the session count."""
    tagged = with_sessions(events, gap_us, key_col, t_col, order_cols)
    return tagged.groupBy(key_col, "session_idx").agg(
        F.min(t_col).alias("t_start"),
        F.max(t_col).alias("t_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    t_col: str,
    payload_cols: list[str],
    strict: bool = True,
    tolerance_us: int | None = None,
) -> DataFrame:
    """AS-OF (backward) join: every left row gains the payload of the
    LATEST right row of the same key with ``t_right < t_left`` (``<=`` when
    strict=False); unmatched left rows keep nulls (left-join semantics).

    Implemented as the union-tag trick: tag sides, sort each key's rows
    once by (t, side), and carry the last non-null right payload forward
    with last(..., ignorenulls=True) over an unbounded-preceding row frame
    — ONE shuffle + sort, O(n log n) total, versus the quadratic blowup of
    a naive range join on hot keys. Side ordering encodes the strictness:
    right rows sort BEFORE left rows at equal t for <=, AFTER for <.

    ``tolerance_us`` nulls matches staler than the given horizon (the
    pandas merge_asof tolerance semantics)."""
    if not payload_cols:
        raise ValueError("payload_cols must name at least one right column")
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {sorted(overlap)}")
    # right rows get side 0/2 so equal-t ordering implements <= / <
    right_side = 2 if strict else 0
    l_tag = left.select(
        "*", F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
        F.lit(None).cast("long").alias("_rt"),
    )
    # right rows borrow the left schema (nulls everywhere except key/t)
    r_tag = right.select(
        *[
            (right[c] if c in (key_col, t_col) else F.lit(None).cast(
                left.schema[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.lit(right_side).alias("_side"),
        *payload_cols,
        right[t_col].cast("long").alias("_rt"),
    )
    u = l_tag.unionByName(r_tag)
    w = Window.partitionBy(key_col).orderBy(t_col, "_side").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols]
    carried_t = F.last("_rt", ignorenulls=True).over(w).alias("_rt_m")
    out = (
        u.select(*left.columns, "_side", *carried, carried_t)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
    if tolerance_us is not None:
        stale = F.col(t_col).cast("long") - F.col("_rt_m") > F.lit(int(tolerance_us))
        out = out.select(
            *left.columns,
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
              for c in payload_cols],
            F.when(stale, F.lit(None)).otherwise(F.col("_rt_m")).alias("_rt_m"),
        )
    return out.withColumnRenamed("_rt_m", "matched_t")


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """ORDERED FUNNEL: for each prefix of ``steps`` (e.g. view -> click ->
    purchase), how many users completed it — the product-analytics
    staple. A user completes step k iff events of types steps[0..k] occur
    at STRICTLY increasing timestamps (no horizon: greedy
    earliest-feasible matching is EXACT for unbounded ordered funnels —
    advancing on the first feasible occurrence never forecloses a later
    completion; for horizon-bounded conversion use funnel_counts_windowed,
    whose backward DP handles the dead-end trap greedy falls into).

    Plan: filter to the step types FIRST (the scan drops every other
    event), ONE groupBy(user) building the per-user time-sorted event
    array (state bounded by per-user step-type activity, the sessionize
    contract), then a codegen'd F.aggregate scan — no Python, no window
    exchange, no per-step join chain. Output: (step, event_type,
    n_users), step 1..K, n_users nonincreasing. Timestamps compare as
    epoch micros (tz-free, the sessions.py discipline); same-instant
    events cannot chain (strict >), so the result is independent of the
    sort's tie order."""
    if not steps or len(steps) < 1:
        raise ValueError("funnel_counts: steps must be non-empty")
    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("user_id"),
            F.struct(
                # NTZ-safe cast (with_epoch_us discipline); only STRICT
                # comparisons of these micros matter, so the session tz
                # cannot change the funnel (a constant offset preserves >)
                F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
                F.col(id_col).cast("long").alias("eid"),
                F.col(type_col).alias("et"),
            ).alias("e"))
    )
    per = (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("e")).alias("es"))
        .select(
            "user_id",
            F.aggregate(
                "es",
                F.struct(F.lit(0).alias("cur"),
                         F.lit(-1).cast("long").alias("last")),
                lambda acc, x: F.when(
                    (acc["cur"] < F.lit(k))
                    & (x["et"] == F.element_at(step_arr, acc["cur"] + 1))
                    & (x["t"] > acc["last"]),
                    F.struct(
                        (acc["cur"] + 1).alias("cur"),
                        x["t"].alias("last")),
                ).otherwise(acc),
            )["cur"].alias("max_step"))
    )
    return _funnel_from_max_steps(per, step_arr)


def _funnel_from_max_steps(per: DataFrame, step_arr) -> DataFrame:
    """(step, event_type, n_users) from per-user max completed prefix —
    the shared funnel tail (explode the prefix range, one small groupBy)."""
    return (
        per.filter(F.col("max_step") >= 1)
        .select(F.explode(F.sequence(F.lit(1), "max_step")).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            "step",
            F.element_at(step_arr, F.col("step")).alias("event_type"),
            "n_users")
    )


def funnel_counts_windowed(
    events: DataFrame,
    steps: list[str],
    within_us: int,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """HORIZON-BOUNDED ordered funnel: a user completes step prefix p iff
    events of types steps[0..p] occur at strictly increasing timestamps
    with EVERY adjacent gap <= ``within_us`` micros (the
    within-X-of-previous-step conversion window). Greedy earliest matching
    is WRONG here — an early step-j occurrence can dead-end while a later
    one converts (the ordered-chain trap, proximity.ordered_chain_search)
    — so each prefix runs an exact BACKWARD existence DP per user:
    good_j(t) iff some good_{j+1} event lies in (t, t + within]; one
    np.searchsorted interval probe per step, vectorized over the user's
    events. Per-user state is its own event subsequence (the sessionize
    contract); one groupBy(user) is the only exchange."""
    import numpy as np
    import pandas as pd

    if not steps:
        raise ValueError("funnel_counts_windowed: steps must be non-empty")
    if within_us <= 0:
        raise ValueError("funnel_counts_windowed: within_us must be > 0")
    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("user_id"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(type_col).alias("et"))
    )
    w = int(within_us)
    sts = list(steps)

    def dp(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = {s: np.sort(pdf.loc[pdf["et"] == s, "t"].to_numpy(np.int64))
              for s in sts}
        max_p = 0
        for p in range(k, 0, -1):
            good = ts[sts[p - 1]]
            ok = len(good) > 0
            for j in range(p - 2, -1, -1):
                if not ok:
                    break
                t_j = ts[sts[j]]
                # good_{j+1} time strictly inside (t, t + w]?
                lo = np.searchsorted(good, t_j, side="right")
                hi = np.searchsorted(good, t_j + w, side="right")
                good = t_j[hi > lo]
                ok = len(good) > 0
            if ok:
                max_p = p
                break
        return pd.DataFrame({"user_id": [pdf["user_id"].iloc[0]],
                             "max_step": [np.int32(max_p)]})

    per = ev.groupBy("user_id").applyInPandas(
        dp, schema="user_id long, max_step int")
    return _funnel_from_max_steps(per, step_arr)


def event_transitions(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Markov transition counts: (from_type, to_type, n) over each user's
    consecutive event pairs in (t, event_id) order — the behavioral
    fingerprint behind journey analysis and next-event prediction. ONE
    window exchange (partitionBy user, the sessionize shape), then a
    map-side-combined pair count. The (t, id) tie-break makes the pair
    multiset a pure function of the table."""
    w = Window.partitionBy(user_col).orderBy(
        F.unix_micros(F.col(ts_col).cast("timestamp")),
        F.col(id_col))
    return (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention: users grouped by FIRST-activity day; for each
    (cohort_day, day_offset) the count of cohort users active exactly
    day_offset days later (offset 0 = the cohort size). Two map-side
    aggregations — distinct (user, day) activity and a per-user min —
    joined on user; no window. Days are rendered yyyy-MM-dd strings off
    the raw wall time (NTZ date_trunc — tz-free on both engines)."""
    day = F.date_format(F.col(ts_col).cast("timestamp"), "yyyy-MM-dd")
    act = events.select(
        F.col(user_col).alias("user_id"),
        F.to_date(day).alias("day")).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(first, on="user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def top_event_paths(
    events: DataFrame,
    prefix_len: int = 3,
    k: int = 20,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """PATH ANALYSIS: the top-k most common user JOURNEY PREFIXES — each
    user's first ``prefix_len`` event types in (t, event_id) order, joined
    '>' (users with fewer events contribute their full, shorter path), then
    ranked (n_users DESC, path ASC). The (count, path) key is unique per
    row, so the k-th boundary is deterministic cross-engine — the
    pattern_topk_docs discipline.

    Plan: ONE window exchange (row_number over the user timeline — the
    sessionize/transition shape, state O(1) per row, never a per-user
    collect of the unbounded history), the prefix filter BEFORE the
    groupBy(user) so at most prefix_len rows per user reach the second
    aggregation, and top-k is TakeOrderedAndProject (no global sort).
    Per-user event skew is capped by the prefix filter; path cardinality
    is bounded by |event types|^prefix_len, collapsed map-side."""
    if prefix_len < 1 or k < 1:
        raise ValueError("top_event_paths: prefix_len and k must be >= 1")
    w = Window.partitionBy(user_col).orderBy(
        F.unix_micros(F.col(ts_col).cast("timestamp")), F.col(id_col))
    pref = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(type_col).alias("et"),
            F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= int(prefix_len))
    )
    paths = (
        pref.groupBy("user_id")
        .agg(F.array_join(
            # rn is unique per user, so the sort fully determines the order
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "et"))),
                lambda s: s["et"],
            ), ">").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    return paths.orderBy(F.desc("n_users"), F.asc("path")).limit(int(k))


def decayed_event_counts(
    events: DataFrame,
    group_col: str = "event_type",
    half_life_us: int = 3_600_000_000,  # one hour
    horizon_halflives: int = 40,
    ts_col: str = "ts",
) -> DataFrame:
    """(group, decayed_num, n_window, scale_exp): EXACT exponentially-
    decayed event counts per group — each event aged d half-lives (integer
    division against now = max(ts) over the table, so the reference point
    is a pure function of the data) weighs 2^(H-1-d); the true decayed
    count is decayed_num / 2^(H-1).

    Exactness by construction: weights are BIGINT powers of two, so the sum
    is one integer — no float accumulation order to disagree across engines
    (SQL-oracle-checkable, unlike the textbook sum of 2^-d doubles). Events
    older than H = ``horizon_halflives`` are dropped: their total possible
    contribution is < n * 2^-H (~1e-12 of one event at the default 40),
    which is the principled truncation that also keeps the sum inside
    int64 (n * 2^(H-1) <= ~9.2e18 demands n <= ~3e7 per group at H=40 —
    raise half_life or lower H for hotter groups). One scan, one groupBy:
    the same shape as a plain count at 100 TB."""
    if not (1 <= horizon_halflives <= 62):
        raise ValueError(
            f"horizon_halflives must be in [1, 62] (int64 weights), "
            f"got {horizon_halflives}")
    h = int(horizon_halflives)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    now = F.broadcast(
        events.agg(F.max(t).alias("_now_us")))
    d = F.expr(f"(_now_us - _t_us) div {int(half_life_us)}")
    return (
        events.select(F.col(group_col).alias("grp"), t.alias("_t_us"))
        .join(now)
        .withColumn("_d", d)
        .filter(F.col("_d") < h)  # never negative: now = max(ts)
        .select(
            "grp",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({h} - 1 - _d AS INT))")
            .alias("_w"),
        )
        .groupBy("grp")
        .agg(
            F.sum("_w").alias("decayed_num"),
            F.count(F.lit(1)).alias("n_window"),
        )
        .withColumn("scale_exp", F.lit(h - 1).cast("int"))
    )


def session_paths(
    events: DataFrame,
    gap_us: int,
    k: int,
    max_len: int = 8,
    key_col: str = "user_id",
    t_col: str = "t_us",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(path, n_sessions): the top-k most common session event-type
    SEQUENCES — behavioral path mining over gap-based sessions.  Within
    a session, events order by (t, *order_cols) (pass a unique tiebreak
    so the path string is a pure function of the data); the first
    ``max_len`` types join with '|'.  Top-k by (n_sessions DESC, path
    ASC) — a deterministic boundary both engines reproduce.  Plan: the
    sessionize window exchange, one (key, session) groupBy whose
    collect_list is session-bounded, one path groupBy, TakeOrdered."""
    if k < 1 or max_len < 1:
        raise ValueError("session_paths: k and max_len must be >= 1")
    tagged = with_sessions(events, gap_us, key_col, t_col, order_cols)
    ordered = F.array_sort(F.collect_list(F.struct(
        F.col(t_col).alias("_t"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
        F.col(type_col).alias("_ty"))))
    per_sess = tagged.groupBy(key_col, "session_idx").agg(
        F.array_join(
            F.slice(F.transform(ordered, lambda x: x["_ty"]), 1, max_len),
            "|").alias("path"))
    return (per_sess.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_sessions"))
            .orderBy(F.desc("n_sessions"), F.asc("path"))
            .limit(int(k)))


def rolling_daily_counts(
    events: DataFrame,
    window_days: int,
    type_col: str = "event_type",
    t_col: str = "t_us",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """(event_type, day, n, sum_scaled, roll_n, roll_sum_scaled):
    per-type daily totals plus a trailing ``window_days``-day rolling
    sum — the time-series health dashboard over the event stream.  Days
    are integer epoch days off the epoch-micros column (UTC-pinned by
    the with_epoch_us discipline), values fixed-point scaled once
    (stats._scaled's HALF_UP == half-away-on-positives contract), so
    every output is an exact BIGINT and the RANGE-frame window is
    integer arithmetic on both engines.  GAPS MATTER: the frame is
    RANGE over the day number, so missing days genuinely age out of
    the trailing window (a ROWS frame would silently stretch it).
    One groupBy + one window exchange on (type)."""
    if window_days < 1:
        raise ValueError("rolling_daily_counts: window_days must be >= 1")
    day = _epoch_day(t_col).alias("day")
    scaled = F.round(F.col(value_col) * F.lit(int(scale))).cast("long")
    daily = (events.select(F.col(type_col).alias("event_type"), day,
                           scaled.alias("_v"))
             .groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("_v").alias("sum_scaled")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rangeBetween(-(int(window_days) - 1), 0))
    return daily.select(
        "event_type", "day", "n", "sum_scaled",
        F.sum("n").over(w).alias("roll_n"),
        F.sum("sum_scaled").over(w).alias("roll_sum_scaled"))


_DAY_US = 86_400_000_000


def _epoch_day(t_col: str):
    """FLOOR-division epoch day of an epoch-micros column — `div` alone
    truncates toward zero and merges days -1 and 0 at the origin (the
    joins._bin_expr lesson); the pmod correction matches DuckDB's
    flooring `//` for pre-1970 timestamps too."""
    return F.expr(
        f"(({t_col}) - pmod(({t_col}), {_DAY_US})) div {_DAY_US}")


def _daily_sketch_nodes(base: DataFrame, partial_fn, merge_many) -> DataFrame:
    """(event_type, day, blob): ONE canonical sketch node per (type, day)
    from a ``(event_type, day, _x)`` frame — the scaffolding all three
    rolling-sketch ops share.  Partial pass: per Arrow batch, factorize
    (type, day) and call the vectorized ``partial_fn(values, codes,
    n_groups)``.  Merge pass: repartition by the group keys, then ONE
    vectorized ``merge_many(flat_blobs, counts)`` call per PARTITION
    over its sorted rows — never a per-tiny-group applyInPandas (the
    11th-session ~1ms/group lesson); partition batches are CONCATENATED
    first so no group straddles an Arrow batch split (the standing
    rollup trap)."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes, uniques = pd.factorize(
                pd.Series(list(zip(pdf["event_type"], pdf["day"]))),
                sort=False)
            blobs = partial_fn(pdf["_x"].to_numpy(), codes.astype(np.int64),
                               len(uniques))
            yield pd.DataFrame({
                "event_type": [t for t, _ in uniques],
                "day": [int(d) for _, d in uniques],
                "blob": blobs})

    part = base.mapInPandas(partials,
                            "event_type string, day bigint, blob binary")
    return _merge_day_nodes(part, merge_many)


def _merge_day_nodes(part: DataFrame, merge_many) -> DataFrame:
    """Fold a (event_type, day, blob) PARTIAL-node frame to one canonical
    node per group: repartition by the group keys, then ONE vectorized
    ``merge_many`` call per partition over its sorted rows (concat the
    partition's Arrow batches first — a group must not straddle a batch
    split).  Shared by the in-memory builders and the persisted
    day-node store's read side."""
    import numpy as np
    import pandas as pd

    def merge_partition(batches):
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["event_type", "day"], kind="stable",
                              ignore_index=True)
        keys = pd.Series(list(zip(pdf["event_type"], pdf["day"])))
        codes, uniques = pd.factorize(keys, sort=False)  # sorted order kept
        counts = np.bincount(codes, minlength=len(uniques))
        merged = merge_many([bytes(b) for b in pdf["blob"]], counts)
        yield pd.DataFrame({
            "event_type": [t for t, _ in uniques],
            "day": [int(d) for _, d in uniques],
            "blob": merged})

    return part.repartition("event_type", "day").mapInPandas(
        merge_partition, "event_type string, day bigint, blob binary")


def _windowed_blobs(daily: DataFrame, window_days: int) -> DataFrame:
    """(event_type, day, blob, _wblobs): each day node plus the list of
    nodes its trailing RANGE window covers (gaps age out exactly)."""
    w = (Window.partitionBy("event_type").orderBy("day")
         .rangeBetween(-(int(window_days) - 1), 0))
    return daily.select(
        "event_type", "day", "blob",
        F.collect_list("blob").over(w).alias("_wblobs"))


def _flatten_window_lists(pdf):
    """(flat blob list, per-row counts) of a ``_wblobs`` column."""
    import numpy as np

    flat: list[bytes] = []
    counts = np.empty(len(pdf), dtype=np.int64)
    for i, lst in enumerate(pdf["_wblobs"]):
        bs = [bytes(b) for b in lst]
        counts[i] = len(bs)
        flat.extend(bs)
    return flat, counts


def _distinct_readout(windowed: DataFrame, p: int) -> DataFrame:
    """(event_type, day, n_distinct, roll_distinct, exact) readout over a
    _windowed_blobs frame of HLL day nodes — shared by the in-memory
    builder and the persisted-store server."""
    import pandas as pd

    from ..sketches import hll as H

    def readout(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            own = [bytes(b) for b in pdf["blob"]]
            flat, counts = _flatten_window_lists(pdf)
            merged = H.merge_blob_groups(flat, counts, p)
            n_day = np.rint(H.estimate_blobs(own, p)).astype(np.int64)
            n_roll = np.rint(H.estimate_blobs(merged, p)).astype(np.int64)
            exact = [H.is_sparse_blob(a) and H.is_sparse_blob(b)
                     for a, b in zip(own, merged)]
            yield pd.DataFrame({
                "event_type": pdf["event_type"],
                "day": pdf["day"],
                "n_distinct": n_day,
                "roll_distinct": n_roll,
                "exact": exact})

    return windowed.mapInPandas(
        readout, "event_type string, day bigint, n_distinct bigint, "
                 "roll_distinct bigint, exact boolean")


def rolling_distinct_daily(
    events: DataFrame,
    window_days: int,
    p: int = 12,
    seed: int = 0,
    type_col: str = "event_type",
    t_col: str = "t_us",
    key_col: str = "user_id",
) -> DataFrame:
    """(event_type, day, n_distinct, roll_distinct, exact): per-type
    daily DISTINCT keys plus the trailing ``window_days``-day rolling
    distinct — the metric a plain rolling SUM cannot give (distinct is
    not additive across days: the same user on Monday and Tuesday must
    count once in the week).  The mergeable-sketch answer: one
    canonical HLL node per (type, day) (sparse-exact while the day's
    distinct set fits sparse_max_nnz(p) = 2^p/8), then each rolling
    answer is the LOSSLESS register-max/set union of its window's day
    nodes — day blobs are built once and reused by every window that
    covers them, the classic sliding-window sketch design.  ``exact``
    is True iff every node involved stayed sparse, in which case BOTH
    outputs are exact integers (the driver-oracle regime at test
    scale); dense nodes degrade to the published ±1.04/sqrt(2^p) HLL
    bound, never an error.

    Plan: one Arrow partial pass, one repartition-merge (one vectorized
    kernel call per partition — see _daily_sketch_nodes), one RANGE
    window, one Arrow readout.  Blob bytes move, never key sets."""
    import pandas as pd

    from ..sketches import hll as H

    if window_days < 1:
        raise ValueError("rolling_distinct_daily: window_days must be >= 1")
    base = events.select(F.col(type_col).alias("event_type"),
                         _epoch_day(t_col).alias("day"),
                         F.col(key_col).cast("bigint").alias("_x"))
    daily = _daily_sketch_nodes(
        base,
        lambda v, s, n: H.partial_blobs_by_slot(v, s, n, p, seed),
        lambda blobs, counts: H.merge_blob_groups(blobs, counts, p))
    return _distinct_readout(_windowed_blobs(daily, window_days), p)


def rolling_heavy_users(
    events: DataFrame,
    window_days: int,
    phi_num: int,
    phi_den: int,
    k: int | None = None,
    type_col: str = "event_type",
    t_col: str = "t_us",
    key_col: str = "user_id",
) -> DataFrame:
    """(event_type, day, user_id, cnt, n_window): EXACT phi-heavy keys of
    every trailing ``window_days`` window — who generated >= phi of each
    type's events this week — via the certified sketch-then-verify
    design of operators/rollup.range_heavy_hitters lifted to the time
    axis.  One Misra-Gries node per (type, day) (mergeable,
    sum-then-prune merges with the association-free residual bound);
    each window's candidate set is cut from the UNION of its day nodes
    by the exact integer rule est*(k+1)+resid >= phi*n*(k+1)
    (spacesaving.heavy_candidate_blobs — a GUARANTEED superset, refusing
    loudly when k is too small for phi; default k = phi_den//phi_num + 1
    makes refusal impossible); one exact counting pass over candidates
    only decides.  The verify side SEMI-JOINS the event stream on the
    distinct candidate (type, user) pairs BEFORE the window fan-out, so
    only candidate traffic is ever multiplied window_days-fold, and the
    per-window aggregation is bounded by k keys — never a per-user
    window aggregation.  All outputs exact integers (heavy =
    cnt*phi_den >= phi_num*n_window, n_window the exact window total)."""
    import pandas as pd

    from ..sketches import spacesaving as SS

    if window_days < 1:
        raise ValueError("rolling_heavy_users: window_days must be >= 1")
    if phi_num <= 0 or phi_den <= 0 or phi_num > phi_den:
        raise ValueError(
            f"rolling_heavy_users: phi must be in (0, 1]: {phi_num}/{phi_den}")
    if k is None:
        k = phi_den // phi_num + 1
    base = events.select(F.col(type_col).alias("event_type"),
                         _epoch_day(t_col).alias("day"),
                         F.col(key_col).cast("bigint").alias("_x"))
    daily = _daily_sketch_nodes(
        base,
        lambda v, s, n: SS.partial_blobs_by_slot(v, s, n, k),
        lambda blobs, counts: SS.merge_blob_groups(blobs, counts, k))
    windowed = _windowed_blobs(daily, window_days).drop("blob")

    def cand_out(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_window_lists(pdf)
            merged = SS.merge_blob_groups(flat, counts, k)
            cands = SS.heavy_candidate_blobs(merged, phi_num, phi_den)
            et, dy, us = [], [], []
            for (ty, d), (keys, _c) in zip(
                    zip(pdf["event_type"], pdf["day"]), cands):
                for u in keys:
                    et.append(ty)
                    dy.append(int(d))
                    us.append(int(u))
            if et:
                yield pd.DataFrame({"event_type": et, "day": dy,
                                    "user_id": us})

    cand = windowed.mapInPandas(
        cand_out, "event_type string, day bigint, user_id bigint"
    ).localCheckpoint()  # feeds two joins below; bounded by k keys/window

    # exact verify: restrict the stream to candidate (type, user) traffic
    # FIRST (distinct candidate users are k-bounded), then fan each
    # surviving event out to its covering windows
    cand_users = cand.select("event_type",
                             F.col("user_id").alias("_x")).distinct()
    ev_c = base.join(F.broadcast(cand_users), ["event_type", "_x"],
                     "left_semi")
    ev_w = ev_c.select(
        "event_type",
        F.explode(F.sequence(
            F.col("day"),
            F.col("day") + F.lit(int(window_days) - 1))).alias("day"),
        F.col("_x").alias("user_id"))
    exact = (ev_w.join(F.broadcast(cand), ["event_type", "day", "user_id"])
             .groupBy("event_type", "day", "user_id")
             .agg(F.count(F.lit(1)).alias("cnt")))
    daily_n = base.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("_n"))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rangeBetween(-(int(window_days) - 1), 0))
    totals = daily_n.select(
        "event_type", "day", F.sum("_n").over(w).alias("n_window"))
    return (exact.join(totals, ["event_type", "day"])
            .filter(F.col("cnt") * F.lit(int(phi_den))
                    >= F.lit(int(phi_num)) * F.col("n_window"))
            .select("event_type", "day", "user_id", "cnt", "n_window"))


def rolling_value_quantiles(
    events: DataFrame,
    window_days: int,
    qs: tuple[tuple[int, int], ...] = ((1, 2), (9, 10), (99, 100)),
    k: int = 1024,
    seed: int = 0,
    type_col: str = "event_type",
    t_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """(event_type, day, n_window, q_..., exact): trailing-window VALUE
    quantiles per type from mergeable KLL day nodes — the third member
    of the rolling-sketch trio (distinct = HLL, heavy = MG, quantiles =
    KLL).  Quantile ranks use the RATIONAL rule r = max(1,
    ceil(num*n/den)) (kll.quantile_blobs_rational), so while every node
    stays uncompacted (n_window <= capacity — the driver-gate regime)
    each answer is the EXACT order statistic an engine reproduces with
    ROW_NUMBER; compacted nodes flip ``exact`` false and degrade to the
    KLL rank bound, never an error.  Day nodes built once, shared by
    every covering window; gaps age out via the RANGE frame."""
    import pandas as pd

    from ..sketches import kll as K

    if window_days < 1:
        raise ValueError("rolling_value_quantiles: window_days must be >= 1")
    qcols = [f"q_{num}_{den}" for num, den in qs]
    base = events.select(F.col(type_col).alias("event_type"),
                         _epoch_day(t_col).alias("day"),
                         F.col(value_col).cast("double").alias("_x"))
    daily = _daily_sketch_nodes(
        base,
        lambda v, s, n: K.partial_blobs_by_slot(v, s, n, k, seed),
        lambda blobs, counts: K.merge_blob_groups(blobs, counts))
    windowed = _windowed_blobs(daily, window_days).drop("blob")

    def readout(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat, counts = _flatten_window_lists(pdf)
            merged = K.merge_blob_groups(flat, counts)
            vals, exact, ns = K.quantile_blobs_rational(merged, list(qs))
            cols = {"event_type": pdf["event_type"], "day": pdf["day"],
                    "n_window": ns}
            for j, c in enumerate(qcols):
                cols[c] = vals[:, j]
            cols["exact"] = exact
            yield pd.DataFrame(cols)

    schema = ("event_type string, day bigint, n_window bigint, "
              + ", ".join(f"{c} double" for c in qcols)
              + ", exact boolean")
    return windowed.mapInPandas(readout, schema)


# ---------------------------------------------------------------------------
# persisted day-node store: the rolling-sketch family's lifecycle
# ---------------------------------------------------------------------------
def _day_node_kernels(meta: dict):
    """(partial_fn, merge_many) for a pinned day-node store geometry —
    family + params come from META, never callers (the chunk-store /
    minhash discipline)."""
    fam = meta["family"]
    if fam == "hll":
        from ..sketches import hll as H

        p, seed = int(meta["p"]), int(meta["seed"])
        return (lambda v, s, n: H.partial_blobs_by_slot(v, s, n, p, seed),
                lambda blobs, counts: H.merge_blob_groups(blobs, counts, p))
    if fam == "mg":
        from ..sketches import spacesaving as SS

        k = int(meta["k"])
        return (lambda v, s, n: SS.partial_blobs_by_slot(v, s, n, k),
                lambda blobs, counts: SS.merge_blob_groups(blobs, counts, k))
    if fam == "kll":
        from ..sketches import kll as K

        k, seed = int(meta["k"]), int(meta["seed"])
        return (lambda v, s, n: K.partial_blobs_by_slot(v, s, n, k, seed),
                lambda blobs, counts: K.merge_blob_groups(blobs, counts))
    raise ValueError(f"day-node store: unknown family {fam!r}")


def _day_node_base(events: DataFrame, meta: dict) -> DataFrame:
    cast = "double" if meta["family"] == "kll" else "bigint"
    return events.select(
        F.col(meta["type_col"]).alias("event_type"),
        _epoch_day(meta["t_col"]).alias("day"),
        F.col(meta["key_col"]).cast(cast).alias("_x"))


def write_day_node_store(
    events: DataFrame,
    path: str,
    family: str = "hll",
    p: int = 12,
    k: int = 256,
    seed: int = 0,
    type_col: str = "event_type",
    t_col: str = "t_us",
    key_col: str = "user_id",
) -> None:
    """Persist the (event_type, day, blob) daily sketch-node table the
    rolling family reads — sketch nodes are MERGEABLE, so the table is
    incrementally maintainable: new events land as delta commits
    (day_node_delta), readers merge base + deltas (read_day_nodes), and
    compaction folds the tail (compact_day_nodes).  ``path/meta`` pins
    (family, p/k/seed, column roles); maintenance never takes geometry
    from callers."""
    spark = events.sparkSession
    meta = {"family": family, "p": int(p), "k": int(k), "seed": int(seed),
            "type_col": type_col, "t_col": t_col, "key_col": key_col}
    partial_fn, merge_many = _day_node_kernels(meta)
    daily = _daily_sketch_nodes(_day_node_base(events, meta), partial_fn,
                                merge_many)
    daily.write.mode("overwrite").parquet(f"{path}/nodes")
    spark.createDataFrame(
        [(family, int(p), int(k), int(seed), type_col, t_col, key_col)],
        "family string, p int, k int, seed bigint, type_col string, "
        "t_col string, key_col string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def _day_node_meta(spark, path: str) -> dict:
    return spark.read.parquet(f"{path}/meta").first().asDict()


def day_node_delta(events: DataFrame, path: str, batch_id: int) -> bool:
    """EXACTLY-ONCE delta commit of a batch's day nodes into
    ``path/delta/batch={id}`` — the batch_id _SUCCESS probe is the
    replay guard (foreachBatch is at-least-once; this write is the
    commit's only effect, so redelivery skips; torn dirs are
    overwritten by the retry).  Partial nodes are SKETCH nodes, so the
    read-side merge with the base is exact by mergeability."""
    import os

    dest = f"{path}/delta/batch={int(batch_id)}"
    if os.path.exists(f"{dest}/_SUCCESS"):
        return False
    spark = events.sparkSession
    meta = _day_node_meta(spark, path)
    partial_fn, merge_many = _day_node_kernels(meta)
    daily = _daily_sketch_nodes(_day_node_base(events, meta), partial_fn,
                                merge_many)
    # localCheckpoint BEFORE the emptiness probe: isEmpty + write on the
    # lazy frame would run the full Arrow partial-sketch pass twice per
    # micro-batch (review finding).
    daily = daily.localCheckpoint(eager=True)
    if daily.isEmpty():
        return False
    daily.write.mode("overwrite").parquet(dest)
    return True


def day_node_stream(stream: DataFrame, path: str, checkpoint_path: str):
    """STREAMING day-node maintenance: one exactly-once delta commit per
    micro-batch; readers see base + deltas live through read_day_nodes.
    Returns the started availableNow query."""
    return (stream.writeStream.foreachBatch(
        lambda bdf, bid: day_node_delta(bdf, path, bid))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start())


def read_day_nodes(spark, path: str) -> DataFrame:
    """The LIVE day-node table: base plus pending delta commits folded
    per (event_type, day) through the family's merge kernel — THE one
    read-side definition every rolling readout composes.  With no
    pending deltas the plan is exactly the base read."""
    import glob as _glob

    base = spark.read.parquet(f"{path}/nodes")
    deltas = sorted(_glob.glob(f"{path}/delta/batch=*"))
    if not deltas:
        return base
    meta = _day_node_meta(spark, path)
    _, merge_many = _day_node_kernels(meta)
    d = spark.read.parquet(*deltas).select("event_type", "day", "blob")
    return _merge_day_nodes(base.unionByName(d), merge_many)


def compact_day_nodes(spark, path: str) -> int:
    """Fold pending deltas into the base (live table identical before
    and after; localCheckpoint before the overwrite — the base rewrite
    deletes files the lazy plan reads).  NOT concurrent-safe with an
    active stream.  Returns delta commits folded."""
    import glob as _glob
    import shutil

    deltas = sorted(_glob.glob(f"{path}/delta/batch=*"))
    if not deltas:
        return 0
    merged = read_day_nodes(spark, path).localCheckpoint()
    merged.write.mode("overwrite").parquet(f"{path}/nodes")
    for dd in deltas:
        shutil.rmtree(dd)
    return len(deltas)


def rolling_distinct_from_store(spark, path: str,
                                window_days: int) -> DataFrame:
    """rolling_distinct_daily served FROM the persisted day-node store
    (family must be 'hll') — byte-for-byte the same answers as the
    batch builder over the equivalent event set, because both read
    canonical mergeable nodes (the driver parity gate)."""
    meta = _day_node_meta(spark, path)
    if meta["family"] != "hll":
        raise ValueError(
            f"rolling_distinct_from_store: store family {meta['family']!r} "
            "is not 'hll'")
    p = int(meta["p"])
    return _distinct_readout(
        _windowed_blobs(read_day_nodes(spark, path), window_days), p)


def attribution_touches(
    events: DataFrame,
    touch_type: str,
    conv_type: str,
    window_us: int,
    mode: str = "last",
    key_col: str = "user_id",
    t_col: str = "t_us",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """MARKETING-STYLE TOUCH ATTRIBUTION: every ``conv_type`` event gains
    the first- or last-touch ``touch_type`` event of the same key within
    the lookback window (t_conv - window_us <= t_touch < t_conv, strictly
    before). Unattributed conversions survive with NULL touch columns.

    Shape: each touch becomes the interval [t+1, t+window] of conversion
    times it can influence; the match runs through joins.interval_point_join
    keyed by (key, bin) — a binned EQUI-join, never a Spark range join
    (BroadcastNestedLoop at scale) — and the pick is one (t, id)-struct
    min/max per conversion (deterministic tie-break), then a left join
    back to keep the unattributed. All epoch-micros BIGINT arithmetic, so
    the cross-engine twin is an equality."""
    from .joins import interval_point_join

    if mode not in ("first", "last"):
        raise ValueError(f"attribution_touches: mode must be first|last, got {mode!r}")
    if window_us < 1:
        raise ValueError("attribution_touches: window_us must be >= 1")
    conv = events.filter(F.col(type_col) == conv_type).select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).cast("long").alias("conv_id"),
        F.col(t_col).cast("long").alias("t_conv"))
    touch = events.filter(F.col(type_col) == touch_type).select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).cast("long").alias("touch_id"),
        F.col(t_col).cast("long").alias("t_touch"),
        (F.col(t_col).cast("long") + 1).alias("_s"),
        (F.col(t_col).cast("long") + window_us).alias("_e"))
    matched = interval_point_join(
        conv, "t_conv", touch, "_s", "_e", bin_width=window_us + 1,
        keys=("user_id",))
    pick = F.min if mode == "first" else F.max
    best = (matched.groupBy("conv_id")
            .agg(pick(F.struct("t_touch", "touch_id")).alias("_b"))
            .select("conv_id", F.col("_b.touch_id").alias("touch_id"),
                    F.col("_b.t_touch").alias("t_touch")))
    return conv.join(best, "conv_id", "left").select(
        "conv_id", "user_id", "t_conv", "touch_id", "t_touch")
