"""Bloom-pruned distributed semi/anti-joins — EXACT results, pruned shuffles.

The classic production use of a Bloom filter that the reference's membership
layer (membership/BloomFilter.java) exists to serve, lifted to the join
shape Spark users actually hit at 100 TB:

* keys side fits a broadcast hash TABLE (a few MB of rows): Spark already
  broadcasts the join — no Bloom needed, don't use this.
* keys side too big to broadcast as rows (10^7-10^9 keys): a plain
  ``left_semi`` / ``left_anti`` becomes a SortMergeJoin that shuffles the
  ENTIRE big side.  A Bloom at fpp=1% costs ~1.2 bytes/key (~120 MB for
  10^8 keys) — still broadcastable as one opaque blob — and prunes the big
  side BEFORE any exchange to (true matches + fpp x non-matches).  Only the
  surviving candidates flow into the exact verifying join.

Exactness (the engine-wide discipline: sketches prune, exact checks decide):

* no false negatives — a row failing the probe is CERTAINLY absent from the
  keys side, so semi drops it / anti keeps it with zero shuffle;
* false positives only inflate the candidate set; the verifying
  ``left_semi`` / ``left_anti`` join decides.  Results are row-identical to
  Spark's own semi/anti join (tests/test_joins.py proves it, incl. NULL and
  duplicate keys on both sides).

The keys-side Bloom is built with the engine's two-phase mergeable-UDAF
pattern (``operators.aggregates.sketch_aggregate``: per-partition partial
states via mapInPandas, treeAggregate-style fan-in merge — SURVEY §4.2), so
the build itself never funnels raw keys through the driver.

Scan-count note: ``bloom_anti_join`` reads the big side twice (the
bloom-certified-absent branch and the candidate branch are separate jobs).
At scale two columnar scans are far cheaper than one full-table shuffle; a
caller iterating repeatedly can persist the input first.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..sketches.bloom import BloomFilter, design
from .aggregates import collect_sketch, sketch_aggregate

# Broadcastable-blob ceiling. 256 MB ~ 1.7e9 keys at fpp=1e-2; past that the
# filter itself stops being "small side" and the right tool is a partitioned
# join, so we refuse loudly instead of silently shipping gigabytes per task.
MAX_BLOOM_BYTES = 256 << 20


def key_bloom(
    keys: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    seed: int = 42,
    n_keys: int | None = None,
    fanout: int = 32,
    max_bytes: int = MAX_BLOOM_BYTES,
) -> BloomFilter:
    """ONE Bloom filter over ``xxhash64(key_col)`` of every non-null key.

    Sizing uses ``n_keys`` when the caller knows the distinct-key count
    (or a safe upper bound); otherwise one cheap ``count()`` over the keys
    side (row count >= distinct count, so the filter is only ever
    over-provisioned). Duplicate inserts are idempotent — no distinct()
    shuffle is spent on them.
    """
    hashed = keys.where(F.col(key_col).isNotNull()).select(
        F.xxhash64(key_col).alias("hkey")
    )
    n = int(n_keys) if n_keys is not None else hashed.count()
    m, _k = design(max(n, 1), fpp)
    if m // 8 > max_bytes:
        raise ValueError(
            f"key bloom would be {m // 8 >> 20} MiB for n={n} at fpp={fpp} "
            f"(cap {max_bytes >> 20} MiB): the keys side is too large for a "
            "broadcast Bloom — raise fpp, raise max_bytes, or use a "
            "partitioned join instead"
        )
    bf = collect_sketch(
        sketch_aggregate(
            hashed,
            "hkey",
            lambda: BloomFilter.for_capacity(max(n, 1), fpp, seed),
            fanout=fanout,
        )
    )
    return bf if bf is not None else BloomFilter.for_capacity(max(n, 1), fpp, seed)


def bloom_maybe_contains(df: DataFrame, key_col: str, bf: BloomFilter) -> Column:
    """Boolean probe column: true = key MAYBE in the filter (no false
    negatives). The blob rides a Spark broadcast variable; each python
    worker deserializes it once per task (closure cache), then probes whole
    Arrow batches vectorized."""
    bc = df.sparkSession.sparkContext.broadcast(bf.to_bytes())
    cache: dict[str, BloomFilter] = {}

    @F.pandas_udf("boolean")
    def maybe(h: pd.Series) -> pd.Series:
        filt = cache.get("bf")
        if filt is None:
            filt = cache["bf"] = BloomFilter.from_bytes(bc.value)
        return pd.Series(filt.contains(h.to_numpy()))

    return maybe(F.xxhash64(key_col))


def _join_cols(on: str | tuple[str, str]) -> tuple[str, str]:
    if isinstance(on, str):
        return on, on
    left, right = on
    return left, right


def _verify_side(keys: DataFrame, right_col: str, broadcast_verify: bool | None) -> DataFrame:
    kd = keys.where(F.col(right_col).isNotNull()).select(right_col)
    return F.broadcast(kd) if broadcast_verify else kd


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: str | tuple[str, str],
    fpp: float = 0.01,
    seed: int = 42,
    n_keys: int | None = None,
    broadcast_verify: bool | None = None,
    max_bloom_bytes: int = MAX_BLOOM_BYTES,
) -> DataFrame:
    """``big LEFT SEMI JOIN keys`` with the big side Bloom-pruned before the
    exchange. Row-identical to ``big.join(keys, ..., "left_semi")``.

    ``on`` is a shared column name or ``(left_col, right_col)``.
    ``broadcast_verify=True`` forces a broadcast hash join for the exact
    verification (right when the keys side is small after all);
    ``None`` leaves the choice to Catalyst/AQE — at true scale the verify
    join shuffles only the pruned candidates.
    """
    left_col, right_col = _join_cols(on)
    bf = key_bloom(keys, right_col, fpp=fpp, seed=seed, n_keys=n_keys,
                   max_bytes=max_bloom_bytes)
    cand = big.where(bloom_maybe_contains(big, left_col, bf))
    kd = _verify_side(keys, right_col, broadcast_verify)
    if left_col == right_col:
        return cand.join(kd, on=left_col, how="left_semi")
    return cand.join(kd, cand[left_col] == kd[right_col], "left_semi")


def bloom_anti_join(
    big: DataFrame,
    keys: DataFrame,
    on: str | tuple[str, str],
    fpp: float = 0.01,
    seed: int = 42,
    n_keys: int | None = None,
    broadcast_verify: bool | None = None,
    max_bloom_bytes: int = MAX_BLOOM_BYTES,
) -> DataFrame:
    """``big LEFT ANTI JOIN keys`` — rows failing the Bloom probe are
    CERTIFIED absent (no false negatives) and bypass the join entirely;
    only candidates (true matches + false positives) pay the exact
    anti-join. Row-identical to ``big.join(keys, ..., "left_anti")``,
    including NULL left keys (a NULL never equals, so whichever branch its
    probe lands in keeps it)."""
    left_col, right_col = _join_cols(on)
    bf = key_bloom(keys, right_col, fpp=fpp, seed=seed, n_keys=n_keys,
                   max_bytes=max_bloom_bytes)
    probe = bloom_maybe_contains(big, left_col, bf)
    certified_absent = big.where(~probe)
    cand = big.where(probe)
    kd = _verify_side(keys, right_col, broadcast_verify)
    if left_col == right_col:
        cand_anti = cand.join(kd, on=left_col, how="left_anti")
    else:
        cand_anti = cand.join(kd, cand[left_col] == kd[right_col], "left_anti")
    return certified_absent.unionByName(cand_anti)


def expected_candidate_bound(n_big: int, n_match: int, fpp: float) -> int:
    """Loose deterministic upper bound on the candidate-set size used by
    tests: true matches + 3 sigma above the binomial FP mean."""
    n_miss = max(0, n_big - n_match)
    mean = n_miss * fpp
    return n_match + int(math.ceil(mean + 3.0 * math.sqrt(max(mean, 1.0)) + 3.0))


# ---------------------------------------------------------------------------
# Sketch-based JOIN-SIZE / KEY-SKEW estimation — the planner-side companion
# of the joins above.  |A JOIN B on k| = <f_A, f_B>, the inner product of the
# two key-frequency vectors (Alon-Matias-Szegedy generalized to join-size
# estimation), and per-key skew is F2 = <f, f> (the self-join size).  Both
# are answered from ONE CountSketch blob per side, built with the engine's
# two-phase pattern (per-partition packed partials, tree fan-in of the
# linear merge) — the raw keys never funnel anywhere.
#
# The canonical sparse/dense node rule (sketches/cms.py) makes this a
# continuum: while a side's distinct-key count stays within the node's
# sparse capacity the blob IS the exact frequency table and the answer is
# EXACT (zero error — how the driver oracle checks it); past that the dense
# AMS table answers with the published |err| = O(sqrt(F2_a*F2_b/width))
# w.h.p. bound.  ``width=None`` auto-sizes for the exact regime from the
# row counts (refusing past ``max_exact_bytes`` instead of silently
# degrading); at true scale the caller pins a width and takes the estimate.
#
# Reference parity: the reference's count-sketch layer (countmin/
# CountSketch.java estimate/merge) answers point frequencies; join-size /
# F2 is the classic planning query the same linear sketch supports.
# ---------------------------------------------------------------------------

_CS_JOIN_SEED = 77
_FLUSH_KEYS = 1 << 20


def _key_expr(df: DataFrame, key_col: str) -> Column:
    """int64 key view of a column: integral columns cast losslessly; other
    types go through xxhash64 (collision odds ~ n^2/2^64 — negligible, but
    the integral path is exact by construction)."""
    dt = df.schema[key_col].dataType.simpleString()
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return F.col(key_col).cast("long")
    return F.xxhash64(key_col)


def _cs_key_partials(df: DataFrame, key_col: str, depth: int, width: int,
                     seed: int) -> DataFrame:
    """(sketch binary) rows: one canonical cs blob per ~_FLUSH_KEYS keys per
    partition (bounded scratch; Arrow batches concatenated so tiny batches
    don't fragment the partial set)."""
    import numpy as np

    from ..sketches.cms import cs_partial_blobs_by_slot

    sel = df.where(F.col(key_col).isNotNull()).select(
        _key_expr(df, key_col).alias("k"))

    def gen(batches):
        buf: list = []
        total = 0

        def flush():
            keys = buf[0] if len(buf) == 1 else np.concatenate(buf)
            blob = cs_partial_blobs_by_slot(
                keys, np.zeros(len(keys), dtype=np.int64), 1,
                depth, width, seed)[0]
            return pd.DataFrame({"sketch": [blob]})

        for pdf in batches:
            if len(pdf) == 0:
                continue
            buf.append(pdf["k"].to_numpy(dtype="int64"))
            total += len(buf[-1])
            if total >= _FLUSH_KEYS:
                yield flush()
                buf, total = [], 0
        if total:
            yield flush()

    return sel.mapInPandas(gen, "sketch binary")


def cs_key_blob(df: DataFrame, key_col: str, depth: int, width: int,
                seed: int = _CS_JOIN_SEED, fanout: int = 64) -> bytes:
    """ONE canonical CountSketch blob over the non-null keys of ``key_col``
    (duplicates counted — it summarizes the frequency VECTOR).  Tree fan-in
    mirrors aggregates.sketch_aggregate: no task merges more than ~
    n_partials/fanout blobs, the final reduce sees <= fanout."""
    import numpy as np

    from ..sketches.cms import cs_merge_blob_groups, cs_partial_blobs_by_slot

    def merge_b(pdf: pd.DataFrame) -> pd.DataFrame:
        blobs = [bytes(b) for b in pdf["sketch"]]
        merged = cs_merge_blob_groups(
            blobs, np.array([len(blobs)], dtype=np.int64),
            depth, width, seed)[0]
        return pd.DataFrame({"_b": [int(pdf["_b"].iloc[0]) // fanout],
                             "sketch": [merged]})

    cur = _cs_key_partials(df, key_col, depth, width, seed).withColumn(
        "_b", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(fanout)))
    sch = "_b int, sketch binary"
    cur = cur.select("_b", "sketch").groupBy("_b").applyInPandas(merge_b, sch)
    cur = cur.withColumn("_b", F.lit(0)).groupBy("_b").applyInPandas(merge_b, sch)
    rows = cur.select("sketch").collect()
    if not rows:
        # empty side: the canonical EMPTY sparse node (inner product 0)
        return cs_partial_blobs_by_slot(
            np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), 1,
            depth, width, seed)[0]
    return bytes(rows[0]["sketch"])


def _exact_width(n_keys_bound: int, depth: int, max_exact_bytes: int) -> int:
    """Width whose sparse capacity (depth*width/2) covers ``n_keys_bound``
    distinct keys — the exact regime by construction (row count >= distinct
    count, so the bound is safe)."""
    if 16 * n_keys_bound > max_exact_bytes:
        raise ValueError(
            f"auto-sized exact blob would exceed {max_exact_bytes >> 20} MiB "
            f"for ~{n_keys_bound} keys: pass an explicit width to take the "
            "AMS estimate regime instead")
    return 2 * ((max(n_keys_bound, 1) + depth - 1) // depth) + 16


def _is_sparse(blob: bytes) -> bool:
    from ..sketches.cms import _MAGIC_CS_SP
    return bytes(blob)[0] == _MAGIC_CS_SP


def join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    on: str | tuple[str, str],
    depth: int = 5,
    width: int | None = None,
    seed: int = _CS_JOIN_SEED,
    fanout: int = 64,
    max_exact_bytes: int = 64 << 20,
) -> dict:
    """Estimate ``|a INNER JOIN b ON key|`` without running the join: two
    one-pass CountSketch blobs (shared depth/width/seed — required for the
    AMS dot), one driver-side inner product.  NULL keys never join on
    either engine, so both sides drop them.

    Returns ``{"est_join_size", "exact", "n_left", "n_right", "depth",
    "width"}``.  ``exact=True`` (both nodes sparse) means est_join_size is
    the true join cardinality as an integer-valued float; otherwise it is
    the unbiased AMS estimate within O(sqrt(F2_a*F2_b/width)) w.h.p.

    Scale shape: two columnar scans, zero shuffles of data rows (only
    sketch blobs move through the fan-in groupBys); the decision this
    feeds — broadcast vs shuffle vs skew-salt — is exactly what a planner
    wants BEFORE paying the exchange."""
    from ..sketches.cms import cs_inner_product_blobs

    left_col, right_col = _join_cols(on)
    n_a = a.where(F.col(left_col).isNotNull()).count()
    n_b = b.where(F.col(right_col).isNotNull()).count()
    if width is None:
        width = _exact_width(max(n_a, n_b), depth, max_exact_bytes)
    ba = cs_key_blob(a, left_col, depth, width, seed, fanout)
    bb = cs_key_blob(b, right_col, depth, width, seed, fanout)
    est = float(cs_inner_product_blobs([ba], [bb])[0])
    return {
        "est_join_size": est,
        "exact": _is_sparse(ba) and _is_sparse(bb),
        "n_left": n_a,
        "n_right": n_b,
        "depth": depth,
        "width": width,
    }


def key_skew_f2(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int | None = None,
    seed: int = _CS_JOIN_SEED,
    fanout: int = 64,
    max_exact_bytes: int = 64 << 20,
) -> dict:
    """Second frequency moment of ``key_col`` (= the SELF-join size
    sum_k f_k^2) from one CountSketch blob — the skew signal that decides
    salting before a shuffle: f2/n is the mean key multiplicity, and a
    uniform key set has f2 == n.  Exact in the sparse regime, AMS median
    (Var <= 2*F2^2/width per row) in the dense one."""
    from ..sketches.cms import f2_blobs

    n = df.where(F.col(key_col).isNotNull()).count()
    if width is None:
        width = _exact_width(n, depth, max_exact_bytes)
    blob = cs_key_blob(df, key_col, depth, width, seed, fanout)
    return {
        "f2": float(f2_blobs([blob])[0]),
        "exact": _is_sparse(blob),
        "n_rows": n,
        "depth": depth,
        "width": width,
    }


def plan_join(
    a: DataFrame,
    b: DataFrame,
    on: str | tuple[str, str],
    row_bytes: int = 100,
    broadcast_max_bytes: int = 32 << 20,
    skew_phi: tuple[int, int] = (1, 64),
    estimate_size: bool = False,
    seed: int = _CS_JOIN_SEED,
) -> dict:
    """JOIN-STRATEGY ADVISOR: the planning decision the sketch family exists
    to feed, made from the engine's own statistics BEFORE any exchange is
    paid.  Decision ladder (first match wins):

    1. ``broadcast`` — some side's estimated bytes (non-null key rows x
       ``row_bytes``) fit under ``broadcast_max_bytes``: ship it, no
       shuffle at all.
    2. ``salted_shuffle`` — either side has a key holding >= ``skew_phi``
       (num/den) of its rows (EXACT, via keystats.column_heavy_hitters'
       Misra-Gries superset + one verified count): a plain hash exchange
       would send that key's rows to ONE reduce task, so the hot keys
       (returned in ``hot_left``/``hot_right``) need salting
       (operators/skew.py).  ``salt_buckets`` suggests the fan-out that
       levels the heaviest key down to an average task's share.
    3. ``shuffle`` — a plain co-partitioned hash join is fine.

    ``estimate_size=True`` additionally runs ``join_size_estimate`` (two
    CountSketch passes) and reports ``est_join_size`` — the output-explosion
    early warning.  Returns a dict with the decision plus every piece of
    evidence, so a caller can log WHY.  All inputs to the decision are
    deterministic (exact counts, exact heavy keys, seed-fixed sketches) —
    same data, same answer, any cluster size."""
    from .keystats import column_heavy_hitters

    left_col, right_col = _join_cols(on)
    n_a = a.where(F.col(left_col).isNotNull()).count()
    n_b = b.where(F.col(right_col).isNotNull()).count()
    out: dict = {"n_left": n_a, "n_right": n_b}
    if estimate_size:
        out["est_join_size"] = join_size_estimate(
            a, b, (left_col, right_col), seed=seed)["est_join_size"]
    if min(n_a, n_b) * row_bytes <= broadcast_max_bytes:
        out["strategy"] = "broadcast"
        out["broadcast_side"] = "left" if n_a <= n_b else "right"
        return out
    num, den = skew_phi
    hot_a = [(r[left_col], r["n_rows"])
             for r in column_heavy_hitters(a, left_col, num, den).collect()]
    hot_b = [(r[right_col], r["n_rows"])
             for r in column_heavy_hitters(b, right_col, num, den).collect()]
    out["hot_left"], out["hot_right"] = sorted(hot_a), sorted(hot_b)
    if hot_a or hot_b:
        hottest = max(c for _, c in hot_a + hot_b)
        n_side = n_a if hot_a and (not hot_b or max(
            (c for _, c in hot_a), default=0) >= max(
            (c for _, c in hot_b), default=0)) else n_b
        # level the heaviest key down to an average key-task's share
        out["strategy"] = "salted_shuffle"
        out["salt_buckets"] = max(2, int(math.ceil(hottest * den / n_side)))
        return out
    out["strategy"] = "shuffle"
    return out


def _bin_expr(df: DataFrame, col: str, w: int) -> Column:
    """Floor-division bin of a numeric column, exact for integral types at
    any magnitude: (c - pmod(c, w)) / w — pmod is non-negative, so the
    result is the mathematical floor for negatives too (bare `div`
    truncates toward zero and would split bin -1 across the origin).
    Fractional types take F.floor(c / w) (their magnitudes sit far below
    the 2^53 double-precision cliff in any sane binning)."""
    dt = df.schema[col].dataType.simpleString()
    c = F.col(col)
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return ((c - F.pmod(c, F.lit(w))) / F.lit(w)).cast("long")
    return F.floor(c / F.lit(w)).cast("long")


def interval_point_join(
    points: DataFrame,
    pcol: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_width: int | None = None,
    max_bins_per_interval: int = 4096,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """INNER range join ``points.pcol BETWEEN intervals.start_col AND
    intervals.end_col`` (closed ends) WITHOUT the cartesian trap: Spark
    plans a bare inequality join as BroadcastNestedLoop/cartesian — O(n*m)
    compares — while this runs as an EQUI-join on a bin column.

    Binning: each interval explodes to the bins its span covers
    (``sequence(bin(start), bin(end))``); each point lands in exactly ONE
    bin, so every qualifying (point, interval) pair meets in exactly one
    bin — no dedup needed — and the exact BETWEEN predicate closes the
    contract.  Replication cost is ``len/width + 1`` rows per interval;
    ``bin_width=None`` derives the classic optimum ~ the MEAN interval
    length (one tiny agg), and any interval that would explode past
    ``max_bins_per_interval`` bins refuses loudly (a degenerate
    full-range interval would otherwise single-handedly quadratic the
    join) — raise the width or cap such intervals upstream.

    ``keys``: equi-join columns present on BOTH sides (e.g. user_id) —
    joined alongside the bin, so per-key workloads (attribution, per-user
    windows) shuffle on (key, bin) instead of colliding every key's rows
    in shared time bins (the bin-occupancy blowup at scale).

    Columns: result = all point columns + all interval columns (name
    collisions outside ``keys`` refused — alias upstream).  NULL points /
    NULL interval ends never match (BETWEEN is NULL-rejecting on both
    engines).  Timestamps: convert to epoch days/micros first (integral
    path is exact; keeps oracles timezone-free — the engine-wide
    discipline)."""
    keys = tuple(keys)
    missing = [k for k in keys if k not in points.columns or k not in intervals.columns]
    if missing:
        raise ValueError(f"keys {missing} must exist on both sides")
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"column collision {sorted(overlap)}: alias before joining")
    iv = intervals.where(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
        & (F.col(start_col) <= F.col(end_col)))
    if bin_width is None:
        mean_len = iv.agg(
            F.avg(F.col(end_col) - F.col(start_col))).first()[0]
        bin_width = max(1, int(math.ceil(float(mean_len or 0))) + 1)
    b0 = _bin_expr(iv, start_col, bin_width)
    b1 = _bin_expr(iv, end_col, bin_width)
    worst = iv.agg(F.max(b1 - b0 + 1)).first()[0]
    if worst is not None and worst > max_bins_per_interval:
        raise ValueError(
            f"an interval spans {worst} bins at width {bin_width} "
            f"(cap {max_bins_per_interval}): raise bin_width or cap the "
            "interval lengths upstream")
    iv_binned = iv.withColumn("_bin", F.explode(F.sequence(b0, b1)))
    pt = points.where(F.col(pcol).isNotNull()).withColumn(
        "_bin", _bin_expr(points, pcol, bin_width))
    return (
        pt.join(iv_binned, ["_bin", *keys])
        .where(F.col(pcol).between(F.col(start_col), F.col(end_col)))
        .drop("_bin")
    )


def interval_overlap_join(
    a: DataFrame,
    a_start: str,
    a_end: str,
    b: DataFrame,
    b_start: str,
    b_end: str,
    bin_width: int | None = None,
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """INNER join of two interval sets on OVERLAP (closed ends:
    ``a_start <= b_end AND b_start <= a_end``) as a binned EQUI-join.

    Both sides explode to their covering bins and meet on the shared bin —
    but an overlapping pair shares EVERY bin its overlap region spans, so
    the join additionally keeps only the bin containing the overlap's LEFT
    EDGE (``greatest(a_start, b_start)``), which lies in exactly one bin:
    each qualifying pair survives exactly once, no dedup shuffle.  The
    exact overlap predicate closes the contract; refusal/width/NULL rules
    are ``interval_point_join``'s."""
    overlap = set(a.columns) & set(b.columns)
    if overlap:
        raise ValueError(f"column collision {sorted(overlap)}: alias before joining")

    def clean(df, s, e):
        return df.where(F.col(s).isNotNull() & F.col(e).isNotNull()
                        & (F.col(s) <= F.col(e)))

    av, bv = clean(a, a_start, a_end), clean(b, b_start, b_end)
    if bin_width is None:
        mean_a = av.agg(F.avg(F.col(a_end) - F.col(a_start))).first()[0]
        mean_b = bv.agg(F.avg(F.col(b_end) - F.col(b_start))).first()[0]
        mean = max(float(mean_a or 0), float(mean_b or 0))
        bin_width = max(1, int(math.ceil(mean)) + 1)

    def binned(df, s, e, tag):
        b0, b1 = _bin_expr(df, s, bin_width), _bin_expr(df, e, bin_width)
        worst = df.agg(F.max(b1 - b0 + 1)).first()[0]
        if worst is not None and worst > max_bins_per_interval:
            raise ValueError(
                f"a {tag}-side interval spans {worst} bins at width "
                f"{bin_width} (cap {max_bins_per_interval}): raise bin_width "
                "or cap the interval lengths upstream")
        return df.withColumn("_bin", F.explode(F.sequence(b0, b1)))

    ab, bb = binned(av, a_start, a_end, "a"), binned(bv, b_start, b_end, "b")
    left_edge = F.greatest(F.col(a_start), F.col(b_start))
    edge_bin = (
        (left_edge - F.pmod(left_edge, F.lit(bin_width))) / F.lit(bin_width)
    ).cast("long")
    dt = a.schema[a_start].dataType.simpleString()
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        edge_bin = F.floor(left_edge / F.lit(bin_width)).cast("long")
    return (
        ab.join(bb.withColumnRenamed("_bin", "_bin_b"),
                F.col("_bin") == F.col("_bin_b"))
        .where((F.col(a_start) <= F.col(b_end))
               & (F.col(b_start) <= F.col(a_end))
               & (F.col("_bin") == edge_bin))
        .drop("_bin", "_bin_b")
    )
