"""Column-level key-set statistics for join/shuffle planning.

The relational planning companion of ``operators/joins.join_size_estimate``:
before paying a shuffle, a planner wants to know how two tables' key columns
RELATE — how many distinct keys each side has, how much the key sets overlap
(FK coverage, pre-join selectivity), and which individual values are heavy
enough to need salting.  All three are answered here from ONE columnar scan
per side with only tiny sketch states moving between tasks:

* ``key_overlap``     — bottom-k (KMV) Jaccard/containment between two key
  columns.  Every output is a DETERMINISTIC VALUE (pure function of the two
  distinct-key sets through the seed-fixed priority hash), so it is
  SQL-oracle-checkable in every regime; when the union carries fewer than k
  distinct keys the numbers are additionally EXACT.
* ``key_setops``      — |A|, |B|, |A ∪ B|, |A ∩ B| between two key columns
  from one HLL node per side (pairwise register-max union is lossless,
  intersection by inclusion-exclusion).  With ``p=None`` the node is
  auto-sized to stay in the canonical SPARSE-EXACT regime (sketches/hll.py
  magic 13) at the observed row counts — exact integers, refusing past
  ``max_exact_bytes`` instead of silently degrading; an explicit ``p`` takes
  the dense-regime estimates within the 1.04/sqrt(2^p) envelope.
* ``column_heavy_hitters`` — the EXACT set of column values whose frequency
  reaches ``phi`` of the rows, via the engine's Misra-Gries superset
  discipline (sketches/spacesaving.py): the MG pass over hashed keys yields
  a candidate set GUARANTEED to contain every phi-heavy value
  (``for_phi`` sizing makes the certificate unconditional; hash collisions
  only ever ADD candidates), then one exact count over the <= k+1 broadcast
  candidates decides.  This is the "which keys to salt" answer that
  ``joins.key_skew_f2``'s scalar skew signal cannot give.

Scale shape shared by all three: per-partition Arrow/numpy partials, tree
fan-in of serialized states (operators/aggregates.sketch_aggregate), zero
shuffles of data rows; the heavy-hitter verify filters through a broadcast
``isin`` over at most k+1 hashed keys before its exact aggregation.

Reference parity: lifts the reference's per-window sketch estimators
(membership/BloomFilter.java:61-66 distinct, countmin/CountSketch.java
frequency) to RELATIONAL key columns, the same generalization the window
rollup family made for hierarchy slices (operators/rollup.py range_setops /
range_heavy_hitters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sketches import hll as hll_kernels
from ..sketches.samplers import BottomKSampler, jaccard_blobs
from ..sketches.spacesaving import MisraGries
from .aggregates import collect_sketch, sketch_aggregate
from .joins import _key_expr

_OVERLAP_SEED = 29


def _keys_df(df: DataFrame, key_col: str) -> DataFrame:
    """Non-null int64 key view of a column (lossless cast for integral
    types, xxhash64 otherwise — see joins._key_expr)."""
    return df.where(F.col(key_col).isNotNull()).select(
        _key_expr(df, key_col).alias("k"))


# ---------------------------------------------------------------------------
# bottom-k (KMV) overlap
# ---------------------------------------------------------------------------


def key_bottomk(df: DataFrame, key_col: str, k: int,
                seed: int = _OVERLAP_SEED) -> BottomKSampler:
    """ONE BottomKSampler over the distinct keys of ``key_col`` — the exact
    bottom-k distinct sample (order-free merges; sketches/samplers.py)."""
    sk = collect_sketch(sketch_aggregate(
        _keys_df(df, key_col), "k", lambda: BottomKSampler(k, seed)))
    return sk if sk is not None else BottomKSampler(k, seed)


def key_overlap(
    a: DataFrame,
    col_a: str,
    b: DataFrame,
    col_b: str,
    k: int = 256,
    seed: int = _OVERLAP_SEED,
) -> dict:
    """KMV overlap statistics between the distinct-key sets of two columns.

    Returns ``{"n_sample", "n_match", "est_jaccard", "est_distinct_a",
    "est_distinct_b", "exact"}``:

    * ``n_sample``  = |bottom-k(A ∪ B)| (< k iff the union has < k distinct
      keys — then everything is exact),
    * ``n_match``   = union-sample entries present in BOTH sides' samples
      (sound: a union-sample entry from A is necessarily in bottom-k(A)),
    * ``est_jaccard`` = n_match / n_sample — the standard KMV estimator,
    * ``est_distinct_*`` = per-side bottom-k cardinality estimates.

    Every output is a pure function of the two distinct-key sets (the
    priority hash is seed-fixed), hence deterministic across runs, engines
    and cluster sizes — the property the driver's bit-exact SplitMix64 SQL
    twin checks.  Containment A ⊆ B follows as n_match / |sample entries
    from A| if needed; ``est_jaccard`` is what join planners consume.
    """
    sa = key_bottomk(a, col_a, k, seed)
    sb = key_bottomk(b, col_b, k, seed)
    n_sample, n_match, est = jaccard_blobs(
        [sa.to_bytes()], [sb.to_bytes()], k, seed)
    return {
        "n_sample": int(n_sample[0]),
        "n_match": int(n_match[0]),
        "est_jaccard": float(est[0]),
        "est_distinct_a": float(sa.estimate_distinct()),
        "est_distinct_b": float(sb.estimate_distinct()),
        "exact": int(n_sample[0]) < k,
    }


# ---------------------------------------------------------------------------
# HLL set algebra
# ---------------------------------------------------------------------------

_FLUSH_KEYS = 1 << 20


def key_hll_blob(df: DataFrame, key_col: str, p: int, seed: int,
                 fanout: int = 64) -> bytes:
    """ONE canonical HLL node (sparse-exact while nnz <= 2^p/8, dense
    beyond — sketches/hll.py) over the distinct keys of ``key_col``.
    Two-phase: per-partition packed partials via mapInPandas (bounded
    scratch, Arrow batches concatenated), tree fan-in of the blob merge —
    no data row ever shuffles."""

    def gen(batches):
        buf: list = []
        total = 0

        def flush():
            keys = buf[0] if len(buf) == 1 else np.concatenate(buf)
            blob = hll_kernels.partial_blobs_by_slot(
                keys, np.zeros(len(keys), dtype=np.int64), 1, p, seed)[0]
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

    def merge_b(pdf: pd.DataFrame) -> pd.DataFrame:
        blobs = [bytes(x) for x in pdf["sketch"]]
        merged = hll_kernels.merge_blob_groups(
            blobs, np.array([len(blobs)], dtype=np.int64), p)[0]
        return pd.DataFrame({"_b": [int(pdf["_b"].iloc[0]) // fanout],
                             "sketch": [merged]})

    cur = _keys_df(df, key_col).mapInPandas(gen, "sketch binary").withColumn(
        "_b", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(fanout)))
    sch = "_b int, sketch binary"
    cur = cur.select("_b", "sketch").groupBy("_b").applyInPandas(merge_b, sch)
    cur = cur.withColumn("_b", F.lit(0)).groupBy("_b").applyInPandas(merge_b, sch)
    rows = cur.select("sketch").collect()
    if not rows:
        return hll_kernels.empty_blob(p, seed)
    return bytes(rows[0]["sketch"])


def _auto_p(n_keys_bound: int, max_exact_bytes: int) -> int:
    """Smallest p whose sparse capacity 2^p/8 covers ``n_keys_bound``
    distinct keys (row count >= distinct count, so the bound is safe)."""
    if 8 * n_keys_bound > max_exact_bytes:
        raise ValueError(
            f"auto-sized exact HLL node would exceed "
            f"{max_exact_bytes >> 20} MiB for ~{n_keys_bound} keys: pass an "
            "explicit p to take the dense-estimate regime instead")
    p = 4
    while (1 << p) // 8 < max(n_keys_bound, 1):
        p += 1
    return p


def key_setops(
    a: DataFrame,
    col_a: str,
    b: DataFrame,
    col_b: str,
    p: int | None = None,
    seed: int = _OVERLAP_SEED,
    max_exact_bytes: int = 64 << 20,
) -> dict:
    """Set-operation cardinalities between the distinct-key sets of two
    columns: ``{"est_a", "est_b", "est_union", "est_intersect", "exact",
    "p"}``.  |A ∪ B| comes from the pairwise HLL merge (register max /
    sparse set union — lossless), |A ∩ B| by inclusion-exclusion
    (max(0, |A|+|B|-|A∪B|); its additive error scales with the UNION's
    envelope).  Set differences follow as est_a - est_intersect.

    ``p=None`` auto-sizes the node so both sides (hence their union, by nnz
    monotonicity) stay in the canonical sparse-exact regime at the observed
    row counts — all four outputs are then exact integers (``exact=True``),
    which is what the driver's DuckDB COUNT(DISTINCT) twin checks.  At true
    scale pass an explicit ``p`` (1.04/sqrt(2^p) relative error, 2^p bytes
    per node)."""
    if p is None:
        n_a = a.where(F.col(col_a).isNotNull()).count()
        n_b = b.where(F.col(col_b).isNotNull()).count()
        p = _auto_p(max(n_a, n_b, 1), max_exact_bytes)
    ba = key_hll_blob(a, col_a, p, seed)
    bb = key_hll_blob(b, col_b, p, seed)
    bu = hll_kernels.merge_blob_groups(
        [ba, bb], np.array([2], dtype=np.int64), p)[0]
    est_a, est_b, est_u = hll_kernels.estimate_blobs([ba, bb, bu], p)
    sp = hll_kernels._MAGIC_HLL_SP
    return {
        "est_a": float(est_a),
        "est_b": float(est_b),
        "est_union": float(est_u),
        "est_intersect": float(max(0.0, est_a + est_b - est_u)),
        "exact": bytes(bu)[0] == sp,  # union sparse => both sides sparse
        "p": p,
    }


# ---------------------------------------------------------------------------
# exact heavy values (Misra-Gries superset + one exact count)
# ---------------------------------------------------------------------------


def column_heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi_num: int,
    phi_den: int,
) -> DataFrame:
    """EXACT heavy values of a column: ``(key_col, n_rows)`` for every value
    whose row count satisfies ``n_rows * phi_den >= phi_num * n_total``
    (integer arithmetic — no float threshold can flip across engines).

    Two-pass superset discipline (the engine's range_heavy_hitters
    certificate lifted to a relational column): (1) one Misra-Gries pass
    over the hashed int64 key view, ``for_phi`` sizing so err_bound <
    phi*n unconditionally — every phi-heavy value's hash is then tracked
    (a hash collision only inflates a tracked count, so candidates can
    gain members, never lose them); (2) the <= k+1 candidate hashes
    broadcast into an ``isin`` filter, ONE exact groupBy over the
    surviving rows, and the integer threshold (n_total is tracked exactly
    by the sketch) decides.  Aggregation state is bounded by the candidate
    count, not the column's cardinality."""
    if phi_num <= 0 or phi_den <= 0 or phi_num > phi_den:
        raise ValueError("phi_num/phi_den must be a fraction in (0, 1]")
    # integer for_phi sizing: k = ceil(phi_den/phi_num) gives k+1 > 1/phi
    # with no float rounding in the certificate arithmetic
    k = -(-phi_den // phi_num)
    sk = collect_sketch(sketch_aggregate(
        _keys_df(df, key_col), "k", lambda: MisraGries(k)))
    spark = df.sparkSession
    if sk is None or sk.n_total == 0:
        return spark.createDataFrame(
            [], df.select(key_col).schema.add("n_rows", "long"))
    cand = [int(x) for x in sk.keys]
    n_total = int(sk.n_total)
    return (
        df.where(F.col(key_col).isNotNull())
        .where(_key_expr(df, key_col).isin(cand))
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") * phi_den >= phi_num * n_total)
    )
