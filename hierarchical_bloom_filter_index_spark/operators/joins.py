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
