"""Snapshot DIFF — added / removed / changed rows between two corpus
versions, by key.

The maintenance surfaces of this engine (append/remove/takedown/stream
deltas) all ANSWER "apply this change"; a data platform also needs the
inverse question — WHAT changed between two snapshots (yesterday's crawl vs
today's, the pre- and post-scrub corpus, two branches of a dataset) — to
audit pipelines, build incremental-processing worklists (only re-index the
``changed`` + ``added`` keys, takedown the ``removed``), and gate releases.

Shape: ONE full outer join on the key (the minimal possible work — every
row's fate must be decided), with column pruning to key + compared columns
before the exchange.  Two comparison modes:

* ``method="exact"`` (default): per-column null-safe equality — the
  engine-wide exactness discipline; what the DuckDB oracle checks.
* ``method="hash"``: compare ``xxhash64`` of the compared columns instead —
  at 100 TB this is the shape you want when rows are wide (the shuffle
  carries key + 8 bytes per side instead of whole documents); a false
  ``unchanged`` needs an xxhash64 collision on the same key (~2^-64 per
  key — negligible, but not exact, so it is opt-in).  Both modes shuffle
  once; hash mode just shrinks the rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

__all__ = ["snapshot_diff", "snapshot_diff_counts"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str],
    include_unchanged: bool = False,
    method: str = "exact",
    status_col: str = "status",
) -> DataFrame:
    """(``id_col``, ``status``) per key across the two snapshots: ``added``
    (key only in ``new``), ``removed`` (only in ``old``), ``changed`` (both
    sides, some compared column differs — NULL-safe), and, when
    ``include_unchanged``, ``unchanged``.  Keys must be unique per side
    (it's a snapshot, not a log); NULL keys are refused — a NULL never
    equals itself in a join, so its fate would be meaningless."""
    if method not in ("exact", "hash"):
        raise ValueError(f"method must be 'exact' or 'hash', got {method!r}")
    if not compare_cols:
        raise ValueError("compare_cols must name at least one column")

    def side(df: DataFrame, tag: str) -> DataFrame:
        sel = df.where(F.col(id_col).isNotNull())
        if method == "hash":
            return sel.select(
                F.col(id_col).alias(f"{tag}_id"),
                F.xxhash64(*compare_cols).alias(f"{tag}_h"))
        return sel.select(
            F.col(id_col).alias(f"{tag}_id"),
            *[F.col(c).alias(f"{tag}_{c}") for c in compare_cols])

    o, n = side(old, "o"), side(new, "n")
    j = o.join(n, o["o_id"] == n["n_id"], "full_outer")
    if method == "hash":
        same = F.col("o_h").eqNullSafe(F.col("n_h"))
    else:
        same = reduce(
            lambda acc, c: acc & F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")),
            compare_cols[1:],
            F.col(f"o_{compare_cols[0]}").eqNullSafe(F.col(f"n_{compare_cols[0]}")),
        )
    status = (
        F.when(F.col("o_id").isNull(), F.lit("added"))
        .when(F.col("n_id").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = j.select(
        F.coalesce(F.col("o_id"), F.col("n_id")).alias(id_col),
        status.alias(status_col),
    )
    if not include_unchanged:
        out = out.where(F.col(status_col) != "unchanged")
    return out


def snapshot_diff_counts(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str],
    method: str = "exact",
) -> DataFrame:
    """(status, n) summary of a diff, ``unchanged`` included — the one-line
    release-gate view."""
    return (
        snapshot_diff(old, new, id_col, compare_cols,
                      include_unchanged=True, method=method)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
