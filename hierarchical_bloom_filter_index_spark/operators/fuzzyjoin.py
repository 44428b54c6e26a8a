"""Edit-distance similarity JOINS — SymSpell deletion neighborhoods as a
distributed equi-join, exact Levenshtein verification.

The engine's k-edit machinery (operators/approx.py) finds a PATTERN in a
token corpus; this module answers the TABLE-shaped sibling every entity-
resolution / vocabulary-cleanup pipeline needs: all pairs of strings (within
one column, or across two tables) at Levenshtein distance <= d.  A naive
answer is the cross join — O(n*m) Levenshtein calls, untenable past 10^5
rows.  The standard scalable blocking (Garbe's SymSpell, itself the
symmetric-delete refinement of FastSS) is:

    lev(x, y) <= d  ==>  D_d(x) ∩ D_d(y) != ∅

where ``D_d(s)`` is the set of strings reachable from ``s`` by deleting at
most ``d`` characters (take an optimal alignment of x and y: deleting from
each side the <= d positions that the alignment substitutes/inserts leaves
the alignment's common subsequence in both neighborhoods).  So candidates
are found by an EQUI-join on exploded deletion variants — Spark's native
shuffle shape, ~(1 + L + C(L,2)...) variant rows per string of length L —
and the exact ``levenshtein() <= d`` predicate (JVM built-in, identical
semantics to DuckDB's — unit-cost insert/delete/substitute) decides.  The
sketch-prunes/exact-decides discipline, applied to string blocking.

Scale guards: inputs are deduplicated to DISTINCT strings first (duplicate
rows would square inside every bucket for nothing — join results back on
the string if row context is needed), the candidate pair set is distinct-ed
BEFORE verification (two strings can share many variants), a length-band
prefilter (|len(x) - len(y)| <= d, a Levenshtein lower bound) cuts
candidates before the DP, and a hot-variant refusal cap bounds the one
quadratic-in-bucket step — a degenerate vocabulary (thousands of strings
collapsing onto one variant) refuses loudly instead of silently exploding,
the same contract as the interval-join bin bomb (operators/joins.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "deletion_variants_expr",
    "edit_self_pairs",
    "edit_similarity_join",
]


def _del1_sql(x: str) -> str:
    """SQL for the 1-deletion set of ``{x}`` (array<string>; empty input ->
    empty array — NB sequence(1, 0) would count DOWN in Spark, hence the
    guard)."""
    return (
        f"CASE WHEN length({x}) = 0 THEN array() "
        f"ELSE transform(sequence(1, length({x})), "
        f"i -> concat(substring({x}, 1, i - 1), substring({x}, i + 1))) END"
    )


def deletion_variants_expr(col: str, max_deletes: int) -> Column:
    """array<string> of every string reachable from ``col`` by deleting at
    most ``max_deletes`` characters (the string itself included) — a pure
    whole-stage-codegen expression (nested transform/flatten HOFs, no
    Python).  Size: sum_{k<=d} C(L, k) entries for length L before the
    distinct collapse."""
    if max_deletes < 1:
        raise ValueError(f"max_deletes must be >= 1, got {max_deletes}")
    cur = f"array({col})"
    for _ in range(max_deletes):
        cur = (
            f"array_distinct(flatten(transform({cur}, "
            f"x -> concat(array(x), {_del1_sql('x')}))))"
        )
    return F.expr(cur)


def _variant_frame(df: DataFrame, col: str, max_dist: int,
                   out_word: str) -> DataFrame:
    """(variant ``_v``, distinct string ``out_word``) — the blocking keys."""
    return (
        df.where(F.col(col).isNotNull())
        .select(F.col(col).alias(out_word))
        .distinct()
        .select(out_word,
                F.explode(deletion_variants_expr(out_word, max_dist)).alias("_v"))
    )


def _check_hot_variants(variants: DataFrame, max_bucket: int | None,
                        tag: str) -> None:
    if max_bucket is None:
        return
    top = (variants.groupBy("_v").agg(F.count(F.lit(1)).alias("n"))
           .agg(F.max("n")).first()[0])
    if top is not None and top > max_bucket:
        raise ValueError(
            f"edit join: a {tag} deletion variant blocks {top} strings "
            f"(cap {max_bucket}) — the candidate join would be quadratic in "
            "that bucket; raise max_bucket knowingly, shorten max_dist, or "
            "pre-filter the degenerate strings")


def edit_similarity_join(
    a: DataFrame,
    a_col: str,
    b: DataFrame,
    b_col: str,
    max_dist: int = 1,
    max_bucket: int | None = 100_000,
    dist_col: str = "dist",
) -> DataFrame:
    """All (``a_col``, ``b_col``, ``dist``) pairs of DISTINCT strings with
    ``levenshtein(a_col, b_col) <= max_dist`` — deletion-variant equi-join
    candidates, exact verification.  Output column names are ``a_col`` /
    ``b_col`` (must differ — alias upstream for a shared name); every
    qualifying pair appears exactly once."""
    if a_col == b_col:
        raise ValueError("a_col and b_col must differ — alias one upstream")
    va = _variant_frame(a, a_col, max_dist, a_col)
    vb = _variant_frame(b, b_col, max_dist, b_col)
    _check_hot_variants(va, max_bucket, "left")
    _check_hot_variants(vb, max_bucket, "right")
    return (
        va.join(vb, "_v")
        # length band (a Levenshtein lower bound) BEFORE the distinct — it
        # commutes with dedup and cuts the pair shuffle, not just the DP
        .where(F.abs(F.length(a_col) - F.length(b_col)) <= max_dist)
        .select(a_col, b_col)
        .distinct()
        .withColumn(dist_col, F.levenshtein(a_col, b_col))
        .where(F.col(dist_col) <= max_dist)
    )


def edit_self_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 1,
    max_bucket: int | None = 100_000,
    out_cols: tuple[str, str, str] = ("w_a", "w_b", "dist"),
) -> DataFrame:
    """All unordered pairs of DISTINCT values of ``col`` within Levenshtein
    distance ``max_dist`` — ``(w_a, w_b, dist)`` with ``w_a < w_b`` (each
    pair once, deterministic orientation).  The self-join halves work by
    ordering inside the bucket join itself."""
    wa, wb, dc = out_cols
    v = _variant_frame(df, col, max_dist, "_w")
    _check_hot_variants(v, max_bucket, "self")
    left = v.select(F.col("_w").alias(wa), "_v")
    right = v.select(F.col("_w").alias(wb), "_v")
    return (
        left.join(right, "_v")
        .where((F.col(wa) < F.col(wb))
               & (F.abs(F.length(wa) - F.length(wb)) <= max_dist))
        .select(wa, wb)
        .distinct()
        .withColumn(dc, F.levenshtein(wa, wb))
        .where(F.col(dc) <= max_dist)
    )
