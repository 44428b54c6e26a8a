"""Declarative data-quality expectations: a constraint list validated in
as few passes as the constraint types allow, with exact violation counts.

A pipeline gates ingestion on "o_orderkey is unique, o_totalprice in
[0, 1e6], o_custkey references customer, row count in bounds" — the
dbt-test / Great-Expectations surface. Everything here is EXACT integer
counting, so the DuckDB twins are value equalities.

Pass structure (design-for-100-TB):
- ALL scalar constraints (not_null / in_range / accepted_values /
  regex_match / row_count_between) compile into ONE aggregate over ONE
  scan — a SUM(CASE WHEN violated) per constraint plus the row count,
  map-side combined, one row out. Adding a scalar constraint adds an
  expression, not a pass.
- Each `unique` constraint is one map-side-combined groupBy on its
  column (duplicate mass = sum(cnt-1) over groups with cnt>1 — the
  number of rows you would have to delete to make it unique).
- Each `fk` constraint is one LEFT ANTI broadcast join against the
  DISTINCT referenced keys (dimension side by contract; NULLs are
  not_null's business, fk counts only non-null orphans).

Constraint tuples:
    ("not_null", col)
    ("in_range", col, lo, hi)            # non-null rows outside [lo, hi]
    ("accepted_values", col, [v, ...])   # non-null rows not in the list
    ("regex_match", col, pattern)        # non-null rows NOT fully matching
                                         # (Java/RE2 agreement subset — no
                                         # lookaround/backrefs, see pii.py)
    ("row_count_between", lo, hi)        # violations = 0 or 1
    ("freshness", col, min_max)          # MAX(col) >= min_max (wall-time
                                         # literal for timestamps — both
                                         # engines compare NTZ wall time,
                                         # no session-tz dependence);
                                         # violations = 0 or 1
    ("unique", col)
    ("fk", col, dim_name, dim_col)       # dims={"dim_name": DataFrame}

Output: one row per constraint —
    (constraint, violations, n_rows, passed)
ordered deterministically by the constraint string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["check_constraints", "constraint_name"]


def constraint_name(c: tuple) -> str:
    kind = c[0]
    if kind == "row_count_between":
        return f"row_count_between({c[1]}, {c[2]})"
    if kind == "freshness":
        return f"freshness({c[1]}, {c[2]})"
    if kind in ("not_null", "unique"):
        return f"{kind}({c[1]})"
    if kind == "in_range":
        return f"in_range({c[1]}, {c[2]}, {c[3]})"
    if kind == "accepted_values":
        vals = ", ".join(str(v) for v in c[2])
        return f"accepted_values({c[1]}, [{vals}])"
    if kind == "regex_match":
        return f"regex_match({c[1]}, {c[2]})"
    if kind == "fk":
        return f"fk({c[1]} -> {c[2]}.{c[3]})"
    raise ValueError(f"unknown constraint kind {kind!r}")


def _scalar_violation(c: tuple):
    """The per-row 'violated' predicate for single-scan constraints."""
    kind = c[0]
    if kind == "not_null":
        return F.col(c[1]).isNull()
    if kind == "in_range":
        col, lo, hi = F.col(c[1]), c[2], c[3]
        return col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi)))
    if kind == "accepted_values":
        col = F.col(c[1])
        return col.isNotNull() & ~col.isin(list(c[2]))
    if kind == "regex_match":
        col = F.col(c[1])
        return col.isNotNull() & ~col.rlike(f"^(?:{c[2]})$")
    return None


def check_constraints(
    df: DataFrame,
    constraints: list[tuple],
    dims: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """(constraint, violations, n_rows, passed) — exact counts, one row
    per constraint, ordered by constraint name. See the module doc for
    the pass structure; an empty constraint list refuses (a vacuous
    'all green' report is a bug magnet)."""
    if not constraints:
        raise ValueError("check_constraints: empty constraint list")
    dims = dims or {}
    names = [constraint_name(c) for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError("check_constraints: duplicate constraints")

    scalars: list[tuple[str, object]] = []   # (name, predicate)
    rc_bounds: list[tuple[str, int, int]] = []
    fresh: list[tuple[str, str]] = []        # (name, max alias)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in constraints:
        kind = c[0]
        pred = _scalar_violation(c)
        if pred is not None:
            alias = f"_v{len(scalars)}"
            scalars.append((constraint_name(c), alias))
            aggs.append(
                F.coalesce(F.sum(pred.cast("long")), F.lit(0))
                .cast("long").alias(alias))
        elif kind == "row_count_between":
            rc_bounds.append((constraint_name(c), int(c[1]), int(c[2])))
        elif kind == "freshness":
            alias = f"_fr{len(fresh)}"
            fresh.append((constraint_name(c), alias))
            # MAX rides the same single aggregate; the threshold compare
            # happens on the one-row result. Literal cast to the COLUMN's
            # type — timestamps compare as wall time on both engines.
            aggs.append(
                (F.max(F.col(c[1]))
                 >= F.lit(c[2]).cast(df.schema[c[1]].dataType))
                .alias(alias))
        elif kind == "fk":
            if c[2] not in dims:
                raise ValueError(f"fk constraint references unknown dim "
                                 f"{c[2]!r} — pass it via dims=")
        elif kind != "unique":
            raise ValueError(f"unknown constraint kind {kind!r}")

    scalar_row = df.agg(*aggs)

    parts: list[DataFrame] = []
    if scalars or rc_bounds or fresh:
        exprs = [
            F.struct(F.lit(nm).alias("constraint"),
                     F.col(alias).alias("violations"))
            for nm, alias in scalars
        ] + [
            F.struct(
                F.lit(nm).alias("constraint"),
                F.when((F.col("_n_rows") >= F.lit(lo))
                       & (F.col("_n_rows") <= F.lit(hi)), F.lit(0))
                .otherwise(F.lit(1)).cast("long").alias("violations"))
            for nm, lo, hi in rc_bounds
        ] + [
            # NULL max (all-null / empty column) is NOT fresh
            F.struct(
                F.lit(nm).alias("constraint"),
                F.when(F.coalesce(F.col(alias), F.lit(False)), F.lit(0))
                .otherwise(F.lit(1)).cast("long").alias("violations"))
            for nm, alias in fresh
        ]
        parts.append(
            scalar_row.select(
                F.explode(F.array(*exprs)).alias("_c"), "_n_rows")
            .select(F.col("_c.constraint").alias("constraint"),
                    F.col("_c.violations").alias("violations"), "_n_rows"))

    n_rows_1 = scalar_row.select("_n_rows")
    for c in constraints:
        if c[0] == "unique":
            dup_mass = (
                df.where(F.col(c[1]).isNotNull())
                .groupBy(c[1]).agg(F.count(F.lit(1)).alias("_cnt"))
                .where(F.col("_cnt") > 1)
                .agg(F.coalesce(F.sum(F.col("_cnt") - 1), F.lit(0))
                     .cast("long").alias("violations"))
            )
            parts.append(
                dup_mass.crossJoin(n_rows_1).select(
                    F.lit(constraint_name(c)).alias("constraint"),
                    "violations", "_n_rows"))
        elif c[0] == "fk":
            _, col, dim_name, dim_col = c
            keys = dims[dim_name].select(
                F.col(dim_col).alias(col)).distinct()
            orphans = (
                df.select(col).where(F.col(col).isNotNull())
                .join(F.broadcast(keys), col, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            )
            parts.append(
                orphans.crossJoin(n_rows_1).select(
                    F.lit(constraint_name(c)).alias("constraint"),
                    "violations", "_n_rows"))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.select(
            "constraint",
            "violations",
            F.col("_n_rows").alias("n_rows"),
            (F.col("violations") == 0).alias("passed"))
        .orderBy("constraint")
    )


# ---------------------------------------------------------------------------
# streaming: per-micro-batch constraint reports
# ---------------------------------------------------------------------------
#: constraint kinds whose violation counts ADD across batch splits —
#: per-batch reports sum to the whole-corpus report for exactly these.
#: `unique` and `row_count_between` are whole-dataset properties: a
#: duplicate straddling two batches is invisible per-batch BY DESIGN
#: (cross-batch uniqueness belongs to a keyed state store / the gram-df
#: style index, not a stateless per-batch gate).
ADDITIVE_KINDS = ("not_null", "in_range", "accepted_values", "regex_match",
                  "fk")


def expectations_stream(
    spark,
    input_path: str,
    checkpoint_path: str,
    out_path: str,
    constraints: list[tuple],
    schema: str,
    dims: dict[str, DataFrame] | None = None,
):
    """Structured Streaming data-quality gate: every micro-batch of a
    file stream is validated with the SAME check_constraints pass and
    its report rows (plus batch_id) appended via the shared
    replay-guarded foreachBatch discipline — at-least-once redelivery
    cannot double-count a batch. ``dims`` are static frames (stream-
    static broadcast inside the batch job). Per-batch reports are the
    monitoring surface; for ADDITIVE_KINDS their violation/n_rows sums
    equal the whole-corpus report (the parity gate). Returns the started
    availableNow query."""
    from ..streaming.incremental import replay_guarded_append

    def build(batch_df: DataFrame) -> DataFrame:
        return check_constraints(batch_df, constraints, dims=dims)

    stream = spark.readStream.schema(schema).parquet(input_path)
    return (
        stream.writeStream
        .foreachBatch(lambda df, bid: replay_guarded_append(
            out_path, df, bid, build))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_expectation_totals(spark, out_path: str) -> DataFrame:
    """Fold the per-batch reports: (constraint, violations, n_rows) —
    sums across batches. Equal to the whole-corpus report for
    ADDITIVE_KINDS constraints."""
    return (
        spark.read.parquet(out_path)
        .groupBy("constraint")
        .agg(F.sum("violations").cast("long").alias("violations"),
             F.sum("n_rows").cast("long").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# auto data contracts: suggest constraints from a profile
# ---------------------------------------------------------------------------
def suggest_constraints(profile_df: DataFrame) -> list[tuple]:
    """AUTO DATA CONTRACT from a column profile (operators/profile.py):
    mint constraints ONLY from the profile's EXACT fields — not_null(col)
    iff n_null == 0, in_range(col, min, max) whenever min/max exist. The
    estimate-backed fields deliberately suggest NOTHING: a unique
    constraint minted from an HLL n_distinct that is off by one would
    assert something false about the very snapshot it was learned from
    (and top_value/MG can only name one value, never the accepted set).
    The suggestions are validated by check_constraints — learn the
    contract on snapshot A, enforce on snapshot B; violations are the
    drift signal, ordered deterministically by column name."""
    rows = profile_df.select("col_name", "n", "n_null", "min", "max").collect()
    out: list[tuple] = []
    for r in sorted(rows, key=lambda r: r["col_name"]):
        if r["n"] > 0 and r["n_null"] == 0:
            out.append(("not_null", r["col_name"]))
        if r["min"] is not None and r["max"] is not None:
            # profile min/max are LONG by PROFILE_SCHEMA (the profiler
            # only accepts integral columns), so int() is a no-op cast,
            # never a truncation
            out.append(("in_range", r["col_name"], int(r["min"]),
                        int(r["max"])))
    if not out:
        raise ValueError("suggest_constraints: profile yields no "
                         "constraints (empty table?)")
    return out


# ---------------------------------------------------------------------------
# row-level routing: quarantine
# ---------------------------------------------------------------------------
def quarantine(
    df: DataFrame,
    constraints: list[tuple],
    dims: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Row-level routing — every row annotated with ``violated``: the
    SORTED '|'-joined names of the constraints it breaks (empty string =
    clean, route to the pipeline; else route to quarantine with the
    reasons attached). Scalar constraints stay projections; each
    `unique` adds one window count over its column (rows of duplicate
    groups all flag — the report counts kept-one-delete-rest, but a
    ROUTER cannot pick a survivor, that's dedup's job); each `fk` adds
    one broadcast left join. `row_count_between` is dataset-level and
    refuses here (a row cannot violate it)."""
    if not constraints:
        raise ValueError("quarantine: empty constraint list")
    dims = dims or {}
    from pyspark.sql import Window

    out = df
    flags = []
    for i, c in enumerate(constraints):
        kind = c[0]
        name = constraint_name(c)
        pred = _scalar_violation(c)
        if pred is not None:
            pass  # projection, no plumbing
        elif kind == "unique":
            w = Window.partitionBy(c[1])
            flag = f"_uq{i}"
            out = out.withColumn(
                flag, F.col(c[1]).isNotNull()
                & (F.count(F.lit(1)).over(w) > 1))
            pred = F.col(flag)
        elif kind == "fk":
            _, col, dim_name, dim_col = c
            if dim_name not in dims:
                raise ValueError(f"fk constraint references unknown dim "
                                 f"{dim_name!r} — pass it via dims=")
            flag = f"_fk{i}"
            keys = dims[dim_name].select(
                F.col(dim_col).alias(col)).distinct().withColumn(
                    flag, F.lit(True))
            out = out.join(F.broadcast(keys), col, "left")
            pred = F.col(col).isNotNull() & F.col(flag).isNull()
        elif kind in ("row_count_between", "freshness"):
            raise ValueError(
                f"quarantine: {kind} is dataset-level — a row cannot "
                "violate it; keep it in check_constraints")
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
        flags.append(F.when(pred, F.lit(name)))
    violated = F.array_join(
        F.array_sort(F.filter(F.array(*flags), lambda x: x.isNotNull())),
        "|")
    return out.select(*df.columns, violated.alias("violated"))
