"""Exact distributional quality ops: histograms and outlier flags.

Metric columns (event values, quality scores, lengths) need
distributional QA before training: binned histograms per group and
|x - mean| > k*sigma outlier flags. Both are implemented in EXACT
integer arithmetic — the repo's no-libm discipline (tfidf_top_terms,
collocations_pmi): fixed-point scale the values once, then every bin
edge and every variance comparison is integer math that is bit-identical
across engines, so the DuckDB twins are value equalities, not
tolerances.

The outlier trick: |x - mu| > k*sigma with mu = S/n, sigma^2 =
(Q - S^2/n)/n (population variance over the group) cross-multiplies to

    (n*x - S)^2 > k^2 * (n*Q - S^2)

— every term an integer once x is fixed-point scaled. No division, no
sqrt, no float in the decision. Sums are carried as DECIMAL(38,0) on
the Spark side and HUGEINT in DuckDB, so the squares stay exact far past
int64 (a 100 TB group's n*Q fits comfortably in 38 digits for any
realistic metric scale).

Plan shape: one map-side-combined groupBy for the (n, S, Q) moments,
broadcast back (group cardinality rows), one flag projection — the
two-phase aggregation pattern, no window exchange, no second scan
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,0)"


def _scaled(col, scale: int):
    """round(col * scale) as exact DECIMAL(38,0) — the one float->int
    crossing; identical in both engines for inputs that are exact
    multiples of 1/scale (and HALF_UP == half-away on positives)."""
    return F.round(F.col(col) * F.lit(int(scale))).cast(_DEC)


def scaled_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int,
    scale: int = 100,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Equi-width histogram of ``round(col * scale)`` over [lo, hi):
    (group..., bin, bin_lo_scaled, n). Bin assignment is pure integer
    math — bin = (x - lo) * bins div (hi - lo) on the scaled axis — so
    edges are deterministic and cross-engine exact (a float width would
    put edge-landing values in different bins per engine). Rows outside
    [lo, hi) are dropped (range QA belongs to the caller's filter).
    One map-side-combined groupBy; output is (groups x bins) rows."""
    if bins < 1:
        raise ValueError("scaled_histogram: bins must be >= 1")
    lo_s, hi_s = int(round(lo * scale)), int(round(hi * scale))
    if hi_s <= lo_s:
        raise ValueError("scaled_histogram: need hi > lo")
    if (hi_s - lo_s) % bins != 0:
        # fractional bin widths would force a decimal division whose
        # engine-specific rounding can flip edge-landing values into the
        # neighboring bin — refuse loudly, exact edges only
        raise ValueError(
            f"scaled_histogram: scaled range {hi_s - lo_s} must be "
            f"divisible by bins {bins} (exact integer edges)")
    width = (hi_s - lo_s) // bins
    base = df.select(*group_cols, _scaled(col, scale).alias("_x"))
    # `div` = exact integral quotient on decimals — no float, no decimal
    # division rounding; bit-identical to DuckDB's //
    bin_col = F.expr(f"CAST((_x - {lo_s}) div {width} AS INT)")
    return (
        base.filter((F.col("_x") >= F.lit(lo_s))
                    & (F.col("_x") < F.lit(hi_s)))
        .select(*group_cols, bin_col.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            *group_cols, "bin",
            (F.lit(lo_s) + F.col("bin") * F.lit(width)).cast("long")
            .alias("bin_lo_scaled"),
            "n")
    )


def group_outliers(
    df: DataFrame,
    col: str,
    k: int = 3,
    group_cols: tuple[str, ...] = ("event_type",),
    scale: int = 100,
) -> DataFrame:
    """Rows where |x - mean| > k * sigma WITHIN their group (population
    sigma), decided by the exact integer inequality
    (n*x - S)^2 > k^2 * (n*Q - S^2) — no division, sqrt, or float
    anywhere in the decision, so the flag set is bit-identical across
    engines. Returns the flagged rows with their group moments (n, and
    the scaled sums S, Q as strings — DECIMAL(38,0) round-trips exactly
    as text). k must be a positive integer (the inequality squares it
    exactly)."""
    if k < 1 or int(k) != k:
        raise ValueError("group_outliers: k must be a positive integer")
    if not group_cols:
        raise ValueError("group_outliers: need at least one group col")
    x = _scaled(col, scale).alias("_x")
    base = df.select(*df.columns, x)
    moments = (
        base.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast(_DEC).alias("_n"),
             F.sum("_x").cast(_DEC).alias("_s"),
             F.sum(F.col("_x") * F.col("_x")).cast(_DEC).alias("_q"))
    )
    j = base.join(F.broadcast(moments), on=list(group_cols))
    lhs = (F.col("_n") * F.col("_x") - F.col("_s"))
    rhs = F.lit(int(k * k)).cast(_DEC) * (
        F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s"))
    return (
        j.filter(lhs * lhs > rhs)
        .select(*df.columns,
                F.col("_n").cast("long").alias("group_n"),
                F.col("_s").cast("string").alias("group_sum_scaled"),
                F.col("_q").cast("string").alias("group_sumsq_scaled"))
    )


# ---------------------------------------------------------------------------
# robust (median / MAD) statistics — exact integer order statistics
# ---------------------------------------------------------------------------
def _integral_bigint(col: str):
    """``col`` as bigint, REFUSING fractional values in-plan.  The MAD
    family's docstrings promise integral input; a silent toward-zero
    truncation (review finding) would return plausible but wrong
    medians/flags on a float metric column — the profile family's
    _integral_values discipline, applied here.  NULLs pass through
    (they sort to one end and never take a middle rank)."""
    xi = F.col(col).cast("bigint")
    bad = F.col(col).cast("double") != xi.cast("double")
    return F.when(
        bad,
        F.raise_error(F.concat(
            F.lit(f"integral column required: '{col}' holds fractional "
                  "value "), F.col(col).cast("string"))).cast("bigint"),
    ).otherwise(xi)


def group_median2(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...],
    out_col: str = "med2",
) -> DataFrame:
    """(group..., n, ``out_col``): DOUBLED exact median per group —
    med2 = lower-middle + upper-middle order statistic of an INTEGER
    column, so med2 == 2*median exactly even when n is even and the
    median is x.5.  Staying on the doubled scale keeps every downstream
    comparison integer (the repo's no-float-decision discipline:
    group_outliers, drop_bottom_quantile).  One window exchange — the
    rank and the group count share partitionBy(group) — then one
    map-side-combined groupBy.  Ties need no tie-break: the VALUES at
    the two middle ranks are well-defined whichever tied row takes the
    rank."""
    from pyspark.sql import Window

    if not group_cols:
        raise ValueError("group_median2: need at least one group col")
    w = Window.partitionBy(*group_cols)
    base = (
        df.select(*group_cols, _integral_bigint(col).alias("_x"))
        .withColumn("_rn", F.row_number().over(w.orderBy(F.asc("_x"))))
        .withColumn("_n", F.count(F.lit(1)).over(w)))
    lo = F.expr("(_n + 1) div 2")
    up = F.expr("(_n + 2) div 2")
    return (
        base.groupBy(*group_cols)
        .agg(F.max("_n").alias("n"),
             (F.sum(F.when(F.col("_rn") == lo, F.col("_x")).otherwise(0))
              + F.sum(F.when(F.col("_rn") == up, F.col("_x")).otherwise(0))
              ).alias(out_col)))


def mad_outlier_stats(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...],
    k_num: int,
    k_den: int = 1,
) -> DataFrame:
    """(group..., n, med2, mad2, n_outliers): robust outlier counts per
    group under the MAD rule |x - median| > k * MAD with RATIONAL
    k = k_num/k_den.  Exact integer derivation end to end: med2 =
    2*median, dev = |2x - med2| = 2|x - median|, mad2 = 2*median(dev) =
    4*MAD, and the flag cross-multiplies to

        2 * dev * k_den > k_num * mad2

    — no division or float anywhere, so the counts are bit-identical
    across engines (the mean/sigma rule in group_outliers breaks on
    heavy-tailed metrics; this is its robust twin).  Two window
    exchanges (one per median pass) + two broadcast joins of
    group-cardinality tables.  Input column must be integral (fractional
    values are REFUSED in-plan, never truncated); |x| must stay below
    ~2^61/k_den for the cross-product."""
    if k_num < 1 or k_den < 1:
        raise ValueError("mad_outlier_stats: k_num and k_den must be >= 1")
    g = list(group_cols)
    base = df.select(*g, _integral_bigint(col).alias("_x"))
    med = group_median2(base, "_x", group_cols)
    dev = (base.join(F.broadcast(med), on=g)
           .select(*g, F.abs(2 * F.col("_x") - F.col("med2")).alias("_dev")))
    mad = group_median2(dev, "_dev", group_cols, out_col="mad2").drop("n")
    flagged = (
        dev.join(F.broadcast(mad), on=g)
        .groupBy(*g)
        .agg(F.sum(
            F.when(2 * F.col("_dev") * F.lit(int(k_den))
                   > F.lit(int(k_num)) * F.col("mad2"), 1).otherwise(0)
        ).alias("n_outliers")))
    return med.join(mad, on=g).join(flagged, on=g)


def mad_outlier_rows(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...],
    k_num: int,
    k_den: int = 1,
) -> DataFrame:
    """The row-level twin of :func:`mad_outlier_stats`: the input rows
    whose value violates the MAD rule within their group, with the
    group's (n, med2, mad2) attached.  Same exact integer decision.
    Input columns named _x/_dev/n/med2/mad2 are REFUSED (they collide
    with the working/output columns — a silent duplicate would make the
    final select ambiguous)."""
    if k_num < 1 or k_den < 1:
        raise ValueError("mad_outlier_rows: k_num and k_den must be >= 1")
    clash = {"_x", "_dev", "n", "med2", "mad2"} & set(df.columns)
    if clash:
        raise ValueError(
            f"mad_outlier_rows: input columns {sorted(clash)} collide with "
            "the op's working/output names — rename them first")
    g = list(group_cols)
    base = df.select(*df.columns, _integral_bigint(col).alias("_x"))
    med = group_median2(base, "_x", group_cols)
    with_med = base.join(F.broadcast(med), on=g)
    dev_df = with_med.select(*g, F.abs(2 * F.col("_x") - F.col("med2"))
                             .alias("_dev"))
    mad = group_median2(dev_df, "_dev", group_cols, out_col="mad2").drop("n")
    return (
        with_med.join(F.broadcast(mad), on=g)
        .filter(F.abs(2 * F.col("_x") - F.col("med2")) * 2 * F.lit(int(k_den))
                > F.lit(int(k_num)) * F.col("mad2"))
        .select(*df.columns, "n", "med2", "mad2"))


def percentile_rank(
    df: DataFrame,
    metric_col: str,
    group_cols: tuple[str, ...] = (),
    out_col: str = "pct_x1e6",
) -> DataFrame:
    """Per-group EXACT percentile rank in parts-per-million:
    ``out_col = floor(1e6 * n_strictly_below / n)`` — the quality-score
    normalization a curation pipeline runs before cross-source threshold
    cuts (a raw score means different things per source; its within-source
    percentile is comparable). Ties share a value (rank() semantics: every
    tied row counts the rows STRICTLY below it), min rank is 0, max is
    < 1e6 — all integers, so the cross-engine twin is an equality.

    Plan: rank() and the group count share ONE window exchange
    (drop_bottom_quantile's shape — both windows partition identically, so
    Catalyst inserts a single hash exchange). The metric must be integral
    AND non-null, both refused in-plan: _integral_bigint catches
    fractional values, and a NULL metric raises rather than silently
    taking an engine-dependent end of the sort (Spark windows sort NULLs
    first, DuckDB's RANK defaults NULLS LAST — a pass-through would
    inflate every strictly-below count differently per engine).
    Ungrouped form = one global window; always group at scale."""
    from pyspark.sql import Window

    part = list(group_cols)
    w = Window.partitionBy(*part).orderBy(F.col("_pm").asc())
    wn = Window.partitionBy(*part)
    metric = F.when(
        F.col(metric_col).isNull(),
        F.raise_error(F.lit(
            f"percentile_rank: NULL in metric column {metric_col!r} — "
            "rank semantics for NULLs are engine-dependent; filter or "
            "impute first")),
    ).otherwise(_integral_bigint(metric_col))
    return (
        df.select(*df.columns, metric.alias("_pm"))
        .withColumn("__rk", F.rank().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .withColumn(out_col,
                    F.expr("((__rk - 1) * 1000000) div __n").cast("bigint"))
        .drop("_pm", "__rk", "__n")
    )
