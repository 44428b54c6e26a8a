"""range & window-sketch family driver queries — moved verbatim from __spark_entry__.py."""
from __future__ import annotations

from .core import *  # noqa: F401,F403



def q_window_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-document windows never cross rows, so the rollup is pure array math
    # inside each row (array_distinct over slices) — zero shuffle, vs the
    # naive posexplode + groupBy(countDistinct) which shuffles every token
    corp = _corpus(spark, sf_dir)
    parts = []
    for L in (CFG.deepest, CFG.deepest - 1):
        span = CFG.span(L)
        parts.append(
            corp.select(
                "doc_id",
                F.posexplode(
                    # guard: sequence(0, -1) on an empty doc would DESCEND and
                    # emit phantom windows the oracle doesn't have
                    F.expr(
                        f"case when n_tok > 0 then "
                        f"transform(sequence(0, cast(ceil(n_tok / {span}.0) as int) - 1), "
                        f"w -> size(array_distinct(slice(tokens, w * {span} + 1, {span})))) "
                        f"else array() end"
                    )
                ).alias("w_id", "nd"),
            ).select(
                "doc_id",
                F.lit(L).alias("level"),
                F.col("w_id").cast("long").alias("w_id"),
                F.col("nd").cast("long").alias("n_distinct"),
            )
        )
    return parts[0].unionByName(parts[1])


def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corp = _corpus(spark, sf_dir)
    grams = corp.filter(F.size("tokens") >= 2).select(
        F.explode(
            F.expr(
                # Spark array[] is 0-based (DuckDB's is 1-based — oracle differs)
                "transform(sequence(0, size(tokens) - 2), "
                "i -> concat(cast(tokens[i] as string), '|', cast(tokens[i + 1] as string)))"
            )
        ).alias("gram")
    )
    return (
        grams.groupBy("gram").agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(20)
    )


def q_heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT phi-heavy bigrams via the sketch-prunes/verification-decides
    contract: a Misra-Gries summary (sketches/spacesaving.py) proposes a
    guaranteed-superset candidate set (<= HH_K keys, collected tiny), then
    ONE exact count over candidate grams only decides. Scale shape: the MG
    pass is the usual two-phase sketch aggregate (no raw-gram shuffle); the
    verify pass shuffles only rows matching <= HH_K broadcast keys, with
    map-side partial counts. Beyond-reference operator (the reference's
    frequency surface is CountSketch points, estimators/CountSketch.java)."""
    import math as _math

    from hierarchical_bloom_filter_index_spark.sketches import MisraGries

    grams = _corpus(spark, sf_dir).filter(F.size("tokens") >= 2).select(
        F.expr(_PACKED_BIGRAMS).alias("grams")
    )
    mg = collect_sketch(
        sketch_aggregate(grams, "grams", lambda: MisraGries(k=HH_K), values_are_arrays=True)
    )
    if mg is None:  # no doc has 2+ tokens
        return spark.createDataFrame([], "gram string, cnt long")
    thr = int(_math.ceil(HH_PHI * mg.n_total))
    cand = [int(g) for g in mg.heavy_hitters(HH_PHI)]
    return (
        grams.select(F.explode("grams").alias("g"))
        .filter(F.col("g").isin(cand))
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .select(_unpack_gram("g"), "cnt")
    )


def q_heavy_hitters_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-source phi-heavy bigrams — the GROUPED form of
    heavy_hitter_bigrams: one Misra-Gries summary per source (grouped
    two-phase sketch aggregate), per-source candidate supersets, then one
    exact count join over the broadcast candidates. Per-source totals come
    exact from the MG states, so thresholds need no extra pass."""
    import math as _math

    from hierarchical_bloom_filter_index_spark.sketches import MisraGries

    grams = _corpus(spark, sf_dir).filter(F.size("tokens") >= 2).select(
        "source", F.expr(_PACKED_BIGRAMS).alias("grams")
    )
    per_source = grouped_sketches(
        sketch_aggregate(grams, "grams", lambda: MisraGries.for_phi(HH_GROUP_PHI),
                         group_cols=("source",), values_are_arrays=True)
    )
    cand_rows = [
        (src, int(g), int(_math.ceil(HH_GROUP_PHI * mg.n_total)))
        for (src,), mg in per_source.items()
        for g in mg.heavy_hitters(HH_GROUP_PHI)
    ]
    if not cand_rows:
        return spark.createDataFrame([], "source string, gram string, cnt long")
    cand = F.broadcast(
        spark.createDataFrame(cand_rows, "source string, g long, thr long")
    )
    return (
        grams.select("source", F.explode("grams").alias("g"))
        .join(cand, ["source", "g"])
        .groupBy("source", "g", "thr")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.col("thr"))
        .select("source", _unpack_gram("g"), "cnt")
    )


def q_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLUENCY proxy for quality filtering: per doc, the average
    corpus-wide frequency of its word bigrams (operators/text.py:
    bigram_fluency) — the cheap pre-filter a 100 TB pipeline runs before
    paying for LM-perplexity inference. Integer sums exact; the double is
    a pure quotient of exact ints (bit-identical cross-engine)."""
    from hierarchical_bloom_filter_index_spark.operators.text import (
        bigram_fluency,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    return bigram_fluency(docs)


def q_token_freq_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diagnostics: the frequency-of-frequencies histogram (how many
    distinct tokens occur exactly f times) — the classic Zipf/Good-Turing
    profile a data pipeline reports per corpus snapshot."""
    pos = with_positions(_corpus(spark, sf_dir))
    per_tok = pos.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return per_tok.groupBy("freq").agg(F.count(F.lit(1)).alias("n_tokens"))


def q_token_freq_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = with_positions(_corpus(spark, sf_dir))
    return (
        pos.filter(F.col("token").isin(PROBE_TOKENS))
        .groupBy("source", "token")
        .agg(F.count("*").alias("cnt"))
    )


def q_distinct_by_source_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = with_positions(_corpus(spark, sf_dir))
    return pos.groupBy("source").agg(F.countDistinct("token").alias("n_distinct"))


def q_doclen_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corp = _corpus(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("n_tok")
    ranked = corp.select(
        "source", "n_tok",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("cnt"),
    )
    qs = corp.sparkSession.createDataFrame([(q,) for q in QUANTILES], "q double")
    return (
        ranked.crossJoin(qs)
        .filter(F.col("rn") == F.ceil(F.col("q") * F.col("cnt")))
        .select("source", "q", F.col("n_tok").alias("val"))
    )


def q_global_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.with_global_offsets(_corpus(spark, sf_dir)).select("doc_id", "doc_offset")


def q_index_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window geometry of the built sketch table — checkable in SQL because
    every dyadic window in [0, ceil(n_tok/span)) holds >= 1 token."""
    return (
        _index(spark, sf_dir)
        .groupBy("level")
        .agg(F.count("*").alias("n_windows"), F.sum("n_items").alias("total_items"))
    )


def q_bloom_rollup_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry of the SINGLE-PASS Bloom rollup build (uniform (m,k), parents
    OR-rolled from children — one data pass + log-depth sketch passes,
    tree/TreeLayout.java:21-35 role). Byte-equality to the scratch build is
    test-enforced; the driver checks the geometry against the same closed
    form as index_geometry (identical dyadic spans)."""
    from hierarchical_bloom_filter_index_spark.operators.build import build_index_rollup

    key = ("bloom_rollup", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = build_index_rollup(
            _corpus(spark, sf_dir), CFG.with_(uniform_bloom=True)
        )
    return (
        _CACHE[key]
        .groupBy("level")
        .agg(F.count("*").alias("n_windows"), F.sum("n_items").alias("total_items"))
    )


def q_global_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens per global leaf window (the one-stream axis of the reference)."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets

    corp = with_global_offsets(_corpus(spark, sf_dir))
    cfg = CFG.with_(axis="global")
    idx = build_index(corp, cfg)
    return (
        idx.filter(F.col("level") == CFG.deepest)
        .select("w_id", F.col("n_items").alias("n_tokens"))
    )


def q_mg_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT (doc, level, window) item counts read out of the Misra-Gries
    heavy-hitter rollup — n_total is exact and merges add, so the whole
    index's geometry AND coverage is SQL-checkable (same closed form as
    cms_rollup_totals) even though candidate sets are bound-certified."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        mg_window_totals,
    )

    return mg_window_totals(_mg_index(spark, sf_dir))


def q_range_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Does token X appear in leaf-window range [a, b)?' per doc — the
    MEMBERSHIP member of the dyadic range family: each range probes its
    O(log) covering Bloom nodes instead of b-a leaves (no false negatives;
    one JVM exists() over the slice verifies). All-docs (a, b) pairs,
    shared cover nodes broadcast."""
    from hierarchical_bloom_filter_index_spark.operators.route import (
        range_membership,
    )

    return range_membership(
        _corpus(spark, sf_dir), _index(spark, sf_dir), CFG, RANGE_QS, ord("q")
    )


def q_range_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT phi-heavy tokens (freq >= n_range/16) of each queried
    leaf-window range [a, b) per doc: the O(log) covering Misra-Gries nodes
    merge into a CERTIFIED candidate superset; one exact count over the
    range slice — aggregation state bounded by k=32 candidates per range,
    not the range's distinct-token count — decides. The fifth member of the
    dyadic range family (count/distinct/freq/quantile/heavy-hitters), and
    the only one whose APPROXIMATE index yields an EXACT, oracle-checked
    answer (sketch-prunes / verification-decides, like the Bloom cascade)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_heavy_hitters,
    )

    return range_heavy_hitters(
        _mg_index(spark, sf_dir), _corpus(spark, sf_dir), RANGE_QS,
        *PHI_HH, CFG.leaf_span, CFG.deepest,
    )


def q_global_range_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT phi-heavy tokens of STREAM leaf-window ranges — the global twin
    of range_heavy_hitters: candidates from the global MG index (partials
    phase-aligned across doc boundaries), verified against only the docs
    overlapping each range (doc_offset pushdown, never a stream rescan)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_mg_window_index,
        global_range_heavy_hitters,
    )

    key = ("gmg_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_mg_window_index(
            gcorp, CFG.with_(axis="global"), k=32)
    gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
    return global_range_heavy_hitters(
        _CACHE[key], gcorp, RANGE_QS_GLOBAL, *PHI_HH, CFG.leaf_span, CFG.deepest,
    )


def q_range_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT top-5 most frequent tokens of each queried leaf-window range
    [a, b) per doc, (cnt DESC, token ASC) tie-break — SELF-CERTIFYING from
    the Misra-Gries dyadic index: merged cover nodes expose every tracked
    token plus the residual mass, one exact count over the range slice
    (state bounded by k=32 candidates) decides, and the integer
    certification inequality (k-th count * (k+1) > resid) proves no
    untracked token could rank — refusing loudly otherwise, never silently
    wrong. The TOP-K member of the dyadic range family."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_topk_tokens,
    )

    return range_topk_tokens(
        _mg_index(spark, sf_dir), _corpus(spark, sf_dir), RANGE_QS,
        RANGE_TOPK_K, CFG.leaf_span, CFG.deepest,
    )


def q_global_range_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT certified top-5 tokens of STREAM leaf-window ranges — global
    twin of range_topk_tokens (candidates from the global MG index,
    phase-aligned partials across doc boundaries; verification counts only
    each doc's overlap with the range, never a stream rescan)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_mg_window_index,
        global_range_topk_tokens,
    )

    key = ("gmg_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_mg_window_index(
            gcorp, CFG.with_(axis="global"), k=32)
    gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
    return global_range_topk_tokens(
        _CACHE[key], gcorp, RANGE_QS_GLOBAL, RANGE_TOPK_K,
        CFG.leaf_span, CFG.deepest,
    )


def q_range_distinct_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT bottom-k distinct-token sample of leaf-window ranges [a, b) per
    doc from the dyadic BottomK index: the O(log) covering nodes merge
    (union, keep k smallest priorities) into the exact bottom-k of the
    range's distinct-token set — the SAMPLE member of the dyadic range
    family (count/distinct/freq/quantile/heavy-hitters/SAMPLE), and like the
    heavy hitters it is a VALUE, oracle-checked via the bit-exact splitmix64
    SQL twin (reference estimators/BottomKSampler.java:17-58 lifted onto the
    hierarchy)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_distinct_sample,
    )

    return range_distinct_sample(_bk_index(spark, sf_dir), RANGE_QS, CFG.deepest)


def q_global_range_distinct_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT bottom-k distinct-token sample of STREAM leaf-window ranges —
    the global twin (phase-aligned partial samplers merged into stream
    windows, doc boundaries invisible; union merges are split-indifferent)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_bk_window_index,
        global_range_distinct_sample,
    )

    key = ("gbk_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_bk_window_index(
            gcorp, CFG.with_(axis="global"), k=BK_K)
    return global_range_distinct_sample(
        _CACHE[key], RANGE_QS_GLOBAL, CFG.deepest)


def q_kll_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT (doc, level, window) item counts read out of the KLL quantile
    rollup — the KLL n field counts exactly and merges add, so the whole
    quantile index's geometry AND coverage is SQL-checkable even though its
    quantile estimates are bound-checked in tests (same closed form as
    cms_rollup_totals)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        kll_window_totals,
    )

    return kll_window_totals(_kll_index(spark, sf_dir))


def q_range_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles over leaf-window RANGES [a, b) from the dyadic
    KLL index: the O(log) covering nodes merge (bound-preserving) into a
    valid KLL of the range — any slice answers quantile queries without
    touching b - a leaves. Estimates are oracle-free (rank-error contracts
    in tests/test_rollup.py); geometry + exact counts oracle-checked by
    kll_rollup_totals. All-docs (a, b) form — no driver-side doc catalog.
    Completes the range family: count/distinct/freq/QUANTILE (reference's
    rank queries: estimators/HOPS.java:117-136)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_quantile_estimates,
    )

    return range_quantile_estimates(
        _kll_index(spark, sf_dir), RANGE_QS, QUANTILES, CFG.deepest
    ).select("doc_id", "a", "b", "q", F.round("est", 3).alias("est"))


def q_global_range_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles over STREAM leaf-window ranges — the global
    twin (phase-aligned partial KLLs merged into stream-window sketches,
    doc boundaries invisible). Oracle-free estimates; bounds in tests."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_kll_window_index,
        global_range_quantile_estimates,
    )

    key = ("gkll_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_kll_window_index(gcorp, CFG, k=200)
    return global_range_quantile_estimates(
        _CACHE[key], RANGE_QS_GLOBAL, QUANTILES, CFG.deepest
    ).select("a", "b", "q", F.round("est", 3).alias("est"))


def q_range_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT q-quantile token values (rank max(1, ceil(q*n)), ascending) of
    leaf-window ranges [a, b) per doc — certified from the KLL dyadic index:
    merged cover nodes BRACKET the true rank (quantile estimates at
    q -+ rank_eps), one exact pass over the range slice with out-of-bracket
    mass collapsed to sentinel buckets decides, refusing loudly if the
    bracket missed. The order-statistics member of the exact-from-candidates
    discipline (heavy hitters / top-k): an approximate index, an EXACT,
    SQL-oracle-checked answer."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_exact_quantiles,
    )

    return range_exact_quantiles(
        _kll_index(spark, sf_dir), _corpus(spark, sf_dir), RANGE_QS, QUANTILES,
        CFG.leaf_span, CFG.deepest,
    )


def q_global_range_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT q-quantiles of STREAM leaf-window ranges — global twin of
    range_exact_quantiles (brackets from the global KLL index's phase-aligned
    partials; verification reads only each doc's overlap with the range)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_kll_window_index,
        global_range_exact_quantiles,
    )

    key = ("gkll_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_kll_window_index(gcorp, CFG, k=200)
    gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
    return global_range_exact_quantiles(
        _CACHE[key], gcorp, RANGE_QS_GLOBAL, QUANTILES, CFG.leaf_span, CFG.deepest,
    )


def q_range_trimmed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trimmed sum + count (ranks floor(0.25n)+1 .. floor(0.75n),
    ascending) of leaf-window ranges per doc — the robust-statistics member
    of the dyadic range family (interquartile mean = trimmed_sum / n_kept).
    KLL cover nodes bracket both trim cuts; one exact integer pass decides,
    refusing loudly on a missed bracket."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_trimmed_sum,
    )

    return range_trimmed_sum(
        _kll_index(spark, sf_dir), _corpus(spark, sf_dir), RANGE_QS,
        *TRIM_Q, CFG.leaf_span, CFG.deepest,
    )


def q_global_range_trimmed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trimmed sum of STREAM leaf-window ranges — global twin of
    range_trimmed_sum."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_kll_window_index,
        global_range_trimmed_sum,
    )

    key = ("gkll_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_kll_window_index(gcorp, CFG, k=200)
    gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
    return global_range_trimmed_sum(
        _CACHE[key], gcorp, RANGE_QS_GLOBAL, *TRIM_Q, CFG.leaf_span, CFG.deepest,
    )


def q_td_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT (doc, level, window) item counts read out of the t-DIGEST
    quantile rollup — the n field counts exactly and merges add, so the
    second quantile index's geometry AND coverage is SQL-checkable (same
    closed form as cms_rollup_totals / kll_rollup_totals). Completes the
    north_rule's named sketch set (Bloom/CMS/HLL/KLL/t-digest) as
    oracle-gated window families."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        td_window_totals,
    )

    return td_window_totals(_td_index(spark, sf_dir))


def q_range_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles over leaf-window RANGES [a, b) from the dyadic
    t-digest index — the tail-accurate twin of range_quantiles, and unlike
    KLL fully DETERMINISTIC (merges are order-free pure functions of the
    cover-node content, so these estimate rows are reproducible bit-for-bit
    run to run). Estimates are oracle-free (rank-error contracts in
    tests/test_td_rollup.py); geometry + exact counts oracle-checked by
    td_rollup_totals. All-docs (a, b) form."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_tdigest_quantiles,
    )

    return range_tdigest_quantiles(
        _td_index(spark, sf_dir), RANGE_QS, QUANTILES, CFG.deepest
    ).select("doc_id", "a", "b", "q", F.round("est", 3).alias("est"))


def q_global_range_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles over STREAM leaf-window ranges from the global
    t-digest index — phase-aligned partial digests merged into stream-window
    nodes, doc boundaries invisible (and byte-equal to a from-scratch stream
    build: content-pure merges). Oracle-free estimates; bounds in tests."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_td_window_index,
        global_range_tdigest_quantiles,
    )

    key = ("gtd_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_td_window_index(
            gcorp, CFG.with_(axis="global"), delta=100.0)
    return global_range_tdigest_quantiles(
        _CACHE[key], RANGE_QS_GLOBAL, QUANTILES, CFG.deepest
    ).select("a", "b", "q", F.round("est", 3).alias("est"))


def q_range_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rank queries (count of tokens <= v) over doc leaf-window ranges
    — the INVERSE of the quantile family, answered from the CMS window
    index's SPARSE-exact nodes: the O(log) covering nodes add linearly and
    stay sparse on this corpus (distinct < sparse_max_nnz), so their sorted
    (token, count) pairs enumerate the range content exactly and the rank is
    a hard SQL equality (the same sparse-only exactness contract as
    range_f2 — rank_blobs REFUSES dense nodes rather than estimating; the
    t-digest range_tdigest_cdf is the dense-regime estimate fallback)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_rank_counts,
    )

    return range_rank_counts(
        _cms_index(spark, sf_dir), RANGE_QS, PROBE_TOKENS, CFG.deepest
    )


def q_global_range_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT stream-axis rank queries — global twin of range_rank (count of
    stream tokens <= v per stream leaf-window range, doc boundaries
    invisible; sparse-exact cover nodes, oracle equality)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_rank_counts,
    )

    return global_range_rank_counts(
        _gcms_index(spark, sf_dir), RANGE_QS_GLOBAL, PROBE_TOKENS, CFG.deepest
    )


def q_range_tdigest_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate CDF (fraction of range tokens <= v) over doc leaf-window
    ranges from the dyadic t-digest index — the ESTIMATE twin of range_rank
    for the dense regime where exact enumeration is impossible. Same
    byte-deterministic cover-node merge as range_tdigest_quantiles;
    rank-error bounds in tests/test_td_rollup.py, exact counts on the same
    index oracle-gated by td_rollup_totals."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_tdigest_cdf,
    )

    return range_tdigest_cdf(
        _td_index(spark, sf_dir), RANGE_QS, [float(t) for t in PROBE_TOKENS],
        CFG.deepest,
    ).select("doc_id", "a", "b", "v", F.round("est_cdf", 4).alias("est_cdf"))


def q_global_range_tdigest_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate CDF over STREAM leaf-window ranges from the global
    t-digest index — inverse-quantile on the one-stream axis (cached by
    global_range_tdigest_quantiles; estimates byte-deterministic)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_td_window_index,
        global_range_tdigest_cdf,
    )

    key = ("gtd_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_td_window_index(
            gcorp, CFG.with_(axis="global"), delta=100.0)
    return global_range_tdigest_cdf(
        _CACHE[key], RANGE_QS_GLOBAL, [float(t) for t in PROBE_TOKENS],
        CFG.deepest,
    ).select("a", "b", "v", F.round("est_cdf", 4).alias("est_cdf"))


def q_stream_sketch_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming-maintained GLOBAL CMS window-sketch index
    (streaming.incremental_global_window_sketch_stream): the corpus arrives
    as TWO micro-batch files in doc_id order, each commit persists only its
    boundary-suffix DELTA, and the reassembled index's EXACT window totals
    are returned — totals are exact (CMS is linear), so the entire
    stream-maintenance path (delta layout, cutoff slicing, boundary
    re-merge) is SQL-oracle-checked against the closed-form stream
    geometry."""
    import tempfile
    import time as _time

    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_cms_window_totals,
    )
    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        incremental_global_window_sketch_stream,
        read_global_window_sketch_stream,
    )

    corpus = _corpus(spark, sf_dir)
    base = _tmpdir(prefix="hbi_sketch_stream_")
    inp = f"{base}/in"
    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    corpus.filter(F.col("doc_id") < mid).coalesce(1).write.mode("append").parquet(inp)
    _time.sleep(1.1)  # file source orders by mtime: chunk 2 must sort later
    corpus.filter(F.col("doc_id") >= mid).coalesce(1).write.mode("append").parquet(inp)
    q = incremental_global_window_sketch_stream(
        spark, inp, f"{base}/chk", f"{base}/work", CFG.with_(axis="global"),
        family="cms",
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("sketch stream drain exceeded 300s")
    idx, _total = read_global_window_sketch_stream(spark, f"{base}/work")
    return global_cms_window_totals(idx).select(
        "level", "w_id", F.col("n_window").cast("long").alias("n_window")
    )


def q_cms_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-window probe-token frequencies via the dyadic CMS
    rollup (coarse levels merged from children — byte-exact, CMS is linear).
    Estimates are oracle-free (overestimate within eps*N_window, bounds in
    tests/test_rollup.py); the index geometry + exact window totals are
    oracle-checked by cms_rollup_totals."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        window_freq_estimates,
    )

    return window_freq_estimates(_cms_index(spark, sf_dir), 0, PROBE_TOKENS)


def q_cms_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT (doc, level, window) token totals read out of the CMS rollup
    index — every level's geometry AND coverage is SQL-checkable because the
    CMS total field is exact even though cell estimates aren't."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        window_token_totals,
    )

    return window_token_totals(_cms_index(spark, sf_dir))


def q_cs_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT (doc, level, window) token totals read out of the signed
    count-sketch rollup — same closed-form oracle as the CMS/KLL/MG twins
    (identical dyadic geometry; the cs total header field is exact)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        cs_window_totals,
    )

    return cs_window_totals(_cs_index(spark, sf_dir))


def q_range_window_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token counts over leaf-window RANGES [a, b) answered from the
    dyadic CMS index: each range merges its <= 2*log2(b-a)+2 covering nodes
    (rollup.dyadic_cover) instead of touching b-a leaves — the hierarchy
    used for what it exists for. Totals are exact, so oracle-checked.
    The (a, b) pairs apply to EVERY doc: only the O(log) shared cover nodes
    are broadcast; the per-doc fan-out joins the index's doc_id column
    distributedly (no driver collect of the doc catalog)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_token_totals,
    )

    return range_token_totals(_cms_index(spark, sf_dir), RANGE_QS, CFG.deepest)


def q_range_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct tokens over the same leaf-window ranges: the
    covering nodes' HLLs merge (register max) into the exact range HLL —
    estimates in the 1.04/sqrt(2^p) envelope (bounds in tests; geometry +
    totals oracle-checked by range_window_totals). All-docs (a, b) form —
    no driver-side doc catalog."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_distinct_estimates,
    )

    return range_distinct_estimates(
        _hll_index(spark, sf_dir), RANGE_QS, CFG.deepest
    ).select("doc_id", "a", "b", F.round("est_distinct", 3).alias("est_distinct"))


def q_range_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate probe-token frequencies over DOC leaf-window ranges:
    covering CMS nodes add into the exact range CMS (overestimate-only
    within eps*N_range; bounds in tests — totals oracle-checked by
    range_window_totals on the same index). Doc-axis twin of
    global_range_freq; all-docs (a, b) form."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_freq_estimates,
    )

    return range_freq_estimates(
        _cms_index(spark, sf_dir), RANGE_QS, PROBE_TOKENS, CFG.deepest
    )


def q_range_signed_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBIASED probe-token frequencies over DOC leaf-window ranges through
    the signed count-sketch index (median of signed rows — two-sided error
    vs CMS's overestimate-only). On this corpus every cover node is
    sparse-exact, so answers are exact counts and the query is
    oracle-checked; the dense-regime two-sided bound is enforced in
    tests/test_cs_rollup.py."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_signed_freq_estimates,
    )

    return range_signed_freq_estimates(
        _cs_index(spark, sf_dir), RANGE_QS, PROBE_TOKENS, CFG.deepest
    )


def q_counting_takedown_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETABLE global Bloom index gate: a counting maintenance artifact
    (sparse per-window hash-instance counters) whose bitset VIEW is
    byte-equal to the ordinary global build; after a content takedown
    (negative counting partials at build-time offsets, counter subtraction,
    emptied nodes dropped) the view must STILL be byte-equal to a scratch
    global build over the survivors — so every search surface serves from
    the view unchanged, and takedown correctness reduces to this empty
    symmetric difference (empty oracle). Bloom OR is not invertible;
    counting is the classical deletability price, paid in the maintenance
    artifact only (operators/build.py counting family)."""
    from hierarchical_bloom_filter_index_spark.operators.build import (
        _build_global_axis,
        build_global_counting_index,
        counting_index_view,
        takedown_global_counting_index,
    )

    gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
    removed = gcorp.filter(F.col("n_tok") % 5 == 0)
    survivors = gcorp.join(removed.select("doc_id"), "doc_id", "left_anti")
    cnt = build_global_counting_index(gcorp, CFG)
    after = counting_index_view(
        takedown_global_counting_index(cnt, removed, CFG))
    scratch = _build_global_axis(survivors, CFG)
    cols = ["level", "w_id", "bloom", "n_items", "bits_set"]
    a, b = after.select(*cols), scratch.select(*cols)
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_global_sketch_takedown_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT TAKEDOWN on the one-stream axis WITHOUT rebuild: docs with
    n_tok % 5 == 0 are removed from the global CMS window index by LINEAR
    SUBTRACTION (a negative index over only the removed docs at their
    build-time offsets, node-wise subtract, emptied nodes dropped — stream
    geometry retained, the removal story windows that mix documents
    otherwise cannot have). Gate: EXACT range totals off the subtracted
    index == SQL totals over the surviving tokens at their ORIGINAL stream
    positions. Byte-level parity vs a scratch build is pinned in
    tests/test_rollup.py."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_totals,
        takedown_global_window_sketch_index,
    )

    key = ("gcms_takedown", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        removed = gcorp.filter(F.col("n_tok") % 5 == 0)
        _CACHE[key] = takedown_global_window_sketch_index(
            _gcms_index(spark, sf_dir), removed, CFG, "cms",
            depth=3, width=256,
        ).persist()
    return global_range_totals(_CACHE[key], RANGE_QS_GLOBAL, CFG.deepest)


def q_range_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND FREQUENCY MOMENT (self-join size) over leaf-window ranges
    [a, b) from the dyadic signed count-sketch index: O(log) covering nodes
    ADD (linearity) into the exact range sketch, AMS median-of-rows decides.
    On this corpus every range node stays SPARSE-EXACT (ASCII vocab <<
    sparse_max_nnz), so the answers are exact sums of squared counts and
    the query is oracle-checked; the dense regime's 2*F2^2/width variance
    bound is enforced in tests/test_cs_rollup.py."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_f2_estimates,
    )

    return range_f2_estimates(_cs_index(spark, sf_dir), RANGE_QS, CFG.deepest)


def q_global_range_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range F2 over the ONE concatenated stream: same covering-node adds
    on the global-axis cs index, document boundaries invisible. Sparse-exact
    on this corpus, hence oracle-checked."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_f2_estimates,
    )

    return global_range_f2_estimates(
        _gcs_index(spark, sf_dir), RANGE_QS_GLOBAL, CFG.deepest)


def q_global_range_signed_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBIASED probe-token frequencies over STREAM leaf-window ranges
    through the global signed count-sketch index — global twin of
    range_signed_freq (sparse-exact on this corpus, oracle-checked)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_signed_freq_estimates,
    )

    return global_range_signed_freq_estimates(
        _gcs_index(spark, sf_dir), RANGE_QS_GLOBAL, PROBE_TOKENS, CFG.deepest
    )


def q_range_inner_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-RANGE INNER PRODUCT <f_A, f_B> between the token-frequency
    vectors of two leaf-window ranges per doc, answered from O(log) covering
    count-sketch nodes per side (one broadcast join, one shuffle; the AMS
    sketch-dot join-size estimator on the dense path). On this corpus every
    merged range node stays SPARSE-EXACT, so answers are exact sums of
    cnt_A * cnt_B over common tokens and the query is oracle-checked; the
    dense regime's O(sqrt(F2_A*F2_B/width)) bound is enforced in
    tests/test_cs_rollup.py. Extends the reference's per-window second-moment
    estimators (estimators/CountSketch.java:15) to correlation BETWEEN
    arbitrary slices."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        range_inner_product_estimates,
    )

    return range_inner_product_estimates(_cs_index(spark, sf_dir), PAIR_QS, CFG.deepest)


def q_global_range_inner_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-range inner product between two STREAM leaf-window ranges of
    the ONE concatenated token stream — global twin (doc boundaries
    invisible; sparse-exact on this corpus, oracle-checked). One pair puts
    side A beyond the sf0.01 stream end: the missing side is the zero
    vector and the row must still appear with est_ip 0."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_inner_product_estimates,
    )

    return global_range_inner_product_estimates(
        _gcs_index(spark, sf_dir), PAIR_QS_GLOBAL, CFG.deepest)


def q_range_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTTOM-K (KMV) JACCARD similarity between the distinct-token sets of
    two leaf-window ranges per doc, answered from O(log) covering BottomK
    nodes per side: merged = bottom-k(A ∪ B) is recovered losslessly from
    the two range samples (KMV union mergeability), n_match counts its
    entries present in both sides' samples, est_jaccard = n_match/n_sample.
    All three outputs are deterministic VALUES (pure functions of the
    distinct sets through the seed-fixed splitmix64 priority), so the query
    is oracle-checked via the bit-exact SQL twin in EVERY regime — including
    pairs where n_sample == k and the estimate is genuinely approximate
    (reference estimators/BottomKSampler.java:17-58 lifted to set
    similarity between hierarchy slices)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import range_jaccard

    return range_jaccard(_bk_index(spark, sf_dir), PAIR_QS, CFG.deepest)


def q_global_range_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV Jaccard between the distinct-token sets of two STREAM leaf-window
    ranges — global twin of range_jaccard (phase-aligned partial samplers
    merged into stream-window nodes, doc boundaries invisible)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_bk_window_index,
        global_range_jaccard,
    )

    key = ("gbk_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_bk_window_index(
            gcorp, CFG.with_(axis="global"), k=BK_K)
    return global_range_jaccard(_CACHE[key], PAIR_QS_GLOBAL, CFG.deepest)


def q_range_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-OPERATION CARDINALITIES (|A|, |B|, |A ∪ B|, |A ∩ B|) between the
    distinct-token sets of two leaf-window ranges per doc, answered from
    O(log) covering HLL nodes per side: per-side range merges give |A| and
    |B|, the pairwise register-max merge gives |A ∪ B| (HLL union is
    lossless in sketch space), inclusion-exclusion gives |A ∩ B|. On this
    corpus every merged range node stays SPARSE-EXACT (ASCII vocab <<
    sparse_max_nnz = 2^12/8), so all four outputs are exact distinct counts
    and the query is oracle-checked; the dense regime's union/intersection
    error envelopes are enforced in tests/test_rollup.py. Completes the
    pair-of-ranges family (inner product = cs, Jaccard = bk, set algebra =
    hll) over the same one-broadcast-join geometry."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import range_setops

    return range_setops(_hll_index(spark, sf_dir), PAIR_QS, CFG.deepest)


def q_global_range_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation cardinalities between the distinct-token sets of two
    STREAM leaf-window ranges of the ONE concatenated token stream — global
    twin of range_setops (phase-aligned partial HLLs merged into
    stream-window nodes, doc boundaries invisible; sparse-exact on this
    corpus, oracle-checked). One pair probes the missing-side semantics:
    a side with no covering node is the empty set (est 0)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_hll_window_index,
        global_range_setops,
    )

    key = ("ghll_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_hll_window_index(gcorp, CFG, p=12)
    return global_range_setops(_CACHE[key], PAIR_QS_GLOBAL, CFG.deepest)


def q_global_range_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token counts over STREAM leaf-window ranges [a, b) from the
    global-axis dyadic CMS index: O(log) covering nodes per range, document
    boundaries invisible (the reference's one-stream model). Oracle-checked
    against SUM(n_tok) arithmetic."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_totals,
    )

    return global_range_totals(_gcms_index(spark, sf_dir), RANGE_QS_GLOBAL, CFG.deepest)


def q_global_range_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate probe-token frequencies over STREAM leaf-window ranges:
    O(log) covering CMS nodes add into the exact range CMS (overestimate
    within eps*N_range; bounds in tests — totals/geometry oracle-checked by
    global_range_totals on the same index)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        global_range_freq_estimates,
    )

    return global_range_freq_estimates(
        _gcms_index(spark, sf_dir), RANGE_QS_GLOBAL, PROBE_TOKENS, CFG.deepest
    )


def q_hll_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-per-window via the dyadic HLL rollup index
    (coarse levels merged from children, no token rescan)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        window_distinct_estimates,
    )

    return window_distinct_estimates(_hll_index(spark, sf_dir), 0).select(
        "doc_id", "w_id", F.round("est_distinct", 3).alias("est_distinct")
    )


def q_bottomk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k distinct-token sample: the k distinct tokens
    with the smallest splitmix64(token ^ seed-mix) priority. The priority is
    a pure integer function, so the sample is fully ORACLE-CHECKABLE — the
    DuckDB twin re-implements the 64-bit wrap-around hash with HUGEINT
    mod-2^64 arithmetic (see _splitmix_ctes) and takes the same bottom k."""
    from hierarchical_bloom_filter_index_spark.sketches import BottomKSampler

    bk = collect_sketch(
        sketch_aggregate(
            _corpus(spark, sf_dir), "tokens",
            lambda: BottomKSampler(k=BOTTOMK_K, seed=CFG.seed),
            values_are_arrays=True,
        )
    )
    return spark.createDataFrame([(int(t),) for t in sorted(bk.sample())], "token long")


def q_hops_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPS bucket representatives (estimators/HOPS.java role): the
    min-priority distinct token of each of the 2^b hash buckets. Like
    bottomk_tokens, fully ORACLE-CHECKABLE — bucket and priority are pure
    integer functions of the token, recomputed bit-exactly in SQL."""
    from hierarchical_bloom_filter_index_spark.sketches import HopsSampler

    h = collect_sketch(
        sketch_aggregate(
            _corpus(spark, sf_dir), "tokens", lambda: HopsSampler(b=6, seed=CFG.seed),
            values_are_arrays=True,
        )
    )
    return spark.createDataFrame(
        [(int(t),) for t in sorted(h.representatives())], "token long"
    )


def q_countsketch_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from hierarchical_bloom_filter_index_spark.sketches import CountSketch

    # eps=0.02 -> width 2^13: count-sketch width grows as 3/eps^2, so tight
    # eps values explode the per-partition partial state (0.001 would be a
    # 168 MB table per partial)
    cs = collect_sketch(
        sketch_aggregate(
            _corpus(spark, sf_dir), "tokens",
            lambda: CountSketch.from_eps_delta(0.02, 0.01, seed=CFG.seed),
            values_are_arrays=True,
        )
    )
    keys = np.asarray(PROBE_TOKENS, dtype=np.int64)
    est = cs.estimate(keys)
    return spark.createDataFrame(
        [(int(t), float(e)) for t, e in zip(PROBE_TOKENS, est)], "token int, est double"
    )


def q_expire_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expire() — whole-window eviction past a horizon (PMIndex/HBI.java:
    209-211): evict the first half of the global stream (leaf horizon =
    (total_tokens/2)/leaf_span) and emit the surviving per-level window
    counts. Pure w_id predicate (metadata-only on a segmented layout —
    sources/io.expire_segments); the closed form is the DuckDB oracle."""
    from hierarchical_bloom_filter_index_spark.streaming.incremental import expire

    gcorp, gidx, _gstats = _global_index(spark, sf_dir)
    n = int(gcorp.agg(F.sum("n_tok")).first()[0] or 0)
    horizon = (n // 2) // CFG.leaf_span
    return (
        expire(gidx, CFG.with_(axis="global"), horizon)
        .groupBy("level")
        .agg(F.count("*").alias("n_windows"))
        .select(F.col("level").cast("int").alias("level"), "n_windows")
    )


def q_incremental_append_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-axis incremental insert() (PMIndex/HBI.java:215-267): build the
    index over the FIRST HALF of the stream, append the second half as an
    arriving batch (offset continuation + boundary re-merge), and emit the
    merged index's per-level window counts. The append is byte-equal to a
    from-scratch build (test_streaming asserts the blobs), so the geometry
    must equal the closed form over the WHOLE corpus — which is what the
    DuckDB oracle computes."""
    from hierarchical_bloom_filter_index_spark.corpus import (
        _bucket_boundaries,
        with_global_offsets,
    )
    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        append_increment_global,
        stream_state,
    )

    gcfg = CFG.with_(axis="global")
    docs = _corpus(spark, sf_dir)
    # split point from a bounded seeded sample (NOT collect-all-doc_ids —
    # that's a driver OOM at real scale); ANY doc_id-ordered split works,
    # the oracle's closed form covers the whole stream either way
    cuts = _bucket_boundaries(docs, "doc_id", 2)
    mid = cuts[0] if cuts else "\x7f"
    first_half = with_global_offsets(docs.filter(F.col("doc_id") < mid))
    idx1 = build_index(first_half, gcfg)
    state = stream_state(first_half, gcfg)
    idx, _state = append_increment_global(
        idx1, docs.filter(F.col("doc_id") >= mid), gcfg, state
    )
    return (
        idx.groupBy("level")
        .agg(F.count("*").alias("n_windows"))
        .select(F.col("level").cast("int").alias("level"), "n_windows")
    )


# --- sketch-estimate queries (oracle-free: bound contracts live in tests/) --
def q_cms_freq_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    cms = collect_sketch(
        sketch_aggregate(
            _corpus(spark, sf_dir), "tokens",
            lambda: CountMinSketch.from_eps_delta(0.0005, 0.01, seed=CFG.seed),
            values_are_arrays=True,
        )
    )
    keys = np.asarray(PROBE_TOKENS, dtype=np.int64)
    est = cms.estimate(keys)
    return spark.createDataFrame(
        [(int(t), int(e)) for t, e in zip(PROBE_TOKENS, est)], "token int, est long"
    )


def q_hll_distinct_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    by_src = grouped_sketches(
        sketch_aggregate(
            _corpus(spark, sf_dir), "tokens", lambda: HyperLogLog(p=13, seed=CFG.seed),
            group_cols=("source",), values_are_arrays=True,
        )
    )
    rows = [(src, int(round(sk.estimate()))) for (src,), sk in sorted(by_src.items())]
    return spark.createDataFrame(rows, "source string, est long")


def q_kll_doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    kll = collect_sketch(
        sketch_aggregate(_corpus(spark, sf_dir), "n_tok", lambda: KLL(k=200, seed=CFG.seed))
    )
    return spark.createDataFrame(
        [(q, float(kll.quantile(q))) for q in QUANTILES], "q double, est double"
    )


def q_tdigest_doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = collect_sketch(
        sketch_aggregate(_corpus(spark, sf_dir), "n_tok", lambda: TDigest(delta=100))
    )
    return spark.createDataFrame(
        [(q, float(td.quantile(q))) for q in QUANTILES], "q double, est double"
    )


def q_hll_rollup_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window geometry of the rolled-up HLL index at EVERY level — exact and
    SQL-checkable (each level's windows are 0..ceil(n_tok/span)-1), so the
    rollup's (doc_id, level, w_id) sets are oracle-verified even though its
    estimates are bound-checked in tests."""
    return _hll_index(spark, sf_dir).select("doc_id", "level", "w_id")


__all__ = [k for k in list(globals()) if not k.startswith('__')]
