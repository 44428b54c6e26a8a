"""Physical-plan quality gates: the optimizations we rely on at 100 TB must
be visible in .explain() — partition pruning on the sketch table's level
directory, column pruning into the parquet scan, and no Python stages in the
verification path."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.functions import subsequence_positions
from hierarchical_bloom_filter_index_spark.operators import build_index
from hierarchical_bloom_filter_index_spark.sources.io import read_index, write_index

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=2)


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_level_partition_pruning(spark, tmp_path):
    corp = C.generate_corpus(spark, sf=0.001, seed=2)
    idx = build_index(corp, CFG)
    path = str(tmp_path / "idx")
    write_index(idx, path)
    back = read_index(spark, path).filter(F.col("level") == CFG.deepest)
    plan = _plan(back)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "level" in part_lines[0], plan
    # pruning actually selects one directory: scanning the pruned df reads
    # exactly the rows of that level, with no filter surviving post-scan
    assert back.count() == read_index(spark, path).filter(f"level = {CFG.deepest}").count()


def test_column_pruning_reaches_scan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.select(F.length("text").alias("n"))
    plan = _plan(q)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "text" in read_schema[0]
    assert "lang" not in read_schema[0] and "source" not in read_schema[0]


def test_verification_is_whole_stage_codegen(spark, tmp_path):
    # parquet-backed corpus: the verify expression must be codegen'd with no
    # Python stage between scan and result
    C.generate_corpus(spark, sf=0.001, seed=2).write.parquet(str(tmp_path / "c"))
    corp = spark.read.parquet(str(tmp_path / "c"))
    verify = corp.select("doc_id", F.explode(subsequence_positions("tokens", [1, 2, 3])).alias("pos"))
    plan = _plan(verify)
    assert "codegen id" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan  # exact verify is pure JVM


def test_bucketed_index_scan_is_co_located(spark, tmp_path):
    """The persisted sketch table bucketed by w_id joins without an Exchange
    on the (big) index side — only the probe side shuffles."""
    from pyspark.sql import functions as F

    from hierarchical_bloom_filter_index_spark.sources.io import (
        read_index_table,
        write_index_bucketed,
    )

    corp = C.generate_corpus(spark, sf=0.001, seed=2)
    idx = build_index(corp, CFG)
    write_index_bucketed(idx, "hbi_idx_bucketed_test", n_buckets=8)
    try:
        with_bucket_off = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        tbl = read_index_table(spark, "hbi_idx_bucketed_test").filter(f"level = {CFG.deepest}")
        probe = spark.range(0, 50).select(F.col("id").alias("w_id"))
        plan = _plan(tbl.join(probe, "w_id", "left_semi"))
        assert "Bucketed: true" in plan, plan
        # at most the probe side shuffles; the index scan feeds the join
        # directly from its buckets
        scan_part = plan.split("Exchange")[0]
        assert "Scan parquet" in scan_part or plan.index("Bucketed: true") < plan.index("Exchange")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_bucket_off)
        spark.sql("DROP TABLE IF EXISTS hbi_idx_bucketed_test")


def test_filter_pushdown_on_corpus_source(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.filter(F.col("source") == "src1").select("doc_id")
    plan = _plan(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "source" in pushed[0]


def test_multilevel_pruning_beats_single_level_on_mixed_pattern(spark):
    """Per-token level assignment (search/MultiLevelPruning.java:23-32): on a
    pattern mixing a ubiquitous key with a rare one, the single-level
    MostFreqPruning rule is dragged to the deepest level by the frequent key
    (probing every leaf window), while the multilevel rule seeds at the rare
    key's shallow level and probes measurably fewer windows — with identical
    exact matches."""
    import numpy as np

    from hierarchical_bloom_filter_index_spark.operators import (
        brute_force_search,
        frequency_summary,
        index_stats,
        pattern_search,
    )
    from hierarchical_bloom_filter_index_spark.plans.cost import (
        choose_start_level_multilevel,
        closed_form_pruning_level,
        per_key_pruning_levels,
    )

    # 64 docs of 256x token 7; two docs also carry the rare token 99
    docs = []
    for i in range(64):
        toks = [7] * 256
        if i in (5, 40):
            toks[100] = 99
        docs.append((f"d{i:03d}", toks, 256, "s"))
    corp = spark.createDataFrame(docs, C.CORPUS_SCHEMA).repartition(4).cache()
    idx = build_index(corp, CFG).cache()
    stats = index_stats(idx, CFG)
    freq = frequency_summary(corp, CFG)
    pat = [7, 99]
    probs = freq.estimate(np.asarray(pat, dtype=np.int64)) / max(1, freq.total)

    per_key = per_key_pruning_levels(stats, probs)
    assert per_key[0] == int(stats["level"].max())  # ubiquitous key: never prunes
    assert per_key[1] <= 1                          # rare key: prunes near the root
    ml_level, _ = choose_start_level_multilevel(stats, probs, len(pat))
    single_level = closed_form_pruning_level(
        0.95, float(probs.max()), len(stats), CFG.tree_span, float(stats["fill_fpr"].mean())
    )
    assert ml_level < single_level  # mixed pattern: multilevel seeds shallower

    def probed(lvl):
        so: dict = {}
        res = sorted(map(tuple, pattern_search(corp, idx, CFG, pat, start_level=lvl,
                                               stats_out=so).collect()))
        return sum(so["windows_probed"].values()), res

    n_ml, res_ml = probed(ml_level)
    n_single, res_single = probed(single_level)
    exp = sorted(map(tuple, brute_force_search(corp, pat).collect()))
    assert res_ml == res_single == exp and len(exp) == 2
    assert n_ml < n_single, f"multilevel probed {n_ml}, single {n_single}"

    # the model='multilevel' route records per-key levels in stats_out
    so: dict = {}
    res = sorted(map(tuple, pattern_search(
        corp, idx, CFG, pat, start_level="auto", freq=freq, stats=stats,
        model="multilevel", stats_out=so).collect()))
    assert res == exp
    assert so["start_level"] == ml_level
    assert so["per_key_levels"] == {7: int(per_key[0]), 99: int(per_key[1])}
    corp.unpersist(); idx.unpersist()


def test_grouped_merge_single_exchange(spark):
    """The window-sketch children merge repartitions by its group keys and
    the aggregate reuses that partitioning — exactly ONE Exchange in the
    plan. A second exchange would mean Catalyst did not recognize the
    distribution and the data-sized partition fix (rollup._merge_partitions)
    silently stopped applying."""
    import pandas as pd

    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        GLOBAL_SKETCH_SCHEMA,
        _grouped_merge,
    )

    rows = spark.createDataFrame(
        [(5, w, bytes([1, 2, 3])) for w in range(64)],
        "level int, w_id long, sketch binary",
    )

    def passthrough(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[["level", "w_id"]].copy()
            out["sketch"] = [bytes(c[0]) for c in pdf["children"]]
            yield out

    merged = _grouped_merge(rows, ("level", "w_id"), passthrough,
                            GLOBAL_SKETCH_SCHEMA, 16)
    plan = _plan(merged)
    # count tree nodes only ("+- Exchange"); the formatted details section
    # repeats each node name a second time
    n_exchanges = len([l for l in plan.splitlines() if l.lstrip().startswith("+- Exchange")])
    assert n_exchanges == 1, f"expected 1 Exchange (the keyed repartition), got {n_exchanges}:\n{plan}"
    assert merged.count() == 64


def test_window_sketch_build_plan_shape(spark):
    """The local-rollup builds must keep their shuffle counts: the doc-axis
    plan has ZERO Exchanges (a doc's whole dyadic tree is computed inside
    the leaf mapInPandas) and the global plan exactly TWO (the token
    rebalance + the root-window repartition of the leaf partials). A third
    exchange would mean the level merges regressed to staged shuffles."""
    from hierarchical_bloom_filter_index_spark import corpus as C
    from hierarchical_bloom_filter_index_spark.config import HbiConfig
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        _global_window_sketch_plan,
        _window_sketch_plan,
    )
    from hierarchical_bloom_filter_index_spark.sketches import cms as cms_kernels

    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=12)
    corp = C.generate_corpus(spark, sf=0.001, seed=12).cache()
    seed = cfg.seed + 11

    doc_plan_df = _window_sketch_plan(
        corp, cfg,
        lambda toks: cms_kernels.leaf_window_blobs(toks, cfg.leaf_span, 3, 64, seed),
        lambda flat, counts: cms_kernels.merge_blob_groups(flat, counts, 3, 64, seed),
    )
    plan = _plan(doc_plan_df)
    plan_own = plan.split("InMemoryTableScan")[0]
    n_ex = len([l for l in plan_own.splitlines() if l.lstrip().startswith("+- Exchange")])
    assert n_ex == 0, f"doc-axis build: expected 0 Exchanges, got {n_ex}:\n{plan}"
    assert doc_plan_df.count() > 0

    # cache the offset corpus (as every real caller does): its own prefix-sum
    # exchange then amortizes across builds and the BUILD plan reads a table
    # scan — the two exchanges counted here are the build's own
    gcorp = with_global_offsets(corp).cache()
    gcorp.count()
    gplan_df = _global_window_sketch_plan(
        gcorp, cfg,
        lambda toks, slots, n_slots: cms_kernels.partial_blobs_by_slot(
            toks, slots, n_slots, 3, 64, seed),
        lambda flat, counts: cms_kernels.merge_blob_groups(flat, counts, 3, 64, seed),
    )
    gplan = _plan(gplan_df)
    # count only the BUILD's own exchanges: the cached corpus's
    # InMemoryRelation prints its (already-materialized) build plan below
    # the table scan, and those exchanges execute zero times here
    own = gplan.split("InMemoryTableScan")[0]
    n_gex = len([l for l in own.splitlines() if l.lstrip().startswith("+- Exchange")])
    assert n_gex == 2, f"global build: expected 2 Exchanges, got {n_gex}:\n{gplan}"
    assert gplan_df.count() > 0
    gcorp.unpersist()
    corp.unpersist()


def _n_exchanges(plan: str) -> int:
    return len([l for l in plan.splitlines() if l.lstrip().startswith("+- Exchange")])


def test_sessionize_and_asof_single_exchange(spark):
    """Both event-stream relational ops are ONE-shuffle plans: the lag +
    running-sum pair shares a single window exchange, and the as-of
    union-tag sort runs over one exchange (plus its own result exchange is
    absent — no extra repartition). A second keyed exchange would mean the
    two window expressions stopped sharing their (partitionBy, orderBy)."""
    from hierarchical_bloom_filter_index_spark.operators.sessions import (
        asof_join,
        sessionize,
        with_sessions,
    )

    ev = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 15, 102)],
        "user_id long, t_us long, event_id long")
    tagged = with_sessions(ev, 5, order_cols=("event_id",))
    assert _n_exchanges(_plan(tagged)) == 1, _plan(tagged)
    # the per-session aggregate adds at most one more exchange (session
    # keys are a superset of the window partitioning)
    sess = sessionize(ev, 5, order_cols=("event_id",))
    assert _n_exchanges(_plan(sess)) <= 2, _plan(sess)

    left = ev.select("event_id", "user_id", "t_us")
    right = ev.select("user_id", "t_us", F.col("event_id").cast("double").alias("v"))
    out = asof_join(left, right, "user_id", "t_us", ["v"])
    assert _n_exchanges(_plan(out)) == 1, _plan(out)


def test_sampling_plans_are_narrow(spark):
    """The Bernoulli sampling forms must stay ZERO-shuffle narrow plans
    (hash + filter where the data lives); top-n keeps exactly ONE keyed
    exchange for its per-stratum window."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        hash_topn_per_stratum,
        split_column,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string")
    samp = stratified_sample(df, "doc_id", "source", {"s0": 0.2}, 0.5, 7)
    assert _n_exchanges(_plan(samp)) == 0, _plan(samp)
    spl = split_column(df, "doc_id", {"a": 0.5, "b": 0.5}, 7)
    assert _n_exchanges(_plan(spl)) == 0, _plan(spl)
    topn = hash_topn_per_stratum(df, "doc_id", "source", 2, 7)
    assert _n_exchanges(_plan(topn)) == 1, _plan(topn)


def test_contamination_plan_broadcasts_bench(spark):
    """The decontamination gram join must be a BROADCAST hash join (bench
    grams are the small side by contract) — a SortMergeJoin here would put
    the whole corpus gram stream through a sort exchange at 100 TB — and
    the only exchange is the final (doc, bench) pair count."""
    from hierarchical_bloom_filter_index_spark.operators.contamination import (
        contamination_pairs,
    )

    docs = spark.createDataFrame(
        [(str(i), "x" * 20 + str(i)) for i in range(40)],
        "doc_id string, text string")
    bench = docs.limit(3).select(F.col("doc_id").alias("bench_id"), "text")
    plan = _plan(contamination_pairs(docs, bench, 16))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_topk_plans_take_ordered(spark):
    """skip-gram co-occurrence and tf-idf must never global-sort: the
    ranked forms compile to TakeOrderedAndProject (skip-gram) / a per-doc
    window (tf-idf, no Sort outside the partitioned window)."""
    from hierarchical_bloom_filter_index_spark.operators.text import (
        skipgram_cooccurrence_topk, tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [(str(i), f"a b c d{i} e f") for i in range(30)],
        "doc_id string, text string")
    sg = _plan(skipgram_cooccurrence_topk(docs, window=2, k=5))
    assert "TakeOrderedAndProject" in sg, sg
    tp = tfidf_top_terms(docs, k=2)
    plan = _plan(tp)
    # broadcast df/N joins; the one wide exchange partitions by doc for the
    # window — never a global (single-partition) sort
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "Exchange SinglePartition" not in plan.replace(
        "Exchange SinglePartition, EXECUTOR_BROADCAST", ""), plan


def test_shard_assignment_has_no_global_sort(spark):
    """token_budget_shards rides with_global_offsets: seeded-hash range
    buckets + per-bucket prefix — NO rangepartitioning sort of the corpus,
    no single-partition window."""
    from hierarchical_bloom_filter_index_spark import corpus as C
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        token_budget_shards,
    )

    corp = C.generate_corpus(spark, sf=0.002, seed=42)
    plan = _plan(token_budget_shards(corp, 4096).select("doc_id", "shard_id"))
    assert "rangepartitioning" not in plan.lower(), plan
    assert "Exchange SinglePartition" not in plan, plan


def test_mixture_manifest_prunes_before_window(spark):
    """mixture_manifest's scale contract: the bucket-base join is a
    BROADCAST hash join whose base<budget condition prunes whole buckets
    BEFORE the window exchange (a SortMergeJoin, or a prune only after
    the window, would move the whole corpus through the exchange at
    100 TB). Exactly one exchange (stratum, bucket) feeds the window."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        mixture_manifest,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", 5) for i in range(60)],
        "doc_id long, source string, w long")
    out = mixture_manifest(df, "doc_id", "source", "w", {"s0": 20}, 7,
                           default_budget=15)
    plan = _plan(out)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the join CONDITION carries the budget prune (base < CASE ...): in
    # formatted mode the details block prints "Join condition: (_base ...)"
    import re
    m = re.search(r"Join condition:.*", plan)
    assert m and "_base" in m.group(0) and "CASE WHEN" in m.group(0), plan
    assert _n_exchanges(plan) == 1, plan


def test_repetition_plans_two_exchanges(spark):
    """Both repetition metrics: the n-gram explode/offset scan is narrow;
    exactly two keyed exchanges ((doc, gram) stats then per-doc window) —
    a third exchange would mean the islands/groupBy failed to reuse the
    window partitioning."""
    from hierarchical_bloom_filter_index_spark.operators.repetition import (
        dup_ngram_coverage, top_ngram_stats,
    )

    docs = spark.createDataFrame(
        [(i, "a b a b c d " * 3) for i in range(10)],
        "doc_id long, text string")
    for op in (top_ngram_stats, dup_ngram_coverage):
        plan = _plan(op(docs, 2))
        assert _n_exchanges(plan) == 2, (op.__name__, plan)


def test_zero_shuffle_scan_ops_plan_shape(spark):
    """The 10th-session scan ops must stay ZERO-Exchange projections:
    bm25_topk_docs (TakeOrderedAndProject, no decimal literals leaking
    into the score), redact_pii, chunk_by_chars/words."""
    from hierarchical_bloom_filter_index_spark.operators.chunk import (
        chunk_by_chars, chunk_by_words,
    )
    from hierarchical_bloom_filter_index_spark.operators.pii import (
        redact_pii,
    )
    from hierarchical_bloom_filter_index_spark.operators.text import (
        bm25_topk_docs,
    )

    docs = spark.createDataFrame(
        [(str(i), f"alpha beta g{i} delta dup" if i % 3 == 0
          else f"alpha beta g{i} delta") for i in range(40)],
        "doc_id string, text string")

    bm = _plan(bm25_topk_docs(docs, ["dup", "alpha"], k=5))
    assert "TakeOrderedAndProject" in bm, bm
    for plan in (
        bm,
        _plan(redact_pii(docs)),
        _plan(chunk_by_chars(docs, 16, 4)),
        _plan(chunk_by_words(docs, 4, 1)),
    ):
        n_ex = len([l for l in plan.splitlines()
                    if l.lstrip().startswith("+- Exchange")])
        assert n_ex == 0, plan
    # the BM25 score must be pure DOUBLE arithmetic: a bare decimal
    # literal would silently switch both engines to (different) decimal
    # promotion rules
    assert "decimal" not in bm.lower(), bm


def test_exact_quantile_plan_shape(spark):
    """The certified-exact quantile query must keep its 100x-survivable
    shape: cover nodes reach the KLL index via a BROADCAST hash join (never
    a shuffled join against the index), the verify side pays exactly TWO
    shuffle exchanges (the token-explode and bracket sides of the verify
    join), and the aggregation plus all four window ops REUSE the join's
    (doc, range) partitioning — zero exchanges after the join."""
    from hierarchical_bloom_filter_index_spark import corpus as C2
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_kll_window_index,
        range_exact_quantiles,
    )

    corp = C2.generate_corpus(spark, sf=0.001, seed=2).cache()
    idx = build_kll_window_index(corp, CFG, k=200).cache()
    idx.count()
    q = range_exact_quantiles(idx, corp, [(0, 4)], [0.5], CFG.leaf_span, CFG.deepest)
    plan = _plan(q)
    tree = [l for l in plan.splitlines()
            if l.lstrip().startswith(("+-", ":-", ":  +-", "AdaptiveSparkPlan"))]
    tree_txt = "\n".join(tree)
    assert _n_exchanges(plan) == 2, plan          # verify-join sides only
    assert "BroadcastHashJoin" in tree_txt, plan  # cover nodes broadcast
    # the windows + aggregation must REUSE the verify join's partitioning:
    # in the root-first tree, no Exchange may sit between the Window nodes
    # and the SortMergeJoin they hang above
    win_at = min(i for i, l in enumerate(tree) if "Window" in l)
    smj_at = min(i for i, l in enumerate(tree) if "SortMergeJoin" in l)
    assert win_at < smj_at, plan
    assert not any("Exchange" in l for l in tree[win_at:smj_at]), plan
    idx.unpersist(); corp.unpersist()


def test_profile_and_bucket_plan_shapes(spark):
    """profile_columns is a ONE-exchange plan (the per-column fold of the
    tiny partial table); sketch bucket ASSIGNMENT is a zero-shuffle,
    zero-Python narrow plan (pure codegen comparisons), so writers can lay
    out 100 TB without any extra wide stage."""
    from hierarchical_bloom_filter_index_spark.operators.profile import (
        profile_columns,
    )
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        sketch_range_buckets,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    prof = profile_columns(li, ["l_linenumber"])
    assert _n_exchanges(_plan(prof)) == 1, _plan(prof)
    bucketed, _ = sketch_range_buckets(li, "l_extendedprice", 4)
    p = _plan(bucketed)
    assert _n_exchanges(p) == 0, p
    assert "MapInPandas" not in p and "ArrowEvalPython" not in p, p
