"""Benchmark harness — prints ONE JSON line per the driver contract.

Headline: sketch-build throughput (tokens/sec) of the hierarchical Bloom
index over the documents-derived corpus at $SPARK_GRAFT_SF_DIR, plus
wall-times of the representative query suite. value = total bench seconds.

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  HBI_BENCH_QUERIES   (optional comma list to restrict)
"""

from __future__ import annotations

import json
import os
import sys
import time


def _contention_snapshot() -> dict:
    """Record box contention BEFORE timing anything.

    CLAUDE.md documents the failure mode: orphaned JVMs from killed jobs
    polluted two round-3 timings 3-10x. The driver runs this file
    unattended, so the guard must live here — a polluted run has to be
    distinguishable from a regression in the recorded JSON itself.
    """
    import subprocess

    try:
        out = subprocess.run(
            ["pgrep", "-c", "java"], capture_output=True, text=True, timeout=5
        ).stdout.strip()
        jvms = int(out) if out else 0
    except Exception:
        jvms = -1
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = -1.0
    ncpu = os.cpu_count() or 1
    contended = jvms > 0 or load1 > 0.5 * ncpu
    snap = {
        "preexisting_jvms": jvms,
        "load1": round(load1, 2),
        "cpu_count": ncpu,
        "contended": contended,
    }
    if contended:
        print(
            f"# WARNING: contended box before bench start: {snap} — "
            "timings below may be polluted (not a code regression)",
            file=sys.stderr,
        )
    return snap


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    contention = _contention_snapshot()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hbi-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from pyspark.sql import functions as F

    timings: dict[str, float] = {}
    total0 = time.time()

    # --- headline: index build throughput -----------------------------------
    corpus = E._corpus(spark, sf_dir)
    n_tokens = corpus.agg(F.sum("n_tok")).first()[0]
    # spin up the Python workers + Arrow serialization once (an identity
    # mapInPandas over a few rows) so the timed build measures the build,
    # not the session's one-time worker fork/JIT — the steady-state number
    # is what scales to a long-lived cluster
    corpus.limit(64).mapInPandas(lambda it: it, schema=corpus.schema).count()
    t0 = time.time()
    index = E._index(spark, sf_dir)
    index.count()  # materialize the cached sketch table
    # the frequency summary + per-level stats are build artifacts (the
    # reference maintains its estimator during insert) — build them here
    E._planner_inputs(spark, sf_dir)
    build_sec = time.time() - t0
    timings["index_build"] = round(build_sec, 3)
    tokens_per_sec = n_tokens / build_sec if build_sec > 0 else float("inf")

    wanted = os.environ.get("HBI_BENCH_QUERIES")
    names = wanted.split(",") if wanted else [
        "hbi_pattern_present",
        "hbi_pattern_missing",
        "hbi_pattern_rare",
        # 4 patterns, ONE shared cascade (operators/batch.py) — compare with
        # the sum of the three single-pattern queries above
        "hbi_pattern_batch",
        # gapped-literal report(): same cascade, literal-only probe plan
        "hbi_pattern_wildcard",
        # approximate report(): pigeonhole fragments, Hamming verifier
        "hbi_kmismatch",
        "hbi_kedit",
        # whole misspelled-dictionary workload, one cascade
        "hbi_approx_batch",
        "hbi_pattern_charclass",
        # regex report(): required-factor chain through the shared cascade,
        # then a whole regex dictionary through one cascade
        "hbi_regex",
        "hbi_regex_batch",
        # ranked fuzzy search (top-k by edit distance)
        "fuzzy_topk_matches",
        "window_membership",
        # whole token workload in ONE leaf scan (doc axis + one-stream axis)
        "window_membership_batch",
        "global_window_membership_batch",
        # conjunctive proximity (A within w of B), doc + one-stream axes
        "hbi_proximity",
        "hbi_global_proximity",
        "hbi_proximity_batch",
        "hbi_global_proximity_batch",
        # NOT-proximity workload (certificate split) in one scan
        "hbi_negated_batch",
        # any-of synonym-set sides, priced per side not per pair
        "hbi_set_proximity",
        # phrase-with-slop: backward existence DP; then a whole dictionary
        "hbi_chain",
        "hbi_chain_batch",
        # synonym-phrase dictionary (per-slot alternative sets)
        "hbi_set_chain",
        # ranked retrieval: top-k docs by occurrence count
        "hbi_pattern_topk_docs",
        # index-accelerated char-pattern BM25 + the word-level ln-idf twin
        # (zero-shuffle corpus scan, TakeOrderedAndProject)
        "hbi_bm25_topk",
        "bm25_topk_docs",
        # autocomplete: ranked next-3-token continuations of the match stream
        "hbi_pattern_completions",
        # range-restricted report(): the cascade on a (level, w_id)-sliced
        # index — a narrow token-offset slice probes O(range/span) windows
        "hbi_pattern_range",
        "bigram_topk",
        "cms_freq_probes",
        "hll_distinct_by_source",
        "kll_doclen_quantiles",
        # dedup_jaccard_pairs (the exact all-co-occurring-pairs oracle) is
        # deliberately NOT in the bench: on this tiny-vocab synthetic corpus
        # nearly every doc pair shares shingles, so the exact join is
        # quadratic — the LSH path below is the scale answer
        "minhash_lsh_neardup",
        # ingestion-batch near-dup vs the PERSISTED corpus signature index
        # (corpus never re-shingled; result is a parity diff vs the full
        # run, so the timing covers index read + bucket join + verify x2)
        "incremental_neardup_parity",
        "simhash_neardup",
        "ann_cosine_topk",
        # filtered exact ANN: metadata predicate pushed to the corpus scan
        "ann_cosine_topk_filtered",
        # SemDeDup containment gate: clustered semantic pairs + the exact
        # twin + the anti-join equality check, all in one timing
        "semantic_dedup_containment",
        "text_quality",
        "collocations_pmi",
        # skip-gram co-occurrence matrix + per-doc tf-idf keywords
        "skipgram_cooccurrence",
        "tfidf_top_terms",
        # PII scrub: sequential JVM regexp fold, one codegen'd scan
        "pii_redact",
        # BPE: train on the word table (one groupBy) + Arrow encode pass
        "bpe_char_conservation",
        # bigram-LM quality scores: two count groupBys + broadcast-lookup
        # Arrow scoring pass (fixed-point integer sums)
        "lm_doc_scores",
        # Gopher repetition filters: top-bigram char fraction + duplicated
        # trigram char coverage (variable-length islands union)
        "doc_top_ngram_repetition",
        "doc_dup_ngram_coverage",
        # the composed per-source quality dashboard (metrics + repetition
        # joins + one groupBy(source))
        "corpus_quality_report",
        # benchmark decontamination (bench grams broadcast, pairs shuffle)
        "decontaminate_pairs",
        # per-doc gram novelty: the exact gram-df table, linear-by-design
        "novelty_scores",
        # incremental novelty: batch scored vs the PERSISTED df index
        # (bucket-partition-pruned read; df shuffle paid at index time)
        "novelty_against_corpus",
        # contamination audit + redaction spans + composed clean manifest
        "contaminating_grams",
        "contamination_spans",
        "clean_corpus_docs",
        # cross-doc exact substring dedup: dup-span audit + keep-first scrub
        # (one linear gram-stats shuffle, then dup-bounded work only)
        "crossdoc_dup_spans",
        "scrub_crossdoc_docs",
        # ingest-time scrub vs the PERSISTED gram index (bucket-pruned read;
        # timing includes writing the index on the first rep, cached after)
        "scrub_ingest_docs",
        # incremental gram-df maintenance gates (index writes + an append /
        # removal + the symmetric difference — parity gates, not queries)
        "gram_index_append_parity",
        "gram_index_remove_parity",
        # incremental profile maintenance gate (base + increments + compact
        # == one-scan profile; the STREAM twin stays out — it drains)
        "profile_incremental_parity",
        # snapshot audit: added/removed/changed keys in one pruned full
        # outer join (exact mode + the in-query hash-mode parity gate)
        "corpus_snapshot_diff",
        # token-budget training-shard manifest (offset prefix sums)
        "dataset_shards",
        # epoch-shuffled shard packing + per-source budget mixture manifest
        "epoch_shard_stats",
        "mixture_manifest_docs",
        # sample packing: the concatenated per-shard token streams + doc
        # boundary offsets (one bounded groupBy(shard_id) shuffle)
        "packed_sequences",
        # faceted retrieval: match rollup by doc metadata
        "hbi_pattern_facets",
        "token_count",
        "positional_fingerprint",
        "window_distinct_rollup",
        "hll_window_rollup",
        # frequency siblings: MG candidates + exact verify; CMS rollup build
        # is paid on the first rep and cached (steady state recorded)
        "heavy_hitter_bigrams",
        "cms_window_rollup",
        # dyadic range answers from O(log) covering nodes (totals exact;
        # quantiles via the KLL rollup — its build is paid on first rep)
        "range_window_totals",
        "range_quantiles",
        # quantile sibling #2: t-digest rollup (deterministic, tail-accurate;
        # first rep pays its build, cached)
        "range_tdigest_quantiles",
        # inverse-quantile family: exact sparse-CMS rank + t-digest CDF
        # estimate (cms/td indexes already cached above)
        "range_rank",
        "range_tdigest_cdf",
        "range_distinct",
        # range second moment (AMS family; first rep pays the cs rollup)
        "range_f2",
        # EXACT range heavy hitters: MG cover-node candidates bound the
        # verify aggregation (first rep pays the MG rollup build, cached)
        "range_heavy_hitters",
        # EXACT range distinct-sample: bottom-k mergeability makes the
        # answer a value (first rep pays the BottomK rollup build, cached)
        "range_distinct_sample",
        # EXACT self-certifying range top-k (MG tracked set + residual
        # bound; exact verify over candidates only)
        "range_topk_tokens",
        # CERTIFIED EXACT order statistics: KLL cover-node bracket + one
        # exact bounded pass (refuses on a missed bracket, never wrong)
        "range_exact_quantiles",
        "range_trimmed_sum",
        "global_offsets",
        # the one-stream axis end-to-end: first rep pays the global index
        # build (cached thereafter), best-of-2 records the steady state
        "hbi_global_pattern",
        # several patterns through ONE shared global cascade
        "hbi_global_pattern_batch",
        # the batch design point: 16 patterns, one cascade (~8x vs singles)
        "hbi_global_pattern_batch_wide",
        "global_range_totals",
        # one-stream content takedown by linear subtraction (first rep pays
        # the negative-index build + subtract; totals off the new index)
        "global_sketch_takedown_totals",
        # deletable-Bloom gate: counting view == scratch over survivors
        "counting_takedown_parity",
        "global_range_quantiles",
        "global_range_tdigest_quantiles",
        "global_range_rank",
        "global_range_tdigest_cdf",
        "global_range_topk_tokens",
        "global_range_exact_quantiles",
        "global_range_trimmed_sum",
        # anchored regex on the one-stream axis (global index cached above)
        "hbi_global_regex",
        # stream-offset slice search on the one-stream axis
        "hbi_global_pattern_range",
        # cross-doc autocomplete on the one-stream axis
        "hbi_global_pattern_completions",
        "events_hourly",
        # same aggregate THROUGH Structured Streaming (watermarked windows)
        "events_hourly_stream",
        # event-stream relational ops: sessionization + as-of join
        "event_sessions",
        "events_asof_purchase",
        # exact integer-scaled exponential decay (one scan, one groupBy)
        "decayed_event_counts",
        # corpus drift: exact pairwise TVD between all sources' token
        # distributions (one counts shuffle + group-bounded token join)
        # + top-k attribution for one pair
        "source_token_tvd",
        "tvd_top_tokens",
        # per-doc distributional atypicality (linear join, no doc-doc pair)
        "doc_atypicality_topk",
        # same machinery on a relational categorical: 435 day-pairs of
        # event-type distributions
        "event_type_drift",
        # continuous drift: source-pair KS over doc lengths from grouped
        # KLL sketches (one sketch pass; pairwise readout driver-side)
        "source_doclen_ks",
        # declarative data-quality gate: 5 scalar constraints in ONE
        # aggregate pass + unique groupBy + fk anti-broadcast
        "orders_expectations",
        # auto data contract: profile -> exact-field suggestions -> report
        "profile_learned_contract",
        # row-level quarantine routing (projection + window + broadcast)
        "orders_quarantine",
        # planner statistics: sketch join-size (AMS dot), key-skew F2,
        # KMV key overlap, HLL key set algebra, exact heavy values —
        # all one-pass-per-side, only sketch blobs move
        "join_size_estimate",
        # binned interval/point range join (equi-join on bins, never a
        # BroadcastNestedLoop — plan-asserted in tests)
        "shipments_in_order_window",
        "order_window_overlaps",
        "custkey_skew_f2",
        "custkey_overlap",
        # SymSpell deletion-neighborhood edit-distance self-join (equi-join
        # blocking + exact levenshtein verify — never a cross join)
        "customer_fuzzy_name_pairs",
        "custkey_setops",
        "event_type_heavy",
        # deterministic stratified sample (zero-shuffle narrow plan)
        # one-pass sketch profile of relational columns (exact-regime gates)
        "table_profile",
        "grouped_profile",
        # KLL-boundary balanced range bucketing + in-plan balance certificate
        "sketch_bucket_balance",
        # data skipping through the bucketed layout (first rep writes the
        # layout, cached after; partition filter prunes bucket dirs)
        "bucket_pruned_read",
        # file-level zone-map skipping (first rep writes the clustered
        # layout + zone map, cached after; range envelope / per-file Bloom
        # prune, exact predicate closes the contract)
        "zonemap_pruned_range",
        "zonemap_fast_count",
        # exact range SUM mostly from metadata (per-file BIGINT sums)
        "zonemap_fast_sum",
        "zonemap_bloom_lookup",
        # copy-on-write MERGE INTO: rewrites only envelope-touched files
        # (layout + map rebuilt fresh per rep — merges mutate; the timing
        # IS the whole upsert, write + map maintenance included)
        "zonemap_merge_upsert",
        # copy-on-write range delete (metadata-only interior drops) +
        # orphan vacuum, layout rebuilt fresh per rep like the merge
        "zonemap_delete_range",
        # versioned table: create + upsert + delete commits, 3 time-travel
        # reads, snapshot expiry — the whole lifecycle per rep
        "vtable_time_travel",
        # per-snapshot metadata COUNT/SUM through time travel
        "vtable_fast_stats",
        # named-table catalog: tag/branch reads == time travel, ref-pinned
        # retention refusal, post-expiry branch parity (whole lifecycle)
        "catalog_table_ops",
        # drift x time travel: TVD between three vtable snapshots
        "snapshot_token_drift",
        # Z-order multi-column clustering: range predicates on EITHER
        # column (and their conjunction) skip files of ONE layout (first
        # rep writes the layout + two-column zone map, cached after)
        "zorder_pruned_partkey",
        "zorder_pruned_orderkey",
        "zorder_pruned_conjunction",
        # append with meta-pinned boundaries; pruning still skips (gated)
        "zorder_append_parity",
        "stratified_sample_docs",
        "weighted_sample_docs",
        # per-source bottom-decile quality cut (one window exchange)
        "short_doc_pruned",
        # corpus after near-dup clustering — the LSH-fed scale path (the
        # exact-Jaccard-fed oracle twin rides the quadratic pair graph and
        # stays OUT of the bench, like dedup_jaccard_pairs)
        "neardup_canonical_lsh",
        # content-defined chunking: edit-stable boundaries (one Arrow
        # pass, zero shuffles) + chunk-store dedup accounting
        "cdc_chunk_spans",
        "cdc_dedup_stats",
        # chunk-level near-dup pair graph + its exact structure metrics
        # (degree-ordered-orientation triangle counting) + ranked
        # chunk-Jaccard retrieval
        "cdc_shared_pairs",
        "cdc_graph_stats",
        "cdc_topk_similar",
        # persisted chunk store: the whole write+read accounting per rep,
        # then the append/remove maintenance parity gates (the stream
        # twin stays OUT — it drains)
        "chunk_store_stats",
        "chunk_store_append_parity",
        "chunk_store_remove_parity",
        # batch novelty vs the persisted store (bucket-partition-pruned)
        "chunk_novelty",
        # tokenizer health: running-word coverage + per-source OOV terms
        "source_vocab_coverage",
        "oov_top_terms",
        # robust per-group outliers (exact integer median/MAD rule)
        "doclen_mad_outliers",
        # behavioral paths + rolling aggregates + HLL rolling distinct
        "session_paths",
        "event_rolling_daily",
        "event_rolling_distinct",
        # sessionize x exact median/MAD composition over durations
        "session_duration_stats",
        # certified exact sliding-window heavy hitters (MG day nodes +
        # integer certificate + bounded exact verify)
        "rolling_heavy_users",
        # order-free integer embedding centroids (one explode + groupBy)
        "label_centroid_sums",
        # rolling KLL value quantiles (the third rolling-sketch member)
        "rolling_value_quantiles",
        # end-to-end curation chain: dedup -> filter -> shard manifest
        "curation_pipeline_manifest",
    ]
    qmap = E.queries()
    # one throwaway routed query: first execution in a session pays codegen +
    # python-worker + shuffle warmup that no later query repeats
    t0 = time.time()
    qmap["hbi_pattern_rare"](spark, sf_dir).count()
    timings["warmup_query"] = round(time.time() - t0, 3)
    reps = int(os.environ.get("HBI_BENCH_REPS", "2"))
    # count() CANNOT time these: Spark 4 eliminates a left join whose right
    # side has unique keys when only the row count is observed, so the scrub
    # pipelines would collapse to the corpus scan (measured: 0.2s vs the
    # real 5s). The registry lives next to queries() — ONE definition.
    force_col = getattr(E, "FORCE_OUTPUT_COLS", {})
    for name in names:
        best, n = float("inf"), 0
        for _ in range(reps):  # steady state: first run pays worker warm-up
            t0 = time.time()
            df = qmap[name](spark, sf_dir)
            if name in force_col:
                r = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.length(F.col(force_col[name]).cast("string"))).alias("s")).first()
                n = r["n"]
            else:
                n = df.count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s (best of {reps})", file=sys.stderr)

    total = round(time.time() - total0, 3)
    print(
        json.dumps(
            {
                "metric": "hbi_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "tokens_indexed": int(n_tokens),
                "index_build_tokens_per_sec": round(tokens_per_sec),
                "cpus": cpus,
                "contention": contention,
            }
        ),
        # the ONE line the driver reads: flush before spark.stop() — a JVM
        # shutdown hang (or a hard kill during the minutes-long interpreter
        # shutdown these drivers are known for) must not strand the JSON in
        # a block buffer (lost exactly that way once: 165 green entries,
        # empty stdout)
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
