"""training-data pipeline driver queries (dedup/text/ANN/...) — moved verbatim from __spark_entry__.py."""
from __future__ import annotations

from .core import *  # noqa: F401,F403



def q_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style similarity pairs: docs sharing >= 4 winnowing
    fingerprints (k=8, window=4). Exact count over each doc's selected
    fingerprint set; pairs materialize only through the fingerprint
    co-occurrence join (operators/dedup.py:winnowing_pairs). The oracle
    wraps the winnowing SQL twin (nested Horner over LEAD + sliding MIN)
    with the same self-join."""
    return D.winnowing_pairs(_docs(spark, sf_dir), min_shared=4, k=8, window=4)


def q_dedup_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate pairs, HASH-FIRST (mirroring dedup.exact_duplicates):
    the equi-join key is xxhash64(text) — 8 bytes on the shuffle wire instead
    of the full document — and text equality is verified INSIDE the hash
    bucket, so a hash collision can never produce a false pair. Same rows as
    a raw text self-join; at 100 TB the difference is shuffling hashes vs
    shuffling the corpus twice."""
    docs = _docs(spark, sf_dir).select("doc_id", "text", F.xxhash64("text").alias("h"))
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .filter(F.col("a.text") == F.col("b.text"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )


def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs_spark(spark, sf_dir, 400000)


def q_jaccard_prefix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs Jaccard >= 0.9 over document WORD sets via PREFIX
    FILTERING (dedup.jaccard_prefix_pairs — AllPairs/PPJoin): tokens
    globally ordered rarest-first, only each set's short prefix indexed,
    size filter + exact rational-arithmetic verification.  The
    deterministic exact twin of the MinHash/LSH path; the oracle is the
    brute-force DuckDB self-join, so equality proves the prefix blocking
    lost no pair.  (This corpus' tiny synthetic vocabulary makes prefixes
    maximally hot — the worst case for blocking — so like
    dedup_jaccard_pairs it stays out of bench; real vocabularies are the
    scale case, and the hot-prefix cap refuses degenerate ones loudly.)"""
    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sets = docs.where(F.length("text") > 0).select(
        "doc_id", F.split("text", " ").alias("toks"))
    return jaccard_prefix_pairs(sets, "doc_id", "toks", 0.9,
                                max_bucket=None)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from the exact-Jaccard pair graph: alternating
    large-star / small-star connected components (dedup.connected_components
    — O(log^2) rounds of edge-only shuffles, so a duplicate chain at scale
    collapses exponentially instead of one hop per round), cluster_id = the
    component's minimum doc_id (the canonical keeper). The pair graph is the
    SAME oracle-checked set as dedup_jaccard_pairs; the DuckDB twin computes
    components via a recursive transitive closure."""
    from hierarchical_bloom_filter_index_spark.operators.dedup import dedup_clusters

    pairs = _jaccard_pairs_spark(spark, sf_dir, 400000).select("doc_a", "doc_b")
    return dedup_clusters(pairs).select("doc_id", "cluster_id", "cluster_sz")


def q_leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test SPLITS (dedup.leakage_safe_splits): a
    per-document hash split puts near-duplicates on both sides of the
    train/test fence (the canonical held-out-loss contamination); here
    every near-dup COMPONENT of the oracle-checked exact-Jaccard pair
    graph is assigned as a unit — the split key is the component's
    canonical representative, through the same u64 range-partitioned hash
    as dataset_splits.  In-query gate: no component straddles splits.
    Oracle: the recursive-CTE components + the bit-exact SplitMix64 twin
    keyed by the representative."""
    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        dedup_clusters,
        leakage_safe_splits,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    pairs = _jaccard_pairs_spark(spark, sf_dir, 400000).select("doc_a", "doc_b")
    out = leakage_safe_splits(docs, pairs, "doc_id", SPLIT_FRACS, SAMPLE_SEED)
    cc = dedup_clusters(pairs).select("doc_id", "cluster_id")
    worst = (
        out.join(cc, "doc_id")
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k")).first()[0]
    )
    if worst is not None and worst != 1:
        raise AssertionError(
            f"a near-dup component straddles {worst} splits — leakage")
    return out.select("doc_id", "split")


def q_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIANGLE COUNTS over the near-dup pair graph: per doc, the number of
    triangles it corners — the clique-vs-chain diagnostic a dedup pipeline
    checks before collapsing a component to one keeper. Degree-ordered
    orientation (Suri-Vassilvitskii): wedge work bounded O(m^1.5) total
    regardless of hub skew, edges-only shuffles. Same oracle-checked
    exact-Jaccard pair graph as dedup_clusters; the DuckDB twin enumerates
    id-ordered triangles with two self-joins (operators/dedup.
    triangle_counts)."""
    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        triangle_counts,
    )

    pairs = _jaccard_pairs_spark(spark, sf_dir, 400000).select("doc_a", "doc_b")
    return triangle_counts(pairs)


def q_neardup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus AFTER near-dup clustering: docs in no pair + each
    component's min-id member — the manifest a dedup pipeline writes
    shards from. Same pair graph as dedup_clusters; the cut is a
    left-anti join on ids only, text never moves
    (operators/dedup.neardup_canonical_corpus)."""
    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        neardup_canonical_corpus,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    pairs = _jaccard_pairs_spark(spark, sf_dir, 400000).select("doc_a", "doc_b")
    return neardup_canonical_corpus(docs, pairs)


def q_neardup_canonical_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path of the canonical manifest: same composition fed by
    the banded MinHash-LSH pair graph instead of the exact-Jaccard oracle
    graph (which is quadratic on this self-similar corpus and exists for
    the SQL twin only). no_oracle: LSH is seeded numpy, not
    SQL-expressible — the pair graph itself is containment-gated by
    minhash_lsh_containment, and the composition is the oracle-checked
    neardup_canonical_docs."""
    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        neardup_canonical_corpus,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    pairs = D.minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.8, n_perm=128, bands=16
    ).select(F.col("doc_a").cast("string"), F.col("doc_b").cast("string"))
    return neardup_canonical_corpus(docs, pairs)


def q_decontaminate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION: (doc_id, bench_id, n_shared) for every
    corpus doc sharing >= 1 exact 16-char gram with a benchmark doc,
    n_shared = distinct shared grams. Scale shape: the benchmark side's
    grams BROADCAST (eval suites are MBs next to a 100 TB corpus), corpus
    grams explode map-side straight into the broadcast hash join, and the
    only shuffle carries the (doc, bench) pair counts — the report itself
    (operators/contamination.py)."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs, bench = _decon_inputs(spark, sf_dir)
    return X.contamination_pairs(docs, bench, DECON_N)


def q_decontaminate_indexed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE: the index-accelerated decontamination path (one bench
    doc's gram dictionary through ONE shared Bloom cascade,
    contamination_pairs_indexed) must return EXACTLY the broadcast-join
    path's rows — the result is their symmetric difference and the DuckDB
    twin is the empty relation. Planner inputs wired (the cascade cost
    dominates, CLAUDE.md approx-search ladder)."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs, bench = _decon_inputs(spark, sf_dir)
    bench1 = bench.filter(_doc_num("bench_id") == 0)
    freq, stats = _planner_inputs(spark, sf_dir)
    got = X.contamination_pairs_indexed(
        _corpus(spark, sf_dir), _index(spark, sf_dir), CFG, bench1, DECON_N,
        start_level="auto", freq=freq, stats=stats,
    )
    want = X.contamination_pairs(docs, bench1, DECON_N)
    return got.exceptAll(want).unionByName(want.exceptAll(got))


def q_minhash_lsh_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-as-equality hard check for the MinHash-LSH near-dup path:
    LSH pairs UNION (exact >= 0.8 pairs the LSH missed) must EQUAL the exact
    pair set — any LSH FALSE POSITIVE (a surviving pair not in the exact
    set) appears as an extra row the oracle doesn't have, so the driver's
    equality gate proves soundness. Recall (the missed pairs) is the part
    LSH legitimately trades away and stays a pytest bound
    (tests/test_pipeline_ops.py::test_minhash_lsh_recall); a rows-equality
    oracle cannot check it without defeating the point of LSH.
    Both sides run on the _CONTAINMENT_DOMAIN sub-corpus, where the byte-
    and char-shingle definitions coincide (the LSH operator itself is
    domain-unrestricted; minhash_lsh_neardup covers it as shipped)."""
    docs = _docs(spark, sf_dir).filter(_CONTAINMENT_DOMAIN)
    lsh = D.minhash_lsh_pairs(docs, threshold=0.8, n_perm=128, bands=16).select("doc_a", "doc_b")
    exact = _jaccard_pairs_spark(spark, sf_dir, 800000, docs=docs).select("doc_a", "doc_b")
    missed = exact.join(lsh, ["doc_a", "doc_b"], "left_anti")
    return lsh.unionByName(missed)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    stop_terms = [f" {w} " for w in T.STOPWORDS]
    occ_sum = " + ".join(
        f"((length(text) - length(replace(text, '{t}', ''))) div {len(t)})" for t in stop_terms
    )
    return docs.select(
        "doc_id",
        F.expr("cast(length(text) as int)").alias("n_chars"),
        F.expr("cast(size(split(text, ' ')) as int)").alias("n_words"),
        F.expr(
            "((length(text) - size(split(text, ' ')) + 1) * 10000) div size(split(text, ' '))"
        ).alias("avg_word_len_x1e4"),
        F.expr(f"(({occ_sum}) * 10000) div size(split(text, ' '))").alias("stopword_ratio_x1e4"),
    )


def q_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top word bigrams by pointwise mutual information
    (reported as the ratio P(ab)/(P(a)P(b)) — a pure product of exact
    counts, so the doubles match the SQL twin bit for bit; no log()).
    Fully relational: bigram count + two broadcast unigram joins
    (operators/text.py:collocations_pmi)."""
    return T.collocations_pmi(_docs(spark, sf_dir), min_count=3, topk=30)


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: per-doc top-3 terms by integer-scaled
    df-normalized frequency (score = tf * 1e6 div df — ratio tf-idf with
    the per-corpus-constant N factor omitted, so the integer math is
    overflow-free at any corpus size and the ranking unchanged; exact both
    engines, no log()); one tf groupBy, broadcast df join, per-doc
    row_number (operators/text.py:tfidf_top_terms)."""
    return T.tfidf_top_terms(_docs(spark, sf_dir), k=TFIDF_K)


def q_bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WORD-level RANKED RETRIEVAL: top-k docs by true-ln-idf BM25 (Lucene
    +1 form) for a mixed rare/common word bag — the whitespace-token twin
    of hbi_bm25_topk's index-accelerated char-pattern BM25. Zero-shuffle
    corpus scan + TakeOrderedAndProject; every float constant (idf, avgdl,
    k1, b) is a true DOUBLE literal and the score expression is textually
    identical across engines, so scores are bit-exact (ln() runs once, in
    Python — the DuckDB twin's ln is the same glibc; verified bit-equal).
    Ties at rank k break (score DESC, doc_id ASC)
    (operators/text.py:bm25_topk_docs)."""
    return T.bm25_topk_docs(
        _docs(spark, sf_dir), WBM25_TERMS, k=WBM25_K, k1=WBM25_K1, b=WBM25_B)


def q_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL: reciprocal-rank fusion of two deterministic
    rankings — word BM25 (bit-exact scores) and exact term-frequency — in
    pure integer arithmetic (floor(scale/(k+rank)) contributions, order-
    free BIGINT sums), top-10 by (rrf_score DESC, doc_id ASC)
    (operators/text.rrf_fuse / term_tf_topk_docs). The composition point
    for multi-signal retrieval: the rankers carry the scan cost, the fuse
    is a union + groupBy over top-N lists."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    r1 = T.bm25_topk_docs(docs, WBM25_TERMS, k=WBM25_K, k1=WBM25_K1,
                          b=WBM25_B)
    r2 = T.term_tf_topk_docs(docs, WBM25_TERMS, k=WBM25_K)
    # rank = row_number over the already-limited top-k frames (tiny), in
    # each ranking's own deterministic order
    w1 = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    w2 = Window.orderBy(F.desc("tf"), F.asc("doc_id"))
    return T.rrf_fuse(
        [r1.select("doc_id", F.row_number().over(w1).alias("rank")),
         r2.select("doc_id", F.row_number().over(w2).alias("rank"))],
        k=RRF_K, topk=RRF_TOPK, scale=RRF_SCALE)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the laced corpus: per-doc clean text + per-kind
    match counts, all JVM regexp_count/regexp_replace (zero shuffles, one
    codegen'd scan — the 100 TB shape). Patterns live in the Java/RE2
    agreement subset, so the DuckDB twin is byte-equality on the rewritten
    strings (operators/pii.redact_pii)."""
    from hierarchical_bloom_filter_index_spark.operators import pii as P

    return P.redact_pii(_laced_docs(spark, sf_dir))


def q_pii_redact_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest-time PII scrub: the laced corpus drained through a
    file stream in micro-batches, each redacted via foreachBatch with the
    shared replay guard. redact_pii is stateless per doc, so the output
    minus batch_id must equal the one-shot batch redaction — symmetric
    difference, empty-relation oracle (operators/pii.redact_pii_stream).
    Stays OUT of bench (stream drain)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import pii as P

    laced = _laced_docs(spark, sf_dir).select("doc_id", "text")
    work = _tmpdir(prefix="hbi_pii_stream_")
    half = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    laced.filter(half == 0).write.mode("overwrite").parquet(f"{work}/in")
    laced.filter(half == 1).write.mode("append").parquet(f"{work}/in")
    stream = spark.readStream.schema(laced.schema).option(
        "maxFilesPerTrigger", "1").parquet(f"{work}/in")
    q = P.redact_pii_stream(stream, f"{work}/out", f"{work}/chk")
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "redact_pii_stream: availableNow drain exceeded 300s")
    got = spark.read.parquet(f"{work}/out").drop("batch_id")
    want = P.redact_pii(laced)
    return got.exceptAll(want).unionByName(want.exceptAll(got))


def q_pii_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII dashboard: kind totals + docs-with-any-PII count —
    the triage view for scrub-before-training decisions. One map-side
    combined groupBy; only one row per source crosses the exchange
    (operators/pii.pii_totals_by_source)."""
    from hierarchical_bloom_filter_index_spark.operators import pii as P

    return P.pii_totals_by_source(_laced_docs(spark, sf_dir))


def q_chunk_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/context-window prep: fixed-size overlapping char chunks with
    (doc_id, chunk_idx, char_start) provenance — one sequence+posexplode
    projection, zero shuffles (operators/chunk.chunk_by_chars). VALUE
    oracle: generate_series + substr in DuckDB."""
    from hierarchical_bloom_filter_index_spark.operators.chunk import (
        chunk_by_chars)

    return chunk_by_chars(
        _docs(spark, sf_dir), CHUNK_SIZE, CHUNK_OVERLAP)


def q_chunk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-window chunks (whitespace tokens, single-space rejoin — the
    corpus word discipline) with word-offset provenance
    (operators/chunk.chunk_by_words). VALUE oracle via DuckDB list
    slicing."""
    from hierarchical_bloom_filter_index_spark.operators.chunk import (
        chunk_by_words)

    return chunk_by_words(
        _docs(spark, sf_dir), WCHUNK_SIZE, WCHUNK_OVERLAP)


def q_pipeline_clean_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED ingest pipeline evidence: laced corpus -> PII redaction ->
    BPE train+encode ON THE CLEAN TEXT -> per-source dashboard. The
    chained VALUE oracle rides two conservation laws at once: token
    chars == non-space chars OF THE REDACTED text (BPE conservation on
    stage-2 input), and the PII counts are the stage-1 regexp fold — so
    the equality breaks if EITHER stage drifts. Token COUNTS are
    merge-dependent and stay suite-side (operators/pii.py +
    operators/bpe.py composition)."""
    from hierarchical_bloom_filter_index_spark.operators import bpe as B
    from hierarchical_bloom_filter_index_spark.operators import pii as P

    laced = _laced_docs(spark, sf_dir)
    red = P.redact_pii(laced)
    clean = red.select("doc_id", F.col("clean_text").alias("text"))
    merges, _ = B.bpe_train(clean, n_merges=BPE_MERGES)
    enc = B.bpe_encode(clean, merges)
    per = enc.select(
        "doc_id",
        F.aggregate("tokens", F.lit(0),
                    lambda a, t: a + F.length(t)).alias("tok_chars"))
    pii_n = red.select(
        "doc_id",
        (F.col("n_url") + F.col("n_email") + F.col("n_ipv4")
         + F.col("n_phone")).alias("n_pii"))
    return (
        per.join(pii_n, on="doc_id")
        .join(laced.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("tok_chars").cast("long").alias("total_token_chars"),
             F.sum("n_pii").cast("long").alias("n_pii"))
    )


def q_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scores: per-doc bigram log-likelihood under
    an add-0.5-smoothed model trained on the corpus word stream. Counts
    are exact integers; each distinct bigram's ln P computed once
    driver-side (glibc, bit-equal to DuckDB's) and fixed-point scaled to
    nano-units, so per-doc sums are ORDER-FREE bigints — the twin is a
    plain integer SUM, value equality (operators/lm.py)."""
    from hierarchical_bloom_filter_index_spark.operators import lm

    d = _docs(spark, sf_dir)
    lp, meta = lm.train_bigram_lm(d)
    return lm.doc_lm_scores(d, lp, meta)


def q_lm_incremental_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL LM quality scoring: the ingestion batch (%5 == 0 split)
    scored against the PERSISTED model of the rest of the corpus — the
    corpus word stream is never re-counted per batch. Unseen bigrams take
    the smoothed closed form (c2 = 0 with the stored context count), so the
    model transfers to new text and the DuckDB LEFT-JOIN twin VALUE-checks
    every score (ln glibc-shared; fixed-point nano-unit sums order-free)
    (operators/lm.write_lm_model / score_against_lm)."""
    from hierarchical_bloom_filter_index_spark.operators import lm

    batch = _docs(spark, sf_dir).filter(_doc_num("doc_id") % 5 == 0)
    return lm.score_against_lm(spark, batch, _lm_model_path(spark, sf_dir))


def q_lm_stream_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING quality scoring: arriving doc batches drained through a
    file stream, each micro-batch scored against the persisted model via
    foreachBatch (shared replay-guarded sink). The final score table must
    equal the one-shot batch scoring — symmetric difference, empty oracle.
    Batch boundaries cannot change a score: each doc scores against the
    static model only (operators/lm.lm_score_stream)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import lm

    batch = _docs(spark, sf_dir).filter(_doc_num("doc_id") % 5 == 0)
    model = _lm_model_path(spark, sf_dir)
    work = _tmpdir(prefix="hbi_lm_stream_")
    half = _doc_num("doc_id") % 2
    batch.filter(half == 0).write.mode("overwrite").parquet(f"{work}/in")
    batch.filter(half == 1).write.mode("append").parquet(f"{work}/in")
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1").parquet(f"{work}/in")
    q = lm.lm_score_stream(stream, model, f"{work}/out", f"{work}/chk")
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("lm_stream_scores: availableNow drain exceeded 300s")
    try:
        got = spark.read.parquet(f"{work}/out").drop("batch_id")
    except Exception:  # empty batch set -> nothing appended
        got = spark.createDataFrame(
            [], "doc_id string, n_pairs int, logprob_x1e9 long, avg_logprob_x1e9 long")
    want = lm.score_against_lm(spark, batch, model)
    return got.exceptAll(want).unionByName(want.exceptAll(got))


def q_lm_model_append_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for LM model maintenance: model(2/3) + append(1/3) must
    equal the scratch retrain on the whole corpus TABLE-FOR-TABLE (bigram
    and word counts are associative over disjoint doc sets — the strongest
    parity available). Empty symmetric difference; empty-relation oracle
    (operators/lm.append_lm_model)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import lm

    d = _docs(spark, sf_dir)
    third = _doc_num("doc_id") % 3
    base = _tmpdir(prefix="hbi_lm_append_")
    lm.write_lm_model(d.filter(third != 0), f"{base}/inc")
    lm.append_lm_model(d.filter(third == 0), f"{base}/inc")
    lm.write_lm_model(d, f"{base}/full")
    a = _lm_tables_df(spark, f"{base}/inc")
    b = _lm_tables_df(spark, f"{base}/full")
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_lm_model_remove_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for the LM takedown path (right-to-be-forgotten):
    model(all) − remove(1/3) must equal the scratch retrain on the
    remaining 2/3 — keywise subtraction, zero counts dropped, negative
    counts refused loudly. Word-occurrence (not distinct) bookkeeping is
    what makes the vocabulary exact after removal. Empty symmetric
    difference; empty-relation oracle (operators/lm.remove_lm_model)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import lm

    d = _docs(spark, sf_dir)
    third = _doc_num("doc_id") % 3
    base = _tmpdir(prefix="hbi_lm_remove_")
    lm.write_lm_model(d, f"{base}/inc")
    lm.remove_lm_model(d.filter(third == 0), f"{base}/inc")
    lm.write_lm_model(d.filter(third != 0), f"{base}/rest")
    a = _lm_tables_df(spark, f"{base}/inc")
    b = _lm_tables_df(spark, f"{base}/rest")
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_pipeline_curated_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE COMPOSED TRAINING-DATA PIPELINE, end to end in one oracle-checked
    query: (1) exact dedup + benchmark decontamination (contamination.
    clean_corpus — min-id keepers, broadcast bench grams), (2) bigram-LM
    quality scores trained ON the cleaned corpus (lm.py fixed-point
    nano-unit sums), (3) the C4-style cut — drop each source's bottom
    decile by avg log-probability (sampling.drop_bottom_quantile, rational
    cutoff), (4) the per-source curation report: surviving docs, bigram
    pairs, total log-probability. Every stage is integer-exact, so the
    DuckDB twin (the four stage twins composed in one WITH) VALUE-checks
    the whole chain — any drift in dedup, decontamination, scoring, or the
    quantile cut breaks the equality."""
    from hierarchical_bloom_filter_index_spark.operators import (
        contamination as X,
        lm,
        sampling,
    )

    docs, bench = _decon_inputs(spark, sf_dir)
    full = _docs(spark, sf_dir)
    clean = full.join(X.clean_corpus(docs, bench, DECON_N), "doc_id")
    lp, meta = lm.train_bigram_lm(clean)
    scored = lm.doc_lm_scores(clean, lp, meta).join(
        full.select("doc_id", "source"), "doc_id")
    kept = sampling.drop_bottom_quantile(
        scored, "avg_logprob_x1e9", 1, 10, group_col="source")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_pairs").cast("long").alias("n_pairs"),
        F.sum("logprob_x1e9").cast("long").alias("logprob_x1e9"),
    )


def q_bpe_roundtrip_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for the BPE tokenizer: train merges on the corpus word
    table (one groupBy + driver merge loop — the sentencepiece shape),
    encode every document (Arrow pass, zero shuffles), decode, and return
    the docs whose decode differs from the canonical single-spaced text —
    expected EMPTY (merges only regroup characters, so decode-encode is
    the identity). Empty-relation oracle (operators/bpe.py)."""
    from hierarchical_bloom_filter_index_spark.operators import bpe as B

    d = _docs(spark, sf_dir).select("doc_id", "text")
    merges, _ = B.bpe_train(d, n_merges=BPE_MERGES)
    back = B.bpe_decode(B.bpe_encode_words(d, merges))
    canon = d.select(
        "doc_id",
        F.array_join(
            F.filter(F.split("text", " "), lambda w: w != F.lit("")), " "
        ).alias("text"))
    return (
        back.alias("a")
        .join(canon.alias("b"), on="doc_id", how="full_outer")
        .filter(~F.col("a.text").eqNullSafe(F.col("b.text")))
        .select("doc_id", F.col("a.text").alias("decoded"),
                F.col("b.text").alias("expected"))
    )


def q_bpe_char_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source BPE tokenization dashboard with a VALUE oracle: the
    total characters inside the emitted tokens must equal the non-space
    characters of the source text (BPE merges regroup, never create or
    drop). n_docs rides along; token COUNTS are merge-dependent and live
    in the suite contracts instead (operators/bpe.py)."""
    from hierarchical_bloom_filter_index_spark.operators import bpe as B

    d = _docs(spark, sf_dir)
    merges, _ = B.bpe_train(d, n_merges=BPE_MERGES)
    enc = B.bpe_encode(d, merges)
    per = enc.select(
        "doc_id",
        F.aggregate("tokens", F.lit(0),
                    lambda a, t: a + F.length(t)).alias("tok_chars"))
    return (
        per.join(d.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("tok_chars").cast("long").alias("total_token_chars"))
    )


def q_skipgram_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2vec-style skip-gram co-occurrence: top-k (center, context) word
    pairs within a +/-4 window, exact support-filtered counts — the
    co-occurrence matrix an embedding pipeline builds; two codegen'd
    explodes into ONE map-side-combined groupBy, TakeOrderedAndProject
    (operators/text.py:skipgram_cooccurrence_topk)."""
    return T.skipgram_cooccurrence_topk(
        _docs(spark, sf_dir), window=SKIPGRAM_W, k=SKIPGRAM_K,
        min_count=SKIPGRAM_MIN,
    )


def q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select(T.lang_id_column().alias("guess"))
        .groupBy("guess")
        .agg(F.count("*").alias("cnt"))
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", T.token_count_column().alias("n_bpe"))


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True regex-pretokenizer token count (GPT-2-style split, RE2-safe
    pattern so the DuckDB oracle segments identically)."""
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", T.bpe_token_count_column().alias("n_pieces"))


def q_positional_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", T.positional_fingerprint_column().alias("fp"))


def q_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram NOVELTY (copy-paste gate): distinct 16-gram count,
    how many appear in no other doc, and their integer-scaled ratio — the
    exact gram-df table built once with map-side partials and joined back
    on the same key (operators/contamination.py:novelty_scores)."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs, _bench = _decon_inputs(spark, sf_dir)
    return X.novelty_scores(docs, DECON_N)


def q_contaminating_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination AUDIT: top-k grams by witnessed (doc, bench) pairs —
    separates boilerplate (huge, spread counts; strip from the bench) from
    true leakage (focused pairs)
    (operators/contamination.py:top_contaminating_grams)."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs, bench = _decon_inputs(spark, sf_dir)
    return X.top_contaminating_grams(docs, bench, DECON_N, DECON_TOPK)


def q_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURGICAL REDACTION LIST: per-doc maximal char intervals covered by
    bench-shared grams (gaps-and-islands merge over the positioned gram
    hits; one broadcast join + one per-doc window exchange) — cut the span,
    keep the doc (operators/contamination.py:contamination_spans)."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs, bench = _decon_inputs(spark, sf_dir)
    return X.contamination_spans(docs, bench, DECON_N)


def q_dataset_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-SHARD PACKING manifest: docs assigned to ~8192-token shards
    by the deterministic exclusive prefix sum (with_global_offsets — no
    global sort, no single-partition window), per-shard doc/token counts
    and id bounds (operators/sampling.py:token_budget_shards)."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        shard_stats,
    )

    return shard_stats(_corpus(spark, sf_dir), SHARD_BUDGET)


def q_shard_layout_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for the physical shard layout: write_training_shards'
    shard_id-partitioned parquet, read back whole, must carry EXACTLY the
    in-memory assignment — result is the symmetric difference, oracle the
    empty relation. (Partition pruning itself is asserted by scanned-file
    evidence in tests/test_sampling.py.)"""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        token_budget_shards, write_training_shards,
    )

    corpus = _corpus(spark, sf_dir)
    path = _tmpdir(prefix="hbi_shards_q_") + "/layout"
    write_training_shards(corpus, SHARD_BUDGET, path)
    # partition-column type inference reads shard_id back as INT — normalize
    disk = spark.read.parquet(path).select(
        "doc_id", F.col("shard_id").cast("long").alias("shard_id"))
    mem = token_budget_shards(corpus, SHARD_BUDGET).select("doc_id", "shard_id")
    return disk.exceptAll(mem).unionByName(mem.exceptAll(disk))


def q_clean_corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED corpus gate: ids surviving exact dedup (min-id keeper
    per text group) AND benchmark decontamination — the manifest a
    pipeline anti-joins before writing training shards
    (operators/contamination.py:clean_corpus)."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs, bench = _decon_inputs(spark, sf_dir)
    return X.clean_corpus(docs, bench, DECON_N)


def q_decontaminate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING decontamination gate: the corpus drained through a
    file-source stream (two appends — multiple source files), each batch's
    grams exploded map-side into the STATIC bench-gram broadcast join
    (stream-static join, stateless) and accumulated by the complete-mode
    (doc_id, bench_id) count state — contamination_pairs IS the streaming
    query, unchanged; the sink must equal the batch pair table exactly
    (same oracle as decontaminate_pairs). The ingest-time contamination
    check a training pipeline runs on arriving shards."""
    import tempfile
    import uuid

    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs, bench = _decon_inputs(spark, sf_dir)
    workdir = _tmpdir(prefix="hbi_decon_q_")
    inp, chk = f"{workdir}/in", f"{workdir}/chk"
    half = _doc_num("doc_id") % 2  # trailing-digit split: replica-id safe
    docs.filter(half == 0).write.mode("overwrite").parquet(inp)
    docs.filter(half == 1).write.mode("append").parquet(inp)
    stream = spark.readStream.schema(docs.schema).parquet(inp)
    sink = f"decon_stream_{uuid.uuid4().hex[:8]}"
    q = (
        X.contamination_pairs(stream, bench, DECON_N)
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", chk).outputMode("complete")
        .trigger(availableNow=True).start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("decontaminate_stream: availableNow drain exceeded 300s")
    return spark.table(sink)


def q_crossdoc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SUBSTRING-DEDUP AUDIT, corpus vs ITSELF: per doc, the maximal
    char intervals covered by 24-char grams occurring in >= 2 distinct
    docs — the Lee-et-al-style duplicated-text map. One linear gram-stats
    groupBy + a linear join back (one stats row per gram — no pairwise
    blow-up), islands merge over dup positions only
    (operators/contamination.py:cross_doc_dup_spans)."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs, _bench = _decon_inputs(spark, sf_dir)
    return X.cross_doc_dup_spans(docs, SCRUB_N)


def q_scrub_crossdoc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEEP-FIRST exact substring dedup: every 24-gram duplicated across
    docs keeps only its MIN-doc_id owner's text; other owners have the
    covered chars CUT. Returns the whole corpus as (doc_id, clean_text) —
    untouched docs verbatim, fully-duplicated non-keepers become ''. The
    value-hash compare covers the string surgery byte-for-byte
    (operators/contamination.py:scrub_cross_doc_spans)."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs, _bench = _decon_inputs(spark, sf_dir)
    return X.scrub_cross_doc_spans(docs, SCRUB_N)


def q_dup_gram_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATION SPECTRUM: cross-doc exact-duplication mass at gram
    lengths 12/24/48/96 — (n_dup_grams, n_dup_positions, n_docs_with_dup)
    per length, the curve that picks the substring-dedup n (Lee et al.
    2022 §4.1 pick 50 tokens from exactly this tradeoff). One linear
    gram-stats shuffle per point, single-row reduction before the driver
    (operators/contamination.py:dup_gram_spectrum)."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    return X.dup_gram_spectrum(docs, SPECTRUM_LENGTHS)


def q_scrub_ingest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST-TIME scrub: the arriving batch (%5 split) cut against the
    PERSISTED corpus gram index — the corpus is the senior keeper, new
    docs yield every char covered by an already-known 24-gram. Batch gram
    buckets prune the index read (partition filter); per-doc answers are
    batch-boundary-independent by construction
    (operators/contamination.scrub_against_gram_index). VALUE-checked:
    the scrubbed strings vs the DuckDB twin byte-for-byte."""
    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    new, _old = _neardup_split(spark, sf_dir)
    return X.scrub_against_gram_index(new, _scrub_index_path(spark, sf_dir))


def q_gram_index_append_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for incremental gram-df maintenance: index(old) +
    append(new) must equal the scratch rebuild over old ∪ new
    row-for-row — df is additive over disjoint doc sets, and the append
    rewrites ONLY the touched bucket directories (dynamic partition
    overwrite). Empty symmetric difference; empty-relation oracle
    (operators/contamination.append_gram_df_index)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    new, old = _neardup_split(spark, sf_dir)
    base = _tmpdir(prefix="hbi_gramappend_")
    X.write_gram_df_index(old, f"{base}/inc", DECON_N)
    X.append_gram_df_index(new, f"{base}/inc")
    X.write_gram_df_index(_docs(spark, sf_dir).select("doc_id", "text"),
                          f"{base}/full", DECON_N)
    a = spark.read.parquet(f"{base}/inc/df").select(
        F.col("bucket").cast("long").alias("bucket"), "gram",
        F.col("df").cast("long").alias("df"))
    b = spark.read.parquet(f"{base}/full/df").select(
        F.col("bucket").cast("long").alias("bucket"), "gram",
        F.col("df").cast("long").alias("df"))
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_gram_index_remove_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for the retention path: index(all) − remove(new) must
    equal the scratch rebuild over old — removal is the touched-buckets
    merge with NEGATED counts (df additive over disjoint doc sets),
    zero-df grams dropped, emptied bucket dirs dropped (dynamic
    overwrite alone leaves them stale), negative df refused. Empty
    symmetric difference; empty-relation oracle
    (operators/contamination.remove_gram_df_index)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    new, old = _neardup_split(spark, sf_dir)
    base = _tmpdir(prefix="hbi_gramremove_")
    X.write_gram_df_index(_docs(spark, sf_dir).select("doc_id", "text"),
                          f"{base}/all", DECON_N)
    X.remove_gram_df_index(new, f"{base}/all")
    X.write_gram_df_index(old, f"{base}/oldonly", DECON_N)
    a = spark.read.parquet(f"{base}/all/df").select(
        F.col("bucket").cast("long").alias("bucket"), "gram",
        F.col("df").cast("long").alias("df"))
    b = spark.read.parquet(f"{base}/oldonly/df").select(
        F.col("bucket").cast("long").alias("bucket"), "gram",
        F.col("df").cast("long").alias("df"))
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_gram_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for STREAMING gram-df maintenance: the batch drained as
    exactly-once delta commits (one per micro-batch, _SUCCESS probe =
    replay guard) must make the LIVE table (base + deltas) equal the
    scratch rebuild — and stay equal after compaction folds the deltas
    into the bucket layout. Both symmetric differences returned (empty
    oracle) (operators/contamination.gram_df_index_stream /
    compact_gram_df_index / _gram_df_table)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    new, old = _neardup_split(spark, sf_dir)
    base = _tmpdir(prefix="hbi_gramstream_")
    X.write_gram_df_index(old, f"{base}/inc", DECON_N)
    half = _doc_num("doc_id") % 2
    new.filter(half == 0).write.mode("overwrite").parquet(f"{base}/in")
    new.filter(half == 1).write.mode("append").parquet(f"{base}/in")
    stream = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(f"{base}/in")
    q = X.gram_df_index_stream(stream, f"{base}/inc", f"{base}/chk")
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("gram_stream_parity: availableNow drain exceeded 300s")
    X.write_gram_df_index(_docs(spark, sf_dir).select("doc_id", "text"),
                          f"{base}/full", DECON_N)
    n_buckets = spark.read.parquet(f"{base}/inc/meta").first()["n_buckets"]
    all_buckets = list(range(int(n_buckets)))
    want = spark.read.parquet(f"{base}/full/df").select(
        F.col("bucket").cast("long").alias("bucket"), "gram",
        F.col("df").cast("long").alias("df"))
    live = X._gram_df_table(spark, f"{base}/inc", all_buckets).select(
        "bucket", "gram", F.col("df").cast("long").alias("df"))
    # materialize BEFORE compaction rewrites the base files this plan reads
    pre = live.exceptAll(want).unionByName(want.exceptAll(live)).localCheckpoint()
    n_folded = X.compact_gram_df_index(spark, f"{base}/inc")
    if n_folded == 0:
        raise AssertionError("gram_stream_parity: no delta commits to fold")
    post_live = X._gram_df_table(spark, f"{base}/inc", all_buckets).select(
        "bucket", "gram", F.col("df").cast("long").alias("df"))
    post = post_live.exceptAll(want).unionByName(want.exceptAll(post_live))
    return pre.unionByName(post)


def q_scrub_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest scrub: the batch drained through a file stream in
    two appends, each micro-batch scrubbed against the static gram index
    via the shared replay-guarded foreachBatch append. Stateless per doc,
    so the drained output must equal the one-shot batch scrub — checked
    against the SAME DuckDB twin (value equality, not just parity)
    (operators/contamination.scrub_ingest_stream)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    new, _old = _neardup_split(spark, sf_dir)
    idx = _scrub_index_path(spark, sf_dir)
    work = _tmpdir(prefix="hbi_scrub_stream_")
    half = _doc_num("doc_id") % 2
    new.filter(half == 0).write.mode("overwrite").parquet(f"{work}/in")
    new.filter(half == 1).write.mode("append").parquet(f"{work}/in")
    stream = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(f"{work}/in")
    q = X.scrub_ingest_stream(stream, idx, f"{work}/out", f"{work}/chk")
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("scrub_ingest_stream: availableNow drain exceeded 300s")
    return spark.read.parquet(f"{work}/out").select("doc_id", "clean_text")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED BERNOULLI SAMPLE: keep a doc iff hash64(doc_id) falls
    under its source's acceptance threshold — a pure function of
    (doc_id, seed), so the sample is reproducible across runs, engines and
    cluster sizes, and VALUE-checked (not distribution-checked) against
    the HUGEINT SplitMix64 twin. Narrow plan: one Arrow hash pass + filter,
    zero shuffles (operators/sampling.stratified_sample)."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        stratified_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source")
    return stratified_sample(
        docs, "doc_id", "source", SAMPLE_FRACS, SAMPLE_DEFAULT_FRAC,
        SAMPLE_SEED)


def q_short_doc_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE QUALITY PRUNING: drop each source's shortest decile —
    rank by (length, doc_id) within source, cut floor(n/10) rows. The
    rational cutoff keeps the integer rank arithmetic bit-identical
    across engines; one window exchange, no collects
    (operators/sampling.drop_bottom_quantile)."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        drop_bottom_quantile,
    )

    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.length("text").cast("int").alias("n_chars"))
    return drop_bottom_quantile(docs, "n_chars", 1, 10, group_col="source")


def q_dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN/VAL/TEST SPLIT: the u64 hash space range-partitioned by
    cumulative fraction — every doc lands in exactly one split, and the
    assignment never moves when the dataset grows (the no-leakage property
    dataset versioning needs). Per-(source, split) counts
    (operators/sampling.split_column)."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        split_column,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source")
    return (
        split_column(docs, "doc_id", SPLIT_FRACS, SAMPLE_SEED)
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_docs_topn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-STRATUM TOP-N BY HASH: the n docs with the smallest
    hash64(doc_id) per source — a deterministic fixed-size per-group
    sample (bottom-k/KMV lifted to whole rows), ranked; value-equal to the
    SQL twin's ROW_NUMBER over the same HUGEINT hash
    (operators/sampling.hash_topn_per_stratum)."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        hash_topn_per_stratum,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source")
    return hash_topn_per_stratum(
        docs, "doc_id", "source", TOPN_PER_SOURCE, SAMPLE_SEED
    ).select("source", "doc_id", F.col("rank").cast("long").alias("rank"))


def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis-Spirakis A-Res):
    per source, the n docs with the smallest -ln(u)/w priority, weight =
    length(text) + 1 — inclusion probability proportional to doc length,
    the classic token-proportional mixture sample. Scores are BIT-EXACT
    across engines (53-bit-mantissa u, glibc ln on both sides — see
    operators/sampling._ares_score_udf), so this is a VALUE oracle over
    (source, doc_id, rank, score), not a distribution check."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        weighted_sample_topn,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", (F.length("text") + 1).cast("double").alias("w"))
    return weighted_sample_topn(
        docs, "doc_id", "w", TOPN_PER_SOURCE, SAMPLE_SEED + 7,
        strata_col="source",
    ).select("source", "doc_id", F.col("ws_rank").alias("rank"),
             F.col("ws_score").alias("score"))


def q_mixture_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-MIXTURE MANIFEST: per-source char budgets -> the deterministic
    hash-order prefix of docs per source (kept iff the weight BEFORE it is
    under budget; src2's 0 budget excludes it entirely). The per-stratum
    prefix sum is BUCKETED by the hash key's top bits, so the window
    exchange only ever moves ~budget worth of rows per stratum — never the
    corpus (operators/sampling.mixture_manifest). VALUE-checked against
    the HUGEINT SplitMix64 window twin."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        mixture_manifest,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars")
    return mixture_manifest(
        docs, "doc_id", "source", "n_chars", MIX_BUDGETS, SAMPLE_SEED,
        default_budget=MIX_DEFAULT_BUDGET,
    ).select(
        "doc_id", "source",
        F.col("n_chars").cast("long").alias("weight"), "cum_weight",
    )


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-WEIGHTED MIXTURE (the T5 / multilingual n^alpha
    discipline at alpha = 1/2): per-source budgets derived from corpus
    char totals via the EXACT integer square root (float sqrt corrected —
    pow alone flips near perfect squares), then the same bucketed
    greedy-prefix manifest as mixture_manifest_docs
    (operators/sampling.temperature_mixture_manifest). Budgets are pure
    integer functions of the totals, so the whole manifest is VALUE-checked
    against the SplitMix64 window twin with budgets recomputed in SQL."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        temperature_mixture_manifest,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars")
    return temperature_mixture_manifest(
        docs, "doc_id", "source", "n_chars", TEMP_BUDGET, SAMPLE_SEED,
        alpha=(1, 2),
    ).select(
        "doc_id", "source",
        F.col("n_chars").cast("long").alias("weight"), "cum_weight",
    )


def q_epoch_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH-SHUFFLED SHARD PACKING: epoch 1's deterministic permutation
    key (fixed-width hex of hash64(doc_id, epoch_seed) — lexicographic ==
    unsigned hash order) fed to token_budget_shards as order_col, so the
    shard build runs the SAME distributed prefix sum as doc_id-order
    shards (with_global_offsets range buckets — no global sort). Each
    epoch is an independent-looking shuffle of the corpus into ~8192-token
    shards; same epoch always the same manifest
    (operators/sampling.epoch_key_udf)."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        epoch_key_udf, token_budget_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").cast("long").alias("n_tok"))
    keyed = docs.withColumn(
        "epoch_key", epoch_key_udf(SAMPLE_SEED, EPOCH_NUM)(F.col("doc_id")))
    return (
        token_budget_shards(keyed, SHARD_BUDGET, order_col="epoch_key")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("doc_lo"),
            F.max("doc_id").alias("doc_hi"),
        )
    )


def q_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE PACKING: the ~8192-token training sequences themselves — per
    shard, the concatenated token stream + the doc boundary offsets a
    trainer resets attention across (operators/sampling.
    pack_training_sequences; manifest -> layout -> PACKING completes the
    shard story). Arrays are '|'-joined so the cross-engine value hash
    compares strings (the completions discipline)."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        pack_training_sequences,
    )

    packed = pack_training_sequences(_corpus(spark, sf_dir), SHARD_BUDGET)
    return packed.select(
        "shard_id",
        F.array_join("doc_ids", "|").alias("doc_ids"),
        F.array_join(F.transform("doc_starts", lambda x: x.cast("string")),
                     "|").alias("doc_starts"),
        "n_tokens",
        F.array_join(F.transform("tokens", lambda x: x.cast("string")),
                     "|").alias("token_stream"),
    )


def q_doc_top_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOPHER REPETITION FILTER #1: per doc, the most frequent word bigram
    and the char fraction its occurrences account for (ties gram ASC —
    winner is a pure function of the text; integer-div x1e6 score, exact
    both engines). The filter a 100 TB text pipeline runs before paying
    for tokenization (operators/repetition.top_ngram_stats)."""
    from hierarchical_bloom_filter_index_spark.operators.repetition import (
        top_ngram_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    return top_ngram_stats(docs, REP_TOP_N)


def q_doc_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOPHER REPETITION FILTER #2: per doc, the char positions covered by
    word trigrams occurring >= 2 times — the UNION of occurrence spans
    via the general variable-length gaps-and-islands merge
    (operators/repetition.dup_ngram_coverage; contamination_spans'
    fixed-length merge generalized). Docs with no duplicated trigram emit
    no row on both engines."""
    from hierarchical_bloom_filter_index_spark.operators.repetition import (
        dup_ngram_coverage,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    return dup_ngram_coverage(docs, REP_DUP_N)


def q_quality_report_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING quality monitoring: the corpus drained through a file
    stream in >= 2 micro-batches, each batch's per-source SUM components
    appended (replay-guarded), the final report re-summed + finalized —
    and value-checked against the SAME DuckDB dashboard twin as the batch
    query (component sums are associative over any batch split, and the
    one integer division happens only at read time)
    (operators/text.quality_report_stream)."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.text import (
        quality_report_stream, read_quality_report,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source")
    work = _tmpdir(prefix="hbi_quality_stream_")
    half = _doc_num(F.col("doc_id").cast("string")) % 2
    docs.filter(half == 0).write.mode("overwrite").parquet(f"{work}/in")
    docs.filter(half == 1).write.mode("append").parquet(f"{work}/in")
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1").parquet(f"{work}/in")
    q = quality_report_stream(
        stream, f"{work}/out", f"{work}/chk", rep_frac_x1e6=REP_FRAC_THRESH)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "quality_report_stream: availableNow drain exceeded 300s")
    return read_quality_report(spark, f"{work}/out")


def q_corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE QUALITY DASHBOARD: the composed corpus report — doc/char/
    word totals, mean stopword ratio, failed language guesses, repetitive
    docs (top-bigram char fraction >= 8%), docs with any duplicated
    trigram — one narrow metrics pass + two doc_id-keyed left joins + one
    groupBy(source) (operators/text.corpus_quality_report)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source")
    return T.corpus_quality_report(docs, rep_frac_x1e6=REP_FRAC_THRESH)


def q_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows=8 per band: candidate probability ~ j^8 per band — keeps the
    # candidate set near-dup-sized even on this highly self-similar corpus
    return D.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.8, n_perm=128, bands=16)


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_bucket: never engages on the benign fixture corpora; at scale a
    # degenerate (chunk, value) bucket is dropped WITH a warning instead of
    # exploding one shuffle key quadratically
    return D.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3, max_bucket=10_000)


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS-LAW CURVE: distinct token types within the first n stream
    tokens per ladder point — exact first-occurrence positions through the
    deterministic global-offset pass, one min-per-type shuffle, broadcast
    ladder join (operators/text.vocabulary_growth)."""
    return T.vocabulary_growth(_corpus(spark, sf_dir), list(VG_NS))


def q_freq_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FREQUENCY-COVERAGE CURVE: exact corpus token mass carried by the k
    most frequent types ((cnt DESC, tok ASC) tie-break makes every ladder
    boundary deterministic) — the tokenizer-vocab sizing readout
    (operators/text.frequency_coverage)."""
    return T.frequency_coverage(_corpus(spark, sf_dir), list(FC_KS))


def q_lexical_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted-cosine pairs (cos >= 4/5) over word-count vectors on
    the doc_id % 5 sub-corpus — the magnitude-aware dedup twin; decided by
    the squared integer inequality in DECIMAL(38,0) (no float sqrt, no
    tolerance), uncapped here so the pair surface is exact. Out of BENCH
    (tiny-vocab corpus = blocking's worst case); it IS in the replica
    scaling sweep, where per-replica Caesar vocabularies are disjoint and
    pair growth is linear — on natural shared-vocab corpora max_word_df
    is the scale path (operators/dedup.lexical_cosine_pairs)."""
    docs = _docs(spark, sf_dir).filter(_doc_num("doc_id") % LEXCOS_MOD == 0)
    return D.lexical_cosine_pairs(docs, threshold=LEXCOS_T, max_word_df=None)


def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-checked SimHash surface: all pairs with signature Hamming
    distance <= SIMHASH_D on the _CONTAINMENT_DOMAIN sub-corpus (where the
    byte- and char-shingle definitions coincide). UNCAPPED, so the
    pigeonhole chunk banding is exact — any pair within distance d agrees
    on >= 1 of the d+1 chunks, and the bit_count filter decides; the DuckDB
    twin recomputes every signature from scratch (packed shingles ->
    splitmix64 -> seeded hash64, bit-exact) and brute-forces all pairs
    (operators/dedup.py:simhash_near_pairs; the shipped capped/
    domain-unrestricted path stays covered by simhash_neardup)."""
    docs = _docs(spark, sf_dir).filter(_CONTAINMENT_DOMAIN)
    return D.simhash_near_pairs(
        docs, max_hamming=SIMHASH_D, shingle_n=SIMHASH_N, seed=SIMHASH_SEED,
        max_bucket=None)


def q_incremental_neardup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for incremental dedup: near-dup pairs of a new ingestion
    batch vs the PERSISTED corpus MinHash index (corpus never re-shingled)
    must equal the full-corpus LSH run's batch-crossing pairs — same band
    buckets (shared band_buckets definition), same exact-Jaccard verify,
    so the result is the symmetric difference and the oracle the empty
    relation (operators/dedup.py: write_minhash_index /
    neardup_against_index)."""
    import tempfile

    new, old = _neardup_split(spark, sf_dir)
    path = _tmpdir(prefix="hbi_mh_idx_") + "/mh"
    D.write_minhash_index(old, path, n_perm=128, bands=16)
    inc = D.neardup_against_index(new, old, path, threshold=0.8)
    full = D.minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.8, n_perm=128, bands=16)
    a_new = _doc_num("doc_a") % 5 == 0
    b_new = _doc_num("doc_b") % 5 == 0
    crossing = full.filter(a_new != b_new).select(
        F.when(a_new, F.col("doc_a")).otherwise(F.col("doc_b")).alias("new_id"),
        F.when(a_new, F.col("doc_b")).otherwise(F.col("doc_a")).alias("corpus_id"),
        "jaccard",
    )
    return inc.exceptAll(crossing).unionByName(crossing.exceptAll(inc))


def q_incremental_neardup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingestion dedup: arriving doc batches drained through a
    file stream, each micro-batch near-dup-checked against the persisted
    corpus index via foreachBatch (replay-guarded append sink). The final
    pair table must equal the one-shot batch check — symmetric difference,
    empty oracle. Batch boundaries cannot change the answer: each new
    doc's pairs depend only on itself + the static corpus
    (operators/dedup.incremental_neardup_stream)."""
    import tempfile

    new, old = _neardup_split(spark, sf_dir)
    work = _tmpdir(prefix="hbi_mh_stream_")
    path = f"{work}/mh"
    D.write_minhash_index(old, path, n_perm=128, bands=16)
    half = _doc_num("doc_id") % 2
    new.filter(half == 0).write.mode("overwrite").parquet(f"{work}/in")
    new.filter(half == 1).write.mode("append").parquet(f"{work}/in")
    stream = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(f"{work}/in")
    q = D.incremental_neardup_stream(
        stream, old, path, f"{work}/out", f"{work}/chk", threshold=0.8)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "incremental_neardup_stream: availableNow drain exceeded 300s")
    try:
        got = spark.read.parquet(f"{work}/out").drop("batch_id")
    except Exception:  # zero pairs -> nothing was ever appended
        got = spark.createDataFrame(
            [], "new_id string, corpus_id string, jaccard double")
    want = D.neardup_against_index(new, old, path, threshold=0.8)
    return got.exceptAll(want).unionByName(want.exceptAll(got))


def q_novelty_against_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL novelty: the ingestion batch (%5 split) scored against
    the PERSISTED gram-df index of the rest of the corpus — the linear
    df shuffle paid once at index time; the batch read prunes to the
    buckets its grams hash into (partition filter), absent gram = novel.
    Per-doc scores are independent of batch boundaries by construction
    (novel = absent from the CORPUS, not from peers)
    (operators/contamination.write_gram_df_index / novelty_against_index).
    VALUE-checked against the DuckDB left-join twin."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    new, old = _neardup_split(spark, sf_dir)
    path = _tmpdir(prefix="hbi_gramdf_") + "/idx"
    X.write_gram_df_index(old, path, DECON_N)
    return X.novelty_against_index(new, path)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(10).collect()]
    return S.cosine_topk(emb, qids, k=5)


def q_ann_cosine_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED exact ANN: each query's top-5 among label=1 vectors only —
    the metadata predicate pushes down to the corpus scan
    (brute-force-over-subset, the exact baseline filtered-ANN systems
    re-rank against); query vectors resolve from the UNRESTRICTED table
    via query_source, so a query need not satisfy the filter itself
    (operators/similarity.cosine_topk)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(10).collect()]
    return S.cosine_topk(
        emb.filter(F.col("label") == ANN_FILTER_LABEL), qids, k=5,
        query_source=emb)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(10).collect()]
    return S.ivf_topk(emb, qids, k=5, n_centroids=16, nprobe=6)


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k at realistic settings (16-byte codes per 64-dim
    vector, 6/16 lists probed, exact re-rank of the top-24 ADC
    candidates). Approximate by design -> rows-only check; the plumbing
    is pinned exactly by ivfpq_exhaustive_parity and the suite's
    recall/ADC-identity contracts (similarity.ivfpq_topk)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(10).collect()]
    return S.ivfpq_topk(emb, qids, k=5, n_centroids=16, nprobe=6,
                        m_subspaces=16, n_codes=32, rerank=24)


def q_ivfpq_exhaustive_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for the PQ plumbing: with every list probed and a
    full-corpus re-rank pool, IVF-PQ degrades to exact brute force — the
    result must equal cosine_topk row-for-row (coarse assign, residual
    encode, ADC candidate scan, pool window, exact re-rank all on the
    line). Symmetric difference, empty-relation oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    qids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(6).collect()]
    a = S.ivfpq_topk(emb, qids, k=5, n_centroids=8, nprobe=8, rerank=n)
    b = S.cosine_topk(emb, qids, k=5)
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_ivfpq_persisted_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for the persisted IVF-PQ layout: the list_id-partitioned
    codes-on-disk path (centroids + codebooks + meta pinned at write) must
    answer top-k ROW-IDENTICALLY to the in-memory ivfpq_topk at the same
    geometry (deterministic training -> same codes -> same ADC pool ->
    same exact re-rank). Symmetric difference, empty-relation oracle."""
    import tempfile

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    qids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(6).collect()]
    path = _tmpdir(prefix="hbi_pq_") + "/pq"
    S.write_ivfpq_index(emb, path, n_centroids=8, m_subspaces=16,
                        n_codes=32)
    mem = S.ivfpq_topk(emb, qids, k=5, n_centroids=8, nprobe=3, rerank=24,
                       m_subspaces=16, n_codes=32)
    per = S.ivfpq_topk_persisted(spark, path, emb, qids, k=5, nprobe=3,
                                 rerank=24)
    return mem.exceptAll(per).unionByName(per.exceptAll(mem))


def q_ivf_persisted_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistence parity as a HARD oracle gate: the list_id-partitioned
    on-disk IVF index (similarity.write_ivf_index — partition-pruned reads)
    must answer top-k ROW-IDENTICALLY to the in-memory ivf_topk (same
    quantizer -> same inverted lists -> same candidates -> same float64
    re-rank). Returns the symmetric difference of the two result sets —
    expected EMPTY; the DuckDB twin is the empty relation, so any drift in
    the write/read/prune path fails rows+hash."""
    import numpy as np
    import tempfile

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = _tmpdir(prefix="hbi_ivf_idx_")
    S.write_ivf_index(emb, path, n_centroids=16)
    qrows = emb.orderBy("vec_id").limit(10).collect()
    queries = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
               for r in qrows}
    persisted = S.ivf_topk_persisted(spark, path, queries, k=5, nprobe=6)
    mem = S.ivf_topk(emb, list(queries), k=5, n_centroids=16, nprobe=6)
    return persisted.exceptAll(mem).unionByName(mem.exceptAll(persisted))


def q_doc_index_takedown_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for per-doc takedown from the persisted doc-axis Bloom
    index (retention / right-to-be-forgotten): write the index in the
    doc-SHARDED layout (sources/io.write_index_doc_sharded), remove a doc
    set (only their shard directories are rewritten — dynamic partition
    overwrite), and the surviving table must equal the index minus the
    removed docs' rows BYTE-FOR-BYTE (doc-axis rows are per-doc pure, so
    this is also scratch-build parity on the remaining corpus). Empty
    symmetric difference; empty-relation oracle."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.sources import io as IO

    idx = _index(spark, sf_dir)
    path = _tmpdir(prefix="hbi_takedown_") + "/idx"
    IO.write_index_doc_sharded(idx, path)
    removed = _takedown_ids(spark, sf_dir)
    IO.takedown_doc_index(spark, path, removed)

    def key(d: DataFrame) -> DataFrame:
        return d.select(
            "doc_id", "level", "w_id",
            F.xxhash64("bloom").alias("bloom_h"), "n_items", "bits_set")

    a = key(IO.read_index_doc_sharded(spark, path))
    b = key(idx.filter(~F.col("doc_id").isin(removed)))
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_minhash_takedown_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for per-doc takedown from the persisted MinHash index:
    index(all) − takedown(R) must equal rebuild(all − R) row-for-row —
    signatures are a pure per-doc function of text, and the removal
    rewrites only the shard directories R hashes into
    (operators/dedup.takedown_minhash_index). Empty symmetric difference;
    empty-relation oracle."""
    import tempfile

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    path = _tmpdir(prefix="hbi_mh_takedown_") + "/mh"
    D.write_minhash_index(docs, path, n_perm=64, bands=16)
    removed = _takedown_ids(spark, sf_dir)
    D.takedown_minhash_index(spark, path, removed)

    def key(d: DataFrame) -> DataFrame:
        return d.select(
            "doc_id",
            F.concat_ws(",", F.transform("sig", lambda x: x.cast("string")))
            .alias("sig_key"))

    back, meta = D.read_minhash_index(spark, path)
    rebuilt = D.minhash_signatures(
        docs.filter(~F.col("doc_id").isin(removed)),
        meta["n_perm"], meta["shingle_n"], meta["seed"])
    a, b = key(back), key(rebuilt)
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_ivf_takedown_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for per-vector takedown from the persisted IVF index:
    takedown(R) rewrites only the inverted-list directories holding a
    removed vector; the surviving lists must equal the full lists minus
    R's rows exactly (centroids untouched — the quantizer is a model, not
    per-row state; IVF training is deterministic, so a second write is the
    byte-reference). Empty symmetric difference; empty-relation oracle."""
    import tempfile

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = _tmpdir(prefix="hbi_ivf_takedown_")
    S.write_ivf_index(emb, f"{base}/a", n_centroids=8)
    S.write_ivf_index(emb, f"{base}/b", n_centroids=8)
    removed = [r["vec_id"] for r in emb.filter(F.col("vec_id") % 11 == 5)
               .orderBy("vec_id").limit(10).collect()]
    S.takedown_ivf_index(spark, f"{base}/a", removed)

    def key(d: DataFrame) -> DataFrame:
        return d.select(
            "vec_id", F.col("list_id").cast("long").alias("list_id"),
            F.concat_ws(",", F.transform(
                "embedding", lambda x: F.round(x, 5).cast("string")))
            .alias("vec_key"))

    a = key(spark.read.parquet(f"{base}/a/lists"))
    b = key(spark.read.parquet(f"{base}/b/lists")
            .filter(~F.col("vec_id").isin(removed)))
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.embedding_neardup_pairs(
        emb, threshold=0.8, n_planes=4, n_tables=16, max_bucket=10_000
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(10).collect()]
    return S.lsh_topk(emb, qids, k=5, n_planes=4, n_tables=16)


def q_semantic_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (cluster-then-exact-cosine semantic dedup, Abbas et al.
    2023) run at n_centroids=1 — a SINGLE cluster makes the operator
    provably exhaustive, so the pair set is exact all-pairs cosine >=
    threshold and the DuckDB brute-force twin VALUE-checks the whole
    surface (ids and rounded cosines). The realistic clustered path is
    gated by q_semantic_dedup_containment."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.semantic_dedup_pairs(emb, threshold=SEMDEDUP_T, n_centroids=1)


def q_semantic_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-as-equality hard check for the CLUSTERED SemDeDup path
    (the minhash_lsh_containment discipline): clustered pairs UNION (exact
    pairs the clustering missed) must EQUAL the exact pair set — any false
    positive (a reported pair below threshold, or an invented id) appears
    as an extra row the oracle doesn't have. Recall is the part clustering
    legitimately trades away and stays a pytest bound
    (tests/test_semantic_dedup.py)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clustered = S.semantic_dedup_pairs(
        emb, threshold=SEMDEDUP_T, n_centroids=8).select("id_a", "id_b")
    exact = S.semantic_dedup_pairs(
        emb, threshold=SEMDEDUP_T, n_centroids=1).select("id_a", "id_b")
    missed = exact.join(clustered, ["id_a", "id_b"], "left_anti")
    return clustered.unionByName(missed)


def q_semantic_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding table AFTER semantic dedup — connected components over
    the exact semantic pair graph (edge-only star contraction), keep each
    component's minimum vec_id plus every unpaired row. Run at
    n_centroids=1 so the pair graph is the oracle-checked exact set; the
    DuckDB twin recomputes components via recursive transitive closure."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return S.semantic_dedup_keep(emb, threshold=SEMDEDUP_T, n_centroids=1)


def q_semantic_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SemDeDup: the ingestion batch (%7 split) checked against
    the PERSISTED IVF index of the rest of the corpus — corpus vectors are
    never re-scanned wholesale; the batch side broadcasts and only the
    probed inverted lists' files are read. With the index trained at
    n_centroids=1 the probe is exhaustive, so the pair set is exact
    batch x corpus cosine >= threshold and the DuckDB cross-join twin
    VALUE-checks ids and rounded cosines
    (operators/similarity.semantic_neardup_against_index)."""
    new, _old = _semantic_split(spark, sf_dir)
    return S.semantic_neardup_against_index(
        spark, new, _semantic_index(spark, sf_dir),
        threshold=SEMDEDUP_INC_T, nprobe=1,
    )


def q_semantic_incremental_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingestion semantic dedup: arriving embedding batches
    drained through a file stream, each micro-batch checked against the
    persisted IVF index via foreachBatch (shared replay-guarded append
    sink). The final pair table must equal the one-shot batch check —
    symmetric difference, empty oracle. Batch boundaries cannot change the
    answer: each new vector's pairs depend only on itself + the static
    index (operators/similarity.incremental_semantic_stream)."""
    import tempfile

    new, _old = _semantic_split(spark, sf_dir)
    path = _semantic_index(spark, sf_dir)
    work = _tmpdir(prefix="hbi_sem_stream_")
    half = F.col("vec_id") % 2
    new.filter(half == 0).write.mode("overwrite").parquet(f"{work}/in")
    new.filter(half == 1).write.mode("append").parquet(f"{work}/in")
    stream = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(f"{work}/in")
    q = S.incremental_semantic_stream(
        stream, path, f"{work}/out", f"{work}/chk",
        threshold=SEMDEDUP_INC_T, nprobe=1)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "semantic_incremental_stream: availableNow drain exceeded 300s")
    try:
        got = spark.read.parquet(f"{work}/out").drop("batch_id")
    except Exception:  # zero pairs -> nothing was ever appended
        got = spark.createDataFrame(
            [], "new_id long, corpus_id long, cosine double")
    want = S.semantic_neardup_against_index(
        spark, new, path, threshold=SEMDEDUP_INC_T, nprobe=1)
    return got.exceptAll(want).unionByName(want.exceptAll(got))


def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded fingerprint SET — fully oracle-checked (the polynomial
    k-gram hash + sliding-min selection is engine-agnostic integer math)."""
    fps = T.winnowing_fingerprints(_docs(spark, sf_dir), k=8, window=4)
    return fps.select("doc_id", F.explode("fps").alias("fp"))


def q_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-ENTROPY QUALITY FILTER (exact-integer form): per doc, the
    char-histogram diversity metrics — distinct chars, top char count, and
    collision_x1e9 = floor(sum cnt^2 * 1e9 / n^2), the collision probability
    (monotone inverse of Renyi-2 entropy). 'Low entropy' filters become
    integer comparisons, so the DuckDB twin is an equality with NO float
    tolerance and no libm ln() divergence (operators/text.
    char_diversity_stats; zero shuffles — the histogram is doc-local)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    return T.char_diversity_stats(docs)


def q_low_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source gibberish dashboard over the char-diversity metrics: doc
    count, flagged count (collision above threshold OR tiny alphabet), max
    collision and min distinct chars — the corpus-health rollup a pipeline
    gates ingestion on (operators/text.low_diversity_report)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source")
    return T.low_diversity_report(
        docs, CHAR_COLLISION_THRESH, CHAR_MIN_DISTINCT)


def q_token_counts_takedown_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAKEDOWN parity for the drift count table: the corpus drained
    through the count stream, then every doc_id % 3 == 0 document
    removed by LINEAR SUBTRACTION (negative delta, batch_id=-removal_id,
    idempotent under replay — re-run in-query); the readout must equal
    the batch counts of the SURVIVING docs exactly
    (operators/drift.remove_token_counts). Empty-symdiff oracle."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.functions import (
        codepoint_tokens,
    )

    docs = _docs(spark, sf_dir)
    base = _tmpdir(prefix="hbi_drift_takedown_")
    docs.coalesce(2).write.mode("overwrite").parquet(f"{base}/in")
    q = DR.token_counts_stream(
        spark, f"{base}/in", f"{base}/chk", f"{base}/out")
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "token_counts_takedown_parity: availableNow drain exceeded 300s")
    gone = docs.where(_doc_num("doc_id") % 3 == 0)
    DR.remove_token_counts(f"{base}/out", gone, removal_id=1)
    DR.remove_token_counts(f"{base}/out", gone, removal_id=1)  # replay no-op
    keep = docs.where(_doc_num("doc_id") % 3 != 0)
    want = DR.group_token_counts(
        keep.select(codepoint_tokens("text").alias("tokens"), "source"))
    got = DR.read_group_token_counts(spark, f"{base}/out")
    return got.exceptAll(want).unionByName(want.exceptAll(got))


def q_cdc_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED CHUNKING (operators/cdc.cdc_chunks): edit-stable
    chunk boundaries from a rolling FNV-polynomial + SplitMix64 cut
    rule, one Arrow scan, zero shuffles.  VALUE-checked: the DuckDB twin
    re-derives every boundary through the bit-exact HUGEINT SplitMix64
    chain, so spans AND chunk payloads must match char-for-char.
    Replica-safe deterministic sub-corpus (length(text) % 17 == 0)."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import cdc_chunks

    docs = _docs(spark, sf_dir).filter(F.length("text") % 17 == 0)
    ch = cdc_chunks(docs, window=CDC_W, mask_bits=CDC_BITS, seed=CDC_SEED)
    return ch.select(
        "doc_id", "chunk_idx", "char_start",
        F.length("chunk").alias("chunk_len"), "chunk")


def q_cdc_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-STORE DEDUP ACCOUNTING (operators/cdc.cdc_dedup_stats):
    per-source total vs distinct chunk bytes over the CDC chunking of
    the whole corpus — the storage-side dedup ratio document-level
    fingerprints can't see.  All outputs exact integers (oracle = the
    same chunk CTE grouped two ways)."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        cdc_chunks, cdc_dedup_stats)

    ch = cdc_chunks(_docs(spark, sf_dir), window=CDC_W, mask_bits=CDC_BITS,
                    seed=CDC_SEED)
    return cdc_dedup_stats(ch)


def q_cdc_shared_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-LEVEL NEAR-DUP CANDIDATES (operators/cdc.cdc_shared_chunk_
    pairs): doc pairs sharing >= 2 distinct chunk contents, joined on
    xxhash64(chunk) 8-byte keys with exact in-bucket verification.
    Oracle = distinct (doc, chunk) self-join on the replayed chunk
    table."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        cdc_chunks, cdc_shared_chunk_pairs)

    ch = cdc_chunks(_docs(spark, sf_dir), window=CDC_W, mask_bits=CDC_BITS,
                    seed=CDC_SEED)
    return cdc_shared_chunk_pairs(ch, min_shared=2)


def q_chunk_store_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED CHUNK STORE (operators/cdc.write_chunk_store): the
    corpus's chunk reference counts written parquet partitioned by
    pmod(xxhash64(chunk), 64), then the per-source dedup accounting read
    back FROM THE STORE.  Oracle = the scratch cdc_dedup_stats SQL — a
    hard value gate that the persisted representation loses nothing.
    The store is NON-mutated here, so it rides _CACHE per sf_dir —
    bench reps must not rebuild (and re-persist) it every call."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        chunk_store_stats, write_chunk_store)

    key = ("chunkstore", sf_dir)
    if key not in _CACHE:
        base = _tmpdir(prefix="hbi_chunkstore_")
        write_chunk_store(_docs(spark, sf_dir), f"{base}/cs", window=CDC_W,
                          mask_bits=CDC_BITS, seed=CDC_SEED)
        _CACHE[key] = f"{base}/cs"
    return chunk_store_stats(spark, _CACHE[key])


def q_chunk_store_append_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD GATE for incremental chunk-store maintenance: store(old) +
    append(new) must equal the scratch store over old ∪ new row-for-row
    — chunk ref-counts are additive over disjoint doc sets and the
    append rewrites only the touched bucket dirs (dynamic partition
    overwrite).  Empty symmetric difference; empty-relation oracle."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        append_chunk_store, read_chunk_store, write_chunk_store)

    new, old = _chunk_split(spark, sf_dir)
    base = _tmpdir(prefix="hbi_chunkappend_")
    write_chunk_store(old, f"{base}/inc", window=CDC_W, mask_bits=CDC_BITS,
                      seed=CDC_SEED)
    append_chunk_store(new, f"{base}/inc")
    write_chunk_store(_docs(spark, sf_dir), f"{base}/full", window=CDC_W,
                      mask_bits=CDC_BITS, seed=CDC_SEED)
    a = read_chunk_store(spark, f"{base}/inc")
    b = read_chunk_store(spark, f"{base}/full")
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_chunk_store_remove_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION twin: store(all) − remove(new) must equal the scratch
    store over old — the touched-buckets merge with negated counts,
    zero-ref chunks dropped, emptied bucket dirs deleted, negative refs
    refused.  Empty symmetric difference; empty-relation oracle."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        read_chunk_store, remove_chunk_store, write_chunk_store)

    new, old = _chunk_split(spark, sf_dir)
    base = _tmpdir(prefix="hbi_chunkremove_")
    write_chunk_store(_docs(spark, sf_dir), f"{base}/all", window=CDC_W,
                      mask_bits=CDC_BITS, seed=CDC_SEED)
    remove_chunk_store(new, f"{base}/all")
    write_chunk_store(old, f"{base}/oldonly", window=CDC_W,
                      mask_bits=CDC_BITS, seed=CDC_SEED)
    a = read_chunk_store(spark, f"{base}/all")
    b = read_chunk_store(spark, f"{base}/oldonly")
    return a.exceptAll(b).unionByName(b.exceptAll(a))


def q_chunk_store_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING chunk-store ingest gate: base store on the old half, the
    new half arrives as a file stream (exactly-once delta commits via
    the batch_id _SUCCESS probe), then the LIVE table (base + deltas)
    must equal the scratch store over the full corpus — and stay equal
    after compaction folds the deltas into the bucket layout.  Empty
    symmetric difference; empty-relation oracle.  OUT of bench.py: the
    timing is a stream drain, not a query."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        chunk_store_ingest_stream, chunk_store_table, compact_chunk_store,
        read_chunk_store, write_chunk_store)

    new, old = _chunk_split(spark, sf_dir)
    base = _tmpdir(prefix="hbi_chunkstream_")
    write_chunk_store(old, f"{base}/inc", window=CDC_W, mask_bits=CDC_BITS,
                      seed=CDC_SEED)
    new.coalesce(2).write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(new.schema).parquet(f"{base}/in")
    q = chunk_store_ingest_stream(stream, f"{base}/inc", f"{base}/chk")
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "chunk_store_stream_parity: availableNow drain exceeded 300s")
    write_chunk_store(_docs(spark, sf_dir), f"{base}/full", window=CDC_W,
                      mask_bits=CDC_BITS, seed=CDC_SEED)
    live = chunk_store_table(spark, f"{base}/inc")
    full = read_chunk_store(spark, f"{base}/full")
    pre = live.exceptAll(full).unionByName(full.exceptAll(live))
    # materialize BEFORE compaction: the lazy symdiff plan re-reads delta
    # files compaction deletes (the standing compaction trap)
    pre = pre.localCheckpoint()
    compact_chunk_store(spark, f"{base}/inc")
    post_live = read_chunk_store(spark, f"{base}/inc")
    post = post_live.exceptAll(full).unionByName(full.exceptAll(post_live))
    return pre.unionByName(post)


def q_chunk_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-LEVEL NOVELTY vs the PERSISTED store (operators/cdc.chunk_
    novelty_against_store): store built on the old corpus half, the new
    half scored per-doc — distinct chunks, chunks already in the store,
    known chars.  The store read prunes to the batch's chunk buckets
    (partition filter).  VALUE oracle: the same split replayed in SQL
    (trailing-digit doc selector, the replica-safe discipline).  The
    old-half store is NON-mutated — cached per sf_dir like the corpus."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        chunk_novelty_against_store, write_chunk_store)

    new, old = _chunk_split(spark, sf_dir)
    key = ("chunkstore_old", sf_dir)
    if key not in _CACHE:
        base = _tmpdir(prefix="hbi_chunknov_")
        write_chunk_store(old, f"{base}/cs", window=CDC_W,
                          mask_bits=CDC_BITS, seed=CDC_SEED)
        _CACHE[key] = f"{base}/cs"
    return chunk_novelty_against_store(new, _CACHE[key])


def q_curation_pipeline_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END CURATION PIPELINE GATE: exact dedup (min-doc_id keeper
    per distinct text) -> quality filter (150 <= chars <= 400) ->
    token-budget shard packing (the with_global_offsets prefix sum, no
    global sort) -> per-shard manifest (shard_id, n_docs, n_tokens).
    Every stage deterministic, so the whole CHAIN is one SQL equality —
    the 'a user can run their pipeline here' gate, not a single-op one."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        token_budget_shards)

    docs = _docs(spark, sf_dir)
    keep = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    corpus = _corpus(spark, sf_dir).drop("doc_offset")
    filt = (corpus.join(keep.select("doc_id"), "doc_id")
            .filter(F.col("n_tok").between(150, 400)))
    sh = token_budget_shards(filt, 5000)
    return (sh.groupBy("shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens")))


def q_cdc_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide chunk-store accounting (operators/cdc.cdc_global_dedup)
    — what a SHARED (cross-source) chunk store would hold; the dedup win
    over the per-source stats is the cross-source chunk reuse."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        cdc_chunks, cdc_global_dedup)

    ch = cdc_chunks(_docs(spark, sf_dir), window=CDC_W, mask_bits=CDC_BITS,
                    seed=CDC_SEED)
    return cdc_global_dedup(ch)


def q_cdc_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANKED CHUNK-LEVEL NEAR-DUP RETRIEVAL (operators/cdc.cdc_topk_
    similar_pairs): top-20 doc pairs by chunk-set Jaccard —
    jaccard_x1e9 integer-exact, (jaccard DESC, doc_a, doc_b) pins the
    k-th boundary so the SET is deterministic.  TakeOrdered, no global
    sort."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        cdc_chunks, cdc_topk_similar_pairs)

    ch = cdc_chunks(_docs(spark, sf_dir), window=CDC_W, mask_bits=CDC_BITS,
                    seed=CDC_SEED)
    return cdc_topk_similar_pairs(ch, k=20)


def q_cdc_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIR-GRAPH STRUCTURE (operators/graph.graph_stats): nodes, edges,
    EXACT TRIANGLES (degree-ordered orientation — each triangle found
    once at its lowest-ranked vertex, out-degrees O(sqrt(m)) so the
    wedge self-join survives power-law hubs), max degree and wedge count
    over the CDC shared-chunk near-dup graph.  Oracle = plain 3-way
    self-join on the replayed pair table (a < b < c canonical)."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        cdc_chunks, cdc_shared_chunk_pairs)
    from hierarchical_bloom_filter_index_spark.operators.graph import graph_stats

    ch = cdc_chunks(_docs(spark, sf_dir), window=CDC_W, mask_bits=CDC_BITS,
                    seed=CDC_SEED)
    return graph_stats(cdc_shared_chunk_pairs(ch, min_shared=2))


__all__ = [k for k in list(globals()) if not k.startswith('__')]
