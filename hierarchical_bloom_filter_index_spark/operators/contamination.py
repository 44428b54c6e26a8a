"""Benchmark decontamination: cross-corpus exact n-gram overlap.

The training-data-pipeline op the reference's report() query answers one
pattern at a time (PMIndex/HBI.java:205 — "which windows hold this
sequence?"), asked at corpus scale: which corpus documents share ANY
exact n-character gram with a document of a benchmark/evaluation set, and
how many distinct grams do they share? Contaminated docs are then dropped
(or the pair table audited) before training.

Two implementations of the same answer:

* ``contamination_pairs`` — the 100 TB scale path. Benchmark suites are
  tiny next to a training corpus (MBs vs TBs), so the bench side's
  distinct grams BROADCAST; the corpus side explodes each doc's distinct
  grams map-side and hits the broadcast hash join without shuffling text.
  The only shuffle carries (doc_id, bench_id) pairs — the output, which
  is small by construction (it's the contamination report).
* ``contamination_pairs_indexed`` — the index-reuse path: every distinct
  bench gram is a pattern of ``n`` codepoint tokens, so the whole gram
  dictionary rides ONE shared Bloom cascade (operators/batch.py
  pattern_search_batch) and only cascade-surviving docs are ever scanned.
  Worth it when the corpus is already indexed and the gram dictionary is
  small; row-identical to the broadcast path (tested).

Both count DISTINCT shared grams per (corpus doc, bench doc) pair and
exclude self-pairs, so a benchmark doc that is itself part of the corpus
does not flag itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def char_ngram_column(text_col: str, n: int) -> Column:
    """Distinct n-character grams of ``text_col`` as array<string> — empty
    (never a descending phantom sequence) when the doc is shorter than n.
    Tokens here are UTF codepoints, so an n-token gram IS an n-char
    substring: the gram never needs the tokenized form at all and stays
    inside whole-stage codegen (sequence + transform + substring)."""
    if n < 1:
        raise ValueError("char_ngram_column: n must be >= 1")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(text_col) - F.lit(n - 1)),
        lambda i: F.substring(F.col(text_col), i, F.lit(n)),
    )
    return F.when(F.length(text_col) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _gram_rows(df: DataFrame, n: int, text_col: str, id_col: str,
               out_id: str) -> DataFrame:
    """(out_id, gram) rows — each doc's per-doc-DISTINCT n-grams exploded.
    THE one definition of a gram stream for every op in this module: a
    change to gram semantics lands everywhere or nowhere."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(char_ngram_column(text_col, n)).alias("gram"),
    )


def positioned_gram_rows(df: DataFrame, n: int, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(doc_id, start, gram) rows — every gram occurrence WITH its 0-based
    char offset (NOT deduped: coverage needs all positions). The length
    filter plays char_ngram_column's short-doc guard; the gram expression
    is the same sequence+substring body."""
    grams = F.transform(
        F.sequence(F.lit(1), F.length(text_col) - F.lit(n - 1)),
        lambda i: F.substring(F.col(text_col), i, F.lit(n)),
    )
    return df.filter(F.length(text_col) >= n).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(grams).alias("start", "gram"),
    )


def contamination_pairs(
    docs: DataFrame,
    bench: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """(doc_id, bench_id, n_shared): every corpus doc sharing >= 1 exact
    n-char gram with a benchmark doc; ``n_shared`` = number of DISTINCT
    shared grams. ``bench`` needs (bench_id_col, text_col); self-pairs
    (same id on both sides) are excluded.

    Plan shape: bench grams broadcast (benchmark suites are small by
    contract — raise n or pre-hash if yours is not); corpus grams are
    per-doc-distinct BEFORE the explode (array_distinct, no dedup
    shuffle), so the single groupBy counts distinct shared grams exactly
    with map-side partials over (doc_id, bench_id) keys only."""
    bg = _gram_rows(bench, n, text_col, bench_id_col, "bench_id")
    cg = _gram_rows(docs, n, text_col, id_col, "doc_id")
    return (
        cg.join(F.broadcast(bg), "gram")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def novelty_scores(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc n-gram NOVELTY: (doc_id, n_grams, n_unique, novelty_x1e6)
    where n_grams is the doc's distinct n-char gram count, n_unique how
    many of those appear in NO other document, and novelty_x1e6 their
    integer-scaled ratio. A low score marks boilerplate/copy-paste text
    (its grams are everywhere else) — the standard dedup-adjacent quality
    gate ranked BETWEEN exact dedup (identical docs) and MinHash (high
    overall similarity): it catches docs assembled from common fragments
    that neither of those flags. Docs shorter than n emit no row.

    Exact and linear: one groupBy over (gram -> distinct-doc count) with
    map-side partials, the df table joined back to the per-doc gram stream
    (same key, Catalyst reuses the exchange), one per-doc count. The join
    key is the gram string for oracle bit-exactness; at petabyte scale
    key it by xxhash64(gram) to put 8 bytes on the wire (the verify-
    in-bucket discipline of dedup_exact_pairs applies)."""
    cg = _gram_rows(docs, n, text_col, id_col, "doc_id")
    df_tab = cg.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    return (
        cg.join(df_tab, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
        .select(
            "doc_id", "n_grams", "n_unique",
            F.expr("(n_unique * 1000000) div n_grams").alias("novelty_x1e6"),
        )
    )


def write_gram_df_index(
    docs: DataFrame,
    path: str,
    n: int,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist the corpus gram document-frequency table so ingestion
    batches can be novelty-scored WITHOUT rescanning the corpus: the one
    linear-shuffle pass (gram -> distinct-doc count) paid ONCE, written
    parquet PARTITIONED BY bucket = pmod(xxhash64(gram), n_buckets) —
    a small batch touches few buckets, and the reader prunes to exactly
    those directories (the segmented-read discipline). ``path/meta`` pins
    (n, n_buckets); readers never take them from callers. ONE repartition
    by bucket before the write keeps one writer task per directory."""
    spark = docs.sparkSession
    cg = _gram_rows(docs, n, text_col, id_col, "doc_id")
    df_tab = cg.groupBy("gram").agg(F.count(F.lit(1)).alias("df")).withColumn(
        "bucket", F.pmod(F.xxhash64("gram"), F.lit(int(n_buckets))))
    df_tab.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket").parquet(f"{path}/df")
    spark.createDataFrame(
        [(int(n), int(n_buckets))], "n int, n_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def append_gram_df_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """INCREMENTAL maintenance of the gram-df index: merge an ingestion
    batch's per-doc-distinct gram counts into the persisted table,
    rewriting ONLY the bucket directories the batch's grams hash into
    (dynamic partition overwrite — untouched buckets' files are never
    read or written). Returns the number of buckets rewritten.

    df is ADDITIVE over disjoint doc sets, so appending batch B to an
    index of corpus C equals rebuilding over C ∪ B row-for-row (parity
    is a driver hard gate), and appends associate — two half-batches
    equal one. The ingest contract is doc-id disjointness: re-appending
    docs already counted would double their grams (exact dedup is the
    caller's gate, clean_corpus). Geometry (n, n_buckets) comes from the
    pinned meta, never the caller. The merged buckets are materialized
    (localCheckpoint) BEFORE the overwrite — Spark cannot overwrite a
    path that still feeds the running plan. Not concurrent-safe with an
    in-flight reader of the same buckets (the compaction discipline)."""
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    bg = (
        _gram_rows(new_docs, meta["n"], text_col, id_col, "doc_id")
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("bucket",
                    F.pmod(F.xxhash64("gram"), F.lit(int(meta["n_buckets"]))))
    )
    return _merge_gram_df_buckets(spark, path, bg, sign=1)


def remove_gram_df_index(
    removed_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """RETENTION twin of append_gram_df_index: un-count departing docs
    (takedowns, TTL expiry) from the persisted gram-df table — the same
    touched-buckets merge with NEGATED counts (df is additive over
    disjoint doc sets, so removal is subtraction); grams whose df reaches
    0 are dropped from the table. REFUSES (raises) if any df would go
    negative — that means a doc is being removed that was never counted
    (or was counted differently), and silently clamping would corrupt
    every downstream novelty/scrub answer. Returns buckets rewritten.
    Same contracts as append: doc-set disjointness per call, no
    concurrent readers of the touched buckets, pending deltas must be
    compacted first (the base is what's rewritten)."""
    spark = removed_docs.sparkSession
    import glob as _glob

    if _glob.glob(f"{path}/delta/batch=*"):
        raise ValueError(
            "remove_gram_df_index: pending delta commits — compact first "
            "(the removal rewrites the BASE; a later compaction would "
            "re-add what the deltas hold)")
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    bg = (
        _gram_rows(removed_docs, meta["n"], text_col, id_col, "doc_id")
        .groupBy("gram")
        .agg((-F.count(F.lit(1))).cast("long").alias("df"))
        .withColumn("bucket",
                    F.pmod(F.xxhash64("gram"), F.lit(int(meta["n_buckets"]))))
    )
    return _merge_gram_df_buckets(spark, path, bg, sign=-1)


def _merge_gram_df_buckets(spark, path: str, delta: DataFrame,
                           sign: int) -> int:
    """Shared merge body of append_/remove_gram_df_index: sum the delta
    into the base over the touched buckets only, materialize
    (localCheckpoint — Spark cannot overwrite a path still feeding the
    plan), validate, dynamic-partition-overwrite those buckets. For
    removals (sign=-1): a negative merged df raises (never-counted doc),
    zeros are dropped."""
    buckets = [int(r["bucket"]) for r in delta.select("bucket").distinct().collect()]
    if not buckets:
        return 0
    old = spark.read.parquet(f"{path}/df").filter(
        F.col("bucket").isin(buckets)).select(
        F.col("bucket").cast("long").alias("bucket"), "gram", "df")
    merged = (
        delta.select("bucket", "gram", "df").unionByName(old)
        .groupBy("bucket", "gram")
        .agg(F.sum("df").cast("long").alias("df"))
        .select("gram", "df", "bucket")
        .repartition("bucket")
        .localCheckpoint()
    )
    emptied: list[int] = []
    if sign < 0:
        if merged.filter(F.col("df") < 0).limit(1).count() > 0:
            raise ValueError(
                "remove_gram_df_index: removal would drive a gram's df "
                "negative — the doc set was never (or differently) counted")
        merged = merged.filter(F.col("df") > 0)
        # dynamic overwrite only replaces partitions PRESENT in the data:
        # a bucket whose every gram reached df=0 writes no rows, so its
        # stale directory must be dropped by hand
        present = {int(r["bucket"])
                   for r in merged.select("bucket").distinct().collect()}
        emptied = [b for b in buckets if b not in present]
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(f"{path}/df")
    )
    if emptied:
        import shutil

        for b in emptied:
            shutil.rmtree(f"{path}/df/bucket={b}", ignore_errors=True)
    return len(buckets)


def _gram_df_table(spark, path: str, buckets: list[int]) -> DataFrame:
    """The LIVE gram-df table restricted to ``buckets``: the compacted
    base plus any pending DELTA commits, summed per (bucket, gram) —
    THE one read-side definition every index consumer (novelty, ingest
    scrub) composes. With no pending deltas the plan is exactly the
    base read (no extra shuffle)."""
    import glob as _glob

    base = spark.read.parquet(f"{path}/df").filter(
        F.col("bucket").isin(buckets)).select(
        F.col("bucket").cast("long").alias("bucket"), "gram", "df")
    deltas = sorted(_glob.glob(f"{path}/delta/batch=*"))
    if not deltas:
        return base
    d = spark.read.parquet(*deltas).filter(
        F.col("bucket").isin(buckets)).select(
        F.col("bucket").cast("long").alias("bucket"), "gram", "df")
    return (
        base.unionByName(d)
        .groupBy("bucket", "gram")
        .agg(F.sum("df").cast("long").alias("df"))
    )


def append_gram_df_delta(new_docs: DataFrame, path: str, batch_id: int,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> bool:
    """EXACTLY-ONCE delta commit of an ingestion batch's gram counts:
    the batch's (gram, df, bucket) partial lands in
    ``path/delta/batch={id}``; a completed commit (_SUCCESS present) is
    skipped on redelivery — sound because this write is the commit's
    ONLY effect, unlike append_gram_df_index's read-merge-overwrite,
    which is NOT replay-idempotent and belongs to planned maintenance,
    not at-least-once streams. A torn directory from a crash (no
    _SUCCESS) is simply overwritten by the retry. Returns True iff the
    commit ran; empty batches commit nothing (re-running them is a
    no-op either way)."""
    import os

    dest = f"{path}/delta/batch={int(batch_id)}"
    if os.path.exists(f"{dest}/_SUCCESS"):
        return False
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    bg = (
        _gram_rows(new_docs, meta["n"], text_col, id_col, "doc_id")
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("bucket",
                    F.pmod(F.xxhash64("gram"), F.lit(int(meta["n_buckets"]))))
    )
    if bg.isEmpty():
        return False
    bg.select("gram", "df", "bucket").write.mode("overwrite").parquet(dest)
    return True


def gram_df_index_stream(stream: DataFrame, path: str, checkpoint_path: str,
                         text_col: str = "text", id_col: str = "doc_id"):
    """STREAMING maintenance of the gram-df index: each micro-batch lands
    as one exactly-once delta commit (append_gram_df_delta — the batch_id
    _SUCCESS probe IS the replay guard); readers see base + deltas live
    through _gram_df_table; compact_gram_df_index folds the tail back
    into the bucket layout. Returns the started availableNow query."""
    return (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: append_gram_df_delta(bdf, path, bid,
                                                  text_col, id_col)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def compact_gram_df_index(spark, path: str) -> int:
    """Fold every pending delta commit into the bucket-partitioned base
    (touched buckets only, dynamic partition overwrite — the
    append_gram_df_index shape) and drop the delta directories. The live
    table (_gram_df_table) is byte-identical before and after by
    construction. NOT concurrent-safe with an active stream or an
    in-flight reader of the touched buckets (the compaction discipline).
    Returns the number of delta commits folded."""
    import glob as _glob
    import shutil

    deltas = sorted(_glob.glob(f"{path}/delta/batch=*"))
    if not deltas:
        return 0
    d = spark.read.parquet(*deltas)
    buckets = [int(r["bucket"]) for r in d.select("bucket").distinct().collect()]
    merged = (
        _gram_df_table(spark, path, buckets)
        .select("gram", "df", "bucket")
        .repartition("bucket")
        .localCheckpoint()
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(f"{path}/df")
    )
    for dd in deltas:
        shutil.rmtree(dd)
    return len(deltas)


def novelty_against_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """INCREMENTAL novelty: score an ingestion batch against the PERSISTED
    corpus gram-df table — (doc_id, n_grams, n_known, novelty_x1e6) per
    new doc, where n_grams is its distinct gram count, n_known how many
    appear in the indexed corpus at all, and novelty = the unseen
    fraction. Unlike self-novelty (novelty_scores' df == 1), 'new' here
    means ABSENT FROM THE CORPUS, so each doc's score is independent of
    its batch — batch boundaries and streaming cannot change answers.

    Scale: the batch's gram stream carries a computed bucket column; the
    distinct buckets present (<= n_buckets, one tiny collect) become a
    partition FILTER on the index read, so a small batch scans only its
    buckets' files; the join is a LEFT join keyed (bucket, gram) —
    absent gram = novel. Docs shorter than n emit no row."""
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    cg = _gram_rows(new_docs, meta["n"], text_col, id_col, "doc_id").withColumn(
        "bucket", F.pmod(F.xxhash64("gram"), F.lit(int(meta["n_buckets"]))))
    buckets = [int(r["bucket"]) for r in cg.select("bucket").distinct().collect()]
    idx = _gram_df_table(spark, path, buckets)
    return (
        cg.join(idx, ["bucket", "gram"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df").isNotNull(), 1).otherwise(0))
            .alias("n_known"),
        )
        .select(
            "doc_id", "n_grams", "n_known",
            F.expr("((n_grams - n_known) * 1000000) div n_grams")
            .alias("novelty_x1e6"),
        )
    )


def top_contaminating_grams(
    docs: DataFrame,
    bench: DataFrame,
    n: int,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """THE AUDIT REPORT behind the pair table: the top-k grams by how many
    (corpus doc, bench doc) contaminated pairs they witness — (gram,
    n_pairs, n_docs). A gram with huge n_pairs but spread across all
    benchmarks is boilerplate (license headers, prompt templates) that
    should be stripped from the BENCH side rather than used to drop
    thousands of training docs; a gram with few, focused pairs is real
    leakage. Deterministic (n_pairs DESC, gram ASC) top-k; same broadcast
    plan as contamination_pairs with the groupBy keyed on the gram."""
    if k < 1:
        raise ValueError("top_contaminating_grams: k must be >= 1")
    bg = _gram_rows(bench, n, text_col, bench_id_col, "bench_id")
    cg = _gram_rows(docs, n, text_col, id_col, "doc_id")
    return (
        cg.join(F.broadcast(bg), "gram")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_pairs"), F.asc("gram"))
        .limit(int(k))
    )


def contamination_spans(
    docs: DataFrame,
    bench: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """SURGICAL REDACTION LIST: per corpus doc, the maximal character
    intervals covered by grams shared with ANY benchmark doc — (doc_id,
    span_start, span_end), 0-based half-open [start, end). Instead of
    dropping a whole contaminated doc (clean_corpus), a pipeline can cut
    just these spans. Overlapping and touching gram hits merge
    (gaps-and-islands: all hits are length-n, so ordered by start the
    previous interval's end is lag(start)+n and a new island begins exactly
    when start > lag(start)+n; island ids are the running sum of those
    breaks). Self-hits are excluded like contamination_pairs.

    One broadcast gram join (positions kept, NOT deduped — every hit
    matters for coverage), one partitionBy(doc) window exchange."""
    bg = _gram_rows(bench, n, text_col, bench_id_col, "bench_id")
    cpos = positioned_gram_rows(docs, n, text_col, id_col)
    hits = (
        cpos.join(F.broadcast(bg.select("bench_id", "gram").distinct()), "gram")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .select("doc_id", "start")
        .distinct()  # several bench docs may witness the same position
    )
    return _fixed_gram_islands(hits, n)


def _fixed_gram_islands(hits: DataFrame, n: int) -> DataFrame:
    """Merge a (doc_id, start) stream of length-``n`` gram hits into maximal
    covered char intervals — (doc_id, span_start, span_end), 0-based
    half-open. THE one definition of the fixed-length gaps-and-islands
    merge (all hits are length n, so ordered by start the previous
    interval's end is lag(start)+n and a new island begins exactly when
    start > lag(start)+n; island ids = running sum of breaks). ``hits``
    must already be distinct per (doc_id, start). One partitionBy(doc)
    window exchange; variable-length intervals belong to
    repetition.merge_intervals instead. Duplicate (doc_id, start) rows are
    TOLERATED (an equal start can never satisfy start > lag+n, so it joins
    the same island and min/max are unchanged) — they only cost window
    rows, so dedupe upstream when the producer can emit several witnesses
    per position (contamination_spans) and skip it when the join is
    provably 1:1 (the cross-doc family)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("start")
    islands = hits.withColumn(
        "brk",
        F.when(
            F.col("start") > F.lag("start").over(w) + F.lit(n), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + F.lit(n)).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def _dup_gram_stats(pos: DataFrame, min_docs: int,
                    keeper: bool = True) -> DataFrame:
    """(gram[, keeper]) for every gram occurring in >= ``min_docs`` DISTINCT
    docs of the positioned-gram stream; ``keeper`` = MIN(doc_id) over the
    gram's owners (the canonical doc whose occurrences survive a
    keep-first scrub) — skipped when the caller only needs the dup-gram
    set. The (gram, doc) dedupe + groupBy is the one linear-in-corpus
    shuffle of the cross-doc family — the novelty_scores shape; the gram
    string rides that shuffle once, exactly like clean_corpus's keeper
    grouping. A boilerplate gram owned by every doc is one hot key — AQE
    skew-join splitting applies downstream."""
    if min_docs < 2:
        raise ValueError("_dup_gram_stats: min_docs must be >= 2 "
                         "(a 1-doc 'duplicate' would scrub every doc)")
    aggs = [F.count(F.lit(1)).alias("nd")]
    if keeper:
        aggs.append(F.min("doc_id").alias("keeper"))
    return (
        pos.select("doc_id", "gram").distinct()
        .groupBy("gram")
        .agg(*aggs)
        .filter(F.col("nd") >= min_docs)
        .drop("nd")
    )


def cross_doc_dup_spans(
    docs: DataFrame,
    n: int,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT SUBSTRING-DEDUP AUDIT (corpus vs itself): per doc, the maximal
    char intervals covered by length-``n`` grams that occur in >=
    ``min_docs`` DISTINCT documents — (doc_id, span_start, span_end),
    0-based half-open. The cross-document twin of
    repetition.dup_ngram_coverage (within-doc) and contamination_spans
    (corpus vs bench): any char inside a span is part of an exact n-char
    string some other document also contains.

    Shapes: positioned grams are generated map-side (sequence+substring,
    whole-stage codegen); the dup-gram dictionary is ONE linear groupBy
    (_dup_gram_stats); the join back is linear — one stats row per gram,
    so every position joins at most once, no quadratic pair blow-up like
    a position×position self-join would have. Downstream work is bounded
    by the DUPLICATED positions only."""
    pos = positioned_gram_rows(docs, n, text_col, id_col)
    dup = _dup_gram_stats(pos, min_docs, keeper=False)
    # no distinct: pos is unique per (doc, start) and dup unique per gram,
    # so the join emits each position at most once (unlike the vs-bench
    # contamination_spans, where several bench docs witness one position)
    hits = pos.join(dup, "gram").select("doc_id", "start")
    return _fixed_gram_islands(hits, n)


def scrub_cross_doc_spans(
    docs: DataFrame,
    n: int,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """KEEP-FIRST exact substring dedup (Lee et al. 2022's dedup objective
    at document granularity): for every length-``n`` gram occurring in >=
    ``min_docs`` distinct docs, the MIN-doc_id owner keeps its text; every
    OTHER owner has the chars covered by that gram cut out. Returns
    (doc_id, clean_text) for the WHOLE corpus — untouched docs pass
    through verbatim, a fully-duplicated non-keeper doc becomes ''.

    Doc-granularity keeper means occurrences inside the keeper doc are
    never cut (within-doc repetition is repetition.dup_ngram_coverage's
    job), and a position is cut when ANY covering dup gram names a
    different keeper — the union over removing grams, which is what makes
    the contract order-free and engine-reproducible.

    Shapes: one linear gram-stats shuffle (_dup_gram_stats), one linear
    join back, islands merge over REMOVED positions only, then string
    surgery as a per-doc fold over the merged spans (collect_list of the
    few spans per doc + one aggregate() HOF — spans are maximal so their
    count per doc is bounded by text_len/n; the fold's string copies are
    fine at that count). The final left join keeps the corpus partitioning
    and touches no text twice."""
    pos = positioned_gram_rows(docs, n, text_col, id_col)
    stats = _dup_gram_stats(pos, min_docs)
    removed = (  # 1:1 join (stats unique per gram) — no dedupe needed
        pos.join(stats, "gram")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id", "start")
    )
    return _apply_span_cuts(docs, _fixed_gram_islands(removed, n),
                            text_col, id_col)


def _apply_span_cuts(docs: DataFrame, spans: DataFrame,
                     text_col: str, id_col: str) -> DataFrame:
    """Cut the (doc_id, span_start, span_end) intervals out of each doc's
    text — (doc_id, clean_text) for the WHOLE input frame (docs without
    spans pass through verbatim via the left join). Spans must be merged
    and non-overlapping (the islands kernels guarantee it); the surgery is
    a per-doc fold over the few spans (count bounded by len/n), so the
    fold's string copies are fine."""
    span_arr = spans.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("span_start").alias("s"),
                                    F.col("span_end").alias("e")))
        ).alias("sp")
    )
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("_t"))
    return base.join(span_arr, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("sp").isNull(), F.col("_t"))
        .otherwise(F.expr(
            "aggregate(sp, struct(CAST(0 AS INT) AS pos, '' AS acc), "
            "(a, x) -> struct(x.e AS pos, "
            "concat(a.acc, substring(_t, a.pos + 1, x.s - a.pos)) AS acc), "
            "a -> concat(a.acc, substring(_t, a.pos + 1)))"
        ))
        .alias("clean_text"),
    )


def scrub_against_gram_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """INGEST-TIME keep-first scrub: chars of ARRIVING docs covered by any
    gram the indexed corpus already contains are cut — the corpus is the
    senior keeper, the batch always yields. Returns (doc_id, clean_text)
    for the whole batch. Per-doc answers depend only on the doc + the
    static index, so batch boundaries (and streaming) cannot change them
    — the streaming twin is this function applied per micro-batch,
    UNCHANGED (scrub_ingest_stream).

    Reuses the novelty gram-df index (write_gram_df_index): the batch's
    positioned grams carry the bucket column, the distinct buckets
    present (one tiny collect) become a partition FILTER on the index
    read, and the join is an inner (bucket, gram) hash join — a small
    batch scans only its buckets' files, never the corpus."""
    spark = new_docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first().asDict()
    pos = positioned_gram_rows(new_docs, meta["n"], text_col, id_col
                               ).withColumn(
        "bucket", F.pmod(F.xxhash64("gram"), F.lit(int(meta["n_buckets"]))))
    buckets = [int(r["bucket"]) for r in pos.select("bucket").distinct().collect()]
    idx = _gram_df_table(spark, path, buckets).select("bucket", "gram")
    # 1:1 join (the live table has one row per gram: the base is unique
    # by construction and the delta path re-groups) — no dedupe needed
    hits = pos.join(idx, ["bucket", "gram"]).select("doc_id", "start")
    return _apply_span_cuts(new_docs, _fixed_gram_islands(hits, meta["n"]),
                            text_col, id_col)


def scrub_ingest_stream(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """STREAMING ingest scrub: arriving doc files drained through a file
    stream, each micro-batch scrubbed against the persisted corpus gram
    index via foreachBatch (replay-guarded append — the shared
    at-least-once discipline). The output table minus batch_id must equal
    scrub_against_gram_index over all batches at once: stateless per doc
    by construction. Returns the started availableNow query."""
    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        replay_guarded_append,
    )

    def _do(batch_df: DataFrame) -> DataFrame:
        return scrub_against_gram_index(batch_df, index_path, text_col, id_col)

    return (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: replay_guarded_append(out_path, bdf, bid, _do)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def clean_corpus(
    docs: DataFrame,
    bench: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """The COMPOSED training-corpus gate: surviving doc ids after
    (1) exact dedup — of every identical-text group only the MINIMUM id
    survives (the canonical keeper) — and (2) benchmark decontamination —
    any doc sharing an exact n-gram with a bench doc (other than itself)
    is dropped. Returns a one-column (doc_id) frame: the manifest a
    pipeline would anti-join against the corpus before writing shards.

    Shapes: the keeper groupBy keys on (xxhash64(text), text) — the hash
    prefixes the key so equal-hash groups co-locate cheaply, the text
    disambiguates collisions exactly (the text rides the shuffle once,
    which any exact-text grouping pays); the contamination leg is the
    broadcast-gram join of contamination_pairs; the final combination is
    a left-anti join on ids only."""
    keepers = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.xxhash64(text_col).alias("h"),
                    F.col(text_col).alias("t"))
        .groupBy("h", "t")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    contaminated = (
        contamination_pairs(docs, bench, n, text_col, id_col, bench_id_col)
        .select("doc_id")
        .distinct()
    )
    return keepers.join(contaminated, "doc_id", "left_anti")


def contamination_pairs_indexed(
    corpus: DataFrame,
    index: DataFrame,
    cfg,
    bench: DataFrame,
    n: int,
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    **search_kw,
) -> DataFrame:
    """Index-accelerated ``contamination_pairs``: the bench gram dictionary
    (collected driver-side — small by the same contract that lets the
    broadcast path broadcast it) becomes ONE pattern_search_batch over the
    existing Bloom cascade, so un-indexed corpus text is never rescanned;
    only cascade-surviving (doc, window) candidates are verified. Same
    (doc_id, bench_id, n_shared) rows as the broadcast path.

    ``search_kw`` forwards to pattern_search_batch (start_level / freq /
    stats / ... — wire the planner inputs, the cascade cost dominates)."""
    from .batch import pattern_search_batch

    spark = corpus.sparkSession
    rows = _gram_rows(bench, n, text_col, bench_id_col, "bench_id").collect()
    if not rows:
        return spark.createDataFrame(
            [], "doc_id string, bench_id string, n_shared long"
        )
    grams = sorted({r.gram for r in rows})
    gid = {g: i for i, g in enumerate(grams)}
    patterns = [[ord(c) for c in g] for g in grams]
    owners = spark.createDataFrame(
        [(gid[r.gram], r.bench_id) for r in rows],
        "pattern_id int, bench_id string",
    )
    hits = pattern_search_batch(corpus, index, cfg, patterns, **search_kw)
    return (
        hits.select("pattern_id", "doc_id")
        .distinct()  # one row per (gram, doc) — positions don't multiply counts
        .join(F.broadcast(owners), "pattern_id")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def dup_gram_spectrum(
    docs: DataFrame,
    lengths: list[int],
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DUPLICATION SPECTRUM: how much exact cross-document duplication
    survives at each gram length — the measurement a pipeline runs BEFORE
    picking the ``n`` for its substring-dedup pass (Lee et al. 2022 pick 50
    BPE tokens by exactly this curve; too small scrubs boilerplate English,
    too large misses real dups). Per requested length L, one row:

      (gram_len, n_dup_grams, n_dup_positions, n_docs_with_dup)

    where a dup gram is an L-char substring occurring in >= ``min_docs``
    DISTINCT documents, and positions count EVERY occurrence of every dup
    gram (the mass a scrub at that L would inspect).

    Shapes: per L this is the cross_doc_dup_spans skeleton collapsed to
    aggregates — positioned grams map-side (codegen'd sequence+substring),
    ONE linear (gram, doc)-distinct groupBy (_dup_gram_stats), one
    join-back bounded by one stats row per gram, then a full aggregate
    that reduces to a single row before the driver. The spectrum is a
    union of |lengths| such pipelines: linear in corpus size per point,
    embarrassingly parallel across points. At 100 TB you run it on a
    uniform doc sample first (sampling.stratified_sample_docs composes) —
    the curve's SHAPE, not its absolute counts, picks n."""
    ls = sorted(set(int(x) for x in lengths))
    if not ls or ls[0] < 1:
        raise ValueError("dup_gram_spectrum: lengths must be >= 1")
    outs = []
    for L in ls:
        pos = positioned_gram_rows(docs, L, text_col, id_col)
        dup = _dup_gram_stats(pos, min_docs, keeper=False)
        hits = pos.join(dup, "gram")
        outs.append(
            hits.agg(
                F.count_distinct("gram").alias("n_dup_grams"),
                F.count(F.lit(1)).alias("n_dup_positions"),
                F.count_distinct("doc_id").alias("n_docs_with_dup"),
            ).select(
                F.lit(L).cast("long").alias("gram_len"),
                "n_dup_grams", "n_dup_positions", "n_docs_with_dup",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
