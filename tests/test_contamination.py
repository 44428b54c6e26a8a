"""Benchmark decontamination: broadcast-join path vs a local exact
computation, and the index-accelerated path vs the broadcast path."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.operators import build_index
from hierarchical_bloom_filter_index_spark.operators import contamination as X

SF_DIR = "/root/testdata/sf0.001"
N = 16


@pytest.fixture(scope="module")
def docs(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        .filter(F.col("doc_id").cast("long") < 120)
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def bench(docs):
    return docs.filter(F.col("doc_id").cast("long") % 29 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )


def _local_pairs(docs_rows, bench_rows, n):
    def grams(t):
        return {t[i : i + n] for i in range(len(t) - n + 1)}

    bg = [(r["bench_id"], grams(r["text"])) for r in bench_rows]
    out = {}
    for r in docs_rows:
        g = grams(r["text"])
        for bid, bgr in bg:
            if r["doc_id"] == bid:
                continue
            shared = len(g & bgr)
            if shared:
                out[(r["doc_id"], bid)] = shared
    return out


def test_contamination_pairs_vs_local(spark, docs, bench):
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in X.contamination_pairs(docs, bench, N).collect()
    }
    want = _local_pairs(docs.collect(), bench.collect(), N)
    assert got == want
    assert got, "fixture produced no contaminated pairs — test is vacuous"


def test_contamination_short_docs_and_empty_bench(spark, docs):
    shorty = spark.createDataFrame(
        [("s1", "tiny"), ("s2", "")], "doc_id string, text string"
    )
    # docs shorter than n produce no grams, not a crash or phantom sequence
    assert X.contamination_pairs(shorty, docs.select(
        F.col("doc_id").alias("bench_id"), "text"), N).count() == 0
    empty_bench = spark.createDataFrame([], "bench_id string, text string")
    assert X.contamination_pairs(docs, empty_bench, N).count() == 0


def test_indexed_path_matches_broadcast(spark, docs, bench):
    cfg = HbiConfig(tree_span=1024, leaf_span=32, fpr=0.01, vocab=128, seed=42)
    corpus = C.corpus_from_documents(spark, SF_DIR).filter(
        F.col("doc_id").cast("long") < 120
    ).cache()
    index = build_index(corpus, cfg).cache()
    # one bench doc keeps the gram dictionary small — the indexed path's
    # stated contract (the broadcast path is the big-dictionary answer)
    bench1 = bench.filter(F.col("bench_id") == "0")
    try:
        got = X.contamination_pairs_indexed(corpus, index, cfg, bench1, N)
        want = X.contamination_pairs(docs, bench1, N)
        sym = got.exceptAll(want).unionByName(want.exceptAll(got))
        assert sym.count() == 0
    finally:
        index.unpersist()
        corpus.unpersist()


def test_novelty_scores_vs_local(spark, docs):
    got = {
        r["doc_id"]: (r["n_grams"], r["n_unique"], r["novelty_x1e6"])
        for r in X.novelty_scores(docs, N).collect()
    }
    rows = docs.collect()
    grams = {
        r["doc_id"]: {r["text"][i : i + N] for i in range(len(r["text"]) - N + 1)}
        for r in rows
    }
    dfx = {}
    for g_set in grams.values():
        for g in g_set:
            dfx[g] = dfx.get(g, 0) + 1
    want = {}
    for did, g_set in grams.items():
        if not g_set:
            continue
        uniq = sum(1 for g in g_set if dfx[g] == 1)
        want[did] = (len(g_set), uniq, (uniq * 1_000_000) // len(g_set))
    assert got == want
    assert any(v[1] for v in want.values()), "no unique grams — vacuous"
    assert any(v[1] < v[0] for v in want.values()), "no shared grams — vacuous"


def test_clean_corpus_gate(spark, docs, bench):
    d0 = docs.orderBy("doc_id").first()
    extra = spark.createDataFrame(
        [("zz-dup", d0["text"])], "doc_id string, text string"
    )
    mixed = docs.unionByName(extra)
    kept = {r["doc_id"] for r in X.clean_corpus(mixed, bench, N).collect()}
    # the injected duplicate ALWAYS loses to the original (min-id keeper) —
    # whether the original itself survives depends only on contamination
    assert "zz-dup" not in kept
    # every contaminated doc is gone
    cont = {r["doc_id"] for r in X.contamination_pairs(mixed, bench, N).collect()}
    assert not (kept & cont)
    # every kept doc is a real doc and unique-text keeper
    texts = {}
    for r in mixed.collect():
        texts.setdefault(r["text"], []).append(r["doc_id"])
    keepers = {min(v) for v in texts.values()}
    assert kept == keepers - cont


def test_contamination_spans_vs_local(spark, docs, bench):
    got = {}
    for r in X.contamination_spans(docs, bench, N).collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    got = {d: sorted(v) for d, v in got.items()}
    bset = {}
    brows = bench.collect()
    for r in docs.collect():
        t = r["text"]
        starts = sorted(
            i for i in range(len(t) - N + 1)
            if any(t[i : i + N] in b["text"] and b["bench_id"] != r["doc_id"]
                   for b in brows)
        )
        spans, prev = [], None
        for s in starts:
            if prev is not None and s <= prev + N:
                spans[-1][1] = s + N
            else:
                spans.append([s, s + N])
            prev = s
        if spans:
            bset[r["doc_id"]] = [tuple(x) for x in spans]
    assert got == bset
    assert got, "no contaminated spans — vacuous"
    # the fixture must exercise the island-BREAK path (multi-span docs),
    # or the gaps-and-islands logic could regress with the test still green
    assert any(len(v) > 1 for v in got.values()), "no multi-span doc — vacuous"
    # ... and the MERGE path: some span must cover more than one gram
    assert any(e - s > N for spans in got.values() for s, e in spans), \
        "no merged span — vacuous"


def test_novelty_against_index_prunes_and_scores(spark, tmp_path):
    """The persisted gram-df index: value parity vs a local computation,
    bucket partition pruning for a small batch, and per-doc independence
    of batch composition."""
    from pyspark.sql import functions as F

    from hierarchical_bloom_filter_index_spark.operators.contamination import (
        novelty_against_index, write_gram_df_index,
    )

    old = spark.createDataFrame(
        [(f"o{i}", f"corpus document number {i} with shared boilerplate text")
         for i in range(20)],
        "doc_id string, text string")
    new = spark.createDataFrame(
        [("n0", "corpus document number 3 with shared boilerplate text"),
         ("n1", "completely unprecedented fresh material xyzzy quux!!"),
         ("n2", "short")],  # < n chars -> no row
        "doc_id string, text string")
    path = str(tmp_path / "idx")
    write_gram_df_index(old, path, N, n_buckets=16)

    got = {r["doc_id"]: (r["n_grams"], r["n_known"], r["novelty_x1e6"])
           for r in novelty_against_index(new, path).collect()}
    # local truth
    def grams(t):
        return {t[i:i + N] for i in range(len(t) - N + 1)}
    corpus = set().union(*[grams(r["text"]) for r in old.collect()])
    want = {}
    for r in new.collect():
        g = grams(r["text"])
        if g:
            known = len(g & corpus)
            want[r["doc_id"]] = (len(g), known,
                                 ((len(g) - known) * 1_000_000) // len(g))
    assert got == want
    assert "n2" not in got and got["n0"][2] < got["n1"][2]
    # a one-doc batch reads ONLY its grams' bucket directories
    one = new.filter(F.col("doc_id") == "n0")
    sc = one.sparkSession
    from hierarchical_bloom_filter_index_spark.operators.contamination import (
        _gram_rows,
    )
    gb = {int(r[0]) for r in _gram_rows(one, N, "text", "doc_id", "d")
          .select(F.pmod(F.xxhash64("gram"), F.lit(16))).distinct().collect()}
    assert len(gb) < 16, "fixture too big to show pruning"
    idx = sc.read.parquet(f"{path}/df").filter(F.col("bucket").isin(list(gb)))
    files = {r[0] for r in idx.select(F.input_file_name()).distinct().collect()}
    assert files and all(any(f"bucket={b}/" in f for b in gb) for f in files)
    # batch-composition independence: scoring n0 alone == scoring in batch
    solo = {r["doc_id"]: (r["n_grams"], r["n_known"], r["novelty_x1e6"])
            for r in novelty_against_index(one, path).collect()}
    assert solo == {"n0": got["n0"]}


# ---------------------------------------------------------------------------
# cross-doc exact substring dedup (corpus vs itself)
# ---------------------------------------------------------------------------

def _local_dup_map(rows, n, min_docs):
    """gram -> (owner set, keeper) over a doc list, dup grams only."""
    owners = {}
    for r in rows:
        t = r["text"]
        for i in range(max(0, len(t) - n + 1)):
            owners.setdefault(t[i : i + n], set()).add(r["doc_id"])
    return {g: (o, min(o)) for g, o in owners.items() if len(o) >= min_docs}


def _local_islands(starts, n):
    out = []
    for s in sorted(starts):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], s + n)
        else:
            out.append([s, s + n])
    return [tuple(x) for x in out]

def _local_cut(text, rm_starts, n):
    """Reference span-cut semantics: remove the islands of length-n gram
    starts from text — THE one local model every scrub test checks against."""
    clean, pos = "", 0
    for s, e in _local_islands(rm_starts, n):
        clean += text[pos:s]
        pos = e
    return clean + text[pos:]



def test_crossdoc_dup_spans_vs_local(spark, docs):
    rows = docs.collect()
    dup = _local_dup_map(rows, N, 2)
    want = sorted(
        (r["doc_id"], s, e)
        for r in rows
        for s, e in _local_islands(
            [i for i in range(max(0, len(r["text"]) - N + 1))
             if r["text"][i : i + N] in dup], N)
    )
    got = sorted(map(tuple, X.cross_doc_dup_spans(docs, N).collect()))
    assert got == want
    assert got, "no cross-doc dup spans — vacuous"
    per_doc = {}
    for d, s, e in got:
        per_doc.setdefault(d, []).append((s, e))
    assert any(len(v) > 1 for v in per_doc.values()), "no multi-span doc — vacuous"
    assert any(e - s > N for d, s, e in got), "no merged span — vacuous"


def test_scrub_crossdoc_vs_local(spark, docs):
    rows = docs.collect()
    dup = _local_dup_map(rows, N, 2)
    want = {}
    for r in rows:
        t = r["text"]
        rm = [i for i in range(max(0, len(t) - N + 1))
              if t[i : i + N] in dup and dup[t[i : i + N]][1] != r["doc_id"]]
        want[r["doc_id"]] = _local_cut(t, rm, N)
    got = dict(X.scrub_cross_doc_spans(docs, N).collect())
    assert got == want
    assert len(got) == len(rows), "scrub must return the WHOLE corpus"
    assert any(got[d] != w for d, w in
               ((r["doc_id"], r["text"]) for r in rows)), "nothing scrubbed — vacuous"
    assert any(got[r["doc_id"]] == r["text"] for r in rows), \
        "every doc scrubbed — keeper semantics untested"


def test_scrub_keep_first_semantics(spark):
    n = 10
    fixture = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "a quick brown fox leaps over a lazy dog indeed"),
        ("c", "the quick brown fox jumps over the lazy dog"),  # exact dup of a
        ("d", "completely unrelated text with no shared grams!"),
        ("e", "xy"),  # shorter than n: no grams, passes through
    ]
    df = spark.createDataFrame(fixture, ["doc_id", "text"])
    got = dict(X.scrub_cross_doc_spans(df, n).collect())
    # min-id keeper keeps its text verbatim; the exact dup is fully cut
    assert got["a"] == fixture[0][1]
    assert got["c"] == ""
    # partial-overlap doc loses only the covered islands
    assert got["b"] == "aleaps over a lazy dog indeed"
    # untouched + short docs pass through byte-identically
    assert got["d"] == fixture[3][1]
    assert got["e"] == "xy"
    # spans audit agrees with the scrub's removals on the non-keeper side
    spans = sorted(map(tuple, X.cross_doc_dup_spans(df, n).collect()))
    assert ("c", 0, len(fixture[0][1])) in spans
    # a min_docs raise prunes 2-doc dups but still cuts 3-doc grams
    # (b shares "quick brown"/"lazy dog" grams with BOTH a and c)
    dup3 = _local_dup_map([{"doc_id": d, "text": t} for d, t in fixture], n, 3)
    want3 = {}
    for d, t in fixture:
        rm = [i for i in range(max(0, len(t) - n + 1))
              if t[i : i + n] in dup3 and dup3[t[i : i + n]][1] != d]
        want3[d] = _local_cut(t, rm, n)
    got3 = dict(X.scrub_cross_doc_spans(df, n, min_docs=3).collect())
    assert got3 == want3
    assert len(got3["c"]) > 0, "min_docs=3 must spare c's 2-doc-only grams"
    # b cannot gain: every b-gram shared with a is also in c (a == c), so
    # b's dup grams are all 3-doc grams — the raise only spares c
    assert len(got3["b"]) >= len(got["b"])
    with pytest.raises(ValueError, match="min_docs"):
        X.cross_doc_dup_spans(df, n, min_docs=1)


def test_scrub_against_index_vs_local_and_batch_independence(spark, docs, tmp_path):
    rows = docs.collect()
    old_rows = [r for r in rows if int(r["doc_id"]) % 3 != 0]
    new_rows = [r for r in rows if int(r["doc_id"]) % 3 == 0]
    old = docs.filter(F.col("doc_id").cast("long") % 3 != 0)
    new = docs.filter(F.col("doc_id").cast("long") % 3 == 0)
    path = str(tmp_path / "gramidx")
    X.write_gram_df_index(old, path, N)

    corpus_grams = set()
    for r in old_rows:
        t = r["text"]
        corpus_grams.update(t[i : i + N] for i in range(max(0, len(t) - N + 1)))
    want = {}
    for r in new_rows:
        t = r["text"]
        rm = [i for i in range(max(0, len(t) - N + 1))
              if t[i : i + N] in corpus_grams]
        want[r["doc_id"]] = _local_cut(t, rm, N)
    got = dict(X.scrub_against_gram_index(new, path).collect())
    assert got == want
    assert len(got) == len(new_rows), "whole batch must come back"
    assert any(got[d] != t for d, t in
               ((r["doc_id"], r["text"]) for r in new_rows)), "nothing cut — vacuous"

    # batch-boundary independence: two half-batches == the one-shot answer
    h0 = new.filter(F.col("doc_id").cast("long") % 2 == 0)
    h1 = new.filter(F.col("doc_id").cast("long") % 2 == 1)
    split = dict(X.scrub_against_gram_index(h0, path).collect())
    split.update(dict(X.scrub_against_gram_index(h1, path).collect()))
    assert split == got


def test_scrub_ingest_stream_matches_batch_and_replays_clean(spark, docs, tmp_path):
    old = docs.filter(F.col("doc_id").cast("long") % 3 != 0)
    new = docs.filter(F.col("doc_id").cast("long") % 3 == 0)
    path = str(tmp_path / "gramidx")
    X.write_gram_df_index(old, path, N)
    inp, out, chk = (str(tmp_path / d) for d in ("in", "out", "chk"))
    new.filter(F.col("doc_id").cast("long") % 2 == 0).write.parquet(
        inp, mode="overwrite")
    new.filter(F.col("doc_id").cast("long") % 2 == 1).write.parquet(
        inp, mode="append")
    stream = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(inp)
    q = X.scrub_ingest_stream(stream, path, out, chk)
    assert q.awaitTermination(120)
    want = sorted(map(tuple, X.scrub_against_gram_index(new, path).collect()))
    got = sorted(map(tuple,
                     spark.read.parquet(out).select("doc_id", "clean_text").collect()))
    assert got == want

    # full-replay drill: a FRESH checkpoint redelivers every file; the
    # replay guard must leave the output byte-identical (no duplicates)
    stream2 = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(inp)
    q2 = X.scrub_ingest_stream(stream2, path, out, str(tmp_path / "chk2"))
    assert q2.awaitTermination(120)
    got2 = sorted(map(tuple,
                      spark.read.parquet(out).select("doc_id", "clean_text").collect()))
    assert got2 == want


def test_gram_index_append_parity_and_pruning(spark, docs, tmp_path):
    """append_gram_df_index: parity vs scratch rebuild, two-batch
    associativity, empty-batch no-op, and bucket PRUNING (untouched
    bucket files are not rewritten)."""
    import glob
    import os

    old = docs.filter(F.col("doc_id").cast("long") % 3 != 0)
    new = docs.filter(F.col("doc_id").cast("long") % 3 == 0)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    X.write_gram_df_index(old, inc, N, n_buckets=64)
    pre = {p: os.path.getmtime(p)
           for p in glob.glob(f"{inc}/df/bucket=*/*.parquet")}
    # a single tiny doc touches FEW buckets — the pruning case
    one = new.orderBy("doc_id").limit(1)
    nb = X.append_gram_df_index(one, inc)
    assert 0 < nb < 64, f"one doc should touch a strict subset, got {nb}"
    post = {p: os.path.getmtime(p)
            for p in glob.glob(f"{inc}/df/bucket=*/*.parquet")}
    untouched = [p for p in pre if p in post and pre[p] == post[p]]
    assert untouched, "append must leave untouched bucket files alone"
    # the rest of the batch, then parity vs the scratch rebuild
    rest = new.join(one.select("doc_id"), "doc_id", "left_anti")
    X.append_gram_df_index(rest, inc)
    X.write_gram_df_index(docs, full, N, n_buckets=64)
    a = spark.read.parquet(f"{inc}/df").select("bucket", "gram", "df")
    b = spark.read.parquet(f"{full}/df").select("bucket", "gram", "df")
    assert a.exceptAll(b).unionByName(b.exceptAll(a)).count() == 0
    # empty batch: no-op, no buckets rewritten
    assert X.append_gram_df_index(new.filter(F.lit(False)), inc) == 0


def test_gram_df_stream_deltas_replay_and_compaction(spark, docs, tmp_path):
    """Streaming gram-df maintenance: exactly-once delta commits, live
    reads through pending deltas, full-replay idempotence, torn-commit
    recovery, and compaction byte-parity."""
    import glob
    import os

    old = docs.filter(F.col("doc_id").cast("long") % 3 != 0)
    new = docs.filter(F.col("doc_id").cast("long") % 3 == 0)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    X.write_gram_df_index(old, inc, N, n_buckets=32)
    X.write_gram_df_index(docs, full, N, n_buckets=32)
    want = sorted(map(tuple, spark.read.parquet(f"{full}/df")
                      .select("bucket", "gram", "df").collect()))

    inp = str(tmp_path / "in")
    new.filter(F.col("doc_id").cast("long") % 2 == 0).write.parquet(
        inp, mode="overwrite")
    new.filter(F.col("doc_id").cast("long") % 2 == 1).write.parquet(
        inp, mode="append")
    stream = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(inp)
    q = X.gram_df_index_stream(stream, inc, str(tmp_path / "chk"))
    assert q.awaitTermination(120)
    deltas = sorted(glob.glob(f"{inc}/delta/batch=*"))
    assert len(deltas) >= 2, "two source files must give two delta commits"

    def live():
        return sorted(map(tuple, X._gram_df_table(spark, inc, list(range(32)))
                          .collect()))
    assert live() == want, "live table (base + deltas) != scratch rebuild"

    # full-replay drill: fresh checkpoint redelivers every file; the
    # _SUCCESS probes must skip every commit, leaving the table unchanged
    stream2 = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(inp)
    q2 = X.gram_df_index_stream(stream2, inc, str(tmp_path / "chk2"))
    assert q2.awaitTermination(120)
    assert sorted(glob.glob(f"{inc}/delta/batch=*")) == deltas
    assert live() == want

    # torn-commit recovery: strip a commit's _SUCCESS (a crash mid-write),
    # then replay the whole stream on a fresh checkpoint — the torn batch
    # is rewritten (same source order => same content), the rest skipped
    os.remove(f"{deltas[0]}/_SUCCESS")
    stream3 = spark.readStream.schema(new.schema).option(
        "maxFilesPerTrigger", "1").parquet(inp)
    q3 = X.gram_df_index_stream(stream3, inc, str(tmp_path / "chk3"))
    assert q3.awaitTermination(120)
    assert os.path.exists(f"{deltas[0]}/_SUCCESS"), "torn commit not rewritten"
    assert live() == want

    # compaction folds the deltas into the base byte-identically
    assert X.compact_gram_df_index(spark, inc) == len(deltas)
    assert glob.glob(f"{inc}/delta/batch=*") == []
    assert live() == want
    assert X.compact_gram_df_index(spark, inc) == 0  # nothing pending


def test_gram_index_remove(spark, docs, tmp_path):
    """remove_gram_df_index: removal parity vs a rebuild of the survivors,
    emptied-bucket directory cleanup, negative-df refusal, and the
    pending-deltas guard."""
    import glob

    old = docs.filter(F.col("doc_id").cast("long") % 3 != 0)
    new = docs.filter(F.col("doc_id").cast("long") % 3 == 0)
    allp, oldp = str(tmp_path / "all"), str(tmp_path / "oldonly")
    X.write_gram_df_index(docs, allp, N, n_buckets=16)
    X.write_gram_df_index(old, oldp, N, n_buckets=16)
    assert X.remove_gram_df_index(new, allp) > 0
    a = spark.read.parquet(f"{allp}/df").select("bucket", "gram", "df")
    b = spark.read.parquet(f"{oldp}/df").select("bucket", "gram", "df")
    assert a.exceptAll(b).unionByName(b.exceptAll(a)).count() == 0
    # removing docs that were never counted must refuse, not clamp
    with pytest.raises(ValueError, match="negative"):
        X.remove_gram_df_index(new, oldp)
    # removing EVERYTHING empties the table — emptied bucket dirs dropped
    X.remove_gram_df_index(old, allp)
    assert glob.glob(f"{allp}/df/bucket=*") == []
    # pending delta commits block removal (compact first)
    X.append_gram_df_delta(new, oldp, 0)
    with pytest.raises(ValueError, match="compact first"):
        X.remove_gram_df_index(old, oldp)
    X.compact_gram_df_index(spark, oldp)
    X.remove_gram_df_index(new, oldp)  # now fine: new was folded in


def test_dup_gram_spectrum_vs_local(spark, docs):
    rows = docs.collect()

    def local(L):
        occ = {}  # gram -> (set(docs), n_positions)
        for r in rows:
            t = r["text"]
            for i in range(len(t) - L + 1):
                g = t[i:i + L]
                d, c = occ.get(g, (set(), 0))
                d.add(r["doc_id"])
                occ[g] = (d, c + 1)
        dup = {g: v for g, v in occ.items() if len(v[0]) >= 2}
        docs_hit = set().union(*(v[0] for v in dup.values())) if dup else set()
        return (len(dup), sum(v[1] for v in dup.values()), len(docs_hit))

    got = {
        r["gram_len"]: (r["n_dup_grams"], r["n_dup_positions"],
                        r["n_docs_with_dup"])
        for r in X.dup_gram_spectrum(docs, [8, 24, 2000]).collect()
    }
    assert set(got) == {8, 24, 2000}
    for L in (8, 24):
        assert got[L] == local(L)
    # a length beyond every doc emits an explicit all-zero row, not nothing
    assert got[2000] == (0, 0, 0)
    # spectrum is monotone non-increasing in dup mass
    assert got[8][1] >= got[24][1]
    with pytest.raises(ValueError, match="lengths"):
        X.dup_gram_spectrum(docs, [0])
