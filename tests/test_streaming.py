"""Streaming lifecycle: batch-incremental append == full rebuild; whole-window
eviction predicate; Structured Streaming foreachBatch maintenance."""

import os
import time

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import build_index
from hierarchical_bloom_filter_index_spark.streaming.incremental import (
    append_increment,
    expire,
    incremental_index_stream,
)

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=9)


def _state(df):
    return sorted(
        (r["doc_id"], r["level"], r["w_id"], bytes(r["bloom"]))
        for r in df.select("doc_id", "level", "w_id", "bloom").collect()
    )


def test_append_increment_equals_rebuild(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=3).cache()
    old = corp.filter(F.col("source") != "markov")
    new = corp.filter(F.col("source") == "markov")
    idx_old = build_index(old, CFG)
    combined = append_increment(idx_old, new, CFG)
    assert _state(combined) == _state(build_index(corp, CFG))


def test_expire_scales_horizon_per_level(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=3)
    cfg = CFG.with_(axis="global")
    idx = build_index(corp, cfg).cache()
    horizon = 64  # leaf windows below 64 evicted
    kept = expire(idx, cfg, horizon)
    rows = kept.groupBy("level").agg(F.min("w_id").alias("mn")).collect()
    for r in rows:
        assert r["mn"] >= horizon >> (cfg.deepest - r["level"])
    # nothing above the horizon was dropped
    assert kept.count() == idx.filter(
        F.expr(f"w_id >= shiftright(CAST({horizon} AS BIGINT), {cfg.deepest} - level)")
    ).count()


def test_structured_streaming_foreachbatch(spark, tmp_path):
    inp = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    corp = C.generate_corpus(spark, sf=0.002, seed=4).cache()
    b1 = corp.filter(F.col("source") == "uniform")
    b2 = corp.filter(F.col("source") == "blocks")

    b1.write.mode("append").parquet(inp)
    q = incremental_index_stream(spark, inp, chk, out, CFG)
    q.awaitTermination(120)

    b2.write.mode("append").parquet(inp)
    q = incremental_index_stream(spark, inp, chk, out, CFG)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expected = build_index(b1.unionByName(b2), CFG)
    assert got.count() == expected.count()
    # exactly-once: batch 2 only processed the new files
    assert got.select("batch_id").distinct().count() == 2
    gs = sorted((r["doc_id"], r["level"], r["w_id"]) for r in got.collect())
    es = sorted((r["doc_id"], r["level"], r["w_id"]) for r in expected.collect())
    assert gs == es


def _gstate(df):
    return sorted(
        (r["level"], r["w_id"], bytes(r["bloom"]), r["n_items"], r["bits_set"])
        for r in df.select("level", "w_id", "bloom", "n_items", "bits_set").collect()
    )


@pytest.mark.parametrize("ngram", [1, 3])
def test_append_increment_global_equals_rebuild(spark, ngram):
    """Offset continuation + boundary re-merge must reproduce the
    from-scratch global index byte-for-byte (insert() parity,
    PMIndex/HBI.java:215-267), including boundary-crossing n-grams the first
    build could not see."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        append_increment_global,
        stream_state,
    )

    cfg = HbiConfig(
        tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=9, axis="global",
        ngram=ngram, ngram_base_bits=21 if ngram == 1 else 12,
    )
    full = C.generate_corpus(spark, sf=0.002, seed=21).cache()
    old = full.filter(F.col("doc_id") < "u").cache()     # doc_id-order prefix
    new = full.filter(F.col("doc_id") >= "u").cache()

    old_corp = with_global_offsets(old).cache()
    idx0 = build_index(old_corp, cfg)
    st0 = stream_state(old_corp, cfg)
    assert st0.total_tokens == old.agg(F.sum("n_tok")).first()[0]
    assert len(st0.tail) == (ngram - 1 if ngram > 1 else 0)

    idx1, st1 = append_increment_global(idx0, new, cfg, st0)
    rebuilt = build_index(with_global_offsets(full), cfg)
    assert _gstate(idx1) == _gstate(rebuilt)
    assert st1.total_tokens == full.agg(F.sum("n_tok")).first()[0]

    # appending an empty batch is the identity
    empty = spark.createDataFrame([], C.CORPUS_SCHEMA)
    idx2, st2 = append_increment_global(idx1, empty, cfg, st1)
    assert st2.total_tokens == st1.total_tokens
    for df in (full, old, new, old_corp):
        df.unpersist()


def test_append_increment_global_short_boundary_docs(spark):
    """Boundary docs shorter than ngram-1: the carried tail spans multiple
    old docs and the batch's first docs are tiny — equality must hold."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        append_increment_global,
        stream_state,
    )

    cfg = HbiConfig(tree_span=16, leaf_span=4, fpr=0.02, vocab=64, seed=5,
                    axis="global", ngram=3, ngram_base_bits=8)
    docs = [
        ("a0", [1, 2, 3, 4, 5], 5, "s"),
        ("a1", [6], 1, "s"),
        ("a2", [7], 1, "s"),     # old stream ends in two 1-token docs
        ("b0", [8], 1, "s"),
        ("b1", [9, 10, 11, 12], 4, "s"),
    ]
    full = spark.createDataFrame(docs, C.CORPUS_SCHEMA)
    old = full.filter(F.col("doc_id") < "b")
    new = full.filter(F.col("doc_id") >= "b")
    old_corp = with_global_offsets(old)
    idx0 = build_index(old_corp, cfg)
    st0 = stream_state(old_corp, cfg)
    assert st0.tail == [6, 7]    # spans docs a1+a2
    idx1, _ = append_increment_global(idx0, new, cfg, st0)
    rebuilt = build_index(with_global_offsets(full), cfg)
    assert _gstate(idx1) == _gstate(rebuilt)


def test_structured_streaming_global_axis(spark, tmp_path):
    """Global-axis Structured Streaming maintenance: micro-batches (one file
    each, arriving in stream order) run append_increment_global with a
    committed continuation state; the final versioned index is byte-equal to
    a from-scratch build over everything ingested, across TWO separate
    streaming runs sharing the checkpoint (restart semantics)."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        incremental_global_index_stream,
        read_global_stream_index,
    )

    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=9,
                    axis="global", ngram=3, ngram_base_bits=12)
    inp = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    work = str(tmp_path / "idx")
    os.makedirs(inp)
    full = C.generate_corpus(spark, sf=0.002, seed=33).cache()
    ids = sorted(r["doc_id"] for r in full.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    parts = [
        full.filter(F.col("doc_id") < c1),
        full.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        full.filter(F.col("doc_id") >= c2),
    ]
    # one file per batch, mtimes spaced out: the file source orders new files
    # by modification time, so the stream arrives in doc_id order
    for p in parts[:2]:
        p.coalesce(1).write.mode("append").parquet(inp)
        time.sleep(1.1)

    q = incremental_global_index_stream(spark, inp, chk, work, cfg)
    q.awaitTermination(180)
    idx, st = read_global_stream_index(spark, work)
    two = parts[0].unionByName(parts[1])
    assert _gstate(idx) == _gstate(build_index(with_global_offsets(two), cfg))
    assert st.total_tokens == two.agg(F.sum("n_tok")).first()[0]
    assert len(st.tail) == cfg.ngram - 1

    # restart: the third file lands, a NEW query on the same checkpoint
    # resumes from the committed state and appends exactly once
    parts[2].coalesce(1).write.mode("append").parquet(inp)
    q = incremental_global_index_stream(spark, inp, chk, work, cfg)
    q.awaitTermination(180)
    idx, st = read_global_stream_index(spark, work)
    scratch = _gstate(build_index(with_global_offsets(full), cfg))
    assert _gstate(idx) == scratch
    assert st.total_tokens == full.agg(F.sum("n_tok")).first()[0]

    # DELTA property: later commits persist only boundary+batch windows,
    # never the whole index
    n_full = len(scratch)
    for v in (1, 2):
        n_delta = spark.read.parquet(f"{work}/v{v}").count()
        assert 0 < n_delta < n_full

    # TIME TRAVEL: reading at version k reproduces the index exactly as of
    # commit k (byte-equal to a from-scratch build over the first k+1
    # batches) plus that commit's continuation snapshot
    for v, pref in ((0, parts[0]), (1, two)):
        idx_v, st_v = read_global_stream_index(spark, work, version=v)
        assert _gstate(idx_v) == _gstate(build_index(with_global_offsets(pref), cfg))
        assert st_v.total_tokens == pref.agg(F.sum("n_tok")).first()[0]
        assert len(st_v.tail) == cfg.ngram - 1
    with pytest.raises(ValueError, match="not retained"):
        read_global_stream_index(spark, work, version=7)
    # compaction folds every version into one; answers unchanged
    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        compact_global_stream_index,
    )

    compact_global_stream_index(spark, work)
    idx2, st2 = read_global_stream_index(spark, work)
    assert _gstate(idx2) == scratch and st2.total_tokens == st.total_tokens
    # compaction = snapshot expiry: historical versions are gone
    with pytest.raises(ValueError, match="not retained"):
        read_global_stream_index(spark, work, version=1)
    full.unpersist()


def test_expire_segments_metadata_only(spark, tmp_path):
    """(level, w_seg)-partitioned persistence turns expire into a DIRECTORY
    DROP: fully-expired segments are physically removed (no data rewrite),
    and the read-back rows equal streaming.expire() over the live table —
    the Iceberg drop-partition/snapshot-expiry analog on plain parquet."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.sources.io import (
        expire_segments,
        read_index_expired,
        write_index_segmented,
    )

    cfg = CFG.with_(axis="global")
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=5))
    idx = build_index(corp, cfg).cache()
    path = str(tmp_path / "segidx")
    write_index_segmented(idx, path, seg_bits=2)  # tiny segments: some must drop
    n_leaf = idx.filter(F.col("level") == CFG.deepest).count()
    horizon = int(n_leaf // 2)
    dropped = expire_segments(spark, path, cfg, horizon, seg_bits=2)
    assert dropped > 0

    def rows(df):
        return sorted(
            (r["level"], r["w_id"], bytes(r["bloom"]))
            for r in df.select("level", "w_id", "bloom").collect()
        )

    got = rows(read_index_expired(spark, path, cfg, horizon))
    exp = rows(expire(idx, cfg, horizon))
    assert got == exp and len(exp) > 0
    # and something strictly older was evicted
    assert idx.count() > len(exp)
    idx.unpersist()


def _sstate(df):
    return sorted(
        (r["level"], r["w_id"], bytes(r["sketch"]))
        for r in df.select("level", "w_id", "sketch").collect()
    )


def test_structured_streaming_window_sketch_index(spark, tmp_path):
    """Sketch-family delta-commit streaming: each micro-batch commits only
    the boundary-suffix delta (rollup.global_window_append_delta), the
    reassembled index is BYTE-equal to a from-scratch batch build after
    every drain (CMS add and HLL max are order-independent; nodes keep
    their canonical sparse/dense form across the append path), restarts
    resume from the committed state, version reads time-travel, and
    compaction folds history. KLL (order-dependent merge bytes) is checked
    via its EXACT window item counts instead."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_cms_window_index,
        build_global_hll_window_index,
        build_global_kll_window_index,
        global_kll_window_totals,
    )
    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        compact_global_window_sketch_stream,
        incremental_global_window_sketch_stream,
        read_global_window_sketch_stream,
    )

    cfg = HbiConfig(tree_span=256, leaf_span=32, vocab=4096, seed=9, axis="global")
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    full = C.generate_corpus(spark, sf=0.002, seed=47).cache()
    ids = sorted(r["doc_id"] for r in full.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    parts = [
        full.filter(F.col("doc_id") < c1),
        full.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        full.filter(F.col("doc_id") >= c2),
    ]
    for p in parts[:2]:
        p.coalesce(1).write.mode("append").parquet(inp)
        time.sleep(1.1)

    def run(family, tag):
        q = incremental_global_window_sketch_stream(
            spark, inp, str(tmp_path / f"chk_{tag}"), str(tmp_path / f"w_{tag}"),
            cfg, family=family,
        )
        assert q.awaitTermination(180)
        return read_global_window_sketch_stream(spark, str(tmp_path / f"w_{tag}"))

    two = parts[0].unionByName(parts[1])
    n_two = two.agg(F.sum("n_tok")).first()[0]

    # CMS: full lifecycle
    idx, total = run("cms", "cms")
    ref2 = build_global_cms_window_index(with_global_offsets(two), cfg)
    assert _sstate(idx) == _sstate(ref2) and total == n_two

    # restart: third file lands, new query on the same checkpoint resumes
    parts[2].coalesce(1).write.mode("append").parquet(inp)
    idx, total = run("cms", "cms")
    ref_full = build_global_cms_window_index(with_global_offsets(full), cfg)
    scratch = _sstate(ref_full)
    assert _sstate(idx) == scratch
    assert total == full.agg(F.sum("n_tok")).first()[0]

    # DELTA property: later commits persist only boundary+batch windows
    for v in (1, 2):
        n_delta = spark.read.parquet(str(tmp_path / "w_cms" / f"sv{v}")).count()
        assert 0 < n_delta < len(scratch)

    # TIME TRAVEL: version k == batch build over the first k+1 chunks
    ref1 = build_global_cms_window_index(with_global_offsets(parts[0]), cfg)
    for v, pref_idx, pref_df in ((0, ref1, parts[0]), (1, ref2, two)):
        idx_v, tot_v = read_global_window_sketch_stream(
            spark, str(tmp_path / "w_cms"), version=v
        )
        assert _sstate(idx_v) == _sstate(pref_idx)
        assert tot_v == pref_df.agg(F.sum("n_tok")).first()[0]
    with pytest.raises(ValueError, match="not retained"):
        read_global_window_sketch_stream(spark, str(tmp_path / "w_cms"), version=7)

    # compaction folds versions; answers unchanged, history expired
    compact_global_window_sketch_stream(spark, str(tmp_path / "w_cms"))
    idx_c, tot_c = read_global_window_sketch_stream(spark, str(tmp_path / "w_cms"))
    assert _sstate(idx_c) == scratch and tot_c == total
    with pytest.raises(ValueError, match="not retained"):
        read_global_window_sketch_stream(spark, str(tmp_path / "w_cms"), version=1)

    # HLL: byte-equal after one drain over all three files
    idx_h, tot_h = run("hll", "hll")
    ref_h = build_global_hll_window_index(with_global_offsets(full), cfg)
    assert _sstate(idx_h) == _sstate(ref_h)

    # KLL: merge bytes are order-dependent — compare the EXACT per-window
    # item counts (and the bound-level contract is covered in test_rollup)
    idx_k, tot_k = run("kll", "kll")
    ref_k = build_global_kll_window_index(with_global_offsets(full), cfg)
    assert sorted(map(tuple, global_kll_window_totals(idx_k).collect())) == \
        sorted(map(tuple, global_kll_window_totals(ref_k).collect()))

    # MG: byte-equal after one drain — with k >= leaf_span a leaf merge
    # never prunes (nnz <= span), so boundary re-merges are pure sums and
    # every parent merges the SAME two child blobs as the scratch build
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_mg_window_index,
    )

    idx_m, _tot_m = run("mg", "mg")
    ref_m = build_global_mg_window_index(with_global_offsets(full), cfg)
    assert _sstate(idx_m) == _sstate(ref_m)

    # BK: byte-equal after one drain — a bottom-k node is a pure function of
    # its window's DISTINCT-token set, so the append path's boundary
    # re-merges reproduce the scratch bytes exactly regardless of how the
    # stream was chunked
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_bk_window_index,
    )

    idx_b, _tot_b = run("bk", "bk")
    ref_b = build_global_bk_window_index(with_global_offsets(full), cfg)
    assert _sstate(idx_b) == _sstate(ref_b)

    # CS: byte-equal after one drain — count-sketch is linear like CMS, and
    # the sparse/dense node rule is a pure function of content, so the
    # delta-commit path reproduces the scratch bytes exactly
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_cs_window_index,
    )

    idx_s, _tot_s = run("cs", "cs")
    ref_s = build_global_cs_window_index(with_global_offsets(full), cfg)
    assert _sstate(idx_s) == _sstate(ref_s)

    # TD: byte-equal after one drain — t-digest merges are order-free pure
    # functions of the centroid multiset (sketches/tdigest._compact), so the
    # boundary re-merges and recomputed ancestors reproduce the scratch
    # bytes exactly (the determinism KLL cannot promise)
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_td_window_index,
    )

    idx_t, _tot_t = run("td", "td")
    ref_t = build_global_td_window_index(with_global_offsets(full), cfg)
    assert _sstate(idx_t) == _sstate(ref_t)
    for r in (ref2, ref_full, ref1, ref_h, ref_k, ref_m, ref_b, ref_s, ref_t):
        r.unpersist()
    full.unpersist()


def test_compaction_crash_recovery(spark, tmp_path):
    """A compaction interrupted at its worst point (fold tmp + marker
    written, old delta dirs partially deleted, meta not yet swapped) must
    recover on the next read: _finish_fold completes the fold idempotently
    and the index reads back byte-equal to the pre-compaction state."""
    import json
    import shutil

    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        _FOLD_MARKER,
        _assemble_deltas,
        incremental_global_window_sketch_stream,
        read_global_window_sketch_stream,
    )

    cfg = HbiConfig(tree_span=256, leaf_span=32, vocab=4096, seed=9, axis="global")
    inp, work = str(tmp_path / "in"), str(tmp_path / "w")
    os.makedirs(inp)
    full = C.generate_corpus(spark, sf=0.002, seed=53).cache()
    ids = sorted(r["doc_id"] for r in full.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    full.filter(F.col("doc_id") < mid).coalesce(1).write.mode("append").parquet(inp)
    time.sleep(1.1)
    full.filter(F.col("doc_id") >= mid).coalesce(1).write.mode("append").parquet(inp)
    q = incremental_global_window_sketch_stream(
        spark, inp, str(tmp_path / "chk"), work, cfg, family="cms"
    )
    assert q.awaitTermination(180)
    before = _sstate(read_global_window_sketch_stream(spark, work)[0])

    # replicate _fold_deltas exactly up to its commit point (fold tmp +
    # marker), then crash mid-_finish_fold: sv1 deleted, sv0 still old,
    # meta not swapped
    meta = json.load(open(os.path.join(work, "SKETCH_STATE.json")))
    assert len(meta["boundaries"]) == 2
    folded = _assemble_deltas(spark, work, meta["boundaries"], meta["tree_span"],
                              meta["levels"], prefix="sv")
    folded.write.mode("overwrite").partitionBy("level").parquet(
        os.path.join(work, "sv0_compact_tmp")
    )
    new_meta = dict(meta)
    new_meta["boundaries"] = [0]
    new_meta["history"] = [meta["history"][-1]]
    with open(os.path.join(work, _FOLD_MARKER), "w") as f:
        json.dump({"prefix": "sv", "n_versions": 2,
                   "state_file": "SKETCH_STATE.json", "meta": new_meta}, f)
    shutil.rmtree(os.path.join(work, "sv1"))  # the "crash" left sv1 gone

    idx, total = read_global_window_sketch_stream(spark, work)  # recovers
    assert _sstate(idx) == before
    assert total == meta["total_tokens"]
    assert not os.path.exists(os.path.join(work, _FOLD_MARKER))
    assert not os.path.exists(os.path.join(work, "sv1"))
    meta2 = json.load(open(os.path.join(work, "SKETCH_STATE.json")))
    assert meta2["boundaries"] == [0]
    # a SECOND crash flavor: fold already moved, marker still present
    with open(os.path.join(work, _FOLD_MARKER), "w") as f:
        json.dump({"prefix": "sv", "n_versions": 1,
                   "state_file": "SKETCH_STATE.json", "meta": meta2}, f)
    idx2, _ = read_global_window_sketch_stream(spark, work)
    assert _sstate(idx2) == before
    assert not os.path.exists(os.path.join(work, _FOLD_MARKER))
    full.unpersist()


def test_doc_stream_replay_guard(spark, tmp_path):
    """foreachBatch is at-least-once: replaying batch 0 (fresh checkpoint,
    same output — the crash-between-append-and-commit shape) must NOT
    append a second copy of its rows."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    corp = C.generate_corpus(spark, sf=0.002, seed=6).cache()
    corp.coalesce(1).write.mode("append").parquet(inp)
    q = incremental_index_stream(spark, inp, str(tmp_path / "chk1"), out, CFG)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # a NEW checkpoint re-delivers the same file as batch 0 again
    q = incremental_index_stream(spark, inp, str(tmp_path / "chk2"), out, CFG)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1
    corp.unpersist()


def test_global_stream_rejects_geometry_and_family_drift(spark, tmp_path):
    """Resuming a stream work_dir with a different geometry (Bloom) or a
    different sketch family must refuse loudly instead of committing a
    corrupted index; empty first batches must not brick the work_dir."""
    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        incremental_global_index_stream,
        read_global_stream_index,
    )

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    corp = C.generate_corpus(spark, sf=0.002, seed=7).cache()
    gcfg = HbiConfig(tree_span=256, leaf_span=32, vocab=4096, seed=7, axis="global")
    # an EMPTY parquet file first: batch skipped, no bricked v0 dir
    corp.filter(F.lit(False)).coalesce(1).write.mode("append").parquet(inp)
    q = incremental_global_index_stream(spark, inp, str(tmp_path / "c0"), str(tmp_path / "w"), gcfg)
    q.awaitTermination(120)
    corp.coalesce(1).write.mode("append").parquet(inp)
    q = incremental_global_index_stream(spark, inp, str(tmp_path / "c1"), str(tmp_path / "w"), gcfg)
    q.awaitTermination(120)
    idx, _st = read_global_stream_index(spark, str(tmp_path / "w"))
    assert idx.count() > 0
    # geometry drift refused (exception surfaces as a failed stream)
    corp.limit(3).coalesce(1).write.mode("append").parquet(inp)
    bad = gcfg.with_(tree_span=1024)
    q = incremental_global_index_stream(spark, inp, str(tmp_path / "c2"), str(tmp_path / "w"), bad)
    with pytest.raises(Exception, match="geometry|corrupt"):
        q.awaitTermination(120)
        q.processAllAvailable()
    corp.unpersist()
