"""Content-defined chunking (operators/cdc.py): boundary determinism,
reconstruction, edit-locality, dedup accounting."""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_spark.operators.cdc import (
    cdc_chunks,
    cdc_dedup_stats,
    cdc_global_dedup,
    cdc_shared_chunk_pairs,
    chunk_starts,
    _FNV_PRIME,
    _P64,
)
from hierarchical_bloom_filter_index_spark.sketches.hashing import hash64

W, BITS, SEED = 8, 4, 41


def _brute_starts(text, window=W, bits=BITS, seed=SEED):
    """Per-position scalar re-derivation of the boundary rule."""
    n = len(text)
    if n == 0:
        return []
    if n < window:
        return [0]
    starts = [0]
    for e in range(window - 1, n):
        key = 0
        for j in range(window):
            key = (key + ord(text[e - window + 1 + j])
                   * pow(_FNV_PRIME, window - 1 - j, _P64)) % _P64
        h = int(hash64(np.array([key], dtype=np.uint64), seed)[0])
        if h & ((1 << bits) - 1) == 0 and e + 1 < n:
            starts.append(e + 1)
    return starts


TEXTS = [
    "",
    "ab",
    "x" * 7,
    "hash join table scan filter sort merge " * 8,
    "the quick brown fox jumps over the lazy dog " * 5,
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "unicode éè€ tail with enough length to chunk 你好 world " * 4,
]


def test_kernel_matches_brute_force():
    for t in TEXTS:
        assert chunk_starts(t, W, BITS, SEED) == _brute_starts(t), t[:30]


def test_reconstruction_and_monotone():
    for t in TEXTS:
        starts = chunk_starts(t, W, BITS, SEED)
        if not t:
            assert starts == []
            continue
        assert starts[0] == 0
        assert starts == sorted(set(starts))
        pieces = [t[s:e] for s, e in zip(starts, starts[1:] + [len(t)])]
        assert "".join(pieces) == t
        assert all(pieces)  # never an empty chunk


def test_edit_locality_append():
    """Appending a suffix never moves cuts ending > window-1 chars before
    the old end — the property fixed-size chunking lacks."""
    base = "sort merge join hash scan filter value column " * 6
    ext = base + " appended tail content here"
    a = chunk_starts(base, W, BITS, SEED)
    b = chunk_starts(ext, W, BITS, SEED)
    stable = [s for s in a if s <= len(base) - W]
    assert b[: len(stable)] == stable


def test_short_and_empty_docs():
    assert chunk_starts("", W, BITS, SEED) == []
    assert chunk_starts("abc", W, BITS, SEED) == [0]  # < window: one chunk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, TEXTS[i % len(TEXTS)] + f" doc{i} suffix padding words", f"s{i % 3}")
            for i in range(40)]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_spark_chunks_match_kernel(spark, docs):
    out = cdc_chunks(docs, window=W, mask_bits=BITS, seed=SEED).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.char_start, r.chunk))
    for did, text, _src in docs.collect():
        starts = chunk_starts(text, W, BITS, SEED)
        exp = [(k, s, text[s:(starts[k + 1] if k + 1 < len(starts) else len(text))])
               for k, s in enumerate(starts)]
        assert sorted(got.get(did, [])) == exp


def test_partitioning_invariance(spark, docs):
    a = cdc_chunks(docs.repartition(1), window=W, mask_bits=BITS, seed=SEED)
    b = cdc_chunks(docs.repartition(7, "source"), window=W, mask_bits=BITS, seed=SEED)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dedup_stats_exact(spark, docs):
    chunks = cdc_chunks(docs, window=W, mask_bits=BITS, seed=SEED)
    pdf = chunks.toPandas()
    stats = {r["source"]: r for _, r in cdc_dedup_stats(chunks).toPandas().iterrows()}
    for src, grp in pdf.groupby("source"):
        r = stats[src]
        assert r["n_chunks"] == len(grp)
        assert r["total_chars"] == grp["chunk"].str.len().sum()
        uniq = grp["chunk"].drop_duplicates()
        assert r["n_distinct_chunks"] == len(uniq)
        assert r["distinct_chars"] == uniq.str.len().sum()
    g = cdc_global_dedup(chunks).collect()[0]
    assert g.n_chunks == len(pdf)
    assert g.n_distinct_chunks == pdf["chunk"].nunique()


def test_shared_chunk_pairs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta " * 4, "s"),
        (1, "alpha beta gamma delta epsilon zeta eta theta " * 4 + "tail!", "s"),
        (2, "completely different content with no overlap at all here", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    chunks = cdc_chunks(docs, window=W, mask_bits=BITS, seed=SEED)
    pairs = {(r.doc_a, r.doc_b): r.n_shared
             for r in cdc_shared_chunk_pairs(chunks, min_shared=2).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert not any(2 in p for p in pairs)


def test_param_validation(spark, docs):
    with pytest.raises(ValueError):
        cdc_chunks(docs, window=1)
    with pytest.raises(ValueError):
        cdc_chunks(docs, mask_bits=0)


# ---------------------------------------------------------------------------
# persisted chunk store lifecycle
# ---------------------------------------------------------------------------
def _store_rows(spark, path):
    from hierarchical_bloom_filter_index_spark.operators.cdc import read_chunk_store
    return sorted(map(tuple, read_chunk_store(spark, path).collect()))


def test_chunk_store_build_append_remove(spark, docs, tmp_path):
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        append_chunk_store, cdc_chunks, cdc_dedup_stats, chunk_store_stats,
        remove_chunk_store, write_chunk_store)

    old = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    inc, full, oldonly = (str(tmp_path / p) for p in ("inc", "full", "old"))
    write_chunk_store(old, inc, window=W, mask_bits=BITS, seed=SEED, n_buckets=8)
    n_touched = append_chunk_store(new, inc)
    assert n_touched > 0
    write_chunk_store(docs, full, window=W, mask_bits=BITS, seed=SEED, n_buckets=8)
    assert _store_rows(spark, inc) == _store_rows(spark, full)

    # stats through the store == stats from scratch chunks
    a = sorted(map(tuple, chunk_store_stats(spark, full).collect()))
    b = sorted(map(tuple, cdc_dedup_stats(
        cdc_chunks(docs, W, BITS, SEED)).collect()))
    assert a == b

    # removal restores the old-only store byte-for-byte
    assert remove_chunk_store(new, full) > 0
    write_chunk_store(old, oldonly, window=W, mask_bits=BITS, seed=SEED, n_buckets=8)
    assert _store_rows(spark, full) == _store_rows(spark, oldonly)


def test_chunk_store_remove_refuses_uncounted(spark, docs, tmp_path):
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        remove_chunk_store, write_chunk_store)

    path = str(tmp_path / "s")
    write_chunk_store(docs.filter("doc_id < 5"), path,
                      window=W, mask_bits=BITS, seed=SEED, n_buckets=4)
    alien = spark.createDataFrame(
        [(999, "text never counted in this store at all", "sX")],
        "doc_id bigint, text string, source string")
    with pytest.raises(Exception, match="negative|never"):
        remove_chunk_store(alien, path)


def test_chunk_store_append_associates(spark, docs, tmp_path):
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        append_chunk_store, write_chunk_store)

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    base = docs.filter("doc_id < 10")
    b1 = docs.filter("doc_id >= 10 and doc_id < 25")
    b2 = docs.filter("doc_id >= 25")
    write_chunk_store(base, a, window=W, mask_bits=BITS, seed=SEED, n_buckets=8)
    write_chunk_store(base, b, window=W, mask_bits=BITS, seed=SEED, n_buckets=8)
    append_chunk_store(b1, a)
    append_chunk_store(b2, a)
    append_chunk_store(b1.unionByName(b2), b)
    assert _store_rows(spark, a) == _store_rows(spark, b)


def test_chunk_store_stream_ingest(spark, docs, tmp_path):
    import glob

    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        append_chunk_store_delta, chunk_store_ingest_stream,
        chunk_store_table, compact_chunk_store, remove_chunk_store,
        write_chunk_store)

    base_docs = docs.filter("doc_id < 20")
    s1 = docs.filter("doc_id >= 20 and doc_id < 30")
    s2 = docs.filter("doc_id >= 30")
    path, full = str(tmp_path / "store"), str(tmp_path / "full")
    write_chunk_store(base_docs, path, window=W, mask_bits=BITS, seed=SEED,
                      n_buckets=8)
    in_dir, chk = str(tmp_path / "in"), str(tmp_path / "chk")
    s1.coalesce(1).write.mode("overwrite").parquet(in_dir)
    s2.coalesce(1).write.mode("append").parquet(in_dir)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(in_dir))
    q = chunk_store_ingest_stream(stream, path, chk)
    assert q.awaitTermination(180)

    write_chunk_store(docs, full, window=W, mask_bits=BITS, seed=SEED,
                      n_buckets=8)
    live = sorted(map(tuple, chunk_store_table(spark, path).collect()))
    assert live == _store_rows(spark, full)

    # base rewrite refused while deltas pend
    with pytest.raises(ValueError, match="pending"):
        remove_chunk_store(s1, path)

    # replay drill: re-committing an existing batch id is a no-op
    committed = sorted(glob.glob(f"{path}/delta/batch=*"))
    assert committed
    bid = int(committed[0].rsplit("=", 1)[1])
    assert append_chunk_store_delta(s1, path, bid) is False
    assert sorted(map(tuple, chunk_store_table(spark, path).collect())) == live

    # compaction folds deltas; live table identical before/after
    assert compact_chunk_store(spark, path) >= 1
    assert not glob.glob(f"{path}/delta/batch=*")
    assert sorted(map(tuple, chunk_store_table(spark, path).collect())) == live
    assert _store_rows(spark, path) == live


def test_shared_pairs_df_cap(spark):
    # one boilerplate chunk shared by ALL docs must not force k^2 pairs
    boiler = "zqxwvutsrqponmlk jihgfedcba zyxw "  # long enough to chunk
    rows = [(i, boiler + f"unique tail {i} " * 3, "s") for i in range(12)]
    rows += [(100, "alpha beta gamma delta " * 6, "s"),
             (101, "alpha beta gamma delta " * 6 + "x", "s")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        cdc_chunks, cdc_shared_chunk_pairs)

    chunks = cdc_chunks(docs, window=W, mask_bits=BITS, seed=SEED)
    full = {tuple(r[:2]) for r in
            cdc_shared_chunk_pairs(chunks, min_shared=1).collect()}
    capped = {tuple(r[:2]) for r in
              cdc_shared_chunk_pairs(chunks, min_shared=1,
                                     max_chunk_df=4).collect()}
    assert capped <= full
    # the 100/101 near-dup pair survives (their shared chunks are rare)
    assert (100, 101) in capped
    # boilerplate-only pairs are gone
    assert len(capped) < len(full)
    with pytest.raises(ValueError):
        cdc_shared_chunk_pairs(chunks, max_chunk_df=1)


def test_topk_similar_pairs(spark):
    from fractions import Fraction

    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        cdc_chunks, cdc_topk_similar_pairs)

    rows = [(i, TEXTS[3] + f" tail{i} " * (i % 4), "s") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    chunks = cdc_chunks(docs, window=W, mask_bits=BITS, seed=SEED)
    pdf = chunks.toPandas()
    sets = {d: set(g["chunk"]) for d, g in pdf.groupby("doc_id")}
    brute = []
    for a in sets:
        for b in sets:
            if a < b:
                sh = len(sets[a] & sets[b])
                un = len(sets[a] | sets[b])
                if sh >= 2:
                    brute.append((sh * 10**9 // un, a, b, sh, un))
    brute.sort(key=lambda t: (-t[0], t[1], t[2]))
    got = [(r.jaccard_x1e9, r.doc_a, r.doc_b, r.n_shared, r.n_union)
           for r in cdc_topk_similar_pairs(chunks, k=5).collect()]
    assert got == [(j, a, b, sh, un) for j, a, b, sh, un in brute[:5]]
    with pytest.raises(ValueError):
        cdc_topk_similar_pairs(chunks, k=0)


def test_chunk_novelty_values_and_pruning(spark, docs, tmp_path):
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        cdc_chunks, chunk_novelty_against_store, write_chunk_store)

    old = docs.filter("doc_id < 25")
    new = docs.filter("doc_id >= 25")
    path = str(tmp_path / "cs")
    write_chunk_store(old, path, window=W, mask_bits=BITS, seed=SEED,
                      n_buckets=16)
    out = chunk_novelty_against_store(new, path)
    # brute force from scratch chunk sets
    old_set = set(cdc_chunks(old, W, BITS, SEED).toPandas()["chunk"])
    new_pdf = cdc_chunks(new, W, BITS, SEED).toPandas()
    got = {r.doc_id: r for r in out.collect()}
    for did, grp in new_pdf.groupby("doc_id"):
        cs = set(grp["chunk"])
        known = {c for c in cs if c in old_set}
        r = got[did]
        assert (r.n_chunks, r.n_known_chunks) == (len(cs), len(known))
        assert r.known_chars == sum(len(c) for c in known)
    # the store read must prune bucket partitions (never a full-store scan)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan or "bucket#" in plan.split(
        "PartitionFilters")[1][:200]


def test_batch_kernel_matches_per_doc():
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        batch_chunk_starts)

    batch = TEXTS + ["", "ab", "x" * 7, TEXTS[3] + "tail", "你好" * 30]
    got = batch_chunk_starts(batch, W, BITS, SEED)
    assert got == [chunk_starts(t, W, BITS, SEED) for t in batch]
    # all-short batch (no valid window anywhere)
    assert batch_chunk_starts(["ab", "", "xyz"], W, BITS, SEED) == [[0], [], [0]]


def test_write_chunk_store_refuses_empty_corpus(spark, tmp_path):
    """Review fix: an empty corpus would write a refs dir with no parquet
    files — unreadable forever (no inferable schema). Refuse loudly."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import (
        write_chunk_store)

    empty = spark.createDataFrame(
        [], "doc_id string, text string, source string")
    with pytest.raises(ValueError, match="non-empty"):
        write_chunk_store(empty, str(tmp_path / "cs"))
    blank = spark.createDataFrame(
        [("0", "", "s0")], "doc_id string, text string, source string")
    with pytest.raises(ValueError, match="non-empty"):
        write_chunk_store(blank, str(tmp_path / "cs2"))
