"""k-mismatch (approximate) pattern search: pigeonhole fragment pruning vs
brute-force Hamming scan on both axes — exact equality of position sets for
d in {0, 1, 2, 3}, mutated needles (the canonical use: a misspelled query
finding the clean occurrences), patterns longer than one window (fragment
offsets exercise the window-shift arithmetic), cross-doc approximate
matches on the global axis, and the d >= m / unprunable fallbacks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
from hierarchical_bloom_filter_index_spark.operators import (
    build_index,
    global_kmismatch_pattern_search,
    kmismatch_pattern_search,
    pattern_search,
)

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=77)
CFG_G = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=77, axis="global")


@pytest.fixture(scope="module")
def built(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=77).cache()
    idx = build_index(corp, CFG).cache()
    idx.count()
    yield corp, idx
    idx.unpersist()
    corp.unpersist()


@pytest.fixture(scope="module")
def built_global(spark):
    corp = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=78)).cache()
    corp.count()
    idx = build_index(corp, CFG_G).cache()
    idx.count()
    stream = np.concatenate(
        [np.asarray(r["tokens"], dtype=np.int64)
         for r in sorted(corp.collect(), key=lambda r: r["doc_id"])]
    )
    yield corp, idx, stream
    idx.unpersist()
    corp.unpersist()


def _brute_doc(corp, pattern, d):
    pat = np.asarray(pattern, dtype=np.int64)
    m = len(pat)
    want = set()
    for r in corp.select("doc_id", "tokens").collect():
        t = np.asarray(r["tokens"], dtype=np.int64)
        if len(t) < m:
            continue
        win = np.lib.stride_tricks.sliding_window_view(t, m)
        mism = (win != pat).sum(axis=1)
        for p in np.flatnonzero(mism <= d):
            want.add((r["doc_id"], int(p)))
    return want


def _brute_global(stream, pattern, d):
    pat = np.asarray(pattern, dtype=np.int64)
    m = len(pat)
    if len(stream) < m:
        return set()
    win = np.lib.stride_tricks.sliding_window_view(stream, m)
    return {int(p) for p in np.flatnonzero((win != pat).sum(axis=1) <= d)}


def _mutate(pat, positions, delta=1):
    out = list(int(t) for t in pat)
    for p in positions:
        out[p] = out[p] + delta
    return out


def _needle(corp, start=500, m=12):
    r = sorted(corp.select("doc_id", "tokens").collect(), key=lambda x: x["doc_id"])
    toks = [t for row in r for t in row["tokens"]]
    # take from one doc's interior so the needle definitely occurs
    for row in r:
        if len(row["tokens"]) >= start + m:
            return [int(t) for t in row["tokens"][start : start + m]]
    return [int(t) for t in toks[:m]]


@pytest.mark.parametrize("d", [0, 1, 2, 3])
def test_doc_axis_matches_brute(spark, built, d):
    corp, idx = built
    pat = _mutate(_needle(corp), list(range(d)))  # d planted mismatches
    got = {(r["doc_id"], r["pos"])
           for r in kmismatch_pattern_search(corp, idx, CFG, pat, d).collect()}
    want = _brute_doc(corp, pat, d)
    assert got == want
    if d > 0:
        assert len(want) > 0  # the mutated needle finds the clean original


def test_d0_equals_exact_search(spark, built):
    corp, idx = built
    pat = _needle(corp)
    km = {(r["doc_id"], r["pos"])
          for r in kmismatch_pattern_search(corp, idx, CFG, pat, 0).collect()}
    ex = {(r["doc_id"], r["pos"])
          for r in pattern_search(corp, idx, CFG, pat).collect()}
    assert km == ex and len(km) > 0


def test_long_pattern_fragment_offsets(spark, built):
    """m > leaf_span: fragment offsets exceed one window span, so the
    candidate-window shift (w - off//span - {0,1}) is actually exercised."""
    corp, idx = built
    pat = _mutate(_needle(corp, start=100, m=80), [7, 40])
    got = {(r["doc_id"], r["pos"])
           for r in kmismatch_pattern_search(corp, idx, CFG, pat, 2).collect()}
    want = _brute_doc(corp, pat, 2)
    assert got == want and len(want) > 0


def test_d_ge_m_returns_all_starts(spark, built):
    corp, idx = built
    pat = [1, 2, 3]
    got = kmismatch_pattern_search(corp, idx, CFG, pat, 3)
    n = corp.select(F.sum(F.greatest(F.size("tokens") - 2, F.lit(0)))).first()[0]
    assert got.count() == n


def test_absent_needle_prunes_to_empty(spark, built):
    corp, idx = built
    # vocab tokens are < 4096; an all-out-of-vocab pattern with d=1 still
    # needs 11 of 12 exact positions — no fragment can match
    pat = [90001 + i for i in range(12)]
    assert kmismatch_pattern_search(corp, idx, CFG, pat, 1).count() == 0


@pytest.mark.parametrize("d", [1, 2])
def test_global_axis_matches_brute(spark, built_global, d):
    corp, idx, stream = built_global
    start = 5000
    pat = _mutate([int(t) for t in stream[start : start + 12]], list(range(d)))
    got = {r["gpos"]
           for r in global_kmismatch_pattern_search(corp, idx, CFG_G, pat, d).collect()}
    want = _brute_global(stream, pat, d)
    assert got == want and start in got


def test_global_cross_doc_approx_match(spark, built_global):
    """A needle read ACROSS a doc boundary, then mutated: the approximate
    match still spans two docs and must be found via the stitched scan."""
    corp, idx, stream = built_global
    offs = [r["doc_offset"] for r in
            sorted(corp.select("doc_offset").collect(), key=lambda r: r["doc_offset"])]
    boundary = offs[2]
    start = int(boundary - 6)
    pat = _mutate([int(t) for t in stream[start : start + 12]], [3, 8])
    got = {r["gpos"]
           for r in global_kmismatch_pattern_search(corp, idx, CFG_G, pat, 2).collect()}
    assert got == _brute_global(stream, pat, 2)
    assert start in got


def test_stats_out_records_descent(spark, built):
    corp, idx = built
    pat = _mutate(_needle(corp), [2])
    stats = {}
    kmismatch_pattern_search(corp, idx, CFG, pat, 1, stats_out=stats).count()
    assert stats.get("survivors") and stats.get("windows_probed")


# ---------------------------------------------------------------------------
# k-edit (Levenshtein) search — independent pure-python brute force
# ---------------------------------------------------------------------------
def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_edit(corp, pattern, d):
    pat = "".join(chr(int(t)) for t in pattern)
    m = len(pat)
    want = set()
    for r in corp.select("doc_id", "tokens").collect():
        txt = "".join(chr(t) for t in r["tokens"])
        for p in range(len(txt)):
            for L in range(max(m - d, 0), m + d + 1):
                if _lev(txt[p : p + L], pat) <= d:
                    want.add((r["doc_id"], p))
                    break
    return want


@pytest.fixture(scope="module")
def built_small(spark, built):
    """A 6-doc slice of the module corpus with its own index — the python
    Levenshtein brute force is O(n * d * m^2), so differentials run on a
    slice while the planted-needle checks use the full corpus."""
    corp, _ = built
    ids = sorted(r["doc_id"] for r in corp.select("doc_id").collect())[:6]
    sub = corp.filter(F.col("doc_id").isin(ids)).cache()
    from hierarchical_bloom_filter_index_spark.operators import build_index

    idx = build_index(sub, CFG).cache()
    idx.count()
    yield sub, idx
    idx.unpersist()
    sub.unpersist()


@pytest.mark.parametrize("d", [0, 1, 2])
def test_kedit_matches_brute(spark, built_small, d):
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        kedit_pattern_search,
    )

    sub, idx = built_small
    base = _needle(sub, start=200, m=10)
    # plant d edits: one substitution, then insertions (shifts the tail)
    pat = list(base)
    if d >= 1:
        pat[2] = pat[2] + 1
    if d >= 2:
        pat = pat[:5] + [pat[5] + 3] + pat[5:]
    got = {(r["doc_id"], r["pos"])
           for r in kedit_pattern_search(sub, idx, CFG, pat, d).collect()}
    want = _brute_edit(sub, pat, d)
    assert got == want
    if d > 0:
        assert len(want) > 0  # the edited needle finds the clean original


def test_kedit_d0_equals_exact(spark, built_small):
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        kedit_pattern_search,
    )

    sub, idx = built_small
    pat = _needle(sub, start=120, m=12)
    ke = {(r["doc_id"], r["pos"])
          for r in kedit_pattern_search(sub, idx, CFG, pat, 0).collect()}
    ex = {(r["doc_id"], r["pos"])
          for r in pattern_search(sub, idx, CFG, pat).collect()}
    assert ke == ex and len(ke) > 0


def test_kedit_long_pattern_indel_drift(spark, built_small):
    """m > 2*leaf_span with a deletion near the front: the fragment that
    survives is shifted left by the deletion, exercising the ±d-widened
    window-shift range (_edit_shifts)."""
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        kedit_pattern_search,
    )

    sub, idx = built_small
    base = _needle(sub, start=64, m=80)
    pat = base[:10] + base[11:] + [base[-1]]  # delete pos 10, pad length back
    got = {(r["doc_id"], r["pos"])
           for r in kedit_pattern_search(sub, idx, CFG, pat, 2).collect()}
    assert got == _brute_edit(sub, pat, 2) and len(got) > 0


def test_kedit_absent_needle_empty(spark, built_small):
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        kedit_pattern_search,
    )

    sub, idx = built_small
    pat = [60000 + i for i in range(12)]
    assert kedit_pattern_search(sub, idx, CFG, pat, 1).count() == 0


@pytest.mark.parametrize("d", [1, 2])
def test_global_kedit_matches_stream_eval(spark, built_global, d):
    """Global k-edit vs a single-array evaluation of the same DP kernel
    over the raw concatenated stream: the distributed pieces under test
    are the stitching, the window candidates/votes and the per-doc
    assembly (the kernel itself is differentially tested against a pure
    python Levenshtein in test_kedit_matches_brute)."""
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        _edit_ok_positions,
        global_kedit_pattern_search,
    )

    corp, idx, stream = built_global
    start = 4000
    base = [int(t) for t in stream[start : start + 12]]
    pat = base[:3] + base[4:] + [base[-1]]  # deletion at 3, pad length
    pat = _mutate(pat, [8]) if d >= 2 else pat
    got = {r["gpos"]
           for r in global_kedit_pattern_search(corp, idx, CFG_G, pat, d).collect()}
    pa = np.asarray(pat, dtype=np.int64)
    want = set(
        int(p) for p in _edit_ok_positions(
            stream, np.arange(len(stream), dtype=np.int64), pa, d)
    )
    assert got == want and len(want) > 0


def test_global_kedit_cross_doc_indel(spark, built_global):
    """An edited needle read ACROSS a doc boundary: the deletion sits
    before the boundary, so the true match spans two docs."""
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        _edit_ok_positions,
        global_kedit_pattern_search,
    )

    corp, idx, stream = built_global
    offs = sorted(r["doc_offset"] for r in corp.select("doc_offset").collect())
    start = int(offs[3] - 7)
    base = [int(t) for t in stream[start : start + 14]]
    pat = base[:4] + base[5:]  # delete one token before the boundary
    got = {r["gpos"]
           for r in global_kedit_pattern_search(corp, idx, CFG_G, pat, 1).collect()}
    pa = np.asarray(pat, dtype=np.int64)
    want = set(
        int(p) for p in _edit_ok_positions(
            stream, np.arange(len(stream), dtype=np.int64), pa, 1)
    )
    assert got == want and start in got


def test_approx_batch_equals_singles(spark, built):
    """A mixed Hamming/edit workload through ONE cascade returns exactly
    the per-query single-search answers — including an unprunable d>=m
    entry and an absent needle."""
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        approx_search_batch,
        kedit_pattern_search,
    )

    corp, idx = built
    base = _needle(corp)
    workload = [
        (_mutate(base, [0]), 1, "hamming"),
        (_mutate(base, [0, 5]), 2, "hamming"),
        (base[:4] + base[5:], 1, "edit"),  # one deletion vs the needle
        ([90001 + i for i in range(12)], 1, "hamming"),
        ([1, 2, 3], 3, "hamming"),
    ]
    got: dict[int, set] = {qi: set() for qi in range(len(workload))}
    for r in approx_search_batch(corp, idx, CFG, workload).collect():
        got[r["query_id"]].add((r["doc_id"], r["pos"]))
    for qi, (pat, d, kind) in enumerate(workload):
        if kind == "edit":
            single = kedit_pattern_search(corp, idx, CFG, pat, d)
        else:
            single = kmismatch_pattern_search(corp, idx, CFG, pat, d)
        want = {(r["doc_id"], r["pos"]) for r in single.collect()}
        assert got[qi] == want, f"query {qi} mismatch"
    assert got[0] and got[2] and not got[3]


def test_global_approx_batch_equals_singles(spark, built_global):
    """Mixed global workload through one cascade == per-query global
    searches, including a cross-doc needle and an absent one."""
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        global_approx_search_batch,
        global_kedit_pattern_search,
    )

    corp, idx, stream = built_global
    base = [int(t) for t in stream[5000:5012]]
    offs = sorted(r["doc_offset"] for r in corp.select("doc_offset").collect())
    cross = [int(t) for t in stream[int(offs[2]) - 6 : int(offs[2]) + 6]]
    workload = [
        (_mutate(base, [0]), 1, "hamming"),
        (base[:4] + base[5:], 1, "edit"),
        (_mutate(cross, [3, 8]), 2, "hamming"),
        ([90001 + i for i in range(12)], 1, "hamming"),
    ]
    got: dict[int, set] = {qi: set() for qi in range(len(workload))}
    for r in global_approx_search_batch(corp, idx, CFG_G, workload).collect():
        got[r["query_id"]].add(r["gpos"])
    for qi, (pat, d, kind) in enumerate(workload):
        if kind == "edit":
            single = global_kedit_pattern_search(corp, idx, CFG_G, pat, d)
        else:
            single = global_kmismatch_pattern_search(corp, idx, CFG_G, pat, d)
        want = {r["gpos"] for r in single.collect()}
        assert got[qi] == want, f"query {qi} mismatch"
    assert got[0] and got[1] and got[2] and not got[3]


def test_kmismatch_on_ngram2_index(spark, built):
    """Approximate search over an ngram=2 (bigram-keyed) index: fragments
    are probed via their packed bigrams — answers unchanged vs brute."""
    corp, _ = built
    cfg2 = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096,
                     seed=77, ngram=2)
    idx2 = build_index(corp, cfg2).cache()
    idx2.count()
    try:
        pat = _mutate(_needle(corp), [1, 6])
        got = {(r["doc_id"], r["pos"])
               for r in kmismatch_pattern_search(corp, idx2, cfg2, pat, 2).collect()}
        want = _brute_doc(corp, pat, 2)
        assert got == want and len(want) > 0
    finally:
        idx2.unpersist()


def test_fuzzy_topk_ranked_vs_python(spark, built_small):
    """Ranked fuzzy search: the top-k (dist, doc_id, pos) triples equal a
    pure-python ranking over the brute-force distance map; exact matches
    rank first (dist 0)."""
    from hierarchical_bloom_filter_index_spark.operators.approx import fuzzy_topk

    sub, idx = built_small
    pat = _mutate(_needle(sub, start=300, m=10), [4])
    d_max, k = 2, 25
    got = [(r["dist"], r["doc_id"], r["pos"])
           for r in fuzzy_topk(sub, idx, CFG, pat, d_max, k).collect()]
    pat_s = "".join(chr(int(t)) for t in pat)
    m = len(pat_s)
    all_hits = []
    for r in sub.select("doc_id", "tokens").collect():
        txt = "".join(chr(t) for t in r["tokens"])
        for p in range(len(txt)):
            best = min(
                (_lev(txt[p : p + L], pat_s)
                 for L in range(max(m - d_max, 0), m + d_max + 1)),
            )
            if best <= d_max:
                all_hits.append((best, r["doc_id"], p))
    want = sorted(all_hits)[:k]
    assert got == want and len(got) > 0
    # the ranked order is already (dist, doc_id, pos) ascending
    assert got == sorted(got)


def test_global_kmismatch_over_streamed_index(spark, tmp_path):
    """Approximate search runs unchanged against the Structured-Streaming-
    maintained global index: a two-batch stream-built index answers a
    global k-mismatch query identically to the batch-built index (and to
    brute force) — the query layer only sees (level, w_id, blob) rows."""
    import os
    import time

    from hierarchical_bloom_filter_index_spark.streaming.incremental import (
        incremental_global_index_stream,
        read_global_stream_index,
    )

    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096,
                    seed=79, axis="global")
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    full = with_global_offsets(C.generate_corpus(spark, sf=0.002, seed=79)).cache()
    ids = sorted(r["doc_id"] for r in full.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    for part in (full.filter(F.col("doc_id") <= cut),
                 full.filter(F.col("doc_id") > cut)):
        part.drop("doc_offset").coalesce(1).write.mode("append").parquet(inp)
        time.sleep(1.1)
    q = incremental_global_index_stream(
        spark, inp, str(tmp_path / "chk"), str(tmp_path / "idx"), cfg)
    assert q.awaitTermination(180)
    streamed, _st = read_global_stream_index(spark, str(tmp_path / "idx"))
    batch_idx = build_index(full, cfg).cache()
    try:
        stream_toks = np.concatenate(
            [np.asarray(r["tokens"], dtype=np.int64)
             for r in sorted(full.collect(), key=lambda r: r["doc_id"])]
        )
        pat = _mutate([int(t) for t in stream_toks[3000:3012]], [2, 7])
        got_s = {r["gpos"] for r in global_kmismatch_pattern_search(
            full, streamed, cfg, pat, 2).collect()}
        got_b = {r["gpos"] for r in global_kmismatch_pattern_search(
            full, batch_idx, cfg, pat, 2).collect()}
        want = _brute_global(stream_toks, pat, 2)
        assert got_s == got_b == want and 3000 in want
    finally:
        batch_idx.unpersist()
        full.unpersist()


def test_kedit_brute_fallback_high_codepoints(spark):
    """Regression (review finding): the exact-scan fallback must verify
    with the SAME numpy kernel as the index path — an earlier version
    reconstructed text via F.char, which wraps codepoints mod 256 and
    silently broke every token >= 256. Trigger the fallback via an
    ngram=2 index (the length-1 fragment is unprunable) on a >255-token
    corpus."""
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        kedit_pattern_search,
    )
    from hierarchical_bloom_filter_index_spark.operators import build_index as bi

    cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096,
                    seed=5, ngram=2)
    df = spark.createDataFrame(
        [("d1", [1000, 1001, 300, 301, 302, 303, 1002], 7)],
        "doc_id string, tokens array<int>, n_tok int")
    idx = bi(df, cfg).cache()
    try:
        got = {(r["doc_id"], r["pos"])
               for r in kedit_pattern_search(df, idx, cfg, [300, 301, 303], 1).collect()}
        # one deletion (302) away from positions 2..; python ground truth:
        want = _brute_edit(df, [300, 301, 303], 1)
        assert got == want and len(want) > 0
    finally:
        idx.unpersist()


def test_global_fuzzy_topk_ranked_vs_stream_eval(spark, built_global):
    """Global ranked fuzzy search equals a single-array ranking over the
    raw stream (kernel differentially covered by the doc-axis test);
    cross-doc candidates participate in the ranking."""
    from hierarchical_bloom_filter_index_spark.operators.approx import (
        _edit_best_dists,
        global_fuzzy_topk,
    )

    corp, idx, stream = built_global
    base = [int(t) for t in stream[6000:6011]]
    pat = _mutate(base, [5])
    d_max, kk = 2, 30
    got = [(r["dist"], r["gpos"])
           for r in global_fuzzy_topk(corp, idx, CFG_G, pat, d_max, kk).collect()]
    pa = np.asarray(pat, dtype=np.int64)
    pos, dd = _edit_best_dists(
        stream, np.arange(len(stream), dtype=np.int64), pa, d_max)
    want = sorted(zip(dd.tolist(), pos.tolist()))[:kk]
    assert got == [(int(d), int(p)) for d, p in want] and len(got) == kk
    assert got == sorted(got)
