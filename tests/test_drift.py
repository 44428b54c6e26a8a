"""Drift family: exact pairwise TVD, attribution, streaming counts."""

import os
from fractions import Fraction

import pytest

from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators import drift as DR


def _mk_corpus(spark, rows):
    return spark.createDataFrame(
        [(d, toks, len(toks), src) for d, toks, src in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )


def _brute_tvd(docs_a, docs_b):
    from collections import Counter

    ca, cb = Counter(), Counter()
    for t in docs_a:
        ca.update(t)
    for t in docs_b:
        cb.update(t)
    na, nb = sum(ca.values()), sum(cb.values())
    num = sum(abs(ca.get(t, 0) * nb - cb.get(t, 0) * na)
              for t in set(ca) | set(cb))
    return Fraction(num, 2 * na * nb), num


@pytest.fixture(scope="module")
def small(spark):
    rows = [
        ("a0", [1, 1, 2, 3, 5], "A"),
        ("a1", [1, 2, 2, 4], "A"),
        ("b0", [1, 3, 3, 3, 7], "B"),
        ("b1", [2, 7, 7], "B"),
        ("c0", [90, 91, 92, 92], "C"),  # disjoint from A and B
        ("d0", [1, 1, 2, 3, 5], "D"),
        ("d1", [1, 2, 2, 4], "D"),      # identical multiset to A
    ]
    corpus = _mk_corpus(spark, rows)
    counts = DR.group_token_counts(corpus)
    return rows, counts


def test_pairwise_tvd_matches_brute_force(small):
    rows, counts = small
    got = {(r["source_a"], r["source_b"]): r
           for r in DR.pairwise_tvd(counts).collect()}
    assert len(got) == 6  # C(4,2)
    by_src = {}
    for _, toks, src in rows:
        by_src.setdefault(src, []).append(toks)
    for (a, b), r in got.items():
        frac, num = _brute_tvd(by_src[a], by_src[b])
        assert int(r["tvd_num"]) == num, (a, b)
        assert r["tvd"] == pytest.approx(float(frac), abs=1e-15)
        assert r["n_a"] == sum(len(t) for t in by_src[a])
        assert r["n_b"] == sum(len(t) for t in by_src[b])


def test_identical_and_disjoint_extremes(small):
    _, counts = small
    got = {(r["source_a"], r["source_b"]): r
           for r in DR.pairwise_tvd(counts).collect()}
    assert got[("A", "D")]["tvd"] == 0.0
    assert int(got[("A", "D")]["tvd_num"]) == 0
    # C shares no tokens with A or B: TVD exactly 1, zero shared tokens
    for pair in (("A", "C"), ("B", "C")):
        assert got[pair]["tvd"] == 1.0
        assert got[pair]["shared_tokens"] == 0


def test_contributors_sum_to_tvd_and_order(small):
    rows, counts = small
    full = DR.tvd_contributors(counts, "A", "B", k=100).collect()
    pair = DR.pairwise_tvd(counts).filter(
        (F.col("source_a") == "A") & (F.col("source_b") == "B")
    ).collect()[0]
    assert sum(int(r["contrib"]) for r in full) == int(pair["tvd_num"])
    assert sum(r["tvd_share"] for r in full) == pytest.approx(
        pair["tvd"], abs=1e-12)
    contribs = [(int(r["contrib"]), r["token"]) for r in full]
    assert contribs == sorted(contribs, key=lambda c: (-c[0], c[1]))
    top2 = DR.tvd_contributors(counts, "A", "B", k=2).collect()
    assert [r["token"] for r in top2] == [r["token"] for r in full[:2]]


def test_counts_group_col_and_refusals(spark, small):
    _, counts = small
    with pytest.raises(ValueError):
        DR.tvd_contributors(counts, "A", "B", k=0)


def test_token_counts_stream_matches_batch(spark, tmp_path):
    docs = [
        ("d%d" % i, "abcabc"[: 3 + (i % 3)], "en", "s%d" % (i % 2))
        for i in range(10)
    ]
    df = spark.createDataFrame(
        docs, "doc_id string, text string, lang string, source string")
    inp, chk, out = (str(tmp_path / p) for p in ("in", "chk", "out"))
    # file source watches the flat directory; drops are append writes
    df.coalesce(1).write.mode("append").parquet(inp)
    q = DR.token_counts_stream(spark, inp, chk, out)
    assert q.awaitTermination(300)
    more = spark.createDataFrame(
        [("dx", "zzzy", "en", "s1")],
        "doc_id string, text string, lang string, source string")
    more.coalesce(1).write.mode("append").parquet(inp)
    q2 = DR.token_counts_stream(spark, inp, chk, out)
    assert q2.awaitTermination(300)

    from hierarchical_bloom_filter_index_spark.functions import codepoint_tokens

    all_docs = df.unionByName(more)
    batch = DR.group_token_counts(
        all_docs.select(codepoint_tokens("text").alias("tokens"), "source"))
    streamed = DR.read_group_token_counts(spark, out)
    sym = streamed.exceptAll(batch).unionByName(batch.exceptAll(streamed))
    assert sym.count() == 0
    # drift readout built on the streamed counts agrees with batch TVD
    tb = {(r["source_a"], r["source_b"]): r["tvd_num"]
          for r in DR.pairwise_tvd(batch).collect()}
    ts = {(r["source_a"], r["source_b"]): r["tvd_num"]
          for r in DR.pairwise_tvd(streamed).collect()}
    assert tb == ts


# ---------------------------------------------------------------------------
# KS distance (continuous drift)
# ---------------------------------------------------------------------------
def _brute_ks_stat(a, b):
    import numpy as np

    a, b = np.sort(np.asarray(a, float)), np.sort(np.asarray(b, float))
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, xs, side="right") / len(a)
    fb = np.searchsorted(b, xs, side="right") / len(b)
    d = np.abs(fa - fb)
    i = int(np.argmax(d))
    return float(d[i]), float(xs[i])


def _brute_ks(a, b):
    return _brute_ks_stat(a, b)[0]


def test_ks_exact_when_uncompacted():
    import numpy as np

    from hierarchical_bloom_filter_index_spark.sketches import KLL
    from hierarchical_bloom_filter_index_spark.sketches.kll import ks_distance

    rng = np.random.default_rng(7)
    a, b = rng.normal(0, 1, 150), rng.normal(0.5, 1, 120)
    ka, kb = KLL(k=200, seed=1), KLL(k=200, seed=2)
    ka.update(a)
    kb.update(b)
    assert ka.compactions == 0 and kb.compactions == 0
    assert ks_distance(ka, kb) == pytest.approx(_brute_ks(a, b), abs=1e-12)
    # identical distributions -> 0
    kc = KLL(k=200, seed=3)
    kc.update(a)
    assert ks_distance(ka, kc) == 0.0
    with pytest.raises(ValueError):
        ks_distance(ka, KLL(k=200))


def test_ks_bound_when_compacted():
    import numpy as np

    from hierarchical_bloom_filter_index_spark.sketches import KLL
    from hierarchical_bloom_filter_index_spark.sketches.kll import ks_distance

    rng = np.random.default_rng(11)
    a, b = rng.normal(0, 1, 60_000), rng.normal(0.3, 1.4, 50_000)
    ka, kb = KLL(k=200, seed=1), KLL(k=200, seed=2)
    for chunk in np.array_split(a, 7):
        ka.update(chunk)
    for chunk in np.array_split(b, 5):
        kb.update(chunk)
    assert ka.compactions > 0 and kb.compactions > 0
    est, true = ks_distance(ka, kb), _brute_ks(a, b)
    assert abs(est - true) <= 0.04  # eps_a + eps_b at k=200 (0.02 each)


def test_grouped_ks_matches_object_path(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(f"g{i % 3}", float(v)) for i, v in enumerate(rng.normal(0, 1, 900))]
    df = spark.createDataFrame(rows, "source string, val double")
    got = {(r["source_a"], r["source_b"]): r
           for r in DR.grouped_ks(df, "val", "source", k=400, seed=5).collect()}
    assert set(got) == {("g0", "g1"), ("g0", "g2"), ("g1", "g2")}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for (ga, gb), r in got.items():
        assert r["n_a"] == len(by_g[ga]) and r["n_b"] == len(by_g[gb])
        # k=400 > group sizes: uncompacted -> exact two-sample KS
        ks, ks_x = _brute_ks_stat(by_g[ga], by_g[gb])
        assert r["ks"] == pytest.approx(ks, abs=1e-12)
        assert r["ks_x"] == pytest.approx(ks_x, abs=1e-12)


def test_remove_token_counts_takedown(spark, tmp_path):
    docs = [("d%d" % i, "hello" if i % 2 else "world", "en", "s%d" % (i % 2))
            for i in range(8)]
    df = spark.createDataFrame(
        docs, "doc_id string, text string, lang string, source string")
    inp, chk, out = (str(tmp_path / p) for p in ("in", "chk", "out"))
    df.coalesce(1).write.mode("append").parquet(inp)
    q = DR.token_counts_stream(spark, inp, chk, out)
    assert q.awaitTermination(300)

    from hierarchical_bloom_filter_index_spark.functions import codepoint_tokens

    gone = df.where(F.col("doc_id").isin(["d0", "d1", "d2"]))
    DR.remove_token_counts(out, gone, removal_id=1)
    DR.remove_token_counts(out, gone, removal_id=1)  # idempotent replay
    keep = df.exceptAll(gone)
    want = DR.group_token_counts(
        keep.select(codepoint_tokens("text").alias("tokens"), "source"))
    got = DR.read_group_token_counts(spark, out)
    sym = got.exceptAll(want).unionByName(want.exceptAll(got))
    assert sym.count() == 0
    with pytest.raises(ValueError):
        DR.remove_token_counts(out, gone, removal_id=0)
    # removing never-counted content -> the readout refuses loudly
    ghost = spark.createDataFrame(
        [("gx", "qqqqqqqq", "en", "s0")],
        "doc_id string, text string, lang string, source string")
    DR.remove_token_counts(out, ghost, removal_id=2)
    with pytest.raises(Exception, match="negative total"):
        DR.read_group_token_counts(spark, out).collect()


def test_compact_token_counts(spark, tmp_path):
    docs = [("d%d" % i, "abcd"[: 2 + i % 3], "en", "s%d" % (i % 2))
            for i in range(9)]
    df = spark.createDataFrame(
        docs, "doc_id string, text string, lang string, source string")
    inp, chk, out = (str(tmp_path / p) for p in ("in", "chk", "out"))
    df.coalesce(1).write.mode("append").parquet(inp)
    q = DR.token_counts_stream(spark, inp, chk, out)
    assert q.awaitTermination(300)
    gone = df.where(F.col("doc_id") == "d0")
    DR.remove_token_counts(out, gone, removal_id=1)
    want = sorted(tuple(r) for r in
                  DR.read_group_token_counts(spark, out).collect())
    n = DR.compact_token_counts(spark, out)
    assert n == len(want)
    got = sorted(tuple(r) for r in
                 DR.read_group_token_counts(spark, out).collect())
    assert got == want
    # the replay guard still sees the folded history: a fresh drain over
    # a NEW checkpoint re-delivers batch 0, the guard must skip it
    q2 = DR.token_counts_stream(spark, inp, str(tmp_path / "chk2"), out)
    assert q2.awaitTermination(300)
    got2 = sorted(tuple(r) for r in
                  DR.read_group_token_counts(spark, out).collect())
    assert got2 == want


def test_doc_group_tvd_matches_brute_force(spark, small):
    rows, _counts = small
    corpus = _mk_corpus(spark, rows)
    got = {r["doc_id"]: r for r in DR.doc_group_tvd(corpus).collect()}
    assert set(got) == {d for d, _, _ in rows}
    from collections import Counter

    by_src = {}
    for _, toks, src in rows:
        by_src.setdefault(src, Counter()).update(toks)
    for d, toks, src in rows:
        cg, cd = by_src[src], Counter(toks)
        ng, nd = sum(cg.values()), len(toks)
        num = sum(abs(cd.get(t, 0) * ng - cg.get(t, 0) * nd)
                  for t in set(cd) | set(cg))
        r = got[d]
        assert int(r["tvd_num"]) == num, d
        assert r["tvd"] == pytest.approx(num / (2 * nd * ng), abs=1e-15)
        assert r["grp"] == src and r["n_tok"] == nd
    # a doc identical to its whole group would score 0; doc == half its
    # group scores low; sanity: all scores in [0, 1)
    assert all(0 <= r["tvd"] < 1 for r in got.values())


def test_removal_replay_after_compaction(spark, tmp_path):
    docs = [("d%d" % i, "abc", "en", "s0") for i in range(4)]
    df = spark.createDataFrame(
        docs, "doc_id string, text string, lang string, source string")
    inp, chk, out = (str(tmp_path / p) for p in ("in", "chk", "out"))
    df.coalesce(1).write.mode("append").parquet(inp)
    q = DR.token_counts_stream(spark, inp, chk, out)
    assert q.awaitTermination(300)
    gone = df.where(F.col("doc_id") == "d0")
    DR.remove_token_counts(out, gone, removal_id=7)
    want = sorted(tuple(r) for r in
                  DR.read_group_token_counts(spark, out).collect())
    DR.compact_token_counts(spark, out)
    # a retried removal AFTER compaction must still be a no-op
    DR.remove_token_counts(out, gone, removal_id=7)
    got = sorted(tuple(r) for r in
                 DR.read_group_token_counts(spark, out).collect())
    assert got == want
