"""End-to-end index tests: build -> route -> verify == brute force, on the
reference's three query classes (missing / rare / uniform), mirroring the
differential methodology of HBIDatasetBenchmark.compared
(HBIDatasetBenchmark.java:106-182)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import (
    brute_force_search,
    build_index,
    compact_index,
    index_stats,
    pattern_search,
    window_membership,
)

CFG = HbiConfig(tree_span=512, leaf_span=32, fpr=0.05, vocab=4096, seed=42)


@pytest.fixture(scope="module")
def small_corpus(spark):
    df = C.generate_corpus(spark, sf=0.002, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def small_index(spark, small_corpus):
    idx = build_index(small_corpus, CFG).cache()
    idx.count()
    return idx


def _rows(df):
    return sorted((r["doc_id"], r["pos"]) for r in df.collect())


def _sample_patterns(small_corpus, plen, n=5):
    """uniform-class queries: contiguous slices of real docs (present)."""
    rows = small_corpus.filter(F.col("n_tok") >= plen + 8).orderBy("doc_id").limit(n).collect()
    pats = []
    for i, r in enumerate(rows):
        start = (i * 13) % (r["n_tok"] - plen)
        pats.append(r["tokens"][start : start + plen])
    return pats


def test_index_has_all_levels(small_index):
    levels = sorted(r["level"] for r in small_index.select("level").distinct().collect())
    assert levels == CFG.levels


@pytest.mark.parametrize("plen", [4, 16, 64, 160, 320])
def test_uniform_queries_match_bruteforce(spark, small_corpus, small_index, plen):
    for pat in _sample_patterns(small_corpus, plen, n=3):
        got = _rows(pattern_search(small_corpus, small_index, CFG, pat))
        exp = _rows(brute_force_search(small_corpus, pat))
        assert got == exp and len(exp) >= 1


def test_missing_queries_return_empty(spark, small_corpus, small_index):
    # missing-class: real slice with one token mutated out of vocab
    for pat in _sample_patterns(small_corpus, 12, n=3):
        pat = list(pat)
        pat[len(pat) // 2] = 99_999  # out-of-vocab => guaranteed absent
        got = _rows(pattern_search(small_corpus, small_index, CFG, pat))
        assert got == []


def test_rare_queries(spark, small_corpus, small_index):
    # rare-class: slice from the zipf tail doc (low-frequency tokens)
    row = small_corpus.filter(F.col("source") == "uniform").orderBy("doc_id").first()
    pat = row["tokens"][-24:]
    got = _rows(pattern_search(small_corpus, small_index, CFG, pat))
    exp = _rows(brute_force_search(small_corpus, pat))
    assert got == exp


def test_start_level_override_does_not_change_answers(spark, small_corpus, small_index):
    pat = _sample_patterns(small_corpus, 8, n=1)[0]
    exp = _rows(brute_force_search(small_corpus, pat))
    for lvl in (0, 2, CFG.deepest):
        got = _rows(pattern_search(small_corpus, small_index, CFG, pat, start_level=lvl))
        assert got == exp
    # SelectiveFanout regime only reprices the seed choice — answers identical
    from hierarchical_bloom_filter_index_spark.operators import (
        frequency_summary,
        index_stats,
    )

    freq = frequency_summary(small_corpus, CFG)
    stats = index_stats(small_index, CFG)
    got_sel = _rows(pattern_search(small_corpus, small_index, CFG, pat,
                                   start_level="auto", freq=freq, stats=stats,
                                   selective=True))
    assert got_sel == exp


def test_pattern_longer_than_tree_span_falls_back(spark, small_corpus, small_index):
    row = small_corpus.filter(F.col("n_tok") > CFG.tree_span + 32).first()
    if row is None:
        pytest.skip("no doc longer than tree_span at this SF")
    pat = row["tokens"][3 : 3 + CFG.tree_span + 8]
    got = _rows(pattern_search(small_corpus, small_index, CFG, pat))
    exp = _rows(brute_force_search(small_corpus, pat))
    assert got == exp and len(exp) >= 1


def test_window_membership_exact(spark, small_corpus, small_index):
    row = small_corpus.orderBy("doc_id").first()
    token = row["tokens"][7]
    got = sorted((r["doc_id"], r["w_id"]) for r in
                 window_membership(small_corpus, small_index, CFG, token).collect())
    # exact oracle in python over collected corpus
    span = CFG.leaf_span
    exp = []
    for r in small_corpus.collect():
        toks = np.asarray(r["tokens"])
        for w in np.unique(np.where(toks == token)[0] // span):
            exp.append((r["doc_id"], int(w)))
    assert got == sorted(exp) and len(exp) >= 1
    # hierarchical routing (cascade from a seed level) and the planner-priced
    # "auto" seed return the identical exact pairs as the flat leaf scan
    from hierarchical_bloom_filter_index_spark.operators import (
        frequency_summary,
        index_stats,
    )

    routed = sorted((r["doc_id"], r["w_id"]) for r in
                    window_membership(small_corpus, small_index, CFG, token,
                                      start_level=0).collect())
    assert routed == sorted(exp)
    freq = frequency_summary(small_corpus, CFG)
    stats = index_stats(small_index, CFG)
    auto = sorted((r["doc_id"], r["w_id"]) for r in
                  window_membership(small_corpus, small_index, CFG, token,
                                    start_level="auto", freq=freq, stats=stats).collect())
    assert auto == sorted(exp)


def test_compact_index_drops_coarse_levels_only(spark, small_corpus, small_index):
    compacted = compact_index(small_index, 2)
    levels = sorted(r["level"] for r in compacted.select("level").distinct().collect())
    assert levels == [L for L in CFG.levels if L >= 2]
    # queries still exact when coarse levels are dropped (start at level 2)
    pat = _sample_patterns(small_corpus, 8, n=1)[0]
    got = _rows(pattern_search(small_corpus, compacted, CFG, pat, start_level=2))
    exp = _rows(brute_force_search(small_corpus, pat))
    assert got == exp


def test_index_stats_shape(spark, small_index):
    stats = index_stats(small_index, CFG)
    assert list(stats["level"]) == CFG.levels
    assert (stats["fill_fpr"] < 0.7).all()
    assert (stats["n_windows"].diff().dropna() > 0).all()  # finer => more windows


def test_global_axis_build_merges_partials(spark, small_corpus):
    cfg = CFG.with_(axis="global")
    idx = build_index(small_corpus.repartition(6), cfg)
    rows = idx.groupBy("level", "w_id").count().filter("count > 1").count()
    assert rows == 0  # merged: one row per (level, w_id)
    # token totals per level equal corpus token count
    total = small_corpus.agg(F.sum("n_tok")).first()[0]
    per_level = {r["level"]: r["s"] for r in idx.groupBy("level").agg(F.sum("n_items").alias("s")).collect()}
    assert all(v == total for v in per_level.values())


def test_cascade_checkpoint_fallback_exact(spark, small_corpus, small_index, monkeypatch):
    """Frontiers above the driver-materialization byte cap stay distributed
    (per-level localCheckpoint lineage cut instead of a collect): answers on
    BOTH axes remain exact. Cap forced to 1 byte so every level takes the
    fallback path."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets
    from hierarchical_bloom_filter_index_spark.operators import (
        global_pattern_search,
        route,
    )

    monkeypatch.setattr(route, "DRIVER_MATERIALIZE_BYTES", 1)
    doc = small_corpus.filter(F.col("n_tok") >= 64).orderBy("doc_id").first()
    pat = list(doc["tokens"][3:15])
    got = _rows(pattern_search(small_corpus, small_index, CFG, pat))
    exp = _rows(brute_force_search(small_corpus, pat))
    assert got == exp and len(exp) > 0

    gcfg = CFG.with_(axis="global")
    gcorp = with_global_offsets(small_corpus)
    gidx = build_index(gcorp, gcfg)
    gw = sorted(r["gpos"] for r in global_pattern_search(gcorp, gidx, gcfg, pat).collect())
    off = {r["doc_id"]: r["doc_offset"] for r in gcorp.select("doc_id", "doc_offset").collect()}
    assert gw == sorted(off[d] + p for d, p in exp)


def test_wildcard_pattern_search_matches_brute_force(spark, small_corpus, small_index):
    """Wildcard report(): gapped-literal patterns return exactly the
    brute-force positions; probing only the literals is a sound weakening."""
    from hierarchical_bloom_filter_index_spark.functions import (
        wildcard_subsequence_positions,
    )
    from hierarchical_bloom_filter_index_spark.operators.route import (
        wildcard_pattern_search,
    )

    corp, idx, cfg = small_corpus, small_index, CFG
    doc = corp.first()
    toks = list(doc["tokens"])
    # real gapped patterns lifted from the corpus: (lit, ?, lit) and a
    # wildcard-leading one (anchor must drop soundly)
    pats = [
        [toks[0], None, toks[2]],
        [None, toks[1], toks[2], None],
        [toks[3]] if len(toks) > 3 else [toks[0]],
        [None, None],                      # all-wildcard: every start
        [123456789, None, toks[0]],        # absent literal: no matches
    ]
    for pat in pats:
        got = {(r["doc_id"], r["pos"])
               for r in wildcard_pattern_search(corp, idx, cfg, pat).collect()}
        want = {(r["doc_id"], r["pos"]) for r in corp.select(
            "doc_id",
            F.explode(wildcard_subsequence_positions("tokens", pat)).alias("pos"),
        ).collect()}
        assert got == want, pat
    # brute check of the verifier itself on one doc
    pat = [toks[0], None, toks[2]]
    want_pos = [i for i in range(len(toks) - 2)
                if toks[i] == toks[0] and toks[i + 2] == toks[2]]
    got_pos = sorted(
        r["pos"] for r in wildcard_pattern_search(corp, idx, cfg, pat).collect()
        if r["doc_id"] == doc["doc_id"]
    )
    assert got_pos == want_pos


def test_wildcard_refusals(spark, small_corpus, small_index):
    from hierarchical_bloom_filter_index_spark.operators.route import (
        wildcard_pattern_search,
    )

    corp, idx, cfg = small_corpus, small_index, CFG
    with pytest.raises(ValueError, match="empty"):
        wildcard_pattern_search(corp, idx, cfg, [])
    with pytest.raises(ValueError, match="token-keyed"):
        wildcard_pattern_search(corp, idx, cfg.with_(ngram=3), [1, None])


def test_range_membership_matches_brute_force(spark, small_corpus, small_index):
    """Membership over leaf-window RANGES from O(log) covering Bloom nodes:
    exact (doc, a, b) rows; Bloom false positives only cost verification."""
    from hierarchical_bloom_filter_index_spark.operators.route import (
        range_membership,
    )

    docs = small_corpus.select("doc_id", "tokens").collect()
    ranges = [(1, 9), (0, 3), (5, 6)]
    toks = [int(docs[0]["tokens"][40]), int(docs[2]["tokens"][3]), 987654321]
    for tok in toks:
        got = {(r["doc_id"], r["a"], r["b"]) for r in
               range_membership(small_corpus, small_index, CFG, ranges, tok).collect()}
        want = {
            (r["doc_id"], a, b)
            for r in docs
            for a, b in ranges
            if tok in r["tokens"][a * CFG.leaf_span : b * CFG.leaf_span]
        }
        assert got == want, tok


def test_charclass_pattern_search_matches_python(spark, small_corpus, small_index):
    """Regex-lite CHARACTER CLASSES: a list/set entry matches any member.
    Positions equal an independent python evaluation; classes are enforced
    by the verifier only (probe uses the literal positions — weakening)."""
    from hierarchical_bloom_filter_index_spark.operators.route import (
        wildcard_pattern_search,
    )

    corp, idx, cfg = small_corpus, small_index, CFG
    docs = {r["doc_id"]: list(r["tokens"]) for r in corp.collect()}
    toks = next(iter(docs.values()))
    pats = [
        [toks[0], [toks[1], toks[1] + 1], toks[2]],           # class mid
        [[toks[0], 99999], None, toks[2]],                    # class head
        [toks[0], (toks[1],), [99998, 99999]],                # impossible class
    ]

    def py_eval(ts, pat):
        out = []
        for i in range(len(ts) - len(pat) + 1):
            ok = True
            for j, v in enumerate(pat):
                if v is None:
                    continue
                if isinstance(v, (list, tuple, set)):
                    ok = ts[i + j] in v
                else:
                    ok = ts[i + j] == v
                if not ok:
                    break
            if ok:
                out.append(i)
        return out

    for pat in pats:
        got = {(r["doc_id"], r["pos"])
               for r in wildcard_pattern_search(corp, idx, cfg, pat).collect()}
        want = {(d, i) for d, ts in docs.items() for i in py_eval(ts, pat)}
        assert got == want, pat
    assert py_eval(toks, pats[0])  # the first pattern really matches


def test_pattern_topk_docs(spark, small_corpus, small_index):
    """Top-k docs by occurrence count: equals brute-force counts ranked with
    the (n_matches DESC, doc_id ASC) tie-break; refuses k < 1. The plan must
    be a TakeOrdered, not a global sort."""
    from hierarchical_bloom_filter_index_spark.operators.route import (
        pattern_search,
        pattern_topk_docs,
    )

    corp, idx = small_corpus, small_index
    doc = corp.filter(F.col("n_tok") >= 40).orderBy("doc_id").first()
    pat = [int(t) for t in doc["tokens"][8:10]]  # present 2-token slice
    k = 5
    df = pattern_topk_docs(corp, idx, CFG, pat, k)
    got = [(r["doc_id"], r["n_matches"]) for r in df.collect()]
    cnt = {}
    for r in pattern_search(corp, idx, CFG, pat).collect():
        cnt[r["doc_id"]] = cnt.get(r["doc_id"], 0) + 1
    want = sorted(cnt.items(), key=lambda x: (-x[1], x[0]))[:k]
    assert got == want and 0 < len(got) <= k
    assert "TakeOrderedAndProject" in df._jdf.queryExecution().executedPlan().toString()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        pattern_topk_docs(corp, idx, CFG, pat, 0)


def test_pattern_contexts(spark, small_corpus, small_index):
    """KWIC rows equal python slicing around every brute-force match: full
    [-c, m+c) window mid-doc, clamped at document edges (incl. a match at
    pos 0 and one ending at the last token); c=0 returns exactly the match
    tokens; negative c refused."""
    from hierarchical_bloom_filter_index_spark.operators.route import (
        pattern_contexts,
        pattern_search,
    )

    corp, idx = small_corpus, small_index
    docs = {r["doc_id"]: list(r["tokens"]) for r in corp.collect()}
    doc = corp.filter(F.col("n_tok") >= 40).orderBy("doc_id").first()
    ts = list(doc["tokens"])
    for pat, c in [(ts[8:11], 6), (ts[:2], 4), (ts[-3:], 5), (ts[8:11], 0)]:
        pat = [int(t) for t in pat]
        m = len(pat)
        want = set()
        for r in pattern_search(corp, idx, CFG, pat).collect():
            tks, p = docs[r["doc_id"]], r["pos"]
            for off in range(max(-c, -p), min(m + c, len(tks) - p)):
                want.add((r["doc_id"], p, off, int(tks[p + off])))
        got = {(r["doc_id"], r["pos"], r["off"], r["tok"])
               for r in pattern_contexts(corp, idx, CFG, pat, c).collect()}
        assert got == want and len(got) > 0, (pat, c)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="context"):
        pattern_contexts(corp, idx, CFG, ts[8:11], -1)
