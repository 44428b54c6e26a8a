"""Regex search: factor segmentation laws + end-to-end differential vs a
pure-Python finditer brute force over the same corpus (the regex twin of
test_index_search's methodology)."""

import re

import numpy as np
import pytest

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import (
    build_index,
    frequency_summary,
    index_stats,
)
from hierarchical_bloom_filter_index_spark.operators.regex import (
    RegexSyntaxError,
    _chain_ok,
    regex_search,
    required_factors,
)

CFG = HbiConfig(tree_span=1024, leaf_span=32, fpr=0.01, vocab=128, seed=42)


# ---------------------------------------------------------------------------
# pure segmentation laws
# ---------------------------------------------------------------------------
def test_factor_segmentation():
    assert required_factors("customers? (?:join|merge)") == (
        ["customer", " "], [(8, 9)], (0, 0))
    assert required_factors("ab+c") == (["ab", "c"], [(2, None)], (0, 0))
    assert required_factors("a(bc){2}d") == (["abcbcd"], [], (0, 0))
    assert required_factors("^data merge$") == (["data merge"], [], (0, 0))
    assert required_factors("cust[a-z]*r") == (["cust", "r"], [(4, None)], (0, 0))
    assert required_factors("a|b") == ([], [], (0, 0))
    assert required_factors("hash.{1,15}jo") == (["hash", "jo"], [(5, 19)], (0, 0))
    assert required_factors("[xy]{2}abc") == (["abc"], [], (2, 2))
    assert required_factors(".{0,4}key") == (["key"], [], (0, 4))


def test_rejections():
    for bad in ("a*", "(a|)", "a**", "a\\1", "(a", "a)", "a{3,1}", "[ab"):
        with pytest.raises(RegexSyntaxError):
            required_factors(bad)


def test_factors_are_necessary():
    """Every factor must literally appear in every match of the regex, at a
    start delta inside the declared bounds (segmentation soundness law)."""
    pats = ["customers? (?:join|merge|scan)", "ab+c", "cust[a-z]{0,3}r",
            "x(?:yz|q)a{2,4}b"]
    strings = ["customer join", "customers merge", "abc", "abbbbc",
               "custxyzr", "custr", "xyzaab", "xqaaaab", "abbc custx"]
    for pat in pats:
        factors, deltas, _lead = required_factors(pat)
        rx = re.compile(pat)
        for s in strings:
            for m in rx.finditer(s):
                starts = []
                cursor = m.start()
                for f in factors:
                    j = m.string.find(f, cursor)
                    assert j != -1, (pat, s, f)
                    starts.append(j)
                    cursor = j + len(f)
                for (a, b), (lo, hi) in zip(zip(starts, starts[1:]), deltas):
                    assert b - a >= lo
                    assert hi is None or b - a <= hi


def test_chain_ok_interval_dp():
    # factor0 windows at span 4, factor1 at span 2; delta in [6, 7]
    w0 = np.array([0], dtype=np.int64)          # starts in [0, 3]
    ok = np.array([3], dtype=np.int64)          # starts in [6, 7]
    bad = np.array([6], dtype=np.int64)         # starts in [12, 13]
    assert _chain_ok([w0, ok], [4, 2], [6], [7])
    assert not _chain_ok([w0, bad], [4, 2], [6], [7])
    # unbounded hi reaches arbitrarily far forward
    assert _chain_ok([w0, bad], [4, 2], [6], [None])
    # but never backward
    assert not _chain_ok([np.array([6], dtype=np.int64), w0[:1]],
                         [4, 2], [6], [None])


# ---------------------------------------------------------------------------
# end-to-end differential
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def doc_corpus(spark, sf_dir):
    df = C.corpus_from_documents(spark, sf_dir).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def doc_index(spark, doc_corpus):
    idx = build_index(doc_corpus, CFG).cache()
    idx.count()
    return idx


@pytest.fixture(scope="module")
def planner(doc_corpus, doc_index):
    return frequency_summary(doc_corpus, CFG), index_stats(doc_index, CFG)


def _brute(doc_corpus, pat):
    rx = re.compile(pat)
    out = []
    for r in doc_corpus.select("doc_id", "tokens").collect():
        text = "".join(map(chr, r["tokens"]))
        out.extend((r["doc_id"], m.start(), m.group()) for m in rx.finditer(text))
    return sorted(out)


@pytest.mark.parametrize("pat", [
    "customers? (?:join|merge|scan)",     # factor chain with bounded delta
    "ta(?:ble|sk)s?",                     # single short factor
    "hash.{1,15}(?:join|agg)",            # bounded wildcard gap
    "(?:fast|slow) (?:scan|sort)",        # only the space is required
    "cust[a-z]*r (?:join|big)",           # unbounded gap between factors
    "(?:data|key)|stream",                # alternation-only => brute path
    "^key agg",                           # anchored
    "zebra+x",                            # absent factor => early empty
])
def test_regex_matches_bruteforce(doc_corpus, doc_index, planner, pat):
    freq, stats = planner
    got = sorted(
        (r["doc_id"], r["pos"], r["match"])
        for r in regex_search(doc_corpus, doc_index, CFG, pat,
                              start_level="auto", freq=freq, stats=stats).collect()
    )
    assert got == _brute(doc_corpus, pat)


BATCH_PATS = [
    "customers? (?:join|merge|scan)",
    "ta(?:ble|sk)s?",
    "(?:fast|slow) (?:scan|sort)",
    "zebra+x",                        # absent factor
    "hash.{1,15}(?:join|agg)",
    "(?:data|key)|stream",            # alternation-only => brute rider
]


def test_regex_batch_equals_singles(doc_corpus, doc_index, planner):
    from hierarchical_bloom_filter_index_spark.operators.regex import (
        regex_search_batch,
    )

    freq, stats = planner
    got = sorted(
        (r["pattern_id"], r["doc_id"], r["pos"], r["match"])
        for r in regex_search_batch(
            doc_corpus, doc_index, CFG, BATCH_PATS,
            start_level="auto", freq=freq, stats=stats).collect())
    want = sorted(
        (pid, r["doc_id"], r["pos"], r["match"])
        for pid, p in enumerate(BATCH_PATS)
        for r in regex_search(doc_corpus, doc_index, CFG, p,
                              start_level="auto", freq=freq,
                              stats=stats).collect())
    assert got == want


def test_regex_batch_rejects_empty(doc_corpus, doc_index):
    from hierarchical_bloom_filter_index_spark.operators.regex import (
        regex_search_batch,
    )

    with pytest.raises(ValueError):
        regex_search_batch(doc_corpus, doc_index, CFG, [])


def test_empty_matchable_rejected(doc_corpus, doc_index):
    with pytest.raises(RegexSyntaxError):
        regex_search(doc_corpus, doc_index, CFG, "a*")


def test_global_axis_rejected(doc_corpus, doc_index):
    gcfg = HbiConfig(tree_span=1024, leaf_span=32, fpr=0.01, vocab=128,
                     seed=42, axis="global")
    with pytest.raises(NotImplementedError):
        regex_search(doc_corpus, doc_index, gcfg, "abc")


# ---------------------------------------------------------------------------
# global (one-stream) axis: per-position anchored semantics, matches may
# cross document boundaries
# ---------------------------------------------------------------------------
GCFG = HbiConfig(tree_span=1024, leaf_span=32, fpr=0.01, vocab=128, seed=42,
                 axis="global")

# deliberate boundary junctions: 'slo'+'w scan', 'cust'+'omer merge'
BOUNDARY_TEXTS = [
    "the fast slo",
    "w scan begins here slow sort",
    "customer join now cust",
    "omer merge late",
    "plain filler text slow scan",
]


@pytest.fixture(scope="module")
def boundary_setup(spark):
    from hierarchical_bloom_filter_index_spark import corpus as C
    from hierarchical_bloom_filter_index_spark.operators import build_index

    rows = [(str(i), [ord(c) for c in t], len(t), "s")
            for i, t in enumerate(BOUNDARY_TEXTS)]
    corp = C.with_global_offsets(spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    ).cache()
    idx = build_index(corp, GCFG).cache()
    idx.count()
    return corp, idx


def _gbrute(pat):
    stream = "".join(BOUNDARY_TEXTS)
    rx = re.compile(pat)
    return sorted((p, m.group()) for p in range(len(stream))
                  for m in [rx.match(stream, p)] if m)


@pytest.mark.parametrize("pat", [
    "slow s(?:can|ort)",             # crosses the 'slo'|'w scan' boundary
    "cust(?:omer)? (?:join|merge)",  # crosses 'cust'|'omer merge'
    "t[a-z]{1,3}t",                  # bounded class gap
    "(?:slow|fast)",                 # alternation-only => stream brute path
    "zz{1,3}q",                      # absent factor => empty
])
def test_global_regex_matches_bruteforce(boundary_setup, pat):
    from hierarchical_bloom_filter_index_spark.operators.regex import (
        global_regex_search,
    )

    corp, idx = boundary_setup
    got = sorted((r["gpos"], r["match"])
                 for r in global_regex_search(corp, idx, GCFG, pat).collect())
    assert got == _gbrute(pat)


def test_global_regex_rejections(boundary_setup):
    from hierarchical_bloom_filter_index_spark.operators.regex import (
        global_regex_search,
    )

    corp, idx = boundary_setup
    with pytest.raises(RegexSyntaxError):
        global_regex_search(corp, idx, GCFG, "ab+c")  # unbounded length
    with pytest.raises(RegexSyntaxError):
        global_regex_search(corp, idx, GCFG, "^abc")  # stream anchor
    with pytest.raises(ValueError):
        global_regex_search(corp, idx, CFG, "abc")  # wrong axis
