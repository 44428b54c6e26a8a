"""Regex search over the Bloom cascade: report() generalized from literal
patterns to a regular-expression subset.

The reference's report() (PMIndex/HBI.java:205) answers literal patterns
only; wildcard_pattern_search and the chain/set surfaces extend it to
fixed-length gaps and token sets. This module closes the family with true
regexes, using the classic necessary-factor decomposition (the design of
trigram-index regex engines, e.g. Google Code Search / Russ Cox's
"Regular Expression Matching with a Trigram Index", 2012 — public
write-up): a match of the regex must contain every REQUIRED LITERAL FACTOR
(maximal literal run outside alternation/unbounded repetition) at a
start-offset delta bounded by the lengths of what the regex allows between
them. Factors are literal patterns, so they ride the existing shared batch
cascade (operators/batch._plan_batch/_descend_batch — one index descent for
the whole factor set); the factor-chain constraint prunes docs via a
backward interval DP over each factor's surviving windows (superset-sound:
windows bound match START positions, never drop a true one); and the exact
semantics are decided by Python ``re.finditer`` over the surviving docs
only — leftmost non-overlapping matches, the same semantics DuckDB's RE2
``regexp_extract_all`` implements for this subset, which is what makes the
driver oracle an equality.

Supported syntax: literals, escapes, ``.``, character classes ``[...]``,
``\\d \\w \\s`` (and negations), groups ``(...)`` / ``(?:...)`` with
alternation, quantifiers ``? * + {m} {m,} {m,n}``, anchors ``^ $``.
Rejected loudly: backreferences, lookaround, and regexes that can match
the empty string (an empty match at every position is never what an index
query means). Verification is per-doc full-text finditer — scanning only
candidate REGIONS would change non-overlap semantics relative to a plain
per-doc scan, and doc-level pruning is where the index earns its keep
(docs that lack any required factor at compatible spacing never reach
Python at all).
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import HbiConfig
from .batch import _descend_batch, _plan_batch

REGEX_SCHEMA = "doc_id string, pos int, match string"

_INF = None  # open upper bound marker in (lo, hi) length ranges
_BIG = np.iinfo(np.int64).max // 4


class RegexSyntaxError(ValueError):
    """Unsupported or malformed regex for the indexable subset."""


# ---------------------------------------------------------------------------
# parser: recursive descent over the supported subset
# ---------------------------------------------------------------------------
_SPECIAL = set("().[]{}|?*+^$\\")
_CLASS_ESCAPES = set("dDwWsS")
_LIT_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v", "0": "\0"}


def parse(pattern: str):
    """Parse into a tuple AST: ('lit', ch) | ('any',) | ('anchor', ch) |
    ('cat', [items]) | ('alt', [branches]) | ('rep', node, m, M|None)."""
    pos = 0
    n = len(pattern)

    def peek():
        return pattern[pos] if pos < n else None

    def take():
        nonlocal pos
        c = pattern[pos]
        pos += 1
        return c

    def alt():
        branches = [concat()]
        while peek() == "|":
            take()
            branches.append(concat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def concat():
        items = []
        while peek() not in (None, "|", ")"):
            items.append(item())
        return ("cat", items)

    def item():
        a = atom()
        c = peek()
        if c in ("?", "*", "+"):
            take()
            lo, hi = {"?": (0, 1), "*": (0, _INF), "+": (1, _INF)}[c]
        elif c == "{":
            take()
            body = ""
            while peek() not in (None, "}"):
                body += take()
            if peek() != "}":
                raise RegexSyntaxError(f"unterminated {{...}} in {pattern!r}")
            take()
            m = re.fullmatch(r"(\d+)(,(\d*)?)?", body)
            if not m:
                raise RegexSyntaxError(f"bad quantifier {{{body}}} in {pattern!r}")
            lo = int(m.group(1))
            hi = _INF if m.group(2) and not m.group(3) else (
                int(m.group(3)) if m.group(2) else lo)
            if hi is not _INF and hi < lo:
                raise RegexSyntaxError(f"bad quantifier {{{body}}} in {pattern!r}")
        else:
            return a
        if a[0] == "anchor":
            raise RegexSyntaxError(f"quantified anchor in {pattern!r}")
        if peek() in ("?", "*", "+"):
            raise RegexSyntaxError(f"double/lazy quantifier in {pattern!r}")
        return ("rep", a, lo, hi)

    def atom():
        c = take()
        if c == "(":
            if peek() == "?":
                take()
                if peek() == ":":
                    take()
                else:
                    raise RegexSyntaxError(
                        f"only (?:...) groups supported, in {pattern!r}")
            node = alt()
            if peek() != ")":
                raise RegexSyntaxError(f"unbalanced '(' in {pattern!r}")
            take()
            return node
        if c == "[":
            depth_guard = 0
            if peek() == "^":
                take()
            if peek() == "]":  # leading ] is literal in re; keep it simple
                take()
            while peek() not in (None, "]"):
                if take() == "\\":
                    if peek() is None:
                        break
                    take()
                depth_guard += 1
                if depth_guard > 1000:
                    raise RegexSyntaxError("class too long")
            if peek() != "]":
                raise RegexSyntaxError(f"unterminated [...] in {pattern!r}")
            take()
            return ("any",)  # class members never form required factors
        if c == ".":
            return ("any",)
        if c in ("^", "$"):
            return ("anchor", c)
        if c == "\\":
            e = peek()
            if e is None:
                raise RegexSyntaxError(f"trailing backslash in {pattern!r}")
            take()
            if e in _CLASS_ESCAPES:
                return ("any",)
            if e in _LIT_ESCAPES:
                return ("lit", _LIT_ESCAPES[e])
            if e in _SPECIAL or not e.isalnum():
                return ("lit", e)
            raise RegexSyntaxError(f"unsupported escape \\{e} in {pattern!r}")
        if c in ("*", "+", "?", ")"):
            raise RegexSyntaxError(f"dangling {c!r} in {pattern!r}")
        return ("lit", c)

    node = alt()
    if pos != n:
        raise RegexSyntaxError(f"unbalanced ')' in {pattern!r}")
    return node


# ---------------------------------------------------------------------------
# analysis: length bounds + required-factor segmentation
# ---------------------------------------------------------------------------
def _add(a, b):
    return _INF if a is _INF or b is _INF else a + b


def _mul(a, k):
    if k is _INF:
        return 0 if a == 0 else _INF
    return _INF if a is _INF else a * k


def len_bounds(node) -> tuple[int, int | None]:
    kind = node[0]
    if kind == "lit":
        return 1, 1
    if kind == "any":
        return 1, 1
    if kind == "anchor":
        return 0, 0
    if kind == "cat":
        lo = hi = 0
        for it in node[1]:
            l2, h2 = len_bounds(it)
            lo, hi = lo + l2, _add(hi, h2)
        return lo, hi
    if kind == "alt":
        bounds = [len_bounds(b) for b in node[1]]
        lo = min(b[0] for b in bounds)
        his = [b[1] for b in bounds]
        hi = _INF if any(h is _INF for h in his) else max(his)
        return lo, hi
    if kind == "rep":
        l2, h2 = len_bounds(node[1])
        return l2 * node[2], _mul(h2, node[3])
    raise AssertionError(kind)


def _literal_string(node) -> str | None:
    """The exact literal string a node always matches, or None."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "cat":
        parts = [_literal_string(it) for it in node[1]]
        return None if any(p is None for p in parts) else "".join(parts)
    if kind == "alt" and len(node[1]) == 1:
        return _literal_string(node[1][0])
    if kind == "rep" and node[2] == node[3]:
        s = _literal_string(node[1])
        return None if s is None else s * node[2]
    return None


def required_factors(pattern: str):
    """Segment the regex into required literal factors with inter-factor
    start-delta bounds. Returns (factors, deltas) where factors is a list of
    literal strings and deltas[i] = (lo, hi|None) bounds on
    start(factors[i+1]) - start(factors[i]). Factors are NECESSARY: every
    match contains each factor at a compatible offset (sound superset when
    probed). Empty factors list => nothing indexable (brute scan)."""
    ast = parse(pattern)
    lo_total, _ = len_bounds(ast)
    if lo_total == 0:
        raise RegexSyntaxError(
            f"regex {pattern!r} can match the empty string — not an index query")
    items = ast[1] if ast[0] == "cat" else [ast]

    factors: list[str] = []
    deltas: list[tuple[int, int | None]] = []
    run: list[str] = []
    # pending gap (chars) between end of last flushed factor and next factor
    g_lo, g_hi = 0, 0

    def flush_run():
        nonlocal run, g_lo, g_hi
        if not run:
            return
        f = "".join(run)
        if factors:
            prev_len = len(factors[-1])
            deltas.append((prev_len + g_lo, _add(prev_len, g_hi)))
        factors.append(f)
        run = []
        g_lo, g_hi = 0, 0

    def add_gap(lo, hi):
        nonlocal g_lo, g_hi
        flush_run()
        g_lo, g_hi = g_lo + lo, _add(g_hi, hi)

    for it in items:
        s = _literal_string(it)
        if s is not None:
            run.extend(s)
            continue
        if it[0] == "anchor":
            continue  # zero-width; verified exactly by re
        if it[0] == "rep":
            inner = _literal_string(it[1])
            if inner is not None and it[2] >= 1:
                # a{m,M}: first m copies are required, the rest is slack
                run.extend(inner * it[2])
                extra = _INF if it[3] is _INF else (it[3] - it[2]) * len(inner)
                if extra != 0:
                    add_gap(0, extra)
                continue
        lo, hi = len_bounds(it)
        add_gap(lo, hi)
    flush_run()
    return factors, deltas


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------
def _finditer_fn(pattern: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rx = re.compile(pattern)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, poss, matches = [], [], []
            for did, toks in zip(pdf["doc_id"], pdf["tokens"]):
                text = "".join(map(chr, toks))
                for m in rx.finditer(text):
                    ids.append(did)
                    poss.append(m.start())
                    matches.append(m.group())
            if ids:
                yield pd.DataFrame({
                    "doc_id": ids,
                    "pos": np.asarray(poss, dtype=np.int32),
                    "match": matches,
                })
    return fn


def _chain_ok(wlists: list[np.ndarray], spans: list[int],
              off_lo: list[int], off_hi: list) -> bool:
    """Backward interval DP: does some window chain satisfy every
    consecutive start-delta bound? Window w at span s bounds a factor start
    to [w*s, w*s + s - 1]; factor i's window survives iff some surviving
    factor-(i+1) window intersects [start_lo + off_lo, start_hi + off_hi].
    One searchsorted pass per factor pair — never a cross-product."""
    good = wlists[-1]
    for i in range(len(wlists) - 2, -1, -1):
        w1, s1, s2 = wlists[i], spans[i], spans[i + 1]
        hi_off = _BIG if off_hi[i] is _INF else off_hi[i]
        lo_start = w1 * s1 + off_lo[i]
        hi_start = w1 * s1 + (s1 - 1) + hi_off
        lo_w2 = -(-(lo_start - s2 + 1) // s2)
        hi_w2 = hi_start // s2
        keep = np.searchsorted(good, lo_w2, side="left") < np.searchsorted(
            good, hi_w2, side="right")
        good = w1[keep]
        if len(good) == 0:
            return False
    return True


def regex_search(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    pattern: str,
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
    markov=None,
    model: str | None = None,
    selective: bool = False,
) -> DataFrame:
    """(doc_id, pos, match): leftmost non-overlapping regex matches per doc
    (``re.finditer`` semantics) over the codepoint corpus. Required literal
    factors are probed through ONE shared cascade; docs survive only when
    every factor has windows satisfying the chain's start-delta bounds;
    survivors are finditer'd exactly. No factors (alternation-only regex) =>
    honest brute scan of every doc, still exact."""
    re.compile(pattern)  # surface invalid syntax early, with re's message
    if cfg.axis != "doc":
        raise NotImplementedError("regex_search routes on the doc axis")
    factors, deltas = required_factors(pattern)
    spark = corpus.sparkSession
    verify = _finditer_fn(pattern)

    factor_pats = [[ord(c) for c in f] for f in factors]
    cascade, exact = ([], list(range(len(factor_pats)))) if not factor_pats else _plan_batch(
        factor_pats, cfg, start_level, stats, freq, markov, model, selective)
    if stats_out is not None:
        stats_out["factors"] = factors
        stats_out["factor_deltas"] = deltas
        stats_out["cascaded"] = [factors[p] for p, *_ in cascade]
    if not cascade:
        # nothing indexable — exact brute scan (logged via stats_out)
        return corpus.mapInPandas(verify, REGEX_SCHEMA)

    # start-delta bounds between CONSECUTIVE CASCADED factors: unprunable
    # ('exact') factors between them dissolve into the delta (constraint
    # dropped => superset, still sound)
    casc_idx = [p for p, *_ in cascade]
    off_lo, off_hi = [], []
    for a, b in zip(casc_idx, casc_idx[1:]):
        lo = hi = 0
        for j in range(a, b):
            lo, hi = lo + deltas[j][0], _add(hi, deltas[j][1])
        off_lo.append(lo)
        off_hi.append(hi)

    specs = [s for _p, s, _f, _d in cascade]
    firsts = [f for _p, _s, f, _d in cascade]
    deepests = [d for _p, _s, _f, d in cascade]
    finished = _descend_batch(
        index, specs, firsts, deepests, doc_axis=True, spark=spark,
        stats_out=stats_out,
    )
    spans = [cfg.span(d) for d in deepests]
    k = len(cascade)
    empty = spark.createDataFrame([], REGEX_SCHEMA)
    parts, all_rows = [], []
    for i in range(k):
        fdf, n_i, rows = finished[i]
        if fdf is None and not rows:
            return empty  # a required factor is absent everywhere
        all_rows.append(rows)

    if all(r is not None for r in all_rows):
        # every frontier was collected (small): chain DP driver-side, docs
        # broadcast back — no extra job
        by_doc: dict[str, list[list[int]]] = {}
        for i, rows in enumerate(all_rows):
            for doc_id, w_id in rows:
                by_doc.setdefault(doc_id, [[] for _ in range(k)])[i].append(w_id)
        survivors = [
            d for d, ls in by_doc.items()
            if all(ls) and _chain_ok(
                [np.sort(np.asarray(x, dtype=np.int64)) for x in ls],
                spans, off_lo, off_hi)
        ]
        if stats_out is not None:
            stats_out["candidate_docs"] = len(survivors)
        if not survivors:
            return empty
        cand = spark.createDataFrame([(d,) for d in survivors], "doc_id string")
        docs = corpus.join(F.broadcast(cand), "doc_id", "left_semi")
        return docs.mapInPandas(verify, REGEX_SCHEMA)

    # large frontiers: distributed chain DP grouped per doc
    for i in range(k):
        fdf, _n, rows = finished[i]
        part = fdf if fdf is not None else spark.createDataFrame(
            rows, "doc_id string, w_id long")
        parts.append(part.select("doc_id", F.lit(i).alias("fid"), "w_id"))
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    grouped = union.groupBy("doc_id").agg(
        F.collect_list(F.struct("fid", "w_id")).alias("fw"))

    spans_l, lo_l, hi_l = list(spans), list(off_lo), list(off_hi)

    def dp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = []
            for did, fw in zip(pdf["doc_id"], pdf["fw"]):
                lists: list[list[int]] = [[] for _ in range(k)]
                for e in fw:
                    lists[e["fid"]].append(e["w_id"])
                if not all(lists):
                    continue
                if _chain_ok([np.sort(np.asarray(x, dtype=np.int64)) for x in lists],
                             spans_l, lo_l, hi_l):
                    ids.append(did)
            if ids:
                yield pd.DataFrame({"doc_id": ids})

    cand = grouped.mapInPandas(dp, schema="doc_id string")
    docs = corpus.join(cand, "doc_id", "left_semi")
    return docs.mapInPandas(verify, REGEX_SCHEMA)
