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
    start-delta bounds. Returns (factors, deltas, lead): factors is a list
    of literal strings, deltas[i] = (lo, hi|None) bounds on
    start(factors[i+1]) - start(factors[i]), and lead = (lo, hi|None)
    bounds on start(factors[0]) - start(match). Factors are NECESSARY:
    every match contains each factor at a compatible offset (sound
    superset when probed). Empty factors list => nothing indexable
    (brute scan; lead is then meaningless)."""
    ast = parse(pattern)
    lo_total, _ = len_bounds(ast)
    if lo_total == 0:
        raise RegexSyntaxError(
            f"regex {pattern!r} can match the empty string — not an index query")
    items = ast[1] if ast[0] == "cat" else [ast]

    factors: list[str] = []
    deltas: list[tuple[int, int | None]] = []
    lead: tuple[int, int | None] = (0, 0)
    run: list[str] = []
    # pending gap (chars) between end of last flushed factor and next factor
    g_lo, g_hi = 0, 0

    def flush_run():
        nonlocal run, g_lo, g_hi, lead
        if not run:
            return
        f = "".join(run)
        if factors:
            prev_len = len(factors[-1])
            deltas.append((prev_len + g_lo, _add(prev_len, g_hi)))
        else:
            lead = (g_lo, g_hi)
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
    return factors, deltas, lead


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


def _chain_survivors(wlists: list[np.ndarray], spans: list[int],
                     off_lo: list[int], off_hi: list) -> np.ndarray:
    """Backward interval DP: the FIRST factor's windows that can head a
    chain satisfying every consecutive start-delta bound. Window w at span
    s bounds a factor start to [w*s, w*s + s - 1]; factor i's window
    survives iff some surviving factor-(i+1) window intersects
    [start_lo + off_lo, start_hi + off_hi]. One searchsorted pass per
    factor pair — never a cross-product."""
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
            break
    return good


def _chain_ok(wlists, spans, off_lo, off_hi) -> bool:
    return len(_chain_survivors(wlists, spans, off_lo, off_hi)) > 0


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
        raise NotImplementedError(
            "regex_search routes on the doc axis; use global_regex_search "
            "for cfg.axis='global'")
    factors, deltas, _lead = required_factors(pattern)
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
    cand = _grouped_dp_docs(
        spark, [(fdf, rows) for fdf, _n, rows in (finished[i] for i in range(k))],
        spans, off_lo, off_hi)
    docs = corpus.join(cand, "doc_id", "left_semi")
    return docs.mapInPandas(verify, REGEX_SCHEMA)


def _grouped_dp_docs(spark, fin: list, spans, off_lo, off_hi) -> DataFrame:
    """Distributed chain DP for large frontiers: union the per-factor
    survivor frames, group per doc, run the interval DP in Arrow — returns
    DF(doc_id) of docs where some window chain satisfies every bound.
    ``fin`` holds (survivor_df_or_None, collected_rows_or_None) per factor."""
    k = len(fin)
    parts = []
    for i, (fdf, rows) in enumerate(fin):
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

    return grouped.mapInPandas(dp, schema="doc_id string")


def _chain_offsets(deltas, casc_fi: list[int]):
    """Start-delta bounds between CONSECUTIVE CASCADED factors — factors
    the planner couldn't cascade dissolve into the delta (constraint
    dropped => superset, sound)."""
    off_lo, off_hi = [], []
    for a, b in zip(casc_fi, casc_fi[1:]):
        lo = hi = 0
        for j in range(a, b):
            lo, hi = lo + deltas[j][0], _add(hi, deltas[j][1])
        off_lo.append(lo)
        off_hi.append(hi)
    return off_lo, off_hi


BATCH_REGEX_SCHEMA = "pattern_id int, doc_id string, pos int, match string"


def _finditer_batch_fn(patterns: list[str], brute_ids: list[int]):
    """Per-doc multi-regex finditer: each doc scans its surviving patterns
    (pids column) plus every brute pattern — text decoded ONCE per doc."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rxs = [re.compile(p) for p in patterns]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pids_out, ids, poss, matches = [], [], [], []
            has_pids = "pids" in pdf.columns
            for row in pdf.itertuples(index=False):
                did, toks = row.doc_id, row.tokens
                pids = list(row.pids) if has_pids and row.pids is not None else []
                text = "".join(map(chr, toks))
                for pid in pids + brute_ids:
                    for m in rxs[pid].finditer(text):
                        pids_out.append(pid)
                        ids.append(did)
                        poss.append(m.start())
                        matches.append(m.group())
            if ids:
                yield pd.DataFrame({
                    "pattern_id": np.asarray(pids_out, dtype=np.int32),
                    "doc_id": ids,
                    "pos": np.asarray(poss, dtype=np.int32),
                    "match": matches,
                })
    return fn


def regex_search_batch(
    corpus: DataFrame,
    index: DataFrame,
    cfg: HbiConfig,
    patterns: list[str],
    start_level: int | str | None = None,
    freq=None,
    stats=None,
    stats_out: dict | None = None,
    markov=None,
    model: str | None = None,
    selective: bool = False,
) -> DataFrame:
    """A whole regex dictionary through ONE shared cascade:
    (pattern_id, doc_id, pos, match), row-equal to a union of per-pattern
    regex_search calls. Every pattern's required factors flatten into one
    _plan_batch/_descend_batch descent (each factor enters at its own
    planned level); per-pattern chain DPs prune docs; one Arrow stage
    finditers each doc's surviving patterns (brute/alternation-only
    patterns scan every doc inside the same stage — honest, logged)."""
    if cfg.axis != "doc":
        raise NotImplementedError("regex_search_batch routes on the doc axis")
    if not patterns:
        raise ValueError("empty regex batch")
    for p in patterns:
        re.compile(p)
    segs = [required_factors(p) for p in patterns]
    spark = corpus.sparkSession

    flat: list[list[int]] = []
    owner: list[tuple[int, int]] = []
    for pid, (factors, _d, _l) in enumerate(segs):
        for fi, f in enumerate(factors):
            flat.append([ord(c) for c in f])
            owner.append((pid, fi))
    cascade, _exact = ([], []) if not flat else _plan_batch(
        flat, cfg, start_level, stats, freq, markov, model, selective)
    per_pat: dict[int, list[tuple[int, int, int]]] = {
        pid: [] for pid in range(len(patterns))}
    for ci, (p, _spec, _f, d) in enumerate(cascade):
        pid, fi = owner[p]
        per_pat[pid].append((ci, fi, cfg.span(d)))

    finished = {}
    if cascade:
        finished = _descend_batch(
            index,
            [s for _p, s, _f, _d in cascade],
            [f for _p, _s, f, _d in cascade],
            [d for _p, _s, _f, d in cascade],
            doc_axis=True, spark=spark, stats_out=stats_out,
        )

    brute_ids = [pid for pid, entries in per_pat.items() if not entries]
    if stats_out is not None:
        stats_out["brute_patterns"] = [patterns[p] for p in brute_ids]
    driver_pairs: list[tuple[str, int]] = []
    cand_parts: list[DataFrame] = []
    for pid, entries in per_pat.items():
        if not entries:
            continue
        _factors, deltas, _lead = segs[pid]
        casc_fi = [fi for _ci, fi, _s in entries]
        spans_p = [s for _ci, _fi, s in entries]
        off_lo, off_hi = _chain_offsets(deltas, casc_fi)
        fin = [finished[ci] for ci, _fi, _s in entries]
        if any(fdf is None and not rows for fdf, _n, rows in fin):
            continue  # a required factor is absent — pattern matches nothing
        if all(rows is not None for _fdf, _n, rows in fin):
            by_doc: dict[str, list[list[int]]] = {}
            for i, (_fdf, _n, rows) in enumerate(fin):
                for doc_id, w_id in rows:
                    by_doc.setdefault(
                        doc_id, [[] for _ in range(len(fin))])[i].append(w_id)
            driver_pairs.extend(
                (d, pid) for d, ls in by_doc.items()
                if all(ls) and _chain_ok(
                    [np.sort(np.asarray(x, dtype=np.int64)) for x in ls],
                    spans_p, off_lo, off_hi))
        else:
            cand_parts.append(
                _grouped_dp_docs(
                    spark, [(fdf, rows) for fdf, _n, rows in fin],
                    spans_p, off_lo, off_hi
                ).select("doc_id", F.lit(pid).alias("pattern_id")))

    cand: DataFrame | None = None
    if driver_pairs:
        cand = spark.createDataFrame(
            driver_pairs, "doc_id string, pattern_id int")
    for part in cand_parts:
        cand = part if cand is None else cand.unionByName(part)

    if cand is None and not brute_ids:
        return spark.createDataFrame([], BATCH_REGEX_SCHEMA)
    verify = _finditer_batch_fn(patterns, brute_ids)
    if cand is None:
        return corpus.mapInPandas(verify, BATCH_REGEX_SCHEMA)
    grouped = cand.groupBy("doc_id").agg(F.collect_set("pattern_id").alias("pids"))
    if not cand_parts:
        grouped = F.broadcast(grouped)
    docs = corpus.join(grouped, "doc_id", "left" if brute_ids else "inner")
    return docs.mapInPandas(verify, BATCH_REGEX_SCHEMA)


# ---------------------------------------------------------------------------
# global (one-stream) axis
# ---------------------------------------------------------------------------
GLOBAL_REGEX_SCHEMA = "gpos long, match string"


def _has_anchor(node) -> bool:
    kind = node[0]
    if kind == "anchor":
        return True
    if kind == "cat":
        return any(_has_anchor(it) for it in node[1])
    if kind == "alt":
        return any(_has_anchor(b) for b in node[1])
    if kind == "rep":
        return _has_anchor(node[1])
    return False


def _global_regex_verify_fn(pattern: str, sp: int, g0_lo: int, g0_hi: int):
    """Per-doc anchored scan: every stream position belongs to exactly ONE
    doc, so candidate windows are translated to per-doc LOCAL start ranges
    (clamped, merged) and re.match runs anchored at each — no distinct()
    needed downstream. The stitched tail (max match length - 1 tokens of
    the following stream) makes cross-document matches exact."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rx = re.compile(pattern)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            poss, matches = [], []
            for o, n, toks, wids in zip(
                pdf["doc_offset"], pdf["n_tok"], pdf["stitched"], pdf["wids"]
            ):
                o, n = int(o), int(n)
                text = "".join(map(chr, toks))
                if wids is None:
                    starts = range(n)
                else:
                    ws = np.sort(np.asarray(wids, dtype=np.int64))
                    lo = np.maximum(ws * sp - g0_hi - o, 0)
                    hi = np.minimum(ws * sp + sp - 1 - g0_lo - o, n - 1)
                    sel = hi >= lo
                    if not sel.any():
                        continue
                    lo, hi = lo[sel], hi[sel]
                    # merge overlapping ranges (ws sorted => lo sorted)
                    starts = []
                    cur_a, cur_b = int(lo[0]), int(hi[0])
                    for a, b in zip(lo[1:], hi[1:]):
                        if a <= cur_b + 1:
                            cur_b = max(cur_b, int(b))
                        else:
                            starts.extend(range(cur_a, cur_b + 1))
                            cur_a, cur_b = int(a), int(b)
                    starts.extend(range(cur_a, cur_b + 1))
                for p in starts:
                    m = rx.match(text, p)
                    if m:
                        poss.append(o + p)
                        matches.append(m.group())
            if poss:
                yield pd.DataFrame({
                    "gpos": np.asarray(poss, dtype=np.int64),
                    "match": matches,
                })
    return fn


def global_regex_search(
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
    """(gpos, match): ALL anchored matches of the regex in the ONE
    concatenated stream — for every stream position where the regex
    matches (leftmost-greedy at that position, re.match semantics), the
    position and matched text. Matches may cross document boundaries
    (stitched-tail verification). Differs deliberately from the doc axis'
    finditer semantics: per-position anchoring is the well-defined notion
    on an unbounded stream (non-overlap selection is prefix-dependent and
    would serialize), and it is what the per-position DuckDB twin checks.

    Requires a FINITE maximum match length (bounds the stitched tail and
    fragment truncation — refused otherwise) and no ^/$ anchors (string
    anchors are meaningless mid-stream). Candidate starts come from the
    cascaded factor windows shifted back by the leading-gap bounds; the
    cross-factor interval DP prunes further when the frontiers were
    collected (byte-capped), and honestly degrades to factor-1 windows
    when a frontier stayed distributed."""
    re.compile(pattern)
    if cfg.axis != "global":
        raise ValueError("global_regex_search needs cfg.axis='global'")
    ast = parse(pattern)
    if _has_anchor(ast):
        raise RegexSyntaxError(
            f"^/$ anchors are not meaningful on the stream axis: {pattern!r}")
    min_len, max_len = len_bounds(ast)
    if max_len is _INF:
        raise RegexSyntaxError(
            f"global regex needs a finite max match length: {pattern!r}")
    factors, deltas, lead = required_factors(pattern)
    spark = corpus.sparkSession
    if "doc_offset" not in corpus.columns:
        from ..corpus import with_global_offsets

        corpus = with_global_offsets(corpus)
    from .route import _stitched_corpus

    stitched = _stitched_corpus(corpus, int(max_len))

    factor_pats = [[ord(c) for c in f] for f in factors]
    cascade, exact = ([], []) if not factor_pats else _plan_batch(
        factor_pats, cfg, start_level, stats, freq, markov, model, selective)
    if stats_out is not None:
        stats_out["factors"] = factors
        stats_out["cascaded"] = [factors[p] for p, *_ in cascade]

    if not cascade:
        # honest brute: anchored scan at every stream position
        scan = stitched.select(
            "doc_offset", "n_tok", "stitched",
            F.lit(None).cast("array<long>").alias("wids"))
        return scan.mapInPandas(
            _global_regex_verify_fn(pattern, 1, 0, 0), GLOBAL_REGEX_SCHEMA)

    casc_idx = [p for p, *_ in cascade]
    # leading offset of the FIRST CASCADED factor (earlier exact factors
    # dissolve into it)
    g0_lo, g0_hi = lead
    for j in range(0, casc_idx[0]):
        g0_lo, g0_hi = g0_lo + deltas[j][0], _add(g0_hi, deltas[j][1])
    off_lo, off_hi = [], []
    for a, b in zip(casc_idx, casc_idx[1:]):
        lo = hi = 0
        for j in range(a, b):
            lo, hi = lo + deltas[j][0], _add(hi, deltas[j][1])
        off_lo.append(lo)
        off_hi.append(hi)
    # finite max_len bounds every gap, so the lead bounds are finite ints
    g0_lo = int(g0_lo)
    g0_hi = int(max_len) if g0_hi is _INF else int(g0_hi)

    specs = [s for _p, s, _f, _d in cascade]
    firsts = [f for _p, _s, f, _d in cascade]
    deepests = [d for _p, _s, _f, d in cascade]
    finished = _descend_batch(
        index, specs, firsts, deepests, doc_axis=False, spark=spark,
        stats_out=stats_out,
    )
    spans = [cfg.span(d) for d in deepests]
    empty = spark.createDataFrame([], GLOBAL_REGEX_SCHEMA)
    all_rows = []
    for i in range(len(cascade)):
        fdf, _n, rows = finished[i]
        if fdf is None and not rows:
            return empty
        all_rows.append(rows)

    sp1 = spans[0]
    if all(r is not None for r in all_rows):
        wlists = [np.sort(np.asarray([w for (w,) in rows], dtype=np.int64))
                  for rows in all_rows]
        good = _chain_survivors(wlists, spans, off_lo, off_hi)
        if stats_out is not None:
            stats_out["chain_dp"] = "driver"
            stats_out["candidate_windows"] = int(len(good))
        if len(good) == 0:
            return empty
        cand = F.broadcast(spark.createDataFrame(
            [(int(w),) for w in good], "w_id long"))
    else:
        # a frontier stayed distributed: degrade to factor-1 windows only
        fdf, _n, rows = finished[0]
        cand = fdf if fdf is not None else spark.createDataFrame(
            rows, "w_id long")
        if stats_out is not None:
            stats_out["chain_dp"] = "skipped-large-frontier"

    # docs overlapping any candidate window's lead-shifted start interval
    # [w*sp - g0_hi, w*sp + sp - 1 - g0_lo]; floor() keeps the bounds a
    # superset under negative division
    doc_windows = stitched.select(
        "doc_offset", "n_tok",
        F.explode(
            F.sequence(
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor((F.col("doc_offset") - (sp1 - 1) + g0_lo) / sp1)
                    .cast("long")),
                F.floor(
                    (F.col("doc_offset") + F.col("n_tok") - 1 + g0_hi) / sp1
                ).cast("long"),
            )
        ).alias("w_id"),
    )
    hit_docs = (
        doc_windows.join(cand, "w_id")
        .groupBy("doc_offset")
        .agg(F.collect_set("w_id").alias("wids"))
    )
    cand_docs = stitched.join(hit_docs, "doc_offset").select(
        "doc_offset", "n_tok", "stitched", "wids")
    return cand_docs.mapInPandas(
        _global_regex_verify_fn(pattern, sp1, g0_lo, g0_hi),
        GLOBAL_REGEX_SCHEMA)
