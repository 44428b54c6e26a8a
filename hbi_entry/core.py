"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family (SURVEY.md §2) as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
ANSI-SQL twin for every query whose semantics are SQL-expressible. Sketch
*estimate* queries (CMS/HLL/KLL/t-digest/LSH) are deliberately oracle-free —
their contracts are error bounds, verified in tests/ — while every
exact-answer path (pattern search, membership, dedup, text, windowed aggs)
is oracle-checked bit-for-bit.

Shared tokenizer: tokens = UTF codepoints of documents.text — the same
definition in Spark built-ins and DuckDB SQL, so both engines see the same
(doc_id, tokens, n_tok, source) corpus.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.functions import with_positions
from hierarchical_bloom_filter_index_spark.operators import (
    build_index,
    frequency_summary,
    index_stats,
    pattern_search,
    window_membership,
)
from hierarchical_bloom_filter_index_spark.operators import dedup as D
from hierarchical_bloom_filter_index_spark.operators import drift as DR
from hierarchical_bloom_filter_index_spark.operators import similarity as S
from hierarchical_bloom_filter_index_spark.operators import text as T
from hierarchical_bloom_filter_index_spark.operators.aggregates import (
    collect_sketch,
    grouped_sketches,
    sketch_aggregate,
)
from hierarchical_bloom_filter_index_spark.sketches import (
    CountMinSketch,
    HyperLogLog,
    KLL,
    TDigest,
)

CFG = HbiConfig(tree_span=1024, leaf_span=32, fpr=0.01, vocab=128, seed=42)

PAT_PRESENT = [ord(c) for c in "data merge"]
PAT_MISSING = [ord(c) for c in "data merge"[:4] + "\x01" + "data merge"[5:]]
PAT_RARE = [ord(c) for c in "slow fast table"]
PROBE_TOKENS = [32, 97, 101, 115, 116]
QUANTILES = [0.25, 0.5, 0.75]
MOD, BASE = 1_000_000_007, 131

_CACHE: dict[tuple[str, str], object] = {}

_TMPDIRS: list[str] = []


def _tmpdir(prefix: str) -> str:
    """mkdtemp + atexit cleanup.  Driver queries build scratch stores /
    layouts per invocation; bench reps would otherwise accumulate
    corpus-sized directories for the process lifetime (review finding).
    Cleanup is registered once and sweeps every dir this process made."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    if not _TMPDIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _TMPDIRS])
    _TMPDIRS.append(d)
    return d


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = ("corpus", sf_dir)
    if key not in _CACHE:
        # AQE regenerates full plan strings on every re-plan; deep cascades'
        # plan text can OOM a small driver heap unless capped (runtime conf)
        spark.conf.set("spark.sql.maxPlanStringLength", str(512 * 1024))
        _CACHE[key] = C.corpus_from_documents(spark, sf_dir).cache()
    return _CACHE[key]


def _index(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = ("index", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = build_index(_corpus(spark, sf_dir), CFG).cache()
    return _CACHE[key]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "lang", "source"
    )


# ---------------------------------------------------------------------------
# shared oracle fragments
# ---------------------------------------------------------------------------
CORPUS_CTE = """corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_transform(string_split(text, ''), c -> ascii(c)) AS tokens,
         CAST(length(text) AS INT) AS n_tok,
         source
  FROM documents
)"""


def _pat_sql(pattern: list[int]) -> str:
    return "[" + ", ".join(str(int(t)) for t in pattern) + "]"


def _chain_sql(cid: int, toks, w: int, global_axis: bool) -> str:
    """One chain's oracle: start positions of toks in order, each gap in
    (0, w] — a (k-1)-way self-join on the flat position table (DISTINCT:
    several completions share a start)."""
    pos, out = ("g", "gpos") if global_axis else ("p", "pos")
    doc = "" if global_axis else "f0.doc_id AS doc_id, "
    joins = "".join(
        f"\nJOIN flat f{i} ON "
        + ("" if global_axis else f"f{i}.doc_id = f0.doc_id AND ")
        + f"f{i}.t = {int(t)} AND f{i}.{pos} > f{i-1}.{pos} "
          f"AND f{i}.{pos} <= f{i-1}.{pos} + {int(w)}"
        for i, t in enumerate(toks[1:], start=1))
    cast = "BIGINT" if global_axis else "INT"
    return (f"SELECT DISTINCT CAST({cid} AS INT) AS chain_id, {doc}"
            f"CAST(f0.{pos} AS {cast}) AS {out}\nFROM flat f0{joins}"
            f"\nWHERE f0.t = {int(toks[0])}")


def _set_chain_sql(cid: int, slots, w: int, global_axis: bool) -> str:
    """One SET chain's oracle: start positions where token[x_i] ∈ slot_i in
    order, each gap in (0, w] — the _chain_sql join with list_contains
    slot-membership instead of token equality."""
    pos, out = ("g", "gpos") if global_axis else ("p", "pos")
    doc = "" if global_axis else "f0.doc_id AS doc_id, "

    def inset(i, s):
        return f"list_contains([{', '.join(str(int(t)) for t in s)}], f{i}.t)"

    joins = "".join(
        f"\nJOIN flat f{i} ON "
        + ("" if global_axis else f"f{i}.doc_id = f0.doc_id AND ")
        + f"{inset(i, s)} AND f{i}.{pos} > f{i-1}.{pos} "
          f"AND f{i}.{pos} <= f{i-1}.{pos} + {int(w)}"
        for i, s in enumerate(slots[1:], start=1))
    cast = "BIGINT" if global_axis else "INT"
    return (f"SELECT DISTINCT CAST({cid} AS INT) AS chain_id, {doc}"
            f"CAST(f0.{pos} AS {cast}) AS {out}\nFROM flat f0{joins}"
            f"\nWHERE {inset(0, slots[0])}")


# --- 64-bit wrap-around hash in ANSI SQL ------------------------------------
# The sampler oracles (bottomk_tokens, hops_representatives) need the EXACT
# sketch priority hash64(token, seed) = splitmix64(token ^ s) in DuckDB.
# BIGINT arithmetic is overflow-strict, so the chain runs in HUGEINT with
# explicit mod-2^64 folds; xor happens on the two's-complement BIGINT view
# (xor is bit-pattern only, signedness irrelevant); the wrapping 64x64
# multiply splits the constant into 32-bit halves so every intermediate
# stays under 2^97 << HUGEINT's 2^127 ceiling.
_P64 = 1 << 64


def _sql_mul64(col: str, m: int) -> str:
    hi, lo = m >> 32, m & 0xFFFFFFFF
    return (f"((({col}) * {lo} + ((({col}) * {hi}) % 4294967296) * 4294967296)"
            f" % {_P64})")


def _sql_xsr(col: str, sh: int) -> str:
    """col ^ (col >> sh) for a HUGEINT col in [0, 2^64)."""
    a = (f"CAST(({col}) - CASE WHEN ({col}) >= {1 << 63} THEN {_P64} ELSE 0 END"
         f" AS BIGINT)")
    b = f"CAST(({col}) // {1 << sh} AS BIGINT)"  # sh >= 1: result < 2^63
    x = f"xor({a}, {b})"
    return f"(CAST({x} AS HUGEINT) + CASE WHEN {x} < 0 THEN {_P64} ELSE 0 END)"


def _seed_mix_const(seed: int) -> int:
    """The per-seed constant s of sketches.hashing.hash64 (splitmix64 of the
    mixed seed) — computed once in Python, inlined as a literal."""
    import numpy as _np

    from hierarchical_bloom_filter_index_spark.sketches.hashing import splitmix64

    mixed = ((seed & 0xFFFFFFFFFFFFFFFF) * 0xD6E8FEB86659FD93
             + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    return int(splitmix64(_np.asarray([mixed], dtype=_np.uint64))[0])


def _splitmix_ctes(seed: int) -> str:
    """CTE chain: distinct corpus tokens -> column ``_h`` = hash64(tok, seed)
    (bit-exact vs the numpy kernel — prototype-verified). Expects CORPUS_CTE
    + POS_CTE upstream."""
    s = _seed_mix_const(seed)
    s_signed = s - _P64 if s >= (1 << 63) else s
    g, m1, m2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    xor_in = f"xor(CAST(tok AS BIGINT), CAST({s_signed} AS BIGINT))"
    return f"""toks AS (SELECT DISTINCT CAST(tokens[i] AS BIGINT) AS tok FROM pos),
keyed AS (SELECT tok, CAST({xor_in} AS HUGEINT)
          + CASE WHEN {xor_in} < 0 THEN {_P64} ELSE 0 END AS h FROM toks),
sm0 AS (SELECT tok, (h + {g}) % {_P64} AS _h0 FROM keyed),
sm1 AS (SELECT tok, {_sql_mul64(_sql_xsr('_h0', 30), m1)} AS _h1 FROM sm0),
sm2 AS (SELECT tok, {_sql_mul64(_sql_xsr('_h1', 27), m2)} AS _h2 FROM sm1),
sm3 AS (SELECT tok, {_sql_xsr('_h2', 31)} AS _h FROM sm2)"""


# DuckDB 1.0 can't lateral-join the generate_series TABLE function on a
# column, but the scalar list form unnest(generate_series(1, col)) works.
POS_CTE = """pos AS (
  SELECT doc_id, source, tokens, n_tok,
         unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i
  FROM corpus
)"""


def _pattern_oracle(pattern: list[int]) -> str:
    m = len(pattern)
    return f"""WITH {CORPUS_CTE}
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos
FROM (SELECT doc_id, tokens,
             unnest(generate_series(1, CAST(n_tok - {m} + 1 AS BIGINT))) AS i
      FROM corpus)
WHERE tokens[i : i + {m} - 1] = {_pat_sql(pattern)}"""


def _wildcard_oracle(pattern: list) -> str:
    m = len(pattern)
    conds = " AND ".join(
        f"tokens[i + {j}] = {int(v)}" for j, v in enumerate(pattern) if v is not None
    )
    return f"""WITH {CORPUS_CTE}
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos
FROM (SELECT doc_id, tokens,
             unnest(generate_series(1, CAST(n_tok - {m} + 1 AS BIGINT))) AS i
      FROM corpus)
WHERE {conds}"""


def _global_wildcard_oracle(pattern: list) -> str:
    lits = [(j, int(v)) for j, v in enumerate(pattern) if v is not None]
    j0, v0 = lits[0]
    joins = " ".join(
        f"JOIN flat f{j} ON f{j}.g = f0.g + {j - j0} AND f{j}.t = {v}"
        for j, v in lits[1:]
    )
    m = len(pattern)
    return f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
tot AS (SELECT SUM(n_tok) AS n FROM corpus)
SELECT CAST(f0.g - {j0} AS BIGINT) AS gpos
FROM flat f0 {joins}, tot
WHERE f0.t = {v0} AND f0.g - {j0} >= 0 AND f0.g - {j0} + {m} <= tot.n"""


def _occ(col: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return f"((length({col}) - length(replace({col}, '{esc}', ''))) // {len(needle)})"


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------
def _planner_inputs(spark: SparkSession, sf_dir: str):
    """(frequency CMS, per-level stats) for cost-based start-level selection,
    built once per sf_dir (the reference's estimator + HbiStats role)."""
    key = ("planner", sf_dir)
    if key not in _CACHE:
        freq = frequency_summary(_corpus(spark, sf_dir), CFG)
        stats = index_stats(_index(spark, sf_dir), CFG)
        _CACHE[key] = (freq, stats)
    return _CACHE[key]


TOPK_DOCS_K = 10


# gapped-literal pattern 'd?ta m?rge' — wildcards at the vowel slots, so the
# cascade probes the 8 literals and the verifier checks only those offsets
PAT_WILDCARD = [ord("d"), None, ord("t"), ord("a"), ord(" "),
                ord("m"), None, ord("r"), ord("g"), ord("e")]


# regex-lite char classes: d[ao]ta m[ae]rge — matches 'data merge' and
# its class variants; classes verified, literals probed
PAT_CHARCLASS = [ord("d"), [ord("a"), ord("o")], ord("t"), ord("a"), ord(" "),
                 ord("m"), [ord("e"), ord("a")], ord("r"), ord("g"), ord("e")]


def _charclass_oracle(pattern: list) -> str:
    m = len(pattern)
    conds = []
    for j, v in enumerate(pattern):
        if v is None:
            continue
        if isinstance(v, (list, tuple, set)):
            conds.append(
                f"tokens[i + {j}] IN ({', '.join(str(int(x)) for x in sorted(v))})")
        else:
            conds.append(f"tokens[i + {j}] = {int(v)}")
    return f"""WITH {CORPUS_CTE}
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos
FROM (SELECT doc_id, tokens,
             unnest(generate_series(1, CAST(n_tok - {m} + 1 AS BIGINT))) AS i
      FROM corpus)
WHERE {" AND ".join(conds)}"""


PAT_EDIT = [ord(c) for c in "data mmerge"]  # one INSERTED char vs 'data merge'


def _global_kedit_oracle(pattern: list[int], d: int) -> str:
    """Per-doc stitched verification in SQL: each doc's text plus the next
    m+d-1 stream characters (ONE successor doc suffices: min doc length
    in the testdata is 44 >> m+d-1), positions restricted to the doc."""
    pat = "".join(chr(int(t)) for t in pattern).replace("'", "''")
    m = len(pattern)
    least = ", ".join(
        f"levenshtein(substr(stitched, CAST(i AS INT), {L}), '{pat}')"
        for L in range(max(m - d, 0), m + d + 1)
    )
    return f"""WITH {CORPUS_CTE},
docs AS (
  SELECT doc_id, text, length(text) AS n,
         COALESCE(SUM(length(text)) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o,
         COALESCE(LEAD(text) OVER (ORDER BY doc_id), '') AS nxt
  FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents)
),
st AS (SELECT doc_id, o, n, text || substr(nxt, 1, {m + d - 1}) AS stitched FROM docs)
SELECT CAST(o + i - 1 AS BIGINT) AS gpos
FROM (SELECT o, stitched, unnest(generate_series(1, CAST(n AS BIGINT))) AS i FROM st)
WHERE LEAST({least}) <= {d}"""


def _fuzzy_topk_oracle(pattern: list[int], d: int, k: int) -> str:
    pat = "".join(chr(int(t)) for t in pattern).replace("'", "''")
    m = len(pattern)
    least = ", ".join(
        f"levenshtein(substr(text, CAST(i AS INT), {L}), '{pat}')"
        for L in range(max(m - d, 0), m + d + 1)
    )
    return f"""SELECT doc_id, pos, dist FROM (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(i - 1 AS INTEGER) AS pos,
         CAST(LEAST({least}) AS INTEGER) AS dist
  FROM (SELECT doc_id, text, unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS i
        FROM documents))
WHERE dist <= {d}
ORDER BY dist, doc_id, pos LIMIT {k}"""


def _kedit_oracle(pattern: list[int], d: int) -> str:
    pat = "".join(chr(int(t)) for t in pattern).replace("'", "''")
    m = len(pattern)
    least = ", ".join(
        f"levenshtein(substr(text, CAST(i AS INT), {L}), '{pat}')"
        for L in range(max(m - d, 0), m + d + 1)
    )
    return f"""SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(i - 1 AS INTEGER) AS pos
FROM (SELECT doc_id, text, unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS i
      FROM documents)
WHERE LEAST({least}) <= {d}"""


# dictionary workload: a corrupted needle (Hamming), a doubled-letter typo
# (edit), and a rare needle with two mismatches — one cascade for all
PAT_RARE2 = [t + (1 if i in (2, 9) else 0) for i, t in enumerate(PAT_RARE)]
APPROX_BATCH = [
    (PAT_MISSING, 1, "hamming"),
    (PAT_EDIT, 1, "edit"),
    (PAT_RARE2, 2, "hamming"),
]


def _global_fuzzy_topk_oracle(pattern: list[int], d: int, k: int) -> str:
    """Stitched-LEAD global distances (same construction as the global
    k-edit oracle), ranked by (dist, gpos)."""
    pat = "".join(chr(int(t)) for t in pattern).replace("'", "''")
    m = len(pattern)
    least = ", ".join(
        f"levenshtein(substr(stitched, CAST(i AS INT), {L}), '{pat}')"
        for L in range(max(m - d, 0), m + d + 1)
    )
    return f"""WITH {CORPUS_CTE},
docs AS (
  SELECT doc_id, text, length(text) AS n,
         COALESCE(SUM(length(text)) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o,
         COALESCE(LEAD(text) OVER (ORDER BY doc_id), '') AS nxt
  FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents)
),
st AS (SELECT o, n, text || substr(nxt, 1, {m + d - 1}) AS stitched FROM docs)
SELECT gpos, dist FROM (
  SELECT CAST(o + i - 1 AS BIGINT) AS gpos, CAST(LEAST({least}) AS INTEGER) AS dist
  FROM (SELECT o, stitched, unnest(generate_series(1, CAST(n AS BIGINT))) AS i FROM st))
WHERE dist <= {d}
ORDER BY dist, gpos LIMIT {k}"""


def _kmismatch_oracle(pattern: list[int], d: int) -> str:
    m = len(pattern)
    return f"""WITH {CORPUS_CTE}
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos
FROM (SELECT doc_id, tokens,
             unnest(generate_series(1, CAST(n_tok - {m} + 1 AS BIGINT))) AS i
      FROM corpus WHERE n_tok >= {m})
WHERE len(list_filter(tokens[i : i + {m} - 1],
                      (x, j) -> x != ({_pat_sql(pattern)})[j])) <= {d}"""


def _global_kmismatch_oracle(pattern: list[int], d: int) -> str:
    """Mismatch count per global start g0 via an offsets cross join over the
    flat stream: SUM of per-offset inequality indicators, COUNT(*) = m
    keeps only full windows (stream-tail starts drop out naturally)."""
    m = len(pattern)
    return f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
offs AS (SELECT unnest(generate_series(0, {m - 1})) AS j)
SELECT CAST(g0 AS BIGINT) AS gpos
FROM (SELECT f.g - o.j AS g0,
             CASE WHEN f.t != ({_pat_sql(pattern)})[o.j + 1] THEN 1 ELSE 0 END AS mm
      FROM flat f, offs o
      WHERE f.g - o.j >= 0)
GROUP BY g0
HAVING COUNT(*) = {m} AND SUM(mm) <= {d}"""


BATCH_PATTERNS = [PAT_PRESENT, PAT_RARE, PAT_MISSING, [ord(c) for c in " the "]]


# Boolean retrieval workload: docs with "data" AND "merge" but NOT the rare
# phrase — all three patterns present at sf0.01, so every leg is exercised
BOOL_MUST = [[ord(c) for c in "data"], [ord(c) for c in "merge"]]
BOOL_MUST_NOT = [[ord(c) for c in "slow fast table"]]


KWIC_CONTEXT = 6


def _contexts_oracle(pattern: list[int], c: int) -> str:
    m = len(pattern)
    return f"""WITH {CORPUS_CTE},
matches AS (
SELECT doc_id, tokens, n_tok, CAST(i - 1 AS INTEGER) AS pos
FROM (SELECT doc_id, tokens, n_tok,
             unnest(generate_series(1, CAST(n_tok - {m} + 1 AS BIGINT))) AS i
      FROM corpus)
WHERE tokens[i : i + {m} - 1] = {_pat_sql(pattern)})
SELECT doc_id, pos, CAST(o AS INTEGER) AS off,
       tokens[pos + o + 1] AS tok
FROM (SELECT doc_id, tokens, pos,
             unnest(generate_series(GREATEST(-{c}, -pos),
                                    LEAST({m + c}, n_tok - pos) - 1)) AS o
      FROM matches)"""


# CNF retrieval: (data OR query) AND (merge OR join) AND NOT the rare phrase
CNF_CLAUSES = [[[ord(c) for c in "data"], [ord(c) for c in "query"]],
               [[ord(c) for c in "merge"], [ord(c) for c in "join"]]]
CNF_MUST_NOT = [[ord(c) for c in "slow fast table"]]


# BM25 workload: two mid-frequency words, one stopword-ish term, one rare
# phrase (idf spans the whole range); k deep enough to cross tie groups
BM25_TERMS = [[ord(c) for c in "data"], [ord(c) for c in "merge"],
              [ord(c) for c in " the "], [ord(c) for c in "slow fast table"]]
BM25_K = 15
BM25_K1, BM25_B = 1.2, 0.75


def _bm25_oracle(terms: list[list[int]], k: int, k1: float, b: float) -> str:
    """DuckDB twin of pattern_bm25_topk: the SAME IEEE-754 expression tree
    (parenthesization, all-double operands, left-to-right term sum) so the
    score column matches bit-for-bit. Scalar constants are injected as
    repr() of the Python-computed double (shortest round-trip string)."""
    k1, b = float(k1), float(b)
    n = len(terms)
    hit_parts = "\nUNION ALL\n".join(
        f"SELECT {ti} AS pid, doc_id FROM ({_pattern_oracle(t)})"
        for ti, t in enumerate(terms)
    )
    pivot = ",\n       ".join(
        f"COALESCE(MAX(CASE WHEN pid = {t} THEN s END), CAST(0.0 AS DOUBLE)) AS _s{t}"
        for t in range(n)
    )
    total = " + ".join(f"_s{t}" for t in range(n))
    return f"""WITH hits AS (
{hit_parts}
),
tf AS (SELECT pid, doc_id, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM hits GROUP BY pid, doc_id),
dfreq AS (SELECT pid, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY pid),
gstats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                  CAST(SUM(length(text)) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM documents),
dls AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               CAST(length(text) AS DOUBLE) AS dl FROM documents),
scored AS (
  SELECT tf.doc_id,
         tf.pid,
         ((g.n_docs - d.df + CAST(0.5 AS DOUBLE)) / (d.df + CAST(0.5 AS DOUBLE)))
         * ((tf.tf * CAST({k1 + 1.0!r} AS DOUBLE))
            / (tf.tf + CAST({k1!r} AS DOUBLE)
               * (CAST({1.0 - b!r} AS DOUBLE)
                  + CAST({b!r} AS DOUBLE) * (dls.dl / g.avgdl)))) AS s
  FROM tf
  JOIN dfreq d USING (pid)
  JOIN dls ON tf.doc_id = dls.doc_id, gstats g),
agg AS (SELECT doc_id, {pivot},
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM scored GROUP BY doc_id)
SELECT doc_id, {total} AS score, n_terms_hit
FROM agg
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


# regex report(): required-factor chain through the shared cascade, exact
# finditer verification (operators/regex.py). Two design points: a bounded
# factor-chain delta (optional 's' between the factors) and a bounded
# wildcard gap (single selective factor, doc-level pruning only).
REGEX_CHAIN = "customers? (?:join|merge|scan)"
REGEX_GAP = "hash.{1,15}(?:join|agg)"


def _q_regex(pattern: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from hierarchical_bloom_filter_index_spark.operators.regex import (
            regex_search,
        )

        freq, stats = _planner_inputs(spark, sf_dir)
        return (
            regex_search(
                _corpus(spark, sf_dir), _index(spark, sf_dir), CFG, pattern,
                start_level="auto", freq=freq, stats=stats,
            )
            .groupBy("doc_id", "match")
            .agg(F.count(F.lit(1)).alias("n_matches"))
        )

    run.__doc__ = (
        "REGEX report(): leftmost non-overlapping matches of "
        f"{pattern!r} aggregated per (doc, matched string). Required "
        "literal factors probed through ONE shared cascade "
        "(operators/regex.py), factor-chain interval DP prunes docs, "
        "re.finditer decides exactly — the same leftmost-first semantics "
        "DuckDB's RE2 regexp_extract_all implements for this subset, so "
        "the oracle is an equality."
    )
    return run


REGEX_BATCH = [
    REGEX_CHAIN,
    REGEX_GAP,
    "(?:fast|slow) (?:scan|sort)",
    "zebra+x",             # absent factor — early empty via the cascade
    "ta(?:ble|sk)s?",
    "(?:data|key)|stream",  # alternation-only — honest brute rider
]


def _regex_batch_oracle(patterns: list[str]) -> str:
    parts = []
    for pid, pat in enumerate(patterns):
        esc = pat.replace("'", "''")
        parts.append(f"""SELECT CAST({pid} AS INTEGER) AS pattern_id,
       CAST(doc_id AS VARCHAR) AS doc_id, m AS match,
       CAST(COUNT(*) AS BIGINT) AS n_matches
FROM documents, UNNEST(regexp_extract_all(text, '{esc}')) AS t(m)
GROUP BY 1, 2, 3""")
    return "\nUNION ALL\n".join(parts)


GLOBAL_REGEX = "customer.{1,10}(?:join|merge)"
GLOBAL_REGEX_MAXLEN = 8 + 10 + 5  # finite by construction (bounded gap)


def _global_regex_oracle(pattern: str, max_len: int) -> str:
    esc = pattern.replace("'", "''")
    return f"""WITH s AS (
  SELECT string_agg(text, '' ORDER BY CAST(doc_id AS VARCHAR)) AS st
  FROM documents
),
p AS (SELECT st, unnest(generate_series(1, length(st))) AS i FROM s)
SELECT CAST(i - 1 AS BIGINT) AS gpos,
       regexp_extract(substr(st, i, {max_len}), '^(?:{esc})') AS match
FROM p
WHERE regexp_matches(substr(st, i, {max_len}), '^(?:{esc})')"""


def _regex_oracle(pattern: str) -> str:
    esc = pattern.replace("'", "''")
    return f"""WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         UNNEST(regexp_extract_all(text, '{esc}')) AS match
  FROM documents
)
SELECT doc_id, match, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM m GROUP BY doc_id, match"""


def _pattern_batch_oracle(patterns: list[list[int]]) -> str:
    parts = []
    for p, pat in enumerate(patterns):
        m = len(pat)
        parts.append(
            f"""SELECT CAST({p} AS INTEGER) AS pattern_id, doc_id,
       CAST(i - 1 AS INTEGER) AS pos
FROM (SELECT doc_id, tokens,
             unnest(generate_series(1, CAST(n_tok - {m} + 1 AS BIGINT))) AS i
      FROM corpus)
WHERE tokens[i : i + {m} - 1] = {_pat_sql(pat)}"""
        )
    return f"WITH {CORPUS_CTE}\n" + "\nUNION ALL\n".join(parts)


CHAIN_TOKENS = [ord("t"), ord("h"), ord("e")]
CHAIN_W = 3


# Batched proximity workload: distinct-token pair both ways, an equal-token
# pair (self-positions excluded), a rare anchor with a wide radius, and two
# ORDERED entries (A strictly before B) sharing the same one scan.
PROX_BATCH = [
    (ord("q"), ord("e"), 6),
    (ord("e"), ord("q"), 2),
    (ord("q"), ord("q"), 5),
    (ord("x"), ord(" "), 3),
    (ord("e"), ord("q"), 6, True),
    (ord("q"), ord("q"), 5, True),
]


# Stream-axis batched proximity workload: mixed radii (halo = max), an
# equal-token pair, and an ordered entry sharing the scan
GPROX_BATCH = [
    (ord("q"), ord("e"), 6),
    (ord("e"), ord("q"), 2),
    (ord("q"), ord("q"), 5),
    (ord("e"), ord("q"), 6, True),
]


# Any-of SET proximity workloads (synonym-set sides): overlapping sides, an
# absent member, and an ordered entry share one scan per axis
SETPROX_BATCH = [
    ((ord("q"), ord("x")), (ord("e"),), 6),
    ((ord("q"),), (ord("q"), ord("e")), 4),
    ((ord("x"), ord("j")), (ord(" "),), 3, True),
]
GSETPROX_BATCH = [
    ((ord("q"), ord("x")), (ord("e"),), 6),
    ((ord("q"),), (ord("q"), ord("e")), 2),
    ((ord("e"),), (ord("q"), ord("x")), 6, True),
]


# Batched chain workload: the single-chain query's chain, a rare-anchor
# 2-chain, a k=1 degenerate, and a 4-token chain (mixed lengths + slops
# share the one scan)
CHAIN_BATCH = [
    (CHAIN_TOKENS, CHAIN_W),
    ([ord("q"), ord("e")], 5),
    ([ord("x")], 2),
    ([ord("t"), ord("h"), ord("e"), ord("r")], 4),
]
GCHAIN_BATCH = CHAIN_BATCH[:3]


# Batched NOT-proximity workload: the frequent token with a rare B (mostly
# certified), a rare A with a frequent B (anti-check dominant), an isolated
# equal-token entry, an absent B (pure certificate), and an ordered entry.
NEG_BATCH = [
    (ord("e"), ord("q"), 6),
    (ord("q"), ord("e"), 4),
    (ord("q"), ord("q"), 5),
    (ord("x"), ord("Z"), 3),
    (ord("e"), ord("q"), 6, True),
]


# Stream-axis negated workload (cross-doc disqualification included)
GNEG_BATCH = [
    (ord("e"), ord("q"), 6),
    (ord("q"), ord("q"), 5),
    (ord("e"), ord("q"), 6, True),
]


# Negated SET workloads: any-of A with NO any-of B within w — including an
# A∩B overlap (per-position self-hit) and an everywhere-absent B set
NEGSET_BATCH = [
    ((ord("q"),), (ord("e"), ord("a")), 3),
    ((ord("q"), ord("x")), (ord("q"), ord(" ")), 4),
    ((ord("x"),), (ord("Z"),), 5),
    ((ord("e"),), (ord("q"), ord("x")), 6, True),
]
GNEGSET_BATCH = [
    ((ord("q"),), (ord("e"), ord("a")), 3),
    ((ord("q"), ord("x")), (ord("q"), ord(" ")), 4),
    ((ord("e"),), (ord("q"), ord("x")), 6, True),
]


# SET-chain (synonym-phrase) workloads: per-slot alternative sets, mixed
# lengths/slops incl. a k=1 any-of degenerate
SETCHAIN_BATCH = [
    ([(ord("d"), ord("t")), (ord("a"),)], 3),
    ([(ord("q"),), (ord("u"), ord("e")), (ord("e"), ord("a"))], 5),
    ([(ord("x"), ord("q"))], 7),
]
GSETCHAIN_BATCH = [
    ([(ord("d"), ord("t")), (ord("a"),)], 3),
    ([(ord("q"),), (ord("u"), ord("e")), (ord("e"), ord("a"))], 5),
    ([(ord("x"), ord("q"))], 7),
]


HH_K, HH_PHI = 1024, 0.002  # MG capacity / heavy-hitter frequency threshold
# k+1 > 1/phi, so the MG superset guarantee is unconditional (sketches/
# spacesaving.MisraGries.heavy_hitters can never refuse at this sizing)


# pack (t1, t2) -> t1 * 2^21 + t2: any Unicode codepoint < 2^21, collision-
# free — the bigint cast is load-bearing (tokens is array<int>; an int32
# shiftleft would silently wrap for codepoints >= 1024)
_PACKED_BIGRAMS = (
    "transform(sequence(0, size(tokens) - 2), "
    "i -> shiftleft(cast(tokens[i] AS bigint), 21) + tokens[i + 1])"
)


def _unpack_gram(col: str):
    """Packed bigram -> the oracle's 't1|t2' gram string."""
    return F.concat(
        F.shiftright(col, 21).cast("string"),
        F.lit("|"),
        F.col(col).bitwiseAND((1 << 21) - 1).cast("string"),
    ).alias("gram")


HH_GROUP_PHI = 0.004  # per-source heavy-hitter threshold


_BIGRAM_FLUENCY_ORACLE = """WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
b AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM w WHERE len(ws) >= 2)
),
c AS (SELECT w1, w2, COUNT(*) AS cnt FROM b GROUP BY w1, w2)
SELECT b.doc_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(c.cnt) AS BIGINT) AS sum_freq,
       CAST(SUM(c.cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fluency
FROM b JOIN c USING (w1, w2)
GROUP BY b.doc_id"""


def _jaccard_pairs_spark(spark: SparkSession, sf_dir: str, thr_x1e6: int,
                         docs: DataFrame | None = None) -> DataFrame:
    """Exact 5-gram Jaccard pairs (integer-scaled) — shared by the oracle
    twin query and the LSH containment check."""
    if docs is None:
        docs = _docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                # guard: docs shorter than 5 chars have no 5-gram shingles;
                # sequence(1, negative) would DESCEND and emit phantom ones
                F.expr(
                    "case when length(text) >= 5 then "
                    "transform(sequence(1, length(text) - 4), i -> substring(text, i, 5)) "
                    "else array() end"
                )
            )
        ).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .withColumn("jaccard_x1e6", F.expr("(inter * 1000000) div (sz_a + sz_b - inter)"))
        .filter(F.col("jaccard_x1e6") >= thr_x1e6)
        .select("doc_a", "doc_b", "jaccard_x1e6")
    )


# Decontamination: bench set = every 97th doc, grams = exact 16-char
# windows. Small enough to broadcast (the op's stated contract), dense
# enough in the synthetic corpus to produce real contaminated pairs.
DECON_N = 16
DECON_MOD = 97

# shared oracle fragments for the decontamination family — THE one SQL
# definition of the bench/corpus gram streams (mirrors operators/
# contamination._gram_rows); every decon oracle composes these
_GRAM_LIST = (f"[substring(text, i, {DECON_N}) "
              f"FOR i IN range(1, greatest(length(text) - {DECON_N - 2}, 1))]")
DECON_BG_CTE = f"""bg AS (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS bench_id, g FROM (
    SELECT doc_id, unnest({_GRAM_LIST}) AS g
    FROM documents WHERE doc_id % {DECON_MOD} = 0)
)"""
DECON_CG_CTE = f"""cg AS (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc_id, g FROM (
    SELECT doc_id, unnest({_GRAM_LIST}) AS g
    FROM documents)
)"""


# numeric view of a doc id: the TRAILING DIGITS — identical to the plain
# long cast on the numeric testdata ids (= the oracles' definition), and
# still numeric on the scaling sweep's 'r{r}-{id}' replica corpora, where
# a plain cast NULLs out and silently empties whatever it selects
def _doc_num(col: str) -> "F.Column":
    return F.regexp_extract(col, r"([0-9]+)$", 1).cast("long")


def _decon_inputs(spark: SparkSession, sf_dir: str):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.filter(_doc_num("doc_id") % DECON_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return docs, bench


# the LSH verifier's shingles are BYTE windows of the UTF-8 text with
# space-padding for short docs (dedup.char_shingle_hashes); the SQL exact
# side uses CHARACTER substr windows over docs >= 5 chars. The two
# definitions coincide exactly on ASCII docs of length >= 5 — the
# containment equality is asserted on that sub-corpus (chars == bytes)
_CONTAINMENT_DOMAIN = "length(text) >= 5 AND length(text) = octet_length(text)"


TFIDF_K = 3


WBM25_TERMS, WBM25_K, WBM25_K1, WBM25_B = ["dup", "vector", "key"], 10, 1.2, 0.75


def _wbm25_scored_cte() -> str:
    """The shared word-BM25 CTE chain (w/st/i/s, ending in relation
    s(doc_id, dl, score)): idf/avgdl computed in SQL (bit-equal to the
    Python precompute — same libm), score fragment mirrors
    operators/text._bm25_score_sql's op order exactly. Shared by the BM25
    oracle and the RRF-fusion oracle."""
    from hierarchical_bloom_filter_index_spark.operators.text import _dlit

    k1p1, k1l = _dlit(WBM25_K1 + 1.0), _dlit(WBM25_K1)
    b1, bl = _dlit(1.0 - WBM25_B), _dlit(WBM25_B)
    ts = sorted(WBM25_TERMS)
    dfs = ", ".join(
        f"SUM(CASE WHEN list_contains(ws, '{t}') THEN 1 ELSE 0 END) AS df_{i}"
        for i, t in enumerate(ts))
    idfs = ", ".join(
        f"ln(1e0 + (n - df_{i} + 0.5e0) / (df_{i} + 0.5e0)) AS idf_{i}"
        for i in range(len(ts)))
    tf = "len(list_filter(ws, x -> x = '{t}'))"
    score = " + ".join(
        f"(idf_{i} * ({tf.format(t=t)} * {k1p1}) / "
        f"({tf.format(t=t)} + {k1l} * ({b1} + {bl} * dl / avgdl)))"
        for i, t in enumerate(ts))
    hit = " + ".join(tf.format(t=t) for t in ts)
    return f"""w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS ws,
         CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
              AS INTEGER) AS dl
  FROM documents),
st AS (SELECT COUNT(*) AS n, {dfs},
              CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       FROM w),
i AS (SELECT avgdl, {idfs} FROM st),
s AS (SELECT doc_id, dl, round({score}, 6) AS score
      FROM w, i WHERE ({hit}) > 0)"""


def _word_bm25_oracle_sql() -> str:
    """DuckDB twin of q_bm25_topk_docs over the shared scored CTE."""
    return f"""WITH {_wbm25_scored_cte()}
SELECT doc_id, dl, score
FROM (SELECT doc_id, dl, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM s)
WHERE rk <= {WBM25_K}"""


RRF_K, RRF_TOPK, RRF_SCALE = 60, 10, 10**12


def _rrf_oracle_sql() -> str:
    """DuckDB twin of q_hybrid_retrieval_rrf: BM25 top-10 (shared scored
    CTE, the proven bit-exact ranking) and exact term-tf top-10 ranked by
    ROW_NUMBER, fused with integer floor(scale/(k+rank)) contributions —
    the float 1/(k+r) sum would be order-dependent, the fixed-point one
    is hash-equal (operators/text.rrf_fuse)."""
    ts = sorted(WBM25_TERMS)
    tfsum = " + ".join(f"len(list_filter(ws, x -> x = '{t}'))" for t in ts)
    return f"""WITH {_wbm25_scored_cte()},
r1 AS (SELECT doc_id, rk FROM (
         SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rk
         FROM s) WHERE rk <= {WBM25_K}),
t AS (SELECT doc_id, CAST({tfsum} AS BIGINT) AS tf FROM w
      WHERE ({tfsum}) > 0),
r2 AS (SELECT doc_id, rk FROM (
         SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id ASC) AS rk
         FROM t) WHERE rk <= {WBM25_K}),
u AS (SELECT doc_id, {RRF_SCALE} // ({RRF_K} + rk) AS c FROM r1
      UNION ALL
      SELECT doc_id, {RRF_SCALE} // ({RRF_K} + rk) AS c FROM r2),
f AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS rrf_score,
             CAST(COUNT(*) AS BIGINT) AS n_lists
      FROM u GROUP BY doc_id)
SELECT doc_id, rrf_score, n_lists FROM f
ORDER BY rrf_score DESC, doc_id ASC LIMIT {RRF_TOPK}"""


def _laced_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus with deterministic synthetic PII appended (the raw text
    has none — word soup over a letters-only vocab): variant chosen by
    length(text) % 3, a pure-STRING property, so the lacing survives the
    replica-id scaling sweeps that break numeric doc_id casts. Identical
    concat on the DuckDB side."""
    d = _docs(spark, sf_dir)
    m = F.length("text") % 3
    return d.select(
        "doc_id", "source",
        F.concat(
            F.col("text"),
            F.when(m == 0, F.concat(
                F.lit(" reach u"), F.col("doc_id"), F.lit("@ex.com")))
            .when(m == 1, F.lit(" node 10.0.3.77 up"))
            .otherwise(F.concat(
                F.lit(" visit https://ex.org/d/"), F.col("doc_id"),
                F.lit(" or call 555-123-4567")))).alias("text"))


_LACED_CTE = """laced AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         text || CASE length(text) % 3
           WHEN 0 THEN ' reach u' || CAST(doc_id AS VARCHAR) || '@ex.com'
           WHEN 1 THEN ' node 10.0.3.77 up'
           ELSE ' visit https://ex.org/d/' || CAST(doc_id AS VARCHAR)
                || ' or call 555-123-4567' END AS text
  FROM documents)"""


def _pii_chain_sql() -> tuple[str, str]:
    """(final rewritten-text expr, count column list) mirroring
    operators/pii.redact_pii's sequential fold in DuckDB syntax."""
    from hierarchical_bloom_filter_index_spark.operators.pii import (
        PII_PATTERNS)

    cur, counts = "text", []
    for k, pat in PII_PATTERNS.items():
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INTEGER)"
            f" AS n_{k}")
        cur = f"regexp_replace({cur}, '{pat}', '<{k.upper()}>', 'g')"
    return cur, ", ".join(counts)


FUNNEL_STEPS = ["view", "click", "purchase"]


def _funnel_oracle_sql() -> str:
    steps = FUNNEL_STEPS
    ctes, prev = [], None
    for i, s in enumerate(steps, 1):
        if prev is None:
            ctes.append(
                f"s{i} AS (SELECT user_id, min(ts) AS t FROM events "
                f"WHERE event_type = '{s}' GROUP BY user_id)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
                f"JOIN s{i - 1} p ON e.user_id = p.user_id "
                f"WHERE e.event_type = '{s}' AND e.ts > p.t "
                f"GROUP BY e.user_id)")
        prev = s
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, '{s}' AS event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i}"
        for i, s in enumerate(steps, 1))
    return "WITH " + ",\n".join(ctes) + "\n" + unions


CHUNK_SIZE, CHUNK_OVERLAP = 64, 16
WCHUNK_SIZE, WCHUNK_OVERLAP = 12, 4


PATH_PREFIX = 3
PATH_K = 20


def _lm_model_path(spark: SparkSession, sf_dir: str) -> str:
    """Persisted bigram model trained on the 4/5 split (docs %5 != 0) —
    written once per sf_dir, shared by the incremental batch + stream
    scoring queries."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import lm

    key = ("lm_model", sf_dir)
    if key not in _CACHE:
        train = _docs(spark, sf_dir).filter(_doc_num("doc_id") % 5 != 0)
        path = _tmpdir(prefix="hbi_lm_model_") + "/lm"
        lm.write_lm_model(train, path)
        _CACHE[key] = path
    return _CACHE[key]


def _lm_tables_df(spark: SparkSession, path: str) -> DataFrame:
    """One relation covering a persisted LM model's maintained state:
    bigram counts + word counts, side-tagged — the parity gates diff it."""
    bg = spark.read.parquet(f"{path}/bigrams").select(
        F.lit("bg").alias("kind"), "a", "b", F.col("c").cast("long").alias("c"))
    wd = spark.read.parquet(f"{path}/words").select(
        F.lit("w").alias("kind"), F.col("w").alias("a"),
        F.lit("").alias("b"), F.col("c").cast("long").alias("c"))
    return bg.unionByName(wd)


_LM_ORACLE = """WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS ws
  FROM documents),
pr AS (
  SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, CAST(len(ws) - 1 AS BIGINT))) AS i
        FROM d WHERE len(ws) >= 2)),
c2 AS (SELECT a, b, COUNT(*) AS c FROM pr GROUP BY a, b),
c1 AS (SELECT a, SUM(c) AS c1 FROM c2 GROUP BY a),
vv AS (SELECT COUNT(DISTINCT w) AS v
       FROM (SELECT unnest(ws) AS w FROM d)),
sc AS (
  SELECT pr.doc_id,
         CAST(floor(ln((c2.c + 0.5e0) / (c1.c1 + 0.5e0 * vv.v))
                    * 1e9 + 0.5e0) AS BIGINT) AS lp
  FROM pr JOIN c2 USING (a, b) JOIN c1 USING (a), vv)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_pairs,
       CAST(SUM(lp) AS BIGINT) AS logprob_x1e9,
       CAST(SUM(lp) // COUNT(*) AS BIGINT) AS avg_logprob_x1e9
FROM sc GROUP BY doc_id"""


HIST_LO, HIST_HI, HIST_BINS, HIST_SCALE = 0.0, 20.0, 10, 100
OUTLIER_K = 2


FUNNEL_WITHIN_US = 6 * 3600 * 1_000_000  # 6h conversion window


def _funnel_windowed_oracle_sql() -> str:
    steps, w = FUNNEL_STEPS, FUNNEL_WITHIN_US
    parts = []
    for p in range(1, len(steps) + 1):
        joins, prev = [], "e1"
        for i in range(2, p + 1):
            joins.append(
                f"JOIN events e{i} ON e{i}.user_id = e1.user_id "
                f"AND e{i}.event_type = '{steps[i - 1]}' "
                f"AND epoch_us(e{i}.ts) > epoch_us({prev}.ts) "
                f"AND epoch_us(e{i}.ts) <= epoch_us({prev}.ts) + {w}")
            prev = f"e{i}"
        parts.append(
            f"SELECT {p} AS step, '{steps[p - 1]}' AS event_type, "
            f"CAST(COUNT(DISTINCT e1.user_id) AS BIGINT) AS n_users "
            f"FROM events e1 {' '.join(joins)} "
            f"WHERE e1.event_type = '{steps[0]}'")
    return "\nUNION ALL\n".join(parts)


BPE_MERGES = 60


SKIPGRAM_W, SKIPGRAM_K, SKIPGRAM_MIN = 4, 30, 2


_PROFILE_PROJ = ["col_name", "n", "n_null", "min", "max", "n_distinct",
                 "top_value", "top_count", "mg_resid"]


# column-range predicate served through the bucketed layout: covers the
# middle of the l_extendedprice distribution so the bucket range genuinely
# prunes directories on both sides
BUCKET_RANGE = (20000.0, 35000.0)


def _zonemap_range_layout(spark: SparkSession, sf_dir: str):
    """lineitem range-clustered on l_orderkey (8 files) + its zone map,
    built once per sf_dir."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        build_zone_map,
    )

    key = ("zonemap_range", sf_dir)
    if key not in _CACHE:
        path = _tmpdir(prefix="hbi_zm_range_")
        (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .repartitionByRange(8, "l_orderkey")
         .write.mode("overwrite").parquet(path))
        zm = build_zone_map(
            spark.read.parquet(path), stat_cols=("l_orderkey",),
            sum_cols=("l_quantity",)).persist()
        zm.count()
        _CACHE[key] = (path, zm)
    return _CACHE[key]


def _vtable_fixture(spark: SparkSession, sf_dir: str):
    """Fresh versioned table: v0 = documents, v1 = upsert (UPD band +
    inserts), v2 = range delete — with the pruning gates asserted.
    Returns (path, mx). Built per call: vtable ops commit new snapshots."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import vtable as V

    base = _tmpdir(prefix="hbi_vtable_")
    path = f"{base}/t"
    nch = lambda df: df.withColumn(  # noqa: E731 — n_chars tracks text
        "n_chars", F.length("text").cast("int"))
    docs = nch(spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"))
    V.create_table(docs, path, stat_cols=("doc_id",),
                   sum_cols=("n_chars",), n_files=8)
    mx = docs.agg(F.max("doc_id")).first()[0]
    updates = nch(docs.where(
        F.col("doc_id").between(mx // 4, mx // 2) & (F.col("doc_id") % 3 == 0)
    ).select("doc_id", F.concat(F.lit("UPD "), F.col("text")).alias("text")))
    inserts = nch(spark.range(5).select(
        (F.lit(mx) + 10 + F.col("id")).alias("doc_id"),
        F.concat(F.lit("ins "), F.col("id").cast("string")).alias("text")))
    r1 = V.upsert(spark, path, updates.unionByName(inserts), "doc_id")
    if not (0 < r1["n_files_touched"] < r1["n_files_total"]):
        raise AssertionError(f"vtable upsert pruning failed: {r1}")
    # band DELIBERATELY misaligned with the 8-file range boundaries
    # (k/8 edges): repartitionByRange samples with a session-history-
    # dependent seed (rdd.id), so an edge-aligned band made the
    # metadata-drop gate a coin flip on boundary jitter — [0.6, 0.9]
    # gives the two interior files a ±2.5%-of-range margin
    r2 = V.delete_range(spark, path, "doc_id", 3 * mx // 5, 9 * mx // 10)
    if r2["n_files_dropped"] == 0:
        raise AssertionError(f"vtable delete made no metadata drops: {r2}")
    return path, mx


def _zorder_layout(spark: SparkSession, sf_dir: str):
    """lineitem Z-ORDERED on (l_orderkey, l_partkey) — 32 files, 64
    equi-depth buckets per column — plus its two-column zone map, built
    once per sf_dir (operators/zorder.py)."""
    import tempfile

    key = ("zorder_layout", sf_dir)
    if key not in _CACHE:
        from hierarchical_bloom_filter_index_spark.operators.zorder import (
            write_zorder_layout,
        )

        base = _tmpdir(prefix="hbi_zorder_")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_zorder_layout(li, ["l_orderkey", "l_partkey"], 32,
                            f"{base}/lay", bits_per_col=6)
        _CACHE[key] = f"{base}/lay"
    return _CACHE[key]


def _zorder_bounds(spark: SparkSession, path: str, col: str):
    from hierarchical_bloom_filter_index_spark.operators.zonemap import (
        read_zone_map,
    )

    zm = read_zone_map(spark, f"{path}/zonemap")
    b = zm.agg(F.min(f"min_{col}").alias("mn"),
               F.max(f"max_{col}").alias("mx"),
               F.count(F.lit(1)).alias("nf")).first()
    return b["mn"], b["mx"], b["nf"]


# key-set statistics (operators/keystats.py) — planner stats between the
# URGENT-orders customer set and the customer table
OVERLAP_K = 128


def _key_hash_ctes(seed: int, name: str, src_sql: str) -> str:
    """CTE chain: ``src_sql`` (one BIGINT column ``key``, assumed distinct)
    -> ``{name}(key, _h HUGEINT)`` with _h = hash64(key, seed), bit-exact vs
    sketches.hashing.hash64 (same construction as _splitmix_ctes, keyed by
    an arbitrary integer expression)."""
    s = _seed_mix_const(seed)
    s_signed = s - _P64 if s >= (1 << 63) else s
    g, m1, m2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    xor_in = f"xor(CAST(key AS BIGINT), CAST({s_signed} AS BIGINT))"
    return f"""{name}_src AS ({src_sql}),
{name}_k AS (SELECT key, CAST({xor_in} AS HUGEINT)
             + CASE WHEN {xor_in} < 0 THEN {_P64} ELSE 0 END AS h
             FROM {name}_src),
{name}_s0 AS (SELECT key, (h + {g}) % {_P64} AS _h0 FROM {name}_k),
{name}_s1 AS (SELECT key, {_sql_mul64(_sql_xsr('_h0', 30), m1)} AS _h1 FROM {name}_s0),
{name}_s2 AS (SELECT key, {_sql_mul64(_sql_xsr('_h1', 27), m2)} AS _h2 FROM {name}_s1),
{name} AS (SELECT key, {_sql_xsr('_h2', 31)} AS _h FROM {name}_s2)"""


_URGENT_KEYS_SQL = ("SELECT DISTINCT CAST(o_custkey AS BIGINT) AS key "
                    "FROM orders WHERE o_orderpriority = '1-URGENT'")
_CUST_KEYS_SQL = "SELECT DISTINCT CAST(c_custkey AS BIGINT) AS key FROM customer"


SESSION_GAP_US = 6 * 3600 * 1_000_000


_SESSIONS_ORACLE = f"""WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
),
x AS (
  SELECT user_id, event_id, t_us,
         CASE WHEN LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) IS NULL
                OR t_us - LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {SESSION_GAP_US} THEN 1 ELSE 0 END AS is_new
  FROM e
),
y AS (
  SELECT user_id, t_us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_idx
  FROM x
)
SELECT user_id, session_idx, MIN(t_us) AS t_start, MAX(t_us) AS t_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM y GROUP BY user_id, session_idx"""

_ASOF_ORACLE = """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS t_us,
       r.value AS purchase_value, epoch_us(r.ts) AS matched_t
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND r.ts < l.ts"""


DECON_TOPK = 20


SHARD_BUDGET = 8192


SCRUB_N = 24  # 16-char grams mark EVERY sf0.01 doc; 24 leaves ~40% untouched


def _gram_islands_cte(hits: str, n: int) -> str:
    """``isl`` CTE: fixed-length gaps-and-islands over a (doc_id, s) hit
    CTE — THE SQL twin of contamination._fixed_gram_islands; every span
    oracle composes this one definition."""
    return f"""isl AS (
  SELECT doc_id, s,
         SUM(CASE WHEN s > lag_s + {n} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
  FROM (SELECT doc_id, s, LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS lag_s
        FROM {hits}))"""


def _spans_select_sql(hits: str, n: int) -> str:
    """islands -> (doc_id, span_start, span_end) — the tail of every
    span-audit oracle."""
    return f"""{_gram_islands_cte(hits, n)}
SELECT doc_id, CAST(MIN(s) AS INTEGER) AS span_start,
       CAST(MAX(s) + {n} AS INTEGER) AS span_end
FROM isl GROUP BY doc_id, island"""


def _scrub_select_sql(hits: str, docs: str, n: int) -> str:
    """islands -> merged spans -> segment surgery -> (doc_id, clean_text)
    for EVERY doc of the ``docs`` CTE (untouched docs verbatim) — the SQL
    twin of _fixed_gram_islands + _apply_span_cuts, shared by all scrub
    oracles."""
    return f"""{_gram_islands_cte(hits, n)}, sp AS (
  SELECT doc_id, MIN(s) AS s, MAX(s) + {n} AS e FROM isl GROUP BY doc_id, island
), segs AS (
  SELECT sp.doc_id, sp.s AS ord, substring(d2.text, prev_e + 1, sp.s - prev_e) AS seg
  FROM (SELECT doc_id, s, e,
               COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS prev_e
        FROM sp) sp JOIN {docs} d2 USING (doc_id)
), tails AS (
  SELECT sp.doc_id, length(d2.text) AS ord, substring(d2.text, MAX(sp.e) + 1) AS seg
  FROM sp JOIN {docs} d2 USING (doc_id) GROUP BY sp.doc_id, d2.text
), scrubbed AS (
  SELECT doc_id, string_agg(seg, '' ORDER BY ord) AS clean_text
  FROM (SELECT * FROM segs UNION ALL SELECT * FROM tails) GROUP BY doc_id
)
SELECT d3.doc_id, COALESCE(sc.clean_text, d3.text) AS clean_text
FROM {docs} d3 LEFT JOIN scrubbed sc USING (doc_id)"""


# positioned 24-gram stream over the whole corpus (0-based starts) — the
# shared head of both cross-doc dedup oracles
_SCRUB_CP_CTE = f"""d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents),
cp AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS s,
         substring(text, CAST(i AS INT), {SCRUB_N}) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, CAST(length(text) - {SCRUB_N - 1} AS BIGINT))) AS i
        FROM d WHERE length(text) >= {SCRUB_N}))"""

# the exact-Jaccard >= 0.4 pair graph (doc_a < doc_b, VARCHAR ids) —
# shared head of the dedup_clusters / neardup_canonical_docs / triangle
# twins
_JACCARD_PAIR_CTES = """sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS sh
  FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
               unnest(generate_series(1, CAST(length(text) - 4 AS BIGINT))) AS i
        FROM documents)
), sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
p AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE (i * 1000000) // (sa.sz + sb.sz - i) >= 400000)"""

# + its recursive connected components (cluster_id = component min);
# callers prepend WITH RECURSIVE
_JACCARD_CC_CTES = _JACCARD_PAIR_CTES + """,
e AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
),
cc AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u)"""

# ingest scrub twin (batch AND streaming share it): the %5-split batch cut
# against the other 4/5's distinct grams — corpus is the senior keeper
_SCRUB_INGEST_SQL = f"""WITH nd AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  WHERE doc_id % 5 = 0),
cp AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS s,
         substring(text, CAST(i AS INT), {SCRUB_N}) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, CAST(length(text) - {SCRUB_N - 1} AS BIGINT))) AS i
        FROM nd WHERE length(text) >= {SCRUB_N})
), eg AS (
  SELECT DISTINCT substring(text, CAST(i AS INT), {SCRUB_N}) AS g
  FROM (SELECT text,
               unnest(generate_series(1, CAST(length(text) - {SCRUB_N - 1} AS BIGINT))) AS i
        FROM documents WHERE doc_id % 5 <> 0 AND length(text) >= {SCRUB_N})
), rm AS (
  SELECT DISTINCT cp.doc_id, s FROM cp JOIN eg USING (g)
), {_scrub_select_sql("rm", "nd", SCRUB_N)}"""


SPECTRUM_LENGTHS = [12, 24, 48, 96]


def _spectrum_oracle() -> str:
    parts = []
    for L in SPECTRUM_LENGTHS:
        pos = (
            f"SELECT doc_id, substring(text, CAST(i AS INT), {L}) AS gram\n"
            f"  FROM (SELECT doc_id, text, unnest(generate_series(1, "
            f"CAST(length(text) - {L - 1} AS BIGINT))) AS i\n"
            f"        FROM documents WHERE length(text) >= {L})"
        )
        parts.append(f"""SELECT CAST({L} AS BIGINT) AS gram_len,
  CAST(COUNT(DISTINCT p.gram) AS BIGINT) AS n_dup_grams,
  CAST(COUNT(*) AS BIGINT) AS n_dup_positions,
  CAST(COUNT(DISTINCT p.doc_id) AS BIGINT) AS n_docs_with_dup
FROM ({pos}) p
JOIN (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM ({pos}))
      GROUP BY gram HAVING COUNT(*) >= 2) d USING (gram)""")
    return "\nUNION ALL\n".join(parts)


def _scrub_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Persisted gram-df index of the CORPUS side (%5 split, n=SCRUB_N) —
    built once per session, shared by the batch and streaming ingest
    scrubs."""
    import tempfile

    from hierarchical_bloom_filter_index_spark.operators import contamination as X

    key = ("scrub_gram_idx", sf_dir)
    if key not in _CACHE:
        _new, old = _neardup_split(spark, sf_dir)
        path = _tmpdir(prefix="hbi_scrubidx_") + "/idx"
        X.write_gram_df_index(old, path, SCRUB_N)
        _CACHE[key] = path
    return _CACHE[key]


def _hll_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic HLL rollup index, built once per sf_dir (it is persisted by
    build_hll_window_index; both rollup queries share it)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_hll_window_index,
    )

    key = ("hll_index", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = build_hll_window_index(_corpus(spark, sf_dir), CFG, p=12)
    return _CACHE[key]


def _cms_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic CMS rollup index (frequency analog of _hll_index), built once
    per sf_dir and persisted; both CMS-rollup queries share it."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_cms_window_index,
    )

    key = ("cms_index", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = build_cms_window_index(_corpus(spark, sf_dir), CFG, depth=3, width=256)
    return _CACHE[key]


def _kll_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic KLL rollup index (quantile analog of _hll_index/_cms_index),
    built once per sf_dir and persisted; totals + range-quantile queries
    share it."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_kll_window_index,
    )

    key = ("kll_index", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = build_kll_window_index(_corpus(spark, sf_dir), CFG, k=200)
    return _CACHE[key]


def _td_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic t-DIGEST rollup index (the second quantile sketch the
    north_rule names — tail-accurate, fully deterministic), built once per
    sf_dir and persisted; totals + range-quantile queries share it."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_td_window_index,
    )

    key = ("td_index", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = build_td_window_index(_corpus(spark, sf_dir), CFG, delta=100.0)
    return _CACHE[key]


def _mg_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic Misra-Gries rollup index (heavy-hitter analog of _cms_index),
    built once per sf_dir and persisted; totals + range-heavy-hitter queries
    share it. k=32 >= leaf_span, so leaves are exact counter tables and
    phi=1/16 candidate cuts can never refuse (k+1 > 16)."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_mg_window_index,
    )

    key = ("mg_index", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = build_mg_window_index(_corpus(spark, sf_dir), CFG, k=32)
    return _CACHE[key]


# phi for the heavy-hitter range queries, as an exact fraction (1/16 of the
# range's tokens): integer arithmetic end to end, so the Spark cut and the
# DuckDB oracle cut decide identically at the boundary
PHI_HH = (1, 16)


# top-k for the certified range top-k queries: small enough that the k-th
# exact count comfortably clears the merged MG residual bound on English
# text (certification never refuses on the fixture), large enough that the
# ranking exercises real tie-breaks
RANGE_TOPK_K = 5


# k for the BottomK distinct-sample index: small enough that truncation is
# exercised (a 256-token English slice has > 16 distinct chars), large
# enough that short ranges keep their whole distinct set
BK_K = 16


def _bk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic BottomK rollup index (distinct-SAMPLE analog of _hll_index),
    built once per sf_dir and persisted. Every node is the EXACT bottom-k
    distinct sample of its window (bottom-k mergeability), so range samples
    are values, not estimates."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_bk_window_index,
    )

    key = ("bk_index", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = build_bk_window_index(_corpus(spark, sf_dir), CFG, k=BK_K)
    return _CACHE[key]


# trim fractions for the certified trimmed-sum range queries: exact binary
# doubles, so floor(q*n) / ceil(q*n) are bit-identical between Spark and
# DuckDB (QUANTILES = 0.25/0.5/0.75 are exact too)
TRIM_Q = (0.25, 0.75)


def _cs_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic signed count-sketch (AMS) rollup index — the second-moment /
    unbiased-frequency member of the window family; built once per sf_dir
    and persisted; totals + range-F2 queries share it."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_cs_window_index,
    )

    key = ("cs_index", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = build_cs_window_index(_corpus(spark, sf_dir), CFG, depth=3, width=256)
    return _CACHE[key]


RANGE_QS = [(1, 9), (0, 3)]  # leaf-window ranges applied to every doc


RANGE_QS_GLOBAL = [(0, 8), (5, 133), (1000, 1024)]  # stream leaf-window ranges


def _gcms_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-axis CMS window index (STREAM windows, doc boundaries
    invisible), built once per sf_dir off the cached offset corpus."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_cms_window_index,
    )

    key = ("gcms_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_cms_window_index(gcorp, CFG, depth=3, width=256)
    return _CACHE[key]


def _gcs_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-axis signed count-sketch window index (STREAM windows, doc
    boundaries invisible), built once per sf_dir off the offset corpus."""
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_global_cs_window_index,
    )

    key = ("gcs_index", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        _CACHE[key] = build_global_cs_window_index(gcorp, CFG, depth=3, width=256)
    return _CACHE[key]


# range PAIRS ((a1,b1),(a2,b2)) for the cross-range queries: disjoint,
# overlapping, and one side beyond most docs' end (zero-vector semantics)
PAIR_QS = [((0, 4), (4, 8)), ((0, 3), (1, 9))]
PAIR_QS_GLOBAL = [((0, 8), (8, 16)), ((5, 133), (120, 260)), ((1000, 1024), (0, 8))]


BOTTOMK_K = 16  # < the corpus's distinct-token count, so hash order DECIDES


# ---------------------------------------------------------------------------
# deterministic sampling (operators/sampling.py): pure-hash Bernoulli /
# splits / per-stratum top-n — all VALUE-checked via the SplitMix64 SQL twin
# ---------------------------------------------------------------------------
SAMPLE_SEED = CFG.seed + 29
SAMPLE_DEFAULT_FRAC = 0.5
SAMPLE_FRACS = {"src0": 0.1, "src1": 1.0, "src2": 0.25}
SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}
TOPN_PER_SOURCE = 3


def _doc_hash_ctes(seed: int) -> str:
    """CTE chain ending in doc_hash(doc_id BIGINT, source, _h HUGEINT):
    _h = hash64(doc_id, seed), bit-exact vs sketches.hashing.hash64 (same
    construction as _splitmix_ctes, keyed by doc id instead of token)."""
    s = _seed_mix_const(seed)
    s_signed = s - _P64 if s >= (1 << 63) else s
    g, m1, m2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    xor_in = f"xor(CAST(doc_id AS BIGINT), CAST({s_signed} AS BIGINT))"
    return f"""dk AS (SELECT doc_id, source,
            CAST({xor_in} AS HUGEINT)
            + CASE WHEN {xor_in} < 0 THEN {_P64} ELSE 0 END AS h
      FROM documents),
ds0 AS (SELECT doc_id, source, (h + {g}) % {_P64} AS _h0 FROM dk),
ds1 AS (SELECT doc_id, source, {_sql_mul64(_sql_xsr('_h0', 30), m1)} AS _h1 FROM ds0),
ds2 AS (SELECT doc_id, source, {_sql_mul64(_sql_xsr('_h1', 27), m2)} AS _h2 FROM ds1),
doc_hash AS (SELECT doc_id, source, {_sql_xsr('_h2', 31)} AS _h FROM ds2)"""


MIX_BUDGETS = {"src0": 3000, "src1": 1500, "src2": 0}
MIX_DEFAULT_BUDGET = 2000
EPOCH_NUM = 1
REP_TOP_N = 2
REP_DUP_N = 3


REP_FRAC_THRESH = 80_000


def _mixture_oracle() -> str:
    cases = " ".join(
        f"WHEN dh.source = '{s}' THEN {int(b)}"
        for s, b in sorted(MIX_BUDGETS.items()))
    return f"""WITH {_doc_hash_ctes(SAMPLE_SEED)},
j AS (SELECT dh.doc_id, dh.source, d.n_chars, dh._h,
             CASE {cases} ELSE {MIX_DEFAULT_BUDGET} END AS bud
      FROM doc_hash dh JOIN documents d USING (doc_id)),
c AS (SELECT doc_id, source, n_chars, bud,
             COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY _h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM j)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
       CAST(prior + n_chars AS BIGINT) AS cum_weight
FROM c WHERE prior < bud"""


TEMP_BUDGET = 6000

LEXCOS_MOD, LEXCOS_T = 5, (4, 5)

PSEUDO_SEED = CFG.seed + 41
KANON_K = 5

# ladder chosen to straddle the growth region: the char-token vocab
# saturates within a few hundred stream tokens on this corpus
VG_NS = (8, 32, 128, 512, 120_000)

ATTR_WINDOW_US = 12 * 3600 * 1_000_000
FC_KS = (1, 4, 16, 64, 256)


def _vocab_growth_oracle() -> str:
    vals = ", ".join(f"({int(n)})" for n in VG_NS)
    return f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens,
               unnest(generate_series(1, CAST(len(tokens) AS BIGINT))) AS i
        FROM off)),
fo AS (SELECT t, MIN(g) AS fg FROM flat GROUP BY t),
ns(n_tokens) AS (VALUES {vals})
SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(COUNT(CASE WHEN fg < n_tokens THEN 1 END) AS BIGINT) AS n_types
FROM ns CROSS JOIN fo GROUP BY n_tokens"""


def _freq_coverage_oracle() -> str:
    vals = ", ".join(f"({int(k)})" for k in FC_KS)
    return f"""WITH {CORPUS_CTE},
c AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(tokens) AS t FROM corpus) GROUP BY t),
r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, t ASC) AS rk,
             SUM(cnt) OVER (ORDER BY cnt DESC, t ASC
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM c),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM c),
ks(k) AS (VALUES {vals})
SELECT CAST(k AS BIGINT) AS k,
       CAST(COALESCE(MAX(CASE WHEN rk <= k THEN cum END), 0) AS BIGINT)
         AS covered_tokens,
       tot.total_tokens
FROM ks CROSS JOIN r CROSS JOIN tot
GROUP BY k, tot.total_tokens"""


def _temperature_mixture_oracle() -> str:
    """Twin of q_temperature_mixture: per-source budgets recomputed in SQL
    (exact isqrt = corrected FLOOR(SQRT(double)); integer floor splits of
    the total budget), then the same SplitMix64 hash-order prefix window
    as _mixture_oracle."""
    return f"""WITH {_doc_hash_ctes(SAMPLE_SEED)},
tot AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS t
        FROM documents GROUP BY source),
w0 AS (SELECT source, t,
              CAST(FLOOR(SQRT(CAST(t AS DOUBLE))) AS BIGINT) AS r FROM tot),
w1 AS (SELECT source, t,
              CASE WHEN (r + 1) * (r + 1) <= t THEN r + 1
                   WHEN r * r > t THEN r - 1 ELSE r END AS w FROM w0),
sw AS (SELECT CAST(SUM(w) AS BIGINT) AS s FROM w1),
bud AS (SELECT source, ({TEMP_BUDGET} * w) // s AS bud FROM w1, sw),
j AS (SELECT dh.doc_id, dh.source, d.n_chars, dh._h, b.bud
      FROM doc_hash dh JOIN documents d USING (doc_id)
      JOIN bud b ON b.source = dh.source),
c AS (SELECT doc_id, source, n_chars, bud,
             COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY _h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM j)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
       CAST(prior + n_chars AS BIGINT) AS cum_weight
FROM c WHERE prior < bud"""


def _epoch_shards_oracle() -> str:
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        epoch_seed,
    )

    # the epoch key twin: fixed-width lowercase hex of the HUGEINT hash
    # (two 32-bit halves through to_hex) + '-' + id — bit-exact vs
    # epoch_key_udf (validated in tests/test_sampling.py)
    return f"""WITH {_doc_hash_ctes(epoch_seed(SAMPLE_SEED, EPOCH_NUM))},
ek AS (SELECT dh.doc_id, CAST(length(d.text) AS BIGINT) AS n_tok,
         lpad(lower(to_hex(CAST(_h >> 32 AS BIGINT))), 8, '0') ||
         lpad(lower(to_hex(CAST(_h % 4294967296 AS BIGINT))), 8, '0') ||
         '-' || CAST(dh.doc_id AS VARCHAR) AS ekey
       FROM doc_hash dh JOIN documents d USING (doc_id)),
off AS (SELECT doc_id, n_tok,
          COALESCE(SUM(n_tok) OVER (ORDER BY ekey
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
        FROM ek)
SELECT CAST(o // {SHARD_BUDGET} AS BIGINT) AS shard_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS doc_lo, MAX(doc_id) AS doc_hi
FROM off GROUP BY shard_id"""


def _rep_occ_cte(n: int, p: str = "") -> str:
    """Word n-gram occurrence rows with char offsets — the DuckDB twin of
    repetition.word_ngram_spans (raw single-space split, offsets an exact
    prefix sum; the quadratic prefix-join form is fine at oracle scale).
    ``p`` prefixes the CTE names so two n values can coexist in one WITH."""
    return f"""{p}w AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
            string_split(text, ' ') AS ws FROM documents
            WHERE length(text) > 0),
{p}occ AS (
  SELECT doc_id, n_chars,
         array_to_string(ws[i:i+{n - 1}], ' ') AS gram,
         CAST(CASE WHEN i = 1 THEN 0
              ELSE length(array_to_string(ws[1:i-1], ' ')) + 1
              END AS BIGINT) AS s
  FROM (SELECT doc_id, n_chars, ws, unnest(range(1, len(ws) - {n - 2})) AS i
        FROM {p}w))"""


def _stratified_oracle() -> str:
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        threshold_of,
    )

    cases = " ".join(
        f"WHEN source = '{s}' THEN {threshold_of(f) - 1}"
        for s, f in sorted(SAMPLE_FRACS.items()))
    return f"""WITH {_doc_hash_ctes(SAMPLE_SEED)}
SELECT doc_id, source FROM doc_hash
WHERE _h <= CASE {cases} ELSE {threshold_of(SAMPLE_DEFAULT_FRAC) - 1} END"""


def _splits_oracle() -> str:
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        threshold_of,
    )

    names = list(SPLIT_FRACS)
    acc, whens = 0.0, []
    for name in names[:-1]:
        acc += SPLIT_FRACS[name]
        whens.append(f"WHEN _h < {threshold_of(acc)} THEN '{name}'")
    case = f"CASE {' '.join(whens)} ELSE '{names[-1]}' END"
    return f"""WITH {_doc_hash_ctes(SAMPLE_SEED)}
SELECT source, {case} AS split, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM doc_hash GROUP BY source, split"""


def _leakage_splits_oracle() -> str:
    """Recursive components of the exact-Jaccard pair graph; singleton docs
    represent themselves; the representative (CAST to BIGINT) hashes
    through the bit-exact SplitMix64 chain into the same cumulative-
    fraction thresholds as dataset_splits."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        threshold_of,
    )

    names = list(SPLIT_FRACS)
    acc, whens = 0.0, []
    for name in names[:-1]:
        acc += SPLIT_FRACS[name]
        whens.append(f"WHEN _h < {threshold_of(acc)} THEN '{name}'")
    case = f"CASE {' '.join(whens)} ELSE '{names[-1]}' END"
    return f"""WITH RECURSIVE {_JACCARD_CC_CTES},
ad AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),
rep AS (SELECT ad.doc_id, CAST(COALESCE(cc.cluster_id, ad.doc_id) AS BIGINT) AS key
        FROM ad LEFT JOIN cc ON cc.doc_id = ad.doc_id),
{_key_hash_ctes(SAMPLE_SEED, 'rh', 'SELECT DISTINCT key FROM rep')}
SELECT rep.doc_id, {case} AS split
FROM rep JOIN rh USING (key)"""


def _topn_oracle() -> str:
    return f"""WITH {_doc_hash_ctes(SAMPLE_SEED)}
SELECT source, doc_id, rank FROM (
  SELECT source, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY _h, doc_id)
              AS BIGINT) AS rank
  FROM doc_hash
) WHERE rank <= {TOPN_PER_SOURCE}"""


def _weighted_sample_oracle() -> str:
    # A-Res twin: u from the 53-bit-mantissa trick (HUGEINT floor-div 2048,
    # +1, exact double conversion, exact power-of-two division), ln = glibc
    # (bit-equal to the Spark side's math.log), weight = length(text)+1
    return f"""WITH {_doc_hash_ctes(SAMPLE_SEED + 7)},
pri AS (
  SELECT dh.source, dh.doc_id,
         -ln(CAST((dh._h // 2048) + 1 AS DOUBLE) / 9007199254740992.0)
           / CAST(length(d.text) + 1 AS DOUBLE) AS score
  FROM doc_hash dh JOIN documents d USING (doc_id)
)
SELECT source, doc_id, rank, score FROM (
  SELECT source, doc_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY score, doc_id)
              AS BIGINT) AS rank
  FROM pri
) WHERE rank <= {TOPN_PER_SOURCE}"""


PAT_GLOBAL = [ord(c) for c in "spark "]


def _global_index(spark: SparkSession, sf_dir: str):
    """(offset corpus, global index, per-level stats), built once per sf_dir."""
    from hierarchical_bloom_filter_index_spark.corpus import with_global_offsets

    key = ("gcorpus", sf_dir)
    if key not in _CACHE:
        gcorp = with_global_offsets(_corpus(spark, sf_dir)).cache()
        gidx = build_index(gcorp, CFG.with_(axis="global")).cache()
        gidx.count()
        gstats = index_stats(gidx, CFG.with_(axis="global"))
        _CACHE[key] = (gcorp, gidx, gstats)
    return _CACHE[key]


def _global_cfg(spark: SparkSession, sf_dir: str) -> HbiConfig:
    """Global-axis config with the corpus's measured min doc length declared
    (one scan per sf_dir instead of one per search — the stream stitcher can
    then size its join rounds without its own min(n_tok) pass)."""
    key = ("gcfg", sf_dir)
    if key not in _CACHE:
        gcorp, _gidx, _gstats = _global_index(spark, sf_dir)
        min_n = gcorp.filter(F.col("n_tok") > 0).agg(F.min("n_tok")).first()[0]
        _CACHE[key] = CFG.with_(axis="global",
                                min_doc_tokens=int(min_n) if min_n else None)
    return _CACHE[key]


# range-restricted search: token-offset slices (unaligned on purpose —
# window boundaries at leaf_span=32 fall inside both ranges)
PRANGE = (64, 512)
GRANGE = (10_000, 60_000)


COMPL_ELL, COMPL_K = 3, 15


GLOBAL_BATCH_PATTERNS = [PAT_GLOBAL, [ord(c) for c in "merge"],
                         [ord(c) for c in "z\x01z"]]


# the batch operator's DESIGN POINT: many-pattern workloads (dedup/filter
# lists). Measured crossover vs per-pattern singles is ~5 patterns; at 16
# the shared cascade is ~8x faster than 16 singles (BENCH/BASELINE.md).
WIDE_BATCH_PATTERNS = [
    [ord(c) for c in w]
    for w in ("merge", "index", "bloom", "filter", "spark", "tokens",
              "window", "stream", "partition", "shuffle", "sketch", "search",
              "level", "batch", "hash", "range")
]


def _global_batch_oracle(patterns: list[list[int]]) -> str:
    sels = []
    for p, pat in enumerate(patterns):
        joins = " ".join(
            f"JOIN flat f{j} ON f{j}.g = f0.g + {j} AND f{j}.t = {pat[j]}"
            for j in range(1, len(pat))
        )
        sels.append(
            f"SELECT CAST({p} AS INTEGER) AS pattern_id, CAST(f0.g AS BIGINT) AS gpos "
            f"FROM flat f0 {joins} WHERE f0.t = {pat[0]}"
        )
    return f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
)
""" + "\nUNION ALL\n".join(sels)


def _neardup_split(spark: SparkSession, sf_dir: str):
    """(new, old) ingestion split of the documents table (trailing-digit
    %5, replica-id safe) for the incremental near-dup parity gates."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    is_new = _doc_num("doc_id") % 5 == 0
    return docs.filter(is_new), docs.filter(~is_new)


ANN_FILTER_LABEL = 1


def _takedown_ids(spark: SparkSession, sf_dir: str) -> list[str]:
    """Deterministic takedown set for the parity gates: doc_ids whose
    trailing digits ≡ 3 (mod 7) — spread across hash shards."""
    return [r["doc_id"] for r in _docs(spark, sf_dir)
            .filter(F.col("doc_id").cast("long") % 7 == 3)
            .orderBy("doc_id").limit(12).collect()]


# SemDeDup threshold: the synthetic embeddings are near-random (max
# pairwise cosine ~0.51), so the "semantic near-dup" band sits at ~0.42
# (27-34 pairs at sf0.001/0.01). Every pair's cosine clears the threshold
# by >= 7e-4 on both fixtures (measured; float noise between numpy and
# DuckDB's list_cosine_similarity is ~1e-15), so the >= cut decides
# identically in both engines — tests/test_semantic_dedup.py guards the gap
SEMDEDUP_T = 0.42

# THE one SQL definition of the exact semantic pair graph — all three
# SemDeDup twins compose it
_SEM_PAIRS_CTE = f"""e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(a.v, b.v) AS c
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.v, b.v) >= {SEMDEDUP_T}
)"""


# incremental-semantic threshold: the new-batch x corpus cross band is
# thinner than the full pair graph's, so sit slightly lower for a
# non-trivial pair count; gaps >= 5e-4 at both fixtures (measured)
SEMDEDUP_INC_T = 0.40


def _semantic_split(spark: SparkSession, sf_dir: str):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new = emb.filter(F.col("vec_id") % 7 == 0)
    old = emb.filter(F.col("vec_id") % 7 != 0)
    return new, old


def _semantic_index(spark: SparkSession, sf_dir: str) -> str:
    """Exhaustive (n_centroids=1) persisted IVF index over the corpus side
    of the %7 split — written once per sf_dir, shared by the incremental
    batch + stream queries."""
    import tempfile

    key = ("sem_ivf_index", sf_dir)
    if key not in _CACHE:
        _new, old = _semantic_split(spark, sf_dir)
        path = _tmpdir(prefix="hbi_semivf_") + "/ivf"
        S.write_ivf_index(old, path, n_centroids=1)
        _CACHE[key] = path
    return _CACHE[key]


def _winnowing_oracle(k: int = 8, window: int = 4) -> str:
    # nested Horner over LEAD(): ((c0*B + c1) % P)*B + c2 ... matching the
    # numpy kernel's per-step mod exactly (int64-safe in both engines)
    h = "CAST(c AS BIGINT)"
    for j in range(1, k):
        h = f"(({h}) * {BASE} + lead(c, {j}) OVER w) % {MOD}"
    return f"""WITH chars AS (
  SELECT doc_id, i, ascii(substr(text, CAST(i AS INT), 1)) AS c,
         length(text) AS n
  FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
               unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS i
        FROM documents)
),
grams AS (
  SELECT doc_id, i, n - {k} + 1 AS n_grams,
         {h} AS h
  FROM chars
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY i <= n - {k} + 1
),
mins AS (
  SELECT doc_id, n_grams, i,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS m
  FROM grams
)
SELECT DISTINCT doc_id, CAST(m AS BIGINT) AS fp
FROM mins WHERE i <= GREATEST(1, n_grams - {window} + 1)"""


CHAR_COLLISION_THRESH = 80_000_000  # ~= top-decile collision on the fixture
CHAR_MIN_DISTINCT = 4


ORDERS_CONS = [
    ("not_null", "o_orderkey"),
    ("unique", "o_orderkey"),
    ("in_range", "o_totalprice", 0.0, 250000.0),
    ("accepted_values", "o_orderstatus", ["O", "F"]),
    ("regex_match", "o_orderpriority", "[0-3]-[A-Z ]+"),
    ("row_count_between", 1, 1000000000),
    ("freshness", "o_orderdate", "2001-01-01 00:00:00"),
    ("fk", "o_custkey", "customer_dim", "c_custkey"),
]


# ---------------------------------------------------------------------------
# corpus drift: exact pairwise TVD between source token distributions
# ---------------------------------------------------------------------------
TVD_PAIR = ("src0", "src1")
TVD_TOPK = 20


# ---------------------------------------------------------------------------
# content-defined chunking (operators/cdc.py)
# ---------------------------------------------------------------------------
CDC_W, CDC_BITS = 8, 5
CDC_SEED = CFG.seed + 41


def _cdc_chunks_cte() -> str:
    """CTE chain ``docsrc -> chunks(doc_id VARCHAR, source, chunk_idx INT,
    char_start BIGINT, chunk)`` replaying operators/cdc.chunk_starts in
    DuckDB: the degree-7 FNV-prime polynomial over each 8-char window
    (HUGEINT mod-2^64), the bit-exact SplitMix64 chain
    (_key_hash_ctes), cut-after-e0 iff hash % 2^bits == 0, islands via
    LEAD over the start set.  Docs shorter than the window fall through
    with the single start=1 row (no poly rows exist).

    The polynomial/hash/chunk CTEs are forced MATERIALIZED: DuckDB 1.0
    INLINES plain CTEs per reference, and re-inlining the SplitMix64
    expression chain through the boundary join turned a 0.5 s oracle
    into a >16 min one (measured) — materialization pins each stage to
    one evaluation."""
    from hierarchical_bloom_filter_index_spark.operators.cdc import _weights

    w, bits = CDC_W, CDC_BITS
    ws = _weights(w)
    poly_terms = " + ".join(
        f"CAST(unicode(substr(text, s + {j}, 1)) AS HUGEINT)"
        f" * CAST({int(ws[j])} AS HUGEINT)" for j in range(w))
    return f"""docsrc AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source, text
  FROM documents WHERE length(text) > 0),
cdcpoly AS MATERIALIZED (
  SELECT doc_id, s, n, ({poly_terms}) % {_P64} AS keyu
  FROM (SELECT doc_id, text, length(text) AS n,
               unnest(generate_series(1, CAST(length(text) - {w} + 1 AS BIGINT))) AS s
        FROM docsrc WHERE length(text) >= {w})),
cdcpolyb AS MATERIALIZED (
  SELECT doc_id, s, n,
         CAST(keyu - CASE WHEN keyu >= {1 << 63} THEN {_P64} ELSE 0 END
              AS BIGINT) AS keyb
  FROM cdcpoly),
{_key_hash_ctes(CDC_SEED, 'cdch', 'SELECT DISTINCT keyb AS key FROM cdcpolyb')},
cdchm AS MATERIALIZED (SELECT key, _h FROM cdch),
cdcstarts AS (
  SELECT doc_id, 1 AS st FROM docsrc
  UNION ALL
  SELECT p.doc_id, p.s + {w} AS st
  FROM cdcpolyb p JOIN cdchm ON cdchm.key = p.keyb
  WHERE cdchm._h % {1 << bits} = 0 AND p.s + {w} <= p.n),
cdcspans AS (
  SELECT doc_id, st,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY st) - 1
              AS INTEGER) AS chunk_idx,
         LEAD(st) OVER (PARTITION BY doc_id ORDER BY st) AS nxt
  FROM cdcstarts),
chunks AS MATERIALIZED (
  SELECT s.doc_id, d.source, s.chunk_idx,
         CAST(s.st - 1 AS BIGINT) AS char_start,
         substr(d.text, s.st,
                COALESCE(s.nxt, length(d.text) + 1) - s.st) AS chunk
  FROM cdcspans s JOIN docsrc d ON d.doc_id = s.doc_id)"""


def _chunk_split(spark: SparkSession, sf_dir: str):
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    is_new = _doc_num("doc_id") % 5 == 0
    return docs.filter(is_new), docs.filter(~is_new)


VOCAB_N = 16


# SimHash Hamming-pair oracle parameters: shingle width, hash seed, and the
# Hamming radius of the pair query (pigeonhole banding with max_hamming+1
# chunks is EXACT — candidates are a superset, the bit_count filter decides)
SIMHASH_N, SIMHASH_SEED, SIMHASH_D = 4, 7, 3

_SM_GOLDEN = 0x9E3779B97F4A7C15
_SM_M1, _SM_M2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB


def _sql_splitmix(col: str) -> str:
    """splitmix64(col) for a HUGEINT col in [0, 2^64) — the seed-free
    finalizer (sketches/hashing.splitmix64), composed from the same
    _sql_mul64/_sql_xsr primitives the seeded twin uses."""
    h0 = f"((({col}) + {_SM_GOLDEN}) % {_P64})"
    h1 = _sql_mul64(_sql_xsr(h0, 30), _SM_M1)
    h2 = _sql_mul64(_sql_xsr(h1, 27), _SM_M2)
    return _sql_xsr(h2, 31)


def _sql_hash64(col: str, seed: int) -> str:
    """hash64(col, seed) for a HUGEINT col in [0, 2^64) — xor the per-seed
    mix constant on the signed BIGINT view, then splitmix64 (bit-exact vs
    sketches/hashing.hash64; same construction as _key_hash_ctes, usable
    as a single inline expression)."""
    s = _seed_mix_const(seed)
    s_signed = s - _P64 if s >= (1 << 63) else s
    signed = (f"CAST(({col}) - CASE WHEN ({col}) >= {1 << 63} THEN {_P64} "
              f"ELSE 0 END AS BIGINT)")
    x = f"xor({signed}, CAST({s_signed} AS BIGINT))"
    ux = f"(CAST({x} AS HUGEINT) + CASE WHEN {x} < 0 THEN {_P64} ELSE 0 END)"
    return _sql_splitmix(ux)


def _simhash_pairs_oracle() -> str:
    """DuckDB twin of dedup.simhash_near_pairs on the _CONTAINMENT_DOMAIN
    sub-corpus: recompute every 64-bit SimHash signature from scratch in SQL
    (char-substr shingles == the kernel's byte windows on ASCII docs; packed
    big-endian -> splitmix64 -> seeded hash64, bit-exact vs the numpy chain
    in dedup.char_shingle_hashes/simhash_signatures — DISTINCT before or
    after hashing is equivalent because splitmix64 is a bijection), then
    exact all-pairs Hamming via bit_count(xor) on the signed BIGINT view
    (DuckDB's bit_count counts two's-complement bits, verified -1 -> 64).
    The per-doc bit sums use 64 SUM aggregates in ONE GROUP BY instead of a
    64x row fan-out; sign rule `2*cnt_b > n` == the kernel's `acc > 0`."""
    n = SIMHASH_N
    pack = " + ".join(
        f"ord(substr(text, i + {j}, 1)) * {256 ** (n - 1 - j)}" for j in range(n)
    )
    cnts = ",\n  ".join(
        f"SUM(CAST((h // {1 << b}) % 2 AS BIGINT)) AS c{b}" for b in range(64)
    )
    word = " + ".join(
        f"CASE WHEN 2*c{b} > n THEN CAST({1 << b} AS HUGEINT) ELSE 0 END"
        for b in range(64)
    )
    return f"""WITH dom AS (
  -- VARCHAR doc ids up front: the Spark side's doc_id is string, so the
  -- a < b pair orientation below must be the STRING order on both engines
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  WHERE length(text) >= 5 AND strlen(text) = length(text)),
sh AS (
  SELECT DISTINCT doc_id, CAST({pack} AS HUGEINT) AS key
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, CAST(length(text) - {n - 1} AS BIGINT))) AS i
        FROM dom)
),
keys AS (SELECT DISTINCT key FROM sh),
h1 AS MATERIALIZED (SELECT key, {_sql_splitmix('key')} AS sm FROM keys),
h2 AS MATERIALIZED (SELECT key, {_sql_hash64('sm', SIMHASH_SEED)} AS h FROM h1),
acc AS (
  SELECT s.doc_id, COUNT(*) AS n, {cnts}
  FROM sh s JOIN h2 h USING (key)
  GROUP BY s.doc_id
),
sig AS (SELECT doc_id, {word} AS uw FROM acc),
sw AS (SELECT doc_id,
              CAST(uw - CASE WHEN uw >= {1 << 63} THEN CAST({_P64} AS HUGEINT)
                        ELSE 0 END AS BIGINT) AS simhash
       FROM sig)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sw a JOIN sw b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_D}"""


PR_ITERS, PR_DAMPING, PR_SCALE = 5, (85, 100), 10**12


def _pagerank_oracle_sql() -> str:
    """DuckDB twin of q_custsupp_pagerank: the same edge derivation and the
    same integer fixed-point recurrence, unrolled to PR_ITERS CTE stages
    (every operation is a floor over non-negative BIGINTs, so Spark `div`
    == DuckDB `//` and the scores are hash-equal)."""
    num, den = PR_DAMPING
    parts = [f"""WITH eraw AS (
  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS u,
                  's:' || CAST(l_suppkey AS VARCHAR) AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ed AS (SELECT u, v FROM eraw UNION ALL SELECT v AS u, u AS v FROM eraw),
nodes AS (SELECT DISTINCT u AS node
          FROM (SELECT u FROM ed UNION ALL SELECT v FROM ed)),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY u),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM nodes),
s0 AS (SELECT node, CAST({PR_SCALE} // cnt AS BIGINT) AS s FROM nodes, nn)"""]
    for i in range(1, PR_ITERS + 1):
        parts.append(f"""c{i} AS (
  SELECT ed.v AS node, SUM(s.s // deg.d) AS m
  FROM s{i - 1} s JOIN deg ON deg.u = s.node JOIN ed ON ed.u = s.node
  GROUP BY ed.v),
s{i} AS (
  SELECT nodes.node,
         CAST(({PR_SCALE} * {den - num}) // ({den} * nn.cnt)
              + ({num} * COALESCE(c.m, 0)) // {den} AS BIGINT) AS s
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} c ON c.node = nodes.node)""")
    return (",\n".join(parts)
            + f"\nSELECT node, s AS score FROM s{PR_ITERS}")


# Queries whose plan ends in a unique-key LEFT JOIN: Spark 4 eliminates
# that join under a bare .count() (the whole pipeline collapses to the
# corpus scan — measured 0.2s for 5.3s of real work), so timing harnesses
# must force the named output column through an aggregate. bench.py and
# scripts/measure_query_scaling.py consume this — register any new
# scrub-like query HERE, next to its queries() entry, not in the harnesses.
FORCE_OUTPUT_COLS = {
    "scrub_crossdoc_docs": "clean_text",
    "scrub_ingest_docs": "clean_text",
    # pure projection: count() would prune the regexp fold away entirely
    "pii_redact": "clean_text",
    # unique-key LEFT join vs the store: eliminated under bare count()
    "chunk_novelty": "n_known_chunks",
    # the rolling-window columns are pruned (and the Window dropped)
    # when only the row count is observed
    "event_rolling_daily": "roll_n",
}


__all__ = [k for k in list(globals()) if not k.startswith('__')]
