"""DuckDB oracle SQL, part 1 of 2 — moved verbatim."""
from __future__ import annotations

from .core import *  # noqa: F401,F403


def _oracles_a() -> dict[str, str]:
    probe_list = ", ".join(str(t) for t in PROBE_TOKENS)
    stop_occ = " + ".join(_occ("text", f" {w} ") for w in T.STOPWORDS)
    punct_occ = " + ".join(_occ("text", p) for p in [".", ",", ";", ":", "!", "?"])
    langs = list(T.LANG_MARKERS)
    lang_scores = {
        lang: " + ".join(_occ("text", mk) for mk in T.LANG_MARKERS[lang]) for lang in langs
    }
    score_cols = ", ".join(f"({expr}) AS s_{lang.replace('.', '')}" for lang, expr in lang_scores.items())
    greatest = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    first_max = " ".join(f"WHEN s_{l} = g THEN '{l}'" for l in langs)

    return {
        "hbi_pattern_present": _pattern_oracle(PAT_PRESENT),
        # top-k docs by occurrence count; (n DESC, doc_id ASC) tie-break
        # makes the k-th boundary deterministic on both engines
        "hbi_pattern_topk_docs": f"""SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches
FROM ({_pattern_oracle(PAT_PRESENT)})
GROUP BY doc_id
ORDER BY n_matches DESC, doc_id ASC
LIMIT {TOPK_DOCS_K}""",
        "hbi_pattern_strided": _pattern_oracle(PAT_PRESENT),
        "hbi_pattern_markov": _pattern_oracle(PAT_RARE),
        "hbi_pattern_batch": _pattern_batch_oracle(BATCH_PATTERNS),
        # boolean AND/NOT retrieval: patterns are contiguous codepoint runs,
        # so doc-level matching is plain substring containment on text
        "hbi_boolean_docs": f"""SELECT CAST(doc_id AS VARCHAR) AS doc_id
FROM documents
WHERE {" AND ".join(f"contains(text, '{''.join(chr(t) for t in p)}')" for p in BOOL_MUST)}
  AND NOT ({" OR ".join(f"contains(text, '{''.join(chr(t) for t in p)}')" for p in BOOL_MUST_NOT)})""",
        # CNF: AND over per-clause ORs of substring containment, minus NOTs
        "hbi_boolean_docs_cnf": f"""SELECT CAST(doc_id AS VARCHAR) AS doc_id
FROM documents
WHERE {" AND ".join("(" + " OR ".join(f"contains(text, '{''.join(chr(t) for t in p)}')" for p in cl) + ")" for cl in CNF_CLAUSES)}
  AND NOT ({" OR ".join(f"contains(text, '{''.join(chr(t) for t in p)}')" for p in CNF_MUST_NOT)})""",
        "hbi_bm25_topk": _bm25_oracle(BM25_TERMS, BM25_K, BM25_K1, BM25_B),
        "hbi_pattern_contexts": _contexts_oracle(PAT_PRESENT, KWIC_CONTEXT),
        "hbi_regex": _regex_oracle(REGEX_CHAIN),
        "hbi_regex_gap": _regex_oracle(REGEX_GAP),
        "hbi_global_regex": _global_regex_oracle(GLOBAL_REGEX, GLOBAL_REGEX_MAXLEN),
        "hbi_regex_batch": _regex_batch_oracle(REGEX_BATCH),
        "hbi_global_pattern_batch": _global_batch_oracle(GLOBAL_BATCH_PATTERNS),
        "hbi_global_pattern_batch_wide": _global_batch_oracle(WIDE_BATCH_PATTERNS),
        "hbi_pattern_multilevel": _pattern_oracle(PAT_PRESENT),
        "hbi_pattern_missing": _pattern_oracle(PAT_MISSING),
        "hbi_pattern_rare": _pattern_oracle(PAT_RARE),
        "hbi_pattern_wildcard": _wildcard_oracle(PAT_WILDCARD),
        "hbi_global_pattern_wildcard": _global_wildcard_oracle(PAT_WILDCARD),
        "hbi_pattern_charclass": _charclass_oracle(PAT_CHARCLASS),
        "hbi_kmismatch": _kmismatch_oracle(PAT_MISSING, 1),
        "hbi_global_kmismatch": _global_kmismatch_oracle(PAT_GLOBAL, 1),
        "hbi_kedit": _kedit_oracle(PAT_EDIT, 1),
        "fuzzy_topk_matches": _fuzzy_topk_oracle(PAT_EDIT, 2, 20),
        "global_fuzzy_topk_matches": _global_fuzzy_topk_oracle(PAT_EDIT, 2, 20),
        "hbi_global_kedit": _global_kedit_oracle(PAT_EDIT, 1),
        "hbi_global_approx_batch": f"""SELECT CAST(0 AS INTEGER) AS query_id, gpos
FROM ({_global_kmismatch_oracle(PAT_GLOBAL, 1)})
UNION ALL
SELECT CAST(1 AS INTEGER) AS query_id, gpos
FROM ({_global_kedit_oracle(PAT_EDIT, 1)})""",
        "hbi_approx_batch": f"""SELECT CAST(0 AS INTEGER) AS query_id, doc_id, pos
FROM ({_kmismatch_oracle(PAT_MISSING, 1)})
UNION ALL
SELECT CAST(1 AS INTEGER) AS query_id, doc_id, pos
FROM ({_kedit_oracle(PAT_EDIT, 1)})
UNION ALL
SELECT CAST(2 AS INTEGER) AS query_id, doc_id, pos
FROM ({_kmismatch_oracle(PAT_RARE2, 2)})""",
        "window_membership": f"""WITH {CORPUS_CTE}, {POS_CTE}
SELECT DISTINCT doc_id, CAST((i - 1) // {CFG.leaf_span} AS BIGINT) AS w_id
FROM pos WHERE tokens[i] = {ord("q")}""",
        "hbi_proximity": f"""WITH {CORPUS_CTE}, {POS_CTE},
pa AS (SELECT doc_id, i - 1 AS pos_a FROM pos WHERE tokens[i] = {ord("q")}),
pb AS (SELECT doc_id, i - 1 AS pos_b FROM pos WHERE tokens[i] = {ord("e")})
SELECT pa.doc_id AS doc_id, CAST(pos_a AS INT) AS pos_a, CAST(pos_b AS INT) AS pos_b
FROM pa JOIN pb ON pa.doc_id = pb.doc_id
WHERE abs(pos_a - pos_b) <= 6""",
        "hbi_proximity_ordered": f"""WITH {CORPUS_CTE}, {POS_CTE},
pa AS (SELECT doc_id, i - 1 AS pos_a FROM pos WHERE tokens[i] = {ord("q")}),
pb AS (SELECT doc_id, i - 1 AS pos_b FROM pos WHERE tokens[i] = {ord("e")})
SELECT pa.doc_id AS doc_id, CAST(pos_a AS INT) AS pos_a, CAST(pos_b AS INT) AS pos_b
FROM pa JOIN pb ON pa.doc_id = pb.doc_id
WHERE pos_b > pos_a AND pos_b <= pos_a + 6""",
        "hbi_proximity_negated": f"""WITH {CORPUS_CTE}, {POS_CTE},
pa AS (SELECT doc_id, i - 1 AS pos_a FROM pos WHERE tokens[i] = {ord("e")}),
pb AS (SELECT doc_id, i - 1 AS p FROM pos WHERE tokens[i] = {ord("q")})
SELECT pa.doc_id AS doc_id, CAST(pos_a AS INT) AS pos_a
FROM pa WHERE NOT EXISTS (
  SELECT 1 FROM pb WHERE pb.doc_id = pa.doc_id
  AND pb.p BETWEEN pa.pos_a - 6 AND pa.pos_a + 6)""",
        "hbi_global_proximity_negated": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
pa AS (SELECT g FROM flat WHERE t = {ord("e")}),
pb AS (SELECT g FROM flat WHERE t = {ord("q")})
SELECT CAST(pa.g AS BIGINT) AS gpos_a
FROM pa WHERE NOT EXISTS (
  SELECT 1 FROM pb WHERE pb.g BETWEEN pa.g - 6 AND pa.g + 6)""",
        "hbi_chain": f"""WITH {CORPUS_CTE}, {POS_CTE},
p0 AS (SELECT doc_id, i - 1 AS p FROM pos WHERE tokens[i] = {CHAIN_TOKENS[0]}),
p1 AS (SELECT doc_id, i - 1 AS p FROM pos WHERE tokens[i] = {CHAIN_TOKENS[1]}),
p2 AS (SELECT doc_id, i - 1 AS p FROM pos WHERE tokens[i] = {CHAIN_TOKENS[2]})
SELECT DISTINCT p0.doc_id AS doc_id, CAST(p0.p AS INT) AS pos
FROM p0
JOIN p1 ON p1.doc_id = p0.doc_id AND p1.p > p0.p AND p1.p <= p0.p + {CHAIN_W}
JOIN p2 ON p2.doc_id = p0.doc_id AND p2.p > p1.p AND p2.p <= p1.p + {CHAIN_W}""",
        "hbi_proximity_batch": f"""WITH {CORPUS_CTE}, {POS_CTE},
flat AS (SELECT doc_id, i - 1 AS p, tokens[i] AS t FROM pos),
pairs(pair_id, ta, tb, w, is_ord) AS (VALUES {", ".join(
            f"({i}, {q[0]}, {q[1]}, {q[2]}, {1 if len(q) > 3 and q[3] else 0})"
            for i, q in enumerate(PROX_BATCH))})
SELECT CAST(pair_id AS INT) AS pair_id, a.doc_id AS doc_id,
       CAST(a.p AS INT) AS pos_a, CAST(b.p AS INT) AS pos_b
FROM pairs
JOIN flat a ON a.t = pairs.ta
JOIN flat b ON b.doc_id = a.doc_id AND b.t = pairs.tb
WHERE (pairs.is_ord = 0 AND abs(a.p - b.p) <= pairs.w AND a.p <> b.p)
   OR (pairs.is_ord = 1 AND b.p > a.p AND b.p <= a.p + pairs.w)""",
        "hbi_chain_batch": f"""WITH {CORPUS_CTE}, {POS_CTE},
flat AS (SELECT doc_id, i - 1 AS p, tokens[i] AS t FROM pos)
""" + "\nUNION ALL\n".join(
            _chain_sql(cid, toks, w, global_axis=False)
            for cid, (toks, w) in enumerate(CHAIN_BATCH)),
        "hbi_global_chain_batch": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
)
""" + "\nUNION ALL\n".join(
            _chain_sql(cid, toks, w, global_axis=True)
            for cid, (toks, w) in enumerate(GCHAIN_BATCH)),
        # negated SET proximity: NOT EXISTS over any-of B membership — the
        # B-absence condition is a conjunction over B's members
        "hbi_negated_set": f"""WITH {CORPUS_CTE}, {POS_CTE},
flat AS (SELECT doc_id, i - 1 AS p, tokens[i] AS t FROM pos),
q(set_id, ta, tb, w, is_ord) AS (VALUES {", ".join(
            f"({i}, [{', '.join(str(t) for t in s[0])}],"
            f" [{', '.join(str(t) for t in s[1])}], {s[2]},"
            f" {1 if len(s) > 3 and s[3] else 0})"
            for i, s in enumerate(NEGSET_BATCH))})
SELECT CAST(set_id AS INT) AS set_id, a.doc_id AS doc_id,
       CAST(a.p AS INT) AS pos_a
FROM q
JOIN flat a ON list_contains(q.ta, a.t)
WHERE NOT EXISTS (
  SELECT 1 FROM flat b WHERE b.doc_id = a.doc_id AND list_contains(q.tb, b.t)
  AND ((q.is_ord = 0 AND b.p BETWEEN a.p - q.w AND a.p + q.w AND b.p <> a.p)
    OR (q.is_ord = 1 AND b.p > a.p AND b.p <= a.p + q.w)))""",
        "hbi_global_negated_set": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
q(set_id, ta, tb, w, is_ord) AS (VALUES {", ".join(
            f"({i}, [{', '.join(str(t) for t in s[0])}],"
            f" [{', '.join(str(t) for t in s[1])}], {s[2]},"
            f" {1 if len(s) > 3 and s[3] else 0})"
            for i, s in enumerate(GNEGSET_BATCH))})
SELECT CAST(set_id AS INT) AS set_id, CAST(a.g AS BIGINT) AS gpos_a
FROM q
JOIN flat a ON list_contains(q.ta, a.t)
WHERE NOT EXISTS (
  SELECT 1 FROM flat b WHERE list_contains(q.tb, b.t)
  AND ((q.is_ord = 0 AND b.g BETWEEN a.g - q.w AND a.g + q.w AND b.g <> a.g)
    OR (q.is_ord = 1 AND b.g > a.g AND b.g <= a.g + q.w)))""",
        "hbi_set_chain": f"""WITH {CORPUS_CTE}, {POS_CTE},
flat AS (SELECT doc_id, i - 1 AS p, tokens[i] AS t FROM pos)
""" + "\nUNION ALL\n".join(
            _set_chain_sql(cid, slots, w, global_axis=False)
            for cid, (slots, w) in enumerate(SETCHAIN_BATCH)),
        "hbi_global_set_chain": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
)
""" + "\nUNION ALL\n".join(
            _set_chain_sql(cid, slots, w, global_axis=True)
            for cid, (slots, w) in enumerate(GSETCHAIN_BATCH)),
        "hbi_negated_batch": f"""WITH {CORPUS_CTE}, {POS_CTE},
flat AS (SELECT doc_id, i - 1 AS p, tokens[i] AS t FROM pos),
pairs(pair_id, ta, tb, w, is_ord) AS (VALUES {", ".join(
            f"({i}, {q[0]}, {q[1]}, {q[2]}, {1 if len(q) > 3 and q[3] else 0})"
            for i, q in enumerate(NEG_BATCH))})
SELECT CAST(pair_id AS INT) AS pair_id, a.doc_id AS doc_id,
       CAST(a.p AS INT) AS pos_a
FROM pairs
JOIN flat a ON a.t = pairs.ta
WHERE NOT EXISTS (
  SELECT 1 FROM flat b WHERE b.doc_id = a.doc_id AND b.t = pairs.tb
  AND ((pairs.is_ord = 0 AND b.p BETWEEN a.p - pairs.w AND a.p + pairs.w
        AND b.p <> a.p)
    OR (pairs.is_ord = 1 AND b.p > a.p AND b.p <= a.p + pairs.w)))""",
        "hbi_global_negated_batch": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
pairs(pair_id, ta, tb, w, is_ord) AS (VALUES {", ".join(
            f"({i}, {q[0]}, {q[1]}, {q[2]}, {1 if len(q) > 3 and q[3] else 0})"
            for i, q in enumerate(GNEG_BATCH))})
SELECT CAST(pair_id AS INT) AS pair_id, CAST(a.g AS BIGINT) AS gpos_a
FROM pairs
JOIN flat a ON a.t = pairs.ta
WHERE NOT EXISTS (
  SELECT 1 FROM flat b WHERE b.t = pairs.tb
  AND ((pairs.is_ord = 0 AND b.g BETWEEN a.g - pairs.w AND a.g + pairs.w
        AND b.g <> a.g)
    OR (pairs.is_ord = 1 AND b.g > a.g AND b.g <= a.g + pairs.w)))""",
        "hbi_global_proximity": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
pa AS (SELECT g FROM flat WHERE t = {ord("q")}),
pb AS (SELECT g FROM flat WHERE t = {ord("e")})
SELECT CAST(pa.g AS BIGINT) AS gpos_a, CAST(pb.g AS BIGINT) AS gpos_b
FROM pa JOIN pb ON pb.g BETWEEN pa.g - 6 AND pa.g + 6""",
        "hbi_global_proximity_ordered": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
pa AS (SELECT g FROM flat WHERE t = {ord("q")}),
pb AS (SELECT g FROM flat WHERE t = {ord("e")})
SELECT CAST(pa.g AS BIGINT) AS gpos_a, CAST(pb.g AS BIGINT) AS gpos_b
FROM pa JOIN pb ON pb.g BETWEEN pa.g + 1 AND pa.g + 6""",
        "hbi_global_chain": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
p0 AS (SELECT g FROM flat WHERE t = {CHAIN_TOKENS[0]}),
p1 AS (SELECT g FROM flat WHERE t = {CHAIN_TOKENS[1]}),
p2 AS (SELECT g FROM flat WHERE t = {CHAIN_TOKENS[2]})
SELECT DISTINCT CAST(p0.g AS BIGINT) AS gpos
FROM p0
JOIN p1 ON p1.g > p0.g AND p1.g <= p0.g + {CHAIN_W}
JOIN p2 ON p2.g > p1.g AND p2.g <= p1.g + {CHAIN_W}""",
        # any-of SET proximity: a pos_a qualifies through ANY member of A,
        # a pos_b through ANY member of B (list_contains IN-sets); equal
        # positions always excluded
        "hbi_set_proximity": f"""WITH {CORPUS_CTE}, {POS_CTE},
flat AS (SELECT doc_id, i - 1 AS p, tokens[i] AS t FROM pos),
q(set_id, ta, tb, w, is_ord) AS (VALUES {", ".join(
            f"({i}, [{', '.join(str(t) for t in s[0])}],"
            f" [{', '.join(str(t) for t in s[1])}], {s[2]},"
            f" {1 if len(s) > 3 and s[3] else 0})"
            for i, s in enumerate(SETPROX_BATCH))})
SELECT CAST(set_id AS INT) AS set_id, a.doc_id AS doc_id,
       CAST(a.p AS INT) AS pos_a, CAST(b.p AS INT) AS pos_b
FROM q
JOIN flat a ON list_contains(q.ta, a.t)
JOIN flat b ON b.doc_id = a.doc_id AND list_contains(q.tb, b.t)
WHERE (q.is_ord = 0 AND abs(a.p - b.p) <= q.w AND a.p <> b.p)
   OR (q.is_ord = 1 AND b.p > a.p AND b.p <= a.p + q.w)""",
        "hbi_global_set_proximity": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
q(set_id, ta, tb, w, is_ord) AS (VALUES {", ".join(
            f"({i}, [{', '.join(str(t) for t in s[0])}],"
            f" [{', '.join(str(t) for t in s[1])}], {s[2]},"
            f" {1 if len(s) > 3 and s[3] else 0})"
            for i, s in enumerate(GSETPROX_BATCH))})
SELECT CAST(set_id AS INT) AS set_id, CAST(a.g AS BIGINT) AS gpos_a,
       CAST(b.g AS BIGINT) AS gpos_b
FROM q
JOIN flat a ON list_contains(q.ta, a.t)
JOIN flat b ON b.g BETWEEN a.g - q.w AND a.g + q.w AND list_contains(q.tb, b.t)
WHERE (q.is_ord = 0 AND a.g <> b.g)
   OR (q.is_ord = 1 AND b.g > a.g AND b.g <= a.g + q.w)""",
        "hbi_global_proximity_batch": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
pairs(pair_id, ta, tb, w, is_ord) AS (VALUES {", ".join(
            f"({i}, {q[0]}, {q[1]}, {q[2]}, {1 if len(q) > 3 and q[3] else 0})"
            for i, q in enumerate(GPROX_BATCH))})
SELECT CAST(pair_id AS INT) AS pair_id, CAST(a.g AS BIGINT) AS gpos_a,
       CAST(b.g AS BIGINT) AS gpos_b
FROM pairs
JOIN flat a ON a.t = pairs.ta
JOIN flat b ON b.g BETWEEN a.g - pairs.w AND a.g + pairs.w AND b.t = pairs.tb
WHERE (pairs.is_ord = 0 AND a.g <> b.g)
   OR (pairs.is_ord = 1 AND b.g > a.g AND b.g <= a.g + pairs.w)""",
        "window_membership_batch": f"""WITH {CORPUS_CTE}, {POS_CTE}
SELECT DISTINCT CAST(tokens[i] AS INT) AS token, doc_id,
       CAST((i - 1) // {CFG.leaf_span} AS BIGINT) AS w_id
FROM pos WHERE tokens[i] IN ({", ".join(str(t) for t in PROBE_TOKENS)})""",
        "global_window_membership": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
)
SELECT DISTINCT CAST((o + i - 1) // {CFG.leaf_span} AS BIGINT) AS w_id
FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
WHERE tokens[i] = {ord("q")}""",
        "global_window_membership_batch": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
)
SELECT DISTINCT CAST(tokens[i] AS INT) AS token,
       CAST((o + i - 1) // {CFG.leaf_span} AS BIGINT) AS w_id
FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
WHERE tokens[i] IN ({", ".join(str(t) for t in PROBE_TOKENS)})""",
        "window_distinct_rollup": f"""WITH {CORPUS_CTE}, {POS_CTE}
SELECT doc_id, CAST({CFG.deepest} AS INT) AS level,
       CAST((i - 1) // {CFG.span(CFG.deepest)} AS BIGINT) AS w_id,
       CAST(COUNT(DISTINCT tokens[i]) AS BIGINT) AS n_distinct
FROM pos GROUP BY 1, 2, 3
UNION ALL
SELECT doc_id, CAST({CFG.deepest - 1} AS INT) AS level,
       CAST((i - 1) // {CFG.span(CFG.deepest - 1)} AS BIGINT) AS w_id,
       CAST(COUNT(DISTINCT tokens[i]) AS BIGINT) AS n_distinct
FROM pos GROUP BY 1, 2, 3""",
        "index_geometry": f"""WITH {CORPUS_CTE},
lv(level, span) AS (VALUES {", ".join(f"({L}, {CFG.span(L)})" for L in CFG.levels)})
SELECT CAST(lv.level AS INT) AS level,
       CAST(SUM((n_tok + span - 1) // span) AS BIGINT) AS n_windows,
       CAST(SUM(n_tok) AS BIGINT) AS total_items
FROM corpus, lv GROUP BY 1""",
        "global_window_counts": f"""WITH {CORPUS_CTE},
off AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
)
SELECT CAST((o + i - 1) // {CFG.span(CFG.deepest)} AS BIGINT) AS w_id,
       COUNT(*) AS n_tokens
FROM (SELECT o, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
GROUP BY 1""",
        "hbi_global_pattern": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
)
SELECT CAST(f0.g AS BIGINT) AS gpos
FROM flat f0
{" ".join(f"JOIN flat f{j} ON f{j}.g = f0.g + {j} AND f{j}.t = {PAT_GLOBAL[j]}" for j in range(1, len(PAT_GLOBAL)))}
WHERE f0.t = {PAT_GLOBAL[0]}""",
        "global_offsets": f"""WITH {CORPUS_CTE}
SELECT doc_id,
       CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS doc_offset
FROM corpus""",
        "bigram_topk": f"""WITH {CORPUS_CTE}
SELECT CAST(tokens[i] AS VARCHAR) || '|' || CAST(tokens[i + 1] AS VARCHAR) AS gram,
       COUNT(*) AS cnt
FROM (SELECT tokens, unnest(generate_series(1, CAST(n_tok - 1 AS BIGINT))) AS i FROM corpus)
GROUP BY 1 ORDER BY cnt DESC, gram ASC LIMIT 20""",
        "heavy_hitter_bigrams": f"""WITH {CORPUS_CTE},
grams AS (
  SELECT CAST(tokens[i] AS VARCHAR) || '|' || CAST(tokens[i + 1] AS VARCHAR) AS gram
  FROM (SELECT tokens, unnest(generate_series(1, CAST(n_tok - 1 AS BIGINT))) AS i
        FROM corpus WHERE n_tok >= 2))
SELECT gram, COUNT(*) AS cnt
FROM grams
GROUP BY gram
HAVING COUNT(*) >= CEIL({HH_PHI} * (SELECT COUNT(*) FROM grams))""",
        "heavy_hitters_by_source": f"""WITH {CORPUS_CTE},
grams AS (
  SELECT source, CAST(tokens[i] AS VARCHAR) || '|' || CAST(tokens[i + 1] AS VARCHAR) AS gram
  FROM (SELECT source, tokens, unnest(generate_series(1, CAST(n_tok - 1 AS BIGINT))) AS i
        FROM corpus WHERE n_tok >= 2)),
tot AS (SELECT source, COUNT(*) AS n FROM grams GROUP BY source)
SELECT g.source AS source, gram, COUNT(*) AS cnt
FROM grams g JOIN tot ON g.source = tot.source
GROUP BY g.source, gram, tot.n
HAVING COUNT(*) >= CEIL({HH_GROUP_PHI} * tot.n)""",
        "bigram_fluency": _BIGRAM_FLUENCY_ORACLE,
        "token_freq_histogram": f"""WITH {CORPUS_CTE}, {POS_CTE},
tf AS (SELECT tokens[i] AS t, CAST(COUNT(*) AS BIGINT) AS freq
       FROM pos GROUP BY tokens[i])
SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM tf GROUP BY freq""",
        "token_freq_by_source": f"""WITH {CORPUS_CTE}, {POS_CTE}
SELECT source, CAST(tokens[i] AS INT) AS token, COUNT(*) AS cnt
FROM pos WHERE tokens[i] IN ({probe_list}) GROUP BY 1, 2""",
        "distinct_by_source_exact": f"""WITH {CORPUS_CTE}, {POS_CTE}
SELECT source, CAST(COUNT(DISTINCT tokens[i]) AS BIGINT) AS n_distinct
FROM pos GROUP BY 1""",
        "doclen_quantiles_exact": f"""WITH {CORPUS_CTE},
ranked AS (
  SELECT source, n_tok,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS cnt
  FROM corpus),
qs AS (SELECT unnest([{", ".join(str(q) for q in QUANTILES)}]) AS q)
SELECT source, q, CAST(n_tok AS INT) AS val
FROM ranked, qs WHERE rn = CAST(ceil(q * cnt) AS BIGINT)""",
        "dedup_exact_pairs": """SELECT CAST(a.doc_id AS VARCHAR) AS doc_a, CAST(b.doc_id AS VARCHAR) AS doc_b
FROM documents a JOIN documents b
  ON a.text = b.text AND CAST(a.doc_id AS VARCHAR) < CAST(b.doc_id AS VARCHAR)""",
        # exact prefix-filtered Jaccard join == brute force (t = 9/10,
        # rational compare on both engines — no float boundary drift)
        "jaccard_prefix_docs": """WITH s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE length(text) > 0)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
       CAST(len(a.toks) + len(b.toks)
            - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_union,
       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         / (len(a.toks) + len(b.toks)
            - len(list_intersect(a.toks, b.toks))) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE 10 * len(list_intersect(a.toks, b.toks))
      >= 9 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))""",
        "dedup_jaccard_pairs": """WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS sh
  FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
               unnest(generate_series(1, CAST(length(text) - 4 AS BIGINT))) AS i
        FROM documents)
), sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST((i * 1000000) // (sa.sz + sb.sz - i) AS BIGINT) AS jaccard_x1e6
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE (i * 1000000) // (sa.sz + sb.sz - i) >= 400000""",
        # decontamination: distinct 16-char grams both sides (DuckDB list
        # comprehension = Spark sequence+transform+substring; range() stop
        # is exclusive so short docs yield zero grams on both engines)
        "decontaminate_pairs": f"""WITH {DECON_BG_CTE}, {DECON_CG_CTE}
SELECT doc_id, bench_id, COUNT(*) AS n_shared
FROM cg JOIN bg USING (g)
WHERE doc_id <> bench_id
GROUP BY doc_id, bench_id""",
        "dataset_shards": f"""WITH {CORPUS_CTE},
off AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus)
SELECT CAST(o // {SHARD_BUDGET} AS BIGINT) AS shard_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS doc_lo, MAX(doc_id) AS doc_hi
FROM off GROUP BY shard_id""",
        "shard_layout_parity": """SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS BIGINT) AS shard_id
WHERE FALSE""",
        "clean_corpus_docs": f"""WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM d GROUP BY text),
{DECON_BG_CTE}, {DECON_CG_CTE}, cont AS (
  SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (g) WHERE cg.doc_id <> bg.bench_id)
SELECT doc_id FROM keepers WHERE doc_id NOT IN (SELECT doc_id FROM cont)""",
        "contaminating_grams": f"""WITH {DECON_BG_CTE}, {DECON_CG_CTE}
SELECT g AS gram, COUNT(*) AS n_pairs, COUNT(DISTINCT doc_id) AS n_docs
FROM cg JOIN bg USING (g)
WHERE doc_id <> bench_id
GROUP BY g ORDER BY n_pairs DESC, gram ASC LIMIT {DECON_TOPK}""",
        "contamination_spans": f"""WITH {DECON_BG_CTE}, cp AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(i - 1 AS INTEGER) AS s,
         substring(text, CAST(i AS INT), {DECON_N}) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, CAST(length(text) - {DECON_N - 1} AS BIGINT))) AS i
        FROM documents WHERE length(text) >= {DECON_N})
), hits AS (
  SELECT DISTINCT cp.doc_id, s FROM cp JOIN bg USING (g)
  WHERE cp.doc_id <> bg.bench_id
), {_spans_select_sql("hits", DECON_N)}""",
        "crossdoc_dup_spans": f"""WITH {_SCRUB_CP_CTE}, gs AS (
  SELECT g, COUNT(DISTINCT doc_id) AS nd FROM cp GROUP BY g
), hits AS (
  SELECT DISTINCT cp.doc_id, s FROM cp JOIN gs USING (g) WHERE gs.nd >= 2
), {_spans_select_sql("hits", SCRUB_N)}""",
        "scrub_crossdoc_docs": f"""WITH {_SCRUB_CP_CTE}, gs AS (
  SELECT g, COUNT(DISTINCT doc_id) AS nd, MIN(doc_id) AS keeper
  FROM cp GROUP BY g
), rm AS (
  SELECT DISTINCT cp.doc_id, s FROM cp JOIN gs USING (g)
  WHERE gs.nd >= 2 AND cp.doc_id <> gs.keeper
), {_scrub_select_sql("rm", "d", SCRUB_N)}""",
        "dup_gram_spectrum": _spectrum_oracle(),
        "scrub_ingest_docs": _SCRUB_INGEST_SQL,
        "scrub_ingest_stream": _SCRUB_INGEST_SQL,
        "gram_index_append_parity": """SELECT CAST(NULL AS BIGINT) AS bucket,
       CAST(NULL AS VARCHAR) AS gram, CAST(NULL AS BIGINT) AS df
WHERE FALSE""",
        "gram_stream_parity": """SELECT CAST(NULL AS BIGINT) AS bucket,
       CAST(NULL AS VARCHAR) AS gram, CAST(NULL AS BIGINT) AS df
WHERE FALSE""",
        "gram_index_remove_parity": """SELECT CAST(NULL AS BIGINT) AS bucket,
       CAST(NULL AS VARCHAR) AS gram, CAST(NULL AS BIGINT) AS df
WHERE FALSE""",
        "hbi_pattern_facets": f"""WITH {CORPUS_CTE},
m AS (
  SELECT doc_id
  FROM (SELECT doc_id, tokens,
               unnest(generate_series(1, CAST(n_tok - {len(PAT_PRESENT)} + 1 AS BIGINT))) AS i
        FROM corpus)
  WHERE tokens[i : i + {len(PAT_PRESENT)} - 1] = {_pat_sql(PAT_PRESENT)})
SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_matches
FROM m JOIN corpus USING (doc_id)
GROUP BY source""",
        # incremental novelty: 'novel' = absent from the OLD corpus's gram
        # set (df index), per-doc independent of batch peers
        "novelty_against_corpus": f"""WITH
newdocs AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text
            FROM documents WHERE doc_id % 5 = 0),
olddocs AS (SELECT text FROM documents WHERE doc_id % 5 <> 0),
og AS (SELECT DISTINCT g FROM (SELECT unnest({_GRAM_LIST}) AS g FROM olddocs)),
ng AS (SELECT DISTINCT doc_id, g FROM (
  SELECT doc_id, unnest({_GRAM_LIST}) AS g FROM newdocs))
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN og.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_known,
       CAST(((COUNT(*) - SUM(CASE WHEN og.g IS NOT NULL THEN 1 ELSE 0 END))
             * 1000000) // COUNT(*) AS BIGINT) AS novelty_x1e6
FROM ng LEFT JOIN og ON ng.g = og.g
GROUP BY doc_id""",
        "novelty_scores": f"""WITH {DECON_CG_CTE}, dfx AS (SELECT g, COUNT(*) AS df FROM cg GROUP BY g)
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST((SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS novelty_x1e6
FROM cg JOIN dfx USING (g)
GROUP BY doc_id""",
        "decontaminate_indexed_parity": """SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS VARCHAR) AS bench_id, CAST(NULL AS BIGINT) AS n_shared
WHERE FALSE""",
        # components of the SAME pair graph as dedup_jaccard_pairs, via a
        # recursive transitive closure (fine at oracle scale; the Spark side
        # uses large-star/small-star contraction)
        "neardup_triangles": f"""WITH {_JACCARD_PAIR_CTES},
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM p e1 JOIN p e2 ON e2.doc_a = e1.doc_b
  JOIN p e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT a AS doc_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
GROUP BY doc_id""",
        "dedup_clusters": f"""WITH RECURSIVE {_JACCARD_CC_CTES}
SELECT doc_id, cluster_id, CAST(c.cnt AS BIGINT) AS cluster_sz
FROM cc JOIN (SELECT cluster_id, COUNT(*) AS cnt FROM cc GROUP BY 1) c USING (cluster_id)""",
        "neardup_canonical_docs": f"""WITH RECURSIVE {_JACCARD_CC_CTES}
SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents
WHERE CAST(doc_id AS VARCHAR) NOT IN
      (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)""",
        # incremental-dedup parity gates: both are symmetric differences
        # against the equivalent one-shot computation (LSH itself is not
        # SQL-expressible — seeded numpy MinHash — so the hard gate is
        # result-equality, the shard_layout_parity discipline)
        "incremental_neardup_parity": """SELECT CAST(NULL AS VARCHAR) AS new_id,
       CAST(NULL AS VARCHAR) AS corpus_id, CAST(NULL AS DOUBLE) AS jaccard
WHERE FALSE""",
        "incremental_neardup_stream": """SELECT CAST(NULL AS VARCHAR) AS new_id,
       CAST(NULL AS VARCHAR) AS corpus_id, CAST(NULL AS DOUBLE) AS jaccard
WHERE FALSE""",
        # the LSH containment check compares against the EXACT >= 0.8 pair
        # set: equality holds iff the LSH emitted no false-positive pair.
        # Domain-restricted to ASCII docs >= 5 chars (strlen = byte length
        # in DuckDB), where byte- and char-shingles coincide
        "minhash_lsh_containment": """WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS sh
  FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
               unnest(generate_series(1, CAST(length(text) - 4 AS BIGINT))) AS i
        FROM documents
        WHERE length(text) >= 5 AND strlen(text) = length(text))
), sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE (i * 1000000) // (sa.sz + sb.sz - i) >= 800000""",
        "collocations_pmi": """WITH docs AS (
  SELECT list_filter(string_split(text, ' '), x -> x != '') AS ws FROM documents),
uni AS (SELECT w, COUNT(*) AS cnt FROM (SELECT unnest(ws) AS w FROM docs) GROUP BY w),
big AS (SELECT w1, w2, COUNT(*) AS cnt_ab
        FROM (SELECT ws[i] AS w1, ws[i + 1] AS w2
              FROM (SELECT ws, unnest(generate_series(1, CAST(len(ws) - 1 AS BIGINT))) AS i
                    FROM docs))
        GROUP BY w1, w2 HAVING COUNT(*) >= 3),
tot AS (SELECT SUM(len(ws)) AS n_tok, SUM(GREATEST(len(ws) - 1, 0)) AS n_big FROM docs)
SELECT w1 || '|' || w2 AS gram, CAST(cnt_ab AS BIGINT) AS cnt,
       CAST(cnt_ab AS DOUBLE) * n_tok / a.cnt * n_tok / b.cnt / n_big AS pmi_ratio
FROM big JOIN uni a ON a.w = w1 JOIN uni b ON b.w = w2, tot
ORDER BY pmi_ratio DESC, gram ASC LIMIT 30""",
        "bm25_topk_docs": _word_bm25_oracle_sql(),
        "event_funnel": _funnel_oracle_sql(),
        "event_funnel_windowed": _funnel_windowed_oracle_sql(),
        "lm_doc_scores": _LM_ORACLE,
        # incremental LM scoring: model counts from the 4/5 TRAIN split,
        # scores over the 1/5 batch; unseen bigrams/contexts via LEFT JOIN
        # + COALESCE (c2 -> 0, c1 -> 0) — the same smoothed closed form
        "lm_incremental_scores": """WITH d0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS did, doc_id % 5 = 0 AS is_batch,
         list_filter(string_split(text, ' '), x -> x != '') AS ws
  FROM documents),
pr_t AS (
  SELECT ws[i] AS a, ws[i + 1] AS b
  FROM (SELECT ws, unnest(generate_series(1, CAST(len(ws) - 1 AS BIGINT))) AS i
        FROM d0 WHERE NOT is_batch AND len(ws) >= 2)),
c2 AS (SELECT a, b, COUNT(*) AS c FROM pr_t GROUP BY a, b),
c1 AS (SELECT a, SUM(c) AS c1 FROM c2 GROUP BY a),
vv AS (SELECT COUNT(DISTINCT w) AS v
       FROM (SELECT unnest(ws) AS w FROM d0 WHERE NOT is_batch)),
pr_b AS (
  SELECT did AS doc_id, ws[i] AS a, ws[i + 1] AS b
  FROM (SELECT did, ws, unnest(generate_series(1, CAST(len(ws) - 1 AS BIGINT))) AS i
        FROM d0 WHERE is_batch AND len(ws) >= 2)),
sc AS (
  SELECT pr_b.doc_id,
         CAST(floor(ln((COALESCE(c2.c, 0) + 0.5e0) /
                       (COALESCE(c1.c1, 0) + 0.5e0 * vv.v))
                    * 1e9 + 0.5e0) AS BIGINT) AS lp
  FROM pr_b LEFT JOIN c2 USING (a, b) LEFT JOIN c1 USING (a), vv)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_pairs,
       CAST(SUM(lp) AS BIGINT) AS logprob_x1e9,
       CAST(SUM(lp) // COUNT(*) AS BIGINT) AS avg_logprob_x1e9
FROM sc GROUP BY doc_id""",
        "lm_stream_scores": """SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS INTEGER) AS n_pairs, CAST(NULL AS BIGINT) AS logprob_x1e9,
       CAST(NULL AS BIGINT) AS avg_logprob_x1e9
WHERE FALSE""",
        # LM model maintenance parity gates: append/remove must equal the
        # scratch retrain table-for-table (counts associative) — symdiff,
        # empty relation
        "lm_model_append_parity": """SELECT CAST(NULL AS VARCHAR) AS kind,
       CAST(NULL AS VARCHAR) AS a, CAST(NULL AS VARCHAR) AS b,
       CAST(NULL AS BIGINT) AS c WHERE FALSE""",
        "lm_model_remove_parity": """SELECT CAST(NULL AS VARCHAR) AS kind,
       CAST(NULL AS VARCHAR) AS a, CAST(NULL AS VARCHAR) AS b,
       CAST(NULL AS BIGINT) AS c WHERE FALSE""",
        # the composed pipeline: the four stage twins in one WITH — dedup +
        # decontamination keepers, LM trained on the CLEAN corpus, per-doc
        # fixed-point scores, bottom-decile cut per source, final report
        "pipeline_curated_report": f"""WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, source FROM documents),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM d GROUP BY text),
{DECON_BG_CTE}, {DECON_CG_CTE}, cont AS (
  SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (g) WHERE cg.doc_id <> bg.bench_id),
clean AS (
  SELECT d.doc_id, d.source,
         list_filter(string_split(d.text, ' '), x -> x != '') AS ws
  FROM d JOIN keepers USING (doc_id)
  WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
pr AS (
  SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, CAST(len(ws) - 1 AS BIGINT))) AS i
        FROM clean WHERE len(ws) >= 2)),
c2 AS (SELECT a, b, COUNT(*) AS c FROM pr GROUP BY a, b),
c1 AS (SELECT a, SUM(c) AS c1 FROM c2 GROUP BY a),
vv AS (SELECT COUNT(DISTINCT w) AS v
       FROM (SELECT unnest(ws) AS w FROM clean)),
sc AS (
  SELECT pr.doc_id,
         CAST(floor(ln((c2.c + 0.5e0) / (c1.c1 + 0.5e0 * vv.v))
                    * 1e9 + 0.5e0) AS BIGINT) AS lp
  FROM pr JOIN c2 USING (a, b) JOIN c1 USING (a), vv),
scores AS (
  SELECT sc.doc_id, c.source, COUNT(*) AS n_pairs, SUM(lp) AS s,
         SUM(lp) // COUNT(*) AS avg_lp
  FROM sc JOIN clean c USING (doc_id) GROUP BY sc.doc_id, c.source),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY avg_lp ASC, doc_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM scores)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
       CAST(SUM(s) AS BIGINT) AS logprob_x1e9
FROM r WHERE rk > (n * 1) // 10
GROUP BY source""",
        "pipeline_clean_tokens": f"""WITH {_LACED_CTE},
red AS (SELECT doc_id, source, {_pii_chain_sql()[0]} AS clean_text,
               {_pii_chain_sql()[1]}
        FROM laced)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(replace(clean_text, ' ', ''))) AS BIGINT)
           AS total_token_chars,
       CAST(SUM(n_url + n_email + n_ipv4 + n_phone) AS BIGINT) AS n_pii
FROM red GROUP BY source""",
        "event_transitions": """WITH o AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) AS to_type
  FROM events)
SELECT event_type AS from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
FROM o WHERE to_type IS NOT NULL
GROUP BY from_type, to_type""",
        "top_event_paths": f"""WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
), p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {PATH_PREFIX} GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path ORDER BY n_users DESC, path ASC LIMIT {PATH_K}""",
        "cohort_retention": """WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events),
f AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day - cohort_day AS INTEGER) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM act JOIN f USING (user_id)
GROUP BY 1, 2""",
        "value_histogram": f"""WITH s AS (
  SELECT event_type, CAST(round(value * {HIST_SCALE}) AS HUGEINT) AS x
  FROM events),
lo(v) AS (VALUES ({int(HIST_LO * HIST_SCALE)})),
w(v) AS (VALUES ({(int(HIST_HI * HIST_SCALE) - int(HIST_LO * HIST_SCALE)) // HIST_BINS}))
SELECT event_type,
       CAST((x - lo.v) // w.v AS INTEGER) AS bin,
       CAST(lo.v + ((x - lo.v) // w.v) * w.v AS BIGINT) AS bin_lo_scaled,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s, lo, w
WHERE x >= lo.v AND x < {int(HIST_HI * HIST_SCALE)}
GROUP BY event_type, bin, bin_lo_scaled""",
        "value_outliers": f"""WITH s AS (
  SELECT event_id, event_type, value,
         CAST(round(value * {HIST_SCALE}) AS HUGEINT) AS x
  FROM events),
m AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sm, SUM(x * x) AS q
      FROM s GROUP BY event_type)
SELECT s.event_id, s.event_type, s.value,
       CAST(m.n AS BIGINT) AS group_n,
       CAST(m.sm AS VARCHAR) AS group_sum_scaled,
       CAST(m.q AS VARCHAR) AS group_sumsq_scaled
FROM s JOIN m USING (event_type)
WHERE (m.n * s.x - m.sm) * (m.n * s.x - m.sm)
      > {OUTLIER_K * OUTLIER_K} * (m.n * m.q - m.sm * m.sm)""",
        "chunk_chars": f"""WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  WHERE length(text) > 0),
s AS (SELECT doc_id, text,
             unnest(generate_series(0, greatest(length(text) - 1, 0),
                                    {CHUNK_SIZE - CHUNK_OVERLAP})) AS st
      FROM d)
SELECT doc_id,
       CAST(st // {CHUNK_SIZE - CHUNK_OVERLAP} AS INTEGER) AS chunk_idx,
       CAST(st AS INTEGER) AS char_start,
       substr(text, st + 1, {CHUNK_SIZE}) AS chunk
FROM s""",
        "chunk_words": f"""WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS ws
  FROM documents),
w AS (SELECT doc_id, ws FROM d WHERE len(ws) > 0),
s AS (SELECT doc_id, ws,
             unnest(generate_series(0, greatest(len(ws) - 1, 0),
                                    {WCHUNK_SIZE - WCHUNK_OVERLAP})) AS st
      FROM w)
SELECT doc_id,
       CAST(st // {WCHUNK_SIZE - WCHUNK_OVERLAP} AS INTEGER) AS chunk_idx,
       CAST(st AS INTEGER) AS word_start,
       array_to_string(ws[st + 1 : st + {WCHUNK_SIZE}], ' ') AS chunk,
       CAST(LEAST(len(ws) - st, {WCHUNK_SIZE}) AS INTEGER) AS n_words
FROM s""",
        "bpe_roundtrip_parity": """SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS VARCHAR) AS decoded, CAST(NULL AS VARCHAR) AS expected
WHERE FALSE""",
        "bpe_char_conservation": """SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(replace(text, ' ', ''))) AS BIGINT)
           AS total_token_chars
FROM documents GROUP BY source""",
        "pii_redact_stream": """SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS VARCHAR) AS clean_text, CAST(NULL AS INTEGER) AS n_url,
       CAST(NULL AS INTEGER) AS n_email, CAST(NULL AS INTEGER) AS n_ipv4,
       CAST(NULL AS INTEGER) AS n_phone
WHERE FALSE""",
        "pii_redact": f"""WITH {_LACED_CTE}
SELECT doc_id, {_pii_chain_sql()[0]} AS clean_text, {_pii_chain_sql()[1]}
FROM laced""",
        "pii_totals": f"""WITH {_LACED_CTE},
per AS (SELECT source, {_pii_chain_sql()[1]} FROM laced)
SELECT source,
       CAST(SUM(n_url) AS BIGINT) AS n_url,
       CAST(SUM(n_email) AS BIGINT) AS n_email,
       CAST(SUM(n_ipv4) AS BIGINT) AS n_ipv4,
       CAST(SUM(n_phone) AS BIGINT) AS n_phone,
       CAST(SUM(CASE WHEN n_url + n_email + n_ipv4 + n_phone > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
FROM per GROUP BY source""",
        "tfidf_top_terms": f"""WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS ws
  FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf
       FROM (SELECT doc_id, unnest(ws) AS term FROM docs) GROUP BY doc_id, term),
dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
SELECT doc_id, term, tf, df, (tf * 1000000) // df AS score_x1e6
FROM (SELECT t.doc_id, t.term, t.tf, d.df,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
               ORDER BY (t.tf * 1000000) // d.df DESC, t.term ASC) AS rn
      FROM tf t JOIN dfx d USING (term))
WHERE rn <= {TFIDF_K}""",
        "skipgram_cooccurrence": f"""WITH docs AS (
  SELECT list_filter(string_split(text, ' '), x -> x != '') AS ws FROM documents),
pos AS (
  SELECT ws, len(ws) AS n, unnest(generate_series(1, CAST(len(ws) AS BIGINT))) AS i
  FROM docs WHERE len(ws) >= 2),
pr AS (
  SELECT ws[i] AS center, ws[j] AS context
  FROM (SELECT ws, i,
               unnest(generate_series(GREATEST(1, i - {SKIPGRAM_W}),
                                      LEAST(n, i + {SKIPGRAM_W}))) AS j
        FROM pos)
  WHERE j != i)
SELECT center, context, COUNT(*) AS cnt
FROM pr GROUP BY center, context HAVING COUNT(*) >= {SKIPGRAM_MIN}
ORDER BY cnt DESC, center ASC, context ASC LIMIT {SKIPGRAM_K}""",
        "text_quality": f"""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
  CAST(length(text) AS INT) AS n_chars,
  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
  CAST(((length(text) - len(string_split(text, ' ')) + 1) * 10000) // len(string_split(text, ' ')) AS BIGINT) AS avg_word_len_x1e4,
  CAST((({stop_occ}) * 10000) // len(string_split(text, ' ')) AS BIGINT) AS stopword_ratio_x1e4
FROM documents""",
        "char_diversity": """WITH hist AS (
  SELECT d.doc_id, u.c, COUNT(*) AS cnt
  FROM documents d, unnest(string_split(d.text, '')) AS u(c)
  GROUP BY d.doc_id, u.c
)
SELECT doc_id,
  CAST(SUM(cnt) AS BIGINT) AS n_chars,
  CAST(COUNT(*) AS BIGINT) AS distinct_chars,
  CAST(MAX(cnt) AS BIGINT) AS top_char_count,
  CAST(SUM(cnt * cnt) * 1000000000 // (SUM(cnt) * SUM(cnt)) AS BIGINT) AS collision_x1e9
FROM hist GROUP BY doc_id""",
        "low_diversity_by_source": f"""WITH hist AS (
  SELECT d.doc_id, u.c, COUNT(*) AS cnt
  FROM documents d, unnest(string_split(d.text, '')) AS u(c)
  GROUP BY d.doc_id, u.c
), per_doc AS (
  SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS dc,
         SUM(cnt * cnt) * 1000000000 // (SUM(cnt) * SUM(cnt)) AS coll
  FROM hist GROUP BY doc_id
)
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN p.coll >= {CHAR_COLLISION_THRESH}
                  OR p.dc < {CHAR_MIN_DISTINCT} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_flagged,
  CAST(MAX(p.coll) AS BIGINT) AS max_collision_x1e9,
  CAST(MIN(p.dc) AS BIGINT) AS min_distinct_chars,
  CAST(SUM(p.n) AS BIGINT) AS n_chars
FROM per_doc p JOIN documents d USING (doc_id) GROUP BY d.source""",
        "lang_id_counts": f"""WITH scored AS (
  SELECT {score_cols} FROM documents
), tagged AS (
  SELECT CASE WHEN g = 0 THEN 'unknown' ELSE (CASE {first_max} END) END AS guess
  FROM (SELECT *, {greatest} AS g FROM scored)
)
SELECT guess, COUNT(*) AS cnt FROM tagged GROUP BY 1""",
        "token_count": f"""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
  CAST(len(string_split(text, ' ')) + {punct_occ} AS INT) AS n_bpe
FROM documents""",
        "bpe_token_count": f"""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
  CAST(length(regexp_extract_all(text, $${T.BPE_SPLIT_PATTERN}$$)) AS INT) AS n_pieces
FROM documents""",
        "positional_fingerprint": f"""WITH RECURSIVE pw(j, v) AS (
  SELECT 0, CAST(1 AS BIGINT)
  UNION ALL
  SELECT j + 1, (v * {BASE}) % {MOD} FROM pw WHERE j < (SELECT MAX(length(text)) FROM documents)
)
SELECT doc_id,
       CAST(SUM(ascii(substr(text, CAST(i AS INT), 1)) * pw.v) % {MOD} AS BIGINT) AS fp
FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
             unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS i
      FROM documents)
JOIN pw ON pw.j = length(text) - i
GROUP BY 1""",
        "orders_lineitem_join": """SELECT o.o_orderpriority, l.l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       MIN(l.l_shipdate) AS first_ship, MAX(l.l_shipdate) AS last_ship
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2""",
        "bloom_semi_lineitem": """SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS BIGINT) AS quantity
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')""",
        "join_size_estimate": """SELECT
       (SELECT COUNT(*) FROM orders o JOIN lineitem l
        ON o.o_orderkey = l.l_orderkey) AS est_join_size,
       (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NOT NULL) AS n_left,
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL) AS n_right""",
        "custkey_skew_f2": """SELECT CAST(SUM(c * c) AS BIGINT) AS f2,
       CAST(SUM(c) AS BIGINT) AS n_rows
FROM (SELECT COUNT(*) AS c FROM orders
      WHERE o_custkey IS NOT NULL GROUP BY o_custkey)""",
        "custkey_overlap": f"""WITH {_key_hash_ctes(29, 'uh',
            f"{_URGENT_KEYS_SQL} UNION {_CUST_KEYS_SQL}")},
bk AS (SELECT key FROM uh ORDER BY _h LIMIT {OVERLAP_K}),
ak AS ({_URGENT_KEYS_SQL}), ck AS ({_CUST_KEYS_SQL}),
m AS (SELECT COUNT(*) AS n_sample,
             CAST(SUM(CASE WHEN bk.key IN (SELECT key FROM ak)
                            AND bk.key IN (SELECT key FROM ck)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_match
      FROM bk)
SELECT n_sample, n_match,
       CAST(n_match AS DOUBLE) / n_sample AS est_jaccard FROM m""",
        "custkey_setops": f"""WITH ak AS ({_URGENT_KEYS_SQL}),
ck AS ({_CUST_KEYS_SQL})
SELECT CAST((SELECT COUNT(*) FROM ak) AS BIGINT) AS n_a,
       CAST((SELECT COUNT(*) FROM ck) AS BIGINT) AS n_b,
       CAST((SELECT COUNT(*) FROM (SELECT key FROM ak UNION
                                   SELECT key FROM ck)) AS BIGINT) AS n_union,
       CAST((SELECT COUNT(*) FROM (SELECT key FROM ak INTERSECT
                                   SELECT key FROM ck)) AS BIGINT) AS n_intersect""",
        # snapshot diff: both engines derive the same 'new' snapshot from
        # documents; statuses via NULL-safe comparison, unchanged excluded
        "corpus_snapshot_diff": """WITH oldd AS (
  SELECT doc_id, text, lang, source FROM documents),
newd AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 5 THEN text || ' v2' ELSE text END AS text,
         lang, source
  FROM documents WHERE doc_id % 7 <> 3
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, 'new ' || text AS text, lang, source
  FROM documents WHERE doc_id % 13 = 1)
SELECT doc_id, status FROM (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text IS NOT DISTINCT FROM n.text
               AND o.lang IS NOT DISTINCT FROM n.lang
               AND o.source IS NOT DISTINCT FROM n.source THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id)
WHERE status <> 'unchanged'""",
        # edit-distance self-join: blocking must equal brute force exactly
        "customer_fuzzy_name_pairs": """WITH v AS (
  SELECT DISTINCT c_name AS w FROM customer WHERE c_name IS NOT NULL)
SELECT a.w AS name_a, b.w AS name_b,
       CAST(levenshtein(a.w, b.w) AS INTEGER) AS dist
FROM v a JOIN v b
  ON a.w < b.w
 AND abs(length(a.w) - length(b.w)) <= 1
 AND levenshtein(a.w, b.w) <= 1""",
        "order_window_overlaps": """WITH a AS (
  SELECT o_orderkey AS a_orderkey, o_orderdate AS a_s,
         o_orderdate + INTERVAL 7 DAY AS a_e
  FROM orders WHERE o_orderkey % 997 = 0),
b AS (
  SELECT o_orderkey AS b_orderkey, o_orderdate AS b_s,
         o_orderdate + INTERVAL 5 DAY AS b_e
  FROM orders WHERE o_orderkey % 991 = 0)
SELECT a_orderkey, b_orderkey
FROM a JOIN b ON a.a_s <= b.b_e AND b.b_s <= a.a_e""",
        "shipments_in_order_window": """WITH iv AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey % 997 = 0)
SELECT iv.o_orderkey, COUNT(*) AS n_shipments
FROM iv JOIN lineitem l
  ON l.l_shipdate >= iv.o_orderdate
 AND l.l_shipdate <= iv.o_orderdate + INTERVAL 7 DAY
GROUP BY iv.o_orderkey""",
        "event_type_heavy": """WITH tot AS (
  SELECT COUNT(*) AS n FROM events WHERE event_type IS NOT NULL)
SELECT event_type, COUNT(*) AS n_rows
FROM events, tot
WHERE event_type IS NOT NULL
GROUP BY event_type, tot.n
HAVING COUNT(*) * 5 >= tot.n
ORDER BY event_type""",
        "bloom_anti_lineitem": """SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1""",
        "event_sessions": _SESSIONS_ORACLE,
        "events_asof_purchase": _ASOF_ORACLE,
        "events_hourly": """SELECT event_type, date_trunc('hour', ts) AS hour,
       COUNT(*) AS n, MIN(value) AS vmin, MAX(value) AS vmax
FROM events GROUP BY 1, 2""",
        # the streaming twin lands on the same closed form: tumbling 1-hour
        # event-time windows are epoch-aligned => window_start = hour trunc
        "events_dedup_stream": """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type""",
        "events_hourly_stream": """SELECT event_type, date_trunc('hour', ts) AS hour,
       COUNT(*) AS n, MIN(value) AS vmin, MAX(value) AS vmax
FROM events GROUP BY 1, 2""",
        "streaming_state_by_source": """SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_tokens
FROM documents GROUP BY 1""",
        "winnowing_fingerprints": _winnowing_oracle(8, 4),
        "winnowing_pairs": f"""WITH fps AS ({_winnowing_oracle(8, 4)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 4""",
        # sampler oracles: the priority hash is re-implemented bit-exactly in
        # SQL (_splitmix_ctes) — bottom-k = the k distinct tokens with the
        # smallest priority; HOPS = the min-priority token of each of the 2^b
        # buckets (bucket = top b bits, priority = low 64-b bits)
        "stratified_sample_docs": _stratified_oracle(),
        "short_doc_pruned": """WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         CAST(length(text) AS INTEGER) AS n_chars
  FROM documents),
r AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM d)
SELECT doc_id, source, n_chars FROM r WHERE rk > (n * 1) // 10""",
        "dataset_splits": _splits_oracle(),
        "leakage_safe_splits": _leakage_splits_oracle(),
        "docs_topn_hash": _topn_oracle(),
        "weighted_sample_docs": _weighted_sample_oracle(),
        "mixture_manifest_docs": _mixture_oracle(),
        "epoch_shard_stats": _epoch_shards_oracle(),
        "packed_sequences": f"""WITH {CORPUS_CTE},
off AS (
  SELECT doc_id, tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus),
sh AS (SELECT doc_id, tokens, n_tok,
         CAST(o // {SHARD_BUDGET} AS BIGINT) AS shard_id,
         o - MIN(o) OVER (PARTITION BY CAST(o // {SHARD_BUDGET} AS BIGINT))
           AS start
       FROM off)
SELECT shard_id,
       array_to_string(list(doc_id ORDER BY doc_id), '|') AS doc_ids,
       array_to_string(list(start ORDER BY doc_id), '|') AS doc_starts,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       array_to_string(flatten(list(tokens ORDER BY doc_id)), '|')
         AS token_stream
FROM sh GROUP BY shard_id""",
    }


__all__ = [k for k in list(globals()) if not k.startswith('__')]
