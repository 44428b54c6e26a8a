"""DuckDB oracle SQL, part 2 of 2 + the post-dict tail (aliases,
derived entries) — moved verbatim."""
from __future__ import annotations

from .core import *  # noqa: F401,F403


def _oracles_b() -> dict[str, str]:
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
        "doc_top_ngram_repetition": f"""WITH {_rep_occ_cte(REP_TOP_N)},
c AS (SELECT doc_id, n_chars, gram, COUNT(*) AS n_occ
      FROM occ GROUP BY doc_id, n_chars, gram),
r AS (SELECT doc_id, gram, n_occ,
        ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY n_occ DESC, gram ASC) AS rn,
        CAST((n_occ * length(gram) * 1000000) // n_chars AS BIGINT)
          AS frac_x1e6
      FROM c)
SELECT doc_id, gram, CAST(n_occ AS BIGINT) AS n_occ, frac_x1e6
FROM r WHERE rn = 1""",
        "doc_dup_ngram_coverage": f"""WITH {_rep_occ_cte(REP_DUP_N)},
d AS (SELECT doc_id, n_chars, s, s + length(gram) AS e,
        COUNT(*) OVER (PARTITION BY doc_id, gram) AS c FROM occ),
m AS (SELECT doc_id, n_chars, s, e,
        MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM d WHERE c >= 2),
isl AS (SELECT doc_id, n_chars, s, e,
        SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY s, e
                ROWS UNBOUNDED PRECEDING) AS island
        FROM m),
g AS (SELECT doc_id, n_chars, island, MIN(s) AS smin, MAX(e) AS emax
      FROM isl GROUP BY doc_id, n_chars, island)
SELECT doc_id, n_chars, CAST(SUM(emax - smin) AS BIGINT) AS covered_chars,
       CAST((SUM(emax - smin) * 1000000) // n_chars AS BIGINT) AS frac_x1e6
FROM g GROUP BY doc_id, n_chars""",
        "corpus_quality_report": f"""WITH base AS (
  SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST((({stop_occ}) * 10000) // len(string_split(text, ' '))
              AS BIGINT) AS stop_ratio
  FROM documents),
scored AS (SELECT doc_id, {score_cols} FROM documents),
tagged AS (
  SELECT doc_id,
         CASE WHEN g = 0 THEN 'unknown' ELSE (CASE {first_max} END) END AS guess
  FROM (SELECT *, {greatest} AS g FROM scored)),
{_rep_occ_cte(REP_TOP_N, 'r')},
rc AS (SELECT doc_id, n_chars, gram, COUNT(*) AS n_occ
       FROM rocc GROUP BY doc_id, n_chars, gram),
rtop AS (SELECT doc_id, f FROM (
  SELECT doc_id, (n_occ * length(gram) * 1000000) // n_chars AS f,
         ROW_NUMBER() OVER (PARTITION BY doc_id
           ORDER BY n_occ DESC, gram ASC) AS rn
  FROM rc) WHERE rn = 1),
{_rep_occ_cte(REP_DUP_N, 'd')},
dcov AS (SELECT DISTINCT doc_id FROM (
  SELECT doc_id FROM docc GROUP BY doc_id, gram HAVING COUNT(*) >= 2))
SELECT b.source, COUNT(*) AS n_docs,
       CAST(SUM(b.n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(b.n_words) AS BIGINT) AS n_words,
       CAST(SUM(b.stop_ratio) // COUNT(*) AS BIGINT) AS stop_ratio_x1e4_mean,
       CAST(SUM(CASE WHEN t.guess = 'unknown' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lang_unknown,
       CAST(SUM(CASE WHEN r.f >= {REP_FRAC_THRESH} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_repetitive,
       CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_covered
FROM base b JOIN tagged t USING (doc_id)
LEFT JOIN rtop r USING (doc_id) LEFT JOIN dcov d USING (doc_id)
GROUP BY b.source""",
        "bottomk_tokens": f"""WITH {CORPUS_CTE}, {POS_CTE},
{_splitmix_ctes(CFG.seed)}
SELECT CAST(tok AS BIGINT) AS token
FROM (SELECT tok FROM sm3 ORDER BY _h LIMIT {BOTTOMK_K})""",
        "hops_representatives": f"""WITH {CORPUS_CTE}, {POS_CTE},
{_splitmix_ctes(CFG.seed)},
bk AS (SELECT tok, _h // {1 << 58} AS bucket, _h % {1 << 58} AS prio FROM sm3)
SELECT CAST(tok AS BIGINT) AS token
FROM (SELECT tok, row_number() OVER (PARTITION BY bucket ORDER BY prio) AS rn FROM bk)
WHERE rn = 1""",
        # range distinct-sample: the BottomK index answers with a VALUE —
        # the k distinct tokens of the range slice with the smallest
        # hash64(token, seed+17) priorities, re-derived here with the same
        # bit-exact splitmix64 SQL as bottomk_tokens
        "range_distinct_sample": f"""WITH {CORPUS_CTE}, {POS_CTE},
{_splitmix_ctes(CFG.seed + 17)},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)}),
st AS (
  SELECT DISTINCT doc_id, a, b, CAST(tokens[i] AS BIGINT) AS tok
  FROM pos JOIN rq ON i - 1 >= a * {CFG.leaf_span} AND i - 1 < b * {CFG.leaf_span}
),
rk AS (
  SELECT doc_id, a, b, tok,
         row_number() OVER (PARTITION BY doc_id, a, b ORDER BY _h, tok) AS rn
  FROM st JOIN sm3 USING (tok)
)
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(tok AS BIGINT) AS token
FROM rk WHERE rn <= {BK_K}""",
        "global_range_distinct_sample": f"""WITH {CORPUS_CTE}, {POS_CTE},
{_splitmix_ctes(CFG.seed + 17)},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, CAST(tokens[i] AS BIGINT) AS tok
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)}),
st AS (
  SELECT DISTINCT a, b, tok
  FROM flat JOIN rq ON g >= a * {CFG.leaf_span} AND g < b * {CFG.leaf_span}
),
rk AS (
  SELECT a, b, tok,
         row_number() OVER (PARTITION BY a, b ORDER BY _h, tok) AS rn
  FROM st JOIN sm3 USING (tok)
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(tok AS BIGINT) AS token
FROM rk WHERE rn <= {BK_K}""",
        # the incrementally-appended global index is byte-equal to a scratch
        # build, so its geometry is the closed form over the WHOLE stream:
        # every global window holds at least one token key (ngram=1)
        "incremental_append_geometry": f"""WITH {CORPUS_CTE},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
lv(level, span) AS (VALUES {", ".join(f"({L}, {CFG.span(L)})" for L in CFG.levels)})
SELECT CAST(lv.level AS INT) AS level,
       CAST((n + span - 1) // span AS BIGINT) AS n_windows
FROM tot, lv""",
        # expire keeps w_id >= horizon >> (deepest - level); per level the
        # survivor count is the closed form total_windows - horizon_L
        # (horizon_L = leaf horizon // (span/leaf_span))
        "expire_geometry": f"""WITH {CORPUS_CTE},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
lv(level, span) AS (VALUES {", ".join(f"({L}, {CFG.span(L)})" for L in CFG.levels)})
SELECT CAST(lv.level AS INT) AS level,
       CAST((n + span - 1) // span
            - ((n // 2) // {CFG.leaf_span}) // (span // {CFG.leaf_span}) AS BIGINT) AS n_windows
FROM tot, lv""",
        # exact brute-force cosine top-k IS SQL-expressible: both engines
        # compute the dot product in float64 and round to 6 dp, so the
        # only cross-engine risk is a true tie at rank k — broken on vec_id
        # identically on both sides
        "ann_cosine_topk": """WITH q AS (
  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 10
),
s AS (
  SELECT q.qid AS query_id, e.vec_id,
         list_cosine_similarity(q.qv, list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.qid
),
r AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rk
  FROM s
)
SELECT query_id, vec_id, round(sim, 6) AS score, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 5""",
        # SemDeDup twins: exact brute-force cosine pair graph. The >= cut
        # decides identically in both engines — every fixture pair clears
        # the threshold by >= 7e-4 (tests/test_semantic_dedup.py guards)
        "semantic_dedup_exact": f"""WITH {_SEM_PAIRS_CTE}
SELECT id_a, id_b, round(c, 6) AS cosine FROM p""",
        "semantic_dedup_containment": f"""WITH {_SEM_PAIRS_CTE}
SELECT id_a, id_b FROM p""",
        # incremental SemDeDup: exact batch x corpus cross pairs (the
        # persisted exhaustive index makes the Spark probe provably
        # complete); the stream twin is a symmetric difference vs the
        # one-shot batch check (empty relation)
        "semantic_incremental_exact": f"""WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (SELECT * FROM e WHERE vec_id % 7 = 0),
o AS (SELECT * FROM e WHERE vec_id % 7 <> 0)
SELECT n.vec_id AS new_id, o.vec_id AS corpus_id,
       round(list_cosine_similarity(n.v, o.v), 6) AS cosine
FROM n, o
WHERE list_cosine_similarity(n.v, o.v) >= {SEMDEDUP_INC_T}""",
        "semantic_incremental_stream": """SELECT CAST(NULL AS BIGINT) AS new_id,
       CAST(NULL AS BIGINT) AS corpus_id, CAST(NULL AS DOUBLE) AS cosine
WHERE FALSE""",
        "semantic_dedup_canonical": f"""WITH RECURSIVE {_SEM_PAIRS_CTE},
e2 AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
reach(u, v) AS (
  SELECT u, v FROM e2
  UNION
  SELECT r.u, e2.v FROM reach r JOIN e2 ON r.v = e2.u
),
cc AS (SELECT u AS vec_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM cc WHERE vec_id <> cluster_id)""",
        "ann_cosine_topk_filtered": f"""WITH q AS (
  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 10
),
s AS (
  SELECT q.qid AS query_id, e.vec_id,
         list_cosine_similarity(q.qv, list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
  FROM q, embeddings e
  WHERE e.vec_id <> q.qid AND e.label = {ANN_FILTER_LABEL}
),
r AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rk
  FROM s
)
SELECT query_id, vec_id, round(sim, 6) AS score, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 5""",
        # parity gate: persisted-vs-in-memory IVF symmetric difference is
        # EMPTY by contract — the twin is the typed empty relation
        "ivfpq_persisted_parity": """SELECT CAST(NULL AS BIGINT) AS query_id,
       CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS DOUBLE) AS score,
       CAST(NULL AS INTEGER) AS rank
WHERE FALSE""",
        "ivfpq_exhaustive_parity": """SELECT CAST(NULL AS BIGINT) AS query_id,
       CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS DOUBLE) AS score,
       CAST(NULL AS INTEGER) AS rank
WHERE FALSE""",
        "ivf_persisted_parity": """SELECT CAST(NULL AS BIGINT) AS query_id,
       CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS DOUBLE) AS score,
       CAST(NULL AS INTEGER) AS rank
WHERE FALSE""",
        # takedown parity gates: post-takedown artifact == scratch on the
        # remaining corpus, symmetric difference EMPTY by contract
        "doc_index_takedown_parity": """SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS INTEGER) AS level, CAST(NULL AS BIGINT) AS w_id,
       CAST(NULL AS BIGINT) AS bloom_h, CAST(NULL AS BIGINT) AS n_items,
       CAST(NULL AS BIGINT) AS bits_set
WHERE FALSE""",
        "minhash_takedown_parity": """SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS VARCHAR) AS sig_key
WHERE FALSE""",
        "ivf_takedown_parity": """SELECT CAST(NULL AS BIGINT) AS vec_id,
       CAST(NULL AS BIGINT) AS list_id, CAST(NULL AS VARCHAR) AS vec_key
WHERE FALSE""",
        "hll_rollup_geometry": f"""WITH {CORPUS_CTE},
lv(level, span) AS (VALUES {", ".join(f"({L}, {CFG.span(L)})" for L in CFG.levels)})
SELECT doc_id, CAST(lv.level AS INT) AS level,
       CAST(unnest(generate_series(0, CAST((n_tok + span - 1) // span - 1 AS BIGINT))) AS BIGINT) AS w_id
FROM corpus, lv WHERE n_tok > 0""",
        "cms_rollup_totals": f"""WITH {CORPUS_CTE},
lv(level, span) AS (VALUES {", ".join(f"({L}, {CFG.span(L)})" for L in CFG.levels)}),
w AS (
  SELECT doc_id, lv.level, span, n_tok,
         unnest(generate_series(0, CAST((n_tok + span - 1) // span - 1 AS BIGINT))) AS w_id
  FROM corpus, lv WHERE n_tok > 0)
SELECT doc_id, CAST(level AS INT) AS level, CAST(w_id AS BIGINT) AS w_id,
       CAST(LEAST(span, n_tok - w_id * span) AS BIGINT) AS n_window
FROM w""",
        "range_window_totals": f"""WITH {CORPUS_CTE},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)})
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) AS BIGINT) AS n_tokens
FROM corpus, rq
WHERE LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) > 0""",
        # exact rank (count of tokens <= v) per (doc, range)-with-tokens x
        # probe value — sparse-exact CMS cover nodes enumerate the range
        "range_rank": f"""WITH {CORPUS_CTE},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)}),
pv(v) AS (VALUES {", ".join(f"({t})" for t in PROBE_TOKENS)}),
sl AS (SELECT doc_id, a, b, tokens[a * {CFG.leaf_span} + 1 : LEAST(n_tok, b * {CFG.leaf_span})] AS s
       FROM corpus, rq
       WHERE LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) > 0)
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(v AS BIGINT) AS v,
       CAST(len(list_filter(s, x -> x <= v)) AS BIGINT) AS rank_le
FROM sl, pv""",
        # global twin: exact stream-slice ranks (zero-count rows kept)
        "global_range_rank": f"""WITH {CORPUS_CTE},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS token
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)}),
pv(v) AS (VALUES {", ".join(f"({t})" for t in PROBE_TOKENS)}),
nr AS (SELECT a, b FROM rq, tot
       WHERE LEAST(n, b * {CFG.leaf_span}) - LEAST(n, a * {CFG.leaf_span}) > 0),
cnt AS (
  SELECT nr.a, nr.b, pv.v, COUNT(*) AS c
  FROM flat f, nr, pv
  WHERE f.g >= nr.a * {CFG.leaf_span} AND f.g < nr.b * {CFG.leaf_span}
    AND f.token <= pv.v
  GROUP BY nr.a, nr.b, pv.v
)
SELECT CAST(nr.a AS BIGINT) AS a, CAST(nr.b AS BIGINT) AS b,
       CAST(pv.v AS BIGINT) AS v, CAST(COALESCE(c, 0) AS BIGINT) AS rank_le
FROM nr CROSS JOIN pv
LEFT JOIN cnt ON cnt.a = nr.a AND cnt.b = nr.b AND cnt.v = pv.v""",
        # unbiased signed-freq: exact counts in the sparse regime — rows for
        # every (doc, range)-with-tokens x probe token, zeros included
        "range_signed_freq": f"""WITH {CORPUS_CTE},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)}),
pt(token) AS (VALUES {", ".join(f"({t})" for t in PROBE_TOKENS)}),
sl AS (SELECT doc_id, a, b, tokens[a * {CFG.leaf_span} + 1 : LEAST(n_tok, b * {CFG.leaf_span})] AS s
       FROM corpus, rq
       WHERE LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) > 0)
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(token AS BIGINT) AS token,
       CAST(len(list_filter(s, x -> x = token)) AS DOUBLE) AS est_count
FROM sl, pt""",
        # range F2 = sum over tokens of (count in slice)^2 — exact on this
        # corpus (every cover node sparse-exact; see q_range_f2)
        "range_f2": f"""WITH {CORPUS_CTE},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)}),
hits AS (
  SELECT doc_id, a, b, t, COUNT(*) AS cnt
  FROM (SELECT doc_id, a, b,
               unnest(tokens[a * {CFG.leaf_span} + 1 : LEAST(n_tok, b * {CFG.leaf_span})]) AS t
        FROM corpus, rq)
  GROUP BY doc_id, a, b, t)
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(SUM(cnt * cnt) AS DOUBLE) AS est_f2
FROM hits GROUP BY doc_id, a, b""",
        "global_range_f2": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)}),
hits AS (
  SELECT a, b, t, COUNT(*) AS cnt
  FROM flat, rq
  WHERE g >= a * {CFG.leaf_span} AND g < b * {CFG.leaf_span}
  GROUP BY a, b, t)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(SUM(cnt * cnt) AS DOUBLE) AS est_f2
FROM hits GROUP BY a, b""",
        # cross-range inner product = sum over common tokens of
        # cnt_A * cnt_B — exact on this corpus (every merged range node
        # sparse); a doc appears iff EITHER range overlaps it (the missing
        # side is the zero vector, est_ip 0)
        "range_inner_product": f"""WITH {CORPUS_CTE},
pq(a1, b1, a2, b2) AS (VALUES {", ".join(f"({a1}, {b1}, {a2}, {b2})" for (a1, b1), (a2, b2) in PAIR_QS)}),
present AS (
  SELECT doc_id, a1, b1, a2, b2, tokens, n_tok FROM corpus, pq
  WHERE n_tok > LEAST(a1, a2) * {CFG.leaf_span}),
ca AS (
  SELECT doc_id, a1, b1, a2, b2, t, COUNT(*) AS cnt
  FROM (SELECT doc_id, a1, b1, a2, b2,
               unnest(tokens[a1 * {CFG.leaf_span} + 1 : LEAST(n_tok, b1 * {CFG.leaf_span})]) AS t
        FROM present)
  GROUP BY doc_id, a1, b1, a2, b2, t),
cb AS (
  SELECT doc_id, a1, b1, a2, b2, t, COUNT(*) AS cnt
  FROM (SELECT doc_id, a1, b1, a2, b2,
               unnest(tokens[a2 * {CFG.leaf_span} + 1 : LEAST(n_tok, b2 * {CFG.leaf_span})]) AS t
        FROM present)
  GROUP BY doc_id, a1, b1, a2, b2, t),
ip AS (
  SELECT ca.doc_id, ca.a1, ca.b1, ca.a2, ca.b2, SUM(ca.cnt * cb.cnt) AS v
  FROM ca JOIN cb ON ca.doc_id = cb.doc_id AND ca.a1 = cb.a1 AND ca.b1 = cb.b1
                 AND ca.a2 = cb.a2 AND ca.b2 = cb.b2 AND ca.t = cb.t
  GROUP BY ca.doc_id, ca.a1, ca.b1, ca.a2, ca.b2)
SELECT p.doc_id, CAST(p.a1 AS BIGINT) AS a1, CAST(p.b1 AS BIGINT) AS b1,
       CAST(p.a2 AS BIGINT) AS a2, CAST(p.b2 AS BIGINT) AS b2,
       CAST(COALESCE(ip.v, 0) AS DOUBLE) AS est_ip
FROM present p
LEFT JOIN ip ON ip.doc_id = p.doc_id AND ip.a1 = p.a1 AND ip.b1 = p.b1
            AND ip.a2 = p.a2 AND ip.b2 = p.b2""",
        "global_range_inner_product": f"""WITH {CORPUS_CTE},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
pq(a1, b1, a2, b2) AS (VALUES {", ".join(f"({a1}, {b1}, {a2}, {b2})" for (a1, b1), (a2, b2) in PAIR_QS_GLOBAL)}),
present AS (SELECT a1, b1, a2, b2 FROM pq, tot WHERE n > LEAST(a1, a2) * {CFG.leaf_span}),
ca AS (
  SELECT a1, b1, a2, b2, t, COUNT(*) AS cnt
  FROM flat, pq
  WHERE g >= a1 * {CFG.leaf_span} AND g < b1 * {CFG.leaf_span}
  GROUP BY a1, b1, a2, b2, t),
cb AS (
  SELECT a1, b1, a2, b2, t, COUNT(*) AS cnt
  FROM flat, pq
  WHERE g >= a2 * {CFG.leaf_span} AND g < b2 * {CFG.leaf_span}
  GROUP BY a1, b1, a2, b2, t),
ip AS (
  SELECT ca.a1, ca.b1, ca.a2, ca.b2, SUM(ca.cnt * cb.cnt) AS v
  FROM ca JOIN cb ON ca.a1 = cb.a1 AND ca.b1 = cb.b1
                 AND ca.a2 = cb.a2 AND ca.b2 = cb.b2 AND ca.t = cb.t
  GROUP BY ca.a1, ca.b1, ca.a2, ca.b2)
SELECT CAST(p.a1 AS BIGINT) AS a1, CAST(p.b1 AS BIGINT) AS b1,
       CAST(p.a2 AS BIGINT) AS a2, CAST(p.b2 AS BIGINT) AS b2,
       CAST(COALESCE(ip.v, 0) AS DOUBLE) AS est_ip
FROM present p
LEFT JOIN ip ON ip.a1 = p.a1 AND ip.b1 = p.b1 AND ip.a2 = p.a2 AND ip.b2 = p.b2""",
        # KMV Jaccard: every output is a deterministic VALUE re-derived with
        # the bit-exact splitmix64 twin — sample(X) = k distinct slice tokens
        # with smallest priority, merged = k smallest over the union of the
        # two samples, n_match = merged entries present in both samples
        "range_jaccard": f"""WITH {CORPUS_CTE}, {POS_CTE},
{_splitmix_ctes(CFG.seed + 17)},
pq(a1, b1, a2, b2) AS (VALUES {", ".join(f"({a1}, {b1}, {a2}, {b2})" for (a1, b1), (a2, b2) in PAIR_QS)}),
present AS (
  SELECT doc_id, a1, b1, a2, b2 FROM corpus, pq
  WHERE n_tok > LEAST(a1, a2) * {CFG.leaf_span}),
sta AS (
  SELECT DISTINCT doc_id, a1, b1, a2, b2, CAST(tokens[i] AS BIGINT) AS tok
  FROM pos JOIN pq ON i - 1 >= a1 * {CFG.leaf_span} AND i - 1 < b1 * {CFG.leaf_span}),
stb AS (
  SELECT DISTINCT doc_id, a1, b1, a2, b2, CAST(tokens[i] AS BIGINT) AS tok
  FROM pos JOIN pq ON i - 1 >= a2 * {CFG.leaf_span} AND i - 1 < b2 * {CFG.leaf_span}),
sam_a AS (SELECT doc_id, a1, b1, a2, b2, tok FROM (
  SELECT sta.*, row_number() OVER (PARTITION BY doc_id, a1, b1, a2, b2 ORDER BY _h, tok) AS rn
  FROM sta JOIN sm3 USING (tok)) WHERE rn <= {BK_K}),
sam_b AS (SELECT doc_id, a1, b1, a2, b2, tok FROM (
  SELECT stb.*, row_number() OVER (PARTITION BY doc_id, a1, b1, a2, b2 ORDER BY _h, tok) AS rn
  FROM stb JOIN sm3 USING (tok)) WHERE rn <= {BK_K}),
un AS (SELECT * FROM sam_a UNION SELECT * FROM sam_b),
merged AS (SELECT doc_id, a1, b1, a2, b2, tok FROM (
  SELECT un.*, row_number() OVER (PARTITION BY doc_id, a1, b1, a2, b2 ORDER BY _h, tok) AS rn
  FROM un JOIN sm3 USING (tok)) WHERE rn <= {BK_K}),
ns AS (SELECT doc_id, a1, b1, a2, b2, COUNT(*) AS n_sample
       FROM merged GROUP BY doc_id, a1, b1, a2, b2),
nm AS (SELECT m.doc_id, m.a1, m.b1, m.a2, m.b2, COUNT(*) AS n_match
       FROM merged m
       JOIN sam_a x ON x.doc_id = m.doc_id AND x.a1 = m.a1 AND x.b1 = m.b1
                   AND x.a2 = m.a2 AND x.b2 = m.b2 AND x.tok = m.tok
       JOIN sam_b y ON y.doc_id = m.doc_id AND y.a1 = m.a1 AND y.b1 = m.b1
                   AND y.a2 = m.a2 AND y.b2 = m.b2 AND y.tok = m.tok
       GROUP BY m.doc_id, m.a1, m.b1, m.a2, m.b2)
SELECT p.doc_id, CAST(p.a1 AS BIGINT) AS a1, CAST(p.b1 AS BIGINT) AS b1,
       CAST(p.a2 AS BIGINT) AS a2, CAST(p.b2 AS BIGINT) AS b2,
       CAST(COALESCE(ns.n_sample, 0) AS BIGINT) AS n_sample,
       CAST(COALESCE(nm.n_match, 0) AS BIGINT) AS n_match,
       CASE WHEN COALESCE(ns.n_sample, 0) > 0
            THEN CAST(COALESCE(nm.n_match, 0) AS DOUBLE) / ns.n_sample
            ELSE 0.0 END AS est_jaccard
FROM present p
LEFT JOIN ns ON ns.doc_id = p.doc_id AND ns.a1 = p.a1 AND ns.b1 = p.b1
            AND ns.a2 = p.a2 AND ns.b2 = p.b2
LEFT JOIN nm ON nm.doc_id = p.doc_id AND nm.a1 = p.a1 AND nm.b1 = p.b1
            AND nm.a2 = p.a2 AND nm.b2 = p.b2""",
        # cross-range set algebra: distinct counts of A, B, A∪B, A∩B per
        # (doc, range pair) — exact on this corpus (every merged range HLL
        # node sparse); a doc appears iff EITHER range overlaps it (the
        # missing side is the empty set, est 0)
        "range_setops": f"""WITH {CORPUS_CTE},
pq(a1, b1, a2, b2) AS (VALUES {", ".join(f"({a1}, {b1}, {a2}, {b2})" for (a1, b1), (a2, b2) in PAIR_QS)}),
present AS (
  SELECT doc_id, a1, b1, a2, b2, tokens, n_tok FROM corpus, pq
  WHERE n_tok > LEAST(a1, a2) * {CFG.leaf_span}),
sta AS (
  SELECT DISTINCT doc_id, a1, b1, a2, b2, t
  FROM (SELECT doc_id, a1, b1, a2, b2,
               unnest(tokens[a1 * {CFG.leaf_span} + 1 : LEAST(n_tok, b1 * {CFG.leaf_span})]) AS t
        FROM present)),
stb AS (
  SELECT DISTINCT doc_id, a1, b1, a2, b2, t
  FROM (SELECT doc_id, a1, b1, a2, b2,
               unnest(tokens[a2 * {CFG.leaf_span} + 1 : LEAST(n_tok, b2 * {CFG.leaf_span})]) AS t
        FROM present)),
un AS (SELECT * FROM sta UNION SELECT * FROM stb),
na AS (SELECT doc_id, a1, b1, a2, b2, COUNT(*) AS n FROM sta GROUP BY doc_id, a1, b1, a2, b2),
nb AS (SELECT doc_id, a1, b1, a2, b2, COUNT(*) AS n FROM stb GROUP BY doc_id, a1, b1, a2, b2),
nu AS (SELECT doc_id, a1, b1, a2, b2, COUNT(*) AS n FROM un GROUP BY doc_id, a1, b1, a2, b2)
SELECT p.doc_id, CAST(p.a1 AS BIGINT) AS a1, CAST(p.b1 AS BIGINT) AS b1,
       CAST(p.a2 AS BIGINT) AS a2, CAST(p.b2 AS BIGINT) AS b2,
       CAST(COALESCE(na.n, 0) AS DOUBLE) AS est_a,
       CAST(COALESCE(nb.n, 0) AS DOUBLE) AS est_b,
       CAST(COALESCE(nu.n, 0) AS DOUBLE) AS est_union,
       CAST(COALESCE(na.n, 0) + COALESCE(nb.n, 0) - COALESCE(nu.n, 0) AS DOUBLE) AS est_intersect
FROM present p
LEFT JOIN na ON na.doc_id = p.doc_id AND na.a1 = p.a1 AND na.b1 = p.b1
            AND na.a2 = p.a2 AND na.b2 = p.b2
LEFT JOIN nb ON nb.doc_id = p.doc_id AND nb.a1 = p.a1 AND nb.b1 = p.b1
            AND nb.a2 = p.a2 AND nb.b2 = p.b2
LEFT JOIN nu ON nu.doc_id = p.doc_id AND nu.a1 = p.a1 AND nu.b1 = p.b1
            AND nu.a2 = p.a2 AND nu.b2 = p.b2""",
        "global_range_setops": f"""WITH {CORPUS_CTE},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, CAST(tokens[i] AS BIGINT) AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
pq(a1, b1, a2, b2) AS (VALUES {", ".join(f"({a1}, {b1}, {a2}, {b2})" for (a1, b1), (a2, b2) in PAIR_QS_GLOBAL)}),
present AS (SELECT a1, b1, a2, b2 FROM pq, tot WHERE n > LEAST(a1, a2) * {CFG.leaf_span}),
sta AS (SELECT DISTINCT a1, b1, a2, b2, t
        FROM flat JOIN pq ON g >= a1 * {CFG.leaf_span} AND g < b1 * {CFG.leaf_span}),
stb AS (SELECT DISTINCT a1, b1, a2, b2, t
        FROM flat JOIN pq ON g >= a2 * {CFG.leaf_span} AND g < b2 * {CFG.leaf_span}),
un AS (SELECT * FROM sta UNION SELECT * FROM stb),
na AS (SELECT a1, b1, a2, b2, COUNT(*) AS n FROM sta GROUP BY a1, b1, a2, b2),
nb AS (SELECT a1, b1, a2, b2, COUNT(*) AS n FROM stb GROUP BY a1, b1, a2, b2),
nu AS (SELECT a1, b1, a2, b2, COUNT(*) AS n FROM un GROUP BY a1, b1, a2, b2)
SELECT CAST(p.a1 AS BIGINT) AS a1, CAST(p.b1 AS BIGINT) AS b1,
       CAST(p.a2 AS BIGINT) AS a2, CAST(p.b2 AS BIGINT) AS b2,
       CAST(COALESCE(na.n, 0) AS DOUBLE) AS est_a,
       CAST(COALESCE(nb.n, 0) AS DOUBLE) AS est_b,
       CAST(COALESCE(nu.n, 0) AS DOUBLE) AS est_union,
       CAST(COALESCE(na.n, 0) + COALESCE(nb.n, 0) - COALESCE(nu.n, 0) AS DOUBLE) AS est_intersect
FROM present p
LEFT JOIN na ON na.a1 = p.a1 AND na.b1 = p.b1 AND na.a2 = p.a2 AND na.b2 = p.b2
LEFT JOIN nb ON nb.a1 = p.a1 AND nb.b1 = p.b1 AND nb.a2 = p.a2 AND nb.b2 = p.b2
LEFT JOIN nu ON nu.a1 = p.a1 AND nu.b1 = p.b1 AND nu.a2 = p.a2 AND nu.b2 = p.b2""",
        "global_range_jaccard": f"""WITH {CORPUS_CTE}, {POS_CTE},
{_splitmix_ctes(CFG.seed + 17)},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, CAST(tokens[i] AS BIGINT) AS tok
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
pq(a1, b1, a2, b2) AS (VALUES {", ".join(f"({a1}, {b1}, {a2}, {b2})" for (a1, b1), (a2, b2) in PAIR_QS_GLOBAL)}),
present AS (SELECT a1, b1, a2, b2 FROM pq, tot WHERE n > LEAST(a1, a2) * {CFG.leaf_span}),
sta AS (SELECT DISTINCT a1, b1, a2, b2, tok
        FROM flat JOIN pq ON g >= a1 * {CFG.leaf_span} AND g < b1 * {CFG.leaf_span}),
stb AS (SELECT DISTINCT a1, b1, a2, b2, tok
        FROM flat JOIN pq ON g >= a2 * {CFG.leaf_span} AND g < b2 * {CFG.leaf_span}),
sam_a AS (SELECT a1, b1, a2, b2, tok FROM (
  SELECT sta.*, row_number() OVER (PARTITION BY a1, b1, a2, b2 ORDER BY _h, tok) AS rn
  FROM sta JOIN sm3 USING (tok)) WHERE rn <= {BK_K}),
sam_b AS (SELECT a1, b1, a2, b2, tok FROM (
  SELECT stb.*, row_number() OVER (PARTITION BY a1, b1, a2, b2 ORDER BY _h, tok) AS rn
  FROM stb JOIN sm3 USING (tok)) WHERE rn <= {BK_K}),
un AS (SELECT * FROM sam_a UNION SELECT * FROM sam_b),
merged AS (SELECT a1, b1, a2, b2, tok FROM (
  SELECT un.*, row_number() OVER (PARTITION BY a1, b1, a2, b2 ORDER BY _h, tok) AS rn
  FROM un JOIN sm3 USING (tok)) WHERE rn <= {BK_K}),
ns AS (SELECT a1, b1, a2, b2, COUNT(*) AS n_sample FROM merged GROUP BY a1, b1, a2, b2),
nm AS (SELECT m.a1, m.b1, m.a2, m.b2, COUNT(*) AS n_match
       FROM merged m
       JOIN sam_a x ON x.a1 = m.a1 AND x.b1 = m.b1 AND x.a2 = m.a2 AND x.b2 = m.b2 AND x.tok = m.tok
       JOIN sam_b y ON y.a1 = m.a1 AND y.b1 = m.b1 AND y.a2 = m.a2 AND y.b2 = m.b2 AND y.tok = m.tok
       GROUP BY m.a1, m.b1, m.a2, m.b2)
SELECT CAST(p.a1 AS BIGINT) AS a1, CAST(p.b1 AS BIGINT) AS b1,
       CAST(p.a2 AS BIGINT) AS a2, CAST(p.b2 AS BIGINT) AS b2,
       CAST(COALESCE(ns.n_sample, 0) AS BIGINT) AS n_sample,
       CAST(COALESCE(nm.n_match, 0) AS BIGINT) AS n_match,
       CASE WHEN COALESCE(ns.n_sample, 0) > 0
            THEN CAST(COALESCE(nm.n_match, 0) AS DOUBLE) / ns.n_sample
            ELSE 0.0 END AS est_jaccard
FROM present p
LEFT JOIN ns ON ns.a1 = p.a1 AND ns.b1 = p.b1 AND ns.a2 = p.a2 AND ns.b2 = p.b2
LEFT JOIN nm ON nm.a1 = p.a1 AND nm.b1 = p.b1 AND nm.a2 = p.a2 AND nm.b2 = p.b2""",
        # certified-exact range quantiles: plain rank read over the sorted
        # range slice — rank = GREATEST(1, CEIL(q * n)), 1-based ascending;
        # the Spark side's bracket refusal guarantees the values coincide
        "range_exact_quantiles": f"""WITH {CORPUS_CTE},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)}),
qs(q) AS (VALUES {", ".join(f"(CAST({q} AS DOUBLE))" for q in QUANTILES)}),
sl AS (
  SELECT doc_id, a, b,
         tokens[a * {CFG.leaf_span} + 1 : LEAST(n_tok, b * {CFG.leaf_span})] AS rt,
         LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) AS nr
  FROM corpus, rq
  WHERE LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) > 0
),
ex AS (SELECT doc_id, a, b, nr, unnest(rt) AS token FROM sl),
rk AS (SELECT doc_id, a, b, nr, token,
       row_number() OVER (PARTITION BY doc_id, a, b ORDER BY token) AS rn FROM ex)
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, q,
       CAST(token AS BIGINT) AS q_value
FROM rk JOIN qs ON rn = GREATEST(1, CAST(CEIL(q * nr) AS BIGINT))""",
        "global_range_exact_quantiles": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, CAST(tokens[i] AS BIGINT) AS token
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)}),
qs(q) AS (VALUES {", ".join(f"(CAST({q} AS DOUBLE))" for q in QUANTILES)}),
ex AS (SELECT rq.a, rq.b, f.token FROM flat f, rq
       WHERE f.g >= rq.a * {CFG.leaf_span} AND f.g < rq.b * {CFG.leaf_span}),
rk AS (SELECT a, b, token,
       row_number() OVER (PARTITION BY a, b ORDER BY token) AS rn,
       COUNT(*) OVER (PARTITION BY a, b) AS nr FROM ex)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, q,
       CAST(token AS BIGINT) AS q_value
FROM rk JOIN qs ON rn = GREATEST(1, CAST(CEIL(q * nr) AS BIGINT))""",
        # certified-exact trimmed sums: kept ranks floor(q_lo*n)+1..floor(q_hi*n);
        # equal values make within-run rank order irrelevant to the sum
        "range_trimmed_sum": f"""WITH {CORPUS_CTE},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)}),
sl AS (
  SELECT doc_id, a, b,
         tokens[a * {CFG.leaf_span} + 1 : LEAST(n_tok, b * {CFG.leaf_span})] AS rt
  FROM corpus, rq
  WHERE LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) > 0
),
ex AS (SELECT doc_id, a, b, unnest(rt) AS token FROM sl),
rk AS (SELECT doc_id, a, b, token,
       row_number() OVER (PARTITION BY doc_id, a, b ORDER BY token) AS rn,
       COUNT(*) OVER (PARTITION BY doc_id, a, b) AS nr FROM ex)
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(SUM(token) AS BIGINT) AS trimmed_sum,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM rk
WHERE rn >= CAST(FLOOR({TRIM_Q[0]} * nr) AS BIGINT) + 1
  AND rn <= CAST(FLOOR({TRIM_Q[1]} * nr) AS BIGINT)
GROUP BY doc_id, a, b""",
        "global_range_trimmed_sum": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, CAST(tokens[i] AS BIGINT) AS token
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)}),
ex AS (SELECT rq.a, rq.b, f.token FROM flat f, rq
       WHERE f.g >= rq.a * {CFG.leaf_span} AND f.g < rq.b * {CFG.leaf_span}),
rk AS (SELECT a, b, token,
       row_number() OVER (PARTITION BY a, b ORDER BY token) AS rn,
       COUNT(*) OVER (PARTITION BY a, b) AS nr FROM ex)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(SUM(token) AS BIGINT) AS trimmed_sum,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM rk
WHERE rn >= CAST(FLOOR({TRIM_Q[0]} * nr) AS BIGINT) + 1
  AND rn <= CAST(FLOOR({TRIM_Q[1]} * nr) AS BIGINT)
GROUP BY a, b""",
        "table_profile": """SELECT 'c_nationkey' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(c_nationkey) AS BIGINT) AS n_null,
       CAST(MIN(c_nationkey) AS BIGINT) AS min, CAST(MAX(c_nationkey) AS BIGINT) AS max,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_distinct,
       (SELECT CAST(c_nationkey AS BIGINT) FROM customer WHERE c_nationkey IS NOT NULL
        GROUP BY c_nationkey ORDER BY COUNT(*) DESC, c_nationkey ASC LIMIT 1) AS top_value,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_nationkey IS NOT NULL
        GROUP BY c_nationkey ORDER BY COUNT(*) DESC, c_nationkey ASC LIMIT 1) AS top_count,
       CAST(0 AS BIGINT) AS mg_resid
FROM customer
UNION ALL
SELECT 'p_size' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(p_size) AS BIGINT) AS n_null,
       CAST(MIN(p_size) AS BIGINT) AS min, CAST(MAX(p_size) AS BIGINT) AS max,
       CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_distinct,
       (SELECT CAST(p_size AS BIGINT) FROM part WHERE p_size IS NOT NULL
        GROUP BY p_size ORDER BY COUNT(*) DESC, p_size ASC LIMIT 1) AS top_value,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM part WHERE p_size IS NOT NULL
        GROUP BY p_size ORDER BY COUNT(*) DESC, p_size ASC LIMIT 1) AS top_count,
       CAST(0 AS BIGINT) AS mg_resid
FROM part
UNION ALL
SELECT 'l_linenumber' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(l_linenumber) AS BIGINT) AS n_null,
       CAST(MIN(l_linenumber) AS BIGINT) AS min, CAST(MAX(l_linenumber) AS BIGINT) AS max,
       CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_distinct,
       (SELECT CAST(l_linenumber AS BIGINT) FROM lineitem WHERE l_linenumber IS NOT NULL
        GROUP BY l_linenumber ORDER BY COUNT(*) DESC, l_linenumber ASC LIMIT 1) AS top_value,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_linenumber IS NOT NULL
        GROUP BY l_linenumber ORDER BY COUNT(*) DESC, l_linenumber ASC LIMIT 1) AS top_count,
       CAST(0 AS BIGINT) AS mg_resid
FROM lineitem
UNION ALL
SELECT 'l_quantity' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
       CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min, CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max,
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
       (SELECT CAST(CAST(l_quantity AS BIGINT) AS BIGINT) FROM lineitem WHERE l_quantity IS NOT NULL
        GROUP BY CAST(l_quantity AS BIGINT) ORDER BY COUNT(*) DESC, CAST(l_quantity AS BIGINT) ASC LIMIT 1) AS top_value,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_quantity IS NOT NULL
        GROUP BY CAST(l_quantity AS BIGINT) ORDER BY COUNT(*) DESC, CAST(l_quantity AS BIGINT) ASC LIMIT 1) AS top_count,
       CAST(0 AS BIGINT) AS mg_resid
FROM lineitem""",
        # profile maintenance parity: incremental/stream state == one-scan
        # profile, so the symmetric difference must be EMPTY
        "profile_incremental_parity": """SELECT CAST(NULL AS VARCHAR) AS col_name, CAST(NULL AS BIGINT) AS n,
       CAST(NULL AS BIGINT) AS n_null, CAST(NULL AS BIGINT) AS min,
       CAST(NULL AS BIGINT) AS max, CAST(NULL AS BIGINT) AS n_distinct,
       CAST(NULL AS BIGINT) AS top_value, CAST(NULL AS BIGINT) AS top_count,
       CAST(NULL AS BIGINT) AS mg_resid
WHERE FALSE""",
        "profile_stream_parity": """SELECT CAST(NULL AS VARCHAR) AS col_name, CAST(NULL AS BIGINT) AS n,
       CAST(NULL AS BIGINT) AS n_null, CAST(NULL AS BIGINT) AS min,
       CAST(NULL AS BIGINT) AS max, CAST(NULL AS BIGINT) AS n_distinct,
       CAST(NULL AS BIGINT) AS top_value, CAST(NULL AS BIGINT) AS top_count,
       CAST(NULL AS BIGINT) AS mg_resid
WHERE FALSE""",
        # bucket-pruned read == full-scan filter (pruning only prunes)
        "bucket_pruned_read": """SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_extendedprice >= 20000.0 AND l_extendedprice < 35000.0""",
        # zone-map-pruned reads == full-scan filters (pruning only prunes;
        # the Spark side re-applies the exact predicate after the skip)
        "zonemap_pruned_range": """WITH b AS (
  SELECT MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx FROM lineitem)
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem, b
WHERE l_orderkey BETWEEN b.mn + (b.mx - b.mn) // 4
                     AND b.mn + 3 * (b.mx - b.mn) // 8
GROUP BY l_returnflag""",
        "zonemap_bloom_lookup": """SELECT doc_id, n_chars
FROM documents
WHERE doc_id % 199 = 42""",
        "zonemap_fast_count": """WITH b AS (
  SELECT MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx FROM lineitem)
SELECT COUNT(*) AS n_matching
FROM lineitem, b
WHERE l_orderkey BETWEEN b.mn + (b.mx - b.mn) // 8
                     AND b.mn + 7 * (b.mx - b.mn) // 8""",
        "zonemap_fast_sum": """WITH b AS (
  SELECT MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx FROM lineitem)
SELECT CAST(COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) AS BIGINT) AS sum_qty
FROM lineitem, b
WHERE l_orderkey BETWEEN b.mn + (b.mx - b.mn) // 8
                     AND b.mn + 7 * (b.mx - b.mn) // 8""",
        # per-snapshot metadata COUNT+SUM over one doc_id band == the SQL
        # aggregates over each reconstructed version
        "vtable_fast_stats": """WITH mx AS (
  SELECT MAX(doc_id) AS m FROM documents),
v1 AS (
  SELECT doc_id,
         CASE WHEN doc_id BETWEEN m // 4 AND m // 2 AND doc_id % 3 = 0
              THEN 'UPD ' || text ELSE text END AS text
  FROM documents, mx
  UNION ALL
  SELECT m + 10 + i AS doc_id, 'ins ' || CAST(i AS VARCHAR) AS text
  FROM mx, (SELECT UNNEST(generate_series(0, 4)) AS i)),
v2 AS (
  SELECT v1.doc_id, v1.text FROM v1, mx
  WHERE v1.doc_id NOT BETWEEN 3 * m // 5 AND 9 * m // 10)
SELECT CAST(0 AS INTEGER) AS version, COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars
FROM documents, mx WHERE doc_id BETWEEN m // 3 AND 2 * m // 3
UNION ALL
SELECT CAST(1 AS INTEGER), COUNT(*),
       CAST(SUM(LENGTH(text)) AS BIGINT)
FROM v1, mx WHERE doc_id BETWEEN m // 3 AND 2 * m // 3
UNION ALL
SELECT CAST(2 AS INTEGER), COUNT(*),
       CAST(SUM(LENGTH(text)) AS BIGINT)
FROM v2, mx WHERE doc_id BETWEEN m // 3 AND 2 * m // 3""",
        # diff between snapshots == the SQL FULL OUTER JOIN of v0 vs the
        # reconstructed v2 (text-only compare; unchanged excluded)
        "vtable_version_diff": """WITH mx AS (
  SELECT MAX(doc_id) AS m FROM documents),
v1 AS (
  SELECT doc_id,
         CASE WHEN doc_id BETWEEN m // 4 AND m // 2 AND doc_id % 3 = 0
              THEN 'UPD ' || text ELSE text END AS text
  FROM documents, mx
  UNION ALL
  SELECT m + 10 + i AS doc_id, 'ins ' || CAST(i AS VARCHAR) AS text
  FROM mx, (SELECT UNNEST(generate_series(0, 4)) AS i)),
v2 AS (
  SELECT v1.doc_id, v1.text FROM v1, mx
  WHERE v1.doc_id NOT BETWEEN 3 * m // 5 AND 9 * m // 10)
SELECT doc_id, status FROM (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM documents o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id)
WHERE status <> 'unchanged'""",
        # three snapshots of the versioned table == their SQL
        # reconstructions (v0 base, v1 upsert, v2 range delete)
        "vtable_time_travel": """WITH mx AS (
  SELECT MAX(doc_id) AS m FROM documents),
v1 AS (
  SELECT doc_id,
         CASE WHEN doc_id BETWEEN m // 4 AND m // 2 AND doc_id % 3 = 0
              THEN 'UPD ' || text ELSE text END AS text
  FROM documents, mx
  UNION ALL
  SELECT m + 10 + i AS doc_id, 'ins ' || CAST(i AS VARCHAR) AS text
  FROM mx, (SELECT UNNEST(generate_series(0, 4)) AS i))
SELECT CAST(0 AS INTEGER) AS version, doc_id, text FROM documents
UNION ALL
SELECT CAST(1 AS INTEGER), doc_id, text FROM v1
UNION ALL
SELECT CAST(2 AS INTEGER), v1.doc_id, v1.text
FROM v1, mx WHERE v1.doc_id NOT BETWEEN 3 * m // 5 AND 9 * m // 10""",
        # copy-on-write range delete == the plain complement filter
        "zonemap_delete_range": """WITH mx AS (
  SELECT MAX(doc_id) AS m FROM documents)
SELECT doc_id, text
FROM documents, mx
WHERE doc_id NOT BETWEEN m // 8 AND 6 * m // 8""",
        # MERGE INTO == the same upsert computed relationally
        "zonemap_merge_upsert": """WITH mx AS (
  SELECT MAX(doc_id) AS m FROM documents),
upd AS (
  SELECT doc_id,
         CASE WHEN doc_id BETWEEN m // 4 AND m // 2 AND doc_id % 3 = 0
              THEN 'UPD ' || text ELSE text END AS text
  FROM documents, mx),
ins AS (
  SELECT m + 10 + i AS doc_id, 'ins ' || CAST(i AS VARCHAR) AS text
  FROM mx, (SELECT UNNEST(generate_series(0, 4)) AS i))
SELECT doc_id, text FROM upd
UNION ALL
SELECT doc_id, text FROM ins""",
        # layout compaction parity: data + map diffs both EMPTY
        "zonemap_compact_parity": """SELECT CAST(NULL AS VARCHAR) AS key,
       CAST(NULL AS VARCHAR) AS kind
WHERE FALSE""",
        # Z-order pruned reads == full-scan filters (pruning only prunes;
        # the zone-map envelopes equal table-level min/max per column)
        "zorder_pruned_partkey": """WITH b AS (
  SELECT MIN(l_partkey) AS mn, MAX(l_partkey) AS mx FROM lineitem)
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem, b
WHERE l_partkey BETWEEN b.mn + 3 * (b.mx - b.mn) // 8
                    AND b.mn + (b.mx - b.mn) // 2
GROUP BY l_returnflag""",
        "zorder_pruned_orderkey": """WITH b AS (
  SELECT MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx FROM lineitem)
SELECT l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem, b
WHERE l_orderkey BETWEEN b.mn + (b.mx - b.mn) // 4
                     AND b.mn + 3 * (b.mx - b.mn) // 8
GROUP BY l_linestatus""",
        "zorder_stream_ingest": """WITH b AS (
  SELECT MIN(l_partkey) AS mn, MAX(l_partkey) AS mx FROM lineitem)
SELECT l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem, b
WHERE l_partkey BETWEEN b.mn + 5 * (b.mx - b.mn) // 8
                    AND b.mn + 3 * (b.mx - b.mn) // 4
GROUP BY l_linestatus""",
        "zorder_append_parity": """WITH b AS (
  SELECT MIN(l_partkey) AS mn, MAX(l_partkey) AS mx FROM lineitem)
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem, b
WHERE l_partkey BETWEEN b.mn + (b.mx - b.mn) // 2
                    AND b.mn + 5 * (b.mx - b.mn) // 8
GROUP BY l_returnflag""",
        "zorder_pruned_conjunction": """WITH o AS (
  SELECT MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx FROM lineitem),
p AS (
  SELECT MIN(l_partkey) AS mn, MAX(l_partkey) AS mx FROM lineitem)
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem, o, p
WHERE l_orderkey BETWEEN o.mn + (o.mx - o.mn) // 4
                     AND o.mn + 3 * (o.mx - o.mn) // 4
  AND l_partkey BETWEEN p.mn + (p.mx - p.mn) // 4
                    AND p.mn + 3 * (p.mx - p.mn) // 4""",
        # streaming zone-map maintenance == scratch build, symdiff EMPTY
        "zonemap_stream_parity": """SELECT CAST(NULL AS VARCHAR) AS _file,
       CAST(NULL AS BIGINT) AS n_rows, CAST(NULL AS BIGINT) AS min_doc_id,
       CAST(NULL AS BIGINT) AS max_doc_id, CAST(NULL AS BIGINT) AS bloom_h
WHERE FALSE""",
        # grouped profile: exact per-group aggregates; top value = max count,
        # min-value tie-break (same deterministic cut as the Spark readout)
        "grouped_profile": """WITH v AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS val FROM lineitem
),
stats AS (
  SELECT grp, COUNT(*) AS n, SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS n_null,
         MIN(val) AS min, MAX(val) AS max, COUNT(DISTINCT val) AS n_distinct
  FROM v GROUP BY grp
),
tops AS (
  SELECT grp, val AS top_value, cnt AS top_count FROM (
    SELECT grp, val, COUNT(*) AS cnt,
           row_number() OVER (PARTITION BY grp ORDER BY COUNT(*) DESC, val ASC) AS rn
    FROM v WHERE val IS NOT NULL GROUP BY grp, val
  ) WHERE rn = 1
)
SELECT s.grp, 'l_quantity' AS col_name, CAST(s.n AS BIGINT) AS n,
       CAST(s.n_null AS BIGINT) AS n_null, CAST(s.min AS BIGINT) AS min,
       CAST(s.max AS BIGINT) AS max, CAST(s.n_distinct AS BIGINT) AS n_distinct,
       CAST(t.top_value AS BIGINT) AS top_value,
       CAST(t.top_count AS BIGINT) AS top_count, CAST(0 AS BIGINT) AS mg_resid
FROM stats s JOIN tops t USING (grp)""",
        # exact integer-scaled exponential decay: weight = 2^(H-1-d) BIGINT,
        # horizon d < H = 40 half-lives (contribution < 2^-40 beyond)
        "decayed_event_counts": """WITH mx AS (SELECT MAX(epoch_us(ts)) AS now_us FROM events),
d AS (SELECT event_type AS grp, (now_us - epoch_us(ts)) // 3600000000 AS d
      FROM events, mx)
SELECT grp, CAST(SUM(1::BIGINT << CAST(39 - d AS INT)) AS BIGINT) AS decayed_num,
       CAST(COUNT(*) AS BIGINT) AS n_window, CAST(39 AS INT) AS scale_exp
FROM d WHERE d < 40 GROUP BY grp""",
        # takedown totals: remaining tokens at their ORIGINAL stream
        # positions (docs with n_tok %% 5 == 0 removed, geometry retained)
        "global_sketch_takedown_totals": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, n_tok
  FROM (SELECT o, n_tok, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)})
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM flat f, rq
WHERE f.g >= a * {CFG.leaf_span} AND f.g < b * {CFG.leaf_span} AND f.n_tok % 5 <> 0
GROUP BY a, b""",
        # deletable-Bloom takedown: view == scratch-over-survivors, so the
        # symmetric difference is EMPTY
        "counting_takedown_parity": """SELECT CAST(NULL AS INTEGER) AS level,
       CAST(NULL AS BIGINT) AS w_id, CAST(NULL AS BLOB) AS bloom,
       CAST(NULL AS BIGINT) AS n_items, CAST(NULL AS BIGINT) AS bits_set
WHERE FALSE""",
        "range_membership": f"""WITH {CORPUS_CTE},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)})
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
FROM corpus, rq
WHERE list_contains(tokens[a * {CFG.leaf_span} + 1 : LEAST(n_tok, b * {CFG.leaf_span})], {ord("q")})""",
        # exact phi-heavy tokens per (doc, leaf-window range): unnest the
        # range slice, count, keep cnt/n_range >= phi in integer arithmetic
        # (cnt * den >= num * n_range — the Spark side uses the same cut)
        "range_heavy_hitters": f"""WITH {CORPUS_CTE},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)}),
sl AS (
  SELECT doc_id, a, b,
         tokens[a * {CFG.leaf_span} + 1 : LEAST(n_tok, b * {CFG.leaf_span})] AS rt,
         LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) AS nr
  FROM corpus, rq
  WHERE LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) > 0
),
ex AS (SELECT doc_id, a, b, nr, unnest(rt) AS token FROM sl),
cnt AS (SELECT doc_id, a, b, nr, token, COUNT(*) AS cnt
        FROM ex GROUP BY doc_id, a, b, nr, token)
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(token AS BIGINT) AS token, CAST(cnt AS BIGINT) AS cnt
FROM cnt WHERE cnt * {PHI_HH[1]} >= nr * {PHI_HH[0]}""",
        # global twin: positions in the concatenated stream (doc_offset
        # order = doc_id order, matching with_global_offsets)
        "global_range_heavy_hitters": f"""WITH {CORPUS_CTE},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS token
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)}),
nr AS (
  SELECT a, b, LEAST(n, b * {CFG.leaf_span}) - LEAST(n, a * {CFG.leaf_span}) AS nr
  FROM rq, tot
  WHERE LEAST(n, b * {CFG.leaf_span}) - LEAST(n, a * {CFG.leaf_span}) > 0
),
cnt AS (
  SELECT nr.a, nr.b, nr.nr, f.token, COUNT(*) AS cnt
  FROM flat f, nr
  WHERE f.g >= nr.a * {CFG.leaf_span} AND f.g < nr.b * {CFG.leaf_span}
  GROUP BY nr.a, nr.b, nr.nr, f.token
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(token AS BIGINT) AS token, CAST(cnt AS BIGINT) AS cnt
FROM cnt WHERE cnt * {PHI_HH[1]} >= nr * {PHI_HH[0]}""",
        # certified range top-k: plain exact top-k over the range slice —
        # the Spark side's MG certification guarantees the sets coincide
        "range_topk_tokens": f"""WITH {CORPUS_CTE},
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS)}),
sl AS (
  SELECT doc_id, a, b,
         tokens[a * {CFG.leaf_span} + 1 : LEAST(n_tok, b * {CFG.leaf_span})] AS rt
  FROM corpus, rq
  WHERE LEAST(n_tok, b * {CFG.leaf_span}) - LEAST(n_tok, a * {CFG.leaf_span}) > 0
),
cnt AS (SELECT doc_id, a, b, token, COUNT(*) AS cnt
        FROM (SELECT doc_id, a, b, unnest(rt) AS token FROM sl)
        GROUP BY doc_id, a, b, token),
r AS (SELECT doc_id, a, b, token, cnt,
             row_number() OVER (PARTITION BY doc_id, a, b
                                ORDER BY cnt DESC, token ASC) AS rk
      FROM cnt)
SELECT doc_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(token AS BIGINT) AS token, CAST(cnt AS BIGINT) AS cnt,
       CAST(rk AS BIGINT) AS rank
FROM r WHERE rk <= {RANGE_TOPK_K}""",
        "global_range_topk_tokens": f"""WITH {CORPUS_CTE},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS token
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)}),
cnt AS (
  SELECT rq.a, rq.b, f.token, COUNT(*) AS cnt
  FROM flat f, rq
  WHERE f.g >= rq.a * {CFG.leaf_span} AND f.g < rq.b * {CFG.leaf_span}
  GROUP BY rq.a, rq.b, f.token
),
r AS (SELECT a, b, token, cnt,
             row_number() OVER (PARTITION BY a, b
                                ORDER BY cnt DESC, token ASC) AS rk
      FROM cnt)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(token AS BIGINT) AS token, CAST(cnt AS BIGINT) AS cnt,
       CAST(rk AS BIGINT) AS rank
FROM r WHERE rk <= {RANGE_TOPK_K}""",
        # streamed sketch index totals: pure stream geometry — every level's
        # windows tile [0, N) dyadically with exact token counts
        "stream_sketch_totals": f"""WITH {CORPUS_CTE},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
lv(level, span) AS (VALUES {", ".join(f"({L}, {CFG.span(L)})" for L in CFG.levels)}),
w AS (
  SELECT lv.level, span, n,
         unnest(generate_series(0, CAST((n + span - 1) // span - 1 AS BIGINT))) AS w_id
  FROM tot, lv WHERE n > 0)
SELECT CAST(level AS INT) AS level, CAST(w_id AS BIGINT) AS w_id,
       CAST(LEAST(span, n - w_id * span) AS BIGINT) AS n_window
FROM w""",
        "global_range_signed_freq": f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)}),
pt(token) AS (VALUES {", ".join(f"({t})" for t in PROBE_TOKENS)}),
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
rng AS (SELECT a, b FROM rq, tot
        WHERE LEAST(n, b * {CFG.leaf_span}) - LEAST(n, a * {CFG.leaf_span}) > 0),
cnts AS (SELECT a, b, t, COUNT(*) AS c FROM flat, rq
         WHERE g >= a * {CFG.leaf_span} AND g < b * {CFG.leaf_span}
         GROUP BY a, b, t)
SELECT CAST(r.a AS BIGINT) AS a, CAST(r.b AS BIGINT) AS b,
       CAST(p.token AS BIGINT) AS token,
       CAST(COALESCE(c.c, 0) AS DOUBLE) AS est_count
FROM rng r CROSS JOIN pt p
LEFT JOIN cnts c ON c.a = r.a AND c.b = r.b AND c.t = p.token""",
        "global_range_totals": f"""WITH {CORPUS_CTE},
tot AS (SELECT SUM(n_tok) AS n FROM corpus),
rq(a, b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in RANGE_QS_GLOBAL)})
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(LEAST(n, b * {CFG.leaf_span}) - LEAST(n, a * {CFG.leaf_span}) AS BIGINT) AS n_tokens
FROM rq, tot
WHERE LEAST(n, b * {CFG.leaf_span}) - LEAST(n, a * {CFG.leaf_span}) > 0""",
    }


def _oracles_tail(out: dict[str, str]) -> dict[str, str]:
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
    out["bloom_rollup_geometry"] = out["index_geometry"]
    # SimHash lifted to VALUE-checked: the uncapped pigeonhole banding is
    # exact, and the twin recomputes every signature bit-for-bit in SQL
    out["simhash_hamming_pairs"] = _simhash_pairs_oracle()
    # integer fixed-point PageRank: identical floor recurrence both engines
    out["custsupp_pagerank"] = _pagerank_oracle_sql()
    # integer reciprocal-rank fusion of two deterministic rankings
    out["hybrid_retrieval_rrf"] = _rrf_oracle_sql()
    # temperature mixture: budgets recomputed in SQL (exact isqrt)
    out["temperature_mixture_docs"] = _temperature_mixture_oracle()
    # first-touch attribution: exact integer-micros window join
    out["purchase_attribution"] = f"""WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
conv AS (SELECT CAST(event_id AS BIGINT) AS conv_id, user_id,
                CAST(t AS BIGINT) AS t_conv
         FROM e WHERE event_type = 'purchase'),
tch AS (SELECT CAST(event_id AS BIGINT) AS touch_id, user_id,
               CAST(t AS BIGINT) AS t_touch
        FROM e WHERE event_type = 'click'),
m AS (SELECT c.conv_id, t.touch_id, t.t_touch,
             ROW_NUMBER() OVER (PARTITION BY c.conv_id
               ORDER BY t.t_touch ASC, t.touch_id ASC) AS rk
      FROM conv c JOIN tch t ON t.user_id = c.user_id
        AND t.t_touch >= c.t_conv - {ATTR_WINDOW_US}
        AND t.t_touch < c.t_conv)
SELECT c.conv_id, c.user_id, c.t_conv, m.touch_id, m.t_touch
FROM conv c LEFT JOIN (SELECT * FROM m WHERE rk = 1) m USING (conv_id)"""
    # corpus statistics curves: exact integers, broadcast-ladder shapes
    out["vocab_growth_curve"] = _vocab_growth_oracle()
    out["freq_coverage_curve"] = _freq_coverage_oracle()
    # bijective hash64 pseudonyms: hex via to_hex HUGEINT halves
    out["events_pseudonymized"] = f"""WITH {_key_hash_ctes(
        PSEUDO_SEED, 'ph',
        'SELECT DISTINCT CAST(user_id AS BIGINT) AS key FROM events')},
px AS (SELECT key,
              lpad(lower(to_hex(CAST(_h >> 32 AS BIGINT))), 8, '0') ||
              lpad(lower(to_hex(CAST(_h % 4294967296 AS BIGINT))), 8, '0')
              AS pid
       FROM ph)
SELECT p.pid, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN px p ON p.key = e.user_id
GROUP BY p.pid"""
    # exact k-anonymity report (plain group-count filter)
    out["events_k_anonymity"] = f"""SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type HAVING COUNT(*) < {KANON_K}"""
    # exact ppm percentile ranks (rank()-1 strictly-below semantics)
    out["doclen_percentiles"] = """WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         CAST(length(text) AS BIGINT) AS doclen
  FROM documents)
SELECT doc_id, source, doclen,
       CAST(((RANK() OVER (PARTITION BY source ORDER BY doclen ASC) - 1)
             * 1000000)
            // COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS pct_x1e6
FROM d"""
    # stateful-streaming sessionization parity: empty symmetric difference
    out["session_stream_parity"] = """SELECT
  CAST(NULL AS VARCHAR) AS user_id, CAST(NULL AS BIGINT) AS t_start,
  CAST(NULL AS BIGINT) AS t_end, CAST(NULL AS BIGINT) AS n_events
WHERE FALSE"""
    # exact integer-cosine pair join (HUGEINT squared inequality)
    out["lexical_cosine_pairs"] = f"""WITH dom AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  WHERE doc_id % {LEXCOS_MOD} = 0),
wc AS (SELECT doc_id, w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM (SELECT doc_id,
                    unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w
             FROM dom)
       GROUP BY doc_id, w),
nrm AS (SELECT doc_id, CAST(SUM(cnt * cnt) AS BIGINT) AS n2
        FROM wc GROUP BY doc_id),
d AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS dot
      FROM wc a JOIN wc b ON a.word = b.word AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT doc_a, doc_b, dot, na.n2 AS na2, nb.n2 AS nb2
FROM d JOIN nrm na ON na.doc_id = d.doc_a
       JOIN nrm nb ON nb.doc_id = d.doc_b
WHERE CAST(dot * {LEXCOS_T[1]} AS HUGEINT) * CAST(dot * {LEXCOS_T[1]} AS HUGEINT)
      >= CAST({LEXCOS_T[0] * LEXCOS_T[0]} AS HUGEINT) * na.n2 * nb.n2"""
    # the KLL quantile rollup's exact item counts have the same closed form
    # as the CMS totals (identical dyadic geometry, exact counts per window)
    out["kll_rollup_totals"] = out["cms_rollup_totals"]
    # ... and so do the t-digest rollup's exact n fields
    out["td_rollup_totals"] = out["cms_rollup_totals"]
    # ... and so do the Misra-Gries rollup's exact n_total fields
    out["mg_rollup_totals"] = out["cms_rollup_totals"]
    # ... and the signed count-sketch rollup's exact total header field
    out["cs_rollup_totals"] = out["cms_rollup_totals"]
    # the strided global index must return the SAME matches as the dense one
    # (sketches/stride prune cost, never answers)
    out["hbi_global_pattern_strided"] = out["hbi_global_pattern"]
    # the streaming decontamination gate must equal the batch pair table
    out["decontaminate_stream"] = out["decontaminate_pairs"]
    # the streaming quality monitor re-sums per-batch SUM components, so it
    # must equal the batch dashboard exactly (same DuckDB twin)
    out["quality_report_stream"] = out["corpus_quality_report"]
    # range-restricted search = the full-search oracle + the position bound
    # (both oracles end in a WHERE clause, so the AND composes)
    out["hbi_pattern_range"] = out["hbi_pattern_present"] + (
        f" AND i - 1 >= {PRANGE[0]} AND i - 1 <= {PRANGE[1] - len(PAT_PRESENT)}"
    )
    out["hbi_global_pattern_range"] = out["hbi_global_pattern"] + (
        f" AND f0.g >= {GRANGE[0]} AND f0.g <= {GRANGE[1] - len(PAT_GLOBAL)}"
    )
    _m = len(PAT_PRESENT)
    _compl = " || '|' || ".join(
        f"CAST(tokens[i + {_m + j}] AS VARCHAR)" for j in range(COMPL_ELL)
    )
    _gm = len(PAT_GLOBAL)
    _gjoins = " ".join(
        f"JOIN flat f{j} ON f{j}.g = f0.g + {j} AND f{j}.t = {PAT_GLOBAL[j]}"
        for j in range(1, _gm)
    )
    _cjoins = " ".join(
        f"JOIN flat c{j} ON c{j}.g = f0.g + {_gm + j}" for j in range(COMPL_ELL)
    )
    _gcompl = " || '|' || ".join(
        f"CAST(c{j}.t AS VARCHAR)" for j in range(COMPL_ELL)
    )
    out["hbi_global_pattern_completions"] = f"""WITH {CORPUS_CTE},
off AS (
  SELECT tokens, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM corpus
),
flat AS (
  SELECT o + i - 1 AS g, tokens[i] AS t
  FROM (SELECT o, tokens, unnest(generate_series(1, CAST(n_tok AS BIGINT))) AS i FROM off)
)
SELECT {_gcompl} AS completion, COUNT(*) AS n
FROM flat f0 {_gjoins} {_cjoins}
WHERE f0.t = {PAT_GLOBAL[0]}
GROUP BY completion ORDER BY n DESC, completion ASC LIMIT {COMPL_K}"""
    out["hbi_pattern_completions"] = f"""WITH {CORPUS_CTE}
SELECT {_compl} AS completion, COUNT(*) AS n
FROM (SELECT tokens, n_tok,
             unnest(generate_series(1, CAST(n_tok - {_m} + 1 AS BIGINT))) AS i
      FROM corpus)
WHERE tokens[i : i + {_m} - 1] = {_pat_sql(PAT_PRESENT)}
  AND i + {_m + COMPL_ELL - 1} <= n_tok
GROUP BY completion ORDER BY n DESC, completion ASC LIMIT {COMPL_K}"""

    # --- corpus drift: exact TVD numerators in HUGEINT (DECIMAL twin) ---
    _tvd_num = ("COALESCE(i.inum, 0) + (p.na - COALESCE(i.sa, 0)) * p.nb"
                " + (p.nb - COALESCE(i.sb, 0)) * p.na")
    out["source_token_tvd"] = f"""WITH {CORPUS_CTE},
tok AS (SELECT source AS grp, unnest(tokens) AS token FROM corpus),
cnt AS (SELECT grp, token, CAST(count(*) AS HUGEINT) AS c
        FROM tok GROUP BY 1, 2),
tot AS (SELECT grp, CAST(SUM(c) AS HUGEINT) AS n FROM cnt GROUP BY 1),
inner_agg AS (
  SELECT ca.grp AS ga, cb.grp AS gb,
         SUM(ABS(ca.c * tb.n - cb.c * ta.n)) AS inum,
         SUM(ca.c) AS sa, SUM(cb.c) AS sb, COUNT(*) AS sh
  FROM cnt ca
  JOIN cnt cb ON cb.token = ca.token AND ca.grp < cb.grp
  JOIN tot ta ON ta.grp = ca.grp
  JOIN tot tb ON tb.grp = cb.grp
  GROUP BY 1, 2),
pairs AS (SELECT a.grp AS ga, a.n AS na, b.grp AS gb, b.n AS nb
          FROM tot a JOIN tot b ON a.grp < b.grp)
SELECT p.ga AS source_a, p.gb AS source_b,
       CAST(p.na AS BIGINT) AS n_a, CAST(p.nb AS BIGINT) AS n_b,
       CAST(COALESCE(i.sh, 0) AS BIGINT) AS shared_tokens,
       CAST({_tvd_num} AS VARCHAR) AS tvd_num,
       CAST({_tvd_num} AS DOUBLE) / CAST(2 * p.na * p.nb AS DOUBLE) AS tvd
FROM pairs p LEFT JOIN inner_agg i ON i.ga = p.ga AND i.gb = p.gb"""

    _ta, _tb = TVD_PAIR
    out["tvd_top_tokens"] = f"""WITH {CORPUS_CTE},
tok AS (SELECT source AS grp, unnest(tokens) AS token FROM corpus
        WHERE source IN ('{_ta}', '{_tb}')),
cnt AS (SELECT token,
               CAST(SUM(CASE WHEN grp = '{_ta}' THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
               CAST(SUM(CASE WHEN grp = '{_tb}' THEN 1 ELSE 0 END) AS HUGEINT) AS cb
        FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(ca) AS HUGEINT) AS na,
               CAST(SUM(cb) AS HUGEINT) AS nb FROM cnt)
SELECT CAST(c.token AS INT) AS token,
       CAST(c.ca AS BIGINT) AS cnt_a, CAST(c.cb AS BIGINT) AS cnt_b,
       CAST(ABS(c.ca * t.nb - c.cb * t.na) AS VARCHAR) AS contrib,
       CAST(ABS(c.ca * t.nb - c.cb * t.na) AS DOUBLE)
         / CAST(2 * t.na * t.nb AS DOUBLE) AS tvd_share
FROM cnt c, tot t
ORDER BY ABS(c.ca * t.nb - c.cb * t.na) DESC, c.token ASC
LIMIT {TVD_TOPK}"""

    out["token_drift_stream"] = """SELECT CAST(NULL AS VARCHAR) AS grp,
       CAST(NULL AS INTEGER) AS token, CAST(NULL AS BIGINT) AS cnt
WHERE FALSE"""

    out["token_counts_takedown_parity"] = """SELECT
       CAST(NULL AS VARCHAR) AS grp,
       CAST(NULL AS INTEGER) AS token, CAST(NULL AS BIGINT) AS cnt
WHERE FALSE"""

    out["catalog_table_ops"] = """SELECT CAST(NULL AS BIGINT) AS doc_id,
       CAST(NULL AS VARCHAR) AS text
WHERE FALSE"""

    out["expectations_stream_parity"] = """SELECT
       CAST(NULL AS VARCHAR) AS "constraint",
       CAST(NULL AS BIGINT) AS violations, CAST(NULL AS BIGINT) AS n_rows
WHERE FALSE"""

    out["profile_learned_contract"] = """WITH s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         count(*) - count(o_orderkey) AS nn_ok,
         MIN(o_orderkey) AS mn_ok, MAX(o_orderkey) AS mx_ok,
         count(*) - count(o_custkey) AS nn_ck,
         MIN(o_custkey) AS mn_ck, MAX(o_custkey) AS mx_ck
  FROM orders)
SELECT c AS "constraint", v AS violations, n AS n_rows, v = 0 AS passed
FROM (
  SELECT 'not_null(o_orderkey)' AS c, CAST(nn_ok AS BIGINT) AS v, n
  FROM s WHERE nn_ok = 0
  UNION ALL
  SELECT 'not_null(o_custkey)', CAST(nn_ck AS BIGINT), n
  FROM s WHERE nn_ck = 0
  UNION ALL
  SELECT 'in_range(o_orderkey, ' || CAST(mn_ok AS VARCHAR) || ', '
           || CAST(mx_ok AS VARCHAR) || ')',
         CAST((SELECT count(*) FROM orders, s
               WHERE o_orderkey IS NOT NULL
                 AND (o_orderkey < mn_ok OR o_orderkey > mx_ok)) AS BIGINT),
         n
  FROM s WHERE mn_ok IS NOT NULL
  UNION ALL
  SELECT 'in_range(o_custkey, ' || CAST(mn_ck AS VARCHAR) || ', '
           || CAST(mx_ck AS VARCHAR) || ')',
         CAST((SELECT count(*) FROM orders, s
               WHERE o_custkey IS NOT NULL
                 AND (o_custkey < mn_ck OR o_custkey > mx_ck)) AS BIGINT),
         n
  FROM s WHERE mn_ck IS NOT NULL
) ORDER BY c"""

    out["doc_atypicality_topk"] = f"""WITH {CORPUS_CTE},
cnt AS (SELECT grp, token, CAST(count(*) AS HUGEINT) AS c
        FROM (SELECT source AS grp, unnest(tokens) AS token FROM corpus)
        GROUP BY 1, 2),
tot AS (SELECT grp, CAST(SUM(c) AS HUGEINT) AS n FROM cnt GROUP BY 1),
dt AS (SELECT doc_id, grp, n_tok, token, CAST(count(*) AS HUGEINT) AS cd
       FROM (SELECT doc_id, source AS grp, n_tok,
                    unnest(tokens) AS token FROM corpus)
       GROUP BY 1, 2, 3, 4),
agg AS (SELECT dt.doc_id, dt.grp, dt.n_tok,
               SUM(ABS(dt.cd * t.n - c.c * CAST(dt.n_tok AS HUGEINT)))
                 AS inum,
               SUM(c.c) AS s_cov, MIN(t.n) AS ng
        FROM dt
        JOIN cnt c ON c.grp = dt.grp AND c.token = dt.token
        JOIN tot t ON t.grp = dt.grp
        GROUP BY 1, 2, 3)
SELECT doc_id, grp, CAST(n_tok AS INT) AS n_tok,
       CAST(inum + (ng - s_cov) * CAST(n_tok AS HUGEINT) AS VARCHAR)
         AS tvd_num,
       CAST(inum + (ng - s_cov) * CAST(n_tok AS HUGEINT) AS DOUBLE)
         / CAST(2 * CAST(n_tok AS HUGEINT) * ng AS DOUBLE) AS tvd
FROM agg
ORDER BY tvd DESC, doc_id ASC
LIMIT 20"""

    out["orders_quarantine"] = """SELECT o_orderkey, violated FROM (
  SELECT o_orderkey,
    array_to_string(list_sort(list_filter([
      CASE WHEN o_orderkey IS NULL THEN 'not_null(o_orderkey)' END,
      CASE WHEN o_orderkey IS NOT NULL
            AND COUNT(*) OVER (PARTITION BY o_orderkey) > 1
           THEN 'unique(o_orderkey)' END,
      CASE WHEN o_totalprice IS NOT NULL
            AND (o_totalprice < 0.0 OR o_totalprice > 250000.0)
           THEN 'in_range(o_totalprice, 0.0, 250000.0)' END,
      CASE WHEN o_orderstatus IS NOT NULL
            AND o_orderstatus NOT IN ('O', 'F')
           THEN 'accepted_values(o_orderstatus, [O, F])' END,
      CASE WHEN o_orderpriority IS NOT NULL
            AND NOT regexp_full_match(o_orderpriority, '[0-3]-[A-Z ]+')
           THEN 'regex_match(o_orderpriority, [0-3]-[A-Z ]+)' END,
      CASE WHEN o_custkey IS NOT NULL AND NOT EXISTS (
             SELECT 1 FROM customer c
             WHERE c.c_custkey % 3 <> 0 AND c.c_custkey = o.o_custkey)
           THEN 'fk(o_custkey -> customer_dim.c_custkey)' END
    ], x -> x IS NOT NULL)), '|') AS violated
  FROM orders o)
WHERE violated <> ''"""

    out["snapshot_token_drift"] = """WITH mx AS (
  SELECT MAX(doc_id) AS m FROM documents),
v1 AS (
  SELECT doc_id,
         CASE WHEN doc_id BETWEEN m // 4 AND m // 2 AND doc_id % 3 = 0
              THEN 'UPD ' || text ELSE text END AS text
  FROM documents, mx
  UNION ALL
  SELECT m + 10 + i AS doc_id, 'ins ' || CAST(i AS VARCHAR) AS text
  FROM mx, (SELECT UNNEST(generate_series(0, 4)) AS i)),
v2 AS (
  SELECT v1.doc_id, v1.text FROM v1, mx
  WHERE v1.doc_id NOT BETWEEN 3 * m // 5 AND 9 * m // 10),
allv AS (
  SELECT '0' AS grp, text FROM documents
  UNION ALL SELECT '1', text FROM v1
  UNION ALL SELECT '2', text FROM v2),
tok AS (SELECT grp,
               unnest(list_transform(string_split(text, ''),
                                     c -> ascii(c))) AS token
        FROM allv),
cnt AS (SELECT grp, token, CAST(count(*) AS HUGEINT) AS c
        FROM tok GROUP BY 1, 2),
tot AS (SELECT grp, CAST(SUM(c) AS HUGEINT) AS n FROM cnt GROUP BY 1),
inner_agg AS (
  SELECT ca.grp AS ga, cb.grp AS gb,
         SUM(ABS(ca.c * tb.n - cb.c * ta.n)) AS inum,
         SUM(ca.c) AS sa, SUM(cb.c) AS sb, COUNT(*) AS sh
  FROM cnt ca
  JOIN cnt cb ON cb.token = ca.token AND ca.grp < cb.grp
  JOIN tot ta ON ta.grp = ca.grp
  JOIN tot tb ON tb.grp = cb.grp
  GROUP BY 1, 2),
pairs AS (SELECT a.grp AS ga, a.n AS na, b.grp AS gb, b.n AS nb
          FROM tot a JOIN tot b ON a.grp < b.grp)
SELECT p.ga AS source_a, p.gb AS source_b,
       CAST(p.na AS BIGINT) AS n_a, CAST(p.nb AS BIGINT) AS n_b,
       CAST(COALESCE(i.sh, 0) AS BIGINT) AS shared_tokens,
       CAST(COALESCE(i.inum, 0) + (p.na - COALESCE(i.sa, 0)) * p.nb
            + (p.nb - COALESCE(i.sb, 0)) * p.na AS VARCHAR) AS tvd_num,
       CAST(COALESCE(i.inum, 0) + (p.na - COALESCE(i.sa, 0)) * p.nb
            + (p.nb - COALESCE(i.sb, 0)) * p.na AS DOUBLE)
         / CAST(2 * p.na * p.nb AS DOUBLE) AS tvd
FROM pairs p LEFT JOIN inner_agg i ON i.ga = p.ga AND i.gb = p.gb"""

    out["event_type_drift"] = """WITH
tok AS (SELECT strftime(ts, '%Y-%m-%d') AS grp, event_type AS token
        FROM events),
cnt AS (SELECT grp, token, CAST(count(*) AS HUGEINT) AS c
        FROM tok GROUP BY 1, 2),
tot AS (SELECT grp, CAST(SUM(c) AS HUGEINT) AS n FROM cnt GROUP BY 1),
inner_agg AS (
  SELECT ca.grp AS ga, cb.grp AS gb,
         SUM(ABS(ca.c * tb.n - cb.c * ta.n)) AS inum,
         SUM(ca.c) AS sa, SUM(cb.c) AS sb, COUNT(*) AS sh
  FROM cnt ca
  JOIN cnt cb ON cb.token = ca.token AND ca.grp < cb.grp
  JOIN tot ta ON ta.grp = ca.grp
  JOIN tot tb ON tb.grp = cb.grp
  GROUP BY 1, 2),
pairs AS (SELECT a.grp AS ga, a.n AS na, b.grp AS gb, b.n AS nb
          FROM tot a JOIN tot b ON a.grp < b.grp)
SELECT p.ga AS source_a, p.gb AS source_b,
       CAST(p.na AS BIGINT) AS n_a, CAST(p.nb AS BIGINT) AS n_b,
       CAST(COALESCE(i.sh, 0) AS BIGINT) AS shared_tokens,
       CAST(COALESCE(i.inum, 0) + (p.na - COALESCE(i.sa, 0)) * p.nb
            + (p.nb - COALESCE(i.sb, 0)) * p.na AS VARCHAR) AS tvd_num,
       CAST(COALESCE(i.inum, 0) + (p.na - COALESCE(i.sa, 0)) * p.nb
            + (p.nb - COALESCE(i.sb, 0)) * p.na AS DOUBLE)
         / CAST(2 * p.na * p.nb AS DOUBLE) AS tvd
FROM pairs p LEFT JOIN inner_agg i ON i.ga = p.ga AND i.gb = p.gb"""

    out["source_doclen_ks"] = f"""WITH {CORPUS_CTE},
lens AS (SELECT source AS grp, n_tok AS v FROM corpus),
tot AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM lens GROUP BY 1),
pairs AS (SELECT a.grp AS ga, a.n AS na, b.grp AS gb, b.n AS nb
          FROM tot a JOIN tot b ON a.grp < b.grp),
pts AS (SELECT DISTINCT p.ga, p.gb, l.v
        FROM pairs p JOIN lens l ON l.grp IN (p.ga, p.gb)),
diffs AS (SELECT pt.ga, pt.gb, pt.v,
            ABS(
              CAST((SELECT count(*) FROM lens l
                    WHERE l.grp = pt.ga AND l.v <= pt.v) AS DOUBLE)
                / CAST(p.na AS DOUBLE)
            - CAST((SELECT count(*) FROM lens l
                    WHERE l.grp = pt.gb AND l.v <= pt.v) AS DOUBLE)
                / CAST(p.nb AS DOUBLE)) AS d
          FROM pts pt JOIN pairs p ON p.ga = pt.ga AND p.gb = pt.gb),
ks AS (SELECT ga, gb, MAX(d) AS ks FROM diffs GROUP BY 1, 2),
arg AS (SELECT dd.ga, dd.gb, MIN(dd.v) AS ks_x
        FROM diffs dd JOIN ks k2
          ON k2.ga = dd.ga AND k2.gb = dd.gb AND dd.d = k2.ks
        GROUP BY 1, 2)
SELECT p.ga AS source_a, p.gb AS source_b, p.na AS n_a, p.nb AS n_b,
       k.ks AS ks, CAST(a.ks_x AS DOUBLE) AS ks_x
FROM pairs p
JOIN ks k ON k.ga = p.ga AND k.gb = p.gb
JOIN arg a ON a.ga = p.ga AND a.gb = p.gb"""

    from hierarchical_bloom_filter_index_spark.operators import (
        expectations as EXP,
    )

    _cn = [EXP.constraint_name(c) for c in ORDERS_CONS]
    out["orders_expectations"] = f"""WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
SELECT c AS "constraint", v AS violations, n AS n_rows, v = 0 AS passed
FROM (
  SELECT '{_cn[0]}' AS c, CAST((SELECT count(*) FROM orders
    WHERE o_orderkey IS NULL) AS BIGINT) AS v, n FROM base
  UNION ALL SELECT '{_cn[1]}', CAST(COALESCE((SELECT sum(cnt - 1)
    FROM (SELECT count(*) AS cnt FROM orders
          WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
    WHERE cnt > 1), 0) AS BIGINT), n FROM base
  UNION ALL SELECT '{_cn[2]}', CAST((SELECT count(*) FROM orders
    WHERE o_totalprice IS NOT NULL
      AND (o_totalprice < 0.0 OR o_totalprice > 250000.0)) AS BIGINT),
    n FROM base
  UNION ALL SELECT '{_cn[3]}', CAST((SELECT count(*) FROM orders
    WHERE o_orderstatus IS NOT NULL
      AND o_orderstatus NOT IN ('O', 'F')) AS BIGINT), n FROM base
  UNION ALL SELECT '{_cn[4]}', CAST((SELECT count(*) FROM orders
    WHERE o_orderpriority IS NOT NULL
      AND NOT regexp_full_match(o_orderpriority, '[0-3]-[A-Z ]+'))
    AS BIGINT), n FROM base
  UNION ALL SELECT '{_cn[5]}', CAST(CASE WHEN (SELECT n FROM base)
    BETWEEN 1 AND 1000000000 THEN 0 ELSE 1 END AS BIGINT), n FROM base
  UNION ALL SELECT '{_cn[6]}', CAST(CASE WHEN (SELECT MAX(o_orderdate)
    FROM orders) >= TIMESTAMP '2001-01-01 00:00:00' THEN 0 ELSE 1 END
    AS BIGINT), n FROM base
  UNION ALL SELECT '{_cn[7]}', CAST((SELECT count(*) FROM orders o
    WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey % 3 <> 0 AND c.c_custkey = o.o_custkey))
    AS BIGINT), n FROM base
) ORDER BY c"""

    out["cdc_chunk_spans"] = f"""WITH {_cdc_chunks_cte()}
SELECT c.doc_id, c.chunk_idx, c.char_start,
       CAST(length(c.chunk) AS INTEGER) AS chunk_len, c.chunk
FROM chunks c JOIN docsrc d ON d.doc_id = c.doc_id
WHERE length(d.text) % 17 = 0"""

    out["cdc_dedup_stats"] = f"""WITH {_cdc_chunks_cte()},
tot AS (SELECT source, COUNT(*) AS n_chunks,
               CAST(SUM(length(chunk)) AS BIGINT) AS total_chars
        FROM chunks GROUP BY source),
dst AS (SELECT source, COUNT(*) AS n_distinct_chunks,
               CAST(SUM(length(chunk)) AS BIGINT) AS distinct_chars
        FROM (SELECT DISTINCT source, chunk FROM chunks) GROUP BY source)
SELECT t.source, t.n_chunks, t.total_chars,
       d.n_distinct_chunks, d.distinct_chars
FROM tot t JOIN dst d ON d.source = t.source"""

    out["cdc_global_stats"] = f"""WITH {_cdc_chunks_cte()},
tot AS (SELECT COUNT(*) AS n_chunks,
               CAST(SUM(length(chunk)) AS BIGINT) AS total_chars
        FROM chunks),
dst AS (SELECT COUNT(*) AS n_distinct_chunks,
               CAST(SUM(length(chunk)) AS BIGINT) AS distinct_chars
        FROM (SELECT DISTINCT chunk FROM chunks))
SELECT t.n_chunks, t.total_chars, d.n_distinct_chunks, d.distinct_chars
FROM tot t, dst d"""

    out["cdc_topk_similar"] = f"""WITH {_cdc_chunks_cte()},
dc AS (SELECT DISTINCT doc_id, chunk FROM chunks),
sz AS (SELECT doc_id, COUNT(*) AS n FROM dc GROUP BY doc_id),
pe AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
       FROM dc a JOIN dc b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT doc_a, doc_b, n_shared, n_union,
       (n_shared * 1000000000) // n_union AS jaccard_x1e9
FROM (SELECT p.doc_a, p.doc_b, p.n_shared,
             sa.n + sb.n - p.n_shared AS n_union
      FROM pe p JOIN sz sa ON sa.doc_id = p.doc_a
                JOIN sz sb ON sb.doc_id = p.doc_b)
ORDER BY jaccard_x1e9 DESC, doc_a ASC, doc_b ASC
LIMIT 20"""

    out["cdc_shared_pairs"] = f"""WITH {_cdc_chunks_cte()},
dc AS (SELECT DISTINCT doc_id, chunk FROM chunks)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
FROM dc a JOIN dc b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2"""

    # doc_id comparisons are lexicographic VARCHAR on BOTH engines (the
    # Spark side's least/greatest over _docs' string ids), so the a<b
    # canonicalization and the a<b<c triangle enumeration agree.
    out["cdc_graph_stats"] = f"""WITH {_cdc_chunks_cte()},
dc AS (SELECT DISTINCT doc_id, chunk FROM chunks),
pe AS (SELECT a.doc_id AS a, b.doc_id AS b
       FROM dc a JOIN dc b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (SELECT node, COUNT(*) AS degree
        FROM (SELECT a AS node FROM pe UNION ALL SELECT b FROM pe)
        GROUP BY node)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM pe) AS n_edges,
       (SELECT COUNT(*) FROM pe e1
        JOIN pe e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN pe e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles,
       (SELECT COALESCE(MAX(degree), 0) FROM deg) AS max_degree,
       (SELECT CAST(COALESCE(SUM((degree * (degree - 1)) // 2), 0) AS BIGINT)
        FROM deg) AS sum_wedges"""

    _WORDS_CTE = """words AS (
  SELECT source, t.w AS word
  FROM documents, UNNEST(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS t(w)),
vocab AS (
  SELECT word FROM (SELECT word, COUNT(*) AS c FROM words
                    GROUP BY word ORDER BY c DESC, word ASC LIMIT 16))"""

    out["source_vocab_coverage"] = f"""WITH {_WORDS_CTE},
marked AS (SELECT w.source, w.word, v.word IS NOT NULL AS inv
           FROM words w LEFT JOIN vocab v ON v.word = w.word),
occ AS (SELECT source, COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN inv THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_covered
        FROM marked GROUP BY source),
typ AS (SELECT source, COUNT(*) AS n_types,
               CAST(SUM(CASE WHEN inv THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_oov_types
        FROM (SELECT DISTINCT source, word, inv FROM marked)
        GROUP BY source)
SELECT o.source, o.n_tokens, o.n_covered, t.n_types, t.n_oov_types
FROM occ o JOIN typ t ON t.source = o.source"""

    out["oov_top_terms"] = f"""WITH {_WORDS_CTE},
oovc AS (SELECT source, word, COUNT(*) AS cnt
         FROM words w
         WHERE NOT EXISTS (SELECT 1 FROM vocab v WHERE v.word = w.word)
         GROUP BY 1, 2)
SELECT source, word, cnt FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY cnt DESC, word ASC) AS rn
  FROM oovc)
WHERE rn <= 3"""

    # exact order statistics via ROW_NUMBER — DuckDB's median() averages
    # the two middles into a DOUBLE; the doubled-scale integer twin below
    # is what mad_outlier_stats computes
    out["doclen_mad_outliers"] = """WITH b AS (
  SELECT source, CAST(length(text) AS BIGINT) AS x FROM documents),
r AS (SELECT source, x,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n FROM b),
m AS (SELECT source, MAX(n) AS n,
             CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN x ELSE 0 END)
                  + SUM(CASE WHEN rn = (n + 2) // 2 THEN x ELSE 0 END)
                  AS BIGINT) AS med2
      FROM r GROUP BY source),
d AS (SELECT b.source, ABS(2 * b.x - m.med2) AS dev FROM b
      JOIN m ON m.source = b.source),
r2 AS (SELECT source, dev,
              ROW_NUMBER() OVER (PARTITION BY source ORDER BY dev) AS rn,
              COUNT(*) OVER (PARTITION BY source) AS n FROM d),
m2 AS (SELECT source,
              CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN dev ELSE 0 END)
                   + SUM(CASE WHEN rn = (n + 2) // 2 THEN dev ELSE 0 END)
                   AS BIGINT) AS mad2
       FROM r2 GROUP BY source),
fl AS (SELECT d.source,
              CAST(SUM(CASE WHEN 2 * d.dev * 2 > 5 * m2.mad2
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM d JOIN m2 ON m2.source = d.source GROUP BY d.source)
SELECT m.source, m.n, m.med2, m2.mad2, fl.n_outliers
FROM m JOIN m2 ON m2.source = m.source JOIN fl ON fl.source = m.source"""

    # the persisted store must reproduce the scratch accounting exactly
    out["chunk_store_stats"] = out["cdc_dedup_stats"]

    _CHUNK_EMPTY = """SELECT CAST(NULL AS BIGINT) AS bucket,
       CAST(NULL AS VARCHAR) AS source, CAST(NULL AS VARCHAR) AS chunk,
       CAST(NULL AS BIGINT) AS n_refs
WHERE FALSE"""
    out["chunk_novelty"] = f"""WITH {_cdc_chunks_cte()},
tagged AS (
  SELECT c.doc_id, c.chunk,
         CAST(regexp_extract(c.doc_id, '([0-9]+)$', 1) AS BIGINT) % 5 = 0
           AS is_new
  FROM (SELECT DISTINCT doc_id, chunk FROM chunks) c),
oldset AS (SELECT DISTINCT chunk FROM tagged WHERE NOT is_new)
SELECT t.doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN o.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_known_chunks,
       CAST(SUM(CASE WHEN o.chunk IS NOT NULL THEN length(t.chunk)
                     ELSE 0 END) AS BIGINT) AS known_chars
FROM tagged t LEFT JOIN oldset o ON o.chunk = t.chunk
WHERE t.is_new GROUP BY t.doc_id"""

    out["chunk_store_append_parity"] = _CHUNK_EMPTY
    out["chunk_store_remove_parity"] = _CHUNK_EMPTY
    out["chunk_store_stream_parity"] = _CHUNK_EMPTY

    out["session_paths"] = f"""WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
x AS (
  SELECT user_id, event_id, event_type, t_us,
         CASE WHEN LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) IS NULL
                OR t_us - LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
                   > {SESSION_GAP_US} THEN 1 ELSE 0 END AS is_new
  FROM e),
y AS (
  SELECT user_id, event_id, event_type, t_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM x),
p AS (
  SELECT user_id, session_idx,
         array_to_string(list(event_type ORDER BY t_us, event_id)[1:8],
                         '|') AS path
  FROM y GROUP BY user_id, session_idx)
SELECT path, COUNT(*) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 10"""

    out["event_rolling_daily"] = """WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events),
d AS (SELECT event_type, day, COUNT(*) AS n,
             CAST(SUM(v) AS BIGINT) AS sum_scaled
      FROM e GROUP BY 1, 2)
SELECT event_type, day, n, sum_scaled,
       CAST(SUM(n) OVER w AS BIGINT) AS roll_n,
       CAST(SUM(sum_scaled) OVER w AS BIGINT) AS roll_sum_scaled
FROM d
WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)"""

    out["session_duration_stats"] = f"""WITH s AS ({_SESSIONS_ORACLE}),
b AS (SELECT user_id % 4 AS cohort, t_end - t_start AS x FROM s),
r AS (SELECT cohort, x,
             ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY cohort) AS n FROM b),
m AS (SELECT cohort, MAX(n) AS n,
             CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN x ELSE 0 END)
                  + SUM(CASE WHEN rn = (n + 2) // 2 THEN x ELSE 0 END)
                  AS BIGINT) AS med2
      FROM r GROUP BY cohort),
d AS (SELECT b.cohort, ABS(2 * b.x - m.med2) AS dev FROM b
      JOIN m ON m.cohort = b.cohort),
r2 AS (SELECT cohort, dev,
              ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY dev) AS rn,
              COUNT(*) OVER (PARTITION BY cohort) AS n FROM d),
m2 AS (SELECT cohort,
              CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN dev ELSE 0 END)
                   + SUM(CASE WHEN rn = (n + 2) // 2 THEN dev ELSE 0 END)
                   AS BIGINT) AS mad2
       FROM r2 GROUP BY cohort),
fl AS (SELECT d.cohort,
              CAST(SUM(CASE WHEN 2 * d.dev > 3 * m2.mad2
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM d JOIN m2 ON m2.cohort = d.cohort GROUP BY d.cohort)
SELECT m.cohort, m.n, m.med2, m2.mad2, fl.n_outliers
FROM m JOIN m2 ON m2.cohort = m.cohort JOIN fl ON fl.cohort = m.cohort"""

    out["curation_pipeline_manifest"] = """WITH c AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, length(text) AS n_tok
  FROM documents),
keep AS (SELECT MIN(doc_id) AS doc_id FROM c GROUP BY text),
filt AS (SELECT c.doc_id, c.n_tok FROM c JOIN keep USING (doc_id)
         WHERE c.n_tok BETWEEN 150 AND 400),
off AS (SELECT doc_id, n_tok,
               COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS o
        FROM filt)
SELECT CAST(o // 5000 AS BIGINT) AS shard_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM off GROUP BY 1"""

    out["rolling_value_quantiles"] = """WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, value
  FROM events),
dom AS (SELECT DISTINCT event_type, day FROM e),
wv AS (SELECT d.event_type, d.day, e2.value,
              ROW_NUMBER() OVER (PARTITION BY d.event_type, d.day
                                 ORDER BY e2.value) AS rn,
              COUNT(*) OVER (PARTITION BY d.event_type, d.day) AS n
       FROM dom d JOIN e e2 ON e2.event_type = d.event_type
                           AND e2.day BETWEEN d.day - 6 AND d.day)
SELECT event_type, day, CAST(MAX(n) AS BIGINT) AS n_window,
       SUM(CASE WHEN rn = GREATEST((1 * n + 1) // 2, 1)
                THEN value ELSE 0 END) AS q_1_2,
       SUM(CASE WHEN rn = GREATEST((9 * n + 9) // 10, 1)
                THEN value ELSE 0 END) AS q_9_10,
       SUM(CASE WHEN rn = GREATEST((99 * n + 99) // 100, 1)
                THEN value ELSE 0 END) AS q_99_100,
       TRUE AS exact
FROM wv GROUP BY event_type, day"""

    out["label_centroid_sums"] = """WITH v AS (
  SELECT label AS grp, i - 1 AS dim,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576.0) AS BIGINT) AS x
  FROM (SELECT label, embedding,
               unnest(generate_series(1, CAST(len(embedding) AS BIGINT))) AS i
        FROM embeddings))
SELECT grp, dim, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sum_scaled
FROM v GROUP BY grp, dim"""

    out["rolling_distinct_stream_parity"] = """SELECT
  CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BIGINT) AS day,
  CAST(NULL AS BIGINT) AS n_distinct, CAST(NULL AS BIGINT) AS roll_distinct,
  CAST(NULL AS BOOLEAN) AS exact
WHERE FALSE"""

    out["rolling_heavy_users"] = """WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, user_id
  FROM events),
dom AS (SELECT DISTINCT event_type, day FROM e),
cnt AS (SELECT d.event_type, d.day, e2.user_id, COUNT(*) AS cnt
        FROM dom d JOIN e e2 ON e2.event_type = d.event_type
                            AND e2.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1, 2, 3),
tot AS (SELECT event_type, day, CAST(SUM(cnt) AS BIGINT) AS n_window
        FROM cnt GROUP BY 1, 2)
SELECT c.event_type, c.day, c.user_id, c.cnt, t.n_window
FROM cnt c JOIN tot t ON t.event_type = c.event_type AND t.day = c.day
WHERE c.cnt * 50 >= t.n_window"""

    # exact because every HLL day node is sparse at this cardinality —
    # the Spark side's `exact` column asserts the regime in-query
    out["event_rolling_distinct"] = """WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, user_id
  FROM events),
d AS (SELECT DISTINCT event_type, day FROM e)
SELECT d.event_type, d.day,
       (SELECT COUNT(DISTINCT user_id) FROM e
        WHERE e.event_type = d.event_type AND e.day = d.day) AS n_distinct,
       (SELECT COUNT(DISTINCT user_id) FROM e
        WHERE e.event_type = d.event_type
          AND e.day BETWEEN d.day - 6 AND d.day) AS roll_distinct,
       TRUE AS exact
FROM d"""
    return out


__all__ = [k for k in list(globals()) if not k.startswith('__')]
