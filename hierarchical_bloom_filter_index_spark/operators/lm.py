"""N-gram language-model scoring: the CCNet/Gopher-style perplexity
quality filter. Score every document by its mean log-probability under
an add-alpha-smoothed bigram model — low scores flag boilerplate,
gibberish, and off-distribution text before training.

Determinism contract (the word-BM25 discipline, data-dependent twist):
the model is exact integer COUNT tables (one groupBy each); every
distinct bigram's log-probability is computed ONCE, driver-side, with
Python's glibc ln (bit-equal to DuckDB's ln — verified on this box, see
text.bm25_topk_docs), then FIXED-POINT scaled to integer nano-units via
floor(lp * 1e9 + 0.5) — identical doubles -> identical integers — so
per-doc sums are ORDER-FREE integer adds (a float fold would hostage the
oracle to each engine's summation association; DuckDB window sums may
use segment trees). The twin is a plain integer SUM — value equality.

Scale shape: counts are two map-side-combined groupBys over one explode;
the model table is vocabulary-squared-bounded and collected driver-side
under a deterministic cap (count DESC, pair ASC — reported, never
silent, the bpe_train discipline); scoring is one broadcast-lookup Arrow
pass, zero shuffles.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def train_bigram_lm(
    docs: DataFrame,
    alpha: float = 0.5,
    cap: int = 1 << 20,
    text_col: str = "text",
) -> tuple[dict[tuple[str, str], float], dict]:
    """({(a, b): ln P(b|a)}, stats) — an add-alpha bigram model from the
    corpus word stream. P(b|a) = (c2(a,b) + alpha) / (c1(a) + alpha * V)
    where c1 is the LEFT-CONTEXT count (sum of c2 over b — every pair
    position counts once) and V the corpus distinct-word count. ``cap``
    bounds the collected table (top bigrams by count then pair asc;
    drops reported in stats). Scoring an UNSEEN bigram uses c2 = 0 with
    the context's c1 (or 0 for an unseen context) — the same closed
    form, so the model generalizes to new text."""
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != F.lit(""))
    base = docs.select(ws.alias("ws")).filter(F.size("ws") >= 2)
    pairs = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i.cast("int")).alias("a"),
                    F.element_at("ws", (i + 1).cast("int")).alias("b")))
        ).alias("p")
    ).select("p.a", "p.b")
    c2 = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    n_bigrams = c2.count()
    rows = (c2.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(int(cap)).collect())
    v = (docs.select(F.explode(ws).alias("w"))
         .agg(F.countDistinct("w")).first()[0])
    c2d = {(r["a"], r["b"]): int(r["c"]) for r in rows}
    c1d: dict[str, int] = {}
    for (a, _), c in c2d.items():
        c1d[a] = c1d.get(a, 0) + c
    lp = {
        (a, b): math.log((c + alpha) / (c1d[a] + alpha * v))
        for (a, b), c in c2d.items()
    }
    stats = {"vocab": int(v), "distinct_bigrams": int(n_bigrams),
             "kept_bigrams": len(rows),
             "dropped_bigrams": int(n_bigrams) - len(rows),
             "alpha": float(alpha)}
    return lp, {"stats": stats, "c1": c1d, "v": int(v), "alpha": float(alpha)}


def doc_lm_scores(
    docs: DataFrame,
    lp: dict[tuple[str, str], float],
    model_meta: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_pairs, logprob, avg_logprob): per-document bigram
    log-likelihood under a trained model — the quality-filter signal
    (compose with sampling.drop_bottom_quantile for the actual cut).
    One broadcast-lookup Arrow pass, zero shuffles; per-pair logprobs are
    integer nano-units (floor(lp * 1e9 + 0.5)), so the per-doc sum is an
    ORDER-FREE exact bigint and avg uses integer div. Documents with
    < 2 words score no pairs and are omitted (no bigram evidence either
    way)."""
    spark = docs.sparkSession
    c1 = model_meta["c1"]
    v, alpha = model_meta["v"], model_meta["alpha"]
    scaled = {k: int(math.floor(x * 1e9 + 0.5)) for k, x in lp.items()}
    bc = spark.sparkContext.broadcast((scaled, c1, v, alpha))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lpm, c1m, vv, al = bc.value
        miss: dict[tuple[str, str], int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, ns, sums = [], [], []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                wsl = [w for w in t.split(" ") if w]
                if len(wsl) < 2:
                    continue
                s = 0
                for a, b in zip(wsl, wsl[1:]):
                    got = lpm.get((a, b))
                    if got is None:
                        got = miss.get((a, b))
                        if got is None:
                            # unseen bigram: c2 = 0, same closed form
                            got = miss[(a, b)] = int(math.floor(
                                math.log(al / (c1m.get(a, 0) + al * vv))
                                * 1e9 + 0.5))
                    s = s + got
                ids.append(did)
                ns.append(len(wsl) - 1)
                sums.append(s)
            yield pd.DataFrame(
                {"doc_id": ids, "n_pairs": ns, "s": sums})

    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"))
    raw = base.mapInPandas(
        score, schema="doc_id string, n_pairs int, s long")
    return raw.select(
        "doc_id", "n_pairs",
        F.col("s").alias("logprob_x1e9"),
        F.expr("s div n_pairs").alias("avg_logprob_x1e9"))
