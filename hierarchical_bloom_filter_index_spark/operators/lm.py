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


# ---------------------------------------------------------------------------
# persisted model + incremental scoring: train once on the corpus, score
# every future ingestion batch / stream against the FIXED model — the
# quality-filter twin of the incremental dedup/novelty surfaces
# ---------------------------------------------------------------------------
def _words_col(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda w: w != F.lit(""))


def _bigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(a, b, c): exact bigram counts of the corpus word stream — one
    explode into one map-side-combined groupBy."""
    base = docs.select(_words_col(text_col).alias("ws")).filter(F.size("ws") >= 2)
    pairs = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i.cast("int")).alias("a"),
                    F.element_at("ws", (i + 1).cast("int")).alias("b")))
        ).alias("p")
    ).select("p.a", "p.b")
    return pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, c): exact word OCCURRENCE counts — kept alongside the bigram
    table so removals can maintain the vocabulary exactly (a distinct-count
    alone cannot tell whether a removed doc's word survives elsewhere)."""
    return (docs.select(F.explode(_words_col(text_col)).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("c")))


def _write_lm_meta(spark, path: str, alpha: float, cap: int) -> dict:
    """Recompute meta from the stored tables (vocab = words rows,
    distinct_bigrams = bigram rows) and overwrite ``path/meta``."""
    v = spark.read.parquet(f"{path}/words").count()
    n_bigrams = spark.read.parquet(f"{path}/bigrams").count()
    spark.createDataFrame(
        [(float(alpha), int(cap), int(v), int(n_bigrams))],
        "alpha double, cap long, vocab long, distinct_bigrams long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    return {"vocab": int(v), "distinct_bigrams": int(n_bigrams),
            "kept_bigrams": min(int(cap), int(n_bigrams)),
            "dropped_bigrams": max(0, int(n_bigrams) - int(cap)),
            "alpha": float(alpha)}


def write_lm_model(
    docs: DataFrame,
    path: str,
    alpha: float = 0.5,
    cap: int = 1 << 20,
    text_col: str = "text",
) -> dict:
    """Persist the bigram model: ``path/bigrams`` holds the FULL exact
    (a, b, c) count table and ``path/words`` the exact word-occurrence
    table (both distributed parquet writes — no driver collect at write
    time; the deterministic ``cap`` is applied at READ, where the scorer's
    broadcast table is built), ``path/meta`` pins (alpha, cap, vocab,
    distinct_bigrams) — readers NEVER take model parameters from callers
    (the write_minhash_index discipline: a mismatched alpha would silently
    change every score). Returns the stats dict."""
    spark = docs.sparkSession
    _bigram_counts(docs, text_col).write.mode("overwrite").parquet(f"{path}/bigrams")
    _word_counts(docs, text_col).write.mode("overwrite").parquet(f"{path}/words")
    return _write_lm_meta(spark, path, alpha, cap)


def read_lm_model(spark, path: str) -> tuple[dict[tuple[str, str], float], dict]:
    """({(a, b): ln P(b|a)}, meta) from a ``write_lm_model`` layout —
    byte-identical to train_bigram_lm on the same corpus: the cap is the
    same deterministic cut (count DESC, pair ASC), c1 sums the KEPT pairs,
    and ln runs driver-side on the same integers (glibc, bit-stable)."""
    m = spark.read.parquet(f"{path}/meta").first()
    alpha, cap, v = float(m["alpha"]), int(m["cap"]), int(m["vocab"])
    rows = (spark.read.parquet(f"{path}/bigrams")
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(cap).collect())
    c2d = {(r["a"], r["b"]): int(r["c"]) for r in rows}
    c1d: dict[str, int] = {}
    for (a, _), c in c2d.items():
        c1d[a] = c1d.get(a, 0) + c
    lp = {
        (a, b): math.log((c + alpha) / (c1d[a] + alpha * v))
        for (a, b), c in c2d.items()
    }
    stats = {"vocab": v, "distinct_bigrams": int(m["distinct_bigrams"]),
             "kept_bigrams": len(rows),
             "dropped_bigrams": int(m["distinct_bigrams"]) - len(rows),
             "alpha": alpha}
    return lp, {"stats": stats, "c1": c1d, "v": v, "alpha": alpha}


def score_against_lm(
    spark,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """INCREMENTAL quality scoring: an ingestion batch scored against the
    PERSISTED model — the corpus is never re-counted per batch. Unseen
    bigrams score the smoothed closed form (c2 = 0 with the stored
    context's c1, or 0 for an unseen context), so scores are a pure
    function of (batch text, stored model) — batch-boundary independent by
    construction, and SQL-oracle-checkable (ln is glibc-shared, the
    fixed-point sum order-free)."""
    lp, meta = read_lm_model(spark, path)
    return doc_lm_scores(docs, lp, meta, text_col, id_col)


def lm_score_stream(
    stream_docs: DataFrame,
    model_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Structured-Streaming twin of score_against_lm: each arriving
    micro-batch scored against the persisted model, scores appended via the
    shared replay-guarded sink. The model is read ONCE (driver) and its
    broadcast reused across batches. Returns the StreamingQuery."""
    from ..streaming.incremental import replay_guarded_append

    spark = stream_docs.sparkSession
    lp, meta = read_lm_model(spark, model_path)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        replay_guarded_append(
            out_path, batch_df, batch_id,
            lambda b: doc_lm_scores(b, lp, meta, text_col, id_col),
        )

    return (
        stream_docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# model lifecycle maintenance: count tables are ASSOCIATIVE, so append is a
# keywise sum and removal a keywise subtraction — an appended (or removed-
# then-complement) model is BYTE-IDENTICAL to retraining from scratch, the
# hardest parity gate available (the gram-df index discipline)
# ---------------------------------------------------------------------------
def _merge_lm_table(spark, path: str, sub: str, delta: DataFrame,
                    keys: list[str], sign: int, what: str) -> None:
    """Keywise signed merge of a stored count table with a delta: read the
    current table, sum counts (delta negated for removals), REFUSE negative
    results (removing docs never trained on would silently corrupt every
    future score), drop exact zeros, localCheckpoint the merged frame
    BEFORE the overwrite (Spark refuses to overwrite a path still feeding
    the live plan — the append_gram_df_index lesson)."""
    cur = spark.read.parquet(f"{path}/{sub}")
    merged = (
        cur.unionByName(delta.withColumn("c", F.col("c") * sign))
        .groupBy(*keys).agg(F.sum("c").alias("c"))
    )
    neg = merged.filter(F.col("c") < 0).limit(1).collect()
    if neg:
        raise ValueError(
            f"{what}: removal would drive a {sub} count below zero "
            f"(e.g. {tuple(neg[0])}) — the removed docs were not all part "
            f"of the trained model")
    keep = merged.filter(F.col("c") > 0).localCheckpoint()
    keep.write.mode("overwrite").parquet(f"{path}/{sub}")


def append_lm_model(docs: DataFrame, path: str, text_col: str = "text") -> dict:
    """PLANNED MAINTENANCE: fold a new doc batch's exact counts into the
    persisted model — keywise sums, so the result is IDENTICAL to
    retraining on the union (tested as table equality, the strongest gate).
    alpha/cap stay pinned; meta's vocab/distinct are recomputed. NOT
    replay-idempotent (appending the same batch twice double-counts) — the
    streaming-scoring path never writes the model; maintenance is an
    explicit operation, like append_gram_df_index."""
    spark = docs.sparkSession
    m = spark.read.parquet(f"{path}/meta").first()
    _merge_lm_table(spark, path, "bigrams", _bigram_counts(docs, text_col),
                    ["a", "b"], 1, "append_lm_model")
    _merge_lm_table(spark, path, "words", _word_counts(docs, text_col),
                    ["w"], 1, "append_lm_model")
    return _write_lm_meta(spark, path, float(m["alpha"]), int(m["cap"]))


def remove_lm_model(docs: DataFrame, path: str, text_col: str = "text") -> dict:
    """TAKEDOWN for the LM artifact (right-to-be-forgotten): subtract the
    removed docs' exact counts — the result is IDENTICAL to retraining on
    the complement. A word used elsewhere survives with its remaining
    occurrences (the words table is occurrence counts, not a distinct set,
    precisely so vocabulary maintenance is exact); counts hitting zero drop
    out; a count going NEGATIVE refuses loudly (the docs were never in the
    model). alpha/cap stay pinned; meta recomputed."""
    spark = docs.sparkSession
    m = spark.read.parquet(f"{path}/meta").first()
    _merge_lm_table(spark, path, "bigrams", _bigram_counts(docs, text_col),
                    ["a", "b"], -1, "remove_lm_model")
    _merge_lm_table(spark, path, "words", _word_counts(docs, text_col),
                    ["w"], -1, "remove_lm_model")
    return _write_lm_meta(spark, path, float(m["alpha"]), int(m["cap"]))
