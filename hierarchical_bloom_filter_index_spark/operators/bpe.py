"""Byte-pair-encoding tokenizer: train / encode / decode at corpus scale.

The missing piece between the corpus and a training run: learn a subword
vocabulary from the data, tokenize every document with it. The design
follows how subword-nmt / sentencepiece actually train — BPE statistics
are a pure function of the WORD-FREQUENCY TABLE, not the raw corpus, so:

- ``bpe_train``: ONE distributed groupBy produces (word, count); the
  merge loop runs driver-side over that table (bounded by ``vocab_cap``
  top words — at 100 TB the distinct-word table is millions of rows while
  the corpus is trillions of tokens, so this is the standard shape, and
  the cap rule is deterministic: count DESC, word ASC, never silent —
  the return reports how many words were dropped).
- ``bpe_encode``: distributed mapInPandas applying the merge ranks per
  word with a per-task word->tokens memo (Zipf makes the memo hit rate
  ~= 1); no shuffle, tokens stay with their doc.
- ``bpe_decode``: exact inverse on single-space text by construction
  (merges only ever concatenate characters of the word), which gives the
  driver a HARD round-trip gate: decode(encode(text)) == text.

Word semantics = RAW single-space split, the corpus-wide discipline
(operators/text.py). Merge tie-break: highest pair count, then
lexicographically smallest pair — training is a pure function of the
word table.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _train_merges_local(word_counts: list[tuple[str, int]],
                        n_merges: int) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a weighted word table. Deterministic:
    ties break to the lexicographically smallest (left, right) pair."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        if w:
            vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym)
                        and sym[i] == best[0] and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (the standard BPE encode:
    repeatedly merge the lowest-ranked pair present, left to right)."""
    sym = list(word)
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(sym, sym[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge EVERY occurrence of that pair, left to right
        pair = (sym[best_i], sym[best_i + 1])
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                out.append(sym[i] + sym[i + 1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_train(
    docs: DataFrame,
    n_merges: int = 200,
    vocab_cap: int = 65536,
    text_col: str = "text",
) -> tuple[list[tuple[str, str]], dict]:
    """Learn ``n_merges`` BPE merges from the corpus word-frequency table.
    Returns (merges, stats) where stats records the table size and how
    many distinct words the cap dropped (never silent). The only
    distributed work is one map-side-combined groupBy; the merge loop is
    driver-side over at most ``vocab_cap`` rows."""
    if n_merges < 1 or vocab_cap < 1:
        raise ValueError("bpe_train: n_merges and vocab_cap must be >= 1")
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != F.lit(""))
    wc = (
        docs.select(F.explode(ws).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_distinct = wc.count()
    top = (
        wc.orderBy(F.desc("cnt"), F.asc("word")).limit(int(vocab_cap))
        .collect()
    )
    merges = _train_merges_local(
        [(r["word"], int(r["cnt"])) for r in top], n_merges)
    stats = {"distinct_words": int(n_distinct),
             "trained_on": len(top),
             "dropped_words": int(n_distinct) - len(top),
             "n_merges": len(merges)}
    return merges, stats


def _encode_fn(bc, per_word: bool):
    """The shared Arrow encode kernel: per-task word->tokens memo (Zipf
    makes the hit rate ~= 1); flat token stream or per-word lists."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for t in pdf["text"]:
                per = []
                for w in t.split(" "):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, rk)
                    per.append(got)
                rows.append(per)
            if per_word:
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "words": rows})
            else:
                flat = [[s for w in per for s in w] for per in rows]
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "tokens": flat,
                    "n_tokens": [len(x) for x in flat]})

    return enc


def _encode_base(docs, merges, text_col, id_col, per_word: bool):
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    bc = docs.sparkSession.sparkContext.broadcast(ranks)
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"))
    schema = ("doc_id string, words array<array<string>>" if per_word else
              "doc_id string, tokens array<string>, n_tokens int")
    return base.mapInPandas(_encode_fn(bc, per_word), schema=schema)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, tokens array<string>, n_tokens): every document tokenized
    with the learned merges. One Arrow pass, zero shuffles. Unseen
    characters/words fall back to finer segmentation automatically (BPE
    degrades gracefully — worst case single characters), so encode NEVER
    fails on new text."""
    return _encode_base(docs, merges, text_col, id_col, per_word=False)


def bpe_encode_words(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, words array<array<string>>): per-word token lists — the
    boundary-preserving form whose exact inverse is
    ``' '.join(''.join(w) for w in words)`` (bpe_decode). Same Arrow pass
    as bpe_encode."""
    return _encode_base(docs, merges, text_col, id_col, per_word=True)


def bpe_decode(encoded: DataFrame) -> DataFrame:
    """(doc_id, text): the exact inverse of bpe_encode_words, computed
    JVM-side — concat subwords within each word, join words with single
    spaces. decode(encode(t)) == t for any single-spaced text, learned
    merges or not (merges only regroup characters)."""
    return encoded.select(
        "doc_id",
        F.array_join(
            F.transform("words", lambda w: F.array_join(w, "")), " "
        ).alias("text"))


def write_bpe_model(spark, path: str, merges: list[tuple[str, str]],
                    stats: dict | None = None) -> None:
    """Persist a trained BPE model: ``path/merges`` = (rank, left, right)
    parquet (rank IS the application priority — readers must preserve
    it), ``path/meta`` = the training stats. A tokenizer is a CONTRACT:
    every later encode (ingest streams, new shards) must reuse the
    pinned merges or token ids drift — the write_minhash_index
    discipline."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/merges")
    st = stats or {}
    spark.createDataFrame(
        [(int(st.get("distinct_words", -1)), int(st.get("trained_on", -1)),
          int(st.get("dropped_words", -1)), len(merges))],
        "distinct_words long, trained_on long, dropped_words long, "
        "n_merges int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def read_bpe_model(spark, path: str) -> list[tuple[str, str]]:
    """The pinned merge list, rank order restored."""
    rows = spark.read.parquet(f"{path}/merges").orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]


def bpe_encode_stream(
    stream: DataFrame,
    model_path: str,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """INGEST-TIME tokenization: arriving doc files encoded per
    micro-batch with the PINNED merges from ``model_path``
    (write_bpe_model — the tokenizer contract: every batch must use the
    same merges or token ids drift), appended via the shared replay
    guard. Encoding is stateless per doc, so the output minus batch_id
    equals the batch encode of everything ingested. Returns the started
    availableNow query."""
    from ..streaming.incremental import replay_guarded_append

    spark = stream.sparkSession
    merges = read_bpe_model(spark, model_path)

    def _do(batch_df: DataFrame) -> DataFrame:
        return bpe_encode(batch_df, merges, text_col=text_col,
                          id_col=id_col)

    return (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: replay_guarded_append(out_path, bdf, bid, _do)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
