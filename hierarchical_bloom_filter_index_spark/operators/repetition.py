"""Intra-document repetition metrics for training-data quality filtering —
the Gopher-style repetition family (Rae et al. 2021, "Scaling Language
Models", table A1): documents dominated by one repeated phrase, or whose
character mass sits inside duplicated n-grams, are low-quality for LM
training and are filtered BEFORE tokenization pays for them.

Two metrics, both word-n-gram based and both pure integer expressions so
their DuckDB twins are value equalities (the collocations_pmi no-libm
discipline):

- ``top_ngram_stats``: per doc, the single most frequent word n-gram and
  the fraction of the doc's characters its occurrences account for
  (count * len(gram) / n_chars). Gopher filters on n = 2..4.
- ``dup_ngram_coverage``: per doc, the fraction of CHARACTER POSITIONS
  covered by at least one occurrence of a word n-gram that appears >= 2
  times in the doc — the union of occurrence spans, not the sum, so
  overlapping repeats are not double-counted (Gopher's "duplicated n-gram
  character fraction" for n = 5..10). The union is a gaps-and-islands
  merge over variable-length intervals (``merge_intervals``), the general
  form of contamination_spans' fixed-length island merge.

Word/offset semantics (shared with the DuckDB twins verbatim): words are
the RAW split of ``text`` on a single space — empty words from doubled
spaces are kept so character offsets stay an exact prefix sum
(offset(i) = sum_{j<i} len(w_j)+1); an n-gram is n consecutive raw words
joined with one space, so its char span length equals len(gram). Docs
with < n words emit nothing.

Scale: everything is O(words) rows; the only shuffles are one exchange
keyed (doc_id, gram) for the per-gram counts and one keyed doc_id for the
per-doc window/agg — no joins, no driver collects. The span generation is
ONE Arrow pass (mapInPandas): a pure-expression form existed but Spark's
only array prefix-scan (F.aggregate + concat) copies the accumulator per
step — O(words²) per doc, a straggler bomb on exactly the 200k-word
repetitive junk these filters exist to catch; the numpy cumsum is linear.
Docs with empty text or < n words emit nothing (so n_chars is never 0
downstream).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

def word_ngram_spans(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_chars, pos, gram, s, e) — one row per word n-gram
    occurrence with its 0-based char span [s, e), one linear Arrow pass,
    no shuffle. Words are the RAW single-space split (empties kept);
    offsets are the exact prefix sum of len(word)+1 (numpy cumsum).
    doc_id keeps the input column's type (the oracles compare it)."""
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    if n < 1:
        raise ValueError(f"word_ngram_spans: n must be >= 1, got {n}")
    schema = StructType([
        StructField("doc_id", docs.schema[id_col].dataType),
        StructField("n_chars", LongType()),
        StructField("pos", IntegerType()),
        StructField("gram", StringType()),
        StructField("s", LongType()),
        StructField("e", LongType()),
    ])

    def spans(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ncs, poss, grams, ss, es = [], [], [], [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if not txt:
                    continue
                ws = txt.split(" ")
                m = len(ws) - n + 1
                if m <= 0:
                    continue
                lens = np.fromiter((len(w) for w in ws), dtype=np.int64,
                                   count=len(ws))
                offs = np.empty(len(ws), dtype=np.int64)
                offs[0] = 0
                np.cumsum(lens[:-1] + 1, out=offs[1:])
                ids.extend([did] * m)
                ncs.extend([len(txt)] * m)
                poss.extend(range(m))
                grams.extend(" ".join(ws[i:i + n]) for i in range(m))
                ss.extend(offs[:m])
                es.extend(offs[n - 1:] + lens[n - 1:])
            if ids:  # empty-list frames break Arrow casts (see CLAUDE.md)
                yield pd.DataFrame({
                    "doc_id": ids, "n_chars": ncs, "pos": poss,
                    "gram": grams, "s": ss, "e": es,
                })

    return docs.select(id_col, text_col).mapInPandas(spans, schema=schema)


def top_ngram_stats(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per doc, the most frequent word n-gram (ties: gram ASC — the winner
    is a pure function of the text) and the char fraction its occurrences
    account for: (doc_id, gram, n_occ, frac_x1e6) with
    frac_x1e6 = n_occ * len(gram) * 1e6 div n_chars (integer div — exact
    on both engines). Occurrence mass can exceed n_chars when occurrences
    overlap (aaa aaa aaa…), which is exactly the repetition signal.

    Plan: n-gram explode -> one (doc, gram) count groupBy (map-side
    combined) -> per-doc row_number window. Two exchanges total."""
    rows = word_ngram_spans(docs, n, text_col, id_col)
    counts = rows.groupBy("doc_id", "n_chars", "gram").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_occ"), F.asc("gram"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            "gram",
            "n_occ",
            F.expr("n_occ * CAST(length(gram) AS BIGINT) * 1000000 div n_chars")
            .alias("frac_x1e6"),
        )
    )


def merge_intervals(
    rows: DataFrame,
    id_cols: list[str],
    s_col: str = "s",
    e_col: str = "e",
) -> DataFrame:
    """Union of half-open intervals per id group — general gaps-and-islands
    over VARIABLE-length intervals: ordered by (s, e), an interval starts a
    new island iff its s exceeds the running max of every earlier e (plain
    lag(s)+n only works for fixed-length spans, contamination_spans' case).
    Returns one row per island: (id_cols..., s, e). One exchange keyed by
    id_cols (both windows and the final groupBy share it)."""
    w = Window.partitionBy(*id_cols).orderBy(s_col, e_col)
    prev_max = F.max(e_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(
        prev_max.isNull() | (F.col(s_col) > prev_max), F.lit(1)
    ).otherwise(F.lit(0))
    with_isl = rows.withColumn("_brk", brk).withColumn(
        "_island",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_isl.groupBy(*id_cols, "_island")
        .agg(F.min(s_col).alias(s_col), F.max(e_col).alias(e_col))
        .drop("_island")
    )


def dup_ngram_coverage(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per doc, the char positions covered by word n-grams occurring >= 2
    times: (doc_id, n_chars, covered_chars, frac_x1e6), frac_x1e6 =
    covered * 1e6 div n_chars. Coverage is the UNION of occurrence spans
    (merge_intervals), so chained overlapping repeats count each char
    once and frac is always <= 1e6. Docs with no duplicated n-gram emit
    NO row — absent means zero coverage (the common case at scale; a
    filter joins this anti-style or coalesces to 0).

    Plan: occurrence rows -> per-(doc, gram) count window (exchange 1) ->
    filter count >= 2 -> island merge + per-doc sum (exchange 2; the
    islands window and the final agg share the doc_id partitioning)."""
    rows = word_ngram_spans(docs, n, text_col, id_col)
    cw = Window.partitionBy("doc_id", "gram")
    dups = rows.withColumn("_cnt", F.count(F.lit(1)).over(cw)).filter(
        F.col("_cnt") >= 2
    )
    islands = merge_intervals(
        dups.select("doc_id", "n_chars", "s", "e"), ["doc_id", "n_chars"]
    )
    return islands.groupBy("doc_id", "n_chars").agg(
        F.sum(F.col("e") - F.col("s")).alias("covered_chars")
    ).select(
        "doc_id",
        "n_chars",
        "covered_chars",
        F.expr("covered_chars * 1000000 div n_chars").alias("frac_x1e6"),
    )
