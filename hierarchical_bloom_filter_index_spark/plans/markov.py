"""First-order Markov (bigram) model over the corpus — the rebuild of the
reference's NgramModel (PMIndex/NgramModel.java:54-70+) and its Markov cost
function (estimators/CostFunctionMarkov.java:29-93).

Counts are one distributed aggregation (arrays_zip of shifted slices →
groupBy — map-side combined by Catalyst); the snapshot (PI, T) is a small
numpy pair broadcast to the planner, exactly the immutable Model snapshot of
the reference. The Markov window-hit probability replaces the iid model when
token streams are autocorrelated (e.g. the markov/blocks fixture sources):

  P(pattern occurs at a fixed position) = PI[t0] * prod_j T[t_{j-1}, t_j]
  P(window of span s contains the pattern) ~= 1 - (1 - p_occ)^(s - m + 1)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def bigram_counts(corpus: DataFrame) -> DataFrame:
    """(prev, cur, cnt) over all adjacent token pairs — pure JVM explode/agg."""
    pairs = corpus.filter(F.size("tokens") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice("tokens", 1, F.size("tokens") - 1),
                F.expr("slice(tokens, 2, size(tokens) - 1)"),
            )
        ).alias("pr")
    )
    return pairs.select(F.col("pr.0").alias("prev"), F.col("pr.1").alias("cur")).groupBy(
        "prev", "cur"
    ).agg(F.count("*").alias("cnt"))


class MarkovModel:
    """Immutable snapshot: PI (unigram probs) and T (row-normalized bigram
    transition probs) as dense numpy over the observed vocabulary."""

    def __init__(self, vocab_ids: np.ndarray, pi: np.ndarray, t: np.ndarray):
        self.vocab_ids = vocab_ids
        self._id_to_idx = {int(v): i for i, v in enumerate(vocab_ids)}
        self.pi = pi
        self.t = t

    @classmethod
    def fit(cls, corpus: DataFrame, max_vocab: int = 65536) -> "MarkovModel":
        uni = (
            corpus.select(F.explode("tokens").alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"))
            .limit(max_vocab)
            .toPandas()
        )
        vocab_ids = np.sort(uni["t"].to_numpy())
        idx = {int(v): i for i, v in enumerate(vocab_ids)}
        n = len(vocab_ids)
        pi = np.zeros(n)
        cmap = dict(zip(uni["t"], uni["c"]))
        for v in vocab_ids:
            pi[idx[int(v)]] = cmap[v]
        pi = pi / pi.sum()
        bi = bigram_counts(corpus).toPandas()
        t = np.zeros((n, n))
        known = bi["prev"].isin(idx) & bi["cur"].isin(idx)
        bi = bi[known]
        t[[idx[int(p)] for p in bi["prev"]], [idx[int(c)] for c in bi["cur"]]] = bi["cnt"]
        rows = t.sum(axis=1, keepdims=True)
        rows[rows == 0] = 1.0
        return cls(vocab_ids, pi, t / rows)

    def occurrence_prob(self, pattern: list[int]) -> float:
        """MLE probability of the exact token sequence at a fixed position
        (no smoothing, like the reference's MLE model)."""
        try:
            i0 = self._id_to_idx[int(pattern[0])]
        except KeyError:
            return 0.0
        p = self.pi[i0]
        prev = i0
        for tok in pattern[1:]:
            j = self._id_to_idx.get(int(tok))
            if j is None:
                return 0.0
            p *= self.t[prev, j]
            prev = j
        return float(p)

    def window_hit_prob(self, pattern: list[int], span: int) -> float:
        """P(a window of ``span`` tokens contains the pattern) under the
        stationary chain, iid-start approximation across positions."""
        p_occ = self.occurrence_prob(pattern)
        slots = max(1, span - len(pattern) + 1)
        return 1.0 - (1.0 - min(p_occ, 1.0)) ** slots


class NgramModel:
    """Variable-order Markov model — the reference's NgramModel with context
    backoff (PMIndex/NgramModel.java:54-70+): P(t | context) conditions on
    the LONGEST context whose count snapshot exists, backing off suffix by
    suffix down to the unigram. ``order`` is the maximum context length.

    Exposes the same ``occurrence_prob`` / ``window_hit_prob`` surface as
    MarkovModel, so ``choose_start_level(model='markov', markov=NgramModel)``
    prices survivors with it unchanged.
    """

    def __init__(self, counts: dict[tuple[int, ...], int], order: int, total: int):
        self.counts = counts
        self.order = int(order)
        self.total = max(1, int(total))

    @classmethod
    def fit(cls, corpus: DataFrame, order: int = 2, max_rows_per_n: int = 200_000) -> "NgramModel":
        """Distributed n-gram counting for n = 1..order+1 (explode of sliced
        token arrays -> groupBy, map-side combined); the snapshot keeps the
        ``max_rows_per_n`` most frequent grams per n so the driver state is
        bounded regardless of corpus size (missing grams back off)."""
        counts: dict[tuple[int, ...], int] = {}
        for n in range(1, order + 2):
            grams = corpus.filter(F.size("tokens") >= n).select(
                F.explode(
                    F.expr(f"transform(sequence(0, size(tokens) - {n}), i -> slice(tokens, i + 1, {n}))")
                ).alias("g")
            )
            rows = (
                grams.groupBy("g").agg(F.count("*").alias("c"))
                .orderBy(F.desc("c"))
                .limit(max_rows_per_n)
                .collect()
            )
            for r in rows:
                counts[tuple(int(t) for t in r["g"])] = int(r["c"])
        # exact corpus-wide unigram total (= token count), NOT the sum of the
        # kept top-K rows: on a large vocabulary the truncated sum understates
        # the denominator, inflating every unigram/backoff probability and
        # silently biasing choose_start_level toward deeper seeds
        total = int(corpus.agg(F.sum(F.size("tokens"))).first()[0] or 0)
        return cls(counts, order, total)

    def cond_prob(self, context: tuple[int, ...], t: int) -> float:
        """MLE P(t | context) with longest-context backoff."""
        for L in range(min(self.order, len(context)), 0, -1):
            ctx = tuple(context[-L:])
            den = self.counts.get(ctx)
            if den:
                num = self.counts.get(ctx + (int(t),))
                if num:
                    return num / den
                # context seen but continuation unseen: back off to a shorter
                # context rather than declaring impossibility (snapshot is topK)
        return self.counts.get((int(t),), 0) / self.total

    def occurrence_prob(self, pattern: list[int]) -> float:
        if not pattern:
            return 0.0
        p = self.counts.get((int(pattern[0]),), 0) / self.total
        for i in range(1, len(pattern)):
            if p == 0.0:
                return 0.0
            p *= self.cond_prob(tuple(int(x) for x in pattern[:i]), int(pattern[i]))
        return float(min(p, 1.0))

    def window_hit_prob(self, pattern: list[int], span: int) -> float:
        p_occ = self.occurrence_prob(pattern)
        slots = max(1, span - len(pattern) + 1)
        return 1.0 - (1.0 - min(p_occ, 1.0)) ** slots


def markov_expected_survivors(model, pattern: list[int], stats: pd.DataFrame, level: int) -> float:
    """Expected surviving windows at a level under a chain model (MarkovModel
    or variable-order NgramModel — anything with window_hit_prob) — the
    CostFunctionMarkov analog of plans.cost.expected_survivors."""
    row = stats[stats["level"] == level].iloc[0]
    hit = model.window_hit_prob(pattern, 2 * int(row["span"])) + float(row["fill_fpr"])
    return float(row["n_windows"]) * min(1.0, hit)
