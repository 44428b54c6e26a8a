"""Cost-based start-level selection — application-level planning, the rebuild
of the reference's optimizer (estimators/LevelCostMinimizer.java:15-55,
estimators/CostFunctionMaxProb.java, utilities/MathUtils.java:112-157).

Not a Catalyst rule: it chooses which DataFrame cascade to run (SURVEY §4.1).
All inputs are tiny broadcastable summaries: per-level index stats
(operators.build.index_stats) and per-token frequency estimates (from a CMS
or an exact frequency table).

Model (iid token model, the CostFunctionMaxProb analog):
  P(key t present in a window of span s) ~= 1 - (1 - p_t)^s, inflated by the
  level's achieved fill FPR beta_L (membership/BloomFilter.java:52-57).
  Expected surviving windows at level L:
      E[L] = n_windows(L) * prod_t min(1, hit(t, 2*span_L) + beta_L)
  (2*span because the probe unions a window with its right neighbor).
  Descending from level Lp costs
      cost(Lp) = sum_{L=Lp..deepest} probe_cost * E_probe_rows(L)
               + verify_cost * span_deepest * E[deepest]
  with E_probe_rows(Lp) = n_windows(Lp) (the seed level probes every window,
  IntervalScanner.java:43-56 seeds all 2^Lp frames) and
  E_probe_rows(L>Lp) = 2 * E[L-1] (children of survivors).

choose_start_level returns argmin — the pruningLevel/minCostLp closed form
over summaries instead of per-node descent.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def closed_form_pruning_level(
    conf: float, p_min: float, n_levels: int, tree_span: int, bloom_fpr: float = 0.0
) -> int:
    """Reference closed form (utilities/MathUtils.java:112-157): shallowest
    level whose interval is unlikely (at confidence ``conf``) to contain a
    token of probability ``p_min`` by chance, padded by the Bloom FPR."""
    for L in range(n_levels):
        span = tree_span >> L
        hit = 1.0 - (1.0 - p_min) ** span + bloom_fpr
        if hit < 1.0 - conf:
            return L
    return n_levels - 1


# SelectiveFanout heuristic constants (estimators/SelectiveFanout.java:6-10):
# the flag-gated experimental regime scales the cost model's assumed
# branching between 1 and 2 children per survivor — pricing only, never
# search soundness (the descent always probes both children + neighbor).
_SF_MIN_MULT, _SF_MAX_MULT = 1.0, 2.0
_SF_DEPTH_W, _SF_FEAS_W, _SF_COST_W = 0.4, 0.4, 0.2


def _clamp01(v: float) -> float:
    return 0.0 if v <= 0.0 else (1.0 if v >= 1.0 else v)


def selective_fanout_multiplier(
    parent_level: int,
    start_level: int,
    desc_limit: int,
    feasibility_score: float,
    cost_efficiency_score: float,
) -> float:
    """Branching multiplier in [1, 2] for the selective regime
    (estimators/SelectiveFanout.java:27-49): a weighted blend of normalized
    descent depth, per-window feasibility, and parent/child cost efficiency.
    With the regime disabled the reference always prices 2 children."""
    depth = 0.0
    if desc_limit > start_level:
        depth = max(0, parent_level - start_level) / float(desc_limit - start_level)
    score = _clamp01(
        _SF_DEPTH_W * depth
        + _SF_FEAS_W * _clamp01(feasibility_score)
        + _SF_COST_W * _clamp01(cost_efficiency_score)
    )
    return _SF_MIN_MULT + (_SF_MAX_MULT - _SF_MIN_MULT) * score


def selective_cost_efficiency(parent_cost: float, child_cost: float) -> float:
    """Normalized parent/child expected-cost ratio
    (estimators/SelectiveFanout.java:52-61)."""
    if child_cost <= 0.0:
        return 0.0
    if parent_cost <= 0.0:
        return 1.0
    return _clamp01(parent_cost / child_cost)


def ie_all_present_prob(key_probs: np.ndarray, span: int, order: int = 2) -> float:
    """P(every key appears in a window of ``span`` iid tokens) via truncated
    inclusion-exclusion over the absence events (estimators/CostFunctionIE.java:
    6-30 analog; utilities/MathUtils.java HF_* algebra).

    P(all present) = 1 - P(union of absences); absence_i has prob
    (1 - p_i)^span, joint absences multiply the complements. Odd truncation
    orders lower-bound, even orders upper-bound (Bonferroni).
    """
    from itertools import combinations

    probs = np.minimum(np.asarray(key_probs, dtype=np.float64), 1.0)
    k = len(probs)
    total = 0.0
    for r in range(1, min(order, k) + 1):
        layer = 0.0
        for subset in combinations(range(k), r):
            # joint absence of a key subset: none of their mass appears
            layer += max(0.0, 1.0 - probs[list(subset)].sum()) ** span
        total += layer if r % 2 == 1 else -layer
    return float(np.clip(1.0 - total, 0.0, 1.0))


def per_key_pruning_levels(
    stats: pd.DataFrame, key_probs: np.ndarray, conf: float = 0.95
) -> np.ndarray:
    """Per-key pruning level (search/MultiLevelPruning.java:23-32): for EACH
    pattern key independently, the shallowest present level at which a
    neighbor-union window (2*span tokens) is unlikely — at confidence
    ``conf`` — to contain the key by chance, padded by that level's achieved
    fill FPR. Rare keys land shallow (they prune big windows already);
    ubiquitous keys land at the deepest level (they never prune)."""
    levels = sorted(int(l) for l in stats["level"])
    out = np.full(len(key_probs), levels[-1], dtype=np.int64)
    for i, p in enumerate(np.minimum(np.asarray(key_probs, dtype=np.float64), 1.0)):
        for L in levels:
            row = stats[stats["level"] == L].iloc[0]
            hit = 1.0 - (1.0 - p) ** (2 * int(row["span"])) + float(row["fill_fpr"])
            if hit < 1.0 - conf:
                out[i] = L
                break
    return out


def choose_start_level_multilevel(
    stats: pd.DataFrame,
    key_probs: np.ndarray,
    pattern_len: int,
    conf: float = 0.95,
) -> tuple[int, np.ndarray]:
    """MultiLevelPruning seed choice: assign every key its own pruning level
    and seed the cascade at the MINIMUM (shallowest) of them — the rarest
    key already cuts the frontier there, long before the frequent keys'
    levels are reached. Contrast with the MostFreqPruning single-level rule
    (closed_form_pruning_level on the most frequent key), which the most
    common key drags to the deepest level on mixed-frequency patterns,
    probing every window there. Returns (start_level, per-key levels)."""
    usable = stats[stats["span"] >= max(1, pattern_len)]
    if len(usable) == 0:
        return 0, np.zeros(len(key_probs), dtype=np.int64)
    deepest = int(usable["level"].max())
    lv = per_key_pruning_levels(stats, key_probs, conf)
    return int(min(int(lv.min()), deepest)), np.minimum(lv, deepest)


def expected_survivors(
    stats: pd.DataFrame, key_probs: np.ndarray, level: int, model: str = "iid"
) -> float:
    """Expected surviving windows at a level.

    model='iid': per-key independent presence (CostFunctionMaxProb's product
    form); model='ie': truncated inclusion-exclusion over joint absences
    (CostFunctionIE) — tighter when keys share probability mass.
    """
    row = stats[stats["level"] == level].iloc[0]
    span = row["span"]
    beta = row["fill_fpr"]
    if model == "ie" and len(key_probs) <= 12:  # subsets grow combinatorially
        per_window = min(1.0, ie_all_present_prob(key_probs, 2 * int(span), order=2)
                         + beta * len(key_probs))
    else:
        hit = 1.0 - np.power(1.0 - np.minimum(key_probs, 1.0), 2 * span)
        per_window = float(np.prod(np.minimum(1.0, hit + beta)))
    return row["n_windows"] * per_window


def choose_start_level(
    stats: pd.DataFrame,
    key_probs: np.ndarray,
    pattern_len: int,
    probe_cost: float = 1.0,
    verify_cost: float = 0.25,
    model: str = "iid",
    markov=None,
    pattern: list[int] | None = None,
    selective: bool = False,
) -> int:
    """argmin over seed levels of expected probe rows + verification work.

    ``key_probs``: per-distinct-pattern-key occurrence probability (frequency
    / total tokens), from CMS estimates or an exact frequency table —
    the estimateALl role (estimators/CSEstimator.java:84-91).

    ``selective=True`` enables the SelectiveFanout regime
    (estimators/SelectiveFanout.java, flag-gated experimental in the
    reference too): the priced children-per-survivor drops from the fixed 2
    toward 1 when the descent is shallow, windows are infeasible, or the
    child level is dearer than the parent — biasing the argmin toward
    shallower seeds. Pricing only: returned matches are identical.

    model='markov' (the CostFunctionMarkov analog,
    estimators/CostFunctionMarkov.java:29-93,107-174): survivor counts come
    from the corpus bigram chain's pattern-occurrence probability instead of
    per-key iid presence — far tighter on autocorrelated corpora (the
    markov/blocks regimes), where iid badly over-prices survivors. Requires
    ``markov`` (a plans.markov.MarkovModel) and the raw token ``pattern``.
    """
    if model == "markov":
        if markov is None or pattern is None:
            raise ValueError("model='markov' requires markov= and pattern=")
        from .markov import markov_expected_survivors

        def esurv(level: int) -> float:
            return markov_expected_survivors(markov, pattern, stats, level)

    else:

        def esurv(level: int) -> float:
            return expected_survivors(stats, key_probs, level, model)

    usable = stats[stats["span"] >= max(1, pattern_len)]
    if len(usable) == 0:
        return 0
    deepest = int(usable["level"].max())
    # iterate only levels actually present in stats: a compacted index
    # (compact_index / apply_memory_policy) drops coarse levels, and a
    # missing-level lookup would otherwise raise IndexError
    present = sorted(int(l) for l in stats["level"] if int(l) <= deepest)
    if not present:
        return 0
    best_level, best_cost = present[0], math.inf
    for i, lp in enumerate(present):
        cost = probe_cost * float(stats[stats["level"] == lp].iloc[0]["n_windows"])
        e_prev = esurv(lp)
        prev_level = lp
        for L in present[i + 1 :]:
            if selective:
                # feasibility = per-window survival at the parent; cost
                # efficiency = parent/child expected-survivor ratio (the
                # HCond ratio analog, CostFunctionMaxProb.java:154-174)
                n_par = float(stats[stats["level"] == prev_level].iloc[0]["n_windows"])
                mult = selective_fanout_multiplier(
                    prev_level, lp, present[-1],
                    e_prev / max(n_par, 1.0),
                    selective_cost_efficiency(e_prev, esurv(L)),
                )
            else:
                mult = 2.0
            fanout = float(mult ** (L - prev_level))  # children per survivor across the gap
            cost += probe_cost * fanout * e_prev
            e_prev = min(fanout * e_prev, esurv(L))
            prev_level = L
        span_d = int(stats[stats["level"] == present[-1]].iloc[0]["span"])
        cost += verify_cost * span_d * e_prev
        if cost < best_cost:
            best_level, best_cost = lp, cost
    return best_level
