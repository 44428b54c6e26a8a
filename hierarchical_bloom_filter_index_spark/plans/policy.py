"""Memory policies — the rebuild of REACTIVE/PREDICTIVE coarse-level dropping
(PMIndex/HBI.java:288-337, utilities/Utils.java MemPolicy enum).

The reference samples a low quantile of token frequency with HOPS, computes
the level at which filters stop paying for themselves, and drops coarser
levels (tree/ImplicitTree.java:112-122). Here the same decision is a pure
function of (per-level stats, frequency summary, sampler) and its application
is a predicate on the sketch table (operators.build.compact_index):

* REACTIVE:  decide from the CURRENT index stats + token-frequency summary.
* PREDICTIVE: decide once from a sampler/summary and build future indexes
  with fewer levels up front (config.with_(tree_span= / leaf_span=) or
  compact-at-write).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .cost import closed_form_pruning_level


def low_quantile_token_prob(freq, sampler, q: float = 0.05) -> float:
    """The q-quantile of per-token occurrence probability, estimated from a
    sampler's distinct-token representatives scored by the CMS — the HOPS
    sampling step of the reactive policy (PMIndex/HBI.java:288-323)."""
    reps = sampler.representatives() if hasattr(sampler, "representatives") else sampler.sample()
    if len(reps) == 0:
        return 0.0
    counts = freq.estimate(reps.astype(np.int64)).astype(np.float64)
    probs = counts / max(1, freq.total)
    return float(np.quantile(probs, q))


def choose_drop_level(
    stats: pd.DataFrame,
    p_low: float,
    conf: float = 0.95,
) -> int:
    """Smallest level worth keeping: coarser levels (level < lp) reject
    almost nothing for tokens at/above probability ``p_low`` (their windows
    are so wide that even rare tokens hit them), so their filters are memory
    without benefit. Uses the closed-form pruning level with the achieved
    fill FPR (utilities/MathUtils.java:112-157)."""
    n_levels = len(stats)
    tree_span = int(stats["span"].max())
    beta = float(stats["fill_fpr"].mean())
    return closed_form_pruning_level(conf, max(p_low, 1e-12), n_levels, tree_span, beta)


def apply_memory_policy(index, stats: pd.DataFrame, freq, sampler, q: float = 0.05, conf: float = 0.95):
    """REACTIVE policy end-to-end: sample -> quantile -> lp -> compaction.
    Returns (compacted_index, lp)."""
    from ..operators.build import compact_index

    p_low = low_quantile_token_prob(freq, sampler, q)
    lp = choose_drop_level(stats, p_low, conf)
    return compact_index(index, lp), lp


def predictive_drop_level(cfg, freq, sampler, q: float = 0.05, conf: float = 0.95) -> int:
    """PREDICTIVE policy decision: choose lp from a frequency summary +
    sampler of a PRIOR corpus sample, BEFORE any index exists — the closed
    form uses the design FPR since no achieved fill is measurable yet
    (PMIndex/HBI.java:288-337 MemPolicy.PREDICTIVE)."""
    p_low = low_quantile_token_prob(freq, sampler, q)
    return closed_form_pruning_level(conf, max(p_low, 1e-12), cfg.n_levels, cfg.tree_span, cfg.fpr)


def predictive_build(corpus, cfg, freq, sampler, q: float = 0.05, conf: float = 0.95):
    """PREDICTIVE policy end-to-end: the dropped coarse levels are NEVER
    BUILT — the data pass hashes and scatters only levels >= lp (vs
    REACTIVE's build-everything-then-filter). Returns (index, lp); the index
    rows equal compact_index(build_index(corpus, cfg), lp) exactly.
    """
    from ..operators.build import _build_doc_axis, _build_global_axis

    lp = predictive_drop_level(cfg, freq, sampler, q, conf)
    levels = [L for L in cfg.levels if L >= lp]
    builder = _build_doc_axis if cfg.axis == "doc" else _build_global_axis
    return builder(corpus, cfg, levels=levels), lp
