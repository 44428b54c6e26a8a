"""Cost-model confidence report — the ConfidenceExperiment analog.

The reference's ConfidenceExperiment (ConfidenceExperiment.java:40-77)
reports how well the cost model's predicted probe counts track reality
(MAPE + over-estimation rate).  test_confidence covers the RANKING
property (rare < common, markov tighter on blocks); this script closes
the evidence asymmetry by reporting the same aggregate numbers on the
sf0.1 corpus for all three survivor models:

  iid    — CostFunctionMaxProb product form
  ie     — truncated inclusion-exclusion (order 2)
  markov — corpus bigram chain (CostFunctionMarkov)

Protocol: 12 deterministic patterns (substrings lifted from corpus docs
at spread offsets — mixed common/rare mass), each searched with
start_level=0 so the cascade records ACTUAL survivors at every level;
predictions come from the same per-key CMS-free exact frequency table
the planner uses.  Per (model, level):

  MAPE    = mean |pred - act| / max(act, 1)
  over%   = fraction of cases with pred >= act  (the model is meant to
            over-estimate: an under-estimate seeds too deep and probes
            every window there)

Writes BENCH/confidence_mape_r05.json + a markdown table for
BENCH/BASELINE.md.

Usage: python scripts/measure_confidence_mape.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(ROOT, "BENCH", "confidence_mape_r05.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PATTERNS = 12
PAT_LEN = 12


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hbi-confidence-mape")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from hierarchical_bloom_filter_index_spark.operators import (
        frequency_summary, index_stats, pattern_keys, pattern_search)
    from hierarchical_bloom_filter_index_spark.plans.cost import (
        expected_survivors)
    from hierarchical_bloom_filter_index_spark.plans.markov import (
        MarkovModel, markov_expected_survivors)

    corp = E._corpus(spark, SF_DIR)
    idx = E._index(spark, SF_DIR)
    stats = index_stats(idx, E.CFG)
    freq = frequency_summary(corp, E.CFG)
    mk = MarkovModel.fit(corp)

    # deterministic mixed-frequency patterns: doc i*97's tokens at offset
    # (i*31) % 200 — substrings of real corpus text, so every pattern has
    # true matches and a realistic key-probability profile
    rows = (corp.filter(F.col("n_tok") >= 256).orderBy("doc_id")
            .limit(N_PATTERNS * 97).collect())
    pats = []
    for i in range(N_PATTERNS):
        r = rows[min(i * 97, len(rows) - 1)]
        off = (i * 31) % 200
        pats.append([int(t) for t in r["tokens"][off:off + PAT_LEN]])

    levels = sorted(int(l) for l in stats["level"])
    acc: dict[str, dict[int, list[tuple[float, float]]]] = {
        m: {L: [] for L in levels} for m in ("iid", "ie", "markov")}

    t_all = time.time()
    for i, pat in enumerate(pats):
        keys, _ = pattern_keys(pat, E.CFG)
        probs = freq.estimate(keys.astype(np.int64)) / max(1, freq.total)
        sout: dict = {}
        pattern_search(corp, idx, E.CFG, pat, start_level=0,
                       stats_out=sout).count()
        for L in levels:
            act = float(sout["survivors"].get(L, 0))
            for model in ("iid", "ie"):
                pred = float(expected_survivors(stats, probs, L, model))
                acc[model][L].append((pred, act))
            predm = float(markov_expected_survivors(mk, pat, stats, L))
            acc["markov"][L].append((predm, act))
        print(f"# pattern {i}: actual per level "
              f"{ {L: sout['survivors'].get(L, 0) for L in levels} }")

    report: dict[str, dict] = {}
    for model, per_level in acc.items():
        report[model] = {}
        for L, pairs in per_level.items():
            preds = np.array([p for p, _ in pairs])
            acts = np.array([a for _, a in pairs])
            ape = np.abs(preds - acts) / np.maximum(acts, 1.0)
            report[model][str(L)] = {
                "mape": round(float(ape.mean()), 3),
                "over_rate": round(float((preds >= acts).mean()), 3),
                "mean_pred": round(float(preds.mean()), 1),
                "mean_actual": round(float(acts.mean()), 1),
            }

    payload = {
        "sf_dir": SF_DIR, "n_patterns": N_PATTERNS, "pat_len": PAT_LEN,
        "sec_total": round(time.time() - t_all, 1),
        "per_model_per_level": report,
    }
    with open(OUT_JSON, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"# wrote {OUT_JSON}")

    print("\n| model | level | MAPE | over-est rate | mean pred | mean actual |")
    print("|---|---|---|---|---|---|")
    for model in ("iid", "ie", "markov"):
        for L in levels:
            r = report[model][str(L)]
            print(f"| {model} | {L} | {r['mape']} | {r['over_rate']} "
                  f"| {r['mean_pred']} | {r['mean_actual']} |")
    spark.stop()


if __name__ == "__main__":
    main()
