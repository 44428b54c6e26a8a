"""Per-sketch error-bound compliance at $SPARK_GRAFT_SF_DIR (BASELINE.json
headline: "per-sketch error-bound compliance (Bloom FPR, CMS eps, HLL/KLL
rel-err) ... at SF=0.1"). Runs each sketch through the REAL distributed
two-phase aggregation over the documents-derived corpus and checks its
estimate against the exact Spark aggregation. Prints one JSON line.

Usage: python verify_bounds.py
"""

from __future__ import annotations

import json
import os

import numpy as np


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hierarchical_bloom_filter_index_spark import corpus as C
    from hierarchical_bloom_filter_index_spark.operators.aggregates import (
        collect_sketch,
        sketch_aggregate,
    )
    from hierarchical_bloom_filter_index_spark.sketches import (
        BloomFilter,
        CountMinSketch,
        HyperLogLog,
        KLL,
        TDigest,
    )

    corp = C.corpus_from_documents(spark, sf_dir).cache()
    tokens = corp.select(F.explode("tokens").alias("t")).cache()
    n_total = tokens.count()
    exact_counts = {r["t"]: r["c"] for r in tokens.groupBy("t").agg(F.count("*").alias("c")).collect()}
    exact_distinct = len(exact_counts)
    lens = np.sort(np.asarray([r["n_tok"] for r in corp.select("n_tok").collect()]))
    out: dict = {"sf_dir": sf_dir, "n_tokens": int(n_total), "n_distinct": exact_distinct}

    # Bloom: distributed build over distinct tokens, empirical FPR on absent keys
    p = 0.01
    bloom = collect_sketch(
        sketch_aggregate(corp, "tokens",
                         lambda: BloomFilter.for_capacity(max(exact_distinct, 64), p, seed=1),
                         values_are_arrays=True)
    )
    present = np.asarray(list(exact_counts), dtype=np.int64)
    absent = np.arange(10_000, 60_000, dtype=np.int64)
    absent = absent[~np.isin(absent, present)]
    fpr = float(bloom.contains(absent).mean())
    out["bloom"] = {"configured_fpr": p, "empirical_fpr": round(fpr, 6),
                    "false_negatives": int((~bloom.contains(present)).sum()),
                    "pass": bool(fpr <= 1.5 * p and bloom.contains(present).all())}

    # CMS: overestimate-only within eps*N
    eps, delta = 0.001, 0.01
    cms = collect_sketch(
        sketch_aggregate(corp, "tokens",
                         lambda: CountMinSketch.from_eps_delta(eps, delta, seed=2),
                         values_are_arrays=True)
    )
    keys = present
    est = cms.estimate(keys)
    true = np.asarray([exact_counts[k] for k in keys])
    under = int((est < true).sum())
    viol = float((est - true > eps * n_total).mean())
    out["cms"] = {"eps": eps, "delta": delta, "underestimates": under,
                  "viol_rate": round(viol, 6), "pass": bool(under == 0 and viol <= delta)}

    # HLL: within the 1.04/sqrt(m) envelope (4 sigma)
    hll = collect_sketch(
        sketch_aggregate(corp, "tokens", lambda: HyperLogLog(p=14, seed=3), values_are_arrays=True)
    )
    rel = abs(hll.estimate() - exact_distinct) / exact_distinct
    out["hll"] = {"estimate": round(hll.estimate(), 1), "exact": exact_distinct,
                  "rel_err": round(rel, 6), "bound_4sigma": round(4 * hll.rel_error(), 6),
                  "pass": bool(rel <= 4 * hll.rel_error())}

    # KLL / t-digest: tie-aware rank error at fixture quantiles
    kll = collect_sketch(sketch_aggregate(corp, "n_tok", lambda: KLL(k=200, seed=4)))
    td = collect_sketch(sketch_aggregate(corp, "n_tok", lambda: TDigest(delta=100)))
    n = len(lens)
    for name, sk, bound in (("kll", kll, 0.02), ("tdigest", td, 0.02)):
        worst = 0.0
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            v = sk.quantile(q)
            lo = np.searchsorted(lens, v, side="left") / n
            hi = np.searchsorted(lens, v, side="right") / n
            err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
            worst = max(worst, err)
        out[name] = {"worst_rank_err": round(worst, 6), "bound": bound, "pass": bool(worst <= bound)}

    # KS distance between two KLL sketches: |est - exact two-sample KS|
    # <= eps_a + eps_b (sup-norm triangle inequality over the sketched
    # CDFs) — measured on the corpus doc-length split into halves by
    # xxhash64 parity, through the distributed aggregate
    from pyspark.sql import functions as F
    from hierarchical_bloom_filter_index_spark.sketches.kll import ks_distance

    half = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    ka = collect_sketch(sketch_aggregate(
        corp.where(half == 0), "n_tok", lambda: KLL(k=200, seed=5)))
    kb = collect_sketch(sketch_aggregate(
        corp.where(half == 1), "n_tok", lambda: KLL(k=200, seed=6)))
    la = np.sort(np.asarray(
        [r["n_tok"] for r in corp.where(half == 0).select("n_tok").collect()]))
    lb = np.sort(np.asarray(
        [r["n_tok"] for r in corp.where(half == 1).select("n_tok").collect()]))
    xs = np.unique(np.concatenate([la, lb]))
    exact_ks = float(np.max(np.abs(
        np.searchsorted(la, xs, side="right") / len(la)
        - np.searchsorted(lb, xs, side="right") / len(lb))))
    ks_est = ks_distance(ka, kb)
    ks_bound = 0.04  # eps_a + eps_b at k=200
    out["ks"] = {"estimate": round(ks_est, 6), "exact": round(exact_ks, 6),
                 "abs_err": round(abs(ks_est - exact_ks), 6),
                 "bound": ks_bound,
                 "pass": bool(abs(ks_est - exact_ks) <= ks_bound)}

    # Misra-Gries: exact total, underestimate-only within err_bound, and the
    # heavy-hitter superset guarantee — all through the distributed aggregate
    from hierarchical_bloom_filter_index_spark.sketches import MisraGries

    phi = 0.005
    mg = collect_sketch(
        sketch_aggregate(corp, "tokens", lambda: MisraGries.for_phi(phi),
                         values_are_arrays=True)
    )
    mg_est = mg.estimate(present)
    mg_true = np.asarray([exact_counts[k] for k in present])
    required = {int(k) for k, c in exact_counts.items() if c >= phi * n_total}
    hh = set(int(x) for x in mg.heavy_hitters(phi))
    out["misra_gries"] = {
        "phi": phi, "k": mg.k, "err_bound": round(mg.err_bound(), 2),
        "overestimates": int((mg_est > mg_true).sum()),
        "worst_underestimate": int((mg_true - mg_est).max()),
        "n_true_heavy": len(required), "superset_ok": bool(required <= hh),
        "pass": bool(mg.n_total == n_total and (mg_est <= mg_true).all()
                     and (mg_true - mg_est <= mg.err_bound() + 1e-9).all()
                     and required <= hh),
    }

    # per-window CMS rollup: overestimate-only within eps*N_window at the
    # leaf level, exact totals at every level (the linear-rollup contract)
    from hierarchical_bloom_filter_index_spark.config import HbiConfig
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_cms_window_index,
        window_freq_estimates,
        window_token_totals,
    )

    wcfg = HbiConfig(tree_span=1024, leaf_span=32, fpr=0.01, vocab=128, seed=42)
    widx = build_cms_window_index(corp, wcfg, depth=3, width=256)
    deepest = wcfg.deepest
    probe = [int(k) for k in present[:5]]
    ests = {(r["doc_id"], r["w_id"], r["token"]): r["est_count"]
            for r in window_freq_estimates(widx, deepest, probe).collect()}
    tot_rows = window_token_totals(widx).groupBy("level").agg(
        F.sum("n_window").alias("s"), F.count("*").alias("c")).collect()
    totals_exact = all(r["s"] == n_total for r in tot_rows)
    span = wcfg.span(deepest)
    n_checked = n_exceed = n_under = 0
    for doc in corp.limit(50).collect():
        toks = np.asarray(doc["tokens"], dtype=np.int64)
        for w in range(0, (len(toks) + span - 1) // span):
            sl = toks[w * span : (w + 1) * span]
            for t in probe:
                exact = int((sl == t).sum())
                est = ests[(doc["doc_id"], w, t)]
                n_checked += 1
                n_under += est < exact
                n_exceed += est - exact > (np.e / 256) * len(sl)
    widx.unpersist()
    out["cms_window_rollup"] = {
        "levels_totals_exact": bool(totals_exact), "checked": n_checked,
        "underestimates": int(n_under), "viol_rate": round(n_exceed / max(n_checked, 1), 6),
        "pass": bool(totals_exact and n_under == 0 and n_exceed / max(n_checked, 1) <= 0.10),
    }

    # KLL window rollup: EXACT item counts at every level (the oracle's
    # check) and dyadic RANGE quantiles within the k=200 rank-error envelope
    # — both through the real distributed build + O(log)-node range merges
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        build_kll_window_index,
        kll_window_totals,
        range_quantile_estimates,
    )

    kidx = build_kll_window_index(corp, wcfg, k=200)
    ktot = kll_window_totals(kidx).groupBy("level").agg(F.sum("n_window").alias("s")).collect()
    k_totals_exact = all(r["s"] == n_total for r in ktot)
    rqs, qs = [(0, 4), (1, 9)], [0.25, 0.5, 0.75]
    qests = {(r["doc_id"], r["a"], r["b"], r["q"]): r["est"]
             for r in range_quantile_estimates(kidx, rqs, qs, deepest).collect()}
    worst_rank = 0.0
    k_checked = 0
    for doc in corp.limit(50).collect():
        toks = np.asarray(doc["tokens"], dtype=np.float64)
        for a, b in rqs:
            sl = np.sort(toks[a * span : b * span])
            if len(sl) == 0:
                continue
            for q in qs:
                v = qests[(doc["doc_id"], a, b, q)]
                lo = np.searchsorted(sl, v, side="left") / len(sl)
                hi = np.searchsorted(sl, v, side="right") / len(sl)
                err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
                worst_rank = max(worst_rank, err)
                k_checked += 1
    kidx.unpersist()
    out["kll_window_rollup"] = {
        "levels_totals_exact": bool(k_totals_exact), "checked": k_checked,
        "worst_range_rank_err": round(worst_rank, 6), "bound": 0.05,
        "pass": bool(k_totals_exact and k_checked > 0 and worst_rank <= 0.05),
    }

    # synthetic corpus (vocab 4096, skewed sources): a meaningful distinct
    # space for the cardinality/frequency sketches
    syn = C.generate_corpus(spark, sf=0.05, seed=42).cache()
    syn_tokens = syn.select(F.explode("tokens").alias("t"))
    syn_exact = {r["t"]: r["c"] for r in syn_tokens.groupBy("t").agg(F.count("*").alias("c")).collect()}
    syn_total = sum(syn_exact.values())
    hll2 = collect_sketch(
        sketch_aggregate(syn, "tokens", lambda: HyperLogLog(p=14, seed=3), values_are_arrays=True)
    )
    rel2 = abs(hll2.estimate() - len(syn_exact)) / len(syn_exact)
    cms2 = collect_sketch(
        sketch_aggregate(syn, "tokens",
                         lambda: CountMinSketch.from_eps_delta(0.0005, 0.01, seed=2),
                         values_are_arrays=True)
    )
    skeys = np.asarray(list(syn_exact), dtype=np.int64)
    sest = cms2.estimate(skeys)
    strue = np.asarray([syn_exact[k] for k in skeys])
    # MG where pruning actually engages: 4096-distinct zipf-ish corpus,
    # k=500 counters << vocab
    sphi = 0.002
    mg2 = collect_sketch(
        sketch_aggregate(syn, "tokens", lambda: MisraGries.for_phi(sphi),
                         values_are_arrays=True)
    )
    mg2_est = mg2.estimate(skeys)
    req2 = {int(k) for k, c in syn_exact.items() if c >= sphi * syn_total}
    mg2_ok = bool(
        mg2.n_total == syn_total and len(mg2.keys) <= mg2.k
        and (mg2_est <= strue).all()
        and (strue - mg2_est <= mg2.err_bound() + 1e-9).all()
        and req2 <= set(int(x) for x in mg2.heavy_hitters(sphi))
    )
    out["synthetic"] = {
        "n_tokens": int(syn_total), "n_distinct": len(syn_exact),
        "hll_rel_err": round(rel2, 6), "hll_bound_4sigma": round(4 * hll2.rel_error(), 6),
        "cms_underestimates": int((sest < strue).sum()),
        "cms_viol_rate": round(float((sest - strue > 0.0005 * syn_total).mean()), 6),
        "mg_counters": int(len(mg2.keys)), "mg_err_bound": round(mg2.err_bound(), 2),
        "mg_n_true_heavy": len(req2), "mg_ok": mg2_ok,
        "pass": bool(rel2 <= 4 * hll2.rel_error() and (sest >= strue).all()
                     and float((sest - strue > 0.0005 * syn_total).mean()) <= 0.01
                     and mg2_ok),
    }

    out["all_pass"] = all(v["pass"] for v in out.values() if isinstance(v, dict) and "pass" in v)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
