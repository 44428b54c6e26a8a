"""Core-scaling measurement for the GLOBAL window-sketch build
(BENCH/BASELINE.md "Global window-sketch build scaling"): the doc-axis build
is shuffle-free, so this is the build path that actually exercises the
rebalance + merge shuffles. Fresh JVM per parallelism point, warm-up build
before timing, best-of-reps throughput.

  python scripts/measure_global_build_scaling.py [sf] [reps]
  HBI_SCALING_CPUS=2,8 to change the N / 4N core counts.

Prints one JSON summary line: full-build and partials-stage efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = """
import json, sys, time
cpus, sf = int(sys.argv[1]), float(sys.argv[2])
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"hbi-gscaling-{cpus}")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators.rollup import (
    _global_leaf_partials, build_global_cms_window_index,
)
from hierarchical_bloom_filter_index_spark.sketches import cms as cms_kernels

cfg = HbiConfig(tree_span=1024, leaf_span=32, fpr=0.01, vocab=4096, seed=42)
corp = C.with_global_offsets(
    C.generate_corpus(spark, sf=sf, seed=42, n_partitions=128)
).cache()
n_tokens = int(corp.agg(F.sum("n_tok")).first()[0])  # materialize pre-timing
seed = cfg.seed + 11
kern = lambda t, s, n: cms_kernels.partial_blobs_by_slot(t, s, n, 3, 64, seed)
# warm-up: fault worker arenas + JIT the whole path once
build_global_cms_window_index(corp, cfg, depth=3, width=64).unpersist()
t0 = time.time()
_global_leaf_partials(corp, cfg, kern).write.format("noop").mode("overwrite").save()
t_partials = time.time() - t0
t0 = time.time()
idx = build_global_cms_window_index(corp, cfg, depth=3, width=64)
t_full = time.time() - t0
n_rows = idx.count()
idx.unpersist()
print(json.dumps({"cpus": cpus, "tokens": n_tokens, "sketch_rows": int(n_rows),
                  "partials_sec": t_partials, "full_sec": t_full,
                  "full_tok_per_sec": n_tokens / t_full,
                  "partials_tok_per_sec": n_tokens / t_partials}))
spark.stop()
"""


def run_once(cpus: int, sf: float) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(sf)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_small, n_big = (int(x) for x in os.environ.get("HBI_SCALING_CPUS", "2,8").split(","))
    results: dict[int, list[dict]] = {n_small: [], n_big: []}
    for rep in range(reps):
        for cpus in (n_small, n_big):
            r = run_once(cpus, sf)
            results[cpus].append(r)
            print(f"# rep{rep} local[{cpus}]: full {r['full_sec']:.1f}s "
                  f"({r['full_tok_per_sec']:.0f} tok/s), partials "
                  f"{r['partials_sec']:.1f}s", file=sys.stderr)
    best_full = {c: max(r["full_tok_per_sec"] for r in results[c]) for c in results}
    best_part = {c: max(r["partials_tok_per_sec"] for r in results[c]) for c in results}
    ratio = n_big / n_small
    print(json.dumps({
        "metric": f"global_build_scaling_{n_small}_to_{n_big}",
        "tokens": results[n_small][0]["tokens"],
        "sf": sf,
        "full_eff": round((best_full[n_big] / best_full[n_small]) / ratio, 4),
        "partials_eff": round((best_part[n_big] / best_part[n_small]) / ratio, 4),
        "full_tok_per_sec_localN": round(best_full[n_small]),
        "full_tok_per_sec_local4N": round(best_full[n_big]),
        "partials_tok_per_sec_localN": round(best_part[n_small]),
        "partials_tok_per_sec_local4N": round(best_part[n_big]),
    }))


if __name__ == "__main__":
    main()
