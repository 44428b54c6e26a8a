"""Workload replay: run a whole pattern-query file through the index in ONE
shared batched cascade — the Spark-first rebuild of the reference's
benchmark drivers, which replay query files pattern-by-pattern
(HBIDatasetBenchmark.java:106-182, utilities/BenchmarkIO.findQueryFiles;
query files are one text pattern per line, exactly like
/root/reference/queries/*/*.txt).

Usage (plain python or spark-submit --py-files hbi_spark.zip):

  python scripts/run_workload.py --patterns FILE [--sf-dir DIR]
      [--axis doc|global] [--mode batch|sequential] [--cpus N]
      [--limit K] [--out results.parquet]

Patterns are codepoint-tokenized like the documents corpus. Prints one JSON
line: per-pattern match counts + wall seconds. --mode sequential exists to
reproduce the per-query replay for comparison; batch is the default and the
scale path (each index level is scanned once for the whole file).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--patterns", required=True, help="query file, one text pattern per line")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--axis", choices=["doc", "global"], default="doc")
    ap.add_argument("--mode", choices=["batch", "sequential"], default="batch")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--limit", type=int, default=None, help="only the first K patterns")
    ap.add_argument("--out", default=None, help="write the match rows to this parquet path")
    args = ap.parse_args()

    with open(args.patterns) as f:
        texts = [line.rstrip("\n") for line in f if line.strip()]
    if args.limit:
        texts = texts[: args.limit]
    patterns = [[ord(c) for c in t] for t in texts]
    if not patterns:
        raise SystemExit("no patterns in file")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("hbi-workload")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from hierarchical_bloom_filter_index_spark.operators import (
        global_pattern_search,
        global_pattern_search_batch,
        pattern_search,
        pattern_search_batch,
    )

    if args.axis == "doc":
        corpus, index = e._corpus(spark, args.sf_dir), e._index(spark, args.sf_dir)
        freq, stats = e._planner_inputs(spark, args.sf_dir)
        cfg = e.CFG
        single, batch = pattern_search, pattern_search_batch
    else:
        corpus, index, stats = e._global_index(spark, args.sf_dir)
        freq, _ = e._planner_inputs(spark, args.sf_dir)
        cfg = e._global_cfg(spark, args.sf_dir)
        single, batch = global_pattern_search, global_pattern_search_batch
    kw = dict(start_level="auto", freq=freq, stats=stats)

    t0 = time.time()
    if args.mode == "batch":
        df = batch(corpus, index, cfg, patterns, **kw)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            df = spark.read.parquet(args.out)
        counts = {int(r["pattern_id"]): int(r["n"]) for r in
                  df.groupBy("pattern_id").count().withColumnRenamed("count", "n").collect()}
    else:
        counts = {}
        parts = []
        for p, pat in enumerate(patterns):
            df = single(corpus, index, cfg, pat, **kw)
            if args.out:
                parts.append(df.selectExpr(f"{p} AS pattern_id", "*"))
            counts[p] = df.count()
        if args.out and parts:
            out = parts[0]
            for d in parts[1:]:
                out = out.unionByName(d)
            out.write.mode("overwrite").parquet(args.out)
    wall = time.time() - t0

    print(json.dumps({
        "patterns": len(patterns),
        "mode": args.mode,
        "axis": args.axis,
        "sf_dir": args.sf_dir,
        "wall_sec": round(wall, 3),
        "total_matches": int(sum(counts.values())),
        "matches_per_pattern": {texts[p][:40]: counts.get(p, 0) for p in range(len(patterns))},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
