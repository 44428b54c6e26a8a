"""Per-query DATA-scaling sweep: sf0.1 -> 5x, same local[32] box.

The judge's 100x question can't be answered directly in a sandbox, but the
next-best honest proxy is: do the headline queries grow ~linearly (or
better) when the DATA grows 5x at fixed parallelism? Any query growing
super-linearly in data has a hidden quadratic/skew term that 100x would
amplify.

5x corpus construction (deterministic, no external data): the sf0.1
documents table unioned 5 times; replica r's text passes through a
lowercase Caesar shift by 7*r (F.translate, JVM-side). The corpus is pure
ASCII, so each replica is an ISOMORPHIC copy — per-doc lengths, zipf shape,
and the within-replica duplicate/near-duplicate structure are preserved
exactly (the shift is a bijection on the alphabet), while cross-replica
shingles are disjoint. Consequences worth knowing when reading the table:
  * corpus/index/build work scales exactly 5.0x;
  * LSH near-dup TRUE pairs scale exactly 5.0x (one clique per replica);
  * fixed literal PATTERNS only match replica 0, so pattern queries keep
    ~constant result sizes over a 5x index — their growth isolates the
    cascade/probe cost, which is the term that matters at scale.

Usage: python scripts/measure_query_scaling.py [reps]
Writes scratch/query_scaling.json and prints a markdown table for
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SCALED = "/root/repo/scratch/sf0.5docs"

SWEEP = [
    "hbi_pattern_present",
    "hbi_pattern_batch",
    "window_membership_batch",
    "heavy_hitter_bigrams",
    "range_window_totals",
    "range_distinct",
    "range_quantiles",
    "hbi_global_pattern",
    "hbi_global_pattern_batch",
    "global_window_membership_batch",
    "global_range_totals",
    "minhash_lsh_neardup",
]


def build_scaled_docs(spark, reps: int = 5) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    alpha = string.ascii_lowercase
    parts = []
    for r in range(reps):
        d = docs
        if r:
            k = (7 * r) % 26
            d = d.withColumn("text", F.translate("text", alpha, alpha[k:] + alpha[:k]))
        parts.append(d.withColumn("doc_id", F.concat(F.lit(f"r{r}-"), "doc_id")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{SCALED}/documents.parquet")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hbi-query-scaling")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    if not os.path.exists(f"{SCALED}/documents.parquet"):
        build_scaled_docs(spark)

    qmap = E.queries()
    result: dict[str, dict] = {"sf0.1": {}, "sf0.5x": {}, "rows": {}}
    for tag, sf_dir in [("sf0.1", SRC), ("sf0.5x", SCALED)]:
        # ONE scale resident at a time (as a real deployment would be): the
        # first sweep ran both scales' persisted indexes in one storage pool
        # and eviction churn polluted the 5x rows 3-30x.
        for v in list(E._CACHE.values()):
            for item in v if isinstance(v, tuple) else (v,):
                if hasattr(item, "unpersist"):
                    try:
                        item.unpersist(blocking=True)
                    except Exception:
                        pass
        E._CACHE.clear()
        spark.catalog.clearCache()
        corpus = E._corpus(spark, sf_dir)
        # python-worker / Arrow warmup so builds measure steady state
        corpus.limit(64).mapInPandas(lambda it: it, schema=corpus.schema).count()
        n_tokens = corpus.agg(F.sum("n_tok")).first()[0]
        result[tag]["tokens"] = int(n_tokens)
        t0 = time.time()
        E._index(spark, sf_dir).count()
        E._planner_inputs(spark, sf_dir)
        result[tag]["index_build"] = round(time.time() - t0, 3)
        qmap["hbi_pattern_rare"](spark, sf_dir).count()  # routed-query warmup
        for name in SWEEP:
            best, n = float("inf"), 0
            for _ in range(reps):
                t0 = time.time()
                n = qmap[name](spark, sf_dir).count()
                best = min(best, time.time() - t0)
            result[tag][name] = round(best, 3)
            result["rows"].setdefault(name, {})[tag] = n
            print(f"# {tag} {name}: {n} rows in {best:.2f}s", file=sys.stderr)

    data_ratio = result["sf0.5x"]["tokens"] / result["sf0.1"]["tokens"]
    result["data_ratio"] = round(data_ratio, 3)
    lines = [
        "| query | sf0.1 s | 5x s | time ratio | rows 0.1 -> 5x |",
        "|---|---|---|---|---|",
    ]
    for name in ["index_build"] + SWEEP:
        a, b = result["sf0.1"][name], result["sf0.5x"][name]
        rows = result["rows"].get(name, {})
        lines.append(
            f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f}x | "
            f"{rows.get('sf0.1', '-')} -> {rows.get('sf0.5x', '-')} |"
        )
    table = "\n".join(lines)
    print(table)
    result["table"] = table
    os.makedirs("/root/repo/scratch", exist_ok=True)
    with open("/root/repo/scratch/query_scaling.json", "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
