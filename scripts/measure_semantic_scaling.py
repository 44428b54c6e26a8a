"""Embedding-modality DATA-scaling sweep for the semantic-dedup family.

The doc-replica sweep (measure_query_scaling.py) cannot scale the
embeddings table, so this script generates its own deterministic corpus at
N and 5N vectors and measures the family's scale path at BOTH sizes:

  * semantic_dedup_pairs (clustered): n_centroids grows with N so the
    EXPECTED cluster size stays constant — the SemDeDup contract. Work is
    sum of squared cluster sizes ~ N * avg_cluster, i.e. ~linear in N.
  * write_ivf_index + semantic_neardup_against_index: a FIXED 1k ingestion
    batch against the persisted index. Probed lists have ~constant size
    (N/nlist is held constant), so the batch check should stay ~FLAT while
    the corpus grows — the property that makes per-batch crawl dedup
    affordable at 100 TB.

Corpus: 64-dim vectors, one seeded RNG stream per row id (SeedSequence
keyed on id — partitioning-independent, the corpus.generate_corpus
discipline). 1% of rows are planted near-duplicates of the previous row
(tiny perturbation, cosine ~0.999); reported alongside the timings as a
recall sanity check (found planted pairs / planted pairs).

Usage: python scripts/measure_semantic_scaling.py [N_base]
Writes BENCH/semantic_scaling_r04.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
THRESH = 0.95
PLANT_EVERY = 100  # id % 100 == 1 -> near-copy of id-1


def gen_embeddings(spark, n: int):
    """Deterministic distributed embedding table: vec_id in [0, n), each
    row's vector drawn from its OWN SeedSequence(vec_id) stream (value is a
    pure function of vec_id — any partitioning yields the same table).
    Rows with vec_id % PLANT_EVERY == 1 are near-copies of vec_id - 1."""
    base = spark.range(0, n, 1, 32)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                src = int(i) - 1 if int(i) % PLANT_EVERY == 1 else int(i)
                rng = np.random.default_rng(np.random.SeedSequence(src))
                v = rng.standard_normal(DIM)
                if src != int(i):  # planted near-dup: small deterministic nudge
                    nudge = np.random.default_rng(
                        np.random.SeedSequence(int(i) + 10**9)).standard_normal(DIM)
                    v = v + 0.02 * nudge
                vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    return base.mapInPandas(gen, schema="vec_id long, embedding array<float>")


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hbi-semantic-scaling")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hierarchical_bloom_filter_index_spark.operators import similarity as S

    out = {"dim": DIM, "threshold": THRESH, "scales": {}}
    for mult in (1, 5):
        n = n_base * mult
        nlist = max(8, n // 1000)  # hold expected cluster size ~1000
        emb = gen_embeddings(spark, n).cache()
        emb.count()  # materialize outside the timings
        planted = sum(1 for i in range(n) if i % PLANT_EVERY == 1)

        t0 = time.time()
        pairs = S.semantic_dedup_pairs(
            emb, THRESH, n_centroids=nlist, max_cluster=10_000
        ).cache()
        n_pairs = pairs.count()
        t_pairs = time.time() - t0
        found = pairs.filter(
            (pairs.id_b - pairs.id_a == 1) & (pairs.id_b % PLANT_EVERY == 1)
        ).count()
        pairs.unpersist()

        work = tempfile.mkdtemp(prefix="hbi_semscale_")
        t0 = time.time()
        S.write_ivf_index(emb, f"{work}/ivf", n_centroids=nlist)
        t_index = time.time() - t0

        batch = emb.filter((emb.vec_id % 97 == 3)).limit(1000).cache()
        batch.count()
        t0 = time.time()
        n_inc = S.semantic_neardup_against_index(
            spark, batch, f"{work}/ivf", THRESH, nprobe=2
        ).count()
        t_inc = time.time() - t0
        batch.unpersist()
        emb.unpersist()

        out["scales"][str(mult)] = {
            "n": n, "nlist": nlist,
            "dedup_sec": round(t_pairs, 2), "pairs": n_pairs,
            "planted": planted, "planted_found": found,
            "recall_planted": round(found / planted, 4),
            "index_write_sec": round(t_index, 2),
            "incremental_sec": round(t_inc, 2), "incremental_pairs": n_inc,
        }
        print(json.dumps(out["scales"][str(mult)]))

    a, b = out["scales"]["1"], out["scales"]["5"]
    out["ratios"] = {
        "dedup": round(b["dedup_sec"] / a["dedup_sec"], 2),
        "index_write": round(b["index_write_sec"] / a["index_write_sec"], 2),
        "incremental": round(b["incremental_sec"] / a["incremental_sec"], 2),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/semantic_scaling_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print("| op | N | 5N | ratio (5x data) |")
    print("|---|---|---|---|")
    print(f"| semantic_dedup_pairs (clustered) | {a['dedup_sec']}s | "
          f"{b['dedup_sec']}s | {out['ratios']['dedup']}x |")
    print(f"| write_ivf_index | {a['index_write_sec']}s | "
          f"{b['index_write_sec']}s | {out['ratios']['index_write']}x |")
    print(f"| semantic_neardup_against_index (1k batch) | {a['incremental_sec']}s | "
          f"{b['incremental_sec']}s | {out['ratios']['incremental']}x |")
    spark.stop()


if __name__ == "__main__":
    main()
