"""spark-submit --py-files evidence (north_rule: "runs via spark-submit
--py-files"): package the library into a zip, submit a job that imports it
ONLY from the zip (fresh cwd), builds the index on synthetic data and runs a
pattern query. Prints one JSON line on success.

Usage: python scripts/spark_submit_smoke.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "hierarchical_bloom_filter_index_spark"

JOB = """
import json
from pyspark.sql import SparkSession, functions as F
from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import build_index, pattern_search, brute_force_search

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
cfg = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=1)
corp = C.generate_corpus(spark, sf=0.002, seed=1).cache()
idx = build_index(corp, cfg)
row = corp.filter(F.col("n_tok") >= 32).first()
pat = row["tokens"][4:16]
got = sorted((r["doc_id"], r["pos"]) for r in pattern_search(corp, idx, cfg, pat).collect())
exp = sorted((r["doc_id"], r["pos"]) for r in brute_force_search(corp, pat).collect())
print(json.dumps({"matches": len(got), "equal_to_bruteforce": got == exp}))
spark.stop()
"""


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="hbi_submit_")
    zip_path = os.path.join(workdir, "hbi_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for fn in files:
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    job_path = os.path.join(workdir, "job.py")
    with open(job_path, "w") as f:
        f.write(JOB)

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[8]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            job_path,
        ],
        capture_output=True, text=True, cwd=workdir,  # NOT the repo: imports must come from the zip
        timeout=600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit("spark-submit smoke failed")
    result = json.loads(lines[-1])
    result["via"] = "spark-submit --py-files"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
