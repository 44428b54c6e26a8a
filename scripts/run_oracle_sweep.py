"""Full oracle sweep — the driver's correctness gate, run locally over EVERY
registered query and recorded as a checked-in artifact (SWEEP.json).

The per-round driver file (CORRECTNESS_r{N}.json) covers a rotating subset;
this sweep is the complete matrix: for each queries() entry at sf0.01,
row-count / column-schema / order-insensitive value comparison against its
oracle_sql() DuckDB twin (rows-only for the no_oracle estimate queries),
plus wall seconds. Same normalization as tests/test_entry_contract.py.

Usage: python scripts/run_oracle_sweep.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows(it):
    return sorted(tuple(_norm(x) for x in row) for row in it)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SWEEP.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hbi-oracle-sweep")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracles = E.oracle_sql()
    results: dict[str, dict] = {}
    n_pass = n_rows_only = n_fail = 0
    for name, q in E.queries().items():
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None, "sec": None,
        }
        t0 = time.time()
        try:
            sdf = q(spark, SF_DIR)
            srows_raw = sdf.collect()
            rec["spark_rows"] = len(srows_raw)
            if name in oracles:
                rel = con.sql(oracles[name])
                drows_raw = rel.fetchall()
                rec["oracle_rows"] = len(drows_raw)
                rec["rows_match"] = len(srows_raw) == len(drows_raw)
                rec["schema_match"] = (
                    [c.lower() for c in sdf.columns] == [c.lower() for c in rel.columns]
                )
                rec["hash_match"] = _rows(tuple(r) for r in srows_raw) == _rows(drows_raw)
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                n_pass += ok
                n_fail += not ok
            else:
                rec["err"] = "no_oracle"
                n_rows_only += 1
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
            n_fail += 1
        rec["sec"] = round(time.time() - t0, 3)
        results[name] = rec
        status = "PASS" if rec["err"] is None and rec.get("hash_match") else rec["err"] or "FAIL"
        print(f"# {name}: {status} ({rec['sec']}s)", file=sys.stderr)

    artifact = {
        "sf_dir": SF_DIR,
        "n_queries": len(results),
        "n_oracle_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "results"}))
    spark.stop()
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
