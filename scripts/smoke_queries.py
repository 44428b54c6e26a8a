"""Quick oracle smoke for a SUBSET of registered queries — the edit loop's
fast feedback (the full matrix is scripts/run_oracle_sweep.py).

Usage: python scripts/smoke_queries.py q1,q2,... [sf_dir]
Same normalization as run_oracle_sweep.py; exits 1 on any mismatch/error.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("hbi-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = E.oracle_sql()
    qmap = E.queries()
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qmap[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"# {name}: rows_only {len(srows)} rows "
                      f"({time.time()-t0:.1f}s)")
                continue
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            schema_ok = [c.lower() for c in sdf.columns] == [
                c.lower() for c in rel.columns]
            hash_ok = _rows(srows) == _rows(drows)
            ok = schema_ok and len(srows) == len(drows) and hash_ok
            bad += not ok
            print(f"# {name}: {'PASS' if ok else 'FAIL'} spark={len(srows)} "
                  f"oracle={len(drows)} schema={schema_ok} hash={hash_ok} "
                  f"({time.time()-t0:.1f}s)")
            if not ok:
                print("  spark cols:", sdf.columns)
                print("  oracle cols:", rel.columns)
                s, d = _rows(srows), _rows(drows)
                only_s = [r for r in s if r not in d][:3]
                only_d = [r for r in d if r not in s][:3]
                print("  only-spark:", only_s)
                print("  only-oracle:", only_d)
        except Exception as ex:  # noqa: BLE001
            bad += 1
            print(f"# {name}: ERROR {type(ex).__name__}: {ex}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
