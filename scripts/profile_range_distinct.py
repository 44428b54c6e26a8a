"""Per-stage profile of the range_distinct bench outlier (VERDICT r3 #1).

Times, on the same session and cached indexes bench.py uses:
  1. HLL / CMS index builds (first materialization)
  2. the shared _joined_range_groups stage alone (count of groups)
  3. the full range_distinct vs range_window_totals queries, twice each
  4. the HLL merge+estimate kernel driver-side on the collected groups

Usage: python scripts/profile_range_distinct.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-range-distinct")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from hierarchical_bloom_filter_index_spark.operators.rollup import (
        _joined_range_groups,
        _DOC_KEYS,
        range_distinct_estimates,
        range_token_totals,
    )

    def t(label, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{label:50s} {dt:8.3f}s  -> {out}")
        return out

    corpus = E._corpus(spark, sf_dir)
    t("corpus count", lambda: corpus.count())
    t("hll index build+count", lambda: E._hll_index(spark, sf_dir).count())
    t("cms index build+count", lambda: E._cms_index(spark, sf_dir).count())

    hll = E._hll_index(spark, sf_dir)
    cms = E._cms_index(spark, sf_dir)
    for rep in range(2):
        t(f"[{rep}] joined groups (hll) count",
          lambda: _joined_range_groups(hll, E.RANGE_QS, E.CFG.deepest, _DOC_KEYS).count())
        t(f"[{rep}] joined groups (cms) count",
          lambda: _joined_range_groups(cms, E.RANGE_QS, E.CFG.deepest, _DOC_KEYS).count())
        t(f"[{rep}] range_token_totals (cms) full",
          lambda: range_token_totals(cms, E.RANGE_QS, E.CFG.deepest).count())
        t(f"[{rep}] range_distinct (hll) full",
          lambda: range_distinct_estimates(hll, E.RANGE_QS, E.CFG.deepest).count())

    # kernel-only timing, driver-side, on the exact same grouped input
    groups = _joined_range_groups(hll, E.RANGE_QS, E.CFG.deepest, _DOC_KEYS)
    pdf = t("collect groups to driver", lambda: groups.toPandas())
    import pandas as pd

    from hierarchical_bloom_filter_index_spark.operators.rollup import _hll_range_est_fn

    fn = _hll_range_est_fn(_DOC_KEYS)
    for rep in range(3):
        t(f"[{rep}] HLL kernel driver-side (whole input, one batch)",
          lambda: sum(len(o) for o in fn(iter([pdf]))))
    spark.stop()


if __name__ == "__main__":
    main()
