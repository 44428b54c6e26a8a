"""sketch_aggregate: distributed two-phase aggregation == single-machine
sketch over the same data, and estimates within bounds vs exact Spark
aggregations (the built-ins play the oracle role per SURVEY §7.3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.operators.aggregates import (
    collect_sketch,
    grouped_sketches,
    sketch_aggregate,
)
from hierarchical_bloom_filter_index_spark.sketches import (
    CountMinSketch,
    HyperLogLog,
    KLL,
    TDigest,
)


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = C.generate_corpus(spark, sf=0.003, seed=7).cache()
    df.count()
    return df


def test_global_hll_vs_exact(spark, corpus_df):
    hll_df = sketch_aggregate(
        corpus_df, "tokens", lambda: HyperLogLog(p=13, seed=1), values_are_arrays=True
    )
    hll = collect_sketch(hll_df)
    exact = corpus_df.select(F.explode("tokens").alias("t")).agg(
        F.countDistinct("t")
    ).first()[0]
    assert abs(hll.estimate() - exact) / exact <= 4 * hll.rel_error()


def test_grouped_hll_matches_local(spark, corpus_df):
    by_src = grouped_sketches(
        sketch_aggregate(
            corpus_df, "tokens", lambda: HyperLogLog(p=12, seed=1),
            group_cols=("source",), values_are_arrays=True,
        )
    )
    # distributed result must equal a locally-built sketch (exact merge law)
    local = {}
    for r in corpus_df.select("source", "tokens").collect():
        s = local.setdefault(r["source"], HyperLogLog(p=12, seed=1))
        s.update(np.asarray(r["tokens"], dtype=np.int64))
    assert set(by_src) == {(s,) for s in local}
    for (src,), sk in by_src.items():
        assert np.array_equal(sk.regs, local[src].regs), src


def test_global_cms_vs_exact_counts(spark, corpus_df):
    cms = collect_sketch(
        sketch_aggregate(
            corpus_df, "tokens", lambda: CountMinSketch.from_eps_delta(0.001, 0.01, seed=2),
            values_are_arrays=True,
        )
    )
    exact = {
        r["t"]: r["c"]
        for r in corpus_df.select(F.explode("tokens").alias("t")).groupBy("t")
        .agg(F.count("*").alias("c")).orderBy(F.desc("c")).limit(50).collect()
    }
    keys = np.asarray(list(exact), dtype=np.int64)
    est = cms.estimate(keys)
    true = np.asarray([exact[k] for k in exact])
    assert (est >= true).all()
    assert (est - true <= 0.001 * cms.total).all()


def test_kll_doclen_quantiles_vs_exact(spark, corpus_df):
    kll = collect_sketch(sketch_aggregate(corpus_df, "n_tok", lambda: KLL(k=200, seed=3)))
    td = collect_sketch(sketch_aggregate(corpus_df, "n_tok", lambda: TDigest(delta=100)))
    lens = np.sort(np.asarray([r["n_tok"] for r in corpus_df.select("n_tok").collect()]))
    n = len(lens)
    assert kll.n == n
    for q in (0.1, 0.5, 0.9):
        for sk in (kll, td):
            v = sk.quantile(q)
            lo = np.searchsorted(lens, v, side="left") / n
            hi = np.searchsorted(lens, v, side="right") / n
            err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
            assert err <= 0.05, f"{type(sk).__name__} q={q} err={err}"


def test_partitioning_invariance(spark, corpus_df):
    """Same sketch regardless of partition count — the distributed merge law."""
    a = collect_sketch(
        sketch_aggregate(corpus_df.repartition(2), "tokens",
                         lambda: HyperLogLog(p=10, seed=5), values_are_arrays=True)
    )
    b = collect_sketch(
        sketch_aggregate(corpus_df.repartition(13), "tokens",
                         lambda: HyperLogLog(p=10, seed=5), values_are_arrays=True)
    )
    assert np.array_equal(a.regs, b.regs)
