import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.operators.skew import (
    partition_size_stats,
    salted_repartition,
)
from hierarchical_bloom_filter_index_spark.plans.calibrate import calibrate


def test_salted_repartition_breaks_hot_key(spark):
    corp = C.generate_corpus(spark, sf=0.005, seed=6)
    # naive partition-by-source: the zipf1.5 source is ~10x heavier in tokens
    naive = corp.repartition(12, "source")
    tokens_per_part_naive = [
        r["t"] for r in naive.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum("n_tok").alias("t")).collect()
    ]
    salted = salted_repartition(corp, "source", n_salts=16, n_partitions=12)
    tokens_per_part_salted = [
        r["t"] for r in salted.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum("n_tok").alias("t")).collect()
    ]
    # salting must strictly reduce the max/mean imbalance
    imb = lambda xs: max(xs) / (sum(xs) / len(xs))
    assert imb(tokens_per_part_salted) < imb(tokens_per_part_naive)
    assert salted.count() == corp.count()  # no row loss


def test_salting_deterministic(spark):
    corp = C.generate_corpus(spark, sf=0.002, seed=6)
    a = sorted(r["doc_id"] for r in salted_repartition(corp, "source").collect())
    b = sorted(r["doc_id"] for r in salted_repartition(corp, "source").collect())
    assert a == b


def test_partition_size_stats(spark):
    df = spark.range(100).repartition(4)
    sizes = partition_size_stats(df)
    assert sum(sizes) == 100


def test_calibrate_returns_positive_costs():
    c = calibrate(n_filters=256, reps=2)
    assert c["probe_cost"] > 0 and c["verify_cost"] > 0
    assert c["ratio_probe_to_verify"] > 0
