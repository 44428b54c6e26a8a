"""Deterministic sampling: value-exact differentials vs the local numpy
hash kernel (the DuckDB cross-engine twin is exercised by
tests/test_entry_contract.py via the driver queries)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.sampling import (
    _flip,
    hash_topn_per_stratum,
    sample_hash_threshold,
    split_column,
    stratified_sample,
    threshold_of,
)
from hierarchical_bloom_filter_index_spark.sketches.hashing import hash64

SEED = 71
_P64 = 1 << 64


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source").cache()
    df.count()
    return df


def _local(docs):
    rows = docs.collect()
    ids = np.asarray([r["doc_id"] for r in rows], dtype=np.int64)
    return rows, hash64(ids, SEED)


def test_flip_is_order_preserving():
    us = np.array([0, 1, (1 << 63) - 1, 1 << 63, _P64 - 1], dtype=np.uint64)
    flipped = [_flip(int(u)) for u in us]
    assert flipped == sorted(flipped)
    assert flipped[0] == -(1 << 63) and flipped[-1] == (1 << 63) - 1


def test_threshold_edges():
    assert threshold_of(0.0) == 0
    assert threshold_of(1.0) == _P64
    with pytest.raises(ValueError):
        threshold_of(1.5)


def test_sample_hash_threshold_exact(docs):
    rows, h = _local(docs)
    thr = threshold_of(0.3)
    want = sorted(r["doc_id"] for r, hv in zip(rows, h) if hv < np.uint64(thr))
    got = sorted(r["doc_id"] for r in
                 sample_hash_threshold(docs, "doc_id", thr, SEED).collect())
    assert got == want
    assert sample_hash_threshold(docs, "doc_id", 0, SEED).count() == 0
    assert sample_hash_threshold(docs, "doc_id", _P64, SEED).count() == len(rows)


def test_stratified_sample_exact(docs):
    fracs = {"src0": 0.1, "src1": 1.0}
    rows, h = _local(docs)
    want = sorted(
        r["doc_id"] for r, hv in zip(rows, h)
        if hv <= np.uint64(threshold_of(fracs.get(r["source"], 0.5)) - 1)
    )
    got = sorted(r["doc_id"] for r in stratified_sample(
        docs, "doc_id", "source", fracs, 0.5, SEED).collect())
    assert got == want
    # src1 at fraction 1.0 keeps EVERY doc
    n_src1 = sum(1 for r in rows if r["source"] == "src1")
    assert sum(1 for r, hv in zip(rows, h) if r["source"] == "src1"
               and r["doc_id"] in set(got)) == n_src1


def test_stratified_rejects_zero_fraction(docs):
    with pytest.raises(ValueError):
        stratified_sample(docs, "doc_id", "source", {"src0": 0.0}, 0.5, SEED)


def test_split_column_partitions_exactly(docs):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows, h = _local(docs)
    cut1, cut2 = threshold_of(0.8), threshold_of(0.9)

    def assign(hv):
        return "train" if hv < cut1 else ("val" if hv < cut2 else "test")

    want = {r["doc_id"]: assign(int(hv)) for r, hv in zip(rows, h)}
    got = {r["doc_id"]: r["split"] for r in
           split_column(docs, "doc_id", splits, SEED).collect()}
    assert got == want
    with pytest.raises(ValueError):
        split_column(docs, "doc_id", {"a": 0.5, "b": 0.4}, SEED)


def test_hash_topn_exact(docs):
    n = 4
    rows, h = _local(docs)
    want = {}
    per = {}
    for r, hv in zip(rows, h):
        per.setdefault(r["source"], []).append((int(hv), r["doc_id"]))
    for s, lst in per.items():
        for rank, (_, did) in enumerate(sorted(lst)[:n], start=1):
            want[(s, did)] = rank
    got = {(r["source"], r["doc_id"]): r["rank"] for r in
           hash_topn_per_stratum(docs, "doc_id", "source", n, SEED).collect()}
    assert got == want


def test_sampling_is_layout_independent(docs):
    a = sorted(r["doc_id"] for r in stratified_sample(
        docs, "doc_id", "source", {}, 0.4, SEED).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(
        docs.repartition(17), "doc_id", "source", {}, 0.4, SEED).collect())
    assert a == b


def test_token_budget_shards_partition_invariant(spark):
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        shard_stats, token_budget_shards,
    )
    from hierarchical_bloom_filter_index_spark import corpus as C

    corp = C.generate_corpus(spark, sf=0.002, seed=42)
    a = {r["doc_id"]: r["shard_id"]
         for r in token_budget_shards(corp, 4096).select("doc_id", "shard_id").collect()}
    b = {r["doc_id"]: r["shard_id"]
         for r in token_budget_shards(corp.repartition(17), 4096)
         .select("doc_id", "shard_id").collect()}
    assert a == b, "shard assignment depends on physical partitioning"
    # local ground truth: exclusive prefix sum in doc_id order
    rows = sorted(corp.select("doc_id", "n_tok").collect(), key=lambda r: r["doc_id"])
    acc, want = 0, {}
    for r in rows:
        want[r["doc_id"]] = acc // 4096
        acc += r["n_tok"]
    assert a == want
    st = {r["shard_id"]: (r["n_docs"], r["n_tokens"])
          for r in shard_stats(corp, 4096).collect()}
    assert sum(v[0] for v in st.values()) == len(rows)
    assert sum(v[1] for v in st.values()) == acc


def test_training_shard_layout_prunes_and_round_trips(spark, tmp_path):
    from hierarchical_bloom_filter_index_spark import corpus as C
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        read_training_shard, token_budget_shards, write_training_shards,
    )
    from pyspark.sql import functions as F

    corp = C.generate_corpus(spark, sf=0.002, seed=42)
    path = str(tmp_path / "shards")
    write_training_shards(corp, 4096, path)

    want = {r["doc_id"] for r in token_budget_shards(corp, 4096)
            .filter(F.col("shard_id") == 2).collect()}
    shard2 = read_training_shard(spark, path, 2)
    got = {r["doc_id"] for r in shard2.collect()}
    assert got == want and got

    # the shard filter is a PARTITION filter: only shard 2's files scanned
    files = {r[0] for r in shard2.select(F.input_file_name()).distinct().collect()}
    assert files and all("shard_id=2/" in f for f in files)
    plan = shard2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard_id" in plan


def test_mixture_manifest_exact(docs, spark, sf_dir):
    """Value differential vs the local greedy-prefix oracle, plus the
    exclusion (budget 0), default-budget, bucket-granularity-parity and
    partitioning-invariance contracts."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        mixture_manifest,
    )

    dw = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars")
    rows = dw.collect()
    ids = np.asarray([r["doc_id"] for r in rows], dtype=np.int64)
    h = hash64(ids, SEED)
    budgets = {"src0": 3000, "src1": 0, "src3": 1}
    default = 1500

    def local(budgets, default):
        by = {}
        for r, hv in zip(rows, h):
            by.setdefault(r["source"], []).append(
                (int(hv), r["doc_id"], r["n_chars"]))
        want = {}
        for s, lst in by.items():
            lst.sort()
            bud, cum = budgets.get(s, default), 0
            for _, did, w in lst:
                if cum < bud:
                    want[did] = cum + w
                cum += w
        return want

    want = local(budgets, default)
    got = {r["doc_id"]: r["cum_weight"]
           for r in mixture_manifest(dw, "doc_id", "source", "n_chars",
                                     budgets, SEED,
                                     default_budget=default).collect()}
    assert got == want
    # budget 0 excludes src1 entirely; budget 1 keeps exactly one doc
    assert not any(r["source"] == "src1" for r in rows
                   if r["doc_id"] in got and r["source"] == "src1")
    assert sum(1 for r in rows
               if r["source"] == "src3" and r["doc_id"] in got) == 1
    # bucket granularity is an implementation detail, not a semantic
    for bits in (1, 4, 12):
        g2 = {r["doc_id"]: r["cum_weight"]
              for r in mixture_manifest(dw, "doc_id", "source", "n_chars",
                                        budgets, SEED, default_budget=default,
                                        bucket_bits=bits).collect()}
        assert g2 == want, f"bucket_bits={bits} changed the manifest"
    g3 = {r["doc_id"]: r["cum_weight"]
          for r in mixture_manifest(dw.repartition(13), "doc_id", "source",
                                    "n_chars", budgets, SEED,
                                    default_budget=default).collect()}
    assert g3 == want, "manifest depends on physical partitioning"
    with pytest.raises(ValueError):
        mixture_manifest(dw, "doc_id", "source", "n_chars",
                         {"src0": 1.5}, SEED)


def test_epoch_keys_and_epoch_shards(spark, sf_dir):
    """Epoch keys: unique, lexicographic == unsigned hash order, distinct
    across epochs; epoch shards: partition-invariant and equal to the
    local prefix sum in key order."""
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        epoch_key_udf, epoch_seed, token_budget_shards,
    )

    dw = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").cast("long").alias("n_tok"))
    k1 = epoch_key_udf(SEED, 1)
    k2 = epoch_key_udf(SEED, 2)
    rows = dw.select("doc_id", "n_tok", k1("doc_id").alias("e1"),
                     k2("doc_id").alias("e2")).collect()
    ids = np.asarray([r["doc_id"] for r in rows], dtype=np.int64)
    h1 = hash64(ids, epoch_seed(SEED, 1))
    assert len({r["e1"] for r in rows}) == len(rows)
    assert ([r["doc_id"] for r in sorted(rows, key=lambda r: r["e1"])]
            == [int(i) for _, i in sorted((int(hv), int(i))
                                          for hv, i in zip(h1, ids))])
    assert {r["e1"] for r in rows} != {r["e2"] for r in rows}

    keyed = dw.withColumn("epoch_key", k1(F.col("doc_id")))
    a = {r["doc_id"]: r["shard_id"]
         for r in token_budget_shards(keyed, 4096, order_col="epoch_key")
         .select("doc_id", "shard_id").collect()}
    b = {r["doc_id"]: r["shard_id"]
         for r in token_budget_shards(keyed.repartition(17), 4096,
                                      order_col="epoch_key")
         .select("doc_id", "shard_id").collect()}
    assert a == b, "epoch shard assignment depends on partitioning"
    acc, want = 0, {}
    for r in sorted(rows, key=lambda r: r["e1"]):
        want[r["doc_id"]] = acc // 4096
        acc += r["n_tok"]
    assert a == want
    # a different epoch is a genuinely different packing
    c = {r["doc_id"]: r["shard_id"]
         for r in token_budget_shards(
             dw.withColumn("epoch_key", k2(F.col("doc_id"))), 4096,
             order_col="epoch_key").select("doc_id", "shard_id").collect()}
    assert c != a


def test_pack_training_sequences(spark):
    """Packed sequences: concatenation/boundary invariants vs the local
    truth, composition with epoch keys, partitioning invariance."""
    from hierarchical_bloom_filter_index_spark import corpus as C
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        epoch_key_udf, pack_training_sequences,
    )

    corp = C.generate_corpus(spark, sf=0.002, seed=42).select(
        "doc_id", "tokens", "n_tok").cache()
    corp.count()
    packed = {r["shard_id"]: r for r in
              pack_training_sequences(corp, 4096).collect()}
    rows = sorted(corp.collect(), key=lambda r: r["doc_id"])
    acc, want = 0, {}
    for r in rows:
        want.setdefault(acc // 4096, []).append((r["doc_id"], r["tokens"]))
        acc += r["n_tok"]
    assert set(packed) == set(want)
    for sid, docs in want.items():
        p = packed[sid]
        assert p["doc_ids"] == [d for d, _ in docs]
        stream, starts, o = [], [], 0
        for _, toks in docs:
            starts.append(o)
            stream.extend(toks)
            o += len(toks)
        assert p["doc_starts"] == starts
        assert p["tokens"] == stream
        assert p["n_tokens"] == len(stream)
        # boundary invariant: tokens[starts[i]:starts[i+1]] IS doc i
        for (did, toks), s in zip(docs, starts):
            assert p["tokens"][s:s + len(toks)] == toks
    # partitioning invariance
    p2 = {r["shard_id"]: r["doc_ids"] for r in
          pack_training_sequences(corp.repartition(17), 4096).collect()}
    assert p2 == {k: v["doc_ids"] for k, v in packed.items()}
    # epoch-order packing: same docs, different deterministic arrangement
    keyed = corp.withColumn("epoch_key", epoch_key_udf(SEED, 3)(
        F.regexp_extract("doc_id", r"([0-9]+)$", 1).cast("long")))
    pe = pack_training_sequences(keyed, 4096, order_col="epoch_key")
    eids = [d for r in pe.collect() for d in r["doc_ids"]]
    assert sorted(eids) == sorted(r["doc_id"] for r in rows)
    assert eids != [d for sid in sorted(want) for d, _ in want[sid]]
    corp.unpersist()


def test_drop_bottom_quantile(spark, sf_dir):
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        drop_bottom_quantile,
    )

    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source",
        F.length("text").cast("int").alias("m"))
    rows = df.collect()
    for num, den in ((1, 10), (1, 3), (0, 7)):
        got = {r["doc_id"] for r in
               drop_bottom_quantile(df, "m", num, den, group_col="source").collect()}
        want = set()
        groups = {}
        for r in rows:
            groups.setdefault(r["source"], []).append((r["m"], r["doc_id"]))
        for members in groups.values():
            members.sort()
            cut = (len(members) * num) // den
            want.update(d for _m, d in members[cut:])
        assert got == want, (num, den)
    # frac 0 keeps everything; >= 1 refused
    assert drop_bottom_quantile(df, "m", 0, 5, group_col="source").count() == len(rows)
    with pytest.raises(ValueError, match="drop every row"):
        drop_bottom_quantile(df, "m", 5, 5, group_col="source")
    with pytest.raises(ValueError, match="frac_num"):
        drop_bottom_quantile(df, "m", -1, 5, group_col="source")
    # ungrouped form: one global cut
    g = drop_bottom_quantile(df, "m", 1, 4, group_col=None)
    allm = sorted((r["m"], r["doc_id"]) for r in rows)
    cut = len(allm) // 4
    assert {r["doc_id"] for r in g.collect()} == {d for _m, d in allm[cut:]}
    # plan: both windows must share ONE exchange
    plan = drop_bottom_quantile(df, "m", 1, 10, group_col="source")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_weighted_sample_topn(spark, sf_dir):
    """A-Res weighted sampling: value-exact vs a local numpy/math
    recomputation, repartition-invariant, weight-biased, refusals."""
    import math

    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        weighted_sample_topn,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", (F.length("text") + 1).cast("double").alias("w"))

    def local_scores(rows, seed):
        ids = np.asarray([r["doc_id"] for r in rows], dtype=np.int64)
        h = hash64(ids, seed)
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) * (2.0 ** -53)
        return {r["doc_id"]: -math.log(uu) / r["w"] for r, uu in zip(rows, u)}

    rows = docs.collect()
    sc = local_scores(rows, SEED)
    n = 4
    # stratified: rank/score/set all value-exact vs local recomputation
    got = weighted_sample_topn(docs, "doc_id", "w", n, SEED,
                               strata_col="source").collect()
    assert got
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    want = {}
    for s, ids in by_src.items():
        ranked = sorted(ids, key=lambda i: (sc[i], i))[:n]
        for k, i in enumerate(ranked, 1):
            want[(s, i)] = k
    assert {(r["source"], r["doc_id"]): r["ws_rank"] for r in got} == want
    for r in got:
        assert r["ws_score"] == sc[r["doc_id"]]  # bit-exact
    # repartition invariance
    got2 = weighted_sample_topn(docs.repartition(13), "doc_id", "w", n, SEED,
                                strata_col="source").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))
    # global form: TakeOrdered plan (no full sort), same as local top-n
    g = weighted_sample_topn(docs, "doc_id", "w", n, SEED)
    assert "TakeOrderedAndProject" in g._jdf.queryExecution().executedPlan().toString()
    g_ids = sorted(r["doc_id"] for r in g.collect())
    assert g_ids == sorted(sorted(sc, key=lambda i: (sc[i], i))[:n])
    # weight bias: a doc with an overwhelming weight is (virtually) always
    # in — its exponential score collapses toward 0
    heavy = docs.withColumn(
        "w", F.when(F.col("doc_id") == rows[0]["doc_id"], 1e15).otherwise(F.col("w")))
    hg = weighted_sample_topn(heavy, "doc_id", "w", 1, SEED).collect()
    assert hg[0]["doc_id"] == rows[0]["doc_id"]
    # refusals: nonpositive n / nonpositive weights
    with pytest.raises(ValueError, match="n must be positive"):
        weighted_sample_topn(docs, "doc_id", "w", 0, SEED)
    bad = docs.withColumn("w", F.lit(0.0))
    with pytest.raises(Exception, match="positive and finite"):
        weighted_sample_topn(bad, "doc_id", "w", 2, SEED).collect()


# ---------------------------------------------------------------------------
# Sketch-driven balanced range partitioning
# ---------------------------------------------------------------------------


def test_sketch_range_buckets_balanced_and_deterministic(spark, sf_dir):
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        certified_bucket_counts,
        kll_column_boundaries,
        sketch_range_buckets,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # boundaries are a pure function of the input layout (partials sorted
    # before the driver merge) — two runs must agree exactly
    assert (kll_column_boundaries(li, "l_extendedprice", 8)
            == kll_column_boundaries(li, "l_extendedprice", 8))
    bucketed, bnds = sketch_range_buckets(li, "l_extendedprice", 8)
    assert len(bnds) == 7 and bnds == sorted(bnds)
    rows = {r["bucket"]: r["n_rows"]
            for r in certified_bucket_counts(bucketed, 8, max_rel_dev=0.2).collect()}
    n = sum(rows.values())
    assert sorted(rows) == list(range(8))
    for b, c in rows.items():  # KLL-bound balance, much tighter in practice
        assert abs(c * 8 - n) <= 0.2 * n, (b, c)
    # bucket assignment matches the boundaries exactly (pure expression)
    import numpy as np
    sample = bucketed.select("l_extendedprice", "bucket").limit(2000).collect()
    for r in sample:
        assert r["bucket"] == int(np.searchsorted(bnds, r["l_extendedprice"], "right"))


def test_sketch_range_buckets_refuses_heavy_value(spark):
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from pyspark.sql import functions as F
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        certified_bucket_counts,
        sketch_range_buckets,
    )

    const = spark.range(1000).select(F.lit(5.0).alias("x"))
    bucketed, _ = sketch_range_buckets(const, "x", 4)
    with _pytest.raises(SparkRuntimeException, match="salt"):
        certified_bucket_counts(bucketed, 4).collect()


def test_bucketed_layout_pruned_read(spark, sf_dir, tmp_path):
    """The bucketed layout must serve a column-range predicate through a
    PARTITION filter (whole bucket directories pruned at plan time) and
    return exactly the rows of a full-scan filter — pruning only prunes."""
    import contextlib
    import io

    from pyspark.sql import functions as F
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        read_bucket_pruned,
        write_bucketed_layout,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    path = str(tmp_path / "lay")
    bnds = write_bucketed_layout(li, "l_extendedprice", 8, path)
    assert bnds == sorted(bnds) and len(bnds) == 7
    lo, hi = 20000.0, 35000.0
    pruned = read_bucket_pruned(spark, path, lo, hi)
    cols = ["l_orderkey", "l_linenumber", "l_extendedprice"]
    got = sorted(map(tuple, pruned.select(*cols).collect()))
    want = sorted(map(tuple, li.filter(
        (F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") < hi)
    ).select(*cols).collect()))
    assert got == want and len(got) > 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    pf = [l for l in buf.getvalue().splitlines() if "PartitionFilters" in l]
    assert pf and "bucket" in pf[0], buf.getvalue()
    # the predicate's bucket range genuinely excludes directories: the
    # covering buckets hold strictly fewer rows than the table
    import bisect
    b_lo, b_hi = bisect.bisect_right(bnds, lo), bisect.bisect_right(bnds, hi)
    assert (b_lo, b_hi) != (0, 7)
    covered = spark.read.parquet(f"{path}/data").filter(
        (F.col("bucket") >= b_lo) & (F.col("bucket") <= b_hi)).count()
    assert covered < li.count()
    with __import__("pytest").raises(ValueError, match="lo < hi"):
        read_bucket_pruned(spark, path, 5.0, 5.0)


# ---------------------------------------------------------------------------
# temperature mixture (n^alpha budgets via exact integer roots)
# ---------------------------------------------------------------------------
def test_iroot_exact():
    import math

    from hierarchical_bloom_filter_index_spark.operators.sampling import _iroot

    for n in list(range(0, 200)) + [10**12 - 1, 10**12, 10**12 + 1,
                                    (3**20) ** 2, (3**20) ** 2 - 1]:
        assert _iroot(n, 2) == math.isqrt(n), n
    # cube roots around exact cubes (the float-pow flip zone)
    for b in (7, 10**5, 12345):
        for n in (b**3 - 1, b**3, b**3 + 1):
            r = _iroot(n, 3)
            assert r**3 <= n < (r + 1) ** 3
    import pytest as _pt
    with _pt.raises(ValueError):
        _iroot(-1, 2)


def test_temperature_budgets_properties():
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        temperature_budgets,
    )

    totals = {"a": 10000, "b": 100, "c": 0}
    # alpha=1 is proportional; alpha=1/2 flattens toward uniform
    prop = temperature_budgets(totals, 10100, alpha=(1, 1))
    assert prop == {"a": 10000, "b": 100, "c": 0}
    half = temperature_budgets(totals, 10100, alpha=(1, 2))
    assert half["c"] == 0 and half["a"] + half["b"] <= 10100
    # w = (100, 10, 0) -> a gets 10x b, not 100x
    assert half["a"] == 10 * half["b"] or abs(half["a"] - 10 * half["b"]) <= 10
    import pytest as _pt
    with _pt.raises(ValueError, match="0 < p <= q"):
        temperature_budgets(totals, 100, alpha=(3, 2))
    assert temperature_budgets({"x": 0}, 100) == {"x": 0}


def test_temperature_mixture_matches_explicit_budgets(spark, sf_dir):
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        mixture_manifest,
        temperature_budgets,
        temperature_mixture_manifest,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.length("text").alias("w"))
    totals = {r[0]: int(r[1]) for r in
              d.groupBy("source").agg(F.sum("w")).collect()}
    budgets = temperature_budgets(totals, 5000, alpha=(1, 2))
    want = sorted(map(tuple, mixture_manifest(
        d, "doc_id", "source", "w", budgets, seed=11).collect()))
    got = sorted(map(tuple, temperature_mixture_manifest(
        d, "doc_id", "source", "w", 5000, seed=11, alpha=(1, 2)).collect()))
    assert got == want and got


def test_iroot_huge_n_no_float_overflow():
    from hierarchical_bloom_filter_index_spark.operators.sampling import _iroot

    b = 10**80
    for q in (2, 3, 7):
        n = b**q
        for m in (n - 1, n, n + 1):
            r = _iroot(m, q)
            assert r**q <= m < (r + 1) ** q
