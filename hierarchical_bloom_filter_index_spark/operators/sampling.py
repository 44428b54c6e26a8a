"""Deterministic sampling for training-data pipelines: stratified Bernoulli
sampling, multi-way dataset splits, and per-stratum hash top-n (a
deterministic stand-in for reservoir sampling).

Everything here is a PURE FUNCTION of (row id, seed) — no RNG state, no
partition-order dependence — so samples are reproducible across re-runs,
repartitions, engines, and cluster sizes, and a row's split assignment
never changes when the dataset grows (the property training pipelines need
to avoid test-set leakage between dataset versions). The hash is the
repo-wide splitmix64 (sketches/hashing.hash64), which has a bit-exact
DuckDB SQL twin (__spark_entry__._splitmix_ctes) — the driver oracles are
therefore VALUE equalities, not distribution checks.

Scale: the Bernoulli forms are narrow-only plans (filter over an Arrow-
batched hash — no shuffle at all; predicate evaluated where the data
lives). hash_topn keeps one shuffle keyed by stratum with a partial
TakeOrdered per map task bounded by n (never materializes a stratum's
full row set on one task beyond the top-n heap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

from ..sketches.hashing import hash64

_P64 = 1 << 64


def threshold_of(fraction: float) -> int:
    """The u64 acceptance threshold of a sampling fraction (accept iff
    hash < threshold) — computed ONCE in Python and inlined on both
    engines, so float rounding can never disagree across them."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    return _P64 if fraction >= 1.0 else int(fraction * _P64)


def _flip(u: int) -> int:
    """u64 -> int64 with the sign bit flipped: signed order == u64 order."""
    return int(np.int64(np.uint64(u) ^ np.uint64(1 << 63)))


def _limit_lit(fraction: float) -> int:
    """Flipped int64 INCLUSIVE limit: accept iff hkey <= limit. Exact at
    fraction 1.0 (limit = u64 max). Fraction 0 is refused — 'exclude the
    stratum' is a filter, not a sample (no u64 limit encodes reject-all
    under <=)."""
    thr = threshold_of(fraction)
    if thr == 0:
        raise ValueError(
            f"fraction {fraction} rounds to zero acceptance — filter the "
            "stratum out instead of sampling it at 0")
    return _flip(thr - 1)


def _hash_key_udf(seed: int):
    """int64 column whose SIGNED ascending order equals the UNSIGNED order
    of hash64(id, seed) (sign bit flipped) — lets JVM sorts/comparisons run
    on the bigint without ever seeing unsigned arithmetic."""

    @pandas_udf("long")
    def hkey(ids: pd.Series) -> pd.Series:
        h = hash64(ids.to_numpy(dtype=np.int64), seed)
        return pd.Series((h ^ np.uint64(1 << 63)).view(np.int64))

    return hkey


def sample_hash_threshold(df: DataFrame, id_col: str, threshold: int,
                          seed: int) -> DataFrame:
    """Rows with hash64(id, seed) < threshold (u64 compare). Bernoulli
    p = threshold / 2^64, deterministic per id."""
    if threshold <= 0:
        return df.filter(F.lit(False))
    if threshold >= _P64:
        return df
    return df.filter(_hash_key_udf(seed)(F.col(id_col)) <= F.lit(_flip(threshold - 1)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float,
    seed: int,
) -> DataFrame:
    """Per-stratum Bernoulli sample: keep a row iff
    hash64(id) < threshold(fraction of its stratum). The per-stratum
    thresholds are a small CASE expression (broadcast literal, never a
    join); the hash is one Arrow pass. No shuffle."""
    thr = F.lit(_limit_lit(default_fraction))
    for s, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(_limit_lit(frac))).otherwise(thr)
    return df.filter(_hash_key_udf(seed)(F.col(id_col)) <= thr)


def split_column(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    seed: int,
    out_col: str = "split",
) -> DataFrame:
    """Disjoint multi-way assignment (e.g. train/val/test): the u64 hash
    space is range-partitioned by cumulative fraction, each row lands in
    exactly one named split. Fractions must sum to 1 (within 1e-9).
    Assignment is stable under dataset growth — adding rows never moves an
    existing row's split."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1: {total}")
    if any(f <= 0 for f in splits.values()):
        raise ValueError("every split needs a positive fraction")
    names = list(splits)
    cuts = []
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        cuts.append(_flip(threshold_of(acc)))
    hkey = _hash_key_udf(seed)(F.col(id_col))
    # nested whens, outermost = smallest cut: the FIRST matching cut wins
    expr = F.lit(names[-1])
    for name, cut in list(zip(names[:-1], cuts))[::-1]:
        expr = F.when(hkey < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def hash_topn_per_stratum(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    n: int,
    seed: int,
) -> DataFrame:
    """The n rows with the SMALLEST hash64(id) per stratum, ranked — a
    deterministic fixed-size sample per group (uniform over ids, stable
    across runs; the classic bottom-k/KMV construction, samplers.py's
    BottomKSampler lifted to whole rows). rank is 1-based in unsigned hash
    order with id as the (unreachable) tiebreak."""
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    hkey = _hash_key_udf(seed)(F.col(id_col)).alias("_hkey")
    w = Window.partitionBy(strata_col).orderBy("_hkey", id_col)
    return (
        df.select("*", hkey)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .drop("_hkey")
    )


def token_budget_shards(corpus: DataFrame, budget: int,
                        order_col: str = "doc_id") -> DataFrame:
    """TRAINING-SHARD PACKING at document granularity: assign each doc to
    shard_id = (exclusive token prefix-sum in ``order_col`` order) div
    ``budget`` — consecutive docs fill a shard until ~``budget`` tokens,
    then the next shard starts (a doc whose start lands in shard s belongs
    to s even if it straddles the boundary, so shards hold budget +- one
    doc length). Deterministic: the prefix sum is corpus.with_global_offsets
    — a pure function of row values, NO single-partition window and NO
    global sort (seeded-hash range buckets + per-bucket prefix), the same
    machinery that numbers the one-stream index. Returns the corpus with
    ``shard_id`` added.

    The op a 100 TB pipeline runs last: deterministic, rerun-stable shard
    manifests whose assignment never depends on physical partitioning."""
    if budget < 1:
        raise ValueError("token_budget_shards: budget must be >= 1")
    from ..corpus import with_global_offsets

    if "doc_offset" in corpus.columns:
        if order_col != "doc_id":
            # a pre-existing doc_offset is by repo convention the doc_id
            # prefix sum — silently reusing it for another packing order
            # would produce a wrong manifest with nothing detecting it
            raise ValueError(
                "token_budget_shards: corpus already carries doc_offset "
                f"(doc_id order) but order_col={order_col!r} was requested; "
                "drop the column to recompute in that order"
            )
        off = corpus
    else:
        off = with_global_offsets(corpus, order_col=order_col)
    return off.withColumn("shard_id", F.expr(f"doc_offset div {int(budget)}"))


def shard_stats(corpus: DataFrame, budget: int,
                order_col: str = "doc_id") -> DataFrame:
    """Per-shard manifest of token_budget_shards: (shard_id, n_docs,
    n_tokens, doc_lo, doc_hi) — one map-side-combined groupBy over the
    shard assignment."""
    return (
        token_budget_shards(corpus, budget, order_col)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min(order_col).alias("doc_lo"),
            F.max(order_col).alias("doc_hi"),
        )
    )


def write_training_shards(corpus: DataFrame, budget: int, path: str,
                          order_col: str = "doc_id") -> None:
    """Materialize token_budget_shards as a shard_id-PARTITIONED parquet
    layout: one directory per training shard, so a trainer (or a re-read)
    of shard k opens only shard k's files — partition pruning does the
    manifest lookup. ONE repartition by shard_id before the write keeps
    one writer task per shard directory (the IVF list layout discipline,
    similarity.write_ivf_index)."""
    df = token_budget_shards(corpus, budget, order_col)
    df.repartition("shard_id").write.partitionBy("shard_id").mode(
        "overwrite").parquet(path)


def read_training_shard(spark, path: str, shard_id: int) -> DataFrame:
    """Read ONE training shard from a write_training_shards layout — the
    shard_id equality predicate is a partition filter, so only that shard
    directory's files are ever listed or scanned."""
    return spark.read.parquet(path).filter(F.col("shard_id") == int(shard_id))


def pack_training_sequences(
    corpus: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """SAMPLE PACKING: materialize token_budget_shards as actual training
    sequences — one row per shard with the concatenated token stream of
    its docs (in ``order_col`` order) plus the doc boundary offsets the
    trainer needs to reset attention masks across documents:
    (shard_id, doc_ids, doc_starts, n_tokens, tokens), where
    doc_starts[i] is the 0-based offset of doc_ids[i] inside ``tokens``.

    The manifest/layout/packing trio: token_budget_shards says WHICH shard
    each doc is in, write_training_shards lays docs out for pruned reads,
    this op emits the packed sequences themselves (pass an epoch_key_udf
    column as order_col for per-epoch shuffled packing).

    Scale: ONE groupBy(shard_id) shuffle; every group is bounded by
    ~budget tokens + one straddling doc, so rows stay O(budget) regardless
    of corpus size (a shard is by construction a bounded unit — the
    anti-pattern of collecting unbounded groups does not apply). The
    in-shard concat/boundary prefix sum are codegen'd array HOFs."""
    sh = token_budget_shards(corpus, budget, order_col)
    packed = sh.groupBy("shard_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("k"),
                    F.col(id_col).alias("i"),
                    F.col("n_tok").alias("n"),
                    F.col(tokens_col).alias("t"),
                )
            )
        ).alias("ds")
    )
    starts = F.aggregate(
        "ds",
        F.struct(
            F.lit(0).cast("long").alias("o"),
            F.array().cast("array<long>").alias("a"),
        ),
        lambda acc, d: F.struct(
            (acc["o"] + d["n"]).alias("o"),
            F.concat(acc["a"], F.array(acc["o"])).alias("a"),
        ),
        lambda acc: acc["a"],
    )
    return packed.select(
        "shard_id",
        F.col("ds.i").alias("doc_ids"),
        starts.alias("doc_starts"),
        F.aggregate(
            "ds", F.lit(0).cast("long"), lambda acc, d: acc + d["n"]
        ).alias("n_tokens"),
        F.flatten(F.col("ds.t")).alias(tokens_col),
    )


def mixture_manifest(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weight_col: str,
    budgets: dict[str, int],
    seed: int,
    default_budget: int = 0,
    bucket_bits: int = 8,
) -> DataFrame:
    """DATA-MIXTURE SELECTION: per stratum (source/domain/language), keep
    the deterministic hash-order prefix of rows whose cumulative weight
    fits the stratum's budget — the op that turns per-domain token targets
    ("60% web, 20% code, ...") into a concrete reproducible doc manifest.

    Semantics: within each stratum, rows are ordered by (unsigned
    hash64(id, seed), id); a row is kept iff the total ``weight_col`` of
    rows BEFORE it is < budget(stratum) — the greedy prefix, so budgets
    overshoot by at most one row's weight and the first row of a funded
    stratum is always kept. budget <= 0 excludes the stratum entirely.
    The manifest is a pure function of (ids, seed, budgets): stable across
    reruns, partitionings and engines — and GROWTH-STABLE in the bottom-k
    sense (new rows hash anywhere, but a kept row is only ever displaced
    by new rows hashing below it, never by reordering).

    Scale (why not one window per stratum): a Window.partitionBy(stratum)
    prefix sum puts each stratum's FULL row set on one task — a 60%-web
    stratum at 100 TB is one task. Instead the hash space is cut into
    2^bucket_bits fixed ranges by the key's top bits (uniform by
    construction — no sampling pass needed, unlike with_global_offsets'
    value buckets): (1) per-(stratum, bucket) weight totals -> one tiny
    collect (<= strata * 2^bucket_bits rows); (2) driver prefix over
    buckets; (3) rows join their bucket's base (broadcast), and buckets
    whose base already >= budget are FILTERED BEFORE the within-bucket
    window — the window exchange moves only ~budget worth of rows per
    stratum, not the corpus. Weights must be >= 0 (a negative weight
    breaks the base >= budget prune).

    Returns df's columns + ``cum_weight`` (inclusive prefix sum — the
    budget cut certificate). Two jobs over df (totals + select), like
    with_global_offsets; cache upstream if it is expensive."""
    if not 0 < bucket_bits <= 16:
        raise ValueError(f"bucket_bits must be in (0, 16]: {bucket_bits}")
    bad = {s: b for s, b in budgets.items() if int(b) != b}
    if bad:
        raise ValueError(f"budgets must be integers: {bad}")
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    wt = df.schema[weight_col].dataType
    if not isinstance(wt, (ByteType, ShortType, IntegerType, LongType)):
        # fractional weights would be silently floor()ed into the bucket
        # bases while the in-bucket window sums stay exact — the manifest
        # would then depend on bucket_bits, which must never matter
        raise ValueError(
            f"mixture_manifest: weight_col must be an integer type, got {wt}")
    spark = df.sparkSession
    hkey = _hash_key_udf(seed)(F.col(id_col)).alias("_hkey")
    # arithmetic shift of the sign-flipped key: monotone in unsigned order
    wb = df.select("*", hkey).withColumn(
        "_bucket", F.shiftright(F.col("_hkey"), 64 - bucket_bits)
    )
    budget_expr = F.lit(int(default_budget))
    for s, b in sorted(budgets.items()):
        budget_expr = F.when(
            F.col(strata_col) == s, F.lit(int(b))
        ).otherwise(budget_expr)

    totals = wb.groupBy(strata_col, "_bucket").agg(
        F.sum(weight_col).alias("_tot"),
        F.min(weight_col).alias("_wmin"),  # free ride on the totals pass
        F.sum(F.when(F.col(weight_col).isNull(), 1).otherwise(0))
        .alias("_wnull"),
    ).collect()
    wmin = min((r["_wmin"] for r in totals if r["_wmin"] is not None),
               default=0)
    if wmin < 0:
        raise ValueError(
            f"mixture_manifest: negative weight {wmin} found — prior sums "
            "would no longer be monotone and the base>=budget bucket prune "
            "would silently drop rows the contract keeps")
    if any(r["_wnull"] for r in totals):
        raise ValueError(
            "mixture_manifest: NULL weights found — sum() would silently "
            "skip them, giving those rows a free ride under the budget")
    base_rows, acc = [], {}
    for r in sorted(totals, key=lambda r: (r[strata_col], r["_bucket"])):
        s = r[strata_col]
        base_rows.append((s, r["_bucket"], acc.get(s, 0)))
        acc[s] = acc.get(s, 0) + int(r["_tot"])
    if not base_rows:
        return wb.withColumn("cum_weight", F.lit(0).cast("long")).filter(
            F.lit(False)).drop("_hkey", "_bucket")
    from pyspark.sql.types import LongType, StructField, StructType

    base = spark.createDataFrame(
        base_rows,
        StructType([
            StructField(strata_col, df.schema[strata_col].dataType),
            StructField("_bucket", LongType()),
            StructField("_base", LongType()),
        ]),
    )
    w = (
        Window.partitionBy(strata_col, "_bucket")
        .orderBy("_hkey", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.col("_base") + F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    return (
        wb.join(F.broadcast(base), [strata_col, "_bucket"])
        # bucket prune: every row's prior >= its bucket base
        .filter(F.col("_base") < budget_expr)
        .withColumn("_prior", prior)
        .filter(F.col("_prior") < budget_expr)
        .withColumn(
            "cum_weight",
            (F.col("_prior") + F.col(weight_col)).cast("long"),
        )
        .drop("_hkey", "_bucket", "_base", "_prior")
    )


def _iroot(n: int, q: int) -> int:
    """Exact integer q-th root: floor(n**(1/q)) over arbitrary-precision
    ints (the float seed is corrected, so results are exact at any
    magnitude — float pow alone flips near perfect powers)."""
    if n < 0 or q < 1:
        raise ValueError(f"_iroot: need n >= 0, q >= 1 ({n}, {q})")
    if n == 0 or q == 1:
        return n
    # integer Newton: from any x0 >= root, x_{k+1} = ((q-1)x + n//x^(q-1))//q
    # decreases monotonically to floor(n^(1/q)) and terminates when it
    # stops decreasing — no float anywhere (a float seed overflows past
    # 1e308, and a ±1-stepping correction from a 2x-off seed would walk
    # ~root/2 iterations: both bugs this replaces)
    x = 1 << ((n.bit_length() + q - 1) // q)  # 2^ceil(b/q) >= n^(1/q)
    while True:
        y = ((q - 1) * x + n // x ** (q - 1)) // q
        if y >= x:
            break
        x = y
    # safety fix-ups (at most one step each by the Newton invariant)
    while x ** q > n:
        x -= 1
    while (x + 1) ** q <= n:
        x += 1
    return x


def temperature_budgets(
    totals: dict[str, int], total_budget: int, alpha: tuple[int, int] = (1, 2)
) -> dict[str, int]:
    """Per-stratum budgets under TEMPERATURE reweighting (the T5 /
    multilingual-LM n^alpha discipline): stratum weight w_s =
    floor(tot_s^(p/q)) via the exact integer root, budget_s =
    floor(total_budget * w_s / sum w) — flattening toward uniform as
    alpha -> 0, proportional at alpha = 1. Pure integer arithmetic end to
    end, so budgets (and any manifest built on them) are a deterministic
    function of the totals, reproducible cross-engine."""
    p, q = alpha
    if not (0 < p <= q):
        raise ValueError(f"temperature_budgets: need 0 < p <= q, got {alpha}")
    if total_budget < 0:
        raise ValueError("temperature_budgets: total_budget must be >= 0")
    w = {s: _iroot(int(t) ** p, q) for s, t in totals.items()}
    sw = sum(w.values())
    if sw == 0:
        return {s: 0 for s in totals}
    return {s: (total_budget * ws) // sw for s, ws in w.items()}


def temperature_mixture_manifest(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weight_col: str,
    total_budget: int,
    seed: int,
    alpha: tuple[int, int] = (1, 2),
    bucket_bits: int = 8,
) -> DataFrame:
    """mixture_manifest with budgets DERIVED from the data: one tiny
    per-stratum totals job (|strata| rows to the driver — domains, not
    documents), temperature_budgets, then the bucketed greedy-prefix
    selection. Strata absent from the totals cannot appear in df, so
    default_budget never engages (0 for safety)."""
    totals = {
        r[0]: int(r[1])
        for r in df.groupBy(strata_col)
        .agg(F.sum(F.col(weight_col).cast("long")))
        .collect()
    }
    budgets = temperature_budgets(totals, total_budget, alpha)
    return mixture_manifest(
        df, id_col, strata_col, weight_col, budgets, seed,
        default_budget=0, bucket_bits=bucket_bits)


# epoch mixing constant: odd, so epoch -> eseed is a bijection mod 2^64
_EPOCH_MIX = 0x632BE59BD9B4E019


def epoch_seed(seed: int, epoch: int) -> int:
    """The derived u64 seed of a training epoch — computed ONCE in Python
    and inlined on both engines (the threshold_of discipline)."""
    return (seed + _EPOCH_MIX * int(epoch)) % _P64


def epoch_key_udf(seed: int, epoch: int):
    """String column ``%016x(hash64(id, epoch_seed)) || '-' || id``: unique
    per id, and LEXICOGRAPHIC order == unsigned hash order (fixed-width
    lowercase hex), so it drops into any order_col slot —
    token_budget_shards(corpus, budget, order_col=epoch_key) packs
    EPOCH-SHUFFLED training shards: each epoch is an independent-looking
    deterministic permutation, same epoch always the same shards, and the
    shard build still runs through with_global_offsets' distributed
    prefix sum (no global sort). The id suffix only breaks 64-bit hash
    ties — any suffix order is fine, it just must match the SQL twin
    (CAST(id AS VARCHAR))."""
    eseed = epoch_seed(seed, epoch)

    @pandas_udf("string")
    def ekey(ids: pd.Series) -> pd.Series:
        iv = ids.to_numpy(dtype=np.int64)
        h = hash64(iv, eseed)
        hx = h.astype(">u8").tobytes().hex()
        return pd.Series(
            [hx[16 * i:16 * i + 16] + "-" + str(int(d))
             for i, d in enumerate(iv)]
        )

    return ekey


def drop_bottom_quantile(
    df: DataFrame,
    metric_col: str,
    frac_num: int,
    frac_den: int,
    group_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group QUALITY PRUNING: drop each group's bottom
    floor(n * frac_num / frac_den) rows by (metric, id) rank — the
    C4-style 'cut the worst decile per source' gate, made deterministic:
    ties break on id, the fraction is a RATIONAL so the cutoff is integer
    arithmetic (float rank math rounds differently across engines), and a
    row's fate depends only on the group's sorted multiset. frac 0 keeps
    everything; frac_num >= frac_den (drop all) is refused — an empty
    corpus is never what a pipeline wants from a quality gate.

    Shape: ONE window exchange per group (row_number and the group count
    share the partitionBy(group) sort); the filter is a codegen'd integer
    comparison. No driver collects, no second shuffle. NB the UNGROUPED
    form (group_col=None) is a single global window — every row
    serializes through one task; fine for small frames, but at scale
    always pass a group_col (the per-stratum cut is the pipeline op)."""
    from pyspark.sql import Window

    if frac_num < 0 or frac_den <= 0:
        raise ValueError("drop_bottom_quantile: need frac_num >= 0, frac_den > 0")
    if frac_num >= frac_den:
        raise ValueError(
            "drop_bottom_quantile: frac_num/frac_den >= 1 would drop every row")
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(
        F.col(metric_col).asc(), F.col(id_col).asc())
    wn = Window.partitionBy(*part)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .filter(F.expr(f"__rk > (__n * {int(frac_num)}) div {int(frac_den)}"))
        .drop("__rk", "__n")
    )


def _ares_score_udf(seed: int):
    """A-Res priority score = -ln(u) / w (exponential with rate w) for
    u = ((hash64(id, seed) >> 11) + 1) * 2^-53 — the 53-bit-mantissa trick
    makes the int->double conversion EXACT (no rounding anywhere before the
    log), so both engines see bit-identical u. The log itself runs through
    glibc via per-element math.log: numpy's SIMD log rounds differently
    from DuckDB's ln() on ~a third of inputs (measured), while
    math.log == DuckDB ln bit-for-bit (the text.bm25 _dlit lesson). The
    element loop is inside the Arrow batch (thousands of ns-scale calls
    per batch, not a row-at-a-time Spark UDF); at 100 TB swap in np.log
    and a gap-robust comparison contract if the last-ulp guarantee is ever
    worth trading away."""
    import math

    @pandas_udf("double")
    def score(ids: pd.Series, weights: pd.Series) -> pd.Series:
        h = hash64(ids.to_numpy(dtype=np.int64), seed)
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) * (2.0 ** -53)
        w = weights.to_numpy(dtype=np.float64)
        if len(w) and (not np.isfinite(w).all() or (w <= 0.0).any()):
            raise ValueError("weighted_sample_topn: weights must be positive and finite")
        lnu = np.fromiter((math.log(x) for x in u), dtype=np.float64, count=len(u))
        return pd.Series(-lnu / w)

    return score


def weighted_sample_topn(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: int,
    strata_col: str | None = None,
    score_col: str = "ws_score",
    rank_col: str = "ws_rank",
) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis-Spirakis A-Res):
    the n rows with the SMALLEST priority -ln(u)/w — inclusion probability
    proportional to weight, exactly the reservoir scheme training mixtures
    use to sample docs by quality/length scores. Like everything in this
    module the sample is a pure function of (id, weight, seed): no RNG
    state, reproducible across runs/partitionings/engines, and
    VALUE-checkable cross-engine (bit-exact scores, see _ares_score_udf).

    strata_col=None: global top-n — orderBy+limit, a TakeOrdered partial
    per map task (never a full sort). With strata_col: one window exchange
    keyed by stratum, rank_col is 1-based per stratum. Ties (astronomically
    unlikely distinct-hash score ties) break on id so the boundary is
    deterministic on both engines."""
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    scored = df.withColumn(
        score_col, _ares_score_udf(seed)(F.col(id_col), F.col(weight_col)))
    if strata_col is None:
        return (
            scored.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
            .limit(n)
            .withColumn(rank_col, F.lit(None).cast("long"))
        )
    w = Window.partitionBy(strata_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc())
    return (
        scored.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= n)
    )


# ---------------------------------------------------------------------------
# Sketch-driven balanced RANGE partitioning: boundaries from a one-pass KLL
# merge (not Spark's per-job reservoir sample, which re-draws every run),
# bucket assignment as a pure codegen'd expression, and a certified balance
# check that REFUSES on skew instead of silently writing a lopsided layout.
# This is the explicit partitioning/skew lever the north_rule names: at
# 100 TB the boundaries come from the same cheap sketch pass that profiles
# the table, are deterministic for a fixed input layout, and can be
# PERSISTED with the layout so later writers agree on bucket identity
# (Spark's repartitionByRange cannot promise any of that).
# ---------------------------------------------------------------------------


def kll_column_boundaries(df: DataFrame, col: str, n_buckets: int,
                          k: int = 200, seed: int = 0) -> list[float]:
    """``n_buckets - 1`` range boundaries for ``col`` at the i/n_buckets
    quantiles of a one-pass KLL merge: one blob per Arrow batch (tiny
    partial table — the profile_columns discipline), collected and merged
    driver-side. Partials are sorted lexicographically before the merge so
    the boundaries are DETERMINISTIC for a fixed input file layout (KLL
    merge bytes are order-dependent; the sort pins the order)."""
    from ..sketches import kll as kllk

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")

    def part(batches):
        for pdf in batches:
            v = pdf[col].dropna().to_numpy().astype(np.float64)
            if len(v) == 0:
                continue
            yield pd.DataFrame(
                {"kll": [kllk.leaf_window_blobs(v, len(v), k, seed)[0]]})

    blobs = sorted(
        bytes(r["kll"])
        for r in df.select(col).mapInPandas(part, schema="kll binary").collect()
    )
    if not blobs:
        raise ValueError(f"kll_column_boundaries: no non-null values in {col!r}")
    merged = kllk.merge_blob_groups(blobs, np.asarray([len(blobs)], dtype=np.int64))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    return [float(b) for b in kllk.quantile_blobs(merged, qs)[0]]


def sketch_range_buckets(df: DataFrame, col: str, n_buckets: int,
                         bucket_col: str = "bucket", k: int = 200,
                         seed: int = 0) -> tuple[DataFrame, list[float]]:
    """(df + bucket column, boundaries): bucket i holds rows with
    boundaries[i-1] <= col < boundaries[i] (buckets 0..n_buckets-1; nulls
    land in bucket 0). Assignment is a pure whole-stage-codegen expression
    (a sum of n_buckets - 1 comparisons against inlined literals — no
    shuffle, no UDF), so downstream writers can ``partitionBy(bucket_col)``
    or ``repartition(n_buckets, bucket_col)`` a deterministic layout."""
    bnds = kll_column_boundaries(df, col, n_buckets, k=k, seed=seed)
    expr = F.lit(0).cast("long")
    for b in bnds:
        expr = expr + F.when(F.col(col) >= F.lit(b), 1).otherwise(0)
    return df.withColumn(bucket_col, expr.cast("long")), bnds


def certified_bucket_counts(bucketed: DataFrame, n_buckets: int,
                            bucket_col: str = "bucket",
                            max_rel_dev: float = 0.5) -> DataFrame:
    """(bucket, n_rows) for a sketch-bucketed frame, with an in-plan BALANCE
    CERTIFICATE: every bucket's count must lie within
    (1 +- max_rel_dev) * n/n_buckets, else the query raises instead of
    blessing a lopsided layout. A refusal is the SKEW SIGNAL — a value
    heavier than n/n_buckets can never be range-balanced (all its copies
    share a bucket); salt it (operators/skew.py) or hash-partition instead.
    Missing buckets (possible under duplicate-collapsed boundaries) are
    reported as zero rows and fail the same certificate."""
    spark = bucketed.sparkSession
    cats = spark.range(int(n_buckets)).select(F.col("id").alias(bucket_col))
    counts = (
        cats.join(bucketed.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("n_rows")),
                  [bucket_col], "left")
        .fillna(0, subset=["n_rows"])
    )
    w = Window.partitionBy()
    tot = F.sum("n_rows").over(w)
    dev_ok = (
        (F.col("n_rows") * F.lit(int(n_buckets))).cast("double")
        >= tot.cast("double") * F.lit(1.0 - float(max_rel_dev))
    ) & (
        (F.col("n_rows") * F.lit(int(n_buckets))).cast("double")
        <= tot.cast("double") * F.lit(1.0 + float(max_rel_dev))
    )
    msg = F.concat(
        F.lit("certified_bucket_counts: bucket "),
        F.col(bucket_col).cast("string"),
        F.lit(" holds "), F.col("n_rows").cast("string"),
        F.lit(" rows vs ideal "),
        (tot / F.lit(int(n_buckets))).cast("long").cast("string"),
        F.lit(" (+- "), F.lit(f"{float(max_rel_dev):g}"),
        F.lit(") — a heavy value cannot be range-balanced; salt it "
              "(operators/skew.py) or hash-partition instead"),
    )
    return counts.select(
        F.when(~dev_ok, F.raise_error(msg)).otherwise(F.col(bucket_col)).alias(bucket_col),
        "n_rows",
    )


def write_bucketed_layout(df: DataFrame, col: str, n_buckets: int, path: str,
                          k: int = 200, seed: int = 0) -> list[float]:
    """Persist ``df`` laid out by its sketch range buckets: ``path/data`` is
    parquet partitioned by the bucket column (one directory per bucket, so
    a column-range predicate prunes whole directories), ``path/meta`` pins
    (col, boundaries) — readers take the boundary-to-bucket translation
    from meta, never from callers. Returns the boundaries. This is the
    100 TB data-skipping story completed: the same one-pass KLL that
    profiles the column decides the layout, deterministically."""
    bucketed, bnds = sketch_range_buckets(df, col, n_buckets, k=k, seed=seed)
    bucketed.write.partitionBy("bucket").mode("error").parquet(f"{path}/data")
    spark = df.sparkSession
    spark.createDataFrame(
        [(col, int(n_buckets), list(bnds))],
        "col string, n_buckets int, boundaries array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    return bnds


def read_bucket_pruned(spark, path: str, lo: float, hi: float) -> DataFrame:
    """Rows of a bucketed layout with ``lo <= col < hi`` — the bucket range
    covering [lo, hi) comes from the persisted boundaries and lands in the
    scan as a PARTITION filter (whole bucket directories never open); the
    exact column predicate closes the contract (pruning only prunes — the
    same slicing discipline as the range-sliced pattern index). Scans
    ceil((hi-lo)/bucket_width)-ish directories out of n_buckets regardless
    of table size."""
    import bisect

    if not (lo < hi):
        raise ValueError(f"read_bucket_pruned: require lo < hi, got ({lo}, {hi})")
    meta = spark.read.parquet(f"{path}/meta").first()
    col, bnds = meta["col"], list(meta["boundaries"])
    b_lo = bisect.bisect_right(bnds, lo)   # bucket holding value lo
    b_hi = bisect.bisect_right(bnds, hi)   # superset: hi is exclusive, but
    # a boundary equal to hi still maps values just below it into b_hi - 1;
    # the exact predicate below discards any over-read
    return (
        spark.read.parquet(f"{path}/data")
        .filter((F.col("bucket") >= b_lo) & (F.col("bucket") <= b_hi))
        .filter((F.col(col) >= F.lit(float(lo))) & (F.col(col) < F.lit(float(hi))))
    )
