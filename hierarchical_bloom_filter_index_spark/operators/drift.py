"""Exact corpus drift: total-variation distance between grouped token
distributions, with per-token attribution and an incrementally
maintained streaming twin.

Training-data pipelines need drift monitoring — "did source X's token
mix shift between snapshots / does source A look like source B" — and
the usual divergences (KL, JS) force floating-point logs whose sum
order differs across engines. Total variation distance does not:

    TVD(P_a, P_b) = (1/2) * sum_t |p_a(t) - p_b(t)|
                  = ( sum_t |c_a(t)*N_b - c_b(t)*N_a| ) / (2*N_a*N_b)

with c_g(t) the raw token counts and N_g the group totals — the
numerator is a SUM OF NON-NEGATIVE INTEGERS (order-free, exact), and
the single final division is deterministic. Carried as DECIMAL(38,0)
on the Spark side / HUGEINT in DuckDB (the stats.py discipline), the
numerator is a value-equality across engines, not a tolerance.

Shapes (design-for-100-TB):
- ``group_token_counts``: ONE map-side-combined groupBy over the
  exploded corpus — the only pass that touches token data. Its output
  is at most |vocab| x |groups| rows (a real BPE vocab ~1e5-1e6 and
  thousands of sources is still a few 1e8 rows of 3 columns — small
  relative to the corpus; persist it when fanning out to many pairs).
- ``pairwise_tvd``: never materializes the full outer token x pair
  matrix. An INNER self-join on token covers shared tokens; tokens
  private to one side contribute sum(c_a) = N_a - (shared mass), so the
  correction is a closed form of the inner aggregates — disjoint
  vocabularies need no join rows at all (their TVD is exactly 1).
  Join key is `token` with at most |groups| rows per side per key, so
  the worst key fans out to |groups|^2 pairs — bounded by the group
  dimension, not the data.
- ``tvd_contributors``: conditional aggregation (one shuffle) + top-k
  via orderBy/limit (TakeOrderedAndProject — no global sort).
- Counts are trivially mergeable (integer sums), so the streaming twin
  is `replay_guarded_append` of per-batch count deltas; the readout
  re-aggregates base+deltas and feeds the SAME pairwise_tvd.

At true 10^12-token scale the DECIMAL(38,0) products c*N stay exact
(c, N < 1e15 -> products < 1e30 < 1e38); the float `tvd` column is the
one rounded value and `tvd_num` (exact integer as text) is the
hard-compare column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_DEC = "decimal(38,0)"


def group_token_counts(corpus: DataFrame, group_col: str = "source") -> DataFrame:
    """(grp, token, cnt) — exact unigram counts per group. One
    map-side-combined groupBy over the exploded token arrays."""
    return (
        corpus.select(F.col(group_col).alias("grp"),
                      F.explode("tokens").alias("token"))
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def group_totals(counts: DataFrame) -> DataFrame:
    """(grp, n) — total token mass per group (tiny: one row per group)."""
    return counts.groupBy("grp").agg(F.sum("cnt").cast(_DEC).alias("n"))


def pairwise_tvd(counts: DataFrame) -> DataFrame:
    """Total-variation distance between every unordered pair of groups'
    token distributions: (source_a, source_b, n_a, n_b, shared_tokens,
    tvd_num, tvd).

    ``tvd_num`` is the exact integer numerator sum|c_a*N_b - c_b*N_a|
    (DECIMAL(38,0) rendered as text — round-trips exactly); ``tvd`` =
    tvd_num / (2*N_a*N_b) as the one float. Tokens present in only one
    group are handled by the closed-form correction (see module doc),
    so a pair with disjoint vocabularies — zero inner-join rows — comes
    out at exactly 1.0.

    The counts input feeds FOUR subtrees (totals, both self-join sides,
    shared-mass sums); an unmaterialized plan would re-run the corpus
    explode+groupBy once per subtree — localCheckpoint it (tiny by the
    vocab x groups contract), so the corpus is scanned ONCE however wide
    the pair fan-out."""
    counts = counts.localCheckpoint()
    tot = group_totals(counts)
    c = counts.join(F.broadcast(tot), "grp").select(
        "grp", "token", F.col("cnt").cast(_DEC).alias("c"), "n")
    a, b = c.alias("a"), c.alias("b")
    inner = (
        a.join(b, (F.col("a.token") == F.col("b.token"))
               & (F.col("a.grp") < F.col("b.grp")))
        .groupBy(F.col("a.grp").alias("ga"), F.col("b.grp").alias("gb"))
        .agg(
            F.sum(F.abs(F.col("a.c") * F.col("b.n")
                        - F.col("b.c") * F.col("a.n"))).alias("inum"),
            F.sum("a.c").alias("sa"),
            F.sum("b.c").alias("sb"),
            F.count(F.lit(1)).cast("long").alias("shared_tokens"),
        )
    )
    ta, tb = tot.alias("ta"), tot.alias("tb")
    pairs = ta.join(tb, F.col("ta.grp") < F.col("tb.grp")).select(
        F.col("ta.grp").alias("ga"), F.col("ta.n").alias("na"),
        F.col("tb.grp").alias("gb"), F.col("tb.n").alias("nb"))
    z = F.lit(0).cast(_DEC)
    num = (F.coalesce(F.col("inum"), z)
           + (F.col("na") - F.coalesce(F.col("sa"), z)) * F.col("nb")
           + (F.col("nb") - F.coalesce(F.col("sb"), z)) * F.col("na"))
    return (
        pairs.join(inner, ["ga", "gb"], "left")
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.coalesce(F.col("shared_tokens"), F.lit(0).cast("long"))
            .alias("shared_tokens"),
            num.cast(_DEC).cast("string").alias("tvd_num"),
            (num.cast("double")
             / (F.lit(2).cast(_DEC) * F.col("na") * F.col("nb"))
             .cast("double")).alias("tvd"),
        )
    )


def tvd_contributors(counts: DataFrame, grp_a: str, grp_b: str,
                     k: int = 20) -> DataFrame:
    """Top-k tokens driving TVD(grp_a, grp_b): (token, cnt_a, cnt_b,
    contrib, tvd_share) ordered by (contrib DESC, token ASC) — the
    deterministic tie-break makes the k-th boundary reproducible.
    ``contrib`` = |c_a*N_b - c_b*N_a| exact (text); ``tvd_share`` =
    contrib / (2*N_a*N_b), so sum over ALL tokens of tvd_share = tvd."""
    if k < 1:
        raise ValueError("tvd_contributors: k must be >= 1")
    # two subtrees (per-token pivot + totals) — one corpus pass, not two
    two = counts.filter(F.col("grp").isin([grp_a, grp_b])).localCheckpoint()
    per_tok = two.groupBy("token").agg(
        F.coalesce(F.sum(F.when(F.col("grp") == grp_a, F.col("cnt"))),
                   F.lit(0)).cast("long").alias("cnt_a"),
        F.coalesce(F.sum(F.when(F.col("grp") == grp_b, F.col("cnt"))),
                   F.lit(0)).cast("long").alias("cnt_b"),
    )
    tots = two.groupBy().agg(
        F.coalesce(F.sum(F.when(F.col("grp") == grp_a, F.col("cnt"))),
                   F.lit(0)).cast(_DEC).alias("na"),
        F.coalesce(F.sum(F.when(F.col("grp") == grp_b, F.col("cnt"))),
                   F.lit(0)).cast(_DEC).alias("nb"),
    )
    contrib = F.abs(F.col("cnt_a").cast(_DEC) * F.col("nb")
                    - F.col("cnt_b").cast(_DEC) * F.col("na"))
    return (
        per_tok.join(F.broadcast(tots))
        .select(
            "token", "cnt_a", "cnt_b",
            contrib.cast(_DEC).alias("_contrib"),
            (contrib.cast("double")
             / (F.lit(2).cast(_DEC) * F.col("na") * F.col("nb"))
             .cast("double")).alias("tvd_share"),
        )
        .orderBy(F.col("_contrib").desc(), F.col("token").asc())
        .limit(int(k))
        .select("token", "cnt_a", "cnt_b",
                F.col("_contrib").cast("string").alias("contrib"),
                "tvd_share")
    )


# ---------------------------------------------------------------------------
# streaming maintenance: counts are integer-mergeable, so the stream is
# the generic replay-guarded delta append + a re-aggregating readout
# ---------------------------------------------------------------------------
_DOCS_SCHEMA = ("doc_id string, text string, lang string, source string")


def token_counts_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    out_path: str,
    group_col: str = "source",
):
    """Structured Streaming maintenance of the drift count table:
    documents-shaped parquet files land in ``input_path``; each
    micro-batch appends its own (grp, token, cnt) partial counts (plus
    batch_id) to ``out_path`` via the shared replay-guarded foreachBatch
    discipline. Counts are integer-mergeable, so partials from any batch
    split sum to the batch run — ``read_group_token_counts`` is the one
    readout. Returns the started availableNow query (caller awaits)."""
    from ..functions import codepoint_tokens
    from ..streaming.incremental import replay_guarded_append

    def build(batch_df: DataFrame) -> DataFrame:
        corpus = batch_df.select(
            codepoint_tokens("text").alias("tokens"), F.col(group_col))
        return group_token_counts(corpus, group_col)

    stream = spark.readStream.schema(_DOCS_SCHEMA).parquet(input_path)
    return (
        stream.writeStream
        .foreachBatch(lambda df, bid: replay_guarded_append(
            out_path, df, bid, build))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_group_token_counts(spark: SparkSession, out_path: str) -> DataFrame:
    """Readout for the streamed count table: re-aggregate the per-batch
    partials (appends AND removal deltas) into the exact (grp, token,
    cnt) counts — byte-identical to a batch `group_token_counts` over
    delivered-minus-removed docs. Tokens removed to zero drop; a
    NEGATIVE total means someone removed content that was never counted
    and raises IN THE PLAN (a silently clamped count would poison every
    TVD built on it)."""
    msg = F.lit("read_group_token_counts: negative total — removal of "
                "never-counted content (check removal inputs)")
    tot = (
        spark.read.parquet(out_path)
        .groupBy("grp", "token")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return (
        tot.select(
            "grp", "token",
            F.when(F.col("cnt") < 0, F.raise_error(msg).cast("long"))
            .otherwise(F.col("cnt")).alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def remove_token_counts(out_path: str, docs: DataFrame, removal_id: int,
                        group_col: str = "source") -> None:
    """Content TAKEDOWN from the drift count table by LINEAR SUBTRACTION:
    append the removed documents' counts NEGATED, tagged batch_id =
    -removal_id. Counts are signed-mergeable, so the readout equals a
    scratch rebuild over the surviving corpus (the lm.py / global-CMS
    takedown discipline). ``removal_id`` is caller-chosen and >= 1 —
    negative ids are disjoint from the stream's micro-batch ids, so the
    SAME replay guard makes removals idempotent (re-running a removal is
    a no-op, not a double subtraction)."""
    if removal_id < 1:
        raise ValueError("remove_token_counts: removal_id must be >= 1")
    from ..functions import codepoint_tokens
    from ..streaming.incremental import replay_guarded_append

    def build(batch_df: DataFrame) -> DataFrame:
        corpus = batch_df.select(
            codepoint_tokens("text").alias("tokens"), F.col(group_col))
        return group_token_counts(corpus, group_col).select(
            "grp", "token", (-F.col("cnt")).cast("long").alias("cnt"))

    replay_guarded_append(out_path, docs, -int(removal_id), build)


def grouped_ks(df: DataFrame, value_col: str, group_col: str = "source",
               k: int = 200, seed: int = 0) -> DataFrame:
    """CONTINUOUS drift: pairwise two-sample Kolmogorov-Smirnov distance
    between every pair of groups' value distributions, estimated from
    per-group KLL sketches — (source_a, source_b, n_a, n_b, ks).

    One distributed pass builds a KLL per group (mapInPandas partials +
    tree fan-in via aggregates.sketch_aggregate — only sketch blobs
    shuffle); the pairwise readout runs driver-side over the collected
    per-group sketches (tiny by the group-dimension contract, like
    pairwise_tvd's totals). |ks - true KS| <= eps_a + eps_b (the KLL
    normalized rank errors; kernel doc in sketches/kll.ks_distance) —
    an ESTIMATE op: its contract is that bound, tested in pytest, not a
    SQL oracle (KLL bytes are batching-dependent)."""
    from ..sketches import KLL
    from ..sketches.kll import ks_statistic
    from .aggregates import grouped_sketches, sketch_aggregate

    spark = df.sparkSession
    sk = grouped_sketches(sketch_aggregate(
        df.select(F.col(group_col).cast("string").alias("grp"),
                  F.col(value_col).cast("double").alias("v")),
        "v", lambda: KLL(k=int(k), seed=int(seed)), group_cols=("grp",)))
    groups = sorted(g for (g,) in sk)
    rows = [
        (ga, gb, int(sk[(ga,)].n), int(sk[(gb,)].n),
         *ks_statistic(sk[(ga,)], sk[(gb,)]))
        for i, ga in enumerate(groups) for gb in groups[i + 1:]
    ]
    return spark.createDataFrame(
        rows, "source_a string, source_b string, n_a long, n_b long, "
              "ks double, ks_x double")


def compact_token_counts(spark: SparkSession, out_path: str) -> int:
    """Fold the accumulated count deltas (appends + removals) into ONE
    row per (grp, token) and rewrite ``out_path``; returns the compacted
    row count. Zero totals drop (their content is fully removed),
    negative totals REFUSE (same contract as the readout — compacting
    corruption away would hide it forever). Compacted rows keep
    batch_id = max(applied) so the replay guard still recognizes the one
    batch at-least-once delivery can redeliver; every APPLIED REMOVAL id
    additionally keeps a zero-count marker row (cnt=0 adds nothing to
    any sum and the readout drops zero totals), because the removal
    guard probes its own -removal_id — folding the markers away would
    make a retried removal double-subtract. Like every compactor here,
    must not run concurrently with an active stream. The plan is
    localCheckpoint'ed before the overwrite (it deletes the files the
    lazy plan reads — the standing compaction trap)."""
    src = spark.read.parquet(out_path)
    max_bid = src.agg(F.max("batch_id")).first()[0]
    if max_bid is None:
        return 0
    markers = (
        src.select("batch_id").where(F.col("batch_id") < 0).distinct()
        .select(F.lit("").alias("grp"), F.lit(-1).alias("token"),
                F.lit(0).cast("long").alias("cnt"), "batch_id")
    )
    folded = (
        read_group_token_counts(spark, out_path)
        .withColumn("batch_id", F.lit(int(max_bid)).cast("long"))
        .unionByName(markers)
        .localCheckpoint()
    )
    folded.write.mode("overwrite").parquet(out_path)
    return folded.where(F.col("cnt") != 0).count()


def doc_group_tvd(corpus: DataFrame, group_col: str = "source") -> DataFrame:
    """Distributional ATYPICALITY of every document against its own
    group's corpus-wide token distribution: (doc_id, grp, n_tok,
    tvd_num, tvd) where tvd = TVD(doc's token distribution, group's).
    A gibberish page inside a clean source — or a doc in the wrong
    language — scores high; typical docs score low. Same exact-integer
    algebra as pairwise_tvd with the doc as the 'a' side:

        num = sum_{t in doc} |c_d(t)*N_g - c_g(t)*n_d|
              + (N_g - sum_{t in doc} c_g(t)) * n_d     (group-only mass)
        tvd = num / (2 * n_d * N_g)

    Shapes: one (grp, token) counts shuffle (shared with pairwise_tvd),
    one (doc, token) explode+groupBy, one linear join on (grp, token),
    one per-doc aggregate — everything map-side-combinable, no
    quadratic term anywhere (the doc never joins other docs)."""
    counts = group_token_counts(corpus, group_col).localCheckpoint()
    tot = group_totals(counts)
    doc_tok = (
        corpus.select(F.col("doc_id"), F.col(group_col).alias("grp"),
                      F.col("n_tok"), F.explode("tokens").alias("token"))
        .groupBy("doc_id", "grp", "n_tok", "token")
        .agg(F.count(F.lit(1)).cast(_DEC).alias("cd"))
    )
    j = (
        doc_tok.join(counts.withColumnRenamed("cnt", "cg"), ["grp", "token"])
        .join(F.broadcast(tot), "grp")
        .withColumn("cg", F.col("cg").cast(_DEC))
    )
    nd = F.col("n_tok").cast(_DEC)
    per_doc = (
        j.groupBy("doc_id", "grp", "n_tok")
        .agg(
            F.sum(F.abs(F.col("cd") * F.col("n") - F.col("cg") * nd))
            .alias("inum"),
            F.sum("cg").alias("s_cov"),
            F.first("n").alias("n_g"),
        )
    )
    num = (F.col("inum")
           + (F.col("n_g") - F.col("s_cov")) * F.col("n_tok").cast(_DEC))
    return per_doc.select(
        "doc_id", "grp", "n_tok",
        num.cast(_DEC).cast("string").alias("tvd_num"),
        (num.cast("double")
         / (F.lit(2).cast(_DEC) * F.col("n_tok").cast(_DEC) * F.col("n_g"))
         .cast("double")).alias("tvd"),
    )
