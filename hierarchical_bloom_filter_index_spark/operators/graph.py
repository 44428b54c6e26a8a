"""Graph metrics over similarity/near-dup PAIR graphs.

The dedup family emits edge lists (exact-Jaccard pairs, LSH near-dup
pairs, CDC shared-chunk pairs) and already clusters them
(dedup.connected_components).  This module adds the structural metrics a
curation pipeline reads before deciding what to drop: degree statistics
(how duplicated is the most-duplicated doc?) and the triangle count (are
near-dup clusters cliques — true duplicates — or sparse chains of
borderline pairs?).

Triangle counting uses the degree-ordered orientation (Schank/Wagner,
the standard distributed formulation, also the MapReduce NodeIterator++
design of Suri & Vassilvitskii): every undirected edge {u, v} is
directed from the endpoint with the smaller (degree, id) to the larger,
so each triangle {a, b, c} (ranked a < b < c) contributes exactly one
wedge (b, c) at its lowest-ranked vertex a and is found by joining that
wedge against the oriented edge b -> c.  Out-degrees under this
orientation are O(sqrt(m)), which is precisely the skew bound that makes
the wedge self-join survive power-law degree distributions at 100 TB —
a hub of degree d contributes d^2 wedges undirected but only
out_deg^2 <= m oriented.  Everything is DataFrame joins/aggregations
(two shuffles for degrees + orientation, one self-join for wedges, one
semi-join to close them); no driver-side graph state.

All outputs are exact integers, so the driver twins are plain SQL
3-way-join equalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonical_edges(edges: DataFrame, a_col: str = "doc_a",
                    b_col: str = "doc_b") -> DataFrame:
    """Undirected edge list as distinct (a, b) with a < b; self-loops
    dropped.  The normalization every metric below assumes."""
    a, b = F.col(a_col), F.col(b_col)
    return (edges
            .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct())


def degree_table(edges: DataFrame, a_col: str = "doc_a",
                 b_col: str = "doc_b") -> DataFrame:
    """(node, degree) over the canonical edge set."""
    e = canonical_edges(edges, a_col, b_col)
    ends = e.select(F.col("a").alias("node")).unionAll(
        e.select(F.col("b").alias("node")))
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def triangle_count(edges: DataFrame, a_col: str = "doc_a",
                   b_col: str = "doc_b") -> int:
    """Exact triangle count via degree-ordered orientation (see module
    docstring).  Returns a Python int (the count is a scalar)."""
    e = canonical_edges(edges, a_col, b_col).localCheckpoint()
    return _triangle_count_canonical(e, degree_table(e, "a", "b"))


def _triangle_count_canonical(e: DataFrame, deg: DataFrame) -> int:
    """Triangle count over an ALREADY canonical (a < b, distinct,
    materialized) edge frame with its degree table — the shared body, so
    graph_stats never re-canonicalizes / re-checkpoints / re-counts
    degrees over edges it already processed."""
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    ranked = e.join(da, "a").join(db, "b")
    # orient low (degree, id) -> high (degree, id); ties broken by id,
    # and a/b are already distinct so the order is total
    fwd = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b")))
    oriented = ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"))
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = (o1.join(o2, (F.col("o1.src") == F.col("o2.src"))
                      & (F.col("o1.dst") < F.col("o2.dst")))
              .select(F.col("o1.dst").alias("u"), F.col("o2.dst").alias("v")))
    # close the wedge against the UNDIRECTED edge set: the u-v edge's own
    # orientation depends on u and v's ranks, not the wedge apex's
    closing = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v")))
    return wedges.join(closing, ["u", "v"], "left_semi").count()


def pagerank_scaled(
    edges: DataFrame,
    iters: int = 5,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
    src_col: str = "u",
    dst_col: str = "v",
) -> DataFrame:
    """Deterministic fixed-iteration PageRank over a DIRECTED edge list,
    in pure BIGINT fixed-point arithmetic — (node, score) with score on a
    ``scale`` denominator after ``iters`` power iterations.

    Float PageRank is accumulation-order-dependent (parallel float sums
    re-associate), so a float twin can never be hash-equal cross-engine.
    This one is exact: per iteration each node emits
    ``c_u = floor(s_u / outdeg_u)`` once (a pure function of the previous
    state), in-messages are INTEGER sums (order-free), and the update is
    ``s'_v = floor(scale*(den-num) / (den*n)) + floor(num * sum_v / den)``
    with damping = num/den — every operation a floor over non-negative
    integers, identical in Spark `div` and DuckDB `//`. Multi-edges count
    multiply (pass a distinct frame for the simple-graph semantics);
    dangling nodes (no out-edges) keep receiving the teleport base while
    their own mass leaks, the standard "lost mass" variant — deterministic
    either way, documented rather than redistributed.

    Scale shape: the edge list is repartitioned by src ONCE and persisted —
    each iteration is one src-partitioned join (contributions onto edges)
    plus one groupBy(dst) shuffle, i.e. edge-only shuffles, O(iters)
    rounds, no driver-side graph state; the per-round frontier is
    localCheckpoint'ed (the connected-components iterative-lineage
    discipline). Reference analog: none (the reference has no graph ops) —
    this serves the curation pipeline's centrality readout over similarity
    graphs and relational entity graphs."""
    if iters < 0:
        raise ValueError("pagerank_scaled: iters must be >= 0")
    num, den = damping
    if not (0 < num < den):
        raise ValueError("pagerank_scaled: damping must satisfy 0 < num < den")
    e = (edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
         .repartition("u").persist())
    nodes = (e.select(F.col("u").alias("node"))
             .unionAll(e.select(F.col("v").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return nodes.select("node", F.lit(0).cast("bigint").alias("score"))
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
    base = (scale * (den - num)) // (den * n)
    scores = nodes.select("node", F.lit(scale // n).cast("bigint").alias("s"))
    for _ in range(iters):
        contrib = (scores.join(deg, scores["node"] == deg["u"])
                   .select("u", F.expr("s div d").alias("c")))
        msgs = (e.join(contrib, "u")
                .groupBy("v").agg(F.sum("c").alias("m")))
        scores = (nodes.join(msgs, nodes["node"] == msgs["v"], "left")
                  .select("node",
                          (F.lit(base)
                           + F.expr(f"({num} * coalesce(m, 0)) div {den}"))
                          .cast("bigint").alias("s"))
                  .localCheckpoint())
    e.unpersist()
    return scores.select("node", F.col("s").alias("score"))


def graph_stats(edges: DataFrame, a_col: str = "doc_a",
                b_col: str = "doc_b") -> DataFrame:
    """One-row (n_nodes, n_edges, n_triangles, max_degree, sum_wedges)
    structural summary of a pair graph.  sum_wedges = sum over nodes of
    C(deg, 2) — the denominator of the global clustering coefficient
    (3*triangles / wedges), kept integer so the oracle stays exact."""
    spark = edges.sparkSession
    e = canonical_edges(edges, a_col, b_col).localCheckpoint()
    deg = degree_table(e, "a", "b").localCheckpoint()  # feeds agg + orient
    row = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("degree").alias("max_degree"),
        # integer div: float /2 would round at large degree products
        F.expr("sum((degree * (degree - 1)) div 2)")
         .cast("bigint").alias("sum_wedges")).collect()[0]
    n_edges = e.count()
    tri = _triangle_count_canonical(e, deg)
    return spark.createDataFrame(
        [(int(row.n_nodes or 0), int(n_edges), int(tri),
          int(row.max_degree or 0), int(row.sum_wedges or 0))],
        "n_nodes bigint, n_edges bigint, n_triangles bigint, "
        "max_degree bigint, sum_wedges bigint")
