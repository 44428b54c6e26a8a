"""Graph metrics (operators/graph.py) vs networkx-free brute force."""

from itertools import combinations

import pytest

from hierarchical_bloom_filter_index_spark.operators.graph import (
    canonical_edges,
    degree_table,
    graph_stats,
    triangle_count,
)


def _brute(edges):
    es = set()
    for a, b in edges:
        if a != b:
            es.add((min(a, b), max(a, b)))
    nodes = sorted({x for e in es for x in e})
    deg = {n: sum(1 for e in es if n in e) for n in nodes}
    tri = sum(1 for a, b, c in combinations(nodes, 3)
              if (a, b) in es and (a, c) in es and (b, c) in es)
    wed = sum(d * (d - 1) // 2 for d in deg.values())
    return {"n_nodes": len(nodes), "n_edges": len(es), "n_triangles": tri,
            "max_degree": max(deg.values(), default=0), "sum_wedges": wed,
            "deg": deg}


CASES = [
    [],  # empty
    [(1, 2)],
    [(1, 2), (2, 3), (1, 3)],  # one triangle
    [(1, 2), (2, 1), (1, 1), (2, 3)],  # dupes + self-loop + reversed
    # K5 (10 triangles) plus a pendant chain
    [(a, b) for a, b in combinations(range(5), 2)] + [(5, 6), (6, 7), (4, 5)],
    # two triangles sharing an edge (book graph)
    [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)],
    # star (many wedges, zero triangles) — the skew case orientation fixes
    [(0, i) for i in range(1, 30)],
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_stats_match_brute_force(spark, case):
    edges = CASES[case]
    df = spark.createDataFrame(edges or [(0, 0)], "doc_a bigint, doc_b bigint")
    exp = _brute(edges)
    got = graph_stats(df).collect()[0]
    for k in ("n_nodes", "n_edges", "n_triangles", "max_degree", "sum_wedges"):
        assert got[k] == exp[k], (case, k)


def test_degree_table(spark):
    df = spark.createDataFrame(CASES[4], "doc_a bigint, doc_b bigint")
    exp = _brute(CASES[4])["deg"]
    got = {r.node: r.degree for r in degree_table(df).collect()}
    assert got == exp


def test_triangle_random_differential(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(24), rng.randrange(24)) for _ in range(140)]
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    assert triangle_count(df) == _brute(edges)["n_triangles"]


def test_string_node_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = graph_stats(df).collect()[0]
    assert (got.n_nodes, got.n_edges, got.n_triangles) == (4, 4, 1)


def test_canonical_edges(spark):
    df = spark.createDataFrame([(2, 1), (1, 2), (3, 3)],
                               "doc_a bigint, doc_b bigint")
    assert canonical_edges(df).collect() == [("1", "2")] or \
        [tuple(r) for r in canonical_edges(df).collect()] == [(1, 2)]


# ---------------------------------------------------------------------------
# pagerank_scaled
# ---------------------------------------------------------------------------
def _pr_brute(edges, iters, num, den, scale):
    """Pure-python reference of the integer fixed-point recurrence."""
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    if n == 0:
        return {}
    outdeg, adj = {}, []
    for u, v in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
        adj.append((u, v))
    base = (scale * (den - num)) // (den * n)
    s = {v: scale // n for v in nodes}
    for _ in range(iters):
        c = {u: s[u] // d for u, d in outdeg.items()}
        msg = {v: 0 for v in nodes}
        for u, v in adj:
            msg[v] += c[u]
        s = {v: base + (num * msg[v]) // den for v in nodes}
    return s


PR_CASES = [
    [("a", "b"), ("b", "a")],  # 2-cycle
    [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
    # dangling node d (no out-edges): mass leaks, teleport base remains
    [("a", "b"), ("b", "d"), ("a", "d")],
    # multi-edge counts multiply
    [("a", "b"), ("a", "b"), ("b", "a")],
    # star hub
    [(f"n{i}", "hub") for i in range(12)] + [("hub", "n0")],
]


@pytest.mark.parametrize("case", PR_CASES)
def test_pagerank_matches_brute(spark, case):
    from hierarchical_bloom_filter_index_spark.operators.graph import pagerank_scaled

    df = spark.createDataFrame(case, "u string, v string")
    got = {r["node"]: r["score"]
           for r in pagerank_scaled(df, iters=4, damping=(85, 100),
                                    scale=10**9).collect()}
    assert got == _pr_brute(case, 4, 85, 100, 10**9)


def test_pagerank_partitioning_invariant(spark):
    """Scores are a pure function of the multiset of edges — any input
    partitioning gives byte-identical results (integer sums are order-free)."""
    from hierarchical_bloom_filter_index_spark.operators.graph import pagerank_scaled

    case = [(f"u{i % 7}", f"u{(i * 3 + 1) % 7}") for i in range(40)]
    df1 = spark.createDataFrame(case, "u string, v string").repartition(1)
    df2 = spark.createDataFrame(case[::-1], "u string, v string").repartition(13)
    a = sorted(map(tuple, pagerank_scaled(df1, iters=3).collect()))
    b = sorted(map(tuple, pagerank_scaled(df2, iters=3).collect()))
    assert a == b


def test_pagerank_refusals(spark):
    from hierarchical_bloom_filter_index_spark.operators.graph import pagerank_scaled

    df = spark.createDataFrame([("a", "b")], "u string, v string")
    with pytest.raises(ValueError, match="iters"):
        pagerank_scaled(df, iters=-1)
    with pytest.raises(ValueError, match="damping"):
        pagerank_scaled(df, damping=(100, 100))


def test_pagerank_empty(spark):
    from hierarchical_bloom_filter_index_spark.operators.graph import pagerank_scaled

    df = spark.createDataFrame([], "u string, v string")
    assert pagerank_scaled(df, iters=2).count() == 0
