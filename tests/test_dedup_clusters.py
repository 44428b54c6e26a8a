"""Connected components over near-dup pair graphs: large-star/small-star
contraction vs a driver-side union-find ground truth, degenerate shapes
(chains, cliques, empty), and the dedup_clusters keep/drop contract."""

import random

import pytest

from hierarchical_bloom_filter_index_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
)


def _union_find_minima(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for a, b in edges:
        for x in (a, b):
            groups.setdefault(find(x), set()).add(x)
    want = {}
    for members in groups.values():
        m = min(members)
        for x in members:
            want[x] = m
    return want


def test_chain_clique_and_bridge(spark):
    """A long CHAIN (the worst case for label propagation — one hop per
    round) must collapse; plus a clique, a 2-node component, and a bridge
    node shared between two pair sources."""
    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(20)]
    clique = [(f"k{i}", f"k{j}") for i in range(4) for j in range(i + 1, 4)]
    extra = [("z9", "z1"), ("z1", "c10")]  # bridges into the chain
    edges = chain + clique + extra
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert got == _union_find_minima(edges)
    # the chain+bridge component all landed on the global minimum
    assert got["z9"] == "c00" and got["c20"] == "c00"


@pytest.mark.parametrize("seed", [3, 11])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(150)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(110)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert got == _union_find_minima(edges)


def test_empty_and_self_loops(spark):
    empty = spark.createDataFrame([], "doc_a string, doc_b string")
    assert connected_components(empty).count() == 0
    loops = spark.createDataFrame([("a", "a"), ("b", "b")],
                                  "doc_a string, doc_b string")
    assert connected_components(loops).count() == 0


def test_dedup_clusters_keep_drop_contract(spark):
    pairs = spark.createDataFrame(
        [("d1", "d0"), ("d1", "d2"), ("e7", "e5")],
        "doc_a string, doc_b string")
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows["d0"]["is_canonical"] and rows["d0"]["cluster_sz"] == 3
    assert not rows["d2"]["is_canonical"] and rows["d2"]["cluster_id"] == "d0"
    assert rows["e5"]["is_canonical"] and rows["e5"]["cluster_sz"] == 2
    # exactly one canonical per cluster
    canon = [r for r in rows.values() if r["is_canonical"]]
    assert len(canon) == 2


def test_neardup_canonical_corpus(spark):
    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        neardup_canonical_corpus,
    )

    docs = spark.createDataFrame(
        [(d, f"text {d}") for d in ["d0", "d1", "d2", "e5", "e7", "solo"]],
        "doc_id string, text string")
    pairs = spark.createDataFrame(
        [("d1", "d0"), ("d1", "d2"), ("e7", "e5")],
        "doc_a string, doc_b string")
    kept = neardup_canonical_corpus(docs, pairs)
    assert kept.columns == ["doc_id", "text"], "docs columns must pass through"
    got = {r["doc_id"]: r["text"] for r in kept.collect()}
    # min of each component + the doc in no pair survive, text untouched
    assert got == {"d0": "text d0", "e5": "text e5", "solo": "text solo"}
    # empty pair graph: everything survives
    empty = spark.createDataFrame([], "doc_a string, doc_b string")
    assert neardup_canonical_corpus(docs, empty).count() == 6


def _local_triangles(edges):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cnt = defaultdict(int)
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for x in (a, b, c):
                        cnt[x] += 1
    return dict(cnt)


def test_triangle_counts_shapes(spark):
    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        triangle_counts,
    )

    # K4 clique (each corner in 3 triangles), a 4-chain (none), a star
    # hub (none), a hub+closing edge (one), a duplicate+reversed edge,
    # and a self-loop (dropped)
    edges = [
        ("k1", "k2"), ("k1", "k3"), ("k1", "k4"),
        ("k2", "k3"), ("k2", "k4"), ("k3", "k4"),
        ("c1", "c2"), ("c2", "c3"), ("c3", "c4"),
        ("s0", "s1"), ("s0", "s2"), ("s0", "s3"), ("s0", "s4"),
        ("s1", "s2"),              # closes ONE star triangle
        ("k2", "k1"), ("k1", "k2"),  # dup + reversed
        ("c1", "c1"),              # self loop
    ]
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {r["doc_id"]: r["n_triangles"]
           for r in triangle_counts(df).collect()}
    assert got == _local_triangles(edges)
    assert got["k1"] == 3 and got["s0"] == 1 and "c1" not in got


@pytest.mark.parametrize("seed", [7, 23])
def test_triangle_counts_random_differential(spark, seed):
    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        triangle_counts,
    )

    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(30)]
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)})
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {r["doc_id"]: r["n_triangles"]
           for r in triangle_counts(df).collect()}
    assert got == _local_triangles(edges)


def test_leakage_safe_splits(spark):
    from hierarchical_bloom_filter_index_spark.operators.dedup import (
        leakage_safe_splits,
    )
    from hierarchical_bloom_filter_index_spark.operators.sampling import (
        split_column,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (10, 11)], "doc_a long, doc_b long")
    fr = {"train": 0.6, "val": 0.2, "test": 0.2}
    out = leakage_safe_splits(docs, pairs, "doc_id", fr, seed=5)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(got) == set(range(12))
    # the leakage property: every component shares one split
    assert got[1] == got[2] == got[3]
    assert got[7] == got[8]
    assert got[10] == got[11]
    # equivalence to hashing the representative directly
    rep = {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 10: 10, 11: 10}
    reps = spark.createDataFrame(
        [(i, rep.get(i, i)) for i in range(12)], "doc_id long, r long")
    want = {r["doc_id"]: r["split"]
            for r in split_column(reps, "r", fr, seed=5).collect()}
    assert got == want
    # deterministic across invocations
    again = {r["doc_id"]: r["split"] for r in leakage_safe_splits(
        docs, pairs, "doc_id", fr, seed=5).collect()}
    assert got == again
    # string ids (numeric content) ride the same long-cast hash path
    from pyspark.sql import functions as F

    sdocs = docs.select(F.col("doc_id").cast("string").alias("doc_id"))
    spairs = pairs.select(F.col("doc_a").cast("string").alias("doc_a"),
                          F.col("doc_b").cast("string").alias("doc_b"))
    sgot = {int(r["doc_id"]): r["split"] for r in leakage_safe_splits(
        sdocs, spairs, "doc_id", fr, seed=5).collect()}
    assert sgot == got
