"""SemDeDup-style semantic dedup (cluster-then-exact-cosine): exhaustive at
n_centroids=1, sound (pairs always a subset of the exact set) and usefully
recalling at realistic cluster counts, keep-list = connected-component
minimum, degenerate clusters capped with recall-only loss — plus the
float-gap guard that keeps the driver oracle's >= cut engine-independent."""

import collections

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"
THRESH = 0.42


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def brute(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.asarray([r["vec_id"] for r in rows])
    mat = np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), k=1)
    keep = sims[iu] >= THRESH
    pairs = {
        (int(a), int(b)): float(c)
        for a, b, c in zip(ids[iu[0][keep]], ids[iu[1][keep]],
                           np.round(sims[iu][keep], 6))
    }
    return ids, sims[iu], pairs


def test_single_cluster_is_exact_all_pairs(emb, brute):
    _ids, _all_sims, want = brute
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in S.semantic_dedup_pairs(emb, THRESH, n_centroids=1).collect()}
    assert got == want and len(want) > 10


def test_clustered_pairs_sound_and_recalling(emb, brute):
    """Clustering can only LOSE pairs (soundness: every reported pair is
    exactly scored inside its cluster) — and on this fixture it keeps a
    healthy fraction of them."""
    _ids, _all_sims, want = brute
    got = {(r["id_a"], r["id_b"])
           for r in S.semantic_dedup_pairs(emb, THRESH, n_centroids=8).collect()}
    assert got <= set(want)
    assert len(got) / len(want) >= 0.4


def test_keep_list_is_component_minimum(emb, brute):
    ids, _all_sims, want = brute
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in want:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = collections.defaultdict(list)
    for i in ids:
        comp[find(int(i))].append(int(i))
    want_keep = sorted(min(v) for v in comp.values())
    got = sorted(r["vec_id"]
                 for r in S.semantic_dedup_keep(emb, THRESH, n_centroids=1).collect())
    assert got == want_keep
    assert len(got) < len(ids)  # something was actually deduped


def test_oracle_threshold_gap(brute):
    """The driver twins decide pair membership with >= THRESH in BOTH numpy
    and DuckDB float64 — sound only while no pair sits near the boundary.
    Guard the gap at 1e-4 (observed >= 5e-4; cross-engine noise ~1e-15)."""
    _ids, all_sims, _want = brute
    assert np.abs(all_sims - THRESH).min() > 1e-4


def test_degenerate_cluster_cap(spark):
    """A pile of identical vectors is the quadratic worst case — the
    max_cluster cap drops the whole cluster (recall-only loss, logged),
    and without the cap the full k^2/2 pair set comes back."""
    n = 20
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = S.semantic_dedup_pairs(emb, 0.99, n_centroids=1).collect()
    assert len(full) == n * (n - 1) // 2
    capped = S.semantic_dedup_pairs(emb, 0.99, n_centroids=1,
                                    max_cluster=5).collect()
    assert capped == []
