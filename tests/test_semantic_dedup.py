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


# ---------------------------------------------------------------------------
# incremental SemDeDup vs the persisted IVF index: exhaustive at
# n_centroids=1, sound under clustering, partition-pruned reads, and the
# streaming twin equal to the one-shot batch check through a replay drill
# ---------------------------------------------------------------------------
INC_T = 0.40


def _split(emb):
    new = emb.filter(F.col("vec_id") % 7 == 0)
    old = emb.filter(F.col("vec_id") % 7 != 0)
    return new, old


def _brute_cross(emb, thresh):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.asarray([r["vec_id"] for r in rows])
    mat = np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    isnew = ids % 7 == 0
    out = {}
    for i in np.where(isnew)[0]:
        for j in np.where(~isnew)[0]:
            if sims[i, j] >= thresh:
                out[(int(ids[i]), int(ids[j]))] = float(np.round(sims[i, j], 6))
    return out


def test_incremental_exact_vs_brute(spark, emb, tmp_path):
    from hierarchical_bloom_filter_index_spark.operators import similarity as S2

    new, old = _split(emb)
    path = str(tmp_path / "ivf1")
    S2.write_ivf_index(old, path, n_centroids=1)
    got = {(r["new_id"], r["corpus_id"]): r["cosine"]
           for r in S2.semantic_neardup_against_index(
               spark, new, path, INC_T, nprobe=1).collect()}
    want = _brute_cross(emb, INC_T)
    assert got == want and len(want) > 3


def test_incremental_clustered_sound_and_pruned(spark, emb, tmp_path):
    """nprobe < n_centroids: pairs are a SUBSET of the exact cross set
    (soundness), and the scan touches only the probed lists' files."""
    from hierarchical_bloom_filter_index_spark.operators import similarity as S2

    new, old = _split(emb)
    path = str(tmp_path / "ivf4")
    cents = S2.write_ivf_index(old, path, n_centroids=4)
    got = {(r["new_id"], r["corpus_id"])
           for r in S2.semantic_neardup_against_index(
               spark, new, path, INC_T, nprobe=1).collect()}
    assert got <= set(_brute_cross(emb, INC_T))
    # one query vector probes exactly ONE list -> only that directory read
    one = new.orderBy("vec_id").limit(1)
    qv = np.asarray(one.collect()[0]["embedding"], dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    lid = int(np.argmax(cents @ qv))
    pruned = S2.read_ivf_lists(spark, path, [lid])
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    assert files and all(f"list_id={lid}" in f for f in files)


def test_incremental_stream_equals_batch_with_replay(spark, emb, tmp_path):
    """Two-file drain == one-shot batch; a second drain from a FRESH
    checkpoint (full redelivery) leaves the output byte-identical — the
    replay guard, not luck."""
    from hierarchical_bloom_filter_index_spark.operators import similarity as S2

    new, old = _split(emb)
    path = str(tmp_path / "ivf_s")
    S2.write_ivf_index(old, path, n_centroids=1)
    inp = str(tmp_path / "in")
    half = F.col("vec_id") % 2
    new.filter(half == 0).write.mode("overwrite").parquet(inp)
    new.filter(half == 1).write.mode("append").parquet(inp)
    out = str(tmp_path / "out")

    def drain(chk):
        stream = spark.readStream.schema(new.schema).option(
            "maxFilesPerTrigger", "1").parquet(inp)
        q = S2.incremental_semantic_stream(stream, path, out, chk, INC_T, nprobe=1)
        assert q.awaitTermination(300)

    drain(str(tmp_path / "chk1"))
    got = sorted(map(tuple, spark.read.parquet(out).drop("batch_id").collect()))
    want = sorted(map(tuple, S2.semantic_neardup_against_index(
        spark, new, path, INC_T, nprobe=1).collect()))
    assert got == want and len(want) > 0
    drain(str(tmp_path / "chk2"))  # full redelivery
    again = sorted(map(tuple, spark.read.parquet(out).drop("batch_id").collect()))
    assert again == got
