"""IVF-PQ: exhaustive-parameter equality with brute force (the hard
plumbing gate), deterministic training/encoding, ADC identity vs local
decode, recall contract at realistic settings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def qids(emb):
    return [r["vec_id"] for r in emb.orderBy("vec_id").limit(6).collect()]


@pytest.fixture(scope="module")
def brute(emb, qids):
    return sorted(map(tuple, S.cosine_topk(emb, qids, k=5).collect()))


def test_exhaustive_params_equal_brute(emb, qids, brute):
    n = emb.count()
    got = sorted(map(tuple, S.ivfpq_topk(
        emb, qids, k=5, n_centroids=8, nprobe=8, rerank=n).collect()))
    assert got == brute


def test_recall_at_realistic_settings(emb, qids, brute):
    # deterministic end to end, so this is a fixed number, not a flaky
    # bound: measured 0.87 (M=16, K=32, all lists probed, rerank 24)
    want = {(r[0], r[1]) for r in brute}
    got = {(r["query_id"], r["vec_id"]) for r in S.ivfpq_topk(
        emb, qids, k=5, n_centroids=8, nprobe=8, rerank=24,
        m_subspaces=16, n_codes=32).collect()}
    assert len(got & want) / len(want) >= 0.80


def test_encode_deterministic_and_bounded(emb):
    coarse = S.train_ivf_centroids(emb, 8)
    books = S.train_pq_codebooks(emb, coarse, m_subspaces=8, n_codes=16)
    a = sorted(map(tuple, S.ivfpq_encode(emb, coarse, books)
                   .select("vec_id", "list_id", "codes").collect()))
    b = sorted(map(tuple, S.ivfpq_encode(emb, coarse, books)
                   .select("vec_id", "list_id", "codes").collect()))
    assert a == b
    for _, lid, codes in a:
        assert 0 <= lid < 8 and len(codes) == 8
        assert all(0 <= c < 16 for c in codes)


def test_adc_identity_vs_decode(emb):
    # ADC(q, v) must equal q . (c_list + decode(codes)) — the score of the
    # RECONSTRUCTED vector — for every corpus vector
    coarse = S.train_ivf_centroids(emb, 8)
    books = S.train_pq_codebooks(emb, coarse, m_subspaces=8, n_codes=16)
    rows = emb.select("vec_id", "embedding").limit(50).collect()
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    lids, codes = S._pq_encode_batch(mat.copy(), coarse, books)
    q = mat[0] / np.linalg.norm(mat[0])
    m_sub, n_codes, sub = books.shape
    table = np.array([books[m] @ q[m * sub:(m + 1) * sub]
                      for m in range(m_sub)])
    adc = coarse[lids] @ q + sum(
        table[m][codes[:, m]] for m in range(m_sub))
    recon = coarse[lids] + np.concatenate(
        [books[m][codes[:, m]] for m in range(m_sub)], axis=1)
    assert np.allclose(adc, recon @ q, atol=1e-12)


def test_pq_validation(emb):
    coarse = S.train_ivf_centroids(emb, 4)
    with pytest.raises(ValueError):
        S.train_pq_codebooks(emb, coarse, m_subspaces=7)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        S.train_pq_codebooks(emb, coarse, m_subspaces=8, n_codes=1)


def test_persisted_parity_and_pruned_scan(spark, emb, qids, tmp_path):
    path = str(tmp_path / "pq")
    S.write_ivfpq_index(emb, path, n_centroids=8, m_subspaces=16,
                        n_codes=32)
    mem = sorted(map(tuple, S.ivfpq_topk(
        emb, qids, k=5, n_centroids=8, nprobe=3, rerank=24,
        m_subspaces=16, n_codes=32).collect()))
    per = sorted(map(tuple, S.ivfpq_topk_persisted(
        spark, path, emb, qids, k=5, nprobe=3, rerank=24).collect()))
    assert mem == per and mem

    # the pruned reader touches ONLY the probed lists' files
    coarse = S.read_ivf_centroids(spark, path)
    qmap, probe_rows = S._query_probe_plan(
        emb, coarse, qids, 3, "vec_id", "embedding")
    probed = sorted({l for _, l in probe_rows})
    pruned = S.read_ivf_lists(spark, path, probed)
    files = {r[0] for r in
             pruned.select(F.input_file_name()).distinct().collect()}
    assert files and all(
        any(f"list_id={l}/" in f for l in probed) for f in files)


def test_pq_index_takedown(spark, emb, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    S.write_ivfpq_index(emb, p1, n_centroids=8)
    S.write_ivfpq_index(emb, p2, n_centroids=8)
    removed = [r["vec_id"] for r in emb.limit(5).collect()]
    assert S.takedown_ivf_index(spark, p1, removed) >= 1
    a = sorted((r["vec_id"], r["list_id"], tuple(r["codes"])) for r in
               spark.read.parquet(f"{p1}/lists").collect())
    b = sorted((r["vec_id"], r["list_id"], tuple(r["codes"])) for r in
               spark.read.parquet(f"{p2}/lists")
               .filter(~F.col("vec_id").isin(removed)).collect())
    assert a == b
