"""Randomized cross-config differential sweep: seeded random (config, corpus,
pattern) draws through pattern_search vs the exact brute-force oracle — the
reference's three query classes (uniform/present, missing, rare) under
geometry x n-gram x FPR combinations the fixed-seed tests don't enumerate
(HBIDatasetBenchmark.compared role, randomized)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import (
    brute_force_search,
    build_index,
    pattern_search,
    pattern_search_batch,
)

COMBOS = [
    # (tree_span, leaf_span, fpr, ngram, base_bits, seed)
    (256, 16, 0.05, 1, 21, 101),
    (512, 64, 0.01, 2, 16, 202),
    (1024, 32, 0.10, 3, 12, 303),
]


def _rows(df):
    return sorted((r["doc_id"], r["pos"]) for r in df.collect())


@pytest.mark.parametrize("tree_span,leaf_span,fpr,ngram,bits,seed", COMBOS)
def test_random_patterns_match_bruteforce(spark, tree_span, leaf_span, fpr, ngram, bits, seed):
    cfg = HbiConfig(tree_span=tree_span, leaf_span=leaf_span, fpr=fpr,
                    vocab=4096, seed=seed, ngram=ngram, ngram_base_bits=bits)
    corp = C.generate_corpus(spark, sf=0.001, seed=seed).cache()
    idx = build_index(corp, cfg).cache()
    rng = np.random.default_rng(seed)
    docs = corp.filter(F.col("n_tok") >= 48).orderBy("doc_id").limit(8).collect()
    batch_patterns: list[list[int]] = []
    batch_exp: list[tuple] = []
    for trial in range(3):
        doc = docs[int(rng.integers(0, len(docs)))]
        toks = list(doc["tokens"])
        plen = int(rng.integers(max(ngram, 4), 20))
        start = int(rng.integers(0, len(toks) - plen))
        present = toks[start : start + plen]
        got = _rows(pattern_search(corp, idx, cfg, present))
        exp = _rows(brute_force_search(corp, present))
        assert got == exp and len(exp) > 0, f"trial {trial} present"
        # missing class: mutate one token to an out-of-vocab value
        missing = list(present)
        missing[int(rng.integers(0, plen))] = 5000 + trial
        got_m = _rows(pattern_search(corp, idx, cfg, missing))
        assert got_m == _rows(brute_force_search(corp, missing)) == []
        for pat, rows in ((present, exp), (missing, [])):
            batch_exp.extend((len(batch_patterns), d, p) for d, p in rows)
            batch_patterns.append(pat)
    # the same randomized workload through the shared-cascade batch
    got_b = sorted(
        (r["pattern_id"], r["doc_id"], r["pos"])
        for r in pattern_search_batch(corp, idx, cfg, batch_patterns).collect()
    )
    assert got_b == sorted(batch_exp)
    idx.unpersist()
    corp.unpersist()
