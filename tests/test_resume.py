"""Checkpoint/resume: a build killed mid-way and resumed must produce a
sketch table identical to an uninterrupted build (FIXTURES.md §4 resume
contract), with per-shard lineage + metrics recorded."""

import json
import os

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark import corpus as C
from hierarchical_bloom_filter_index_spark.config import HbiConfig
from hierarchical_bloom_filter_index_spark.operators import build_index
from hierarchical_bloom_filter_index_spark.sources.io import (
    LINEAGE_FILE,
    build_index_checkpointed,
    read_index,
    write_index,
)

CFG = HbiConfig(tree_span=256, leaf_span=32, fpr=0.02, vocab=4096, seed=11)


def _state(df):
    """Order-free fingerprint of a sketch table."""
    return sorted(
        (r["doc_id"], r["level"], r["w_id"], bytes(r["bloom"]), r["n_items"])
        for r in df.select("doc_id", "level", "w_id", "bloom", "n_items").collect()
    )


def test_checkpointed_equals_direct_and_resumes(spark, tmp_path):
    corp = C.generate_corpus(spark, sf=0.002, seed=5).cache()
    corp.count()
    direct = _state(build_index(corp, CFG))

    # full checkpointed run
    full_path = str(tmp_path / "full")
    full = build_index_checkpointed(corp, CFG, full_path, n_shards=4)
    assert _state(full) == direct

    lineage = json.load(open(os.path.join(full_path, LINEAGE_FILE)))
    assert set(lineage["shards"]) == {"0", "1", "2", "3"}
    for rec in lineage["shards"].values():
        assert rec["rows"] > 0 and rec["tokens"] > 0 and "state_hash" in rec

    # simulate a kill: copy only 2 completed shards' lineage, drop the rest
    resume_path = str(tmp_path / "resume")
    os.makedirs(resume_path)
    import shutil

    shutil.copy(os.path.join(full_path, "_hbi_config.json"), resume_path)
    partial = {"shards": {k: v for k, v in lineage["shards"].items() if k in ("0", "2")}}
    for k in ("0", "2"):
        shutil.copytree(os.path.join(full_path, f"shard={k}"), os.path.join(resume_path, f"shard={k}"))
    with open(os.path.join(resume_path, LINEAGE_FILE), "w") as f:
        json.dump(partial, f)

    resumed = build_index_checkpointed(corp, CFG, resume_path, n_shards=4)
    assert _state(resumed) == direct  # byte-identical to uninterrupted

    lineage2 = json.load(open(os.path.join(resume_path, LINEAGE_FILE)))
    # completed shards were not recomputed: lineage records preserved verbatim
    assert lineage2["shards"]["0"] == lineage["shards"]["0"]
    assert lineage2["shards"]["2"] == lineage["shards"]["2"]
    # state hashes of recomputed shards match the original run (determinism)
    for k in ("1", "3"):
        assert lineage2["shards"][k]["state_hash"] == lineage["shards"][k]["state_hash"]


def test_config_mismatch_refused(spark, tmp_path):
    corp = C.generate_corpus(spark, sf=0.001, seed=5)
    path = str(tmp_path / "cfg")
    build_index_checkpointed(corp, CFG, path, n_shards=2)
    with pytest.raises(ValueError, match="different config"):
        build_index_checkpointed(corp, CFG.with_(fpr=0.5), path, n_shards=2)


def test_write_read_roundtrip_partitioned_by_level(spark, tmp_path):
    corp = C.generate_corpus(spark, sf=0.001, seed=5)
    idx = build_index(corp, CFG)
    path = str(tmp_path / "idx")
    write_index(idx, path)
    assert os.path.isdir(os.path.join(path, "level=0"))  # partition pruning layout
    back = read_index(spark, path)
    assert back.filter(F.col("level") == 0).count() == idx.filter("level = 0").count()
