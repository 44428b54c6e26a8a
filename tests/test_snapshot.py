"""Snapshot diff (operators/snapshot.py): statuses vs a hand-built truth,
exact/hash mode agreement, NULL-column and NULL-key handling."""

import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.snapshot import (
    snapshot_diff,
    snapshot_diff_counts,
)

OLD = [
    (1, "alpha", "en"),
    (2, "beta", "en"),
    (3, "gamma", "de"),
    (4, None, "en"),      # NULL payload, unchanged
    (5, "eps", None),     # NULL payload, will change to non-NULL
    (6, "zeta", "fr"),    # will be removed
]
NEW = [
    (1, "alpha", "en"),       # unchanged
    (2, "beta2", "en"),       # changed (text)
    (3, "gamma", "nl"),       # changed (lang)
    (4, None, "en"),          # unchanged with NULL payload
    (5, "eps", "en"),         # changed: NULL -> value
    (7, "new", "en"),         # added
]
WANT = {1: "unchanged", 2: "changed", 3: "changed", 4: "unchanged",
        5: "changed", 6: "removed", 7: "added"}
SCHEMA = "id long, text string, lang string"


def _frames(spark):
    return (spark.createDataFrame(OLD, SCHEMA),
            spark.createDataFrame(NEW, SCHEMA))


@pytest.mark.parametrize("method", ["exact", "hash"])
def test_statuses(spark, method):
    old, new = _frames(spark)
    got = {r["id"]: r["status"] for r in snapshot_diff(
        old, new, "id", ["text", "lang"], include_unchanged=True,
        method=method).collect()}
    assert got == WANT


def test_unchanged_excluded_by_default(spark):
    old, new = _frames(spark)
    got = {r["id"] for r in snapshot_diff(old, new, "id", ["text", "lang"]).collect()}
    assert got == {k for k, v in WANT.items() if v != "unchanged"}


def test_single_column_compare(spark):
    old, new = _frames(spark)
    got = {r["id"]: r["status"] for r in snapshot_diff(
        old, new, "id", ["text"], include_unchanged=True).collect()}
    # ids 3 and 5 only changed lang — with text-only compare they're unchanged
    assert got[3] == "unchanged" and got[5] == "unchanged" and got[2] == "changed"


def test_counts(spark):
    old, new = _frames(spark)
    got = {r["status"]: r["n"] for r in snapshot_diff_counts(
        old, new, "id", ["text", "lang"]).collect()}
    assert got == {"unchanged": 2, "changed": 3, "removed": 1, "added": 1}


def test_null_keys_dropped_and_validation(spark):
    old, new = _frames(spark)
    old_n = old.unionByName(spark.createDataFrame(
        [(None, "ghost", "en")], SCHEMA))
    got = {r["id"]: r["status"] for r in snapshot_diff(
        old_n, new, "id", ["text", "lang"], include_unchanged=True).collect()}
    assert got == WANT
    with pytest.raises(ValueError, match="at least one column"):
        snapshot_diff(old, new, "id", [])
    with pytest.raises(ValueError, match="method"):
        snapshot_diff(old, new, "id", ["text"], method="fuzzy")
