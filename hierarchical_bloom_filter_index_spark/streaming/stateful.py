"""Custom stateful streaming operator: per-group running sketches maintained
with applyInPandasWithState.

The state is the serialized sketch blob itself — the same mergeable bytes
the batch pipeline shuffles — so a streaming job and a batch job produce
interchangeable sketch states (estimate-identical for exactly-order-free
sketches like HLL/CMS/Bloom). Checkpointing gives exactly-once state updates
across restarts via the file-source + state-store guarantees.

This is the Structured Streaming face of the reference's per-tree estimator
maintenance during insert (PMIndex/HBI.java:220-227), per the north_star's
"applyInPandasWithState for custom stateful operators".
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sketches import from_bytes

OUTPUT_SCHEMA = "source string, n_docs long, n_tokens long, estimate double, sketch binary"
STATE_SCHEMA = "sketch binary, n_docs long, n_tokens long"


def sketch_state_stream(
    corpus_stream: DataFrame,
    factory: Callable[[], Any],
    estimate: Callable[[Any], float],
    key_col: str = "source",
    values_col: str = "tokens",
):
    """Running per-``key_col`` sketch over a streaming corpus.

    Returns a streaming DataFrame of (source, n_docs, n_tokens, estimate,
    sketch) rows — one per updated group per micro-batch; the caller attaches
    writeStream/trigger/checkpoint.
    """

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, n_docs, n_tokens = state.get
            sk = from_bytes(bytes(blob))
        else:
            sk, n_docs, n_tokens = factory(), 0, 0
        for pdf in pdfs:
            for arr in pdf[values_col]:
                vals = np.asarray(arr)
                if len(vals):
                    sk.update(vals)
                    n_tokens += len(vals)
            n_docs += len(pdf)
        blob = sk.to_bytes()
        state.update((bytearray(blob), n_docs, n_tokens))
        yield pd.DataFrame(
            {"source": [key[0]], "n_docs": [n_docs], "n_tokens": [n_tokens],
             "estimate": [float(estimate(sk))], "sketch": [blob]}
        )

    return corpus_stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",  # rows are per-batch snapshots; file sinks are append-only
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
