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
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sketches import from_bytes

OUTPUT_SCHEMA = "source string, n_docs long, n_tokens long, estimate double, sketch binary"
STATE_SCHEMA = "sketch binary, n_docs long, n_tokens long"

SESSION_OUT_SCHEMA = "user_id string, t_start long, t_end long, n_events long"
SESSION_STATE_SCHEMA = "s long, e long, n long"


def session_state_stream(
    events_stream: DataFrame,
    gap_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    delay: str = "0 seconds",
):
    """STATEFUL STREAMING SESSIONIZATION — event-time gap sessions
    assembled with applyInPandasWithState + EventTimeTimeout, emitting
    CLOSED sessions only (append semantics, any sink).

    Contract (the strict-gap boundary of operators/sessions.sessionize):
    successive events of a key belong to one session while t - prev <=
    gap_us. Per micro-batch, a key's new events are merged into its open
    session; every session closed by a MID-STREAM gap is emitted
    immediately, and the still-open tail session is kept as state with an
    event-time timeout at end + gap — when the watermark passes it, the
    session provably cannot grow (later events would be late) and is
    emitted by the timeout invocation. A key whose open session is
    already expired vs the current watermark closes inline (Spark refuses
    timeout timestamps at-or-below the watermark).

    Determinism: with delay='0 seconds' and a single availableNow batch,
    the emitted set is exactly the batch sessionize minus each key's LAST
    session (watermark starts at 0, so no timeout fires) — the driver
    parity gate's contract. Output rows are (user_id, t_start, t_end,
    n_events) in epoch MICROS, schema-aligned with the batch twin.

    Scale: state is three longs per key; per-batch work is one sort of the
    key's new events inside the Arrow group — no shuffle beyond the
    groupBy, no unbounded state (every session eventually times out)."""
    ev = (
        events_stream
        .withColumn("_ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts", delay)
        .select(F.col(key_col).cast("string").alias("user_id"), "_ts",
                F.unix_micros(F.col("_ts")).alias("_t_us"))
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [key[0]], "t_start": [s],
                                "t_end": [e], "n_events": [n]})
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["_t_us"])
        ts.sort()
        open_ses = tuple(state.get) if state.exists else None
        closed = []
        for t in ts:
            if open_ses is None:
                open_ses = (t, t, 1)
            elif t - open_ses[1] <= gap_us:
                # with a nonzero delay an ADMITTED event may be older than
                # the stored tail (t < e, or even < s): it merges into the
                # open session without regressing its span — min/max, never
                # overwrite (an event older than the open span belongs to
                # an already-emitted session under batch semantics; merging
                # it here is the standard streaming late-data compromise,
                # exact at delay='0 seconds')
                open_ses = (min(open_ses[0], t), max(open_ses[1], t),
                            open_ses[2] + 1)
            else:
                closed.append(open_ses)
                open_ses = (t, t, 1)
        # open_ses is not None here: hasTimedOut=False with no new rows
        # cannot happen for a group that never stored state, and a data
        # invocation always leaves at least one event in the tail
        wm = state.getCurrentWatermarkMs()
        # strictly-after close time in ms: ceil((end+gap)/1000)+1 — the +1
        # absorbs the watermark's own ms truncation, so no event that is
        # both ADMITTED (t >= wm) and IN-GAP (t <= end+gap) can exist once
        # the timeout is reachable; a bare end//1000 + gap//1000 double-
        # truncation could fire ~2ms early and split a session
        timeout_ms = (open_ses[1] + gap_us) // 1000 + 2
        if timeout_ms <= wm:
            # already expired vs the watermark: no later event can extend
            # it (it would be late) — close inline, clear state (Spark
            # refuses setTimeoutTimestamp at-or-below the watermark)
            closed.append(open_ses)
            state.remove()
        else:
            state.update(open_ses)
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {"user_id": [key[0]] * len(closed),
                 "t_start": [c[0] for c in closed],
                 "t_end": [c[1] for c in closed],
                 "n_events": [c[2] for c in closed]})

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


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
