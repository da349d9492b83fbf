"""Streaming stateful sessionization via ``applyInPandasWithState``.

Custom stateful operator shape (SURVEY.md: the north rule's resumability
is batch/checkpoint, but continuous pipelines still need gap sessions):
state per user = (session_id, session_start, session_end, n_events);
each micro-batch folds its events into the open session, emitting an
update row per touched session; a processing-time timeout closes idle
sessions. Arrow-batched — no per-row Python between batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        sid, n, start_us, end_us = (
            state.get if state.exists else (-1, 0, None, None)
        )
        rows = []
        for pdf in pdfs:
            ts = pdf["ts"].astype("datetime64[us]").astype("int64").sort_values()
            for t in ts:
                if start_us is None or t - end_us > gap_us:
                    if start_us is not None:
                        rows.append((user_id, sid, n, start_us, end_us))
                    sid += 1
                    n = 1
                    start_us = end_us = int(t)
                else:
                    n += 1
                    end_us = max(end_us, int(t))
        state.update((sid, n, start_us, end_us))
        state.setTimeoutDuration(gap_seconds * 1000)
        rows.append((user_id, sid, n, start_us, end_us))
        out = pd.DataFrame(
            rows, columns=["user_id", "session_id", "n_events", "start_us", "end_us"]
        )
        yield pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "session_id": out["session_id"].astype("int64"),
                "n_events": out["n_events"].astype("int64"),
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["end_us"], unit="us"),
            }
        )

    return fn


def stream_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """events stream (user_id long, ts timestamp) -> session updates."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
