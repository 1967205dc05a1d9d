"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — per-key mutable state across micro-batches,
timeout-driven session emission (the Structured Streaming analogue of the
batch lag/cumsum sessionizer in __spark_entry__.py).

State per user: (session_start, last_ts, n_events). An event farther than
``gap_seconds`` from ``last_ts`` closes the open session (emitted) and
opens a new one; a processing-time timeout flushes sessions for users
with no traffic. Output rows appear only when a session CLOSES, so the
sink sees complete sessions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events int"
)
STATE_SCHEMA = "session_start double, last_ts double, n_events int"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int | None = None,
) -> DataFrame:
    """events(user_id, ts, ...) stream -> closed sessions stream.

    The idle-flush timeout is PROCESSING time while the gap rule is EVENT
    time, so a too-small timeout could flush (split) a session whose next
    event is still in flight. Default: ``2 * gap_seconds`` of processing
    time — as long as ingest lag stays under one event-time gap, a flush
    can only fire after the session is genuinely closed by the gap rule.
    Pass an explicit ``timeout_ms`` to trade earlier emission for possible
    splits (the split is a duplicate-session emission, not data loss).
    """
    if timeout_ms is None:
        timeout_ms = 2 * gap_seconds * 1000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last, n))
                state.remove()
        else:
            ts_all: list[float] = []
            for pdf in pdfs:
                ts_all.extend(
                    t.timestamp() for t in pd.to_datetime(pdf["ts"])
                )
            ts_all.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = None, None, 0
            for t in ts_all:
                if last is not None and t - last > gap_seconds:
                    closed.append((user_id, start, last, n))
                    start, n = t, 0
                if start is None:
                    start = t
                last = t
                n += 1
            state.update((float(start), float(last), int(n)))
            state.setTimeoutDuration(timeout_ms)

        if closed:
            out = pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
            yield out

    return (
        events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
