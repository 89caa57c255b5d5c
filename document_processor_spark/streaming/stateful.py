"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the arbitrary-state API a 100 TB live ingest
uses where built-in windows can't express the semantics.

Semantics mirror the batch ``relational.q_sessionize`` contract: events per
user ordered by (ts, event_id); a gap > SESSION_GAP_S starts a new session.
A session row is emitted when it CLOSES — either a later event arrives past
the gap, or the event-time watermark passes ``last_ts + gap`` (EventTime
timeout) and the open session is flushed.  Events later than the watermark
are dropped by Spark before they reach the operator (the standard
late-data contract).

Scale notes: state is partitioned by user_id — the same shuffle key as the
aggregation, so a 4N-executor cluster splits both the shuffle and the
state store 4N ways; per-user state is O(1) (five longs), not O(events).
The operator body is Arrow-batched pandas (one call per user per
micro-batch), never per-row Python.

The per-user ``session_seq`` counter must survive a timeout flush: the
batch contract numbers a user's sessions 1..k for the lifetime of the
stream, so a timed-out user who later returns continues at seq+1, never
restarts at 1.  The flush therefore leaves a SENTINEL state
``(0, 0, n_events=0, seq)`` behind (n_events == 0 ⇔ "no open session")
instead of ``state.remove()``.  That sentinel is four longs per ever-seen
user — the same O(users) state bound the seq contract itself requires.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)

from ..operators.relational import SESSION_GAP_S

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

# (session_start_us, last_ts_us, n_events, session_seq)
STATE_SCHEMA = StructType([
    StructField("session_start", LongType()),
    StructField("last_ts", LongType()),
    StructField("n_events", LongType()),
    StructField("session_seq", LongType()),
])

_GAP_US = SESSION_GAP_S * 1_000_000


def _sessionize_group(key, pdfs: Iterator["object"],
                      state: GroupState) -> Iterator["object"]:
    import pandas as pd

    user_id = key[0]

    def emit_row(start_us, end_us, n, seq):
        return (user_id, seq,
                pd.Timestamp(start_us * 1000), pd.Timestamp(end_us * 1000), n)

    closed = []
    if state.hasTimedOut:
        if state.exists:
            start, last, n, seq = state.get
            if n > 0:
                closed.append(emit_row(start, last, n, seq))
            # keep seq across the flush (sentinel: n_events == 0 == no open
            # session); no new timeout — the sentinel just persists until
            # the user returns
            state.update((0, 0, 0, seq))
    else:
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = (batch["ts"].astype("int64") // 1000).to_numpy()

        if state.exists:
            start, last, n, seq = state.get
            if n == 0:  # sentinel left by a timeout flush
                start, last = None, None
        else:
            start, last, n, seq = None, None, 0, 0

        for t in ts_us:
            t = int(t)
            if start is None:
                start, last, n, seq = t, t, 1, seq + 1
            elif t - last > _GAP_US:
                closed.append(emit_row(start, last, n, seq))
                start, last, n, seq = t, t, 1, seq + 1
            else:
                # absorb an in-gap event; events may arrive out of order
                # ACROSS micro-batches (within allowed lateness), so the
                # session window only ever widens — never rewinds
                start, last, n = min(start, t), max(last, t), n + 1
        if start is not None:
            state.update((start, last, n, seq))
            # close the open session once the event-time watermark passes
            # last_ts + gap (setTimeoutTimestamp takes epoch millis; must
            # stay strictly above the current watermark)
            state.setTimeoutTimestamp(
                max(last // 1000 + SESSION_GAP_S * 1000,
                    state.getCurrentWatermarkMs() + 1))

    if closed:
        yield pd.DataFrame(closed, columns=[f.name for f in OUTPUT_SCHEMA])


def sessionize_stream(events: DataFrame, *,
                      watermark: str = "1 seconds") -> DataFrame:
    """Streaming events -> closed-session rows.  `events` must carry
    (event_id, ts, user_id); extra columns pass through to the operator
    unused."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.col("user_id"))
            .applyInPandasWithState(
                _sessionize_group, OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
