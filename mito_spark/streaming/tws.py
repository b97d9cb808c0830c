"""Arbitrary stateful processing on the transformWithStateInPandas API
(Spark 4): typed per-key state handles + event-time timers.

This is the second backend for the reference's continuation semantics
(first: applyInPandasWithState in streaming.stateful). What the newer
API adds and this module exercises:

- typed state handles (ValueState here; List/MapState available) in
  the state store, schema-checked by the engine;
- TIMERS: a key can schedule a callback at an event-time instant —
  used below to EMIT a session when its gap expires, something the
  GroupState API can only approximate with processing-time timeouts.

ENVIRONMENT GATE: the TWS state protocol needs google.protobuf, which
this container lacks — ``tws_available()`` reports it; the test skips
when false. The applyInPandasWithState backend (streaming.stateful) is
the dependency-free path with the same state-store semantics.

Probe evidence (r5, pyspark 4.1.2, do-not-install policy): the JVM
side fully supports the operator — ``GroupedData`` exposes
``transformWithStateInPandas`` and a submitted query plans
``~TransformWithStateInPySpark transformWithStateUDF(...)`` — but the
query then fails with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
whose root cause is ``ImportError: cannot import name 'descriptor'
from 'google.protobuf'`` raised by the Python state-server worker at
startup. The code below is therefore complete and exercised the
moment protobuf is present; tests/test_streaming.py records the same
probe as an always-run assertion instead of a silent skip.

``SessionEmitter`` re-expresses streaming sessionization imperatively:
events extend the open session's end; when the watermark passes
end+gap the timer fires and the closed session is emitted. The
declarative twin (session_window in stream_ops.streaming_sessionize)
plans the same result — this exists for session logic that CAN'T be
declared (e.g. emit-on-close side effects, value-dependent gaps).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def tws_available() -> bool:
    """transformWithStateInPandas requires protobuf for its state
    protocol; absent in this container (do-not-install policy)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


class SessionEmitter(StatefulProcessor):
    """Emit one row per closed session; sessions close via event-time
    timer when no event arrives within ``gap`` of the last one."""

    def __init__(self, gap_seconds: int = 1800):
        self.gap_us = gap_seconds * 1_000_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.sess = handle.getValueState("sess", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values) -> Iterator[pd.DataFrame]:
        start_us = end_us = None
        n = 0
        if self.sess.exists():
            start_us, end_us, n = self.sess.get()
        for pdf in rows:
            ts_us = pdf["ts"].astype("int64") // 1000
            lo, hi = int(ts_us.min()), int(ts_us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            end_us = hi if end_us is None else max(end_us, hi)
            n += len(pdf)
        self.sess.update((start_us, end_us, n))
        # (re)arm the close timer at end + gap, event time
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer((end_us + self.gap_us) // 1000)  # ms
        return iter([])  # nothing emitted until the session closes

    def handleExpiredTimer(self, key, timer_values, expired_timer_info) -> Iterator[pd.DataFrame]:
        if not self.sess.exists():
            return iter([])
        start_us, end_us, n = self.sess.get()
        self.sess.clear()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
            }
        )

    def close(self) -> None:
        pass


def sessionize_with_timers(events: DataFrame, gap_seconds: int = 1800,
                           watermark: str = "1 hour") -> DataFrame:
    """Timer-driven sessionization over transformWithStateInPandas.
    Event-time timer mode requires a watermark (it drives timer
    expiry); the operator itself requires the RocksDB state store —
    which is also the right provider at scale (incremental
    checkpointing, state far beyond executor heap)."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionEmitter(gap_seconds),
            outputStructType=SESSION_OUTPUT,
            outputMode="append",
            timeMode="eventTime",
        )
    )
