"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (Arrow-batched state API).

The state survives across micro-batches, so sessions spanning a batch
boundary are stitched correctly — the cross-batch test in
tests/test_streaming.py feeds the same events as one batch and as two
and asserts identical session counts. This is the engine's template for
operators Spark's built-ins can't express (SURVEY §2.7 extension;
tumbling windows stay in windowed.py where built-ins suffice).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_SEC = 1800  # 30 min, matches the batch sessionize query

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("n_batches", LongType()),
    ]
)

# state: last event ts (epoch sec), session count, event count, batch count
STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("n_batches", LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events (sorted by ts — arrival order within a
    micro-batch is not guaranteed) into the running session state."""
    last_ts, n_sessions, n_events, n_batches = (
        state.get if state.exists else (None, 0, 0, 0)
    )
    ts_all = pd.concat([p["ts_sec"] for p in pdfs]).sort_values()
    for t in ts_all:
        t = int(t)
        if last_ts is None or t - last_ts > SESSION_GAP_SEC:
            n_sessions += 1
        last_ts = t
        n_events += 1
    state.update((last_ts, n_sessions, n_events, n_batches + 1))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
            "n_batches": [n_batches + 1],
        }
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Per-user session/event counts as an update-mode stateful stream."""
    # a NULL event time cannot be sessionized — and would reach the
    # state function as NaN, crashing int() mid-batch
    prepped = events.filter("ts IS NOT NULL").selectExpr(
        "user_id", "CAST(unix_timestamp(ts) AS BIGINT) AS ts_sec"
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CLOSED_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

# state: current open session (start, last_ts, n_events)
OPEN_SESSION_STATE = StructType(
    [
        StructField("start", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _emit_closed_sessions(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Timeout-driven sessionizer: rows extend the open session; when
    the event-time watermark passes last_ts + gap, the timeout fires
    with NO rows for the key and the closed session is emitted."""
    if state.hasTimedOut:
        start, last_ts, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [start],
                "session_end": [last_ts],
                "n_events": [n],
            }
        )
        return

    start, last_ts, n = state.get if state.exists else (None, None, 0)
    closed = []
    ts_all = pd.concat([p["ts_sec"] for p in pdfs]).sort_values()
    for t in ts_all:
        t = int(t)
        if last_ts is not None and t - last_ts > SESSION_GAP_SEC:
            closed.append((start, last_ts, n))
            start, n = t, 0
        if start is None:
            start = t
        last_ts = t
        n += 1
    state.update((start, last_ts, n))
    # close the open session once the watermark passes the gap
    state.setTimeoutTimestamp((last_ts + SESSION_GAP_SEC) * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


def sessionize_with_timeout(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-user closed sessions emitted as the event-time watermark
    passes each session's gap — the production shape (results stream
    out continuously; state is bounded by open sessions only)."""
    prepped = (
        events.filter("ts IS NOT NULL")  # same NaN guard as sessionize_stateful
        .withWatermark("ts", watermark)
        .selectExpr("ts", "user_id", "CAST(unix_timestamp(ts) AS BIGINT) AS ts_sec")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _emit_closed_sessions,
        outputStructType=CLOSED_SESSION_SCHEMA,
        stateStructType=OPEN_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered query: stateful sessionization over the events
    fixture, final per-user row only (update mode emits one row per
    user per batch; keep the highest-batch row = the final state)."""
    from dagster_etl_spark.streaming.windowed import read_events_stream, run_stream_to_batch

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    raw = run_stream_to_batch(
        sessionize_stateful(read_events_stream(spark, sf_dir)), mode="update"
    )
    # one input file -> one micro-batch in practice, but dedupe defensively:
    # update mode emits one row per (user, batch); keep the final state

    w = Window.partitionBy("user_id").orderBy(F.col("n_batches").desc())
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("user_id", "n_sessions", "n_events")
    )
