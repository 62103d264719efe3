"""Custom stateful sessionization via ``applyInPandasWithState``.

Event-time session windows with a gap timeout: events of the same user
closer than ``gap`` belong to one session; a session CLOSES (and is
emitted exactly once) when a later event of the same user arrives more
than ``gap`` after its last event, or — in continuous deployments — when
the group state times out. This is the classic per-entity session
operator a windowed aggregation cannot express (the window boundary
depends on the data, not the clock grid); the batch analog is the
lag-based ``q_user_sessions`` (plans/queries.py).

State per user: (session_start_epoch_us, last_event_epoch_us, n_events,
sum_value) — fixed-size regardless of session length, so state is
O(active users), not O(events), at any scale.

Timeout modes: a continuously-running deployment passes
``use_timeout=True`` (ProcessingTimeTimeout) so sessions of users who
simply stop sending flush after the gap elapses. Drain/replay mode
(``trigger(availableNow)``) must use ``use_timeout=False``: with pending
processing-time timeouts Spark keeps scheduling micro-batches until they
fire, so an availableNow query would never terminate; in a drain,
still-open sessions stay in the checkpointed state store and close on
the next drain's events — verified in tests/test_streaming_lineage.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

GAP_SECONDS = 30 * 60


def _make_sessionize(use_timeout: bool):
    def _sessionize(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        gap_us = GAP_SECONDS * 10**6
        closed: list[tuple[int, int, int, float]] = []

        cur = tuple(state.get) if state.exists else None  # (start, last, n, sum)

        if state.hasTimedOut:
            if cur is not None:
                closed.append(cur)
            state.remove()
        else:
            rows = []
            for pdf in batches:
                ts_us = pdf["ts"].astype("int64") // 1000
                rows.extend(zip(ts_us, pdf["value"]))
            # Exact gap-split over EVERYTHING visible this batch: each event
            # as a point interval plus the recovered open session as a real
            # interval, swept in start order. This is the same split the
            # lag-based batch analog (q_user_sessions) produces, so replay/
            # backfill with stragglers — including several old events that
            # are within the gap of each other but all older than the
            # recovered session (the round-1 divergence) — close as ONE
            # merged session, never one-session-per-event.
            intervals = [(int(t), int(t), 1, float(v)) for t, v in sorted(rows)]
            if cur is not None:
                intervals.append(cur)
                intervals.sort(key=lambda iv: (iv[0], iv[1]))
            cur = None
            for iv in intervals:
                if cur is None:
                    cur = iv
                elif iv[0] - cur[1] <= gap_us:
                    cur = (cur[0], max(cur[1], iv[1]),
                           cur[2] + iv[2], cur[3] + iv[3])
                else:
                    closed.append(cur)
                    cur = iv
            if cur is not None:
                state.update(cur)
                if use_timeout:
                    state.setTimeoutDuration(GAP_SECONDS * 1000)

        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": pd.to_datetime([c[0] * 1000 for c in closed]),
                "session_end": pd.to_datetime([c[1] * 1000 for c in closed]),
                "n_events": [c[2] for c in closed],
                "sum_value": [round(c[3], 4) for c in closed],
            }
        )

    return _sessionize


def sessionize_stream(events, use_timeout: bool = False):
    """events(user_id, ts, value, …) stream → closed-session rows.
    use_timeout=True only for continuously-running queries (see module
    docstring)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionize(use_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_sessionize(spark, source_dir: str, checkpoint_dir: str, out_dir: str):
    """availableNow drain of a parquet events directory → closed sessions
    to parquet. Sessions still open when the drain finishes remain in the
    checkpointed state store and close on the next drain's events."""
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .format("parquet")
        .load(source_dir)
    )

    def sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        sessionize_stream(stream, use_timeout=False)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
