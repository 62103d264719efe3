"""ST — watermarked STREAM-STREAM interval join, the last member of the
Structured Streaming operator family in this repo (windowed aggs:
rate_limit; watermark dedup: dedup; arbitrary state:
sessions/stateful; built-in session windows: session_window; idempotent
sinks: frontier/ingest — and now the two-sided join).

Semantics: errors ⋈ same-user events that occur inside
[err_ts, err_ts + window) — the streaming form of the batch
interval-overlap range join (plans/queries_ext.q_interval_overlap_join).
An INNER stream-stream join emits each match exactly once as both sides
arrive; correctness never waits on the watermark — the watermark plus
the time-interval join condition exist to let Spark EVICT state: each
side's buffered rows can be dropped once the other side's watermark
passes the interval bound, so state is O(rows within the watermark
horizon), never the whole stream. Without the interval condition the
engine must buffer both streams forever (it warns, then OOMs at scale);
this module therefore refuses to build the join without one.

The batch twin runs THE SAME function on static frames
(tests/test_streaming_lineage.py proves stream == batch == a plain
python recount on fixture events).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

WINDOW = "10 minutes"
WATERMARK = "1 hour"


def interval_join(
    errors: "DataFrame",
    events: "DataFrame",
    window: str = WINDOW,
    watermark: str = WATERMARK,
) -> "DataFrame":
    """(err_id, evt_id, user_id, err_ts, evt_ts) for every same-user
    event inside [err_ts, err_ts + window). Works on static and
    streaming inputs; on streams both sides carry watermarks and the
    interval condition bounds the join state."""
    e = errors
    c = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("ts", watermark)
    e = e.select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("err_ts"),
    )
    c = c.select(
        F.col("event_id").alias("evt_id"),
        F.col("user_id").alias("evt_user"),
        F.col("ts").alias("evt_ts"),
    )
    cond = (
        (F.col("err_user") == F.col("evt_user"))
        & (F.col("evt_ts") >= F.col("err_ts"))
        & (F.col("evt_ts") < F.col("err_ts") + F.expr(f"INTERVAL {window}"))
    )
    return e.join(c, cond).select(
        "err_id", "evt_id", F.col("err_user").alias("user_id"),
        "err_ts", "evt_ts",
    )


def run_interval_join_stream(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    ),
):
    """Two file streams over the same event source (errors vs the rest)
    joined within the interval; append-mode parquet sink, availableNow
    drain. Inner-join matches are final on emission — no sentinel flush
    needed (the watermark only evicts state)."""
    def _stream():
        return (
            spark.readStream.schema(schema).format("parquet")
            .load(source_dir)
        )

    errors = _stream().where(F.col("event_type") == "error")
    events = _stream()
    out = interval_join(errors, events)
    return (
        out.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
