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


def _require_bounds(window: str, watermark: str) -> None:
    """The docstring's 'refuses to build without an eviction bound' is
    enforced here, not just asserted in prose: an empty/blank window or
    watermark would silently produce an unbounded-state stream-stream
    join (Spark warns once, then buffers both sides forever)."""
    if not (window and str(window).strip()):
        raise ValueError(
            "interval_join requires a non-empty time window — without the "
            "interval predicate the join state is unbounded"
        )
    if not (watermark and str(watermark).strip()):
        raise ValueError(
            "interval_join requires a non-empty watermark — without it "
            "buffered join state is never evicted"
        )


def _prepare(errors, events, window, watermark):
    _require_bounds(window, watermark)
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
    return e, c, cond


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
    e, c, cond = _prepare(errors, events, window, watermark)
    return e.join(c, cond).select(
        "err_id", "evt_id", F.col("err_user").alias("user_id"),
        "err_ts", "evt_ts",
    )


def interval_join_outer(
    errors: "DataFrame",
    events: "DataFrame",
    window: str = WINDOW,
    watermark: str = WATERMARK,
) -> "DataFrame":
    """LEFT-OUTER variant: every error row appears — matched rows emit
    as both sides arrive (same as inner), and an error with NO same-user
    event inside its interval emits once with null (evt_id, evt_ts).

    Streaming semantics: the null row for an unmatched error can only be
    emitted once Spark is SURE no match will arrive — i.e. when the
    events-side watermark passes err_ts + window — so outer results
    trail the watermark; that is the price of the null, not a bug. Both
    sides MUST carry watermarks (Spark rejects an outer stream-stream
    join without them); the batch twin is a plain left join and emits
    immediately."""
    e, c, cond = _prepare(errors, events, window, watermark)
    return e.join(c, cond, "left_outer").select(
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
