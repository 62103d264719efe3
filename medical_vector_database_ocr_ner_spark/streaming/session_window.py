"""ST — BUILT-IN data-driven session windows (`F.session_window`), the
declarative sibling of the custom `applyInPandasWithState` sessionizer
(streaming/sessions.py; reference analog: the per-client session state
the service keeps between requests, document_service.py caches + the
rate-limit window dicts in app/utils/validation.py).

Both express the same operator — merge events of one entity closer than
a gap; the window boundary is data-driven, not clock-grid — but sit at
opposite ends of the Spark surface:

- `session_window` is JVM-side, codegen'd, state managed by the engine
  (RocksDB-able at scale), append-mode output gated by the watermark.
  This is the production choice whenever the per-session reduction is
  expressible as built-in aggregates.
- `applyInPandasWithState` (sessions.py) pays Python + Arrow per batch
  but admits arbitrary per-session logic. Keep it for what built-ins
  can't say.

tests/test_streaming_lineage.py proves the three-way equivalence:
built-in batch == built-in stream (after watermark flush) == the custom
stateful sessionizer, on the same events.

Session-window semantics pinned here (and mirrored in the DuckDB
oracle): the gap boundary is INCLUSIVE — an event at exactly
last_ts + gap still extends the session (measured against the sf0.1
fixture's one exact-gap pair), i.e. a new session starts only when
ts - prev_ts > gap. `session_last` is reported as window.end - gap ==
the last event's timestamp, so the output matches the lag/cumsum batch
form row-for-row. The value sum is emitted integer-exact
(sum of floor(value·1000)) so cross-engine float summation order can
never shift a hash.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

GAP = "30 minutes"  # same gap as streaming/sessions.py GAP_SECONDS


def session_window_stats(
    events: "DataFrame",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = GAP,
    watermark: str = "3 hours",
) -> "DataFrame":
    """Per-(user, session) stats via the built-in session window. Works
    on static and streaming inputs; on a stream the watermark bounds
    state and gates append-mode emission (a session is final once the
    watermark passes its close)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col(value_col) * 1000).cast("bigint")
            ).alias("sum_value_milli"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr(f"INTERVAL {gap}")).alias(
                "session_last"
            ),
            "n_events",
            "sum_value_milli",
        )
    )


def run_session_window_stream(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    ),
):
    """File stream → built-in session windows → append-mode parquet sink.
    availableNow so tests drain deterministically; sessions emit only
    once the watermark passes their close (drive it with a late sentinel
    event, the rate_limit test pattern)."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_dir)
    )
    out = session_window_stats(stream)
    return (
        out.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
