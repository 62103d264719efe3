"""ST1 — rate limiting as Structured Streaming window counts.

The reference keeps per-client dict counters keyed by ``client:{YYYYMMDDHHMM}``
with a 2-hour purge (app/utils/validation.py:447-504) — i.e. tumbling
1-minute and 1-hour PROCESSING-TIME-style counts with TTL'd state. The
streaming re-expression: tumbling ``window()`` aggregation + watermark-based
state eviction (the 2h purge analog). The reference buckets on wall-clock
arrival; feeding ``current_timestamp()`` as the event column reproduces that
exactly, while batch replays use the recorded ``ts``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

MINUTE_LIMIT = 60  # reference validation.py:452
HOUR_LIMIT = 1000  # reference validation.py:453


def rate_limit_windows(
    requests: "DataFrame",
    client_col: str = "client_id",
    ts_col: str = "ts",
    minute_limit: int = MINUTE_LIMIT,
    hour_limit: int = HOUR_LIMIT,
    watermark: str = "2 hours",
) -> tuple["DataFrame", "DataFrame"]:
    """Returns (per_minute, per_hour) window-count DataFrames with an
    ``over_limit`` flag. Works on both static and streaming inputs; on a
    stream the watermark bounds state exactly like the reference's 2h purge
    (validation.py:495-504)."""
    df = requests
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    minute = (
        df.groupBy(F.col(client_col), F.window(F.col(ts_col), "1 minute").alias("w"))
        .agg(F.count("*").alias("n_requests"))
        .select(
            client_col,
            F.col("w.start").alias("window_start"),
            "n_requests",
            (F.col("n_requests") > minute_limit).alias("over_limit"),
        )
    )
    hour = (
        df.groupBy(F.col(client_col), F.window(F.col(ts_col), "1 hour").alias("w"))
        .agg(F.count("*").alias("n_requests"))
        .select(
            client_col,
            F.col("w.start").alias("window_start"),
            "n_requests",
            (F.col("n_requests") > hour_limit).alias("over_limit"),
        )
    )
    return minute, hour


def run_rate_limit_stream(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: str = "client_id string, ts timestamp, endpoint string",
    minute_limit: int = MINUTE_LIMIT,
):
    """ST1 end-to-end: file stream → tumbling counts → complete-mode sink.
    Uses availableNow so tests drain deterministically."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_dir)
    )
    minute, _ = rate_limit_windows(stream, minute_limit=minute_limit)
    query = (
        minute.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return query
