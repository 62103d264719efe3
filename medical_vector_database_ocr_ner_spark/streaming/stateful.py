"""Custom stateful streaming operator: incremental per-client rate limiting
via ``applyInPandasWithState``.

This is the reference's rate limiter reproduced as arbitrary stateful
processing rather than window aggregation: the reference keeps a dict of
``client:{YYYYMMDDHHMM}`` → count entries and purges entries older than two
hours on every touch (app/utils/validation.py:447-504). Here the per-client
GROUP STATE is exactly that dict (minute-epoch → count), updated per
micro-batch, purged the same way, and each batch emits the updated
(client, minute, n_requests, over_limit) rows — cumulative across batches,
which the pure window aggregation (streaming/rate_limit.py) can't do in
append mode until the watermark closes a window."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType, TimestampType,
)

MINUTE_LIMIT = 60  # reference validation.py:452
PURGE_SECONDS = 2 * 3600  # reference validation.py:495-504

OUTPUT_SCHEMA = StructType(
    [
        StructField("client_id", StringType()),
        StructField("minute", TimestampType()),
        StructField("n_requests", LongType()),
        StructField("over_limit", BooleanType()),
    ]
)

# state: parallel arrays (minute-epoch-seconds, count) — the dict analog
STATE_SCHEMA = StructType(
    [
        StructField("minutes", StringType()),  # csv of epoch-minute ints
        StructField("counts", StringType()),   # csv of counts
    ]
)


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    counts: dict[int, int] = {}
    if state.exists:
        minutes_csv, counts_csv = state.get
        if minutes_csv:
            for m, c in zip(minutes_csv.split(","), counts_csv.split(",")):
                counts[int(m)] = int(c)

    max_seen = max(counts) if counts else 0
    touched: set[int] = set()
    for pdf in batches:
        epochs = (pdf["ts"].astype("int64") // 10**9 // 60).astype(int)
        for m, c in epochs.value_counts().items():
            counts[int(m)] = counts.get(int(m), 0) + int(c)
            touched.add(int(m))
            max_seen = max(max_seen, int(m))

    # the 2h purge, keyed off the newest activity (processing-time analog)
    cutoff = max_seen - PURGE_SECONDS // 60
    counts = {m: c for m, c in counts.items() if m >= cutoff}

    state.update((
        ",".join(str(m) for m in sorted(counts)),
        ",".join(str(counts[m]) for m in sorted(counts)),
    ))

    out = sorted(touched & set(counts))
    yield pd.DataFrame(
        {
            "client_id": [key[0]] * len(out),
            "minute": pd.to_datetime([m * 60 * 10**9 for m in out]),
            "n_requests": [counts[m] for m in out],
            "over_limit": [counts[m] > MINUTE_LIMIT for m in out],
        }
    )


def rate_limit_stateful(requests):
    """requests(client_id, ts, …) stream → incremental per-minute counts
    with cumulative state across micro-batches."""
    return requests.groupBy("client_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_rate_limit(spark, source_dir: str, checkpoint_dir: str,
                            out_dir: str):
    """availableNow drain; update-mode rows land in ``out_dir`` parquet via
    foreachBatch (the memory sink cannot recover from a checkpoint, so
    restartable runs need a batch-writer sink). Each emitted row carries the
    micro-batch id; the CURRENT count per (client, minute) is the row with
    the highest batch_id."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("client_id string, ts timestamp, endpoint string")
        .format("parquet").load(source_dir)
    )

    def sink(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        rate_limit_stateful(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_counts(spark, out_dir: str):
    """Latest state per (client_id, minute) from the update log."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    log = spark.read.parquet(out_dir)
    w = Window.partitionBy("client_id", "minute").orderBy(F.desc("batch_id"))
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "batch_id")
    )
