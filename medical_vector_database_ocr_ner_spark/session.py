"""SparkSession factory with scale-minded defaults.

Tuned for the target deployment (1000-executor cluster over ~100 TB of
pages) but parameterized so local[N] tests/bench use the same code path:

- AQE on (coalesce partitions, skew-join splitting, runtime re-plan).
- Arrow on for every pandas-UDF boundary; bounded batch size so wide HTML
  binary rows don't blow executor memory.
- shuffle partitions sized to cores locally; on a real cluster leave AQE to
  coalesce from a high initial count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "medical-vector-ocr-ner-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # HTML payloads are KB-sized binaries; cap Arrow batches so the
        # Python workers stay memory-bounded at 100 TB scale
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # managed-table warehouse (bucketed tables, sources/bucketed.py)
        # kept out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/mvdb-warehouse"),
        )
        # ANSI ON — Spark 4's default and the config the production driver
        # runs. Hostile-byte quarantine must use try_cast / try_* explicitly
        # at each site rather than relying on a session-wide cast-to-null
        # (round-3 lesson: a non-ANSI builder session masked CAST_INVALID_INPUT
        # failures that only surfaced under the driver's ANSI session).
        .config("spark.sql.ansi.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
