"""Bucketed managed tables — shuffle-free co-located joins.

At 100 TB the dominant join cost is the shuffle of the fact side. For the
recurring joins of this engine (documents ⋈ embeddings on content hash,
entities ⋈ documents on url, orders ⋈ lineitem on orderkey) both sides
are written ONCE bucketed + sorted on the join key; every later join then
compiles to a SortMergeJoin with **zero Exchange** — the bucket files are
the partitioning, persisted on disk, reused across jobs. This is the
batch analog of co-partitioned stream-stream joins, and on Iceberg the
same layout is expressed as a bucket partition transform
(``bucket(N, key)``).

Proven in tests/test_operators_ext.py::TestBucketedJoin — the executed
plan of a bucketed-bucketed join is asserted to contain no
``Exchange hashpartitioning`` while producing byte-identical results to
the shuffled join.
"""

from __future__ import annotations

import os
import shutil
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: "DataFrame",
    table: str,
    key: str,
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist df as a managed parquet table bucketed AND sorted by key.

    Sorting within buckets lets the sort-merge join skip its sort step
    (plan shows the scan already satisfying the ordering), so the join is
    a pure linear merge per bucket pair.

    Overwrite is idempotent across sessions: with the default in-memory
    catalog a new session forgets the table but its warehouse directory
    survives, which would fail the write with LOCATION_ALREADY_EXISTS — so
    on overwrite, drop the table AND clear any orphaned local location
    first. Other modes (append) never touch existing data.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:"):]
        if warehouse.startswith("/"):
            shutil.rmtree(os.path.join(warehouse, table), ignore_errors=True)
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: "SparkSession", left_table: str, right_table: str, key: str
) -> "DataFrame":
    """Join two identically-bucketed tables on their bucket key — no
    exchange on either side (bucket count must match; Spark verifies)."""
    return spark.table(left_table).join(spark.table(right_table), key)
