"""Date-partitioned pages layout — partition pruning for incremental runs.

The production pages table is laid out hive/Iceberg-style partitioned by
capture date (``warc_date=YYYY-MM-DD/``; on Iceberg the identical layout
is the ``days(warc_ts)`` partition transform). A backfill or incremental
job that targets a date range then prunes whole partitions at PLANNING
time — the scan never lists, opens, or decodes files outside the range.
At 100 TB with ~3 years of crawls, a one-week incremental touches ~0.6%
of the data instead of 100%.

Intentionally NOT partitioned by host/url: hosts are Zipf-skewed (a hot
host would be a giant partition) and url-keyed work is handled by the
salted repartition inside the extraction DAG instead. Partition values
must be low-cardinality and balanced; dates are, hosts are not.

Pruning is asserted in tests/test_operators_ext.py: the executed plan's
scan shows the date predicate under PartitionFilters (not PushedFilters),
and only the matching partition directories are read.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def write_pages_partitioned(pages: "DataFrame", path: str) -> None:
    """Rewrite a pages DataFrame into the date-partitioned layout."""
    (
        pages.withColumn("warc_date", F.to_date("warc_ts"))
        .repartition("warc_date")  # one writer wave per partition, no
        # thousand tiny files per date
        .write.mode("overwrite")
        .partitionBy("warc_date")
        .parquet(path)
    )


def read_pages_range(
    spark: "SparkSession", path: str, start_date: str, end_date: str
) -> "DataFrame":
    """Scan only the partitions inside [start_date, end_date] — the filter
    is on the partition column, so Catalyst prunes directories before any
    file IO."""
    return spark.read.parquet(path).where(
        (F.col("warc_date") >= F.lit(start_date))
        & (F.col("warc_date") <= F.lit(end_date))
    )
