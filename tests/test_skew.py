"""Skew-defeat evidence: the fixture's host distribution is deliberately
skewed (~60% of urls on 3 hosts); the salted url-hash repartition must
still produce balanced partitions for the Python stage."""

from pyspark.sql import functions as F


def test_host_skew_exists(pages_df):
    hosts = (
        pages_df.select(F.regexp_extract("url", r"https://([^.]+)\.", 1).alias("h"))
        .groupBy("h").count().collect()
    )
    counts = sorted((r["count"] for r in hosts), reverse=True)
    assert counts[0] > 3 * (sum(counts) / len(counts))  # top host dominates


def test_url_hash_partitions_balanced(spark, pages_df):
    n_parts = 8
    sizes = (
        pages_df.repartition(n_parts, F.col("url"))
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    counts = [r["count"] for r in sizes]
    assert len(counts) == n_parts
    mean = sum(counts) / len(counts)
    assert max(counts) < 1.6 * mean  # no partition dominated by hot hosts
    assert min(counts) > 0.4 * mean


def test_precomputed_salt_column_is_lumpy(spark, pages_df):
    """Control for the design choice: partitioning on pmod(xxhash64(url), N)
    re-hashes the N salt VALUES, whose collisions leave partitions empty —
    which is why extract_documents partitions on the url itself."""
    from medical_vector_database_ocr_ner_spark.functions.columns import url_salt_col

    n_parts = 8
    sizes = (
        pages_df.repartition(n_parts, url_salt_col(F.col("url"), n_parts))
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    assert len(sizes) < n_parts  # some partitions get no salt value at all


def test_host_partitioning_would_be_skewed(spark, pages_df):
    """Control: partitioning by host (the naive key) concentrates rows —
    the thing the salt exists to prevent."""
    host = F.regexp_extract("url", r"https://([^.]+)\.", 1)
    sizes = (
        pages_df.repartition(8, host)
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    counts = sorted((r["count"] for r in sizes), reverse=True)
    mean = sum(counts) / 8  # count empty partitions in the mean
    assert counts[0] > 1.6 * mean  # visibly skewed
