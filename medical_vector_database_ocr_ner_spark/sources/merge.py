"""Hash-bucketed MERGE/upsert over a parquet directory — the S7 analog.

The reference updates a vector-store record by delete + re-add
(vector_service.py:200-224, non-atomic). On Iceberg this is
``MERGE INTO target USING updates ON key WHEN MATCHED UPDATE WHEN NOT
MATCHED INSERT``; this module provides the same upsert semantics over a
plain parquet layout, with the property that matters at 100 TB:
**only the buckets containing updated keys are rewritten**.

Layout: the table directory holds one subdirectory per hash bucket
(``bucket=K/``, K = ``pmod(xxhash64(key), n_buckets)``). An upsert
computes the distinct buckets of the incoming keys (tiny driver list),
reads ONLY those bucket directories, anti-joins the old rows of updated
keys out, unions the new rows in, and swaps the rewritten buckets via
two atomic renames (see ``_swap_bucket`` for the crash window and why
the production layout is an Iceberg metadata swap). Untouched buckets —
at production scale, almost all of them — are never read, never written.

This is the same bucket arithmetic as plans/lineage.py (resume) and
sources/bucketed.py (co-located joins): one layout decision serving
three systems.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

BUCKET_PREFIX = "bucket="


def _bucket_col(key_col, n_buckets: int):
    return F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")


def write_merge_table(
    df: "DataFrame", path: str, key: str, n_buckets: int = 16
) -> None:
    """Initial load: lay the table out as one directory per key-hash
    bucket (the partitioned-by-bucket layout MERGE pruning relies on)."""
    (
        df.withColumn("_bucket", _bucket_col(F.col(key), n_buckets))
        .repartition("_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(path)
    )
    # normalize partition dir names to bucket=K for readability
    for d in os.listdir(path):
        if d.startswith("_bucket="):
            os.rename(
                os.path.join(path, d),
                os.path.join(path, BUCKET_PREFIX + d.split("=", 1)[1]),
            )


def read_merge_table(spark: "SparkSession", path: str) -> "DataFrame":
    return spark.read.option("basePath", path).parquet(
        os.path.join(path, f"{BUCKET_PREFIX}*")
    ).drop("bucket")


def merge_delete(
    spark: "SparkSession",
    path: str,
    keys: "DataFrame",
    key: str,
    n_buckets: int = 16,
) -> dict:
    """DELETE FROM table WHERE key IN (keys) — the S6 analog
    (reference vector_service.py:254 delete-by-id), bucket-pruned like
    merge_upsert: only buckets containing a deleted key are rewritten.

    Returns {"touched_buckets": [...], "n_delete_keys": int}.
    """
    kdf = keys.select(key).withColumn(
        "_b", _bucket_col(F.col(key), n_buckets)
    ).cache()
    try:
        touched = sorted(r["_b"] for r in kdf.select("_b").distinct().collect())
        n_keys = kdf.count()
        for b in touched:
            bucket_dir = os.path.join(path, f"{BUCKET_PREFIX}{b}")
            if not os.path.isdir(bucket_dir):
                continue
            old = spark.read.parquet(bucket_dir)
            kept = old.join(kdf.where(F.col("_b") == b).drop("_b"), key, "left_anti")
            tmp_dir = os.path.join(path, f".tmp-{BUCKET_PREFIX}{b}-{uuid.uuid4().hex}")
            kept.write.mode("overwrite").parquet(tmp_dir)
            _swap_bucket(bucket_dir, tmp_dir)
    finally:
        kdf.unpersist()
    return {"touched_buckets": touched, "n_delete_keys": n_keys}


def merge_upsert(
    spark: "SparkSession",
    path: str,
    updates: "DataFrame",
    key: str,
    n_buckets: int = 16,
) -> dict:
    """MERGE semantics: rows of ``updates`` replace same-key rows in the
    table; new keys are inserted. Only affected buckets are rewritten.

    Returns {"touched_buckets": [...], "n_upserts": int}.
    """
    upd = updates.withColumn("_b", _bucket_col(F.col(key), n_buckets)).cache()
    try:
        n_upserts = upd.count()
        n_distinct = upd.select(key).distinct().count()
        if n_distinct != n_upserts:
            # MERGE INTO errors on multiple source matches for one target
            # row; silently inserting both would break the key-uniqueness
            # invariant every later upsert/delete relies on
            raise ValueError(
                f"updates contain duplicate keys ({n_upserts - n_distinct} "
                "extra rows); deduplicate before merge_upsert"
            )
        touched = sorted(r["_b"] for r in upd.select("_b").distinct().collect())

        for b in touched:
            bucket_dir = os.path.join(path, f"{BUCKET_PREFIX}{b}")
            upd_b = upd.where(F.col("_b") == b).drop("_b")
            if os.path.isdir(bucket_dir):
                old = spark.read.parquet(bucket_dir)
                kept = old.join(upd_b.select(key), key, "left_anti")
                merged = kept.unionByName(upd_b)
            else:
                merged = upd_b
            tmp_dir = os.path.join(path, f".tmp-{BUCKET_PREFIX}{b}-{uuid.uuid4().hex}")
            # materialize BEFORE touching the live dir (read-own-input)
            merged.write.mode("overwrite").parquet(tmp_dir)
            _swap_bucket(bucket_dir, tmp_dir)
    finally:
        upd.unpersist()
    return {"touched_buckets": touched, "n_upserts": n_upserts}


def _swap_bucket(bucket_dir: str, tmp_dir: str) -> None:
    """Two-rename swap: old→aside, tmp→live, then delete aside. Each
    rename is atomic; a crash between them leaves the bucket briefly
    missing from the glob but BOTH copies intact on disk (recover by
    renaming either back). The aside name is DOT-prefixed (same '.'
    convention as the staged copy) so read_merge_table's 'bucket=*' glob
    can never see old and new at once — a crash after the second rename,
    or a concurrent reader mid-swap, observes exactly one copy, never
    duplicate rows (ADVICE r1). Directories cannot be swapped atomically
    on a POSIX filesystem — the production layout (Iceberg) swaps a
    metadata pointer instead, which is why SCALE.md maps this table to
    Iceberg."""
    if os.path.isdir(bucket_dir):
        parent, name = os.path.split(bucket_dir)
        aside = os.path.join(parent, f".old-{name}-{uuid.uuid4().hex}")
        os.rename(bucket_dir, aside)
        os.rename(tmp_dir, bucket_dir)
        shutil.rmtree(aside)
    else:
        os.rename(tmp_dir, bucket_dir)
