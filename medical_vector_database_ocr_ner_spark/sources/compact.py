"""Small-file compaction for parquet table directories.

Long-running ingestion (micro-batches, per-bucket merge rewrites,
lineage-resumed partial runs) accretes small files; at 100 TB the scan
cost becomes dominated by file-open/footer overhead and driver-side
listing, not bytes. Compaction bin-packs a directory back to a target
file size: read, repartition to ``ceil(total_bytes / target)`` writers,
rewrite, swap. The equivalent of Iceberg's ``rewrite_data_files``.

Swap discipline IS sources/merge.py::_swap_bucket (shared code):
materialize the compacted copy first, then two atomic renames. A crash
between the renames leaves the directory briefly absent from its path
but both copies intact on disk (the ``.old-*`` sibling and the live
dir/tmp) — recover by renaming either back; no rows are ever deleted
before the replacement exists.
"""

from __future__ import annotations

import math
import os
import uuid
from typing import TYPE_CHECKING

from .merge import _swap_bucket

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _dir_stats(path: str) -> tuple[int, int]:
    n_files, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                total += os.path.getsize(os.path.join(root, f))
    return n_files, total


def compact_dir(
    spark: "SparkSession",
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite ``path`` (a FLAT parquet directory) into
    ``ceil(total_bytes / target_bytes)`` files. No-op when the directory
    already has fewer than ``min_files_to_compact`` files or is already
    at-or-below the target count. Returns before/after stats.

    Partitioned layouts (hive ``col=value/`` subdirectories, the bucketed
    merge tables) are rejected: a flat rewrite would silently destroy the
    directory structure their readers glob on — compact each leaf
    directory instead."""
    subdirs = [d for d in os.listdir(path)
               if os.path.isdir(os.path.join(path, d))]
    if subdirs:
        raise ValueError(
            f"{path} contains subdirectories ({subdirs[:3]}…): compact each "
            "leaf partition directory, not the partitioned root"
        )
    n_before, bytes_before = _dir_stats(path)
    n_target = max(1, math.ceil(bytes_before / target_bytes))
    if n_before < min_files_to_compact or n_before <= n_target:
        return {"compacted": False, "files_before": n_before,
                "files_after": n_before, "bytes": bytes_before}

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + f".compact-{uuid.uuid4().hex}"
    df.repartition(n_target).write.mode("overwrite").parquet(tmp)
    _swap_bucket(path.rstrip("/"), tmp)

    n_after, bytes_after = _dir_stats(path)
    return {"compacted": True, "files_before": n_before,
            "files_after": n_after, "bytes": bytes_after}
