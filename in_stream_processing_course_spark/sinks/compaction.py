"""Small-file compaction — the maintenance half of the streaming sink
story. A micro-batch parquet sink (streaming/pipeline.py's raw-event
cache, or any foreachBatch append) accretes one-file-per-trigger; at
40-second triggers that is ~2,000 files/day/partition, and at 100 TB
the NameNode listing + per-file open cost dominates scans long before
the bytes do. Compaction rewrites a directory into size-targeted
files with the same rename-swap discipline as
``streaming.pipeline.expire_raw_events`` (temp write -> two renames;
a table format would make this a metadata-only commit).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024  # parquet sweet spot at scale


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ceil(size / target) files, optionally
    range-clustered on ``sort_by`` so footer min/max stats prune after
    compaction. Returns the new file count.

    Same safety contract as ``expire_raw_events``: refuses while a
    streaming query is writing to the directory, rewrites
    distributed (never collects), and swaps via renames. Sizing uses
    the CURRENT on-disk bytes — compressed parquet in, compressed
    parquet out, so the estimate is self-calibrating.
    """
    for q in spark.streams.active:
        desc = (q.lastProgress or {}).get("sink", {}).get("description", "")
        if path in desc:
            raise RuntimeError(
                f"compact_parquet_dir: streaming query {q.name or q.id} is "
                f"actively writing to {path}; stop it before compacting"
            )
    n_files = max(1, -(-_dir_bytes(path) // target_file_bytes))
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        df = df.coalesce(n_files)
    tmp = f"{path}._compact_{uuid.uuid4().hex[:8]}"
    df.write.parquet(tmp)
    old = f"{path}._old_{uuid.uuid4().hex[:8]}"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
