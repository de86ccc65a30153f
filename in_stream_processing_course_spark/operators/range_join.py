"""Bucketized point-in-interval (range) join.

Spark has no native range-join optimization: `points JOIN intervals ON
pt >= start AND pt < end` plans as BroadcastNestedLoopJoin (or a
cartesian product per key) — O(|P| x |I|) comparisons, hopeless at
100 TB. The standard rewrite buckets time into fixed-width cells:

- each point lands in exactly ONE bucket (floor(pt / width));
- each interval EXPLODES to every bucket it overlaps (bounded by
  interval_length / width + 1 rows);
- the join becomes a plain (key, bucket) equi-join followed by the
  exact range predicate as a post-filter.

Cost is O(|P| + |I| * avg_buckets_per_interval) shuffled rows and a
hash equi-join — the same trick as LSH banding: coarse blocking via
equi-keys, exact predicate only within blocks. Pick ``bucket_sec``
near the median interval length (too small explodes intervals, too
large inflates the post-filter's candidate set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_sec: int = 1800,
) -> DataFrame:
    """Equi-join-shaped range join: all ``points`` columns plus all
    ``intervals`` columns for the interval (same ``key``) containing
    the point under ``start <= pt < end``. Points in no interval are
    dropped (inner semantics)."""
    pt = F.unix_timestamp(F.col(point_ts))
    p = points.withColumn("_pb", F.floor(pt / bucket_sec))
    s = F.unix_timestamp(F.col(start_ts))
    # end is exclusive: the last overlapped bucket is floor((end-1)/w)
    e = F.unix_timestamp(F.col(end_ts)) - 1
    i = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(F.floor(s / bucket_sec), F.floor(e / bucket_sec))
        ),
    ).withColumnRenamed(key, f"_i_{key}")
    joined = p.join(
        i,
        (F.col(key) == F.col(f"_i_{key}")) & (F.col("_pb") == F.col("_ib")),
    ).where(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_pb", "_ib", f"_i_{key}")
