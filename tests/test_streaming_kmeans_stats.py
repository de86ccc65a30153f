"""Streaming k-means sufficient statistics (streaming/kmeans_stats):
the persisted (cluster, dim) table equals the batch aggregation
EXACTLY after a drained drip (fixed-point sums are order-invariant),
survives a checkpoint restart with more data, and the derived
centroids implement one mini-batch update with empty-cluster
carryover."""

from __future__ import annotations

import time

from in_stream_processing_course_spark.operators.clustering import (
    seed_centroids,
)
from in_stream_processing_course_spark.streaming.kmeans_stats import (
    centroids_from_table,
    cluster_stats_stream,
    maintain_cluster_stats,
)
from in_stream_processing_course_spark.streaming.runner import await_drained

_SCHEMA = "vec_id long, embedding array<double>"
_K = 2


def _write_chunk(spark, in_dir, name: str, rows) -> None:
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(in_dir, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float64())
            ),
        }
    )
    pq.write_table(table, f"{in_dir}/{name}.parquet")


def _table(spark, path) -> dict:
    return {
        (r["cluster"], r["dim"]): (r["vsum_fixed"], r["n"])
        for r in spark.read.parquet(path).collect()
    }


def test_kmeans_stats_stream_matches_batch_and_restarts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    table = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")

    # two seed centroids near (0,0) and (10,10); arrivals cluster around
    # them so assignment (and the carryover case: no arrivals near seed
    # 1 in phase 1) is deterministic
    seeds = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], _SCHEMA
    )
    centroids = seed_centroids(seeds, _K)

    phase1 = [(10, [0.5, 0.25]), (11, [0.25, 0.5]), (12, [-0.25, 0.125])]
    _write_chunk(spark, in_dir, "c0", phase1[:2])
    time.sleep(1.1)
    _write_chunk(spark, in_dir, "c1", phase1[2:])

    stream = spark.readStream.schema(_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    await_drained(maintain_cluster_stats(stream, centroids, table, ckpt))

    batch1 = spark.read.schema(_SCHEMA).parquet(in_dir)
    assert _table(spark, table) == {
        (r["cluster"], r["dim"]): (r["vsum_fixed"], r["n"])
        for r in cluster_stats_stream(batch1, centroids).collect()
    }

    # mini-batch update: cluster 0 moves to the arrivals' exact mean,
    # cluster 1 (no arrivals) keeps its previous centroid
    got = centroids_from_table(spark, table, centroids)
    for d in range(2):
        want = sum(v[d] for _, v in phase1) / len(phase1)
        assert abs(got[0][d] - want) < 1e-6
    assert got[1] == centroids[1]

    # restart with phase-2 data near the second centroid, SAME ckpt
    time.sleep(1.1)
    _write_chunk(spark, in_dir, "c2", [(20, [9.5, 10.5]), (21, [10.5, 9.5])])
    stream2 = spark.readStream.schema(_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    await_drained(maintain_cluster_stats(stream2, centroids, table, ckpt))

    full = spark.read.schema(_SCHEMA).parquet(in_dir)
    assert _table(spark, table) == {
        (r["cluster"], r["dim"]): (r["vsum_fixed"], r["n"])
        for r in cluster_stats_stream(full, centroids).collect()
    }
    got = centroids_from_table(spark, table, centroids)
    assert got[1] == [10.0, 10.0]  # exact mean of the two arrivals
