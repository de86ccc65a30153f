"""Slowly-changing dimension refresh under streaming enrichment: a
foreachBatch body that re-reads the dimension table per micro-batch
picks up dimension changes BETWEEN batches — the broadcast-dim-refresh
pattern for joins against a mutating reference table. (A plan-level
stream-static join may cache the static side's file listing for the
query's lifetime, so per-batch reload inside foreachBatch is the
reliable form; this test pins that contract.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import drip_json_chunks
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_foreach_batch,
)


def _write_dim(spark, path, rows):
    spark.createDataFrame(rows, "k long, label string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_dim_refresh_between_micro_batches(spark, tmp_path):
    dim_path = str(tmp_path / "dim")
    out_path = str(tmp_path / "out")
    _write_dim(spark, dim_path, [(1, "old"), (2, "old")])

    in_dir = drip_json_chunks(
        tmp_path,
        [
            [{"event_id": 10, "k": 1}, {"event_id": 11, "k": 2}],
            [{"event_id": 20, "k": 1}, {"event_id": 21, "k": 2}],
        ],
    )

    def enrich(batch_df, batch_id):
        dim = batch_df.sparkSession.read.parquet(dim_path)
        joined = batch_df.join(F.broadcast(dim), "k", "left")
        joined.write.mode("overwrite").parquet(f"{out_path}/b{batch_id}")
        if batch_id == 0:
            # the dimension mutates AFTER batch 0 commits
            _write_dim(batch_df.sparkSession, dim_path,
                       [(1, "new"), (2, "new")])

    stream = spark.readStream.schema("event_id long, k long").option(
        "maxFilesPerTrigger", "1"
    ).json(in_dir)
    run_stream_foreach_batch(stream, enrich, output_mode="append")

    got = {
        r["event_id"]: r["label"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(out_path)
        .collect()
    }
    assert got == {10: "old", 11: "old", 20: "new", 21: "new"}
