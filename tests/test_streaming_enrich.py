"""Streaming as-of enrichment (streaming/enrich.py): batch/stream
equivalence with the batch as-of join, cross-batch state carry, and
the no-prior-view null path."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.asof import asof_join_backward
from in_stream_processing_course_spark.streaming.enrich import (
    stream_asof_last_view,
)
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_to_memory,
)

# (event_id, user_id, event_type, epoch_sec) — time-ordered; includes
# equal-ts view+click (visibility rule), a click before any view, and
# a view/click pair split across micro-batches
_EVENTS = [
    (1, 1, "view", 10),
    (5, 2, "click", 5),
    (2, 1, "click", 20),
    (3, 1, "view", 20),
    (4, 1, "click", 20),
    (6, 2, "view", 30),
    (7, 2, "click", 40),
]
_SCHEMA = "event_id long, user_id long, event_type string, time long"


def _write_chunks(tmp_path, chunks):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, chunk in enumerate(chunks):
        with open(in_dir / f"c{i}.json", "w") as f:
            for eid, uid, etype, t in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "user_id": uid,
                            "event_type": etype,
                            "time": t,
                        }
                    )
                    + "\n"
                )
        time.sleep(1.1)  # file-source orders micro-batches by mtime
    return str(in_dir)


def _batch_expected(spark):
    ev = spark.createDataFrame(_EVENTS, _SCHEMA).withColumn(
        "ts", F.timestamp_seconds("time")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    joined = asof_join_backward(
        clicks,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_vals=("view_event_id", "view_ts"),
        order_col="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("click_us"),
        "view_event_id",
        F.unix_micros("view_ts").alias("view_us"),
        (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("wait_us"),
    )


def test_stream_asof_matches_batch(spark, tmp_path):
    """Time-ordered stream in 3 micro-batches == the batch as-of join
    on the same rows (the entry-point-3 property for the enrichment
    operator)."""
    ordered = sorted(_EVENTS, key=lambda e: (e[3], e[0]))
    chunks = [ordered[:5], ordered[5:6], ordered[6:]]
    in_dir = _write_chunks(tmp_path, chunks)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
        .withColumn("ts", F.timestamp_seconds("time"))
    )
    out = run_stream_to_memory(
        stream_asof_last_view(stream),
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {tuple(r) for r in out.collect()}
    expected = {tuple(r) for r in _batch_expected(spark).collect()}
    assert got == expected and len(got) == 4

    by_id = {r[0]: r for r in got}
    # equal-ts: both t=20 clicks see the t=20 view (id 3), not just id 1
    assert by_id[2][3] == 3 and by_id[4][3] == 3
    # click before any view -> null enrichment
    assert by_id[5][3] is None and by_id[5][5] is None
    # cross-batch: view in batch 2 enriches click in batch 3
    assert by_id[7][3] == 6 and by_id[7][5] == 10_000_000


def test_stream_asof_checkpoint_restart(spark, tmp_path):
    """T6/T8 for the enrichment operator: stop after the first file,
    restart on the same checkpoint with a second file present — the
    second run must process ONLY the new file (no re-emission of run-1
    clicks) and carry run-1 state into it (the view seen before the
    stop still enriches the new click)."""
    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_foreach_batch,
    )

    ordered = sorted(_EVENTS, key=lambda e: (e[3], e[0]))
    in_dir = _write_chunks(tmp_path, [ordered[:6]])  # through view id 6
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple] = []

    def stream():
        return (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(in_dir)
            .withColumn("ts", F.timestamp_seconds("time"))
        )

    def sink(df, _batch_id):
        seen.extend(tuple(r) for r in df.collect())

    run_stream_foreach_batch(
        stream_asof_last_view(stream()), sink, "update", checkpoint_dir=ckpt
    )
    first_run = list(seen)
    assert {r[0] for r in first_run} == {2, 4, 5}

    # add the final click (user 2, t=40) and restart on the checkpoint
    with open(tmp_path / "in" / "late.json", "w") as f:
        eid, uid, etype, t = ordered[6]
        f.write(
            json.dumps(
                {"event_id": eid, "user_id": uid, "event_type": etype, "time": t}
            )
            + "\n"
        )
    run_stream_foreach_batch(
        stream_asof_last_view(stream()), sink, "update", checkpoint_dir=ckpt
    )
    second_run = seen[len(first_run):]
    # only the new click was processed, enriched by pre-restart state
    assert [r[0] for r in second_run] == [7]
    assert second_run[0][3] == 6 and second_run[0][5] == 10_000_000
