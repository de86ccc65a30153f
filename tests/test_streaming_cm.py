"""Streaming Count-Min maintenance (streaming/cm_sketch.py): the
persisted counter table equals the batch sketch after a drained drip
(stream == batch), survives a checkpoint restart with more data
exactly (no double counting), and serves the same estimates as the
batch-built sketch."""

from __future__ import annotations

import json
import time

from in_stream_processing_course_spark.operators.sketches import (
    cm_estimate,
    cm_sketch,
)
from in_stream_processing_course_spark.sources.stream import (
    read_event_stream,
)
from in_stream_processing_course_spark.streaming.cm_sketch import (
    cm_estimates_from_table,
    cm_maintain,
)
from in_stream_processing_course_spark.streaming.runner import await_drained

_W = 64  # small width so bucket collisions actually occur in-test

_EVENT_SCHEMA = (
    "event_id long, ts string, user_id long, event_type string,"
    " value double, props string"
)


def _write_chunk(in_dir, name: str, user_ids: list[int]) -> None:
    with open(in_dir / name, "w") as f:
        for i, uid in enumerate(user_ids):
            f.write(
                json.dumps(
                    {
                        "event_id": abs(hash((name, i))) % 10**9,
                        "ts": f"2024-01-01T00:00:{i % 60:02d}",
                        "user_id": uid,
                        "event_type": "click",
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                + "\n"
            )


def _table_counts(spark, path) -> dict:
    return {
        (r["row"], r["bucket"]): r["c"]
        for r in spark.read.parquet(path).collect()
    }


def _batch_counts(spark, in_dir) -> dict:
    batch = spark.read.schema(_EVENT_SCHEMA).json(str(in_dir))
    return {
        (r["row"], r["bucket"]): r["c"]
        for r in cm_sketch(batch, "user_id", w=_W).collect()
    }


def test_cm_maintain_stream_matches_batch_and_restarts(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    table = str(tmp_path / "cm_table")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: two micro-batches of skewed keys (7 is the heavy one)
    _write_chunk(in_dir, "c0.json", [7, 7, 7, 11, 13])
    time.sleep(1.1)  # file source orders micro-batches by mtime
    _write_chunk(in_dir, "c1.json", [7, 7, 11, 999])

    stream = read_event_stream(spark, str(in_dir), max_files_per_trigger=1)
    await_drained(cm_maintain(stream, "user_id", table, ckpt, w=_W))
    assert _table_counts(spark, table) == _batch_counts(spark, in_dir)

    # phase 2: MORE data, SAME checkpoint — the restarted query must
    # resume from committed offsets and state (no double counting, no
    # gaps), landing exactly on the batch sketch over all files
    time.sleep(1.1)
    _write_chunk(in_dir, "c2.json", [7, 13, 13, 42])
    stream2 = read_event_stream(spark, str(in_dir), max_files_per_trigger=1)
    await_drained(cm_maintain(stream2, "user_id", table, ckpt, w=_W))
    merged = _table_counts(spark, table)
    assert merged == _batch_counts(spark, in_dir)
    # the sketch is overcount-only and exact totals sum per hash row:
    # every one of the d rows holds all 13 events
    by_row: dict[int, int] = {}
    for (row, _), c in merged.items():
        by_row[row] = by_row.get(row, 0) + c
    assert set(by_row.values()) == {13}

    # deploy-time read side: maintained-table estimates == the batch
    # sketch's estimates, for seen and unseen probes alike
    probes = spark.createDataFrame(
        [(7,), (11,), (13,), (42,), (999,), (123456,)], "user_id long"
    )
    got = {
        r["user_id"]: r["cm_est"]
        for r in cm_estimates_from_table(
            spark, table, probes, "user_id", w=_W
        ).collect()
    }
    batch = spark.read.schema(_EVENT_SCHEMA).json(str(in_dir))
    want = {
        r["user_id"]: r["cm_est"]
        for r in cm_estimate(
            probes, "user_id", cm_sketch(batch, "user_id", w=_W), w=_W
        ).collect()
    }
    assert got == want
    assert got[7] >= 5  # true count, overcount-only
    assert len(got) == 6  # one row per probe, unseen keys included
