"""Streaming drift monitor (streaming/drift.py): the windowed count
stream MERGEs into the monitor table exactly (stream/batch
equivalence), and chi2_by_window reads a zero statistic off the
reference-shaped window and a positive one off the skewed window."""

from __future__ import annotations

import json
import time

from in_stream_processing_course_spark.sources.stream import (
    read_event_stream,
)
from in_stream_processing_course_spark.streaming.drift import (
    chi2_by_window,
    drift_monitor,
    windowed_type_counts,
)
from in_stream_processing_course_spark.streaming.runner import await_drained

# two 10-minute windows: 00:00 balanced (4 click / 4 view), 00:10
# skewed (7 click / 1 view)
_BALANCED = [("click", 0, 4), ("view", 0, 4)]
_SKEWED = [("click", 1, 7), ("view", 1, 1)]
_REF = {"click": 0.5, "view": 0.5}


def _rows(spec):
    rows, eid = [], 0
    for etype, win, n in spec:
        for i in range(n):
            rows.append(
                {
                    "event_id": win * 1000 + eid,
                    "ts": f"2024-01-01T00:{win * 10:02d}:{i + 1:02d}",
                    "user_id": i,
                    "event_type": etype,
                    "value": 1.0,
                    "props": "{}",
                }
            )
            eid += 1
    return rows


def _write_chunks(tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, spec in enumerate([_BALANCED, _SKEWED]):
        with open(in_dir / f"c{i}.json", "w") as f:
            for r in _rows(spec):
                f.write(json.dumps(r) + "\n")
        time.sleep(1.1)  # file-source orders micro-batches by mtime
    return str(in_dir)


def test_drift_monitor_stream_matches_batch_and_flags_skew(spark, tmp_path):
    in_dir = _write_chunks(tmp_path)
    table = str(tmp_path / "monitor")
    ckpt = str(tmp_path / "ckpt")

    stream = read_event_stream(spark, in_dir, max_files_per_trigger=1)
    query = drift_monitor(stream, table, ckpt)
    await_drained(query)

    monitor = spark.read.parquet(table)
    got = {
        (r.window_start, r.event_type): r.n for r in monitor.collect()
    }
    batch = spark.read.schema(
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).json(in_dir)
    expected = {
        (r.window_start, r.event_type): r.n
        for r in windowed_type_counts(batch).collect()
    }
    assert got == expected  # stream MERGE == batch aggregation

    chi2 = {r.window_start: r for r in chi2_by_window(monitor, _REF).collect()}
    assert len(chi2) == 2
    balanced, skewed = sorted(chi2)
    assert chi2[balanced].chi2 == 0.0
    assert chi2[skewed].chi2 > 1.0
    assert chi2[skewed].top_over_type == "click"
    assert chi2[skewed].n_events == 8


def test_drift_monitor_replay_is_idempotent(spark, tmp_path):
    """Restarting from the checkpoint with no new files must not
    change the monitor table (MERGE by key + exactly-once offsets)."""
    in_dir = _write_chunks(tmp_path)
    table = str(tmp_path / "monitor")
    ckpt = str(tmp_path / "ckpt")

    for _ in range(2):
        stream = read_event_stream(spark, in_dir, max_files_per_trigger=1)
        query = drift_monitor(stream, table, ckpt)
        await_drained(query)

    monitor = spark.read.parquet(table)
    assert monitor.count() == monitor.dropDuplicates(
        ["window_start", "event_type"]
    ).count()
    total = sum(r.n for r in monitor.collect())
    assert total == sum(n for _, _, n in _BALANCED + _SKEWED)
