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


# --- in-stream scoring against a persisted profile (windowed_drift) ---------


def test_stream_drift_scoring_matches_batch_twin(spark, tmp_path):
    """The second deployment shape (score inside the stream, no
    monitor table): the streamed chi² equals the batch twin — whose
    arithmetic the events_drift_score_hourly oracle hash-pins — row
    for row, and unseen categories are surfaced, not folded in."""
    from in_stream_processing_course_spark.streaming.drift import (
        windowed_drift,
    )
    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_to_memory,
    )

    profile = {"click": 0.5, "view": 0.5}
    rows_b1 = [
        ("2024-01-01T10:00:05", "click"),
        ("2024-01-01T10:10:00", "click"),
        ("2024-01-01T10:20:00", "view"),
        ("2024-01-01T10:30:00", "scroll"),  # unseen category
    ]
    rows_b2 = [
        ("2024-01-01T11:01:00", "view"),
        ("2024-01-01T11:02:00", "view"),
        ("2024-01-01T11:03:00", "click"),
    ]
    in_dir = tmp_path / "score_in"
    in_dir.mkdir()
    for name, rows in [("b1.json", rows_b1), ("b2.json", rows_b2)]:
        with open(in_dir / name, "w") as f:
            for ts, et in rows:
                f.write(json.dumps({"ts": ts, "event_type": et}) + "\n")
        time.sleep(1.1)  # file source orders micro-batches by mtime

    schema = "ts timestamp, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(in_dir))
    )
    got = {
        tuple(r)
        for r in run_stream_to_memory(
            windowed_drift(stream, profile, watermark="10 minutes"),
            output_mode="complete",
            checkpoint_dir=str(tmp_path / "score_ckpt"),
        ).collect()
    }
    want = {
        tuple(r)
        for r in windowed_drift(
            spark.read.schema(schema).json(str(in_dir)), profile
        ).collect()
    }
    assert got == want and len(got) == 2
    by_window = {r[0]: r for r in got}
    w10 = by_window[1704103200]  # 2024-01-01T10:00 UTC
    assert w10[1] == 4 and w10[2] == 1  # the scroll event is unseen
    w11 = by_window[1704106800]
    assert w11[1] == 3 and w11[2] == 0


def test_profile_save_load_roundtrip_exact(spark, tmp_path):
    from in_stream_processing_course_spark.streaming.drift import (
        load_reference_profile,
        reference_profile,
        save_reference_profile,
    )

    df = spark.createDataFrame(
        [("click",)] * 3 + [("view",)] * 1, "event_type string"
    )
    path = str(tmp_path / "profile")
    save_reference_profile(df, path)
    assert load_reference_profile(spark, path) == reference_profile(df)
    assert load_reference_profile(spark, path) == {
        "click": 0.75,
        "view": 0.25,
    }
