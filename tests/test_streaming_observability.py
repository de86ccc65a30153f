"""Observed per-batch metrics (streaming/observability.py): the
observe() aggregates ride inside the streaming plan and surface
per micro-batch through the listener, summing to the input exactly.
"""

from __future__ import annotations

import time

from in_stream_processing_course_spark.sources import generator as gen
from in_stream_processing_course_spark.sources.stream import read_action_stream
from in_stream_processing_course_spark.streaming.observability import (
    BatchMetricsListener,
    with_ingest_observations,
)
from in_stream_processing_course_spark.streaming.pipeline import (
    actions_to_log_records,
)
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_to_memory,
)


def _write(tmp_path, name, actions):
    gen.write_json_lines(actions, str(tmp_path / "in" / name))
    return str(tmp_path / "in")


def test_observed_metrics_arrive_per_batch_and_sum_to_input(spark, tmp_path):
    """Observations attach UPSTREAM of the empty-key drop, so
    n_empty_keys counts rows the pipeline is about to discard while the
    query output excludes them — the metric the downstream attach point
    would structurally zero out."""
    b1 = [gen.Action(100 + i, f"c{i % 3}", "u1", "view") for i in range(5)]
    b1.append(gen.Action(105, "c0", "", "view"))  # P3 drop candidate
    b2 = [gen.Action(200 + i, f"c{i % 2}", "u2", "click") for i in range(3)]
    in_dir = _write(tmp_path, "b1.json", b1)
    time.sleep(1.1)  # file source orders micro-batches by mtime
    _write(tmp_path, "b2.json", b2)

    listener = BatchMetricsListener()
    spark.streams.addListener(listener)
    try:
        raw = with_ingest_observations(
            read_action_stream(spark, in_dir, max_files_per_trigger=1)
        )
        out = run_stream_to_memory(
            actions_to_log_records(raw),
            output_mode="append",
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        assert out.count() == 8  # the empty-key row was dropped
        # listener delivery is async on the listener bus
        deadline = time.time() + 30
        while (
            sum(b["n_rows"] for b in listener.batches) < 9
            and time.time() < deadline
        ):
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    batches = [b for b in listener.batches if b["n_rows"] > 0]
    assert len(batches) == 2, batches
    assert sum(b["n_rows"] for b in batches) == 9  # observed PRE-drop
    by_rows = {b["n_rows"]: b for b in batches}
    assert by_rows[6]["n_empty_keys"] == 1
    assert by_rows[3]["n_empty_keys"] == 0
    assert by_rows[6]["min_event_sec"] == 100
    assert by_rows[6]["max_event_sec"] == 105
    assert by_rows[3]["max_event_sec"] == 202
    assert by_rows[6]["approx_keys"] >= 1
    assert all("run_id" in b for b in batches)
