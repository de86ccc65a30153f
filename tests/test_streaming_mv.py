"""Streaming materialized-view maintenance (streaming/mv_maintenance):
streamed rollup == one-shot batch aggregate, cross-batch merging, and
replayed-batch idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import drip_json_chunks

from in_stream_processing_course_spark.operators.incremental import (
    finalize_rollup,
    partial_rollup,
)
from in_stream_processing_course_spark.streaming.mv_maintenance import (
    RollupMaintainer,
)
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_foreach_batch,
)

_SCHEMA = "event_id long, event_type string, value double"
_ROWS = [
    (1, "click", 1.25),
    (2, "view", 2.0),
    (3, "click", 0.75),
    (4, "purchase", 10.5),
    (5, "view", 3.25),
    (6, "click", 4.0),
]


def _write_chunks(tmp_path, chunks):
    return drip_json_chunks(
        tmp_path,
        [
            [
                {"event_id": eid, "event_type": etype, "value": v}
                for eid, etype, v in chunk
            ]
            for chunk in chunks
        ],
    )


def test_streamed_rollup_matches_batch(spark, tmp_path):
    in_dir = _write_chunks(tmp_path, [_ROWS[:2], _ROWS[2:5], _ROWS[5:]])
    maintainer = RollupMaintainer(
        str(tmp_path / "mv"), ["event_type"]
    )
    stream = spark.readStream.schema(_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).json(in_dir)
    run_stream_foreach_batch(
        stream.select("event_type", "value"), maintainer
    )
    got = sorted(
        tuple(r) for r in finalize_rollup(maintainer.read(spark)).collect()
    )
    batch = spark.createDataFrame(_ROWS, _SCHEMA).select(
        "event_type", "value"
    )
    expected = sorted(
        tuple(r)
        for r in finalize_rollup(
            partial_rollup(batch, ["event_type"])
        ).collect()
    )
    assert got == expected
    assert len(got) == 3  # click / view / purchase


def test_replayed_batch_is_idempotent(spark, tmp_path):
    maintainer = RollupMaintainer(str(tmp_path / "mv"), ["event_type"])
    batch = spark.createDataFrame(_ROWS[:3], _SCHEMA).select(
        "event_type", "value"
    )
    maintainer(batch, 0)
    once = sorted(tuple(r) for r in maintainer.read(spark).collect())
    maintainer(batch, 0)  # at-least-once redelivery of the same batch
    twice = sorted(tuple(r) for r in maintainer.read(spark).collect())
    assert once == twice, "replayed batch must not double-count"
    maintainer(batch, 1)  # a NEW batch must still merge
    assert (
        sorted(tuple(r) for r in maintainer.read(spark).collect()) != once
    )


def test_maintainer_table_is_queryable_midstream(spark, tmp_path):
    """The rollup is a plain parquet table — batch readers can hit it
    between micro-batches (the point of owning the table rather than
    state-store internals)."""
    maintainer = RollupMaintainer(str(tmp_path / "mv"), ["event_type"])
    maintainer(
        spark.createDataFrame(_ROWS[:4], _SCHEMA).select(
            "event_type", "value"
        ),
        0,
    )
    df = maintainer.read(spark)  # batch readers follow the CURRENT pointer
    assert {
        r["event_type"]: r["n_events"] for r in df.collect()
    } == {"click": 2, "view": 1, "purchase": 1}
    total = df.agg(F.sum("n_events")).collect()[0][0]
    assert total == 4


# --- dead-letter quarantine --------------------------------------------------


def test_quarantine_splits_clean_and_dirty(spark, tmp_path):
    from in_stream_processing_course_spark.operators.quality_checks import (
        Check,
    )
    from in_stream_processing_course_spark.streaming.quarantine import (
        QuarantineSink,
    )

    checks = [
        Check("value_range", "in_range", "value", lo=0.0, hi=100.0),
        Check("type_accepted", "accepted", "event_type",
              values=("click", "view")),
    ]
    sink = QuarantineSink(
        str(tmp_path / "main"), str(tmp_path / "dlq"), checks
    )
    rows = [
        (1, "click", 10.0),       # clean
        (2, "view", -1.0),        # range violation
        (3, "bogus", 5.0),        # accepted violation
        (4, "bogus", 200.0),      # both violations
        (5, "view", None),        # null value -> range violation
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    sink(batch, 0)
    main = QuarantineSink.read(spark, str(tmp_path / "main"))
    dlq = QuarantineSink.read(spark, str(tmp_path / "dlq"))
    assert {r["event_id"] for r in main.collect()} == {1}
    failed = {r["event_id"]: r["failed_checks"] for r in dlq.collect()}
    assert failed[2] == "value_range"
    assert failed[3] == "type_accepted"
    assert failed[4] == "value_range,type_accepted"
    assert failed[5] == "value_range"
    assert "failed_checks" not in main.columns


def test_quarantine_streaming_end_to_end(spark, tmp_path):
    """Drip two micro-batches through readStream; both sinks append
    per batch and nothing is lost: main + dlq row counts == input."""
    from in_stream_processing_course_spark.operators.quality_checks import (
        Check,
    )
    from in_stream_processing_course_spark.streaming.quarantine import (
        QuarantineSink,
    )
    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_foreach_batch,
    )

    in_dir = drip_json_chunks(
        tmp_path,
        [
            [{"event_id": 1, "event_type": "click", "value": 1.0},
             {"event_id": 2, "event_type": "view", "value": -3.0}],
            [{"event_id": 3, "event_type": "view", "value": 2.0},
             {"event_id": 4, "event_type": "bad", "value": 4.0}],
        ],
    )
    checks = [
        Check("value_range", "in_range", "value", lo=0.0, hi=100.0),
        Check("type_accepted", "accepted", "event_type",
              values=("click", "view")),
    ]
    sink = QuarantineSink(str(tmp_path / "main"), str(tmp_path / "dlq"),
                          checks)
    stream = spark.readStream.schema(
        "event_id long, event_type string, value double"
    ).option("maxFilesPerTrigger", "1").json(str(in_dir))
    run_stream_foreach_batch(stream, sink, output_mode="append")
    main_ids = {
        r["event_id"]
        for r in QuarantineSink.read(
            spark, str(tmp_path / "main")
        ).collect()
    }
    dlq_ids = {
        r["event_id"]
        for r in QuarantineSink.read(spark, str(tmp_path / "dlq")).collect()
    }
    assert main_ids == {1, 3}
    assert dlq_ids == {2, 4}


def test_mv_crash_before_commit_preserves_table(spark, tmp_path):
    """A version directory written WITHOUT a pointer swap (crash
    between write and commit) is invisible: readers still see the last
    committed version, and the replayed batch re-merges correctly and
    sweeps the orphan."""
    import os

    maintainer = RollupMaintainer(str(tmp_path / "mv"), ["event_type"])
    b0 = spark.createDataFrame(_ROWS[:3], _SCHEMA).select(
        "event_type", "value"
    )
    maintainer(b0, 0)
    committed = sorted(tuple(r) for r in maintainer.read(spark).collect())
    # simulate a crash: batch 1's data lands but the pointer never swaps
    b1 = spark.createDataFrame(_ROWS[3:], _SCHEMA).select(
        "event_type", "value"
    )
    orphan = os.path.join(str(tmp_path / "mv"), "v_1_deadbeef")
    partial_rollup(b1, ["event_type"]).write.parquet(orphan)
    assert sorted(
        tuple(r) for r in maintainer.read(spark).collect()
    ) == committed, "uncommitted version must be invisible"
    # checkpoint replays batch 1 -> full merge, orphan swept
    maintainer(b1, 1)
    batch_all = spark.createDataFrame(_ROWS, _SCHEMA).select(
        "event_type", "value"
    )
    expected = sorted(
        tuple(r)
        for r in finalize_rollup(
            partial_rollup(batch_all, ["event_type"])
        ).collect()
    )
    got = sorted(
        tuple(r) for r in finalize_rollup(maintainer.read(spark)).collect()
    )
    assert got == expected
    assert not os.path.exists(orphan), "orphan version dir not swept"


def test_quarantine_replayed_batch_is_idempotent(spark, tmp_path):
    """An at-least-once redelivery of a batch (crash before the
    checkpoint commit, even mid-write) must not duplicate rows in
    either sink — the per-batch overwrite directories absorb it."""
    from in_stream_processing_course_spark.operators.quality_checks import (
        Check,
    )
    from in_stream_processing_course_spark.streaming.quarantine import (
        QuarantineSink,
    )

    checks = [Check("value_range", "in_range", "value", lo=0.0, hi=100.0)]
    sink = QuarantineSink(
        str(tmp_path / "main"), str(tmp_path / "dlq"), checks
    )
    batch = spark.createDataFrame(
        [(1, "click", 1.0), (2, "view", -3.0)],
        "event_id long, event_type string, value double",
    )
    sink(batch, 0)
    sink(batch, 0)  # replay
    main = QuarantineSink.read(spark, str(tmp_path / "main"))
    dlq = QuarantineSink.read(spark, str(tmp_path / "dlq"))
    assert main.count() == 1 and dlq.count() == 1


def test_mv_survives_streaming_restart(spark, tmp_path):
    """T6 for the maintainer: stop the stream, add data, restart with
    the same checkpoint — the pointer-committed rollup continues from
    its last version and converges to the one-shot aggregate."""
    import json as js
    import time as tm

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    maintainer = RollupMaintainer(str(tmp_path / "mv"), ["event_type"])

    def write_file(name, rows):
        with open(in_dir / name, "w") as f:
            for eid, etype, v in rows:
                f.write(js.dumps(
                    {"event_id": eid, "event_type": etype, "value": v}
                ) + "\n")
        tm.sleep(1.1)

    def run_once():
        stream = spark.readStream.schema(_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).json(str(in_dir))
        run_stream_foreach_batch(
            stream.select("event_type", "value"),
            maintainer,
            checkpoint_dir=ckpt,
        )

    write_file("a.json", _ROWS[:3])
    run_once()
    write_file("b.json", _ROWS[3:])  # arrives while the engine is down
    run_once()

    batch = spark.createDataFrame(_ROWS, _SCHEMA).select(
        "event_type", "value"
    )
    expected = sorted(
        tuple(r)
        for r in finalize_rollup(
            partial_rollup(batch, ["event_type"])
        ).collect()
    )
    got = sorted(
        tuple(r) for r in finalize_rollup(maintainer.read(spark)).collect()
    )
    assert got == expected
