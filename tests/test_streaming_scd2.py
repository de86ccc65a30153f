"""Streaming SCD2 (streaming/scd2_stream.py): batch/stream
equivalence with operators/scd.scd2_apply, cross-batch version
continuity, and no-op suppression."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import drip_json_chunks

from in_stream_processing_course_spark.operators.scd import scd2_apply
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_to_memory,
)
from in_stream_processing_course_spark.streaming.scd2_stream import (
    stream_scd2_user_type,
)

# (event_id, user_id, event_type, epoch_sec) — time-ordered; includes
# a no-op re-send (event 3), a cross-batch transition (user 1's "c"
# arrives two batches after "a"), and a user whose whole history is
# one batch
_EVENTS = [
    (1, 1, "a", 100),
    (2, 2, "x", 150),
    (3, 1, "a", 200),   # no-op: must not open a version
    # --- batch boundary ---
    (4, 1, "b", 300),
    (5, 2, "y", 350),
    # --- batch boundary ---
    (6, 1, "c", 400),
]
_SCHEMA = "event_id long, user_id long, event_type string, time long"


def _write_chunks(tmp_path, chunks):
    return drip_json_chunks(
        tmp_path,
        [
            [
                {"event_id": eid, "user_id": uid,
                 "event_type": etype, "time": t}
                for eid, uid, etype, t in chunk
            ]
            for chunk in chunks
        ],
    )


def _batch_expected(spark):
    """scd2_apply over the CDC changes of the same event list."""
    ev = spark.createDataFrame(_EVENTS, _SCHEMA)
    changes = ev.select(
        "user_id",
        "event_type",
        (F.col("time") * 1_000_000).alias("ts"),
    )
    dim = scd2_apply(None, changes, ["user_id"], ["event_type"])
    return {
        (r["user_id"], r["version"]): (
            r["event_type"], r["valid_from"], r["valid_to"], r["is_current"]
        )
        for r in dim.collect()
    }


def test_stream_scd2_matches_batch(spark, tmp_path):
    in_dir = _write_chunks(
        tmp_path, [_EVENTS[:3], _EVENTS[3:5], _EVENTS[5:]]
    )
    stream = spark.readStream.schema(_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).json(in_dir).withColumn("ts", F.timestamp_seconds("time"))
    got_df = run_stream_to_memory(
        stream_scd2_user_type(stream), output_mode="update"
    )
    # a version's FINAL form is its last emission (update-mode upsert
    # on (user, version) — exactly what a keyed sink would hold)
    rows = got_df.collect()
    final: dict = {}
    for r in rows:  # memory sink preserves emission order per batch
        final[(r["user_id"], r["version"])] = (
            r["event_type"], r["valid_from"], r["valid_to"], r["is_current"]
        )
    assert final == _batch_expected(spark)
    # user 1: exactly 3 versions (the no-op re-send opened none)
    assert max(v for (u, v) in final if u == 1) == 3
    # closed versions carry valid_to and lost is_current
    a_row = final[(1, 1)]
    assert a_row[2] == 300_000_000 and a_row[3] is False
    c_row = final[(1, 3)]
    assert c_row[2] is None and c_row[3] is True
