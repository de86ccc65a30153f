"""Streaming per-key EWMA (streaming/ewma.py): batch/stream
equivalence — the state-carried fold over micro-batches must equal
the batch query's single ordered fold bit-for-bit (same fold order,
same double ops), plus cross-batch update emission."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from in_stream_processing_course_spark.streaming.ewma import (
    EWMA_ALPHA,
    stream_user_value_ewma,
)
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_foreach_batch,
)

# (event_id, user_id, value, epoch_sec) — user 1 spans all three
# micro-batches, user 2 two, user 3 is a single-event key (EWMA =
# seed value, no recurrence application)
_EVENTS = [
    (1, 1, 10.0, 10),
    (2, 2, 4.0, 11),
    (3, 1, 20.0, 20),
    (4, 1, 14.0, 21),
    (5, 3, 7.5, 25),
    (6, 2, 6.0, 30),
    (7, 1, 0.25, 40),
]
_SCHEMA = "event_id long, user_id long, value double, time long"


def _write_chunks(tmp_path, chunks):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, chunk in enumerate(chunks):
        with open(in_dir / f"c{i}.json", "w") as f:
            for eid, uid, v, t in chunk:
                f.write(
                    json.dumps(
                        {"event_id": eid, "user_id": uid, "value": v, "time": t}
                    )
                    + "\n"
                )
        time.sleep(1.1)  # file-source orders micro-batches by mtime
    return str(in_dir)


def _expected():
    """The batch fold in pure Python: IEEE doubles with one rounding
    per op, the identical operation sequence Spark's ``aggregate``
    lambda and the streaming state fold both execute — so equality
    below is exact, not approximate."""
    out = {}
    for uid in {e[1] for e in _EVENTS}:
        seq = sorted(
            (e for e in _EVENTS if e[1] == uid), key=lambda e: (e[3], e[0])
        )
        s = None
        for _, _, v, _ in seq:
            s = v if s is None else s * (1.0 - EWMA_ALPHA) + v * EWMA_ALPHA
        out[uid] = (len(seq), s)
    return out


def test_stream_ewma_matches_batch_fold(spark, tmp_path):
    ordered = sorted(_EVENTS, key=lambda e: (e[3], e[0]))
    chunks = [ordered[:3], ordered[3:5], ordered[5:]]
    in_dir = _write_chunks(tmp_path, chunks)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
        .withColumn("ts", F.timestamp_seconds("time"))
    )
    emissions: list[tuple[int, tuple]] = []

    def sink(df, batch_id):
        emissions.extend((batch_id, tuple(r)) for r in df.collect())

    run_stream_foreach_batch(
        stream_user_value_ewma(stream),
        sink,
        "update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # user 1 appears in all three micro-batches -> three update rows
    assert sum(1 for _, r in emissions if r[0] == 1) == 3

    last: dict[int, tuple] = {}
    for batch_id, row in sorted(emissions, key=lambda e: e[0]):
        last[row[0]] = row
    expected = _expected()
    assert set(last) == set(expected)
    for uid, (n, s) in expected.items():
        assert last[uid][1] == n
        assert last[uid][2] == s  # exact: same double op sequence
