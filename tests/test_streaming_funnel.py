"""Streaming three-step funnel (streaming/funnel.py): the stage
machine over micro-batches must equal the batch conditional-min chain
on the same time-ordered rows, including the ordering edge cases
(purchase before click never matches; equal-ts stage priority)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from in_stream_processing_course_spark.streaming.funnel import (
    stream_funnel_three_step,
)
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_foreach_batch,
)

# (event_id, user_id, event_type, epoch_sec)
# user 1: full funnel split across batches
# user 2: purchase arrives between view and click -> never matches
# user 3: click before any view -> stage 2 never reached
# user 4: equal-ts view+click (click counts: view sorts first), then
#         equal-ts purchase with a later click already set
_EVENTS = [
    (1, 1, "view", 10),
    (2, 2, "view", 10),
    (3, 3, "click", 5),
    (4, 3, "view", 12),
    (5, 2, "purchase", 15),
    (6, 1, "click", 20),
    (7, 2, "click", 20),
    (8, 4, "view", 25),
    (9, 4, "click", 25),
    (10, 1, "purchase", 30),
    (11, 4, "purchase", 25),
]
_SCHEMA = "event_id long, user_id long, event_type string, time long"


def _expected():
    """The batch definition in pure Python: min view; min click
    at-or-after it; min purchase at-or-after that click."""
    out = {}
    for uid in {e[1] for e in _EVENTS}:
        evs = [e for e in _EVENTS if e[1] == uid]
        views = [t for _, _, ty, t in evs if ty == "view"]
        if not views:
            continue
        v = min(views)
        clicks = [t for _, _, ty, t in evs if ty == "click" and t >= v]
        c = min(clicks) if clicks else None
        purch = (
            [t for _, _, ty, t in evs if ty == "purchase" and t >= c]
            if c is not None
            else []
        )
        p = min(purch) if purch else None
        out[uid] = (
            v * 1_000_000,
            None if c is None else c * 1_000_000,
            None if p is None else p * 1_000_000,
        )
    return out


def test_stream_funnel_matches_batch_chain(spark, tmp_path):
    ordered = sorted(_EVENTS, key=lambda e: (e[3], e[0]))
    chunks = [ordered[:4], ordered[4:8], ordered[8:]]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, chunk in enumerate(chunks):
        with open(in_dir / f"c{i}.json", "w") as f:
            for eid, uid, ty, t in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "user_id": uid,
                            "event_type": ty,
                            "time": t,
                        }
                    )
                    + "\n"
                )
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
        .withColumn("ts", F.timestamp_seconds("time"))
    )
    emissions: list[tuple[int, tuple]] = []

    def sink(df, batch_id):
        emissions.extend((batch_id, tuple(r)) for r in df.collect())

    run_stream_foreach_batch(
        stream_funnel_three_step(stream),
        sink,
        "update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    last: dict[int, tuple] = {}
    for batch_id, row in sorted(emissions, key=lambda e: e[0]):
        last[row[0]] = row
    expected = _expected()
    got = {u: (r[1], r[2], r[3]) for u, r in last.items()}
    assert got == expected
    # the edge cases explicitly:
    assert got[2][2] is None  # purchase before click never matched
    assert got[3][1] is None  # click before view never matched
    assert got[4] == (25_000_000, 25_000_000, 25_000_000)  # equal-ts chain
