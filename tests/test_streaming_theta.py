"""Streaming theta-sample maintenance (streaming/distinct_sketch.py):
the persisted sampled-key table equals the batch sample after a
drained drip (stream == batch, EXACT — the sample is deterministic),
survives a checkpoint restart with more data exactly (keyed merge, no
duplicates), and serves the same estimates as the registered batch
query."""

from __future__ import annotations

import json
import time

from in_stream_processing_course_spark.operators.sketches import (
    theta_sample,
)
from in_stream_processing_course_spark.sources.stream import (
    read_event_stream,
)
from in_stream_processing_course_spark.streaming.distinct_sketch import (
    theta_estimates_from_table,
    theta_maintain,
)
from in_stream_processing_course_spark.streaming.runner import await_drained

_EVENT_SCHEMA = (
    "event_id long, ts string, user_id long, event_type string,"
    " value double, props string"
)
_LG = 1  # p = 1/2 so tiny test populations actually sample


def _write_chunk(in_dir, name: str, rows: list[tuple[int, str]]) -> None:
    with open(in_dir / name, "w") as f:
        for i, (uid, et) in enumerate(rows):
            f.write(
                json.dumps(
                    {
                        "event_id": abs(hash((name, i))) % 10**9,
                        "ts": f"2024-01-01T00:00:{i % 60:02d}",
                        "user_id": uid,
                        "event_type": et,
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                + "\n"
            )


def _table_keys(spark, path) -> set:
    return {
        (r["event_type"], r["h"])
        for r in spark.read.parquet(path).collect()
    }


def _batch_keys(spark, in_dir) -> set:
    batch = spark.read.schema(_EVENT_SCHEMA).json(str(in_dir))
    return {
        (r["event_type"], r["h"])
        for r in theta_sample(
            batch, "user_id", _LG, ("event_type",)
        ).collect()
    }


def test_theta_maintain_stream_matches_batch_and_restarts(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    table = str(tmp_path / "theta")
    ckpt = str(tmp_path / "ckpt")

    # duplicated users across batches and types: the sample must
    # collapse them (distinct semantics), never double-MERGE
    _write_chunk(
        in_dir, "c0.json",
        [(u, "click") for u in range(30)] + [(7, "view"), (7, "click")],
    )
    time.sleep(1.1)
    _write_chunk(
        in_dir, "c1.json",
        [(u, "click") for u in range(30)] + [(u, "view") for u in range(10)],
    )
    stream = read_event_stream(spark, str(in_dir), max_files_per_trigger=1)
    await_drained(theta_maintain(stream, "user_id", table, ckpt, _LG))
    assert _table_keys(spark, table) == _batch_keys(spark, in_dir)

    # restart with MORE data, SAME checkpoint
    time.sleep(1.1)
    _write_chunk(
        in_dir, "c2.json",
        [(u, "purchase") for u in range(100, 140)] + [(5, "click")],
    )
    stream2 = read_event_stream(spark, str(in_dir), max_files_per_trigger=1)
    await_drained(theta_maintain(stream2, "user_id", table, ckpt, _LG))
    got = _table_keys(spark, table)
    assert got == _batch_keys(spark, in_dir)

    # read side == the registered query's arithmetic on the same rows
    est = {
        r["event_type"]: (r["n_sampled"], r["distinct_est"])
        for r in theta_estimates_from_table(spark, table, _LG).collect()
    }
    by_type: dict[str, set] = {}
    for et, h in got:
        by_type.setdefault(et, set()).add(h)
    for et, hs in by_type.items():
        assert est[et] == (len(hs), len(hs) * 2)
    all_h = {h for _, h in got}
    assert est["ALL"] == (len(all_h), len(all_h) * 2)
    # the estimate is in the right ballpark for p=1/2 (40 distinct
    # purchase users -> est within a loose 3-sigma band)
    n, e = est["purchase"]
    assert 10 <= e <= 80 and e == 2 * n


def test_theta_registered_query_tracks_exact(spark):
    """The registered hash-backed query's estimates land within a
    loose binomial band of the exact distinct counts at sf0.01 (150
    users per type, p=1/4 -> ~37 sampled, ~16% sigma)."""
    from in_stream_processing_course_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.01"
    got = {
        r["event_type"]: r["distinct_est"]
        for r in QUERIES["events_theta_distinct_users"](spark, sf).collect()
    }
    assert set(got) == {"ALL", "click", "error", "purchase", "signup", "view"}
    for et, est in got.items():
        assert 60 <= est <= 300, f"{et}: est {est} vs exact 150"
