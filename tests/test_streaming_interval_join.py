"""Stream-stream interval join (streaming/interval_join.py):
batch/stream equivalence, cross-micro-batch matching, and watermark
state-bound behavior; plus streaming session_window equivalence with
the batch sessionize query (both native Spark operators the reference
course lacks — SURVEY §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import drip_json_chunks

from in_stream_processing_course_spark.plans.events_queries import (
    SESSION_GAP,
)
from in_stream_processing_course_spark.streaming.interval_join import (
    interval_join_view_click,
    split_view_click,
)
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_to_memory,
)

# (event_id, user_id, event_type, epoch_sec) — time-ordered; includes
# an equal-ts view+click, a click with no prior view, a view and its
# click split ACROSS micro-batches, and a view too old to match
_EVENTS = [
    (1, 1, "view", 100),
    (2, 2, "view", 120),
    (3, 1, "click", 100),  # equal-ts: view 1 matches (<=)
    (4, 1, "click", 200),  # matches view 1
    (5, 3, "click", 250),  # no view for user 3 -> no row
    # --- micro-batch boundary ---
    (6, 2, "click", 20120),  # matches view 2 (20000 s later, < 6 h)
    (7, 1, "view", 40000),
    (8, 1, "click", 40000 + 21600),  # inclusive lower bound edge
    (9, 1, "click", 40000 + 21601),  # just outside window -> view 7 out
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


def _with_ts(df):
    return df.withColumn("ts", F.timestamp_seconds("time"))


def _batch_result(spark):
    ev = _with_ts(spark.createDataFrame(_EVENTS, _SCHEMA))
    views, clicks = split_view_click(ev)
    return interval_join_view_click(views, clicks)


def test_stream_interval_join_matches_batch(spark, tmp_path):
    in_dir = _write_chunks(tmp_path, [_EVENTS[:5], _EVENTS[5:]])
    stream = _with_ts(
        spark.readStream.schema(_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).json(in_dir)
    )
    views, clicks = split_view_click(stream)
    joined = interval_join_view_click(views, clicks)
    got = run_stream_to_memory(joined, output_mode="append")
    expected = sorted(tuple(r) for r in _batch_result(spark).collect())
    assert sorted(tuple(r) for r in got.collect()) == expected
    # the fixture exercises every edge: some matches must exist and
    # the no-view / outside-window clicks must not appear
    click_ids = {r["click_id"] for r in got.collect()}
    assert 3 in click_ids and 4 in click_ids and 6 in click_ids
    assert 5 not in click_ids and 9 not in click_ids
    assert 8 in click_ids  # inclusive 6 h lower bound


def test_stream_interval_join_matches_across_batches(spark, tmp_path):
    """View arrives in batch 1, its click in batch 2 — the match can
    only come from the join's state store."""
    in_dir = _write_chunks(
        tmp_path, [[(1, 9, "view", 1000)], [(2, 9, "click", 1500)]]
    )
    stream = _with_ts(
        spark.readStream.schema(_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).json(in_dir)
    )
    views, clicks = split_view_click(stream)
    got = run_stream_to_memory(
        interval_join_view_click(views, clicks), output_mode="append"
    )
    rows = got.collect()
    assert len(rows) == 1
    assert (rows[0]["click_id"], rows[0]["view_id"]) == (2, 1)


# --- streaming session windows ----------------------------------------------


def test_stream_session_window_matches_batch(spark, tmp_path):
    """Native session_window under readStream (append mode, watermark)
    emits exactly the batch sessionization once the watermark passes —
    same merge semantics, engine-managed state."""
    events = [
        (1, 1, "view", 1000),
        (2, 1, "view", 1500),  # merges: gap < 30 min
        (3, 2, "view", 1000),
        # --- batch boundary ---
        (4, 1, "view", 10000),  # new session for user 1
        (5, 2, "view", 2000),  # extends user 2's session
        # watermark pusher: far-future event closes all above
        (6, 99, "view", 10_000_000),
    ]
    in_dir = _write_chunks(tmp_path, [events[:3], events[3:]])
    stream = _with_ts(
        spark.readStream.schema(_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).json(in_dir)
    )

    def sessions(df):
        agg = df.withWatermark("ts", "0 seconds").groupBy(
            "user_id", F.session_window("ts", SESSION_GAP).alias("w")
        ).agg(F.count(F.lit(1)).alias("n_events"))
        return agg.select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            F.unix_timestamp("w.end").alias("session_end"),
            "n_events",
        )

    got = run_stream_to_memory(sessions(stream), output_mode="append")
    batch = _with_ts(spark.createDataFrame(events, _SCHEMA))
    expected = sessions(batch)
    exp_rows = sorted(
        tuple(r) for r in expected.collect() if r["user_id"] != 99
    )
    got_rows = sorted(tuple(r) for r in got.collect() if r["user_id"] != 99)
    assert got_rows == exp_rows
    # the split-across-batches session for user 2 must have merged
    assert (2, 1000, 2000 + 1800, 2) in got_rows


def test_stream_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer: a click with no view in its window must surface
    with null view columns once the views watermark passes; matched
    clicks must not duplicate."""
    events = [
        (1, 1, "view", 1000),
        (2, 1, "click", 1500),   # matched
        (3, 2, "click", 2000),   # user 2 has no view -> null row
        # watermark pusher on BOTH sides so outer results finalize
        (4, 50, "view", 10_000_000),
        (5, 50, "click", 10_000_000),
    ]
    in_dir = _write_chunks(tmp_path, [events[:3], events[3:]])
    stream = _with_ts(
        spark.readStream.schema(_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).json(in_dir)
    )
    views, clicks = split_view_click(stream)
    got = run_stream_to_memory(
        interval_join_view_click(views, clicks, how="left_outer"),
        output_mode="append",
    )
    rows = {r["click_id"]: r for r in got.collect() if r["user_id"] != 50}
    assert set(rows) == {2, 3}
    assert rows[2]["view_id"] == 1
    assert rows[3]["view_id"] is None and rows[3]["view_us"] is None
    # batch twin agrees (left-outer is deterministic in batch)
    batch_ev = _with_ts(spark.createDataFrame(events, _SCHEMA))
    bviews, bclicks = split_view_click(batch_ev)
    brows = {
        r["click_id"]: r
        for r in interval_join_view_click(
            bviews, bclicks, how="left_outer"
        ).collect()
        if r["user_id"] != 50
    }
    assert {k: (v["view_id"], v["view_us"]) for k, v in rows.items()} == {
        k: (v["view_id"], v["view_us"]) for k, v in brows.items()
    }


def test_interval_join_state_survives_restart(spark, tmp_path):
    """T6 for the stream-stream join: a view ingested before a full
    stop must still match a click that arrives after restart — the
    join state lives in the checkpointed state store, and the file
    sink output across both runs is exactly the batch twin (no dupes,
    no loss)."""
    import time

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_file(name, rows):
        with open(in_dir / name, "w") as f:
            for eid, uid, etype, t in rows:
                f.write(
                    f'{{"event_id": {eid}, "user_id": {uid}, '
                    f'"event_type": "{etype}", "time": {t}}}\n'
                )
        time.sleep(1.1)

    def start_query():
        stream = _with_ts(
            spark.readStream.schema(_SCHEMA).option(
                "maxFilesPerTrigger", "1"
            ).json(str(in_dir))
        )
        views, clicks = split_view_click(stream)
        joined = interval_join_view_click(views, clicks)
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: a view and one matched click
    write_file("a.json", [(1, 7, "view", 1000), (2, 7, "click", 1200)])
    start_query()
    # full stop; new data arrives while the engine is down
    write_file("b.json", [(3, 7, "click", 1500), (4, 8, "click", 1600)])
    # run 2: fresh query object, same checkpoint — state must carry
    start_query()

    got = sorted(
        (r["click_id"], r["view_id"])
        for r in spark.read.parquet(out).collect()
    )
    # click 2 matched in run 1; click 3 matched AFTER restart against
    # the view ingested BEFORE the stop; click 4 has no view
    assert got == [(2, 1), (3, 1)]
