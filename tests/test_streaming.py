"""Streaming integration tests: file-stream source (S3 analog),
batch<->stream equivalence (§5.2.3), the stateful history operator
across micro-batches (T3), dedup-within-watermark (T4), and the keyed
upsert sink's TTL / ifNotExists semantics (K1/K2).
"""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from in_stream_processing_course_spark.sinks.upsert import KeyedUpsertSink
from in_stream_processing_course_spark.sources import generator as gen
from in_stream_processing_course_spark.sources.stream import read_action_stream
from in_stream_processing_course_spark.streaming.pipeline import (
    actions_to_log_records,
    stateful_bot_stream,
    windowed_bot_stream,
)
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_foreach_batch,
    run_stream_to_memory,
)


def write_actions(tmp_path: pathlib.Path, name: str, actions) -> str:
    gen.write_json_lines(actions, str(tmp_path / "in" / name))
    return str(tmp_path / "in")


def test_stream_batch_equivalence(spark, tmp_path):
    """Same transform, same data: file-stream (complete mode) ==
    batch result. The reference's entry-point-3 design property."""
    actions = gen.category_hopper("bot", 120, 8, interval=30) + gen.requests_burst(
        "hum", 80, interval=30
    )
    in_dir = write_actions(tmp_path, "a.json", actions)

    from in_stream_processing_course_spark.operators.aggregations import (
        ip_window_stats,
    )

    def transform(df):
        lr = actions_to_log_records(df)
        stats = ip_window_stats(lr, "10 minutes", "40 seconds")
        return stats.select(
            "ip",
            F.unix_timestamp("window.start").alias("ws"),
            "clicks",
            "views",
            F.array_join(F.array_sort("categories"), ",").alias("cats"),
        )

    stream_out = run_stream_to_memory(
        transform(read_action_stream(spark, in_dir)),
        output_mode="complete",
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    rows_stream = {tuple(r) for r in stream_out.collect()}

    from in_stream_processing_course_spark.schemas import ACTION_SCHEMA

    batch_df = spark.createDataFrame(
        [(a.time, a.category_id, a.ip, a.action) for a in actions], ACTION_SCHEMA
    )
    rows_batch = {tuple(r) for r in transform(batch_df).collect()}
    assert rows_stream == rows_batch and len(rows_batch) > 0


def test_session_window_stream_batch_equivalence(spark, tmp_path):
    """T2 session windows under streaming: gap-based session_window agg
    on a file stream (complete mode) matches the batch run of the same
    transform — sessions are the one window type whose bounds depend on
    the DATA, so this pins the merge behavior across micro-batches."""
    actions = (
        gen.requests_burst("u1", 5, interval=10)       # one tight session
        + gen.requests_burst("u1", 5, base_time=4000, interval=10)
        + gen.requests_burst("u2", 3, interval=400)    # gaps split sessions
    )
    in_dir = write_actions(tmp_path, "s.json", actions)

    def transform(df):
        lr = actions_to_log_records(df)
        return (
            lr.groupBy("ip", F.session_window("time", "5 minutes").alias("w"))
            .agg(
                F.sum("clicks").alias("clicks"),
                F.sum("views").alias("views"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                "ip",
                F.unix_timestamp("w.start").alias("ws"),
                F.unix_timestamp("w.end").alias("we"),
                "clicks",
                "views",
                "n_events",
            )
        )

    stream_out = run_stream_to_memory(
        transform(read_action_stream(spark, in_dir)),
        output_mode="complete",
        checkpoint_dir=str(tmp_path / "ckpt_sw"),
    )
    rows_stream = {tuple(r) for r in stream_out.collect()}

    from in_stream_processing_course_spark.schemas import ACTION_SCHEMA

    batch_df = spark.createDataFrame(
        [(a.time, a.category_id, a.ip, a.action) for a in actions], ACTION_SCHEMA
    )
    rows_batch = {tuple(r) for r in transform(batch_df).collect()}
    assert rows_stream == rows_batch and len(rows_batch) >= 3
    # u1's two bursts are >5 min apart: they must be separate sessions
    assert sum(1 for r in rows_batch if r[0] == "u1") == 2


def test_streaming_bot_detection_flags_bot(spark, tmp_path):
    """End-to-end structured path on a stream: bot flagged, human not
    (ImplStructured.scala pipeline shape)."""
    actions = gen.category_hopper("bot", 120, 8, interval=30) + gen.category_hopper(
        "hum", 120, 3, interval=30
    )
    in_dir = write_actions(tmp_path, "a.json", actions)
    out = run_stream_to_memory(
        windowed_bot_stream(read_action_stream(spark, in_dir)),
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    verdicts = {(r["bot_ip"], r["reason"]) for r in out.collect()}
    assert verdicts == {("bot", "categories")}


def test_stateful_history_accumulates_across_batches(spark, tmp_path):
    """T3: per-key history merges across micro-batches — the key is
    clear after batch 1 alone and becomes a bot only because batch 2
    raises the MERGED category count past the limit."""
    # batch 1: 4 categories; batch 2: 4 different categories (8 total)
    b1 = gen.category_hopper("ip1", 40, 4, base_time=0, interval=20)
    b2 = [
        gen.Action(a.time + 60, f"cat{int(a.category_id[3:]) + 4}", a.ip, a.action)
        for a in gen.category_hopper("ip1", 40, 4, base_time=0, interval=20)
    ]
    in_dir = write_actions(tmp_path, "b1.json", b1)
    write_actions(tmp_path, "b2.json", b2)

    out = run_stream_to_memory(
        stateful_bot_stream(
            read_action_stream(spark, in_dir, max_files_per_trigger=1)
        ),
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = out.orderBy("categories_count").collect()
    # one emission per micro-batch; merged history crosses the limit
    counts = [r["categories_count"] for r in rows]
    verdicts = [(r["is_bot"], r["reason"]) for r in rows]
    assert counts == [4, 8]
    assert verdicts == [(False, "clear"), (True, "categories")]


def test_stateful_prereduce_matches_raw_path(spark, tmp_path):
    """The map-side combiner (prereduce_log_records) must be invisible
    in results: identical verdict rows for the same multi-batch drip
    with and without it."""
    from in_stream_processing_course_spark.streaming.state import (
        keyed_history_verdicts,
    )

    b1 = gen.category_hopper("ip1", 40, 4, base_time=0, interval=20) + (
        gen.requests_burst("hot", 120, interval=4)
    )
    b2 = [
        gen.Action(a.time + 60, f"cat{int(a.category_id[3:]) + 4}", a.ip, a.action)
        for a in gen.category_hopper("ip1", 40, 4, base_time=0, interval=20)
    ]
    in_dir = write_actions(tmp_path, "b1.json", b1)
    write_actions(tmp_path, "b2.json", b2)

    def run(prereduce, ckpt):
        lr = actions_to_log_records(
            read_action_stream(spark, in_dir, max_files_per_trigger=1)
        )
        out = run_stream_to_memory(
            keyed_history_verdicts(lr, prereduce=prereduce),
            output_mode="update",
            checkpoint_dir=str(tmp_path / ckpt),
        )
        return sorted(tuple(r) for r in out.collect())

    assert run(True, "ckpt_pre") == run(False, "ckpt_raw")


def test_dedup_within_watermark_stream(spark, tmp_path):
    """T4 — the structured impl's dropDuplicates quirk (SURVEY §1.4.5)
    done right: watermark-bounded streaming dedup."""
    a = gen.Action(100, "1000", "dup", "click")
    actions = [a, a, a, gen.Action(101, "1000", "other", "view")]
    in_dir = write_actions(tmp_path, "a.json", actions)
    lr = actions_to_log_records(read_action_stream(spark, in_dir))
    deduped = lr.withWatermark("time", "10 minutes").dropDuplicatesWithinWatermark(
        ["ip", "time"]
    )
    out = run_stream_to_memory(
        deduped, output_mode="append", checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert sorted(r["ip"] for r in out.collect()) == ["dup", "other"]


# --- keyed upsert sink semantics (K1/K2) ------------------------------------


def _verdicts_df(spark, rows):
    return spark.createDataFrame(rows, "bot_ip string, reason string")


def test_upsert_sink_if_not_exists_and_ttl(spark, tmp_path):
    clock = {"now": 1000.0}
    sink = KeyedUpsertSink(
        str(tmp_path / "bots"),
        ["bot_ip"],
        ttl_sec=600,
        if_not_exists=True,
        now_fn=lambda: clock["now"],
    )
    # batch 0: first verdict wins
    sink(_verdicts_df(spark, [("1.2.3.4", "requests")]), 0)
    # batch 1: same key, different reason -> ignored (ifNotExists)
    clock["now"] = 1100.0
    sink(_verdicts_df(spark, [("1.2.3.4", "categories"), ("5.6.7.8", "clicks/views")]), 1)
    table = {
        (r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()
    }
    assert table == {("1.2.3.4", "requests"), ("5.6.7.8", "clicks/views")}
    # TTL expiry: advance past 600 s for the first key only
    clock["now"] = 1650.0  # 1.2.3.4 written at t=1000 -> expired
    sink(_verdicts_df(spark, [("9.9.9.9", "requests")]), 2)
    table = {(r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()}
    assert table == {("5.6.7.8", "clicks/views"), ("9.9.9.9", "requests")}


def test_upsert_sink_last_writer_wins(spark, tmp_path):
    sink = KeyedUpsertSink(str(tmp_path / "bots2"), ["bot_ip"], if_not_exists=False)
    sink(_verdicts_df(spark, [("k", "requests")]), 0)
    sink(_verdicts_df(spark, [("k", "categories")]), 1)
    table = {(r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()}
    assert table == {("k", "categories")}


def test_upsert_sink_corrupt_table_fails_loudly(spark, tmp_path):
    """Only PATH_NOT_FOUND maps to "empty table"; a corrupt existing
    table must raise so the micro-batch retries from the checkpoint
    instead of silently overwriting the table with just the incoming
    batch (the data-loss failure mode)."""
    path = tmp_path / "bots_corrupt"
    path.mkdir()
    (path / "part-00000.parquet").write_bytes(b"this is not parquet")
    sink = KeyedUpsertSink(str(path), ["bot_ip"])
    with pytest.raises(Exception):
        sink(_verdicts_df(spark, [("k", "requests")]), 0)
    # the corrupt table was left untouched — no silent overwrite
    assert (path / "part-00000.parquet").read_bytes() == b"this is not parquet"


def test_upsert_sink_large_batch_distributed(spark, tmp_path):
    """The MERGE path must scale with executors, not driver heap: a
    120k-key batch goes through the staged-write + rename-swap path
    (no collect(), no coalesce(1) — VERDICT r2 item 1). Asserts the
    merge semantics at volume and that the staged write really was
    distributed (more than one parquet part file)."""
    import os

    path = str(tmp_path / "bots_large")
    sink = KeyedUpsertSink(path, ["bot_ip"], if_not_exists=False)
    n = 120_000
    batch0 = spark.range(n).selectExpr(
        "concat('ip-', id) AS bot_ip", "'requests' AS reason"
    )
    sink(batch0, 0)
    # second batch rewrites reasons for the even half and adds 10k new keys
    batch1 = spark.range(0, n + 20_000, 2).selectExpr(
        "concat('ip-', id) AS bot_ip", "'categories' AS reason"
    )
    sink(batch1, 1)
    table = sink.read(spark)
    assert table.count() == n + 10_000
    by_reason = {
        r["reason"]: r["cnt"]
        for r in table.groupBy("reason").agg(F.count("*").alias("cnt")).collect()
    }
    # evens (60k old + 10k new) rewritten, odds (60k) untouched
    assert by_reason == {"categories": 70_000, "requests": 60_000}
    parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(parts) > 1, "staged write collapsed to one file — not distributed"


def test_streaming_sink_end_to_end(spark, tmp_path):
    """Stream -> windowed verdicts -> foreachBatch upsert: the full
    ImplStructured.run() shape with checkpointing."""
    actions = gen.category_hopper("bot", 120, 8, interval=30)
    in_dir = write_actions(tmp_path, "a.json", actions)
    sink = KeyedUpsertSink(str(tmp_path / "bots3"), ["bot_ip"], if_not_exists=True)
    verdicts = windowed_bot_stream(read_action_stream(spark, in_dir)).select(
        "bot_ip", "reason"
    )
    run_stream_foreach_batch(
        verdicts, sink, output_mode="update", checkpoint_dir=str(tmp_path / "ckpt")
    )
    table = {(r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()}
    assert table == {("bot", "categories")}


def test_watermark_drops_late_data(spark, tmp_path):
    """T1 — append mode with a 2-minute watermark: a second micro-batch
    carrying events far older than (max event time - watermark) cannot
    re-open finalized windows; the late rows are dropped."""
    from in_stream_processing_course_spark.operators.aggregations import (
        ip_window_stats,
    )

    # batch 0: t=0..30; batch 1: t=4000.. advances the watermark to
    # ~3910; batch 2: t=4100.. (spacer — Spark's LATE-DATA filter uses
    # the watermark lagged one batch behind the EVICTION watermark, so
    # the late batch must arrive two batches after the advance); batch
    # 3: late events back at t=50, far below the 2-min lateness bound.
    batches = [
        gen.category_hopper("u1", 30, 2, base_time=0, interval=30),
        gen.category_hopper("u1", 30, 2, base_time=4000, interval=30),
        gen.category_hopper("u1", 30, 2, base_time=4100, interval=30),
        gen.category_hopper("u1", 30, 2, base_time=50, interval=10),
    ]
    import time as _t

    for i, b in enumerate(batches):
        in_dir = write_actions(tmp_path, f"b{i}.json", b)
        _t.sleep(1.1)  # file source orders batches by modification time

    def transform(df):
        lr = actions_to_log_records(df)
        return ip_window_stats(
            lr, "10 minutes", None, watermark="2 minutes"
        ).select(
            "ip",
            F.unix_timestamp("window.start").alias("ws"),
            (F.col("clicks") + F.col("views")).alias("n"),
        )

    out = run_stream_to_memory(
        transform(read_action_stream(spark, in_dir, max_files_per_trigger=1)),
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = [(r["ws"], r["n"]) for r in out.collect()]
    # window [0, 600) finalized with exactly the 30 on-time events and
    # emitted exactly once; the late batch neither inflated it (no
    # (0, 60)) nor re-opened it (no second (0, *) emission)
    assert rows.count((0, 30)) == 1
    assert all(n == 30 for ws, n in rows if ws == 0)


def test_rate_source_smoke(spark):
    """S5/load path — the built-in rate source feeds the same
    windowed-aggregation transform (continuous-botgen.sh analog)."""
    from in_stream_processing_course_spark.operators.aggregations import (
        ip_window_stats,
    )
    from in_stream_processing_course_spark.sources.stream import rate_stream

    src = rate_stream(spark, rows_per_second=500)
    lr = src.select(
        (F.col("value") % 10).cast("string").alias("ip"),
        F.col("timestamp").alias("time"),
        F.lit(1).cast("long").alias("clicks"),
        F.lit(0).cast("long").alias("views"),
        (F.col("value") % 7).cast("string").alias("category"),
    )
    agg = ip_window_stats(lr, "1 minute", None).select(
        "ip", F.size("categories").alias("n_cats"), "clicks"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("complete")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 60
        rows = []
        while _t.time() < deadline:
            _t.sleep(2)
            rows = spark.table("rate_smoke").collect()
            if rows:
                break
    finally:
        q.stop()
    assert rows, "rate source produced no aggregated rows within 60s"


def test_stream_stream_join(spark, tmp_path):
    """Stream-stream inner join with watermarks — a capability the
    reference lacks entirely (its two streams never join, SURVEY §2.7)
    but any Spark-first engine should expose: correlate each click
    with views by the same ip within the preceding 60 s."""
    clicks = [gen.Action(100 + i, "1000", "u1", "click") for i in range(3)]
    views = [gen.Action(70 + i * 20, "1000", "u1", "view") for i in range(3)]
    noise = [gen.Action(100, "1000", "u2", "view")]
    in_c = str(tmp_path / "clicks")
    in_v = str(tmp_path / "views")
    gen.write_json_lines(clicks, in_c + "/c.json")
    gen.write_json_lines(views + noise, in_v + "/v.json")

    c = actions_to_log_records(read_action_stream(spark, in_c)).select(
        F.col("ip").alias("c_ip"), F.col("time").alias("c_time")
    ).withWatermark("c_time", "10 minutes")
    v = actions_to_log_records(read_action_stream(spark, in_v)).select(
        F.col("ip").alias("v_ip"), F.col("time").alias("v_time")
    ).withWatermark("v_time", "10 minutes")
    joined = c.join(
        v,
        (F.col("c_ip") == F.col("v_ip"))
        & (F.col("v_time") >= F.col("c_time") - F.expr("INTERVAL 60 SECONDS"))
        & (F.col("v_time") <= F.col("c_time")),
        "inner",
    ).select("c_ip", F.unix_timestamp("c_time").alias("ct"), F.unix_timestamp("v_time").alias("vt"))
    out = run_stream_to_memory(
        joined, output_mode="append", checkpoint_dir=str(tmp_path / "ckpt")
    )
    pairs = {(r["ct"], r["vt"]) for r in out.collect()}
    expected = {
        (c.time, v.time)
        for c in clicks
        for v in views
        if c.time - 60 <= v.time <= c.time
    }
    assert pairs == expected and len(expected) > 0


def test_upsert_sink_empty_batch_is_noop(spark, tmp_path):
    """Streaming queries deliver empty micro-batches routinely; the
    sink must not corrupt or clear the table."""
    sink = KeyedUpsertSink(str(tmp_path / "bots4"), ["bot_ip"], if_not_exists=True)
    sink(_verdicts_df(spark, [("k1", "requests")]), 0)
    sink(_verdicts_df(spark, []), 1)  # empty batch
    table = {(r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()}
    assert table == {("k1", "requests")}


def test_raw_event_cache_and_retention(spark, tmp_path):
    """K3/K4 — raw events stream into the parquet side cache; the
    retention compaction expires aged rows (Ignite expiry analog)."""
    from in_stream_processing_course_spark.streaming.pipeline import (
        expire_raw_events,
        start_raw_event_cache,
    )

    actions = gen.requests_burst("u1", 50, interval=30)
    in_dir = write_actions(tmp_path, "a.json", actions)
    q = start_raw_event_cache(
        read_action_stream(spark, in_dir),
        path=str(tmp_path / "raw"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    cached = spark.read.parquet(str(tmp_path / "raw"))
    assert cached.count() == 50
    assert set(cached.columns) == {
        "ip", "time", "clicks", "views", "category", "ingested_at",
    }
    # rows were just ingested: a 1-hour retention keeps all ...
    assert expire_raw_events(spark, str(tmp_path / "raw"), 3600) == 50
    # compaction rewrites the sink as a plain parquet dir (no stale
    # _spark_metadata listing deleted files) and never loses live rows
    assert not (tmp_path / "raw" / "_spark_metadata").exists()
    assert spark.read.parquet(str(tmp_path / "raw")).count() == 50
    # ... and a zero-second retention expires everything
    assert expire_raw_events(spark, str(tmp_path / "raw"), 0) == 0


def test_expire_refuses_while_stream_active(spark, tmp_path):
    """Compacting under a live FileStreamSink would corrupt its
    _spark_metadata log; expire_raw_events must refuse instead."""
    import pytest

    from in_stream_processing_course_spark.streaming.pipeline import (
        expire_raw_events,
        start_raw_event_cache,
    )

    actions = gen.requests_burst("u2", 10, interval=30)
    in_dir = write_actions(tmp_path, "b.json", actions)
    q = start_raw_event_cache(
        read_action_stream(spark, in_dir),
        path=str(tmp_path / "raw2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
        trigger_seconds="1 seconds",
    )
    try:
        q.processAllAvailable()
        with pytest.raises(RuntimeError, match="actively writing"):
            expire_raw_events(spark, str(tmp_path / "raw2"), 3600)
    finally:
        q.stop()


def test_stream_static_dimension_join(spark, tmp_path):
    """Stream-static join — enriching a stream with a batch dimension
    table (the most common production join): the static side is
    re-resolved per micro-batch, needs no watermark, and broadcasts
    when small. Complements the watermarked stream-stream join test."""
    actions = [
        gen.Action(10, "1000", "ip1", "click"),
        gen.Action(11, "2000", "ip1", "view"),
        gen.Action(12, "9999", "ip2", "click"),  # no dim row -> left null
    ]
    in_dir = write_actions(tmp_path, "a.json", actions)
    dim = spark.createDataFrame(
        [("1000", "electronics"), ("2000", "books")],
        "category string, category_name string",
    )
    lr = actions_to_log_records(read_action_stream(spark, in_dir))
    enriched = lr.join(F.broadcast(dim), "category", "left").select(
        "ip", "category", "category_name"
    )
    out = run_stream_to_memory(
        enriched,
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = {(r.ip, r.category): r.category_name for r in out.collect()}
    assert rows == {
        ("ip1", "1000"): "electronics",
        ("ip1", "2000"): "books",
        ("ip2", "9999"): None,
    }


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """Stream-stream LEFT OUTER join with watermarks: clicks with no
    view in the preceding 60 s surface with null view time — but only
    after the watermark passes their join window (Spark holds outer
    results until state can be finalized). A later batch on BOTH
    streams advances the global watermark to flush them."""
    import os
    import time as _time

    clicks = [gen.Action(100, "1000", "u1", "click"),
              gen.Action(100, "1000", "lonely", "click")]
    views = [gen.Action(80, "1000", "u1", "view")]
    late_c = [gen.Action(10_000, "1000", "u1", "click")]
    late_v = [gen.Action(10_000, "1000", "u1", "view")]
    in_c = str(tmp_path / "clicks")
    in_v = str(tmp_path / "views")
    now = _time.time()
    for path, early, late in (
        (in_c, clicks, late_c),
        (in_v, views, late_v),
    ):
        gen.write_json_lines(early, path + "/f0.json")
        gen.write_json_lines(late, path + "/f1.json")
        os.utime(path + "/f0.json", (now - 60, now - 60))
        os.utime(path + "/f1.json", (now - 30, now - 30))

    c = actions_to_log_records(
        read_action_stream(spark, in_c, max_files_per_trigger=1)
    ).select(
        F.col("ip").alias("c_ip"), F.col("time").alias("c_time")
    ).withWatermark("c_time", "10 seconds")
    v = actions_to_log_records(
        read_action_stream(spark, in_v, max_files_per_trigger=1)
    ).select(
        F.col("ip").alias("v_ip"), F.col("time").alias("v_time")
    ).withWatermark("v_time", "10 seconds")
    joined = c.join(
        v,
        (F.col("c_ip") == F.col("v_ip"))
        & (F.col("v_time") >= F.col("c_time") - F.expr("INTERVAL 60 SECONDS"))
        & (F.col("v_time") <= F.col("c_time")),
        "left_outer",
    ).select(
        "c_ip",
        F.unix_timestamp("c_time").alias("ct"),
        F.unix_timestamp("v_time").alias("vt"),
    )
    out = run_stream_to_memory(
        joined, output_mode="append", checkpoint_dir=str(tmp_path / "ckpt")
    )
    rows = {(r["c_ip"], r["ct"], r["vt"]) for r in out.collect()}
    assert ("u1", 100, 80) in rows  # matched pair
    assert ("lonely", 100, None) in rows  # outer row flushed by watermark


def test_stateful_history_on_rocksdb_provider(spark, tmp_path):
    """CLUSTER_SCALE_CONF recommends the RocksDB state store for the
    100 TB state path — prove the applyInPandasWithState operator
    actually runs on it (protobuf only gates transformWithState, not
    this API). Same multi-batch accumulation scenario as the default-
    provider test."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        b1 = gen.category_hopper("ip1", 40, 4, base_time=0, interval=20)
        b2 = [
            gen.Action(a.time + 60, f"cat{int(a.category_id[3:]) + 4}", a.ip, a.action)
            for a in gen.category_hopper("ip1", 40, 4, base_time=0, interval=20)
        ]
        in_dir = write_actions(tmp_path, "b1.json", b1)
        write_actions(tmp_path, "b2.json", b2)
        out = run_stream_to_memory(
            stateful_bot_stream(
                read_action_stream(spark, in_dir, max_files_per_trigger=1)
            ),
            output_mode="update",
            checkpoint_dir=str(tmp_path / "ckpt_rocks"),
        )
        rows = out.orderBy("categories_count").collect()
        assert [r["categories_count"] for r in rows] == [4, 8]
        assert [(r["is_bot"], r["reason"]) for r in rows] == [
            (False, "clear"),
            (True, "categories"),
        ]
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


def _partition_fingerprints(path: str) -> dict[str, dict[str, bytes]]:
    """Per kpart directory: {filename: raw bytes} of every data file."""
    import os

    out: dict[str, dict[str, bytes]] = {}
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if not (d.startswith("kpart=") and os.path.isdir(full)):
            continue
        out[d] = {
            f: open(os.path.join(full, f), "rb").read()
            for f in sorted(os.listdir(full))
        }
    return out


def test_upsert_sink_partitioned_rewrite_touches_only_batch_partitions(
    spark, tmp_path
):
    """n_partitions mode (VERDICT r3 item 7): per-trigger I/O is bounded
    to the hash partitions the batch's keys land in. Batch 1 touches a
    strict subset of the 8 partitions; every untouched kpart directory
    must be byte-identical afterwards, while merge semantics
    (last-writer-wins at volume) are unchanged from the whole-table
    path."""
    path = str(tmp_path / "bots_part")
    sink = KeyedUpsertSink(path, ["bot_ip"], if_not_exists=False, n_partitions=8)
    n = 20_000
    sink(
        spark.range(n).selectExpr(
            "concat('ip-', id) AS bot_ip", "'requests' AS reason"
        ),
        0,
    )
    before = _partition_fingerprints(path)
    assert len(before) == 8  # 20k keys fill all 8 hash partitions

    # batch 1: rewrite 4 existing keys + add 1 new one (few enough
    # keys that some of the 8 hash partitions must go untouched)
    batch1 = spark.range(0, 4).selectExpr(
        "concat('ip-', id) AS bot_ip", "'categories' AS reason"
    ).unionAll(
        spark.range(n, n + 1).selectExpr(
            "concat('ip-', id) AS bot_ip", "'categories' AS reason"
        )
    )
    from pyspark.sql import functions as SF

    touched = {
        f"kpart={r[0]}"
        for r in batch1.select(
            SF.pmod(SF.xxhash64("bot_ip"), SF.lit(8)).cast("int")
        ).distinct().collect()
    }
    assert 0 < len(touched) < 8, "test premise: batch must touch a subset"
    sink(batch1, 1)
    after = _partition_fingerprints(path)

    for d in set(before) - touched:
        assert after[d] == before[d], f"untouched partition {d} was rewritten"
    for d in touched:
        assert after[d] != before[d], f"touched partition {d} unchanged"

    table = sink.read(spark)
    assert table.count() == n + 1
    by_reason = {
        r["reason"]: r["cnt"]
        for r in table.groupBy("reason").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_reason == {"categories": 5, "requests": n - 4}
    assert "kpart" not in table.columns


def test_upsert_sink_partitioned_ttl_and_if_not_exists(spark, tmp_path):
    """The partitioned layout preserves ifNotExists + TTL semantics:
    first writer wins while the row is live; expiry is visible on read
    even for partitions the expiring batch never touched."""
    clock = {"now": 1000.0}
    sink = KeyedUpsertSink(
        str(tmp_path / "bots_part_ttl"),
        ["bot_ip"],
        ttl_sec=600,
        if_not_exists=True,
        now_fn=lambda: clock["now"],
        n_partitions=4,
    )
    sink(_verdicts_df(spark, [("1.2.3.4", "requests")]), 0)
    clock["now"] = 1100.0
    sink(
        _verdicts_df(
            spark, [("1.2.3.4", "categories"), ("5.6.7.8", "clicks/views")]
        ),
        1,
    )
    table = {(r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()}
    assert table == {("1.2.3.4", "requests"), ("5.6.7.8", "clicks/views")}
    clock["now"] = 1650.0  # 1.2.3.4 (t=1000) expired; 5.6.7.8 (t=1100) live
    table = {(r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()}
    assert table == {("5.6.7.8", "clicks/views")}


def test_streaming_partitioned_sink_end_to_end(spark, tmp_path):
    """start_bot_detection(sink_partitions=4): the full structured
    pipeline writing through the hash-partitioned sink layout — the
    kpart=<k> directories appear on disk and reads are identical to
    the whole-table path."""
    import os

    from in_stream_processing_course_spark.streaming.pipeline import (
        start_bot_detection,
    )

    actions = gen.category_hopper("bot", 120, 8, interval=30)
    in_dir = write_actions(tmp_path, "a.json", actions)
    sink_path = str(tmp_path / "bots_p")
    q = start_bot_detection(
        read_action_stream(spark, in_dir),
        sink_path,
        str(tmp_path / "ckpt"),
        mode="structured",
        available_now=True,
        sink_partitions=4,
    )
    q.awaitTermination(120)
    table = {
        (r["bot_ip"], r["reason"])
        for r in KeyedUpsertSink(
            sink_path, ["bot_ip"], n_partitions=4
        ).read(spark).collect()
    }
    assert table == {("bot", "categories")}
    assert any(d.startswith("kpart=") for d in os.listdir(sink_path))


def test_upsert_sink_partitioned_corrupt_partition_fails_loudly(spark, tmp_path):
    """Fault isolation for the partitioned layout: a corrupt partition
    file makes the batch FAIL (checkpoint retry semantics) — and the
    failed batch must leave every live partition byte-identical, since
    all writes stage outside the table before any swap."""
    import os

    import pytest as _pytest

    path = str(tmp_path / "bots_corrupt_part")
    sink = KeyedUpsertSink(path, ["bot_ip"], n_partitions=4)
    sink(
        spark.range(200).selectExpr(
            "concat('ip-', id) AS bot_ip", "'requests' AS reason"
        ),
        0,
    )
    before = _partition_fingerprints(path)
    victim = sorted(before)[0]
    corrupt = os.path.join(path, victim, "corrupt.parquet")
    with open(corrupt, "wb") as f:
        f.write(b"this is not parquet")
    with _pytest.raises(Exception):
        sink(
            spark.range(200).selectExpr(
                "concat('ip-', id) AS bot_ip", "'categories' AS reason"
            ),
            1,
        )
    os.remove(corrupt)
    assert _partition_fingerprints(path) == before, (
        "failed batch mutated live partitions"
    )


def _table_keys(spark, path, n_partitions=None):
    return {
        (r["bot_ip"], r["reason"])
        for r in KeyedUpsertSink(path, ["bot_ip"], n_partitions=n_partitions)
        .read(spark)
        .collect()
    }


def test_upsert_sink_partitioned_swap_window_crash_recovers(
    spark, tmp_path, monkeypatch
):
    """ADVICE r4 (medium): a crash INSIDE the partition swap window —
    after live partitions are retired (phase A) but before the staged
    replacements land (phase B) — must not lose pre-existing keys.
    Inject the fault at the first phase-B install (every touched live
    partition already renamed aside), then re-run the batch as the
    checkpoint retry would: recovery restores the retired partitions
    and the MERGE converges with zero dropped keys."""
    import os
    import shutil as real_shutil

    path = str(tmp_path / "bots_swapcrash")
    sink = KeyedUpsertSink(path, ["bot_ip"], n_partitions=8)
    n = 5_000
    sink(
        spark.range(n).selectExpr(
            "concat('ip-', id) AS bot_ip", "'requests' AS reason"
        ),
        0,
    )

    batch1 = spark.range(0, 50).selectExpr(
        "concat('ip-', id) AS bot_ip", "'categories' AS reason"
    )

    import in_stream_processing_course_spark.sinks.upsert as upsert_mod

    orig_move = real_shutil.move

    def crash_on_install(src, dst, *a, **kw):
        # phase-B moves come FROM the stage dir; phase-A moves don't
        if "._stage_" in str(src):
            raise OSError("injected crash during phase B install")
        return orig_move(src, dst, *a, **kw)

    monkeypatch.setattr(upsert_mod.shutil, "move", crash_on_install)
    with pytest.raises(OSError, match="injected crash"):
        sink(batch1, 1)
    monkeypatch.setattr(upsert_mod.shutil, "move", orig_move)

    # crash state: at least one live partition is retired to _old_kpart_
    parent = os.path.dirname(path)
    base = os.path.basename(path)
    stranded = [
        d for d in os.listdir(parent) if d.startswith(f"{base}._old_kpart_")
    ]
    assert stranded, "test premise: the crash left retired partitions behind"

    # checkpoint retry re-runs the same batch; recovery must restore the
    # retired partitions first, so no pre-existing key is dropped
    sink(batch1, 1)
    table = _table_keys(spark, path, n_partitions=8)
    expected = {(f"ip-{i}", "categories") for i in range(50)} | {
        (f"ip-{i}", "requests") for i in range(50, n)
    }
    assert table == expected
    leftovers = [
        d
        for d in os.listdir(parent)
        if d.startswith((f"{base}._old_", f"{base}._stage_"))
    ]
    assert leftovers == [], f"stranded dirs not cleaned up: {leftovers}"


def test_upsert_sink_whole_table_swap_crash_recovers(spark, tmp_path):
    """Whole-table layout, same window: a crash between retiring the
    live table and installing the stage leaves only ._old_table_* on
    disk. The next batch (or read) must restore it instead of treating
    the table as empty and silently dropping every pre-existing key."""
    import shutil as real_shutil

    path = str(tmp_path / "bots_tablecrash")
    sink = KeyedUpsertSink(path, ["bot_ip"])
    sink(_verdicts_df(spark, [("1.2.3.4", "requests"), ("9.9.9.9", "requests")]), 0)

    # simulate the exact crash state the swap can leave behind
    real_shutil.move(path, f"{path}._old_table_deadbeef")

    sink(_verdicts_df(spark, [("5.6.7.8", "categories")]), 1)
    assert _table_keys(spark, path) == {
        ("1.2.3.4", "requests"),
        ("9.9.9.9", "requests"),
        ("5.6.7.8", "categories"),
    }


def test_upsert_sink_layout_guard(spark, tmp_path):
    """ADVICE r4 (low): pointing a partitioned sink at an unpartitioned
    table, an unpartitioned sink at a partitioned table, or changing
    n_partitions between runs must fail loudly with a migration hint —
    never a missing-kpart AnalysisException or silent duplicate keys."""
    flat = str(tmp_path / "flat")
    KeyedUpsertSink(flat, ["bot_ip"])(
        _verdicts_df(spark, [("1.2.3.4", "requests")]), 0
    )
    with pytest.raises(ValueError, match="unpartitioned"):
        KeyedUpsertSink(flat, ["bot_ip"], n_partitions=4)(
            _verdicts_df(spark, [("5.6.7.8", "requests")]), 1
        )

    part = str(tmp_path / "part")
    KeyedUpsertSink(part, ["bot_ip"], n_partitions=4)(
        _verdicts_df(spark, [("1.2.3.4", "requests")]), 0
    )
    # count change: read AND write both refuse
    with pytest.raises(ValueError, match="n_partitions=4"):
        KeyedUpsertSink(part, ["bot_ip"], n_partitions=8).read(spark)
    with pytest.raises(ValueError, match="n_partitions=4"):
        KeyedUpsertSink(part, ["bot_ip"], n_partitions=8)(
            _verdicts_df(spark, [("5.6.7.8", "requests")]), 1
        )
    # partitioned table + unpartitioned sink
    with pytest.raises(ValueError, match="hash-partitioned"):
        KeyedUpsertSink(part, ["bot_ip"])(
            _verdicts_df(spark, [("5.6.7.8", "requests")]), 1
        )
    # matching count still works on both sides
    KeyedUpsertSink(part, ["bot_ip"], n_partitions=4)(
        _verdicts_df(spark, [("5.6.7.8", "categories")]), 1
    )
    assert _table_keys(spark, part, n_partitions=4) == {
        ("1.2.3.4", "requests"),
        ("5.6.7.8", "categories"),
    }
    # pre-marker table (kpart dirs, no marker): the historical count
    # can't be inferred from sparse directory names, so even a
    # "plausible" count must be refused with the migration hint
    import os

    os.remove(os.path.join(part, "_kpart_layout"))
    with pytest.raises(ValueError, match="_kpart_layout"):
        KeyedUpsertSink(part, ["bot_ip"], n_partitions=4).read(spark)


def test_upsert_sink_read_is_non_mutating_in_crash_state(spark, tmp_path):
    """read() must serve the last committed state during a crashed (or
    in-flight) swap WITHOUT touching the on-disk swap state — a reader
    racing a live micro-batch that repaired directories would corrupt
    the writer's phase B (review finding round 5). Repair belongs to
    __call__ only."""
    import os
    import shutil as real_shutil

    # partitioned layout: retire one partition as a phase-A crash would
    part = str(tmp_path / "bots_read_nonmut")
    sink = KeyedUpsertSink(part, ["bot_ip"], n_partitions=4)
    sink(
        spark.range(200).selectExpr(
            "concat('ip-', id) AS bot_ip", "'requests' AS reason"
        ),
        0,
    )
    retired = f"{part}._old_kpart_2_deadbeef"
    real_shutil.move(os.path.join(part, "kpart=2"), retired)

    got = {
        (r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()
    }
    assert got == {(f"ip-{i}", "requests") for i in range(200)}
    # disk untouched: the retired copy is still retired, live still gone
    assert os.path.isdir(retired)
    assert not os.path.exists(os.path.join(part, "kpart=2"))

    # whole-table layout: same contract
    whole = str(tmp_path / "bots_read_nonmut_whole")
    wsink = KeyedUpsertSink(whole, ["bot_ip"])
    wsink(_verdicts_df(spark, [("1.2.3.4", "requests")]), 0)
    real_shutil.move(whole, f"{whole}._old_table_deadbeef")
    got = {
        (r["bot_ip"], r["reason"]) for r in wsink.read(spark).collect()
    }
    assert got == {("1.2.3.4", "requests")}
    assert os.path.isdir(f"{whole}._old_table_deadbeef")
    assert not os.path.exists(whole)


def test_upsert_sink_read_survives_every_partition_retired(spark, tmp_path):
    """ADVICE r5 (low): a crash that retires EVERY kpart partition
    leaves the table dir holding only the _kpart_layout marker, so the
    live read raises UNABLE_TO_INFER_SCHEMA instead of PATH_NOT_FOUND.
    read() must treat that as "no live data" and serve the retired
    copies — non-mutating, same as the partial-retire case."""
    import os
    import shutil as real_shutil

    part = str(tmp_path / "bots_all_retired")
    sink = KeyedUpsertSink(part, ["bot_ip"], n_partitions=4)
    sink(
        spark.range(200).selectExpr(
            "concat('ip-', id) AS bot_ip", "'requests' AS reason"
        ),
        0,
    )
    kparts = [d for d in os.listdir(part) if d.startswith("kpart=")]
    assert len(kparts) == 4, "test premise: all 4 partitions populated"
    for d in kparts:
        real_shutil.move(
            os.path.join(part, d),
            f"{part}._old_{d.replace('=', '_')}_deadbeef",
        )
    # only the marker remains inside the table dir
    assert os.listdir(part) == ["_kpart_layout"]

    got = {(r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()}
    assert got == {(f"ip-{i}", "requests") for i in range(200)}
    # disk untouched: every retired copy still retired, no live dirs
    assert os.listdir(part) == ["_kpart_layout"]
    # and the next write batch repairs + merges normally
    sink(_verdicts_df(spark, [("9.9.9.9", "categories")]), 1)
    got = {(r["bot_ip"], r["reason"]) for r in sink.read(spark).collect()}
    assert got == {(f"ip-{i}", "requests") for i in range(200)} | {
        ("9.9.9.9", "categories")
    }


def test_stateful_event_time_mode_accumulates_and_merges_late_rows(
    spark, tmp_path
):
    """r11: the v1 operator's event_time=True mode through a real
    stream — history still accumulates across micro-batches (4 -> 8
    categories -> bot), and a file carrying rows OLDER than the
    stream's max event time but inside the watermark delay still
    merges (the backfill/out-of-order contract; eviction timing is
    unit-pinned in test_state_timeout.py)."""
    from in_stream_processing_course_spark.streaming.state import (
        keyed_history_verdicts,
    )

    b1 = gen.category_hopper("ip1", 40, 4, base_time=60, interval=20)
    # 4 NEW categories, 30s EARLIER than batch 1 (late but within delay)
    b2 = [
        gen.Action(a.time - 30, f"cat{int(a.category_id[3:]) + 4}", a.ip, a.action)
        for a in gen.category_hopper("ip1", 40, 4, base_time=60, interval=20)
    ]
    in_dir = write_actions(tmp_path, "b1.json", b1)
    write_actions(tmp_path, "b2.json", b2)

    out = run_stream_to_memory(
        keyed_history_verdicts(
            actions_to_log_records(
                read_action_stream(spark, in_dir, max_files_per_trigger=1)
            ),
            event_time=True,
            watermark_delay="300 seconds",
        ),
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt_et_v1"),
    )
    rows = out.orderBy("categories_count").collect()
    counts = [r["categories_count"] for r in rows]
    verdicts = [(r["is_bot"], r["reason"]) for r in rows]
    assert counts == [4, 8]
    assert verdicts == [(False, "clear"), (True, "categories")]


def test_stateful_event_time_mode_evicts_idle_keys_live(spark, tmp_path):
    """r11: live proof that the event-time idle timer actually FIRES
    and evicts through the real applyInPandasWithState transport. The
    verdict OUTPUT can't show eviction (the trailing-window prune
    masks it), so the observable is the state store itself:
    `numRowsTotal` in the final progress. Three single-file batches —
    ip1 at t=100s, then two advancer keys at t=5000/5010s; the
    watermark (delay 10s) passes ip1's data-derived timeout
    (100+30+600 s) after batch 2, so batch 3 fires the timer and
    evicts ip1. Final state: the two advancers only."""
    import json as _json
    import time as _time

    from in_stream_processing_course_spark.streaming.runner import await_drained
    from in_stream_processing_course_spark.streaming.state import (
        keyed_history_verdicts,
    )

    in_dir = write_actions(
        tmp_path, "b1.json", gen.requests_burst("ip1", 10, base_time=100, interval=20)
    )
    write_actions(
        tmp_path, "b2.json", gen.requests_burst("adv", 10, base_time=5000, interval=20)
    )
    write_actions(
        tmp_path, "b3.json", gen.requests_burst("adv2", 10, base_time=5010, interval=20)
    )

    sdf = keyed_history_verdicts(
        actions_to_log_records(
            read_action_stream(spark, in_dir, max_files_per_trigger=1)
        ),
        event_time=True,
    )
    query = (
        sdf.writeStream.foreachBatch(lambda df, bid: df.count())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_evict"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    progress = query.lastProgress
    if isinstance(progress, str):  # pyspark returns json str in some versions
        progress = _json.loads(progress)
    state = progress["stateOperators"][0]
    # three keys were seen; ip1 was evicted by the fired event-time
    # timer, so only adv + adv2 remain in the store (numRowsRemoved
    # lands in whichever batch fired the timer, not necessarily the
    # final progress — the live-row count is the stable observable)
    assert state["numRowsTotal"] == 2, state
