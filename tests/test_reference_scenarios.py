"""Port of the reference's 6 test scenarios (SURVEY §5.1:
StructuredBotDetectionTest / DStreamBotDetectionTest) plus the
threshold-boundary cases the reference lacks (§5.2.4).

Scenario data spans <40 s from epoch 0 so every sliding window that
contains any event contains ALL events (the reference's tests get the
same all-in-one-window property accidentally via its ms/sec bug —
SURVEY §1.4.1; we get it on purpose).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from in_stream_processing_course_spark.schemas import ACTION_SCHEMA
from in_stream_processing_course_spark.sources import generator as gen
from in_stream_processing_course_spark.streaming.pipeline import windowed_bot_stream

INTERVAL = 30  # all events inside one 40-s slide boundary


def interleaved_clicks_to_views(ip, n, ratio, base_time=0, interval=INTERVAL):
    """clicks:views = ratio:1 interleaved so every contiguous slice
    has locally bounded ratio (avoids partial-window artifacts)."""
    times = [base_time + (interval * i) // n for i in range(n)]
    return [
        gen.Action(t, "1000", ip, "view" if i % (ratio + 1) == 0 else "click")
        for i, t in enumerate(times)
    ]


def run_scenario(spark, actions):
    rows = [(a.time, a.category_id, a.ip, a.action) for a in actions]
    df = spark.createDataFrame(rows, ACTION_SCHEMA)
    bots = windowed_bot_stream(df)
    return {
        (r["bot_ip"], r["reason"])
        for r in bots.select("bot_ip", "reason").distinct().collect()
    }


def test_requests_burst(spark):
    """>1000 requests / 10 min -> 'requests'
    (StructuredBotDetectionTest.scala:7-21)."""
    actions = gen.requests_burst("bot", 1001, interval=INTERVAL) + gen.requests_burst(
        "hum", 999, interval=INTERVAL
    )
    assert run_scenario(spark, actions) == {("bot", "requests")}


def test_category_hopper(spark):
    """>5 distinct categories -> 'categories'
    (StructuredBotDetectionTest.scala:23-37)."""
    actions = gen.category_hopper("bot", 200, 6, interval=INTERVAL) + gen.category_hopper(
        "hum", 200, 4, interval=INTERVAL
    )
    assert run_scenario(spark, actions) == {("bot", "categories")}


def test_click_spammer(spark):
    """integer-division clicks/views > 5 -> 'clicks/views'
    (StructuredBotDetectionTest.scala:39-53)."""
    actions = interleaved_clicks_to_views("bot", 210, 6) + interleaved_clicks_to_views(
        "hum", 200, 4
    )
    assert run_scenario(spark, actions) == {("bot", "clicks/views")}


def test_thresholds_exact_are_clear(spark):
    """Boundary semantics: exactly-at-threshold is NOT a bot
    (Common.scala:29-39 uses strict >)."""
    actions = (
        # exactly 1000 requests
        gen.requests_burst("r1000", 1000, interval=INTERVAL)
        # exactly 5 categories
        + gen.category_hopper("c5", 200, 5, interval=INTERVAL)
        # floor-division edge: clicks = 6*views - 1 -> ratio 5, clear
        + [
            gen.Action((INTERVAL * i) // 210, "1000", "edge", a)
            for i, a in enumerate(["view"] * 30 + ["click"] * 179)
        ]
    )
    assert run_scenario(spark, actions) == set()


def test_reason_precedence(spark):
    """requests > categories > clicks/views (Common.scala:43-46):
    a key tripping all three reports 'requests'."""
    actions = [
        gen.Action(i // 40, f"cat{i % 10}", "multi", "click") for i in range(1100)
    ]
    assert run_scenario(spark, actions) == {("multi", "requests")}


def test_botgen_statistical_workload(spark):
    """FIXTURES §3: the botgen population profile — every 172.20.* ip
    flagged (20-category spread), deterministic under seed 42."""
    actions = gen.botgen_workload(
        n_bots=3, n_users=20, user_freq=5, duration_sec=120, seed=42
    )
    flagged = run_scenario(spark, actions)
    bot_ips = {ip for ip, _ in flagged}
    assert {"172.20.0.0", "172.20.0.1", "172.20.0.2"} <= bot_ips


def test_malformed_and_empty_keys_dropped(spark):
    """P2/P3 — malformed records and null/empty ips are silently
    dropped (ImplStructured.scala:109-110; ImplDStreams.scala:63)."""
    rows = [
        (10, "1000", "good", "click"),
        (10, "1000", None, "click"),  # null key
        (10, "1000", "", "view"),  # empty key
        (None, None, "noaction", None),  # undecodable
    ]
    df = spark.createDataFrame(rows, ACTION_SCHEMA)
    from in_stream_processing_course_spark.streaming.pipeline import (
        actions_to_log_records,
    )

    out = actions_to_log_records(df)
    ips = [r["ip"] for r in out.select("ip").collect()]
    assert ips == ["good"]
