"""Streaming touch attribution (streaming/attribution.py): per-purchase
lookback touch counts must match the batch RANGE-frame computation
(plans/timeseries_queries.attribution_daily_revenue's core), including
lookback expiry, same-instant exclusion, and cross-batch state carry."""

from __future__ import annotations

import json
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from in_stream_processing_course_spark.plans.timeseries_queries import (
    _ATTR_LOOKBACK_US,
)
from in_stream_processing_course_spark.streaming.attribution import (
    stream_attribution,
)
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_to_memory,
)

_WEEK = 7 * 86400
# (event_id, user_id, event_type, epoch_sec, value) — time-ordered.
# user 1: two purchases with 1 then 2 touches in lookback; user 2: a
# touch that EXPIRES before the purchase (8 days earlier); user 3: a
# view at the purchase's own timestamp (must not count).
_EVENTS = [
    (1, 1, "view", 10, 0.0),
    (2, 2, "click", 20, 0.0),
    (3, 1, "purchase", 30, 50.0),
    (4, 1, "click", 40, 0.0),
    (5, 3, "view", 60, 0.0),
    (6, 3, "purchase", 60, 25.0),
    (7, 1, "purchase", 70, 10.0),
    (8, 2, "purchase", 20 + _WEEK + 86400, 40.0),
]
_SCHEMA = "event_id long, user_id long, event_type string, time long, value double"


def _write_chunks(tmp_path, chunks):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    keys = ("event_id", "user_id", "event_type", "time", "value")
    for i, chunk in enumerate(chunks):
        with open(in_dir / f"c{i}.json", "w") as f:
            for row in chunk:
                f.write(json.dumps(dict(zip(keys, row))) + "\n")
        time.sleep(1.1)  # file-source orders micro-batches by mtime
    return str(in_dir)


def _batch_expected(spark):
    """The batch query's own frame: touches in [-7d, -1 us] per user."""
    ev = spark.createDataFrame(_EVENTS, _SCHEMA).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (F.col("time") * 1_000_000).alias("t"),
    )
    tagged = ev.withColumn(
        "is_touch",
        F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0),
    )
    look = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-_ATTR_LOOKBACK_US, -1)
    )
    return (
        tagged.withColumn(
            "n_touches", F.coalesce(F.sum("is_touch").over(look), F.lit(0))
        )
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("purchase_us"),
            F.col("n_touches").cast("long"),
            "value",
        )
    )


def test_stream_attribution_matches_batch(spark, tmp_path):
    ordered = sorted(_EVENTS, key=lambda e: (e[3], e[0]))
    chunks = [ordered[:4], ordered[4:6], ordered[6:]]
    in_dir = _write_chunks(tmp_path, chunks)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
        .withColumn("ts", F.timestamp_seconds("time"))
    )
    out = run_stream_to_memory(
        stream_attribution(stream),
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {tuple(r) for r in out.collect()}
    expected = {tuple(r) for r in _batch_expected(spark).collect()}
    assert got == expected and len(got) == 4

    by_id = {r[0]: r for r in got}
    assert by_id[3][3] == 1  # view@10 counts for purchase@30
    # cross-batch: touches from batches 1-2 count for the batch-3 purchase
    assert by_id[7][3] == 2
    # same-instant view does not count (exclusive upper bound)
    assert by_id[6][3] == 0
    # 8-day-old touch expired from the lookback
    assert by_id[8][3] == 0
