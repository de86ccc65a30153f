"""Windowed / keyed aggregations (SURVEY §2.5, A1-A5).

The core analytical aggregation of the reference
(ImplStructured.scala:118-133): per key, per sliding event-time
window — sum clicks, sum views, collect the distinct category set.
Spark plans this as partial ObjectHashAggregate -> shuffle on
(key, window) -> final, i.e. the map-side-combine the reference's
``IpStat`` monoid (Common.scala:52-61) implements by hand.

Scale notes (100 TB):
- A 10-min/40-s sliding window fans every event out to 15 windows.
  ``two_level_window_stats`` implements the classic two-level rollup:
  tumbling 40-s partials first (1 row per event), then 15-way rollup of
  the *partials* — shuffle volume drops by ~the events-per-bucket
  factor. Used when slide divides window.
- When only the distinct-category COUNT is consumed, pass
  ``approx=True`` to swap collect_set for a HyperLogLog sketch
  (``approx_count_distinct``) — bounded state instead of an exact set
  (SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ip_window_stats(
    log_records: DataFrame,
    window: str = "10 minutes",
    slide: str | None = "40 seconds",
    key: str = "ip",
    ts: str = "time",
    watermark: str | None = None,
) -> DataFrame:
    """A1/A2 — keyed sliding-window aggregation
    (ImplStructured.scala:118-133; windows/slide from
    ImplStructured.scala:12-13, watermark :11).

    Output: key, window(struct), clicks, views, categories(array).
    Works identically on batch and streaming inputs; pass ``watermark``
    only for streams (batch ignores lateness anyway).
    """
    df = log_records
    if watermark is not None:
        df = df.withWatermark(ts, watermark)
    win = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    return df.groupBy(F.col(key), win.alias("window")).agg(
        F.sum("clicks").alias("clicks"),
        F.sum("views").alias("views"),
        F.collect_set("category").alias("categories"),
    )


def ip_window_counts(
    log_records: DataFrame,
    window: str = "10 minutes",
    slide: str | None = "40 seconds",
    key: str = "ip",
    ts: str = "time",
    approx: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """A2 variant — distinct-category COUNT only. ``approx=True`` uses
    HLL (bounded state at scale); exact uses collect_set+size.
    """
    win = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    distinct = (
        F.approx_count_distinct("category", rsd)
        if approx
        else F.size(F.collect_set("category"))
    )
    return log_records.groupBy(F.col(key), win.alias("window")).agg(
        F.sum("clicks").alias("clicks"),
        F.sum("views").alias("views"),
        distinct.cast("long").alias("categories_count"),
    )


def two_level_window_stats(
    log_records: DataFrame,
    window_sec: int = 600,
    slide_sec: int = 40,
    key: str = "ip",
    ts: str = "time",
) -> DataFrame:
    """A1 at scale — two-level sliding-window rollup (SURVEY §4.3).

    Level 1: tumbling ``slide_sec`` partial aggregates (each event in
    exactly ONE bucket — no fanout). Level 2: explode each partial to
    the ``window/slide`` sliding windows it belongs to and merge the
    partials. Equivalent results to :func:`ip_window_stats` whenever
    ``slide_sec`` divides ``window_sec``; shuffle input shrinks from
    15x events to 15x buckets.
    """
    assert window_sec % slide_sec == 0, "two-level rollup needs slide | window"
    n = window_sec // slide_sec
    bucket = (F.floor(F.unix_timestamp(F.col(ts)) / slide_sec) * slide_sec).cast("long")
    partial = (
        log_records.groupBy(F.col(key), bucket.alias("bucket"))
        .agg(
            F.sum("clicks").alias("p_clicks"),
            F.sum("views").alias("p_views"),
            F.collect_set("category").alias("p_categories"),
        )
    )
    # every bucket b contributes to windows starting at b, b-slide, ..., b-(n-1)*slide
    offsets = F.sequence(F.lit(0), F.lit((n - 1) * slide_sec), F.lit(slide_sec))
    exploded = partial.withColumn(
        "window_start", F.explode(F.transform(offsets, lambda o: F.col("bucket") - o))
    )
    return exploded.groupBy(key, "window_start").agg(
        F.sum("p_clicks").alias("clicks"),
        F.sum("p_views").alias("views"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("p_categories")))
        ).alias("categories"),
    )


def ip_total_stats(log_records: DataFrame, key: str = "ip") -> DataFrame:
    """A4/A5 — whole-history per-key re-aggregation
    (Common.scala:63-70: reduce a key's retained stats then classify;
    ImplDStreams.scala:123 ``reduceByKey(_ ++ _)``).
    """
    return log_records.groupBy(key).agg(
        F.sum("clicks").alias("clicks"),
        F.sum("views").alias("views"),
        F.collect_set("category").alias("categories"),
    )
