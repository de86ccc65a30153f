"""Native stream-stream interval join (Structured Streaming).

The one first-class Structured Streaming capability the repo had not
yet exercised: joining TWO unbounded streams with a time-range
predicate, state-bounded by watermarks on BOTH sides. Spark keeps
each side's rows in the state store only until the other side's
watermark passes the join window — exactly the semantics the
reference's DStream course builds by hand with window buffers
(ImplDStreams.scala windowing), expressed declaratively so the
engine owns state eviction.

Shape: clicks ⋈ views on user_id with ``view_ts ∈ [click_ts - 6h,
click_ts]`` — "every view that could have led to this click". The
equality key makes it a hash-partitioned symmetric join (one shuffle
per side, co-partitioned); the range condition bounds state to 6
hours of each user's views/clicks. At 100 TB/day this is the only
join topology that works: state is O(rate x window), not O(history).

The batch twin (plans/events_queries.view_click_interval_join) runs
the identical predicate as a sort-merge equi-join on user_id with the
range as residual condition; batch/stream equivalence is pinned in
tests/test_streaming_interval_join.py and the batch side is
hash-checked against a DuckDB oracle in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_WINDOW_SEC = 21600  # views up to 6 hours before the click


def split_view_click(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project one events frame (event_id, user_id, event_type, ts)
    into the two join sides with disambiguated column names."""
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return views, clicks


def interval_join_view_click(
    views: DataFrame,
    clicks: DataFrame,
    watermark: str = "6 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join; works unchanged on batch frames
    (watermarks are a no-op in batch), which is what the equivalence
    test exploits. ``how='left_outer'`` (clicks side preserved) emits
    a null-view row for a click once the views watermark passes its
    join window — the "click with no attributable view" stream, which
    in DStream-land needs hand-rolled timeout state."""
    if views.isStreaming:
        views = views.withWatermark("view_ts", watermark)
    if clicks.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_SEC} SECONDS"))
        & (F.col("view_ts") <= F.col("click_ts"))
    )
    return clicks.join(views, cond, how).select(
        "click_id",
        "view_id",
        F.col("c_user_id").alias("user_id"),
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("view_ts").alias("view_us"),
    )
