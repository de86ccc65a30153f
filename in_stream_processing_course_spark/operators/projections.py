"""Projection / filter / scalar transforms (SURVEY §2.3, P1-P10).

Every reference closure becomes a native Column expression so Catalyst
can push, prune, and codegen it — the reference's typed
``flatMap``/``filter`` lambdas (ImplStructured.scala:104-116,137) are
optimizer barriers; these are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ACTION_SCHEMA, PROPS_SCHEMA


def cast_kafka_payload(df: DataFrame) -> DataFrame:
    """P1 — kafka key/value bytes -> strings (ImplStructured.scala:101)."""
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )


def decode_actions(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P2 — JSON decode with silent malformed-drop
    (ImplStructured.scala:104-116; Common.scala:81-82).

    ``from_json`` yields null on malformed input; the filter drops it —
    same behavior as the reference's ``decode(...) Left -> None``
    flatMap, but expressed natively (no DeserializeToObject barrier).
    """
    parsed = F.from_json(F.col(value_col), ACTION_SCHEMA)
    return (
        df.withColumn("_action", parsed)
        .where(F.col("_action").isNotNull() & F.col("_action.action").isNotNull())
        .select("_action.*", *[c for c in df.columns if c != value_col])
    )


def drop_empty_keys(df: DataFrame, key_col: str = "key") -> DataFrame:
    """P3 addition — drop null/empty Kafka keys (ImplDStreams.scala:63)."""
    k = F.col(key_col)
    return df.where(k.isNotNull() & (F.length(k) > 0))


def action_counters(df: DataFrame, action_col: str = "action") -> DataFrame:
    """P4 — Action -> (clicks, views) counters (Common.scala:72-79)."""
    a = F.col(action_col)
    return df.withColumn(
        "clicks", F.when(a == "click", 1).otherwise(0).cast("long")
    ).withColumn("views", F.when(a == "view", 1).otherwise(0).cast("long"))


def epoch_seconds_to_timestamp(df: DataFrame, col: str, out: str = "time") -> DataFrame:
    """P5 — epoch seconds -> timestamp. Fixes the reference's unit bug
    (``new Timestamp(epochSeconds)`` treats seconds as millis,
    ImplStructured.scala:113 — SURVEY §1.4.1): we use the documented
    intent, ``timestamp_seconds``.
    """
    return df.withColumn(out, F.timestamp_seconds(F.col(col)))


def bucket_time(df: DataFrame, ts_col: str, seconds: int, out: str = "bucket") -> DataFrame:
    """P6 — floor event time to fixed buckets (ImplDStreams.scala:80-84)."""
    return df.withColumn(
        out,
        (F.floor(F.unix_timestamp(F.col(ts_col)) / seconds) * seconds).cast("long"),
    )


def ensure_timestamp(df: DataFrame, col: str) -> DataFrame:
    """Normalize an event-time column to TimestampType.

    The driver's ``events.ts`` has shipped as parquet TIMESTAMP(NANOS)
    (read as long nanoseconds under ``nanosAsLong``) and as
    TIMESTAMP(MICROS) with ``isAdjustedToUTC=false`` (read as
    TIMESTAMP_NTZ). Normalize both to TIMESTAMP: nanos via integer
    arithmetic (``div`` — no double round-trip, exact floor to
    microseconds), NTZ via a cast that is an exact reinterpretation
    because the session timezone is pinned to UTC (session.py).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype in ("bigint", "long"):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def normalize_events(events: DataFrame) -> DataFrame:
    """Driver ``events`` table -> reference ``LogRecord`` shape
    (FIXTURES.md §1 mapping; Common.scala:85).

    user_id -> ip key, ts -> time, event_type click/view -> counters,
    props {"k": N} -> category string. Non-click/view actions keep
    counters at 0 but still contribute their category to the distinct
    set (every action carries a category in the reference model).
    """
    events = ensure_timestamp(events, "ts")
    cat = F.from_json(F.col("props"), PROPS_SCHEMA)["k"].cast("string")
    typed = F.col("event_type")
    return events.select(
        F.col("user_id").cast("string").alias("ip"),
        F.col("ts").alias("time"),
        F.when(typed == "click", 1).otherwise(0).cast("long").alias("clicks"),
        F.when(typed == "view", 1).otherwise(0).cast("long").alias("views"),
        cat.alias("category"),
    )


def filter_bots(df: DataFrame) -> DataFrame:
    """P9 — keep flagged rows only (ImplStructured.scala:135-138).

    Expects an ``is_bot`` boolean column (native, not a typed closure).
    """
    return df.where(F.col("is_bot"))
