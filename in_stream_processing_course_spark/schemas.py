"""Declared schemas (no inference anywhere — reference declares its
wire/record shapes in code: Common.scala:52-87, LogModel.java:17-24).

The reference's typed Scala case classes become StructTypes:
- ``Action(time, categoryId, ip, action)``       -> ACTION_SCHEMA
- ``LogRecord(ip, time, clicks, views, category)`` -> LOG_RECORD_SCHEMA
- ``AggregatedLogRecord(ip, clicks, views, categories)`` -> AGGREGATED_SCHEMA
- ``EvaluatedStat(stat, isBot, reason)``          -> columns added by
  :mod:`..functions.classifier`.

Driver test tables (TESTDATA.md / FIXTURES.md) are also declared here
so file-stream sources can read them without inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference wire format (botgen.py:54, Common.scala:81-82) ---------
# {"time": <epoch seconds>, "categoryId": <int>, "ip": "a.b.c.d",
#  "action": "click"|"view"}
ACTION_SCHEMA = T.StructType(
    [
        T.StructField("time", T.LongType()),  # epoch SECONDS (botgen.py:51)
        T.StructField("categoryId", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("action", T.StringType()),
    ]
)

# --- normalized analytical record (Common.scala:85) -------------------
LOG_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("ip", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("clicks", T.LongType()),
        T.StructField("views", T.LongType()),
        T.StructField("category", T.StringType()),
    ]
)

# --- aggregated per-key stats (Common.scala:87) ------------------------
AGGREGATED_SCHEMA = T.StructType(
    [
        T.StructField("ip", T.StringType()),
        T.StructField("clicks", T.LongType()),
        T.StructField("views", T.LongType()),
        T.StructField("categories", T.ArrayType(T.StringType())),
    ]
)

# --- driver `events` table (TESTDATA.md) -------------------------------
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# props payload: {"k": <int>} — the ad-category analog (FIXTURES.md §1)
PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# --- multimodal blob envelope (north-star X4) ---------------------------
# Opaque media bytes + typed metadata; decode is a pandas-UDF stage.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
