"""Streaming sources (SURVEY §2.1).

S3 (the ~450-LoC custom Kafka Connect filesystem tailer,
logs-to-kafka/LogsSourceConnector.java:16-67, LogsSourceTask.java,
FileReader.java) collapses to Spark's built-in file streaming source:
directory listing, new-file detection, per-file offsets, and
exactly-once recovery are native (checkpointed file list);
``maxFilesPerTrigger`` replaces the connector's 1000-ms poll loop.

S1/S2 (Kafka) is config-only: same downstream transform, different
``format``. Not started in tests (no broker in the container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import ACTION_SCHEMA, EVENT_SCHEMA


def read_action_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S3 — stream of reference wire-format JSON log lines
    ({time, categoryId, ip, action}; botgen.py:54) from a directory.
    Malformed lines surface as all-null rows (dropped by
    operators.projections.decode semantics downstream).
    """
    reader = spark.readStream.schema(ACTION_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(input_dir)


def read_event_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Driver `events`-shaped JSON stream (ts as ISO string or epoch)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(input_dir)


# The fixed schema every Kafka source batch/stream carries
# (spark-sql-kafka KafkaRecordToRowConverter) — the contract the
# downstream projection is written against. Used by the contract test
# to exercise cast_kafka_payload over wire-shaped rows without a
# broker or the connector jar.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def kafka_source_options(
    bootstrap_servers: str,
    topic: str = "clickstream-log",
    starting_offsets: str = "latest",
) -> tuple[str, dict[str, str]]:
    """S1 source contract: (format, options) for the structured Kafka
    reader (ImplStructured.scala:93-102 — format "kafka", subscribe,
    bootstrap servers, startingOffsets). Split out from the reader
    construction so the contract is assertable without the connector
    jar (DataStreamReader keeps its options JVM-private).
    """
    return "kafka", {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint_dir: str
) -> tuple[str, dict[str, str]]:
    """K6 sink contract: (format, options) for the Kafka egress writer
    (Util.java:24-32 producer config -> writeStream equivalents)."""
    return "kafka", {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def kafka_action_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "clickstream-log",
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1 — Kafka source projected to (key, value) strings
    (ImplStructured.scala:93-102). Requires the spark-sql-kafka
    package on the cluster; config-only here.
    """
    from ..operators.projections import cast_kafka_payload

    fmt, opts = kafka_source_options(bootstrap_servers, topic, starting_offsets)
    reader = spark.readStream.format(fmt)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return cast_kafka_payload(reader.load())


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Built-in load-generator source (replaces continuous-botgen.sh
    for throughput testing)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def write_kafka_stream(
    df,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str = "key",
    value_col: str = "value",
):
    """K6 — Kafka egress (the Connect producer side, Util.java:24-32,
    as a writeStream). Config-only in this container (no broker);
    returns the configured writer, caller calls ``.start()``.
    """
    from pyspark.sql import functions as F

    out = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )
    fmt, opts = kafka_sink_options(bootstrap_servers, topic, checkpoint_dir)
    writer = out.writeStream.format(fmt)
    for k, v in opts.items():
        writer = writer.option(k, v)
    return writer
