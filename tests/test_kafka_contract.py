"""Kafka source/sink CONTRACT tests (S1/K6 — VERDICT r2 item 7).

No broker and no spark-sql-kafka jar exist in this container, so these
tests pin the contract the production path would carry: the exact
(format, options) pairs the reader/writer are built with, and the
payload projection's behavior over rows shaped exactly like the Kafka
source wire schema. Together with the file-source equivalence path
(SURVEY §2.1) this covers everything except the broker round-trip
itself.
"""

from __future__ import annotations

import pytest

from in_stream_processing_course_spark.operators.projections import (
    cast_kafka_payload,
    decode_actions,
    drop_empty_keys,
)
from in_stream_processing_course_spark.sources.stream import (
    KAFKA_WIRE_SCHEMA,
    kafka_sink_options,
    kafka_source_options,
)


def test_kafka_source_contract():
    fmt, opts = kafka_source_options("broker-1:9092,broker-2:9092", "clicks")
    assert fmt == "kafka"
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "clicks",
        "startingOffsets": "latest",
    }
    # the reference consumes from the earliest offset on fresh groups
    # when replaying (ImplStructured.scala wiring); the knob must pass
    # through verbatim
    _, opts = kafka_source_options("b:9092", "t", starting_offsets="earliest")
    assert opts["startingOffsets"] == "earliest"


def test_kafka_sink_contract(tmp_path):
    fmt, opts = kafka_sink_options("b:9092", "verdicts", str(tmp_path / "ck"))
    assert fmt == "kafka"
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "verdicts",
        "checkpointLocation": str(tmp_path / "ck"),
    }


def test_kafka_payload_projection_over_wire_schema(spark):
    """cast_kafka_payload + drop_empty_keys + decode_actions over rows
    with the EXACT Kafka source schema (key/value binary + metadata
    columns): binary->string casts, empty-key drop, malformed-value
    drop, metadata columns pruned away."""
    good = b'{"time": 1700000000, "categoryId": 3, "ip": "1.2.3.4", "action": "click"}'
    rows = [
        (b"1.2.3.4", good, "clicks", 0, 0, None, 0),
        (b"", good, "clicks", 0, 1, None, 0),  # empty key -> dropped
        (None, good, "clicks", 0, 2, None, 0),  # null key -> dropped
        (b"5.6.7.8", b"not-json", "clicks", 0, 3, None, 0),  # malformed -> dropped
    ]
    raw = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    projected = cast_kafka_payload(raw)
    assert projected.columns == ["key", "value"]
    assert dict(projected.dtypes) == {"key": "string", "value": "string"}
    decoded = decode_actions(drop_empty_keys(projected)).collect()
    assert len(decoded) == 1
    row = decoded[0].asDict()
    assert (row["ip"], row["action"], row["categoryId"]) == ("1.2.3.4", "click", "3")


def test_kafka_stream_builder_requires_connector(spark):
    """The reader path is wired through kafka_source_options — without
    the connector jar the failure is the documented data-source lookup,
    proving the format string actually reaches Spark."""
    from in_stream_processing_course_spark.sources.stream import (
        kafka_action_stream,
    )

    with pytest.raises(Exception, match="kafka"):
        kafka_action_stream(spark, "b:9092")


@pytest.mark.kafka_live
@pytest.mark.skipif(
    "ISP_KAFKA_BOOTSTRAP" not in __import__("os").environ,
    reason="no live broker: set ISP_KAFKA_BOOTSTRAP=host:port (and put "
    "org.apache.spark:spark-sql-kafka-0-10 on the classpath) to run the "
    "round-trip smoke (VERDICT r3 item 8)",
)
def test_kafka_live_round_trip(spark, tmp_path):
    """One real round-trip through the production S1/K6 path: a batch
    of wire-format actions produced to a topic via the kafka writer
    options, then consumed by ``kafka_action_stream`` (earliest) into a
    memory sink and projected through the same payload cast the
    streaming pipeline uses. Self-contained: uses a uuid topic so
    reruns don't cross-contaminate (brokers default to topic
    auto-create)."""
    import json
    import os
    import uuid

    from pyspark.sql import functions as F

    from in_stream_processing_course_spark.sources.stream import (
        kafka_action_stream,
    )
    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_to_memory,
    )

    bootstrap = os.environ["ISP_KAFKA_BOOTSTRAP"]
    topic = f"isp-smoke-{uuid.uuid4().hex[:12]}"
    wire = [
        ("ip-1", json.dumps({"time": 1, "categoryId": "1001", "ip": "ip-1", "action": "click"})),
        ("ip-2", json.dumps({"time": 2, "categoryId": "1002", "ip": "ip-2", "action": "view"})),
    ]
    (
        spark.createDataFrame(wire, "key string, value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    stream = kafka_action_stream(
        spark, bootstrap, topic=topic, starting_offsets="earliest"
    )
    table = run_stream_to_memory(
        stream, output_mode="append", checkpoint_dir=str(tmp_path / "ckpt")
    )
    got = {(r["key"], r["value"]) for r in table.collect()}
    assert got == set(wire)
