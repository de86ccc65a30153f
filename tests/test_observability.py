"""Engine observability + schema evolution — operational capabilities
a production pipeline needs beyond query semantics:

- ``df.observe`` metrics: per-micro-batch aggregates delivered through
  query progress without a second aggregation pass over the data
  (the SLA/row-count monitoring hook);
- parquet schema evolution: ``mergeSchema`` unifies files written at
  different schema versions — columns added over time read as NULL for
  old files instead of failing the scan.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from in_stream_processing_course_spark.sources import generator as gen
from in_stream_processing_course_spark.sources.stream import read_action_stream
from in_stream_processing_course_spark.streaming.pipeline import (
    actions_to_log_records,
)


def test_batch_observe_metrics_piggyback(spark, sf_dir):
    """Observation collects aggregates during the main action — no
    second scan of the input."""
    from in_stream_processing_course_spark.sources.batch import load_table

    obs = Observation("ingest")
    ev = load_table(spark, sf_dir, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count("user_id").alias("n_with_user"),
    )
    n = ev.count()
    got = obs.get
    assert got["n_rows"] == n
    assert 0 < got["n_with_user"] <= n


def test_streaming_observe_metrics_per_batch(spark, tmp_path):
    """observe() on a streaming DataFrame surfaces metrics in each
    batch's progress event (observedMetrics), the monitoring hook the
    reference's print()-debugging stands in for."""
    actions = [gen.Action(i, "1000", "ip1", "click") for i in range(7)]
    gen.write_json_lines(actions, str(tmp_path / "in" / "a.json"))
    lr = actions_to_log_records(
        read_action_stream(spark, str(tmp_path / "in"))
    ).observe("batch_stats", F.count(F.lit(1)).alias("n_rows"))
    q = (
        lr.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    observed = [
        p.observedMetrics["batch_stats"].n_rows
        for p in [q.lastProgress]
        if p and "batch_stats" in (p.observedMetrics or {})
    ]
    q.stop()
    assert observed and sum(observed) == len(actions)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Files written before a column existed read as NULL under
    mergeSchema — additive schema evolution without rewrites."""
    p = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a")], "id bigint, name string"
    ).write.parquet(p + "/v=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    ).write.parquet(p + "/v=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "name", "score", "v"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5
