"""Small-file compaction (sinks/compaction.py): many-file directory
collapses to size-targeted files, data intact, sort-clustering
restores footer-stats pruning, and the active-stream guard refuses."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.projections import (
    ensure_timestamp,
)
from in_stream_processing_course_spark.sinks.compaction import (
    compact_parquet_dir,
)
from in_stream_processing_course_spark.sources.batch import load_table


def test_compaction_preserves_data_and_reduces_files(spark, sf_dir, tmp_path):
    p = str(tmp_path / "many")
    ev = ensure_timestamp(load_table(spark, sf_dir, "events"), "ts")
    # simulate per-trigger accretion: 24 small appends
    ev.repartition(24).write.parquet(p)
    before_files = len(glob.glob(f"{p}/*.parquet"))
    assert before_files >= 24
    before = ev.count()
    before_sum = ev.agg(F.sum("event_id")).collect()[0][0]

    n_after = compact_parquet_dir(spark, p, sort_by=["user_id", "ts"])
    assert n_after < before_files
    got = spark.read.parquet(p)
    assert got.count() == before
    assert got.agg(F.sum("event_id")).collect()[0][0] == before_sum

    # sort-clustering: each compacted file covers a bounded user range
    bounds = []
    for f in sorted(glob.glob(f"{p}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("user_id")
        st = md.row_group(0).column(idx).statistics
        bounds.append((st.min, st.max))
    if len(bounds) > 1:
        spans = [hi - lo for lo, hi in bounds]
        users = got.select("user_id").distinct().count()
        assert max(spans) < users  # no file spans the whole domain


def test_compaction_refuses_while_stream_active(spark, tmp_path):
    from in_stream_processing_course_spark.sources import generator as gen
    from in_stream_processing_course_spark.sources.stream import (
        read_action_stream,
    )
    from in_stream_processing_course_spark.streaming.pipeline import (
        start_raw_event_cache,
    )

    gen.write_json_lines(
        [gen.Action(1, "1000", "ip1", "click")], str(tmp_path / "in" / "a.json")
    )
    sink_dir = str(tmp_path / "cache")
    q = start_raw_event_cache(
        read_action_stream(spark, str(tmp_path / "in")),
        sink_dir,
        str(tmp_path / "ckpt"),
        trigger_seconds="1 seconds",
    )
    try:
        q.processAllAvailable()
        with pytest.raises(RuntimeError, match="actively writing"):
            compact_parquet_dir(spark, sink_dir)
    finally:
        q.stop()
