"""Streaming observability: per-micro-batch data-quality metrics via
``DataFrame.observe`` + a ``StreamingQueryListener``.

The reference's only operational surface is console printing and
``explain`` (K5, ImplDStreams.scala:32 / ImplStructured.scala:47,63).
The Spark-native production form is observed metrics: named aggregate
expressions evaluated INSIDE the query plan (no second pass over the
data, no extra action) whose per-batch values arrive on the driver in
``StreamingQueryProgress.observedMetrics``. A listener turns them into
a monitoring feed — rows ingested, malformed/empty-key drops about to
happen, event-time high-water mark — the numbers an on-call pages on.

Scale: observe() compiles to the same partial-aggregate pattern as any
global agg (a handful of doubles per task merged on the driver), so
the cost is O(metrics), not O(rows); the listener runs on the driver's
listener bus, off the query's critical path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import (
    QueryIdleEvent,
    QueryProgressEvent,
    QueryStartedEvent,
    QueryTerminatedEvent,
    StreamingQueryListener,
)

OBSERVATION_NAME = "isp_batch_metrics"


def with_ingest_observations(
    stream: DataFrame, ts_col: str = "time", key_col: str = "ip"
) -> DataFrame:
    """Attach the standard ingest metrics: row count, null/empty keys,
    event-time min/max (watermark lag evidence), and distinct-key
    estimate.

    Attach this UPSTREAM of the empty-key drop
    (``pipeline.actions_to_log_records`` filters ``ip`` before any
    downstream operator) — observed on the raw decoded stream,
    ``n_empty_keys`` counts the rows the pipeline is ABOUT to drop;
    observed downstream it is structurally zero. ``ts_col`` may be the
    wire-format epoch-seconds long or an already-cast timestamp."""
    from pyspark.sql.types import TimestampType

    key = F.col(key_col)
    ts = F.col(ts_col)
    if isinstance(stream.schema[ts_col].dataType, TimestampType):
        ts = F.unix_timestamp(ts)
    return stream.observe(
        OBSERVATION_NAME,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (key.isNull() | (F.length(key) == 0)).cast("long")
        ).alias("n_empty_keys"),
        F.min(ts.cast("long")).alias("min_event_sec"),
        F.max(ts.cast("long")).alias("max_event_sec"),
        F.approx_count_distinct(key_col).alias("approx_keys"),
    )


class BatchMetricsListener(StreamingQueryListener):
    """Collects each batch's observed metrics into ``self.batches``
    (bounded deque of dicts, in arrival order). Listener callbacks run
    on the driver's listener bus — they must never touch the
    SparkSession, so this only appends plain dicts. The bus is GLOBAL
    (``spark.streams``): every record carries ``run_id``/``query_name``
    so two concurrently observed queries (whose batch_ids both start at
    0) stay distinguishable, and the deque bound keeps a long-running
    query from growing driver memory without limit."""

    def __init__(self, max_batches: int = 10_000) -> None:
        from collections import deque

        self.batches: deque[dict] = deque(maxlen=max_batches)

    def onQueryStarted(self, event: QueryStartedEvent) -> None:
        pass

    def onQueryProgress(self, event: QueryProgressEvent) -> None:
        observed = event.progress.observedMetrics
        if OBSERVATION_NAME in observed:
            row = observed[OBSERVATION_NAME]
            self.batches.append(
                {
                    "run_id": str(event.progress.runId),
                    "query_name": event.progress.name,
                    "batch_id": event.progress.batchId,
                    **row.asDict(),
                }
            )

    def onQueryIdle(self, event: QueryIdleEvent) -> None:
        pass

    def onQueryTerminated(self, event: QueryTerminatedEvent) -> None:
        pass
