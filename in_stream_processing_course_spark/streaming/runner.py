"""Stream-execution helpers for tests and batch<->stream equivalence.

The reference's load-bearing property (SURVEY §3 entry point 3): the
same transform runs as a batch query and as a streaming query. These
helpers make that testable — run any streaming DataFrame into a memory
sink and hand back the result table.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_stream_to_memory(
    sdf: DataFrame,
    output_mode: str = "update",
    query_name: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Start the stream, drain all available input, stop, and return
    the memory-sink table. ``complete`` mode mirrors batch results for
    aggregations; ``update``/``append`` expose incremental semantics.
    """
    name = query_name or f"q_{uuid.uuid4().hex[:8]}"
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_")
    query = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)  # drain everything, then stop —
        # processAllAvailable would never settle for stateful queries
        # whose processing-time timeouts keep scheduling cleanup batches
        .start()
    )
    try:
        query.awaitTermination(300)
    finally:
        query.stop()
    spark: SparkSession = sdf.sparkSession
    return spark.table(name)


def run_stream_foreach_batch(
    sdf: DataFrame,
    batch_fn,
    output_mode: str = "update",
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
) -> None:
    """T5/T6/K1 — foreachBatch with checkpointing; drains and stops."""
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_")
    writer = (
        sdf.writeStream.foreachBatch(batch_fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
    )
    query = writer.start()
    try:
        query.awaitTermination(300)
    finally:
        query.stop()
