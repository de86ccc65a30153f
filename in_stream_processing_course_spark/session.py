"""SparkSession factory.

The reference hardcodes local tuning (ImplStructured.scala:75-91:
local[*], shuffle.partitions=20, 4g heap). We instead enable AQE so
partition counts adapt at runtime, pin the session timezone to UTC for
deterministic timestamp arithmetic, and turn on Arrow for the
pandas-UDF slow path. On a real cluster the same defaults hold; only
master/memory come from spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "in-stream-processing-course-spark",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    - AQE on: runtime shuffle-partition coalescing + skew-join handling
      replaces the reference's magic ``spark.sql.shuffle.partitions=20``
      (ImplStructured.scala:86-87).
    - UTC session timezone: window/epoch arithmetic is deterministic and
      matches the DuckDB oracle (naive timestamps treated as UTC).
    - Arrow on: pandas UDF / applyInPandas batches move via Arrow.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS,
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
