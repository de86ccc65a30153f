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

# Recommended submit-time configuration for a real multi-executor
# deployment (e.g. 1000 executors against ~100 TB). Local test
# sessions do not set these — they are cluster knobs, documented here
# as part of the engine's scale contract:
# - AQE owns shuffle parallelism at runtime; the static
#   shuffle.partitions value is only the pre-AQE upper bound, so size
#   it ~2-3x total cores.
# - 128 MB scan partitions keep ~800k parquet tasks for 100 TB —
#   large enough to amortize scheduling, small enough to retry cheaply.
# - RocksDB state store: streaming aggregation/dedup/state at this
#   scale cannot live on the executor heap.
# - Kryo + zstd shrink shuffle bytes, usually the real bottleneck.
CLUSTER_SCALE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "8000",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.io.compression.codec": "zstd",
    "spark.shuffle.compress": "true",
    # Runtime bloom-filter join pruning: when one join side carries a
    # selective filter, inject might_contain(bloom(keys)) into the
    # other side's scan so the big-side shuffle writes only rows that
    # can match. At 100 TB this is the difference between shuffling
    # the full fact table and shuffling the ~1% that survives —
    # plan-pinned in tests/test_plans.py::test_runtime_bloom_filter_injected.
    # (applicationSideScanSizeThreshold stays at the 10 GB default on a
    # cluster: the filter only pays for itself on genuinely large scans.)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


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
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # shuffle/spill files outside /tmp: host tmp reapers have been
        # observed deleting blockmgr dirs mid-query (shuffle fetch then
        # fails with missing .index files)
        .config("spark.local.dir", os.path.expanduser("~/.spark-local"))
        # local-mode driver hosts all executor threads; the 1g default
        # heap has crashed (GCLocker allocation stall) under local[16+]
        .config("spark.driver.memory", "8g")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
