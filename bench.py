#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation,
no driver collect) — measures engine throughput, not py4j transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

from in_stream_processing_course_spark.plans.registry import QUERIES
from in_stream_processing_course_spark.session import get_spark

HEADLINE = [
    "bot_stats_sliding",
    "bot_stats_two_level",
    "bot_classified_totals",
    "bot_verdicts",
    "sessionize_events",
    "hourly_event_counts",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume",
    "window_running_revenue",
    "dedup_events_exact",
    "dedup_minhash_candidates",
    "dedup_simhash_candidates",
    "knn_brute_force",
    "text_metrics",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "isp-course-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(int(cpus), 8)),
    )
    # warm the JVM + parquet footers + codegen/agg paths on the tiny SF
    # so per-query numbers measure the queries, not first-call JIT
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm_sf = "/root/testdata/sf0.001"
    for warm_query in (
        "bot_stats_sliding",
        "dedup_minhash_candidates",
        "dedup_simhash_candidates",
    ):
        try:
            QUERIES[warm_query](spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    # two timed passes per query, keep the min: absorbs host-load noise
    # and leftover JIT warmup (observed 1.5x run-to-run swings on the
    # same code); the min is the engine's capability, the thing being
    # benchmarked.
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            fn = QUERIES[name]
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - start, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
