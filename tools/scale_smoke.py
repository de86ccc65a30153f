#!/usr/bin/env python
"""Full-registry scale smoke: run EVERY registered query Spark-side at
sf0.1 (10x the correctness SF) to a noop sink and report wall times,
sorted slowest-first. The sf0.01 oracle sweep proves correctness; this
catches the other failure mode — a query whose plan is fine at 6k docs
but super-linear at 60k (cross products, accidental fan-outs, driver
collects). One pass per query, full computation, no result transfer.

Usage: python tools/scale_smoke.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from in_stream_processing_course_spark.plans.registry import QUERIES
from in_stream_processing_course_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    filters = sys.argv[2:]
    spark = get_spark("scale-smoke", shuffle_partitions="16")
    spark.sparkContext.setLogLevel("FATAL")
    # untimed warmup so the alphabetically-first query doesn't absorb
    # JVM/codegen/footer startup into its row
    try:
        QUERIES["hourly_event_counts"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass
    timings: list[tuple[float, str, str]] = []
    failed: list[str] = []
    t0 = time.perf_counter()
    for name in sorted(QUERIES):
        if filters and not any(f in name for f in filters):
            continue
        t = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings.append((time.perf_counter() - t, name, "ok"))
        except Exception:
            failed.append(name)
            timings.append((time.perf_counter() - t, name, "FAIL"))
            traceback.print_exc(limit=2, file=sys.stderr)
    total = time.perf_counter() - t0
    for wall, name, status in sorted(timings, reverse=True):
        print(f"{name:45s} {wall:7.1f}s  {status}")
    print(
        f"\n{len(failed)} failures / {len(timings)} run "
        f"({len(QUERIES)} registered) in {total:.0f}s at {sf_dir}"
    )
    if failed:
        print("FAILED:", ", ".join(failed))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
