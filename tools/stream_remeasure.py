#!/usr/bin/env python
"""One-off clean-host re-measure of the v1 streaming benches (VERDICT
r5 item 3): min-of-2 runs of bench_stateful_stream / bench_windowed_stream,
printed as one JSON line. Run on an otherwise idle host (no concurrent
pytest/sweep) so the numbers are comparable to r4's committed bench."""

from __future__ import annotations

import json
import os
import sys

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")

from in_stream_processing_course_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    spark = get_spark(
        "isp-stream-remeasure", master="local[32]", shuffle_partitions="16"
    )
    out: dict[str, float | int] = {}
    for label, fn in (
        ("stateful", bench.bench_stateful_stream),
        ("windowed", bench.bench_windowed_stream),
    ):
        best: float | None = None
        rows = 0
        for _ in range(2):
            rows, sec = fn(spark)
            best = sec if best is None else min(best, sec)
        out[f"{label}_wall_sec"] = round(best, 3)
        out[f"{label}_rows_per_sec"] = round(rows / best)
    line = json.dumps(out)
    print(line)
    sys.stdout.flush()
    spark.stop()
    print(line)


if __name__ == "__main__":
    main()
