#!/usr/bin/env python
"""Full mirror of the driver's t2 correctness gate: run EVERY
registered query with an oracle at sf0.01 (the driver's SF) and
report per-query rows/schema/hash status plus a summary. Queries
without oracles get the weaker rows-only check (>= 0 rows).

Usage: python tools/parity_sweep.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import pathlib
import sys
import time
import traceback

# anchor imports on the repo root so the sweep works from any cwd
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from in_stream_processing_course_spark.plans.registry import ORACLES, QUERIES
from in_stream_processing_course_spark.session import get_spark
from tests.oracle_compare import compare_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = get_spark("parity-sweep")
    failed: list[str] = []
    n_run = 0
    t0 = time.perf_counter()
    for name in sorted(QUERIES):
        if filters and not any(f in name for f in filters):
            continue
        n_run += 1
        t = time.perf_counter()
        try:
            if name in ORACLES:
                compare_query(spark, QUERIES[name], ORACLES[name], sf_dir)
                status = "ok"
            else:
                QUERIES[name](spark, sf_dir).count()
                status = "ok (rows-only)"
        except Exception as exc:  # noqa: BLE001 - report and continue
            status = "FAIL: " + str(exc).splitlines()[0][:200]
            failed.append(name)
            traceback.print_exc(limit=1)
        print(f"{name:45s} {time.perf_counter() - t:6.1f}s  {status}", flush=True)
    total = time.perf_counter() - t0
    # the "(N oracle-backed)" count is THE quotable number — commit
    # messages and PARITY.md must cite len(ORACLES), never a hand-kept
    # tally (VERDICT r5 bookkeeping nit); tests/test_oracle_parity.py
    # pins the committed evidence footer against both lengths
    print(
        f"\n{len(failed)} failures / {n_run} run "
        f"({len(QUERIES)} registered, {len(ORACLES)} oracle-backed) "
        f"in {total:.0f}s"
    )
    for name in failed:
        print("  FAILED:", name)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
