#!/usr/bin/env python
"""Filtered driver-sim: verify named queries (or a substring match)
against their DuckDB oracles at a given SF — the per-family fast loop
for optimization rounds. Full-registry sweep: tools/driver_sim.sh.

Usage: python tools/verify_some.py [--sf DIR] [--prefix P ...] [q ...]
"""

from __future__ import annotations

import argparse
import decimal
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from in_stream_processing_course_spark.plans.registry import ORACLES, QUERIES
from in_stream_processing_course_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--prefix", action="append", default=[])
    args = ap.parse_args()
    names = set(args.queries)
    for p in args.prefix:
        names.update(n for n in QUERIES if n.startswith(p))
    from oracle_compare import canonical_hash, run_oracle

    spark = get_spark("verify-some", master="local[16]",
                      shuffle_partitions="16")
    fails = []
    for name in sorted(names):
        try:
            sdf = QUERIES[name](spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            # all rows, not a 100-row sample (ADVICE r13 #5): a Decimal
            # surfacing only in late sort positions must still flag
            decs = sorted({c for r in srows
                           for c, v in zip(sdf.columns, r)
                           if isinstance(v, decimal.Decimal)})
            if decs:
                fails.append((name, f"decimal {decs}"))
            if name in ORACLES:
                ocols, orows = run_oracle(ORACLES[name], args.sf)
                ok = (sorted(sdf.columns) == sorted(ocols)
                      and len(srows) == len(orows)
                      and canonical_hash(sdf.columns, srows)
                      == canonical_hash(ocols, orows))
                status = "OK" if ok else "MISMATCH"
                if not ok:
                    fails.append((name, "mismatch"))
            else:
                status = "rows-only"
            print(f"{name:45s} {status} ({len(srows)} rows)")
        except Exception as ex:
            fails.append((name, f"ERROR {type(ex).__name__}: {str(ex)[:160]}"))
            print(f"{name:45s} ERROR {ex}")
    print("FAILS:", fails if fails else "none")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
