#!/usr/bin/env python
"""Compare two bench records and flag per-query regressions.

Usage: python tools/bench_compare.py BENCH_r02.json BENCH_r03.json [ratio]

Accepts either the driver's record shape ({"parsed": {...}}) or
bench.py's raw JSON line. Exits 1 if any query regressed beyond the
ratio (default 1.15) — the same threshold VERDICT r2 used for
"chase it or explain it in PLANS.md".
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    return data.get("parsed", data)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.15
    old_q, new_q = old["queries"], new["queries"]
    regressed = []
    print(f"{'query':45s} {'old':>7s} {'new':>7s} {'ratio':>6s}")
    for name in sorted(set(old_q) | set(new_q)):
        if name not in old_q:
            print(f"{name:45s} {'-':>7s} {new_q[name]:7.2f}    new")
            continue
        if name not in new_q:
            print(f"{name:45s} {old_q[name]:7.2f} {'-':>7s}    removed")
            continue
        ratio = new_q[name] / old_q[name] if old_q[name] else float("inf")
        flag = "  <-- REGRESSED" if ratio > threshold else ""
        print(f"{name:45s} {old_q[name]:7.2f} {new_q[name]:7.2f} {ratio:6.2f}{flag}")
        if ratio > threshold:
            regressed.append(name)
    print(
        f"\ntotal: {old.get('value', '?')} -> {new.get('value', '?')} "
        f"(ratio {new['value'] / old['value']:.2f})"
        if old.get("value") and new.get("value")
        else ""
    )
    for name in regressed:
        print("REGRESSED:", name)
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
