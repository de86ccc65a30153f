#!/usr/bin/env python
"""Same-host stateful-path A/B (VERDICT r9 next-round #1).

Two questions, one controlled run:

1. **v1 vs v2**: ``applyInPandasWithState`` (streaming/state.py) vs
   ``transformWithStateInPandas`` (streaming/state_v2.py) on the SAME
   drip workload at TWO key cardinalities (wide: ~5k user keys with
   ~1 event per key-bucket; hot: ~500 keys with heavy per-key
   multiplicity). Three rounds of 9 interleaved runs
   (v1 v2 v2 v1 ... per cardinality), min-wall per variant, so neither
   API systematically gets the warmer JVM. If v2 >= v1 on both
   workloads, streaming/pipeline.py switches its default.

2. **prereduce crossover**: raw vs ``prereduce=True`` through the v1
   operator while per-partition (key, bucket) multiplicity sweeps over
   ~1.5x -> ~1500x (fixed 120k events, n_users in {10000, 1000, 100,
   10}). The r8/r9 numbers showed the combiner LOSING at multiplicity
   ~15 despite a 13x shrink; this finds where (or whether, in
   single-JVM local mode) the crossover lives, so the docstring can
   state a measured threshold instead of "use this at scale".

Usage: python tools/stateful_ab.py [--quick]
       python tools/stateful_ab.py --profile
Prints a markdown table; commit it into STATEFUL_AB_r10.md
(``--profile`` results into STATEFUL_AB_r12.md).

``--profile`` (r12, VERDICT r11 next-round #5): decompose the v1/v2
wall into per-TRIGGER and per-(KEY x TRIGGER) components instead of
re-measuring the headline gap. Two sweeps on the same interleaved
min-wall methodology — micro-batch count swept at fixed workload
(the drip is max_files_per_trigger=1, so n_files == n_triggers), key
cardinality swept at fixed batches (NOTE: the generator's row count
is frequency-driven, so sweeping n_users varies KEYS at ~constant
rows — the first draft of this tool mislabeled that sweep "rows" and
fit a collinear design) — then a least-squares fit of
``wall = c + a*batches + g*(keys*batches)`` per variant. ``g`` is
per-key-per-trigger state-store work (both APIs pay it; v2's
state-server round trips make it bigger), ``a`` is fixed per-trigger
protocol cost (v2-only in practice). The r12 measured conclusion
lives in STATEFUL_AB_r12.md and state_v2.py's module docstring.
"""

from __future__ import annotations

import os
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from in_stream_processing_course_spark.compat import ensure_protobuf_fallback

HAVE_PB = ensure_protobuf_fallback()  # must precede JVM start

from in_stream_processing_course_spark.session import get_spark  # noqa: E402
from in_stream_processing_course_spark.sources import generator as gen  # noqa: E402
from in_stream_processing_course_spark.sources.stream import (  # noqa: E402
    read_action_stream,
)
from in_stream_processing_course_spark.streaming.pipeline import (  # noqa: E402
    actions_to_log_records,
)
from in_stream_processing_course_spark.streaming.runner import (  # noqa: E402
    await_drained,
)
from in_stream_processing_course_spark.streaming.state import (  # noqa: E402
    keyed_history_verdicts,
    prereduce_log_records,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def make_drip(root: str, n_bots: int, n_users: int, user_freq: int,
              duration: int = 240, n_files: int = 8) -> tuple[str, int]:
    in_dir = os.path.join(root, "in")
    actions = gen.botgen_workload(
        n_bots=n_bots, n_users=n_users, user_freq=user_freq,
        duration_sec=duration,
    )
    slice_sec = max(1, duration // n_files)
    buckets: list[list] = [[] for _ in range(n_files)]
    for a in actions:
        buckets[min(a.time // slice_sec, n_files - 1)].append(a)
    for i, b in enumerate(buckets):
        gen.write_json_lines(b, os.path.join(in_dir, f"part-{i:04d}.json"))
    return in_dir, len(actions)


def run_once(spark, in_dir: str, ckpt: str, variant: str) -> float:
    """One availableNow drain through the chosen stateful operator to
    a noop sink; returns wall seconds. variant: v1 | v1pre | v2 (all
    on RocksDB) | v1hdfs (v1 on the default HDFS-backed store — the
    provider bench.py's v1 numbers historically ran on)."""
    spark.conf.set(
        PROVIDER_KEY,
        HDFS_PROVIDER if variant == "v1hdfs" else ROCKSDB,
    )
    lr = actions_to_log_records(
        read_action_stream(spark, in_dir, max_files_per_trigger=1)
    )
    if variant == "v2":
        from in_stream_processing_course_spark.streaming.state_v2 import (
            keyed_history_verdicts_v2,
        )

        verdicts = keyed_history_verdicts_v2(lr)
    else:
        verdicts = keyed_history_verdicts(lr, prereduce=(variant == "v1pre"))
    start = time.perf_counter()
    q = (
        verdicts.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, timeout_sec=900)
    return time.perf_counter() - start


def interleaved(spark, in_dir: str, root: str, variants: list[str],
                rounds: int = 3) -> dict[str, float]:
    """min-wall per variant over `rounds` palindromic passes (a b b a)
    so JVM warmth cancels."""
    walls: dict[str, float] = {}
    seq: list[str] = []
    for _ in range(rounds):
        seq += variants + variants[::-1]
    for i, v in enumerate(seq):
        w = run_once(spark, in_dir, os.path.join(root, f"ckpt_{v}_{i}"), v)
        walls[v] = min(walls.get(v, w), w)
        print(f"    run {i + 1}/{len(seq)} {v}: {w:.2f}s", flush=True)
    return walls


def main() -> int:
    quick = "--quick" in sys.argv
    rounds = 1 if quick else 3
    spark = get_spark("stateful-ab", shuffle_partitions="8")
    # v2 requires RocksDB; v1 runs on BOTH providers — v1-on-RocksDB
    # isolates the API from the store backend, v1-on-HDFS is the
    # deployed default bench.py has measured since r2
    print(f"protobuf transport available: {HAVE_PB}")
    results: dict[str, dict[str, float]] = {}

    print("== v1 vs v2, two key cardinalities ==")
    for label, (n_bots, n_users, user_freq) in {
        "wide(~5k keys, ~1 ev/key-bucket)": (50, 5000, 500),
        "hot(~500 keys, heavy history)": (400, 100, 20),
    }.items():
        root = tempfile.mkdtemp(prefix="ab_v_")
        in_dir, n_rows = make_drip(root, n_bots, n_users, user_freq)
        print(f"  {label}: {n_rows} events")
        variants = (["v1hdfs", "v1", "v2"] if HAVE_PB
                    else ["v1hdfs", "v1"])
        walls = interleaved(spark, in_dir, root, variants, rounds)
        results[label] = {
            **{f"{v}_wall_sec": round(w, 2) for v, w in walls.items()},
            **{
                f"{v}_rows_per_sec": round(n_rows / w)
                for v, w in walls.items()
            },
        }
        shutil.rmtree(root, ignore_errors=True)

    print("== prereduce crossover sweep (v1 raw vs v1+combiner) ==")
    for n_users in (10000, 1000, 100, 10):
        root = tempfile.mkdtemp(prefix="ab_p_")
        in_dir, n_rows = make_drip(
            root, n_bots=0, n_users=n_users, user_freq=500
        )
        spark_df = spark.read.schema(
            __import__(
                "in_stream_processing_course_spark.schemas",
                fromlist=["ACTION_SCHEMA"],
            ).ACTION_SCHEMA
        ).json(in_dir)
        combined = prereduce_log_records(
            actions_to_log_records(spark_df)
        ).count()
        shrink = round(n_rows / max(combined, 1), 1)
        print(f"  n_users={n_users}: {n_rows} events, shrink x{shrink}")
        walls = interleaved(spark, in_dir, root, ["v1", "v1pre"], rounds)
        results[f"prereduce n_users={n_users} (shrink x{shrink})"] = {
            f"{v}_wall_sec": round(w, 2) for v, w in walls.items()
        }
        shutil.rmtree(root, ignore_errors=True)

    print("\n== results ==")
    for label, row in results.items():
        print(f"{label}: {row}")
    return 0


def main_profile() -> int:
    """Fit wall = c + a*batches + g*(keys*batches) per variant (see
    module docstring). Five configs: batch sweep {4, 8, 16} files at
    5k keys, key sweep {2.5k, 10k} at 8 files; each config an
    interleaved palindromic v1/v2 pass (min-of-2 per variant)."""
    import numpy as np

    spark = get_spark("stateful-profile", shuffle_partitions="8")
    print(f"protobuf transport available: {HAVE_PB}")
    if not HAVE_PB:
        print("v2 needs the protobuf transport — profile aborted")
        return 1
    # (n_users, n_files); user_freq fixed so the generator's row count
    # stays ~constant (~126k) — n_users sweeps KEY cardinality
    configs = {
        "b4": (5000, 4),
        "b8": (5000, 8),
        "b16": (5000, 16),
        "k-half": (2500, 8),
        "k-double": (10000, 8),
    }
    obs: list[tuple[str, int, int, int, float, float]] = []
    for tag, (n_users, n_files) in configs.items():
        root = tempfile.mkdtemp(prefix="ab_prof_")
        in_dir, n_rows = make_drip(
            root, n_bots=n_users // 100, n_users=n_users,
            user_freq=500, n_files=n_files,
        )
        print(f"  {tag}: {n_rows} rows, {n_users} keys, {n_files} batches")
        walls = interleaved(spark, in_dir, root, ["v1", "v2"], rounds=1)
        obs.append(
            (tag, n_files, n_users, n_rows, walls["v1"], walls["v2"])
        )
        shutil.rmtree(root, ignore_errors=True)

    print("\n== observations ==")
    print(f"{'config':10s} {'batches':>7s} {'keys':>6s} {'rows':>8s}"
          f" {'v1':>8s} {'v2':>8s}")
    for tag, nb, nk, nr, w1, w2 in obs:
        print(f"{tag:10s} {nb:7d} {nk:6d} {nr:8d} {w1:7.2f}s {w2:7.2f}s")

    A = np.array(
        [[1.0, nb, nb * nk / 1000.0] for _, nb, nk, _, _, _ in obs]
    )
    fits = {}
    for vi, name in ((4, "v1"), (5, "v2")):
        y = np.array([row[vi] for row in obs])
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        resid = y - A @ coef
        fits[name] = coef
        print(
            f"{name}: wall ~= {coef[0]:.2f}s + {coef[1]*1000:.0f}ms/batch "
            f"+ {coef[2]:.3f}ms/(key*batch)  (max fit residual "
            f"{abs(resid).max():.2f}s)"
        )
    c1, a1, g1 = fits["v1"]
    c2, a2, g2 = fits["v2"]
    nb0, nk0 = 8, 5000
    gap_batch = (a2 - a1) * nb0
    gap_keybatch = (g2 - g1) * nb0 * nk0 / 1000.0
    print(
        f"\ngap at {nb0} batches x {nk0} keys: "
        f"fixed {c2 - c1:+.2f}s, per-batch {gap_batch:+.2f}s, "
        f"per-key-batch {gap_keybatch:+.2f}s; "
        f"per-key-batch cost v1 {g1:.3f}ms vs v2 {g2:.3f}ms"
    )
    return 0


if __name__ == "__main__":
    if "--profile" in sys.argv:
        raise SystemExit(main_profile())
    raise SystemExit(main())
