"""Space-Saving heavy hitters (streaming/heavy_hitters.py): algorithm
guarantees unit-tested pure, then the stateful stream operator across
micro-batches, including exactness when capacity covers the domain.
"""

from __future__ import annotations

import pathlib
from collections import Counter

from in_stream_processing_course_spark.sources import generator as gen
from in_stream_processing_course_spark.sources.stream import read_action_stream
from in_stream_processing_course_spark.streaming.heavy_hitters import (
    heavy_hitters_stream,
    space_saving_fold,
)
from in_stream_processing_course_spark.streaming.pipeline import (
    actions_to_log_records,
)
from in_stream_processing_course_spark.streaming.runner import (
    run_stream_to_memory,
)


def _actions(ip: str, cats: list[str], base: int = 0):
    return [
        gen.Action(base + i, c, ip, "click") for i, c in enumerate(cats)
    ]


def write_actions(tmp_path: pathlib.Path, name: str, actions) -> str:
    gen.write_json_lines(actions, str(tmp_path / "in" / name))
    return str(tmp_path / "in")


# --- pure algorithm ---------------------------------------------------------


def test_fold_exact_when_capacity_covers_domain():
    s = {}
    s = space_saving_fold(s, {"a": 5, "b": 2}, capacity=4)
    s = space_saving_fold(s, {"b": 3, "c": 1}, capacity=4)
    assert s == {"a": (5, 0), "b": (5, 0), "c": (1, 0)}


def test_fold_guarantees_under_eviction():
    true = Counter()
    s = {}
    batches = [
        {"a": 9, "b": 7, "c": 1},
        {"d": 2, "c": 3, "a": 4},
        {"e": 5, "b": 1, "f": 1},
    ]
    for b in batches:
        true.update(b)
        s = space_saving_fold(s, b, capacity=3)
    n = sum(true.values())
    for item, (est, err) in s.items():
        assert est >= true[item]          # overcount only
        assert est - err <= true[item]    # bounded by tracked error
        assert err <= n // 3              # Space-Saving error bound
    # no false negatives above n/capacity
    for item, cnt in true.items():
        if cnt > n // 3:
            assert item in s


# --- stream operator --------------------------------------------------------


def test_stream_exact_and_accumulating(spark, tmp_path):
    b1 = _actions("ip1", ["x"] * 6 + ["y"] * 3)
    b2 = _actions("ip1", ["y"] * 4 + ["z"] * 2, base=100)
    in_dir = write_actions(tmp_path, "b1.json", b1)
    write_actions(tmp_path, "b2.json", b2)

    lr = actions_to_log_records(
        read_action_stream(spark, in_dir, max_files_per_trigger=1)
    )
    out = run_stream_to_memory(
        heavy_hitters_stream(lr, "ip", "category", capacity=8),
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # last emission = state after both batches; capacity covers the
    # domain so the summary is exact with zero error
    rows = out.collect()
    final_n = max(r.n_observed for r in rows)
    assert final_n == len(b1) + len(b2)
    final = {
        r.item: (r.count_est, r.error_bound)
        for r in rows
        if r.n_observed == final_n
    }
    assert final == {"x": (6, 0), "y": (7, 0), "z": (2, 0)}


def test_stream_bounded_state_under_eviction(spark, tmp_path):
    cats = (
        ["hot"] * 20 + [f"cold{i}" for i in range(10)] + ["warm"] * 8
    )
    in_dir = write_actions(tmp_path, "b.json", _actions("ip1", cats))
    lr = actions_to_log_records(read_action_stream(spark, in_dir))
    out = run_stream_to_memory(
        heavy_hitters_stream(lr, "ip", "category", capacity=4),
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = out.collect()
    assert len(rows) <= 4  # state bounded at capacity
    true = Counter(cats)
    n = len(cats)
    got = {r.item: (r.count_est, r.error_bound) for r in rows}
    for item, (est, err) in got.items():
        assert est >= true[item]
        assert est - err <= true[item]
    for item, cnt in true.items():
        if cnt > n // 4:
            assert item in got  # hot + warm survive


def test_stream_checkpoint_restart_carries_summary(spark, tmp_path):
    """T6/T8 for the heavy-hitters operator: stop after batch 1,
    restart on the same checkpoint with a new file — the second run
    must process only the new arrivals and fold them into the
    CARRIED summary (counts continue from run-1 state, n_observed
    spans both runs)."""
    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_foreach_batch,
    )

    in_dir = write_actions(
        tmp_path, "b1.json", _actions("ip1", ["x"] * 5 + ["y"] * 2)
    )
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple] = []

    def stream():
        return heavy_hitters_stream(
            actions_to_log_records(read_action_stream(spark, in_dir)),
            "ip",
            "category",
            capacity=8,
        )

    def sink(df, _batch_id):
        seen.extend(tuple(r) for r in df.collect())

    run_stream_foreach_batch(stream(), sink, "update", checkpoint_dir=ckpt)
    n_first = len(seen)
    first = {r[1]: r[2] for r in seen}
    assert first == {"x": 5, "y": 2}

    write_actions(tmp_path, "b2.json", _actions("ip1", ["x"] * 3, base=50))
    run_stream_foreach_batch(stream(), sink, "update", checkpoint_dir=ckpt)
    second = seen[n_first:]
    final = {r[1]: r[2] for r in second}
    assert final == {"x": 8, "y": 2}  # run-1 counts carried and extended
    assert all(r[4] == 10 for r in second)  # n_observed spans both runs
