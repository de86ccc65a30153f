"""Unit tests for the v2 (transformWithStateInPandas) stateful
processor WITHOUT the streaming runtime: the runner's protobuf wire
protocol needs google.protobuf, which this container lacks, so
tests/test_state_v2.py is env-gated — these tests drive
KeyedHistoryProcessor against fake handle/state/timer objects instead,
pinning the same transition semantics the v1 FakeGroupState tests pin
for applyInPandasWithState. Between the two, everything but Spark's
own transport is covered.
"""

from __future__ import annotations

import pandas as pd

from in_stream_processing_course_spark.streaming import state as st
from in_stream_processing_course_spark.streaming.state_v2 import (
    KeyedHistoryProcessor,
)


class FakeValueState:
    def __init__(self):
        self._value = None

    def exists(self):
        return self._value is not None

    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def clear(self):
        self._value = None


class FakeHandle:
    def __init__(self):
        self.states: dict[str, FakeValueState] = {}
        self.timers: list[int] = []

    @property
    def value_state(self):
        return self.states["history"]

    def getValueState(self, name, schema):
        from in_stream_processing_course_spark.streaming.state_v2 import (
            LAST_SEEN_SCHEMA,
        )

        assert name in ("history", "last_seen")
        assert schema is (st.STATE_SCHEMA if name == "history" else LAST_SEEN_SCHEMA)
        return self.states.setdefault(name, FakeValueState())

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, ts):
        self.timers.remove(ts)

    def registerTimer(self, ts):
        self.timers.append(ts)


class FakeTimerValues:
    def __init__(self, now_ms=1_000_000, watermark_ms=0):
        self._now = now_ms
        self._wm = watermark_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now

    def getCurrentWatermarkInMs(self):
        return self._wm


def _batch(rows):
    return pd.DataFrame(
        {
            "time": pd.to_datetime([r[0] for r in rows], unit="s"),
            "clicks": [r[1] for r in rows],
            "views": [r[2] for r in rows],
            "category": [r[3] for r in rows],
        }
    )


def _make():
    proc = KeyedHistoryProcessor()
    handle = FakeHandle()
    proc.init(handle)
    return proc, handle


def test_v2_emits_verdict_and_arms_sliding_timer():
    proc, handle = _make()
    out = list(
        proc.handleInputRows(("ip1",), iter([_batch([(0, 1, 0, "a")])]), FakeTimerValues())
    )
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["ip"], row["clicks"], row["views"]) == ("ip1", 1, 0)
    assert handle.value_state.exists()
    # exactly one timer, TIMEOUT_SEC after "now"
    assert handle.timers == [1_000_000 + st.TIMEOUT_SEC * 1000]
    # a second batch REPLACES the timer (sliding idle timeout), never
    # accumulates stale ones
    list(
        proc.handleInputRows(
            ("ip1",), iter([_batch([(40, 0, 1, "b")])]), FakeTimerValues(2_000_000)
        )
    )
    assert handle.timers == [2_000_000 + st.TIMEOUT_SEC * 1000]


def test_v2_history_merges_across_calls_like_v1():
    proc, handle = _make()
    list(proc.handleInputRows(("k",), iter([_batch([(0, 1, 0, "a")])]), FakeTimerValues()))
    out = list(
        proc.handleInputRows(("k",), iter([_batch([(40, 0, 1, "b")])]), FakeTimerValues())
    )
    row = out[0].iloc[0]
    assert (row["clicks"], row["views"], row["categories_count"]) == (1, 1, 2)

    # identical input through the v1 transition function -> same verdict
    v1_state = None
    v1_state = st.merge_history(v1_state, _batch([(0, 1, 0, "a")]))
    v1_state = st.merge_history(v1_state, _batch([(40, 0, 1, "b")]))
    clicks, views, cats = st.summarize(v1_state)
    assert (clicks, views, cats) == (1, 1, 2)
    assert st.classify_merged(clicks, views, cats) == (
        row["is_bot"],
        row["reason"],
    )


def test_v2_expired_timer_evicts_silently():
    proc, handle = _make()
    list(proc.handleInputRows(("k",), iter([_batch([(0, 1, 0, "a")])]), FakeTimerValues()))
    assert handle.value_state.exists()
    out = list(proc.handleExpiredTimer(("k",), FakeTimerValues(), None))
    assert out == []
    assert not handle.value_state.exists()


def test_v2_window_prune_matches_v1():
    """Old buckets beyond the trailing window fall out of the merged
    history — the corrected-intent prune (SURVEY §1.4.4), via the
    shared transition core."""
    proc, handle = _make()
    list(proc.handleInputRows(("k",), iter([_batch([(0, 0, 5, "a")])]), FakeTimerValues()))
    out = list(
        proc.handleInputRows(
            ("k",),
            iter([_batch([(st.WINDOW_SEC + 100, 2, 1, "b")])]),
            FakeTimerValues(),
        )
    )
    row = out[0].iloc[0]
    # the t=0 bucket is outside (max_bucket - window]: only batch 2 counts
    assert (row["clicks"], row["views"], row["categories_count"]) == (2, 1, 1)


# --- event-time eviction mode (r11, VERDICT r10 #3) --------------------------


def _make_et():
    proc = KeyedHistoryProcessor(event_time=True)
    handle = FakeHandle()
    proc.init(handle)
    return proc, handle


def test_v2_event_time_timer_is_data_derived():
    """The idle timer must be last-seen EVENT time + timeout — never
    the wall clock — so a backfill replayed at any speed evicts at the
    same points (replay-safe)."""
    proc, handle = _make_et()
    # events at t=100s; absurd wall clock to prove it is ignored
    list(
        proc.handleInputRows(
            ("k",), iter([_batch([(100, 1, 0, "a")])]),
            FakeTimerValues(now_ms=999_999_999_999),
        )
    )
    assert handle.timers == [100_000 + st.TIMEOUT_SEC * 1000]
    assert handle.states["last_seen"].get() == (100_000,)


def test_v2_event_time_timer_never_moves_backwards():
    """An out-of-order batch (older max event time than already seen —
    the catch-up case) must NOT rewind the eviction point: last_seen is
    a max, so late rows merge into history without reviving the idle
    horizon."""
    proc, handle = _make_et()
    list(proc.handleInputRows(("k",), iter([_batch([(200, 1, 0, "a")])]), FakeTimerValues()))
    out = list(
        proc.handleInputRows(("k",), iter([_batch([(150, 0, 1, "b")])]), FakeTimerValues())
    )
    # late row merged (2 categories), timer still keyed to t=200s
    row = out[0].iloc[0]
    assert row["categories_count"] == 2
    assert handle.timers == [200_000 + st.TIMEOUT_SEC * 1000]
    assert handle.states["last_seen"].get() == (200_000,)


def test_v2_event_time_timer_slides_forward_and_replaces():
    proc, handle = _make_et()
    list(proc.handleInputRows(("k",), iter([_batch([(100, 1, 0, "a")])]), FakeTimerValues()))
    list(proc.handleInputRows(("k",), iter([_batch([(500, 1, 0, "a")])]), FakeTimerValues()))
    # exactly ONE timer, slid to the new max — stale ones deleted
    assert handle.timers == [500_000 + st.TIMEOUT_SEC * 1000]


def test_v2_event_time_expiry_clears_both_states_silently():
    proc, handle = _make_et()
    list(proc.handleInputRows(("k",), iter([_batch([(100, 1, 0, "a")])]), FakeTimerValues()))
    out = list(proc.handleExpiredTimer(("k",), FakeTimerValues(watermark_ms=10**9), None))
    assert out == []
    assert not handle.states["history"].exists()
    assert not handle.states["last_seen"].exists()


def test_v2_event_time_verdicts_match_processing_time_mode():
    """The timeout mode must not change WHAT is computed — only WHEN
    keys are evicted. Same batches through both modes -> identical
    verdict rows."""
    rows = [(0, 3, 1, "a"), (40, 2, 2, "b"), (90, 1, 1, "c")]
    outs = []
    for et in (False, True):
        proc = KeyedHistoryProcessor(event_time=et)
        handle = FakeHandle()
        proc.init(handle)
        out = list(proc.handleInputRows(("k",), iter([_batch(rows)]), FakeTimerValues()))
        outs.append(out[0].iloc[0].to_dict())
    assert outs[0] == outs[1]
