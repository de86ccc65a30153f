"""Unit test of the T3 timeout branch: an idle key firing its
processing-time timeout is evicted without emission (the reference's
``isTimingOut`` guard, ImplDStreams.scala:94-96), exercised against a
fake GroupState so no streaming query is needed."""

from __future__ import annotations

import pandas as pd

from in_stream_processing_course_spark.streaming import state as st_mod


class FakeGroupState:
    def __init__(self, value=None, has_timed_out=False):
        self._value = value
        self.hasTimedOut = has_timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("state empty")
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _batch(rows):
    return pd.DataFrame(
        {
            "time": pd.to_datetime([r[0] for r in rows], unit="s"),
            "clicks": [r[1] for r in rows],
            "views": [r[2] for r in rows],
            "category": [r[3] for r in rows],
        }
    )


def test_update_emits_and_registers_timeout():
    state = FakeGroupState()
    out = list(
        st_mod._update_fn(("ip1",), [_batch([(0, 1, 0, "a")])], state)
    )
    assert len(out) == 1
    assert out[0]["ip"].tolist() == ["ip1"]
    assert state.timeout_ms == st_mod.TIMEOUT_SEC * 1000
    assert state.exists


def test_timeout_evicts_without_emission():
    state = FakeGroupState(
        value=([0], [5], [5], ['["a"]']), has_timed_out=True
    )
    out = list(st_mod._update_fn(("ip1",), iter([]), state))
    assert out == []
    assert state.removed


def test_state_accumulates_between_calls():
    state = FakeGroupState()
    list(st_mod._update_fn(("k",), [_batch([(0, 1, 0, "a")])], state))
    out = list(
        st_mod._update_fn(("k",), [_batch([(40, 0, 1, "b")])], state)
    )
    row = out[0].iloc[0]
    assert (row["clicks"], row["views"], row["categories_count"]) == (1, 1, 2)
