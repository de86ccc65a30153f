"""Unit tests for the pure state-transition logic behind
``applyInPandasWithState`` (streaming/state.py) — the append / prune /
re-aggregate / classify semantics of the DStream path
(ImplDStreams.scala:90-110 intent, with the inverted prune fixed).
"""

from __future__ import annotations

import pandas as pd

from in_stream_processing_course_spark.streaming.state import (
    classify_merged,
    merge_history,
    summarize,
)


def batch(rows):
    return pd.DataFrame(
        {
            "time": pd.to_datetime([r[0] for r in rows], unit="s"),
            "clicks": [r[1] for r in rows],
            "views": [r[2] for r in rows],
            "category": [r[3] for r in rows],
        }
    )


def test_merge_buckets_and_accumulate():
    state = merge_history(None, batch([(0, 1, 0, "a"), (10, 0, 1, "b")]))
    # both rows in bucket 0 (30-s grain)
    assert state[0] == [0]
    assert state[1] == [1] and state[2] == [1]
    assert state[3] == ['["a", "b"]']
    # second batch appends a later bucket and merges categories
    state2 = merge_history(state, batch([(35, 2, 0, "a")]))
    assert state2[0] == [0, 30]
    assert summarize(state2) == (3, 1, 2)


def test_prune_trailing_window():
    """Buckets older than (max - window + slide) are evicted — the
    documented INTENT of the reference's inverted filter."""
    state = merge_history(None, batch([(0, 1, 0, "a")]))
    state = merge_history(state, batch([(700, 1, 0, "b")]), window_sec=600, slide_sec=30)
    # bucket 0 is outside [690 - 570, 690] -> pruned
    assert state[0] == [690]
    assert summarize(state) == (1, 0, 1)


def test_classifier_parity_with_column_version():
    assert classify_merged(1001, 0, 1) == (True, "requests")
    assert classify_merged(500, 501, 1) == (True, "requests")
    assert classify_merged(10, 10, 6) == (True, "categories")
    assert classify_merged(61, 10, 2) == (True, "clicks/views")  # 61//10=6
    assert classify_merged(55, 10, 2) == (False, "clear")  # 55//10=5, not >5
    assert classify_merged(1000, 0, 5) == (True, "clicks/views")  # ratio 1000
    assert classify_merged(0, 0, 0) == (False, "clear")


def test_integer_division_edge():
    # clicks = 6*views - 1 -> floor ratio 5 -> clear
    assert classify_merged(59, 10, 1) == (False, "clear")
    # exactly 6x -> ratio 6 -> bot
    assert classify_merged(60, 10, 1) == (True, "clicks/views")


def test_state_output_dtypes():
    """r13: _update_fn emits via a pre-typed template frame (fixed
    ~250us dict-ctor overhead per (key,trigger) cut to ~95us). The
    template's dtypes must match what the old dict-of-lists ctor
    produced, or Arrow re-coerces (or rejects) every emission."""
    import numpy as np

    from in_stream_processing_course_spark.streaming.state import (
        _OUT_TEMPLATE,
        _update_fn,
    )

    legacy = pd.DataFrame(
        {
            "ip": ["k"],
            "clicks": [10],
            "views": [20],
            "categories_count": [3],
            "is_bot": [True],
            "reason": ["r"],
        }
    )
    assert list(_OUT_TEMPLATE.columns) == list(legacy.columns)
    assert list(_OUT_TEMPLATE.dtypes) == list(legacy.dtypes)

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.v = v

        def setTimeoutDuration(self, ms):
            pass

    out = list(
        _update_fn(("1.2.3.4",), iter([batch([(0, 5, 1, "a")])]), FakeState())
    )
    assert len(out) == 1
    row = out[0]
    assert list(row.dtypes) == list(legacy.dtypes)
    assert row.iat[0, 0] == "1.2.3.4"
    assert row.iat[0, 1] == 5 and row.iat[0, 2] == 1
    assert row.iat[0, 3] == 1
    assert row.iat[0, 4] == np.False_ and row.iat[0, 5] == "clear"
