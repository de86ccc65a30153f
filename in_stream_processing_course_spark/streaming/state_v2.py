"""T3 on Spark 4's transformWithStateInPandas — the modern stateful
API (SPARK-49564): typed state variables (ValueState) + explicit
timers, replacing applyInPandasWithState's single-struct state and
implicit timeout. Same semantics as :mod:`.state` (the reference's
``mapWithState`` intent, ImplDStreams.scala:90-125): per-ip
trailing-10-minute bucket history, verdict on the merged history each
batch, idle keys evicted after 10 minutes of silence.

The state-transition core (merge_history / summarize /
classify_merged) is shared with the v1 operator, so both APIs are
proven equivalent by construction plus the cross-check test.

Requires the RocksDB state store provider (transformWithState is not
supported on the default HDFS-backed store) — at 100 TB that is the
right provider anyway (session.CLUSTER_SCALE_CONF) — and a working
``google.protobuf`` in the Python workers (the transformWithState
runner's wire protocol); tests/test_state_v2.py gates on both.

The v1 operator (:mod:`.state`) is the DEFAULT path by measurement,
not just by seniority: the r10 controlled same-host A/B
(tools/stateful_ab.py, STATEFUL_AB_r10.md — min-wall over interleaved
rounds at two key cardinalities, both APIs on RocksDB) has v1 at
5,603/5,403 rows/s vs v2's 3,822/4,889 — the r9 bench reading where
v2 edged v1 was load skew on the shared host. This module stays the
forward-compatible surface sharing the same transition core; re-run
the A/B before switching when the transformWithState Python transport
matures.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .state import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    TIMEOUT_SEC,
    classify_merged,
    merge_history,
    summarize,
)


class KeyedHistoryProcessor(StatefulProcessor):
    """Per-key trailing-history verdicts with idle-timer eviction."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.history = handle.getValueState("history", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        merged = self.history.get() if self.history.exists() else None
        for pdf in rows:
            merged = merge_history(merged, pdf)
        if merged is None:
            return
        self.history.update(tuple(merged))
        # sliding idle timer: drop any previously registered timer and
        # arm a fresh one TIMEOUT_SEC from now — the timer only fires
        # for keys that stay silent the whole interval
        for old in self.handle.listTimers():
            self.handle.deleteTimer(old)
        self.handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + TIMEOUT_SEC * 1000
        )
        clicks, views, cat_count = summarize(merged)
        is_bot, reason = classify_merged(clicks, views, cat_count)
        yield pd.DataFrame(
            {
                "ip": [key[0]],
                "clicks": [clicks],
                "views": [views],
                "categories_count": [cat_count],
                "is_bot": [is_bot],
                "reason": [reason],
            }
        )

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # isTimingOut guard (ImplDStreams.scala:94-96): evict silently
        self.history.clear()
        return iter(())

    def close(self) -> None:
        pass


def keyed_history_verdicts_v2(log_records: DataFrame) -> DataFrame:
    """Drop-in equivalent of :func:`.state.keyed_history_verdicts` on
    the transformWithState API. Input: LogRecord-shaped streaming
    DataFrame (ip, time, clicks, views, category); output: one verdict
    row per active key per micro-batch (update semantics).
    """
    return log_records.groupBy("ip").transformWithStateInPandas(
        statefulProcessor=KeyedHistoryProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
