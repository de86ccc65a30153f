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
v2 edged v1 was load skew on the shared host.

WHERE the gap lives, profiled r12 (STATEFUL_AB_r12.md,
``tools/stateful_ab.py --profile`` — batch-count and key-cardinality
sweeps, fit wall = c + a·triggers + g·(keys·triggers)): both APIs are
dominated by per-(key, trigger) state work, but v2 pays ~35% more per
key-trigger (0.79 vs 0.59 ms — every ValueState/timer op is its own
state-server socket round trip, where v1 ships each group's whole
state inside the data's Arrow batch) plus ~1.5 s of per-trigger
protocol setup/drain v1 doesn't have. ADJUDICATION: the premium buys
multiple independently-lifecycled state variables, fine-grained
timers, and state-schema evolution — none needed by this operator's
single-struct history, so v1 stays default; the cost is transport
maturity, not semantics — re-profile when the transformWithState
Python protocol batches state ops per key-group (the deep-drip b16
config is the sensitive detector).
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

from pyspark.sql import types as T

from .state import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    TIMEOUT_SEC,
    _OUT_TEMPLATE,
    classify_merged,
    merge_history,
    summarize,
)

# event-time mode's second state variable: the key's true last-seen
# event time in ms (the idle-timer base)
LAST_SEEN_SCHEMA = T.StructType([T.StructField("last_ms", T.LongType())])


class KeyedHistoryProcessor(StatefulProcessor):
    """Per-key trailing-history verdicts with idle-timer eviction.

    Two timeout modes (r11, VERDICT r10 next-round #3):

    - ``event_time=False`` (default): PROCESSING-time idle timer —
      faithful to the reference (``StateSpec...timeout(10 min)``,
      ImplDStreams.scala:121). Correct for live ingestion where
      arrival time ≈ event time: a key is evicted 10 wall-clock
      minutes after its last arrival.
    - ``event_time=True``: EVENT-time eviction — evict when the
      WATERMARK passes last-seen-event-time + 10 min. This is the
      replay-safe form: during a 100 TB backfill / catch-up replay the
      wall clock races ahead of event time, so a processing-time timer
      would evict every key mid-replay (hours of events arrive in
      wall-clock seconds, then ANY >10-wall-minute stall purges state
      that is still live in event time); conversely idle keys are
      evicted as soon as the data itself proves 10 event-minutes of
      silence, regardless of how fast the replay runs. The timer
      target is data-derived (max event time seen for the key), so a
      re-run of the same data evicts at the same points — replay-safe.

    Rule of thumb: processing-time for steady live streams (matches
    the reference), event-time wherever the stream can lag, stall, or
    be replayed — i.e. any at-scale deployment with backfills."""

    def __init__(self, event_time: bool = False) -> None:
        self.event_time = event_time

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.history = handle.getValueState("history", STATE_SCHEMA)
        if self.event_time:
            # last event time seen for the key (ms) — the timer base.
            # A separate ValueState rather than max(buckets): buckets
            # are floored to SLIDE_SEC, and eviction should key off the
            # true last-seen instant, matching v1's "10 min after the
            # last ARRIVAL" semantics transposed to event time.
            self.last_seen = handle.getValueState("last_seen", LAST_SEEN_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        merged = self.history.get() if self.history.exists() else None
        batch_max_ms = -1
        for pdf in rows:
            if self.event_time and len(pdf) > 0:
                # zero-copy ns->ms view, same rationale as v1 (r13 §4.4)
                batch_max_ms = max(
                    batch_max_ms,
                    int(pdf["time"].to_numpy(dtype="datetime64[ns]").view("int64").max()) // 10**6,
                )
            merged = merge_history(merged, pdf)
        if merged is None:
            return
        self.history.update(tuple(merged))
        # sliding idle timer: drop any previously registered timer and
        # arm a fresh one TIMEOUT_SEC past the mode's clock — the timer
        # only fires for keys that stay silent the whole interval
        for old in self.handle.listTimers():
            self.handle.deleteTimer(old)
        if self.event_time:
            prev = self.last_seen.get()[0] if self.last_seen.exists() else -1
            last = max(prev, batch_max_ms)
            self.last_seen.update((last,))
            # fires when the WATERMARK passes last + timeout
            self.handle.registerTimer(last + TIMEOUT_SEC * 1000)
        else:
            self.handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + TIMEOUT_SEC * 1000
            )
        clicks, views, cat_count = summarize(merged)
        is_bot, reason = classify_merged(clicks, views, cat_count)
        out = _OUT_TEMPLATE.copy()
        out.iat[0, 0] = key[0]
        out.iat[0, 1] = clicks
        out.iat[0, 2] = views
        out.iat[0, 3] = cat_count
        out.iat[0, 4] = is_bot
        out.iat[0, 5] = reason
        yield out

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # isTimingOut guard (ImplDStreams.scala:94-96): evict silently
        self.history.clear()
        if self.event_time:
            self.last_seen.clear()
        return iter(())

    def close(self) -> None:
        pass


def keyed_history_verdicts_v2(
    log_records: DataFrame,
    event_time: bool = False,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Drop-in equivalent of :func:`.state.keyed_history_verdicts` on
    the transformWithState API. Input: LogRecord-shaped streaming
    DataFrame (ip, time, clicks, views, category); output: one verdict
    row per active key per micro-batch (update semantics).

    ``event_time=True`` switches idle-key eviction from the wall clock
    to the watermark (see :class:`KeyedHistoryProcessor` for when each
    mode is correct); it sets a watermark of ``watermark_delay`` on
    ``time`` (required by the EventTime timeMode, and the knob that
    tolerates out-of-order arrival during backfills — late rows inside
    the delay still merge; the watermark, hence eviction, only
    advances as far as the data minus the delay). Note the standard
    watermark contract: rows at event time <= the current watermark
    are dropped as late BEFORE reaching the processor — size
    ``watermark_delay`` to the deployment's real out-of-orderness
    (the processing-time mode never drops input)."""
    if event_time:
        log_records = log_records.withWatermark("time", watermark_delay)
    return log_records.groupBy("ip").transformWithStateInPandas(
        statefulProcessor=KeyedHistoryProcessor(event_time=event_time),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime" if event_time else "ProcessingTime",
    )
