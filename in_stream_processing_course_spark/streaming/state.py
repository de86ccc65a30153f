"""T3 — long-horizon keyed state with idle timeout via
``applyInPandasWithState``.

This is the one reference operator Structured Streaming's windowed
aggregation alone does not express: the DStream path keeps a per-ip
TRAILING-10-MINUTE HISTORY across micro-batches (``mapWithState`` over
``State[List[(IpStat, Long)]]``, ImplDStreams.scala:90-110), judges
the key on its merged history every batch, and evicts keys idle for
10 minutes (``StateSpec...timeout(10 min)``, ImplDStreams.scala:121;
``isTimingOut`` guard :94-96).

We implement the documented *intent* — the reference's expiry filter
is inverted (keeps old entries, SURVEY §1.4.4) and mixes time units;
ours prunes correctly.

State layout: per key, parallel arrays (bucket epoch-sec, clicks,
views, categories-json) — flat arrays keep the state schema simple
and Arrow-friendly. Buckets floor event time to ``slide_sec``
(ImplDStreams.scala:80-84's bucketTime).

Scale: state is hash-partitioned by key in the state store (RocksDB
provider on a cluster); each key's state is bounded by
window/slide buckets x distinct categories.
"""

from __future__ import annotations

import json
from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.classifier import (
    CATEGORY_LIMIT,
    CLICKS_TO_VIEWS_LIMIT,
    REASON_CATEGORIES,
    REASON_CLEAR,
    REASON_RATIO,
    REASON_REQUESTS,
    REQUEST_LIMIT,
)

WINDOW_SEC = 600  # 10-min history horizon (DStreamConfig, ImplDStreams.scala:16)
SLIDE_SEC = 30  # bucket grain (BATCH_INTERVAL, ImplDStreams.scala:14)
TIMEOUT_SEC = 600  # idle-key eviction (ImplDStreams.scala:121)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("ip", T.StringType()),
        T.StructField("clicks", T.LongType()),
        T.StructField("views", T.LongType()),
        T.StructField("categories_count", T.LongType()),
        T.StructField("is_bot", T.BooleanType()),
        T.StructField("reason", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("clicks", T.ArrayType(T.LongType())),
        T.StructField("views", T.ArrayType(T.LongType())),
        T.StructField("categories_json", T.ArrayType(T.StringType())),
    ]
)


def classify_merged(
    clicks: int, views: int, categories_count: int
) -> tuple[bool, str]:
    """Pure-python classifier mirror (Common.scala:25-50) for the
    state path; same integer-division / precedence semantics as the
    Column version in functions.classifier."""
    requests = clicks + views
    ratio = clicks // max(views, 1)
    if requests > REQUEST_LIMIT:
        return True, REASON_REQUESTS
    if categories_count > CATEGORY_LIMIT:
        return True, REASON_CATEGORIES
    if ratio > CLICKS_TO_VIEWS_LIMIT:
        return True, REASON_RATIO
    return False, REASON_CLEAR


def merge_history(
    state: tuple[list, list, list, list] | None,
    batch: pd.DataFrame,
    window_sec: int = WINDOW_SEC,
    slide_sec: int = SLIDE_SEC,
) -> tuple[list, list, list, list]:
    """Pure state-transition function (unit-testable without Spark):
    bucket the batch rows, merge into the per-key history, prune
    buckets older than (max bucket - window). Fixes the reference's
    inverted prune (SURVEY §1.4.4: intent = keep trailing window).
    """
    hist: dict[int, list[Any]] = {}
    if state is not None:
        for b, c, v, cats in zip(*state):
            hist[int(b)] = [int(c), int(v), set(json.loads(cats))]
    if len(batch) > 0:
        epoch = (batch["time"].astype("int64") // 10**9).to_numpy()
        buckets = (epoch // slide_sec) * slide_sec
        for b, c, v, cat in zip(
            buckets, batch["clicks"].to_numpy(), batch["views"].to_numpy(),
            batch["category"].to_numpy(),
        ):
            slot = hist.setdefault(int(b), [0, 0, set()])
            slot[0] += int(c)
            slot[1] += int(v)
            if cat is not None:
                slot[2].add(str(cat))
    if hist:
        horizon = max(hist) - (window_sec - slide_sec)
        hist = {b: s for b, s in hist.items() if b >= horizon}
    keys = sorted(hist)
    return (
        keys,
        [hist[b][0] for b in keys],
        [hist[b][1] for b in keys],
        [json.dumps(sorted(hist[b][2])) for b in keys],
    )


def summarize(state: tuple[list, list, list, list]) -> tuple[int, int, int]:
    """Re-aggregate a key's retained history (EvaluatedStat.classify,
    Common.scala:63-70: reduce(_+_) then classify)."""
    buckets, clicks, views, cats_json = state
    total_clicks = sum(clicks)
    total_views = sum(views)
    cats: set[str] = set()
    for cj in cats_json:
        cats.update(json.loads(cj))
    return total_clicks, total_views, len(cats)


def _update_fn(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        # isTimingOut guard (ImplDStreams.scala:94-96): no emission
        state.remove()
        return
        yield  # pragma: no cover - makes this a generator
    current = state.get if state.exists else None
    merged = current
    for pdf in pdf_iter:
        merged = merge_history(merged, pdf)
    if merged is None:
        return
    state.update(tuple(merged))
    state.setTimeoutDuration(TIMEOUT_SEC * 1000)
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


def keyed_history_verdicts(log_records: DataFrame) -> DataFrame:
    """Streaming per-key verdict over the trailing 10-minute history
    (the DStream pipeline ImplDStreams.scala:86-125 as one operator).

    Input: LogRecord-shaped streaming DataFrame
    (ip, time, clicks, views, category). Output: one verdict row per
    active key per micro-batch (update semantics).
    """
    return log_records.groupBy("ip").applyInPandasWithState(
        _update_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
