"""Streaming as-of enrichment: attach each click's most recent view
— the continuous analog of ``operators/asof.asof_join_backward``.

The batch as-of join sorts the whole history per key; a stream cannot.
Instead this keeps O(1) state per key (the latest view's id and
timestamp) via ``applyInPandasWithState`` — the same state API the T3
keyed-history operator uses (streaming/state.py), here with the
simplest possible state shape. Within a micro-batch rows are
processed in (ts, side, id) order with views before clicks at equal
timestamps — exactly the batch operator's visibility rule — so a
time-ordered stream converges to the batch result (equivalence
pinned in tests/test_streaming.py).

Scale: state per key is two longs (vs the batch sort's full history);
shuffled once on the grouping key per micro-batch. RocksDB state
store holds the key space; no timeout is set because "latest view"
never expires (add one if the key space is unbounded and stale
enrichment is acceptable).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("click_us", T.LongType()),
        T.StructField("view_event_id", T.LongType()),
        T.StructField("view_us", T.LongType()),
        T.StructField("wait_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("view_event_id", T.LongType()),
        T.StructField("view_us", T.LongType()),
    ]
)


def _enrich_fn(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    vid, vus = state.get if state.exists else (None, None)
    frames = [pdf for pdf in pdf_iter if not pdf.empty]
    if not frames:
        return
        yield  # pragma: no cover - generator marker
    pdf = pd.concat(frames, ignore_index=True)
    # views sort before clicks at equal ts (the batch operator's
    # at-or-before rule); event_id breaks remaining ties
    pdf["side"] = (pdf["event_type"] == "click").astype(int)
    pdf = pdf.sort_values(["ts_us", "side", "event_id"])
    out: dict[str, list] = {c: [] for c in OUTPUT_SCHEMA.fieldNames()}
    for row in pdf.itertuples(index=False):
        if row.side == 0:
            vid, vus = int(row.event_id), int(row.ts_us)
        else:
            click_us = int(row.ts_us)
            out["event_id"].append(int(row.event_id))
            out["user_id"].append(int(key[0]))
            out["click_us"].append(click_us)
            out["view_event_id"].append(vid)
            out["view_us"].append(vus)
            out["wait_us"].append(None if vus is None else click_us - vus)
    if vid is not None:
        state.update((vid, vus))
    if out["event_id"]:
        yield pd.DataFrame(
            {c: pd.array(v, dtype="Int64") for c, v in out.items()}
        )


def stream_asof_last_view(events: DataFrame) -> DataFrame:
    """Per-user latest-view enrichment over a streaming events frame
    (columns: user_id, event_id, event_type, ts timestamp). Emits one
    row per click; ``view_*`` columns are null when the user has no
    view yet."""
    prepared = events.where(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _enrich_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
