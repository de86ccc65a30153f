"""Streaming touch attribution: the continuous twin of the batch
``plans/timeseries_queries.attribution_daily_revenue`` RANGE-frame
query.

The batch form counts, for every purchase, the user's view/click
touches in the preceding 7 days via a time-bounded window frame — a
full per-user sort. A stream keeps instead a per-user list of touch
timestamps pruned to the lookback horizon via
``applyInPandasWithState`` (the T3 state API, streaming/state.py):
each purchase counts the retained touches strictly before it, then
every touch older than ``newest event - lookback`` is dropped — no
future purchase can ever count it, so pruning is lossless for
time-ordered streams (the same per-key ordering caveat as
streaming/enrich.py, pinned by the batch/stream equivalence test in
tests/test_streaming.py).

Scale: state per key is the touch timestamps inside one lookback
window — bounded by the horizon, not by history. For abusive keys
(bots clicking continuously) the retained list grows with touch rate;
the coarse form for that regime is per-hour touch counts (168 longs,
O(1)) at the cost of hour-granular frame edges — this module keeps
microsecond-exact edges to match the batch oracle bit-for-bit. One
shuffle per micro-batch (the user_id grouping); RocksDB holds the key
space.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LOOKBACK_US = 7 * 86400 * 1_000_000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
        T.StructField("n_touches", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("touch_us", T.ArrayType(T.LongType()))]
)


def _attribution_fn(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    touches: list[int] = list(state.get[0]) if state.exists else []
    frames = [pdf for pdf in pdf_iter if not pdf.empty]
    if not frames:
        return
        yield  # pragma: no cover - generator marker
    pdf = pd.concat(frames, ignore_index=True)
    # touches sort before purchases at equal timestamps, mirroring the
    # batch frame's exclusive upper bound ([-7d, -1 us]: a touch at the
    # purchase's own microsecond never counts); event_id breaks ties
    pdf["side"] = (pdf["event_type"] == "purchase").astype(int)
    pdf = pdf.sort_values(["ts_us", "side", "event_id"])
    out: dict[str, list] = {c: [] for c in OUTPUT_SCHEMA.fieldNames()}
    newest = touches[-1] if touches else 0
    for row in pdf.itertuples(index=False):
        t = int(row.ts_us)
        newest = max(newest, t)
        if row.side == 0:
            touches.append(t)
        else:
            lo = t - LOOKBACK_US
            out["event_id"].append(int(row.event_id))
            out["user_id"].append(int(key[0]))
            out["purchase_us"].append(t)
            out["n_touches"].append(sum(1 for u in touches if lo <= u < t))
            out["value"].append(float(row.value))
    # lossless prune: for a time-ordered stream every future purchase
    # has ts >= newest, so touches below newest - lookback are dead
    horizon = newest - LOOKBACK_US
    touches = sorted(u for u in touches if u >= horizon)
    if touches:
        state.update((touches,))
    elif state.exists:
        state.remove()
    if out["event_id"]:
        yield pd.DataFrame(
            {
                "event_id": pd.array(out["event_id"], dtype="Int64"),
                "user_id": pd.array(out["user_id"], dtype="Int64"),
                "purchase_us": pd.array(out["purchase_us"], dtype="Int64"),
                "n_touches": pd.array(out["n_touches"], dtype="Int64"),
                "value": pd.array(out["value"], dtype="float64"),
            }
        )


def stream_attribution(events: DataFrame) -> DataFrame:
    """Per-purchase lookback touch counts over a streaming events frame
    (columns: user_id, event_id, event_type, ts timestamp, value).
    Emits one row per purchase; ``n_touches`` is the number of
    view/click events by the same user in ``(ts - 7d, ts)``."""
    prepared = events.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _attribution_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
