"""Streaming three-step funnel: the continuous (CEP-style) form of
the batch ``funnel_three_step`` query — per-user sequence matching
view -> click -> purchase with EVENTUALLY-AFTER semantics, as a keyed
stage machine in ``applyInPandasWithState``.

The batch query re-derives each stage with a conditional-min join
chain; the stream never re-reads history — the entire match state is
three optional epoch-micros per user, advanced monotonically:

- a ``view`` arms the funnel (first one wins);
- a ``click`` advances stage 2 iff the funnel is armed and stage 2 is
  empty — by time order that click IS min(click_us >= view_us);
- a ``purchase`` advances stage 3 iff stage 2 is set, symmetrically.

Within a micro-batch rows are processed in (ts, stage-rank, event_id)
order (view before click before purchase at equal timestamps), which
reproduces the batch ``>=`` comparisons exactly — so on a
time-ordered stream the final emission per user equals the batch row
bit-for-bit (pinned in tests/test_streaming_funnel.py).

Scale: one shuffle per micro-batch on user_id; O(1) state per key
(three longs); no timeout — a funnel stays armed indefinitely (add
one to bound the key space if product semantics allow expiry).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STAGE_RANK = {"view": 0, "click": 1, "purchase": 2}

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("view_us", T.LongType()),
        T.StructField("click_us", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("view_us", T.LongType()),
        T.StructField("click_us", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
    ]
)


def _funnel_fn(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    v, c, p = state.get if state.exists else (None, None, None)
    frames = [pdf for pdf in pdf_iter if not pdf.empty]
    if not frames:
        return
        yield  # pragma: no cover - generator marker
    pdf = pd.concat(frames, ignore_index=True)
    pdf["rank"] = pdf["event_type"].map(_STAGE_RANK)
    pdf = pdf.sort_values(["ts_us", "rank", "event_id"])
    for row in pdf.itertuples(index=False):
        us = int(row.ts_us)
        if row.rank == 0:
            if v is None:
                v = us
        elif row.rank == 1:
            if v is not None and c is None and us >= v:
                c = us
        else:
            if c is not None and p is None and us >= c:
                p = us
    state.update((v, c, p))
    if v is None:
        return  # funnel not armed yet: no batch-query row exists either
    yield pd.DataFrame(
        {
            "user_id": pd.array([int(key[0])], dtype="Int64"),
            "view_us": pd.array([v], dtype="Int64"),
            "click_us": pd.array([c], dtype="Int64"),
            "purchase_us": pd.array([p], dtype="Int64"),
        }
    )


def stream_funnel_three_step(events: DataFrame) -> DataFrame:
    """Per-user streaming funnel over an events stream (columns:
    user_id, event_id, event_type, ts timestamp). Emits the user's
    current stage timestamps each micro-batch the user appears in
    once the funnel is armed (a view has been seen)."""
    prepared = events.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
