"""Streaming SCD2 maintenance: the continuous twin of
``operators/scd.scd2_apply`` (X6), keeping each key's current
dimension version in O(1) keyed state and emitting version rows as
transitions arrive.

State per key is THREE scalars (current attr, its valid_from, its
version number) — against the batch operator's full-history window
sort. Each micro-batch processes a key's rows in (ts, seq) order:
an attr change closes the open version (emits its final form, with
``valid_to`` and ``is_current=False``) and opens a new one (emitted
with ``valid_to`` NULL); re-sent unchanged attrs are no-ops, exactly
the batch operator's lag-suppression. Update output mode re-emits a
version row when its final form supersedes the open form — a
downstream keyed upsert on (key, version) converges to precisely the
batch SCD2 table, which is what the batch/stream equivalence test
pins (last emission per (key, version) == ``scd2_apply`` output on
the same change stream).

Same contract as the batch operator: at most one change per
(key, ts), time-ordered within/across batches for a given key (late
changes are a restatement — rebuild from the log).
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
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("valid_from", T.LongType()),
        T.StructField("valid_to", T.LongType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("is_current", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_type", T.StringType()),
        T.StructField("valid_from", T.LongType()),
        T.StructField("version", T.IntegerType()),
    ]
)


def _scd2_fn(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    cur_type, valid_from, version = (
        state.get if state.exists else (None, None, 0)
    )
    frames = [pdf for pdf in pdf_iter if not pdf.empty]
    if not frames:
        return
        yield  # pragma: no cover - generator marker
    pdf = pd.concat(frames, ignore_index=True).sort_values(
        ["ts_us", "event_id"]
    )
    out: dict[str, list] = {c: [] for c in OUTPUT_SCHEMA.fieldNames()}

    def emit(etype, vfrom, vto, ver, current):
        out["user_id"].append(int(key[0]))
        out["event_type"].append(etype)
        out["valid_from"].append(vfrom)
        out["valid_to"].append(vto)
        out["version"].append(ver)
        out["is_current"].append(current)

    for row in pdf.itertuples(index=False):
        ts = int(row.ts_us)
        if cur_type is None:
            cur_type, valid_from, version = row.event_type, ts, 1
            emit(cur_type, valid_from, None, version, True)
        elif row.event_type != cur_type:
            emit(cur_type, valid_from, ts, version, False)  # close
            cur_type, valid_from, version = (
                row.event_type, ts, version + 1,
            )
            emit(cur_type, valid_from, None, version, True)  # open
        # else: no-op re-send, suppressed
    state.update((cur_type, valid_from, version))
    if out["user_id"]:
        yield pd.DataFrame(
            {
                "user_id": pd.array(out["user_id"], dtype="Int64"),
                "event_type": out["event_type"],
                "valid_from": pd.array(out["valid_from"], dtype="Int64"),
                "valid_to": pd.array(out["valid_to"], dtype="Int64"),
                "version": pd.array(out["version"], dtype="Int32"),
                "is_current": out["is_current"],
            }
        )


def stream_scd2_user_type(events: DataFrame) -> DataFrame:
    """SCD2 version rows from a streaming events frame (columns:
    user_id, event_id, event_type, ts timestamp). Shuffles once on
    user_id per micro-batch; no timeout — dimension state never
    expires (add one if keys churn out of scope)."""
    prepared = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _scd2_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
