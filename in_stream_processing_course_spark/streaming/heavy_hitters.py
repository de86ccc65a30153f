"""Approximate streaming heavy hitters per key group — the
Space-Saving summary (Metwally, Agrawal, El Abbadi, ICDT 2005) as an
``applyInPandasWithState`` operator.

Exact per-item counts over an unbounded stream need unbounded state;
the reference sidesteps this by windowing (its category sets are
bounded per window). Space-Saving keeps a FIXED ``capacity`` of
counters per group with hard guarantees after n observations:

- every tracked item's estimate overcounts: true <= est <= true + err,
  with per-item error bound ``err`` tracked exactly;
- any item with true frequency > n / capacity is guaranteed tracked
  (no false negatives above the threshold).

Batch-increment variant: arriving counts fold per micro-batch
(value_counts, vectorized) instead of one update per row; replacing
the minimum counter with (min + c, error=min) preserves both
guarantees. State per group is three parallel arrays + the observation
total — O(capacity), Arrow-friendly, RocksDB-ready, same layout
discipline as streaming/state.py.

Update mode: each micro-batch re-emits the group's current summary;
downstream keyed upsert (sinks/upsert.py) keeps the latest per
(group, item).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("count_est", T.LongType()),
        T.StructField("error_bound", T.LongType()),
        T.StructField("n_observed", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errors", T.ArrayType(T.LongType())),
        T.StructField("total", T.LongType()),
    ]
)


def space_saving_fold(
    summary: dict[str, tuple[int, int]], arrivals: dict[str, int],
    capacity: int,
) -> dict[str, tuple[int, int]]:
    """Fold one batch of (item -> count) arrivals into a Space-Saving
    summary {item: (count_est, error)}. Pure function — unit-testable
    without Spark, mirrored by the state operator below."""
    # deterministic fold order: arrival count desc, then item — makes
    # replacement choices reproducible across runs/engines
    for item, c in sorted(arrivals.items(), key=lambda kv: (-kv[1], kv[0])):
        if item in summary:
            est, err = summary[item]
            summary[item] = (est + c, err)
        elif len(summary) < capacity:
            summary[item] = (c, 0)
        else:
            # evict the minimum-estimate counter (ties: lexicographic
            # item for determinism); inherit its estimate as error
            victim = min(summary, key=lambda i: (summary[i][0], i))
            vmin = summary[victim][0]
            del summary[victim]
            summary[item] = (vmin + c, vmin)
    return summary


def _make_update_fn(capacity: int):
    def update(
        key: tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            items, counts, errors, total = state.get
            summary = {
                i: (int(c), int(e))
                for i, c, e in zip(items, counts, errors)
            }
            total = int(total)
        else:
            summary, total = {}, 0

        for pdf in pdfs:
            arrivals = pdf["item"].value_counts().to_dict()
            total += int(sum(arrivals.values()))
            summary = space_saving_fold(summary, arrivals, capacity)

        order = sorted(summary.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(
            (
                [i for i, _ in order],
                [c for _, (c, _) in order],
                [e for _, (_, e) in order],
                total,
            )
        )
        yield pd.DataFrame(
            {
                "group": [key[0]] * len(order),
                "item": [i for i, _ in order],
                "count_est": [c for _, (c, _) in order],
                "error_bound": [e for _, (_, e) in order],
                "n_observed": [total] * len(order),
            }
        )

    return update


def heavy_hitters_stream(
    df: DataFrame,
    group_col: str,
    item_col: str,
    capacity: int = 16,
) -> DataFrame:
    """Per-``group_col`` Space-Saving summary of ``item_col`` with at
    most ``capacity`` tracked items per group (streaming DataFrames;
    ``applyInPandasWithState`` is streaming-only — the batch-equivalent
    answer is a plain exact groupBy count, which the tests use as the
    ground truth)."""
    keyed = df.selectExpr(
        f"CAST({group_col} AS STRING) AS group",
        f"CAST({item_col} AS STRING) AS item",
    ).where(F.col("item").isNotNull())
    # nulls are excluded EXPLICITLY so n_observed counts exactly the
    # rows the summary saw (pandas value_counts silently drops NaN —
    # an invisible filter would skew the n/capacity guarantee)
    return keyed.groupBy("group").applyInPandasWithState(
        _make_update_fn(capacity),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
