"""As-of (most-recent-prior) join — a temporal operator the reference
lacks (SURVEY §2.7: no joins at all) but every event/feature pipeline
needs: for each left row, attach the latest right row of the same key
with right.ts <= left.ts.

Spark has no ASOF JOIN primitive. The naive encodings both fail at
scale:

- range join (``l.ts >= r.ts`` + window to pick the max) explodes to
  O(|L| * |R|) intermediate rows per key before pruning;
- per-key ``collect_list`` + UDF search caps the key's history at
  executor memory.

The scalable encoding is union-tag-window: union both sides tagged
with a side marker, hash-shuffle ONCE on the key, sort each partition
by (ts, side, id), and carry the last-seen right row forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding running
window. One shuffle, one sort, no row multiplication — the same plan
shape Spark uses for any running aggregate, so it survives 100 TB
(state per partition is O(1) beyond the sort).

Ordering puts the right side BEFORE the left side at equal
timestamps, i.e. a right row with ts == left.ts is visible to that
left row ("at or before" semantics, matching e.g. pandas
``merge_asof(direction='backward')``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Attach to each ``left`` row the most recent ``right`` row per
    ``key`` with ``right_ts <= left_ts``.

    ``order_col`` must be unique per row on both sides (it breaks
    timestamp ties deterministically — required for oracle-stable
    output). Returned frame = all ``left`` columns plus each
    ``right_vals`` column (null when no prior right row exists).
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(order_col).alias("_ord"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_vals],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_lv_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(order_col).alias("_ord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_vals],
        *[F.col(c).alias(f"_lv_{c}") for c in lcols],
    )
    # right rows sort before left rows at equal ts => "at or before"
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = tagged_r.unionByName(tagged_l)
    carried = unioned.select(
        "_side",
        *[F.col(f"_lv_{c}").alias(c) for c in lcols],
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_vals
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")
