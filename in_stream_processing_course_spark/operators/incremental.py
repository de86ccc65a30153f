"""Incremental aggregate maintenance — mergeable partial rollups.

The materialized-view pattern a 100 TB pipeline lives by: a day's new
partition arrives, gets aggregated ALONE, and the partial is merged
into the standing rollup — history is never rescanned. That only
works for ALGEBRAIC aggregates, i.e. ones with an associative,
commutative merge over a bounded partial state:

    count   -> sum of partial counts
    sum     -> sum of partial sums
    min/max -> min/max of partials
    avg     -> (sum, count) pair, finalized at read time
    distinct-count -> NOT algebraic exactly; use an HLL sketch partial
                      (see plans/timeseries_queries approx family)

``partial_rollup`` produces the per-chunk state, ``merge_rollups``
folds any number of partials, ``finalize_rollup`` derives the
presentation columns. Merge is one hash aggregate on the group keys —
the merged side is rollup-sized (|distinct keys|), not data-sized, so
the incremental path shuffles only the new partition's partial.
Batch-boundary invariance (merge of per-chunk partials == one-shot
aggregate, for ANY chunking) is exactly the map-side-combine algebra
Spark itself uses inside a shuffle, lifted to cross-job granularity;
it is hash-pinned against a one-shot DuckDB oracle in the registry
(``incremental_daily_rollup``) and property-tested over random
chunkings in tests/test_round6_ops.py.

Reference scope: extension surface (no analog in the reference
course); the same merge algebra backs its windowed IpStat monoid
(Common.scala IpStat |+|) — this is that idea applied to batch MV
maintenance.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# partial-state columns produced per (chunk, group): bounded, mergeable
_STATE = ["n_events", "sum_value", "min_value", "max_value"]


def partial_rollup(chunk: DataFrame, group_cols: list[str]) -> DataFrame:
    """Aggregate ONE chunk (e.g. a newly-arrived partition) to partial
    state. Map-side combine applies; output is |keys|-sized."""
    return chunk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_rollups(
    partials: list[DataFrame], group_cols: list[str]
) -> DataFrame:
    """Fold partial states: union (cheap, no shuffle) then ONE hash
    aggregate with each state column's merge function. Associative +
    commutative, so chunk arrival order and grouping cannot change the
    result."""
    unioned = reduce(DataFrame.unionByName, partials)
    return unioned.groupBy(*group_cols).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def finalize_rollup(rollup: DataFrame) -> DataFrame:
    """Presentation pass: derive avg from the (sum, count) state and
    round the float columns onto the 2-dp value grid's safe 4-dp
    boundary (see events_queries NOTE on order-robust rounding)."""
    return rollup.select(
        *[c for c in rollup.columns if c not in _STATE],
        F.col("n_events"),
        F.round("sum_value", 4).alias("sum_value"),
        # divide the ALREADY-ROUNDED sum and do NOT round the
        # quotient: both engines divide bit-identical doubles (IEEE
        # division is deterministic), whereas rounding the quotient
        # hits engine-divergent decimal ties (307.03/8 = 38.37875
        # rounds HALF_UP via BigDecimal in Spark but down via float
        # scaling in DuckDB)
        (F.round("sum_value", 4) / F.col("n_events")).alias("avg_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
    )
