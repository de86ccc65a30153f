"""Distributed global ranks over corpus-growing rollups — the
two-phase prefix-rank/prefix-sum operator behind the Pareto curve,
RFM ntiles, and revenue quartiles (VERDICT r8 next-round #1).

A partition-less ``Window.orderBy(...)`` moves EVERY input row through
one task — fine for an enum/calendar-sized rollup, a single-machine
sort for a per-customer/per-supplier one (~15 M rows at TPC-H sf100,
growing with the corpus). This operator assembles the identical global
rank in two distributed phases, following the repo's
``_balanced_shard_assignments`` pattern but generalized to CONTINUOUS
keys:

1. **Deterministic range bucketing.** Collect N-quantile boundaries of
   the rank key (one ``approx_percentile`` sketch — N-1 doubles, a
   model-sized driver crossing) and bucket each row by how many
   boundaries beat its key. The bucket id is a pure function of the
   key and a driver-side literal, so every plan branch agrees on the
   assignment — unlike ``spark_partition_id()`` after
   ``repartitionByRange``, where each physical exchange re-samples its
   own boundaries and two branches of the same plan can disagree
   unless exchange reuse happens to kick in. Rows with EQUAL keys
   always share a bucket, so tie-breaks resolve inside one local
   window.
2. **Local rank + bounded offsets.** ``row_number`` (and any requested
   decimal prefix sums) run per-bucket — ~rows/N per task. Per-bucket
   totals (≤ N rows, N = the shuffle-partition config, a constant not
   a corpus function) get cumulative offsets through a window over
   those N rows and broadcast back: global = offset + local.

Boundary placement (an approx sketch) affects BALANCE only: the
assembled rank is the same unique total order whatever the boundaries,
so results are bit-identical to the one-window form — decimal addition
is exact and associative, and ``exact_ntile`` below reproduces Spark's
ntile arithmetic from (rank, n) exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def two_phase_rank(
    spark: SparkSession,
    df: DataFrame,
    key: str,
    tiebreak: str,
    desc: bool = True,
    rank_name: str = "rank",
    n_name: str = "n",
    prefix_sums: dict[str, str] | None = None,
    n_ranges: int | None = None,
) -> DataFrame:
    """Append the global ``row_number`` over ``(key DESC|ASC, tiebreak
    ASC)`` plus the total row count — and, for each ``out_name ->
    col_name`` in ``prefix_sums``, the running sum of ``col_name`` in
    that order (inclusive of the current row; exact for
    decimal/integer columns) — without ever passing corpus-scale rows
    through a single-partition window.

    ``key`` must be numeric (cast to double for bucketing only — rank
    comparisons use the original column), ``(key, tiebreak)`` must be
    a unique total order, and both must be NON-NULL: a NULL key would
    bucket to range 0 (every boundary comparison is false) while the
    window order sorts it last — every registered caller ranks an
    aggregate (sum/count/max), which cannot be NULL.
    """
    prefix_sums = prefix_sums or {}
    if n_ranges is None:
        n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions"))
    qs = [i / n_ranges for i in range(1, n_ranges)]
    row = df.agg(
        F.percentile_approx(F.col(key).cast("double"), qs, 1000).alias("b")
    ).head()
    bounds = sorted(set(row["b"] or [])) if row is not None else []
    key_d = F.col(key).cast("double")
    if bounds:
        # plain CASE-sum (no higher-order function: a lambda inside a
        # grouping expression trips an executor-side attribute-binding
        # bug when the optimizer inlines it under the offsets window)
        terms = [
            F.when(
                (F.lit(float(b)) > key_d)
                if desc
                else (F.lit(float(b)) < key_d),
                1,
            ).otherwise(0)
            for b in bounds
        ]
        pid = terms[0]
        for t in terms[1:]:
            pid = pid + t
    else:
        pid = F.lit(0)
    parts = df.withColumn("_pid", pid)

    key_order = F.col(key).desc() if desc else F.col(key).asc()
    local_w = Window.partitionBy("_pid").orderBy(key_order, F.col(tiebreak))
    local_run = local_w.rowsBetween(Window.unboundedPreceding, 0)
    local = parts.select(
        "*",
        F.row_number().over(local_w).cast("long").alias("_lrn"),
        *[
            F.sum(c).over(local_run).alias(f"_l_{out}")
            for out, c in prefix_sums.items()
        ],
    )
    # phase 2: per-bucket totals — ≤ n_ranges rows, config-bounded, the
    # ONLY place a partition-less window runs
    ptot = parts.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_pn"),
        *[F.sum(c).alias(f"_p_{out}") for out, c in prefix_sums.items()],
    )
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    all_w = Window.partitionBy()
    offsets = ptot.select(
        "_pid",
        F.coalesce(F.sum("_pn").over(off_w), F.lit(0)).alias("_off_n"),
        F.sum("_pn").over(all_w).alias(n_name),
        *[
            F.coalesce(
                F.sum(f"_p_{out}").over(off_w),
                F.lit(0).cast(dict(ptot.dtypes)[f"_p_{out}"]),
            ).alias(f"_off_{out}")
            for out in prefix_sums
        ],
        # grand totals ride along for free (same bounded window input)
        *[
            F.sum(f"_p_{out}").over(all_w).alias(f"{out}_total")
            for out in prefix_sums
        ],
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .select(
            *df.columns,
            (F.col("_off_n") + F.col("_lrn")).alias(rank_name),
            n_name,
            *[
                (F.col(f"_off_{out}") + F.col(f"_l_{out}")).alias(out)
                for out in prefix_sums
            ],
            *[F.col(f"{out}_total") for out in prefix_sums],
        )
    )


def two_phase_rank_discrete(
    spark: SparkSession,
    df: DataFrame,
    key: str,
    tiebreak: str,
    desc: bool = True,
    rank_name: str = "rank",
    n_name: str = "n",
    width: int = 65536,
) -> DataFrame:
    """Two-phase global ``row_number`` over ``(key DESC|ASC, tiebreak
    ASC)`` for DISCRETE keys — distinct-key cardinality bounded by a
    dimension (calendar days, per-customer order counts, token
    lengths), not by the corpus. Percentile bucketing degrades here
    (every row holding the same heavy key value lands in one bucket =
    one task), so this follows `_balanced_shard_assignments`' scheme
    instead: local ranks inside contiguous ``(key, tiebreak DIV
    width)`` runs (≤ ``width`` rows per task regardless of key skew),
    in-key offsets from the per-key subdivision rollup (a PARTITIONED
    window over rows(key)/width entries), and key-level offsets from
    the per-key totals — the only partition-less window, over
    |distinct keys| rows. ``tiebreak`` must be numeric (unique id).
    Bit-identical to the one-window form."""
    parts = df.withColumn(
        "_bkt", (F.col(tiebreak) / F.lit(width)).cast("long")
    )
    lw = Window.partitionBy(key, "_bkt").orderBy(tiebreak)
    local = parts.select(
        "*", F.row_number().over(lw).cast("long").alias("_lrn")
    )
    grp = parts.groupBy(key, "_bkt").agg(F.count(F.lit(1)).alias("_gn"))
    in_key_w = Window.partitionBy(key).orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    grp_off = grp.withColumn(
        "_in_off", F.coalesce(F.sum("_gn").over(in_key_w), F.lit(0))
    )
    per_key = grp.groupBy(key).agg(F.sum("_gn").alias("_kn"))
    key_order = F.col(key).desc() if desc else F.col(key).asc()
    key_w = Window.orderBy(key_order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    key_off = per_key.select(
        key,
        F.coalesce(F.sum("_kn").over(key_w), F.lit(0)).alias("_k_off"),
        F.sum("_kn").over(Window.partitionBy()).alias(n_name),
    )
    off = grp_off.join(F.broadcast(key_off), key).select(
        key,
        "_bkt",
        (F.col("_k_off") + F.col("_in_off")).alias("_off"),
        n_name,
    )
    return local.join(off, [key, "_bkt"]).select(
        *df.columns,
        (F.col("_off") + F.col("_lrn")).alias(rank_name),
        n_name,
    )


def exact_ntile(rank: Column, n: Column, buckets: int) -> Column:
    """Spark's ntile(buckets) reproduced from a 1-based global rank and
    the total count: with q = n div buckets and r = n mod buckets, the
    first r buckets take q+1 rows, the rest q. CASE branches are lazy,
    so the q division is guarded for the n < buckets edge (where the
    first branch always wins)."""
    b = F.lit(buckets)
    q = F.floor(n / b)
    r = n % b
    cut = r * (q + 1)
    q_safe = F.greatest(q, F.lit(1))
    return F.when(
        rank <= cut, F.floor((rank - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((rank - cut - 1) / q_safe) + 1)
