"""Skew mitigation: salted two-phase aggregation.

At 100 TB a handful of hot keys (one bot ip doing millions of
requests) can pin an aggregation on one reducer. AQE's skew-join
splitting handles joins; for AGGREGATIONS the standard fix is
salting: phase 1 groups on (key, salt) — hot keys fan out across
``n_salts`` reducers — phase 2 merges the partials per key. Both
phases get map-side partial aggregation; results are identical to the
unsalted aggregate because every merged measure is algebraic
(sum/count/set-union — the reference's own IpStat monoid property,
Common.scala:52-61, is exactly what makes the rewrite sound).

Salt must be DETERMINISTIC (a hash of a high-cardinality column, not
``rand()``) so retried tasks and the DuckDB oracle reproduce results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: the fact side is salted with a
    deterministic hash (``salt_source`` — hash of high-cardinality
    fact columns, never ``rand()``), the dim side is replicated
    ``n_salts`` times with every salt value, and the join key becomes
    (key, salt) — a hot fact key now spreads across ``n_salts``
    reducers instead of pinning one. Cost: dim shuffle volume grows
    ``n_salts``x, so this is for moderate dims against skewed facts
    (for small dims just broadcast; AQE's skew-join split handles the
    sort-merge case when statistics expose the skew — salting is the
    explicit fallback when they don't, e.g. under a storage-partitioned
    or pre-shuffled layout AQE won't re-plan).

    Result is row-identical to the plain equi-join.
    """
    f = fact.withColumn("_fsalt", F.pmod(salt_source, F.lit(n_salts)))
    d = dim.withColumn(
        "_dsalt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = f.join(
        d,
        (F.col(fact_key) == F.col(dim_key)) & (F.col("_fsalt") == F.col("_dsalt")),
    )
    return joined.drop("_fsalt", "_dsalt")


def salted_ip_total_stats(
    log_records: DataFrame,
    key: str = "ip",
    salt_col: Column | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Whole-history per-key stats (A4/A5) with salt fan-out.

    Output identical to ``aggregations.ip_total_stats``; shape differs:
    two shuffles of size (keys x salts) + (keys) instead of one shuffle
    carrying every hot-key row to a single reducer.
    """
    salt = salt_col if salt_col is not None else F.pmod(F.hash("time"), F.lit(n_salts))
    partial = (
        log_records.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.sum("clicks").alias("p_clicks"),
            F.sum("views").alias("p_views"),
            F.collect_set("category").alias("p_categories"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("p_clicks").alias("clicks"),
        F.sum("p_views").alias("views"),
        F.array_distinct(F.flatten(F.collect_list("p_categories"))).alias(
            "categories"
        ),
    )
