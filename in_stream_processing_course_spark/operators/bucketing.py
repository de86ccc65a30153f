"""Bucketed co-located joins — the pre-shuffle answer to the biggest
exchange in the relational surface (orders <-> lineitem on orderkey).

At 100 TB the orders/lineitem join shuffles both fact tables every
query. Bucketing pays that shuffle ONCE at write time: both tables are
hash-clustered into the same number of buckets on the join key, and
every later equi-join on that key plans with NO Exchange on either
side (bucket-local sort-merge). This module is the engine's write-side
API for that layout plus a reader that proves the exchange-free plan
(pinned by tests/test_plans.py::test_bucketed_join_has_no_shuffle).

Bucket-count sizing at scale: target ~128-256 MB per bucket file per
partition write; for 100 TB of lineitem that is O(10^5) buckets —
bucket counts must match across tables to co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.batch import load_table

DEFAULT_BUCKETS = 8


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    key: str,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Persist ``df`` hash-bucketed (and in-bucket sorted) on ``key``.

    Sorting within buckets lets the sort-merge join skip its sort too —
    the join becomes a pure streaming merge of co-located files.
    """
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketize_order_lineitem(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[str, str]:
    """Write orders + lineitem bucketed on the join key; returns the
    two table names. The one-time cost that removes the per-query
    fact-fact shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders, "bucketed_orders", "o_orderkey", f"{base_path}/orders", n_buckets
    )
    write_bucketed_table(
        li, "bucketed_lineitem", "l_orderkey", f"{base_path}/lineitem", n_buckets
    )
    return "bucketed_orders", "bucketed_lineitem"


def bucketed_order_lineitem_join(spark: SparkSession) -> DataFrame:
    """Equi-join of the bucketed tables — plans with zero Exchange
    nodes (bucket-local merge join) when bucketing is in effect."""
    orders = spark.table("bucketed_orders")
    li = spark.table("bucketed_lineitem")
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_orderdate", "o_orderpriority"
    )
