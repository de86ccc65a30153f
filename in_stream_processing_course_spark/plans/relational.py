"""Relational query surface (SURVEY §2.7 X5) over the TPC-H-ish driver
tables: join family (inner/semi/anti/broadcast), sorts+limits, OVER
window functions, set ops, rollup/pivot. The reference itself has no
joins — this is the new design work the north star requires, written
shuffle-aware:

- only STATICALLY BOUNDED sides are force-broadcast: region/nation
  (25 rows at any SF), scalar-subquery aggregates, per-group minima,
  probe sets. customer/supplier/part/orders all scale linearly — at
  100 TB none of them broadcasts, so their joins are written plain and
  AQE promotes them to broadcast at runtime when the side is actually
  small (as at test SFs);
- fact-fact joins (orders<->lineitem) shuffle on the join key once and
  AQE picks/coalesces partitions;
- top-k = groupBy/orderBy+limit — Spark plans TakeOrderedAndProject
  (per-partition heap, no global sort);
- all money arithmetic is exact DECIMAL *internally* (order-independent
  sums), but every FINAL output column is cast to DOUBLE on both the
  Spark and oracle side: the driver's canonicalization strips trailing
  zeros on one side (decimal->float64 via pandas) but not the other, so
  an emitted Decimal('458.00') hash-mismatches 458.0 even though the
  values are equal. Exact-decimal -> double conversion is correctly
  rounded and bit-identical in both engines, so double outputs always
  hash-match.

Decimal sizing (verified against sf0.1 data): prices < 10^6 scale 2,
disc/tax in [0, 0.10] scale 2, qty integer <= 50.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranks import (
    exact_ntile,
    two_phase_rank,
    two_phase_rank_discrete,
)
from ..sources.batch import fan_out_by, load_table, scan_partitions


def _li_by(spark: SparkSession, sf_dir: str, key: str) -> DataFrame:
    """lineitem scan with the narrow-scan fan-out keyed on the query's
    first group/window/join key instead of round-robin, so the
    downstream exchange is elided (r13, guide §2.4 — see
    sources.batch.fan_out_by; no-op at real scale). Only for queries
    whose first wide operator keys on a HIGH-cardinality lineitem
    column; low-cardinality groupings (q1's flag/status, q6's global
    agg) keep round-robin + partial aggregation."""
    return fan_out_by(
        load_table(spark, sf_dir, "lineitem", fan_out=False),
        key,
        n_partitions=scan_partitions(spark, sf_dir, "lineitem"),
    )

# --- shared decimal casts ---------------------------------------------------

_PRICE = "decimal(12,2)"
_RATE = "decimal(4,2)"


def _li_money(li: DataFrame) -> DataFrame:
    """lineitem with exact-decimal money columns.

    disc_price scale 4, charge scale 6 — products of exact decimals,
    no rounding anywhere.
    """
    price = F.col("l_extendedprice").cast(_PRICE)
    disc = F.col("l_discount").cast(_RATE)
    tax = F.col("l_tax").cast(_RATE)
    return (
        li.withColumn("qty_dec", F.col("l_quantity").cast(_PRICE))
        .withColumn("price_dec", price)
        .withColumn("disc_price", price * (F.lit(1).cast(_RATE) - disc))
        .withColumn(
            "charge",
            (price * (F.lit(1).cast(_RATE) - disc)) * (F.lit(1).cast(_RATE) + tax),
        )
    )


_ORACLE_LI_MONEY = """
li AS (
  SELECT *,
         CAST(l_quantity AS DECIMAL(12,2)) AS qty_dec,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS price_dec,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS disc_price,
         (CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
           * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS charge
  FROM lineitem
)
"""


def _avg6(sum_col: str, cnt_col: str) -> F.Column:
    """avg = round(double(sum)/count, 6) — identical doubles both engines."""
    return F.round(F.col(sum_col).cast("double") / F.col(cnt_col), 6)


# --- Q1: pricing summary (full-scan agg; classic map-side combine) ---------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem")).where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty_dec").cast("double").alias("sum_qty"),
        F.sum("price_dec").cast("double").alias("sum_base_price"),
        F.sum("disc_price").cast("double").alias("sum_disc_price"),
        F.sum("charge").cast("double").alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        _avg6("sum_qty", "count_order").alias("avg_qty"),
        _avg6("sum_base_price", "count_order").alias("avg_price"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


ORACLE_Q1 = f"""
WITH {_ORACLE_LI_MONEY},
agg AS (
  SELECT l_returnflag, l_linestatus,
         CAST(SUM(qty_dec) AS DOUBLE) AS sum_qty,
         CAST(SUM(price_dec) AS DOUBLE) AS sum_base_price,
         CAST(SUM(disc_price) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(charge) AS DOUBLE) AS sum_charge,
         CAST(COUNT(*) AS BIGINT) AS count_order
  FROM li WHERE l_shipdate <= DATE '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
       sum_charge,
       round(sum_qty / count_order, 6) AS avg_qty,
       round(sum_base_price / count_order, 6) AS avg_price,
       count_order
FROM agg ORDER BY l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (broadcast dim filter + fact-fact join + top-k) --


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = _li_money(_li_by(spark, sf_dir, "l_orderkey")).where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("date")
    )
    joined = li.join(
        orders.join(cust, orders.o_custkey == cust.c_custkey),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("disc_price").cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate"
            ),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


ORACLE_Q3 = f"""
WITH {_ORACLE_LI_MONEY}
SELECT l_orderkey,
       CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_orderdate,
       o_orderpriority,
       CAST(SUM(disc_price) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN li ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-03-15'
  AND l_shipdate > DATE '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- Q5-ish: local supplier volume (6-way join, broadcast dims) -------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = _li_money(_li_by(spark, sf_dir, "l_orderkey"))
    # dims reduce to a broadcastable (custkey -> nation) map; the only
    # big shuffle is orders<->lineitem on orderkey.
    nat = nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    cust_nat = cust.join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    ord_cust = orders.join(
        cust_nat, F.col("o_custkey") == F.col("c_custkey")
    )
    li_s = li.join(
        supp, F.col("l_suppkey") == F.col("s_suppkey")
    )
    joined = li_s.join(ord_cust, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("s_nationkey") == F.col("c_nationkey")
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum("disc_price").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


ORACLE_Q5 = f"""
WITH {_ORACLE_LI_MONEY}
SELECT n_name, CAST(SUM(disc_price) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN li ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --- Q6: revenue forecast (pure scan+filter+agg; pushdown showcase) ---------


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount").between(0.03, 0.05))
        & (F.col("l_quantity") < 24)
    )
    rev = (
        F.col("l_extendedprice").cast(_PRICE) * F.col("l_discount").cast(_RATE)
    )
    return li.agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24
"""


# --- Q10-ish: returned-item ranking (join + top-20) --------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = _li_money(load_table(spark, sf_dir, "lineitem")).where(
        F.col("l_returnflag") == "R"
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum("disc_price").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_Q10 = f"""
WITH {_ORACLE_LI_MONEY}
SELECT c_custkey, c_name, n_name,
       CAST(SUM(disc_price) AS DOUBLE) AS revenue
FROM li
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- Q4-ish: order priority check (EXISTS -> left-semi join) -----------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_Q4 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- Q14-ish: promo revenue share (conditional agg over broadcast join) -----


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = _li_money(load_table(spark, sf_dir, "lineitem")).where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type").startswith("PROMO"), F.col("disc_price")).otherwise(
                F.lit(0).cast("decimal(12,4)")
            )
        )
        .cast("double")
        .alias("promo_revenue"),
        F.sum("disc_price").cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0)
            * F.col("promo_revenue").cast("double")
            / F.col("total_revenue").cast("double"),
            6,
        ).alias("promo_pct"),
    )


ORACLE_Q14 = f"""
WITH {_ORACLE_LI_MONEY},
agg AS (
  SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN disc_price
                       ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE) AS promo_revenue,
         CAST(SUM(disc_price) AS DOUBLE) AS total_revenue
  FROM li JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
)
SELECT promo_revenue, total_revenue,
       round(100.0 * CAST(promo_revenue AS DOUBLE)
             / CAST(total_revenue AS DOUBLE), 6) AS promo_pct
FROM agg
"""


# --- Q18-ish: large-volume customers (having + semi join back) ---------------


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_by(spark, sf_dir, "l_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_PRICE)).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    joined = big.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).join(cust, F.col("o_custkey") == F.col("c_custkey"))
    return joined.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate"),
        F.col("total_qty").cast("double").alias("total_qty"),
    ).orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())


ORACLE_Q18 = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_orderdate,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""


# --- join family: semi / anti ------------------------------------------------


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ORACLE_SEMI = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ORACLE_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


# --- OVER-clause window functions -------------------------------------------


def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/row_number analytic: top-3 priciest parts per brand."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


ORACLE_TOPK = """
SELECT p_brand, p_partkey,
       CAST(p_retailprice AS DOUBLE) AS p_retailprice,
       CAST(rn AS BIGINT) AS rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
) WHERE rn <= 3
"""


def supplier_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """running (cumulative) revenue per supplier in ship order —
    exact decimal so the prefix sums are order-stable and portable."""
    li = _li_money(_li_by(spark, sf_dir, "l_suppkey"))
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.sum("disc_price").over(w).cast("double").alias("running_revenue"),
    )


ORACLE_RUNNING = f"""
WITH {_ORACLE_LI_MONEY}
SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(SUM(disc_price) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_revenue
FROM li
"""


# --- set ops ------------------------------------------------------------------


def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nations that have customers but no suppliers (EXCEPT), plus the
    intersection — exercises union/intersect/except in one output."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    only_cust = cust.distinct().subtract(supp.distinct())  # EXCEPT (distinct)
    both = cust.intersect(supp)
    tagged = only_cust.withColumn("side", F.lit("customers_only")).unionByName(
        both.withColumn("side", F.lit("both"))
    )
    return tagged.orderBy("side", "nationkey")


ORACLE_SET_OPS = """
WITH c AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer),
     s AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
SELECT nationkey, 'customers_only' AS side FROM (SELECT * FROM c EXCEPT SELECT * FROM s)
UNION ALL
SELECT nationkey, 'both' AS side FROM (SELECT * FROM c INTERSECT SELECT * FROM s)
ORDER BY side, nationkey
"""


# --- rollup / pivot -----------------------------------------------------------


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus); grouping-null normalized to
    'ALL' so the hash is engine-portable."""
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    agg = li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("disc_price").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return agg.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
        "revenue",
        "n_rows",
    ).orderBy("l_returnflag", "l_linestatus")


ORACLE_ROLLUP = f"""
WITH {_ORACLE_LI_MONEY}
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(disc_price) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM li
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot: order counts per priority x status (explicit value list)."""
    orders = load_table(spark, sf_dir, "orders")
    pv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_partial"),
    ).orderBy("o_orderpriority")


ORACLE_PIVOT = """
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_partial
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- unpivot (melt): wide -> long, the inverse of pivot ----------------------


def orders_unpivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the priority-x-status count matrix back to long form with
    DataFrame.unpivot (ids=priority, values=the three status count
    columns) — the wide->long reshape that completes the pivot pair.
    Round-trips through orders_pivot_status, so correctness covers
    both directions."""
    wide = orders_pivot_status(spark, sf_dir)
    long = wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_open", "n_finished", "n_partial"],
        variableColumnName="status_bucket",
        valueColumnName="n_orders",
    )
    return long.orderBy("o_orderpriority", "status_bucket")


ORACLE_UNPIVOT = """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_partial
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status_bucket, n_orders
FROM wide
UNPIVOT (n_orders FOR status_bucket IN (n_open, n_finished, n_partial))
ORDER BY o_orderpriority, status_bucket
"""


# --- Q12-ish: shipping priority class breakdown (join + conditional agg) ----


def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
        .orderBy("l_linestatus")
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


# --- Q19-ish: disjunctive multi-predicate join (OR-of-ANDs) ------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity") >= 10))
        | ((F.col("p_type").startswith("PROMO")) & (F.col("l_quantity") < 10))
        | ((F.col("p_size") > 40) & (F.col("l_discount") >= 0.05))
    )
    return joined.where(cond).agg(
        F.sum("disc_price").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_Q19 = f"""
WITH {_ORACLE_LI_MONEY}
SELECT CAST(SUM(disc_price) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM li JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_type LIKE 'PROMO%' AND l_quantity < 10)
   OR (p_size > 40 AND l_discount >= 0.05)
"""


# --- deterministic exact median (rank-based, no interpolation drift) --------


def median_price_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median via row_number over a total order — engines
    disagree on percentile interpolation arithmetic, but the element at
    rank ceil(n/2) under a deterministic total order is portable."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    return (
        ranked.where(F.col("rn") == F.ceil(F.col("n") / 2))
        .select("l_returnflag", F.col("price").alias("median_price"))
        .orderBy("l_returnflag")
    )


ORACLE_MEDIAN = """
WITH ranked AS (
  SELECT l_returnflag,
         CAST(l_extendedprice AS DOUBLE) AS price,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag, price AS median_price
FROM ranked WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
ORDER BY l_returnflag
"""


# --- two-level aggregation: orders-per-customer histogram --------------------


def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_orders")
    )


ORACLE_HISTOGRAM = """
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey)
GROUP BY n_orders ORDER BY n_orders
"""


# --- Q2-ish: rows achieving a per-group minimum (agg + join back) ------------


def cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    mins = part.groupBy(F.col("p_brand").alias("b")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(mins),
            (part.p_brand == mins.b) & (part.p_retailprice == mins.min_price),
        )
        .select(
            "p_brand",
            "p_partkey",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
        )
        .orderBy("p_brand", "p_partkey")
    )


ORACLE_CHEAPEST = """
SELECT p.p_brand, p.p_partkey,
       CAST(p.p_retailprice AS DOUBLE) AS p_retailprice
FROM part p
JOIN (SELECT p_brand AS b, MIN(p_retailprice) AS mp FROM part GROUP BY p_brand) m
  ON p.p_brand = m.b AND p.p_retailprice = m.mp
ORDER BY p.p_brand, p.p_partkey
"""


# --- Q7-ish: volume shipping between nation pairs ----------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flow between two nations by ship year: fact table joins
    two broadcast dimension maps (supplier->nation, order->customer
    nation); the only big shuffle is the final groupBy."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp_nat = supp.join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
    cust_nat = cust.join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
    ord_cust = orders.join(
        cust_nat, F.col("o_custkey") == F.col("c_custkey")
    )
    joined = (
        li.join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ord_cust, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum("disc_price").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_Q7 = f"""
WITH {_ORACLE_LI_MONEY}
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(disc_price) AS DOUBLE) AS revenue
FROM li
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q8-ish: market share of one supplier nation within a region -------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of a region's customer revenue supplied by one nation, by
    order year — conditional-sum-over-sum, exact decimal internally."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    nat_r = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("rc_nk"))
    cust_r = cust.join(F.broadcast(nat_r), F.col("c_nationkey") == F.col("rc_nk"))
    supp_n = supp.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
            )
        ),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    ord_r = orders.join(cust_r, F.col("o_custkey") == F.col("c_custkey"))
    joined = li.join(
        supp_n, F.col("l_suppkey") == F.col("s_suppkey")
    ).join(ord_r, F.col("l_orderkey") == F.col("o_orderkey"))
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("disc_price")).otherwise(
                F.lit(0).cast("decimal(12,4)")
            )
        ).alias("_nation_rev"),
        F.sum("disc_price").alias("_total_rev"),
    )
    return agg.select(
        "o_year",
        F.round(
            F.col("_nation_rev").cast("double") / F.col("_total_rev").cast("double"),
            6,
        ).alias("mkt_share"),
    ).orderBy("o_year")


ORACLE_Q8 = f"""
WITH {_ORACLE_LI_MONEY},
agg AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         SUM(CASE WHEN n1.n_name = 'NATION_3' THEN disc_price
                  ELSE CAST(0 AS DECIMAL(12,4)) END) AS nation_rev,
         SUM(disc_price) AS total_rev
  FROM li
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY EXTRACT(year FROM o_orderdate)
)
SELECT o_year,
       round(CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6) AS mkt_share
FROM agg ORDER BY o_year
"""


# --- Q15-ish: top supplier by quarterly revenue (scalar subquery) ------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers achieving the maximum quarterly revenue — the revenue
    view + scalar-subquery-max pattern. Exact decimal comparison (no
    double equality), double output."""
    supp = load_table(spark, sf_dir, "supplier")
    li = _li_money(load_table(spark, sf_dir, "lineitem")).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum("disc_price").alias("_total")
    )
    max_rev = revenue.agg(F.max("_total").alias("_max"))
    top = revenue.join(
        F.broadcast(max_rev), F.col("_total") == F.col("_max")
    )
    return (
        supp.join(F.broadcast(top), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("_total").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


ORACLE_Q15 = f"""
WITH {_ORACLE_LI_MONEY},
revenue AS (
  SELECT l_suppkey AS supplier_no, SUM(disc_price) AS total
  FROM li
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(total AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total = (SELECT MAX(total) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q17-ish: small-quantity revenue (correlated avg threshold) --------------


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems below 20% of their part's average
    quantity — the correlated-scalar-subquery shape as a per-part agg
    joined back to the fact table. Threshold computed identically on
    both sides: double(exact qty sum) / count * 0.2."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast(_PRICE)).cast("double")
            / F.count(F.lit(1))
            * F.lit(0.2)
        ).alias("qty_threshold")
    )
    joined = li.join(per_part, F.col("l_partkey") == F.col("pk")).where(
        F.col("l_quantity") < F.col("qty_threshold")
    )
    return joined.agg(
        F.sum(F.col("l_extendedprice").cast(_PRICE)).cast("double").alias(
            "small_qty_revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_Q17 = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) * 0.2 AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS small_qty_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN per_part ON l_partkey = pk
WHERE l_quantity < qty_threshold
"""


# --- Q22-ish: wealthy inactive customers (scalar subquery + NOT EXISTS) ------


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and no orders
    after a cutoff date, per nation. acctbal summed as exact decimal
    (double sums are order-dependent), emitted as double."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal", F.col("c_acctbal").cast(_PRICE)
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1997-06-01").cast("date")
    )
    avg_bal = cust.where(F.col("bal") > 0).agg(
        (F.sum("bal").cast("double") / F.count(F.lit(1))).alias("_avg")
    )
    wealthy = cust.join(F.broadcast(avg_bal)).where(
        F.col("bal").cast("double") > F.col("_avg")
    )
    inactive = wealthy.join(
        orders.select("o_custkey"),
        wealthy.c_custkey == orders.o_custkey,
        "left_anti",
    )
    return (
        inactive.groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


ORACLE_Q22 = """
WITH c AS (SELECT *, CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer),
avg_bal AS (
  SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS a FROM c WHERE bal > 0
)
SELECT CAST(c_nationkey AS INT) AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bal) AS DOUBLE) AS totacctbal
FROM c, avg_bal
WHERE CAST(bal AS DOUBLE) > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '1997-06-01')
GROUP BY c_nationkey
ORDER BY nationkey
"""


# --- Q9-ish: product-type profit by nation and year --------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on 'gear' parts by supplier nation and order year. The
    driver testdata has no partsupp table, so supply cost is modeled as
    half the part's retail price — the query keeps Q9's shape: a fact
    table joining two dimension maps plus orders, conditional-filtered
    through the part dim, exact-decimal profit arithmetic, grouped on
    (nation, year). supplier/part scale linearly so their joins are
    written plain (AQE promotes at small SF); only nation broadcasts.
    """
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("gear"))
    orders = load_table(spark, sf_dir, "orders")
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    supp_nat = supp.join(
        F.broadcast(
            nation.select(F.col("n_nationkey").alias("s_nk"), "n_name")
        ),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    cost = (
        F.col("p_retailprice").cast(_PRICE) * F.lit(0.5).cast("decimal(2,1)")
    ) * F.col("qty_dec")
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("profit", F.col("disc_price") - cost)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum("profit").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


ORACLE_Q9 = f"""
WITH {_ORACLE_LI_MONEY}
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(disc_price
                - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(2,1))
                  * qty_dec) AS DOUBLE) AS sum_profit
FROM li
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


# --- Q13: customer order-count distribution (left outer join + histogram) ----


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-per-customer histogram INCLUDING zero-order customers —
    the left-outer-join + count(non-null) shape Q13 exercises (the
    plain histogram query drops customers with no surviving orders).
    Non-urgent orders only, so the zero bucket is populated."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(
            orders.select("o_custkey", "o_orderkey"),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q21-ish: suppliers who alone delayed multi-supplier orders ---------------


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose line was the ONLY late one on a multi-supplier
    finished order ("late" = shipped >365 days after the order date;
    the testdata has no commit/receipt dates). Q21's double
    EXISTS/NOT-EXISTS self-join is expressed as ONE per-order aggregate
    (distinct suppliers, distinct late suppliers) joined back to the
    late lines — one shuffle on orderkey instead of two self-joins,
    the formulation that survives at 100 TB. The oracle keeps the
    textbook EXISTS/NOT EXISTS form, so the hash check proves the
    rewrite equivalent."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "late",
        F.col("l_shipdate").cast("date")
        > F.date_add(F.col("o_orderdate").cast("date"), 365),
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    waiting = (
        lo.where(F.col("late"))
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            F.col("l_orderkey") == F.col("ok"),
        )
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        waiting.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


ORACLE_Q21 = """
WITH waiting AS (
  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
  FROM lineitem l1
  JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
  WHERE CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 365
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND CAST(l3.l_shipdate AS DATE)
                          > CAST(o_orderdate AS DATE) + 365)
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM waiting JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# --- CUBE over (returnflag, linestatus) --------------------------------------


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping-set combinations; grouping nulls normalized
    to 'ALL' for engine-portable hashing (same as rollup_revenue)."""
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    agg = li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("disc_price").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return agg.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
        "revenue",
        "n_rows",
    ).orderBy("l_returnflag", "l_linestatus")


ORACLE_CUBE = f"""
WITH {_ORACLE_LI_MONEY}
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(disc_price) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM li
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


# --- ntile: supplier revenue quartiles ---------------------------------------


def supplier_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) analytic over per-supplier revenue (deterministic
    total order: revenue exact-decimal desc, suppkey asc). The
    supplier rollup grows with the corpus, so the quartile comes from
    a two-phase global rank + ``exact_ntile`` instead of one
    partition-less window (r9, VERDICT r8 #1); revenue is continuous,
    so the boundary-bucketed form applies."""
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    rev = li.groupBy("l_suppkey").agg(F.sum("disc_price").alias("_rev"))
    ranked = two_phase_rank(
        spark,
        rev,
        key="_rev",
        tiebreak="l_suppkey",
        desc=True,
        rank_name="_rk",
        n_name="_n",
    )
    return ranked.select(
        F.col("l_suppkey").cast("long").alias("suppkey"),
        F.col("_rev").cast("double").alias("revenue"),
        exact_ntile(F.col("_rk"), F.col("_n"), 4)
        .cast("long")
        .alias("quartile"),
    ).orderBy("suppkey")


ORACLE_QUARTILES = f"""
WITH {_ORACLE_LI_MONEY},
rev AS (
  SELECT l_suppkey, SUM(disc_price) AS r FROM li GROUP BY l_suppkey
)
SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
       CAST(r AS DOUBLE) AS revenue,
       CAST(ntile(4) OVER (ORDER BY r DESC, l_suppkey ASC) AS BIGINT) AS quartile
FROM rev ORDER BY suppkey
"""


# --- Q2-ish: min-cost supplier per part (correlated min over a join) --------
#
# The driver testdata has no partsupp table; the distinct
# (l_partkey, l_suppkey) pairs of lineitem serve as the part-supplier
# bridge and s_acctbal proxies ps_supplycost. The shape is intact:
# region-filtered supplier dimension, per-part correlated minimum,
# join-back on the min, TPC-H output order.


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & F.col("p_name").contains("bolt")
    )
    bridge = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    nat_r = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp_r = supp.join(F.broadcast(nat_r), F.col("s_nationkey") == F.col("n_nationkey"))
    cand = part.join(bridge, F.col("p_partkey") == F.col("l_partkey")).join(
        supp_r, F.col("l_suppkey") == F.col("s_suppkey")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("s_acctbal").alias("_min_bal")
    )
    return (
        cand.join(
            mins,
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("s_acctbal") == F.col("_min_bal")),
        )
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


ORACLE_Q2 = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, supplier, ps, nation, region
WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
  AND p_size = 15 AND p_name LIKE '%bolt%'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                   FROM supplier s2, ps ps2, nation n2, region r2
                   WHERE ps2.l_partkey = p_partkey
                     AND s2.s_suppkey = ps2.l_suppkey
                     AND s2.s_nationkey = n2.n_nationkey
                     AND n2.n_regionkey = r2.r_regionkey
                     AND r2.r_name = 'ASIA')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- Q16-ish: supplier counts per part attribute (NOT IN exclusion) ----------


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers able to supply each (brand, type, size)
    combo, excluding a supplier blacklist — Q16 over the lineitem
    bridge (no partsupp in the testdata). The NOT IN subquery becomes
    a left-anti join; the count is an exact distinct over the bridge."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bridge = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    excluded = load_table(spark, sf_dir, "supplier").where(
        F.col("s_name").contains("33")
    )
    kept = bridge.join(
        excluded.select("s_suppkey"),
        bridge.l_suppkey == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        kept.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


ORACLE_Q16 = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%33%')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q20-ish: suppliers with excess share of a part's shipments --------------


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in one nation that shipped more than half of some
    'gear' part's 1996 volume — Q20's nested-aggregate + semi-join
    chain with shipped quantity standing in for partsupp availqty.
    The part total is derived from the per-(part,supplier) partials
    (one extra tiny aggregation instead of a second fact scan), and
    the share comparison stays in exact decimal (2*ps > total), no
    doubles anywhere."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    gear = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("gear")
    )
    li_gear = li.join(
        gear.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    qty_ps = li_gear.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(_PRICE)).alias("ps_qty")
    )
    qty_p = qty_ps.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("ps_qty").alias("p_qty")
    )
    excess = qty_ps.join(qty_p, F.col("l_partkey") == F.col("_pk")).where(
        F.col("ps_qty") * 2 > F.col("p_qty")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_9"
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            excess.select("l_suppkey").distinct(),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name")
        .orderBy("s_suppkey")
    )


ORACLE_Q20 = """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_9'
  AND s_suppkey IN (
    SELECT l_suppkey FROM (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS ps_qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE '%gear%')
      GROUP BY l_suppkey, l_partkey) ps
    WHERE ps_qty * 2 > (SELECT SUM(CAST(l_quantity AS DECIMAL(12,2)))
                        FROM lineitem l2
                        WHERE l2.l_partkey = ps.l_partkey
                          AND l2.l_shipdate >= DATE '1996-01-01'
                          AND l2.l_shipdate < DATE '1997-01-01'))
ORDER BY s_suppkey
"""


# --- statistical aggregates via exact-decimal moments ------------------------


def stats_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mean/stddev/correlation of (quantity, price) per returnflag —
    computed from EXACT DECIMAL raw moments (n, Σx, Σy, Σx², Σy², Σxy)
    rather than the built-in stddev/corr aggregates: double-based
    streaming moments are summation-order-dependent (different
    partitionings give different low bits), while decimal sums are
    exact and order-free, and the closed-form combination of exact
    moments in doubles is one fixed IEEE expression — bit-identical on
    any cluster layout and in the oracle. The moments are also the
    map-side-combinable form (each is an algebraic sum), so this IS
    the scale shape, not just the portable one."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(_PRICE)
    y = F.col("l_extendedprice").cast(_PRICE)
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * y).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    var_x = (n * sxx - sx * sx) / (n * (n - 1))
    var_y = (n * syy - sy * sy) / (n * (n - 1))
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(F.sqrt(var_x), 6).alias("stddev_qty"),
        F.round(sy / n, 6).alias("mean_price"),
        F.round(F.sqrt(var_y), 6).alias("stddev_price"),
        F.round(corr, 6).alias("qty_price_corr"),
    ).orderBy("l_returnflag")


ORACLE_STATS_MOMENTS = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                  * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(sx / n, 6) AS mean_qty,
       round(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 6) AS stddev_qty,
       round(sy / n, 6) AS mean_price,
       round(sqrt((n * syy - sy * sy) / (n * (n - 1))), 6) AS stddev_price,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS qty_price_corr
FROM m ORDER BY l_returnflag
"""


# --- salted fact-dim join (skew-safe; oracle proves it equals the plain join)


def salted_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through a SALTED orders<->lineitem
    join (operators/skew.py::salted_join): the fact side fans hot
    orderkeys across 8 salt buckets, the dim side is replicated 8x.
    The oracle is the plain unsalted join, so the hash check proves
    the rewrite row-identical."""
    from ..operators.skew import salted_join

    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(
        li.select("l_orderkey", "l_linenumber", "l_suppkey", "disc_price"),
        orders,
        "l_orderkey",
        "o_orderkey",
        salt_source=F.hash("l_linenumber", "l_suppkey"),
        n_salts=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.sum("disc_price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_SALTED_JOIN = f"""
WITH {_ORACLE_LI_MONEY}
SELECT o_orderpriority,
       CAST(SUM(disc_price) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM li JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- GROUPING SETS (arbitrary combos; rollup/cube cover the regular cases) ---


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — per-returnflag, per-linestatus, and
    grand total in one pass (neither rollup nor cube produces exactly
    this set). Exercises the engine's SQL surface: the plan is the
    same Expand + two-phase aggregate Catalyst builds for rollup."""
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    li.createOrReplaceTempView("_li_grouping_sets")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               CAST(SUM(disc_price) AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM _li_grouping_sets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag, l_linestatus
        """
    )


ORACLE_GROUPING_SETS = f"""
WITH {_ORACLE_LI_MONEY}
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(disc_price) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM li
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag, l_linestatus
"""


# --- rank-function family (rank/dense_rank/percent_rank/cume_dist) -----------


def part_price_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four ranking analytics over per-brand price order, computed
    in ONE window pass. Ordering is by price alone (NOT a total
    order): duplicate prices exercise the tie semantics that separate
    rank from dense_rank — the outputs stay deterministic because rank
    values depend only on the ordering values, not row order.
    percent_rank/cume_dist are double ratios of ranks, IEEE-identical
    across engines."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return part.select(
        "p_brand",
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("price"),
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        F.round(F.percent_rank().over(w), 6).alias("price_percent_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    ).orderBy("p_brand", "p_partkey")


ORACLE_RANK_FAMILY = """
SELECT p_brand, p_partkey,
       CAST(p_retailprice AS DOUBLE) AS price,
       CAST(rank() OVER w AS BIGINT) AS price_rank,
       CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank,
       round(percent_rank() OVER w, 6) AS price_percent_rank,
       round(cume_dist() OVER w, 6) AS price_cume_dist
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
ORDER BY p_brand, p_partkey
"""


# --- Q11-ish: balance concentration by nation (HAVING vs scalar subquery) ----


def q11_balance_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations holding more than 5% of global supplier account balance
    — per-group sum filtered against a global scalar aggregate, exact
    decimal internally."""
    supp = load_table(spark, sf_dir, "supplier").withColumn(
        "bal", F.col("s_acctbal").cast(_PRICE)
    )
    per_nation = supp.groupBy(F.col("s_nationkey").cast("int").alias("nationkey")).agg(
        F.sum("bal").alias("_nation_bal"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    total = supp.agg(F.sum("bal").alias("_total_bal"))
    return (
        per_nation.join(F.broadcast(total))
        .where(
            F.col("_nation_bal").cast("double")
            > F.col("_total_bal").cast("double") * 0.05
        )
        .select(
            "nationkey",
            F.col("_nation_bal").cast("double").alias("nation_balance"),
            "n_suppliers",
            F.round(
                F.col("_nation_bal").cast("double")
                / F.col("_total_bal").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("nationkey")
    )


ORACLE_Q11 = """
WITH s AS (SELECT *, CAST(s_acctbal AS DECIMAL(12,2)) AS bal FROM supplier),
per_nation AS (
  SELECT CAST(s_nationkey AS INT) AS nationkey,
         SUM(bal) AS nation_bal,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM s GROUP BY s_nationkey
),
total AS (SELECT SUM(bal) AS total_bal FROM s)
SELECT nationkey,
       CAST(nation_bal AS DOUBLE) AS nation_balance,
       n_suppliers,
       round(CAST(nation_bal AS DOUBLE) / CAST(total_bal AS DOUBLE), 6) AS share
FROM per_nation, total
WHERE CAST(nation_bal AS DOUBLE) > CAST(total_bal AS DOUBLE) * 0.05
ORDER BY nationkey
"""


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio-to-report): each nation's share of
    global discounted revenue, via an unpartitioned window sum OVER the
    per-nation rollup (25 rows — the window is trivially cheap because
    it runs on the aggregate, never the fact table).

    Sums stay exact DECIMAL through both levels; the single division
    happens on the two correctly-rounded doubles, so share bits match
    any engine.
    """
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    per_nation = joined.groupBy("n_name").agg(
        F.sum("disc_price").alias("rev_dec")
    )
    total = Window.partitionBy()
    return (
        per_nation.select(
            "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.round(
                F.col("rev_dec").cast("double")
                / F.sum("rev_dec").over(total).cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("n_name")
    )


ORACLE_REVENUE_SHARE = """
WITH per_nation AS (
  SELECT n_name,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
           AS rev_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name,
       CAST(rev_dec AS DOUBLE) AS revenue,
       round(CAST(rev_dec AS DOUBLE)
             / CAST(SUM(rev_dec) OVER () AS DOUBLE), 6) AS share
FROM per_nation
ORDER BY n_name
"""


def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    top-2-orders-per-customer shape expressed as the SQL-standard
    lateral join instead of a rank-filter window
    (window_topk_parts_per_brand covers that formulation; this pins
    the LATERAL surface itself). Catalyst decorrelates it into a
    ranked window under the hood, so the physical plan is the same
    shuffle-on-custkey + per-key sort — no nested-loop execution.

    Raw o_totalprice doubles pass through untouched (no arithmetic),
    so the hash is engine-independent; ties break on o_orderkey.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c_custkey, t.o_orderkey, t.rev
        FROM _lat_customer,
        LATERAL (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS rev
                 FROM _lat_orders WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c_custkey, rev DESC, o_orderkey
        """
    )


ORACLE_LATERAL_TOPK = """
SELECT c_custkey, t.o_orderkey, t.rev
FROM customer,
LATERAL (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS rev
         FROM orders WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
ORDER BY c_custkey, rev DESC, o_orderkey
"""


def weekly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: weekly revenue with
    week-over-week delta and growth rate (lag OVER the aggregated
    series). Weeks are epoch-anchored 7-day blocks (integer day
    arithmetic — engine/locale-independent, same convention as
    user_retention_cohorts).

    The window is unpartitioned but runs on the aggregate (one row per
    week), so the single-partition sort is bounded by the calendar,
    not the data; revenue stays exact DECIMAL until the output cast
    and the growth division divides two identical doubles.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    week = F.expr(
        "datediff(o_orderdate, DATE '1970-01-01') DIV 7"
    ).alias("week")
    weekly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(week)
        .agg(F.sum("disc_price").alias("rev_dec"))
    )
    w = Window.orderBy("week")
    rev = F.col("rev_dec").cast("double")
    prev = F.lag(F.col("rev_dec")).over(w).cast("double")
    return (
        weekly.select(
            "week",
            rev.alias("revenue"),
            (rev - prev).alias("delta"),
            F.round((rev - prev) / prev, 6).alias("growth"),
        )
        .orderBy("week")
    )


ORACLE_WEEKLY_GROWTH = """
WITH weekly AS (
  SELECT datediff('day', DATE '1970-01-01', o_orderdate) // 7 AS week,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
           AS rev_dec
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
)
SELECT week,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec AS DOUBLE) - CAST(lag(rev_dec) OVER (ORDER BY week) AS DOUBLE)
         AS delta,
       round((CAST(rev_dec AS DOUBLE)
              - CAST(lag(rev_dec) OVER (ORDER BY week) AS DOUBLE))
             / CAST(lag(rev_dec) OVER (ORDER BY week) AS DOUBLE), 6) AS growth
FROM weekly
ORDER BY week
"""


def rollup_orders_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-hierarchy ROLLUP — order totals at day, month, year,
    and grand-total grain in one Expand+aggregate pass (the calendar
    drill-down complement to the dimension rollup in revenue_rollup).
    Date-part extraction is identical integer arithmetic in both
    engines; NULL grouping levels pass through (the driver hash
    canonicalizes them), and the 2-dp o_totalprice sums round to 4 dp
    on the exactness grid.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
        .orderBy(
            F.col("y").asc_nulls_first(),
            F.col("m").asc_nulls_first(),
            F.col("d").asc_nulls_first(),
        )
    )


ORACLE_ROLLUP_TIME = """
SELECT CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS d,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(SUM(o_totalprice), 4) AS total
FROM orders
GROUP BY ROLLUP (y, m, d)
ORDER BY y ASC NULLS FIRST, m ASC NULLS FIRST, d ASC NULLS FIRST
"""


# --- graph analytics over the order graph ------------------------------------

_PR_ITERATIONS = 5
_PR_DAMPING = 85
_PR_SCALE = 1_000_000


def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer-supplier trading graph (undirected:
    an order line links its customer to its supplier in both
    directions): who are the structurally central parties? The classic
    iterative-algorithm stress test for a declarative engine — here as
    5 unrolled rounds of join + groupBy-sum in scaled-integer
    arithmetic (operators/graph.py::pagerank_fixed_point), which makes
    the fixpoint bit-identical in DuckDB's unrolled-CTE oracle; a
    float PageRank could only ever be rows-only checked.

    Node encoding: customer c -> 2c, supplier s -> 2s+1 (disjoint id
    spaces without strings). rank is the scaled integer; rank/1e6 is
    the conventional value.
    """
    from ..operators.graph import pagerank_fixed_point

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cnode").alias("u"), F.col("snode").alias("v")
    ).unionByName(
        pairs.select(F.col("snode").alias("u"), F.col("cnode").alias("v"))
    )
    ranks = pagerank_fixed_point(
        edges,
        "u",
        "v",
        iterations=_PR_ITERATIONS,
        damping_pct=_PR_DAMPING,
        scale=_PR_SCALE,
    )
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("entity_key"),
        F.col("rank").alias("rank_scaled"),
    ).orderBy("node_type", "entity_key")


def _pagerank_oracle() -> str:
    base = ((100 - _PR_DAMPING) * _PR_SCALE) // 100
    ctes = [
        f"""pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS cnode, l.l_suppkey * 2 + 1 AS snode
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
e2 AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst AS node FROM edges),
r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes)"""
    ]
    for i in range(1, _PR_ITERATIONS + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS node, SUM(r.rank // e.outdeg) AS s
  FROM e2 e JOIN r{i - 1} r ON e.src = r.node GROUP BY e.dst
),
r{i} AS (
  SELECT n.node,
         CAST({base} + ({_PR_DAMPING} * coalesce(c.s, 0)) // 100 AS BIGINT)
           AS rank
  FROM nodes n LEFT JOIN c{i} c USING (node)
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       node // 2 AS entity_key,
       rank AS rank_scaled
FROM r{_PR_ITERATIONS}
ORDER BY node_type, entity_key"""
    )


ORACLE_PAGERANK = _pagerank_oracle()



def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-analytics cube: per
    customer recency (last order date), frequency (order count),
    monetary (exact-decimal lifetime spend), each quartiled with
    ntile(4) over a custkey-tie-broken total order, concatenated into
    the 'RFM' segment code (recency quartile 1 = most recent).

    The per-customer rollup GROWS with the corpus, so each ntile runs
    as a two-phase global rank (``operators.ranks.two_phase_rank``) +
    ``exact_ntile`` — Spark's ntile arithmetic reproduced from
    (rank, n), bit-identical to the window form — instead of three
    partition-less single-task windows (r9, VERDICT r8 #1)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
        ).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    cur = per_cust
    # recency (calendar-day cardinality) and frequency (max orders per
    # customer) are DISCRETE keys — the boundary-bucketed form would
    # single-task each heavy key value; monetary is continuous
    for dim, q_name, ranker in (
        ("last_order", "r_q", two_phase_rank_discrete),
        ("frequency", "f_q", two_phase_rank_discrete),
        ("monetary", "m_q", two_phase_rank),
    ):
        ranked = ranker(
            spark,
            cur,
            key=dim,
            tiebreak="o_custkey",
            desc=True,
            rank_name="_rk",
            n_name="_n",
        )
        cur = ranked.select(
            *cur.columns,
            exact_ntile(F.col("_rk"), F.col("_n"), 4)
            .cast("int")
            .alias(q_name),
        )
    return (
        cur.select(
            F.col("o_custkey").alias("custkey"),
            "last_order",
            "frequency",
            "monetary",
            "r_q",
            "f_q",
            "m_q",
        )
        .withColumn(
            "segment",
            F.concat_ws("", F.col("r_q"), F.col("f_q"), F.col("m_q")),
        )
        .orderBy("custkey")
    )


ORACLE_RFM = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         CAST(MAX(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT)
           AS last_order,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT custkey, last_order, frequency, monetary,
       CAST(ntile(4) OVER (ORDER BY last_order DESC, custkey) AS INT) AS r_q,
       CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey) AS INT) AS f_q,
       CAST(ntile(4) OVER (ORDER BY monetary DESC, custkey) AS INT) AS m_q,
       CAST(ntile(4) OVER (ORDER BY last_order DESC, custkey) AS VARCHAR)
         || CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey) AS VARCHAR)
         || CAST(ntile(4) OVER (ORDER BY monetary DESC, custkey) AS VARCHAR)
         AS segment
FROM per_cust
ORDER BY custkey
"""


def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-50 part pairs by the
    number of orders containing both (support), with each part's
    individual order count alongside — the input table for lift/
    confidence rules. The pair join is blocked on o_orderkey (a
    per-basket self-join, quadratic only in basket size — bounded by
    line count per order, never corpus size), then one hash aggregate
    on the pair key; deterministic top-k tie-break on the pair ids."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    l = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1")
    )
    r = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        l.join(r, "ok")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    part_counts = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        pairs.join(
            part_counts.select(
                F.col("pk").alias("p1"), F.col("n_orders").alias("p1_orders")
            ),
            "p1",
        )
        .join(
            part_counts.select(
                F.col("pk").alias("p2"), F.col("n_orders").alias("p2_orders")
            ),
            "p2",
        )
        .select("p1", "p2", "support", "p1_orders", "p2_orders")
        .orderBy(F.col("support").desc(), "p1", "p2")
        .limit(50)
    )


ORACLE_MARKET_BASKET = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
pc AS (
  SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM li GROUP BY 1
)
SELECT p.p1, p.p2, p.support,
       c1.n_orders AS p1_orders, c2.n_orders AS p2_orders
FROM pairs p
JOIN pc c1 ON c1.pk = p.p1
JOIN pc c2 ON c2.pk = p.p2
ORDER BY support DESC, p1, p2
LIMIT 50
"""


def customer_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve: customers ranked by
    exact-decimal lifetime spend, with each prefix's cumulative share
    of total revenue and the top-decile flag — "how true is 80/20
    here".

    TWO-PHASE prefix sum (r9 rewrite — VERDICT r8 next-round #1): the
    per-customer rollup grows with the corpus (~15 M rows at TPC-H
    sf100), so the old single partition-less ``row_number`` +
    running-sum window single-tasked the whole table. The global rank
    and the exact-decimal running spend now assemble via
    ``operators.ranks.two_phase_rank`` — deterministic literal-driven
    range buckets, per-range local windows, broadcast offsets from the
    config-bounded per-range rollup. Bit-identical to the one-window
    form (see the operator docstring); only the final share divides
    two identically-derived doubles."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    ranked = two_phase_rank(
        spark,
        per_cust,
        key="spend_dec",
        tiebreak="o_custkey",
        desc=True,
        rank_name="_grank",
        n_name="_n",
        prefix_sums={"_run": "spend_dec"},
    )
    return (
        ranked.select(
            F.col("o_custkey").alias("custkey"),
            "n_orders",
            F.col("spend_dec").cast("double").alias("spend"),
            F.col("_grank").cast("int").alias("rank"),
            (
                F.col("_run").cast("double")
                / F.col("_run_total").cast("double")
            ).alias("cum_share"),
            (F.col("_grank") * 10 <= F.col("_n")).alias("is_top_decile"),
        )
        .orderBy("rank")
    )


def customer_pareto_curve_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of the Pareto curve for consumers who read it as a
    CURVE, not a per-customer table (r9 — VERDICT r8 next-round #7,
    modeled on ``event_value_percentiles_approx``): 99 grid points,
    each the approx spend threshold for the top-q customer fraction
    plus the EXACT revenue share and customer count above it. One
    ``approx_percentile`` sketch (mergeable, map-side) collects the 99
    thresholds; one conditional-aggregate pass computes the shares —
    no rank, no window, no per-customer output. This is the form a
    100 TB deployment should call when the export feeds a chart or an
    80/20 health metric; the exact two-phase ``customer_pareto_curve``
    remains for per-customer exports. Rows-only by design (sketch
    thresholds are engine-specific); the exact twin bounds it."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend")
    )
    qs = [i / 100 for i in range(1, 100)]
    schema = (
        "top_frac double, spend_threshold double, cum_share double,"
        " n_customers long"
    )
    thr = per_cust.agg(
        F.percentile_approx("spend", qs, 10_000).alias("t")
    ).head()["t"]
    if not thr:
        return spark.createDataFrame([], schema)
    # top_frac = q means "the top q of customers": threshold at the
    # (1-q) quantile; shares/counts above it are EXACT aggregates
    aggs = []
    for i, q in enumerate(qs):
        t = float(thr[99 - 1 - i])  # quantile(1 - q)
        aggs.append(f"sum(CASE WHEN spend >= {t!r} THEN spend END) AS s_{i}")
        aggs.append(
            f"count(CASE WHEN spend >= {t!r} THEN 1 END) AS c_{i}"
        )
    row = (
        per_cust.selectExpr("spend")
        .selectExpr("sum(spend) AS tot", "count(1) AS n", *aggs)
        .head()
    )
    out = [
        (
            round(q, 2),
            float(thr[99 - 1 - i]),
            (float(row[f"s_{i}"]) / float(row["tot"]))
            if row[f"s_{i}"] is not None and row["tot"]
            else 0.0,
            int(row[f"c_{i}"]),
        )
        for i, q in enumerate(qs)
    ]
    return spark.createDataFrame(out, schema).orderBy("top_frac")


def customer_pareto_curve_dd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto grid served from the DD-style log-bucket histogram —
    the HASH-BACKED approx twin (r10): ``customer_pareto_curve_approx``
    stays rows-only because ``approx_percentile``'s KLL internals are
    engine-private, but the DD bucket rule (ln/ceil against a
    precomputed log-gamma literal) and the representative-value
    arithmetic are portable, so the DuckDB oracle replays this sketch
    END-TO-END: per-customer rollup → histogram → cumulative walk →
    per-grid-point threshold, revenue share, and customer count. Every
    answer is within relative error alpha of the sketch-rank truth
    (thresholds) / ~2·alpha (value-mass shares); the exact two-phase
    ``customer_pareto_curve`` remains the anchor.

    Scale shape: one corpus-sized per-customer aggregation, one
    bounded (bucket) aggregation, then ALL remaining work on the
    ~range/log(gamma)-row histogram: the partition-less cumulative
    window and the 99-point grid cross are bucket-bounded, never
    corpus functions (adjudicated in tests/test_plans.py). The
    streaming twin (streaming/percentiles.py) maintains the same
    histogram continuously and serves the same grid."""
    import math as _m

    from ..operators.sketches import DD_GAMMA, DD_ZERO_BUCKET

    lg = repr(_m.log(DD_GAMMA))
    g, g1 = repr(DD_GAMMA), repr(DD_GAMMA + 1.0)
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend")
    )
    hist = (
        per_cust.select(
            F.expr(
                "CASE WHEN spend > 0 THEN"
                f" CAST(ceil(ln(spend) / {lg}) AS BIGINT)"
                f" ELSE CAST({DD_ZERO_BUCKET} AS BIGINT) END"
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rep_sql = (
        f"CASE WHEN bucket = {DD_ZERO_BUCKET} THEN 0.0"
        f" ELSE 2.0 * pow({g}, bucket) / {g1} END"
    )
    w = Window.orderBy("bucket")
    cum = hist.select(
        "bucket",
        "c",
        F.expr(rep_sql).alias("rep"),
        F.sum("c").over(w).alias("cum"),
        F.sum(F.expr(f"c * ({rep_sql})")).over(w).alias("cummass"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
        F.sum(F.expr(f"c * ({rep_sql})"))
        .over(Window.partitionBy())
        .alias("totmass"),
    )
    grid = spark.range(1, 100).select(
        (F.col("id") / F.lit(100.0)).alias("top_frac")
    )
    sel = (
        cum.crossJoin(F.broadcast(grid))
        .where(
            F.col("cum")
            > (F.lit(1.0) - F.col("top_frac")) * (F.col("n") - 1)
        )
        .groupBy("top_frac")
        .agg(
            F.min_by("rep", "bucket").alias("rep_sel"),
            F.min_by("c", "bucket").alias("c_sel"),
            F.min_by("cum", "bucket").alias("cum_sel"),
            F.min_by("cummass", "bucket").alias("cm_sel"),
            F.max("n").alias("n"),
            F.max("totmass").alias("totmass"),
        )
    )
    return sel.select(
        F.round("top_frac", 2).alias("top_frac"),
        F.round("rep_sel", 6).alias("spend_threshold"),
        F.round(
            (
                F.col("totmass")
                - F.col("cm_sel")
                + F.col("c_sel") * F.col("rep_sel")
            )
            / F.col("totmass"),
            6,
        ).alias("cum_share"),
        (F.col("n") - F.col("cum_sel") + F.col("c_sel"))
        .cast("long")
        .alias("n_customers"),
    ).orderBy("top_frac")


def _oracle_pareto_dd() -> str:
    import math as _m

    from ..operators.sketches import DD_GAMMA, DD_ZERO_BUCKET

    lg = repr(_m.log(DD_GAMMA))
    g, g1 = repr(DD_GAMMA), repr(DD_GAMMA + 1.0)
    rep = (
        f"CASE WHEN bucket = {DD_ZERO_BUCKET} THEN 0.0"
        f" ELSE 2.0 * pow({g}, bucket) / {g1} END"
    )
    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY 1
),
h AS (
  SELECT CASE WHEN spend > 0
              THEN CAST(ceil(ln(spend) / {lg}) AS BIGINT)
              ELSE CAST({DD_ZERO_BUCKET} AS BIGINT) END AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM per_cust GROUP BY 1
),
cum AS (
  SELECT bucket, c, {rep} AS rep,
         SUM(c) OVER (ORDER BY bucket) AS cum,
         SUM(c * ({rep})) OVER (ORDER BY bucket) AS cummass,
         SUM(c) OVER () AS n,
         SUM(c * ({rep})) OVER () AS totmass
  FROM h
),
sel AS (
  SELECT t.i / 100.0 AS top_frac,
         arg_min(rep, bucket) AS rep_sel,
         arg_min(c, bucket) AS c_sel,
         arg_min(cum, bucket) AS cum_sel,
         arg_min(cummass, bucket) AS cm_sel,
         MAX(n) AS n,
         MAX(totmass) AS totmass
  FROM range(1, 100) t(i) CROSS JOIN cum
  WHERE cum > (1.0 - t.i / 100.0) * (n - 1)
  GROUP BY 1
)
SELECT round(top_frac, 2) AS top_frac,
       round(rep_sel, 6) AS spend_threshold,
       round((totmass - cm_sel + c_sel * rep_sel) / totmass, 6)
         AS cum_share,
       CAST(n - cum_sel + c_sel AS BIGINT) AS n_customers
FROM sel ORDER BY top_frac
"""


ORACLE_PARETO = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT custkey, n_orders,
         CAST(spend_dec AS DOUBLE) AS spend,
         CAST(row_number() OVER w AS INT) AS rank,
         CAST(SUM(spend_dec) OVER (ORDER BY spend_dec DESC, custkey
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           AS run,
         CAST(SUM(spend_dec) OVER () AS DOUBLE) AS tot,
         COUNT(*) OVER () AS n
  FROM per_cust
  WINDOW w AS (ORDER BY spend_dec DESC, custkey)
)
SELECT custkey, n_orders, spend, rank,
       run / tot AS cum_share,
       rank * 10 <= n AS is_top_decile
FROM ranked ORDER BY rank
"""


def customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence profile: per customer with 2+ orders, the
    count, min/max/avg gap (days) between consecutive orders — the
    recency model's input table. One lag window (customer shuffle) +
    one hash aggregate; avg is an unrounded integer-derived
    quotient."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = (
        orders.select(
            "o_custkey",
            ((day - F.lag(day).over(w)) / 86400).cast("long").alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    return (
        gaps.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").alias("min_gap"),
            F.max("gap_days").alias("max_gap"),
            (F.sum("gap_days") / F.count(F.lit(1))).alias("avg_gap"),
        )
        .orderBy("custkey")
    )


ORACLE_ORDER_GAPS = """
WITH seq AS (
  SELECT o_custkey,
         CAST((epoch(CAST(o_orderdate AS TIMESTAMP))
               - epoch(lag(CAST(o_orderdate AS TIMESTAMP))
                       OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey))) / 86400
              AS BIGINT) AS gap_days
  FROM orders
)
SELECT o_custkey AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_days) AS BIGINT) AS min_gap,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap,
       SUM(gap_days) / CAST(COUNT(*) AS DOUBLE) AS avg_gap
FROM seq WHERE gap_days IS NOT NULL
GROUP BY 1 ORDER BY custkey
"""


def nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full supplier-nation x customer-nation trade matrix — TPC-H
    q7's shape generalized from one nation pair to all of them:
    discounted lineitem revenue grouped by both endpoint nations. The
    fact joins shuffle once each on their keys, both nation dims
    broadcast, money stays exact DECIMAL to the final double cast;
    output is |nations|²-bounded."""
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer", fan_out=False)
    supplier = load_table(spark, sf_dir, "supplier", fan_out=False)
    nation = load_table(spark, sf_dir, "nation", fan_out=False)
    supp_nation = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    cust_nation = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nk"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    return (
        li.join(
            supplier.select("s_suppkey", "s_nationkey"),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(supp_nation, F.col("s_nationkey") == F.col("s_nk"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(cust_nation, F.col("c_nationkey") == F.col("c_nk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum("disc_price").cast("double").alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


ORACLE_TRADE_MATRIX = f"""
WITH {_ORACLE_LI_MONEY}
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(disc_price) AS DOUBLE) AS revenue
FROM li
JOIN supplier s ON s.s_suppkey = li.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = li.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
GROUP BY 1, 2
ORDER BY supp_nation, cust_nation
"""


def orders_weekly_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix by week: counts per (week, priority) with
    each priority's share of the week — the mix-shift chart that
    catches a silent SLA change upstream. Epoch-anchored weekly
    buckets (same convention as weekly revenue growth), one aggregate
    + a weeks-sized share window, unrounded integer quotients."""
    orders = load_table(spark, sf_dir, "orders")
    week = (
        F.floor(
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
            / (7 * 86400)
        )
        * (7 * 86400)
    ).cast("long")
    counts = orders.groupBy(
        week.alias("week_start"), "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    ww = Window.partitionBy("week_start")
    return counts.select(
        "week_start",
        "o_orderpriority",
        "n_orders",
        (F.col("n_orders") / F.sum("n_orders").over(ww)).alias("share"),
    ).orderBy("week_start", "o_orderpriority")


ORACLE_WEEKLY_PRIORITY = """
WITH counts AS (
  SELECT CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP)) / 604800) * 604800
              AS BIGINT) AS week_start,
         o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT week_start, o_orderpriority, n_orders,
       n_orders / CAST(SUM(n_orders) OVER (PARTITION BY week_start)
                       AS DOUBLE) AS share
FROM counts ORDER BY week_start, o_orderpriority
"""


def parts_skyline_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of parts per brand: a part survives iff
    no same-brand part is at-least-as-cheap AND at-least-as-small with
    one strict — the classic two-criteria dominance query (price down,
    size down).

    Spark-first scale shape: NOT the quadratic NOT-EXISTS self-join the
    oracle uses. 2-D dominance collapses to a prefix-min: group to one
    row per (brand, price) with the group's min size, then over each
    brand's price-ordered groups take (a) the running min size including
    the current group (dominates via price<=, size<) and (b) its lag
    (dominates via price<, size<=). The Windows run over the
    (brand, price)-grouped input — price is a bounded grid per brand,
    and the partition key keeps every window parallel — then one hash
    join back to part. Two shuffles total, zero pairwise work."""
    part = load_table(spark, sf_dir, "part")
    g = part.groupBy("p_brand", "p_retailprice").agg(
        F.min("p_size").alias("_gmin")
    )
    w_run = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("p_brand").orderBy("p_retailprice")
    g = g.withColumn("_min_le", F.min("_gmin").over(w_run)).withColumn(
        "_min_lt", F.lag("_min_le").over(w_lag)
    )
    joined = part.join(g, ["p_brand", "p_retailprice"])
    dominated = (F.col("_min_le") < F.col("p_size")) | (
        F.col("_min_lt").isNotNull() & (F.col("_min_lt") <= F.col("p_size"))
    )
    return (
        joined.where(~dominated)
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .orderBy("p_brand", "p_partkey")
    )


ORACLE_SKYLINE = """
SELECT p.p_brand, p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand
    AND ((q.p_retailprice < p.p_retailprice AND q.p_size <= p.p_size)
      OR (q.p_retailprice <= p.p_retailprice AND q.p_size < p.p_size))
)
ORDER BY p.p_brand, p.p_partkey
"""
