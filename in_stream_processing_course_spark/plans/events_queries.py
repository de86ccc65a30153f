"""Event-stream analytics beyond the bot query: sessionization
(T2 session windows — SURVEY §2.6 notes session_window as the easy
add the reference lacks), per-key sequence analytics (lag), time
rollups, and deterministic exact dedup (X1).

All builders are batch/stream agnostic: ``session_window``, windowed
counts, and dropDuplicates run identically under ``readStream``; the
oracles replicate the event-time semantics in plain SQL
(gaps-and-islands for sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.projections import ensure_timestamp
from ..sources.batch import fan_out_by, load_table, scan_partitions

SESSION_GAP = "30 minutes"
SESSION_GAP_SEC = 1800


def _events(
    spark: SparkSession, sf_dir: str, key: str | None = None
) -> DataFrame:
    """events scan; ``key`` switches the narrow-scan fan-out from
    round-robin to a hash on the query's first group/window key so the
    downstream exchange is elided (r13, guide §2.4 — see
    sources.batch.fan_out_by; no-op at real scale)."""
    if key is None:
        return ensure_timestamp(load_table(spark, sf_dir, "events"), "ts")
    ev = ensure_timestamp(
        load_table(spark, sf_dir, "events", fan_out=False), "ts"
    )
    return fan_out_by(
        ev, key, n_partitions=scan_partitions(spark, sf_dir, "events")
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user: a session closes after 30 idle minutes
    (Spark merges events whose [ts, ts+gap) windows overlap; window end
    = last event + gap).
    """
    ev = _events(spark, sf_dir, key="user_id")
    agg = ev.groupBy(
        "user_id", F.session_window("ts", SESSION_GAP).alias("w")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).alias("session_start"),
        F.unix_timestamp(F.col("w.end")).alias("session_end"),
        "n_events",
    )


ORACLE_SESSIONIZE = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_SEC} SECOND
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), grouped AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
       CAST(floor(epoch(MAX(ts) + INTERVAL {SESSION_GAP_SEC} SECOND)) AS BIGINT)
         AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM grouped GROUP BY user_id, sid
"""


def event_lag_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time since previous event, microsecond precision
    (lag OVER a per-key event-time order)."""
    ev = _events(spark, sf_dir, key="user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w)).alias("delta_us"),
    ).where(F.col("delta_us").isNotNull())


ORACLE_LAG = """
SELECT user_id, event_id, delta_us FROM (
  SELECT user_id, event_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
  FROM events
) WHERE delta_us IS NOT NULL
"""


def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour rollup by event type (P6 bucketing at hour grain).

    fan_out=False: the only work is one hash aggregate whose groupBy
    shuffle already redistributes; a pre-shuffle to widen the scan is
    pure overhead here (r1->r2 bench regression 0.74->1.05s traced to
    exactly that extra exchange — VERDICT r2 item 6)."""
    ev = ensure_timestamp(
        load_table(spark, sf_dir, "events", fan_out=False), "ts"
    )
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("hour_start", "event_type")
    )


# NOTE sum(value) is order-robust despite double non-associativity:
# value is a 2-dp quantity, so every exact group sum lies on the 0.01
# grid — an even multiple of 0.00005, never on a round-to-4dp boundary
# (odd multiples). Float error ~1e-11 << 5e-5 boundary distance, so
# round(sum, 4) gives the same result for ANY summation order /
# partitioning in both engines. (Full-precision double means elsewhere
# use sorted folds instead — see text/similarity queries.)
ORACLE_HOURLY = """
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour_start, event_type
"""


def dedup_events_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup with a DETERMINISTIC representative: groupBy the
    identity columns and keep min(event_id) (dropDuplicates keeps an
    arbitrary row — fine in pipelines, not hash-comparable).

    fan_out=False: single hash-aggregate plan; see hourly_event_counts
    (the dedup groupBy's own shuffle is the parallelism source, and the
    r1->r2 regression 0.56->1.00s was the added fan-out exchange).
    """
    ev = load_table(spark, sf_dir, "events", fan_out=False)
    return ev.groupBy("user_id", "event_type", "props").agg(
        F.min("event_id").alias("event_id"),
        F.count(F.lit(1)).alias("n_dupes"),
    )


ORACLE_DEDUP_EXACT = """
SELECT user_id, event_type, props,
       CAST(MIN(event_id) AS BIGINT) AS event_id,
       CAST(COUNT(*) AS BIGINT) AS n_dupes
FROM events GROUP BY user_id, event_type, props
"""


def top_users_by_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most active users — groupBy + orderBy + limit plans as
    TakeOrderedAndProject (per-partition heap, no global sort)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(10)
    )


ORACLE_TOP_USERS = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       round(SUM(value), 4) AS total_value
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id ASC LIMIT 10
"""


def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day — the canonical distinct-count rollup
    (exact; the HLL variant of the same shape is
    bot_stats_approx_categories).

    Fan-out stays ROUND-ROBIN (r13): keying it by user_id elides the
    distinct-expansion exchange but measured slower (0.42 -> 0.57 s)
    — the (day, user) partial aggregate compresses before the shuffle
    either way, and the day-keyed final exchange is unavoidable."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_start")
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day_start")
    )


ORACLE_DAU = """
SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1 ORDER BY day_start
"""


def view_to_click_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence analytics: per user, how many views convert to a click
    within 6 hours (lead OVER the per-key event-time order — the
    pattern-match building block; the window matches the test data's
    per-user event cadence). conv_rate = conversions / views, exact
    integer division to double, deterministic in both engines."""
    ev = _events(spark, sf_dir, key="user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "user_id",
        "event_type",
        us.alias("us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lead(us).over(w).alias("next_us"),
    )
    views = seq.where(F.col("event_type") == "view")
    converted = F.when(
        (F.col("next_type") == "click")
        & (F.col("next_us") - F.col("us") <= 21_600_000_000),
        1,
    ).otherwise(0)
    return (
        views.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum(converted).alias("n_conversions"),
        )
        .withColumn(
            "conv_rate",
            F.round(F.col("n_conversions") / F.col("n_views"), 6),
        )
        .orderBy("user_id")
    )


ORACLE_FUNNEL = """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(SUM(CASE WHEN next_type = 'click' AND next_us - us <= 21600000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_conversions,
       round(SUM(CASE WHEN next_type = 'click' AND next_us - us <= 21600000000
                      THEN 1 ELSE 0 END) / COUNT(*), 6) AS conv_rate
FROM seq WHERE event_type = 'view'
GROUP BY user_id ORDER BY user_id
"""


def sessionize_events_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap (Spark's dynamic
    ``session_window``): purchase/error events close sessions after 5
    idle minutes, everything else after 30 — the gap is a Column, not
    a constant. Spark merges events whose [ts, ts+gap) intervals
    overlap; the oracle reproduces exactly that with the running-max
    interval-union rule (a new session starts when ts >= the max end
    of all previous intervals), which is NOT plain lag-based
    gaps-and-islands.
    """
    ev = _events(spark, sf_dir, key="user_id")
    gap = F.when(
        F.col("event_type").isin("purchase", "error"), F.lit("5 minutes")
    ).otherwise(F.lit("30 minutes"))
    agg = ev.groupBy(
        "user_id", F.session_window("ts", gap).alias("w")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).alias("session_start"),
        F.unix_timestamp(F.col("w.end")).alias("session_end"),
        "n_events",
    )


ORACLE_SESSIONIZE_DYNAMIC = """
WITH iv AS (
  SELECT user_id, ts, epoch_us(ts) AS s_us,
         epoch_us(ts) + CASE WHEN event_type IN ('purchase', 'error')
                             THEN 300000000 ELSE 1800000000 END AS e_us
  FROM events
),
marked AS (
  SELECT user_id, s_us, e_us,
         CASE WHEN s_us >= MAX(e_us) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   OR MAX(e_us) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM iv
),
grouped AS (
  SELECT user_id, s_us, e_us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       CAST(floor(MIN(s_us) / 1000000) AS BIGINT) AS session_start,
       CAST(floor(MAX(e_us) / 1000000) AS BIGINT) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM grouped GROUP BY user_id, sid
"""


def orders_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension generation + weekday rollup: build the full
    day dimension spanning the order history with sequence/explode
    (the batch analog of a range source — no external calendar table),
    left-join orders onto it, and roll up by weekday. Weekday is
    normalized to Monday=0 on both engines (Spark dayofweek is
    1=Sunday, DuckDB dayofweek is 0=Sunday)."""
    from .relational import _PRICE  # shared decimal sizing

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("od"),
        F.col("o_totalprice").cast(_PRICE).alias("price"),
    )
    bounds = orders.agg(
        F.min("od").alias("lo"), F.max("od").alias("hi")
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    per_day = days.join(orders, days.day == orders.od, "left").groupBy("day").agg(
        F.count("od").alias("n_orders"),
        F.sum("price").alias("rev"),
    )
    weekday = ((F.dayofweek("day") + 5) % 7).cast("int")
    return (
        per_day.groupBy(weekday.alias("weekday_mon0"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("weekday_mon0")
    )


ORACLE_ORDERS_BY_WEEKDAY = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS od,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
),
b AS (SELECT MIN(od) AS lo, MAX(od) AS hi FROM o),
days AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                     CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM b
),
per_day AS (
  SELECT day, CAST(COUNT(od) AS BIGINT) AS n_orders, SUM(price) AS rev
  FROM days LEFT JOIN o ON day = od GROUP BY day
)
SELECT CAST((dayofweek(day) + 6) % 7 AS INT) AS weekday_mon0,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM per_day GROUP BY 1 ORDER BY weekday_mon0
"""


def range_join_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (operators/range_join.py): assign
    every event back to its user's session interval and count — the
    result must equal sessionize_events exactly, and the oracle IS the
    sessionize oracle, so the hash check proves the bucketized
    range-join rewrite correct. The plan is a pure equi-join on
    (user, bucket); the naive ts-range join would be a per-key nested
    loop."""
    from ..operators.range_join import point_in_interval_join

    ev = _events(spark, sf_dir)
    sessions = sessionize_events(spark, sf_dir).select(
        "user_id",
        F.timestamp_seconds("session_start").alias("s_ts"),
        F.timestamp_seconds("session_end").alias("e_ts"),
    )
    assigned = point_in_interval_join(
        ev.select("user_id", "ts"),
        sessions,
        key="user_id",
        point_ts="ts",
        start_ts="s_ts",
        end_ts="e_ts",
        bucket_sec=1800,
    )
    return (
        assigned.groupBy(
            "user_id",
            F.unix_timestamp("s_ts").alias("session_start"),
            F.unix_timestamp("e_ts").alias("session_end"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def reconcile_clicks_vs_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the audit-join shape: daily click
    volume against daily purchase volume, keeping days where either
    side is missing (coalesced to zero) so drop-offs on EITHER stream
    are visible. Completes the join family (inner/left/semi/anti/
    lateral/as-of/range all appear elsewhere; this pins full-outer).
    """
    ev = _events(spark, sf_dir)
    day = F.expr("unix_timestamp(ts) DIV 86400 * 86400").alias("day_start")

    def side(event_type: str, out: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == event_type)
            .groupBy(day)
            .agg(F.count(F.lit(1)).alias(out))
        )

    clicks = side("click", "n_clicks")
    purchases = side("purchase", "n_purchases")
    return (
        clicks.join(purchases, "day_start", "full_outer")
        .select(
            "day_start",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
        .orderBy("day_start")
    )


ORACLE_RECONCILE = """
WITH clicks AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 * 86400 AS day_start,
         COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
), purchases AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 * 86400 AS day_start,
         COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT coalesce(clicks.day_start, purchases.day_start) AS day_start,
       CAST(coalesce(n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(coalesce(n_purchases, 0) AS BIGINT) AS n_purchases
FROM clicks FULL OUTER JOIN purchases
  ON clicks.day_start = purchases.day_start
ORDER BY day_start
"""


# --- three-step funnel (view -> click -> purchase, eventually-after) --------


def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stage funnel with EVENTUALLY-AFTER semantics (the product
    form: a user converts if a click happens any time at-or-after the
    first view, and a purchase at-or-after that click), complementing
    view_to_click_funnel's strict adjacent-pair form. One row per user
    who entered the funnel: stage timestamps (epoch micros, null where
    the stage was never reached) + reached flags.

    Scale shape: a chain of conditional-min aggregates — each stage is
    one groupBy(user) over a filtered scan joined to the previous
    stage's per-user scalar. All three shuffles hash on user_id (AQE
    reuses the partitioning decision per stage); no windows over full
    event history, no fanout. The oracle derives the same chain with
    three dependent CTEs."""
    ev = _events(spark, sf_dir, key="user_id")
    base = ev.select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    v = (
        base.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("view_us"))
    )
    c = (
        base.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("us") >= F.col("view_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("click_us"))
    )
    p = (
        base.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("us") >= F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("purchase_us"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_us",
            "click_us",
            "purchase_us",
            F.col("click_us").isNotNull().alias("reached_click"),
            F.col("purchase_us").isNotNull().alias("reached_purchase"),
        )
        .orderBy("user_id")
    )


ORACLE_FUNNEL_THREE_STEP = """
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
v AS (
  SELECT user_id, MIN(us) AS view_us FROM base
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT base.user_id, MIN(us) AS click_us
  FROM base JOIN v ON base.user_id = v.user_id AND base.us >= v.view_us
  WHERE event_type = 'click' GROUP BY base.user_id
),
p AS (
  SELECT base.user_id, MIN(us) AS purchase_us
  FROM base JOIN c ON base.user_id = c.user_id AND base.us >= c.click_us
  WHERE event_type = 'purchase' GROUP BY base.user_id
)
SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
       c.click_us IS NOT NULL AS reached_click,
       p.purchase_us IS NOT NULL AS reached_purchase
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
ORDER BY v.user_id
"""


def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: for every type pair, the
    distinct-user intersection size and the Jaccard of the two
    audiences — the segment-overlap matrix behind "users who do A also
    do B" analyses.

    Scale shape: ONE shuffle. Types are collected per user (an array
    bounded by |event types|, not by activity), pairs explode from that
    bounded array, and the pair counts are a map-side-combinable
    aggregate over at most |types|^2/2 keys. The naive form — distinct
    (type, user) self-joined on user — shuffles the pair table twice
    and explodes on power users; the oracle uses exactly that naive
    algebra, so the hash match proves the rewrite.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("ts")
    )
    pairs = per_user.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (x, i) ->"
                " transform(slice(ts, i + 2, size(ts)),"
                " y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    inter = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_common"))
    sizes = (
        per_user.select("user_id", F.explode("ts").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        inter.join(sizes.withColumnRenamed("t", "a").withColumnRenamed("n", "n_a"), "a")
        .join(sizes.withColumnRenamed("t", "b").withColumnRenamed("n", "n_b"), "b")
        .select(
            F.col("a").alias("type_a"),
            F.col("b").alias("type_b"),
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


ORACLE_AUDIENCE_OVERLAP = """
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), inter AS (
  SELECT l.event_type AS type_a, r.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM tu l JOIN tu r
    ON l.user_id = r.user_id AND l.event_type < r.event_type
  GROUP BY 1, 2
), sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY 1
)
SELECT type_a, type_b, n_common, sa.n AS n_a, sb.n AS n_b,
       round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.event_type = inter.type_a
JOIN sizes sb ON sb.event_type = inter.type_b
ORDER BY type_a, type_b
"""


# --- mergeable-sketch distinct counting --------------------------------------


def approx_users_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch DAU accounting (Apache DataSketches HLL, the
    Spark 3.5+ `hll_sketch_agg` family): per event type, the exact
    distinct-user count next to the sketch estimate; plus an 'ALL'
    row whose estimate comes from UNIONING the per-type sketches —
    NOT re-scanning the data. That merge is the 100 TB point: persist
    one kilobyte-scale sketch per (partition, day), answer any
    distinct-users-over-subset query by sketch union alone, never a
    second pass over raw events. Registered rows-only (sketch
    estimates are engine-specific); tests/test_round5_ops.py bounds
    the estimate against the exact count.
    """
    ev = _events(spark, sf_dir)
    # materialized once: BOTH output branches (per-type rows and the
    # ALL union row) read per_type, and AQE never reuses the exchange
    # across them — without this the distinct-agg over events runs
    # twice (same discipline as the LSH band tables)
    per_type = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.hll_sketch_agg("user_id").alias("_sk"),
        )
        .localCheckpoint(eager=False)
    )
    typed = per_type.select(
        "event_type",
        "n_users_exact",
        F.hll_sketch_estimate("_sk").alias("n_users_hll"),
    )
    total = (
        per_type.agg(
            F.hll_union_agg("_sk").alias("_u"),
        )
        .join(
            ev.agg(F.countDistinct("user_id").alias("n_users_exact"))
        )
        .select(
            F.lit("ALL").alias("event_type"),
            "n_users_exact",
            F.hll_sketch_estimate("_u").alias("n_users_hll"),
        )
    )
    return typed.unionByName(total).orderBy("event_type")


def events_theta_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct users per event type from the THETA hash sample
    (operators/sketches.theta_sample) — the HASH-BACKED twin of
    ``approx_users_sketch_union`` (r10): HLL register internals are
    engine-private (that query stays rows-only forever), but the
    theta sample is md5-prefix arithmetic both engines replay, so the
    DuckDB oracle reproduces the sample, the per-type estimates, AND
    the 'ALL' row — which is computed by UNIONING the per-type
    sampled sets (one distinct over the already-p-sized sample),
    never by rescanning the events: the same
    merge-without-second-pass property the HLL query demonstrates,
    here hash-verified. Accuracy (~1/sqrt(sample)) is pinned against
    exact counts in tests/test_round10_ops.py; the sketch's job at
    100 TB is the one-pass p-fraction shuffle, and its sample doubles
    as an auditable uniform user sample."""
    from ..operators.sketches import (
        THETA_LG_INV_P,
        theta_estimate_col,
        theta_sample,
    )

    ev = _events(spark, sf_dir)
    # materialized once: both output branches read the sample, and AQE
    # never reuses the exchange across them (the HLL twin's note)
    sample = theta_sample(
        ev, "user_id", THETA_LG_INV_P, group_cols=("event_type",)
    ).localCheckpoint(eager=False)
    typed = sample.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    total = (
        sample.select("h")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .select(F.lit("ALL").alias("event_type"), "n_sampled")
    )
    return (
        typed.unionByName(total)
        .select(
            "event_type",
            "n_sampled",
            theta_estimate_col(F.col("n_sampled"), THETA_LG_INV_P).alias(
                "distinct_est"
            ),
        )
        .orderBy("event_type")
    )


def _oracle_theta_distinct_users() -> str:
    from ..operators.sketches import (
        THETA_LG_INV_P,
        _THETA_NIBBLES,
        theta_threshold,
    )

    thr = theta_threshold(THETA_LG_INV_P)
    mult = 1 << THETA_LG_INV_P
    return f"""
WITH s AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1,
                             {_THETA_NIBBLES}) AS BIGINT) AS h
  FROM events
  WHERE user_id IS NOT NULL
),
f AS (SELECT event_type, h FROM s WHERE h < {thr})
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(COUNT(*) * {mult} AS BIGINT) AS distinct_est
FROM f GROUP BY event_type
UNION ALL
SELECT 'ALL',
       CAST(COUNT(DISTINCT h) AS BIGINT),
       CAST(COUNT(DISTINCT h) * {mult} AS BIGINT)
FROM f
ORDER BY event_type
"""


def user_growth_accrual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, how many users appeared for the
    FIRST time (min event date per user) and the cumulative user base
    to date — the new-vs-returning curve every product dashboard
    leads with. Two hash aggregates (per-user min, per-day count)
    plus one |days|-row cumulative window; all exact integers."""
    ev = _events(spark, sf_dir, key="user_id")
    first_seen = ev.groupBy("user_id").agg(
        F.min(
            F.unix_timestamp(F.date_trunc("day", F.col("ts")))
        ).alias("first_day")
    )
    daily = first_seen.groupBy(F.col("first_day").alias("day_start")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day_start",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    ).orderBy("day_start")


ORACLE_USER_GROWTH = """
WITH first_seen AS (
  SELECT user_id,
         CAST(MIN(epoch(date_trunc('day', ts))) AS BIGINT) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day AS day_start, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY first_day
)
SELECT day_start, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day_start
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cumulative_users
FROM daily ORDER BY day_start
"""


def session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of session lengths in 5-minute buckets (duration =
    last event − first event, gap-closed sessions via the native
    session_window): the engagement histogram behind "how long do
    users actually stay". Session rollup (one shuffle) -> scan-local
    bucket projection -> one tiny aggregate; all exact integers."""
    ev = _events(spark, sf_dir, key="user_id")
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", SESSION_GAP).alias("w")
    ).agg(
        F.unix_timestamp(F.min("ts")).alias("first_ev"),
        F.unix_timestamp(F.max("ts")).alias("last_ev"),
    )
    bucket = (
        F.floor((F.col("last_ev") - F.col("first_ev")) / 300) * 300
    ).cast("long")
    return (
        sessions.groupBy(bucket.alias("duration_bucket"))
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("duration_bucket")
    )


ORACLE_SESSION_DURATION = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_SEC} SECOND
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), grouped AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), sessions AS (
  SELECT user_id, sid,
         CAST(floor(epoch(MIN(ts))) AS BIGINT) AS first_ev,
         CAST(floor(epoch(MAX(ts))) AS BIGINT) AS last_ev
  FROM grouped GROUP BY user_id, sid
)
SELECT CAST(floor((last_ev - first_ev) / 300.0) * 300 AS BIGINT)
         AS duration_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM sessions GROUP BY 1 ORDER BY duration_bucket
"""


def events_error_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational health: per-day error share (error events / all
    events) with counts — the SLO line every on-call dashboard plots.
    One conditional-sum aggregate; the share is an unrounded
    integer-derived quotient (bit-identical across engines)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias(
                "day_start"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias(
                "n_errors"
            ),
        )
        .select(
            "day_start",
            "n_events",
            "n_errors",
            (F.col("n_errors") / F.col("n_events")).alias("error_rate"),
        )
        .orderBy("day_start")
    )


ORACLE_ERROR_RATE = """
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         / CAST(COUNT(*) AS DOUBLE) AS error_rate
FROM events GROUP BY 1 ORDER BY day_start
"""


def events_hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal usage profile: event counts per (hour-of-day, type)
    with each hour's share of its type's total — the 24-row
    seasonality fingerprint behind load forecasting and the weekday
    monitor's hourly sibling. One aggregate + a types-sized window;
    unrounded integer-derived shares."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy(
        F.hour("ts").alias("hour_of_day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    wt = Window.partitionBy("event_type")
    return counts.select(
        "hour_of_day",
        "event_type",
        "n_events",
        (F.col("n_events") / F.sum("n_events").over(wt)).alias("share"),
    ).orderBy("hour_of_day", "event_type")


ORACLE_HOUR_PROFILE = """
WITH counts AS (
  SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT hour_of_day, event_type, n_events,
       n_events / CAST(SUM(n_events) OVER (PARTITION BY event_type)
                       AS DOUBLE) AS share
FROM counts ORDER BY hour_of_day, event_type
"""


# --- heavy hitters via Misra-Gries candidates (sketch family) ---------------

HH_K = 192


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with more than n/192 of all events, exact counts — found
    through the Misra-Gries candidate path (operators/sketches.py):
    per-partition MG(k) summaries, mergeable-summaries reduction to
    ≤ k-1 global candidates, then exact counts for candidates only.
    The key space never shuffles; the only corpus-wide exchange is the
    ≤ partitions·k summary rows. The oracle computes the same set by
    brute force (GROUP BY + HAVING), so the hash match proves the
    sketch's superset guarantee on real data, not just the final
    arithmetic."""
    from ..operators.sketches import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", HH_K).orderBy("user_id")


ORACLE_HEAVY_HITTERS = f"""
SELECT user_id, count(*) AS n_rows
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
HAVING count(*) * {HH_K}
       > (SELECT count(*) FROM events WHERE user_id IS NOT NULL)
ORDER BY user_id
"""


CM_W = 1024  # buckets per hash row; epsilon = e/w over n events


def events_cm_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates vs exact per-user event counts
    (round 6; operators/sketches.cm_sketch) — the second sketch family
    beside Misra-Gries: CM answers "how frequent is ANY key" from d·w
    counters instead of finding the top keys. The hash family is
    explicit 2-universal modular hashing over the Mersenne prime
    2^31−1 (engine-portable — xxhash/md5 would be private to one
    engine), so the DuckDB oracle REBUILDS the sketch and the
    estimates bit-for-bit: the hash match proves the mergeable build,
    the lookup, and (since the output carries both columns) the
    overcount-only guarantee est ≥ exact on real data.

    Scale: the build is one scan with partial aggregation (only d·w
    summary rows shuffle); the estimate join broadcasts the d·w
    counter table. The per-user exact side is this query's
    verification yardstick, not part of the sketch's cost."""
    from ..operators.sketches import cm_estimate, cm_sketch

    # keyed fan-out (r13, §2.4): hash(user_id) feeds both the exact
    # groupBy (exchange elided) and the sketch's partial aggregation
    ev = fan_out_by(
        load_table(spark, sf_dir, "events", fan_out=False),
        "user_id",
        n_partitions=scan_partitions(spark, sf_dir, "events"),
    ).select("user_id")
    sk = cm_sketch(ev, "user_id", w=CM_W)
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    est = cm_estimate(exact.select("user_id"), "user_id", sk, w=CM_W)
    return (
        exact.join(est, "user_id")
        .select("user_id", "n_rows", "cm_est")
        .orderBy("user_id")
    )


def _oracle_cm_user_counts() -> str:
    from ..operators.sketches import CM_P, CM_PARAMS

    params = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(CM_PARAMS))
    return f"""
WITH params(row, a, b) AS (VALUES {params}),
keys AS (
  SELECT user_id, ((user_id % {CM_P}) + {CM_P}) % {CM_P} AS kp,
         count(*) AS n_rows
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
cells AS (
  SELECT p.row, ((k.kp * p.a + p.b) % {CM_P}) % {CM_W} AS bucket,
         CAST(SUM(k.n_rows) AS BIGINT) AS c
  FROM keys k CROSS JOIN params p
  GROUP BY p.row, bucket
),
est AS (
  -- LEFT join + coalesce 0: mirrors cm_estimate's unseen-key contract
  -- (absent cells count 0); for keys the sketch saw every cell is
  -- populated, so the hash is unchanged on this all-seen-keys probe
  SELECT k.user_id, MIN(COALESCE(c.c, 0)) AS cm_est
  FROM keys k CROSS JOIN params p
  LEFT JOIN cells c
    ON c.row = p.row
   AND c.bucket = ((k.kp * p.a + p.b) % {CM_P}) % {CM_W}
  GROUP BY k.user_id
)
SELECT k.user_id, CAST(k.n_rows AS BIGINT) AS n_rows, e.cm_est
FROM keys k JOIN est e USING (user_id)
ORDER BY k.user_id
"""


ORACLE_CM_USER_COUNTS = _oracle_cm_user_counts()
