"""Incremental-maintenance query family: SCD2 dimension history from
a CDC change stream, mergeable materialized-view rollups, and the
stream-stream interval join's batch twin.

These are the 100 TB *maintenance* patterns — the queries that keep a
curated table current without rescanning history. Each Spark query
deliberately takes the INCREMENTAL path (apply changes in multiple
batches, merge per-chunk partials) while its oracle takes the
ONE-SHOT path (a single SQL pass over all the data); a hash match
therefore proves batch-boundary invariance, not just row-level
agreement.

Reference scope: extension surface. The merge algebra mirrors the
reference's IpStat monoid (Common.scala ``|+|``) lifted from
streaming micro-batches to cross-job granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import (
    finalize_rollup,
    merge_rollups,
    partial_rollup,
)
from ..operators.merge import merge_into, snapshot_diff
from ..operators.quality_checks import Check, audit_table
from ..operators.scd import cdc_changes_from_events, scd2_apply
from ..operators.projections import ensure_timestamp
from ..sources.batch import fan_out_by, load_table, scan_partitions
from ..streaming.interval_join import (
    JOIN_WINDOW_SEC,
    interval_join_view_click,
    split_view_click,
)


def _events(
    spark: SparkSession, sf_dir: str, key: str | None = None
) -> DataFrame:
    """events scan; ``key`` switches the narrow-scan fan-out from
    round-robin to a hash on the query's first group/window/join key
    so the downstream exchange is elided (r13, guide §2.4 — see
    sources.batch.fan_out_by; no-op at real scale)."""
    if key is None:
        return ensure_timestamp(load_table(spark, sf_dir, "events"), "ts")
    ev = ensure_timestamp(
        load_table(spark, sf_dir, "events", fan_out=False), "ts"
    )
    return fan_out_by(
        ev, key, n_partitions=scan_partitions(spark, sf_dir, "events")
    )


# epoch micros for 2024-01-16T00:00:00Z — mid-range of the generated
# event log, so both application batches carry real transitions
_SCD_CUTOFF_US = 1_705_363_200_000_000


def scd2_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension of each user's event_type, built the way a
    nightly CDC job would: change records extracted once from the
    event log, then applied in TWO separate ``scd2_apply`` batches
    split at a mid-range cutoff (initial load + incremental merge).
    The oracle derives the same history in one SQL pass — the hash
    match pins ``apply(apply(∅,b1),b2) == one-shot`` batch-boundary
    invariance on real data (the random-chunking property test lives
    in tests/test_round6_ops.py).

    Scale: each apply is one hash shuffle on user_id; the incremental
    batch shuffles only post-cutoff transitions plus one open row per
    key — never the closed history (see operators/scd.py)."""
    return _scd2_dim(spark, sf_dir).orderBy("user_id", "version")


def _scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-batch SCD2 build WITHOUT the presentation sort — the
    form downstream joins consume (a global orderBy before a join is
    a wasted range-exchange; only the registry query sorts)."""
    changes = cdc_changes_from_events(_events(spark, sf_dir, key="user_id"))
    b1 = changes.where(F.col("ts") < _SCD_CUTOFF_US)
    b2 = changes.where(F.col("ts") >= _SCD_CUTOFF_US)
    dim1 = scd2_apply(None, b1, ["user_id"], ["event_type"])
    dim2 = scd2_apply(dim1, b2, ["user_id"], ["event_type"])
    return dim2.select(
        "user_id",
        "event_type",
        "valid_from",
        "valid_to",
        "version",
        "is_current",
    )


# one-shot islands derivation mirroring cdc_changes_from_events'
# exact pipeline: transitions in (ts, event_id) order -> last
# transition per (user, ts) tick -> re-suppress adjacent duplicates
# (a collapsed tick can equal the previous state) -> islands. The
# shared CTE body is reused by the temporal-join oracle.
_SQL_SCD2_DIM_CTES = """
ordered AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
), trans AS (
  SELECT user_id, event_type, ts_us, event_id FROM ordered
  WHERE prev IS NULL OR prev <> event_type
), collapsed AS (
  SELECT user_id, event_type, ts_us FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
                                 ORDER BY event_id DESC) AS rn
    FROM trans
  ) WHERE rn = 1
), changes AS (
  SELECT user_id, event_type, ts_us FROM (
    SELECT *, lag(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us) AS prev2
    FROM collapsed
  ) WHERE prev2 IS NULL OR prev2 <> event_type
), dim AS (
  SELECT user_id, event_type, ts_us AS valid_from,
         lead(ts_us) OVER w AS valid_to,
         row_number() OVER w AS version
  FROM changes
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
)
"""

ORACLE_SCD2 = f"""
WITH {_SQL_SCD2_DIM_CTES}
SELECT CAST(user_id AS BIGINT) AS user_id,
       event_type,
       CAST(valid_from AS BIGINT) AS valid_from,
       CAST(valid_to AS BIGINT) AS valid_to,
       CAST(version AS INT) AS version,
       (valid_to IS NULL) AS is_current
FROM dim
ORDER BY user_id, version
"""


# weekly chunk boundaries over the generated January 2024 log — the
# "one partition arrives per job" arrival pattern
_CHUNK_BOUNDS_SEC = [1704067200 + k * 7 * 86400 for k in range(1, 5)]


def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily (day, event_type) value rollup maintained INCREMENTALLY:
    the log is aggregated one weekly chunk at a time
    (``partial_rollup``), the five bounded partials are merged with
    the algebraic merge functions (``merge_rollups``), and avg is
    finalized from the (sum, count) state. The oracle aggregates the
    whole log in one pass; the hash match proves the merge algebra.

    Scale: in production only the NEWEST chunk is scanned per job —
    the standing rollup is |days x types|-sized. Here all chunks come
    from one scan (Spark reuses the cached file listing); each partial
    is a map-side-combined hash agg; the merge shuffles rollup-sized
    data only."""
    ev = _events(spark, sf_dir)
    ts_sec = F.unix_timestamp("ts")
    group = [
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_start"),
        F.col("event_type"),
    ]
    bounds = [float("-inf")] + _CHUNK_BOUNDS_SEC + [float("inf")]
    partials = []
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = ev
        if lo != float("-inf"):
            chunk = chunk.where(ts_sec >= lo)
        if hi != float("inf"):
            chunk = chunk.where(ts_sec < hi)
        partials.append(partial_rollup(chunk.select(*group, "value"),
                                       ["day_start", "event_type"]))
    merged = merge_rollups(partials, ["day_start", "event_type"])
    return finalize_rollup(merged).orderBy("day_start", "event_type")


ORACLE_INCREMENTAL_ROLLUP = """
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(SUM(value), 4) AS sum_value,
       round(SUM(value), 4) / COUNT(*) AS avg_value,
       round(MIN(value), 4) AS min_value,
       round(MAX(value), 4) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY day_start, event_type
"""


def view_click_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: every (click,
    view) pair per user with the view in the 6 hours at-or-before the
    click. Identical builder as the streaming path (watermarks no-op
    in batch) — Catalyst plans the equality key as a sort-merge join
    with the range predicate as residual condition: ONE shuffle per
    side, no nested-loop blowup, per-user match counts bounded by the
    6-hour window."""
    views, clicks = split_view_click(_events(spark, sf_dir, key="user_id"))
    return interval_join_view_click(views, clicks).orderBy(
        "click_id", "view_id"
    )


ORACLE_INTERVAL_JOIN = f"""
SELECT c.event_id AS click_id,
       v.event_id AS view_id,
       CAST(c.user_id AS BIGINT) AS user_id,
       epoch_us(c.ts) AS click_us,
       epoch_us(v.ts) AS view_us
FROM events c JOIN events v
  ON c.user_id = v.user_id
 AND c.event_type = 'click' AND v.event_type = 'view'
 AND v.ts >= c.ts - INTERVAL {JOIN_WINDOW_SEC} SECOND
 AND v.ts <= c.ts
ORDER BY click_id, view_id
"""


# --- type-1 MERGE INTO (current-state CDC apply) ----------------------------


def _user_profile(ev: DataFrame) -> DataFrame:
    """Current-state profile per user: last event type (total
    (ts, event_id) order), last event time, event count."""
    us = F.unix_micros("ts")
    return ev.groupBy("user_id").agg(
        F.max_by(
            "event_type", F.struct(us.alias("us"), F.col("event_id"))
        ).alias("last_type"),
        F.max(us).alias("last_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


def merge_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 MERGE INTO: the pre-cutoff user-profile snapshot merged
    with the post-cutoff changeset — matched rows combine (last-writer
    fields from the source, additive count), users whose newest
    activity is an ``error`` event are DELETEd (churn), new users
    insert. The oracle derives the post-merge snapshot in ONE pass
    over the full log (per-user overall profile minus users whose
    overall last event is a post-cutoff error) — a completely
    different derivation, same fixpoint.

    Scale: each profile is one map-side-combined hash agg; the merge
    is one full-outer join on user_id (operators/merge.py) where the
    changeset side is the small one — AQE broadcasts it, the 100 TB
    snapshot never reshuffles."""
    ev = _events(spark, sf_dir, key="user_id")
    us = F.unix_micros("ts")
    target = _user_profile(ev.where(us < _SCD_CUTOFF_US))
    source = _user_profile(ev.where(us >= _SCD_CUTOFF_US))
    merged = merge_into(
        target,
        source,
        ["user_id"],
        when_matched={
            "last_type": F.col("s.last_type"),
            "last_us": F.col("s.last_us"),
            "n_events": F.col("t.n_events") + F.col("s.n_events"),
        },
        delete_cond=F.col("s.last_type") == "error",
    )
    return merged.select(
        "user_id", "last_type", "last_us", "n_events"
    ).orderBy("user_id")


ORACLE_MERGE_PROFILES = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
ranked AS (
  SELECT user_id, event_type, us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us DESC, event_id DESC) AS rn
  FROM ev
),
prof AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(MAX(us) AS BIGINT) AS last_us
  FROM ev GROUP BY user_id
),
last AS (SELECT user_id, event_type AS last_type, us FROM ranked WHERE rn = 1)
SELECT CAST(p.user_id AS BIGINT) AS user_id, l.last_type, p.last_us,
       p.n_events
FROM prof p JOIN last l USING (user_id)
WHERE NOT (l.us >= {_SCD_CUTOFF_US} AND l.last_type = 'error')
ORDER BY user_id
"""


def temporal_join_events_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct enrichment: every purchase event joined
    to the SCD2 user-type dimension VERSION that was valid at the
    event's timestamp (``valid_from <= ts < valid_to``) — the
    feature-store join that prevents label leakage (joining today's
    attributes onto yesterday's training examples). Composes the SCD2
    build (one shuffle) with a user_id equi-join carrying the
    validity-range residual — sort-merge on the key, no nested loop;
    per-key version counts are small by construction, and the
    bucketized range-join rewrite (operators/range_join.py) is the
    fallback if a key's history ever gets long.

    Self-consistency makes the result easy to audit: the dimension is
    derived from event-type transitions, so the version valid at a
    purchase IS a 'purchase' run — but the join is the generic
    temporal join, and the oracle replays it generically."""
    ev = _events(spark, sf_dir, key="user_id")
    dim = _scd2_dim(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").alias("e_user_id"),
        F.unix_micros("ts").alias("ts_us"),
    )
    joined = purchases.join(
        dim,
        (F.col("e_user_id") == dim.user_id)
        & (F.col("ts_us") >= dim.valid_from)
        & (dim.valid_to.isNull() | (F.col("ts_us") < dim.valid_to)),
        "inner",
    )
    return joined.select(
        "event_id",
        F.col("e_user_id").alias("user_id"),
        "ts_us",
        F.col("event_type").alias("type_at_event"),
        "version",
    ).orderBy("event_id")


ORACLE_TEMPORAL_JOIN = f"""
WITH {_SQL_SCD2_DIM_CTES}
SELECT e.event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       epoch_us(e.ts) AS ts_us,
       d.event_type AS type_at_event,
       CAST(d.version AS INT) AS version
FROM events e JOIN dim d
  ON e.user_id = d.user_id
 AND epoch_us(e.ts) >= d.valid_from
 AND (d.valid_to IS NULL OR epoch_us(e.ts) < d.valid_to)
WHERE e.event_type = 'purchase'
ORDER BY event_id
"""


# --- declarative data-quality audit (publish gate) --------------------------


def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-publish contract audit over orders and events: one
    aggregate pass per table compiles every row-local expectation
    (non-null, range, accepted values, uniqueness) into conditional
    sums, plus one broadcast anti-join count for the orders->customer
    referential check (operators/quality_checks.py). Output is the
    audit table a publish gate reads — exact integer counts, so the
    oracle replays every check in plain SQL."""
    orders = load_table(spark, sf_dir, "orders", fan_out=False)
    customer = load_table(spark, sf_dir, "customer", fan_out=False)
    ev = _events(spark, sf_dir)
    orders_audit = audit_table(
        orders,
        "orders",
        [
            Check("orderkey_unique", "unique", "o_orderkey"),
            Check("custkey_not_null", "not_null", "o_custkey"),
            Check(
                "status_accepted", "accepted", "o_orderstatus",
                values=("O", "F", "P"),
            ),
            Check(
                "totalprice_range", "in_range", "o_totalprice",
                lo=0.0, hi=1_000_000.0,
            ),
        ],
        foreign_keys=[
            ("custkey_in_customer", "o_custkey", customer, "c_custkey")
        ],
    )
    events_audit = audit_table(
        ev,
        "events",
        [
            Check("event_id_unique", "unique", "event_id"),
            Check("user_id_not_null", "not_null", "user_id"),
            Check(
                "event_type_accepted", "accepted", "event_type",
                values=("click", "view", "purchase", "signup", "error"),
            ),
            Check("value_range", "in_range", "value", lo=0.0, hi=10_000.0),
        ],
    )
    return orders_audit.unionByName(events_audit).orderBy(
        "table_name", "check_name"
    )


ORACLE_QUALITY_AUDIT = """
WITH o AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
              + SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS orderkey_unique,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS custkey_not_null,
         CAST(SUM(CASE WHEN o_orderstatus IS NULL
                        OR o_orderstatus NOT IN ('O','F','P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS status_accepted,
         CAST(SUM(CASE WHEN o_totalprice IS NULL
                        OR o_totalprice < 0 OR o_totalprice > 1000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_range
  FROM orders
),
ofk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders
  WHERE o_custkey IS NOT NULL
    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
),
e AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(event_id) - COUNT(DISTINCT event_id)
              + SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS event_id_unique,
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS user_id_not_null,
         CAST(SUM(CASE WHEN event_type IS NULL
                        OR event_type NOT IN
                           ('click','view','purchase','signup','error')
                       THEN 1 ELSE 0 END) AS BIGINT) AS event_type_accepted,
         CAST(SUM(CASE WHEN value IS NULL OR value < 0 OR value > 10000
                       THEN 1 ELSE 0 END) AS BIGINT) AS value_range
  FROM events
)
SELECT * FROM (
  SELECT 'orders' AS table_name, 'orderkey_unique' AS check_name,
         n AS n_rows, orderkey_unique AS n_violations,
         orderkey_unique = 0 AS passed FROM o
  UNION ALL
  SELECT 'orders', 'custkey_not_null', n, custkey_not_null,
         custkey_not_null = 0 FROM o
  UNION ALL
  SELECT 'orders', 'status_accepted', n, status_accepted,
         status_accepted = 0 FROM o
  UNION ALL
  SELECT 'orders', 'totalprice_range', n, totalprice_range,
         totalprice_range = 0 FROM o
  UNION ALL
  SELECT 'orders', 'custkey_in_customer', o.n, ofk.v, ofk.v = 0
  FROM o, ofk
  UNION ALL
  SELECT 'events', 'event_id_unique', n, event_id_unique,
         event_id_unique = 0 FROM e
  UNION ALL
  SELECT 'events', 'user_id_not_null', n, user_id_not_null,
         user_id_not_null = 0 FROM e
  UNION ALL
  SELECT 'events', 'event_type_accepted', n, event_type_accepted,
         event_type_accepted = 0 FROM e
  UNION ALL
  SELECT 'events', 'value_range', n, value_range, value_range = 0 FROM e
)
ORDER BY table_name, check_name
"""


def partition_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness/completeness monitor: per-day event row counts and
    distinct users, each compared to the trailing-7-day average; a day
    whose volume drops below half its trailing average is flagged —
    the "did yesterday's load half-fail" alarm every scheduled
    pipeline needs. One aggregate plus one ordered window over
    |days| rows; quotients are unrounded (identical ints -> identical
    doubles in both engines)."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("day_start").rowsBetween(-7, -1)
    trailing = F.avg("n_events").over(w)
    return (
        daily.select(
            "day_start",
            "n_events",
            "n_users",
            trailing.alias("trailing_avg"),
            (
                trailing.isNotNull()
                & (F.col("n_events") < trailing * 0.5)
            ).alias("is_anomalous"),
        )
        .orderBy("day_start")
    )


ORACLE_PARTITION_HEALTH = """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY 1
)
SELECT day_start, n_events, n_users,
       AVG(n_events) OVER w AS trailing_avg,
       COALESCE(n_events < AVG(n_events) OVER w * 0.5, FALSE) AS is_anomalous
FROM daily
WINDOW w AS (ORDER BY day_start ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
ORDER BY day_start
"""


def profile_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC feed GENERATION: diff the pre-cutoff user-profile snapshot
    against the full-log snapshot (operators/merge.snapshot_diff) —
    one row per user whose profile changed, with action
    insert/update/delete and the post-change values. The inverse of
    merge_user_profiles; round-trip ``merge_into(old, diff) == new``
    is property-tested in tests/test_round6_ops.py. The oracle
    derives the same feed with a full-outer SQL join over two
    aggregate CTEs. (No deletes arise here — profiles only grow — so
    the delete path is covered by the pytest round-trip instead.)"""
    ev = _events(spark, sf_dir, key="user_id")
    us = F.unix_micros("ts")
    old = _user_profile(ev.where(us < _SCD_CUTOFF_US))
    new = _user_profile(ev)
    return snapshot_diff(old, new, ["user_id"]).orderBy("user_id")


ORACLE_CHANGE_FEED = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
ranked_old AS (
  SELECT user_id, event_type, us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us DESC, event_id DESC) AS rn
  FROM ev WHERE us < {_SCD_CUTOFF_US}
),
prof_old AS (
  SELECT s.user_id, l.event_type AS last_type,
         CAST(s.last_us AS BIGINT) AS last_us,
         CAST(s.n_events AS BIGINT) AS n_events
  FROM (SELECT user_id, MAX(us) AS last_us, COUNT(*) AS n_events
        FROM ranked_old GROUP BY user_id) s
  JOIN ranked_old l ON l.user_id = s.user_id AND l.rn = 1
),
ranked_new AS (
  SELECT user_id, event_type, us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us DESC, event_id DESC) AS rn
  FROM ev
),
prof_new AS (
  SELECT s.user_id, l.event_type AS last_type,
         CAST(s.last_us AS BIGINT) AS last_us,
         CAST(s.n_events AS BIGINT) AS n_events
  FROM (SELECT user_id, MAX(us) AS last_us, COUNT(*) AS n_events
        FROM ranked_new GROUP BY user_id) s
  JOIN ranked_new l ON l.user_id = s.user_id AND l.rn = 1
)
SELECT CAST(COALESCE(n.user_id, o.user_id) AS BIGINT) AS user_id,
       COALESCE(n.last_type, o.last_type) AS last_type,
       COALESCE(n.last_us, o.last_us) AS last_us,
       COALESCE(n.n_events, o.n_events) AS n_events,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS action
FROM prof_old o FULL OUTER JOIN prof_new n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL
   OR o.last_type <> n.last_type OR o.last_us <> n.last_us
   OR o.n_events <> n.n_events
ORDER BY user_id
"""
