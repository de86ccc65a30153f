"""Time-series / product-analytics operators over the events stream:
semi-structured JSON extraction, date-spine gap filling, retention
cohorts, moment-based anomaly flags, and an interval sweep-line for
concurrent-session load.

The reference has no analytics beyond the bot query (SURVEY §2.7:
"none of joins/sorts/..."), but its clickstream domain is exactly
where these shapes live; each is expressed as native Column algebra
(no UDFs) so Catalyst prunes the events scan down to the consumed
columns and pushes the whole map side into WholeStageCodegen.

Portability rules (driver oracle contract, see registry docstring):
epoch BIGINT timestamps, exact-decimal internal sums cast to DOUBLE
at the edge, integer division via DIV, and identical double operation
order on both engines so comparisons/filters see identical bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .events_queries import ORACLE_SESSIONIZE, _events, sessionize_events


# --- semi-structured: JSON property extraction -----------------------------


def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a typed field from the free-form ``props`` JSON column
    and aggregate it per event type.

    ``get_json_object`` is a native Catalyst expression (JVM Jackson
    path evaluation, no Python): the engine's answer to schemaless
    payload columns — the same decode-then-aggregate shape as the
    reference's JSON wire decode (SURVEY §2.3 P2, ImplStructured
    .scala:104-116) but over an embedded column instead of the Kafka
    value. Malformed / missing keys become NULL and fall out of the
    aggregates, mirroring the reference's silent-drop semantics.
    """
    ev = load_table(spark, sf_dir, "events")  # no ts needed: prune to 2 cols
    # try_cast: a non-numeric "k" degrades to NULL instead of an ANSI
    # cast error; the oracle guards with json_valid + TRY_CAST because
    # DuckDB's json_extract_string ERRORS on malformed JSON where
    # get_json_object returns NULL
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


ORACLE_PROPS_JSON = """
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM (
  SELECT event_type,
         TRY_CAST(CASE WHEN json_valid(props)
                       THEN json_extract_string(props, '$.k') END
                  AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


# --- date-spine gap fill ---------------------------------------------------


def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled hourly counts per event type: a generated hour spine
    (``sequence`` + explode) cross-joined with the observed type
    dimension, left-joined to the real rollup.

    The spine side is tiny and bounded (hours-in-range x event types)
    so both joins broadcast; the only shuffle is the rollup's own
    groupBy. Gap filling is the canonical prerequisite for windowed
    models over sparse series — a missing hour must be an explicit 0,
    not an absent row.
    """
    ev = _events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    counts = (
        ev.groupBy(hour.alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine_hours = (
        ev.agg(
            F.min(hour).alias("lo"),
            F.max(hour).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
    )
    types = ev.select("event_type").distinct()
    spine = spine_hours.crossJoin(F.broadcast(types))
    return (
        spine.join(counts, ["h", "event_type"], "left")
        .select(
            F.unix_timestamp("h").alias("hour_start"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("hour_start", "event_type")
    )


ORACLE_HOURLY_GAPFILL = """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo,
         date_trunc('hour', MAX(ts)) AS hi
  FROM events
), hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), counts AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(floor(epoch(hours.h)) AS BIGINT) AS hour_start,
       types.event_type,
       CAST(COALESCE(counts.n, 0) AS BIGINT) AS n_events
FROM hours
CROSS JOIN types
LEFT JOIN counts
  ON counts.h = hours.h AND counts.event_type = types.event_type
ORDER BY hour_start, types.event_type
"""


# --- retention cohorts -----------------------------------------------------


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week, with
    distinct actives counted per whole weeks elapsed since first touch.

    All time math is integer arithmetic on epoch days (``DIV``), so
    the result is engine- and timezone-independent: cohort weeks are
    epoch-anchored 7-day blocks, not locale week-starts. Two shuffles
    (first-touch agg, cohort agg); the first-touch side re-joins on
    user_id so at scale it co-partitions with the event side instead
    of broadcasting an unbounded user dimension.
    """
    ev = _events(spark, sf_dir, key="user_id")
    days = ev.select(
        "user_id",
        F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
    )
    first = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        days.join(first, "user_id")
        .select(
            "user_id",
            F.expr("(first_day DIV 7) * 7 * 86400").alias("cohort_start"),
            F.expr("(day - first_day) DIV 7").alias("week_offset"),
        )
        .groupBy("cohort_start", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_start", "week_offset")
    )


ORACLE_RETENTION = """
WITH days AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), first AS (
  SELECT user_id, MIN(day) AS first_day FROM days GROUP BY user_id
)
SELECT (first.first_day // 7) * 7 * 86400 AS cohort_start,
       (days.day - first.first_day) // 7 AS week_offset,
       CAST(COUNT(DISTINCT days.user_id) AS BIGINT) AS n_users
FROM days JOIN first ON days.user_id = first.user_id
GROUP BY 1, 2
ORDER BY cohort_start, week_offset
"""


# --- moment-based anomaly flags --------------------------------------------


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outliers per event type from exact-decimal raw moments.

    value is a 2-dp quantity: cast to DECIMAL(18,2) it sums exactly
    (order-free, map-side combinable), and d*d is an exact
    DECIMAL(_,4), so mean/variance are identical under any
    partitioning. The moments fold to one tiny stats row per type
    (bounded dimension -> broadcast back, same policy as
    operators/skew.py), and z = (value - mean) / stddev is the same
    double operation sequence on both engines, so the |z| filter sees
    identical bits. Same moment recipe as relational.stats_quantity
    _price; here it drives row-level flagging, not reporting.

    Zero-variance groups (single event, or all-equal values) are
    excluded up front: 0/0 is NaN in Spark (and NaN compares ABOVE the
    threshold) but NULL in DuckDB — the std > 0 guard keeps both
    engines on defined arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(18,2)")
    stats = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d).alias("s"),
            F.sum(d * d).alias("sq"),
        )
        .select(
            "event_type",
            (F.col("s").cast("double") / F.col("n")).alias("mean"),
            F.sqrt(
                F.col("sq").cast("double") / F.col("n")
                - (F.col("s").cast("double") / F.col("n"))
                * (F.col("s").cast("double") / F.col("n"))
            ).alias("std"),
        )
        .where(F.col("std") > 0)
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > F.lit(2.5))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("zscore"),
        )
        .orderBy("event_id")
    )


ORACLE_OUTLIERS = """
WITH stats AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / n AS mean,
         sqrt(CAST(sq AS DOUBLE) / n
              - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS std
  FROM (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(18,2))) AS s,
           SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
             AS sq
    FROM events GROUP BY event_type
  )
)
, stats_defined AS (
  SELECT * FROM stats WHERE std > 0
)
SELECT events.event_id,
       events.event_type,
       events.value,
       round((events.value - stats_defined.mean) / stats_defined.std, 6)
         AS zscore
FROM events JOIN stats_defined
  ON events.event_type = stats_defined.event_type
WHERE abs((events.value - stats_defined.mean) / stats_defined.std) > 2.5
ORDER BY event_id
"""


# --- interval sweep-line: concurrent sessions ------------------------------


def sessions_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day, by sweep-line over the session
    intervals produced by :func:`sessionize_events`.

    Each session contributes +1 at start and -1 at end (end exclusive);
    net deltas are grouped per unique boundary timestamp FIRST, so the
    running sum is deterministic regardless of how ties would
    otherwise order. A zero-delta probe at every midnight in the
    boundary span makes each day's max reflect concurrency CARRIED IN
    at day start — a session spanning midnight counts toward every day
    it covers, and covered days with no boundaries of their own still
    appear.

    The prefix sum is distributed two-pass, never a global window over
    the boundary set: pass 1 runs the running sum WITHIN each day
    (partitioned window on ``t DIV 86400``); pass 2 rolls each day's
    net total into a carried offset over the DAYS only (the sole
    unpartitioned window — dimension-sized: one row per calendar day,
    regardless of corpus scale), broadcast-joined back so
    ``active = day_carry + local_prefix``. Identical to the global
    sweep to the hash; ``tests/test_plans.py`` pins the plan shape.
    """
    s = sessionize_events(spark, sf_dir)
    deltas = s.select(
        F.col("session_start").alias("t"), F.lit(1).alias("d")
    ).unionAll(s.select(F.col("session_end").alias("t"), F.lit(-1).alias("d")))
    probes = (
        deltas.agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
        .select(
            F.explode(
                F.sequence(F.expr("lo DIV 86400"), F.expr("hi DIV 86400"))
            ).alias("day")
        )
        .select((F.col("day") * 86400).alias("t"), F.lit(0).alias("d"))
    )
    net = (
        deltas.unionAll(probes)
        .groupBy("t")
        .agg(F.sum("d").alias("net"))
        .withColumn("day", F.expr("t DIV 86400"))
    )
    local_w = Window.partitionBy("day").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = net.withColumn("local_prefix", F.sum("net").over(local_w))
    day_w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        net.groupBy("day")
        .agg(F.sum("net").alias("day_net"))
        .select(
            "day",
            F.coalesce(F.sum("day_net").over(day_w), F.lit(0)).alias(
                "day_carry"
            ),
        )
    )
    active = local.join(F.broadcast(carry), "day").select(
        "day",
        (F.col("day_carry") + F.col("local_prefix")).alias("active"),
    )
    return (
        active.groupBy((F.col("day") * 86400).alias("day_start"))
        .agg(F.max("active").alias("peak_concurrency"))
        .orderBy("day_start")
    )


ORACLE_CONCURRENCY = f"""
WITH sessions AS ({ORACLE_SESSIONIZE}
), deltas AS (
  SELECT session_start AS t, 1 AS d FROM sessions
  UNION ALL
  SELECT session_end AS t, -1 AS d FROM sessions
), probes AS (
  SELECT unnest(generate_series(lo // 86400, hi // 86400)) * 86400 AS t,
         0 AS d
  FROM (SELECT MIN(t) AS lo, MAX(t) AS hi FROM deltas)
), net AS (
  SELECT t, SUM(d) AS net
  FROM (SELECT * FROM deltas UNION ALL SELECT * FROM probes)
  GROUP BY t
), active AS (
  SELECT t, SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS active
  FROM net
)
SELECT (t // 86400) * 86400 AS day_start,
       CAST(MAX(active) AS BIGINT) AS peak_concurrency
FROM active
GROUP BY 1
ORDER BY day_start
"""


# --- range-frame rolling window --------------------------------------------


def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-7-day rolling activity at every event: a RANGE
    window frame over epoch seconds (peers at the same timestamp enter
    the frame together, so the result is tie-proof), versus the
    rows-frame running totals elsewhere (window_running_revenue).

    One shuffle on user_id; the frame scan is a single sort-then-slide
    pass per key. Rolling sums of the 2-dp value column round to 4 dp
    (exact sums sit on the 0.01 grid — order-safe; see
    events_queries.ORACLE_HOURLY note).
    """
    ev = _events(spark, sf_dir, key="user_id")
    es = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(es)
        .rangeBetween(-(7 * 86400 - 1), 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("roll_n"),
            F.round(F.sum("value").over(w), 4).alias("roll_value"),
        )
        .orderBy("event_id")
    )


ORACLE_ROLLING_7D = """
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
       round(SUM(value) OVER w, 4) AS roll_value
FROM (SELECT user_id, event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY es
             RANGE BETWEEN 604799 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# --- run-length compression / SCD2-style validity ranges -------------------


def user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compress each user's event stream into validity ranges per
    consecutive run of the same event_type — the change-data-capture /
    slowly-changing-dimension shape: (user, state, valid_from,
    valid_to) with valid_to = next run's start (NULL while current).

    Islands come from a lag-based change flag cumsummed over ONE
    window spec (partition user_id, order ts,event_id), so the whole
    derivation is a single shuffle + sort; the island rollup and the
    valid_to lead reuse the user_id partitioning. Ties are broken by
    event_id — a total order, so runs are deterministic.
    """
    ev = _events(spark, sf_dir, key="user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w)),
        1,
    ).otherwise(0)
    runs = ev.select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        "event_id",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("run_id"),
    )
    islands = runs.groupBy("user_id", "run_id").agg(
        F.min_by("event_type", "event_id").alias("event_type"),
        F.min("es").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wu = Window.partitionBy("user_id").orderBy("run_id")
    return (
        islands.select(
            "user_id",
            "event_type",
            "valid_from",
            F.lead("valid_from").over(wu).alias("valid_to"),
            "n_events",
        )
        .orderBy("user_id", "valid_from")
    )


ORACLE_TYPE_HISTORY = """
WITH ordered AS (
  SELECT user_id, event_type, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR event_type <> lag(event_type) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type, es,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM ordered
), islands AS (
  SELECT user_id, run_id,
         MIN(event_type) AS event_type,
         MIN(es) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
         AS valid_to,
       n_events
FROM islands
ORDER BY user_id, valid_from
"""


# --- per-group linear trend (regression from exact moments) ----------------


def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of value over time per event type —
    slope/intercept from exact-decimal raw moments, the portable
    formulation of SQL's regr_slope/regr_intercept (whose built-ins
    are summation-order-dependent on doubles).

    x = seconds since the epoch day the dataset starts (bounded
    magnitude keeps the decimal moment widths in range); all five
    moments (n, Sx, Sy, Sxx, Sxy) are exact DECIMAL sums — order-free
    and map-side combinable — and the slope/intercept divisions are
    the same two double ops on both engines. One shuffle (the groupBy);
    output rounds to 6 dp.
    """
    ev = _events(spark, sf_dir)
    base = ev.agg(
        F.expr("MIN(unix_timestamp(ts) DIV 86400) * 86400").alias("_t0")
    )
    with_x = ev.join(F.broadcast(base)).select(
        "event_type",
        (F.unix_timestamp("ts") - F.col("_t0")).cast("decimal(18,0)").alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    agg = with_x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (
        agg.select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.round(slope * 86400, 6).alias("slope_per_day"),
            F.round((sy - slope * sx) / n, 6).alias("intercept"),
        )
        .orderBy("event_type")
    )


ORACLE_VALUE_TREND = """
WITH based AS (
  SELECT event_type,
         CAST(CAST(floor(epoch(ts)) AS BIGINT)
              - (SELECT MIN(CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
                 FROM events) AS DECIMAL(18,0)) AS x,
         CAST(value AS DECIMAL(18,2)) AS y
  FROM events
), moments AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM based GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 86400, 6)
         AS slope_per_day,
       round((CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept
FROM moments
ORDER BY event_type
"""


# --- robust (median/MAD) outliers ------------------------------------------

# scaled-MAD consistency constant (MAD * 1.4826 estimates sigma for a
# normal), the textbook robust z-score; the moment-based z in
# events_value_outliers is pulled around by the very outliers it is
# trying to flag — the median/MAD variant is the heavy-tail-safe form.
_MAD_SCALE = 1.4826
_ROBUST_Z = 3.5


def _discrete_median(df: DataFrame, key: str, col: str, out: str) -> DataFrame:
    """Lower-median order statistic per key: the value at 1-based rank
    floor((n+1)/2) ordered by (col, event_id). An ORDER-STATISTIC
    median, not an interpolated one: interpolation averages two
    doubles (engine-specific operation order → ULP drift across
    engines), while picking an element is bit-exact everywhere. Two
    window passes over one shuffle on the key."""
    w = Window.partitionBy(key).orderBy(col, "event_id")
    wn = Window.partitionBy(key)
    return (
        df.select(
            key,
            F.col(col),
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(wn).alias("_n"),
        )
        .where(F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
        .select(key, F.col(col).alias(out))
    )


def events_value_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-score outliers per event type:
    |value - median| / (1.4826 * MAD) > 3.5, both statistics as exact
    order statistics (see _discrete_median). The per-type stats fold
    to one row per type (bounded dimension) and broadcast back over
    the events scan — same policy as the moment-based z variant;
    adds one extra shuffle for the deviation ranking."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", "event_id", "value")
    med = _discrete_median(base, "event_type", "value", "med")
    dev = base.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("value") - F.col("med")).alias("_dev"),
    )
    mad = _discrete_median(dev, "event_type", "_dev", "mad").where(
        F.col("mad") > 0
    )
    stats = med.join(mad, "event_type")
    z = (F.col("value") - F.col("med")) / (F.lit(_MAD_SCALE) * F.col("mad"))
    return (
        base.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > F.lit(_ROBUST_Z))
        .select(
            "event_id",
            "event_type",
            "value",
            F.col("med").alias("median"),
            F.col("mad"),
            F.round(z, 6).alias("robust_z"),
        )
        .orderBy("event_id")
    )


ORACLE_ROBUST_OUTLIERS = f"""
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, value AS med FROM ranked
  WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)
),
dev_ranked AS (
  SELECT e.event_type, e.event_id, abs(e.value - med.med) AS dev,
         ROW_NUMBER() OVER (PARTITION BY e.event_type
                            ORDER BY abs(e.value - med.med), e.event_id) AS rn,
         COUNT(*) OVER (PARTITION BY e.event_type) AS n
  FROM events e JOIN med ON e.event_type = med.event_type
),
mad AS (
  SELECT event_type, dev AS mad FROM dev_ranked
  WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT) AND dev > 0
)
SELECT e.event_id, e.event_type, e.value, med.med AS median, mad.mad,
       round((e.value - med.med) / ({_MAD_SCALE} * mad.mad), 6) AS robust_z
FROM events e
JOIN med ON e.event_type = med.event_type
JOIN mad ON e.event_type = mad.event_type
WHERE abs((e.value - med.med) / ({_MAD_SCALE} * mad.mad)) > {_ROBUST_Z}
ORDER BY e.event_id
"""


# --- per-user EWMA (ordered-fold sequence feature) -------------------------

_EWMA_ALPHA = 0.2


def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of value per user over
    the user's event sequence (time order): the classic recency-
    weighted engagement feature. EWMA is a RECURRENCE (s = a*v +
    (1-a)*s), not a window sum, so it cannot be a plain OVER-window
    aggregate; the portable exact form is an ordered fold:
    collect the user's values sorted by (ts, event_id) and fold left
    with the recurrence — identical double operation sequence in
    Spark (``aggregate``) and DuckDB (``list_reduce``).

    Scale: one shuffle (groupBy user); the fold is per-key linear and
    per-user sequences are bounded (same contract as sequence packing
    / session features). For unbounded keys the streaming form is
    applyInPandasWithState with the scalar s as state — this is the
    batch backfill of exactly that feature."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("_seq")
    )
    vals = F.transform(F.col("_seq"), lambda x: x["value"])
    ewma = F.aggregate(
        F.slice(vals, F.lit(2), F.size(vals)),
        F.element_at(vals, F.lit(1)),
        lambda acc, v: acc * F.lit(1 - _EWMA_ALPHA) + v * F.lit(_EWMA_ALPHA),
    )
    return (
        seq.select(
            "user_id",
            F.size("_seq").cast("long").alias("n_events"),
            F.round(ewma, 6).alias("ewma_value"),
        )
        .orderBy("user_id")
    )


ORACLE_USER_EWMA = f"""
WITH seq AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id) AS vals,
         COUNT(*) AS n
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       round(list_reduce(vals,
             (acc, v) -> acc * {1 - _EWMA_ALPHA} + v * {_EWMA_ALPHA}), 6)
         AS ewma_value
FROM seq ORDER BY user_id
"""


# --- marketing attribution: time-bounded conditional window ----------------

_ATTR_LOOKBACK_US = 7 * 86400 * 1_000_000  # 7-day lookback, microseconds


def attribution_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-7-days touch attribution: for every purchase, count the
    user's view/click touches in the preceding 7 days (strictly before
    the purchase, microsecond resolution), then roll purchases up per
    day into attributed vs organic revenue.

    The lookback is a time-bounded conditional window — a RANGE frame
    over ``unix_micros(ts)`` summing a 0/1 touch flag — so the whole
    scan is one shuffle (the per-user sort) with no self-join and no
    range-join explosion; the frame state Spark keeps per user is the
    sliding deque, not the 7-day event list. Revenue sums are exact
    DECIMAL (order-free, map-side combinable) cast to DOUBLE at the
    edge per the oracle contract.

    At 100 TB the window partitions by user (millions of partitions,
    no skew: one user's history is bounded); the daily rollup is a
    second small shuffle. The streaming twin is the per-key deque in
    ``streaming/enrich.py`` — this is its batch backfill.
    """
    ev = _events(spark, sf_dir, key="user_id")
    tagged = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.unix_micros("ts").alias("t"),
        F.when(F.col("event_type").isin("view", "click"), 1)
        .otherwise(0)
        .alias("is_touch"),
    )
    look = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-_ATTR_LOOKBACK_US, -1)
    )
    counted = tagged.withColumn(
        "n_touches", F.coalesce(F.sum("is_touch").over(look), F.lit(0))
    )
    purchases = counted.where(F.col("event_type") == "purchase")
    dec = F.col("value").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    day = F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_start")
    return (
        purchases.groupBy(day)
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum((F.col("n_touches") > 0).cast("long")).alias("n_attributed"),
            F.sum(F.when(F.col("n_touches") > 0, dec).otherwise(zero))
            .cast("double")
            .alias("attributed_revenue"),
            F.sum(F.when(F.col("n_touches") == 0, dec).otherwise(zero))
            .cast("double")
            .alias("organic_revenue"),
        )
        .orderBy("day_start")
    )


ORACLE_ATTRIBUTION = f"""
WITH tagged AS (
  SELECT user_id, ts, event_type, value, epoch_us(ts) AS t,
         CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END
           AS is_touch
  FROM events
), counted AS (
  SELECT *,
         COALESCE(SUM(is_touch) OVER (
           PARTITION BY user_id ORDER BY t
           RANGE BETWEEN {_ATTR_LOOKBACK_US} PRECEDING AND 1 PRECEDING
         ), 0) AS n_touches
  FROM tagged
)
SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_start,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN n_touches > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_attributed,
       CAST(SUM(CASE WHEN n_touches > 0
                     THEN CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         AS attributed_revenue,
       CAST(SUM(CASE WHEN n_touches = 0
                     THEN CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         AS organic_revenue
FROM counted
WHERE event_type = 'purchase'
GROUP BY 1
ORDER BY day_start
"""


# --- resampling: linear interpolation over the hourly spine ----------------


def events_hourly_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly mean value per event type with missing hours linearly
    interpolated between the nearest observed neighbours (edges clamp
    to the nearest observation) — the standard resample step before
    feeding a sparse series to a windowed model.

    Built on the same broadcast hour-spine as ``events_hourly_gapfill``;
    the fill itself is two IGNORE-NULLS window passes per series
    (last-preceding and first-following observation + its hour), then
    one arithmetic blend. Hourly means come from exact DECIMAL sums so
    the interpolation arithmetic sees identical doubles on both
    engines; op order in the blend is pinned to match the oracle.

    At 100 TB the windows partition by series key (here event_type;
    generally metric x entity — millions of independent partitions)
    and the spine join stays broadcast because the spine is bounded by
    (hours x series), never by events.
    """
    ev = _events(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(hour.alias("h"), "event_type").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        F.count("value").alias("nv"),
    )
    spine_hours = (
        ev.agg(F.min(hour).alias("lo"), F.max(hour).alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
    )
    types = ev.select("event_type").distinct()
    grid = (
        spine_hours.crossJoin(F.broadcast(types))
        .join(hourly, ["h", "event_type"], "left")
        .select(
            "event_type",
            F.unix_timestamp("h").alias("hu"),
            (F.col("sv").cast("double") / F.col("nv").cast("double"))
            .alias("avg_v"),
            F.coalesce("nv", F.lit(0)).alias("nv"),
        )
    )
    prev_w = (
        Window.partitionBy("event_type")
        .orderBy("hu")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    next_w = (
        Window.partitionBy("event_type")
        .orderBy("hu")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_hu = F.when(F.col("avg_v").isNotNull(), F.col("hu"))
    filled = grid.select(
        "event_type",
        "hu",
        "avg_v",
        "nv",
        F.last("avg_v", ignorenulls=True).over(prev_w).alias("prev_v"),
        F.last(obs_hu, ignorenulls=True).over(prev_w).alias("prev_h"),
        F.first("avg_v", ignorenulls=True).over(next_w).alias("next_v"),
        F.first(obs_hu, ignorenulls=True).over(next_w).alias("next_h"),
    )
    frac = (F.col("hu") - F.col("prev_h")) / (F.col("next_h") - F.col("prev_h"))
    blend = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
    interp = (
        F.when(F.col("avg_v").isNotNull(), F.col("avg_v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(blend)
    )
    return filled.select(
        F.col("hu").alias("hour_start"),
        "event_type",
        F.col("nv").cast("long").alias("n_obs"),
        F.round(interp, 6).alias("value_interp"),
    ).orderBy("event_type", "hour_start")


ORACLE_HOURLY_INTERPOLATED = """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo,
         date_trunc('hour', MAX(ts)) AS hi
  FROM events
), hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         SUM(CAST(value AS DECIMAL(18,2))) AS sv, COUNT(value) AS nv
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT types.event_type,
         CAST(floor(epoch(hours.h)) AS BIGINT) AS hu,
         CAST(hourly.sv AS DOUBLE) / CAST(hourly.nv AS DOUBLE) AS avg_v,
         COALESCE(hourly.nv, 0) AS nv
  FROM hours CROSS JOIN types
  LEFT JOIN hourly ON hourly.h = hours.h
                  AND hourly.event_type = types.event_type
), filled AS (
  SELECT *,
         last_value(avg_v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hu ROWS UNBOUNDED PRECEDING
         ) AS prev_v,
         last_value(CASE WHEN avg_v IS NOT NULL THEN hu END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY hu ROWS UNBOUNDED PRECEDING)
           AS prev_h,
         first_value(avg_v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hu
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         ) AS next_v,
         first_value(CASE WHEN avg_v IS NOT NULL THEN hu END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY hu
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
  FROM grid
)
SELECT hu AS hour_start,
       event_type,
       CAST(nv AS BIGINT) AS n_obs,
       round(CASE WHEN avg_v IS NOT NULL THEN avg_v
                  WHEN prev_v IS NULL THEN next_v
                  WHEN next_v IS NULL THEN prev_v
                  ELSE prev_v + (next_v - prev_v)
                       * ((hu - prev_h) / (next_h - prev_h)) END, 6)
         AS value_interp
FROM filled
ORDER BY event_type, hour_start
"""


# --- two-sample KS drift monitor ---------------------------------------------

_KS_SPLIT = "2024-01-16"


def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per event type, the two-sample
    Kolmogorov-Smirnov statistic between the value distributions of
    the first and second half of the month (split at a fixed date) —
    the standard gate before retraining on, or mixing in, a new corpus
    slice ("did `value` drift?").

    Exact, not sketched: KS = max over observed points of
    |ECDF_a - ECDF_b|, computed with ONE pass of RANGE-framed window
    sums over the union of both samples (ECDF at v counts ALL rows
    with value <= v, which the default RANGE frame gives on both
    engines — tie handling falls out for free, no per-tie
    correction). Scale: the window partitions by event_type, so this
    is a partitioned sort, never a global one; output is one row per
    type. No sums of doubles anywhere — cumulative INTEGER counts
    divided once at the end, so the statistic is bit-identical in the
    oracle.
    """
    ev = _events(spark, sf_dir)
    tagged = ev.select(
        "event_type",
        "value",
        F.when(F.col("ts") < F.lit(_KS_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("_in_a"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = Window.partitionBy("event_type")
    cum = tagged.select(
        "event_type",
        "value",
        F.sum("_in_a").over(w).alias("_ca"),
        F.sum(1 - F.col("_in_a")).over(w).alias("_cb"),
        F.sum("_in_a").over(totals).alias("_na"),
        F.sum(1 - F.col("_in_a")).over(totals).alias("_nb"),
    )
    gap = F.abs(
        F.col("_ca") / F.col("_na") - F.col("_cb") / F.col("_nb")
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("_na").alias("n_first_half"),
            F.max("_nb").alias("n_second_half"),
            F.round(F.max(gap), 6).alias("ks_stat"),
        )
        .orderBy("event_type")
    )


ORACLE_KS_DRIFT = f"""
WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}' THEN 1 ELSE 0 END AS in_a
  FROM events
),
cum AS (
  SELECT event_type, value,
         SUM(in_a) OVER (PARTITION BY event_type ORDER BY value
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         SUM(1 - in_a) OVER (PARTITION BY event_type ORDER BY value
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         SUM(in_a) OVER (PARTITION BY event_type) AS na,
         SUM(1 - in_a) OVER (PARTITION BY event_type) AS nb
  FROM tagged
)
SELECT event_type,
       CAST(MAX(na) AS BIGINT) AS n_first_half,
       CAST(MAX(nb) AS BIGINT) AS n_second_half,
       round(MAX(abs(ca * 1.0 / na - cb * 1.0 / nb)), 6) AS ks_stat
FROM cum GROUP BY event_type ORDER BY event_type
"""


def events_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical twin of events_ks_drift: chi-square contributions
    for the event-type MIX between the two halves of the month. Each
    row is one cell pair of the 2xK contingency table — observed
    counts, margin-expected counts, and the cell's chi2 contribution —
    so a drifted category is readable directly instead of hiding
    inside one omnibus number (summing the column gives the classic
    statistic; K-1 dof).

    All counts are integers aggregated with map-side partials; the
    expected values and contributions are a handful of divisions per
    OUTPUT row (K rows), so determinism is free — no double summation
    ever happens inside the engine.
    """
    ev = _events(spark, sf_dir)
    tagged = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit(_KS_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("_in_a"),
    )
    counts = tagged.groupBy("event_type").agg(
        F.sum("_in_a").alias("n_first"),
        F.sum(1 - F.col("_in_a")).alias("n_second"),
    )
    tot = Window.partitionBy()
    with_margins = counts.select(
        "event_type",
        "n_first",
        "n_second",
        F.sum("n_first").over(tot).alias("_ta"),
        F.sum("n_second").over(tot).alias("_tb"),
    )
    row_total = F.col("n_first") + F.col("n_second")
    grand = F.col("_ta") + F.col("_tb")
    e_first = row_total * F.col("_ta") / grand
    e_second = row_total * F.col("_tb") / grand
    # squares via explicit multiply, not pow(): Math.pow and DuckDB pow
    # are not guaranteed bit-identical; x*x is
    d_first = F.col("n_first") - e_first
    d_second = F.col("n_second") - e_second
    chi2 = d_first * d_first / e_first + d_second * d_second / e_second
    return with_margins.select(
        "event_type",
        "n_first",
        "n_second",
        F.round(e_first, 6).alias("expected_first"),
        F.round(e_second, 6).alias("expected_second"),
        F.round(chi2, 6).alias("chi2_contribution"),
    ).orderBy("event_type")


ORACLE_CATEGORICAL_DRIFT = f"""
WITH tagged AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}' THEN 1 ELSE 0 END AS in_a
  FROM events
),
counts AS (
  SELECT event_type,
         SUM(in_a) AS n_first,
         SUM(1 - in_a) AS n_second
  FROM tagged GROUP BY event_type
),
m AS (
  SELECT event_type, n_first, n_second,
         SUM(n_first) OVER () AS ta,
         SUM(n_second) OVER () AS tb
  FROM counts
)
SELECT event_type,
       CAST(n_first AS BIGINT) AS n_first,
       CAST(n_second AS BIGINT) AS n_second,
       round((n_first + n_second) * ta * 1.0 / (ta + tb), 6) AS expected_first,
       round((n_first + n_second) * tb * 1.0 / (ta + tb), 6) AS expected_second,
       round((n_first - (n_first + n_second) * ta * 1.0 / (ta + tb))
             * (n_first - (n_first + n_second) * ta * 1.0 / (ta + tb))
               / ((n_first + n_second) * ta * 1.0 / (ta + tb))
             + (n_second - (n_first + n_second) * tb * 1.0 / (ta + tb))
             * (n_second - (n_first + n_second) * tb * 1.0 / (ta + tb))
               / ((n_first + n_second) * tb * 1.0 / (ta + tb)), 6)
         AS chi2_contribution
FROM m ORDER BY event_type
"""


def events_weekday_seasonal_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonality-aware volume anomalies: each (day, event_type)
    count compared to the average for its WEEKDAY x type cell (a
    Monday is judged against Mondays — the trailing-average monitor in
    partition_health flags weekends instead). ratio and the <0.5 flag
    come from unrounded integer-derived doubles, so both engines emit
    identical bits. Two hash aggregates + one broadcast-sized join of
    the 7 x |types| baseline."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_start"),
        F.dayofweek(F.col("ts")).alias("weekday"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    baseline = daily.groupBy("weekday", "event_type").agg(
        F.sum("n_events").alias("cell_total"),
        F.count(F.lit(1)).alias("cell_days"),
    )
    joined = daily.join(baseline, ["weekday", "event_type"])
    expected = F.col("cell_total") / F.col("cell_days")
    return joined.select(
        "day_start",
        "weekday",
        "event_type",
        "n_events",
        expected.alias("weekday_avg"),
        (F.col("n_events") / expected).alias("ratio"),
        (F.col("n_events") < expected * 0.5).alias("is_anomalous"),
    ).orderBy("day_start", "event_type")


ORACLE_WEEKDAY_SEASONAL = """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
         CAST(dayofweek(ts) + 1 AS INT) AS weekday,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2, 3
),
baseline AS (
  SELECT weekday, event_type,
         CAST(SUM(n_events) AS BIGINT) AS cell_total,
         CAST(COUNT(*) AS BIGINT) AS cell_days
  FROM daily GROUP BY 1, 2
)
SELECT d.day_start, d.weekday, d.event_type, d.n_events,
       b.cell_total / CAST(b.cell_days AS DOUBLE) AS weekday_avg,
       d.n_events / (b.cell_total / CAST(b.cell_days AS DOUBLE)) AS ratio,
       d.n_events < (b.cell_total / CAST(b.cell_days AS DOUBLE)) * 0.5
         AS is_anomalous
FROM daily d JOIN baseline b USING (weekday, event_type)
ORDER BY day_start, event_type
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-flow (Markov) transition counts: for each user, the
    per-(ts, event_id)-ordered event sequence yields (prev_type,
    next_type) adjacent pairs; counts plus the per-prev-type row
    share. One lag window (user shuffle) + one hash aggregate; shares
    are unrounded integer-derived doubles."""
    ev = _events(spark, sf_dir, key="user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n") / F.sum("n").over(wt)).alias("share"),
    ).orderBy("prev_type", "next_type")


ORACLE_TRANSITION_MATRIX = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       n / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS share
FROM pairs ORDER BY prev_type, next_type
"""


def events_twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user over irregularly-sampled
    events (each value holds until the next event; last value carries
    no weight) — the TWAP/telemetry-mean that a plain AVG gets wrong
    whenever sampling is bursty.

    The weighted sum is an ordered fold over the user's event sequence
    (zip adjacent pairs -> value * microsecond gap -> left fold), the
    same fixed-order double discipline as the EWMA recurrence: weights
    are exact integer micros, products fold in event order on both
    engines, so the 6-dp quotient is bit-stable. One shuffle (groupBy
    user); per-user sequences are bounded, as everywhere else in the
    session/feature family — ``events_twap_per_user_windowed`` is the
    registered hedge when that assumption fails (per-(user, day)
    segments bound the array by daily activity instead). Single-event
    users emit NULL (zero span)."""
    ev = _events(spark, sf_dir, key="user_id")
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("t"), "event_id", "value"
                )
            )
        ).alias("_seq")
    )
    n = F.size("_seq")
    span = F.element_at("_seq", -1)["t"] - F.element_at("_seq", 1)["t"]
    pairs = F.zip_with(
        F.slice("_seq", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("_seq", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: a["value"] * (b["t"] - a["t"]),
    )
    wsum = F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)
    return seq.select(
        "user_id",
        n.cast("long").alias("n_events"),
        span.alias("span_us"),
        F.when(span > 0, F.round(wsum / span, 6)).alias("twap_value"),
    ).orderBy("user_id")


ORACLE_TWAP = """
WITH seq AS (
  SELECT user_id,
         list(epoch_us(ts) ORDER BY ts, event_id) AS t,
         list(value ORDER BY ts, event_id) AS v
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(len(v) AS BIGINT) AS n_events,
       CAST(t[len(t)] - t[1] AS BIGINT) AS span_us,
       CASE WHEN t[len(t)] > t[1] THEN
         round(list_reduce(list_prepend(0.0,
                 list_transform(generate_series(1, len(v) - 1),
                                i -> v[i] * (t[i + 1] - t[i]))),
               (acc, x) -> acc + x)
               / (t[len(t)] - t[1]), 6)
       ELSE NULL END AS twap_value
FROM seq ORDER BY user_id
"""


def events_twap_per_user_windowed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The windowed TWAP twin (VERDICT r5 item 7): the same
    time-weighted average, computed per (user, day) — each day's
    segment is its own hold-until-next sequence, values never carry
    across the day boundary. This is the documented hedge against
    per-user sequence skew in ``events_twap_per_user``: that query's
    per-group array is bounded only by per-user activity, while here
    it is bounded by per-user-per-DAY activity — the same
    exact-vs-bounded pairing as the percentile family. Same ordered
    fold, same integer-microsecond weights, same shuffle count (one,
    on the composite key)."""
    ev = _events(spark, sf_dir, key="user_id")
    day = F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias(
        "day_start"
    )
    seq = ev.groupBy("user_id", day).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.unix_micros("ts").alias("t"), "event_id", "value")
            )
        ).alias("_seq")
    )
    n = F.size("_seq")
    span = F.element_at("_seq", -1)["t"] - F.element_at("_seq", 1)["t"]
    pairs = F.zip_with(
        F.slice("_seq", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("_seq", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: a["value"] * (b["t"] - a["t"]),
    )
    wsum = F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)
    return seq.select(
        "user_id",
        "day_start",
        n.cast("long").alias("n_events"),
        span.alias("span_us"),
        F.when(span > 0, F.round(wsum / span, 6)).alias("twap_value"),
    ).orderBy("user_id", "day_start")


ORACLE_TWAP_WINDOWED = """
WITH seq AS (
  SELECT user_id,
         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_start,
         list(epoch_us(ts) ORDER BY ts, event_id) AS t,
         list(value ORDER BY ts, event_id) AS v
  FROM events GROUP BY user_id, day_start
)
SELECT user_id, day_start, CAST(len(v) AS BIGINT) AS n_events,
       CAST(t[len(t)] - t[1] AS BIGINT) AS span_us,
       CASE WHEN t[len(t)] > t[1] THEN
         round(list_reduce(list_prepend(0.0,
                 list_transform(generate_series(1, len(v) - 1),
                                i -> v[i] * (t[i + 1] - t[i]))),
               (acc, x) -> acc + x)
               / (t[len(t)] - t[1]), 6)
       ELSE NULL END AS twap_value
FROM seq ORDER BY user_id, day_start
"""


def events_drift_score_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed drift scoring (streaming/drift.windowed_drift
    — the batch twin of the continuous monitor): train a categorical
    reference profile on the first half of the month, then score every
    HOUR of the second half with Pearson's chi² against it, plus the
    unseen-category count. The hash-matched oracle pins the exact
    arithmetic the streaming monitor emits (same ordered fold over
    sorted chi² terms), so the stream/batch equivalence test in
    tests/test_streaming_drift.py transitively pins the stream.

    Scale: the profile is K rows (driver-held literals — the same
    model-state pattern as k-means centroids and the persisted LM);
    the scoring pass is one windowed aggregation with per-category
    conditional counts, one shuffle on the hour key."""
    from ..streaming.drift import reference_profile, windowed_drift

    ev = _events(spark, sf_dir)
    split = F.lit(_KS_SPLIT).cast("timestamp")
    profile = reference_profile(ev.where(F.col("ts") < split))
    return windowed_drift(ev.where(F.col("ts") >= split), profile).orderBy(
        "window_start"
    )


ORACLE_DRIFT_SCORE_HOURLY = f"""
WITH ref AS (
  SELECT event_type, count(*) AS nc FROM events
  WHERE ts < TIMESTAMP '{_KS_SPLIT}' GROUP BY 1
),
reftot AS (SELECT sum(nc) AS nr FROM ref),
cur AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
           AS window_start,
         event_type, count(*) AS obs
  FROM events WHERE ts >= TIMESTAMP '{_KS_SPLIT}' GROUP BY 1, 2
),
tot AS (SELECT window_start, sum(obs) AS n_events FROM cur GROUP BY 1),
terms AS (
  SELECT t.window_start,
         COALESCE(c.obs, 0) AS obs,
         t.n_events * (CAST(r.nc AS DOUBLE) / rt.nr) AS expected
  FROM tot t
  CROSS JOIN ref r
  CROSS JOIN reftot rt
  LEFT JOIN cur c
    ON c.window_start = t.window_start AND c.event_type = r.event_type
)
SELECT t.window_start,
       CAST(t.n_events AS BIGINT) AS n_events,
       CAST(t.n_events - sum(terms.obs) AS BIGINT) AS n_unseen,
       round(list_reduce(list_prepend(0.0, list_sort(list(
               (terms.obs - terms.expected) * (terms.obs - terms.expected)
                 / terms.expected))),
             (acc, x) -> acc + x), 6) AS chi2
FROM terms JOIN tot t USING (window_start)
GROUP BY t.window_start, t.n_events
ORDER BY t.window_start
"""
