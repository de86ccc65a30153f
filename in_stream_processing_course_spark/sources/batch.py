"""Batch parquet readers for the driver test tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TABLE_NAMES

# Fact/work tables whose downstream map-side work (window fan-out,
# shingle hashing, money arithmetic) is heavy enough to need full core
# utilization. Dimension tables (region/nation/customer/part/supplier)
# stay as-scanned: they are broadcast-joined or trivially small, and an
# extra exchange would only add a stage.
_FAN_OUT_TABLES = {"events", "lineitem", "orders", "documents", "embeddings"}

# Plan memo (r13, guide §1/§7.3 — driver-side latency is real wall time):
# a DataFrame is an immutable lazy PLAN, and building one from parquet
# costs ~100 ms of driver work per call (footer/schema inference plus the
# fan-out gate's .rdd physical-planning probe) — measured 103 ms
# read.parquet + 4.5 ms .rdd at sf0.1. Query builders call load_table
# 231 times across the registry and the bench re-builds each query every
# timed rep, so this memo removes ~0.1 s/table/rep of pure py4j latency.
# NO DATA is cached — every execution still scans parquet; the memo is
# plan metadata, the same thing a metastore-backed catalog gives a real
# deployment for free. Keyed per (application, dir, table, fan_out) so
# fresh sessions and different scale factors never share an entry;
# entries from a PREVIOUS application are evicted on insert (r14,
# VERDICT r13 what's-wrong #5 — a long-lived process cycling sessions
# must not accumulate dead JVM plan handles).
_TABLE_PLAN_MEMO: dict[tuple[str, str, str, bool], DataFrame] = {}

# The memoized scan's input-partition count (the fan-out gate's probe):
# one .rdd physical-planning round-trip per (app, dir, table) instead of
# one per query construction (ADVICE r13 #3 — the probe was re-running
# on every composed plan; for the narrow projection chains the callers
# build, the composed plan's partition count IS the base scan's).
_SCAN_PARTS_MEMO: dict[tuple[str, str, str], int] = {}


def _evict_stale_generations(app_id: str) -> None:
    """Drop memo entries owned by a different (dead) applicationId."""
    for memo in (_TABLE_PLAN_MEMO, _SCAN_PARTS_MEMO):
        stale = [k for k in memo if k[0] != app_id]
        for k in stale:
            del memo[k]


def invalidate_table_plans(sf_dir: str | None = None) -> None:
    """Invalidate memoized table plans (all, or one ``sf_dir``'s).

    The memo assumes test tables are IMMUTABLE for the application's
    lifetime (true for the driver's read-only testdata). A caller that
    overwrites ``{sf_dir}/{name}.parquet`` mid-session must call this
    first, or the stale memoized file listing will surface missing
    files or stale rows on the next read (ADVICE r13 #1).
    """
    for memo in (_TABLE_PLAN_MEMO, _SCAN_PARTS_MEMO):
        stale = [k for k in memo if sf_dir is None or k[1] == sf_dir]
        for k in stale:
            del memo[k]


def scan_partitions(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Input-partition count of the memoized base scan (memoized —
    see :data:`_SCAN_PARTS_MEMO`)."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    n = _SCAN_PARTS_MEMO.get(key)
    if n is None:
        n = load_table(spark, sf_dir, name, fan_out=False).rdd.getNumPartitions()
        _SCAN_PARTS_MEMO[key] = n
    return n


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool = True
) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/prunes columns
    into this scan automatically when the downstream plan allows
    (predicate pushdown and pruning traverse the repartition below).

    The returned DataFrame is a memoized PLAN whose parquet file
    listing was snapshotted on first load: the table directory must
    stay immutable for the application's lifetime (the driver's
    testdata contract). Overwrite-then-reload callers must
    :func:`invalidate_table_plans` first.

    Timestamp columns: the driver's tables have shipped with both
    TIMESTAMP(NANOS) (Spark 4 rejects it unless ``nanosAsLong`` reads
    it as long nanos) and TIMESTAMP(MICROS) ``isAdjustedToUTC=false``
    (reads as TIMESTAMP_NTZ). Both normalize downstream via
    :func:`..operators.projections.ensure_timestamp`.

    Fan-out: the driver's test tables are single-file, single-row-group
    parquet, so the scan yields ONE input partition and every map-side
    operator upstream of the first shuffle runs on one core. When a
    fact table's scan has fewer splits than the cluster's parallelism,
    round-robin repartition to full width (measured 2.5-7x on the
    window-fanout and shingle-hash queries at sf0.1 on local[32]). At
    real scale the scan has more splits than cores and this is a no-op
    — the condition, not a config, keeps it from ever shuffling a
    100 TB input.
    """
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name, fan_out)
    cached = _TABLE_PLAN_MEMO.get(key)
    if cached is not None:
        return cached
    _evict_stale_generations(app_id)
    base_key = (app_id, sf_dir, name, False)
    df = _TABLE_PLAN_MEMO.get(base_key)
    if df is None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _TABLE_PLAN_MEMO[base_key] = df
    if fan_out and name in _FAN_OUT_TABLES:
        par = spark.sparkContext.defaultParallelism
        if scan_partitions(spark, sf_dir, name) < par:
            df = df.repartition(par)
    _TABLE_PLAN_MEMO[key] = df
    return df


def fan_out_by(
    df: DataFrame, *cols: str, n_partitions: int | None = None
) -> DataFrame:
    """Keyed fan-out (r13, guide §2.4 "share one exchange").

    When a narrow scan must be repartitioned for parallelism anyway,
    hash-repartitioning by the DOWNSTREAM group key instead of
    round-robin makes the fan-out exchange satisfy the first
    aggregation's ClusteredDistribution (hash on a subset of the group
    keys co-locates every group), so Catalyst elides every later
    exchange keyed on a superset of ``cols`` — measured on
    bot_stats_two_level: 3 Exchanges -> 1, wall 3.4 s -> 1.7 s,
    hash-identical output. It also skips round-robin's
    sort-before-repartition pass (SPARK-23207).

    Same gate as load_table's fan-out: a no-op whenever the input is
    already at least as wide as the cluster, i.e. at real scale this
    never shuffles — the plan reverts to partial+final aggregation,
    which is the right shape when per-key partial compression exists.
    Use only with high-cardinality keys (key count >> cores); a
    low-cardinality key would collapse map-side parallelism, and a
    salted pipeline must keep round-robin or the salt stops spreading
    its hot key.

    ``n_partitions``: the input's partition count, when the caller
    already knows it (pass :func:`scan_partitions` of the base table —
    for the narrow projection chains the plan builders compose, the
    composed plan's partition count equals the base scan's). Skips a
    per-call .rdd physical-planning probe (ADVICE r13 #3).
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    n_in = n_partitions if n_partitions is not None else df.rdd.getNumPartitions()
    if n_in < par:
        return df.repartition(par, *cols)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for the SQL surface."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_evolving(
    spark: SparkSession,
    path: str,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Schema-evolution-tolerant scan: a long-lived 100 TB table
    accumulates files written under DIFFERENT schema versions (new
    columns appear; old files simply lack them). ``mergeSchema`` makes
    the footer union the read schema (per-file reconciliation happens
    in the scan — columns absent from a file surface as null), and
    ``defaults`` backfills the nulls so downstream operators see one
    stable contract instead of version-sniffing.

    Cost note: schema merging lists every footer at planning time —
    fine per-job, but persist the merged schema to the metastore once
    a table stabilizes rather than re-merging each read.
    """
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(path)
    for col, default in (defaults or {}).items():
        df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return df
