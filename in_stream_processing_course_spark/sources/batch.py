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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool = True
) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/prunes columns
    into this scan automatically when the downstream plan allows
    (predicate pushdown and pruning traverse the repartition below).

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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if fan_out and name in _FAN_OUT_TABLES:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
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
