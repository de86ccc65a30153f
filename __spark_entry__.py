"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (whole-history bot
classification over events at sf0.001). ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the north-star extensions, backed by
``in_stream_processing_course_spark.plans.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from in_stream_processing_course_spark.plans.registry import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-ip whole-history stats + bot verdict (classifier
    F1 over aggregation A4/A5) on sf0.001."""
    return QUERIES["bot_classified_totals"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
