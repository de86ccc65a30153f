"""Central query registry: name -> (spark, sf_dir) -> DataFrame, plus
the matching DuckDB oracle SQL. ``__spark_entry__`` re-exports these.

Conventions (driver contract):
- every computed column is aliased identically in Spark and SQL;
- timestamps/window bounds emitted as epoch BIGINT;
- arrays emitted as sorted comma-joined strings;
- money aggregates emitted as DECIMAL with explicit final casts on
  both sides (order-independent exact sums -> stable value hashes);
- queries without an oracle entry (approx sketches, stateful
  streaming) get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import bot_detection as bd

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# --- reference-parity bot-detection family (SURVEY §2.3-2.5, F1) -----------
register(
    "bot_stats_sliding", bd.windowed_stats_sliding, bd.ORACLE_STATS_SLIDING
)
register(
    "bot_stats_tumbling", bd.windowed_stats_tumbling, bd.ORACLE_STATS_TUMBLING
)
register(
    "bot_stats_two_level", bd.windowed_stats_two_level, bd.ORACLE_STATS_SLIDING
)
register("bot_classified_windows", bd.classified_stats, bd.ORACLE_CLASSIFIED)
register("bot_classified_totals", bd.classified_totals, bd.ORACLE_TOTALS_CLASSIFIED)
register("bot_verdicts", bd.bot_verdicts, bd.ORACLE_BOT_VERDICTS)
