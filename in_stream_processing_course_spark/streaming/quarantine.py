"""Streaming dead-letter quarantine: route rows that violate the
table contract to a quarantine table (with the failed check recorded)
and pass clean rows through — per micro-batch, exactly-once.

The production shape for "bad data must not poison the table, but
must not vanish either": the same declarative ``Check`` list that
gates publishes (operators/quality_checks.py) compiles here to a
row-level disjunction evaluated ONCE per row (a single projection —
no second scan, no join), splitting each micro-batch into
main/quarantine appends. Quarantined rows carry ``failed_checks``
(comma-joined check names) so triage is a filter, not a re-run —
the generalization of the reference's P2 invalid-JSON drop
(ImplStructured.scala flatMap decoder), which throws bad rows away;
at 100 TB/day you keep them.

Exactly-once: each batch writes to its OWN subdirectory
(``batch_<id>``) in overwrite mode, so an at-least-once replay after
a crash — including a crash between the clean and quarantine writes —
overwrites exactly its previous (possibly partial) output instead of
appending duplicates. Readers take the union of batch directories via
``QuarantineSink.read`` (``recursiveFileLookup``); this is the same
idempotence Spark's native file sink gets from its _spark_metadata
log, done with directory naming because foreachBatch writes are
outside that log.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality_checks import Check


def with_failed_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Annotate each row with ``failed_checks`` (comma-joined names of
    row-local checks it violates; empty string = clean). One
    projection, codegen-friendly — `unique` checks are aggregate-level
    and rejected here."""
    assert all(c.kind != "unique" for c in checks), (
        "uniqueness is an aggregate property; quarantine takes "
        "row-local checks only"
    )
    parts = [
        F.when(c.violation_expr() == 1, F.lit(c.name)).otherwise(F.lit(None))
        for c in checks
    ]
    return df.withColumn(
        "failed_checks",
        F.concat_ws(",", F.array_compact(F.array(*parts))),
    )


class QuarantineSink:
    """foreachBatch target splitting each micro-batch into a clean
    write under ``main_path`` and a quarantine write under
    ``dlq_path`` (rows + failed_checks) — each batch into its own
    ``batch_<id>`` overwrite directory (replay-idempotent; read the
    union via :meth:`read`)."""

    def __init__(
        self, main_path: str, dlq_path: str, checks: list[Check]
    ) -> None:
        self.main_path = main_path
        self.dlq_path = dlq_path
        self.checks = checks

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        annotated = with_failed_checks(batch_df, self.checks)
        # one lineage, two filtered writes — Spark scans the batch
        # twice but each pass is projection+filter only; persist()
        # would trade memory for the rescan if batches are huge
        clean = annotated.where(F.col("failed_checks") == "").drop(
            "failed_checks"
        )
        dirty = annotated.where(F.col("failed_checks") != "")
        clean.write.mode("overwrite").parquet(
            os.path.join(self.main_path, f"batch_{batch_id}")
        )
        dirty.write.mode("overwrite").parquet(
            os.path.join(self.dlq_path, f"batch_{batch_id}")
        )

    @staticmethod
    def read(spark: SparkSession, path: str) -> DataFrame:
        """Union of all batch directories under ``path``."""
        return spark.read.option("recursiveFileLookup", "true").parquet(
            path
        )
