"""Declarative data-quality expectations — the contract-audit pass a
100 TB pipeline runs before publishing a table (the Deequ/
Great-Expectations pattern, reduced to its Spark-native core).

A check list compiles to ONE aggregate pass per table: every row-local
expectation (non-null, value range, accepted values, uniqueness via
count-distinct) becomes a conditional-sum column in a single hash
aggregate over a single scan — adding a check adds an expression, not
a job. Referential-integrity checks need the dimension side, so each
FK check is one left-anti-join count where the dimension key set is
the (broadcastable) small side. Output is the audit table: one row per
check with row/violation counts and the pass verdict — the artifact a
publish gate reads.

All counts are exact integers, so the audit is engine-portable and the
registry oracle (``data_quality_audit``) replays every check in SQL.

Reference scope: extension surface; the same idea as the reference's
JSON-decode invalid-drop (P2) generalized from "drop bad rows inline"
to "measure and gate".
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation. ``kind`` selects the compiled form:

    - ``not_null``:   col has no nulls
    - ``in_range``:   lo <= col <= hi (nulls count as violations)
    - ``accepted``:   col ∈ values (nulls count as violations)
    - ``unique``:     col has no duplicate values
    - ``foreign_key``: every non-null col exists in ref[ref_col]
    """

    name: str
    kind: str
    col: str
    lo: float | None = None
    hi: float | None = None
    values: tuple = field(default_factory=tuple)

    def violation_expr(self) -> Column:
        c = F.col(self.col)
        if self.kind == "not_null":
            return c.isNull().cast("long")
        if self.kind == "in_range":
            ok = c.isNotNull() & (c >= self.lo) & (c <= self.hi)
            return (~ok).cast("long")
        if self.kind == "accepted":
            ok = c.isNotNull() & c.isin(*self.values)
            return (~ok).cast("long")
        raise ValueError(f"{self.kind} does not compile to a row expression")


def audit_table(
    df: DataFrame,
    table_name: str,
    checks: list[Check],
    foreign_keys: list[tuple[str, str, DataFrame, str]] = (),
) -> DataFrame:
    """Audit ``df`` against row-local ``checks`` plus ``foreign_keys``
    entries (check_name, fk_col, ref_df, ref_col). Returns rows of
    (table_name, check_name, n_rows, n_violations, passed)."""
    row_checks = [c for c in checks if c.kind != "unique"]
    uniq_checks = [c for c in checks if c.kind == "unique"]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in row_checks:
        aggs.append(F.sum(c.violation_expr()).alias(c.name))
    for c in uniq_checks:
        # duplicates = rows - distinct values (null-safe: countDistinct
        # ignores nulls, so count nulls separately as violations too)
        aggs.append(
            (
                F.count(c.col)
                - F.count_distinct(F.col(c.col))
                + F.sum(F.col(c.col).isNull().cast("long"))
            ).alias(c.name)
        )
    agg_row = df.agg(*aggs)
    # ONE aggregate -> explode to per-check rows. (A union of
    # per-check selects over the same agg_row looks equivalent but
    # physically re-runs the aggregate — and the scan — once per
    # branch: 9 checks = 9 fact-table scans. Plan-pinned in
    # tests/test_round6_ops.py.)
    kv = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(c.name).alias("n_violations"),
            )
            for c in row_checks + uniq_checks
        ]
    )
    per_check = [
        agg_row.select(
            F.lit(table_name).alias("table_name"),
            F.col("_n").alias("n_rows"),
            F.explode(kv).alias("kv"),
        ).select(
            "table_name",
            F.col("kv.check_name").alias("check_name"),
            "n_rows",
            F.col("kv.n_violations").alias("n_violations"),
        )
    ]
    for check_name, fk_col, ref_df, ref_col in foreign_keys:
        # each FK check is one extra fact scan (the anti-join) plus a
        # 1-row x 1-row scalar cross with the count row — the only
        # nested-loop in the plan, and it is size-1 by construction
        orphans = (
            df.where(F.col(fk_col).isNotNull())
            .join(
                F.broadcast(ref_df.select(F.col(ref_col).alias(fk_col))),
                fk_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        n_rows = df.agg(F.count(F.lit(1)).alias("n_rows"))
        per_check.append(
            n_rows.crossJoin(orphans).select(
                F.lit(table_name).alias("table_name"),
                F.lit(check_name).alias("check_name"),
                "n_rows",
                "n_violations",
            )
        )
    out = reduce(DataFrame.unionByName, per_check)
    return out.withColumn("passed", F.col("n_violations") == 0)
