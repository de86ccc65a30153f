"""Declarative MERGE INTO — the lakehouse type-1 CDC apply.

Companion to operators/scd.py (type 2 keeps history; this keeps only
the CURRENT row per key): given a keyed target snapshot and a source
changeset, produce the post-merge snapshot with SQL MERGE semantics —

    WHEN MATCHED AND <delete_cond>      THEN DELETE
    WHEN MATCHED                        THEN UPDATE SET <when_matched>
    WHEN NOT MATCHED AND NOT <delete>   THEN INSERT

Spark-first shape: ONE full-outer join on the key, then per-row
resolution with Column expressions — no driver loop, no collect; on
Delta/Iceberg the same call maps 1:1 onto ``MERGE INTO``. Cost is a
single hash shuffle per side; with the changeset ≪ target (the normal
CDC case) AQE turns it into a broadcast of the source side, so the
100 TB target is never shuffled at all.

``when_matched`` maps output column -> expression over ``F.col("t.x")``
(target value) and ``F.col("s.x")`` (source value); omitted columns
keep the target value. Insert takes the source row's columns verbatim.
Merge of per-batch changesets is associative for the usual CDC
combine expressions (last-writer fields + additive counters), which is
what makes multi-batch apply == one-shot — hash-pinned in the
registry (``merge_user_profiles``) and random-chunk-tested in
tests/test_round6_ops.py.

Reference scope: extension surface; batch analog of the K1/K2 keyed
upsert sink (sinks/upsert.py), generalized from last-writer-wins to
arbitrary matched-update expressions and delete actions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    when_matched: dict[str, Column] | None = None,
    delete_cond: Column | None = None,
) -> DataFrame:
    """Apply ``source`` to ``target`` with MERGE semantics; both must
    share the same non-key column set. Returns the merged snapshot."""
    value_cols = [c for c in target.columns if c not in key_cols]
    assert set(source.columns) == set(target.columns), (
        "target/source schema mismatch: "
        f"{sorted(target.columns)} vs {sorted(source.columns)}"
    )
    # presence MARKERS, not key-null tests: the join is null-safe, so
    # a NULL key is a legal value — testing t.<key> IS NULL would
    # misread a target-only NULL-key row as an insert (wiping its
    # values to NULL) and a matched NULL-key pair as source-only
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols]
    joined = t.join(s, cond, "full_outer")
    t_present = F.col("t._t_present").isNotNull()
    s_present = F.col("s._s_present").isNotNull()
    matched = t_present & s_present
    source_only = s_present & ~t_present
    if delete_cond is not None:
        # DELETE drops matched rows; a delete-flagged row for an
        # absent key is a no-op (and must not be inserted either)
        joined = joined.where(~(s_present & delete_cond))
    updates = dict(when_matched or {})
    out_cols: list[Column] = [
        F.when(t_present, F.col(f"t.{k}")).otherwise(F.col(f"s.{k}")).alias(k)
        for k in key_cols
    ]
    for c in value_cols:
        # SQL MERGE semantics: an omitted column KEEPS the target
        # value on matched rows (UPDATE SET only touches listed cols)
        matched_val = updates.get(c, F.col(f"t.{c}"))
        out_cols.append(
            F.when(matched, matched_val)
            .when(source_only, F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
        )
    return joined.select(*out_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """The inverse of :func:`merge_into` — diff two keyed snapshots
    into a CDC change feed: one row per differing key with ``action``
    ∈ {insert, update, delete} and the NEW values (old values for
    deletes, so downstream consumers can log what vanished). This is
    how a pipeline without native CDC *generates* the change stream
    that drives merges elsewhere: diff yesterday's snapshot against
    today's, ship the (small) feed, not the table.

    Same single full-outer join shape as merge_into (one shuffle per
    side, presence markers for NULL-key safety); unchanged keys are
    dropped by the row-equality filter, so the output is
    |changes|-sized. Round trip ``merge_into(old, diff) == new`` is
    property-tested in tests/test_round6_ops.py; the registry query
    (``profile_change_feed``) hash-checks the diff itself against a
    one-shot SQL derivation."""
    value_cols = [c for c in old.columns if c not in key_cols]
    assert set(new.columns) == set(old.columns)
    o = old.withColumn("_o_present", F.lit(True)).alias("o")
    n = new.withColumn("_n_present", F.lit(True)).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    joined = o.join(n, cond, "full_outer")
    o_present = F.col("o._o_present").isNotNull()
    n_present = F.col("n._n_present").isNotNull()
    same_values = reduce(
        lambda a, b: a & b,
        [
            F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
            for c in value_cols
        ],
        F.lit(True),
    )
    action = (
        F.when(~o_present, F.lit("insert"))
        .when(~n_present, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    cols = [
        F.when(n_present, F.col(f"n.{c}"))
        .otherwise(F.col(f"o.{c}"))
        .alias(c)
        for c in key_cols + value_cols
    ]
    return joined.where(
        ~(o_present & n_present & same_values)
    ).select(*cols, action.alias("action"))
