"""Round-6 additions: SCD2 merge (operators/scd.py), mergeable
rollups (operators/incremental.py), and near-dup-aware splitting
(pipeline_queries split_leakage_audit / split_documents_cluster_safe).

The load-bearing property everywhere is BATCH-BOUNDARY INVARIANCE:
applying changes / merging partials in any chunking yields the same
table as one shot. Random chunkings come from seeded ``random`` so
failures reproduce."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.incremental import (
    finalize_rollup,
    merge_rollups,
    partial_rollup,
)
from in_stream_processing_course_spark.operators.projections import (
    ensure_timestamp,
)
from in_stream_processing_course_spark.operators.scd import (
    cdc_changes_from_events,
    scd2_apply,
)
from in_stream_processing_course_spark.plans.pipeline_queries import (
    split_documents_cluster_safe,
    split_leakage_audit,
    split_documents_train_val_test,
)

_CHANGES_SCHEMA = "user_id long, event_type string, ts long"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- scd2_apply --------------------------------------------------------------


def _apply_in_batches(spark, rows, cuts):
    """Apply ``rows`` (sorted by ts) split at the given ts cuts."""
    dim = None
    bounds = [float("-inf")] + list(cuts) + [float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        batch = [r for r in rows if lo <= r[2] < hi]
        if not batch:
            continue
        dim = scd2_apply(
            dim,
            spark.createDataFrame(batch, _CHANGES_SCHEMA),
            ["user_id"],
            ["event_type"],
        )
    return dim.select(
        "user_id", "event_type", "valid_from", "valid_to", "version",
        "is_current",
    )


def test_scd2_batch_boundary_invariance(spark):
    """Random change streams, random batch cuts: k-batch application
    == one-shot application, exactly."""
    rng = random.Random(7)
    types = ["a", "b", "c"]
    rows = sorted(
        (
            (rng.randrange(4), rng.choice(types), t * 10)
            for t in range(40)
        ),
        key=lambda r: r[2],
    )
    oneshot = _sorted_rows(_apply_in_batches(spark, rows, []))
    for trial in range(3):
        cuts = sorted(rng.sample(range(0, 400, 10), rng.randrange(1, 4)))
        chunked = _sorted_rows(_apply_in_batches(spark, rows, cuts))
        assert chunked == oneshot, f"cuts={cuts}"


def test_scd2_noop_changes_suppressed(spark):
    """A re-sent unchanged attribute (CDC at-least-once delivery) must
    not open a new version."""
    rows = [(1, "a", 10), (1, "a", 20), (1, "b", 30), (1, "b", 40)]
    dim = _apply_in_batches(spark, rows, [25])
    got = _sorted_rows(dim)
    assert got == [
        (1, "a", 10, 30, 1, False),
        (1, "b", 30, None, 2, True),
    ]


def test_scd2_closes_and_versions_multi_key(spark):
    rows = [(1, "a", 10), (2, "x", 15), (1, "b", 20), (1, "c", 30)]
    dim = _apply_in_batches(spark, rows, [])
    got = _sorted_rows(dim)
    assert got == [
        (1, "a", 10, 20, 1, False),
        (1, "b", 20, 30, 2, False),
        (1, "c", 30, None, 3, True),
        (2, "x", 15, None, 1, True),
    ]


def test_cdc_extraction_emits_transitions_only(spark, sf_dir):
    """Per user: first event + type transitions; consecutive repeats
    collapse. Validated structurally against a per-user replay."""
    ev = ensure_timestamp(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "ts"
    ).where(F.col("user_id") < 5)
    changes = cdc_changes_from_events(ev)
    got = {
        u: [t for _, t in sorted((r["ts"], r["event_type"])
                                 for r in rows)]
        for u, rows in (
            (u, [r for r in changes.collect() if r["user_id"] == u])
            for u in [r["user_id"]
                      for r in changes.select("user_id").distinct().collect()]
        )
    }
    replay = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts"), "event_id"
    ).collect()
    for u, seq in got.items():
        events_u = sorted(
            ((r["ts"], r["event_id"], r["event_type"]) for r in replay
             if r["user_id"] == u)
        )
        expected = []
        for _, _, t in events_u:
            if not expected or expected[-1] != t:
                expected.append(t)
        assert seq == expected


# --- mergeable rollups -------------------------------------------------------


def test_rollup_merge_invariant_under_random_chunking(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value", "event_id")
    )
    oneshot = finalize_rollup(
        partial_rollup(ev, ["event_type"])
    )
    expected = _sorted_rows(oneshot)
    rng = random.Random(11)
    for trial in range(2):
        n_chunks = rng.randrange(2, 6)
        bucket = (F.crc32(F.col("event_id").cast("string")) + trial) % n_chunks
        partials = [
            partial_rollup(
                ev.where(bucket == i), ["event_type"]
            )
            for i in range(n_chunks)
        ]
        merged = finalize_rollup(merge_rollups(partials, ["event_type"]))
        assert _sorted_rows(merged) == expected, f"n_chunks={n_chunks}"


def test_rollup_merge_is_commutative(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value", "event_id"
    )
    halves = [
        partial_rollup(ev.where(F.col("event_id") % 2 == i), ["event_type"])
        for i in (0, 1)
    ]
    ab = finalize_rollup(merge_rollups(halves, ["event_type"]))
    ba = finalize_rollup(merge_rollups(halves[::-1], ["event_type"]))
    assert _sorted_rows(ab) == _sorted_rows(ba)


# --- near-dup-aware splitting ------------------------------------------------


def test_cluster_safe_split_has_zero_leakage(spark, sf_dir):
    """The complement property: under the cluster-representative
    split, NO near-dup candidate pair straddles splits (whereas the
    naive per-doc split is audited by split_leakage_audit)."""
    assign = split_documents_cluster_safe(spark, sf_dir).select(
        "doc_id", "split"
    )
    from in_stream_processing_course_spark.operators import dedup as dd
    from in_stream_processing_course_spark.plans import dedup_queries as dq

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands = dd.minhash_candidates(
        docs, "doc_id", "text", dq._NUM_HASHES, dq._BANDS, dq._SHINGLE_K
    )
    leaked = (
        cands.join(
            assign.withColumnRenamed("doc_id", "a").withColumnRenamed(
                "split", "split_a"
            ),
            "a",
        )
        .join(
            assign.withColumnRenamed("doc_id", "b").withColumnRenamed(
                "split", "split_b"
            ),
            "b",
        )
        .where(F.col("split_a") != F.col("split_b"))
    )
    assert leaked.count() == 0


def test_leakage_audit_subset_of_candidates_and_consistent(spark, sf_dir):
    audit = split_leakage_audit(spark, sf_dir)
    naive = split_documents_train_val_test(spark, sf_dir).select(
        "doc_id", "split"
    )
    rows = audit.collect()
    split_of = {r["doc_id"]: r["split"] for r in naive.collect()}
    for r in rows:
        assert split_of[r["a"]] == r["split_a"]
        assert split_of[r["b"]] == r["split_b"]
        assert r["split_a"] != r["split_b"]


# --- merge_into (type-1 MERGE) ----------------------------------------------


def test_merge_into_semantics(spark):
    from in_stream_processing_course_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, v string, n long"
    )
    source = spark.createDataFrame(
        [
            (2, "B", 5),    # matched update: v from source, n added
            (3, "ERR", 1),  # matched delete
            (4, "d", 7),    # insert
            (5, "ERR", 9),  # delete of absent key: no-op, no insert
        ],
        "k long, v string, n long",
    )
    merged = merge_into(
        target,
        source,
        ["k"],
        when_matched={
            "v": F.col("s.v"),
            "n": F.col("t.n") + F.col("s.n"),
        },
        delete_cond=F.col("s.v") == "ERR",
    )
    assert _sorted_rows(merged) == [
        (1, "a", 10),
        (2, "B", 25),
        (4, "d", 7),
    ]


def test_merge_into_multi_batch_equals_one_shot(spark, sf_dir):
    """Applying the post-cutoff changeset in k random key-chunks (in
    any order) converges to the single-merge snapshot: last-writer
    fields + additive counters commute across disjoint-key batches."""
    from in_stream_processing_course_spark.operators.merge import merge_into
    from in_stream_processing_course_spark.plans.incremental_queries import (
        _SCD_CUTOFF_US,
        _events,
        _user_profile,
    )

    ev = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    target = _user_profile(ev.where(us < _SCD_CUTOFF_US))
    source = _user_profile(ev.where(us >= _SCD_CUTOFF_US))
    matched = {
        "last_type": F.col("s.last_type"),
        "last_us": F.col("s.last_us"),
        "n_events": F.col("t.n_events") + F.col("s.n_events"),
    }
    delete = F.col("s.last_type") == "error"
    oneshot = _sorted_rows(
        merge_into(target, source, ["user_id"], matched, delete)
    )
    chunked = target
    for i in range(3):
        part = source.where(F.col("user_id") % 3 == i)
        chunked = merge_into(chunked, part, ["user_id"], matched, delete)
    assert _sorted_rows(chunked) == oneshot


# --- data-quality audit ------------------------------------------------------


def test_audit_catches_planted_violations(spark):
    from in_stream_processing_course_spark.operators.quality_checks import (
        Check,
        audit_table,
    )

    dirty = spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (1, -5.0, "ok"),     # dup id + below range
            (2, 20.0, "bogus"),  # unaccepted status
            (None, 30.0, "ok"),  # null id (unique + not_null hit)
            (3, None, "ok"),     # null value (range hit)
        ],
        "id long, value double, status string",
    )
    ref = spark.createDataFrame([(1,), (3,)], "k long")
    audit = audit_table(
        dirty,
        "dirty",
        [
            Check("id_unique", "unique", "id"),
            Check("id_not_null", "not_null", "id"),
            Check("value_range", "in_range", "value", lo=0.0, hi=100.0),
            Check("status_accepted", "accepted", "status", values=("ok",)),
        ],
        foreign_keys=[("id_in_ref", "id", ref, "k")],
    )
    got = {
        r["check_name"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in audit.collect()
    }
    assert got["id_unique"] == (5, 2, False)       # 1 dup + 1 null
    assert got["id_not_null"] == (5, 1, False)
    assert got["value_range"] == (5, 2, False)     # -5 and null
    assert got["status_accepted"] == (5, 1, False)
    assert got["id_in_ref"] == (5, 1, False)       # id=2 not in ref


def test_audit_clean_table_all_pass(spark, sf_dir):
    from in_stream_processing_course_spark.plans.incremental_queries import (
        data_quality_audit,
    )

    audit = data_quality_audit(spark, sf_dir)
    assert all(r["passed"] for r in audit.collect())
    assert audit.count() == 9


def test_audit_is_single_pass_per_table(spark, sf_dir):
    """The audit's physical plan must scan each fact table once for
    its row-local checks (plus one per FK anti-join) — not once per
    check branch."""
    from in_stream_processing_course_spark.plans.incremental_queries import (
        data_quality_audit,
    )
    import re

    plan = (
        data_quality_audit(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = len(re.findall(r"FileScan parquet|Scan parquet", plan))
    # orders row-checks (1) + orders FK anti (1) + orders n_rows (1)
    # + customer dim (1) + events row-checks (1) = 5
    assert scans <= 5, f"audit fans out to {scans} scans"


def test_merge_into_null_keys_and_omitted_columns(spark):
    """Null-safe keys: a target-only NULL-key row survives intact, a
    matched NULL-key pair takes matched (not insert) semantics; and an
    omitted when_matched column keeps the TARGET value (SQL MERGE
    UPDATE SET semantics)."""
    from in_stream_processing_course_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [(None, "keepme", 1), (7, "seven", 70)],
        "k long, v string, n long",
    )
    # batch A: no NULL-key row -> target's NULL-key row must pass through
    source_a = spark.createDataFrame(
        [(7, "SEVEN", 7)], "k long, v string, n long"
    )
    out_a = merge_into(
        target, source_a, ["k"],
        when_matched={"n": F.col("t.n") + F.col("s.n")},  # v omitted
    )
    rows_a = {tuple(r) for r in out_a.collect()}
    assert (None, "keepme", 1) in rows_a, "target-only NULL key wiped"
    assert (7, "seven", 77) in rows_a, "omitted col must keep target value"
    # batch B: NULL-key row on both sides -> matched semantics
    source_b = spark.createDataFrame(
        [(None, "ignored", 100)], "k long, v string, n long"
    )
    out_b = merge_into(
        target, source_b, ["k"],
        when_matched={"n": F.col("t.n") + F.col("s.n")},
    )
    rows_b = {tuple(r) for r in out_b.collect()}
    assert (None, "keepme", 101) in rows_b, "NULL==NULL must match"


def test_cdc_collapses_same_tick_flipflop(spark):
    """Several transitions inside one (key, ts) tick collapse to the
    last one; a collapse that lands back on the previous state is
    suppressed downstream — operator and oracle agree by contract."""
    rows = [
        # (event_id, user_id, event_type, ts_us)
        (1, 1, "a", 100),
        (2, 1, "b", 200),  # -> b
        (3, 1, "a", 200),  # same tick flip-flop: last wins -> a
        (4, 1, "c", 300),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, us long"
    ).withColumn("ts", F.timestamp_micros("us"))
    changes = cdc_changes_from_events(ev)
    got = sorted(
        (r["ts"], r["event_type"]) for r in changes.collect()
    )
    # tick 200 collapses to 'a' which equals the prior state -> it
    # still appears here (re-suppression is scd2_apply's job) but at
    # most ONE change per tick
    assert got == [(100, "a"), (200, "a"), (300, "c")]
    dim = scd2_apply(
        None,
        changes.select("user_id", "event_type", "ts"),
        ["user_id"],
        ["event_type"],
    )
    versions = _sorted_rows(
        dim.select("user_id", "event_type", "valid_from", "valid_to",
                   "version", "is_current")
    )
    # a@100 .. c@300: the no-op tick-200 'a' is suppressed
    assert versions == [
        (1, "a", 100, 300, 1, False),
        (1, "c", 300, None, 2, True),
    ]


def test_snapshot_diff_round_trip(spark):
    """merge_into(old, diff(old, new)) == new for random snapshot
    pairs including inserts, updates, deletes, NULL keys, and NULL
    values — diff and merge are exact inverses."""
    from in_stream_processing_course_spark.operators.merge import (
        merge_into,
        snapshot_diff,
    )

    rng = random.Random(23)
    schema = "k long, v string, n long"
    for trial in range(3):
        keys = list(range(10)) + [None]
        old_rows = [
            (k, rng.choice(["a", "b", None]), rng.randrange(5))
            for k in keys
            if rng.random() < 0.7
        ]
        new_rows = [
            (k, rng.choice(["a", "b", "c", None]), rng.randrange(5))
            for k in keys
            if rng.random() < 0.7
        ]
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows, schema)
        diff = snapshot_diff(old, new, ["k"])
        feed = diff.cache()
        # apply the feed: upserts for insert/update, delete action
        merged = merge_into(
            old,
            feed.drop("action"),
            ["k"],
            when_matched={
                "v": F.col("s.v"),
                "n": F.col("s.n"),
            },
            delete_cond=F.lit(False),
        )
        # deletes applied via anti-join on the delete keys
        del_keys = feed.where(F.col("action") == "delete").select("k")
        merged = merged.join(del_keys, ["k"], "left_anti")
        got = {tuple(r) for r in merged.collect()}
        want = {tuple(r) for r in new.collect()}
        assert got == want, f"trial {trial}: {got ^ want}"
        feed.unpersist()


def test_snapshot_diff_actions(spark):
    from in_stream_processing_course_spark.operators.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "B"), (3, "c"), (4, "d")], "k long, v string"
    )
    feed = {
        (r["k"]): (r["v"], r["action"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert feed == {
        1: ("a", "delete"),   # old values surface for deletes
        2: ("B", "update"),
        4: ("d", "insert"),
    }  # key 3 unchanged -> absent


def test_keep_best_quality_invariants(spark, sf_dir):
    """Exactly one keeper per cluster, and no cluster member outranks
    its keeper under (quality desc, doc_id asc)."""
    from in_stream_processing_course_spark.plans.dedup_queries import (
        dedup_keep_best_quality,
    )

    rows = dedup_keep_best_quality(spark, sf_dir).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sum(len(v) > 1 for v in by_cluster.values()) > 0, (
        "fixture has no multi-doc clusters; invariant test is vacuous"
    )
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1, f"cluster {cid}"
        k = keepers[0]
        best = min(members, key=lambda m: (-m["quality"], m["doc_id"]))
        assert k["doc_id"] == best["doc_id"]
