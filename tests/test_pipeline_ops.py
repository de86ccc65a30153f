"""Unit tests for the training-pipeline operators: as-of join
(operators/asof.py) and connected components (operators/graph.py) —
edge-case semantics the sf-level oracle diff can't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# --- as-of join ---------------------------------------------------------------


def test_asof_backward_basic_and_no_prior(spark):
    from in_stream_processing_course_spark.operators.asof import (
        asof_join_backward,
    )

    left = _df(
        spark,
        [(1, "u", 100), (2, "u", 250), (3, "v", 50)],
        "eid long, k string, ts long",
    )
    right = _df(
        spark,
        [(10, "u", 90, "a"), (11, "u", 200, "b"), (12, "w", 10, "z")],
        "eid long, k string, ts long, payload string",
    ).withColumn("vid", F.col("eid"))
    out = asof_join_backward(
        left,
        right,
        key="k",
        left_ts="ts",
        right_ts="ts",
        right_vals=("vid", "payload"),
        order_col="eid",
    )
    got = {r["eid"]: (r["vid"], r["payload"]) for r in out.collect()}
    assert got[1] == (10, "a")  # latest right at ts<=100 is ts=90
    assert got[2] == (11, "b")  # ts<=250 -> ts=200
    assert got[3] == (None, None)  # key 'v' has no right rows at all


def test_asof_equal_ts_right_visible(spark):
    from in_stream_processing_course_spark.operators.asof import (
        asof_join_backward,
    )

    left = _df(spark, [(1, "u", 100)], "eid long, k string, ts long")
    right = _df(
        spark,
        [(10, "u", 100, "same-ts"), (9, "u", 40, "older")],
        "eid long, k string, ts long, payload string",
    )
    out = asof_join_backward(
        left,
        right,
        key="k",
        left_ts="ts",
        right_ts="ts",
        right_vals=("payload",),
        order_col="eid",
    ).collect()
    # a right row AT the left timestamp is visible (at-or-before)
    assert out[0]["payload"] == "same-ts"


def test_asof_ties_pick_greatest_order_col(spark):
    from in_stream_processing_course_spark.operators.asof import (
        asof_join_backward,
    )

    left = _df(spark, [(100, "u", 50)], "eid long, k string, ts long")
    right = _df(
        spark,
        [(1, "u", 20, "first"), (2, "u", 20, "second")],
        "eid long, k string, ts long, payload string",
    )
    out = asof_join_backward(
        left,
        right,
        key="k",
        left_ts="ts",
        right_ts="ts",
        right_vals=("payload",),
        order_col="eid",
    ).collect()
    # equal right timestamps: the greatest order_col wins (total order)
    assert out[0]["payload"] == "second"


# --- connected components -----------------------------------------------------


def _components(spark, pairs):
    from in_stream_processing_course_spark.operators.graph import (
        connected_components,
    )

    edges = _df(spark, pairs, "a long, b long")
    out = connected_components(edges, "a", "b")
    return {r["node"]: r["component"] for r in out.collect()}


def test_cc_two_components(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_needs_propagation(spark):
    # a long path exercises multi-round label propagation (diameter 5)
    got = _components(spark, [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0)])
    assert set(got.values()) == {0}


def test_cc_cycle_and_self_loop(spark):
    got = _components(spark, [(1, 2), (2, 3), (3, 1), (7, 7)])
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == 7


# --- bucketized range join ----------------------------------------------------


def test_range_join_boundaries_and_buckets(spark):
    """start inclusive, end exclusive, multi-bucket intervals, key
    isolation — with a bucket width much smaller than the intervals so
    the explode path is exercised."""
    from in_stream_processing_course_spark.operators.range_join import (
        point_in_interval_join,
    )

    points = _df(
        spark,
        [
            (1, "u", 100),
            (2, "u", 1000),  # inside, several buckets after start
            (3, "u", 5000),  # == end -> excluded
            (4, "u", 4999),  # end-1 -> included
            (5, "v", 1000),  # other key, no interval
            (6, "u", 50),  # before start
        ],
        "pid long, k string, t long",
    ).select("pid", "k", F.timestamp_seconds("t").alias("pt"))
    intervals = _df(
        spark, [("u", 100, 5000)], "k string, s long, e long"
    ).select(
        "k",
        F.timestamp_seconds("s").alias("s_ts"),
        F.timestamp_seconds("e").alias("e_ts"),
    )
    got = {
        r["pid"]
        for r in point_in_interval_join(
            points, intervals, "k", "pt", "s_ts", "e_ts", bucket_sec=60
        ).collect()
    }
    assert got == {1, 2, 4}


def test_asof_randomized_matches_pandas_merge_asof(spark):
    """Seeded randomized equivalence against pandas merge_asof
    (backward, exact matches allowed) — an independent reference
    implementation, with heavy timestamp collisions across 20 keys.
    Right frame pre-sorted by (ts, id) so merge_asof's
    last-equal-row tie rule coincides with our greatest-order_col
    rule."""
    import random

    import pandas as pd

    from in_stream_processing_course_spark.operators.asof import (
        asof_join_backward,
    )

    rng = random.Random(42)
    n_keys, ts_range = 20, 30  # few distinct ts values -> many ties
    left_rows = [
        (i, rng.randrange(n_keys), rng.randrange(ts_range))
        for i in range(300)
    ]
    right_rows = [
        (1000 + i, rng.randrange(n_keys), rng.randrange(ts_range))
        for i in range(300)
    ]
    left = _df(spark, left_rows, "eid long, k long, ts long")
    right = _df(
        spark, right_rows, "eid long, k long, ts long"
    ).withColumn("rid", F.col("eid"))
    got = {
        r["eid"]: r["rid"]
        for r in asof_join_backward(
            left,
            right,
            key="k",
            left_ts="ts",
            right_ts="ts",
            right_vals=("rid",),
            order_col="eid",
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["eid", "k", "ts"]).sort_values(
        ["ts", "eid"], kind="mergesort"
    )
    rp = (
        pd.DataFrame(right_rows, columns=["rid", "k", "ts"])
        .sort_values(["ts", "rid"], kind="mergesort")
        .reset_index(drop=True)
    )
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=True
    )
    expected = {
        int(r.eid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == expected


# --- incremental dedup against a persisted band index -------------------------


def test_incremental_dedup_persisted_index_roundtrip(spark, sf_dir, tmp_path):
    """The production incremental flow: build the corpus band index
    ONCE, persist it as parquet, then screen a new batch against the
    RELOADED index. Results must equal the computed-fresh path, find
    real matches (the documents table contains dups by construction),
    and the plan must never shuffle the index side — only the small
    new-batch keys."""
    from in_stream_processing_course_spark.operators import dedup as dd
    from in_stream_processing_course_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    new_batch = docs.where(F.col("doc_id") % 5 == 0)
    bands = dd.minhash_bands(corpus, "doc_id", "text")
    path = str(tmp_path / "band_index")
    bands.write.parquet(path)

    index = spark.read.parquet(path)
    new_bands = dd.minhash_bands(new_batch, "doc_id", "text")
    out = dd.minhash_index_matches(index, new_bands)
    rows = {r["doc_id"]: (r["matched_doc_id"], r["is_novel"]) for r in out.collect()}
    fresh = {
        r["doc_id"]: (r["matched_doc_id"], r["is_novel"])
        for r in dd.minhash_index_matches(bands, new_bands).collect()
    }
    assert rows == fresh
    assert len(rows) == new_batch.count()
    assert any(not novel for _m, novel in rows.values()), "no dup found"
    assert any(novel for _m, novel in rows.values()), "no novel doc found"

    # plan contract: the index is only scanned — every exchange keys on
    # the new-batch side (_new_id), never on the corpus-scale band_key
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = out._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(band_key" not in plan
    assert "hashpartitioning(_corpus_id" not in plan


def test_minhash_bucket_cap_bounds_degenerate_buckets(spark):
    """One boilerplate text repeated 10x forms a giant bucket: with
    max_bucket_size=5 it emits ZERO pairs (10x9/2=45 otherwise), while
    a small legit near-dup bucket still pairs — the quadratic guard
    drops only the degenerate key."""
    from in_stream_processing_course_spark.operators import dedup as dd

    boiler = "the quick brown fox jumps over the lazy dog again"
    rows = [(i, boiler) for i in range(10)] + [
        (100, "unique words alpha beta gamma delta epsilon zeta eta"),
        (101, "unique words alpha beta gamma delta epsilon zeta eta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dd.minhash_candidates(docs).collect()
    capped = dd.minhash_candidates(docs, max_bucket_size=5).collect()
    assert len(uncapped) == 45 + 1
    pairs = {(r["a"], r["b"]) for r in capped}
    assert pairs == {(100, 101)}


def test_simhash_bucket_cap_bounds_degenerate_buckets(spark):
    """Same guard on the SimHash band join: identical boilerplate docs
    share every band value; capped, they emit no pairs while a distinct
    near-dup pair (one band in common) survives."""
    from in_stream_processing_course_spark.operators import dedup as dd

    boiler = "the quick brown fox jumps over the lazy dog again"
    rows = [(i, boiler) for i in range(10)] + [
        (100, "unique words alpha beta gamma delta epsilon zeta eta"),
        (101, "unique words alpha beta gamma delta epsilon zeta eta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dd.simhash_dedup_candidates(docs, max_bucket_size=5).collect()
    pairs = {(r["a"], r["b"]) for r in capped}
    assert pairs == {(100, 101)}
    uncapped = dd.simhash_dedup_candidates(docs).collect()
    assert len(uncapped) == 45 + 1


def test_two_pass_prefix_rank_equals_single_window(spark):
    """_balanced_shard_assignments (the distributed two-pass prefix
    rank behind shard_documents_balanced) must reproduce the plain
    global-window rank EXACTLY on adversarial inputs: heavy token-count
    ties, doc_ids straddling the _SHARD_RANK_BUCKET boundaries, sparse
    and dense id ranges."""
    import random

    from pyspark.sql import Window

    from in_stream_processing_course_spark.plans.pipeline_queries import (
        _N_SHARDS,
        _SHARD_RANK_BUCKET,
        _balanced_shard_assignments,
    )

    rng = random.Random(7)
    B = _SHARD_RANK_BUCKET
    rows = []
    # dense run straddling a bucket boundary, all tied on n_tokens
    rows += [(B - 8 + i, 50) for i in range(16)]
    # sparse ids across many buckets with few distinct token counts
    rows += [(rng.randrange(0, 40 * B), rng.choice([1, 2, 50, 999])) for _ in range(400)]
    # unique token counts (no ties at all)
    rows += [(100 * B + i, 10_000 + i) for i in range(20)]
    rows = list({r[0]: r for r in rows}.values())  # unique doc_id
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")

    got = {
        r["doc_id"]: r["shard"]
        for r in _balanced_shard_assignments(docs).collect()
    }
    w = Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
    want = {
        r["doc_id"]: (r["rn"] - 1) % _N_SHARDS
        for r in docs.select(
            "doc_id", F.row_number().over(w).alias("rn")
        ).collect()
    }
    assert got == want


def test_winnowing_detection_guarantee(spark):
    """Winnowing's deterministic bound (Schleimer/Wilkerson/Aiken):
    with word k-grams and window w, any two documents sharing a run of
    >= w + k - 1 consecutive tokens MUST share at least one selected
    fingerprint. Two docs built around a common 6-token run (k=3, w=4)
    are found; two docs with disjoint vocabulary are not."""
    import in_stream_processing_course_spark.plans.dedup_queries as dq
    from in_stream_processing_course_spark.sources.batch import load_table

    run = "alpha beta gamma delta epsilon zeta"  # w + k - 1 = 6 tokens
    rows = [
        (1, f"one two three {run} four five"),
        (2, f"six seven {run} eight nine ten"),
        (3, "completely different words entirely unrelated text here"),
        (4, "another disjoint vocabulary document nothing shared at all"),
    ]

    import unittest.mock as mock

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with mock.patch.object(
        dq, "load_table", lambda _s, _d, _t: docs
    ):
        pairs = {
            (r["a"], r["b"])
            for r in dq.dedup_winnowed_candidates(spark, "unused").collect()
        }
    assert (1, 2) in pairs, "docs sharing a 6-token run must pair up"
    assert not any(3 in p or 4 in p for p in pairs), (
        "disjoint-vocabulary docs must not pair"
    )
