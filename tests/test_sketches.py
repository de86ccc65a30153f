"""Misra-Gries heavy hitters (operators/sketches.py): the batched
update/merge keeps the classic MG guarantees, and the Spark two-pass
operator returns exactly the true heavy-hitter set."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.sketches import (
    heavy_hitters,
    mg_merge_counts,
    partition_summaries,
)


@given(
    stream=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=400
    ),
    k=st.integers(min_value=2, max_value=12),
    n_chunks=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=300, deadline=None)
def test_mg_batched_update_keeps_classic_guarantees(stream, k, n_chunks):
    """Feeding the stream in arbitrary chunk splits (the Arrow-batch
    shape): (1) at most k-1 counters survive; (2) every estimate
    undercounts by at most n/k; (3) every item with true count > n/k
    is retained — the candidate superset the operator relies on."""
    exact = Counter(stream)
    n = len(stream)
    counters: dict = {}
    step = max(1, len(stream) // n_chunks)
    for i in range(0, len(stream), step):
        chunk = Counter(stream[i : i + step])
        mg_merge_counts(counters, chunk, k)
    assert len(counters) <= k - 1
    for val, est in counters.items():
        assert 0 < est <= exact[val]
        assert exact[val] - est <= n / k
    for val, cnt in exact.items():
        if cnt > n / k:
            assert val in counters, (val, cnt, n, k, counters)


@given(
    streams=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=20), min_size=0, max_size=150
        ),
        min_size=2,
        max_size=4,
    ),
    k=st.integers(min_value=2, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_mg_mergeable_reduction_keeps_global_heavy_hitters(streams, k):
    """The operator's merge rule — sum per-partition estimates, subtract
    the k-th largest combined estimate, keep positives — never loses a
    key whose GLOBAL count exceeds n/k (mergeable-summaries bound)."""
    exact: Counter = Counter()
    combined: Counter = Counter()
    n = 0
    for stream in streams:
        exact.update(stream)
        n += len(stream)
        part: dict = {}
        mg_merge_counts(part, dict(Counter(stream)), k)
        combined.update(part)
    s = sorted(combined.values(), reverse=True)[k - 1] if len(combined) >= k else 0
    survivors = {v for v, c in combined.items() if c - s > 0}
    for val, cnt in exact.items():
        if cnt > n / k:
            assert val in survivors, (val, cnt, n, k)


def test_partition_summaries_bounded_per_partition(spark):
    df = spark.range(0, 4000, 1, 8).select(
        (F.col("id") % 57).alias("user_id")
    )
    rows = partition_summaries(df, "user_id", 10).count()
    # <= k-1 candidate rows per input partition
    assert rows <= 8 * 9


def test_heavy_hitters_matches_brute_force(spark):
    # skewed: key 0 takes ~half the rows, others spread thin
    df = spark.range(0, 6000, 1, 8).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 97)
        .alias("user_id")
    )
    k = 16
    got = {
        (r["user_id"], r["n_rows"])
        for r in heavy_hitters(df, "user_id", k).collect()
    }
    exact = Counter(r["user_id"] for r in df.collect())
    want = {(v, c) for v, c in exact.items() if c * k > 6000}
    assert got == want and got  # non-empty: key 0 qualifies


def test_heavy_hitters_fewer_distinct_than_k(spark):
    """With fewer distinct keys than k the subtraction step must be a
    no-op (s=0) and everything above threshold still returned."""
    df = spark.range(0, 300, 1, 4).select((F.col("id") % 3).alias("user_id"))
    got = {
        (r["user_id"], r["n_rows"])
        for r in heavy_hitters(df, "user_id", 16).collect()
    }
    assert got == {(0, 100), (1, 100), (2, 100)}


def test_heavy_hitters_excludes_null_keys(spark):
    """NULL keys are excluded explicitly on both the sketch and exact
    sides (pandas value_counts silently drops NaN — left implicit, a
    null-heavy column would desync the two passes)."""
    df = spark.range(0, 400, 1, 4).select(
        F.when(F.col("id") % 4 == 0, None)
        .otherwise(F.col("id") % 2)
        .alias("user_id")
    )
    got = {
        (r["user_id"], r["n_rows"])
        for r in heavy_hitters(df, "user_id", 4).collect()
    }
    # non-null rows: 300 -> threshold 75; key 1: 200, key 0: 100
    assert got == {(1, 200), (0, 100)}


def test_cm_sketch_overcount_only_and_mostly_exact(spark):
    """Count-Min hard guarantee: est >= true count for EVERY key
    (counters only ever add). With 97 keys spread over 4x1024
    counters, the min-over-rows estimate is exact for almost all keys
    — deterministic here because the hash family is fixed explicit
    modular hashing."""
    from in_stream_processing_course_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.range(0, 6000, 1, 8).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 97)
        .alias("user_id")
    )
    exact = Counter(r["user_id"] for r in df.collect())
    sk = cm_sketch(df, "user_id")
    assert sk.count() <= 4 * 1024
    keys = df.select("user_id").distinct()
    est = {
        r["user_id"]: r["cm_est"]
        for r in cm_estimate(keys, "user_id", sk).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= c for k, c in exact.items())
    n_exact = sum(1 for k, c in exact.items() if est[k] == c)
    assert n_exact >= 0.9 * len(exact)


def test_cm_sketch_is_mergeable(spark):
    """Distributed semantics: the sketch of a union equals the
    cell-wise SUM of per-part sketches — what lets partial aggregation
    (and a streaming fold) build it without ever shuffling keys."""
    from in_stream_processing_course_spark.operators.sketches import (
        cm_sketch,
    )

    a = spark.range(0, 2000, 1, 4).select((F.col("id") % 53).alias("k"))
    b = spark.range(0, 1000, 1, 4).select((F.col("id") % 11).alias("k"))
    merged = {
        (r["row"], r["bucket"]): r["c"]
        for r in cm_sketch(a.unionAll(b), "k").collect()
    }
    summed: dict = {}
    for part in (a, b):
        for r in cm_sketch(part, "k").collect():
            key = (r["row"], r["bucket"])
            summed[key] = summed.get(key, 0) + r["c"]
    assert merged == summed


def test_cm_sketch_streams_equal_batch(spark, tmp_path):
    """cm_sketch is a plain streaming aggregation (explode cells ->
    groupBy count): fed the same rows through readStream in multiple
    micro-batches, the final counter table equals the batch sketch
    bit-for-bit — the deploy-time continuous-sketch path needs no
    separate operator."""
    from in_stream_processing_course_spark.operators.sketches import (
        cm_sketch,
    )
    from in_stream_processing_course_spark.streaming.runner import (
        run_stream_to_memory,
    )

    base = spark.range(0, 3000, 1, 4)
    df = base.select((F.col("id") % 37).alias("user_id"))
    # two files -> two micro-batches with maxFilesPerTrigger=1
    base.where(F.col("id") < 1500).select(
        (F.col("id") % 37).alias("user_id")
    ).write.parquet(str(tmp_path / "in" / "a"))
    base.where(F.col("id") >= 1500).select(
        (F.col("id") % 37).alias("user_id")
    ).write.parquet(str(tmp_path / "in" / "b"))
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    got = {
        (r["row"], r["bucket"]): r["c"]
        for r in run_stream_to_memory(
            cm_sketch(stream, "user_id"),
            output_mode="complete",
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).collect()
    }
    want = {
        (r["row"], r["bucket"]): r["c"]
        for r in cm_sketch(df, "user_id").collect()
    }
    assert got == want and got


def test_cm_sketch_excludes_null_keys(spark):
    from in_stream_processing_course_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.range(0, 100, 1, 2).select(
        F.when(F.col("id") % 2 == 0, None).otherwise(F.lit(7)).alias("k")
    )
    sk = cm_sketch(df, "k")
    # every non-null row lands in exactly d cells
    total = sum(r["c"] for r in sk.collect())
    assert total == 50 * 4
    est = cm_estimate(df.select("k").distinct(), "k", sk).collect()
    assert {(r["k"], r["cm_est"]) for r in est} == {(7, 50)}


def test_heavy_hitters_ignores_unrelated_reserved_columns(spark):
    """ADVICE r5 (low): an unrelated input column named like an
    internal ('_cand') used to make the exact-pass join ambiguous.
    The operator now projects the key column first, so only a key
    column named like an internal is (and must be) rejected."""
    import pytest

    df = spark.range(0, 300, 1, 4).select(
        (F.col("id") % 3).alias("user_id"),
        F.lit(True).alias("_cand"),
        F.lit(1).alias("n_rows"),
    )
    got = {
        (r["user_id"], r["n_rows"])
        for r in heavy_hitters(df, "user_id", 16).collect()
    }
    assert got == {(0, 100), (1, 100), (2, 100)}
    with pytest.raises(ValueError, match="collides"):
        heavy_hitters(df.withColumnRenamed("_cand", "keep"), "n_rows", 4)


def test_heavy_hitters_excludes_nan_keys(spark):
    """ADVICE r5 (low): for float key columns, NaN rows used to be
    counted on the exact side but dropped by pandas value_counts on
    the sketch side — a NaN key above n/k could never be reported and
    silently voided the superset guarantee. NaN is now excluded like
    NULL, and n counts only the remaining rows."""
    df = spark.range(0, 400, 1, 4).select(
        F.when(F.col("id") % 4 == 0, float("nan"))
        .otherwise((F.col("id") % 2).cast("double"))
        .alias("score")
    )
    got = {
        (r["score"], r["n_rows"])
        for r in heavy_hitters(df, "score", 4).collect()
    }
    # NaN rows (100) excluded -> n=300, threshold 75; 1.0: 200, 0.0: 100
    assert got == {(1.0, 200), (0.0, 100)}


def test_dd_percentile_query_within_alpha_of_order_stats(spark, sf_dir):
    """The registered event_value_percentiles_dd (r10 — the
    hash-backed approx-percentile) is within relative error DD_ALPHA
    of the true order statistic at its rank convention, per type and
    per quantile (rank q·(n-1), walk-first-exceeding; a one-position
    slack covers the cum > rank strictness)."""
    import math

    from in_stream_processing_course_spark.operators.sketches import (
        DD_ALPHA,
    )
    from in_stream_processing_course_spark.plans.pipeline_queries import (
        event_value_percentiles_dd,
    )

    got = {
        r["event_type"]: (r["n_events"], r["p50"], r["p90"], r["p99"])
        for r in event_value_percentiles_dd(spark, sf_dir).collect()
    }
    vals: dict[str, list[float]] = {}
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .where(F.col("value").isNotNull())
        .collect()
    ):
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert set(got) == set(vals)
    for t, xs in vals.items():
        xs.sort()
        n, (n_got, *ps) = len(xs), got[t]
        assert n_got == n
        for q, est in zip((0.5, 0.9, 0.99), ps):
            rank = q * (n - 1)
            lo, hi = math.floor(rank), min(n - 1, math.ceil(rank) + 1)
            assert any(
                abs(est - xs[i]) <= DD_ALPHA * xs[i] + 1e-9
                for i in range(lo, hi + 1)
            ), f"{t} q={q}: {est} vs {xs[lo:hi + 1]}"
