"""Semantic invariants for the time-series / product-analytics family
(plans/timeseries_queries.py) beyond the oracle hash: the hash proves
engine agreement, these prove the analytics mean what they claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from in_stream_processing_course_spark.plans import timeseries_queries as ts
from in_stream_processing_course_spark.plans.similarity_queries import (
    embedding_norm_histogram,
)
from in_stream_processing_course_spark.sources.batch import load_table


def test_gapfill_is_complete_and_mass_preserving(spark, sf_dir):
    out = ts.events_hourly_gapfill(spark, sf_dir)
    rows = out.collect()
    hours = {r.hour_start for r in rows}
    types = {r.event_type for r in rows}
    # dense grid: every (hour, type) cell exists exactly once
    assert len(rows) == len(hours) * len(types)
    assert (max(hours) - min(hours)) // 3600 + 1 == len(hours)
    # zero-filling adds cells, never events
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()


def test_retention_week0_counts_every_user(spark, sf_dir):
    out = ts.user_retention_cohorts(spark, sf_dir).collect()
    assert all(r.week_offset >= 0 for r in out)
    week0 = sum(r.n_users for r in out if r.week_offset == 0)
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # every user is active in their own first week by construction
    assert week0 == n_users
    # retention never exceeds the cohort's week-0 size
    by_cohort = {}
    for r in out:
        by_cohort.setdefault(r.cohort_start, {})[r.week_offset] = r.n_users
    for weeks in by_cohort.values():
        assert all(n <= weeks[0] for n in weeks.values())


def test_outliers_respect_threshold_and_symmetry(spark, sf_dir):
    out = ts.events_value_outliers(spark, sf_dir).collect()
    assert out, "sf data should contain tail values"
    assert all(abs(r.zscore) > 2.5 for r in out)


def test_concurrency_peak_bounded_by_users(spark, sf_dir):
    out = ts.sessions_concurrency_daily(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # midnight probes mean a covered-but-idle day may report 0; a
    # user's sessions never overlap so n_users is the ceiling
    assert all(0 <= r.peak_concurrency <= n_users for r in out)
    # probes also guarantee every day of the boundary span appears
    days = sorted(r.day_start for r in out)
    assert days == list(range(days[0], days[-1] + 86400, 86400))


def test_props_json_null_safe(spark, sf_dir):
    out = ts.events_props_json(spark, sf_dir)
    agg = out.agg(F.sum("n_with_k").alias("k")).collect()[0]
    total = load_table(spark, sf_dir, "events").count()
    assert 0 < agg.k <= total


def test_norm_histogram_covers_corpus(spark, sf_dir):
    out = embedding_norm_histogram(spark, sf_dir)
    n = out.agg(F.sum("n_vectors").alias("n")).collect()[0].n
    assert n == load_table(spark, sf_dir, "embeddings").count()
