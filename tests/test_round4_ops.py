"""Semantic invariants for the round-4 curation/analytics operators
beyond the oracle hash: order-statistic median edge cases, containment
vs Jaccard dominance, eventually-after funnel ordering rules, and the
split/manifest gate algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.dedup import (
    containment_col,
    jaccard_col,
    shingles_col,
)
from in_stream_processing_course_spark.plans import events_queries as ev
from in_stream_processing_course_spark.plans import pipeline_queries as pq
from in_stream_processing_course_spark.plans import timeseries_queries as ts


# --- _discrete_median: order-statistic semantics ---------------------------


def _median_of(spark, values):
    df = spark.createDataFrame(
        [(i, "k", float(v)) for i, v in enumerate(values)],
        "event_id long, event_type string, value double",
    )
    out = ts._discrete_median(df, "event_type", "value", "med").collect()
    assert len(out) == 1
    return out[0].med


def test_discrete_median_odd_is_middle(spark):
    assert _median_of(spark, [5.0, 1.0, 9.0]) == 5.0


def test_discrete_median_even_is_lower_middle(spark):
    # rank floor((4+1)/2) = 2 -> the 2nd smallest, never an average
    assert _median_of(spark, [4.0, 1.0, 3.0, 2.0]) == 2.0


def test_discrete_median_ties_pick_the_tied_value(spark):
    assert _median_of(spark, [7.0, 7.0, 7.0, 1.0]) == 7.0


def test_discrete_median_single_row(spark):
    assert _median_of(spark, [42.0]) == 42.0


# --- containment vs Jaccard ------------------------------------------------


def test_containment_dominates_jaccard_and_detects_excerpts(spark):
    # b's shingles are a strict subset of a's: containment(b in a) = 1
    # while Jaccard stays low — exactly the excerpt case the metric is
    # for. Shingle k=2 over explicit word lists.
    rows = [
        (1, "the quick brown fox jumps over the lazy dog end"),
        (2, "quick brown fox"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = df.select(
        "doc_id", shingles_col(F.col("text"), 2).alias("s")
    ).collect()
    by_id = {r.doc_id: r.s for r in sh}
    pair = spark.createDataFrame(
        [(by_id[1], by_id[2])], "sa array<string>, sb array<string>"
    )
    got = pair.select(
        containment_col(F.col("sb"), F.col("sa")).alias("c_b_in_a"),
        containment_col(F.col("sa"), F.col("sb")).alias("c_a_in_b"),
        jaccard_col(F.col("sa"), F.col("sb")).alias("j"),
    ).collect()[0]
    assert got.c_b_in_a == 1.0  # the excerpt is fully contained
    assert got.j < 0.3  # Jaccard misses it
    # containment always dominates jaccard (|A∩B|/|A| >= |A∩B|/|A∪B|)
    assert got.c_b_in_a >= got.j and got.c_a_in_b >= got.j


# --- eventually-after funnel ----------------------------------------------


def _funnel_rows(spark, events):
    """events: (event_id, user_id, event_type, epoch_sec)"""
    df = spark.createDataFrame(
        [(e, u, t, s) for e, u, t, s in events],
        "event_id long, user_id long, event_type string, sec long",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_seconds("sec").alias("ts"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    base = df.select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    v = (
        base.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("view_us"))
    )
    c = (
        base.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("us") >= F.col("view_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("click_us"))
    )
    p = (
        base.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("us") >= F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("purchase_us"))
    )
    out = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .collect()
    )
    return {r.user_id: r for r in out}


def test_funnel_requires_stage_order(spark):
    got = _funnel_rows(
        spark,
        [
            # user 1: full ordered funnel
            (1, 1, "view", 10),
            (2, 1, "click", 20),
            (3, 1, "purchase", 30),
            # user 2: purchase BEFORE the click -> stage 3 not reached
            (4, 2, "view", 10),
            (5, 2, "purchase", 15),
            (6, 2, "click", 20),
            # user 3: click before any view -> stage 2 not reached
            (7, 3, "click", 5),
            (8, 3, "view", 10),
            # user 4: view only
            (9, 4, "view", 10),
        ],
    )
    assert got[1].purchase_us is not None
    assert got[2].click_us is not None and got[2].purchase_us is None
    assert got[3].click_us is None and got[3].purchase_us is None
    assert got[4].click_us is None and got[4].purchase_us is None


def test_funnel_query_monotone_on_testdata(spark, sf_dir):
    rows = ev.funnel_three_step(spark, sf_dir).collect()
    assert rows, "funnel produced no entrants"
    for r in rows:
        # stage timestamps are present only in order and non-decreasing
        if r.purchase_us is not None:
            assert r.click_us is not None and r.purchase_us >= r.click_us
        if r.click_us is not None:
            assert r.click_us >= r.view_us
        assert r.reached_click == (r.click_us is not None)
        assert r.reached_purchase == (r.purchase_us is not None)


# --- split + manifest gate algebra -----------------------------------------


def test_split_is_exhaustive_and_deterministic(spark, sf_dir):
    out = pq.split_documents_train_val_test(spark, sf_dir)
    rows = out.collect()
    n_docs = len({r.doc_id for r in rows})
    assert len(rows) == n_docs  # one row per doc
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # per-split totals are consistent with the row-level assignment
    from collections import Counter

    counts = Counter(r.split for r in rows)
    for r in rows:
        assert r.split_docs == counts[r.split]
    # determinism: a second run assigns identically
    again = {r.doc_id: r.split for r in out.collect()}
    assert all(again[r.doc_id] == r.split for r in rows)


def test_manifest_selected_is_conjunction_of_gates(spark, sf_dir):
    rows = pq.curation_manifest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.selected == (
            r.quality_pass and r.exact_rep and r.semantic_keep
        )


# --- attribution: time-bounded conditional window --------------------------

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mini_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _attr(spark, sf_dir):
    rows = ts.attribution_daily_revenue(spark, sf_dir).collect()
    return {
        r.day_start: (r.n_attributed, r.attributed_revenue, r.organic_revenue)
        for r in rows
    }


import datetime as _dt


def _t(day, hour=0, micro=0):
    return _dt.datetime(2024, 1, day, hour, 0, 0, micro)


def test_attribution_touch_within_lookback(spark, tmp_path):
    sf = _mini_events(
        spark,
        tmp_path,
        [
            (1, _t(10, 9), 1, "view", 0.0, "{}"),
            (2, _t(10, 10), 1, "purchase", 50.0, "{}"),
        ],
    )
    out = _attr(spark, sf)
    assert out[1704844800] == (1, 50.0, 0.0)  # 2024-01-10 attributed


def test_attribution_touch_outside_7d_is_organic(spark, tmp_path):
    sf = _mini_events(
        spark,
        tmp_path,
        [
            (1, _t(1, 9), 1, "click", 0.0, "{}"),
            (2, _t(9, 10), 1, "purchase", 50.0, "{}"),  # 8d later
        ],
    )
    (n_attr, attr_rev, org_rev) = list(_attr(spark, sf).values())[0]
    assert (n_attr, attr_rev, org_rev) == (0, 0.0, 50.0)


def test_attribution_same_instant_touch_excluded(spark, tmp_path):
    # frame is [-7d, -1 microsecond]: a touch at the purchase's exact
    # timestamp must NOT count
    sf = _mini_events(
        spark,
        tmp_path,
        [
            (1, _t(10, 10), 1, "view", 0.0, "{}"),
            (2, _t(10, 10), 1, "purchase", 50.0, "{}"),
            (3, _t(10, 10, micro=1), 1, "purchase", 25.0, "{}"),
        ],
    )
    (n_attr, attr_rev, org_rev) = list(_attr(spark, sf).values())[0]
    # purchase 2 sees no prior touch; purchase 3 sees the view 1us back
    assert (n_attr, attr_rev, org_rev) == (1, 25.0, 50.0)


def test_attribution_other_users_touches_do_not_count(spark, tmp_path):
    sf = _mini_events(
        spark,
        tmp_path,
        [
            (1, _t(10, 9), 7, "view", 0.0, "{}"),
            (2, _t(10, 10), 1, "purchase", 50.0, "{}"),
        ],
    )
    (n_attr, attr_rev, org_rev) = list(_attr(spark, sf).values())[0]
    assert (n_attr, attr_rev, org_rev) == (0, 0.0, 50.0)


def test_attribution_prior_purchase_is_not_a_touch(spark, tmp_path):
    sf = _mini_events(
        spark,
        tmp_path,
        [
            (1, _t(10, 9), 1, "purchase", 10.0, "{}"),
            (2, _t(10, 10), 1, "purchase", 50.0, "{}"),
        ],
    )
    (n_attr, attr_rev, org_rev) = list(_attr(spark, sf).values())[0]
    assert (n_attr, attr_rev, org_rev) == (0, 0.0, 60.0)


# --- hourly linear interpolation -------------------------------------------


def _interp(spark, sf_dir):
    rows = ts.events_hourly_interpolated(spark, sf_dir).collect()
    return {
        (r.event_type, r.hour_start): (r.n_obs, r.value_interp) for r in rows
    }


def test_interpolation_fills_linear_gap(spark, tmp_path):
    sf = _mini_events(
        spark,
        tmp_path,
        [
            (1, _t(10, 0), 1, "view", 1.0, "{}"),
            (2, _t(10, 3), 1, "view", 4.0, "{}"),
        ],
    )
    out = _interp(spark, sf)
    h0 = 1704844800
    assert out[("view", h0)] == (1, 1.0)
    assert out[("view", h0 + 3600)] == (0, 2.0)
    assert out[("view", h0 + 7200)] == (0, 3.0)
    assert out[("view", h0 + 10800)] == (1, 4.0)


def test_interpolation_edges_clamp(spark, tmp_path):
    # spine spans hours 0..3 (set by the view series); the click series
    # observes only hour 1 -> hours 0, 2, 3 clamp to the nearest obs
    sf = _mini_events(
        spark,
        tmp_path,
        [
            (1, _t(10, 0), 1, "view", 5.0, "{}"),
            (2, _t(10, 3), 1, "view", 5.0, "{}"),
            (3, _t(10, 1), 1, "click", 9.0, "{}"),
        ],
    )
    out = _interp(spark, sf)
    h0 = 1704844800
    assert out[("click", h0)] == (0, 9.0)
    assert out[("click", h0 + 3600)] == (1, 9.0)
    assert out[("click", h0 + 7200)] == (0, 9.0)
    assert out[("click", h0 + 10800)] == (0, 9.0)


def test_interpolation_hour_mean_is_used(spark, tmp_path):
    sf = _mini_events(
        spark,
        tmp_path,
        [
            (1, _t(10, 0, micro=0), 1, "view", 1.0, "{}"),
            (2, _t(10, 0, micro=5), 1, "view", 3.0, "{}"),
        ],
    )
    out = _interp(spark, sf)
    assert out[("view", 1704844800)] == (2, 2.0)


# --- inverted index --------------------------------------------------------

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _mini_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_inverted_index_caps_postings_but_counts_all(spark, tmp_path):
    from in_stream_processing_course_spark.plans.text_queries import (
        inverted_index,
    )

    # "hot" appears in 12 docs (ids 0..11), twice in doc 0
    rows = [(i, "hot" + (" hot" if i == 0 else ""), "en", "s", 3) for i in range(12)]
    sf = _mini_docs(spark, tmp_path, rows)
    out = {r.term: r for r in inverted_index(spark, sf).collect()}
    hot = out["hot"]
    assert hot.doc_freq == 12 and hot.total_freq == 13
    # postings capped at the 10 SMALLEST doc ids, not all 12
    assert hot.postings == ",".join(str(i) for i in range(10))


def test_inverted_index_df_floor_drops_rare_terms(spark, tmp_path):
    from in_stream_processing_course_spark.plans.text_queries import (
        inverted_index,
    )

    rows = [(i, "common rare" if i < 4 else "common", "en", "s", 10)
            for i in range(8)]
    sf = _mini_docs(spark, tmp_path, rows)
    terms = {r.term for r in inverted_index(spark, sf).collect()}
    assert terms == {"common"}  # rare: df=4 < 5


# --- audience overlap ------------------------------------------------------


def test_audience_overlap_counts_and_jaccard(spark, tmp_path):
    from in_stream_processing_course_spark.plans.events_queries import (
        audience_overlap_matrix,
    )

    # users 1,2 view; users 2,3 click; user 2 clicks twice (distinct!)
    rows = [
        (1, _t(10), 1, "view", 0.0, "{}"),
        (2, _t(10), 2, "view", 0.0, "{}"),
        (3, _t(10), 2, "click", 0.0, "{}"),
        (4, _t(10), 2, "click", 0.0, "{}"),
        (5, _t(10), 3, "click", 0.0, "{}"),
    ]
    sf = _mini_events(spark, tmp_path, rows)
    out = audience_overlap_matrix(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b) == ("click", "view")
    assert (r.n_common, r.n_a, r.n_b) == (1, 2, 2)
    assert r.jaccard == round(1 / 3, 6)
