"""Semantic invariants for the round-5 curation operators beyond the
oracle hash: Bloom soundness (no false negatives, bounded fp), the
boilerplate-removal rewrite contract (token conservation, idempotent
pass-through for short/unique docs), and random-projection geometry
(linearity, sign-matrix determinism)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from in_stream_processing_course_spark.plans import dedup_queries as dq
from in_stream_processing_course_spark.plans import similarity_queries as sq


# --- decontaminate_bloom ---------------------------------------------------


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Soundness: every exactly-contaminated doc must be bloom-flagged
    (a Bloom filter can only over-approximate the bench set)."""
    out = dq.decontaminate_bloom(spark, sf_dir)
    missed = out.where(
        F.col("exact_contaminated") & ~F.col("bloom_contaminated")
    ).count()
    assert missed == 0


def test_bloom_false_positive_flag_is_consistent(spark, sf_dir):
    rows = dq.decontaminate_bloom(spark, sf_dir).collect()
    for r in rows:
        assert r.false_positive == (
            r.bloom_contaminated and not r.exact_contaminated
        )
        assert r.bloom_contaminated == (r.n_bloom_hits > 0)


def test_bloom_fp_rate_is_bounded(spark, sf_dir):
    """With m=16384, k=3 and one small bench doc set, the per-doc fp
    rate should stay well under total saturation (every doc flagged
    would mean the filter is useless / m is mis-sized)."""
    out = dq.decontaminate_bloom(spark, sf_dir)
    total = out.count()
    fp = out.where("false_positive").count()
    assert fp < total * 0.5


# --- text_boilerplate_removed ----------------------------------------------


def test_boilerplate_removed_token_conservation(spark, sf_dir):
    """n_cleaned_tokens == kept_windows * 16 + tail, and windows
    partition the (full-window prefix of the) doc."""
    rows = dq.boilerplate_removed(spark, sf_dir).collect()
    assert rows, "no documents"
    for r in rows:
        assert r.n_kept_windows + r.n_dropped_windows == r.n_windows
        assert 0 <= r.n_kept_windows <= r.n_windows


def test_boilerplate_removed_unique_docs_pass_through(spark):
    """A doc sharing no 16-token window with any other keeps all its
    windows, and its cleaned hash equals md5 of its own normalized
    text."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"alpha{i}" for i in range(20)), "en", "s", 0),
            (2, " ".join(f"beta{i}" for i in range(35)), "en", "s", 0),
            (3, "short doc", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r.doc_id: r
            for r in dq.boilerplate_removed(spark, d).collect()
        }
    # doc 1: 20 tokens -> 1 window kept + 4-token tail
    assert out[1].n_windows == 1 and out[1].n_kept_windows == 1
    assert out[1].n_cleaned_tokens == 20
    # doc 3: shorter than a window -> passes through whole
    assert out[3].n_windows == 0 and out[3].n_cleaned_tokens == 2
    import hashlib

    assert out[3].cleaned_hash == hashlib.md5(b"short doc").hexdigest()


def test_boilerplate_removed_drops_shared_windows(spark):
    """Two docs sharing their first 16 tokens lose exactly that window;
    their distinct remainders survive."""
    shared = " ".join(f"w{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, shared + " unique one tail", "en", "s", 0),
            (2, shared + " other distinct suffix", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r.doc_id: r
            for r in dq.boilerplate_removed(spark, d).collect()
        }
    for doc_id, tail_tokens in [(1, 3), (2, 3)]:
        r = out[doc_id]
        assert r.n_windows == 1 and r.n_dropped_windows == 1
        assert r.n_kept_windows == 0
        assert r.n_cleaned_tokens == tail_tokens


# --- embedding_random_projection -------------------------------------------


def test_rp_matrix_is_deterministic_signs():
    m = sq._RP_MATRIX
    assert len(m) == sq._RP_OUT_DIMS * sq._RP_IN_DIMS
    assert set(m) <= {1.0, -1.0}
    # regenerating gives the identical matrix (pure function of md5)
    again = [
        sq._rp_sign(j, d)
        for j in range(sq._RP_OUT_DIMS)
        for d in range(1, sq._RP_IN_DIMS + 1)
    ]
    assert again == m
    # signs are roughly balanced (md5 is a decent coin)
    pos = sum(1 for v in m if v > 0)
    assert 0.4 < pos / len(m) < 0.6


def test_rp_projection_is_linear(spark):
    """proj(2x) == 2*proj(x) up to the 6-dp rounding the query applies."""
    import tempfile, os

    base = [float(math.sin(i + 1)) for i in range(64)]
    docs = spark.createDataFrame(
        [(0, base, 0), (1, [2.0 * v for v in base], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = {
            r.vec_id: r.proj
            for r in sq.embedding_random_projection(spark, d).collect()
        }
    for a, b in zip(out[0], out[1]):
        assert abs(2.0 * a - b) < 2e-5


def test_rp_output_shape(spark, sf_dir):
    df = sq.embedding_random_projection(spark, sf_dir)
    row = df.first()
    assert len(row.proj) == sq._RP_OUT_DIMS
    assert df.columns == ["vec_id", "label", "proj"]


# --- pagerank_fixed_point ---------------------------------------------------


def _pr(spark, edge_list, iterations=5):
    from in_stream_processing_course_spark.operators.graph import (
        pagerank_fixed_point,
    )

    edges = spark.createDataFrame(edge_list, "u long, v long")
    return {
        r.node: r.rank
        for r in pagerank_fixed_point(
            edges, iterations=iterations
        ).collect()
    }


def test_pagerank_star_hub_dominates(spark):
    """In a star (all spokes point at the hub, hub points back), the
    hub must out-rank every spoke."""
    spokes = list(range(1, 6))
    edges = [(s, 0) for s in spokes] + [(0, s) for s in spokes]
    ranks = _pr(spark, edges)
    assert all(ranks[0] > ranks[s] for s in spokes)
    # symmetric spokes get identical integer ranks (determinism)
    assert len({ranks[s] for s in spokes}) == 1


def test_pagerank_symmetric_pair_is_uniform(spark):
    """Two nodes pointing at each other: rank stays exactly at scale
    (base 150000 + 85% of a full contribution = 1.0 in fixed point,
    modulo integer floors)."""
    ranks = _pr(spark, [(1, 2), (2, 1)])
    assert ranks[1] == ranks[2]
    assert abs(ranks[1] - 1_000_000) < 5  # floor slack per iteration


def test_pagerank_is_deterministic_across_runs(spark):
    edges = [(a, b) for a in range(6) for b in range(6) if (a + b) % 3 == 0 and a != b]
    r1 = _pr(spark, edges)
    r2 = _pr(spark, edges)
    assert r1 == r2


def test_pagerank_mass_is_bounded(spark, sf_dir):
    """Total scaled mass stays near nodes*scale: no contribution is
    double-counted (ranks only leak mass to integer floors and
    dangling edges, never gain)."""
    from in_stream_processing_course_spark.plans.relational import (
        pagerank_customer_supplier,
    )

    rows = pagerank_customer_supplier(spark, sf_dir).collect()
    total = sum(r.rank_scaled for r in rows)
    n = len(rows)
    assert total <= n * 1_000_000
    assert total >= int(n * 1_000_000 * 0.80)


# --- dedup_candidate_triangles ----------------------------------------------


def test_triangle_census_counts_known_graph(spark, sf_dir):
    """Cross-check: recompute triangles in Python from the candidate
    edge list (small at test SF) and compare per-node counts."""
    from itertools import combinations

    from in_stream_processing_course_spark.operators.dedup import (
        minhash_candidates,
    )
    from in_stream_processing_course_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    edges = {
        (r.a, r.b)
        for r in minhash_candidates(docs, "doc_id", "text", 16, 4, 5).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {n: 0 for n in adj}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c counts each triangle once
                for n in (a, b, c):
                    expected[n] += 1
    out = {
        r.doc_id: (r.degree, r.n_triangles)
        for r in dq.dedup_candidate_triangles(spark, sf_dir).collect()
    }
    assert set(out) == set(adj)
    for n, (deg, tri) in out.items():
        assert deg == len(adj[n])
        assert tri == expected[n]


# --- vocab coverage / quality calibration -----------------------------------


def test_vocab_coverage_invariants(spark, sf_dir):
    from in_stream_processing_course_spark.plans import text_queries as tq

    rows = tq.vocab_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - round(r.n_oov / r.n_tokens, 6)) < 1e-9


def test_quality_calibration_partitions_corpus(spark, sf_dir):
    from in_stream_processing_course_spark.plans import text_queries as tq
    from in_stream_processing_course_spark.sources.batch import load_table

    rows = tq.quality_calibration(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sorted(r.decile for r in rows) == list(range(1, 11))
    assert sum(r.n_docs for r in rows) == n_docs
    # deciles are ordered score ranges
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_q <= hi.min_q + 1e-9


def test_quality_calibration_approx_matches_exact_totals(spark, sf_dir):
    from in_stream_processing_course_spark.plans import text_queries as tq

    exact = tq.quality_calibration(spark, sf_dir).collect()
    approx = tq.quality_calibration_approx(spark, sf_dir).collect()
    assert sum(r.n_docs for r in approx) == sum(r.n_docs for r in exact)
    assert sum(r.n_pass for r in approx) == sum(r.n_pass for r in exact)
    assert len(approx) <= 10


# --- events_ks_drift --------------------------------------------------------


def _ks_of(spark, rows):
    import tempfile, os

    from in_stream_processing_course_spark.plans import (
        timeseries_queries as tsq,
    )

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        return {
            r.event_type: r.ks_stat
            for r in tsq.events_ks_drift(spark, d).collect()
        }


def test_ks_identical_halves_is_zero(spark):
    import datetime as dt

    a = dt.datetime(2024, 1, 2)
    b = dt.datetime(2024, 1, 20)
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((i, a, 1, "click", v, "{}"))
        rows.append((100 + i, b, 1, "click", v, "{}"))
    assert _ks_of(spark, rows)["click"] == 0.0


def test_ks_disjoint_halves_is_one(spark):
    import datetime as dt

    a = dt.datetime(2024, 1, 2)
    b = dt.datetime(2024, 1, 20)
    rows = [(i, a, 1, "view", float(i), "{}") for i in range(4)]
    rows += [(100 + i, b, 1, "view", 100.0 + i, "{}") for i in range(4)]
    assert _ks_of(spark, rows)["view"] == 1.0


def test_categorical_drift_no_drift_is_zero(spark):
    import datetime as dt
    import os
    import tempfile

    from in_stream_processing_course_spark.plans import (
        timeseries_queries as tsq,
    )

    a = dt.datetime(2024, 1, 2)
    b = dt.datetime(2024, 1, 20)
    rows = []
    i = 0
    for t in ("click", "view"):
        for half in (a, b):
            for _ in range(5):  # same mix in both halves
                rows.append((i, half, 1, t, 1.0, "{}"))
                i += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = tsq.events_categorical_drift(spark, d).collect()
    assert all(r.chi2_contribution == 0.0 for r in out)
    assert all(r.expected_first == r.n_first for r in out)


def test_sketch_union_estimates_within_bounds(spark, sf_dir):
    from in_stream_processing_course_spark.plans import events_queries as evq

    rows = evq.approx_users_sketch_union(spark, sf_dir).collect()
    by_type = {r.event_type: r for r in rows}
    assert "ALL" in by_type
    for r in rows:
        # HLL (lgK=12 default) is ~1.6% rel err at 3 sigma; corpus
        # cardinalities here are far below saturation, allow 5%
        assert abs(r.n_users_hll - r.n_users_exact) <= max(
            0.05 * r.n_users_exact, 2
        )
    # the union row covers at least the largest single type
    m = max(r.n_users_exact for r in rows if r.event_type != "ALL")
    assert by_type["ALL"].n_users_exact >= m
