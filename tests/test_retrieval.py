"""Retrieval family (plans/retrieval_queries.py): plan shapes and
output invariants. Value-level correctness is pinned by the DuckDB
oracles in the parity sweep; these tests pin the scale-relevant plan
properties and the MMR greedy's semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from in_stream_processing_course_spark.plans import retrieval_queries as rq

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bm25_topk_is_take_ordered_not_global_sort(spark):
    """The corpus-wide top-k must plan as TakeOrderedAndProject
    (per-partition heap, k-row merge) — a global Sort over the scored
    corpus would be the 100 TB scale-killer the registry guard exists
    for."""
    plan = _physical(rq.retrieval_bm25_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_bm25_scores_and_ranks(spark):
    out = rq.retrieval_bm25_topk(spark, SF).collect()
    assert 0 < len(out) <= rq._TOP_K
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # every returned doc matched at least one query term
    assert all(1 <= r["n_matched"] <= len(rq._QUERY_TERMS) for r in out)


def test_hybrid_rrf_fuses_both_rankings(spark):
    out = rq.retrieval_hybrid_rrf(spark, SF).collect()
    assert 0 < len(out) <= rq._TOP_K
    # rrf score algebra: each side contributes 1/(60+rank) or 0
    for r in out:
        expected = 0.0
        if r["lex_rank"] is not None:
            expected += 1.0 / (rq._RRF_K + r["lex_rank"])
        if r["sem_rank"] is not None:
            expected += 1.0 / (rq._RRF_K + r["sem_rank"])
        assert r["rrf_score"] == pytest.approx(expected, abs=1e-6)
    # fusion actually uses both sides: at least one row per side ranked
    assert any(r["lex_rank"] is not None for r in out)
    assert any(r["sem_rank"] is not None for r in out)


def test_mmr_first_pick_is_max_relevance_then_diversifies(spark):
    cands = {
        r["doc_id"]: r["cosine"]
        for r in rq._semantic_scored(spark, SF).collect()
    }
    out = rq.retrieval_mmr_diversified(spark, SF).collect()
    assert len(out) == min(rq._TOP_K, len(cands))
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    ids = [r["doc_id"] for r in out]
    assert len(set(ids)) == len(ids)
    # pick 1 is pure relevance (no diversity term yet)
    best = min(cands, key=lambda d: (-cands[d], d))
    assert ids[0] == best
    assert out[0]["mmr_score"] == pytest.approx(
        rq._MMR_LAMBDA * cands[best], abs=1e-6
    )
    # the greedy departs from the pure-relevance order (diversity bites)
    by_rel = [d for d in sorted(cands, key=lambda d: (-cands[d], d))][
        : len(ids)
    ]
    assert ids != by_rel


def test_skyline_members_are_undominated(spark):
    """Every emitted part is undominated within its brand; every
    non-emitted part is dominated by some same-brand part (checked on
    the small SF where the quadratic reference check is cheap)."""
    from in_stream_processing_course_spark.plans.relational import (
        parts_skyline_per_brand,
    )
    from in_stream_processing_course_spark.sources.batch import load_table

    rows = [
        (r["p_brand"], r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load_table(spark, SF, "part")
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    sky = {
        r["p_partkey"] for r in parts_skyline_per_brand(spark, SF).collect()
    }

    def dominated(p):
        return any(
            q[0] == p[0]
            and q[1] != p[1]
            and (
                (q[2] < p[2] and q[3] <= p[3])
                or (q[2] <= p[2] and q[3] < p[3])
            )
            for q in rows
        )

    for p in rows:
        assert (p[1] in sky) == (not dominated(p)), f"part {p}"
