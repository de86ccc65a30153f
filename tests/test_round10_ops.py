"""Round-10 operator pins: the hash-backed DD-sketch twins track
their exact anchors within the documented bounds."""

from __future__ import annotations

from in_stream_processing_course_spark.plans.registry import QUERIES


def test_dd_pareto_grid_tracks_exact_curve(spark, sf_dir):
    """customer_pareto_curve_dd (r10 — the oracle-replayable sketch
    grid) agrees with the exact two-phase curve: at every grid point
    the estimated revenue share is within a few alpha of the exact
    cumulative share at the corresponding customer-prefix, and both
    monotone structures hold (more customers -> more share, higher
    top-fraction -> lower threshold)."""
    from in_stream_processing_course_spark.operators.sketches import (
        DD_ALPHA,
    )

    grid = QUERIES["customer_pareto_curve_dd"](spark, sf_dir).collect()
    exact = QUERIES["customer_pareto_curve"](spark, sf_dir).collect()
    n = len(exact)
    assert len(grid) == 99
    for r in grid:
        # self-consistency: the sketch's share at ITS OWN customer
        # count matches the exact cumulative share there within the
        # value-mass bound (~2-3 alpha). Rank quantization (how far
        # n_customers sits from q*n) is bucket-granularity at tiny n
        # and is pinned by the threshold check below instead.
        k = min(n, max(1, r["n_customers"]))
        assert (
            abs(r["cum_share"] - exact[k - 1]["cum_share"])
            <= 3 * DD_ALPHA
        ), (r["top_frac"], r["cum_share"], exact[k - 1]["cum_share"])
        # every counted customer really is above the threshold (within
        # alpha): the exact spend at rank n_customers clears it
        assert exact[k - 1]["spend"] >= r["spend_threshold"] * (
            1 - DD_ALPHA
        ) - 1e-9
    # monotone structures: more of the base -> more share and more
    # customers; higher top-fraction -> lower threshold
    shares = [r["cum_share"] for r in grid]
    assert shares == sorted(shares)
    counts = [r["n_customers"] for r in grid]
    assert counts == sorted(counts)
    thresholds = [r["spend_threshold"] for r in grid]
    assert thresholds == sorted(thresholds, reverse=True)
