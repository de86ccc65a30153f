"""Round-9 operators: the two-phase global rank machinery
(operators/ranks.py) pinned against the single-window form it
replaces, exact_ntile against Spark's ntile, and the approx Pareto
twin against the exact curve."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.ranks import (
    exact_ntile,
    two_phase_rank,
    two_phase_rank_discrete,
)

SF = "/root/testdata/sf0.01"


def _synthetic(spark, n=5000, seed=7, discrete=False):
    rng = random.Random(seed)
    rows = [
        (
            i,
            float(rng.randint(1, 40)) if discrete else rng.uniform(0, 1e6),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, v double")


def _window_truth(df, desc=True):
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id")]
    w = Window.orderBy(*order)
    return {
        r["id"]: (r["rank"], r["n"], r["run"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rank"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("run"),
        ).collect()
    }


def test_two_phase_rank_equals_single_window(spark):
    df = _synthetic(spark)
    got = {
        r["id"]: (r["rank"], r["n"], r["run"])
        for r in two_phase_rank(
            spark, df, key="v", tiebreak="id", desc=True,
            prefix_sums={"run": "v"},
        ).select("id", "rank", "n", "run").collect()
    }
    want = _window_truth(df, desc=True)
    # ranks and counts are exact; the double prefix sum may differ in
    # the last ulp from the single-window left-to-right order (the
    # DECIMAL path used by the registered queries is exact) — compare
    # at 6dp, far tighter than any consumer
    assert {k: v[:2] for k, v in got.items()} == {
        k: v[:2] for k, v in want.items()
    }
    for k in want:
        assert abs(got[k][2] - want[k][2]) < 1e-4


def test_two_phase_rank_ascending_and_total(spark):
    df = _synthetic(spark, n=999)
    out = two_phase_rank(
        spark, df, key="v", tiebreak="id", desc=False,
        prefix_sums={"run": "v"},
    )
    rows = out.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, 1000))
    assert rows[0]["v"] == min(r["v"] for r in rows)
    # the grand total rides along and equals the last running sum
    assert abs(rows[-1]["run_total"] - rows[-1]["run"]) < 1e-9
    assert all(r["n"] == 999 for r in rows[:5])


def test_two_phase_rank_discrete_equals_single_window(spark):
    df = _synthetic(spark, discrete=True)
    got = {
        r["id"]: (r["rank"], r["n"])
        for r in two_phase_rank_discrete(
            spark, df, key="v", tiebreak="id", desc=True, width=256
        ).select("id", "rank", "n").collect()
    }
    want = {k: v[:2] for k, v in _window_truth(df, desc=True).items()}
    assert got == want


def test_exact_ntile_matches_spark_ntile(spark):
    # n values straddling the q=0 edge (n < buckets) and uneven splits
    for n in (3, 4, 5, 17, 100, 1003):
        df = spark.range(n).select(
            F.col("id"), (F.col("id") * 37 % 1000).alias("v")
        )
        w = Window.orderBy(F.col("v").desc(), F.col("id"))
        rows = df.select(
            "id",
            F.ntile(4).over(w).alias("want"),
            exact_ntile(
                F.row_number().over(w).cast("long"),
                F.count(F.lit(1)).over(Window.partitionBy()),
                4,
            ).cast("int").alias("got"),
        ).collect()
        assert all(r["want"] == r["got"] for r in rows), f"n={n}"


def test_pareto_approx_tracks_exact_curve(spark):
    """The sketch twin's cumulative share at a grid point must track
    the exact curve's share at the same customer count — the bound
    that makes the rows-only entry trustworthy."""
    from in_stream_processing_course_spark.plans.relational import (
        customer_pareto_curve,
        customer_pareto_curve_approx,
    )

    exact = customer_pareto_curve(spark, SF).collect()
    n = len(exact)
    approx = {
        r["top_frac"]: r
        for r in customer_pareto_curve_approx(spark, SF).collect()
    }
    for q in (0.1, 0.2, 0.5):
        a = approx[q]
        # exact share at the approx row's own customer count (the
        # sketch moves the count a little; the share must agree there)
        want = exact[a["n_customers"] - 1]["cum_share"]
        assert abs(a["cum_share"] - want) < 0.01, (q, a, want)
        # and the sketch's count stays near the nominal fraction
        assert abs(a["n_customers"] / n - q) < 0.03
