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


# --- linear probe (r9): distributed GD vs a pure-Python replay ---------------


def _probe_fit_frame(spark, n=400, dim=6, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x = [rng.uniform(-1, 1) for _ in range(dim - 1)] + [1.0]
        y = 1.0 if rng.random() < 0.3 else 0.0
        rows.append((y, x))
    return spark.createDataFrame(rows, "_y double, _x array<double>")


def _python_probe_replay(rows, dim, n_iters, lr):
    """The exact contract of operators.clustering.linear_probe_fit:
    per-row residual as a left-to-right dim fold, cross-row gradient
    as a fixed-point nano-unit integer sum, IEEE weight update."""
    n = float(len(rows))
    w = [0.0] * dim
    for _ in range(n_iters):
        gsum = [0] * dim
        for y, x in rows:
            acc = 0.0
            for d in range(dim):
                acc = acc + x[d] * w[d]
            r = y - acc
            for d in range(dim):
                v = r * x[d] * 1e9
                # round-half-away-from-zero, like F.round/DuckDB round
                gsum[d] += int(v + 0.5) if v >= 0 else -int(-v + 0.5)
        w = [w[d] + lr * ((gsum[d] / 1e9) / n) for d in range(dim)]
    return w


def test_linear_probe_fit_matches_python_replay(spark):
    from in_stream_processing_course_spark.operators.clustering import (
        linear_probe_fit,
    )

    df = _probe_fit_frame(spark)
    rows = [(r["_y"], list(r["_x"])) for r in df.collect()]
    got = linear_probe_fit(df.localCheckpoint(), 6, 4, 2.0)
    want = _python_probe_replay(rows, 6, 4, 2.0)
    assert got == want


def test_linear_probe_fit_partitioning_invariant(spark):
    from in_stream_processing_course_spark.operators.clustering import (
        linear_probe_fit,
    )

    df = _probe_fit_frame(spark, seed=12)
    w1 = linear_probe_fit(df.repartition(1).localCheckpoint(), 6, 3, 2.0)
    w32 = linear_probe_fit(df.repartition(32).localCheckpoint(), 6, 3, 2.0)
    # fixed-point gradient sums make the fit bit-identical on ANY
    # partitioning -- the property that lets the oracle replay it
    assert w1 == w32


def test_linear_probe_margins_separate_target(spark):
    from in_stream_processing_course_spark.plans.similarity_queries import (
        embedding_linear_probe_margins,
    )

    rows = embedding_linear_probe_margins(spark, SF).collect()
    target = [r for r in rows if r["is_target"]]
    rest = [r for r in rows if not r["is_target"]]
    assert len(target) == 1 and rest
    # the probe learns a real direction: the target label's margin
    # mass sits strictly above every other label's
    assert all(
        target[0]["mean_margin"] > r["mean_margin"] for r in rest
    )


def test_linear_probe_fit_empty_raises(spark):
    import pytest

    from in_stream_processing_course_spark.operators.clustering import (
        linear_probe_fit,
    )

    empty = spark.createDataFrame([], "_y double, _x array<double>")
    with pytest.raises(ValueError, match="empty fit set"):
        linear_probe_fit(empty, 6, 2, 2.0)


# --- label-noise audit (r9): same-cell 1-NN agreement -----------------------


def test_label_noise_audit_structure_and_verdict(spark):
    """The audit reports every label with sane counts — and on THIS
    synthetic corpus it must correctly flag chance-level coherence:
    exact brute-force 1-NN label agreement is 0.096 (10 labels,
    measured offline), i.e. the label column is NOT semantically
    clustered, and the cell-restricted audit has to say so rather
    than hallucinate structure. A corpus with genuinely clustered
    labels would score near 1.0 (pinned by the synthetic case below)."""
    from in_stream_processing_course_spark.plans.similarity_queries import (
        embedding_label_noise_knn,
    )

    rows = embedding_label_noise_knn(spark, SF).collect()
    assert [r["label"] for r in rows] == sorted(r["label"] for r in rows)
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_agree"] <= r["n_vectors"]
        assert abs(r["agreement_rate"] - round(r["n_agree"] / r["n_vectors"], 6)) < 1e-9
    overall = sum(r["n_agree"] for r in rows) / sum(r["n_vectors"] for r in rows)
    assert overall < 0.3  # chance-level: the audit detects the noise


def test_label_noise_audit_detects_clean_labels(spark):
    """Sanity twin: on a corpus whose labels ARE tight cosine clusters
    the same operator reports near-perfect agreement — so the
    chance-level verdict above is the data's property, not the
    operator's."""
    import random

    from in_stream_processing_course_spark.operators.similarity import (
        label_noise_same_cell,
    )

    rng = random.Random(5)
    rows = []
    for i in range(300):
        lab = i % 3
        center = [0.0] * 8
        center[lab] = 1.0
        vec = [c + rng.uniform(-0.05, 0.05) for c in center]
        rows.append((i, vec, lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = label_noise_same_cell(df, n_lists=4, n_iters=3).collect()
    assert sum(r["n_agree"] for r in out) / sum(r["n_vectors"] for r in out) > 0.95
