"""Streaming quantile-sketch maintenance (streaming/percentiles.py):
the persisted bucket table equals the batch histogram after a drained
drip (stream == batch), survives a checkpoint restart with more data
exactly (no double counting), serves quantiles within the DD relative
error bound, and backs the Pareto grid within tolerance of the exact
curve."""

from __future__ import annotations

import json
import math
import time

from pyspark.sql import functions as F

from in_stream_processing_course_spark.operators.sketches import (
    DD_ALPHA,
    DD_ZERO_BUCKET,
    dd_histogram,
    dd_quantiles,
)
from in_stream_processing_course_spark.sources.stream import (
    read_event_stream,
)
from in_stream_processing_course_spark.streaming.percentiles import (
    dd_maintain,
    pareto_grid_from_table,
    quantiles_from_table,
)
from in_stream_processing_course_spark.streaming.runner import await_drained

_EVENT_SCHEMA = (
    "event_id long, ts string, user_id long, event_type string,"
    " value double, props string"
)


def _write_chunk(in_dir, name: str, values: list[float]) -> None:
    with open(in_dir / name, "w") as f:
        for i, v in enumerate(values):
            f.write(
                json.dumps(
                    {
                        "event_id": abs(hash((name, i))) % 10**9,
                        "ts": f"2024-01-01T00:00:{i % 60:02d}",
                        "user_id": i,
                        "event_type": "click",
                        "value": v,
                        "props": "{}",
                    }
                )
                + "\n"
            )


def _table(spark, path) -> dict:
    return {
        r["bucket"]: r["c"] for r in spark.read.parquet(path).collect()
    }


def _batch_hist(spark, in_dir) -> dict:
    batch = spark.read.schema(_EVENT_SCHEMA).json(str(in_dir))
    return {
        r["bucket"]: r["c"]
        for r in dd_histogram(batch, "value").collect()
    }


def test_dd_maintain_stream_matches_batch_and_restarts(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    table = str(tmp_path / "dd_table")
    ckpt = str(tmp_path / "ckpt")

    vals1 = [float(v) for v in range(1, 101)]
    vals2 = [0.5 * v for v in range(1, 51)] + [0.0, -3.0]  # incl. sentinel
    _write_chunk(in_dir, "c0.json", vals1)
    time.sleep(1.1)  # file source orders micro-batches by mtime
    _write_chunk(in_dir, "c1.json", vals2)

    stream = read_event_stream(spark, str(in_dir), max_files_per_trigger=1)
    await_drained(dd_maintain(stream, "value", table, ckpt))
    assert _table(spark, table) == _batch_hist(spark, in_dir)

    # restart with MORE data, SAME checkpoint: resume from committed
    # offsets and state — no double counting, no gaps
    time.sleep(1.1)
    _write_chunk(in_dir, "c2.json", [1000.0, 2000.0, 1000.0])
    stream2 = read_event_stream(spark, str(in_dir), max_files_per_trigger=1)
    await_drained(dd_maintain(stream2, "value", table, ckpt))
    merged = _table(spark, table)
    assert merged == _batch_hist(spark, in_dir)
    assert sum(merged.values()) == len(vals1) + len(vals2) + 3
    assert merged[DD_ZERO_BUCKET] == 2  # 0.0 and -3.0

    # deploy-time read side: quantiles within the DD relative bound of
    # the exact positive-value quantiles
    exact = sorted(vals1 + [v for v in vals2 if v > 0] + [1000.0, 2000.0, 1000.0])
    qs = [0.1, 0.5, 0.9, 0.99]
    got = quantiles_from_table(spark, table, qs)
    # sentinel rows shift ranks by at most their count; allow that slack
    for q, est in zip(qs, got):
        lo = max(0, math.floor(q * (len(exact) + 2 - 1)) - 2)
        hi = min(len(exact) - 1, math.ceil(q * (len(exact) + 2 - 1)))
        candidates = exact[lo : hi + 1]
        assert any(
            abs(est - t) <= DD_ALPHA * t + 1e-9 for t in candidates
        ), f"q={q}: est {est} not within alpha of any of {candidates}"


def test_dd_pareto_grid_tracks_exact_curve(spark, sf_dir, tmp_path):
    """The maintained sketch serves customer_pareto_curve_approx's
    grid: thresholds within the DD relative bound of the exact
    per-customer spend quantiles, cumulative revenue share within
    ~2*alpha of the exact curve at every grid point."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend")
    )
    in_dir = str(tmp_path / "spend")
    per_cust.write.parquet(in_dir)
    table = str(tmp_path / "dd_table")
    stream = spark.readStream.schema("o_custkey long, spend double").parquet(
        in_dir
    )
    await_drained(
        dd_maintain(stream, "spend", table, str(tmp_path / "ckpt"))
    )

    spends = sorted(r["spend"] for r in per_cust.collect())
    n = len(spends)
    total = sum(spends)
    grid = pareto_grid_from_table(spark, table).collect()
    assert [r["top_frac"] for r in grid] == [
        round(i / 100, 2) for i in range(1, 100)
    ]
    for r in grid:
        q = r["top_frac"]
        # threshold: within alpha of the exact (1-q) quantile
        # (rank interpolation makes the exact target a range)
        rank = (1.0 - q) * (n - 1)
        lo_t = spends[max(0, math.floor(rank) - 1)]
        hi_t = spends[min(n - 1, math.ceil(rank) + 1)]
        assert (
            lo_t * (1 - DD_ALPHA) - 1e-9
            <= r["spend_threshold"]
            <= hi_t * (1 + DD_ALPHA) + 1e-9
        ), f"q={q}: threshold {r['spend_threshold']} outside [{lo_t}, {hi_t}]"
        # share: within ~2*alpha (value-mass estimate) of exact share
        # computed at the SKETCH's threshold (the grid is self-consistent)
        exact_share = (
            sum(s for s in spends if s >= r["spend_threshold"] * (1 - DD_ALPHA))
            / total
        )
        exact_share_hi = (
            sum(s for s in spends if s >= r["spend_threshold"] * (1 + DD_ALPHA))
            / total
        )
        assert (
            exact_share_hi - 3 * DD_ALPHA
            <= r["cum_share"]
            <= exact_share + 3 * DD_ALPHA
        ), f"q={q}: share {r['cum_share']} vs [{exact_share_hi}, {exact_share}]"
    # the curve is monotone: more of the customer base -> more share
    shares = [r["cum_share"] for r in grid]
    assert shares == sorted(shares)


def test_dd_quantiles_pure_python_edge_cases():
    import pytest

    with pytest.raises(ValueError, match="empty histogram"):
        dd_quantiles([], [0.5])
    with pytest.raises(ValueError, match="outside"):
        dd_quantiles([(0, 1)], [1.5])
    # single bucket: every quantile is its representative
    got = dd_quantiles([(0, 5)], [0.0, 0.5, 1.0])
    assert len(set(got)) == 1
