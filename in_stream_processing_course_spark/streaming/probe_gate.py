"""Streaming linear-probe gate — the LEARNED-READOUT counterpart of
``dsir_gate`` (n-gram target-likeness) and the seventh
streaming-curation module on the train-once / maintain-continuously
artifact contract (lm_gate = quality, drift = distribution, cm_sketch
= frequency, dedup_gate = novelty, kmeans_stats = refit statistics,
dsir_gate = target-domain selection, this = linear readout over the
embedding column).

Batch half: ``plans.similarity_queries.embedding_probe_gate`` fits a
least-squares linear probe (one-vs-rest on the target label,
fixed-point distributed GD — ``operators.clustering.linear_probe_fit``)
and selects every vector whose margin clears the fit set's mean
prediction. Deploy half (this module): fit once, persist the weight
vector and the calibrated threshold, score arrivals continuously.

Spark shape per micro-batch (plain batch code inside foreachBatch, so
the margin arithmetic is shared with the batch query):

- the model artifact is a 65-row weights table plus one threshold
  double — kilobytes at any corpus scale, collected once at gate
  construction and inlined as an array literal, so scoring is pure
  per-row Column algebra: scan -> project, NO join, NO shuffle, NO
  state store (the gate is stateless by design — novelty/frequency
  state lives in dedup_gate/cm_sketch);
- ``selected = margin > threshold`` is a scan-level gate (no global
  top-k, no single-task sort);
- one verdict row per vector upserts through ``KeyedUpsertSink``
  (vec_id-keyed) — idempotent under checkpoint replay, the
  dedup_gate/dsir_gate restart convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.similarity_queries import (
    _LP_DIM,
    _LP_ITERS,
    _LP_LR,
    _LP_TARGET,
    _margin_col,
    _probe_feats_col,
)
from ..sinks.upsert import KeyedUpsertSink


def save_probe_model(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    target_label: int = _LP_TARGET,
) -> None:
    """Fit and persist the probe artifact from a (vec_id, embedding,
    label) frame:

    - ``path/weights`` — (dim, weight), 65 rows (dim 64 is the bias);
    - ``path/meta`` — the calibrated threshold (the fit set's mean
      prediction, fixed-point micro-unit sum) plus the fit
      hyperparameters for provenance.

    Raises early when no labeled rows exist (``linear_probe_fit``'s
    empty-fit precondition — a probe cannot calibrate on nothing).
    Unlike the registered query, the fit here uses the WHOLE provided
    frame (callers deploying at 100 TB pass their own md5-ordered
    sample, the ``lloyd_fit`` bound)."""
    from ..operators.clustering import linear_probe_fit

    fit = (
        emb.where(F.col("label").isNotNull())
        .select(
            F.when(F.col("label") == target_label, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("_y"),
            _probe_feats_col().alias("_x"),
        )
        .localCheckpoint()
    )
    w = linear_probe_fit(fit, _LP_DIM, _LP_ITERS, _LP_LR)
    thr = float(
        fit.select(
            (
                (
                    F.sum(
                        F.round(
                            _margin_col(w, F.col("_x")) * F.lit(1e6), 0
                        ).cast("bigint")
                    )
                    / F.lit(1e6)
                )
                / F.count(F.lit(1))
            ).alias("thr")
        ).head()["thr"]
    )
    spark.createDataFrame(
        [(d, float(w[d])) for d in range(_LP_DIM)], "dim int, weight double"
    ).write.mode("overwrite").parquet(f"{path}/weights")
    spark.createDataFrame(
        [(thr, int(target_label), _LP_ITERS, float(_LP_LR))],
        "threshold double, target_label int, n_iters int, lr double",
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_probe_model(
    spark: SparkSession, path: str
) -> tuple[list[float], float]:
    """(weights, threshold) from a persisted artifact — a dense
    0..dim-1 weights table, hard-checked like the centroid loader."""
    rows = sorted(
        spark.read.parquet(f"{path}/weights").collect(),
        key=lambda r: r["dim"],
    )
    if [r["dim"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"probe weights at {path} must be a dense 0..dim-1 table; "
            f"got {[r['dim'] for r in rows]}"
        )
    thr = spark.read.parquet(f"{path}/meta").head()["threshold"]
    return [float(r["weight"]) for r in rows], float(thr)


def score_vectors(
    emb: DataFrame, weights: list[float], threshold: float
) -> DataFrame:
    """(vec_id, label, margin, selected) per arriving vector — the
    same margin fold, 6-dp display rounding, and raw-margin threshold
    comparison as the batch ``embedding_probe_gate``, so verdicts
    agree row for row on the training corpus (what the stream==batch
    test pins). Pure projection: works identically on a batch frame
    and inside foreachBatch."""
    margin = _margin_col(weights, _probe_feats_col())
    return emb.select(
        "vec_id", "label", margin.alias("_m")
    ).select(
        "vec_id",
        "label",
        F.round(F.col("_m"), 6).alias("margin"),
        (F.col("_m") > F.lit(float(threshold))).alias("selected"),
    )


class ProbeGate:
    """foreachBatch target: score each micro-batch against the
    persisted probe and upsert one verdict row per vec_id. The
    artifact is read ONCE at construction (it is immutable model
    state; refitting ships a new path — the lm_gate convention)."""

    def __init__(
        self, spark: SparkSession, model_path: str, verdict_path: str
    ) -> None:
        self.spark = spark
        self.weights, self.threshold = load_probe_model(spark, model_path)
        self._sink = KeyedUpsertSink(verdict_path, ["vec_id"])

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        self._sink(
            score_vectors(batch_df, self.weights, self.threshold),
            batch_id,
        )


def gate_vector_stream(
    emb: DataFrame,
    gate: ProbeGate,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Wire an embedding stream through the gate."""
    writer = (
        emb.writeStream.foreachBatch(gate)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
