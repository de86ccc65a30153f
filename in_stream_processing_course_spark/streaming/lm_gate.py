"""Streaming LM quality gate: score a document stream against a
PERSISTED bigram model — the deploy-time half of the corpus-LM family
(plans/lm_queries.py trains and scores in one batch job; a curation
service trains once, persists the model, and scores arrivals
continuously).

Spark shape: STREAM-STATIC equi-joins. The exploded bigram stream
left-joins the model and context tables (both static parquet, both
vocabulary-sized — Spark broadcasts them per micro-batch, the stream
never shuffles for the join), then a streaming groupBy(doc_id)
aggregation reassembles per-document scores. Unlike the batch
self-scoring query, arriving documents can contain bigrams and even
context words the model never saw — the add-½ smoothing handles both
through the same integer-ratio formula with coalesced zero counts:
``p = (2·c_bigram + 1) / (2·c_ctx + V)``.

Output-mode contract: each document arrives as ONE input row, so all
its bigrams land in the same micro-batch and its score is complete at
that batch's update emission; a downstream keyed upsert (doc_id) holds
the final table. Batch/stream equivalence against
``plans.lm_queries.lm_doc_scores`` is pinned by test (same sorted-fold
arithmetic, same rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.lm_queries import (
    _doc_bigrams,
    _model_with_ctx,
    _vocab_size,
    bigrams_of,
)


def save_lm_model(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Train the bigram model on ``sf_dir``'s documents and persist the
    three artifacts a scorer needs:

    - ``path/model``:  (bigram, c_bigram) — bigram counts
    - ``path/ctx``:    (w1, c_ctx) — context (bigram-prefix) counts
    - ``path/meta``:   one row (v) — vocabulary size for smoothing

    All three are vocabulary-sized (kilobytes to megabytes at any
    corpus scale — they aggregate away the corpus)."""
    bi = _doc_bigrams(spark, sf_dir)
    model = _model_with_ctx(bi)
    model.select("bigram", "c_bigram").write.mode("overwrite").parquet(
        f"{path}/model"
    )
    model.select("w1", "c_ctx").distinct().write.mode("overwrite").parquet(
        f"{path}/ctx"
    )
    _vocab_size(spark, sf_dir).write.mode("overwrite").parquet(f"{path}/meta")


def score_document_stream(
    docs: DataFrame, spark: SparkSession, model_path: str
) -> DataFrame:
    """(doc_id, n_bigrams, mean_p) per arriving document, scored
    against the persisted model. ``docs`` needs (doc_id, text); works
    identically on a batch frame (the stream-static joins degrade to
    plain broadcast joins). Documents with fewer than two tokens have
    no bigrams and emit nothing (matching the batch query)."""
    model = spark.read.parquet(f"{model_path}/model")
    ctx = spark.read.parquet(f"{model_path}/ctx")
    v = int(spark.read.parquet(f"{model_path}/meta").head()["v"])
    # the SAME staging expressions the batch scorer uses — sharing the
    # helper is what keeps the stream==batch equivalence pinned
    bi = bigrams_of(docs.select("doc_id", "text"))
    scored = (
        bi.join(F.broadcast(model), "bigram", "left")
        .join(F.broadcast(ctx), "w1", "left")
        .select(
            "doc_id",
            (
                (2 * F.coalesce(F.col("c_bigram"), F.lit(0)) + 1)
                / (
                    2 * F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(v)
                ).cast("double")
            ).alias("p"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("p")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_p"),
    )
