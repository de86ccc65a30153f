"""Similarity search over embedding columns (north-star X2).

Two tiers:
- ``brute_force_topk``: exact cosine top-k for a (small, broadcast)
  probe set against the full corpus — the correctness baseline. The
  probe side is broadcast so the scan side never shuffles; cosine is
  zip_with/aggregate Column algebra inside codegen.
- ``bucketed_topk``: the scale path — both sides are bucketed by a
  deterministic LSH key (coordinate-sign hyperplanes) and joined on
  the bucket, so candidate generation is an equi-join, not a cross
  product. Recall is tunable via bucket bits / multi-probe.

At 100 TB the corpus side stays partitioned; only the probe set and
the final top-k per probe (k rows) ever concentrate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_col, sign_bucket_col


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    ``probes`` is expected small (it is broadcast); the corpus scan is
    embarrassingly parallel. Cosine rounded to 6 dp for deterministic
    rank ties (tie-break on neighbor id).
    """
    p = probes.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
    )
    scored = (
        c.join(F.broadcast(p), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("_q"), F.col("_v")), 6))
        .drop("_q", "_v")
    )
    return _ranked_topk(scored, k)


def bucketed_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the probe's sign-bucket; rerank
    exactly within the bucket. Equi-join on the bucket key scales as a
    normal shuffle join (AQE splits skewed buckets).
    """
    p = probes.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_q"),
        sign_bucket_col(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_v"),
        sign_bucket_col(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(p), ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("_q"), F.col("_v")), 6))
        .drop("_q", "_v", "bucket")
    )
    return _ranked_topk(scored, k)
