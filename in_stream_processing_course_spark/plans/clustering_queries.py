"""Clustering queries over ``embeddings`` (operators/clustering):
oracle-backed nearest-centroid assignment, and the iterative Lloyd's
fit (rows-only — a 5-round driver loop is not one SQL statement; the
fit is pinned bit-for-bit against a pure-Python replay in
tests/test_clustering.py instead).

These are the missing middle of the SemDeDup pipeline the repo
already brackets: ``knn_ivf`` consumes a fitted k-means index,
``semantic_dedup_keep`` consumes a cluster block key — this family is
the operator that produces both, DataFrame-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import (
    assign_to_centroids,
    lloyd_fit,
    seed_centroids,
)
from ..sources.batch import load_table

_K = 8  # centroids = embeddings of the 8 smallest vec_ids
_N_ITERS = 5

# fixed-order squared-distance fold, identical to vectors.sqdist_col
_SQL_SQDIST = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len({a})),"
    " i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))),"
    " (acc, x) -> acc + x)"
)


def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment of the whole embeddings table to a
    fixed centroid set (the seed centroids — the vectors of the k
    smallest vec_ids), with the squared distance. This is the
    corpus-sized pass of every k-means round and of deploy-time
    cluster routing, isolated so the oracle can pin its distance rule:
    k ordered folds + first-minimum argmin per row, scan → project,
    no shuffle (the ORDER BY is presentation only).

    The cluster id is the 0-based rank of the centroid in vec_id
    order; ties in distance break to the lowest rank on both engines
    (array_position returns the first minimum; the oracle ranks by
    (dist2, centroid rank))."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = seed_centroids(emb, _K)
    return (
        assign_to_centroids(emb, centroids)
        .select(
            "vec_id",
            "cluster",
            F.round(F.col("dist2"), 6).alias("dist2"),
        )
        .orderBy("vec_id")
    )


ORACLE_KMEANS_ASSIGN = f"""
WITH cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cidx,
         embedding AS c
  FROM embeddings WHERE vec_id IN (
    SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_K})
),
scored AS (
  SELECT e.vec_id, cent.cidx,
         {_SQL_SQDIST.format(a='e.embedding', b='cent.c')} AS d
  FROM embeddings e CROSS JOIN cent
),
best AS (
  SELECT vec_id, cidx, d,
         row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cidx ASC)
           AS rn
  FROM scored
)
SELECT vec_id, cidx AS cluster, round(d, 6) AS dist2
FROM best WHERE rn = 1 ORDER BY vec_id
"""


def embedding_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Lloyd's fit (k = _K centroids, _N_ITERS iterations,
    deterministic seed = the k smallest vec_ids) and the resulting
    clustering profile: per cluster, the member count and the inertia
    contribution (sum of squared distances to the final centroid,
    folded in sorted order → partitioning-invariant, 6-dp rounded).

    Iterative driver loop — each round is one assignment projection +
    one (cluster, dim) aggregation; only k·dim doubles cross the
    driver boundary per round, so the fit is a fixed number of bounded
    corpus scans at any scale. No SQL oracle (a fixed-point loop is
    not a DuckDB statement); the driver records the rows-only check
    and tests/test_clustering.py pins the fit bit-for-bit against a
    pure-Python replay of the same ordered folds at sf0.001, plus the
    monotone-inertia invariant of Lloyd's."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = lloyd_fit(emb, _K, _N_ITERS)
    assigned = assign_to_centroids(emb, centroids)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("dist2")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("inertia"),
        )
        .orderBy("cluster")
    )
