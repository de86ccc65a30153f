"""Similarity-search queries over ``embeddings`` (north-star X2):
brute-force cosine top-k (exact baseline) and sign-LSH bucketed ANN
(the scale path). Cosine is a fixed-order double fold on both sides,
so values are bit-identical and 6-dp rounding is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    brute_force_topk,
    bucketed_topk,
    multiprobe_topk,
)
from ..sources.batch import load_table

_K = 5
_N_PROBES = 8  # vec_id < 8 are the probe vectors
_N_BITS = 8

# fixed-order double fold: dot / (|a| * |b|)
_SQL_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
)


def _sql_cosine(a: str, b: str) -> str:
    dot = _SQL_DOT.format(a=a, b=b)
    na = f"sqrt({_SQL_DOT.format(a=a, b=a)})"
    nb = f"sqrt({_SQL_DOT.format(a=b, b=b)})"
    return f"round({dot} / ({na} * {nb}), 6)"


def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < _N_PROBES)
    return brute_force_topk(emb, probes, _K).orderBy("query_id", "rank")


ORACLE_KNN_BRUTE = f"""
WITH probes AS (SELECT vec_id AS query_id, embedding AS q FROM embeddings
                WHERE vec_id < {_N_PROBES}),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         {_sql_cosine('p.q', 'e.embedding')} AS cosine
  FROM probes p JOIN embeddings e ON e.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


_SQL_BUCKET = (
    "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(generate_series(0, {nb} - 1),"
    " i -> CASE WHEN {a}[i + 1] >= 0 THEN CAST(power(2, i) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END)), (acc, x) -> acc + x) AS INT)"
)


def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < _N_PROBES)
    return bucketed_topk(emb, probes, _K, n_bits=_N_BITS).orderBy(
        "query_id", "rank"
    )


ORACLE_KNN_LSH = f"""
WITH b AS (
  SELECT vec_id, embedding,
         {_SQL_BUCKET.format(a='embedding', nb=_N_BITS)} AS bucket
  FROM embeddings
),
probes AS (SELECT vec_id AS query_id, embedding AS q, bucket FROM b
           WHERE vec_id < {_N_PROBES}),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         {_sql_cosine('p.q', 'e.embedding')} AS cosine
  FROM probes p JOIN b e ON e.bucket = p.bucket AND e.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


def knn_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe variant: exact bucket + every single-bit-flip
    neighbor bucket per query (recall lever at fixed corpus layout)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < _N_PROBES)
    return multiprobe_topk(emb, probes, _K, n_bits=_N_BITS).orderBy(
        "query_id", "rank"
    )


_SQL_FLIPS = ", ".join(str(m) for m in [0] + [1 << i for i in range(_N_BITS)])

ORACLE_KNN_MULTIPROBE = f"""
WITH b AS (
  SELECT vec_id, embedding,
         {_SQL_BUCKET.format(a='embedding', nb=_N_BITS)} AS bucket
  FROM embeddings
),
probes AS (SELECT vec_id AS query_id, embedding AS q, bucket FROM b
           WHERE vec_id < {_N_PROBES}),
pb AS (
  SELECT query_id, q, CAST(xor(bucket, m) AS INT) AS bucket
  FROM probes, unnest([{_SQL_FLIPS}]) AS t(m)
),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         {_sql_cosine('p.q', 'e.embedding')} AS cosine
  FROM pb p JOIN b e ON e.bucket = p.bucket AND e.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norms — array aggregation via posexplode +
    re-collect (the distributed way to average vectors: explode to
    (label, dim, value), aggregate per dim, no driver collect).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    # fold per-dim values in SORTED order: bit-identical sums on any
    # partitioning (plain double sums are order-dependent; the oracle
    # folds the same sorted list). Scale note: at 100 TB use plain
    # sum/avg — the sorted fold is the oracle-determinism shape.
    sorted_sum = F.aggregate(
        F.array_sort(F.collect_list(F.col("v").cast("double"))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        (sorted_sum / F.count(F.lit(1))).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )
    # level 2: fold the per-dim squares in dim order (dims are unique
    # per label, so sorting (dim, mean_v) structs gives one fixed order)
    sq_sum = F.aggregate(
        F.array_sort(F.collect_list(F.struct("dim", "mean_v"))),
        F.lit(0.0),
        lambda a, x: a + x["mean_v"] * x["mean_v"],
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.max("n").alias("n_vectors"),
            F.round(F.sqrt(sq_sum), 6).alias("centroid_norm"),
        )
        .orderBy("label")
    )


ORACLE_CENTROIDS = """
WITH exploded AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
),
per_dim AS (
  SELECT label, dim,
         list_reduce(list_prepend(0.0, list_sort(list(v))),
                     (acc, x) -> acc + x) / COUNT(*) AS mean_v,
         COUNT(*) AS n
  FROM exploded GROUP BY label, dim
)
SELECT label,
       CAST(MAX(n) AS BIGINT) AS n_vectors,
       round(sqrt(list_reduce(list_prepend(0.0,
               list_transform(list_sort(list(struct_pack(d := dim, m := mean_v))),
                              s -> s.m * s.m)),
             (acc, x) -> acc + x)), 6) AS centroid_norm
FROM per_dim GROUP BY label ORDER BY label
"""


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (k-means inverted lists, n_probe=4 of 16 cells — scans
    ~25% of the corpus per query). No SQL oracle — the k-means index is
    not expressible in DuckDB; driver records the rows-only check, and
    the recall-vs-brute-force bound is asserted in
    tests/test_similarity.py."""
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < _N_PROBES)
    return ivf_topk(
        emb, probes, _K, n_probe=4, cache_key=f"{sf_dir}/embeddings"
    ).orderBy("query_id", "rank")


def embedding_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label histogram of L2 norms (bin width 0.05): the standard
    sanity profile before cosine workloads — unnormalized vectors in a
    supposedly-normalized corpus show up as off-center bins.

    The norm is an ORDERED left fold over the array (F.aggregate ==
    DuckDB list_reduce with a prepended init), so the double sum is
    bit-identical on both engines under any row partitioning — the
    array carries its own element order, unlike a row sum. One
    projection + one tiny groupBy; no UDF, no explode.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select("label", F.floor(norm * 20).alias("norm_bin"))
        .groupBy("label", "norm_bin")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("label", "norm_bin")
    )


ORACLE_NORM_HISTOGRAM = """
SELECT label,
       CAST(floor(sqrt(list_reduce(
             list_prepend(0.0, list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (acc, x) -> acc + x)) * 20) AS BIGINT) AS norm_bin,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM embeddings
GROUP BY 1, 2
ORDER BY label, norm_bin
"""


# --- seeded random projection (Achlioptas sign matrix) -----------------------

_RP_OUT_DIMS = 16
_RP_IN_DIMS = 64


def _rp_sign(j: int, d: int) -> float:
    """Deterministic +-1 from md5("rp-j-d") — the same engine-portable
    random oracle the minhash family uses, evaluated ONCE at plan-build
    time (Python hashlib md5 == Spark md5 == DuckDB md5) and inlined as
    a literal, so neither engine pays 1024 md5 calls per row."""
    import hashlib

    h = hashlib.md5(f"rp-{j}-{d}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) < 8 else -1.0


_RP_MATRIX = [
    _rp_sign(j, d)
    for j in range(_RP_OUT_DIMS)
    for d in range(1, _RP_IN_DIMS + 1)
]
_RP_MATRIX_SQL = "[" + ", ".join(
    ("1.0" if v > 0 else "-1.0") for v in _RP_MATRIX
) + "]"


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection 64 -> 16 dims
    (Achlioptas 2003: +-1 entries preserve pairwise distances in
    expectation like Gaussian ones, but need no float matrix): the
    standard cheap front-end for ANN indexing and dedup blocking when
    the full embedding is too wide to shuffle.

    The projection is per-row Column algebra over the vector's own
    array — an ORDERED left fold per output dim, so the double sum is
    bit-identical across engines and row orderings. No shuffle at all:
    the plan is scan -> project, embarrassingly parallel at 100 TB,
    and the emitted row is 4x narrower than the input (the point of
    the operator). The sign matrix is a compile-time literal in both
    engines; 1/sqrt(16) scaling keeps norms comparable.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    mat = "array(" + ", ".join(
        ("1.0D" if v > 0 else "-1.0D") for v in _RP_MATRIX
    ) + ")"
    proj = ", ".join(
        "round(aggregate(sequence(1, {n}), 0.0D, (acc, d) -> acc +"
        " CAST(element_at(embedding, d) AS DOUBLE) *"
        " element_at({mat}, {off} + d)) * 0.25, 6)".format(
            n=_RP_IN_DIMS, mat=mat, off=j * _RP_IN_DIMS
        )
        for j in range(_RP_OUT_DIMS)
    )
    return emb.selectExpr(
        "vec_id", "label", f"array({proj}) AS proj"
    ).orderBy("vec_id")


ORACLE_RANDOM_PROJECTION = f"""
WITH mat AS (SELECT {_RP_MATRIX_SQL} AS m)
SELECT vec_id, label,
       list_transform(generate_series(0, {_RP_OUT_DIMS - 1}),
         j -> round(list_reduce(list_prepend(0.0,
                list_transform(generate_series(1, {_RP_IN_DIMS}),
                  d -> CAST(embedding[d] AS DOUBLE)
                       * m[j * {_RP_IN_DIMS} + d])),
              (acc, x) -> acc + x) * 0.25, 6)) AS proj
FROM embeddings, mat
ORDER BY vec_id
"""


def embedding_principal_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label principal component of the embedding cloud
    (operators/similarity.label_principal_directions) — grouped-map
    applyInPandas fitting, one model per label in parallel. Rows-only
    driver check (eigen-decomposition is not SQL-expressible); the
    variance-maximization invariant is pytest-pinned."""
    from ..operators.similarity import label_principal_directions

    emb = load_table(spark, sf_dir, "embeddings")
    return label_principal_directions(emb).orderBy("label")
