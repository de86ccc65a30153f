"""Retrieval-family queries over ``documents`` + ``embeddings``: BM25
lexical top-k, hybrid lexical+semantic reciprocal-rank fusion, and MMR
diversification — the query-time side of a training-data / RAG corpus
(the reference's analytical surface stops at aggregation; these extend
the engine to the retrieval workloads its users run next to it).

Numeric discipline (same as text_tfidf / similarity_queries): every
cross-engine score is a fixed sequence of correctly-rounded IEEE ops
from exact integers — rational idf ((N-df+0.5)/(df+0.5)) instead of
the classic ln() form, because ln may differ by an ulp between libm
implementations and flip a 6-dp rounding, whereas +,-,*,/ on the same
doubles are bit-identical everywhere. Per-doc sums fold in term-sorted
order (Spark ``aggregate`` over ``array_sort`` == DuckDB
``list_reduce`` over ``list(... ORDER BY term)``).

Scale notes: tf/df are one explode->filter->groupBy over the corpus
(filter on the query's terms cuts the explode before the shuffle); the
global top-k is ``orderBy().limit(k)`` — Spark's TakeOrderedAndProject
(per-partition heap + k-row driver merge), never a corpus-wide
single-partition Window; every rank Window runs over an
already-limited (<= fusion depth) input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tx
from ..operators.similarity import brute_force_topk
from ..sources.batch import fan_out_by, load_table, scan_partitions

# BM25 parameters (Robertson defaults) and the fixed benchmark query
_K1 = 1.2
_B = 0.75
_QUERY_TERMS = ("spark", "join", "window")
_TOP_K = 10
_FUSE_DEPTH = 50  # per-ranking depth feeding RRF / MMR
_RRF_K = 60
_QVEC_ID = 0  # the semantic query = this row's embedding
_MMR_LAMBDA = 0.7


def _sql_terms() -> str:
    return "[" + ", ".join(f"'{t}'" for t in _QUERY_TERMS) + "]"


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_matched, score): rational-idf BM25 of the fixed query
    against every document matching >= 1 term.

    The narrow-scan fan-out is keyed by doc_id (r13, guide §2.4 —
    sources.batch.fan_out_by; no-op at real scale): hash(doc_id)
    satisfies the tf groupBy (doc_id, term), the lens/tf join, and the
    final per-doc fold, so the whole score pipeline runs on the single
    fan-out exchange."""
    docs = fan_out_by(
        load_table(spark, sf_dir, "documents", fan_out=False),
        "doc_id",
        n_partitions=scan_partitions(spark, sf_dir, "documents"),
    )
    staged = docs.select(
        "doc_id", tx.tokens_col(F.lower(F.col("text"))).alias("_toks")
    )
    lens = staged.select("doc_id", F.size("_toks").cast("long").alias("dl"))
    # corpus stats: two scalars, broadcast back
    stats = lens.agg(
        F.count(F.lit(1)).alias("_n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("_avgdl"),
    )
    tf = (
        staged.select(
            "doc_id", F.explode("_toks").alias("term")
        )
        .where(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = F.col("dl").cast("double")
    idf = ((F.col("_n") - F.col("df")) + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tf_part = (F.col("tf") * F.lit(_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(_K1)
        * (F.lit(1.0 - _B) + F.lit(_B) * (dl / F.col("_avgdl")))
    )
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(lens, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", "term", (idf * tf_part).alias("_s"))
    )
    return per_term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "_s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_s"],
            ),
            6,
        ).alias("score"),
    )


def _limited_rank(scored: DataFrame, order, k: int, rank_name: str) -> DataFrame:
    """Global top-k + rank: TakeOrderedAndProject does the distributed
    top-k; the row_number Window then runs over <= k rows."""
    top = scored.orderBy(*order).limit(k)
    return top.withColumn(
        rank_name, F.row_number().over(Window.orderBy(*order)).cast("int")
    )


def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for the fixed 3-term query by rational-idf
    BM25 (k1=1.2, b=0.75)."""
    scored = _bm25_scored(spark, sf_dir)
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    return _limited_rank(scored, order, _TOP_K, "rank").select(
        "doc_id", "n_matched", "score", "rank"
    )


_SQL_BM25_SCORED = f"""
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\\s+'),
                     x -> len(x) > 0) AS t
  FROM documents
),
lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM lens),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  WHERE list_contains({_sql_terms()}, term)
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
per_term AS (
  -- every fractional literal is ::DOUBLE: DuckDB parses bare 0.5 as
  -- DECIMAL and int+DECIMAL stays DECIMAL — a different arithmetic
  -- than Spark's double promotion (and a Decimal-typed output trap)
  SELECT tf.doc_id, tf.term,
         (((stats.n - df.df) + CAST(0.5 AS DOUBLE))
          / (df.df + CAST(0.5 AS DOUBLE)))
         * ((tf.tf * CAST({_K1 + 1.0} AS DOUBLE)) /
            (tf.tf + CAST({_K1} AS DOUBLE) * (CAST({1.0 - _B} AS DOUBLE)
             + CAST({_B} AS DOUBLE)
             * (CAST(lens.dl AS DOUBLE) / stats.avgdl)))) AS s
  FROM tf JOIN df USING (term) JOIN lens USING (doc_id), stats
),
bm25 AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         round(list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                           (acc, x) -> acc + x), 6) AS score
  FROM per_term GROUP BY doc_id
)
"""

ORACLE_BM25_TOPK = f"""
WITH {_SQL_BM25_SCORED}
SELECT doc_id, n_matched, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
FROM bm25
ORDER BY score DESC, doc_id ASC
LIMIT {_TOP_K}
"""


def _semantic_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cosine, sem_rank): top fusion-depth semantic matches of
    the fixed query vector (embeddings align 1:1 with doc_ids)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb, emb.where(F.col("vec_id") == _QVEC_ID), _FUSE_DEPTH
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        "cosine",
        F.col("rank").alias("sem_rank"),
    )


def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 ranking and the semantic
    (cosine) ranking, depth 50 each: rrf = 1/(60+lex_rank) +
    1/(60+sem_rank), missing side contributes 0. The modern hybrid-
    search default (lexical recall + semantic recall, rank-space
    fusion so the two score scales never need calibration).

    Scale note: the semantic side here is the exact brute-force ranking
    (the correctness baseline, and what the oracle can replay); at
    corpus scale the drop-in replacement is the IVF/LSH path
    (operators/similarity.py, ``knn_ivf``/``knn_lsh_*``) — fusion is
    agnostic to which ranker produced the depth-50 list."""
    lex = _limited_rank(
        _bm25_scored(spark, sf_dir),
        [F.col("score").desc(), F.col("doc_id").asc()],
        _FUSE_DEPTH,
        "lex_rank",
    ).select("doc_id", "lex_rank")
    sem = _semantic_scored(spark, sf_dir).select("doc_id", "sem_rank")
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0)
            )
        ).alias("_rrf"),
    )
    order = [F.col("_rrf").desc(), F.col("doc_id").asc()]
    return _limited_rank(fused, order, _TOP_K, "rank").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        F.round("_rrf", 6).alias("rrf_score"),
        "rank",
    )


# single source of truth for the fixed-order cosine fold — the oracle
# must compute the exact same IEEE op sequence as the knn family's
from .similarity_queries import _sql_cosine


_SQL_SEM_RANKED = f"""
probe AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {_QVEC_ID}),
sem_scored AS (
  SELECT e.vec_id AS doc_id, {_sql_cosine('probe.q', 'e.embedding')} AS cosine
  FROM embeddings e, probe WHERE e.vec_id <> {_QVEC_ID}
),
sem AS (
  SELECT doc_id, cosine,
         CAST(row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS INT)
           AS sem_rank
  FROM sem_scored
  ORDER BY cosine DESC, doc_id ASC
  LIMIT {_FUSE_DEPTH}
)
"""

ORACLE_HYBRID_RRF = f"""
WITH {_SQL_BM25_SCORED},
lex AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
           AS lex_rank
  FROM bm25
  ORDER BY score DESC, doc_id ASC
  LIMIT {_FUSE_DEPTH}
),
{_SQL_SEM_RANKED.lstrip()},
fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex.lex_rank,
         sem.sem_rank,
         COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + lex.lex_rank),
                  CAST(0.0 AS DOUBLE))
         + COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + sem.sem_rank),
                    CAST(0.0 AS DOUBLE)) AS rrf
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, lex_rank, sem_rank, round(rrf, 6) AS rrf_score,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
FROM fused
ORDER BY rrf DESC, doc_id ASC
LIMIT {_TOP_K}
"""


def mmr_greedy(
    rel: dict[int, float], sims: dict[int, dict[int, float]], k: int
) -> list[tuple[int, float]]:
    """The MMR selection core, module-level so it is property-testable
    without Spark: pick up to ``k`` ids maximizing
    ``lambda*rel[d] - (1-lambda)*max(sim to already-picked)``, smallest
    id on score ties. Pure IEEE double arithmetic in a fixed op order —
    the same sequence the recursive-CTE oracle evaluates."""
    chosen: list[tuple[int, float]] = []
    remaining = sorted(rel, key=lambda d: (-rel[d], d))
    while remaining and len(chosen) < k:
        best = None
        for d in remaining:
            max_sim = max(
                (sims.get(d, {}).get(c, 0.0) for c, _ in chosen), default=0.0
            )
            s = _MMR_LAMBDA * rel[d] - (1.0 - _MMR_LAMBDA) * max_sim
            if best is None or s > best[1] or (s == best[1] and d < best[0]):
                best = (d, s)
        chosen.append(best)
        remaining.remove(best[0])
    return chosen


def retrieval_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance reranking: greedily pick 10 of the 50
    semantic candidates maximizing lambda*relevance - (1-lambda)*
    max-similarity-to-already-picked (lambda=0.7) — the standard
    redundancy-removing rerank between retrieval and a context window.

    MMR is inherently sequential (each pick changes the next argmax),
    so the greedy runs per-query over the BOUNDED candidate set
    (fusion depth, 50 rows) — exactly the "iterative algorithm over a
    blocked candidate set" shape: candidates come from the distributed
    top-k; only <= depth rows per query ever concentrate. All scores
    are 6-dp-rounded doubles that are bit-identical to the DuckDB
    oracle's, so the greedy's comparisons pick the same argmax on both
    sides (ties broken by doc_id)."""
    cands = _semantic_scored(spark, sf_dir).select(
        "doc_id", F.col("cosine").alias("rel")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    cand_emb = cands.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    # pairwise similarity among candidates: depth^2 bounded (50x50)
    a = cand_emb.select(
        F.col("doc_id").alias("a"),
        F.col("embedding").alias("_ea"),
    )
    b = cand_emb.select(
        F.col("doc_id").alias("b"),
        F.col("embedding").alias("_eb"),
    )
    from ..functions.vectors import cosine_col

    pair_sim = a.join(F.broadcast(b), F.col("a") != F.col("b")).select(
        "a",
        "b",
        F.round(cosine_col(F.col("_ea"), F.col("_eb")), 6).alias("sim"),
    )
    # array<struct<b,sim>>, not a MapType: Arrow hands struct arrays to
    # pandas as dicts; map columns arrive as (k, v) tuple lists
    sims = pair_sim.groupBy("a").agg(
        F.array_sort(F.collect_list(F.struct("b", "sim"))).alias("nbr_sims")
    )
    staged = cands.join(sims, cands["doc_id"] == sims["a"], "left").select(
        "doc_id", "rel", "nbr_sims"
    )

    import pandas as pd

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        sims = {
            int(d): {
                int(e["b"]): float(e["sim"])
                for e in (entries if entries is not None else [])
            }
            for d, entries in zip(pdf["doc_id"], pdf["nbr_sims"])
        }
        rel = {
            int(d): float(r) for d, r in zip(pdf["doc_id"], pdf["rel"])
        }
        chosen = mmr_greedy(rel, sims, _TOP_K)
        # raw doubles out; the 6-dp rounding happens in the PLAN
        # (F.round) so it matches the oracle's engine rounding —
        # Python's round() is correctly-rounded decimal rounding and
        # can differ by 1e-6 on multiply-round boundary values
        return pd.DataFrame(
            {
                "doc_id": [c[0] for c in chosen],
                "mmr_score": [c[1] for c in chosen],
                "rank": list(range(1, len(chosen) + 1)),
            }
        )

    out = staged.withColumn("_g", F.lit(1)).groupBy("_g").applyInPandas(
        greedy, "doc_id long, mmr_score double, rank int"
    )
    return out.withColumn("mmr_score", F.round("mmr_score", 6)).orderBy("rank")


ORACLE_MMR = f"""
WITH RECURSIVE
{_SQL_SEM_RANKED.lstrip().rstrip()},
cand AS (
  SELECT sem.doc_id, sem.cosine AS rel, e.embedding
  FROM sem JOIN embeddings e ON e.vec_id = sem.doc_id
),
pair_sim AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         {_sql_cosine('a.embedding', 'b.embedding')} AS sim
  FROM cand a JOIN cand b ON a.doc_id <> b.doc_id
),
sel AS (
  SELECT 1 AS rank,
         first(doc_id ORDER BY rel DESC, doc_id ASC) AS doc_id,
         round(CAST({_MMR_LAMBDA} AS DOUBLE)
               * first(rel ORDER BY rel DESC, doc_id ASC)
               - CAST({1.0 - _MMR_LAMBDA} AS DOUBLE)
               * CAST(0.0 AS DOUBLE), 6) AS mmr_score,
         [first(doc_id ORDER BY rel DESC, doc_id ASC)] AS chosen
  FROM cand
  UNION ALL
  SELECT sel.rank + 1, nxt.doc_id, round(nxt.s, 6) AS mmr_score,
         list_append(sel.chosen, nxt.doc_id)
  FROM sel, LATERAL (
    SELECT c.doc_id,
           CAST({_MMR_LAMBDA} AS DOUBLE) * c.rel
           - CAST({1.0 - _MMR_LAMBDA} AS DOUBLE) * COALESCE(
             (SELECT max(p.sim) FROM pair_sim p
              WHERE p.a = c.doc_id AND list_contains(sel.chosen, p.b)),
             CAST(0.0 AS DOUBLE)) AS s
    FROM cand c
    WHERE NOT list_contains(sel.chosen, c.doc_id)
    ORDER BY s DESC, c.doc_id ASC
    LIMIT 1
  ) nxt
  WHERE sel.rank < {_TOP_K}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, mmr_score, CAST(rank AS INT) AS rank
FROM sel
ORDER BY rank
"""
