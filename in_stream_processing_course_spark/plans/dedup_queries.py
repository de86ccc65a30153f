"""Dedup query family over ``documents`` (north-star X1/X2): exact,
MinHash+LSH, SimHash banding, n-gram Jaccard. Oracles reproduce the
md5-based hashing bit-for-bit in DuckDB (md5 is the one hash both
engines share; murmur3/xxhash are not portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators.clustering import policy_cell_assignment, sql_policy_cells
from ..sources.batch import fan_out_by, load_table, scan_partitions


def _docs_by_id(spark, sf_dir: str):
    """documents scan with the narrow-scan fan-out keyed by doc_id
    (r13, guide §2.4 — sources.batch.fan_out_by; no-op at real scale):
    the signature/fingerprint pipelines explode tokens/shingles and
    immediately re-aggregate per doc_id, so hash(doc_id) placement
    makes that whole stage exchange-free — the per-doc aggregate's
    shuffle disappears because each document's rows never leave their
    partition."""
    return fan_out_by(
        load_table(spark, sf_dir, "documents", fan_out=False),
        "doc_id",
        n_partitions=scan_partitions(spark, sf_dir, "documents"),
    )

# --- exact dedup (X1) --------------------------------------------------------


def dedup_documents_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup with deterministic representative (min doc_id)
    + duplicate counts. At scale: hash-shuffle on md5(text), partial
    agg map-side; never ships full text twice."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


ORACLE_DEDUP_EXACT_DOCS = """
SELECT md5(text) AS text_hash,
       CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
"""


# --- MinHash signatures + LSH candidates (X2) --------------------------------

_NUM_HASHES = 16
_BANDS = 4
_SHINGLE_K = 5

_SQL_TOKENS = r"list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\s+'), x -> len(x) > 0)"
# word 5-shingles, distinct
_SQL_SHINGLES = (
    f"list_distinct(list_transform(generate_series(1, greatest(len({_SQL_TOKENS}) - {_SHINGLE_K - 1}, 1)),"
    f" i -> array_to_string(list_slice({_SQL_TOKENS}, i, i + {_SHINGLE_K - 1}), ' ')))"
)
# signature element i = min over shingles of h1(s) + i*h2(s), where
# h1 = md5 hex chars 1-15 (60 bits) and h2 = chars 17-28 (48 bits) —
# the same affine family minhash_signatures computes via Spark conv()
_SQL_SIG = (
    f"list_transform(generate_series(0, {_NUM_HASHES - 1}),"
    f" i -> list_aggregate(list_transform({_SQL_SHINGLES},"
    f" s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)"
    f" + i * CAST('0x' || substr(md5(s), 17, 12) AS BIGINT)), 'min'))"
)


def _sql_sig_ctes(src: str = "documents") -> str:
    """CTE block computing ``sig(doc_id, s)`` with md5 run ONCE per
    shingle — the oracle-side mirror of minhash_signatures' hash-once
    explode (the inline _SQL_SIG form re-evaluates both md5 calls per
    hash index: 32x the hashing; measured ~2x whole-oracle wall on the
    candidate queries). MATERIALIZED because band tables self-join —
    DuckDB would otherwise inline (recompute) sig per reference.
    Semantics identical: MIN over rows == list_aggregate('min') over
    the same multiset."""
    mins = ", ".join(f"MIN(h1 + {i} * h2) AS s{i}" for i in range(_NUM_HASHES))
    arr = ", ".join(f"s{i}" for i in range(_NUM_HASHES))
    return (
        f"_tok AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS sh FROM {src}),\n"
        "_hh AS (SELECT doc_id,\n"
        "        CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h1,\n"
        "        CAST('0x' || substr(md5(sh), 17, 12) AS BIGINT) AS h2\n"
        "        FROM _tok),\n"
        f"sig AS MATERIALIZED (SELECT doc_id, [{arr}] AS s FROM\n"
        f"  (SELECT doc_id, {mins} FROM _hh GROUP BY doc_id))"
    )


def minhash_band_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_id, band_key) LSH table — the shuffle key for
    candidate generation."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_bands(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    ).orderBy("doc_id", "band_id")


_ROWS_PER_BAND = _NUM_HASHES // _BANDS

ORACLE_MINHASH_BANDS = f"""
WITH {_sql_sig_ctes()}
SELECT doc_id,
       CAST(b AS INT) AS band_id,
       array_to_string(list_slice(s, b * {_ROWS_PER_BAND} + 1,
                                  b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}), '|') AS band_key
FROM sig, unnest(generate_series(0, {_BANDS - 1})) AS t(b)
ORDER BY doc_id, band_id
"""


def minhash_near_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs (band-key equi-join, a < b, distinct)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_candidates(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    ).orderBy("a", "b")


ORACLE_MINHASH_CANDIDATES = f"""
WITH {_sql_sig_ctes()},
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_slice(s, b * {_ROWS_PER_BAND} + 1,
                                    b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}), '|') AS band_key
  FROM sig, unnest(generate_series(0, {_BANDS - 1})) AS t(b)
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM bands l JOIN bands r
  ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
ORDER BY a, b
"""


# --- MinHash candidates -> exact verify (the full near-dup pipeline) ---------

_VERIFY_THRESHOLD = 0.5


def minhash_verified_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete two-stage near-dup pipeline: LSH band collisions
    propose candidates (cheap, no cross product), exact shingle Jaccard
    verifies them (expensive, but only on candidates). This is the
    production dedup shape at 100 TB — the exact per-pair array work
    runs on |candidates| rows, not |docs|^2.
    """
    docs = load_table(spark, sf_dir, "documents")
    cands = dd.minhash_candidates(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    sh_a = docs.select(
        F.col("doc_id").alias("a"),
        dd.shingles_col(F.col("text"), _SHINGLE_K).alias("_sa"),
    )
    sh_b = docs.select(
        F.col("doc_id").alias("b"),
        dd.shingles_col(F.col("text"), _SHINGLE_K).alias("_sb"),
    )
    return (
        cands.join(sh_a, "a")
        .join(sh_b, "b")
        .select(
            "a",
            "b",
            F.round(dd.jaccard_col(F.col("_sa"), F.col("_sb")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= _VERIFY_THRESHOLD)
        .orderBy("a", "b")
    )


ORACLE_MINHASH_VERIFIED = f"""
WITH {_sql_sig_ctes()},
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_slice(s, b * {_ROWS_PER_BAND} + 1,
                                    b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}), '|') AS band_key
  FROM sig, unnest(generate_series(0, {_BANDS - 1})) AS t(b)
),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM documents)
SELECT a, b,
       round(len(list_intersect(sa.s, sb.s))
             / greatest(len(list_distinct(sa.s || sb.s)), 1), 6) AS jaccard
FROM cands
JOIN sh sa ON sa.doc_id = a
JOIN sh sb ON sb.doc_id = b
WHERE round(len(list_intersect(sa.s, sb.s))
            / greatest(len(list_distinct(sa.s || sb.s)), 1), 6) >= {_VERIFY_THRESHOLD}
ORDER BY a, b
"""


# --- incremental dedup against a persisted index -----------------------------

# "new batch" = every 5th doc; "corpus" = the rest. In production the
# corpus band table is PERSISTED parquet built once (see
# tests/test_pipeline_ops.py round-trip); here both sides derive from
# the documents table so the oracle can reproduce the split exactly.
_NEW_MOD = 5


def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening (the 100 TB daily-ingest shape):
    new docs join the EXISTING corpus band index — corpus is scanned,
    never re-shuffled or re-hashed; the new batch's bands broadcast.
    Each new doc gets its deterministic corpus match (min colliding
    doc_id) or is flagged novel.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % _NEW_MOD != 0)
    new_batch = docs.where(F.col("doc_id") % _NEW_MOD == 0)
    index_bands = dd.minhash_bands(
        corpus, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    new_bands = dd.minhash_bands(
        new_batch, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    return dd.minhash_index_matches(index_bands, new_bands).orderBy("doc_id")


ORACLE_INCREMENTAL_DEDUP = f"""
WITH {_sql_sig_ctes()},
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_slice(s, b * {_ROWS_PER_BAND} + 1,
                                    b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}), '|') AS band_key
  FROM sig, unnest(generate_series(0, {_BANDS - 1})) AS t(b)
),
hits AS (
  SELECT n.doc_id, CAST(MIN(c.doc_id) AS BIGINT) AS matched_doc_id
  FROM bands n JOIN bands c
    ON n.band_id = c.band_id AND n.band_key = c.band_key
  WHERE n.doc_id % {_NEW_MOD} = 0 AND c.doc_id % {_NEW_MOD} <> 0
  GROUP BY n.doc_id
)
SELECT d.doc_id, hits.matched_doc_id,
       hits.matched_doc_id IS NULL AS is_novel
FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {_NEW_MOD} = 0) d
LEFT JOIN hits ON hits.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# --- n-gram Jaccard (X2, exact within blocks) --------------------------------

_JK = 3
_J_THRESHOLD = 0.2

_SQL_SHINGLES3 = (
    f"list_distinct(list_transform(generate_series(1, greatest(len({_SQL_TOKENS}) - {_JK - 1}, 1)),"
    f" i -> array_to_string(list_slice({_SQL_TOKENS}, i, i + {_JK - 1}), ' ')))"
)


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard >= 0.2 within source blocks.

    Scale adjudication (r12, sf1 gate budget x11): the set-similarity
    join's INTERMEDIATE — one row per (pair, shared shingle) within a
    source block — grows ~quadratically whenever many doc pairs share
    shingles, which a low threshold like 0.2 cannot prune early
    (measured x8.5 wall on x10 data; the final output stays small).
    That is exact-Jaccard economics, not a plan defect: at a 0.2
    threshold even PPJoin-style prefix filtering keeps ~80% of each
    doc's shingles as candidates, so there is no lossless early-out.
    The family's scale path for low thresholds is the banded MinHash
    (dedup_minhash_candidates x3.7, capped variant) with this exact
    form as the verify stage on candidates; the committed budget
    encodes the measured honest shape so a REGRESSION (lost block key,
    new fan-out) still breaks the gate."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", _JK, _J_THRESHOLD, "source"
    ).orderBy("a", "b")


ORACLE_NGRAM_JACCARD = f"""
WITH sh AS (SELECT doc_id, source, {_SQL_SHINGLES3} AS s FROM documents)
SELECT l.doc_id AS a, r.doc_id AS b,
       round(len(list_intersect(l.s, r.s))
             / greatest(len(list_distinct(l.s || r.s)), 1), 6) AS jaccard
FROM sh l JOIN sh r ON l.source = r.source AND l.doc_id < r.doc_id
WHERE round(len(list_intersect(l.s, r.s))
            / greatest(len(list_distinct(l.s || r.s)), 1), 6) >= {_J_THRESHOLD}
ORDER BY a, b
"""


# --- embedding-cosine near-dup (X2) ------------------------------------------

_COS_THRESHOLD = 0.3


def embedding_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine >= 0.3 within POLICY-SIZED seed-centroid cells
    over ``embeddings`` — the embedding-space member of the dedup
    family (near-dup detection on vector similarity rather than token
    overlap).

    r11 (VERDICT r10 #1): the block key was the fixed-cardinality
    ``label`` column — within-block pair work grew quadratically with
    the corpus (measured ×19.3 wall on ×10 data,
    SCALE_TREND_r10_sf1.txt). The registered form now blocks on
    ``policy_cell_assignment`` cells (k = max(√n, n/8192) derived from
    count(*)), so the driver's hash check covers the policy itself —
    the form you'd run at scale, not a test-SF constant. Recall
    trade: subdividing blocks only loses CROSS-cell pairs — the
    standard SemDeDup cost/recall knob."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = policy_cell_assignment(emb)
    return dd.embedding_cosine_pairs(
        cells, "vec_id", "embedding", "cluster", _COS_THRESHOLD
    ).orderBy("a", "b")


# fixed-order double fold cosine (same shape as similarity_queries)
_SQL_DOT_ED = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
)


def _sql_cos_ed(a: str, b: str) -> str:
    dot = _SQL_DOT_ED.format(a=a, b=b)
    na = f"sqrt({_SQL_DOT_ED.format(a=a, b=a)})"
    nb = f"sqrt({_SQL_DOT_ED.format(a=b, b=b)})"
    return f"round({dot} / ({na} * {nb}), 6)"


# the oracle replays the POLICY too: k is derived from count(*) with
# the same max(sqrt(n), n/cap) arithmetic (sql_policy_cells), so the
# hash check pins k-derivation + seeding + assignment + the pair scan
ORACLE_EMBEDDING_COSINE = f"""
WITH {sql_policy_cells()}
SELECT l.vec_id AS a, r.vec_id AS b,
       {_sql_cos_ed('l.embedding', 'r.embedding')} AS cosine
FROM embeddings l
JOIN pc_cells la ON la.vec_id = l.vec_id
JOIN pc_cells ra ON ra.cluster = la.cluster
JOIN embeddings r ON r.vec_id = ra.vec_id AND l.vec_id < r.vec_id
WHERE {_sql_cos_ed('l.embedding', 'r.embedding')} >= {_COS_THRESHOLD}
ORDER BY a, b
"""


# --- SimHash (X2) -------------------------------------------------------------

_SIM_BITS = 48
_BAND_BITS = 12


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per document (md5-nibble bit votes)."""
    docs = _docs_by_id(spark, sf_dir)
    return dd.simhash_table(docs, "doc_id", "text", _SIM_BITS)


# per token: one md5, one hex->bigint parse; vote bit j = (h >> j) & 1
# (the same spec simhash_table computes via Spark conv()/shiftright)
_SIM_VOTES = ",\n         ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
    for j in range(_SIM_BITS)
)
_SIM_FINGERPRINT = " + ".join(
    f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIM_BITS)
)

ORACLE_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(t), 1, {_SIM_BITS // 4}) AS BIGINT) AS h
  FROM documents, unnest({_SQL_TOKENS}) AS u(t)
),
votes AS (
  SELECT doc_id,
         {_SIM_VOTES}
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
       CAST({_SIM_FINGERPRINT} AS BIGINT) AS simhash
FROM votes
"""


def simhash_near_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash band-collision candidates with exact Hamming distance."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_dedup_candidates(
        docs, "doc_id", "text", _SIM_BITS, _BAND_BITS
    ).orderBy("a", "b")


ORACLE_SIMHASH_CANDIDATES = f"""
WITH sh AS ({ORACLE_SIMHASH.strip()}),
bands AS (
  SELECT doc_id, simhash, b AS band_id,
         (simhash >> CAST(b * {_BAND_BITS} AS INT)) & {(1 << _BAND_BITS) - 1} AS band_val
  FROM sh, unnest(generate_series(0, {_SIM_BITS // _BAND_BITS - 1})) AS t(b)
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
FROM bands l JOIN bands r
  ON l.band_id = r.band_id AND l.band_val = r.band_val AND l.doc_id < r.doc_id
ORDER BY a, b
"""


# SimHash's quadratic-blowup guard (r12). Why the UNCAPPED form can
# never enter the sf1 scale gate on any budget: its OUTPUT is
# inherently ~quadratic on a correlated corpus — synthetic docs share
# vocabulary, fingerprint bits align, and single 12-bit band values
# concentrate whole percent of the corpus into one bucket (measured at
# sf0.1: 700k candidate pairs from 5,000 docs; sum-of-C(bucket,2)
# grows ~n² as every bucket grows with n). That is LSH economics, not
# a plan defect — the scalable deployment form drops non-discriminative
# hot buckets before the self-join, bounding pairs at buckets·C(cap,2)
# ≈ linear in the corpus. Cap 8 measured: 1,495 pairs at sf0.01 →
# 6,921 at sf0.1 (~x4.6 output on x10 docs) vs 702k uncapped.
# sf1 gate (r12): capped x1.16 on x10 data; the uncapped twin carries
# a calibrated x22 budget (measured x17.9 post-mutation-fixture —
# down from the r11 ~x100 identical-fingerprint cliques) purely so a
# REGRESSION on top of the inherent output quadratic still fails CI.
_SIM_BUCKET_CAP = 8


def simhash_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash band candidates with hot buckets dropped (bucket
    > _SIM_BUCKET_CAP docs) before the self-join — the scale-path
    twin of ``dedup_simhash_candidates``, same guard the MinHash
    family registers as ``dedup_minhash_capped``. Members of a
    dropped bucket still collide on their other (more discriminative)
    bands, the stop-shingle rationale."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_dedup_candidates(
        docs, "doc_id", "text", _SIM_BITS, _BAND_BITS,
        max_bucket_size=_SIM_BUCKET_CAP,
    ).orderBy("a", "b")


ORACLE_SIMHASH_CAPPED = f"""
WITH sh AS ({ORACLE_SIMHASH.strip()}),
bands AS (
  SELECT doc_id, simhash, b AS band_id,
         (simhash >> CAST(b * {_BAND_BITS} AS INT)) & {(1 << _BAND_BITS) - 1} AS band_val
  FROM sh, unnest(generate_series(0, {_SIM_BITS // _BAND_BITS - 1})) AS t(b)
),
capped AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band_id, band_val) AS bucket_n
    FROM bands
  ) WHERE bucket_n <= {_SIM_BUCKET_CAP}
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
FROM capped l JOIN capped r
  ON l.band_id = r.band_id AND l.band_val = r.band_val AND l.doc_id < r.doc_id
ORDER BY a, b
"""


# --- end-to-end curation v2: quality -> exact dedup -> cluster dedup ---------

_SQL_QUALITY = r"""
round(least(len(text) / 500.0, 1.0) * 0.4
      + least(len(list_filter(list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\s+'), x -> len(x) > 0),
                              t -> list_contains(['the','a','of','and','to','in','is','it'], t)))
              / greatest(len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)), 1) * 4, 1.0) * 0.4
      + (1.0 - least(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                     / greatest(len(text), 1) * 4, 1.0)) * 0.2, 6)
"""


def curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE curation pipeline an LLM-data team runs, as one
    declarative flow: quality-filter -> exact dedup (min-doc_id
    representative per md5) -> MinHash-LSH candidate pairs on the
    survivors -> connected-components cluster resolution -> keep only
    cluster representatives -> per-(lang, source) corpus stats. The
    oracle rebuilds every stage in SQL (recursive CTE for the
    closure), so the whole composition is hash-verified end to end.
    """
    from ..functions.text import quality_score_col
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    passed = docs.where(quality_score_col(F.col("text")) >= 0.5)
    w = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("doc_id")
    )
    survivors = passed.withColumn("_rn", w).where(F.col("_rn") == 1).drop("_rn")
    cands = dd.minhash_candidates(
        survivors, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    comp = connected_components(cands, "a", "b")
    dominated = comp.where(F.col("component") != F.col("node")).select(
        F.col("node").alias("_dom")
    )
    kept = survivors.join(
        dominated, survivors.doc_id == F.col("_dom"), "left_anti"
    )
    return (
        kept.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("lang", "source")
    )


ORACLE_CURATION_END_TO_END = f"""
WITH RECURSIVE q AS (
  SELECT * FROM documents WHERE {_SQL_QUALITY} >= 0.5
),
ex AS (
  SELECT doc_id, text, lang, source, n_chars FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM q
  ) WHERE rn = 1
),
{_sql_sig_ctes("ex")},
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_slice(s, b * {_ROWS_PER_BAND} + 1,
                                    b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}), '|') AS band_key
  FROM sig, unnest(generate_series(0, {_BANDS - 1})) AS t(b)
),
cands AS MATERIALIZED (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
edges AS MATERIALIZED (
  SELECT a AS u, b AS v FROM cands UNION SELECT b AS u, a AS v FROM cands
),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT reach.node, e.v AS r FROM reach JOIN edges e ON reach.r = e.u
),
comp AS (SELECT node, MIN(r) AS c FROM reach GROUP BY node),
kept AS (
  SELECT * FROM ex
  WHERE doc_id NOT IN (SELECT node FROM comp WHERE c <> node)
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
FROM kept GROUP BY lang, source ORDER BY lang, source
"""


# --- benchmark decontamination (cross-set n-gram overlap) --------------------


def decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination: flag corpus documents sharing any
    word 5-gram with a benchmark set (proxied here by doc_id < 10 —
    in production the eval suites). Distinct from near-dup detection:
    it's a CROSS-SET shingle semi-join, not a self-join. The benchmark
    shingle set is statically bounded (eval suites don't scale with
    the corpus), so it broadcasts legitimately; the corpus side
    streams through one hash join, no shuffle of the corpus text."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(dd.shingles_col(F.col("text"), 5)).alias("sh")
    )
    bench_sh = (
        sh.where(F.col("doc_id") < 10).select("sh").distinct()
    )
    corpus_sh = sh.where(F.col("doc_id") >= 10)
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )
    corpus = docs.where(F.col("doc_id") >= 10).select("doc_id")
    return (
        corpus.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlaps", F.lit(0)).alias("n_overlaps"),
            (F.coalesce("n_overlaps", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


ORACLE_DECONTAMINATE = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM documents
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlaps
  FROM sh JOIN bench USING (s)
  WHERE doc_id >= 10 GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(n_overlaps, 0) AS n_overlaps,
       coalesce(n_overlaps, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
WHERE d.doc_id >= 10
ORDER BY d.doc_id
"""


# --- intra-document repetition ratio (Gopher-style quality rule) -------------


def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of duplicated word 3-grams WITHIN each document — the
    repetition quality rule (heavily repeated boilerplate scores near
    1). Needs the raw (non-distinct) shingle list, so it's computed
    inline: one projection, no shuffle, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
    )
    staged = docs.select("doc_id", toks.alias("_t"))
    n = F.size("_t")
    idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    raw = F.transform(
        idx, lambda i: F.array_join(F.slice(F.col("_t"), i, 3), " ")
    )
    staged2 = staged.select("doc_id", raw.alias("_g"))
    return staged2.select(
        "doc_id",
        F.size("_g").cast("long").alias("n_grams"),
        F.size(F.array_distinct("_g")).cast("long").alias("n_distinct"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("_g")) / F.size("_g"), 6
        ).alias("repetition_ratio"),
    ).orderBy("doc_id")


ORACLE_REPETITION = rf"""
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len({_SQL_TOKENS}) - 2, 1)),
                        i -> array_to_string(list_slice({_SQL_TOKENS}, i, i + 2), ' ')) AS grams
  FROM documents
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       round(1.0 - len(list_distinct(grams)) / len(grams), 6) AS repetition_ratio
FROM g ORDER BY doc_id
"""


def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching for entity resolution: part-name pairs
    within the same brand at Levenshtein distance <= 3 — the
    edit-distance tier of the dedup family (token-set tiers:
    n-gram Jaccard; hash tiers: MinHash/SimHash).

    Same no-cross-product discipline as every near-dup operator: the
    equi-join blocking key bounds the candidate set, and the quadratic
    edit-distance work stays inside blocks (AQE splits skewed blocks).

    SECOND tier since r9 (VERDICT r8 next-round #6): the edit distance
    is a function of the NAME PAIR alone, and real catalogs repeat
    names heavily (64 distinct names across 20k parts at sf0.1; a
    naming scheme's vocabulary grows far slower than the catalog), so
    the DP now runs once per DISTINCT name pair instead of once per
    part pair — a distinct-names self-join blocked on a LOSSLESS
    length bucket (``len DIV 4``, left side exploded to home+neighbor
    buckets: distance <= 3 forces |len(a)-len(b)| <= 3 < 4, so every
    qualifying pair meets in exactly one r-side home bucket, none
    twice) with the exact |Δlen| <= 3 band and Spark's THRESHOLDED
    ``levenshtein(l, r, 3)`` — the banded O(k·n) DP that early-exits
    past the bound (returns -1). The brand-blocked part pairs then
    hash-probe the (distinct² within band, vocabulary-sized) distance
    table on the two names; a pair whose names sit beyond the bound
    finds no row and drops — identical semantics, so the
    plain-levenshtein DuckDB oracle still hash-matches. (History:
    25.3s unbounded DP -> 15.1s banded DP per pair (r8) -> 6.2s
    distinct-pair DP (r9, min-of-2) at sf0.1; at 100x the DP cost scales with
    the name vocabulary², the output join with the true pair count —
    which IS the deliverable of an entity-resolution pair query.)
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand"
    )
    names = part.select("p_name").distinct()
    bkt = F.floor(F.length("p_name") / 4)
    nl = names.select(
        F.col("p_name").alias("_n1"),
        F.explode(F.array(bkt - 1, bkt, bkt + 1)).alias("_lb"),
    )
    nr = names.select(F.col("p_name").alias("_n2"), bkt.alias("_lb"))
    ndist = (
        nl.join(nr, "_lb")
        .where(
            F.abs(F.length(F.col("_n1")) - F.length(F.col("_n2"))) <= 3
        )
        .select(
            "_n1",
            "_n2",
            F.levenshtein(F.col("_n1"), F.col("_n2"), 3).alias("_d"),
        )
        .where(F.col("_d") >= 0)
    )
    l, r = part.alias("l"), part.hint("shuffle_hash").alias("r")
    return (
        l.join(
            r,
            (F.col("l.p_brand") == F.col("r.p_brand"))
            & (F.col("l.p_partkey") < F.col("r.p_partkey")),
        )
        .join(
            ndist,
            (F.col("l.p_name") == F.col("_n1"))
            & (F.col("r.p_name") == F.col("_n2")),
        )
        .select(
            F.col("l.p_brand").alias("brand"),
            F.col("l.p_partkey").alias("a"),
            F.col("r.p_partkey").alias("b"),
            F.col("_d").cast("long").alias("distance"),
        )
        .orderBy("brand", "a", "b")
    )


ORACLE_FUZZY_PARTS = """
SELECT l.p_brand AS brand,
       l.p_partkey AS a,
       r.p_partkey AS b,
       CAST(levenshtein(l.p_name, r.p_name) AS BIGINT) AS distance
FROM part l JOIN part r
  ON l.p_brand = r.p_brand AND l.p_partkey < r.p_partkey
WHERE levenshtein(l.p_name, r.p_name) <= 3
ORDER BY brand, a, b
"""


# --- repeated-paragraph (boilerplate) detection -------------------------------

_PARA_TOKENS = 16


def repeated_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection — the paragraph-level counterpart of doc
    dedup (the C4/CCNet "remove lines repeated across documents" step):
    hash every non-overlapping 16-token window, keep windows that occur
    in >= 2 distinct docs. Explode + hash-aggregate: one scan, one
    shuffle on the window hash, never ships window text twice (only the
    md5 leaves the map side). At 100 TB the groupBy key is a uniform
    128-bit hash — no skew by construction."""
    docs = load_table(spark, sf_dir, "documents")
    # raw token sequence (NOT shingles_col — that distincts, which
    # would reorder/remove tokens and change the windows)
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
    )
    staged = docs.select("doc_id", toks.alias("_t"))
    n_full = F.floor(F.size("_t") / _PARA_TOKENS).cast("int")
    exploded = staged.where(F.size("_t") >= _PARA_TOKENS).select(
        "doc_id",
        "_t",
        F.explode(F.sequence(F.lit(0), n_full - 1)).alias("_i"),
    )
    para = F.array_join(
        F.slice(F.col("_t"), F.col("_i") * _PARA_TOKENS + 1, _PARA_TOKENS), " "
    )
    return (
        exploded.select("doc_id", F.md5(para).alias("para_hash"))
        .groupBy("para_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy("para_hash")
    )


ORACLE_REPEATED_PARAGRAPHS = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
  WHERE len({_SQL_TOKENS}) >= {_PARA_TOKENS}
),
paras AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, i * {_PARA_TOKENS} + 1,
                                        i * {_PARA_TOKENS} + {_PARA_TOKENS}), ' ')) AS para_hash
  FROM toks,
       unnest(generate_series(0, CAST(floor(len(t) / {_PARA_TOKENS}) AS BIGINT) - 1)) AS u(i)
)
SELECT para_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
FROM paras
GROUP BY para_hash
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY para_hash
"""


# --- hot-bucket-capped LSH candidates ----------------------------------------

_BUCKET_CAP = 4


def minhash_candidates_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates with the quadratic-blowup guard: band buckets
    holding more than _BUCKET_CAP docs are dropped before the self-join
    (non-discriminative keys — the stop-shingle rationale; members
    still collide on their other bands). See minhash_candidates'
    max_bucket_size note for why AQE alone cannot bound this."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_candidates(
        docs,
        "doc_id",
        "text",
        _NUM_HASHES,
        _BANDS,
        _SHINGLE_K,
        max_bucket_size=_BUCKET_CAP,
    ).orderBy("a", "b")


ORACLE_MINHASH_CAPPED = f"""
WITH {_sql_sig_ctes()},
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_slice(s, b * {_ROWS_PER_BAND} + 1,
                                    b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}), '|') AS band_key
  FROM sig, unnest(generate_series(0, {_BANDS - 1})) AS t(b)
),
capped AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
    FROM bands
  ) WHERE bucket_n <= {_BUCKET_CAP}
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM capped l JOIN capped r
  ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
ORDER BY a, b
"""


# --- containment-verified near-dups (X2, asymmetric) -------------------------

# Broder's containment coefficient |A∩B|/|A|: catches excerpts/quotes/
# wrapped copies whose Jaccard is tiny because the union is dominated
# by the longer document — the case minhash_verified structurally
# misses. Candidates still come from the SAME LSH band join (no new
# shuffle shape); only the per-pair verification metric changes.
_CONTAIN_THRESHOLD = 0.6


def minhash_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified by exact shingle CONTAINMENT in both
    directions; a pair survives if either side is >= 60% contained in
    the other. Same 100 TB shape as minhash_verified_near_dups: the
    quadratic array work runs on |candidates| rows only."""
    docs = load_table(spark, sf_dir, "documents")
    cands = dd.minhash_candidates(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    sh_a = docs.select(
        F.col("doc_id").alias("a"),
        dd.shingles_col(F.col("text"), _SHINGLE_K).alias("_sa"),
    )
    sh_b = docs.select(
        F.col("doc_id").alias("b"),
        dd.shingles_col(F.col("text"), _SHINGLE_K).alias("_sb"),
    )
    return (
        cands.join(sh_a, "a")
        .join(sh_b, "b")
        .select(
            "a",
            "b",
            F.round(
                dd.containment_col(F.col("_sa"), F.col("_sb")), 6
            ).alias("containment_a_in_b"),
            F.round(
                dd.containment_col(F.col("_sb"), F.col("_sa")), 6
            ).alias("containment_b_in_a"),
        )
        .where(
            (F.col("containment_a_in_b") >= _CONTAIN_THRESHOLD)
            | (F.col("containment_b_in_a") >= _CONTAIN_THRESHOLD)
        )
        .orderBy("a", "b")
    )


ORACLE_MINHASH_CONTAINMENT = f"""
WITH {_sql_sig_ctes()},
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_slice(s, b * {_ROWS_PER_BAND} + 1,
                                    b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}), '|') AS band_key
  FROM sig, unnest(generate_series(0, {_BANDS - 1})) AS t(b)
),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, {_SQL_SHINGLES} AS s FROM documents)
SELECT a, b,
       round(len(list_intersect(sa.s, sb.s)) / greatest(len(sa.s), 1), 6)
         AS containment_a_in_b,
       round(len(list_intersect(sa.s, sb.s)) / greatest(len(sb.s), 1), 6)
         AS containment_b_in_a
FROM cands
JOIN sh sa ON sa.doc_id = a
JOIN sh sb ON sb.doc_id = b
WHERE round(len(list_intersect(sa.s, sb.s)) / greatest(len(sa.s), 1), 6)
        >= {_CONTAIN_THRESHOLD}
   OR round(len(list_intersect(sa.s, sb.s)) / greatest(len(sb.s), 1), 6)
        >= {_CONTAIN_THRESHOLD}
ORDER BY a, b
"""


# --- shingle novelty (corpus-growth analytics) -------------------------------


def doc_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of its distinct shingles NOT
    seen in any lower-doc_id document (doc_id as ingest order). The
    corpus-growth diagnostic behind "is new data adding information or
    repeating the crawl": novelty ~0 rows are candidates to drop even
    when no single pair-dup fires.

    100 TB shape: one shuffle on shingle (min-doc_id aggregate, map-
    side partial), one shuffle back on doc_id. No pairwise work at all
    — linear in total shingle count, the cheapest member of the dedup
    family."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(dd.shingles_col(F.col("text"), _SHINGLE_K)).alias("shingle"),
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("_first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("_first_doc") < F.col("doc_id"), 1).otherwise(0)
            ).alias("_n_seen"),
        )
        .select(
            "doc_id",
            "n_shingles",
            F.round(
                F.lit(1) - F.col("_n_seen") / F.col("n_shingles"), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


ORACLE_SHINGLE_NOVELTY = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM documents
),
first AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       round(1 - SUM(CASE WHEN first.first_doc < sh.doc_id THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS novelty
FROM sh JOIN first ON sh.s = first.s
GROUP BY sh.doc_id
ORDER BY doc_id
"""


# --- cross-source shingle overlap matrix -------------------------------------


def source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level diagnostics: shingle-set Jaccard between every
    pair of sources. Tells a curation pipeline which feeds are
    near-copies of each other (mirror sites, re-crawls) BEFORE paying
    for doc-level dedup between them.

    100 TB shape: distinct (source, shingle) first (kills within-
    source repetition early), then a shingle equi-join — pairs shuffle
    on the shingle hash; output is |sources|^2-bounded (tiny). The
    per-source totals are a bounded-dimension aggregate, broadcast
    back (same policy as operators/skew.py)."""
    docs = load_table(spark, sf_dir, "documents")
    ss = docs.select(
        "source",
        F.explode(dd.shingles_col(F.col("text"), _SHINGLE_K)).alias("shingle"),
    ).distinct()
    sizes = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    l, r = ss.alias("l"), ss.hint("shuffle_hash").alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.source") < F.col("r.source")),
        )
        .groupBy(
            F.col("l.source").alias("source_a"),
            F.col("r.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


ORACLE_SOURCE_OVERLAP = f"""
WITH ss AS (
  SELECT DISTINCT source, unnest({_SQL_SHINGLES}) AS s FROM documents
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ss GROUP BY source),
inter AS (
  SELECT l.source AS source_a, r.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM ss l JOIN ss r ON l.s = r.s AND l.source < r.source
  GROUP BY l.source, r.source
)
SELECT inter.source_a, inter.source_b, sa.n AS n_a, sb.n AS n_b,
       inter.n_common,
       round(inter.n_common / (sa.n + sb.n - inter.n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = inter.source_a
JOIN sizes sb ON sb.source = inter.source_b
ORDER BY source_a, source_b
"""


# --- Bloom-filter decontamination (the no-broadcast scale path) --------------

_BLOOM_M = 16384  # bits
_BLOOM_K = 3  # hash functions


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination via an engine-portable Bloom filter, the scale
    path for when the benchmark shingle set is too large to broadcast
    as exact strings (many eval suites x many n-gram sizes): project
    each benchmark shingle to _BLOOM_K bit positions of an _BLOOM_M-bit
    filter with the same affine md5 family as MinHash
    (pos_j = (h1 + j*h2) mod m), keep only the DISTINCT occupied
    positions (<= m rows of one int — kilobytes, broadcastable no
    matter how many shingles produced them), and probe by equi-joining
    corpus shingle positions against that table: a shingle "might be
    contaminated" iff all k of its positions are occupied.

    Deliberately NOT DataFrame.stat.bloomFilter: that materializes a
    JVM-side sketch usable only on the driver, so membership tests
    would need a per-row py4j/UDF round-trip. Representing the filter
    as a position TABLE keeps probing a broadcast hash join inside
    whole-stage codegen — and makes the algebra bit-identical in
    DuckDB, so false positives themselves are oracle-checked.

    Output compares the bloom verdict against the exact semi-join per
    doc, so the false-positive rows are visible (m/k here are sized so
    sf-scale data actually produces some).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(dd.shingles_col(F.col("text"), 5)).alias("sh")
    )
    hashed = sh.selectExpr(
        "doc_id",
        "sh",
        "CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT) AS h1",
        "CAST(conv(substring(md5(sh), 17, 12), 16, 10) AS BIGINT) AS h2",
    )
    pos = hashed.select(
        "doc_id",
        "sh",
        "h1",
        "h2",
        F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("j"),
    ).selectExpr(
        "doc_id",
        "sh",
        f"pmod(h1 + j * h2, {_BLOOM_M}) AS pos",
    )
    occupied = (
        pos.where(F.col("doc_id") < 10).select("pos").distinct()
    )
    corpus_pos = pos.where(F.col("doc_id") >= 10)
    bloom_hits = (
        corpus_pos.join(F.broadcast(occupied), "pos")
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("_matched"))
        .where(F.col("_matched") == _BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
    )
    bench_sh = sh.where(F.col("doc_id") < 10).select("sh").distinct()
    exact_hits = (
        sh.where(F.col("doc_id") >= 10)
        .join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n_exact"))
    )
    corpus = docs.where(F.col("doc_id") >= 10).select("doc_id")
    return (
        corpus.join(bloom_hits, "doc_id", "left")
        .join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0)) > 0).alias(
                "bloom_contaminated"
            ),
            (F.coalesce("_n_exact", F.lit(0)) > 0).alias("exact_contaminated"),
            (
                (F.coalesce("n_bloom_hits", F.lit(0)) > 0)
                & (F.coalesce("_n_exact", F.lit(0)) == 0)
            ).alias("false_positive"),
        )
        .orderBy("doc_id")
    )


ORACLE_DECONTAMINATE_BLOOM = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SQL_SHINGLES}) AS sh FROM documents
),
hashed AS (
  SELECT doc_id, sh,
         CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h1,
         CAST('0x' || substr(md5(sh), 17, 12) AS BIGINT) AS h2
  FROM sh
),
pos AS (
  SELECT doc_id, sh, (h1 + j * h2) % {_BLOOM_M} AS pos
  FROM hashed, unnest(generate_series(0, {_BLOOM_K - 1})) AS t(j)
),
occupied AS (SELECT DISTINCT pos FROM pos WHERE doc_id < 10),
bloom_hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom_hits FROM (
    SELECT doc_id, sh
    FROM pos JOIN occupied USING (pos)
    WHERE doc_id >= 10
    GROUP BY doc_id, sh
    HAVING COUNT(*) = {_BLOOM_K}
  ) GROUP BY doc_id
),
bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 10),
exact_hits AS (
  SELECT doc_id, COUNT(*) AS n_exact
  FROM sh JOIN bench USING (sh)
  WHERE doc_id >= 10 GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(n_bloom_hits, 0) AS n_bloom_hits,
       coalesce(n_bloom_hits, 0) > 0 AS bloom_contaminated,
       coalesce(n_exact, 0) > 0 AS exact_contaminated,
       coalesce(n_bloom_hits, 0) > 0 AND coalesce(n_exact, 0) = 0
         AS false_positive
FROM documents d
LEFT JOIN bloom_hits ON d.doc_id = bloom_hits.doc_id
LEFT JOIN exact_hits ON d.doc_id = exact_hits.doc_id
WHERE d.doc_id >= 10
ORDER BY d.doc_id
"""


# --- boilerplate REMOVAL (the rewrite counterpart of detection) --------------


def boilerplate_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4/CCNet cleanup step itself, not just the detector: drop
    every 16-token window that occurs in >= 2 distinct documents
    (repeated_paragraphs' boilerplate set) and re-emit the cleaned
    document. Text is normalized to lowercase single-space tokens (the
    same canonical form the window hashes are computed over), the
    sub-window tail is always kept, and docs shorter than one window
    pass through whole.

    Scale shape: windows explode once, the boilerplate set comes from
    the same hash-aggregate as repeated_paragraphs (uniform 128-bit
    key, no skew), survivors anti-join on the hash, and reassembly is
    one groupBy(doc_id) whose collect_list is bounded by the document
    itself (you cannot rewrite a doc in less than the doc). Emitting
    md5(cleaned) rather than the body keeps the result table narrow;
    production would write the body to the curated sink instead.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
    )
    staged = docs.select("doc_id", toks.alias("_t")).select(
        "doc_id",
        "_t",
        F.floor(F.size("_t") / _PARA_TOKENS).cast("int").alias("_n_full"),
    )
    exploded = staged.where(F.col("_n_full") >= 1).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("_n_full") - 1)).alias("_i"),
        F.array_join(
            F.slice(
                F.col("_t"),
                F.col("_i") * _PARA_TOKENS + 1,
                _PARA_TOKENS,
            ),
            " ",
        ).alias("_para"),
    )
    # (re-slicing inside explode keeps _t out of the exploded rows)
    windows = exploded.select(
        "doc_id", "_i", "_para", F.md5("_para").alias("_ph")
    )
    boiler = (
        windows.groupBy("_ph")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("_ph")
    )
    kept = (
        windows.join(boiler, "_ph", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_i", "_para"))
                    ),
                    lambda s: s["_para"],
                ),
                " ",
            ).alias("_body"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    tail = F.array_join(
        F.slice(
            F.col("_t"),
            F.col("_n_full") * _PARA_TOKENS + 1,
            F.size("_t") - F.col("_n_full") * _PARA_TOKENS,
        ),
        " ",
    )
    cleaned_body = F.concat_ws(
        " ",
        F.when(F.length("_body") > 0, F.col("_body")),
        F.when(F.length(tail) > 0, tail),
    )
    return (
        staged.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_n_full").cast("long").alias("n_windows"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept_windows"),
            (F.col("_n_full") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_dropped_windows"
            ),
            F.md5(cleaned_body).alias("cleaned_hash"),
            (
                F.coalesce("n_kept", F.lit(0)) * _PARA_TOKENS
                + (F.size("_t") - F.col("_n_full") * _PARA_TOKENS)
            ).cast("long").alias("n_cleaned_tokens"),
        )
        .orderBy("doc_id")
    )


ORACLE_BOILERPLATE_REMOVED = f"""
WITH staged AS (
  SELECT doc_id, {_SQL_TOKENS} AS t,
         CAST(floor(len({_SQL_TOKENS}) / {_PARA_TOKENS}) AS INT) AS n_full
  FROM documents
),
windows AS (
  SELECT doc_id, i,
         array_to_string(list_slice(t, i * {_PARA_TOKENS} + 1,
                                    i * {_PARA_TOKENS} + {_PARA_TOKENS}),
                         ' ') AS para
  FROM staged, unnest(generate_series(0, CAST(n_full AS BIGINT) - 1)) AS u(i)
  WHERE n_full >= 1
),
hashed AS (SELECT doc_id, i, para, md5(para) AS ph FROM windows),
boiler AS (
  SELECT ph FROM hashed GROUP BY ph HAVING COUNT(DISTINCT doc_id) >= 2
),
kept AS (
  SELECT doc_id,
         string_agg(para, ' ' ORDER BY i) AS body,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM hashed WHERE ph NOT IN (SELECT ph FROM boiler)
  GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n_full AS BIGINT) AS n_windows,
       coalesce(n_kept, 0) AS n_kept_windows,
       CAST(s.n_full AS BIGINT) - coalesce(n_kept, 0) AS n_dropped_windows,
       md5(concat_ws(' ',
           CASE WHEN len(coalesce(body, '')) > 0 THEN body END,
           CASE WHEN len(s.t) > s.n_full * {_PARA_TOKENS}
                THEN array_to_string(list_slice(s.t,
                       s.n_full * {_PARA_TOKENS} + 1, len(s.t)), ' ')
           END)) AS cleaned_hash,
       coalesce(n_kept, 0) * {_PARA_TOKENS}
         + (len(s.t) - s.n_full * {_PARA_TOKENS}) AS n_cleaned_tokens
FROM staged s LEFT JOIN kept ON s.doc_id = kept.doc_id
ORDER BY s.doc_id
"""


# --- triangle census of the near-dup graph -----------------------------------


def dedup_candidate_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census over the MinHash-LSH candidate graph: per doc,
    its candidate degree and the number of triangles it sits in. A
    candidate PAIR can be banding noise; a TRIANGLE (three mutual
    collisions) almost never is — triangle participation is the cheap
    cluster-coherence signal that separates true duplicate groups from
    stray collisions before running full connected components.

    Scale shape: the near-dup graph is sparse BY CONSTRUCTION (band
    collisions, hot buckets droppable via the capped variant) — this
    is what makes triangle enumeration tractable; a dense projection
    graph (e.g. supplier co-purchase, which is complete at every SF
    here) would be cubic. Edges are degree-oriented (lo < hi comes
    free from the candidate convention), the two-path join is bounded
    by sum(deg^2), and the closing edge is an equi-join on the pair.
    Pure integer key algebra — exact oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    edges = dd.minhash_candidates(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )  # (a, b) with a < b, distinct
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    triangles = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("s1"),
            F.col("e1.b").alias("s2"),
            F.col("e2.b").alias("s3"),
        )
    )
    per_node = (
        triangles.select(F.explode(F.array("s1", "s2", "s3")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("a").alias("doc_id"))
        .unionByName(edges.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(per_node, "doc_id", "left")
        .select(
            "doc_id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
        .orderBy("doc_id")
    )


ORACLE_DEDUP_TRIANGLES = f"""
WITH {_sql_sig_ctes()},
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_slice(s, b * {_ROWS_PER_BAND} + 1,
                                    b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}), '|') AS band_key
  FROM sig, unnest(generate_series(0, {_BANDS - 1})) AS t(b)
),
edges AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
),
tri AS (
  SELECT e1.a AS s1, e1.b AS s2, e2.b AS s3
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_node AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT s1 AS doc_id FROM tri
    UNION ALL SELECT s2 FROM tri
    UNION ALL SELECT s3 FROM tri
  ) GROUP BY doc_id
),
deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT a AS doc_id FROM edges UNION ALL SELECT b FROM edges
  ) GROUP BY doc_id
)
SELECT d.doc_id, d.degree,
       coalesce(p.n_triangles, 0) AS n_triangles
FROM deg d LEFT JOIN per_node p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-PRIORITIZED cluster dedup: resolve MinHash-LSH
    candidate pairs to near-dup clusters (connected components) and
    keep each cluster's HIGHEST-QUALITY member (ties break to the
    smallest doc_id) instead of the arbitrary min-id representative —
    "keep the best copy, not the first copy", which is what a real
    curation run wants when mirrors and excerpts differ in quality.
    One max_by per cluster + a broadcast-sized join of the winners
    back to members; everything upstream reuses the standard
    candidate/closure machinery."""
    from ..functions.text import quality_score_col
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    cands = dd.minhash_candidates(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    comp = connected_components(cands, "a", "b").withColumnRenamed(
        "node", "doc_id"
    )
    clustered = (
        docs.select(
            "doc_id", quality_score_col(F.col("text")).alias("quality")
        )
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
            "quality",
        )
    )
    best = clustered.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("quality"), (-F.col("doc_id")).alias("nd"))
        ).alias("best_id")
    )
    return (
        clustered.join(best, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "quality",
            (F.col("doc_id") == F.col("best_id")).alias("keep"),
        )
        .orderBy("doc_id")
    )


def oracle_keep_best_quality(candidates_sql_body: str) -> str:
    return f"""
WITH RECURSIVE cands AS MATERIALIZED ({candidates_sql_body}),
edges AS MATERIALIZED (
  SELECT a AS u, b AS v FROM cands
  UNION SELECT b AS u, a AS v FROM cands
),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT reach.node, e.v AS r FROM reach JOIN edges e ON reach.r = e.u
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
clustered AS (
  SELECT d.doc_id,
         CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS cluster_id,
         {_SQL_QUALITY} AS quality
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
),
best AS (
  SELECT cluster_id, doc_id AS best_id FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY quality DESC, doc_id ASC) AS rn
    FROM clustered
  ) WHERE rn = 1
)
SELECT cl.doc_id, cl.cluster_id, cl.quality,
       (cl.doc_id = b.best_id) AS keep
FROM clustered cl JOIN best b USING (cluster_id)
ORDER BY cl.doc_id
"""


def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The storage-savings ledger exact dedup produces: per source,
    total documents/bytes vs the bytes that survive keeping ONE copy
    per md5(text), and the redundant remainder — the number a 100 TB
    curation run reports to justify itself. One hash aggregate on the
    content key, one on source; all exact integers with an unrounded
    savings ratio."""
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy(F.md5("text").alias("h"), "source").agg(
        F.count(F.lit(1)).alias("copies"),
        F.sum("n_chars").alias("bytes_all"),
        F.min("n_chars").alias("bytes_one"),
    )
    return (
        groups.groupBy("source")
        .agg(
            F.sum("copies").alias("n_docs"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum("bytes_all").alias("total_bytes"),
            F.sum("bytes_one").alias("kept_bytes"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            "total_bytes",
            "kept_bytes",
            (F.col("total_bytes") - F.col("kept_bytes")).alias(
                "redundant_bytes"
            ),
            (
                (F.col("total_bytes") - F.col("kept_bytes"))
                / F.col("total_bytes")
            ).alias("savings_ratio"),
        )
        .orderBy("source")
    )


ORACLE_DEDUP_SAVINGS = """
WITH groups AS (
  SELECT md5(text) AS h, source,
         CAST(COUNT(*) AS BIGINT) AS copies,
         CAST(SUM(n_chars) AS BIGINT) AS bytes_all,
         CAST(MIN(n_chars) AS BIGINT) AS bytes_one
  FROM documents GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(copies) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(bytes_all) AS BIGINT) AS total_bytes,
       CAST(SUM(bytes_one) AS BIGINT) AS kept_bytes,
       CAST(SUM(bytes_all) - SUM(bytes_one) AS BIGINT) AS redundant_bytes,
       (SUM(bytes_all) - SUM(bytes_one))
         / CAST(SUM(bytes_all) AS DOUBLE) AS savings_ratio
FROM groups GROUP BY source ORDER BY source
"""


def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape of the near-dup problem: how many clusters exist at each
    size (singletons included) — the first chart a dedup audit draws
    (a heavy tail means boilerplate mills; all-singletons means the
    thresholds are too tight). Component sizes from the LSH closure,
    then two tiny aggregates."""
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    cands = dd.minhash_candidates(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    comp = connected_components(cands, "a", "b").withColumnRenamed(
        "node", "doc_id"
    )
    clusters = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(F.coalesce("component", "doc_id").alias("cluster_id"))
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("size"))
    )
    return (
        clusters.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("size")
    )


def oracle_cluster_size_histogram(candidates_sql_body: str) -> str:
    return f"""
WITH RECURSIVE cands AS MATERIALIZED ({candidates_sql_body}),
edges AS MATERIALIZED (
  SELECT a AS u, b AS v FROM cands
  UNION SELECT b AS u, a AS v FROM cands
),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT reach.node, e.v AS r FROM reach JOIN edges e ON reach.r = e.u
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
clusters AS (
  SELECT CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS cluster_id,
         CAST(COUNT(*) AS BIGINT) AS size
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
  GROUP BY 1
)
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM clusters GROUP BY size ORDER BY size
"""


# --- winnowed fingerprints (MOSS-style k-gram window minima) -----------------

# word k-grams hashed, then the minimum hash in every sliding window of
# w consecutive grams becomes a fingerprint: winnowing's guarantee is
# that any shared run of >= w + k - 1 tokens between two documents
# shares at least one selected fingerprint — a DETERMINISTIC detection
# bound MinHash (probabilistic) and full-shingle indexing (k^-1 of the
# volume) don't give. Schleimer/Wilkerson/Aiken, SIGMOD'03 (public).
_WIN_K = 3
_WIN_W = 4
# quadratic-blowup guard, same discipline as minhash/simhash bucket
# caps: fingerprints shared by more than this many docs (boilerplate
# phrases) are dropped before the self-join
_WIN_MAX_BUCKET = 50


def dedup_winnowed_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates via winnowed fingerprints: docs sharing any
    selected fingerprint pair up, scored by how many they share.

    Scale shape: selection is pure Column algebra per document (ordered
    k-gram hashes -> window minima -> distinct), ~1/w of the shingle
    volume enters the index; candidates come from ONE groupBy-free
    equi-self-join on the fingerprint key with the over-common
    fingerprints capped first — no cross product (plan-pinned with the
    other near-dup families)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
    )
    n = F.size(toks)
    g_idx = F.sequence(F.lit(1), F.greatest(n - (_WIN_K - 1), F.lit(1)))
    grams = F.transform(
        g_idx, lambda i: F.array_join(F.slice(toks, i, _WIN_K), " ")
    )
    hs = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g.cast("binary")), 1, 15), 16, 10).cast(
            "long"
        ),
    )
    # sliding-window minima via the doubling trick (two zip_with
    # passes: pairwise minima, then minima of pairs two apart) instead
    # of one slice+array_min per position — higher-order lambdas are
    # interpreted per element, and this drops the per-doc work from
    # O(n*w) slice allocations to O(n log w) least() calls (measured
    # 25.7s -> much less at sf0.1). zip_with pads the shorter side
    # with null and least() ignores nulls, so tail positions hold
    # partial-window minima, truncated before the distinct exactly
    # like the oracle's clamped list_slice windows.
    m = F.size(hs)
    m1 = F.zip_with(
        hs,
        F.slice(hs, 2, F.greatest(m - 1, F.lit(1))),
        lambda x, y: F.least(x, y),
    )
    m2 = F.zip_with(
        m1,
        F.slice(m1, 3, F.greatest(m - 2, F.lit(1))),
        lambda x, y: F.least(x, y),
    )
    fps = F.array_distinct(
        F.slice(m2, 1, F.greatest(m - (_WIN_W - 1), F.lit(1)))
    )
    fp = docs.select(F.col("doc_id"), F.explode(fps).alias("fp"))
    sizes = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
    fp = (
        fp.join(sizes, "fp")
        .where(F.col("_n") <= _WIN_MAX_BUCKET)
        .drop("_n")
        .localCheckpoint(eager=False)
    )
    l, r = fp.alias("l"), fp.hint("shuffle_hash").alias("r")
    return (
        l.join(
            r,
            (F.col("l.fp") == F.col("r.fp"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy("a", "b")
    )


_SQL_WINNOW_FPS = (
    f"list_distinct(list_transform("
    f" generate_series(1, greatest(len(hs) - {_WIN_W - 1}, 1)),"
    f" i -> list_aggregate(list_slice(hs, i, i + {_WIN_W - 1}), 'min')))"
)

ORACLE_WINNOWED = f"""
WITH hashed AS (
  SELECT doc_id,
         list_transform(
           list_transform(
             generate_series(1, greatest(len({_SQL_TOKENS}) - {_WIN_K - 1}, 1)),
             i -> array_to_string(list_slice({_SQL_TOKENS}, i,
                                             i + {_WIN_K - 1}), ' ')),
           g -> ('0x' || substr(md5(g), 1, 15))::BIGINT) AS hs
  FROM documents
), fp0 AS (
  SELECT doc_id, unnest({_SQL_WINNOW_FPS}) AS fp FROM hashed
), fp AS (
  SELECT doc_id, fp FROM fp0
  WHERE fp IN (SELECT fp FROM fp0 GROUP BY fp
               HAVING COUNT(*) <= {_WIN_MAX_BUCKET})
)
SELECT l.doc_id AS a, r.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fp l JOIN fp r ON l.fp = r.fp AND l.doc_id < r.doc_id
GROUP BY a, b
ORDER BY a, b
"""
