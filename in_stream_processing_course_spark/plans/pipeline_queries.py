"""Training-data pipeline operators beyond the per-table families:
temporal as-of join, near-dup cluster resolution (connected
components), deterministic stratified sampling, and TF-IDF term
scoring. The reference has none of these (SURVEY §2.7 — no joins at
all); they are north-star design work, written shuffle-aware.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators.asof import asof_join_backward
from ..operators.clustering import policy_cell_assignment, sql_policy_cells
from ..operators.graph import connected_components
from ..operators.projections import ensure_timestamp
from ..sources.batch import load_table
from ..functions import text as tx

# --- as-of join: each click joined to the user's most recent view -----------


def asof_click_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the same user's latest view at-or-before the
    click (null when none) — the feature-attachment join ("state as of
    event time") every event pipeline needs. One shuffle + one sort
    via the union-tag-window encoding (operators/asof.py); the oracle
    uses an independent row_number-over-range-join formulation, so the
    hash check proves the scalable rewrite equivalent."""
    ev = ensure_timestamp(load_table(spark, sf_dir, "events"), "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    joined = asof_join_backward(
        clicks,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_vals=("view_event_id", "view_ts"),
        order_col="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("click_us"),
        "view_event_id",
        F.unix_micros("view_ts").alias("view_us"),
        (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("wait_us"),
    )


ORACLE_ASOF = """
WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
vs AS (SELECT * FROM events WHERE event_type = 'view'),
best AS (
  SELECT event_id, vid, vts FROM (
    SELECT c.event_id, v.event_id AS vid, v.ts AS vts,
           row_number() OVER (PARTITION BY c.event_id
                              ORDER BY v.ts DESC, v.event_id DESC) AS rn
    FROM clicks c JOIN vs v ON v.user_id = c.user_id AND v.ts <= c.ts
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id,
       epoch_us(c.ts) AS click_us,
       b.vid AS view_event_id,
       epoch_us(b.vts) AS view_us,
       epoch_us(c.ts) - epoch_us(b.vts) AS wait_us
FROM clicks c LEFT JOIN best b ON b.event_id = c.event_id
"""


# --- near-dup cluster resolution (connected components over candidates) -----

_NUM_HASHES = 16
_BANDS = 4
_SHINGLE_K = 5


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs -> transitive dup CLUSTERS via
    min-label-propagation connected components (operators/graph.py):
    cluster id = min doc_id in the component, i.e. the row to keep.
    The step that turns pair tables into an actual dedup decision. The
    oracle computes the same closure with a recursive CTE — a
    completely different algorithm, same fixpoint."""
    docs = load_table(spark, sf_dir, "documents")
    cands = dd.minhash_candidates(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    comp = connected_components(cands, "a", "b")
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


# reuse the exact minhash-candidate SQL from dedup_queries (imported at
# registration time to avoid a copy drifting out of sync)


def oracle_dedup_clusters(candidates_sql_body: str) -> str:
    """Wrap the shared candidate-pair CTE body in a recursive closure."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so the
    # recursive term would recompute the full MinHash candidate
    # pipeline on EVERY closure iteration (measured 42s -> 13s at
    # sf0.01 from materializing cands/edges once)
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
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


# --- deterministic stratified sampling --------------------------------------

# per-stratum keep rates as md5-prefix thresholds (out of 0x10000):
# the sampling decision is a pure function of (event_id), so the sample
# is reproducible on any engine/cluster/partitioning — no RNG state, no
# seed plumbing, and it pushes down as an ordinary filter.
_STRATA_THRESHOLDS = {
    "click": "4000",  # 25%
    "view": "1000",  # ~6.25%
    "purchase": "8000",  # 50%
    "signup": "2000",  # 12.5%
    "error": "1000",  # ~6.25%
}


def sample_events_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type deterministic sample: keep a row iff the first 4
    hex chars of md5(event_id) fall under the stratum's threshold.
    Rebalances a skewed event mix into a training blend; md5-hash
    gating is the idiomatic content-addressed sampler at 100 TB
    (reproducible, mergeable across runs, no sampleBy seed drift)."""
    ev = load_table(spark, sf_dir, "events")
    prefix = F.substring(
        F.md5(F.col("event_id").cast("string").cast("binary")), 1, 4
    )
    # literal map lookup; an unknown event_type yields null -> dropped,
    # same as the oracle's ELSE-less CASE
    mapping = F.create_map(
        *[F.lit(x) for kv in _STRATA_THRESHOLDS.items() for x in kv]
    )
    threshold = mapping[F.col("event_type")]
    return (
        ev.withColumn("_prefix", prefix)
        .where(F.col("_prefix") < threshold)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("_prefix").alias("hash_prefix"),
        )
        .orderBy("event_id")
    )


_SQL_THRESHOLD_CASE = "CASE " + " ".join(
    f"WHEN event_type = '{etype}' THEN '{thr}'"
    for etype, thr in _STRATA_THRESHOLDS.items()
) + " END"

ORACLE_SAMPLE_STRATIFIED = f"""
SELECT event_id, user_id, event_type,
       substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS hash_prefix
FROM events
WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 4) < {_SQL_THRESHOLD_CASE}
ORDER BY event_id
"""


# --- TF-IDF (linear-idf variant) ---------------------------------------------

_TF_MIN = 3


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salient terms per document: tf * (N / df) for terms with tf >=
    3. Linear inverse document frequency instead of log(N/df): exact
    integer tf*N divided by integer df is one correctly-rounded IEEE
    division, bit-identical across engines, whereas ln() may differ by
    an ulp between libm implementations (JVM vs DuckDB) and flip a
    rounding. Two shuffles: (doc,term) partial-agg then term; N joins
    in as a broadcast scalar."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tx.tokens_col(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    return (
        tf.where(F.col("tf") >= _TF_MIN)
        .join(df_, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                (F.col("tf") * F.col("_n")).cast("double") / F.col("df"), 6
            ).alias("tfidf"),
        )
        .orderBy("doc_id", "term")
    )


# --- document chunking (context-window splitting with overlap) ---------------

_CHUNK_TOKENS = 64
_CHUNK_OVERLAP = 16
_CHUNK_STRIDE = _CHUNK_TOKENS - _CHUNK_OVERLAP


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping 64-token chunks (stride
    48) — the pretraining-corpus windowing step. Pure generate-explode-
    slice column algebra: tokenize once (projected alias, so Catalyst
    keeps one copy), derive the chunk count, explode a chunk-index
    sequence, slice per index. Row fan-out is bounded by doc length /
    stride; no UDF, no driver loop."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", tx.tokens_col(F.lower(F.col("text"))).alias("_t")
    )
    n = F.size("_t")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(_CHUNK_OVERLAP)) / F.lit(_CHUNK_STRIDE))
    )
    exploded = staged.select(
        "doc_id",
        "_t",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_id"
        ),
    )
    chunk = F.slice(
        F.col("_t"), F.col("chunk_id") * _CHUNK_STRIDE + 1, _CHUNK_TOKENS
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


_SQL_TOKS = r"list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\s+'), x -> len(x) > 0)"

ORACLE_CHUNKS = f"""
WITH staged AS (
  SELECT doc_id, {_SQL_TOKS} AS t,
         greatest(1, CAST(ceil((len({_SQL_TOKS}) - {_CHUNK_OVERLAP})
                               / {_CHUNK_STRIDE}.0) AS BIGINT)) AS n_chunks
  FROM documents
)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_id,
       CAST(len(list_slice(t, ci * {_CHUNK_STRIDE} + 1,
                           ci * {_CHUNK_STRIDE} + {_CHUNK_TOKENS})) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(list_slice(t, ci * {_CHUNK_STRIDE} + 1,
                                  ci * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}), ' ')
         AS chunk_text
FROM staged, unnest(generate_series(0, n_chunks - 1)) AS u(ci)
ORDER BY doc_id, chunk_id
"""


# --- embedding int8 quantization ---------------------------------------------


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector min-max int8 quantization of the embedding column —
    the storage/serving compression step for vector indexes (4x
    smaller than float32). Min/max are projected ONCE as aliased
    columns (Catalyst cannot CSE across the transform lambda scope);
    all arithmetic is IEEE double, bit-identical across engines, and
    the code array is emitted as a comma-joined string (driver array
    convention). Constant vectors (scale 0) map to code -128."""
    emb = load_table(spark, sf_dir, "embeddings")
    staged = emb.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("_v"),
    ).select(
        "vec_id",
        "label",
        "_v",
        F.array_min("_v").alias("_mn"),
        F.array_max("_v").alias("_mx"),
    )
    scale = F.col("_mx") - F.col("_mn")
    codes = F.transform(
        F.col("_v"),
        lambda x: (
            F.floor(
                F.when(scale > 0, (x - F.col("_mn")) / scale * 255).otherwise(0.0)
            )
            - 128
        ).cast("string"),
    )
    return staged.select(
        "vec_id",
        "label",
        F.round("_mn", 6).alias("vmin"),
        F.round("_mx", 6).alias("vmax"),
        F.array_join(codes, ",").alias("codes"),
    ).orderBy("vec_id")


ORACLE_QUANTIZE = """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
  FROM embeddings
),
m AS (
  SELECT *, list_aggregate(vv, 'min') AS mn, list_aggregate(vv, 'max') AS mx
  FROM v
)
SELECT vec_id, label,
       round(mn, 6) AS vmin,
       round(mx, 6) AS vmax,
       array_to_string(list_transform(vv, x ->
         CAST(CAST(floor(CASE WHEN mx - mn > 0
                              THEN (x - mn) / (mx - mn) * 255
                              ELSE 0.0 END) AS BIGINT) - 128 AS VARCHAR)), ',')
         AS codes
FROM m ORDER BY vec_id
"""


# --- exact rank-based percentiles per group ----------------------------------


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per event type via the element at
    rank ceil(p*n) under a deterministic total order — engines
    disagree on percentile interpolation arithmetic, but rank
    selection is portable (the same trick as the median query,
    generalized to a percentile profile).

    TWO-PHASE ranks (r9 — VERDICT r8 "What's wrong #1" audit): event
    types are enum-bounded, so a per-type window holds corpus/|types|
    rows in ONE task. Instead the global per-type rank assembles from
    (1) per-(type, value-range) LOCAL row_numbers — ranges come from
    per-type approx-percentile boundaries collected as literals
    (|types| × N doubles, a model-sized driver crossing; deterministic
    bucket = #(boundaries < value), so equal values share a bucket and
    the event_id tie-break stays inside one local window) — plus
    (2) broadcast prefix OFFSETS from the (|types| × N)-row bucket
    rollup. Boundary placement affects balance only: the assembled
    rank is the same total order, so the selected elements (and the
    hash) are identical to the one-window form."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions"))
    qs = [i / n_ranges for i in range(1, n_ranges)]
    brows = (
        ev.groupBy("event_type")
        .agg(F.percentile_approx("value", qs, 1000).alias("bs"))
        .collect()
    )
    bounds_df = F.broadcast(
        spark.createDataFrame(
            [
                (r["event_type"], sorted(set(r["bs"] or [])))
                for r in brows
            ],
            "event_type string, _bs array<double>",
        )
    )
    bucketed = ev.join(bounds_df, "event_type").select(
        "event_type",
        "value",
        "event_id",
        F.size(
            F.filter(F.col("_bs"), lambda b: b < F.col("value"))
        ).alias("_pid"),
    )
    local_w = Window.partitionBy("event_type", "_pid").orderBy(
        "value", "event_id"
    )
    local = bucketed.select(
        "event_type",
        "value",
        "_pid",
        F.row_number().over(local_w).cast("long").alias("_lrn"),
    )
    grp = bucketed.groupBy("event_type", "_pid").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    off_w = Window.partitionBy("event_type").orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = grp.select(
        "event_type",
        "_pid",
        F.coalesce(F.sum("_bn").over(off_w), F.lit(0)).alias("_off"),
        F.sum("_bn")
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    ranked = local.join(F.broadcast(offsets), ["event_type", "_pid"]).select(
        "event_type",
        "value",
        (F.col("_off") + F.col("_lrn")).alias("rn"),
        "n",
    )

    def at(p: float) -> F.Column:
        return F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * F.lit(p)), F.col("value"))
        )

    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            at(0.5).alias("p50"),
            at(0.9).alias("p90"),
            at(0.99).alias("p99"),
        )
        .orderBy("event_type")
    )


def event_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch variant of the percentile profile: ``approx_percentile``
    (KLL-style mergeable summary) — at 100 TB the exact rank pass
    costs a full per-group sort, while the sketch is one map-side
    mergeable accumulator. No oracle (sketch internals are
    engine-specific); the driver records the rows-only check, and the
    exact query above bounds the answer."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pct.getItem(0).alias("p50"),
            pct.getItem(1).alias("p90"),
            pct.getItem(2).alias("p99"),
        )
        .orderBy("event_type")
    )


def event_value_percentiles_dd(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """p50/p90/p99 per event type from the DD-style log-bucket
    histogram (operators/sketches.dd_histogram's bucket rule) — the
    HASH-BACKED approx-percentile (r10): unlike ``percentile_approx``
    (KLL internals are engine-private, rows-only forever), the DD
    bucket is ln/ceil arithmetic both engines evaluate identically, so
    the DuckDB oracle replays the sketch bit-for-bit — build, bucket
    walk, and representative-value arithmetic. Each answer is within
    relative error alpha=1% of the true order statistic at the
    sketch's rank convention (cum > q·(n-1)); the exact query above
    uses rank = ceil(q·n), one position away, so the two agree to
    alpha PLUS one order-statistic gap (pinned in
    tests/test_sketches.py).

    Scale shape: ONE (type, bucket) map-side-combined aggregation —
    bounded at |types| x ~2k buckets — then windows/aggregates over
    that bounded table only; no per-group sort of the corpus (the
    exact query's cost), no KLL buffer. The streaming twin
    (streaming/percentiles.py) maintains the same histogram
    continuously. Engine-portability detail: the bucket divides by the
    PRECOMPUTED log(gamma) literal (one Python double both engines
    parse), so the only cross-engine float op is ln(value); the
    representative 2·gamma^b/(gamma+1) rounds to 6 dp on both sides.

    DOCUMENTED RESIDUAL RISK (ADVICE r10, accepted): unlike the theta
    twin's exact md5-integer arithmetic, this parity rides two
    transcendental floats — JVM ln/pow are permitted 1-ulp error (not
    correctly rounded) vs DuckDB's libm, so a value whose ln(v)/ln(γ)
    lands within 1 ulp of a ceil boundary, or a representative within
    1 ulp of a 6-dp rounding boundary, can bucket/round differently
    across engines. Per-row probability is ~2⁻⁵², negligible at test
    SFs but nonzero on a large fixture; the integer bucket ids, cum
    counts, and rank walk are exact. If a future fixture ever trips
    it, the hardening is mechanical: compare bucket INDEXES (integer)
    and emit the representative from a pure-Python pow literal table."""
    import math as _m

    from pyspark.sql import Window

    from ..operators.sketches import DD_GAMMA, DD_ZERO_BUCKET

    lg = repr(_m.log(DD_GAMMA))
    ev = load_table(spark, sf_dir, "events")
    hist = (
        ev.where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr(
                "CASE WHEN value > 0 THEN"
                f" CAST(ceil(ln(value) / {lg}) AS BIGINT)"
                f" ELSE CAST({DD_ZERO_BUCKET} AS BIGINT) END"
            ).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    cum = hist.select(
        "event_type",
        "bucket",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )

    def bucket_at(p: float):
        return F.min(
            F.when(
                F.col("cum") > F.lit(p) * (F.col("n") - 1), F.col("bucket")
            )
        )

    def est(b):
        return F.when(
            b == F.lit(DD_ZERO_BUCKET), F.lit(0.0)
        ).otherwise(
            F.round(
                F.lit(2.0)
                * F.pow(F.lit(DD_GAMMA), b)
                / F.lit(DD_GAMMA + 1.0),
                6,
            )
        )

    sel = cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        bucket_at(0.5).alias("_b50"),
        bucket_at(0.9).alias("_b90"),
        bucket_at(0.99).alias("_b99"),
    )
    return sel.select(
        "event_type",
        "n_events",
        est(F.col("_b50")).alias("p50"),
        est(F.col("_b90")).alias("p90"),
        est(F.col("_b99")).alias("p99"),
    ).orderBy("event_type")


def _oracle_percentiles_dd() -> str:
    import math as _m

    from ..operators.sketches import DD_GAMMA, DD_ZERO_BUCKET

    lg = repr(_m.log(DD_GAMMA))
    g = repr(DD_GAMMA)
    g1 = repr(DD_GAMMA + 1.0)

    def est(b: str) -> str:
        return (
            f"CASE WHEN {b} = {DD_ZERO_BUCKET} THEN 0.0"
            f" ELSE round(2.0 * pow({g}, {b}) / {g1}, 6) END"
        )

    return f"""
WITH h AS (
  SELECT event_type,
         CASE WHEN value > 0
              THEN CAST(ceil(ln(value) / {lg}) AS BIGINT)
              ELSE CAST({DD_ZERO_BUCKET} AS BIGINT) END AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
),
sel AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS n_events,
         MIN(CASE WHEN cum > 0.5 * (n - 1) THEN bucket END) AS b50,
         MIN(CASE WHEN cum > 0.9 * (n - 1) THEN bucket END) AS b90,
         MIN(CASE WHEN cum > 0.99 * (n - 1) THEN bucket END) AS b99
  FROM cum GROUP BY event_type
)
SELECT event_type, n_events,
       {est('b50')} AS p50,
       {est('b90')} AS p90,
       {est('b99')} AS p99
FROM sel ORDER BY event_type
"""


ORACLE_PERCENTILES = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90,
       MAX(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END) AS p99
FROM ranked GROUP BY event_type ORDER BY event_type
"""


ORACLE_TFIDF = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(CASE WHEN regexp_matches(text, '[İΣ]') THEN CAST(error('text-family oracle: Java and utf8proc lower() diverge on U+0130/U+03A3 (Unicode SpecialCasing); fixture has such rows') AS VARCHAR) ELSE lower(text) END, '\s+'),
                                    x -> len(x) > 0)) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, tf.term, tf, df,
       round(CAST(tf * n_docs AS DOUBLE) / df, 6) AS tfidf
FROM tf JOIN dfreq ON tf.term = dfreq.term, n
WHERE tf >= {_TF_MIN}
ORDER BY doc_id, tf.term
"""


# --- k-per-group deterministic downsampling ----------------------------------


def sample_k_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most k=5 events per user, chosen by md5 order — the
    per-group quota downsampler (cap contribution of heavy users in a
    training mix). Content-addressed like the stratified sampler:
    reproducible on any engine/partitioning, and the md5 sort key is
    uncorrelated with time or type, so the quota is an unbiased draw.
    One window pass; at scale this is the standard rank-filter."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string").cast("binary"))
    w = Window.partitionBy("user_id").orderBy(h.alias("h"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select(
            "event_id", "user_id", "event_type", F.col("rn").cast("long").alias("rn")
        )
        .orderBy("event_id")
    )


ORACLE_SAMPLE_K_PER_USER = """
SELECT event_id, user_id, event_type, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events
) WHERE rn <= 5
ORDER BY event_id
"""


# --- sequence packing (concatenate-then-cut into fixed token budgets) --------

_PACK_BUDGET = 512
_PACK_SHARDS = 16


def pack_chunks_into_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the 64-token document chunks into fixed 512-token training
    sequences, the concatenate-then-cut way packed pretraining loaders
    do it: within a shard, chunks are laid out in (doc_id, chunk_id)
    order and a chunk's bin is floor(start_offset / budget). Sharding
    by pmod(doc_id, 16) keeps the running offset per shard — each
    shard packs independently and in parallel (a single global
    ordering would serialize the cumsum at scale). One window pass
    over integer cumsums, engine-exact."""
    from pyspark.sql import Window

    chunks = text_chunks(spark, sf_dir)
    shard = F.pmod(F.col("doc_id"), F.lit(_PACK_SHARDS)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = chunks.withColumn("shard", shard).withColumn(
        "start_offset",
        (F.sum("n_chunk_tokens").over(w) - F.col("n_chunk_tokens")).cast("long"),
    )
    binned = staged.withColumn(
        "seq_id", F.floor(F.col("start_offset") / _PACK_BUDGET).cast("long")
    )
    return (
        binned.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("shard", "seq_id")
    )


ORACLE_PACK_CHUNKS = f"""
WITH staged AS (
  SELECT doc_id, {_SQL_TOKS} AS t,
         greatest(1, CAST(ceil((len({_SQL_TOKS}) - {_CHUNK_OVERLAP})
                               / {_CHUNK_STRIDE}.0) AS BIGINT)) AS n_chunks
  FROM documents
),
chunks AS (
  SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
         CAST(len(list_slice(t, ci * {_CHUNK_STRIDE} + 1,
                             ci * {_CHUNK_STRIDE} + {_CHUNK_TOKENS})) AS BIGINT)
           AS n_chunk_tokens
  FROM staged, unnest(generate_series(0, n_chunks - 1)) AS u(ci)
),
offs AS (
  SELECT CAST(doc_id % {_PACK_SHARDS} AS INT) AS shard, doc_id, chunk_id,
         n_chunk_tokens,
         SUM(n_chunk_tokens) OVER (PARTITION BY doc_id % {_PACK_SHARDS}
                                   ORDER BY doc_id, chunk_id
                                   ROWS UNBOUNDED PRECEDING)
           - n_chunk_tokens AS start_offset
  FROM chunks
)
SELECT shard,
       CAST(floor(start_offset / {_PACK_BUDGET}.0) AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_chunk_tokens) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
FROM offs GROUP BY shard, seq_id ORDER BY shard, seq_id
"""


# --- deterministic weighted dataset mixing ----------------------------------

# per-source mixture weights: fractional repeat factors. >1 upsamples
# (integer copies + md5-gated extra), <1 downsamples (md5-gated keep).
# Same content-addressed determinism as sample_events_stratified: the
# copy count is a pure function of doc_id, reproducible on any engine,
# cluster, or partitioning.
_MIX_EVEN_WEIGHT = (2, "8000")  # even source idx: 2.5x -> base 2, frac 0.5
_MIX_ODD_WEIGHT = (0, "4000")  # odd source idx: 0.25x -> base 0, frac 0.25


def mix_documents_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing — the training-blend materializer:
    each source's documents are repeated by a fractional weight
    (upsample hot sources, thin cold ones), emitting one row per copy
    with a copy_id for downstream shuffling/packing.

    copies = base + [md5_prefix(doc_id) < frac_threshold]; rows with
    zero copies drop before the explode, so the generate+posexplode
    never sees an empty-range edge case (Spark's ``sequence(1, 0)``
    REVERSES direction rather than yielding empty). The explode is
    map-side only — no shuffle anywhere; at 100 TB the blend runs as
    a pure scan->project->explode pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4
    )
    even_base, even_thr = _MIX_EVEN_WEIGHT
    odd_base, odd_thr = _MIX_ODD_WEIGHT
    is_even = F.expr("CAST(substring(source, 4) AS INT) % 2 = 0")
    base = F.when(is_even, F.lit(even_base)).otherwise(F.lit(odd_base))
    thr = F.when(is_even, F.lit(even_thr)).otherwise(F.lit(odd_thr))
    copies = (base + (prefix < thr).cast("int")).alias("copies")
    return (
        docs.select("doc_id", "source", copies)
        .where(F.col("copies") > 0)
        .select(
            "doc_id",
            "source",
            F.posexplode(F.sequence(F.lit(1), F.col("copies"))).alias(
                "copy_id", "_one"
            ),
        )
        .select("doc_id", "source", F.col("copy_id").cast("long").alias("copy_id"))
        .orderBy("doc_id", "copy_id")
    )


ORACLE_MIX_WEIGHTED = f"""
WITH counted AS (
  SELECT doc_id, source,
         (CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
               THEN {_MIX_EVEN_WEIGHT[0]} ELSE {_MIX_ODD_WEIGHT[0]} END)
         + (CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
                      (CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                            THEN '{_MIX_EVEN_WEIGHT[1]}'
                            ELSE '{_MIX_ODD_WEIGHT[1]}' END)
                 THEN 1 ELSE 0 END) AS copies
  FROM documents
)
SELECT doc_id, source,
       CAST(u.c - 1 AS BIGINT) AS copy_id
FROM counted, unnest(generate_series(1, copies)) AS u(c)
WHERE copies > 0
ORDER BY doc_id, copy_id
"""


def mixing_weights_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-temperature mixing weights (round 6): per language,
    the raw corpus share p = n/N and the temperature-rebalanced
    sampling share q = p^α / Σ p^α with α = 1/2 — the multilingual
    upsampling rule (XLM-R style) that keeps low-resource languages
    from vanishing under proportional sampling; the emitted
    ``upsample`` factor q/p is exactly what ``mix_documents_weighted``
    materializes downstream.

    α is pinned at 1/2 because sqrt is the ONE power IEEE 754 requires
    correctly rounded, so both engines compute bit-identical doubles —
    pow(x, 0.7) may differ by an ulp between libm implementations (the
    same no-transcendentals rule as the linear-idf / integer-ratio-LM
    choices). The Σ folds the enum-sized language list in lang-sorted
    order via the single-row pack (collect → sort_array → aggregate +
    explode, no subtree diamond). Scale: one corpus scan, one
    enum-sized shuffle; everything after is model-sized.

    NULL langs are excluded on BOTH sides (ADVICE r6): Spark's
    sort_array puts NULL structs FIRST while DuckDB's ORDER BY puts
    NULLs LAST, so a NULL language would silently flip the fold order
    (and the output order) between engines — an unlabeled document has
    no language to weight anyway."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull()
    )
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    packed = counts.agg(
        F.sort_array(F.collect_list(F.struct("lang", "n_docs"))).alias("a")
    )
    row = packed.select(
        F.aggregate(
            "a", F.lit(0.0), lambda acc, s: acc + F.sqrt(s["n_docs"])
        ).alias("_dsq"),
        F.aggregate(
            "a",
            F.lit(0).cast("long"),
            lambda acc, s: acc + s["n_docs"],
        ).alias("_ntot"),
        F.explode("a").alias("x"),
    )
    n = F.col("x.n_docs").cast("double")
    share = n / F.col("_ntot")
    temp_share = F.sqrt(n) / F.col("_dsq")
    return row.select(
        F.col("x.lang").alias("lang"),
        F.col("x.n_docs").alias("n_docs"),
        F.round(share, 6).alias("share"),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(temp_share / share, 6).alias("upsample"),
    ).orderBy("lang")


ORACLE_MIXING_WEIGHTS = """
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
           WHERE lang IS NOT NULL GROUP BY lang),
packed AS (
  SELECT list(n_docs ORDER BY lang) AS ns FROM c
),
denom AS (
  SELECT list_reduce(list_prepend(0.0,
           list_transform(ns, x -> sqrt(CAST(x AS DOUBLE)))),
           (a, b) -> a + b) AS dsq,
         list_reduce(list_prepend(CAST(0 AS BIGINT), ns),
           (a, b) -> a + b) AS ntot
  FROM packed
)
SELECT c.lang, CAST(c.n_docs AS BIGINT) AS n_docs,
       round(c.n_docs / CAST(d.ntot AS DOUBLE), 6) AS share,
       round(sqrt(CAST(c.n_docs AS DOUBLE)) / d.dsq, 6) AS temp_share,
       round((sqrt(CAST(c.n_docs AS DOUBLE)) / d.dsq)
             / (c.n_docs / CAST(d.ntot AS DOUBLE)), 6) AS upsample
FROM c CROSS JOIN denom d ORDER BY c.lang
"""


# --- balanced shard assignment ----------------------------------------------

_N_SHARDS = 8


# doc_id range width for the two-pass prefix-rank sub-buckets: within
# one token count, doc_ids are dealt in ascending order, and a bucket
# of ``floor(doc_id / W)`` is a CONTIGUOUS slice of that order — so
# (n_tokens desc, bucket asc) ranges tile the global total order and
# local ranks + carried offsets reproduce the single-window rank
# exactly. W bounds the rows any one window task sorts.
_SHARD_RANK_BUCKET = 1024


def _balanced_shard_assignments(docs: DataFrame) -> DataFrame:
    """Per-document shard via distributed two-pass prefix ranks.

    Pass 1 (distributed): local ``row_number`` within
    ``(n_tokens, doc_id DIV W)`` groups — each group is a contiguous
    run of the global order ``(n_tokens desc, doc_id asc)``, so the
    local rank is the global rank minus the count of rows in all
    earlier groups. Pass 2 (tiny): group counts roll up twice —
    per-group prefix offsets within a token count (partitioned
    window), then token-count-level offsets over the DISTINCT token
    counts (the only unpartitioned window, dimension-sized: bounded by
    max document length, not corpus size). global_rank = kt_offset +
    in-kt offset + local rank; the round-robin modulo is invariant to
    how the rank was assembled."""
    docs = docs.withColumn(
        "_bkt", (F.col("doc_id") / F.lit(_SHARD_RANK_BUCKET)).cast("long")
    )
    lw = Window.partitionBy("n_tokens", "_bkt").orderBy("doc_id")
    local = docs.withColumn("_lrn", F.row_number().over(lw).cast("long"))

    grp = docs.groupBy("n_tokens", "_bkt").agg(F.count(F.lit(1)).alias("_n"))
    # offsets of each bucket within its token count: partitioned window
    in_kt = Window.partitionBy("n_tokens").orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # offsets of each token count in the global (desc) order: the sole
    # unpartitioned window, over |distinct n_tokens| rows only
    per_kt = grp.groupBy("n_tokens").agg(F.sum("_n").alias("_nt"))
    kt_w = Window.orderBy(F.col("n_tokens").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    kt_off = per_kt.select(
        "n_tokens",
        F.coalesce(F.sum("_nt").over(kt_w), F.lit(0)).alias("_kt_off"),
    )
    grp_off = (
        grp.withColumn(
            "_in_kt_off", F.coalesce(F.sum("_n").over(in_kt), F.lit(0))
        )
        .join(F.broadcast(kt_off), "n_tokens")
        .select(
            "n_tokens",
            "_bkt",
            (F.col("_kt_off") + F.col("_in_kt_off")).alias("_off"),
        )
    )
    return local.join(grp_off, ["n_tokens", "_bkt"]).select(
        "doc_id",
        "n_tokens",
        ((F.col("_off") + F.col("_lrn") - 1) % _N_SHARDS)
        .cast("long")
        .alias("shard"),
    )


def shard_documents_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment — the write-side partitioner for
    training shards: order documents by token count (descending, doc_id
    tie-break) and deal them round-robin across ``_N_SHARDS``, the
    classic LPT-style greedy that bounds per-shard token skew to one
    document. Emits the per-shard totals the writer would use to name
    and size its output files.

    The rank is assembled by :func:`_balanced_shard_assignments` as
    distributed two-pass prefix ranks — local ranks in contiguous
    ``(n_tokens, doc_id DIV W)`` ranges plus carried offsets from a
    dimension-sized rollup — so no corpus-scale rows ever pass through
    a single-partition window; the only total-order window runs over
    the distinct token counts. Same output, exact to the hash, as the
    one-window form (``tests/test_plans.py`` pins the plan shape)."""
    from ..functions import text as tx

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tx.token_count_col(F.col("text")).alias("n_tokens")
    )
    assigned = _balanced_shard_assignments(docs)
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("shard")
    )


ORACLE_SHARD_BALANCED = f"""
WITH counted AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'),
                         t -> len(t) > 0)) AS n_tokens
  FROM documents
), assigned AS (
  SELECT doc_id, n_tokens,
         (row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1)
           % {_N_SHARDS} AS shard
  FROM counted
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM assigned
GROUP BY shard
ORDER BY shard
"""


# --- global priority sample (exact-k without replacement) --------------------

_PRIORITY_K = 500


def sample_documents_priority_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k uniform sample WITHOUT replacement over the whole corpus
    (the audit/eval draw: "give me exactly 500 random documents,
    reproducibly"): every doc gets a content-addressed priority
    md5(doc_id) and the k smallest win. Complements the per-group
    quota sampler (:func:`sample_k_per_user`) and the rate-based
    stratified sampler (md5-gate — Bernoulli, not exact-k).

    Scale: orderBy(priority).limit(k) plans as TakeOrderedAndProject —
    each partition keeps its local top-k and only k rows per partition
    merge; no global sort, no corpus-wide shuffle. Deterministic on
    any engine/partitioning (ties impossible: the tiebreak doc_id is
    unique and the priority is a pure function of it)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    return (
        docs.select("doc_id", "source", h.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(_PRIORITY_K)
    )


ORACLE_PRIORITY_K = f"""
SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {_PRIORITY_K}
"""


# --- deterministic epoch shuffle ---------------------------------------------

_EPOCH_SEED = "epoch-3"
_EPOCH_SHARDS = 16


def epoch_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle — the training loader's
    permutation, materialized as (doc_id, shard, pos) without ever
    running a global sort: the order key is md5(seed || doc_id)
    (content-addressed, so epoch N's permutation is reproducible on
    any engine or partitioning and uncorrelated with epoch N+1's),
    the shard is the key's top hex nibbles mod ``_EPOCH_SHARDS``, and
    pos is a PARTITIONED row_number within the shard ordered by the
    same key. Readers that drain shards round-robin see a uniform
    random permutation of the corpus; no unpartitioned window, one
    hash shuffle on the shard key, scale-safe at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(
        F.concat(F.lit(_EPOCH_SEED + ":"), F.col("doc_id").cast("string")).cast(
            "binary"
        )
    )
    staged = docs.select(
        "doc_id",
        key.alias("_key"),
        (
            F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
            % _EPOCH_SHARDS
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("_key", "doc_id")
    return (
        staged.select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


ORACLE_EPOCH_SHUFFLE = f"""
WITH staged AS (
  SELECT doc_id,
         md5('{_EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)) AS k,
         ('0x' || substr(md5('{_EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)),
                         1, 4))::BIGINT % {_EPOCH_SHARDS} AS shard
  FROM documents
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
            AS BIGINT) AS pos
FROM staged
ORDER BY shard, pos
"""


# --- semantic dedup (SemDeDup-shaped keep/drop decision) --------------------

# cosine threshold for "semantically duplicate" within a cluster
# block; 0.3 on this synthetic noisy corpus plays the role 0.95+ plays
# on real embedding spaces — it yields a realistic edge density for
# the closure step (the algorithm is threshold-agnostic)
_SEM_COS_THRESHOLD = 0.3


def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup over the embeddings table: the
    per-row KEEP/DROP decision, not just the pair list.

    Pipeline: (1) pairwise cosine >= t WITHIN (label, policy-cell)
    blocks — near-dups must share the source label AND a
    policy-sized seed-centroid cell
    (``operators.clustering.policy_cell_assignment``:
    k = max(√n, n/8192) from count(*));
    (2) transitive closure of the near-dup pairs via
    min-label-propagation connected components;
    (3) representative = min vec_id per component -> keep, everything
    else in the component -> drop. Rows in no pair keep trivially.

    r11 (VERDICT r10 watch-list): the block key was ``label`` ALONE —
    fixed cardinality, so block population and pair work grew
    quadratically with the corpus (×10.6 wall on ×10 data,
    SCALE_TREND_r10_sf1.txt). Intersecting with the policy cell keeps
    the within-label semantic while bounding block size; the oracle
    re-derives the cell key from count(*), so the hash check covers
    the policy. (``semantic_dedup_kmeans`` is the pure-cell variant —
    no label constraint, the literal SemDeDup recipe.)

    Scale: the pair join shuffles on the composite block key
    (quadratic only within a block — expected cell population ≤ 8192);
    the closure is one shuffle per round over the PAIR table
    (|pairs| << |rows|); the final decision join is a left join on
    vec_id. The oracle reproduces the closure with a recursive CTE —
    different algorithm, same fixpoint."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dd.embedding_cosine_pairs(
        policy_cell_assignment(emb),
        "vec_id",
        "embedding",
        ["label", "cluster"],
        _SEM_COS_THRESHOLD,
    ).select("a", "b")
    comp = connected_components(pairs, "a", "b").withColumnRenamed(
        "node", "vec_id"
    )
    cluster = F.coalesce(F.col("component"), F.col("vec_id"))
    return (
        emb.select("vec_id")
        .join(comp, "vec_id", "left")
        .select(
            "vec_id",
            cluster.alias("cluster_id"),
            (cluster == F.col("vec_id")).alias("keep"),
        )
        .orderBy("vec_id")
    )


# fixed-order double fold cosine, identical to the Spark fold (see
# dedup_queries._SQL_DOT_ED — duplicated literally here because this
# module owns its oracle strings; both derive from functions/vectors)
_SQL_DOT_SEM = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
)


def _sql_cos_sem(a: str, b: str) -> str:
    dot = _SQL_DOT_SEM.format(a=a, b=b)
    na = f"sqrt({_SQL_DOT_SEM.format(a=a, b=a)})"
    nb = f"sqrt({_SQL_DOT_SEM.format(a=b, b=b)})"
    return f"round({dot} / ({na} * {nb}), 6)"


# shared (label, policy-cell) candidate CTE: pc_cells comes from
# sql_policy_cells (k re-derived from count(*) — the hash check covers
# the policy); the label equality preserves the within-label semantic
_CANDS_LABEL_CELL = f"""cands AS (
  SELECT l.vec_id AS a, r.vec_id AS b
  FROM embeddings l
  JOIN pc_cells la ON la.vec_id = l.vec_id
  JOIN pc_cells ra ON ra.cluster = la.cluster
  JOIN embeddings r ON r.vec_id = ra.vec_id
    AND l.label = r.label AND l.vec_id < r.vec_id
  WHERE {_sql_cos_sem('l.embedding', 'r.embedding')} >= {_SEM_COS_THRESHOLD}
)"""

ORACLE_SEMANTIC_DEDUP = f"""
WITH RECURSIVE {sql_policy_cells()},
{_CANDS_LABEL_CELL},
edges AS (
  SELECT a AS u, b AS v FROM cands
  UNION SELECT b AS u, a AS v FROM cands
),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT reach.node, e.v AS r FROM reach JOIN edges e ON reach.r = e.u
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT e.vec_id,
       CAST(COALESCE(comp.component, e.vec_id) AS BIGINT) AS cluster_id,
       COALESCE(comp.component, e.vec_id) = e.vec_id AS keep
FROM embeddings e LEFT JOIN comp ON comp.node = e.vec_id
ORDER BY vec_id
"""


# --- deterministic train/val/test split -------------------------------------

# md5-prefix thresholds out of 0x10000: ~87.5% train, ~6.25% val, rest
# test. Content-addressed (pure function of doc_id), so the split is
# stable under re-runs, re-partitioning, engine changes, and corpus
# growth — a doc NEVER migrates between splits when new data arrives,
# which is the property that keeps eval sets uncontaminated across
# dataset versions. (Random splits with seeds lose it the moment row
# order or partitioning changes.)
_SPLIT_TRAIN_MAX = "e000"
_SPLIT_VAL_MAX = "f000"


def _split_of(id_col: F.Column) -> F.Column:
    """The deterministic md5-prefix split rule as a function of any id
    column — THE single Python definition (naive split, curation
    manifest, leakage audit, and cluster-safe split all call it, so
    the rule cannot drift between them)."""
    prefix = F.substring(F.md5(id_col.cast("string").cast("binary")), 1, 4)
    return (
        F.when(prefix < _SPLIT_TRAIN_MAX, "train")
        .when(prefix < _SPLIT_VAL_MAX, "val")
        .otherwise("test")
    )


def _sql_split_of(id_expr: str) -> str:
    """The same rule for oracles — the single SQL definition."""
    return (
        f"CASE WHEN substr(md5(CAST({id_expr} AS VARCHAR)), 1, 4)"
        f" < '{_SPLIT_TRAIN_MAX}' THEN 'train'"
        f" WHEN substr(md5(CAST({id_expr} AS VARCHAR)), 1, 4)"
        f" < '{_SPLIT_VAL_MAX}' THEN 'val'"
        f" ELSE 'test' END"
    )



def split_documents_train_val_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document split assignment + per-split size accounting in
    one pass: (doc_id, split) rows carry the assignment; the window
    totals give each split's doc and char budget without a second
    scan. Pushes down as pure projection + broadcast-free window over
    a 3-value key — trivially scale-safe."""
    docs = load_table(spark, sf_dir, "documents")
    split = _split_of(F.col("doc_id"))
    w = Window.partitionBy("split")
    return (
        docs.select("doc_id", F.col("n_chars"), split.alias("split"))
        .select(
            "doc_id",
            "split",
            F.count(F.lit(1)).over(w).alias("split_docs"),
            F.sum("n_chars").over(w).alias("split_chars"),
        )
        .orderBy("doc_id")
    )


ORACLE_SPLIT_TVT = f"""
WITH assigned AS (
  SELECT doc_id, n_chars, {_sql_split_of('doc_id')} AS split
  FROM documents
)
SELECT doc_id, split,
       CAST(COUNT(*) OVER (PARTITION BY split) AS BIGINT) AS split_docs,
       CAST(SUM(n_chars) OVER (PARTITION BY split) AS BIGINT) AS split_chars
FROM assigned
ORDER BY doc_id
"""


# --- cross-modal curation manifest ------------------------------------------


def curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-release MANIFEST: one row per document with every
    curation gate evaluated side by side — text quality, exact-dup
    representative, embedding-space semantic keep (cross-table: the
    embeddings row with vec_id = doc_id), plus the deterministic
    train/val/test split — and the final ``selected`` verdict. This is
    the auditable artifact a 100 TB curation run ships: per-gate
    booleans make "why was this doc dropped" a filter, not a re-run.

    Scale: quality + split are scan-local projections; the exact-rep
    flag is one hash-shuffle window on md5(text); the semantic gate
    reuses the (label, policy-cell)-blocked cosine + connected-
    components closure of ``semantic_dedup_keep`` (|pairs|-sized work;
    r11 — was label-only blocking, the ×7.9-on-×10-data fixed-block
    pathology); the final assembly is one join on doc_id. The oracle
    rebuilds all four gates in SQL (recursive CTE for the closure,
    policy k re-derived from count(*)), hash-verifying the whole
    composition."""
    from ..functions.text import quality_score_col

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dd.embedding_cosine_pairs(
        policy_cell_assignment(emb),
        "vec_id",
        "embedding",
        ["label", "cluster"],
        _SEM_COS_THRESHOLD,
    ).select("a", "b")
    comp = connected_components(pairs, "a", "b").withColumnRenamed(
        "node", "vec_id"
    )
    sem = (
        emb.select("vec_id")
        .join(comp, "vec_id", "left")
        .select(
            "vec_id",
            (
                F.coalesce(F.col("component"), F.col("vec_id"))
                == F.col("vec_id")
            ).alias("semantic_keep"),
        )
    )
    split = _split_of(F.col("doc_id"))
    rn = F.row_number().over(Window.partitionBy(F.md5("text")).orderBy("doc_id"))
    gated = docs.select(
        "doc_id",
        split.alias("split"),
        (quality_score_col(F.col("text")) >= 0.5).alias("quality_pass"),
        (rn == 1).alias("exact_rep"),
    )
    keep = F.coalesce(F.col("semantic_keep"), F.lit(True))
    return (
        gated.join(sem, gated.doc_id == sem.vec_id, "left")
        .select(
            "doc_id",
            "split",
            "quality_pass",
            "exact_rep",
            keep.alias("semantic_keep"),
            (F.col("quality_pass") & F.col("exact_rep") & keep).alias(
                "selected"
            ),
        )
        .orderBy("doc_id")
    )


def _oracle_curation_manifest(quality_sql: str) -> str:
    return f"""
WITH RECURSIVE {sql_policy_cells()},
{_CANDS_LABEL_CELL},
edges AS (
  SELECT a AS u, b AS v FROM cands
  UNION SELECT b AS u, a AS v FROM cands
),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT reach.node, e.v AS r FROM reach JOIN edges e ON reach.r = e.u
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
sem AS (
  SELECT e.vec_id,
         COALESCE(comp.component, e.vec_id) = e.vec_id AS semantic_keep
  FROM embeddings e LEFT JOIN comp ON comp.node = e.vec_id
),
gated AS (
  SELECT doc_id,
         {_sql_split_of('doc_id')} AS split,
         ({quality_sql} >= 0.5) AS quality_pass,
         (row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
           AS exact_rep
  FROM documents
)
SELECT g.doc_id, g.split, g.quality_pass, g.exact_rep,
       COALESCE(sem.semantic_keep, TRUE) AS semantic_keep,
       g.quality_pass AND g.exact_rep AND COALESCE(sem.semantic_keep, TRUE)
         AS selected
FROM gated g LEFT JOIN sem ON sem.vec_id = g.doc_id
ORDER BY g.doc_id
"""


# --- near-dup-aware splitting (leakage audit + cluster-safe assign) ---------


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination audit of the NAIVE per-document split: every
    MinHash-LSH near-dup candidate pair whose two sides landed in
    different splits — i.e. eval rows whose near-copy sits in train.
    The per-row hash split ignores document similarity, so this set
    is non-empty by construction; a 100 TB eval-integrity gate runs
    exactly this query before every release. Cost: the LSH candidate
    pipeline plus a scan-local split projection on each side — no new
    shuffle beyond the band join."""
    docs = load_table(spark, sf_dir, "documents")
    cands = dd.minhash_candidates(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    return (
        cands.select(
            "a",
            "b",
            _split_of(F.col("a")).alias("split_a"),
            _split_of(F.col("b")).alias("split_b"),
        )
        .where(F.col("split_a") != F.col("split_b"))
        .orderBy("a", "b")
    )


def oracle_split_leakage(candidates_sql_body: str) -> str:
    return f"""
WITH cands AS MATERIALIZED ({candidates_sql_body})
SELECT a, b,
       {_sql_split_of('a')} AS split_a,
       {_sql_split_of('b')} AS split_b
FROM cands
WHERE {_sql_split_of('a')} <> {_sql_split_of('b')}
ORDER BY a, b
"""


def split_documents_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-FREE split: hash the near-dup CLUSTER representative
    (connected-component min over LSH candidate pairs) instead of the
    document id, so every member of a near-dup cluster lands in the
    same split — no eval example has a training near-copy. Singleton
    docs hash their own id (coalesce), so the assignment rule remains
    a pure function of (doc, pair table). The complement property
    (zero leaked candidate pairs under THIS split) is pinned in
    tests/test_round6_ops.py; the oracle recomputes the closure with
    a recursive CTE. Cost: the cluster closure (|pairs|-sized) plus
    one broadcast-size left join — the 100 TB path replaces the hash
    join's small side with the component table, which is
    near-dup-count-sized, not corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    cands = dd.minhash_candidates(
        docs, "doc_id", "text", _NUM_HASHES, _BANDS, _SHINGLE_K
    )
    comp = connected_components(cands, "a", "b").withColumnRenamed(
        "node", "doc_id"
    )
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("rep_id"),
        )
        .select(
            "doc_id",
            "rep_id",
            _split_of(F.col("rep_id")).alias("split"),
        )
        .orderBy("doc_id")
    )


def oracle_split_cluster_safe(candidates_sql_body: str) -> str:
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
assigned AS (
  SELECT d.doc_id,
         CAST(COALESCE(comp.component, d.doc_id) AS BIGINT) AS rep_id
  FROM documents d LEFT JOIN comp ON comp.node = d.doc_id
)
SELECT doc_id, rep_id, {_sql_split_of('rep_id')} AS split
FROM assigned
ORDER BY doc_id
"""
