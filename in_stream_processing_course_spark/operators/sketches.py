"""Frequent-items (heavy-hitters) via Misra-Gries summaries — the
candidate-generation path that finds every key with frequency > n/k
WITHOUT shuffling the full key space.

Shape (two passes over the data, O(k) driver-side state):

1. ``mapInPandas`` builds one Misra-Gries(k) summary per input
   partition (vectorized: per-Arrow-batch ``value_counts`` merged into
   the counter dict, then batched decrements — O(distinct-per-batch)
   Python ops, not O(rows)).
2. The per-partition summaries (≤ k-1 rows each) are merged with the
   mergeable-summaries rule [Agarwal et al., PODS'12]: sum estimates
   per key, subtract the k-th largest combined estimate, keep
   positives. The result is ≤ k-1 global candidates with undercount
   ≤ n/k — so every key with true count > n/k survives. This is a
   shuffle of ≤ partitions·k rows, not of the corpus.
3. Exact counts via ONE more pass: a left broadcast join flags
   candidate rows, and a single aggregate groups candidates by key and
   everything else under a NULL key — the candidates' exact counts and
   the total n come out of the same shuffle (the totals aggregate
   reuses the grouping exchange), filtered to the true threshold
   ``count·k > n``.

The output is therefore EXACTLY the set of keys with count > n/k with
their exact counts — the oracle hash-check proves the sketch's
superset guarantee end-to-end, not just the final arithmetic.

Guarantee sketch: per-partition MG decrements remove ≥ k·m_p mass
(m_p = sum of that partition's decrement rounds), so Σm_p ≤ n/k before
the merge; the merge subtraction s removes ≥ k·s of the remaining
mass, so s + Σm_p ≤ n/k; any key with count > n/k keeps a positive
estimate.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    StructField,
    StructType,
)


def mg_merge_counts(counters: dict, batch_counts: dict, k: int) -> None:
    """Merge exact ``batch_counts`` into a Misra-Gries(k) summary in
    place, with ONE batched decrement round: add, then (if more than
    k-1 counters remain, d of them) subtract the (d-k+1)-th smallest
    counter value from all and drop non-positives. At most k-1 values
    can be strictly greater than that order statistic, and at least k
    counters carry it fully, so the round removes ≥ k·m mass — the same
    guarantee as item-at-a-time MG decrements, in O(d log d) instead of
    the O(d²) a staircase of distinct counts costs a subtract-the-min
    loop."""
    for val, cnt in batch_counts.items():
        counters[val] = counters.get(val, 0) + int(cnt)
    d = len(counters)
    if d > k - 1:
        m = sorted(counters.values())[d - k]
        for val in list(counters):
            counters[val] -= m
            if counters[val] <= 0:
                del counters[val]


# internal column names the operator introduces — a key column with one
# of these names would silently collide
_RESERVED = frozenset({"_est", "_c", "_r", "_s", "_n", "_cand", "n_rows"})


def partition_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """One Misra-Gries(k) summary per partition: (col, _est) rows,
    ≤ k-1 per partition."""
    field = df.schema[col]
    schema = StructType([StructField(col, field.dataType)]).add("_est", "long")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            mg_merge_counts(counters, pdf[col].value_counts().to_dict(), k)
        yield pd.DataFrame(
            {col: list(counters.keys()), "_est": list(counters.values())}
        )

    return df.select(col).mapInPandas(summarize, schema=schema)


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """All NON-NULL keys of ``df[col]`` with count·k > n, with exact
    counts — computed via the MG candidate path (no full-key-space
    shuffle). NULL — and, for float/double key columns, NaN — is
    excluded as a key EXPLICITLY (pandas ``value_counts`` drops both,
    so such keys would otherwise silently desync the sketch from the
    exact side); the n/k threshold is over the remaining rows.
    Columns: (col, n_rows).

    Exactly two scans of the input: the summaries pass, then one
    left-broadcast-join pass whose aggregate groups every non-candidate
    row under a single NULL key — so the same shuffle yields both the
    candidates' exact counts and (by summing all groups, reusing the
    aggregation exchange) the total n for the threshold."""
    if col in _RESERVED:
        raise ValueError(f"column name {col!r} collides with {_RESERVED}")
    # only the key column participates anywhere below — selecting it
    # first (a) prunes the scan to one column and (b) makes the
    # operator immune to unrelated input columns named like the
    # internals (an input '_cand' would otherwise turn the exact-pass
    # join ambiguous; cf. the '_dists' guard in
    # clustering.assign_to_centroids)
    df = df.select(col).where(F.col(col).isNotNull())
    if isinstance(df.schema[col].dataType, (FloatType, DoubleType)):
        # NaN keys would silently void the superset guarantee: pandas
        # value_counts DROPS NaN in the sketch pass while isNotNull()
        # KEEPS NaN rows in the exact pass, so a NaN key above n/k
        # could never surface as a candidate. NaN is excluded as a key
        # the same way NULL is; n counts non-null, non-NaN rows.
        df = df.where(~F.isnan(F.col(col)))
    partials = partition_summaries(df, col, k)
    combined = partials.groupBy(col).agg(F.sum("_est").alias("_c"))
    # Mergeable-summaries reduction in ONE single-row aggregation:
    # pack the ≤ partitions·k combined rows into a sorted array,
    # subtract the k-th largest estimate in place (F.get is NULL-safe
    # past the end — fewer than k keys means s=0), keep strict
    # positives. No window, no scalar join — every DataFrame reference
    # is linear, because subtree diamonds DUPLICATE Python-UDF scans
    # (canonicalization never matches two serialized mapInPandas nodes,
    # so ReusedExchange cannot kick in).
    packed = combined.agg(
        F.sort_array(
            F.collect_list(F.struct("_c", col)), asc=False
        ).alias("_a")
    )
    candidates = packed.select(
        F.explode(
            F.filter(
                F.col("_a"),
                lambda x: x["_c"]
                > F.coalesce(F.get(F.col("_a"), k - 1)["_c"], F.lit(0)),
            )
        ).alias("_x")
    ).select(F.col("_x")[col].alias(col))
    # Exact pass: flag candidate rows via broadcast, group everything
    # else under a NULL key — exact candidate counts and the total n
    # come out of the SAME aggregate (the total is a window over the
    # ≤ k+1 aggregated rows, not a second scan).
    flagged = df.join(
        F.broadcast(candidates.withColumn("_cand", F.lit(True))), col, "left"
    )
    grouped = flagged.groupBy(
        F.when(F.col("_cand"), F.col(col)).alias(col)
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        grouped.withColumn(
            "_n", F.sum("n_rows").over(Window.partitionBy())
        )
        .where(F.col(col).isNotNull() & (F.col("n_rows") * k > F.col("_n")))
        .drop("_n")
    )


# --- Count-Min sketch (integer keys, engine-portable hashing) ---------------
#
# The second sketch family beside Misra-Gries: MG answers "which keys
# are frequent" (top-k, candidate superset); CM answers "how frequent
# is ANY key" (point estimates, overcount-only) in d·w counters. The
# hash family is EXPLICIT 2-universal modular hashing
# h_i(x) = ((a_i·x' + b_i) mod p) mod w with x' = x mod p and the
# Mersenne prime p = 2^31 − 1, so a SQL oracle can replay the sketch
# bit-for-bit (xxhash/md5-based hashing would be engine-private).
# Overflow-safe in 64-bit: (p−1)² < 2^62. Constants are fixed odd
# values < p (documented model state, like k-means seeds).

CM_P = 2_147_483_647  # 2^31 − 1
CM_PARAMS: tuple[tuple[int, int], ...] = (
    (1_000_003, 12_345),
    (19_999_999, 54_321),
    (262_147, 999_331),
    (104_729, 7_777_777),
)


def _cm_bucket(key, a: int, b: int, w: int):
    kp = F.pmod(key.cast("long"), F.lit(CM_P))
    return F.pmod(F.pmod(kp * F.lit(a) + F.lit(b), F.lit(CM_P)), F.lit(w))


def cm_sketch(df: DataFrame, col: str, w: int = 1024) -> DataFrame:
    """Build the d×w Count-Min counter table (row, bucket, c) over an
    integer key column: ONE scan — each input row explodes into its d
    (row, bucket) cells and a partially-aggregated count reduces them,
    so only d·w summary rows ever shuffle (the mergeability that makes
    CM a streaming/distributed-native structure). NULL keys are
    excluded (not a key, same convention as heavy_hitters)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cm_bucket(F.col(col), a, b, w).alias("bucket"),
            )
            for i, (a, b) in enumerate(CM_PARAMS)
        ]
    )
    return (
        df.select(col)
        .where(F.col(col).isNotNull())
        .select(F.explode(cells).alias("h"))
        .groupBy(F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cm_estimate(
    keys: DataFrame, col: str, sketch: DataFrame, w: int = 1024
) -> DataFrame:
    """Point estimates for every key in ``keys`` (one row per key):
    est = min over the d rows of the key's counter. The counter table
    is d·w rows at ANY corpus size, so the lookup join broadcasts and
    the keys side never shuffles for the join (one aggregate by key
    afterwards). Guarantee: est ≥ true count always (overcount-only);
    est ≤ true + εn w.h.p. with ε = e/w.

    The lookup is a LEFT join with absent cells counting 0 (ADVICE r6):
    a sparse sketch table omits never-touched (row, bucket) cells, so
    an inner join would silently drop a probe key whose cells are all
    empty and take the min over only the non-empty cells otherwise —
    violating the one-row-per-key contract AND the est ≥ true bound's
    tightness for unseen keys (whose true count is 0, so est must be
    allowed to BE 0). NULL probes are excluded, mirroring the build
    (NULL is not a key; its cells are NULL, not cells)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cm_bucket(F.col(col), a, b, w).alias("bucket"),
            )
            for i, (a, b) in enumerate(CM_PARAMS)
        ]
    )
    probes = (
        keys.select(col)
        .where(F.col(col).isNotNull())
        .select(col, F.explode(cells).alias("h"))
        .select(
            col,
            F.col("h.row").alias("row"),
            F.col("h.bucket").alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias(
                "cm_est"
            )
        )
    )


# --- DD-style log-bucket quantile sketch ------------------------------------
#
# The third sketch family: mergeable QUANTILES with bounded relative
# error (the DDSketch construction, Masson et al., VLDB'19 — public
# algorithm). A positive value v lands in bucket ceil(log_gamma(v));
# gamma = (1+alpha)/(1-alpha) guarantees every value in a bucket is
# within relative error alpha of the bucket's representative
# 2·gamma^i/(gamma+1). The sketch is a (bucket, count) histogram:
# counts ADD under merge (map-side combinable, micro-batch mergeable),
# state is bounded by the value RANGE, not the row count — values
# spanning 1e-6..1e12 at alpha=1% occupy ~2,100 buckets — so a global
# no-watermark streaming aggregation over it is bounded by
# construction, the cm_sketch contract. Engine-portable: the bucket
# rule is ln/ceil arithmetic any SQL engine replays.

DD_ALPHA = 0.01
DD_GAMMA = (1 + DD_ALPHA) / (1 - DD_ALPHA)
# non-positive values cannot be log-bucketed; they count under one
# sentinel bucket whose representative is 0.0 (sorted before every
# real bucket: gamma^i > 0 for all i)
DD_ZERO_BUCKET = -(2**31)


def dd_bucket_col(value, gamma: float = DD_GAMMA):
    """Bucket index for one value: ceil(ln(v)/ln(gamma)) for v > 0,
    the sentinel for v <= 0 (NULLs are excluded by the build, the
    cm_sketch convention)."""
    v = value.cast("double")
    return (
        F.when(v > 0, F.ceil(F.log(v) / F.lit(math.log(gamma))))
        .otherwise(F.lit(DD_ZERO_BUCKET))
        .cast("long")
    )


def dd_histogram(
    df: DataFrame, col: str, gamma: float = DD_GAMMA
) -> DataFrame:
    """Build the (bucket, c) histogram over a numeric column: ONE scan
    with map-side partial aggregation; only the ~range/log(gamma)
    bucket rows ever shuffle. Identical expression on batch and
    streaming frames (what the stream==batch test pins)."""
    return (
        df.select(col)
        .where(F.col(col).isNotNull())
        .select(dd_bucket_col(F.col(col), gamma).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dd_bucket_value(bucket: int, gamma: float = DD_GAMMA) -> float:
    """A bucket's representative value (within alpha of every member)."""
    if bucket == DD_ZERO_BUCKET:
        return 0.0
    return 2.0 * gamma**bucket / (gamma + 1.0)


def dd_quantiles(
    hist: list[tuple[int, int]], qs: list[float], gamma: float = DD_GAMMA
) -> list[float]:
    """Quantile estimates from a collected (bucket, count) histogram —
    model-sized driver arithmetic (the histogram is ~2k rows at ANY
    corpus size; collecting it is the centroid-table contract, never a
    corpus collect). For q, walk buckets ascending until the
    cumulative count exceeds q·(n-1); the bucket representative is
    within relative error alpha of the true q-quantile for q-quantiles
    that are positive values."""
    rows = sorted(hist)
    n = sum(c for _, c in rows)
    if n == 0:
        raise ValueError("dd_quantiles: empty histogram")
    out = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        rank = q * (n - 1)
        cum = 0
        val = dd_bucket_value(rows[-1][0], gamma)
        for b, c in rows:
            cum += c
            if cum > rank:
                val = dd_bucket_value(b, gamma)
                break
        out.append(val)
    return out


# --- theta sketch (hash-sampled distinct counting, engine-portable) ----------
#
# The fourth sketch family: DISTINCT COUNTS from a fixed-threshold
# hash sample (the fixed-theta special case of the Theta/KMV sketch
# family, Dasgupta et al., "Theta sketch framework"): keep exactly the
# distinct keys whose 60-bit md5 prefix falls below theta = 2^60 / 2^s;
# each survives with probability 2^-s independent of duplication, so
# |sample| * 2^s estimates the distinct count with relative error
# ~1/sqrt(|sample|). Three properties the HLL twin
# (approx_users_sketch_union) cannot give:
#
# - ENGINE-PORTABLE: md5-prefix-parse + integer compare is arithmetic
#   any SQL engine replays, so the registered query is HASH-backed
#   (HLL register internals are engine-private, rows-only forever);
# - the sample IS an artifact: a deterministic uniform sample of the
#   distinct keys themselves — auditable, joinable (inspect WHICH
#   users the estimate stands on), not just a count;
# - merge = set union of sampled keys (same theta) — per-partition /
#   per-day samples union without rescanning, the 100 TB point.
#
# State is |distinct| * 2^-s rows; deployments raise s to keep the
# artifact bounded (s ~ log2(distinct / target_sample_size) — the
# n_lists_for_corpus-style knob, documented rather than implicit).

THETA_LG_INV_P = 2  # p = 1/4 — sized for the driver's test SFs
_THETA_NIBBLES = 15  # 60-bit hash: fits signed bigint exactly


def theta_hash_col(key):
    """60-bit uniform hash of a key's string form (md5 prefix parsed
    base-16 — the simhash/minhash portability recipe)."""
    return F.conv(
        F.substring(F.md5(key.cast("string").cast("binary")), 1, _THETA_NIBBLES),
        16,
        10,
    ).cast("long")


def theta_threshold(lg_inv_p: int = THETA_LG_INV_P) -> int:
    if not 0 <= lg_inv_p < 60:
        raise ValueError(f"lg_inv_p={lg_inv_p} outside [0, 60)")
    return (16**_THETA_NIBBLES) >> lg_inv_p


def theta_sample(
    df: DataFrame,
    col: str,
    lg_inv_p: int = THETA_LG_INV_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group_cols..., h): the DISTINCT sampled hashes per group —
    filter pushes to the scan BEFORE the distinct, so the shuffle only
    ever carries the p-fraction. Identical expression on batch and
    micro-batch frames (the streaming maintenance MERGEs these rows by
    key; duplicates across batches collapse in the keyed sink)."""
    return (
        df.where(F.col(col).isNotNull())
        .select(*group_cols, theta_hash_col(F.col(col)).alias("h"))
        .where(F.col("h") < F.lit(theta_threshold(lg_inv_p)))
        .distinct()
    )


def theta_estimate_col(n_sampled, lg_inv_p: int = THETA_LG_INV_P):
    """distinct_est = |sample| * 2^s — exact integer arithmetic."""
    return (n_sampled.cast("long") * F.lit(1 << lg_inv_p)).cast("long")
