"""Distributed k-means over embedding columns (north-star X2 — the
clustering half of the SemDeDup recipe, and the index build the IVF
ANN family consumes).

Two halves with very different scale profiles, kept separate:

- **Assignment** (``assign_to_centroids``): the corpus-sized pass.
  Centroids are driver-held model state (k·dim doubles — kilobytes at
  any corpus scale), inlined as array literals, so assignment is pure
  per-row Column algebra: k sequential-fold squared distances + an
  argmin, all inside whole-stage codegen. NO join, NO shuffle, NO
  Python — the plan is scan → project, embarrassingly parallel at
  100 TB. (``ivf_topk`` does the same thing through pyspark.ml's
  KMeansModel.transform; this module is the dependency-free DataFrame
  form with an oracle-checkable distance rule.)

- **Fit** (``lloyd_fit``): Lloyd's iterations. Each round is one
  assignment projection plus one (cluster, dim)-keyed aggregation;
  only the k·dim centroid table ever reaches the driver. Iteration
  count is fixed and small (centroid quality converges long before
  corpus size grows), so the fit is a bounded number of corpus scans
  regardless of scale — the same contract as ``ivf_topk``'s sampled
  build, without the ml dependency.

Determinism contract (what lets tests pin the fit bit-for-bit under
``exact_fold=True``): every double fold is ordered. Distances fold
dims left-to-right (identical to the DuckDB oracle's ``list_reduce``),
per-dim means fold the cluster's values in SORTED order
(``F.aggregate(F.array_sort(...))``), ties in the argmin break to the
lowest centroid index (the (dist, index) struct sort is ascending on
both fields, so the head is the first minimum).
A pure-Python reference replaying the same folds reproduces the fit
exactly (tests/test_clustering.py). The DEFAULT update is a plain
``avg`` — bounded per-group aggregation state, order-dependent only in
the last ulp, irrelevant to cluster quality — because with k clusters
one aggregation group holds ~1/k of every embedding value, and a
``collect_list`` there is an unbounded in-memory array at corpus
scale (the sorted fold exists for model-sized pins only). ``lloyd_fit``
additionally bounds training to a deterministic md5-ordered sample,
the same bound ``similarity.ivf_topk`` puts on its index fit.

Reference parity: the reference engine has no clustering operator —
this extends the X2 similarity family (SURVEY.md §2.8) the way a
training-data curation pipeline needs it (SemDeDup: cluster, then
near-dup within cluster; ``plans.pipeline_queries.semantic_dedup_keep``
consumes exactly this block key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# the md5-ordered training-sample bound shared by lloyd_fit's default
# and the oracle replay in plans/clustering_queries (ADVICE r7: one
# constant, so the Spark fit and the DuckDB CTE chain cannot silently
# diverge on how many rows they train on)
DEFAULT_FIT_SAMPLE = 20_000


def _dlit_sql(x: float) -> str:
    """One double as exact SQL: repr() is the shortest round-trip
    decimal and CAST(string AS DOUBLE) is correctly rounded, so the
    parsed literal is bit-identical to F.lit(float(x)) — and Catalyst
    constant-folds the cast away before execution.

    Non-finite values are rejected loudly (ADVICE r9): repr() yields
    'inf'/'nan', which Spark's string→double cast does NOT parse (it
    wants 'Infinity'/'NaN'), so a diverged fit (e.g. a too-hot
    linear-probe lr) would otherwise surface as an obscure ANSI cast
    error at plan build — or a silent NULL non-ANSI — far from the
    actual bug."""
    v = float(x)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(
            f"_dlit_sql: non-finite model value {v!r} — the fit "
            "diverged or a centroid degenerated; refusing to inline "
            "it as a plan literal"
        )
    return f"CAST('{repr(v)}' AS DOUBLE)"


def _centroid_sql(vec: list[float]) -> str:
    """A centroid as an array<double> SQL literal (plan-time
    constant)."""
    return "array(" + ",".join(_dlit_sql(x) for x in vec) + ")"


def distances_col(vec_sql: str, centroids: list[list[float]]) -> Column:
    """array<double> of squared Euclidean distances from the vector
    expression ``vec_sql`` (a SQL snippet, e.g. a backquoted column
    name) to each centroid, in centroid order. Each distance is a
    left-to-right fold over dims (bit-identical to the oracle's
    list_reduce), built as ONE F.expr string: the Column-by-Column
    form cost k·dim py4j round-trips per call (~1k for k=16, dim=64 —
    seconds of driver latency per plan build at local scale), the
    exact construction trap the verify recipe documents. The parsed
    tree is the same zip_with/aggregate algebra as
    functions.vectors.sqdist_col, value-identical per element."""
    dists = ",".join(
        "aggregate(zip_with({v}, {c}, (x, y) ->"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))".format(
            v=vec_sql, c=_centroid_sql(c)
        )
        for c in centroids
    )
    return F.expr(f"array({dists})")


def assign_to_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist_col: str | None = "dist2",
) -> DataFrame:
    """Append the nearest-centroid index (0-based, ties → lowest
    index) and optionally the squared distance to it. Pure projection:
    works identically on a batch frame and under ``readStream`` (the
    deploy-time routing path — e.g. sharding arriving documents by
    semantic cluster).

    ``vec_col`` must name a TOP-LEVEL column (it is backtick-quoted
    into the distance SQL, so dotted strings are one literal
    identifier, not a nested-field path — ADVICE r9: the pre-r9
    ``F.col`` form resolved those; this documents the change).
    Backticks inside the name are escaped, not a parse break."""
    # internal scratch column — a caller column with this name would be
    # silently clobbered and dropped (same guard as sketches._RESERVED)
    if "_best" in df.columns:
        raise ValueError(
            "input column '_best' collides with the operator's "
            "internal argmin struct"
        )
    # argmin as the head of an array_sort over (dist, index) structs:
    # struct order is (d asc, c asc), so ties break to the LOWEST
    # centroid index — identical to the previous
    # array_position(dists, array_min(dists)) form, but the k-fold
    # distance array is referenced ONCE instead of three times (r9
    # perf: each reference was a full re-evaluation of the k
    # interpreted sqdist folds once Catalyst inlined the alias).
    dists = distances_col("`" + vec_col.replace("`", "``") + "`", centroids)
    idx = F.array(*[F.lit(i) for i in range(len(centroids))])
    best = F.array_sort(
        F.zip_with(dists, idx, lambda d, c: F.struct(d.alias("d"), c.alias("c")))
    )[0]
    out = df.withColumn("_best", best).withColumn(
        cluster_col, F.col("_best").getField("c").cast("int")
    )
    if dist_col is not None:
        out = out.withColumn(dist_col, F.col("_best").getField("d"))
    return out.drop("_best")


def seed_centroids(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic init: the vectors of the k smallest ids (a k-row
    TakeOrderedAndProject, never a full sort). Content-addressed and
    engine-portable — the oracle can name the same k rows."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def per_dim_means(
    assigned: DataFrame,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    exact_fold: bool = False,
) -> DataFrame:
    """(cluster, dim, mean_v) — the aggregation behind one Lloyd's
    update, exposed so tests can pin its PLAN shape.

    Default (``exact_fold=False``, the 100 TB path): ``F.avg`` — a
    partially-aggregated hash aggregate whose per-group state is ONE
    (sum, count) pair, so no aggregation buffer ever holds a cluster's
    values (with k=8 one cluster is ~1/8 of the corpus — a
    ``collect_list`` there is the unbounded-group anti-pattern SURVEY
    §7 warns about). The mean is order-dependent in the last ulp,
    irrelevant to cluster quality.

    ``exact_fold=True``: sorted-order fold (collect the group, sort,
    left-fold) — partitioning-INVARIANT, what lets tests replay the
    fit bit-for-bit in pure Python. Only for model-sized inputs
    (tests, tiny SFs): it materializes each (cluster, dim) group in
    one aggregation buffer."""
    mean_v = (
        (
            F.aggregate(
                F.array_sort(F.collect_list(F.col("v").cast("double"))),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count(F.lit(1))
        )
        if exact_fold
        else F.avg(F.col("v").cast("double"))
    )
    return (
        assigned.select(cluster_col, F.posexplode(vec_col).alias("dim", "v"))
        .groupBy(cluster_col, "dim")
        .agg(mean_v.alias("mean_v"))
    )


def update_centroids(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    exact_fold: bool = False,
) -> list[list[float]]:
    """One Lloyd's update: per-(cluster, dim) mean via posexplode →
    aggregate → k·dim rows to the driver. Empty clusters keep their
    previous centroid (the standard fixed-k convention). The default
    mean is a plain bounded-state ``avg`` (scale-safe); pass
    ``exact_fold=True`` for the sorted partitioning-invariant fold —
    see :func:`per_dim_means` for the trade-off."""
    per_dim = per_dim_means(
        assigned, vec_col=vec_col, cluster_col=cluster_col,
        exact_fold=exact_fold,
    ).collect()
    out = [list(c) for c in centroids]
    for r in per_dim:
        out[r[cluster_col]][r["dim"]] = float(r["mean_v"])
    return out


def save_centroids(
    spark, centroids: list[list[float]], path: str
) -> None:
    """Persist a fitted centroid table (cluster, centroid) — the same
    train-once / score-continuously artifact contract as
    streaming/lm_gate.py's model and streaming/drift.py's profile. The
    table is k rows at any corpus scale."""
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> list[list[float]]:
    rows = spark.read.parquet(path).orderBy("cluster").collect()
    # a hard error, not an assert: under python -O a sparse index would
    # silently shift every positional cluster id
    if [r["cluster"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"centroid table at {path} must be a dense 0..k-1 index; "
            f"got {[r['cluster'] for r in rows]}"
        )
    return [[float(x) for x in r["centroid"]] for r in rows]


def lloyd_fit(
    df: DataFrame,
    k: int,
    n_iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_fold: bool = False,
    fit_sample: int | None = DEFAULT_FIT_SAMPLE,
) -> list[list[float]]:
    """Fixed-iteration Lloyd's: seed from the k smallest ids, then
    ``n_iters`` rounds of assign → update. Returns the final centroid
    list (driver-sized model state, like the persisted LM of
    ``streaming/lm_gate.py`` — persist it and ``assign_to_centroids``
    is the deploy-time scorer).

    The fit trains on at most ``fit_sample`` vectors, picked
    content-addressed (order by md5(id) — a deterministic
    pseudo-random TakeOrderedAndProject, the same bound
    ``similarity.ivf_topk`` puts on its index fit): centroid QUALITY
    converges on a sample long before corpus size grows, so the
    n_iters corpus scans become n_iters bounded-sample scans at
    100 TB. ``fit_sample=None`` fits on everything. When the input has
    <= fit_sample rows the sample IS the input, so tiny-SF tests are
    unaffected. ``exact_fold`` selects the partitioning-invariant
    update (see :func:`per_dim_means`)."""
    fit_set = df.select(id_col, vec_col)
    if fit_sample is not None:
        fit_set = fit_set.orderBy(
            F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
        ).limit(fit_sample)
        # truncate the sort lineage: every round would otherwise re-run
        # the TakeOrderedAndProject under its scan
        fit_set = fit_set.localCheckpoint()
    centroids = seed_centroids(fit_set, k, id_col=id_col, vec_col=vec_col)
    for _ in range(n_iters):
        assigned = assign_to_centroids(
            fit_set.select(vec_col), centroids, vec_col=vec_col,
            dist_col=None,
        )
        centroids = update_centroids(
            assigned, centroids, vec_col=vec_col, exact_fold=exact_fold
        )
    return centroids


def linear_probe_fit(
    fit: DataFrame,
    dim: int,
    n_iters: int,
    lr: float,
    y_col: str = "_y",
    feat_col: str = "_x",
) -> list[float]:
    """Distributed full-batch gradient descent for a least-squares
    LINEAR PROBE (the standard "can a linear map read this signal out
    of the embeddings?" diagnostic a curation pipeline runs before
    spending GPU time): ``n_iters`` rounds of
    w += lr * Xᵀ(y - Xw) / n from w = 0, returning the final weight
    vector. ``fit`` must already carry a double label column ``y_col``
    and an array<double> feature column ``feat_col`` of length ``dim``
    (callers append a bias term themselves) and should be materialized
    (localCheckpoint) — every round re-scans it.

    Engine-portable by the same contract as ``lloyd_fit`` /
    the power-iteration replay in plans/similarity_queries.py:
    per-row residuals are ordered dim folds (zip_with == DuckDB
    list_transform + list_reduce), every cross-ROW gradient sum is a
    FIXED-POINT integer sum (round to 1e-9 units → bigint; integer
    addition is order-invariant with one long of per-(dim) state —
    never a corpus-sized collect_list buffer), and the driver-side
    weight update uses only correctly-rounded IEEE ops (Python doubles
    == DuckDB doubles), so a SQL oracle replays the whole loop
    bit-for-bit as chained CTEs. Headroom: the bigint gradient cell
    overflows at ~9.2e18 nano-units ≈ 9.2e9 of summed |residual·x|
    per dim — residuals are O(1) and unit-normalized features are
    O(0.1), so that is ~1e11 rows per dim; shard the fit sample (the
    md5-ordered bound callers already apply) long before that.

    Scale: per round ONE job over the bounded fit set — a scan, a
    posexplode to (dim, value), a 64-ish-group integer aggregation,
    and a dim-sized collect; only ``dim`` doubles cross the driver per
    round, exactly the k·dim contract of ``lloyd_fit``."""
    n = float(fit.count())
    if n == 0:
        raise ValueError("linear_probe_fit: empty fit set")
    w = [0.0] * dim
    for _ in range(n_iters):
        w_lit = F.array(*[F.lit(float(x)) for x in w])
        resid = F.col(y_col) - F.aggregate(
            F.zip_with(F.col(feat_col), w_lit, lambda x, v: x * v),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        rows = (
            fit.select(resid.alias("_r"), F.posexplode(feat_col).alias("dim", "v"))
            .groupBy("dim")
            .agg(
                F.sum(
                    F.round(F.col("_r") * F.col("v") * F.lit(1e9), 0).cast(
                        "bigint"
                    )
                ).alias("gsum")
            )
            .collect()
        )
        g = {r["dim"]: int(r["gsum"]) for r in rows}
        w = [w[d] + lr * ((g.get(d, 0) / 1e9) / n) for d in range(dim)]
    return w


# --- policy-sized seed-centroid cells (VERDICT r10 next-round #1) ------------

# the fixed-order squared-distance fold as DuckDB SQL — the SAME fold
# assign_to_centroids computes (zip_with/aggregate == list_transform/
# list_reduce, both left-to-right over dims), duplicated as ONE shared
# literal so the four policy-blocked queries and their oracles cannot
# drift on the distance rule
SQL_SQDIST = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, len({a})),"
    " i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))),"
    " (acc, x) -> acc + x)"
)


def policy_cell_assignment(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    max_rows_per_cell: int | None = None,
    floor: int = 16,
) -> DataFrame:
    """Append a POLICY-SIZED seed-centroid cell id — the block key the
    within-block-quadratic dedup family must use instead of any
    fixed-cardinality column (label, k=8 seeds).

    Why: a block key whose cardinality does NOT grow with the corpus
    makes within-block pair work quadratic in corpus size — the r10
    sf0.1→sf1 trend measured ×19–21 wall on ×10 data for exactly the
    label-blocked and fixed-k forms (SCALE_TREND_r10_sf1.txt). This
    helper derives k = n_lists_for_corpus(count) = max(√n, n/cap)
    (operators/similarity.py:63), so expected cell population is
    capped and total pair work stays ~linear: the same workload scaled
    ×3.2 on ×10 data under the policy (tools/policy_scale_demo.py).

    Cost: one count job + a k-row TakeOrderedAndProject at plan build,
    then assignment is the shuffle-free inlined-literal projection of
    :func:`assign_to_centroids`. That inlining carries k·dim doubles
    in the plan — fine through k ~ thousands (sf1 → k=141); a
    deployment past ~1e8 rows (k > ~12k) assigns via
    :func:`assign_via_broadcast` (the centroid list as a broadcast
    TABLE, value-identical argmin, pinned equal by
    tests/test_clustering.py) — the policy arithmetic is identical,
    only the physical assignment changes.

    Engine-portable: :func:`sql_policy_cells` replays k-derivation,
    seeding, and assignment in DuckDB SQL, so oracles hash-check the
    policy itself (k is derived from count(*) on BOTH engines, never a
    constant that silently fits only the test SF)."""
    from .similarity import DEFAULT_MAX_ROWS_PER_CELL, n_lists_for_corpus

    cap = (
        DEFAULT_MAX_ROWS_PER_CELL
        if max_rows_per_cell is None
        else max_rows_per_cell
    )
    k = n_lists_for_corpus(df.count(), cap, floor)
    cents = seed_centroids(df, k, id_col=id_col, vec_col=vec_col)
    return assign_to_centroids(
        df, cents, vec_col=vec_col, cluster_col=cluster_col, dist_col=None
    )


def sql_policy_k(
    table: str = "embeddings",
    max_rows_per_cell: int | None = None,
    floor: int = 16,
    prefix: str = "pc",
) -> str:
    """Just the k-derivation CTE (``{prefix}_kval``, one column ``k``)
    — n_lists_for_corpus(count(*)) in SQL, shared by every oracle that
    replays the policy (the cell-blocked dedup family via
    :func:`sql_policy_cells`, the IVF ``n_lists="auto"`` replay). See
    :func:`sql_policy_cells` for the exactness argument."""
    from .similarity import DEFAULT_MAX_ROWS_PER_CELL

    cap = (
        DEFAULT_MAX_ROWS_PER_CELL
        if max_rows_per_cell is None
        else max_rows_per_cell
    )
    return f"""{prefix}_kval AS (
  SELECT greatest(1, least(n, greatest({floor},
         CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT),
         (n + {cap - 1}) // {cap}))) AS k
  FROM (SELECT count(*) AS n FROM {table})
)"""


def sql_policy_cells(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows_per_cell: int | None = None,
    floor: int = 16,
    prefix: str = "pc",
) -> str:
    """The DuckDB replay of :func:`policy_cell_assignment` as a CTE
    chain (``{prefix}_kval``, ``{prefix}_cent``, ``{prefix}_cells``) —
    splice after WITH. ``{prefix}_cells`` is (id_col, cluster).

    Exactness notes (why this hash-matches the Spark side):

    - k: ``floor(sqrt(CAST(n AS DOUBLE)))`` equals Python's
      ``math.isqrt(n)`` for any table-sized n (IEEE sqrt is correctly
      rounded; the nearest double to √n crosses an integer only within
      ~n·2⁻⁵² of a perfect square, impossible for integer n < 2⁵²),
      and the cap term is integer ceil division ``(n + cap-1) // cap``
      — exact for ANY cap, not just powers of two (r12; the earlier
      float form ``ceil(n / cap.0)`` was exact only for power-of-two
      caps).
    - seeding: rank-by-id == the k smallest ids (seed_centroids).
    - assignment: SQL_SQDIST is the same left-to-right fold as
      assign_to_centroids' zip_with/aggregate; ties rank (d ASC,
      cidx ASC) == the struct-sort argmin's lowest-index tie-break."""
    sq = SQL_SQDIST.format(a=f"e.{vec_col}", b=f"{prefix}_cent.c")
    return f"""{sql_policy_k(table, max_rows_per_cell, floor, prefix)},
{prefix}_cent AS (
  SELECT cidx, c FROM (
    SELECT CAST(row_number() OVER (ORDER BY {id_col}) - 1 AS BIGINT) AS cidx,
           {vec_col} AS c
    FROM {table})
  WHERE cidx < (SELECT k FROM {prefix}_kval)
),
{prefix}_cells AS (
  SELECT {id_col}, CAST(cidx AS INT) AS cluster FROM (
    SELECT e.{id_col}, {prefix}_cent.cidx,
           row_number() OVER (PARTITION BY e.{id_col}
                              ORDER BY {sq} ASC, {prefix}_cent.cidx ASC) AS rn
    FROM {table} e CROSS JOIN {prefix}_cent)
  WHERE rn = 1
)"""


def _py_sqdist(u: list[float], v: list[float]) -> float:
    """Squared Euclidean distance as the SAME ordered fold the engine
    and the oracle use (SQL_SQDIST / distances_col: 0.0 init, dims
    left-to-right, (a-b)*(a-b) per dim) — IEEE-double-identical to
    both, which is what lets :func:`two_level_assign` compute the
    fine→coarse grouping driver-side and still hash-match a DuckDB
    replay that re-derives it in SQL."""
    acc = 0.0
    for a, b in zip(u, v):
        d = float(a) - float(b)
        acc += d * d
    return acc


def _argmin_sql(
    vec_sql: str, centroids: list[list[float]], indices: list[int]
) -> str:
    """SQL snippet: the index (from ``indices``) of the nearest
    centroid among the given subset — the array_sort-over-(d, c)
    structs argmin of :func:`assign_to_centroids`, restricted to a
    subset while returning ORIGINAL indices. One F.expr-able string
    (no per-centroid py4j round-trips; see :func:`distances_col`)."""
    dists = ",".join(
        "aggregate(zip_with({v}, {c}, (x, y) ->"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))".format(
            v=vec_sql, c=_centroid_sql(centroids[i])
        )
        for i in indices
    )
    idx = ",".join(str(i) for i in indices)
    return (
        f"array_sort(zip_with(array({dists}), array({idx}),"
        " (x, y) -> struct(x, y)))[0].y"
    )


def two_level_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    n_coarse: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment through a COARSE QUANTIZER (the
    IMI/FAISS two-level trick, VERDICT r11 next-round #2): instead of
    scoring every row against all k centroids (n·k·d — with the
    policy's k≈√n that is the n^1.5·d index-build term the sf1 gate
    measured at ×13.5–15.2 on ×10 data), route each row through
    √k coarse anchors, then score only the fine centroids whose
    nearest anchor matches — n·(√k + k/√k)·d ≈ n·2√k·d expected work,
    exponent 1.25 instead of 1.5 under k=√n.

    Mechanics (everything an ordered fold a SQL oracle replays —
    :func:`sql_two_level_cells`):

    - coarse anchors = the first ``n_coarse`` (default isqrt(k)) FINE
      centroids — no second fit; the fine centroids are already a
      spread summary of the data, and reusing their prefix keeps the
      model fully determined by the one Lloyd fit;
    - fine→coarse grouping: each fine centroid joins its nearest
      anchor (driver-side Python over the model — k·√k·d on kilobytes;
      :func:`_py_sqdist` is fold-order-identical to SQL_SQDIST, so the
      oracle re-derives the SAME grouping in SQL);
    - row assignment: one argmin over the √k anchors, then a CASE
      branch per coarse group running the argmin over that group's
      fine centroids only — codegen evaluates exactly one branch per
      row, so per-row work is √k + |group| distances, while the plan
      still carries all k·dim literals (same plan-size envelope as
      :func:`assign_to_centroids`; the broadcast-table form remains
      the documented path past k ~ 12k).

    APPROXIMATE by design, like every coarse quantizer: a row whose
    true nearest fine centroid sits in a different coarse group gets
    its within-group best instead. That is the standard IVF
    build-time trade (cell boundaries move slightly; recall is
    recovered by n_probe at serve time), and the oracle replays the
    identical rule, so the approximation itself is inside the hash
    check. Empty coarse groups (possible only from duplicate anchors)
    are unreachable: a row ties duplicate anchors to the lowest
    index, which is exactly where the duplicated fine centroids
    grouped."""
    import math

    if n_coarse is not None and n_coarse < 1:
        raise ValueError(
            f"n_coarse must be >= 1 (got {n_coarse}); pass None to "
            "use the isqrt(k) default"
        )
    k = len(centroids)
    kc = max(1, math.isqrt(k)) if n_coarse is None else n_coarse
    if kc >= k:
        return assign_to_centroids(
            df, centroids, vec_col=vec_col,
            cluster_col=cluster_col, dist_col=None,
        )
    if "_coarse" in df.columns:
        raise ValueError(
            "input column '_coarse' collides with the operator's "
            "internal coarse-cell scratch"
        )
    anchors = centroids[:kc]
    groups: list[list[int]] = [[] for _ in range(kc)]
    for ci, cvec in enumerate(centroids):
        best_g, best_d = 0, None
        for g, avec in enumerate(anchors):
            dsq = _py_sqdist(cvec, avec)
            if best_d is None or dsq < best_d:
                best_g, best_d = g, dsq
        groups[best_g].append(ci)
    vec_sql = "`" + vec_col.replace("`", "``") + "`"
    coarse_sql = _argmin_sql(vec_sql, anchors, list(range(kc)))
    branches = " ".join(
        f"WHEN {g} THEN ({_argmin_sql(vec_sql, centroids, members)})"
        for g, members in enumerate(groups)
        if members
    )
    fine_sql = f"CAST((CASE _coarse {branches} END) AS INT)"
    return (
        df.withColumn("_coarse", F.expr(coarse_sql))
        .withColumn(cluster_col, F.expr(fine_sql))
        .drop("_coarse")
    )


def sql_two_level_cells(
    src: str,
    cent: str,
    kc: str | int,
    out: str = "cells",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay of :func:`two_level_assign` as a CTE chain
    (``{out}_anchor_of`` fine→coarse, ``{out}_coarse`` row→anchor,
    ``{out}`` row→fine cell (id_col, cell)) — splice after the
    centroid CTE. ``src`` must expose (id_col, vec_col); ``cent`` is
    the fine-centroid CTE (cidx, cv) — e.g. _kmeans_rounds_cte's
    ``centv{N}``; ``kc`` a SQL scalar or int literal for the anchor
    count. The anchor subset is ``cidx < kc``, the grouping and both
    argmins use the same ordered fold + lowest-index tie rule as the
    Spark side, so the two-level approximation replays bit-for-bit."""
    d_fc = SQL_SQDIST.format(a="f.cv", b="a.cv")
    d_rc = SQL_SQDIST.format(a=f"s.{vec_col}", b="a.cv")
    d_rf = SQL_SQDIST.format(a=f"s.{vec_col}", b="f.cv")
    return f"""{out}_anchor_of AS (
  SELECT cidx, anchor FROM (
    SELECT f.cidx, a.cidx AS anchor,
           row_number() OVER (PARTITION BY f.cidx
                              ORDER BY {d_fc} ASC, a.cidx ASC) AS rn
    FROM {cent} f CROSS JOIN (SELECT cidx, cv FROM {cent}
                              WHERE cidx < {kc}) a)
  WHERE rn = 1
),
{out}_coarse AS (
  SELECT {id_col}, anchor FROM (
    SELECT s.{id_col}, a.cidx AS anchor,
           row_number() OVER (PARTITION BY s.{id_col}
                              ORDER BY {d_rc} ASC, a.cidx ASC) AS rn
    FROM {src} s CROSS JOIN (SELECT cidx, cv FROM {cent}
                             WHERE cidx < {kc}) a)
  WHERE rn = 1
),
{out} AS (
  SELECT {id_col}, cell FROM (
    SELECT s.{id_col}, f.cidx AS cell,
           row_number() OVER (PARTITION BY s.{id_col}
                              ORDER BY {d_rf} ASC, f.cidx ASC) AS rn
    FROM {src} s
    JOIN {out}_coarse rc USING ({id_col})
    JOIN {out}_anchor_of ao ON ao.anchor = rc.anchor
    JOIN {cent} f ON f.cidx = ao.cidx)
  WHERE rn = 1
)"""


def centroids_df(spark, centroids: list[list[float]]):
    """The model as a (cidx int, cv array<double>) DataFrame — the
    broadcastable-table form of the centroid list, for
    :func:`assign_via_broadcast`."""
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cidx int, cv array<double>",
    )


def assign_via_broadcast(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment against a BROADCAST centroid TABLE
    — the form :func:`policy_cell_assignment`'s docstring prescribes
    past k ≈ 12k, where inlining k·dim literals into the plan stops
    being reasonable (plan size, codegen limits). Value-identical to
    :func:`assign_to_centroids` (r12, pinned by
    tests/test_clustering.py): the per-pair distance is the same
    ordered fold (functions.vectors.sqdist_col == distances_col's
    per-centroid aggregate), and the argmin is ``min(struct(d, cidx))``
    — struct order (d asc, cidx asc), so ties break to the lowest
    centroid index exactly like the literal form's struct sort.

    100 TB shape: a keyless broadcast join (plans as
    BroadcastNestedLoopJoin — every row pairs with the whole
    broadcast model table; centroids are model-sized, k·dim doubles,
    megabytes at k=100k·d=64) fans each row out to k scored rows, the
    partial hash aggregate collapses them back to one row per id
    MAP-SIDE (all k rows for an id are produced in the same input
    partition, so the shuffle carries n rows, not n·k), then one
    broadcast-shaped equi-join re-attaches the winner to the input
    row. Versus the literal form it trades one shuffle + join for an
    unbounded k; use the literal form while k is thousands (zero
    shuffle), this one beyond.

    Contract: ``id_col`` must be UNIQUE in ``df`` — the winner is
    computed per id and re-joined, so duplicate ids would collapse
    through the groupBy and fan back out on the re-join instead of
    keeping per-row semantics; and ``centroids`` must be non-empty
    (checked here, loudly, matching the literal form's k>=1 failure
    — an empty model would otherwise inner-join everything away and
    silently return zero rows)."""
    if "_best" in df.columns or "_d" in df.columns:
        raise ValueError(
            "input columns '_best'/'_d' collide with the operator's "
            "internal scratch"
        )
    if centroids.isEmpty():
        raise ValueError(
            "centroids DataFrame is empty — nearest-centroid "
            "assignment needs k >= 1 (the literal "
            "assign_to_centroids fails loudly here too)"
        )
    from ..functions.vectors import sqdist_col

    scored = df.select(id_col, vec_col).join(F.broadcast(centroids))
    best = (
        scored.withColumn(
            "_d", sqdist_col(F.col(vec_col), F.col("cv"))
        )
        .groupBy(id_col)
        .agg(F.min(F.struct(F.col("_d"), F.col("cidx"))).alias("_best"))
        .select(
            id_col,
            F.col("_best.cidx").cast("int").alias(cluster_col),
        )
    )
    return df.join(best, id_col)
