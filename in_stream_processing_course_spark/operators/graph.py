"""Connected components over a pair table — the cluster-resolution
step that turns near-dup candidate PAIRS (dedup.py) into dedup GROUPS
("keep one doc per component"). The reference has no graph operators;
this is north-star design work (SURVEY §2.7).

Algorithm: iterative min-label propagation. Each node starts labeled
with itself; every round each node takes the min of its own label and
its neighbors' labels; converged when no label changes. Rounds needed
= graph diameter (near-dup clusters are shallow — almost always < 5).

Scale notes (100 TB):
- each round is ONE hash-shuffle join (edges x labels on node id) +
  one groupBy-min — both partial-aggregated map-side; no collect(),
  no driver-side graph;
- the convergence check is a cheap count() on the changed-label frame
  (an action per round, same pattern GraphX/GraphFrames uses);
- ``localCheckpoint`` truncates the lineage each round so the plan
  doesn't grow exponentially with iterations (classic iterative-Spark
  trap: round k otherwise re-derives rounds 1..k-1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable over undirected edges.

    Raises if not converged within ``max_iter`` rounds (diameter
    bound; dedup-cluster graphs converge in a handful).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.u == labels.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("_nbr_min", F.col("component"))
                ).alias("component"),
                (F.coalesce("_nbr_min", F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint()
        )
        changed = updated.where(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank in SCALED INTEGER arithmetic:
    rank(v)' = (100-d)%*scale + d% * sum_{u->v} (rank(u) div outdeg(u)),
    every division an integer `div`, every sum a BIGINT sum — so the
    result is bit-identical on any engine and any partitioning (a
    double formulation would make the groupBy sum order-dependent and
    un-oracle-able). rank/scale approximates the standard damped
    PageRank value to ~1e-6 per iteration; ranks stay < nodes*scale
    (mass conservation), far from 64-bit overflow for any realistic
    graph.

    Scale shape: out-degrees computed once; each iteration is one
    hash-join (edges x ranks on src) + one groupBy-sum — map-side
    partial aggregation both, no driver-side graph, no collect.
    ``localCheckpoint`` truncates lineage per round (same discipline as
    connected_components). Fixed iteration count (not convergence
    polling) keeps the plan a pure function of the input — which is
    also what makes the unrolled-CTE SQL oracle possible.
    """
    assert iterations >= 1 and 0 < damping_pct < 100
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e2 = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    base = ((100 - damping_pct) * scale) // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contribs = (
            e2.join(ranks, e2.src == ranks.node)
            .select(F.col("dst"), F.expr("rank div outdeg").alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                F.expr(
                    f"CAST({base} + ({damping_pct} * coalesce(_s, 0L)) div 100"
                    " AS BIGINT)"
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
