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
