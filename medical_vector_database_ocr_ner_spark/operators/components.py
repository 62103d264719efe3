"""Connected components by iterative min-label propagation.

Turns near-duplicate candidate PAIRS (from minhash-LSH band collisions,
simhash buckets, or embedding LSH — operators/dedup.py) into duplicate
CLUSTERS: every document gets the minimum doc-id reachable through the
candidate graph as its cluster id, so "keep one per cluster" is a single
``row_number() == 1`` afterwards.

Algorithm: breadth-limited label propagation — each iteration every node
takes ``min(own label, min neighbor label)``; converges in O(graph
diameter) rounds. Near-dup graphs are unions of near-cliques (diameter
1-3), so 2-4 shuffle rounds in practice. Each round is two equi-joins +
one groupBy — all shuffles on the node id, AQE-coalesced; lineage is cut
with localCheckpoint so the plan does not grow with iterations. This is
the same large-graph strategy as GraphFrames'/Hash-to-Min CC, expressed
in pure DataFrame ops.

Driver-side work is one short-circuiting ``isEmpty()`` per round
(convergence probe — take(1) on the changed set), never a collect of the
data.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def connected_components(
    edges: "DataFrame",
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> "DataFrame":
    """Undirected connected components over an edge list.

    Returns (node, component) for every node appearing in ``edges``,
    component = min node id in the connected component. Deterministic.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        propagated = labels.join(
            neighbor_min, labels["node"] == F.col("node2"), "left"
        ).select(
            "node",
            F.least("component", F.coalesce("nbr_min", "component")).alias(
                "component"
            ),
            (F.coalesce("nbr_min", "component") < F.col("component")).alias(
                "_changed"
            ),
        )
        # pointer jumping (path compression): component ← label of the
        # component node — halves the remaining diameter every round, so
        # convergence is O(log d) rounds instead of O(d)
        parents = propagated.select(
            F.col("node").alias("pnode"), F.col("component").alias("pcomp")
        )
        updated = (
            propagated.join(
                parents, propagated["component"] == F.col("pnode"), "left"
            )
            .select(
                "node",
                F.least(
                    "component", F.coalesce("pcomp", "component")
                ).alias("component"),
                "_changed",
            )
            .localCheckpoint(eager=True)
        )
        # convergence probe: take(1) short-circuits on the first changed
        # row (the common case — a full count() scans every partition of
        # every round just to compare with 0)
        converged = updated.where("_changed").isEmpty()
        labels = updated.drop("_changed")
        if converged:
            break
    return labels


def duplicate_clusters(
    df: "DataFrame", pairs: "DataFrame", id_col: str, pair_a: str, pair_b: str
) -> "DataFrame":
    """(id, cluster) for EVERY row of df: docs joined by a candidate pair
    share a cluster; untouched docs are their own singleton cluster."""
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        df.select(F.col(id_col))
        .join(comp, df[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster"),
        )
    )
