"""Graph operator library: weighted PageRank over an edge DataFrame.

Together with ``dedup.connected_components`` this is the iterative-
graph surface: CC contracts undirected similarity graphs; PageRank
scores directed weighted ones (link/influence analysis over entity
graphs derived from relational data — see ``plans/graph_ops``).

Scale shape per iteration: one join of the rank vector onto the edge
list (equi-join on the source key) + one grouped sum on the
destination — two shuffles, both on uniform entity keys; the rank
vector is localCheckpoint-ed per round so the unrolled lineage never
replays earlier rounds. O(iters) rounds with no driver-side data
movement (ranks stay distributed; only the loop counter lives on the
driver).

Determinism: contribution sums are floating-point and engine fold
order differs at ~1e-16, so ranks round to 10 dp per iteration (the
q83/q93 recipe) — the DuckDB oracle replays identical unrolled
iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_weights(edges: DataFrame) -> DataFrame:
    """(src, outw): total outgoing edge weight per source node."""
    return edges.groupBy("src").agg(F.sum("w").alias("outw"))


def pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """(node, rank): weighted PageRank after ``iters`` synchronous
    rounds from a uniform start. ``edges`` is (src, dst, w). Nodes are
    the union of sources and destinations; dangling nodes (no
    out-edges) keep receiving but leak their mass — acceptable for
    ranking, documented, and identical in the oracle."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("rank")
        )  # empty graph → empty ranks, schema intact
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n_nodes), 10).alias("rank")
    )
    ow = out_weights(edges)
    contrib_edges = (
        edges.join(ow, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("share"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        contribs = (
            contrib_edges.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)),
                    10,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
