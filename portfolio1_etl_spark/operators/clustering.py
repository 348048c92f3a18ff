"""Clustering operator library: deterministic distributed Lloyd's
k-means over an embedding column — the "train the codebook" step that
IVF indexing (plans/similarity_ops.q83) stands in for with per-label
means.

Scale shape per iteration: the codebook (k rows) is BROADCAST, the
assignment is a narrow map over the corpus (cross join against k
broadcast rows + a per-vector top-1 window keyed by vec_id — no
corpus shuffle beyond the window's hash partition on vec_id), and the
update is one explode + groupBy (cell, dim) aggregate whose map-side
partial aggregation caps shuffle traffic at k·dim rows per partition.
Centroids are localCheckpoint-ed each round (k·dim values — tiny) so
the unrolled lineage never re-executes earlier rounds.

Determinism (the q83 recipe): centroid components round to 4 dp
(per-dimension mean order differs across engines at ~1e-16) and
squared distances round to 6 dp before the argmin ranks on
(distance, centroid id) — assignments are bitwise-reproducible and a
DuckDB oracle replays the identical iterations. Seeding is
deterministic by construction (caller-supplied predicate, default the
k smallest vec_ids); real pipelines would seed with k-means|| — the
iteration shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

#: Squared L2 distance between the vector column `v` and the broadcast
#: centroid column `cvec`, rounded to 6 dp for cross-engine ranking.
DIST2 = (
    "round(aggregate(zip_with(v, cvec, (a, b) -> (a - b) * (a - b)), "
    "cast(0.0 as double), (acc, x) -> acc + x), 6)"
)


def assign_cells(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, v, cell, d2): nearest centroid per vector; ties break
    on centroid id. ``cent`` is (c_id, cvec) and is broadcast."""
    dist2 = F.expr(DIST2)
    rn_w = W.partitionBy("vec_id").orderBy(dist2.asc(), F.col("c_id").asc())
    return (
        vecs.select("vec_id", "v")
        .crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(rn_w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("c_id").alias("cell"), dist2.alias("d2"))
    )


def update_centroids(assigned: DataFrame) -> DataFrame:
    """(c_id, cvec): per-cell, per-dimension mean (4 dp), reassembled
    in dimension order. Cells that lost every point disappear."""
    return (
        assigned.select("cell", F.posexplode("v").alias("i", "x"))
        .groupBy("cell", "i")
        .agg(F.round(F.avg("x"), 4).alias("cx"))
        .groupBy("cell")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, cx))), s -> s.cx)"
            ).alias("cvec")
        )
        .select(F.col("cell").alias("c_id"), "cvec")
    )


def lloyd_kmeans(
    vecs: DataFrame, k: int = 8, iters: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd rounds from the deterministic seed set (the
    k smallest vec_ids — computed, not assumed: id spaces need not be
    dense or zero-based) and return ``(assigned, cent)``: the FINAL
    assignment (vec_id, v, cell, d2) against the last-updated codebook,
    and that codebook (c_id, cvec)."""
    seed_ids = vecs.select("vec_id").orderBy("vec_id").limit(k)
    cent = vecs.join(F.broadcast(seed_ids), "vec_id", "left_semi").select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cvec")
    )
    assigned = assign_cells(vecs, cent)
    for _ in range(iters - 1):
        cent = update_centroids(assigned).localCheckpoint(eager=True)
        assigned = assign_cells(vecs, cent)
    return assigned, cent
