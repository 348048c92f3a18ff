"""[ext] Clustering queries over ``embeddings``: deterministic Lloyd's
k-means via the generic operator library
(``portfolio1_etl_spark.operators.clustering``).

The DuckDB oracle replays the IDENTICAL unrolled iterations (seed →
assign → update → assign → update → assign) — determinism comes from
the q83 recipe: 4 dp centroid means, 6 dp distances, centroid-id tie
break. See the operator module docstring for the scale shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.clustering import lloyd_kmeans
from portfolio1_etl_spark.operators.similarity import with_norms
from portfolio1_etl_spark.plans.registry import query

_K = 8
_ITERS = 3
_DIM = 64

_DIST2_SQL = (
    f"round(list_sum(list_transform(generate_series(1, {_DIM}), "
    "i -> (v.v[i] - c.cvec[i]) * (v.v[i] - c.cvec[i]))), 6)"
)


def _kmeans_sql() -> str:
    ctes = [
        "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        # seeds: the k smallest ids (matches the operator's computed
        # seed set — not an assumption of dense zero-based ids)
        f"cent0 AS (SELECT vec_id AS c_id, v AS cvec FROM vecs "
        f"WHERE vec_id IN (SELECT vec_id FROM vecs ORDER BY vec_id LIMIT {_K}))",
    ]
    for t in range(1, _ITERS + 1):
        ctes.append(
            f"""a{t} AS (
      SELECT vec_id, v, cell, d2 FROM (
        SELECT v.vec_id, v.v, c.c_id AS cell, {_DIST2_SQL} AS d2,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_DIST2_SQL} ASC, c.c_id ASC) AS rn
        FROM vecs v CROSS JOIN cent{t - 1} c
      ) WHERE rn = 1
    )"""
        )
        if t < _ITERS:
            ctes.append(
                f"""cent{t} AS (
      SELECT cell AS c_id, list(cx ORDER BY i) AS cvec FROM (
        SELECT cell, i, round(avg(x), 4) AS cx
        FROM (SELECT cell, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM a{t})
        GROUP BY cell, i
      ) GROUP BY cell
    )"""
            )
    last_a, last_c = f"a{_ITERS}", f"cent{_ITERS - 1}"
    ctes.append(
        f"""summary AS (
      SELECT cell, count(*) AS n_points, min(vec_id) AS min_vec_id,
             round(avg(d2), 4) AS avg_dist2
      FROM {last_a} GROUP BY cell
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT s.cell AS cluster_id, s.n_points, s.min_vec_id, s.avg_dist2,
           list_dot_product(c.cvec, c.cvec) AS centroid_norm2
    FROM summary s JOIN {last_c} c ON s.cell = c.c_id
    """


@query(
    "q93_kmeans",
    sql=_kmeans_sql(),
    operators=("X-cluster-kmeans", "X-sim-ivf"),
)
def q93_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 3 rounds, deterministic
    seeds): the codebook-training step an IVF index (q83) consumes.
    Per round the k-row codebook broadcasts, assignment is a narrow
    map + per-vector top-1 window, and the update shuffles at most
    k·dim rows per partition (map-side partial agg). Output is the
    per-cluster summary — size, deterministic representative, mean
    squared distance (4 dp), and the final centroid's exact
    sequential-fold norm² — chosen so every value is bitwise
    cross-engine-stable under the q83 rounding recipe."""
    vecs = with_norms(catalog.load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    assigned, cent = lloyd_kmeans(vecs, k=_K, iters=_ITERS)
    summary = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("vec_id").alias("min_vec_id"),
        F.round(F.avg("d2"), 4).alias("avg_dist2"),
    )
    norm2 = F.expr(
        "aggregate(zip_with(cvec, cvec, (a, b) -> a * b), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return summary.join(
        F.broadcast(cent), summary.cell == cent.c_id
    ).select(
        F.col("cell").alias("cluster_id"),
        "n_points",
        "min_vec_id",
        "avg_dist2",
        norm2.alias("centroid_norm2"),
    )
