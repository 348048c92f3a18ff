"""Persisted IVF ANN index — build/query separation over plain
parquet, with Spark-native partition pruning as the probe mechanism.

An ANN index in Spark terms is nothing exotic: centroids are a tiny
parquet table, and the corpus is a parquet dataset PARTITIONED BY
CELL. Querying then probes only the n_probe nearest cells per query —
and because the cell is a partition column joined against a small
probe table, Spark's dynamic partition pruning (DPP) drops the
unprobed partitions at the SCAN: a 1000-cell index at 100 TB reads
only the probed directories, no bespoke index format required. The
directory layout is also exactly what an incremental ingest appends
to (new vectors assign + append to their cell partition).

Build reuses the oracle-checked k-means machinery
(operators/clustering.py: folded-argmin assignment, sampled training,
checkpoint modes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.clustering import assign_cells, lloyd_kmeans
from portfolio1_etl_spark.operators.similarity import cosine


def build_ivf_index(
    vecs: DataFrame,
    path: str,
    k: int = 8,
    iters: int = 3,
    train_fraction: float | None = None,
    checkpoint_mode: str = "local",
) -> None:
    """Train a k-cell codebook on ``vecs`` (vec_id, v, nrm — from
    ``with_norms``) and persist the index:

    - ``{path}/centroids`` — the codebook (c_id, cvec), one tiny file;
    - ``{path}/vectors``   — (vec_id, v, nrm) partitioned by ``cell``.
    """
    assigned, cent = lloyd_kmeans(
        vecs, k=k, iters=iters, train_fraction=train_fraction,
        checkpoint_mode=checkpoint_mode,
    )
    cent.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    (
        assigned.select("vec_id", "v", "cell")
        .join(vecs.select("vec_id", "nrm"), "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/vectors")
    )


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    n_probe: int = 3,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` cosine neighbors per query (query_id, neighbor_id,
    sim, rank), scanning ONLY the ``n_probe`` nearest cells per query:
    the probe table (a few rows) joins the index on its PARTITION
    column, so DPP prunes every unprobed cell directory at the scan —
    plan-asserted in tests/test_ann_index.py. With n_probe = #cells
    the result equals the exact brute force (also asserted)."""
    cent = spark.read.parquet(f"{path}/centroids")
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    # per-query cell ranking: queries × centroids is tiny on both sides
    d2 = F.expr(
        "aggregate(zip_with(qv, cvec, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qv", "qnrm", "c_id", d2.alias("d2"))
        .withColumn(
            "prn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("d2", "c_id")
            ),
        )
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "qv", "qnrm", F.col("c_id").alias("cell"))
    )
    vectors = spark.read.parquet(f"{path}/vectors")
    cand = vectors.join(probes, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = cosine("qv", "v", "qnrm", "nrm")
    ranked = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim")
    ).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k)


def ingest_vectors(
    spark: SparkSession, path: str, new_vecs: DataFrame
) -> None:
    """Incremental index ingest: assign arriving vectors to their cell
    against the FROZEN persisted codebook (broadcast, narrow map) and
    APPEND them to their cell partitions — no rebuild, no touch of
    existing data. The standard IVF maintenance contract: cells drift
    as the distribution moves, recall degrades gracefully, and a
    periodic re-train + rewrite restores it; queries are oblivious
    either way."""
    cent = spark.read.parquet(f"{path}/centroids")
    assigned = assign_cells(new_vecs.select("vec_id", "v"), cent)
    (
        assigned.select("vec_id", "v", "cell")
        .join(new_vecs.select("vec_id", "nrm"), "vec_id")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path}/vectors")
    )
