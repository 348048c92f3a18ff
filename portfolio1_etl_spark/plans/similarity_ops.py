"""[ext] Similarity search over the ``embeddings`` table (SURVEY.md
§2.13): brute-force cosine top-k as the exact baseline, plus two
scale paths — label-blocked threshold joins and sign-bit LSH
bucketing (bit-sampling ANN).

Numerics: vectors are cast float→double element-wise, dot products are
sequential folds (``aggregate(zip_with(...))``) — bitwise identical to
DuckDB's ``list_dot_product`` over DOUBLE[] (verified empirically), so
similarities compare exactly with no rounding.

Scale notes: the query side of a top-k search is broadcast (queries ≪
corpus); the corpus side streams. The LSH variant turns the cross
product into an equi-join on bucket signature — the 100 TB path where
even a broadcast cross-product is too wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.plans.registry import query

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, v double[], nrm) with precomputed L2 norm."""
    e = catalog.load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("nrm", F.expr("sqrt(" + _DOT.format(a="v", b="v") + ")"))


_VECTORS_SQL = """
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
"""


@query(
    "q80_cosine_topk",
    sql=f"""
    WITH vecs AS ({_VECTORS_SQL}),
    q AS (SELECT * FROM vecs WHERE vec_id < 8),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS sim
      FROM q JOIN vecs c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    ) WHERE rank <= 5
    """,
    operators=("X-sim-topk",),
)
def q80_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN baseline: brute-force cosine of a small query set
    (broadcast) against the whole corpus, top-5 per query via a ranking
    window. This is the correctness reference for the ANN variants —
    at scale the corpus side stays partitioned and only per-partition
    top-k survives to the final shuffle."""
    vecs = _vectors(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    sims = (
        vecs.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.expr(_DOT.format(a="qv", b="v")) / (F.col("qnrm") * F.col("nrm"))
            ).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


@query(
    "q81_threshold_pairs_blocked",
    sql=f"""
    WITH vecs AS ({_VECTORS_SQL})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
    FROM vecs a JOIN vecs b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35
    """,
    operators=("X-sim-threshold", "J2"),
)
def q81_threshold_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold, blocked
    by label — the blocking key turns an all-pairs O(n²) into
    per-block joins (the same trick as partition-level dedup in corpus
    pipelines; with no natural key, q82's LSH bucket plays this role)."""
    vecs = _vectors(spark, sf_dir)
    a = vecs.alias("a")
    b = vecs.alias("b")
    sim = F.expr(_DOT.format(a="a.v", b="b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= 0.35)
    )


_BUCKET_SPARK = (
    "concat_ws('', transform(slice({v}, 1, 8), x -> if(x >= 0.0d, '1', '0')))"
)
_BUCKET_SQL = (
    "list_aggregate(list_transform(v[1:8], x -> CASE WHEN x >= 0.0 THEN '1' ELSE '0' END), 'string_agg', '')"
)


@query(
    "q82_lsh_ann",
    sql=f"""
    WITH vecs AS ({_VECTORS_SQL}),
    bucketed AS (SELECT vec_id, v, nrm, {_BUCKET_SQL} AS bucket FROM vecs),
    q AS (SELECT * FROM bucketed WHERE vec_id < 8),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS sim
      FROM q JOIN bucketed c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, bucket, sim, rank FROM (
      SELECT query_id, neighbor_id, bucket, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    ) WHERE rank <= 3
    """,
    operators=("X-sim-lsh",),
)
def q82_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via bit-sampling LSH: the bucket is the sign
    pattern of the first 8 dimensions; candidates come only from the
    query's bucket (equi-join on the signature — the O(n²) cross
    product never materializes). Exact cosine re-ranks within the
    bucket. Trades recall for a pure equi-join shape that scales to
    any corpus size; more planes / multi-probe raise recall."""
    vecs = _vectors(spark, sf_dir)
    bucketed = vecs.withColumn("bucket", F.expr(_BUCKET_SPARK.format(v="v")))
    q = bucketed.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    sims = (
        bucketed.join(
            F.broadcast(q),
            (F.col("qbucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("qbucket").alias("bucket"),
            (
                F.expr(_DOT.format(a="qv", b="v")) / (F.col("qnrm") * F.col("nrm"))
            ).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "bucket", "sim", "rank")
    )
