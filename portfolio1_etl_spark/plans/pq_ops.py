"""[ext] Product-quantization ANN over ``embeddings`` — oracle-checked
query form of ``portfolio1_etl_spark.operators.pq`` (see its docstring
for the PQ/ADC design and the scale shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.pq import pq_topk
from portfolio1_etl_spark.operators.similarity import with_norms
from portfolio1_etl_spark.plans.registry import query

_N_SUB = 8
_SUB_DIM = 8
_K = 16

_SUBDIST_SQL = (
    f"round(list_sum(list_transform(generate_series(1, {_SUB_DIM}), "
    "i -> (s.sv[i] - c.cvec[i]) * (s.sv[i] - c.cvec[i]))), 6)"
)


def _pq_sql(train_fraction: float | None = None) -> str:
    sub_rows = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS sub, v[{s * _SUB_DIM + 1}:{(s + 1) * _SUB_DIM}] AS sv FROM vecs"
        for s in range(_N_SUB)
    )
    if train_fraction is None:
        train_cte, train_src = "", "sub"
        seed_sql = f"SELECT vec_id FROM vecs ORDER BY vec_id LIMIT {_K}"
    else:
        # the SQL twin of clustering.sample_for_training's md5 bucket
        cut = int(train_fraction * 10000)
        train_cte = (
            "train AS (SELECT * FROM sub WHERE "
            f"('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT"
            f" % 10000 < {cut}),\n    "
        )
        train_src = "train"
        seed_sql = (
            f"SELECT DISTINCT vec_id FROM train ORDER BY vec_id LIMIT {_K}"
        )
    return f"""
    WITH vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    sub AS ({sub_rows}),
    {train_cte}cent0 AS (SELECT sub, vec_id AS c_id, sv AS cvec FROM {train_src}
              WHERE vec_id IN ({seed_sql})),
    a1 AS (
      SELECT vec_id, sub, sv, code FROM (
        SELECT s.vec_id, s.sub, s.sv, c.c_id AS code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                                  ORDER BY {_SUBDIST_SQL} ASC, c.c_id ASC) AS rn
        FROM {train_src} s JOIN cent0 c ON s.sub = c.sub
      ) WHERE rn = 1
    ),
    cent1 AS (
      SELECT sub, code AS c_id, list(cx ORDER BY i) AS cvec FROM (
        SELECT sub, code, i, round(avg(x), 4) AS cx
        FROM (SELECT sub, code, unnest(sv) AS x, generate_subscripts(sv, 1) AS i
              FROM a1)
        GROUP BY sub, code, i
      ) GROUP BY sub, code
    ),
    codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, c.c_id AS code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                                  ORDER BY {_SUBDIST_SQL} ASC, c.c_id ASC) AS rn
        FROM sub s JOIN cent1 c ON s.sub = c.sub
      ) WHERE rn = 1
    ),
    qd AS (
      SELECT s.vec_id AS query_id, s.sub, c.c_id AS code,
             CAST({_SUBDIST_SQL} AS DECIMAL(18,6)) AS qd
      FROM sub s JOIN cent1 c ON s.sub = c.sub
      WHERE s.vec_id < 8
    ),
    adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id, CAST(sum(q.qd) AS DOUBLE) AS adc
      FROM codes c JOIN qd q ON q.sub = c.sub AND q.code = c.code
      WHERE q.query_id <> c.vec_id
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, neighbor_id, adc FROM (
        SELECT query_id, neighbor_id, adc,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc ASC, neighbor_id ASC) AS srn
        FROM adc
      ) WHERE srn <= 32
    ),
    rerank AS (
      SELECT s.query_id, s.neighbor_id, s.adc,
             list_dot_product(qv.v, c.v) / (qv.nrm * c.nrm) AS sim
      FROM short s
      JOIN vecs c  ON s.neighbor_id = c.vec_id
      JOIN vecs qv ON s.query_id = qv.vec_id
    )
    SELECT query_id, neighbor_id, adc, sim, rank FROM (
      SELECT query_id, neighbor_id, adc, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM rerank
    ) WHERE rank <= 3
    """


@query(
    "q99_pq_ann",
    sql=_pq_sql(),
    operators=("X-sim-pq", "X-cluster-kmeans", "X-sim-topk"),
)
def q99_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (8 subspaces × 16 centroids — 64×
    vector compression): one GROUPED Lloyd's run trains all subspace
    codebooks in the same jobs; the ADC scan touches only byte codes
    plus the broadcast query distance table (DECIMAL-exact sums — no
    rounding ambiguity); exact cosine re-ranks the 32-wide shortlist.
    At 100 TB the full-precision vectors are read exactly twice ever:
    once to train/encode, once per query shortlist re-rank."""
    vecs = with_norms(catalog.load(spark, sf_dir, "embeddings")).select(
        "vec_id", "v", "nrm"
    )
    return pq_topk(
        vecs,
        vecs.filter(F.col("vec_id") < 8),
        k=3,
        n_sub=_N_SUB,
        sub_dim=_SUB_DIM,
        n_cent=_K,
        shortlist=32,
    )


_TRAIN_FRACTION = 0.25


@query(
    "q103_pq_sampled_train",
    sql=_pq_sql(train_fraction=_TRAIN_FRACTION),
    operators=("X-sim-pq", "X-cluster-kmeans", "X-sim-topk", "X-sample-train"),
)
def q103_pq_sampled_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q99's index built the way a 100 TB corpus actually affords it:
    the subspace codebooks train on a 25% deterministic md5-bucket
    sample (``sample_for_training`` — seeding, assignment, and update
    all touch only the sample) while ENCODING and the ADC scan still
    cover every vector. The oracle replays the identical sampled
    training (same md5 bucket arithmetic), so the codebook — and thus
    every code, shortlist, and final ranking — must match exactly,
    proving sampled training is a plan change, not a semantics
    change."""
    vecs = with_norms(catalog.load(spark, sf_dir, "embeddings")).select(
        "vec_id", "v", "nrm"
    )
    return pq_topk(
        vecs,
        vecs.filter(F.col("vec_id") < 8),
        k=3,
        n_sub=_N_SUB,
        sub_dim=_SUB_DIM,
        n_cent=_K,
        shortlist=32,
        train_fraction=_TRAIN_FRACTION,
    )
