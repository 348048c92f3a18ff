"""[ext] The PERSISTED IVF index on the scoreboard (r7): build the
parquet-backed index (operators/ann_index.py) and answer queries
through its DPP-pruned probe path, as a registry query with a full
DuckDB oracle — so CORRECTNESS, not just pytest, gates the index.

The oracle replays the ENTIRE pipeline end-to-end: the unrolled
deterministic Lloyd training the build runs (q93's CTE recipe — 4 dp
centroid means, 6 dp distances, centroid-id tie break), the final
full-corpus assignment that becomes the cell layout, the 6 dp-rounded
probe ranking, and the exact sequential-fold cosine re-rank. A drift
anywhere — codebook training, cell assignment, the parquet round-trip
of the persisted layout, probe selection, re-ranking — moves the
value hash.

Unlike every other registry query this one WRITES (the index lives
under a deterministic per-sf_dir temp path and is rebuilt on each
call — the query is "build + probe", both halves gated). The probe
scan itself is asserted partition-pruned in
tests/test_plan_quality.py (the same dynamicpruning guard as
tests/test_ann_index.py, but against THIS registered query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.ann_index import (
    build_ivf_index,
    query_ivf_index,
)
from portfolio1_etl_spark.operators.similarity import with_norms
from portfolio1_etl_spark.plans.registry import query

_K_CELLS = 8
_ITERS = 3
_DIM = 64
_N_PROBE = 3
_TOP_K = 3

_DIST2_SQL = (
    f"round(list_sum(list_transform(generate_series(1, {_DIM}), "
    "i -> (v.v[i] - c.cvec[i]) * (v.v[i] - c.cvec[i]))), 6)"
)


def index_path(sf_dir: str) -> str:
    """Deterministic per-dataset location for the persisted index."""
    return catalog.scratch_path("ivf", sf_dir)


def _ivf_index_sql() -> str:
    """Unrolled train → assign → persist → probe → re-rank, entirely
    in SQL. cent0..cent{iters-1} and a1..a{iters} mirror
    operators/clustering.lloyd_kmeans exactly (same CTE chain as the
    q93 oracle); the probe and re-rank mirror
    operators/ann_index.query_ivf_index."""
    ctes = [
        "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v, "
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm "
        "FROM embeddings)",
        f"cent0 AS (SELECT vec_id AS c_id, v AS cvec FROM vecs "
        f"WHERE vec_id IN (SELECT vec_id FROM vecs ORDER BY vec_id LIMIT {_K_CELLS}))",
    ]
    for t in range(1, _ITERS + 1):
        ctes.append(
            f"""a{t} AS (
      SELECT vec_id, v, cell FROM (
        SELECT v.vec_id, v.v, c.c_id AS cell,
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
        f"""index_vecs AS (
      SELECT a.vec_id, a.v, a.cell, n.nrm
      FROM {last_a} a JOIN vecs n ON a.vec_id = n.vec_id
    )"""
    )
    ctes.append(
        f"""probes AS (
      SELECT query_id, qv, qnrm, cell FROM (
        SELECT v.vec_id AS query_id, v.v AS qv, v.nrm AS qnrm,
               c.c_id AS cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_DIST2_SQL} ASC, c.c_id ASC) AS prn
        FROM vecs v CROSS JOIN {last_c} c WHERE v.vec_id < 8
      ) WHERE prn <= {_N_PROBE}
    )"""
    )
    ctes.append(
        """sims AS (
      SELECT p.query_id, i.vec_id AS neighbor_id,
             list_dot_product(p.qv, i.v) / (p.qnrm * i.nrm) AS sim
      FROM probes p JOIN index_vecs i
        ON i.cell = p.cell AND p.query_id <> i.vec_id
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    ) WHERE rank <= {_TOP_K}
    """


@query(
    "q135_ivf_index_probe",
    sql=_ivf_index_sql(),
    operators=("X-ann-index", "X-sim-ivf", "X-cluster-kmeans"),
)
def q135_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the persisted IVF index (k=8 cells, 3 Lloyd rounds,
    deterministic seeds) under a temp path and answer the 8 scoreboard
    queries through it: top-3 cosine neighbors probing the 3 nearest
    cells. The probe table joins the index on its PARTITION column, so
    dynamic partition pruning drops unprobed cell directories at the
    scan — at 100 TB the query reads 3/8ths of the index (n_probe of k
    directories), and the same layout is what incremental/streaming
    ingest appends to and ``rebalance_index`` maintains.

    Scale shape: training runs on the (optionally sampled) corpus with
    the zero-shuffle folded-argmin assignment; the build's one wide op
    is the partitioned write; the probe side is a few broadcast rows.
    Determinism: the shared 4 dp/6 dp rounding recipe end-to-end, exact
    sequential-fold cosine for the output ``sim`` (bitwise equal to
    DuckDB's list_dot_product)."""
    vecs = with_norms(catalog.load(spark, sf_dir, "embeddings"))
    path = index_path(sf_dir)
    build_ivf_index(vecs, path, k=_K_CELLS, iters=_ITERS)
    queries = vecs.filter(F.col("vec_id") < 8)
    return query_ivf_index(
        spark, path, queries, n_probe=_N_PROBE, k=_TOP_K
    ).select("query_id", "neighbor_id", "sim", "rank")
