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


# ---------------------------------------------------------------------------
# q265 — composed IVF-PQ persisted index (r11)
# ---------------------------------------------------------------------------

_PQ_N_SUB = 8
_PQ_SUB_DIM = 8
_PQ_N_CENT = 16
_SHORTLIST = 32

_PQ_SUBDIST_SQL = (
    f"round(list_sum(list_transform(generate_series(1, {_PQ_SUB_DIM}), "
    "i -> (s.sv[i] - c.cvec[i]) * (s.sv[i] - c.cvec[i]))), 6)"
)


def ivfpq_index_path(sf_dir: str) -> str:
    return catalog.scratch_path("ivfpq", sf_dir)


def _ivfpq_sql() -> str:
    """Unrolled IVF train + PQ train + encode + probe + ADC + re-rank,
    entirely in SQL: the IVF CTE chain is q135's (q93 recipe), the PQ
    CTE chain is q99's, and the composition joins the byte codes to
    the per-query probed cells before the ADC sum — exactly what
    operators/ann_index.query_ivfpq_index executes over the persisted
    layout."""
    ctes = [
        "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v, "
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm "
        "FROM embeddings)",
        f"icent0 AS (SELECT vec_id AS c_id, v AS cvec FROM vecs "
        f"WHERE vec_id IN (SELECT vec_id FROM vecs ORDER BY vec_id LIMIT {_K_CELLS}))",
    ]
    for t in range(1, _ITERS + 1):
        ctes.append(
            f"""ia{t} AS (
      SELECT vec_id, v, cell FROM (
        SELECT v.vec_id, v.v, c.c_id AS cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_DIST2_SQL} ASC, c.c_id ASC) AS rn
        FROM vecs v CROSS JOIN icent{t - 1} c
      ) WHERE rn = 1
    )"""
        )
        if t < _ITERS:
            ctes.append(
                f"""icent{t} AS (
      SELECT cell AS c_id, list(cx ORDER BY i) AS cvec FROM (
        SELECT cell, i, round(avg(x), 4) AS cx
        FROM (SELECT cell, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM ia{t})
        GROUP BY cell, i
      ) GROUP BY cell
    )"""
            )
    last_ia, last_ic = f"ia{_ITERS}", f"icent{_ITERS - 1}"
    sub_rows = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS sub, "
        f"v[{s * _PQ_SUB_DIM + 1}:{(s + 1) * _PQ_SUB_DIM}] AS sv FROM vecs"
        for s in range(_PQ_N_SUB)
    )
    ctes += [
        f"sub AS ({sub_rows})",
        f"pcent0 AS (SELECT sub, vec_id AS c_id, sv AS cvec FROM sub WHERE "
        f"vec_id IN (SELECT vec_id FROM vecs ORDER BY vec_id LIMIT {_PQ_N_CENT}))",
        f"""pa1 AS (
      SELECT vec_id, sub, sv, code FROM (
        SELECT s.vec_id, s.sub, s.sv, c.c_id AS code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                                  ORDER BY {_PQ_SUBDIST_SQL} ASC, c.c_id ASC) AS rn
        FROM sub s JOIN pcent0 c ON s.sub = c.sub
      ) WHERE rn = 1
    )""",
        """pcent1 AS (
      SELECT sub, code AS c_id, list(cx ORDER BY i) AS cvec FROM (
        SELECT sub, code, i, round(avg(x), 4) AS cx
        FROM (SELECT sub, code, unnest(sv) AS x, generate_subscripts(sv, 1) AS i
              FROM pa1)
        GROUP BY sub, code, i
      ) GROUP BY sub, code
    )""",
        f"""codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, c.c_id AS code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub
                                  ORDER BY {_PQ_SUBDIST_SQL} ASC, c.c_id ASC) AS rn
        FROM sub s JOIN pcent1 c ON s.sub = c.sub
      ) WHERE rn = 1
    )""",
        f"""probes AS (
      SELECT query_id, cell FROM (
        SELECT v.vec_id AS query_id, c.c_id AS cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_DIST2_SQL} ASC, c.c_id ASC) AS prn
        FROM vecs v CROSS JOIN {last_ic} c WHERE v.vec_id < 8
      ) WHERE prn <= {_N_PROBE}
    )""",
        f"""qd AS (
      SELECT s.vec_id AS query_id, s.sub, c.c_id AS code,
             CAST({_PQ_SUBDIST_SQL} AS DECIMAL(18,6)) AS qd
      FROM sub s JOIN pcent1 c ON s.sub = c.sub
      WHERE s.vec_id < 8
    )""",
        f"""adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(sum(q.qd) AS DOUBLE) AS adc
      FROM codes c
      JOIN {last_ia} m ON c.vec_id = m.vec_id
      JOIN probes p ON m.cell = p.cell
      JOIN qd q ON q.query_id = p.query_id
             AND q.sub = c.sub AND q.code = c.code
      WHERE q.query_id <> c.vec_id
      GROUP BY 1, 2
    )""",
        f"""short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc ASC, neighbor_id ASC) AS srn
        FROM adc
      ) WHERE srn <= {_SHORTLIST}
    )""",
        """rerank AS (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(qv.v, c.v) / (qv.nrm * c.nrm) AS sim
      FROM short s
      JOIN vecs c  ON s.neighbor_id = c.vec_id
      JOIN vecs qv ON s.query_id = qv.vec_id
    )""",
    ]
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM rerank
    ) WHERE rank <= {_TOP_K}
    """


@query(
    "q265_ivfpq_index_probe",
    sql=_ivfpq_sql(),
    operators=("X-ann-index", "X-sim-ivf", "X-sim-pq", "X-cluster-kmeans"),
)
def q265_ivfpq_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED IVF-PQ persisted index (r11 — the r10 verdict's
    #6: the standard billion-vector layout, both halves of which
    existed separately as q135 and q99): byte codes partitioned by
    IVF cell, probes DPP-pruned to n_probe directories, ADC shortlist
    computed from codes alone (1 byte per vector·subspace read — at
    100 TB the probe reads n_probe/k of the corpus as CODES, ~64×
    smaller than floats), exact cosine re-rank on the 32-entry
    shortlist reading full vectors DPP-pruned to the same cells. The
    oracle replays the ENTIRE composition — IVF training, PQ
    codebook, encoding, probe ranking, cell-restricted ADC,
    shortlist, re-rank — so a drift in either half or in their
    composition moves the value hash. Recall floor vs the q80 truth
    is pinned on the q114 board."""
    from portfolio1_etl_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    vecs = with_norms(catalog.load(spark, sf_dir, "embeddings"))
    path = ivfpq_index_path(sf_dir)
    build_ivfpq_index(
        vecs,
        path,
        k_cells=_K_CELLS,
        iters=_ITERS,
        n_sub=_PQ_N_SUB,
        sub_dim=_PQ_SUB_DIM,
        n_cent=_PQ_N_CENT,
    )
    queries = vecs.filter(F.col("vec_id") < 8)
    return query_ivfpq_index(
        spark,
        path,
        queries,
        n_probe=_N_PROBE,
        shortlist=_SHORTLIST,
        k=_TOP_K,
        n_sub=_PQ_N_SUB,
        sub_dim=_PQ_SUB_DIM,
    )


# ---------------------------------------------------------------------------
# q270 — incremental IVF ingest against a frozen codebook (r11)
# ---------------------------------------------------------------------------


def ivf_ingest_path(sf_dir: str) -> str:
    return catalog.scratch_path("ivf_ing", sf_dir)


def _ivf_ingest_sql() -> str:
    """q135's unrolled chain with TWO changes that mirror incremental
    maintenance: the codebook trains on the EVEN half only, and the
    final index assignment covers ALL vectors — exactly what
    ``ingest_vectors`` produces by assigning arrivals to the frozen
    persisted centroids with the same 6 dp argmin."""
    train = "SELECT * FROM vecs WHERE vec_id % 2 = 0"
    ctes = [
        "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v, "
        "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm "
        "FROM embeddings)",
        f"train AS ({train})",
        f"cent0 AS (SELECT vec_id AS c_id, v AS cvec FROM train "
        f"WHERE vec_id IN (SELECT vec_id FROM train ORDER BY vec_id LIMIT {_K_CELLS}))",
    ]
    for t in range(1, _ITERS + 1):
        ctes.append(
            f"""a{t} AS (
      SELECT vec_id, v, cell FROM (
        SELECT v.vec_id, v.v, c.c_id AS cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_DIST2_SQL} ASC, c.c_id ASC) AS rn
        FROM train v CROSS JOIN cent{t - 1} c
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
    last_c = f"cent{_ITERS - 1}"
    ctes.append(
        f"""index_vecs AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT v.vec_id, v.v, v.nrm, c.c_id AS cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_DIST2_SQL} ASC, c.c_id ASC) AS rn
        FROM vecs v CROSS JOIN {last_c} c
      ) WHERE rn = 1
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
    "q270_ivf_incremental_ingest",
    sql=_ivf_ingest_sql(),
    operators=("X-ann-index", "X-ann-ingest", "X-sim-ivf"),
)
def q270_ivf_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL index maintenance on the scoreboard (r11): the IVF
    index builds on HALF the corpus (even vec_ids), then the other
    half ARRIVES in two ``ingest_vectors`` batches — assigned to the
    frozen persisted codebook with a broadcast narrow map and APPENDED
    to their cell partitions, no rebuild, existing files untouched —
    and the probe answers over the drifted index. This is the
    steady-state life of a 100 TB vector index (build once, ingest
    forever, rebalance on skew); the oracle replays it exactly:
    training CTEs over the even half, final assignment over ALL
    vectors (the frozen-codebook argmin is the same 6 dp expression
    for built and ingested rows), probe + exact re-rank on top. A
    drift anywhere — ingest assignment math, the append layout, probe
    ranking over mixed built+ingested partitions — moves the value
    hash."""
    from portfolio1_etl_spark.operators.ann_index import (
        build_ivf_index,
        ingest_vectors,
        query_ivf_index,
    )
    from portfolio1_etl_spark.operators.sinks import _hadoop_fs

    vecs = with_norms(catalog.load(spark, sf_dir, "embeddings"))
    path = ivf_ingest_path(sf_dir)
    fs, jpath = _hadoop_fs(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)
    build_ivf_index(
        vecs.filter(F.col("vec_id") % 2 == 0), path, k=_K_CELLS, iters=_ITERS
    )
    ingest_vectors(spark, path, vecs.filter(F.col("vec_id") % 4 == 1))
    ingest_vectors(spark, path, vecs.filter(F.col("vec_id") % 4 == 3))
    queries = vecs.filter(F.col("vec_id") < 8)
    return query_ivf_index(
        spark, path, queries, n_probe=_N_PROBE, k=_TOP_K
    ).select("query_id", "neighbor_id", "sim", "rank")
