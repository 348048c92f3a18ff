"""[ext] The corpus-prep COMPOSITE on the scoreboard: q100 runs the
full training-corpus preparation pipeline (``corpus_pipeline
.prepare_corpus`` — exact dedup → near-dup clusters → decontamination
→ eval split → repetition gate) and reduces its decision log to a
per-reason census the DuckDB oracle replays as one CTE chain built
from the q71/q77/q89/q96/q97 twins.

This is the query a 100 TB prep run actually resembles: every stage
is a DataFrame→DataFrame operator reused from the individually
oracle-checked queries; the composite validates their WIRING — shared
shingle table, survivor restriction, drop-reason precedence — not
just each stage alone. The census keys on (reason, count, doc_id
checksum), so a single document routed to the wrong drop reason
fails the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark.corpus_pipeline import prepare_corpus
from portfolio1_etl_spark.plans.dedup_ops import _HASHED_SQL
from portfolio1_etl_spark.plans.registry import query

# Mirrors prepare_corpus defaults exactly.
_JACCARD, _DF_CAP, _EVAL_MOD, _MIN_SHINGLES = 0.4, 4, 50, 3
#: the Spark side computes the cutoff as 1.0 - max_repetition; the SQL
#: spells the same subtraction so the IEEE value cannot differ in the
#: last ulp (the graph_ops damping-base discipline).
_REP_CUTOFF_SQL = "(1.0 - 0.4)"

_CORPUS_PREP_SQL = f"""
    WITH RECURSIVE
    sh_all AS ({_HASHED_SQL}),
    keep AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    sh_surv AS (
      SELECT s.* FROM sh_all s WHERE s.doc_id IN (SELECT doc_id FROM keep)
    ),
    hot AS (
      SELECT h FROM sh_surv GROUP BY h HAVING count(*) > {_DF_CAP}
    ),
    shc AS (SELECT * FROM sh_surv WHERE h NOT IN (SELECT h FROM hot)),
    sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b,
             CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
      FROM common
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
    ),
    p AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= {_JACCARD}),
    nodes AS (SELECT doc_a AS node FROM p UNION SELECT doc_b FROM p),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM p
      UNION SELECT doc_b, doc_a FROM p
    ),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.label
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.label < e.dst
    ),
    cc AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
    near_dupes AS (SELECT node AS doc_id FROM cc WHERE node <> component),
    eval_sh AS (
      SELECT DISTINCT h FROM sh_all WHERE doc_id % {_EVAL_MOD} = 0
    ),
    contaminated AS (
      SELECT s.doc_id
      FROM sh_all s JOIN eval_sh e ON s.h = e.h
      WHERE s.doc_id % {_EVAL_MOD} <> 0
      GROUP BY s.doc_id
      HAVING count(*) >= {_MIN_SHINGLES}
    ),
    rep AS (
      SELECT doc_id,
             coalesce(
               CASE WHEN n_shingles > 0
                    THEN CAST(n_distinct AS DOUBLE) / n_shingles END,
               1.0) < {_REP_CUTOFF_SQL} AS too_repetitive
      FROM (
        SELECT doc_id,
               greatest(len(toks) - 2, 0) AS n_shingles,
               len(list_distinct(list_transform(
                 generate_series(1, greatest(len(toks) - 2, 1)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               ))) AS n_distinct
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      )
    ),
    decisions AS (
      SELECT d.doc_id,
             CASE WHEN k.doc_id IS NULL THEN 'exact_duplicate'
                  WHEN nd.doc_id IS NOT NULL THEN 'near_duplicate'
                  WHEN d.doc_id % {_EVAL_MOD} = 0 THEN 'eval_slice'
                  WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
                  WHEN r.too_repetitive THEN 'repetitive'
                  ELSE 'kept' END AS reason
      FROM documents d
      LEFT JOIN keep k ON d.doc_id = k.doc_id
      LEFT JOIN near_dupes nd ON d.doc_id = nd.doc_id
      LEFT JOIN contaminated ct ON d.doc_id = ct.doc_id
      LEFT JOIN rep r ON d.doc_id = r.doc_id
    )
    SELECT reason,
           count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
    FROM decisions
    GROUP BY reason
"""


@query(
    "q100_corpus_prep",
    sql=_CORPUS_PREP_SQL,
    operators=(
        "X-corpus-prep",
        "X-dedup-exact",
        "X-dedup-ngram",
        "X-dedup-dfcap",
        "X-dedup-cc",
        "X-dedup-decontaminate",
        "X-text-repetition",
    ),
)
def q100_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep, on the scoreboard: run the composed
    pipeline and report the decision-log census — documents per drop
    reason (first reason wins) plus a doc_id checksum per bucket, so
    misrouting even one document between reasons fails the hash gate.
    The oracle replays every stage as a CTE chain over the SAME
    parameter values (Jaccard 0.4, df_cap 4, eval mod 50, ≥3 shared
    shingles, repetition cutoff 1−0.4)."""
    res = prepare_corpus(spark, sf_dir, count_rows=False)
    return (
        res.decisions.select(
            "doc_id", F.coalesce("drop_reason", F.lit("kept")).alias("reason")
        )
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
    )
