"""[ext] On-scoreboard dedup recall (r6): the q114 pattern applied to
the near-duplicate family — every LOSSY pair-finding strategy (LSH
banding, df-capped inverted index) measured against the LOSSLESS
prefix-filtered join (q105), whose own oracle proves completeness at
the shared Jaccard ≥ 0.4 threshold.

As with q114, both sides are composed FROM THE REGISTERED QUERIES —
the Spark body calls the registered fns, the oracle splices the
registered SQL — so the recall on the board is the recall of exactly
the gated pipelines, and a probe/cap regression moves a value-hashed
number instead of only failing a local bar.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark.plans.registry import REGISTRY, query

_METHODS = ("q73_minhash_lsh", "q77_jaccard_dfcap")
_TRUTH = "q105_prefix_jaccard"


def _recall_sql() -> str:
    truth = REGISTRY[_TRUTH].sql
    union = " UNION ALL ".join(
        f"SELECT '{m}' AS method, doc_a, doc_b FROM ({REGISTRY[m].sql})"
        for m in _METHODS
    )
    values = ",".join(f"('{m}')" for m in _METHODS)
    return f"""
    WITH truth AS MATERIALIZED (SELECT doc_a, doc_b FROM ({truth})),
    methods(method) AS (VALUES {values}),
    results AS ({union}),
    hits AS (
      SELECT r.method, count(*) AS n_hits
      FROM results r JOIN truth t USING (doc_a, doc_b)
      GROUP BY r.method
    ),
    n AS (SELECT count(*) AS n_truth FROM truth)
    SELECT m.method,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(n.n_truth AS BIGINT) AS n_truth,
           round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / n.n_truth, 4) AS recall
    FROM methods m LEFT JOIN hits h ON m.method = h.method, n
    """


@query(
    "q129_dedup_recall",
    sql=_recall_sql(),
    operators=("X-dedup-recall", "X-dedup-minhash", "X-dedup-dfcap", "X-dedup-prefix"),
)
def q129_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of each lossy near-dup strategy against the lossless
    prefix-join ground truth at the shared Jaccard ≥ 0.4 bar:
    |method ∩ truth| / |truth|. LSH misses what no band captures
    (probabilistic, documented); df-cap misses pairs whose every
    shared shingle is a heavy hitter (bounded, documented) — this row
    puts both documented losses ON the scoreboard next to q113's
    bloom FP rate and q114's ANN recall.

    Truth-caching note (r7, measured): an explicit
    ``checkpointing.materialize`` on the truth is a measured LOSS
    (sf0.1 warm min: 8.38s raw vs 11.53s materialized) — Spark's
    ReusedExchange already computes the duplicated q105 subplan once
    within this query, while the eager checkpoint adds a barrier (the
    lossy legs can no longer overlap the truth) plus a
    store-and-reload. DuckDB's planner wants the opposite (the SQL
    twin keeps its MATERIALIZED hint); the two engines differ here
    and each side keeps its own best plan."""
    # independent legs constructed from driver threads (guide §2.6):
    # the truth and each lossy strategy are separate pipelines, so
    # their construction-time py4j round-trips and any eager work
    # overlap instead of serializing
    from portfolio1_etl_spark.parallelism import overlap_jobs

    truth_df, *method_dfs = overlap_jobs(
        lambda: REGISTRY[_TRUTH].fn(spark, sf_dir),
        *[
            (lambda m=m: REGISTRY[m].fn(spark, sf_dir))
            for m in _METHODS
        ],
    )
    truth = truth_df.select("doc_a", "doc_b")
    results = reduce(
        DataFrame.unionByName,
        [
            df.select(F.lit(m).alias("method"), "doc_a", "doc_b")
            for m, df in zip(_METHODS, method_dfs)
        ],
    )
    hits = results.join(truth, ["doc_a", "doc_b"]).groupBy("method").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    n = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    methods = spark.createDataFrame([(m,) for m in _METHODS], "method string")
    return (
        methods.join(hits, "method", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "method",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.round(
                F.coalesce("n_hits", F.lit(0)).cast("double") / F.col("n_truth"), 4
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# q267 — quality-aware keep-best survivorship per near-dup cluster (r11)
# ---------------------------------------------------------------------------


def _keepbest_sql() -> str:
    cc = REGISTRY["q89_dup_clusters"].sql
    return f"""
    WITH cc AS ({cc}),
    q AS (
      SELECT doc_id, source, n_chars,
             len(list_distinct(string_split(text, ' '))) AS ntok
      FROM documents
    ),
    full_cc AS (
      SELECT q.doc_id, coalesce(cc.cluster_id, q.doc_id) AS cluster_id,
             q.source, q.n_chars, q.ntok
      FROM q LEFT JOIN cc ON q.doc_id = cc.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY ntok DESC, doc_id ASC) AS rn
      FROM full_cc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars,
           CAST(sum(CASE WHEN rn = 1 AND doc_id <> cluster_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept_non_min
    FROM ranked GROUP BY 1
    """


@query(
    "q267_cluster_keep_best",
    sql=_keepbest_sql(),
    operators=("X-dedup-keepbest", "X-survivorship", "X-dedup-cc"),
)
def q267_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE survivorship (r11): the step between q89's
    min-id clusters and a shipped training corpus — per near-dup
    cluster keep the HIGHEST-QUALITY member (here: most distinct
    tokens, doc_id tiebreak), not the arbitrary minimum id; docs in no
    pair survive as their own singleton cluster. ``kept_non_min``
    counts clusters where quality-keep and naive min-id survivorship
    DISAGREE — the rows a min-id pipeline would have thrown away
    better data for. Composed from the REGISTERED q89 (the q114
    pattern: Spark body calls its fn, oracle splices its SQL), so the
    keep decision is measured over exactly the gated clusters.

    Scale shape: the cluster ranking window is keyed on cluster_id
    (cluster grain — no partitionless window); quality is one narrow
    map over documents; everything else is the q89 machinery."""
    from portfolio1_etl_spark import catalog
    from pyspark.sql import Window as W

    cc = REGISTRY["q89_dup_clusters"].fn(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.array_distinct(F.split("text", " "))).alias("ntok"),
    )
    full_cc = docs.join(cc, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("doc_id"))
    )
    w = W.partitionBy("cluster_id").orderBy(
        F.desc("ntok"), F.asc("doc_id")
    )
    ranked = full_cc.withColumn("rn", F.row_number().over(w))
    kept = (F.col("rn") == 1).cast("long")
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.sum(kept * F.col("n_chars")).cast("long").alias("kept_chars"),
        F.sum(
            kept * (F.col("doc_id") != F.col("cluster_id")).cast("long")
        ).cast("long").alias("kept_non_min"),
    )
