"""[ext] Frequency-sketch queries over ``documents``: count-min
heavy hitters via the generic sketch library
(``portfolio1_etl_spark.operators.sketches``).

Determinism: the sketch's hash family derives from the same md5-based
H48 as the dedup layer, so the DuckDB oracle rebuilds the IDENTICAL
sketch from the identical token stream — estimates match exactly,
turning a normally-probabilistic structure into a hash-checkable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.sketches import (
    CMS_MOD,
    CMS_PARAMS,
    CMS_WIDTH,
    cms_build_weighted,
    cms_estimate,
)
from portfolio1_etl_spark.plans.registry import query

_H48_SQL = "('0x' || substr(md5({c}), 1, 12))::BIGINT"

_TOPK = 20


def _cms_sql() -> str:
    cell_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, (({a} * h + {b}) % {CMS_MOD}) % {CMS_WIDTH} AS bucket FROM hashed"
        for j, a, b in CMS_PARAMS
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT w, {j} AS j, (({a} * h + {b}) % {CMS_MOD}) % {CMS_WIDTH} AS bucket FROM dw"
        for j, a, b in CMS_PARAMS
    )
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    hashed AS (SELECT {_H48_SQL.format(c='w')} AS h FROM toks),
    cells AS ({cell_rows}),
    sketch AS (SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
    exact AS (SELECT w, count(*) AS exact_count FROM toks GROUP BY w),
    dw AS (SELECT w, {_H48_SQL.format(c='w')} AS h FROM exact),
    probes AS ({probe_rows}),
    est AS (
      SELECT p.w, min(s.cnt) AS est_count
      FROM probes p JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
      GROUP BY p.w
    )
    SELECT e.w AS token,
           est.est_count,
           e.exact_count,
           est.est_count - e.exact_count AS overestimate
    FROM exact e JOIN est ON e.w = est.w
    ORDER BY est.est_count DESC, token
    LIMIT {_TOPK}
    """


@query(
    "q92_cms_heavy_hitters",
    sql=_cms_sql(),
    operators=("X-sketch-cms", "A1", "O2"),
)
def q92_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters over the corpus token stream:
    ``cms_build`` folds the stream into a 4×512 sketch (one shuffle,
    map-side partial agg caps it at depth·width rows per partition);
    ``cms_estimate`` broadcasts the finished sketch and probes every
    distinct token; top-20 by estimate with the exact count alongside
    (the CMS guarantee est ≥ exact is visible in the overestimate
    column). Because this query ALSO reports exact counts, it builds
    the sketch from the checkpointed counts aggregate
    (``cms_build_weighted`` — same sketch, one corpus scan); a
    sketch-only pipeline uses ``cms_build`` on the raw stream and
    never materializes the distinct-key aggregate at all."""
    d = catalog.load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("w"))
    # ONE corpus scan: the exact-counts aggregate materializes once and
    # feeds the (weighted) sketch build, the probe side, and the
    # comparison column — the raw token stream is never re-exploded.
    exact = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .localCheckpoint(eager=True)
    )
    sketch = cms_build_weighted(exact, "w", "exact_count")
    est = cms_estimate(
        sketch, exact, "w", assume_distinct=True
    ).withColumnRenamed("est", "est_count")
    return (
        exact.join(est, "w")
        .select(
            F.col("w").alias("token"),
            F.col("est_count"),
            F.col("exact_count"),
            (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.desc("est_count"), "token")
        .limit(_TOPK)
    )
