"""[ext] Multimodal-column query: the Arrow-batched ``mapInPandas``
featurization path (operators/multimodal) driven end-to-end and
oracle-checked.

The driver testdata ships no media files, so the binary column is
synthesized deterministically from ``documents.text`` (UTF-8 encode) —
which is exactly what makes the Python featurizer oracle-checkable:
its digest features are pure functions of the bytes, and DuckDB can
recompute them in SQL (sha256 + hex arithmetic). The float32 snap of
each feature is reproduced with an explicit FLOAT round-trip cast.

This is the one *Python* data-path operator in the engine, and it
still gets the full differential gate — batch boundaries, Arrow
conversion, and the UDF body are all under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.multimodal import featurize_media
from portfolio1_etl_spark.plans.registry import query


def _feature_sql(i: int) -> str:
    """f_i = float32(int(digest[4i:4i+4] big-endian) / 2^32) — the SQL
    twin of operators.multimodal._fake_features."""
    return (
        f"CAST(CAST(('0x' || substr(sha256(text), {8 * i + 1}, 8))::BIGINT"
        f" / 4294967296.0 AS FLOAT) AS DOUBLE)"
    )


@query(
    "q90_multimodal_featurize",
    sql=f"""
    SELECT
      doc_id,
      'text' AS modality,
      octet_length(encode(text)) AS n_bytes,
      sha256(text) AS content_sha256,
      {_feature_sql(0)} AS f0,
      {_feature_sql(1)} AS f1
    FROM documents
    """,
    operators=("X-multimodal",),
)
def q90_multimodal_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column featurization through the real multimodal
    plumbing: typed media rows (path/modality/content/meta) →
    repartition by modality → ``mapInPandas`` digest features → typed
    feature rows. Python sees Arrow batches only; the oracle recomputes
    every output from the same bytes in SQL."""
    docs = catalog.load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        F.lit("text").alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.length("text").cast("long").alias("length"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )
    feats = featurize_media(media)
    return feats.select(
        F.col("path").cast("long").alias("doc_id"),
        "modality",
        "n_bytes",
        "content_sha256",
        F.element_at("feature", 1).cast("double").alias("f0"),
        F.element_at("feature", 2).cast("double").alias("f1"),
    )
