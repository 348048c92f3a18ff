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

from collections.abc import Iterator

import numpy as np
import pandas as pd

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media_features,
    encode_png,
    encode_ppm,
    encode_wav,
    featurize_media,
)
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
    ``mapInPandas`` digest features (a narrow map — no pre-shuffle) →
    typed feature rows. Python sees Arrow batches only; the oracle
    recomputes every output from the same bytes in SQL."""
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


# --- q91: REAL encode→decode round trip ------------------------------------

#: even doc_id → 8×8 RGB PPM image (192 pixel bytes), odd → 256-sample
#: PCM16 WAV. Value generators are integer-exact so the oracle can
#: recompute every feature analytically (no bytes cross into SQL).
_IMG_N, _AUD_N = 8 * 8 * 3, 256


def _synthesize_media(docs):
    """doc_id → real media bytes (PPM P6 / WAV PCM16) via mapInPandas.
    The pixel/sample generators are pure integer functions of
    (doc_id, index), mirroring the oracle's generate_series twin."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"path": [], "modality": [], "content": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    i = np.arange(_IMG_N, dtype=np.int64)
                    px = ((d * 7 + i * 13) % 256).astype(np.uint8)
                    content = encode_ppm(px.reshape(8, 8, 3))
                    modality, mime = "image", "image/x-portable-pixmap"
                else:
                    i = np.arange(_AUD_N, dtype=np.int64)
                    smp = (((d * 31 + i * 17) % 65536) - 32768).astype(np.int16)
                    content = encode_wav(smp, sample_rate=8000)
                    modality, mime = "audio", "audio/wav"
                rows["path"].append(str(d))
                rows["modality"].append(modality)
                rows["content"].append(content)
                rows["meta"].append({"length": len(content), "mime": mime})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(op, MEDIA_SCHEMA)


@query(
    "q91_multimodal_decode",
    sql=f"""
    WITH params AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
             CASE WHEN doc_id % 2 = 0 THEN {_IMG_N} ELSE {_AUD_N} END AS n
      FROM documents
    ),
    idx AS (
      SELECT doc_id, modality, n,
             unnest(generate_series(0, n - 1)) AS i
      FROM params
    ),
    vals AS (
      SELECT doc_id, modality, n,
             CASE WHEN modality = 'image'
                  THEN (doc_id * 7 + i * 13) % 256
                  ELSE ((doc_id * 31 + i * 17) % 65536) - 32768
             END AS v
      FROM idx
    )
    SELECT doc_id,
           modality,
           CAST(CASE WHEN modality = 'image' THEN 203 ELSE 556 END AS BIGINT) AS n_bytes,
           CAST(n AS BIGINT) AS n_units,
           CASE WHEN modality = 'image' THEN '8x8' ELSE '8000Hz' END AS dims,
           CAST(sum(v) AS DOUBLE) / n AS mean_val,
           sqrt(CAST(sum(v * v) AS DOUBLE) / n) AS rms
    FROM vals
    GROUP BY doc_id, modality, n
    """,
    operators=("X-multimodal", "X-multimodal-decode"),
)
def q91_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, end-to-end: synthesize an actual PPM (P6)
    image or WAV (PCM16) file per document, then parse it back with the
    dependency-free codecs (header walk + numpy frombuffer) and reduce
    the decoded pixels/samples to features (count, dims, mean, RMS) —
    all inside Arrow-batched ``mapInPandas``. The oracle recomputes
    every feature analytically from the integer generators, so a
    single wrong header byte, stride, or endianness flip fails the
    hash gate. Compressed formats (JPEG/MP3) remain a documented
    NotImplementedError boundary in ``operators.multimodal``."""
    docs = catalog.load(spark, sf_dir, "documents")
    feats = decode_media_features(_synthesize_media(docs))
    return feats.select(
        F.col("path").cast("long").alias("doc_id"),
        "modality",
        "n_bytes",
        "n_units",
        "dims",
        "mean_val",
        "rms",
    )


# --- q102: REAL PNG (zlib-compressed) encode→decode round trip -------------

#: 8×8 RGB PNG per document; rows cycle through ALL FIVE PNG filter
#: types (None/Sub/Up/Average/Paeth), so every unfilter branch of
#: ``decode_png`` is on the oracle-checked path. Pixel values are an
#: integer function of (doc_id, index) the oracle replays exactly.
_PNG_N = 8 * 8 * 3


def _synthesize_png(docs):
    """doc_id → real zlib-compressed PNG bytes via mapInPandas."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"path": [], "modality": [], "content": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                i = np.arange(_PNG_N, dtype=np.int64)
                px = ((d * 11 + i * 19) % 256).astype(np.uint8)
                content = encode_png(
                    px.reshape(8, 8, 3), filters=[0, 1, 2, 3, 4]
                )
                rows["path"].append(str(d))
                rows["modality"].append("image")
                rows["content"].append(content)
                rows["meta"].append({"length": len(content), "mime": "image/png"})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(op, MEDIA_SCHEMA)


@query(
    "q102_png_decode",
    sql=f"""
    WITH idx AS (
      SELECT doc_id, unnest(generate_series(0, {_PNG_N} - 1)) AS i
      FROM documents
    ),
    vals AS (
      SELECT doc_id, (doc_id * 11 + i * 19) % 256 AS v FROM idx
    )
    SELECT doc_id,
           'image' AS modality,
           CAST({_PNG_N} AS BIGINT) AS n_units,
           '8x8' AS dims,
           CAST(sum(v) AS DOUBLE) / {_PNG_N} AS mean_val,
           sqrt(CAST(sum(v * v) AS DOUBLE) / {_PNG_N}) AS rms
    FROM vals
    GROUP BY doc_id
    """,
    operators=("X-multimodal", "X-multimodal-decode"),
)
def q102_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-image decode, end-to-end and dependency-free: a real
    zlib-compressed PNG is synthesized per document (rows cycle
    through all five PNG filter types), then parsed back by
    ``decode_png`` (chunk walk + CRC check + inflate + unfilter)
    inside Arrow-batched ``mapInPandas``, and the decoded pixels
    reduce to analytic features. The oracle recomputes mean/RMS from
    the integer pixel generator — any inflate, unfilter, or stride bug
    fails the hash gate. (Byte length is NOT part of the contract:
    zlib stream size is an implementation detail, unlike the decoded
    pixels.)"""
    docs = catalog.load(spark, sf_dir, "documents")
    feats = decode_media_features(_synthesize_png(docs))
    return feats.select(
        F.col("path").cast("long").alias("doc_id"),
        "modality",
        "n_units",
        "dims",
        "mean_val",
        "rms",
    )
