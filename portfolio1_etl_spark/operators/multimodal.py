"""[ext] Multimodal columns: image/audio/video as opaque BINARY columns
with typed metadata (SURVEY.md §2.13).

Spark-side design (all real and tested):
- media rows are ``(path, modality, content binary, meta struct)`` —
  the schema a 100 TB media lake actually uses (content inline for
  small objects, or a reference path for large ones);
- ingestion via ``spark.read.format('binaryFile')``;
- decode / feature-extraction runs in ``mapInPandas`` — Arrow batches
  of binary columns in, Arrow batches of features out, so the Python
  boundary is crossed per *batch*, never per row;
- partitioning by modality keeps decoder state (codec contexts) warm
  per task.

The actual pixel/sample decode is STUBBED: the execution image has no
image/audio libraries. ``decode_media_batch`` raises
``NotImplementedError`` for real decoding unless a library is present,
and the tested path uses a deterministic fake (content digest + length
-derived pseudo-features) — the plumbing (schema, batching, UDF
signature) is exactly what a real decoder drops into.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("length", T.LongType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_EXT_MODALITY = {
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "mp4": ("video", "video/mp4"),
}


def read_media_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest a directory of media files as typed binary rows via the
    binaryFile source (distributed scan; content never touches the
    driver)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    modality = F.coalesce(
        *[F.when(ext == k, F.lit(v[0])) for k, v in _EXT_MODALITY.items()],
        F.lit("unknown"),
    )
    mime = F.coalesce(
        *[F.when(ext == k, F.lit(v[1])) for k, v in _EXT_MODALITY.items()],
        F.lit("application/octet-stream"),
    )
    return raw.select(
        F.col("path"),
        modality.alias("modality"),
        F.col("content"),
        F.struct(F.col("length").alias("length"), mime.alias("mime")).alias("meta"),
    )


def decode_media_batch(content: bytes, modality: str) -> list[float]:
    """Decode one media object into a feature vector.

    STUB: real decoding needs PIL / soundfile / av, which this image
    does not ship. If a library is importable we'd decode for real;
    otherwise callers must use the deterministic fake in
    ``featurize_media`` (or hit this clearly-marked wall)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real media decode requires an image/audio library "
            "(PIL/soundfile/av) — not available in this image; "
            "use featurize_media's deterministic digest features"
        ) from None
    raise NotImplementedError("real decoder integration point")


def _fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoder+encoder: 8 floats derived
    from the sha256 digest — stable across engines and runs."""
    digest = hashlib.sha256(content).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def featurize_media(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Feature-extract every media row via mapInPandas: Arrow batches
    in, Arrow batches out. Repartitioned by modality so a real decoder
    initializes once per (task, codec) instead of per row."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": content.map(lambda b: _fake_features(bytes(b))),
                }
            )

    return media.repartition("modality").mapInPandas(op, MEDIA_FEATURES_SCHEMA)
