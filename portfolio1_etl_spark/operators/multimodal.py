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


RESIZED_SCHEMA = T.StructType(
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
                    T.StructField("target_px", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(media: DataFrame, target_px: int = 256) -> DataFrame:
    """Resize/transcode pass over a media column via mapInPandas. The
    pixel work is the stubbed part (no image libs in this image — a
    real decoder replaces ``_fake_resize`` verbatim); the Spark-side
    contract — binary in / smaller binary out per Arrow batch, metadata
    struct rewritten — is real and tested."""

    def _fake_resize(b: bytes) -> bytes:
        # deterministic stand-in: a resize produces smaller content
        # derived from the original (here: every other byte).
        return bytes(b[::2])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["content"].map(lambda b: _fake_resize(bytes(b)))
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "modality": pdf["modality"],
                    "content": resized,
                    "meta": [
                        {
                            "length": len(rb),
                            "mime": m["mime"],
                            "target_px": target_px,
                        }
                        for rb, m in zip(resized, pdf["meta"])
                    ],
                }
            )

    return media.repartition("modality").mapInPandas(op, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video/audio: one media row fans out to
    ``n_frames`` rows via mapInPandas (batch iterator in, exploded
    batch out — the one-to-many UDF shape). Frame extraction is the
    stubbed part (fixed-stride byte chunks stand in for decoded
    frames); the fan-out schema and batching are real."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"path": [], "frame_no": [], "frame": [], "n_bytes": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                stride = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    frame = b[i * stride : (i + 1) * stride]
                    rows["path"].append(path)
                    rows["frame_no"].append(i)
                    rows["frame"].append(frame)
                    rows["n_bytes"].append(len(frame))
            yield pd.DataFrame(rows)

    return media.repartition("modality").mapInPandas(op, FRAMES_SCHEMA)


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
