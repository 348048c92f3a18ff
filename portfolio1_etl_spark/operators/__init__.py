"""Reusable operator library: the engine API a pipeline author calls
directly (the query registry in ``plans/`` exercises the same
primitives in oracle-checked form)."""

from portfolio1_etl_spark.operators.multimodal import (
    MEDIA_FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    decode_media_batch,
    featurize_media,
    read_media_dir,
)
from portfolio1_etl_spark.operators.sinks import (
    write_partitioned,
    write_report_csv,
    write_snapshot,
)

__all__ = [
    "MEDIA_SCHEMA",
    "MEDIA_FEATURES_SCHEMA",
    "read_media_dir",
    "featurize_media",
    "decode_media_batch",
    "write_partitioned",
    "write_report_csv",
    "write_snapshot",
]
