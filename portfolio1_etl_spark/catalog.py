"""Table loading over the driver's parquet directories.

Parquet scans are the engine's default source: columnar, predicate
pushdown, column pruning — the pandas reference's manual "project to 3
columns ASAP" (portfolio-etl.py:73, :226) and "push date window into the
API query" (portfolio-etl.py:43, :109) optimizations are what Catalyst
does for free once the scan is declarative.

``load`` asserts the parquet footer matches the declared schema (names
and top-level order) instead of trusting inference — at 100 TB a schema
drift should fail loudly at plan time, not corrupt an aggregate.

events.parquet quirk: its ``ts`` column is parquet TIMESTAMP(NANOS),
which Spark's vectorized reader rejects. We enable
``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) and convert
nanos→micros with *integer* division (``div`` — a double intermediate
would lose precision above 2^53) into TIMESTAMP_NTZ, matching DuckDB's
naive-UTC truncation bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scratch_path(prefix: str, sf_dir: str) -> str:
    """Deterministic per-dataset tempdir location for queries that
    persist an artifact mid-run (the q135 index, the q168 chain):
    ``{tmp}/spark_graft_{prefix}_{md5(sf_dir)[:12]}``. One copy of the
    naming/hashing convention so artifact paths can't drift apart."""
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_{prefix}_{tag}")


def path_for(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_conf(spark: SparkSession) -> None:
    """Pin confs correctness depends on, even on a caller-built session."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str, validate: bool = True) -> DataFrame:
    """Scan one driver table; optionally validate column names/order."""
    _ensure_session_conf(spark)
    df = spark.read.parquet(path_for(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    if validate and name in schemas.DRIVER_TABLES:
        declared = [f.name for f in schemas.DRIVER_TABLES[name].fields]
        actual = df.columns
        if actual != declared:
            raise ValueError(
                f"schema drift in {name}: declared {declared}, parquet has {actual}"
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in schemas.DRIVER_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (for the SQL path)."""
    for name in schemas.DRIVER_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
