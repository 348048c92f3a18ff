"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke, sf0.001).
``queries()`` — name → (spark, sf_dir) -> DataFrame, one per implemented
operator from SURVEY.md §2 (see portfolio1_etl_spark/plans/*).
``oracle_sql()`` — matching ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from portfolio1_etl_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
