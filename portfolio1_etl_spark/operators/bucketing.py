"""Bucketed (shuffle-free) joins — the co-location tool for repeated
fact×fact joins at scale (pyspark guide "Partitioning & shuffle").

A 100 TB lineitem⋈orders that runs nightly should not shuffle either
side every night: bucket both tables by the join key once at write
time, and every subsequent join on that key is a zipped scan-join —
no Exchange in the plan. Tested in tests/test_bucketing.py by
asserting the Exchange disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join
    key. Sorting within buckets upgrades later joins from shuffled
    sort-merge to a merge of pre-sorted buckets."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
