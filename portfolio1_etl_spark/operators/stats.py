"""Table statistics collection — the ANALYZE TABLE of this engine.

Join strategy at 100 TB is a statistics problem: broadcast vs
sort-merge, bucket counts, AQE skew thresholds, and partition layouts
all key off row counts, per-column cardinality, and value ranges. The
reference (a pandas script) sees its whole dataset in memory and never
needs them; a distributed engine maintains them as a tiny stats table
refreshed per maintenance window.

One pass, one job: every column's stats compute in a SINGLE aggregate
over the table (Spark fuses the agg expressions), so a 100 TB ANALYZE
costs exactly one scan — never a scan per column. Exact
``count(distinct)`` is used here because the oracle needs exact
values; the documented scale default is ``approx_count_distinct``
(HLL sketch, same single-pass shape, ±2%), which is what the
broadcast-threshold consumer actually wants.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_table_stats(
    df: DataFrame, cols: list[str], exact_ndv: bool = True
) -> DataFrame:
    """Long-format stats: one row per column — (column, n_rows,
    n_nulls, n_distinct, min_val, max_val) with min/max as doubles
    (numeric columns only; strings/dates stat via their own pass).
    The wide single-row aggregate computes every column's stats in ONE
    scan; the stack to long format is a driver-free narrow map."""
    ndv = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_ndv
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            ndv(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
        ]
    # project to the stat columns and spread to the configured
    # parallelism (r13): the exact-NDV form Expands every row ×(1 +
    # |cols|) with an all-columns dedup key, and that partial
    # aggregate inherited the scan's byte-budgeted splits (ONE split
    # at sf0.1 hashed 4.2 M expanded lineitem rows on one core).
    # Counts/NDV/min/max are exact and fold-order-free, so partition
    # layout cannot move a value.
    from portfolio1_etl_spark.parallelism import spread_rows

    wide = spread_rows(df.select(*cols)).agg(
        F.count(F.lit(1)).alias("__n"), *aggs
    )
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").cast("long").alias("n_rows"),
                    F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                    F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                    F.col(f"__mn_{c}").alias("min_val"),
                    F.col(f"__mx_{c}").alias("max_val"),
                )
                for c in cols
            ]
        )
    ).alias("s")
    return wide.select(stack).select("s.*")
