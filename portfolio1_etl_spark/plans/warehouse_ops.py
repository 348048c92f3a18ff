"""[ext] Warehouse-maintenance queries: SCD2 history build and
MERGE-style upsert — the Delta-less emulations of `MERGE INTO` and
slowly-changing-dimension maintenance that a plain-parquet lake runs
as batch jobs.

Both are pure DataFrame plans (window functions / full-outer join +
coalesce); at scale the MERGE shape is one shuffle on the merge key
and SCD2 is one shuffle on the entity key — no driver-side loops, no
row-at-a-time logic. The streaming twin of the MERGE lives in
``streaming/jobs.py`` (foreachBatch inventory merge).

Money parity note: balance arithmetic goes through DECIMAL(18,2) in
BOTH engines (see functions/exact.py rationale) — double addition of
2-decimal money diverges from DuckDB on .xx5 boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.scd import scd2_rebuild
from portfolio1_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load(spark, sf_dir, name)


@query(
    "q46_scd2_intervals",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER w AS prev_type,
             row_number() OVER w AS seq
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type AS state, ts AS valid_from, seq
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           lead(valid_from) OVER w2 IS NULL AS is_current,
           CAST(row_number() OVER w2 AS BIGINT) AS version
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, seq)
    """,
    operators=("X-scd2", "Window-nav", "W-dedup-consecutive"),
)
def q46_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (type-2 slowly-changing-dimension) history build from an
    event stream: per user, consecutive duplicate states collapse
    (change detection via lag), each surviving change opens a validity
    interval closed by the next change's timestamp; the open interval
    is the current row. One shuffle on user_id serves all three window
    passes. This is the batch rebuild (operators/scd.scd2_rebuild);
    the incremental daily form is operators/scd.scd2_apply — replayed
    history of touched entities + new events through the same plan,
    equivalence asserted in tests/test_scd2.py."""
    return scd2_rebuild(_t(spark, sf_dir, "events"))


#: Merge cutoff: customers below it form the base dimension; order
#: activity from customers at/above it arrives as "new" keys → INSERT.
_MERGE_CUTOFF = 500


@query(
    "q47_merge_upsert",
    sql=f"""
    WITH base AS (
      SELECT c_custkey AS custkey, c_acctbal AS balance
      FROM customer WHERE c_custkey < {_MERGE_CUTOFF}
    ),
    changes AS (
      SELECT o_custkey AS custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS delta,
             count(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= DATE '1997-01-01'
      GROUP BY o_custkey
    )
    SELECT
      coalesce(b.custkey, c.custkey) AS custkey,
      CASE WHEN b.custkey IS NULL THEN 'insert'
           WHEN c.custkey IS NULL THEN 'keep'
           ELSE 'update' END AS action,
      CAST(coalesce(CAST(b.balance AS DECIMAL(18,2)), 0)
           + coalesce(CAST(c.delta AS DECIMAL(18,2)), 0) AS DOUBLE)
        AS new_balance,
      CAST(coalesce(c.n_orders, 0) AS BIGINT) AS n_orders
    FROM base b FULL OUTER JOIN changes c ON b.custkey = c.custkey
    """,
    operators=("X-merge-upsert", "J-full", "C13"),
)
def q47_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation on plain parquet: base dimension FULL
    OUTER JOIN the aggregated change set on the merge key, action
    classified per row (update / insert / keep), updated values via
    coalesce. The physical shape is ONE shuffle on the merge key
    (the aggregation and the join share it); matched-only bases
    ('keep') pass through untouched. The writer side (not part of the
    correctness surface) overwrites only the partitions containing
    touched keys — see operators/sinks.write_partitioned."""
    base = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < _MERGE_CUTOFF)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("balance"),
        )
    )
    changes = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("delta"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    b, c = base.alias("b"), changes.alias("c")
    merged = b.join(c, F.col("b.custkey") == F.col("c.custkey"), "full_outer")
    return merged.select(
        F.coalesce(F.col("b.custkey"), F.col("c.custkey")).alias("custkey"),
        F.when(F.col("b.custkey").isNull(), F.lit("insert"))
        .when(F.col("c.custkey").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
        (
            F.coalesce(F.col("b.balance").cast("decimal(18,2)"), F.lit(0))
            + F.coalesce(F.col("c.delta").cast("decimal(18,2)"), F.lit(0))
        )
        .cast("double")
        .alias("new_balance"),
        F.coalesce(F.col("c.n_orders"), F.lit(0)).cast("long").alias("n_orders"),
    )
