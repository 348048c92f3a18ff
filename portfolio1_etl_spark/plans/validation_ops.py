"""Data-quality gate on the scoreboard (r8): the declarative
validation suite (operators/validation.py) over the warehouse tables
— per-table single-pass constraint aggregates plus referential
containment, one unified report.

Reference analogue: the reference script's implicit cleaning steps
(dropna / type coercion, portfolio-etl.py) — here declared, counted,
and gate-able; [ext] per SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators import validation as V
from portfolio1_etl_spark.plans.registry import query


@query(
    "q186_validation_suite",
    sql="""
    WITH o AS (
      SELECT
        count(*) FILTER (o_orderkey IS NULL) AS m_nn,
        count(*) - count(DISTINCT o_orderkey)
                 - count(*) FILTER (o_orderkey IS NULL) AS m_uq,
        count(*) FILTER (o_orderstatus NOT IN ('P', 'O', 'F')
                         OR o_orderstatus IS NULL) AS m_st,
        count(*) FILTER (o_totalprice IS NULL
                         OR o_totalprice < 0 OR o_totalprice > 1e9) AS m_tp
      FROM orders
    ),
    l AS (
      SELECT
        count(*) FILTER (l_quantity IS NULL
                         OR l_quantity < 1 OR l_quantity > 50) AS m_qty,
        count(*) FILTER (l_discount IS NULL
                         OR l_discount < 0 OR l_discount > 0.5) AS m_disc
      FROM lineitem
    ),
    ri1 AS (
      SELECT count(*) AS m FROM (
        SELECT DISTINCT o_custkey AS k FROM orders
        EXCEPT SELECT DISTINCT c_custkey FROM customer
      )
    ),
    ri2 AS (
      SELECT count(*) AS m FROM (
        SELECT DISTINCT l_orderkey AS k FROM lineitem
        EXCEPT SELECT DISTINCT o_orderkey FROM orders
      )
    )
    SELECT check_name, CAST(metric AS DOUBLE) AS metric,
           CAST(CASE WHEN metric = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
    FROM (
      SELECT 'orders.orderkey.not_null' AS check_name, m_nn AS metric FROM o
      UNION ALL SELECT 'orders.orderkey.unique', m_uq FROM o
      UNION ALL SELECT 'orders.status.accepted', m_st FROM o
      UNION ALL SELECT 'orders.totalprice.range', m_tp FROM o
      UNION ALL SELECT 'lineitem.quantity.range', m_qty FROM l
      UNION ALL SELECT 'lineitem.discount.range', m_disc FROM l
      UNION ALL SELECT 'orders.custkey.in_customer', m FROM ri1
      UNION ALL SELECT 'lineitem.orderkey.in_orders', m FROM ri2
    )
    """,
    operators=("X-validation-suite", "A-distinct", "J-anti", "U1"),
)
def q186_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The validation suite report: eight constraints across three
    tables — null/unique/accepted-values/range checks compiled into
    ONE wide aggregate per table (one scan each, map-side combinable)
    plus two referential-containment checks at distinct-key grain
    (left-anti joins; the dim side broadcasts when small). Every
    metric counts violations, so the pass bit is uniform and the
    report is directly gate-able. On this (clean) dataset every check
    passes; the fuzz/pytest side proves the violation counters move
    (tests/test_validation.py seeds dirty rows)."""
    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    cust = catalog.load(spark, sf_dir, "customer")
    return V.validation_report(
        [
            V.run_checks(
                orders,
                [
                    V.not_null("orders.orderkey.not_null", "o_orderkey"),
                    V.unique("orders.orderkey.unique", "o_orderkey"),
                    V.accepted_values(
                        "orders.status.accepted",
                        "o_orderstatus",
                        ["P", "O", "F"],
                    ),
                    V.in_range(
                        "orders.totalprice.range", "o_totalprice", 0, 1e9
                    ),
                ],
            ),
            V.run_checks(
                li,
                [
                    V.in_range("lineitem.quantity.range", "l_quantity", 1, 50),
                    V.in_range(
                        "lineitem.discount.range", "l_discount", 0, 0.5
                    ),
                ],
            ),
            V.referential_check(
                "orders.custkey.in_customer",
                orders,
                "o_custkey",
                cust,
                "c_custkey",
            ),
            V.referential_check(
                "lineitem.orderkey.in_orders",
                li,
                "l_orderkey",
                orders,
                "o_orderkey",
            ),
        ]
    )
