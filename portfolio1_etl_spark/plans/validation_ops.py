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
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# q276 — functional-dependency violation census (r11)
# ---------------------------------------------------------------------------

#: candidate FDs profiled by q276: (label, table, determinant, dependent)
_FD_CANDIDATES = (
    ("part: p_brand -> p_type", "part", "p_brand", "p_type"),
    ("part: p_name -> p_brand", "part", "p_name", "p_brand"),
    ("part: p_size -> p_type", "part", "p_size", "p_type"),
    ("nation: n_name -> n_regionkey", "nation", "n_name", "n_regionkey"),
    ("nation: n_regionkey -> n_name", "nation", "n_regionkey", "n_name"),
    ("customer: c_nationkey -> c_mktsegment", "customer", "c_nationkey",
     "c_mktsegment"),
    ("orders: o_custkey -> o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
)


def _fd_sql() -> str:
    parts = []
    for label, table, det, dep in _FD_CANDIDATES:
        parts.append(f"""
    SELECT '{label}' AS fd,
           CAST(count(*) AS BIGINT) AS n_determinants,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
           CAST(max(nd) AS BIGINT) AS max_dependents,
           CASE WHEN max(nd) = 1 THEN 1 ELSE 0 END AS holds
    FROM (SELECT {det}, count(DISTINCT {dep}) AS nd
          FROM {table} GROUP BY 1)""")
    return "\nUNION ALL\n".join(parts)


@query(
    "q276_fd_violation_census",
    sql=_fd_sql(),
    operators=("X-data-profiling", "X-fd-discovery", "A-distinct", "U1"),
)
def q276_fd_violation_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling — the schema-discovery pass a
    data catalog runs before trusting a column as a lookup key: for
    each candidate FD X → Y, group to determinant grain, count
    distinct dependents, and report how many determinant values
    violate (nd > 1), the worst fan-out, and whether the FD holds
    exactly. The candidate set spans held FDs (nation name → region)
    and violated ones (brand → type) so both verdict paths stay
    exercised. Each candidate is one partial-aggregated group-by at
    DETERMINANT grain (bounded by the value domain, not the row
    count) followed by a 1-row reduce; the seven probes union into a
    single census table. At 100 TB this is the profile you run ONCE
    and cache in the catalog — every probe is a full-scan aggregate,
    but each is embarrassingly parallel with a map-side
    count-distinct partial (Spark plans distinct-aggregate as a
    two-stage expand; determinant grain keeps stage two tiny)."""
    out = None
    for label, table, det, dep in _FD_CANDIDATES:
        t = catalog.load(spark, sf_dir, table)
        per_det = t.groupBy(det).agg(
            F.countDistinct(dep).alias("nd")
        )
        row = per_det.agg(
            F.lit(label).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_determinants"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.max("nd").cast("long").alias("max_dependents"),
            F.when(F.max("nd") == 1, F.lit(1)).otherwise(F.lit(0)).alias(
                "holds"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# q282 — k-anonymity / l-diversity census (r11)
# ---------------------------------------------------------------------------

#: quasi-identifier sets q282 audits on customer (sensitive attribute:
#: account in arrears, c_acctbal < 0)
_QI_SETS = (
    ("nation", ("c_nationkey",)),
    ("segment", ("c_mktsegment",)),
    ("nation+segment", ("c_nationkey", "c_mktsegment")),
)

_K_ANON = 5
_L_DIV = 2


def _kanon_sql() -> str:
    parts = []
    for label, cols in _QI_SETS:
        qi = ", ".join(cols)
        parts.append(f"""
    SELECT '{label}' AS qi_set,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(sz) AS BIGINT) AS min_group_size,
           CAST(sum(CASE WHEN sz < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_k,
           CAST(sum(CASE WHEN sz < {_K_ANON} THEN sz ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l < {_L_DIV} THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_l
    FROM (SELECT {qi}, count(*) AS sz,
                 count(DISTINCT CASE WHEN c_acctbal < 0
                       THEN 1 ELSE 0 END) AS l
          FROM customer GROUP BY {qi})""")
    return "\nUNION ALL\n".join(parts)


@query(
    "q282_k_anonymity_census",
    sql=_kanon_sql(),
    operators=("X-privacy-audit", "X-k-anonymity", "A-distinct", "U1"),
)
def q282_k_anonymity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy tier's
    release-gate companion to q115's PII redaction and q161's DP
    counts: before a table ships, every candidate quasi-identifier
    set is graded on how re-identifiable its groups are (groups
    smaller than k=5, rows inside them) and whether the sensitive
    attribute (account in arrears) is diverse within groups (l≥2 —
    a group where everyone is in arrears leaks the attribute even at
    k-anonymous size). Each QI set is one group-by at QI-domain grain
    with a two-value distinct (partial-aggregated map-side) and a
    1-row reduce; the three audits union into the census. At 100 TB
    the QI grain is the value domain — nations × segments, not
    customers — so the audit costs one scan however large the table
    gets. Integer counts only; nothing to round."""
    out = None
    cust = catalog.load(spark, sf_dir, "customer")
    for label, cols in _QI_SETS:
        grp = cust.groupBy(*cols).agg(
            F.count(F.lit(1)).alias("sz"),
            F.countDistinct(
                F.when(F.col("c_acctbal") < 0, 1).otherwise(0)
            ).alias("l"),
        )
        row = grp.agg(
            F.lit(label).alias("qi_set"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("sz").cast("long").alias("min_group_size"),
            F.sum(F.when(F.col("sz") < _K_ANON, 1).otherwise(0))
            .cast("long")
            .alias("groups_below_k"),
            F.sum(F.when(F.col("sz") < _K_ANON, F.col("sz")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.min("l").cast("long").alias("min_l"),
            F.sum(F.when(F.col("l") < _L_DIV, 1).otherwise(0))
            .cast("long")
            .alias("groups_below_l"),
        )
        out = row if out is None else out.unionByName(row)
    return out
