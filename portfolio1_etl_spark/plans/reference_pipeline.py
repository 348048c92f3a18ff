"""The reference's EP3 analytics pipeline (portfolio-etl.py:581-775),
re-expressed Spark-first over the driver tables.

Transposition (FIXTURES.md §B): lineitem ≈ the unioned multi-channel
``sales`` frame (l_partkey ≈ sku, l_quantity ≈ qty), supplier ≈ the
channel/site tag, part ≈ skus_map / sales_map / inventory. Every stage
of the reference dataflow appears: canonical (sku, qty, site)
normalization → cleaning → retail aggregate → wholesale multiplier
join → inventory decrement (in relational.q11) → cost/brand/date
enrichment → brand reports → the weekly lookback window.

Known reference bugs are consciously corrected per SURVEY.md §4.3
(no double union of a channel, masks computed on the frame's own
columns, qty kept numeric end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.functions import dsum_product
from portfolio1_etl_spark.plans.registry import query


def canonical_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical (sku, qty, site) order-line model every connector
    emits (portfolio-etl.py:215, :252; projections :73, :226, :276,
    :328), built from lineitem with the channel tag joined from the
    broadcast supplier dim. Cleaning pass = lowercase keys (:605), trim
    (:607), numeric qty end-to-end (:613 — corrected per §4.3.5)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    s = catalog.load(spark, sf_dir, "supplier")
    return li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey).select(
        F.lower(F.trim(F.col("l_partkey").cast("string"))).alias("sku"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.lower(F.trim(F.col("s_name"))).alias("site"),
        F.col("l_shipdate").alias("ship_ts"),
    )


_CANONICAL_SALES_SQL = """
      SELECT
        lower(trim(CAST(l.l_partkey AS VARCHAR))) AS sku,
        CAST(l.l_quantity AS DOUBLE)              AS qty,
        lower(trim(s.s_name))                     AS site,
        l.l_shipdate                              AS ship_ts
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
"""


@query(
    "q40_canonical_sales",
    sql=f"""
    WITH sales AS ({_CANONICAL_SALES_SQL})
    SELECT site, count(*) AS n_rows, sum(qty) AS qty
    FROM sales
    WHERE sku NOT LIKE '%sku%' AND sku IS NOT NULL
    GROUP BY site
    """,
    operators=("P1", "P2", "P3", "C1", "C2", "C4", "W3", "A4"),
)
def q40_canonical_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel row counts over the cleaned canonical model — the
    reference's per-channel operational prints (portfolio-etl.py
    :537-540, :599) as a real aggregate. The ``sku NOT LIKE '%sku%'``
    filter is the stray-header/sentinel strip (:602-604) with the
    NULL-safety correction from SURVEY.md §2.4 W3."""
    sales = canonical_sales(spark, sf_dir)
    return (
        sales.filter(~F.col("sku").contains("sku") & F.col("sku").isNotNull())
        .groupBy("site")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("qty").alias("qty"))
    )


@query(
    "q41_soldvalue_retail",
    sql=f"""
    WITH sales AS ({_CANONICAL_SALES_SQL})
    SELECT sku, sum(qty) AS qty
    FROM sales
    WHERE sku NOT LIKE '%sku%' AND sku IS NOT NULL
    GROUP BY sku
    """,
    operators=("A1", "C1", "C2", "C5", "W3", "P1"),
)
def q41_soldvalue_retail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retail aggregate ``soldvalue`` (portfolio-etl.py:610-615):
    project [sku, qty] → filter → cast → groupby-sum. The reference's
    cosmetic pre-sort (:614) is dropped — it feeds a groupby and is
    semantically dead (SURVEY.md §2.7 O1)."""
    sales = canonical_sales(spark, sf_dir)
    return (
        sales.filter(~F.col("sku").contains("sku") & F.col("sku").isNotNull())
        .select("sku", "qty")
        .groupBy("sku")
        .agg(F.sum("qty").alias("qty"))
    )


@query(
    "q42_wholesale_multiplier",
    sql=f"""
    WITH sales AS ({_CANONICAL_SALES_SQL}),
    soldvalue AS (
      SELECT sku, sum(qty) AS qty FROM sales GROUP BY sku
    ),
    skus_map AS (
      SELECT lower(trim(CAST(p_partkey AS VARCHAR))) AS sku_part,
             p_brand AS sku_name,
             CAST(p_size AS DOUBLE) AS multiplier
      FROM part
    )
    SELECT m.sku_name AS sku, sum(s.qty * m.multiplier) AS qty
    FROM soldvalue s RIGHT JOIN skus_map m ON s.sku = m.sku_part
    GROUP BY m.sku_name
    """,
    operators=("J1", "P5", "A2"),
)
def q42_wholesale_multiplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retail→wholesale map (portfolio-etl.py:621-628): RIGHT join
    onto skus_map (every map row kept), result = qty × multiplier
    (:625), re-aggregated by wholesale name (:627-628). Unmatched map
    rows → NULL qty → NULL product → dropped by NULL-skipping SUM —
    replicated on purpose (SURVEY.md §4.3.6). skus_map derives from the
    part dim (sku_part = partkey, sku_name = brand, multiplier = size).

    No broadcast hint on ``skus_map``: the preserved side of a right
    outer join cannot be broadcast (HintErrorLogger WARN + silent
    fallback), and neither leg of the flipped LEFT form qualifies
    either — sort-merge on the string sku is the honest plan, and
    tools/plan_audit.py asserts the registry optimizes hint-WARN-free."""
    p = catalog.load(spark, sf_dir, "part")
    skus_map = p.select(
        F.lower(F.trim(F.col("p_partkey").cast("string"))).alias("sku_part"),
        F.col("p_brand").alias("sku_name"),
        F.col("p_size").cast("double").alias("multiplier"),
    )
    soldvalue = (
        canonical_sales(spark, sf_dir).groupBy("sku").agg(F.sum("qty").alias("qty"))
    )
    return (
        soldvalue.join(skus_map, soldvalue.sku == skus_map.sku_part, "right")
        .groupBy(F.col("sku_name").alias("sku"))
        .agg(F.sum(F.col("qty") * F.col("multiplier")).alias("qty"))
    )


@query(
    "q43_enriched_sales",
    sql=f"""
    WITH sales AS ({_CANONICAL_SALES_SQL}),
    sales_map AS (
      SELECT lower(trim(CAST(p_partkey AS VARCHAR))) AS map_sku,
             p_retailprice AS cost, p_brand AS brand
      FROM part
    )
    SELECT
      m.brand,
      year(s.ship_ts)      AS yr,
      monthname(s.ship_ts) AS month_name,
      count(*)             AS n_lines,
      CAST(round(SUM(CAST(s.qty * m.cost AS DECIMAL(28,8))), 2) AS DOUBLE) AS total
    FROM sales s LEFT JOIN sales_map m ON trim(s.sku) = trim(m.map_sku)
    GROUP BY 1, 2, 3
    """,
    operators=("J3", "C2", "C6", "C8", "C10", "C11", "P5", "P6"),
)
def q43_enriched_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cost/brand/date enrichment (portfolio-etl.py:659-691): sales
    LEFT JOIN sales_map on trimmed keys (:661-668), total = qty × cost
    (:683), Year + English month name (:674-675) — taken from the
    line's ship date rather than the reference's nondeterministic
    ``datetime.now()`` (:672) so the oracle is reproducible."""
    p = catalog.load(spark, sf_dir, "part")
    sales_map = p.select(
        F.lower(F.trim(F.col("p_partkey").cast("string"))).alias("map_sku"),
        F.col("p_retailprice").alias("cost"),
        F.col("p_brand").alias("brand"),
    )
    sales = canonical_sales(spark, sf_dir)
    return (
        sales.join(
            F.broadcast(sales_map),
            F.trim(sales.sku) == F.trim(sales_map.map_sku),
            "left",
        )
        .groupBy(
            F.col("brand"),
            F.year("ship_ts").cast("long").alias("yr"),
            F.date_format("ship_ts", "MMMM").alias("month_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum_product(F.col("qty") * F.col("cost")).alias("total"),
        )
    )


@query(
    "q44_brand_report",
    sql=f"""
    WITH sales AS ({_CANONICAL_SALES_SQL}),
    sales_map AS (
      SELECT lower(trim(CAST(p_partkey AS VARCHAR))) AS map_sku,
             p_retailprice AS cost, p_brand AS brand
      FROM part
    ),
    enriched AS (
      SELECT s.sku, s.qty, m.cost, m.brand
      FROM sales s LEFT JOIN sales_map m ON s.sku = m.map_sku
    )
    SELECT sku, cost, sum(qty) AS qty,
           CAST(round(SUM(CAST(qty * cost AS DECIMAL(28,8))), 2) AS DOUBLE) AS total
    FROM enriched
    WHERE brand IN ('Brand#1', 'Brand#2', 'Brand#3')
    GROUP BY sku, cost
    """,
    operators=("A3", "W4", "W5", "P5"),
)
def q44_brand_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-brand report (portfolio-etl.py:688-689, :720-743):
    brand-filter then groupby (sku, cost) summing qty and total. The
    brand mask is computed on this frame's own ``brand`` column — the
    intended semantics of the reference's misaligned-index bug at :769
    (SURVEY.md §4.3.2)."""
    p = catalog.load(spark, sf_dir, "part")
    sales_map = p.select(
        F.lower(F.trim(F.col("p_partkey").cast("string"))).alias("map_sku"),
        F.col("p_retailprice").alias("cost"),
        F.col("p_brand").alias("brand"),
    )
    sales = canonical_sales(spark, sf_dir)
    return (
        sales.join(F.broadcast(sales_map), sales.sku == sales_map.map_sku, "left")
        .filter(F.col("brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .groupBy("sku", "cost")
        .agg(
            F.sum("qty").alias("qty"),
            dsum_product(F.col("qty") * F.col("cost")).alias("total"),
        )
    )


@query(
    "q45_weekly_lookback",
    sql="""
    SELECT o_orderpriority AS priority, count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >  TIMESTAMP '2001-08-01 00:00:00' - INTERVAL 7 DAY
      AND o_orderdate <= TIMESTAMP '2001-08-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    operators=("W2", "C12"),
)
def q45_weekly_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly 7-day lookback every connector pushes into its API
    query (portfolio-etl.py:42, :102, :158, :194, :287, :336, :379) —
    anchored at a fixed watermark instead of ``now()`` so the oracle is
    reproducible. At scale this predicate is the partition-pruning key."""
    o = catalog.load(spark, sf_dir, "orders")
    anchor = F.lit("2001-08-01").cast("timestamp_ntz")
    return (
        o.filter(
            (F.col("o_orderdate") > anchor - F.expr("INTERVAL 7 DAY"))
            & (F.col("o_orderdate") <= anchor)
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )
