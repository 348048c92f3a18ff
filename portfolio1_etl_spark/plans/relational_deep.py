"""Deep relational analogues (r9): the remaining classic TPC-H query
shapes the registry had not yet exercised — multi-nation volume
shipping (Q7), regional market share (Q8), product profit (Q9),
returned-item report (Q10), customer order-count distribution (Q13),
promo revenue share (Q14), large-volume customers (Q18), and
disjunctive-predicate revenue (Q19) — adapted to this benchmark's
trimmed schemas (no partsupp/shipmode/commitdate; profit uses a
retail-price cost proxy).

Money determinism: every revenue aggregate flows through the decimal
spine (functions/exact.py — ``dsum_product`` ≡ the literal
``CAST(round(SUM(CAST(x AS DECIMAL(28,8))), 2) AS DOUBLE)`` twin);
shares/ratios divide two such exact decimal-backed doubles with the
identical expression tree in both engines.

Scale shapes: dimension joins broadcast (nation/region/part at any
SF; customer under AQE), fact-fact joins shuffle on their keys,
histograms aggregate twice (per-key then per-count) with map-side
partials, and every top-k breaks ties explicitly before LIMIT.

Reference analogue: none — the reference's pandas script has no
multi-table analytics; [ext] per SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.functions.exact import dsum_product
from portfolio1_etl_spark.plans.registry import query

#: the oracle twin of dsum_product, applied to a revenue expression
_DSUM = "CAST(round(SUM(CAST({x} AS DECIMAL(28,8))), 2) AS DOUBLE)"
_REV = "l.l_extendedprice * (1 - l.l_discount)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load(spark, sf_dir, name)


@query(
    "q198_volume_shipping",
    sql=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {_DSUM.format(x=_REV)} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '2000-01-01'
    GROUP BY 1, 2, 3
    """,
    operators=("J3", "J1", "X-tpch-q7", "A1"),
)
def q198_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analogue — bilateral trade volume: revenue shipped
    between two specific nations, split by direction and ship year.
    Plan: the nation-filtered supplier and customer sides broadcast
    into the lineitem→orders fact join (two tiny dims prune the fact
    rows early), ONE shuffle pair for the fact-fact join, then a
    map-side-combinable decimal aggregate on (nation, nation, year)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "2000-01-01")
        )
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum_product(rev).alias("revenue"))
    )


@query(
    "q199_market_share",
    sql=f"""
    WITH sales AS (
      SELECT year(o.o_orderdate) AS o_year,
             {_REV} AS rev,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
      {_DSUM.format(x="CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END")}
        AS nation_revenue,
      {_DSUM.format(x="rev")} AS total_revenue,
      round({_DSUM.format(x="CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END")}
            / {_DSUM.format(x="rev")}, 6) AS mkt_share
    FROM sales GROUP BY 1
    """,
    operators=("J3", "J1", "X-tpch-q8", "A1"),
)
def q199_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue — market share: the fraction of ASIA's PROMO-
    part revenue supplied by NATION_3, per order year. Both the
    numerator and denominator are exact decimal sums; their single
    division is the only float op (identical operands → identical
    bits in both engines, then a stabilizing 6 dp round). Plan: every
    dimension broadcasts; the fact pair shuffles once; one aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    nc = n.select("n_nationkey", "n_regionkey")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0)
    )
    sales = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(nc), F.col("c_nationkey") == nc["n_nationkey"])
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(
            F.broadcast(p.filter(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
    )
    return sales.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        dsum_product(nat_rev).alias("nation_revenue"),
        dsum_product(rev).alias("total_revenue"),
        F.round(
            dsum_product(nat_rev) / dsum_product(rev), 6
        ).alias("mkt_share"),
    )


@query(
    "q205_profit_by_nation_year",
    sql=f"""
    SELECT ns.n_name AS nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
           {_DSUM.format(
               x="l.l_extendedprice * (1 - l.l_discount)"
                 " - 0.6 * p.p_retailprice * l.l_quantity")} AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    GROUP BY 1, 2
    """,
    operators=("J3", "X-tpch-q9", "A1"),
)
def q205_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue — product profit by supplier nation and ship
    year, with a retail-price cost proxy (this benchmark has no
    partsupp): profit = revenue − 0.6·retail·qty. The per-row profit
    double is computed with the IDENTICAL expression tree in both
    engines (same bits), then snapped to DECIMAL(28,8) for the exact
    order-independent sum. Part and supplier dims broadcast; one
    map-side-combinable aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(
            "nation", F.year("l_shipdate").cast("long").alias("o_year")
        )
        .agg(dsum_product(profit).alias("profit"))
    )


@query(
    "q200_returned_items",
    sql=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           {_DSUM.format(x=_REV)} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    operators=("J3", "O2", "X-tpch-q10", "A1"),
)
def q200_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue — the returned-item customer report: the 20
    customers losing the most revenue to returns in one order year.
    Ties break on custkey before the LIMIT (registry determinism
    contract). Plan: date + returnflag predicates prune the facts at
    the scan, customer/nation broadcast, one aggregate, then a
    TakeOrderedAndProject top-20 (never a global sort)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            l["l_orderkey"] == o["o_orderkey"],
        )
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            dsum_product(rev).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q201_order_count_distribution",
    sql="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    operators=("J2", "X-tpch-q13", "A1"),
)
def q201_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue — the customer order-count histogram,
    including the zero bucket the LEFT join exists for (an inner join
    silently drops order-less customers). Double aggregation: orders
    collapse to per-customer counts on ONE shuffle (count(o_orderkey)
    ignores the null-extended rows), then the tiny count-of-counts
    fold."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy(
        F.col("c_count").cast("long").alias("c_count")
    ).agg(F.count(F.lit(1)).cast("long").alias("custdist"))


@query(
    "q202_promo_revenue",
    sql=f"""
    SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
      {_DSUM.format(x=f"CASE WHEN p.p_type = 'PROMO' THEN {_REV} ELSE 0 END")}
        AS promo_revenue,
      {_DSUM.format(x=_REV)} AS total_revenue,
      round(100.0
            * {_DSUM.format(
                x=f"CASE WHEN p.p_type = 'PROMO' THEN {_REV} ELSE 0 END")}
            / {_DSUM.format(x=_REV)}, 4) AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
    operators=("J3", "X-tpch-q14", "A1", "C4"),
)
def q202_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analogue — promotional revenue share per ship month.
    Numerator and denominator are exact decimal sums; the percentage
    divides identical doubles in both engines and rounds to 4 dp.
    Part broadcasts; one monthly aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias(
                "ship_month"
            )
        )
        .agg(
            dsum_product(promo).alias("promo_revenue"),
            dsum_product(rev).alias("total_revenue"),
            F.round(
                F.lit(100.0) * dsum_product(promo) / dsum_product(rev), 4
            ).alias("promo_share_pct"),
        )
    )


@query(
    "q203_large_volume_customers",
    sql="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             AS o_totalprice,
           CAST(b.sum_qty AS BIGINT) AS sum_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    operators=("J-semi", "X-tpch-q18", "A1", "W1"),
)
def q203_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue — large-volume customers: orders whose total
    line quantity exceeds 150 units, with their customer. The HAVING
    aggregate runs FIRST (one lineitem shuffle shrinking the facts to
    qualifying orderkeys), then the survivors join orders and the
    broadcast customer dim — never a lineitem-orders join before the
    filter. Quantities are integral doubles (exact sums, exact cast)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("o_totalprice")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("o_totalprice"),
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
    )


@query(
    "q204_disjunctive_revenue",
    sql=f"""
    SELECT {_DSUM.format(x=_REV)} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 5 AND 20
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 40
           AND l.l_quantity BETWEEN 25 AND 50)
    """,
    operators=("J3", "W5", "X-tpch-q19", "A1"),
)
def q204_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analogue — the disjunctive multi-attribute predicate
    (three OR'd brand/size/quantity envelopes) that exercises the
    optimizer's ability to keep an OR-of-ANDs as a post-join filter
    with the part dim broadcast, rather than exploding it into a
    union of three scans. One row out: exact decimal revenue and the
    qualifying line count."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    pred = (
        ((br == "Brand#1") & sz.between(1, 10) & q.between(1, 15))
        | ((br == "Brand#13") & sz.between(5, 20) & q.between(10, 25))
        | ((br == "Brand#19") & sz.between(20, 40) & q.between(25, 50))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .filter(pred)
        .agg(
            dsum_product(rev).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )
