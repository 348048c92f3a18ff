"""Salted-join equivalence + pipeline empty-input robustness."""

from __future__ import annotations

import pyspark.sql.functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.joins import salted_join
from portfolio1_etl_spark.pipeline import run_pipeline
from portfolio1_etl_spark.sources.connectors import empty_sales


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = catalog.load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("key"), "l_quantity"
    )
    p = catalog.load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("key"), "p_brand"
    )
    plain = li.join(p, "key").groupBy("p_brand").agg(F.sum("l_quantity").alias("q"))
    salted = (
        salted_join(li, p, "key", n_salts=4)
        .groupBy("p_brand")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame(
        [("hot", 1.0)] * 50 + [("cold", 2.0), ("orphan", 3.0)], "key string, v double"
    )
    small = spark.createDataFrame([("hot", "H"), ("cold", "C")], "key string, tag string")
    out = salted_join(big, small, "key", n_salts=4, how="left")
    rows = out.groupBy("key").count().collect()
    got = {r.key: r["count"] for r in rows}
    assert got == {"hot": 50, "cold": 1, "orphan": 1}
    assert out.filter(F.col("key") == "orphan").collect()[0].tag is None


def test_pipeline_with_all_channels_down(spark):
    """Every connector failed → typed empty union → every report is
    empty-but-well-typed and the inventory passes through untouched."""
    sales = empty_sales(spark)
    skus_map = spark.createDataFrame(
        [("a", "W", 1.0)], "sku_part string, sku_name string, multiplier double"
    )
    stock = spark.createDataFrame(
        [("W", 5.0, "s", "c", "Brand1")],
        "sku string, qty double, subcategory string, color string, brand string",
    )
    sales_map = spark.createDataFrame(
        [("a", 1.0, "Brand1")], "SKU string, cost double, brand string"
    )
    reports = run_pipeline(
        sales, skus_map, stock, sales_map,
        as_of=F.lit("2026-08-13").cast("timestamp_ntz"),
    )
    assert reports["soldvalue_retail"].count() == 0
    # right-join keeps the map row; NULL-skipping sum leaves NULL qty
    ws = reports["sold_items_wholesale"].collect()
    assert [(r.sku, r.qty) for r in ws] == [("W", None)]
    inv = reports["inventory_updated"].collect()
    assert [(r.sku, r.qty) for r in inv] == [("W", 5.0)]
    assert reports["brand1_summary"].count() == 0
