"""Golden end-to-end test of the reference pipeline replica over
reference-shaped fixtures (FIXTURES.md §A) — every edge case the
reference hits: stray header rows, sentinels, unparseable qty, map
rows without sales, stock without sales, null cost, mixed case and
whitespace. Expectations are computed by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portfolio1_etl_spark.pipeline import (
    brand_split,
    brand_summary,
    clean_sales,
    enrich,
    inventory_update,
    run_pipeline,
    soldvalue,
    wholesale,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    sales = spark.createDataFrame(
        [
            ("  AB-1 ", "2", "walmart"),     # whitespace + stringly qty
            ("ab-1", "3", "houzz"),          # same sku, different case
            ("CD-2", "1.5", "faire"),
            ("sku", "1", "walmart"),         # stray header row (dropped)
            ("Item SKU", "9", "hsn"),        # stray header row (dropped)
            ("other", "0", "macys"),         # sentinel (dropped)
            ("EF-3", "junk", "wayfair"),     # unparseable qty → NULL
            ("EF-3", "4", "wayfair"),
        ],
        "sku string, qty string, site string",
    )
    skus_map = spark.createDataFrame(
        [
            ("ab-1", "WH-A", 2.0),
            ("cd-2", "WH-A", 1.0),
            ("zz-9", "WH-Z", 3.0),           # map row with no sales
        ],
        "sku_part string, sku_name string, multiplier double",
    )
    stock = spark.createDataFrame(
        [
            ("WH-A", 100.0, "sets", "red", "Brand1"),
            ("WH-Z", 50.0, "sets", "blue", "brand2"),
            ("WH-Q", 7.0, "parts", "green", "brand3"),  # stock, no sales
        ],
        "sku string, qty double, subcategory string, color string, brand string",
    )
    sales_map = spark.createDataFrame(
        [
            (" ab-1 ", 10.0, "Brand1"),      # key needs trimming
            ("cd-2", None, "brand2"),        # null cost
            ("ef-3", 2.5, "brand3"),
        ],
        "SKU string, cost double, brand string",
    )
    return sales, skus_map, stock, sales_map


def test_clean_sales(spark, fixtures):
    sales, *_ = fixtures
    got = {(r.sku, r.qty) for r in clean_sales(sales).collect()}
    assert got == {
        ("ab-1", 2.0),
        ("ab-1", 3.0),
        ("cd-2", 1.5),
        ("ef-3", None),  # coerced, not dropped (dropped later by NULL-skipping sum)
        ("ef-3", 4.0),
    }


def test_soldvalue(spark, fixtures):
    sales, *_ = fixtures
    got = {(r.sku, r.qty) for r in soldvalue(clean_sales(sales)).collect()}
    assert got == {("ab-1", 5.0), ("cd-2", 1.5), ("ef-3", 4.0)}


def test_wholesale_right_join_null_semantics(spark, fixtures):
    sales, skus_map, *_ = fixtures
    ws = wholesale(soldvalue(clean_sales(sales)), skus_map)
    got = {(r.sku, r.qty) for r in ws.collect()}
    # WH-A = 5*2 + 1.5*1 = 11.5 ; WH-Z has no sales → NULL-skipping sum → NULL
    assert got == {("WH-A", 11.5), ("WH-Z", None)}


def test_inventory_update(spark, fixtures):
    sales, skus_map, stock, _ = fixtures
    ws = wholesale(soldvalue(clean_sales(sales)), skus_map)
    inv = {r.sku: (r.qty, r.brand) for r in inventory_update(stock, ws).collect()}
    assert inv["WH-A"] == (100.0 - 11.5, "Brand1")
    assert inv["WH-Z"] == (50.0, "brand2")  # NULL sold → coalesce(0) → untouched
    assert inv["WH-Q"] == (7.0, "brand3")  # no sales at all → untouched


def test_enrich_and_brand_reports(spark, fixtures):
    sales, _, _, sales_map = fixtures
    as_of = F.lit("2026-08-13").cast("timestamp_ntz")
    enriched = enrich(clean_sales(sales), sales_map, as_of=as_of)
    one = enriched.filter(F.col("sku") == "ab-1").limit(1).collect()[0]
    assert (one.date, one.Year, one.Month) == ("08-13-2026", 2026, "August")

    b1 = brand_summary(brand_split(enriched, "Brand1"))
    rows = {(r.sku, r.cost): (r.qty, r.total) for r in b1.collect()}
    assert rows == {("ab-1", 10.0): (5.0, 50.0)}

    b23 = brand_summary(brand_split(enriched, "brand2", "brand3"))
    rows23 = {(r.sku, r.cost): (r.qty, r.total) for r in b23.collect()}
    # cd-2: null cost → total NULL-skipped; ef-3: 4.0*2.5 (junk row NULL qty skipped)
    assert rows23 == {("cd-2", None): (1.5, None), ("ef-3", 2.5): (4.0, 10.0)}


def test_run_pipeline_all_reports(spark, fixtures):
    sales, skus_map, stock, sales_map = fixtures
    reports = run_pipeline(
        sales, skus_map, stock, sales_map,
        as_of=F.lit("2026-08-13").cast("timestamp_ntz"),
    )
    assert set(reports) == {
        "soldvalue_retail",
        "sold_items_wholesale",
        "inventory_updated",
        "sales_enriched",
        "brand1_summary",
        "brand23_summary",
    }
    for name, df in reports.items():
        assert df.count() >= 0, name  # every branch executes
