"""The reference ETL pipeline (portfolio-etl.py EP1-EP3) as a
composable, lazy, distributed module.

Stages map 1:1 to the reference's dataflow (SURVEY.md §3 EP3):

    connectors/file feeds → union → clean_sales → soldvalue ──┐
      soldvalue × skus_map → wholesale ──────────────────────┤
      stock × wholesale → inventory_update                   │ sinks
      clean_sales × sales_map → enrich → brand_reports ──────┘

Differences from the reference, all deliberate (SURVEY.md §4.3):
- each channel unions exactly once (no walmart double count, §4.3.1);
- brand masks use the frame's own column (§4.3.2);
- qty stays numeric end-to-end — we lowercase/trim only string key
  columns instead of stringifying the whole frame (§4.3.5);
- missing feeds contribute typed empty frames, not 'other' sentinel
  rows (the sentinels were deleted downstream anyway, §2.1 S11);
- the inventory write is an idempotent snapshot, never an in-place
  overwrite of a table still being read (§2.10 K2).

Scale shape: one narrow cleaning projection, two hash aggregates, and
three broadcast joins (the maps are dimension-sized) — the fact stream
shuffles only for its aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clean_sales(sales: DataFrame) -> DataFrame:
    """portfolio-etl.py:602-613: strip stray header/sentinel rows
    ('sku', 'Item SKU', 'other'), lowercase + trim the key, coerce qty
    to double (NULL on unparseable — pd.to_numeric(errors='coerce')
    parity via try_cast)."""
    sku = F.lower(F.trim(F.col("sku").cast("string")))
    return (
        sales.withColumn("sku", sku)
        .filter(
            F.col("sku").isNotNull()
            & ~F.col("sku").contains("sku")
            & (F.col("sku") != "other")
        )
        .withColumn("qty", F.expr("try_cast(qty AS DOUBLE)"))
    )


def soldvalue(sales_clean: DataFrame) -> DataFrame:
    """portfolio-etl.py:615: retail sold quantity per SKU."""
    return (
        sales_clean.select("sku", "qty").groupBy("sku").agg(F.sum("qty").alias("qty"))
    )


def wholesale(soldvalue_df: DataFrame, skus_map: DataFrame) -> DataFrame:
    """portfolio-etl.py:621-628: RIGHT join the component map (keep
    every map row), scale by multiplier, re-aggregate by wholesale
    name. Unmatched map rows: NULL qty → NULL product → skipped by
    SUM (replicated semantics, §4.3.6)."""
    return (
        soldvalue_df.join(
            F.broadcast(skus_map),
            soldvalue_df.sku == skus_map.sku_part,
            "right",
        )
        .withColumn("result", F.col("qty") * F.col("multiplier"))
        .groupBy(F.col("sku_name").alias("sku"))
        .agg(F.sum("result").alias("qty"))
    )


def inventory_update(stock: DataFrame, sold: DataFrame) -> DataFrame:
    """portfolio-etl.py:634-646: stock LEFT JOIN sold on sku,
    fillna(0), new_qty = on-hand − sold, reference column order."""
    s = sold.select("sku", F.col("qty").alias("sold_qty"))
    return (
        stock.join(s, "sku", "left")
        .withColumn("sold_qty", F.coalesce(F.col("sold_qty"), F.lit(0.0)))
        .withColumn("qty", F.col("qty") - F.col("sold_qty"))
        .select("sku", "qty", "subcategory", "color", "brand")
    )


def enrich(
    sales_clean: DataFrame, sales_map: DataFrame, as_of: Column | None = None
) -> DataFrame:
    """portfolio-etl.py:659-691: cost/brand enrichment (trimmed-key
    LEFT join, :661-668), run date + Year + English month name
    (:672-678), safe numeric coercion (:680-681), total = qty × cost
    (:683). ``as_of`` defaults to current_date() like the reference;
    tests inject a fixed date for determinism."""
    if as_of is None:
        as_of = F.current_date().cast("timestamp_ntz")
    m = sales_map.select(
        F.trim(F.col("SKU").cast("string")).alias("_map_sku"),
        F.expr("try_cast(cost AS DOUBLE)").alias("cost"),
        "brand",
    )
    return (
        sales_clean.join(
            F.broadcast(m), F.trim(F.col("sku")) == F.col("_map_sku"), "left"
        )
        .drop("_map_sku")
        .withColumn("date", F.date_format(as_of, "MM-dd-yyyy"))
        .withColumn("Year", F.year(as_of))
        .withColumn("Month", F.date_format(as_of, "MMMM"))
        .withColumn("qty", F.expr("try_cast(qty AS DOUBLE)"))
        .withColumn("total", F.col("qty") * F.col("cost"))
    )


def brand_split(enriched: DataFrame, *brands: str) -> DataFrame:
    """portfolio-etl.py:688-689/:769-770: per-brand report slice —
    the mask is on THIS frame's brand column (intended semantics of
    the reference's misaligned-index bug, §4.3.2)."""
    return enriched.filter(F.col("brand").isin(*brands))


def brand_summary(enriched_slice: DataFrame) -> DataFrame:
    """portfolio-etl.py:720-743: per-(sku, cost) quantity + revenue."""
    return enriched_slice.groupBy("sku", "cost").agg(
        F.sum("qty").alias("qty"), F.sum("total").alias("total")
    )


def run_pipeline(
    sales: DataFrame,
    skus_map: DataFrame,
    stock: DataFrame,
    sales_map: DataFrame,
    as_of: Column | None = None,
) -> dict[str, DataFrame]:
    """EP3 end-to-end, returning every report the reference writes
    (the sinks in SURVEY.md §2.10 are applied by the caller via
    operators.sinks). ``soldvalue`` and the cleaned union feed three
    downstream branches, so they are cached — Catalyst does not
    auto-materialize shared subplans across actions (SURVEY.md §4.1)."""
    cleaned = clean_sales(sales).cache()
    sv = soldvalue(cleaned).cache()
    ws = wholesale(sv, skus_map)
    inv = inventory_update(stock, ws)
    enriched = enrich(cleaned, sales_map, as_of=as_of)
    return {
        "soldvalue_retail": sv,
        "sold_items_wholesale": ws,
        "inventory_updated": inv,
        "sales_enriched": enriched,
        "brand1_summary": brand_summary(brand_split(enriched, "Brand1")),
        "brand23_summary": brand_summary(brand_split(enriched, "brand2", "brand3")),
    }
