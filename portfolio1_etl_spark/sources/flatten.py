"""Semi-structured flattening — SURVEY.md §2.2 F1-F6, the reference's
signature ingestion operation.

Every pandas ``json_normalize`` / ``iterrows`` / ``explode + apply``
row loop (portfolio-etl.py:57, :63-76, :221-222, :265-266, :326-327,
:411-437) collapses to one declarative ``explode`` expression here —
O(rows) Python becomes whole-stage-codegen.

XML (the Houzz feed, portfolio-etl.py:98-135) goes through Spark 4's
native ``from_xml`` instead of an ElementTree walk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def explode_array_of_structs(df: DataFrame, array_path: str) -> DataFrame:
    """F1/F3: dig into a nested array-of-structs column and make rows —
    ``pd.json_normalize(record_path=[...])`` (portfolio-etl.py:57) /
    ``df.explode('line_items')`` + re-normalize (:221-222). Dotted
    paths traverse intermediate structs natively."""
    return df.select(F.explode(array_path).alias("_rec")).select("_rec.*")


def normalize_order_lines(
    df: DataFrame,
    array_col: str,
    sku_field: str,
    qty_field: str,
    site: str,
    order_filter: Column | None = None,
) -> DataFrame:
    """F2/F4/F6: one nested line-item array per order → canonical
    (sku, qty, site) rows. This single expression replaces the
    reference's per-row ``iterrows`` + json_normalize loop
    (portfolio-etl.py:63-76) and the Mirakl ``apply(pd.Series)``
    (:326-327). ``order_filter`` is the order-level predicate applied
    *before* the explode (the CANCELED strip, :325) — filtering early
    is the scale-relevant order of operations."""
    if order_filter is not None:
        df = df.filter(order_filter)
    line = F.explode(array_col).alias("_l")
    return df.select(line).select(
        F.col(f"_l.{sku_field}").cast("string").alias("sku"),
        F.col(f"_l.{qty_field}").cast("double").alias("qty"),
        F.lit(site).alias("site"),
    )


#: The Houzz order-feed shape: <Orders><Order><OrderItem><SKU/><Quantity/>
#: (portfolio-etl.py:124-135).
ORDERS_XML_SCHEMA = T.StructType(
    [
        T.StructField(
            "Order",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("Status", T.StringType()),
                        T.StructField(
                            "OrderItem",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("SKU", T.StringType()),
                                        T.StructField("Quantity", T.DoubleType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def parse_orders_xml(
    spark: SparkSession, xml_payloads: list[str], site: str
) -> DataFrame:
    """F5: XML order feed → canonical (sku, qty, site). The ElementTree
    ``.findall('.//Order')`` / ``.//OrderItem`` walk (portfolio-etl.py
    :124-135) becomes ``from_xml`` + two explodes; the XPath-ish
    ``.//`` is an explicit path here (schema-checked instead of
    silently matching anything)."""
    raw = spark.createDataFrame([(p,) for p in xml_payloads], "xml string")
    return (
        raw.select(F.from_xml("xml", ORDERS_XML_SCHEMA).alias("doc"))
        .select(F.explode("doc.Order").alias("o"))
        .select(F.explode("o.OrderItem").alias("i"))
        .select(
            F.col("i.SKU").cast("string").alias("sku"),
            F.col("i.Quantity").cast("double").alias("qty"),
            F.lit(site).alias("site"),
        )
    )
