"""End-to-end demo: what the reference script did weekly, as this
engine's pipeline — run ``python -m portfolio1_etl_spark.demo``.

Wires fixture-payload connectors (Walmart-shaped nested JSON, a
Houzz-shaped XML feed, one dead marketplace) through the canonical
union into the full EP3 pipeline and writes every report the reference
wrote (CSV report, partitioned enriched sales, inventory snapshot) to
a temp directory. No network, no external state — the connector fetch
functions are injected, exactly as a production deployment would
inject real HTTP clients.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from portfolio1_etl_spark import get_spark
from portfolio1_etl_spark.operators import (
    write_partitioned,
    write_report_csv,
    write_snapshot,
)
from portfolio1_etl_spark.pipeline import run_pipeline
from portfolio1_etl_spark.sources import (
    Connector,
    json_records,
    parse_orders_xml,
    run_connectors,
)

WALMART_PAYLOAD = {
    "list": {
        "elements": {
            "order": [
                {"orderLines": {"orderLine": [
                    {"item": {"sku": "AB-1"}, "orderLineQuantity": {"amount": "2"}}]}},
                {"orderLines": {"orderLine": [
                    {"item": {"sku": "CD-2"}, "orderLineQuantity": {"amount": "1.5"}}]}},
            ]
        }
    }
}

HOUZZ_XML = (
    "<Orders><Order><OrderItem><SKU>AB-1</SKU><Quantity>3</Quantity>"
    "</OrderItem></Order></Orders>"
)


def _walmart_parse(spark, payload):
    orders = json_records(spark, payload).select(
        F.explode("list.elements.order").alias("o")
    )
    return orders.select(F.explode("o.orderLines.orderLine").alias("l")).select(
        F.col("l.item.sku").cast("string").alias("sku"),
        F.col("l.orderLineQuantity.amount").cast("double").alias("qty"),
        F.lit("walmart").alias("site"),
    )


def main() -> None:
    spark = get_spark(app_name="demo")
    connectors = [
        Connector("walmart", lambda: WALMART_PAYLOAD, _walmart_parse),
        Connector("houzz", lambda: HOUZZ_XML, lambda s, p: parse_orders_xml(s, [p], "houzz")),
        Connector("faire", lambda: (_ for _ in ()).throw(ConnectionError("down")),
                  lambda s, p: None),
    ]
    sales, results = run_connectors(spark, connectors)
    for r in results:
        print(f"channel {r.name}: rows={r.rows} status={r.status}")

    skus_map = spark.createDataFrame(
        [("ab-1", "WH-A", 2.0), ("cd-2", "WH-A", 1.0)],
        "sku_part string, sku_name string, multiplier double",
    )
    stock = spark.createDataFrame(
        [("WH-A", 100.0, "sets", "red", "Brand1")],
        "sku string, qty double, subcategory string, color string, brand string",
    )
    sales_map = spark.createDataFrame(
        [("ab-1", 10.0, "Brand1"), ("cd-2", 4.0, "brand2")],
        "SKU string, cost double, brand string",
    )
    reports = run_pipeline(sales, skus_map, stock, sales_map)

    out = tempfile.mkdtemp(prefix="p1etl_demo_")
    write_report_csv(reports["soldvalue_retail"], os.path.join(out, "soldvalue_retail"))
    write_partitioned(reports["sales_enriched"], os.path.join(out, "sales_enriched"), ["brand"])
    write_snapshot(reports["inventory_updated"], os.path.join(out, "inventory"))
    for name in ["soldvalue_retail", "sold_items_wholesale", "inventory_updated"]:
        print(f"--- {name} ---")
        for row in reports[name].collect():
            print(dict(row.asDict()))
    print(f"reports written under {out}")
    spark.stop()


if __name__ == "__main__":
    main()
