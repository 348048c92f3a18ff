"""Ingestion-surface tests: connector payload parsing (F1-F6),
file readers (S1-S4), fallbacks (S11), multi-tenant loops (S10) —
fixture payloads mirror the reference's API shapes (FIXTURES.md §A6)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from portfolio1_etl_spark.schemas import SALES
from portfolio1_etl_spark.sources import (
    Connector,
    file_feed,
    json_records,
    normalize_order_lines,
    parse_orders_xml,
    read_csv_with_preamble,
    read_tsv,
    run_connectors,
)

# --- fixture payloads (shaped like the reference's APIs) -------------------

WALMART_PAYLOAD = {  # nested orderLines.orderLine (portfolio-etl.py:57-76)
    "list": {
        "elements": {
            "order": [
                {
                    "purchaseOrderId": "PO1",
                    "orderLines": {
                        "orderLine": [
                            {"item": {"sku": "W-1"}, "orderLineQuantity": {"amount": "2"}},
                            {"item": {"sku": "W-2"}, "orderLineQuantity": {"amount": "1"}},
                        ]
                    },
                },
                {
                    "purchaseOrderId": "PO2",
                    "orderLines": {
                        "orderLine": [
                            {"item": {"sku": "W-1"}, "orderLineQuantity": {"amount": "3"}}
                        ]
                    },
                },
            ]
        }
    }
}

MIRAKL_PAYLOAD = {  # order_lines + CANCELED order (portfolio-etl.py:312-329)
    "orders": [
        {
            "order_state": "SHIPPING",
            "order_lines": [{"offer_sku": "M-1", "quantity": 2}],
        },
        {
            "order_state": "CANCELED",
            "order_lines": [{"offer_sku": "M-9", "quantity": 5}],
        },
    ]
}

HOUZZ_XML = """
<Orders>
  <Order><Status>Active</Status>
    <OrderItem><SKU>H-1</SKU><Quantity>2</Quantity></OrderItem>
    <OrderItem><SKU>H-2</SKU><Quantity>1</Quantity></OrderItem>
  </Order>
  <Order><Status>Active</Status>
    <OrderItem><SKU>H-1</SKU><Quantity>4</Quantity></OrderItem>
  </Order>
</Orders>
"""


def _walmart_parse(spark, payload):
    orders = json_records(spark, payload).select(
        F.explode("list.elements.order").alias("o")
    )
    return orders.select(F.explode("o.orderLines.orderLine").alias("l")).select(
        F.col("l.item.sku").cast("string").alias("sku"),
        F.col("l.orderLineQuantity.amount").cast("double").alias("qty"),
        F.lit("walmart").alias("site"),
    )


def _mirakl_parse(site):
    def parse(spark, payload):
        orders = json_records(spark, payload).select(F.explode("orders").alias("o")).select("o.*")
        return normalize_order_lines(
            orders,
            "order_lines",
            "offer_sku",
            "quantity",
            site,
            order_filter=F.col("order_state") != "CANCELED",
        )

    return parse


def test_walmart_nested_flatten(spark):
    df = _walmart_parse(spark, WALMART_PAYLOAD)
    rows = {(r.sku, r.qty) for r in df.collect()}
    assert rows == {("W-1", 2.0), ("W-2", 1.0), ("W-1", 3.0)}


def test_mirakl_canceled_filter(spark):
    df = _mirakl_parse("mirakl-a")(spark, MIRAKL_PAYLOAD)
    rows = [(r.sku, r.qty, r.site) for r in df.collect()]
    assert rows == [("M-1", 2.0, "mirakl-a")]


def test_houzz_xml(spark):
    df = parse_orders_xml(spark, [HOUZZ_XML], "houzz")
    rows = sorted((r.sku, r.qty) for r in df.collect())
    assert rows == [("H-1", 2.0), ("H-1", 4.0), ("H-2", 1.0)]


def test_connector_error_yields_typed_empty(spark):
    def boom():
        raise ConnectionError("marketplace down")

    c = Connector(name="dead", fetch=boom, parse=lambda s, p: None)
    res = c.run(spark)
    assert res.status == "ERROR" and res.rows == 0
    assert res.df.schema == SALES  # typed empty, not a sentinel row


def test_multi_tenant_union_and_run(spark):
    tenants = [{"site": "dsco-a"}, {"site": "dsco-b"}]

    def fetch(tenant):
        return {"orders": [
            {"order_state": "OK", "order_lines": [{"offer_sku": f"{tenant['site']}-sku", "quantity": 1}]}
        ], "_site": tenant["site"]}

    def parse(spark_, payload):
        return _mirakl_parse(payload["_site"])(spark_, payload)

    dsco = Connector(name="dsco", fetch=fetch, parse=parse, tenants=tenants)
    unioned, results = run_connectors(spark, [dsco])
    assert [r.status for r in results] == ["OK"]
    assert {r.site for r in unioned.collect()} == {"dsco-a", "dsco-b"}


def test_preamble_csv(spark, tmp_path):
    p = tmp_path / "macys.csv"
    p.write_text("report for week\n,,\ngenerated,by,export\nblank\nsku,qty\nM-1,2\nM-2,5\n")
    schema = T.StructType(
        [T.StructField("sku", T.StringType()), T.StructField("qty", T.DoubleType())]
    )
    df = read_csv_with_preamble(spark, str(p), skip_rows=4, schema=schema)
    assert sorted((r.sku, r.qty) for r in df.collect()) == [("M-1", 2.0), ("M-2", 5.0)]


def test_tsv_and_file_feed_fallback(spark, tmp_path):
    p = tmp_path / "amazon.tsv"
    p.write_text("asin\tunits\nA-1\t3\n")
    schema = T.StructType(
        [T.StructField("asin", T.StringType()), T.StructField("units", T.DoubleType())]
    )
    df = file_feed(
        spark, str(p), "amazon", "asin", "units", read_tsv, schema=schema
    )
    assert [(r.sku, r.qty, r.site) for r in df.collect()] == [("A-1", 3.0, "amazon")]

    missing = file_feed(
        spark, str(tmp_path / "nope.tsv"), "hsn", "a", "b", read_tsv, schema=schema
    )
    assert missing.count() == 0 and missing.schema == SALES


def test_wayfair_graphql_shape_topk(spark):
    # GraphQL response (portfolio-etl.py:376-437): orders with products;
    # source-side limit/sort becomes orderBy(desc).limit (O2).
    payload = {
        "data": {
            "purchaseOrders": [
                {"poNumber": "A", "poDate": "2024-01-03", "products": [{"partNumber": "WF-1", "quantity": 1}]},
                {"poNumber": "B", "poDate": "2024-01-05", "products": [{"partNumber": "WF-2", "quantity": 2}]},
                {"poNumber": "C", "poDate": "2024-01-01", "products": [{"partNumber": "WF-3", "quantity": 3}]},
            ]
        }
    }
    orders = json_records(spark, payload).select(F.explode("data.purchaseOrders").alias("o"))
    latest2 = orders.orderBy(F.col("o.poDate").desc()).limit(2)
    lines = latest2.select(F.explode("o.products").alias("p")).select(
        F.col("p.partNumber").alias("sku"), F.col("p.quantity").cast("double").alias("qty")
    )
    assert {r.sku for r in lines.collect()} == {"WF-1", "WF-2"}
