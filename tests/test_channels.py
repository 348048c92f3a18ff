"""All 13 reference channels end-to-end with fixture payloads/files:
7 API connector families (incl. both multi-tenant loops) + 6 file
feeds → one canonical union, each channel exactly once."""

from __future__ import annotations

import pytest

from portfolio1_etl_spark.sources.channels import (
    DSCO_SITES,
    MIRAKL_SITES,
    build_api_connectors,
    build_file_feeds,
)
from portfolio1_etl_spark.sources.connectors import run_connectors

WALMART = {"list": {"elements": {"order": [
    {"orderLines": {"orderLine": [
        {"item": {"sku": "W-1"}, "orderLineQuantity": {"amount": "2"}}]}},
]}}}
HOUZZ = "<Orders><Order><OrderItem><SKU>H-1</SKU><Quantity>1</Quantity></OrderItem></Order></Orders>"
FAIRE = {"orders": [{"items": [{"sku": "F-1", "quantity": 3}]}]}
WOO = {"orders": [{"line_items": [{"sku": "B-1", "quantity": 1}]}]}
# Real response shape: orders nest under the GraphQL operation name
# (reference portfolio-etl.py:413-414).
WAYFAIR = {"data": {"getDropshipPurchaseOrders": [
    {"poDate": "2024-01-05", "products": [{"partNumber": "WF-1", "quantity": 2}]},
]}}

# Legacy/re-keyed payload shape, still accepted.
WAYFAIR_LEGACY = {"data": {"purchaseOrders": [
    {"poDate": "2024-01-05", "products": [{"partNumber": "WF-2", "quantity": 3}]},
]}}


def _fetchers():
    return {
        "walmart": lambda: WALMART,
        "houzz": lambda: HOUZZ,
        "faire": lambda: FAIRE,
        "woocommerce": lambda: WOO,
        "wayfair": lambda: WAYFAIR,
        "dsco": lambda tenant: {
            "orders": [{"lineItems": [{"sku": f"D-{tenant['site']}", "quantity": 1}]}],
            "_site": tenant["site"],
        },
        "mirakl": lambda tenant: {
            "orders": [
                {"order_state": "OK",
                 "order_lines": [{"offer_sku": f"M-{tenant['site']}", "quantity": 2}]},
                {"order_state": "CANCELED",
                 "order_lines": [{"offer_sku": "nope", "quantity": 9}]},
            ],
            "_site": tenant["site"],
        },
    }


def test_all_api_channels(spark):
    unioned, results = run_connectors(spark, build_api_connectors(_fetchers()))
    assert [r.status for r in results] == ["OK"] * 7
    sites = {r.site for r in unioned.collect()}
    assert sites == {"walmart", "houzz", "faire", "brand1", "wayfair",
                     *DSCO_SITES, *MIRAKL_SITES}
    # mirakl CANCELED orders stripped in every tenant
    assert unioned.filter(unioned.sku == "nope").count() == 0
    # each channel contributes exactly once (no double-counted walmart)
    assert unioned.filter(unioned.site == "walmart").count() == 1


def test_wayfair_accepts_both_payload_shapes(spark):
    from portfolio1_etl_spark.sources.channels import parse_wayfair

    real = parse_wayfair(spark, WAYFAIR).collect()
    assert [(r.sku, r.qty) for r in real] == [("WF-1", 2.0)]
    legacy = parse_wayfair(spark, WAYFAIR_LEGACY).collect()
    assert [(r.sku, r.qty) for r in legacy] == [("WF-2", 3.0)]


def test_file_feeds_with_partial_availability(spark, tmp_path):
    macys = tmp_path / "macys.csv"
    macys.write_text("x\ny\nz\nw\nsku,qty\nM-1,2\n")
    amazon = tmp_path / "amazon.tsv"
    amazon.write_text("sku\tqty\nA-1\t1\n")
    feeds = build_file_feeds(
        spark,
        {"macys": str(macys), "amazon": str(amazon)},  # other 4 absent
    )
    assert len(feeds) == 6
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), feeds)
    rows = {(r.sku, r.qty, r.site) for r in unioned.collect()}
    assert rows == {("M-1", 2.0, "macys"), ("A-1", 1.0, "amazon")}
