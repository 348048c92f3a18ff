"""The reference's 13 concrete channels (portfolio-etl.py EP1+EP2),
declared as data over the generic connector/reader primitives — a user
of the reference script switches by supplying fetchers (HTTP clients)
and feed paths; every parse is the reference's flatten re-expressed
declaratively (SURVEY.md §2.1-2.2, cited per channel).

API channels (EP2)                 file feeds (EP1)
  walmart    nested JSON :40-76      macys     CSV header=4 :465-482
  houzz      XML feed    :98-135     hsn       Excel/TSV    :508
  faire      items JSON  :152-178    ruelala   Excel        :528
  woocommerce line_items :197-226    amazon    TSV          :529
  dsco ×5    multi-tenant :241-308   walmart_file Excel     :530
  mirakl ×3  order_lines :312-356    touchofmodern TSV      :531
  wayfair    GraphQL     :359-437

No network code lives here: ``build_api_connectors`` takes a
``fetchers`` mapping (channel name → callable) and wires it in. The
double-counted walmart union of the reference (:585+:588) does not
exist — each channel appears exactly once (SURVEY.md §4.3.1).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from portfolio1_etl_spark.sources.connectors import Connector, file_feed
from portfolio1_etl_spark.sources.flatten import (
    normalize_order_lines,
    parse_orders_xml,
)
from portfolio1_etl_spark.sources.readers import (
    json_records,
    read_csv_with_preamble,
    read_excel,
    read_tsv,
)

# --- API channel parsers (each one flatten expression) ---------------------


def parse_walmart(spark: SparkSession, payload: Any) -> DataFrame:
    """Nested orderLines.orderLine per order (portfolio-etl.py:57-76):
    the iterrows + json_normalize loop as two explodes."""
    orders = json_records(spark, payload).select(
        F.explode("list.elements.order").alias("o")
    )
    return orders.select(F.explode("o.orderLines.orderLine").alias("l")).select(
        F.col("l.item.sku").cast("string").alias("sku"),
        F.col("l.orderLineQuantity.amount").cast("double").alias("qty"),
        F.lit("walmart").alias("site"),
    )


def parse_houzz(spark: SparkSession, payload: Any) -> DataFrame:
    """XML Orders/Order/OrderItem walk (portfolio-etl.py:124-135) via
    from_xml."""
    return parse_orders_xml(spark, [payload], "houzz")


def parse_faire(spark: SparkSession, payload: Any) -> DataFrame:
    """orders → items loop (portfolio-etl.py:166-178) as explode."""
    orders = json_records(spark, payload).select(F.explode("orders").alias("o")).select("o.*")
    return normalize_order_lines(orders, "items", "sku", "quantity", "faire")


def parse_woocommerce(spark: SparkSession, payload: Any) -> DataFrame:
    """line_items explode (portfolio-etl.py:221-226); the reference
    fetched this via a curl subprocess (:197-201) — here the fetch is
    injected like every other channel."""
    orders = json_records(spark, payload).select(F.explode("orders").alias("o")).select("o.*")
    return normalize_order_lines(orders, "line_items", "sku", "quantity", "brand1")


def make_parse_dsco(site: str) -> Callable[[SparkSession, Any], DataFrame]:
    """DSCO per-tenant parse (portfolio-etl.py:265-276): lineItems
    explode, tz-stripped date filtering happens source-side."""

    def parse(spark: SparkSession, payload: Any) -> DataFrame:
        orders = json_records(spark, payload).select(F.explode("orders").alias("o")).select("o.*")
        return normalize_order_lines(orders, "lineItems", "sku", "quantity", site)

    return parse


def make_parse_mirakl(site: str) -> Callable[[SparkSession, Any], DataFrame]:
    """Mirakl order_lines explode with the CANCELED strip applied
    before the explode (portfolio-etl.py:325-329)."""

    def parse(spark: SparkSession, payload: Any) -> DataFrame:
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


def parse_wayfair(spark: SparkSession, payload: Any) -> DataFrame:
    """GraphQL purchase orders→products (portfolio-etl.py:411-437); the
    API-side limit-1000 DESC (:385-388) maps to orderBy+limit before
    the product explode. The real GraphQL response nests orders under
    ``data.getDropshipPurchaseOrders`` (the operation name,
    portfolio-etl.py:413-414); the generic ``data.purchaseOrders``
    shape is accepted as a fallback for re-keyed payloads."""
    raw = json_records(spark, payload)
    data_fields = {f.name for f in raw.schema["data"].dataType.fields}
    record_key = (
        "getDropshipPurchaseOrders"
        if "getDropshipPurchaseOrders" in data_fields
        else "purchaseOrders"
    )
    orders = raw.select(F.explode(f"data.{record_key}").alias("o"))
    latest = orders.orderBy(F.col("o.poDate").desc()).limit(1000)
    return latest.select(F.explode("o.products").alias("p")).select(
        F.col("p.partNumber").cast("string").alias("sku"),
        F.col("p.quantity").cast("double").alias("qty"),
        F.lit("wayfair").alias("site"),
    )


#: DSCO retail tenants (portfolio-etl.py:268-274 token→site map) and
#: Mirakl marketplaces (:341-356).
DSCO_SITES = ["dsco-macys", "dsco-nordstrom", "dsco-zulily", "dsco-belk", "dsco-hsn"]
MIRAKL_SITES = ["mirakl-catch", "mirakl-fanatics", "mirakl-bedbath"]


def build_api_connectors(
    fetchers: dict[str, Callable[..., Any]]
) -> list[Connector]:
    """The 7 API connector families with injected fetchers. Multi-
    tenant channels (dsco/mirakl) expect ``fetchers[name]`` to accept
    the tenant dict (portfolio-etl.py:284-308, :334-356)."""
    connectors = [
        Connector("walmart", fetchers["walmart"], parse_walmart),
        Connector("houzz", fetchers["houzz"], parse_houzz),
        Connector("faire", fetchers["faire"], parse_faire),
        Connector("woocommerce", fetchers["woocommerce"], parse_woocommerce),
        Connector("wayfair", fetchers["wayfair"], parse_wayfair),
    ]
    connectors.append(
        Connector(
            "dsco",
            fetchers["dsco"],
            lambda spark, payload: make_parse_dsco(payload["_site"])(spark, payload),
            tenants=[{"site": s} for s in DSCO_SITES],
        )
    )
    connectors.append(
        Connector(
            "mirakl",
            fetchers["mirakl"],
            lambda spark, payload: make_parse_mirakl(payload["_site"])(spark, payload),
            tenants=[{"site": s} for s in MIRAKL_SITES],
        )
    )
    return connectors


# --- file feeds (EP1) ------------------------------------------------------

_TWO_COL = T.StructType(
    [T.StructField("sku", T.StringType()), T.StructField("qty", T.DoubleType())]
)


def build_file_feeds(
    spark: SparkSession, paths: dict[str, str]
) -> list[DataFrame]:
    """The 6 local feeds (portfolio-etl.py:465-531), each → canonical
    rows or a typed empty frame when the weekly file is absent
    (corrected S11 fallback)."""
    return [
        file_feed(
            spark, paths.get("macys", ""), "macys", "sku", "qty",
            read_csv_with_preamble, skip_rows=4, schema=_TWO_COL,
        ),
        file_feed(spark, paths.get("hsn", ""), "hsn", "sku", "qty",
                  read_excel),
        file_feed(spark, paths.get("ruelala", ""), "ruelala", "sku", "qty",
                  read_excel),
        file_feed(spark, paths.get("amazon", ""), "amazon", "sku", "qty",
                  read_tsv, schema=_TWO_COL),
        file_feed(spark, paths.get("walmart_file", ""), "walmart-file", "sku", "qty",
                  read_excel),
        file_feed(spark, paths.get("touchofmodern", ""), "touchofmodern", "sku", "qty",
                  read_tsv, schema=_TWO_COL),
    ]
