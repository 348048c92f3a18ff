"""Explicit schemas for every table the engine touches.

At 100 TB schema inference is both expensive and dangerous (a single
malformed file can flip a column to string); every scan in this engine
is validated against these declared StructTypes. Parquet is
self-describing so we read without coercion and *assert* footer-vs-
declared compatibility (``catalog.load`` does the check).

Driver tables (see /root/repo/FIXTURES.md §B) are a TPC-H-ish star
schema plus events/documents/embeddings. The canonical sales model
``(sku, qty, site)`` comes from the reference pipeline
(portfolio-etl.py:215, :252 — every connector is projected onto it at
:73, :226, :276, :328).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- canonical reference model -------------------------------------------

#: Every ingestion connector emits exactly this row model
#: (portfolio-etl.py:215). qty is Double because the reference itself
#: casts to float before aggregating (portfolio-etl.py:613).
SALES = T.StructType(
    [
        T.StructField("sku", T.StringType()),
        T.StructField("qty", T.DoubleType()),
        T.StructField("site", T.StringType()),
    ]
)

#: Retail→wholesale component map (portfolio-etl.py:621-627).
SKUS_MAP = T.StructType(
    [
        T.StructField("sku_part", T.StringType()),
        T.StructField("sku_name", T.StringType()),
        T.StructField("multiplier", T.DoubleType()),
    ]
)

#: Inventory-at-hand table (portfolio-etl.py:634, column order :644-646).
INVENTORY = T.StructType(
    [
        T.StructField("sku", T.StringType()),
        T.StructField("qty", T.DoubleType()),
        T.StructField("subcategory", T.StringType()),
        T.StructField("color", T.StringType()),
        T.StructField("brand", T.StringType()),
    ]
)

#: Cost/brand enrichment map (portfolio-etl.py:659-689).
SALES_MAP = T.StructType(
    [
        T.StructField("SKU", T.StringType()),
        T.StructField("cost", T.DoubleType()),
        T.StructField("brand", T.StringType()),
    ]
)

#: Wholesale enrichment map (portfolio-etl.py:748-770).
WHOLESALE_SOLD_MAP = T.StructType(
    [
        T.StructField("sku", T.StringType()),
        T.StructField("brand", T.StringType()),
    ]
)

# --- driver star schema ---------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

#: All driver tables by name; the oracle registers these as views.
DRIVER_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

#: Schema for the JSON-encoded ``events.props`` column (C15 from_json
#: fixture — portfolio-etl.py:201, :413-414 analogue).
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType())])
