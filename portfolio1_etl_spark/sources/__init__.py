"""Ingestion surface: file readers (S1-S4), payload landing (S5-S9),
semi-structured flattening (F1-F6), connector framework (S10-S11)."""

from portfolio1_etl_spark.sources.readers import (
    json_records,
    read_csv,
    read_csv_with_preamble,
    read_excel,
    read_tsv,
)
from portfolio1_etl_spark.sources.flatten import (
    explode_array_of_structs,
    normalize_order_lines,
    parse_orders_xml,
)
from portfolio1_etl_spark.sources.connectors import (
    Connector,
    ConnectorResult,
    file_feed,
    run_connectors,
)

__all__ = [
    "read_csv",
    "read_tsv",
    "read_csv_with_preamble",
    "read_excel",
    "json_records",
    "explode_array_of_structs",
    "normalize_order_lines",
    "parse_orders_xml",
    "Connector",
    "ConnectorResult",
    "file_feed",
    "run_connectors",
]
