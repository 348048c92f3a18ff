"""Column-expression builders shared across plans."""

from portfolio1_etl_spark.functions.exact import dmoney, dsum_money, dsum_product
from portfolio1_etl_spark.functions.numeric import zround
from portfolio1_etl_spark.functions.redact import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)

__all__ = [
    "dmoney",
    "dsum_money",
    "dsum_product",
    "PII_PATTERNS",
    "redact_pii",
    "pii_counts",
    "zround",
]
