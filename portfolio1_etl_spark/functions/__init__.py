"""Column-expression builders shared across plans."""

from portfolio1_etl_spark.functions.exact import dmoney, dsum_money, dsum_product

__all__ = ["dmoney", "dsum_money", "dsum_product"]
