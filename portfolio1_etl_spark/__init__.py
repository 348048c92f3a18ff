"""portfolio1_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (``/root/reference/portfolio-etl.py``,
a single-script eager pandas ETL), designed for a 1000-executor cluster
reading ~100 TB even though it is tested on ``local[32]``:

- Declarative DataFrame / SQL plans only — Catalyst does pushdown, pruning,
  join selection; no hand-scheduled row loops survive from the reference.
- Explicit schemas everywhere (no inference in the hot path).
- Broadcast hints for dimension joins, AQE for runtime re-planning.
- Pandas UDFs (Arrow-batched) only where built-ins cannot express semantics.

Layout:
- ``session``    — SparkSession factory (AQE, UTC, Arrow, sized shuffles)
- ``schemas``    — typed StructTypes for every table the engine touches
- ``catalog``    — table loading / temp-view registration over parquet
- ``sources``    — ingestion: csv/tsv/excel/json/xml/REST-shaped connectors
- ``operators``  — relational + [ext] operators (dedup, similarity, text)
- ``functions``  — scalar/vector/text column expression builders
- ``plans``      — the query registry (queries() + DuckDB oracle_sql() pairs)
- ``streaming``  — Structured Streaming jobs over the events table
"""

from portfolio1_etl_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
