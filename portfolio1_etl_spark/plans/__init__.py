"""Query registry: every operator from SURVEY.md §2 lands here as a
``queries()``/``oracle_sql()`` pair. Importing this package populates
the registry."""

from portfolio1_etl_spark.plans.registry import REGISTRY, Query, query

# Register all query modules (import side effects fill REGISTRY).
from portfolio1_etl_spark.plans import relational  # noqa: F401,E402
from portfolio1_etl_spark.plans import reference_pipeline  # noqa: F401,E402
from portfolio1_etl_spark.plans import windows_events  # noqa: F401,E402
from portfolio1_etl_spark.plans import text_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import dedup_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import similarity_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import advanced  # noqa: F401,E402
from portfolio1_etl_spark.plans import multimodal_ops  # noqa: F401,E402

__all__ = ["REGISTRY", "Query", "query"]
