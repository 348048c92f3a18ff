"""Connector framework — SURVEY.md §2.1 S5-S11 and §3 EP1/EP2.

The reference hardwires 7 API connectors + 6 file feeds into one
script, each ending in the same canonical (sku, qty, site) projection.
Here a connector is data + two functions:

- ``fetch()`` — injected I/O (HTTP GET/POST, GraphQL, file read). No
  network happens in this repo: tests inject fixture payloads; a
  production deployment injects a real client. Fetching is driver-side
  (as in the reference); at scale payloads land on object storage and
  ``fetch`` returns the landed path instead.
- ``parse(spark, payload)`` — a pure DataFrame transform to canonical
  (sku, qty, site) built from the flatten/reader primitives.

Failure semantics: the reference catches per-connector errors and
returns an *empty* frame so one dead marketplace doesn't kill the
weekly run (portfolio-etl.py:94-96, :147-149, :235-237, :453-457);
missing files yield a 1-row 'other' sentinel that the pipeline later
deletes (:477-480, :602-604). We keep catch-and-continue but emit a
typed EMPTY DataFrame in both cases — the sentinel dance is dead
weight (SURVEY.md §2.1 S11).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from portfolio1_etl_spark.schemas import SALES


def empty_sales(spark: SparkSession) -> DataFrame:
    """Typed empty canonical frame (the corrected S11 fallback)."""
    return spark.createDataFrame([], SALES)


@dataclass
class ConnectorResult:
    """Mirrors the reference's per-connector return tuple
    (df, row_count, status) (portfolio-etl.py:87-96 etc.)."""

    name: str
    df: DataFrame
    rows: int
    status: str
    error: str | None = None


@dataclass
class Connector:
    """One marketplace channel: injected fetch + declarative parse."""

    name: str
    fetch: Callable[[], Any]
    parse: Callable[[SparkSession, Any], DataFrame]
    #: tenant configs for multi-tenant connectors (the 5-token DSCO
    #: loop :284-308, the 3-marketplace Mirakl loop :334-356); each
    #: tenant gets its own fetch argument via fetch(tenant).
    tenants: list[dict] = field(default_factory=list)

    def run(self, spark: SparkSession) -> ConnectorResult:
        """Fetch → parse → canonical frame; errors → typed empty frame
        (catch-and-continue, portfolio-etl.py:94-96)."""
        try:
            if self.tenants:
                frames = [
                    self.parse(spark, self.fetch(t)) for t in self.tenants  # type: ignore[call-arg]
                ]
                df = reduce(lambda a, b: a.unionByName(b), frames)
            else:
                df = self.parse(spark, self.fetch())
            df = df.select("sku", "qty", "site")
            return ConnectorResult(self.name, df, df.count(), "OK")
        except Exception as e:  # noqa: BLE001 — connector isolation is the point
            return ConnectorResult(
                self.name, empty_sales(spark), 0, "ERROR", error=str(e)
            )


def run_connectors(
    spark: SparkSession, connectors: list[Connector]
) -> tuple[DataFrame, list[ConnectorResult]]:
    """EP2: run every channel, union the canonical frames (the 13-way
    concat, portfolio-etl.py:581-595 — each source exactly once,
    correcting the double-counted walmart_data, SURVEY.md §4.3.1)."""
    results = [c.run(spark) for c in connectors]
    unioned = reduce(
        lambda a, b: a.unionByName(b), [r.df for r in results], empty_sales(spark)
    )
    return unioned, results


def file_feed(
    spark: SparkSession,
    path: str,
    site: str,
    sku_col: str,
    qty_col: str,
    reader: Callable[..., DataFrame],
    **reader_kwargs: Any,
) -> DataFrame:
    """EP1: one local file feed (Macy's/HSN/Rue/Amazon/TOM,
    portfolio-etl.py:465-531) → canonical rows; absent/unreadable file
    → typed empty frame (corrected S11 fallback)."""
    from pyspark.sql import functions as F

    try:
        df = reader(spark, path, **reader_kwargs)
        return df.select(
            F.col(sku_col).cast("string").alias("sku"),
            F.col(qty_col).cast("double").alias("qty"),
            F.lit(site).alias("site"),
        )
    except Exception:  # noqa: BLE001 — missing weekly file is expected
        return empty_sales(spark)
