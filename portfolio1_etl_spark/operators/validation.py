"""Declarative data-quality validation (Deequ-style constraint suite).

A suite of column constraints over ONE table compiles into a SINGLE
wide aggregate — one scan, one reduce, however many checks — then
unpivots into a (check_name, metric, passed) report. Referential
checks (foreign key ⊆ dimension key) each add one left-anti join at
DISTINCT-KEY grain. Nothing collects to the driver; the report is a
DataFrame a pipeline can gate on (`report.filter(passed == 0)`).

Metric convention: every metric counts VIOLATIONS (double), so
``passed = (metric == 0)`` uniformly; a 0/1 BIGINT (nullable BOOLEAN
hash-mismatches across engines — see the registry determinism notes).

Scale notes: the wide aggregate is map-side combinable; ``unique``
adds a count-distinct (Spark plans one EXPAND per distinct column —
bounded by the number of unique-checks, not data; prefer one unique
check per table pass). Referential joins shuffle the distinct fact
keys only — at 100 TB the distinct-key artifact is orders of
magnitude below the fact table, and the dim side broadcasts when
small.

Reference analogue: the reference script validates implicitly by
crashing (portfolio-etl.py drops malformed rows ad hoc); this is the
declared, reportable form.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: ``violations`` is an aggregate expression that
    counts offending rows (0 == healthy)."""

    name: str
    violations: Column


def not_null(name: str, col: str) -> Check:
    return Check(name, F.count_if(F.col(col).isNull()))


def unique(name: str, col: str) -> Check:
    """Duplicate-row count for ``col``: n_rows − n_distinct − n_nulls
    (NULLs are not key material — flag them with not_null)."""
    return Check(
        name,
        F.count(F.lit(1))
        - F.count_distinct(F.col(col))
        - F.count_if(F.col(col).isNull()),
    )


def accepted_values(name: str, col: str, values: Sequence[str]) -> Check:
    return Check(
        name, F.count_if(~F.col(col).isin(list(values)) | F.col(col).isNull())
    )


def in_range(name: str, col: str, lo: float, hi: float) -> Check:
    return Check(
        name,
        F.count_if(
            F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi)
        ),
    )


def _report_row(name: str, metric: Column) -> Column:
    return F.struct(
        F.lit(name).alias("check_name"),
        metric.cast("double").alias("metric"),
        F.when(metric == 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("passed"),
    )


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """All column checks in ONE aggregate pass over ``df``; returns
    the (check_name, metric, passed) report."""
    agg_row = df.agg(
        *[c.violations.alias(f"_m{i}") for i, c in enumerate(checks)]
    )
    rows = [
        _report_row(c.name, F.col(f"_m{i}")) for i, c in enumerate(checks)
    ]
    return agg_row.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def referential_check(
    name: str, fact: DataFrame, fact_col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Foreign-key containment: count DISTINCT fact keys absent from
    the dimension (NULL fact keys are orphans too — they reference
    nothing). One row, same report schema as run_checks."""
    orphans = (
        fact.select(F.col(fact_col).alias("_k"))
        .distinct()
        .join(
            dim.select(F.col(dim_col).alias("_k")).distinct(),
            "_k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    return orphans.select(F.explode(F.array(_report_row(name, F.col("_m")))).alias("r")).select("r.*")


def validation_report(pieces: Sequence[DataFrame]) -> DataFrame:
    """Union per-table reports into one suite report."""
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
