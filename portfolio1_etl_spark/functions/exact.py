"""Exact (decimal-backed) money arithmetic.

Cross-engine float determinism: Spark's ``round()`` converts a double
through Java's shortest-decimal string before rounding HALF_UP, while
DuckDB rounds the raw binary value — they disagree exactly on decimal
boundaries (x.xx5), which structurally-2-decimal money data hits all the
time. And double SUMs are order-dependent, so a Spark partial-aggregate
sum and a DuckDB sequential sum can differ in the last ulp.

Both problems vanish if money flows through DECIMAL:
- a 2-dp double cast to DECIMAL(18,2) recovers the exact decimal value
  identically in both engines (the binary double is within 1e-11 of the
  true 2-dp value; the nearest-decimal boundary is 0.005 away);
- DECIMAL SUM is exact and order-independent;
- the final cast back to DOUBLE is correctly rounded from an exact
  decimal — bitwise identical in both engines.

Oracle-SQL twins (write these literally in the DuckDB SQL):
  dsum_money(x)    ≡ CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
  dsum_product(x)  ≡ CAST(round(SUM(CAST(x AS DECIMAL(28,8))), 2) AS DOUBLE)
  dmoney(x)        ≡ CAST(CAST(x AS DECIMAL(28,8)) AS DOUBLE)

Scale guard: DECIMAL(28,8) holds |x| < 1e20 — a 100 TB-scale sum of
1e5-magnitude values is ~1e17, still inside; Spark widens sums to
precision 38 anyway.

2^53 guard (why dsum_product snaps the exact sum to 2 dp): a decimal
with scale 8 whose magnitude exceeds 2^53/1e8 ≈ 9e7 no longer fits a
double exactly, and the two engines' decimal→double casts round
DIFFERENTLY there (Spark: one correctly-rounded conversion; DuckDB:
scaled-int→double then /1e8 — two roundings). Rounding the exact sum
to 2 dp first (money semantics; ``round`` on DECIMAL is HALF_UP in
both engines, verified including ties — their CAST tie-breaking
differs, so CAST must not be used for this) keeps the value ≤ 2^53
units up to ~9e13 and the final double bit-identical. The same limit
applies to dsum_money only past ~9e13 absolute.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum_money(col: Column | str) -> Column:
    """Exact sum of a structurally-2-decimal column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double")


def dsum_product(col: Column) -> Column:
    """Exact sum of a derived money product (≤8 decimal places),
    snapped to 2 dp (still exact — see the 2^53 guard above) before
    the double conversion."""
    return F.round(F.sum(col.cast("decimal(28,8)")), 2).cast("double")


def dmoney(col: Column) -> Column:
    """Exact per-row decimal snap of a derived money product."""
    return col.cast("decimal(28,8)").cast("double")


#: SQL twin of :func:`cents_of` for oracle strings (format with x=expr)
CENTS_SQL = "CAST(round({x} * 100, 0) AS BIGINT)"


def cents_of(col: Column | str) -> Column:
    """Exact integer CENTS of a structurally-2-decimal double: x*100
    sits within ~1e-10 of the true cent count, so round-to-nearest
    lands exactly — the integer-money spine the mining/time-series
    families accumulate on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")
