"""Cross-engine numeric canonicalization helpers.

Signed zero (the q159 class): Spark's ``round()`` routes doubles
through ``BigDecimal`` — which has no signed zero — so a tiny negative
input (``-1e-18``, e.g. ``ln(x)`` for x one ulp below 1.0) rounds to
``+0.0``. DuckDB rounds the raw binary and preserves the sign:
``-0.0``. IEEE ``==`` treats them as equal, but a value-hash built on
bit patterns (the driver's correctness gate) distinguishes them.

The canonical fix, applied at every rounded output that can be a tiny
negative (log-ratios, PMI, KL terms, negated entropy sums, deltas):
add ``+0.0`` AFTER the round, in BOTH engines. IEEE 754 addition
defines ``-0.0 + (+0.0) = +0.0``, and ``x + 0.0 == x`` exactly for
every other value, so the transform is a no-op everywhere except the
signed-zero row it exists to canonicalize.

Oracle-SQL twin (write literally in the DuckDB SQL):
  zround(x, n)  ≡  round(x, n) + 0.0
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zround(col: Column, scale: int) -> Column:
    """``round(col, scale)`` with signed zero canonicalized to +0.0."""
    return F.round(col, scale) + F.lit(0.0)
