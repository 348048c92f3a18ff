"""Join utilities for skewed keys — the manual fallback when AQE's
skew-join splitting isn't enough (e.g. one sku is 30% of all sales).

Salting spreads one hot key across ``n_salts`` reducer partitions:
the big (skewed) side gets a per-row salt, the small side is exploded
to every salt value. Results are identical to the unsalted join
(tested); only the shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted.

    The salt is derived from a whole-row hash of the big side (cheap,
    deterministic, no RNG) so the hot key's rows scatter uniformly;
    the small side replicates ×``n_salts`` (only acceptable because it
    is the small side — for fact×fact skew use AQE skew-join)."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(*big.columns), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    on = [key, "_salt"]
    return salted_big.join(salted_small, on, how).drop("_salt")
