"""Geospatial scalar expressions (pure JVM column math — no UDFs).

The haversine here is the standard great-circle distance on the mean
Earth radius; inputs are degree doubles. Both engines evaluate the
same IEEE expression tree on identical inputs, so results agree to
the last ulp of their libm (Java StrictMath-adjacent vs system libm
can differ by 1 ulp on trig — queries must round outputs, and must
not place a hard threshold at a distance boundary they expect to be
engine-exact).

Oracle-SQL twin (write literally in DuckDB SQL):
  2 * 6371.0088 * asin(sqrt(least(1.0,
      pow(sin(radians(lat2 - lat1) / 2), 2)
      + cos(radians(lat1)) * cos(radians(lat2))
        * pow(sin(radians(lon2 - lon1) / 2), 2))))

The least(1.0, ·) clamp: for near-antipodal points rounding can push
the haversine term a fraction of an ulp above 1.0, making asin(sqrt(a))
NaN — and the engines' libms can disagree exactly at that boundary.
Clamping in BOTH engines keeps the expression total and bit-agreeing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: IUGG mean Earth radius, km.
EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (degree) points."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = F.pow(F.sin(dphi), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlmb), 2)
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(F.lit(1.0), a)))
