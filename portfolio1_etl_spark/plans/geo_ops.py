"""Geospatial join shapes (r8): grid-blocked nearest-neighbor search
with haversine distance — the spatial-join pattern (geohash/S2-style
cell blocking) re-expressed as plain equality joins Catalyst can
shuffle-plan.

The test tables carry no coordinates, so both engines derive
deterministic pseudo-coordinates from the entity keys with identical
integer-modular arithmetic — the POINT of the query is the join
geometry, not the geography.

Reference analogue: none — [ext] per SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.functions.geo import haversine_km
from portfolio1_etl_spark.plans.registry import query


def _coords(df: DataFrame, key: str, p1: int, p2: int) -> DataFrame:
    """Deterministic pseudo lat/lon from an integer key: exact BIGINT
    modular arithmetic then one exact-input double division — both
    engines produce bit-identical doubles. Latitude clamps inside
    ±60° so a 1°-cell ring stays a sane neighborhood (no pole
    degeneracy in the blocking grid)."""
    k = F.col(key).cast("bigint")
    return df.withColumn(
        "lat", ((k * p1) % 12001).cast("double") / 100.0 - 60.0
    ).withColumn("lon", ((k * p2) % 36000).cast("double") / 100.0 - 180.0)


_COORD_SQL = (
    "CAST(({k} * {p1}) % 12001 AS DOUBLE) / 100.0 - 60.0 AS lat, "
    "CAST(({k} * {p2}) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon"
)

_HAVERSINE_SQL = """
    2 * 6371.0088 * asin(sqrt(least(1.0,
        pow(sin(radians(s.lat - c.lat) / 2), 2)
        + cos(radians(c.lat)) * cos(radians(s.lat))
          * pow(sin(radians(s.lon - c.lon) / 2), 2))))
"""


@query(
    "q179_geo_grid_knn",
    sql=f"""
    WITH c AS (
      SELECT c_custkey, {_COORD_SQL.format(k="c_custkey", p1=7919, p2=104729)}
      FROM customer
    ),
    s AS (
      SELECT s_suppkey, {_COORD_SQL.format(k="s_suppkey", p1=6197, p2=32323)}
      FROM supplier
    ),
    cand AS (
      SELECT c.c_custkey, s.s_suppkey,
             {_HAVERSINE_SQL} AS dist_km
      FROM c JOIN s
        ON floor(s.lat) BETWEEN floor(c.lat) - 1 AND floor(c.lat) + 1
       AND floor(s.lon) BETWEEN floor(c.lon) - 1 AND floor(c.lon) + 1
    )
    SELECT c_custkey, s_suppkey, dist_km
    FROM (
      SELECT c_custkey, s_suppkey, round(dist_km, 4) AS dist_km,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY round(dist_km, 4), s_suppkey) AS rn
      FROM cand
    ) WHERE rn = 1
    """,
    operators=("X-spatial-join", "J-blocked", "Window-rank"),
)
def q179_geo_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked nearest-supplier search: each supplier replicates
    into its 1°×1° cell and the 8 neighbors (a bounded 9× expansion of
    the SMALL side), customers join on their own cell only — an
    EQUALITY join on (cx, cy) that shuffles on fixed-width keys, never
    an all-pairs distance cross join. Haversine runs only inside the
    candidate neighborhood; one per-customer window picks the nearest
    (tie on suppkey). Customers with an empty 3×3 neighborhood drop
    out (inner semantics — a radius-bounded search, which is what
    blocking means). At 100 TB the replicated side is the dimension;
    the grid key is the shuffle key; skewed cells (urban density)
    would salt the hot cells like any skewed equality join."""
    c = _coords(
        catalog.load(spark, sf_dir, "customer").select("c_custkey"),
        "c_custkey",
        7919,
        104729,
    )
    s = _coords(
        catalog.load(spark, sf_dir, "supplier").select("s_suppkey"),
        "s_suppkey",
        6197,
        32323,
    )
    dxy = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy"))
    )
    s_rep = s.crossJoin(F.broadcast(dxy)).select(
        "s_suppkey",
        "lat",
        "lon",
        (F.floor("lon") + F.col("dx")).alias("cx"),
        (F.floor("lat") + F.col("dy")).alias("cy"),
    )
    c_cell = c.select(
        "c_custkey",
        F.col("lat").alias("clat"),
        F.col("lon").alias("clon"),
        F.floor("lon").alias("cx"),
        F.floor("lat").alias("cy"),
    )
    # ranking runs on the ROUNDED distance (4 dp) with the suppkey
    # tie-break: the raw haversine can differ by ~1 ulp between the
    # JVM's and DuckDB's libm trig, and an unrounded ORDER BY would
    # let that flip which of two near-equidistant candidates wins
    # (the exact hazard functions/geo.py's header calls out).
    cand = c_cell.join(s_rep, ["cx", "cy"]).select(
        "c_custkey",
        "s_suppkey",
        F.round(
            haversine_km(
                F.col("clat"), F.col("clon"), F.col("lat"), F.col("lon")
            ),
            4,
        ).alias("dist_km"),
    )
    w = W.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "dist_km")
    )
