"""Frequency-sketch operator library (count-min sketch heavy hitters).

A count-min sketch summarizes an arbitrarily large token/key stream in
``depth × width`` counters: cell (j, b) holds the count of every item
whose j-th hash lands in bucket b; an item's estimate is the MINIMUM
over its depth cells — always ≥ the true count, and over by at most
``2N/width`` with probability ``1 − 2^-depth`` (Cormode & Muthukrishnan
2005). At 100 TB this is how you get "top boilerplate n-grams" or
"hot join keys" without materializing the full distinct-key aggregate:
the sketch build is one explode + groupBy whose map-side partial
aggregation caps per-partition traffic at depth·width rows, and the
finished sketch (≤ depth·width rows, here 2048) broadcasts anywhere —
including into a second pass that probes it per-row with no shuffle.

All hashing is md5-derived (same H48 family as the dedup layer), so a
sketch built by Spark is bit-identical to one built by any other
engine from the same stream — the DuckDB oracle in
``plans/sketch_ops`` rebuilds it exactly, no error-bound hand-waving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.dedup import H48

#: (j, a_j, b_j): depth-4 pairwise-independent-ish hash family over the
#: 48-bit md5 prefix; a_j < 64 keeps a_j·H < 2^54 — no int64 overflow.
CMS_PARAMS = [(j, 2 * j + 3, 104729 * (j + 1) + 7) for j in range(4)]
CMS_MOD = 2147483647
CMS_WIDTH = 512


def _cells(col: str):
    """depth structs (j, bucket) for one already-hashed long column."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (((F.lit(a) * F.col(col) + F.lit(b)) % CMS_MOD) % CMS_WIDTH).alias(
                    "bucket"
                ),
            )
            for j, a, b in CMS_PARAMS
        ]
    )


def cms_build(items: DataFrame, col: str) -> DataFrame:
    """(j, bucket, cnt): the sketch of the (non-distinct) item stream
    in ``items[col]``. One explode + one groupBy on (j, bucket) — the
    shuffle moves at most depth·width rows per upstream partition
    thanks to partial aggregation, independent of stream size."""
    hashed = items.select(F.expr(H48.format(c=col)).alias("h"))
    return (
        hashed.select(F.explode(_cells("h")).alias("c"))
        .select("c.j", "c.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same parameters: cell-wise sum.
    This linearity is WHY the sketch works distributed — partitions,
    micro-batches, or whole days can sketch independently and fold
    together later with no loss vs sketching the concatenated stream
    (``streaming.jobs.cms_maintenance_stream`` relies on it)."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_build_weighted(
    items: DataFrame, col: str, weight_col: str
) -> DataFrame:
    """(j, bucket, cnt): the sketch of a PRE-AGGREGATED stream —
    ``items`` holds (item, occurrence count). Produces the identical
    sketch to ``cms_build`` over the raw stream (cell counts are
    linear in occurrences), but lets a caller who already has the
    counts table avoid a second full-corpus scan (q92 does this: the
    exact-counts aggregate is checkpointed once and feeds the sketch,
    the probes, AND the comparison column)."""
    hashed = items.select(
        F.expr(H48.format(c=col)).alias("h"), F.col(weight_col).alias("wt")
    )
    return (
        hashed.select(F.explode(_cells("h")).alias("c"), "wt")
        .select("c.j", "c.bucket", "wt")
        .groupBy("j", "bucket")
        .agg(F.sum("wt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, items: DataFrame, col: str, assume_distinct: bool = False
) -> DataFrame:
    """(col, est): the sketch estimate for each DISTINCT item in
    ``items[col]``. The sketch side is tiny by construction and is
    broadcast — probing N items costs no shuffle beyond the distinct.
    The item hash is computed once per probe row, then fanned out to
    the depth cells. Pass ``assume_distinct=True`` when ``items`` is
    distinct-by-construction (e.g. the output of a groupBy on the
    item) to skip a redundant full-vocabulary re-shuffle."""
    probes = items.select(col)
    if not assume_distinct:
        probes = probes.distinct()
    probes = probes.select(col, F.expr(H48.format(c=col)).alias("h"))
    probes = probes.select(
        col, F.explode(_cells("h")).alias("c")
    ).select(col, "c.j", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
