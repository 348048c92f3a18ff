"""Sketch operator library: count-min (frequency) + Bloom (membership).

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

The Bloom filter is the membership dual: an 8 KB bitmap of a key set
that broadcasts anywhere and prunes a fact stream in a narrow codegen
filter BEFORE any shuffle (``bloom_build`` / ``bloom_probe`` /
``bloom_merge``) — no false negatives ever, false positives only cost
wasted downstream work when an exact join follows.

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


#: Bloom hash family: same md5-derived construction as CMS (a_j < 64
#: keeps a_j·H < 2^54 — no int64 overflow on the 48-bit prefix).
BLOOM_PARAMS = [(j, 2 * j + 3, 104729 * (j + 1) + 7) for j in range(4)]
BLOOM_MOD = 2147483647
#: 2^16 bits = 1024 longs = 8 KB per filter — broadcast-trivial. Size
#: for ~1% FP at n ≈ m/16 keys (k=4): callers with bigger key sets
#: pass a bigger m_bits (power-of-64 multiple).
BLOOM_BITS = 65536


def _bloom_positions(col: str, m_bits: int):
    """k bit positions for one already-hashed long column."""
    return F.array(
        *[
            ((F.lit(a) * F.col(col) + F.lit(b)) % BLOOM_MOD) % m_bits
            for _, a, b in BLOOM_PARAMS
        ]
    )


def bloom_build(keys: DataFrame, col: str, m_bits: int = BLOOM_BITS) -> DataFrame:
    """ONE-row (bm: array<long>) Bloom bitmap of the key set — the
    semi-join pruning sketch: build on the SMALL side (dimension keys
    that survive a filter), broadcast the 8 KB bitmap, and drop
    non-matching big-side rows in a narrow map BEFORE any shuffle or
    join. No false negatives ever; false positives only cost wasted
    downstream work, never wrong answers, when the pruned stream feeds
    an exact join afterwards.

    Build shape: explode k positions per key → ONE global
    ``collect_set`` aggregate (partial per partition, each partial
    bounded by m_bits entries, so the exchange carries at most
    m_bits·partitions longs) → pack the set into the dense
    array<long> in a narrow 1-row projection. One exchange total —
    duplicate keys and duplicate positions are free because setting a
    bit is idempotent. The md5-derived hash family makes the bitmap
    bit-identical across engines."""
    hashed = keys.select(
        F.expr(H48.format(c=f"cast({col} as string)")).alias("h")
    )
    pos = hashed.select(F.explode(_bloom_positions("h", m_bits)).alias("pos"))
    # Pack the (deduped) position set with ONE sorted walk instead of a
    # per-word rescan: O(|ps| + words·runs) vs the O(words·|ps|) ≈ 67M-op
    # serial tail the naive transform/filter form pays in the final
    # 1-row task (a measured ~2s fixed cost at any scale).
    n_words = m_bits // 64
    empty = "cast(array() as array<bigint>)"
    flush = (
        "concat(acc.packed, "
        "if(acc.w >= 0, array(acc.bits), {empty}), "
        "array_repeat(cast(0 as bigint), cast({next_w} - acc.w - 1 as int)))"
    )
    pack = (
        "aggregate(array_sort(ps), "
        "named_struct('w', cast(-1 as bigint), 'bits', cast(0 as bigint), "
        f"'packed', {empty}), "
        "(acc, p) -> if(p div 64 = acc.w, "
        "named_struct('w', acc.w, "
        "'bits', acc.bits | shiftleft(cast(1 as bigint), cast(p % 64 as int)), "
        "'packed', acc.packed), "
        "named_struct('w', p div 64, "
        "'bits', shiftleft(cast(1 as bigint), cast(p % 64 as int)), "
        f"'packed', {flush.format(empty=empty, next_w='p div 64')})), "
        f"acc -> {flush.format(empty=empty, next_w=n_words)})"
    )
    return pos.agg(F.collect_set("pos").alias("ps")).select(F.expr(pack).alias("bm"))


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Fold same-sized bitmaps with element-wise OR — the same
    linearity as ``cms_merge``: partitions/batches/days can build
    independently and the fold equals the one-shot build."""
    merged = blooms[0]
    for b in blooms[1:]:
        merged = (
            merged.crossJoin(b.select(F.col("bm").alias("bm2")))
            .select(
                F.expr("zip_with(bm, bm2, (x, y) -> x | y)").alias("bm")
            )
        )
    return merged


def bloom_might_contain(hash_col: str, m_bits: int = BLOOM_BITS):
    """Column expression over a PRE-HASHED long column: True iff every
    one of its k bit positions is set in the broadcast ``bm`` column —
    pure whole-stage codegen, no shuffle, no Python.

    Perf note: evaluate this in a PROJECT (``.select(...alias('pass'))``
    + a conditional downstream) rather than directly in ``.filter`` when
    the row rate matters — codegen applies subexpression elimination to
    projections but not to filter conditions, and the k checks reference
    the hash column 2k times (measured 2x at 600k rows/task)."""
    checks = [
        f"((shiftright(element_at(bm, cast((((({a} * {hash_col} + {b})"
        f" % {BLOOM_MOD}) % {m_bits}) div 64) as int) + 1), "
        f"cast(((({a} * {hash_col} + {b}) % {BLOOM_MOD}) % {m_bits}) % 64 as int))"
        f" & 1) = 1)"
        for _, a, b in BLOOM_PARAMS
    ]
    return F.expr(" AND ".join(checks))


def bloom_probe(
    df: DataFrame, col: str, bloom: DataFrame, m_bits: int = BLOOM_BITS
) -> DataFrame:
    """Keep only the rows of ``df`` whose ``col`` MIGHT be in the
    built key set (all k bits set). The 1-row bitmap cross-joins in by
    broadcast; the md5 hash computes once per row and the membership
    test runs inside codegen. At 100 TB this is the shuffle-avoidance
    lever: the big fact stream thins to ~the matching fraction before
    any Exchange."""
    return (
        df.crossJoin(F.broadcast(bloom))
        .withColumn("__h", F.expr(H48.format(c=f"cast({col} as string)")))
        .filter(bloom_might_contain("__h", m_bits))
        .drop("bm", "__h")
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
