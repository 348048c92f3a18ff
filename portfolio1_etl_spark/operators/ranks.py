"""Scale-safe exact global ranking.

A partitionless ``Window.orderBy`` is a SINGLE-PARTITION sort — Spark
itself warns ``WindowExec: No Partition Defined ... moving all data to
a single partition``. At dimension grain (customers, parts) that is
billions of rows through one reducer at 100 TB. This module computes
the EXACT global ``row_number`` (and the rank-derived family: ntile,
percent_rank, cume_dist) with bounded per-task work instead:

1. The caller supplies a *bucket* expression — any monotone
   non-decreasing coarsening of the window order (equal order keys
   must share a bucket). Examples: ``floor(balance / 100)`` for a
   fixed-domain column, ``floor(log2(cents + 2) * 8)`` for a
   scale-free monetary histogram, ``struct(low_card_key,
   coarse(tiebreak))`` to subdivide heavy key values.
2. ONE map-side-combinable aggregate counts rows per (group, bucket).
3. Prefix offsets come from a per-group ``collect_list`` +
   higher-order array fold over the ≤ few-hundred bucket cells — no
   window, no driver collect; the offsets frame is broadcast.
4. An ordered ``row_number`` runs WITHIN each bucket
   (``Window.partitionBy(group, bucket)``), so the largest sort any
   reducer performs is one bucket's slice, and
   ``global_rank = bucket_offset + local_row_number``.

The count-then-offset composition makes the result EXACT no matter
how lopsided the buckets are — bucket quality affects balance only.
This is the same histogram-cut discipline as the q116 mixture prune
and the q227 quantile sketch (plans/mining_ops.py), promoted to a
reusable operator.

Reference parity note: the reference engine ranks eagerly in a single
pandas process (e.g. the quantile/report shapes around
portfolio-etl.py's summary sections), which is the same
single-partition behavior the naive Spark window reproduces; this
operator is the distributed re-expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_exact_rank(
    df: DataFrame,
    order_by: list[Column],
    bucket: Column,
    group_cols: list[str] | None = None,
    rank_name: str = "_rank",
    n_name: str = "_n",
    sum_col: Column | None = None,
    sum_type: str = "decimal(38,2)",
    cumsum_name: str = "_cumsum",
    total_name: str = "_total",
) -> DataFrame:
    """Append ``rank_name`` (exact 1-based global row_number along
    ``order_by`` within each ``group_cols`` group) and ``n_name`` (the
    group's row count) without a partitionless window. With
    ``sum_col``, also append ``cumsum_name`` (the exact inclusive
    running sum of ``sum_col`` along the same order — accumulated in
    ``sum_type``, so pass an exact type for order-independence) and
    ``total_name`` (the group total): the ABC/Pareto prefix-sum shape.

    ``order_by`` must be a TOTAL order (include a unique tiebreak
    column) — with ties unresolved, rows straddling a bucket boundary
    would rank arbitrarily. ``bucket`` must be monotone non-decreasing
    along ``order_by`` and give equal buckets to equal order keys; for
    a descending primary key pass a bucket over the negated column.
    """
    group_cols = list(group_cols or [])
    b = df.withColumn("_rkb", bucket)
    zero = F.lit(0).cast(sum_type)
    aggs = [F.count(F.lit(1)).alias("_rkc")]
    if sum_col is not None:
        b = b.withColumn("_rkv", sum_col.cast(sum_type))
        aggs.append(F.sum("_rkv").alias("_rks"))
    counts = b.groupBy(*group_cols, "_rkb").agg(*aggs)
    # per-group bucket cells as one sorted array (struct ordering is
    # lexicographic by field position → bucket order), then each cell's
    # offset = fold of strictly-smaller cells. O(cells²) array work on
    # a handful of rows — cells are bounded by construction, rows are
    # not.
    fields = [F.col("_rkb").alias("b"), F.col("_rkc").alias("c")]
    if sum_col is not None:
        fields.append(F.col("_rks").alias("s"))
    arr = F.sort_array(F.collect_list(F.struct(*fields)))
    if group_cols:
        per_g = counts.groupBy(*group_cols).agg(arr.alias("_arr"))
    else:
        per_g = counts.agg(arr.alias("_arr"))
    e = F.col("_cell")
    below = F.filter("_arr", lambda x: x["b"] < e["b"])
    proj = [
        e["b"].alias("_rkb"),
        F.aggregate(
            below, F.lit(0).cast("long"), lambda acc, x: acc + x["c"]
        ).alias("_rkoff"),
        F.aggregate(
            "_arr", F.lit(0).cast("long"), lambda acc, x: acc + x["c"]
        ).alias(n_name),
    ]
    if sum_col is not None:
        proj += [
            F.aggregate(below, zero, lambda acc, x: acc + x["s"])
            .cast(sum_type)
            .alias("_rksoff"),
            F.aggregate("_arr", zero, lambda acc, x: acc + x["s"])
            .cast(sum_type)
            .alias(total_name),
        ]
    offs = per_g.select(
        *group_cols, "_arr", F.explode("_arr").alias("_cell")
    ).select(*group_cols, *proj)
    joined = b.join(F.broadcast(offs), on=group_cols + ["_rkb"])
    wloc = Window.partitionBy(*(group_cols + ["_rkb"])).orderBy(*order_by)
    out = joined.withColumn(
        rank_name, F.col("_rkoff") + F.row_number().over(wloc)
    )
    drop = ["_rkb", "_rkoff"]
    if sum_col is not None:
        run = F.sum("_rkv").over(
            wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            cumsum_name, (F.col("_rksoff") + run).cast(sum_type)
        )
        drop += ["_rkv", "_rksoff"]
    return out.drop(*drop)


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ``ntile(k)`` recomputed from an exact 1-based rank and the
    partition size: the first ``n % k`` tiles hold ``n div k + 1``
    rows, the rest ``n div k`` — the standard remainder distribution
    both Spark and DuckDB implement. Pure arithmetic, no window."""
    base = F.floor(n / k)
    rem = n % k
    big = rem * (base + 1)
    return F.when(
        rank <= big, F.floor((rank - 1) / (base + 1)) + 1
    ).otherwise(rem + F.floor((rank - big - 1) / base) + 1)


def percent_rank_from_rank(rank: Column, n: Column) -> Column:
    """``percent_rank()`` = (rank − 1) / (n − 1), defined 0.0 for a
    single-row partition. Exact only under a total order (unique
    tiebreak), where rank() == row_number()."""
    return F.when(
        n > 1, (rank - 1).cast("double") / (n - 1).cast("double")
    ).otherwise(F.lit(0.0))


def cume_dist_from_rank(rank: Column, n: Column) -> Column:
    """``cume_dist()`` = rows-with-key-≤-mine / n, which equals
    rank / n under a total order (unique tiebreak)."""
    return rank.cast("double") / n.cast("double")
