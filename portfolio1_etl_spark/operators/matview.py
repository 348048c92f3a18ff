"""Incremental materialized-view maintenance from a CDC feed.

The versioned sink publishes row-level deltas
(``operators.sinks.read_changes``: ``_change ∈ {insert, delete}``,
updates appearing as a delete+insert pair). For distributive
aggregates (COUNT, SUM — and anything derivable from them: AVG,
ratios) the aggregate of version N+1 is the aggregate of version N
plus the SIGNED aggregate of the delta — no rescan of the base table.
That is the whole point of publishing deltas at 100 TB: the refresh
cost is proportional to the CHANGE volume, not the table.

Non-distributive aggregates split two ways. MIN/MAX (r12,
:func:`agg_view`/:func:`apply_agg_delta`): inserts fold monotonically
(least/greatest); a delete can expose a new extremum, so groups whose
deleted values REACH the current extremum are re-aggregated from the
new base state, semi-joined to that (small) dirty-key set — rescan
cost proportional to dirty-group volume, never the table, and
partition-prunable when the base is laid out by group key. Exact
distinct stays out of scope: callers maintain a per-group sketch or
recompute; this module refuses rather than silently corrupting.

Reference analogue: the reference recomputes its report aggregates
from scratch every run (portfolio-etl.py:634-650 re-reads the full
inventory state); this operator is the delta-refresh form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change-feed column published by operators.sinks.read_changes
CHANGE_COL = "_change"


def sum_count_view(state: DataFrame, keys: Sequence[str], val: str) -> DataFrame:
    """The maintained aggregate's SHAPE: per-key ``n_rows`` and
    ``sum_val`` over ``val``. Build the initial view with this, then
    refresh with :func:`apply_delta`."""
    return state.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(val).alias("sum_val"),
    )


def apply_delta(
    view: DataFrame, feed: DataFrame, keys: Sequence[str], val: str
) -> DataFrame:
    """Refresh a :func:`sum_count_view` aggregate with one CDC feed
    step: inserts add, deletes subtract, groups whose count reaches
    zero leave the view. ONE shuffle on the group keys (the signed
    delta aggregation) plus a full outer join against the existing
    view — both sides at GROUP grain, so the join is dimension-sized
    regardless of base-table size."""
    keys = list(keys)
    # Only the plain insert/delete feed is algebraically foldable; a
    # KEYED feed (read_changes with key_cols) relabels update pairs as
    # update_preimage/update_postimage, and signing those -1 would
    # silently corrupt the view (each update would subtract twice).
    # Fail loudly at execution instead.
    sign = (
        F.when(F.col(CHANGE_COL) == "insert", F.lit(1))
        .when(F.col(CHANGE_COL) == "delete", F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "apply_delta: unexpected _change value '"
                    ),
                    F.col(CHANGE_COL),
                    F.lit(
                        "' — pass the PLAIN insert/delete feed "
                        "(read_changes without key_cols)"
                    ),
                )
            ).cast("int")
        )
    )
    delta = feed.groupBy(*keys).agg(
        F.sum(sign).cast("long").alias("_dn"),
        F.sum(sign * F.col(val)).alias("_ds"),
    )
    merged = view.join(delta, keys, "full").select(
        *keys,
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        ).alias("n_rows"),
        (
            F.coalesce(F.col("sum_val"), F.lit(0))
            + F.coalesce(F.col("_ds"), F.lit(0))
        ).alias("sum_val"),
    )
    return merged.filter(F.col("n_rows") > 0)


def agg_view(state: DataFrame, keys: Sequence[str], val: str) -> DataFrame:
    """The full aggregate-view SHAPE (r12): per-key ``n_rows``,
    ``sum_val``, ``min_val``, ``max_val`` — the reference's
    soldvalue/final_result report grain (portfolio-etl.py:615,627),
    maintained incrementally by :func:`apply_agg_delta` instead of
    recomputed per run."""
    return state.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(val).alias("sum_val"),
        F.min(val).alias("min_val"),
        F.max(val).alias("max_val"),
    )


def apply_agg_delta(
    view: DataFrame,
    feed: DataFrame,
    base_new: DataFrame,
    keys: Sequence[str],
    val: str,
) -> DataFrame:
    """Refresh an :func:`agg_view` with one CDC feed step.

    COUNT/SUM fold additively exactly as :func:`apply_delta` (one
    key-grain shuffle of the feed). MIN/MAX are not groupwise
    invertible under deletes, so the refresh splits the touched
    groups:

    - CLEAN: no deleted value reaches the group's candidate extremum
      (``least(old_min, inserted_min)`` / ``greatest(old_max,
      inserted_max)``) — the candidate IS the new extremum, no rescan;
    - DIRTY: some delete ties-or-beats a candidate extremum — the
      deleted value may have BEEN the extremum, so the group
      re-aggregates from ``base_new`` restricted to the dirty keys
      (broadcast semi-join: the dirty set is change-volume bounded).
      At 100 TB the rescan prunes to the dirty groups' partitions when
      the base is laid out by group key; the common append-mostly feed
      has no dirty groups at all.

    ``base_new`` must be the base state the feed leads TO (e.g.
    ``read_version`` of the chain head). Groups whose count reaches
    zero leave the view."""
    keys = list(keys)
    sign = (
        F.when(F.col(CHANGE_COL) == "insert", F.lit(1))
        .when(F.col(CHANGE_COL) == "delete", F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("apply_agg_delta: unexpected _change value '"),
                    F.col(CHANGE_COL),
                    F.lit(
                        "' — pass the PLAIN insert/delete feed "
                        "(read_changes without key_cols)"
                    ),
                )
            ).cast("int")
        )
    )
    is_ins = F.col(CHANGE_COL) == "insert"
    v = F.col(val)
    delta = feed.groupBy(*keys).agg(
        F.sum(sign).cast("long").alias("_dn"),
        F.sum(sign * v).alias("_ds"),
        F.min(F.when(is_ins, v)).alias("_ins_min"),
        F.max(F.when(is_ins, v)).alias("_ins_max"),
        F.min(F.when(~is_ins, v)).alias("_del_min"),
        F.max(F.when(~is_ins, v)).alias("_del_max"),
    )
    merged = (
        view.join(delta, keys, "full")
        .select(
            *keys,
            (
                F.coalesce(F.col("n_rows"), F.lit(0))
                + F.coalesce(F.col("_dn"), F.lit(0))
            ).alias("n_rows"),
            (
                F.coalesce(F.col("sum_val"), F.lit(0))
                + F.coalesce(F.col("_ds"), F.lit(0))
            ).alias("sum_val"),
            # least/greatest skip nulls, so an untouched group keeps its
            # extremum and a brand-new group takes the inserted one
            F.least("min_val", "_ins_min").alias("min_val"),
            F.greatest("max_val", "_ins_max").alias("max_val"),
            (
                F.col("_del_min").isNotNull()
                & (
                    (F.col("_del_min") <= F.least("min_val", "_ins_min"))
                    | (F.col("_del_max") >= F.greatest("max_val", "_ins_max"))
                )
            ).alias("_dirty"),
        )
        .filter(F.col("n_rows") > 0)
    )
    clean = merged.filter(~F.coalesce(F.col("_dirty"), F.lit(False))).drop(
        "_dirty"
    )
    dirty = merged.filter(F.coalesce(F.col("_dirty"), F.lit(False)))
    rescanned = (
        base_new.join(F.broadcast(dirty.select(*keys)), keys, "left_semi")
        .groupBy(*keys)
        .agg(F.min(val).alias("min_val"), F.max(val).alias("max_val"))
    )
    fixed = dirty.drop("min_val", "max_val", "_dirty").join(rescanned, keys)
    return clean.unionByName(fixed.select(*clean.columns))


def distinct_view(
    state: DataFrame, keys: Sequence[str], val: str
) -> tuple[DataFrame, DataFrame]:
    """Exact per-key COUNT DISTINCT maintained under deletes (r12):
    returns ``(aux, view)`` where ``aux`` is the (keys, val) → ``cnt``
    multiplicity sidecar (the auxiliary structure the module docstring
    promises for non-invertible aggregates) and ``view`` is the
    per-key distinct count derived from it. Store BOTH; refresh with
    :func:`apply_distinct_delta` — the sidecar makes distinct-count
    fully incremental: a delete decrements one (key, val) cell and
    the count drops only when the cell reaches zero."""
    keys = list(keys)
    aux = state.groupBy(*keys, val).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    view = aux.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    return aux, view


def apply_distinct_delta(
    aux: DataFrame,
    view: DataFrame,
    feed: DataFrame,
    keys: Sequence[str],
    val: str,
) -> tuple[DataFrame, DataFrame]:
    """One CDC step of a :func:`distinct_view` — the DBSP ``distinct``
    operator, never a rescan of the BASE table:

    1. fold the signed feed per (keys, val) and full-outer merge it
       into the sidecar — one sidecar-grain shuffle (value-domain
       sized, co-partitioned with the delta; at 100 TB lay the stored
       sidecar out by (keys, val) and this merge is join-local),
       never base-grain;
    2. a cell crossing 0 → +n contributes +1 to its key's distinct
       count, a cell crossing +n → 0 contributes −1, every other
       transition contributes nothing — so the VIEW fold is
       delta-proportional: untouched cells have ``_d`` null and fold
       a structural 0.

    Returns the refreshed ``(aux, view)``. Negative cell counts (a
    delete for a value never inserted) raise at execution — a signed
    multiset with negative multiplicity means the feed and sidecar
    have diverged, and silently clamping would corrupt every
    downstream refresh."""
    keys = list(keys)
    signed = _signed(feed)
    delta = signed.groupBy(*keys, val).agg(
        F.sum("_sign").cast("long").alias("_d")
    )
    cells = aux.join(delta, [*keys, val], "full").select(
        *keys,
        val,
        F.col("_d").isNotNull().alias("_touched"),
        F.coalesce(F.col("cnt"), F.lit(0)).alias("_old"),
        (
            F.coalesce(F.col("cnt"), F.lit(0))
            + F.coalesce(F.col("_d"), F.lit(0))
        ).alias("cnt"),
    )
    guarded = cells.withColumn(
        "cnt",
        F.when(
            F.col("cnt") < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        "apply_distinct_delta: cell multiplicity went "
                        "negative — the feed deletes a value the "
                        "sidecar never held (keys="
                    ),
                    F.concat_ws(
                        ",", *[F.col(k).cast("string") for k in keys]
                    ),
                    F.lit(")"),
                )
            ).cast("long"),
        ).otherwise(F.col("cnt")),
    )
    step = (
        F.when((F.col("_old") == 0) & (F.col("cnt") > 0), F.lit(1))
        .when((F.col("_old") > 0) & (F.col("cnt") == 0), F.lit(-1))
        .otherwise(F.lit(0))
    )
    vdelta = (
        guarded.filter(F.col("_touched"))
        .select(*keys, step.alias("_s"))
        .groupBy(*keys)
        .agg(F.sum("_s").cast("long").alias("_dn"))
    )
    new_view = (
        view.join(vdelta, keys, "full")
        .select(
            *keys,
            (
                F.coalesce(F.col("n_distinct"), F.lit(0))
                + F.coalesce(F.col("_dn"), F.lit(0))
            ).alias("n_distinct"),
        )
        .filter(F.col("n_distinct") > 0)
    )
    new_aux = guarded.filter(F.col("cnt") > 0).select(*keys, val, "cnt")
    return new_aux, new_view.select(*keys, "n_distinct")


def refresh_from_chain(
    spark,
    path: str,
    view: DataFrame,
    keys: Sequence[str],
    val: str,
    from_version: int,
    to_version: int,
) -> DataFrame:
    """Fast-forward a :func:`sum_count_view` across a SPAN of versions
    of a manifest-committed chain (operators/sinks.write_versioned
    with ``capture_changes``): one ``read_changes`` span read folds
    every step's delta files, one :func:`apply_delta` refreshes the
    view — cost proportional to the total change volume of the span,
    never a snapshot rescan. The caller tracks ``from_version`` (the
    version the view currently reflects); committing the refreshed
    view and marker atomically is the same manifest-meta pattern the
    streaming CDC job uses for exactly-once."""
    from portfolio1_etl_spark.operators.sinks import read_changes

    feed = read_changes(spark, path, from_version, to_version)
    return apply_delta(view, feed, keys, val)


def join_view(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """The maintained JOIN's shape: the inner join of ``a`` and ``b``
    as a MULTISET with an explicit ``_mult`` multiplicity column
    (grouped, so the view is stored compactly and the incremental
    algebra below is a plain signed aggregation). Build the initial
    view with this, refresh with :func:`apply_join_delta`."""
    j = a.join(b, list(on))
    return j.groupBy(*j.columns).agg(
        F.count(F.lit(1)).cast("long").alias("_mult")
    )


def _signed(feed: DataFrame) -> DataFrame:
    sign = (
        F.when(F.col(CHANGE_COL) == "insert", F.lit(1))
        .when(F.col(CHANGE_COL) == "delete", F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("apply_join_delta: unexpected _change value '"),
                    F.col(CHANGE_COL),
                    F.lit("' — pass the PLAIN insert/delete feed"),
                )
            ).cast("int")
        )
    )
    return feed.withColumn("_sign", sign.cast("long")).drop(CHANGE_COL)


def apply_join_delta(
    view: DataFrame,
    a_new: DataFrame,
    b_new: DataFrame,
    feed_a: DataFrame,
    feed_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Incrementally refresh a :func:`join_view` with one CDC step of
    EACH side, never re-joining the full tables: in the multiset ring
    (signed Z-relations — the DBSP/differential-dataflow algebra),

        ΔJ = ΔA ⋈ B_new  +  A_new ⋈ ΔB  −  ΔA ⋈ ΔB

    (derived from J_new − J_old with A_new = A_old + ΔA; the −ΔA⋈ΔB
    term removes the double count when BOTH sides changed the same
    key). Each term joins a DELTA against one full side on the join
    keys — cost O(|Δ| · fanout), not O(|A|·|B|); at 100 TB the delta
    side broadcasts or shuffles tiny. The refreshed view folds the
    signed rows per distinct row and keeps positive multiplicities —
    deletes that empty a row drop it exactly."""
    on = list(on)
    da, db = _signed(feed_a), _signed(feed_b)
    t1 = da.join(b_new, on)
    t2 = a_new.join(db, on)
    t3 = (
        da.withColumnRenamed("_sign", "_sa")
        .join(db.withColumnRenamed("_sign", "_sb"), on)
        .withColumn("_sign", -F.col("_sa") * F.col("_sb"))
        .drop("_sa", "_sb")
    )
    cols = [c for c in view.columns if c != "_mult"]
    delta = (
        t1.select(*cols, "_sign")
        .unionByName(t2.select(*cols, "_sign"))
        .unionByName(t3.select(*cols, "_sign"))
    )
    merged = (
        view.withColumn("_sign", F.col("_mult")).drop("_mult")
        .unionByName(delta)
        .groupBy(*cols)
        .agg(F.sum("_sign").cast("long").alias("_mult"))
    )
    return merged.filter(F.col("_mult") > 0)
