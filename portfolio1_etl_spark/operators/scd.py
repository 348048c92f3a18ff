"""SCD2 (type-2 slowly-changing-dimension) operator library.

``scd2_rebuild`` is the batch history build (the oracle-checked query
form is plans/warehouse_ops.q46). ``scd2_apply`` is the INCREMENTAL
form a daily pipeline runs: existing history rows of touched entities
replay as their own change log (an SCD2 table IS a compressed event
stream — one row per state change), merge with the new events, and
rebuild — untouched entities pass through without being read twice.
Equivalence of the two forms is asserted in tests/test_scd2.py.

Scale shape: the increment touches only affected entities (semi/anti
join on the new batch's key set — broadcastable for a daily delta),
and the rebuild inside is one shuffle on the entity key. No driver
loops, no MERGE engine needed, plain parquet in and out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def scd2_rebuild(
    events: DataFrame,
    entity_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """(entity, state, valid_from, valid_to, is_current, version):
    collapse consecutive duplicate states per entity, open one validity
    interval per surviving change, close it with the next change."""
    order_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    ordered = W.partitionBy(entity_col).orderBy(*order_cols)
    # carry the arrival order into the second window pass so two
    # surviving changes with the SAME timestamp still close/version
    # deterministically (ties broken by the original event order).
    by_from = W.partitionBy(entity_col).orderBy("valid_from", "_seq")
    changes = (
        events.withColumn("prev_state", F.lag(state_col).over(ordered))
        .withColumn("_seq", F.row_number().over(ordered))
        .filter(
            F.col("prev_state").isNull()
            | (F.col(state_col) != F.col("prev_state"))
        )
        .select(
            F.col(entity_col),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            "_seq",
        )
    )
    return changes.select(
        entity_col,
        "state",
        "valid_from",
        F.lead("valid_from").over(by_from).alias("valid_to"),
        F.lead("valid_from").over(by_from).isNull().alias("is_current"),
        F.row_number().over(by_from).cast("long").alias("version"),
    )


def scd2_apply(
    current: DataFrame,
    new_events: DataFrame,
    entity_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Incremental SCD2 merge: entities absent from the new batch pass
    through untouched (anti-join); touched entities rebuild from their
    replayed change rows + the new events. A new event repeating the
    entity's current state collapses in the rebuild's change
    detection, so re-delivered batches are idempotent.

    Timestamp ties resolve deterministically: replayed history rows
    order by their committed version, new events by ``tiebreak_col``,
    and at an exact (entity, ts) collision across the boundary the
    replayed row sorts first (history precedes the new arrival) —
    matching a full rebuild whenever the batch split respects event
    order, which is the contract of a time-partitioned ingest."""
    affected = new_events.select(entity_col).distinct()
    untouched = current.join(F.broadcast(affected), entity_col, "left_anti")
    replayed = current.join(
        F.broadcast(affected), entity_col, "left_semi"
    ).select(
        entity_col,
        F.col("state").alias(state_col),
        F.col("valid_from").alias(ts_col),
        (F.col("version") - F.lit(2**62)).alias("_ord"),
    )
    # a NULL tiebreak must not sort a new arrival ahead of replayed
    # history (nulls-first in the rebuild's ordering) — missing order
    # keys mean "no preference", i.e. 0
    new_ord = (
        F.coalesce(F.col(tiebreak_col).cast("long"), F.lit(0))
        if tiebreak_col
        else F.lit(0).cast("long")
    )
    incoming = new_events.select(
        entity_col, state_col, ts_col, new_ord.alias("_ord")
    )
    rebuilt = scd2_rebuild(
        replayed.unionByName(incoming),
        entity_col=entity_col,
        state_col=state_col,
        ts_col=ts_col,
        tiebreak_col="_ord",
    )
    return untouched.unionByName(rebuilt)
