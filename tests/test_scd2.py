"""Incremental SCD2 == batch rebuild, and idempotency of re-delivery."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.scd import scd2_apply, scd2_rebuild


def _canon(df):
    return sorted(
        (r.user_id, r.state, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in df.collect()
    )


def test_incremental_equals_batch_rebuild(spark, sf_dir):
    """Split the event log at mid-month; rebuild(first) ++ apply(second)
    must equal rebuild(all) row-for-row."""
    events = catalog.load(spark, sf_dir, "events")
    cutoff = "2024-01-15"
    first = events.filter(F.col("ts") < F.lit(cutoff).cast("timestamp_ntz"))
    second = events.filter(F.col("ts") >= F.lit(cutoff).cast("timestamp_ntz"))
    full = scd2_rebuild(events)
    incremental = scd2_apply(scd2_rebuild(first), second)
    assert _canon(incremental) == _canon(full)


def test_apply_is_idempotent_on_redelivery(spark, sf_dir):
    """Re-applying the same batch changes nothing: repeated states
    collapse in change detection."""
    events = catalog.load(spark, sf_dir, "events")
    batch = events.filter(F.col("user_id") < 5)
    once = scd2_apply(scd2_rebuild(events), batch)
    twice = scd2_apply(once, batch)
    assert _canon(once) == _canon(twice)


def test_untouched_entities_pass_through(spark):
    rows = [
        (1, "a", "2024-01-01 00:00:00", 10),
        (1, "b", "2024-01-02 00:00:00", 11),
        (2, "x", "2024-01-01 00:00:00", 12),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    current = scd2_rebuild(events)
    new = spark.createDataFrame(
        [(1, "c", "2024-01-03 00:00:00", 13)],
        "user_id long, event_type string, ts string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = scd2_apply(current, new)
    by_user = {(r.user_id, r.version): r for r in out.collect()}
    # user 2 untouched
    assert by_user[(2, 1)].is_current and by_user[(2, 1)].state == "x"
    # user 1 gains version 3, version 2 closes
    assert by_user[(1, 3)].is_current and by_user[(1, 3)].state == "c"
    assert not by_user[(1, 2)].is_current
    assert by_user[(1, 2)].valid_to == by_user[(1, 3)].valid_from


def test_timestamp_ties_resolve_deterministically(spark):
    """Two surviving changes at the SAME timestamp must close/version
    by the original event order (tiebreak), in both the batch rebuild
    and the incremental path."""
    rows = [
        (1, "a", "2024-01-01 00:00:00", 1),
        (1, "b", "2024-01-02 00:00:00", 2),  # tie on ts with next
        (1, "c", "2024-01-02 00:00:00", 3),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    full = {r.version: r for r in scd2_rebuild(events).collect()}
    assert [full[v].state for v in sorted(full)] == ["a", "b", "c"]
    assert full[2].valid_to == full[3].valid_from and not full[2].is_current
    assert full[3].is_current
    # incremental with the tie arriving in the second batch
    first = events.filter(F.col("event_id") <= 2)
    second = events.filter(F.col("event_id") == 3)
    inc = {r.version: r for r in scd2_apply(scd2_rebuild(first), second).collect()}
    assert {v: (inc[v].state, inc[v].is_current) for v in inc} == {
        v: (full[v].state, full[v].is_current) for v in full
    }
