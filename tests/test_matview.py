"""Incremental materialized-view maintenance (operators/matview):
delta-refresh must equal a from-scratch recompute of the new state,
including groups that leave the view when their count hits zero."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.matview import (
    apply_delta,
    sum_count_view,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_refresh_equals_recompute(spark):
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "c", 7)],
        "id long, grp string, val long",
    )
    # v1: id=2 deleted, id=3 updated (5 -> 50), id=5 inserted into a
    # NEW group, group c unchanged
    v1 = spark.createDataFrame(
        [(1, "a", 10), (3, "b", 50), (4, "c", 7), (5, "d", 9)],
        "id long, grp string, val long",
    )
    feed = spark.createDataFrame(
        [
            ("delete", "a", 20),
            ("delete", "b", 5),
            ("insert", "b", 50),
            ("insert", "d", 9),
        ],
        "_change string, grp string, val long",
    )
    maintained = apply_delta(
        sum_count_view(v0, ["grp"], "val"), feed, ["grp"], "val"
    )
    assert _rows(maintained) == _rows(sum_count_view(v1, ["grp"], "val"))


def test_group_leaves_view_at_zero(spark):
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 3)], "id long, grp string, val long"
    )
    feed = spark.createDataFrame(
        [("delete", "b", 3)], "_change string, grp string, val long"
    )
    out = apply_delta(sum_count_view(v0, ["grp"], "val"), feed, ["grp"], "val")
    assert _rows(out) == [("a", 1, 10)]


def test_empty_feed_is_identity(spark):
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 3)], "id long, grp string, val long"
    )
    feed = spark.createDataFrame(
        [], "_change string, grp string, val long"
    )
    view = sum_count_view(v0, ["grp"], "val")
    assert _rows(apply_delta(view, feed, ["grp"], "val")) == _rows(view)
