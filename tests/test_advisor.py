"""Stats-driven join advisor (operators/advisor.py): the ANALYZE
stats must actually drive the physical plan — a dim under the
broadcast threshold broadcasts, a fact-fact join does not, and the
advisor never proposes a hint Spark would drop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.advisor import (
    advise_join,
    apply_join_advice,
    estimate_row_width,
    join_advice_frame,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    )


@pytest.fixture(scope="module")
def fact(spark):
    return spark.range(200_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )


def test_row_width_from_schema(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0)], "a int, b string, c double"
    )
    assert estimate_row_width(df) == 4 + 20 + 8


def test_dim_broadcasts_fact_does_not(spark, dim, fact):
    # Catalyst's own auto-broadcast is OFF, so a BroadcastHashJoin in
    # the plan can only come from the ADVISOR's hint — the stats table
    # is what drives the strategy, which is the point of the op
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        adv = advise_join(fact, dim, "k", "k", exact_ndv=True,
                          broadcast_threshold_bytes=64 * 1024)
        assert adv["strategy"] == "broadcast_right"
        joined = apply_join_advice(fact, dim, "k", advice=adv)
        assert "BroadcastHashJoin" in _plan(joined)

        # fact ⋈ fact: both sides over threshold → no broadcast; the
        # "sort_merge" verdict means "shuffle join, Catalyst picks the
        # physical form" — under the session's
        # preferSortMergeJoin=false (r13) that may legitimately plan
        # ShuffledHashJoin when a build side fits per partition
        adv2 = advise_join(fact, fact, "k", "k", exact_ndv=True,
                           broadcast_threshold_bytes=64 * 1024)
        assert adv2["strategy"] == "sort_merge"
        joined2 = apply_join_advice(
            fact, fact.withColumnRenamed("v", "v2"), "k", advice=adv2
        )
        p2 = _plan(joined2)
        assert "SortMergeJoin" in p2 or "ShuffledHashJoin" in p2
        assert "BroadcastHashJoin" not in p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_smaller_legal_side_wins(spark, dim, fact):
    small = dim.limit(10)
    adv = advise_join(small, dim, "k", "k", exact_ndv=True)
    assert adv["strategy"] == "broadcast_left"
    assert adv["left_bytes"] <= adv["right_bytes"]


def test_outer_join_legality(spark, dim, fact):
    # left outer: only the right side may broadcast — even when the
    # LEFT side is the smaller one
    adv = advise_join(dim, fact, "k", "k", how="left", exact_ndv=True)
    assert adv["strategy"] == (
        "broadcast_right"
        if adv["right_bytes"] <= 10 * 1024 * 1024
        else "sort_merge"
    )
    # right outer mirrors
    adv_r = advise_join(fact, dim, "k", "k", how="right", exact_ndv=True,
                        broadcast_threshold_bytes=64 * 1024)
    assert adv_r["strategy"] == "sort_merge"  # only LEFT could broadcast; fact too big
    # full outer: nothing broadcasts
    adv_f = advise_join(dim, dim, "k", "k", how="full", exact_ndv=True)
    assert adv_f["strategy"] == "sort_merge"


def test_skew_flag_from_ndv(spark, fact):
    # 200k rows over 100 distinct keys = multiplicity 2000 >> 16
    adv = advise_join(fact, fact, "k", "k", exact_ndv=True)
    assert adv["skew_side"] == "both"
    uniform = spark.range(1000).select(F.col("id").alias("k"))
    adv2 = advise_join(uniform, fact, "k", "k", exact_ndv=True)
    assert adv2["skew_side"] == "right"


def test_advice_frame_is_lazy_single_row(spark, dim, fact):
    frame = join_advice_frame(fact, dim, "k", "k", exact_ndv=False)
    rows = frame.collect()
    assert len(rows) == 1
    # HLL production form still lands the same verdict on this data
    assert rows[0].strategy == "broadcast_right"


def test_unknown_join_type_rejected(spark, dim):
    with pytest.raises(ValueError, match="join type"):
        join_advice_frame(dim, dim, "k", "k", how="sideways")


def test_skewed_sort_merge_routes_through_salting(spark, fact):
    """A skew-flagged inner sort-merge join with a salt-budget-sized
    other side routes through salted_join (the explode/Generate shows
    in the plan) and returns exactly the plain join's rows; outer
    joins never salt."""
    other = spark.range(5000).select(
        (F.col("id") % 100).alias("k"), (F.col("id") * 2).alias("w")
    )
    adv = advise_join(fact, other, "k", "k", exact_ndv=True,
                      broadcast_threshold_bytes=1024)  # nothing broadcasts
    assert adv["strategy"] == "sort_merge" and adv["skew_side"] in (
        "left", "both", "right",
    )
    # force single-side skew flag: fact is 200k rows/100 keys, other
    # is 5k rows/100 keys (multiplicity 50 > 16 → both flagged) — so
    # craft a genuinely uniform other side instead
    uniform = spark.range(3000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    adv2 = advise_join(fact, uniform, "k", "k", exact_ndv=True,
                       broadcast_threshold_bytes=1024)
    assert adv2["strategy"] == "sort_merge" and adv2["skew_side"] == "left"
    joined = apply_join_advice(fact, uniform, "k", advice=adv2)
    plan = _plan(joined)
    assert "Generate" in plan  # the salt explode
    want = fact.join(uniform, "k").groupBy().agg(
        F.count(F.lit(1)), F.sum("v"), F.sum("w")
    ).collect()
    got = joined.groupBy().agg(
        F.count(F.lit(1)), F.sum("v"), F.sum("w")
    ).collect()
    assert got == want
    assert joined.columns == ["k", "v", "w"]
    # outer joins keep the plain form even when skew is flagged
    outer = apply_join_advice(fact, uniform, "k", how="left", advice=dict(
        adv2, strategy="sort_merge"
    ))
    assert "Generate" not in _plan(outer)


def test_salting_guards_fall_back_to_plain_join(spark, fact):
    """Review regression (r8): the stats-triggered salting must never
    reject an input the plain join accepts — MapType columns (hash()
    rejects maps), an existing _salt column, shared non-key names, and
    partial advice dicts all fall back to plain sort-merge."""
    uniform = spark.range(3000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    skew_advice = {"strategy": "sort_merge", "skew_side": "left",
                   "left_bytes": 10**9, "right_bytes": 1}
    # MapType on the big side
    mapped = fact.withColumn("m", F.create_map(F.lit("a"), F.col("v")))
    j1 = apply_join_advice(mapped, uniform, "k", advice=skew_advice)
    assert "Generate" not in _plan(j1) and j1.count() > 0
    # _salt already claimed
    pre_salted = fact.withColumn("_salt", F.lit(1))
    j2 = apply_join_advice(pre_salted, uniform, "k", advice=skew_advice)
    assert "Generate" not in _plan(j2)
    # shared non-key column name
    clash = uniform.withColumnRenamed("w", "v")
    j3 = apply_join_advice(fact, clash, "k", advice=skew_advice)
    assert "Generate" not in _plan(j3)
    # partial advice dict (no byte estimates) skips salting, no KeyError
    j4 = apply_join_advice(fact, uniform, "k",
                           advice={"strategy": "sort_merge",
                                   "skew_side": "left"})
    assert "Generate" not in _plan(j4)
