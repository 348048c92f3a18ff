"""operators/ranks: the scale-safe exact-rank composition must agree
EXACTLY with Spark's own window functions (which are fine as a test
oracle at this size — the point of the operator is the plan shape,
not different semantics), across ties, groups, descending orders,
lopsided buckets, and the prefix-sum variant."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.ranks import (
    cume_dist_from_rank,
    ntile_from_rank,
    percent_rank_from_rank,
    with_exact_rank,
)


def _df(spark, seed=11, n=500):
    rng = random.Random(seed)
    rows = [
        (
            i,
            rng.choice("ABC"),
            rng.choice([0, 1, 1, 2, 5, 5, 5, 9]),  # heavy ties
            round(rng.uniform(-100, 100), 2),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, g string, k long, v double")


def test_rank_matches_window_global(spark):
    df = _df(spark)
    got = with_exact_rank(
        df,
        order_by=[F.col("k"), F.col("id")],
        bucket=F.col("k"),  # ties share a bucket; heavy cells on purpose
    )
    w = Window.orderBy("k", "id")
    want = df.withColumn("_rank", F.row_number().over(w))
    g = {r["id"]: r["_rank"] for r in got.collect()}
    for r in want.collect():
        assert g[r["id"]] == r["_rank"]
    assert got.select("_n").distinct().collect()[0][0] == df.count()


def test_rank_matches_window_grouped_desc(spark):
    df = _df(spark, seed=12)
    got = with_exact_rank(
        df,
        order_by=[F.col("v").desc(), F.col("id")],
        bucket=F.floor(-F.col("v") / 25).cast("long"),
        group_cols=["g"],
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), "id")
    want = df.withColumn("_rank", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    g = {r["id"]: (r["_rank"], r["_n"]) for r in got.collect()}
    for r in want.collect():
        assert g[r["id"]] == (r["_rank"], r["_n"]), r["id"]


def test_derived_trio_matches_window(spark):
    df = _df(spark, seed=13)
    got = with_exact_rank(
        df, order_by=[F.col("v"), F.col("id")], bucket=F.floor(F.col("v") / 10)
    ).select(
        "id",
        ntile_from_rank(F.col("_rank"), F.col("_n"), 7).alias("nt"),
        percent_rank_from_rank(F.col("_rank"), F.col("_n")).alias("pr"),
        cume_dist_from_rank(F.col("_rank"), F.col("_n")).alias("cd"),
    )
    w = Window.orderBy("v", "id")
    want = df.select(
        "id",
        F.ntile(7).over(w).alias("nt"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    g = {r["id"]: (r["nt"], r["pr"], r["cd"]) for r in got.collect()}
    for r in want.collect():
        nt, pr, cd = g[r["id"]]
        assert nt == r["nt"], r["id"]
        assert abs(pr - r["pr"]) < 1e-12, r["id"]
        assert abs(cd - r["cd"]) < 1e-12, r["id"]


def test_ntile_all_k_and_single_row(spark):
    # every (n, k) remainder shape, incl. n < k
    df = spark.range(1, 24).select(F.col("id").alias("v"))
    for k in (1, 2, 3, 5, 10, 40):
        got = with_exact_rank(
            df, order_by=[F.col("v")], bucket=F.floor(F.col("v") / 4)
        ).select(
            "v", ntile_from_rank(F.col("_rank"), F.col("_n"), k).alias("nt")
        )
        want = df.select(
            "v", F.ntile(k).over(Window.orderBy("v")).alias("nt")
        )
        g = {r["v"]: r["nt"] for r in got.collect()}
        for r in want.collect():
            assert g[r["v"]] == r["nt"], (k, r["v"])
    one = spark.createDataFrame([(1.0,)], "v double")
    row = (
        with_exact_rank(one, order_by=[F.col("v")], bucket=F.lit(0))
        .select(
            percent_rank_from_rank(F.col("_rank"), F.col("_n")).alias("pr"),
            cume_dist_from_rank(F.col("_rank"), F.col("_n")).alias("cd"),
        )
        .collect()[0]
    )
    assert row["pr"] == 0.0 and row["cd"] == 1.0


def test_prefix_sum_matches_window(spark):
    df = _df(spark, seed=14).withColumn(
        "cents", (F.col("v") * 100).cast("long")
    )
    got = with_exact_rank(
        df,
        order_by=[F.col("cents").desc(), F.col("id")],
        bucket=F.floor(-F.col("cents") / 1000).cast("long"),
        group_cols=["g"],
        sum_col=F.col("cents"),
        sum_type="decimal(38,0)",
    )
    w = Window.partitionBy("g").orderBy(F.col("cents").desc(), "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("cents").over(w)).withColumn(
        "tot", F.sum("cents").over(Window.partitionBy("g"))
    )
    g = {r["id"]: (int(r["_cumsum"]), int(r["_total"])) for r in got.collect()}
    for r in want.collect():
        assert g[r["id"]] == (r["cum"], r["tot"]), r["id"]


def test_plan_has_no_single_partition_exchange(spark):
    df = _df(spark, seed=15)
    got = with_exact_rank(
        df, order_by=[F.col("v"), F.col("id")], bucket=F.floor(F.col("v") / 10)
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # The single-partition exchange that remains is the FINAL tiny
    # aggregate folding ≤cells count rows into the offsets array — the
    # bucket-grain reduction every sketch ends with. The WINDOW (which
    # sees every data row) must be hash-partitioned on the bucket.
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window [row_number()" in line:
            child = "\n".join(lines[i + 1 : i + 3])
            assert "Exchange hashpartitioning(_rkb" in child, child
            break
    else:
        raise AssertionError("no Window node found")
    assert "BroadcastExchange" in plan  # the offsets frame broadcasts
