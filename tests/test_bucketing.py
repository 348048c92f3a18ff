"""Bucketed-join co-location: the join of two tables bucketed on the
join key must plan with NO shuffle Exchange — the 100 TB repeated-join
pattern (SURVEY.md §2.5 engine surface)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.bucketing import bucketed, write_bucketed


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    li = catalog.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = catalog.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8)
    write_bucketed(o, "o_bucketed", "o_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    li = bucketed(spark, "li_bucketed")
    o = bucketed(spark, "o_bucketed")
    # force the sort-merge path (broadcast would win at this tiny SF and
    # hide the property being tested)
    joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        f"bucketed join still shuffles:\n{plan}"
    )
    assert "SortMergeJoin" in plan

    # and it's correct
    n = joined.count()
    li_raw = catalog.load(spark, sf_dir, "lineitem")
    o_raw = catalog.load(spark, sf_dir, "orders")
    assert n == li_raw.join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey).count()


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    li = catalog.load(spark, sf_dir, "lineitem")
    o = catalog.load(spark, sf_dir, "orders")
    # Force non-broadcast to compare shapes fairly.
    joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
