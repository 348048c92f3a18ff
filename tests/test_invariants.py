"""Property-based invariants (hypothesis) over the pipeline's NULL/NaN
-sensitive operators — guarding exactly the pandas-vs-SQL semantic
traps from SURVEY.md §4.3.5-7."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from portfolio1_etl_spark.pipeline import clean_sales, soldvalue, wholesale

skus = st.sampled_from(["a-1", "B-2 ", " c-3", "sku", "other", "D-4"])
qtys = st.sampled_from(["1", "2.5", "junk", "0", "-3", ""])
rows = st.lists(st.tuples(skus, qtys), min_size=0, max_size=25)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(data=rows)
@_SETTINGS
def test_soldvalue_total_preserved(spark, data):
    """Invariant: sum(groupBy sum) == sum(all cleaned rows) — NULL
    qty rows contribute nothing in both forms (NaN-skip parity)."""
    sales = spark.createDataFrame(
        [(s, q, "site") for s, q in data] or [("x", "1", "site")],
        "sku string, qty string, site string",
    )
    cleaned = clean_sales(sales)
    direct = cleaned.agg(F.sum("qty")).collect()[0][0]
    grouped = soldvalue(cleaned).agg(F.sum("qty")).collect()[0][0]
    if direct is None:
        assert grouped is None
    else:
        assert math.isclose(direct, grouped, rel_tol=1e-9)


@given(data=rows)
@_SETTINGS
def test_clean_sales_never_emits_sentinels(spark, data):
    sales = spark.createDataFrame(
        [(s, q, "site") for s, q in data] or [("x", "1", "site")],
        "sku string, qty string, site string",
    )
    got = [r.sku for r in clean_sales(sales).collect()]
    assert all(s == s.strip().lower() for s in got)
    assert "other" not in got and not any("sku" in s for s in got)


@given(mults=st.lists(st.floats(0.5, 4, allow_nan=False), min_size=1, max_size=4))
@_SETTINGS
def test_wholesale_right_join_keeps_every_map_row(spark, mults):
    """Right-join invariant (§4.3.6): the wholesale output has exactly
    the distinct sku_name groups of the map, sales or not."""
    sales = spark.createDataFrame(
        [("a-1", "2", "w")], "sku string, qty string, site string"
    )
    skus_map = spark.createDataFrame(
        [(f"p{i}", f"W{i % 2}", m) for i, m in enumerate(mults)],
        "sku_part string, sku_name string, multiplier double",
    )
    ws = wholesale(soldvalue(clean_sales(sales)), skus_map)
    want_groups = {f"W{i % 2}" for i in range(len(mults))}
    assert {r.sku for r in ws.collect()} == want_groups
