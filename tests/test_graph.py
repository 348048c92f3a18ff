"""Weighted PageRank operator — invariants behind q98."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_symmetric_cycle_stays_uniform(spark):
    e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=4).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_hub_attracts_mass(spark):
    # a, b, c all point at hub; hub points back at a only
    e = _edges(
        spark,
        [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1), ("hub", "a", 1)],
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
    assert got["hub"] > got["a"] > got["b"]
    assert abs(got["b"] - got["c"]) < 1e-9


def test_mass_conserved_without_dangling_nodes(spark):
    e = _edges(
        spark,
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("a", "c", 1)],
    )
    total = pagerank(e, iters=4).agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6


def test_dangling_node_leaks_mass(spark):
    # sink has no out-edges: its inflow vanishes next round
    e = _edges(spark, [("a", "sink", 1), ("a", "b", 1), ("b", "a", 1)])
    total = pagerank(e, iters=4).agg(F.sum("rank")).first()[0]
    assert total < 1.0


def test_weights_matter(spark):
    # a splits 9:1 between b and c
    e = _edges(
        spark,
        [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=6).collect()}
    assert got["b"] > got["c"]


def test_empty_edges(spark):
    e = _edges(spark, [])
    out = pagerank(e, iters=2)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0
