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


def test_dangling_redistribution_conserves_mass(spark):
    # sink has no out-edges; with redistribution its mass returns
    # uniformly each round instead of leaking, so sum(rank) ≈ 1.
    e = _edges(spark, [("a", "sink", 1), ("a", "b", 1), ("b", "a", 1)])
    ranks = pagerank(e, iters=6, redistribute_dangling=True)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6
    # and the redistributed variant dominates the leaky one everywhere
    leaky = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=6, redistribute_dangling=False).collect()
    }
    full = {r["node"]: r["rank"] for r in ranks.collect()}
    assert all(full[n] >= leaky[n] for n in full)


def test_early_exit_matches_fixed_iteration_count(spark):
    # symmetric cycle reaches its 10 dp fixpoint after round 1; early
    # exit must return the SAME vector a fixed 6-round run produces.
    e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
    stable = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=6, stop_when_stable=True).collect()
    }
    fixed = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=6, stop_when_stable=False).collect()
    }
    assert stable == fixed == {"a": 0.5, "b": 0.5}


def test_no_out_edges_at_all_redistributes_uniformly(spark):
    # every node is dangling (edges exist but... impossible: edges
    # imply out-edges). Closest degenerate case: one edge, two nodes,
    # dst dangling — redistribution keeps the 2-node system at mass 1.
    e = _edges(spark, [("a", "b", 1)])
    ranks = pagerank(e, iters=4, redistribute_dangling=True)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6


def test_triangle_counts_known_graphs(spark):
    """Degree-oriented counting against hand-countable graphs: K5
    (every node in C(4,2)=6 triangles), a star (zero triangles — the
    hub shape naive neighbor-joins explode on), and K4 plus a pendant
    chain (counts only inside the clique)."""
    from portfolio1_etl_spark.operators.graph import triangle_counts

    def run(edges):
        df = spark.createDataFrame(edges, "u long, v long")
        return {r.node: r.n_triangles for r in triangle_counts(df).collect()}

    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert run(k5) == {i: 6 for i in range(5)}
    star = [(0, i) for i in range(1, 9)]
    assert run(star) == {}
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    chain = k4 + [(3, 10), (10, 11)]
    got = run(chain)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # triangle through the hub of a wheel: star + rim edges
    wheel = [(0, i) for i in range(1, 6)] + [(i, i + 1) for i in range(1, 5)] + [(5, 1)]
    got = run(wheel)
    assert got[0] == 5 and all(got[i] == 2 for i in range(1, 6))


def test_kcore_fixed_rounds_equals_fixpoint(spark, sf_dir):
    """q163's fixed-round contract must equal the true fixpoint peel
    on the scoreboard's own data (if the graph ever needs more rounds,
    this fails loudly and the round count gets bumped in BOTH
    engines), and a hand-built cascade peels correctly."""
    from portfolio1_etl_spark.operators.graph import kcore_peel
    from portfolio1_etl_spark.plans.graph_ops import (
        _KCORE_ROUNDS,
        q163_user_kcore,
    )

    got = {
        (r.node, r.degree)
        for r in q163_user_kcore(spark, sf_dir).collect()
    }
    # rebuild the same edges and peel to fixpoint
    from portfolio1_etl_spark import catalog

    e = catalog.load(spark, sf_dir, "events")
    ub = e.select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).distinct()
    hcnt = ub.groupBy("h").agg(F.count(F.lit(1)).alias("nu"))
    small = ub.join(hcnt.filter(F.col("nu") <= 40).select("h"), "h")
    a = small.select(F.col("user_id").alias("u"), "h")
    b = small.select(F.col("user_id").alias("v"), "h")
    edges = (
        a.join(b, "h")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= 3)
        .select("u", "v")
    )
    want = {
        (r.node, r.degree)
        for r in kcore_peel(edges, k=2, rounds=None).collect()
    }
    assert got == want
    assert _KCORE_ROUNDS == 4


def test_kcore_cascade(spark):
    """A chain hanging off a triangle cascades away node by node; the
    triangle is the 2-core."""
    from portfolio1_etl_spark.operators.graph import kcore_peel

    # triangle 1-2-3 plus chain 3-4-5-6
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)], "u long, v long"
    )
    got = {
        (r.node, r.degree) for r in kcore_peel(edges, k=2).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 2)}
    # one round is NOT enough: only 6 has cascaded, so 4 still shows
    # degree 2 (edges 3-4, 4-5) and wrongly survives
    after1 = {
        r.node for r in kcore_peel(edges, k=2, rounds=1).collect()
    }
    assert 4 in after1


def test_bfs_levels_hand_graph(spark):
    """Path + branch + unreachable component: levels are minimum hop
    counts, the depth cap truncates, and unreached nodes are absent."""
    from portfolio1_etl_spark.operators.graph import bfs_levels

    # 1-2-3-4-5 path, 2-6 branch, 8-9 disconnected
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (8, 9)], "u long, v long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {
        (r.node, r.level)
        for r in bfs_levels(edges, src, max_depth=4).collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2), (6, 2), (4, 3), (5, 4)}

    # depth cap: with max_depth=2 the tail of the path is unreached
    capped = {
        (r.node, r.level)
        for r in bfs_levels(edges, src, max_depth=2).collect()
    }
    assert capped == {(1, 0), (2, 1), (3, 2), (6, 2)}


def test_bfs_fixed_depth_is_fixpoint_on_registry_graph(spark, sf_dir):
    """The q191 unrolled depth reaches the BFS fixpoint on the test
    data: one extra round discovers nothing new (the q163 contract)."""
    from portfolio1_etl_spark.plans.graph_ops import _BFS_DEPTH
    from portfolio1_etl_spark.plans import REGISTRY

    q = REGISTRY["q191_bfs_levels"]
    base = {(r.user_id, r.level) for r in q.fn(spark, sf_dir).collect()}

    from portfolio1_etl_spark.operators.graph import bfs_levels
    from portfolio1_etl_spark.plans.graph_ops import _copurchase_edges

    edges, src = _copurchase_edges(spark, sf_dir)
    deeper = {
        (r.node, r.level)
        for r in bfs_levels(edges, src, max_depth=_BFS_DEPTH + 1).collect()
    }
    assert deeper == base


def test_personalized_pagerank_concentrates_on_seeds(spark):
    from portfolio1_etl_spark.operators.graph import (
        pagerank,
        personalized_pagerank,
    )

    # a -> b -> c -> a ring plus an off-ring tail c -> d
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("c", "d", 1)],
        "src string, dst string, w int",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    ppr = {r.node: r.rank for r in personalized_pagerank(edges, seeds, iters=4).collect()}
    # the seed and its in-neighborhood outrank the far tail
    assert ppr["a"] > ppr["d"]
    assert ppr["b"] > ppr["d"]
    # teleport mass goes ONLY to the seed: unlike the global ranker,
    # a node with no inflow path from the seed set decays toward 0
    glob = {r.node: r.rank for r in pagerank(edges, iters=4).collect()}
    assert ppr["a"] > glob["a"]  # proximity view concentrates

    import pytest

    with pytest.raises(ValueError, match="seed"):
        personalized_pagerank(
            edges, spark.createDataFrame([("zz",)], "node string")
        )
