"""[ext] Graph-analytics queries: weighted PageRank over an entity
graph derived from the relational tables, via the generic operator
library (``portfolio1_etl_spark.operators.graph``).

The graph: nation → nation trade edges (customer's nation →
supplier's nation, weighted by lineitem count) — the classic
"derive a graph from fact tables, then run link analysis" pipeline.

Determinism: per-iteration ranks round to 10 dp (fold order differs
across engines at ~1e-16); the damping base is written ``(1.0 - 0.85)``
in BOTH engines because the IEEE result of that subtraction is NOT the
literal 0.15 — spelling them differently would diverge in the last ulp
before the round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.checkpointing import materialize
from portfolio1_etl_spark.operators.graph import pagerank
from portfolio1_etl_spark.plans.registry import query

_ITERS = 3
_DAMP = 0.85

_EDGES_SQL = """
      SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS w
      FROM lineitem l
      JOIN orders o    ON l.l_orderkey = o.o_orderkey
      JOIN customer c  ON o.o_custkey = c.c_custkey
      JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s  ON l.l_suppkey = s.s_suppkey
      JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
      GROUP BY 1, 2
"""


def _pagerank_sql() -> str:
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "ow AS (SELECT src, sum(w) AS outw FROM edges GROUP BY src)",
        "ce AS (SELECT e.src, e.dst, e.w / o.outw AS share FROM edges e JOIN ow o ON e.src = o.src)",
        "r0 AS (SELECT node, round(1.0 / nn.n, 10) AS rank FROM nodes CROSS JOIN nn)",
    ]
    for t in range(1, _ITERS + 1):
        ctes.append(
            f"""r{t} AS (
      SELECT n.node,
             round((1.0 - {_DAMP}) / nn.n
                   + {_DAMP} * coalesce(c.inflow, 0.0), 10) AS rank
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT ce.dst, sum(r.rank * ce.share) AS inflow
        FROM ce JOIN r{t - 1} r ON ce.src = r.node
        GROUP BY ce.dst
      ) c ON n.node = c.dst
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT node AS nation, rank FROM r{_ITERS}
    """


@query(
    "q98_pagerank",
    sql=_pagerank_sql(),
    operators=("X-graph-pagerank", "J-star", "A1"),
)
def q98_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 synchronous rounds, damping 0.85) over the
    nation-level trade graph. The edge derivation is a star join over
    the fact tables (the expensive part at 100 TB — dims broadcast);
    each PageRank round is an equi-join of the rank vector onto the
    edge list plus one grouped sum, ranks checkpointed per round. The
    entity graph here is small, but the plan is the one that runs on a
    billion-node graph — per-round cost is two shuffles on uniform
    keys, and nothing ever collects to the driver."""
    ln = catalog.load(spark, sf_dir, "lineitem")
    o = catalog.load(spark, sf_dir, "orders")
    c = catalog.load(spark, sf_dir, "customer")
    s = catalog.load(spark, sf_dir, "supplier")
    n = catalog.load(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    edges = (
        ln.join(o, ln.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), ln.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(edges, iters=_ITERS, damping=_DAMP)
    return ranks.select(F.col("node").alias("nation"), "rank")


# --- q101: dangling-mass redistribution ------------------------------------
#
# The trade graph restricted to src < dst (lexicographic) is a DAG in
# which the lexicographically-last nations have NO out-edges — real
# dangling nodes. With redistribute_dangling=True their rank mass is
# summed each round (one 1-row aggregate) and returned uniformly, so
# sum(rank) conserves ≈ 1 (q98's leaky variant would bleed it).

_DAG_EDGES_SQL = f"""
      SELECT src, dst, w FROM ({_EDGES_SQL}) WHERE src < dst
"""


def _pagerank_dangling_sql() -> str:
    ctes = [
        f"edges AS ({_DAG_EDGES_SQL})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "ow AS (SELECT src, sum(w) AS outw FROM edges GROUP BY src)",
        "ce AS (SELECT e.src, e.dst, e.w / o.outw AS share FROM edges e JOIN ow o ON e.src = o.src)",
        "r0 AS (SELECT node, round(1.0 / nn.n, 10) AS rank FROM nodes CROSS JOIN nn)",
    ]
    for t in range(1, _ITERS + 1):
        ctes.append(
            f"""dm{t} AS (
      SELECT round(coalesce(sum(r.rank), 0.0), 10) AS dm
      FROM r{t - 1} r LEFT JOIN ow o ON r.node = o.src
      WHERE o.src IS NULL
    )"""
        )
        ctes.append(
            f"""r{t} AS (
      SELECT n.node,
             round((1.0 - {_DAMP}) / nn.n
                   + {_DAMP} * (coalesce(c.inflow, 0.0) + d.dm / nn.n),
                   10) AS rank
      FROM nodes n CROSS JOIN nn CROSS JOIN dm{t} d
      LEFT JOIN (
        SELECT ce.dst, sum(r.rank * ce.share) AS inflow
        FROM ce JOIN r{t - 1} r ON ce.src = r.node
        GROUP BY ce.dst
      ) c ON n.node = c.dst
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT node AS nation, rank FROM r{_ITERS}
    """


@query(
    "q101_pagerank_dangling",
    sql=_pagerank_dangling_sql(),
    operators=("X-graph-pagerank", "J-star", "A1"),
)
def q101_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with dangling-mass redistribution over the src<dst
    DAG restriction of the trade graph (guaranteed dangling nodes).
    Per round: the two standard shuffles PLUS one 1-row dangling-sum
    aggregate broadcast back onto the update — total mass conserves
    at ≈ 1 instead of leaking through sink nodes. Early exit fires
    only at the exact 10 dp fixpoint, so the fixed-3-round oracle
    replays identically."""
    ln = catalog.load(spark, sf_dir, "lineitem")
    o = catalog.load(spark, sf_dir, "orders")
    c = catalog.load(spark, sf_dir, "customer")
    s = catalog.load(spark, sf_dir, "supplier")
    n = catalog.load(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    edges = (
        ln.join(o, ln.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), ln.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(
        edges, iters=_ITERS, damping=_DAMP, redistribute_dangling=True
    )
    return ranks.select(F.col("node").alias("nation"), "rank")


# --- q150: triangle counting over the near-dup graph (r7) ------------------

# q77 must be registered before its SQL is spliced into the oracle
from portfolio1_etl_spark.plans import dedup_ops as _dedup_ops  # noqa: E402
from portfolio1_etl_spark.plans.registry import REGISTRY as _REGISTRY


@query(
    "q150_neardup_triangles",
    sql=f"""
    WITH pairs AS ({_REGISTRY["q77_jaccard_dfcap"].sql}),
    e AS (
      SELECT least(doc_a, doc_b) AS u, greatest(doc_a, doc_b) AS v
      FROM pairs
    ),
    tri AS (
      SELECT e1.u AS p, e1.v AS q, e2.v AS r
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT unnest([p, q, r]) AS node FROM tri)
    GROUP BY node
    """,
    operators=("X-graph-triangles", "X-dedup-near"),
)
def q150_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the REGISTERED near-duplicate pair graph
    (q77's exact Jaccard pairs) — the transitivity census of the dedup
    layer: a doc in many triangles sits in a dense mutual-similarity
    clique (template families), where a doc in pairwise-only edges is
    chain-similar (drifted revisions). Spark counts via DEGREE-ORIENTED
    wedges (``operators.graph.triangle_counts`` — O(√m) out-degree per
    node, hub-safe); the oracle enumerates id-ordered 3-way self-joins
    — two different algorithms whose agreement gates the orientation
    logic itself. Composes the registered q77 query (the q129/q139
    splice pattern), so the published counts are counts over the GATED
    pair pipeline."""
    from portfolio1_etl_spark.operators.graph import triangle_counts

    pairs = _REGISTRY["q77_jaccard_dfcap"].fn(spark, sf_dir)
    edges = pairs.select(
        F.least("doc_a", "doc_b").alias("u"),
        F.greatest("doc_a", "doc_b").alias("v"),
    ).distinct()
    return triangle_counts(edges).withColumnRenamed("node", "doc_id")


# --------------------------------------------------------------------------
# q163 — k-core of the user co-occurrence graph (fixed-round peel)
# --------------------------------------------------------------------------

_KCORE_ROUNDS = 4


@query(
    "q163_user_kcore",
    sql="""
    WITH ub AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
    ),
    hcnt AS (SELECT h, count(*) AS nu FROM ub GROUP BY h),
    small AS (
      SELECT ub.user_id, ub.h FROM ub JOIN hcnt USING (h) WHERE hcnt.nu <= 40
    ),
    pairs AS (
      SELECT a.user_id AS u, b.user_id AS v, count(*) AS common
      FROM small a JOIN small b ON a.h = b.h AND a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id
    ),
    e0 AS MATERIALIZED (SELECT u, v FROM pairs WHERE common >= 3),
    deg0 AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0
      ) GROUP BY node
    ),
    keep0 AS MATERIALIZED (SELECT node FROM deg0 WHERE d >= 2),
    e1 AS MATERIALIZED (
      SELECT e.u, e.v FROM e0 e
      JOIN keep0 k1 ON e.u = k1.node
      JOIN keep0 k2 ON e.v = k2.node
    ),
    deg1 AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e1 UNION ALL SELECT v AS node FROM e1
      ) GROUP BY node
    ),
    keep1 AS MATERIALIZED (SELECT node FROM deg1 WHERE d >= 2),
    e2 AS MATERIALIZED (
      SELECT e.u, e.v FROM e1 e
      JOIN keep1 k1 ON e.u = k1.node
      JOIN keep1 k2 ON e.v = k2.node
    ),
    deg2 AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e2 UNION ALL SELECT v AS node FROM e2
      ) GROUP BY node
    ),
    keep2 AS MATERIALIZED (SELECT node FROM deg2 WHERE d >= 2),
    e3 AS MATERIALIZED (
      SELECT e.u, e.v FROM e2 e
      JOIN keep2 k1 ON e.u = k1.node
      JOIN keep2 k2 ON e.v = k2.node
    ),
    deg3 AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM e3 UNION ALL SELECT v AS node FROM e3
      ) GROUP BY node
    ),
    keep3 AS MATERIALIZED (SELECT node FROM deg3 WHERE d >= 2),
    e4 AS MATERIALIZED (
      SELECT e.u, e.v FROM e3 e
      JOIN keep3 k1 ON e.u = k1.node
      JOIN keep3 k2 ON e.v = k2.node
    )
    SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
      SELECT u AS node FROM e4 UNION ALL SELECT v AS node FROM e4
    ) GROUP BY node HAVING count(*) >= 2
    """,
    operators=("X-graph-kcore", "X-cooccurrence", "J-semi"),
)
def q163_user_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the user co-occurrence graph — the community-screen
    graph op (nodes outside the 2-core are leaves/isolated chains;
    what survives is the densely-interacting population worth running
    the expensive graph algorithms on). Edges: users sharing >= 3
    distinct active hours, built ONLY from hours with <= 40 active
    users — the df-cap pattern (dedup_ops q77): hub hours would
    contribute O(n^2) pairs and say nothing about affinity.

    The peel runs a FIXED {_KCORE_ROUNDS} rounds in both engines —
    the deterministic contract for iterative ops (the q123/q126
    unrolled-CTE precedent); fixpoint equivalence on this data is
    asserted in tests/test_graph.py, and ``kcore_peel(rounds=None)``
    is the production fixpoint form. Scale: each round is one degree
    aggregation + two semi-joins of a shrinking edge list, lineage
    flattened per round."""
    from portfolio1_etl_spark.operators.graph import kcore_peel

    e = catalog.load(spark, sf_dir, "events")
    ub = e.select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).distinct()
    hcnt = ub.groupBy("h").agg(F.count(F.lit(1)).alias("nu"))
    small = ub.join(
        F.broadcast(hcnt.filter(F.col("nu") <= 40).select("h")), "h"
    )
    a = small.select(F.col("user_id").alias("u"), "h")
    b = small.select(F.col("user_id").alias("v"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    edges = pairs.filter(F.col("common") >= 3).select("u", "v")
    return kcore_peel(edges, k=2, rounds=_KCORE_ROUNDS)


def _copurchase_edges(spark: SparkSession, sf_dir: str):
    """The q191 graph definition, shared with tests/test_graph.py's
    fixpoint check so the two cannot drift: users purchasing in the
    same hour bucket, hub hours df-capped at 40 actives, undirected
    distinct (u < v) pairs. Returns (edges, src)."""
    e = catalog.load(spark, sf_dir, "events")
    ub = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .distinct()
    )
    hcnt = ub.groupBy("h").agg(F.count(F.lit(1)).alias("nu"))
    small = ub.join(
        F.broadcast(hcnt.filter(F.col("nu") <= 40).select("h")), "h"
    )
    a = small.select(F.col("user_id").alias("u"), "h")
    b = small.select(F.col("user_id").alias("v"), "h")
    edges = (
        a.join(b, "h").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    return edges, edges.agg(F.min("u").alias("node"))



#: q191 fixed BFS depth — the deterministic unrolled contract (the
#: q163 precedent); fixpoint equivalence is pinned in tests/test_graph.py.
_BFS_DEPTH = 4


@query(
    "q191_bfs_levels",
    sql=f"""
    WITH RECURSIVE ub AS MATERIALIZED (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
      FROM events WHERE event_type = 'purchase'
    ),
    hcnt AS MATERIALIZED (
      SELECT h FROM (SELECT h, count(*) AS nu FROM ub GROUP BY h)
      WHERE nu <= 40
    ),
    small AS MATERIALIZED (
      SELECT ub.user_id, ub.h FROM ub JOIN hcnt USING (h)
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM small a JOIN small b ON a.h = b.h AND a.user_id < b.user_id
    ),
    sym AS MATERIALIZED (
      SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ),
    src AS MATERIALIZED (SELECT min(u) AS node FROM e),
    bfs AS (
      SELECT node, 0 AS lvl FROM src
      UNION
      SELECT sym.v AS node, bfs.lvl + 1 AS lvl
      FROM bfs JOIN sym ON sym.u = bfs.node
      WHERE bfs.lvl < {_BFS_DEPTH}
    )
    SELECT node AS user_id, CAST(min(lvl) AS BIGINT) AS level
    FROM bfs GROUP BY node
    """,
    operators=("X-graph-bfs", "X-cooccurrence", "J-anti"),
)
def q191_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop levels over the co-purchase graph (users purchasing in
    the same hour bucket, hub hours df-capped at 40 actives — the q77/
    q163 pattern) from the lowest-id connected user. The Spark side is
    the frontier-expansion loop (operators/graph.bfs_levels): per
    round one join keyed on node ids, one distinct, one anti-join —
    never materializing paths; the oracle is the textbook recursive
    CTE whose UNION dedup keeps (node, level) pairs bounded. Fixed
    depth {_BFS_DEPTH} is the deterministic unrolled contract
    (fixpoint equivalence pinned in tests/test_graph.py); min-level
    semantics agree because BFS reaches every node first at its
    minimum hop count."""
    from portfolio1_etl_spark.operators.graph import bfs_levels

    edges, src = _copurchase_edges(spark, sf_dir)
    levels = bfs_levels(edges, src, max_depth=_BFS_DEPTH)
    return levels.select(F.col("node").alias("user_id"), "level")


# --- q211: personalized PageRank (r9) ---------------------------------------

_PPR_SEEDS = ("NATION_1", "NATION_12", "NATION_3")


def _ppr_sql() -> str:
    seeds = ", ".join(f"('{s}')" for s in _PPR_SEEDS)
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"sl(node) AS (VALUES {seeds})",
        "flagged AS (SELECT n.node, sl.node IS NOT NULL AS is_seed "
        "FROM nodes n LEFT JOIN sl ON n.node = sl.node)",
        "ns AS (SELECT count(*) AS k FROM flagged WHERE is_seed)",
        "ow AS (SELECT src, sum(w) AS outw FROM edges GROUP BY src)",
        "ce AS (SELECT e.src, e.dst, e.w / o.outw AS share "
        "FROM edges e JOIN ow o ON e.src = o.src)",
        "r0 AS (SELECT node, is_seed, round(CASE WHEN is_seed "
        "THEN 1.0 / ns.k ELSE 0.0 END, 10) AS rank "
        "FROM flagged CROSS JOIN ns)",
    ]
    for t in range(1, _ITERS + 1):
        ctes.append(
            f"""r{t} AS (
      SELECT f.node, f.is_seed,
             round(CASE WHEN f.is_seed
                        THEN (1.0 - {_DAMP}) / ns.k ELSE 0.0 END
                   + {_DAMP} * coalesce(c.inflow, 0.0), 10) AS rank
      FROM flagged f CROSS JOIN ns
      LEFT JOIN (
        SELECT ce.dst, sum(r.rank * ce.share) AS inflow
        FROM ce JOIN r{t - 1} r ON ce.src = r.node
        GROUP BY ce.dst
      ) c ON f.node = c.dst
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT node AS nation, rank FROM r{_ITERS}
    """


@query(
    "q211_personalized_pagerank",
    sql=_ppr_sql(),
    operators=("X-graph-ppr", "X-graph-pagerank", "J-star", "A1"),
)
def q211_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a 3-nation seed set over the trade
    graph — rank as proximity TO THE SEEDS (related-entities /
    recommendation primitive), vs q98's global importance. Teleport
    mass goes only to seeds; same per-round plan as q98 (one
    rank⋈edges join + grouped sum, 10 dp re-materialized rounds), the
    seed flag joined once, never per round."""
    from portfolio1_etl_spark.operators.graph import personalized_pagerank

    ln = catalog.load(spark, sf_dir, "lineitem")
    o = catalog.load(spark, sf_dir, "orders")
    c = catalog.load(spark, sf_dir, "customer")
    s = catalog.load(spark, sf_dir, "supplier")
    n = catalog.load(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    edges = (
        ln.join(o, ln.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), ln.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    seeds = edges.sparkSession.createDataFrame(
        [(s,) for s in _PPR_SEEDS], "node string"
    )
    ranks = personalized_pagerank(edges, seeds, iters=_ITERS, damping=_DAMP)
    return ranks.select(F.col("node").alias("nation"), "rank")


# ---------------------------------------------------------------------------
# q243 — transitive closure by path doubling (recursive-CTE analogue, r10)
# ---------------------------------------------------------------------------


@query(
    "q243_transitive_closure",
    sql="""
    WITH RECURSIVE e AS (
      SELECT p_partkey AS child, p_partkey // 10 AS parent
      FROM part WHERE p_partkey >= 10),
    anc AS (
      SELECT child, parent AS anc, 1 AS dist FROM e
      UNION ALL
      SELECT a.child, e.parent, a.dist + 1
      FROM anc a JOIN e ON a.anc = e.child)
    SELECT CAST(dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(anc) AS BIGINT) AS sum_anc,
           CAST(sum(child) AS BIGINT) AS sum_child
    FROM anc GROUP BY 1
    """,
    operators=("X-transitive-closure", "X-recursive-cte", "J1", "A1"),
)
def q243_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ancestor closure of a part hierarchy (child → parent =
    partkey // 10, a 10-ary forest — the BOM-explosion shape) — the
    WITH RECURSIVE analogue, since Spark has no recursive CTE. The
    plan is PATH DOUBLING, not level-at-a-time chaining: round k
    composes the closure-so-far with itself (anc ∘ anc on the
    midpoint key), so paths up to 2^k resolve in k joins — 5 rounds
    cover depth 32, enough for 10-ary keys up to 10^32 (a 100 TB part
    dimension is depth ~11; a frontier BFS would need 11 sequential
    shuffles where this needs 5). A forest has exactly one path per
    (child, ancestor) pair, but doubling re-derives each long path
    from several split points, so every round dedups on the full
    (child, anc, dist) triple. The oracle IS DuckDB's recursive CTE —
    the closure, per-distance pair counts, and key checksums must all
    agree."""
    p = catalog.load(spark, sf_dir, "part")
    e = (
        p.filter(F.col("p_partkey") >= 10)
        .select(
            F.col("p_partkey").alias("child"),
            F.floor(F.col("p_partkey") / 10).cast("long").alias("anc"),
            F.lit(1).cast("long").alias("dist"),
        )
    )
    closure = e
    for _ in range(5):
        a = closure.select(
            F.col("child"), F.col("anc").alias("mid"), F.col("dist").alias("d1")
        )
        b = closure.select(
            F.col("child").alias("mid"), F.col("anc"), F.col("dist").alias("d2")
        )
        longer = a.join(b, "mid").select(
            "child", "anc", (F.col("d1") + F.col("d2")).alias("dist")
        )
        # materialize per round (the pagerank discipline): without it
        # the plan tree doubles every round — ReuseExchange saves the
        # execution today, but a lost executor at round 5 would replay
        # the whole unrolled lineage, and compile time grows with depth
        closure = materialize(closure.unionByName(longer).distinct())
    return closure.groupBy(F.col("dist").cast("long").alias("dist")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("anc").cast("long").alias("sum_anc"),
        F.sum("child").cast("long").alias("sum_child"),
    )
