"""Prefix-filtered similarity join (AllPairs/PPJoin) — completeness
and pruning invariants behind q105.

The prefix-filtering lemma says two sets at Jaccard ≥ t must share a
token inside their (df-ordered) prefixes of length n − ceil(t·n) + 1.
These tests pin (a) equality with the complete inverted-index join on
synthetic and randomized inputs — the lemma as an executable fact,
(b) the exact-integer prefix arithmetic on boundary thresholds where
float ceil silently shortens the prefix, and (c) that the prefix
index is actually smaller — the point of the optimization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.dedup import (
    jaccard_pairs,
    prefix_jaccard_pairs,
)


def _sh(spark, sets: dict[int, list[int]]):
    rows = [(d, h) for d, hs in sets.items() for h in hs]
    return spark.createDataFrame(rows, "doc_id long, h long").localCheckpoint(
        eager=True
    )


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in df.collect()
    }


def test_prefix_equals_full_join_exact_boundary(spark):
    # A∩B = {1,2}, |A|=3, |B|=4 → J = 2/5 = t exactly: the boundary
    # pair MUST survive (float-ceil prefix arithmetic drops it when
    # t·n lands on an integer)
    sh = _sh(
        spark,
        {
            1: [1, 2, 3],
            2: [1, 2, 9, 10],
            3: [20, 21, 22],          # disjoint background
            4: [1, 30, 31, 32, 33],   # shares one common token only
        },
    )
    got = _pairs(prefix_jaccard_pairs(sh, 2, 5))
    want = _pairs(jaccard_pairs(sh, 0.4))
    assert got == want
    assert (1, 2, 0.4) in got


def test_prefix_equals_full_join_randomized(spark):
    # deterministic pseudo-random universe: 40 docs, 8-20 tokens from
    # a 60-token vocabulary (dense overlap → many near-boundary pairs)
    sets = {
        d: sorted(
            {((d + 1) * (i + 3) * 7919) % 60 for i in range((d * 13) % 13 + 8)}
        )
        for d in range(40)
    }
    sh = _sh(spark, sets)
    for t_num, t_den in ((2, 5), (1, 2), (3, 4)):
        got = _pairs(prefix_jaccard_pairs(sh, t_num, t_den))
        want = _pairs(jaccard_pairs(sh, t_num / t_den))
        assert got == want, f"threshold {t_num}/{t_den}"


def test_prefix_index_is_smaller(spark):
    # at t = 3/4 the prefix keeps n − ceil(0.75n) + 1 ≈ n/4 tokens:
    # the candidate index must shrink accordingly
    sets = {d: [d * 31 % 97 + i for i in range(16)] for d in range(30)}
    sh = _sh(spark, sets)
    n_full = sh.count()
    df_tab = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window as W

    ranked = (
        sh.join(df_tab, "h")
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("doc_id").orderBy("df", "h"))
        )
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
    )
    n_prefix = ranked.filter(
        F.col("rn") <= F.col("n") - F.expr("(3 * n + 3) div 4") + 1
    ).count()
    assert n_prefix <= n_full // 3


def test_positional_filter_prunes_neardup_family(spark):
    # the r12 sf1 blow-up shape: a family of K copies of one base set,
    # each copy holding its own df=1 perturbed tokens (sorting FIRST in
    # the df-ordered prefix) plus a shared half below threshold. Every
    # cross-copy pair collides in the prefixes, but the first common
    # token appears only after each copy's unique run — the PPJoin
    # positional bound 1 + min(na-ra, nb-rb) lands below
    # t/(1+t)·(na+nb), so NO cross-copy pair may reach verification.
    from portfolio1_etl_spark.operators.dedup import prefix_candidates

    base = list(range(1000, 1016))          # 16 shared tokens (df=K)
    sets = {
        k: sorted(base[:8] + [2000 + 100 * k + i for i in range(8)])
        for k in range(6)
    }  # J(copy_i, copy_j) = 8/24 = 1/3 < 2/5
    sh = _sh(spark, sets)
    cand = prefix_candidates(sh, 2, 5)
    assert cand.count() == 0
    # and the un-pruned collision join would have produced candidates:
    # every pair shares 8 prefix-eligible tokens
    assert _pairs(prefix_jaccard_pairs(sh, 2, 5)) == _pairs(
        jaccard_pairs(sh, 0.4)
    )


def test_positional_filter_keeps_boundary_pair(spark):
    # a pair EXACTLY at threshold whose first common token is the last
    # possible prefix slot — the positional bound equals the required
    # overlap, so pruning it would be a false negative. |A|=|B|=5,
    # A∩B = {50,51,52} → J = 3/7 ≥ 2/5; unique tokens are rarer (df=1)
    # so the common run starts at rank 3 of 5.
    sets = {
        1: [10, 11, 50, 51, 52],
        2: [20, 21, 50, 51, 52],
    }
    sh = _sh(spark, sets)
    got = _pairs(prefix_jaccard_pairs(sh, 2, 5))
    assert got == _pairs(jaccard_pairs(sh, 0.4))
    assert len(got) == 1


def test_candidate_plan_stays_hash_aggregated_and_never_broadcasts(spark):
    """Physical-plan guard for the r13 sf10 findings: the pair fold
    must stay a fixed-width HashAggregate (a min-over-struct regression
    replans it as ObjectHashAggregate with a sort-based fallback — a
    spilled struct sort at the decade where partial maps stop
    fitting), and the collision self-join must never broadcast the
    corpus-linear prefix index (ShuffledHashJoin via hint; a broadcast
    is a driver OOM waiting at the decade it stops fitting)."""
    from portfolio1_etl_spark.operators.dedup import prefix_candidates

    sh = _sh(
        spark,
        {d: list(range(d % 7, d % 7 + 10)) for d in range(1, 40)},
    )
    plan = (
        prefix_candidates(sh, 2, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ObjectHashAggregate" not in plan, (
        "pair fold left fixed-width hash aggregation — the r13 sf10 "
        "spill regression (decompose non-primitive aggregates)"
    )
    assert "SortAggregate" not in plan
    assert "BroadcastHashJoin" not in plan, (
        "collision self-join broadcasts the corpus-linear prefix index"
    )
    assert "ShuffledHashJoin" in plan
