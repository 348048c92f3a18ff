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
