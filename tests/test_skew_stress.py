"""Adversarial-skew stress tests for the dedup scale guards.

The 100 TB claim for the near-dup family rests on two caps:
``df_cap`` (drop shingles shared by too many documents before the
inverted-index self-join) and ``bucket_cap`` (drop LSH band-buckets
holding too many documents before the band self-join). These fixtures
build the exact degenerate shapes the caps exist for — one shingle in
~all documents, one LSH bucket holding half the corpus — and assert
the candidate-pair output stays combinatorially bounded while true
duplicates still surface. Without the caps both shapes enumerate
O(n²) pairs; the bounds asserted here are what make the guards an
invariant rather than a hope.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.dedup import (
    hot_shingles,
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures,
    shingle_hashes,
)

N_SKEW = 200  # documents sharing the ubiquitous head shingle
DF_CAP = 4
BUCKET_CAP = 10


def _skewed_docs(spark):
    """Every doc opens with the same 3 tokens (one Zipf-head shingle in
    all N_SKEW docs) and continues uniquely; docs 500-502 are exact
    triplicates of each other — the only true near-dup group."""
    rows = [
        (i, f"aa bb cc u{i} v{i} w{i}") for i in range(N_SKEW)
    ] + [(500 + j, "aa bb cc same tail here") for j in range(3)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_df_cap_bounds_candidate_pairs_under_skew(spark):
    sh = shingle_hashes(_skewed_docs(spark), "text").localCheckpoint(eager=True)
    # the head shingle is hot (df = N_SKEW + 3 > cap) and broadcast-tiny
    hot = hot_shingles(sh, DF_CAP).collect()
    assert len(hot) == 1 and hot[0]["df"] == N_SKEW + 3
    pairs = jaccard_pairs(sh, df_cap=DF_CAP).collect()
    # bound: every surviving shingle has df ≤ cap, so each contributes
    # at most C(cap, 2) pairs; here only the triplet's tail shingles
    # survive with df > 1 → exactly C(3, 2) pairs, corpus size be damned
    n_kept_multi = (
        sh.join(F.broadcast(hot_shingles(sh, DF_CAP).select("h")), "h", "left_anti")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 1)
        .count()
    )
    assert len(pairs) <= n_kept_multi * (DF_CAP * (DF_CAP - 1) // 2)
    assert {(p["doc_a"], p["doc_b"]) for p in pairs} == {
        (500, 501), (500, 502), (501, 502)
    }
    # capped sets: the triplets' informative shingles are identical
    assert all(p["jaccard"] == 1.0 for p in pairs)


def test_uncapped_skew_would_explode(spark):
    # the counterfactual the cap prevents: ~C(N, 2) candidate pairs
    sh = shingle_hashes(_skewed_docs(spark), "text").localCheckpoint(eager=True)
    n_uncapped = jaccard_pairs(sh).count()
    assert n_uncapped >= (N_SKEW * (N_SKEW - 1)) // 2
    assert jaccard_pairs(sh, df_cap=DF_CAP).count() == 3


def _lsh_skewed_docs(spark):
    """100 identical docs (one degenerate LSH bucket per band holding
    half the corpus) + 5 identical docs (a legitimate small cluster) +
    100 unique docs."""
    rows = (
        [(i, "boiler plate text repeated every where") for i in range(100)]
        + [(200 + j, "five way duplicate cluster content") for j in range(5)]
        + [(400 + i, f"unique document number x{i} y{i} z{i}") for i in range(100)]
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_cap_bounds_lsh_candidates_under_skew(spark):
    sh = shingle_hashes(_lsh_skewed_docs(spark), "text").localCheckpoint(eager=True)
    sigs = minhash_signatures(sh).localCheckpoint(eager=True)
    cand = lsh_candidates(sigs, bucket_cap=BUCKET_CAP)
    got = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    # the 100-doc degenerate buckets (> cap in every band) are dropped:
    # none of doc_id < 100 may pair; the 5-doc cluster pairs fully
    assert got == {
        (200 + a, 200 + b) for a in range(5) for b in range(5) if a < b
    }
    # global bound: each surviving (band, sig) bucket of size m ≤ cap
    # emits ≤ C(cap, 2) pairs
    assert len(got) <= 4 * (BUCKET_CAP * (BUCKET_CAP - 1) // 2)


def test_lsh_without_cap_would_explode(spark):
    sh = shingle_hashes(_lsh_skewed_docs(spark), "text").localCheckpoint(eager=True)
    sigs = minhash_signatures(sh).localCheckpoint(eager=True)
    n_uncapped = lsh_candidates(sigs).count()
    assert n_uncapped >= (100 * 99) // 2  # the degenerate bucket alone
    assert lsh_candidates(sigs, bucket_cap=BUCKET_CAP).count() == 10
