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


def test_span_removal_linear_under_ubiquitous_span(spark):
    """Cross-doc span removal's degenerate shape: ONE 4-word span
    present in every document. Unlike pair enumeration (O(n²) in
    sharers), span removal is linear in occurrences — the repeated
    set is keyed by hash, and each occurrence contributes exactly n
    covered positions. Assert the ubiquitous span is removed from ALL
    docs, the unique remainders survive verbatim, and the covered-row
    volume is occurrence-linear."""
    from portfolio1_etl_spark.operators.dedup import (
        remove_repeated_spans,
        repeated_spans,
        span_occurrences,
    )

    n_docs = 300
    docs = spark.createDataFrame(
        [(i, f"the same boiler plate u{i} v{i} w{i}") for i in range(n_docs)],
        "doc_id long, text string",
    )
    occ = span_occurrences(docs, n=4)
    # 7 words → 4 span starts per doc; occurrence-linear, no blowup
    assert occ.count() == n_docs * 4
    rep = repeated_spans(occ, min_docs=2)
    # only the shared span repeats ("the same boiler plate"); the
    # u/v/w tails are unique per doc
    assert rep.count() == 1
    out = {r.doc_id: r for r in remove_repeated_spans(docs, n=4, min_docs=2).collect()}
    assert len(out) == n_docs
    for i in range(n_docs):
        r = out[i]
        assert r.text_clean == f"u{i} v{i} w{i}", r.text_clean
        assert r.n_words == 7 and r.n_removed == 4


def test_span_removal_overlapping_spans_and_untouched_docs(spark):
    """Overlapping repeated spans union their covered positions (no
    double-removal), docs with no repeated span pass through verbatim
    with n_removed = 0, and a span repeated only WITHIN one doc does
    not trigger removal (distinct-doc counting)."""
    from portfolio1_etl_spark.operators.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [
            # docs 1+2 share a 5-word run -> two overlapping 4-spans
            (1, "a b c d e tail1 x1"),
            (2, "a b c d e tail2 x2"),
            (3, "totally unique words only here now"),
            # 4-span "p q r s" twice within ONE doc only
            (4, "p q r s p q r s"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_spans(docs, n=4, min_docs=2).collect()}
    assert out[1].text_clean == "tail1 x1" and out[1].n_removed == 5
    assert out[2].text_clean == "tail2 x2" and out[2].n_removed == 5
    assert out[3].text_clean == docs.collect()[2].text and out[3].n_removed == 0
    assert out[4].n_removed == 0  # within-doc repetition is q96's job


def test_mixture_sampler_skewed_domain_stays_bounded(spark):
    """The mixture sampler's 100 TB claim: when ONE domain is ~all of
    the corpus, the ordered-cumsum window must only ever see the
    single cut bucket, not the domain. Built like production (salted
    md5 keys), the cut bucket holds ~1/n_buckets of the giant domain;
    selection still equals the naive full-window specification."""
    from pyspark.sql import functions as F

    from portfolio1_etl_spark.operators.mixture import (
        budget_prefix_select,
        naive_budget_prefix,
    )

    n_giant, bucket_div = 5000, 2**44  # 48-bit keys -> 16 buckets
    rows = [("giant", i) for i in range(n_giant)] + [
        ("tiny", 100000 + i) for i in range(5)
    ]
    d = (
        spark.createDataFrame(rows, "source string, doc_id long")
        .withColumn(
            "k",
            F.expr(
                "cast(conv(substring(md5(concat('mix-', cast(doc_id as string))), 1, 12), 16, 10) as bigint)"
            ),
        )
        .withColumn("n_tokens", F.lit(7))
    )
    budgets = spark.createDataFrame(
        [("giant", 70), ("tiny", 1000)], "source string, budget long"
    )
    got = budget_prefix_select(d, budgets, bucket_div=bucket_div)
    want = naive_budget_prefix(d, budgets)
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )
    # the bucket histogram really is the prune: the cut bucket (the
    # only slice that pays the ordered window) holds a bounded sliver
    # of the giant domain, NOT the domain
    hist = (
        d.filter("source = 'giant'")
        .groupBy((F.col("k") - F.col("k") % bucket_div).alias("b"))
        .count()
        .collect()
    )
    per_bucket = {r.b: r["count"] for r in hist}
    cut = min(per_bucket)  # budget 70 < one bucket's token mass
    assert per_bucket[cut] < n_giant / 4


def test_exact_rank_constant_key_stays_parallel(spark):
    """The adversarial shape for any order-preserving partitioner: a
    100%-constant rank key (every row ties). A value-only bucket
    would send ALL rows to one cell/reducer; the percentile_approx
    tiebreak sub-bucket (the q221 frequency pattern) must spread the
    tie block across cells while the composed rank stays EXACTLY the
    tiebreak order."""
    from pyspark.sql import functions as F

    from portfolio1_etl_spark.operators.ranks import with_exact_rank

    n = 50_000
    df = spark.range(0, n).select(
        F.lit(7).alias("k"),  # fully constant rank key
        F.col("id").alias("tb"),
    )
    probes = [i / 16 for i in range(1, 16)]
    bounds = df.agg(
        F.percentile_approx("tb", F.array(*[F.lit(p) for p in probes]), 1000)
        .alias("_b")
    )
    df = df.join(F.broadcast(bounds))
    tb = F.col("tb")
    sub = F.size(F.filter(F.col("_b"), lambda b: b < tb))
    ranked = with_exact_rank(
        df,
        order_by=[F.col("k"), tb],
        bucket=F.struct(F.col("k"), sub.alias("s")),
    )
    # exactness: rank == tiebreak position
    bad = ranked.filter(F.col("_rank") != F.col("tb") + 1).count()
    assert bad == 0
    # parallelism: the tie block landed in ~16 cells, and the largest
    # cell holds a bounded fraction — no single-reducer tie block
    cells = (
        df.select(F.struct(F.col("k"), sub.alias("s")).alias("c"))
        .groupBy("c")
        .count()
        .collect()
    )
    assert len(cells) >= 8
    assert max(r["count"] for r in cells) < n * 0.3
