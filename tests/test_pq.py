"""Product quantization — invariants behind q99."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.pq import (
    pq_topk,
    split_subspaces,
    train_codebook,
)
from portfolio1_etl_spark.operators.similarity import brute_force_topk, with_norms


def _vecs(spark, sf_dir):
    return with_norms(catalog.load(spark, sf_dir, "embeddings")).select(
        "vec_id", "v", "nrm"
    )


def test_split_covers_vector_exactly(spark, sf_dir):
    vecs = _vecs(spark, sf_dir).limit(5)
    sub = split_subspaces(vecs, 8, 8)
    rows = sub.collect()
    assert len(rows) == 5 * 8
    assert all(len(r["sv"]) == 8 for r in rows)
    # reassembling subspaces in order gives back the original vector
    re = (
        sub.groupBy("vec_id")
        .agg(F.expr("flatten(transform(array_sort(collect_list(struct(sub, sv))), s -> s.sv))").alias("v2"))
    )
    back = {r["vec_id"]: r["v2"] for r in re.collect()}
    orig = {r["vec_id"]: r["v"] for r in vecs.collect()}
    assert back == orig


def test_codebook_shape(spark, sf_dir):
    sub = split_subspaces(_vecs(spark, sf_dir), 8, 8)
    cent = train_codebook(sub, k=16)
    rows = cent.collect()
    # ≤ 16 centroids per subspace, every subspace present
    assert {r["sub"] for r in rows} == set(range(8))
    per_sub = {}
    for r in rows:
        per_sub[r["sub"]] = per_sub.get(r["sub"], 0) + 1
        assert len(r["cvec"]) == 8
    assert all(1 <= n <= 16 for n in per_sub.values())


def test_pq_recall_vs_exact(spark, sf_dir):
    vecs = _vecs(spark, sf_dir).localCheckpoint(eager=True)
    queries = vecs.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(vecs, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(vecs, queries, k=3, shortlist=32).collect()
    }
    assert len(approx) == len(exact)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"


def test_pq_recall_with_sampled_training(spark, sf_dir):
    # the codebook trained on a 30% deterministic hash sample must
    # still clear the same recall bar as full training — the 100 TB
    # configuration (sample-train, full-encode)
    vecs = _vecs(spark, sf_dir).localCheckpoint(eager=True)
    queries = vecs.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(vecs, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(
            vecs, queries, k=3, shortlist=32, train_fraction=0.3
        ).collect()
    }
    assert len(approx) == len(exact)  # every query still yields full top-k
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"


def test_sampled_codebook_encodes_all_vectors(spark, sf_dir):
    from portfolio1_etl_spark.operators.pq import _assign

    vecs = _vecs(spark, sf_dir).localCheckpoint(eager=True)
    sub = split_subspaces(vecs, 8, 8).localCheckpoint(eager=True)
    cent = train_codebook(sub, k=16, train_fraction=0.3)
    # sampling by id keeps subvectors aligned: every subspace trains
    assert {r["sub"] for r in cent.select("sub").distinct().collect()} == set(range(8))
    codes = _assign(sub, cent, "vec_id")
    # encoding covers the FULL corpus, not just the training sample
    assert codes.count() == vecs.count() * 8
