"""Scalar quantization + two-stage quantized ANN — invariants behind
q95."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.similarity import (
    brute_force_topk,
    quantized_topk,
    scalar_quantize,
    with_norms,
)


def _vecs(spark, sf_dir):
    return with_norms(catalog.load(spark, sf_dir, "embeddings")).select(
        "vec_id", "v", "nrm"
    )


def test_codes_in_range_and_monotone(spark):
    vecs = spark.createDataFrame(
        [(0, [0.0, -1.0]), (1, [5.0, 0.0]), (2, [10.0, 1.0])],
        "vec_id long, v array<double>",
    )
    got = {r["vec_id"]: r["qv"] for r in scalar_quantize(vecs).collect()}
    # min of a dim -> 0; max -> 255; midpoint -> 128
    assert got[0] == [0, 0]
    assert got[1] == [128, 128]
    assert got[2] == [255, 255]


def test_constant_dimension_quantizes_to_zero(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 3.0]), (1, [1.0, 4.0])], "vec_id long, v array<double>"
    )
    got = {r["vec_id"]: r["qv"] for r in scalar_quantize(vecs).collect()}
    assert got[0][0] == 0 and got[1][0] == 0


def test_quantized_recall_vs_exact(spark, sf_dir):
    """With a 32-wide shortlist over this corpus, the quantized path
    must recover most of the exact top-3 (recall floor pinned so a
    quantization regression is visible)."""
    vecs = _vecs(spark, sf_dir).localCheckpoint(eager=True)
    queries = vecs.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(vecs, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in quantized_topk(vecs, queries, k=3, shortlist=32).collect()
    }
    assert len(approx) == len(exact)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"recall {recall}"


def test_quantized_distance_is_integer(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    out = quantized_topk(vecs, vecs.filter(F.col("vec_id") < 2), k=2)
    row = out.first()
    assert isinstance(row["qd2"], int) and row["qd2"] >= 0


def test_scoreboard_recall_bars(spark, sf_dir):
    """The documented recall floors, pinned against the ON-SCOREBOARD
    q114 output (not a parallel reimplementation): SQ8 must be
    near-exact (integer-L2 shortlist of 32 over ~500 vectors), PQ
    solidly above half, IVF above a quarter at this scale (nprobe
    trades it), and single-bucket sign-LSH is documented-lossy — its
    floor is only that the row exists and reports. Values move ONLY
    with an algorithm change, since every input hash is deterministic."""
    from portfolio1_etl_spark.plans import REGISTRY

    rows = {r.method: r for r in REGISTRY["q114_ann_recall"].fn(spark, sf_dir).collect()}
    assert set(rows) == {
        "q82_lsh_ann", "q83_ivf_ann", "q95_quantized_ann", "q99_pq_ann",
        "q265_ivfpq_index_probe",
    }
    assert all(r.n_truth == 24 and r.k == 3 for r in rows.values())
    assert rows["q95_quantized_ann"].recall >= 0.95
    assert rows["q99_pq_ann"].recall >= 0.55
    assert rows["q83_ivf_ann"].recall >= 0.25
    # composed IVF-PQ: cell pruning costs what q83 loses, ADC is a
    # shortlist-32 pre-rank with exact re-rank on top -- floor between
    # the pure-IVF and pure-PQ bars
    assert rows["q265_ivfpq_index_probe"].recall >= 0.4
    assert rows["q82_lsh_ann"].recall >= 0.0  # lossy-by-design, reported
