"""Lloyd's k-means operator — invariants behind q93."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.clustering import (
    assign_cells,
    lloyd_kmeans,
    update_centroids,
)
from portfolio1_etl_spark.operators.similarity import with_norms


def _vecs(spark, sf_dir):
    return with_norms(catalog.load(spark, sf_dir, "embeddings")).select(
        "vec_id", "v"
    )


def test_every_vector_assigned_once(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    assigned, cent = lloyd_kmeans(vecs, k=4, iters=2)
    n = vecs.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert cent.count() <= 4


def test_lloyd_objective_non_increasing(spark, sf_dir):
    """Each assign+update round must not increase total within-cluster
    squared distance (Lloyd's monotonicity, modulo the 4/6 dp
    rounding — tolerance covers it)."""
    vecs = _vecs(spark, sf_dir).localCheckpoint(eager=True)
    cent = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cvec")
    )
    objectives = []
    assigned = assign_cells(vecs, cent)
    for _ in range(3):
        objectives.append(assigned.agg(F.sum("d2")).first()[0])
        cent = update_centroids(assigned).localCheckpoint(eager=True)
        assigned = assign_cells(vecs, cent)
    objectives.append(assigned.agg(F.sum("d2")).first()[0])
    for before, after in zip(objectives, objectives[1:]):
        assert after <= before * 1.0001, objectives


def test_assignment_picks_nearest(spark):
    vecs = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.5, 0.0]), (3, [9.0, 10.0])],
        "vec_id long, v array<double>",
    )
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "c_id long, cvec array<double>"
    )
    got = {r["vec_id"]: r["cell"] for r in assign_cells(vecs, cent).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def test_update_is_cellwise_mean(spark):
    assigned = spark.createDataFrame(
        [(0, [0.0, 2.0], 7, 0.0), (1, [2.0, 4.0], 7, 0.0), (2, [5.0, 5.0], 9, 0.0)],
        "vec_id long, v array<double>, cell long, d2 double",
    )
    got = {r["c_id"]: r["cvec"] for r in update_centroids(assigned).collect()}
    assert got == {7: [1.0, 3.0], 9: [5.0, 5.0]}


def test_empty_codebook_assigns_nothing(spark):
    # contract parity with the pre-fold crossJoin implementation:
    # an empty codebook yields zero assignment rows, not null cells
    vecs = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [2.0, 3.0])], "vec_id long, v array<double>"
    )
    cent = spark.createDataFrame([], "c_id long, cvec array<double>")
    out = assign_cells(vecs, cent)
    assert out.columns == ["vec_id", "v", "cell", "d2"]
    assert out.count() == 0


def test_sampled_training_still_assigns_everyone(spark, sf_dir):
    from portfolio1_etl_spark.operators.clustering import sample_for_training

    vecs = _vecs(spark, sf_dir).localCheckpoint(eager=True)
    n = vecs.count()
    n_train = sample_for_training(vecs, 0.3).count()
    assert 0 < n_train < n  # the sample is real and proper
    assigned, cent = lloyd_kmeans(vecs, k=4, iters=3, train_fraction=0.3)
    # codebook trained on the sample, but EVERY vector gets a cell
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert 1 <= cent.count() <= 4


def test_sampled_objective_close_to_full(spark, sf_dir):
    # a codebook trained on 30% of the corpus must land within 2x of
    # the full-training within-cluster objective (same seeds recipe,
    # deterministic hash sample — no flakiness)
    vecs = _vecs(spark, sf_dir).localCheckpoint(eager=True)
    full_assigned, _ = lloyd_kmeans(vecs, k=4, iters=3)
    samp_assigned, _ = lloyd_kmeans(vecs, k=4, iters=3, train_fraction=0.3)
    full_obj = full_assigned.agg(F.sum("d2")).first()[0]
    samp_obj = samp_assigned.agg(F.sum("d2")).first()[0]
    assert samp_obj <= full_obj * 2.0, (full_obj, samp_obj)


def test_seeds_work_with_non_dense_ids(spark):
    # ids far from zero: 'vec_id < k' seeding would produce an empty
    # codebook; the computed k-smallest seeding must not
    vecs = spark.createDataFrame(
        [(1000 + i, [float(i), float(i % 3)]) for i in range(12)],
        "vec_id long, v array<double>",
    )
    assigned, cent = lloyd_kmeans(vecs, k=3, iters=2)
    assert cent.count() >= 1
    assert assigned.count() == 12
    seeds = {r["c_id"] for r in cent.collect()}
    assert seeds <= {1000, 1001, 1002}
