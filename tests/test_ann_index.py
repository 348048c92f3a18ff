"""Persisted IVF index (operators/ann_index.py): build/query over
partitioned parquet, DPP-pruned probes, exactness at full probe
width, and a recall floor at narrow probes."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.ann_index import (
    build_ivf_index,
    query_ivf_index,
)
from portfolio1_etl_spark.operators.similarity import (
    brute_force_topk,
    with_norms,
)

K_CELLS = 8


def _vecs(spark, sf_dir):
    return with_norms(catalog.load(spark, sf_dir, "embeddings"))


def _topk_sets(rows):
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_full_probe_equals_brute_force(spark, sf_dir, tmp_path):
    """Probing every cell must reproduce the exact top-k — the index
    layout loses nothing, only the probe width trades recall."""
    vecs = _vecs(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(vecs, path, k=K_CELLS)
    queries = vecs.filter(F.col("vec_id") < 8)
    got = _topk_sets(
        query_ivf_index(spark, path, queries, n_probe=K_CELLS, k=3).collect()
    )
    want = _topk_sets(
        brute_force_topk(vecs, queries, k=3)
        .withColumnRenamed("query_id", "query_id")
        .collect()
    )
    assert got == want


def test_narrow_probe_recall_floor(spark, sf_dir, tmp_path):
    vecs = _vecs(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(vecs, path, k=K_CELLS)
    queries = vecs.filter(F.col("vec_id") < 8)
    got = _topk_sets(
        query_ivf_index(spark, path, queries, n_probe=3, k=3).collect()
    )
    want = _topk_sets(brute_force_topk(vecs, queries, k=3).collect())
    hits = sum(len(got.get(q, set()) & s) for q, s in want.items())
    truth = sum(len(s) for s in want.values())
    assert hits / truth >= 0.25  # the documented IVF bar (cf. q114)


def test_probe_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The probe join must reach the index scan as DYNAMIC PARTITION
    PRUNING: unprobed cell directories are never read — the property
    that makes the parquet layout an index at 100 TB."""
    import os

    vecs = _vecs(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(vecs, path, k=K_CELLS)
    # on-disk layout: one directory per cell partition
    parts = [d for d in os.listdir(f"{path}/vectors") if d.startswith("cell=")]
    assert len(parts) == K_CELLS
    queries = vecs.filter(F.col("vec_id") < 8)
    df = query_ivf_index(spark, path, queries, n_probe=2, k=3)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan


def test_incremental_ingest_matches_one_shot_build(spark, sf_dir, tmp_path):
    """Index built on half the vectors + ingest of the other half must
    answer full-probe queries identically to querying an index whose
    vector set was written in one shot against the SAME codebook —
    appended cells are real index members, not second-class."""
    from portfolio1_etl_spark.operators.ann_index import ingest_vectors

    vecs = _vecs(spark, sf_dir)
    first = vecs.filter(F.col("vec_id") % 2 == 0)
    rest = vecs.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf_inc")
    build_ivf_index(first, path, k=K_CELLS)
    ingest_vectors(spark, path, rest)
    queries = vecs.filter(F.col("vec_id") < 8)
    got = _topk_sets(
        query_ivf_index(spark, path, queries, n_probe=K_CELLS, k=3).collect()
    )
    # full-probe over the merged index == exact brute force over ALL
    # vectors (codebook quality affects narrow probes, never full)
    want = _topk_sets(brute_force_topk(vecs, queries, k=3).collect())
    assert got == want


def test_streaming_ingest_equals_batch_index(spark, sf_dir, tmp_path):
    """Stream half the vectors into an index built on the other half
    (3 micro-batches); full-probe queries over the streamed index must
    equal exact brute force over ALL vectors — identical to the batch
    ingest guarantee."""
    from portfolio1_etl_spark.streaming.jobs import ann_index_ingest_stream

    vecs = _vecs(spark, sf_dir)
    first = vecs.filter(F.col("vec_id") % 2 == 0)
    rest_raw = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") % 2 == 1)
    )
    path = str(tmp_path / "ivf_stream")
    build_ivf_index(first, path, k=K_CELLS)

    land = tmp_path / "vec_landing"
    land.mkdir()
    for i in range(3):
        rest_raw.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(
            str(land / f"part{i}")
        )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "part*"))
    )
    q = ann_index_ingest_stream(stream, path).start()
    q.processAllAvailable()
    q.stop()

    queries = vecs.filter(F.col("vec_id") < 8)
    got = _topk_sets(
        query_ivf_index(spark, path, queries, n_probe=K_CELLS, k=3).collect()
    )
    want = _topk_sets(brute_force_topk(vecs, queries, k=3).collect())
    assert got == want


def _mk_vec_df(spark, arr, id0):
    rows = [(id0 + i, [float(x) for x in v]) for i, v in enumerate(arr)]
    return with_norms(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    )


def _recall(spark, path, queries, want, n_probe):
    got = _topk_sets(
        query_ivf_index(spark, path, queries, n_probe=n_probe, k=3).collect()
    )
    return sum(len(got.get(q, set()) & s) for q, s in want.items()) / sum(
        len(s) for s in want.values()
    )


def _drifted_index(spark, tmp_path, k=4, d=8):
    """Build on a uniform base, then ingest a tight drifted cluster
    centered on the midpoint of the two closest trained centroids —
    its members split across the cell boundary, so narrow probes from
    inside the cluster miss the half of their true neighbors that
    landed on the other side. The canonical recall-erosion shape:
    arrivals the frozen codebook never represented."""
    import itertools

    import numpy as np

    rng = np.random.RandomState(0)
    base_df = _mk_vec_df(spark, rng.uniform(0, 1, size=(160, d)), 0)
    path = str(tmp_path / "ivf_drift")
    build_ivf_index(base_df, path, k=k)
    cent = {
        r.c_id: np.array(r.cvec)
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    a, b = min(
        itertools.combinations(sorted(cent), 2),
        key=lambda p: np.linalg.norm(cent[p[0]] - cent[p[1]]),
    )
    mid = (cent[a] + cent[b]) / 2
    new_df = _mk_vec_df(spark, mid + rng.normal(0, 0.02, size=(60, d)), 1000)
    from portfolio1_etl_spark.operators.ann_index import ingest_vectors

    ingest_vectors(spark, path, new_df)
    queries = new_df.filter(F.col("vec_id") % 5 == 0)
    want = _topk_sets(
        brute_force_topk(base_df.unionByName(new_df), queries, k=3).collect()
    )
    return path, queries, want


def test_rebalance_restores_eroded_recall(spark, tmp_path):
    """Skewed ingest erodes narrow-probe recall; rebalance re-trains
    the codebook on the CURRENT population (the dense drifted cluster
    earns its own cell) and restores it — while full-probe exactness
    holds before AND after (the layout never loses vectors)."""
    from portfolio1_etl_spark.operators.ann_index import rebalance_index

    path, queries, want = _drifted_index(spark, tmp_path)
    assert _recall(spark, path, queries, want, n_probe=1) <= 0.85  # eroded
    assert (
        _topk_sets(query_ivf_index(spark, path, queries, n_probe=4, k=3).collect())
        == want
    )
    assert rebalance_index(spark, path, k=4) is True
    assert _recall(spark, path, queries, want, n_probe=1) >= 0.95  # restored
    assert (
        _topk_sets(query_ivf_index(spark, path, queries, n_probe=4, k=3).collect())
        == want
    )


def test_rebalance_skew_threshold_noop(spark, tmp_path):
    """With a skew threshold above the current skew the call is a
    cheap no-op: nothing rewritten, the index untouched."""
    import os

    from portfolio1_etl_spark.operators.ann_index import (
        cell_stats,
        rebalance_index,
    )

    path, queries, want = _drifted_index(spark, tmp_path)
    _, skew = cell_stats(spark, path)
    before = sorted(os.listdir(f"{path}/vectors"))
    assert rebalance_index(spark, path, k=4, skew_threshold=skew + 1) is False
    assert sorted(os.listdir(f"{path}/vectors")) == before
    # and the threshold BELOW current skew does rewrite
    assert rebalance_index(spark, path, k=4, skew_threshold=skew / 2) is True


def test_rebalance_repairs_crashed_swap(spark, tmp_path):
    """A crash mid-swap (live dir moved to backup, staged rename not
    yet landed) must be repaired on the next call: the old index is
    restored first, then the rebalance runs to completion."""
    import os

    from portfolio1_etl_spark.operators.ann_index import rebalance_index

    path, queries, want = _drifted_index(spark, tmp_path)
    # simulate the worst crash point: vectors moved to backup, no live
    os.rename(f"{path}/vectors", f"{path}/vectors._prebalance")
    assert rebalance_index(spark, path, k=4) is True
    assert not os.path.exists(f"{path}/vectors._prebalance")
    assert _recall(spark, path, queries, want, n_probe=1) >= 0.95


# --- generational (pointer-committed) layout (r8) ---------------------------


def test_generational_build_query_and_rebalance(spark, sf_dir, tmp_path):
    """Generational layout: build commits via the one-file _current
    pointer, queries resolve through it identically to the flat
    layout, rebalance builds gen=1 and flips the pointer (old
    generation gone afterwards), and results stay exact under full
    probing throughout."""
    import os

    vecs = _vecs(spark, sf_dir)
    flat = str(tmp_path / "flat")
    gen = str(tmp_path / "gen")
    build_ivf_index(vecs, flat, k=K_CELLS)
    build_ivf_index(vecs, gen, k=K_CELLS, generational=True)
    assert open(f"{gen}/_current").read().strip() == "0"
    queries = vecs.filter(F.col("vec_id") < 8)
    got_flat = _topk_sets(
        query_ivf_index(spark, flat, queries, n_probe=K_CELLS, k=3).collect()
    )
    got_gen = _topk_sets(
        query_ivf_index(spark, gen, queries, n_probe=K_CELLS, k=3).collect()
    )
    assert got_gen == got_flat

    from portfolio1_etl_spark.operators.ann_index import rebalance_index

    assert rebalance_index(spark, gen, k=K_CELLS) is True
    assert open(f"{gen}/_current").read().strip() == "1"
    assert not os.path.exists(f"{gen}/gen=0")
    got2 = _topk_sets(
        query_ivf_index(spark, gen, queries, n_probe=K_CELLS, k=3).collect()
    )
    assert got2 == got_flat


def test_generational_crash_before_flip_is_invisible(spark, sf_dir, tmp_path):
    """Crash injection: a fully-written gen=1 whose pointer never
    flipped (writer died at the commit point) must be invisible —
    readers stay on gen=0 — and the next rebalance sweeps the orphan
    and commits its own gen=1."""
    import os

    vecs = _vecs(spark, sf_dir)
    path = str(tmp_path / "crashgen")
    build_ivf_index(vecs, path, k=K_CELLS, generational=True)
    queries = vecs.filter(F.col("vec_id") < 8)
    want = _topk_sets(
        query_ivf_index(spark, path, queries, n_probe=K_CELLS, k=3).collect()
    )
    # simulated crashed rebalance: orphan gen=1 with garbage content
    os.makedirs(f"{path}/gen=1")
    spark.createDataFrame([(0, [0.0], 0.0)], "vec_id long, v array<double>, nrm double") \
        .write.parquet(f"{path}/gen=1/centroids")
    got = _topk_sets(
        query_ivf_index(spark, path, queries, n_probe=K_CELLS, k=3).collect()
    )
    assert got == want  # orphan invisible

    from portfolio1_etl_spark.operators.ann_index import rebalance_index

    assert rebalance_index(spark, path, k=K_CELLS) is True
    assert open(f"{path}/_current").read().strip() == "1"
    got2 = _topk_sets(
        query_ivf_index(spark, path, queries, n_probe=K_CELLS, k=3).collect()
    )
    assert got2 == want


def test_generational_probe_still_partition_pruned(spark, sf_dir, tmp_path):
    """The DPP probe-pruning property must survive the generational
    indirection — the scan under gen=N still prunes unprobed cells."""
    vecs = _vecs(spark, sf_dir)
    path = str(tmp_path / "genprune")
    build_ivf_index(vecs, path, k=K_CELLS, generational=True)
    queries = vecs.filter(F.col("vec_id") < 2)
    plan = query_ivf_index(
        spark, path, queries, n_probe=1, k=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_flat_rebalance_repairs_centroids_missing_window(spark, tmp_path):
    """Review regression (r8): a flat swap that crashed AFTER moving
    live centroids to backup but BEFORE staging in the new ones leaves
    NO live centroids directory — rebalance must restore from backup
    and proceed, not misread the index as generational and raise."""
    import shutil

    from portfolio1_etl_spark.operators.ann_index import rebalance_index

    path, queries, want = _drifted_index(spark, tmp_path)
    # simulate the crash window: centroids moved to backup, staged gone
    shutil.move(f"{path}/centroids", f"{path}/centroids._prebalance")
    assert rebalance_index(spark, path, k=4) is True
    got = _recall(spark, path, queries, want, n_probe=1)
    assert got >= 0.95


def test_generational_crash_after_flip_sweeps_stale_gen(spark, sf_dir, tmp_path):
    """Review regression (r8): a crash between the pointer flip and
    the old-generation delete must not leak gen=N forever — the next
    rebalance sweeps every generation the pointer does not reference."""
    import os

    vecs = _vecs(spark, sf_dir)
    path = str(tmp_path / "leakgen")
    build_ivf_index(vecs, path, k=K_CELLS, generational=True)
    # simulate crash-after-flip leftovers: a stale gen=7 copy
    os.makedirs(f"{path}/gen=7")
    spark.createDataFrame([(1,)], "x int").write.parquet(
        f"{path}/gen=7/centroids"
    )
    from portfolio1_etl_spark.operators.ann_index import rebalance_index

    assert rebalance_index(spark, path, k=K_CELLS) is True
    listed = {d for d in os.listdir(path) if d.startswith("gen=")}
    assert listed == {"gen=1"}  # stale gen=7 and old gen=0 both gone


def test_generational_build_rejects_existing_index(spark, sf_dir, tmp_path):
    """Review regression (r8): generational builds over an existing
    index (flat or generational) are rejected loudly instead of
    silently writing an invisible or pointer-referenced generation."""
    import pytest

    vecs = _vecs(spark, sf_dir)
    flat = str(tmp_path / "flatexists")
    build_ivf_index(vecs, flat, k=K_CELLS)
    with pytest.raises(ValueError, match="flat-layout"):
        build_ivf_index(vecs, flat, k=K_CELLS, generational=True)
    gen = str(tmp_path / "genexists")
    build_ivf_index(vecs, gen, k=K_CELLS, generational=True)
    with pytest.raises(ValueError, match="rebalance_index"):
        build_ivf_index(vecs, gen, k=K_CELLS, generational=True)


def test_streaming_ivfpq_ingest_equals_batch_index(spark, sf_dir, tmp_path):
    """r12: the ingest stream serves the COMPOSED IVF-PQ layout.
    Build IVF-PQ on the even half, stream the odd half in 3
    micro-batches (layout auto-detected from the persisted
    pq_codebook), and the streamed index must be ROW-IDENTICAL — both
    the byte-code table and the full-vector table — to one where the
    same rows arrived through one batch ingest_vectors_ivfpq call;
    probes over the streamed index keep the q265 recall floor against
    exact truth, and a re-delivered epoch must not double-append."""
    from portfolio1_etl_spark.operators.ann_index import (
        build_ivfpq_index,
        ingest_vectors_ivfpq,
        query_ivfpq_index,
    )
    from portfolio1_etl_spark.streaming.jobs import ann_index_ingest_stream

    vecs = _vecs(spark, sf_dir)
    first = vecs.filter(F.col("vec_id") % 2 == 0)
    rest = vecs.filter(F.col("vec_id") % 2 == 1)
    rest_raw = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") % 2 == 1)
    )
    p_stream = str(tmp_path / "ivfpq_stream")
    p_batch = str(tmp_path / "ivfpq_batch")
    for p in (p_stream, p_batch):
        build_ivfpq_index(first, p, k_cells=K_CELLS)
    ingest_vectors_ivfpq(spark, p_batch, rest)

    land = tmp_path / "vec_landing_pq"
    land.mkdir()
    for i in range(3):
        rest_raw.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(
            str(land / f"part{i}")
        )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "part*"))
    )
    writer = ann_index_ingest_stream(stream, p_stream)
    q = writer.start()
    q.processAllAvailable()
    q.stop()

    # stream == batch: both index tables row-identical
    for table in ("codes", "vectors"):
        got = sorted(
            map(
                tuple,
                spark.read.parquet(f"{p_stream}/{table}")
                .select("vec_id", "cell")
                .collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                spark.read.parquet(f"{p_batch}/{table}")
                .select("vec_id", "cell")
                .collect(),
            )
        )
        assert got == want, f"streamed {table} diverged from batch ingest"

    # a re-delivered epoch must not double-append (epoch memory)
    n_before = spark.read.parquet(f"{p_stream}/codes").count()
    writer.epoch_fold(rest_raw.limit(1), 0)
    assert spark.read.parquet(f"{p_stream}/codes").count() == n_before

    # the streamed index keeps the q265-board recall floor vs exact
    queries = vecs.filter(F.col("vec_id") < 8)
    got_k = _topk_sets(
        query_ivfpq_index(
            spark, p_stream, queries, n_probe=3, shortlist=32, k=3
        ).collect()
    )
    want_k = _topk_sets(brute_force_topk(vecs, queries, k=3).collect())
    hits = sum(len(got_k.get(qid, set()) & s) for qid, s in want_k.items())
    assert hits / sum(len(s) for s in want_k.values()) >= 0.4
