"""Streaming semantics tests: each streaming job must converge to the
same result as its oracle-checked batch twin on the same input
(SURVEY.md §2.11). Memory sink + processAllAvailable drives the whole
file stream synchronously."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.plans.registry import REGISTRY
from portfolio1_etl_spark.streaming import (
    dedup_events_stream,
    inventory_merge_stream,
    read_events_stream,
    sessionized_stream,
    windowed_counts_stream,
)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File-stream sources need a landing-zone *directory*."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "part-000.parquet")
    return str(d)


def _run_to_memory(stream_df, name, mode="complete"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stream_starts_on_empty_landing_zone(spark, tmp_path):
    """A production stream job starts against an empty landing zone —
    the ts-encoding probe can't batch-read an empty dir, so it must
    fall back to a default encoding instead of refusing to start."""
    land = tmp_path / "landing"
    land.mkdir()
    events = read_events_stream(spark, str(land))
    assert events.isStreaming and "ts" in events.columns
    q = (
        windowed_counts_stream(events)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("empty_land_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT * FROM empty_land_out").count() == 0


def test_windowed_counts_matches_batch(spark, sf_dir, events_dir):
    events = read_events_stream(spark, events_dir)
    _run_to_memory(windowed_counts_stream(events), "win_out")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in REGISTRY["q50_tumbling_window"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_sessionized_matches_batch(spark, sf_dir, events_dir):
    events = read_events_stream(spark, events_dir)
    _run_to_memory(sessionized_stream(events), "sess_out")
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in REGISTRY["q52_session_window"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_dedup_drops_nothing_on_unique_ids(spark, sf_dir, events_dir):
    events = read_events_stream(spark, events_dir)
    _run_to_memory(dedup_events_stream(events), "dedup_out", mode="append")
    n_stream = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0].n
    n_batch = catalog.load(spark, sf_dir, "events").count()
    assert n_stream == n_batch  # event_ids are unique → dedup is a no-op


def test_inventory_merge_foreachbatch(spark, events_dir):
    events = read_events_stream(spark, events_dir)
    deltas = []

    def apply_batch(sold_df, epoch_id):
        deltas.append({r.sku: r.sold_qty for r in sold_df.collect()})

    q = inventory_merge_stream(events, apply_batch).start()
    q.processAllAvailable()
    q.stop()

    # merged deltas == batch aggregate (the J2 decrement input)
    merged: dict[str, float] = {}
    for d in deltas:
        for k, v in d.items():
            merged[k] = merged.get(k, 0.0) + v
    batch = {
        r.sku: r.sold_qty
        for r in catalog.load(spark, "/root/testdata/sf0.001", "events")
        .groupBy(F.col("event_type").alias("sku"))
        .agg(F.sum("value").alias("sold_qty"))
        .collect()
    }
    assert set(merged) == set(batch)
    for k in merged:
        assert abs(merged[k] - batch[k]) < 1e-6


def test_custom_stateful_running_totals(spark, sf_dir, events_dir):
    """applyInPandasWithState accumulator converges to the batch
    per-user totals (last emitted row per user == full aggregate)."""
    import math

    from portfolio1_etl_spark.streaming import running_user_totals_stream

    events = read_events_stream(spark, events_dir)
    _run_to_memory(running_user_totals_stream(events), "state_out", mode="append")
    # one file -> one batch -> one row per user; with more batches the
    # LAST row per user is the running total, so take max(n_events).
    got = {
        r.user_id: (r.total, r.n_events)
        for r in spark.sql(
            """SELECT user_id, total, n_events FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                                              ORDER BY n_events DESC) AS rn
                 FROM state_out) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.total, r.n_events)
        for r in catalog.load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert set(got) == set(want)
    for u in got:
        assert got[u][1] == want[u][1]
        assert math.isclose(got[u][0], want[u][0], rel_tol=1e-9)


def test_sliding_window_matches_batch(spark, sf_dir, events_dir):
    """Streaming sliding window (1h size / 30min slide) converges to
    the oracle-checked batch twin q51."""
    from pyspark.sql import functions as SF

    events = read_events_stream(spark, events_dir)
    sliding = (
        events.withWatermark("ts", "2 hours")
        .groupBy(SF.window("ts", "1 hour", "30 minutes").getField("start").alias("window_start"))
        .agg(
            SF.count(SF.lit(1)).alias("n_events"),
            SF.sum(SF.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    _run_to_memory(sliding, "slide_out")
    got = {
        r.window_start: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM slide_out").collect()
    }
    want = {
        r.window_start: (r.n_events, r.total_value)
        for r in REGISTRY["q51_sliding_window"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_stream_join_matches_range_join(spark, sf_dir, events_dir):
    """Watermarked stream-stream self-join converges to the batch
    range join q38 (same predicate, same pairs)."""
    from portfolio1_etl_spark.streaming import paired_events_stream

    events = read_events_stream(spark, events_dir)
    _run_to_memory(paired_events_stream(events), "ss_out", mode="append")
    got = {
        (r.event_a, r.event_b)
        for r in spark.sql("SELECT event_a, event_b FROM ss_out").collect()
    }
    want = {
        (r.event_a, r.event_b)
        for r in REGISTRY["q38_range_join"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_scd2_maintenance_stream_converges(spark, tmp_path):
    """Multi-batch streaming SCD2 == batch rebuild over all events.
    Events split into 3 time-ordered files; maxFilesPerTrigger=1
    makes each file its own micro-batch through scd2_apply."""
    from portfolio1_etl_spark.operators.scd import scd2_rebuild
    from portfolio1_etl_spark.streaming import (
        read_events_stream, scd2_maintenance_stream,
    )

    land = tmp_path / "scd2_events"
    land.mkdir()
    # slice the RAW file so the landing zone carries exactly the
    # schema read_events_stream expects; the cut points adapt to the
    # writer's ts encoding (nanos-as-long vs native micros NTZ)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    import datetime as _dt

    is_nanos = dict(raw.dtypes).get("ts") == "bigint"

    def _cut(day):
        if is_nanos:
            return F.lit(int(_dt.datetime(2024, 1, day).timestamp()) * 10**9)
        return F.to_timestamp_ntz(F.lit(f"2024-01-{day:02d}"))

    slices = [
        raw.filter(F.col("ts") < _cut(10)),
        raw.filter((F.col("ts") >= _cut(10)) & (F.col("ts") < _cut(20))),
        raw.filter(F.col("ts") >= _cut(20)),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(str(land / f"slice{i}"))
        import glob as _g, shutil as _sh
        part = _g.glob(str(land / f"slice{i}" / "part-*.parquet"))[0]
        _sh.move(part, str(land / f"file-{i}.parquet"))
        _sh.rmtree(str(land / f"slice{i}"))

    state: dict = {}
    q = scd2_maintenance_stream(
        read_events_stream(spark, str(land)), state
    ).start()
    q.processAllAvailable()
    q.stop()

    def canon(df):
        return sorted(
            (r.user_id, r.state,
             str(r.valid_from), str(r.valid_to), r.is_current, r.version)
            for r in df.collect()
        )

    # batch twin over the SAME landing files through the SAME ts
    # conversion as the stream
    batch_input = spark.read.parquet(str(land))
    if is_nanos:
        batch_input = batch_input.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    else:
        batch_input = batch_input.withColumn("ts", F.col("ts").cast("timestamp"))
    got = canon(state["current"])
    want = canon(scd2_rebuild(batch_input))
    assert len(got) > 0 and got == want


def test_cms_maintenance_stream_equals_batch_sketch(spark, tmp_path):
    """Streaming CMS fold == one-shot batch sketch over the full
    stream — the merge-linearity property, end to end. Events split
    into 3 files; maxFilesPerTrigger=1 in read_events_stream makes
    each its own micro-batch."""
    from portfolio1_etl_spark.operators.sketches import cms_build
    from portfolio1_etl_spark.streaming import (
        cms_maintenance_stream,
        read_events_stream,
    )

    land = tmp_path / "cms_events"
    land.mkdir()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n = raw.count()
    slices = [
        raw.filter(F.col("event_id") % 3 == i).coalesce(1) for i in range(3)
    ]
    for i, s in enumerate(slices):
        s.write.parquet(str(land / f"slice{i}"))
        import glob as _g
        import shutil as _sh

        part = _g.glob(str(land / f"slice{i}" / "part-*.parquet"))[0]
        _sh.move(part, str(land / f"file-{i}.parquet"))
        _sh.rmtree(str(land / f"slice{i}"))

    state: dict = {}
    q = cms_maintenance_stream(read_events_stream(spark, str(land)), state).start()
    q.processAllAvailable()
    q.stop()

    got = {(r.j, r.bucket): r.cnt for r in state["sketch"].collect()}
    want = {
        (r.j, r.bucket): r.cnt
        for r in cms_build(raw.select("event_type"), "event_type").collect()
    }
    assert got == want
    assert sum(v for (j, _), v in got.items() if j == 0) == n


def test_bloom_maintenance_stream_equals_batch_build(spark, tmp_path):
    """Streaming Bloom fold == one-shot batch build over the full
    stream (bitmap OR-linearity, end to end), and the maintained
    filter admits every seen user with no false negatives."""
    from portfolio1_etl_spark.operators.sketches import bloom_build, bloom_probe
    from portfolio1_etl_spark.streaming import (
        bloom_maintenance_stream,
        read_events_stream,
    )

    land = tmp_path / "bloom_events"
    land.mkdir()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    slices = [
        raw.filter(F.col("event_id") % 3 == i).coalesce(1) for i in range(3)
    ]
    for i, s in enumerate(slices):
        s.write.parquet(str(land / f"slice{i}"))
        import glob as _g
        import shutil as _sh

        part = _g.glob(str(land / f"slice{i}" / "part-*.parquet"))[0]
        _sh.move(part, str(land / f"file-{i}.parquet"))
        _sh.rmtree(str(land / f"slice{i}"))

    state: dict = {}
    q = bloom_maintenance_stream(
        read_events_stream(spark, str(land)), state
    ).start()
    q.processAllAvailable()
    q.stop()

    [stream_bm] = state["bloom"].collect()
    [batch_bm] = bloom_build(raw.select("user_id"), "user_id").collect()
    assert stream_bm["bm"] == batch_bm["bm"]  # bit-for-bit
    seen = raw.select("user_id").distinct()
    admitted = bloom_probe(seen, "user_id", state["bloom"]).count()
    assert admitted == seen.count()  # no false negatives, ever


def test_corpus_prep_stream_converges_to_batch(spark, sf_dir, tmp_path):
    """Incremental corpus-prep == one-shot batch: stream the documents
    table through corpus_prep_stream in 4 id-ordered micro-batches,
    finalize, and the decision log must equal prepare_corpus's —
    every doc_id, every drop_reason, df_cap semantics included."""
    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.corpus_pipeline import prepare_corpus
    from portfolio1_etl_spark.streaming.jobs import (
        corpus_prep_finalize,
        corpus_prep_stream,
    )

    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 4], ids[len(ids) // 2], ids[3 * len(ids) // 4]]
    land = tmp_path / "docs_landing"
    land.mkdir()
    # id-ordered landing files (the documented ingestion assumption)
    slices = [
        docs.filter(F.col("doc_id") < cuts[0]),
        docs.filter((F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])),
        docs.filter((F.col("doc_id") >= cuts[1]) & (F.col("doc_id") < cuts[2])),
        docs.filter(F.col("doc_id") >= cuts[2]),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(str(land / f"part{i}"))
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "part*"))
    )
    state: dict = {}
    q = corpus_prep_stream(stream, state).start()
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.doc_id, r.drop_reason)
        for r in corpus_prep_finalize(state).collect()
    )
    want = sorted(
        (r.doc_id, r.drop_reason)
        for r in prepare_corpus(
            spark, sf_dir, docs=docs, count_rows=False
        ).decisions.collect()
    )
    assert len(got) == len(ids)
    assert got == want


def test_pack_ingest_stream_converges_to_batch(spark, sf_dir, tmp_path):
    """Streaming pack layout == batch layout in the same (id) order:
    stream the documents through pack_ingest_stream in 4 id-ordered
    micro-batches; every doc's (shard, start_tok) must equal the
    one-shot per-shard window computed over the full table."""
    from pyspark.sql import Window as W

    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.streaming.jobs import pack_ingest_stream

    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 4], ids[len(ids) // 2], ids[3 * len(ids) // 4]]
    land = tmp_path / "pack_landing"
    land.mkdir()
    slices = [
        docs.filter(F.col("doc_id") < cuts[0]),
        docs.filter((F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])),
        docs.filter((F.col("doc_id") >= cuts[1]) & (F.col("doc_id") < cuts[2])),
        docs.filter(F.col("doc_id") >= cuts[2]),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(str(land / f"part{i}"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "part*"))
    )
    state: dict = {}
    q = pack_ingest_stream(stream, state).start()
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r.doc_id, r.shard, r.n_tokens, r.start_tok)
        for r in state["layout"].collect()
    )

    key = (
        "cast(conv(substring(md5(concat('pack-', cast(doc_id as string))), "
        "1, 12), 16, 10) as bigint)"
    )
    win = (
        W.partitionBy("shard").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    )
    want = sorted(
        (r.doc_id, r.shard, r.n_tokens, r.start_tok)
        for r in docs.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            (F.expr(key) % 8).alias("shard"),
        )
        .withColumn(
            "start_tok",
            F.coalesce(F.sum("n_tokens").over(win), F.lit(0)).cast("long"),
        )
        .collect()
    )
    assert len(got) == len(ids)
    assert got == want


def test_governance_stream_converges_to_batch(spark, sf_dir, tmp_path):
    """Incremental governance == q120: stream the documents through
    governance_stream in 4 micro-batches, finalize, and the decision
    log (every column, including pack offsets) must equal the batch
    composite's."""
    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.plans import REGISTRY
    from portfolio1_etl_spark.streaming.jobs import (
        governance_finalize,
        governance_stream,
    )

    docs = catalog.load(spark, sf_dir, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 4], ids[len(ids) // 2], ids[3 * len(ids) // 4]]
    land = tmp_path / "gov_landing"
    land.mkdir()
    slices = [
        docs.filter(F.col("doc_id") < cuts[0]),
        docs.filter((F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])),
        docs.filter((F.col("doc_id") >= cuts[1]) & (F.col("doc_id") < cuts[2])),
        docs.filter(F.col("doc_id") >= cuts[2]),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(str(land / f"part{i}"))
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "part*"))
    )
    state: dict = {}
    q = governance_stream(stream, state).start()
    q.processAllAvailable()
    q.stop()

    got = sorted(tuple(r) for r in governance_finalize(state).collect())
    want = sorted(
        tuple(r)
        for r in REGISTRY["q120_curation_pipeline"].fn(spark, sf_dir).collect()
    )
    assert len(got) == len(ids)
    assert got == want


def test_governance_stream_is_order_independent(spark, sf_dir, tmp_path):
    """Unlike the packers (which document id-ordered ingestion), the
    governance fold has NO ordering assumption: the per-row stage is
    order-free and every global stage runs at finalize — so streaming
    the batches in a scrambled order must converge to the same
    decision log."""
    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.plans import REGISTRY
    from portfolio1_etl_spark.streaming.jobs import (
        governance_finalize,
        governance_stream,
    )

    docs = catalog.load(spark, sf_dir, "documents")
    land = tmp_path / "gov_scrambled"
    land.mkdir()
    # interleaved, non-contiguous slices, landed in reverse order
    slices = [
        docs.filter(F.col("doc_id") % 3 == 2),
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 == 1),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(str(land / f"part{i}"))
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "part*"))
    )
    state: dict = {}
    q = governance_stream(stream, state).start()
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in governance_finalize(state).collect())
    want = sorted(
        tuple(r)
        for r in REGISTRY["q120_curation_pipeline"].fn(spark, sf_dir).collect()
    )
    assert got == want


def test_wordcount_stream_bpe_retrain_equals_batch(spark, sf_dir, tmp_path):
    """Tokenizer retraining from streamed wordcounts == q123 on the
    same corpus: the fold is additive, so arrival slicing is
    irrelevant to the learned merges."""
    from portfolio1_etl_spark.plans import REGISTRY
    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.streaming.jobs import (
        bpe_retrain_finalize,
        wordcount_stream,
    )

    docs = catalog.load(spark, sf_dir, "documents").select("doc_id", "text")
    land = tmp_path / "wc_landing"
    land.mkdir()
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            str(land / f"part{i}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "part*"))
    )
    state: dict = {}
    q = wordcount_stream(stream, state).start()
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in bpe_retrain_finalize(state, 8).collect())
    want = sorted(
        tuple(r) for r in REGISTRY["q123_bpe_train"].fn(spark, sf_dir).collect()
    )
    assert got == want


def test_foreachbatch_retry_does_not_double_count(spark, sf_dir):
    """foreachBatch delivery is at-least-once: re-delivering the SAME
    epoch (sink hiccup → Spark retries it) must not double-fold into
    the maintained state. Exercised directly through the exposed fold
    on the additive jobs (wordcount + pack-ingest)."""
    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.streaming.jobs import (
        pack_ingest_stream,
        wordcount_stream,
    )

    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    state: dict = {}
    fold = wordcount_stream(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(str(sf_dir)), state  # writer only built for its fold
    ).epoch_fold
    fold(b0, 0)
    once = sorted((r.word, r.freq) for r in state["wordcount"].collect())
    fold(b0, 0)  # at-least-once retry of the SAME epoch
    assert (
        sorted((r.word, r.freq) for r in state["wordcount"].collect()) == once
    )
    fold(b1, 1)  # the NEXT epoch still folds
    assert state["wordcount"].count() >= len(once)

    pstate: dict = {}
    pfold = pack_ingest_stream(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(str(sf_dir)), pstate
    ).epoch_fold
    pfold(b0, 0)
    layout_once = sorted(
        (r.doc_id, r.shard, r.start_tok) for r in pstate["layout"].collect()
    )
    pfold(b0, 0)  # retry: offsets must not shift, rows must not dup
    assert (
        sorted((r.doc_id, r.shard, r.start_tok) for r in pstate["layout"].collect())
        == layout_once
    )


def _landing_slices(docs, land, n=4):
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [ids[i * len(ids) // n] for i in range(1, n)]
    bounds = [None] + cuts + [None]
    out = []
    for i in range(n):
        s = docs
        if bounds[i] is not None:
            s = s.filter(F.col("doc_id") >= bounds[i])
        if bounds[i + 1] is not None:
            s = s.filter(F.col("doc_id") < bounds[i + 1])
        out.append(s)
    land.mkdir()
    return out


def test_corpus_prep_stream_kill_and_resume(spark, sf_dir, tmp_path):
    """Crash-recovery, not just convergence: process half the landing
    zone, STOP the query (simulated failure/shutdown), then restart a
    new query from the SAME checkpoint location — the source offsets
    in the checkpoint keep already-folded files from re-delivering, so
    the final decision log still equals the one-shot batch pipeline.
    (Models query restart with surviving fold state — the deployment
    contract where foldstate itself lives in the warehouse; full
    driver-death recovery additionally re-reads that table.)"""
    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.corpus_pipeline import prepare_corpus
    from portfolio1_etl_spark.streaming.jobs import (
        corpus_prep_finalize,
        corpus_prep_stream,
    )

    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    land = tmp_path / "docs_landing"
    slices = _landing_slices(docs, land)
    ckpt = str(tmp_path / "ckpt")
    # phase 1: only the first two id-ordered files exist
    for i in (0, 1):
        slices[i].coalesce(1).write.parquet(str(land / f"part{i}"))

    def _stream():
        return (
            spark.readStream.schema("doc_id long, text string, lang string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(land / "part*"))
        )

    state: dict = {}
    q = corpus_prep_stream(_stream(), state).option(
        "checkpointLocation", ckpt
    ).start()
    q.processAllAvailable()
    q.stop()  # simulated crash/shutdown mid-corpus
    folded_after_phase1 = state.get("_last_epoch")
    assert folded_after_phase1 is not None

    # phase 2: the rest lands; RESTART from the same checkpoint
    for i in (2, 3):
        slices[i].coalesce(1).write.parquet(str(land / f"part{i}"))
    q2 = corpus_prep_stream(_stream(), state).option(
        "checkpointLocation", ckpt
    ).start()
    q2.processAllAvailable()
    q2.stop()
    # the restart continued, it did not replay phase-1 epochs
    assert state["_last_epoch"] > folded_after_phase1

    got = sorted(
        (r.doc_id, r.drop_reason)
        for r in corpus_prep_finalize(state).collect()
    )
    want = sorted(
        (r.doc_id, r.drop_reason)
        for r in prepare_corpus(spark, sf_dir).decisions.collect()
    )
    assert got == want


def test_pack_ingest_stream_kill_and_resume(spark, sf_dir, tmp_path):
    """Same kill-and-resume contract for the shard-layout ingester:
    restart from checkpoint must neither re-append phase-1 docs nor
    shift any running shard offset."""
    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.streaming.jobs import pack_ingest_stream

    docs = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    land = tmp_path / "docs_landing"
    slices = _landing_slices(docs, land)
    ckpt = str(tmp_path / "ckpt")
    for i in (0, 1):
        slices[i].coalesce(1).write.parquet(str(land / f"part{i}"))

    def _stream():
        return (
            spark.readStream.schema("doc_id long, text string, lang string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(land / "part*"))
        )

    state: dict = {}
    q = pack_ingest_stream(_stream(), state).option(
        "checkpointLocation", ckpt
    ).start()
    q.processAllAvailable()
    q.stop()
    phase1 = {r.doc_id: (r.shard, r.start_tok) for r in state["layout"].collect()}

    for i in (2, 3):
        slices[i].coalesce(1).write.parquet(str(land / f"part{i}"))
    q2 = pack_ingest_stream(_stream(), state).option(
        "checkpointLocation", ckpt
    ).start()
    q2.processAllAvailable()
    q2.stop()

    rows = state["layout"].collect()
    assert len(rows) == len({r.doc_id for r in rows}) == docs.count()
    for r in rows:  # phase-1 assignments unchanged by the restart
        if r.doc_id in phase1:
            assert (r.shard, r.start_tok) == phase1[r.doc_id]


def test_media_census_stream_matches_batch_and_epoch_retry(spark, sf_dir, tmp_path):
    """Incremental multimodal census == one-shot batch: stream a
    mixed-codec media landing zone (JPEG incl. progressive, GIF, BMP,
    mu-law WAV, corrupt) in 3 micro-batches; the maintained census
    must equal decode_media_features over the same rows, and a
    re-delivered epoch must fold exactly once."""
    import numpy as np

    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.operators.multimodal import decode_media_features
    from portfolio1_etl_spark.plans.multimodal_ops import _synthesize_lossy_media
    from portfolio1_etl_spark.streaming.jobs import (
        media_census_finalize,
        media_census_stream,
    )

    docs = catalog.load(spark, sf_dir, "documents").limit(90)
    media = _synthesize_lossy_media(docs)
    land = tmp_path / "media_landing"
    land.mkdir()
    rows = media.collect()
    for i in range(3):
        part = rows[i * 30 : (i + 1) * 30]
        spark.createDataFrame(
            part, "path string, modality string, content binary"
        ).coalesce(1).write.parquet(str(land / f"part{i}"))
    stream = (
        spark.readStream.schema("path string, modality string, content binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "part*"))
    )
    state: dict = {}
    q = media_census_stream(stream, state).start()
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.path, r.n_units, r.dims, r.mean_val)
        for r in media_census_finalize(state).collect()
    )
    want = sorted(
        (r.path, r.n_units, r.dims, r.mean_val)
        for r in decode_media_features(media).collect()
    )
    assert got == want and len(got) == 90

    # at-least-once: re-delivering the LAST epoch must not re-append
    n_before = media_census_finalize(state).count()
    last_epoch = state["_last_epoch"]
    batch = spark.createDataFrame(
        rows[60:90], "path string, modality string, content binary"
    )
    q2 = media_census_stream(stream, state)
    q2.epoch_fold(batch, last_epoch)  # duplicate delivery
    assert media_census_finalize(state).count() == n_before


# --- versioned CDC ingestion (r8) -------------------------------------------


def _cdc_land_events(spark, tmp_path, n_slices=3):
    import glob as _g
    import shutil as _sh

    land = tmp_path / "cdc_events"
    land.mkdir()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for i in range(n_slices):
        s = raw.filter(F.col("event_id") % n_slices == i).coalesce(1)
        s.write.parquet(str(land / f"slice{i}"))
        part = _g.glob(str(land / f"slice{i}" / "part-*.parquet"))[0]
        _sh.move(part, str(land / f"file-{i}.parquet"))
        _sh.rmtree(str(land / f"slice{i}"))
    return land, raw


def test_versioned_cdc_stream_equals_batch(spark, tmp_path):
    """The stream-folded chain's LATEST version equals the one-shot
    batch aggregate exactly; every version is manifest-committed with
    its epoch in meta; and the 0→latest net change feed reproduces the
    final state as pure inserts."""
    from portfolio1_etl_spark.operators.sinks import (
        _versions,
        read_changes,
        read_version,
        version_meta,
    )
    from portfolio1_etl_spark.streaming import (
        read_events_stream,
        versioned_cdc_stream,
    )

    land, raw = _cdc_land_events(spark, tmp_path)
    chain = str(tmp_path / "cdc_chain")
    q = versioned_cdc_stream(read_events_stream(spark, str(land)), chain).start()
    q.processAllAvailable()
    q.stop()

    vs = _versions(spark, chain)
    assert len(vs) == 3  # one version per micro-batch
    assert version_meta(spark, chain) == {"epoch": 2, "stream_id": "default"}

    got = {
        (r.sku, str(r.qty), r.n)
        for r in read_version(spark, chain).collect()
    }
    want = {
        (r.sku, str(r.qty), r.n)
        for r in raw.groupBy(F.col("event_type").alias("sku"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("qty"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()
    }
    assert got == want

    # the net CDC feed from empty to latest IS the final state
    feed = read_changes(spark, chain, 0, vs[-1])
    ins = {
        (r.sku, str(r.qty), r.n)
        for r in feed.filter(F.col("_change") == "insert").drop("_change").collect()
    }
    # rows for v=0's skus changed since, so compare against latest
    # minus v0-unchanged: simpler — net feed folded onto v0 equals latest
    v0 = {
        (r.sku, str(r.qty), r.n)
        for r in read_version(spark, chain, 0).collect()
    }
    dels = {
        (r.sku, str(r.qty), r.n)
        for r in feed.filter(F.col("_change") == "delete").drop("_change").collect()
    }
    assert (v0 - dels) | ins == got


def test_versioned_cdc_stream_epoch_redelivery_and_resume(spark, tmp_path):
    """At-least-once safety, DURABLY: re-invoking the fold with an
    already-committed epoch id is a no-op even from a fresh process
    (the guard reads the manifest meta, not driver memory), and a
    resumed stream continues the chain instead of double-folding."""
    from portfolio1_etl_spark.operators.sinks import _versions, read_version
    from portfolio1_etl_spark.streaming import (
        read_events_stream,
        versioned_cdc_stream,
    )

    land, raw = _cdc_land_events(spark, tmp_path)
    chain = str(tmp_path / "cdc_chain2")
    writer = versioned_cdc_stream(read_events_stream(spark, str(land)), chain)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    vs_before = _versions(spark, chain)
    latest_before = {
        (r.sku, str(r.qty)) for r in read_version(spark, chain).collect()
    }

    # same-epoch re-delivery through a FRESH writer (no shared dict):
    # fold epoch 0's slice again under its original epoch id
    fresh = versioned_cdc_stream(read_events_stream(spark, str(land)), chain)
    slice0 = raw.filter(F.col("event_id") % 3 == 0)
    fresh.epoch_fold(slice0, 0)
    fresh.epoch_fold(slice0, 2)  # latest epoch re-delivered too
    assert _versions(spark, chain) == vs_before
    assert {
        (r.sku, str(r.qty)) for r in read_version(spark, chain).collect()
    } == latest_before

    # a genuinely new epoch continues the chain
    fresh.epoch_fold(slice0, 3)
    assert len(_versions(spark, chain)) == len(vs_before) + 1


def test_versioned_cdc_stream_rejects_foreign_stream_id(spark, tmp_path):
    """The r9 checkpoint-lifetime guard: a writer with a DIFFERENT
    stream_id (i.e. a restart whose checkpoint — and therefore epoch
    numbering — was lost or replaced) fails LOUDLY instead of silently
    discarding every micro-batch whose reset epoch id sits below the
    old marker."""
    import pytest

    from portfolio1_etl_spark.operators.sinks import _versions
    from portfolio1_etl_spark.streaming import (
        read_events_stream,
        versioned_cdc_stream,
    )

    land, raw = _cdc_land_events(spark, tmp_path)
    chain = str(tmp_path / "cdc_chain3")
    writer = versioned_cdc_stream(
        read_events_stream(spark, str(land)), chain, stream_id="ckpt-A"
    )
    slice0 = raw.filter(F.col("event_id") % 3 == 0)
    writer.epoch_fold(slice0, 0)
    writer.epoch_fold(slice0.limit(5), 1)
    vs_before = _versions(spark, chain)

    # fresh-checkpoint restart: epoch ids reset to 0 under a new id —
    # the old guard would silently skip this batch (0 <= marker 1)
    other = versioned_cdc_stream(
        read_events_stream(spark, str(land)), chain, stream_id="ckpt-B"
    )
    with pytest.raises(RuntimeError, match="ckpt-A"):
        other.epoch_fold(slice0, 0)
    assert _versions(spark, chain) == vs_before  # nothing written

    # the ORIGINAL id still folds new epochs
    writer.epoch_fold(slice0.limit(3), 2)
    assert len(_versions(spark, chain)) == len(vs_before) + 1


# --- streaming VARIANT ingestion (r10) --------------------------------------


def test_variant_ingest_stream_matches_batch_over_pydatasource(
    spark, tmp_path
):
    """q238's VARIANT shred composed with the custom Python DataSource
    stream: JSON payloads (incl. malformed) ride the framed feed's sku
    column; the streamed per-site census must equal the batch twin
    over the same feed dir, survive a kill-and-resume picking up ONLY
    new files, and fold a re-delivered epoch exactly once."""
    from portfolio1_etl_spark.sources.pydatasource import (
        encode_frames,
        register,
    )
    from portfolio1_etl_spark.streaming.jobs import (
        variant_ingest_finalize,
        variant_ingest_stream,
        variant_shred_census,
    )

    register(spark)
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()

    def _doc(i: int) -> str:
        if i % 5 == 0:
            return "{bad json"
        if i % 2 == 0:
            return '{"amount": %d}' % (i * 10)
        return '{"pos": {"x": %d}}' % (i % 50)

    def _write(name: str, lo: int, hi: int, site: str) -> None:
        recs = [(_doc(i), i, site) for i in range(lo, hi)]
        (feed_dir / name).write_bytes(encode_frames(recs))

    _write("site=web__bbb.feed", 0, 40, "web")
    _write("site=app__mmm.feed", 40, 70, "app")

    ckpt = str(tmp_path / "ckpt")
    state: dict = {}

    def run_once():
        stream = spark.readStream.format("framed_feed").load(str(feed_dir))
        q = (
            variant_ingest_stream(stream, state)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    batch = spark.read.format("framed_feed").load(str(feed_dir))
    want = sorted(
        tuple(r) for r in variant_shred_census(batch).collect()
    )
    got = sorted(tuple(r) for r in variant_ingest_finalize(state).collect())
    assert got == want
    n_valid = {r[0]: r[2] for r in got}
    assert n_valid["web"] < 40  # the malformed docs really went NULL

    # kill-and-resume: a new file — sorting BEFORE the consumed names —
    # is the only new content of run 2
    _write("site=web__000.feed", 70, 90, "web")
    run_once()
    batch2 = spark.read.format("framed_feed").load(str(feed_dir))
    want2 = sorted(tuple(r) for r in variant_shred_census(batch2).collect())
    got2 = sorted(tuple(r) for r in variant_ingest_finalize(state).collect())
    assert got2 == want2

    # at-least-once: re-delivering the last epoch folds exactly once
    before = sorted(tuple(r) for r in variant_ingest_finalize(state).collect())
    dup = spark.createDataFrame(
        [("{\"amount\": 5}", 1, "web")], "sku string, qty bigint, site string"
    )
    stream = spark.readStream.format("framed_feed").load(str(feed_dir))
    w = variant_ingest_stream(stream, state)
    w.epoch_fold(dup, state["_last_epoch"])
    after = sorted(tuple(r) for r in variant_ingest_finalize(state).collect())
    assert after == before


# --- streaming join-view maintenance (r11) ----------------------------------


def test_joinview_maintenance_stream(spark, tmp_path):
    """Streaming maintenance of the incremental join view: the
    foreachBatch job fast-forwards the view chain from the two source
    chains' CDC feeds — through SNAPSHOT and ROW-LEVEL delta commits
    alike — and the committed view equals a from-scratch join of the
    snapshots after every epoch. Exactly-once is version-driven: a
    duplicate epoch delivery (and an epoch where nothing advanced)
    must not commit a new view version."""
    from portfolio1_etl_spark.operators.matview import join_view
    from portfolio1_etl_spark.operators.sinks import (
        _versions,
        delete_from_chain,
        read_version,
        upsert_into_chain,
        write_versioned,
    )
    from portfolio1_etl_spark.streaming import (
        joinview_maintenance_stream,
        read_events_stream,
    )

    pa, pb, pv = (str(tmp_path / d) for d in ("fact", "dim", "view"))
    a0 = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 200), (3, 2, 300), (4, 3, 400)],
        "id long, ck long, cents long",
    )
    b0 = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "ck long, seg string"
    )
    write_versioned(a0, pa, capture_changes=True, manifest=True)
    write_versioned(b0, pb, capture_changes=True, manifest=True)

    land, _ = _cdc_land_events(spark, tmp_path, n_slices=2)
    writer = joinview_maintenance_stream(
        read_events_stream(spark, str(land)), pa, pb, pv, ["ck"]
    )

    def _check():
        got = sorted(map(tuple, read_version(spark, pv).collect()))
        want = sorted(
            map(
                tuple,
                join_view(
                    read_version(spark, pa), read_version(spark, pb), ["ck"]
                ).collect(),
            )
        )
        assert got == want

    # plumbing: a real availableNow run seeds the view chain (v0)
    q = writer.option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert _versions(spark, pv) == [0]
    _check()

    dummy = spark.createDataFrame([(1,)], "x long")
    # epoch with no chain advance: no new view version
    writer.epoch_fold(dummy, 99)
    assert _versions(spark, pv) == [0]

    # fact DELETE commit, then an epoch → v1 reflects it
    delete_from_chain(
        spark, pa, spark.createDataFrame([(2,)], "id long"), ["id"]
    )
    writer.epoch_fold(dummy, 100)
    assert _versions(spark, pv) == [0, 1]
    _check()

    # BOTH chains advance (fact upsert + dim upsert), one epoch
    upsert_into_chain(
        spark,
        pa,
        spark.createDataFrame(
            [(3, 2, 333), (5, 9, 500)], "id long, ck long, cents long"
        ),
        ["id"],
    )
    upsert_into_chain(
        spark,
        pb,
        spark.createDataFrame([(2, "Y"), (9, "q")], "ck long, seg string"),
        ["ck"],
    )
    writer.epoch_fold(dummy, 101)
    assert _versions(spark, pv) == [0, 1, 2]
    _check()
    rows = {
        (r.id, r.ck, r.seg): (r.cents, r._mult)
        for r in read_version(spark, pv).collect()
    }
    assert rows[(3, 2, "Y")] == (333, 1)
    assert rows[(5, 9, "q")] == (500, 1)
    assert (2, 1, "x") not in rows

    # duplicate delivery of the SAME epoch: durable marker no-ops
    writer.epoch_fold(dummy, 101)
    assert _versions(spark, pv) == [0, 1, 2]


# --- streaming aggregate-view maintenance (r12) ------------------------------


def test_aggview_maintenance_stream(spark, tmp_path):
    """Streaming maintenance of the incremental AGGREGATE view: the
    foreachBatch job fast-forwards the per-key n_rows/sum/min/max view
    chain from the base chain's CDC feed — through snapshot and
    row-level delta commits alike — and the committed view equals a
    from-scratch agg_view of the head snapshot after every epoch,
    including a DELETE that removes a group minimum (the dirty-group
    rescan path). Exactly-once is version-driven: a duplicate epoch
    and a no-advance epoch must not commit a new view version."""
    from portfolio1_etl_spark.operators.matview import agg_view
    from portfolio1_etl_spark.operators.sinks import (
        _versions,
        delete_from_chain,
        read_version,
        upsert_into_chain,
        write_versioned,
    )
    from portfolio1_etl_spark.streaming import (
        aggview_maintenance_stream,
        read_events_stream,
    )

    pa, pv = str(tmp_path / "base"), str(tmp_path / "view")
    a0 = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 200), (3, "b", 300), (4, "b", 400)],
        "id long, grp string, val long",
    )
    write_versioned(a0, pa, capture_changes=True, manifest=True)

    land, _ = _cdc_land_events(spark, tmp_path, n_slices=2)
    writer = aggview_maintenance_stream(
        read_events_stream(spark, str(land)), pa, pv, ["grp"], "val"
    )

    def _check():
        got = sorted(map(tuple, read_version(spark, pv).collect()))
        want = sorted(
            map(tuple, agg_view(read_version(spark, pa), ["grp"], "val").collect())
        )
        assert got == want

    # plumbing: a real availableNow run seeds the view chain (v0)
    q = writer.option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert _versions(spark, pv) == [0]
    _check()

    dummy = spark.createDataFrame([(1,)], "x long")
    # epoch with no chain advance: no new view version
    writer.epoch_fold(dummy, 99)
    assert _versions(spark, pv) == [0]

    # DELETE commit removing group a's minimum -> dirty rescan path
    delete_from_chain(
        spark, pa, spark.createDataFrame([(1,)], "id long"), ["id"]
    )
    writer.epoch_fold(dummy, 100)
    assert _versions(spark, pv) == [0, 1]
    _check()

    # UPSERT commit: update id 3 (b's min moves), insert new group c
    upsert_into_chain(
        spark,
        pa,
        spark.createDataFrame(
            [(3, "b", 333), (5, "c", 500)], "id long, grp string, val long"
        ),
        ["id"],
    )
    writer.epoch_fold(dummy, 101)
    assert _versions(spark, pv) == [0, 1, 2]
    _check()
    rows = {r.grp: (r.n_rows, r.sum_val, r.min_val, r.max_val)
            for r in read_version(spark, pv).collect()}
    assert rows["a"] == (1, 200, 200, 200)
    assert rows["b"] == (2, 733, 333, 400)
    assert rows["c"] == (1, 500, 500, 500)

    # duplicate delivery of the SAME epoch: durable marker no-ops
    writer.epoch_fold(dummy, 101)
    assert _versions(spark, pv) == [0, 1, 2]


# --- streaming distinct-count-view maintenance (r13) -------------------------


def test_distinctview_maintenance_stream(spark, tmp_path):
    """Streaming maintenance of the incremental COUNT-DISTINCT view:
    the foreachBatch job fast-forwards the multiplicity sidecar AND
    the per-key n_distinct view from the base chain's CDC feed, and
    the committed view equals a from-scratch distinct_view of the head
    after every epoch — including a DELETE of one of two copies of a
    value (count unchanged: no 0-crossing) and a DELETE of the last
    copy (count drops). Exactly-once is version-driven; a torn epoch
    (sidecar committed, view not) heals from the sidecar alone."""
    from portfolio1_etl_spark.operators.matview import distinct_view
    from portfolio1_etl_spark.operators.sinks import (
        _versions,
        delete_from_chain,
        read_version,
        upsert_into_chain,
        version_meta,
        write_versioned,
    )
    from portfolio1_etl_spark.streaming import (
        distinctview_maintenance_stream,
        read_events_stream,
    )

    pb = str(tmp_path / "base")
    px, pv = str(tmp_path / "aux"), str(tmp_path / "view")
    base0 = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"), (4, "b", "z")],
        "id long, grp string, val string",
    )
    write_versioned(base0, pb, capture_changes=True, manifest=True)

    land, _ = _cdc_land_events(spark, tmp_path, n_slices=2)
    writer = distinctview_maintenance_stream(
        read_events_stream(spark, str(land)), pb, px, pv, ["grp"], "val"
    )

    def _check():
        got = sorted(map(tuple, read_version(spark, pv).collect()))
        _, want_df = distinct_view(read_version(spark, pb), ["grp"], "val")
        assert got == sorted(map(tuple, want_df.collect()))

    q = writer.option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert _versions(spark, px) == [0] and _versions(spark, pv) == [0]
    _check()

    dummy = spark.createDataFrame([(1,)], "x long")
    # epoch with no chain advance: no new versions on either chain
    writer.epoch_fold(dummy, 99)
    assert _versions(spark, px) == [0] and _versions(spark, pv) == [0]

    # DELETE one of a's two 'x' rows: cell 2->1, n_distinct unchanged
    delete_from_chain(
        spark, pb, spark.createDataFrame([(1,)], "id long"), ["id"]
    )
    writer.epoch_fold(dummy, 100)
    _check()
    rows = {r.grp: r.n_distinct for r in read_version(spark, pv).collect()}
    assert rows == {"a": 2, "b": 1}

    # DELETE the LAST 'y' row (cell 1->0: count drops) and UPSERT a
    # new value into b plus a whole new group c
    delete_from_chain(
        spark, pb, spark.createDataFrame([(3,)], "id long"), ["id"]
    )
    upsert_into_chain(
        spark,
        pb,
        spark.createDataFrame(
            [(5, "b", "w"), (6, "c", "u")], "id long, grp string, val string"
        ),
        ["id"],
    )
    writer.epoch_fold(dummy, 101)
    _check()
    rows = {r.grp: r.n_distinct for r in read_version(spark, pv).collect()}
    assert rows == {"a": 1, "b": 2, "c": 1}

    # duplicate delivery of the SAME epoch: durable markers no-op
    nx, nv = _versions(spark, px), _versions(spark, pv)
    writer.epoch_fold(dummy, 101)
    assert _versions(spark, px) == nx and _versions(spark, pv) == nv

    # torn epoch: sidecar advanced, view write lost — simulate by
    # advancing the base and committing ONLY the sidecar via a fresh
    # job whose view write explodes, then assert the real job heals
    # the view from the sidecar before advancing
    delete_from_chain(
        spark, pb, spark.createDataFrame([(6,)], "id long"), ["id"]
    )
    from portfolio1_etl_spark.operators.matview import apply_distinct_delta
    from portfolio1_etl_spark.operators.sinks import read_changes

    va = int(version_meta(spark, px, _versions(spark, px)[-1])["base_v"])
    base_v = _versions(spark, pb)[-1]
    aux_new, _view_new = apply_distinct_delta(
        read_version(spark, px, _versions(spark, px)[-1]),
        read_version(spark, pv, _versions(spark, pv)[-1]),
        read_changes(spark, pb, va, base_v),
        ["grp"],
        "val",
    )
    write_versioned(
        aux_new, px, manifest=True,
        meta={"base_v": base_v, "stream_id": "default"},
    )  # sidecar ahead, view behind == the torn state
    writer.epoch_fold(dummy, 102)  # must HEAL, not advance
    assert int(
        version_meta(spark, pv, _versions(spark, pv)[-1])["base_v"]
    ) == base_v
    _check()
    rows = {r.grp: r.n_distinct for r in read_version(spark, pv).collect()}
    assert rows == {"a": 1, "b": 2}


# --- streaming near-dup ingest (r13) -----------------------------------------


def test_neardup_ingest_stream(spark, tmp_path):
    """Incremental LSH near-dup detection on ingest: after any number
    of insert epochs, the accumulated pairs chain must equal the BATCH
    lsh_candidates over the full corpus (uncapped) — pairs appear
    exactly when their second document arrives, within-batch and
    cross-batch alike. O(delta) commits carry the exactly-once marker;
    duplicate epochs no-op; a feed with deletes refuses loudly."""
    from portfolio1_etl_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
        shingle_hashes,
    )
    from portfolio1_etl_spark.operators.sinks import (
        _versions,
        delete_from_chain,
        read_version,
        upsert_into_chain,
        write_versioned,
    )
    from portfolio1_etl_spark.streaming import (
        neardup_ingest_stream,
        read_events_stream,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    alt = "completely different words about streaming incremental state "
    docs1 = [
        (1, base * 4),
        (2, base * 4 + "tail one"),      # near-dup of 1
        (3, alt * 4),
        (4, "unrelated text with its own tokens entirely " * 4),
    ]
    docs2 = [
        (5, base * 4 + "tail two"),      # near-dup of 1/2, CROSS-batch
        (6, alt * 4 + "extra"),          # near-dup of 3, cross-batch
        (7, "seven has nothing in common with anything here " * 4),
        (8, "seven has nothing in common with anything here " * 4),
        # 7/8 identical: WITHIN-batch pair
    ]

    def _df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    pb = str(tmp_path / "docs")
    ps, pp = str(tmp_path / "sigs"), str(tmp_path / "pairs")
    write_versioned(_df(docs1), pb, capture_changes=True, manifest=True)

    land, _ = _cdc_land_events(spark, tmp_path, n_slices=2)
    writer = neardup_ingest_stream(
        read_events_stream(spark, str(land)), pb, ps, pp
    )

    def _batch_pairs(rows):
        sigs = minhash_signatures(shingle_hashes(_df(rows), "text"))
        return sorted(
            (r.doc_a, r.doc_b) for r in lsh_candidates(sigs, 4).collect()
        )

    def _stream_pairs():
        return sorted(
            (r.doc_a, r.doc_b)
            for r in read_version(spark, pp)
            .select("doc_a", "doc_b")
            .collect()
        )

    q = writer.option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert _stream_pairs() == _batch_pairs(docs1)
    assert _stream_pairs(), "seed corpus has near-dups; pairs expected"

    dummy = spark.createDataFrame([(1,)], "x long")
    # no-advance epoch: neither chain moves
    ns, np_ = _versions(spark, ps), _versions(spark, pp)
    writer.epoch_fold(dummy, 99)
    assert _versions(spark, ps) == ns and _versions(spark, pp) == np_

    # ingest batch 2: cross-batch AND within-batch pairs discovered
    upsert_into_chain(spark, pb, _df(docs2), ["doc_id"])
    writer.epoch_fold(dummy, 100)
    want = _batch_pairs(docs1 + docs2)
    assert _stream_pairs() == want
    assert (7, 8) in want, "within-batch identical pair must be found"
    assert any(a in (1, 2) and b == 5 for a, b in want), (
        "cross-batch near-dup of the seed must be found"
    )

    # duplicate delivery of the SAME epoch: markers no-op
    ns, np_ = _versions(spark, ps), _versions(spark, pp)
    writer.epoch_fold(dummy, 100)
    assert _versions(spark, ps) == ns and _versions(spark, pp) == np_

    # a delete in the feed refuses loudly (stale-signature hazard)
    delete_from_chain(
        spark, pb, spark.createDataFrame([(4,)], "doc_id long"), ["doc_id"]
    )
    import pytest

    with pytest.raises(ValueError, match="insert-only"):
        writer.epoch_fold(dummy, 101)


def test_neardup_ingest_stream_torn_epoch_is_idempotent(spark, tmp_path):
    """The pairs-first commit order's crash contract, exercised: if an
    epoch commits its PAIRS but dies before the signature commit, the
    re-delivered epoch re-runs against the unchanged signature head
    and re-upserts the same (doc_a, doc_b) keys — the pairs chain
    still equals the batch twin and the signature marker catches up."""
    from portfolio1_etl_spark.operators.dedup import (
        band_table,
        lsh_candidates,
        minhash_signatures,
        shingle_hashes,
    )
    from portfolio1_etl_spark.operators.sinks import (
        _versions,
        read_changes,
        read_version,
        upsert_into_chain,
        version_meta,
        write_versioned,
    )
    from portfolio1_etl_spark.streaming import (
        neardup_ingest_stream,
        read_events_stream,
    )
    from pyspark.sql import functions as SF

    text = "torn epoch corpus shares these exact tokens repeatedly "
    docs1 = [(1, text * 4), (2, text * 4 + "one")]
    docs2 = [(3, text * 4 + "two"), (4, "nothing shared here at all " * 4)]

    def _df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    pb = str(tmp_path / "docs")
    ps, pp = str(tmp_path / "sigs"), str(tmp_path / "pairs")
    write_versioned(_df(docs1), pb, capture_changes=True, manifest=True)

    land, _ = _cdc_land_events(spark, tmp_path, n_slices=1)
    writer = neardup_ingest_stream(
        read_events_stream(spark, str(land)), pb, ps, pp
    )
    dummy = spark.createDataFrame([(1,)], "x long")
    writer.epoch_fold(dummy, 1)  # seed

    # advance the base, then simulate the torn state: replay the job's
    # own pairs computation and commit ONLY the pairs chain
    upsert_into_chain(spark, pb, _df(docs2), ["doc_id"])
    base_v = _versions(spark, pb)[-1]
    va = int(version_meta(spark, ps, _versions(spark, ps)[-1])["base_v"])
    feed = read_changes(spark, pb, va, base_v).select("doc_id", "text")
    sigs_new = minhash_signatures(shingle_hashes(feed, "text"))
    stored = read_version(spark, ps)
    pairs_new = (
        band_table(sigs_new, 4).alias("ba")
        .join(
            band_table(stored.unionByName(sigs_new), 4).alias("bb"),
            (SF.col("ba.band") == SF.col("bb.band"))
            & (SF.col("ba.sig") == SF.col("bb.sig"))
            & (SF.col("ba.doc_id") != SF.col("bb.doc_id")),
        )
        .select(
            SF.least(SF.col("ba.doc_id"), SF.col("bb.doc_id")).alias("doc_a"),
            SF.greatest(SF.col("ba.doc_id"), SF.col("bb.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    upsert_into_chain(
        spark, pp, pairs_new, ["doc_a", "doc_b"],
        meta={"base_v": base_v, "stream_id": "default"},
    )  # pairs landed; signatures did NOT — the torn state

    writer.epoch_fold(dummy, 2)  # re-delivery must heal, not corrupt
    assert int(
        version_meta(spark, ps, _versions(spark, ps)[-1])["base_v"]
    ) == base_v
    sigs_full = minhash_signatures(
        shingle_hashes(_df(docs1 + docs2), "text")
    )
    want = sorted(
        (r.doc_a, r.doc_b) for r in lsh_candidates(sigs_full, 4).collect()
    )
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in read_version(spark, pp).select("doc_a", "doc_b").collect()
    )
    assert got == want
    # and the doubled upsert did not duplicate keys
    n_all = read_version(spark, pp).count()
    n_distinct = (
        read_version(spark, pp).select("doc_a", "doc_b").distinct().count()
    )
    assert n_all == n_distinct
