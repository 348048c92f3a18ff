"""Streaming CDC source over the manifest chain (chain_changes):
stream == batch feed equality, whole-version batches, exactly-once
across restarts, starting_version, and the loud feed-lost refusal."""

from __future__ import annotations

import pytest

from portfolio1_etl_spark.operators.sinks import (
    add_chain_constraint,
    delete_from_chain,
    read_changes,
    write_versioned,
)
from portfolio1_etl_spark.sources.chain_stream import register


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _chain(spark, path):
    write_versioned(
        _mk(spark, [(1, "a"), (2, "b")]), path, manifest=True,
        capture_changes=True,
    )
    write_versioned(
        _mk(spark, [(1, "a"), (2, "B"), (3, "c")]), path,
        capture_changes=True,
    )
    delete_from_chain(spark, path, _mk(spark, [(1, "x")]).select("k"), ["k"])
    return path


def _drain(spark, path, checkpoint, starting_version=None):
    register(spark)
    r = spark.readStream.format("chain_changes")
    if starting_version is not None:
        r = r.option("starting_version", starting_version)
    stream = r.load(path)
    out = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _eid: out.extend(df.collect())
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


def test_stream_equals_batch_feed(spark, tmp_path):
    path = _chain(spark, str(tmp_path / "chain"))
    got = sorted(
        (r["k"], r["v"], r["_change"], r["_commit_version"])
        for r in _drain(spark, path, str(tmp_path / "ckpt"))
    )
    want = []
    for v in (1, 2):
        for r in read_changes(spark, path, v - 1, v).collect():
            want.append((r["k"], r["v"], r["_change"], v))
    # v=0's feed is the initial snapshot as inserts
    for r in _mk(spark, [(1, "a"), (2, "b")]).collect():
        want.append((r["k"], r["v"], "insert", 0))
    assert got == sorted(want)


def test_exactly_once_across_restarts(spark, tmp_path):
    path = _chain(spark, str(tmp_path / "chain"))
    ckpt = str(tmp_path / "ckpt")
    first = _drain(spark, path, ckpt)
    assert len(first) > 0
    # nothing new: a restart on the same checkpoint emits zero rows
    assert _drain(spark, path, ckpt) == []
    # two more commits (one a no-op metadata commit with an EMPTY
    # feed): the restart emits exactly the new versions' rows
    add_chain_constraint(spark, path, name="k_pos", check="k > 0")
    write_versioned(
        _mk(spark, [(2, "B"), (3, "c"), (9, "z")]), path,
        capture_changes=True,
    )
    more = _drain(spark, path, ckpt)
    vs = sorted({r["_commit_version"] for r in more})
    assert vs == [4]  # v=3 (constraint) contributed an empty feed
    assert sorted((r["k"], r["_change"]) for r in more) == [(9, "insert")]


def test_starting_version_skips_history(spark, tmp_path):
    path = _chain(spark, str(tmp_path / "chain"))
    got = _drain(
        spark, path, str(tmp_path / "ckpt"), starting_version=2
    )
    assert sorted({r["_commit_version"] for r in got}) == [2]
    assert sorted((r["k"], r["_change"]) for r in got) == [(1, "delete")]


def test_non_capture_chain_refuses(spark, tmp_path):
    path = str(tmp_path / "plain")
    write_versioned(_mk(spark, [(1, "a")]), path, manifest=True)
    register(spark)
    with pytest.raises(Exception, match="capture"):
        spark.readStream.format("chain_changes").load(path).schema
