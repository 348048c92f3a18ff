"""Custom Python DataSource (Spark 4 API): the framed binary feed must
read partition-parallel, push the site filter down to file pruning,
round-trip through its write path, and fail LOUDLY on corrupt frames —
never silently truncate."""

from __future__ import annotations

import os
import struct

import pytest

from portfolio1_etl_spark.sources.pydatasource import (
    FramedFeedDataSource,
    decode_frames,
    encode_frames,
)

_ROWS_A = [("sku-1", 3, "web"), ("sku-2", 5, "web"), ("sku-1", 2, "web")]
_ROWS_B = [("sku-9", 7, "store"), ("sku-2", 1, "store")]


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    (d / "site=web__aaa.feed").write_bytes(encode_frames(_ROWS_A))
    (d / "site=store__bbb.feed").write_bytes(encode_frames(_ROWS_B))
    return str(d)


def _register(spark):
    spark.dataSource.register(FramedFeedDataSource)


def test_reads_all_files_with_schema(spark, feed_dir):
    _register(spark)
    df = spark.read.format("framed_feed").load(feed_dir)
    assert [f.name for f in df.schema.fields] == ["sku", "qty", "site"]
    got = sorted((r.sku, r.qty, r.site) for r in df.collect())
    assert got == sorted(_ROWS_A + _ROWS_B)
    # one partition per feed file
    assert df.rdd.getNumPartitions() == 2


def test_site_option_prunes_files(spark, feed_dir):
    _register(spark)
    df = (
        spark.read.format("framed_feed")
        .option("site", "store")
        .load(feed_dir)
    )
    assert sorted((r.sku, r.qty, r.site) for r in df.collect()) == sorted(_ROWS_B)
    # the non-matching file never becomes a partition (file-level skip)
    assert df.rdd.getNumPartitions() == 1


def test_write_round_trip(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "out")
    src = spark.createDataFrame(_ROWS_A + _ROWS_B, "sku string, qty bigint, site string")
    # the Python DataSource API only supports append/overwrite modes
    src.repartition(2, "site").write.format("framed_feed").mode("append").save(out)
    files = [f for f in os.listdir(out) if f.endswith(".feed")]
    assert files and not [f for f in os.listdir(out) if f.endswith(".tmp")]
    back = spark.read.format("framed_feed").load(out)
    assert sorted((r.sku, r.qty, r.site) for r in back.collect()) == sorted(
        _ROWS_A + _ROWS_B
    )


def test_corrupt_frame_fails_loudly(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    good = encode_frames(_ROWS_A)
    (d / "site=web__ok.feed").write_bytes(good + struct.pack("<I", 99))  # truncated
    _register(spark)
    df = spark.read.format("framed_feed").load(str(d))
    with pytest.raises(Exception, match="truncated frame"):
        df.collect()


def test_decode_rejects_oversize_and_bad_json():
    with pytest.raises(ValueError, match="exceeds 1 MiB"):
        list(decode_frames(struct.pack("<I", 1 << 21) + b"x"))
    payload = b"not-json"
    with pytest.raises(ValueError, match="bad frame payload"):
        list(decode_frames(struct.pack("<I", len(payload)) + payload))


def test_streaming_picks_up_only_new_files(spark, tmp_path, feed_dir):
    """availableNow run 1 consumes both fixture files; a file appended
    afterwards is the ONLY content of run 2 under the same checkpoint.
    Run 3 appends a file whose name sorts BEFORE every consumed name —
    uuid filenames don't sort in arrival order, so a count-of-sorted-
    files offset would both skip it and re-emit an old file; the
    name-set offset must emit it exactly once."""
    _register(spark)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        q = (
            spark.readStream.format("framed_feed")
            .load(feed_dir)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return sorted(
            (r.sku, r.qty, r.site) for r in spark.read.parquet(sink).collect()
        )

    assert run_once() == sorted(_ROWS_A + _ROWS_B)
    extra = [("sku-new", 11, "web")]
    with open(os.path.join(feed_dir, "site=web__ccc.feed"), "wb") as fh:
        fh.write(encode_frames(extra))
    # the second availableNow run appends ONLY the new file's rows
    assert run_once() == sorted(_ROWS_A + _ROWS_B + extra)
    early = [("sku-early", 7, "web")]
    with open(os.path.join(feed_dir, "site=web__000.feed"), "wb") as fh:
        fh.write(encode_frames(early))
    assert run_once() == sorted(_ROWS_A + _ROWS_B + extra + early)


# --- property-based codec hardening (pure Python, no Spark) ---------------

from hypothesis import given, settings
from hypothesis import strategies as st

_sku = st.text(
    st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=30
)
_rec = st.tuples(_sku, st.integers(min_value=-(2**62), max_value=2**62), _sku)


@settings(max_examples=200, deadline=None)
@given(st.lists(_rec, max_size=40))
def test_frames_roundtrip_any_records(records):
    assert list(decode_frames(encode_frames(records))) == [
        (s, int(q), t) for s, q, t in records
    ]


@settings(max_examples=100, deadline=None)
@given(st.lists(_rec, min_size=1, max_size=10), st.integers(1, 4))
def test_any_truncation_is_loud(records, cut):
    """Chopping ANY nonzero suffix off a feed must raise, never
    silently yield a prefix of the records and stop."""
    b = encode_frames(records)
    with pytest.raises(ValueError, match="truncated"):
        list(decode_frames(b[: len(b) - cut]))


def test_legacy_count_offset_resumes_without_replay(feed_dir):
    """A pre-fix checkpoint stored ``{"n": k}`` = "first k sorted
    names". Resuming from it must translate to exactly those old
    semantics — NOT the empty set, which would re-emit every consumed
    file as silent duplicates downstream."""
    from portfolio1_etl_spark.sources.pydatasource import (
        FramedFeedStreamReader,
    )

    r = FramedFeedStreamReader({"path": feed_dir})
    # both fixture files consumed under the old counting scheme
    rows, end = r.read({"n": 2})
    assert list(rows) == []
    assert set(end["files"]) == {"site=store__bbb.feed", "site=web__aaa.feed"}
    # n=1 means the FIRST sorted name (site=store__bbb) was consumed
    rows, _ = r.read({"n": 1})
    assert sorted(r_[0] for r_ in rows) == sorted(x[0] for x in _ROWS_A)


def test_offset_compacts_retired_files(feed_dir):
    """Consumed names whose files a retention sweep deleted drop out
    of the next offset (they can never legitimately reappear — feed
    names embed a fresh uuid), so the per-batch offset JSON scales
    with the LIVE directory, not with total files ever seen."""
    from portfolio1_etl_spark.sources.pydatasource import (
        FramedFeedStreamReader,
    )

    r = FramedFeedStreamReader({"path": feed_dir})
    rows, off1 = r.read(r.initialOffset())
    assert len(off1["files"]) == 2 and len(list(rows)) == 5
    os.remove(os.path.join(feed_dir, "site=web__aaa.feed"))
    (  # a fresh arrival after the sweep
        open(os.path.join(feed_dir, "site=web__ddd.feed"), "wb").write(
            encode_frames([("sku-x", 1, "web")])
        )
    )
    rows, off2 = r.read(off1)
    assert [x[0] for x in rows] == ["sku-x"]  # fresh file exactly once
    assert set(off2["files"]) == {"site=store__bbb.feed", "site=web__ddd.feed"}
    # nothing further: the compacted offset is stable
    rows, off3 = r.read(off2)
    assert list(rows) == [] and off3 == off2
