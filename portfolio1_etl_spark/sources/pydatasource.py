"""[ext] Custom connector via Spark 4's Python DataSource API: a
length-prefixed binary "sales feed" format the built-in readers cannot
parse, exposed as a first-class ``spark.read.format("framed_feed")``
source with partition-parallel reads, filter pushdown on ``site``, and
a write path.

Frame format (little-endian): ``[u32 length][length bytes of UTF-8
JSON {"sku": str, "qty": int, "site": str}]``, repeated to EOF; one
``.feed`` file per writer task. A truncated or oversized frame raises
loudly with the byte offset — a corrupt feed must never silently
truncate (the reference pipeline's silent-empty-fallback hazard,
portfolio-etl.py:477-523, is exactly what this guards against).

Scale shape: Spark schedules ONE partition per feed file, so a
directory of N files reads N-way parallel with no driver-side I/O; the
``site`` pushdown skips whole files via the sidecar-free filename
convention (``site=<x>__*.feed``) when present, else filters per-row
inside the partition. Reference analogue: the reference's curl/file
channel feeds (SURVEY §2.1 S1-S11); the DataSource API packaging is
[ext] per SURVEY §6.
"""

from __future__ import annotations

import json
import os
import struct
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_SCHEMA = "sku string, qty bigint, site string"
_MAX_FRAME = 1 << 20  #: 1 MiB sanity bound per record


def encode_frames(records) -> bytes:
    """Encode an iterable of (sku, qty, site) into the feed format —
    shared by the writer and by tests building fixtures by hand."""
    out = bytearray()
    for sku, qty, site in records:
        payload = json.dumps(
            {"sku": sku, "qty": int(qty), "site": site}, separators=(",", ":")
        ).encode("utf-8")
        out += struct.pack("<I", len(payload)) + payload
    return bytes(out)


def decode_frames(b: bytes, path: str = "<buffer>"):
    """Yield (sku, qty, site) tuples; raise loudly on a malformed
    frame (truncation, oversize, bad JSON) with its byte offset."""
    pos = 0
    n = len(b)
    while pos < n:
        if pos + 4 > n:
            raise ValueError(
                f"{path}: truncated frame header at byte {pos} ({n - pos}"
                " bytes left)"
            )
        (ln,) = struct.unpack_from("<I", b, pos)
        if ln > _MAX_FRAME:
            raise ValueError(f"{path}: frame of {ln} bytes at {pos} exceeds 1 MiB")
        pos += 4
        if pos + ln > n:
            raise ValueError(
                f"{path}: truncated frame body at byte {pos} (need {ln},"
                f" have {n - pos})"
            )
        try:
            rec = json.loads(b[pos : pos + ln].decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as exc:
            raise ValueError(f"{path}: bad frame payload at byte {pos}: {exc}")
        yield (rec["sku"], int(rec["qty"]), rec["site"])
        pos += ln


class _FeedFilePartition(InputPartition):
    def __init__(self, path: str, site_filter):
        self.path = path
        self.site_filter = site_filter


class FramedFeedReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("framed_feed requires a path")
        self.site_filter = options.get("site")  # optional option-pushdown

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".feed")
            )
        else:
            files = [self.path]
        if self.site_filter:
            # filename-convention skip: site=<x>__<uuid>.feed files for
            # other sites never open (file-level pruning)
            kept = []
            for f in files:
                base = os.path.basename(f)
                if base.startswith("site=") and "__" in base:
                    if base.split("__", 1)[0] != f"site={self.site_filter}":
                        continue
                kept.append(f)
            files = kept
        return [_FeedFilePartition(f, self.site_filter) for f in files]

    def read(self, partition):
        with open(partition.path, "rb") as fh:
            data = fh.read()
        for rec in decode_frames(data, partition.path):
            if partition.site_filter and rec[2] != partition.site_filter:
                continue
            yield rec


class FramedFeedStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch source over the feed directory: the offset is the
    SET of consumed file basenames (stored sorted for a stable JSON
    form). Feed filenames carry a uuid (``site=<tag>__<uuid>.feed``)
    and so do NOT sort in arrival order — a count-of-sorted-files
    offset would both re-emit consumed files and silently skip a new
    file whose name sorts into the consumed prefix. Name-set offsets
    are insertion-order-free: ``read`` emits exactly the names not in
    the start set, and ``readBetweenOffsets`` replays exactly the
    end-minus-start name difference. Feed files are immutable once
    visible (the writer stages to ``.tmp`` and renames atomically), so
    the replay is byte-identical — the exactly-once contract
    Structured Streaming needs."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("framed_feed requires a path")

    def _names(self):
        if not os.path.isdir(self.path):
            return []
        return sorted(f for f in os.listdir(self.path) if f.endswith(".feed"))

    def initialOffset(self):
        return {"files": []}

    def _consumed(self, offset) -> set:
        # Back-compat: a pre-fix checkpoint stored {"n": count} meaning
        # "first n sorted names". Translate to exactly those old
        # semantics — the first k currently-sorted names — so the only
        # residual ambiguity is a new file whose uuid name sorted INTO
        # the consumed prefix since the checkpoint (the rare case the
        # name-set form was built to close). Translating to the empty
        # set instead would replay EVERY consumed file — silent
        # duplicates in the downstream sink, the worst of the options.
        # Every new offset this reader emits is the name-set form.
        if "files" in offset:
            return set(offset["files"])
        return set(self._names()[: int(offset.get("n", 0))])

    def _rows(self, names):
        out = []
        for name in names:
            with open(os.path.join(self.path, name), "rb") as fh:
                out.extend(decode_frames(fh.read(), name))
        return out

    def read(self, start):
        consumed = self._consumed(start)
        names = self._names()
        fresh = [n for n in names if n not in consumed]
        # Offset compaction: retire consumed names that no longer exist
        # on disk (the feed's retention sweep deleted them — feed files
        # are immutable and writer names embed a fresh uuid, so a
        # retired name can never legitimately reappear). Without this
        # the per-batch offset JSON in the checkpoint WAL grows
        # O(total files ever seen); with it, O(live directory).
        live = set(names)
        end = {"files": sorted((consumed & live) | set(fresh))}
        return iter(self._rows(fresh)), end

    def readBetweenOffsets(self, start, end):
        delta = sorted(self._consumed(end) - self._consumed(start))
        return iter(self._rows(delta))


class _FeedCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class FramedFeedWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("framed_feed requires a path")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        recs = [(row.sku, row.qty, row.site) for row in iterator]
        sites = {r[2] for r in recs}
        tag = sites.pop() if len(sites) == 1 else "mixed"
        name = f"site={tag}__{uuid.uuid4().hex}.feed"
        # stage-then-rename: a task retry must never leave a torn file
        final = os.path.join(self.path, name)
        tmp = final + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(encode_frames(recs))
        os.rename(tmp, final)
        return _FeedCommit(final, len(recs))

    def commit(self, messages):
        return None

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class FramedFeedDataSource(DataSource):
    """``spark.dataSource.register(FramedFeedDataSource)`` then
    ``spark.read.format("framed_feed").option("site", "web").load(p)``."""

    @classmethod
    def name(cls) -> str:
        return "framed_feed"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema):
        return FramedFeedReader(self.options)

    def writer(self, schema, overwrite: bool):
        return FramedFeedWriter(self.options)

    def simpleStreamReader(self, schema):
        return FramedFeedStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FramedFeedDataSource)
