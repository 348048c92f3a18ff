"""[ext] Streaming CDC reads from a versioned manifest chain — the
consumption half of the chain's change capture (Delta's ``readStream``
+ ``readChangeFeed`` shape): ``spark.readStream.format(
"chain_changes").load(path)`` tails a chain written with
``capture_changes=True`` and emits every committed feed row exactly
once, with ``_change`` (insert/delete semantics as captured) and
``_commit_version`` (the committing version — Delta CDF's
``_commit_version`` column) appended.

Offsets are CHAIN VERSION NUMBERS (``{"v": n}`` = versions ≤ n
consumed): committed versions are immutable (the manifest invariant),
so replaying a version range is byte-identical — the exactly-once
contract Structured Streaming needs, with no side channel. Every
micro-batch reads one or more WHOLE versions; a version is never
split across batches, so downstream per-version folds (matview
refresh) see transactional boundaries.

Scale shape: ``partitions(start, end)`` plans ONE InputPartition per
committed change FILE, so a large commit's feed reads file-parallel
across executors; rows travel as Arrow record batches, never
row-at-a-time Python objects. The planner touches only the tiny
manifest JSONs. Retention interplay: pruning a version below an
active stream's next offset fails that stream LOUDLY (the manifest is
gone) — the same contract as any lakehouse CDC stream outliving its
retention window.

Reference analogue: the reference pipeline re-reads whole inputs per
run (portfolio-etl.py:634-650 read-modify-write); this source is the
incremental replacement. Local-filesystem paths (like the framed
feed source — the Python DataSource packaging is [ext] per SURVEY
§6); a cluster deployment would swap the ``os``/``open`` calls for
fsspec.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

#: arrow type -> Spark DDL; loud failure beats silent coercion
_ARROW_DDL = {
    pa.bool_(): "boolean",
    pa.int8(): "tinyint",
    pa.int16(): "smallint",
    pa.int32(): "int",
    pa.int64(): "bigint",
    pa.float32(): "float",
    pa.float64(): "double",
    pa.string(): "string",
    pa.large_string(): "string",
    pa.binary(): "binary",
    pa.date32(): "date",
}


def _ddl_of(t: pa.DataType) -> str:
    if t in _ARROW_DDL:
        return _ARROW_DDL[t]
    if pa.types.is_timestamp(t):
        return "timestamp" if t.tz else "timestamp_ntz"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    raise ValueError(
        f"chain_changes cannot map arrow type {t} to a Spark type; "
        "extend _ARROW_DDL if the chain schema is intentional"
    )


def _manifest(path: str, n: int) -> dict:
    mf = os.path.join(path, "_manifests", f"v={n}.json")
    if not os.path.isfile(mf):
        raise FileNotFoundError(
            f"no manifest v={n} under {path} — pruned below an active "
            "stream's offset, or not a manifest chain"
        )
    with open(mf, encoding="utf-8") as fh:
        return json.load(fh)


def _versions(path: str) -> list[int]:
    d = os.path.join(path, "_manifests")
    if not os.path.isdir(d):
        raise ValueError(
            f"{path} is not a manifest chain (chain_changes streams "
            "manifest-committed feeds only)"
        )
    out = []
    for f in os.listdir(d):
        if f.startswith("v=") and f.endswith(".json"):
            out.append(int(f[2:-5]))
    return sorted(out)


class _FeedFile(InputPartition):
    def __init__(self, file_path: str, version: int):
        self.file_path = file_path
        self.version = version


class ChainChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("chain_changes requires a path")
        self.start_v = int(options.get("starting_version", 0))
        vs = _versions(self.path)
        if not vs:
            raise FileNotFoundError(f"no versions under {self.path}")
        # pin the feed schema at stream start (the Structured
        # Streaming source contract) from the newest captured feed
        ref = None
        for n in reversed(vs):
            rels = _manifest(self.path, n).get("changes") or []
            if rels:
                ref = os.path.join(self.path, rels[0])
                break
        if ref is None:
            raise ValueError(
                f"{self.path} captures no change feeds — write the "
                "chain with capture_changes=True to stream its CDC"
            )
        base = pq.read_schema(ref)
        self._arrow_schema = pa.schema(
            list(base) + [pa.field("_commit_version", pa.int64())]
        )

    # -- offsets -----------------------------------------------------------

    def initialOffset(self):
        return {"v": self.start_v - 1}

    def latestOffset(self):
        return {"v": _versions(self.path)[-1]}

    def commit(self, end):
        pass  # consumed state lives in the engine's checkpoint

    # -- planning / reading --------------------------------------------------

    def schema_ddl(self) -> str:
        return ", ".join(
            f"{f.name} {_ddl_of(f.type)}" for f in self._arrow_schema
        )

    def partitions(self, start, end):
        parts: list[_FeedFile] = []
        for v in range(int(start["v"]) + 1, int(end["v"]) + 1):
            m = _manifest(self.path, v)
            rels = m.get("changes") or []
            if not rels:
                # on a capture chain every commit stages a feed (no-op
                # commits stage an explicitly EMPTY one); a version
                # with NO feed lost it to a crash between the snapshot
                # and delta commits — refuse rather than silently skip
                # the version's rows (batch read_changes self-heals it)
                raise ValueError(
                    f"version {v} of {self.path} has no captured feed; "
                    "repair via batch read_changes (snapshot self-heal) "
                    "and restart the stream past it"
                )
            parts.extend(
                _FeedFile(os.path.join(self.path, rel), v) for rel in rels
            )
        return parts

    def read(self, partition):
        tbl = pq.read_table(partition.file_path)
        cols = []
        n = tbl.num_rows
        for f in self._arrow_schema:
            if f.name == "_commit_version":
                cols.append(pa.array([partition.version] * n, pa.int64()))
            elif f.name in tbl.column_names:
                cols.append(tbl.column(f.name).cast(f.type))
            else:
                # additive schema evolution: pre-evolution feed files
                # lack the added column — pad with nulls, same as the
                # batch span fold's allowMissingColumns
                cols.append(pa.nulls(n, f.type))
        extra = set(tbl.column_names) - {f.name for f in self._arrow_schema}
        if extra:
            raise ValueError(
                f"feed file {partition.file_path} carries columns "
                f"{sorted(extra)} unknown to the stream's pinned schema "
                "— restart the stream to pick up the evolved schema"
            )
        yield from pa.Table.from_arrays(
            cols, schema=self._arrow_schema
        ).to_batches()


class ChainChangesDataSource(DataSource):
    """``spark.dataSource.register(ChainChangesDataSource)`` then
    ``spark.readStream.format("chain_changes")
    .option("starting_version", 0).load(chain_path)``."""

    @classmethod
    def name(cls) -> str:
        return "chain_changes"

    def schema(self) -> str:
        return ChainChangesStreamReader(self.options).schema_ddl()

    def streamReader(self, schema):
        return ChainChangesStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ChainChangesDataSource)
