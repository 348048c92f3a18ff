"""Scale-factor amplifier for the driver's synthetic testdata.

Builds an sfN dataset by replicating an existing sf dir ``factor``
times with disjoint key ranges (copy ``i`` offsets every entity key by
``i * 10_000_000``) — each copy is a self-consistent TPC-H-ish shard,
so join fan-outs, group cardinalities, and per-entity series shapes
all scale linearly, which is exactly what a scaling CHECKPOINT needs
(SCALING.md): wall-time at factor×data should grow ≈linearly for every
registry plan that claims to be scale-safe.

Three deliberate decorrelations keep adversarial CROSS-COPY structure
out of the timing signal (they model fresh data, not 10
byte-identical corpora; within-copy structure is preserved exactly):
- ``documents.text``: every 8th token gets a per-copy suffix, so
  copies are not near-duplicates of each other (~half of all 4-gram
  shingles change) — without this, every dedup/linkage query's OUTPUT
  grows quadratically in the factor (measured: q129 36× at factor 10,
  purely from 45 cross-copy pairs per within-copy pair) and the
  checkpoint times output explosion, not plan behavior;
- ``events.ts``: copy ``i`` shifts forward by ``i × 31 days``, so
  per-hour event density stays CONSTANT (a longer collection period,
  the way event volume actually grows) — without this every
  (entity, hour) blocking key gets factor× denser and hub-cap
  excision deletes the whole graph (measured: q237 0.1× at factor
  10 — the benchmark measured an empty graph);
- ``embeddings.embedding`` shifts by ``i * 0.001`` per dimension, so
  top-k similarity outputs don't degenerate into exact-tie cliques.

Timestamps/strings/doubles are copied bit-exact via pyarrow (the
events table's timestamp encoding survives, which
``catalog.load`` adapts to by footer).

Usage: python tools/gen_scale.py SRC_DIR DST_DIR [factor]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: per-copy key offset — far above every key in the driver's sf0.1
OFFSET = 10_000_000

#: key columns to shift per table (everything else copies bit-exact)
KEY_COLS = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _copy(table: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return table
    out = table
    for col in KEY_COLS[name]:
        idx = out.schema.get_field_index(col)
        shifted = pc.add(out.column(col), pa.scalar(i * OFFSET, pa.int64()))
        out = out.set_column(idx, out.schema.field(idx), shifted.cast(out.schema.field(idx).type))
    if name == "documents":
        idx = out.schema.get_field_index("text")
        tag = f"cp{i}"
        # Tiered vocabulary remap (r12, the sf10 lesson): copies
        # 0..9 form ONE near-dup family tier; every block of 10
        # beyond that gets a per-tier suffix on EVERY token — fresh
        # content that shares no shingles with other tiers. Without
        # it, factor-100 amplification builds 100-strong near-dup
        # families: shared prefix tokens reach df=factor and the
        # LOSSLESS candidate join's collision count grows ~factor²
        # (measured: 1.24e9 collision rows / 75.7M candidates at
        # factor 100 vs 14.6M / 1.78M at factor 10). Real corpora
        # grow by ADDING content — vocabulary up ~sqrt(size), family
        # density constant — which the tier remap models; factor ≤ 10
        # output is bit-identical to the pre-r12 generator.
        tier = i // 10
        ttag = f"tr{tier}" if tier else ""
        texts = out.column("text").to_pylist()
        marked_texts = []
        for t in texts:
            words = t.split(" ")
            marked_texts.append(
                " ".join(
                    (w + tag if j % 8 == 7 else w) + ttag
                    for j, w in enumerate(words)
                )
            )
        out = out.set_column(
            idx, out.schema.field(idx), pa.array(marked_texts, pa.string())
        )
    if name == "events":
        idx = out.schema.get_field_index("ts")
        ts = out.column("ts").combine_chunks()
        unit = ts.type.unit
        per_day = {"s": 86400, "ms": 86400_000, "us": 86400_000_000,
                   "ns": 86400_000_000_000}[unit]
        shifted = pc.add(
            ts.cast(pa.int64()), pa.scalar(i * 31 * per_day, pa.int64())
        ).cast(ts.type)
        out = out.set_column(idx, out.schema.field(idx), shifted)
    if name == "embeddings":
        idx = out.schema.get_field_index("embedding")
        col = out.column("embedding").combine_chunks()
        flat = pc.add(col.flatten(), pa.scalar(i * 0.001, pa.float32()))
        rebuilt = pa.ListArray.from_arrays(col.offsets, flat.cast(pa.float32()))
        out = out.set_column(
            idx, out.schema.field(idx), rebuilt.cast(out.schema.field(idx).type)
        )
    return out


def amplify(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in KEY_COLS:
        table = pq.read_table(f"{src}/{name}.parquet")
        n = 1 if name in ("region", "nation") else factor
        copies = [_copy(table, name, i) for i in range(n)]
        merged = pa.concat_tables(copies)
        pq.write_table(merged, f"{dst}/{name}.parquet")
        print(f"{name}: {len(table)} -> {len(merged)}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    amplify(src, dst, factor)
