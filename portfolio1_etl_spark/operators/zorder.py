"""[ext] Z-order (Morton-curve) clustering for multi-column data
skipping — the lakehouse OPTIMIZE ZORDER BY primitive.

A single-column sort layout gives parquet min/max pruning on that one
column and nothing on the others; interleaving the bits of k column
ranks orders rows along a space-filling curve, so every file covers a
small HYPER-RECTANGLE of the key space and point/range predicates on
ANY of the k columns skip most files. This is the standard physical-
layout answer at 100 TB when two or three selective predicates share a
table and bucketing can serve only one of them.

Pieces:
- ``morton2`` / ``morton3``: pure-JVM bit interleave of 31-bit (2-D)
  or 21-bit (3-D) non-negative longs via the classic magic-mask spread
  sequence — five shift/AND steps per column, whole-stage-codegen
  friendly, no UDF.
- ``zorder_key``: normalization of arbitrary numeric columns into the
  interleave domain — ``linear`` min/max scaling (ONE tiny aggregate;
  the two scalars ride into the expression as literals) or
  ``quantile`` rank cells from a one-pass Greenwald–Khanna sketch,
  which keep cells evenly POPULATED under skew (a heavy-tailed column
  under linear scaling collapses into a few cells and stops pruning;
  under quantile boundaries every cell holds ~1/256 of the rows).
- ``write_zordered``: repartitionByRange on the z-key +
  sortWithinPartitions, so each output file owns a contiguous curve
  segment — the property min/max pruning feeds on.
- ``scan_fraction``: footer-stats prober (pyarrow) that measures the
  fraction of row groups a [lo, hi] predicate must read — the test
  harness for "did the layout actually buy skipping?".

Reference analogue: none — the reference's pandas script has no
physical-layout surface; [ext] per SURVEY §6.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) sequence spreading a 31-bit value onto even bit
#: positions (2-D interleave). Classic Morton magic numbers.
_SPREAD_2D = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

#: spread of a 21-bit value onto every third bit (3-D interleave).
_SPREAD_3D = (
    (32, 0x001F00000000FFFF),
    (16, 0x001F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)

#: bits per column by dimensionality (keeps the key in 63 signed bits)
_BITS = {2: 31, 3: 21}


def _spread(col: Column, seq) -> Column:
    out = col
    for shift, mask in seq:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def morton2(a: Column, b: Column) -> Column:
    """Interleave two 31-bit non-negative longs: bit i of ``a`` lands
    at position 2i, of ``b`` at 2i+1. Monotone per column within fixed
    other-column prefixes — the z-curve property."""
    return _spread(a, _SPREAD_2D).bitwiseOR(
        F.shiftleft(_spread(b, _SPREAD_2D), 1)
    )


def morton3(a: Column, b: Column, c: Column) -> Column:
    """Interleave three 21-bit non-negative longs onto bit positions
    3i / 3i+1 / 3i+2."""
    return (
        _spread(a, _SPREAD_3D)
        .bitwiseOR(F.shiftleft(_spread(b, _SPREAD_3D), 1))
        .bitwiseOR(F.shiftleft(_spread(c, _SPREAD_3D), 2))
    )


#: quantile-mode resolution: 256 rank buckets per dimension is plenty
#: for any realistic file count (a 65k-file layout still gets distinct
#: cells) while keeping the boundary array codegen-friendly.
_Q_BUCKETS = 256


def zorder_key(
    df: DataFrame, cols: list[str], boundaries: str = "linear"
) -> Column:
    """Z-order key expression over 2 or 3 numeric columns, then the
    Morton interleave. Two normalization modes:

    - ``linear`` (default): min/max scaling into the per-dimension bit
      budget — ONE 2k-scalar aggregate, zero sorts. Skewed columns get
      uneven cells (pruning degrades, never correctness).
    - ``quantile``: 255 approximate quantile boundaries per column
      (Greenwald–Khanna sketch — one pass, mergeable, the same
      machinery Delta's OPTIMIZE samples with); the bucket is the
      value's RANK CELL, so every cell holds ~1/256 of the rows no
      matter how skewed the distribution. The boundary lookup compiles
      to a codegen array-filter count, not a join.

    Bounds/boundaries are layout metadata, not data — driver-side
    scalars riding into the expression as literals. Constant columns
    collapse to bucket 0 (their bits carry no information either way)."""
    if len(cols) not in _BITS:
        raise ValueError("zorder_key supports exactly 2 or 3 columns")
    if boundaries not in ("linear", "quantile"):
        raise ValueError("boundaries must be 'linear' or 'quantile'")
    bits = _BITS[len(cols)]
    top = (1 << bits) - 1
    buckets = []
    if boundaries == "quantile":
        probes = [i / _Q_BUCKETS for i in range(1, _Q_BUCKETS)]
        all_qs = df.stat.approxQuantile(
            [c for c in cols], probes, 1.0 / (4 * _Q_BUCKETS)
        )
        for c, qs in zip(cols, all_qs):
            cuts = sorted(set(qs))
            if not cuts:
                buckets.append(F.lit(0).cast("long"))
                continue
            arr = F.array(*[F.lit(float(b)) for b in cuts])
            x = F.col(c).cast("double")
            rank_cell = F.size(F.filter(arr, lambda b: x >= b)).cast("long")
            # spread the rank cells across the FULL per-dimension bit
            # budget: a low-cardinality column would otherwise carry
            # its information in LOW bit positions only, and the
            # interleave's top splits would all land on the other
            # column (no pruning on this one).
            factor = top // (len(cuts) + 1)
            buckets.append(rank_cell * F.lit(factor))
        return (morton2 if len(cols) == 2 else morton3)(*buckets)
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    for c in cols:
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            buckets.append(F.lit(0).cast("long"))
        else:
            scaled = (F.col(c).cast("double") - F.lit(mn)) * (
                float(top) / (mx - mn)
            )
            buckets.append(
                F.least(F.floor(scaled).cast("long"), F.lit(top)).cast("long")
            )
    return (morton2 if len(cols) == 2 else morton3)(*buckets)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    boundaries: str = "linear",
) -> None:
    """Write ``df`` as parquet clustered along the z-curve of ``cols``:
    range-partition on the z-key (each task owns one contiguous curve
    segment → each FILE covers a small hyper-rectangle of the key
    space) and sort within partitions so ROW GROUPS inside a file stay
    tight too. At cluster scale this is the layout job you run once
    per table region; readers need no special support — parquet
    min/max stats do the skipping."""
    z = zorder_key(df, cols, boundaries=boundaries).alias("_z")
    (
        df.select("*", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def scan_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups under ``path`` whose [min, max] stats
    intersect [lo, hi] — what a stats-pruning scan must actually read.
    Footer-only (pyarrow); the measurement tool for layout quality."""
    import pyarrow.parquet as pq

    total = 0
    hit = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            total += 1
            if st is None or st.min is None:
                hit += 1  # no stats → must read
            elif not (st.max < lo or st.min > hi):
                hit += 1
    return hit / total if total else 0.0
