"""Stats-driven join-strategy advisor — ANALYZE feeding planning.

``collect_table_stats`` (operators/stats.py, q138) produces row counts
and per-column NDV, but until r8 nothing consumed them: broadcast
choice and skew handling leaned entirely on AQE's runtime defaults.
This module closes the loop the way a warehouse planner does —
row-count × estimated row width against a broadcast threshold, NDV
against a skew heuristic — and can APPLY the advice as join hints.

Why not just trust AQE? AQE re-plans from runtime shuffle statistics,
which means the first shuffle of both sides is already paid before a
broadcast demotion can happen. Stats-driven advice moves the decision
BEFORE the first execution: a 100 TB fact never shuffles at all when
ANALYZE already knows the dim side fits under the threshold. AQE then
remains the safety net for estimate drift, not the primary planner.

Width estimates are PLANNING estimates (fixed bytes per type, a
documented default for strings), not storage truth — the same
compromise Spark's own ``SizeEstimator``/CBO statistics make. The
consumer calibrates ``string_width``/threshold per corpus if the
defaults misfit.

Outer-join legality is baked in (the q10/q42 lesson, VERDICT r7):
Spark cannot broadcast the row-preserved side of an outer join — a
hint there is silently dropped with a HintErrorLogger WARN — so the
advisor never proposes one: left joins may only broadcast the right
side, right joins the left, full outer neither.

Reference analogue: none — the reference is a single-process pandas
script (portfolio-etl.py) that joins in memory; join strategy is a
distributed-engine concern. [ext] surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: planning width (bytes) by Spark simpleString dtype; strings use
#: ``string_width`` (default below), unknown complex types _DEFAULT_WIDTH
_TYPE_WIDTHS = {
    "tinyint": 1,
    "smallint": 2,
    "int": 4,
    "integer": 4,
    "bigint": 8,
    "long": 8,
    "float": 4,
    "double": 8,
    "boolean": 1,
    "date": 4,
    "timestamp": 8,
    "timestamp_ntz": 8,
}
_STRING_WIDTH = 20
_DEFAULT_WIDTH = 32
BROADCAST_THRESHOLD_BYTES = 10 * 1024 * 1024  # Spark's own default
SKEW_FACTOR = 16.0  # avg key multiplicity above this flags skew risk

#: which sides may legally broadcast per join type (preserved sides
#: cannot — Spark drops the hint with a WARN)
_BROADCASTABLE = {
    "inner": ("left", "right"),
    "cross": ("left", "right"),
    "left": ("right",),
    "left_outer": ("right",),
    "leftouter": ("right",),
    "left_semi": ("right",),
    "leftsemi": ("right",),
    "left_anti": ("right",),
    "leftanti": ("right",),
    "right": ("left",),
    "right_outer": ("left",),
    "rightouter": ("left",),
    "full": (),
    "full_outer": (),
    "fullouter": (),
    "outer": (),
}


def estimate_row_width(df: DataFrame, string_width: int = _STRING_WIDTH) -> int:
    """Planning estimate of one row's bytes from the schema alone."""
    width = 0
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if s == "string":
            width += string_width
        elif s == "binary":
            width += 64
        elif s.startswith("decimal"):
            width += 16
        else:
            width += _TYPE_WIDTHS.get(s, _DEFAULT_WIDTH)
    return width


def join_advice_frame(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
    broadcast_threshold_bytes: int = BROADCAST_THRESHOLD_BYTES,
    skew_factor: float = SKEW_FACTOR,
    exact_ndv: bool = False,
    names: tuple[str, str] = ("left", "right"),
) -> DataFrame:
    """ONE-ROW advice frame for a prospective equi-join, computed
    entirely as a lazy plan: each side contributes a single-row
    aggregate (count + key NDV — one scan, the q138 shape), the two
    cross-join (1×1), and the strategy/skew columns are pure
    expressions. Columns: left_table, right_table, left_rows,
    right_rows, left_bytes, right_bytes, strategy
    (broadcast_left | broadcast_right | sort_merge), skew_side
    (left | right | both | none).

    ``exact_ndv=True`` is the oracle form (q153); production uses the
    HLL sketch — identical plan shape, ±2% NDV, and the consumer is a
    threshold comparison where 2% never flips a sane configuration."""
    ndv = F.count_distinct if exact_ndv else F.approx_count_distinct

    def side(df: DataFrame, key: str, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias(f"{tag}_rows"),
            ndv(F.col(key)).cast("long").alias(f"{tag}_ndv"),
        )

    lw = estimate_row_width(left)
    rw = estimate_row_width(right)
    prof = side(left, left_key, "left").crossJoin(side(right, right_key, "right"))
    lb = (F.col("left_rows") * F.lit(lw)).cast("long")
    rb = (F.col("right_rows") * F.lit(rw)).cast("long")
    allowed = _BROADCASTABLE.get(how.lower().replace(" ", ""))
    if allowed is None:
        raise ValueError(f"unknown join type {how!r}")
    thr = F.lit(broadcast_threshold_bytes).cast("long")
    can_l = F.lit("left" in allowed) & (lb <= thr)
    can_r = F.lit("right" in allowed) & (rb <= thr)
    strategy = (
        # both under threshold: broadcast the smaller legal side
        F.when(can_l & can_r & (lb <= rb), F.lit("broadcast_left"))
        .when(can_l & can_r, F.lit("broadcast_right"))
        .when(can_l, F.lit("broadcast_left"))
        .when(can_r, F.lit("broadcast_right"))
        .otherwise(F.lit("sort_merge"))
    )
    skew_l = F.col("left_rows") / F.greatest(F.col("left_ndv"), F.lit(1)) > F.lit(
        skew_factor
    )
    skew_r = F.col("right_rows") / F.greatest(F.col("right_ndv"), F.lit(1)) > F.lit(
        skew_factor
    )
    skew = (
        F.when(skew_l & skew_r, F.lit("both"))
        .when(skew_l, F.lit("left"))
        .when(skew_r, F.lit("right"))
        .otherwise(F.lit("none"))
    )
    return prof.select(
        F.lit(names[0]).alias("left_table"),
        F.lit(names[1]).alias("right_table"),
        F.col("left_rows"),
        F.col("right_rows"),
        lb.alias("left_bytes"),
        rb.alias("right_bytes"),
        strategy.alias("strategy"),
        skew.alias("skew_side"),
    )


def advise_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
    broadcast_threshold_bytes: int = BROADCAST_THRESHOLD_BYTES,
    skew_factor: float = SKEW_FACTOR,
    exact_ndv: bool = False,
) -> dict:
    """Driver-side advice dict (the collect is ONE planner-metadata
    row — the sanctioned kind of collect): keys as in
    ``join_advice_frame`` plus nothing else. Use ``apply_join_advice``
    to act on it."""
    row = join_advice_frame(
        left,
        right,
        left_key,
        right_key,
        how,
        broadcast_threshold_bytes,
        skew_factor,
        exact_ndv,
    ).collect()[0]
    return row.asDict()


#: cap on the non-skewed side's estimated bytes before the advisor
#: routes a skewed sort-merge join through salting — the salted join
#: replicates that side n_salts times through the shuffle, so the
#: cost is n_salts x this bound (vs. an unbounded hot partition)
SALT_OTHER_SIDE_MAX_BYTES = 256 * 1024 * 1024


def apply_join_advice(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    advice: dict | None = None,
    n_salts: int = 8,
    salt_other_side_max_bytes: int = SALT_OTHER_SIDE_MAX_BYTES,
    **advise_kwargs,
) -> DataFrame:
    """Equi-join on the shared column ``on`` with the advised strategy
    applied: the advised broadcast side wraps in ``F.broadcast``
    (legal by construction — the advisor never proposes a
    preserved-side broadcast). A ``sort_merge`` verdict with ONE
    skew-flagged side on an INNER join routes through
    ``operators.joins.salted_join`` when the other side's estimated
    bytes fit the replication budget — the stats-driven form of skew
    mitigation that acts BEFORE the first shuffle (AQE's skew split
    only reacts to runtime partition sizes, after the hot partition
    has already been written). Outer joins and both-sides-skewed
    stay plain sort-merge under AQE (salting replicates one side,
    which breaks outer multiplicity and helps nothing when both
    sides are hot). ``advice=None`` computes it first (two
    single-row aggregate scans). Catalyst still owns the physical
    plan; the advisor only moves the default."""
    if advice is None:
        advice = advise_join(left, right, on, on, how, **advise_kwargs)
    strategy = advice["strategy"]
    if strategy == "broadcast_left":
        left = F.broadcast(left)
    elif strategy == "broadcast_right":
        right = F.broadcast(right)
    elif how.lower() in ("inner",) and advice.get("skew_side") in (
        "left",
        "right",
    ):
        skewed_is_left = advice["skew_side"] == "left"
        other_bytes = advice.get(
            "right_bytes" if skewed_is_left else "left_bytes"
        )
        if other_bytes is not None and other_bytes <= salt_other_side_max_bytes and _saltable(
            left, right, on
        ):
            from portfolio1_etl_spark.operators.joins import salted_join

            big, small = (left, right) if skewed_is_left else (right, left)
            joined = salted_join(big, small, on, n_salts=n_salts, how="inner")
            # restore the caller's column order (salted_join leads
            # with the big side)
            want = (
                [on]
                + [c for c in left.columns if c != on]
                + [c for c in right.columns if c != on]
            )
            return joined.select(*want)
    return left.join(right, on, how)


def _saltable(left: DataFrame, right: DataFrame, on: str) -> bool:
    """Whether the salted rewrite accepts these frames — the plain
    sort-merge join is the fallback whenever it would not, so the
    stats-triggered routing can never REJECT an input the plain join
    accepts: salting hashes every big-side column (Spark's hash()
    rejects MapType), claims the `_salt` name, and re-projects by
    name (ambiguous under shared non-key column names)."""
    cols = left.columns + right.columns
    if "_salt" in cols:
        return False
    shared = set(left.columns) & set(right.columns)
    if shared != {on}:
        return False
    return not any(
        f.dataType.simpleString().startswith("map<")
        for df in (left, right)
        for f in df.schema.fields
    )
