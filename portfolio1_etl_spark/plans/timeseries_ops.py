"""Time-series operators over the ``events`` table (r8) — the
resample / interpolate / rolling-statistic / sliding-distinct layer a
metrics or sensor corpus needs on top of the window family
(windows_events.py).

Scale shapes: every op here is one bucket aggregation (ONE shuffle on
(user, bucket)) plus narrow maps and bounded window frames over the
BUCKETED series — never a window over raw events. The spine
(gap-fill) derives from the bucketed aggregate's own min/max, so the
dense grid is |users| × |span-buckets| rows regardless of raw event
count; at 100 TB of events the bucketed series is the small artifact
(that is the point of resampling). The sliding distinct count uses
contribution expansion (each observation contributes to the k windows
it falls in, then ONE groupBy) because exact count-distinct window
frames don't exist in any scalable engine — the expansion is the
textbook shuffle-friendly form.

Reference analogue: none — the reference's pandas script has no
time-series surface; [ext] per SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.functions import dsum_money
from portfolio1_etl_spark.functions.exact import cents_of
from portfolio1_etl_spark.functions.numeric import zround
from portfolio1_etl_spark.plans.registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.load(spark, sf_dir, "events")


#: shared daily-revenue spine of the r9 series queries (q229-q231):
#: ONE fact shuffle down to day grain, exact integer cents.
_DAILY_CENTS_SQL = """d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1)"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(cents_of("o_totalprice")).alias("cents")
    )


def _bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly rollup — the shared first stage: ONE shuffle on
    (user_id, hour); decimal-cast value sum for float parity."""
    e = _events(spark, sf_dir)
    return e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum_money("value").alias("sum_value"),
    )


@query(
    "q154_gap_fill_resample",
    sql="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             count(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(min(h), max(h), INTERVAL 1 hour)) AS h
      FROM b GROUP BY user_id
    )
    SELECT s.user_id, s.h,
           coalesce(b.n_events, 0) AS n_events,
           coalesce(b.sum_value, 0.0) AS sum_value
    FROM spine s LEFT JOIN b ON s.user_id = b.user_id AND s.h = b.h
    """,
    operators=("X-resample", "X-gap-fill", "Stream-window"),
)
def q154_gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample-with-gap-fill: each user's event stream rolls up to an
    hourly series DENSE over the user's own [first, last] hour — empty
    hours surface as explicit zero rows (what every downstream
    rolling/ML window op needs; missing rows silently shrink frames).
    The spine generates from the BUCKETED aggregate's min/max via
    ``sequence``+``explode`` — never a driver-side range, never a scan
    of raw events — and joins back on (user, hour): grid size is
    users × span-hours however many raw events exist."""
    b = _bucketed(spark, sf_dir)
    spine = (
        b.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    return spine.join(b, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )


@query(
    "q155_linear_interpolate",
    sql="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(min(h), max(h), INTERVAL 1 hour)) AS h
      FROM b GROUP BY user_id
    ),
    grid AS (
      SELECT s.user_id, s.h, b.v
      FROM spine s LEFT JOIN b ON s.user_id = b.user_id AND s.h = b.h
    ),
    ctx AS (
      SELECT user_id, h, v,
        last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER w_prev AS prev_h,
        first_value(v IGNORE NULLS) OVER w_next AS next_v,
        first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER w_next AS next_h
      FROM grid
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, h,
      CASE
        WHEN v IS NOT NULL THEN v
        WHEN prev_v IS NULL THEN next_v
        WHEN next_v IS NULL THEN prev_v
        ELSE prev_v + (next_v - prev_v)
             * (CAST(date_diff('hour', prev_h, h) AS DOUBLE)
                / CAST(date_diff('hour', prev_h, next_h) AS DOUBLE))
      END AS v_interp,
      (v IS NULL) AS was_filled
    FROM ctx
    """,
    operators=("X-interpolate", "Window-nav", "X-gap-fill"),
)
def q155_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the gap-filled hourly grid: missing
    hours take ``prev + (next − prev) · Δ/span`` between the nearest
    real observations (edge gaps hold the single available neighbor —
    pandas ``interpolate(limit_direction='both')`` semantics). Two
    bounded window passes (last-non-null backward, first-non-null
    forward) over the BUCKETED grid — the classic scalable form; no
    self-join, no per-gap subquery. Exact-decimal bucket sums keep
    the float arithmetic bit-identical to the oracle."""
    b = _bucketed(spark, sf_dir).select(
        "user_id", "h", F.col("sum_value").alias("v")
    )
    spine = (
        b.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    grid = spine.join(b, ["user_id", "h"], "left")
    # Both context passes are RUNNING frames (unbounded-preceding →
    # current row): the forward pass ordered ascending, the "next"
    # pass ordered DESCENDING — never `first() over (current →
    # unbounded following)`, which Spark executes with the O(n²)
    # UnboundedFollowing frame (re-aggregating the tail per row;
    # measured 14s → 1s on the sf0.1 grid from this choice alone).
    # Cost is one extra in-partition sort, O(n log n).
    w_prev = (
        W.partitionBy("user_id").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("user_id")
        .orderBy(F.col("h").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    marked_h = F.when(F.col("v").isNotNull(), F.col("h"))
    ctx = grid.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(marked_h, ignorenulls=True).over(w_prev).alias("prev_h"),
        F.last("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.last(marked_h, ignorenulls=True).over(w_next).alias("next_h"),
    )
    hours = lambda a, b_: (F.unix_timestamp(b_) - F.unix_timestamp(a)) / F.lit(3600)
    frac = (
        hours(F.col("prev_h"), F.col("h")).cast("double")
        / hours(F.col("prev_h"), F.col("next_h")).cast("double")
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
        )
    )
    return ctx.select(
        "user_id",
        "h",
        interp.alias("v_interp"),
        F.col("v").isNull().alias("was_filled"),
    )


@query(
    "q156_rolling_median",
    sql="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, h,
           median(v) OVER (PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             AS median_5h,
           max(v) OVER (PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             AS max_5h
    FROM b
    """,
    operators=("X-rolling-stat", "Window-rangeframe", "A-percentile"),
)
def q156_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-bucket median (and max) per user over the hourly
    series — the robust smoother a metrics pipeline runs where a
    rolling MEAN would chase outliers. Exact ``percentile(0.5)`` as a
    window aggregate over a ROWS frame: the frame is ≤5 values, so
    exactness costs O(frame) per row with no sketch — the right
    trade at any scale BECAUSE the frame is bounded (the global-median
    analogue q34 uses the same exact form only in oracle mode). Even
    frames average the two middle values in both engines
    (interpolating median), which keeps the doubles bit-identical."""
    b = _bucketed(spark, sf_dir).select(
        "user_id", "h", F.col("sum_value").alias("v")
    )
    w = W.partitionBy("user_id").orderBy("h").rowsBetween(-4, 0)
    return b.select(
        "user_id",
        "h",
        F.expr("percentile(v, 0.5D)").over(w).alias("median_5h"),
        F.max("v").over(w).alias("max_5h"),
    )


@query(
    "q157_sliding_distinct_users",
    sql="""
    WITH ub AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
    ),
    contrib AS (
      SELECT user_id, h AS win FROM ub
      UNION ALL SELECT user_id, h + INTERVAL 1 hour FROM ub
      UNION ALL SELECT user_id, h + INTERVAL 2 hour FROM ub
    )
    SELECT win AS window_start, count(DISTINCT user_id) AS n_active_users
    FROM contrib GROUP BY win
    """,
    operators=("X-sliding-distinct", "Stream-window-slide", "A-distinct"),
)
def q157_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-hour distinct active users per hour — the sliding
    COUNT DISTINCT no engine supports as a window frame (distinct
    state can't fold incrementally). The scalable form is
    contribution expansion: each (user, hour) observation first
    DEDUPLICATES (one row per user-hour, the coarsest grain the
    answer needs), then contributes to the 3 windows covering it, and
    ONE groupBy counts distinct per window — shuffles bounded by
    |user×hour| × 3, never raw events, never a per-window set. The
    same shape scales to any window/slide ratio k with k union legs
    (or an explode over a sequence for large k)."""
    e = _events(spark, sf_dir)
    ub = e.select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).distinct()
    contrib = ub.select(
        "user_id",
        F.explode(
            F.array(
                F.col("h"),
                F.col("h") + F.expr("interval 1 hour"),
                F.col("h") + F.expr("interval 2 hour"),
            )
        ).alias("window_start"),
    )
    return contrib.groupBy("window_start").agg(
        F.count_distinct("user_id").alias("n_active_users")
    )


@query(
    "q178_ewma_activity",
    sql="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, h, n_events,
             row_number() OVER (PARTITION BY user_id ORDER BY h DESC) AS k
      FROM b
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_buckets,
           max(h) AS latest_h,
           sum(n_events * power(0.5, k)) AS ewma
    FROM r WHERE k <= 32 GROUP BY user_id
    """,
    operators=("X-ewma", "Window-rank", "A1"),
)
def q178_ewma_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of per-user hourly event
    rate (α = 0.5, truncated at the 32 most recent buckets — the
    dropped tail carries weight < 2⁻³², far under representable
    noise). The recurrence unrolls to a closed-form weighted sum, so
    no iterative state is needed: one shuffle to the hourly grain, one
    per-user window to index buckets from the latest backwards, one
    group-by. Bit-exact cross-engine WITHOUT rounding: α = 0.5 makes
    every term n·2⁻ᵏ an exact dyadic double and every partial sum
    exact (the common-denominator numerator stays ≪ 2⁵³), so ANY
    summation order produces the identical double — the reason α is
    not a tunable here; an α like 0.3 would reintroduce sum-order
    noise that only coarse rounding could mask."""
    b = _bucketed(spark, sf_dir).select("user_id", "h", "n_events")
    w = W.partitionBy("user_id").orderBy(F.desc("h"))
    r = b.withColumn("k", F.row_number().over(w)).filter(F.col("k") <= 32)
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("h").alias("latest_h"),
        F.sum(F.col("n_events") * F.pow(F.lit(0.5), F.col("k"))).alias(
            "ewma"
        ),
    )


@query(
    "q193_twap_daily",
    sql="""
    WITH seq AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(value AS DECIMAL(18,2)) AS v,
             CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT)
               AS dt_us
      FROM events
      WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id)
    )
    SELECT user_id, d,
           CAST(count(dt_us) AS BIGINT) AS n_intervals,
           round(CAST(sum(v * dt_us) AS DOUBLE)
                 / CAST(sum(dt_us) AS DOUBLE), 6) + 0.0 AS twap
    FROM seq WHERE dt_us IS NOT NULL
    GROUP BY user_id, d
    HAVING sum(dt_us) > 0
    """,
    operators=("X-twap", "Window-nav", "A1"),
)
def q193_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day): each observation
    holds until the next one, so its weight is the microsecond gap to
    the successor (the classic TWAP/VWAP sensor shape — an unweighted
    mean over-counts burst periods). The last observation of the day
    carries no interval and drops out; zero-span days (all events on
    one microsecond) drop via HAVING. Cross-engine exactness: decimal
    value × integer microsecond gap is exact decimal arithmetic, both
    sums are order-independent, and the single final division rounds
    once — no float accumulation anywhere. ONE shuffle on (user, day)
    serves the lead window and the aggregate."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.col("value").cast("decimal(18,2)").alias("v"),
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        seq.groupBy("user_id", "d")
        .agg(
            F.count("dt_us").alias("n_intervals"),
            zround(
                F.sum(F.col("v") * F.col("dt_us")).cast("double")
                / F.sum("dt_us").cast("double"),
                6,
            ).alias("twap"),
            F.sum("dt_us").alias("_span"),
        )
        .filter(F.col("_span") > 0)
        .drop("_span")
    )


# ---------------------------------------------------------------------------
# q229 — CUSUM change-point detection (r9)
# ---------------------------------------------------------------------------


@query(
    "q229_cusum_changepoint",
    sql=f"""
    WITH {_DAILY_CENTS_SQL},
    c AS (
      SELECT day, cents,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
             sum(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_k,
             CAST(count(*) OVER () AS BIGINT) AS n,
             sum(cents) OVER () AS s_n
      FROM d),
    stat AS (
      SELECT day, cents,
             CAST(n * s_k - k * s_n AS BIGINT) AS cusum_stat FROM c)
    SELECT day, cents, cusum_stat,
           CAST(CASE WHEN abs(cusum_stat) = max(abs(cusum_stat)) OVER ()
                THEN 1 ELSE 0 END AS BIGINT) AS is_changepoint
    FROM stat
    """,
    operators=("A1", "Window-frame", "X-cusum", "X-anomaly"),
)
def q229_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the daily revenue series: the
    scaled statistic D_k = n*S_k - k*S_n (the cumulative deviation from
    a constant-mean fit, multiplied through by n so it stays INTEGER —
    the float mean never appears), with the argmax |D_k| day flagged as
    the level-shift point. Every value is exact integer cents arithmetic
    in both engines; bounded to BIGINT up to ~sf1 (swap the products to
    a DECIMAL(38,0)/HUGEINT spine beyond). All windows run at DAY grain
    after the one fact-table shuffle."""
    d = _daily_cents(spark, sf_dir)
    wo = W.orderBy("day")
    c = d.select(
        "day",
        "cents",
        F.row_number().over(wo).cast("long").alias("k"),
        F.sum("cents")
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("s_k"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("long").alias("n"),
        F.sum("cents").over(W.partitionBy()).alias("s_n"),
    )
    stat = c.select(
        "day",
        "cents",
        (F.col("n") * F.col("s_k") - F.col("k") * F.col("s_n")).alias("cusum_stat"),
    )
    return stat.select(
        "day",
        "cents",
        "cusum_stat",
        F.when(
            F.abs(F.col("cusum_stat"))
            == F.max(F.abs(F.col("cusum_stat"))).over(W.partitionBy()),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_changepoint"),
    )


# ---------------------------------------------------------------------------
# q230 — autocorrelation function of the daily revenue series (r9)
# ---------------------------------------------------------------------------


@query(
    "q230_revenue_acf",
    sql=f"""
    WITH {_DAILY_CENTS_SQL},
    s AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
                 cents FROM d),
    lags AS (SELECT unnest(range(1, 8)) AS lag_k),
    pair AS (
      SELECT l.lag_k, a.cents AS x, b.cents AS y
      FROM lags l JOIN s a ON TRUE JOIN s b ON b.i = a.i + l.lag_k),
    agg AS (
      SELECT lag_k,
             CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
      FROM pair GROUP BY 1)
    SELECT CAST(lag_k AS BIGINT) AS lag_k,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                         * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) + 0.0
                ELSE NULL END AS acf
    FROM agg
    """,
    operators=("A-stats", "J2", "X-acf", "Window-rank"),
)
def q230_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily revenue series (the
    Pearson correlation of the series against its k-day shift),
    computed from EXACT integer-cents sums: every Σx, Σxy, Σx²
    accumulates in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), so the
    only float ops are the final casts, one sqrt per side, and one
    division — spelled as the identical expression tree in both
    engines, then zround (the q159 class: a flat series rounds to
    −0.0 without canonicalization). A zero-variance side (a lag group
    with one pair, or a constant series) yields NULL rather than 0/0 —
    Spark's ANSI mode throws on double division by zero where DuckDB
    returns NULL, so the guard is spelled in BOTH engines. The lag
    pairing is a day-grain self-join (the series is |days| rows
    regardless of fact volume); the 7-row lag dimension broadcasts."""
    d = _daily_cents(spark, sf_dir)
    s = d.select(
        F.row_number().over(W.orderBy("day")).cast("long").alias("i"),
        "cents",
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag_k"))
    a = s.select(F.col("i").alias("ia"), F.col("cents").alias("x"))
    b = s.select(F.col("i").alias("ib"), F.col("cents").alias("y"))
    pair = (
        a.join(F.broadcast(lags), F.lit(True))
        .join(b, F.col("ib") == F.col("ia") + F.col("lag_k"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = pair.groupBy("lag_k").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        F.col("lag_k").cast("long").alias("lag_k"),
        F.col("n").cast("long").alias("n_pairs"),
        F.when(
            (d1 > 0) & (d2 > 0),
            zround(
                num / (F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double"))), 6
            ),
        ).alias("acf"),
    )


# ---------------------------------------------------------------------------
# q231 — Holt linear-trend forecast, compile-time symbolic unroll (r9)
# ---------------------------------------------------------------------------

_HOLT_H = 16  #: window length (days); weights below are exact for this H
_HOLT_Q = 1 << 28  #: common dyadic denominator the weights are scaled by


def _holt_weights() -> tuple[list[int], list[int], list[int]]:
    """Unroll the Holt linear-trend recurrence SYMBOLICALLY at import
    time: with alpha = beta = 1/2 and the standard init (l_1 = x_1,
    b_1 = x_2 - x_1), level/trend/forecast after H steps are LINEAR in
    the window values with exact dyadic-rational coefficients. Running
    the recurrence over Fraction-valued unit vectors yields those
    coefficients exactly; scaling by the common denominator 2**28
    turns the whole operator into INTEGER arithmetic (order-independent
    in any engine, no float appears until one exact final division).
    The scaled dot product accumulates in DECIMAL(38,0)/HUGEINT —
    weight·cents terms reach ~2**62 at sf1 and would overflow BIGINT."""
    from fractions import Fraction

    H = _HOLT_H
    half = Fraction(1, 2)
    # l[i]/b[i] = coefficient of x_{i+1} in the current level/trend
    l = [Fraction(0)] * H
    b = [Fraction(0)] * H
    l[0] = Fraction(1)
    b[0], b[1] = Fraction(-1), Fraction(1)
    for t in range(1, H):
        x_t = [Fraction(1) if i == t else Fraction(0) for i in range(H)]
        new_l = [half * x_t[i] + half * (l[i] + b[i]) for i in range(H)]
        new_b = [half * (new_l[i] - l[i]) + half * b[i] for i in range(H)]
        l, b = new_l, new_b
    scale = lambda ws: [int(w * _HOLT_Q) for w in ws]  # noqa: E731
    for w in l + b:
        assert (w * _HOLT_Q).denominator == 1, "non-dyadic Holt weight"
    return scale(l), scale(b), scale([l[i] + b[i] for i in range(H)])


_HOLT_WL, _HOLT_WB, _HOLT_WF = _holt_weights()


def _holt_sql_arr(ws: list[int]) -> str:
    return "[" + ", ".join(f"CAST({w} AS HUGEINT)" for w in ws) + "]"


@query(
    "q231_holt_forecast",
    sql=f"""
    WITH {_DAILY_CENTS_SQL},
    w AS (
      SELECT cents,
             row_number() OVER (ORDER BY day DESC) AS rn
      FROM d QUALIFY rn <= {_HOLT_H}),
    ix AS (SELECT cents, CAST({_HOLT_H + 1} - rn AS INT) AS t FROM w),
    s AS (
      SELECT sum(({_holt_sql_arr(_HOLT_WL)})[t] * CAST(cents AS HUGEINT)) AS sl,
             sum(({_holt_sql_arr(_HOLT_WB)})[t] * CAST(cents AS HUGEINT)) AS sb,
             sum(({_holt_sql_arr(_HOLT_WF)})[t] * CAST(cents AS HUGEINT)) AS sf,
             CAST(count(*) AS BIGINT) AS n_days
      FROM ix)
    SELECT n_days,
           CASE WHEN n_days = {_HOLT_H}
                THEN CAST(sl AS DOUBLE) / {_HOLT_Q} END AS level_cents,
           CASE WHEN n_days = {_HOLT_H}
                THEN CAST(sb AS DOUBLE) / {_HOLT_Q} END AS trend_cents,
           CASE WHEN n_days = {_HOLT_H}
                THEN CAST(sf AS DOUBLE) / {_HOLT_Q} END AS forecast_cents
    FROM s
    """,
    operators=("A1", "Window-rank", "X-holt-forecast", "X-ewma"),
)
def q231_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead Holt linear-trend forecast of daily revenue over
    the trailing 16-day window. The recurrence is unrolled at COMPILE
    time into exact integer weights (see _holt_weights): the query
    itself is one day-grain aggregate, a 16-row rank filter, and ONE
    integer dot product — no iteration, no UDF, no state. The only
    float ops are the final exact-integer→DOUBLE casts (correctly
    rounded, identical in both engines) and an exact division by
    2**28. Weight
    lookup is element_at on a literal array — a constant-folded
    expression, not a join. A series SHORTER than the window emits
    NULL fits (the fixed weight vector would silently mis-weight a
    short history's tail positions; refusing is the honest answer,
    and n_days says why)."""
    d = _daily_cents(spark, sf_dir)
    rn = F.row_number().over(W.orderBy(F.col("day").desc()))
    ix = (
        d.select("cents", rn.alias("rn"))
        .filter(F.col("rn") <= _HOLT_H)
        .select("cents", (F.lit(_HOLT_H + 1) - F.col("rn")).cast("int").alias("t"))
    )
    arr = lambda ws: F.array(  # noqa: E731
        *[F.lit(w).cast("decimal(38,0)") for w in ws]
    )
    cents_dec = F.col("cents").cast("decimal(38,0)")
    s = ix.agg(
        F.sum(F.element_at(arr(_HOLT_WL), F.col("t")) * cents_dec).alias("sl"),
        F.sum(F.element_at(arr(_HOLT_WB), F.col("t")) * cents_dec).alias("sb"),
        F.sum(F.element_at(arr(_HOLT_WF), F.col("t")) * cents_dec).alias("sf"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    full = F.col("n_days") == _HOLT_H
    return s.select(
        "n_days",
        F.when(full, F.col("sl").cast("double") / _HOLT_Q).alias("level_cents"),
        F.when(full, F.col("sb").cast("double") / _HOLT_Q).alias("trend_cents"),
        F.when(full, F.col("sf").cast("double") / _HOLT_Q).alias("forecast_cents"),
    )


# ---------------------------------------------------------------------------
# q236 — rolling-origin Holt backtest (r9)
# ---------------------------------------------------------------------------

_BT_ORIGINS = 8  #: how many trailing days are scored out-of-sample


@query(
    "q236_holt_backtest",
    sql=f"""
    WITH {_DAILY_CENTS_SQL},
    s AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
                 day, cents FROM d),
    nmax AS (SELECT max(i) AS n FROM s),
    o AS (
      SELECT s.i AS oi, s.day, s.cents AS actual_cents
      FROM s CROSS JOIN nmax
      WHERE s.i > nmax.n - {_BT_ORIGINS}),
    win AS (
      SELECT o.oi, o.day, o.actual_cents,
             sum(({_holt_sql_arr(_HOLT_WF)})[CAST(s.i - o.oi + {_HOLT_H + 1}
                                             AS INT)]
                 * CAST(s.cents AS HUGEINT)) AS sf,
             count(*) AS n_win
      FROM o JOIN s
        ON s.i >= o.oi - {_HOLT_H} AND s.i <= o.oi - 1
      GROUP BY 1, 2, 3),
    f AS (
      SELECT day, CAST(actual_cents AS BIGINT) AS actual_cents,
             CASE WHEN n_win = {_HOLT_H}
                  THEN CAST(sf AS DOUBLE) / {_HOLT_Q} END AS forecast_cents
      FROM win)
    SELECT day, actual_cents, forecast_cents,
           abs(forecast_cents - actual_cents) AS abs_err_cents
    FROM f
    """,
    operators=("J-range", "A1", "X-holt-backtest", "Window-rank"),
)
def q236_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the q231 Holt forecaster: for each of
    the last 8 days, the one-step-ahead forecast from the 16 days
    before it, next to the realized value and the absolute error —
    the honest way to put an error bar on a forecasting operator
    without ever iterating (each origin is the SAME compile-time
    integer dot product, shifted). Origins with an incomplete window
    emit NULL (the q231 rule). The range join is an 8-row origin spec
    against the day-grain series — bounded by construction; the
    forecast is exact dyadic arithmetic so the error column is
    deterministic to the bit."""
    d = _daily_cents(spark, sf_dir)
    s = d.select(
        F.row_number().over(W.orderBy("day")).cast("long").alias("i"),
        "day",
        "cents",
    )
    nmax = s.agg(F.max("i").alias("n"))
    o = (
        s.join(F.broadcast(nmax), F.lit(True))
        .filter(F.col("i") > F.col("n") - _BT_ORIGINS)
        .select(
            F.col("i").alias("oi"),
            "day",
            F.col("cents").alias("actual_cents"),
        )
    )
    sw = s.select(F.col("i").alias("wi"), F.col("cents").alias("wc"))
    t = (F.col("wi") - F.col("oi") + (_HOLT_H + 1)).cast("int")
    wf_arr = F.array(*[F.lit(w).cast("decimal(38,0)") for w in _HOLT_WF])
    win = (
        F.broadcast(o)
        .join(
            sw,
            (F.col("wi") >= F.col("oi") - _HOLT_H)
            & (F.col("wi") <= F.col("oi") - 1),
        )
        .groupBy("oi", "day", "actual_cents")
        .agg(
            F.sum(
                F.element_at(wf_arr, t) * F.col("wc").cast("decimal(38,0)")
            ).alias("sf"),
            F.count(F.lit(1)).alias("n_win"),
        )
    )
    forecast = F.when(
        F.col("n_win") == _HOLT_H, F.col("sf").cast("double") / _HOLT_Q
    )
    return win.select(
        "day",
        F.col("actual_cents").cast("long").alias("actual_cents"),
        forecast.alias("forecast_cents"),
        F.abs(forecast - F.col("actual_cents")).alias("abs_err_cents"),
    )


# ---------------------------------------------------------------------------
# q275 — split-conformal forecast interval (r11)
# ---------------------------------------------------------------------------


@query(
    "q275_conformal_interval",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_cents
      FROM orders GROUP BY 1),
    pred AS (
      SELECT d, rev_cents,
             lag(rev_cents, 7) OVER (ORDER BY d) AS yhat_cents
      FROM daily),
    resid AS (
      SELECT d, abs(rev_cents - yhat_cents) AS ar,
             row_number() OVER (ORDER BY d) AS rnk,
             count(*) OVER () AS n_r
      FROM pred WHERE yhat_cents IS NOT NULL),
    marked AS (
      SELECT *, CAST(ceil(0.7 * n_r) AS BIGINT) AS n_cal FROM resid),
    cal AS (SELECT * FROM marked WHERE rnk <= n_cal),
    qpick AS (
      SELECT ar AS qhat_cents FROM (
        SELECT ar, n_cal,
               row_number() OVER (ORDER BY ar, rnk) AS qr
        FROM cal)
      WHERE qr = least(CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT), n_cal)),
    test AS (SELECT * FROM marked WHERE rnk > n_cal)
    SELECT CAST(max(t.n_cal) AS BIGINT) AS n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           round(CAST(max(q.qhat_cents) AS DOUBLE) / 100.0, 2) AS qhat,
           round(CAST(sum(CASE WHEN t.ar <= q.qhat_cents
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS coverage,
           round(2.0 * max(q.qhat_cents) / 100.0, 2) AS interval_width
    FROM test t CROSS JOIN qpick q
    """,
    operators=("X-conformal", "X-forecast-eval", "W-lag", "A1"),
)
def q275_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for the daily-revenue
    forecast — the distribution-free calibration layer that turns ANY
    point forecaster (here the seasonal-naive lag-7, q231/q236's
    baseline) into an interval with a finite-sample coverage
    guarantee: the first 70% of residual days calibrate q̂ = the
    ⌈0.9·(n+1)⌉-th smallest absolute residual (the EXACT order
    statistic, picked by row_number with a date tie-break — never an
    interpolating percentile, whose float interpolation the two
    engines round differently), and the held-out 30% reports
    empirical coverage of ŷ ± q̂. The integer-cents spine (q193)
    makes every residual exact, so rank order is bit-deterministic.
    Scale shape: one shuffle to day grain, then all windows run at
    DAY grain (≤ tens of thousands of rows at any corpus size — the
    date-domain bound, not the fact-table bound, prices the sort);
    the one-row q̂ broadcast-joins back onto the test days."""
    o = catalog.load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "rev_cents"
        )
    )
    wd = W.orderBy("d")
    pred = daily.select(
        "d", "rev_cents", F.lag("rev_cents", 7).over(wd).alias("yhat_cents")
    ).filter(F.col("yhat_cents").isNotNull())
    resid = pred.select(
        "d",
        F.abs(F.col("rev_cents") - F.col("yhat_cents")).alias("ar"),
        F.row_number().over(wd).alias("rnk"),
    )
    n_r = resid.agg(F.count(F.lit(1)).alias("n_r"))
    marked = resid.crossJoin(F.broadcast(n_r)).withColumn(
        "n_cal", F.ceil(0.7 * F.col("n_r")).cast("long")
    )
    cal = marked.filter(F.col("rnk") <= F.col("n_cal"))
    qpick = (
        cal.withColumn(
            "qr",
            F.row_number().over(W.orderBy(F.col("ar"), F.col("rnk"))),
        )
        .filter(
            F.col("qr")
            == F.least(
                F.ceil(0.9 * (F.col("n_cal") + 1)).cast("long"),
                F.col("n_cal"),
            )
        )
        .select(F.col("ar").alias("qhat_cents"))
    )
    test = marked.filter(F.col("rnk") > F.col("n_cal"))
    return test.crossJoin(F.broadcast(qpick)).agg(
        F.max("n_cal").cast("long").alias("n_cal"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.round(F.max("qhat_cents").cast("double") / 100.0, 2).alias("qhat"),
        F.round(
            F.sum(
                F.when(F.col("ar") <= F.col("qhat_cents"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
        F.round(2.0 * F.max("qhat_cents") / 100.0, 2).alias("interval_width"),
    )


# ---------------------------------------------------------------------------
# q285 — forecast-accuracy evaluation board (r11)
# ---------------------------------------------------------------------------


@query(
    "q285_forecast_eval",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rc
      FROM orders GROUP BY 1),
    lagged AS (
      SELECT d, rc,
             lag(rc, 1) OVER (ORDER BY d) AS l1,
             lag(rc, 7) OVER (ORDER BY d) AS l7,
             sum(rc) OVER (ORDER BY d
                           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s7,
             count(rc) OVER (ORDER BY d
                             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS c7
      FROM daily),
    ev AS (
      SELECT abs(rc - l1) AS e_n1,
             abs(rc - l7) AS e_s7,
             abs(7 * rc - s7) AS e_ma7
      FROM lagged WHERE l7 IS NOT NULL AND c7 = 7),
    sums AS (
      SELECT count(*) AS n, sum(e_n1) AS sn1, sum(e_s7) AS ss7,
             sum(e_ma7) AS sma7
      FROM ev)
    SELECT 'naive-1' AS model, CAST(n AS BIGINT) AS n_days,
           round(CAST(sn1 AS DOUBLE) / n / 100.0, 4) AS mae,
           round(CAST(sn1 AS DOUBLE) / sn1, 6) AS mase
    FROM sums
    UNION ALL
    SELECT 'seasonal-naive-7', CAST(n AS BIGINT),
           round(CAST(ss7 AS DOUBLE) / n / 100.0, 4),
           round(CAST(ss7 AS DOUBLE) / sn1, 6)
    FROM sums
    UNION ALL
    SELECT 'moving-average-7', CAST(n AS BIGINT),
           round(CAST(sma7 AS DOUBLE) / n / 700.0, 4),
           round(CAST(sma7 AS DOUBLE) / (7.0 * sn1), 6)
    FROM sums
    """,
    operators=("X-forecast-eval", "X-mase", "W-lag", "W-frame"),
)
def q285_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy board — the model-selection readout that sits
    in front of q231/q236 (Holt) and q275 (conformal): three baseline
    forecasters of daily revenue (naive lag-1, seasonal-naive lag-7,
    trailing 7-day moving average) scored with MAE and MASE on the
    same aligned day set. The integer discipline makes the board
    hashable where the textbook formulas are not: residuals live on
    the exact cents spine, the moving-average residual is SCALED BY 7
    (7·y − Σ7 — an integer, where y − Σ7/7 would be an
    order-dependent float), sMAPE is deliberately absent (a per-day
    rational fold neither engine pins — the q274 one-fold-refused
    rule), and MASE is a single division of two exact integer sums.
    Day-grain windows (date-domain bounded); one shuffle to day
    grain. Scale: identical at any corpus size — the day domain is
    the working set."""
    o = catalog.load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("rc")
    )
    wd = W.orderBy("d")
    w7 = wd.rowsBetween(-7, -1)
    lagged = daily.select(
        "rc",
        F.lag("rc", 1).over(wd).alias("l1"),
        F.lag("rc", 7).over(wd).alias("l7"),
        F.sum("rc").over(w7).alias("s7"),
        F.count("rc").over(w7).alias("c7"),
    )
    ev = lagged.filter(F.col("l7").isNotNull() & (F.col("c7") == 7)).select(
        F.abs(F.col("rc") - F.col("l1")).alias("e_n1"),
        F.abs(F.col("rc") - F.col("l7")).alias("e_s7"),
        F.abs(7 * F.col("rc") - F.col("s7")).alias("e_ma7"),
    )
    sums = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("e_n1").alias("sn1"),
        F.sum("e_s7").alias("ss7"),
        F.sum("e_ma7").alias("sma7"),
    )
    def _row(model, s_col, mae_den, mase_expr):
        return sums.select(
            F.lit(model).alias("model"),
            F.col("n").cast("long").alias("n_days"),
            F.round(F.col(s_col).cast("double") / F.col("n") / mae_den, 4).alias(
                "mae"
            ),
            F.round(mase_expr, 6).alias("mase"),
        )

    return (
        _row(
            "naive-1", "sn1", 100.0,
            F.col("sn1").cast("double") / F.col("sn1"),
        )
        .unionByName(
            _row(
                "seasonal-naive-7", "ss7", 100.0,
                F.col("ss7").cast("double") / F.col("sn1"),
            )
        )
        .unionByName(
            _row(
                "moving-average-7", "sma7", 700.0,
                F.col("sma7").cast("double") / (F.lit(7.0) * F.col("sn1")),
            )
        )
    )
