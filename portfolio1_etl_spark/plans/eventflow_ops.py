"""Event-flow analytics over the ``events`` table (r8): activity
gaps-and-islands and marketing-touch revenue attribution — the
session-adjacent shapes a product-analytics workload runs daily.

Scale shapes: both queries aggregate raw events down to a per-user
daily / per-event-window artifact with ONE shuffle on ``user_id``
before any window runs — windows execute over the user's own (small)
ordered slice, never a global sort. The attribution lookup uses a
running ``last(..., ignorenulls)`` frame (linear per partition) plus a
broadcast-joined per-user first-touch aggregate; no self-join of the
event stream against itself.

Reference analogue: none — the reference's pandas script has no event
analytics; [ext] per SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.functions import dsum_money
from portfolio1_etl_spark.functions.numeric import zround
from portfolio1_etl_spark.plans.registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.load(spark, sf_dir, "events")


@query(
    "q175_activity_islands",
    sql="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    anchored AS (
      SELECT user_id, d, n_events,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM daily
    )
    SELECT user_id,
           min(d) AS island_start,
           max(d) AS island_end,
           CAST(count(*) AS BIGINT) AS island_days,
           CAST(sum(n_events) AS BIGINT) AS n_events
    FROM anchored GROUP BY user_id, anchor
    """,
    operators=("X-gaps-islands", "Window-rank", "A1"),
)
def q175_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's active DAYS into maximal
    runs of consecutive days (an "island" of activity), one row per
    island with its span and event volume. The classic anchor trick —
    ``day - row_number()`` is constant within a consecutive run — turns
    island detection into a plain group-by: one shuffle to the daily
    grain, one user-partitioned window over the (tiny) per-user day
    list, one group-by on the anchor. Never a self-join, never a
    global sort; at 100 TB the daily grain is the small artifact."""
    daily = (
        _events(spark, sf_dir)
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = W.partitionBy("user_id").orderBy("d")
    anchored = daily.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return anchored.groupBy("user_id", "anchor").agg(
        F.min("d").alias("island_start"),
        F.max("d").alias("island_end"),
        F.count(F.lit(1)).alias("island_days"),
        F.sum("n_events").alias("n_events"),
    ).drop("anchor")


@query(
    "q176_touch_attribution",
    sql="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
        last_value(CASE WHEN event_type IN ('click', 'view')
                        THEN event_type END IGNORE NULLS)
          OVER w AS lt_type,
        last_value(CASE WHEN event_type IN ('click', 'view')
                        THEN ts END IGNORE NULLS)
          OVER w AS lt_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    purchases AS (
      SELECT user_id, value,
        CASE WHEN lt_ts IS NOT NULL
                  AND lt_ts >= ts - INTERVAL 7 DAY THEN lt_type
             ELSE 'unattributed' END AS last_channel
      FROM tagged WHERE event_type = 'purchase'
    ),
    first_touch AS (
      SELECT user_id, event_type AS ft_type FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type IN ('click', 'view')
      ) WHERE rn = 1
    ),
    lt AS (
      SELECT last_channel AS channel,
             CAST(count(*) AS BIGINT) AS n_last,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue_last
      FROM purchases GROUP BY 1
    ),
    ft AS (
      SELECT coalesce(f.ft_type, 'unattributed') AS channel,
             CAST(count(*) AS BIGINT) AS n_first,
             CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue_first
      FROM purchases p LEFT JOIN first_touch f USING (user_id)
      GROUP BY 1
    )
    SELECT coalesce(lt.channel, ft.channel) AS channel,
           coalesce(n_last, 0) AS n_last,
           coalesce(revenue_last, 0.0) AS revenue_last,
           coalesce(n_first, 0) AS n_first,
           coalesce(revenue_first, 0.0) AS revenue_first
    FROM lt FULL OUTER JOIN ft ON lt.channel = ft.channel
    """,
    operators=("X-attribution", "Window-nav", "J-full", "A1"),
)
def q176_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-touch revenue attribution, two models side by side:
    LAST-touch (most recent click/view strictly before the purchase,
    within a 7-day lookback, else 'unattributed') and FIRST-touch (the
    user's earliest click/view ever). Last-touch rides one running
    ``last(..., ignorenulls)`` frame per user — the 7-day constraint is
    applied AFTER the frame so the frame stays ROWS-bounded and
    tie-stable on (ts, event_id) (a RANGE frame over equal timestamps
    is engine-dependent in which peer it surfaces). First-touch is a
    per-user ``min_by`` aggregate joined back — at scale that side is
    |users| rows, broadcast-sized relative to the event stream."""
    e = _events(spark, sf_dir)
    touch = F.col("event_type").isin("click", "view")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    tagged = e.select(
        "user_id",
        "ts",
        "value",
        "event_type",
        F.last(F.when(touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("lt_type"),
        F.last(F.when(touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("lt_ts"),
    )
    purchases = tagged.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "value",
        F.when(
            F.col("lt_ts").isNotNull()
            & (F.col("lt_ts") >= F.col("ts") - F.expr("interval 7 days")),
            F.col("lt_type"),
        )
        .otherwise(F.lit("unattributed"))
        .alias("last_channel"),
    )
    first_touch = (
        e.filter(touch)
        .groupBy("user_id")
        .agg(
            F.min_by("event_type", F.struct("ts", "event_id")).alias("ft_type")
        )
    )
    lt = purchases.groupBy(F.col("last_channel").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_last"),
        dsum_money("value").alias("revenue_last"),
    )
    ft = (
        purchases.join(F.broadcast(first_touch), "user_id", "left")
        .groupBy(
            F.coalesce(F.col("ft_type"), F.lit("unattributed")).alias(
                "channel"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_first"),
            dsum_money("value").alias("revenue_first"),
        )
    )
    return lt.join(ft, "channel", "full").select(
        "channel",
        F.coalesce("n_last", F.lit(0)).alias("n_last"),
        F.coalesce("revenue_last", F.lit(0.0)).alias("revenue_last"),
        F.coalesce("n_first", F.lit(0)).alias("n_first"),
        F.coalesce("revenue_first", F.lit(0.0)).alias("revenue_first"),
    )


@query(
    "q196_funnel_conversion",
    sql="""
    WITH v AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY 1
    ),
    n AS (
      SELECT count(v.t) AS n1, count(c.t) AS n2, count(p.t) AS n3
      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    )
    SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
           CAST(n1 AS BIGINT) AS n_users,
           CASE WHEN n1 > 0 THEN 100.0 END AS conversion_pct FROM n
    UNION ALL
    SELECT 2, 'click_after_view', CAST(n2 AS BIGINT),
           CASE WHEN n1 > 0
                THEN round(100.0 * n2 / n1, 2) END FROM n
    UNION ALL
    SELECT 3, 'purchase_after_click', CAST(n3 AS BIGINT),
           CASE WHEN n2 > 0
                THEN round(100.0 * n3 / n2, 2) END FROM n
    """,
    operators=("X-funnel", "X-eventflow", "J-semi", "A1"),
)
def q196_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): a user
    advances a step only with an event STRICTLY AFTER their first
    completion of the previous step — the product-analytics shape
    that a bare per-type distinct count gets wrong (it counts
    purchases that preceded the click). Step grain: first-completion
    timestamps, so each stage is one per-user min aggregate joined
    forward — three well-keyed user_id shuffles of shrinking inputs.
    The report folds ONCE: the three stages left-join on user_id into
    a single 1-row count aggregate (count(t) skips null-extended
    rows), and the 3-row output inline-explodes from that row — the
    first cut union'd three branches that each re-derived the stage
    chain (22 shuffles, 6 nested-loop joins); this shape audits at a
    fraction of that with zero BNL joins."""
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    one = (
        v.join(c.select("user_id", "tc"), "user_id", "left")
        .join(p.select("user_id", "tp"), "user_id", "left")
        .agg(
            F.count("tv").alias("n1"),
            F.count("tc").alias("n2"),
            F.count("tp").alias("n3"),
        )
    )
    pct = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0,
        F.round(F.lit(100.0) * F.col(num) / F.col(den), 2),
    )
    report = F.array(
        F.struct(
            F.lit(1).cast("long").alias("step"),
            F.lit("view").alias("step_name"),
            F.col("n1").cast("long").alias("n_users"),
            F.when(F.col("n1") > 0, F.lit(100.0)).alias("conversion_pct"),
        ),
        F.struct(
            F.lit(2).cast("long").alias("step"),
            F.lit("click_after_view").alias("step_name"),
            F.col("n2").cast("long").alias("n_users"),
            pct("n2", "n1").alias("conversion_pct"),
        ),
        F.struct(
            F.lit(3).cast("long").alias("step"),
            F.lit("purchase_after_click").alias("step_name"),
            F.col("n3").cast("long").alias("n_users"),
            pct("n3", "n2").alias("conversion_pct"),
        ),
    )
    return one.select(F.explode(report).alias("r")).select("r.*")


@query(
    "q197_retention_cohorts",
    sql="""
    WITH wk AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    ),
    first AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY 1),
    act AS (
      SELECT wk.user_id, f.cw,
             CAST((epoch(wk.w) - epoch(f.cw)) / 604800 AS BIGINT) AS off
      FROM wk JOIN first f USING (user_id)
    ),
    ret AS (
      SELECT cw, off, count(*) AS n FROM act GROUP BY 1, 2
    )
    SELECT CAST(r.cw AS DATE) AS cohort_week,
           r.off AS week_offset,
           CAST(r.n AS BIGINT) AS n_active,
           round(100.0 * r.n / b.n, 2) AS retention_pct
    FROM ret r JOIN (SELECT cw, n FROM ret WHERE off = 0) b USING (cw)
    """,
    operators=("X-retention", "X-eventflow", "A-distinct", "Window-rank"),
)
def q197_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted per week-offset since, as a share of the cohort's size —
    the classic product-analytics triangle. Shape: the event stream
    collapses to DISTINCT (user, week) FIRST (one shuffle, the only
    pass over raw events), cohorts derive from that artifact, and the
    offset-0 base joins back broadcast-size; integer epoch-second
    arithmetic over Monday-midnight truncations divides exactly by
    604800 in both engines."""
    e = _events(spark, sf_dir)
    wk = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    first = wk.groupBy("user_id").agg(F.min("w").alias("cw"))
    act = wk.join(first, "user_id").select(
        "user_id",
        "cw",
        (
            (F.unix_timestamp("w") - F.unix_timestamp("cw")) / 604800
        )
        .cast("long")
        .alias("off"),
    )
    ret = act.groupBy("cw", "off").agg(F.count(F.lit(1)).alias("n"))
    base = ret.filter(F.col("off") == 0).select(
        "cw", F.col("n").alias("n0")
    )
    return ret.join(F.broadcast(base), "cw").select(
        F.col("cw").cast("date").alias("cohort_week"),
        F.col("off").alias("week_offset"),
        F.col("n").cast("long").alias("n_active"),
        F.round(F.lit(100.0) * F.col("n") / F.col("n0"), 2).alias(
            "retention_pct"
        ),
    )


@query(
    "q206_event_transitions",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    pairs AS (
      SELECT src, dst, count(*) AS n FROM seq
      WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, sum(n) AS t FROM pairs GROUP BY src)
    SELECT p.src, p.dst, CAST(p.n AS BIGINT) AS n_transitions,
           round(CAST(p.n AS DOUBLE) / t.t, 4) AS prob
    FROM pairs p JOIN tot t USING (src)
    """,
    operators=("X-markov", "X-eventflow", "Window-nav", "A1"),
)
def q206_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral model behind next-action prediction
    and anomaly scoring (a transition the matrix has never seen is
    the anomaly). ONE shuffle on user_id serves the lead window; the
    (src, dst) count and its per-src normalizer are two tiny
    aggregates over at most |types|² rows; probabilities divide exact
    integer counts identically in both engines, 4 dp round."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    pairs = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = pairs.groupBy("src").agg(F.sum("n").alias("t"))
    return pairs.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n_transitions"),
        F.round(F.col("n").cast("double") / F.col("t"), 4).alias("prob"),
    )


@query(
    "q207_ab_conversion_ztest",
    sql="""
    WITH agg AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS arm, count(*) AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1
    ),
    wide AS (
      SELECT
        COALESCE((SELECT n FROM agg WHERE arm = 0), 0) AS n0,
        COALESCE((SELECT conv FROM agg WHERE arm = 0), 0) AS c0,
        COALESCE((SELECT n FROM agg WHERE arm = 1), 0) AS n1,
        COALESCE((SELECT conv FROM agg WHERE arm = 1), 0) AS c1
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(c0 AS BIGINT) AS conv_control,
      CAST(n1 AS BIGINT) AS n_treatment, CAST(c1 AS BIGINT) AS conv_treatment,
      CASE WHEN n0 > 0 THEN round(CAST(c0 AS DOUBLE) / n0, 4) END AS p_control,
      CASE WHEN n1 > 0 THEN round(CAST(c1 AS DOUBLE) / n1, 4) END AS p_treatment,
      CASE WHEN n0 > 0 AND n1 > 0
                AND c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
        round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
              / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                     * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                     * (1.0 / n0 + 1.0 / n1)), 4) + 0.0 END AS z_score
    FROM wide
    """,
    operators=("X-ab-test", "X-stats-test", "A1"),
)
def q207_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on the purchase share of events between
    deterministic assignment arms (user_id parity — the reproducible
    stand-in for an experiment bucketing hash): the A/B readout every
    product-analytics deployment runs. Unit = event (at per-user
    grain this tiny benchmark converts everyone, which degenerates
    the pooled variance to zero — the z guard below still handles
    that case as NULL in both engines). ONE map-side-combinable
    aggregate to 2 rows; the pooled z-statistic's division tree is
    written identically in both engines (exact integer counts in,
    one sqrt), rounded to 4 dp and signed-zero-canonicalized (a
    difference of near-equal proportions is exactly the q159 hazard
    shape)."""
    e = _events(spark, sf_dir)
    arm0 = F.col("user_id") % 2 == 0
    is_p = F.col("event_type") == "purchase"
    one = e.agg(
        F.coalesce(F.sum(F.when(arm0, 1).otherwise(0)), F.lit(0)).alias("n0"),
        F.coalesce(F.sum(F.when(arm0 & is_p, 1).otherwise(0)), F.lit(0)).alias("c0"),
        F.coalesce(F.sum(F.when(~arm0, 1).otherwise(0)), F.lit(0)).alias("n1"),
        F.coalesce(F.sum(F.when(~arm0 & is_p, 1).otherwise(0)), F.lit(0)).alias("c1"),
    )
    # Every division sits behind an n > 0 guard: an empty assignment arm
    # is reachable (filtered / tiny inputs) and ANSI mode would throw
    # DIVIDE_BY_ZERO where the oracle's CASE yields NULL.
    both_arms = (F.col("n0") > 0) & (F.col("n1") > 0)
    p0 = F.when(F.col("n0") > 0, F.col("c0").cast("double") / F.col("n0"))
    p1 = F.when(F.col("n1") > 0, F.col("c1").cast("double") / F.col("n1"))
    tot_conv = F.col("c0") + F.col("c1")
    tot_n = F.col("n0") + F.col("n1")
    pp = tot_conv.cast("double") / tot_n
    z = (p1 - p0) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return one.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("c0").cast("long").alias("conv_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        F.col("c1").cast("long").alias("conv_treatment"),
        F.round(p0, 4).alias("p_control"),
        F.round(p1, 4).alias("p_treatment"),
        F.when(
            both_arms & (tot_conv > 0) & (tot_conv < tot_n),
            F.round(z, 4) + F.lit(0.0),
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# q232 — inter-event burstiness (r9)
# ---------------------------------------------------------------------------


@query(
    "q232_interevent_burstiness",
    sql="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events),
    s AS (
      SELECT user_id,
             CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(gap_us AS HUGEINT)) AS sg,
             sum(CAST(gap_us AS HUGEINT) * CAST(gap_us AS HUGEINT)) AS sg2
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY 1 HAVING count(*) >= 5)
    SELECT user_id,
           CAST(n AS BIGINT) AS n_gaps,
           CASE WHEN sg > 0
                THEN round((sqrt(CAST(n * sg2 - sg * sg AS DOUBLE))
                       - CAST(sg AS DOUBLE))
                      / (sqrt(CAST(n * sg2 - sg * sg AS DOUBLE))
                         + CAST(sg AS DOUBLE)), 6) + 0.0
                ELSE NULL END AS burstiness
    FROM s
    """,
    operators=("Window-lag", "A-stats", "X-burstiness", "A1"),
)
def q232_interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness of each user's inter-event gap
    distribution, B = (σ−μ)/(σ+μ): −1 for a metronome, 0 for a Poisson
    process, →1 for extreme bursts. Multiplying numerator and
    denominator through by n makes every term exact: nσ =
    sqrt(n·Σg²−(Σg)²) and nμ = Σg over integer MICROSECOND gaps
    accumulated in DECIMAL(38,0)/HUGEINT (gap² overflows BIGINT). The
    only float ops are two casts of exact integers, one sqrt, and one
    division — identical trees in both engines, then zround (a
    perfectly regular series yields −0.0). An ALL-same-second user
    (every gap 0 → σ = μ = 0) yields NULL rather than 0/0: Spark's
    ANSI mode throws on double division by zero where DuckDB returns
    NULL, so the guard is spelled in both engines. ONE shuffle on
    user_id serves both the lag window and the aggregate; the gap
    multiset is invariant to timestamp-tie ordering."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    dec = F.col("gap_us").cast("decimal(38,0)")
    s = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(dec).alias("sg"),
            F.sum(dec * dec).alias("sg2"),
        )
        .filter(F.col("n") >= 5)
    )
    nsig = F.sqrt((F.col("n") * F.col("sg2") - F.col("sg") * F.col("sg")).cast("double"))
    nmu = F.col("sg").cast("double")
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n_gaps"),
        F.when(
            F.col("sg") > 0, zround((nsig - nmu) / (nsig + nmu), 6)
        ).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# q233 — gap sessionization and per-user session statistics (r9)
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 1_800_000_000  #: 30 min in microseconds


@query(
    "q233_session_stats",
    sql=f"""
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  > {_SESSION_GAP_US}
                  OR lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s,
             ts, event_id
      FROM events),
    sid AS (
      SELECT user_id, us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      FROM t),
    per AS (
      SELECT user_id, s, count(*) AS n_ev, max(us) - min(us) AS span_us
      FROM sid GROUP BY 1, 2)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_ev) AS BIGINT) AS n_events,
           CAST(max(n_ev) AS BIGINT) AS max_session_events,
           CAST(max(span_us) AS BIGINT) AS max_session_span_us,
           round(CAST(sum(n_ev) AS DOUBLE) / count(*), 4) AS avg_session_events
    FROM per GROUP BY 1
    """,
    operators=("Window-lag", "X-sessionize", "A1", "Window-frame"),
)
def q233_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization (30-minute idle timeout) and the per-user
    session profile: session count, total events, the largest session
    by events, the longest session span, and mean session size. The
    classic two-window stack — a lag to mark session starts, a running
    sum to assign session ids — runs entirely inside each user's
    partition slice (ONE shuffle on user_id serves both windows and
    both aggregates; nothing global). Counts and microsecond spans are
    exact integers; the mean is an integer ratio whose 4-dp round
    cannot straddle a boundary (the q228 integer-ratio argument).
    Session membership is invariant to timestamp ties because tied
    events have gap 0 < timeout regardless of tie order."""
    e = _events(spark, sf_dir)
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lag_us = F.lag(us).over(wo)
    t = e.select(
        "user_id",
        us.alias("us"),
        F.when(
            lag_us.isNull() | ((us - lag_us) > _SESSION_GAP_US), 1
        ).otherwise(0).alias("new_s"),
        "ts",
        "event_id",
    )
    sid = t.select(
        "user_id",
        "us",
        F.sum("new_s")
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("s"),
    )
    per = sid.groupBy("user_id", "s").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("us") - F.min("us")).alias("span_us"),
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_ev").cast("long").alias("n_events"),
        F.max("n_ev").cast("long").alias("max_session_events"),
        F.max("span_us").cast("long").alias("max_session_span_us"),
        F.round(
            F.sum("n_ev").cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_session_events"),
    )


# ---------------------------------------------------------------------------
# q238 — VARIANT shredding census over heterogeneous JSON (r9)
# ---------------------------------------------------------------------------


@query(
    "q238_variant_shredding",
    sql="""
    WITH j AS (
      SELECT event_type,
             CASE event_type
               WHEN 'purchase' THEN
                 '{"amount": ' ||
                 CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR) ||
                 ', "flag": true}'
               WHEN 'click' THEN
                 '{"pos": {"x": ' || CAST(user_id % 100 AS VARCHAR) ||
                 ', "y": ' || CAST(event_id % 100 AS VARCHAR) || '}}'
               WHEN 'view' THEN
                 '{"dur": [' || CAST(event_id % 7 AS VARCHAR) || ', ' ||
                 CAST(user_id % 5 AS VARCHAR) || ']}'
               ELSE '{bad'
             END AS doc
      FROM events),
    x AS (
      SELECT event_type,
             json_valid(doc) AS ok,
             CASE WHEN json_valid(doc)
                  THEN CAST(json_extract(doc, '$.amount') AS BIGINT) END
               AS amount,
             CASE WHEN json_valid(doc)
                  THEN CAST(json_extract(doc, '$.pos.x') AS BIGINT) END
               AS pos_x,
             CASE WHEN json_valid(doc)
                  THEN CAST(json_extract(doc, '$.dur[0]') AS BIGINT) END
               AS dur0
      FROM j)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(sum(amount) AS BIGINT) AS sum_amount_cents,
           CAST(max(pos_x) AS BIGINT) AS max_pos_x,
           CAST(sum(dur0) AS BIGINT) AS sum_dur0
    FROM x GROUP BY 1
    """,
    operators=("F1-variant", "C15", "A1", "X-schema-on-read"),
)
def q238_variant_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read shredding of HETEROGENEOUS semi-structured
    payloads through Spark 4's VARIANT type: each event type carries a
    different JSON shape (scalar + bool, nested object, array — built
    deterministically from typed columns so both engines parse
    byte-identical documents; the 'error' type carries MALFORMED
    JSON), and the census extracts a typed path per shape with
    ``try_variant_get`` — missing paths and parse failures surface as
    NULL, never as exceptions, which is the property a 100 TB
    mixed-vintage metadata column needs (one bad row cannot kill the
    scan). parse_json/variant_get stay inside codegen; the oracle
    spells the same shred with json_valid + json_extract."""
    e = _events(spark, sf_dir)
    s = lambda c: c.cast("string")  # noqa: E731
    cents = F.round(F.col("value") * 100, 0).cast("long")
    doc = (
        F.when(
            F.col("event_type") == "purchase",
            F.concat(F.lit('{"amount": '), s(cents), F.lit(', "flag": true}')),
        )
        .when(
            F.col("event_type") == "click",
            F.concat(
                F.lit('{"pos": {"x": '),
                s(F.col("user_id") % 100),
                F.lit(', "y": '),
                s(F.col("event_id") % 100),
                F.lit("}}"),
            ),
        )
        .when(
            F.col("event_type") == "view",
            F.concat(
                F.lit('{"dur": ['),
                s(F.col("event_id") % 7),
                F.lit(", "),
                s(F.col("user_id") % 5),
                F.lit("]}"),
            ),
        )
        .otherwise(F.lit("{bad"))
    )
    v = F.try_parse_json(doc)
    x = e.select(
        "event_type",
        v.isNotNull().alias("ok"),
        F.try_variant_get(v, "$.amount", "bigint").alias("amount"),
        F.try_variant_get(v, "$.pos.x", "bigint").alias("pos_x"),
        F.try_variant_get(v, "$.dur[0]", "bigint").alias("dur0"),
    )
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long").alias("n_valid"),
        F.sum("amount").cast("long").alias("sum_amount_cents"),
        F.max("pos_x").cast("long").alias("max_pos_x"),
        F.sum("dur0").cast("long").alias("sum_dur0"),
    )


# ---------------------------------------------------------------------------
# q274 — propensity-stratified treatment effect with clipping (r11)
# ---------------------------------------------------------------------------


@query(
    "q274_propensity_stratified_effect",
    sql="""
    WITH per_user AS (
      SELECT user_id,
             sum(CASE WHEN event_type IN ('click', 'view')
                      THEN 1 ELSE 0 END) AS n_act,
             max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS t,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100, 0) AS BIGINT)
                      ELSE 0 END) AS y_cents
      FROM events GROUP BY 1),
    strat AS (
      SELECT least(n_act // 10, 5) AS stratum, t, y_cents FROM per_user),
    agg AS (
      SELECT stratum,
             count(*) AS n_users,
             sum(t) AS n_treated,
             sum(CASE WHEN t = 1 THEN y_cents ELSE 0 END) AS yt_cents,
             sum(CASE WHEN t = 0 THEN y_cents ELSE 0 END) AS yc_cents
      FROM strat GROUP BY 1)
    SELECT CAST(stratum AS BIGINT) AS stratum,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_treated AS BIGINT) AS n_treated,
           round(CAST(n_treated AS DOUBLE) / n_users, 6) AS e_hat,
           round(greatest(least(CAST(n_treated AS DOUBLE) / n_users,
                                0.95), 0.05), 6) AS e_clipped,
           CASE WHEN n_treated > 0
                THEN round(CAST(yt_cents AS DOUBLE) / n_treated / 100.0, 4)
                END AS mean_y_treated,
           CASE WHEN n_users - n_treated > 0
                THEN round(CAST(yc_cents AS DOUBLE)
                           / (n_users - n_treated) / 100.0, 4)
                END AS mean_y_control,
           CASE WHEN n_treated > 0 AND n_users - n_treated > 0
                THEN round(CAST(yt_cents AS DOUBLE) / n_treated / 100.0
                           - CAST(yc_cents AS DOUBLE)
                             / (n_users - n_treated) / 100.0, 4)
                END AS strat_effect
    FROM agg
    """,
    operators=("X-causal-ipw", "X-propensity", "A1", "C-case"),
)
def q274_propensity_stratified_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observational treatment-effect estimation by propensity
    stratification with clipping — the causal-inference workhorse a
    product analytics stack runs when it can't randomize (q207 is the
    randomized twin): treatment = the user signed up, outcome = total
    purchase value, strata = pre-treatment activity buckets
    (click/view volume, capped at 6 strata so every cell stays
    populated at any scale). Per stratum: the raw propensity ê_s, the
    positivity-clipped weight base (ê clipped to [0.05, 0.95] — the
    overlap guard every IPW estimator needs before weighting), and
    the within-stratum effect (treated mean − control mean). The
    output stays at STRATUM grain deliberately: every column is a
    single integer-ratio division (exact cents spine, q193's
    discipline), bit-identical across engines, where the collapsed
    IPW scalar would be a cross-strata DOUBLE FOLD whose summation
    order neither engine pins — the one cross-engine shape this
    registry refuses to hash (registry.py determinism contract); the
    scalar combine is one broadcast-side reduction the caller owns.
    One shuffle to user grain, one to stratum grain, nothing else."""
    e = catalog.load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
        ).alias("n_act"),
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("t"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("y_cents"),
    )
    agg = (
        per_user.select(
            F.least(F.floor(F.col("n_act") / 10), F.lit(5)).alias("stratum"),
            "t",
            "y_cents",
        )
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("t").alias("n_treated"),
            F.sum(F.when(F.col("t") == 1, F.col("y_cents")).otherwise(0)).alias(
                "yt_cents"
            ),
            F.sum(F.when(F.col("t") == 0, F.col("y_cents")).otherwise(0)).alias(
                "yc_cents"
            ),
        )
    )
    nt = F.col("n_treated")
    nc = F.col("n_users") - F.col("n_treated")
    mt = F.col("yt_cents").cast("double") / nt / 100.0
    mc = F.col("yc_cents").cast("double") / nc / 100.0
    return agg.select(
        F.col("stratum").cast("long").alias("stratum"),
        F.col("n_users").cast("long").alias("n_users"),
        nt.cast("long").alias("n_treated"),
        F.round(nt.cast("double") / F.col("n_users"), 6).alias("e_hat"),
        F.round(
            F.greatest(
                F.least(nt.cast("double") / F.col("n_users"), F.lit(0.95)),
                F.lit(0.05),
            ),
            6,
        ).alias("e_clipped"),
        F.when(nt > 0, F.round(mt, 4)).alias("mean_y_treated"),
        F.when(nc > 0, F.round(mc, 4)).alias("mean_y_control"),
        F.when((nt > 0) & (nc > 0), F.round(mt - mc, 4)).alias("strat_effect"),
    )


# ---------------------------------------------------------------------------
# q279 — sequence-pattern matching (MATCH_RECOGNIZE analogue) (r11)
# ---------------------------------------------------------------------------


@query(
    "q279_sequence_pattern_match",
    sql="""
    WITH coded AS (
      SELECT user_id,
             CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                  WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
                  WHEN 'signup' THEN 's' ELSE 'x' END AS ch,
             ts, event_id
      FROM events),
    seqs AS (
      SELECT user_id,
             string_agg(ch, '' ORDER BY ts, event_id) AS seq
      FROM coded GROUP BY 1),
    scored AS (
      SELECT user_id,
             len(regexp_extract_all(seq, 'v[vc]*p')) AS n_matches,
             length(seq) AS seq_len
      FROM seqs)
    SELECT CAST(n_matches AS BIGINT) AS n_matches,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(seq_len) AS BIGINT) AS sum_events
    FROM scored GROUP BY 1
    """,
    operators=("X-match-recognize", "X-sequence-pattern", "A-collect", "C-regex"),
)
def q279_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching — the MATCH_RECOGNIZE analogue
    (Spark has no row-pattern clause): each user's event stream
    collapses to a character string in exact (ts, event_id) order
    (collect_list of structs + array_sort — the struct's field order
    IS the sort key, so the encode stays deterministic under any task
    schedule; the oracle's ORDER BY inside string_agg is the same
    contract), and the funnel pattern `v[vc]*p` (a view, any
    views/clicks, closing purchase, no error/signup between) counts
    NON-OVERLAPPING matches per user via regexp_count — leftmost
    greedy semantics agree between Java regex and DuckDB's RE2 for
    this alternation-free pattern class (backtracking-divergent
    constructs like lazy quantifiers or nested alternation are
    deliberately out of contract). Per-user strings are bounded by
    per-user event volume (the q233 session bound); the output is the
    match-count histogram. At 100 TB the collect_list group state is
    the one memory term — bounded by the busiest user, the same bound
    every sessionization op here already carries."""
    e = catalog.load(spark, sf_dir, "events")
    coded = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "error", "e")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("x")
        .alias("ch"),
    )
    seqs = coded.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "ch"))
                ),
                lambda a: a["ch"],
            ),
            "",
        ).alias("seq")
    )
    scored = seqs.select(
        F.regexp_count(F.col("seq"), F.lit("v[vc]*p")).alias("n_matches"),
        F.length("seq").alias("seq_len"),
    )
    return scored.groupBy(F.col("n_matches").cast("long").alias("n_matches")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("seq_len").cast("long").alias("sum_events"),
    )
