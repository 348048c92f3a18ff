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
