"""Event-time window queries over the ``events`` table — the batch
twins of the Structured Streaming surface (SURVEY.md §2.11). The
streaming versions (readStream + watermark) live in
``portfolio1_etl_spark/streaming`` and are pinned to these semantics by
tests; these batch forms are what the DuckDB oracle can check.
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
    "q50_tumbling_window",
    sql="""
    SELECT
      time_bucket(INTERVAL '1 hour', ts) AS window_start,
      event_type,
      count(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    operators=("Stream-window", "A3"),
)
def q50_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window — the batch form of
    ``groupBy(window('ts', '1 hour'))``; epoch-aligned starts match
    DuckDB ``time_bucket`` exactly."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum_money("value").alias("total_value"),
        )
    )


@query(
    "q51_sliding_window",
    sql="""
    WITH contrib AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
      FROM events
    )
    SELECT window_start, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM contrib
    GROUP BY window_start
    """,
    operators=("Stream-window-slide",),
)
def q51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h size, 30 min slide): each event lands in two
    overlapping windows. Spark expands the event into its window set;
    the oracle expresses the same expansion as a 2-way UNION of
    slide-aligned buckets."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes")
            .getField("start")
            .alias("window_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum_money("value").alias("total_value"),
        )
    )


@query(
    "q52_session_window",
    sql="""
    WITH seq AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '10 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    tagged AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM seq
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '10 minutes' AS session_end,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM tagged
    GROUP BY user_id, session_id
    """,
    operators=("Stream-session",),
)
def q52_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap —
    ``session_window()`` in Spark (start = first event, end = last
    event + gap; a new session begins when the inter-event gap is
    ≥ the timeout). The oracle is the classic lag + cumulative-sum
    sessionization."""
    e = _events(spark, sf_dir)
    sw = F.session_window("ts", "10 minutes")
    return (
        e.groupBy(sw, "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum_money("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q53_dedup_first_event",
    sql="""
    SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
    FROM (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    operators=("Stream-dedup",),
)
def q53_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyed dedup — keep the earliest event per
    (user_id, event_type). This is the batch twin of
    ``dropDuplicatesWithinWatermark``; unlike ``dropDuplicates`` (which
    keeps an arbitrary row) the window form pins which row survives, so
    the oracle can check it."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
        )
    )
