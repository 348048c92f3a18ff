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


@query(
    "q49_cohort_retention",
    sql="""
    WITH wk AS (
      SELECT user_id,
             CAST((ts::DATE - DATE '1970-01-01') // 7 AS BIGINT) AS wk
      FROM events
    ),
    cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM wk GROUP BY user_id)
    SELECT c.cohort_wk,
           w.wk - c.cohort_wk AS week_offset,
           CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active
    FROM wk w JOIN cohort c ON w.user_id = c.user_id
    WHERE w.wk - c.cohort_wk <= 3
    GROUP BY 1, 2
    """,
    operators=("X-cohort", "A-distinct", "A3"),
)
def q49_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    distinct in each subsequent week offset (0..3). Week buckets are
    integer epoch-week indexes (floor(days-since-epoch / 7)) — NOT
    date_trunc/time_bucket, whose week origins differ between engines
    (Spark windows align to 1970-01-01, DuckDB time_bucket to
    2000-01-03). Scale shape: ONE scan of the event table and one
    shuffle on user_id — the cohort week is a per-user window minimum
    riding the same Exchange the activity rows already need, not a
    separate aggregate joined back (which would read the fact table
    twice); the final distinct aggregates on (cohort, offset) — a
    tiny result."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) / 7
        ).alias("wk"),
    )
    w = W.partitionBy("user_id")
    joined = e.withColumn("cohort_wk", F.min("wk").over(w)).withColumn(
        "week_offset", F.col("wk") - F.col("cohort_wk")
    )
    return (
        joined.filter(F.col("week_offset") <= 3)
        .groupBy("cohort_wk", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "q54_funnel",
    sql="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
           (SELECT count(*) FROM v) AS reached_view,
           (SELECT count(*) FROM c) AS reached_click,
           (SELECT count(*) FROM p) AS reached_purchase
    """,
    operators=("X-funnel", "J-semi", "A4"),
)
def q54_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: each stage keeps users
    whose first qualifying event strictly follows the previous stage's
    first event. The whole funnel runs in ONE scan of the event table
    and ONE shuffle on user_id: three chained per-user window minimums
    (t_view = first view; t_click = first click AFTER t_view;
    t_purchase = first purchase AFTER t_click — each window may
    reference the previous stage's column because all three partition
    on the same key, so Catalyst plans a single Exchange), then a
    per-user dedup and a 1-row census. The earlier revision joined
    three per-stage aggregates back onto three more filtered scans —
    4 reads of the fact table and 10 shuffles where this plan needs
    one of each; at 100 TB the difference IS the query."""
    e = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    staged = (
        e.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("reached_view"),
        F.count("t_click").alias("reached_click"),
        F.count("t_purchase").alias("reached_purchase"),
    )


@query(
    "q171_event_path_trigrams",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
        lead(event_type, 1) OVER w AS e2,
        lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS e1, e2, e3, count(*) AS n_paths
    FROM seq
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1, 2, 3
    HAVING count(*) >= 10
    """,
    operators=("X-path-analysis", "Window-lag", "A1"),
)
def q171_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the corpus's common 3-step event
    sequences per user (view→cart→purchase vs view→error→view …) —
    the product-analytics op between q54's fixed funnel (one
    hand-picked path) and a full sequence model: no path is assumed,
    frequent ones surface. Two ``lead`` windows over (ts, event_id)
    build each sliding trigram without self-joins; the support floor
    keeps the report meaningful. Scale: one window shuffle on user_id
    + one grouped count — sequences never materialize beyond the two
    lookahead columns."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .filter(F.col("n_paths") >= 10)
    )


@query(
    "q213_consecutive_declines",
    sql="""
    WITH daily AS (
      SELECT n.n_name AS nation, CAST(l.l_shipdate AS DATE) AS d,
             CAST(round(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(28,8))), 2) AS DOUBLE) AS rev
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    marked AS (
      SELECT nation, d, rev,
             CASE WHEN rev < lag(rev) OVER w THEN 1 ELSE 0 END AS dec,
             row_number() OVER w AS rn
      FROM daily WINDOW w AS (PARTITION BY nation ORDER BY d)
    ),
    anchored AS (
      SELECT nation, dec,
             rn - sum(dec) OVER (PARTITION BY nation ORDER BY rn
                                 ROWS UNBOUNDED PRECEDING) AS anchor
      FROM marked
    ),
    lens AS (
      SELECT nation, anchor, count(*) AS run_len
      FROM anchored WHERE dec = 1 GROUP BY nation, anchor
    ),
    days AS (SELECT nation, count(*) AS n_days FROM daily GROUP BY 1),
    agg AS (
      SELECT nation, max(run_len) AS longest,
             sum(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS n3
      FROM lens GROUP BY 1
    )
    SELECT days.nation, CAST(days.n_days AS BIGINT) AS n_days,
      CAST(coalesce(agg.longest, 0) AS BIGINT) AS longest_decline_run,
      CAST(coalesce(agg.n3, 0) AS BIGINT) AS n_runs_ge3
    FROM days LEFT JOIN agg USING (nation)
    """,
    operators=("Window-nav", "X-islands", "X-pattern", "A1"),
)
def q213_consecutive_declines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining over the revenue series: per supplier
    nation, the longest run of consecutive declining revenue days and
    the count of ≥3-day slumps — the lag + anchored-island shape
    (rn − running Σdecline groups each maximal run) that SQL pattern
    matching compiles down to. Declines compare exact decimal-backed
    daily revenues, so the indicator is bit-identical cross-engine.
    Both window passes share ONE (nation, date-ordered) exchange;
    runs aggregate on (nation, anchor) — bounded by days, not rows."""
    l = catalog.load(spark, sf_dir, "lineitem")
    s = catalog.load(spark, sf_dir, "supplier")
    n = catalog.load(spark, sf_dir, "nation")
    from portfolio1_etl_spark.functions.exact import dsum_product

    daily = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("l_shipdate").cast("date").alias("d"),
        )
        .agg(
            dsum_product(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
    )
    w = W.partitionBy("nation").orderBy("d")
    marked = daily.select(
        "nation",
        F.when(F.col("rev") < F.lag("rev").over(w), 1)
        .otherwise(0)
        .alias("dec"),
        F.row_number().over(w).alias("rn"),
    )
    wrun = (
        W.partitionBy("nation")
        .orderBy("rn")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    anchored = marked.select(
        "nation", "dec", (F.col("rn") - F.sum("dec").over(wrun)).alias("anchor")
    )
    lens = (
        anchored.filter(F.col("dec") == 1)
        .groupBy("nation", "anchor")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    days = daily.groupBy("nation").agg(F.count(F.lit(1)).alias("n_days"))
    agg = lens.groupBy("nation").agg(
        F.max("run_len").alias("longest"),
        F.sum(F.when(F.col("run_len") >= 3, 1).otherwise(0)).alias("n3"),
    )
    return days.join(agg, "nation", "left").select(
        "nation",
        F.col("n_days").cast("long").alias("n_days"),
        F.coalesce("longest", F.lit(0))
        .cast("long")
        .alias("longest_decline_run"),
        F.coalesce("n3", F.lit(0)).cast("long").alias("n_runs_ge3"),
    )
