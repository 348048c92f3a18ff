"""Degenerate-input regression gate for the r9 series queries: under
Spark's ANSI mode a double division by zero THROWS while DuckDB
returns NULL, so every reachable zero denominator must be guarded in
BOTH engines. These fixtures hit each guard on purpose:

- orders spanning exactly 8 days → q230's lag-7 group has ONE pair
  (zero variance on both sides) and q231 has fewer than its 16-day
  window;
- a user whose events all share one timestamp → q232's σ = μ = 0;
- a single-word corpus → q235's one-rank regression (den = 0).
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pandas as pd
from pyspark.sql import types as T

from portfolio1_etl_spark.plans import REGISTRY
from tools.check_oracle import _compare

_QUERIES = (
    "q230_revenue_acf",
    "q231_holt_forecast",
    "q232_interevent_burstiness",
    "q235_zipf_slope",
)


def _write_fixtures(spark, base: str) -> None:
    oschema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    orows = [
        (i, 1 + i % 3, "O", 100.00, datetime.datetime(2020, 1, 1 + i % 8), "5-LOW")
        for i in range(16)
    ]
    spark.createDataFrame(orows, oschema).coalesce(1).write.parquet(
        f"{base}/orders.parquet"
    )
    eschema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    erows = [(i, t0, 1, "view", 1.0, "{}") for i in range(8)]  # metronome-0
    erows += [
        (100 + i, t0 + datetime.timedelta(seconds=60 * i), 2, "view", 1.0, "{}")
        for i in range(8)
    ]
    spark.createDataFrame(erows, eschema).coalesce(1).write.parquet(
        f"{base}/events.parquet"
    )
    drows = [(i, "aaa aaa aaa", "en", "src0", 11) for i in range(5)]
    spark.createDataFrame(
        drows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{base}/documents.parquet")


def test_degenerate_inputs_yield_null_not_divide_by_zero(spark, tmp_path):
    base = str(tmp_path / "degenerate")
    os.makedirs(base)
    _write_fixtures(spark, base)
    con = duckdb.connect()
    for t in ("orders", "events", "documents"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{base}/{t}.parquet/*.parquet')"
        )
    failures = []
    for name in _QUERIES:
        q = REGISTRY[name]
        got = q.fn(spark, base).toPandas()  # must not raise DIVIDE_BY_ZERO
        ok, msg = _compare(got, con.sql(q.sql).df())
        if not ok:
            failures.append((name, msg))
    assert not failures, failures
    # the guards actually fired: NULLs where the math is undefined
    acf = REGISTRY["q230_revenue_acf"].fn(spark, base).toPandas()
    assert pd.isna(acf.loc[acf["lag_k"] == 7, "acf"]).all()
    holt = REGISTRY["q231_holt_forecast"].fn(spark, base).toPandas()
    assert holt["n_days"][0] < 16 and pd.isna(holt["forecast_cents"][0])
    b = REGISTRY["q232_interevent_burstiness"].fn(spark, base).toPandas()
    assert pd.isna(b.loc[b["user_id"] == 1, "burstiness"]).all()
    assert b.loc[b["user_id"] == 2, "burstiness"].notna().all()
    z = REGISTRY["q235_zipf_slope"].fn(spark, base).toPandas()
    assert z["n_ranks"][0] == 1 and pd.isna(z["zipf_slope"][0])


def test_ab_ztest_empty_arm_yields_null(spark, tmp_path):
    """q207 with every event in ONE assignment arm (all-odd user_ids):
    p_control and z must be NULL in both engines, not a
    DIVIDE_BY_ZERO throw from ANSI mode."""
    base = str(tmp_path / "onearm")
    os.makedirs(base)
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    erows = [
        (i, t0 + datetime.timedelta(seconds=i), 2 * (i % 4) + 1,
         "purchase" if i % 3 == 0 else "view", 1.0, "{}")
        for i in range(24)
    ]
    spark.createDataFrame(
        erows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{base}/events.parquet")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{base}/events.parquet/*.parquet')"
    )
    q = REGISTRY["q207_ab_conversion_ztest"]
    got = q.fn(spark, base).toPandas()  # must not raise
    ok, msg = _compare(got, con.sql(q.sql).df())
    assert ok, msg
    assert got["n_control"][0] == 0
    assert pd.isna(got["p_control"][0]) and pd.isna(got["z_score"][0])
    assert got["p_treatment"].notna().all()
