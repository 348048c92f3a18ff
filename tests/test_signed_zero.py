"""Signed-zero hardening (the q159 class).

Two layers, each pinned here:
1. The self-check gate (`tools.check_oracle._compare`) must be at
   least as strict as the driver's value-hash: it has to FAIL on a
   -0.0-vs-+0.0 divergence (IEEE `==` would call them equal, which is
   how the r8 closing sim reported green on a red driver row).
2. The canonicalization (`functions.numeric.zround` / the literal
   `round(...) + 0.0` oracle twin) must map every rounded tiny
   negative to +0.0 in BOTH engines, so canonicalized outputs can
   never diverge on zero's sign in the first place.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from portfolio1_etl_spark.functions.numeric import zround
from tools.check_oracle import _compare


def _is_neg_zero(v: float) -> bool:
    return v == 0.0 and math.copysign(1.0, v) < 0


def test_compare_fails_on_signed_zero_divergence():
    sdf = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.5]})
    odf = pd.DataFrame({"k": [1, 2], "v": [-0.0, 1.5]})
    ok, msg = _compare(sdf, odf)
    assert not ok, "self-check must distinguish -0.0 from +0.0 (driver does)"
    assert "v" in msg


def test_compare_passes_on_identical_floats_and_nans():
    sdf = pd.DataFrame({"v": [0.0, -1.25, float("nan")]})
    odf = pd.DataFrame({"v": [0.0, -1.25, float("nan")]})
    ok, _ = _compare(sdf, odf)
    assert ok


def test_duckdb_round_preserves_negative_zero_without_canon():
    """Pin the engine behavior the whole fix rests on: DuckDB's round
    keeps the tiny negative's sign; `+ 0.0` canonicalizes it."""
    raw = duckdb.sql("SELECT round(CAST(-1e-18 AS DOUBLE), 4) AS v").fetchone()[0]
    assert _is_neg_zero(raw)
    canon = duckdb.sql(
        "SELECT round(CAST(-1e-18 AS DOUBLE), 4) + 0.0 AS v"
    ).fetchone()[0]
    assert canon == 0.0 and not _is_neg_zero(canon)
    # the wider hazard window: any DOUBLE in (-0.5e-4, 0) at 4 dp
    raw2 = duckdb.sql(
        "SELECT round(CAST(-0.00003 AS DOUBLE), 4) AS v"
    ).fetchone()[0]
    assert _is_neg_zero(raw2)


def test_zround_canonicalizes_in_spark(spark):
    df = spark.range(1).select(
        zround(F.lit(-1e-18), 4).alias("a"),
        zround(F.lit(-0.00003), 4).alias("b"),
        zround(F.lit(-2.5), 4).alias("c"),
        zround(F.lit(0.12345), 4).alias("d"),
    )
    row = df.collect()[0]
    assert not _is_neg_zero(row["a"]) and row["a"] == 0.0
    assert not _is_neg_zero(row["b"]) and row["b"] == 0.0
    # + 0.0 is the identity everywhere except signed zero
    assert row["c"] == -2.5
    assert row["d"] == 0.1234 or row["d"] == 0.1235


def test_q159_spark_output_has_no_negative_zero(spark, sf_dir):
    from portfolio1_etl_spark.plans import REGISTRY

    pdf = REGISTRY["q159_bigram_pmi"].fn(spark, sf_dir).toPandas()
    assert not any(_is_neg_zero(v) for v in pdf["pmi"]), (
        "q159 pmi output must be signed-zero canonical"
    )
