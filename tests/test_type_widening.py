"""Type-widening schema evolution on the versioned chain (r10): a
column may promote along the value-preserving lattice (int chain up,
float→double, decimal precision-up at fixed scale) mid-history — the
routine drift of a multi-year lake. The manifest records the
promotion, diffs and span folds cross the boundary exactly, and
narrowing / cross-family changes refuse loudly AT WRITE TIME."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.sinks import (
    read_changes,
    read_version,
    write_versioned,
)


def _chain(spark, path, dtype="int", vals=None, capture=True):
    vals = vals or [(1, 10), (2, 20), (3, 30)]
    df = spark.createDataFrame(vals, f"k long, v {dtype}")
    write_versioned(df, path, capture_changes=capture, manifest=True)
    return df


def test_int_to_long_promotion_commits_and_records(spark, tmp_path):
    path = str(tmp_path / "chain")
    _chain(spark, path, "int")
    big = 2**40  # does not fit in int — the promotion is load-bearing
    df1 = spark.createDataFrame(
        [(1, 10), (2, 20), (3, big)], "k long, v long"
    )
    v = write_versioned(df1, path, capture_changes=True, manifest=True)
    assert v == 1
    m = json.load(open(f"{path}/_manifests/v=1.json"))
    assert m["type_promotions"] == {"v": {"from": "int", "to": "bigint"}}
    # each version keeps its own schema
    assert dict(read_version(spark, path, 0).dtypes)["v"] == "int"
    assert dict(read_version(spark, path, 1).dtypes)["v"] == "bigint"
    # the boundary-crossing feed: unchanged rows (same value, wider
    # type) net to ZERO; only the changed row diffs
    feed = sorted(
        (r["k"], r["v"], r["_change"])
        for r in read_changes(spark, path, 0, 1).collect()
    )
    assert feed == [(3, 30, "delete"), (3, big, "insert")]


def test_float_to_double_and_decimal_precision_up(spark, tmp_path):
    path = str(tmp_path / "chain")
    _chain(spark, path, "float", vals=[(1, 1.5), (2, 2.5)])
    df1 = spark.createDataFrame([(1, 1.5), (2, 99.25)], "k long, v double")
    write_versioned(df1, path, capture_changes=True, manifest=True)
    feed = sorted(
        (r["k"], r["_change"]) for r in read_changes(spark, path, 0, 1).collect()
    )
    assert feed == [(2, "delete"), (2, "insert")]
    dpath = str(tmp_path / "dec")
    d0 = spark.createDataFrame([(1, "1.25")], "k long, s string").select(
        "k", F.col("s").cast("decimal(10,2)").alias("v")
    )
    write_versioned(d0, dpath, capture_changes=True, manifest=True)
    d1 = spark.createDataFrame([(1, "12345678901234.25")], "k long, s string").select(
        "k", F.col("s").cast("decimal(28,2)").alias("v")
    )
    write_versioned(d1, dpath, capture_changes=True, manifest=True)
    m = json.load(open(f"{dpath}/_manifests/v=1.json"))
    assert m["type_promotions"]["v"]["to"] == "decimal(28,2)"


def test_narrowing_and_reinterpretation_refused_at_write(spark, tmp_path):
    path = str(tmp_path / "chain")
    _chain(spark, path, "bigint")
    with pytest.raises(ValueError, match="widening promotion"):
        write_versioned(
            spark.createDataFrame([(1, 10)], "k long, v int"),
            path,
            manifest=True,
        )
    with pytest.raises(ValueError, match="widening promotion"):
        write_versioned(
            spark.createDataFrame([(1, "x")], "k long, v string"),
            path,
            manifest=True,
        )
    spath = str(tmp_path / "dec")
    d0 = spark.createDataFrame([(1, "1.25")], "k long, s string").select(
        "k", F.col("s").cast("decimal(10,2)").alias("v")
    )
    write_versioned(d0, spath, manifest=True)
    # scale change is NOT a widening (value representation shifts)
    with pytest.raises(ValueError, match="widening promotion"):
        write_versioned(
            spark.createDataFrame([], "k long, v decimal(10,4)"),
            spath,
            manifest=True,
        )
    # the refused writes never advanced the chain
    assert dict(read_version(spark, path).dtypes)["v"] == "bigint"


def test_span_fold_across_widening_boundary(spark, tmp_path):
    """A 3-version span whose middle commit widens: the net feed folds
    the narrow and wide step feeds together (union coerces to the
    wide type) and equals the endpoint diff."""
    path = str(tmp_path / "chain")
    _chain(spark, path, "int", vals=[(1, 10), (2, 20)])
    write_versioned(
        spark.createDataFrame([(1, 10), (2, 2**40)], "k long, v long"),
        path, capture_changes=True, manifest=True,
    )
    write_versioned(
        spark.createDataFrame([(1, 11), (2, 2**40)], "k long, v long"),
        path, capture_changes=True, manifest=True,
    )
    net = sorted(
        (r["k"], r["v"], r["_change"])
        for r in read_changes(spark, path, 0, 2).collect()
    )
    assert net == [
        (1, 10, "delete"),
        (1, 11, "insert"),
        (2, 20, "delete"),
        (2, 2**40, "insert"),
    ]
