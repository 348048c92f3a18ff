"""PII redaction functions and ORC/JSONL format round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from portfolio1_etl_spark.functions.redact import pii_counts, redact_pii
from portfolio1_etl_spark.operators.sinks import write_jsonl, write_orc
from portfolio1_etl_spark.sources.readers import read_jsonl, read_orc


def _texts(spark):
    rows = [
        (0, "contact john.doe+spam@example.co.uk or admin@host.io today"),
        (1, "server at 192.168.0.1 answered, fallback 10.0.0.255"),
        (2, "call 555-123-4567 or +1 (800) 555 0199 now"),
        (3, "card 4111 1111 1111 1111 exp 12/30"),
        (4, "nothing sensitive here, year 2024 is fine"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_redact_replaces_each_shape(spark):
    got = {
        r["id"]: r["red"]
        for r in _texts(spark).select("id", redact_pii("text").alias("red")).collect()
    }
    assert got[0] == "contact <EMAIL> or <EMAIL> today"
    assert got[1] == "server at <IP> answered, fallback <IP>"
    assert "<NUMBER>" in got[2] and "555" not in got[2]
    assert "<NUMBER>" in got[3] and "4111" not in got[3]
    # short numbers survive (a year is not PII)
    assert got[4] == "nothing sensitive here, year 2024 is fine"


def test_pii_counts_audit(spark):
    got = {
        r["id"]: r["c"].asDict()
        for r in _texts(spark).select("id", pii_counts("text").alias("c")).collect()
    }
    assert got[0] == {"n_email": 2, "n_ip": 0, "n_number": 0}
    assert got[1] == {"n_email": 0, "n_ip": 2, "n_number": 0}
    assert got[2]["n_number"] == 2
    assert got[4] == {"n_email": 0, "n_ip": 0, "n_number": 0}


def test_redaction_is_idempotent(spark):
    once = _texts(spark).select("id", redact_pii("text").alias("t"))
    twice = once.select("id", redact_pii("t").alias("t"))
    assert sorted(once.collect()) == sorted(twice.collect())


def _sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -0.25), (3, None, 0.0)],
        "k long, s string, x double",
    )


def test_orc_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "orc_out")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_partitioned_layout(spark, tmp_path):
    import os

    df = _sample(spark).fillna({"s": "z"})
    path = str(tmp_path / "orc_part")
    write_orc(df, path, partition_by=["s"])
    assert any(d.startswith("s=") for d in os.listdir(path))


def test_jsonl_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "jsonl_out")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_dynamic_partition_overwrite_leaves_others_intact(spark, tmp_path):
    from portfolio1_etl_spark.operators.sinks import overwrite_partitions

    path = str(tmp_path / "dyn")
    day1 = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "k long, dt string"
    )
    overwrite_partitions(day1, path, ["dt"])
    # backfill ONLY day 2 with corrected data
    fix = spark.createDataFrame([(99, "2024-01-02")], "k long, dt string")
    overwrite_partitions(fix, path, ["dt"])
    # partition values type-infer back as dates — compare as strings
    got = {
        (str(r["dt"]), r["k"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {("2024-01-01", 1), ("2024-01-02", 99)}


def test_merge_schema_reads_evolved_files(spark, tmp_path):
    from portfolio1_etl_spark.sources.readers import read_parquet_evolving

    path = tmp_path / "evolve"
    spark.createDataFrame([(1, "a")], "k long, s string").write.parquet(
        str(path / "p1")
    )
    spark.createDataFrame(
        [(2, "b", 1.5)], "k long, s string, x double"
    ).write.parquet(str(path / "p2"))
    got = read_parquet_evolving(spark, str(path / "*"))
    assert set(got.columns) == {"k", "s", "x"}
    rows = {r["k"]: r["x"] for r in got.collect()}
    assert rows[1] is None and rows[2] == 1.5
