"""Validation suite (operators/validation): the violation counters
must MOVE on dirty data — a report that always passes is decoration."""

from __future__ import annotations

from pyspark.sql import functions as F

from portfolio1_etl_spark.operators import validation as V


def _by_name(report):
    return {
        r["check_name"]: (r["metric"], r["passed"]) for r in report.collect()
    }


def test_column_checks_count_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "P", 10.0),
            (2, "P", -5.0),   # range violation
            (2, "X", 20.0),   # duplicate id + bad status
            (None, "O", 1.0),  # null id
        ],
        "id long, st string, amt double",
    )
    rep = _by_name(
        V.run_checks(
            df,
            [
                V.not_null("id.not_null", "id"),
                V.unique("id.unique", "id"),
                V.accepted_values("st.accepted", "st", ["P", "O", "F"]),
                V.in_range("amt.range", "amt", 0, 100),
            ],
        )
    )
    assert rep["id.not_null"] == (1.0, 0)
    # 4 rows, 2 distinct non-null ids, 1 null -> 1 duplicate
    assert rep["id.unique"] == (1.0, 0)
    assert rep["st.accepted"] == (1.0, 0)
    assert rep["amt.range"] == (1.0, 0)


def test_clean_table_passes(spark):
    df = spark.createDataFrame(
        [(1, "P", 10.0), (2, "O", 20.0)], "id long, st string, amt double"
    )
    rep = _by_name(
        V.run_checks(
            df,
            [
                V.not_null("id.not_null", "id"),
                V.unique("id.unique", "id"),
                V.accepted_values("st.accepted", "st", ["P", "O", "F"]),
                V.in_range("amt.range", "amt", 0, 100),
            ],
        )
    )
    assert all(passed == 1 for _, passed in rep.values())
    assert all(metric == 0.0 for metric, _ in rep.values())


def test_referential_orphans_and_null_keys(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "fk long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    rep = _by_name(V.referential_check("fk.in_dim", fact, "fk", dim, "pk"))
    # distinct orphans: 9 and NULL -> 2 (duplicate fact keys count once)
    assert rep["fk.in_dim"] == (2.0, 0)


def test_report_union_shape(spark):
    df = spark.createDataFrame([(1,)], "id long")
    rep = V.validation_report(
        [
            V.run_checks(df, [V.not_null("a", "id")]),
            V.run_checks(df, [V.unique("b", "id")]),
        ]
    )
    assert rep.columns == ["check_name", "metric", "passed"]
    assert rep.count() == 2
