"""UDF-surface tests: every Python path is pinned to its built-in
(declarative) twin — the UDFs must mimic exactly what codegen'd
expressions produce (SURVEY.md §2.12)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.udfs import token_count_udf, zscore_per_group


def test_pandas_udf_matches_builtin(spark, sf_dir):
    d = catalog.load(spark, sf_dir, "documents")
    both = d.select(
        "doc_id",
        token_count_udf(F.col("text")).alias("udf_n"),
        F.size(F.split("text", " ")).cast("long").alias("builtin_n"),
    )
    assert both.filter(F.col("udf_n") != F.col("builtin_n")).count() == 0


def test_apply_in_pandas_zscore_matches_window(spark, sf_dir):
    o = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    grouped = {
        r.o_orderkey: r.zscore
        for r in zscore_per_group(o, "o_custkey", "o_totalprice").collect()
    }
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey")
    windowed = {
        r.o_orderkey: r.z
        for r in o.withColumn(
            "z",
            F.when(
                F.stddev_samp("o_totalprice").over(w) > 0,
                (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
                / F.stddev_samp("o_totalprice").over(w),
            ).otherwise(F.lit(0.0)),
        ).collect()
    }
    assert set(grouped) == set(windowed)
    for k in grouped:
        assert math.isclose(grouped[k], windowed[k], rel_tol=1e-9, abs_tol=1e-12), k


def test_udtf_matches_expression_shingles(spark):
    """The Python UDTF's row expansion equals the codegen'd
    transform(sequence(...)) shingle expression."""
    from portfolio1_etl_spark.operators.udfs import ngram_udtf

    NgramUDTF = ngram_udtf()
    spark.udtf.register("ngrams", NgramUDTF)
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "solo")], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("_udtf_docs")
    got = {
        (r.doc_id, r.pos, r.ngram)
        for r in spark.sql(
            "SELECT d.doc_id, t.pos, t.ngram FROM _udtf_docs d, "
            "LATERAL ngrams(d.text, 2) t"
        ).collect()
    }
    want = {
        (r.doc_id, r.pos + 1, r.ngram)
        for r in docs.selectExpr(
            "doc_id",
            "posexplode(CASE WHEN size(split(text,' ')) >= 2 THEN"
            " transform(sequence(1, size(split(text,' '))-1),"
            " i -> concat_ws(' ', slice(split(text,' '), i, 2)))"
            " ELSE array() END) AS (pos, ngram)",
        ).collect()
    }
    assert got == want
    assert (1, 1, "a b") in got and (3, 1, "solo") not in got


def test_grouped_agg_udaf_matches_expression_twin(spark, sf_dir):
    """UDAF (grouped-agg pandas_udf) pinned to exp(avg(ln(x)))."""
    from portfolio1_etl_spark import catalog
    from portfolio1_etl_spark.operators.udfs import geometric_mean_udaf

    li = catalog.load(spark, sf_dir, "lineitem").limit(2000)
    got = {
        r.l_returnflag: r.gm
        for r in li.groupBy("l_returnflag")
        .agg(geometric_mean_udaf("l_quantity").alias("gm"))
        .collect()
    }
    want = {
        r.l_returnflag: r.gm
        for r in li.filter(F.col("l_quantity") > 0)
        .groupBy("l_returnflag")
        .agg(F.exp(F.avg(F.log("l_quantity"))).alias("gm"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_jaro_winkler_matches_duckdb_bit_exactly():
    """q272's whole determinism story: _jaro_winkler_py must equal
    DuckDB's jaro_winkler_similarity BIT-FOR-BIT (same IEEE ops in the
    same order), so the 6-dp round in query and oracle can never
    straddle. 2000-pair fuzz over short alphabets (maximizes matches/
    transpositions/prefix collisions) plus the documented edge cases:
    empty-vs-empty scores 0, the unclamped match window ('ab'/'ba' ->
    0), and the 0.7 boost threshold."""
    import random

    import duckdb

    from portfolio1_etl_spark.operators.udfs import _jaro_winkler_py

    con = duckdb.connect()
    rng = random.Random(272)
    cases = [("", ""), ("", "x"), ("x", "x"), ("ab", "ba"),
             ("dixon", "dicksonx"), ("martha", "marhta"),
             ("small ring", "small rng"), ("red widget", "red gadget")]
    for _ in range(2000):
        alphabet = rng.choice(["ab", "abcde", "abcdefghij klm"])
        cases.append((
            "".join(rng.choices(alphabet, k=rng.randint(0, 14))),
            "".join(rng.choices(alphabet, k=rng.randint(0, 14))),
        ))
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        got = _jaro_winkler_py(a, b)
        assert got == want, (a, b, got.hex(), want.hex())


def test_jaro_winkler_udf_nulls(spark):
    """NULL in either side propagates NULL through the pandas UDF."""
    from portfolio1_etl_spark.operators.udfs import jaro_winkler_udf

    rows = spark.createDataFrame(
        [("abc", None), (None, "abc"), ("abc", "abd")], "a string, b string"
    ).select(jaro_winkler_udf("a", "b").alias("jw")).collect()
    assert rows[0].jw is None and rows[1].jw is None
    assert rows[2].jw is not None and 0.0 < rows[2].jw <= 1.0
