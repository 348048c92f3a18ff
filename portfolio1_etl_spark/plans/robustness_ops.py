"""[ext] Scale-hygiene operators promoted onto the oracle scoreboard
(r6): the salted skew join and the pandas-UDAF harness previously
carried only pytest twins (SURVEY §2.5 J-skew, §2.12) — these rows
give them driver-checkable correctness entries.

Reference analogue: the retail-sold x skus_map join of
portfolio-etl.py:623 is the shape that goes skewed in production (one
hot sku dominating sales) — q130 is that join with the salt spread;
the UDF rows exercise the Python boundary the reference lived
entirely inside (pandas row loops, :63-76, :129-133).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.functions.exact import dsum_money
from portfolio1_etl_spark.functions.numeric import zround
from portfolio1_etl_spark.operators.joins import salted_join
from portfolio1_etl_spark.plans.registry import query

_CUTOFF = 480000  # high-value orders: the same ~4% slice as q104


@query(
    "q130_salted_join",
    sql=f"""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(l.l_orderkey) AS BIGINT) AS key_checksum,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > {_CUTOFF}
    GROUP BY o.o_orderpriority
    """,
    operators=("J-skew", "A1", "J3"),
)
def q130_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SALTED join under the oracle gate: lineitem (the big,
    potentially skewed side) joins the high-value order slice with an
    8-way salt — the manual skew spread for when one key dominates a
    reducer and AQE's split isn't enough. The oracle is the PLAIN
    join: salting must be invisible in the result (identical rows,
    only the shuffle layout changes), and this row value-hashes that
    invariant per round instead of trusting a unit test.

    Scale: the salt spreads each hot key across 8 reducer partitions;
    the replicated side is the ~4% filtered slice (×8 ≈ a third of
    one fact partition). Decimal-cast quantity sum keeps the census
    engine-exact."""
    li = catalog.load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("key"), "l_quantity"
    )
    o = (
        catalog.load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > _CUTOFF)
        .select(F.col("o_orderkey").alias("key"), "o_orderpriority")
    )
    j = salted_join(li, o, "key", n_salts=8)
    return j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("key").cast("long").alias("key_checksum"),
        dsum_money(F.col("l_quantity").cast("double")).alias("sum_qty"),
    )


@query(
    "q131_udaf_geomean",
    sql="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (l_quantity > 0) AS BIGINT) AS n_pos,
           round(exp(avg(ln(CAST(l_quantity AS DOUBLE))) FILTER (l_quantity > 0)), 6)
             AS geomean_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    operators=("UDF-udaf", "A1"),
)
def q131_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas-UDAF harness under the oracle gate: per-group
    geometric mean of quantity computed by the Arrow grouped-agg UDF
    (operators/udfs.geometric_mean_udaf — a genuine UDAF with no
    single-aggregate builtin), checked against DuckDB's
    exp(avg(ln(x))) identity. 6-dp rounding absorbs the summation-
    order difference between numpy's mean and the SQL average; the
    positive-count column pins that both engines filtered the same
    rows. Scale note (from the UDAF's docstring): grouped-agg buffers
    one group's column per task — the expression twin with map-side
    partials is the power-law-keys path."""
    from portfolio1_etl_spark.operators.udfs import geometric_mean_udaf

    li = catalog.load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("double").alias("q")
    )
    # a grouped-agg pandas UDF cannot share an agg with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — the positive count computes in
    # a separate tiny aggregate and joins back on the 3-row group key
    geo = li.groupBy("l_returnflag").agg(
        F.round(geometric_mean_udaf(F.col("q")), 6).alias("geomean_qty")
    )
    counts = li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("q") > 0, 1).otherwise(0)).cast("long").alias("n_pos")
    )
    return counts.join(geo, "l_returnflag").select(
        "l_returnflag", "n_pos", "geomean_qty"
    )


@query(
    "q132_udf_scalar_tokens",
    sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_udf
    FROM documents
    """,
    operators=("UDF-scalar", "X-tokens"),
)
def q132_udf_scalar_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow SCALAR pandas UDF under the oracle gate: per-doc
    token counts through operators/udfs.token_count_udf (batch
    Series→Series) vs the SQL split length — the harness itself
    (Arrow transfer, batch slicing, type mapping) is what this row
    checks; production plans use the builtin (the UDF's own
    docstring)."""
    from portfolio1_etl_spark.operators.udfs import token_count_udf

    d = catalog.load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", token_count_udf(F.col("text")).alias("n_tokens_udf")
    )


@query(
    "q133_udf_groupedmap_zscore",
    sql="""
    WITH s AS (
      SELECT doc_id, source,
             CAST(n_chars AS DOUBLE) AS v,
             avg(CAST(n_chars AS DOUBLE)) OVER (PARTITION BY source) AS mu,
             stddev_samp(CAST(n_chars AS DOUBLE)) OVER (PARTITION BY source) AS sd
      FROM documents
    )
    SELECT doc_id, source,
           round(CASE WHEN sd > 0 THEN (v - mu) / sd ELSE 0.0 END, 6) + 0.0 AS zscore
    FROM s
    """,
    operators=("UDF-groupedmap", "X-quality"),
)
def q133_udf_groupedmap_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED-MAP (applyInPandas) harness under the oracle gate:
    per-source z-scores of document length through
    operators/udfs.zscore_per_group vs the SQL window mean/stddev
    identity, 6 dp (pandas ddof=1 == stddev_samp; summation-order
    noise is far below the 6th decimal on ≤500-row groups). Scale
    note from the operator: one group per task — bounded groups only;
    power-law keys take the built-in window twin this oracle is."""
    from portfolio1_etl_spark.operators.udfs import zscore_per_group

    d = catalog.load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("v")
    )
    z = zscore_per_group(d, "source", "v")
    return z.select(
        "doc_id",
        "source",
        zround(F.col("zscore"), 6).alias("zscore"),
    )


@query(
    "q134_udtf_ngrams",
    sql="""
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           array_to_string(string_split(text, ' ')[i : i + 2], ' ') AS ngram
    FROM documents,
         LATERAL unnest(generate_series(1,
             greatest(len(string_split(text, ' ')) - 2, 0))) AS u(i)
    """,
    operators=("UDF-udtf", "X-tokens", "F3"),
)
def q134_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python UDTF harness (Spark 4, one row → many rows) under
    the oracle gate: per-doc word 3-grams with positions through
    operators/udfs.ngram_udtf, checked against the SQL slice-unnest
    identity — with q131-q133 this closes the loop: EVERY §2.12
    Python-boundary shape is differentially tested. Production
    shingling stays the codegen expression form (operators/dedup);
    lateral-join the UDTF only where per-row Python is genuinely
    required."""
    from portfolio1_etl_spark.operators.udfs import ngram_udtf

    d = catalog.load(spark, sf_dir, "documents")
    spark.udtf.register("q134_ngrams", ngram_udtf())
    d.select("doc_id", "text").createOrReplaceTempView("q134_docs")
    return spark.sql(
        "SELECT d.doc_id, CAST(g.pos AS BIGINT) AS pos, g.ngram "
        "FROM q134_docs d, LATERAL q134_ngrams(d.text, 3) g"
    )


# ---------------------------------------------------------------------------
# q280 — join-key skew diagnostics (r11)
# ---------------------------------------------------------------------------

#: join keys q280 profiles: (label, table, key column)
_SKEW_KEYS = (
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
)


def _skew_sql() -> str:
    parts = []
    for label, table, key in _SKEW_KEYS:
        parts.append(f"""
    SELECT '{label}' AS join_key, n_keys, total_rows, max_cnt,
           top_share_ppm, median_cnt, p99_cnt,
           max_cnt * 1000000 // median_cnt AS skew_ratio_ppm,
           CASE WHEN top_share_ppm >= 5000 THEN 'salt'
                WHEN n_keys <= 10000 THEN 'broadcast'
                ELSE 'shuffle-hash' END AS recommend
    FROM (
      SELECT CAST(sum(freq) AS BIGINT) AS n_keys,
             CAST(sum(cnt * freq) AS BIGINT) AS total_rows,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             CAST(max(cnt) * 1000000 // sum(cnt * freq) AS BIGINT)
                 AS top_share_ppm,
             CAST(min(CASE WHEN cum >= nk // 2 + 1
                      THEN cnt END) AS BIGINT) AS median_cnt,
             CAST(min(CASE WHEN cum * 100 >= 99 * nk
                      THEN cnt END) AS BIGINT) AS p99_cnt
      FROM (
        SELECT cnt, freq, sum(freq) OVER (ORDER BY cnt) AS cum,
               sum(freq) OVER () AS nk
        FROM (SELECT cnt, count(*) AS freq
              FROM (SELECT {key}, count(*) AS cnt
                    FROM {table} GROUP BY 1)
              GROUP BY 1))
    )""")
    return "\nUNION ALL\n".join(parts)


@query(
    "q280_skew_diagnostics",
    sql=_skew_sql(),
    operators=("X-skew-advisor", "X-data-profiling", "A1", "W-frame"),
)
def q280_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the profiler that decides BETWEEN
    this engine's join strategies (q130's salting, q08's broadcast,
    the default shuffle hash) before a production join runs: for each
    candidate key, the per-key count distribution collapses to
    COUNT-OF-COUNTS grain (cnt → how many keys have that cnt — the
    domain a count distribution actually lives in: a few hundred
    distinct multiplicities even when the key has 200M values), and
    median / p99 / top-share read off its cumulative sum as exact
    order statistics. The two-level aggregate is the scale move: the
    first group-by is the only key-grain shuffle, the count-of-counts
    frame is domain-bounded (same sanction class as q227's histogram
    cells), and everything downstream is integer arithmetic — ppm
    shares by integer floor division, never a float. The recommend
    column encodes the engine's own playbook: ≥0.5% single-key share
    → salt (AQE skew splits help reads, not the hot reducer's write);
    small key domain → broadcast the dim side; else shuffle-hash."""
    out = None
    for label, table, key in _SKEW_KEYS:
        t = catalog.load(spark, sf_dir, table)
        per_key = t.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
        dist = per_key.groupBy("cnt").agg(F.count(F.lit(1)).alias("freq"))
        wcum = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
        wall = Window.partitionBy()
        cum = dist.select(
            "cnt",
            "freq",
            F.sum("freq").over(wcum).alias("cum"),
            F.sum("freq").over(wall).alias("nk"),
        )
        stats = cum.agg(
            F.sum("freq").cast("long").alias("n_keys"),
            F.sum(F.col("cnt") * F.col("freq")).cast("long").alias("total_rows"),
            F.max("cnt").cast("long").alias("max_cnt"),
            # exact bigint order statistics: `div` keeps the median
            # threshold and the ppm shares in integer arithmetic at ANY
            # magnitude — double-floor drifts by 1 once the products
            # pass 2^53, breaking the bit-identical oracle contract
            F.min(
                F.when(
                    F.col("cum") >= F.expr("nk div 2") + 1, F.col("cnt")
                )
            )
            .cast("long")
            .alias("median_cnt"),
            F.min(
                F.when(F.col("cum") * 100 >= 99 * F.col("nk"), F.col("cnt"))
            )
            .cast("long")
            .alias("p99_cnt"),
        )
        row = stats.select(
            F.lit(label).alias("join_key"),
            "n_keys",
            "total_rows",
            "max_cnt",
            F.expr("max_cnt * 1000000L div total_rows")
            .cast("long")
            .alias("top_share_ppm"),
            "median_cnt",
            "p99_cnt",
            F.expr("max_cnt * 1000000L div median_cnt")
            .cast("long")
            .alias("skew_ratio_ppm"),
            F.when(F.expr("max_cnt * 1000000L div total_rows") >= 5000, "salt")
            .when(F.col("n_keys") <= 10000, "broadcast")
            .otherwise("shuffle-hash")
            .alias("recommend"),
        )
        out = row if out is None else out.unionByName(row)
    return out
