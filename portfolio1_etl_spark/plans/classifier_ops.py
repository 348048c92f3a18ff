"""[ext] Trainable quality classifier (r6): logistic regression over
per-document heuristic features, trained IN the engine (full-batch
gradient descent as DataFrame algebra, operators/logreg.py) and
replayed round-by-round by the DuckDB oracle through unrolled CTEs —
the supervised counterpart of the fixed-weight q62 gate.

Reference analogue: the hand-written cleanup rules of
portfolio-etl.py:602-613 (drop header-ish rows, normalize) are the
fixed-weight ancestor of a learned keep/drop policy.

The synthetic label is language identity (y = lang=='en'): not a
claim about quality, but a reproducible target that makes the whole
optimizer — gradients, updates, decision boundary — value-hashed on
the scoreboard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.operators.logreg import train_logreg
from portfolio1_etl_spark.plans.registry import query

_ROUNDS = 10
_LR = 2.0

#: feature CTE shared by the oracle; features round to 6 dp so both
#: engines train on identical decimals.
_FEATS_SQL = """
    f AS MATERIALIZED (
      SELECT doc_id,
             1.0 AS x0,
             round(CAST(len(list_filter(string_split(text, ' '),
                   t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and')) AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS x1,
             round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS x2,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    )
"""


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x0, x1, x2, y): the 6-dp-rounded heuristic features and
    the synthetic language label shared by q126 (training) and q258
    (calibration)."""
    d = catalog.load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    is_stop = lambda x: (x == "the") | (x == "a") | (x == "of") | (x == "and")  # noqa: E731
    return d.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        F.round(F.size(F.filter(toks, is_stop)).cast("double") / n, 6).alias("x1"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6).alias("x2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )


def _logreg_weight_ctes(rounds: int = _ROUNDS, lr: float = _LR):
    """The unrolled GD CTE chain shared by q126 (full per-round board)
    and q258 (calibration over the FINAL weights). Returns
    (ctes, per_round_finals, final_weights_cte_name)."""
    ctes = [_FEATS_SQL, "w0cte AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"]
    finals = []
    prev = "w0cte"
    for r in range(1, rounds + 1):
        p = "(1.0 / (1.0 + exp(-(w0 * x0 + w1 * x1 + w2 * x2))))"
        ctes.append(
            f"g{r} AS MATERIALIZED (SELECT avg(({p} - y) * x0) AS g0, "
            f"avg(({p} - y) * x1) AS g1, avg(({p} - y) * x2) AS g2 "
            f"FROM f, {prev})"
        )
        ctes.append(
            f"w{r}cte AS MATERIALIZED (SELECT round(w0 - {lr} * g0, 8) + 0.0 AS w0, "
            f"round(w1 - {lr} * g1, 8) + 0.0 AS w1, round(w2 - {lr} * g2, 8) + 0.0 AS w2 "
            f"FROM {prev}, g{r})"
        )
        ctes.append(
            f"a{r} AS MATERIALIZED (SELECT CAST(sum(CASE WHEN "
            f"((w0 * x0 + w1 * x1 + w2 * x2) >= 0) = (y >= 0.5) "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS n_correct FROM f, w{r}cte)"
        )
        finals.append(
            f"SELECT CAST({r} AS BIGINT) AS round, w0, w1, w2, n_correct "
            f"FROM w{r}cte, a{r}"
        )
        prev = f"w{r}cte"
    return ctes, finals, prev


def _logreg_sql(rounds: int = _ROUNDS, lr: float = _LR) -> str:
    ctes, finals, _ = _logreg_weight_ctes(rounds, lr)
    return "WITH " + ",\n    ".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


def _calibration_sql(rounds: int = _ROUNDS, lr: float = _LR) -> str:
    ctes, _, wfinal = _logreg_weight_ctes(rounds, lr)
    ctes = list(ctes)
    ctes.append(
        "scored AS MATERIALIZED (SELECT doc_id, y, CAST(round((1.0 / (1.0 + "
        f"exp(-round(w0 * x0 + w1 * x1 + w2 * x2, 6)))) * 1000000, 0) "
        f"AS BIGINT) AS p6e6 FROM f, {wfinal})"
    )
    ctes.append(
        "binned AS (SELECT CAST(ntile(10) OVER (ORDER BY p6e6, doc_id) "
        "AS BIGINT) AS bin, y, p6e6 FROM scored)"
    )
    return (
        "WITH " + ",\n    ".join(ctes) + "\n"
        "SELECT CAST(bin AS BIGINT) AS bin,\n"
        "       CAST(count(*) AS BIGINT) AS n_docs,\n"
        "       round(CAST(sum(p6e6) AS BIGINT) / CAST(count(*) AS DOUBLE)\n"
        "             / 1000000.0, 6) AS mean_confidence,\n"
        "       round(CAST(sum(CAST(y AS BIGINT)) AS BIGINT)\n"
        "             / CAST(count(*) AS DOUBLE), 6) AS observed_rate,\n"
        "       round(abs(round(CAST(sum(p6e6) AS BIGINT)\n"
        "                       / CAST(count(*) AS DOUBLE) / 1000000.0, 6)\n"
        "                 - round(CAST(sum(CAST(y AS BIGINT)) AS BIGINT)\n"
        "                         / CAST(count(*) AS DOUBLE), 6)), 6)\n"
        "         AS calibration_gap\n"
        "FROM binned GROUP BY bin\n"
    )


@query(
    "q126_logreg_quality",
    sql=_logreg_sql(),
    operators=("X-classifier", "X-quality", "A1"),
)
def q126_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression classifier on (stopword ratio,
    lexical diversity) → language label, 10 full-batch GD rounds run
    entirely as DataFrame aggregates; each round's row carries the
    8-dp weights and the training-set correct count under them. The
    oracle replays the optimizer itself (unrolled CTEs), so gradient
    math, the update rule, and the decision boundary are all hash-
    pinned — the per-round weight rounding is what keeps two engines'
    exp() ulps from ever compounding.

    Scale: the feature extraction is one narrow pass (materialized);
    each round is ONE 1-row mean-gradient aggregate + a broadcast
    update — weights never visit the driver."""
    return train_logreg(_features(spark, sf_dir), rounds=_ROUNDS, lr=_LR)


@query(
    "q258_calibration_bins",
    sql=_calibration_sql(),
    operators=("X-calibration", "X-classifier", "A1"),
)
def q258_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the q126 classifier: documents bucket
    into EQUAL-MASS probability deciles (adaptive calibration bins —
    fixed-width deciles collapse to one cell when a lightly-trained
    model concentrates its scores) under the FINAL trained weights, and
    each bin reports mean confidence vs observed positive rate — the
    per-bin terms of expected calibration error, the check a model-
    gated curation pipeline runs before trusting classifier scores as
    sampling weights. Numerics: the margin rounds to 6 dp BEFORE the
    sigmoid (exp ulps must not pick a bin), probabilities snap to
    scaled BIGINT, and the equal-mass decile comes from
    operators/ranks.with_exact_rank + ntile arithmetic over a total
    order (p6e6, doc_id) — no partitionless window, engine-exact bin
    membership; the two per-bin ratios round from exact integer sums
    and the gap subtracts the ROUNDED pair.
    Scale: training is q126's machinery (1-row aggregates per round);
    scoring is one broadcast-weights map over the feature table; the
    output is 10 rows at any corpus size."""
    from portfolio1_etl_spark.operators.ranks import (
        ntile_from_rank,
        with_exact_rank,
    )

    feats = _features(spark, sf_dir)
    w = (
        train_logreg(feats, rounds=_ROUNDS, lr=_LR)
        .filter(F.col("round") == _ROUNDS)
        .select("w0", "w1", "w2")
    )
    z6 = F.round(
        F.col("w0") * F.col("x0")
        + F.col("w1") * F.col("x1")
        + F.col("w2") * F.col("x2"),
        6,
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z6))
    scored = feats.crossJoin(F.broadcast(w)).select(
        "doc_id", "y", F.round(prob * 1000000, 0).cast("long").alias("p6e6")
    )
    ranked = with_exact_rank(
        scored,
        order_by=[F.col("p6e6"), F.col("doc_id")],
        bucket=F.expr("p6e6 div 1000"),
    )
    binned = ranked.select(
        ntile_from_rank(F.col("_rank"), F.col("_n"), 10)
        .cast("long")
        .alias("bin"),
        "y",
        "p6e6",
    )
    n_docs = F.count(F.lit(1))
    conf = F.round(
        F.sum("p6e6").cast("long").cast("double") / n_docs / 1000000.0, 6
    )
    obs = F.round(
        F.sum(F.col("y").cast("long")).cast("long").cast("double") / n_docs, 6
    )
    return binned.groupBy("bin").agg(
        n_docs.cast("long").alias("n_docs"),
        conf.alias("mean_confidence"),
        obs.alias("observed_rate"),
        F.round(F.abs(conf - obs), 6).alias("calibration_gap"),
    ).select(
        F.col("bin").cast("long").alias("bin"),
        "n_docs",
        "mean_confidence",
        "observed_rate",
        "calibration_gap",
    )
