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


def _logreg_sql(rounds: int = _ROUNDS, lr: float = _LR) -> str:
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
    return "WITH " + ",\n    ".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)


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
    d = catalog.load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    is_stop = lambda x: (x == "the") | (x == "a") | (x == "of") | (x == "and")  # noqa: E731
    feats = d.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        F.round(F.size(F.filter(toks, is_stop)).cast("double") / n, 6).alias("x1"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6).alias("x2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    return train_logreg(feats, rounds=_ROUNDS, lr=_LR)
