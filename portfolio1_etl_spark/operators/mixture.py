"""Budgeted greedy-prefix selection — the domain-mixture sampler's
core (q116): per partition key, keep rows in deterministic key order
until a weight budget is met, WITHOUT running an ordered window over
any full partition.

Semantics (the naive form): order each group's rows by ``key_col``
(ties by ``id_col``); a row is selected iff the sum of weights of all
earlier rows in its group is < the group's budget (so the budget-
crossing row is kept — greedy prefix by cum-before).

Scale shape: a domain can be half the corpus, so the naive per-group
cumsum window is a one-task skew-killer. This implementation prunes
with a per-group histogram over ``key div bucket_div`` buckets:
(1) one small aggregate (group × bucket → weight sum);
(2) the cut bucket per group — the first whose through-cumsum reaches
    the budget — found on that tiny table;
(3) rows below the cut are selected with a map-only broadcast filter;
    only the single cut bucket per group (a bounded sliver) pays the
    ordered window, seeded with the exact cumulative weight below it.
Selection is provably identical to the naive form because bucket
order is key order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def naive_budget_prefix(
    d: DataFrame,
    budgets: DataFrame,
    *,
    group_col: str = "source",
    key_col: str = "k",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """The specification: full per-group cumsum window (test reference
    only — one task per group at scale)."""
    win = (
        W.partitionBy(group_col)
        .orderBy(key_col, id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        d.withColumn("_cum", F.coalesce(F.sum(weight_col).over(win), F.lit(0)))
        .join(budgets, group_col)
        .filter(F.col("_cum") < F.col("budget"))
        .drop("_cum", "budget")
    )


def budget_prefix_select(
    d: DataFrame,
    budgets: DataFrame,
    *,
    group_col: str = "source",
    key_col: str = "k",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    bucket_div: int = 2**40,
) -> DataFrame:
    """Histogram-pruned greedy prefix, equal to ``naive_budget_prefix``
    row-for-row (property-tested across bucket_div extremes).

    ``budgets`` must have columns (group_col, budget); it is broadcast
    — one row per group by contract."""
    cols = d.columns
    key: Column = F.col(key_col)
    b = d.withColumn("_bucket", key - (key % F.lit(bucket_div)))

    hist = b.groupBy(group_col, "_bucket").agg(F.sum(weight_col).alias("_btok"))
    wcum = W.partitionBy(group_col).orderBy("_bucket")
    cum = hist.withColumn("_cum_through", F.sum("_btok").over(wcum)).join(
        F.broadcast(budgets), group_col
    )
    cuts = (
        cum.groupBy(group_col, "budget")
        .agg(
            F.min(
                F.when(F.col("_cum_through") >= F.col("budget"), F.col("_bucket"))
            ).alias("_cut"),
            F.max(
                F.when(F.col("_cum_through") < F.col("budget"), F.col("_cum_through"))
            ).alias("_below"),
        )
        .select(
            group_col,
            "budget",
            F.coalesce("_cut", F.lit(2**62)).alias("_cut"),
            F.coalesce("_below", F.lit(0)).alias("_below"),
        )
    )

    j = b.join(F.broadcast(cuts), group_col)
    low = j.filter(F.col("_bucket") < F.col("_cut"))
    win = (
        W.partitionBy(group_col)
        .orderBy(key_col, id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    edge = (
        j.filter(F.col("_bucket") == F.col("_cut"))
        .withColumn(
            "_cum",
            F.col("_below") + F.coalesce(F.sum(weight_col).over(win), F.lit(0)),
        )
        .filter(F.col("_cum") < F.col("budget"))
        .drop("_cum")
    )
    return low.unionByName(edge, allowMissingColumns=True).select(*cols)
