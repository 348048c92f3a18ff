"""Corpus-governance layer (q115-q119): the histogram-pruned mixture
sampler's equivalence property, redaction census sanity, and the plan
shapes that make the layer scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portfolio1_etl_spark.operators.mixture import (
    budget_prefix_select,
    naive_budget_prefix,
)
from portfolio1_etl_spark.plans import REGISTRY


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _skewed(spark):
    """3 groups: g0 huge (the skew case), g1 tiny, g2 empty-budget;
    weights vary so budget boundaries land mid-bucket for small
    bucket_div values."""
    rows = [(f"g0", i, (i * 2654435761) % 997, 1 + i % 7) for i in range(400)]
    rows += [("g1", 1000 + i, i * 13, 5) for i in range(5)]
    rows += [("g2", 2000 + i, i * 31, 10) for i in range(20)]
    return spark.createDataFrame(
        rows, "source string, doc_id long, k long, n_tokens long"
    )


@pytest.mark.parametrize("bucket_div", [1, 7, 64, 10**9])
def test_budget_prefix_matches_naive_across_bucket_sizes(spark, bucket_div):
    """bucket_div=1 → every key its own bucket (pure histogram path);
    huge → one bucket per group (pure window path); mid values mix
    both. All must equal the naive full-window specification."""
    d = _skewed(spark)
    budgets = spark.createDataFrame(
        [("g0", 300), ("g1", 10_000), ("g2", 0)], "source string, budget long"
    )
    got = budget_prefix_select(d, budgets, bucket_div=bucket_div)
    want = naive_budget_prefix(d, budgets)
    assert _rows(got) == _rows(want)
    # sanity on the crafted shape: g0 is cut, g1 fully kept, g2 empty
    per_group = dict(
        got.groupBy("source").count().rdd.map(tuple).collect()
    )
    assert per_group.get("g1") == 5 and "g2" not in per_group
    assert 0 < per_group["g0"] < 400


def test_budget_crossing_row_is_kept(spark):
    """Greedy prefix semantics: the row that CROSSES the budget stays
    (cum_before < budget), so a group's selected weight may exceed the
    budget by at most one row."""
    d = spark.createDataFrame(
        [("g", i, i, 10) for i in range(5)],
        "source string, doc_id long, k long, n_tokens long",
    )
    budgets = spark.createDataFrame([("g", 25)], "source string, budget long")
    got = budget_prefix_select(d, budgets, bucket_div=2)
    assert sorted(r.doc_id for r in got.collect()) == [0, 1, 2]  # 10+10 < 25 → keep 3rd


def test_q115_redaction_census_has_real_hits(spark, sf_dir):
    out = REGISTRY["q115_pii_redact"].fn(spark, sf_dir)
    agg = out.agg(
        F.sum("n_ent").alias("ent"),
        F.sum("n_email").alias("em"),
        F.sum("n_ip").alias("ip"),
        F.sum("n_number").alias("num"),
    ).first()
    # deny-list terms occur in the synthetic corpus → real redactions;
    # PII shapes do not → the same query pins zero false positives.
    assert agg.ent > 0
    assert (agg.em, agg.ip, agg.num) == (0, 0, 0)


def test_q117_pack_intervals_tile_each_shard(spark, sf_dir):
    """Within a shard the doc intervals [start, start+n) must tile
    [0, total) exactly — no gaps, no overlaps — or the packer would
    drop or duplicate training tokens."""
    out = REGISTRY["q117_sequence_pack"].fn(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.start_tok)
        pos = 0
        for r in rows:
            assert r.start_tok == pos
            assert r.first_pack == pos // 512
            assert r.last_pack == (pos + r.n_tokens - 1) // 512
            pos += r.n_tokens


def test_q118_logprob_bounds(spark, sf_dir):
    """Unigram log-probs are negative; ppl ≥ 1; and a doc of only
    corpus-frequent words scores above the corpus-rare tail."""
    out = REGISTRY["q118_unigram_logprob"].fn(spark, sf_dir)
    bad = out.filter((F.col("avg_logprob") >= 0) | (F.col("ppl") < 1.0)).count()
    assert bad == 0


def test_q119_kl_nonnegative_and_complete(spark, sf_dir):
    out = REGISTRY["q119_source_kl"].fn(spark, sf_dir).collect()
    assert {r.source for r in out} == {f"src{i}" for i in range(20)}
    assert all(r.kl_nats >= 0 for r in out)  # Gibbs' inequality


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_redaction_plan_is_narrow_map(spark, sf_dir):
    """q115 streams the corpus through codegen: no Exchange at all."""
    plan = _formatted_plan(REGISTRY["q115_pii_redact"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree


def test_sequence_pack_plan_has_single_shard_exchange(spark, sf_dir):
    """q117: ONE shuffle (the shard window) and nothing keyed on a
    low-cardinality column other than the uniform hash shard."""
    plan = _formatted_plan(REGISTRY["q117_sequence_pack"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
