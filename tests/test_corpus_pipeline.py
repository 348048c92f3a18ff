"""End-to-end corpus-prep pipeline — row accounting and stage
consistency against the oracle-checked query semantics it reuses."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from portfolio1_etl_spark import catalog
from portfolio1_etl_spark.corpus_pipeline import prepare_corpus

SF = "/root/testdata/sf0.001"


def test_row_accounting_and_reasons(spark):
    res = prepare_corpus(spark, SF)
    assert res.n_input == catalog.load(spark, SF, "documents").count()
    by_reason = {
        r["drop_reason"]: r["n"]
        for r in res.decisions.groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every document gets exactly one verdict; kept == NULL reason
    assert sum(by_reason.values()) == res.n_input
    assert by_reason.get(None, 0) == res.n_kept
    # sf0.001 has no exact dupes (all 500 texts unique) but does have
    # near-dups, contamination, and the eval slice
    assert by_reason.get("near_duplicate", 0) > 0
    assert by_reason.get("contaminated", 0) > 0
    assert by_reason.get("eval_slice", 0) > 0
    assert res.n_kept > 0


def test_kept_set_consistency(spark):
    res = prepare_corpus(spark, SF)
    kept_ids = {r["doc_id"] for r in res.kept.select("doc_id").collect()}
    # no eval docs in the training output
    assert not any(i % 50 == 0 for i in kept_ids)
    # exact-dup survivors: kept ids must be the min doc_id of their hash
    docs = catalog.load(spark, SF, "documents")
    min_per_hash = {
        r["m"]
        for r in docs.groupBy(F.md5("text")).agg(F.min("doc_id").alias("m")).collect()
    }
    assert kept_ids <= min_per_hash


def test_jsonl_sink_round_trip(spark, tmp_path):
    out = str(tmp_path / "corpus_out")
    res = prepare_corpus(spark, SF, out_path=out)
    lines = []
    for f in glob.glob(out + "/part-*"):
        with open(f) as fh:
            lines += [json.loads(line) for line in fh if line.strip()]
    assert len(lines) == res.n_kept
    assert {"doc_id", "text", "lang", "pii"} <= set(lines[0])


def test_eval_exact_dup_still_contaminates(spark):
    """A training doc byte-identical to an eval doc must be dropped
    even though exact dedup removes the eval copy first — the eval
    shingle set comes from ALL documents, not survivors."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (10, shared, "en"),                     # training, dup of eval 100
        (100, shared, "en"),                    # eval slice (100 % 50 == 0)
        (11, "one two three four five six seven eight", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    res = prepare_corpus(spark, SF, docs=docs)
    verdicts = {
        r["doc_id"]: r["drop_reason"] for r in res.decisions.collect()
    }
    # 100 loses exact dedup to min-id 10, but 10 must NOT reach training
    assert verdicts[100] == "exact_duplicate"
    assert verdicts[10] == "contaminated"
    assert verdicts[11] is None
