"""Per-query profiling harness for the optimization rounds.

For each named query (default: the bench top-N by the newest
bench_full artifact): time the Python-side plan construction
(``fn(spark, sf_dir)`` — py4j round-trips, scratch-dir rebuilds,
index writes) separately from the Spark execution (noop sink), count
the Spark jobs each phase launched, and optionally dump
``explain('formatted')`` to ``plans/<round>/<name>_<tag>.txt``
(``--round``, default r14).

Usage:
    python tools/profile_query.py [--sf DIR] [--plans TAG] [--runs N] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from portfolio1_etl_spark import get_spark
from portfolio1_etl_spark.plans import REGISTRY


def _job_count(spark) -> int:
    """Total jobs submitted so far (monotone counter)."""
    tracker = spark.sparkContext.statusTracker()
    ids = tracker.getJobIdsForGroup(None)
    return max(ids) + 1 if ids else 0


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {
        a.split("=", 1)[0]: (a.split("=", 1)[1] if "=" in a else "")
        for a in sys.argv[1:]
        if a.startswith("--")
    }
    sf_dir = opts.get("--sf", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    runs = int(opts.get("--runs", "2"))
    plans_tag = opts.get("--plans")  # e.g. "before" / "after"

    spark = get_spark(app_name="profile")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", opts.get("--round", "r14"))
    os.makedirs(plans_dir, exist_ok=True)

    names = args or list(REGISTRY)
    # warm-up
    REGISTRY["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    print(f"{'query':40s} {'build_s':>8s} {'exec_s':>8s} {'jobs':>5s}")
    for name in names:
        spark.sparkContext.setJobDescription(name)
        best_build, best_exec, jobs_run = float("inf"), float("inf"), -1
        for _ in range(runs):
            j0 = _job_count(spark)
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j1 = _job_count(spark)
            if (t2 - t0) < (best_build + best_exec):
                best_build, best_exec, jobs_run = t1 - t0, t2 - t1, j1 - j0
            import gc

            gc.collect()
            spark.catalog.clearCache()
        if plans_tag:
            try:
                plan = REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w") as f:
                    f.write(plan)
            except Exception as e:  # noqa: BLE001 — diagnostic path
                print(f"#  explain failed for {name}: {e}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
        print(f"{name:40s} {best_build:8.2f} {best_exec:8.2f} {jobs_run:5d}")

    spark.stop()


if __name__ == "__main__":
    main()
