"""Benchmark runner — the driver's perf feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the ``noop`` datasource write —
full execution, no driver-side collect, no sink I/O in the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from portfolio1_etl_spark import get_spark
from portfolio1_etl_spark.plans import REGISTRY

#: Headline set: one per operator family that dominates runtime at scale.
HEADLINE = [
    "q01_pricing_summary",
    "q03_project_derive",
    "q08_broadcast_join",
    "q09_sortmerge_join",
    "q10_right_join_multiplier",
    "q16_agg_multi",
    "q19_window_rank",
    "q24_having",
    "q29_star_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark(app_name="bench")

    # Warm up: JVM JIT + parquet footer cache, outside the measurement.
    REGISTRY["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    names = [n for n in HEADLINE if n in REGISTRY]
    extra = [n for n in REGISTRY if n.startswith(("q7", "q8")) and n not in names]
    timings: dict[str, float] = {}
    for name in names + extra:
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
