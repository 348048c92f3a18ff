"""Second-decade scale spot-check (r12 — the r11 verdict's ask #3).

The sf1 board (tools/scaling_check.py) measures one decade of scale
(sf0.1 → sf1). This tool extends the heaviest queries one decade
further: times them at sf1 AND at a 100×-amplified sf10
(tools/gen_scale.py run at factor 100 from sf0.1 — NOT composed on
the sf1 output, whose per-copy key offsets would collide), grading
each sf1→sf10 ratio against the same ≤15×-per-10×-data bar. A query
that is linear through the first decade but hides a value-space or
fan-out defect (the r11 q75 16-bit simhash lesson) shows up HERE.

Results land in the newest ``scaling_r{N}.json`` under an
``sf10_spot`` key (the artifact the judge and SCALING.md read).

Usage:
  python tools/gen_scale.py /root/testdata/sf0.1 /tmp/spark_graft_sf10 100
  python tools/scaling_spot.py [sf10_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from portfolio1_etl_spark import get_spark
from portfolio1_etl_spark.plans import REGISTRY

#: the heaviest sf1 rows of the r11 scaling board — the queries whose
#: second decade is worth the sf10 wall-clock
QUERIES = [
    "q129_dedup_recall",
    "q237_clustering_coefficient",
    "q254_neighborhood_features",
    "q114_ann_recall",
    "q277_poisson_bootstrap_ci",
    # joined the sf1 top tier after the r12 q105/q129 fixes shrank
    # everything above it: bigram explode, linear in tokens by design
    "q69_langid_classifier",
]

BAR = 15.0


def _env_block() -> dict:
    try:
        la1, la5, _ = os.getloadavg()
    except OSError:
        la1 = la5 = -1.0
    ncpu = os.cpu_count() or 0
    return {
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
        "cpus": ncpu,
        "loaded": la1 > 0.25 * ncpu,
    }


def _time(spark, name: str, sf_dir: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.monotonic() - t0)
    # Release plan/broadcast/shuffle references between measurements —
    # the same inter-query hygiene bench.py applies. Without it the
    # JVM degrades across the run (measured in the r12 sf10 spot:
    # q254's sf1 leg 53.6 s on the fresh board vs 137.0 s late in a
    # degraded JVM, and q237's ratio swung 9.7x -> 17.5x between runs).
    import gc

    gc.collect()
    spark.catalog.clearCache()
    return best


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf10 = args[0] if args else "/tmp/spark_graft_sf10"
    runs = int(args[1]) if len(args) > 1 else 1
    # --queries=a,b,c overrides the curated spot set — what
    # scaling_check --decades 2 passes (its board's top tier), so the
    # second decade always tracks the CURRENT heaviest queries instead
    # of a hand-edited list
    queries = QUERIES
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            queries = [q for q in a.split("=", 1)[1].split(",") if q]
    bad = [q for q in queries if q not in REGISTRY]
    if bad:
        print(f"unknown queries: {bad}", file=sys.stderr)
        return 2
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    # ambient env BEFORE the run — at write time the loadavg would be
    # the spot-check's own 32-thread work and 'loaded' would self-flag
    env = _env_block()
    # a 100x dataset in ONE local JVM needs the heap sized to match —
    # the same sizing a cluster does per executor. 16g (the sf0.1/sf1
    # default) OOMed q254's sf10 hop-2 aggregate: 32 concurrent tasks
    # x 256 MB page requests. Overridable via the env var.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = get_spark()
    REGISTRY["q01_pricing_summary"].fn(spark, sf1).write.format("noop").mode(
        "overwrite"
    ).save()
    rows = {}
    for name in queries:
        t1 = _time(spark, name, sf1, runs)
        t10 = _time(spark, name, sf10, runs)
        ratio = t10 / t1 if t1 > 0 else float("inf")
        rows[name] = {
            "sf1_sec": round(t1, 3),
            "sf10_sec": round(t10, 3),
            "ratio": round(ratio, 2),
            "pass": ratio <= BAR,
        }
        print(
            f"{name}: {t1:.2f}s -> {t10:.2f}s ({ratio:.1f}x) "
            f"{'ok' if ratio <= BAR else 'OVER BAR'}",
            flush=True,
        )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(
        (f for f in os.listdir(here)
         if f.startswith("scaling_r") and f.endswith(".json")),
        key=lambda f: int(f.split("_r")[1].split(".")[0]),
    )
    if not arts:
        print("no scaling_r{N}.json to attach to", file=sys.stderr)
        return 2
    path = os.path.join(here, arts[-1])
    with open(path) as fh:
        art = json.load(fh)
    # --merge: fold these rows into an EXISTING sf10_spot instead of
    # replacing it — the single-query adjudication path (a row timed
    # late in a degraded JVM re-measures alone in a fresh one; the
    # other rows keep their numbers and their env). Each merged row
    # records the env it was measured under.
    merge = "--merge" in sys.argv and "sf10_spot" in art
    if merge:
        spot = art["sf10_spot"]
        for n, r in rows.items():
            spot["queries"][n] = {**r, "remeasured_env": env}
        spot["failures"] = [
            n for n, r in spot["queries"].items() if not r["pass"]
        ]
    else:
        art["sf10_spot"] = {
            "bar": BAR,
            "factor": 10,
            "runs": runs,
            "env": env,
            "loadavg_end_1m": _env_block()["loadavg_1m"],
            "queries": rows,
            "failures": [n for n, r in rows.items() if not r["pass"]],
        }
    with open(path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(f"attached sf10_spot to {path}" + (" [merged]" if merge else ""))
    return 1 if art["sf10_spot"]["failures"] else 0


if __name__ == "__main__":
    sys.exit(main())
