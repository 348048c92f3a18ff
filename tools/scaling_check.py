"""The sf1 scaling checkpoint (r11 — the r10 verdict's top ask).

Times the most expensive registry queries at sf0.1 AND at a 10×
amplified sf1 (tools/gen_scale.py) in ONE warm JVM, and grades each
against a near-linear scaling bar: wall-time ratio ≤ BAR (default 15×
for 10× data — linear plus headroom for fixed overheads and the
shuffles whose cost is n·log n, not n). A query past the bar is a
plan defect (hidden quadratic constant, unbounded bucket, driver-side
state) that sf0.1 could never surface. Results land in
``scaling_r{N}.json`` and are summarized in SCALING.md.

Methodology mirrors bench.py: each query runs end-to-end through the
``noop`` datasource write (full execution, no collect, no sink I/O),
min-of-``runs`` per scale, sf0.1 first then sf1 so cache states match.

Usage:
  python tools/gen_scale.py /root/testdata/sf0.1 /tmp/spark_graft_sf1 10
  python tools/scaling_check.py [sf1_dir] [runs]

Two-decade mode (r13): ``--decades 2`` [``--sf10=DIR``] additionally
hands the board's top-5 heaviest sf1 rows to tools/scaling_spot.py in
a fresh subprocess (fresh JVM, decade-sized heap, its own sf1 re-time)
so the standing board always carries sf1 AND sf10 evidence for the
current top tier — the sf10 dataset comes from
``gen_scale.py /root/testdata/sf0.1 DIR 100``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from portfolio1_etl_spark import get_spark
from portfolio1_etl_spark.plans import REGISTRY

#: curated floor: every iterative/composed operator whose scale story
#: was previously plan-level only. The ACTUAL measured set is this
#: list UNION the top-10 most expensive queries of the newest
#: committed bench_full artifact (_bench_top) — so anything that
#: climbs the cost board is timed at sf1 automatically instead of
#: waiting for a hand edit (the r11 verdict caught q105 sharing the
#: rewritten verify path while absent from this list).
QUERIES = [
    "q105_prefix_jaccard",          # lossless candidates = verify worst case (r12)
    "q129_dedup_recall",            # composite dedup scoreboard
    "q237_clustering_coefficient",  # wedge join on the capped graph
    "q254_neighborhood_features",   # hop-2 self-join fanout
    "q114_ann_recall",              # ANN scoreboard (5 pipelines)
    "q69_langid_classifier",        # bigram explode
    "q100_corpus_prep",             # end-to-end corpus composite
    "q239_merge_into_chain",        # row-level delta commits
    "q244_incremental_join_view",   # CDC join-view algebra
    "q243_transitive_closure",      # path-doubling closure (r11 rework)
    "q139_leakage_safe_split",      # CC-cluster split
    "q75_simhash_pairs",            # pigeonhole banding
    "q89_dup_clusters",             # large/small-star CC
    "q259_golden_record",           # survivorship closure (r11 rework)
    "q265_ivfpq_index_probe",       # composed IVF-PQ build+probe (r11)
    "q263_joinview_row_deltas",     # deletes -> matview composition (r11)
    "q73_minhash_lsh",              # banded LSH core
    "q271_label_propagation",       # 3-round synchronous LPA (r11)
    "q277_poisson_bootstrap_ci",    # 64× replicate fan-out (r11)
    "q279_sequence_pattern_match",  # per-user string collect (r11)
    "q281_item_item_similarity",    # basket self-join + item rank (r11)
    "q283_kmv_intersection",        # sketch build + pair stage (r11)
]

#: data grows 10×; allow linear + fixed-overhead/log headroom
BAR = 15.0


def _bench_top(here: str, k: int = 10) -> list[str]:
    """Top-``k`` most expensive queries from the newest committed
    bench_full artifact — auto-included in the scaling set."""
    import glob
    import re

    paths = glob.glob(os.path.join(here, "bench_full_r*.json"))
    if not paths:
        return []
    newest = max(
        paths,
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
    )
    try:
        with open(newest) as f:
            qs = json.load(f)["queries"]
    except (OSError, KeyError, ValueError):
        return []
    return [n for n, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:k]]


def _env_block() -> dict:
    """Measurement environment (see bench.py) — embedded in the
    artifact so cross-artifact numbers are comparable."""
    try:
        la1, la5, _ = os.getloadavg()
    except OSError:
        la1 = la5 = -1.0
    ncpu = os.cpu_count() or 0
    return {
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
        "cpus": ncpu,
        "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
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
    sf1 = args[0] if args else "/tmp/spark_graft_sf1"
    runs = int(args[1]) if len(args) > 1 else 2
    decades = 1
    sf10_dir = "/tmp/spark_graft_sf10"
    for a in sys.argv[1:]:
        if a.startswith("--decades"):
            decades = int(a.split("=", 1)[1]) if "=" in a else 2
        if a.startswith("--sf10="):
            sf10_dir = a.split("=", 1)[1]
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # ambient env BEFORE the run — at write time the loadavg would be
    # the board's own 32-thread work and 'loaded' would self-flag
    env = _env_block()
    spark = get_spark()
    # warm the JVM/codegen caches off the measured path
    REGISTRY["q01_pricing_summary"].fn(spark, sf01).write.format(
        "noop"
    ).mode("overwrite").save()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    top = [n for n in _bench_top(here) if n in REGISTRY and n not in QUERIES]
    if top:
        print(f"auto-included from bench top-10: {top}", flush=True)
    rows = {}
    for name in QUERIES + top:
        t_small = _time(spark, name, sf01, runs)
        t_big = _time(spark, name, sf1, runs)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        rows[name] = {
            "sf0.1_sec": round(t_small, 3),
            "sf1_sec": round(t_big, 3),
            "ratio": round(ratio, 2),
            "pass": ratio <= BAR,
        }
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s  ({ratio:.1f}x)"
            f"  {'ok' if ratio <= BAR else 'OVER BAR'}",
            flush=True,
        )
    out = {
        "bar": BAR,
        "factor": 10,
        "decades": decades,
        "runs": runs,
        "env": env,
        "loadavg_end_1m": _env_block()["loadavg_1m"],
        "bench_top_included": top,
        "queries": rows,
        "failures": [n for n, r in rows.items() if not r["pass"]],
    }
    ns = [
        int(f.split("_r")[1].split(".")[0])
        for f in os.listdir(here)
        if f.startswith("scaling_r") and f.endswith(".json")
    ] + [
        int(f.split("_r")[1].split(".")[0])
        for f in os.listdir(here)
        if f.startswith("BENCH_r") and f.endswith(".json")
    ]
    n = max(ns) + 1 if ns else 1
    path = os.path.join(here, f"scaling_r{n}.json")
    # don't bump the round number on a re-run within the same round
    for f in os.listdir(here):
        if f.startswith("scaling_r") and f.endswith(".json"):
            existing = max(
                int(x.split("_r")[1].split(".")[0])
                for x in os.listdir(here)
                if x.startswith("scaling_r")
            )
            bench = max(
                (
                    int(x.split("_r")[1].split(".")[0])
                    for x in os.listdir(here)
                    if x.startswith("BENCH_r")
                ),
                default=0,
            )
            if existing > bench:
                path = os.path.join(here, f"scaling_r{existing}.json")
            break
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    if decades >= 2:
        # second decade (r13, the r12 verdict's ask #8): hand the
        # board's top-5 heaviest sf1 rows to scaling_spot in a FRESH
        # subprocess — a fresh JVM with the decade-sized heap
        # (scaling_spot sets SPARK_GRAFT_DRIVER_MEM=64g before the
        # session exists; this JVM's heap is already fixed), and sf1
        # legs re-timed there so both legs share one clean JVM.
        import subprocess

        spark.stop()
        top5 = [
            n
            for n, _ in sorted(
                rows.items(), key=lambda kv: -kv[1]["sf1_sec"]
            )[:5]
        ]
        print(f"second decade: spot-checking {top5} at {sf10_dir}", flush=True)
        rc = subprocess.call(
            [
                sys.executable,
                os.path.join(here, "tools", "scaling_spot.py"),
                sf10_dir,
                str(max(1, runs - 1)),
                "--queries=" + ",".join(top5),
            ],
            env={**os.environ, "SPARK_GRAFT_SF1_DIR": sf1},
        )
        return rc or (1 if out["failures"] else 0)
    return 1 if out["failures"] else 0


if __name__ == "__main__":
    sys.exit(main())
