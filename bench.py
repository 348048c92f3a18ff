"""Benchmark runner — the driver's perf feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the ``noop`` datasource write —
full execution, no driver-side collect, no sink I/O in the measurement.

Commit policy for artifacts: the COMMITTED ``bench_full_r{N}.json`` is
the idle-machine min-of-3 and is the regression baseline of record.
The driver's per-round capture (and any re-run taken while the driver
or pytest loads the box) carries ~10-15% uniform load inflation — so
(r12) full-registry results land in a SCRATCH file under the system
temp dir unless ``--promote`` is passed; only a deliberate promoted
run can create/overwrite the in-repo artifact, which keeps ``git
status`` clean after a driver pass (the r10 AND r11 recurrence).
Every artifact now carries an ``env`` block (load average, cpu count,
promoted flag) so cross-artifact numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from portfolio1_etl_spark import get_spark
from portfolio1_etl_spark.plans import REGISTRY

#: Bench set: EVERY registered query (r10 — the r9 verdict flagged the
#: 171-name curated list as a silent cap: 69 queries had never produced
#: a timing row, so a regression there was invisible). Registry order,
#: which leads with the driver's PRIORITY window. Anything that must be
#: excluded in the future needs an entry in EXCLUDED with a reason —
#: the artifact records both, so coverage gaps are explicit, never
#: silent.
EXCLUDED: dict[str, str] = {}
HEADLINE = [n for n in REGISTRY if n not in EXCLUDED]


def _previous_round_timings(here: str) -> tuple[str, dict[str, float]] | None:
    """Newest usable per-query baseline for the regression guard:
    driver-recorded BENCH_r{N}.json and in-repo bench_full_r{N}.json
    considered together, newest round first, first one that parses
    wins — the driver capture truncates to a log tail and has shipped
    unparseable (r8), which must not silently disable the guard when
    a committed full artifact exists."""
    import glob
    import re

    def _round_no(p: str) -> int | None:
        m = re.search(r"(?:BENCH|bench_full)_r0*(\d+)\.json$", os.path.basename(p))
        return int(m.group(1)) if m else None

    by_round: dict[int, list[str]] = {}
    for pat in ("BENCH_r*.json", "bench_full_r*.json"):
        for p in glob.glob(os.path.join(here, pat)):
            rn = _round_no(p)
            if rn is not None:
                by_round.setdefault(rn, []).append(p)

    def _queries(path: str) -> dict[str, float] | None:
        try:
            with open(path) as f:
                data = json.load(f)
            parsed = data.get("parsed") or data
            return dict(parsed["queries"])
        except (OSError, KeyError, TypeError, ValueError, json.JSONDecodeError):
            return None

    for rn in sorted(by_round, reverse=True):
        # Merge every parseable artifact of the round; a tail-truncated
        # driver capture must not shadow the committed full artifact, so
        # bench_full (sorted last) overwrites BENCH on shared queries.
        merged: dict[str, float] = {}
        used: list[str] = []
        for path in sorted(by_round[rn], key=lambda p: "bench_full" in p):
            qs = _queries(path)
            if qs:
                merged.update(qs)
                used.append(os.path.basename(path))
        if merged:
            return "+".join(used), merged
    return None


def _previous_promoted_timings(here: str) -> tuple[str, dict[str, float]] | None:
    """Newest in-repo bench_full artifact with ``promoted: true`` —
    the promote gate's comparison baseline. Driver BENCH captures are
    deliberately excluded here: they run under load and would make the
    1.4x regression bar trip on pollution rather than catch it."""
    import glob
    import re

    cands = []
    for p in glob.glob(os.path.join(here, "bench_full_r*.json")):
        m = re.search(r"bench_full_r0*(\d+)\.json$", os.path.basename(p))
        if m:
            cands.append((int(m.group(1)), p))
    for _, p in sorted(cands, reverse=True):
        try:
            with open(p) as f:
                data = json.load(f)
            if data.get("promoted") and data.get("queries"):
                return os.path.basename(p), dict(data["queries"])
        except (OSError, ValueError, KeyError, TypeError):
            continue
    return None


def _regression_report(timings: dict[str, float], here: str) -> None:
    """Per-query delta vs the previous round, >2x regressions called
    out — machine-checkable round-over-round perf, on stderr so the
    stdout contract stays ONE JSON line."""
    prev = _previous_round_timings(here)
    if prev is None:
        return
    fname, base = prev
    print(f"# regression check vs {fname}", file=sys.stderr)
    regressions = []
    for name, t in timings.items():
        if name not in base:
            print(f"#   {name}: {t:.3f}s (new — no baseline)", file=sys.stderr)
            continue
        ratio = t / base[name] if base[name] > 0 else float("inf")
        flag = " REGRESSION(>2x)" if ratio > 2.0 else ""
        print(
            f"#   {name}: {t:.3f}s vs {base[name]:.3f}s ({ratio:.2f}x){flag}",
            file=sys.stderr,
        )
        if ratio > 2.0:
            regressions.append(name)
    if regressions:
        print(f"# WARNING: >2x regressions: {regressions}", file=sys.stderr)


def _env_block() -> dict:
    """Measurement environment, embedded in every timing artifact —
    three r11 q237 numbers from three contexts were not comparable
    because none recorded the load it ran under."""
    try:
        la1, la5, la15 = os.getloadavg()
    except OSError:
        la1 = la5 = la15 = -1.0
    ncpu = os.cpu_count() or 0
    return {
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
        "cpus": ncpu,
        "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        # >25% of cores already busy when the run started — any
        # timings taken here carry external-load inflation
        "loaded": la1 > 0.25 * ncpu,
        "runs_per_query": 3,
    }


def _write_full_artifact(
    timings: dict[str, float], total: float, sf: float, here: str,
    env: dict | None = None,
) -> None:
    """Persist ALL headline timings to ``bench_full_r{N}.json`` — in
    the repo ONLY when ``--promote`` is passed; otherwise to a scratch
    file under the system temp dir (printed on stderr). The driver's
    own BENCH capture truncates to a log tail (r8 kept 61 of 105
    rows), so this artifact is the durable, complete record — but the
    driver also re-runs bench.py under load, and twice (r10, r11) that
    re-run overwrote the committed idle-machine baseline in the
    working tree. Promotion is now explicit.

    Promote gate (r13): ``--promote`` is REFUSED (run demoted to a
    scratch write, non-zero exit) when either pollution signal fires:
    the pre-run 1-minute loadavg exceeds 2.0 (the r12 promote ran at
    loadavg 4.7, read 5 queries ~2x high, and flagged nothing), or any
    query regresses >1.4x vs the previous PROMOTED artifact. Override
    with ``--promote-anyway=<reason>``; the reason is recorded in the
    artifact's ``promote_override`` field so the number is never
    silently trusted."""
    import glob
    import re
    import tempfile

    # round number from the newest BENCH_r{N}.json FILENAME — never
    # its contents (r8's tail-truncated capture was unparseable, which
    # must not reset the numbering)
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
    ]
    n = (max(rounds) + 1) if rounds else 1
    promote = "--promote" in sys.argv
    override = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--promote-anyway=")),
        None,
    )
    if override is not None:
        promote = True
    refusals: list[str] = []
    if promote and override is None:
        la1 = (env or {}).get("loadavg_1m", -1.0)
        if la1 > 2.0:
            refusals.append(
                f"pre-run loadavg_1m {la1} > 2.0 — not an idle box"
            )
        prev = _previous_promoted_timings(here)
        if prev is not None:
            pname, pqueries = prev
            bad = [
                f"{q} {timings[q]:.2f}s vs {pqueries[q]:.2f}s "
                f"({timings[q] / pqueries[q]:.2f}x)"
                for q in timings
                if q in pqueries
                and pqueries[q] > 0.5  # sub-0.5s rows are JVM noise
                and timings[q] / pqueries[q] > 1.4
            ]
            if bad:
                refusals.append(
                    f"regressions >1.4x vs {pname}: {'; '.join(bad)}"
                )
    if refusals:
        promote = False
        for r in refusals:
            print(f"# PROMOTE REFUSED: {r}", file=sys.stderr)
        print(
            "# re-run on an idle box, or pass --promote-anyway=<reason> "
            "to record the cause in the artifact",
            file=sys.stderr,
        )
    if promote:
        out = os.path.join(here, f"bench_full_r{n}.json")
    else:
        out = os.path.join(tempfile.gettempdir(), f"bench_full_r{n}.scratch.json")
    with open(out, "w") as f:
        json.dump(
            {
                "round": n,
                "sf": sf,
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "runs_per_query": 3,
                "promoted": promote,
                "promote_override": override,
                "env": env,
                "loadavg_end_1m": _env_block()["loadavg_1m"],
                "excluded": EXCLUDED,
                "queries": timings,
            },
            f,
            indent=1,
        )
        f.write("\n")
    kind = "PROMOTED" if promote else "scratch (pass --promote to commit)"
    print(f"# wrote {out} ({len(timings)} queries) [{kind}]", file=sys.stderr)
    if refusals:
        sys.exit(3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    # ambient environment BEFORE the run: recording at write time would
    # measure the benchmark's own 32-thread load and self-flag every
    # clean run as loaded (the r12 artifact-comparability fix)
    env = _env_block()
    spark = get_spark(app_name="bench")

    # Warm up: JVM JIT + parquet footer cache, outside the measurement.
    REGISTRY["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    names = [n for n in HEADLINE if n in REGISTRY]
    timings: dict[str, float] = {}
    for name in names:
        # min of 3 runs: the host is shared and back-to-back full-suite
        # totals have differed by 40% (99.9s vs 70.3s) — a single
        # sample, and often even two, catches external load spikes.
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        # Release plan/broadcast/shuffle references between queries so
        # the ContextCleaner reclaims them — measured cross-query JVM
        # degradation otherwise (30s queries that run in 2s clean).
        import gc

        gc.collect()
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    here = os.path.dirname(os.path.abspath(__file__))
    _regression_report(timings, here)
    _write_full_artifact(timings, total, sf, here, env)
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
