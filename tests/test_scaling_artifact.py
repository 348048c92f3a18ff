"""The sf1 scaling checkpoint's committed artifact must be CLEAN:
every timed query under the near-linear bar. The measurement itself
needs the amplified dataset (tools/gen_scale.py) and ~20 minutes, so
CI pins the committed artifact instead of re-measuring; the artifact
regenerates per round via tools/scaling_check.py."""

from __future__ import annotations

import glob
import json
import os

import pytest

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest():
    files = sorted(
        glob.glob(os.path.join(_HERE, "scaling_r*.json")),
        key=lambda p: int(p.rsplit("_r", 1)[1].split(".")[0]),
    )
    return files[-1] if files else None


def test_scaling_artifact_is_clean():
    path = _latest()
    if path is None:
        pytest.skip("no scaling artifact committed yet")
    art = json.load(open(path))
    assert art["failures"] == [], (
        f"{os.path.basename(path)}: queries over the {art['bar']}x "
        f"scaling bar: {art['failures']}"
    )
    # the artifact must actually carry both scale points per query
    for name, row in art["queries"].items():
        assert row["sf0.1_sec"] > 0 and row["sf1_sec"] > 0, name


def test_sf10_spot_is_clean_when_present():
    path = _latest()
    if path is None:
        pytest.skip("no scaling artifact committed yet")
    art = json.load(open(path))
    spot = art.get("sf10_spot")
    if spot is None:
        pytest.skip("no second-decade spot attached")
    # every over-bar row must be a DOCUMENTED open finding (the spot
    # exists to surface second-decade defects; an undocumented failure
    # is a regression, a documented one is the tool doing its job)
    undocumented = [
        n for n in spot["failures"]
        if n not in (spot.get("open_findings") or {})
    ]
    assert undocumented == [], (
        f"sf1->sf10 queries over the {spot['bar']}x bar with no "
        f"open-finding entry: {undocumented}"
    )
    for name, row in spot["queries"].items():
        assert row["sf1_sec"] > 0 and row["sf10_sec"] > 0, name


def test_two_decade_board_covers_its_top_tier():
    """When the artifact was produced in --decades 2 mode, the
    attached sf10 spot must carry BOTH decades for the board's top-5
    heaviest sf1 rows — the standing-board promotion of the r12
    spot-check (r13)."""
    path = _latest()
    if path is None:
        pytest.skip("no scaling artifact committed yet")
    art = json.load(open(path))
    if art.get("decades", 1) < 2:
        pytest.skip("artifact predates --decades 2 mode")
    spot = art.get("sf10_spot")
    assert spot, "--decades 2 artifact without an sf10_spot block"
    top5 = [
        n
        for n, _ in sorted(
            art["queries"].items(), key=lambda kv: -kv[1]["sf1_sec"]
        )[:5]
    ]
    missing = [n for n in top5 if n not in spot["queries"]]
    assert missing == [], (
        f"board top-5 rows missing from the second decade: {missing}"
    )
