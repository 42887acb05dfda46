"""Plan-fingerprint regression gate: every batch registry query's
physical-plan shape (exchange count, NLJ presence, unpartitioned-window
count) must match tools/PLAN_BASELINE.json. A deliberate plan change
ships with a refreshed baseline (`python tools/plansnapshot.py write`)."""

from __future__ import annotations

import json
import os

import pytest

from tools.plansnapshot import BASELINE_PATH, fingerprints


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW"),
    reason="~280 s full-registry plan sweep (VERDICT r8 #6: the default "
    "suite must finish inside the driver's window) — run with "
    "SPARK_GRAFT_SLOW=1, or `python tools/plansnapshot.py check`",
)
def test_plan_fingerprints_match_baseline(spark):
    with open(BASELINE_PATH) as f:
        base = json.load(f)
    fps = fingerprints()
    drift = {
        name: (base.get(name), fp)
        for name, fp in fps.items()
        if base.get(name) != fp
    }
    missing = set(base) - set(fps)
    assert not drift, f"plan drift (refresh baseline if deliberate): {drift}"
    assert not missing, f"queries removed from registry: {missing}"
