"""Physical-plan fingerprint snapshot: guards against silent plan
regressions (a lost broadcast, an extra shuffle, a window collapsing to
a single partition) across refactors.

For every batch registry query, records:
  - exchanges: Exchange node count in the initial physical plan
  - nlj: BroadcastNestedLoopJoin present
  - global_windows: unpartitioned WindowExec count

Streaming queries are excluded (their plan fingerprint is the drained
micro-batch's — not stable to snapshot, and their correctness is gated
by the oracle suite).

Usage:
  python tools/plansnapshot.py write   # refresh PLAN_BASELINE.json
  python tools/plansnapshot.py check   # exit 1 on drift (pytest wraps this)

Drift is not automatically wrong — a deliberate plan improvement should
re-run `write` and commit the new baseline alongside the change.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geo_big_data_analysis_spark.plans.registry import REGISTRY  # noqa: E402
from geo_big_data_analysis_spark.session import get_spark  # noqa: E402
from tools.planaudit import _unpartitioned_windows  # noqa: E402

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "PLAN_BASELINE.json")
SF_DIR = "/root/testdata/sf0.01"


#: plan-shape-relevant session configs, PINNED during fingerprinting so
#: the gate is immune to session-state leakage from earlier tests in a
#: shared pytest session (a leaked broadcast threshold or partition
#: count would otherwise read as phantom plan drift). Values match
#: `session.get_spark`'s fresh-session defaults — what the CLI writer
#: runs under.
_PINNED_CONFS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


#: Queries whose returned DataFrame is a driver-built LocalRelation
#: (band/fit queries that train a model or run a fit loop during PLAN
#: BUILD and emit collected booleans/rows). Their "plan" is a constant
#: local scan — zero regression signal — while fingerprinting them
#: executes full training runs inside a long-lived shared JVM, which is
#: both slow and the one observed flake source (a Py4J error in the
#: logreg fit after ~250 suites read as phantom drift). Their
#: correctness stays gated by the oracle suite (selfcheck/driver).
_LOCAL_RELATION_QUERIES = {
    "logreg_return_metrics",
    "gbt_value_metrics",
    "gbt_band_lab2",
    "param_search_band",
    "importances_band",
    "kmeans_event_clusters",
    "lisa_perm_band",
    "bpe_merges_docs",
    "kcenter_coreset_embeddings",
}


def fingerprints(sf_dir: str = SF_DIR) -> dict[str, dict]:
    spark = get_spark("plansnapshot")
    saved = {}
    for k, v in _PINNED_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            saved[k] = None
        spark.conf.set(k, v)
    out: dict[str, dict] = {}
    try:
        for name, (fn, oracle) in REGISTRY.items():
            if name.startswith("streaming_") or name in _LOCAL_RELATION_QUERIES:
                continue
            try:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().executedPlan().toString()
                out[name] = {
                    "exchanges": plan.count("Exchange "),
                    "nlj": "BroadcastNestedLoopJoin" in plan,
                    "global_windows": _unpartitioned_windows(df),
                }
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": f"{type(e).__name__}"}
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                # a conf unset before pinning must be UNSET again, not
                # left pinned — otherwise fingerprints() leaks exactly
                # the session state the pinning exists to prevent
                spark.conf.unset(k)
    return out


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    fps = fingerprints()
    if mode == "write":
        with open(BASELINE_PATH, "w") as f:
            json.dump(fps, f, indent=1, sort_keys=True)
        print(f"wrote {len(fps)} fingerprints to {BASELINE_PATH}")
        return 0
    with open(BASELINE_PATH) as f:
        base = json.load(f)
    drift = []
    for name, fp in fps.items():
        if name not in base:
            drift.append(f"NEW (not in baseline — run write): {name} {fp}")
        elif base[name] != fp:
            drift.append(f"DRIFT {name}: baseline {base[name]} -> now {fp}")
    for name in base:
        if name not in fps:
            drift.append(f"REMOVED from registry: {name}")
    for d in drift:
        print(d)
    print(f"checked {len(fps)} fingerprints, drift: {len(drift)}")
    return 1 if drift else 0


if __name__ == "__main__":
    sys.exit(main())
