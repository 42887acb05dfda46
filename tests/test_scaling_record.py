"""Gate on the committed empirical-scaling record (SCALING.json).

Round 4's verdict called the 100 TB posture design-verified only; the
scalebench sweep (tools/scalebench.py over the tools/scalegen.py
fixture ladder) is the measurement. These tests make the committed
record load-bearing: the scale set must be covered at all three ladder
points and nothing may scale super-linearly past the flag ratio.
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(ROOT, "SCALING.json")


def _record() -> dict:
    assert os.path.exists(PATH), "SCALING.json missing — run tools/scalebench.py"
    with open(PATH) as f:
        return json.load(f)


def test_scaling_record_covers_scale_set():
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from scalebench import FIXED_PARAM, LADDER, SCALE_SET, VARIANTS

    rec = _record()
    assert rec["ladder"] == [sf for sf, _ in LADDER]
    want = set(SCALE_SET) | set(VARIANTS) | set(FIXED_PARAM)
    missing = sorted(want - set(rec["queries"]))
    assert not missing, f"scale set not covered: {missing[:10]}"
    # fixed-param entries must carry their documented reason
    for name in FIXED_PARAM:
        assert "fixed_param_reason" in rec["queries"][name], name
    for name, q in rec["queries"].items():
        assert set(q["sec"]) == {"0.01", "0.1", "1.0"}, name
        assert all(v > 0 for v in q["sec"].values()), name


def test_scaling_no_superlinear_flags():
    rec = _record()
    assert rec["flags"] == [], (
        f"queries scale super-linearly past {rec['flag_ratio']}x per "
        f"10x data: {rec['flags']}"
    )


def test_scaling_rows_grow_with_data():
    """Result cardinality must respond to input volume for the
    row-per-entity queries (most of the scale set returns fixed-size
    aggregates/census rows by design — those are exempt; a constant
    count on a per-entity output would mean the query isn't actually
    exercising the bigger input)."""
    rec = _record()
    per_entity = [
        "user_sessions",
        "exact_dedup_docs",
        "minhash_near_dup_docs",
        "near_dup_clusters_docs",
        "jw_entity_resolution",
        "split_leakage_audit",
    ]
    for name in per_entity:
        q = rec["queries"][name]
        assert q["rows"]["1.0"] > q["rows"]["0.1"] > 0, (name, q["rows"])
    # density-bound work units must have been recorded and grown
    w = rec["queries"]["distance_band_pairs"]["work"]
    assert w["1.0"] > w["0.1"] > w["0.01"] > 0


def test_scaling_decade2_record():
    """The index/dedup families carry a SECOND measured decade
    (sf1 → sf10, VERDICT r5 "Next" #3): every SF10_SET query must have
    sec_d2/r_top2 and none may flag. The record documents why
    distance_band_pairs sits this decade out."""
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from scalebench import SF10_SET

    rec = _record()
    d2 = rec.get("decade2")
    assert d2, "SCALING.json lacks decade2 — run tools/scalebench.py --decade2"
    assert d2["ladder"] == [1.0, 10.0]
    assert set(d2["set"]) == set(SF10_SET)
    # every sat-out query carries a written reason
    for name, reason in d2["excluded"].items():
        assert len(reason) > 40, name
    assert d2["flags"] == [], f"decade-2 super-linear: {d2['flags']}"
    for name in SF10_SET:
        q = rec["queries"][name]
        assert set(q["sec_d2"]) == {"1.0", "10.0"}, name
        assert q["flagged2"] is False, name
        assert q["r_top2"] > 0, name


def test_pruning_record():
    """VERDICT r7 "Next" #6: the z-order layout carries a MEASURED sf10
    pruning record (tools/pruningbench.py), not just the row-group-
    envelope pytest — the number behind the 100 TB scan story. The
    bbox is ~1/42 of the extent per axis; z-ordered row groups must
    prune to <20% touched while the unsorted layout touches ~all, with
    identical results and a real wall-time win."""
    path = os.path.join(ROOT, "PRUNING.json")
    assert os.path.exists(path), "PRUNING.json missing — run tools/pruningbench.py"
    with open(path) as f:
        rec = json.load(f)
    assert rec["n_rows"] >= 10_000_000, "record must be the sf10 point"
    hf = rec["hit_frac"]
    assert hf["unsorted"] > 0.9, hf
    assert hf["zorder"] < 0.2, hf
    assert rec["rowgroups"]["zorder"]["total"] >= 50, rec["rowgroups"]
    assert rec["result_rows"] > 0
    # the 16x row-group skip is the 100 TB story (I/O skipped scales
    # with data; at 10M local rows the 160 MB scan is sub-second either
    # way) — wall time just must not regress
    sec = rec["bbox_count_sec"]
    assert sec["zorder"] <= sec["unsorted"] * 1.2, sec


def test_scaling_same_point_consistency():
    """VERDICT r7 "Next" #3: one committed record must never carry two
    contradictory numbers for the same (query, sf). For every query
    with both ladders, the decade-1 and decade-2 sf1 points must agree
    within 1.5x — scalebench --decade2 re-measures the decade-1 ladder
    in-session when they don't — or carry an explicit epoch_note."""
    rec = _record()
    for name, q in rec["queries"].items():
        a = q.get("sec", {}).get("1.0")
        b = q.get("sec_d2", {}).get("1.0")
        if a is None or b is None:
            continue
        ratio = max(a, b) / max(min(a, b), 1e-9)
        assert ratio <= 1.5 or "epoch_note" in q, (
            f"{name}: decade-1 sf1 {a}s vs decade-2 sf1 {b}s "
            f"({ratio:.2f}x) with no epoch_note — rerun "
            "tools/scalebench.py --decade2 --queries " + name
        )
