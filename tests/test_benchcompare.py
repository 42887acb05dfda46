"""benchcompare guard (VERDICT r5 "wrong" #3): the marker-normalized
ratio may only be computed from the single-thread marker; records
missing it get the raw ratio, never a matmul-normalized one."""

import json
import subprocess
import sys


def _run(tmp_path, old, new):
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    out = subprocess.run(
        [sys.executable, "tools/benchcompare.py", str(po), str(pn)],
        capture_output=True, text=True, check=True,
    )
    return out.stdout


BASE = {"queries": {"q1": 1.0, "q2": 2.0}}


def test_normalizes_with_st_marker(tmp_path):
    old = {**BASE, "cpu_marker_st_sec": 0.10, "cpu_marker_sec": 0.01}
    new = {**BASE, "queries": {"q1": 2.0, "q2": 4.0},
           "cpu_marker_st_sec": 0.20, "cpu_marker_sec": 0.05}
    out = _run(tmp_path, old, new)
    assert "marker-normalized ratio 1.000x" in out  # 2.0 ratio / 2.0 host


def test_refuses_matmul_fallback(tmp_path):
    """Both records carry the matmul marker but one lacks the st
    marker: no normalized ratio may be printed."""
    old = {**BASE, "cpu_marker_sec": 0.01}
    new = {**BASE, "cpu_marker_sec": 0.05, "cpu_marker_st_sec": 0.2}
    out = _run(tmp_path, old, new)
    assert "marker-normalized" not in out
    assert "raw ratio only" in out and "NOT used" in out
