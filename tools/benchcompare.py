"""Round-over-round bench comparison (VERDICT r3 "Next" #5).

Takes two bench JSON artifacts (BENCH_DETAIL.json or a driver
BENCH_r{N}.json — anything with a ``queries`` name→seconds map),
intersects their query sets, and reports the common-set total ratio
plus the largest per-query regressions/improvements. When both files
carry IQRs (multi-iteration detail files), a per-query delta within
the combined IQR is marked noise, not regression.

Usage: python tools/benchcompare.py OLD.json NEW.json [top_n]
       python tools/benchcompare.py --agree A.json B.json

``--agree`` checks SAME-CODE run-to-run reproducibility (VERDICT r7
"Next" #2): totals must agree within 10% and per-query medians within
1.5x on every query slower than 1 s in either run. Exit 0 = agree.
"""

from __future__ import annotations

import json
import sys


def agree(a_path: str, b_path: str) -> int:
    with open(a_path) as f:
        a = _unwrap(json.load(f))
    with open(b_path) as f:
        b = _unwrap(json.load(f))
    qa, qb = _queries(a), _queries(b)
    common = sorted(set(qa) & set(qb))
    ta, tb = sum(qa[q] for q in common), sum(qb[q] for q in common)
    bad = 0
    tot_ratio = max(ta, tb) / max(min(ta, tb), 1e-9)
    if tot_ratio > 1.10:
        print(f"DISAGREE totals: {ta:.1f}s vs {tb:.1f}s ({tot_ratio:.3f}x > 1.10x)")
        bad += 1
    else:
        print(f"totals agree: {ta:.1f}s vs {tb:.1f}s ({tot_ratio:.3f}x)")
    for q in common:
        x, y = qa[q], qb[q]
        if max(x, y) <= 1.0:
            continue  # sub-second queries are scheduler noise territory
        r = max(x, y) / max(min(x, y), 1e-9)
        if r > 1.5:
            print(f"DISAGREE {q}: {x:.2f}s vs {y:.2f}s ({r:.2f}x > 1.5x)")
            bad += 1
    if not bad:
        print(f"AGREE: {len(common)} common queries within bounds")
    return 1 if bad else 0


def _unwrap(doc: dict) -> dict:
    # driver BENCH_r{N}.json wraps the bench stdout under "parsed"
    return doc.get("parsed") or doc


def _queries(doc: dict) -> dict[str, float]:
    qs = doc.get("queries") or {}
    return {k: float(v) for k, v in qs.items() if not k.startswith("_")}


def main() -> int:
    if len(sys.argv) >= 4 and sys.argv[1] == "--agree":
        return agree(sys.argv[2], sys.argv[3])
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    with open(sys.argv[1]) as f:
        old = _unwrap(json.load(f))
    with open(sys.argv[2]) as f:
        new = _unwrap(json.load(f))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    for label, rec in (("old", old), ("new", new)):
        if rec.get("tainted_load"):
            # a record started under load measures the machine, not the
            # code (r6's phantom 1.39x) — say so loudly up front
            print(
                f"WARNING: {label} record is TAINTED (started over the "
                f"loadavg guard) — treat every ratio below as suspect"
            )

    qo, qn = _queries(old), _queries(new)
    common = sorted(set(qo) & set(qn))
    if not common:
        # driver BENCH_r{N}.json carries only {"_total": ...} inline —
        # per-query comparison needs the BENCH_DETAIL-style files
        print(
            f"no common per-query data; totals: "
            f"old {old.get('value')}s ({old.get('n_queries')} queries) vs "
            f"new {new.get('value')}s ({new.get('n_queries')} queries)"
        )
        return 0
    only_old, only_new = sorted(set(qo) - set(qn)), sorted(set(qn) - set(qo))
    to, tn = sum(qo[q] for q in common), sum(qn[q] for q in common)
    print(
        f"common queries: {len(common)}  old total {to:.1f}s  "
        f"new total {tn:.1f}s  ratio {tn / to:.3f}x"
    )
    # Machine-speed normalization (VERDICT r4 "What's wrong" #1): when
    # both records carry a code-independent cpu marker, divide host
    # speed out of the ratio. The same code has measured 1.3-1.8x apart
    # across runs purely from host CPU sharing; the normalized ratio is
    # the code-attributable part. The single-thread marker
    # (cpu_marker_st_sec, r5 second session) is preferred — the matmul
    # marker measures LEFTOVER parallel BLAS throughput and swung 10x
    # under concurrent load on identical hosts.
    mo, mn = old.get("cpu_marker_st_sec"), new.get("cpu_marker_st_sec")
    if mo and mn:
        norm = (tn / to) * (float(mo) / float(mn))
        print(
            f"cpu markers (st): old {mo}s new {mn}s (host speed ratio "
            f"{float(mn) / float(mo):.2f}x) -> marker-normalized ratio {norm:.3f}x"
        )
    else:
        # REFUSE to normalize without the single-thread marker (VERDICT
        # r5 "wrong" #3): the matmul marker measures leftover parallel
        # BLAS throughput and swung 2.85x between identical-host runs,
        # so a ratio normalized by it is meaningless. Raw ratio only.
        print(
            "cpu markers: cpu_marker_st_sec missing in one record — "
            "raw ratio only (matmul marker deliberately NOT used: "
            "unstable under concurrent load)"
        )
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old[:8])}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new[:8])}")

    iqr_o, iqr_n = old.get("iqr", {}), new.get("iqr", {})
    deltas = sorted(common, key=lambda q: qo[q] - qn[q])
    print(f"\ntop {top_n} regressions (new - old, sec):")
    for q in deltas[:top_n]:
        d = qn[q] - qo[q]
        if d <= 0:
            break
        noise_band = iqr_o.get(q, 0.0) + iqr_n.get(q, 0.0)
        tag = " [within IQR noise]" if abs(d) <= noise_band else ""
        print(f"  {q}: {qo[q]:.2f} -> {qn[q]:.2f} (+{d:.2f}){tag}")
    print(f"\ntop {top_n} improvements:")
    for q in deltas[-1 : -top_n - 1 : -1]:
        d = qn[q] - qo[q]
        if d >= 0:
            break
        print(f"  {q}: {qo[q]:.2f} -> {qn[q]:.2f} ({d:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
