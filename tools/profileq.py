"""Per-query optimization profiler (guide §1): noop-sink timing +
`.explain("formatted")` capture for a set of registry queries.

For each named query:
  - builds the DataFrame once and writes plans/r08/<name>_<tag>.txt with
    the formatted physical plan,
  - times `df.write.format("noop")` (eagerly computes every column —
    guide §1.4) for N iterations, reporting the median,
  - labels jobs via setJobDescription so any captured UI/eventlog data
    is attributable.

Usage:
  python tools/profileq.py [--sf SF_DIR] [--tag before|after] [--iters N]
                           [--plans-dir DIR] query [query ...]

Prints one line per query: `<median_sec>  <iqr>  <name>` and a total.
This is a measurement tool: it never touches the bench contract.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geo_big_data_analysis_spark.plans.registry import REGISTRY  # noqa: E402
from geo_big_data_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--plans-dir", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08"))
    ap.add_argument("--no-plan", action="store_true", help="skip plan capture (timing only)")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    os.makedirs(args.plans_dir, exist_ok=True)
    spark = get_spark("profileq")
    spark.range(10).count()  # JVM warm

    total = 0.0
    for name in args.queries:
        fn, _ = REGISTRY[name]
        sc = spark.sparkContext
        # plan capture (once, pre-timing)
        if not args.no_plan:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        # warm run (codegen compile) then timed noop iterations
        sc.setJobDescription(f"profileq warm: {name}")
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        runs = []
        for i in range(args.iters):
            sc.setJobDescription(f"profileq {name} iter {i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        sc.setJobDescription(None)
        runs.sort()
        med = statistics.median(runs)
        iqr = (runs[-1] - runs[0]) if len(runs) > 1 else 0.0
        total += med
        print(f"{med:8.3f} {iqr:7.3f}  {name}", flush=True)
    print(f"{total:8.3f}          TOTAL ({len(args.queries)} queries)")


if __name__ == "__main__":
    main()
