"""Measured storage-layout pruning proof at sf10 (VERDICT r7 "Next"
#6; SURVEY §4 rewrite #1).

`sources/partitioned.write_zordered` has carried a row-group-envelope
pytest since r5; this harness puts a NUMBER on the 100 TB scan story:
materialize the sf10 derived-points table (10M rows) once as a
z-ordered layout and once unsorted, run the same bbox count on both,
and record

  - row groups whose [min,max] lon/lat envelope intersects the bbox
    (what Parquet statistics pruning can skip without reading data),
  - wall seconds for the filtered count on each layout (2 iters, min),
  - the result count (MUST be identical — layout changes bytes, never
    results).

Writes PRUNING.json (gated by tests/test_scaling_record.py). Layout
artifacts live under scaledata/pruning/ (gitignored, rebuilt on
demand).

Usage: python tools/pruningbench.py [events_parquet_sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geo_big_data_analysis_spark.session import get_spark  # noqa: E402

#: ~1/42 of the fixture extent per axis pair — the dominant-radius
#: query shape the z-order cell size (0.01°) is tuned for
BBOX = (-74.12, -74.02, 40.62, 40.72)
FILES = 64


def rowgroup_envelopes(path: str) -> list[tuple]:
    import glob

    import pyarrow.parquet as pq

    envs = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            lo = g.column(names["lon"]).statistics
            la = g.column(names["lat"]).statistics
            envs.append((lo.min, lo.max, la.min, la.max))
    return envs


def hit_stats(path: str) -> tuple[int, int]:
    envs = rowgroup_envelopes(path)
    hits = [
        e
        for e in envs
        if e[0] <= BBOX[1] and e[1] >= BBOX[0] and e[2] <= BBOX[3] and e[3] >= BBOX[2]
    ]
    return len(hits), len(envs)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf10"
    spark = get_spark("pruningbench")
    from geo_big_data_analysis_spark.plans.registry import _derived_points, _t
    from geo_big_data_analysis_spark.sources.partitioned import write_zordered

    pts = _derived_points(_t(spark, sf_dir, "events")).select(
        "event_id", "event_type", "value", "lon", "lat"
    )
    base = "scaledata/pruning"
    zpath, upath = os.path.join(base, "zorder"), os.path.join(base, "unsorted")
    # keep row groups small enough that pruning granularity is visible
    # at 10M rows (default 128 MB groups would leave <10 groups total)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    # parquet.block.size is a Hadoop conf, not a SQL conf — it bounds
    # the row-group size the writer cuts
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(4 * 1024 * 1024)
    )
    t0 = time.time()
    write_zordered(pts, zpath, "lat", "lon", 40.5, -74.3, 0.01, files=FILES)
    z_write_s = round(time.time() - t0, 2)
    t0 = time.time()
    pts.repartition(FILES).write.mode("overwrite").parquet(upath)
    u_write_s = round(time.time() - t0, 2)

    z_hits, z_total = hit_stats(zpath)
    u_hits, u_total = hit_stats(upath)

    def timed_count(path: str) -> tuple[float, int]:
        runs, n = [], -1
        for _ in range(2):
            t = time.time()
            n = (
                spark.read.parquet(path)
                .filter(
                    F.col("lon").between(BBOX[0], BBOX[1])
                    & F.col("lat").between(BBOX[2], BBOX[3])
                )
                .count()
            )
            runs.append(time.time() - t)
        return round(min(runs), 3), n

    z_sec, z_n = timed_count(zpath)
    u_sec, u_n = timed_count(upath)
    assert z_n == u_n, f"layout changed results: {z_n} != {u_n}"

    record = {
        "sf_dir": sf_dir,
        "n_rows": pts.count(),
        "bbox": BBOX,
        "result_rows": z_n,
        "rowgroups": {
            "zorder": {"hit": z_hits, "total": z_total},
            "unsorted": {"hit": u_hits, "total": u_total},
        },
        "hit_frac": {
            "zorder": round(z_hits / max(z_total, 1), 4),
            "unsorted": round(u_hits / max(u_total, 1), 4),
        },
        "bbox_count_sec": {"zorder": z_sec, "unsorted": u_sec},
        "write_sec": {"zorder": z_write_s, "unsorted": u_write_s},
        "speedup": round(u_sec / max(z_sec, 1e-9), 2),
    }
    with open("PRUNING.json", "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
