"""Spatial partition-pruning layout tests (SURVEY §4 rewrite #1)."""

from __future__ import annotations

import pyspark.sql.functions as F

from geo_big_data_analysis_spark.sources.partitioned import (
    read_bbox_pruned,
    write_cell_partitioned,
    write_spatially_sorted,
)


def _points(spark, n=2000):
    return spark.range(n).select(
        F.col("id"),
        (F.lit(-74.3) + (F.col("id") % 100) / 100.0 * 0.6).alias("lon"),
        (F.lit(40.5) + ((F.col("id") * 7) % 100) / 100.0 * 0.5).alias("lat"),
    )


def test_cell_partitioned_scan_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "cells")
    write_cell_partitioned(_points(spark), path, "lat", "lon", 40.5, -74.3, 0.1)
    got = read_bbox_pruned(
        spark, path, 40.5, -74.3, 0.1,
        lat_min=40.6, lat_max=40.7, lon_min=-74.1, lon_max=-74.0,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "gx" in plan.split("PartitionFilters")[1][:200], plan
    # pruned scan returns exactly the rows a full-scan bbox filter would
    full = _points(spark).filter(
        F.col("lat").between(40.6, 40.7) & F.col("lon").between(-74.1, -74.0)
    )
    assert got.count() == full.count()


def test_spatially_sorted_layout_roundtrip(spark, tmp_path):
    path = str(tmp_path / "sorted")
    write_spatially_sorted(_points(spark), path, "lat", "lon", 40.5, -74.3, 0.1, files=4)
    back = spark.read.parquet(path)
    assert back.count() == 2000
    # bbox filter is pushed to the parquet scan (min/max stats prune)
    got = back.filter(F.col("lon").between(-74.1, -74.0) & F.col("lat").between(40.6, 40.7))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(lon" in plan, plan


def _rowgroup_envelopes(path):
    """(lon_min, lon_max, lat_min, lat_max) per Parquet row group."""
    import glob
    import pyarrow.parquet as pq

    envs = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            lo = g.column(names["lon"]).statistics
            la = g.column(names["lat"]).statistics
            envs.append((lo.min, lo.max, la.min, la.max))
    return envs


def test_zorder_layout_tightens_rowgroup_envelopes(spark, tmp_path):
    from geo_big_data_analysis_spark.sources.partitioned import write_zordered

    # many small row groups so stats pruning granularity is visible
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    pts = _points(spark, n=20000)
    zpath = str(tmp_path / "zorder")
    upath = str(tmp_path / "unsorted")
    write_zordered(pts, zpath, "lat", "lon", 40.5, -74.3, 0.05, files=16)
    pts.repartition(16).write.mode("overwrite").parquet(upath)

    bbox = (-74.12, -74.02, 40.62, 40.72)  # ~1/36 of the extent per axis pair

    def hit_fraction(path):
        envs = _rowgroup_envelopes(path)
        hits = [
            e for e in envs
            if e[0] <= bbox[1] and e[1] >= bbox[0] and e[2] <= bbox[3] and e[3] >= bbox[2]
        ]
        return len(hits) / len(envs)

    zfrac, ufrac = hit_fraction(zpath), hit_fraction(upath)
    # unsorted row groups all span the full extent (no pruning possible);
    # z-ordered tiles are compact in both dims so most groups miss the bbox
    assert ufrac == 1.0, ufrac
    assert zfrac < 0.5, (zfrac, ufrac)

    # layout changes bytes, never results
    back = spark.read.parquet(zpath).filter(
        F.col("lon").between(bbox[0], bbox[1]) & F.col("lat").between(bbox[2], bbox[3])
    )
    full = pts.filter(
        F.col("lon").between(bbox[0], bbox[1]) & F.col("lat").between(bbox[2], bbox[3])
    )
    assert back.count() == full.count()


def test_zorder_key_locality():
    # Morton key of neighboring cells differs in low bits only: the key
    # for (x, y) interleaves bits, so a 2x2 block shares all high bits
    def spread(v):
        v &= 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    def z(x, y):
        return spread(x) | (spread(y) << 1)

    assert {z(0, 0), z(1, 0), z(0, 1), z(1, 1)} == {0, 1, 2, 3}
    assert {z(2, 2), z(3, 2), z(2, 3), z(3, 3)} == {12, 13, 14, 15}


def test_date_partitioned_scan_prunes_directories(spark, tmp_path):
    from geo_big_data_analysis_spark.plans.registry import _t
    from geo_big_data_analysis_spark.sources.partitioned import (
        read_date_pruned,
        write_date_partitioned,
    )

    ev = _t(spark, "/root/testdata/sf0.001", "events").select("event_id", "ts")
    path = str(tmp_path / "bydate")
    write_date_partitioned(ev, path, "ts")
    got = read_date_pruned(spark, path, "2024-01-03", "2024-01-05")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters")[1][:200]
    # file-level pruning: scan touches only the 3 matching day dirs
    n_files_scanned = got.select(F.input_file_name()).distinct().count()
    import glob

    n_files_total = len(glob.glob(f"{path}/dt=*/*.parquet"))
    assert n_files_scanned < n_files_total
    full = ev.filter(
        F.date_format("ts", "yyyy-MM-dd").between("2024-01-03", "2024-01-05")
    )
    assert got.count() == full.count()


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    import glob

    from geo_big_data_analysis_spark.plans.registry import _t
    from geo_big_data_analysis_spark.sources.partitioned import (
        execute_compaction,
        plan_compaction,
    )

    src = str(tmp_path / "small_files")
    ev = _t(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    ev.repartition(24).write.mode("overwrite").parquet(src)
    n_small = len(glob.glob(f"{src}/*.parquet"))
    assert n_small >= 20

    bins = plan_compaction(src, target_bytes=64 * 1024)
    # every source file appears in exactly one bin
    planned = [f for b in bins for f in b]
    assert sorted(planned) == sorted(glob.glob(f"{src}/*.parquet"))

    out = str(tmp_path / "compacted")
    n_bins = execute_compaction(spark, src, out, target_bytes=64 * 1024)
    n_out = len(glob.glob(f"{out}/*.parquet"))
    assert n_out == n_bins < n_small
    # content identical as a multiset
    a = {tuple(r) for r in spark.read.parquet(src).collect()}
    b = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert a == b
    assert spark.read.parquet(out).count() == ev.count()


def test_execute_compaction_empty_source_raises(spark, tmp_path):
    import os

    import pytest as _pytest

    from geo_big_data_analysis_spark.sources.partitioned import execute_compaction

    src = tmp_path / "empty"
    os.makedirs(src)
    with _pytest.raises(ValueError, match="no parquet files"):
        execute_compaction(spark, str(src), str(tmp_path / "out"), 1 << 20)


def test_execute_compaction_honors_precomputed_plan(spark, tmp_path):
    from geo_big_data_analysis_spark.sources.partitioned import (
        execute_compaction,
        plan_compaction,
    )

    src = str(tmp_path / "src")
    for i in range(3):
        spark.range(i * 10, i * 10 + 10).coalesce(1).write.mode("append").parquet(src)
    plan = plan_compaction(src, 1 << 30)
    # a file added AFTER the preview must not sneak into the execution
    spark.range(100, 110).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    n = execute_compaction(spark, src, out, 1 << 30, plan=plan)
    assert n == len(plan)
    assert spark.read.parquet(out).count() == 30
