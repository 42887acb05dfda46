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
