"""Spatial partition-pruning writer convention (SURVEY §4 rewrite #1).

Bbox predicates (F4) prune at the storage layer when the data is laid
out by spatial key. Two complementary conventions:

- ``write_cell_partitioned``: Hive-style directory partitioning on a
  coarse grid-cell id — a bbox filter on the cell columns becomes
  ``PartitionFilters`` in the scan (directories never opened). Coarse
  cells only: directory count = distinct cells, keep it ≤ a few
  thousand.
- ``write_spatially_sorted``: sort by (gx, gy) within files so Parquet
  row-group min/max statistics on lon/lat prune inside each file —
  no directory explosion, works at any cell granularity; this is the
  100 TB default (pair with a coarse directory partition on a region
  key when one exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import grid_cell


def with_cell_ids(
    df: DataFrame, lat: str, lon: str, origin_lat: float, origin_lon: float, cell_deg: float
) -> DataFrame:
    gx, gy = grid_cell(lat, lon, origin_lat, origin_lon, cell_deg)
    return df.withColumn("gx", gx).withColumn("gy", gy)


def write_cell_partitioned(
    df: DataFrame,
    path: str,
    lat: str,
    lon: str,
    origin_lat: float,
    origin_lon: float,
    cell_deg: float,
) -> None:
    (
        with_cell_ids(df, lat, lon, origin_lat, origin_lon, cell_deg)
        .write.mode("overwrite")
        .partitionBy("gx", "gy")
        .parquet(path)
    )


def read_bbox_pruned(
    spark: SparkSession,
    path: str,
    origin_lat: float,
    origin_lon: float,
    cell_deg: float,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> DataFrame:
    """Scan a cell-partitioned dataset with the bbox mapped to cell-id
    predicates (partition pruning) plus the exact lat/lon refinement.

    The cell range is padded by one cell on each side: the driver-side
    ``floor`` of a bbox edge and the executor-side ``floor`` of a data
    value can disagree by ±1 under fp noise (e.g. ``-74.1 + 74.3`` is
    not exactly ``0.2``), and pruning must never drop a matching row.
    The exact bbox filter below makes the result precise either way —
    the padding only costs scanning two extra cell directories."""
    import math

    gx_min = math.floor((lon_min - origin_lon) / cell_deg) - 1
    gx_max = math.floor((lon_max - origin_lon) / cell_deg) + 1
    gy_min = math.floor((lat_min - origin_lat) / cell_deg) - 1
    gy_max = math.floor((lat_max - origin_lat) / cell_deg) + 1
    df = spark.read.parquet(path)
    return df.filter(
        F.col("gx").between(gx_min, gx_max)
        & F.col("gy").between(gy_min, gy_max)
        & F.col("lat").between(lat_min, lat_max)
        & F.col("lon").between(lon_min, lon_max)
    )


def write_spatially_sorted(
    df: DataFrame,
    path: str,
    lat: str,
    lon: str,
    origin_lat: float,
    origin_lon: float,
    cell_deg: float,
    files: int = 32,
) -> None:
    """Sort-by-cell layout: repartitionByRange + in-file sort on
    (gx, gy) gives each Parquet file/row-group a tight lon/lat min-max
    envelope, so bbox scans skip most row groups via statistics."""
    (
        with_cell_ids(df, lat, lon, origin_lat, origin_lon, cell_deg)
        .repartitionByRange(files, "gx", "gy")
        .sortWithinPartitions("gx", "gy")
        .write.mode("overwrite")
        .parquet(path)
    )
