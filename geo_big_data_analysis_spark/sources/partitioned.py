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


def _spread_bits16(c):
    """Spread a 16-bit int's bits to the even positions of a 32-bit int
    (the classic Morton-code magic-mask ladder) — pure column math."""
    c = c.bitwiseAND(F.lit(0xFFFF))
    c = (c.bitwiseOR(F.shiftleft(c, 8))).bitwiseAND(F.lit(0x00FF00FF))
    c = (c.bitwiseOR(F.shiftleft(c, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    c = (c.bitwiseOR(F.shiftleft(c, 2))).bitwiseAND(F.lit(0x33333333))
    c = (c.bitwiseOR(F.shiftleft(c, 1))).bitwiseAND(F.lit(0x55555555))
    return c


def zorder_key(gx, gy):
    """Morton (Z-order) interleave of two 16-bit cell coordinates into
    one sortable 32-bit key. Sorting by this key clusters rows that are
    close in BOTH dimensions, unlike lexicographic (gx, gy) where a
    range on the minor key gy prunes nothing once gx spans files."""
    return _spread_bits16(F.col(gx) if isinstance(gx, str) else gx).bitwiseOR(
        F.shiftleft(_spread_bits16(F.col(gy) if isinstance(gy, str) else gy), 1)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    lat: str,
    lon: str,
    origin_lat: float,
    origin_lon: float,
    cell_deg: float,
    files: int = 32,
) -> None:
    """Z-order layout: the multi-dimensional upgrade of
    ``write_spatially_sorted``. Range-partition + sort by the Morton
    key of (gx, gy), so every Parquet file/row-group covers a compact
    2-D tile and carries tight min/max envelopes on BOTH lon and lat —
    a bbox predicate on either or both axes skips most row groups via
    statistics. This is the 100 TB layout for point tables queried by
    arbitrary bboxes (the reference's F4 filters); cell sizes follow
    the dominant query radius. Cell ids must fit 16 bits (65k cells per
    axis — sub-meter at city extent)."""
    (
        with_cell_ids(df, lat, lon, origin_lat, origin_lon, cell_deg)
        .withColumn("z", zorder_key("gx", "gy"))
        .repartitionByRange(files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_date_partitioned(df: DataFrame, path: str, ts_col: str) -> None:
    """Temporal layout twin of the spatial cell partitioning: one
    directory per event date. A date-range predicate then prunes at
    the DIRECTORY level (PartitionFilters) before any footer is read —
    the layout that turns a Q6-style shipdate window into a 1/84th
    scan at 100 TB. Hive-style `dt=YYYY-MM-DD` partition values keep
    the column orderable as a string, so range predicates prune."""
    (
        df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def read_date_pruned(
    spark: SparkSession, path: str, date_min: str, date_max: str
) -> DataFrame:
    """Scan a date-partitioned layout restricted to [date_min, date_max]
    (inclusive, 'YYYY-MM-DD' strings — lexicographic order IS date
    order for this format, so the filter is a partition-level range)."""
    df = spark.read.parquet(path)
    return df.filter(F.col("dt").between(date_min, date_max))


def plan_compaction(path: str, target_bytes: int) -> list[list[str]]:
    """Small-file compaction planner: first-fit-decreasing bin packing
    of a directory's parquet files into ~target_bytes output groups.
    Pure file-METADATA work (names + sizes), so driver-side is the
    right cost model even at 100 TB — the plan is O(files), the data
    never moves until execute_compaction. Files already ≥ target stay
    in singleton bins (rewriting them buys nothing)."""
    import glob
    import os

    files = sorted(
        glob.glob(os.path.join(path, "*.parquet")),
        key=lambda f: -os.path.getsize(f),
    )
    bins: list[list[str]] = []
    loads: list[int] = []
    for f in files:
        sz = os.path.getsize(f)
        placed = False
        if sz < target_bytes:
            for i, load in enumerate(loads):
                if load + sz <= target_bytes and loads[i] + sz > loads[i]:
                    bins[i].append(f)
                    loads[i] += sz
                    placed = True
                    break
        if not placed:
            bins.append([f])
            loads.append(sz)
    return bins


def execute_compaction(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int,
    plan: list[list[str]] | None = None,
) -> int:
    """Rewrite a small-file directory as one output file per planned
    bin (each bin's files read together, coalesced to 1): row-for-row
    content-preserving, file count drops to len(bins). Real table
    formats do this transactionally (rewrite then atomic swap); here
    the swap is the caller's rename, keeping the operator pure.
    Returns the number of output groups.

    Pass ``plan`` (a prior plan_compaction result) to make a
    preview-then-execute flow consistent — otherwise the plan is
    recomputed here and files added since the preview are included.
    An empty/non-parquet source raises instead of silently writing
    nothing (a downstream read of ``out_path`` would fail confusingly
    with path-not-found)."""
    bins = plan_compaction(path, target_bytes) if plan is None else plan
    if not bins:
        raise ValueError(f"no parquet files to compact under {path!r}")
    for i, group in enumerate(bins):
        (
            spark.read.parquet(*group)
            .coalesce(1)
            .write.mode("append" if i else "overwrite")
            .parquet(out_path)
        )
    return len(bins)
