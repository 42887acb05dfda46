"""Raster sources: bbox clip + broadcast point-sampling (S10/S11/J7).

Reference semantics:
- S10 GeoTIFF bbox clip: 实习二/实习二代码/clicp_image.py:8-37
  (``clip_image`` — window read of the population GeoTIFF).
- S11/J7 point sampling: lab2 nb (cell 22, json 775)
  ``get_population_density`` — ``transform.rowcol`` + ``np.clip`` of
  indices to the array bounds, nodata → NaN → global-mean fill.

Spark-first: a city-scale raster is megabytes — broadcast the numpy
array + affine transform once, sample inside an Arrow-batched pandas
UDF (vectorized rowcol arithmetic, no per-row Python). A 100 TB-scale
raster instead lands as a (tile_x, tile_y, array) DataFrame and the
sample becomes a grid-cell equi-join on tile id — same pattern as the
spatial join; the broadcast path below is the small-raster strategy.

The container has no rasterio/GDAL, so the GeoTIFF decode step is
stubbed (`read_geotiff`); the engine-side contract — north-up affine
(x0, dx, y0, dy), row-major array, nodata sentinel — is real and is
exercised by the deterministic synthetic raster used in tests/oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Affine:
    """North-up affine transform: lon = x0 + col·dx, lat = y0 − row·dy."""

    x0: float
    dx: float
    y0: float
    dy: float

    def rowcol(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        col = np.floor((lon - self.x0) / self.dx).astype("int64")
        row = np.floor((self.y0 - lat) / self.dy).astype("int64")
        return row, col


def read_geotiff(path: str):  # pragma: no cover - environment stub
    """S10 — GeoTIFF decode stub: rasterio is not available in this
    environment. At deploy time this returns (array, Affine, nodata)."""
    raise NotImplementedError(
        "GeoTIFF decode requires rasterio/GDAL; use synthetic_raster() "
        "or pass a (numpy array, Affine, nodata) triple directly"
    )


def clip_raster(
    arr: np.ndarray, t: Affine, lon_min: float, lat_min: float, lon_max: float, lat_max: float
) -> tuple[np.ndarray, "Affine"]:
    """S10 — bbox clip (clicp_image.py window semantics): slice the
    array to the pixel window covering the bbox, return the shifted
    transform. Driver-side numpy — rasters here are broadcast-sized."""
    h, w = arr.shape
    c0 = int(np.clip(np.floor((lon_min - t.x0) / t.dx), 0, w - 1))
    c1 = int(np.clip(np.ceil((lon_max - t.x0) / t.dx), 1, w))
    r0 = int(np.clip(np.floor((t.y0 - lat_max) / t.dy), 0, h - 1))
    r1 = int(np.clip(np.ceil((t.y0 - lat_min) / t.dy), 1, h))
    return arr[r0:r1, c0:c1], Affine(t.x0 + c0 * t.dx, t.dx, t.y0 - r0 * t.dy, t.dy)


# deterministic synthetic raster (tests + SQL oracle share the formula)
RASTER_W, RASTER_H = 120, 100
RASTER_T = Affine(x0=-74.3, dx=0.005, y0=41.0, dy=0.005)
RASTER_NODATA = -1.0


def synthetic_raster() -> np.ndarray:
    """value(row, col) = ((row·37 + col·17) mod 1000) / 10, with nodata
    where (row·31 + col·13) mod 97 == 0 — closed-form, so the DuckDB
    oracle can recompute any pixel without seeing the array."""
    rows = np.arange(RASTER_H)[:, None]
    cols = np.arange(RASTER_W)[None, :]
    vals = ((rows * 37 + cols * 17) % 1000) / 10.0
    nod = (rows * 31 + cols * 13) % 97 == 0
    return np.where(nod, RASTER_NODATA, vals)


def raster_valid_mean(arr: np.ndarray, nodata: float) -> float:
    m = arr[arr != nodata]
    return float(m.mean()) if m.size else float("nan")


def sample_raster(
    df: DataFrame,
    arr: np.ndarray,
    t: Affine,
    nodata: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
    out: str = "raster_value",
    fill: float | None = None,
) -> DataFrame:
    """S11/J7 — sample the broadcast raster at each point.

    Reference behavior (get_population_density): indices clipped into
    bounds (points off the raster take the edge pixel), nodata → the
    valid-cell mean (or ``fill``). Vectorized numpy over Arrow batches.
    """
    fill_v = raster_valid_mean(arr, nodata) if fill is None else fill
    sc = df.sparkSession.sparkContext
    b_arr = sc.broadcast(arr)

    @F.pandas_udf("double")
    def _sample(lon: pd.Series, lat: pd.Series) -> pd.Series:
        a = b_arr.value
        h, w = a.shape
        row, col = t.rowcol(lon.to_numpy(), lat.to_numpy())
        row = np.clip(row, 0, h - 1)
        col = np.clip(col, 0, w - 1)
        v = a[row, col]
        return pd.Series(np.where(v == nodata, fill_v, v))

    return df.withColumn(out, _sample(F.col(lon_col), F.col(lat_col)))


def tiled_raster_df(spark, tile_h: int = 25, tile_w: int = 30) -> DataFrame:
    """S10 scale path (SURVEY §1.1 "large raster"): the raster as a
    (tile_row, tile_col, vals) DataFrame — one row per tile, pixel
    values flattened row-major. This is the parquet landing format for
    rasters too big to broadcast; here the tiles are generated from the
    synthetic raster's closed form entirely in SQL expressions, so no
    array ever ships from the driver."""
    assert RASTER_H % tile_h == 0 and RASTER_W % tile_w == 0
    n_tc = RASTER_W // tile_w
    n_tiles = (RASTER_H // tile_h) * n_tc
    r = f"((id div {n_tc}) * {tile_h} + i div {tile_w})"
    c = f"((id % {n_tc}) * {tile_w} + i % {tile_w})"
    return spark.range(n_tiles).selectExpr(
        f"id div {n_tc} AS tile_row",
        f"id % {n_tc} AS tile_col",
        f"transform(sequence(0, {tile_h * tile_w - 1}), i -> "
        f"CASE WHEN ({r} * 31 + {c} * 13) % 97 = 0 THEN {RASTER_NODATA}D "
        f"ELSE (({r} * 37 + {c} * 17) % 1000) / 10.0 END) AS vals",
    )


def sample_raster_tiled(
    df: DataFrame,
    tiles: DataFrame,
    t: Affine,
    nodata: float,
    fill: float,
    tile_h: int = 25,
    tile_w: int = 30,
    lon_col: str = "lon",
    lat_col: str = "lat",
    out: str = "raster_value",
    broadcast_tiles: bool = True,
) -> DataFrame:
    """S11/J7 over the tiled layout: points compute their clipped
    (row, col), derive (tile_row, tile_col) + within-tile offset, hash
    equi-join the tile table on the tile key, and `element_at` into the
    tile's value array — all JVM-side, the raster-lookup twin of the
    grid spatial join. Identical clip/nodata/mean-fill semantics to the
    broadcast `sample_raster` path (tests assert bit-parity). At scale
    drop ``broadcast_tiles`` and co-partition points and tiles on the
    tile key."""
    row = F.least(
        F.greatest(
            F.floor((F.lit(t.y0) - F.col(lat_col)) / F.lit(t.dy)), F.lit(0)
        ),
        F.lit(RASTER_H - 1),
    ).cast("bigint")
    col = F.least(
        F.greatest(
            F.floor((F.col(lon_col) - F.lit(t.x0)) / F.lit(t.dx)), F.lit(0)
        ),
        F.lit(RASTER_W - 1),
    ).cast("bigint")
    tagged = (
        df.withColumn("__r", row)
        .withColumn("__c", col)
        .withColumn("tile_row", F.expr(f"__r div {tile_h}"))
        .withColumn("tile_col", F.expr(f"__c div {tile_w}"))
        .withColumn("__idx", (F.col("__r") % tile_h) * tile_w + F.col("__c") % tile_w)
    )
    rhs = F.broadcast(tiles) if broadcast_tiles else tiles
    v = F.element_at("vals", (F.col("__idx") + 1).cast("int"))
    return (
        tagged.join(rhs, ["tile_row", "tile_col"])
        .withColumn(out, F.when(v == nodata, F.lit(fill)).otherwise(v))
        .drop("__r", "__c", "__idx", "tile_row", "tile_col", "vals")
    )


def raster_value_sql(lon_sql: str, lat_sql: str) -> str:
    """The oracle's closed-form equivalent of sample_raster over the
    synthetic raster (identical clip + nodata + mean-fill semantics)."""
    t = RASTER_T
    row = (
        f"least(greatest(floor(({t.y0!r} - ({lat_sql})) / {t.dy!r}), 0), {RASTER_H - 1})::BIGINT"
    )
    col = (
        f"least(greatest(floor((({lon_sql}) - ({t.x0!r})) / {t.dx!r}), 0), {RASTER_W - 1})::BIGINT"
    )
    mean_sql = f"""(
      SELECT avg(((r * 37 + c * 17) % 1000) / 10.0)
      FROM (SELECT unnest(generate_series(0, {RASTER_H - 1})) AS r),
           (SELECT unnest(generate_series(0, {RASTER_W - 1})) AS c)
      WHERE (r * 31 + c * 13) % 97 <> 0
    )"""
    return f"""(
      CASE WHEN (({row}) * 31 + ({col}) * 13) % 97 = 0 THEN {mean_sql}
           ELSE ((({row}) * 37 + ({col}) * 17) % 1000) / 10.0 END
    )"""
