"""Raster source tests (S10/S11/J7): clip window, sampling semantics,
nodata mean-fill, out-of-bounds clipping."""

from __future__ import annotations

import numpy as np
import pytest

from geo_big_data_analysis_spark.sources.raster import (
    RASTER_NODATA,
    RASTER_T,
    Affine,
    clip_raster,
    raster_valid_mean,
    read_geotiff,
    sample_raster,
    sample_raster_tiled,
    synthetic_raster,
    tiled_raster_df,
)


def test_geotiff_stub_raises():
    with pytest.raises(NotImplementedError):
        read_geotiff("/nonexistent.tif")


def test_affine_rowcol_roundtrip():
    t = Affine(x0=10.0, dx=0.5, y0=50.0, dy=0.25)
    row, col = t.rowcol(np.array([10.0, 11.2]), np.array([50.0, 49.4]))
    assert list(col) == [0, 2]
    assert list(row) == [0, 2]


def test_clip_raster_window():
    arr = np.arange(100, dtype="float64").reshape(10, 10)
    t = Affine(x0=0.0, dx=1.0, y0=10.0, dy=1.0)
    sub, t2 = clip_raster(arr, t, lon_min=2.0, lat_min=5.0, lon_max=5.0, lat_max=8.0)
    assert sub.shape == (3, 3)
    assert t2.x0 == 2.0 and t2.y0 == 8.0
    # top-left of the window = row 2, col 2 of the original
    assert sub[0, 0] == arr[2, 2]


def test_sample_known_pixels(spark):
    arr = np.array([[1.0, 2.0], [3.0, 4.0]])
    t = Affine(x0=0.0, dx=1.0, y0=2.0, dy=1.0)
    df = spark.createDataFrame(
        [(1, 0.5, 1.5), (2, 1.5, 1.5), (3, 0.5, 0.5), (4, 1.5, 0.5)],
        "id bigint, lon double, lat double",
    )
    got = {
        r["id"]: r["raster_value"]
        for r in sample_raster(df, arr, t, nodata=-1.0).collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}


def test_sample_out_of_bounds_clips_to_edge(spark):
    arr = np.array([[1.0, 2.0], [3.0, 4.0]])
    t = Affine(x0=0.0, dx=1.0, y0=2.0, dy=1.0)
    df = spark.createDataFrame(
        [(1, -99.0, 99.0), (2, 99.0, -99.0)], "id bigint, lon double, lat double"
    )
    got = {
        r["id"]: r["raster_value"]
        for r in sample_raster(df, arr, t, nodata=-1.0).collect()
    }
    assert got == {1: 1.0, 2: 4.0}  # NW corner pixel / SE corner pixel


def test_nodata_mean_fill(spark):
    arr = np.array([[-1.0, 2.0], [4.0, -1.0]])
    t = Affine(x0=0.0, dx=1.0, y0=2.0, dy=1.0)
    df = spark.createDataFrame([(1, 0.5, 1.5)], "id bigint, lon double, lat double")
    got = sample_raster(df, arr, t, nodata=-1.0).collect()[0]["raster_value"]
    assert got == pytest.approx(3.0)  # mean of valid cells {2, 4}
    # explicit fill overrides the mean
    got2 = sample_raster(df, arr, t, nodata=-1.0, fill=0.0).collect()[0]["raster_value"]
    assert got2 == 0.0


def test_tiled_sampling_bit_matches_broadcast(spark):
    import random

    rnd = random.Random(5)
    rows = [
        (i, rnd.uniform(-74.5, -73.5), rnd.uniform(40.3, 41.2))  # incl. off-raster
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id bigint, lon double, lat double")
    arr = synthetic_raster()
    fill = raster_valid_mean(arr, RASTER_NODATA)
    bc = {
        r["id"]: r["raster_value"]
        for r in sample_raster(df, arr, RASTER_T, RASTER_NODATA).collect()
    }
    tiles = tiled_raster_df(spark)
    td = {
        r["id"]: r["raster_value"]
        for r in sample_raster_tiled(
            df, tiles, RASTER_T, RASTER_NODATA, fill
        ).collect()
    }
    assert bc == td  # bit-identical across physical layouts


def test_synthetic_raster_matches_formula():
    arr = synthetic_raster()
    assert arr.shape == (100, 120)
    assert arr[3, 7] == (((3 * 37 + 7 * 17) % 1000) / 10.0)
    nod = (3 * 31) % 97  # row with col 0: nodata iff 93 % 97 == 0 -> no
    assert (arr == RASTER_NODATA).sum() > 0
    m = raster_valid_mean(arr, RASTER_NODATA)
    assert 0.0 < m < 100.0
    assert RASTER_T.dx == RASTER_T.dy == 0.005
