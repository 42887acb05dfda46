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


def test_geotiff_rejects_non_tiff(tmp_path):
    p = tmp_path / "not_a.tif"
    p.write_bytes(b"PK\x03\x04 definitely not a tiff")
    with pytest.raises(ValueError, match="not a TIFF"):
        read_geotiff(str(p))


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


# --- pure-Python GeoTIFF decode (S10, VERDICT r1 #6) -----------------------

def _write_tiff(path, chunks, entries, byteorder="<"):
    """Independent minimal TIFF writer (test-side only): lays out
    header | pixel chunks | external values | IFD. ``chunks`` is a list
    of raw byte strings; ``entries`` maps tag -> (type, values) with
    CHUNK_OFFSETS/CHUNK_COUNTS filled in here."""
    import struct

    type_fmt = {1: "B", 2: "s", 3: "H", 4: "I", 11: "f", 12: "d"}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 11: 4, 12: 8}

    data_start = 8
    chunk_offsets = []
    pos = data_start
    for ch in chunks:
        chunk_offsets.append(pos)
        pos += len(ch)
        if pos % 2:
            pos += 1
    body = bytearray()
    for ch in chunks:
        body += ch
        if len(body) % 2:
            body += b"\x00"

    # resolve offset/count placeholder tags
    resolved = {}
    for tag, (typ, vals) in entries.items():
        if vals == "CHUNK_OFFSETS":
            vals = chunk_offsets
        elif vals == "CHUNK_COUNTS":
            vals = [len(c) for c in chunks]
        resolved[tag] = (typ, vals)

    ext = bytearray()
    ifd_entries = []
    n = len(resolved)
    ifd_off = data_start + len(body)
    ext_off = ifd_off + 2 + 12 * n + 4
    for tag in sorted(resolved):
        typ, vals = resolved[tag]
        if typ == 2:
            raw = vals[0] + b"\x00"
            cnt = len(raw)
        else:
            raw = struct.pack(byteorder + type_fmt[typ] * len(vals), *vals)
            cnt = len(vals)
        if len(raw) <= 4:
            inline = raw + b"\x00" * (4 - len(raw))
            ifd_entries.append(struct.pack(byteorder + "HHI", tag, typ, cnt) + inline)
        else:
            ifd_entries.append(
                struct.pack(byteorder + "HHII", tag, typ, cnt, ext_off + len(ext))
            )
            ext += raw
            if len(ext) % 2:
                ext += b"\x00"
    header = (b"II" if byteorder == "<" else b"MM") + struct.pack(
        byteorder + "HI", 42, ifd_off
    )
    ifd = struct.pack(byteorder + "H", n) + b"".join(ifd_entries) + struct.pack(
        byteorder + "I", 0
    )
    with open(path, "wb") as fh:
        fh.write(header + bytes(body) + ifd + bytes(ext))


def test_read_geotiff_uncompressed_strips_equals_synthetic(tmp_path):
    """Uncompressed float64 strip GeoTIFF of the synthetic raster
    decodes to the identical array + affine + nodata."""
    import struct

    from geo_big_data_analysis_spark.sources import raster as R

    arr = R.synthetic_raster()
    h, w = arr.shape
    rows_per_strip = 20
    chunks = [
        arr[r : r + rows_per_strip].astype("<f8").tobytes()
        for r in range(0, h, rows_per_strip)
    ]
    t = R.RASTER_T
    entries = {
        256: (4, [w]), 257: (4, [h]), 258: (3, [64]), 259: (3, [1]),
        262: (3, [1]), 273: (4, "CHUNK_OFFSETS"), 277: (3, [1]),
        278: (4, [rows_per_strip]), 279: (4, "CHUNK_COUNTS"), 339: (3, [3]),
        33550: (12, [t.dx, t.dy, 0.0]),
        33922: (12, [0.0, 0.0, 0.0, t.x0, t.y0, 0.0]),
        42113: (2, [b"-1"]),
    }
    p = str(tmp_path / "synthetic.tif")
    _write_tiff(p, chunks, entries)
    got, gt, nodata = R.read_geotiff(p)
    assert got.shape == arr.shape
    assert (got == arr).all()
    assert gt == t
    assert nodata == R.RASTER_NODATA


def test_read_geotiff_deflate_tiled_predictor(tmp_path):
    """Deflate-compressed TILED uint16 GeoTIFF with horizontal
    predictor decodes correctly (values = synthetic raster x 10 as
    integers), big-endian byte order."""
    import zlib

    import numpy as np

    from geo_big_data_analysis_spark.sources import raster as R

    arr = (R.synthetic_raster() * 10).astype("int32")
    arr[arr < 0] = 65535  # nodata sentinel for the uint16 layout
    arr = arr.astype("uint16")
    h, w = arr.shape
    th, tw = 32, 48
    chunks = []
    for r0 in range(0, h, th):
        for c0 in range(0, w, tw):
            tile = np.zeros((th, tw), dtype="uint16")
            blk = arr[r0 : r0 + th, c0 : c0 + tw]
            tile[: blk.shape[0], : blk.shape[1]] = blk
            diff = tile.copy()
            diff[:, 1:] = tile[:, 1:] - tile[:, :-1]  # horizontal predictor
            chunks.append(zlib.compress(diff.astype(">u2").tobytes()))
    t = R.RASTER_T
    entries = {
        256: (4, [w]), 257: (4, [h]), 258: (3, [16]), 259: (3, [8]),
        262: (3, [1]), 277: (3, [1]), 317: (3, [2]), 322: (4, [tw]),
        323: (4, [th]), 324: (4, "CHUNK_OFFSETS"), 325: (4, "CHUNK_COUNTS"),
        339: (3, [1]),
        33550: (12, [t.dx, t.dy, 0.0]),
        33922: (12, [0.0, 0.0, 0.0, t.x0, t.y0, 0.0]),
        42113: (2, [b"65535"]),
    }
    p = str(tmp_path / "tiled.tif")
    _write_tiff(p, chunks, entries, byteorder=">")
    got, gt, nodata = R.read_geotiff(p)
    assert got.shape == arr.shape
    assert (got == arr.astype("float64")).all()
    assert gt == t
    assert nodata == 65535.0


def test_read_geotiff_feeds_clip_and_sample(spark, tmp_path):
    """End-to-end S10+S11: decode a real .tif file, clip it, and sample
    points through the standard broadcast path — same results as the
    in-memory synthetic array."""
    from geo_big_data_analysis_spark.sources import raster as R

    arr = R.synthetic_raster()
    h, w = arr.shape
    chunks = [arr.astype("<f8").tobytes()]
    t = R.RASTER_T
    entries = {
        256: (4, [w]), 257: (4, [h]), 258: (3, [64]), 259: (3, [1]),
        262: (3, [1]), 273: (4, "CHUNK_OFFSETS"), 277: (3, [1]),
        278: (4, [h]), 279: (4, "CHUNK_COUNTS"), 339: (3, [3]),
        33550: (12, [t.dx, t.dy, 0.0]),
        33922: (12, [0.0, 0.0, 0.0, t.x0, t.y0, 0.0]),
        42113: (2, [b"-1"]),
    }
    p = str(tmp_path / "e2e.tif")
    _write_tiff(p, chunks, entries)
    dec_arr, dec_t, dec_nodata = R.read_geotiff(p)

    clipped, ct = R.clip_raster(dec_arr, dec_t, -74.2, 40.6, -74.0, 40.9)
    exp_clipped, exp_ct = R.clip_raster(arr, t, -74.2, 40.6, -74.0, 40.9)
    assert (clipped == exp_clipped).all() and ct == exp_ct

    pts = spark.createDataFrame(
        [(i, -74.29 + i * 0.013, 40.52 + i * 0.011) for i in range(30)],
        "id bigint, lon double, lat double",
    )
    via_file = R.sample_raster(pts, dec_arr, dec_t, dec_nodata).collect()
    via_mem = R.sample_raster(pts, arr, t, R.RASTER_NODATA).collect()
    assert [r["raster_value"] for r in via_file] == [r["raster_value"] for r in via_mem]
