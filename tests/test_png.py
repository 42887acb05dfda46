"""Pure-Python PNG codec tests (sources/png.py) — decoded against
HAND-CONSTRUCTED PNG byte streams (chunks + filters assembled with
stdlib struct/zlib directly in the test, independent of write_png), so
the reader is checked against the spec, not against itself — the same
independent-writer strategy as the GeoTIFF tests."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from geo_big_data_analysis_spark.sources.multimodal import (
    decode_media,
    extract_features,
    resize_image,
    synthesize_media,
)
from geo_big_data_analysis_spark.sources.png import (
    PNG_SIGNATURE,
    is_png,
    read_png,
    write_png,
)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _make_png(scanlines: list[bytes], w: int, h: int, color_type: int,
              bit_depth: int = 8, plte: bytes | None = None) -> bytes:
    """Assemble a PNG from pre-filtered scanlines (each starts with its
    filter-type byte)."""
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    out = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(b"".join(scanlines))) + _chunk(b"IEND", b"")


def test_grey_filter_none_and_up():
    # 3x2 greyscale; row0 filter None, row1 filter Up (deltas)
    row0 = bytes([0, 10, 20, 30])
    row1 = bytes([2, 5, 5, 5])  # Up: +5 over row0 -> 15, 25, 35
    img = read_png(_make_png([row0, row1], 3, 2, 0))
    assert img.shape == (2, 3)
    assert img.tolist() == [[10, 20, 30], [15, 25, 35]]


def test_grey_filter_sub_average_paeth():
    # 4x3 greyscale exercising Sub, Average, Paeth reconstruction
    # Sub: recon[x] = raw[x] + recon[x-1]
    row0 = bytes([1, 100, 10, 10, 10])       # -> 100,110,120,130
    # Average: recon[x] = raw[x] + (left + up)//2
    row1 = bytes([3, 50, 10, 10, 10])        # -> 100, 115, 127, 138
    # Paeth: predictor of (left, up, upper-left)
    row2 = bytes([4, 1, 2, 3, 4])
    img = read_png(_make_png([row0, row1, row2], 4, 3, 0))
    assert img[0].tolist() == [100, 110, 120, 130]
    r1 = [50 + (0 + 100) // 2]
    for x, d in zip(range(1, 4), [10, 10, 10]):
        r1.append((d + (r1[x - 1] + img[0][x]) // 2) % 256)
    assert img[1].tolist() == r1
    # verify Paeth row against a scalar re-implementation
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    expect = []
    for x, d in zip(range(4), [1, 2, 3, 4]):
        left = expect[x - 1] if x else 0
        up = int(img[1][x])
        ul = int(img[1][x - 1]) if x else 0
        expect.append((d + paeth(left, up, ul)) % 256)
    assert img[2].tolist() == expect


def test_rgb_and_rgba_roundtrip_against_handmade():
    # 2x2 RGB, filter None
    px = [[255, 0, 0, 0, 255, 0], [0, 0, 255, 9, 9, 9]]
    rows = [bytes([0] + px[0]), bytes([0] + px[1])]
    img = read_png(_make_png(rows, 2, 2, 2))
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0] and img[1, 1].tolist() == [9, 9, 9]
    # RGBA with Sub filter (bpp=4: first pixel raw, second adds)
    row = bytes([1, 10, 20, 30, 40, 1, 1, 1, 1])
    img4 = read_png(_make_png([row], 2, 1, 6))
    assert img4[0, 0].tolist() == [10, 20, 30, 40]
    assert img4[0, 1].tolist() == [11, 21, 31, 41]


def test_palette_png():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    rows = [bytes([0, 0, 1, 2])]
    img = read_png(_make_png(rows, 3, 1, 3, plte=plte))
    assert img.shape == (1, 3, 3)
    assert img[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]


def test_16bit_high_byte():
    # one 16-bit grey pixel 0xABCD -> 8-bit 0xAB
    rows = [bytes([0, 0xAB, 0xCD])]
    img = read_png(_make_png(rows, 1, 1, 0, bit_depth=16))
    assert img.tolist() == [[0xAB]]


def test_multi_idat_stream():
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    comp = zlib.compress(bytes([0, 7, 8]))
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:3])
        + _chunk(b"IDAT", comp[3:])
        + _chunk(b"IEND", b"")
    )
    assert read_png(data).tolist() == [[7, 8]]


def test_writer_reader_roundtrip():
    rng = np.random.default_rng(7)
    for shape in [(5, 4), (3, 6, 3), (2, 2, 4)]:
        for ft in [0, 1, 2, 3, 4, "mixed"]:
            a = rng.integers(0, 256, size=shape, dtype=np.uint8)
            back = read_png(write_png(a, filter_type=ft))
            assert back.shape == a.shape
            assert np.array_equal(back, a), (shape, ft)


def test_interlace_decodes_and_bad_signature_raises():
    # A 1x1 Adam7 image: only pass 1 contributes, so the stream is a
    # single filtered scanline (filter byte 0 + one gray sample).
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)  # Adam7
    idat = zlib.compress(b"\x00\x9c")
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(read_png(data), np.array([[0x9C]], dtype=np.uint8))
    with pytest.raises(ValueError, match="signature"):
        read_png(b"JFIF....")
    assert not is_png(b"JFIF....")


def test_decode_media_png_real(spark):
    """The multimodal image path is un-stubbed for PNG: decode_media
    returns real pixels, and extract_features histograms the DECODED
    pixel values (not the compressed payload bytes)."""
    grad = np.tile(np.arange(0, 240, 16, dtype=np.uint8), (4, 1))  # 4x15
    png = write_png(grad)
    assert np.array_equal(decode_media(png, "image"), grad)

    df = spark.createDataFrame(
        [(1, bytearray(png))], "item_id bigint, payload binary"
    ).selectExpr(
        "item_id",
        "payload",
        "named_struct('media_type', 'image', 'width', 15, 'height', 4,"
        " 'sample_rate', CAST(NULL AS INT), 'n_frames', CAST(NULL AS INT))"
        " AS media",
    )
    row = extract_features(df, decode=decode_media).collect()[0]
    # gradient covers each 16-wide bin exactly once per row -> uniform
    # histogram over the first 15 bins, nothing in the last
    assert row["n_bytes"] == len(png)
    hist = row["feature"]
    assert abs(sum(hist) - 1.0) < 1e-12
    assert all(abs(v - 1 / 15) < 1e-12 for v in hist[:15])
    assert hist[15] == 0.0


def test_resize_image_png_roundtrip(spark):
    """PNG payloads resize on the true pixel grid and re-encode as PNG;
    metadata follows."""
    base = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = write_png(base)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "item_id bigint, payload binary"
    ).selectExpr(
        "item_id",
        "payload",
        "named_struct('media_type', 'image', 'width', 8, 'height', 8,"
        " 'sample_rate', CAST(NULL AS INT), 'n_frames', CAST(NULL AS INT))"
        " AS media",
    )
    out = resize_image(df, out_w=4, out_h=2).collect()[0]
    assert out["media"]["width"] == 4 and out["media"]["height"] == 2
    got = read_png(bytes(out["payload"]))
    ys = (np.arange(2) * 8 // 2).astype(int)
    xs = (np.arange(4) * 8 // 4).astype(int)
    assert np.array_equal(got, base[np.ix_(ys, xs)])


def test_synthesized_corpus_unaffected(spark):
    """Non-PNG image payloads (the synthesized text-byte fixtures) keep
    the byte-grid fallback — multimodal_stats semantics unchanged."""
    docs = spark.createDataFrame(
        [(i, f"document {i} " + "x" * (i % 10)) for i in range(6)],
        "doc_id bigint, text string",
    )
    m = synthesize_media(docs, "doc_id", "text")
    out = resize_image(m, out_w=8, out_h=4)
    img_rows = [r for r in out.collect() if r["media"]["media_type"] == "image"]
    assert img_rows and all(
        len(bytes(r["payload"])) == 32 for r in img_rows
    )
