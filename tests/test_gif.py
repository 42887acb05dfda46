"""Animated-GIF codec tests (sources/gif.py) — the LZW decoder is
checked against a HAND-ASSEMBLED GIF byte stream (header, color table,
image descriptor and hand-packed LZW codes built in the test), plus
encoder/decoder round-trips across dictionary-reset boundaries."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geo_big_data_analysis_spark.sources.gif import (
    _lzw_decode,
    _lzw_encode,
    is_gif,
    read_gif,
    write_gif,
)
from geo_big_data_analysis_spark.sources.multimodal import (
    decode_media,
    frame_sample,
)


def _pack_codes(codes: list[tuple[int, int]]) -> bytes:
    """LSB-first bit packing of (code, width) pairs — an independent
    re-implementation of the GIF bit order for the handmade stream."""
    buf = 0
    nbits = 0
    out = bytearray()
    for code, width in codes:
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def test_lzw_decode_handmade_codes():
    # min_code_size=2: clear=4, eoi=5, first dynamic code=6.
    # Stream CLEAR, 1, 2, 6, EOI: after (1, 2) the table holds
    # 6="12", so code 6 is a plain lookup -> pixels 1 2 1 2.
    data = _pack_codes([(4, 3), (1, 3), (2, 3), (6, 3), (5, 3)])
    assert list(_lzw_decode(2, data, 4)) == [1, 2, 1, 2]
    # KwKwK special case: CLEAR, 1, 6 with code 6 NOT yet in the table
    # -> entry = prev + prev[0] = "11" -> pixels 1 1 1
    data2 = _pack_codes([(4, 3), (1, 3), (6, 3), (5, 3)])
    assert list(_lzw_decode(2, data2, 3)) == [1, 1, 1]


def test_lzw_roundtrip_long_and_reset():
    rng = np.random.default_rng(3)
    # enough 8-color pixels to overflow the 4096-entry dictionary and
    # force a mid-stream CLEAR + rebuild
    px = rng.integers(0, 8, size=60_000, dtype=np.uint8).tobytes()
    enc = _lzw_encode(3, px)
    assert _lzw_decode(3, enc, len(px)) == px


def test_handmade_single_frame_gif():
    # 2x2, 4-color global table, pixels [[0,1],[2,3]]
    gct = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    lzw = _lzw_encode(2, bytes([0, 1, 2, 3]))
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)
        + gct
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2, len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    pal, frames = read_gif(data)
    assert len(frames) == 1
    assert frames[0].tolist() == [[0, 1], [2, 3]]
    assert pal[3].tolist() == [9, 9, 9]


def test_animated_roundtrip_and_partial_frames():
    pal = np.array([[i * 32, 255 - i * 32, i * 10] for i in range(8)], np.uint8)
    f0 = np.arange(64, dtype=np.uint8).reshape(8, 8) % 8
    f1 = (f0 + 3) % 8
    f2 = (f0.T * 5) % 8
    data = write_gif([f0, f1, f2], pal)
    assert is_gif(data)
    got_pal, got = read_gif(data)
    assert len(got) == 3
    for want, g in zip([f0, f1, f2], got):
        assert np.array_equal(g, want)
    assert np.array_equal(got_pal[:8], pal)


def test_interlaced_frame_deinterlaced():
    # Hand-build an interlaced single-frame GIF: rows LZW-encoded in
    # the appendix-E 4-pass order (0::8, 4::8, 2::4, 1::2), interlace
    # flag set — the decoder must scatter them back to display order.
    h, w = 10, 3
    frame = np.arange(h * w, dtype=np.uint8).reshape(h, w) % 16
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8),
         np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    stream_rows = frame[order]  # pass-ordered rows as stored on disk
    pal = np.array([[i * 16, i * 16, i * 16] for i in range(16)], np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 3, 0, 0)  # GCT, 16 entries
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(4)  # min LZW code size
    lzw = _lzw_encode(4, stream_rows.tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out += b"\x3b"
    got_pal, frames = read_gif(bytes(out))
    assert len(frames) == 1
    assert np.array_equal(frames[0], frame)
    assert not is_gif(b"RIFF....WEBP")


def test_decode_media_and_frame_sample_gif(spark):
    pal = np.array([[i, i, i] for i in range(16)], np.uint8)
    frames = [
        (np.full((4, 4), k, dtype=np.uint8) + np.eye(4, dtype=np.uint8)) % 16
        for k in range(6)
    ]
    gif = write_gif(frames, pal)
    stacked = decode_media(gif, "video")
    assert stacked.shape == (6, 4, 4)
    assert all(np.array_equal(stacked[k], frames[k]) for k in range(6))

    df = spark.createDataFrame(
        [(1, bytearray(gif))], "item_id bigint, payload binary"
    ).selectExpr(
        "item_id",
        "payload",
        "named_struct('media_type', 'video', 'width', 4, 'height', 4,"
        " 'sample_rate', CAST(NULL AS INT), 'n_frames', 6) AS media",
    )
    out = frame_sample(df, every_k=2).collect()[0]
    _, kept = __import__(
        "geo_big_data_analysis_spark.sources.gif", fromlist=["read_gif"]
    ).read_gif(bytes(out["payload"]))
    assert len(kept) == 3
    assert all(np.array_equal(kept[j], frames[2 * j]) for j in range(3))


def test_multi_lct_true_color_decode():
    """Three frames, frame 1 carrying its own LOCAL color table
    (GIF89a §20): read_gif_rgb must color each frame through its own
    table, read_gif must keep exact indices and the GLOBAL table."""
    from geo_big_data_analysis_spark.sources.gif import read_gif_rgb

    gct = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    lct = np.array([[1, 2, 3], [40, 50, 60], [70, 80, 90], [200, 201, 202]], np.uint8)
    f0 = np.array([[0, 1], [2, 3]], np.uint8)
    f1 = np.array([[3, 2], [1, 0]], np.uint8)
    f2 = np.array([[1, 1], [2, 2]], np.uint8)
    data = write_gif([f0, f1, f2], gct, local_palettes=[None, lct, None])

    rgb = read_gif_rgb(data)
    assert len(rgb) == 3
    # frame 0 through GCT
    assert np.array_equal(rgb[0], gct[f0])
    # frame 1 through ITS OWN LCT — the round-4 limitation, now real
    assert np.array_equal(rgb[1], lct[f1])
    # frame 2 back through GCT: the LCT never leaks forward
    assert np.array_equal(rgb[2], gct[f2])

    # index-space API unchanged: exact indices, global palette only
    pal, idx_frames = read_gif(data)
    assert np.array_equal(pal[:4], gct)
    for want, got in zip([f0, f1, f2], idx_frames):
        assert np.array_equal(got, want)


def test_local_palette_wider_than_global():
    """An LCT larger than the GCT forces a wider per-frame LZW code
    size; the decoder must honor the per-image min-code."""
    from geo_big_data_analysis_spark.sources.gif import read_gif_rgb

    gct = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)  # 1-bit
    lct = np.array([[i, 2 * i, 3 * i] for i in range(16)], np.uint8)  # 4-bit
    f0 = np.array([[0, 1], [1, 0]], np.uint8)
    f1 = np.array([[15, 7], [3, 12]], np.uint8)
    data = write_gif([f0, f1], gct, local_palettes=[None, lct])
    rgb = read_gif_rgb(data)
    assert np.array_equal(rgb[0], gct[f0])
    assert np.array_equal(rgb[1], lct[f1])
