"""Pure-Python baseline JPEG codec tests (sources/jpeg.py).

Decoder checked against a HAND-CONSTRUCTED byte stream (segments +
hand-computed Huffman entropy bits assembled with struct directly in
the test, independent of write_jpeg) — the same independent-writer
strategy as the PNG/GeoTIFF tests — plus encode→decode round-trips:
EXACT on the block-constant content class (only a DC coefficient,
losslessly quantized by the all-8 table) and bounded-error on general
content."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geo_big_data_analysis_spark.sources.jpeg import (
    _AC_LUM,
    _DC_LUM,
    _QTABLE,
    is_jpeg,
    read_jpeg,
    write_jpeg,
)
from geo_big_data_analysis_spark.sources.multimodal import decode_media


def _dqt() -> bytes:
    body = bytes([0]) + bytes(int(q) for q in _QTABLE)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _sof0(h: int, w: int) -> bytes:
    body = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    return b"\xff\xc0" + struct.pack(">H", len(body) + 2) + body


def _dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _sos() -> bytes:
    body = bytes([1, 1, 0x00, 0, 63, 0])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def test_decode_hand_built_single_block():
    # One 8x8 grayscale block, constant 136. DC coefficient is
    # 8*(136-128) = 64; /8 quant -> 8; diff 8 -> category 4.
    # Annex K DC-lum canonical codes: cat0='00' (len 2); cats 1..5 =
    # '010'..'110' (len 3) => cat4 = '101'. Magnitude bits of +8 in 4
    # bits = '1000'. AC-lum EOB (0x00) is the 4-bit code '1010'
    # (len-2 codes '00','01' for 0x01,0x02; len-3 '100' for 0x03;
    # len-4 '1010' for 0x00). Bits: 101 1000 1010 + 5 pad ones ->
    # bytes 0xB1 0x5F.
    data = (
        b"\xff\xd8"
        + _dqt()
        + _sof0(8, 8)
        + _dht(0x00, *_DC_LUM)
        + _dht(0x10, *_AC_LUM)
        + _sos()
        + bytes([0xB1, 0x5F])
        + b"\xff\xd9"
    )
    img = read_jpeg(data)
    assert img.shape == (8, 8)
    assert np.array_equal(img, np.full((8, 8), 136, dtype=np.uint8))


def test_roundtrip_block_constant_gray_exact():
    y, x = np.mgrid[0:32, 0:32]
    for doc_id in (0, 29, 58):
        img = ((doc_id * 17 + (y // 8) * 8 + (x // 8) * 3) % 256).astype(np.uint8)
        out = read_jpeg(write_jpeg(img))
        assert np.array_equal(out, img)


def test_roundtrip_block_constant_gray_rgb_exact():
    # gray-valued RGB: Y = v, Cb = Cr = 128 exactly, so the color
    # transform round-trips losslessly on block-constant content too
    y, x = np.mgrid[0:16, 0:16]
    g = ((5 + (y // 8) * 11 + (x // 8) * 7) % 256).astype(np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    out = read_jpeg(write_jpeg(rgb))
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out, rgb)


def test_roundtrip_gradient_bounded_error():
    y, x = np.mgrid[0:24, 0:24]
    img = ((y * 5 + x * 3) % 256).astype(np.uint8)
    out = read_jpeg(write_jpeg(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_roundtrip_random_color_bounded_error():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    out = read_jpeg(write_jpeg(img))
    # all-8 quant + YCbCr rounding: small bounded reconstruction error
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24


def test_odd_dimensions_pad_and_crop():
    img = np.full((19, 13), 77, dtype=np.uint8)
    out = read_jpeg(write_jpeg(img))
    assert out.shape == (19, 13)
    assert np.array_equal(out, img)  # globally constant: exact


def test_feature_matrix_rejections():
    with pytest.raises(ValueError):
        read_jpeg(b"\x89PNG not a jpeg")
    # progressive SOF2
    data = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 8) + b"\x08\x00\x08\x00\x08\x01"
    with pytest.raises(NotImplementedError):
        read_jpeg(data)


def test_decode_hand_built_restart_markers():
    # 16x8 grayscale = 2 MCUs, DRI interval 1 -> one RST0 between them.
    # Each MCU is the constant-136 block from the single-block test
    # (11 bits, padded to 0xB1 0x5F); the RST resets the DC predictor,
    # so the SAME bits decode to 136 in both blocks.
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)
    data = (
        b"\xff\xd8"
        + _dqt()
        + _sof0(8, 16)
        + _dht(0x00, *_DC_LUM)
        + _dht(0x10, *_AC_LUM)
        + dri
        + _sos()
        + bytes([0xB1, 0x5F])
        + b"\xff\xd0"  # RST0
        + bytes([0xB1, 0x5F])
        + b"\xff\xd9"
    )
    img = read_jpeg(data)
    assert img.shape == (8, 16)
    assert np.array_equal(img, np.full((8, 16), 136, dtype=np.uint8))


def test_decode_wrong_restart_marker_raises():
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)
    data = (
        b"\xff\xd8"
        + _dqt()
        + _sof0(8, 16)
        + _dht(0x00, *_DC_LUM)
        + _dht(0x10, *_AC_LUM)
        + dri
        + _sos()
        + bytes([0xB1, 0x5F])
        + b"\xff\xd3"  # RST3 where RST0 is required
        + bytes([0xB1, 0x5F])
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError):
        read_jpeg(data)


def test_roundtrip_with_restart_intervals():
    y, x = np.mgrid[0:24, 0:40]  # 15 MCUs: several RST cycles
    img = ((7 * 17 + (y // 8) * 8 + (x // 8) * 3) % 256).astype(np.uint8)
    for interval in (1, 2, 7):
        out = read_jpeg(write_jpeg(img, restart_interval=interval))
        assert np.array_equal(out, img), interval
    rgb = np.stack([img, img, img], axis=-1)
    out = read_jpeg(write_jpeg(rgb, restart_interval=3))
    assert np.array_equal(out, rgb)


def test_decode_media_jpeg_path():
    y, x = np.mgrid[0:16, 0:16]
    img = (((y // 8) * 3 + (x // 8) * 5 + 40) % 256).astype(np.uint8)
    payload = write_jpeg(img)
    assert is_jpeg(payload)
    out = decode_media(payload, "image")
    assert np.array_equal(out, img)


def test_roundtrip_420_gray_constant_exact():
    # 16x16-block-constant gray-valued RGB: Y blocks constant, chroma
    # constant 128 (box-mean exact) -> lossless under 4:2:0 too
    y, x = np.mgrid[0:32, 0:48]
    g = ((11 + (y // 16) * 5 + (x // 16) * 9) % 256).astype(np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    out = read_jpeg(write_jpeg(rgb, subsampling="420"))
    assert np.array_equal(out, rgb)
    # with restart framing on top
    out2 = read_jpeg(write_jpeg(rgb, subsampling="420", restart_interval=2))
    assert np.array_equal(out2, rgb)


def test_roundtrip_420_smooth_bounded_error():
    y, x = np.mgrid[0:24, 0:40]
    sm = np.stack(
        [(y * 3) % 200, (x * 2) % 200, (y + x) % 200], axis=-1
    ).astype(np.uint8)
    out = read_jpeg(write_jpeg(sm, subsampling="420"))
    assert out.shape == sm.shape
    # chroma varies smoothly, so 2x2 box subsampling stays close
    assert np.abs(out.astype(int) - sm.astype(int)).max() <= 12


def test_unsupported_sampling_rejected():
    # hand-build an SOF with 4:2:2 sampling (0x21) - not supported
    body = struct.pack(">BHHB", 8, 16, 16, 3)
    body += bytes([1, 0x21, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    data = (
        b"\xff\xd8"
        + _dqt()
        + b"\xff\xc0" + struct.pack(">H", len(body) + 2) + body
    )
    with pytest.raises(NotImplementedError):
        read_jpeg(data)
    with pytest.raises(ValueError):
        write_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="422")
