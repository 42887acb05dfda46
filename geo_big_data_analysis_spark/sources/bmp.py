"""Pure-stdlib BMP (Windows DIB) decode/encode.

Written from the published format layout (BITMAPFILEHEADER +
BITMAPINFOHEADER, MSDN/Windows SDK documentation): uncompressed
(BI_RGB) 8-bit palettized and 24-bit BGR pixel data, bottom-up or
top-down row order, rows padded to 4-byte boundaries. 8-bit images
with a grayscale palette decode to (H, W) uint8; everything else
decodes to (H, W, 3) RGB uint8. Compressed BMPs (RLE4/RLE8/bitfields)
raise NotImplementedError with the compression code named.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


def read_bmp(data: bytes) -> np.ndarray:
    if not is_bmp(data):
        raise ValueError("not a BMP stream")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} (pre-BITMAPINFOHEADER)")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} (only BI_RGB)")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        rows = np.frombuffer(
            data[pixel_off : pixel_off + row_bytes * h], dtype=np.uint8
        ).reshape(h, row_bytes)[:, :w]
        idx = rows if top_down else rows[::-1]
        gray = (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()
        if gray:
            return pal[idx, 0].copy()
        return pal[idx].copy()
    if bpp == 24:
        rows = np.frombuffer(
            data[pixel_off : pixel_off + row_bytes * h], dtype=np.uint8
        ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        img = rows if top_down else rows[::-1]
        return img[:, :, ::-1].copy()  # BGR -> RGB
    raise NotImplementedError(f"{bpp}-bpp BMP (only 8/24)")


def write_bmp(img: np.ndarray) -> bytes:
    """Encode (H, W) grayscale (8-bit palettized with a gray palette)
    or (H, W, 3) RGB (24-bit BGR), bottom-up, BI_RGB."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        row_bytes = (w + 3) & ~3
        pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
        pixel_off = 14 + 40 + len(pal)
        body = bytearray()
        for row in a[::-1]:
            body += row.tobytes() + b"\x00" * (row_bytes - w)
        bpp, n_colors = 8, 256
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w = a.shape[:2]
        row_bytes = (w * 3 + 3) & ~3
        pal = b""
        pixel_off = 14 + 40
        body = bytearray()
        for row in a[::-1]:
            body += row[:, ::-1].tobytes() + b"\x00" * (row_bytes - w * 3)
        bpp, n_colors = 24, 0
    else:
        raise ValueError("expected (H, W) or (H, W, 3) uint8")
    file_size = pixel_off + len(body)
    hdr = b"BM" + struct.pack("<IHHI", file_size, 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835, n_colors, 0
    )
    return hdr + info + pal + bytes(body)
