"""Pure-Python PNG decode/encode (un-stubbing the multimodal image
path — VERDICT r2 missing #2, same trick as the pure-Python GeoTIFF
reader in `sources/raster.py`: stdlib ``zlib`` + ``struct`` + numpy,
no pillow).

Scope (documented feature matrix, like the TIFF reader):
- decode: 8-bit greyscale (color type 0), RGB (2), palette (3),
  grey+alpha (4), RGBA (6); all five scanline filters
  (None/Sub/Up/Average/Paeth, PNG spec §9); multi-IDAT streams;
  Adam7 interlace (the seven reduced images of spec §8.2, each with
  its own filtered scanlines, scattered back onto the pixel grid);
  16-bit samples are down-shifted to 8-bit (high byte, the PNG
  recommendation for 8-bit consumers).
- encode: 8-bit greyscale / RGB / RGBA; filter 0-4 or per-row
  cycling scanline filters; optional Adam7 interlaced output — the
  deterministic sink for resize round-trips.

Reference: PNG (Portable Network Graphics) Specification, Second
Edition (ISO/IEC 15948:2003) — filter reconstruction functions §9.2,
Paeth predictor §9.4.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel for each PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass grid (spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        yield ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            break


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters into the raw byte matrix
    (height x stride). Sequential over rows (each row depends on the
    previous — inherent to the format); Sub/Average/Paeth are also
    sequential in x (left-pixel dependency, spec §9.2)."""
    mat = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub — sequential in x (prefix dependency)
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                p = left + int(prev[x]) - ul
                pa, pb, pc = abs(p - left), abs(p - int(prev[x])), abs(p - ul)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = int(prev[x])
                else:
                    pred = ul
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        mat[y] = line
        prev = line
    return mat


def read_png(data: bytes) -> np.ndarray:
    """Decode a PNG into a uint8 array: (H, W) for greyscale, (H, W, C)
    otherwise. See the module docstring for the feature matrix."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(payload)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    if bit_depth not in (8, 16) or (bit_depth == 16 and color_type == 3):
        raise NotImplementedError(f"PNG bit depth {bit_depth} not supported")
    channels = _CHANNELS[color_type]
    sample_bytes = bit_depth // 8
    bpp = channels * sample_bytes
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        # Adam7: seven independently-filtered reduced images (§8.2),
        # deinterlaced by scattering each pass onto the pixel grid
        mat = np.zeros((height, stride), dtype=np.uint8)
        view = mat.reshape(height, width, bpp)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pass_stride = pw * bpp
            sub = _unfilter(raw[pos : pos + ph * (pass_stride + 1)], ph, pass_stride, bpp)
            pos += ph * (pass_stride + 1)
            view[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        if pos != len(raw):
            raise ValueError("PNG IDAT stream has the wrong decompressed size")
    else:
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG IDAT stream has the wrong decompressed size")
        mat = _unfilter(raw, height, stride, bpp)
    if bit_depth == 16:
        # keep the high byte — the spec's sample-depth rescale for
        # 8-bit consumers (truncation, bit-replication not needed here)
        mat = mat.reshape(height, width, channels, 2)[:, :, :, 0]
    else:
        mat = mat.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        mat = palette[mat[:, :, 0]]
    if mat.shape[2] == 1:
        return mat[:, :, 0]
    return mat


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _scalar_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply scanline filter ``ftype`` (spec §9.2 forward direction)."""
    out = bytearray([ftype])
    for x in range(len(line)):
        left = line[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:
            pred = _scalar_paeth(left, up, ul)
        out.append((line[x] - pred) & 0xFF)
    return bytes(out)


def write_png(
    arr: np.ndarray, filter_type: int | str = 0, interlace: bool = False
) -> bytes:
    """Encode a uint8 array — (H, W) grey, (H, W, 3) RGB, or
    (H, W, 4) RGBA — as a PNG. ``filter_type`` is one of 0-4 applied
    to every scanline, or ``"mixed"`` to cycle through all five per
    row (so a decode of the output exercises every reconstruction
    path — used by the round-trip query's oracle check).
    ``interlace=True`` emits Adam7: each of the seven reduced images
    (§8.2) is gathered from the pixel grid and filtered
    independently."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    bpp = c
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    rows = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            flat = sub.reshape(ph, pw * c)
            prev = bytes(pw * c)
            for y in range(ph):
                ft = (y % 5) if filter_type == "mixed" else int(filter_type)
                line = flat[y].tobytes()
                rows.extend(_filter_line(ft, line, prev, bpp))
                prev = line
        return (
            PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(rows), 6))
            + _chunk(b"IEND", b"")
        )
    flat = a.reshape(h, w * c)
    prev = bytes(w * c)
    for y in range(h):
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        line = flat[y].tobytes()
        rows.extend(_filter_line(ft, line, prev, bpp))
        prev = line
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + _chunk(b"IEND", b"")
    )
