"""Pure-Python animated-GIF decode/encode — un-stubbing the multimodal
VIDEO path (multi-frame standard container) the way `sources/png.py` /
`sources/wav.py` un-stubbed images and audio. Implements real GIF87a/
GIF89a LZW with variable code width, clear/EOI codes, and sub-block
framing.

Scope (documented feature matrix):
- decode: global + local color tables, multiple image descriptors
  (frames), graphic-control extensions (delay read, disposal ignored —
  frames are composited onto the running canvas at their offsets,
  which is exact for the full-frame streams the encoder here writes
  and for disposal-method-1 streams generally); interlaced frames are
  deinterlaced (the 4-pass 0::8/4::8/2::4/1::2 row scatter of
  appendix E). Single-palette limitation: the decoder
  returns ONE palette (the global color table) for the whole stream;
  a frame's local color table is parsed and skipped — its indices are
  still composited exactly, but its true colors are not representable
  in the single returned palette. Per GIF89a §20 an LCT scopes to its
  image only, so it is never allowed to leak into later GCT frames.
- encode: N full-canvas palette-indexed frames with one global color
  table, LZW-compressed (dictionary reset on table overflow at 4096).

Reference: CompuServe GIF89a specification (1990) — LZW §22,
block layout appendix.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in GIF_MAGICS


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    """GIF-variant LZW: variable code width starting at
    min_code_size+1, CLEAR resets the dictionary, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if byte >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += width
        return v

    def reset():
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    return bytes(out[:n_expected])


def _lzw_encode(min_code_size: int, pixels: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    def reset():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    emit(clear, width)
    prev = b""
    for b in pixels:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table, next_code, width = reset()
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos : pos + n])
        pos += n
    return b"".join(chunks), pos


def read_gif(data: bytes) -> tuple[np.ndarray, list[np.ndarray]]:
    """Decode a GIF into (palette (256, 3) uint8 padded, list of
    (H, W) uint8 palette-index frames composited on the canvas)."""
    if not is_gif(data):
        raise ValueError("not a GIF stream")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    palette = np.zeros((256, 3), dtype=np.uint8)
    if gct is not None:
        palette[: len(gct)] = gct
    canvas = np.zeros((h, w), dtype=np.uint8)
    frames: list[np.ndarray] = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            pos += 1  # label
            _, pos = _sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        fx, fy, fw, fh, fflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if fflags & 0x80:
            # GIF89a §20: a local color table scopes to ITS image only.
            # The single-palette return can't carry per-frame tables, so
            # the LCT is parsed and skipped without clobbering the
            # shared palette (documented limitation in the module
            # docstring) — later GCT-only frames keep their true colors.
            n = 2 << (fflags & 7)
            pos += 3 * n
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(min_code, lzw, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if fflags & 0x40:
            # interlaced frame (GIF89a §20, appendix E): rows are stored
            # in four passes — 0::8, 4::8, 2::4, 1::2 — scatter them
            # back to their display positions
            order = np.concatenate(
                [
                    np.arange(0, fh, 8),
                    np.arange(4, fh, 8),
                    np.arange(2, fh, 4),
                    np.arange(1, fh, 2),
                ]
            )
            deint = np.empty_like(idx)
            deint[order] = idx
            idx = deint
        canvas[fy : fy + fh, fx : fx + fw] = idx
        frames.append(canvas.copy())
    return palette, frames


def write_gif(
    frames: list[np.ndarray], palette: np.ndarray, delay_cs: int = 4
) -> bytes:
    """Encode full-canvas (H, W) uint8 index frames + an (n, 3) palette
    as an animated GIF89a (one global color table, a graphic-control
    extension per frame)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    pal = np.asarray(palette, dtype=np.uint8)
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    n_pal = 1 << bits
    table = np.zeros((n_pal, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    min_code = max(2, bits)
    for fr in frames:
        assert fr.shape == (h, w)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(min_code, fr.tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
