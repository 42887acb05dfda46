"""Pure-stdlib WAV (RIFF/PCM) decode/encode — un-stubbing the
multimodal AUDIO path the way `sources/png.py` un-stubbed images.

Scope: canonical RIFF WAVE with a PCM (format 1) ``fmt `` chunk —
8-bit unsigned, 16-bit and 32-bit signed little-endian samples, any
channel count (decoded to (n_frames, n_channels) int32) — plus
IEEE-float (format 3) 32/64-bit, decoded to (n_frames, n_channels)
float64; unknown chunks (LIST/fact/cue) are skipped by the chunk walk.
Compressed formats (ADPCM/extensible) raise NotImplementedError with
the format code named.

Reference: Microsoft/IBM "Multimedia Programming Interface and Data
Specifications 1.0" (the RIFF WAVE chunk layout).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def read_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV into ((n_frames, n_channels) int32 samples,
    sample_rate). 8-bit unsigned is re-centered to signed (−128 offset,
    the PCM convention)."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_fmt == 3:  # WAVE_FORMAT_IEEE_FLOAT
        fdt = {32: np.dtype("<f4"), 64: np.dtype("<f8")}.get(bits)
        if fdt is None:
            raise NotImplementedError(f"{bits}-bit float WAV not supported")
        samples = np.frombuffer(raw, dtype=fdt)
        n_frames = len(samples) // n_ch
        return (
            samples[: n_frames * n_ch].reshape(n_frames, n_ch).astype(np.float64),
            rate,
        )
    if audio_fmt in (6, 7):  # G.711 A-law / µ-law (ITU-T G.711)
        if bits != 8:
            raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
        codes = np.frombuffer(raw, dtype=np.uint8)
        lin = alaw_decode(codes) if audio_fmt == 6 else ulaw_decode(codes)
        n_frames = len(lin) // n_ch
        return lin[: n_frames * n_ch].reshape(n_frames, n_ch).astype(np.int32), rate
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV format code {audio_fmt} (non-PCM) not supported")
    dt = _PCM_DTYPES.get(bits)
    if dt is None:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    samples = np.frombuffer(raw, dtype=dt)
    n_frames = len(samples) // n_ch
    samples = samples[: n_frames * n_ch].reshape(n_frames, n_ch).astype(np.int32)
    if bits == 8:
        samples -= 128
    return samples, rate


# --- ITU-T G.711 companding (Tables 1a/2a of the Recommendation) ----------
# µ-law: 8 exponent segments over a biased 14-bit magnitude; code byte is
# complemented on the wire. A-law: segment 0/1 linear then doubling
# segments; code byte is XOR 0x55 on the wire. Both decode into the
# canonical ±32124 / ±32256 16-bit ranges.

def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    u = ~np.asarray(codes, dtype=np.uint8)
    seg = (u >> 4) & 0x7
    t = (((u & 0xF).astype(np.int32) << 3) + 0x84) << seg
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    p = np.asarray(pcm, dtype=np.int32)
    mask = np.where(p < 0, 0x7F, 0xFF)
    mag = np.where(p < 0, 0x84 - p, p + 0x84)
    mag = np.minimum(mag, 0x7FFF)
    # segment = how far the magnitude's MSB sits above bit 7
    seg = np.clip(np.floor(np.log2(mag)).astype(np.int32) - 7, 0, 7)
    code = (seg << 4) | ((mag >> (seg + 3)) & 0xF)
    return (code ^ mask).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    a = np.asarray(codes, dtype=np.uint8) ^ 0x55
    seg = (a >> 4) & 0x7
    t = ((a & 0xF).astype(np.int32) << 4)
    t = np.where(seg == 0, t + 8, ((t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    p = np.asarray(pcm, dtype=np.int32)
    mask = np.where(p >= 0, 0xD5, 0x55)
    mag = np.where(p >= 0, p, -p - 8)
    mag = np.clip(mag, 0, 0x7FFF)
    seg = np.clip(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 7, 0, 7)
    low = np.where(seg < 2, (mag >> 4) & 0xF, (mag >> (seg + 3)) & 0xF)
    code = (seg << 4) | low
    return (code ^ mask).astype(np.uint8)


def write_wav(
    samples: np.ndarray, rate: int, bits: int = 16, float_fmt: bool = False,
    g711: str | None = None,
) -> bytes:
    """Encode (n_frames,) or (n_frames, n_channels) samples as
    canonical WAV — PCM (format 1, integer samples) by default,
    IEEE-float (format 3, ``float_fmt=True`` with bits 32/64), or
    G.711 companded (``g711='ulaw'`` → format 7, ``'alaw'`` →
    format 6; input is 16-bit linear PCM, lossily companded to 8-bit
    code bytes per the Recommendation)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n_frames, n_ch = a.shape
    if g711 is not None:
        if g711 == "ulaw":
            raw, audio_fmt = ulaw_encode(a.ravel()).tobytes(), 7
        elif g711 == "alaw":
            raw, audio_fmt = alaw_encode(a.ravel()).tobytes(), 6
        else:
            raise ValueError(f"g711 must be 'ulaw' or 'alaw', got {g711!r}")
        bits = 8
    elif float_fmt:
        fdt = {32: np.dtype("<f4"), 64: np.dtype("<f8")}.get(bits)
        if fdt is None:
            raise ValueError(f"{bits}-bit float WAV not supported")
        raw = a.astype(fdt).tobytes()
        audio_fmt = 3
    else:
        dt = _PCM_DTYPES.get(bits)
        if dt is None:
            raise ValueError(f"{bits}-bit PCM not supported")
        if bits == 8:
            raw = (a + 128).astype(np.uint8).tobytes()
        else:
            raw = a.astype(dt).tobytes()
        audio_fmt = 1
    block_align = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", audio_fmt, n_ch, rate, rate * block_align, block_align, bits
    )
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(raw)), raw,
            b"" if len(raw) % 2 == 0 else b"\x00",
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
