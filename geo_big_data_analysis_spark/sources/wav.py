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


def write_wav(
    samples: np.ndarray, rate: int, bits: int = 16, float_fmt: bool = False
) -> bytes:
    """Encode (n_frames,) or (n_frames, n_channels) samples as
    canonical WAV — PCM (format 1, integer samples) by default, or
    IEEE-float (format 3, ``float_fmt=True`` with bits 32/64)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n_frames, n_ch = a.shape
    if float_fmt:
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
