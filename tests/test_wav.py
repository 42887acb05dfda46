"""WAV codec tests (sources/wav.py) — decode checked against
HAND-CONSTRUCTED RIFF byte streams (struct-packed in the test,
independent of write_wav), same strategy as the PNG/GeoTIFF tests."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geo_big_data_analysis_spark.sources.multimodal import decode_media
from geo_big_data_analysis_spark.sources.wav import is_wav, read_wav, write_wav


def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b""
    for cid, payload in chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _fmt(audio_fmt=1, n_ch=1, rate=8000, bits=16) -> bytes:
    block = n_ch * bits // 8
    return struct.pack("<HHIIHH", audio_fmt, n_ch, rate, rate * block, block, bits)


def test_mono_16bit_handmade():
    samples = [0, 1000, -1000, 32767, -32768]
    data = _riff([
        (b"fmt ", _fmt()),
        (b"data", struct.pack("<5h", *samples)),
    ])
    got, rate = read_wav(data)
    assert rate == 8000 and got.shape == (5, 1)
    assert got[:, 0].tolist() == samples


def test_stereo_and_unknown_chunks_skipped():
    frames = [(100, -100), (200, -200), (300, -300)]
    flat = [v for fr in frames for v in fr]
    data = _riff([
        (b"LIST", b"INFOjunkpayload"),   # must be skipped
        (b"fmt ", _fmt(n_ch=2, rate=44100)),
        (b"fact", struct.pack("<I", 3)),  # skipped too
        (b"data", struct.pack("<6h", *flat)),
    ])
    got, rate = read_wav(data)
    assert rate == 44100 and got.shape == (3, 2)
    assert got.tolist() == [list(fr) for fr in frames]


def test_8bit_unsigned_recentered():
    data = _riff([
        (b"fmt ", _fmt(bits=8)),
        (b"data", bytes([128, 255, 0, 129])),
    ])
    got, _ = read_wav(data)
    assert got[:, 0].tolist() == [0, 127, -128, 1]


def test_non_pcm_raises():
    # ADPCM (format 2) stays rejected; IEEE-float (3) is now supported
    data = _riff([(b"fmt ", _fmt(audio_fmt=2)), (b"data", b"\x00\x00")])
    with pytest.raises(NotImplementedError, match="format code 2"):
        read_wav(data)
    assert not is_wav(b"OggS....")


def test_float32_handmade_and_roundtrip():
    vals = [0.0, 0.5, -0.25, 1.0, -1.0]
    data = _riff([
        (b"fmt ", _fmt(audio_fmt=3, bits=32)),
        (b"data", struct.pack("<5f", *vals)),
    ])
    got, rate = read_wav(data)
    assert rate == 8000 and got.dtype == np.float64
    assert got[:, 0].tolist() == vals
    # writer roundtrip, 32- and 64-bit, stereo
    pcm = np.array([[0.125, -0.5], [0.75, 0.0]], dtype=np.float64)
    for bits in (32, 64):
        out, r = read_wav(write_wav(pcm, rate=16000, bits=bits, float_fmt=True))
        assert r == 16000
        assert np.allclose(out, pcm, atol=0 if bits == 64 else 1e-7)
    assert np.array_equal(
        read_wav(write_wav(pcm, rate=16000, bits=64, float_fmt=True))[0], pcm
    )


def test_writer_reader_roundtrip():
    rng = np.random.default_rng(11)
    for shape, bits in [((100,), 16), ((50, 2), 16), ((64, 3), 32), ((40,), 8)]:
        hi = 127 if bits == 8 else 2 ** (bits - 1) - 1
        a = rng.integers(-hi - 1, hi, size=shape, dtype=np.int64)
        back, rate = read_wav(write_wav(a, rate=22_050, bits=bits))
        assert rate == 22_050
        want = a if a.ndim == 2 else a[:, None]
        assert np.array_equal(back, want), (shape, bits)


def test_decode_media_wav_real():
    wav = write_wav(np.array([5, -5, 10, -10]), rate=16_000)
    got = decode_media(wav, "audio")
    assert got[:, 0].tolist() == [5, -5, 10, -10]
    with pytest.raises(NotImplementedError, match="non-WAV"):
        decode_media(b"ID3\x03rest-of-an-mp3", "audio")


def test_ima_adpcm_truncated_block_raises():
    """A payload that is not a whole number of ADPCM blocks fails loudly
    instead of silently dropping the trailing partial block."""
    sig = np.cumsum(np.ones(2000, dtype=np.int64)).reshape(-1, 1)
    data = bytearray(write_wav(sig, rate=8000, ima_adpcm=True))
    # locate the data chunk and shave 3 bytes off its payload
    i = data.index(b"data")
    (size,) = struct.unpack_from("<I", data, i + 4)
    struct.pack_into("<I", data, i + 4, size - 3)
    truncated = bytes(data[: i + 8 + size - 3]) + bytes(data[i + 8 + size:])
    with pytest.raises(ValueError, match="block_align"):
        read_wav(truncated)
