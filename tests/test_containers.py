"""Contract tests for the container/metadata codecs added in round 4:
MP4 (ISO-BMFF sample tables + mux), MP3 (frame-header walk), BMP, the
G.711 WAV path, and Adam7 PNG interlace — plus the frame_sample MP4
wiring in sources/multimodal.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geo_big_data_analysis_spark.sources.bmp import is_bmp, read_bmp, write_bmp
from geo_big_data_analysis_spark.sources.mp3 import (
    is_mp3,
    read_mp3_frames,
    stream_stats,
    write_mp3_stream,
)
from geo_big_data_analysis_spark.sources.mp4 import (
    Mp4Track,
    extract_samples,
    is_mp4,
    read_mp4,
    write_mp4,
)
from geo_big_data_analysis_spark.sources.png import read_png, write_png
from geo_big_data_analysis_spark.sources.wav import (
    alaw_decode,
    alaw_encode,
    read_wav,
    ulaw_decode,
    ulaw_encode,
    write_wav,
)


# ---------------------------------------------------------------- MP4

def test_mp4_mux_parse_roundtrip():
    samples = [bytes([i] * ((i * 7) % 50 + 1)) for i in range(20)]
    durs = [(i % 5) + 1 for i in range(20)]
    data = write_mp4(samples, timescale=600, durations=durs)
    assert is_mp4(data)
    (trk,) = read_mp4(data)
    assert trk.track_id == 1
    assert trk.handler == "vide"
    assert trk.codec == "raw "
    assert trk.timescale == 600
    assert trk.sample_durations == durs
    assert extract_samples(data, trk) == samples


def test_mp4_resample_roundtrip():
    """The frame_sample operation at container level: keep every 3rd
    sample, re-mux, re-parse — byte-exact kept samples."""
    samples = [bytes(range(i, i + 10)) for i in range(0, 90, 10)]
    data = write_mp4(samples, timescale=90000, durations=[3000] * 9)
    (trk,) = read_mp4(data)
    kept = extract_samples(data, trk)[::3]
    data2 = write_mp4(kept, timescale=trk.timescale,
                      durations=trk.sample_durations[::3])
    (trk2,) = read_mp4(data2)
    assert extract_samples(data2, trk2) == samples[::3]
    assert trk2.duration == 3 * 3000


def test_mp4_multi_sample_chunks():
    """A hand-layout stream whose stsc packs samples 2-per-chunk —
    exercises the sample→chunk run-length resolution independently of
    the muxer (which writes 1-per-chunk)."""
    payload = b"".join(bytes([i]) * 4 for i in range(6))  # 6 samples, 4 B each
    mdat = struct.pack(">I", 8 + len(payload)) + b"mdat" + payload

    def full(fourcc, body):
        return struct.pack(">I", 12 + len(body)) + fourcc + b"\x00" * 4 + body

    def box(fourcc, body):
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    # chunks at sample boundaries: 3 chunks x 2 samples, 8 bytes apart
    stsc = full(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, 2, 1))
    stco = full(b"stco", struct.pack(">I", 3) + struct.pack(">III", 8, 16, 24))
    stsz = full(b"stsz", struct.pack(">II", 4, 6))  # constant size 4
    stts = full(b"stts", struct.pack(">I", 1) + struct.pack(">II", 6, 100))
    stsd = full(b"stsd", struct.pack(">I", 1) + struct.pack(">I", 16) + b"raw " + b"\x00" * 8)
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 13)
    mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 600) + b"\x00" * 4)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(b"tkhd", struct.pack(">III", 0, 0, 7) + b"\x00" * 72)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", trak)
    data = mdat + moov
    (trk,) = read_mp4(data)
    assert trk.track_id == 7
    assert trk.sample_offsets == [8, 12, 16, 20, 24, 28]
    assert extract_samples(data, trk) == [bytes([i]) * 4 for i in range(6)]


def test_mp4_errors():
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        read_mp4(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="moov"):
        read_mp4(struct.pack(">I", 8) + b"mdat")


# ---------------------------------------------------------------- MP3

def test_mp3_walk_vbr():
    s = write_mp3_stream([3, 5, 9, 9, 14])
    assert is_mp3(s)
    st = stream_stats(s)
    assert st["n_frames"] == 5 and st["vbr"] and st["sample_rate"] == 44100
    kbps = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    for idx, f in zip([3, 5, 9, 9, 14], read_mp3_frames(s)):
        assert f.bitrate_kbps == kbps[idx]
        assert f.frame_bytes == 144 * kbps[idx] * 1000 // 44100
        assert f.n_samples == 1152


def test_mp3_mpeg2_and_id3():
    s = write_mp3_stream([2, 2], sr_idx=2, version1=False)
    st = stream_stats(s)
    assert st["sample_rate"] == 16000 and not st["vbr"]
    assert abs(st["duration_s"] - 2 * 576 / 16000) < 1e-12
    id3 = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 10]) + b"x" * 10
    assert stream_stats(id3 + s)["n_frames"] == 2


def test_mp3_corrupt_fails_loudly():
    s = bytearray(write_mp3_stream([5, 5]))
    s[0] = 0x00
    with pytest.raises(ValueError):
        read_mp3_frames(bytes(s))


def test_mp3_trailing_garbage_fails_loudly():
    s = write_mp3_stream([5, 5])
    for n_extra in (1, 2, 3):
        with pytest.raises(ValueError, match="trailing garbage"):
            read_mp3_frames(s + b"\x00" * n_extra)
    # A full 128-byte ID3v1 trailer is still accepted...
    assert len(read_mp3_frames(s + b"TAG" + b"\x00" * 125)) == 2
    # ...but a truncated one is not.
    with pytest.raises(ValueError, match="trailing garbage"):
        read_mp3_frames(s + b"TAG" + b"\x00" * 50)


# ---------------------------------------------------------------- BMP

@pytest.mark.parametrize("shape", [(5, 5), (7, 13), (1, 1), (16, 3)])
def test_bmp_roundtrips(shape):
    rng = np.random.RandomState(sum(shape))
    g = rng.randint(0, 256, shape).astype(np.uint8)
    assert np.array_equal(read_bmp(write_bmp(g)), g)
    c = rng.randint(0, 256, shape + (3,)).astype(np.uint8)
    enc = write_bmp(c)
    assert is_bmp(enc)
    assert np.array_equal(read_bmp(enc), c)


def test_bmp_compressed_rejected():
    enc = bytearray(write_bmp(np.zeros((4, 4), dtype=np.uint8)))
    enc[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        read_bmp(bytes(enc))


# ---------------------------------------------------------------- G.711

def test_g711_code_identity():
    """encode(decode(c)) == c for every code byte — the canonical
    companding-table consistency check (µ-law 0x7F is −0, which
    re-encodes as +0 = 0xFF, the one legal exception)."""
    codes = np.arange(256, dtype=np.uint8)
    bad = np.nonzero(ulaw_encode(ulaw_decode(codes)) != codes)[0]
    assert list(bad) == [0x7F]
    assert ulaw_decode(np.array([0x7F], dtype=np.uint8))[0] == 0
    assert not np.nonzero(alaw_encode(alaw_decode(codes)) != codes)[0].size


def test_g711_canonical_ranges():
    codes = np.arange(256, dtype=np.uint8)
    u, a = ulaw_decode(codes), alaw_decode(codes)
    assert int(u.min()) == -32124 and int(u.max()) == 32124
    assert int(a.min()) == -32256 and int(a.max()) == 32256
    # wire zeros: µ-law 0xFF = +0; A-law min magnitudes ±8
    assert ulaw_decode(np.array([0xFF], dtype=np.uint8))[0] == 0
    assert alaw_decode(np.array([0xD5], dtype=np.uint8))[0] == 8


@pytest.mark.parametrize("law,fmt_code", [("ulaw", 7), ("alaw", 6)])
def test_g711_wav_container(law, fmt_code):
    rng = np.random.RandomState(4)
    pcm = rng.randint(-32000, 32000, (500, 2))
    enc = write_wav(pcm, 8000, g711=law)
    assert struct.unpack("<H", enc[20:22])[0] == fmt_code
    dec, rate = read_wav(enc)
    assert rate == 8000 and dec.shape == (500, 2)
    # companded once, further round-trips are lossless (idempotence)
    dec2, _ = read_wav(write_wav(dec, 8000, g711=law))
    assert np.array_equal(dec, dec2)
    # error bounded by the top-segment cell half-width
    assert int(np.abs(dec - pcm).max()) <= 512


# ---------------------------------------------------------------- Adam7

@pytest.mark.parametrize("shape", [(16, 16), (7, 13), (1, 1), (3, 9), (8, 8, 3), (5, 6, 4)])
def test_png_adam7_roundtrip(shape):
    rng = np.random.RandomState(sum(shape))
    img = rng.randint(0, 256, shape).astype(np.uint8)
    for ft in [0, "mixed"]:
        enc = write_png(img, filter_type=ft, interlace=True)
        assert enc[8 + 8 + 12] == 1  # IHDR interlace byte set
        assert np.array_equal(read_png(enc), img)


# ------------------------------------------------- frame_sample wiring

def test_frame_sample_mp4(spark):
    from pyspark.sql import functions as F

    from geo_big_data_analysis_spark.sources.multimodal import frame_sample

    samples = [bytes([i] * 8) for i in range(12)]
    payload = write_mp4(samples, timescale=600, durations=[50] * 12)
    df = spark.createDataFrame(
        [(1, bytearray(payload), {"media_type": "video", "width": None,
                                  "height": None, "sample_rate": None,
                                  "n_frames": 12})],
        "item_id long, payload binary, media struct<media_type string, width int, height int, sample_rate int, n_frames int>",
    )
    out = frame_sample(df, every_k=4).collect()[0]["payload"]
    (trk,) = read_mp4(bytes(out))
    assert extract_samples(bytes(out), trk) == samples[::4]
    assert trk.sample_durations == [50] * 3


# ---------------------------------------------------------------- IMA ADPCM
def test_ima_adpcm_roundtrip_error_bounded():
    """Format 0x11 encode→decode: first sample of each block exact,
    lossy reconstruction tracks a smooth signal tightly (the adaptive
    step converges), and shape/frame count survive the fact trim."""
    import numpy as np

    from geo_big_data_analysis_spark.sources.wav import read_wav, write_wav

    n = 700  # crosses a block boundary (257 samples/block) + partial block
    t = np.arange(n)
    sig = (8000 * np.sin(t / 25.0)).astype(np.int32)
    enc = write_wav(sig, rate=8000, ima_adpcm=True)
    dec, rate = read_wav(enc)
    assert rate == 8000 and dec.shape == (n, 1)
    err = np.abs(dec[:, 0] - sig)
    assert err[0] == 0  # block-1 header stores sample 0 verbatim
    assert err.max() <= 2000, err.max()
    assert err.mean() <= 120, err.mean()
    # genuine compression: ~4 bits/sample vs 16-bit PCM
    pcm = write_wav(sig, rate=8000)
    assert len(enc) < len(pcm) / 2.5


def test_ima_adpcm_stereo_mirror_and_known_nibbles():
    """Channels carry independent codec state: a mirrored stereo pair
    decodes to an exact mirror (sign-magnitude quantizer is odd-
    symmetric). Plus a hand-checked first data byte: encoding a +step
    jump from 0 at index 0 (step 7) gives nibble 0b0100 for delta 7
    then the low-magnitude follow-up nibble in the high half."""
    import numpy as np

    from geo_big_data_analysis_spark.sources.wav import (
        _ima_step_sample,
        read_wav,
        write_wav,
    )

    t = np.arange(600)
    ch1 = (6000 * np.sin(t / 17.0)).astype(np.int32)
    st = np.stack([ch1, -ch1], axis=1)
    dec, _ = read_wav(write_wav(st, rate=16000, ima_adpcm=True))
    assert dec.shape == (600, 2)
    assert np.array_equal(dec[:, 1], -dec[:, 0])

    # decoder-step unit check against the published tables:
    # nibble 4 at (pred=0, idx=0): step 7, delta = 7 + 7//8 = 7 ->
    # pred 7; index adjust for magnitude 4 is +2
    pred, idx = _ima_step_sample(4, 0, 0)
    assert (pred, idx) == (7, 2)
    # sign bit mirrors exactly
    pred_n, idx_n = _ima_step_sample(4 | 8, 0, 0)
    assert (pred_n, idx_n) == (-7, 2)
    # max-magnitude nibble 7: delta = 7 + 3 + 1 + 0 = 11, index +8
    assert _ima_step_sample(7, 0, 0) == (11, 8)
