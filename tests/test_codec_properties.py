"""Property-based codec tests (hypothesis): the round-trip contracts
the registry oracle queries rely on, pushed across randomized inputs
instead of fixed fixtures.

- PNG / WAV / GIF are LOSSLESS by construction: encode→decode must be
  bit-exact for every input shape/content.
- Baseline JPEG is lossy with two pinned properties: (a) EXACT on
  block-constant content (DC-only blocks under the all-8 quantizer),
  (b) bounded reconstruction error on arbitrary content (quantization
  error ≤ a conservative bound; empirically ≤ ~6 grayscale / ~24 RGB).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geo_big_data_analysis_spark.sources.gif import read_gif, write_gif
from geo_big_data_analysis_spark.sources.jpeg import read_jpeg, write_jpeg
from geo_big_data_analysis_spark.sources.png import read_png, write_png
from geo_big_data_analysis_spark.sources.wav import read_wav, write_wav


def _rng_image(seed: int, h: int, w: int, channels: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.randint(0, 256, shape).astype(np.uint8)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    channels=st.sampled_from([1, 3]),
    filter_type=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
)
def test_png_roundtrip_lossless(seed, h, w, channels, filter_type):
    img = _rng_image(seed, h, w, channels)
    out = read_png(write_png(img, filter_type=filter_type))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_frames=st.integers(1, 1000),
    n_channels=st.integers(1, 2),
    bits=st.sampled_from([8, 16, 32]),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_lossless(seed, n_frames, n_channels, bits, rate):
    rng = np.random.RandomState(seed)
    lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    pcm = rng.randint(lo, hi + 1, (n_frames, n_channels)).astype(np.int64)
    if bits == 8:  # unsigned container: stored biased, decoded re-centered
        pcm = rng.randint(0, 256, (n_frames, n_channels)).astype(np.int64) - 128
    data = write_wav(pcm, rate=rate, bits=bits)
    out, got_rate = read_wav(data)
    assert got_rate == rate
    assert np.array_equal(out, pcm)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    n_frames=st.integers(1, 4),
    n_colors=st.integers(2, 32),
)
def test_gif_roundtrip_lossless(seed, h, w, n_frames, n_colors):
    rng = np.random.RandomState(seed)
    frames = [
        rng.randint(0, n_colors, (h, w)).astype(np.uint8) for _ in range(n_frames)
    ]
    palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    pal, out = read_gif(write_gif(frames, palette))
    assert len(out) == n_frames
    for got, want in zip(out, frames):
        assert np.array_equal(got, want)
    assert np.array_equal(pal[:n_colors], palette)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    bh=st.integers(1, 4),
    bw=st.integers(1, 4),
    channels=st.sampled_from([1, 3]),
)
def test_jpeg_block_constant_exact(seed, bh, bw, channels):
    rng = np.random.RandomState(seed)
    blocks = rng.randint(0, 256, (bh, bw)).astype(np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    if channels == 3:  # gray-valued RGB: Cb=Cr=128 exactly, still exact
        img = np.stack([img] * 3, axis=-1)
    out = read_jpeg(write_jpeg(img))
    assert np.array_equal(out, img)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(8, 32),
    w=st.integers(8, 32),
    channels=st.sampled_from([1, 3]),
)
def test_jpeg_bounded_error(seed, h, w, channels):
    img = _rng_image(seed, h, w, channels)
    out = read_jpeg(write_jpeg(img))
    assert out.shape == img.shape
    bound = 16 if channels == 1 else 32  # all-8 quant + YCbCr rounding
    assert np.abs(out.astype(int) - img.astype(int)).max() <= bound


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_frames=st.integers(1, 3000),
    n_channels=st.integers(1, 2),
    bps=st.sampled_from([8, 16]),
    blocksize=st.sampled_from([192, 256, 300, 1024]),
)
def test_flac_roundtrip_lossless(seed, n_frames, n_channels, bps, blocksize):
    from geo_big_data_analysis_spark.sources.flac import read_flac, write_flac

    rng = np.random.RandomState(seed)
    lim = 2 ** (bps - 1) - 1
    pcm = rng.randint(-lim, lim + 1, (n_frames, n_channels)).astype(np.int64)
    dec, rate = read_flac(write_flac(pcm, 16000, bps=bps, blocksize=blocksize))
    assert rate == 16000
    assert np.array_equal(dec, pcm)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 2000),
    law=st.sampled_from(["ulaw", "alaw"]),
)
def test_g711_idempotent_after_first_companding(seed, n, law):
    from geo_big_data_analysis_spark.sources.wav import read_wav, write_wav

    rng = np.random.RandomState(seed)
    pcm = rng.randint(-32768, 32768, (n, 1))
    d1, _ = read_wav(write_wav(pcm, 8000, g711=law))
    d2, _ = read_wav(write_wav(d1, 8000, g711=law))
    assert np.array_equal(d1, d2)
    # ≤512 = half the top-segment cell; up to 644 at the clipped
    # extremes (|pcm| > 32124 µ-law / 32256 A-law saturate)
    assert np.abs(d1 - pcm).max() <= 644


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    channels=st.sampled_from([1, 3]),
)
def test_png_adam7_roundtrip_lossless(seed, h, w, channels):
    img = _rng_image(seed, h, w, channels)
    assert np.array_equal(read_png(write_png(img, filter_type="mixed", interlace=True)), img)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    channels=st.sampled_from([1, 3]),
)
def test_bmp_roundtrip_lossless(seed, h, w, channels):
    from geo_big_data_analysis_spark.sources.bmp import read_bmp, write_bmp

    img = _rng_image(seed, h, w, channels)
    assert np.array_equal(read_bmp(write_bmp(img)), img)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_samples=st.integers(1, 60),
)
def test_mp4_container_roundtrip(seed, n_samples):
    from geo_big_data_analysis_spark.sources.mp4 import (
        extract_samples,
        read_mp4,
        write_mp4,
    )

    rng = np.random.RandomState(seed)
    samples = [
        rng.randint(0, 256, rng.randint(1, 100)).astype(np.uint8).tobytes()
        for _ in range(n_samples)
    ]
    durs = [int(d) for d in rng.randint(1, 10, n_samples)]
    data = write_mp4(samples, timescale=90000, durations=durs)
    (trk,) = read_mp4(data)
    assert extract_samples(data, trk) == samples
    assert trk.sample_durations == durs


@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(2, 900),
    n_ch=st.integers(1, 3),
    start=st.integers(-30000, 30000),
)
@settings(max_examples=25, deadline=None)
def test_ima_adpcm_unit_slope_exact(seed, n, n_ch, start):
    """IMA ADPCM roundtrips signals with per-sample slope in
    {-1, 0, +1} EXACTLY: at the resting step index 0 (step 7) a ±1
    difference quantizes to nibble 1/9 with delta 7>>3 + 7>>2 = 1 and
    index adjust -1, so the codec tracks unit slopes losslessly and
    never leaves index 0 — and the per-block headers restore sample 0
    verbatim. Random lengths also exercise the fact-chunk pad trim."""
    rng = np.random.default_rng(seed)
    steps = rng.integers(-1, 2, size=(n - 1, n_ch))
    sig = np.vstack(
        [np.full((1, n_ch), start, dtype=np.int64), steps]
    ).cumsum(axis=0)
    sig = np.clip(sig, -32768, 32767).astype(np.int32)
    dec, rate = read_wav(write_wav(sig, rate=8000, ima_adpcm=True))
    assert rate == 8000
    assert dec.shape == sig.shape
    assert np.array_equal(dec, sig)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    channels=st.sampled_from([3, 4]),
    palette_like=st.booleans(),
)
def test_webp_roundtrip_lossless(seed, h, w, channels, palette_like):
    """VP8L encode/decode round-trips exactly for arbitrary RGB/RGBA
    content; palette_like draws from a 4-value alphabet to exercise the
    simple-prefix-code (1-2 symbol) encoder paths."""
    from geo_big_data_analysis_spark.sources.webp import read_webp, write_webp

    rng = np.random.RandomState(seed)
    if palette_like:
        img = np.asarray([0, 85, 170, 255], dtype=np.uint8)[
            rng.randint(0, 4, (h, w, channels))
        ]
    else:
        img = rng.randint(0, 256, (h, w, channels)).astype(np.uint8)
    out = read_webp(write_webp(img))
    want = img
    if channels == 4 and (img[:, :, 3] == 255).all():
        want = img[:, :, :3]  # opaque alpha collapses to RGB by contract
    assert out.dtype == np.uint8
    assert np.array_equal(out, want)
