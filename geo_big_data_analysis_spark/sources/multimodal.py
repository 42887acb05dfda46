"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with typed metadata, decoding only inside Arrow
batches. This module implements that plumbing for real — schema
convention, mapInPandas batch shape, deterministic feature extraction.
The IMAGE path is real for PNG (incl. Adam7), baseline JPEG, BMP, and
lossless WebP/VP8L (`sources/png.py` / `jpeg.py` / `bmp.py` /
`webp.py`); AUDIO is real for
PCM/float/G.711 WAV and compressed FLAC (`sources/wav.py` /
`flac.py`); VIDEO is real at the pixel level for animated GIF
(`sources/gif.py`) AND for MJPEG-in-MP4 (sample slicing via
`sources/mp4.py` composed with the baseline-JPEG decoder in
`sources/jpeg.py`), and at the container level for every MP4 —
sample-table parse + re-mux, the layer a curation job actually
touches. MP3 streams get a real frame-header walk (`sources/mp3.py`,
duration/bitrate metadata without audio decode). ``resize_image``
does a true decode→resample→re-encode round-trip. Codec *pixel*
decode beyond these (H.264, lossy WebP, MP3 audio…) raises
NotImplementedError naming the swap-in point, and ``FAKE_DECODE``
substitutes a deterministic byte-level "decode" so those stages stay
testable without the libraries.

Schema convention:
    payload  binary                    -- the encoded media bytes
    media    struct<media_type string, -- 'image' | 'audio' | 'video'
                    width int, height int,
                    sample_rate int, n_frames int>

Feature extraction is Arrow-batched mapInPandas: per item we compute
size, sha256, and a 16-bin byte-value histogram normalized to unit L1 —
a stand-in embedding with the same plumbing (fixed-width float array
column) a real encoder would produce.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_type string, width int, height int, sample_rate int, n_frames int"
)

FEATURE_DIM = 16


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic media table from a text corpus: payload = UTF-8
    bytes of the text (opaque to everything downstream), metadata typed
    from stable arithmetic on the id. Stands in for a real ingest whose
    payloads are image/audio bytes."""
    i = F.col(id_col)
    mt = (
        F.when(i % 3 == 0, "image").when(i % 3 == 1, "audio").otherwise("video")
    )
    return df.select(
        F.col(id_col).alias("item_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            mt.alias("media_type"),
            F.when(i % 3 == 0, (64 + (i % 8) * 32).cast("int")).alias("width"),
            F.when(i % 3 == 0, (64 + ((i * 7) % 8) * 32).cast("int")).alias("height"),
            F.when(i % 3 == 1, F.lit(16000).cast("int")).alias("sample_rate"),
            F.when(i % 3 == 2, (8 + i % 120).cast("int")).alias("n_frames"),
        ).alias("media"),
    )


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """Codec decode. Images and audio are REAL: PNG payloads decode
    through the pure-Python reader (`sources/png.py` — zlib + unfilter)
    to the (H, W[, C]) uint8 pixel array; RIFF/WAVE payloads decode
    through `sources/wav.py` to (n_frames, n_channels) int32 PCM.
    Video codecs (and other image/audio formats) remain environment
    stubs — libav/pillow are not available here; the error names the
    swap-in point."""
    if media_type == "image":
        from .bmp import is_bmp, read_bmp
        from .jpeg import is_jpeg, read_jpeg
        from .png import is_png, read_png
        from .webp import is_webp, read_webp

        if is_png(payload):
            return read_png(payload)
        if is_jpeg(payload):
            return read_jpeg(payload)
        if is_bmp(payload):
            return read_bmp(payload)
        if is_webp(payload):
            return read_webp(payload)
        raise NotImplementedError(
            "non-PNG/JPEG/BMP/WebP-lossless image payload: install pillow "
            "for lossy WebP/AVIF/... (PNG incl. Adam7, baseline JPEG, BMP, "
            "and VP8L WebP decode natively via sources/png.py, jpeg.py, "
            "bmp.py, webp.py)"
        )
    if media_type == "audio":
        from .flac import is_flac, read_flac
        from .wav import is_wav, read_wav

        if is_wav(payload):
            return read_wav(payload)[0]
        if is_flac(payload):
            return read_flac(payload)[0]
        raise NotImplementedError(
            "non-WAV/FLAC audio payload: install av/soundfile for "
            "MP3/Ogg/... (PCM + float WAV decode natively via sources/wav.py, "
            "FLAC via sources/flac.py)"
        )
    if media_type == "video":
        from .gif import is_gif, read_gif

        if is_gif(payload):
            _pal, frames = read_gif(payload)
            return np.stack(frames)  # (n_frames, H, W) palette indices
        from .h264 import is_annexb_h264, read_annexb_h264
        from .mp4 import extract_samples, is_mp4, read_mp4

        # MP4 sniff FIRST (ADVICE r6): an MP4 whose leading box uses a
        # 64-bit largesize starts 00 00 00 01 — identical to an Annex-B
        # start code — and the next byte can alias an SPS/AUD NAL type.
        # The sniff is NOT strictly one-sided though (ADVICE r7): an
        # Annex-B stream whose first NAL is an SEI with nal_ref_idc=3
        # (header byte 0x66 = 'f') followed by payload bytes 'typ'
        # satisfies is_mp4 too. So the MP4 path structure-validates:
        # if the full box walk fails on a payload that ALSO sniffs as
        # Annex-B, fall back to the Annex-B parser instead of raising.
        tracks = None
        if is_mp4(payload):
            try:
                tracks = read_mp4(payload)
            except Exception:
                if not is_annexb_h264(payload):
                    raise  # genuinely malformed MP4 — surface the walk error
        if tracks is None and is_annexb_h264(payload):
            # Annex-B H.264 elementary stream: bitstream/SPS/PPS/slice
            # layers parse natively; I_PCM macroblocks decode to pixels
            # (sources/h264.py); CAVLC residual MBs raise the named
            # boundary error from inside the slice decoder.
            return read_annexb_h264(payload)
        if tracks is not None:
            from .jpeg import is_jpeg, read_jpeg

            trk = next((t for t in tracks if t.handler == "vide"), tracks[0])
            samples = extract_samples(payload, trk)
            # Motion-JPEG: every video sample is an independent baseline
            # JPEG — the one MP4 codec whose FRAME pixels decode natively
            # (sources/mp4.py sample slicing ∘ sources/jpeg.py decode).
            if samples and (
                trk.codec in ("jpeg", "mjpa", "mjpb", "MJPG", "mjpg")
                or all(is_jpeg(s) for s in samples)
            ):
                return np.stack([read_jpeg(s) for s in samples])
            raise NotImplementedError(
                f"MP4 sample codec {trk.codec!r} pixel decode: install av "
                "for H.264/VP9/... (MJPEG samples decode natively via "
                "sources/jpeg.py; container sample tables / re-mux are "
                "always native via sources/mp4.py)"
            )
        raise NotImplementedError(
            "unrecognized video payload: install av for VP9/AV1/... "
            "(animated GIF, MJPEG-in-MP4, and Annex-B H.264 I_PCM "
            "decode to pixels natively via sources/gif.py, sources/"
            "mp4.py + sources/jpeg.py, and sources/h264.py)"
        )
    raise NotImplementedError(
        f"no codec for {media_type}: install av, or use FAKE_DECODE"
    )


def FAKE_DECODE(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in decode: the payload bytes as uint8."""
    return np.frombuffer(payload, dtype=np.uint8)


def byte_histogram(raw: np.ndarray, bins: int = FEATURE_DIM) -> np.ndarray:
    """L1-normalized byte-value histogram — the deterministic stand-in
    embedding (all-zero for empty payloads)."""
    if raw.size == 0:
        return np.zeros(bins)
    h, _ = np.histogram(raw, bins=bins, range=(0, 256))
    return h / raw.size


def extract_features(df: DataFrame, decode=FAKE_DECODE) -> DataFrame:
    """mapInPandas feature extraction over (item_id, payload, media).

    Output: item_id, media_type, n_bytes, sha256, feature array
    (FEATURE_DIM floats). Batches stay Arrow-columnar; the decode
    callable is the only per-item Python and is swappable for a real
    codec."""
    schema = (
        f"item_id bigint, media_type string, n_bytes bigint, "
        f"sha256 string, feature array<double>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload, media in zip(
                pdf["item_id"], pdf["payload"], pdf["media"]
            ):
                raw = decode(bytes(payload), media["media_type"])
                out.append(
                    (
                        int(item_id),
                        media["media_type"],
                        len(payload),
                        hashlib.sha256(bytes(payload)).hexdigest(),
                        byte_histogram(raw).tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=["item_id", "media_type", "n_bytes", "sha256", "feature"]
            )

    return df.mapInPandas(gen, schema)


def resize_image(df: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Image resize to (out_w, out_h) with media.width/height metadata
    rewritten to match — the metadata-consistency contract a real
    resizer must keep. Non-image rows pass through unchanged.

    PNG and lossless-WebP payloads are resized FOR REAL: decoded
    through the pure-Python readers (`sources/png.py` /
    `sources/webp.py`), nearest-neighbor-resampled on the true pixel
    grid (all channels), and re-encoded in their own format — a full
    decode→transform→encode round-trip with no image library. Other
    payloads fall back to the deterministic byte-grid resample
    (row-major width×height view, trimmed/padded to a full grid) so the
    plumbing stays testable without codecs. Schema is preserved.
    """
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png import is_png, read_png, write_png
        from .webp import is_webp, read_webp, write_webp

        for pdf in batches:
            payloads, medias = [], []
            for p, m in zip(pdf["payload"], pdf["media"]):
                m = dict(m)
                p = bytes(p)
                if m["media_type"] != "image":
                    payloads.append(p)
                    medias.append(m)
                    continue
                if is_png(p):
                    px = read_png(p)
                    h, w = px.shape[0], px.shape[1]
                    ys = (np.arange(out_h) * h // out_h).astype(int)
                    xs = (np.arange(out_w) * w // out_w).astype(int)
                    payloads.append(write_png(px[np.ix_(ys, xs)]))
                elif is_webp(p):
                    px = read_webp(p)
                    h, w = px.shape[0], px.shape[1]
                    ys = (np.arange(out_h) * h // out_h).astype(int)
                    xs = (np.arange(out_w) * w // out_w).astype(int)
                    payloads.append(write_webp(px[np.ix_(ys, xs)]))
                elif m["width"] and m["height"]:
                    w, h = int(m["width"]), int(m["height"])
                    raw = np.frombuffer(p, dtype=np.uint8)
                    grid = np.resize(raw, (h, w))  # pad-by-repeat when short
                    ys = (np.arange(out_h) * h // out_h).astype(int)
                    xs = (np.arange(out_w) * w // out_w).astype(int)
                    payloads.append(grid[np.ix_(ys, xs)].tobytes())
                else:
                    payloads.append(p)
                    medias.append(m)
                    continue
                m["width"], m["height"] = out_w, out_h
                medias.append(m)
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["media"] = medias
            yield pdf

    return df.mapInPandas(gen, schema)


def frame_sample(df: DataFrame, every_k: int = 4) -> DataFrame:
    """Video frame sampling. Animated-GIF payloads are sampled FOR
    REAL at the pixel level (decoded through `sources/gif.py`, every
    k-th frame kept, re-encoded). MP4 payloads are sampled FOR REAL at
    the container level — the way a 100 TB curation job actually does
    it: parse the ISO-BMFF sample tables (`sources/mp4.py`), slice
    every k-th sample's byte range, re-mux with durations preserved —
    no codec decode, payload frames stay opaque. Other video payloads
    keep the deterministic byte-stride stand-in so codec-less plumbing
    stays testable. Non-video rows pass through unchanged; schema is
    preserved."""
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gif import is_gif, read_gif, write_gif
        from .mp4 import extract_samples, is_mp4, read_mp4, write_mp4

        for pdf in batches:
            mt = pdf["media"].map(lambda m: m["media_type"])
            out = []
            for p, t in zip(pdf["payload"], mt):
                p = bytes(p)
                if t != "video":
                    out.append(p)
                elif is_gif(p):
                    pal, frames = read_gif(p)
                    out.append(write_gif(frames[::every_k], pal))
                elif is_mp4(p):
                    trk = read_mp4(p)[0]
                    kept = extract_samples(p, trk)[::every_k]
                    out.append(
                        write_mp4(
                            kept,
                            timescale=trk.timescale,
                            durations=trk.sample_durations[::every_k],
                            handler=trk.handler or "vide",
                            codec=trk.codec or "raw ",
                        )
                    )
                else:
                    out.append(p[::every_k])
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return df.mapInPandas(gen, schema)
