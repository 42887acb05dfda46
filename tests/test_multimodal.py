"""Multimodal binary-column tests: schema convention, stubbed decode,
Arrow batch plumbing, frame sampling round-trip."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_big_data_analysis_spark.sources.multimodal import (
    FAKE_DECODE,
    FEATURE_DIM,
    byte_histogram,
    decode_media,
    extract_features,
    frame_sample,
    synthesize_media,
)


def _corpus(spark):
    return spark.createDataFrame(
        [(i, f"document {i} " + "x" * (i % 10)) for i in range(12)],
        "doc_id bigint, text string",
    )


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "image")


def test_media_schema_and_metadata(spark):
    m = synthesize_media(_corpus(spark), "doc_id", "text")
    assert dict(m.dtypes)["payload"] == "binary"
    rows = {r["item_id"]: r["media"] for r in m.collect()}
    assert rows[0]["media_type"] == "image" and rows[0]["width"] is not None
    assert rows[1]["media_type"] == "audio" and rows[1]["sample_rate"] == 16000
    assert rows[2]["media_type"] == "video" and rows[2]["n_frames"] is not None
    # non-applicable metadata is null, not fake
    assert rows[1]["width"] is None and rows[0]["sample_rate"] is None


def test_payload_is_utf8_of_text(spark):
    m = synthesize_media(_corpus(spark), "doc_id", "text")
    r = m.filter(F.col("item_id") == 3).collect()[0]
    assert bytes(r["payload"]) == f"document 3 {'x' * 3}".encode()


def test_extract_features_contract(spark):
    m = synthesize_media(_corpus(spark), "doc_id", "text")
    f = extract_features(m)
    got = {r["item_id"]: r for r in f.collect()}
    assert len(got) == 12
    r = got[5]
    payload = f"document 5 {'x' * 5}".encode()
    assert r["n_bytes"] == len(payload)
    assert r["sha256"] == hashlib.sha256(payload).hexdigest()
    assert len(r["feature"]) == FEATURE_DIM
    assert sum(r["feature"]) == pytest.approx(1.0)  # L1-normalized
    exp = byte_histogram(FAKE_DECODE(payload, "audio"))
    assert r["feature"] == pytest.approx(list(exp))


def test_byte_histogram_empty():
    assert list(byte_histogram(np.array([], dtype=np.uint8))) == [0.0] * FEATURE_DIM


def test_frame_sample_strides_video_only(spark):
    m = synthesize_media(_corpus(spark), "doc_id", "text")
    s = frame_sample(m, every_k=3)
    before = {r["item_id"]: bytes(r["payload"]) for r in m.collect()}
    after = {r["item_id"]: bytes(r["payload"]) for r in s.collect()}
    for i in range(12):
        if i % 3 == 2:  # video
            assert after[i] == before[i][::3]
        else:
            assert after[i] == before[i]
    assert s.schema == m.schema  # schema-preserving


def test_custom_decode_is_pluggable(spark):
    m = synthesize_media(_corpus(spark), "doc_id", "text")
    calls = extract_features(m, decode=lambda p, t: np.zeros(4, dtype=np.uint8))
    r = calls.limit(1).collect()[0]
    # all-zero "decoded" array -> histogram mass in bin 0
    assert r["feature"][0] == pytest.approx(1.0)


def test_resize_image_metadata_and_size(spark):
    """resize_image: image payloads become out_w*out_h bytes with
    metadata rewritten to match; audio/video rows untouched."""
    from geo_big_data_analysis_spark.sources.multimodal import resize_image

    m = synthesize_media(_corpus(spark), "doc_id", "text")
    before = {r["item_id"]: r for r in m.collect()}
    out = {r["item_id"]: r for r in resize_image(m, out_w=8, out_h=4).collect()}
    assert set(out) == set(before)
    for i, r in out.items():
        if before[i]["media"]["media_type"] == "image":
            assert len(r["payload"]) == 8 * 4
            assert r["media"]["width"] == 8 and r["media"]["height"] == 4
        else:
            assert bytes(r["payload"]) == bytes(before[i]["payload"])
            assert r["media"] == before[i]["media"]


def test_resize_image_nearest_neighbor_values(spark):
    """The resample is deterministic nearest-neighbor over the byte
    grid: spot-check one image against the numpy reference."""
    from geo_big_data_analysis_spark.sources.multimodal import resize_image

    m = synthesize_media(_corpus(spark), "doc_id", "text")
    img = next(
        r for r in m.collect() if r["media"]["media_type"] == "image"
    )
    got = next(
        r
        for r in resize_image(m, out_w=8, out_h=4).collect()
        if r["item_id"] == img["item_id"]
    )
    w, h = img["media"]["width"], img["media"]["height"]
    grid = np.resize(np.frombuffer(bytes(img["payload"]), np.uint8), (h, w))
    ys = (np.arange(4) * h // 4).astype(int)
    xs = (np.arange(8) * w // 8).astype(int)
    assert bytes(got["payload"]) == grid[np.ix_(ys, xs)].tobytes()


def test_byte_histogram_properties():
    """Property-based: any payload yields a 16-bin histogram that is
    L1-normalized (nonempty) or all-zero (empty), with bin counts
    matching a naive per-byte loop."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=512))
    def check(payload):
        raw = np.frombuffer(payload, dtype=np.uint8)
        h = byte_histogram(raw)
        assert len(h) == FEATURE_DIM
        if len(payload) == 0:
            assert h.sum() == 0
            return
        assert abs(h.sum() - 1.0) < 1e-12
        naive = [0] * FEATURE_DIM
        for b in payload:
            naive[min(b // 16, FEATURE_DIM - 1)] += 1
        for i in range(FEATURE_DIM):
            assert abs(h[i] - naive[i] / len(payload)) < 1e-12

    check()


def test_decode_media_mjpeg_mp4_frames():
    """MJPEG-in-MP4: container sample slicing composed with the real
    JPEG decoder gives end-to-end video FRAME pixel decode."""
    from geo_big_data_analysis_spark.sources.jpeg import write_jpeg
    from geo_big_data_analysis_spark.sources.mp4 import write_mp4
    from geo_big_data_analysis_spark.sources.multimodal import decode_media

    y, x = np.mgrid[0:16, 0:16]
    frames = [
        (((y // 8) * 8 + (x // 8) * 3 + 31 * k) % 256).astype(np.uint8)
        for k in range(4)
    ]
    mp4 = write_mp4(
        [write_jpeg(f) for f in frames],
        timescale=600,
        durations=[25] * 4,
        handler="vide",
        codec="jpeg",
    )
    px = decode_media(mp4, "video")
    assert px.shape == (4, 16, 16)
    for k in range(4):
        assert np.array_equal(px[k], frames[k])

    # RGB MJPEG frames decode to (n, H, W, 3)
    rgb = [np.stack([f, f, f], axis=-1) for f in frames[:2]]
    mp4_rgb = write_mp4(
        [write_jpeg(f) for f in rgb], handler="vide", codec="jpeg"
    )
    px_rgb = decode_media(mp4_rgb, "video")
    assert px_rgb.shape == (2, 16, 16, 3)
    assert np.array_equal(px_rgb[0], rgb[0])

    # a non-JPEG sample codec still names the swap-in point
    raw_mp4 = write_mp4([b"\x00" * 10], handler="vide", codec="avc1")
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_media(raw_mp4, "video")
