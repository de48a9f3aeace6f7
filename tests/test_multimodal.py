"""Multimodal media plumbing: schema, deterministic fake decode, typed
metadata, resize features, frame sampling (UDTF shape). The codec itself
is stubbed (no PIL/ffmpeg in the container — see operators/multimodal.py);
everything Spark-side is real and asserted here."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    FakeDecodeBackend,
    decode_metadata,
    image_resize_features,
    media_from_spans,
    video_frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(30):
        ref = f"https://m.example.org/x{i}." + ["png", "wav", "mp4"][i % 3]
        kind = ["image", "audio", "video"][i % 3]
        rows.append((ref, kind, f"payload-{i}".encode(), None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_from_spans_kinds_and_payloads(spark):
    docs = spark.createDataFrame(
        [
            ("d1", [{"kind": "media", "text": "", "media_ref": "https://a/x.png", "offset": 0},
                    {"kind": "text", "text": "t", "media_ref": "", "offset": 1}]),
            ("d2", [{"kind": "media", "text": "", "media_ref": "https://a/x.png", "offset": 0},
                    {"kind": "media", "text": "", "media_ref": "https://a/v.mp4", "offset": 5}]),
        ],
        "doc_id string, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    m = media_from_spans(docs).collect()
    by_ref = {r.media_ref: r for r in m}
    assert set(by_ref) == {"https://a/x.png", "https://a/v.mp4"}  # deduped
    assert by_ref["https://a/x.png"].kind == "image"
    assert by_ref["https://a/v.mp4"].kind == "video"
    assert all(r.payload is not None for r in m)


def test_decode_metadata_typed_struct(media):
    out = decode_metadata(media).collect()
    assert len(out) == 30
    for r in out:
        if r.kind == "image":
            assert r.meta.width > 0 and r.meta.height > 0 and r.meta.channels == 3
            assert r.meta.sample_rate is None
        elif r.kind == "audio":
            assert r.meta.sample_rate == 16_000 and r.meta.duration_ms > 0
            assert r.meta.width is None
        else:
            assert r.meta.n_frames > 0 and r.meta.channels == 3


def test_decode_deterministic(media):
    a = {r.media_ref: r.meta for r in decode_metadata(media).collect()}
    b = {r.media_ref: r.meta for r in decode_metadata(media).collect()}
    assert a == b


def test_image_features_shape_and_phash(media):
    feats = image_resize_features(media).collect()
    assert len(feats) == 10  # 30 rows, every 3rd is an image
    for r in feats:
        assert r.thumb_w == 8 and r.thumb_h == 8
        assert 0 <= r.mean_r <= 255
    # identical payload bytes => identical phash; distinct payloads differ
    backend = FakeDecodeBackend()
    assert (backend.decode_image(b"payload-0") == backend.decode_image(b"payload-0")).all()
    phashes = {r.phash for r in feats}
    assert len(phashes) > 1


def test_video_frame_sample_udtf_shape(media):
    frames = video_frame_sample(media, every_n=4).collect()
    by_ref = {}
    for r in frames:
        by_ref.setdefault(r.media_ref, []).append(r.frame_idx)
    assert len(by_ref) == 10
    for idxs in by_ref.values():
        assert idxs == sorted(idxs)
        assert all(i % 4 == 0 for i in idxs)
        assert len(idxs) >= 2


def test_unknown_codec_backend_raises():
    from crawler_spark.operators.multimodal import DecodeBackend

    with pytest.raises(NotImplementedError):
        DecodeBackend().decode_image(b"x")


def test_audio_feature_stats(media):
    from crawler_spark.operators.multimodal import audio_feature_stats, audio_features

    rows = {r.media_ref: r for r in audio_feature_stats(media).collect()}
    assert len(rows) == 10  # only the kind == 'audio' rows
    assert all(".wav" in ref for ref in rows)
    backend = FakeDecodeBackend()
    for i in range(1, 30, 3):  # the audio rows of the fixture
        ref = f"https://m.example.org/x{i}.wav"
        exp = audio_features(ref, f"payload-{i}".encode(), backend)
        got = rows[ref]
        assert (got.sample_rate, got.n_samples, got.duration_ms,
                got.mean_abs_milli, got.zero_crossings) == (
            exp["sample_rate"], exp["n_samples"], exp["duration_ms"],
            exp["mean_abs_milli"], exp["zero_crossings"])
