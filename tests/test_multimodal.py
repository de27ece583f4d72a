"""Multimodal column plumbing tests: schema, mapInPandas batch shape,
stub boundary behavior."""

from __future__ import annotations

import pytest

from projetbigdatastreaming_spark.operators import multimodal as mm


def _media(spark):
    rows = [
        (1, "image", "image/jpeg", b"\xff\xd8fakejpegbytes" * 10, 150),
        (2, "image", "image/png", b"\x89PNGfakebytes" * 8, 104),
        (3, "video", "video/mp4", b"\x00\x00ftypisomfake" * 20, 280),
        (4, "audio", "audio/wav", b"RIFFfakewav", 11),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_images_shape_and_determinism(spark):
    media = _media(spark)
    out1 = {r.media_id: r for r in mm.decode_images(media).collect()}
    out2 = {r.media_id: r for r in mm.decode_images(media).collect()}
    assert set(out1) == {1, 2}  # only kind='image' rows
    for mid in out1:
        assert out1[mid].width == out2[mid].width
        assert out1[mid].feature_hash == out2[mid].feature_hash
        assert 1 <= out1[mid].width <= 4096


def test_decode_strict_marks_codec_boundary(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_images(_media(spark), strict=True)


def test_custom_decoder_injection(spark):
    def decoder(payload):
        return {"width": len(payload), "height": 1, "feature_hash": 42}

    out = {r.media_id: r for r in mm.decode_images(_media(spark), decoder).collect()}
    assert out[1].width == 150 and out[1].feature_hash == 42


def test_resize_images(spark):
    out = {r.media_id: r for r in mm.resize_images(_media(spark), 128, 128).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert (r.width, r.height) == (128, 128)
        assert len(r.payload) == (128 * 128) // 1024
    with pytest.raises(NotImplementedError):
        mm.resize_images(_media(spark), strict=True)


def test_audio_features(spark):
    out = mm.extract_audio_features(_media(spark)).collect()
    assert [r.media_id for r in out] == [4]
    assert out[0].duration_ms == 11
    assert 0 <= out[0].rms_q8 <= 255


def test_video_frame_sampling(spark):
    frames = mm.sample_video_frames(_media(spark)).collect()
    assert {f.media_id for f in frames} == {3}
    assert [f.frame_no for f in frames] == sorted(f.frame_no for f in frames)
    assert all(isinstance(f.frame, (bytes, bytearray)) for f in frames)
