"""Multimodal column plumbing tests: schema, mapInPandas batch shape,
stub boundary behavior."""

from __future__ import annotations

import numpy as np
import pytest

from projetbigdatastreaming_spark.operators import codecs
from projetbigdatastreaming_spark.operators import multimodal as mm


def _media(spark):
    """Mixed fixture: real payloads (own encoders) the auto-dispatch
    must decode, plus garbage rows it must null out, not crash on."""
    _, bmp = _golden_bmp()
    wav = _golden_wav()
    y4m = _golden_y4m(4)
    rows = [
        (1, "image", "image/bmp", bmp, len(bmp)),
        (2, "image", "image/png", b"\x89PNGfakebytes" * 8, 104),  # bad sig
        (3, "video", "video/x-y4m", y4m, len(y4m)),
        (4, "audio", "audio/wav", wav, len(wav)),
        (5, "audio", "audio/wav", b"RIFFfakewav", 11),  # RIFF, not WAVE
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_sniff_format():
    _, bmp = _golden_bmp()
    assert mm.sniff_format(bmp) == "bmp"
    assert mm.sniff_format(_golden_wav()) == "wav"
    assert mm.sniff_format(_golden_y4m(1)) == "y4m"
    assert mm.sniff_format(codecs.png_encode(
        np.zeros((2, 2, 3), dtype=np.uint8))) == "png"
    assert mm.sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert mm.sniff_format(b"\xff\xfb\x90\x00") == "mpeg_audio"  # MP3 sync
    assert mm.sniff_format(b"ID3\x04tag") == "mpeg_audio"
    assert mm.sniff_format(b"\x00\x00\x00\x18ftypisom") == "mp4"
    assert mm.sniff_format(b"RIFFxxxxWAVE") == "wav"
    assert mm.sniff_format(b"RIFFxxxxAVI ") is None
    assert mm.sniff_format(b"") is None
    assert mm.sniff_format(None) is None


def test_decode_images_default_real_codec(spark):
    """No injected decoder: the BMP row decodes to real dimensions,
    the bad-signature row nulls out, and the result is deterministic."""
    media = _media(spark)
    out1 = {r.media_id: r for r in mm.decode_images(media).collect()}
    out2 = {r.media_id: r for r in mm.decode_images(media).collect()}
    assert set(out1) == {1, 2}  # only kind='image' rows
    _, bmp = _golden_bmp()
    assert (out1[1].width, out1[1].height) == (4, 2)
    assert out1[1].feature_hash == codecs.bmp_decode(bmp)["feature_hash"]
    assert out1[2].width is None and out1[2].feature_hash is None
    for mid in out1:
        assert out1[mid].feature_hash == out2[mid].feature_hash


def test_decode_strict_marks_codec_boundary(spark):
    """strict=True: an unsupported format raises NotImplementedError
    inside the batch loop instead of null-filling (Spark surfaces it
    wrapped in its Python-worker exception)."""
    with pytest.raises(Exception, match="no in-repo image-decode"):
        mm.decode_images(_media(spark), strict=True).collect()


def test_custom_decoder_injection(spark):
    def decoder(payload):
        return {"width": len(payload), "height": 1, "feature_hash": 42}

    out = {r.media_id: r for r in mm.decode_images(_media(spark), decoder).collect()}
    _, bmp = _golden_bmp()
    assert out[1].width == len(bmp) and out[1].feature_hash == 42


def test_resize_images_default_real_codec(spark):
    """No injected resizer: the BMP row resizes to a valid BMP of the
    target size; the undecodable row yields a null payload."""
    out = {r.media_id: r for r in mm.resize_images(_media(spark), 8, 4).collect()}
    assert set(out) == {1, 2}
    assert (out[1].width, out[1].height) == (8, 4)
    resized = codecs._bmp_pixels(bytes(out[1].payload))
    assert resized.shape == (4, 8, 3)
    assert out[2].payload is None
    with pytest.raises(Exception, match="no in-repo image-resize"):
        mm.resize_images(_media(spark), strict=True).collect()


def test_audio_features_default_real_codec(spark):
    """No injected extractor: the real WAV decodes to exact duration
    and known RMS; the RIFF-but-not-WAVE row nulls out."""
    out = {r.media_id: r for r in mm.extract_audio_features(_media(spark)).collect()}
    assert set(out) == {4, 5}
    assert out[4].duration_ms == 500  # 4000 frames @ 8000 Hz
    assert abs(out[4].rms_q8 - 128) <= 1  # +-0.5 square wave
    assert out[5].duration_ms is None and out[5].rms_q8 is None


def test_video_frame_sampling_default_real_codec(spark):
    """No injected extractor: the Y4M stream yields real PNG frames at
    the requested stride."""
    frames = mm.sample_video_frames(_media(spark), every_nth=3).collect()
    assert {f.media_id for f in frames} == {3}
    assert [f.frame_no for f in frames] == [0, 1]  # source frames 0, 3
    for f, level in zip(frames, (40, 70)):
        px = codecs._png_pixels(bytes(f.frame))
        assert px.shape == (4, 4, 3)
        assert (px == level).all()


def test_fake_doubles_still_injectable(spark):
    """The demoted fakes remain usable as explicit test doubles."""
    out = {
        r.media_id: r
        for r in mm.decode_images(_media(spark), mm.fake_image_decode).collect()
    }
    assert set(out) == {1, 2}
    assert all(1 <= r.width <= 4096 for r in out.values())
    rs = {
        r.media_id: r
        for r in mm.resize_images(
            _media(spark), 128, 128, resizer=mm.fake_image_resize
        ).collect()
    }
    assert all(len(r.payload) == (128 * 128) // 1024 for r in rs.values())
    au = {
        r.media_id: r
        for r in mm.extract_audio_features(
            _media(spark), mm.fake_audio_features
        ).collect()
    }
    assert au[5].duration_ms == 11


# ---------------------------------------------------------------------------
# Real codecs (operators/codecs.py): golden-file WAV + BMP round-trips
# ---------------------------------------------------------------------------


def _golden_wav() -> bytes:
    """1 kHz square-ish wave, 16-bit mono, 8000 Hz, 0.5 s — stdlib-built."""
    import io
    import wave as wv

    import numpy as np

    t = np.arange(4000)
    samples = (np.where((t // 4) % 2 == 0, 0.5, -0.5) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wv.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _golden_bmp():
    """4x2 RGB test card and its BMP encoding."""
    import numpy as np

    from projetbigdatastreaming_spark.operators import codecs

    px = np.array(
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]],
            [[0, 0, 0], [128, 128, 128], [255, 255, 0], [0, 255, 255]],
        ],
        dtype=np.uint8,
    )
    return px, codecs.bmp_encode(px)


def test_wav_features_real_codec(spark):
    """Real WAV decode through the Spark mapInPandas path: exact
    duration from the RIFF header, RMS of a known 0.5-amplitude wave."""
    from projetbigdatastreaming_spark.operators import codecs

    wav = _golden_wav()
    media = spark.createDataFrame(
        [(10, "audio", "audio/wav", wav, len(wav)),
         (11, "audio", "audio/wav", b"not a wav at all", 16)],
        mm.MEDIA_SCHEMA,
    )
    out = {
        r.media_id: r
        for r in mm.extract_audio_features(media, codecs.wav_features).collect()
    }
    assert out[10].duration_ms == 500  # 4000 frames @ 8000 Hz
    # RMS of a +-0.5 square wave is 0.5 -> q8 ~= 128
    assert abs(out[10].rms_q8 - 128) <= 1
    assert out[11].duration_ms is None and out[11].rms_q8 is None


def test_bmp_decode_real_codec(spark):
    """Real BMP decode: exact dimensions, pixel-exact round-trip, and a
    deterministic pixel-content hash (garbage payloads yield nulls)."""
    import numpy as np

    from projetbigdatastreaming_spark.operators import codecs

    px, bmp = _golden_bmp()
    assert np.array_equal(codecs._bmp_pixels(bmp), px)  # exact round-trip

    media = spark.createDataFrame(
        [(20, "image", "image/bmp", bmp, len(bmp)),
         (21, "image", "image/jpeg", b"\xff\xd8notdecodable", 14)],
        mm.MEDIA_SCHEMA,
    )
    out = {
        r.media_id: r
        for r in mm.decode_images(media, codecs.bmp_decode).collect()
    }
    assert (out[20].width, out[20].height) == (4, 2)
    assert out[20].feature_hash == codecs.bmp_decode(bmp)["feature_hash"]
    assert out[21].width is None and out[21].feature_hash is None


def test_bmp_resize_real_codec(spark):
    """Real nearest-neighbor resize through resize_images: output is a
    valid BMP of the target size whose pixels match the numpy resample."""
    import numpy as np

    from projetbigdatastreaming_spark.operators import codecs

    px, bmp = _golden_bmp()
    media = spark.createDataFrame(
        [(30, "image", "image/bmp", bmp, len(bmp))], mm.MEDIA_SCHEMA
    )
    out = mm.resize_images(media, 8, 4, resizer=codecs.bmp_resize).collect()
    assert len(out) == 1
    resized = codecs._bmp_pixels(bytes(out[0].payload))
    assert resized.shape == (4, 8, 3)
    # nearest-neighbor doubling duplicates each source pixel 2x2
    assert np.array_equal(resized, np.repeat(np.repeat(px, 2, 0), 2, 1))


def _apply_png_filter(f, cur, prev, ch):
    """Reference forward-filter (RFC 2083 §6) — the test builds
    filtered scanlines so the decoder's reconstruction is exercised on
    every filter type, not just the filter-0 rows our encoder emits."""
    out = bytearray(len(cur))
    for i in range(len(cur)):
        a = cur[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


def test_png_roundtrip_and_cross_codec_hash():
    """Encode→decode is pixel-exact, and the same pixels hash
    identically through the BMP and PNG containers."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert np.array_equal(codecs._png_pixels(codecs.png_encode(px)), px)
    assert (
        codecs.png_decode(codecs.png_encode(px))
        == codecs.bmp_decode(codecs.bmp_encode(px))
    )
    assert codecs.png_decode(b"\x89PNG but truncated") == {
        "width": None, "height": None, "feature_hash": None
    }


def test_png_decoder_reconstructs_all_filters():
    """A PNG whose five scanlines use filters 0,1,2,3,4 decodes to the
    original pixels."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    stride = 6 * 3
    prev = bytes(stride)
    raw = bytearray()
    for y, f in enumerate((0, 1, 2, 3, 4)):
        cur = px[y].tobytes()
        raw.append(f)
        raw += _apply_png_filter(f, cur, prev, 3)
        prev = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs._png_pixels(payload), px)


def test_png_decode_through_spark_pipeline(spark):
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    png = codecs.png_encode(px)
    media = spark.createDataFrame(
        [(30, "image", "image/png", png, len(png)),
         (31, "image", "image/png", b"not a png", 9)],
        "media_id long, kind string, mime string, payload binary, n_bytes long",
    )
    out = {
        r.media_id: r
        for r in mm.decode_images(media, codecs.png_decode).collect()
    }
    assert (out[30].width, out[30].height) == (4, 4)
    assert out[30].feature_hash == codecs.png_decode(png)["feature_hash"]
    assert out[31].width is None


def _golden_y4m(n_frames, w=4, h=4):
    """Build a yuv4mpeg2 stream whose frame f is solid gray level
    40+10f (Y=level, U=V=128 → RGB=(level,level,level))."""
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
    frames = b""
    for f in range(n_frames):
        yplane = bytes([40 + 10 * f]) * (w * h)
        chroma = bytes([128]) * ((w // 2) * (h // 2))
        frames += b"FRAME\n" + yplane + chroma + chroma
    return head + frames


def test_y4m_frame_sampling_real_codec():
    """Every 2nd frame of a 5-frame stream → frames 0,2,4; each PNG
    decodes to the expected solid-gray pixels."""
    payload = _golden_y4m(5)
    pngs = codecs.y4m_frames(payload, every_nth=2)
    assert len(pngs) == 3
    for png, level in zip(pngs, (40, 60, 80)):
        px = codecs._png_pixels(png)
        assert px.shape == (4, 4, 3)
        assert (px == level).all(), (level, px[0, 0])
    assert codecs.y4m_frames(b"not a video", 2) == []
    assert codecs.y4m_frames(payload[:30], 2) == []  # truncated


def test_y4m_through_spark_pipeline(spark):
    payload = _golden_y4m(4)
    media = spark.createDataFrame(
        [(40, "video", "video/x-y4m", payload, len(payload))],
        "media_id long, kind string, mime string, payload binary, n_bytes long",
    )
    rows = mm.sample_video_frames(
        media, every_nth=3, extractor=codecs.y4m_frames
    ).collect()
    assert [r.frame_no for r in rows] == [0, 1]  # frames 0 and 3
    assert codecs._png_pixels(rows[0].frame) is not None


def test_png_resize_real_codec():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    small = codecs.png_resize(codecs.png_encode(px), 4, 4)
    spx = codecs._png_pixels(small)
    assert spx.shape == (4, 4, 3)
    # nearest-neighbor: every output pixel is some input pixel
    assert (spx == px[::2, ::2]).all()
    assert codecs.png_resize(b"nope", 4, 4) is None


def test_jpeg_roundtrip_quality_and_garbage():
    """Baseline JPEG encode→decode reconstructs smooth content within
    a small error bound, handles grayscale and non-multiple-of-8
    dims, and rejects garbage/out-of-profile payloads with nulls."""
    from projetbigdatastreaming_spark.operators import jpeg

    h, w = 41, 53  # deliberately not multiples of 8
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.dstack([
        xx * 255 // (w - 1),
        yy * 255 // (h - 1),
        (xx + yy) * 255 // (w + h - 2),
    ]).astype(np.uint8)
    out = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(px, quality=90))
    assert out.shape == (h, w, 3)
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 2.0

    gray = ((xx * yy) % 256).astype(np.uint8)
    g = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(gray, quality=90))
    assert g.shape == (h, w, 3)
    assert np.abs(g[..., 0].astype(int) - gray.astype(int)).mean() < 6.0

    assert jpeg.jpeg_decode(b"\xff\xd8 truncated junk") == {
        "width": None, "height": None, "feature_hash": None
    }
    assert jpeg.jpeg_decode(None)["width"] is None
    # progressive SOF2 marker: clean rejection, not a mis-decode
    sof2 = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    assert jpeg.jpeg_decode_pixels(sof2 + b"\xff\xd9") is None

    # SOS naming a component id absent from SOF (valid per T.81, out
    # of our baseline profile): must reject cleanly, never raise — a
    # StopIteration here used to escape the decoder's except clause
    # and fail the whole mapInPandas task (round-3 ADVICE finding)
    payload = bytearray(jpeg.jpeg_encode(px, quality=90))
    sos = payload.find(b"\xff\xda")
    assert sos > 0
    payload[sos + 5] = 99  # first scan-component id -> unknown
    assert jpeg.jpeg_decode_pixels(bytes(payload)) is None


def test_jpeg_decode_is_deterministic_and_resize():
    from projetbigdatastreaming_spark.operators import jpeg

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    payload = jpeg.jpeg_encode(px, quality=95)
    d1 = jpeg.jpeg_decode(payload)
    d2 = jpeg.jpeg_decode(payload)
    assert d1 == d2 and d1["feature_hash"] is not None
    assert (d1["width"], d1["height"]) == (24, 16)

    small = jpeg.jpeg_resize(payload, 12, 8)
    ds = jpeg.jpeg_decode(small)
    assert (ds["width"], ds["height"]) == (12, 8)


def test_jpeg_decode_through_spark_pipeline(spark):
    """The JPEG codec plugs into the same mapInPandas contract as
    BMP/PNG — real decode inside the Arrow batch loop."""
    from projetbigdatastreaming_spark.operators import jpeg

    h = w = 16
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.dstack([xx * 16, yy * 16, (xx + yy) * 8]).astype(np.uint8)
    payload = jpeg.jpeg_encode(px, quality=85)
    media = spark.createDataFrame(
        [(40, "image", "image/jpeg", payload, len(payload)),
         (41, "image", "image/jpeg", b"\xff\xd8not a jpeg", 12)],
        "media_id long, kind string, mime string, payload binary, n_bytes long",
    )
    out = {
        r.media_id: r
        for r in mm.decode_images(media, jpeg.jpeg_decode).collect()
    }
    assert (out[40].width, out[40].height) == (w, h)
    assert out[40].feature_hash == jpeg.jpeg_decode(payload)["feature_hash"]
    assert out[41].width is None


def test_wav_spectral_features_tone_and_pipeline(spark):
    """A pure 440 Hz tone must report dominant_freq_hz ≈ 440 and the
    analytic ZCR (2 crossings per cycle); the wider schema flows
    through the same mapInPandas plumbing."""
    import io as _io
    import wave as _wave

    rate, seconds, freq = 8000, 1, 440
    t = np.arange(rate * seconds) / rate
    pcm = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    payload = buf.getvalue()

    f = codecs.wav_spectral_features(payload)
    assert f["duration_ms"] == 1000
    assert abs(f["dominant_freq_hz"] - freq) <= 1
    expected_zcr = 2 * freq / rate  # two sign flips per cycle
    assert abs(f["zcr_q8"] / 255.0 - expected_zcr) < 0.02
    assert codecs.wav_spectral_features(b"junk")["zcr_q8"] is None

    media = spark.createDataFrame(
        [(50, "audio", "audio/wav", payload, len(payload))],
        "media_id long, kind string, mime string, payload binary, n_bytes long",
    )
    out = mm.extract_audio_features(
        media,
        codecs.wav_spectral_features,
        schema=(
            "media_id long, duration_ms int, rms_q8 int, zcr_q8 int, "
            "dominant_freq_hz int"
        ),
    ).collect()
    assert len(out) == 1 and abs(out[0].dominant_freq_hz - freq) <= 1


def test_y4m_motion_static_vs_moving():
    """A static clip must score ~0 motion; a moving-gradient clip must
    score higher, with the scene cut as the max."""
    def clip(frames):
        w, h = 16, 16
        head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
        body = b""
        for y in frames:
            yp = np.full((h, w), y, dtype=np.uint8)
            up = vp = np.full((h // 2, w // 2), 128, dtype=np.uint8)
            body += b"FRAME\n" + yp.tobytes() + up.tobytes() + vp.tobytes()
        return head + body

    static = codecs.y4m_motion(clip([100] * 5))
    assert static["n_frames"] == 5
    assert static["motion_q8"] == 0 and static["max_motion_q8"] == 0

    moving = codecs.y4m_motion(clip([0, 10, 20, 200, 210]))
    assert moving["n_frames"] == 5
    assert moving["max_motion_q8"] == 180  # the cut: 20 -> 200
    assert 0 < moving["motion_q8"] < moving["max_motion_q8"] + 1

    assert codecs.y4m_motion(b"not video")["n_frames"] is None


def test_mp4_metadata_roundtrip_and_variants():
    """The box parser reads back exactly what the minimal builder
    wrote: brand, duration (both mvhd versions' timescale math),
    track count, first video track dimensions."""
    p = codecs.mp4_encode_minimal(
        7250, timescale=600, tracks=((1920, 1080), (0, 0)), brand=b"mp42"
    )
    assert codecs.mp4_metadata(p) == {
        "major_brand": "mp42",
        "duration_ms": 7250,
        "n_tracks": 2,
        "width": 1920,
        "height": 1080,
    }
    # audio-only: no track carries dimensions
    a = codecs.mp4_encode_minimal(1000, tracks=((0, 0),))
    m = codecs.mp4_metadata(a)
    assert m["n_tracks"] == 1 and m["width"] is None
    # rejection: garbage, empty, truncated mid-moov
    assert codecs.mp4_metadata(b"RIFF not an mp4")["n_tracks"] is None
    assert codecs.mp4_metadata(None)["major_brand"] is None
    trunc = codecs.mp4_metadata(p[: len(p) // 2])
    assert set(trunc) == {
        "major_brand", "duration_ms", "n_tracks", "width", "height",
    }


def test_mp4_metadata_through_spark_pipeline(spark):
    """The container-metadata extractor runs inside the Arrow batch
    loop like every other codec (kind='video' rows, custom schema)."""
    p1 = codecs.mp4_encode_minimal(3000, tracks=((640, 360),))
    p2 = codecs.mp4_encode_minimal(60000, tracks=((0, 0), (1280, 720)))
    media = spark.createDataFrame(
        [
            (1, "video", "video/mp4", bytearray(p1), len(p1)),
            (2, "video", "video/mp4", bytearray(p2), len(p2)),
            (3, "video", "video/mp4", bytearray(b"junk"), 4),
            (4, "image", "image/bmp", bytearray(b"skip"), 4),
        ],
        "media_id long, kind string, mime string, payload binary, n_bytes long",
    )

    def _batches(it):
        import pandas as pd

        for pdf in it:
            feats = pd.DataFrame(
                [codecs.mp4_metadata(bytes(p)) for p in pdf["payload"]]
            )
            feats.insert(0, "media_id", pdf["media_id"].values)
            yield feats

    out = {
        r.media_id: r
        for r in media.where("kind = 'video'")
        .mapInPandas(
            _batches,
            "media_id long, major_brand string, duration_ms long, "
            "n_tracks int, width int, height int",
        )
        .collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].duration_ms == 3000 and out[1].width == 640
    assert out[2].n_tracks == 2 and out[2].height == 720
    assert out[3].major_brand is None


def test_records_to_frame_preserves_large_ints_with_nulls():
    """Regression: pd.DataFrame([dicts]) promotes int-with-None columns
    to float64 at construction, rounding 60-bit hashes (observed: a
    feature_hash off by 62 units once a garbage payload nulled one row
    of the batch).  records_to_frame must keep them exact."""
    import pandas as pd

    big = (1 << 60) - 7  # not representable in float64
    frame = mm.records_to_frame(
        [
            {"feature_hash": big, "name": "a"},
            {"feature_hash": None, "name": None},
        ],
        {"media_id": pd.Series([1, 2])},
    )
    assert frame["feature_hash"].iloc[0] == big
    assert frame["feature_hash"].isna().iloc[1]
    assert frame["name"].iloc[0] == "a" and frame["name"].iloc[1] is None
    assert list(frame.columns) == ["media_id", "feature_hash", "name"]


def test_mp3_metadata_header_walk():
    """Frame-header walk: exact duration/frame-count/bitrate for CBR,
    VBR detection, ID3v2 skip, garbage rejection."""
    p = codecs.mp3_encode_minimal(38, 128, 44100)
    m = codecs.mp3_metadata(p)
    assert m == {
        "duration_ms": 992,  # 38*1152/44100 s
        "n_frames": 38,
        "sample_rate_hz": 44100,
        "bitrate_kbps": 128,
        "is_vbr": False,
    }
    v = codecs.mp3_metadata(
        codecs.mp3_encode_minimal(10, 128, 44100, vbr_alternate_kbps=192)
    )
    assert v["is_vbr"] is True and 128 < v["bitrate_kbps"] < 192
    # ID3v2 tag skipped (syncsafe size), stream behind it still parsed
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + bytes(10)
    tagged = codecs.mp3_metadata(id3[:10] + bytes(10) + p)
    assert tagged["n_frames"] == 38
    # ID3v2.4 footer flag (0x10): tag occupies 10 + size + 10 bytes
    footered = (
        b"ID3\x04\x00\x10\x00\x00\x00\x0a" + bytes(10) + bytes(10) + p
    )
    assert codecs.mp3_metadata(footered)["n_frames"] == 38
    assert codecs.mp3_metadata(b"RIFF definitely not mpeg")[
        "duration_ms"
    ] is None
    assert codecs.mp3_metadata(None)["n_frames"] is None


def test_binary_file_stream_media_ingest(spark, tmp_path):
    """Media-lake ingest mouth: raw image files land in a watched
    directory, stream in as binary rows (exactly-once file log),
    decode through the real codecs inside foreachBatch, and the
    features table matches a direct decode of the same bytes."""
    import os

    from projetbigdatastreaming_spark.operators import jpeg
    from projetbigdatastreaming_spark.sinks.files import (
        overwrite_partitions,
    )
    from projetbigdatastreaming_spark.sources.files import (
        binary_file_stream,
    )

    yy, xx = np.mgrid[0:9, 0:11]
    px = np.dstack([xx * 20, yy * 25, (xx + yy) * 10]).astype(np.uint8)
    indir = tmp_path / "incoming"
    indir.mkdir()
    (indir / "a.bmp").write_bytes(codecs.bmp_encode(px))
    (indir / "b.png").write_bytes(codecs.png_encode(px))
    (indir / "c.jpg").write_bytes(jpeg.jpeg_encode(px, quality=90))
    (indir / "d.jpg").write_bytes(b"\xff\xd8 garbage payload")
    (indir / "skip.txt").write_bytes(b"not media")
    out = str(tmp_path / "features")

    def decode_batch(batch_df, batch_id):
        from pyspark.sql import functions as F

        from projetbigdatastreaming_spark.operators.multimodal import (
            records_to_frame,
        )

        def _batches(it):
            for pdf in it:
                recs = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    b = bytes(content)
                    if path.endswith(".bmp"):
                        recs.append(codecs.bmp_decode(b))
                    elif path.endswith(".png"):
                        recs.append(codecs.png_decode(b))
                    else:
                        recs.append(jpeg.jpeg_decode(b))
                yield records_to_frame(recs, {"path": pdf["path"]})

        feats = batch_df.select("path", "content").mapInPandas(
            _batches, "path string, width int, height int, feature_hash long"
        )
        overwrite_partitions(
            feats.withColumn("batch_id", F.lit(batch_id)), out, ["batch_id"]
        )

    stream = binary_file_stream(
        spark, str(indir), path_glob="*.{bmp,png,jpg}"
    )
    q = (
        stream.writeStream.foreachBatch(decode_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        os.path.basename(r.path): (r.width, r.height, r.feature_hash)
        for r in spark.read.parquet(out).collect()
    }
    assert set(got) == {"a.bmp", "b.png", "c.jpg", "d.jpg"}  # txt pruned
    assert got["a.bmp"] == (11, 9, codecs.bmp_decode(codecs.bmp_encode(px))["feature_hash"])
    assert got["b.png"][:2] == (11, 9)
    # lossless containers of the same pixels hash identically
    assert got["a.bmp"][2] == got["b.png"][2]
    assert got["c.jpg"][:2] == (11, 9)
    assert got["d.jpg"] == (None, None, None)  # garbage: nulls, no crash
