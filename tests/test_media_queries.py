"""The driver-visible media queries (plans/media.py): real decodes
over the committed fixture, oracle replay agreement, fixture
reproducibility."""

from __future__ import annotations

import duckdb

from projetbigdatastreaming_spark.plans import media


def test_fixture_is_reproducible(tmp_path, monkeypatch):
    """tools/make_media_fixture.py is a pure function of constants —
    regenerating must produce the identical rows (payload bytes
    included), so the committed parquet can always be rebuilt."""
    import sys

    sys.path.insert(0, "tools")
    from make_media_fixture import build_rows

    rows = build_rows()
    fixture = media._fixture_rows()
    assert [(r[0], r[1], r[2], r[3]) for r in rows] == [
        (mid, kind, mime, payload) for mid, kind, mime, payload in fixture
    ]


def test_image_stats_decodes_real_payloads(spark):
    out = {r.media_id: r for r in media.q_image_stats(spark, None).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert (out[1].width, out[1].height) == (16, 9)  # BMP gradient
    assert (out[2].width, out[2].height) == (12, 7)  # PNG gradient
    assert (out[3].width, out[3].height) == (24, 16)  # baseline JPEG
    assert out[5].width is None  # garbage jpeg rejected cleanly
    assert out[6].feature_hash is None  # NULL payload


def test_audio_video_stats(spark):
    audio = {r.media_id: r for r in media.q_audio_stats(spark, None).collect()}
    assert audio[10].duration_ms == 250  # 2000 frames @ 8 kHz
    assert audio[11].duration_ms == 50  # 800 frames @ 16 kHz
    assert audio[12].duration_ms is None  # garbage RIFF
    video = {r.media_id: r for r in media.q_video_stats(spark, None).collect()}
    assert video[20].n_frames == 3 and video[20].motion_q8 > 0
    assert video[21].duration_ms == 12000 and video[21].n_tracks == 2
    assert video[22].duration_ms is None


def test_sql_header_math_is_decoder_independent():
    """The round-5 de-circularized oracle columns (BMP/PNG dims, WAV
    duration, Y4M frame count) must equal a THIRD implementation —
    struct.unpack over the raw payload here — so a shared bug in the
    Python codecs can no longer hash green against its own replay."""
    import struct

    rows = {mid: (mime, p) for mid, _k, mime, p in media._fixture_rows()}

    def duck(sql):
        return dict(duckdb.connect().execute(sql).fetchall())

    img = duck(
        "SELECT media_id, width FROM ("
        + media._oracle_image_stats()
        + ") q"
    )
    # BMP: little-endian i32 at byte 18; PNG: big-endian u32 at 16
    assert img[1] == struct.unpack_from("<i", rows[1][1], 18)[0]
    assert img[4] == struct.unpack_from("<i", rows[4][1], 18)[0]
    assert img[2] == struct.unpack_from(">I", rows[2][1], 16)[0]
    assert img[5] is None and img[6] is None  # guards reject garbage

    aud = duck(
        "SELECT media_id, duration_ms FROM ("
        + media._oracle_audio_stats()
        + ") q"
    )
    for mid in (10, 11):
        data_size = struct.unpack_from("<I", rows[mid][1], 40)[0]
        align = struct.unpack_from("<H", rows[mid][1], 32)[0]
        rate = struct.unpack_from("<I", rows[mid][1], 24)[0]
        assert aud[mid] == (data_size // align) * 1000 // rate
    assert aud[12] is None

    vid = duck(
        "SELECT media_id, n_frames FROM ("
        + media._oracle_video_stats()
        + ") q"
    )
    assert vid[20] == rows[20][1].count(b"FRAME\n")
    assert vid[21] is None and vid[22] is None  # mp4: n_frames replayed null


def test_media_manifest_matches_duckdb(spark):
    got = {
        r.kind: (r.n, r.total_bytes, r.fingerprint)
        for r in media.q_media_manifest(spark, None).collect()
    }
    want = {
        k: (n, t, f)
        for k, n, t, f in duckdb.connect()
        .execute(media.SQL_MEDIA_MANIFEST)
        .fetchall()
    }
    assert got == want
    assert set(got) == {"image", "audio", "video"}
