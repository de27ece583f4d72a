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
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8}
    assert (out[1].width, out[1].height) == (16, 9)  # BMP gradient
    assert (out[2].width, out[2].height) == (12, 7)  # PNG gradient
    assert (out[3].width, out[3].height) == (24, 16)  # baseline JPEG
    assert (out[7].width, out[7].height) == (13, 11)  # GIF gradient
    assert out[5].width is None  # garbage jpeg rejected cleanly
    assert out[6].feature_hash is None  # NULL payload
    assert out[8].width is None  # header-reject gif (GCT flag clear)


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
    # GIF: little-endian u16 logical-screen width at byte 6
    assert img[7] == struct.unpack_from("<H", rows[7][1], 6)[0]
    assert img[5] is None and img[6] is None  # guards reject garbage
    assert img[8] is None  # gif header reject (GCT flag clear)

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


def _swap_fixture(monkeypatch, rows, path):
    """Point the oracle builders at a temp media parquet; the
    argument-less lru_cache on _fixture_rows must be cleared on both
    sides of the swap."""
    import sys

    sys.path.insert(0, "tools")
    from make_media_fixture import write_rows

    write_rows(rows, path)
    media._fixture_rows.cache_clear()
    monkeypatch.setattr(media, "FIXTURE", path)


def test_mp3_sql_walk_matches_decoder_on_adversarial_streams(
    tmp_path, monkeypatch
):
    """Round-6 byte-math column: the recursive-CTE MPEG frame walk
    must reproduce `mp3_metadata`'s duration on streams the fixture
    does NOT contain — ID3v2.3 and v2.4+footer prefixes, VBR,
    truncation, a mid-stream rate change (stop rule), Layer II, and
    garbage — not just replay the committed rows."""
    import numpy as np

    from projetbigdatastreaming_spark.operators import codecs, mpeg_audio

    t = np.arange(1152 * 2) / 44100.0
    tone = 0.2 * np.sin(2 * np.pi * 440 * t)
    base = codecs.mp3_encode_minimal(7, 128, 44100)

    def id3(major, flags, size, body):
        sync = bytes(
            [(size >> 21) & 127, (size >> 14) & 127,
             (size >> 7) & 127, size & 127]
        )
        return b"ID3" + bytes([major, 0, flags]) + sync + body

    payloads = [
        base,
        codecs.mp3_encode_minimal(5, 64, 32000, vbr_alternate_kbps=160),
        id3(3, 0x00, 20, bytes(20)) + base,  # v2.3 tag, no footer
        id3(4, 0x10, 8, bytes(8) + bytes(10)) + base,  # v2.4 + footer
        base[: len(base) - 10],  # truncated final frame
        # rate change mid-stream: the walk must stop at the boundary
        codecs.mp3_encode_minimal(3, 128, 44100)
        + codecs.mp3_encode_minimal(3, 128, 32000),
        mpeg_audio.mp2_encode(tone, 44100, 64),  # Layer II
        b"\xff\xe0 garbage that fails the header parse",
        b"",
    ]
    rows = [
        (i, "audio", "audio/mpeg", p, len(p) if p else None)
        for i, p in enumerate(payloads)
    ]
    try:
        _swap_fixture(monkeypatch, rows, str(tmp_path / "mp3.parquet"))
        got = dict(
            duckdb.connect()
            .execute(
                "SELECT media_id, duration_ms FROM ("
                + media._oracle_audio_stats()
                + ") q"
            )
            .fetchall()
        )
    finally:
        media._fixture_rows.cache_clear()
    for i, p in enumerate(payloads):
        want = codecs.mp3_metadata(p)["duration_ms"]
        assert got[i] == want, (i, got[i], want)


def test_mp4_sql_walk_matches_decoder_on_adversarial_boxes(
    tmp_path, monkeypatch
):
    """Round-6 byte-math columns: the recursive-CTE box walk must
    reproduce `mp4_metadata`'s duration/track count on containers the
    fixture does NOT contain — mvhd version 1, a 64-bit largesize
    moov, a size==0 to-end box, timescale 0, many tracks, malformed
    lengths."""
    from projetbigdatastreaming_spark.operators import codecs

    box = codecs._box

    def mvhd_v1(ts, dur):
        return box(
            b"mvhd",
            bytes([1]) + bytes(19) + ts.to_bytes(4, "big")
            + dur.to_bytes(8, "big") + bytes(80),
        )

    def largesize(btype, body):
        size = 16 + len(body)
        return (
            (1).to_bytes(4, "big") + btype + size.to_bytes(8, "big") + body
        )

    trak = box(b"trak", box(b"tkhd", bytes(76) + bytes(8)))
    payloads = [
        codecs.mp4_encode_minimal(9000, timescale=90000, tracks=((1, 1),)),
        # mvhd version 1 (64-bit duration), two tracks
        box(b"ftyp", b"iso6" + bytes(4))
        + box(b"moov", mvhd_v1(600, 4321 * 600 // 1000) + trak + trak),
        # 64-bit largesize moov
        box(b"ftyp", b"isom" + bytes(4))
        + largesize(b"moov", mvhd_v1(1000, 2500) + trak),
        # size==0: moov extends to end of file
        box(b"ftyp", b"isom" + bytes(4))
        + (0).to_bytes(4, "big") + b"moov"
        + box(b"mvhd", bytes(12) + (48).to_bytes(4, "big")
              + (96).to_bytes(4, "big") + bytes(80))
        + trak,
        # timescale 0: duration must stay null, tracks still counted
        box(b"moov", box(b"mvhd", bytes(12) + bytes(8) + bytes(80)) + trak),
        # malformed: inner size runs past the moov end -> walk stops
        box(b"moov", (10 ** 6).to_bytes(4, "big") + b"mvhd"),
        b"\x00\x00\x00\x08free junk",
        b"",
    ]
    rows = [
        (i, "video", "video/mp4", p, len(p) if p else None)
        for i, p in enumerate(payloads)
    ]
    try:
        _swap_fixture(monkeypatch, rows, str(tmp_path / "mp4.parquet"))
        got = dict(
            duckdb.connect()
            .execute(
                "SELECT media_id, (duration_ms, n_tracks) FROM ("
                + media._oracle_video_stats()
                + ") q"
            )
            .fetchall()
        )
    finally:
        media._fixture_rows.cache_clear()
    for i, p in enumerate(payloads):
        m = codecs.mp4_metadata(p)
        want = (m["duration_ms"], m["n_tracks"])
        have = tuple(got[i]) if got[i] else (None, None)
        assert have == want, (i, have, want)


def test_media_thumbnails_roundtrip(spark):
    """The resize->encode->decode chain: decodable fixture images
    yield valid thumbnails of exactly the target size in the SOURCE
    container; garbage/null payloads yield null rows."""
    from projetbigdatastreaming_spark.operators import codecs

    out = {
        r.media_id: r
        for r in media.q_media_thumbnails(spark, None).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8}
    for mid in (1, 2, 3, 4, 7):  # bmp, png, jpeg, 1x1 bmp, gif
        assert (out[mid].out_w, out[mid].out_h) == (
            media.THUMB_W, media.THUMB_H,
        ), mid
        assert out[mid].n_bytes_out > 0
        assert len(out[mid].thumb_md5) == 16
    assert out[5].out_w is None and out[5].thumb_md5 is None
    assert out[6].out_w is None
    assert out[8].out_w is None  # header-reject gif

    # the BMP thumbnail is a genuinely valid BMP whose pixels parse
    rows = {r[0]: r[3] for r in media._fixture_rows()}
    rp = media._thumb_replay("image/bmp", rows[1])
    import hashlib

    from projetbigdatastreaming_spark.operators import multimodal as mm

    resized = mm.auto_image_resize(rows[1], media.THUMB_W, media.THUMB_H)
    assert hashlib.md5(resized).hexdigest()[:16] == rp["thumb_md5"]
    px = codecs._bmp_pixels(resized)
    assert px is not None and px.shape == (media.THUMB_H, media.THUMB_W, 3)


def test_jpeg_sql_walk_matches_decoder_on_adversarial_segments(
    tmp_path, monkeypatch
):
    """The recursive-CTE JPEG marker walk must reproduce
    `jpeg_decode`'s width/height on payloads the fixture does NOT
    contain — odd dims, grayscale, a TEM standalone marker mid-walk,
    progressive (SOF2), subsampled, bad component count, EOI before
    SOS, truncation before/inside a segment, and garbage — not just
    replay the committed rows."""
    import numpy as np

    from projetbigdatastreaming_spark.operators import jpeg

    rgb = (
        np.arange(17 * 11 * 3, dtype=np.uint8).reshape(11, 17, 3) * 7
    ) % 251
    gray = (np.arange(9 * 13, dtype=np.uint8).reshape(13, 9) * 5) % 251
    base = jpeg.jpeg_encode(rgb)
    sof = base.find(b"\xff\xc0")
    sos = base.find(b"\xff\xda")
    assert sof > 0 and sos > sof

    def patch(data, off, val):
        b = bytearray(data)
        b[off] = val
        return bytes(b)

    payloads = [
        base,
        jpeg.jpeg_encode(gray),
        base[:2] + b"\xff\x01" + base[2:],  # TEM standalone mid-walk
        patch(base, sof + 1, 0xC2),  # progressive frame -> null
        patch(base, sof + 11, 0x22),  # subsampled -> out of profile
        patch(base, sof + 9, 0x02),  # 2 components -> out of profile
        base[:sos] + b"\xff\xd9",  # EOI before SOS -> no scan
        base[:sos],  # ends exactly where SOS would start
        base[: sof + 4],  # truncated inside the SOF header
        b"\xff\xd8 not really a jpeg",
        b"",
    ]
    rows = [
        (i, "image", "image/jpeg", p, len(p) if p else None)
        for i, p in enumerate(payloads)
    ]
    try:
        _swap_fixture(monkeypatch, rows, str(tmp_path / "jpg.parquet"))
        got = {
            m: (w, h)
            for m, w, h, _ in duckdb.connect()
            .execute(media._oracle_image_stats())
            .fetchall()
        }
    finally:
        media._fixture_rows.cache_clear()
    for i, p in enumerate(payloads):
        want = jpeg.jpeg_decode(p)
        assert got[i] == (want["width"], want["height"]), (i, got[i], want)


def _cte_query(rows, path, ctes, select, kind):
    """Run a CTE chain from the builders against an ad-hoc fixture."""
    import sys

    sys.path.insert(0, "tools")
    from make_media_fixture import write_rows

    write_rows(rows, path)
    sql = (
        "WITH RECURSIVE f AS (SELECT media_id, mime, hex(payload) AS hx,"
        f" octet_length(payload) AS nb FROM '{path}'"
        f" WHERE kind = '{kind}'), {ctes} {select}"
    )
    return duckdb.connect().execute(sql).fetchall()


def test_wav_sql_rms_matches_decoder_on_adversarial_pcm(tmp_path):
    """The WAV byte-math CTE must reproduce the refactored
    wav_features bit-exactly on canonical PCM payloads the fixture
    lacks — stereo, 8-bit, silence, empty data, truncation, trailing
    junk, a lying nBlockAlign field — and must flag the non-exact
    widths (32-bit) as replay rows rather than guessing."""
    import io as _io
    import wave as _wave

    import numpy as np

    from projetbigdatastreaming_spark.operators import codecs

    def wav(width, nch, rate, samples):
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(samples.tobytes())
        return buf.getvalue()

    t = np.arange(700)
    s16 = (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype("<i2")
    st = np.stack(
        [s16, (np.arange(700) * 37 % 25000 - 12500).astype("<i2")], 1
    ).reshape(-1)
    s8 = ((np.sin(2 * np.pi * 3 * t / 700) * 100) + 128).astype(np.uint8)
    base = wav(2, 1, 8000, s16)
    blk = bytearray(base)
    blk[32] = 5  # lying nBlockAlign: wave ignores it, so must the SQL
    payloads = [
        base,
        wav(2, 2, 44100, st),
        wav(1, 1, 16000, s8),
        wav(2, 1, 8000, np.zeros(0, "<i2")),
        wav(2, 1, 8000, np.zeros(512, "<i2")),  # digital silence
        base[: len(base) - 101],  # truncated data chunk
        base + b"JUNKJUNK",  # trailing bytes past declared dsz
        bytes(blk),
        wav(4, 1, 8000, (np.arange(300) * 9973).astype("<i4")),  # 32-bit
        b"RIFF garbage",
        b"",
    ]
    rows = [
        (i, "audio", "audio/wav", p, len(p) if p else None)
        for i, p in enumerate(payloads)
    ]
    got = {
        m: (d, r, s)
        for m, d, r, s in _cte_query(
            rows,
            str(tmp_path / "wav.parquet"),
            media._wav_pcm_ctes(),
            "SELECT media_id, duration_ms, rms_q8, rms_sql FROM wmeta",
            "audio",
        )
    }
    for i, p in enumerate(payloads):
        want = codecs.wav_features(p)
        if i in (5, 9, 10):  # non-canonical (truncated data chunk,
            # garbage, empty): not in wmeta at all — replay class
            assert i not in got
            assert want["duration_ms"] is None
            continue
        d, r, sqlable = got[i]
        assert d == want["duration_ms"], (i, d, want)
        if i == 8:  # 32-bit: duration byte-math, rms replay-flagged
            assert sqlable is False
        else:
            assert sqlable is True
            assert r == want["rms_q8"], (i, r, want)


def test_y4m_sql_motion_matches_decoder_on_adversarial_streams(tmp_path):
    """The Y4M static-layout CTE must reproduce y4m_motion's
    n_frames/motion_q8 exactly whenever static_ok, and must REFUSE
    (static_ok = false -> replay) whenever the layout assumption
    breaks: param-bearing FRAME headers, marker bytes inside a frame
    body, a marker-bearing truncated tail."""
    import numpy as np

    from projetbigdatastreaming_spark.operators import codecs

    w, h = 16, 12
    fsize = w * h + 2 * ((w // 2) * (h // 2))
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()

    def frame(seed):
        rng = np.random.RandomState(seed)
        body = rng.randint(0, 255, fsize).astype(np.uint8).tobytes()
        assert b"FRAME" not in body
        return b"FRAME\n" + body

    varied = head + frame(1) + frame(2) + frame(3) + frame(4)
    static = head + frame(7) * 3
    evil_body = b"FRAME\n" + bytes(fsize - 12) + b"FRAME\n" + bytes(6)
    payloads = [
        varied,
        static,
        head + frame(5),  # single frame
        head,  # zero frames
        varied[: len(varied) - 50],  # marker-bearing truncated tail
        head + evil_body,  # marker inside the frame body
        head + b"FRAMEX\n" + bytes(fsize) + frame(9),  # param header
        f"YUV4MPEG2 W15 H12 C420\n".encode() + frame(1),  # odd width
        f"YUV4MPEG2 W16 H12 C444\n".encode() + frame(1),  # non-420
        b"YUV4MPEG2 no newline at all",
    ]
    rows = [
        (i, "video", "video/y4m", p, len(p)) for i, p in enumerate(payloads)
    ]
    got = {
        m: (ok, n, mo)
        for m, ok, n, mo in _cte_query(
            rows,
            str(tmp_path / "y4m.parquet"),
            media._y4m_static_ctes(),
            "SELECT media_id, static_ok, m, motion_q8 FROM ystat",
            "video",
        )
    }
    for i in (0, 1, 2, 3):  # static-layout: byte-math must be exact
        want = codecs.y4m_motion(payloads[i])
        ok, n, mo = got[i]
        assert ok is True, i
        assert n == want["n_frames"], (i, n, want)
        assert mo == want["motion_q8"], (i, mo, want)
    for i in (4, 5, 6):  # layout broken: must refuse, not guess
        assert got[i][0] is False, i
    for i in (7, 8, 9):  # parse-failure class: Python nulls, no ystat row
        assert i not in got, i
        assert codecs.y4m_motion(payloads[i])["n_frames"] is None


def test_image_structure_sql_matches_python_on_adversarial_headers(
    tmp_path, monkeypatch
):
    """Round-7 fully-replay-free media query: the image_structure
    oracle (pure byte math) must reproduce the Python structural
    parsers on headers the fixture does NOT contain — grayscale and
    12-bit-precision JPEG, all four PNG color types (incl. the
    gray+alpha and RGBA channel counts), 16-bit-depth and interlaced
    PNG rejects, BMP with wrong bpp, truncations, and garbage."""
    import struct

    import numpy as np

    from projetbigdatastreaming_spark.operators import codecs, jpeg
    from projetbigdatastreaming_spark.plans.media import (
        _image_structure,
    )

    def png_hdr(w, h, depth, color, interlace, extra=b"\x00" * 8):
        # structure queries read only the IHDR; CRC/zlib may be junk
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
            + extra
        )

    rgb = (
        np.arange(17 * 11 * 3, dtype=np.uint8).reshape(11, 17, 3) * 7
    ) % 251
    gray = (np.arange(9 * 13, dtype=np.uint8).reshape(13, 9) * 5) % 251
    jbase = jpeg.jpeg_encode(rgb)
    sof = jbase.find(b"\xff\xc0")

    def patch(data, off, val):
        b = bytearray(data)
        b[off] = val
        return bytes(b)

    px = (np.arange(6 * 6 * 3, dtype=np.uint8).reshape(6, 6, 3)) % 251
    bmp = codecs.bmp_encode(px)
    payloads = [
        ("image/jpeg", jbase),                      # 3 comp, 8 bit
        ("image/jpeg", jpeg.jpeg_encode(gray)),     # 1 comp
        ("image/jpeg", patch(jbase, sof + 4, 12)),  # 12-bit precision
        ("image/jpeg", patch(jbase, sof + 1, 0xC2)),  # progressive
        ("image/jpeg", jbase[: sof + 4]),           # truncated SOF
        ("image/png", png_hdr(4, 3, 8, 0, 0)),      # gray: 1 comp
        ("image/png", png_hdr(4, 3, 8, 2, 0)),      # rgb: 3 comp
        ("image/png", png_hdr(4, 3, 8, 4, 0)),      # gray+alpha: 2
        ("image/png", png_hdr(4, 3, 8, 6, 0)),      # rgba: 4
        ("image/png", png_hdr(4, 3, 16, 2, 0)),     # 16-bit reject
        ("image/png", png_hdr(4, 3, 8, 2, 1)),      # interlaced reject
        ("image/png", png_hdr(0, 3, 8, 2, 0)),      # zero width reject
        ("image/png", png_hdr(4, 3, 8, 2, 0)[:30]),  # truncated
        ("image/bmp", bmp),                          # 3 comp, 8 bit
        ("image/bmp", patch(bmp, 28, 8)),            # 8-bpp reject
        ("image/bmp", bmp[:40]),                     # truncated
        ("image/jpeg", b"not an image at all"),
    ]
    rows = [
        (i, "image", mime, p, len(p) if p else None)
        for i, (mime, p) in enumerate(payloads)
    ]
    try:
        _swap_fixture(monkeypatch, rows, str(tmp_path / "st.parquet"))
        got = {
            m: (nc, bd)
            for m, nc, bd in duckdb.connect()
            .execute(media._oracle_image_structure())
            .fetchall()
        }
    finally:
        media._fixture_rows.cache_clear()
    for i, (mime, p) in enumerate(payloads):
        want = _image_structure(mime, p)
        assert got[i] == (
            want["n_components"],
            want["bit_depth"],
        ), (i, mime, got[i], want)
    # the interesting positives really are positive
    assert got[1] == (1, 8) and got[2] == (3, 12)
    assert got[7] == (2, 8) and got[8] == (4, 8)


def test_image_structure_sql_matches_python_on_random_mutants(
    tmp_path, monkeypatch
):
    """Seeded fuzz: hundreds of random single/multi-byte mutants and
    truncations of valid JPEG/PNG/BMP payloads through BOTH sides of
    image_structure — any divergence between the Python struct walks
    and the DuckDB byte-math CTEs fails with the offending payload's
    seed, catching guard-order or bounds mismatches the curated
    adversarial list can't enumerate."""
    import random
    import struct

    import numpy as np

    from projetbigdatastreaming_spark.operators import codecs, jpeg
    from projetbigdatastreaming_spark.plans.media import (
        _image_structure,
    )

    rng = random.Random(0xC0FFEE)
    px = (np.arange(10 * 14 * 3, dtype=np.uint8).reshape(14, 10, 3)) % 251
    from projetbigdatastreaming_spark.operators import gif as gifmod

    bases = [
        ("image/jpeg", jpeg.jpeg_encode(px)),
        ("image/bmp", codecs.bmp_encode(px)),
        ("image/gif", gifmod.gif_encode(px % 64)),  # <=64 colors
        (
            "image/png",
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">IIBBBBB", 10, 14, 8, 2, 0, 0, 0)
            + b"\x00" * 16,
        ),
    ]
    payloads = []
    for mime, base in bases:
        payloads.append((mime, base))
        for _ in range(60):
            b = bytearray(base)
            for _ in range(rng.randint(1, 3)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            if rng.random() < 0.3:
                b = b[: rng.randrange(len(b) + 1)]
            payloads.append((mime, bytes(b)))
    rows = [
        (i, "image", mime, p, len(p) if p else None)
        for i, (mime, p) in enumerate(payloads)
    ]
    try:
        _swap_fixture(monkeypatch, rows, str(tmp_path / "fz.parquet"))
        got = {
            m: (nc, bd)
            for m, nc, bd in duckdb.connect()
            .execute(media._oracle_image_structure())
            .fetchall()
        }
    finally:
        media._fixture_rows.cache_clear()
    for i, (mime, p) in enumerate(payloads):
        want = _image_structure(mime, p)
        assert got[i] == (
            want["n_components"],
            want["bit_depth"],
        ), (i, mime, got[i], want, p.hex()[:80])


def test_audio_structure_sql_matches_python_on_adversarial_headers(
    tmp_path, monkeypatch
):
    """Round-7 replay-free audio query: the audio_structure oracle
    must reproduce the Python header parsers on payloads the fixture
    lacks — multichannel/8-bit/24-bit-declared WAV, truncated-data
    WAV, non-PCM fmt tag, mono and MPEG2 and ID3-prefixed MPEG
    frames, Layer II, truncation, garbage."""
    import io
    import struct
    import wave

    import numpy as np

    from projetbigdatastreaming_spark.operators import codecs, mpeg_audio
    from projetbigdatastreaming_spark.plans.media import (
        _audio_structure,
    )

    def wav(nch, width, rate, n=50):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(bytes(n * nch * width))
        return buf.getvalue()

    def patch(data, off, val):
        b = bytearray(data)
        b[off] = val
        return bytes(b)

    base = codecs.mp3_encode_minimal(3, 128, 44100)
    # force mono: mode bits (byte 3 >> 6) = 3
    mono = patch(base, 3, (base[3] & 0x3F) | 0xC0)
    t = np.arange(1152) / 44100.0
    payloads = [
        ("audio/wav", wav(2, 2, 22050)),
        ("audio/wav", wav(1, 1, 8000)),        # 8-bit
        ("audio/wav", wav(2, 3, 48000)),       # 24-bit declared
        ("audio/wav", wav(1, 2, 16000)[:-20]),  # truncated data
        ("audio/wav", patch(wav(1, 2, 16000), 20, 3)),  # non-PCM tag
        ("audio/wav", b"RIFF garbage payload"),
        ("audio/mpeg", base),                   # MPEG1 L3 stereo
        ("audio/mpeg", mono),                   # mono mode
        # hand-built MPEG2 L3 header: sync, version=2, layer bits 01,
        # bitrate idx 5, sample-rate idx 0 (22050), stereo
        ("audio/mpeg", bytes([0xFF, 0xF3, 0x50, 0x00])),
        ("audio/mpeg", b"ID3" + bytes([3, 0, 0, 0, 0, 0, 20])
         + bytes(20) + base),                   # ID3v2.3 prefix
        ("audio/mpeg",
         mpeg_audio.mp2_encode(0.2 * np.sin(2 * np.pi * 440 * t),
                               44100, 64)),     # Layer II
        ("audio/mpeg", base[:3]),               # truncated header
        ("audio/mpeg", b"\xff\xe0 bad header"),
        ("audio/mpeg", b""),
    ]
    rows = [
        (i, "audio", mime, p, len(p) if p else None)
        for i, (mime, p) in enumerate(payloads)
    ]
    try:
        _swap_fixture(monkeypatch, rows, str(tmp_path / "as.parquet"))
        got = {
            m: rest
            for m, *rest in duckdb.connect()
            .execute(media._oracle_audio_structure())
            .fetchall()
        }
    finally:
        media._fixture_rows.cache_clear()
    for i, (mime, p) in enumerate(payloads):
        want = _audio_structure(mime, p)
        assert got[i] == [
            want["n_channels"],
            want["sample_bits"],
            want["sample_rate"],
            want["codec_layer"],
        ], (i, mime, got[i], want)
    # the interesting positives really are positive
    assert got[0] == [2, 16, 22050, None]
    assert got[2] == [2, 24, 48000, None]
    assert got[6][0] == 2 and got[6][3] == 3
    assert got[7][0] == 1
    assert got[10][3] == 2  # Layer II


def test_video_structure_sql_matches_python_on_adversarial_headers(
    tmp_path, monkeypatch
):
    """Round-7 replay-free video query: Y4M header variants (no F
    token, extra tokens, odd dims, C444 reject, headerless) and MP4
    trak/tkhd selection (first NONZERO-dim track wins even when a
    zero-dim track precedes it; largesize boxes; track-free moov;
    garbage) must match the Python parsers exactly."""
    from projetbigdatastreaming_spark.operators import codecs
    from projetbigdatastreaming_spark.plans.media import (
        _video_structure,
    )

    def y4m(hdr, n_frames=1, w=4, h=4):
        fsize = w * h + 2 * ((w // 2) * (h // 2))
        return hdr + b"".join(
            b"FRAME\n" + bytes(fsize) for _ in range(n_frames)
        )

    payloads = [
        ("video/y4m", y4m(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n")),
        ("video/y4m", y4m(b"YUV4MPEG2 W4 H4 Ip\n")),  # no F token
        ("video/y4m", y4m(b"YUV4MPEG2 W4 H4 F30000:1001 C420\n")),
        ("video/y4m", y4m(b"YUV4MPEG2 W3 H4 F25:1\n", w=3)),  # odd
        ("video/y4m", b"YUV4MPEG2 W4 H4 C444\n" + bytes(48)),  # C444
        ("video/y4m", b"YUV4MPEG2 W4 H4 no newline at all"),
        ("video/y4m", b"not y4m"),
        ("video/mp4",
         codecs.mp4_encode_minimal(5000, tracks=((640, 360),))),
        ("video/mp4",
         codecs.mp4_encode_minimal(
             5000, tracks=((0, 0), (320, 240), (111, 222))
         )),  # zero-dim first: second wins
        ("video/mp4", codecs.mp4_encode_minimal(5000, tracks=())),
        ("video/mp4", b"\x00\x00\x00\x08free junk"),
        ("video/mp4", b""),
    ]
    rows = [
        (i, "video", mime, p, len(p) if p else None)
        for i, (mime, p) in enumerate(payloads)
    ]
    try:
        _swap_fixture(monkeypatch, rows, str(tmp_path / "vs.parquet"))
        got = {
            m: rest
            for m, *rest in duckdb.connect()
            .execute(media._oracle_video_structure())
            .fetchall()
        }
    finally:
        media._fixture_rows.cache_clear()
    for i, (mime, p) in enumerate(payloads):
        want = _video_structure(mime, p)
        assert got[i] == [
            want["width"],
            want["height"],
            want["fps_num"],
            want["fps_den"],
        ], (i, mime, got[i], want)
    assert got[0] == [4, 4, 25, 1]
    assert got[1] == [4, 4, None, None]
    assert got[2] == [4, 4, 30000, 1001]
    assert got[8] == [320, 240, None, None]  # first nonzero wins
