"""Generate the deterministic in-repo media fixture
(``projetbigdatastreaming_spark/fixtures/media.parquet``).

The codec family (BMP/PNG/JPEG/WAV/Y4M/MP4) had zero driver-visible
correctness signal before round 4 — pytest-only, because no media
fixture existed in the driver's tables.  This script builds one FROM
OUR OWN ENCODERS: every payload is a pure function of nothing but
constants (fixed gradients, fixed tones, fixed box fields), so the
file is reproducible bit-for-bit and safe to commit.

Run: ``python tools/make_media_fixture.py`` (pyarrow only, no Spark).
The registered queries in ``plans/media.py`` read this file and their
oracles replay the same pure-Python decodes as literal rows — see the
honesty note there.
"""

from __future__ import annotations

import io
import os
import sys
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projetbigdatastreaming_spark.operators import (  # noqa: E402
    codecs,
    gif,
    jpeg,
    mpeg_audio,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "projetbigdatastreaming_spark",
    "fixtures",
    "media.parquet",
)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ]
    ).astype(np.uint8)


def _wav(freq: int, rate: int, n: int, width: int) -> bytes:
    t = np.arange(n)
    x = np.sin(2 * np.pi * freq * t / rate)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 1:
            w.writeframes((128 + x * 100).astype(np.uint8).tobytes())
        else:
            w.writeframes((x * 30000).astype("<i2").tobytes())
    return buf.getvalue()


def _y4m(frames: list[int], w: int = 16, h: int = 16) -> bytes:
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
    body = b""
    for y in frames:
        yp = np.full((h, w), y, dtype=np.uint8)
        uv = np.full((h // 2, w // 2), 128, dtype=np.uint8)
        body += b"FRAME\n" + yp.tobytes() + uv.tobytes() + uv.tobytes()
    return head + body


def build_rows() -> list[tuple]:
    rows: list[tuple] = []

    def add(mid, kind, mime, payload):
        rows.append(
            (mid, kind, mime, payload, len(payload) if payload else None)
        )

    add(1, "image", "image/bmp", codecs.bmp_encode(_gradient(9, 16)))
    add(2, "image", "image/png", codecs.png_encode(_gradient(7, 12)))
    add(3, "image", "image/jpeg", jpeg.jpeg_encode(_gradient(16, 24), 90))
    add(4, "image", "image/bmp", codecs.bmp_encode(_gradient(1, 1)))
    add(5, "image", "image/jpeg", b"\xff\xd8 not really a jpeg")
    add(6, "image", "image/png", None)
    # round 7: GIF rows — a real LZW-compressed image (11x13 gradient,
    # 143 pixels so the palette stays under the 256-color limit) and
    # a magic-valid header reject (byte 10 = 0x20, a space, has the
    # GCT flag clear, so BOTH engines null it from the header alone)
    add(7, "image", "image/gif", gif.gif_encode(_gradient(11, 13)))
    add(8, "image", "image/gif", b"GIF89a not really a gif")
    add(10, "audio", "audio/wav", _wav(440, 8000, 2000, 2))
    add(11, "audio", "audio/wav", _wav(1000, 16000, 800, 1))
    add(12, "audio", "audio/wav", b"RIFF garbage payload")
    add(13, "audio", "audio/mpeg", codecs.mp3_encode_minimal(38, 128, 44100))
    add(
        14,
        "audio",
        "audio/mpeg",
        codecs.mp3_encode_minimal(9, 64, 32000, vbr_alternate_kbps=160),
    )
    # Layer II tone: the one MPEG row whose SAMPLES decode to real,
    # non-zero audio (mpeg_audio.mp2_frame_decode), so the driver row
    # pins an actual subband decode, not just header metadata
    t = np.arange(1152 * 3) / 44100.0
    tone = 0.4 * np.sin(2 * np.pi * 554.365 * t)
    add(15, "audio", "audio/mpeg", mpeg_audio.mp2_encode(tone, 44100, 64))
    # non-silent Layer III: flip one side-info bit so gr0/ch0
    # part2_3_length != 0 — provably NOT silence, rms must go null
    # while the header-walk duration stays real
    l3 = bytearray(codecs.mp3_encode_minimal(2, 128, 44100))
    l3[6] |= 0x08
    add(16, "audio", "audio/mpeg", bytes(l3))
    # joint-stereo Layer II: outside the documented decode subset
    # (intensity coding), rms null with real duration
    js = bytearray(mpeg_audio.mp2_encode(tone[:1152], 44100, 64))
    js[3] = (js[3] & 0x3F) | 0x40
    add(17, "audio", "audio/mpeg", bytes(js))
    add(20, "video", "video/y4m", _y4m([0, 60, 200]))
    add(
        21,
        "video",
        "video/mp4",
        codecs.mp4_encode_minimal(
            12000, timescale=600, tracks=((640, 360), (0, 0)), brand=b"isom"
        ),
    )
    add(22, "video", "video/mp4", b"\x00\x00\x00\x08free junk")
    return rows


def _shade(px: np.ndarray, c: int) -> np.ndarray:
    """Per-copy deterministic pixel perturbation (wraps mod 256)."""
    return ((px.astype(np.int16) + 7 * c) % 256).astype(np.uint8)


def scaled_rows(factor: int) -> list[tuple]:
    """Media rows for the throughput scale point (tools/gen_scale.py).

    The committed fixture is 8 KB of tiny payloads — fine for the
    correctness gate, invisible in any bench column.  This builds
    ``factor`` copies of a LARGER per-copy set (hundreds of KB of
    pixels/samples each), every payload re-encoded from per-copy
    perturbed content by our own encoders, so decode work scales
    linearly with the copy count and payloads differ across copies
    (no cross-copy byte-identical rows).  NOT oracle-checked — the
    driver's correctness gate runs on the committed fixture.
    """
    rows: list[tuple] = []

    def add(mid, kind, mime, payload):
        rows.append(
            (mid, kind, mime, payload, len(payload) if payload else None)
        )

    for c in range(factor):
        base = 1000 * c
        add(base + 1, "image", "image/bmp",
            codecs.bmp_encode(_shade(_gradient(96, 128), c)))
        add(base + 2, "image", "image/bmp",
            codecs.bmp_encode(_shade(_gradient(128, 160), 3 * c + 1)))
        add(base + 3, "image", "image/png",
            codecs.png_encode(_shade(_gradient(96, 128), 5 * c + 2)))
        add(base + 4, "image", "image/png",
            codecs.png_encode(_shade(_gradient(64, 96), 7 * c + 3)))
        add(base + 5, "image", "image/jpeg",
            jpeg.jpeg_encode(_shade(_gradient(96, 96), c), 85))
        add(base + 6, "image", "image/jpeg",
            jpeg.jpeg_encode(_shade(_gradient(128, 128), 2 * c + 1), 75))
        # GIF at scale: palette-indexed synthetic texture (<=200
        # colors by construction, real LZW work per copy)
        yy, xx = np.mgrid[0:96, 0:128]
        idx = ((xx * 3 + yy * 5 + 11 * c) % 200).astype(np.int64)
        pal = _shade(_gradient(20, 10), 13 * c).reshape(-1, 3)[:200]
        add(base + 13, "image", "image/gif", gif.gif_encode(pal[idx]))
        add(base + 7, "audio", "audio/wav", _wav(300 + 17 * c, 16000, 8000, 2))
        add(base + 8, "audio", "audio/wav", _wav(500 + 23 * c, 8000, 4000, 1))
        t = np.arange(1152 * 4) / 44100.0
        tone = 0.3 * np.sin(2 * np.pi * (400.0 + 31 * c) * t)
        add(base + 9, "audio", "audio/mpeg",
            mpeg_audio.mp2_encode(tone, 44100, 64))
        add(base + 10, "audio", "audio/mpeg",
            codecs.mp3_encode_minimal(20 + c, 128, 44100))
        add(base + 11, "video", "video/y4m",
            _y4m([(10 * c + 20 * f) % 256 for f in range(8)], 32, 32))
        add(base + 12, "video", "video/mp4",
            codecs.mp4_encode_minimal(
                8000 + 250 * c, timescale=600,
                tracks=((640, 360),), brand=b"isom",
            ))
    # null/garbage-tolerance rows, once (decoders must null, not crash)
    add(factor * 1000 + 1, "image", "image/jpeg", b"\xff\xd8 not a jpeg")
    add(factor * 1000 + 2, "image", "image/png", None)
    add(factor * 1000 + 3, "audio", "audio/wav", b"RIFF garbage payload")
    return rows


def write_rows(rows: list[tuple], path: str) -> None:
    table = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "mime": pa.array([r[2] for r in rows], pa.string()),
            "payload": pa.array([r[3] for r in rows], pa.binary()),
            "n_bytes": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path, compression="snappy")


def main() -> None:
    rows = build_rows()
    write_rows(rows, OUT)
    print(f"wrote {len(rows)} rows to {OUT}")


if __name__ == "__main__":
    main()
