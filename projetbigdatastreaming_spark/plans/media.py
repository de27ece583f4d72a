"""Driver-visible queries over the in-repo media fixture — the
correctness surface for the codec family (BMP/PNG/JPEG/GIF/WAV/Y4M/MP4).

Until round 4 the codecs were pytest-only: the driver's tables carry
no binary media, so decode plumbing had zero CORRECTNESS_r* signal.
The fixture (``fixtures/media.parquet``, built by
``tools/make_media_fixture.py`` from our own encoders, committed —
6.7 KB) closes that: these queries run the REAL decoders inside the
Arrow ``mapInPandas`` batch loop over a genuine parquet scan.

Honesty note on the oracles (tightened in rounds 5-6): every value
that a FIXED-LAYOUT structure makes SQL-computable is now derived by
DuckDB byte math over the raw payload hex, fully independent of our
Python decoders — BMP width/height (LE fields of BITMAPINFOHEADER,
with the same validity guards `_bmp_pixels` applies), PNG
width/height (BE IHDR fields + signature/depth/interlace guards),
WAV ``duration_ms`` AND ``rms_q8`` (late round 6: an exact-int64
sum-of-squares over the PCM samples through the same canonical
IEEE expression as the refactored `wav_features` — bit-identical
for canonical 8/16-bit PCM; 32-bit and non-canonical layouts fall
back to replay), Y4M ``n_frames`` AND ``motion_q8`` (late round 6:
a static-layout frame walk with byte-ALIGNED marker verification —
retiring the old nibble-blind marker count — and an exact-integer
half-up motion quantizer; layouts the static model can't certify
fall back to replay), MPEG-audio ``duration_ms`` (a recursive-CTE frame-header
walk twin of `_mp3_frame`, incl. ID3v2 skip and the rate-change stop
rule), and MP4 ``duration_ms``/``n_tracks`` (a recursive-CTE
ISO-BMFF box walk twin of `_iter_boxes` with mvhd v0/v1 and
largesize/to-end size semantics), and — since late round 6 — JPEG
width/height (a recursive-CTE marker-segment walk twin of
`jpeg_decode_pixels`'s structural phase, incl. the baseline-profile
guards; adversarially tested against the decoder on payloads the
fixture lacks).  Round 7 adds ``image_structure`` — (n_components,
bit_depth) from the JPEG SOF0 / PNG IHDR / BMP header — the first
media query with NO replay relation at all: both engines read only
header bytes (Python struct walks vs the same DuckDB CTEs),
adversarially cross-checked on headers the fixture lacks.  The
remaining replayed set is MINIMAL by construction: pixel
``feature_hash`` requires zlib inflate (PNG) or Huffman+IDCT (JPEG)
and MPEG ``rms_q8`` requires subband synthesis — all entropy-coded
bitstreams whose decode state is data-dependent at bit granularity,
not expressible as fixed-offset byte math or a linear recursive
walk; every fixed-layout field either side of the entropy stream is
already oracle-covered (dims, precision, component count, durations,
track counts, frame counts, PCM rms).  The non-canonical fallback
classes above remain replayed because their layouts genuinely vary.  For replayed columns the driver row
verifies the whole Spark side (scan → Arrow → dispatch → schema) but
not the decoder itself; decoder correctness for those is pinned by
the pytest golden/property suites.
``media_manifest`` is fully engine-independent (both engines hash
the raw payload bytes: md5 over hex, the portable-hash idiom).
Residual SQL blind spots (same class): PNG zlib-stream integrity,
JPEG entropy-stream / 16-bit-DQT validity, and GIF LZW-stream /
image-descriptor validity (the descriptor sits past the variable-
length extension chain) cannot be checked in SQL, so a payload with
a valid header but corrupt compressed data (or an out-of-profile
descriptor) would diverge — no such row exists in the committed
fixture.  ``image_structure`` is immune by construction: its GIF
fields read only the fixed 13-byte header on both sides.

Scale plan: all four queries are map-only over the media scan plus a
≤|kinds|-key hash-agg (manifest); payloads cross into Python only as
Arrow batches (one decode call per payload, bounded by
``arrow.maxRecordsPerBatch``); metadata stays JVM-side.  At 100 TB
the fixture becomes a media-lake table partitioned by kind/mime —
identical plan shape.
"""

from __future__ import annotations

import functools
import os
from collections.abc import Iterator

from pyspark.sql import functions as F

from .registry import QuerySpec

FIXTURE = os.path.abspath(
    os.path.join(
        os.path.dirname(__file__), "..", "fixtures", "media.parquet"
    )
)


def _media_path(sf_dir: str) -> str:
    """Use a scaled media table in the sf dir ONLY when the caller
    opted in via SPARK_GRAFT_MEDIA_SCALED=1 (bench.py sets it around
    its sf2 sweep so decode work stops being scale-invariant in the
    bench); otherwise always the committed 8 KB fixture.  The DuckDB
    oracles are built from the fixture's rows, so the opt-in gate —
    rather than implicit on-disk presence — guarantees a correctness
    run pointed at a dir that happens to carry media.parquet (e.g.
    .bench_sf1) still compares fixture-vs-fixture instead of
    red-flagging every media query with a row-count mismatch."""
    if os.environ.get("SPARK_GRAFT_MEDIA_SCALED") == "1":
        scaled = os.path.join(sf_dir, "media.parquet") if sf_dir else ""
        if scaled and os.path.exists(scaled):
            return scaled
    return FIXTURE

IMAGE_STATS_SCHEMA = (
    "media_id long, width int, height int, feature_hash long"
)
AUDIO_STATS_SCHEMA = "media_id long, duration_ms int, rms_q8 int"


def _audio_decode(mime: str, payload: bytes) -> dict:
    """WAV decodes fully (stdlib wave + numpy RMS); MPEG audio now
    decodes SAMPLES too (round-5: Layer II full subband decode,
    Layer III provable-silence — `operators/mpeg_audio.py`), so
    rms_q8 is real for every fixture row; frames outside the
    documented subset yield null rms with real header-walk
    duration."""
    from ..operators.codecs import wav_features
    from ..operators.mpeg_audio import mpeg_audio_features

    if payload is None:
        return {"duration_ms": None, "rms_q8": None}
    if mime == "audio/mpeg":
        return mpeg_audio_features(bytes(payload))
    return wav_features(bytes(payload))
VIDEO_STATS_SCHEMA = (
    "media_id long, n_frames int, motion_q8 int, duration_ms long, "
    "n_tracks int"
)


def _image_decode(mime: str, payload: bytes) -> dict:
    from ..operators import codecs, gif, jpeg

    if payload is None:
        return {"width": None, "height": None, "feature_hash": None}
    if mime == "image/bmp":
        return codecs.bmp_decode(bytes(payload))
    if mime == "image/png":
        return codecs.png_decode(bytes(payload))
    if mime == "image/gif":
        return gif.gif_decode(bytes(payload))
    return jpeg.jpeg_decode(bytes(payload))


def _video_decode(mime: str, payload: bytes) -> dict:
    from ..operators import codecs

    null = {
        "n_frames": None,
        "motion_q8": None,
        "duration_ms": None,
        "n_tracks": None,
    }
    if payload is None:
        return null
    if mime == "video/mp4":
        m = codecs.mp4_metadata(bytes(payload))
        return {
            **null,
            "duration_ms": m["duration_ms"],
            "n_tracks": m["n_tracks"],
        }
    m = codecs.y4m_motion(bytes(payload))
    return {
        **null,
        "n_frames": m["n_frames"],
        "motion_q8": m["motion_q8"],
    }


def q_image_stats(spark, sf_dir):
    """Decode every image payload (mime-dispatched BMP/PNG/JPEG) to
    (width, height, feature_hash) via mapInPandas — garbage and NULL
    payloads yield null rows, never task failures."""
    media = spark.read.parquet(_media_path(sf_dir)).where("kind = 'image'")

    def _batches(it: Iterator) -> Iterator:
        from ..operators.multimodal import records_to_frame

        for pdf in it:
            yield records_to_frame(
                [
                    _image_decode(m, p)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ],
                {"media_id": pdf["media_id"]},
            )

    return (
        media.select("media_id", "mime", "payload")
        .mapInPandas(_batches, IMAGE_STATS_SCHEMA)
        .orderBy("media_id")
    )


IMAGE_STRUCTURE_SCHEMA = "media_id long, n_components int, bit_depth int"


def _image_structure(mime: str, payload: bytes) -> dict:
    from ..operators import codecs, gif, jpeg

    if payload is None:
        return {"n_components": None, "bit_depth": None}
    if mime == "image/bmp":
        return codecs.bmp_structure(bytes(payload))
    if mime == "image/png":
        return codecs.png_structure(bytes(payload))
    if mime == "image/gif":
        return gif.gif_structure(bytes(payload))
    return jpeg.jpeg_structure(bytes(payload))


def q_image_structure(spark, sf_dir):
    """Structural image profile (n_components, bit_depth) — the first
    media query whose EVERY column is byte-math on both sides (round-7
    VERDICT item 8): the Python parsers (`codecs.bmp_structure` /
    `codecs.png_structure` / `jpeg.jpeg_structure`) read only header
    bytes under exactly the decoders' profile guards, and the DuckDB
    twin computes the same fields from the payload hex — NO replay
    relation anywhere, so the driver row checks two fully independent
    implementations of the structural dispatch path end to end
    (scan → Arrow → mime dispatch → header walk → schema)."""
    media = spark.read.parquet(_media_path(sf_dir)).where("kind = 'image'")

    def _batches(it: Iterator) -> Iterator:
        from ..operators.multimodal import records_to_frame

        for pdf in it:
            yield records_to_frame(
                [
                    _image_structure(m, p)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ],
                {"media_id": pdf["media_id"]},
            )

    return (
        media.select("media_id", "mime", "payload")
        .mapInPandas(_batches, IMAGE_STRUCTURE_SCHEMA)
        .orderBy("media_id")
    )


def _oracle_image_structure() -> str:
    # PNG spec §11.2.2 channels-per-color-type table; color type is
    # the IHDR byte at offset 25
    png_comp = (
        f"CASE {_hx_be(25, 1)} WHEN 0 THEN 1 WHEN 2 THEN 3 "
        "WHEN 4 THEN 2 WHEN 6 THEN 4 END"
    )
    return f"""
WITH RECURSIVE f AS (
  SELECT media_id, mime, hex(payload) AS hx,
         octet_length(payload) AS nb
  FROM '{FIXTURE}' WHERE kind = 'image'),
{_jpeg_walk_ctes()}
SELECT f.media_id,
       CAST(CASE WHEN f.mime = 'image/bmp'
                 THEN CASE WHEN {_BMP_OK} THEN 3 END
                 WHEN f.mime = 'image/png'
                 THEN CASE WHEN {_PNG_OK} THEN {png_comp} END
                 WHEN f.mime = 'image/gif'
                 THEN CASE WHEN {_GIF_OK} THEN 3 END
                 ELSE j.jn END AS INTEGER) AS n_components,
       CAST(CASE WHEN f.mime = 'image/bmp'
                 THEN CASE WHEN {_BMP_OK} THEN 8 END
                 WHEN f.mime = 'image/png'
                 THEN CASE WHEN {_PNG_OK} THEN 8 END
                 WHEN f.mime = 'image/gif'
                 THEN CASE WHEN {_GIF_OK}
                      THEN ({_hx_le(10, 1)} & 7) + 1 END
                 ELSE j.jp END AS INTEGER) AS bit_depth
FROM f
LEFT JOIN jmeta j ON f.media_id = j.media_id
ORDER BY f.media_id
"""


AUDIO_STRUCTURE_SCHEMA = (
    "media_id long, n_channels int, sample_bits int, "
    "sample_rate int, codec_layer int"
)


def _audio_structure(mime: str, payload: bytes) -> dict:
    from ..operators import codecs

    if payload is None:
        return {
            "n_channels": None,
            "sample_bits": None,
            "sample_rate": None,
            "codec_layer": None,
        }
    if mime == "audio/mpeg":
        return codecs.mpeg_structure(bytes(payload))
    return codecs.wav_structure(bytes(payload))


def q_audio_structure(spark, sf_dir):
    """Structural audio profile — the audio sibling of
    ``image_structure`` (round 7): (n_channels, sample_bits,
    sample_rate, codec_layer) from the canonical RIFF/WAVE header or
    the first MPEG frame header after the ID3v2 skip.  Both sides are
    pure header reads — `codecs.wav_structure`/`mpeg_structure` vs
    DuckDB byte math (the MPEG arm reuses the frame walk's first step
    for validity, so flen>=4 and the index-table guards match
    `_mp3_frame` exactly) — NO replay relation anywhere."""
    media = spark.read.parquet(_media_path(sf_dir)).where("kind = 'audio'")

    def _batches(it: Iterator) -> Iterator:
        from ..operators.multimodal import records_to_frame

        for pdf in it:
            yield records_to_frame(
                [
                    _audio_structure(m, p)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ],
                {"media_id": pdf["media_id"]},
            )

    return (
        media.select("media_id", "mime", "payload")
        .mapInPandas(_batches, AUDIO_STRUCTURE_SCHEMA)
        .orderBy("media_id")
    )


def _oracle_audio_structure() -> str:
    # WAV guards: exactly codecs.wav_structure's (the wcan set)
    wav_ok = (
        "nb >= 44"
        " AND substr(hx, 1, 8) = '52494646'"
        " AND substr(hx, 17, 8) = '57415645'"
        " AND substr(hx, 25, 8) = '666D7420'"
        " AND substr(hx, 73, 8) = '64617461'"
        f" AND {_hx_le(20, 2)} = 1"
        f" AND {_hx_le(22, 2)} > 0 AND {_hx_le(24, 4)} > 0"
        f" AND nb >= 44 + {_hx_le(40, 4)}"
    )
    # MPEG first-frame fields at pos = the ID3 skip; validity = the
    # duration walk reached n_frames = 1 (same guards as _mp3_frame,
    # including the flen >= 4 stop rule)
    p1 = _try_byte("pos + 1")
    p2 = _try_byte("pos + 2")
    p3 = _try_byte("pos + 3")
    from ..operators.codecs import _MP3_RATES

    rate_case = (
        f"CASE (({p1} >> 3) & 3)"
        + "".join(
            f" WHEN {v} THEN ({_sql_list(_MP3_RATES[v])})"
            f"[((({p2} >> 2) & 3)) + 1]"
            for v in (3, 2, 0)
        )
        + " END"
    )
    return f"""
WITH RECURSIVE f AS (
  SELECT media_id, mime, hex(payload) AS hx,
         octet_length(payload) AS nb
  FROM '{FIXTURE}' WHERE kind = 'audio'),
{_mp3_walk_ctes()},
mok AS (SELECT DISTINCT media_id FROM mw WHERE n_frames = 1),
mfields AS (
  SELECT s.media_id,
         CASE WHEN ((({p3} >> 6) & 3)) = 3 THEN 1 ELSE 2 END AS nch,
         {rate_case} AS rate,
         4 - (({p1} >> 1) & 3) AS lyr
  FROM (SELECT media_id, hx, nb, pos FROM mw WHERE n_frames = 0) s
  JOIN mok USING (media_id))
SELECT f.media_id,
       CAST(CASE WHEN f.mime = 'audio/wav'
                 THEN CASE WHEN {wav_ok} THEN {_hx_le(22, 2)} END
                 ELSE m.nch END AS INTEGER) AS n_channels,
       CAST(CASE WHEN f.mime = 'audio/wav'
                 THEN CASE WHEN {wav_ok} THEN {_hx_le(34, 2)} END
            END AS INTEGER) AS sample_bits,
       CAST(CASE WHEN f.mime = 'audio/wav'
                 THEN CASE WHEN {wav_ok} THEN {_hx_le(24, 4)} END
                 ELSE m.rate END AS INTEGER) AS sample_rate,
       CAST(CASE WHEN f.mime = 'audio/wav' THEN NULL
                 ELSE m.lyr END AS INTEGER) AS codec_layer
FROM f
LEFT JOIN mfields m ON f.media_id = m.media_id
ORDER BY f.media_id
"""


def q_audio_stats(spark, sf_dir):
    """Real audio metadata over the audio rows: stdlib-wave decode +
    numpy RMS for WAV, MPEG frame-header-walk duration for MP3."""
    media = spark.read.parquet(_media_path(sf_dir)).where("kind = 'audio'")

    def _batches(it: Iterator) -> Iterator:
        from ..operators.multimodal import records_to_frame

        for pdf in it:
            yield records_to_frame(
                [
                    _audio_decode(m, p)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ],
                {"media_id": pdf["media_id"]},
            )

    return (
        media.select("media_id", "mime", "payload")
        .mapInPandas(_batches, AUDIO_STATS_SCHEMA)
        .orderBy("media_id")
    )


def q_video_stats(spark, sf_dir):
    """Video container metadata: Y4M frame walk + motion profile,
    MP4/ISO-BMFF box-parsed duration and track count."""
    media = spark.read.parquet(_media_path(sf_dir)).where("kind = 'video'")

    def _batches(it: Iterator) -> Iterator:
        from ..operators.multimodal import records_to_frame

        for pdf in it:
            yield records_to_frame(
                [
                    _video_decode(m, p)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ],
                {"media_id": pdf["media_id"]},
            )

    return (
        media.select("media_id", "mime", "payload")
        .mapInPandas(_batches, VIDEO_STATS_SCHEMA)
        .select(
            "media_id", "n_frames", "motion_q8", "duration_ms", "n_tracks"
        )
        .orderBy("media_id")
    )


def q_media_manifest(spark, sf_dir):
    """Engine-independent media-lake manifest: per kind, file count,
    byte volume, and an order-independent content fingerprint (sum of
    60-bit md5-prefix hashes of each payload's hex — both engines hash
    the raw bytes themselves; no Python decode anywhere)."""
    media = spark.read.parquet(_media_path(sf_dir))
    fp = F.conv(
        F.substring(F.md5(F.hex(F.col("payload"))), 1, 15), 16, 10
    ).cast("bigint")
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum(fp % 1_000_000).alias("fingerprint"),
        )
        .orderBy("kind")
    )


#: dHash sampling grid (8 rows x 9 cols -> 64 comparison bits) and
#: the near-dup Hamming cut
_PHASH_ROWS = 8
_PHASH_COLS = 9
_PHASH_NEAR = 16

PHASH_SCHEMA = "media_id long, b0 int, b1 int, b2 int, b3 int"


def _image_phash(mime: str, payload: bytes) -> dict:
    """Perceptual difference-hash (dHash, Krawetz's gradient hash) of
    an image payload via the pure-Python codecs: point-sample the
    decoded raster on an 8x9 integer-gray grid, emit one bit per
    horizontal gradient, packed as FOUR 16-bit band words (b0..b3) —
    the band split serves double duty: no signed-64-bit xor
    portability hazard, and the bands ARE the LSH bucket keys
    downstream.  Point sampling (not interpolation) keeps the hash
    deterministic and total for any raster size, including 1x1.
    Undecodable payloads yield nulls."""
    import numpy as np

    from ..operators import codecs, gif, jpeg

    null = {f"b{i}": None for i in range(4)}
    if payload is None:
        return null
    payload = bytes(payload)
    if mime == "image/bmp":
        px = codecs._bmp_pixels(payload)
    elif mime == "image/png":
        px = codecs._png_pixels(payload)
    elif mime == "image/gif":
        px = gif._gif_pixels(payload)
    else:
        px = jpeg.jpeg_decode_pixels(payload)
    if px is None:
        return null
    h_px, w_px = px.shape[:2]
    g = [
        [
            int(
                px[
                    ((2 * r + 1) * h_px) // (2 * _PHASH_ROWS),
                    ((2 * c + 1) * w_px) // (2 * _PHASH_COLS),
                ]
                .astype(np.int64)
                .sum()
            )
            // 3
            for c in range(_PHASH_COLS)
        ]
        for r in range(_PHASH_ROWS)
    ]
    bits = 0
    for r in range(_PHASH_ROWS):
        for c in range(_PHASH_COLS - 1):
            if g[r][c] < g[r][c + 1]:
                bits |= 1 << (r * (_PHASH_COLS - 1) + c)
    return {f"b{i}": (bits >> (16 * i)) & 0xFFFF for i in range(4)}


def q_media_phash_pairs(spark, sf_dir):
    """Perceptual near-duplicate image pairs: dHash every image
    payload (`_image_phash` — the real-codec decode path), bucket on
    the four 16-bit hash bands (a pair must agree exactly on ≥1 band
    — the banded-LSH candidate rule `dedup_minhash_pairs` uses), and
    rescore candidates with the exact Hamming distance.  The visual
    counterpart of text near-dup: re-encoded, resized or
    format-shifted copies of an image land at small Hamming even when
    every byte differs (which is why `dedup_exact`'s byte hash misses
    them).

    Determinism: the hash is pure integer arithmetic over decoded
    rasters; band joins and the Hamming sum are integer-exact in both
    engines (the oracle replays the per-image bands via the
    fixture-literal pattern all media oracles use).

    Scale plan: the mapInPandas decode is the one Python boundary
    (Arrow batches, the media-module rule); candidates come from 4
    band equi-joins (shuffle keys are (band_id, value) — never an
    all-pairs cross), and the rescore touches only candidate pairs.
    """
    media = spark.read.parquet(_media_path(sf_dir)).where(
        "kind = 'image'"
    )

    def _batches(it: Iterator) -> Iterator:
        from ..operators.multimodal import records_to_frame

        for pdf in it:
            yield records_to_frame(
                [
                    _image_phash(m, p)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ],
                {"media_id": pdf["media_id"]},
            )

    ph = (
        media.select("media_id", "mime", "payload")
        .mapInPandas(_batches, PHASH_SCHEMA)
        .where(F.col("b0").isNotNull())
    )
    cand = None
    for i in range(4):
        side = ph.select(
            "media_id", F.col(f"b{i}").alias("bv")
        )
        c = (
            side.alias("x")
            .join(
                side.alias("y"),
                (F.col("x.bv") == F.col("y.bv"))
                & (F.col("x.media_id") < F.col("y.media_id")),
            )
            .select(
                F.col("x.media_id").alias("a"),
                F.col("y.media_id").alias("b"),
            )
        )
        cand = c if cand is None else cand.unionAll(c)
    cand = cand.distinct()
    pa = ph.selectExpr(
        "media_id AS a", *[f"b{i} AS a{i}" for i in range(4)]
    )
    pb = ph.selectExpr(
        "media_id AS b", *[f"b{i} AS b{i}" for i in range(4)]
    )
    ham = " + ".join(f"bit_count(a{i} ^ b{i})" for i in range(4))
    return (
        cand.join(pa, "a")
        .join(pb, "b")
        .selectExpr(
            "a AS media_id_a",
            "b AS media_id_b",
            f"CAST({ham} AS INT) AS hamming",
            f"({ham}) <= {_PHASH_NEAR} AS is_near",
        )
        .orderBy("media_id_a", "media_id_b")
    )


def _oracle_media_phash_pairs() -> str:
    rep = _replay_values(
        "image", _image_phash, ["media_id", "b0", "b1", "b2", "b3"]
    )
    bands = "\n  UNION ALL\n".join(
        f"  SELECT x.media_id AS a, y.media_id AS b"
        f" FROM ph x JOIN ph y ON x.b{i} = y.b{i}"
        f" AND x.media_id < y.media_id"
        for i in range(4)
    )
    ham = " + ".join(f"bit_count(xor(pa.b{i}, pb.b{i}))" for i in range(4))
    return f"""
WITH ph AS (
  SELECT * FROM {rep} WHERE b0 IS NOT NULL),
cand AS (
  SELECT DISTINCT a, b FROM (
{bands}))
SELECT c.a AS media_id_a, c.b AS media_id_b,
       CAST({ham} AS INT) AS hamming,
       ({ham}) <= {_PHASH_NEAR} AS is_near
FROM cand c
JOIN ph pa ON pa.media_id = c.a
JOIN ph pb ON pb.media_id = c.b
ORDER BY media_id_a, media_id_b
"""


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


@functools.lru_cache(maxsize=None)
def _fixture_rows() -> list[tuple]:
    import pyarrow.parquet as pq

    t = pq.read_table(FIXTURE)
    return list(
        zip(
            t["media_id"].to_pylist(),
            t["kind"].to_pylist(),
            t["mime"].to_pylist(),
            t["payload"].to_pylist(),
        )
    )


def _hx_le(off: int, nbytes: int) -> str:
    """DuckDB expr: little-endian unsigned integer read from the
    payload's hex string ``hx`` at BYTE offset ``off`` (0-based)."""
    return (
        "("
        + " + ".join(
            f"CAST('0x' || substr(hx, {2 * (off + i) + 1}, 2) AS BIGINT)"
            f" * {256 ** i}"
            for i in range(nbytes)
        )
        + ")"
    )


def _hx_be(off: int, nbytes: int) -> str:
    """Big-endian variant of `_hx_le`."""
    return (
        "("
        + " + ".join(
            f"CAST('0x' || substr(hx, {2 * (off + i) + 1}, 2) AS BIGINT)"
            f" * {256 ** (nbytes - 1 - i)}"
            for i in range(nbytes)
        )
        + ")"
    )


def _hx_le_i32(off: int) -> str:
    """Signed little-endian int32 from hex (two's complement)."""
    u = _hx_le(off, 4)
    return (
        f"(CASE WHEN {u} >= 2147483648 THEN {u} - 4294967296 "
        f"ELSE {u} END)"
    )


#: validity guards mirroring `_bmp_pixels` exactly: magic, a
#: BITMAPINFOHEADER-or-later header, uncompressed 24-bit single-plane,
#: positive width, and enough bytes for the padded pixel rows
_BMP_W = _hx_le_i32(18)
_BMP_H_RAW = _hx_le_i32(22)
_BMP_OK = (
    "nb >= 54 AND substr(hx, 1, 4) = '424D' "
    f"AND {_hx_le(14, 4)} >= 40 "  # header_size
    f"AND {_hx_le(28, 2)} = 24 "  # bpp
    f"AND {_hx_le(30, 4)} = 0 "  # compression
    f"AND {_hx_le(26, 2)} = 1 "  # planes
    f"AND {_BMP_W} > 0 "
    f"AND nb >= {_hx_le(10, 4)} "  # data_off + row_bytes * |height|
    f"  + (({_BMP_W} * 3 + 3) // 4) * 4 * abs({_BMP_H_RAW})"
)

#: `_png_pixels` guards expressible from the fixed-layout prefix:
#: signature, 13-byte IHDR chunk, 8-bit depth, known color type,
#: non-interlaced, non-zero dims (zlib-stream integrity is the one
#: check SQL cannot make; see module docstring)
_PNG_OK = (
    "nb >= 33 AND substr(hx, 1, 16) = '89504E470D0A1A0A' "
    f"AND {_hx_be(8, 4)} = 13 "
    "AND substr(hx, 25, 8) = '49484452' "  # 'IHDR'
    f"AND {_hx_be(24, 1)} = 8 "  # bit depth
    f"AND {_hx_be(25, 1)} IN (0, 2, 4, 6) "  # color type
    f"AND {_hx_be(28, 1)} = 0 "  # interlace
    f"AND {_hx_be(16, 4)} > 0 AND {_hx_be(20, 4)} > 0"
)

_GIF_W = _hx_le(6, 2)
_GIF_H = _hx_le(8, 2)
#: header-only guards, mirrored EXACTLY by `gif.gif_structure` (and
#: by the dims gate of `_gif_pixels`' profile): GIF87a/89a magic,
#: nonzero logical-screen dims, global color table present.  Reads
#: nothing past byte 12 — see the entropy-boundary note in the module
#: docstring (the LZW stream is GIF's zlib/Huffman analogue).
_GIF_OK = (
    "nb >= 13 AND substr(hx, 1, 8) = '47494638' "
    "AND substr(hx, 9, 4) IN ('3761', '3961') "
    f"AND ({_hx_le(10, 1)} & 128) = 128 "
    f"AND {_GIF_W} > 0 AND {_GIF_H} > 0"
)

#: stdlib-`wave` canonical layout: RIFF/WAVE, fmt chunk at 12, data
#: chunk at 36 — the layout `wave.open` itself writes and the only
#: one it reads without seeking (matches `wav_features`' input space)
_Y4M_OK = "substr(hx, 1, 20) = '595556344D5045473220'"  # 'YUV4MPEG2 '


def _try_byte(off: str) -> str:
    """DuckDB expr: unsigned byte at DYNAMIC byte offset ``off``
    (0-based expression over walk state).  TRY_CAST, not CAST: a read
    past the payload end yields NULL (which terminates a recursive
    walk) instead of a conversion error on the empty substring."""
    return f"TRY_CAST('0x' || substr(hx, 2*({off}) + 1, 2) AS BIGINT)"


def _try_be(off: str, nbytes: int) -> str:
    """Big-endian unsigned int at dynamic byte offset; NULL past EOF."""
    return (
        "("
        + " + ".join(
            f"TRY_CAST('0x' || substr(hx, 2*({off}) + {2 * i + 1}, 2) "
            f"AS BIGINT) * {256 ** (nbytes - 1 - i)}"
            for i in range(nbytes)
        )
        + ")"
    )


def _sql_list(vals) -> str:
    return "[" + ", ".join(str(v) for v in vals) + "]"


def _wav_pcm_ctes() -> str:
    """Byte-math twin of `wav_features` for canonical PCM WAVs
    (round 6, late): RIFF/WAVE with fmt at 12 and data at 36,
    wFormatTag = 1, sample width (bits+7)//8 in {1, 2, 4}.  Mirrors
    the stdlib `wave` arithmetic exactly — frame count from the DATA
    chunk size over nch*(width) (NOT the nBlockAlign field, which
    `wave` ignores), the declared data chunk required to be fully
    present (`wave` raises on a truncated read, so those rows go to
    replay), trailing junk past the declared size ignored via the
    LEAST clamp — and evaluates the SAME canonical float
    expression as the refactored `wav_features`
    (sqrt(ss/n)/full_scale*255, half-up), over an exact-int64 sum of
    squares, so 8/16-bit rms_q8 is bit-identical by construction —
    while ss < 2^53: past that (minutes of full-scale 16-bit PCM)
    DuckDB's HUGEINT-sum→double cast vs Python's correctly-rounded
    int/int division can differ by 1 ulp at an exact half-up boundary
    (see the matching bound note in `codecs.wav_features`); fixture
    payloads sit orders of magnitude under it.
    32-bit PCM squares overflow the exact-int path on BOTH sides, so
    those rows (rms_sql = false) and every non-canonical layout fall
    back to the replay relation — the honest boundary, documented in
    the module docstring."""
    wb = f"(({_hx_le(34, 2)} + 7) // 8)"
    b8 = _try_byte("44 + k.k")
    u16 = f"({_try_byte('44 + 2*k.k')} + 256 * {_try_byte('45 + 2*k.k')})"
    return f"""
wcan AS (
  SELECT media_id, hx, nb,
         {_hx_le(22, 2)} AS nch, {wb} AS wb,
         {_hx_le(24, 4)} AS rate, {_hx_le(40, 4)} AS dsz
  FROM f
  WHERE mime = 'audio/wav' AND nb >= 44
    AND substr(hx, 1, 8) = '52494646'
    AND substr(hx, 17, 8) = '57415645'
    AND substr(hx, 25, 8) = '666D7420'
    AND substr(hx, 73, 8) = '64617461'
    AND {_hx_le(20, 2)} = 1
    AND {_hx_le(22, 2)} > 0 AND {_hx_le(24, 4)} > 0
    AND nb >= 44 + {_hx_le(40, 4)}),
wfrm AS (
  SELECT media_id, hx, nch, wb, rate,
         dsz // (nch * wb) AS hdr_frames,
         LEAST(dsz, nb - 44) // (nch * wb) AS use_frames
  FROM wcan WHERE wb IN (1, 2, 4)),
wss AS (
  SELECT media_id, SUM(sv * sv) AS ss
  FROM (
    SELECT w.media_id,
           CASE WHEN w.wb = 1 THEN {b8} - 128
                ELSE CASE WHEN {u16} >= 32768 THEN {u16} - 65536
                     ELSE {u16} END END AS sv
    FROM wfrm w, UNNEST(range(0, w.use_frames * w.nch)) k(k)
    WHERE w.wb IN (1, 2)) s
  GROUP BY media_id),
wmeta AS (
  SELECT w.media_id,
         (w.hdr_frames * 1000) // w.rate AS duration_ms,
         CASE WHEN w.wb IN (1, 2) THEN
           CASE WHEN w.use_frames * w.nch = 0 THEN 0
                ELSE LEAST(255, CAST(FLOOR(
                  sqrt(s.ss / CAST(w.use_frames * w.nch AS DOUBLE))
                  / (CASE WHEN w.wb = 1 THEN 128.0 ELSE 32768.0 END)
                  * 255.0 + 0.5) AS BIGINT)) END
         END AS rms_q8,
         w.wb IN (1, 2) AS rms_sql
  FROM wfrm w LEFT JOIN wss s ON w.media_id = s.media_id)
"""


def _y4m_static_ctes() -> str:
    """Byte-math twin of `y4m_motion` for STATIC-LAYOUT yuv4mpeg2
    streams (round 6, late): ASCII header parsed from the decoded
    first line (W/H numeric tokens, C token must be C420*), then
    frames assumed at nl+1 + i*(6+fsize) behind param-less
    ``FRAME\\n`` markers — checked BYTE-ALIGNED at every expected
    position, which retires the old nibble-blind marker count and its
    caveats.  ``static_ok`` requires the total count of byte-aligned
    5-byte ``FRAME`` markers anywhere in the payload to equal the
    consecutive verified prefix, so param-bearing frame headers,
    marker bytes inside varied frame bodies, or a marker-bearing
    truncated tail all disqualify the static model and fall back to
    the replay relation (which replays the Python walk — always
    right, never independent).  For static_ok rows n_frames and the
    motion profile are EXACT integer arithmetic end to end (the
    half-up rational quantizer of the refactored `y4m_motion`) — no
    float step at all."""
    return f"""
yv AS (
  SELECT media_id, hx, nb,
         (SELECT MIN(i) FROM UNNEST(range(0, nb)) t(i)
          WHERE substr(hx, 2*i + 1, 2) = '0A') AS nl
  FROM f WHERE mime = 'video/y4m' AND {_Y4M_OK}),
yhdr AS (
  SELECT media_id, hx, nb, nl,
         (SELECT string_agg(chr(CAST('0x' || substr(hx, 2*i + 1, 2)
                                     AS INT)), '' ORDER BY i)
          FROM UNNEST(range(0, nl)) t(i)) || ' ' AS padded
  FROM yv WHERE nl IS NOT NULL),
ydim AS (
  SELECT media_id, hx, nb, nl,
         TRY_CAST(regexp_extract(padded, ' W([0-9]+) ', 1) AS BIGINT)
           AS w,
         TRY_CAST(regexp_extract(padded, ' H([0-9]+) ', 1) AS BIGINT)
           AS h,
         regexp_extract(padded, ' (C[^ ]*) ', 1) AS ctok
  FROM yhdr),
yok AS (
  SELECT media_id, hx, nb, nl, w, h,
         w * h + 2 * ((w // 2) * (h // 2)) AS fsize
  FROM ydim
  WHERE w > 0 AND h > 0 AND w % 2 = 0 AND h % 2 = 0
    AND (ctok = '' OR ctok LIKE 'C420%')),
ypfx AS (
  SELECT media_id, hx, nb, nl, w, h, fsize,
         COALESCE((SELECT MIN(i) FROM UNNEST(range(0, cand)) t(i)
                   WHERE substr(hx, 2*(nl + 1 + i*(6 + fsize)) + 1, 12)
                         <> '4652414D450A'), cand) AS m,
         (SELECT COUNT(*) FROM UNNEST(range(0, nb - 4)) t(i)
          WHERE substr(hx, 2*i + 1, 10) = '4652414D45') AS cnt_any
  FROM (SELECT *, (nb - nl - 1) // (6 + fsize) AS cand FROM yok) c),
yad AS (
  SELECT p.media_id, i.i AS pair_i,
         SUM(ABS(
           {_try_byte('p.nl + 1 + i.i*(6 + p.fsize) + 6 + k.k')}
           - {_try_byte('p.nl + 1 + (i.i - 1)*(6 + p.fsize) + 6 + k.k')}
         )) AS ad
  FROM ypfx p, UNNEST(range(1, p.m)) i(i), UNNEST(range(0, p.w * p.h)) k(k)
  WHERE p.cnt_any = p.m AND p.m >= 2
  GROUP BY p.media_id, i.i),
ymot AS (
  SELECT a.media_id,
         LEAST(255, (2 * SUM(a.ad) + p.w * p.h * (p.m - 1))
                    // (2 * p.w * p.h * (p.m - 1))) AS motion_q8
  FROM yad a JOIN ypfx p ON a.media_id = p.media_id
  GROUP BY a.media_id, p.w, p.h, p.m),
ystat AS (
  SELECT p.media_id, (p.cnt_any = p.m) AS static_ok, p.m,
         CASE WHEN p.m = 0 THEN NULL
              WHEN p.m = 1 THEN 0
              ELSE mo.motion_q8 END AS motion_q8
  FROM ypfx p LEFT JOIN ymot mo ON p.media_id = mo.media_id)
"""


VIDEO_STRUCTURE_SCHEMA = (
    "media_id long, width int, height int, fps_num int, fps_den int"
)


def _video_structure(mime: str, payload: bytes) -> dict:
    from ..operators import codecs

    null = {
        "width": None,
        "height": None,
        "fps_num": None,
        "fps_den": None,
    }
    if payload is None:
        return null
    if mime == "video/mp4":
        m = codecs.mp4_metadata(bytes(payload))
        return {**null, "width": m["width"], "height": m["height"]}
    return codecs.y4m_structure(bytes(payload))


def q_video_structure(spark, sf_dir):
    """Structural video profile — completes the round-7 replay-free
    structure trio (image/audio/video): Y4M (width, height, fps_num,
    fps_den) from the stream header via the SAME regex semantics on
    both sides, MP4 (width, height) from the first trak's tkhd 16.16
    fixed-point dims via a grandchild extension of the ISO-BMFF box
    walk.  NO replay relation anywhere."""
    media = spark.read.parquet(_media_path(sf_dir)).where("kind = 'video'")

    def _batches(it: Iterator) -> Iterator:
        from ..operators.multimodal import records_to_frame

        for pdf in it:
            yield records_to_frame(
                [
                    _video_structure(m, p)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ],
                {"media_id": pdf["media_id"]},
            )

    return (
        media.select("media_id", "mime", "payload")
        .mapInPandas(_batches, VIDEO_STRUCTURE_SCHEMA)
        .orderBy("media_id")
    )


def _mp4_trak_dims_ctes() -> str:
    """Grandchild extension of `_mp4_walk_ctes`: walk each trak box's
    children and surface the FIRST (trak order, then box order) tkhd
    with nonzero 16.16 pixel dims — `mp4_metadata`'s selection rule
    verbatim."""

    def _gstep() -> str:
        return f"""
  FROM (
    SELECT *, CASE WHEN raw = 1 THEN {_try_be("pos + 8", 8)}
                   WHEN raw = 0 THEN scope - pos
                   ELSE raw END AS sz,
              CASE WHEN raw = 1 THEN 16 ELSE 8 END AS hdr
    FROM (SELECT *, {_try_be("pos", 4)} AS raw FROM __SRC__) x) y
  WHERE pos + 8 <= scope AND sz >= hdr AND pos + sz <= scope"""

    gkid = _gstep().replace("__SRC__", "vgkid")
    tw = f"({_try_be('pos + sz - 8', 4)} >> 16)"
    th = f"({_try_be('pos + sz - 4', 4)} >> 16)"
    return f"""
vgkid AS (
  SELECT media_id, hx, nb, pos + hdr AS pos, pos + sz AS scope,
         pos AS trak_pos
  FROM vkbox WHERE btype = '7472616B'
  UNION ALL
  SELECT media_id, hx, nb, pos + sz, scope, trak_pos {gkid}
),
vgbox AS (
  SELECT media_id, pos, sz, trak_pos, {tw} AS tw, {th} AS th
  FROM (
    SELECT media_id, hx, nb, pos, sz, hdr, scope, trak_pos,
           substr(hx, 2*pos + 9, 8) AS btype {gkid}) g
  WHERE btype = '746B6864'
),
vdims AS (
  -- (trak order, then box order) as one scalar key: positions are
  -- byte offsets < 2^32, so trak_pos*2^32 + pos orders exactly
  SELECT media_id,
         min_by({{'w': tw, 'h': th}},
                trak_pos * 4294967296 + pos)
           FILTER (WHERE tw > 0 AND th > 0) AS d
  FROM vgbox GROUP BY media_id
)"""


def _oracle_video_structure() -> str:
    return f"""
WITH RECURSIVE f AS (
  SELECT media_id, mime, hex(payload) AS hx,
         octet_length(payload) AS nb
  FROM '{FIXTURE}' WHERE kind = 'video'),
{_y4m_struct_ctes()},
{_mp4_walk_ctes()},
{_mp4_trak_dims_ctes()}
SELECT f.media_id,
       CAST(CASE WHEN f.mime = 'video/mp4' THEN v.d.w
                 ELSE y.w END AS INTEGER) AS width,
       CAST(CASE WHEN f.mime = 'video/mp4' THEN v.d.h
                 ELSE y.h END AS INTEGER) AS height,
       CAST(CASE WHEN f.mime = 'video/mp4' THEN NULL
                 ELSE y.fn END AS INTEGER) AS fps_num,
       CAST(CASE WHEN f.mime = 'video/mp4' THEN NULL
                 ELSE y.fd END AS INTEGER) AS fps_den
FROM f
LEFT JOIN vdims v ON f.media_id = v.media_id
LEFT JOIN ystr y ON f.media_id = y.media_id
ORDER BY f.media_id
"""


def _y4m_struct_ctes() -> str:
    """Header-only Y4M fields: W/H under the yok guards plus the F
    fps token — the same regex semantics `codecs.y4m_structure`
    applies to the latin-1-decoded header."""
    return f"""
syv AS (
  SELECT media_id, hx, nb,
         (SELECT MIN(i) FROM UNNEST(range(0, nb)) t(i)
          WHERE substr(hx, 2*i + 1, 2) = '0A') AS nl
  FROM f WHERE mime = 'video/y4m' AND {_Y4M_OK}),
syhdr AS (
  SELECT media_id,
         (SELECT string_agg(chr(CAST('0x' || substr(hx, 2*i + 1, 2)
                                     AS INT)), '' ORDER BY i)
          FROM UNNEST(range(0, nl)) t(i)) || ' ' AS padded
  FROM syv WHERE nl IS NOT NULL),
sydim AS (
  SELECT media_id,
         TRY_CAST(regexp_extract(padded, ' W([0-9]+) ', 1) AS BIGINT)
           AS w,
         TRY_CAST(regexp_extract(padded, ' H([0-9]+) ', 1) AS BIGINT)
           AS h,
         regexp_extract(padded, ' (C[^ ]*) ', 1) AS ctok,
         TRY_CAST(regexp_extract(padded, ' F([0-9]+):([0-9]+) ', 1)
                  AS BIGINT) AS fn,
         TRY_CAST(regexp_extract(padded, ' F([0-9]+):([0-9]+) ', 2)
                  AS BIGINT) AS fd
  FROM syhdr),
ystr AS (
  SELECT media_id, w, h, fn, fd
  FROM sydim
  WHERE w > 0 AND h > 0 AND w % 2 = 0 AND h % 2 = 0
    AND (ctok = '' OR ctok LIKE 'C420%'))
"""


def _mp3_id3_skip() -> str:
    """First-frame offset: the ID3v2 skip (syncsafe 28-bit size +
    v2.4 footer), static offsets guarded by the nb/magic CASE arms —
    shared by the duration walk and the audio_structure oracle."""
    return (
        "CASE WHEN nb >= 10 AND substr(hx, 1, 6) = '494433' THEN "
        f"10 + ({_hx_be(6, 1)} & 127) * 2097152 "
        f"+ ({_hx_be(7, 1)} & 127) * 16384 "
        f"+ ({_hx_be(8, 1)} & 127) * 128 + ({_hx_be(9, 1)} & 127) "
        f"+ CASE WHEN {_hx_be(3, 1)} >= 4 "
        f"AND ({_hx_be(5, 1)} & 16) = 16 THEN 10 ELSE 0 END "
        "ELSE 0 END"
    )


def _mp3_walk_ctes() -> str:
    """Recursive-CTE MPEG-audio frame-header walk — the byte-math
    twin of `codecs._mp3_frame` + the `mp3_metadata` duration loop,
    fully independent of the Python decoder.  Spec constants
    (ISO 11172-3 bitrate/samplerate index tables) are inlined as SQL
    list literals; every dynamic byte read is a TRY_CAST so running
    past EOF (or an invalid index) yields NULL and cleanly ends the
    walk, mirroring the Python walk's break conditions."""
    from ..operators.codecs import (
        _MP3_BITRATES_V1,
        _MP3_BITRATES_V2,
        _MP3_RATES,
    )

    b0, b1, b2 = _try_byte("pos"), _try_byte("pos + 1"), _try_byte("pos + 2")
    ver = f"(({b1} >> 3) & 3)"
    layer = f"(4 - (({b1} >> 1) & 3))"
    br_idx = f"(({b2} >> 4) & 15)"
    sr_idx = f"(({b2} >> 2) & 3)"
    pad = f"(({b2} >> 1) & 1)"

    # kbps/rate templates use unambiguous __VR__/__LYR__/__BRI__/
    # __SRI__ placeholders (NOT the bare alias names vr/lyr/bri/sri):
    # they are substituted below with full bit-extraction expressions,
    # and a plain .replace('bri', ...) would silently corrupt the SQL
    # the moment any substituted expression or future alias contained
    # that letter sequence (round-7 ADVICE).
    def _kbps(table):
        return (
            "CASE __LYR__"
            + "".join(
                f" WHEN {y} THEN ({_sql_list(table[y])})[__BRI__ + 1]"
                for y in (1, 2, 3)
            )
            + " END"
        )

    kbps = (
        f"CASE WHEN __VR__ = 3 THEN {_kbps(_MP3_BITRATES_V1)} "
        f"ELSE {_kbps(_MP3_BITRATES_V2)} END"
    )
    rate = (
        "CASE __VR__"
        + "".join(
            f" WHEN {v} THEN ({_sql_list(_MP3_RATES[v])})[__SRI__ + 1]"
            for v in (3, 2, 0)
        )
        + " END"
    )
    id3 = _mp3_id3_skip()
    return f"""
mw AS (
  SELECT media_id, hx, nb, CAST({id3} AS BIGINT) AS pos,
         CAST(0 AS BIGINT) AS n_frames, CAST(0 AS BIGINT) AS tot_samples,
         CAST(NULL AS BIGINT) AS rate
  FROM f WHERE mime = 'audio/mpeg'
  UNION ALL
  SELECT media_id, hx, nb, pos + flen, n_frames + 1,
         tot_samples + samples, coalesce(rate, r)
  FROM (
    SELECT media_id, hx, nb, pos, n_frames, tot_samples, rate,
           CASE lyr
             WHEN 1 THEN (12 * kb * 1000 // r + pd) * 4
             WHEN 2 THEN 144 * kb * 1000 // r + pd
             ELSE (CASE WHEN vr = 3 THEN 144 ELSE 72 END)
                  * kb * 1000 // r + pd
           END AS flen,
           CASE lyr WHEN 1 THEN 384 WHEN 2 THEN 1152
                ELSE CASE WHEN vr = 3 THEN 1152 ELSE 576 END
           END AS samples,
           r,
           (pos + 4 <= nb AND hd0 = 255 AND (hd1 & 224) = 224
            AND vr <> 1 AND lyr <> 4
            AND bri NOT IN (0, 15) AND sri <> 3) AS ok
    FROM (
      SELECT media_id, hx, nb, pos, n_frames, tot_samples, rate,
             {b0} AS hd0, {b1} AS hd1,
             {ver} AS vr, {layer} AS lyr,
             {br_idx} AS bri, {sr_idx} AS sri, {pad} AS pd,
             {kbps.replace('__VR__', ver).replace('__LYR__', layer)
                  .replace('__BRI__', br_idx)} AS kb,
             {rate.replace('__VR__', ver).replace('__SRI__', sr_idx)} AS r
      FROM mw) fields) step
  WHERE ok AND (rate IS NULL OR r = rate) AND flen >= 4
),
mdur AS (
  SELECT media_id,
         CASE WHEN max(n_frames) > 0
              THEN max_by(tot_samples, n_frames) * 1000
                   // max_by(rate, n_frames) END AS duration_ms
  FROM mw GROUP BY media_id
)"""


def _mp4_walk_ctes() -> str:
    """Recursive-CTE ISO-BMFF box walk — the byte-math twin of
    `codecs._iter_boxes` + the `mp4_metadata` moov scan: top-level
    boxes first, then the children of every moov box, with the same
    size semantics (size==1 -> 64-bit largesize, size==0 -> to end of
    enclosing scope, malformed length stops the walk) and the same
    null contract (no moov -> n_tracks NULL; mvhd with timescale 0
    does not set a duration)."""

    def _step(scope_end: str) -> str:
        # one box step: compute (sz, hdr) at pos, valid per _iter_boxes
        return f"""
  FROM (
    SELECT *, CASE WHEN raw = 1 THEN {_try_be("pos + 8", 8)}
                   WHEN raw = 0 THEN {scope_end} - pos
                   ELSE raw END AS sz,
              CASE WHEN raw = 1 THEN 16 ELSE 8 END AS hdr
    FROM (SELECT *, {_try_be("pos", 4)} AS raw FROM __SRC__) x) y
  WHERE pos + 8 <= {scope_end} AND sz >= hdr AND pos + sz <= {scope_end}"""

    top_step = _step("nb").replace("__SRC__", "vtop")
    kid_step = _step("scope").replace("__SRC__", "vkid")
    i0 = "(pos + hdr)"  # box body start
    ver = _try_byte(i0)
    ts0 = _try_be(f"{i0} + 12", 4)
    dur0 = _try_be(f"{i0} + 16", 4)
    ts1 = _try_be(f"{i0} + 20", 4)
    dur1 = _try_be(f"{i0} + 24", 8)
    return f"""
vtop AS (
  SELECT media_id, hx, nb, CAST(0 AS BIGINT) AS pos
  FROM f WHERE mime = 'video/mp4'
  UNION ALL
  SELECT media_id, hx, nb, pos + sz {top_step}
),
vbox AS (
  SELECT media_id, hx, nb, pos, sz, hdr,
         substr(hx, 2*pos + 9, 8) AS btype {top_step}
),
vkid AS (
  SELECT media_id, hx, nb, pos + hdr AS pos, pos + sz AS scope
  FROM vbox WHERE btype = '6D6F6F76'
  UNION ALL
  SELECT media_id, hx, nb, pos + sz, scope {kid_step}
),
vkbox AS (
  SELECT media_id, hx, nb, pos, sz, hdr, scope,
         substr(hx, 2*pos + 9, 8) AS btype {kid_step}
),
vmeta AS (
  -- anchored on moov PRESENCE, not child validity: a moov whose
  -- children are malformed still counts as saw_moov (n_tracks 0),
  -- matching mp4_metadata's walk-stops-cleanly contract
  SELECT mv.media_id, a.duration_ms,
         CAST(coalesce(a.traks, 0) AS INTEGER) AS n_tracks
  FROM (SELECT DISTINCT media_id FROM vbox
        WHERE btype = '6D6F6F76') mv
  LEFT JOIN (
    SELECT b.media_id,
           max_by(CASE WHEN {ver} = 1
                       THEN CASE WHEN {ts1} > 0
                                 THEN {dur1} * 1000 // {ts1} END
                       ELSE CASE WHEN {ts0} > 0
                                 THEN {dur0} * 1000 // {ts0} END
                  END, b.pos) FILTER (WHERE
                    b.btype = '6D766864' AND
                    CASE WHEN {ver} = 1 THEN {ts1} > 0
                         ELSE {ts0} > 0 END
                  ) AS duration_ms,
           SUM(CASE WHEN b.btype = '7472616B' THEN 1 ELSE 0 END)
             AS traks
    FROM vkbox b GROUP BY b.media_id) a USING (media_id)
)"""


def _replay_values(kind: str, decode, cols: list[str]) -> str:
    """The non-SQL-decodable columns as a VALUES relation replayed by
    the pure-Python codecs (pyarrow read, no Spark)."""
    rows = [
        {"media_id": mid, **decode(mime, payload)}
        for mid, k, mime, payload in _fixture_rows()
        if k == kind
    ]
    body = ",\n  ".join(
        "(" + ", ".join(_sql_lit(r[c]) for c in cols) + ")" for r in rows
    )
    return f"(VALUES\n  {body}\n) AS r({', '.join(cols)})"


def _jpeg_walk_ctes() -> str:
    """Recursive-CTE JPEG marker-segment walk — the byte-math twin of
    `jpeg.jpeg_decode_pixels`'s STRUCTURAL phase, fully independent of
    the Python decoder.  Mirrored exactly: SOI required; every segment
    must be FF-synced; standalone markers (TEM, RST0-7) skip 2 bytes;
    EOI before SOS kills the row (no scan data -> Python returns
    None); any non-baseline frame marker (SOF1-15 except DHT) kills
    the row; SOF0 captures height/width ONLY under the decoder's
    profile guards (1 or 3 components, all 0x11-sampled, nonzero
    dims); dims are emitted only when a SOS marker is also reached.
    Every dynamic read is a TRY_CAST, so truncation mid-segment
    yields NULL and kills the row exactly where the Python walk's
    IndexError does.  Documented blind spots (same class as the PNG
    IDAT caveat in the module docstring): 16-bit DQT tables and
    entropy-stream integrity are not SQL-checkable — a payload
    structurally valid through SOS but with corrupt scan data would
    diverge; no such row exists in the committed fixture."""
    b0, b1 = _try_byte("pos"), _try_byte("pos + 1")
    ln = _try_be("pos + 2", 2)
    pp = _try_byte("pos + 4")
    hh, ww = _try_be("pos + 5", 2), _try_be("pos + 7", 2)
    nc = _try_byte("pos + 9")
    s1, s2, s3 = (
        _try_byte("pos + 11"),
        _try_byte("pos + 14"),
        _try_byte("pos + 17"),
    )
    standalone = "(1, 208, 209, 210, 211, 212, 213, 214, 215)"
    non_baseline = "(193, 194, 195, 197, 198, 199, 201, 202, 203, 205, 206, 207)"
    return f"""
jw AS (
  SELECT media_id, hx, nb, CAST(2 AS BIGINT) AS pos,
         CAST(NULL AS BIGINT) AS sofh, CAST(NULL AS BIGINT) AS sofw,
         CAST(NULL AS BIGINT) AS sofp, CAST(NULL AS BIGINT) AS sofn,
         FALSE AS sos
  FROM f
  WHERE mime = 'image/jpeg' AND nb >= 2 AND substr(hx, 1, 4) = 'FFD8'
  UNION ALL
  SELECT media_id, hx, nb,
         CASE WHEN b1 IN {standalone} THEN pos + 2
              WHEN b1 = 218 THEN pos
              ELSE pos + 2 + ln END AS pos,
         CASE WHEN b1 = 192 THEN hh ELSE sofh END AS sofh,
         CASE WHEN b1 = 192 THEN ww ELSE sofw END AS sofw,
         CASE WHEN b1 = 192 THEN pp ELSE sofp END AS sofp,
         CASE WHEN b1 = 192 THEN nc ELSE sofn END AS sofn,
         (b1 = 218) AS sos
  FROM (
    SELECT media_id, hx, nb, pos, sofh, sofw, sofp, sofn,
           {b0} AS b0, {b1} AS b1, {ln} AS ln, {pp} AS pp,
           {hh} AS hh, {ww} AS ww, {nc} AS nc,
           {s1} AS s1, {s2} AS s2, {s3} AS s3
    FROM jw WHERE NOT sos) s
  WHERE b0 = 255 AND b1 IS NOT NULL
    AND b1 <> 217
    AND b1 NOT IN {non_baseline}
    AND (b1 IN {standalone} OR ln IS NOT NULL)
    AND (b1 <> 192 OR (hh > 0 AND ww > 0 AND
         ((nc = 1 AND s1 = 17) OR
          (nc = 3 AND s1 = 17 AND s2 = 17 AND s3 = 17))))
),
jmeta AS (
  SELECT media_id, sofh AS jh, sofw AS jw_, sofp AS jp, sofn AS jn
  FROM jw WHERE sos AND sofh IS NOT NULL)
"""


def _oracle_image_stats() -> str:
    rep = _replay_values("image", _image_decode, ["media_id", "feature_hash"])
    return f"""
WITH RECURSIVE f AS (
  SELECT media_id, mime, hex(payload) AS hx,
         octet_length(payload) AS nb
  FROM '{FIXTURE}' WHERE kind = 'image'),
{_jpeg_walk_ctes()}
SELECT f.media_id,
       CAST(CASE WHEN f.mime = 'image/bmp'
                 THEN CASE WHEN {_BMP_OK} THEN {_BMP_W} END
                 WHEN f.mime = 'image/png'
                 THEN CASE WHEN {_PNG_OK} THEN {_hx_be(16, 4)} END
                 WHEN f.mime = 'image/gif'
                 THEN CASE WHEN {_GIF_OK} THEN {_GIF_W} END
                 ELSE j.jw_ END AS INTEGER) AS width,
       CAST(CASE WHEN f.mime = 'image/bmp'
                 THEN CASE WHEN {_BMP_OK} THEN abs({_BMP_H_RAW}) END
                 WHEN f.mime = 'image/png'
                 THEN CASE WHEN {_PNG_OK} THEN {_hx_be(20, 4)} END
                 WHEN f.mime = 'image/gif'
                 THEN CASE WHEN {_GIF_OK} THEN {_GIF_H} END
                 ELSE j.jh END AS INTEGER) AS height,
       CAST(r.feature_hash AS BIGINT) AS feature_hash
FROM f
LEFT JOIN jmeta j ON f.media_id = j.media_id
LEFT JOIN {rep} ON f.media_id = r.media_id
ORDER BY f.media_id
"""


def _oracle_audio_stats() -> str:
    rep = _replay_values(
        "audio", _audio_decode, ["media_id", "duration_ms", "rms_q8"]
    )
    return f"""
WITH RECURSIVE f AS (
  SELECT media_id, mime, hex(payload) AS hx,
         octet_length(payload) AS nb
  FROM '{FIXTURE}' WHERE kind = 'audio'),
{_wav_pcm_ctes()},
{_mp3_walk_ctes()}
SELECT f.media_id,
       CAST(CASE WHEN f.mime = 'audio/wav'
                 THEN CASE WHEN wm.media_id IS NOT NULL
                           THEN wm.duration_ms
                           ELSE r.duration_ms END
                 WHEN f.mime = 'audio/mpeg' THEN m.duration_ms
                 ELSE r.duration_ms END AS INTEGER) AS duration_ms,
       CAST(CASE WHEN f.mime = 'audio/wav' AND wm.rms_sql
                 THEN wm.rms_q8
                 ELSE r.rms_q8 END AS INTEGER) AS rms_q8
FROM f
LEFT JOIN wmeta wm ON f.media_id = wm.media_id
LEFT JOIN mdur m ON f.media_id = m.media_id
LEFT JOIN {rep} ON f.media_id = r.media_id
ORDER BY f.media_id
"""


def _oracle_video_stats() -> str:
    # replay only the genuinely non-SQL columns: frame count for
    # non-y4m rows (always null) and the decoded motion profile;
    # duration/track count now come from the vmeta box walk
    rep = _replay_values(
        "video", _video_decode, ["media_id", "n_frames", "motion_q8"]
    )
    return f"""
WITH RECURSIVE f AS (
  SELECT media_id, mime, hex(payload) AS hx,
         octet_length(payload) AS nb
  FROM '{FIXTURE}' WHERE kind = 'video'),
{_y4m_static_ctes()},
{_mp4_walk_ctes()}
SELECT f.media_id,
       CAST(CASE WHEN f.mime = 'video/y4m' AND ys.static_ok
                 THEN ys.m
                 ELSE r.n_frames END AS INTEGER) AS n_frames,
       CAST(CASE WHEN f.mime = 'video/y4m' AND ys.static_ok
                 THEN ys.motion_q8
                 ELSE r.motion_q8 END AS INTEGER) AS motion_q8,
       CAST(CASE WHEN f.mime = 'video/mp4' THEN v.duration_ms
            END AS BIGINT) AS duration_ms,
       CAST(CASE WHEN f.mime = 'video/mp4' THEN v.n_tracks
            END AS INTEGER) AS n_tracks
FROM f
LEFT JOIN ystat ys ON f.media_id = ys.media_id
LEFT JOIN vmeta v ON f.media_id = v.media_id
LEFT JOIN {rep} ON f.media_id = r.media_id
ORDER BY f.media_id
"""


SQL_MEDIA_MANIFEST = f"""
SELECT kind, COUNT(*) AS n,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       -- '||' not concat(): DuckDB's concat IGNORES a NULL argument,
       -- so a NULL payload would yield the unparseable literal '0x'
       CAST(SUM(CAST('0x' || substr(md5(hex(payload)), 1, 15)
                     AS BIGINT) % 1000000) AS BIGINT) AS fingerprint
FROM '{FIXTURE}'
GROUP BY kind
ORDER BY kind
"""


THUMB_W, THUMB_H = 16, 12


def q_media_thumbnails(spark, sf_dir):
    """Thumbnail generation over the image rows (round 6): resize
    every decodable payload to {THUMB_W}x{THUMB_H} with the
    signature-dispatched real codecs (nearest-neighbor, re-encoded in
    the source container), then RE-DECODE the thumbnail inside the
    same batch to report its actual dimensions — so the driver row
    verifies the full resize->encode->decode chain, not just that
    bytes came back.  Undecodable/garbage payloads yield null rows.

    Oracle honesty: ``out_w``/``out_h`` are INDEPENDENT expectations
    (the resizers produce exactly the target dims for any decodable
    source, so the oracle derives decodability from header byte math
    — BMP/PNG guards plus, since late round 6, the recursive-CTE JPEG
    marker walk — and predicts the constants); ``n_bytes_out`` and
    ``thumb_md5`` are replayed by the same pure-Python chain (encoder
    output bytes aren't SQL-derivable).  Scale plan: map-only over the media scan, payloads
    cross as Arrow batches, one decode+encode per payload.
    """
    media = spark.read.parquet(_media_path(sf_dir)).where(
        "kind = 'image'"
    )

    def _batches(it: Iterator) -> Iterator:
        from ..operators.multimodal import records_to_frame

        for pdf in it:
            yield records_to_frame(
                [
                    _thumb_replay(m, p)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ],
                {"media_id": pdf["media_id"]},
            )

    return (
        media.select("media_id", "mime", "payload")
        .mapInPandas(
            _batches,
            "media_id long, out_w int, out_h int, n_bytes_out int, "
            "thumb_md5 string",
        )
        .orderBy("media_id")
    )


def _thumb_replay(mime: str, payload: bytes) -> dict:
    """The resize->encode->decode chain, shared by the Spark batch
    loop and the oracle replay (pure Python, no Spark)."""
    import hashlib

    from ..operators.multimodal import auto_image_decode, auto_image_resize

    null = {
        "out_w": None,
        "out_h": None,
        "n_bytes_out": None,
        "thumb_md5": None,
    }
    if payload is None:
        return null
    rp = auto_image_resize(bytes(payload), THUMB_W, THUMB_H)
    if rp is None:
        return null
    d = auto_image_decode(rp)
    return {
        "out_w": d["width"],
        "out_h": d["height"],
        "n_bytes_out": len(rp),
        "thumb_md5": hashlib.md5(rp).hexdigest()[:16],
    }


def _oracle_media_thumbnails() -> str:
    rep = _replay_values(
        "image", _thumb_replay, ["media_id", "n_bytes_out", "thumb_md5"]
    )
    return f"""
WITH RECURSIVE f AS (
  SELECT media_id, mime, hex(payload) AS hx,
         octet_length(payload) AS nb
  FROM '{FIXTURE}' WHERE kind = 'image'),
{_jpeg_walk_ctes()}
SELECT f.media_id,
       CAST(CASE WHEN f.mime = 'image/bmp'
                 THEN CASE WHEN {_BMP_OK} THEN {THUMB_W} END
                 WHEN f.mime = 'image/png'
                 THEN CASE WHEN {_PNG_OK} THEN {THUMB_W} END
                 WHEN f.mime = 'image/gif'
                 THEN CASE WHEN {_GIF_OK} THEN {THUMB_W} END
                 WHEN j.media_id IS NOT NULL THEN {THUMB_W}
            END AS INTEGER) AS out_w,
       CAST(CASE WHEN f.mime = 'image/bmp'
                 THEN CASE WHEN {_BMP_OK} THEN {THUMB_H} END
                 WHEN f.mime = 'image/png'
                 THEN CASE WHEN {_PNG_OK} THEN {THUMB_H} END
                 WHEN f.mime = 'image/gif'
                 THEN CASE WHEN {_GIF_OK} THEN {THUMB_H} END
                 WHEN j.media_id IS NOT NULL THEN {THUMB_H}
            END AS INTEGER) AS out_h,
       CAST(r.n_bytes_out AS INTEGER) AS n_bytes_out,
       r.thumb_md5
FROM f
LEFT JOIN jmeta j ON f.media_id = j.media_id
LEFT JOIN {rep} ON f.media_id = r.media_id
ORDER BY f.media_id
"""


REGISTRY: dict[str, QuerySpec] = {
    "image_stats": QuerySpec(q_image_stats, _oracle_image_stats()),
    "image_structure": QuerySpec(
        q_image_structure, _oracle_image_structure()
    ),
    "audio_structure": QuerySpec(
        q_audio_structure, _oracle_audio_structure()
    ),
    "video_structure": QuerySpec(
        q_video_structure, _oracle_video_structure()
    ),
    "audio_stats": QuerySpec(q_audio_stats, _oracle_audio_stats()),
    "video_stats": QuerySpec(q_video_stats, _oracle_video_stats()),
    "media_manifest": QuerySpec(q_media_manifest, SQL_MEDIA_MANIFEST),
    "media_phash_pairs": QuerySpec(
        q_media_phash_pairs, _oracle_media_phash_pairs()
    ),
    "media_thumbnails": QuerySpec(
        q_media_thumbnails, _oracle_media_thumbnails()
    ),
}
