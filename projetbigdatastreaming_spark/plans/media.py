"""Driver-visible queries over the in-repo media fixture — the
correctness surface for the codec family (BMP/PNG/JPEG/WAV/Y4M/MP4).

Until round 4 the codecs were pytest-only: the driver's tables carry
no binary media, so decode plumbing had zero CORRECTNESS_r* signal.
The fixture (``fixtures/media.parquet``, built by
``tools/make_media_fixture.py`` from our own encoders, committed —
6.7 KB) closes that: these queries run the REAL decoders inside the
Arrow ``mapInPandas`` batch loop over a genuine parquet scan.

Honesty note on the oracles: DuckDB cannot decode images or audio, so
``image_stats`` / ``audio_stats`` / ``video_stats`` oracles are
literal relations REPLAYED at registration time by the same
pure-Python codecs reading the fixture with pyarrow (no Spark).  What
the driver cross-checks is therefore the entire Spark side of the
pipeline — parquet binary scan, kind/mime dispatch, Arrow batch
transfer, per-payload decode, schema — against a Spark-free
reference execution, not an independent decoder.  ``media_manifest``
IS fully engine-independent (both engines hash the raw payload bytes
themselves: md5 over hex, the established portable-hash idiom).

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

IMAGE_STATS_SCHEMA = (
    "media_id long, width int, height int, feature_hash long"
)
AUDIO_STATS_SCHEMA = "media_id long, duration_ms int, rms_q8 int"


def _audio_decode(mime: str, payload: bytes) -> dict:
    """WAV decodes fully (duration + RMS of the PCM samples); MPEG
    audio gets its exact header-walk duration with rms_q8 NULL (sample
    decompression is the module's one declared stub — the metadata is
    still real and exact)."""
    from ..operators.codecs import mp3_metadata, wav_features

    if payload is None:
        return {"duration_ms": None, "rms_q8": None}
    if mime == "audio/mpeg":
        m = mp3_metadata(bytes(payload))
        return {"duration_ms": m["duration_ms"], "rms_q8": None}
    return wav_features(bytes(payload))
VIDEO_STATS_SCHEMA = (
    "media_id long, n_frames int, motion_q8 int, duration_ms long, "
    "n_tracks int"
)


def _image_decode(mime: str, payload: bytes) -> dict:
    from ..operators import codecs, jpeg

    if payload is None:
        return {"width": None, "height": None, "feature_hash": None}
    if mime == "image/bmp":
        return codecs.bmp_decode(bytes(payload))
    if mime == "image/png":
        return codecs.png_decode(bytes(payload))
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
    media = spark.read.parquet(FIXTURE).where("kind = 'image'")

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


def q_audio_stats(spark, sf_dir):
    """Real audio metadata over the audio rows: stdlib-wave decode +
    numpy RMS for WAV, MPEG frame-header-walk duration for MP3."""
    media = spark.read.parquet(FIXTURE).where("kind = 'audio'")

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
    media = spark.read.parquet(FIXTURE).where("kind = 'video'")

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
    media = spark.read.parquet(FIXTURE)
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


def _values_oracle(rows: list[dict], cols: list[str], casts: dict) -> str:
    """Literal-relation oracle: the pure-Python replay's rows as a
    VALUES table with explicit per-column casts (so DuckDB's pandas
    dtypes match Spark's — the r03 representation lesson)."""
    body = ",\n  ".join(
        "(" + ", ".join(_sql_lit(r[c]) for c in cols) + ")" for r in rows
    )
    sel = ", ".join(f"CAST({c} AS {casts[c]}) AS {c}" for c in cols)
    return (
        f"SELECT {sel} FROM (VALUES\n  {body}\n) AS t({', '.join(cols)}) "
        f"ORDER BY media_id"
    )


def _oracle_image_stats() -> str:
    rows = [
        {"media_id": mid, **_image_decode(mime, payload)}
        for mid, kind, mime, payload in _fixture_rows()
        if kind == "image"
    ]
    return _values_oracle(
        rows,
        ["media_id", "width", "height", "feature_hash"],
        {
            "media_id": "BIGINT",
            "width": "INTEGER",
            "height": "INTEGER",
            "feature_hash": "BIGINT",
        },
    )


def _oracle_audio_stats() -> str:
    rows = [
        {"media_id": mid, **_audio_decode(mime, payload)}
        for mid, kind, mime, payload in _fixture_rows()
        if kind == "audio"
    ]
    return _values_oracle(
        rows,
        ["media_id", "duration_ms", "rms_q8"],
        {
            "media_id": "BIGINT",
            "duration_ms": "INTEGER",
            "rms_q8": "INTEGER",
        },
    )


def _oracle_video_stats() -> str:
    rows = [
        {"media_id": mid, **_video_decode(mime, payload)}
        for mid, kind, mime, payload in _fixture_rows()
        if kind == "video"
    ]
    return _values_oracle(
        rows,
        ["media_id", "n_frames", "motion_q8", "duration_ms", "n_tracks"],
        {
            "media_id": "BIGINT",
            "n_frames": "INTEGER",
            "motion_q8": "INTEGER",
            "duration_ms": "BIGINT",
            "n_tracks": "INTEGER",
        },
    )


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


REGISTRY: dict[str, QuerySpec] = {
    "image_stats": QuerySpec(q_image_stats, _oracle_image_stats()),
    "audio_stats": QuerySpec(q_audio_stats, _oracle_audio_stats()),
    "video_stats": QuerySpec(q_video_stats, _oracle_video_stats()),
    "media_manifest": QuerySpec(q_media_manifest, SQL_MEDIA_MANIFEST),
}
