"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas iterators
(mapInPandas) — the north-star multimodal plumbing.

The generic API (`decode_images` / `resize_images` /
`extract_audio_features` / `sample_video_frames`) dispatches to the
REAL in-repo codecs by payload signature (magic bytes, not the mime
column — robust to mislabeled rows): uncompressed 24-bit BMP and zlib
PNG decode/resize/encode in numpy, from-scratch baseline JPEG
(`operators/jpeg.py`), stdlib-``wave`` WAV + numpy RMS, MPEG audio
frame walk + Layer II subband decode (`operators/mpeg_audio.py`), and
Y4M frame extraction — each golden-file tested.  Unrecognized or
undecodable payloads yield null rows (never task failures);
``strict=True`` turns the *unsupported-format* case into
NotImplementedError so a pipeline can refuse rather than null-fill.
Codecs stay injectable for formats this container can't decode
(PIL/ffmpeg-class: H.264 frames, MP4 sample extraction); the old
hash-derived fakes survive only as explicit ``fake_*`` test doubles.

At 100 TB the shape matters more than the codec: binary payloads never
pass through Python row-at-a-time (Arrow batches only), metadata
columns stay in the JVM for filtering/partition pruning, and the
per-batch model keeps executor memory bounded by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def records_to_frame(records: list[dict], lead: dict):
    """Precision-safe pandas frame from per-payload codec records.

    ``pd.DataFrame([list of dicts])`` promotes an int column containing
    any None to float64 AT CONSTRUCTION — silently rounding values
    above 2^53 (a 60-bit feature_hash came back off by tens of units
    once a garbage payload put a null in the batch).  Build columns
    explicitly instead: integer columns (with or without nulls) use
    pandas' nullable Int64 extension dtype, which Arrow converts
    losslessly; everything else stays object/inferred.  ``lead`` holds
    pass-through columns (e.g. media_id) prepended as-is.
    """
    import numpy as np
    import pandas as pd

    keys = list(records[0].keys()) if records else []
    # strip any index off the lead columns: a pandas Series keeps its
    # caller's index and pd.DataFrame would ALIGN on it, silently
    # misaligning rows (or injecting NaN) if a caller ever passes a
    # sliced/filtered frame's column.  Arrow batches happen to carry a
    # fresh RangeIndex today; don't depend on it.
    out = {
        k: (
            v.reset_index(drop=True)
            if isinstance(v, pd.Series)
            else v
        )
        for k, v in lead.items()
    }
    for k in keys:
        vals = [r.get(k) for r in records]
        non_null = [v for v in vals if v is not None]
        if non_null and all(
            isinstance(v, (int, np.integer)) and not isinstance(v, bool)
            for v in non_null
        ):
            out[k] = pd.array(vals, dtype="Int64")
        else:
            out[k] = pd.Series(vals, dtype=object)
    return pd.DataFrame(out)


MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature_hash", LongType(), True),
    ]
)


def sniff_format(payload: bytes) -> str | None:
    """Identify a payload's container format from its magic bytes.

    Returns one of ``bmp png jpeg gif wav y4m mp4 mpeg_audio`` or
    None.
    Signature-based (not the mime column) so mislabeled rows still
    decode and garbage mislabeled as media nulls out instead of
    crashing a real codec.
    """
    if not payload:
        return None
    p = bytes(payload[:16])
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if p[:2] == b"BM":
        return "bmp"
    if p[:2] == b"\xff\xd8":
        return "jpeg"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return "wav"
    if p[:9] == b"YUV4MPEG2":
        return "y4m"
    if len(p) >= 8 and p[4:8] == b"ftyp":
        return "mp4"
    if p[:3] == b"ID3" or (
        len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0
    ):
        return "mpeg_audio"
    return None


_NULL_IMAGE = {"width": None, "height": None, "feature_hash": None}
_NULL_AUDIO = {"duration_ms": None, "rms_q8": None}


def _unsupported(kind: str, fmt: str | None, strict: bool) -> None:
    if strict:
        raise NotImplementedError(
            f"no in-repo {kind} codec for format {fmt!r} — inject a "
            "PIL/ffmpeg-backed callable for formats this environment "
            "cannot decode"
        )


def auto_image_decode(payload: bytes, strict: bool = False) -> dict[str, Any]:
    """Signature-dispatched real image decode: BMP/PNG (numpy) and
    baseline JPEG (from-scratch).  Unrecognized formats -> null record
    (or NotImplementedError under strict); garbage with a valid
    signature nulls out inside the codec itself."""
    from . import codecs, jpeg

    fmt = sniff_format(payload)
    if fmt == "bmp":
        return codecs.bmp_decode(bytes(payload))
    if fmt == "png":
        return codecs.png_decode(bytes(payload))
    if fmt == "jpeg":
        return jpeg.jpeg_decode(bytes(payload))
    if fmt == "gif":
        from . import gif

        return gif.gif_decode(bytes(payload))
    _unsupported("image-decode", fmt, strict)
    return dict(_NULL_IMAGE)


def fake_image_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic TEST DOUBLE: derives dimensions and a feature
    hash from raw payload bytes without decoding.  Stands in for
    PIL-class decoders in tests; never a default."""
    if payload is None:
        return dict(_NULL_IMAGE)
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % (1 << 60)
    return {
        "width": 1 + h % 4096,
        "height": 1 + (h >> 12) % 4096,
        "feature_hash": h,
    }


def decode_images(
    media: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Decode/feature-extract an image binary column via mapInPandas.

    Arrow moves each partition through Python in columnar batches; the
    decoder runs per-payload inside the batch loop.  The default is
    the signature-dispatched real codec set (`auto_image_decode`);
    ``strict=True`` makes formats outside that set raise
    NotImplementedError instead of yielding null rows.
    """
    if decoder is not None:
        decode = decoder
    else:
        def decode(p: bytes) -> dict[str, Any]:
            return auto_image_decode(p, strict=strict)

    def _batches(it: Iterator) -> Iterator:
        for pdf in it:
            out = records_to_frame(
                [decode(p) for p in pdf["payload"]],
                {"media_id": pdf["media_id"]},
            )
            yield out[["media_id", "width", "height", "feature_hash"]]

    return media.where("kind = 'image'").mapInPandas(
        _batches, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def auto_image_resize(
    payload: bytes, w: int, h: int, strict: bool = False
) -> bytes | None:
    """Signature-dispatched real nearest-neighbor resize, re-encoded
    in the source format (BMP/PNG/JPEG/GIF).  Unrecognized formats ->
    None (or NotImplementedError under strict)."""
    from . import codecs, jpeg

    fmt = sniff_format(payload)
    if fmt == "bmp":
        return codecs.bmp_resize(bytes(payload), w, h)
    if fmt == "png":
        return codecs.png_resize(bytes(payload), w, h)
    if fmt == "jpeg":
        return jpeg.jpeg_resize(bytes(payload), w, h)
    if fmt == "gif":
        from . import gif

        return gif.gif_resize(bytes(payload), w, h)
    _unsupported("image-resize", fmt, strict)
    return None


def fake_image_resize(payload: bytes, w: int, h: int) -> bytes | None:
    """Deterministic TEST DOUBLE: truncate/pad the byte stream to a
    size proportional to the target area.  Never a default."""
    if payload is None:
        return None
    size = max(1, (w * h) // 1024)
    return (payload * (size // max(len(payload), 1) + 1))[:size]


def resize_images(
    media: DataFrame,
    target_width: int = 256,
    target_height: int = 256,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Image resize plumbing: (payload, w, h) -> resized payload.

    Default is the signature-dispatched real codec set
    (`auto_image_resize`: BMP/PNG/JPEG nearest-neighbor, re-encoded
    in the source format); ``strict=True`` makes unsupported formats
    raise NotImplementedError instead of yielding a null payload.
    Inject a PIL-backed resizer for formats outside that set.
    """
    if resizer is not None:
        resize = resizer
    else:
        def resize(p: bytes, w: int, h: int) -> bytes | None:
            return auto_image_resize(p, w, h, strict=strict)

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_width,
                    "height": target_height,
                    "payload": [
                        resize(p, target_width, target_height)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.where("kind = 'image'").mapInPandas(_batches, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("duration_ms", IntegerType(), True),
        StructField("rms_q8", IntegerType(), True),
    ]
)


def auto_audio_features(
    payload: bytes, strict: bool = False
) -> dict[str, Any]:
    """Signature-dispatched real audio features: stdlib-wave WAV
    (exact duration + numpy RMS) and MPEG audio (frame-walk duration,
    Layer II subband-decoded RMS).  Unrecognized formats -> null
    record (or NotImplementedError under strict)."""
    from . import codecs, mpeg_audio

    fmt = sniff_format(payload)
    if fmt == "wav":
        return codecs.wav_features(bytes(payload))
    if fmt == "mpeg_audio":
        return mpeg_audio.mpeg_audio_features(bytes(payload))
    _unsupported("audio-decode", fmt, strict)
    return dict(_NULL_AUDIO)


def fake_audio_features(payload: bytes) -> dict[str, Any]:
    """Deterministic TEST DOUBLE: byte-length duration, byte-sum RMS.
    Never a default."""
    if payload is None:
        return dict(_NULL_AUDIO)
    return {
        "duration_ms": len(payload),
        "rms_q8": (sum(payload[:256]) // max(min(len(payload), 256), 1))
        & 0xFF,
    }


def extract_audio_features(
    media: DataFrame,
    extractor: Callable[[bytes], dict[str, Any]] | None = None,
    strict: bool = False,
    schema=None,
) -> DataFrame:
    """Audio feature extraction plumbing (duration, quantized RMS).

    Default is the signature-dispatched real codec set
    (`auto_audio_features`: WAV + MPEG audio); ``strict=True`` makes
    unsupported formats raise NotImplementedError instead of yielding
    null rows.  A custom ``schema`` widens the output to whatever an
    injected extractor returns (e.g. ``codecs.wav_spectral_features``
    adds zero-crossing rate and dominant frequency) — the Arrow batch
    shape is unchanged.
    """
    if extractor is not None:
        extract = extractor
    else:
        def extract(p: bytes) -> dict[str, Any]:
            return auto_audio_features(p, strict=strict)

    def _batches(it: Iterator) -> Iterator:
        for pdf in it:
            yield records_to_frame(
                [extract(p) for p in pdf["payload"]],
                {"media_id": pdf["media_id"]},
            )

    return media.where("kind = 'audio'").mapInPandas(
        _batches, schema or AUDIO_FEATURES_SCHEMA
    )


def auto_video_frames(
    payload: bytes, every_nth: int, strict: bool = False
) -> list[bytes]:
    """Signature-dispatched real frame sampling: Y4M (uncompressed
    YUV4MPEG2 frame walk).  MP4 sample extraction needs an H.264
    decoder this environment lacks, so mp4/unknown -> [] (or
    NotImplementedError under strict); inject an ffmpeg-backed
    extractor for those."""
    from . import codecs

    fmt = sniff_format(payload)
    if fmt == "y4m":
        return codecs.y4m_frames(bytes(payload), every_nth)
    _unsupported("video-frame-extract", fmt, strict)
    return []


def fake_video_frames(payload: bytes, n: int) -> list[bytes]:
    """Deterministic TEST DOUBLE: slice the payload into <=4 chunks.
    Never a default."""
    if not payload:
        return []
    step = max(1, len(payload) // 4)
    return [payload[i : i + step] for i in range(0, len(payload), step)][:4]


def sample_video_frames(
    media: DataFrame,
    every_nth: int = 30,
    extractor: Callable[[bytes, int], list[bytes]] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame.

    Default is the signature-dispatched real codec set
    (`auto_video_frames`: Y4M frame walk); unsupported containers
    yield no frames, or NotImplementedError under ``strict=True``.
    Inject an ffmpeg-backed (payload, every_nth) -> list[frame_bytes]
    callable for compressed video.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    if extractor is not None:
        extract = extractor
    else:
        def extract(p: bytes, n: int) -> list[bytes]:
            return auto_video_frames(p, n, strict=strict)

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, frame in enumerate(extract(payload, every_nth)):
                    rows.append((mid, i, frame))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "frame"]
            )

    return media.where("kind = 'video'").mapInPandas(_batches, out_schema)
