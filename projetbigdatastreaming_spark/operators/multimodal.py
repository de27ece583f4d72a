"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas iterators
(mapInPandas) — the north-star multimodal plumbing.

The Spark-side architecture is real and tested: schemas, batch
iteration, partition-preserving transforms.  Codecs are injectable
functions; `operators/codecs.py` supplies REAL implementations for the
formats decodable without external libraries (WAV/PCM audio via stdlib
``wave``, uncompressed 24-bit BMP and zlib PNG decode/resize/encode in
numpy, Y4M frame walking/motion, MP4/ISO-BMFF container metadata via
box parsing) and `operators/jpeg.py` a from-scratch baseline JPEG —
each golden-file tested.  The ONE remaining declared stub is MP3
sample decoding (a polyphase-filterbank decompressor is genuinely out
of stdlib scope); its default codec is a clearly-marked deterministic
fake (keeping the pipeline end-to-end testable) and `strict=True`
switches the boundary to NotImplementedError.

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


def _fake_image_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic fake decoder: derives dimensions and a feature
    hash from the payload bytes.  STUB — a real deployment injects a
    PIL/libjpeg-backed decoder with the same return contract."""
    if payload is None:
        return {"width": None, "height": None, "feature_hash": None}
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
    decoder runs per-payload inside the batch loop.  ``strict=True``
    raises NotImplementedError instead of using the fake decoder —
    marking the codec boundary this container can't cross.
    """
    if strict and decoder is None:
        raise NotImplementedError(
            "real image decoding needs an injected decoder (PIL/ffmpeg "
            "are not available in this environment)"
        )
    decode = decoder or _fake_image_decode

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


def resize_images(
    media: DataFrame,
    target_width: int = 256,
    target_height: int = 256,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Image resize plumbing: (payload, w, h) -> resized payload.

    The default resizer is a deterministic fake (truncate/pad the byte
    stream to a size proportional to the target area) — STUB; a real
    deployment injects a PIL-backed resizer with the same contract.
    ``strict=True`` raises NotImplementedError at the codec boundary.
    """
    if strict and resizer is None:
        raise NotImplementedError(
            "real image resizing needs an injected resizer (PIL is not "
            "available in this environment)"
        )

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        if payload is None:
            return None
        size = max(1, (w * h) // 1024)
        return (payload * (size // max(len(payload), 1) + 1))[:size]

    resize = resizer or _fake_resize

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


def extract_audio_features(
    media: DataFrame,
    extractor: Callable[[bytes], dict[str, Any]] | None = None,
    strict: bool = False,
    schema=None,
) -> DataFrame:
    """Audio feature extraction plumbing (duration, quantized RMS).

    Default is a deterministic fake over the raw bytes — STUB; inject a
    soundfile/librosa-backed extractor in a real deployment.  A custom
    ``schema`` widens the output to whatever the injected extractor
    returns (e.g. ``codecs.wav_spectral_features`` adds zero-crossing
    rate and dominant frequency) — the Arrow batch shape is unchanged.
    """
    if strict and extractor is None:
        raise NotImplementedError(
            "real audio decoding needs an injected extractor (no audio "
            "libs in this environment)"
        )

    def _fake(payload: bytes) -> dict[str, Any]:
        if payload is None:
            return {"duration_ms": None, "rms_q8": None}
        return {
            "duration_ms": len(payload),
            "rms_q8": (sum(payload[:256]) // max(min(len(payload), 256), 1))
            & 0xFF,
        }

    extract = extractor or _fake

    def _batches(it: Iterator) -> Iterator:
        for pdf in it:
            yield records_to_frame(
                [extract(p) for p in pdf["payload"]],
                {"media_id": pdf["media_id"]},
            )

    return media.where("kind = 'audio'").mapInPandas(
        _batches, schema or AUDIO_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame,
    every_nth: int = 30,
    extractor: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame.

    The default extractor is a deterministic fake that slices the
    payload (STUB — real deployments inject an ffmpeg-backed extractor
    with the same (payload, every_nth) -> list[frame_bytes] contract).
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def _fake_extract(payload: bytes, n: int) -> list[bytes]:
        if not payload:
            return []
        step = max(1, len(payload) // 4)
        return [payload[i : i + step] for i in range(0, len(payload), step)][:4]

    extract = extractor or _fake_extract

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
