"""Real media codecs for the multimodal operators — no external
libraries, only the Python stdlib (`wave`, `struct`) and numpy.

`operators/multimodal.py` keeps its codec-injection contract (any
decoder with the right signature plugs in); this module supplies real
implementations for the formats that are fully decodable without
PIL/ffmpeg:

- **WAV/PCM audio** (`wav_features`): stdlib ``wave`` parses the RIFF
  container; numpy computes duration and RMS from the PCM samples.
- **BMP images** (`bmp_decode`, `bmp_resize`, `bmp_encode`):
  uncompressed 24-bit Windows bitmaps — a 54-byte struct header plus a
  bottom-up, 4-byte-row-aligned BGR pixel grid.  Decode, nearest-
  neighbor resize, and re-encode are exact and deterministic.
- **PNG images** (`png_decode`, `png_encode`, `png_resize`):
  non-interlaced 8-bit gray/RGB/alpha PNGs — stdlib ``zlib`` inflate
  plus full scanline filter reconstruction (None/Sub/Up/Average/
  Paeth).  Identical pixels hash identically across BMP and PNG (the
  feature hash is over decoded RGB, not container bytes).
- **Y4M video** (`y4m_frames`): uncompressed yuv4mpeg2 4:2:0 streams —
  FRAME-section walk, every-nth sampling, BT.601 YUV→RGB, each sampled
  frame re-encoded as PNG so it flows into the image codecs downstream.

- **JPEG images** (`operators/jpeg.py`): baseline sequential DCT,
  4:4:4 / grayscale, Annex-K tables — full numpy encoder + decoder
  (DCT/quant vectorized over blocks, bit-serial Huffman per image).
  Out-of-profile files (progressive, subsampled) return nulls, never
  mis-decode.

So `decode_images(media, decoder=bmp_decode)` (or `png_decode` /
`jpeg.jpeg_decode`) and `extract_audio_features(media,
extractor=wav_features)` run a REAL end-to-end decode inside the
Arrow batch loop; the fake default codecs remain only for MP3/MP4,
whose decompressors genuinely aren't implementable from the stdlib in
reasonable scope.
"""

from __future__ import annotations

import io
import math
import struct
import wave
from typing import Any

import numpy as np

# ---------------------------------------------------------------------------
# WAV / PCM audio
# ---------------------------------------------------------------------------

_PCM_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def wav_features(payload: bytes) -> dict[str, Any]:
    """Real audio feature extraction for RIFF/WAVE PCM payloads.

    Returns the `extract_audio_features` contract:
    ``duration_ms`` (rounded down) and ``rms_q8`` — root-mean-square
    amplitude of the full-scale-normalized samples quantized to 0..255.
    Non-WAV or corrupt payloads yield nulls (a 100 TB crawl always
    contains garbage; the pipeline must not die on it).
    """
    if payload is None:
        return {"duration_ms": None, "rms_q8": None}
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_frames = w.getnframes()
            rate = w.getframerate()
            width = w.getsampwidth()
            frames = w.readframes(n_frames)
        dtype = _PCM_DTYPES[width]
        ints = np.frombuffer(frames, dtype=dtype).astype(np.int64)
        if width == 1:  # 8-bit WAV is unsigned, midpoint 128
            ints -= 128
            full_scale = 128.0
        else:
            full_scale = float(2 ** (8 * width - 1))
        duration_ms = int(n_frames * 1000 // rate) if rate else None
        if ints.size == 0:
            return {"duration_ms": duration_ms, "rms_q8": 0}
        # Exact-integer RMS core (round 6, late): for the SQL-twinned
        # widths the sum of squares is an EXACT int64 (|s| < 2^15 so
        # ss <= n * 2^30), and the quantizer is ONE canonical float
        # expression — sqrt(ss / n) / full_scale * 255 — whose every
        # step is IEEE correctly rounded (/full_scale is a
        # power-of-two scaling, hence exact), then half-up
        # floor(x + 0.5) instead of round() (banker's) so the
        # quantizer has no .5-tie engine-dependence.  This makes
        # rms_q8 bit-identical to the DuckDB byte-math oracle
        # evaluating the same expression shape — PROVIDED ss < 2^53:
        # Python's int/int division here is correctly rounded at any
        # magnitude, but the DuckDB twin casts its HUGEINT sum to
        # double before dividing, so once ss exceeds 2^53 (minutes of
        # full-scale 16-bit PCM: n > 2^23 samples at |s| ~ 2^15) the
        # two sides can differ by 1 ulp and flip the half-up quantizer
        # at an exact boundary.  Fixture payloads are well under the
        # bound (n < 10^5).  32-bit PCM squares would overflow int64
        # outright, so that width keeps a float mean-square (its
        # oracle column stays replayed).
        if width <= 2:
            ss = int((ints * ints).sum())
            mean_sq = ss / ints.size
        else:
            scaled = ints.astype(np.float64)
            mean_sq = float(np.mean(scaled * scaled))
        rms255 = math.sqrt(mean_sq) / full_scale * 255.0
        return {
            "duration_ms": duration_ms,
            "rms_q8": min(255, int(rms255 + 0.5)),
        }
    except (wave.Error, EOFError, KeyError, ValueError, struct.error):
        return {"duration_ms": None, "rms_q8": None}


# ---------------------------------------------------------------------------
# BMP images (uncompressed 24-bit)
# ---------------------------------------------------------------------------


def _bmp_pixels(payload: bytes) -> np.ndarray | None:
    """Parse an uncompressed 24-bit BMP into an (h, w, 3) RGB uint8
    array, or None if the payload isn't one."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off, header_size = struct.unpack_from("<II", payload, 10)
    # Accept BITMAPINFOHEADER (40) and its extended V4/V5 variants.
    if header_size < 40:
        return None
    width, height, planes, bpp, compression = struct.unpack_from(
        "<iihhI", payload, 18
    )
    if bpp != 24 or compression != 0 or planes != 1 or width <= 0:
        return None
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + row_bytes * height
    if len(payload) < need:
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * height,
                        offset=data_off)
    rows = raw.reshape(height, row_bytes)[:, : width * 3]
    bgr = rows.reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1]  # BGR -> RGB


def bmp_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as an uncompressed 24-bit
    bottom-up BMP — the exact inverse of `_bmp_pixels`."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    body_b = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body_b), 0, 0, 54
    ) + struct.pack(
        "<IiihhIIiiII", 40, w, h, 1, 24, 0, len(body_b), 2835, 2835, 0, 0
    )
    return header + body_b


def _feature_hash(px: np.ndarray) -> int:
    """Polynomial hash of an RGB pixel grid under uint64 wraparound,
    fully vectorized (no per-byte Python loop inside the Arrow batch).
    Shared by every image codec so the same pixels hash identically
    regardless of container format."""
    data = np.frombuffer(px.tobytes()[: 64 * 1024], dtype=np.uint8)
    data = data.astype(np.uint64)
    prime = np.uint64(0x100000001B3)
    powers = np.full(data.size, prime, dtype=np.uint64)
    powers[0] = 1
    powers = np.cumprod(powers)  # p^0 .. p^{n-1}, wrapping mod 2^64
    return int((data * powers).sum(dtype=np.uint64) % np.uint64(1 << 60))


def bmp_decode(payload: bytes) -> dict[str, Any]:
    """Real image decoder for the `decode_images` contract: BMP header
    dimensions plus `_feature_hash` over the decoded RGB pixel grid.
    Non-BMP payloads yield nulls.
    """
    px = _bmp_pixels(payload)
    if px is None:
        return {"width": None, "height": None, "feature_hash": None}
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "feature_hash": _feature_hash(px),
    }


def bmp_resize(payload: bytes, w: int, h: int) -> bytes | None:
    """Real resizer for the `resize_images` contract: nearest-neighbor
    resample of the decoded pixel grid, re-encoded as BMP.  Non-BMP
    payloads pass through as None (dropped downstream)."""
    px = _bmp_pixels(payload)
    if px is None:
        return None
    src_h, src_w, _ = px.shape
    rows = (np.arange(h) * src_h) // h
    cols = (np.arange(w) * src_w) // w
    return bmp_encode(px[rows][:, cols])


# ---------------------------------------------------------------------------
# PNG images (non-interlaced, 8-bit depth; gray / RGB / +alpha)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color_type -> channels
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_pixels(payload: bytes) -> np.ndarray | None:
    """Decode a non-interlaced 8-bit PNG (stdlib zlib inflate + the
    five scanline filters) into an (h, w, 3) RGB uint8 array — alpha is
    dropped, grayscale replicates — or None for non-PNG / unsupported
    payloads.  Filter reconstruction is per-row (Sub/Paeth carry a
    left-pixel dependency), with numpy fast paths for None/Up rows.
    """
    import zlib

    if payload is None or not payload.startswith(_PNG_SIG):
        return None
    try:
        pos, ihdr, idat = len(_PNG_SIG), None, []
        while pos + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
        if ihdr is None or not idat:
            return None
        w, h, depth, color, _comp, _filt, interlace = ihdr
        ch = _PNG_CHANNELS.get(color)
        if depth != 8 or ch is None or interlace != 0 or w == 0 or h == 0:
            return None
        raw = zlib.decompress(b"".join(idat))
        stride = w * ch
        if len(raw) != h * (1 + stride):
            return None
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(h):
            row = raw[y * (1 + stride) : (y + 1) * (1 + stride)]
            f, cur = row[0], np.frombuffer(row[1:], np.uint8).astype(np.int32)
            if f == 0:
                rec = cur
            elif f == 2:  # Up
                rec = (cur + prev) & 0xFF
            else:  # Sub / Average / Paeth: left-pixel recurrence
                rec = cur.copy()
                for i in range(stride):
                    a = rec[i - ch] if i >= ch else 0
                    b = prev[i]
                    if f == 1:
                        rec[i] = (rec[i] + a) & 0xFF
                    elif f == 3:
                        rec[i] = (rec[i] + ((a + b) >> 1)) & 0xFF
                    elif f == 4:
                        c = prev[i - ch] if i >= ch else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (
                            b if pb <= pc else c
                        )
                        rec[i] = (rec[i] + pred) & 0xFF
                    else:
                        return None
            out[y] = rec.astype(np.uint8)
            prev = rec
        px = out.reshape(h, w, ch)
        if color == 0:
            return np.repeat(px, 3, axis=2)
        if color == 2:
            return px
        if color == 4:
            return np.repeat(px[:, :, :1], 3, axis=2)
        return px[:, :, :3]  # RGBA: drop alpha
    except (zlib.error, struct.error, ValueError):
        return None


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as a non-interlaced 8-bit
    truecolor PNG (filter 0 on every scanline) — decodable by
    `_png_pixels` and any standards-compliant reader."""
    import zlib

    h, w, _ = pixels.shape
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 1:] = pixels.reshape(h, w * 3)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> dict[str, Any]:
    """Real PNG decoder for the `decode_images` contract; identical
    pixels produce the same `feature_hash` as `bmp_decode` (the hash is
    over decoded RGB, not container bytes)."""
    px = _png_pixels(payload)
    if px is None:
        return {"width": None, "height": None, "feature_hash": None}
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "feature_hash": _feature_hash(px),
    }


def png_resize(payload: bytes, w: int, h: int) -> bytes | None:
    """Real resizer for the `resize_images` contract (PNG container):
    nearest-neighbor resample, re-encoded as PNG."""
    px = _png_pixels(payload)
    if px is None:
        return None
    src_h, src_w, _ = px.shape
    rows = (np.arange(h) * src_h) // h
    cols = (np.arange(w) * src_w) // w
    return png_encode(px[rows][:, cols])


# ---------------------------------------------------------------------------
# Y4M video (yuv4mpeg2 — uncompressed 4:2:0 frames)
# ---------------------------------------------------------------------------


def _yuv420_to_rgb(yp: np.ndarray, up: np.ndarray, vp: np.ndarray) -> np.ndarray:
    """Full-range BT.601 YUV→RGB with 2x nearest chroma upsampling —
    one fixed, documented convention so frame hashes are deterministic
    (Y4M doesn't carry colorimetry we could honor without ffmpeg)."""
    u = np.repeat(np.repeat(up, 2, axis=0), 2, axis=1)[: yp.shape[0], : yp.shape[1]]
    v = np.repeat(np.repeat(vp, 2, axis=0), 2, axis=1)[: yp.shape[0], : yp.shape[1]]
    y = yp.astype(np.float64)
    r = y + 1.402 * (v.astype(np.float64) - 128.0)
    g = y - 0.344136 * (u.astype(np.float64) - 128.0) - 0.714136 * (
        v.astype(np.float64) - 128.0
    )
    b = y + 1.772 * (u.astype(np.float64) - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).round().astype(np.uint8)


def y4m_frames(payload: bytes, every_nth: int = 30) -> list[bytes]:
    """Real frame extractor for the `sample_video_frames` contract:
    parses the yuv4mpeg2 stream header, walks FRAME sections of raw
    4:2:0 planes, keeps every ``every_nth``-th frame, and returns each
    as a PNG (so sampled frames feed straight into `png_decode` /
    `png_resize` downstream).  Non-Y4M or malformed payloads yield []
    — crawl garbage must not kill the batch."""
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        return []
    try:
        nl = payload.index(b"\n")
        w = h = None
        for tok in payload[:nl].split(b" ")[1:]:
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
            elif tok[:1] == b"C" and not tok.startswith(b"C420"):
                return []  # only 4:2:0 subsampling supported
        if not w or not h or w % 2 or h % 2:
            return []
        fsize = w * h + 2 * ((w // 2) * (h // 2))
        out, pos, frame_no = [], nl + 1, 0
        while pos < len(payload):
            fnl = payload.index(b"\n", pos)
            if payload[pos:fnl][:5] != b"FRAME":
                return out
            data = payload[fnl + 1 : fnl + 1 + fsize]
            if len(data) < fsize:
                return out
            if frame_no % max(1, every_nth) == 0:
                yp = np.frombuffer(data, np.uint8, w * h).reshape(h, w)
                cw, chh = w // 2, h // 2
                up = np.frombuffer(
                    data, np.uint8, cw * chh, w * h
                ).reshape(chh, cw)
                vp = np.frombuffer(
                    data, np.uint8, cw * chh, w * h + cw * chh
                ).reshape(chh, cw)
                out.append(png_encode(_yuv420_to_rgb(yp, up, vp)))
            frame_no += 1
            pos = fnl + 1 + fsize
        return out
    except (ValueError, IndexError):
        return []


def wav_spectral_features(payload: bytes) -> dict[str, Any]:
    """Extended audio features for the same injection contract as
    `wav_features`, adding two spectral/temporal descriptors the
    curation side of an audio corpus filters on:

    - ``zcr_q8``: zero-crossing rate (fraction of adjacent-sample sign
      changes) quantized to 0..255 — a cheap voiced/unvoiced &
      noisiness proxy.
    - ``dominant_freq_hz``: argmax bin of the numpy rFFT magnitude
      spectrum (DC excluded), in Hz — flags test tones, hum, and
      silence (None when the spectrum is all-zero).

    Deterministic (pure numpy on the decoded PCM); mono is assumed —
    multi-channel WAVs interleave, which biases ZCR upward, so
    channel-split upstream for exact per-channel numbers.
    """
    base = wav_features(payload)
    if base["duration_ms"] is None:
        return {**base, "zcr_q8": None, "dominant_freq_hz": None}
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
        samples = np.frombuffer(frames, dtype=_PCM_DTYPES[width]).astype(
            np.float64
        )
        if width == 1:
            samples -= 128.0
        if samples.size < 2:
            return {**base, "zcr_q8": 0, "dominant_freq_hz": None}
        signs = np.signbit(samples)
        zcr = float(np.mean(signs[1:] != signs[:-1]))
        spectrum = np.abs(np.fft.rfft(samples))
        spectrum[0] = 0.0  # exclude DC
        if not spectrum.any():
            dom = None
        else:
            k = int(np.argmax(spectrum))
            dom = int(round(k * rate / samples.size))
        return {
            **base,
            "zcr_q8": min(255, int(round(zcr * 255.0))),
            "dominant_freq_hz": dom,
        }
    except (wave.Error, EOFError, KeyError, ValueError, struct.error):
        return {**base, "zcr_q8": None, "dominant_freq_hz": None}


def y4m_motion(payload: bytes, every_nth: int = 1) -> dict[str, Any]:
    """Motion profile of a yuv4mpeg2 stream: mean absolute luma
    difference between consecutive sampled frames, quantized to 0..255
    — the static-video / slideshow screen of video curation (a near-0
    motion score on a long clip means dead content; a spike profile
    means scene cuts).

    Works directly on the Y planes of the FRAME walk (no RGB/PNG
    round-trip), so cost is one uint8 diff per sampled frame pair.
    Returns n_frames (sampled), motion_q8 (mean over pairs), and
    max_motion_q8 (the sharpest cut).  Non-Y4M payloads yield nulls.
    """
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        return {"n_frames": None, "motion_q8": None, "max_motion_q8": None}
    try:
        nl = payload.index(b"\n")
        w = h = None
        for tok in payload[:nl].split(b" ")[1:]:
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
            elif tok[:1] == b"C" and not tok.startswith(b"C420"):
                return {
                    "n_frames": None,
                    "motion_q8": None,
                    "max_motion_q8": None,
                }
        if not w or not h or w % 2 or h % 2:
            return {"n_frames": None, "motion_q8": None, "max_motion_q8": None}
        fsize = w * h + 2 * ((w // 2) * (h // 2))
        pos, frame_no = nl + 1, 0
        prev = None
        diffs = []
        n_sampled = 0
        while pos < len(payload):
            fnl = payload.index(b"\n", pos)
            if payload[pos:fnl][:5] != b"FRAME":
                break
            data = payload[fnl + 1 : fnl + 1 + fsize]
            if len(data) < fsize:
                break
            if frame_no % max(1, every_nth) == 0:
                yp = np.frombuffer(data, np.uint8, w * h).astype(np.int16)
                n_sampled += 1
                if prev is not None:
                    # exact integer sum of |Δluma| — quantization below
                    # stays in integer arithmetic end to end
                    diffs.append(int(np.abs(yp - prev).sum()))
                prev = yp
            frame_no += 1
            pos = fnl + 1 + fsize
        if not diffs:
            return {
                "n_frames": n_sampled,
                "motion_q8": 0 if n_sampled else None,
                "max_motion_q8": 0 if n_sampled else None,
            }
        # Exact-rational half-up quantizers (round 6, late):
        # round(sum_of_means / P) == (2*Σad + wh*P) // (2*wh*P) with
        # NO float step, so the DuckDB byte-math oracle twin computes
        # the identical integer (float means + banker's round() had
        # .5-tie and summation-order engine-dependence).
        wh = w * h
        n_pairs = len(diffs)
        return {
            "n_frames": n_sampled,
            "motion_q8": min(
                255, (2 * sum(diffs) + wh * n_pairs) // (2 * wh * n_pairs)
            ),
            "max_motion_q8": min(255, (2 * max(diffs) + wh) // (2 * wh)),
        }
    except (ValueError, IndexError):
        return {"n_frames": None, "motion_q8": None, "max_motion_q8": None}


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF metadata (box parsing — no sample decode)
# ---------------------------------------------------------------------------
#
# A full H.264/AAC decoder is out of scope for the stdlib, but the MP4
# CONTAINER metadata a curation pipeline filters on (duration, track
# count, per-track dimensions, brand) lives in the plain
# ISO 14496-12 box structure: [u32 size][4cc type][payload], boxes
# nest.  Parsing that is exact and library-free, and it retires the
# "MP4 = declared stub" boundary: metadata extraction is REAL; only
# sample decoding remains injectable.


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in buf[start:end]."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the type
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < (body - pos) or pos + size > end:
            return  # malformed length: stop cleanly
        yield btype, body, pos + size
        pos += size


def mp4_metadata(payload: bytes) -> dict[str, Any]:
    """Real MP4/ISO-BMFF container metadata: major brand (ftyp),
    movie duration in ms (moov/mvhd, version 0 and 1), track count
    (moov/trak), and the first video track's pixel dimensions
    (trak/tkhd, 16.16 fixed point).  Non-MP4 or corrupt payloads
    yield all-null (the garbage-tolerant codec contract shared by
    every decoder in this module).
    """
    null = {
        "major_brand": None,
        "duration_ms": None,
        "n_tracks": None,
        "width": None,
        "height": None,
    }
    if not payload or len(payload) < 16:
        return null
    try:
        brand = None
        duration_ms = None
        n_tracks = 0
        width = height = None
        saw_moov = False
        for btype, b0, b1 in _iter_boxes(payload, 0, len(payload)):
            if btype == b"ftyp" and b1 - b0 >= 4:
                brand = payload[b0 : b0 + 4].decode("ascii", "replace")
            elif btype == b"moov":
                saw_moov = True
                for ityp, i0, i1 in _iter_boxes(payload, b0, b1):
                    if ityp == b"mvhd":
                        ver = payload[i0]
                        if ver == 1:
                            ts = int.from_bytes(
                                payload[i0 + 20 : i0 + 24], "big"
                            )
                            dur = int.from_bytes(
                                payload[i0 + 24 : i0 + 32], "big"
                            )
                        else:
                            ts = int.from_bytes(
                                payload[i0 + 12 : i0 + 16], "big"
                            )
                            dur = int.from_bytes(
                                payload[i0 + 16 : i0 + 20], "big"
                            )
                        if ts:
                            duration_ms = dur * 1000 // ts
                    elif ityp == b"trak":
                        n_tracks += 1
                        for ttyp, t0, t1 in _iter_boxes(payload, i0, i1):
                            if ttyp != b"tkhd":
                                continue
                            # width/height: last 8 bytes, 16.16 fixed
                            w = (
                                int.from_bytes(
                                    payload[t1 - 8 : t1 - 4], "big"
                                )
                                >> 16
                            )
                            h = (
                                int.from_bytes(payload[t1 - 4 : t1], "big")
                                >> 16
                            )
                            if w and h and width is None:
                                width, height = w, h
        if brand is None and not saw_moov:
            return null
        return {
            "major_brand": brand,
            "duration_ms": duration_ms,
            "n_tracks": n_tracks if saw_moov else None,
            "width": width,
            "height": height,
        }
    except (ValueError, IndexError):
        return null


# ---------------------------------------------------------------------------
# MP3 / MPEG audio frame-header metadata (no sample decode)
# ---------------------------------------------------------------------------
#
# Decompressing MP3 samples (polyphase filterbank + huffman) stays the
# module's one declared stub, but the metadata a curation pipeline
# screens on — duration, bitrate profile, sample rate, CBR/VBR — is
# fully determined by the frame HEADERS (ISO 11172-3): 4 bytes each,
# sync 0xFFE, with bitrate/samplerate/padding indices that give every
# frame's byte length and sample count exactly.

_MP3_BITRATES_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
        416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
        384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320),
}
_MP3_BITRATES_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
        256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}  # version bits -> rates


def _mp3_frame(payload: bytes, pos: int):
    """Parse one frame header at pos; return (frame_len, samples,
    sample_rate, bitrate_kbps) or None."""
    if pos + 4 > len(payload):
        return None
    b0, b1, b2, _ = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = 4 - ((b1 >> 1) & 3)  # 1..3; bits 00 reserved -> layer 4
    if version == 1 or layer == 4:
        return None
    br_idx = (b2 >> 4) & 15
    sr_idx = (b2 >> 2) & 3
    padding = (b2 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    table = _MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2
    bitrate = table[layer][br_idx] * 1000
    rate = _MP3_RATES[version][sr_idx]
    if layer == 1:
        samples = 384
        flen = (12 * bitrate // rate + padding) * 4
    elif layer == 2:
        samples = 1152
        flen = 144 * bitrate // rate + padding
    else:  # layer III
        samples = 1152 if version == 3 else 576
        coeff = 144 if version == 3 else 72
        flen = coeff * bitrate // rate + padding
    if flen < 4:
        return None
    return flen, samples, rate, bitrate // 1000


def mp3_metadata(payload: bytes) -> dict[str, Any]:
    """Real MPEG-audio container metadata from the frame-header walk:
    exact duration (sum of per-frame samples / rate), frame count,
    sample rate, mean bitrate, and CBR/VBR flag.  Skips a leading
    ID3v2 tag (including the ID3v2.4 footer when its flag is set);
    resyncs are NOT attempted (a broken stream truncates the walk —
    metadata reflects the valid prefix).  Non-MPEG or corrupt
    payloads yield nulls (the garbage-tolerant contract)."""
    null = {
        "duration_ms": None,
        "n_frames": None,
        "sample_rate_hz": None,
        "bitrate_kbps": None,
        "is_vbr": None,
    }
    if not payload or len(payload) < 4:
        return null
    try:
        pos = 0
        if payload[:3] == b"ID3" and len(payload) >= 10:
            size = 0
            for b in payload[6:10]:  # syncsafe 28-bit
                size = (size << 7) | (b & 0x7F)
            pos = 10 + size
            # footer flag is only defined from ID3v2.4 (major version
            # byte 3); earlier tags must-zero that bit, and honoring a
            # spec-violating one would skip into the first frame
            if payload[3] >= 4 and payload[5] & 0x10:
                pos += 10  # ID3v2.4 footer: +10 bytes
        n_frames = 0
        total_samples = 0.0
        rate = None
        bitrates = set()
        bitrate_sum = 0
        while True:
            fr = _mp3_frame(payload, pos)
            if fr is None:
                break
            flen, samples, r, kbps = fr
            if rate is None:
                rate = r
            elif r != rate:
                break  # rate change: treat as end of valid stream
            n_frames += 1
            total_samples += samples
            bitrates.add(kbps)
            bitrate_sum += kbps
            pos += flen
        if n_frames == 0 or rate is None:
            return null
        return {
            "duration_ms": int(total_samples * 1000 // rate),
            "n_frames": n_frames,
            "sample_rate_hz": rate,
            "bitrate_kbps": bitrate_sum // n_frames,
            "is_vbr": len(bitrates) > 1,
        }
    except (ValueError, IndexError):
        return null


def mp3_encode_minimal(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    vbr_alternate_kbps: int | None = None,
) -> bytes:
    """Build a silent MPEG1 Layer III frame sequence (valid headers,
    zeroed payloads) — the encoder twin for round-trip testing the
    header walk without any audio library."""
    rates = _MP3_RATES[3]
    sr_idx = rates.index(sample_rate)
    out = bytearray()
    for i in range(n_frames):
        kbps = (
            vbr_alternate_kbps
            if vbr_alternate_kbps and i % 2
            else bitrate_kbps
        )
        br_idx = _MP3_BITRATES_V1[3].index(kbps)
        hdr = bytes(
            [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00]
        )
        flen = 144 * kbps * 1000 // sample_rate
        out += hdr + bytes(flen - 4)
    return bytes(out)


def _box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def mp4_encode_minimal(
    duration_ms: int,
    timescale: int = 1000,
    tracks: tuple[tuple[int, int], ...] = ((640, 480),),
    brand: bytes = b"isom",
) -> bytes:
    """Build a minimal-but-valid ISO-BMFF skeleton (ftyp + moov with
    mvhd and one tkhd per track + empty mdat) — the encoder twin that
    lets `mp4_metadata` be golden-file round-trip tested without any
    media library.  Carries no samples: container structure only.
    """
    dur = duration_ms * timescale // 1000
    mvhd = bytes(12) + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
    mvhd += bytes(80)  # rate/volume/matrix/predefined/next_track_id
    traks = b""
    for w, h in tracks:
        tkhd = bytes(76) + (w << 16).to_bytes(4, "big") + (
            h << 16
        ).to_bytes(4, "big")
        traks += _box(b"trak", _box(b"tkhd", tkhd))
    return (
        _box(b"ftyp", brand + bytes(4) + brand)
        + _box(b"moov", _box(b"mvhd", mvhd) + traks)
        + _box(b"mdat", b"")
    )


def bmp_structure(payload: bytes) -> dict:
    """Pure STRUCTURAL header read for image_structure — the Python
    twin of the `plans/media._BMP_OK` byte-math guard (same
    conditions, same fields; no pixel decode).  The supported profile
    is uncompressed 24-bit, so a valid header always reports 3
    components at 8 bits."""
    null = {"n_components": None, "bit_depth": None}
    try:
        if len(payload) < 54 or payload[:2] != b"BM":
            return null
        data_off, header_size = struct.unpack_from("<II", payload, 10)
        width, height_raw, planes, bpp, compression = struct.unpack_from(
            "<iihHI", payload, 18
        )
        row_bytes = ((width * 3 + 3) // 4) * 4
        if (
            header_size < 40
            or bpp != 24
            or compression != 0
            or planes != 1
            or width <= 0
            or len(payload) < data_off + row_bytes * abs(height_raw)
        ):
            return null
        return {"n_components": 3, "bit_depth": 8}
    except struct.error:
        return null


#: PNG color type -> component count (greyscale, RGB, grey+alpha,
#: RGBA) — the IHDR channels table of the PNG spec §11.2.2
_PNG_TYPE_COMPONENTS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_structure(payload: bytes) -> dict:
    """Pure STRUCTURAL IHDR read for image_structure — the Python
    twin of `plans/media._PNG_OK` (signature, 13-byte IHDR, bit
    depth 8, color type in {0,2,4,6}, no interlace, nonzero dims);
    components come from the spec's color-type channel table."""
    null = {"n_components": None, "bit_depth": None}
    try:
        if (
            len(payload) < 33
            or payload[:8] != b"\x89PNG\r\n\x1a\n"
        ):
            return null
        (ihdr_len,) = struct.unpack_from(">I", payload, 8)
        if ihdr_len != 13 or payload[12:16] != b"IHDR":
            return null
        w, h = struct.unpack_from(">II", payload, 16)
        depth, color, _comp, _filt, interlace = payload[24:29]
        if (
            depth != 8
            or color not in _PNG_TYPE_COMPONENTS
            or interlace != 0
            or w == 0
            or h == 0
        ):
            return null
        return {
            "n_components": _PNG_TYPE_COMPONENTS[color],
            "bit_depth": 8,
        }
    except struct.error:
        return null


def wav_structure(payload: bytes) -> dict[str, Any]:
    """HEADER-ONLY structural fields for `audio_structure` —
    (n_channels, sample_bits, sample_rate) from the canonical
    RIFF/WAVE layout, under exactly the guards the `_wav_pcm_ctes`
    byte-math twin applies (incl. the declared-data-present check
    that mirrors `wave` raising on a truncated read).  No sample is
    read, so the DuckDB twin is exact on any payload."""
    null = {
        "n_channels": None,
        "sample_bits": None,
        "sample_rate": None,
        "codec_layer": None,
    }
    try:
        if (
            payload is None
            or len(payload) < 44
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"
            or payload[12:16] != b"fmt "
            or payload[36:40] != b"data"
        ):
            return null
        tag, nch = struct.unpack_from("<HH", payload, 20)
        rate = struct.unpack_from("<I", payload, 24)[0]
        bits = struct.unpack_from("<H", payload, 34)[0]
        dsz = struct.unpack_from("<I", payload, 40)[0]
        if tag != 1 or nch <= 0 or rate <= 0 or len(payload) < 44 + dsz:
            return null
        return {
            "n_channels": int(nch),
            "sample_bits": int(bits),
            "sample_rate": int(rate),
            "codec_layer": None,
        }
    except struct.error:
        return null


def mpeg_structure(payload: bytes) -> dict[str, Any]:
    """HEADER-ONLY structural fields for `audio_structure` — channel
    count (mono iff mode bits == 3), sample rate, and layer from the
    FIRST MPEG frame header after the ID3v2 skip, under exactly
    `_mp3_frame`'s validity guards.  Reads four bytes; the DuckDB
    twin computes the same fields from the payload hex."""
    null = {
        "n_channels": None,
        "sample_bits": None,
        "sample_rate": None,
        "codec_layer": None,
    }
    try:
        if not payload or len(payload) < 4:
            return null
        pos = 0
        if payload[:3] == b"ID3" and len(payload) >= 10:
            size = 0
            for b in payload[6:10]:
                size = (size << 7) | (b & 0x7F)
            pos = 10 + size
            if payload[3] >= 4 and payload[5] & 0x10:
                pos += 10
        fr = _mp3_frame(payload, pos)
        if fr is None:
            return null
        b1, b2, b3 = payload[pos + 1], payload[pos + 2], payload[pos + 3]
        version = (b1 >> 3) & 3
        layer = 4 - ((b1 >> 1) & 3)
        sr_idx = (b2 >> 2) & 3
        mode = (b3 >> 6) & 3
        return {
            "n_channels": 1 if mode == 3 else 2,
            "sample_bits": None,
            "sample_rate": int(_MP3_RATES[version][sr_idx]),
            "codec_layer": int(layer),
        }
    except (IndexError, struct.error):
        return null


def y4m_structure(payload: bytes) -> dict[str, Any]:
    """HEADER-ONLY structural fields for `video_structure` — (width,
    height, fps_num, fps_den) from the yuv4mpeg2 stream header, under
    exactly the SQL twin's semantics: the header line is decoded
    byte-per-char (latin-1 = SQL chr()), padded with one space, and
    the SAME regexes extract the tokens, so parity holds on any
    payload with a newline-terminated header."""
    import re

    null = {
        "width": None,
        "height": None,
        "fps_num": None,
        "fps_den": None,
    }
    if not payload or not payload.startswith(b"YUV4MPEG2 "):
        return null
    nl = payload.find(b"\n")
    if nl < 0:
        return null
    padded = payload[:nl].decode("latin-1") + " "
    mw = re.search(r" W([0-9]+) ", padded)
    mh = re.search(r" H([0-9]+) ", padded)
    mc = re.search(r" (C[^ ]*) ", padded)
    w = int(mw.group(1)) if mw else None
    h = int(mh.group(1)) if mh else None
    ctok = mc.group(1) if mc else ""
    if (
        not w
        or not h
        or w % 2
        or h % 2
        or not (ctok == "" or ctok.startswith("C420"))
    ):
        return null
    mf = re.search(r" F([0-9]+):([0-9]+) ", padded)
    return {
        "width": int(w),
        "height": int(h),
        "fps_num": int(mf.group(1)) if mf else None,
        "fps_den": int(mf.group(2)) if mf else None,
    }
