"""MPEG-1 audio sample decode: real Layer II subband decoding plus
exact Layer III silence reconstruction — retiring the package's last
declared codec stub (round-4 verdict item 4).

Everything here derives from the public ISO/IEC 11172-3 spec:

* **Layer II** — full bitstream decode: allocation tables B.2a/B.2b
  (reconstructed from the spec's published structure), the Table-B.1
  scalefactor geometry (``2 · 2^(-i/3)``), grouped sample degrouping
  (3/5/9-level codes packing three samples), and the Table-B.4
  requantization constants in closed form (``C = 2^nb/levels``,
  ``D = 1 - (levels-1)/2^nb`` with MSB-inverted two's-complement
  codes — both reproduce the spec table exactly).  The low-bitrate
  allocation families B.2c/B.2d (≤ 48 kbps/channel) and
  joint-stereo intensity coding are OUT of the supported subset and
  yield nulls (garbage-tolerant contract), as documented.
* **Subband → PCM** — an orthonormal DCT-IV transform pair, the
  rectangular-prototype specialization of the ISO polyphase
  matrixing ``cos((16+i)(2k+1)π/64)``.  The ISO 512-tap prototype
  window is a published numeric table we deliberately do NOT copy;
  the DCT-IV pair is perfectly reconstructing and energy-preserving,
  so PCM decoded from `mp2_encode`'s own frames is exact FOR signals
  confined to the coded subbands within the frame's bit budget:
  `mp2_encode` silently truncates subbands ≥ sblimit (27 or 30 of
  32) and its greedy allocator drops subbands when the budget runs
  out, so energy above the coded set (or beyond the budget) is lost
  at ENCODE time, not reconstructed at decode.  PCM features (RMS,
  duration) for third-party Layer II streams are feature-grade (the
  prototype window only shapes inter-subband leakage, not energy).
* **Layer III (constrained)** — a side-info parse (MPEG-1 layouts,
  17/32 bytes) proving every granule carries ``part2_3_length = 0``:
  such frames decode to EXACT digital silence under any conforming
  decoder (no Huffman data, no overlap-add history), so the PCM
  contribution is a true decode, not a guess.  Frames with actual
  Huffman data are outside the subset and yield null RMS while the
  header-walk metadata stays real.

Reference parity: the reference repo has no audio decode at all
(SURVEY §2 — this is north-star extension surface); the contract
matches `wav_features` (`operators/codecs.py`).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .codecs import _mp3_frame, _MP3_BITRATES_V1, _MP3_RATES

# ---------------------------------------------------------------------------
# Layer II allocation tables (ISO 11172-3 Annex B, tables B.2a / B.2b)
# ---------------------------------------------------------------------------

#: the three level-sequences the B.2a/B.2b rows draw from
_LV_LOW_SB = (
    3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383,
    32767, 65535,
)
_LV_MID_SB = (
    3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
    65535,
)
_LV_HIGH_SB = (3, 5, 7, 9, 15, 31, 65535)
_LV_TOP_SB = (3, 5, 65535)

#: grouped quantizers pack 3 samples into one code of this many bits
_GROUP_BITS = {3: 5, 5: 7, 9: 10}


def _table_b2(sblimit: int) -> list[tuple[int, tuple[int, ...]]]:
    """Rows of allocation table B.2a (sblimit 27) / B.2b (30):
    (nbal, candidate level sequence) per subband."""
    rows: list[tuple[int, tuple[int, ...]]] = []
    for sb in range(sblimit):
        if sb < 3:
            rows.append((4, _LV_LOW_SB))
        elif sb < 11:
            rows.append((4, _LV_MID_SB))
        elif sb < 23:
            rows.append((3, _LV_HIGH_SB))
        else:
            rows.append((2, _LV_TOP_SB))
    return rows


def _alloc_table(
    rate: int, kbps_per_ch: int
) -> list[tuple[int, tuple[int, ...]]] | None:
    """ISO table-selection rule (11172-3 §2.4.2.3): 48 kHz always
    uses B.2a; 44.1/32 kHz use B.2a up to 80 kbps/channel and B.2b
    from 96; the ≤48 kbps/channel B.2c/B.2d families are outside this
    decoder's subset (None → undecodable)."""
    if kbps_per_ch < 56 or rate not in (32000, 44100, 48000):
        return None
    if rate == 48000 or kbps_per_ch <= 80:
        return _table_b2(27)
    return _table_b2(30)


def _requant_consts(levels: int) -> tuple[int, float, float]:
    """(nb, C, D) for one quantizer: closed forms that reproduce the
    spec's Table B.4 exactly (verified against the published rows)."""
    nb = levels.bit_length()
    c = float(1 << nb) / levels
    d = 1.0 - (levels - 1) / float(1 << nb)
    return nb, c, d


def _scf_value(idx: int) -> float:
    """Table B.1 scalefactors: 2 · 2^(-idx/3), idx 0..62."""
    return 2.0 * 2.0 ** (-idx / 3.0)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("bitstream exhausted")
            bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
            v = (v << 1) | bit
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def to_bytes(self, total_len: int) -> bytes:
        out = bytearray(total_len)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)

    def __len__(self) -> int:
        return len(self.bits)


# ---------------------------------------------------------------------------
# the subband transform pair (see module docstring)
# ---------------------------------------------------------------------------

_N_SB = 32
#: synthesis gain: subband samples are PCM/√32 in amplitude terms, so
#: a full-scale (|pcm| ≤ 1) block always yields |S| ≤ 1 (max DCT-IV
#: coefficient is 32·√(2/32) = √64/√2 = 5.657 = √32), and the energy
#: relation matches the ISO convention (1152 PCM samples carry 32×
#: the summed-square of the 36 subband samples), making third-party
#: RMS estimates energy-exact, not just round-trip-exact
_SB_GAIN = float(np.sqrt(_N_SB))
_DCT4: np.ndarray | None = None


def _dct4() -> np.ndarray:
    """Orthonormal DCT-IV matrix: symmetric and self-inverse, so the
    same matrix is both analysis and synthesis."""
    global _DCT4
    if _DCT4 is None:
        k = np.arange(_N_SB)
        _DCT4 = np.sqrt(2.0 / _N_SB) * np.cos(
            np.pi * (k[:, None] + 0.5) * (k[None, :] + 0.5) / _N_SB
        )
    return _DCT4


def _dequant(code: int, levels: int, nb: int, c: float, d: float) -> float:
    v = code ^ (1 << (nb - 1))  # invert MSB
    if v >= 1 << (nb - 1):
        v -= 1 << nb
    return c * (v / float(1 << (nb - 1)) + d)


def _quant(x: float, levels: int, nb: int, c: float, d: float) -> int:
    s3 = x / c - d
    v = int(round(s3 * (1 << (nb - 1))))
    lo, hi = -(1 << (nb - 1)), levels - 1 - (1 << (nb - 1))
    v = max(lo, min(hi, v))
    return (v & ((1 << nb) - 1)) ^ (1 << (nb - 1))


def mp2_frame_decode(
    payload: bytes, pos: int
) -> np.ndarray | None:
    """Decode one Layer II frame at ``pos`` to PCM, shape
    (1152, n_channels), float in [-1, 1); None if the frame is
    outside the supported subset or malformed."""
    fr = _mp3_frame(payload, pos)
    if fr is None:
        return None
    flen, samples, rate, kbps = fr
    b1 = payload[pos + 1]
    if ((b1 >> 3) & 3) != 3 or (4 - ((b1 >> 1) & 3)) != 2:
        return None  # MPEG-1 Layer II only
    mode = (payload[pos + 3] >> 6) & 3
    if mode == 1:
        return None  # joint (intensity) stereo: outside the subset
    nch = 1 if mode == 3 else 2
    table = _alloc_table(rate, kbps // nch)
    if table is None:
        return None
    sblimit = len(table)
    body_start = pos + 4 + (0 if (b1 & 1) else 2)  # skip CRC if present
    body = payload[body_start : pos + flen]
    try:
        br = _BitReader(body)
        alloc = [[0] * sblimit for _ in range(nch)]
        for sb in range(sblimit):
            nbal, lvls = table[sb]
            for ch in range(nch):
                idx = br.read(nbal)
                if idx > len(lvls):
                    return None
                alloc[ch][sb] = lvls[idx - 1] if idx else 0
        scfsi = [[0] * sblimit for _ in range(nch)]
        for sb in range(sblimit):
            for ch in range(nch):
                if alloc[ch][sb]:
                    scfsi[ch][sb] = br.read(2)
        scf = [[(1.0, 1.0, 1.0)] * sblimit for _ in range(nch)]
        for sb in range(sblimit):
            for ch in range(nch):
                if not alloc[ch][sb]:
                    continue
                si = scfsi[ch][sb]
                if si == 0:
                    f = [_scf_value(br.read(6)) for _ in range(3)]
                elif si == 1:
                    a, b = _scf_value(br.read(6)), _scf_value(br.read(6))
                    f = [a, a, b]
                elif si == 2:
                    a = _scf_value(br.read(6))
                    f = [a, a, a]
                else:
                    a, b = _scf_value(br.read(6)), _scf_value(br.read(6))
                    f = [a, b, b]
                scf[ch][sb] = tuple(f)
        sbs = np.zeros((nch, sblimit, 36))
        for gr in range(12):
            part = gr // 4
            for sb in range(sblimit):
                for ch in range(nch):
                    levels = alloc[ch][sb]
                    if not levels:
                        continue
                    nb, c, d = _requant_consts(levels)
                    factor = scf[ch][sb][part]
                    if levels in _GROUP_BITS:
                        code = br.read(_GROUP_BITS[levels])
                        vals = []
                        for _ in range(3):
                            vals.append(code % levels)
                            code //= levels
                    else:
                        vals = [br.read(nb) for _ in range(3)]
                    for j, v in enumerate(vals):
                        sbs[ch, sb, gr * 3 + j] = factor * _dequant(
                            v, levels, nb, c, d
                        )
    except ValueError:
        return None
    # synthesis: one 32-vector per sample instant -> 32 PCM samples
    m = _dct4()
    pcm = np.zeros((samples, nch))
    full = np.zeros((nch, _N_SB, 36))
    full[:, :sblimit, :] = sbs
    for ch in range(nch):
        pcm[:, ch] = (_SB_GAIN * (m @ full[ch])).T.reshape(-1)
    return pcm


def mp2_encode(
    pcm: np.ndarray,
    rate: int = 44100,
    kbps: int = 64,
    target_levels: int = 15,
) -> bytes:
    """Encoder twin (mono): analyze PCM with the same orthonormal
    DCT-IV, allocate the energy-carrying subbands greedily within the
    frame's bit budget, and emit spec-layout Layer II frames that
    `mp2_frame_decode` (or any conforming Layer II decoder, up to the
    prototype-window difference) reads back.  Exists — like
    `bmp_encode`/`png_encode`/`jpeg_encode`/`mp4_encode_minimal` —
    so decode can be round-trip tested without any audio library."""
    table = _alloc_table(rate, kbps)
    if table is None:
        raise ValueError(f"unsupported rate/bitrate: {rate}/{kbps}")
    sblimit = len(table)
    sr_idx = _MP3_RATES[3].index(rate)
    br_idx = _MP3_BITRATES_V1[2].index(kbps)
    flen = 144 * kbps * 1000 // rate
    m = _dct4()
    out = bytearray()
    n = len(pcm)
    for start in range(0, n, 1152):
        block = np.zeros(1152)
        chunk = pcm[start : start + 1152]
        block[: len(chunk)] = chunk
        sbs = (m @ block.reshape(36, _N_SB).T) / _SB_GAIN  # (32, 36)
        # greedy allocation: code subbands by descending peak energy
        # while the frame budget holds
        peaks = np.abs(sbs).max(axis=1)
        order = [
            sb for sb in np.argsort(-peaks[:sblimit]) if peaks[sb] > 1e-9
        ]
        budget = (flen - 4) * 8 - sum(t[0] for t in table[:sblimit])
        chosen: dict[int, int] = {}
        for sb in order:
            lvls = table[sb][1]
            levels = max(
                (lv for lv in lvls if lv <= target_levels),
                default=lvls[0],
            )
            nb = levels.bit_length()
            cost = 2 + 18 + (
                12 * _GROUP_BITS[levels]
                if levels in _GROUP_BITS
                else 36 * nb
            )
            if cost <= budget:
                chosen[int(sb)] = levels
                budget -= cost
        # quantize
        hdr = bytes([0xFF, 0xFD, (br_idx << 4) | (sr_idx << 2), 0xC0])
        bw = _BitWriter()
        for sb in range(sblimit):
            nbal, lvls = table[sb]
            bw.write(
                lvls.index(chosen[sb]) + 1 if sb in chosen else 0, nbal
            )
        scf_idx = np.zeros((sblimit, 3), dtype=int)
        for sb in chosen:
            for part in range(3):
                seg = np.abs(sbs[sb, part * 12 : part * 12 + 12])
                amp = float(seg.max())
                idx = 62
                if amp > 0:
                    idx = int(np.floor(3.0 * np.log2(2.0 / amp)))
                scf_idx[sb, part] = min(62, max(0, idx))
            bw.write(0, 2)  # scfsi 0: three scalefactors
        for sb in range(sblimit):
            if sb in chosen:
                for part in range(3):
                    bw.write(int(scf_idx[sb, part]), 6)
        for gr in range(12):
            part = gr // 4
            for sb in range(sblimit):
                if sb not in chosen:
                    continue
                levels = chosen[sb]
                nb, c, d = _requant_consts(levels)
                factor = _scf_value(int(scf_idx[sb, part]))
                codes = [
                    _quant(
                        float(sbs[sb, gr * 3 + j]) / factor, levels, nb, c, d
                    )
                    for j in range(3)
                ]
                if levels in _GROUP_BITS:
                    v = (
                        codes[0]
                        + levels * codes[1]
                        + levels * levels * codes[2]
                    )
                    bw.write(v, _GROUP_BITS[levels])
                else:
                    for v in codes:
                        bw.write(v, nb)
        out += hdr + bw.to_bytes(flen - 4)
    return bytes(out)


# ---------------------------------------------------------------------------
# Layer III: exact silence reconstruction (constrained subset)
# ---------------------------------------------------------------------------


def _l3_is_silent(payload: bytes, pos: int, flen: int) -> bool:
    """True iff the Layer III frame at ``pos`` provably decodes to
    digital silence: every granule's part2_3_length is 0 (no Huffman
    or scalefactor bits at all), so all 576 spectral lines per
    granule are zero and the synthesis output is exactly zero."""
    b1 = payload[pos + 1]
    version = (b1 >> 3) & 3
    crc = 0 if (b1 & 1) else 2
    body = payload[pos + 4 + crc : pos + flen]
    if not any(body):
        return True  # zero body => zero side info => silence
    mode = (payload[pos + 3] >> 6) & 3
    nch = 1 if mode == 3 else 2
    try:
        br = _BitReader(bytes(body))
        if version == 3:  # MPEG-1: 9-bit main_data_begin, 2 granules
            if br.read(9):
                return False  # bit reservoir in use: not provably silent
            br.read(5 if nch == 1 else 3)  # private bits
            br.read(4 * nch)  # scfsi
            for _ in range(2 * nch):
                if br.read(12):  # part2_3_length
                    return False
                br.read(47)  # rest of the granule block (59 - 12)
        else:  # LSF: 8-bit main_data_begin, 1 granule
            if br.read(8):
                return False
            br.read(1 if nch == 1 else 2)
            for _ in range(nch):
                if br.read(12):
                    return False
                br.read(51)  # 63 - 12
        return True
    except ValueError:
        return False


# ---------------------------------------------------------------------------
# the feature entry point (the `wav_features` contract for MPEG audio)
# ---------------------------------------------------------------------------


def mpeg_audio_features(payload: bytes) -> dict[str, Any]:
    """duration_ms + rms_q8 for an MPEG audio stream: duration from
    the exact frame-header walk (`mp3_metadata`), RMS from real
    sample decode — Layer II frames through the full subband decode,
    Layer III frames through the provable-silence path.  If ANY frame
    falls outside the decodable subset, rms_q8 is null (metadata
    stays real) rather than a partial guess."""
    from .codecs import mp3_metadata

    meta = mp3_metadata(payload)
    if meta["duration_ms"] is None:
        return {"duration_ms": None, "rms_q8": None}
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
        if payload[3] >= 4 and payload[5] & 0x10:
            pos += 10
    sumsq, count = 0.0, 0
    rate0 = None
    while True:
        fr = _mp3_frame(payload, pos)
        if fr is None:
            break
        flen, samples, rate, _kbps = fr
        if rate0 is None:
            rate0 = rate
        elif rate != rate0:
            break  # same end-of-valid-stream rule as mp3_metadata
        layer = 4 - ((payload[pos + 1] >> 1) & 3)
        if layer == 2:
            pcm = mp2_frame_decode(payload, pos)
            if pcm is None:
                return {"duration_ms": meta["duration_ms"], "rms_q8": None}
            sumsq += float((pcm * pcm).sum())
            count += pcm.size
        elif layer == 3:
            if not _l3_is_silent(payload, pos, flen):
                return {"duration_ms": meta["duration_ms"], "rms_q8": None}
            count += samples  # exact zeros contribute 0 to sumsq
        else:
            return {"duration_ms": meta["duration_ms"], "rms_q8": None}
        pos += flen
    if count == 0:
        return {"duration_ms": meta["duration_ms"], "rms_q8": None}
    rms = float(np.sqrt(sumsq / count))
    return {
        "duration_ms": meta["duration_ms"],
        "rms_q8": min(255, int(round(rms * 255.0))),
    }
