"""MPEG-1 audio sample decode (`operators/mpeg_audio.py`) — the
round-5 retirement of the package's last declared codec stub.

Coverage: Layer II encode→decode round-trip (waveform + energy),
analytic RMS of a pure tone, the spec's requantization closed forms
against published Table B.4 rows, grouped-quantizer degrouping,
stereo, subset boundaries (joint stereo, low bitrate, Layer I),
Layer III provable-silence vs non-silent side info, garbage
tolerance, and the fixture feature matrix the driver-visible
`audio_stats` query depends on.
"""

from __future__ import annotations

import numpy as np
import pytest

from projetbigdatastreaming_spark.operators import codecs
from projetbigdatastreaming_spark.operators.mpeg_audio import (
    _alloc_table,
    _l3_is_silent,
    _requant_consts,
    mp2_encode,
    mp2_frame_decode,
    mpeg_audio_features,
)


def _decode_all(payload: bytes) -> np.ndarray:
    pos, chunks = 0, []
    while pos < len(payload):
        fr = codecs._mp3_frame(payload, pos)
        if fr is None:
            break
        pcm = mp2_frame_decode(payload, pos)
        assert pcm is not None
        chunks.append(pcm)
        pos += fr[0]
    return np.concatenate(chunks)


def _tone(n: int, freq: float = 554.365, rate: int = 44100, amp=0.4):
    return amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)


# ---------------------------------------------------------------------------
# Layer II round trip
# ---------------------------------------------------------------------------


def test_mp2_round_trip_waveform_close():
    x = _tone(1152 * 4)
    enc = mp2_encode(x, 44100, 128)
    dec = _decode_all(enc)[: len(x), 0]
    # 15-level quantization: sample-wise close, not exact
    assert np.abs(dec - x).max() < 0.25
    assert np.corrcoef(dec, x)[0, 1] > 0.99


def _basis_tone(n: int, k: int = 3, amp: float = 0.4) -> np.ndarray:
    """A signal that IS subband k's DCT-IV basis function, repeated
    per 32-sample block — zero inter-subband leakage, so precision
    tests isolate the quantizer from the rectangular-window leakage."""
    i = np.arange(n) % 32
    return amp * np.cos(np.pi * (i + 0.5) * (k + 0.5) / 32)


def test_mp2_round_trip_high_precision():
    """16-bit quantizers on a leakage-free single-subband signal:
    near-perfect waveform reconstruction through the full bitstream."""
    x = _basis_tone(1152 * 2)
    enc = mp2_encode(x, 44100, 128, target_levels=65535)
    dec = _decode_all(enc)[: len(x), 0]
    assert np.corrcoef(dec, x)[0, 1] > 0.9999
    assert np.abs(dec - x).max() < 0.001


def test_mp2_round_trip_energy_exact_tone():
    """RMS of a decoded pure tone matches the analytic amp/sqrt(2)
    to <1% — the energy-preservation property the RMS feature needs."""
    x = _tone(1152 * 6)
    enc = mp2_encode(x, 44100, 64)
    dec = _decode_all(enc)[: len(x), 0]
    rms = float(np.sqrt((dec**2).mean()))
    assert abs(rms - 0.4 / np.sqrt(2)) < 0.004


def test_mp2_round_trip_multitone_all_rates():
    x = _tone(1152 * 2, 220.0) + _tone(1152 * 2, 3520.0, amp=0.2)
    for rate, kbps in [(32000, 64), (44100, 96), (48000, 112)]:
        enc = mp2_encode(x, rate, kbps)
        dec = _decode_all(enc)[: len(x), 0]
        assert (
            abs(np.sqrt((dec**2).mean()) - np.sqrt((x**2).mean())) < 0.01
        ), (rate, kbps)


def test_mp2_grouped_quantizers_exercised():
    """target_levels=5 forces the grouped 3/5-level codes (3 samples
    packed per code) — degrouping must still round-trip the energy."""
    x = _basis_tone(1152 * 2)
    enc = mp2_encode(x, 44100, 64, target_levels=5)
    dec = _decode_all(enc)[: len(x), 0]
    # 5 levels on a constant subband value: exact shape (degrouping
    # reassembles the right code order), coarse-grid amplitude bias
    assert np.corrcoef(dec, x)[0, 1] > 0.9999
    assert (
        abs(np.sqrt((dec**2).mean()) - np.sqrt((x**2).mean()))
        < 0.15 * np.sqrt((x**2).mean())
    )


def test_mp2_silence_encodes_to_zero():
    enc = mp2_encode(np.zeros(1152), 44100, 64)
    dec = _decode_all(enc)
    assert np.abs(dec).max() == 0.0


# ---------------------------------------------------------------------------
# spec tables: closed forms vs published rows
# ---------------------------------------------------------------------------


def test_requant_closed_forms_match_table_b4():
    # (levels, C, D) rows as printed in ISO 11172-3 Table B.4
    published = [
        (3, 1.33333333333, 0.50000000000),
        (5, 1.60000000000, 0.50000000000),
        (7, 1.14285714286, 0.25000000000),
        (9, 1.77777777777, 0.50000000000),
        (15, 1.06666666666, 0.12500000000),
        (31, 1.03225806452, 0.06250000000),
        (63, 1.01587301587, 0.03125000000),
        (65535, 1.00001525902, 0.00003051758),
    ]
    for levels, c_pub, d_pub in published:
        _nb, c, d = _requant_consts(levels)
        assert abs(c - c_pub) < 1e-9, levels
        assert abs(d - d_pub) < 1e-9, levels


def test_alloc_table_selection_rule():
    assert len(_alloc_table(48000, 192)) == 27  # 48k always B.2a
    assert len(_alloc_table(44100, 64)) == 27  # <=80 kbps/ch: B.2a
    assert len(_alloc_table(44100, 96)) == 30  # >=96 kbps/ch: B.2b
    assert _alloc_table(44100, 48) is None  # B.2c/d family: out
    assert _alloc_table(22050, 64) is None  # MPEG-2 LSF: out


# ---------------------------------------------------------------------------
# subset boundaries and garbage tolerance
# ---------------------------------------------------------------------------


def test_joint_stereo_outside_subset():
    enc = bytearray(mp2_encode(_tone(1152), 44100, 64))
    enc[3] = (enc[3] & 0x3F) | 0x40  # mode 01 = joint stereo
    assert mp2_frame_decode(bytes(enc), 0) is None
    feats = mpeg_audio_features(bytes(enc))
    assert feats["rms_q8"] is None and feats["duration_ms"] == 26


def test_layer1_outside_subset():
    enc = bytearray(mp2_encode(_tone(1152), 44100, 64))
    enc[1] = (enc[1] & 0xF9) | 0x06  # layer bits 11 = Layer I
    assert mp2_frame_decode(bytes(enc), 0) is None


def test_truncated_frame_yields_none_not_crash():
    enc = mp2_encode(_tone(1152), 44100, 64)
    # keep the 4-byte header (so _mp3_frame still sees a frame) but
    # chop the body mid-bitstream
    assert mp2_frame_decode(enc[:40] + b"", 0) is None


def test_features_garbage_and_empty():
    assert mpeg_audio_features(b"not mpeg at all") == {
        "duration_ms": None,
        "rms_q8": None,
    }
    assert mpeg_audio_features(b"") == {
        "duration_ms": None,
        "rms_q8": None,
    }


def test_mixed_stream_any_undecodable_frame_nulls_rms():
    good = mp2_encode(_tone(1152 * 2), 44100, 64)
    bad = bytearray(mp2_encode(_tone(1152), 44100, 64))
    bad[3] = (bad[3] & 0x3F) | 0x40
    feats = mpeg_audio_features(good + bytes(bad))
    assert feats["rms_q8"] is None  # no partial-stream guess
    assert feats["duration_ms"] == 78  # but metadata walks all frames


# ---------------------------------------------------------------------------
# Layer III provable silence
# ---------------------------------------------------------------------------


def test_l3_zero_body_is_silent():
    enc = codecs.mp3_encode_minimal(3, 128, 44100)
    flen = codecs._mp3_frame(enc, 0)[0]
    assert _l3_is_silent(enc, 0, flen)
    feats = mpeg_audio_features(enc)
    assert feats["rms_q8"] == 0 and feats["duration_ms"] == 78


def test_l3_nonzero_part23_is_not_silent():
    enc = bytearray(codecs.mp3_encode_minimal(1, 128, 44100))
    enc[6] |= 0x08  # gr0/ch0 part2_3_length bit (stereo layout)
    flen = codecs._mp3_frame(bytes(enc), 0)[0]
    assert not _l3_is_silent(bytes(enc), 0, flen)
    assert mpeg_audio_features(bytes(enc))["rms_q8"] is None


def test_l3_main_data_begin_blocks_silence_claim():
    enc = bytearray(codecs.mp3_encode_minimal(1, 128, 44100))
    enc[4] |= 0x80  # main_data_begin != 0: bit reservoir in use
    flen = codecs._mp3_frame(bytes(enc), 0)[0]
    assert not _l3_is_silent(bytes(enc), 0, flen)


# ---------------------------------------------------------------------------
# the committed fixture matrix (what audio_stats pins driver-side)
# ---------------------------------------------------------------------------


def test_fixture_mpeg_feature_matrix():
    import pyarrow.parquet as pq

    from projetbigdatastreaming_spark.plans.media import FIXTURE

    t = pq.read_table(FIXTURE)
    rows = {
        mid: mpeg_audio_features(p)
        for mid, mime, p in zip(
            t["media_id"].to_pylist(),
            t["mime"].to_pylist(),
            t["payload"].to_pylist(),
        )
        if mime == "audio/mpeg"
    }
    assert rows[13] == {"duration_ms": 992, "rms_q8": 0}  # L3 silence
    assert rows[14] == {"duration_ms": 324, "rms_q8": 0}  # VBR silence
    # Layer II tone: REAL decoded samples; 0.4 sine -> 0.4/sqrt(2)*255
    assert rows[15]["rms_q8"] == 72
    assert rows[16]["rms_q8"] is None  # non-silent L3: honest null
    assert rows[17]["rms_q8"] is None  # joint stereo: outside subset
    assert all(r["duration_ms"] is not None for r in rows.values())
