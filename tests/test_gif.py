"""From-scratch GIF codec (operators/gif.py): LZW roundtrips across
every width-growth and reset boundary, interlace reconstruction,
profile rejects, cross-codec hash identity, and the fixture rows."""

from __future__ import annotations

import struct

import numpy as np

from projetbigdatastreaming_spark.operators import gif as G


def _rt(px):
    back = G._gif_pixels(G.gif_encode(px))
    assert back is not None and (back == px).all()


def test_roundtrip_small_shapes_exhaustive():
    """Every h×w in 1..8 — the tail of the LZW stream lands on every
    possible code/width alignment, including the final-append-on-a-
    power-of-two boundary that desyncs naive encoder width schedules
    (the bug the decoder-simulation schedule exists to fix)."""
    for h in range(1, 9):
        for w in range(1, 9):
            a = ((np.arange(h * w) * 37) % 5).astype(np.uint8)
            a = a.reshape(h, w)
            _rt(np.dstack([a * 40, a * 11, 255 - a * 30]).astype(np.uint8))


def test_roundtrip_palette_sizes_fuzz():
    """Seeded fuzz over palette sizes 2..256 and arbitrary shapes —
    code widths from 3 to 9+ bits, growth mid-stream."""
    for trial in range(30):
        r = np.random.RandomState(trial)
        h, w = r.randint(1, 30), r.randint(1, 30)
        ncol = r.randint(2, 257)
        idx = r.randint(0, ncol, (h, w))
        pal = r.randint(0, 256, (ncol, 3)).astype(np.uint8)
        _rt(pal[idx])


def test_roundtrip_forces_table_reset_at_4096():
    """High-entropy 256-color noise grows the code table past 4096 —
    the mid-stream CLEAR/reset path must roundtrip exactly."""
    rng = np.random.RandomState(3)
    v = rng.randint(0, 256, (100, 100)).astype(np.uint8)
    px = np.dstack([v, v, v])
    payload = G.gif_encode(px)
    assert (G._gif_pixels(payload) == px).all()
    # the stream really contains a mid-stream CLEAR (beyond the
    # mandatory leading one): replay the width schedule and count
    gct = 2 << (payload[10] & 7)
    pos = 13 + 3 * gct + 10
    min_code = payload[pos]
    pos += 1
    data = bytearray()
    while payload[pos] != 0:
        ln = payload[pos]
        data += payload[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width, bitpos, clears, tlen, prev = min_code + 1, 0, 0, 0, False
    while bitpos + width <= len(data) * 8:
        b0 = bitpos >> 3
        code = (
            int.from_bytes(data[b0 : b0 + 3], "little") >> (bitpos & 7)
        ) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            clears += 1
            width, tlen, prev = min_code + 1, clear + 2, False
            continue
        if code == eoi:
            break
        if prev:
            tlen += 1
            if tlen == (1 << width) and width < 12:
                width += 1
        prev = True
    assert clears >= 2, "reset path not exercised"


def test_interlaced_decode():
    """Hand-interlace a stream (rows stored in four-pass order, flag
    set) — the decoder must reconstruct the original row order."""
    a = ((np.arange(13 * 9).reshape(13, 9) * 29) % 7).astype(np.uint8)
    px = np.dstack([a * 30, 255 - a * 20, a * 5]).astype(np.uint8)
    h = px.shape[0]
    order = [
        r
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
        for r in range(start, h, step)
    ]
    b = bytearray(G.gif_encode(px[order]))
    pos = 13 + 3 * (2 << (b[10] & 7))
    assert b[pos] == 0x2C
    b[pos + 9] |= 0x40  # interlace flag
    back = G._gif_pixels(bytes(b))
    assert back is not None and (back == px).all()


def test_profile_rejects_and_garbage():
    px = np.zeros((4, 5, 3), dtype=np.uint8)
    px[1:, 2:] = [10, 20, 30]
    valid = G.gif_encode(px)
    gct = 2 << (valid[10] & 7)
    desc = 13 + 3 * gct

    def mutated(off, val):
        b = bytearray(valid)
        b[off] = val
        return bytes(b)

    assert G.gif_decode(mutated(10, valid[10] & 0x7F))["width"] is None
    assert G.gif_decode(mutated(desc + 1, 1))["width"] is None  # left
    assert G.gif_decode(mutated(desc + 9, 0x80))["width"] is None  # LCT
    assert G.gif_decode(valid[:20])["width"] is None
    assert G.gif_decode(b"GIF89a not really a gif")["width"] is None
    assert G.gif_decode(b"")["width"] is None
    assert G.gif_decode(b"GIF88a" + valid[6:])["width"] is None
    # structure: header-only, same guards
    assert G.gif_structure(valid) == {"n_components": 3, "bit_depth": (valid[10] & 7) + 1}
    assert G.gif_structure(mutated(10, valid[10] & 0x7F))["bit_depth"] is None
    # corrupt LZW: valid header, truncated data sub-block contents
    b = bytearray(valid)
    b[-4] ^= 0xFF
    out = G.gif_decode(bytes(b))
    # either still decodes (mutation hit padding) or nulls — never raises
    assert out["width"] in (None, 5)


def test_cross_codec_hash_identity():
    """The feature hash is over decoded RGB: the same pixels through
    BMP, PNG, and GIF containers hash identically."""
    from projetbigdatastreaming_spark.operators import codecs

    a = ((np.arange(6 * 11).reshape(6, 11) * 13) % 9).astype(np.uint8)
    px = np.dstack([a * 25, a * 7, 255 - a * 20]).astype(np.uint8)
    hb = codecs.bmp_decode(codecs.bmp_encode(px))["feature_hash"]
    hp = codecs.png_decode(codecs.png_encode(px))["feature_hash"]
    hg = G.gif_decode(G.gif_encode(px))["feature_hash"]
    assert hb == hp == hg


def test_encoder_rejects_overwide_palette():
    import pytest

    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, (30, 30, 3)).astype(np.uint8)
    with pytest.raises(ValueError):
        G.gif_encode(px)


def test_fixture_gif_rows_decode(spark, sf_dir):
    """The committed fixture's GIF rows: media_id 7 decodes with real
    dims/hash, media_id 8 (header reject) nulls — through the full
    Spark mapInPandas path."""
    from projetbigdatastreaming_spark.plans.media import q_image_stats

    rows = {r.media_id: r for r in q_image_stats(spark, sf_dir).collect()}
    assert (rows[7].width, rows[7].height) == (13, 11)
    assert rows[7].feature_hash is not None
    assert rows[8].width is None and rows[8].feature_hash is None


def test_decoder_never_hangs_or_raises_on_fuzzed_bytes():
    """Seeded byte-level fuzz against the full decoder: random
    mutations, truncations, and pure noise either decode or null —
    never raise, never loop (the sub-block/LZW walks must always
    advance)."""
    import random

    rng = random.Random(0xDEC0DE)
    px = ((np.arange(8 * 12).reshape(8, 12) * 7) % 5).astype(np.uint8)
    base = G.gif_encode(np.dstack([px * 30, px * 50, 255 - px * 40]))
    for trial in range(300):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        if rng.random() < 0.4:
            b = b[: rng.randrange(len(b) + 1)]
        out = G.gif_decode(bytes(b))
        assert set(out) == {"width", "height", "feature_hash"}
    for trial in range(100):
        n = rng.randrange(0, 200)
        noise = bytes(rng.randrange(256) for _ in range(n))
        G.gif_decode(b"GIF89a" + noise)
        G.gif_decode(noise)
