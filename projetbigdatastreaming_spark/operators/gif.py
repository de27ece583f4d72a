"""From-scratch GIF codec (GIF87a/89a, CompuServe spec + RFC-free
public documentation) — pure stdlib + numpy, like the sibling codecs.

Profile (mirrors the other codecs' honest-subset approach):

- **decode** (`gif_decode` / `_gif_pixels`): single-image GIFs with a
  GLOBAL color table, image descriptor at origin with dimensions
  equal to the logical screen, optional interlace (the four-pass row
  order is reconstructed), extensions skipped via their sub-block
  chains, full variable-width LZW decompression (3..12-bit codes,
  CLEAR/EOI semantics, code-width growth at table-size powers of
  two).  Anything outside the profile — local color tables, multiple
  images, offset descriptors, corrupt LZW — yields nulls, never a
  mis-decode.
- **encode** (`gif_encode`): images with ≤256 distinct colors (the
  format's hard limit); palette built from the image, real LZW
  compression with code-width growth and a table reset at 4096
  entries.  Encoder and decoder are exact inverses (roundtrip
  property-tested, including palettes large enough to force width
  growth and streams long enough to force a mid-stream CLEAR).
- **structure** (`gif_structure`): HEADER-ONLY fields for the
  `image_structure` oracle — n_components (3: palette entries are
  RGB triples) and bit_depth (bits per pixel: the global-color-table
  size field + 1, 1..8).  Reads nothing past byte 12, so the DuckDB
  byte-math twin is exact on ANY payload (no entropy-stream blind
  spot for this query).

The LZW data stream is the GIF analogue of PNG's zlib / JPEG's
Huffman entropy stream: pixel-level outputs (feature_hash) stay
Python-replayed in the oracles, while the fixed-layout header fields
(dims, palette depth) are DuckDB byte math — the documented
minimality boundary in `plans/media.py`.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import _feature_hash

_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer (GIF packs code bits little-endian)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-flavor LZW.  The code width is driven by a SIMULATION of
    the decoder's table growth, not the encoder's own: a decoder
    appends one entry per data code from the second onward (it
    cannot know which code is last, so it appends on the final one
    too), and widens when its table size reaches 2^width — the
    encoder's next-free-code counter runs one emission AHEAD of
    that, and width schedules keyed on it desync exactly when the
    decoder's final append lands on a power-of-two boundary (found
    by roundtrip test; the classic tail off-by-one).  Table resets
    with a CLEAR when the code space fills at 4096."""
    clear = 1 << min_code
    eoi = clear + 1
    t0 = clear + 2
    bw = _BitWriter()

    state = {"width": min_code + 1, "emitted": 0, "dec_len": t0}

    def emit_data(code: int) -> None:
        bw.write(code, state["width"])
        state["emitted"] += 1
        if state["emitted"] >= 2:  # decoder appends from code #2 on
            state["dec_len"] += 1
            if state["dec_len"] == (1 << state["width"]) and state[
                "width"
            ] < 12:
                state["width"] += 1

    def fresh() -> tuple[dict, int]:
        return {(i,): i for i in range(clear)}, eoi + 1

    table, next_code = fresh()
    bw.write(clear, state["width"])
    w: tuple = ()
    for k in map(int, indices):
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit_data(table[w])
        table[wk] = next_code
        next_code += 1
        w = (k,)
        if next_code == 4096:  # code space full: reset both sides
            emit_data(table[w])
            bw.write(clear, state["width"])
            table, next_code = fresh()
            state.update(width=min_code + 1, emitted=0, dec_len=t0)
            w = ()
    if w:
        emit_data(table[w])
    bw.write(eoi, state["width"])
    return bw.flush()


def _lzw_decode(data: bytes, min_code: int, n_out: int) -> list[int] | None:
    """Inverse of `_lzw_encode`; None on any malformed stream (code
    beyond table+1, missing data, output overrun)."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    pos = 0  # bit cursor
    total_bits = len(data) * 8
    out: list[int] = []
    table: list[tuple] = [(i,) for i in range(clear)] + [(), ()]
    prev: tuple | None = None

    while True:
        if pos + width > total_bits:
            return None  # ran out before EOI
        byte0 = pos >> 3
        chunk = int.from_bytes(
            data[byte0 : byte0 + 3], "little"
        ) >> (pos & 7)
        code = chunk & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            return None
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        if len(out) > n_out:
            return None
        prev = entry
    return out if len(out) == n_out else None


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def gif_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as a single-image GIF89a
    with a global color table.  Raises ValueError above 256 distinct
    colors (the format's palette limit — callers quantize first)."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors > GIF palette limit")
    # GCT size field: 2^(n+1) entries, smallest that fits
    n = 0
    while (2 << n) < len(palette):
        n += 1
    gct_entries = 2 << n
    min_code = max(2, n + 1)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (7 << 4) | n, 0, 0])  # GCT flag, 8-bit res
    out += palette.astype(np.uint8).tobytes()
    out += bytes(3 * (gct_entries - len(palette)))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    lzw = _lzw_encode(inverse.astype(np.int64), min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_pixels(payload: bytes) -> np.ndarray | None:
    """Decode a profile-conformant GIF to (h, w, 3) RGB uint8, else
    None (see module docstring for the profile)."""
    try:
        if payload is None or len(payload) < 13:
            return None
        if payload[:6] not in _MAGICS:
            return None
        w, h = struct.unpack_from("<HH", payload, 6)
        packed = payload[10]
        if not (packed & 0x80) or w == 0 or h == 0:
            return None  # profile: global color table required
        gct_entries = 2 << (packed & 7)
        pos = 13
        palette = np.frombuffer(
            payload, dtype=np.uint8, count=3 * gct_entries, offset=pos
        ).reshape(-1, 3)
        pos += 3 * gct_entries
        # skip extensions (label byte + sub-block chain)
        while pos < len(payload) and payload[pos] == 0x21:
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        if pos >= len(payload) or payload[pos] != 0x2C:
            return None
        left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
        ipacked = payload[pos + 9]
        if left or top or iw != w or ih != h or (ipacked & 0x80):
            return None  # profile: full-screen image, no local table
        interlaced = bool(ipacked & 0x40)
        pos += 10
        min_code = payload[pos]
        if not 2 <= min_code <= 11:
            return None
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        indices = _lzw_decode(bytes(data), min_code, w * h)
        if indices is None:
            return None
        idx = np.asarray(indices, dtype=np.int64)
        if idx.max(initial=0) >= len(palette):
            return None
        grid = palette[idx].reshape(h, w, 3)
        if interlaced:
            order = [
                r
                for start, step in _INTERLACE_PASSES
                for r in range(start, h, step)
            ]
            deinterlaced = np.empty_like(grid)
            deinterlaced[order] = grid
            grid = deinterlaced
        return grid
    except (IndexError, struct.error, ValueError):
        return None


def gif_decode(payload: bytes) -> dict:
    """`decode_images` contract: (width, height, feature_hash); the
    hash is over decoded RGB, so identical pixels hash identically
    across BMP/PNG/JPEG-lossless/GIF containers."""
    px = _gif_pixels(payload)
    if px is None:
        return {"width": None, "height": None, "feature_hash": None}
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "feature_hash": _feature_hash(px),
    }


def gif_resize(payload: bytes, w: int, h: int) -> bytes | None:
    """Nearest-neighbor resample, re-encoded as GIF (sampling keeps
    colors within the source palette, so re-encode cannot overflow)."""
    px = _gif_pixels(payload)
    if px is None:
        return None
    src_h, src_w, _ = px.shape
    rows = (np.arange(h) * src_h) // h
    cols = (np.arange(w) * src_w) // w
    return gif_encode(px[rows][:, cols])


def gif_structure(payload: bytes) -> dict:
    """HEADER-ONLY structural fields for `image_structure`:
    n_components = 3 (palette entries are RGB triples), bit_depth =
    bits per pixel = GCT size field + 1.  Reads only bytes 0-12 under
    the same guards as the SQL twin (magic, nonzero dims, GCT flag),
    so parity holds on ANY payload — no entropy blind spot."""
    null = {"n_components": None, "bit_depth": None}
    try:
        if payload is None or len(payload) < 13:
            return null
        if payload[:6] not in _MAGICS:
            return null
        w, h = struct.unpack_from("<HH", payload, 6)
        packed = payload[10]
        if not (packed & 0x80) or w == 0 or h == 0:
            return null
        return {"n_components": 3, "bit_depth": (packed & 7) + 1}
    except struct.error:
        return null
