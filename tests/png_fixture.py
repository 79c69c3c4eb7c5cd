"""Minimal PNG ENCODER — test fixture only.

Emits spec-valid 8-bit non-interlaced PNG streams so the from-spec
decoder tier (``multimodal/png.py``) can be exercised end-to-end in this
codec-less container. Supports color types 0/2/3/4/6 and a per-row
filter-type override to exercise every unfilter path (the decoder must
invert whatever filter each row declares).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from caffeonspark_spark.multimodal.png import PNG_SIGNATURE, _paeth

_COLOR_BY_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    r = row.astype(int)
    p = prev.astype(int)
    out = np.zeros(len(row), int)
    for x in range(len(row)):
        left = r[x - bpp] if x >= bpp else 0
        ul = p[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = p[x]
        elif ftype == 3:
            pred = (left + p[x]) >> 1
        else:
            pred = _paeth(left, p[x], ul)
        out[x] = (r[x] - pred) & 0xFF
    return bytes([ftype]) + bytes(out.astype(np.uint8))


def _row_bytes(row_px: np.ndarray, depth: int) -> np.ndarray:
    """One pixel row (w, c) → the scanline byte vector (big-endian for
    16-bit samples; MSB-first bit-packed, zero-padded to the byte
    boundary, for sub-byte depths)."""
    if depth == 8:
        return row_px.reshape(-1).astype(np.uint8)
    if depth == 16:
        be = row_px.reshape(-1).astype(">u2")
        return np.frombuffer(be.tobytes(), np.uint8)
    vals = row_px.reshape(-1).astype(np.uint8)
    bits = ((vals[:, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1))


def _filtered_image(img: np.ndarray, filters, depth: int) -> bytes:
    h = img.shape[0]
    c = img.shape[2]
    bpp = max(1, c * (depth // 8))  # sub-byte depths filter with bpp=1
    raw = bytearray()
    prev = np.zeros((img.shape[1] * c * depth + 7) // 8, np.uint8)
    for y in range(h):
        row = _row_bytes(img[y], depth)
        ftype = filters[y % len(filters)] if filters else y % 5
        raw += _filter_row(ftype, row, prev, bpp)
        prev = row
    return bytes(raw)


def encode_png(
    img: np.ndarray,
    filters=None,
    palette: np.ndarray | None = None,
    interlace: int = 0,
    depth: int = 8,
) -> bytes:
    """HWC uint8 (or uint16 with ``depth=16``) → PNG bytes. ``filters``
    is a per-row filter-type list (default: cycle through 0-4);
    ``interlace=1`` emits a real Adam7 stream (7 independently filtered
    passes). Pass ``palette`` (N×3 uint8) with a 1-channel index image
    for color type 3."""
    from caffeonspark_spark.multimodal.png import ADAM7_PASSES

    h, w, c = img.shape
    color = 3 if palette is not None else _COLOR_BY_CHANNELS[c]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    if interlace == 0:
        raw = _filtered_image(img, filters, depth)
    else:
        raw = b"".join(
            _filtered_image(img[y0:h:dy, x0:w:dx], filters, depth)
            for x0, y0, dx, dy in ADAM7_PASSES
            if img[y0:h:dy, x0:w:dx].shape[0] and img[y0:h:dy, x0:w:dx].shape[1]
        )
    out = bytearray(PNG_SIGNATURE)
    out += _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return bytes(out)
