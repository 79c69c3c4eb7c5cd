"""From-spec PNG decoder (RFC 2083 / ISO 15948) — pure Python + numpy.

Closes the last container gap vs the reference's ``Mat.decode`` (OpenCV
``imdecode``, ``Mat.java:58-63``) in this codec-less environment: zlib is
stdlib, so PNG needs no external codec library. Production environments
install Pillow/OpenCV and never reach this tier; the Spark-side plumbing
(Arrow batches, schemas) is identical either way.

Scope (the tier contract, mirroring ``jpeg.py``): every spec-legal
depth/color combination — 1/2/4-bit gray and palette (sub-byte
grayscale scales to full range, 1-bit → 0/255, like imdecode), 8-bit
everything, 16-bit gray/RGB/alpha (high byte kept, OpenCV's 16→8
behavior for 8-bit consumers); color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters;
non-interlaced AND Adam7 interlaced. Only spec-ILLEGAL combinations
(16-bit palette, sub-byte multi-channel) raise the install-hint
ValueError. Output is HWC uint8 in the file's natural channel count
with RGB order — the caller (``columns._numpy_decode``) applies the
BGR/channel contract.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

_INSTALL_HINT = (
    "not supported by the numpy-native PNG codec; install Pillow or "
    "opencv-python for this stream"
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters. Filters 0-2 are vectorized
    (uint8 arithmetic wraps mod 256, exactly the PNG recon semantics);
    3-4 carry a left-neighbor dependency and run per byte."""
    if len(raw) < height * (stride + 1):
        raise ValueError("malformed or truncated PNG stream")
    out = np.zeros((height, stride), np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += stride + 1
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 1:  # Sub: cumulative sum per bpp lane, wraps mod 256
            lanes = row.reshape(-1, bpp) if stride % bpp == 0 else None
            if lanes is not None:
                out[y] = np.add.accumulate(lanes, axis=0, dtype=np.uint8).reshape(-1)
            else:  # pragma: no cover - stride is always a bpp multiple
                acc = row.copy()
                for x in range(bpp, stride):
                    acc[x] = (int(acc[x]) + int(acc[x - bpp])) & 0xFF
                out[y] = acc
        elif ftype == 2:  # Up
            out[y] = row + prev
        elif ftype == 3:  # Average
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → HWC uint8 (RGB order, natural channel count)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG stream")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise ValueError("malformed or truncated PNG stream")
        pos += 12 + length  # length + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            if len(chunk) != 13:
                raise ValueError("malformed PNG IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG stream has no IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if width == 0 or height == 0:
        raise ValueError("degenerate PNG dimensions")
    if width * height > 1 << 30:
        # OpenCV's CV_IO_MAX_IMAGE_PIXELS decode-bomb cap: refuse before
        # any output-sized allocation
        raise ValueError("PNG dimensions exceed the 2^30-pixel cap")
    if comp != 0 or filt != 0 or color not in _CHANNELS:
        raise ValueError("malformed PNG header")
    if depth not in (1, 2, 4, 8, 16) or (depth == 16 and color == 3) or (
        depth < 8 and color not in (0, 3)
    ):
        raise ValueError(f"{depth}-bit PNG {_INSTALL_HINT}")
    if interlace not in (0, 1):
        raise ValueError("malformed PNG header")
    if not idat:
        raise ValueError("PNG stream has no IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"malformed or truncated PNG stream: {exc}") from None
    nch = _CHANNELS[color]
    if interlace == 0:
        arr, _ = _decode_pass(raw, height, width, nch, depth, color)
    else:  # Adam7: seven independently-filtered sub-images in one stream
        # validate the claimed geometry against the ACTUAL decompressed
        # byte count BEFORE allocating height*width*nch — a corrupt header
        # claiming 2^32-wide dims over a tiny IDAT must raise ValueError,
        # not MemoryError (the decoder-totality contract)
        passes = []
        total_need = 0
        for x0, y0, dx, dy in ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            stride = (pw * nch * depth + 7) // 8
            total_need += ph * (stride + 1)
            passes.append((x0, y0, dx, dy, pw, ph))
        if len(raw) < total_need:
            raise ValueError("malformed or truncated PNG stream")
        arr = np.zeros((height, width, nch), np.uint8)
        pos = 0
        for x0, y0, dx, dy, pw, ph in passes:
            sub, used = _decode_pass(raw[pos:], ph, pw, nch, depth, color)
            pos += used
            arr[y0:height:dy, x0:width:dx] = sub
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG stream has no PLTE")
        idx = arr[:, :, 0]
        if int(idx.max()) >= len(palette):
            raise ValueError("PNG palette index out of range")
        arr = palette[idx]
    return np.ascontiguousarray(arr)


#: Adam7 pass origins and strides (x0, y0, dx, dy), spec order
ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _decode_pass(
    raw: bytes, h: int, w: int, nch: int, depth: int, color: int
) -> tuple[np.ndarray, int]:
    """Unfilter + unpack one (sub-)image of ``raw``; returns the
    (h, w, nch) uint8 samples and the bytes consumed. 16-bit samples keep
    the high byte (OpenCV's 16→8 downscale for 8-bit consumers);
    sub-byte grayscale scales to full range (1-bit → 0/255, like
    imdecode); sub-byte palette indices pass through."""
    if depth >= 8:
        bpp = nch * (depth // 8)
        stride = w * bpp
        used = h * (stride + 1)
        rows = _unfilter(raw[:used], h, stride, bpp)
        if depth == 8:
            return rows.reshape(h, w, nch), used
        return rows.reshape(h, w, nch, 2)[:, :, :, 0].copy(), used
    # sub-byte (1/2/4-bit gray or palette): filters run with bpp=1 over the
    # byte-packed scanline; samples are MSB-first bit groups, row-padded
    stride = (w * depth + 7) // 8
    used = h * (stride + 1)
    rows = _unfilter(raw[:used], h, stride, 1)
    bits = np.unpackbits(rows, axis=1)  # (h, stride*8), MSB first
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (bits.reshape(h, -1, depth) * weights).sum(axis=2).astype(np.uint8)
    samples = samples[:, :w]
    if color == 0:
        samples = (samples.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    return samples[:, :, None], used
