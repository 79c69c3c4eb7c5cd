"""From-spec baseline TIFF 6.0 decoder (no codec library).

Completes the ``Mat.decode`` container-parity story
(``caffe-distri/src/main/java/com/yahoo/ml/jcaffe/Mat.java:58-63`` —
OpenCV ``imdecode`` accepts TIFF alongside JPEG/PNG/BMP/netpbm): the
numpy tier decodes baseline TIFF — both byte orders (II/MM), 8-bit
grayscale (both photometric polarities), 8-bit RGB, 8-bit palette,
1-bit bilevel, strip organization, Compression 1 (none), 32773
(PackBits), and 5 (LZW, the libtiff early-change rule, optional
horizontal-differencing Predictor 2). Everything else (tiles, planar
separate, 16-bit, JPEG-in-TIFF, deflate) raises the same install-hint
ValueError as the other from-spec tiers.

Output contract: HWC uint8, RGB channel order for color (the caller
flips to BGR for Mat parity), 1 channel for grayscale/bilevel.
Decode-bomb cap: 2^30 pixels, matching the JPEG/PNG tiers (OpenCV's own
default limit class).
"""

from __future__ import annotations

import numpy as np

_PIXEL_CAP = 1 << 30


def _packbits(src: bytes, expect: int) -> bytes:
    """Apple PackBits: n in [0,127] → copy n+1 literals; n in [-127,-1] →
    repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expect:
        b = src[i]
        i += 1
        if b < 128:
            if i + b + 1 > n:
                raise ValueError("malformed TIFF: PackBits literal overruns")
            out += src[i : i + b + 1]
            i += b + 1
        elif b > 128:
            if i >= n:
                raise ValueError("malformed TIFF: PackBits run overruns")
            out += bytes([src[i]]) * (257 - b)
            i += 1
        # b == 128: no-op
    if len(out) < expect:
        raise ValueError("malformed TIFF: PackBits strip too short")
    return bytes(out[:expect])


def _lzw(src: bytes, expect: int) -> bytes:
    """TIFF-flavor LZW (spec §13): MSB-first codes, Clear=256, EOI=257,
    9→12-bit widths with the libtiff EARLY-CHANGE rule (width grows when
    the next free entry reaches (1<<width)-1, one entry before classic
    LZW)."""
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256 Clear
        table.append(b"")  # 257 EOI
        return 9

    width = reset()
    bitbuf = bitcnt = 0
    pos, n = 0, len(src)
    prev: bytes | None = None
    while len(out) < expect:
        while bitcnt < width:
            if pos >= n:
                raise ValueError("malformed TIFF: LZW strip too short")
            bitbuf = (bitbuf << 8) | src[pos]
            pos += 1
            bitcnt += 8
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == 257:  # EOI
            break
        if code == 256:  # Clear
            width = reset()
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("malformed TIFF: LZW code before table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("malformed TIFF: LZW code out of range")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by exactly one entry (the first code after Clear adds
        # nothing), so where the encoder grows width at next_code ==
        # (1<<width)-1, the decoder grows one entry earlier in its own
        # count — TIFF6 §13 / libtiff's "maxcode - 1" rule
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("malformed TIFF: LZW strip too short")
    return bytes(out[:expect])


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF → HWC uint8 (RGB for color, 1 channel for gray)."""
    data = bytes(data)
    if data[:4] == b"II\x2a\x00":
        bo = "<"
    elif data[:4] == b"MM\x00\x2a":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream")

    def u16(off: int) -> int:
        if off + 2 > len(data):
            raise ValueError("malformed TIFF: truncated header field")
        return int(np.frombuffer(data, f"{bo}u2", 1, off)[0])

    def u32(off: int) -> int:
        if off + 4 > len(data):
            raise ValueError("malformed TIFF: truncated header field")
        return int(np.frombuffer(data, f"{bo}u4", 1, off)[0])

    ifd = u32(4)
    if ifd + 2 > len(data):
        raise ValueError("malformed TIFF: IFD offset overruns")
    n_entries = u16(ifd)
    _SIZES = {1: 1, 2: 1, 3: 2, 4: 4}

    def values(off: int) -> list[int]:
        typ, cnt = u16(off + 2), u32(off + 4)
        if typ not in _SIZES:
            raise ValueError("malformed TIFF: unsupported tag type")
        size = _SIZES[typ] * cnt
        if cnt > (1 << 24):
            raise ValueError("malformed TIFF: tag count bomb")
        vo = off + 8 if size <= 4 else u32(off + 8)
        if vo + size > len(data):
            raise ValueError("malformed TIFF: tag values overrun")
        dt = {1: "u1", 2: "u1", 3: "u2", 4: "u4"}[typ]
        return [int(x) for x in np.frombuffer(data, f"{bo}{dt}", cnt, vo)]

    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd + 2 + 12 * i
        tags[u16(off)] = values(off)

    def one(tag: int, default: int) -> int:
        vals = tags.get(tag)
        if vals is None:
            return default
        if not vals:
            raise ValueError("malformed TIFF: empty tag value")
        return vals[0]

    w, h = one(256, 0), one(257, 0)
    bits = tags.get(258, [1])
    if not bits:
        raise ValueError("malformed TIFF: empty BitsPerSample")
    spp = one(277, 1)
    comp = one(259, 1)
    photo = one(262, 1)
    rps = one(278, 0xFFFFFFFF)
    planar = one(284, 1)
    predictor = one(317, 1)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not w or not h or offsets is None or counts is None:
        raise ValueError("malformed TIFF: missing required tags")
    if w * h > _PIXEL_CAP:
        raise ValueError("TIFF dimensions exceed the decode cap")
    if len(offsets) != len(counts):
        raise ValueError("malformed TIFF: strip offset/count mismatch")
    if (
        planar != 1
        or comp not in (1, 5, 32773)
        or photo not in (0, 1, 2, 3)
        or len(bits) != spp
        or not (
            (spp == 1 and bits[0] in (1, 8, 16))
            or (spp == 3 and bits in ([8, 8, 8], [16, 16, 16]))
        )
        or (photo == 2) != (spp == 3)
        or (photo == 3 and (spp != 1 or bits[0] != 8))
        or (bits[0] != 8 and predictor == 2)
        or predictor not in (1, 2)
        or 322 in tags  # TileWidth: tiled layout
    ):
        raise ValueError(
            "codec-free TIFF path supports chunky baseline strips only "
            "(8/16-bit gray/RGB, 8-bit palette, 1-bit bilevel; "
            "none/PackBits/LZW) — install Pillow or opencv-python for "
            "other TIFF classes"
        )
    row_bytes = (w * spp * bits[0] + 7) // 8
    rps = min(rps, h)
    if rps == 0 or len(offsets) != (h + rps - 1) // rps:
        raise ValueError("malformed TIFF: strip grid mismatch")
    rows = []
    for s, (so, sc) in enumerate(zip(offsets, counts)):
        n_rows = min(rps, h - s * rps)
        expect = row_bytes * n_rows
        if so + sc > len(data):
            raise ValueError("malformed TIFF: strip overruns buffer")
        raw = data[so : so + sc]
        if comp == 32773:
            raw = _packbits(raw, expect)
        elif comp == 5:
            raw = _lzw(raw, expect)
        elif len(raw) < expect:
            raise ValueError("malformed TIFF: uncompressed strip too short")
        strip = np.frombuffer(raw, np.uint8, expect).reshape(n_rows, row_bytes)
        if predictor == 2:
            strip = np.cumsum(
                strip.reshape(n_rows, w, spp).astype(np.uint32), axis=1
            ).astype(np.uint8).reshape(n_rows, row_bytes)
        rows.append(strip)
    img = np.concatenate(rows, axis=0)
    if bits[0] == 16:
        # high byte kept — the same 16→8 downscale as the PNG tier
        # (OpenCV's convention for 8-bit consumers); samples follow the
        # file's byte order
        wide = (
            img.reshape(h, w * spp, 2).astype(np.uint16)
        )
        hi = wide[:, :, 0] if bo == ">" else wide[:, :, 1]
        arr = hi.astype(np.uint8).reshape(h, w, spp)
        if photo == 0:
            arr = 255 - arr
        return np.ascontiguousarray(arr)
    if bits[0] == 1:
        pix = np.unpackbits(img, axis=1)[:, :w]
        arr = (pix * 255).astype(np.uint8)
        if photo == 0:  # WhiteIsZero: 0 bit = white
            arr = 255 - arr
        return arr.reshape(h, w, 1)
    arr = img.reshape(h, w, spp)
    if photo == 0:
        arr = 255 - arr
    elif photo == 3:
        cmap = tags.get(320)
        if cmap is None or len(cmap) != 3 * 256:
            raise ValueError("malformed TIFF: palette image missing ColorMap")
        pal = (np.array(cmap, dtype=np.uint32).reshape(3, 256).T >> 8).astype(
            np.uint8
        )
        arr = pal[arr[:, :, 0]]
    return np.ascontiguousarray(arr)
