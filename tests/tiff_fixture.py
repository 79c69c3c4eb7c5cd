"""Baseline TIFF fixture encoder — the test twin of
``multimodal/tiff.py``: both byte orders, gray/RGB/palette/bilevel,
strips, Compression none/PackBits/LZW (+Predictor 2). The LZW encoder
mirrors the spec/libtiff early-change rule so encoder and decoder widths
stay in lock-step; decoder correctness against the SPEC (not just this
encoder) is pinned separately by a hand-derived code-sequence vector in
the tests."""

from __future__ import annotations

import numpy as np


def packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 1 < n and row[j] == row[j + 1])
            ):
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def lzw_encode(src: bytes) -> bytes:
    """TIFF LZW with the early-change width rule (mirror of _lzw)."""
    codes: list[tuple[int, int]] = []
    table: dict[bytes, int] = {}

    def reset() -> int:
        table.clear()
        for i in range(256):
            table[bytes([i])] = i
        return 9

    width = reset()
    next_code = 258
    codes.append((256, width))
    w = b""
    for ch in src:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        codes.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code > 4093:  # keep headroom; emit Clear and restart
            codes.append((256, width))
            width = reset()
            next_code = 258
        w = c
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    return pack_codes(codes)


def pack_codes(codes: list[tuple[int, int]]) -> bytes:
    """MSB-first bit packing of (code, width) pairs."""
    bitbuf = bitcnt = 0
    out = bytearray()
    for code, width in codes:
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int = 0,
    photometric: int | None = None,
    palette: list[tuple[int, int, int]] | None = None,
    predictor: int = 1,
    bilevel: bool = False,
) -> bytes:
    """HWC uint8 (1 or 3 channels; palette images pass indices + palette;
    bilevel expects 0/1 indices; a uint16 array writes a 16-bit file in
    the chosen byte order) → baseline strip TIFF bytes."""
    bo = ">" if big_endian else "<"
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 or img.shape[2] == 1 else img.shape[2]
    flat = img.reshape(h, w, spp)
    wide = img.dtype == np.uint16
    if palette is not None:
        photo = 3
        bits = [8]
    elif bilevel:
        photo = 1 if photometric is None else photometric
        bits = [1]
    elif spp == 3:
        photo = 2
        bits = [16] * 3 if wide else [8, 8, 8]
    else:
        photo = 1 if photometric is None else photometric
        bits = [16] if wide else [8]
        if photo == 0:
            flat = (65535 if wide else 255) - flat
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        rows = flat[y0 : y0 + rps]
        if bilevel:
            raw = np.packbits(rows[:, :, 0] & 1, axis=1).tobytes()
        elif predictor == 2:
            d = rows.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            raw = (d & 0xFF).astype(np.uint8).tobytes()
        elif wide:
            raw = rows.astype(f"{bo}u2").tobytes()
        else:
            raw = rows.tobytes()
        if compression == 32773:
            n_rows = rows.shape[0]
            rb = len(raw) // n_rows
            raw = b"".join(
                packbits_encode(raw[r * rb : (r + 1) * rb]) for r in range(n_rows)
            )
        elif compression == 5:
            raw = lzw_encode(raw)
        strips.append(raw)

    def u16(v: int) -> bytes:
        return int(v).to_bytes(2, "big" if big_endian else "little")

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, "big" if big_endian else "little")

    entries = []  # (tag, type, count, packed-value-or-None, ext-values)

    def tag(t: int, typ: int, vals: list[int]) -> None:
        entries.append((t, typ, vals))

    tag(256, 3, [w])
    tag(257, 3, [h])
    tag(258, 3, bits)
    tag(259, 3, [compression])
    tag(262, 3, [photo])
    tag(277, 3, [spp])
    tag(278, 3, [rps])
    tag(279, 4, [len(s) for s in strips])
    if predictor == 2:
        tag(317, 3, [predictor])
    if palette is not None:
        cmap = []
        pal = list(palette) + [(0, 0, 0)] * (256 - len(palette))
        for c in range(3):
            cmap += [p[c] << 8 for p in pal]
        tag(320, 3, cmap)
    # strip offsets resolved after layout
    tag(273, 4, [0] * len(strips))
    entries.sort(key=lambda e: e[0])

    header = (b"MM\x00\x2a" if big_endian else b"II\x2a\x00") + u32(8)
    ifd_off = 8
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()
    packed = {}
    sizes = {3: 2, 4: 4}
    for t, typ, vals in entries:
        size = sizes[typ] * len(vals)
        if size <= 4:
            buf = b"".join((u16(v) if typ == 3 else u32(v)) for v in vals)
            packed[t] = buf + b"\x00" * (4 - size)
        else:
            packed[t] = u32(ext_off + len(ext))
            ext += b"".join((u16(v) if typ == 3 else u32(v)) for v in vals)
    data_off = ext_off + len(ext)
    offs = []
    for s in strips:
        offs.append(data_off)
        data_off += len(s)
    # rewrite the strip-offset values now that layout is known
    so_size = 4 * len(strips)
    if so_size <= 4:
        packed[273] = b"".join(u32(o) for o in offs) + b"\x00" * (4 - so_size)
    else:
        # offsets live in ext at the position reserved above
        pos = int.from_bytes(packed[273], "big" if big_endian else "little") - ext_off
        ext[pos : pos + so_size] = b"".join(u32(o) for o in offs)
    out = bytearray(header)
    out += u16(n)
    for t, typ, vals in entries:
        out += u16(t) + u16(typ) + u32(len(vals)) + packed[t]
    out += u32(0)  # next IFD
    out += ext
    for s in strips:
        out += s
    return bytes(out)
