"""Minimal baseline JPEG ENCODER — test fixture only.

Produces spec-valid baseline sequential JPEG streams (ITU-T T.81) so the
decoder tier (``multimodal/jpeg.py``) can be exercised end-to-end in this
codec-less container. Deliberately simple: one mild quantization table,
fixed-length canonical Huffman tables (12 DC symbols at 4 bits; 162 AC
symbols at 9 bits — valid canonical tables, just not entropy-optimal),
4:4:4 or 4:2:0 sampling, no restart markers unless asked.
"""

from __future__ import annotations

import numpy as np

from caffeonspark_spark.multimodal.jpeg import ZIGZAG, _idct_matrix

_M = _idct_matrix()  # orthonormal DCT-II basis; forward = M @ x @ M.T

DC_SYMBOLS = list(range(12))
DC_COUNTS = [0, 0, 0, 12] + [0] * 12  # all 12 categories at length 4
AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
AC_COUNTS = [0] * 8 + [len(AC_SYMBOLS)] + [0] * 7  # all at length 9


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


DC_CODES = _canonical_codes(DC_COUNTS, DC_SYMBOLS)
AC_CODES = _canonical_codes(AC_COUNTS, AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(writer: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int) -> int:
    coef = _M @ (block - 128.0) @ _M.T
    qc = np.rint(coef / q).astype(np.int64)
    zz = qc.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    ln, code = DC_CODES[t]
    writer.put(code, ln)
    if t:
        writer.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = AC_CODES[0xF0]
            writer.put(code, ln)
            run -= 16
        s = _category(v)
        ln, code = AC_CODES[(run << 4) | s]
        writer.put(code, ln)
        writer.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = AC_CODES[0x00]  # EOB
        writer.put(code, ln)
    return dc


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _nn_resample(p: np.ndarray, oh: int, ow: int) -> np.ndarray:
    rows = (np.arange(oh) * p.shape[0]) // oh
    cols = (np.arange(ow) * p.shape[1]) // ow
    return p[np.ix_(rows, cols)]


def encode_baseline_jpeg(
    img: np.ndarray, quant: int = 4, subsample: bool = False, samp=None,
    multiscan: bool = False,
) -> bytes:
    """HWC uint8 (1 or 3 channels, RGB) → baseline JPEG bytes.
    ``subsample=True`` emits 4:2:0 chroma (Y at 2x2 sampling);
    ``samp=[(hy,vy),(hc,vc),(hc,vc)]`` overrides with arbitrary sampling
    factors (chroma nearest-resampled), e.g. the non-divisible 3:2.
    ``multiscan=True`` emits one NON-INTERLEAVED scan per component (the
    spec-legal multi-scan baseline layout, T.81 A.2.2: each scan's MCU is
    one block, raster order over the component's own block grid)."""
    h, w = img.shape[:2]
    channels = img.shape[2] if img.ndim == 3 else 1
    q = np.full((8, 8), float(quant))

    if channels == 1:
        planes = [img.reshape(h, w).astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if samp is not None:
            hmax0 = max(s[0] for s in samp)
            vmax0 = max(s[1] for s in samp)
            resampled = []
            for p, (sh, sv) in zip([y, cb, cr], samp):
                oh, ow = -(-h * sv // vmax0), -(-w * sh // hmax0)
                resampled.append(
                    p if (sh, sv) == (hmax0, vmax0) else _nn_resample(p, oh, ow)
                )
            y, cb, cr = resampled
        elif subsample:
            ph, pw = (-h) % 2, (-w) % 2
            cbp = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            crp = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = [
        _pad_to(p, mcus_y * 8 * sv, mcus_x * 8 * sh)
        for p, (sh, sv) in zip(planes, samp)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0, 8-bit)
    zzq = q.reshape(64)[ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00" + zzq.tobytes()
    # SOF0
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    # DHT: DC table 0 + AC table 0
    dht = bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMBOLS)
    dht += bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_SYMBOLS)
    out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    if multiscan and len(planes) > 1:
        # one non-interleaved scan per component, block raster over the
        # component's own grid (ceil(comp_w/8) x ceil(comp_h/8))
        for ci, (sh, sv) in enumerate(samp):
            sos = bytes([1, ci + 1, 0x00, 0, 63, 0])
            out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
            comp_w = -(-w * sh // hmax)
            comp_h = -(-h * sv // vmax)
            writer = _BitWriter()
            pred = 0
            for by in range(-(-comp_h // 8)):
                for bx in range(-(-comp_w // 8)):
                    block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    pred = _encode_block(writer, block, q, pred)
            out += writer.flush()
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # SOS
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    writer = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(writer, block, q, preds[ci])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
