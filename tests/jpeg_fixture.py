"""Minimal JPEG ENCODER — test fixture only.

Produces spec-valid JPEG streams (ITU-T T.81) so the decoder tier
(``multimodal/jpeg.py``) can be exercised end-to-end in this codec-less
container. Deliberately simple: one mild quantization table, fixed-length
canonical Huffman tables (12 DC symbols at 4 bits; 176 AC symbols at 9
bits — valid canonical tables, just not entropy-optimal), 4:4:4 or 4:2:0
sampling, no restart markers unless asked.

Three stream layouts:

- ``encode_baseline_jpeg(...)`` — sequential SOF0, one fully-interleaved
  scan; ``multiscan=True`` for one non-interleaved scan per component
  (T.81 A.2.2); ``scan_groups=[(0, 1), (2,)]`` for arbitrary grouping
  including the spec-legal PARTIALLY-interleaved layout (T.81 A.2.3).
- ``encode_progressive_jpeg(...)`` — progressive SOF2 with the
  libjpeg-style default scan script: spectral selection + successive
  approximation, DC/AC first and refinement scans, EOB-run coding
  (T.81 G.1.2) — the same quantized coefficients as the baseline stream,
  so both must decode to identical pixels.
"""

from __future__ import annotations

import numpy as np

from caffeonspark_spark.multimodal.jpeg import ZIGZAG, _idct_matrix

_M = _idct_matrix()  # orthonormal DCT-II basis; forward = M @ x @ M.T

DC_SYMBOLS = list(range(12))
DC_COUNTS = [0, 0, 0, 12] + [0] * 12  # all 12 categories at length 4
# AC: EOBn (r<<4|0 for r=0..14, progressive end-of-band runs; r=0 is the
# baseline EOB), ZRL (0xF0), and every (run, size) pair size 1-10
AC_SYMBOLS = [r << 4 for r in range(15)] + [0xF0] + [
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

    def rst(self, n: int) -> None:
        """Pad-flush to a byte boundary and emit RSTn (raw marker bytes,
        never byte-stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _nn_resample(p: np.ndarray, oh: int, ow: int) -> np.ndarray:
    rows = (np.arange(oh) * p.shape[0]) // oh
    cols = (np.arange(ow) * p.shape[1]) // ow
    return p[np.ix_(rows, cols)]


def _prepare(img: np.ndarray, quant: int, subsample: bool, samp):
    """Shared pixel→plane setup: color convert, resample chroma, pad each
    plane to its MCU grid, quantize every block. Returns
    (h, w, samp, q, blocks) with ``blocks[ci]`` the (by, bx, 64) int64
    quantized coefficients in ZIGZAG-index order over the padded grid."""
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
    blocks = []
    for p, (sh, sv) in zip(planes, samp):
        padded = _pad_to(p, mcus_y * 8 * sv, mcus_x * 8 * sh)
        by_n, bx_n = padded.shape[0] // 8, padded.shape[1] // 8
        b4 = padded.reshape(by_n, 8, bx_n, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ua,yxab,vb->yxuv", _M, b4, _M)
        qc = np.rint(coef / q).astype(np.int64).reshape(by_n, bx_n, 64)
        blocks.append(qc[:, :, ZIGZAG])  # natural → zigzag-index order
    return h, w, samp, q, blocks


def _headers(h, w, samp, q, sof_marker: bytes) -> bytearray:
    out = bytearray(b"\xff\xd8")  # SOI
    zzq = q.reshape(64)[ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00" + zzq.tobytes()
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(samp)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += sof_marker + (2 + len(sof)).to_bytes(2, "big") + sof
    dht = bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMBOLS)
    dht += bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_SYMBOLS)
    out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    return out


def _block_order(group, h, w, samp):
    """Block visit order for one scan: interleaved MCU raster over the
    frame MCU grid when the group has >1 component, else the single
    component's own (unpadded) block grid raster — mirrors the decoder."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    order = []
    if len(group) == 1:
        ci = group[0]
        sh, sv = samp[ci]
        comp_w = -(-w * sh // hmax)
        comp_h = -(-h * sv // vmax)
        for by in range(-(-comp_h // 8)):
            for bx in range(-(-comp_w // 8)):
                order.append((ci, by, bx))
    else:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in group:
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            order.append((ci, my * sv + by, mx * sh + bx))
    return order


def _sos_header(group, ss, se, ah, al) -> bytes:
    sos = bytes([len(group)])
    for ci in group:
        sos += bytes([ci + 1, 0x00])
    sos += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos


def _emit_dc_diff(writer, diff: int) -> None:
    t = _category(diff)
    ln, code = DC_CODES[t]
    writer.put(code, ln)
    if t:
        writer.put(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _dri_segment(restart_interval: int) -> bytes:
    return b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")


def encode_baseline_jpeg(
    img: np.ndarray, quant: int = 4, subsample: bool = False, samp=None,
    multiscan: bool = False, scan_groups=None, restart_interval: int = 0,
) -> bytes:
    """HWC uint8 (1 or 3 channels, RGB) → baseline JPEG bytes.
    ``subsample=True`` emits 4:2:0 chroma (Y at 2x2 sampling);
    ``samp=[(hy,vy),(hc,vc),(hc,vc)]`` overrides with arbitrary sampling
    factors (chroma nearest-resampled), e.g. the non-divisible 3:2.
    ``multiscan=True`` emits one NON-INTERLEAVED scan per component;
    ``scan_groups`` emits one scan per component-index tuple — a group of
    several-but-not-all components is the partially-interleaved layout.
    ``restart_interval`` > 0 emits DRI + RSTn every that-many MCUs (DC
    predictors reset per spec; a non-interleaved scan's MCU is 1 block)."""
    h, w, samp, q, blocks = _prepare(img, quant, subsample, samp)
    ncomp = len(samp)
    if scan_groups is None:
        scan_groups = (
            [(ci,) for ci in range(ncomp)] if multiscan and ncomp > 1
            else [tuple(range(ncomp))]
        )
    out = _headers(h, w, samp, q, b"\xff\xc0")
    if restart_interval:
        out += _dri_segment(restart_interval)
    for group in scan_groups:
        out += _sos_header(group, 0, 63, 0, 0)
        writer = _BitWriter()
        preds = dict.fromkeys(group, 0)
        mcu_blocks = (
            1 if len(group) == 1
            else sum(samp[ci][0] * samp[ci][1] for ci in group)
        )
        rst_n = 0
        for i, (ci, by, bx) in enumerate(_block_order(group, h, w, samp)):
            if (
                restart_interval
                and i
                and i % (restart_interval * mcu_blocks) == 0
            ):
                writer.rst(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = dict.fromkeys(group, 0)
            zz = blocks[ci][by, bx]
            dc = int(zz[0])
            _emit_dc_diff(writer, dc - preds[ci])
            preds[ci] = dc
            nz = np.nonzero(zz[1:])[0]
            last_nz = int(nz[-1]) + 1 if len(nz) else 0
            run = 0
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
        out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


#: libjpeg-style default progressive scan script entries:
#: (component-index group, Ss, Se, Ah, Al)
_PROGRESSIVE_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),  # DC first, all components, Al=1
    ((0,), 1, 5, 0, 2),       # Y low AC first
    ((1,), 1, 63, 0, 1),      # Cb AC first
    ((2,), 1, 63, 0, 1),      # Cr AC first
    ((0,), 6, 63, 0, 2),      # Y high AC first
    ((0,), 1, 63, 2, 1),      # Y AC refine 2→1
    ((0, 1, 2), 0, 0, 1, 0),  # DC refine
    ((1,), 1, 63, 1, 0),      # Cb AC refine
    ((2,), 1, 63, 1, 0),      # Cr AC refine
    ((0,), 1, 63, 1, 0),      # Y AC refine 1→0
]
_PROGRESSIVE_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


class _AcState:
    """EOB-run + buffered correction bits, shared across blocks of one
    progressive AC scan (jcphuff-style)."""

    def __init__(self, writer):
        self.writer = writer
        self.eobrun = 0
        self.bebits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            ln, code = AC_CODES[nbits << 4]
            self.writer.put(code, ln)
            if nbits:
                self.writer.put(self.eobrun, nbits)  # low nbits of the run
            self.eobrun = 0
        for b in self.bebits:
            self.writer.put(b, 1)
        self.bebits = []


def _emit_ac_first_block(state, zz, ss, se, al) -> None:
    writer = state.writer
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (v >> al) if v >= 0 else -((-v) >> al)  # point transform
        if t == 0:
            r += 1
            continue
        state.flush_eobrun()
        while r > 15:
            ln, code = AC_CODES[0xF0]
            writer.put(code, ln)
            r -= 16
        s = _category(t)
        ln, code = AC_CODES[(r << 4) | s]
        writer.put(code, ln)
        writer.put(t if t >= 0 else t + (1 << s) - 1, s)
        r = 0
    if r > 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()


def _emit_ac_refine_block(state, zz, ss, se, al) -> None:
    writer = state.writer
    absvals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_rel = -1  # position (relative to ss) of the last newly-nonzero coef
    for i, t in enumerate(absvals):
        if t == 1:
            eob_rel = i
    r = 0
    br: list[int] = []  # correction bits owed to the pending run
    for i, t in enumerate(absvals):
        if t == 0:
            r += 1
            continue
        # ZRLs only when they cannot fold into the EOB run
        while r > 15 and i <= eob_rel:
            state.flush_eobrun()
            ln, code = AC_CODES[0xF0]
            writer.put(code, ln)
            r -= 16
            for b in br:
                writer.put(b, 1)
            br = []
        if t > 1:
            # previously nonzero: just the next magnitude bit
            br.append(t & 1)
            continue
        # newly nonzero (magnitude exactly 1 at this precision)
        state.flush_eobrun()
        ln, code = AC_CODES[(r << 4) | 1]
        writer.put(code, ln)
        writer.put(1 if int(zz[ss + i]) >= 0 else 0, 1)  # sign bit
        for b in br:
            writer.put(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state.eobrun += 1
        state.bebits.extend(br)
        if state.eobrun == 0x7FFF or len(state.bebits) > 900:
            state.flush_eobrun()


def encode_progressive_jpeg(
    img: np.ndarray, quant: int = 4, subsample: bool = False, samp=None,
    scans=None, restart_interval: int = 0,
) -> bytes:
    """HWC uint8 → progressive (SOF2) JPEG bytes carrying the exact same
    quantized coefficients as ``encode_baseline_jpeg`` with the same
    arguments, via successive approximation + spectral selection.
    ``scans`` overrides the default script with (group, Ss, Se, Ah, Al)
    tuples; every coefficient bit must reach Al=0 for a full-fidelity
    stream. ``restart_interval`` > 0 emits DRI + RSTn every that-many
    MCUs in every scan (DC predictors AND the EOB-run reset per spec)."""
    h, w, samp, q, blocks = _prepare(img, quant, subsample, samp)
    if scans is None:
        scans = (
            _PROGRESSIVE_SCRIPT_GRAY if len(samp) == 1
            else _PROGRESSIVE_SCRIPT_COLOR
        )
    out = _headers(h, w, samp, q, b"\xff\xc2")
    if restart_interval:
        out += _dri_segment(restart_interval)
    for group, ss, se, ah, al in scans:
        out += _sos_header(group, ss, se, ah, al)
        writer = _BitWriter()
        order = _block_order(group, h, w, samp)
        mcu_blocks = (
            1 if len(group) == 1
            else sum(samp[ci][0] * samp[ci][1] for ci in group)
        )
        rst_n = 0
        preds = dict.fromkeys(group, 0)
        state = _AcState(writer)

        def at_restart(i):
            # between MCUs: flush any pending EOB-run + buffered correction
            # bits, pad to a byte boundary, emit RSTn, reset predictors
            return restart_interval and i and i % (restart_interval * mcu_blocks) == 0

        for i, (ci, by, bx) in enumerate(order):
            if at_restart(i):
                state.flush_eobrun()
                writer.rst(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = dict.fromkeys(group, 0)
            zz = blocks[ci][by, bx]
            if ss == 0 and ah == 0:  # DC first
                dc = int(zz[0]) >> al  # arithmetic shift
                _emit_dc_diff(writer, dc - preds[ci])
                preds[ci] = dc
            elif ss == 0:  # DC refine: one raw bit per block
                writer.put((int(zz[0]) >> al) & 1, 1)
            elif ah == 0:  # AC first
                _emit_ac_first_block(state, zz, ss, se, al)
            else:  # AC refine
                _emit_ac_refine_block(state, zz, ss, se, al)
        state.flush_eobrun()
        out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
