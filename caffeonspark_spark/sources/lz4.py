"""From-spec LZ4 codec for the SequenceFile reader/writer (r16).

Same discipline as ``snappy.py``: both layers are public specifications,
no native library —

* the RAW LZ4 block format (lz4 ``lz4_Block_format.md``): a sequence
  stream of ``token`` bytes — high nibble literal length, low nibble
  match length (biased by MINMATCH=4), both 15-extended with
  255-continuation bytes — literals, then a 2-byte little-endian match
  offset (1..65535); the LAST sequence carries literals only.
  Overlapping matches replicate the trailing ``offset`` bytes
  periodically, exactly like Snappy's copies;
* Hadoop's ``Lz4Codec`` wraps raw blocks in the SAME
  ``BlockCompressorStream`` framing as ``SnappyCodec`` — reused from
  ``snappy.py`` (one implementation, no drift).

The COMPRESS side emits a single literal-only sequence (valid for any
input per the spec's "last sequence" rule; verified cross-JVM against
lz4-java, the implementation Hadoop itself uses). Decode is TOTAL:
truncated/corrupt streams raise ``ValueError``.
"""

from __future__ import annotations

from caffeonspark_spark.sources import snappy as _snappy

MINMATCH = 4


def decompress(src) -> bytes:
    """Raw LZ4 block decode (full format, overlap-correct matches)."""
    src = bytes(src)
    out = bytearray()
    pos, n = 0, len(src)
    if n == 0:
        return b""
    while pos < n:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("corrupt lz4: truncated literal length")
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("corrupt lz4: truncated literals")
        out += src[pos : pos + lit_len]
        pos += lit_len
        if pos == n:
            break  # last sequence: literals only, no match
        if pos + 2 > n:
            raise ValueError("corrupt lz4: truncated match offset")
        off = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if off == 0 or off > len(out):
            raise ValueError("corrupt lz4: match offset outside window")
        m_len = (token & 0xF)
        if m_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("corrupt lz4: truncated match length")
                b = src[pos]
                pos += 1
                m_len += b
                if b != 255:
                    break
        m_len += MINMATCH
        start = len(out) - off
        if off >= m_len:
            out += out[start : start + m_len]
        else:  # overlapping match = periodic repetition (RLE idiom)
            pattern = bytes(out[start:])
            reps, rem = divmod(m_len, off)
            out += pattern * reps + pattern[:rem]
    return bytes(out)


def compress(src) -> bytes:
    """Literal-only raw LZ4: one final sequence carrying everything —
    valid per the spec's last-sequence rule for any input length."""
    src = bytes(src)
    n = len(src)
    out = bytearray()
    if n < 15:
        out.append(n << 4)
    else:
        out.append(15 << 4)
        rest = n - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += src
    return bytes(out)


def hadoop_decompress(src) -> bytes:
    """Decode ``Lz4Codec``'s on-stream framing (BlockCompressorStream —
    shared with SnappyCodec)."""
    return _snappy._framed_decompress(src, decompress, "lz4")


def hadoop_compress(src, block_size: int = 256 * 1024) -> bytes:
    """Encode with ``Lz4Codec``'s framing."""
    return _snappy._framed_compress(src, compress, block_size)
