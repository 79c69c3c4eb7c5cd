"""From-spec Snappy codec for the SequenceFile reader/writer (r16).

Snappy is the most common real-world SequenceFile codec, and both
layers needed to read Hadoop's are public specifications, so this
follows the same from-spec discipline as the LMDB/SequenceFile/JPEG
codecs — no native library:

* the RAW Snappy block format (google/snappy ``format_description.txt``):
  little-endian-varint uncompressed length, then a tag stream of
  literals and back-references — copy-1 (3-bit length 4-11, 11-bit
  offset), copy-2 (6-bit length, 16-bit LE offset), copy-4 (32-bit LE
  offset); overlapping copies replicate the trailing ``offset`` bytes
  periodically;
* Hadoop's ``BlockCompressorStream`` framing used by ``SnappyCodec``
  (``org.apache.hadoop.io.compress.BlockCompressorStream``): repeated
  ``[4-byte BE uncompressed block length][per chunk: 4-byte BE
  compressed length + raw-snappy chunk]`` until each block's
  uncompressed length is produced.

The COMPRESS side emits literal-only raw Snappy — every literal-only
stream is valid per the spec (verified cross-JVM against
``org.xerial.snappy``), trading ratio for simplicity exactly like a
``compression level 0`` deflate; the decompressor handles the full
format including all three copy forms.

Decode is TOTAL: any truncated/corrupt stream raises ``ValueError``
(never hangs, over-reads, or yields short output silently) — same
hardening contract as ``javaser``.
"""

from __future__ import annotations

_MAX_VARINT_BYTES = 5  # uint32 range per the spec


def _read_varint(src: bytes, pos: int) -> tuple[int, int]:
    """Little-endian base-128 varint (snappy preamble)."""
    v = shift = 0
    for _ in range(_MAX_VARINT_BYTES):
        if pos >= len(src):
            raise ValueError("corrupt snappy: truncated length varint")
        b = src[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
    raise ValueError("corrupt snappy: overlong length varint")


def decompress(src) -> bytes:
    """Raw Snappy block-format decode (full format: literals + all
    three copy element forms, overlap-correct)."""
    src = bytes(src)
    ulen, pos = _read_varint(src, 0)
    out = bytearray()
    n = len(src)
    while pos < n:
        tag = src[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 → 1..4 trailing LE length bytes
                nb = ln - 59
                if pos + nb > n:
                    raise ValueError("corrupt snappy: truncated literal len")
                ln = int.from_bytes(src[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise ValueError("corrupt snappy: truncated literal")
            out += src[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy with 1-byte offset tail
            if pos >= n:
                raise ValueError("corrupt snappy: truncated copy-1")
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | src[pos]
            pos += 1
        elif kind == 2:  # 2-byte LE offset
            if pos + 2 > n:
                raise ValueError("corrupt snappy: truncated copy-2")
            ln = (tag >> 2) + 1
            off = int.from_bytes(src[pos : pos + 2], "little")
            pos += 2
        else:  # 4-byte LE offset
            if pos + 4 > n:
                raise ValueError("corrupt snappy: truncated copy-4")
            ln = (tag >> 2) + 1
            off = int.from_bytes(src[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("corrupt snappy: copy offset outside window")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:
            # overlapping copy = periodic repetition of the last `off`
            # bytes (the LZ77 run-length idiom)
            pattern = bytes(out[start:])
            reps, rem = divmod(ln, off)
            out += pattern * reps + pattern[:rem]
    if len(out) != ulen:
        raise ValueError(
            f"corrupt snappy: declared {ulen} bytes, produced {len(out)}"
        )
    return bytes(out)


def compress(src) -> bytes:
    """Literal-only raw Snappy (valid per spec; ~1 tag byte per 64 KiB
    chunk of overhead)."""
    src = bytes(src)
    out = bytearray()
    v = len(src)
    while True:  # LE varint
        if v < 0x80:
            out.append(v)
            break
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    for i in range(0, len(src), 1 << 16):
        chunk = src[i : i + (1 << 16)]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 1 << 8:
            out += bytes((60 << 2, ln))
        else:
            out += bytes((61 << 2,)) + ln.to_bytes(2, "little")
        out += chunk
    return bytes(out)


# --- Hadoop BlockCompressorStream framing -----------------------------------
# shared by SnappyCodec and Lz4Codec (lz4.py) — Hadoop wraps BOTH in the
# identical [4-byte BE uncompressed block length][per chunk: 4-byte BE
# compressed length + raw chunk] stream; one implementation, no drift

def _framed_decompress(src, chunk_decode, name: str) -> bytes:
    src = bytes(src)
    out: list[bytes] = []
    pos, n = 0, len(src)
    while pos < n:
        if pos + 4 > n:
            raise ValueError(f"corrupt {name} stream: truncated block header")
        ulen = int.from_bytes(src[pos : pos + 4], "big")
        pos += 4
        produced = 0
        while produced < ulen:
            if pos + 4 > n:
                raise ValueError(
                    f"corrupt {name} stream: truncated chunk header"
                )
            clen = int.from_bytes(src[pos : pos + 4], "big")
            pos += 4
            if pos + clen > n:
                raise ValueError(f"corrupt {name} stream: truncated chunk")
            chunk = chunk_decode(src[pos : pos + clen])
            pos += clen
            produced += len(chunk)
            out.append(chunk)
        if produced != ulen:
            raise ValueError(
                f"corrupt {name} stream: block declared {ulen}, "
                f"chunks produced {produced}"
            )
    return b"".join(out)


def _framed_compress(src, chunk_encode, block_size: int) -> bytes:
    src = bytes(src)
    out = bytearray()
    for i in range(0, len(src), block_size):
        blk = src[i : i + block_size]
        comp = chunk_encode(blk)
        out += len(blk).to_bytes(4, "big")
        out += len(comp).to_bytes(4, "big")
        out += comp
    return bytes(out)


def hadoop_decompress(src) -> bytes:
    """Decode ``SnappyCodec``'s on-stream framing (what a SequenceFile
    record/block buffer actually holds)."""
    return _framed_decompress(src, decompress, "snappy")


def hadoop_compress(src, block_size: int = 256 * 1024) -> bytes:
    """Encode with ``SnappyCodec``'s framing (default Hadoop buffer
    size; one chunk per block)."""
    return _framed_compress(src, compress, block_size)
