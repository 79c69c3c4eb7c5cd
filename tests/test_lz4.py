"""r16: the from-spec LZ4 codec (``sources/lz4.py``) — raw block format
(lz4 ``lz4_Block_format.md``) + the shared Hadoop
``BlockCompressorStream`` framing. Cross-JVM against lz4-java (the
implementation Hadoop's ``Lz4Codec`` itself wraps); the
SequenceFile-level cross-checks (Hadoop-written Lz4Codec RECORD/BLOCK
files) live in ``test_seqfile.py``'s alternate-codec parametrization."""

from __future__ import annotations

import random

import pytest

from caffeonspark_spark.sources import lz4 as L4
from caffeonspark_spark.sources import seqfile as S


def _cases(rng):
    return [
        b"",
        b"a",
        b"hello" * 1000,
        bytes(rng.randrange(256) for _ in range(5000)),
        b"ab" * 40000,
        bytes(100000),
        b"x" * 14,   # literal-length boundary (token nibble max-1)
        b"x" * 15,   # 15-extension with 0 continuation
        b"x" * 270,  # 255-continuation byte
    ]


def test_raw_roundtrip_through_own_coder():
    rng = random.Random(19)
    for c in _cases(rng):
        assert L4.decompress(L4.compress(c)) == c


def test_raw_cross_jvm_both_directions(spark):
    fac = spark.sparkContext._jvm.net.jpountz.lz4.LZ4Factory.fastestInstance()
    comp, deco = fac.fastCompressor(), fac.safeDecompressor()
    rng = random.Random(23)
    for c in _cases(rng):
        assert L4.decompress(bytes(comp.compress(c))) == c
        assert bytes(deco.decompress(L4.compress(c), len(c))) == c


def test_match_semantics_handbuilt():
    """Hand-built sequences: normal match, overlapping match (offset <
    length → periodic replication), length extensions."""
    # literals "abcd", match off=4 len=4 (token low nibble 0 → 4+0)
    stream = bytes([(4 << 4) | 0]) + b"abcd" + (4).to_bytes(2, "little")
    assert L4.decompress(stream) == b"abcdabcd"
    # literals "ab", overlapping match off=2 len=6 → "ab"*4
    stream = bytes([(2 << 4) | 2]) + b"ab" + (2).to_bytes(2, "little")
    assert L4.decompress(stream) == b"abababab"
    # match length extension: off=1 len=4+15+3 over single "z" → 23 z's
    stream = (
        bytes([(1 << 4) | 15]) + b"z" + (1).to_bytes(2, "little") + bytes([3])
    )
    assert L4.decompress(stream) == b"z" * 23


def test_decode_total_on_mutated_streams(spark):
    fac = spark.sparkContext._jvm.net.jpountz.lz4.LZ4Factory.fastestInstance()
    comp = fac.fastCompressor()
    rng = random.Random(29)
    bases = [
        bytes(comp.compress(b"payload " * 500)),
        L4.compress(bytes(rng.randrange(256) for _ in range(2000))),
        L4.hadoop_compress(b"framed " * 400),
    ]
    for _ in range(600):
        raw = bytearray(rng.choice(bases))
        op = rng.randrange(3)
        if op == 0:
            raw[rng.randrange(len(raw))] ^= 1 << rng.randrange(8)
        elif op == 1:
            raw = raw[: rng.randrange(len(raw))]
        else:
            pos = rng.randrange(len(raw))
            raw[pos:pos] = bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 5))
            )
        for fn in (L4.decompress, L4.hadoop_decompress):
            try:
                fn(bytes(raw))
            except ValueError:
                pass
            except MemoryError:
                pass  # a mutated length field may demand petabytes —
                # the allocator refusing IS the loud failure
            except Exception as e:  # pragma: no cover
                raise AssertionError(
                    f"unexpected {type(e).__name__} from {fn.__name__}: {e}"
                ) from e


def test_seqfile_lz4_writer_jvm_reads(spark, tmp_path):
    """Our ``codec="lz4"`` record-compressed output must read back
    through Hadoop's own SequenceFile.Reader + Lz4Codec."""
    p = str(tmp_path / "py_lz4.seq")
    items = [
        (
            f"id{i:05d}", str(i % 7), 3, 4, 5, i % 3 == 0,
            bytes(((i * 7 + j * 3) % 256) for j in range(60 + (i % 5) * 400)),
        )
        for i in range(120)
    ]
    S.write_seqfile(p, items, record_compress=True, codec="lz4")
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(p).getFileSystem(hconf)
    rdr = jvm.org.apache.hadoop.io.SequenceFile.Reader(fs, Path(p), hconf)
    assert "Lz4Codec" in rdr.getCompressionCodec().getClass().getName()
    BW = jvm.org.apache.hadoop.io.BytesWritable
    k, v = BW(), BW()
    n = 0
    while rdr.next(k, v):
        assert bytes(v.copyBytes()) == items[n][6]
        n += 1
    rdr.close()
    assert n == 120
