"""r16: the from-spec Snappy codec (``sources/snappy.py``) — raw block
format + Hadoop ``BlockCompressorStream`` framing, written from the
public specifications (google/snappy ``format_description.txt``;
``org.apache.hadoop.io.compress.BlockCompressorStream``).

The strongest checks are CROSS-JVM against ``org.xerial.snappy`` (the
pure-Java Snappy Spark itself bundles): JVM-compressed streams decode
exactly, and our literal-only compressor's output decompresses exactly
in the JVM. The SequenceFile-level cross-checks (Hadoop-written
SnappyCodec RECORD/BLOCK files) live in ``test_seqfile.py``'s
alternate-codec parametrization."""

from __future__ import annotations

import random

import pytest

from caffeonspark_spark.sources import seqfile as S
from caffeonspark_spark.sources import snappy as SN


def _cases(rng):
    return [
        b"",
        b"a",
        b"hello" * 1000,                       # long periodic runs
        bytes(rng.randrange(256) for _ in range(5000)),  # incompressible
        b"ab" * 40000,                         # 80 KB, crosses 64K literal
        bytes(100000),                         # zero run
        b"x" * 3 + b"abcd" * 17 + b"x" * 3,    # small mixed
    ]


def test_raw_roundtrip_through_own_coder():
    rng = random.Random(11)
    for c in _cases(rng):
        assert SN.decompress(SN.compress(c)) == c


def test_raw_cross_jvm_both_directions(spark):
    Xer = spark.sparkContext._jvm.org.xerial.snappy.Snappy
    rng = random.Random(13)
    for c in _cases(rng):
        assert SN.decompress(bytes(Xer.compress(c))) == c
        assert bytes(Xer.uncompress(SN.compress(c))) == c


def test_overlapping_copy_semantics():
    """Hand-built streams exercising all three copy forms, including
    offset < length (periodic replication — the subtle case)."""
    # literal "ab", then copy-1 off=2 len=6 -> "ab" * 4
    stream = bytes([8]) + bytes([1 << 2]) + b"ab" + bytes([(2 << 2) | 1, 2])
    assert SN.decompress(stream) == b"abababab"
    # copy-2: literal "abc" + copy off=3 len=5 -> "abcabcab"
    stream = (
        bytes([8]) + bytes([2 << 2]) + b"abc"
        + bytes([(4 << 2) | 2]) + (3).to_bytes(2, "little")
    )
    assert SN.decompress(stream) == b"abcabcab"
    # copy-4 form, non-overlapping: "abcd" + copy off=4 len=4
    stream = (
        bytes([8]) + bytes([3 << 2]) + b"abcd"
        + bytes([(3 << 2) | 3]) + (4).to_bytes(4, "little")
    )
    assert SN.decompress(stream) == b"abcdabcd"


def test_decode_total_on_mutated_streams(spark):
    """Totality: mutated/truncated streams raise ValueError (or decode,
    for benign mutations) — never hang, over-read, or raise unexpected
    types. Same hardening contract as javaser."""
    Xer = spark.sparkContext._jvm.org.xerial.snappy.Snappy
    rng = random.Random(17)
    bases = [
        bytes(Xer.compress(b"payload " * 500)),
        SN.compress(bytes(rng.randrange(256) for _ in range(2000))),
        SN.hadoop_compress(b"framed " * 400),
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
        for fn in (SN.decompress, SN.hadoop_decompress):
            try:
                fn(bytes(raw))
            except ValueError:
                pass
            except Exception as e:  # pragma: no cover - the failure mode
                raise AssertionError(
                    f"unexpected {type(e).__name__} from {fn.__name__}: {e}"
                ) from e


def test_hadoop_framing_roundtrip_multi_block():
    data = b"0123456789" * 60000  # 600 KB → 3 blocks at 256 KiB
    framed = SN.hadoop_compress(data)
    assert SN.hadoop_decompress(framed) == data
    # block sizes other than the default still frame/deframe exactly
    assert SN.hadoop_decompress(SN.hadoop_compress(data, 1 << 12)) == data


# --- SequenceFile integration ------------------------------------------------

def test_seqfile_snappy_writer_jvm_reads(spark, tmp_path):
    """A snappy record-compressed file from OUR writer must read back
    through Hadoop's own SequenceFile.Reader (which decodes values with
    the real SnappyCodec) — framing verified by the consumer that
    matters."""
    p = str(tmp_path / "py_snappy.seq")
    items = [
        (
            f"id{i:05d}", str(i % 7), 3, 4, 5, i % 3 == 0,
            bytes(((i * 13 + j * 5) % 256) for j in range(60 + (i % 5) * 400)),
        )
        for i in range(120)
    ]
    S.write_seqfile(p, items, record_compress=True, codec="snappy")
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(p).getFileSystem(hconf)
    rdr = jvm.org.apache.hadoop.io.SequenceFile.Reader(fs, Path(p), hconf)
    assert "SnappyCodec" in rdr.getCompressionCodec().getClass().getName()
    BW = jvm.org.apache.hadoop.io.BytesWritable
    k, v = BW(), BW()
    n = 0
    while rdr.next(k, v):
        assert bytes(v.copyBytes()) == items[n][6]
        n += 1
    rdr.close()
    assert n == 120


def test_seqfile_snappy_scan_query_oracle(spark):
    from tests.oracle_check import compare

    ok, msg = compare(
        S.seqfile_snappy_scan(spark, "/root/testdata/sf0.001"),
        S.ORACLE_SEQFILE_SCAN,
        "/root/testdata/sf0.001",
    )
    assert ok, msg


def test_seqfile_uri_scan_query_oracle(spark):
    from tests.oracle_check import compare

    ok, msg = compare(
        S.seqfile_uri_scan(spark, "/root/testdata/sf0.001"),
        S.ORACLE_SEQFILE_SCAN,
        "/root/testdata/sf0.001",
    )
    assert ok, msg


def test_unknown_write_codec_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown write codec"):
        S.write_seqfile(
            str(tmp_path / "x.seq"), [], record_compress=True, codec="lzo"
        )
