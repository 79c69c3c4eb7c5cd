"""From-spec Hadoop SequenceFile reader/writer tests (SURVEY §2 S3/K3 —
``SeqImageDataSource.scala:24-69``, ``Binary2Sequence.scala:31-84``,
``LMDB2Sequence.scala:17-48``).

The strongest checks here are CROSS-JVM: files written by Hadoop's own
``SequenceFile.Writer`` through Spark's JVM (py4j) must read exactly
through the pure-Python reader in all three compression layouts, and
files written by the pure-Python writer must read back exactly through
Hadoop's ``SequenceFile.Reader`` + ``ObjectInputStream`` — the latter
validates the scala-library serialVersionUIDs end-to-end (a wrong SVUID
raises ``InvalidClassException`` in the JVM).
"""

from __future__ import annotations

import hashlib
import struct

import pytest

from caffeonspark_spark.sources import javaser as J
from caffeonspark_spark.sources import seqfile as S

# ObjectOutputStream streams captured from Spark's JVM (OpenJDK 17 +
# scala-library 2.13) — the writer must be byte-identical
_JVM_TUPLE2_HEX = (
    "aced00057372000c7363616c612e5475706c653201fbddcd22e7347a0200024c"
    "00025f317400124c6a6176612f6c616e672f4f626a6563743b4c00025f327100"
    "7e00017870740007696d675f30303174000137"
)
_JVM_TUPLE6_HEX = (
    "aced00057372000c7363616c612e5475706c653689e6cd0b84e7f0300200064c"
    "00025f317400124c6a6176612f6c616e672f4f626a6563743b4c00025f327100"
    "7e00014c00025f3371007e00014c00025f3471007e00014c00025f3571007e00"
    "014c00025f3671007e00017870740007696d675f30303274000133737200116a"
)


# --- Java serialization codec -------------------------------------------------

def test_writer_byte_identical_to_jvm():
    assert J.dumps_tuple2("img_001", "7").hex() == _JVM_TUPLE2_HEX
    assert J.dumps_tuple6("img_002", "3", 3, 4, 5, False).hex().startswith(
        _JVM_TUPLE6_HEX[:192]
    )


def test_decode_all_three_key_shapes():
    assert J.decode_image_key(J.dumps_tuple2("a", "b")) == (
        "a", "b", 1, 0, 0, True,
    )  # SeqImageDataSource.scala:46-50: Tuple2 implies encoded
    assert J.decode_image_key(J.dumps_tuple6("x", "9", 3, 8, 9, False)) == (
        "x", "9", 3, 8, 9, False,
    )
    # Pair dispatches on class name regardless of its computed SVUID
    assert J.decode_image_key(J.dumps_pair("p", "2", svuid=987654321)) == (
        "p", "2", 1, 0, 0, True,
    )


def test_codec_roundtrip_and_guards():
    for blob in (
        J.dumps_tuple2("id", "label"),
        J.dumps_tuple6("id", "label", 1, 2, 3, True),
        J.dumps_pair("id", "label"),
    ):
        obj = J.loads(blob)
        assert isinstance(obj, J.JavaObject)
    with pytest.raises(ValueError, match="not a Java serialization"):
        J.loads(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="truncated"):
        J.loads(J.dumps_tuple6("id", "label", 1, 2, 3, True)[:-6])
    with pytest.raises(ValueError, match="unsupported SequenceFile key"):
        J.decode_image_key(
            J.dumps_tuple2("a", "b").replace(b"scala.Tuple2", b"scala.Wrong2")
        )
    with pytest.raises(ValueError, match="unexpected key object"):
        J.decode_image_key(b"\xac\xed\x00\x05\x74\x00\x02hi")  # bare string


def test_svuid_constants_match_jvm(spark):
    jvm = spark.sparkContext._jvm
    for cls in ("scala.Tuple2", "scala.Tuple6", "java.lang.Integer",
                "java.lang.Number", "java.lang.Boolean"):
        osc = jvm.java.io.ObjectStreamClass.lookup(
            jvm.java.lang.Class.forName(cls)
        )
        assert osc.getSerialVersionUID() == J.SVUID[cls], cls


def test_javaser_decoder_total_on_mutated_streams():
    """Decoder totality: byte-mutated / truncated key streams must raise
    a clean ValueError/NotImplementedError (or decode, for benign
    mutations) — never hang, loop, or throw an unexpected type. Same
    hardening discipline as the PNG mutation test."""
    import random

    rng = random.Random(11)
    bases = [
        J.dumps_tuple2("img_0001", "7"),
        J.dumps_tuple6("img_0002", "3", 3, 4, 5, True),
        J.dumps_pair("img_0003", "9", svuid=42),
    ]
    for _ in range(400):
        raw = bytearray(rng.choice(bases))
        op = rng.randrange(3)
        if op == 0:  # point mutation
            raw[rng.randrange(len(raw))] ^= 1 << rng.randrange(8)
        elif op == 1:  # truncation
            raw = raw[: rng.randrange(len(raw))]
        else:  # junk injection
            pos = rng.randrange(len(raw))
            raw[pos:pos] = bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 5))
            )
        try:
            J.decode_image_key(bytes(raw))
        except (ValueError, NotImplementedError):
            pass  # the two documented failure classes
        except Exception as e:  # pragma: no cover - the failure mode
            raise AssertionError(
                f"unexpected {type(e).__name__} on mutated stream: {e}"
            ) from e


def test_javaser_adversarial_streams_fail_loudly():
    """Crafted streams a fuzzer rarely finds: a class descriptor whose
    super chain references itself (walks forever without the cycle
    guard) and a 500-deep stack of fresh descriptors (blows the Python
    stack without the nesting cap). Both must raise ValueError."""
    s = bytearray(struct.pack(">HH", 0xACED, 5))
    s.append(J.TC_OBJECT)
    s.append(J.TC_CLASSDESC)
    name = b"scala.Tuple2"
    s += struct.pack(">H", len(name)) + name + struct.pack(">q", 1)
    s.append(J.SC_SERIALIZABLE)
    s += struct.pack(">H", 0)
    s.append(J.TC_ENDBLOCKDATA)
    s.append(J.TC_REFERENCE)
    s += struct.pack(">I", J.BASE_WIRE_HANDLE)  # super = itself
    with pytest.raises(ValueError, match="cyclic class-descriptor"):
        J.decode_image_key(bytes(s))

    s = bytearray(struct.pack(">HH", 0xACED, 5))
    s.append(J.TC_OBJECT)
    for i in range(500):
        s.append(J.TC_CLASSDESC)
        nm = b"C%03d" % i
        s += struct.pack(">H", len(nm)) + nm + struct.pack(">q", 1)
        s.append(J.SC_SERIALIZABLE)
        s += struct.pack(">H", 0)
        s.append(J.TC_ENDBLOCKDATA)
    s.append(J.TC_NULL)
    with pytest.raises(ValueError, match="nests deeper"):
        J.decode_image_key(bytes(s))

    with pytest.raises(ValueError, match="dangling"):
        # reference to a handle that was never assigned
        J.loads(
            struct.pack(">HH", 0xACED, 5)
            + bytes([J.TC_REFERENCE])
            + struct.pack(">I", J.BASE_WIRE_HANDLE + 9)
        )


# --- Hadoop vint ---------------------------------------------------------------

def test_hadoop_vint_roundtrip():
    vals = [0, 1, -1, 127, -112, -113, 128, 255, 256, 10**6, -(10**6),
            2**31 - 1, -(2**31), 2**62]
    for v in vals:
        out = bytearray()
        S.write_vint(out, v)
        got, pos = S.read_vint(bytes(out), 0)
        assert got == v and pos == len(out), v


# --- container round-trip -------------------------------------------------------

def _items(n):
    return [
        (
            f"id{i:05d}", str(i % 7), 3, 4, 5, i % 3 == 0,
            bytes(((i * 13 + j * 5) % 256) for j in range(60 + (i % 5) * 400)),
        )
        for i in range(n)
    ]


def test_container_roundtrip_and_split_exactness(tmp_path):
    """Our writer → our reader, then verify Hadoop split semantics: any
    byte-range partitioning yields each record exactly once."""
    p = str(tmp_path / "a.seq")
    items = _items(400)
    S.write_seqfile(p, items)
    raw = open(p, "rb").read()
    info = S.SeqFileInfo.parse(raw)
    assert (info.key_class, info.value_class) == (
        S.BYTES_WRITABLE, S.BYTES_WRITABLE,
    )
    got = [
        (J.decode_image_key(k), v)
        for k, v in S.scan_records(raw, info, 0, len(raw))
    ]
    assert [(g[0][0], g[1]) for g in got] == [(i[0], i[6]) for i in items]
    whole = [hashlib.md5(k + v).hexdigest()
             for k, v in S.scan_records(raw, info, 0, len(raw))]
    for k_splits in (2, 3, 7, 20, 64):
        step = len(raw) // k_splits
        parts = []
        for i in range(k_splits):
            s = i * step
            e = len(raw) if i == k_splits - 1 else (i + 1) * step
            parts.extend(
                hashlib.md5(kk + vv).hexdigest()
                for kk, vv in S.scan_records(raw, info, s, e)
            )
        assert parts == whole, f"split k={k_splits} lost/duped records"


def test_record_compressed_roundtrip(tmp_path):
    p = str(tmp_path / "rc.seq")
    items = _items(150)
    S.write_seqfile(p, items, record_compress=True)
    raw = open(p, "rb").read()
    info = S.SeqFileInfo.parse(raw)
    assert info.compress and not info.block_compress
    got = list(S.scan_records(raw, info, 0, len(raw)))
    assert len(got) == 150 and got[0][1] == items[0][6]


def test_header_guards(tmp_path):
    with pytest.raises(ValueError, match="bad magic"):
        S.SeqFileInfo.parse(b"NOPE" + b"\x00" * 60)
    bad_version = bytearray(b"SEQ\x04" + b"\x00" * 60)
    with pytest.raises(NotImplementedError, match="version 4"):
        S.SeqFileInfo.parse(bytes(bad_version))
    # unsupported codec name must fail loudly at header parse
    out = bytearray(b"SEQ\x06")
    for name in (S.BYTES_WRITABLE, S.BYTES_WRITABLE):
        S.write_vint(out, len(name.encode()))
        out.extend(name.encode())
    out.extend(b"\x01\x00")
    codec = b"com.hadoop.compression.lzo.LzoCodec"
    S.write_vint(out, len(codec))
    out.extend(codec)
    out.extend(struct.pack(">i", 0))
    out.extend(b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="LzoCodec"):
        S.SeqFileInfo.parse(bytes(out))
    # SnappyCodec is SUPPORTED since r16 (from-spec decoder)
    assert "org.apache.hadoop.io.compress.SnappyCodec" in S._CODECS


# --- cross-JVM parity (the S3 contract) -----------------------------------------

def _jvm_write(spark, path, ctype_name, n=120, codec="DefaultCodec"):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    BW = jvm.org.apache.hadoop.io.BytesWritable
    SF = jvm.org.apache.hadoop.io.SequenceFile
    fs = Path(path).getFileSystem(hconf)
    ctype = getattr(SF.CompressionType, ctype_name)
    codec = getattr(jvm.org.apache.hadoop.io.compress, codec)()
    if hasattr(codec, "setConf"):
        codec.setConf(hconf)
    bw_cls = jvm.java.lang.Class.forName(S.BYTES_WRITABLE)
    w = SF.createWriter(fs, hconf, Path(path), bw_cls, bw_cls, ctype, codec)

    def jser(obj):
        bos = jvm.java.io.ByteArrayOutputStream()
        oos = jvm.java.io.ObjectOutputStream(bos)
        oos.writeObject(obj)
        oos.close()
        return bytes(bos.toByteArray())

    I, B = jvm.java.lang.Integer, jvm.java.lang.Boolean
    recs = []
    for i in range(n):
        if i % 2 == 0:
            key = jser(jvm.scala.Tuple2(f"id{i:05d}", str(i % 7)))
        else:
            key = jser(
                jvm.scala.Tuple6(
                    f"id{i:05d}", str(i % 7), I(3), I(4), I(5), B(i % 3 == 0)
                )
            )
        val = bytes(((i * 13 + j * 5) % 256) for j in range(50 + (i % 4) * 400))
        w.append(BW(key), BW(val))
        recs.append((key, val))
    w.close()
    return recs


@pytest.mark.parametrize("ctype", ["NONE", "RECORD", "BLOCK"])
def test_reads_hadoop_written_files(spark, tmp_path, ctype):
    """Hadoop's own SequenceFile.Writer output (uncompressed, record- and
    block-compressed DefaultCodec) must read EXACTLY through the
    pure-Python reader — raw keys, raw values, and decoded key tuples."""
    p = str(tmp_path / f"jvm_{ctype}.seq")
    recs = _jvm_write(spark, p, ctype)
    raw = open(p, "rb").read()
    info = S.SeqFileInfo.parse(raw)
    got = list(S.scan_records(raw, info, 0, len(raw)))
    assert [(k, v) for k, v in got] == recs
    rid, label, ch, h, w_, enc = J.decode_image_key(got[1][0])
    assert (rid, label, ch, h, w_, enc) == ("id00001", "1", 3, 4, 5, False)


@pytest.mark.parametrize(
    ("codec", "ctype"),
    [
        ("GzipCodec", "RECORD"),
        ("GzipCodec", "BLOCK"),
        ("BZip2Codec", "RECORD"),
        ("SnappyCodec", "RECORD"),
        ("SnappyCodec", "BLOCK"),
        ("Lz4Codec", "RECORD"),
        ("Lz4Codec", "BLOCK"),
    ],
)
def test_reads_hadoop_written_alternate_codecs(spark, tmp_path, codec, ctype):
    """The other stdlib-decodable codecs, cross-verified against files
    Hadoop itself wrote (gzip via java.util.zip, bzip2 via the pure-Java
    codec) — not just DefaultCodec."""
    p = str(tmp_path / f"jvm_{codec}_{ctype}.seq")
    recs = _jvm_write(spark, p, ctype, codec=codec, n=60)
    raw = open(p, "rb").read()
    info = S.SeqFileInfo.parse(raw)
    got = list(S.scan_records(raw, info, 0, len(raw)))
    assert [(k, v) for k, v in got] == recs
    rid, label, ch, h, w_, enc = J.decode_image_key(got[1][0])
    assert (rid, label, ch, h, w_, enc) == ("id00001", "1", 3, 4, 5, False)


def test_jvm_reads_python_written_file(spark, tmp_path):
    """The JVM's SequenceFile.Reader + ObjectInputStream must accept the
    pure-Python writer's output — container framing AND the scala
    Tuple6 serialVersionUIDs (a mismatch raises InvalidClassException)."""
    p = str(tmp_path / "py.seq")
    items = _items(100)
    S.write_seqfile(p, items)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(p).getFileSystem(hconf)
    rdr = jvm.org.apache.hadoop.io.SequenceFile.Reader(fs, Path(p), hconf)
    BW = jvm.org.apache.hadoop.io.BytesWritable
    k, v = BW(), BW()
    n = 0
    while rdr.next(k, v):
        ois = jvm.java.io.ObjectInputStream(
            jvm.java.io.ByteArrayInputStream(bytes(k.copyBytes()))
        )
        t = ois.readObject()
        exp = items[n]
        assert (t._1(), t._2(), t._3(), t._4(), t._5(), t._6()) == exp[:6]
        assert bytes(v.copyBytes()) == exp[6]
        n += 1
    rdr.close()
    assert n == 100


# --- Spark scan ------------------------------------------------------------------

def test_seqfile_scan_schema_count_partitions(spark, tmp_path):
    env = S.ensure_fixture(200, base=str(tmp_path))
    df = S.seqfile_to_dataframe(spark, env, partitions=4)
    assert df.schema.simpleString() == (
        "struct<id:string,label:string,channels:int,height:int,width:int,"
        "encoded:boolean,data:binary>"
    )  # SeqImageDataSource.scala:24 tuple order
    assert df.rdd.getNumPartitions() >= 2  # split across both part files
    assert df.count() == 200
    # fixture key-encoding cycle: doc_id%3 = 0→Tuple6 raw, 1→Tuple2, 2→Pair
    t2 = df.where("id = '00000001'").first()
    assert t2.label == "1" and t2.encoded and t2.channels == 1
    pair = df.where("id = '00000002'").first()
    assert pair.label == "2" and pair.encoded and pair.channels == 1
    t6 = df.where("id = '00000003'").first()
    assert (t6.channels, t6.height, t6.width, t6.encoded) == (3, 4, 5, False)


def test_seqfile_registry_format(spark, tmp_path):
    from caffeonspark_spark.sources.registry import read_source

    env = S.ensure_fixture(60, base=str(tmp_path))
    df = read_source(spark, "sequencefile", env, select_expr=["id", "label"])
    assert df.columns == ["id", "label"] and df.count() == 60


def test_dataframe_to_seqfile_export_roundtrip(spark, tmp_path):
    """K3: export an image-tuple DataFrame as SequenceFile parts and scan
    them back — full fidelity including binary payloads."""
    src = S.ensure_fixture(90, base=str(tmp_path / "src"))
    df = S.seqfile_to_dataframe(spark, src, partitions=3)
    out = str(tmp_path / "export")
    n_parts = S.dataframe_to_seqfile(df, out)
    assert n_parts >= 1
    back = S.seqfile_to_dataframe(spark, out)
    a = sorted(
        (r.id, r.label, r.channels, r.height, r.width, r.encoded, bytes(r.data))
        for r in df.collect()
    )
    b = sorted(
        (r.id, r.label, r.channels, r.height, r.width, r.encoded, bytes(r.data))
        for r in back.collect()
    )
    assert a == b


# --- r15: column pruning at the source -------------------------------------------

def test_pruned_scan_matches_projection(spark, tmp_path):
    env = S.ensure_fixture(120, base=str(tmp_path))
    full = S.seqfile_to_dataframe(spark, env)
    pruned = S.seqfile_to_dataframe(
        spark, env, columns=["label", "id", "encoded"]
    )
    assert pruned.schema.simpleString() == (
        "struct<label:string,id:string,encoded:boolean>"
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.select("label", "id", "encoded").collect())
    )
    with pytest.raises(ValueError, match="unknown columns"):
        S.seqfile_to_dataframe(spark, env, columns=["data", "pixels"])


def test_pruned_scan_never_touches_values(spark, tmp_path):
    """Skip proof: a record-compressed file whose VALUE bytes are corrupt
    zlib streams scans fine without 'data' (values never decompressed)
    while the full scan fails loudly."""
    p = str(tmp_path / "bad.seq")
    items = [
        (f"id{i:04d}", str(i % 5), 3, 4, 5, False, bytes(500))
        for i in range(80)
    ]
    S.write_seqfile(p, items, record_compress=True)
    raw = bytearray(open(p, "rb").read())
    info = S.SeqFileInfo.parse(bytes(raw))
    # corrupt every compressed value region: flip bytes after each record
    # header's key (values are the compressed tail of each record)
    pos = info.header_end
    n_corrupted = 0
    while pos < len(raw):
        (rec_len,) = struct.unpack_from(">i", raw, pos)
        if rec_len == -1:
            pos += 4 + S.SYNC_SIZE
            continue
        (key_len,) = struct.unpack_from(">i", raw, pos + 4)
        vstart = pos + 8 + key_len
        raw[vstart] ^= 0xFF  # breaks the zlib header
        n_corrupted += 1
        pos += 8 + rec_len
    assert n_corrupted == 80
    open(p, "wb").write(bytes(raw))
    meta = S.seqfile_to_dataframe(spark, p, columns=["id", "channels"])
    assert meta.count() == 80
    full = S.seqfile_to_dataframe(spark, p)
    with pytest.raises(Exception, match="(?i)zlib|decompress|error"):
        full.collect()


def test_seqfile_scan_agg_oracle(spark):
    from tests.oracle_check import compare

    ok, msg = compare(
        S.seqfile_scan_agg(spark, "/root/testdata/sf0.001"),
        S.ORACLE_SEQFILE_SCAN,
        "/root/testdata/sf0.001",
    )
    assert ok, msg


def test_seqfile_roundtrip_agg_oracle(spark):
    """r15 declared row: the distributed writer's output must checksum
    identically to the original fixture (round-trip == identity); staging
    stays bounded to two dirs (current + previous invocation — the
    PREVIOUS invocation's returned DataFrame must stay re-evaluable
    because it scans its export lazily; r15 ADVICE)."""
    import glob
    import os

    from tests.oracle_check import compare

    prev_df = None
    for _ in range(3):  # repeat: the driver iterates; staging must not pile
        df = S.seqfile_roundtrip_agg(spark, "/root/testdata/sf0.001")
        ok, msg = compare(df, S.ORACLE_SEQFILE_SCAN, "/root/testdata/sf0.001")
        assert ok, msg
        if prev_df is not None:
            # the previous invocation's DataFrame still scans fine — its
            # staging dir survived the sweep
            assert prev_df.count() == 10
        prev_df = df

    assert len(glob.glob(f"/tmp/cos_seqfile_rt_{os.getpid()}_*")) == 2


def test_seqfile_pruned_metadata_oracle(spark):
    from tests.oracle_check import compare

    ok, msg = compare(
        S.seqfile_pruned_metadata(spark, "/root/testdata/sf0.001"),
        S.ORACLE_SEQFILE_PRUNED_METADATA,
        "/root/testdata/sf0.001",
    )
    assert ok, msg


def test_zero_length_part_fails_loudly(spark, tmp_path):
    """A part truncated to zero bytes must raise, not yield zero rows —
    a valid SequenceFile always has a header (r15 ADVICE)."""
    env = S.ensure_fixture(40, base=str(tmp_path))
    open(f"{env}/part-00099", "wb").close()
    with pytest.raises(Exception, match="zero-length"):
        S.seqfile_to_dataframe(spark, env).count()


def test_batched_export_byte_identical_to_streaming_writer(spark, tmp_path):
    """r16: the NumPy-framed distributed exporter must produce BYTE-
    IDENTICAL files to the per-record streaming writer for the same
    records and part name (same header, framing, and running-byte sync
    cadence) — framing arithmetic is pinned, not just round-trip
    semantics. Uses >2KB of records so sync markers are actually
    emitted."""
    items = _items(300)
    ref = str(tmp_path / "ref" / "part-00000")
    import os as _os

    _os.makedirs(tmp_path / "ref")
    S.write_seqfile(ref, items)

    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            items,
            columns=[
                "id", "label", "channels", "height", "width", "encoded",
                "data",
            ],
        )
    ).coalesce(1)
    out = str(tmp_path / "export")
    assert S.dataframe_to_seqfile(df, out) == 1
    got = open(f"{out}/part-00000", "rb").read()
    want = open(ref, "rb").read()
    assert S.SYNC_ESCAPE + S._derive_sync(ref) in want  # syncs present
    assert got == want


def test_truncated_header_fails_loudly(tmp_path):
    """r16 review: a part truncated INSIDE the header (size > 0, cut
    before the metadata count) must raise, not parse a short slice as a
    zero and scan zero records silently."""
    items = _items(10)
    p = str(tmp_path / "whole.seq")
    S.write_seqfile(p, items)
    raw = open(p, "rb").read()
    info = S.SeqFileInfo.parse(raw)
    for cut in (4, info.header_end - 18, info.header_end - 2):
        with pytest.raises((ValueError, NotImplementedError, IndexError)):
            S.SeqFileInfo.parse(raw[:cut])
    # truncation mid-record: the scan must raise, never return short
    with pytest.raises(ValueError):
        list(S.scan_records(raw[:-7], info, 0, len(raw)))
