"""From-spec LMDB reader tests (SURVEY §2 S1 — ``LmdbRDD.scala:36-155``).

Covers the byte-format round-trip (inline values, overflow chains,
multi-level B-trees, empty db, dual-meta selection), the Caffe ``Datum``
wire codec, the CHW→HWC reorder against a literal mirror of the
reference's byte loop (``LmdbRDD.scala:270-281``), the Spark DataSource
scan (schema parity with ``tools/LMDB2DataFrame.scala:12-18``, planned
partition fan-out, label-manifest count parity — the ``ToolTest.scala:54``
analogue), and the declared query against its DuckDB oracle.
"""

from __future__ import annotations

import struct

import pytest

from caffeonspark_spark.sources import lmdb as L


# --- byte-format round-trip -------------------------------------------------

def test_kv_roundtrip_inline_overflow_multilevel(tmp_path):
    items = [
        (b"%010d" % i, bytes(((i * 3 + j) % 256) for j in range(120)))
        for i in range(15000)
    ]
    # every 50th value is big enough to force an overflow chain; a couple
    # span multiple overflow pages
    for i in range(0, 15000, 50):
        n = 2500 + (i % 3) * 3000
        items[i] = (b"%010d" % i, bytes(((i + j) % 256) for j in range(n)))
    L.write_lmdb(str(tmp_path), items)
    kv = L.LmdbKV(str(tmp_path))
    assert kv.entries == 15000
    assert kv.depth >= 3  # multi-level branch walk exercised
    got = list(kv.items())
    assert got == sorted(items)  # key order AND exact bytes


def test_kv_empty_db(tmp_path):
    L.write_lmdb(str(tmp_path), [])
    kv = L.LmdbKV(str(tmp_path))
    assert kv.entries == 0
    assert list(kv.items()) == []


def test_kv_picks_larger_txnid_meta(tmp_path):
    """Dual meta pages: the live tree is the one with the larger txnid —
    corrupt meta 1's entry count and bump meta 0's txnid above it; the
    reader must now report meta 0's view."""
    L.write_lmdb(str(tmp_path), [(b"k1", b"v1"), (b"k2", b"v2")])
    data = tmp_path / "data.mdb"
    buf = bytearray(data.read_bytes())
    # meta layout: page header 16B, then magic/version/address/mapsize
    # (24B), FREE_DBI (48B), MAIN_DBI (48B: entries at +32), last/txnid
    main0 = 16 + 24 + 48
    struct.pack_into("<Q", buf, main0 + 32, 99)  # meta0 entries := 99
    struct.pack_into("<Q", buf, main0 + 48 + 8, 7)  # meta0 txnid := 7
    data.write_bytes(buf)
    assert L.LmdbKV(str(tmp_path)).entries == 99


def test_key_validation(tmp_path):
    with pytest.raises(ValueError, match="1..511"):
        L.write_lmdb(str(tmp_path), [(b"", b"v")])


# --- Datum wire codec --------------------------------------------------------

def test_datum_roundtrip_and_unknown_fields():
    raw = L.encode_datum(3, 8, 9, b"\x01\x02\x03", 42, True, [1.5, -2.25])
    d = L.decode_datum(raw)
    assert (d["channels"], d["height"], d["width"]) == (3, 8, 9)
    assert d["data"] == b"\x01\x02\x03" and d["label"] == 42 and d["encoded"]
    assert d["float_data"] == [1.5, -2.25]
    # unknown varint field 9 + unknown fixed64 field 10 must be skipped
    extra = bytes([9 << 3, 0x05, (10 << 3) | 1]) + b"\0" * 8 + raw
    assert L.decode_datum(extra)["label"] == 42
    # packed float_data (wire 2) decodes identically to unpacked
    packed = bytes([(6 << 3) | 2, 8]) + struct.pack("<2f", 1.5, -2.25)
    assert L.decode_datum(packed)["float_data"] == [1.5, -2.25]


def test_chw_to_hwc_matches_reference_loop():
    """Vectorized reorder == the reference's per-byte loop
    (``LmdbRDD.LMDBdata2Matdata``): clone[p*C + c] = data[p + c*HW]."""
    channels, hw = 3, 20
    data = bytes(((j * 7 + 1) % 256) for j in range(channels * hw))
    clone = bytearray(data)
    for p in range(hw):
        for c in range(channels):
            clone[p * channels + c] = data[p + c * hw]
    assert L.chw_to_hwc(channels, data) == bytes(clone)
    # 1-channel and non-dense payloads pass through untouched
    assert L.chw_to_hwc(1, data) == data
    assert L.chw_to_hwc(3, b"\x01\x02") == b"\x01\x02"


# --- Spark scan ---------------------------------------------------------------

def test_lmdb_scan_schema_count_and_partitions(spark, tmp_path):
    env = L.ensure_fixture(200, base=str(tmp_path))
    df = L.lmdb_to_dataframe(spark, env, partitions=4)
    assert df.schema.simpleString() == (
        "struct<id:string,label:string,channels:int,height:int,width:int,"
        "encoded:boolean,data:binary>"
    )  # LMDB2DataFrame.scala:12-18
    assert df.rdd.getNumPartitions() == 4
    # count parity with the label manifest (ToolTest.scala:54 analogue)
    with open(f"{env}/labels.txt", encoding="utf-8") as fh:
        n_labels = sum(1 for _ in fh)
    assert df.count() == n_labels == 200
    row = df.where("id = '00000007'").first()
    assert row.label == "7" and row.channels == 3 and not row.encoded
    assert len(row.data) == 60
    enc = df.where("encoded").limit(1).first()
    assert enc.channels == 0 and len(enc.data) >= 2500


def test_lmdb_registry_format(spark, tmp_path):
    from caffeonspark_spark.sources.registry import read_source

    env = L.ensure_fixture(50, base=str(tmp_path))
    df = read_source(spark, "lmdb", env, select_expr=["id", "label"])
    assert df.columns == ["id", "label"] and df.count() == 50


def test_lmdb_scan_agg_oracle(spark):
    from tests.oracle_check import compare

    ok, msg = compare(
        L.lmdb_scan_agg(spark, "/root/testdata/sf0.001"),
        L.ORACLE_LMDB_SCAN,
        "/root/testdata/sf0.001",
    )
    assert ok, msg


# --- key-range partition pruning ---------------------------------------------

def test_leaf_ranges_cover_key_order(tmp_path):
    """leaf_ranges' branch-key lower bounds must bracket each leaf's
    actual first key: lower_i <= first_key_i < lower_{i+1}."""
    items = [(b"%010d" % i, bytes(60)) for i in range(8000)]
    L.write_lmdb(str(tmp_path), items)
    kv = L.LmdbKV(str(tmp_path))
    ranges = kv.leaf_ranges()
    assert len(ranges) > 100 and ranges[0][1] is None
    for i, (pgno, low) in enumerate(ranges):
        first = next(iter(kv.iter_leaf(pgno)))[0]
        if low is not None:
            assert low <= first
        if i + 1 < len(ranges):
            assert first < ranges[i + 1][1]


def test_pushdown_prunes_leaf_partitions_and_stays_exact(spark, tmp_path):
    """An id-range predicate must shrink the PLANNED leaf set (pruning
    observable at the reader level) and return exactly the right rows
    through Spark (the residual filter stays row-exact)."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    env = L.ensure_fixture(5000, base=str(tmp_path))
    # reader-level: consume the pushFilters generator, then plan
    r_all = L.LmdbReader({"path": env, "partitions": "64"})
    all_pgnos = sum(len(p.pgnos) for p in r_all.partitions())
    r = L.LmdbReader({"path": env, "partitions": "64"})
    kept = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), "00000100"),
                LessThan(("id",), "00000200"),
            ]
        )
    )
    assert len(kept) == 2  # pruning-only: both filters re-yielded
    pruned_pgnos = sum(len(p.pgnos) for p in r.partitions())
    assert 0 < pruned_pgnos < all_pgnos / 4
    # e2e: fresh DataFrame per filter set (pushdown bakes into the plan)
    df = L.lmdb_to_dataframe(spark, env).where(
        "id >= '00000100' AND id < '00000200'"
    )
    ids = sorted(r["id"] for r in df.select("id").collect())
    assert ids == [f"{i:08d}" for i in range(100, 200)]
    eq = L.lmdb_to_dataframe(spark, env).where("id = '00004999'")
    assert eq.count() == 1


def test_lmdb_pruned_lookup_matches_oracle(spark):
    from tests.oracle_check import compare

    ok, msg = compare(
        L.lmdb_pruned_lookup(spark, "/root/testdata/sf0.001"),
        L.ORACLE_LMDB_PRUNED_LOOKUP,
        "/root/testdata/sf0.001",
    )
    assert ok, msg


# --- r14 review-finding pins --------------------------------------------------

def test_kv_nondefault_page_size(tmp_path):
    """The page-size probe must locate meta page 1 (probing page 0 is
    degenerate — offset 0 'succeeds' at any candidate size) so a
    non-4KiB-page file reads correctly even when META 0 is the live one."""
    import struct as _s

    from caffeonspark_spark.sources import lmdb as LM

    # write a 16 KiB-page file by temporarily re-pointing the writer's
    # module constant (the writer derives every offset from PAGE_SIZE)
    orig = LM.PAGE_SIZE
    LM.PAGE_SIZE = 16384
    try:
        items = [(b"%08d" % i, bytes(((i + j) % 256) for j in range(100)))
                 for i in range(2000)]
        LM.write_lmdb(str(tmp_path), items)
    finally:
        LM.PAGE_SIZE = orig
    data = tmp_path / "data.mdb"
    buf = bytearray(data.read_bytes())
    # make meta 0 the live meta (txnid 9 > meta 1's 1): entries stays
    # correct; the reader must still derive psize=16384 from meta 1's
    # LOCATION even though meta 0 wins the txnid race
    _s.pack_into("<Q", buf, 16 + 24 + 48 + 48 + 8, 9)
    data.write_bytes(buf)
    kv = L.LmdbKV(str(tmp_path))
    assert kv.page_size == 16384
    assert kv.entries == 2000
    assert [k for k, _ in kv.items()] == sorted(k for k, _ in items)


# --- r15 ADVICE pins -----------------------------------------------------------

def test_writer_stores_psize_in_freedbi_md_pad(tmp_path):
    """mm_psize IS FREE_DBI's md_pad (mdb.c) — the writer must store it
    so real liblmdb can open the file, and the reader must use the stored
    value FIRST (no probe needed)."""
    L.write_lmdb(str(tmp_path), [(b"k1", b"v1")])
    buf = (tmp_path / "data.mdb").read_bytes()
    # meta 0: page header 16B + magic/version/address/mapsize 24B → FREE_DBI
    assert struct.unpack_from("<I", buf, 16 + 24)[0] == L.PAGE_SIZE
    assert L.LmdbKV(str(tmp_path)).page_size == L.PAGE_SIZE


def test_reader_falls_back_to_probe_when_md_pad_zero(tmp_path):
    """Files whose meta leaves md_pad blank (older writers) must still
    open via the meta-1 location probe."""
    L.write_lmdb(str(tmp_path), [(b"k1", b"v1"), (b"k2", b"v2")])
    data = tmp_path / "data.mdb"
    buf = bytearray(data.read_bytes())
    for meta_off in (0, L.PAGE_SIZE):  # zero md_pad in BOTH metas
        struct.pack_into("<I", buf, meta_off + 16 + 24, 0)
    data.write_bytes(buf)
    kv = L.LmdbKV(str(tmp_path))
    assert kv.page_size == L.PAGE_SIZE and kv.entries == 2


def test_truncated_datum_fails_loudly():
    """Corrupt values must raise, not yield silently-truncated rows
    (matches the P_LEAF2/DUPSORT fail-loud posture)."""
    good = L.encode_datum(3, 4, 5, b"\x01" * 60, 7, False)
    with pytest.raises(ValueError, match="truncated Datum"):
        L.decode_datum(good[:-10])  # length-delimited data runs past end
    with pytest.raises(ValueError, match="truncated Datum"):
        L.decode_datum(bytes([1 << 3, 0x80]))  # varint never terminates
    with pytest.raises(ValueError, match="truncated Datum"):
        L.decode_datum(bytes([(6 << 3) | 5, 0x01]))  # fixed32 short
    assert L.decode_datum(good)["data"] == b"\x01" * 60


def test_kv_close_and_no_fd_leak_on_probe_failure(tmp_path):
    """close()/context-manager release the mmap+fd deterministically, and
    a constructor that raises (no valid meta) must not leak its handle."""
    import os as _os

    L.write_lmdb(str(tmp_path), [(b"k", b"v")])
    with L.LmdbKV(str(tmp_path)) as kv:
        assert kv.entries == 1
    assert kv._fh.closed
    kv.close()  # idempotent

    garbage = tmp_path / "bad.mdb"
    garbage.write_bytes(b"\x00" * 8192)
    before = len(_os.listdir("/proc/self/fd"))
    for _ in range(5):
        with pytest.raises(ValueError, match="no valid LMDB meta"):
            L.LmdbKV(str(garbage))
    assert len(_os.listdir("/proc/self/fd")) == before

    empty = tmp_path / "empty.mdb"
    empty.write_bytes(b"")
    with pytest.raises(ValueError, match="no valid LMDB meta"):
        L.LmdbKV(str(empty))


def test_fixture_cache_is_version_keyed(tmp_path):
    env = L.ensure_fixture(10, base=str(tmp_path))
    assert f"cos_lmdb_fixture_v{L._FIXTURE_VERSION}_10" in env


# --- r15: column pruning at the source ------------------------------------------

def test_decode_datum_pruned_skips_data_but_validates():
    raw = L.encode_datum(3, 4, 5, b"\x07" * 60, 9, False)
    d = L.decode_datum(raw, want_data=False)
    assert d["data"] == b"" and d["label"] == 9 and d["channels"] == 3
    # bounds are STILL validated on the pruned path
    with pytest.raises(ValueError, match="truncated Datum"):
        L.decode_datum(raw[:-10], want_data=False)


def test_pruned_scan_matches_projection_and_order(spark, tmp_path):
    env = L.ensure_fixture(120, base=str(tmp_path))
    full = L.lmdb_to_dataframe(spark, env)
    pruned = L.lmdb_to_dataframe(spark, env, columns=["label", "id"])
    assert pruned.schema.simpleString() == "struct<label:string,id:string>"
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.select("label", "id").collect())
    )
    with pytest.raises(ValueError, match="unknown columns"):
        L.lmdb_to_dataframe(spark, env, columns=["id", "pixels"])


def test_grayscale_raw_rows_scan_as_bytes(spark, tmp_path):
    """r15 review regression: chw_to_hwc's passthrough branches (channels
    <= 1, non-dense payload) must return BYTES — the zero-copy reader
    feeds memoryviews, and a leaked view fails Spark's binary converter
    (every grayscale MNIST-style row crashed the scan)."""
    items = [
        (b"%08d" % i, L.encode_datum(1, 4, 5, bytes(range(i, i + 20)), i % 3))
        for i in range(50)
    ]
    items.append(  # non-dense multi-channel payload: the other passthrough
        (b"99999999", L.encode_datum(3, 0, 0, b"\x01\x02", 9))
    )
    L.write_lmdb(str(tmp_path), items)
    rows = L.lmdb_to_dataframe(spark, str(tmp_path)).orderBy("id").collect()
    assert len(rows) == 51
    assert bytes(rows[0].data) == bytes(range(0, 20))
    assert rows[0].channels == 1 and not rows[0].encoded
    assert bytes(rows[-1].data) == b"\x01\x02"
    # the passthroughs themselves return bytes even for memoryview input
    assert isinstance(L.chw_to_hwc(1, memoryview(b"abc")), bytes)
    assert isinstance(L.chw_to_hwc(3, memoryview(b"ab")), bytes)


def test_id_only_scan_never_decodes_values(spark, tmp_path):
    """The airtight skip proof: a db whose Datum values are all CORRUPT
    (truncated) scans fine when pruned to the key, while the full scan
    fails loudly — so the pruned path provably never parses a value."""
    bad = L.encode_datum(3, 4, 5, b"\x01" * 600, 1, False)[:-50]
    L.write_lmdb(str(tmp_path), [(b"%08d" % i, bad) for i in range(200)])
    ids = L.lmdb_to_dataframe(spark, str(tmp_path), columns=["id"])
    assert ids.count() == 200
    assert ids.orderBy("id").first().id == "00000000"
    full = L.lmdb_to_dataframe(spark, str(tmp_path))
    with pytest.raises(Exception, match="truncated Datum"):
        full.collect()


def test_dupsort_leaf_nodes_fail_loudly(tmp_path):
    """A leaf node carrying F_DUPDATA/F_SUBDATA must raise, not parse the
    sub-tree bytes as a Datum value."""
    L.write_lmdb(str(tmp_path), [(b"k1", b"v1"), (b"k2", b"v2")])
    kv = L.LmdbKV(str(tmp_path))
    [leaf] = kv.leaf_pgnos()
    # flip F_DUPDATA on the first node in the raw buffer
    import struct as _s

    data = tmp_path / "data.mdb"
    buf = bytearray(data.read_bytes())
    off = leaf * kv.page_size
    ptr = _s.unpack_from("<H", buf, off + 16)[0]
    _s.pack_into("<H", buf, off + ptr + 4, L.F_DUPDATA)
    data.write_bytes(buf)
    with pytest.raises(NotImplementedError, match="DUPSORT"):
        list(L.LmdbKV(str(tmp_path)).items())


def test_prefix_pushdown_bound_is_sound(tmp_path):
    """StringStartsWith pruning must keep keys that sort above
    prefix+0xFF*8 (the r14 review's unsound-bound scenario) and must not
    over-prune: plan with the prefix bound, then verify every matching
    key is still inside a planned leaf."""
    from pyspark.sql.datasource import StringStartsWith

    # keys: 'p' + 10 x 0xFF-ish tall keys plus normal ones
    items = [(b"p" + bytes([0xFF]) * 9, b"tall")]
    items += [(b"p%04d" % i, b"v") for i in range(3000)]
    items += [(b"q%04d" % i, b"v") for i in range(3000)]
    L.write_lmdb(str(tmp_path), items)
    r = L.LmdbReader({"path": str(tmp_path / "data.mdb"), "partitions": "64"})
    list(r.pushFilters([StringStartsWith(("id",), "p")]))
    planned = {pg for part in r.partitions() for pg in part.pgnos}
    kv = L.LmdbKV(str(tmp_path))
    covered = {
        k
        for pg in planned
        for k, _ in kv.iter_leaf(pg)
    }
    matching = {k for k, _ in items if k.startswith(b"p")}
    assert matching <= covered  # nothing matching was pruned away
    # and the q-side was actually pruned (the bound is doing work)
    assert len(planned) < len(kv.leaf_pgnos())
