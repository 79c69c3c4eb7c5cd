"""From-spec LMDB (Lightning Memory-Mapped Database) scan → DataFrame.

The reference reads Caffe LMDB datasets through a custom RDD backed by
the native liblmdbjni (``LmdbRDD.scala:36-155``): driver-side partition
planning by sequentially ITERATING the whole B-tree and remembering every
``part_size``-th key as a partition start key, then per-partition
``seek(startKey)`` + bounded enumeration, protobuf ``Datum`` decode, and
a CHW→HWC pixel reorder (``LmdbRDD.scala:270-281``). The DataFrame
conversion tool (``tools/LMDB2DataFrame.scala:12-18``) fixes the output
schema: ``(id string, label string, channels int, height int, width int,
encoded boolean, data binary)``.

This rebuild reads the LMDB byte format DIRECTLY — a pure-Python page
reader written from the public on-disk layout (struct definitions in
lmdb's ``mdb.c``/``lmdb.h``, Howard Chu's OpenLDAP LMDB; the format is
stable and versioned ``MDB_DATA_VERSION=1``), following the same
from-spec discipline as the JPEG/PNG/TIFF decode tier:

* dual meta pages 0/1, the live one chosen by larger ``mm_txnid``;
* 16-byte page headers (``p_pgno u64, mp_pad u16, mp_flags u16,
  pb_lower u16, pb_upper u16`` — the last four bytes reading as the
  ``pb_pages u32`` overflow-chain length on P_OVERFLOW pages);
* branch/leaf node headers (``mn_lo, mn_hi, mn_flags, mn_ksize``, each
  u16): leaf data size = ``lo | hi<<16`` with ``F_BIGDATA`` values
  spilled to contiguous overflow pages, branch child pgno =
  ``lo | hi<<16 | flags<<32``;
* ``MDB_db`` main-database descriptor in the meta (root pgno, depth,
  entry count — the count LMDB keeps exactly, used for planning).

Scale shape (how this differs from the reference's planner): partition
planning walks only the BRANCH level of the tree to list leaf page
numbers in key order and hands each planned partition a contiguous leaf
RANGE — O(branch pages) driver metadata I/O instead of the reference's
O(n) full-key iteration at plan time (``LmdbRDD.scala:60-90`` skips
``part_size`` entries per boundary on the driver). Executors open the
file read-only and touch only their own leaf/overflow pages; pixel bytes
never pass through the driver. On a real cluster the ``.mdb`` file must
be visible to executors: shared storage, ``--files`` shipping the way
the reference calls ``sc.addFile`` (``LmdbRDD.scala:252-257``), or — r16
— a remote URI (``file://``, ``s3://``, ``hdfs://`` where libhdfs is
deployed), which every open stages to machine-local disk once via
``fsio.ensure_local`` and mmaps, the reference's own SparkFiles strategy
(``LmdbRDD.scala:166-177``).

The ``Datum`` value codec is the public Caffe protobuf message
(``caffe.proto``: 1=channels, 2=height, 3=width, 4=data, 5=label,
6=float_data, 7=encoded) parsed with a minimal wire-format reader — no
protobuf dependency. Non-encoded multi-channel pixel data is reordered
CHW→HWC exactly as ``LmdbRDD.LMDBdata2Matdata`` does, vectorized
(one numpy transpose per value, not a per-byte loop).

A from-spec WRITER (``write_lmdb``) rounds out the capability for tests
and export: it emits the same layout (sorted leaf pages, minimal branch
levels, overflow chains for big values, dual metas) that the reader —
and the real liblmdb — consumes. The declared query ``lmdb_scan_agg``
builds a deterministic Datum corpus keyed by the documents table's
doc_ids, scans it through the full planner/reader/decode/reorder path,
and aggregates position-weighted byte checksums that a DuckDB oracle
recomputes in closed form from ``documents`` alone — a wrong byte, a
missed entry, a bad overflow stitch, or a wrong CHW→HWC permutation all
break the hash.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterable, Iterator, Sequence

import numpy as np

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

# --- on-disk constants (lmdb.h / mdb.c, public) ---------------------------

MDB_MAGIC = 0xBEEFC0DE
MDB_DATA_VERSION = 1
PAGE_SIZE = 4096
PAGEHDRSZ = 16
P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_LEAF2 = 0x20
F_BIGDATA = 0x01
F_SUBDATA = 0x02
F_DUPDATA = 0x04
P_INVALID = 0xFFFFFFFFFFFFFFFF
#: inline-value ceiling for the writer; liblmdb's me_nodemax is
#: ((psize - PAGEHDRSZ) / MDB_MINKEYS) & ~1 = 2040 for 4 KiB pages — any
#: threshold at or below that produces files liblmdb itself would accept,
#: and the READER handles both representations regardless
MAX_INLINE_DATA = 1900

LMDB_SCHEMA = (
    "id string, label string, channels int, height int, width int, "
    "encoded boolean, data binary"
)  # tools/LMDB2DataFrame.scala:12-18

FORMAT_NAME = "cos_lmdb"


# --- Caffe Datum wire codec (public caffe.proto) ---------------------------

def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated Datum: varint runs past buffer end")
        b = buf[pos]
        out |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return out, pos
        shift += 7


def _put_uvarint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def encode_datum(
    channels: int,
    height: int,
    width: int,
    data: bytes,
    label: int,
    encoded: bool = False,
    float_data: Sequence[float] | None = None,
) -> bytes:
    """Serialize a Caffe ``Datum`` (caffe.proto field numbers 1-7)."""
    out = bytearray()
    for field, v in ((1, channels), (2, height), (3, width)):
        out.append(field << 3)  # wire type 0
        _put_uvarint(out, v)
    out.append((4 << 3) | 2)  # bytes
    _put_uvarint(out, len(data))
    out.extend(data)
    out.append(5 << 3)
    _put_uvarint(out, label & 0xFFFFFFFF if label >= 0 else label + (1 << 64))
    for f in float_data or ():
        out.append((6 << 3) | 5)  # fixed32
        out.extend(struct.pack("<f", f))
    out.append(7 << 3)
    _put_uvarint(out, 1 if encoded else 0)
    return bytes(out)


def decode_datum(buf: bytes, want_data: bool = True) -> dict:
    """Parse a Caffe ``Datum`` — any field order, unknown fields skipped
    (standard proto2 semantics; the reference delegates this to the
    generated ``caffe.Caffe.Datum`` class, ``LmdbRDD.scala:136-149``).

    ``want_data=False`` is the column-pruned decode: the ``data`` payload
    is bounds-validated and SKIPPED, never copied — a metadata-only scan
    (count, label histogram) over a multi-TB image db moves no pixel
    bytes through Python."""
    out = {
        "channels": 0, "height": 0, "width": 0, "data": b"",
        "label": 0, "encoded": False, "float_data": [],
    }
    names = {1: "channels", 2: "height", 3: "width", 5: "label"}
    pos = 0
    while pos < len(buf):
        tag, pos = _uvarint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _uvarint(buf, pos)
            if field in names:
                out[names[field]] = v - (1 << 64) if v >= 1 << 63 else v
            elif field == 7:
                out["encoded"] = bool(v)
        elif wire == 2:
            n, pos = _uvarint(buf, pos)
            if pos + n > len(buf):
                # fail LOUDLY on corrupt values, matching the reader's
                # P_LEAF2/DUPSORT posture — a silently truncated data
                # slice would otherwise exit the loop as a "valid" row
                raise ValueError(
                    f"truncated Datum: field {field} declares {n} bytes, "
                    f"{len(buf) - pos} remain"
                )
            if field == 4 and not want_data:
                pos += n  # pruned: validate + skip, no copy
                continue
            chunk = buf[pos : pos + n]
            pos += n
            if field == 4:
                out["data"] = chunk
            elif field == 6:  # packed floats
                out["float_data"].extend(
                    struct.unpack(f"<{len(chunk) // 4}f", chunk)
                )
        elif wire == 5:
            if pos + 4 > len(buf):
                raise ValueError("truncated Datum: fixed32 past buffer end")
            if field == 6:
                out["float_data"].append(
                    struct.unpack_from("<f", buf, pos)[0]
                )
            pos += 4
        elif wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated Datum: fixed64 past buffer end")
            pos += 8
        else:  # pragma: no cover - groups (3/4) don't appear in Datum
            raise ValueError(f"unsupported wire type {wire}")
    return out


def chw_to_hwc(channels: int, data: bytes) -> bytes:
    """Pixel reorder (channel,height,width) → (height,width,channel) —
    ``LmdbRDD.LMDBdata2Matdata`` (``LmdbRDD.scala:270-281``), vectorized:
    HWC[p*C + c] = CHW[c*HW + p]. Always returns BYTES, even on the
    passthrough branches — callers feed zero-copy memoryviews, and a
    memoryview leaking into a Spark row fails the engine's binary
    converter (r15 review finding: every grayscale raw row crashed)."""
    if channels <= 1 or not data:
        return bytes(data)
    hw, rem = divmod(len(data), channels)
    if rem:  # not a dense pixel volume — pass through untouched
        return bytes(data)
    arr = np.frombuffer(data, dtype=np.uint8).reshape(channels, hw)
    return arr.transpose(1, 0).tobytes()


# --- pure-Python LMDB page reader ------------------------------------------

class LmdbKV:
    """Read-only B-tree access to one LMDB data file.

    ``path`` may be the environment directory (containing ``data.mdb``,
    how liblmdb and the reference address it — ``LmdbRDD.scala:166-191``)
    or the data file itself.
    """

    def __init__(self, path: str):
        import mmap

        from caffeonspark_spark.sources import fsio

        if fsio.is_uri(path):
            # remote environment → stage the data file to machine-local
            # disk once and mmap the copy: the reference's own strategy
            # for remote LMDB (``LmdbRDD.scala:166-177`` ships the env
            # via SparkFiles and opens it locally), and the right one
            # for a B-tree's scattered-random page walks, where per-page
            # network round-trips would dominate (r16 fsio shim)
            path = fsio.ensure_local(
                fsio.join(path, "data.mdb") if fsio.is_dir(path) else path
            )
        self.path = (
            os.path.join(path, "data.mdb") if os.path.isdir(path) else path
        )
        # mmap, not a full read: the planner touches branch pages only and
        # each executor touches its own leaf/overflow pages — slurping a
        # multi-GB db once per task is exactly what the leaf-range design
        # exists to avoid (r14 review finding)
        self._fh = open(self.path, "rb")  # noqa: SIM115 - lifetime = object
        try:
            try:
                self._buf = mmap.mmap(
                    self._fh.fileno(), 0, access=mmap.ACCESS_READ
                )
            except ValueError:  # zero-length file → no valid meta below
                self._buf = b""
            # mm_psize IS the FREE_DBI descriptor's md_pad field (mdb.c:
            # '#define mm_psize mm_dbs[FREE_DBI].md_pad') and meta page 0
            # sits at offset 0 regardless of page size, so read it from
            # there first — the way mdb_env_open does. Fall back to the
            # meta-1 location probe only when md_pad is 0 (files written
            # by tools that left it blank): offset = psize and the page
            # carries its own pgno, so a wrong probe fails the pgno/magic
            # check; probing page 0 is degenerate — offset 0 "succeeds"
            # at any candidate size (r14 review finding).
            m0 = self._try_meta(0, PAGE_SIZE)  # offset 0: psize-agnostic
            stored = m0["psize"] if m0 is not None else 0
            if (
                512 <= stored <= 65536
                and stored & (stored - 1) == 0
                and self._try_meta(1, stored) is not None
            ):
                psize = stored
            else:
                psize = next(
                    (
                        c
                        for c in (
                            PAGE_SIZE, 8192, 16384, 32768, 65536,
                            1024, 2048, 512,
                        )
                        if self._try_meta(1, c) is not None
                    ),
                    None,
                )
            if psize is None:
                raise ValueError(f"{self.path}: no valid LMDB meta page 1")
            metas = [
                m
                for p in (0, 1)
                if (m := self._try_meta(p, psize)) is not None
            ]
            meta = max(metas, key=lambda m: m["txnid"])
        except BaseException:
            # don't leak the fd/mmap when the file has no valid meta
            self.close()
            raise
        self.entries: int = meta["entries"]
        self.root: int = meta["root"]
        self.depth: int = meta["depth"]
        self.page_size: int = psize

    def close(self) -> None:
        """Release the mmap and file handle deterministically (executors
        must not rely on refcount GC after every partitions()/read())."""
        buf = getattr(self, "_buf", b"")
        if buf is not None and not isinstance(buf, bytes):
            try:
                buf.close()
            except BufferError:
                # zero-copy memoryviews still alive (e.g. generator-frame
                # locals); dropping our reference lets refcount GC unmap
                # once they die — release stays deterministic otherwise
                pass
        self._buf = b""
        fh = getattr(self, "_fh", None)
        if fh is not None and not fh.closed:
            fh.close()

    def __enter__(self) -> "LmdbKV":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _try_meta(self, pgno: int, psize: int) -> dict | None:
        off = pgno * psize
        if off + PAGEHDRSZ + 136 > len(self._buf):
            return None
        p_pgno, _, flags = struct.unpack_from("<QHH", self._buf, off)
        if p_pgno != pgno or not flags & P_META:
            return None
        m = off + PAGEHDRSZ
        magic, version = struct.unpack_from("<II", self._buf, m)
        if magic != MDB_MAGIC or version != MDB_DATA_VERSION:
            return None
        # MDB_meta: magic, version, address(8), mapsize(8),
        # dbs[2] (48 each: pad u32, flags u16, depth u16, branch u64,
        # leaf u64, overflow u64, entries u64, root u64), last_pg, txnid
        main = m + 4 + 4 + 8 + 8 + 48
        _, _, depth, _, _, _, entries, root = struct.unpack_from(
            "<IHHQQQQQ", self._buf, main
        )
        txnid = struct.unpack_from("<Q", self._buf, main + 48 + 8)[0]
        # mm_psize lives in FREE_DBI's md_pad (first u32 of the dbs array)
        psize_field = struct.unpack_from("<I", self._buf, m + 24)[0]
        return {
            "txnid": txnid, "entries": entries, "root": root, "depth": depth,
            "psize": psize_field,
        }

    # -- page primitives --

    def _page(self, pgno: int) -> tuple[int, int, int]:
        """→ (offset, flags, numkeys)."""
        off = pgno * self.page_size
        _, _, flags, lower = struct.unpack_from("<QHHH", self._buf, off)
        return off, flags, (lower - PAGEHDRSZ) >> 1

    def _node(self, page_off: int, i: int) -> tuple[int, int, int, bytes]:
        """Node ``i`` → (lo|hi<<16, flags, ksize, key)."""
        ptr = struct.unpack_from("<H", self._buf, page_off + PAGEHDRSZ + 2 * i)[0]
        off = page_off + ptr
        lo, hi, flags, ksize = struct.unpack_from("<HHHH", self._buf, off)
        key = self._buf[off + 8 : off + 8 + ksize]
        return lo | (hi << 16), flags, off, key

    def leaf_ranges(self) -> list[tuple[int, bytes | None]]:
        """Ordered ``(pgno, lower_key)`` for every leaf — planner metadata
        (walks branch levels only; never touches leaf or overflow bytes).
        ``lower_key`` is the smallest key the leaf can contain, taken from
        the BRANCH node keys (``None`` for the unbounded left edge; a
        branch page's first node is keyless and inherits its parent's
        lower bound). Leaf i's key range is [lower_i, lower_{i+1})."""
        if self.root == P_INVALID:
            return []
        level: list[tuple[int, bytes | None]] = [(self.root, None)]
        while True:
            off, flags, _ = self._page(level[0][0])
            if flags & P_LEAF:
                return level
            if not flags & P_BRANCH:
                raise ValueError(f"unexpected page flags 0x{flags:x}")
            nxt: list[tuple[int, bytes | None]] = []
            for pgno, low in level:
                off, flags, nkeys = self._page(pgno)
                for i in range(nkeys):
                    sz, nflags, _, key = self._node(off, i)
                    nxt.append(
                        (sz | (nflags << 32), low if i == 0 else bytes(key))
                    )
            level = nxt

    def leaf_pgnos(self) -> list[int]:
        """Leaf page numbers in key order."""
        return [pgno for pgno, _ in self.leaf_ranges()]

    def iter_leaf(
        self, pgno: int, zero_copy: bool = False
    ) -> Iterator[tuple[bytes, bytes]]:
        """(key, value) pairs of one leaf page, overflow chains resolved.

        ``zero_copy=True`` yields values as MEMORYVIEWS over the mmap
        instead of bytes copies: a column-pruned decode that SKIPS the
        pixel field then never faults in the middle pages of a big
        value's overflow chain — on a multi-TB image db a metadata-only
        scan does O(keys + Datum header/tail bytes) of real I/O, not
        O(database). Callers must drop the views before ``close()``
        (``close()`` falls back to refcount release if any are alive)."""
        off, flags, nkeys = self._page(pgno)
        if flags & P_LEAF2:
            raise NotImplementedError(
                "MDB_DUPFIXED (P_LEAF2) pages are not used by Caffe LMDB "
                "datasets; unsupported by this reader"
            )
        view = memoryview(self._buf) if zero_copy else self._buf
        for i in range(nkeys):
            dsize, nflags, noff, key = self._node(off, i)
            if nflags & (F_SUBDATA | F_DUPDATA):
                # MDB_DUPSORT sub-trees / named-database descriptors look
                # like plain values byte-wise — fail LOUDLY like the
                # P_LEAF2 guard instead of yielding garbage rows (r14
                # review finding); Caffe datasets never use either
                raise NotImplementedError(
                    "DUPSORT/sub-database leaf nodes (F_DUPDATA/F_SUBDATA)"
                    " are not used by Caffe LMDB datasets; unsupported by"
                    " this reader"
                )
            data_off = noff + 8 + len(key)
            if nflags & F_BIGDATA:
                ovf = struct.unpack_from("<Q", self._buf, data_off)[0]
                o = ovf * self.page_size
                yield key, view[o + PAGEHDRSZ : o + PAGEHDRSZ + dsize]
            else:
                yield key, view[data_off : data_off + dsize]

    def items(self) -> Iterator[tuple[bytes, bytes]]:
        for pgno in self.leaf_pgnos():
            yield from self.iter_leaf(pgno)


# --- from-spec writer (fixtures / export) ----------------------------------

def _even(n: int) -> int:
    return n + (n & 1)


def write_lmdb(path: str, items: Iterable[tuple[bytes, bytes]]) -> str:
    """Write ``(key, value)`` pairs as a valid single-file LMDB database
    (``data.mdb`` under ``path`` if ``path`` is/becomes a directory).

    Layout choices (all within what liblmdb produces): 4 KiB pages, keys
    pre-sorted into packed leaves, values over ``MAX_INLINE_DATA`` bytes
    on contiguous overflow chains, minimal branch levels above, FREE_DBI
    empty, meta 0 at txnid 0 and meta 1 at txnid 1. Returns the data-file
    path. Page numbering: metas 0-1, leaves, overflow chains, branches.
    """
    from caffeonspark_spark.sources import fsio

    if fsio.is_uri(path):
        raise NotImplementedError(
            "write_lmdb targets local paths only (an LMDB environment is "
            "a random-access mmap'd file — write locally, then upload); "
            f"got {path!r}"
        )
    recs = sorted(items)
    if any(len(k) == 0 or len(k) > 511 for k, _ in recs):
        raise ValueError("LMDB keys must be 1..511 bytes")

    # pass 1 — plan leaves and overflow chains
    leaves: list[list[int]] = []  # record indices per leaf
    ovf_pages: list[tuple[int, bytes]] = []  # (first pgno later, value)
    big: dict[int, int] = {}  # record idx -> overflow chain index
    cur: list[int] = []
    room = PAGE_SIZE - PAGEHDRSZ
    for idx, (k, v) in enumerate(recs):
        inline = len(v) <= MAX_INLINE_DATA
        need = 2 + _even(8 + len(k) + (len(v) if inline else 8))
        if need > room and cur:
            leaves.append(cur)
            cur, room = [], PAGE_SIZE - PAGEHDRSZ
        cur.append(idx)
        room -= need
        if not inline:
            big[idx] = len(ovf_pages)
            ovf_pages.append((0, v))
    if cur or not leaves:
        leaves.append(cur)

    first_leaf = 2
    next_pg = first_leaf + len(leaves)
    ovf_start: list[int] = []
    n_ovf = 0
    for _, v in ovf_pages:
        ovf_start.append(next_pg)
        npages = (PAGEHDRSZ + len(v) + PAGE_SIZE - 1) // PAGE_SIZE
        next_pg += npages
        n_ovf += npages

    def render_page(pgno: int, flags: int, nodes: list[bytes]) -> bytearray:
        page = bytearray(PAGE_SIZE)
        upper = PAGE_SIZE
        ptrs = []
        for nb in nodes:
            upper -= _even(len(nb))
            page[upper : upper + len(nb)] = nb
            ptrs.append(upper)
        lower = PAGEHDRSZ + 2 * len(ptrs)
        struct.pack_into("<QHHHH", page, 0, pgno, 0, flags, lower, upper)
        for i, p in enumerate(ptrs):
            struct.pack_into("<H", page, PAGEHDRSZ + 2 * i, p)
        return page

    pages: dict[int, bytearray] = {}
    for li, idxs in enumerate(leaves):
        nodes = []
        for idx in idxs:
            k, v = recs[idx]
            if idx in big:
                hdr = struct.pack(
                    "<HHHH", len(v) & 0xFFFF, len(v) >> 16, F_BIGDATA, len(k)
                )
                nodes.append(hdr + k + struct.pack("<Q", ovf_start[big[idx]]))
            else:
                hdr = struct.pack(
                    "<HHHH", len(v) & 0xFFFF, len(v) >> 16, 0, len(k)
                )
                nodes.append(hdr + k + v)
        pages[first_leaf + li] = render_page(first_leaf + li, P_LEAF, nodes)

    for ci, (_, v) in enumerate(ovf_pages):
        pgno = ovf_start[ci]
        npages = (PAGEHDRSZ + len(v) + PAGE_SIZE - 1) // PAGE_SIZE
        blob = bytearray(npages * PAGE_SIZE)
        struct.pack_into("<QHHI", blob, 0, pgno, 0, P_OVERFLOW, npages)
        blob[PAGEHDRSZ : PAGEHDRSZ + len(v)] = v
        for j in range(npages):
            pages[pgno + j] = blob[j * PAGE_SIZE : (j + 1) * PAGE_SIZE]

    # pass 2 — branch levels bottom-up until a single root
    def first_key(pgno: int) -> bytes:
        # leaves keep record order; branches carry their first child's key
        return level_keys[pgno]

    level = list(range(first_leaf, first_leaf + len(leaves)))
    level_keys = {
        pg: recs[leaves[i][0]][0] if leaves[i] else b""
        for i, pg in enumerate(level)
    }
    depth = 1
    n_branch = 0
    while len(level) > 1:
        nxt: list[int] = []
        i = 0
        while i < len(level):
            nodes, children = [], []
            room = PAGE_SIZE - PAGEHDRSZ
            while i < len(level):
                key = b"" if not nodes else first_key(level[i])
                need = 2 + _even(8 + len(key))
                if need > room and nodes:
                    break
                child = level[i]
                hdr = struct.pack(
                    "<HHHH",
                    child & 0xFFFF,
                    (child >> 16) & 0xFFFF,
                    (child >> 32) & 0xFFFF,
                    len(key),
                )
                nodes.append(hdr + key)
                children.append(child)
                room -= need
                i += 1
            pgno = next_pg
            next_pg += 1
            n_branch += 1
            pages[pgno] = render_page(pgno, P_BRANCH, nodes)
            level_keys[pgno] = level_keys[children[0]]
            nxt.append(pgno)
        level = nxt
        depth += 1

    root = level[0] if recs else P_INVALID
    if not recs:
        depth = 0

    def meta_page(pgno: int, txnid: int) -> bytearray:
        page = bytearray(PAGE_SIZE)
        struct.pack_into("<QHHHH", page, 0, pgno, 0, P_META, 0, 0)
        m = PAGEHDRSZ
        struct.pack_into(
            "<IIQQ", page, m, MDB_MAGIC, MDB_DATA_VERSION, 0,
            max(next_pg * PAGE_SIZE, 1 << 20),
        )
        # FREE_DBI: empty — except md_pad, which IS mm_psize (mdb.c:
        # '#define mm_psize mm_dbs[FREE_DBI].md_pad'); real liblmdb's
        # mdb_env_open reads the page size from here
        struct.pack_into(
            "<IHHQQQQQ", page, m + 24, PAGE_SIZE, 0, 0, 0, 0, 0, 0, P_INVALID
        )
        # MAIN_DBI
        struct.pack_into(
            "<IHHQQQQQ", page, m + 72, 0, 0, depth, n_branch, len(leaves),
            n_ovf, len(recs), root,
        )
        struct.pack_into("<QQ", page, m + 120, next_pg - 1, txnid)
        return page

    if not os.path.splitext(path)[1]:
        os.makedirs(path, exist_ok=True)
        out_path = os.path.join(path, "data.mdb")
    else:
        out_path = path
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(meta_page(0, 0))
        fh.write(meta_page(1, 1))
        for pgno in range(2, next_pg):
            fh.write(pages[pgno])
    os.replace(tmp, out_path)
    return out_path


# --- Spark DataSource -------------------------------------------------------

#: full image-tuple field order and Spark type names (shared by the LMDB
#: and SequenceFile sources — both produce the reference 7-tuple)
IMAGE_TUPLE_FIELDS = {
    "id": "string", "label": "string", "channels": "int", "height": "int",
    "width": "int", "encoded": "boolean", "data": "binary",
}


def _validated_fields(schema) -> list[str]:
    """Image-tuple column-prune validation (shared impl in common.py)."""
    from caffeonspark_spark.sources.common import validated_fields

    return validated_fields(schema, IMAGE_TUPLE_FIELDS)


class _LeafRange(InputPartition):
    def __init__(self, path: str, pgnos: list[int]):
        self.path = path
        self.pgnos = pgnos


class LmdbReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType | None = None):
        self.path = options["path"]
        self.n_partitions = int(options.get("partitions", "8"))
        # COLUMN PRUNING: Catalyst does not push column pruning into
        # Python sources (the scan always outputs the source schema and a
        # Project above drops columns), so pruning rides the user-schema
        # mechanism instead — spark.read.schema(<subset>) hands the subset
        # to reader(schema). A metadata-only scan then skips the Datum
        # pixel-byte copy AND the CHW→HWC reorder; an id-only scan skips
        # value decode entirely (leaf keys only).
        self._fields = _validated_fields(schema)
        self._lo: bytes | None = None  # inclusive key lower bound
        self._hi: bytes | None = None  # inclusive key upper bound
        self._hi_excl: bytes | None = None  # EXCLUSIVE upper bound (prefix)

    def pushFilters(self, filters):
        """Key-range partition PRUNING off ``id`` predicates — the
        Python-source equivalent of parquet partition pruning, and a
        capability the reference planner lacks (``LmdbRDD.scala:60-90``
        iterates every key at plan time regardless of the query): leaves
        whose [lower, next_lower) branch-key range cannot contain a
        matching id are never planned, read, or decoded. Every filter is
        RE-YIELDED for Spark to evaluate row-exactly — the bounds only
        prune, so >, >= (and In via min/max) can share one conservative
        inclusive range. Same sharp edge as the imagedir source: pushed
        state bakes into the DataFrame's relation on first action; derive
        each distinct filter set from a fresh ``lmdb_to_dataframe`` call."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
            StringStartsWith,
        )

        def _raise_lo(v: bytes) -> None:
            self._lo = v if self._lo is None else max(self._lo, v)

        def _drop_hi(v: bytes) -> None:
            self._hi = v if self._hi is None else min(self._hi, v)

        for f in filters:
            if getattr(f, "attribute", None) == ("id",):
                if isinstance(f, EqualTo):
                    _raise_lo(str(f.value).encode())
                    _drop_hi(str(f.value).encode())
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    _raise_lo(str(f.value).encode())
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    _drop_hi(str(f.value).encode())
                elif isinstance(f, In) and f.value:
                    vs = [str(v).encode() for v in f.value]
                    _raise_lo(min(vs))
                    _drop_hi(max(vs))
                elif isinstance(f, StringStartsWith):
                    p = str(f.value).encode()
                    _raise_lo(p)
                    # EXCLUSIVE upper bound: the prefix with its last
                    # non-0xFF byte incremented — every key matching the
                    # prefix sorts strictly below it. An appended-0xFF
                    # inclusive bound is UNSOUND: prefix + b"\\xff"*9
                    # sorts above prefix + b"\\xff"*8 and its leaf would
                    # be pruned before the row-exact filter could keep it
                    # (r14 review finding). All-0xFF prefix → unbounded.
                    stem = p.rstrip(b"\xff")
                    if stem:
                        bound = stem[:-1] + bytes([stem[-1] + 1])
                        self._hi_excl = (
                            bound
                            if self._hi_excl is None
                            else min(self._hi_excl, bound)
                        )
            yield f  # pruning-only pushdown: Spark keeps row-exact filtering

    def partitions(self) -> Sequence[InputPartition]:
        with LmdbKV(self.path) as kv:
            return self._plan(kv)

    def _plan(self, kv: "LmdbKV") -> Sequence[InputPartition]:
        ranges = kv.leaf_ranges()
        pgnos = []
        for i, (pgno, low) in enumerate(ranges):
            nxt = ranges[i + 1][1] if i + 1 < len(ranges) else None
            # leaf covers [low, nxt); drop it when the whole range misses
            # the pushed inclusive [lo, hi] key window
            if self._lo is not None and nxt is not None and nxt <= self._lo:
                continue
            if self._hi is not None and low is not None and low > self._hi:
                continue
            if (
                self._hi_excl is not None
                and low is not None
                and low >= self._hi_excl
            ):
                continue
            pgnos.append(pgno)
        n = max(1, min(self.n_partitions, len(pgnos) or 1))
        bounds = [round(i * len(pgnos) / n) for i in range(n + 1)]
        chunks = [pgnos[bounds[i] : bounds[i + 1]] for i in range(n)]
        # the engine substitutes [None] for an empty partition list — an
        # empty db must still plan ONE empty partition (imagedir lesson).
        # Partitions carry the ORIGINAL option path, not kv.path: for a
        # remote URI, kv.path is the DRIVER's /tmp-staged copy, which
        # other machines don't have — each executor must re-stage from
        # the URI into its own machine-local cache (r16 fsio shim)
        from caffeonspark_spark.sources import fsio

        part_path = self.path if fsio.is_uri(self.path) else kv.path
        return [_LeafRange(part_path, c) for c in chunks if c] or [
            _LeafRange(part_path, [])
        ]

    def read(self, partition: _LeafRange) -> Iterator[tuple]:
        fields = self._fields
        want_data = "data" in fields
        key_only = fields == ["id"]
        with LmdbKV(partition.path) as kv:
            for pgno in partition.pgnos:
                # zero-copy values: a pruned decode skips the pixel field
                # without ever faulting in its overflow pages
                for key, value in kv.iter_leaf(pgno, zero_copy=True):
                    if key_only:  # pruned to the key: no value decode
                        yield (key.decode("utf-8", "replace"),)
                        continue
                    d = decode_datum(value, want_data=want_data)
                    if want_data:
                        d["data"] = (
                            bytes(d["data"])
                            if d["encoded"]
                            else chw_to_hwc(d["channels"], d["data"])
                        )
                    d["id"] = key.decode("utf-8", "replace")
                    d["label"] = str(d["label"])
                    yield tuple(d[f] for f in fields)


class LmdbDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return LMDB_SCHEMA

    def reader(self, schema: StructType) -> LmdbReader:
        return LmdbReader(self.options, schema)


def register(spark) -> None:
    # planning-time pushdown for Python sources is opt-in (imagedir sets
    # the same conf; key-range pruning needs it)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LmdbDataSource)


def lmdb_to_dataframe(
    spark, path: str, partitions: int = 8, columns: list[str] | None = None
):
    """LMDB scan as a DataFrame — the E4 ``LMDB2DataFrame`` tool
    (``tools/LMDB2DataFrame.scala:31-45``) as a one-liner: plan, scan,
    decode, reorder; write with any builtin sink.

    ``columns=`` prunes AT THE SOURCE (Catalyst cannot push column
    pruning into Python sources): ``columns=["id", "label"]`` skips the
    pixel-byte copy and CHW→HWC reorder per row; ``columns=["id"]``
    skips Datum decode entirely — metadata-only scans over a multi-TB
    image db touch leaf keys only."""
    register(spark)
    reader = (
        spark.read.format(FORMAT_NAME)
        .option("path", path)
        .option("partitions", str(partitions))
    )
    if columns is not None:
        from caffeonspark_spark.sources.common import pruned_ddl

        reader = reader.schema(pruned_ddl(columns, IMAGE_TUPLE_FIELDS))
    return reader.load()


# --- declared query + fixture ----------------------------------------------

#: fixture arithmetic, shared by the generator (Python) and the oracle
#: (SQL): raw rows are 3×4×5 CHW volumes byte(c,p) = (id*7+c*11+p*3)%256;
#: every 5th id is an "encoded" opaque blob of 2500+(id%3)*700 bytes
#: byte(i) = (id*31+i)%256 — big enough to force overflow chains
_RAW_C, _RAW_H, _RAW_W = 3, 4, 5


def _fixture_value(doc_id: int) -> bytes:
    if doc_id % 5 == 4:
        n = 2500 + (doc_id % 3) * 700
        payload = ((doc_id * 31 + np.arange(n)) % 256).astype(np.uint8)
        return encode_datum(0, 0, 0, payload.tobytes(), doc_id % 10, True)
    c = np.arange(_RAW_C).reshape(-1, 1)
    p = np.arange(_RAW_H * _RAW_W).reshape(1, -1)
    chw = ((doc_id * 7 + c * 11 + p * 3) % 256).astype(np.uint8)
    return encode_datum(
        _RAW_C, _RAW_H, _RAW_W, chw.tobytes(), doc_id % 10, False
    )


#: bump when _fixture_value arithmetic or the writer layout changes —
#: the version is part of the shared /tmp cache key, so older processes'
#: on-disk fixtures can never be silently reused by newer code (r14
#: ADVICE). v2 = writer stores mm_psize in FREE_DBI md_pad.
_FIXTURE_VERSION = 2


def ensure_fixture(n_docs: int, base: str = "/tmp") -> str:
    """Deterministic Datum LMDB keyed ``%08d`` over ids 0..n-1, built once
    per size (idempotent; the write is atomic via rename). Also emits the
    ToolTest-style label manifest beside it for count-parity checks."""
    env_dir = os.path.join(
        base, f"cos_lmdb_fixture_v{_FIXTURE_VERSION}_{n_docs}"
    )
    data = os.path.join(env_dir, "data.mdb")
    labels = os.path.join(env_dir, "labels.txt")
    if not (os.path.exists(data) and os.path.exists(labels)):
        os.makedirs(env_dir, exist_ok=True)
        # build under pid-unique names then rename: two concurrent
        # processes (bench + a test run) must not interleave writes into
        # one shared .tmp; the deterministic content makes the last
        # rename-over harmless either way
        tmp_db = os.path.join(env_dir, f".build_{os.getpid()}.mdb")
        write_lmdb(
            tmp_db,
            (
                (b"%08d" % i, _fixture_value(i))
                for i in range(n_docs)
            ),
        )
        os.replace(tmp_db, data)
        tmp = f"{labels}.{os.getpid()}.tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            for i in range(n_docs):
                fh.write(f"{i:08d} {i % 10}\n")
        os.replace(tmp, labels)
    return env_dir


from caffeonspark_spark.sources.common import (  # noqa: E402 - shared
    ROW_METRICS_SCHEMA as _RM_SCHEMA,
    row_metrics as _row_metrics,
)


def lmdb_scan_agg(spark, sf_dir: str):
    """Declared query (✔oracle): full LMDB path end-to-end — build the
    deterministic Datum fixture for this SF's documents ids, scan it
    through the planned-partition page reader, decode every Datum,
    CHW→HWC-reorder raw pixel volumes, checksum the returned bytes
    per row (Arrow-batched), and roll up per label. DuckDB recomputes
    every aggregate in closed form from ``documents.doc_id``."""
    from pyspark.sql import functions as F

    from caffeonspark_spark.catalog import table_nrows

    env_dir = ensure_fixture(table_nrows(sf_dir, "documents"))
    df = lmdb_to_dataframe(spark, env_dir)
    per_row = df.mapInPandas(
        _row_metrics,
        _RM_SCHEMA,
    )
    return (
        per_row.groupBy("label")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("enc").alias("n_encoded"),
            F.sum("channels").alias("sum_channels"),
            F.sum("dlen").alias("sum_dlen"),
            F.sum("wsum").alias("sum_wsum"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .orderBy("label")
    )


ORACLE_LMDB_SCAN = f"""
WITH base AS (
    SELECT doc_id,
           CAST(doc_id % 10 AS VARCHAR) AS label,
           CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS enc,
           CASE WHEN doc_id % 5 = 4 THEN 2500 + (doc_id % 3) * 700
                ELSE {_RAW_C * _RAW_H * _RAW_W} END AS dlen
    FROM documents
),
enc_sum AS (
    SELECT b.doc_id,
           SUM(((b.doc_id * 31 + t.i) % 256) * (t.i + 1)) AS wsum
    FROM base b, LATERAL (SELECT unnest(range(0, b.dlen)) AS i) t
    WHERE b.enc = 1
    GROUP BY b.doc_id
),
raw_sum AS (
    -- HWC position p*C+c holds CHW byte (id*7 + c*11 + p*3) % 256
    SELECT b.doc_id,
           SUM(((b.doc_id * 7 + c.c * 11 + p.p * 3) % 256)
               * (p.p * {_RAW_C} + c.c + 1)) AS wsum
    FROM base b,
         (SELECT unnest(range(0, {_RAW_H * _RAW_W})) AS p) p,
         (SELECT unnest(range(0, {_RAW_C})) AS c) c
    WHERE b.enc = 0
    GROUP BY b.doc_id
)
SELECT b.label,
       COUNT(*) AS n_rows,
       CAST(SUM(b.enc) AS BIGINT) AS n_encoded,
       CAST(SUM(CASE WHEN b.enc = 0 THEN {_RAW_C} ELSE 0 END) AS BIGINT)
           AS sum_channels,
       CAST(SUM(b.dlen) AS BIGINT) AS sum_dlen,
       CAST(SUM(COALESCE(e.wsum, r.wsum)) AS BIGINT) AS sum_wsum,
       MIN(lpad(CAST(b.doc_id AS VARCHAR), 8, '0')) AS min_id,
       MAX(lpad(CAST(b.doc_id AS VARCHAR), 8, '0')) AS max_id
FROM base b
LEFT JOIN enc_sum e ON b.doc_id = e.doc_id
LEFT JOIN raw_sum r ON b.doc_id = r.doc_id
GROUP BY b.label
ORDER BY b.label
"""


def lmdb_pruned_lookup(spark, sf_dir: str):
    """Declared query (✔oracle): key-range PRUNED lookup over the LMDB
    fixture — the scan restricted to ids in [n/4, n/2) through a pushed
    range predicate, so partition planning drops every leaf outside the
    window (``LmdbReader.pushFilters``; the plan pin asserts the planned
    leaf fraction), then the same per-row checksum rollup as
    ``lmdb_scan_agg`` collapsed to ONE global row. DuckDB recomputes the
    window with the identical integer arithmetic off ``COUNT(*)``
    (doc_ids are 0..n-1, TESTDATA.md), so a wrong prune boundary — a
    dropped in-range leaf or a mis-bracketed edge — changes row counts
    and checksums and breaks the hash."""
    from pyspark.sql import functions as F

    from caffeonspark_spark.catalog import table_nrows

    n = table_nrows(sf_dir, "documents")
    env_dir = ensure_fixture(n)
    lo, hi = n // 4, n // 2
    df = lmdb_to_dataframe(spark, env_dir).where(
        (F.col("id") >= f"{lo:08d}") & (F.col("id") < f"{hi:08d}")
    )
    per_row = df.mapInPandas(
        _row_metrics,
        _RM_SCHEMA,
    )
    return per_row.agg(
        F.count("*").alias("n_rows"),
        F.sum("enc").alias("n_encoded"),
        F.sum("dlen").alias("sum_dlen"),
        F.sum("wsum").alias("sum_wsum"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


ORACLE_LMDB_PRUNED_LOOKUP = f"""
WITH bounds AS (
    SELECT COUNT(*) // 4 AS lo, COUNT(*) // 2 AS hi FROM documents
),
base AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS enc,
           CASE WHEN doc_id % 5 = 4 THEN 2500 + (doc_id % 3) * 700
                ELSE {_RAW_C * _RAW_H * _RAW_W} END AS dlen
    FROM documents, bounds
    WHERE doc_id >= bounds.lo AND doc_id < bounds.hi
),
enc_sum AS (
    SELECT b.doc_id,
           SUM(((b.doc_id * 31 + t.i) % 256) * (t.i + 1)) AS wsum
    FROM base b, LATERAL (SELECT unnest(range(0, b.dlen)) AS i) t
    WHERE b.enc = 1
    GROUP BY b.doc_id
),
raw_sum AS (
    SELECT b.doc_id,
           SUM(((b.doc_id * 7 + c.c * 11 + p.p * 3) % 256)
               * (p.p * {_RAW_C} + c.c + 1)) AS wsum
    FROM base b,
         (SELECT unnest(range(0, {_RAW_H * _RAW_W})) AS p) p,
         (SELECT unnest(range(0, {_RAW_C})) AS c) c
    WHERE b.enc = 0
    GROUP BY b.doc_id
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(b.enc) AS BIGINT) AS n_encoded,
       CAST(SUM(b.dlen) AS BIGINT) AS sum_dlen,
       CAST(SUM(COALESCE(e.wsum, r.wsum)) AS BIGINT) AS sum_wsum,
       MIN(lpad(CAST(b.doc_id AS VARCHAR), 8, '0')) AS min_id,
       MAX(lpad(CAST(b.doc_id AS VARCHAR), 8, '0')) AS max_id
FROM base b
LEFT JOIN enc_sum e ON b.doc_id = e.doc_id
LEFT JOIN raw_sum r ON b.doc_id = r.doc_id
"""
