"""Minimal from-spec Java Object Serialization codec for SequenceFile keys.

The reference's SequenceFile source stores each record key as a Java
serialization stream (``SeqImageDataSource.scala:36-69`` reads it with
``ObjectInputStream``; ``Binary2Sequence.scala:56-60`` and
``LMDB2Sequence.scala:31-38`` write it with ``ObjectOutputStream``) in
one of three shapes:

1. ``com.yahoo.ml.dl.caffe.Pair[String, String]`` (fields ``first``,
   ``second`` — ``Pair.java:9-16``), legacy;
2. ``scala.Tuple2[String, String]`` — ``(id, label)``;
3. ``scala.Tuple6[String, String, Int, Int, Int, Boolean]`` —
   ``(id, label, channels, height, width, encoded)``.

This module implements the public **Java Object Serialization Stream
Protocol** (the grammar in the JDK's "Object Serialization Stream
Protocol" specification): the READER is a generic subset parser —
TC_OBJECT / TC_CLASSDESC / TC_STRING / TC_REFERENCE / TC_NULL /
TC_ENDBLOCKDATA / TC_BLOCKDATA, handle table, super-first field walk,
primitive typecodes — enough to decode any plain-Serializable object
graph of the kind above regardless of which of the three shapes (or
which writing JVM) produced it. It dispatches on CLASS NAME and ignores
serialVersionUID on read, exactly like a reader whose local classes set
``serialVersionUID`` compatibly.

The WRITER emits the three shapes byte-identically to an OpenJDK
``ObjectOutputStream`` (same handle-assignment order, same
back-references), using the published fixed ``@SerialVersionUID``
constants of ``scala.Tuple2``/``Tuple6`` (scala-library 2.13) and
``java.lang.Integer``/``Number``/``Boolean`` (JDK) — so a real JVM with
scala-library on the classpath deserializes our keys. Tests verify both
directions against Spark's own JVM via py4j.

Scale note: each key is a self-contained ~100-300 byte stream decoded
per record inside an executor task; there is no driver-side work here.
"""

from __future__ import annotations

import struct

STREAM_MAGIC = 0xACED
STREAM_VERSION = 5

TC_NULL = 0x70
TC_REFERENCE = 0x71
TC_CLASSDESC = 0x72
TC_OBJECT = 0x73
TC_STRING = 0x74
TC_ARRAY = 0x75
TC_CLASS = 0x76
TC_BLOCKDATA = 0x77
TC_ENDBLOCKDATA = 0x78
TC_RESET = 0x79
TC_BLOCKDATALONG = 0x7A
TC_LONGSTRING = 0x7C

BASE_WIRE_HANDLE = 0x7E0000

SC_WRITE_METHOD = 0x01
SC_SERIALIZABLE = 0x02
SC_EXTERNALIZABLE = 0x04

#: published fixed serialVersionUIDs (public constants: scala-library
#: @SerialVersionUID on TupleN; JDK java.lang classes)
SVUID = {
    "scala.Tuple2": 142951686315914362,
    "scala.Tuple6": -8509888996511846352,
    "java.lang.Integer": 1360826667806852920,
    "java.lang.Number": -8742448824652078965,
    "java.lang.Boolean": -3665804199014368530,
}

_PRIM_FMT = {  # field typecode → struct format (big-endian, JVM order)
    "B": ">b", "C": ">H", "D": ">d", "F": ">f",
    "I": ">i", "J": ">q", "S": ">h", "Z": ">?",
}


class JavaObject:
    """A deserialized plain object: class name + merged field dict."""

    __slots__ = ("class_name", "fields")

    def __init__(self, class_name: str, fields: dict):
        self.class_name = class_name
        self.fields = fields

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"JavaObject({self.class_name}, {self.fields})"


def _unbox(v):
    if isinstance(v, JavaObject) and "value" in v.fields:
        if v.class_name in (
            "java.lang.Integer", "java.lang.Long", "java.lang.Short",
            "java.lang.Byte",
        ):
            return int(v.fields["value"])
        if v.class_name == "java.lang.Boolean":
            return bool(v.fields["value"])
        if v.class_name in ("java.lang.Double", "java.lang.Float"):
            return float(v.fields["value"])
    # a corrupt boxed object missing its 'value' field stays a
    # JavaObject — callers' type checks turn that into a loud error
    return v


#: nesting cap: real image keys nest <= 4 levels (tuple → boxed int →
#: Number); a crafted deep-nest stream must fail loudly, not blow the
#: Python stack
_MAX_DEPTH = 64


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.handles: list = []  # index i ↔ handle BASE_WIRE_HANDLE + i
        self.depth = 0

    # -- primitives --
    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("truncated Java serialization stream")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def _u1(self) -> int:
        return self._take(1)[0]

    def _u2(self) -> int:
        return struct.unpack(">H", self._take(2))[0]

    def _u4(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def _utf(self) -> str:
        return self._take(self._u2()).decode("utf-8")

    def _ref(self):
        """Resolve a TC_REFERENCE handle, failing loudly on dangling or
        negative indices (a corrupt stream must not silently alias an
        unrelated handle via Python negative indexing)."""
        idx = self._u4() - BASE_WIRE_HANDLE
        if not 0 <= idx < len(self.handles):
            raise ValueError(
                f"dangling Java serialization handle {idx + BASE_WIRE_HANDLE:#x}"
            )
        return self.handles[idx]

    # -- grammar --
    def parse(self):
        if self._u2() != STREAM_MAGIC or self._u2() != STREAM_VERSION:
            raise ValueError("not a Java serialization stream")
        return self._content(self._u1())

    def _content(self, tc: int):
        self.depth += 1
        if self.depth > _MAX_DEPTH:
            raise ValueError(
                f"Java serialization stream nests deeper than {_MAX_DEPTH}"
            )
        try:
            return self._content_inner(tc)
        finally:
            self.depth -= 1

    def _content_inner(self, tc: int):
        if tc == TC_NULL:
            return None
        if tc == TC_REFERENCE:
            return self._ref()
        if tc == TC_STRING:
            s = None  # placeholder: handle assigned before body per spec?
            # spec: newString: TC_STRING newHandle utf — handle assigned
            # to the string itself
            s = self._utf()
            self.handles.append(s)
            return s
        if tc == TC_LONGSTRING:
            n = struct.unpack(">Q", self._take(8))[0]
            s = self._take(n).decode("utf-8")
            self.handles.append(s)
            return s
        if tc == TC_OBJECT:
            desc = self._class_desc(self._u1())
            if desc is None:
                raise ValueError("TC_OBJECT with null class descriptor")
            obj = JavaObject(desc["name"], {})
            self.handles.append(obj)
            self._class_data(desc, obj)
            return obj
        if tc == TC_CLASSDESC:
            return self._class_desc(tc)
        raise NotImplementedError(
            f"Java serialization element 0x{tc:02x} is not used by "
            "SequenceFile image keys; unsupported by this reader"
        )

    def _class_desc(self, tc: int):
        # super chains share the nesting budget (a crafted stream of
        # thousands of stacked descriptors must not blow the Python stack)
        self.depth += 1
        if self.depth > _MAX_DEPTH:
            raise ValueError(
                f"Java serialization stream nests deeper than {_MAX_DEPTH}"
            )
        try:
            return self._class_desc_inner(tc)
        finally:
            self.depth -= 1

    def _class_desc_inner(self, tc: int):
        if tc == TC_NULL:
            return None
        if tc == TC_REFERENCE:
            ref = self._ref()
            if not isinstance(ref, dict):
                # a corrupt stream can point a classdesc slot at a string
                # or object handle — fail loudly, don't subscript it
                raise ValueError(
                    "class-descriptor reference resolves to a "
                    f"{type(ref).__name__} handle"
                )
            return ref
        if tc != TC_CLASSDESC:
            raise NotImplementedError(
                f"class descriptor element 0x{tc:02x} unsupported"
            )
        name = self._utf()
        svuid = struct.unpack(">q", self._take(8))[0]
        # the handle must exist BEFORE classDescInfo is parsed (spec),
        # so pre-seed every key a later consumer reads and mark the
        # descriptor incomplete — a crafted annotation can reference it
        # mid-parse, and _class_data must fail loudly on that rather
        # than KeyError on a half-built dict (r15 review 2)
        desc = {
            "name": name, "svuid": svuid, "flags": 0, "fields": [],
            "super": None, "complete": False,
        }
        self.handles.append(desc)
        flags = self._u1()
        desc["flags"] = flags
        nfields = self._u2()
        fields = []
        for _ in range(nfields):
            typecode = chr(self._u1())
            if typecode not in "BCDFIJSZL[":
                raise ValueError(
                    f"invalid Java serialization field typecode "
                    f"{typecode!r} in {name}"
                )
            fname = self._utf()
            if typecode in "L[":
                self._content(self._u1())  # field type-name string
            fields.append((typecode, fname))
        desc["fields"] = fields
        self._skip_annotation()  # classAnnotation
        desc["super"] = self._class_desc(self._u1())
        desc["complete"] = True
        return desc

    def _skip_annotation(self) -> None:
        while True:
            tc = self._u1()
            if tc == TC_ENDBLOCKDATA:
                return
            if tc == TC_BLOCKDATA:
                self._take(self._u1())
            elif tc == TC_BLOCKDATALONG:
                self._take(self._u4())
            else:
                self._content(tc)  # annotation objects: parse & discard

    def _class_data(self, desc, obj: JavaObject) -> None:
        # super-first (the spec's classdata order); a corrupt stream can
        # make a descriptor its own ancestor via a handle reference —
        # detect the cycle instead of walking it forever
        chain = []
        seen: set[int] = set()
        d = desc
        while d is not None:
            if id(d) in seen:
                raise ValueError("cyclic class-descriptor super chain")
            if not d.get("complete", True):
                raise ValueError(
                    f"object instantiates class descriptor {d['name']!r} "
                    "before its definition is complete"
                )
            seen.add(id(d))
            chain.append(d)
            d = d["super"]
        for d in reversed(chain):
            if d["flags"] & SC_EXTERNALIZABLE:
                raise NotImplementedError(
                    f"{d['name']}: Externalizable classes unsupported"
                )
            for typecode, fname in d["fields"]:
                if typecode in "L[":
                    obj.fields[fname] = self._content(self._u1())
                else:
                    fmt = _PRIM_FMT[typecode]
                    obj.fields[fname] = struct.unpack(
                        fmt, self._take(struct.calcsize(fmt))
                    )[0]
            if d["flags"] & SC_WRITE_METHOD:
                # custom writeObject: default fields (read above) are
                # followed by optional block data up to TC_ENDBLOCKDATA
                self._skip_annotation()


def loads(buf: bytes):
    """Deserialize ONE top-level object; boxed primitives are unboxed."""
    return _unbox(_Reader(buf).parse())


def decode_image_key(buf: bytes) -> tuple[str, str, int, int, int, bool]:
    """Key stream → ``(id, label, channels, height, width, encoded)``
    with the exact case semantics of ``SeqImageDataSource.scala:36-66``:
    Pair / Tuple2 carry only (id, label) and imply ``channels=1,
    height=0, width=0, encoded=true``; Tuple6 carries everything."""
    obj = loads(buf)
    if not isinstance(obj, JavaObject):
        raise ValueError(f"unexpected key object {type(obj).__name__}")
    f = obj.fields

    def _s(v):
        # id/label must be REAL strings: str() would happily render None
        # or a nested object into a plausible-looking fabricated value
        # (r15 review 2 — a TC_STRING flipped to TC_NULL decoded as the
        # literal id 'None')
        if not isinstance(v, str):
            raise TypeError(f"expected string field, got {type(v).__name__}")
        return v

    def _i(v):
        u = _unbox(v)
        if not isinstance(u, (int, bool)) or isinstance(u, bool):
            raise TypeError(f"expected boxed int, got {type(u).__name__}")
        return u

    def _b(v):
        u = _unbox(v)
        if not isinstance(u, bool):
            raise TypeError(f"expected boxed boolean, got {type(u).__name__}")
        return u

    try:
        if obj.class_name == "com.yahoo.ml.dl.caffe.Pair":
            return _s(f["first"]), _s(f["second"]), 1, 0, 0, True
        if obj.class_name == "scala.Tuple2":
            return _s(f["_1"]), _s(f["_2"]), 1, 0, 0, True
        if obj.class_name == "scala.Tuple6":
            return (
                _s(f["_1"]), _s(f["_2"]), _i(f["_3"]),
                _i(f["_4"]), _i(f["_5"]), _b(f["_6"]),
            )
    except (KeyError, TypeError) as e:
        # a corrupt stream can decode to the right class with missing or
        # ill-typed fields — surface it as the diagnosable error class,
        # not a bare KeyError/TypeError (r15 mutation-test finding)
        raise ValueError(
            f"malformed {obj.class_name} key: {type(e).__name__}: {e}"
        ) from e
    raise ValueError(
        f"unsupported SequenceFile key class {obj.class_name!r}; expected "
        "com.yahoo.ml.dl.caffe.Pair, scala.Tuple2, or scala.Tuple6"
    )


# --- writer (byte-identical to OpenJDK ObjectOutputStream) ------------------

_OBJECT_TYPE = "Ljava/lang/Object;"


class _Writer:
    def __init__(self):
        self.out = bytearray(struct.pack(">HH", STREAM_MAGIC, STREAM_VERSION))
        self.handles: dict = {}  # key → handle index

    def _utf(self, s: str) -> None:
        b = s.encode("utf-8")
        self.out.extend(struct.pack(">H", len(b)))
        self.out.extend(b)

    def string(self, s: str) -> None:
        # strings are handle-tracked and back-referenced, like the JVM
        key = ("str", s)
        if key in self.handles:
            self.out.append(TC_REFERENCE)
            self.out.extend(
                struct.pack(">I", BASE_WIRE_HANDLE + self.handles[key])
            )
            return
        self.out.append(TC_STRING)
        self._utf(s)
        self.handles[key] = len(self.handles)

    def class_desc(
        self, name: str, fields: list[tuple[str, str]], super_name: str | None
    ) -> None:
        """fields: (typecode, name); object fields get the Object type."""
        key = ("cls", name)
        if key in self.handles:
            self.out.append(TC_REFERENCE)
            self.out.extend(
                struct.pack(">I", BASE_WIRE_HANDLE + self.handles[key])
            )
            return
        self.out.append(TC_CLASSDESC)
        self._utf(name)
        self.out.extend(struct.pack(">q", SVUID.get(name, 0)))
        self.handles[key] = len(self.handles)
        self.out.append(SC_SERIALIZABLE)
        self.out.extend(struct.pack(">H", len(fields)))
        for typecode, fname in fields:
            self.out.append(ord(typecode))
            self._utf(fname)
            if typecode in "L[":
                self.string(_OBJECT_TYPE)
        self.out.append(TC_ENDBLOCKDATA)
        if super_name is None:
            self.out.append(TC_NULL)
        else:
            _CLASS_SHAPES[super_name](self)

    def new_object_handle(self) -> None:
        self.handles[("obj", len(self.handles))] = len(self.handles)

    def boxed_int(self, v: int) -> None:
        self.out.append(TC_OBJECT)
        self.class_desc(
            "java.lang.Integer", [("I", "value")], "java.lang.Number"
        )
        self.new_object_handle()
        self.out.extend(struct.pack(">i", v))

    def boxed_bool(self, v: bool) -> None:
        self.out.append(TC_OBJECT)
        self.class_desc("java.lang.Boolean", [("Z", "value")], None)
        self.new_object_handle()
        self.out.append(1 if v else 0)


_CLASS_SHAPES = {
    "java.lang.Number": lambda w: w.class_desc("java.lang.Number", [], None),
}


def dumps_tuple2(a: str, b: str) -> bytes:
    w = _Writer()
    w.out.append(TC_OBJECT)
    w.class_desc("scala.Tuple2", [("L", "_1"), ("L", "_2")], None)
    w.new_object_handle()
    w.string(a)
    w.string(b)
    return bytes(w.out)


def dumps_tuple6(
    a: str, b: str, c: int, d: int, e: int, f: bool
) -> bytes:
    w = _Writer()
    w.out.append(TC_OBJECT)
    w.class_desc(
        "scala.Tuple6", [("L", f"_{i}") for i in range(1, 7)], None
    )
    w.new_object_handle()
    w.string(a)
    w.string(b)
    for v in (c, d, e):
        w.boxed_int(v)
    w.boxed_bool(f)
    return bytes(w.out)


def dumps_pair(first: str, second: str, svuid: int = 0) -> bytes:
    """Legacy ``com.yahoo.ml.dl.caffe.Pair`` key (``Pair.java:9-16``).
    The Pair class declares no serialVersionUID, so its computed value
    depends on the compiled class; pass ``svuid`` to target a specific
    build — OUR reader dispatches on class name and ignores it."""
    w = _Writer()
    w.out.append(TC_OBJECT)
    w.class_desc(
        "com.yahoo.ml.dl.caffe.Pair",
        [("L", "first"), ("L", "second")],
        None,
    )
    # patch the svuid we just wrote (class_desc used SVUID.get(...)=0)
    if svuid:
        name_len = len(b"com.yahoo.ml.dl.caffe.Pair")
        # magic+version(4), TC_OBJECT(1), TC_CLASSDESC(1), utf len(2), name
        off = 4 + 1 + 1 + 2 + name_len
        struct.pack_into(">q", w.out, off, svuid)
    w.new_object_handle()
    w.string(first)
    w.string(second)
    return bytes(w.out)
