"""Multimodal column model: schema declaration ("tops") + image transforms.

Reference parity (SURVEY.md §1):
* ``ColumnSpec`` is the rebuild of the prototxt ``cos_data_param`` "Top"
  declaration (``DataFrameSource.scala:315-353``): per-column name, dtype,
  tensor dims (channels/height/width), post-transform ``out_*`` dims, and a
  ``transpose`` flag for time-major layouts (consumed by the C++ layer at
  ``cos_data_layer.cpp:12-48``). The ``sample_num_axes == 1`` constraint for
  transposed columns is enforced here, like the reference.
* The nested image struct ``struct<image: binary, height: int, width: int>``
  is ENCODED_IMAGE_WITH_DIM (``DataFrameSource.scala:286-294``,
  ``Conversions.scala:89-92``).
* Transforms reproduce ``FloatDataTransformer`` semantics
  (``FloatDataTransformer.java:15-36``): scale, mean-subtract, crop, mirror —
  plus resize (``Mat.resize``, ``Mat.java:72-76``) as a real NumPy
  nearest-neighbour implementation (no OpenCV in this container).
* Encoded-image decode (``Mat.decode``, ``Mat.java:58-63``) resolves a real
  codec by import-try — Pillow first, OpenCV second (both emitting the
  reference's BGR order for 3-channel) — and falls back to the
  deterministic ``fake_decode`` when neither is installed (this container
  ships neither; the Spark-side plumbing — schema, batching, UDF
  signatures — is real and codec-agnostic either way).

Everything here is NumPy-on-Arrow-batches: these functions run inside
``mapInArrow`` workers, never per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ENCODED_IMAGE_WITH_DIM nested struct (FIXTURES.md §5)
IMAGE_STRUCT_SCHEMA = T.StructType(
    [
        T.StructField("image", T.BinaryType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
    ]
)

# column dtypes: the CoSDataParameter.DataType surface
# (DataFrameSource.scala:188-202, 236-295) mapped to the rebuild
DTYPES = (
    "string",        # parsed to 1-float (DataFrameSource.scala:237-243)
    "int",           # 1-float blob
    "float",         # 1-float blob
    "int_array",     # float blob, optional transpose
    "float_array",   # float blob, optional transpose
    "raw_image",     # bytes, dims from spec
    "encoded_image",          # codec-decoded bytes (stubbed decode)
    "encoded_image_with_dim", # nested struct {image, height, width}
)


@dataclass(frozen=True)
class ColumnSpec:
    """Declared schema for one batch column (the reference "Top")."""

    name: str
    dtype: str
    channels: int = 1
    height: int = 0
    width: int = 0
    out_channels: int | None = None
    out_height: int | None = None
    out_width: int | None = None
    transpose: bool = False
    # transform_param subset (FloatDataTransformer.java:15-36)
    scale: float = 1.0
    mean_value: tuple[float, ...] = field(default=())
    crop: tuple[int, int] | None = None  # (h, w) center crop
    mirror: bool = False
    #: fixture/test escape hatch ONLY: when True, a payload that carries a
    #: real container magic (P6/P5/BM, JPEG SOI \xff\xd8, or PNG \x89P)
    #: but fails to decode falls back to ``fake_decode`` instead of
    #: raising. Default False so a truncated or corrupt image in a
    #: production batch fails loudly rather than yielding deterministic
    #: garbage pixels — a BEHAVIOR CHANGE in r6 for pipelines that
    #: synthesized magic-prefixed fixture bytes (see README changelog);
    #: such pipelines opt back in with fake_fallback=True.
    fake_fallback: bool = False

    def __post_init__(self):
        if self.dtype not in DTYPES:
            raise ValueError(f"unknown dtype {self.dtype!r}; known: {DTYPES}")
        if self.transpose and self.dtype not in ("int_array", "float_array"):
            # sample_num_axes == 1 constraint (DataFrameSource.scala:186-187)
            raise ValueError("transpose only valid for array columns")

    @property
    def sample_shape(self) -> tuple[int, ...]:
        if self.dtype in ("string", "int", "float"):
            return (1,)
        if self.dtype in ("int_array", "float_array"):
            return (max(self.channels, 1) * max(self.height, 1) * max(self.width, 1),)
        c = self.out_channels or self.channels
        h = self.out_height or self.height
        w = self.out_width or self.width
        if self.crop:
            h, w = self.crop
        return (c, h, w)


def image_struct_col(image: Column, height: Column, width: Column) -> Column:
    """Pack binary + dims into the ENCODED_IMAGE_WITH_DIM struct column."""
    return F.struct(
        image.alias("image"), height.cast("int").alias("height"), width.cast("int").alias("width")
    )


# --- NumPy transforms (run inside Arrow batch workers) --------------------

def _bmp_rle8_indices(data: bytes, off: int, w: int, h: int) -> np.ndarray:
    """Decode a BI_RLE8 pixel stream into an (h, w) palette-index plane in
    STORAGE row order (caller flips bottom-up). Escape codes per the
    public BMP spec: (0,0) end-of-line, (0,1) end-of-bitmap, (0,2) delta
    skip, (0,n>2) absolute run padded to a word; pixels never written
    (deltas, early EOF) stay index 0 — the conventional zero fill. Runs
    that would overrun the row or the grid are malformed (ValueError)."""
    n = len(data)
    # decode-bomb cap: an encoded pair expands to at most 255 pixels, so a
    # stream physically cannot express more than 255*(bytes/2) pixels — a
    # header declaring more forces a huge zero-filled allocation carrying
    # no information; refuse it like the 2^30-pixel JPEG/PNG caps
    if w * h > max(0, n - off) * 128:
        raise ValueError("malformed BMP: RLE8 dimensions exceed stream expansion")
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    i = off
    while True:
        if i + 2 > n:
            raise ValueError("malformed BMP: RLE8 stream ends without EOF")
        a, b = data[i], data[i + 1]
        i += 2
        if a > 0:  # encoded run: a copies of index b
            if y >= h or x + a > w:
                raise ValueError("malformed BMP: RLE8 run overruns row")
            out[y, x : x + a] = b
            x += a
        elif b == 0:  # end of line
            y += 1
            x = 0
        elif b == 1:  # end of bitmap
            return out
        elif b == 2:  # delta: skip right/up in storage order
            if i + 2 > n:
                raise ValueError("malformed BMP: truncated RLE8 delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("malformed BMP: RLE8 delta leaves bitmap")
        else:  # absolute run: b literal indices, padded to a word
            if y >= h or x + b > w or i + b > n:
                raise ValueError("malformed BMP: RLE8 absolute run overruns")
            out[y, x : x + b] = np.frombuffer(data, np.uint8, b, i)
            x += b
            i += b + (b & 1)


def _numpy_decode(data: bytes, channels: int) -> np.ndarray:
    """Pure-NumPy decoder for codec-free image containers: PPM (P6), PGM
    (P5), uncompressed 8-bit-palette/24/32-bit BI_RGB BMP, Huffman JPEG
    (baseline through progressive via the from-spec decoder in
    ``multimodal/jpeg.py``), PNG (``multimodal/png.py``; zlib is
    stdlib), and baseline strip TIFF (``multimodal/tiff.py``:
    none/PackBits/LZW, both byte orders). No external codec
    library needed, so REAL bytes — including the reference's own
    ``data/images/*.jpg`` fixture class (``ImageDataSource.scala:126-143``)
    — decode end-to-end even in environments without Pillow/OpenCV (this
    container). Output matches the ``Mat.decode`` contract
    (``Mat.java:58-63``): HWC uint8, BGR for 3-channel, integer BT.601
    luma for grayscale conversion.
    """
    if data[:2] == b"\xff\xd8":
        from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg

        arr = decode_baseline_jpeg(data)
        if arr.shape[2] == 3:
            arr = arr[:, :, ::-1]  # RGB -> BGR (Mat.decode parity)
    elif data[:8] == b"\x89PNG\r\n\x1a\n":
        from caffeonspark_spark.multimodal.png import decode_png

        arr = decode_png(data)
        if arr.shape[2] == 2:  # gray+alpha: keep luma (IMREAD_GRAYSCALE)
            arr = arr[:, :, :1]
        if arr.shape[2] == 4:
            if channels == 4:
                arr = arr[:, :, [2, 1, 0, 3]]  # RGBA -> BGRA (IMREAD_UNCHANGED)
            else:
                arr = arr[:, :, :3]  # drop alpha (IMREAD_COLOR)
        if arr.shape[2] == 3:
            arr = arr[:, :, ::-1]  # RGB -> BGR (Mat.decode parity)
    elif data[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        from caffeonspark_spark.multimodal.tiff import decode_tiff

        arr = decode_tiff(data)
        if arr.shape[2] == 3:
            arr = arr[:, :, ::-1]  # RGB -> BGR (Mat.decode parity)
    elif data[:1] == b"P" and data[1:2] in b"123456":
        # netpbm, ALL six classic variants (OpenCV's pnm reader accepts
        # plain/ASCII P1/P2/P3 alongside raw P4/P5/P6): magic, then
        # whitespace/comment-separated width/height (+maxval except
        # bitmaps), then the raster
        kind = data[1:2]
        n_fields = 2 if kind in (b"1", b"4") else 3
        fields, i, n = [], 2, len(data)
        while len(fields) < n_fields:
            while i < n and data[i : i + 1].isspace():
                i += 1
            if data[i : i + 1] == b"#":
                while i < n and data[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < n and not data[j : j + 1].isspace():
                j += 1
            if i == j:
                raise ValueError("malformed netpbm: truncated header")
            fields.append(int(data[i:j]))
            i = j
        w, h = fields[0], fields[1]
        maxval = fields[2] if n_fields == 3 else 1
        if n_fields == 3 and maxval != 255:
            raise ValueError("numpy-native codec supports 8-bit netpbm only")
        if w <= 0 or h <= 0 or w * h > (1 << 30):
            raise ValueError("degenerate netpbm dimensions")
        if kind in (b"1", b"2", b"3"):
            # plain/ASCII raster: strip comments, then parse tokens
            raster = b"\n".join(
                line.split(b"#", 1)[0] for line in data[i:].split(b"\n")
            )
            c_in = 3 if kind == b"3" else 1
            need = h * w * c_in
            if kind == b"1":
                digits = b"".join(raster.split())
                if len(digits) < need:
                    raise ValueError("malformed netpbm: plain raster too short")
                vals = np.frombuffer(digits, np.uint8, need) - ord("0")
                if ((vals != 0) & (vals != 1)).any():
                    raise ValueError("malformed netpbm: non-bit in plain bitmap")
                arr = ((1 - vals) * 255).astype(np.uint8)  # 1 = black
            else:
                toks = raster.split()
                if len(toks) < need:
                    raise ValueError("malformed netpbm: plain raster too short")
                try:
                    # OverflowError guard: a 19+-digit token overflows the
                    # int64 conversion, which must surface as the contract's
                    # ValueError, not escape (same class as the header guard)
                    vals = np.array([int(t) for t in toks[:need]], dtype=np.int64)
                except (ValueError, OverflowError) as e:
                    raise ValueError(f"malformed netpbm: {e}") from None
                if ((vals < 0) | (vals > maxval)).any():
                    raise ValueError("malformed netpbm: sample exceeds maxval")
                arr = vals.astype(np.uint8)
            arr = arr.reshape(h, w, c_in)
        elif kind == b"4":
            i += 1  # single whitespace after height
            row_bytes = (w + 7) // 8
            if i + h * row_bytes > len(data):
                raise ValueError("malformed netpbm: pixel data overruns buffer")
            packed = np.frombuffer(data, np.uint8, h * row_bytes, i).reshape(
                h, row_bytes
            )
            bits = np.unpackbits(packed, axis=1)[:, :w]
            arr = ((1 - bits) * 255).astype(np.uint8).reshape(h, w, 1)  # 1=black
        else:
            i += 1  # single whitespace after maxval
            c_in = 3 if kind == b"6" else 1
            # bounds-check BEFORE frombuffer: an absurd text dimension would
            # otherwise overflow numpy's C ssize_t count (OverflowError,
            # breaking the decode-or-ValueError totality contract)
            if i + h * w * c_in > len(data):
                raise ValueError("malformed netpbm: pixel data overruns buffer")
            arr = np.frombuffer(data, dtype=np.uint8, count=h * w * c_in, offset=i)
            arr = arr.reshape(h, w, c_in)
        if arr.shape[2] == 3:
            arr = arr[:, :, ::-1]  # RGB -> BGR (Mat.decode parity)
    elif data[:2] == b"BM":
        # BITMAPINFOHEADER, uncompressed (BI_RGB), rows padded to 4 bytes:
        # 24-bit BGR, 32-bit BGRA (alpha dropped, OpenCV behavior), or
        # 8-bit palette (BGRA quad entries after the header)
        off = int.from_bytes(data[10:14], "little")
        hdr_size = int.from_bytes(data[14:18], "little")
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        comp = int.from_bytes(data[30:34], "little")
        if (comp, bpp) not in ((0, 8), (0, 24), (0, 32), (1, 8)):
            raise ValueError(
                "numpy-native codec supports uncompressed 8/24/32-bit and "
                "RLE8 BI_RGB BMP only"
            )
        if w <= 0 or h == 0 or w * abs(h) > 1 << 30:
            raise ValueError("degenerate BMP dimensions")
        if bpp == 8:
            n_colors = int.from_bytes(data[46:50], "little") or 256
            if n_colors > 256 or 14 + hdr_size + n_colors * 4 > len(data):
                raise ValueError("malformed BMP: palette overruns buffer")
            pal = np.zeros((256, 3), np.uint8)  # any index stays in range
            pal[:n_colors] = np.frombuffer(
                data, np.uint8, n_colors * 4, 14 + hdr_size
            ).reshape(-1, 4)[:, :3]
        if comp == 1:  # BI_RLE8: encoded runs / absolute blocks / EOL / delta
            idx = _bmp_rle8_indices(data, off, w, abs(h))
            arr = pal[idx]
        else:
            stride = (w * (bpp // 8) + 3) & ~3
            # bounds-check BEFORE frombuffer: mutated 4-byte dims otherwise
            # overflow numpy's C ssize_t count (OverflowError, breaking the
            # decode-or-ValueError totality contract)
            if off < 54 or off + abs(h) * stride > len(data):
                raise ValueError("malformed BMP: pixel data overruns buffer")
            rows = np.frombuffer(
                data, dtype=np.uint8, count=abs(h) * stride, offset=off
            ).reshape(abs(h), stride)
            if bpp == 8:
                arr = pal[rows[:, :w]]  # palette entries are already BGR
            else:
                c_in = bpp // 8
                arr = rows[:, : w * c_in].reshape(abs(h), w, c_in)[:, :, :3]
        if h > 0:
            arr = arr[::-1]  # bottom-up storage -> top-down; already BGR
    else:
        raise ValueError(
            "numpy-native codec handles PPM/PGM/BMP/JPEG/PNG only; "
            "install Pillow or opencv-python for other containers"
        )
    if channels == 1 and arr.shape[2] == 3:
        b, g, r = (arr[:, :, k].astype(np.uint32) for k in range(3))
        arr = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)[:, :, None]
    elif channels == 3 and arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    return np.ascontiguousarray(arr)


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an HWC uint8 array as PPM P6 (3-channel, input BGR per the
    engine's pixel contract) / PGM P5 (1-channel) — the test/fixture twin
    of ``_numpy_decode``."""
    h, w, c = img.shape
    if c == 3:
        return b"P6\n%d %d\n255\n" % (w, h) + img[:, :, ::-1].tobytes()
    if c == 1:
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    raise ValueError("encode_ppm expects 1 or 3 channels")


def _resolve_codec():
    """Import-try codec resolution: Pillow, then OpenCV, else the
    pure-NumPy header-only codec (PPM/PGM/BMP — real decode with no
    external library; ``fake_decode`` remains only as the batch-assembly
    fallback for synthetic payloads). Returns (decode_fn, codec_name).

    Both paths reproduce ``Mat.decode`` semantics (``Mat.java:58-63``:
    OpenCV imdecode with grayscale/color/unchanged flags by channel count)
    including OpenCV's BGR channel order for 3-channel output, so pixel
    tensors are codec-independent.
    """
    try:
        import io

        from PIL import Image

        def _pil_decode(data: bytes, channels: int) -> np.ndarray:
            img = Image.open(io.BytesIO(data))
            img = img.convert({1: "L", 3: "RGB", 4: "RGBA"}.get(channels, "RGB"))
            arr = np.asarray(img, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            if channels == 3:
                arr = arr[:, :, ::-1]  # RGB -> BGR (Mat.decode/OpenCV parity)
            elif channels == 4:
                # RGBA -> BGRA: the OpenCV tier (IMREAD_UNCHANGED) and the
                # numpy PNG tier both emit BGRA; without this swap the same
                # 4-channel pipeline sees red/blue transposed under Pillow
                arr = arr[:, :, [2, 1, 0, 3]]
            return np.ascontiguousarray(arr)

        return _pil_decode, "pillow"
    except ImportError:
        pass
    try:
        import cv2

        def _cv2_decode(data: bytes, channels: int) -> np.ndarray:
            flags = (
                cv2.IMREAD_GRAYSCALE
                if channels == 1
                else cv2.IMREAD_UNCHANGED if channels == 4 else cv2.IMREAD_COLOR
            )
            arr = cv2.imdecode(np.frombuffer(data, dtype=np.uint8), flags)
            if arr is None:
                raise ValueError("imdecode failed: not a decodable image payload")
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return np.ascontiguousarray(arr)  # already BGR

        return _cv2_decode, "opencv"
    except ImportError:
        return _numpy_decode, "numpy-native"


_CODEC_FN, CODEC_NAME = _resolve_codec()


def decode_image(data: bytes, channels: int) -> np.ndarray:
    """Decode encoded image bytes → HWC uint8 array (BGR for 3-channel,
    matching the reference's OpenCV ``Mat.decode``, ``Mat.java:58-63``).

    Uses Pillow or OpenCV when importable (``CODEC_NAME`` says which);
    otherwise the pure-NumPy codec handles PPM/PGM/BMP headers plus
    from-spec JPEG (baseline, multi-scan, partially-interleaved, and
    progressive Huffman — ``jpeg.py``), full PNG (``png.py``), and
    baseline strip TIFF (``tiff.py``: none/PackBits/LZW, gray/RGB/
    palette/bilevel, both byte orders), so the
    real decode paths run end-to-end even in this container; only the
    remaining classes (arithmetic/12-bit/lossless JPEG) raise with an
    install hint. Callers (batch assembly) stay codec-agnostic either way.
    """
    return _CODEC_FN(data, channels)


def fake_decode(data: bytes, channels: int, height: int = 8, width: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → pseudo-pixels by tiling the
    byte stream into (height, width, channels) uint8. Pure function of the
    input bytes, so tests are reproducible."""
    buf = np.frombuffer(data, dtype=np.uint8)
    need = height * width * channels
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    tiled = np.resize(buf, need)
    return tiled.reshape(height, width, channels)


def raw_to_hwc(data: bytes, channels: int, height: int, width: int) -> np.ndarray:
    """Raw HWC-interleaved bytes → (H, W, C) uint8 (the LMDB tuple layout
    after the reference's CHW→HWC reorder, ``LmdbRDD.scala:270-281``)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    return arr.reshape(height, width, channels)


def chw_to_hwc(arr: np.ndarray) -> np.ndarray:
    """Pixel layout reorder CHW planar → HWC interleaved (F5)."""
    return np.ascontiguousarray(np.transpose(arr, (1, 2, 0)))


def hwc_to_chw(arr: np.ndarray) -> np.ndarray:
    """HWC → CHW, the tensor layout batches are assembled in (NCHW)."""
    return np.ascontiguousarray(np.transpose(arr, (2, 0, 1)))


def resize_nn(img_hwc: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize in pure NumPy (``Mat.resize`` analogue)."""
    h, w = img_hwc.shape[:2]
    rows = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    cols = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return img_hwc[rows[:, None], cols[None, :]]


def center_crop(img_hwc: np.ndarray, crop_h: int, crop_w: int) -> np.ndarray:
    """Center crop (deterministic flavor of the transform_param crop)."""
    h, w = img_hwc.shape[:2]
    top = max((h - crop_h) // 2, 0)
    left = max((w - crop_w) // 2, 0)
    return img_hwc[top : top + crop_h, left : left + crop_w]


def transform_chw(
    arr_chw: np.ndarray, spec: ColumnSpec
) -> np.ndarray:
    """scale / mean-subtract on a CHW float tensor (FloatDataTransformer)."""
    out = arr_chw.astype(np.float32)
    if spec.mean_value:
        mean = np.asarray(spec.mean_value, dtype=np.float32).reshape(-1, 1, 1)
        out = out - mean
    if spec.scale != 1.0:
        out = out * np.float32(spec.scale)
    if spec.mirror:
        out = out[:, :, ::-1]
    return out


def image_sample_to_tensor(
    data: bytes,
    spec: ColumnSpec,
    encoded: bool = False,
    height: int | None = None,
    width: int | None = None,
    decoder=None,
) -> np.ndarray:
    """One image payload → transformed CHW float32 tensor per its spec.

    Mirrors the reference per-sample path: decode (or raw reshape) → resize
    → crop → CHW → scale/mean/mirror (``ImageDataSource.scala:126-163``,
    ``DataFrameSource.scala:135-176``).

    ``decoder=None`` uses the real codec when one can handle the payload:
    always under Pillow/OpenCV, and for PPM/PGM/BMP/JPEG/PNG magic under the
    pure-NumPy codec (set ``out_height``/``out_width`` on the spec then,
    since real images vary in size and batches must stack). Arbitrary
    synthetic bytes fall back to the deterministic ``fake_decode`` so
    fixture pipelines stay reproducible; pass a callable to override.
    """
    h = height or spec.height
    w = width or spec.width
    if encoded:
        real_magic = bytes(data[:2]) in (
            b"P1", b"P2", b"P3", b"P4", b"P5", b"P6",
            b"BM", b"\xff\xd8", b"\x89P", b"II", b"MM",
        )
        if decoder is not None:
            hwc = decoder(data, spec.channels)
        elif CODEC_NAME in ("pillow", "opencv") or real_magic:
            # A payload claiming a real container must decode — a
            # truncated/corrupt image in a production batch fails loudly
            # (ValueError, whatever the codec tier raised) instead of
            # silently yielding garbage pixels; fixture pipelines that
            # synthesize magic-prefixed bytes opt in to the deterministic
            # fake via spec.fake_fallback. Under Pillow/OpenCV the same
            # rules apply to container types beyond the magic list, and
            # arbitrary NON-container synthetic bytes fall back to
            # fake_decode exactly like the numpy tier — one behavior in
            # every environment, not a crash where a codec is installed.
            try:
                hwc = decode_image(data, spec.channels)
            except Exception as e:  # PIL raises OSError, cv2 ValueError
                if real_magic and not spec.fake_fallback:
                    raise ValueError(f"corrupt image payload: {e}") from e
                hwc = fake_decode(data, spec.channels, h or 8, w or 8)
        else:
            hwc = fake_decode(data, spec.channels, h or 8, w or 8)
    else:
        hwc = raw_to_hwc(data, spec.channels, h, w)
    if spec.out_height and spec.out_width:
        hwc = resize_nn(hwc, spec.out_height, spec.out_width)
    if spec.crop:
        hwc = center_crop(hwc, *spec.crop)
    return transform_chw(hwc_to_chw(hwc), spec)


def _sample_hash(sample_id: str, seed: int) -> int:
    """Deterministic 64-bit hash of (sample_id, seed) — splitmix64 over the
    id bytes. Pure function: the same sample under the same epoch seed gets
    the same augmentation on any executor, any retry, any cluster size."""
    h = (seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    for b in str(sample_id).encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return h ^ (h >> 31)


def augment_hwc(
    img_hwc: np.ndarray,
    sample_id: str,
    seed: int,
    crop_h: int,
    crop_w: int,
    mirror_prob: float = 0.5,
) -> np.ndarray:
    """Seeded per-sample training augmentation: random-position crop +
    random horizontal mirror, with all "randomness" derived from
    hash(sample_id, seed).

    The reference's random crop/mirror (``transform_param`` consumed by
    ``FloatDataTransformer.java:15-36``) draws from the solver's RNG —
    non-reproducible under task retry. Here a retried/speculative task
    recomputes the identical augmentation, so training batches stay
    deterministic end-to-end; a new epoch changes ``seed`` to re-roll every
    sample."""
    h = _sample_hash(sample_id, seed)
    height, width = img_hwc.shape[:2]
    max_top = max(height - crop_h, 0)
    max_left = max(width - crop_w, 0)
    top = (h & 0xFFFF) % (max_top + 1)
    left = ((h >> 16) & 0xFFFF) % (max_left + 1)
    out = img_hwc[top : top + crop_h, left : left + crop_w]
    if ((h >> 32) & 0xFFFF) / 65536.0 < mirror_prob:
        out = out[:, ::-1]
    return out
