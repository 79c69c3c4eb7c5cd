"""Batch assembly + image transform tests (reference semantics F5-F9).

Mirrors the reference's operator-level test tier (``SourceTest.scala:58-120``:
source init → RDD → batch → transform) on synthetic image tuples.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from caffeonspark_spark.multimodal.batch import assemble_batches, batches_to_numpy
from caffeonspark_spark.multimodal.columns import (
    ColumnSpec,
    center_crop,
    chw_to_hwc,
    fake_decode,
    hwc_to_chw,
    image_sample_to_tensor,
    image_struct_col,
    resize_nn,
)


def _image_rows(n=10, h=4, w=4, c=1):
    rows = []
    for i in range(n):
        data = bytes(((np.arange(h * w * c) + i) % 256).astype(np.uint8))
        rows.append((f"{i:08d}", str(i % 3), c, h, w, False, bytearray(data)))
    return rows


@pytest.fixture(scope="module")
def image_df(spark):
    return spark.createDataFrame(
        _image_rows(),
        "id string, label string, channels int, height int, width int, encoded boolean, data binary",
    ).coalesce(1)


def test_batch_shapes_and_ids(spark, image_df):
    specs = [
        ColumnSpec("data", "raw_image", channels=1, height=4, width=4),
        ColumnSpec("label", "string"),
    ]
    out = assemble_batches(image_df, specs, batch_size=4).collect()
    assert len(out) == 3  # 10 rows -> 4,4,2
    assert out[0]["data_shape"] == [4, 1, 4, 4]
    assert out[2]["data_shape"] == [2, 1, 4, 4]
    assert out[0]["label_shape"] == [4, 1]
    # order contract: first SampleID of first batch (PythonApiTest.py:43)
    assert out[0]["sample_ids"][0] == "00000000"
    # label STRING -> float parse (DataFrameSource.scala:237-243)
    assert out[0]["label"] == [0.0, 1.0, 2.0, 0.0]


def test_batch_pixel_values_roundtrip(spark, image_df):
    specs = [ColumnSpec("data", "raw_image", channels=1, height=4, width=4)]
    ids, tensors = next(batches_to_numpy(assemble_batches(image_df, specs, 4), specs))
    expect = np.arange(16).reshape(1, 4, 4).astype(np.float32)  # row 0, CHW
    np.testing.assert_array_equal(tensors["data"][0], expect)


def test_transform_scale_mean(spark, image_df):
    spec = ColumnSpec(
        "data", "raw_image", channels=1, height=4, width=4, scale=1 / 255.0, mean_value=(1.0,)
    )
    out = assemble_batches(image_df, [spec], 4).collect()
    flat = np.asarray(out[0]["data"])
    expect = ((np.arange(16, dtype=np.float32) - 1.0) * np.float32(1 / 255.0))
    np.testing.assert_allclose(flat[:16], expect, rtol=1e-6)


def test_transpose_time_major(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", [4, 5, 6])], "id string, seq array<int>"
    ).coalesce(1)
    spec = ColumnSpec("seq", "int_array", channels=3, transpose=True)
    out = assemble_batches(df, [spec], 2).collect()
    # (batch=2, T=3) transposed -> (T=3, batch=2) row-major: 1,4,2,5,3,6
    assert out[0]["seq_shape"] == [3, 2]
    assert out[0]["seq"] == [1.0, 4.0, 2.0, 5.0, 3.0, 6.0]


def test_transpose_rejected_for_images():
    with pytest.raises(ValueError):
        ColumnSpec("data", "raw_image", transpose=True)


def test_missing_declared_column(spark, image_df):
    with pytest.raises(ValueError, match="missing"):
        assemble_batches(image_df, [ColumnSpec("nope", "float")], 4)


def test_encoded_image_with_dim_struct(spark):
    df = (
        spark.createDataFrame(
            [("x", bytearray(b"\x01\x02\x03\x04"), 4, 4)],
            "id string, img binary, h int, w int",
        )
        .select(
            "id",
            image_struct_col(F.col("img"), F.col("h"), F.col("w")).alias("data"),
        )
        .coalesce(1)
    )
    spec = ColumnSpec("data", "encoded_image_with_dim", channels=1, height=4, width=4)
    out = assemble_batches(df, [spec], 1).collect()
    assert out[0]["data_shape"] == [1, 1, 4, 4]
    # fake_decode tiles the 4 bytes across 16 pixels
    assert out[0]["data"][:4] == [1.0, 2.0, 3.0, 4.0]


def test_numpy_transforms():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    assert resize_nn(img, 4, 4).shape == (4, 4, 1)
    assert center_crop(img, 4, 4).shape == (4, 4, 1)
    assert center_crop(img, 4, 4)[0, 0, 0] == img[2, 2, 0]
    chw = hwc_to_chw(img)
    assert chw.shape == (1, 8, 8)
    np.testing.assert_array_equal(chw_to_hwc(chw), img)
    t = image_sample_to_tensor(bytes(img.tobytes()), ColumnSpec(
        "d", "raw_image", channels=1, height=8, width=8, out_height=4, out_width=4
    ), encoded=False)
    assert t.shape == (1, 4, 4)


def test_fake_decode_deterministic():
    a = fake_decode(b"abc", 3, 8, 8)
    b = fake_decode(b"abc", 3, 8, 8)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, 8, 3)


_REF_JPEG = "/root/reference/data/images/cat1.jpg"


def test_decode_image_codec_seam():
    """A real JPEG decodes to HWC uint8 under EVERY tier now — Pillow/
    OpenCV when installed, the from-spec baseline decoder otherwise
    (Mat.decode parity: the reference's own fixture class must work)."""
    import os

    from caffeonspark_spark.multimodal.columns import decode_image

    with open(_REF_JPEG, "rb") as fh:
        arr = decode_image(fh.read(), 3)
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    assert arr.shape[0] > 10 and arr.shape[1] > 10
    assert os.path.exists(_REF_JPEG)


def test_truncated_jpeg_raises_value_error():
    """Truncated JPEG payloads raise ValueError (not IndexError) so batch
    error handling sees a consistent decode-failure type."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg

    with open(_REF_JPEG, "rb") as fh:
        data = fh.read()
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\xff\xd8\xff")
    with pytest.raises(ValueError):
        decode_baseline_jpeg(data[: len(data) // 3])


def test_jpeg_roundtrip_baseline_decoder():
    """Spec-valid fixture encoder → from-spec decoder round-trip: 4:4:4,
    4:2:0 subsampled, and grayscale, each within quantization-error
    tolerance of the source pixels."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:24, 0:20]
    base = np.stack(
        [(xx * 5 + yy * 2) % 256, (255 - xx * 3) % 256, (yy * 7) % 256], axis=2
    ).astype(np.float64)
    img = np.clip(base + rng.normal(0, 3, base.shape), 0, 255).astype(np.uint8)

    for sub, tol_mean, tol_max in ((False, 3.0, 16), (True, 5.0, 32)):
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4, subsample=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < tol_mean and err.max() < tol_max, (sub, err.mean(), err.max())

    gray = img[:, :, :1]
    dec = decode_baseline_jpeg(encode_baseline_jpeg(gray, quant=4))
    err = np.abs(dec.astype(int) - gray.astype(int))
    assert dec.shape == gray.shape and err.mean() < 2.0


def test_jpeg_nondivisible_sampling_factors():
    """T.81-legal sampling ratios that don't divide evenly (Y 3x3, chroma
    2x2 → 3:2) must decode via index-map upsampling, not under-upsample
    and die in np.stack (the r6 ADVICE finding)."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg

    rng = np.random.default_rng(7)
    # near-grayscale content: chroma is ~flat so nearest-resampled chroma
    # carries no information loss and the decode error is quant-bounded
    g = rng.integers(40, 216, (26, 22, 1), dtype=np.uint8)
    img = np.repeat(g, 3, axis=2)
    enc = encode_baseline_jpeg(img, quant=4, samp=[(3, 3), (2, 2), (2, 2)])
    dec = decode_baseline_jpeg(enc)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 6.0 and err.max() < 48, (err.mean(), err.max())


def test_jpeg_multiscan_baseline_decodes_identically():
    """A spec-valid MULTI-SCAN baseline stream (one non-interleaved scan
    per component, T.81 A.2.2) decodes BIT-IDENTICALLY to the interleaved
    single-scan encoding of the same image — including subsampled and
    non-divisible sampling layouts (r9: the last spec-legal baseline class
    the numpy tier used to reject with an install hint)."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg

    rng = np.random.default_rng(11)
    for shape, kw in [
        ((16, 16, 3), {}),
        ((23, 17, 3), {"subsample": True}),  # 4:2:0, non-multiple-of-16 dims
        ((20, 28, 3), {"samp": [(3, 2), (1, 1), (1, 1)]}),  # non-divisible
        # opposed asymmetric axes: luma 3x horizontal, Cb 3x vertical —
        # exercises the index-map upsampler on both axes at once
        ((33, 31, 3), {"samp": [(3, 1), (1, 3), (1, 1)]}),
    ]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        single = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4, **kw))
        multi = decode_baseline_jpeg(
            encode_baseline_jpeg(img, quant=4, multiscan=True, **kw)
        )
        np.testing.assert_array_equal(single, multi)


def test_jpeg_partial_interleave_decodes_identically():
    """A spec-valid PARTIALLY-interleaved baseline stream (T.81 A.2.3: a
    strict subset of the frame's components interleaved in one scan, the
    rest in later scans) decodes BIT-IDENTICALLY to the fully-interleaved
    single-scan encoding of the same image — including subsampled layouts
    where the partial MCU carries 4 Y blocks + 1 chroma block (r9: the
    last spec-legal baseline class the numpy tier used to reject)."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg

    rng = np.random.default_rng(13)
    for shape, kw, groups in [
        ((16, 16, 3), {}, [(0, 1), (2,)]),
        ((23, 17, 3), {"subsample": True}, [(0, 1), (2,)]),
        ((20, 12, 3), {"subsample": True}, [(1, 2), (0,)]),
    ]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        single = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4, **kw))
        partial = decode_baseline_jpeg(
            encode_baseline_jpeg(img, quant=4, scan_groups=groups, **kw)
        )
        np.testing.assert_array_equal(single, partial)


def test_jpeg_inconsistent_partial_scan_header_is_value_error():
    """A 3-component MCU stream whose SOS header LIES (claims 2
    components) is malformed — the mismatched entropy layout must surface
    as ValueError (bad Huffman code / run overflow / undecoded component),
    never a silent mis-decode into valid-looking pixels or a KeyError."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg

    img = np.full((16, 16, 3), 90, np.uint8)
    data = bytearray(encode_baseline_jpeg(img, quant=4))
    i = bytes(data).find(b"\xff\xda")
    assert i > 0
    seglen = int.from_bytes(data[i + 2 : i + 4], "big")
    # rewrite the 3-component SOS header as a 2-component scan
    two_comp = b"\x00\x0a\x02\x01\x00\x02\x00\x00\x3f\x00"
    patched = bytes(data[: i + 2]) + two_comp + bytes(data[i + 2 + seglen :])
    with pytest.raises(ValueError):
        decode_baseline_jpeg(patched)


def test_jpeg_progressive_decodes_identically():
    """A progressive (SOF2) stream carries the exact same quantized
    coefficients as the baseline encoding of the same image, delivered
    via spectral selection + successive approximation — so the decoded
    pixels must be BIT-IDENTICAL to the baseline decode, across 4:4:4,
    4:2:0, non-divisible sampling, and grayscale (r9: closes OpenCV
    ``imdecode`` parity for every Huffman JPEG class)."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg, encode_progressive_jpeg

    rng = np.random.default_rng(17)
    for shape, kw in [
        ((16, 16, 3), {}),
        ((23, 17, 3), {"subsample": True}),  # 4:2:0, non-multiple-of-16 dims
        ((20, 28, 3), {"samp": [(3, 2), (1, 1), (1, 1)]}),  # non-divisible
        ((21, 19, 1), {}),  # grayscale script
        # opposed asymmetric axes (multiscan twin covers the same layout)
        ((33, 31, 3), {"samp": [(3, 1), (1, 3), (1, 1)]}),
    ]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4, **kw))
        prog = decode_baseline_jpeg(encode_progressive_jpeg(img, quant=4, **kw))
        np.testing.assert_array_equal(base, prog)


def test_jpeg_progressive_custom_script_eobruns_and_truncation():
    """Progressive edge paths: a custom scan script with a 3-way spectral
    split and a 3-deep successive-approximation chain (Al=2 → 0) over
    content mixing flat regions (multi-block EOB runs with nbits > 0) and
    sparse noise (ZRL + correction bits inside refinement scans) still
    decodes bit-identically to baseline; a stream truncated mid-scan
    raises ValueError rather than returning partial pixels."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg, encode_progressive_jpeg

    rng = np.random.default_rng(23)
    # top half flat (EOB-run blocks), bottom half speckle (long zero runs
    # broken by isolated high-frequency coefficients)
    img = np.full((32, 48, 3), 128, np.uint8)
    speckle = rng.integers(0, 256, size=(16, 48, 3), dtype=np.uint8)
    mask = rng.random((16, 48, 1)) < 0.08
    img[16:] = np.where(mask, speckle, img[16:])

    scans = [
        ((0, 1, 2), 0, 0, 0, 2),
        ((0, 1, 2), 0, 0, 2, 1),
        ((0,), 1, 10, 0, 2),
        ((0,), 11, 40, 0, 2),
        ((0,), 41, 63, 0, 2),
        ((1,), 1, 63, 0, 2),
        ((2,), 1, 63, 0, 2),
        ((0,), 1, 63, 2, 1),
        ((1,), 1, 63, 2, 1),
        ((2,), 1, 63, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((0,), 1, 63, 1, 0),
        ((1,), 1, 63, 1, 0),
        ((2,), 1, 63, 1, 0),
    ]
    base = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4))
    enc = encode_progressive_jpeg(img, quant=4, scans=scans)
    np.testing.assert_array_equal(base, decode_baseline_jpeg(enc))

    # per-component (non-interleaved) DC scans — the other spec-legal DC
    # layout, over a subsampled frame whose pad blocks the per-component
    # grid never visits
    split_dc = (
        [((ci,), 0, 0, 0, 1) for ci in range(3)]
        + [((ci,), 1, 63, 0, 1) for ci in range(3)]
        + [((ci,), 1, 63, 1, 0) for ci in range(3)]
        + [((ci,), 0, 0, 1, 0) for ci in range(3)]
    )
    base420 = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quant=4, subsample=True)
    )
    prog420 = decode_baseline_jpeg(
        encode_progressive_jpeg(img, quant=4, scans=split_dc, subsample=True)
    )
    np.testing.assert_array_equal(base420, prog420)

    with pytest.raises(ValueError):
        decode_baseline_jpeg(enc[: len(enc) // 2])
    # truncation that keeps whole scans but drops later ones: the missing
    # refinement/AC scans mean undecoded data, but every component HAS
    # been scanned — the decoder returns the coarser approximation only
    # when the stream still carries its EOI; without EOI it's malformed
    with pytest.raises(ValueError):
        decode_baseline_jpeg(enc[:-30])


def test_jpeg_progressive_partial_fidelity_stream():
    """A progressive stream whose successive approximation legally STOPS
    above Al=0 (first scans at Al=1, no refinement scans, EOI present)
    renders the coarse approximation — T.81 allows any progression depth.
    The decode must equal the baseline decode of the bit-truncated
    coefficients, never raise, and never silently zero whole bands."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg, encode_progressive_jpeg

    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    scans = [
        ((0, 1, 2), 0, 0, 0, 1),
        ((0,), 1, 63, 0, 1),
        ((1,), 1, 63, 0, 1),
        ((2,), 1, 63, 0, 1),
    ]
    coarse = decode_baseline_jpeg(encode_progressive_jpeg(img, quant=4, scans=scans))
    full = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4))
    assert coarse.shape == full.shape
    delta = np.abs(coarse.astype(int) - full.astype(int))
    # every coefficient is off by at most one bit-1 quant step: close to
    # the full decode (mean within a few grey levels), not garbage...
    assert 0 < delta.mean() < 20, delta.mean()
    # ...and not just the DC approximation either: texture must survive
    # (per-row variance of the coarse decode tracks the full decode)
    assert np.std(coarse.astype(float)) > 0.5 * np.std(full.astype(float))


def test_jpeg_restart_markers_all_scan_layouts():
    """DRI/RSTn streams decode bit-identically to their no-restart twins
    in EVERY scan layout: baseline fully-interleaved (restart counts
    MCUs), baseline non-interleaved multi-scan (restart counts blocks),
    and progressive (DC predictors AND the AC EOB-run must reset at each
    marker — a decoder that forgets the EOB-run reset desyncs the whole
    remaining scan). Previously the decoder's restart paths had no
    fixture coverage at all."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg, encode_progressive_jpeg

    rng = np.random.default_rng(29)
    for shape, kw in [((37, 29, 3), {}), ((24, 40, 3), {"subsample": True})]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        plain = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4, **kw))
        for enc in (
            encode_baseline_jpeg(img, quant=4, restart_interval=3, **kw),
            encode_baseline_jpeg(
                img, quant=4, multiscan=True, restart_interval=2, **kw
            ),
            encode_progressive_jpeg(img, quant=4, restart_interval=3, **kw),
            encode_progressive_jpeg(img, quant=4, restart_interval=1, **kw),
        ):
            assert b"\xff\xdd" in enc  # DRI present
            np.testing.assert_array_equal(plain, decode_baseline_jpeg(enc))


def test_jpeg_missing_component_scan_is_value_error():
    """A stream whose SOS lies (claims one component, then hits EOI with
    the other two never scanned) is malformed, not silently gray: the
    decoder reports the undecoded components as a ValueError."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg

    img = np.full((16, 16, 3), 90, np.uint8)
    data = bytearray(encode_baseline_jpeg(img, quant=4))
    i = bytes(data).find(b"\xff\xda")
    seglen = int.from_bytes(data[i + 2 : i + 4], "big")
    one_comp = b"\x00\x08\x01\x01\x00\x00\x3f\x00"
    patched = bytes(data[: i + 2]) + one_comp + bytes(data[i + 2 + seglen :])
    with pytest.raises(ValueError):
        decode_baseline_jpeg(patched)


def test_ppm_pgm_roundtrip_numpy_codec():
    """REAL decode in this container: random BGR pixels → PPM P6 bytes →
    decode_image → identical array; PGM for grayscale; and channel
    conversions (BT.601 luma, gray replication) are pinned."""
    from caffeonspark_spark.multimodal.columns import decode_image, encode_ppm

    rng = np.random.default_rng(42)
    bgr = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_ppm(bgr), 3), bgr)

    gray = rng.integers(0, 256, size=(5, 9, 1), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_ppm(gray), 1), gray)
    np.testing.assert_array_equal(
        decode_image(encode_ppm(gray), 3), np.repeat(gray, 3, axis=2)
    )

    luma = decode_image(encode_ppm(bgr), 1)
    b, g, r = (bgr[:, :, k].astype(np.uint32) for k in range(3))
    np.testing.assert_array_equal(
        luma[:, :, 0], ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    )


def test_bmp_decode_numpy_codec():
    """Hand-built uncompressed 24-bit BMP (bottom-up, padded rows) decodes
    to the expected top-down BGR array."""
    from caffeonspark_spark.multimodal.columns import decode_image

    h, w = 2, 3  # stride = 12 (w*3=9 padded to 12)
    top_down = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage
        rows += top_down[y].tobytes() + b"\x00" * (stride - w * 3)
    header = (
        b"BM" + (54 + len(rows)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(rows).to_bytes(4, "little")
        + b"\x00" * 16
    )
    np.testing.assert_array_equal(decode_image(bytes(header + rows), 3), top_down)


def _bmp_bytes(pixels_td, bpp, h_sign=1, palette=None, rle_stream=None):
    """Hand-build a BI_RGB BMP: pixels_td is the top-down BGR (or
    palette-index) array; h_sign=-1 emits the top-down layout. Passing
    ``rle_stream`` emits it verbatim as a BI_RLE8 pixel payload (comp=1)
    instead of uncompressed rows."""
    h, w = pixels_td.shape[:2]
    cb = bpp // 8
    stride = (w * cb + 3) & ~3
    pal_bytes = b""
    if palette is not None:
        for bgr in palette:
            pal_bytes += bytes(bgr) + b"\x00"
    if rle_stream is not None:
        rows = bytearray(rle_stream)
        comp = 1
    else:
        rows = bytearray()
        order = range(h) if h_sign < 0 else range(h - 1, -1, -1)
        for y in order:
            rows += pixels_td[y].tobytes() + b"\x00" * (stride - w * cb)
        comp = 0
    off = 54 + len(pal_bytes)
    header = (
        b"BM" + (off + len(rows)).to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + (h * h_sign).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
        + comp.to_bytes(4, "little") + len(rows).to_bytes(4, "little")
        + b"\x00" * 8
        + (len(palette) if palette is not None else 0).to_bytes(4, "little")
        + b"\x00" * 4
    )
    return bytes(header + pal_bytes + rows)


def _rle8_stream(idx_td):
    """Run-length encode a top-down index image as a BI_RLE8 stream in
    bottom-up storage order (encoded runs + EOL per row, final EOF)."""
    out = bytearray()
    for y in range(idx_td.shape[0] - 1, -1, -1):
        row = idx_td[y]
        x = 0
        while x < len(row):
            run = 1
            while x + run < len(row) and row[x + run] == row[x] and run < 255:
                run += 1
            out += bytes([run, int(row[x])])
            x += run
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOF
    return bytes(out)


def test_bmp_32bit_and_palette_variants():
    """The other uncompressed BI_RGB layouts real files ship: 32-bit BGRA
    (alpha dropped, OpenCV behavior), 8-bit palette (BGRA quad table),
    and the top-down (negative height) orientation — all decode to the
    same top-down BGR pixels as the 24-bit layout; out-of-palette indices
    stay in range (zero-padded table) rather than crashing."""
    from caffeonspark_spark.multimodal.columns import decode_image

    rng = np.random.default_rng(53)
    td = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)  # top-down BGR
    base = decode_image(_bmp_bytes(td, 24), 3)
    np.testing.assert_array_equal(base, td)

    bgra = np.concatenate([td, np.full((5, 3, 1), 0xAA, np.uint8)], axis=2)
    np.testing.assert_array_equal(decode_image(_bmp_bytes(bgra, 32), 3), td)
    np.testing.assert_array_equal(
        decode_image(_bmp_bytes(bgra, 32, h_sign=-1), 3), td
    )

    pal = [(10, 20, 30), (200, 150, 100), (0, 255, 0)]
    idx = rng.integers(0, 3, (6, 5), dtype=np.uint8)
    expect = np.array(pal, np.uint8)[idx]
    got = decode_image(_bmp_bytes(idx, 8, palette=pal), 3)
    np.testing.assert_array_equal(got, expect)

    # an index past the declared palette maps to the zero-padded entry
    idx_bad = idx.copy()
    idx_bad[0, 0] = 7
    got_bad = decode_image(_bmp_bytes(idx_bad, 8, palette=pal), 3)
    np.testing.assert_array_equal(got_bad[0, 0], np.zeros(3, np.uint8))

    # 16-bit stays outside the numpy tier
    with pytest.raises(ValueError):
        decode_image(_bmp_bytes(td, 16), 3)


def test_bmp_rle8_decodes_like_uncompressed():
    """BI_RLE8 (the compressed 8-bit layout real palette BMPs ship):
    run-length streams decode to the same pixels as the uncompressed
    palette layout; absolute runs, deltas (zero-fill of skipped pixels),
    and early-EOF zero fill all follow the spec; a stream with no EOF
    marker is malformed."""
    from caffeonspark_spark.multimodal.columns import decode_image

    rng = np.random.default_rng(61)
    pal = [(10, 20, 30), (200, 150, 100), (0, 255, 0), (5, 5, 5)]
    # runs-heavy content so the encoder emits multi-pixel runs
    idx = np.repeat(rng.integers(0, 4, (7, 3), dtype=np.uint8), 3, axis=1)[:, :8]
    plain = decode_image(_bmp_bytes(idx, 8, palette=pal), 3)
    rle = decode_image(
        _bmp_bytes(idx, 8, palette=pal, rle_stream=_rle8_stream(idx)), 3
    )
    np.testing.assert_array_equal(rle, plain)

    # hand-built stream: absolute run, delta skip (zero fill), early EOF
    # grid 2 rows x 6 cols, bottom-up: storage row 0 = bottom image row
    stream = (
        b"\x00\x04" + bytes([1, 2, 3, 1])   # absolute run of 4 indices
        + b"\x02\x02"                        # encoded: 2 pixels of index 2
        + b"\x00\x00"                        # EOL
        + b"\x03\x01"                        # top row: 3 pixels of index 1
        + b"\x00\x02\x02\x00"                # delta: skip 2 right (stay 0)
        + b"\x01\x03"                        # 1 pixel of index 3
        + b"\x00\x01"                        # EOF
    )
    got = decode_image(
        _bmp_bytes(np.zeros((2, 6), np.uint8), 8, palette=pal, rle_stream=stream), 3
    )
    palette = np.array(pal + [(0, 0, 0)] * 252, np.uint8)
    bottom = palette[[1, 2, 3, 1, 2, 2]]
    top = palette[[1, 1, 1, 0, 0, 3]]  # delta-skipped pixels stay index 0
    np.testing.assert_array_equal(got[1], bottom)
    np.testing.assert_array_equal(got[0], top)

    with pytest.raises(ValueError):  # no EOF marker → malformed
        decode_image(
            _bmp_bytes(
                np.zeros((2, 6), np.uint8), 8, palette=pal, rle_stream=b"\x02\x01"
            ),
            3,
        )


def test_real_ppm_through_batch_assembly(spark):
    """End-to-end REAL decode through the Spark encoded-image batch path
    with no codec library: PPM payloads → magic-sniffed numpy decode →
    resize → NCHW stack, pixels surviving bit-exact into the tensor."""
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(4)]
    from caffeonspark_spark.multimodal.columns import encode_ppm

    rows = [(f"img{i}", bytearray(encode_ppm(img))) for i, img in enumerate(imgs)]
    df = spark.createDataFrame(rows, "id string, data binary").coalesce(1)
    spec = ColumnSpec(
        "data", "encoded_image", channels=3, out_height=16, out_width=16
    )
    out = assemble_batches(df, [spec], batch_size=4).collect()
    assert out[0]["data_shape"] == [4, 3, 16, 16]
    flat = np.asarray(out[0]["data"], dtype=np.float32).reshape(4, 3, 16, 16)
    for i, img in enumerate(imgs):  # CHW float32 of the same pixels
        np.testing.assert_array_equal(
            flat[i], np.transpose(img, (2, 0, 1)).astype(np.float32)
        )


def test_real_jpeg_through_batch_assembly(spark):
    """Reference JPEG fixtures (data/images) through encoded-image batch
    assembly under EVERY codec tier — Pillow/OpenCV when installed, the
    from-spec baseline decoder otherwise (before r6 this silently went
    through fake_decode in codec-less containers): decode → resize →
    NCHW stack, real pixel variance asserted."""
    import glob

    paths = sorted(glob.glob("/root/reference/data/images/*.jpg"))[:4]
    rows = []
    for i, p in enumerate(paths):
        with open(p, "rb") as fh:
            rows.append((f"img{i}", bytearray(fh.read())))
    df = spark.createDataFrame(rows, "id string, data binary").coalesce(1)
    spec = ColumnSpec(
        "data", "encoded_image", channels=3, out_height=16, out_width=16
    )
    out = assemble_batches(df, [spec], batch_size=4).collect()
    assert out[0]["data_shape"] == [len(paths), 3, 16, 16]
    flat = np.asarray(out[0]["data"], dtype=np.float32)
    # real pixels, not a constant fill
    assert flat.std() > 1.0


def test_progressive_jpeg_through_batch_assembly(spark):
    """Progressive (SOF2) payloads through the full distributed path —
    encoded-image column → mapInArrow decode → resize → NCHW batch —
    must produce a batch BIT-EQUAL to the same images' baseline-JPEG
    payloads (identical quantized coefficients), proving the codec tier
    upgrade is invisible to the Spark-side plumbing."""
    from tests.jpeg_fixture import encode_baseline_jpeg, encode_progressive_jpeg

    rng = np.random.default_rng(43)
    imgs = [
        rng.integers(0, 256, (24, 20, 3), dtype=np.uint8) for _ in range(4)
    ]
    spec = ColumnSpec(
        "data", "encoded_image", channels=3, out_height=12, out_width=12
    )

    def batch_of(encoder, **kw):
        rows = [
            (f"img{i}", bytearray(encoder(im, quant=4, **kw)))
            for i, im in enumerate(imgs)
        ]
        df = spark.createDataFrame(rows, "id string, data binary").coalesce(1)
        out = assemble_batches(df, [spec], batch_size=4).collect()
        assert out[0]["data_shape"] == [4, 3, 12, 12]
        return np.asarray(out[0]["data"], dtype=np.float32)

    base = batch_of(encode_baseline_jpeg, subsample=True)
    prog = batch_of(encode_progressive_jpeg, subsample=True)
    assert base.std() > 1.0  # real pixels
    np.testing.assert_array_equal(base, prog)


def test_png_roundtrip_all_filters_and_color_types():
    """From-spec PNG tier: every scanline filter (0-4) and every 8-bit
    color type round-trips bit-exact through the fixture encoder →
    ``decode_png`` (zlib is stdlib, so this is a REAL decode)."""
    from caffeonspark_spark.multimodal.png import decode_png
    from tests.png_fixture import encode_png

    rng = np.random.default_rng(11)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], None):  # None = cycle 0-4
            dec = decode_png(encode_png(img, filters=filters))
            np.testing.assert_array_equal(dec, img, err_msg=f"c={c} f={filters}")
    # palette (color type 3): indices expand through PLTE to RGB
    pal = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, size=(10, 12, 1), dtype=np.uint8)
    dec = decode_png(encode_png(idx, palette=pal))
    np.testing.assert_array_equal(dec, pal[idx[:, :, 0]])


def test_png_adam7_and_16bit_roundtrip():
    """Adam7 interlace: seven independently filtered passes reassemble
    bit-exact (incl. dims not divisible by 8, which exercise empty and
    ragged passes). 16-bit: high byte survives (the OpenCV 16→8 behavior)."""
    from caffeonspark_spark.multimodal.png import decode_png
    from tests.png_fixture import encode_png

    rng = np.random.default_rng(19)
    for h, w, c in ((13, 11, 3), (8, 8, 1), (3, 2, 4), (1, 1, 1), (9, 17, 2)):
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        dec = decode_png(encode_png(img, interlace=1))
        np.testing.assert_array_equal(dec, img, err_msg=f"adam7 {h}x{w}x{c}")
    img16 = rng.integers(0, 65536, size=(7, 5, 3), dtype=np.uint16)
    dec = decode_png(encode_png(img16, depth=16))
    np.testing.assert_array_equal(dec, (img16 >> 8).astype(np.uint8))
    # Adam7 + 16-bit combined
    dec = decode_png(encode_png(img16, depth=16, interlace=1))
    np.testing.assert_array_equal(dec, (img16 >> 8).astype(np.uint8))


def test_png_unsupported_and_corrupt_streams():
    """Sub-byte depths raise the install-hint ValueError (same contract
    as the JPEG tier's unsupported classes); truncation raises
    ValueError, never IndexError/zlib.error."""
    import struct as _struct

    from caffeonspark_spark.multimodal.png import PNG_SIGNATURE, decode_png
    from tests.png_fixture import encode_png

    img = np.full((8, 8, 3), 50, np.uint8)
    good = encode_png(img)
    # patch IHDR depth byte to 4 (sub-byte, out of tier scope)
    ihdr_off = good.find(b"IHDR") + 4
    deep = bytearray(good)
    deep[ihdr_off + 8] = 4
    with pytest.raises(ValueError, match="install Pillow"):
        decode_png(bytes(deep))
    with pytest.raises(ValueError):
        decode_png(good[: len(good) // 2])
    with pytest.raises(ValueError):
        decode_png(PNG_SIGNATURE + _struct.pack(">I4s", 4, b"IEND"))


def test_png_through_batch_assembly(spark):
    """PNG payloads through the Spark encoded-image batch path with no
    codec library: magic-sniffed numpy decode → NCHW stack, pixels
    surviving bit-exact (BGR contract) into the tensor."""
    from tests.png_fixture import encode_png

    rng = np.random.default_rng(13)
    imgs = [rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(4)]
    rows = [(f"img{i}", bytearray(encode_png(img))) for i, img in enumerate(imgs)]
    df = spark.createDataFrame(rows, "id string, data binary").coalesce(1)
    spec = ColumnSpec(
        "data", "encoded_image", channels=3, out_height=16, out_width=16
    )
    out = assemble_batches(df, [spec], batch_size=4).collect()
    assert out[0]["data_shape"] == [4, 3, 16, 16]
    flat = np.asarray(out[0]["data"], dtype=np.float32).reshape(4, 3, 16, 16)
    for i, img in enumerate(imgs):
        # PNG is RGB; the decode contract is BGR (Mat parity) -> flip C
        np.testing.assert_array_equal(
            flat[i], np.transpose(img[:, :, ::-1], (2, 0, 1)).astype(np.float32)
        )


# --- audio/video modality (av.py) -----------------------------------------

@pytest.fixture(scope="module")
def audio_df(spark):
    from caffeonspark_spark.multimodal.av import audio_struct_col

    rows = [(i, bytearray(bytes([(i * 7 + j) % 256 for j in range(512)])), 16000, 512)
            for i in range(6)]
    base = spark.createDataFrame(rows, "id long, audio binary, sr int, ns int")
    return base.select(
        "id", audio_struct_col(F.col("audio"), F.col("sr"), F.col("ns")).alias("audio_meta")
    ).repartition(2)


@pytest.fixture(scope="module")
def video_df(spark):
    from caffeonspark_spark.multimodal.av import video_struct_col

    rows = [(i, bytearray(bytes([(i * 11 + j) % 256 for j in range(8 * 4 * 4)])), 8, 4, 4)
            for i in range(5)]
    base = spark.createDataFrame(rows, "id long, video binary, nf int, h int, w int")
    return base.select(
        "id",
        video_struct_col(F.col("video"), F.col("nf"), F.col("h"), F.col("w")).alias("video_meta"),
    ).repartition(2)


def test_audio_frame_energy(spark, audio_df):
    from caffeonspark_spark.multimodal.av import audio_frame_energy, fake_decode_audio

    out = audio_frame_energy(audio_df, frame_len=64, n_frames=8).orderBy("id")
    rows = out.collect()
    assert out.columns == ["id", "energy", "sample_rate"]
    assert len(rows) == 6
    for r in rows:
        assert len(r["energy"]) == 8
        assert r["sample_rate"] == 16000
        assert all(0.0 <= e <= 1.0 for e in r["energy"])
    # determinism: recompute row 0's features locally from the same bytes
    wave = fake_decode_audio(bytes(bytes([(0 * 7 + j) % 256 for j in range(512)])), 512)
    w = np.resize(wave.astype(np.float64), 64 * 8).reshape(8, 64)
    expect = np.sqrt((w * w).mean(axis=1)).astype(np.float32)
    got = np.array(rows[0]["energy"], dtype=np.float32)
    assert np.allclose(got, expect, atol=1e-6)


def test_video_sample_frames(spark, video_df):
    from caffeonspark_spark.multimodal.av import video_sample_frames

    out = video_sample_frames(video_df, k=4).orderBy("id", "frame_idx")
    rows = out.collect()
    assert out.columns == ["id", "frame_idx", "frame", "height", "width"]
    assert len(rows) == 5 * 4
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
        assert len(bytes(r["frame"])) == 4 * 4  # H*W*1 bytes per frame
    # evenly spaced over 8 frames: 0,2,4,7 (linspace ends inclusive)
    assert [r["frame_idx"] for r in by_id[0]] == [0, 2, 4, 7]
    # frames feed the existing image operators unchanged
    from caffeonspark_spark.multimodal.columns import raw_to_hwc

    f0 = raw_to_hwc(bytes(by_id[0][0]["frame"]), 1, 4, 4)
    assert f0.shape == (4, 4, 1)


def test_decode_stubs_raise(spark):
    from caffeonspark_spark.multimodal.av import decode_audio, decode_video_frames

    with pytest.raises(NotImplementedError):
        decode_audio(b"x", 16000)
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"x", 1, 2, 2)


def test_augment_deterministic_per_sample_and_seed():
    """Same (sample, seed) → identical augmentation on every call (retry
    safety); changing the seed re-rolls; different samples diverge."""
    import numpy as np
    from caffeonspark_spark.multimodal.columns import augment_hwc

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    a1 = augment_hwc(img, "s1", seed=7, crop_h=8, crop_w=8)
    a2 = augment_hwc(img, "s1", seed=7, crop_h=8, crop_w=8)
    assert a1.shape == (8, 8, 3)
    assert np.array_equal(a1, a2)

    reroll = augment_hwc(img, "s1", seed=8, crop_h=8, crop_w=8)
    other = augment_hwc(img, "s2", seed=7, crop_h=8, crop_w=8)
    assert not np.array_equal(a1, reroll) or not np.array_equal(a1, other)

    # crop equal to the full frame degrades to identity-or-mirror
    full = augment_hwc(img, "s3", seed=1, crop_h=16, crop_w=16)
    assert np.array_equal(full, img) or np.array_equal(full, img[:, ::-1])


def test_augment_distribution_over_samples():
    """Across many samples the crop offsets must actually vary (the hash is
    spreading, not collapsing to one corner)."""
    import numpy as np
    from caffeonspark_spark.multimodal.columns import augment_hwc

    img = np.zeros((32, 32, 1), dtype=np.uint8)
    for y in range(32):
        img[y, :, 0] = y
    tops = set()
    for i in range(64):
        out = augment_hwc(img, f"id{i}", seed=0, crop_h=8, crop_w=8, mirror_prob=0.0)
        tops.add(int(out[0, 0, 0]))
    assert len(tops) >= 8


def test_wav_pcm_roundtrip():
    """REAL audio decode in this container: sine → 16-bit PCM WAV bytes →
    decode_audio → waveform within quantization error; stereo mixes to
    mono; compressed magic still raises the documented hint."""
    import pytest as _pytest

    from caffeonspark_spark.multimodal.av import decode_audio, encode_wav_pcm16

    t = np.arange(800, dtype=np.float32) / 16000.0
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    got = decode_audio(encode_wav_pcm16(wave, 16000), 16000)
    assert got.dtype == np.float32 and got.shape == wave.shape
    np.testing.assert_allclose(got, wave, atol=1e-4)

    stereo = np.empty(2 * len(wave), dtype=np.float32)
    stereo[0::2], stereo[1::2] = wave, -wave  # L/R cancel -> silence
    got2 = decode_audio(encode_wav_pcm16(stereo, 16000, n_channels=2), 16000)
    assert got2.shape == wave.shape
    np.testing.assert_allclose(got2, 0.0, atol=1e-4)

    with _pytest.raises(NotImplementedError, match="RIFF/WAVE"):
        decode_audio(b"ID3\x04rest-of-an-mp3", 16000)


def test_wav_full_format_matrix_roundtrip():
    """The codec-free WAV path covers the real-world format matrix: 8/16/
    24/32-bit integer PCM, IEEE float32/float64, and WAVE_FORMAT_EXTENSIBLE
    wrappers — each round-trips the waveform within its own quantization
    error; an extensible wrapper with an unknown subformat raises."""
    import pytest as _pytest

    from caffeonspark_spark.multimodal.av import decode_audio, encode_wav

    t = np.arange(600, dtype=np.float32) / 16000.0
    wave = (0.7 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    cases = [
        dict(bits=8, atol=1.0 / 120),
        dict(bits=16, atol=1e-4),
        dict(bits=24, atol=1e-6),
        dict(bits=32, atol=1e-7),
        dict(bits=32, float_fmt=True, atol=1e-7),
        dict(bits=64, float_fmt=True, atol=1e-7),
        dict(bits=24, extensible=True, atol=1e-6),
        dict(bits=32, float_fmt=True, extensible=True, atol=1e-7),
    ]
    for c in cases:
        atol = c.pop("atol")
        got = decode_audio(encode_wav(wave, 16000, **c), 16000)
        assert got.dtype == np.float32 and got.shape == wave.shape, c
        np.testing.assert_allclose(got, wave, atol=atol, err_msg=str(c))

    # stereo 24-bit mixes down to mono (L/R cancel → silence)
    stereo = np.empty(2 * len(wave), dtype=np.float32)
    stereo[0::2], stereo[1::2] = wave, -wave
    got2 = decode_audio(encode_wav(stereo, 16000, n_channels=2, bits=24), 16000)
    np.testing.assert_allclose(got2, 0.0, atol=1e-6)

    # extensible wrapper with an unknown subformat GUID → ValueError
    data = bytearray(encode_wav(wave, 16000, bits=16, extensible=True))
    i = bytes(data).find(b"fmt ")
    data[i + 8 + 24] = 0x55  # subformat code 0x0055 (MP3) — not PCM/float
    with _pytest.raises(ValueError):
        decode_audio(bytes(data), 16000)


def test_wav_through_frame_energy(spark):
    """End-to-end REAL audio through the Arrow-batched frame-energy
    operator: a loud-then-silent WAV yields high then ~zero frame energy."""
    from caffeonspark_spark.multimodal.av import (
        audio_frame_energy,
        audio_struct_col,
        encode_wav_pcm16,
        wav_frame_decoder,
    )

    n = 1024
    wave = np.zeros(n, dtype=np.float32)
    wave[: n // 2] = 0.9 * np.sign(np.sin(np.arange(n // 2, dtype=np.float32)))
    payload = encode_wav_pcm16(wave, 16000)
    base = spark.createDataFrame(
        [(0, bytearray(payload), 16000, n)], "id long, audio binary, sr int, ns int"
    ).select(
        "id",
        audio_struct_col(F.col("audio"), F.col("sr"), F.col("ns")).alias("audio_meta"),
    )
    out = audio_frame_energy(
        base, frame_len=256, n_frames=4, decoder=wav_frame_decoder
    ).collect()
    assert len(out) == 1
    energy = out[0]["energy"]
    assert len(energy) == 4
    assert energy[0] > 0.5 and energy[1] > 0.5
    assert energy[2] < 1e-6 and energy[3] < 1e-6


def test_short_clip_frame_energy_zero_padded(spark):
    """A clip SHORTER than frame_len*n_frames must zero-pad its tail, not
    tile the waveform back from the start (the r10 ADVICE defect class,
    fixed on the log-mel path in r11 and on this energy path in r12):
    trailing frames of a short loud clip report ~zero energy, never
    recycled audio."""
    from caffeonspark_spark.multimodal.av import (
        audio_frame_energy,
        audio_struct_col,
        encode_wav_pcm16,
        wav_frame_decoder,
    )

    n = 256  # one frame's worth; frames 1..3 are pure padding
    wave = 0.9 * np.sign(
        np.sin(np.arange(n, dtype=np.float32))
    ).astype(np.float32)
    base = spark.createDataFrame(
        [(0, bytearray(encode_wav_pcm16(wave, 16000)), 16000, n)],
        "id long, audio binary, sr int, ns int",
    ).select(
        "id",
        audio_struct_col(F.col("audio"), F.col("sr"), F.col("ns")).alias("audio_meta"),
    )
    out = audio_frame_energy(
        base, frame_len=256, n_frames=4, decoder=wav_frame_decoder
    ).collect()
    energy = out[0]["energy"]
    assert energy[0] > 0.5
    assert all(e == 0.0 for e in energy[1:]), energy


def test_wav_format_matrix_through_frame_energy(spark):
    """Every codec-free WAV layout through the distributed frame-energy
    operator in one DataFrame: 24-bit PCM, 32-bit float, and extensible-
    wrapped rows must produce frame energies equal (within quantization)
    to the 16-bit row's — the seam decoder dispatches per payload, so a
    mixed-format corpus is one mapInPandas pass, not per-format jobs."""
    from caffeonspark_spark.multimodal.av import (
        audio_frame_energy,
        audio_struct_col,
        encode_wav,
        wav_frame_decoder,
    )

    n = 1024
    t = np.arange(n, dtype=np.float32) / 16000.0
    wave = (0.8 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    rows = [
        (0, bytearray(encode_wav(wave, 16000, bits=16)), 16000, n),
        (1, bytearray(encode_wav(wave, 16000, bits=24)), 16000, n),
        (2, bytearray(encode_wav(wave, 16000, bits=32, float_fmt=True)), 16000, n),
        (3, bytearray(encode_wav(wave, 16000, bits=24, extensible=True)), 16000, n),
    ]
    base = spark.createDataFrame(
        rows, "id long, audio binary, sr int, ns int"
    ).select(
        "id",
        audio_struct_col(F.col("audio"), F.col("sr"), F.col("ns")).alias("audio_meta"),
    )
    out = {
        r["id"]: np.array(r["energy"], np.float64)
        for r in audio_frame_energy(
            base, frame_len=256, n_frames=4, decoder=wav_frame_decoder
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for i in (1, 2, 3):
        np.testing.assert_allclose(out[i], out[0], atol=1e-4)


def test_degenerate_magic_payload_falls_back_to_fake_when_opted_in(spark):
    """With spec.fake_fallback=True (the fixture escape hatch), a payload
    with PPM magic but degenerate (0x0) dims falls back to fake_decode
    inside batch assembly instead of crashing the batch."""
    rows = [("bad", bytearray(b"P6\n0 0\n255\n")), ("bm", bytearray(b"BM\x00\x00"))]
    df = spark.createDataFrame(rows, "id string, data binary").coalesce(1)
    spec = ColumnSpec(
        "data", "encoded_image", channels=3, height=4, width=4, fake_fallback=True
    )
    out = assemble_batches(df, [spec], batch_size=2).collect()
    assert out[0]["data_shape"] == [2, 3, 4, 4]


def test_corrupt_magic_payload_raises_by_default():
    """By default a truncated/corrupt payload that CLAIMS a real container
    (P6/P5/BM magic) must raise, not silently substitute garbage pixels —
    silent fake output would mask data corruption in a production batch."""
    from caffeonspark_spark.multimodal.columns import (
        CODEC_NAME,
        image_sample_to_tensor,
    )

    if CODEC_NAME in ("pillow", "opencv"):
        pytest.skip("real codec present; numpy-native strictness not in play")
    spec = ColumnSpec("data", "encoded_image", channels=3, height=4, width=4)
    with pytest.raises(ValueError):
        image_sample_to_tensor(b"P6\n0 0\n255\n", spec, encoded=True)


def test_jpeg_roundtrip_property():
    """Property: ANY uint8 image (random noise included — the worst case
    for DCT coding) survives encode->decode within the quantization error
    bound; dims and channel count always round-trip exactly. Spark-free,
    pins the from-spec codec pair against shape/marker bugs."""
    from hypothesis import given, settings, strategies as st

    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(1, 25),
        w=st.integers(1, 25),
        c=st.sampled_from([1, 3]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, c, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        # 4:4:4 / grayscale only: chroma subsampling AVERAGES 2x2 blocks,
        # so on noise its per-pixel error is unbounded-ish by design —
        # the deterministic smooth-image test covers that mode instead
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 64, (h, w, c, err.max())

    check()


def test_jpeg_fill_bytes_before_marker():
    """Optional 0xFF fill bytes before a marker are legal (T.81 B.1.1.2);
    'FF FF C4' must parse as a fill byte + DHT, not as a bogus marker."""
    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg

    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    enc = encode_baseline_jpeg(img, quant=4)
    # inject a fill byte before the DHT marker (FF C4)
    i = enc.index(b"\xff\xc4")
    padded = enc[:i] + b"\xff" + enc[i:]
    dec = decode_baseline_jpeg(padded)
    assert dec.shape == img.shape
    np.testing.assert_array_equal(dec, decode_baseline_jpeg(enc))


def test_png_subbyte_depths_roundtrip():
    """1/2/4-bit gray (scaled to full range like imdecode) and 4-bit
    palette (indices pass through PLTE), incl. Adam7-interlaced sub-byte
    and a width that isn't a whole number of packed bytes."""
    from caffeonspark_spark.multimodal.png import decode_png
    from tests.png_fixture import encode_png

    rng = np.random.default_rng(23)
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        g = rng.integers(0, maxv + 1, size=(9, 11, 1), dtype=np.uint8)
        for inter in (0, 1):
            dec = decode_png(encode_png(g, depth=depth, interlace=inter))
            np.testing.assert_array_equal(
                dec, (g.astype(int) * (255 // maxv)).astype(np.uint8),
                err_msg=f"gray depth={depth} interlace={inter}",
            )
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(7, 5, 1), dtype=np.uint8)
    dec = decode_png(encode_png(idx, palette=pal, depth=4))
    np.testing.assert_array_equal(dec, pal[idx[:, :, 0]])
    # spec-illegal: sub-byte RGB stays an install-hint rejection
    good = encode_png(np.full((4, 4, 3), 9, np.uint8))
    bad = bytearray(good)
    bad[good.find(b"IHDR") + 4 + 8] = 4
    with pytest.raises(ValueError, match="install Pillow"):
        decode_png(bytes(bad))


def test_wav_g711_telephony_formats():
    """G.711 μ-law/A-law (WAVE_FORMAT_MULAW/ALAW) decode from spec lookup
    tables: cross-checked against the stdlib audioop expansion, hand-pinned
    ITU vectors, round-trip within companding error, and the extensible
    wrapper resolves the subformat."""
    import pytest as _pytest

    from caffeonspark_spark.multimodal.av import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        decode_audio,
        encode_wav,
    )

    # hand-pinned spec vectors (CCITT reference arithmetic):
    # μ-law 0xFF -> 0 (positive silence), 0x7F -> 0 (negative zero),
    # 0x00 -> -32124 (largest negative), 0x80 -> +32124
    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x7F] == 0
    assert _ULAW_TABLE[0x00] == -32124 and _ULAW_TABLE[0x80] == 32124
    # A-law 0x55 -> -8 (smallest negative), 0xD5 -> +8,
    # 0x2A -> -32256 (largest negative), 0xAA -> +32256
    assert _ALAW_TABLE[0x55] == -8 and _ALAW_TABLE[0xD5] == 8
    assert _ALAW_TABLE[0x2A] == -32256 and _ALAW_TABLE[0xAA] == 32256

    # independent reference: the stdlib companding expansion (deprecated
    # but present on this interpreter) must agree on every code word
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
    except ImportError:
        audioop = None
    if audioop is not None:
        every = bytes(range(256))
        ref_u = np.frombuffer(audioop.ulaw2lin(every, 2), dtype="<i2")
        ref_a = np.frombuffer(audioop.alaw2lin(every, 2), dtype="<i2")
        np.testing.assert_array_equal(_ULAW_TABLE, ref_u)
        np.testing.assert_array_equal(_ALAW_TABLE, ref_a)

    # round-trip: companding is ~13/14-bit log-spaced — the error bound is
    # proportional to amplitude; at |x| <= 0.7 the worst step is ~1/32 of
    # the amplitude near full scale, far tighter near zero
    t = np.arange(600, dtype=np.float32) / 8000.0
    wave = (0.7 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    for kind in ("ulaw", "alaw"):
        got = decode_audio(encode_wav(wave, 8000, g711=kind), 8000)
        assert got.dtype == np.float32 and got.shape == wave.shape
        err = np.abs(got - wave)
        tol = 1.0 / 256 + np.abs(wave) / 16  # step grows with segment
        assert (err <= tol).all(), (kind, float(err.max()))

    # extensible wrapper around μ-law resolves the subformat code
    data = bytearray(encode_wav(wave, 8000, g711="ulaw", extensible=True))
    got2 = decode_audio(bytes(data), 8000)
    np.testing.assert_array_equal(
        got2, decode_audio(encode_wav(wave, 8000, g711="ulaw"), 8000)
    )

    # G.711 with a non-8-bit container is spec-illegal -> ValueError
    bad = bytearray(encode_wav(wave, 8000, g711="alaw"))
    i = bytes(bad).find(b"fmt ")
    bad[i + 8 + 14 : i + 8 + 16] = (16).to_bytes(2, "little")
    with _pytest.raises(ValueError):
        decode_audio(bytes(bad), 8000)


def test_wav_ima_adpcm_decode():
    """IMA ADPCM (WAVE_FORMAT_IMA_ADPCM): the nibble-expansion kernel
    matches the stdlib DVI expansion code-for-code, block-leading samples
    are EXACT (the header restates them), steady-state round-trip error is
    step-bounded after the onset slew, the fact chunk truncates padding,
    and stereo blocks mix down to the mean of their channels."""
    import pytest as _pytest

    from caffeonspark_spark.multimodal.av import (
        _ima_decode_nibbles,
        decode_audio,
        encode_wav_ima_adpcm,
    )

    # kernel cross-check vs stdlib audioop (Intel/DVI ADPCM — the same
    # reference arithmetic): every state path via random codes
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
    except ImportError:
        audioop = None
    if audioop is not None:
        rng = np.random.default_rng(11)
        nibs = rng.integers(0, 16, size=400).astype(np.uint8)
        packed = bytes(
            (int(nibs[i]) << 4) | int(nibs[i + 1]) for i in range(0, 400, 2)
        )
        ref = np.frombuffer(audioop.adpcm2lin(packed, 2, (0, 0))[0], dtype="<i2")
        mine = _ima_decode_nibbles(
            nibs.reshape(1, -1), np.array([0]), np.array([0])
        )[0]
        np.testing.assert_array_equal(mine, ref)

    t = np.arange(3000, dtype=np.float32) / 8000.0
    wave = (0.6 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    payload = encode_wav_ima_adpcm(wave, 8000, block_align=256)
    got = decode_audio(payload, 8000)
    assert got.dtype == np.float32 and got.shape == wave.shape
    err = np.abs(got - wave)
    # onset slew while the step index adapts from 0; steady state is tight
    assert err[64:].max() < 0.02 and np.sqrt((err**2).mean()) < 0.03
    # block-leading samples are exact int16 restatements
    spb = (256 - 4) * 2 + 1
    heads = np.arange(0, len(wave), spb)
    np.testing.assert_allclose(got[heads], np.round(wave[heads] * 32767) / 32768.0,
                               atol=1.0 / 32768)

    # fact chunk truncates the final block's padding
    assert decode_audio(encode_wav_ima_adpcm(wave[:700], 8000), 8000).shape == (700,)

    # stereo: weave two mono streams into 2-channel blocks (hdrA+hdrB then
    # alternating 4-byte groups) — decode equals the channel mean
    a, b = wave[:spb], (0.3 * wave[:spb]).astype(np.float32)
    mono_a, mono_b = (
        encode_wav_ima_adpcm(x, 8000, block_align=256) for x in (a, b)
    )
    def data_chunk(buf):
        i = buf.find(b"data")
        size = int.from_bytes(buf[i + 4 : i + 8], "little")
        return buf[i + 8 : i + 8 + size]
    blk_a, blk_b = data_chunk(mono_a), data_chunk(mono_b)
    assert len(blk_a) == len(blk_b) == 256
    groups_a, groups_b = blk_a[4:], blk_b[4:]
    woven = bytearray(blk_a[:4] + blk_b[:4])
    for g in range(0, len(groups_a), 4):
        woven += groups_a[g : g + 4] + groups_b[g : g + 4]
    stereo_align = 512
    fmt = (
        (0x11).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + stereo_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + spb.to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(woven).to_bytes(4, "little") + bytes(woven)
    stereo = b"RIFF" + len(body).to_bytes(4, "little") + body
    got_s = decode_audio(stereo, 8000)
    ga = decode_audio(mono_a, 8000)
    gb = decode_audio(mono_b, 8000)
    np.testing.assert_allclose(got_s, (ga + gb) / 2.0, atol=1e-7)

    # spec-illegal container bits and bad block align raise
    badbits = bytearray(payload)
    i = bytes(badbits).find(b"fmt ")
    badbits[i + 8 + 14 : i + 8 + 16] = (8).to_bytes(2, "little")
    with _pytest.raises(ValueError):
        decode_audio(bytes(badbits), 8000)
    badalign = bytearray(payload)
    badalign[i + 8 + 12 : i + 8 + 14] = (6).to_bytes(2, "little")
    with _pytest.raises(ValueError):
        decode_audio(bytes(badalign), 8000)


def test_tiff_decode_matrix():
    """Baseline TIFF through the numpy tier: gray/RGB/palette/bilevel ×
    none/PackBits/LZW × II/MM byte orders, multi-strip, LZW Predictor 2,
    WhiteIsZero inversion — each round-trips exactly, and 3-channel output
    comes back BGR per the Mat.decode contract."""
    import pytest as _pytest

    from caffeonspark_spark.multimodal.columns import decode_image
    from caffeonspark_spark.multimodal.tiff import decode_tiff
    from tests.tiff_fixture import encode_tiff

    rng = np.random.default_rng(23)
    rgb = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (7, 11, 1), dtype=np.uint8)
    for be in (False, True):
        for comp in (1, 32773, 5):
            got = decode_image(
                encode_tiff(rgb, compression=comp, big_endian=be, rows_per_strip=4), 3
            )
            np.testing.assert_array_equal(got, rgb[:, :, ::-1])  # BGR
            got = decode_image(encode_tiff(gray, compression=comp, big_endian=be), 1)
            np.testing.assert_array_equal(got, gray)
    # LZW horizontal-differencing predictor
    got = decode_tiff(encode_tiff(rgb, compression=5, predictor=2, rows_per_strip=5))
    np.testing.assert_array_equal(got, rgb)
    # WhiteIsZero gray inverts back
    np.testing.assert_array_equal(decode_tiff(encode_tiff(gray, photometric=0)), gray)
    # palette resolves through ColorMap (RGB)
    idx = rng.integers(0, 4, (6, 5, 1), dtype=np.uint8)
    pal = [(10, 20, 30), (200, 0, 0), (0, 200, 0), (0, 0, 200)]
    got = decode_tiff(encode_tiff(idx, palette=pal, compression=32773))
    np.testing.assert_array_equal(got, np.array(pal, np.uint8)[idx[:, :, 0]])
    # 1-bit bilevel, both polarities
    bits = rng.integers(0, 2, (9, 17, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_tiff(encode_tiff(bits, bilevel=True))[:, :, 0], bits[:, :, 0] * 255
    )
    np.testing.assert_array_equal(
        decode_tiff(encode_tiff(bits, bilevel=True, photometric=0))[:, :, 0],
        255 - bits[:, :, 0] * 255,
    )
    # LZW width growth + mid-stream Clear restarts (large random strip)
    big = rng.integers(0, 256, (300, 200, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_tiff(encode_tiff(big, compression=5)), big)
    # unsupported classes raise the install hint (tiled layout)
    data = bytearray(encode_tiff(gray))
    # append a TileWidth tag is intrusive; instead flip compression to
    # deflate (8) — spec-legal TIFF, outside the from-spec tier
    i = data.find((259).to_bytes(2, "little"))
    data[i + 8 : i + 10] = (8).to_bytes(2, "little")
    with _pytest.raises(ValueError, match="install Pillow"):
        decode_tiff(bytes(data))


def test_tiff_lzw_spec_vector():
    """Decoder vs a HAND-DERIVED spec code sequence (independent of the
    fixture encoder): input [7,7,7,8] encodes as
    [Clear, 7, 258, 8, EOI] at 9 bits — the 258 is the K-omega case (a
    code referencing the entry created by the immediately preceding code)."""
    from caffeonspark_spark.multimodal.tiff import _lzw
    from tests.tiff_fixture import pack_codes

    stream = pack_codes([(256, 9), (7, 9), (258, 9), (8, 9), (257, 9)])
    assert _lzw(stream, 4) == bytes([7, 7, 7, 8])
    # and the same sequence WITHOUT the leading Clear is equally legal
    stream2 = pack_codes([(7, 9), (258, 9), (8, 9), (257, 9)])
    assert _lzw(stream2, 4) == bytes([7, 7, 7, 8])



def test_tiff_through_batch_assembly(spark):
    """TIFF payloads through the full distributed path — encoded-image
    column → mapInArrow decode → resize → NCHW batch — must produce a
    batch BIT-EQUAL to (a) the same images as LZW-compressed TIFF and
    (b) the same pixels as PPM payloads through the established netpbm
    path: cross-container parity proves the new tier is invisible to the
    Spark-side plumbing."""
    from caffeonspark_spark.multimodal.columns import encode_ppm
    from tests.tiff_fixture import encode_tiff

    rng = np.random.default_rng(47)
    imgs = [rng.integers(0, 256, (24, 20, 3), dtype=np.uint8) for _ in range(4)]
    spec = ColumnSpec(
        "data", "encoded_image", channels=3, out_height=12, out_width=12
    )

    def batch_of(payloads):
        rows = [(f"img{i}", bytearray(p)) for i, p in enumerate(payloads)]
        df = spark.createDataFrame(rows, "id string, data binary").coalesce(1)
        out = assemble_batches(df, [spec], batch_size=4).collect()
        assert out[0]["data_shape"] == [4, 3, 12, 12]
        return np.asarray(out[0]["data"], dtype=np.float32)

    raw = batch_of([encode_tiff(im) for im in imgs])
    lzw = batch_of([encode_tiff(im, compression=5, predictor=2) for im in imgs])
    ppm = batch_of([encode_ppm(im[:, :, ::-1]) for im in imgs])  # BGR input
    assert raw.std() > 1.0  # real pixels
    np.testing.assert_array_equal(raw, lzw)
    np.testing.assert_array_equal(raw, ppm)


def test_netpbm_plain_variants():
    """The plain/ASCII netpbm family (P1/P2/P3) and raw bitmap (P4) decode
    to the same pixels as their raw siblings: comments anywhere in the
    header, adjacent P1 digits, PBM's 1-is-black polarity, byte-aligned P4
    rows, and over-maxval samples rejected."""
    import pytest as _pytest

    from caffeonspark_spark.multimodal.columns import _numpy_decode

    rng = np.random.default_rng(29)
    gray = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    rgb = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    p2 = (
        b"P2\n# comment\n7 5\n255\n"
        + b" ".join(str(v).encode() for v in gray.flatten())
    )
    np.testing.assert_array_equal(_numpy_decode(p2, 1)[:, :, 0], gray)
    p3 = b"P3 6 4 255\n" + b" ".join(str(v).encode() for v in rgb.flatten())
    np.testing.assert_array_equal(_numpy_decode(p3, 3), rgb[:, :, ::-1])  # BGR
    bits = rng.integers(0, 2, (3, 9), dtype=np.uint8)
    p1 = b"P1\n9 3\n" + b"".join(str(v).encode() for v in bits.flatten())
    np.testing.assert_array_equal(_numpy_decode(p1, 1)[:, :, 0], (1 - bits) * 255)
    p4 = b"P4\n9 3\n" + np.packbits(bits, axis=1).tobytes()
    np.testing.assert_array_equal(_numpy_decode(p4, 1)[:, :, 0], (1 - bits) * 255)
    # equivalence: the same gray image as P2 (plain) and P5 (raw)
    p5 = b"P5\n7 5\n255\n" + gray.tobytes()
    np.testing.assert_array_equal(_numpy_decode(p2, 1), _numpy_decode(p5, 1))
    for bad in (
        b"P2 2 1 255\n300 1",  # sample > maxval
        b"P1 4 1\n01",  # raster too short
        b"P2 2 1 255\n1 x",  # non-numeric token
        b"P4 9 9\n\x00",  # packed rows overrun
        b"P2 2 1 255\n99999999999999999999 1",  # 20-digit token: int64 overflow
        b"P3 1 1 255\n-99999999999999999999 0 0",  # negative overflow variant
    ):
        with _pytest.raises(ValueError):
            _numpy_decode(bad, 1)


def test_tiff_16bit_high_byte():
    """16-bit TIFF gray/RGB keeps the high byte (the PNG tier's 16→8
    convention), in both byte orders and under PackBits/LZW; 16-bit with
    Predictor 2 is outside the tier and raises the install hint."""
    import pytest as _pytest

    from caffeonspark_spark.multimodal.tiff import decode_tiff
    from tests.tiff_fixture import encode_tiff

    rng = np.random.default_rng(37)
    g16 = rng.integers(0, 65536, (6, 5, 1), dtype=np.uint16)
    rgb16 = rng.integers(0, 65536, (4, 7, 3), dtype=np.uint16)
    for be in (False, True):
        for comp in (1, 32773, 5):
            got = decode_tiff(encode_tiff(g16, compression=comp, big_endian=be))
            np.testing.assert_array_equal(got, (g16 >> 8).astype(np.uint8))
            got = decode_tiff(encode_tiff(rgb16, compression=comp, big_endian=be))
            np.testing.assert_array_equal(got, (rgb16 >> 8).astype(np.uint8))
    # WhiteIsZero at 16 bits inverts on the full-scale grid
    got = decode_tiff(encode_tiff(g16, photometric=0))
    np.testing.assert_array_equal(got, ((65535 - (65535 - g16)) >> 8).astype(np.uint8))
    with _pytest.raises(ValueError, match="install Pillow"):
        decode_tiff(encode_tiff(g16, compression=5, predictor=2))


def test_audio_logmel_frames(spark):
    """Log-mel front end through the distributed path: a pure tone's
    energy concentrates in the mel band containing its frequency, silence
    hits the log floor, and the filterbank itself satisfies the textbook
    invariants (unit peaks, triangular overlap covering the band)."""
    from caffeonspark_spark.multimodal.av import (
        _mel_filterbank,
        audio_logmel_frames,
        audio_struct_col,
        encode_wav_pcm16,
        wav_frame_decoder,
    )

    fb = _mel_filterbank(8, 256, 8000.0)
    assert fb.shape == (8, 129)
    np.testing.assert_allclose(fb.max(axis=1), 1.0)  # unit peaks
    assert (fb.sum(axis=0)[3:-3] > 0).all()  # triangles tile the band

    sr, n = 8000, 2048
    t = np.arange(n, dtype=np.float64) / sr
    tone = (0.8 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)  # 1 kHz
    silence = np.zeros(n, dtype=np.float32)
    rows = [
        (0, bytearray(encode_wav_pcm16(tone, sr)), sr, n),
        (1, bytearray(encode_wav_pcm16(silence, sr)), sr, n),
    ]
    base = spark.createDataFrame(
        rows, "id long, audio binary, sr int, ns int"
    ).select(
        "id",
        audio_struct_col(F.col("audio"), F.col("sr"), F.col("ns")).alias("audio_meta"),
    )
    out = {
        r["id"]: np.array(r["logmel"], np.float32).reshape(16, 8)
        for r in audio_logmel_frames(base, decoder=wav_frame_decoder).collect()
    }
    assert set(out) == {0, 1}
    # the 1 kHz tone's hottest mel band must contain 1 kHz
    mean_tone = out[0].mean(axis=0)
    hot = int(np.argmax(mean_tone))
    fb_bins = np.fft.rfftfreq(256, d=1.0 / sr)
    band_freqs = fb_bins[fb[hot] > 0]
    assert band_freqs.min() <= 1000.0 <= band_freqs.max()
    # silence floors at log(1e-10)
    np.testing.assert_allclose(out[1], np.log(1e-10), atol=1e-5)
    # determinism: a second run is bit-identical
    out2 = {
        r["id"]: np.array(r["logmel"], np.float32)
        for r in audio_logmel_frames(base, decoder=wav_frame_decoder).collect()
    }
    np.testing.assert_array_equal(out[0].reshape(-1), out2[0])
    # short clips ZERO-pad (not tile): a 256-sample tone's frames past the
    # audio end are silence at the log floor, not recycled tone
    short = spark.createDataFrame(
        [(2, bytearray(encode_wav_pcm16(tone[:256], sr)), sr, 256)],
        "id long, audio binary, sr int, ns int",
    ).select(
        "id",
        audio_struct_col(F.col("audio"), F.col("sr"), F.col("ns")).alias("audio_meta"),
    )
    row = audio_logmel_frames(short, decoder=wav_frame_decoder).collect()[0]
    sm = np.array(row["logmel"], np.float32).reshape(16, 8)
    np.testing.assert_allclose(sm[2:], np.log(1e-10), atol=1e-5)
    assert sm[0].max() > np.log(1e-10) + 1.0  # the real frame has energy


def test_wav_ms_adpcm_decode():
    """MS ADPCM (WAVE_FORMAT_ADPCM): hand-derived spec vector (predictor 0,
    the two header samples emitted sample2-first, signed nibbles against
    the adapting delta), tight round-trip via the 2-tap predictor, exact
    block-leading samples, fact-chunk truncation, stereo mixdown, and
    out-of-range predictor indices rejected."""
    import pytest as _pytest

    from caffeonspark_spark.multimodal.av import (
        _ms_decode_nibbles,
        decode_audio,
        encode_wav_ms_adpcm,
    )

    # hand vector: pred 0 (c1=256,c2=0 -> pred = s1), delta 16, s1=100,
    # s2=50; code +3 -> 100+48=148, code -2 (0xE) -> 148-32=116
    got = _ms_decode_nibbles(
        np.array([[3, 14]], dtype=np.uint8),
        np.array([0]),
        np.array([16]),
        np.array([100]),
        np.array([50]),
    )
    np.testing.assert_array_equal(got[0], [148, 116])

    t = np.arange(3000, dtype=np.float32) / 8000.0
    wave = (0.6 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    payload = encode_wav_ms_adpcm(wave, 8000, block_align=256)
    dec = decode_audio(payload, 8000)
    assert dec.dtype == np.float32 and dec.shape == wave.shape
    assert np.abs(dec - wave).max() < 0.01  # 2-tap predictor tracks a sine
    spb = (256 - 7) * 2 + 2
    heads = np.arange(0, len(wave), spb)
    np.testing.assert_allclose(
        dec[heads], np.round(wave[heads] * 32767) / 32768.0, atol=1.0 / 32768
    )
    assert decode_audio(encode_wav_ms_adpcm(wave[:700], 8000), 8000).shape == (700,)

    # stereo: weave two mono blocks (interleaved header fields, alternating
    # nibbles) -> decode equals the channel mean
    a, b = wave[:spb], (0.25 * wave[:spb]).astype(np.float32)
    mono = [encode_wav_ms_adpcm(x, 8000, block_align=256) for x in (a, b)]
    def data_chunk(buf):
        i = buf.find(b"data")
        return buf[i + 8 : i + 8 + int.from_bytes(buf[i + 4 : i + 8], "little")]
    blk = [data_chunk(m) for m in mono]
    woven = bytearray()
    woven += bytes([blk[0][0], blk[1][0]])                    # predictors
    for f in range(3):                                        # idelta,s1,s2
        woven += blk[0][1 + 2 * f : 3 + 2 * f] + blk[1][1 + 2 * f : 3 + 2 * f]
    na, nb = blk[0][7:], blk[1][7:]
    for x, y in zip(na, nb):                                  # nibble pairs
        woven += bytes([(x & 0xF0) | (y >> 4), ((x & 0x0F) << 4) | (y & 0x0F)])
    stereo_align = 14 + 2 * len(na)
    from caffeonspark_spark.multimodal.av import _MS_COEFS
    extra = spb.to_bytes(2, "little") + (7).to_bytes(2, "little") + b"".join(
        int(c & 0xFFFF).to_bytes(2, "little") for pair in _MS_COEFS for c in pair
    )
    fmt = ((2).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + stereo_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
           + len(extra).to_bytes(2, "little") + extra)
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(woven).to_bytes(4, "little") + bytes(woven)
    stereo = b"RIFF" + len(body).to_bytes(4, "little") + body
    got_s = decode_audio(stereo, 8000)
    ga, gb = decode_audio(mono[0], 8000), decode_audio(mono[1], 8000)
    np.testing.assert_allclose(got_s, (ga + gb) / 2.0, atol=1e-7)

    # predictor index >= 7 is malformed
    bad = bytearray(payload)
    i = bytes(bad).find(b"data")
    bad[i + 8] = 9
    with _pytest.raises(ValueError):
        decode_audio(bytes(bad), 8000)
