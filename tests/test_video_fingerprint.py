"""Video near-dup fingerprinting: uniform frame sampling → per-frame dHash
(composed from the image tier) → per-position band matching with a
min-matching-frames gate. The decode seam stays the deterministic fake
(no video codec in this container); the Spark-side plumbing, hash
composition, and pair semantics are real and pinned here."""

from __future__ import annotations

import numpy as np
import pytest

from caffeonspark_spark.multimodal.av import (
    fake_decode_video,
    near_dup_video_pairs,
    video_frame_hashes,
    video_sample_frames,
)

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _smooth_clip(seed: int, n_frames: int = 8, h: int = 32, w: int = 32) -> bytes:
    """Deterministic smooth grayscale clip (per-frame oriented gradients)
    serialized as the raw frame-major bytes the fake decoder tiles back."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    frames = []
    for t in range(n_frames):
        a, b = rng.uniform(2.0, 8.0), rng.uniform(2.0, 8.0)
        img = 128 + 70 * np.sin((a * yy + b * xx) / max(h, w) + t * 0.7)
        # blobs break monotony: a pure low-frequency ramp makes every
        # gradient row single-signed (an all-zero dHash), and two such
        # frames from DIFFERENT clips collide at (0,0,0,0)
        for _ in range(3):
            cy, cx = rng.uniform(0, h), rng.uniform(0, w)
            r, amp = rng.uniform(3, 9), rng.uniform(-80, 80)
            img += amp * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)))
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return np.stack(frames)[..., None].tobytes()


def _videos_df(spark, rows, n_frames=8, h=32, w=32):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("video", T.BinaryType()),
        ]
    )
    base = spark.createDataFrame(rows, schema)
    return base.select(
        "id",
        F.struct(
            F.col("video").alias("video"),
            F.lit(n_frames).cast("int").alias("n_frames"),
            F.lit(h).cast("int").alias("height"),
            F.lit(w).cast("int").alias("width"),
        ).alias("video_meta"),
    )


def test_planted_video_near_duplicates(spark):
    """An exact copy matches at every sampled position; a one-frame-edited
    copy still matches at the untouched positions (≥ min_frames); a
    different clip never pairs."""
    a = bytearray(_smooth_clip(1))
    # edit ONE frame's region: frames are 1024 bytes each (32x32x1); the
    # fake decoder tiles bytes in order, so frame 0 = bytes [0, 1024)
    edited = bytearray(a)
    edited[0:1024] = bytes(reversed(edited[0:1024]))
    rows = [
        (0, a),
        (1, bytearray(a)),  # exact copy
        (2, edited),  # frame-0 edit
        (10, bytearray(_smooth_clip(9))),  # unrelated
    ]
    frames = video_sample_frames(_videos_df(spark, rows), k=4)
    hashed = video_frame_hashes(frames)
    pairs = {
        (r["id_a"], r["id_b"]): r["n_frames_matched"]
        for r in near_dup_video_pairs(hashed, min_frames=3).collect()
    }
    assert pairs[(0, 1)] == 4  # exact copy: all sampled positions
    assert pairs[(1, 2)] >= 3 and pairs[(0, 2)] >= 3  # edit: ≥3 positions
    assert all(10 not in p for p in pairs), pairs


def test_min_frames_gate(spark):
    """The SAME pair falls out when min_frames exceeds its matching
    positions — the gate is the knob between 'shares a frame' and
    'is the same video'."""
    a = bytearray(_smooth_clip(2))
    edited = bytearray(a)
    # edit frames 0 and 2 (sampled positions with k=4 over 8 frames are
    # 0, 2, 4, 7 — two of four positions perturbed)
    for f0 in (0, 2):
        s = slice(f0 * 1024, (f0 + 1) * 1024)
        edited[s] = bytes(reversed(edited[s]))
    rows = [(0, a), (1, edited)]
    frames = video_sample_frames(_videos_df(spark, rows), k=4)
    hashed = video_frame_hashes(frames)
    at2 = near_dup_video_pairs(hashed, min_frames=2).collect()
    at3 = near_dup_video_pairs(hashed, min_frames=3).collect()
    assert [(r["id_a"], r["id_b"]) for r in at2] == [(0, 1)]
    assert at3 == []


def test_position_keyed_buckets(spark):
    """Two clips sharing one identical frame at DIFFERENT sampled
    positions never become candidates — the frame_idx key is part of the
    bucket, by design."""
    common = np.full((32, 32, 1), 200, np.uint8)
    # clip A has `common` at position 0; clip B has it at position 7
    fa = np.frombuffer(_smooth_clip(3), np.uint8).reshape(8, 32, 32, 1).copy()
    fb = np.frombuffer(_smooth_clip(4), np.uint8).reshape(8, 32, 32, 1).copy()
    fa[0] = common
    fb[7] = common
    rows = [(0, bytearray(fa.tobytes())), (1, bytearray(fb.tobytes()))]
    frames = video_sample_frames(_videos_df(spark, rows), k=4)
    hashed = video_frame_hashes(frames)
    assert near_dup_video_pairs(hashed, min_frames=1).collect() == []


def test_frame_bytes_dims_contract(spark):
    """A frame whose byte length disagrees with its declared dims raises
    (the real-decoder seam's contract), instead of silently mis-reshaping."""
    rows = [(0, bytearray(b"\x00" * 100))]
    df = spark.createDataFrame(
        rows, "id long, frame binary"
    ).select(
        "id",
        F.lit(0).cast("int").alias("frame_idx"),
        "frame",
        F.lit(32).cast("int").alias("height"),
        F.lit(32).cast("int").alias("width"),
    )
    with pytest.raises(Exception, match="frame byte length"):
        video_frame_hashes(df).collect()


def test_fake_decoder_seam_roundtrip():
    """The deterministic fake decoder reproduces the exact frames the
    fixture serialized (byte-tiling identity when sizes agree) — the
    assumption the planted-duplicate tests rest on."""
    data = _smooth_clip(5)
    clip = fake_decode_video(data, 8, 32, 32)
    np.testing.assert_array_equal(
        clip, np.frombuffer(data, np.uint8).reshape(8, 32, 32, 1)
    )


def test_frame_hash_table_persisted_once(spark):
    """The (id, fi, b0..b3) hash table feeds FIVE subtrees of the pair
    plan (hot-cap agg, both candidate sides, both Hamming sides); it must
    be persisted (InMemoryRelation) so the decode->hash mapInPandas pass
    runs once — the same memo ``near_dup_band_pairs`` pins for images."""
    from caffeonspark_spark.plans.inspect import physical_plan

    rows = [(i, bytearray(_smooth_clip(i))) for i in range(3)]
    frames = video_sample_frames(_videos_df(spark, rows), k=4)
    hashed = video_frame_hashes(frames)
    plan = physical_plan(near_dup_video_pairs(hashed))
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_video_dedup_map_total_composition(spark):
    """The clip-level canonical map: byte-identical hash SEQUENCES
    collapse in the exact pass, a 1-bit-perturbed near copy merges
    through the position-keyed pair phase, an unrelated clip keeps
    itself, and the map is TOTAL over clips with frames."""
    from caffeonspark_spark.multimodal.av import video_dedup_map

    rng = np.random.default_rng(7)
    def clip_hashes(cid, base, flip_bit=None):
        rows = []
        for fi in range(4):
            b = list(base[fi])
            if flip_bit is not None and fi == flip_bit:
                b[0] ^= 1  # one bit in one position's band 0
            rows.append((cid, fi, *b))
        return rows

    def rand_bands():
        return [tuple(int(x) for x in rng.integers(0, 65536, 4)) for _ in range(4)]

    fam_a, fam_b = rand_bands(), rand_bands()
    rows = []
    rows += clip_hashes(0, fam_a)            # exact family {0,1}
    rows += clip_hashes(1, fam_a)
    rows += clip_hashes(2, fam_a, flip_bit=2)  # near copy of family A
    rows += clip_hashes(10, fam_b)           # unrelated singleton
    df = spark.createDataFrame(
        rows, "id long, frame_idx int, b0 long, b1 long, b2 long, b3 long"
    )
    got = {r["id"]: r["keep_id"] for r in video_dedup_map(df).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10}
