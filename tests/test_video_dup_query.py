"""Declared video near-dup queries: oracle parity of the portable twin,
native/portable bit-equality, and planted re-encoded-clip recall through
the PRODUCTION path (sample → hash → position-keyed pairs). Completes the
modality matrix — text/image/audio/video each with an oracle-checked
dedup row (VERDICT r11 next-round #4)."""

from __future__ import annotations

import numpy as np

from caffeonspark_spark.multimodal.av import (
    ORACLE_VIDEO_DUP_PAIRS,
    near_dup_video_pairs,
    video_dup_native_consistency,
    video_dup_pairs_render,
    video_dup_pairs_portable,
    video_frame_hashes,
    video_sample_frames,
)
from pyspark.sql import functions as F
from pyspark.sql import types as T
from tests.oracle_check import compare


def test_portable_pairs_match_oracle(spark, sf_smoke):
    ok, msg = compare(
        video_dup_pairs_portable(spark, sf_smoke),
        ORACLE_VIDEO_DUP_PAIRS,
        sf_smoke,
    )
    assert ok, msg


def test_native_consistency_row(spark, sf_smoke):
    rows = video_dup_native_consistency(spark, sf_smoke).collect()
    assert len(rows) == 1
    assert rows[0]["pairs_identical"] is True
    assert rows[0]["n_pairs"] > 0  # vacuous equality would prove nothing


def test_native_pair_set_bit_equal(spark, sf_smoke):
    por = {
        (r["id_a"], r["id_b"]): r["n_frames_matched"]
        for r in video_dup_pairs_portable(spark, sf_smoke).collect()
    }
    nat = {
        (r["id_a"], r["id_b"]): r["n_frames_matched"]
        for r in video_dup_pairs_render(spark, sf_smoke).collect()
    }
    assert por == nat and len(por) > 0
    # the matched-frame gate produces a graded spectrum, not just exact
    # clones: at least two distinct n_frames_matched values at sf0.001
    assert len(set(por.values())) >= 2, sorted(set(por.values()))


def _scene_clip(seed: int, n_frames: int = 8, h: int = 32, w: int = 32) -> np.ndarray:
    """Smooth per-frame scenes (oriented gradients + blobs — perceptual
    hashes need structure; uniform noise has none)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    frames = []
    for t in range(n_frames):
        a, b = rng.uniform(2.0, 8.0), rng.uniform(2.0, 8.0)
        img = 128 + 70 * np.sin((a * yy + b * xx) / max(h, w) + t * 0.9)
        for _ in range(3):
            cy, cx = rng.uniform(0, h), rng.uniform(0, w)
            r, amp = rng.uniform(3, 9), rng.uniform(-80, 80)
            img += amp * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)))
        frames.append(np.clip(img, 0, 255))
    return np.stack(frames)[..., None]


def test_planted_reencoded_clip_pairs(spark):
    """A 're-encoded' copy — uniform brightness lift + mild deterministic
    quantization noise, the dHash-invariant distortions a transcode
    introduces — still pairs with its original at every sampled position;
    an unrelated clip never pairs."""
    orig = _scene_clip(7)
    rng = np.random.default_rng(123)
    reenc = np.clip(
        orig.astype(np.float64) + 9.0 + rng.uniform(-2.0, 2.0, orig.shape), 0, 255
    ).astype(np.uint8)
    rows = [
        (0, bytearray(orig.astype(np.uint8).tobytes())),
        (1, bytearray(reenc.tobytes())),
        (9, bytearray(_scene_clip(8).astype(np.uint8).tobytes())),
    ]
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("video", T.BinaryType())]
    )
    meta = spark.createDataFrame(rows, schema).select(
        "id",
        F.struct(
            F.col("video").alias("video"),
            F.lit(8).cast("int").alias("n_frames"),
            F.lit(32).cast("int").alias("height"),
            F.lit(32).cast("int").alias("width"),
        ).alias("video_meta"),
    )
    hashed = video_frame_hashes(video_sample_frames(meta, k=4))
    pairs = {
        (r["id_a"], r["id_b"]): r["n_frames_matched"]
        for r in near_dup_video_pairs(hashed, min_frames=3).collect()
    }
    assert pairs.get((0, 1)) == 4, pairs
    assert all(9 not in p for p in pairs), pairs


def test_video_dup_clusters_match_oracle(spark, sf_smoke):
    from caffeonspark_spark.multimodal.av import (
        ORACLE_VIDEO_DUP_CLUSTERS,
        video_dup_clusters,
    )

    ok, msg = compare(
        video_dup_clusters(spark, sf_smoke), ORACLE_VIDEO_DUP_CLUSTERS, sf_smoke
    )
    assert ok, msg


def test_video_pairs_through_dup_matrix(spark, sf_smoke):
    """The duplication matrix is pair-source-agnostic: the VIDEO pair
    table drops into ``dup_matrix_from_pairs`` unchanged, and the matrix
    counts exactly the pair multiset grouped by unordered source pair."""
    from caffeonspark_spark.catalog import load_table
    from caffeonspark_spark.operators.dedup import dup_matrix_from_pairs

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "source")
    pairs = video_dup_pairs_portable(spark, sf_smoke)
    got = {
        (r["source_a"], r["source_b"]): r["n_dup_pairs"]
        for r in dup_matrix_from_pairs(pairs, docs).collect()
    }
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    expect: dict = {}
    for r in pairs.collect():
        k = tuple(sorted((src[r["id_a"]], src[r["id_b"]])))
        expect[k] = expect.get(k, 0) + 1
    assert got == expect and sum(got.values()) > 0


def test_video_dedup_map_query_matches_oracle(spark, sf_smoke):
    """r13 declared query: the composed clip dedup map matches the DuckDB
    three-stage twin (exact sequence grouping, survivor-only banding,
    recursive-CTE components) cell-for-cell at smoke scale."""
    from caffeonspark_spark.multimodal.av import (
        ORACLE_VIDEO_DEDUP_MAP,
        video_dedup_map_query,
    )

    ok, msg = compare(
        video_dedup_map_query(spark, sf_smoke),
        ORACLE_VIDEO_DEDUP_MAP,
        sf_smoke,
    )
    assert ok, msg


def test_video_native_planted_families_match_combinatorics(spark, sf_smoke):
    """r13: the planted-family native clip query's pair set EQUALS the
    family combinatorics through the real clip decode path — all four
    positions of every contrast-scaled copy hash identically (recall)
    and no cross-family pair matches even one position at Hamming <= 2
    (precision; measured min cross per-position distance 15 here)."""
    from caffeonspark_spark.catalog import table_nrows
    from caffeonspark_spark.multimodal.av import (
        _V_NAT_FAMILY,
        video_dup_pairs_native,
    )

    got = {
        (r["id_a"], r["id_b"])
        for r in video_dup_pairs_native(spark, sf_smoke).collect()
    }
    n = table_nrows(sf_smoke, "documents")
    want = {
        (a, b)
        for base in range(0, n, _V_NAT_FAMILY)
        for a in range(base, min(base + _V_NAT_FAMILY, n))
        for b in range(a + 1, min(base + _V_NAT_FAMILY, n))
    }
    assert got == want and len(want) > 0, (len(got), len(want))


def test_third_party_decoder_through_pair_pipeline(spark):
    """r13: a caller-supplied third-party decoder drives the FULL pair
    pipeline (container bytes -> sample -> per-frame hash -> position-keyed
    banded pairs). The toy container (magic 'MYV1' + int32 (nf,h,w) header
    + raw payload — the byte shape a PyAV/ffmpeg wrapper parses) has a
    16-byte header that would corrupt every frame under the default
    raw-layout decoder, so the correct planted pairing also proves the
    callable seam is honored end-to-end. The adapter is defined inside the
    test so cloudpickle ships it by value (a real third-party wrapper
    would live in an importable package on the executors)."""
    from caffeonspark_spark.multimodal.av import (
        near_dup_video_pairs,
        video_frame_hashes,
        video_sample_frames,
        video_struct_col,
    )

    def encode(clip: np.ndarray) -> bytes:
        nf, h, w = clip.shape[:3]
        return b"MYV1" + np.array([nf, h, w], dtype=np.int32).tobytes() + clip.tobytes()

    def stub_decoder(data: bytes, n_frames: int, height: int, width: int) -> np.ndarray:
        import numpy as _np

        assert data[:4] == b"MYV1", "not a MYV1 container"
        nf, h, w = _np.frombuffer(data[4:16], dtype=_np.int32)
        return _np.frombuffer(data[16:], dtype=_np.uint8).reshape(
            int(nf), int(h), int(w), 1
        )

    rows = []
    for fam in (0, 4):
        rng = np.random.default_rng(fam)
        base = rng.integers(0, 64, (4, 8, 9))
        for m, scale in enumerate((1, 2, 3, 4)):
            frames = np.repeat(
                np.repeat((base * scale).astype(np.uint8), 4, 1), 4, 2
            )[..., None]
            rows.append((fam + m, bytearray(encode(frames))))
    df = spark.createDataFrame(rows, "id long, video binary")
    meta = df.select(
        "id",
        video_struct_col(
            F.col("video"), F.lit(4), F.lit(32), F.lit(36)
        ).alias("video_meta"),
    )
    pairs = near_dup_video_pairs(
        video_frame_hashes(video_sample_frames(meta, k=4, decoder=stub_decoder)),
        max_hamming=2,
        min_frames=3,
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    want = {(a, b) for fam in (0, 4) for a in range(fam, fam + 4) for b in range(a + 1, fam + 4)}
    assert got == want, (got, want)


def test_declared_native_honors_decoder_seam(spark, sf_smoke):
    """The declared query's ``decoder=`` parameter must actually reach the
    decode stage: a sabotage decoder returning all-zero frames makes every
    clip identical, the all-identical bands trip the hot-band cap, and the
    pair set collapses to empty — impossible if the default path ran."""
    from caffeonspark_spark.multimodal.av import video_dup_pairs_native

    def zeros(data, n_frames, height, width):
        return np.zeros((n_frames, height, width, 1), dtype=np.uint8)

    assert video_dup_pairs_native(spark, sf_smoke, decoder=zeros).count() == 0


def test_video_dedup_against_corpus_query_matches_oracle(spark, sf_smoke):
    """r13 declared query: the bipartite batch-vs-corpus clip pair set
    matches the DuckDB twin cell-for-cell (corpus-side per-position hot
    cap, cross-side candidates only, clip gate)."""
    from caffeonspark_spark.multimodal.av import (
        ORACLE_VIDEO_DEDUP_AGAINST_CORPUS,
        video_dedup_against_corpus_query,
    )

    ok, msg = compare(
        video_dedup_against_corpus_query(spark, sf_smoke),
        ORACLE_VIDEO_DEDUP_AGAINST_CORPUS,
        sf_smoke,
    )
    assert ok, msg


def test_video_corpus_dedup_strictly_cross_side(spark):
    """Operator semantics: a batch containing a contrast-scaled copy of a
    corpus clip pairs with EXACTLY that corpus clip; the batch's internal
    duplicate pair and the corpus's internal structure never appear."""
    from caffeonspark_spark.multimodal.av import video_dedup_against_corpus
    from caffeonspark_spark.multimodal.imagehash import planted_family_matrix

    def frames_rows(ids_scenes):
        rows = []
        for rid, (scene_seed, scale) in ids_scenes.items():
            base = planted_family_matrix(scene_seed, (4, 8, 9))
            clip = (base.astype(np.int64) * scale).astype(np.uint8)
            for fi in range(4):
                from caffeonspark_spark.multimodal.imagehash import dhash_bands

                b = dhash_bands(clip[fi])
                rows.append((rid, fi, b[0], b[1], b[2], b[3]))
        return spark.createDataFrame(
            rows, "id long, frame_idx int, b0 long, b1 long, b2 long, b3 long"
        )

    # corpus: three distinct scenes; batch: a 2x-contrast copy of corpus
    # clip 101's scene, its exact twin, and a fresh scene
    corpus = frames_rows({100: (0, 1), 101: (4, 1), 102: (8, 1)})
    batch = frames_rows({0: (4, 2), 1: (4, 2), 2: (12, 1)})
    pairs = {
        (r["new_id"], r["ref_id"])
        for r in video_dedup_against_corpus(
            batch, corpus, max_hamming=2, min_frames=3
        ).collect()
    }
    assert pairs == {(0, 101), (1, 101)}, pairs
