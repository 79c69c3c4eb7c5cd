"""Randomized property check of the video near-dup pair machinery: for
arbitrary small corpora (tiny alphabet → forced band collisions, lengths
spanning empty → multi-frame), the distributed position-keyed pipeline
(band explode, per-position hot cap, bucket join, Hamming, clip gate)
must equal an INDEPENDENT brute-force Python evaluation — a third
implementation besides the Spark plan and the DuckDB oracle, covering
corpus shapes the fixed testdata never takes (all-identical docs, docs
shorter than one frame, cap-saturated buckets via max_band_df=3)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from caffeonspark_spark.multimodal.av import (
    _V_CHUNK,
    _V_FRAMES,
    _V_STRIDE,
    near_dup_video_pairs,
)
from caffeonspark_spark.multimodal.imagehash import _FP_MOD
from pyspark.sql import functions as F

MAX_BAND_DF = 3  # small cap so random corpora actually saturate buckets
MIN_FRAMES = 2
MAX_HAMMING = 8


def _fold(chunk: str) -> int:
    if not chunk:
        return 0
    r = 0
    for ch in chunk:
        r = (r * 31 + ord(ch)) % _FP_MOD
    return r


def _frame_bands(text: str, fi: int) -> list[int]:
    rows = [
        _fold(text[fi * _V_STRIDE + i * _V_CHUNK : fi * _V_STRIDE + (i + 1) * _V_CHUNK])
        for i in range(8)
    ]
    pix = lambda r, i, j: (r * (j + 1) + i) % 256  # noqa: E731
    bands = []
    for k in range(4):
        total = 0
        for t in range(16):
            i, j = 2 * k + t // 8, t % 8
            if pix(rows[i], i, j) < pix(rows[i], i, j + 1):
                total += 1 << t
        bands.append(total)
    return bands


def _brute_pairs(texts: list[str]) -> dict[tuple[int, int], int]:
    bands = {
        (d, fi): _frame_bands(t, fi)
        for d, t in enumerate(texts)
        for fi in range(_V_FRAMES)
    }
    # per-position hot cap on (fi, k, band) document frequency
    df: dict[tuple[int, int, int], int] = {}
    for (d, fi), bs in bands.items():
        for k, b in enumerate(bs):
            df[(fi, k, b)] = df.get((fi, k, b), 0) + 1
    cand = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            for fi in range(_V_FRAMES):
                if any(
                    bands[(a, fi)][k] == bands[(b, fi)][k]
                    and df[(fi, k, bands[(a, fi)][k])] <= MAX_BAND_DF
                    for k in range(4)
                ):
                    cand.add((a, b, fi))
    matched: dict[tuple[int, int], int] = {}
    for a, b, fi in cand:
        ham = sum(
            bin(bands[(a, fi)][k] ^ bands[(b, fi)][k]).count("1") for k in range(4)
        )
        if ham <= MAX_HAMMING:
            matched[(a, b)] = matched.get((a, b), 0) + 1
    return {p: n for p, n in matched.items() if n >= MIN_FRAMES}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="abX ", min_size=0, max_size=300),
        min_size=2,
        max_size=9,
    )
)
def test_video_pair_machinery_matches_brute_force(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    frames = docs.select(
        F.col("doc_id").alias("id"),
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(_V_FRAMES - 1))).alias("fi"),
    )
    chunked = frames.select(
        "id",
        "fi",
        *[
            F.col("text")
            .substr(
                F.col("fi") * F.lit(_V_STRIDE) + F.lit(i * _V_CHUNK + 1),
                F.lit(_V_CHUNK),
            )
            .alias(f"c{i}")
            for i in range(8)
        ],
    )
    from caffeonspark_spark.multimodal.imagehash import (
        _chunk_fold,
        portable_image_bands,
    )

    seeded = chunked.select(
        "id", "fi", *[_chunk_fold(F.col(f"c{i}")).alias(f"r{i}") for i in range(8)]
    )
    hashed = seeded.select(
        "id",
        F.col("fi").cast("int").alias("fi"),
        *portable_image_bands([f"r{i}" for i in range(8)]),
    )
    got = {
        (r["id_a"], r["id_b"]): r["n_frames_matched"]
        for r in near_dup_video_pairs(
            hashed,
            frame_col="fi",
            max_hamming=MAX_HAMMING,
            max_band_df=MAX_BAND_DF,
            min_frames=MIN_FRAMES,
        ).collect()
    }
    assert got == _brute_pairs(texts)
