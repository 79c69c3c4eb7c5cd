"""Audio spectral fingerprinting: planted duplicate recall over REAL WAV
bytes (re-encoded + level-scaled copies cluster; distinct clips stay
apart), level invariance as an exact property of the gradient
construction, and the shared band machinery fed from the audio side."""

from __future__ import annotations

import numpy as np

from caffeonspark_spark.multimodal.av import (
    audio_fingerprint_invariance,
    audio_spectral_fingerprint,
    audio_struct_col,
    encode_wav,
    encode_wav_pcm16,
    synthetic_tone_clip,
    wav_frame_decoder,
)
from caffeonspark_spark.multimodal.imagehash import near_dup_band_pairs

from pyspark.sql import functions as F


def _clips_df(spark, rows):
    base = spark.createDataFrame(rows, "id long, audio binary, ns int")
    return base.select(
        "id",
        audio_struct_col(F.col("audio"), F.lit(8000), F.col("ns")).alias(
            "audio_meta"
        ),
    )


def test_planted_audio_near_duplicates(spark):
    """Three well-separated chirp clips (seeds 1/3/5: pairwise fingerprint
    distance ≥ 22), each planted with a µ-law re-encode and a 0.7× gain
    copy: the copies pair with their original at Hamming ≤ 8 through the
    SHARED band machinery, and no cross-clip pair appears."""
    rows = []
    for g, seed in enumerate((1, 3, 5)):
        w = synthetic_tone_clip(seed)
        rows.append((g * 10 + 0, bytearray(encode_wav_pcm16(w, 8000)), len(w)))
        rows.append((g * 10 + 1, bytearray(encode_wav(w, 8000, g711="ulaw")), len(w)))
        rows.append(
            (g * 10 + 2, bytearray(encode_wav_pcm16(0.7 * w, 8000)), len(w))
        )
    hashed = audio_spectral_fingerprint(
        _clips_df(spark, rows), decoder=wav_frame_decoder
    )
    pairs = near_dup_band_pairs(hashed, max_hamming=8).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    for g in range(3):
        base = g * 10
        assert (base, base + 1) in got, f"mu-law re-encode of clip {g} missed"
        assert (base, base + 2) in got, f"gain copy of clip {g} missed"
    for pa, pb in got:
        assert pa // 10 == pb // 10, f"cross-clip false pair ({pa}, {pb})"


def test_gain_invariance_is_exact(spark):
    """A constant gain adds a constant to every log-mel cell; the temporal
    gradient cancels it, so the fingerprint is BIT-IDENTICAL (not merely
    close) under level scaling."""
    w = synthetic_tone_clip(2)
    rows = [
        (0, bytearray(encode_wav_pcm16(w, 8000)), len(w)),
        (1, bytearray(encode_wav_pcm16(0.5 * w, 8000)), len(w)),
        (2, bytearray(encode_wav_pcm16(0.9 * w, 8000)), len(w)),
    ]
    out = {
        r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in audio_spectral_fingerprint(
            _clips_df(spark, rows), decoder=wav_frame_decoder
        ).collect()
    }
    assert out[0] == out[1] == out[2]


def test_invariance_query_contract(spark, sf_smoke):
    """The declared consistency query: one row, clip count = document
    count, boolean TRUE — the exact shape its oracle asserts."""
    rows = audio_fingerprint_invariance(spark, sf_smoke).collect()
    assert len(rows) == 1
    assert rows[0]["encode_invariant"] is True
    assert rows[0]["n_clips"] > 0


def test_fingerprint_bands_are_16bit(spark):
    """Band columns stay in [0, 65535] — the layout contract the shared
    pair machinery (and any future persisted hash table schema) relies
    on."""
    rows = [
        (i, bytearray(encode_wav_pcm16(synthetic_tone_clip(i), 8000)), 1400)
        for i in range(6)
    ]
    out = audio_spectral_fingerprint(
        _clips_df(spark, rows), decoder=wav_frame_decoder
    ).collect()
    assert len(out) == 6
    for r in out:
        for k in range(4):
            assert 0 <= r[f"b{k}"] <= 0xFFFF
