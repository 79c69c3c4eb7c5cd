"""Property tests for the round-10 operators: each checked against an
independent NumPy/pure-Python reference over randomized inputs, the same
discipline as test_properties.py (Spark plan vs hand-rolled oracle, not
Spark vs itself)."""

from __future__ import annotations

import datetime

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_COORD = st.integers(min_value=-4, max_value=4)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.lists(_COORD, min_size=3, max_size=3), st.integers(0, 2)),
        min_size=2,
        max_size=12,
    )
)
def test_hard_negatives_match_numpy(spark, pts):
    """The mined (positive, negative) per anchor equals a brute-force NumPy
    argmax over cosine similarity with the same self-exclusion, label split,
    and (sim desc, id asc) tie-break."""
    from caffeonspark_spark.operators.similarity import hard_negative_mining

    rows = [
        (i, [float(x) for x in vec], int(lbl)) for i, (vec, lbl) in enumerate(pts)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        r["anchor_id"]: r
        for r in hard_negative_mining(emb, emb.where(F.col("vec_id") == 0)).collect()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return None
        return float(np.dot(a, b) / (na * nb))

    a_vec = np.array(rows[0][1])
    a_lbl = rows[0][2]
    if np.linalg.norm(a_vec) == 0:
        # zero-norm anchor: every sim is NULL, no row survives
        assert out == {}
        return
    best = {True: None, False: None}  # same-label -> ((-sim, id), id, sim)
    for i, vec, lbl in rows[1:]:
        s = cos(a_vec, np.array(vec))
        if s is None:
            continue
        key = ((-s), i)
        same = lbl == a_lbl
        if best[same] is None or key < best[same][0]:
            best[same] = (key, i, s)
    if best[True] is None and best[False] is None:
        assert out == {}
        return
    r = out[0]
    for same, (pid_col, sim_col) in {
        True: ("positive_id", "pos_sim"),
        False: ("negative_id", "neg_sim"),
    }.items():
        if best[same] is None:
            assert r[pid_col] is None and r[sim_col] is None
        else:
            assert r[pid_col] == best[same][1]
            assert abs(r[sim_col] - best[same][2]) < 1e-6


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False), min_size=24, max_size=60
    ),
    st.integers(min_value=2, max_value=30),
)
def test_zscore_matches_numpy(spark, values, n_small):
    """The anomaly SET and z values match a NumPy trailing-window reference
    (same n, same sample-variance formula, same threshold)."""
    from caffeonspark_spark.operators.temporal import rolling_zscore_anomaly

    rows = [
        (i + 1, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i), 1, "m", float(round(v, 3)))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )
    out = {r["event_id"]: r["zscore"] for r in rolling_zscore_anomaly(df, n=24).collect()}

    vals = np.array([r[4] for r in rows])
    expect = {}
    for i in range(23, len(vals)):
        frame = vals[i - 23 : i + 1]
        var = frame.var(ddof=1)
        if var <= 0:
            continue
        z = (vals[i] - frame.mean()) / np.sqrt(var)
        if abs(z) > 2.0:
            expect[i + 1] = z
    assert set(out) == set(expect)
    for k, z in expect.items():
        assert abs(out[k] - z) < 1e-6


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=4),
)
def test_event_sequences_match_python(spark, types, ctx_len):
    """Emitted (context, target) pairs equal a pure-Python sliding window
    over the ts-ordered per-user stream, for any context length."""
    from caffeonspark_spark.operators.temporal import event_sequence_examples

    names = ["a", "b", "c", "d", "e"]
    rows = [
        (i + 1, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i), 7, names[t], 1.0)
        for i, t in enumerate(types)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )
    out = sorted(
        (r["event_id"], r["context"], r["target"])
        for r in event_sequence_examples(df, context_len=ctx_len).collect()
    )
    seq = [names[t] for t in types]
    expect = sorted(
        (i + 1, "|".join(seq[i - ctx_len : i]), seq[i])
        for i in range(ctx_len, len(seq))
    )
    assert out == expect


@given(
    st.integers(min_value=4, max_value=10_000),
    st.binary(min_size=1, max_size=24),
    st.sampled_from(["pcm16", "float32", "ulaw", "alaw", "adpcm", "ms_adpcm"]),
)
@settings(max_examples=100, deadline=None)
def test_wav_decoder_total_on_mutated_streams(offset, junk, fmt):
    """Totality for the whole codec-free WAV matrix (PCM, float, G.711,
    IMA ADPCM): any byte mutation after the RIFF magic either decodes or
    raises ValueError — never an unbounded loop, overflow, or foreign
    exception (the PNG/JPEG/BMP decode-tier contract applied to audio)."""
    from caffeonspark_spark.multimodal.av import (
        decode_audio,
        encode_wav,
        encode_wav_ima_adpcm,
    )

    t = np.arange(600, dtype=np.float32) / 8000.0
    wave = (0.6 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    if fmt == "adpcm":
        base = encode_wav_ima_adpcm(wave, 8000)
    elif fmt == "ms_adpcm":
        from caffeonspark_spark.multimodal.av import encode_wav_ms_adpcm

        base = encode_wav_ms_adpcm(wave, 8000)
    elif fmt in ("ulaw", "alaw"):
        base = encode_wav(wave, 8000, g711=fmt)
    elif fmt == "float32":
        base = encode_wav(wave, 8000, bits=32, float_fmt=True)
    else:
        base = encode_wav(wave, 8000, bits=16)
    pos = 4 + (offset % (len(base) - 4))
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        decode_audio(mutated, 0)
    except (ValueError, NotImplementedError):
        pass


@given(
    st.integers(min_value=4, max_value=10_000),
    st.binary(min_size=1, max_size=24),
    st.sampled_from([1, 5, 32773]),
)
@settings(max_examples=100, deadline=None)
def test_tiff_decoder_total_on_mutated_streams(offset, junk, comp):
    """Totality for the TIFF tier: mutations after the byte-order magic
    either decode or raise ValueError — IFD walks, strip tables, PackBits
    runs, and LZW code streams are all bounds-checked."""
    from caffeonspark_spark.multimodal.tiff import decode_tiff
    from tests.tiff_fixture import encode_tiff

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    base = encode_tiff(img, compression=comp, rows_per_strip=2)
    pos = 4 + (offset % (len(base) - 4))
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        decode_tiff(mutated)
    except ValueError:
        pass


@given(
    st.integers(min_value=2, max_value=10_000),
    st.binary(min_size=1, max_size=24),
    st.sampled_from([b"1", b"2", b"3", b"4"]),
)
@settings(max_examples=80, deadline=None)
def test_netpbm_plain_decoder_total_on_mutated_streams(offset, junk, kind):
    """Totality for the plain/ASCII netpbm variants and P4: mutated
    headers/rasters decode or raise ValueError (int() parses of arbitrary
    token bytes are wrapped, bit counts bounds-checked)."""
    from caffeonspark_spark.multimodal.columns import _numpy_decode

    rng = np.random.default_rng(13)
    if kind == b"1":
        bits = rng.integers(0, 2, (4, 11), dtype=np.uint8)
        base = b"P1\n11 4\n" + b"".join(str(v).encode() for v in bits.flatten())
    elif kind == b"4":
        bits = rng.integers(0, 2, (4, 11), dtype=np.uint8)
        base = b"P4\n11 4\n" + np.packbits(bits, axis=1).tobytes()
    else:
        c = 3 if kind == b"3" else 1
        px = rng.integers(0, 256, 4 * 5 * c, dtype=np.uint8)
        base = (
            b"P" + kind + b" 5 4 255\n"
            + b" ".join(str(v).encode() for v in px)
        )
    pos = 2 + (offset % (len(base) - 2))
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        _numpy_decode(mutated, 1)
    except ValueError:
        pass
