"""Declared audio near-dup family: the portable temporal-gradient
fingerprint against a pure-Python mirror, edit locality of the window
geometry, planted gain-family recall through the PRODUCTION path, and
cluster composition vs plain union-find."""

from __future__ import annotations

import numpy as np

from caffeonspark_spark.multimodal.av import (
    _A_CHUNK,
    _A_GAINS,
    _A_STRIDE,
    _A_WINDOWS,
    _portable_audio_bands,
    audio_dup_clusters,
    audio_dup_pairs_portable,
    audio_spectral_fingerprint,
    audio_struct_col,
    encode_wav_pcm16,
    synthetic_rich_clip,
    wav_frame_decoder,
)
from caffeonspark_spark.multimodal.imagehash import _FP_MOD, near_dup_band_pairs

from pyspark.sql import functions as F


def _mirror_bands(text: str) -> tuple[int, int, int, int]:
    """Pure-Python mirror of the portable construction (and of the DuckDB
    oracle CTEs): char-fold seeds over 16-char windows at stride 32, cell
    (r_t*(j+1) + t) mod 256, bit = cell(t+1) > cell(t), production weight
    layout j + (t mod 2)*8 with band k packing rows 2k, 2k+1."""
    t_ = text or ""
    rs = []
    for t in range(_A_WINDOWS):
        r = 0
        for ch in t_[t * _A_STRIDE : t * _A_STRIDE + _A_CHUNK]:
            r = (r * 31 + ord(ch)) % _FP_MOD
        rs.append(r)
    cells = [[(rs[t] * (j + 1) + t) % 256 for j in range(8)] for t in range(_A_WINDOWS)]
    bands = []
    for k in range(4):
        total = 0
        for t in (2 * k, 2 * k + 1):
            for j in range(8):
                if cells[t + 1][j] > cells[t][j]:
                    total += 1 << (j + (t % 2) * 8)
        bands.append(total)
    return tuple(bands)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_portable_bands_match_python_mirror(spark):
    """The Spark expression tree and the Python/DuckDB-mirror arithmetic
    agree band-for-band — including empty and short texts (fold 0 seeds)."""
    texts = [
        "",
        "a",
        "key agg row scan slow fast table value part hash " * 8,
        "x" * (_A_WINDOWS * _A_STRIDE + 40),
        "the quick brown fox jumps over the lazy dog " * 7,
    ]
    got = {
        r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in _portable_audio_bands(_docs_df(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _mirror_bands(t), f"doc {i} diverged"
        for b in got[i]:
            assert 0 <= b <= 0xFFFF  # the 16-bit band contract


def test_portable_bands_random_sweep_triangle(spark):
    """Triangle closure over 200 seeded random ASCII texts (lengths 0-400,
    words/punctuation/digits), batched into ONE Spark job: Spark expression
    tree == Python mirror == the DuckDB oracle CTE arithmetic. The declared
    query's rehearsal proves Spark==DuckDB on the real corpus; this pins
    all three on adversarial lengths (window-boundary partials, empties)."""
    import duckdb
    import numpy as np

    rng = np.random.default_rng(42)
    alphabet = list("abcdefghij KLMNO.,;:0123456789 ")
    texts = [
        "".join(rng.choice(alphabet, size=int(n)))
        for n in rng.integers(0, 401, size=200)
    ]
    got = {
        r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in _portable_audio_bands(_docs_df(spark, texts)).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame(
            {"doc_id": range(len(texts)), "text": texts}
        ),
    )
    from caffeonspark_spark.multimodal.av import _AUDIO_PAIR_CTES

    duck = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]), int(r[4]))
        for r in con.sql(
            "WITH " + _AUDIO_PAIR_CTES + """
            SELECT doc_id,
                   MAX(CASE WHEN k=0 THEN band END) AS b0,
                   MAX(CASE WHEN k=1 THEN band END) AS b1,
                   MAX(CASE WHEN k=2 THEN band END) AS b2,
                   MAX(CASE WHEN k=3 THEN band END) AS b3
            FROM abands GROUP BY doc_id"""
        ).fetchall()
    }
    for i, t in enumerate(texts):
        mirror = _mirror_bands(t)
        assert got[i] == mirror, f"spark vs python diverged on doc {i}"
        assert duck[i] == mirror, f"duckdb vs python diverged on doc {i}"


def test_edit_locality_of_window_geometry(spark):
    """A single-char edit inside ONE window perturbs at most the two
    gradient rows that read it (≤ 2 bands, ≤ 16 bits); identical texts
    hash identically. The property that turns shared-prefix families into
    a graded Hamming spectrum."""
    base = "abcdefghijklmnop" * 20  # 320 chars, covers all 9 windows
    # edit inside window 4 only (stride 32, chunk 16: chars 128..143)
    edited = base[:130] + "Z" + base[131:]
    rows = {
        r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in _portable_audio_bands(
            _docs_df(spark, [base, edited, base])
        ).collect()
    }
    assert rows[0] == rows[2]
    diff_bands = sum(1 for k in range(4) if rows[0][k] != rows[1][k])
    ham = sum(bin(rows[0][k] ^ rows[1][k]).count("1") for k in range(4))
    assert 0 < diff_bands <= 2, "edit must touch >=1 and <=2 bands"
    assert ham <= 16, "one window feeds at most 2 gradient rows (16 bits)"


def test_planted_gain_families_recall_exact(spark):
    """The native query's construction at unit scale: 3 families x 4 gain
    levels through synth -> PCM16 -> RIFF decode -> log-mel ->
    fingerprint -> band machinery at Hamming <= 2 emits EXACTLY the
    family combinatorics — recall (gain invariance of the temporal
    gradient) and precision (rich clips keep cross distance >= 6) in one
    set equality."""
    rows = []
    for fam in (0, 40, 80):
        w = synthetic_rich_clip(fam)
        for m, g in enumerate(_A_GAINS):
            enc = encode_wav_pcm16(np.float32(g) * w, 8000)
            rows.append((fam + m, bytearray(enc), len(w)))
    base = spark.createDataFrame(rows, "id long, audio binary, ns int")
    hashed = audio_spectral_fingerprint(
        base.select(
            "id",
            audio_struct_col(F.col("audio"), F.lit(8000), F.col("ns")).alias(
                "audio_meta"
            ),
        ),
        decoder=wav_frame_decoder,
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in near_dup_band_pairs(hashed, max_hamming=2).collect()
    }
    want = {
        (fam + i, fam + j)
        for fam in (0, 40, 80)
        for i in range(4)
        for j in range(i + 1, 4)
    }
    assert got == want


def test_audio_fingerprints_through_composed_dedup(spark):
    """The composed dedup map (`imagehash.image_dedup`) is modality-
    agnostic: the audio spectral fingerprint table drops straight in.
    Planted gain families (bit-identical fingerprints) collapse in the
    EXACT pass to the family min id; distinct clips survive as their own
    keep_id; the map is TOTAL (one row per input clip)."""
    from caffeonspark_spark.multimodal.imagehash import image_dedup

    rows = []
    fams = (0, 40, 80)
    for fam in fams:
        w = synthetic_rich_clip(fam)
        for m, g in enumerate(_A_GAINS):
            enc = encode_wav_pcm16(np.float32(g) * w, 8000)
            rows.append((fam + m, bytearray(enc), len(w)))
    # two singletons with their own clips
    for sid in (200, 300):
        w = synthetic_rich_clip(sid)
        rows.append((sid, bytearray(encode_wav_pcm16(w, 8000)), len(w)))
    base = spark.createDataFrame(rows, "id long, audio binary, ns int")
    fp = audio_spectral_fingerprint(
        base.select(
            "id",
            audio_struct_col(F.col("audio"), F.lit(8000), F.col("ns")).alias(
                "audio_meta"
            ),
        ),
        decoder=wav_frame_decoder,
    )
    got = {r["id"]: r["keep_id"] for r in image_dedup(fp, max_hamming=2).collect()}
    assert len(got) == len(rows), "map must be total"
    for fam in fams:
        for m in range(4):
            assert got[fam + m] == fam, f"clip {fam + m} must map to {fam}"
    for sid in (200, 300):
        assert got[sid] == sid, f"singleton {sid} must keep itself"


def test_clusters_match_union_find(spark, sf_smoke):
    """The declared cluster query equals plain union-find over the
    declared pair set — the components machinery (pointer-jumping
    min-label) introduces no splits or merges."""
    pairs = [
        (r["id_a"], r["id_b"])
        for r in audio_dup_pairs_portable(spark, sf_smoke).collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    # min-label canonicalization: map each root to the min member
    roots: dict[int, int] = {}
    for n, r in want.items():
        roots[r] = min(roots.get(r, n), n)
    want = {n: roots[find(n)] for n in parent}
    got = {
        r["node"]: r["component"]
        for r in audio_dup_clusters(spark, sf_smoke).collect()
    }
    assert got == want


def test_third_party_decoder_through_pair_pipeline(spark):
    """r13: a caller-supplied third-party audio decoder drives the FULL
    pair pipeline (container bytes -> decode -> log-mel fingerprint ->
    banded pairs). The toy container (magic 'MYA1' + int32 n_samples +
    float32 payload — the shape a soundfile/torchaudio wrapper parses)
    would not decode under the default WAV path (no RIFF header), so the
    correct planted pairing also proves the decoder callable is honored
    end-to-end; defined inside the test so cloudpickle ships it by
    value."""
    import numpy as np

    from caffeonspark_spark.multimodal.av import (
        audio_spectral_fingerprint,
        audio_struct_col,
        synthetic_rich_clip,
    )
    from caffeonspark_spark.multimodal.imagehash import near_dup_band_pairs
    from pyspark.sql import functions as F

    def encode(wave: np.ndarray) -> bytes:
        return (
            b"MYA1"
            + np.array([len(wave)], dtype=np.int32).tobytes()
            + wave.astype(np.float32).tobytes()
        )

    def stub_decoder(data: bytes, n_samples: int) -> np.ndarray:
        import numpy as _np

        assert data[:4] == b"MYA1", "not a MYA1 container"
        n = int(_np.frombuffer(data[4:8], dtype=_np.int32)[0])
        return _np.frombuffer(data[8 : 8 + 4 * n], dtype=_np.float32)

    rows = []
    for fam in (0, 4):
        base = synthetic_rich_clip(fam)
        for m, gain in enumerate((1.0, 0.5, 0.8, 0.65)):
            w = (np.float32(gain) * base).astype(np.float32)
            rows.append((fam + m, bytearray(encode(w)), len(w)))
    df = spark.createDataFrame(rows, "id long, wav binary, ns int")
    fp = audio_spectral_fingerprint(
        df.select(
            "id",
            audio_struct_col(F.col("wav"), F.lit(8000), F.col("ns")).alias(
                "audio_meta"
            ),
        ),
        decoder=stub_decoder,
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in near_dup_band_pairs(fp, max_hamming=2).collect()
    }
    want = {(a, b) for fam in (0, 4) for a in range(fam, fam + 4) for b in range(a + 1, fam + 4)}
    assert got == want, (got, want)


def test_declared_audio_native_honors_decoder_seam(spark, sf_smoke):
    """The declared query's ``decoder=`` must reach the decode stage: a
    sabotage decoder returning silence makes every fingerprint identical,
    the all-identical bands trip the hot-band cap, and the pair set
    collapses to empty — impossible if the default WAV path ran."""
    import numpy as np

    from caffeonspark_spark.multimodal.av import audio_dup_pairs_native

    def silence(data, n_samples):
        return np.zeros(max(int(n_samples), 1), dtype=np.float32)

    assert audio_dup_pairs_native(spark, sf_smoke, decoder=silence).count() == 0


def test_audio_dedup_map_query_matches_oracle(spark, sf_smoke):
    """r13 declared query: the composed audio dedup map matches the DuckDB
    three-stage twin (exact fingerprint grouping, survivor-only banding,
    recursive-CTE components) cell-for-cell at smoke scale."""
    from caffeonspark_spark.multimodal.av import (
        ORACLE_AUDIO_DEDUP_MAP,
        audio_dedup_map_query,
    )
    from tests.oracle_check import compare

    ok, msg = compare(
        audio_dedup_map_query(spark, sf_smoke),
        ORACLE_AUDIO_DEDUP_MAP,
        sf_smoke,
    )
    assert ok, msg


def test_audio_dedup_against_corpus_query_matches_oracle(spark, sf_smoke):
    """r13 declared query: the bipartite batch-vs-corpus audio pair set
    matches the DuckDB twin cell-for-cell (corpus-side hot cap,
    cross-side candidates only)."""
    from caffeonspark_spark.multimodal.av import (
        ORACLE_AUDIO_DEDUP_AGAINST_CORPUS,
        audio_dedup_against_corpus_query,
    )
    from tests.oracle_check import compare

    ok, msg = compare(
        audio_dedup_against_corpus_query(spark, sf_smoke),
        ORACLE_AUDIO_DEDUP_AGAINST_CORPUS,
        sf_smoke,
    )
    assert ok, msg
