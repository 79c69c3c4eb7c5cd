"""Property-based tests (hypothesis) — beyond the reference's test tiers.

Each property pins an engine function against an independent NumPy/pure-
Python reference implementation on randomized inputs, so the Catalyst
expression trees (ngrams, fingerprints, vector math) can't silently drift.
Spark round-trips are batched per property run (one createDataFrame per
example set) to keep runtime sane.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

TOKEN = st.text(alphabet="abcdefg", min_size=1, max_size=5)


@settings(max_examples=20, deadline=None)
@given(st.lists(TOKEN, min_size=0, max_size=12), st.integers(min_value=1, max_value=4))
def test_ngrams_match_python_reference(spark, tokens, n):
    from caffeonspark_spark.functions.text import ngrams

    df = spark.createDataFrame([(tokens,)], "toks array<string>")
    got = df.select(ngrams(F.col("toks"), n=n).alias("g")).collect()[0]["g"]
    expect = (
        [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
        if len(tokens) >= n
        else []
    )
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=4, max_size=4),
        min_size=1,
        max_size=8,
    )
)
def test_vector_mean_matches_numpy(spark, vecs):
    from caffeonspark_spark.functions.arrays import vector_mean_long

    df = spark.createDataFrame([(v,) for v in vecs], "emb array<double>")
    rows = vector_mean_long(df, "emb").orderBy("pos").collect()
    got = [r["mean_val"] for r in rows]
    expect = np.asarray(vecs, dtype=np.float64).mean(axis=0)
    # engine accumulates in decimal at scale 9 → compare at that grid
    assert np.allclose(got, expect, atol=2e-9)


@settings(max_examples=15, deadline=None)
@given(st.lists(TOKEN, min_size=1, max_size=10))
def test_fingerprint_whitespace_invariant(spark, tokens):
    """fp(' '.join(toks)) is invariant under whitespace reformatting and
    sensitive to token order (rolling hash is positional)."""
    from caffeonspark_spark.functions.text import doc_fingerprint

    text = " ".join(tokens)
    messy = "  " + "   ".join(tokens) + " "
    df = spark.createDataFrame([(text, messy)], "a string, b string")
    r = df.select(
        doc_fingerprint(F.col("a")).alias("fa"), doc_fingerprint(F.col("b")).alias("fb")
    ).collect()[0]
    assert r["fa"] == r["fb"]
    if len(set(tokens)) > 1 and list(reversed(tokens)) != tokens:
        rev = " ".join(reversed(tokens))
        df2 = spark.createDataFrame([(text, rev)], "a string, b string")
        r2 = df2.select(
            doc_fingerprint(F.col("a")).alias("fa"), doc_fingerprint(F.col("b")).alias("fb")
        ).collect()[0]
        assert r2["fa"] != r2["fb"]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=4, max_size=4),
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=4, max_size=4),
)
def test_cosine_similarity_matches_numpy(spark, a, b):
    """Within the engine's supported regime: cosine accumulates on the
    decimal(30,9) determinism grid, so inputs are quantized to 1e-3 and
    near-zero-norm vectors (undefined direction, grid-underflow) excluded."""
    from caffeonspark_spark.functions.arrays import cosine_similarity

    a = [round(x, 3) for x in a]
    b = [round(x, 3) for x in b]
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < 0.1 or nb < 0.1:
        return
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    expect = float(np.dot(a, b) / (na * nb))
    assert math.isclose(got, expect, rel_tol=1e-5, abs_tol=1e-5)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(  # corpus docs: lists of tokens (some too short to shingle)
        st.lists(TOKEN, min_size=0, max_size=12), min_size=1, max_size=6
    ),
    st.lists(  # benchmark docs
        st.lists(TOKEN, min_size=0, max_size=12), min_size=1, max_size=3
    ),
)
def test_decontaminate_matches_python_reference(spark, tmp_path_factory, corpus, bench):
    """decontaminate == a pure-Python shingle-overlap model, including the
    degenerate cases: docs shorter than n, duplicate shingles, full overlap."""
    from caffeonspark_spark.operators.dedup import decontaminate

    n = 3

    def shingles(toks):
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench_sh = set().union(*[shingles(t) for t in bench]) if bench else set()
    expect = {}
    for i, toks in enumerate(corpus):
        sh = shingles(toks)
        hits = len(sh & bench_sh)
        if hits:
            expect[i] = (hits, len(sh))

    rows = [(i, " ".join(t), "en", "srcX", 0) for i, t in enumerate(corpus)] + [
        (1000 + j, " ".join(t), "en", "src0", 0) for j, t in enumerate(bench)
    ]
    d = tmp_path_factory.mktemp("decon_prop")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    got = {
        r["doc_id"]: (r["n_contaminated"], r["n_shingles"])
        for r in decontaminate(spark, str(d), n=n).collect()
    }
    assert got == expect


def test_ngram_lm_score_planted(spark, tmp_path):
    """Hand-computed bigram-LM corpus-fit on a 2-doc corpus: the doc made of
    the corpus's repeated transition scores higher than the singleton doc."""
    import os
    from caffeonspark_spark.operators.textops import ngram_lm_score

    # corpus: "a b a b" (bigrams: ab, ba, ab) and "c d" (bigram: cd)
    rows = [
        (1, "a b a b", "en", "s", 7),
        (2, "c d", "en", "s", 3),
    ]
    d = tmp_path / "lm"
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = {r["doc_id"]: r for r in ngram_lm_score(spark, str(d)).collect()}
    # V = 4 distinct tokens {a,b,c,d}
    # C(ab)=2, C(ba)=1, C(cd)=1; contexts: C(a)=2, C(b)=1, C(c)=1
    # doc1: bigrams [ab, ba, ab] -> num = (2+1)+(1+1)+(2+1) = 8
    #       den = (2+2+1) + 3*4 = 17
    assert out[1]["n_bigrams"] == 3
    assert out[1]["num"] == 8
    assert out[1]["den"] == 17
    assert abs(out[1]["lm_fit"] - 8 / 17) < 1e-15
    # doc2: bigram [cd] -> num = 1+1 = 2; den = 1 + 4 = 5
    assert out[2]["n_bigrams"] == 1
    assert out[2]["num"] == 2
    assert out[2]["den"] == 5
    assert out[1]["lm_fit"] > out[2]["lm_fit"]


def test_bpe_train_planted(spark, tmp_path):
    """Hand-computed BPE on the classic low/lower/lowest corpus:
    merges are (l,o) c=5 (ties (o,w), lhs asc), (lo,w) c=5, (low,e) c=2."""
    import os
    from caffeonspark_spark.operators.bpe import bpe_train

    rows = [
        (1, "low low low", "en", "s", 11),
        (2, "lower lowest", "en", "s", 12),
    ]
    d = tmp_path / "bpe"
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = [tuple(r) for r in bpe_train(spark, str(d), n_merges=3).collect()]
    assert out == [(0, "l", "o", 5), (1, "lo", "w", 5), (2, "low", "e", 2)]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.text(alphabet="ab'\\", min_size=1, max_size=1), min_size=0, max_size=10),
    st.text(alphabet="ab'\\", min_size=1, max_size=2),
    st.text(alphabet="ab'\\", min_size=1, max_size=2),
)
def test_bpe_merge_fold_matches_python_reference(spark, syms, l, r):
    """The Catalyst greedy left-to-right merge fold must agree with a plain
    Python implementation for arbitrary symbol streams and pair choices —
    including overlap chains like (a,a) over 'a a a a'."""
    from caffeonspark_spark.operators.bpe import _apply_merge

    df = spark.createDataFrame([(0, syms)], "id long, syms array<string>")
    got = _apply_merge(df, l, r).collect()[0]["syms"]

    expect = []
    for x in syms:
        if expect and expect[-1] == l and x == r:
            expect[-1] = l + r
        else:
            expect.append(x)
    assert got == expect


def test_bpe_batched_equals_sequential(spark):
    """r15 batched BPE: the sequential-exact batch rule must reproduce
    the classic one-pair-per-round merge list EXACTLY — pinned on
    adversarial corpora exercising every rule in ``_exact_batch``:
    overlap-stop, new-pair-beats-later-candidate, tie-trim at the batch
    boundary, concat-string collision, fully-disjoint exhausted table,
    plus seeded random corpora."""
    import random

    from caffeonspark_spark.operators.bpe import (
        train_merges_from,
        train_merges_sequential_from,
    )

    def corpus(texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    adversarial = [
        # merging (a,b) creates (x,ab) c=100 that beats the 60-count pair
        ["x a b"] * 100 + ["c d"] * 60,
        # boundary tie: (c,d)=50 ties the stopping pair (e,c)=50 -> trim
        ["a b"] * 50 + ["c d"] * 50 + ["e c"] * 50,
        # concat collision: symbol 'ab' pre-exists as a word char pair
        ["a b"] * 40 + ["q ab"] * 30 + ["z y"] * 35,
        # chain dependency: every merge feeds the next
        ["low low low", "lower lowest"] * 3,
        # fully disjoint table: whole prefix accepted in one round
        ["a b"] * 9 + ["c d"] * 7 + ["e f"] * 5 + ["g h"] * 3,
        # overlap ties at the top (a,a) over runs
        ["a a a a a", "a a a"] * 4,
    ]
    rng = random.Random(7)
    for _ in range(4):
        words = [
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 5)))
            for _ in range(12)
        ]
        adversarial.append(
            [" ".join(rng.choices(words, k=rng.randint(1, 6)))
             for _ in range(15)]
        )

    for texts in adversarial:
        docs = corpus(texts)
        batched = train_merges_from(docs, n_merges=8)
        sequential = train_merges_sequential_from(docs, n_merges=8)
        assert batched == sequential, (texts[:3], batched, sequential)

    # r17: small vocabularies take the driver-side loop (exact Python
    # twins of _top_pairs/_merge_fold — what the loop above just pinned);
    # force the cap to 0 on a few corpora so the DISTRIBUTED batched path
    # (expression-stacked folds over the persisted base) stays covered
    # and equal too.
    from caffeonspark_spark.operators import bpe as bpe_mod

    cap = bpe_mod._VOCAB_COLLAPSE_MAX
    try:
        bpe_mod._VOCAB_COLLAPSE_MAX = 0
        for texts in adversarial[:3]:
            docs = corpus(texts)
            batched = train_merges_from(docs, n_merges=8)
            sequential = train_merges_sequential_from(docs, n_merges=8)
            assert batched == sequential, (texts[:3], batched, sequential)
    finally:
        bpe_mod._VOCAB_COLLAPSE_MAX = cap


def test_bpe_encode_planted(spark, tmp_path):
    """Encoding with the trained merges: after (l,o),(lo,w),(low,e) the
    corpus re-tokenizes to the hand-computed subword streams."""
    import os
    from caffeonspark_spark.operators.bpe import bpe_encode

    rows = [
        (1, "low low low", "en", "s", 11),
        (2, "lower lowest", "en", "s", 12),
    ]
    d = tmp_path / "bpe_enc"
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = {r["doc_id"]: r for r in bpe_encode(spark, str(d), n_merges=3).collect()}
    assert out[1]["subword_text"] == "low low low"
    assert (out[1]["n_words"], out[1]["n_subwords"]) == (3, 3)
    # lower -> [lowe, r]; lowest -> [lowe, s, t]
    assert out[2]["subword_text"] == "lowe r lowe s t"
    assert (out[2]["n_words"], out[2]["n_subwords"]) == (2, 5)


@given(
    st.integers(min_value=0, max_value=10_000),
    st.binary(min_size=1, max_size=24),
    st.random_module(),
)
@settings(max_examples=120, deadline=None)
def test_png_decoder_total_on_mutated_streams(offset, junk, _rnd):
    """Decoder totality: arbitrary byte-splices into a valid PNG either
    decode or raise ValueError — never IndexError/struct.error/zlib.error
    (the batch-assembly error contract all decode tiers share)."""
    import numpy as np

    from caffeonspark_spark.multimodal.png import decode_png
    from tests.png_fixture import encode_png

    base = encode_png(np.full((6, 5, 3), 77, np.uint8))
    pos = offset % len(base)
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        decode_png(mutated)
    except ValueError:
        pass


@given(
    st.integers(min_value=2, max_value=10_000),
    st.binary(min_size=1, max_size=24),
    st.random_module(),
)
@settings(max_examples=120, deadline=None)
def test_jpeg_decoder_total_on_mutated_streams(offset, junk, _rnd):
    """Same totality contract for the baseline JPEG tier (keeps the SOI
    magic so mutations exercise the parser, not the magic gate)."""
    import numpy as np

    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg

    base = encode_baseline_jpeg(np.full((8, 8, 3), 90, np.uint8))
    pos = 2 + (offset % (len(base) - 2))
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        decode_baseline_jpeg(mutated)
    except ValueError:
        pass


@given(
    st.integers(min_value=2, max_value=10_000),
    st.binary(min_size=1, max_size=24),
)
@settings(max_examples=60, deadline=None)
def test_bmp_decoder_total_on_mutated_streams(offset, junk):
    """Totality for the BMP variants (24/32-bit, 8-bit palette): mutated
    headers — including the 4-byte width/height fields that used to
    overflow numpy's frombuffer count — decode or raise ValueError."""
    import numpy as np

    from caffeonspark_spark.multimodal.columns import decode_image
    from tests.test_multimodal import _bmp_bytes

    from tests.test_multimodal import _rle8_stream

    rng = np.random.default_rng(59)
    td = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    idx = rng.integers(0, 3, (6, 5), dtype=np.uint8)
    pal = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
    for base in (
        _bmp_bytes(td, 24),
        _bmp_bytes(idx, 8, palette=pal),
        _bmp_bytes(idx, 8, palette=pal, rle_stream=_rle8_stream(idx)),
    ):
        pos = 2 + (offset % (len(base) - 2))
        mutated = base[:pos] + junk + base[pos + len(junk):]
        try:
            decode_image(mutated, 3)
        except ValueError:
            pass


@given(
    st.integers(min_value=2, max_value=10_000),
    st.binary(min_size=1, max_size=24),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_decoder_total_on_mutated_progressive_streams(offset, junk):
    """Totality contract for the progressive (SOF2) path too: a mutated
    multi-scan successive-approximation stream either decodes or raises
    ValueError — never IndexError/KeyError from the scan state machine."""
    import numpy as np

    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_progressive_jpeg

    rng = np.random.default_rng(31)
    base = encode_progressive_jpeg(
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), quant=4
    )
    pos = 2 + (offset % (len(base) - 2))
    mutated = base[:pos] + junk + base[pos + len(junk):]
    try:
        decode_baseline_jpeg(mutated)
    except ValueError:
        pass


@given(
    st.integers(min_value=0, max_value=2**32 - 1),           # image seed
    st.integers(min_value=8, max_value=33),                  # height
    st.integers(min_value=8, max_value=33),                  # width
    st.sampled_from(["gray", "444", "420"]),
    st.integers(min_value=0, max_value=2),                   # DC approx depth
    st.lists(st.integers(2, 62), max_size=3, unique=True),   # luma band cuts
    st.integers(min_value=0, max_value=2),                   # luma AC depth
    st.integers(min_value=0, max_value=1),                   # chroma AC depth
    st.sampled_from([0, 0, 2, 5]),                           # restart interval
    st.booleans(),                                           # DC per-component
)
@settings(max_examples=12, deadline=None)
def test_jpeg_progressive_random_scripts_bit_identical(
    seed, h, w, mode, dc_al, cuts, y_al, c_al, rst, dc_split
):
    """ANY spec-legal progressive scan script — random spectral splits,
    random successive-approximation depths per component, optional
    restart markers — must decode to EXACTLY the pixels of the baseline
    encoding (the coefficient sets are identical by construction), not
    just the library default script the example-based test uses."""
    import numpy as np

    from caffeonspark_spark.multimodal.jpeg import decode_baseline_jpeg
    from tests.jpeg_fixture import encode_baseline_jpeg, encode_progressive_jpeg

    rng = np.random.default_rng(seed)
    if mode == "gray":
        img = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
        kw, ncomp = {}, 1
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        kw, ncomp = {"subsample": mode == "420"}, 3

    all_comps = tuple(range(ncomp))
    # DC scans either interleave all components in one scan or run one
    # NON-interleaved scan per component (both spec-legal layouts)
    dc_groups = (
        [(ci,) for ci in range(ncomp)] if dc_split and ncomp > 1
        else [all_comps]
    )
    edges = [1] + sorted(cuts) + [64]
    scans = [(g, 0, 0, 0, dc_al) for g in dc_groups]  # DC first

    for a, b in zip(edges, edges[1:]):              # luma spectral segments
        scans.append(((0,), a, b - 1, 0, y_al))
    for ci in range(1, ncomp):                      # chroma full-band firsts
        scans.append(((ci,), 1, 63, 0, c_al))
    for al in range(y_al, 0, -1):                   # luma AC refinements
        scans.append(((0,), 1, 63, al, al - 1))
    for ci in range(1, ncomp):                      # chroma AC refinements
        for al in range(c_al, 0, -1):
            scans.append(((ci,), 1, 63, al, al - 1))
    for al in range(dc_al, 0, -1):                  # DC refinements
        scans.extend((g, 0, 0, al, al - 1) for g in dc_groups)

    base = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4, **kw))
    prog = decode_baseline_jpeg(
        encode_progressive_jpeg(img, quant=4, scans=scans, restart_interval=rst, **kw)
    )
    np.testing.assert_array_equal(base, prog)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),      # user
            st.integers(min_value=0, max_value=70),     # day offset
        ),
        min_size=1,
        max_size=25,
    )
)
def test_cohort_retention_matches_python_reference(spark, rows):
    """Random event sets: the triangle must equal a hand-rolled pandas
    cohort computation (first-day per user, ISO-Monday week truncation,
    floor-div-7 offsets, distinct-user counts)."""
    import datetime as dt

    from caffeonspark_spark.operators.temporal import cohort_retention

    base = dt.datetime(2024, 1, 1)  # a Monday
    ev = [
        (i, base + dt.timedelta(days=day, hours=i % 24), user, "view", 1.0)
        for i, (user, day) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    got = {
        (r["cohort_week"].date(), r["week_offset"]): (r["n_users"], r["n_events"])
        for r in cohort_retention(df).collect()
    }
    # python reference
    first = {}
    for _, (user, day) in enumerate(rows):
        first[user] = min(first.get(user, day), day)
    expect: dict = {}
    for user, day in rows:
        f = first[user]
        cohort = base.date() + dt.timedelta(days=f - (f % 7))  # Monday trunc
        off = (day - f) // 7
        users, events = expect.get((cohort, off), (set(), 0))
        users = users | {user}
        expect[(cohort, off)] = (users, events + 1)
    assert got == {k: (len(u), n) for k, (u, n) in expect.items()}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=8,
    ),
    st.floats(min_value=-0.5, max_value=0.9, allow_nan=False),
)
def test_cosine_range_matches_numpy_filter(spark, vecs, tau):
    """Random corpora: range search must equal the numpy all-pairs cosine
    filtered at tau (first vector as the probe), zero-norm rows excluded.
    Inputs are quantized to the 2-decimal grid: the engine's dot products
    bround at 9 decimals by contract, so sub-grid magnitudes (1e-7 × 1e-7)
    are DESIGNED to collapse to zero-norm — that contract is pinned by the
    unit tests, not this property."""
    from caffeonspark_spark.operators.similarity import cosine_range_search

    vecs = [[round(x, 2) for x in v] for v in vecs]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"] for r in cosine_range_search(
            df, df.where(F.col("vec_id") == 0), tau=tau
        ).collect()
    }
    q = np.asarray(vecs[0], dtype=np.float64)
    expect = set()
    for i, v in enumerate(vecs[1:], start=1):
        x = np.asarray(v, dtype=np.float64)
        denom = float(np.linalg.norm(q) * np.linalg.norm(x))
        if denom == 0:
            continue
        cos = float(np.dot(q, x)) / denom
        # skip knife-edge cases within the decimal-grid rounding of the
        # engine's bround(9) products — the property is set equality away
        # from the boundary, exactness at the boundary is the oracle's job
        if abs(cos - tau) < 1e-6:
            got.discard(i)
            continue
        if cos >= tau:
            expect.add(i)
    assert got == expect
