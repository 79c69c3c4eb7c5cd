"""Text-analysis column functions (reference F1/F10 + LLM-pipeline extensions).

Reference parity:
* ``sentence_to_words`` — the reference tokenizer ``Conversions.sentence2Words``
  (``tools/Conversions.scala:22-29``): split on word/non-word runs, trim,
  lowercase, drop empty and a trailing ".". Rebuilt with regexp split +
  higher-order ``filter``/``transform`` — all JVM-side.
* ``tokenize`` — generic any-whitespace tokenizer (``F.split`` on \\s+).
  NOTE: the oracle-checked queries standardize on ``space_tokens`` (single
  space, DuckDB-identical); every helper that feeds or mirrors a checked
  query must use that form.

Extensions (mandated LLM-data-pipeline surface; all pure Catalyst
expressions, no UDF — they run inside whole-stage codegen and scale
trivially):
* ``token_count`` — whitespace token count.
* ``quality_score_cols`` — length / punctuation-ratio / stopword-ratio
  heuristics.
* ``lang_id_score`` — n-gram/stopword-hit language-ID heuristic.
* ``doc_fingerprint`` — order-sensitive polynomial rolling hash over tokens
  (64-bit, overflow-wrapping) for exact-duplicate detection at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny in-engine stopword list (deterministic, shared with oracle SQL)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# per-language marker words for the language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenizer dropping empty tokens; lowercased."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def space_tokens(col: Column | str) -> Column:
    """Single-SPACE split tokenizer (lowercased, empties dropped) — the
    oracle-parity twin of ``tokenize``: DuckDB's
    ``string_split(lower(x), ' ')`` does exactly this, so every
    oracle-checked text operator standardizes on it. The sole shared
    definition; textops/dedup/bpe all delegate here."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), " "), lambda t: t != F.lit(""))


def sentence_to_words(col: Column | str) -> Column:
    """Reference-faithful tokenizer (``Conversions.scala:22-29``).

    The Scala original splits the sentence into alternating word/non-word
    runs via ``(\\w+|\\W+)``, trims each, lowercases, drops empties, and
    removes a bare "." token (trailing period). Equivalent formulation:
    extract lowercase word runs, but keep interior punctuation runs that are
    not pure whitespace/period — here we match its observable output on
    normal captions: lowercase word tokens plus non-period punctuation runs.
    """
    c = F.col(col) if isinstance(col, str) else col
    runs = F.regexp_extract_all(F.lower(c), F.lit(r"([a-z0-9_]+|[^a-z0-9_\s]+)"), 1)
    trimmed = F.transform(runs, lambda t: F.trim(t))
    return F.filter(trimmed, lambda t: (t != F.lit("")) & (t != F.lit(".")))


def sentence_to_words_py(sentence: str) -> list[str]:
    """Driver-side twin of ``sentence_to_words`` (same token stream), for
    tests and small driver-side comparisons — NOT a UDF."""
    import re

    runs = re.findall(r"([a-z0-9_]+|[^a-z0-9_\s]+)", sentence.lower())
    toks = [t.strip() for t in runs]
    return [t for t in toks if t and t != "."]


def ngrams(tokens: Column, n: int = 2, sep: str = " ") -> Column:
    """Word n-grams from a token-array column, as an array of joined strings.

    ``transform`` over index positions + ``slice`` — pure Catalyst; used by
    the n-gram Jaccard dedup path.
    """
    size = F.size(tokens)
    # sliding-window via n-1 chained zip_with over shifted slices: one pass,
    # no per-position indexing. Measured ~10× faster than the per-index
    # transform(slice+array_join) form (0.5s vs 6s on 260k shingles) — the
    # per-element work is a flat string concat instead of array materialization.
    m = size - F.lit(n - 1)
    acc = F.slice(tokens, 1, m)
    for j in range(1, n):
        acc = F.zip_with(
            acc, F.slice(tokens, 1 + j, m), lambda a, b: F.concat(a, F.lit(sep), b)
        )
    return F.when(size >= n, acc).otherwise(F.array().cast("array<string>"))


def token_count(col: Column | str) -> Column:
    # space_tokens, not \s+ tokenize: these quality helpers must count the
    # SAME token stream as the oracle-checked textops.doc_quality /
    # quality_filter signals, or a pipeline mixing the two filters on two
    # different token counts per row (same divergence class as the
    # lang_id_score r7 finding)
    return F.size(space_tokens(col))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are stopwords — a core quality signal.
    ``space_tokens`` stream (see ``token_count``)."""
    toks = space_tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(toks)


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^a-zA-Z0-9\s]", "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.length(c)


def quality_score_cols(col: Column | str) -> dict[str, Column]:
    """Bundle of quality-scoring heuristics for a text column."""
    return {
        "n_tokens": token_count(col).cast("long"),
        "n_chars": char_count(col).cast("long"),
        "stopword_ratio": stopword_ratio(col),
        "punct_ratio": punct_ratio(col),
        "mean_token_len": _mean_token_len(col),
    }


def _mean_token_len(col: Column | str) -> Column:
    toks = space_tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def lang_id_score(col: Column | str, lang: str = "en") -> Column:
    """Marker-word hit count for ``lang`` — argmax over languages gives the
    predicted language; integer counts keep it oracle-exact."""
    markers = LANG_MARKERS[lang]
    # space_tokens, not tokenize: the doc_lang_id query's score_* columns
    # and its DuckDB oracle both split on single spaces, and prediction
    # MUST count the same token stream — with \s+ tokenize, a tab- or
    # double-space-separated text scored one language and predicted
    # another in the same row (r7 self-review finding)
    toks = space_tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")


def predict_lang(col: Column | str) -> Column:
    """Heuristic language-ID: language with the most marker hits, ties broken
    by the fixed priority en > de > fr > es; 'und' when no marker hits.

    The explicit CASE chain (rather than an argmax over structs) makes the
    tie rule portable to the SQL oracle verbatim.
    """
    s = {lg: lang_id_score(col, lg) for lg in ("en", "de", "fr", "es")}
    return (
        F.when(s["en"] + s["de"] + s["fr"] + s["es"] == 0, F.lit("und"))
        .when(s["en"] >= F.greatest(s["de"], s["fr"], s["es"]), F.lit("en"))
        .when(s["de"] >= F.greatest(s["fr"], s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )


# polynomial rolling hash constants (public Rabin-Karp style); modulus is the
# Mersenne prime 2^31-1 so acc*BASE (< 2^31 * 2^20 = 2^51) never overflows the
# signed-64 arithmetic Spark longs use
_FP_BASE = 1000003
_FP_MOD = (1 << 31) - 1


# per-character base of the portable token hash (token/doc folds share
# _FP_BASE/_FP_MOD above — ONE constant pair, so the xxhash64 and portable
# fingerprint families can never silently de-sync)
_FP_CHAR_BASE = 31


def portable_token_hash(t: Column) -> Column:
    """Engine-portable token hash: fold (acc*31 + charcode) mod 2^31-1 over
    the token's characters — the same arithmetic is plain SQL in DuckDB
    (list_reduce over ascii codes), so fingerprints hash-match across
    engines. Slower than xxhash64 (per-char fold); used by the
    oracle-checked declared query, not the production default.

    This is the EXPRESSION form, usable inside higher-order-function
    lambdas (``F.transform(tokens, portable_token_hash)``). For a plain
    top-level string column prefer ``char_fold_vec`` — identical values,
    ~2-5x faster (the HOF chain is interpreted per character; the
    vectorized form folds a whole Arrow batch column-wise in NumPy,
    guide §4.2)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.ascii(F.substring(t, i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(_FP_CHAR_BASE) + x, F.lit(_FP_MOD)),
    )


# bound on padded-matrix cells per vectorized-fold segment (cells are int64:
# 2^25 cells = 256 MB working set); one pathological multi-KB string in a
# batch only inflates its own segment, not the whole batch
_FOLD_SEG_CELLS = 1 << 25


def _char_fold_batch(s, base: int = _FP_CHAR_BASE, mod: int = _FP_MOD):
    """Vectorized char fold over a pandas Series of strings — bit-identical
    to ``portable_token_hash`` / the imagehash ``_chunk_fold`` arithmetic:

    * codes are UNICODE CODEPOINTS (``ord``), exactly what Spark's
      ``ascii(substring(t, i, 1))`` returns for any char (utf-32-le gives
      one 4-byte codepoint per char, so the whole segment decodes in one
      ``np.frombuffer``);
    * rows are LEFT-padded with '\\x00' to the segment max length — a
      leading 0 code is fold-neutral (acc stays 0 through the pad:
      0*base + 0 = 0), so shorter rows get the same fold they would get
      unpadded, and the fold becomes one (acc*base + col) % mod vector op
      per character column;
    * empty string folds to 0 (both engines), null stays null.

    Segmenting bounds memory: each segment's padded matrix is capped at
    ``_FOLD_SEG_CELLS`` int64 cells using that segment's own max length.
    """
    import numpy as np
    import pandas as pd

    mask = s.isna().to_numpy()
    vals = s.fillna("")
    n = len(vals)
    out = np.zeros(n, np.int64)
    start = 0
    lens = vals.str.len().to_numpy()
    while start < n:
        seg_len = max(int(lens[start]), 1)
        end = start + 1
        while end < n:
            cand = max(seg_len, int(lens[end]) or 1)
            if (end + 1 - start) * cand > _FOLD_SEG_CELLS:
                break
            seg_len = cand
            end += 1
        seg = vals.iloc[start:end]
        buf = "".join(seg.str.rjust(seg_len, "\x00").tolist()).encode(
            "utf-32-le"
        )
        codes = np.frombuffer(buf, "<u4").reshape(end - start, seg_len)
        acc = np.zeros(end - start, np.int64)
        for j in range(seg_len):
            acc = (acc * base + codes[:, j]) % mod
        out[start:end] = acc
        start = end
    res = pd.array(out, dtype="Int64")
    res[mask] = pd.NA
    return pd.Series(res)


def _make_char_fold_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _char_fold_udf(s):  # pragma: no cover - runs on executors
        return _char_fold_batch(s)

    return _char_fold_udf


_CHAR_FOLD_UDF = None


def char_fold_vec(t: Column) -> Column:
    """``portable_token_hash`` for a top-level string column, vectorized:
    one Arrow batch crosses the Python boundary and NumPy folds it
    column-wise (guide §4.2 — batch-vectorized native compute beats the
    interpreted per-char HOF chain). Values are bit-identical to the
    expression form (pinned by ``test_dedup.py``'s vec-vs-expression pin);
    the DuckDB oracles are untouched. Not usable inside HOF lambdas —
    keep ``portable_token_hash`` there."""
    global _CHAR_FOLD_UDF
    if _CHAR_FOLD_UDF is None:
        _CHAR_FOLD_UDF = _make_char_fold_udf()
    return _CHAR_FOLD_UDF(t)


def doc_fingerprint_portable(col: Column | str) -> Column:
    """Order-sensitive rolling fingerprint with the portable token hash:
    fp = fold (fp*1000003 + token_hash) mod 2^31-1 over the token stream.
    Same polynomial structure as ``doc_fingerprint`` with xxhash64 swapped
    for cross-engine arithmetic. Tokenizes with ``space_tokens`` — the
    single-space oracle-parity definition every other dedup operator uses;
    the old \\s+ tokenize diverged from the DuckDB oracle on tabs/
    newlines/double spaces (r7 self-review finding).

    This is the EXPRESSION form (interpreted HOF chain, per-character).
    Hot query paths use :func:`doc_fp_vec` — identical values, batch-
    vectorized; this form stays as the semantics pin."""
    th = F.transform(space_tokens(col), portable_token_hash)
    return F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(_FP_BASE) + x, F.lit(_FP_MOD)),
    )


def _doc_fold_tokens_batch(s):
    """Vectorized two-level portable doc fingerprint over a pandas Series of
    token arrays — bit-identical to ``doc_fingerprint_portable``'s HOF
    chain: level 1 char-folds every token (shared ``_char_fold_batch``
    arithmetic), level 2 folds the token-hash stream with base
    ``_FP_BASE``. Rows are LEFT-padded with hash 0 to the segment max token
    count — fold-neutral exactly as in ``_char_fold_batch`` (acc stays 0
    through the pad), so shorter docs fold as if unpadded. Empty token list
    folds to 0, null stays null. The per-segment padded matrix is capped at
    ``_FOLD_SEG_CELLS`` int64 cells."""
    import numpy as np
    import pandas as pd

    n = len(s)
    mask = np.fromiter((x is None for x in s), bool, n)
    counts = np.zeros(n, np.int64)
    flat: list = []
    for i, x in enumerate(s):
        if x is None:
            continue
        counts[i] = len(x)
        flat.extend(x)
    if flat:
        th_np = (
            _char_fold_batch(pd.Series(flat, dtype=object))
            .to_numpy(dtype="int64")
        )
    else:
        th_np = np.empty(0, np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)))
    out = np.zeros(n, np.int64)
    start = 0
    while start < n:
        seg_len = max(int(counts[start]), 1)
        end = start + 1
        while end < n:
            cand = max(seg_len, int(counts[end]) or 1)
            if (end + 1 - start) * cand > _FOLD_SEG_CELLS:
                break
            seg_len = cand
            end += 1
        m = end - start
        mat = np.zeros((m, seg_len), np.int64)
        for i in range(start, end):
            c = int(counts[i])
            if c:
                mat[i - start, seg_len - c:] = th_np[offs[i]:offs[i + 1]]
        acc = np.zeros(m, np.int64)
        for j in range(seg_len):
            acc = (acc * _FP_BASE + mat[:, j]) % _FP_MOD
        out[start:end] = acc
        start = end
    res = pd.array(out, dtype="Int64")
    res[mask] = pd.NA
    return pd.Series(res)


def _make_doc_fp_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _doc_fp_udf(toks):  # pragma: no cover - runs on executors
        return _doc_fold_tokens_batch(toks)

    return _doc_fp_udf


_DOC_FP_UDF = None


def doc_fp_vec(col: Column | str) -> Column:
    """``doc_fingerprint_portable``, vectorized (guide §4.2): tokenization
    stays Spark-side (``space_tokens`` — lower/split/filter are codegen'd,
    and their exact semantics never enter Python), only the token ARRAY
    crosses the Arrow boundary, and both fold levels run column-wise in
    NumPy instead of the interpreted per-character HOF chain. Values are
    bit-identical to the expression form (pinned by ``test_dedup.py``'s
    doc-fp vec-vs-expression pin); the DuckDB oracles are untouched."""
    global _DOC_FP_UDF
    if _DOC_FP_UDF is None:
        _DOC_FP_UDF = _make_doc_fp_udf()
    return _DOC_FP_UDF(space_tokens(col))


def doc_fingerprint(col: Column | str) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over the
    token stream, each token first reduced with Spark's ``xxhash64``.

    fp = sum-fold: fp = (fp * BASE + xxhash64(token) mod M) mod M

    Detects exact/near-exact (whitespace-normalized) duplicates with a single
    long value per document — the cheap first pass before MinHash at scale.
    (Not oracle-checked: xxhash64 is Spark-specific; covered by unit tests.)
    Same ``space_tokens`` stream as the portable twin, so the two
    fingerprint families group documents identically.
    """
    toks = space_tokens(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(_FP_BASE) + F.pmod(F.xxhash64(t), F.lit(_FP_MOD)), F.lit(_FP_MOD)
        ),
    )
