"""BPE tokenizer training on the corpus (LLM-pipeline extension).

The reference ships a word-level vocab builder (``Vocab.scala:34-63`` —
groupBy-count-sort-take); modern pipelines train a subword (BPE) vocabulary
instead. This module implements the classic scalable BPE trainer shape:

1. ONE corpus scan builds the word-frequency table (vocab-sized, ≪ corpus).
2. Every merge round runs on that table only: count adjacent symbol pairs
   (weighted by word frequency), accept the SEQUENTIAL-EXACT BATCH of top
   pairs (standard batched BPE, restricted to where it is provably
   lossless — ``_exact_batch``), apply each merge to every word's symbol
   sequence with a greedy left-to-right fold.

Each round's pair candidates are a ≤(n_merges+1)-row driver collect
(metadata, exactly like ``kmeans_fit``'s k·dim centroid collect), and the
merge application is a pure Catalyst ``aggregate`` fold — no Python row
path. At 100 TB the corpus is touched once; the iteration cost is
O(n_rounds × |vocab|) with n_rounds ≤ n_merges (measured ~2-3× fewer
driver round-trips than the classic one-pair loop, identical output).

Pair counting is positional (the overlap-counting BPE variant): "aaa"
contributes (a,a) twice before any merge. Both engines count the same way,
so the declared query is hash-checked END TO END against a DuckDB twin that
unrolls the merge rounds into chained CTEs — an iterative-yet-oracle-exact
query, same discipline as ``kmeans_fit``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from caffeonspark_spark.catalog import load_table

N_MERGES = 8

#: vocab-row cap for the between-rounds LocalRelation collapse in
#: ``train_merges_from`` — ≤64k (word, freq, syms) rows is centroid-
#: collect-class driver metadata; larger vocabularies keep the
#: distributed expression-stacking path
_VOCAB_COLLAPSE_MAX = 65536


def _word_vocab(docs: DataFrame) -> DataFrame:
    """Word-frequency table with each word exploded into single-char symbols
    (the one corpus-wide scan; everything after is vocab-sized)."""
    from caffeonspark_spark.functions.text import space_tokens

    return (
        docs.select(F.explode(space_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"),
        )
    )


def _top_pairs(vocab: DataFrame, k: int):
    """Top-``k`` adjacent symbol pairs, tie-broken (pair_count DESC,
    lhs ASC, rhs ASC) — a k-row driver collect per round (metadata)."""
    pairs = vocab.where(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(element_at(syms, i) AS l,"
                "             element_at(syms, i + 1) AS r))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("c"))
        .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
        .limit(k)
        .collect()
    )


def _exact_batch(top, remaining: int):
    """The sequential-exact merge batch: the longest PREFIX of the sorted
    pair list that the classic one-pair-per-round loop would provably
    pick in this exact order (standard batched BPE, restricted to where
    it is lossless).

    Why each rule is required for exactness:

    * PREFIX + pairwise symbol-disjoint (stop at the FIRST conflicting
      candidate, don't skip it): merging (l, r) only changes counts of
      pairs sharing a symbol with it, so a disjoint pair's count is
      invariant — and prefix-contiguity means every pair whose count
      could change sorts BELOW the whole batch.
    * the merged CONCAT string counts as used: if an accepted pair later
      in the prefix names the new symbol (``l+r`` already existed in the
      vocab), its count would INCREASE mid-batch — stop there.
    * strict trim against ``c_stop`` (the first non-accepted candidate's
      count): pairs newly CREATED by a batch merge are bounded by the
      count of some overlapping pre-merge pair, i.e. by ``c_stop``; a
      batch member tying ``c_stop`` could lose the (count, lex) order to
      such a new pair, so only strictly-greater members are safe. The
      rank-1 pair is always safe (it IS the global max).
    * exhausted pair list (fewer than ``remaining + 1`` rows): nothing
      sorts below the batch, and a fully-disjoint table can create no
      new pairs (a new pair needs a pre-existing adjacency that would
      itself have conflicted), so the whole prefix is safe.
    """
    batch = []
    used: set[str] = set()
    c_stop = None
    for row in top:
        if len(batch) >= remaining:
            c_stop = row["c"]
            break
        if {row["l"], row["r"], row["l"] + row["r"]} & used:
            c_stop = row["c"]
            break
        batch.append(row)
        used |= {row["l"], row["r"], row["l"] + row["r"]}
    if c_stop is not None:
        batch = [batch[0]] + [b for b in batch[1:] if b["c"] > c_stop]
    return batch


def _merge_fold(syms, l: str, r: str):
    """Greedy left-to-right merge of the (l, r) pair over a symbol-array
    column — a Catalyst ``aggregate`` fold with an array accumulator,
    shared by training (vocab table) and encoding (document words). The
    pair rides in as ``F.lit`` values (never spliced into SQL text), so
    symbols containing quotes/backslashes can't break or skew the
    expression."""
    lit_l, lit_r, lit_lr = F.lit(l), F.lit(r), F.lit(l + r)

    def merge(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (x == lit_r)
        )
        return F.when(
            hit, F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lit_lr))
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), merge)


def _apply_merge(vocab: DataFrame, l: str, r: str) -> DataFrame:
    return vocab.withColumn("syms", _merge_fold(F.col("syms"), l, r))


def _py_top_pairs(rows: list[tuple], k: int) -> list[dict]:
    """Driver-side twin of ``_top_pairs`` over collected (word, freq,
    syms) rows: positional adjacent-pair counts weighted by freq,
    (count DESC, l ASC, r ASC) order, top ``k``. Exact integer counts;
    Python str ordering equals Spark's UTF8 binary ordering (UTF-8 byte
    order preserves codepoint order)."""
    from collections import defaultdict

    cnt: dict[tuple, int] = defaultdict(int)
    for _, freq, syms in rows:
        for i in range(len(syms) - 1):
            cnt[(syms[i], syms[i + 1])] += freq
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    return [{"l": l, "r": r, "c": c} for (l, r), c in order[:k]]


def _py_merge_fold(syms: list[str], l: str, r: str) -> list[str]:
    """Driver-side twin of ``_merge_fold``: greedy left-to-right merge of
    the (l, r) pair — the accumulator's last symbol merges with the next
    exactly as the Catalyst fold's ``element_at(acc, -1)`` test does."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == l and x == r:
            out[-1] = l + r
        else:
            out.append(x)
    return out


def train_merges_from(
    docs: DataFrame, n_merges: int = N_MERGES
) -> list[tuple]:
    """BATCHED training loop (r15): each round collects the top
    ``remaining + 1`` pairs ONCE and accepts the sequential-exact batch
    (``_exact_batch``) — the merge list is provably identical to the
    classic one-pair-per-round loop, with the driver round-trips cut by
    the batch factor (measured ~2-3× on the documents corpus). Returns
    the ordered merge list as driver metadata (rank, lhs, rhs,
    pair_count)."""
    base = _word_vocab(docs).persist()
    try:
        # r17 (guide §1.2 "the distributed algorithm" / §5 driver): after
        # the one corpus scan, the training loop touches NOTHING but the
        # word-frequency table. When that table is driver-metadata-sized
        # (the centroid-collect class), every per-round Spark job —
        # _top_pairs' agg+sort+collect and the stacked merge folds, each
        # a full AQE query whose fixed cost dwarfs the ≤64k-row work —
        # is scheduling overhead, and round r re-executed all r-1 stacked
        # folds over the base besides. Collect the vocab ONCE and run the
        # loop in exact Python: same positional pair counts (ints), same
        # (c DESC, l ASC, r ASC) order (UTF-8 byte order == codepoint
        # order), same greedy left-to-right fold — pinned against the
        # Spark-side sequential loop by the adversarial equivalence tests
        # and end-to-end by the bpe_train/bpe_encode oracles. Web-scale
        # vocabularies keep the distributed loop below, exactly like the
        # union-find and KMV one-task cutovers.
        if base.count() <= _VOCAB_COLLAPSE_MAX:
            rows = [
                (r["word"], r["freq"], list(r["syms"])) for r in base.collect()
            ]
            merges: list[tuple] = []
            while len(merges) < n_merges:
                remaining = n_merges - len(merges)
                top = _py_top_pairs(rows, remaining + 1)
                batch = _exact_batch(top, remaining)
                if not batch:
                    break
                for row in batch:
                    merges.append((len(merges), row["l"], row["r"], row["c"]))
                if len(merges) < n_merges:
                    for row in batch:  # apply in rank order == sequential
                        l, r = row["l"], row["r"]
                        rows = [
                            (w, f, _py_merge_fold(s, l, r)) for w, f, s in rows
                        ]
            return merges
        vocab = base
        merges = []
        while len(merges) < n_merges:
            remaining = n_merges - len(merges)
            top = _top_pairs(vocab, remaining + 1)
            batch = _exact_batch(top, remaining)
            if not batch:
                break
            for row in batch:
                merges.append((len(merges), row["l"], row["r"], row["c"]))
            if len(merges) < n_merges:
                for row in batch:  # apply in rank order == sequential
                    vocab = _apply_merge(vocab, row["l"], row["r"])
        return merges
    finally:
        # only the round-0 word table is persisted; later rounds stack
        # cheap fold expressions on top of it, and the result rows are
        # already collected driver metadata
        base.unpersist()


def train_merges_sequential_from(
    docs: DataFrame, n_merges: int = N_MERGES
) -> list[tuple]:
    """The classic one-pair-per-round reference loop — kept as the
    equivalence oracle for the batched trainer (tests compare the two on
    adversarial corpora; the DuckDB twin pins the real corpus)."""
    base = _word_vocab(docs).persist()
    try:
        vocab = base
        merges = []
        for rank in range(n_merges):
            top = _top_pairs(vocab, 1)
            if not top:
                break
            best = top[0]
            merges.append((rank, best["l"], best["r"], best["c"]))
            if rank < n_merges - 1:
                vocab = _apply_merge(vocab, best["l"], best["r"])
        return merges
    finally:
        base.unpersist()


def bpe_train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> list[tuple]:
    """The training loop over the documents corpus — shared by
    ``bpe_train`` (the declared merge-table query) and ``bpe_encode``
    (tokenization)."""
    return train_merges_from(load_table(spark, sf_dir, "documents"), n_merges)


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the documents corpus; returns the
    merge table (merge_rank, lhs, rhs, pair_count) — the artifact a
    tokenizer loads. All counts are exact BIGINTs, so the result
    hash-matches the unrolled DuckDB twin bit-for-bit."""
    return spark.createDataFrame(
        bpe_train_merges(spark, sf_dir, n_merges),
        "merge_rank int, lhs string, rhs string, pair_count long",
    )


def bpe_encode(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Tokenize the corpus with the just-trained merge table (the encode
    half of the BPE pipeline): each document's words are exploded with
    position, split to characters, and every merge is applied in rank
    order with the same greedy fold training used; the per-doc result is
    the subword count and the reassembled subword text (word order
    preserved via the position sort). Train and encode are BOTH
    hash-checked against one unrolled DuckDB chain, so the full
    train→encode path is oracle-exact end to end.

    Scale shape: training cost is as documented on ``bpe_train``; the
    n_merges chained folds run over the DISTINCT vocabulary only (words
    repeat — encoding each occurrence measured ~6× slower at sf0.1), and
    occurrences pick up their subwords via an equi-join on the word (AQE
    broadcasts the vocab side while it fits; plain hash join at web-scale
    vocabularies). Only the per-doc agg shuffles."""
    from caffeonspark_spark.functions.text import space_tokens

    merges = bpe_train_merges(spark, sf_dir, n_merges)
    words = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(space_tokens("text")).alias("wpos", "word")
    )
    syms = F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    for (_, l, r, _) in merges:
        syms = _merge_fold(syms, l, r)
    vocab_enc = words.select("word").distinct().select("word", syms.alias("syms"))
    enc = words.join(vocab_enc, "word").select("doc_id", "wpos", "syms")
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("syms")).alias("n_subwords"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("wpos").alias("wpos"),
                            F.array_join("syms", " ").alias("sub"),
                        )
                    )
                ),
                lambda s: s["sub"],
            ),
        ).alias("subword_text"),
    )


def _merge_fold_sql(src: str, bi: str) -> str:
    """DuckDB rendering of the greedy merge fold against round table
    ``bi``; LEFT JOIN ON TRUE + NULL-comparison fallthrough make an empty
    (exhausted) round an identity application, matching the Spark side's
    early break."""
    return f"""SELECT {{cols}},
               list_reduce(list_transform(syms, s -> [s]),
                 (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = {bi}.l
                                       AND x[1] = {bi}.r
                                  THEN acc[:len(acc)-1] || [{bi}.l || {bi}.r]
                                  ELSE acc || x END) AS syms
        FROM {src} LEFT JOIN {bi} ON TRUE"""


def _bpe_cte_parts(n_merges: int) -> list[str]:
    """The unrolled training chain (v0→p0→b0→v1→…): each round computes
    its best pair (b{i}) and derives the next vocab with the same greedy
    list_reduce fold — shared by the train and encode oracles."""
    parts = [
        """v0 AS (
        SELECT word, COUNT(*) AS freq,
               list_transform(range(1, length(word) + 1),
                              i -> substring(word, i, 1)) AS syms
        FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                        t -> t <> '')) AS word
              FROM documents)
        GROUP BY word
    )"""
    ]
    for i in range(n_merges):
        parts.append(
            f"""p{i} AS (
        SELECT unnest(list_transform(range(1, len(syms)),
                   j -> struct_pack(l := syms[j], r := syms[j+1]))) AS p, freq
        FROM v{i} WHERE len(syms) >= 2
    )"""
        )
        parts.append(
            f"""b{i} AS (
        SELECT p.l AS l, p.r AS r, SUM(freq) AS c
        FROM p{i} GROUP BY p.l, p.r ORDER BY c DESC, l, r LIMIT 1
    )"""
        )
        if i < n_merges - 1:
            body = _merge_fold_sql(f"v{i}", f"b{i}").format(cols="word, freq")
            parts.append(f"""v{i+1} AS (
        {body}
    )""")
    return parts


def oracle_bpe_train(n_merges: int = N_MERGES) -> str:
    parts = _bpe_cte_parts(n_merges)
    selects = "\n    UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l AS lhs, r AS rhs,"
        f" CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(n_merges)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + selects


def oracle_bpe_encode(n_merges: int = N_MERGES) -> str:
    """Encode twin: the training chain, then every document word exploded
    with position, character-split, and passed through all n merge folds
    in rank order; per-doc subword count + position-ordered reassembly."""
    parts = _bpe_cte_parts(n_merges)
    parts.append(
        """dw AS (
        SELECT doc_id, w.wpos AS wpos,
               list_transform(range(1, length(w.word) + 1),
                              i -> substring(w.word, i, 1)) AS syms
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(ts) + 1),
                         i -> struct_pack(wpos := i, word := ts[i]))) AS w
              FROM (SELECT doc_id,
                           list_filter(string_split(lower(text), ' '),
                                       t -> t <> '') AS ts
                    FROM documents))
    )"""
    )
    prev = "dw"
    for i in range(n_merges):
        body = _merge_fold_sql(prev, f"b{i}").format(cols="doc_id, wpos")
        parts.append(f"""e{i} AS (
        {body}
    )""")
        prev = f"e{i}"
    final = f"""SELECT doc_id, COUNT(*) AS n_words,
           CAST(SUM(len(syms)) AS BIGINT) AS n_subwords,
           string_agg(array_to_string(syms, ' '), ' ' ORDER BY wpos)
               AS subword_text
    FROM {prev} GROUP BY doc_id"""
    return "WITH " + ",\n    ".join(parts) + "\n    " + final


ORACLE_BPE_TRAIN = oracle_bpe_train()
ORACLE_BPE_ENCODE = oracle_bpe_encode()
