"""BPE tokenizer training on the corpus (LLM-pipeline extension).

The reference ships a word-level vocab builder (``Vocab.scala:34-63`` —
groupBy-count-sort-take); modern pipelines train a subword (BPE) vocabulary
instead. This module implements the classic scalable BPE trainer shape:

1. ONE corpus scan builds the word-frequency table (vocab-sized, ≪ corpus).
2. Every merge round runs on that table only: count adjacent symbol pairs
   (weighted by word frequency), pick the most frequent pair, apply the
   merge to every word's symbol sequence with a greedy left-to-right fold.

Each round's winning pair is a 1-row driver collect (metadata, exactly like
``kmeans_fit``'s k·dim centroid collect), and the merge application is a
pure Catalyst ``aggregate`` fold — no Python row path. At 100 TB the corpus
is touched once; the iteration cost is O(n_merges × |vocab|), independent
of corpus size.

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


def _best_pair(vocab: DataFrame):
    """Most frequent adjacent symbol pair, tie-broken (pair_count DESC,
    lhs ASC, rhs ASC) — a 1-row driver collect per round."""
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
    row = (
        pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("c"))
        .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
        .limit(1)
        .collect()
    )
    return row[0] if row else None


def _apply_merge(vocab: DataFrame, l: str, r: str) -> DataFrame:
    """Greedy left-to-right merge of the (l, r) pair in every symbol
    sequence — a Catalyst ``aggregate`` fold with an array accumulator.
    The pair rides in as ``F.lit`` values (never spliced into SQL text),
    so symbols containing quotes/backslashes can't break or skew the
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

    return vocab.withColumn(
        "syms",
        F.aggregate("syms", F.array().cast("array<string>"), merge),
    )


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the documents corpus; returns the
    merge table (merge_rank, lhs, rhs, pair_count) — the artifact a
    tokenizer loads. All counts are exact BIGINTs, so the result
    hash-matches the unrolled DuckDB twin bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    base = _word_vocab(docs).persist()
    try:
        vocab = base
        merges = []
        for rank in range(n_merges):
            best = _best_pair(vocab)
            if best is None:
                break
            merges.append((rank, best["l"], best["r"], best["c"]))
            if rank < n_merges - 1:
                vocab = _apply_merge(vocab, best["l"], best["r"])
        return spark.createDataFrame(
            merges, "merge_rank int, lhs string, rhs string, pair_count long"
        )
    finally:
        # only the round-0 word table is persisted; later rounds stack
        # cheap fold expressions on top of it, and the result rows are
        # already collected driver metadata
        base.unpersist()


def oracle_bpe_train(n_merges: int = N_MERGES) -> str:
    """DuckDB twin with the merge rounds unrolled into chained CTEs: each
    round computes its best pair (b{i}) and derives the next vocab (v{i+1})
    with the same greedy list_reduce fold."""
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
            parts.append(
                f"""v{i+1} AS (
        SELECT word, freq,
               list_reduce(list_transform(syms, s -> [s]),
                 (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b{i}.l
                                       AND x[1] = b{i}.r
                                  THEN acc[:len(acc)-1] || [b{i}.l || b{i}.r]
                                  ELSE acc || x END) AS syms
        FROM v{i} CROSS JOIN b{i}
    )"""
            )
    selects = "\n    UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l AS lhs, r AS rhs,"
        f" CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(n_merges)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + selects


ORACLE_BPE_TRAIN = oracle_bpe_train()
