"""Dataset-composition operators for training-data pipelines.

The reference engine stops at per-source scans and interleaved train/test
partitioning (``CaffeOnSpark.scala:427-506`` train/validation interleave);
a 100 TB corpus pipeline additionally needs REPRODUCIBLE dataset surgery:
deterministic splits, per-source quotas, and temperature-based mixture
reweighting (the public LM-pipeline recipe: sample source s with
probability ∝ n_s^(1/T)).

Everything here is a pure function of row keys and source counts — no RNG
state, no engine-specific sampling — so every operator hash-matches its
DuckDB oracle and reruns/retries/other engines agree row-for-row. All
plans are map-only or one tiny broadcast agg; the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from caffeonspark_spark.catalog import load_table
from caffeonspark_spark.operators.partitioning import (
    _SAMPLE_A,
    _SAMPLE_B,
    _SAMPLE_MOD,
    sample_hash,
)


def split_assign(
    df: DataFrame, key_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Assign every row to a named split (train/val/test...) by hash
    threshold: h(key)/p lands in the cumulative-fraction interval of its
    split. Map-only, deterministic, and STABLE under corpus growth — a row's
    split never changes when other rows are added/removed (the property
    random shuffles lack, and the reason eval contamination audits want
    hash splits). Fraction order follows dict insertion order; fractions
    must cover the whole hash range — a sum below 1 would otherwise
    silently dump the uncovered tail into the last split (train 0.8 /
    val 0.1 would hand val 20%)."""
    if not fractions:
        raise ValueError("fractions must be a non-empty dict")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split fractions must sum to 1 (got {total}); the uncovered "
            "hash tail would silently inflate the last split"
        )
    h = sample_hash(F.col(key_col))
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        cond = h < F.lit(cum * _SAMPLE_MOD)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr.otherwise(F.lit(list(fractions)[-1])))


def split_assign_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: 80/10/10 train/val/test assignment of documents."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})


ORACLE_SPLIT_ASSIGN = """
    SELECT doc_id, source,
           CASE WHEN h < 0.8 * 2147483647 THEN 'train'
                WHEN h < 0.9 * 2147483647 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source,
               ((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
        FROM documents
    )
"""


def source_quota_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    k: int,
    prefilter_factor: int = 8,
) -> DataFrame:
    """Keep (up to) the ``k`` hash-smallest rows per source — a
    deterministic per-source quota (cap over-represented crawls at k docs).

    Scale shape: ranking k-of-n_s per source is a per-source sort, which a
    single hot source would serialize (the pack_documents lesson). So the
    DEFINED semantics prefilter first: keep rows with
    h < min(1, factor*k/n_s) * p  — a map-only filter using one broadcast
    count per source — then rank only the ~factor*k survivors. The window
    input is O(factor*k) per source regardless of n_s, and the prefilter is
    part of the operator contract (same rows in any engine), not a lossy
    approximation bolted on: with factor 8 the chance a true top-k row is
    filtered is Chernoff-negligible, and BOTH engines apply the identical
    rule, so results still match cell-for-cell."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    h = sample_hash(F.col(key_col))
    frac = F.least(F.lit(1.0), F.lit(float(prefilter_factor * k)) / F.col("_n"))
    pre = (
        df.join(F.broadcast(counts), source_col)
        .withColumn("_h", h)
        .where(F.col("_h") < frac * F.lit(float(_SAMPLE_MOD)))
    )
    w = Window.partitionBy(source_col).orderBy("_h", key_col)
    return (
        pre.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_n", "_h", "_rk")
    )


def source_quota_docs(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Declared query: at most 25 hash-chosen documents per source."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return source_quota_sample(docs, "source", "doc_id", k)


ORACLE_SOURCE_QUOTA = """
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    pre AS (
        SELECT doc_id, d.source,
               ((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
        FROM documents d JOIN counts c ON d.source = c.source
        WHERE ((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647
              < least(1.0, 200.0 / c.n) * 2147483647.0
    )
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
        FROM pre
    ) WHERE rk <= 25
"""


def temperature_resample_plan(
    df: DataFrame, source_col: str
) -> DataFrame:
    """Per-source mixture reweighting at temperature T=2 (the public
    multilingual/multi-source recipe: w_s ∝ n_s^(1/T), here sqrt — chosen
    because sqrt is IEEE-exact, so the plan is bit-reproducible across
    engines; arbitrary-T pow is libm-dependent). Emits the resampling plan:
    weight, target doc count at constant corpus size, and the integer
    epoch/repeat factor an exploding resampler would apply.

    The cross-source normalizer Σ√n_s is a fold over the SORTED weight list
    (collect_list of one row per source — driver-size metadata), because a
    plain SUM(double) is combine-order-dependent; sorting first makes the
    double fold deterministic at any parallelism."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = F.broadcast(
        counts.agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.sqrt(F.col("n_docs")))),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("z"),
            F.sum("n_docs").alias("n_total"),
        )
    )
    weight = F.sqrt(F.col("n_docs")) / F.col("z")
    target = F.round(weight * F.col("n_total")).cast("long")
    return (
        counts.crossJoin(tot)
        .select(
            source_col,
            "n_docs",
            weight.alias("weight"),
            target.alias("target_docs"),
            F.ceil(target.cast("double") / F.col("n_docs")).cast("long").alias("repeat_factor"),
        )
    )


def temperature_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: T=2 resampling plan over document sources."""
    return temperature_resample_plan(
        load_table(spark, sf_dir, "documents"), "source"
    )


ORACLE_TEMPERATURE_RESAMPLE = """
    WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    tot AS (
        SELECT list_reduce([CAST(0 AS DOUBLE)] || list_sort(list(sqrt(n_docs))),
                           (a, x) -> a + x) AS z,
               SUM(n_docs) AS n_total
        FROM counts
    )
    SELECT source, n_docs,
           sqrt(n_docs) / z AS weight,
           CAST(round(sqrt(n_docs) / z * n_total) AS BIGINT) AS target_docs,
           CAST(ceil(round(sqrt(n_docs) / z * n_total) / n_docs) AS BIGINT)
               AS repeat_factor
    FROM counts, tot
"""


def resample_epochs(df: DataFrame, source_col: str, key_col: str) -> DataFrame:
    """Materialize the T=2 resampling plan: each row repeated
    ``repeat_factor`` times with an ``epoch`` index (then hash-filtered down
    to the exact target in a real pipeline). Explode-of-sequence is a
    codegen generator — the corpus streams through map-side; only the tiny
    per-source plan is broadcast."""
    plan = temperature_resample_plan(df, source_col).select(
        source_col, "repeat_factor"
    )
    return (
        df.join(F.broadcast(plan), source_col)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("repeat_factor"))))
        .drop("repeat_factor")
    )


# --- deterministic shuffle-shard export -----------------------------------

def shuffle_shards(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle into training shards: every row gets a
    ``(shard, pos)`` address from a seeded hash scramble of its key — the
    export step that fixes training-data order before an LM run.

    Properties a training pipeline needs and RNG shuffles lack:
    * REPRODUCIBLE — shard/pos are a pure function of (key, seed); reruns,
      retries, and other engines produce the identical layout.
    * RESHUFFLABLE — a new seed is a new permutation; epochs can reshuffle
      without re-reading anything but the key column.
    * SCALE-SAFE — no global sort: the scramble is map-only, the shard
      assignment shuffles once on the shard id, and position is a
      within-shard sort (choose n_shards so one shard fits an executor;
      at 100 TB that is thousands of shards, which also matches the
      shard-per-file export layout downstream loaders want).

    DuckDB twin: ``((key + seed) % p * a + b) % p`` with row_number() over
    (shard, scramble) — fully hash-checkable.
    """
    k = F.pmod(
        F.pmod(F.col(key_col).cast("long") + F.lit(seed), F.lit(_SAMPLE_MOD))
        * F.lit(_SAMPLE_A)
        + F.lit(_SAMPLE_B),
        F.lit(_SAMPLE_MOD),
    )
    out = df.withColumn("_shuffle_key", k).withColumn(
        "shard", F.pmod(F.col("_shuffle_key"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_shuffle_key", key_col)
    return (
        out.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_shuffle_key")
    )


def shuffle_shards_docs(
    spark: SparkSession, sf_dir: str, n_shards: int = 8, seed: int = 42
) -> DataFrame:
    """Declared query: documents shuffled into 8 training shards, seed 42."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return shuffle_shards(docs, "doc_id", n_shards, seed)


ORACLE_SHUFFLE_SHARDS = f"""
    SELECT doc_id, source, CAST(h % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM (
        SELECT doc_id, source,
               ((doc_id + 42) % {_SAMPLE_MOD} * {_SAMPLE_A} + {_SAMPLE_B})
                 % {_SAMPLE_MOD} AS h
        FROM documents
    )
"""


def leakage_safe_split(
    spark: SparkSession,
    sf_dir: str,
    fractions: dict[str, float] | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents NEVER
    straddle splits. A hash split on doc_id (``split_assign``) puts ~20%
    of each near-dup cluster's members in val/test while their twins
    train — the classic eval-contamination leak a dedup pipeline exists
    to prevent. Here the split key is the near-dup CLUSTER representative
    (min doc_id of the connected component, from ``neardup_clusters``;
    singleton docs are their own group), so the whole cluster lands in
    one split, and the assignment keeps ``split_assign``'s stability
    property — adding or removing unrelated docs never moves a group.

    Scale shape: the components table is EDGE-SET sized (only clustered
    docs appear), joined back to the corpus by one equi-join on doc_id;
    the split itself stays map-only. Oracle: the recursive-CTE component
    oracle composed with the LCG split arithmetic — both engines compute
    identical group keys and thresholds."""
    from caffeonspark_spark.operators.dedup import neardup_clusters

    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    comp = neardup_clusters(spark, sf_dir, threshold=threshold).select(
        F.col("node"), F.col("component")
    )
    grouped = docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id",
        "source",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("group_id"),
    )
    return (
        split_assign(grouped, "group_id", fractions)
        .select("doc_id", "source", "group_id", "split")
        .orderBy("doc_id")
    )


def _oracle_leakage_safe_split() -> str:
    """Recursive-CTE components + LCG split — composed from the shared
    component oracle so the cluster arithmetic has one source of truth."""
    from caffeonspark_spark.operators.dedup import _oracle_neardup_clusters

    whole = _oracle_neardup_clusters()
    marker = "SELECT node, MIN(lbl)"
    if marker not in whole:  # fail at import, not with invalid spliced SQL
        raise RuntimeError(
            "leakage_safe_split oracle splice marker vanished from "
            "_oracle_neardup_clusters; update the splice together with it"
        )
    base = whole.rsplit(marker, 1)[0]
    return (
        base
        + f""",
    comp AS (
        SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
    ),
    grouped AS (
        SELECT d.doc_id, d.source, COALESCE(c.component, d.doc_id) AS group_id
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, source, group_id,
           CASE WHEN h < 0.8 * {_SAMPLE_MOD} THEN 'train'
                WHEN h < 0.9 * {_SAMPLE_MOD} THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source, group_id,
               ((group_id % {_SAMPLE_MOD}) * {_SAMPLE_A} + {_SAMPLE_B})
                 % {_SAMPLE_MOD} AS h
        FROM grouped
    )
    ORDER BY doc_id
"""
    )


ORACLE_LEAKAGE_SAFE_SPLIT = _oracle_leakage_safe_split()
