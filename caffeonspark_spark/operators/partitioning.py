"""Partitioning / physical-layout operators (SURVEY.md §2 X1-X3).

The reference hand-manages physical layout for its training loop; these are
the Spark-native equivalents, kept as *explicit* operators because training
orchestration genuinely needs them (Catalyst covers everything else):

* ``repartition_multiple``   — X1: force partition count to a multiple of the
  cluster size (``CaffeOnSpark.scala:173-179``).
* ``fixed_size_partitions``  — X2: EXACTLY ``part_len`` records per partition
  via row_number over a stable order (``FixedSizePartitioner.scala:8-14``,
  ``CaffeOnSpark.scala:363-375``). Spark's repartition balances bytes, not
  counts — training interleave math needs exact counts (SURVEY §7.4 risk 2).
* ``partition_window``       — X3: select the i-th window of partitions per
  training round (``PartitionPruningRDD`` use, ``CaffeOnSpark.scala:286-301``)
  as a row-range filter — partition-pruned by Catalyst when the frame is
  written out partitioned by ``_part``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PART_COL = "_part"
ROW_COL = "_row_in_part"


def repartition_multiple(df: DataFrame, cluster_size: int, target: int | None = None) -> DataFrame:
    """Repartition to the smallest multiple of ``cluster_size`` ≥ current
    partitions (or ``target`` rounded up) — the reference's invariant that
    every executor gets equal work waves."""
    current = target or df.rdd.getNumPartitions()
    n = ((current + cluster_size - 1) // cluster_size) * cluster_size
    return df.repartition(n)


def with_fixed_size_partition_ids(
    df: DataFrame, part_len: int, order_cols: list[str]
) -> DataFrame:
    """Add ``_part`` (0-based partition id) and ``_row_in_part`` columns such
    that every ``_part`` holds exactly ``part_len`` rows (last one partial),
    under the total order given by ``order_cols`` (must be a unique key —
    the determinism contract the reference gets from zipWithIndex).
    """
    if not order_cols:
        raise ValueError("order_cols must define a total order (unique key)")
    w = Window.orderBy(*[F.asc(c) for c in order_cols])
    idx = F.row_number().over(w) - F.lit(1)
    return df.withColumn(PART_COL, (idx / part_len).cast("long")).withColumn(
        ROW_COL, idx % part_len
    )


def fixed_size_partitions(df: DataFrame, part_len: int, order_cols: list[str]) -> DataFrame:
    """Physically repartition so each Spark partition holds exactly the rows
    of one ``_part`` group (``FixedSizePartitioner`` semantics).

    Placement is an IDENTITY partitioner over the dense ``_part`` id via
    ``RDD.partitionBy`` — hash ``repartition(n, _part)`` put multiple
    groups in one partition under murmur3 collisions and left others
    empty, silently breaking the exactly-``part_len`` contract the
    training interleave math depends on (r7 self-review finding). The
    RDD round-trip is the one place the engine needs a custom
    partitioner, exactly like the reference's FixedSizePartitioner; the
    partition count comes from a plain count() (the global row_number
    ordering pass runs ONCE, in the repartition job, not twice).

    Note the global ``row_number`` is a single-ordering pass — at 100 TB,
    prefer ``repartitionByRange`` on a pre-computed dense key when the data
    already carries one; this operator is for training-feed correctness, not
    bulk ETL.
    """
    n = max(1, -(-df.count() // part_len))
    tagged = with_fixed_size_partition_ids(df, part_len, order_cols)
    part_idx = tagged.columns.index(PART_COL)
    keyed = tagged.rdd.map(lambda r: (r[part_idx], r))
    placed = keyed.partitionBy(n, lambda k: int(k)).values()
    out = tagged.sparkSession.createDataFrame(placed, tagged.schema)
    return out.sortWithinPartitions(PART_COL, ROW_COL)


def partition_window(df: DataFrame, window_idx: int, windows_total: int, part_len: int,
                     order_cols: list[str]) -> DataFrame:
    """Rows of the ``window_idx``-th training window: partitions i where
    i % windows_total == window_idx (the interleaved train/validation wave
    selection of ``CaffeOnSpark.scala:286-301``)."""
    tagged = with_fixed_size_partition_ids(df, part_len, order_cols)
    return tagged.where(F.pmod(F.col(PART_COL), F.lit(windows_total)) == window_idx)


def fixed_size_partition_query(df_or_spark, sf_dir=None):
    """Declared query (X2): orders tagged with exact-1000-row partition ids
    under the o_orderkey total order — oracle-checkable row_number math."""
    from caffeonspark_spark.catalog import load_table

    df = load_table(df_or_spark, sf_dir, "orders")
    tagged = with_fixed_size_partition_ids(df, 1000, ["o_orderkey"])
    return tagged.select("o_orderkey", PART_COL, ROW_COL)


ORACLE_FIXED_SIZE_PARTITION = """
    SELECT o_orderkey,
           CAST((rn - 1) // 1000 AS BIGINT) AS _part,
           CAST((rn - 1) % 1000 AS BIGINT) AS _row_in_part
    FROM (SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey ASC) AS rn
          FROM orders)
"""


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist a DataFrame as a bucketed (+sorted) table on ``key``.

    Bucketing is THE shuffle-elimination tool at 100 TB: two tables bucketed
    on the same key with the same bucket count join with ZERO exchange (and
    zero sort, if sorted) — the shuffle is paid once at write time, then
    every subsequent join/aggregation on the key is co-located. The
    reference hand-built this invariant with FixedSizePartitioner +
    placement; Spark's bucketed catalog tables are the declarative form.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_equi_join(spark, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — plan must
    contain no Exchange (asserted in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    left_unique: str | None = None,
) -> DataFrame:
    """Skew-mitigated equi join: salt the (possibly skewed) left side into
    ``n_salt`` sub-keys, replicate the right side across all salts, join on
    (key, salt). Result rows == plain ``left.join(right, key)``.

    The classic fix when one hot key overwhelms a task: the hot key's rows
    spread over ``n_salt`` tasks at the cost of replicating the right side
    ``n_salt``× (use for large⋈medium; AQE skew-join handles large⋈large).
    Salt is deterministic: ``xxhash64`` of ``left_unique`` when given,
    else ``xxhash64`` over ALL left columns — a pure function of row
    content, so reruns and shuffle-retry recomputations salt identically
    (``monotonically_increasing_id`` depended on task layout: two runs
    salted differently and a fetch-failure retry could re-salt rows whose
    prior shuffle output was already consumed — the classic
    nondeterministic-expression-upstream-of-shuffle hazard; r7
    self-review finding). Identical duplicate rows share a salt, which
    only matters if the hot key's rows are literal full-row duplicates.
    """
    salt_src = (
        F.xxhash64(F.col(left_unique))
        if left_unique
        else F.xxhash64(*[F.col(c) for c in left.columns])
    )
    l_s = left.withColumn("_salt", F.pmod(salt_src, F.lit(n_salt)).cast("int"))
    r_s = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l_s.join(r_s, [key, "_salt"]).drop("_salt")


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``df.sampleBy``) — the
    training-data-mix primitive (downsample over-represented sources,
    keep rare strata). Deterministic under a fixed seed; no shuffle — each
    partition samples locally."""
    return df.sampleBy(stratum_col, fractions, seed)


# LCG scramble constants (public, glibc rand): key % p keeps the product
# below 2^62 so the arithmetic is exact in any engine's 64-bit integers
_SAMPLE_MOD = (1 << 31) - 1
_SAMPLE_A = 1103515245
_SAMPLE_B = 12345


def sample_hash(key: F.Column) -> F.Column:
    """Engine-portable pseudo-random scramble of an integer key into
    [0, 2^31-1): h = ((key mod p) * a + b) mod p. The basis for
    deterministic, REPRODUCIBLE sampling — the same row is kept on every
    engine, run, and retry (unlike Bernoulli ``sampleBy``, whose RNG is
    engine-specific). DuckDB twin: ``((key % p) * a + b) % p``."""
    return F.pmod(
        F.pmod(key.cast("long"), F.lit(_SAMPLE_MOD)) * F.lit(_SAMPLE_A) + F.lit(_SAMPLE_B),
        F.lit(_SAMPLE_MOD),
    )


def stratified_sample_hash(
    df: DataFrame, stratum_col: str, fractions: dict, key_col: str
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    sample_hash(key) / p < fraction(stratum). Map-only (no shuffle, no RNG
    state); the kept set is a stable function of the key, so reruns,
    speculative retries, and other engines agree row-for-row — the property
    audit pipelines need that ``sampleBy`` cannot give across engines."""
    frac = None
    for stratum, f in sorted(fractions.items()):
        cond = F.col(stratum_col) == stratum
        frac = F.when(cond, F.lit(f)) if frac is None else frac.when(cond, F.lit(f))
    frac = frac.otherwise(F.lit(0.0))
    h = sample_hash(F.col(key_col))
    return df.where(h < frac * F.lit(float(_SAMPLE_MOD)))


def hot_key_salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    hot_threshold: int = 100_000,
    left_unique: str | None = None,
) -> DataFrame:
    """Partial (hot-key-only) salted join: detect keys whose left-side count
    exceeds ``hot_threshold`` (one cheap 8-byte-key agg), then salt ONLY
    those — cold keys join normally (salt 0), hot keys spread over
    ``n_salt`` tasks with the right side replicated for hot keys alone.

    Strictly better than full salting at scale: replication cost is paid on
    the handful of hot keys instead of the whole right table. The hot-key
    set is broadcast (bounded: few keys exceed any sane threshold by
    definition). Result rows == plain ``left.join(right, key)``. Salt is
    content-deterministic like ``salted_equi_join`` (retry-safe; see its
    docstring).
    """
    hot = (
        left.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > hot_threshold)
        .select(key, F.lit(True).alias("_hot"))
    )
    salt_src = (
        F.xxhash64(F.col(left_unique))
        if left_unique
        else F.xxhash64(*[F.col(c) for c in left.columns])
    )
    l_tag = (
        left.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(salt_src, F.lit(n_salt)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    r_tag = (
        right.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salt - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .drop("_hot")
        .withColumn("_salt", F.explode(F.col("_salts")))
        .drop("_salts")
    )
    return l_tag.join(r_tag, [key, "_salt"]).drop("_salt")


def cluster_by_write(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Write parquet clustered on ``cols``: range-repartition into
    ``n_files`` disjoint key ranges, sort rows within each, then write —
    so every output file covers a narrow, non-overlapping slice of the key
    space and its parquet min/max footer stats actually discriminate.

    This is the write-side half of data skipping: a later scan with a
    predicate on ``cols`` prunes whole files/row-groups from the footer
    stats alone. At 100 TB this (or bucketing, for join keys) is the
    difference between touching TBs and touching GBs for selective
    queries; unclustered data has every file spanning the full key range,
    making min/max stats useless. (Reference analogue: none — it re-read
    everything; this is the Spark-native layout contract.)
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )
