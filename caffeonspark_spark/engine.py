"""Engine entry point: session construction + configuration.

Replaces the reference's ``Config.scala`` (CLI-knob soup at
``caffe-grid/src/main/scala/com/yahoo/ml/caffe/Config.scala:403-499``) with a
small dataclass of the knobs that still make sense for a Spark-native engine,
and the reference's hand-rolled SparkConf setup (``CaffeOnSpark.scala:27-34``)
with an idiomatic SparkSession builder: AQE on, Arrow on, UTC session
timezone (required for oracle comparison), shuffle partitions sized to cores
rather than the 200 default.

Scale note: every default here is chosen to survive a 1000-executor / 100 TB
deployment — AQE handles skew + partition coalescing at runtime, shuffle
partition count is only a *local* override (on a real cluster AQE's
``advisoryPartitionSizeInBytes`` governs), and nothing below pins
local-mode-only behavior into query plans.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


@dataclass
class Config:
    """Engine configuration.

    Mirrors the *surviving* knobs of the reference's ``Config.scala`` —
    paths/formats/labels/features/partitions — dropping everything that was
    Caffe- or RDMA-specific (devices, connection, snapshots are handled by
    the pluggable trainer in ``ml/``).
    """

    master: str = field(default_factory=lambda: f"local[{DEFAULT_CPUS}]")
    app_name: str = "caffeonspark_spark"
    shuffle_partitions: int = 32
    # input/output (reference: -train/-test/-features/-output/-outputFormat)
    input_format: str = "parquet"
    output_format: str = "parquet"
    # label/feature column names (reference: -label, -features)
    label_col: str = "label"
    feature_cols: tuple[str, ...] = ()
    # partition control (reference: -clusterSize, -lmdb_partitions)
    target_partitions: int | None = None
    # file-split sizing: at 100 TB these bound per-task input so partitions
    # fit executor memory (128 MB splits → ~800k map tasks over 100 TB; raise
    # for wide clusters, lower for memory-tight executors). openCost biases
    # Spark against gluing many small files into one split.
    max_partition_bytes: str = "128m"
    open_cost_bytes: str = "4m"
    extra_conf: dict[str, str] = field(default_factory=dict)


def get_spark(config: Config | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    UTC timezone + Arrow + AQE are non-negotiable engine invariants:
    UTC so timestamps hash-match external oracles, Arrow so every
    pandas/NumPy exchange is columnar, AQE so skewed joins and
    mis-sized shuffles self-correct at runtime (the 100 TB posture —
    we declare the plan, AQE picks physical parallelism).
    """
    config = config or Config()
    builder = (
        SparkSession.builder.master(config.master)
        .appName(config.app_name)
        .config("spark.sql.shuffle.partitions", str(config.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom-filter join: build a bloom from the selective side
        # and push it into the large side's scan (the §7.4 "bloom
        # pre-filter" as a Catalyst runtime optimization; thresholds keep
        # their scale-appropriate defaults)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # r17: let AQE re-optimize the plan fragment that BUILDS a cached
        # relation (default false keeps a cache's output partitioning
        # fixed for exchange reuse). Every memo pin's fill otherwise runs
        # its shuffles at the static spark.sql.shuffle.partitions width no
        # matter how small the data — profiled as near-empty 32-task
        # stages inside every pin build. With this on, pin builds get the
        # same size-adaptive coalescing every other query gets; the pin
        # read side is handled by the dedup memo's byte-sized view.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", config.max_partition_bytes)
        .config("spark.sql.files.openCostInBytes", config.open_cost_bytes)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # ContextCleaner is weak-reference-driven: with a large heap the
        # JVM may not GC for the whole life of a many-query session, so
        # unpersisted shuffle/broadcast/RDD state is never actually
        # cleaned and driver scheduling degrades cumulatively (measured
        # r16: a 28-join query ran 6.4 -> 10.3 -> 12.7 s across serialized
        # repeats purely from backlog; a forced GC restored 4.0 s). The
        # default periodicGC interval (30min) never fires inside shorter
        # sessions — 3min bounds the backlog in any long-lived deployment.
        .config("spark.cleaner.periodicGC.interval", "3min")
        .config("spark.ui.enabled", "false")
    )
    for k, v in config.extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


class Engine:
    """Facade tying session + catalog + source registry together.

    The reference's top-level object is ``CaffeOnSpark(conf)`` holding a
    SparkContext and exposing train/test/features
    (``CaffeOnSpark.scala:36-82``); this Engine is the analogous root but
    query-first: ``engine.table("lineitem")`` / ``engine.sql(...)`` /
    ``engine.read(fmt, path)``, with the ML verbs living in ``ml/``.
    """

    def __init__(self, spark: SparkSession | None = None, config: Config | None = None):
        self.config = config or Config()
        self.spark = spark or get_spark(self.config)
        # populated by attach_catalog
        self.sf_dir: str | None = None

    # -- catalog ----------------------------------------------------------
    def attach_catalog(self, sf_dir: str) -> "Engine":
        """Register every testdata table under ``sf_dir`` as a temp view."""
        from caffeonspark_spark.catalog import register_tables

        register_tables(self.spark, sf_dir)
        self.sf_dir = sf_dir
        return self

    def table(self, name: str):
        from caffeonspark_spark.catalog import load_table

        if self.sf_dir is None:
            raise RuntimeError("attach_catalog(sf_dir) first")
        return load_table(self.spark, self.sf_dir, name)

    def sql(self, query: str):
        return self.spark.sql(query)

    # -- sources/sinks ----------------------------------------------------
    def read(self, fmt: str, path: str, **options):
        from caffeonspark_spark.sources.registry import read_source

        return read_source(self.spark, fmt, path, **options)

    def write(self, df, fmt: str, path: str, mode: str = "overwrite", **options):
        from caffeonspark_spark.sources.registry import write_sink

        return write_sink(df, fmt, path, mode=mode, **options)


def scale_out(df, min_partitions: int | None = None):
    """Rebalance a DataFrame whose scan produced fewer partitions than cores.

    Single-row-group parquet files (the local testdata) scan as ONE task, so
    everything up to the first shuffle — explodes, wide aggregations, Arrow
    UDFs — would run serially. This gate repartitions only when the plan is
    under-parallel: at 100 TB a scan has orders of magnitude more splits than
    ``defaultParallelism`` and this is a no-op; the round-robin shuffle it
    adds locally moves only the pre-explosion (narrow) rows.

    Use it in operators whose per-row compute dominates scan cost (shingle
    explosion, MinHash/SimHash agg trees, vectorized UDF stages) — NOT on
    plain relational scans, where it would sit between filter and scan and
    break predicate pushdown.

    The partition probe reads the INITIAL physical plan's RDD lineage —
    driver-side metadata only (file splits). It must NOT use
    ``df.rdd.getNumPartitions()``: under Spark 4's AQE, ``df.rdd``
    finalizes the adaptive plan, which EXECUTES the whole upstream subtree
    and throws the result away — profiled at sf0.1 as a hidden 1-2 s
    single-task job per scale_out call site (r16; the real action then
    re-ran the same subtree). Every current call site hands scale_out a
    scan-rooted narrow frame, for which the initial-plan count equals the
    executed count exactly.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().executedPlan()
        if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            plan = plan.initialPlan()
        current = plan.execute().getNumPartitions()
    except Exception:  # pragma: no cover - non-classic backend / plan quirk
        current = df.rdd.getNumPartitions()
    if current < target:
        return df.repartition(target)
    return df
