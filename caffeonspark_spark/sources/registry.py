"""Source/sink registry.

Reference parity (SURVEY.md §2 S1-S9 / K1-K6):

* S4/S5 generic DataFrame scan with pluggable format string
  (``DataFrameSource.scala:80-107``, ``ImageDataFrame.scala:31-73``) →
  ``read_source(spark, fmt, path, select_expr=...)``. The reference's
  optional ``selectExpr`` projection hook (``ImageDataFrame.scala:40-45``)
  is kept verbatim — it is how users rename/derive columns at scan time and
  it keeps column pruning inside Catalyst.
* S1/S2 LMDB scan + not-null filter + DISK_ONLY cache (``LmdbRDD.scala:36-155``,
  ``LMDB.scala:31-43``) → the rebuild stores image tuples as parquet; the
  not-null payload filter and optional persist are reproduced in
  ``read_images``.
* S3 SequenceFile (``SeqImageDataSource.scala:24-69``) → from-spec
  container reader ``sources/seqfile.py`` (format ``"sequencefile"``);
  S8 whole-binary-file ingest (``Binary2Sequence.scala:56-73``) →
  ``binaryFile`` built-in format.
* S6 JSON / S7 text → native readers.
* S9 reflection registry (``DataSource.scala:133-166``) → this format-string
  table (no reflection: formats are data, not classes).
* K1-K4 sinks (``CaffeOnSpark.scala:57``, ``Binary2Sequence.scala:31``,
  ``Vocab.scala:47``) → ``write_sink`` incl. the coalesce(1) single-file text
  mode used for vocab files.

Scale note: all file sources go through Spark's DataSource V2 paths, so
predicate pushdown / column pruning / partition pruning apply; nothing here
materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# formats the engine accepts; values are the underlying Spark format names
SOURCE_FORMATS = {
    "parquet": "parquet",
    "json": "json",
    "csv": "csv",
    "text": "text",
    "orc": "orc",
    "binary": "binaryFile",  # S8: whole-file bytes + path/length metadata
    "binaryFile": "binaryFile",
    # S1/S9: custom Python DataSource (sources/imagedir.py) — dir of binary
    # files + "filename label [id]" label file, planned partitions, label
    # filter pushdown
    "imagedir": "cos_imagedir",
    # S1: from-spec LMDB byte-format reader (sources/lmdb.py) — B-tree
    # leaf-range planned partitions + Datum decode, LmdbRDD.scala parity
    "lmdb": "cos_lmdb",
    # S3: from-spec Hadoop SequenceFile reader (sources/seqfile.py) —
    # sync-split byte-range planned partitions + Java-serialized key
    # decode, SeqImageDataSource.scala parity
    "sequencefile": "cos_seqfile",
}

SINK_FORMATS = {"parquet", "json", "csv", "text", "orc"}

# the universal image-tuple schema every reference image source produces
# (ImageDataSource.scala:27-29, LMDB2DataFrame.scala:12-18; FIXTURES.md §1)
IMAGE_TUPLE_SCHEMA = (
    "id string, label string, channels int, height int, width int, "
    "encoded boolean, data binary"
)


def read_source(
    spark: SparkSession,
    fmt: str,
    path: str,
    select_expr: list[str] | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Generic scan with pluggable format + optional selectExpr projection."""
    if fmt not in SOURCE_FORMATS:
        raise ValueError(f"unknown source format {fmt!r}; known: {sorted(SOURCE_FORMATS)}")
    if fmt == "imagedir":
        from caffeonspark_spark.sources.imagedir import register

        register(spark)  # load(path) surfaces as options["path"] in the reader
    elif fmt == "lmdb":
        from caffeonspark_spark.sources.lmdb import register as register_lmdb

        register_lmdb(spark)
    elif fmt == "sequencefile":
        from caffeonspark_spark.sources.seqfile import register as register_seq

        register_seq(spark)
    reader = spark.read.format(SOURCE_FORMATS[fmt]).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    if select_expr:
        df = df.selectExpr(*select_expr)
    return df


def read_images(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    drop_null_data: bool = True,
    persist_disk: bool = False,
) -> DataFrame:
    """Image-tuple source: scan + payload not-null filter (+ optional
    DISK_ONLY persist), the ``LMDB.makeRDD`` semantics (``LMDB.scala:31-43``).

    At 100 TB prefer recompute-with-pushdown over persist — the flag
    defaults off and exists for iterative training loops that rescan.
    """
    df = read_source(spark, fmt, path)
    missing = {c for c in ("id", "label", "data") if c not in df.columns}
    if missing:
        raise ValueError(f"image source missing required columns {sorted(missing)}")
    if drop_null_data:
        df = df.where(F.col("data").isNotNull())
    if persist_disk:
        df = df.persist(StorageLevel.DISK_ONLY)
    return df


def write_sink(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Pluggable-format sink (``df.write.format(conf.outputFormat).save``,
    ``CaffeOnSpark.scala:57``). ``single_file=True`` reproduces the vocab
    writer's ``coalesce(1)`` contract (``Vocab.scala:47``)."""
    if fmt not in SINK_FORMATS:
        raise ValueError(f"unknown sink format {fmt!r}; known: {sorted(SINK_FORMATS)}")
    if single_file:
        df = df.coalesce(1)
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
