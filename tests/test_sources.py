"""Source/sink registry tests (SURVEY §2 S1-S9 / K1-K6).

Round-trip every registered format, the image-tuple source semantics
(not-null filter + optional DISK_ONLY persist, ``LMDB.scala:31-43``), the
single-file text sink (``Vocab.scala:47``), and — the 100 TB-relevant part —
partitioned writes whose reads are partition-PRUNED at the scan.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from caffeonspark_spark.sources.registry import read_images, read_source, write_sink


@pytest.fixture(scope="module")
def image_tuples(spark):
    rows = []
    for i in range(12):
        data = None if i % 4 == 3 else bytearray(bytes([i] * 16))
        rows.append((f"{i:08d}", str(i % 3), 1, 4, 4, False, data))
    return spark.createDataFrame(
        rows,
        "id string, label string, channels int, height int, width int, "
        "encoded boolean, data binary",
    )


def test_roundtrip_formats(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sink")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    for fmt in ["parquet", "json", "orc", "csv"]:
        path = str(base / fmt)
        write_sink(df, fmt, path, header=True)
        back = read_source(spark, fmt, path, header=True, inferSchema=True)
        assert back.count() == 100
        assert {r["s"] for r in back.collect()} == {f"v{i}" for i in range(100)}


def test_unknown_formats_rejected(spark):
    # "lmdb" was the example unknown format until r14 made it real
    with pytest.raises(ValueError):
        read_source(spark, "leveldb", "/nope")
    with pytest.raises(ValueError):
        write_sink(spark.range(1), "sequencefile", "/nope")


def test_single_file_text_sink(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vocabout") / "txt")
    df = spark.createDataFrame([(f"word{i}",) for i in range(20)], "value string")
    write_sink(df, "text", path, single_file=True)
    import glob

    parts = glob.glob(f"{path}/part-*")
    assert len(parts) == 1  # the coalesce(1) vocab-writer contract
    back = read_source(spark, "text", path)
    assert back.count() == 20


def test_image_source_notnull_and_persist(spark, image_tuples, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("imgs") / "tuples")
    write_sink(image_tuples, "parquet", path)
    imgs = read_images(spark, path)
    assert imgs.count() == 9  # 3 of 12 rows have null payloads
    assert imgs.where(F.col("data").isNull()).count() == 0
    cached = read_images(spark, path, persist_disk=True)
    assert cached.storageLevel.useDisk and not cached.storageLevel.useMemory
    cached.unpersist()


def test_image_source_missing_columns(spark, tmp_path_factory):
    """The declared-column validation of the reference source
    (DataFrameSource.scala:91-98): absent required columns fail fast."""
    path = str(tmp_path_factory.mktemp("badimgs") / "t")
    write_sink(spark.range(5).select(F.col("id").cast("string").alias("id")), "parquet", path)
    with pytest.raises(ValueError, match="missing required columns"):
        read_images(spark, path)


def test_binary_file_ingest(spark, tmp_path_factory):
    """S8: whole-file bytes via the binaryFile format."""
    d = tmp_path_factory.mktemp("blobs")
    payloads = {}
    for i in range(3):
        p = d / f"img{i}.bin"
        payload = bytes([i] * (10 + i))
        p.write_bytes(payload)
        payloads[f"img{i}.bin"] = payload
    df = read_source(spark, "binary", str(d))
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 3
    for r in rows:
        name = r["path"].rsplit("/", 1)[-1]
        assert bytes(r["content"]) == payloads[name]
        assert r["length"] == len(payloads[name])


def test_partitioned_write_prunes_scan(spark, tmp_path_factory):
    """K1 + X-class: partitionBy write, then a filtered read must show the
    partition filter at the scan (Catalyst partition pruning) and touch only
    the selected directory."""
    from caffeonspark_spark.plans.inspect import physical_plan

    path = str(tmp_path_factory.mktemp("parts") / "t")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 5).cast("int").alias("bucket")
    )
    write_sink(df, "parquet", path, partition_by=["bucket"])
    back = read_source(spark, "parquet", path).where(F.col("bucket") == 3)
    plan = physical_plan(back)
    assert "PartitionFilters" in plan and "bucket" in plan
    assert back.count() == 200
    # only one of five partition dirs is read
    assert back.select("id").distinct().count() == 200


def test_imagedir_datasource(spark, tmp_path):
    """Custom Python DataSource (S1/S9 parity): E2 schema, exact partition
    planning, executor-side byte reads."""
    from caffeonspark_spark.sources.imagedir import read_image_dir

    d = tmp_path / "imgs"
    d.mkdir()
    payloads = {}
    lines = []
    for i in range(10):
        name = f"img_{i}.bin"
        blob = bytes([i] * (i + 1))
        (d / name).write_bytes(blob)
        payloads[f"img_{i}"] = (i % 3, blob)
        lines.append(f"{name} {i % 3}")
    (d / "labels.txt").write_text("\n".join(lines) + "\n")

    df = read_image_dir(spark, str(d), partitions=4)
    assert df.columns == ["id", "label", "data"]
    assert df.rdd.getNumPartitions() == 4
    rows = {r["id"]: (r["label"], bytes(r["data"])) for r in df.collect()}
    assert rows == payloads


def test_imagedir_column_pruning_skips_payload_reads(spark, tmp_path):
    """r15 source-level column pruning: a metadata-only scan plans from
    the label manifest alone and never opens a payload file — proven by
    scanning a manifest whose payload files DON'T EXIST."""
    import pytest

    from caffeonspark_spark.sources.imagedir import read_image_dir

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "labels.txt").write_text(
        "".join(f"ghost_{i}.bin {i % 3}\n" for i in range(12))
    )
    meta = read_image_dir(spark, str(d), columns=["id", "label"])
    assert meta.columns == ["id", "label"]
    got = sorted((r.id, r.label) for r in meta.collect())
    assert got == sorted((f"ghost_{i}", i % 3) for i in range(12))
    # the full scan over the same manifest fails loudly (files missing)
    with pytest.raises(Exception, match="(?i)no such file|filenotfound"):
        read_image_dir(spark, str(d)).collect()
    with pytest.raises(ValueError, match="unknown columns"):
        read_image_dir(spark, str(d), columns=["nope"])


def test_imagedir_filter_pushdown_prunes_files(spark, tmp_path):
    """label = v pushes into planning: non-matching files are never opened
    (proven by deleting them from disk — the scan must still succeed)."""
    from caffeonspark_spark.sources.imagedir import read_image_dir

    d = tmp_path / "imgs2"
    d.mkdir()
    lines = []
    for i in range(6):
        name = f"f_{i}.bin"
        (d / name).write_bytes(b"x" * (i + 1))
        lines.append(f"{name} {i % 2}")
    (d / "labels.txt").write_text("\n".join(lines) + "\n")
    # delete every odd-label file: if the filter is NOT pushed, read() opens
    # them and the scan blows up with FileNotFoundError
    for i in range(6):
        if i % 2 == 1:
            (d / f"f_{i}.bin").unlink()

    df = read_image_dir(spark, str(d), partitions=2).where("label = 0")
    got = sorted(r["id"] for r in df.collect())
    assert got == ["f_0", "f_2", "f_4"]


def test_imagedir_in_filter_empty_result_and_malformed_lines(spark, tmp_path):
    """r7 self-review regressions: (1) a pushed `label IN (...)` predicate
    reads pyspark's In.value (the crash was `.values`); (2) a scan where
    every entry is pruned yields an EMPTY DataFrame, not a read(None)
    crash; (3) filename-only / non-integer-label lines are skipped like
    the Spark-side parser of the same grammar."""
    from caffeonspark_spark.sources.imagedir import read_image_dir

    d = tmp_path / "imgs3"
    d.mkdir()
    lines = []
    for i in range(4):
        name = f"g_{i}.bin"
        (d / name).write_bytes(b"y" * (i + 1))
        lines.append(f"{name} {i}")
    lines.append("orphan.bin")  # filename-only: must be skipped
    lines.append("bad.bin notanint")  # non-integer label: must be skipped
    (d / "labels.txt").write_text("\n".join(lines) + "\n")

    df = read_image_dir(spark, str(d), partitions=2)
    got = sorted(r["id"] for r in df.where("label in (1, 3)").collect())
    assert got == ["g_1", "g_3"]
    assert df.where("label = 999").count() == 0
    # pushed filters BAKE INTO a DataFrame's relation (the engine
    # re-pickles the post-pushdown source onto the shared plan node), so
    # an unfiltered scan needs a fresh read_image_dir — the documented
    # contract; malformed lines skipped, valid rows intact
    fresh = read_image_dir(spark, str(d), partitions=2)
    assert fresh.count() == 4


def test_eventgen_stream_source_exactly_once(spark):
    """Custom streaming DataSource: offset-managed micro-batches deliver
    every generated row exactly once, values being a pure function of the
    offset range (the replayability contract)."""
    from caffeonspark_spark.sources.event_stream import read_event_stream, row_for

    stream = read_event_stream(spark, rows_per_batch=64, max_rows=300, n_partitions=3)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("eventgen_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM eventgen_out").collect()
    assert len(rows) == 300
    got = {r["event_id"]: (r["user_id"], r["event_type"], r["value"]) for r in rows}
    assert len(got) == 300  # no duplicates
    for eid in (0, 1, 150, 299):
        _, uid, etype, val = row_for(eid)
        assert got[eid] == (uid, etype, val)


def test_eventgen_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Stop mid-stream and restart from the checkpoint: no re-emission, no
    gaps — the source's offset contract is what recovery leans on."""
    from caffeonspark_spark.sources.event_stream import read_event_stream

    out = str(tmp_path / "eg_out")
    chk = str(tmp_path / "eg_chk")

    def start(max_rows):
        return (
            read_event_stream(spark, rows_per_batch=50, max_rows=max_rows)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .start()
        )

    q = start(max_rows=100)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 100

    q = start(max_rows=250)  # the "upstream" grew; resume from offset 100
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 250
    ids = sorted(r["event_id"] for r in got.select("event_id").collect())
    assert ids == list(range(250))


def test_imagedir_write_read_roundtrip(spark, tmp_path):
    """DSv2 writer commit protocol: executors write payloads, the driver's
    commit writes the manifest; read-back through the source equals the
    input exactly."""
    from caffeonspark_spark.sources.imagedir import read_image_dir, write_image_dir

    rows = [(f"s{i}", i % 4, bytes([i, i + 1, i + 2])) for i in range(12)]
    df = spark.createDataFrame(rows, "id string, label int, data binary").repartition(3)
    out = str(tmp_path / "written")
    write_image_dir(df, out)

    back = read_image_dir(spark, out, partitions=2)
    got = {r["id"]: (r["label"], bytes(r["data"])) for r in back.collect()}
    assert got == {i: (l, d) for i, l, d in rows}


def test_imagedir_append_merges_manifest(spark, tmp_path):
    """A second append-mode write must MERGE into the existing manifest —
    rewriting it wholesale would orphan every previously written payload
    (the source plans exclusively from labels.txt). Overwrite mode rewrites."""
    from caffeonspark_spark.sources.imagedir import read_image_dir, write_image_dir

    out = str(tmp_path / "merged")
    first = [(f"a{i}", 0, bytes([i])) for i in range(5)]
    second = [(f"b{i}", 1, bytes([100 + i])) for i in range(3)]
    schema = "id string, label int, data binary"
    write_image_dir(spark.createDataFrame(first, schema), out)
    write_image_dir(spark.createDataFrame(second, schema), out)

    got = {r["id"]: (r["label"], bytes(r["data"])) for r in read_image_dir(spark, out).collect()}
    assert got == {i: (l, d) for i, l, d in first + second}

    # append of an existing id replaces its entry (no duplicate manifest line)
    write_image_dir(spark.createDataFrame([("a0", 7, b"\xff")], schema), out)
    got = {r["id"]: (r["label"], bytes(r["data"])) for r in read_image_dir(spark, out).collect()}
    assert len(got) == 8 and got["a0"] == (7, b"\xff")

    # overwrite rewrites the manifest wholesale
    write_image_dir(spark.createDataFrame(second, schema), out, mode="overwrite")
    got = {r["id"] for r in read_image_dir(spark, out).collect()}
    assert got == {f"b{i}" for i in range(3)}


def test_table_nrows_flat_and_partitioned(spark, sf_smoke, tmp_path):
    """r13: `table_nrows` (parquet-footer counts, no Spark job) must match
    the scan count on the flat testdata layout AND on a Hive-partitioned
    write (nested key=value subdirectories) — the layout Spark reads
    transparently but a top-level-only glob missed (review finding)."""
    from caffeonspark_spark.catalog import load_table, table_nrows

    docs = load_table(spark, sf_smoke, "documents")
    n = docs.count()
    assert table_nrows(sf_smoke, "documents") == n

    part_dir = tmp_path / "parted"
    docs.write.partitionBy("source").parquet(str(part_dir / "documents.parquet"))
    assert table_nrows(str(part_dir), "documents") == n


def test_table_nrows_skips_hidden_staging_files(spark, sf_smoke, tmp_path):
    """r13 review: Spark's FileIndex hides '_'/'.'-prefixed path segments
    (e.g. a _temporary tree from a killed write); the metadata count must
    skip them too or it over-counts vs the scan."""
    import shutil

    from caffeonspark_spark.catalog import load_table, table_nrows

    d = tmp_path / "staged"
    docs = load_table(spark, sf_smoke, "documents")
    docs.write.parquet(str(d / "documents.parquet"))
    n = docs.count()
    # plant a leftover staging tree with a real parquet file inside
    staging = d / "documents.parquet" / "_temporary" / "0"
    staging.mkdir(parents=True)
    real = sorted((d / "documents.parquet").glob("*.parquet"))[0]
    shutil.copy(real, staging / "part-leftover.parquet")
    assert table_nrows(str(d), "documents") == n


def test_table_nrows_counts_extensionless_part_files(spark, sf_smoke, tmp_path):
    """r14 (r13 ADVICE): Spark's scan reads any visible file regardless of
    extension, so a table directory written by a non-Spark writer with
    extensionless part files must count identically — including MIXED
    layouts (some .parquet, some extensionless)."""
    from caffeonspark_spark.catalog import load_table, table_nrows

    d = tmp_path / "ext"
    docs = load_table(spark, sf_smoke, "documents")
    docs.repartition(3).write.parquet(str(d / "documents.parquet"))
    n = docs.count()
    parts = sorted((d / "documents.parquet").glob("*.parquet"))
    assert len(parts) >= 2, "need >=2 part files to test the mixed layout"
    # strip the extension off ONE part file -> mixed layout
    parts[0].rename(parts[0].with_suffix(""))
    assert spark.read.parquet(str(d / "documents.parquet")).count() == n
    assert table_nrows(str(d), "documents") == n
    # all-extensionless layout
    for p in sorted((d / "documents.parquet").glob("*.parquet")):
        p.rename(p.with_suffix(""))
    assert table_nrows(str(d), "documents") == n
