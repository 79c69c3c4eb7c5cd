"""Custom Python DataSource: directory-of-binary-files + label file.

The reference implements its binary ingest paths as a hand-rolled custom
RDD / mapPartitions loop — the LMDB scan builds an ``RDD[(id, label, ...,
bytes)]`` with hand-computed partitions (``LmdbRDD.scala:36-155``), and
``Binary2DataFrame.scala:20-88`` reads an image directory plus a
``"filename label [id]"`` label file into a ``(SampleID, label, data)``
DataFrame inside ``mapPartitions``. The source *registry* resolves a class
name by reflection (``DataSource.scala:133-166``).

The Spark-native rebuild of that capability is the Python DataSource API
(``pyspark.sql.datasource``): schema declaration, driver-side partition
planning, executor-side record iteration, and predicate pushdown are all
engine contracts instead of bespoke RDD code. This module provides
``cos_imagedir`` with the E2 schema:

    id: string, label: int, data: binary

Scale shape:
* The label file (small metadata) is read ONCE on the driver at planning
  time; the binary payloads are read executor-side, one partition per
  planned file chunk — the driver never touches image bytes.
* ``partitions`` controls the planned fan-out exactly (the reference's
  ``-lmdb_partitions`` knob, ``Config.scala:487-488``).
* Label equality/IN filters are accepted in ``pushFilters`` and applied at
  planning time — pruned files are never opened, the custom-source
  equivalent of partition pruning.
* All IO routes through the ``fsio`` shim (r16): ``path``/``labels`` may
  be local paths or any pyarrow-resolvable URI (``file://``, ``s3://``,
  ``hdfs://`` where libhdfs is deployed), read AND write side.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

E2_SCHEMA = "id string, label int, data binary"

FORMAT_NAME = "cos_imagedir"


def parse_label_file(path: str) -> list[tuple[str, int, str]]:
    """``filename label [id]`` lines → (filename, label, id) tuples
    (``Binary2DataFrame.scala:53-61`` line grammar; id defaults to the
    filename stem). ``path`` may be local or any fsio URI (r16)."""
    from caffeonspark_spark.sources import fsio

    out: list[tuple[str, int, str]] = []
    for line in fsio.read_text(path).splitlines():
        parts = line.split()
        if not parts:
            continue
        if len(parts) < 2:
            continue  # tolerate filename-only lines, like the Spark-
            # side parser of the same grammar (binary_to_dataframe)
        try:
            label = int(parts[1])
        except ValueError:
            continue
        fname = parts[0]
        sample_id = parts[2] if len(parts) > 2 else os.path.splitext(fname)[0]
        out.append((fname, label, sample_id))
    return out


class _FileChunk(InputPartition):
    def __init__(self, items: list[tuple[str, int, str]]):
        self.items = items


_E2_FIELDS = {"id": "string", "label": "int", "data": "binary"}


class ImageDirReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        from caffeonspark_spark.sources import fsio

        self.base = options["path"]
        self.labels_path = options.get(
            "labels", fsio.join(self.base, "labels.txt")
        )
        self.n_partitions = int(options.get("partitions", "8"))
        self._label_filters: list[Filter] | None = None
        # COLUMN PRUNING via the user-schema mechanism (Catalyst never
        # prunes into Python sources): without "data" the reader plans
        # from the label MANIFEST alone and never opens a payload file —
        # a count/label-histogram over a multi-TB image dir reads zero
        # image bytes.
        from caffeonspark_spark.sources.common import validated_fields

        self._fields = validated_fields(schema, _E2_FIELDS)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept label = v / label IN (...) — applied during planning so
        non-matching files are never listed into a partition. Everything
        else is returned for Spark to evaluate post-scan."""
        self._label_filters = []
        for f in filters:
            if isinstance(f, (EqualTo, In)) and f.attribute == ("label",):
                self._label_filters.append(f)
            else:
                yield f

    def _keep(self, label: int) -> bool:
        for f in self._label_filters or []:
            if isinstance(f, EqualTo) and label != f.value:
                return False
            # pyspark.sql.datasource.In carries its tuple in `.value`
            if isinstance(f, In) and label not in f.value:
                return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        items = [t for t in parse_label_file(self.labels_path) if self._keep(t[1])]
        n = max(1, min(self.n_partitions, len(items) or 1))
        chunks = [items[i::n] for i in range(n)]
        # a fully-pruned scan must still return ONE (empty) partition: the
        # engine substitutes [None] for an empty partition list and calls
        # read(None), crashing instead of yielding zero rows
        return [_FileChunk(c) for c in chunks if c] or [_FileChunk([])]

    def read(self, partition: _FileChunk) -> Iterator[tuple]:
        from caffeonspark_spark.sources import fsio

        fields = self._fields
        if "data" not in fields:
            # manifest-only scan: payload files are never opened
            for fname, label, sample_id in partition.items:
                row = {"id": sample_id, "label": label}
                yield tuple(row[f] for f in fields)
            return
        read_file = fsio.dir_reader(self.base)  # one FS resolve/partition
        for fname, label, sample_id in partition.items:
            row = {
                "id": sample_id,
                "label": label,
                "data": read_file(fname),
            }
            yield tuple(row[f] for f in fields)


class ImageDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return E2_SCHEMA

    def reader(self, schema: StructType) -> ImageDirReader:
        return ImageDirReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "ImageDirWriter":
        return ImageDirWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the format on the session (the rebuild's
    source 'registry' entry for S9 — a format name, not reflection)."""
    # planning-time pushdown for Python sources is opt-in
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ImageDirDataSource)


def read_image_dir(
    spark,
    path: str,
    labels: str | None = None,
    partitions: int = 8,
    columns: list[str] | None = None,
):
    """Image-directory scan as a DataFrame (id, label, data).

    Sharp edge inherited from the Python DataSource planning model: once
    an action pushes a label filter, the engine re-pickles the
    post-pushdown source back onto the DataFrame's shared relation, so
    the pruned state BAKES INTO this DataFrame — a later unfiltered (or
    differently-filtered-then-unfiltered) action on the SAME DataFrame
    object replans from the pruned snapshot. Derive each distinct filter
    set from a fresh ``read_image_dir`` call (it is metadata-cheap);
    pinned by ``test_imagedir_in_filter_empty_result_and_malformed_lines``."""
    register(spark)
    reader = spark.read.format(FORMAT_NAME).option("path", path).option(
        "partitions", str(partitions)
    )
    if labels:
        reader = reader.option("labels", labels)
    if columns is not None:
        from caffeonspark_spark.sources.common import pruned_ddl

        # source-level pruning: without "data" no payload file is opened
        reader = reader.schema(pruned_ddl(columns, _E2_FIELDS))
    return reader.load()


# --- writer side: two-phase commit back to a binary dir ------------------

class _WriteResult(WriterCommitMessage):
    def __init__(self, entries: list[tuple[str, int, str]]):
        self.entries = entries


class ImageDirWriter(DataSourceWriter):
    """Per-task payload writes + driver-side manifest commit.

    Tasks write one ``<id>.bin`` per row and report (filename, label, id)
    in their commit message; only ``commit()`` — which runs once, on the
    driver, after every task succeeded — writes ``labels.txt``. Since the
    source side plans exclusively from the label file, half-finished output
    from failed/speculative tasks is invisible until the manifest exists:
    the manifest IS the atomic commit point (same role as Parquet's
    ``_SUCCESS`` + file listing). ``abort()`` removes orphaned payloads.
    """

    def __init__(self, options: dict, overwrite: bool = False):
        self.base = options["path"]
        self.overwrite = overwrite

    def write(self, rows) -> _WriteResult:
        from caffeonspark_spark.sources import fsio

        fsio.makedirs(self.base)
        entries = []
        for row in rows:
            fname = f"{row.id}.bin"
            with fsio.open_write(fsio.join(self.base, fname)) as fh:
                fh.write(bytes(row.data))
            entries.append((fname, int(row.label), str(row.id)))
        return _WriteResult(entries)

    def commit(self, messages) -> None:
        from caffeonspark_spark.sources import fsio

        manifest = fsio.join(self.base, "labels.txt")
        # keyed by filename so append-mode re-writes of the same id replace
        # the prior entry instead of duplicating it
        by_fname: dict[str, str] = {}
        if not self.overwrite and fsio.exists(manifest):
            # append mode MERGES with the existing manifest — rewriting it
            # wholesale from this job's messages would silently orphan every
            # previously written payload (the source plans exclusively from
            # the manifest)
            for fname, label, sample_id in parse_label_file(manifest):
                by_fname[fname] = f"{fname} {label} {sample_id}"
        for msg in messages:
            for fname, label, sample_id in msg.entries:
                by_fname[fname] = f"{fname} {label} {sample_id}"
        with fsio.open_write(manifest) as fh:
            fh.write(("\n".join(sorted(by_fname.values())) + "\n").encode())

    def abort(self, messages) -> None:
        from caffeonspark_spark.sources import fsio

        for msg in messages:
            for fname, _, _ in msg.entries:
                try:
                    fsio.remove(fsio.join(self.base, fname))
                except Exception:  # noqa: BLE001 - best-effort cleanup of
                    pass  # orphans; remote FSs raise non-OSError types


def write_image_dir(df, path: str, mode: str = "append") -> None:
    """Write an (id, label, data) DataFrame as a binary dir + label manifest
    (inverse of ``read_image_dir``; the reference's Binary2Sequence/E1 path
    with a real commit protocol). ``append`` merges into an existing
    manifest (new entries win per filename); ``overwrite`` rewrites it."""
    register(df.sparkSession)
    df.write.format(FORMAT_NAME).mode(mode).option("path", path).save()
