"""Schema-declared batch assembly: DataFrame → batches of NumPy tensors.

The rebuild of the reference's ``nextBatch`` operator
(``DataFrameSource.scala:225-302``: drain queue → place each typed column at
offset/stride into a per-column ``FloatBlob``, transpose-aware; image variant
``ImageDataSource.scala:99-163``) — re-expressed as a single ``mapInArrow``
pass:

* input: any DataFrame with an id column + one source column per ColumnSpec;
* output: one ROW PER BATCH with ``sample_ids: array<string>`` and, per
  declared column, a flattened ``<name>: array<float>`` plus
  ``<name>_shape: array<int>`` (leading dim = actual batch rows, so the last
  partial batch is well-formed);
* per-partition streaming: the Arrow iterator yields batch-by-batch, nothing
  accumulates beyond one batch — the double-buffered queue pipeline of the
  reference (``CaffeProcessor.scala:246-252``) collapses into Spark's own
  pipelined iterators.

Order contract: within a partition, sample order is the DataFrame's order
(the reference preserves per-partition order through its queues and asserts
first SampleID — ``PythonApiTest.py:43``). Batches never cross partition
boundaries, exactly like the reference's per-executor queues.

Scale: this is the Python hot path, but it's Arrow-columnar in and out; per
batch the only Python work is NumPy reshapes/transposes. At 100 TB the
operator is embarrassingly parallel (no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from caffeonspark_spark.multimodal.columns import (
    ColumnSpec,
    image_sample_to_tensor,
)


def _batch_schema(specs: list[ColumnSpec]) -> str:
    cols = ["sample_ids array<string>"]
    for s in specs:
        cols.append(f"{s.name} array<float>")
        cols.append(f"{s.name}_shape array<int>")
    return ", ".join(cols)


def iter_batch_chunks(
    batches: Iterator[pa.RecordBatch], batch_size: int
) -> Iterator[pa.Table]:
    """Regroup an Arrow batch stream into tables of exactly ``batch_size``
    rows (last one partial) using zero-copy ``slice`` — no Python rows, no
    copies; Arrow's reference counting carries the buffers through."""
    buf: list[pa.RecordBatch] = []
    n = 0
    for rb in batches:
        while rb.num_rows > 0:
            take = min(batch_size - n, rb.num_rows)
            buf.append(rb.slice(0, take))
            n += take
            rb = rb.slice(take)
            if n == batch_size:
                yield pa.Table.from_batches(buf)
                buf, n = [], 0
    if n:
        yield pa.Table.from_batches(buf)


def _list_array_from_matrix(mat: np.ndarray, arrow_type) -> pa.ListArray:
    """(N, k) ndarray → Arrow list column of N rows, built from the flat
    values buffer + arithmetic offsets (no per-row Python lists)."""
    n, k = mat.shape
    values = pa.array(mat.ravel(), type=arrow_type)
    offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32), type=pa.int32())
    return pa.ListArray.from_arrays(offsets, values)


def _column_tensor_arrow(col: pa.ChunkedArray | pa.Array, spec: ColumnSpec) -> np.ndarray:
    """Arrow column → (N, *shape) float32 tensor, staying columnar for the
    hot dtypes: scalars cast/convert via Arrow C++ and one NumPy astype;
    fixed-length list columns reshape the flat values buffer. Image dtypes
    decode per sample by necessity and fall back to the value-list path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if spec.dtype == "string":
        # .toFloat parse of STRING tops, vectorized through an Arrow cast
        return (
            col.cast(pa.float64()).to_numpy(zero_copy_only=False)
            .astype(np.float32).reshape(-1, 1)
        )
    if spec.dtype in ("int", "float"):
        return (
            col.to_numpy(zero_copy_only=False).astype(np.float32).reshape(-1, 1)
        )
    if spec.dtype in ("int_array", "float_array"):
        n = len(col)
        lens = np.diff(col.offsets.to_numpy())
        if lens.size and (lens != lens[0]).any():
            raise ValueError(
                f"column {spec.name!r}: array rows must be fixed-length "
                f"(got lengths {sorted(set(lens.tolist()))[:5]})"
            )
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
        if n == 0:
            return flat.reshape(0, 0)
        mat = flat.reshape(n, int(lens[0]))
        if spec.transpose:
            mat = np.ascontiguousarray(mat.T)
        return mat
    # image dtypes: per-sample decode, unavoidable row loop over payloads
    return _column_tensor(col.to_pylist(), spec, {})


def _column_tensor(values, spec: ColumnSpec, aux: dict) -> np.ndarray:
    """Stack one declared column's python values into an (N, *shape) array."""
    if spec.dtype == "string":
        # reference parses STRING tops with .toFloat (DataFrameSource.scala:237-243)
        return np.asarray([float(v) for v in values], dtype=np.float32).reshape(-1, 1)
    if spec.dtype in ("int", "float"):
        return np.asarray(values, dtype=np.float32).reshape(-1, 1)
    if spec.dtype in ("int_array", "float_array"):
        mat = np.asarray([np.asarray(v, dtype=np.float32) for v in values])
        if spec.transpose:
            # time-major layout: (batch, T) -> (T, batch), flattened in that
            # order (DataFrameSource.scala:186-187,212-214)
            mat = np.ascontiguousarray(mat.T)
        return mat
    if spec.dtype == "raw_image":
        return np.stack(
            [image_sample_to_tensor(bytes(v), spec, encoded=False) for v in values]
        )
    if spec.dtype == "encoded_image":
        return np.stack(
            [image_sample_to_tensor(bytes(v), spec, encoded=True) for v in values]
        )
    if spec.dtype == "encoded_image_with_dim":
        out = []
        for v in values:  # v is a dict {image, height, width} from Arrow
            out.append(
                image_sample_to_tensor(
                    bytes(v["image"]), spec, encoded=True, height=v["height"], width=v["width"]
                )
            )
        return np.stack(out)
    raise AssertionError(spec.dtype)


def assemble_batches(
    df: DataFrame,
    specs: list[ColumnSpec],
    batch_size: int,
    id_col: str = "id",
) -> DataFrame:
    """DataFrame → DataFrame of assembled batches (one row per batch)."""
    missing = [s.name for s in specs if s.name not in df.columns] + (
        [id_col] if id_col not in df.columns else []
    )
    if missing:
        # declared-top validation, DataFrameSource.scala:91-98
        raise ValueError(f"declared columns missing from DataFrame: {missing}")

    out_schema = _batch_schema(specs)
    spec_list = list(specs)

    def assemble(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # columnar end to end: zero-copy chunk slicing, Arrow-cast ids,
        # vectorized column→tensor, list columns built from flat buffers —
        # the only per-row Python left is image payload decode
        for chunk in iter_batch_chunks(batches, batch_size):
            ids = chunk.column(id_col).combine_chunks().cast(pa.string())
            arrays = [
                pa.ListArray.from_arrays(
                    pa.array([0, len(ids)], type=pa.int32()), ids
                )
            ]
            names = ["sample_ids"]
            for spec in spec_list:
                tensor = _column_tensor_arrow(chunk.column(spec.name), spec)
                flat = tensor.ravel().astype(np.float32, copy=False)
                arrays.append(
                    pa.ListArray.from_arrays(
                        pa.array([0, flat.size], type=pa.int32()),
                        pa.array(flat, type=pa.float32()),
                    )
                )
                names.append(spec.name)
                arrays.append(pa.array([list(tensor.shape)], type=pa.list_(pa.int32())))
                names.append(f"{spec.name}_shape")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.mapInArrow(assemble, out_schema)


def batches_to_numpy(
    batch_df: DataFrame, specs: list[ColumnSpec]
) -> Iterator[tuple[list[str], dict[str, np.ndarray]]]:
    """Driver-side iterator over assembled batches as NumPy dicts (the
    ``(Array[String], Array[FloatBlob])`` shape of ``CaffeProcessor``'s
    solver feed). Streams via toLocalIterator — for training drivers, not
    bulk processing."""
    for row in batch_df.toLocalIterator():
        tensors = {}
        for spec in specs:
            flat = np.asarray(row[spec.name], dtype=np.float32)
            shape = tuple(row[f"{spec.name}_shape"])
            tensors[spec.name] = flat.reshape(shape)
        yield list(row["sample_ids"]), tensors
