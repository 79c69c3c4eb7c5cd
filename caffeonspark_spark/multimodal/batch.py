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
        carry: list[dict] = []  # row dicts pending batch completion

        def emit(rows: list[dict]) -> pa.RecordBatch:
            # Arrow types must match the declared Spark schema exactly
            # (list<float32> / list<int32>), so build arrays with explicit types
            arrays = [pa.array([[str(r[id_col]) for r in rows]], type=pa.list_(pa.string()))]
            names = ["sample_ids"]
            for spec in spec_list:
                tensor = _column_tensor([r[spec.name] for r in rows], spec, {})
                arrays.append(
                    pa.array([tensor.ravel().astype(np.float32)], type=pa.list_(pa.float32()))
                )
                names.append(spec.name)
                arrays.append(pa.array([list(tensor.shape)], type=pa.list_(pa.int32())))
                names.append(f"{spec.name}_shape")
            return pa.RecordBatch.from_arrays(arrays, names=names)

        for rb in batches:
            carry.extend(rb.to_pylist())
            while len(carry) >= batch_size:
                chunk, carry = carry[:batch_size], carry[batch_size:]
                yield emit(chunk)
        if carry:
            yield emit(carry)

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
