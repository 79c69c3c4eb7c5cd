"""Oracle comparison harness mirroring the driver's t2 check.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables and
compares row count, column names, and order-insensitive values — with EXACT
equality on every cell (the engine's determinism doctrine makes floats
bit-identical across engines; see functions/arrays.py).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from caffeonspark_spark.catalog import TABLES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out = con.execute(sql)
    cols = [d[0] for d in out.description]
    rows = out.fetchall()
    con.close()
    return cols, rows


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        # Spark yields bytearray, DuckDB bytes — same payload, different
        # repr; normalize or every BINARY column false-mismatches
        return bytes(v)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str, exact: bool = True):
    """Return (ok, message). Sorts columns by name, rows by canonical repr."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"

    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]

    # sort by repr so rows containing NULLs / mixed types stay orderable;
    # under exact=False, floats sort on a coarsened grid (8 significant
    # digits) so tolerance-close values land at the same sort position on
    # both sides — sorting on the raw repr let near-equal floats order
    # rows differently per side and misalign the zip pairing
    def _key(row):
        if exact:
            return repr(row)
        return repr(
            tuple(
                f"{v:.8e}" if isinstance(v, float) else v for v in row
            )
        )

    s_norm = sorted(
        (tuple(_canon(r[i]) for i in s_order) for r in s_rows), key=_key
    )
    d_norm = sorted(
        (tuple(_canon(r[i]) for i in d_order) for r in d_rows), key=_key
    )
    mismatches = []
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        if a != b:
            if not exact and _close(a, b):
                continue
            mismatches.append((i, a, b))
            if len(mismatches) >= 3:
                break
    if mismatches:
        return False, f"value mismatches (first {len(mismatches)}): {mismatches}"
    return True, f"ok ({len(s_rows)} rows)"


def duckdb_run_pandas(sql: str, sf_dir: str):
    """Run the oracle and fetch via pandas — the driver's code path.

    DuckDB types like HUGEINT (the result of SUM(BIGINT)) become float64
    here even though ``fetchall`` yields Python ints; a hasher over pandas
    values therefore sees ``7.0`` where Spark hashes ``7``. This fetch path
    exists so rehearsal reproduces the driver's verdict (the r5
    pack_documents/repetition_stats reds were invisible to the
    fetchall-based ``compare``)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    pdf = con.execute(sql).df()
    con.close()
    return pdf


def _pd_cell(v):
    """Canonicalize one pandas cell preserving the int/float distinction."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, np.bool_):
        return repr(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return repr(bytes(v))  # bytearray (Spark) vs bytes (DuckDB)
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_pd_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_pd_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return repr(v)


def compare_pandas(spark_df, oracle_sql: str, sf_dir: str, s_pdf=None):
    """Dtype-faithful compare mirroring the driver: both sides round-trip
    through pandas (Spark ``.toPandas()``, DuckDB ``.df()``), columns sorted
    by name, rows sorted by stringified values, cells compared as canonical
    strings so an int64-vs-float64 dtype split (HUGEINT!) fails loudly.
    Pass ``s_pdf`` (the already-materialized ``spark_df.toPandas()``) to
    skip re-executing the Spark plan — the rehearsal loop runs ~150
    queries and was executing every plan three times."""
    if s_pdf is None:
        s_pdf = spark_df.toPandas()
    d_pdf = duckdb_run_pandas(oracle_sql, sf_dir)

    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        return False, (
            f"columns differ: spark={sorted(s_pdf.columns)} "
            f"duckdb={sorted(d_pdf.columns)}"
        )
    if len(s_pdf) != len(d_pdf):
        return False, f"row count differs: spark={len(s_pdf)} duckdb={len(d_pdf)}"

    cols = sorted(s_pdf.columns)
    s_rows = sorted(
        tuple(_pd_cell(v) for v in row)
        for row in s_pdf[cols].itertuples(index=False, name=None)
    )
    d_rows = sorted(
        tuple(_pd_cell(v) for v in row)
        for row in d_pdf[cols].itertuples(index=False, name=None)
    )
    mismatches = []
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            mismatches.append((i, a, b))
            if len(mismatches) >= 3:
                break
    if mismatches:
        return False, f"pandas-typed mismatches (first {len(mismatches)}): {mismatches}"
    return True, f"ok ({len(s_rows)} rows, pandas-typed)"


def _close(a, b, rel=1e-9):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=rel, abs_tol=1e-12):
                return False
        elif x != y:
            return False
    return True
