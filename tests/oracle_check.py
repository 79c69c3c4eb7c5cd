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
    # sort by repr so rows containing NULLs / mixed types stay orderable
    s_norm = sorted(
        (tuple(_canon(r[i]) for i in s_order) for r in s_rows), key=repr
    )
    d_norm = sorted(
        (tuple(_canon(r[i]) for i in d_order) for r in d_rows), key=repr
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
