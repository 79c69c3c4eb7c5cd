"""t2 gate rehearsal: every declared query with an oracle must hash-match
DuckDB at sf0.01 — EXACT cell equality, same discipline as the driver."""

from __future__ import annotations

import importlib.util
import sys

import pytest

from tests.oracle_check import compare

_spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
_entry = importlib.util.module_from_spec(_spec)
sys.modules["__spark_entry__"] = _entry
_spec.loader.exec_module(_entry)

QUERIES = _entry.queries()
ORACLES = _entry.oracle_sql()
CHECKED = sorted(ORACLES)


@pytest.mark.parametrize("name", CHECKED)
def test_oracle_match(spark, sf_oracle, name):
    df = QUERIES[name](spark, sf_oracle)
    ok, msg = compare(df, ORACLES[name], sf_oracle, exact=True)
    assert ok, f"{name}: {msg}"


def test_all_queries_run(spark, sf_smoke):
    """Queries without an oracle still must run and return a stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_smoke)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_smoke(spark):
    df = _entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
