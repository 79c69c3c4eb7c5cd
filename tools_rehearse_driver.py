"""Driver-rehearsal: run every declared query + oracle as the round gate does.

Two checks per query:
1. the driver's pandas sort_values canonicalization must not crash
   (it raises TypeError on list-typed cells — the r01 batch_assembly bug);
2. values must exactly match the DuckDB oracle (tests/oracle_check.compare).

Usage: python tools_rehearse_driver.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys

import __spark_entry__ as entry
from tests.oracle_check import compare, compare_pandas


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from caffeonspark_spark.engine import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name used to be silently skipped — "0 queries, 0
        # problems" read as a green rehearsal for a query that never ran
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2
    results = {}
    n_err = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"err": None}
        try:
            df = fn(spark, sf_dir)
            pdf = df.toPandas()
            rec["spark_rows"] = len(pdf)
            # the driver's canonicalizer: sort columns by name then rows by
            # every column — crashes on unhashable (list) cells.
            spdf = pdf[sorted(pdf.columns)]
            if len(spdf):
                spdf.sort_values(by=list(spdf.columns), kind="mergesort")
            if name in oracles:
                # the driver hashes pandas-typed frames — a dtype split
                # (DuckDB HUGEINT -> float64) is invisible to the
                # fetchall-based `compare`, so the pandas-typed check is
                # the verdict; `compare` runs only on failure as a second
                # lens (and reuses the already-materialized frame so each
                # Spark plan executes ONCE per rehearsal, not three times)
                ok2, msg2 = compare_pandas(df, oracles[name], sf_dir, s_pdf=pdf)
                rec["hash_match"] = ok2
                if not ok2:
                    ok, msg = compare(df, oracles[name], sf_dir)
                    rec["err"] = (
                        f"pandas-typed only: {msg2}" if ok else msg
                    )
                    n_err += 1
                    print(f"MISMATCH {name}: {rec['err'][:400]}", flush=True)
            else:
                rec["err"] = "no_oracle"
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"
            n_err += 1
            print(f"ERROR {name}: {rec['err'][:400]}", flush=True)
        results[name] = rec
        status = (
            "no_oracle"
            if rec.get("err") == "no_oracle"
            else ("ok" if rec["err"] is None else "BAD")
        )
        print(f"{name}: {status} rows={rec.get('spark_rows')}", flush=True)

    with open("/tmp/rehearsal.json", "w") as f:
        json.dump(results, f, indent=1)
    print(f"\n{len(results)} queries, {n_err} problems")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
