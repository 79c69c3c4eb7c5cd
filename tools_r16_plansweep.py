#!/usr/bin/env python
"""Plan-shape sweep over every (non-streaming) bench query: count the
nodes that matter for the optimization checklist (Exchanges, Python-eval
boundaries, join strategies, cartesian products, scans) without executing
anything beyond the dedup memos' eager fills. Writes /tmp/plan_stats.json
and prints a ranked table.

Usage: python tools_r16_plansweep.py [skip-substr ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark  # noqa: E402

MARKS = [
    ("exchange", "Exchange"),
    ("arrow_py", "ArrowEvalPython"),
    ("batch_py", "BatchEvalPython"),
    ("py_map", "MapInPandas"),
    ("py_arrow_map", "PythonMapInArrow"),
    ("smj", "SortMergeJoin"),
    ("bhj", "BroadcastHashJoin"),
    ("shj", "ShuffledHashJoin"),
    ("bnlj", "BroadcastNestedLoopJoin"),
    ("cartesian", "CartesianProduct"),
    ("scan_parquet", "Scan parquet"),
    ("inmem", "InMemoryTableScan"),
    ("window", "Window"),
    ("sort", "Sort ["),
]


def main() -> None:
    skips = ["stream"] + sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(Config(master=f"local[{cpus}]", app_name="r16-plansweep"))

    import bench

    from caffeonspark_spark.operators.dedup import unpersist_cached

    stats: dict[str, dict] = {}
    for name, fn in bench.BENCH_QUERIES.items():
        if any(s in name for s in skips):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            stats[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        row = {k: plan.count(m) for k, m in MARKS}
        row["lines"] = plan.count("\n")
        stats[name] = row
        unpersist_cached()
        spark.catalog.clearCache()

    with open("/tmp/plan_stats.json", "w") as f:
        json.dump(stats, f, indent=1)
    cols = [k for k, _ in MARKS] + ["lines"]
    print("name".ljust(30), *[c[:9].rjust(9) for c in cols])
    for name, row in sorted(
        stats.items(), key=lambda kv: -kv[1].get("exchange", 0)
    ):
        if "error" in row:
            print(name.ljust(30), "ERROR", row["error"])
            continue
        print(name.ljust(30), *[str(row[c]).rjust(9) for c in cols])
    spark.stop()


if __name__ == "__main__":
    main()
