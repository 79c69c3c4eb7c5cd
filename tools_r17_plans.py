#!/usr/bin/env python
"""Capture .explain("formatted") for named bench queries into plans/r17/.

Usage:
    python tools_r17_plans.py before q_image_dedup_map q_video_dedup_map ...
    python tools_r17_plans.py after  q_image_dedup_map ...

Writes plans/r17/<name>_<tag>.txt (bench-prefix 'q_'/'q1_' style names are
normalized to the declared-query style used in the deliverable file names).
The session mirrors bench.py (same engine Config, same sf dir resolution) so
the captured plans are the plans the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark  # noqa: E402


def _norm(name: str) -> str:
    return name[2:] if name.startswith("q_") else name


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "tag must be before|after"

    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = get_spark(Config(master=f"local[{cpus}]", app_name="r17-plans"))
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        fn = bench.BENCH_QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{_norm(name)}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
