"""Isolated per-query timing: same methodology as bench.py (noop sink,
serialized repeats, caches released between runs) but for a named subset.

Usage: python tools_r16_isolate.py q_clean_corpus q1_pricing_summary ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, N_RUNS (default 3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark

import bench


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_runs = int(os.environ.get("N_RUNS", "3"))
    spark = get_spark(Config(master=f"local[{cpus}]", app_name="cos-isolate"))
    from caffeonspark_spark.operators import relational as R
    from caffeonspark_spark.operators.dedup import unpersist_cached

    bench._run(R.scan_filter_project(spark, sf_dir).limit(1))
    for name in names:
        fn = bench.BENCH_QUERIES[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            bench._run(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            unpersist_cached()
        print(f"ISOLATE {name} min={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
