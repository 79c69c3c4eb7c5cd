"""Interleaved A/B of the r17 memo narrow-view within one session: for
each query, alternate arm A (view disabled — pins read at build width) /
arm B (view live) across repeats so host-load drift hits both arms
equally. Min per arm. The cached-plan-AQE engine conf is identical in
both arms — this isolates the read-width view alone.

Usage: N_PAIRS=3 python tools_r17_ab_narrow.py q_neardup_pagerank ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark
from caffeonspark_spark.operators import dedup as D

import bench


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pairs = int(os.environ.get("N_PAIRS", "3"))
    spark = get_spark(Config(master=f"local[{cpus}]", app_name="cos-abn"))
    from caffeonspark_spark.operators import relational as R

    live_view = D._narrow_view

    bench._run(R.scan_filter_project(spark, sf_dir).limit(1))
    for name in names:
        fn = bench.BENCH_QUERIES[name]
        arms = {"A": [], "B": []}
        for _ in range(n_pairs):
            for arm in ("A", "B"):
                D._narrow_view = (lambda df: None) if arm == "A" else live_view
                t0 = time.perf_counter()
                bench._run(fn(spark, sf_dir))
                arms[arm].append(round(time.perf_counter() - t0, 3))
                D.unpersist_cached()
                spark.catalog.clearCache()
                try:
                    spark._jvm.System.gc()
                except Exception:
                    pass
        print(
            f"ABN {name} A_min={min(arms['A'])} B_min={min(arms['B'])} "
            f"A={arms['A']} B={arms['B']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
