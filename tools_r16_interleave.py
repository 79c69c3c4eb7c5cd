"""Interleaved A/B of one runtime SQL conf within a single session:
for each query, alternate arm A (baseline) / arm B (AB_CONF) across
repeats so host-load drift hits both arms equally. Min per arm.

Usage: AB_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false" \
       N_PAIRS=3 python tools_r16_interleave.py q_video_dedup_map ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark

import bench
from tools_r16_cpu import _tree_cpu


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pairs = int(os.environ.get("N_PAIRS", "3"))
    k, v = os.environ["AB_CONF"].split("=", 1)
    spark = get_spark(Config(master=f"local[{cpus}]", app_name="cos-ilv"))
    base = spark.conf.get(k, None)
    from caffeonspark_spark.operators import relational as R
    from caffeonspark_spark.operators.dedup import unpersist_cached

    bench._run(R.scan_filter_project(spark, sf_dir).limit(1))
    for name in names:
        fn = bench.BENCH_QUERIES[name]
        arms = {"A": [], "B": []}
        cpu = {"A": [], "B": []}
        for _ in range(n_pairs):
            for arm in ("A", "B"):
                if arm == "B":
                    spark.conf.set(k, v)
                elif base is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, base)
                c0, t0 = _tree_cpu(), time.perf_counter()
                bench._run(fn(spark, sf_dir))
                arms[arm].append(round(time.perf_counter() - t0, 3))
                cpu[arm].append(round(_tree_cpu() - c0, 2))
                unpersist_cached()
        print(
            f"ILV {name} A_min={min(arms['A'])} B_min={min(arms['B'])} "
            f"Acpu_min={min(cpu['A'])} Bcpu_min={min(cpu['B'])} "
            f"A={arms['A']} B={arms['B']} Acpu={cpu['A']} Bcpu={cpu['B']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
