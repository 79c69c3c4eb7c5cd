"""Isolated per-query timing with PROCESS-TREE CPU attribution: wall via
perf_counter plus utime+stime summed over this process and every live
descendant (JVM, Python daemon, reused workers) before/after each run.
External host load inflates wall but not tree CPU, so the CPU delta is
the contention-robust A/B metric for Python-boundary changes.

Usage: python tools_r16_cpu.py q_video_dup_native ...
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, N_RUNS (default 3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark

import bench

_CLK = os.sysconf("SC_CLK_TCK")


def _tree_cpu() -> float:
    """utime+stime (seconds) of this pid and all live descendants."""
    children: dict[int, list[int]] = {}
    stats: dict[int, float] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
        except OSError:
            continue
        pid = int(d)
        ppid = int(parts[1])
        stats[pid] = (int(parts[11]) + int(parts[12])) / _CLK
        children.setdefault(ppid, []).append(pid)
    total, stack = 0.0, [os.getpid()]
    while stack:
        p = stack.pop()
        total += stats.get(p, 0.0)
        stack.extend(children.get(p, []))
    return total


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("N_RUNS", "3"))
    spark = get_spark(Config(master=f"local[{cpus}]", app_name="cos-cpu"))
    from caffeonspark_spark.operators import relational as R
    from caffeonspark_spark.operators.dedup import unpersist_cached

    bench._run(R.scan_filter_project(spark, sf_dir).limit(1))
    for name in names:
        fn = bench.BENCH_QUERIES[name]
        walls, cpus_ = [], []
        for _ in range(n_runs):
            c0, t0 = _tree_cpu(), time.perf_counter()
            bench._run(fn(spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
            cpus_.append(round(_tree_cpu() - c0, 2))
            unpersist_cached()
        print(
            f"CPU {name} cpu_min={min(cpus_)} wall_min={min(walls)} "
            f"cpu={cpus_} wall={walls}",
            flush=True,
        )


if __name__ == "__main__":
    main()
