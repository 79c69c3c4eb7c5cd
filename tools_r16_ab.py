"""A/B a set of session confs over named bench queries, same methodology
as bench.py (noop sink, serialized repeats, memo release between runs).

Usage: AB_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false" \
       python tools_r16_ab.py q_video_dedup_map q_clean_corpus
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
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("N_RUNS", "3"))
    extra = {}
    for kv in os.environ.get("AB_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark(
        Config(master=f"local[{cpus}]", app_name="cos-ab", extra_conf=extra)
    )
    for k, v in extra.items():
        spark.conf.set(k, v)  # getOrCreate may reuse an existing session
        print(f"CONF {k}={spark.conf.get(k)}")
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
        print(f"AB {name} min={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
