#!/usr/bin/env python
"""Profile named bench queries: one engine session with the Spark event
log enabled, each serialized run labeled via setJobDescription, noop-sink
timed like bench.py. Pair with tools_r16_evlog.py to attribute per-job /
per-stage time inside one query.

Usage:
    python tools_r16_profile.py q_embedding_gram q_cohort_retention ...
    python tools_r16_evlog.py /tmp/sparklogs q_embedding_gram

Each query runs N serialized repeats (default 2, $PROFILE_RUNS overrides);
caches are released between repeats exactly like bench.py, so run 2 times
engine compute, not warm block reads.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return
    logdir = os.environ.get("PROFILE_EVLOG_DIR", "/tmp/sparklogs")
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("PROFILE_RUNS", "2"))
    spark = get_spark(
        Config(
            master=f"local[{cpus}]",
            app_name="cos-profile",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": logdir,
                "spark.eventLog.compress": "false",
                **{
                    kv.split("=", 1)[0].strip(): kv.split("=", 1)[1].strip()
                    for kv in os.environ.get("AB_CONF", "").split(";")
                    if "=" in kv
                },
            },
        )
    )
    import bench

    from caffeonspark_spark.operators.dedup import unpersist_cached

    # same warm-up as bench.py so run-1 numbers are comparable
    from caffeonspark_spark.operators import relational as R

    bench._run(R.scan_filter_project(spark, sf_dir).limit(1))

    for name in names:
        fn = bench.BENCH_QUERIES[name]
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name}#run{i}")
            t0 = time.perf_counter()
            bench._run(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            print(f"{name} run{i}: {dt:.2f}s", flush=True)
            unpersist_cached()
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
