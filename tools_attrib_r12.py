#!/usr/bin/env python
"""Round-12 regression attribution: serialized best-of-three re-measure of
the two driver-bench rows BENCH_r11 (bench_last_run.json — the printed
line overflowed, see test_bench_line.py) recorded inflated with zero code
change: q_bpe_encode 21.57 s vs the 2.9-3.4 documented band (bpe.py
unchanged since 01adc6c) and q_remove_dup_passages 5.87 vs 2.4-3.1
(dedup.py's passage path unchanged). One untimed warm-up per query, three
timed runs with caches dropped between runs — the exact r7/r9/r11
template — plus two stable-history CONTROL rows in the same session to
separate a host-speed shift from a real regression (fifth consecutive
driver artifact showing the single-sample host-variance class)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark  # noqa: E402
from caffeonspark_spark.operators import bpe as BPE  # noqa: E402
from caffeonspark_spark.operators import dedup as D  # noqa: E402
from caffeonspark_spark.operators import relational as R  # noqa: E402
from caffeonspark_spark.operators import temporal as TP  # noqa: E402
from caffeonspark_spark.operators.dedup import unpersist_cached  # noqa: E402

QUERIES = {
    "q_bpe_encode": BPE.bpe_encode,
    "q_remove_dup_passages": D.remove_dup_passages_docs,
    # controls: stable multi-round history, untouched code paths
    "q_scan_filter_project": R.scan_filter_project,
    "q_sessionize": TP.sessionize_query,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(Config(master="local[32]", app_name="attrib-r12"))
    out = {}
    for name, fn in QUERIES.items():
        runs = []
        for i in range(4):  # run 0 = untimed warm-up
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            unpersist_cached()
            spark.catalog.clearCache()
            if i:
                runs.append(round(dt, 3))
        out[name] = {"runs": runs, "best": min(runs)}
        print(name, runs, "best", min(runs), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
