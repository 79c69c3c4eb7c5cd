#!/usr/bin/env python
"""Round-9 regression attribution: serialized best-of-three re-measure of
the four driver-bench rows BENCH_r08 recorded inflated with zero code
change (q_clean_corpus 4.1→12.1 s, q_time_rollup 0.41→2.52, q_bpe_tokens
0.29→1.73, q_ann_ivf 1.39→2.60). One untimed warm-up per query, then three
timed runs with caches dropped between runs — the exact r7 q_kmeans_fit
template (BASELINE.md "Measured (round 7)")."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark  # noqa: E402
from caffeonspark_spark.operators import dedup as D  # noqa: E402
from caffeonspark_spark.operators import similarity as S  # noqa: E402
from caffeonspark_spark.operators import temporal as TP  # noqa: E402
from caffeonspark_spark.operators import textops as TX  # noqa: E402
from caffeonspark_spark.operators.dedup import unpersist_cached  # noqa: E402

QUERIES = {
    "q_clean_corpus": D.clean_corpus,
    "q_time_rollup": TP.time_rollup,
    "q_bpe_tokens": TX.bpe_token_stats,
    "q_ann_ivf": S.ann_ivf_topk_query0,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(Config(master="local[32]", app_name="attrib-r9"))
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
