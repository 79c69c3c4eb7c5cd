#!/usr/bin/env python
"""Round-11 regression attribution: serialized best-of-three re-measure of
the three driver-bench rows BENCH_r10 recorded inflated with zero code
change (q_clean_corpus_portable 3.2→10.74 s vs the 3.0-5.0 documented
band, q3_shipping_priority 0.80→2.40, q_minhash_signatures 1.17→2.11 —
dedup.py unchanged since commit 8d7e0e1, relational.py's Q3 unchanged
since bd36a5f). One untimed warm-up per query, then three timed runs with
caches dropped between runs — the exact r7/r9 template (BASELINE.md
"Measured (round 7/9)"). Fourth consecutive driver artifact showing this
single-sample host-variance class."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark  # noqa: E402
from caffeonspark_spark.operators import dedup as D  # noqa: E402
from caffeonspark_spark.operators import relational as R  # noqa: E402
from caffeonspark_spark.operators.dedup import unpersist_cached  # noqa: E402

QUERIES = {
    "q_clean_corpus_portable": D.clean_corpus_portable,
    "q3_shipping_priority": R.shipping_priority,
    "q_minhash_signatures": D.minhash_signatures_portable_query,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(Config(master="local[32]", app_name="attrib-r11"))
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
