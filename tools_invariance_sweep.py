#!/usr/bin/env python
"""Environment-invariance sweeps: the full oracle rehearsal re-run under a
hostile execution environment the results must NOT depend on.

Two properties a 100 TB deployment cannot take on faith from a green
default-config rehearsal:

* ``tz`` — host timezone independence. A plain SparkSession (NO engine
  configs — no UTC session timezone, default shuffle partitions) under a
  hostile JVM/host zone (run with ``TZ=Pacific/Kiritimati``, UTC+14). Every
  oracle must still hash-match: all temporal queries ride ``timestamp_ntz``
  and calendar arithmetic that is zone-free by construction. This is the
  committed form of the r8 post-gate extra (BASELINE.md "Post-gate
  extras"), kept runnable so the property survives surface growth.

* ``parts`` — partition-count / parallelism independence. The engine
  session rebuilt with ``shuffle_partitions=7`` on ``local[5]`` (prime
  counts, neither dividing any data size) — on a real cluster AQE re-sizes
  every exchange at runtime, so any query whose RESULT depends on the
  partition count or task parallelism (order-sensitive aggregation over
  floats, first/last without an explicit frame, per-partition ids leaking
  into output) is wrong at scale even though it hash-matches on the fixed
  local[32]/32-partition test session. Every oracle must hash-match with
  the same values DuckDB computes single-threaded.

* ``twice`` — repeat-invocation idempotency. Every query callable is
  invoked TWICE in the same session (the first result fully materialized
  and discarded, the second compared against the oracle) — the external
  driver iterates queries inside one session, so any callable that
  mutates session state non-idempotently (temp-view collisions, the
  append-only persist memo in ``operators/dedup.py`` returning a stale
  plan, a cached DataFrame capturing the wrong sf_dir) breaks its second
  call even though every run-once sweep stays green.

Usage:
    TZ=Pacific/Kiritimati python tools_invariance_sweep.py tz    [sf_dir]
    python tools_invariance_sweep.py parts [sf_dir]
    python tools_invariance_sweep.py twice [sf_dir]

Exit code is tools_rehearse_driver.main()'s: non-zero on any mismatch.
Per-query rows land in /tmp/rehearsal.json as usual.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("tz", "parts", "twice"):
        print(__doc__)
        return 2
    mode = sys.argv[1]

    if mode == "twice":
        import __spark_entry__ as entry

        real_queries = entry.queries

        def twice_queries():
            def wrap(fn):
                def run(spark, sf_dir):
                    fn(spark, sf_dir).count()  # 1st invocation executes fully
                    return fn(spark, sf_dir)  # 2nd is what the sweep compares
                return run

            return {name: wrap(fn) for name, fn in real_queries().items()}

        entry.queries = twice_queries
    elif mode == "tz":
        if os.environ.get("TZ", "") in ("", "UTC", "Etc/UTC"):
            print("tz mode expects a hostile TZ env, e.g. TZ=Pacific/Kiritimati")
            return 2
        # plain session FIRST so tools_rehearse_driver's get_spark() call
        # reuses it — no engine configs at all
        from pyspark.sql import SparkSession

        SparkSession.builder.master("local[*]").appName(
            "invariance-tz"
        ).getOrCreate()
    else:
        from caffeonspark_spark.engine import Config, get_spark

        get_spark(
            Config(
                master="local[5]",
                app_name="invariance-parts",
                shuffle_partitions=7,
            )
        )

    import tools_rehearse_driver

    # shift argv so the rehearsal sees [sf_dir, query...]
    sys.argv = [sys.argv[0]] + sys.argv[2:]
    return tools_rehearse_driver.main()


if __name__ == "__main__":
    sys.exit(main())
