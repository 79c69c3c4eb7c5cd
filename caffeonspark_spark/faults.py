"""Fault injection for determinism-under-retry drills.

The one 100 TB failure mode a single green local run never exercises is
TASK RETRY: on a 1000-executor cluster, preemptions, OOM-kills and disk
faults make first-attempt failures routine, and Spark silently re-runs
the lost task. Every operator in this engine therefore has to be
attempt-deterministic — a retried partition must produce bit-identical
output, or downstream results depend on which attempt happened to
survive (the reference leans on the same property for its feeding-queue
restart semantics, ``CaffeProcessor.scala:192-198``).

``fail_first_attempt`` wraps a DataFrame with an Arrow-batched identity
stage that RAISES on every task's first attempt and passes bytes through
untouched on retries. Running a pipeline over a wrapped input under a
``local[N, maxFailures>=2]`` master forces every task in the wrapped
stage (and everything Spark fuses into it) through the retry path; the
drill then asserts the output equals the unfaulted run.

The wrapper is plan-transparent (same schema, same rows, no
repartitioning), so comparisons against the ``active=False`` twin
isolate retry as the only variable, and comparisons against the
original query additionally prove the wrapper itself changes nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def fail_first_attempt(
    df: DataFrame, active: bool = True, marker_dir: str | None = None
) -> DataFrame:
    """Identity passthrough that raises on each task's FIRST attempt.

    ``active=False`` keeps the stage in the plan but never raises — the
    control twin with an identical physical plan. ``marker_dir`` (shared
    storage; in local mode any /tmp path) records one file per injected
    failure so the drill can assert the fault actually fired instead of
    passing vacuously.
    """
    schema = df.schema

    def inject(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if active and ctx is not None and ctx.attemptNumber() == 0:
            if marker_dir:
                os.makedirs(marker_dir, exist_ok=True)
                marker = os.path.join(
                    marker_dir,
                    f"attempt0_p{ctx.partitionId()}_t{ctx.taskAttemptId()}",
                )
                with open(marker, "w", encoding="utf-8") as fh:
                    fh.write("injected first-attempt failure\n")
            raise RuntimeError(
                "injected fault: first attempt of partition "
                f"{ctx.partitionId()} always fails (retry drill)"
            )
        yield from batches

    return df.mapInArrow(inject, schema)
