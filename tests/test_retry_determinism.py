"""Determinism-under-retry pins (r15).

Task retry is the 100 TB failure mode no single green run exercises:
preempted executors, OOM kills, and speculative execution all re-run
tasks, and every operator must produce bit-identical output on the
retried attempt (the reference's feeding-queue restart leans on the
same property — ``CaffeProcessor.scala:192-198``).

The drill needs ``local[8,2]`` (task maxFailures=2), which cannot be
set on the shared session fixture, so it runs ``tools_retry_drill.py``
in a subprocess: injected first-attempt failures through (1) the
composed image dedup map, (2) the iterative connected-components
pipeline with durable checkpointing, (3) seeded augmentation + batch
assembly (the hash(sample_id, seed) claim of ``augment_hwc``), and
(4) a stateful streaming aggregation killed after >=2 micro-batches
and restarted from its checkpoint. The drill itself also fails if an
injected fault never fires (no vacuous passes).

The in-process tests below pin the fault-injection seam itself against
the normal session (where maxFailures=1 means an injected fault must
surface as a job failure, proving the wrapper actually faults).
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest


def test_fail_first_attempt_is_transparent_when_inactive(spark):
    from caffeonspark_spark.faults import fail_first_attempt

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    wrapped = fail_first_attempt(df, active=False)
    assert wrapped.schema == df.schema
    assert sorted(map(tuple, wrapped.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_fail_first_attempt_faults_under_max_failures_1(spark):
    """Under the default session (task maxFailures=1) the injected fault
    must surface — proof the wrapper raises where a retry would occur."""
    from caffeonspark_spark.faults import fail_first_attempt

    df = fail_first_attempt(spark.range(10).selectExpr("id"), active=True)
    with pytest.raises(Exception, match="injected fault"):
        df.collect()


def test_retry_drill_all_scenarios_deterministic(tmp_path):
    """Full drill in a local[8,2] subprocess: every scenario bit-identical
    under injected retries, every fault fired."""
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools_retry_drill.py",
            "/root/testdata/sf0.001",
            str(tmp_path / "work"),
        ],
        capture_output=True,
        text=True,
        timeout=560,
    )
    lines = [
        ln for ln in proc.stdout.splitlines()
        if ln.startswith("RETRY_DRILL_RESULT ")
    ]
    assert proc.returncode == 0 and lines, (
        f"drill failed\nstdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    report = json.loads(lines[-1].removeprefix("RETRY_DRILL_RESULT "))
    assert report["ok"], report
    scenarios = report["scenarios"]
    assert set(scenarios) == {
        "image_dedup_map", "neardup_clusters", "augment_assemble",
        "seqfile_export", "stream_restart",
    }
    for name, r in scenarios.items():
        assert r["identical"], (name, r)
        assert r["faults_fired"] > 0, (name, r)
