#!/usr/bin/env python
"""Cluster-posture smoke: the clusters-class (iterative components)
queries executed under CLUSTER-REALISTIC settings instead of the tuned
test session, asserting oracle-green:

  - durable ``checkpoint()`` into a real directory (the r13
    ``checkpoint_dir=`` path — on a cluster, localCheckpoint blocks die
    with their executor and kill the iterative job; this is the config a
    production run uses),
  - AQE ON (explicitly, the cluster default),
  - ``spark.sql.shuffle.partitions`` left at the UNTUNED default (200) —
    the driver/cluster session nobody re-configured,
  - a plain ``SparkSession`` (no engine Config), the way the external
    driver builds one.

This exercises "the plans you'd want at 100x" under the settings a real
cluster presents, rather than the tuned local[8]/8-partition gate: AQE
re-planning around the per-round coalesce, durable checkpoint truncation,
and default-partition scheduling of the tiny per-round jobs.

Usage: python tools_cluster_posture.py [sf_dir]      (default sf0.01)
Prints one line per query and a final PASS/FAIL summary; exit 1 on any
mismatch.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("cluster-posture")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "200", (
        "this smoke must run with the UNTUNED default partition count"
    )

    from caffeonspark_spark.multimodal import av as AV
    from caffeonspark_spark.multimodal import imagehash as IH
    from caffeonspark_spark.multimodal.av import (
        _V_MIN_FRAMES_PORTABLE as _V_MINF,
    )
    from caffeonspark_spark.operators import dedup as D
    from tests.oracle_check import compare

    failures = []
    with tempfile.TemporaryDirectory(prefix="cluster_ckpt_") as ckpt:
        cases = {
            "neardup_clusters": (
                lambda: D.neardup_clusters(spark, sf_dir, checkpoint_dir=ckpt),
                D.ORACLE_NEARDUP_CLUSTERS,
            ),
            "image_dhash_clusters": (
                lambda: IH.image_dhash_clusters(spark, sf_dir, checkpoint_dir=ckpt),
                IH.ORACLE_IMAGE_DHASH_CLUSTERS,
            ),
            "video_dup_clusters": (
                lambda: AV.video_dup_clusters(spark, sf_dir, checkpoint_dir=ckpt),
                AV.ORACLE_VIDEO_DUP_CLUSTERS,
            ),
            "audio_dup_clusters": (
                lambda: AV.audio_dup_clusters(spark, sf_dir, checkpoint_dir=ckpt),
                AV.ORACLE_AUDIO_DUP_CLUSTERS,
            ),
            "image_dedup_map": (
                lambda: IH.image_dedup(
                    IH.portable_image_hash_table(spark, sf_dir),
                    checkpoint_dir=ckpt,
                ).orderBy("id"),
                IH.ORACLE_IMAGE_DEDUP_MAP,
            ),
            "video_dedup_map": (
                lambda: AV.video_dedup_map(
                    AV.portable_video_frame_hashes(spark, sf_dir),
                    frame_col="fi",
                    min_frames=_V_MINF,
                    checkpoint_dir=ckpt,
                ).orderBy("id"),
                AV.ORACLE_VIDEO_DEDUP_MAP,
            ),
        }
        for name, (build, oracle) in cases.items():
            t0 = time.time()
            # one raising query (non-convergence, collect error) must not
            # abort the smoke — report it as a FAIL line and keep going,
            # so the summary always prints (r13 review finding)
            try:
                ok, msg = compare(build(), oracle, sf_dir)
            except Exception as e:  # noqa: BLE001
                ok, msg = False, f"raised {type(e).__name__}: {e}"
            dt = time.time() - t0
            print(f"{name}: {'ok' if ok else 'FAIL'} ({dt:.1f}s) {msg[:120]}")
            if not ok:
                failures.append(name)
        ckpt_files = sum(len(fs) for _, _, fs in os.walk(ckpt))
        print(f"durable checkpoint files written: {ckpt_files}")
        if ckpt_files == 0:
            failures.append("(no durable checkpoint engaged)")
    if failures:
        print(f"FAIL: {failures}")
        raise SystemExit(1)
    print(f"PASS: {len(cases)} clusters-class queries oracle-green under "
          "cluster posture (durable checkpoint + AQE + default partitions)")


if __name__ == "__main__":
    main()
