#!/usr/bin/env python
"""Cluster-posture sweep: the declared query surface executed under
CLUSTER-REALISTIC settings instead of the tuned test session, asserting
oracle-green per query:

  - a plain ``SparkSession`` (no engine Config), the way the external
    driver builds one,
  - AQE ON (explicitly, the cluster default),
  - ``spark.sql.shuffle.partitions`` left at the UNTUNED default (200) —
    the driver/cluster session nobody re-configured,
  - durable ``checkpoint()`` into a real directory for every iterative
    (connected-components) query that exposes ``checkpoint_dir=`` — on a
    cluster, localCheckpoint blocks die with their executor and kill the
    iterative job; this is the config a production run uses.

This exercises "the plans you'd want at 100x" under the settings a real
cluster presents, rather than the tuned local[8]/8-partition gate: AQE
re-planning around the per-round coalesce, durable checkpoint truncation,
and default-partition scheduling of the tiny per-round jobs.

r13 ran the 6 clusters-class queries this way; r14 extends the sweep to
the WHOLE declared surface (VERDICT r13 item 1) — the cheapest remaining
way to catch a plan or constant baked to the tuned local session before
it matters at 100x. The check per query is the driver-faithful one from
tools_rehearse_driver: pandas-typed hash compare against the DuckDB
oracle (dtype splits visible), falling back to the fetchall lens only to
diagnose a failure.

Usage: python tools_cluster_posture.py [sf_dir] [query ...]
  sf_dir defaults to /root/testdata/sf0.01; naming queries restricts the
  sweep (unknown names are an error, not a silent skip). Writes the
  per-query record to /tmp/posture.json. Exit 1 on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402


def _durable_overrides(spark, sf_dir: str, ckpt: str):
    """(spark, sf_dir) -> DataFrame builders for the iterative queries,
    with durable ``checkpoint_dir=`` threaded in — these REPLACE the
    declared callables (which default to localCheckpoint) so the sweep
    exercises reliable-checkpoint truncation on every components query."""
    from caffeonspark_spark.multimodal import av as AV
    from caffeonspark_spark.multimodal import imagehash as IH
    from caffeonspark_spark.multimodal.av import (
        _V_MIN_FRAMES_PORTABLE as _V_MINF,
    )
    from caffeonspark_spark.operators import dedup as D

    return {
        "neardup_clusters": lambda: D.neardup_clusters(
            spark, sf_dir, checkpoint_dir=ckpt
        ),
        "image_dhash_clusters": lambda: IH.image_dhash_clusters(
            spark, sf_dir, checkpoint_dir=ckpt
        ),
        "video_dup_clusters": lambda: AV.video_dup_clusters(
            spark, sf_dir, checkpoint_dir=ckpt
        ),
        "audio_dup_clusters": lambda: AV.audio_dup_clusters(
            spark, sf_dir, checkpoint_dir=ckpt
        ),
        "image_dedup_map": lambda: IH.image_dedup(
            IH.portable_image_hash_table(spark, sf_dir), checkpoint_dir=ckpt
        ).orderBy("id"),
        "audio_dedup_map": lambda: IH.image_dedup(
            AV.portable_audio_fingerprints(spark, sf_dir), checkpoint_dir=ckpt
        ).orderBy("id"),
        "video_dedup_map": lambda: AV.video_dedup_map(
            AV.portable_video_frame_hashes(spark, sf_dir),
            frame_col="fi",
            min_frames=_V_MINF,
            checkpoint_dir=ckpt,
        ).orderBy("id"),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("cluster-posture")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "200", (
        "this sweep must run with the UNTUNED default partition count"
    )

    import __spark_entry__ as entry
    from tests.oracle_check import compare, compare_pandas

    qs = entry._base_queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2

    results: dict[str, dict] = {}
    n_err = 0
    with tempfile.TemporaryDirectory(prefix="cluster_ckpt_") as ckpt:
        overrides = _durable_overrides(spark, sf_dir, ckpt)
        for name, fn in qs.items():
            if only and name not in only:
                continue
            build = overrides.get(name) or (
                lambda fn=fn: fn(spark, sf_dir)
            )
            rec: dict = {"err": None, "durable_ckpt": name in overrides}
            t0 = time.time()
            # one raising query must not abort the sweep — report it as a
            # FAIL line and keep going so the summary always prints
            try:
                df = build()
                pdf = df.toPandas()
                rec["spark_rows"] = len(pdf)
                if name in oracles:
                    ok, msg = compare_pandas(df, oracles[name], sf_dir, s_pdf=pdf)
                    rec["hash_match"] = ok
                    if not ok:
                        ok2, msg2 = compare(df, oracles[name], sf_dir)
                        rec["err"] = f"pandas-typed only: {msg}" if ok2 else msg2
                        n_err += 1
                else:
                    rec["err"] = "no_oracle"
            except Exception as e:  # noqa: BLE001
                rec["err"] = f"{type(e).__name__}: {e}"
                n_err += 1
            rec["sec"] = round(time.time() - t0, 2)
            results[name] = rec
            status = (
                "no_oracle"
                if rec.get("err") == "no_oracle"
                else ("ok" if rec["err"] is None else "FAIL")
            )
            print(
                f"{name}: {status} ({rec['sec']:.1f}s) "
                f"rows={rec.get('spark_rows')}"
                + (f" :: {rec['err'][:200]}" if status == "FAIL" else ""),
                flush=True,
            )
        ckpt_files = sum(len(fs) for _, _, fs in os.walk(ckpt))
        print(f"durable checkpoint files written: {ckpt_files}")
        if not only and ckpt_files == 0:
            results["(durable_checkpoint)"] = {"err": "no files written"}
            n_err += 1

    with open("/tmp/posture.json", "w") as f:
        json.dump(results, f, indent=1)
    n_no_oracle = sum(1 for r in results.values() if r.get("err") == "no_oracle")
    print(
        f"\n{len(results)} queries under cluster posture "
        f"(AQE + default 200 partitions + durable checkpoint), "
        f"{n_err} problems, {n_no_oracle} no-oracle (rows-only)"
    )
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
