"""Determinism-under-retry drill (r15).

Forces EVERY task of each target pipeline through Spark's task-retry
path (``local[8,2]`` master + an injected first-attempt failure,
``faults.fail_first_attempt``) and asserts the output is bit-identical
to the unfaulted run — the 100 TB failure mode (preemptions, OOM kills,
speculative execution) that a single green run never exercises. The
reference leans on the same property for its feeding-queue restart
semantics (``CaffeProcessor.scala:192-198``).

Scenarios:

1. ``image_dedup_map`` — the composed exact+near dedup map (persist-once
   hash table, banded candidates, iterative connected components): fault
   injected on the documents scan feeding the hash table.
2. ``neardup_clusters`` — MinHash-LSH pairs + iterative min-label CC
   with DURABLE per-round checkpointing: fault injected via the module's
   ``load_table`` seam, checkpoint_dir engaged (the recovery path a real
   cluster uses).
3. ``augment_assemble`` — seeded augmentation (``augment_hwc``, whose
   hash(sample_id, seed) design CLAIMS retry determinism) composed with
   ``assemble_batches``: fault injected upstream so a retried task
   re-runs augmentation + batch assembly; the control twin keeps the
   identical plan with the fault disabled.
4. ``stream_restart`` — a stateful streaming aggregation (complete-mode
   counts + decimal-grid sum over a 6-file source, 1 file per trigger)
   KILLED after >=2 micro-batches and restarted from its checkpoint;
   the recovered end state must equal both the batch aggregation and an
   uninterrupted stream twin.

Prints one JSON line per scenario and a final ``RETRY_DRILL_RESULT``
JSON; exits non-zero if any scenario is non-deterministic or if an
injected fault never fired (vacuous pass).

Run: ``python tools_retry_drill.py [sf_dir] [work_dir]``
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SILENT", "1")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def rows_key(rows):
    return [tuple(r) for r in rows]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/retry_drill"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    spark = (
        SparkSession.builder.master("local[8,2]")  # maxFailures=2: retry once
        .appName("retry-drill")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import caffeonspark_spark.catalog as C
    import caffeonspark_spark.operators.dedup as D
    from caffeonspark_spark.faults import fail_first_attempt
    from caffeonspark_spark.multimodal import imagehash as IH
    from caffeonspark_spark.multimodal.batch import assemble_batches
    from caffeonspark_spark.multimodal.columns import ColumnSpec

    results = {}

    def record(name, identical, faults, n_rows, secs):
        results[name] = {
            "identical": identical,
            "faults_fired": faults,
            "rows": n_rows,
            "sec": round(secs, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)

    def markers(d):
        return len(glob.glob(os.path.join(d, "attempt0_*")))

    # --- 1. composed dedup map under injected retries -----------------------
    t0 = time.time()
    md = os.path.join(work, "m_dedup_map")
    clean = IH.image_dedup(
        IH.portable_image_hash_table(spark, sf)
    ).orderBy("id").collect()
    faulted = IH.image_dedup(
        IH.portable_image_hash_table_df(
            # repartition(8) upstream: EIGHT tasks each fail-and-retry,
            # not just the single small-SF scan task
            fail_first_attempt(
                C.load_table(spark, sf, "documents").repartition(8),
                marker_dir=md,
            )
        )
    ).orderBy("id").collect()
    record(
        "image_dedup_map",
        rows_key(clean) == rows_key(faulted),
        markers(md),
        len(clean),
        time.time() - t0,
    )

    # --- 2. iterative CC with durable checkpoint under injected retries -----
    t0 = time.time()
    md = os.path.join(work, "m_neardup")
    clean = D.neardup_clusters(spark, sf).collect()
    orig_load = D.load_table
    try:
        D.load_table = lambda s, d, t: fail_first_attempt(
            orig_load(s, d, t).repartition(8), marker_dir=md
        )
        faulted = D.neardup_clusters(
            spark, sf, checkpoint_dir=os.path.join(work, "ckpt_cc")
        ).collect()
    finally:
        D.load_table = orig_load
    record(
        "neardup_clusters",
        rows_key(clean) == rows_key(faulted),
        markers(md),
        len(clean),
        time.time() - t0,
    )

    # --- 3. seeded augmentation + batch assembly under injected retries -----
    t0 = time.time()
    md = os.path.join(work, "m_augment")
    base = spark.createDataFrame(
        [
            (
                f"s{i:04d}",
                bytes(((i * 7 + j) % 256) for j in range(16 * 16 * 3)),
            )
            for i in range(200)
        ],
        "id string, data binary",
    ).repartition(8)

    def augment_stage(batches):
        import numpy as np
        import pyarrow as pa

        from caffeonspark_spark.multimodal.columns import (
            augment_hwc,
            raw_to_hwc,
        )

        for b in batches:
            pdf = b.to_pandas()
            out = []
            for rid, raw in zip(pdf["id"], pdf["data"]):
                img = raw_to_hwc(bytes(raw), 3, 16, 16)
                aug = augment_hwc(img, rid, seed=7, crop_h=8, crop_w=8)
                out.append(np.ascontiguousarray(aug).tobytes())
            yield pa.RecordBatch.from_arrays(
                [pa.array(pdf["id"]), pa.array(out, type=pa.binary())],
                names=["id", "data"],
            )

    def run_augment(active):
        df = fail_first_attempt(
            base, active=active, marker_dir=md if active else None
        )
        aug = df.mapInArrow(augment_stage, "id string, data binary")
        spec = ColumnSpec("data", "raw_image", channels=3, height=8, width=8)
        out = assemble_batches(aug, [spec], batch_size=32).collect()
        return sorted(
            (tuple(r.sample_ids), tuple(r.data), tuple(r.data_shape))
            for r in out
        )

    control = run_augment(active=False)
    faulted = run_augment(active=True)
    record(
        "augment_assemble",
        control == faulted,
        markers(md),
        len(control),
        time.time() - t0,
    )

    # --- 3b. distributed SequenceFile export under injected retries ---------
    t0 = time.time()
    md = os.path.join(work, "m_export")
    from caffeonspark_spark.sources import seqfile as SEQ

    src_fixture = SEQ.ensure_fixture(500)
    base_df = SEQ.seqfile_to_dataframe(spark, src_fixture, partitions=4)

    def export_and_hash(active, out_name):
        out = os.path.join(work, out_name)
        df = fail_first_attempt(
            base_df, active=active, marker_dir=md if active else None
        )
        SEQ.dataframe_to_seqfile(df, out)
        back = SEQ.seqfile_to_dataframe(spark, out)
        return sorted(
            (r.id, r.label, r.channels, r.height, r.width, r.encoded,
             bytes(r.data))
            for r in back.collect()
        )

    clean = export_and_hash(False, "export_clean")
    faulted = export_and_hash(True, "export_faulted")
    record(
        "seqfile_export",
        clean == faulted,
        markers(md),
        len(clean),
        time.time() - t0,
    )

    # --- 4. streaming restart from checkpoint mid-stream --------------------
    t0 = time.time()
    from caffeonspark_spark.functions.arrays import dsum

    src_dir = os.path.join(work, "events_src")
    events = C.load_table(spark, sf, "events").select(
        "event_type", "value"
    )
    events.repartition(6).write.mode("overwrite").parquet(src_dir)
    batch_expect = rows_key(
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sv"))
        .orderBy("event_type")
        .collect()
    )
    schema = spark.read.parquet(src_dir).schema

    def run_stream(tag, interrupt):
        ckpt = os.path.join(work, f"ckpt_{tag}")
        out = os.path.join(work, f"out_{tag}")

        def start(throttle):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src_dir)
            )
            agg = stream.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"), dsum("value").alias("sv")
            )

            def write_batch(df, batch_id):
                df.write.mode("overwrite").parquet(out)
                if throttle:  # slow the batches so the kill lands MID-stream
                    time.sleep(0.6)

            return (
                agg.writeStream.foreachBatch(write_batch)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .start()
            )

        killed_mid_stream = True
        if interrupt:
            q = start(throttle=True)
            # kill after >=2 committed micro-batches, mid-stream
            deadline = time.time() + 120
            while time.time() < deadline:
                p = q.lastProgress
                if p and p["batchId"] >= 2:
                    break
                time.sleep(0.05)
            stopped_at = (q.lastProgress or {}).get("batchId", -1)
            q.stop()
            q.awaitTermination(30)
            # vacuous-pass guard (r15 review finding): the kill must land
            # BEFORE the final batch (6 files -> batchIds 0..5), else the
            # restart recovers nothing and the scenario proves nothing
            killed_mid_stream = 0 <= stopped_at < 5
            q = start(throttle=False)  # recover from the checkpoint
        else:
            q = start(throttle=False)
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
        return (
            rows_key(spark.read.parquet(out).orderBy("event_type").collect()),
            killed_mid_stream,
        )

    uninterrupted, _ = run_stream("plain", interrupt=False)
    restarted, killed_mid = run_stream("restart", interrupt=True)
    record(
        "stream_restart",
        restarted == uninterrupted == batch_expect,
        # the mid-stream kill IS the injected fault; 0 when the stream
        # had already finished (vacuous run — fails the drill)
        1 if killed_mid else 0,
        len(restarted),
        time.time() - t0,
    )

    ok = all(
        r["identical"] and r["faults_fired"] > 0 for r in results.values()
    )
    print("RETRY_DRILL_RESULT " + json.dumps({"ok": ok, "scenarios": results}))
    # r16: the drill is part of the round-end certification — record the
    # artifact beside POSTURE_r{N}.json ($RETRY_DRILL_OUT, e.g.
    # RETRYDRILL_r16.json) so bit-identical-under-retry is re-proven and
    # committed at every final HEAD, not just inside pytest
    out = os.environ.get("RETRY_DRILL_OUT")
    if out:
        with open(out, "w") as f:
            json.dump({"ok": ok, "sf_dir": sf, "scenarios": results}, f,
                      indent=1)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
