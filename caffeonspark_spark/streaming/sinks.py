"""Streaming sinks beyond the built-in file sink.

The reference persisted results with driver-side writes plus an HDFS copy
(``CaffeOnSpark.scala:63-79``, ``FSUtils.scala:21-33``) — one-shot, batch
only. The rebuild's streaming face needs a sink that stays exactly-once
under retries: Structured Streaming guarantees each micro-batch is
delivered to ``foreachBatch`` at-least-once with a stable ``batch_id``, so
the sink must be idempotent per batch id to upgrade that to exactly-once.

``foreach_batch_parquet`` implements the standard idempotent pattern:
every micro-batch lands in a ``batch_id=N`` partition directory with
dynamic partition overwrite, so a replayed batch overwrites its own
partition instead of appending duplicates. Downstream readers just scan
the root path; at 100 TB the same shape writes to object storage and the
partition column doubles as an incremental-processing cursor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def foreach_batch_parquet(stream_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Start an exactly-once parquet sink: one ``batch_id`` partition per
    micro-batch, idempotent under micro-batch replay."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def replay_batch(spark: SparkSession, df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Re-deliver one batch the way a recovering stream would (test/ops
    hook): the dynamic-overwrite write must leave other batches untouched
    and not duplicate this one."""
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )
