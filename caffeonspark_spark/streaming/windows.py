"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2 "Streaming: none") — its closest
analogue is the executor-internal producer/consumer queue pipeline
(``CaffeProcessor.scala:124-177``). The rebuild exposes real streams as
first-class: file-source streaming over the same parquet layout, watermarked
tumbling/sliding windows, session windows, and streaming dedup — all
Structured Streaming built-ins, so state management, late-data handling and
checkpointing come from the engine.

Scale posture: every query here is incremental — state is bounded by the
watermark horizon; at 100 TB/day the same plans run against Kafka sources
with checkpointing to object storage (swap ``read_events_stream`` for
``spark.readStream.format("kafka")`` + the identical transformations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long (see catalog)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _raw_events_stream(spark: SparkSession, sf_dir: str):
    """Shared file-source setup for both event-stream readers: probe the
    on-disk ts type from the parquet footer (driver metadata only — a
    forced LongType over a µs-NTZ column silently yields micros-as-long,
    the round-4 frozen-watermark bug), rebuild the schema around it, and
    open the glob-filtered readStream. Returns (raw, disk_ts); callers
    apply their TIMESTAMP vs TIMESTAMP_NTZ conversion on top. ONE copy on
    purpose: a fix to the probe/glob/source setup must reach both
    variants (r7 self-review finding)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    disk_ts = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .schema["ts"]
        .dataType
    )
    schema = T.StructType(
        [
            T.StructField(f.name, disk_ts if f.name == "ts" else f.dataType)
            for f in EVENTS_SCHEMA.fields
        ]
    )
    # the streaming file source wants a directory; select just the events
    # table out of the sf_dir with a glob filter
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw, disk_ts


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (smoke path; production
    swaps in Kafka).

    ``ts`` comes out as a TIMESTAMP (instant) whose UTC wall-clock equals the
    batch catalog's TIMESTAMP_NTZ column (``catalog._load_events``; the
    session timezone is pinned UTC in ``engine.get_spark``, so the cast is
    value-preserving). The on-disk type is probed from the parquet footer
    (driver-side metadata only) because forcing a LongType schema onto a
    µs-NTZ column silently yields micros-as-long — feeding that through a
    nanos→µs ``div 1000`` put every event in 1970 and froze append-mode
    watermarks (the round-4 streaming bug). Only when the file genuinely
    stores nanos-as-long (TIMESTAMP(NANOS) via the legacy conf) do we divide.
    Watermarks on Spark 4 require TIMESTAMP, not NTZ, hence the cast.
    """
    raw, disk_ts = _raw_events_stream(spark, sf_dir)
    if isinstance(disk_ts, T.LongType):
        # nanos-as-long → µs floor-truncation → instant, same arithmetic as
        # the batch catalog so stream/batch parity holds bit-for-bit
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregation (overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based), the streaming sessionization
    primitive."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming face of the dedup extension.

    Uses ``dropDuplicatesWithinWatermark``, NOT plain ``dropDuplicates``:
    with ``dropDuplicates(["event_id"])`` the event-time column is not part
    of the key subset, so the watermark never evicts dedup state and it
    grows without bound — a run-forever leak at production stream volume.
    The WithinWatermark form keeps a key's state only until the watermark
    passes its first-seen event time, bounding state to one horizon's worth
    of distinct keys."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


_PARITY_SEQ = [0]


def _read_events_ntz_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source events stream with ``ts`` as TIMESTAMP_NTZ, converted
    with the SAME exact-long arithmetic as the batch catalog
    (``catalog._load_events``) so streaming results are bit-identical to
    batch and independent of the session timezone — the foundation of the
    parity rows below."""
    raw, disk_ts = _raw_events_stream(spark, sf_dir)
    if isinstance(disk_ts, T.LongType):
        return raw.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


_PARITY_LAST: dict[str, str] = {}


def _run_parity(
    spark: SparkSession, agg: DataFrame, tag: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a parity streaming query to the memory sink and return its
    table (complete mode for aggregations; append for stream-stream
    joins, whose inner results are emitted on match). The PREVIOUS
    invocation's table for the same tag is dropped first — memory-sink
    tables hold the full result in driver memory, so repeated invocations
    (bench best-of-N, driver re-runs) must not accumulate one copy per
    call. Consequence: only the most recent DataFrame per tag stays
    readable, which matches how the driver consumes a query (collect
    immediately after calling it)."""
    _PARITY_SEQ[0] += 1
    name = f"stream_{tag}_parity_{_PARITY_SEQ[0]}"
    prev = _PARITY_LAST.get(tag)
    if prev:
        try:
            spark.catalog.dropTempView(prev)
        except Exception:  # other session / already gone
            pass
    run_to_memory(agg, name, output_mode=output_mode)
    _PARITY_LAST[tag] = name
    return spark.table(name)


def stream_tumbling_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-equals-batch parity row: drive the tumbling hourly window
    aggregation over the events table as a REAL Structured Streaming query
    (file source → complete-mode window agg → memory sink, run to
    completion) and return it in the batch ``events_hourly`` shape. The
    oracle is the batch SQL — stream-to-completion must equal the batch
    window agg exactly, which pins the whole streaming path (source
    conversion, event-time windowing, incremental state) with a hash
    check rather than a rows-only count.

    Determinism notes: ``ts`` is TIMESTAMP_NTZ via exact long arithmetic
    (timezone-independent); ``sum_value`` uses the decimal-grid sum
    (``dsum``) like the batch twin so doubles are bit-identical; complete
    output mode emits every window (append mode would hold back windows
    the watermark never passed at end-of-stream)."""
    from caffeonspark_spark.functions.arrays import dsum

    raw = _read_events_ntz_stream(spark, sf_dir)
    agg = (
        raw.groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _run_parity(spark, agg, "tumbling")


def stream_sliding_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming parity: 1-hour windows sliding by 15
    minutes (each event lands in exactly 4 windows), driven to completion
    and hash-checked against a DuckDB oracle that reconstructs Spark's
    epoch-aligned window grid with unnest(range(0,4)) arithmetic. Pins
    the overlapping-window assignment logic, not just tumbling."""
    from caffeonspark_spark.functions.arrays import dsum

    raw = _read_events_ntz_stream(spark, sf_dir)
    agg = (
        raw.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _run_parity(spark, agg, "sliding")


def stream_session_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window streaming parity: per-user gap-based sessions
    (30-minute gap) via the native streaming ``session_window``, driven to
    completion; the oracle is the BATCH sessionization SQL (lag → gap flag
    → cumulative sum), proving streaming and batch sessionization agree
    session-for-session. ``session_window`` ends sessions at last-event +
    gap, so the comparable last-event time is ``sess.end - gap``."""
    raw = _read_events_ntz_stream(spark, sf_dir)
    agg = (
        raw.groupBy(
            F.session_window("ts", "30 minutes").alias("sess"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("sess_start"),
            F.expr("sess.end - INTERVAL '30' MINUTE").alias("sess_last"),
            "n_events",
        )
    )
    return _run_parity(spark, agg, "session")


def stream_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join parity row: attribute each purchase to every
    click by the same user in the preceding 2 hours, run as a REAL
    Structured Streaming inner join (two file-source streams → interval
    equi-join → memory sink, driven to completion) and hash-checked
    against the batch interval self-join SQL. Pins the stream-stream join
    path itself — the one streaming operator class the window-parity trio
    does not touch.

    The parity run joins on TIMESTAMP_NTZ event time and carries NO
    watermark: inner stream-stream joins emit on match (emission never
    waits on a watermark), so run-to-completion output is the full match
    set, and NTZ keeps the result timezone-independent for the driver
    compare (watermarks require TIMESTAMP). The production form is
    ``stream_stream_interval_join`` — watermarked on both sides with the
    same interval bound so join state is garbage-collected past the
    horizon (O(rate × horizon), pytest-pinned in test_streaming.py);
    unbounded state here is confined to the verification harness."""
    raw = _read_events_ntz_stream(spark, sf_dir)
    l = raw.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = raw.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    joined = l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("r_ts") <= F.col("l_ts")),
        "inner",
    ).select("l_key", "l_event_id", "l_ts", "r_event_id", "r_ts")
    return _run_parity(spark, joined, "join", output_mode="append")


ORACLE_STREAM_JOIN_PARITY = """
    SELECT l.user_id AS l_key, l.event_id AS l_event_id, l.ts AS l_ts,
           r.event_id AS r_event_id, r.ts AS r_ts
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts - INTERVAL 2 HOUR
     AND r.ts <= l.ts
    WHERE l.event_type = 'purchase' AND r.event_type = 'click'
"""


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion against the file source and
    return the in-memory result table name (test/smoke harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        # stop even when the stream fails mid-run: a failed-but-registered
        # query would otherwise stay attached to the session (and its
        # memory sink leak) for the session's lifetime
        q.stop()
    return name


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count +
    running value sum via ``applyInPandasWithState`` (the rebuild's analogue
    of the reference's per-executor accumulating state,
    ``CaffeProcessor.scala:388-411``).

    Emits one row per user per micro-batch with the updated totals. State is
    a single (count, units) pair per user — bounded, watermark-free.

    Determinism: the running sum is accumulated as INTEGER nano-units
    (each value floored onto the 1e-9 grid) — a float accumulator's
    result depended on the row order the state store happened to feed the
    pandas batches, so reruns weren't bit-identical and no oracle could
    match it; integer addition is order-independent (the
    ``decayed_engagement`` floor-grid doctrine applied to streaming
    state).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        n, units = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            units += int(
                np.floor(pdf["value"].to_numpy(dtype="float64") * 1e9)
                .astype("int64")
                .sum()
            )
        state.update((n, units))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [units / 1e9],
            }
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, units long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stateful_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-stateful-operator parity row: the ``applyInPandasWithState``
    per-user running stats driven to completion must equal the batch
    per-user aggregation — pinning the one streaming operator class the
    window/join parity rows don't touch (arbitrary user state). Update
    mode emits one row per user per micro-batch; the final row per user
    (max ``n_events`` — the count is strictly increasing) is the running
    total at end-of-stream, which the oracle reproduces with the same
    floor-grid arithmetic."""
    raw = _read_events_ntz_stream(spark, sf_dir)
    emitted = _run_parity(
        spark, stateful_user_stats(raw), "stateful", output_mode="update"
    )
    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


ORACLE_STREAM_STATEFUL_PARITY = """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 1e9) AS BIGINT)) AS BIGINT) / 1e9
               AS total_value
    FROM events
    GROUP BY user_id
"""


def stream_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-dedup parity row (r14 — the one declared-surface gap in
    the streaming operator matrix: ``dedup_stream`` had tests but no
    hash-checked row): every event is TRIPLED in-stream (explode of a
    3-element copy array — duplicate ingestion, the condition the
    operator exists for), ``dropDuplicatesWithinWatermark`` on event_id
    dedups it as a real streaming query driven to completion (append
    mode), and the surviving rows roll up per event_type batch-side. The
    oracle is the same rollup over the events table, where each event_id
    appears exactly once — a leaked duplicate inflates every aggregate, a
    lost event deflates them, either breaks the hash. ``value`` sums on
    the decimal grid like every checked float.

    Timezone note: watermarks require TIMESTAMP (not NTZ), so ``ts`` is
    cast for the watermark only — it never reaches the output, and the
    result is still tz-independent: append-mode dedup emits each
    first-seen row immediately, the triplicated copies share their
    original's micro-batch by construction (explode of one row), and no
    event_id recurs across batches, so watermark state-eviction timing
    (the only tz-sensitive part) cannot change what is emitted."""
    from caffeonspark_spark.functions.arrays import dsum

    raw = _read_events_ntz_stream(spark, sf_dir)
    tripled = raw.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "_copy", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2)))
    )
    ded = dedup_stream(tripled).select("event_id", "event_type", "value")
    emitted = _run_parity(spark, ded, "dedup", output_mode="append")
    return emitted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_id").alias("n_ids"),
        dsum("value").alias("sum_value"),
    )


ORACLE_STREAM_DEDUP_PARITY = """
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT event_id) AS n_ids,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
"""


def stream_late_data_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query (✔oracle, r15): the WATERMARK LATE-DATA DROP policy
    as a hash-checked row — previously pinned only by a unit test.

    Construction: deterministic waves landed into a file-source
    directory between triggers (cached per corpus, hardlinked per
    invocation — r16). Wave 1 carries every event on time. Wave 2 re-sends planted
    STRAGGLERS (``event_id % 10 == 7`` with event time at least 2 hours
    behind the corpus max — strictly behind the 1-hour watermark wave 1
    established) plus one far-future sentinel that pushes the watermark
    past every real window. The hourly append-mode aggregation must
    therefore (a) DROP every straggler copy — a leak re-opens an already
    -emitted window and the duplicate window row breaks the rollup hash —
    and (b) emit every real window exactly once (the sentinel's own
    window is never emitted: the watermark never passes it).

    The oracle is the plain batch hourly rollup over ``events`` — i.e.
    "stream result == batch with the watermark filter applied", since
    every dropped straggler is a duplicate of an on-time event.

    Arrival phasing: the waves are added to the source directory BETWEEN
    ``processAllAvailable`` rounds, the way real late data arrives. This
    matters: files all queued before the first trigger see a one-batch
    LAG in the late-data filter (the filter uses the pre-update
    watermark while progress already reports the advanced one — measured
    on Spark 4.1), so pre-queued stragglers are NOT dropped. Genuinely
    late arrival — discovery after the on-time wave's commit — is both
    the semantics the policy exists for and the deterministic one.

    Timezone note: watermarks require TIMESTAMP, so ``ts`` is built with
    ``timestamp_micros`` (exact epoch arithmetic) and windows leave the
    result as epoch SECONDS (``win.start`` cast to long) — never a
    rendered timestamp — keeping the row tz-independent."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import time as _time

    from caffeonspark_spark.catalog import load_table
    from caffeonspark_spark.functions.arrays import dsum

    events = load_table(spark, sf_dir, "events").select(
        F.col("event_id"),
        # tz-FREE epoch micros from the NTZ column (an NTZ→TIMESTAMP cast
        # would re-interpret wall time in the session timezone)
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        F.col("event_type"),
        F.col("value"),
    )
    hour_us = 3_600_000_000
    # ONE corpus pass for both driver scalars (r16, guide §1.2 "don't
    # compute things twice"): the max event time (straggler cutoff) and
    # the distinct real-window count (the flush-poll stop condition) were
    # two separate scans; a single two-column agg row carries both.
    _scal = events.agg(
        F.max("ts_us").alias("mx"),
        F.count_distinct(
            (F.col("ts_us") / hour_us).cast("long"), F.col("event_type")
        ).alias("nw"),
    ).first()
    max_us, n_windows = _scal[0], _scal[1]
    straggler = (F.col("event_id") % 10 == 7) & (
        F.col("ts_us") <= max_us - 2 * hour_us
    )

    _PARITY_SEQ[0] += 1
    # sweep earlier invocations of THIS process and leftovers of DEAD
    # processes (per-pid sweeps alone leak one staging dir per exited
    # process — r15 review findings); the live run also rmtrees on exit
    from caffeonspark_spark.catalog import table_nrows
    from caffeonspark_spark.sources.common import (
        pid_alive as _pid_alive,
        sweep_stale_pid_dirs,
    )

    sweep_stale_pid_dirs("cos_late_parity_")
    src = _os.path.join(
        "/tmp", f"cos_late_parity_{_os.getpid()}_{_PARITY_SEQ[0]}"
    )
    _os.makedirs(src)
    cols = ["ts_us", "event_type", "value"]
    waves = [
        events.select(cols),  # wave 0: everything, on time
        events.where(straggler).select(cols),  # wave 1: late re-sends
        spark.createDataFrame(  # wave 2: far-future watermark sentinel
            [(max_us + 100 * hour_us, "__sentinel", 0.0)],
            "ts_us long, event_type string, value double",
        ),
    ]

    # the wave files are DETERMINISTIC per corpus, so build them once
    # into a shared cache (multi-part parallel writes — the old
    # per-invocation coalesce(1) full-corpus write was the row's
    # dominant cost; r15 VERDICT) and hardlink them into each
    # invocation's source dir. Arrival PHASING is untouched: links are
    # created between processAllAvailable rounds exactly as the writes
    # were. Build-then-rename keeps the cache all-or-nothing under
    # concurrent builders (same discipline as the seqfile fixtures).
    # The key is CONTENT-derived, not name-derived: row count, max event
    # time, and the distinct-window count (all already computed above) —
    # a regenerated/reseeded corpus under the same path+size changes the
    # key, so stale waves can never feed the parity row (r16 review)
    import hashlib as _hashlib

    corpus_key = _hashlib.sha1(
        f"{table_nrows(sf_dir, 'events')}_{max_us}_{n_windows}".encode()
    ).hexdigest()[:12]
    cache = _os.path.join("/tmp", f"cos_late_waves_v1_{corpus_key}")
    if not _os.path.isdir(cache):
        # best-effort sweep of crashed builders' leftovers (a full 3-wave
        # parquet copy each) before building our own (r16 review)
        for stale in _glob.glob("/tmp/cos_late_waves_v1_*.build_*"):
            pid_s = stale.rsplit("_", 1)[-1]
            if pid_s.isdigit() and not _pid_alive(int(pid_s)):
                _shutil.rmtree(stale, ignore_errors=True)
        build = f"{cache}.build_{_os.getpid()}"
        _shutil.rmtree(build, ignore_errors=True)
        _os.makedirs(build)
        try:
            for i in range(3):
                tmp = _os.path.join(build, f"_build{i}")
                waves[i].write.mode("overwrite").parquet(tmp)
                parts = sorted(
                    _glob.glob(_os.path.join(tmp, "part-*.parquet"))
                )
                for j, part in enumerate(parts):
                    _os.replace(
                        part, _os.path.join(build, f"wave{i}_{j:04d}.parquet")
                    )
                _shutil.rmtree(tmp)
        except BaseException:
            _shutil.rmtree(build, ignore_errors=True)
            raise
        try:
            _os.rename(build, cache)
        except OSError:  # another process won the race — theirs is whole
            _shutil.rmtree(build, ignore_errors=True)

    def _land(i: int) -> None:
        files = sorted(
            _glob.glob(_os.path.join(cache, f"wave{i}_*.parquet"))
        )
        if not files:
            raise RuntimeError(f"wave cache {cache} has no wave-{i} files")
        for f in files:
            dst = _os.path.join(src, _os.path.basename(f))
            try:
                _os.link(f, dst)  # hardlink: no byte copy
            except OSError:
                _shutil.copy2(f, dst)

    _land(0)
    stream = (
        spark.readStream.schema("ts_us long, event_type string, value double")
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").cast("long").alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = f"stream_late_data_parity_{_PARITY_SEQ[0]}"
    prev = _PARITY_LAST.get("late_data")
    if prev:
        try:
            spark.catalog.dropTempView(prev)
        except Exception:  # other session / already gone
            pass
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()  # wave 0 commits; watermark = max - 1h
        _land(1)
        q.processAllAvailable()  # stragglers arrive LATE → dropped
        _land(2)
        q.processAllAvailable()  # sentinel closes every real window
        # the final eviction may ride a no-data micro-batch that
        # processAllAvailable does not wait for — poll to the known
        # window count (bounded; a leak would overshoot and hash-fail)
        deadline = _time.time() + 60
        while (
            spark.table(name).count() < n_windows
            and _time.time() < deadline
        ):
            _time.sleep(0.2)
    finally:
        q.stop()
        # the memory-sink table is the result; the source copy is dead
        _shutil.rmtree(src, ignore_errors=True)
    _PARITY_LAST["late_data"] = name
    return spark.table(name)


ORACLE_STREAM_LATE_DATA_PARITY = """
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_epoch,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
"""


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension (broadcast by Catalyst — the dim is batch-side, so no
    stream state is kept). The standard lookup-enrichment topology; the
    static side re-reads per micro-batch, so at scale it should be a small
    table or a cached/Delta lookup."""
    return events.join(F.broadcast(dim), on, "left")


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    pair each left event with right events of the same key that happened in
    the preceding ``horizon`` (attribution topology, e.g. click→purchase).

    Both sides carry watermarks, and the join predicate bounds right.ts to a
    window around left.ts — together these let the engine garbage-collect
    join state past the horizon, so state size is O(rate × horizon), not
    O(stream length). Without the time bound Spark would have to keep every
    row forever; this shape is the scalable form of a stream-stream join.
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    ).withWatermark("l_ts", horizon)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    ).withWatermark("r_ts", horizon)
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("r_ts") <= F.col("l_ts")),
        "inner",
    ).select("l_key", "l_event_id", "l_ts", "r_event_id", "r_ts")
