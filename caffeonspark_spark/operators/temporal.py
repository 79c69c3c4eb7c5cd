"""Temporal operators over the events table: as-of join + sessionization.

Spark has no native AS-OF join (the guide's "common OLAP patterns" list);
the scalable formulation used here is the union-tag trick: tag both streams,
union, and take a running ``last(match_ts)`` window per user ordered by time
— one shuffle on user_id, no range-join blowup, works at any scale because
the window is incremental. The oracle uses DuckDB's correlated-subquery
formulation of the same semantics (max prior ts).

Sessionization (batch): gap>threshold cumulative-sum windows — the batch twin
of ``streaming.session_windows`` and a pure window-function plan, identical
in both engines, so it oracle-checks exactly (all integer/timestamp math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from caffeonspark_spark.catalog import load_table


def asof_join_events(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """For each ``left_type`` event: the user's most recent ``right_type``
    event at-or-before it. Union-tag + running-last window (one shuffle)."""
    e = events.select("event_id", "ts", "user_id", "event_type")
    tagged = e.where(F.col("event_type").isin(left_type, right_type)).withColumn(
        "_is_right", (F.col("event_type") == right_type).cast("int")
    )
    # order: ts, then right-events first at identical ts so ties count as
    # "at-or-before" (matches the oracle's c.ts <= e.ts)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("_is_right"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = tagged.withColumn(
        "last_right_ts",
        F.last(F.when(F.col("_is_right") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    return matched.where(F.col("event_type") == left_type).select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts"),
        F.col("last_right_ts").alias("last_click_ts"),
    )


def asof_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_join_events(load_table(spark, sf_dir, "events"))


ORACLE_ASOF_JOIN = """
    SELECT e.event_id, e.user_id, e.ts AS purchase_ts,
           (SELECT max(c.ts) FROM events c
            WHERE c.user_id = e.user_id AND c.event_type = 'click'
              AND c.ts <= e.ts) AS last_click_ts
    FROM events e
    WHERE e.event_type = 'purchase'
"""


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: new session when the gap is >= ``gap_minutes``
    (the half-open-window rule of Spark's streaming ``session_window``, so
    batch and streaming sessionization agree event-for-event — parity is
    tested in tests/test_streaming.py).

    lag → gap flag → cumulative sum = session ordinal; then per-session
    aggregates. Two window passes + one agg, all on the same user_id
    partitioning — Catalyst reuses the exchange.
    """
    order = [F.asc("ts"), F.asc("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_cum = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # timestamp-interval comparison: exact µs arithmetic in both engines
    # (casting to epoch seconds would truncate sub-second gaps differently)
    flagged = events.withColumn(
        "new_session",
        F.when(
            (F.col("ts") - F.lag(F.col("ts")).over(w_lag))
            >= F.expr(f"INTERVAL '{gap_minutes}' MINUTE"),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w_cum))
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
        )
        .withColumn("session_id", F.col("session_id").cast("long"))
    )


def sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


ORACLE_SESSIONIZE = """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS sess_start, MAX(ts) AS sess_end
    FROM sess GROUP BY user_id, session_id
"""


def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time-bucket rollup of the events stream table: one pass
    producing (day, hour) leaf aggregates, per-day subtotals and the grand
    total (the continuous-aggregate / "hypertable rollup" shape). ROLLUP
    plants a single Expand + one shuffle — at 100 TB the leaf cardinality
    (hours) dominates and partial aggs collapse everything map-side."""
    from caffeonspark_spark.functions.arrays import dsum

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
    )


def asof_join_tolerance_query(spark: SparkSession, sf_dir: str, minutes: int = 30) -> DataFrame:
    """As-of join with a tolerance horizon: the most recent click within
    ``minutes`` before each purchase, else NULL. Same single-shuffle window
    plan; the horizon is a post-window null-out (the running max click ≤ ts
    is within tolerance iff ANY click is)."""
    base = asof_join_events(load_table(spark, sf_dir, "events"))
    horizon_ok = F.col("last_click_ts") >= (
        F.col("purchase_ts") - F.expr(f"INTERVAL {minutes} MINUTES")
    )
    return base.select(
        "event_id", "user_id", "purchase_ts",
        F.when(horizon_ok, F.col("last_click_ts")).alias("last_click_ts"),
    )


ORACLE_ASOF_TOLERANCE = """
    SELECT e.event_id, e.user_id, e.ts AS purchase_ts,
           (SELECT max(c.ts) FROM events c
            WHERE c.user_id = e.user_id AND c.event_type = 'click'
              AND c.ts <= e.ts
              AND c.ts >= e.ts - INTERVAL 30 MINUTE) AS last_click_ts
    FROM events e
    WHERE e.event_type = 'purchase'
"""


def range_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame: for every event, how many of the same
    user's events fall in the preceding hour (RANGE BETWEEN 1 HOUR
    PRECEDING) — the rate-limit/velocity feature shape. Spark range frames
    need a numeric ordering, so ts is projected to epoch MICROSECONDS (the
    engine's full timestamp precision — epoch seconds would truncate
    sub-second events and count the 1-hour edge differently than the
    oracle's full-precision INTERVAL frame); one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    # timestampdiff (not unix_micros/unix_timestamp) because ts is NTZ: no
    # session-timezone conversion, no second-truncation
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us)
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


ORACLE_RANGE_WINDOW = """
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                    AND CURRENT ROW) AS n_last_hour
    FROM events
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """Generic as-of join (pandas ``merge_asof`` semantics, distributed):
    for every left row, the single nearest right row by time within the
    same ``on`` key — ``backward`` (right_ts <= left_ts) or ``forward``
    (right_ts >= left_ts).

    Same union-tag + running-window plan as the events specialization: one
    shuffle on the key, no range-join blowup, any scale. Right payload
    columns come back suffixed; unmatched left rows keep NULLs.

    Tie contract: when several right rows share the nearest timestamp for
    a key, the one with the GREATEST payload tuple wins — a deterministic,
    partitioning-independent rule (without it ``F.last`` returned
    whichever equal-ts row the partition sort happened to order last, so
    payload columns varied run to run). Payloads containing unorderable
    types (maps) fall back to the undetermined-tie behavior.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = [c for c in right.columns if c not in (on, right_ts)]
    l_tag = left.select(
        F.col(on), F.col(left_ts).alias("_t"), F.lit(0).alias("_is_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
    )
    r_tag = right.select(
        F.col(on), F.col(right_ts).alias("_t"), F.lit(1).alias("_is_r"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_lrow"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
    )
    both = l_tag.unionByName(r_tag)
    # deterministic tie-break among equal-ts right rows: order by the
    # payload tuple so the running last() always lands on the greatest one
    # (maps aren't orderable — skip the tiebreak for those payloads)
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        return True

    tie = (
        [F.asc(F.struct(*[F.col(f"_p_{c}") for c in payload]))]
        if payload
        and all(_orderable(right.schema[c].dataType) for c in payload)
        else []
    )
    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc("_t"), F.desc("_is_r"), *tie)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.desc("_t"), F.desc("_is_r"), *tie)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    filled = both.select(
        "*",
        F.last(F.when(F.col("_is_r") == 1, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias(f"{right_ts}{suffix}"),
        *[
            F.last(F.when(F.col("_is_r") == 1, F.col(f"_p_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in payload
        ],
    )
    out_cols = [F.col("_lrow")[c].alias(c) for c in left.columns]
    return filled.where(F.col("_is_r") == 0).select(
        *out_cols,
        F.col(f"{right_ts}{suffix}"),
        *[F.col(f"{c}{suffix}") for c in payload],
    )


def _hot_hours(events: DataFrame, hot_factor: float) -> DataFrame:
    """Hours whose event count exceeds ``hot_factor`` × the average hourly
    count. Threshold determinism: avg = exact-long total / exact-long hour
    count in ONE double division on both engines, so hot/not decisions are
    identical between Spark and the DuckDB oracle."""
    hourly = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = hourly.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_n")
    )
    return (
        hourly.crossJoin(F.broadcast(stats))
        .where(F.col("n") > F.lit(hot_factor) * F.col("avg_n"))
        .select("hr")
    )


def interval_overlap_sessions(
    spark: SparkSession, sf_dir: str, hot_factor: float = 1.5
) -> DataFrame:
    """Interval-overlap join (the time-range join class): per-user sessions
    overlapped against "hot hours" — hours whose event count exceeds
    ``hot_factor`` × the average hourly count. Emits sessions touching at
    least one hot hour with the overlap count.

    Scale shape: the hot-hour set is an aggregate of the fact table
    (small — it is bounded by the time span, not the data volume), so the
    overlap is a BROADCAST range join: the big session side streams
    through unchanged, each row probing the in-memory interval set. For
    interval sets too large to broadcast, bucketize both sides by hour
    and equi-join on the bucket (each interval explodes to its covered
    hours) — same results, shuffle bound by interval span. Threshold
    determinism: avg = exact-long total / exact-long hour count in ONE
    double division on both engines, so hot/not decisions are identical."""
    events = load_table(spark, sf_dir, "events")
    hot = _hot_hours(events, hot_factor)
    sessions = sessionize(events)
    overlap = sessions.join(
        F.broadcast(hot),
        (F.col("hr") < F.col("sess_end"))
        & (F.col("hr") + F.expr("INTERVAL '1' HOUR") > F.col("sess_start")),
    )
    return (
        overlap.groupBy("user_id", "session_id")
        .agg(
            F.min("sess_start").alias("sess_start"),
            F.count(F.lit(1)).alias("n_hot_hours"),
        )
        .orderBy("user_id", "session_id")
    )


ORACLE_INTERVAL_OVERLAP_SESSIONS = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS n
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    stats AS (
        SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_n FROM hourly
    ),
    hot AS (
        SELECT hr FROM hourly, stats WHERE n > 1.5 * avg_n
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               MIN(ts) AS sess_start, MAX(ts) AS sess_end
        FROM sess GROUP BY user_id, session_id
    )
    SELECT s.user_id, s.session_id, MIN(s.sess_start) AS sess_start,
           COUNT(*) AS n_hot_hours
    FROM sessions s JOIN hot h
      ON h.hr < s.sess_end AND h.hr + INTERVAL '1' HOUR > s.sess_start
    GROUP BY s.user_id, s.session_id
    ORDER BY s.user_id, s.session_id
"""


def interval_overlap_bucketized(
    spark: SparkSession, sf_dir: str, hot_factor: float = 1.5
) -> DataFrame:
    """The SCALE twin of ``interval_overlap_sessions``: identical results
    (same oracle), but the range predicate is rewritten as an hour-bucket
    EQUI-join, for interval sets too large to broadcast.

    Each session explodes to the hour buckets it covers —
    ``sequence(trunc(sess_start), trunc(sess_end), 1h)`` filtered to
    ``hr < sess_end`` reproduces the half-open predicate
    ``hr < sess_end AND hr + 1h > sess_start`` exactly (the truncated
    start hour is the smallest hour satisfying the second conjunct; the
    filter enforces the first) — then equi-joins the hot-hour set on the
    bucket. Each covered hour appears once per session, so a bucket match
    IS an overlap: no per-(session, interval) dedup needed. Shuffle is
    bound by Σ interval-hours, candidates by bucket collisions — no
    broadcast, no nested-loop, survives an interval side of any size.
    100 TB posture: sessions are hours long, so the explode factor is
    small; a skewed hot bucket salts like any equi-join key (SCALE.md)."""
    events = load_table(spark, sf_dir, "events")
    hot = _hot_hours(events, hot_factor)
    sessions = sessionize(events)
    buckets = sessions.select(
        "user_id",
        "session_id",
        "sess_start",
        "sess_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("sess_start")),
                F.date_trunc("hour", F.col("sess_end")),
                F.expr("INTERVAL '1' HOUR"),
            )
        ).alias("hr"),
    ).where(F.col("hr") < F.col("sess_end"))
    overlap = buckets.join(hot, "hr")
    return (
        overlap.groupBy("user_id", "session_id")
        .agg(
            F.min("sess_start").alias("sess_start"),
            F.count(F.lit(1)).alias("n_hot_hours"),
        )
        .orderBy("user_id", "session_id")
    )


def asof_join_forward(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """Forward as-of join: for each ``left_type`` event, the user's NEXT
    ``right_type`` event at-or-after it (the attribution mirror of the
    backward form — "first click after the purchase"). Composes the
    generic ``asof_join(direction='forward')`` — whose reversed-time
    window already counts a SAME-timestamp right event as "at-or-after"
    (right rows sort before left at equal ts in the desc-time order, so
    they land inside the running frame) — rather than re-deriving the
    frame; one shuffle, no self-join."""
    left = events.where(F.col("event_type") == left_type).select(
        "event_id", "user_id", "ts"
    )
    right = events.where(F.col("event_type") == right_type).select("user_id", "ts")
    out = asof_join(left, right, on="user_id", direction="forward")
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("ts_right").alias("next_click_ts"),
    )


def asof_join_forward_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_join_forward(load_table(spark, sf_dir, "events"))


ORACLE_ASOF_FORWARD = """
    SELECT e.event_id, e.user_id, e.ts AS purchase_ts,
           (SELECT min(c.ts) FROM events c
            WHERE c.user_id = e.user_id AND c.event_type = 'click'
              AND c.ts >= e.ts) AS next_click_ts
    FROM events e
    WHERE e.event_type = 'purchase'
"""


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase) per user — the
    event-sequence report behind conversion dashboards and, in a training
    pipeline, behind "did this interaction sequence complete" labeling.
    No reference counterpart (the reference is batch-relational only);
    LLM-pipeline extension on the events table.

    Semantics: stage k counts only if it happens AT/AFTER the user's first
    completion of stage k-1 (first view, then first click >= that view,
    then first purchase >= that click). Per user: each stage's timestamp
    (NULL once the chain breaks) and the reached depth 0-3.

    Plan shape: three conditional aggregations, all keyed on user_id —
    stage k is min(ts) FILTERed by type and by the stage-(k-1) column; the
    per-user stage table re-joins the events on the same user_id key, so
    the aggregations and joins share one hash partitioning (Catalyst
    reuses the exchange; AQE broadcasts the per-user side while it fits,
    and at |users| beyond broadcast size the co-partitioned sort-merge
    join is the right plan — no extra shuffle either way). Everything is
    timestamp min/max — integer-exact in both engines.
    """
    e = events.select("user_id", "event_type", "ts")
    fv = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view")
    )
    fc = (
        e.join(fv, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("first_view")),
                    F.col("ts"),
                )
            ).alias("first_click")
        )
    )
    fp = (
        e.join(fc, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_click")),
                    F.col("ts"),
                )
            ).alias("first_purchase")
        )
    )
    return (
        fv.join(fc, "user_id")
        .join(fp, "user_id")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            (
                F.when(F.col("first_purchase").isNotNull(), F.lit(3))
                .when(F.col("first_click").isNotNull(), F.lit(2))
                .when(F.col("first_view").isNotNull(), F.lit(1))
                .otherwise(F.lit(0))
            ).alias("funnel_depth"),
        )
    )


def funnel_conversion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_conversion(load_table(spark, sf_dir, "events"))


ORACLE_FUNNEL_CONVERSION = """
    WITH fv AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
        FROM events GROUP BY user_id
    ),
    fc AS (
        SELECT e.user_id,
               min(CASE WHEN e.event_type = 'click' AND e.ts >= fv.first_view
                   THEN e.ts END) AS first_click
        FROM events e JOIN fv USING (user_id) GROUP BY e.user_id
    ),
    fp AS (
        SELECT e.user_id,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts >= fc.first_click
                   THEN e.ts END) AS first_purchase
        FROM events e JOIN fc USING (user_id) GROUP BY e.user_id
    )
    SELECT user_id, first_view, first_click, first_purchase,
           CASE WHEN first_purchase IS NOT NULL THEN 3
                WHEN first_click IS NOT NULL THEN 2
                WHEN first_view IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth
    FROM fv JOIN fc USING (user_id) JOIN fp USING (user_id)
"""


def decayed_engagement(events: DataFrame, halflife_days: int = 1) -> DataFrame:
    """Exponential time-decay weighted engagement score per user — the
    recency-weighted aggregation used for freshness-aware sampling weights
    (recent interactions matter more) and user-activity ranking. No
    reference counterpart; LLM-pipeline extension.

    weight = 0.5 ** floor(age_days / halflife_days) with age measured from
    the corpus max event time. The exponent is kept INTEGER so the weight
    is an exact power of two (0.5**n is exactly representable; libm pow on
    both engines returns the exact value for exactly-representable
    results). Each contribution value*weight is one IEEE multiply,
    FLOORED onto the 1e-9 grid and summed as exact integer nano-units —
    floor, not the usual bround grid: two-decimal values times 2^-n
    terminate exactly on round-grid midpoints, where Spark's bround
    (exact-binary half-even) and DuckDB's double→decimal cast
    (shortest-repr rounding) disagree; floor has no tie to disagree on.

    Plan shape: one 1-row max(ts) aggregate broadcast back (crossJoin with
    a 1-row frame is a BroadcastNestedLoopJoin of one row), then a single
    hash aggregation on user_id with map-side partials — two scans, one
    shuffle, no window. At 100 TB the max-ts scalar would come from
    partition metadata (max stats) for free.
    """
    ref = events.agg(F.max("ts").alias("ref_ts"))
    # epoch seconds of a TIMESTAMP_NTZ via exact integer arithmetic from the
    # epoch (NTZ→long casts are illegal and unix_timestamp() would drag the
    # session timezone in). (us - pmod(us, 1e6)) div 1e6 is a true FLOOR:
    # the oracle's epoch_us//1000000 floors, while a bare `div` truncates
    # toward zero and would disagree on pre-1970 timestamps
    epoch_s = (
        lambda c: F.expr(
            "(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            f" {c}) - pmod(timestampdiff(MICROSECOND,"
            f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {c}), 1000000))"
            " div 1000000"
        )
    )
    aged = events.crossJoin(F.broadcast(ref)).withColumn(
        "w",
        F.pow(
            F.lit(0.5),
            F.floor(
                (epoch_s("ref_ts") - epoch_s("ts"))
                / F.lit(86400.0 * halflife_days)
            ).cast("double"),
        ),
    )
    return aged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.floor(F.col("value") * F.col("w") * F.lit(1e9)))
            / F.lit(1e9)
        ).alias("decayed_value"),
    )


def decayed_engagement_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decayed_engagement(load_table(spark, sf_dir, "events"))


ORACLE_DECAYED_ENGAGEMENT = """
    WITH ref AS (SELECT max(ts) AS ref_ts FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(
               value * power(0.5, floor((epoch_us(ref_ts) // 1000000
                                         - epoch_us(ts) // 1000000)
                                        / 86400.0))
               * 1e9) AS BIGINT)) AS BIGINT) / 1e9 AS decayed_value
    FROM events CROSS JOIN ref
    GROUP BY user_id
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort-retention matrix: users are grouped by the ISO week of
    their FIRST event (the cohort), and every later event is bucketed by
    whole weeks elapsed since that first day — the classic activation/
    retention triangle a training-data telemetry pipeline reports on.

    Reference analogue: the reference only has per-interval accuracy
    aggregation (``CaffeOnSpark.scala:396-418``); cohorting is part of the
    mandated LLM-pipeline observability surface.

    Plan shape: one full-data shuffle — the per-user ``min(day)`` is a
    window aggregate over the user_id partition (no groupBy+join back, no
    broadcast of a per-user table: at 100 TB the user dimension is itself
    billions of rows, so anything that materializes "all users" on the
    driver or as a broadcast is wrong). The final (cohort_week,
    week_offset) aggregation adds a second exchange, but the COUNT
    DISTINCT partial-dedups map-side first — and because the input is
    already user_id-partitioned from the window shuffle, every row for a
    user sits in one task, so what moves is exactly one row per (cohort,
    offset, user): the event volume never shuffles twice. Week arithmetic
    is integer-exact
    (datediff div 7, always non-negative since first_d is the partition
    minimum). All calendar
    math stays in TIMESTAMP_NTZ (``ts`` is NTZ): a DATE→TIMESTAMP cast
    would re-interpret midnight in the session timezone and break the
    hostile-TZ plain-session invariant.
    """
    w = Window.partitionBy("user_id")
    ev = events.select("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
    ev = ev.withColumn("first_d", F.min("d").over(w))
    return (
        ev.select(
            F.date_trunc("week", F.col("first_d")).alias("cohort_week"),
            F.expr("datediff(d, first_d) div 7").cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def cohort_retention_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_retention(load_table(spark, sf_dir, "events"))


ORACLE_COHORT_RETENTION = """
    WITH ev AS (SELECT user_id, date_trunc('day', ts) AS d FROM events),
    f AS (SELECT user_id, d,
                 MIN(d) OVER (PARTITION BY user_id) AS first_d
          FROM ev)
    SELECT CAST(date_trunc('week', first_d) AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('day', CAST(first_d AS DATE), CAST(d AS DATE)) // 7
                AS INT) AS week_offset,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM f
    GROUP BY cohort_week, week_offset
"""


def gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type rollup with GAP FILLING and LOCF interpolation — the
    hypertable ``time_bucket_gapfill`` / ``locf`` class the reference's
    rollup family feeds (continuous-aggregate consumers expect a dense
    hour grid, not only observed buckets).

    Shape: the event volume is scanned ONCE and shuffles ONCE, into the
    (event_type, hour) hash agg (map-side partials collapse everything
    early). Gap rows are then derived FROM the rollup itself — each
    observed bucket looks back at its predecessor (``lag`` over the
    event_type/hour window) and emits the missing hours between them via
    ``sequence`` + ``explode`` — so there is no separate grid branch, no
    second events subtree for AQE to fail to reuse, and no grid⋈rollup
    join at all. Everything after the agg runs over the ROLLUP —
    calendar-span × type sized, independent of event volume — so gap
    filling is metadata-priced at 100 TB. The LOCF window partitions by
    event_type; its input is hours-per-type (≈9k rows/type/year), so the
    coarse key is not a skew risk. (The first form of this operator built
    a min/max grid and left-joined the rollup back; the two branches'
    column-pruned subtrees differed, so the events scan+shuffle ran twice
    — the round-8 ADVICE finding this rewrite closes.)

    Emits the observed ``sum_value`` (NULL in gaps) AND the carried-forward
    ``filled_value``. LOCF carries the last NON-NULL observed sum: a gap
    hour gets its predecessor's carry, and an observed bucket whose values
    are all NULL (``n_events`` > 0, ``sum_value`` NULL) is ALSO carried
    across — the carry is keyed on sum_value nullity, not on emptiness, so
    consumers see one uninterrupted last-known-value series.
    """
    return gapfill_hourly_events(load_table(spark, sf_dir, "events"))


def gapfill_hourly_events(ev: DataFrame) -> DataFrame:
    """DataFrame core of :func:`gapfill_hourly` (see its docstring for the
    single-scan / rollup-sized-gapfill design rationale)."""
    from caffeonspark_spark.functions.arrays import dsum

    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour"), "value"
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
    )
    w_ord = Window.partitionBy("event_type").orderBy("hour")
    one_h = F.expr("INTERVAL 1 HOUR")
    h = hourly.select(
        "event_type",
        "hour",
        "n_events",
        "sum_value",
        F.lag("hour").over(w_ord).alias("prev_hour"),
        # LOCF value AT this bucket (last non-null sum up to and incl. here)
        F.last("sum_value", ignorenulls=True)
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("filled_value"),
        # LOCF value BEFORE this bucket — what the gap hours preceding this
        # bucket carry (the predecessor's filled_value, without a nested
        # window-over-window)
        F.last("sum_value", ignorenulls=True)
        .over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_filled"),
    )
    gap_hours = F.when(
        F.col("prev_hour").isNotNull() & (F.col("hour") > F.col("prev_hour") + one_h),
        F.sequence(F.col("prev_hour") + one_h, F.col("hour") - one_h, one_h),
    ).otherwise(F.array().cast("array<timestamp_ntz>"))
    entries = F.concat(
        F.transform(
            gap_hours,
            lambda g: F.struct(
                g.alias("hour"),
                F.lit(0).cast("bigint").alias("n_events"),
                F.lit(None).cast("double").alias("sum_value"),
                F.col("prev_filled").alias("filled_value"),
            ),
        ),
        F.array(
            F.struct(
                F.col("hour"),
                F.col("n_events"),
                F.col("sum_value"),
                F.col("filled_value"),
            )
        ),
    )
    return h.select("event_type", F.explode(entries).alias("e")).select(
        "event_type",
        F.col("e.hour").alias("hour"),
        F.col("e.n_events").alias("n_events"),
        F.col("e.sum_value").alias("sum_value"),
        F.col("e.filled_value").alias("filled_value"),
    )


ORACLE_GAPFILL_HOURLY = """
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT event_type,
               UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
              FROM hourly GROUP BY event_type)
    )
    SELECT g.event_type, g.hour,
           COALESCE(h.n_events, 0) AS n_events,
           h.sum_value AS sum_value,
           last_value(h.sum_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN hourly h USING (event_type, hour)
"""


def event_sequence_examples(
    events: DataFrame, context_len: int = 3
) -> DataFrame:
    """Next-event-prediction training examples from per-user event streams:
    for every event with ≥ ``context_len`` predecessors, emit the previous
    ``context_len`` event types (oldest-first, '|'-joined) as the context
    and the current type as the target — the sequence-dataset construction
    step a behavioral LM / recommender trains on.

    The context is emitted as ONE delimited string, not an array: the
    training consumer tokenizes it anyway, and a scalar column keeps the
    result a plain relational table (driver-canonicalizable, exactly
    oracle-comparable — the batch_assembly list-cell lesson).

    Scale contract: ONE shuffle (user_id), one window sort; lag() is O(1)
    per row with no frame accumulation, so the whole op is linear in events
    and parallel across users. Ties at identical ts break on event_id so
    both engines emit one deterministic sequence per user.
    """
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    lags = [
        F.lag("event_type", i).over(w) for i in range(context_len, 0, -1)
    ]
    return (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.concat_ws("|", *lags).alias("context"),
            F.col("event_type").alias("target"),
            F.row_number().over(w).alias("_rn"),
        )
        .where(F.col("_rn") > context_len)
        .drop("_rn")
    )


def event_sequence_examples_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: 3-gram next-event examples over the events table."""
    return event_sequence_examples(load_table(spark, sf_dir, "events"))


ORACLE_EVENT_SEQUENCE = """
    SELECT user_id, event_id, ts,
           c3 || '|' || c2 || '|' || c1 AS context,
           event_type AS target
    FROM (
        SELECT user_id, event_id, ts, event_type,
               LAG(event_type, 3) OVER w AS c3,
               LAG(event_type, 2) OVER w AS c2,
               LAG(event_type, 1) OVER w AS c1,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE rn > 3
"""


def _zscore_guarded_value() -> "F.Column":
    """The z-score tripwire's own tripwire: |value| >= 1e12 would overflow
    the exact decimal(18,6) frame sums (the square needs 2*18+1 = 37 of
    Spark's 38 digits) and — under Spark's default non-ANSI casts —
    silently NULL the hottest rows out of the anomaly set. A data-quality
    monitor must never silently drop the rows it exists to flag, so the
    cast is guarded: out-of-range values RAISE with a pre-scaling hint
    instead (``assert_true`` stays NULL — and the ``when`` yields the raw
    value — for every in-range row, so in-range results are bit-identical
    to the unguarded form; NULL values pass through like before).

    NaN/Infinity raise too (they also decimal-cast to NULL), but with
    their OWN message: the pre-scaling hint cannot repair a non-finite
    sentinel — it needs upstream cleaning — and a misleading remediation
    hint in a monitor's crash line costs an operator real time."""
    v = F.col("value")
    nonfinite = F.isnan(v) | (F.abs(v) == F.lit(float("inf")))
    in_range = v.isNull() | (~nonfinite & (F.abs(v) < F.lit(1e12)))
    got = F.coalesce(v.cast("string"), F.lit("NULL"))
    msg = F.when(
        nonfinite,
        F.concat(
            F.lit(
                "rolling_zscore_anomaly: non-finite value (NaN/Infinity) "
                "cannot be z-scored; drop or repair the metric upstream "
                "— got "
            ),
            got,
        ),
    ).otherwise(
        F.concat(
            F.lit(
                "rolling_zscore_anomaly: |value| >= 1e12 overflows the exact "
                "decimal frame sums; pre-scale (e.g. log-transform) the metric "
                "— got "
            ),
            got,
        )
    )
    return F.when(F.assert_true(in_range, msg).isNull(), v)


def rolling_zscore_anomaly(
    events: DataFrame, n: int = 24, threshold: float = 2.0
) -> DataFrame:
    """Trailing-window anomaly detection: per event type (ordered by ts),
    flag events whose value deviates from the trailing-``n``-event mean by
    more than ``threshold`` sample standard deviations — the data-quality
    tripwire a streaming ingest pipeline runs before training data lands.

    Determinism: the two frame sums (Σv, Σv²) accumulate in DECIMAL — exact
    integer arithmetic, identical in any engine and any order — and only
    then convert to double for the variance/sqrt/ratio, a fixed IEEE
    expression tree both engines evaluate identically. Nothing here depends
    on float summation order, so the anomaly SET (a float comparison!)
    oracle-checks exactly.

    Supported value range: |value| < 10^12. The exact arithmetic squares a
    decimal(18,6) — the widest precision whose product (2·18+1 = 37 digits)
    still fits Spark's 38-digit decimal without scale truncation. Values at
    or beyond 1e12 RAISE (``_zscore_guarded_value``) instead of silently
    NULLing out of the anomaly set (r12 — previously a documented silent
    exclusion); pre-scale such metrics (e.g. log-transform), which is
    standard practice for magnitude-unbounded counters anyway.

    Scale contract: ONE shuffle (event_type — a handful of coarse keys, but
    the windows are per-type linear scans, so a hot type costs one task's
    linear pass, not a quadratic; for truly skewed type cardinality,
    pre-partition by (event_type, calendar bucket) upstream). Both windows
    share one partitioning + ordering, so Catalyst plans a single
    Exchange + Sort (plan-pinned).
    """
    if n < 2:
        raise ValueError("rolling z-score needs n >= 2 (sample stddev divides by n-1)")
    w = Window.partitionBy("event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    wf = w.rowsBetween(-(n - 1), 0)
    vdec = _zscore_guarded_value().cast("decimal(18,6)")
    nn = float(n)
    framed = events.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.sum(vdec).over(wf).cast("double").alias("_s1"),
        F.sum(vdec * vdec).over(wf).cast("double").alias("_s2"),
        F.row_number().over(w).alias("_rn"),
    ).where(F.col("_rn") >= n)
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.lit(nn)) / F.lit(nn - 1.0)
    z = (F.col("value") - F.col("_s1") / F.lit(nn)) / F.sqrt(var)
    return (
        framed.where(var > 0)
        .select("event_id", "ts", "event_type", "value", z.alias("zscore"))
        .where(F.abs(F.col("zscore")) > threshold)
    )


def rolling_zscore_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: |z| > 2 anomalies over a trailing 24-event window."""
    return rolling_zscore_anomaly(load_table(spark, sf_dir, "events"))


ORACLE_ROLLING_ZSCORE = """
    WITH f AS (
        SELECT event_id, ts, event_type, value,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER wf AS DOUBLE) AS s1,
               CAST(SUM(CAST(value AS DECIMAL(18,6))
                        * CAST(value AS DECIMAL(18,6))) OVER wf AS DOUBLE) AS s2,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
        WINDOW wf AS (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, ts, event_type, value,
           (value - s1 / 24.0) / sqrt((s2 - s1 * s1 / 24.0) / 23.0) AS zscore
    FROM f
    WHERE rn >= 24
      AND (s2 - s1 * s1 / 24.0) / 23.0 > 0
      AND abs((value - s1 / 24.0) / sqrt((s2 - s1 * s1 / 24.0) / 23.0)) > 2.0
"""


def rolling_zscore_anomaly_bucketized(
    events: DataFrame, n: int = 24, threshold: float = 2.0, bucket: str = "day"
) -> DataFrame:
    """The SCALE twin of ``rolling_zscore_anomaly``: BIT-EQUAL results
    (same oracle), but the trailing window partitions by
    ``(event_type, calendar bucket)`` instead of ``event_type`` alone —
    the ``interval_overlap`` → ``interval_overlap_bucketized`` precedent
    applied to the board's one single-task-per-key plan (a handful of
    event types means the coarse form sorts one type's entire history in
    one task at 100 TB; here a hot type splits across its calendar).

    Bit-equality construction: each bucket's window also needs the type's
    last ``n-1`` GLOBAL predecessors of its first row, which may span
    several earlier buckets when buckets are sparse. A metadata-sized
    per-bucket count table (|types| × |buckets| rows) finds, for every
    destination bucket, the minimal set of earlier source buckets whose
    rows can fall inside a frame — src qualifies iff fewer than ``n-1``
    rows lie strictly between it and the destination
    (``src.cum > dst.cum_before - (n-1)``); every counted bucket holds at
    least one row, so qualifying destinations lie within the ``n-1``
    buckets after src and a bounded following window derives the map in
    O(|buckets| · n) — no quadratic self-join even at minute granularity
    over multi-year history. Each source
    bucket contributes at most its trailing ``n-1`` rows (a per-bucket
    window, never a per-type one). Carried rows sort into their global
    (ts, event_id) position inside the destination partition, so the
    rows-based frame picks EXACTLY the same ``n`` rows as the coarse
    form; over-carried rows fall outside the frame harmlessly, and the
    coarse form's ``row_number >= n`` filter becomes ``count over frame
    == n`` (a frame fills iff all n-1 true predecessors exist and were
    carried). The decimal frame sums are order-independent exact
    integers and the z expression is the same fixed IEEE tree, so the
    emitted set hashes identically to the coarse form and the oracle.

    Scale contract: ONE main event scan feeding two event-sized shuffles
    (the per-bucket tail-rank window and the final frame window, both
    keyed ``(event_type, bucket)`` — fine-grained, no single-task key),
    one column-pruned metadata agg consumed exactly once (the bounded
    horizon window), and one broadcast join of that metadata; carry
    volume is ≤ (n-1) rows per qualifying (src, dst) bucket pair. The 8×
    scaling study records the ratio vs the coarse form (SCALE.md)."""
    if n < 2:
        raise ValueError("rolling z-score needs n >= 2 (sample stddev divides by n-1)")
    k = n - 1
    ev = events.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.date_trunc(bucket, F.col("ts")).alias("_bkt"),
    )

    # metadata-sized per-bucket counts + running total per type: the ONLY
    # per-type-ordered window in the plan runs over |types| × |buckets|
    # rows, not events
    wc = Window.partitionBy("event_type").orderBy("_bkt")
    counts = (
        ev.groupBy("event_type", "_bkt")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select("event_type", "_bkt", "_cnt", F.sum("_cnt").over(wc).alias("_cum"))
    )
    # src bucket -> list of destination buckets needing its tail. A dst
    # bucket's first row (global rank _before + 1) frames back to rank
    # _before + 1 - k; src bucket rows end at rank _scum, so src
    # contributes iff _scum > _before - k (and precedes dst). Derived with
    # a BOUNDED following window instead of the former range self-join:
    # every counted bucket holds >= 1 row, so a qualifying dst (fewer than
    # k rows strictly between it and src) lies at most k positions after
    # src — collect the next k buckets' (_bkt, _before) structs and keep
    # those with _before < _cum + k. Same pair set, O(|buckets| * k) work;
    # the self-join's broadcast hash key was event_type alone, leaving
    # per-type O(|buckets|^2) residual comparisons (quadratic for minute
    # buckets over multi-year history), and its persisted counts table is
    # no longer needed at all — counts now has exactly one consumer.
    wnext = wc.rowsBetween(1, k)
    dstmap = (
        counts.select(
            "event_type",
            "_bkt",
            "_cum",
            F.collect_list(
                F.struct(
                    F.col("_bkt").alias("d"),
                    (F.col("_cum") - F.col("_cnt")).alias("b"),
                )
            )
            .over(wnext)
            .alias("_nxt"),
        )
        .select(
            "event_type",
            "_bkt",
            F.transform(
                F.filter(
                    F.col("_nxt"),
                    lambda s: s["b"] < F.col("_cum") + F.lit(k),
                ),
                lambda s: s["d"],
            ).alias("_dsts"),
        )
        .where(F.size("_dsts") > 0)
    )

    # single main pass: rank each row within its bucket from the END
    # (per-BUCKET window — fine-grained), then explode every row into its
    # own bucket (carry=0) plus, for the trailing k rows, one carried copy
    # per destination bucket from the broadcast map. Carried copies sort
    # strictly before own rows in the destination (their ts truncates to
    # an earlier bucket), landing in their global (ts, event_id) position,
    # so the rows frame sees exactly the same n rows as the coarse form.
    wrev = Window.partitionBy("event_type", "_bkt").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    copies = F.when(
        F.col("_rev") <= k, F.coalesce(F.col("_dsts"), F.array())
    ).otherwise(F.array())
    allrows = (
        ev.withColumn("_rev", F.row_number().over(wrev))
        .join(F.broadcast(dstmap), ["event_type", "_bkt"], "left")
        .select(
            "event_id",
            "ts",
            "event_type",
            "value",
            F.explode(
                F.concat(
                    F.array(
                        F.struct(
                            F.col("_bkt").alias("b"), F.lit(0).alias("c")
                        )
                    ),
                    F.transform(
                        copies,
                        lambda d: F.struct(d.alias("b"), F.lit(1).alias("c")),
                    ),
                )
            ).alias("_x"),
        )
        .select(
            "event_id",
            "ts",
            "event_type",
            "value",
            F.col("_x.b").alias("_bkt"),
            F.col("_x.c").alias("_carry"),
        )
    )
    w = Window.partitionBy("event_type", "_bkt").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    wf = w.rowsBetween(-k, 0)
    vdec = _zscore_guarded_value().cast("decimal(18,6)")
    nn = float(n)
    framed = allrows.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        "_carry",
        F.sum(vdec).over(wf).cast("double").alias("_s1"),
        F.sum(vdec * vdec).over(wf).cast("double").alias("_s2"),
        F.count(F.lit(1)).over(wf).alias("_cnt"),
    ).where((F.col("_carry") == 0) & (F.col("_cnt") == n))
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.lit(nn)) / F.lit(nn - 1.0)
    z = (F.col("value") - F.col("_s1") / F.lit(nn)) / F.sqrt(var)
    return (
        framed.where(var > 0)
        .select("event_id", "ts", "event_type", "value", z.alias("zscore"))
        .where(F.abs(F.col("zscore")) > threshold)
    )


def rolling_zscore_bucketized_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Declared query: the calendar-bucketized scale twin — same oracle as
    ``zscore_anomaly`` (bit-equal contract)."""
    return rolling_zscore_anomaly_bucketized(load_table(spark, sf_dir, "events"))
