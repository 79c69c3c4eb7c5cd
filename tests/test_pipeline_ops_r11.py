"""Round-11 pipeline operators: the calendar-bucketized z-score scale twin.

The bucketized form's contract is BIT-EQUALITY with the coarse per-type
window (same oracle) — these tests drive the carry construction through
its edge cases: dense buckets, buckets sparser than the frame (carry
chains spanning many buckets), tie-breaking, and the planted-spike
statistics pin inherited from the coarse form's suite."""

from __future__ import annotations

import datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )


def _day_ts(day: int, minute: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(
        days=day, minutes=minute
    )


def _rows_equal(a, b) -> bool:
    return sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestDupSourceMatrix:
    def test_planted_cross_and_within_source_dups(self, spark):
        """Two exact copies in different sources → one cross-source cell;
        two copies within one source → one diagonal cell; unordered
        keying folds (B, A) into (A, B)."""
        from caffeonspark_spark.operators.dedup import dup_source_matrix_df

        text1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        text2 = "one two three four five six seven eight nine ten eleven"
        text3 = "lorem ipsum dolor sit amet consectetur adipiscing elit sed"
        rows = [
            (1, text1, "en", "srcB", len(text1)),  # cross pair, listed B-first
            (2, text1, "en", "srcA", len(text1)),
            (3, text2, "en", "srcA", len(text2)),  # within-A pair
            (4, text2, "en", "srcA", len(text2)),
            (5, text3, "en", "srcB", len(text3)),  # no duplicate
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        got = {
            (r["source_a"], r["source_b"]): r["n_dup_pairs"]
            for r in dup_source_matrix_df(docs).collect()
        }
        assert got == {("srcA", "srcB"): 1, ("srcA", "srcA"): 1}


class TestRollingZscoreBucketized:
    def test_bit_equal_dense_buckets(self, spark):
        """Several events per day across types: the bucketized form emits
        the IDENTICAL row set (values included) as the coarse form."""
        from caffeonspark_spark.operators.temporal import (
            rolling_zscore_anomaly,
            rolling_zscore_anomaly_bucketized,
        )

        rows = [
            (
                t * 1000 + i,
                _day_ts(i // 6, (i % 6) * 7 + t),
                1,
                f"type{t}",
                float((i * 37 + t * 11) % 23) + (90.0 if i % 41 == 0 else 0.0),
            )
            for t in range(3)
            for i in range(120)
        ]
        ev = _events(spark, rows)
        coarse = rolling_zscore_anomaly(ev)
        fine = rolling_zscore_anomaly_bucketized(ev)
        assert coarse.count() > 0  # the comparison must not be vacuous
        assert _rows_equal(coarse, fine)

    def test_bit_equal_buckets_sparser_than_frame(self, spark):
        """ONE event per day with n=24: every frame spans 24 calendar
        buckets, so the carry horizon must chain through many source
        buckets — the construction's hardest case."""
        from caffeonspark_spark.operators.temporal import (
            rolling_zscore_anomaly,
            rolling_zscore_anomaly_bucketized,
        )

        rows = [
            (i, _day_ts(i), 1, "daily", float((i * 29) % 17) + (80.0 if i == 50 else 0.0))
            for i in range(60)
        ]
        ev = _events(spark, rows)
        coarse = rolling_zscore_anomaly(ev)
        fine = rolling_zscore_anomaly_bucketized(ev)
        assert coarse.count() > 0
        assert _rows_equal(coarse, fine)

    def test_planted_spike_statistics(self, spark):
        """The coarse suite's hand-computed spike z-score, spread across
        days so carries actually happen: flagged ONCE with the exact
        value."""
        from caffeonspark_spark.operators.temporal import (
            rolling_zscore_anomaly_bucketized,
        )

        rows = [
            (i, _day_ts(i // 2, i % 2), 1, "metric", 10.0 if i != 24 else 100.0)
            for i in range(1, 31)
        ]
        out = rolling_zscore_anomaly_bucketized(_events(spark, rows)).collect()
        assert [r["event_id"] for r in out] == [24]
        assert abs(out[0]["zscore"] - (100 - 13.75) / 337.5**0.5) < 1e-9

    def test_short_prefix_never_flagged(self, spark):
        """Partial frames are not statistics — even spread across buckets
        where the frame-count filter (not row_number) enforces it."""
        from caffeonspark_spark.operators.temporal import (
            rolling_zscore_anomaly_bucketized,
        )

        rows = [(i, _day_ts(i), 1, "sparse", 10.0) for i in range(1, 6)] + [
            (6, _day_ts(6), 1, "sparse", 1e6)
        ]
        assert rolling_zscore_anomaly_bucketized(_events(spark, rows)).count() == 0

    def test_finer_buckets_still_bit_equal(self, spark):
        """Hour and minute granularity on the same stream: the result is
        granularity-invariant (pure partitioning choice, zero semantics)."""
        from caffeonspark_spark.operators.temporal import (
            rolling_zscore_anomaly,
            rolling_zscore_anomaly_bucketized,
        )

        rows = [
            (i, _day_ts(i // 24, (i % 24) * 60 + (i % 7)), 1, "m", float((i * 13) % 19))
            for i in range(100)
        ]
        ev = _events(spark, rows)
        coarse = rolling_zscore_anomaly(ev, n=8, threshold=1.0)
        for unit in ("day", "hour", "minute"):
            fine = rolling_zscore_anomaly_bucketized(
                ev, n=8, threshold=1.0, bucket=unit
            )
            assert _rows_equal(coarse, fine), unit
