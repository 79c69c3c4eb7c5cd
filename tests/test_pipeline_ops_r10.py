"""Semantic pins for the round-10 pipeline additions (hard-negative triplet
mining, next-event sequence examples, trailing z-score anomalies) — planted
inputs asserting the PROPERTIES each operator sells, complementing the
value-level oracle sweep in test_oracle_queries."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


class TestHardNegatives:
    def test_planted_triplet(self, spark):
        """The hardest positive is the nearest SAME-label row (self excluded)
        and the hard negative the nearest DIFFERENT-label row — even when
        the negative is geometrically closer than the positive (the case
        triplet losses exist for)."""
        from caffeonspark_spark.operators.similarity import hard_negative_mining

        rows = [
            (0, [1.0, 0.0], 0),  # anchor
            (1, [0.9, 0.1], 0),  # nearest same-label
            (2, [1.0, 0.05], 1),  # different label, closer than vec 1
            (3, [0.0, 1.0], 0),  # far same-label
            (4, [-1.0, 0.0], 1),  # far different-label
        ]
        emb = _emb(spark, rows)
        out = hard_negative_mining(emb, emb.where(F.col("vec_id") == 0)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["anchor_id"] == 0 and r["anchor_label"] == 0
        assert r["positive_id"] == 1
        assert r["negative_id"] == 2
        # the mined negative IS harder than the positive here
        assert r["neg_sim"] > r["pos_sim"]

    def test_self_excluded_but_identical_twin_wins(self, spark):
        """An identical same-label DUPLICATE is a legal hardest positive
        (sim = 1), but the anchor row itself never is; sim ties break to the
        lower vec_id so the row set is deterministic."""
        from caffeonspark_spark.operators.similarity import hard_negative_mining

        rows = [
            (0, [1.0, 0.0], 0),
            (5, [1.0, 0.0], 0),  # identical twin, same label
            (6, [1.0, 0.0], 1),  # identical twin, other label
            (7, [1.0, 0.0], 1),  # tie with 6 -> 6 wins on vec_id
        ]
        emb = _emb(spark, rows)
        r = hard_negative_mining(emb, emb.where(F.col("vec_id") == 0)).collect()[0]
        assert r["positive_id"] == 5 and abs(r["pos_sim"] - 1.0) < 1e-9
        assert r["negative_id"] == 6 and abs(r["neg_sim"] - 1.0) < 1e-9

    def test_missing_class_yields_null(self, spark):
        """An anchor whose label is the ONLY label in the corpus has no
        negative to mine — the triplet row survives with a NULL negative
        (the consumer drops or re-mines), it does not vanish."""
        from caffeonspark_spark.operators.similarity import hard_negative_mining

        rows = [(0, [1.0, 0.0], 0), (1, [0.5, 0.5], 0)]
        emb = _emb(spark, rows)
        r = hard_negative_mining(emb, emb.where(F.col("vec_id") == 0)).collect()[0]
        assert r["positive_id"] == 1
        assert r["negative_id"] is None and r["neg_sim"] is None


class TestEventSequences:
    def test_planted_contexts(self, spark):
        """Contexts are oldest-first, '|'-joined, strictly per-user, and the
        first context_len events of a user emit nothing."""
        from caffeonspark_spark.operators.temporal import event_sequence_examples

        rows = [
            (1, _ts(0), 1, "view", 1.0),
            (2, _ts(1), 1, "click", 1.0),
            (3, _ts(2), 1, "cart", 1.0),
            (4, _ts(3), 1, "purchase", 1.0),
            (5, _ts(4), 1, "view", 1.0),
            # user 2 has exactly context_len events -> no examples
            (6, _ts(0), 2, "view", 1.0),
            (7, _ts(1), 2, "view", 1.0),
            (8, _ts(2), 2, "view", 1.0),
        ]
        out = event_sequence_examples(_events(spark, rows)).collect()
        by_event = {r["event_id"]: r for r in out}
        assert set(by_event) == {4, 5}
        assert by_event[4]["context"] == "view|click|cart"
        assert by_event[4]["target"] == "purchase"
        assert by_event[5]["context"] == "click|cart|purchase"

    def test_ts_tie_breaks_on_event_id(self, spark):
        """Two events at the SAME timestamp order by event_id, so the emitted
        sequence is deterministic (both engines agree — the oracle contract)."""
        from caffeonspark_spark.operators.temporal import event_sequence_examples

        rows = [
            (10, _ts(0), 1, "a", 1.0),
            (12, _ts(1), 1, "c", 1.0),  # same ts as 11, higher id -> second
            (11, _ts(1), 1, "b", 1.0),
            (13, _ts(2), 1, "d", 1.0),
        ]
        out = event_sequence_examples(_events(spark, rows)).collect()
        assert len(out) == 1
        assert out[0]["context"] == "a|b|c" and out[0]["target"] == "d"


class TestRollingZscore:
    def test_planted_spike_flagged_once(self, spark):
        """23 baseline values then one 10x spike: the spike row (the 24th,
        the first full frame) is the ONLY anomaly — trailing rows that still
        contain the spike in their frame are not dragged over the threshold
        by it."""
        from caffeonspark_spark.operators.temporal import rolling_zscore_anomaly

        rows = [
            (i, _ts(i), 1, "metric", 10.0 if i != 24 else 100.0)
            for i in range(1, 31)
        ]
        out = rolling_zscore_anomaly(_events(spark, rows)).collect()
        assert [r["event_id"] for r in out] == [24]
        # z = (100 - 13.75) / sqrt(337.5) computed by hand from the frame
        assert abs(out[0]["zscore"] - (100 - 13.75) / 337.5**0.5) < 1e-9

    def test_constant_series_no_nan_no_rows(self, spark):
        """Zero variance must yield NO rows (guarded), not NaN/Inf z-scores."""
        from caffeonspark_spark.operators.temporal import rolling_zscore_anomaly

        rows = [(i, _ts(i), 1, "metric", 5.0) for i in range(1, 41)]
        assert rolling_zscore_anomaly(_events(spark, rows)).count() == 0

    def test_short_prefix_never_flagged(self, spark):
        """A type with fewer than n events emits nothing, however extreme its
        values — partial frames are not statistics."""
        from caffeonspark_spark.operators.temporal import rolling_zscore_anomaly

        rows = [(i, _ts(i), 1, "sparse", 10.0) for i in range(1, 6)] + [
            (6, _ts(6), 1, "sparse", 1e6)
        ]
        assert rolling_zscore_anomaly(_events(spark, rows)).count() == 0


class TestClusterPrototypes:
    def test_balanced_and_most_central(self, spark):
        """The output is balanced per cluster (per_cluster rows even from a
        skewed cluster) and keeps the MOST CENTRAL vectors; dist2 ties break
        on vec_id."""
        from caffeonspark_spark.operators.similarity import cluster_prototypes

        rows = [
            (0, [0.0, 0.0], 0),  # centroid A
            (1, [10.0, 10.0], 0),  # centroid B
            # cluster A: 4 members at increasing distance (incl. a tie pair)
            (2, [1.0, 0.0], 0),
            (3, [0.0, 1.0], 0),  # tie with 2 -> 2 then 3
            (4, [2.0, 0.0], 0),
            (5, [3.0, 0.0], 0),
            # cluster B: 1 member
            (6, [10.0, 11.0], 0),
        ]
        emb = _emb(spark, rows)
        out = cluster_prototypes(
            emb, emb.where(F.col("vec_id") < 2), per_cluster=3
        ).collect()
        a = sorted(r["vec_id"] for r in out if r["centroid_id"] == 0)
        b = sorted(r["vec_id"] for r in out if r["centroid_id"] == 1)
        # centroid row 0 itself is dist 0 and legitimately most central;
        # the tie pair (2,3) fills the remaining slots, 4/5 are cut
        assert a == [0, 2, 3]
        assert b == [1, 6]
        rk = {r["vec_id"]: r["rk"] for r in out}
        assert rk[2] == 2 and rk[3] == 3  # tie broke on vec_id
