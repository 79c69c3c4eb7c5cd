"""Semantic pins for the round-7 pipeline additions (funnel, decay, CDC
chunking, PageRank) — planted-input tests of the PROPERTIES each operator
sells, complementing the value-level oracle sweep in test_oracle_queries."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


class TestFunnelConversion:
    def test_order_matters(self, spark):
        """A click BEFORE the first view must not count as stage 2 — the
        funnel is ordered, not a per-type existence check."""
        from caffeonspark_spark.operators.temporal import funnel_conversion

        rows = [
            # user 1: click at t0, view at t1 -> depth 1 (click precedes view)
            (1, _ts(0), 1, "click", 1.0),
            (2, _ts(1), 1, "view", 1.0),
            # user 2: proper view -> click -> purchase chain -> depth 3
            (3, _ts(0), 2, "view", 1.0),
            (4, _ts(1), 2, "click", 1.0),
            (5, _ts(2), 2, "purchase", 1.0),
            # user 3: purchase before click (click after view) -> depth 2
            (6, _ts(0), 3, "view", 1.0),
            (7, _ts(1), 3, "purchase", 1.0),
            (8, _ts(2), 3, "click", 1.0),
            # user 4: no view at all -> depth 0
            (9, _ts(0), 4, "purchase", 1.0),
        ]
        got = {
            r["user_id"]: r["funnel_depth"]
            for r in funnel_conversion(_events(spark, rows)).collect()
        }
        assert got == {1: 1, 2: 3, 3: 2, 4: 0}

    def test_same_timestamp_counts_as_after(self, spark):
        """Stage k at the exact timestamp of stage k-1 counts (>=, matching
        the oracle's ts >= predicate)."""
        from caffeonspark_spark.operators.temporal import funnel_conversion

        rows = [
            (1, _ts(5), 1, "view", 1.0),
            (2, _ts(5), 1, "click", 1.0),
            (3, _ts(5), 1, "purchase", 1.0),
        ]
        [r] = funnel_conversion(_events(spark, rows)).collect()
        assert r["funnel_depth"] == 3


class TestDecayedEngagement:
    def test_halving_per_day(self, spark):
        """An event exactly one half-life older contributes half its value."""
        from caffeonspark_spark.operators.temporal import decayed_engagement

        day = datetime.datetime(2024, 1, 2)
        rows = [
            (1, day, 1, "view", 8.0),                            # age 0d -> w=1
            (2, day - datetime.timedelta(days=1), 1, "view", 8.0),   # 1d -> 0.5
            (3, day - datetime.timedelta(days=2), 2, "view", 8.0),   # 2d -> 0.25
        ]
        got = {
            r["user_id"]: r["decayed_value"]
            for r in decayed_engagement(_events(spark, rows)).collect()
        }
        assert got[1] == 8.0 + 4.0
        assert got[2] == 2.0


class TestCdcChunking:
    def _chunks(self, spark, texts):
        from caffeonspark_spark.operators.textops import cdc_chunk_documents

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        import caffeonspark_spark.operators.textops as TX
        import caffeonspark_spark.catalog as cat

        # route load_table to the planted frame for this call
        orig = TX.load_table
        TX.load_table = lambda s, d, n: df
        try:
            return TX.cdc_chunk_documents(spark, "planted").collect()
        finally:
            TX.load_table = orig

    def test_reconstruction(self, spark):
        """Chunks concatenate back to the original text, in order, with
        consistent (start, len) offsets."""
        import random

        rng = random.Random(7)
        text = "".join(rng.choice("abcdefgh ") for _ in range(700))
        rows = sorted(self._chunks(spark, [text]), key=lambda r: r["chunk_idx"])
        assert "".join(r["chunk"] for r in rows) == text
        pos = 0
        for r in rows:
            assert r["chunk_start"] == pos
            assert len(r["chunk"]) == r["chunk_len"] > 0
            pos += r["chunk_len"]

    def test_edit_stability(self, spark):
        """The content-defined property: prepending a character shifts
        early boundaries but the chunk SET re-aligns after the edit —
        most chunks survive byte-identical (a fixed-size chunker would
        shift every downstream chunk)."""
        import random

        rng = random.Random(11)
        text = "".join(rng.choice("abcdefgh ") for _ in range(900))
        edited = "X" + text
        a = {r["chunk"] for r in self._chunks(spark, [text])}
        b = {r["chunk"] for r in self._chunks(spark, [edited])}
        # all but the chunk(s) containing the edit point survive
        assert len(a & b) >= len(a) - 2

    def test_short_doc_single_chunk(self, spark):
        """Docs shorter than the window emit exactly one whole-text chunk."""
        rows = self._chunks(spark, ["abc"])
        assert len(rows) == 1
        assert rows[0]["chunk"] == "abc" and rows[0]["chunk_start"] == 0


class TestPagerank:
    def _pr(self, spark, pairs):
        from caffeonspark_spark.operators.dedup import pagerank

        edges = spark.createDataFrame(pairs, "id_a long, id_b long")
        return {r["node"]: r["pagerank"] for r in pagerank(edges).collect()}

    def test_star_center_ranks_highest(self, spark):
        """In a star graph the hub out-ranks every leaf — the canonical-pick
        property the dedup pipeline uses."""
        got = self._pr(spark, [(0, i) for i in range(1, 6)])
        assert all(got[0] > got[i] for i in range(1, 6))

    def test_mass_conservation(self, spark):
        """Undirected graph, no dangling nodes: total rank stays ~1 (the
        floor grid loses at most 1e-12 per edge per iteration)."""
        got = self._pr(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_symmetry(self, spark):
        """Symmetric positions get identical ranks (path graph ends)."""
        got = self._pr(spark, [(0, 1), (1, 2)])
        assert got[0] == got[2]

    def test_empty_graph(self, spark):
        assert self._pr(spark, []) == {}


class TestCohortRetention:
    def test_triangle_invariants(self, spark):
        """Planted two cohorts: offset-0 counts every cohort member (a
        user's first event is by definition at offset 0), later offsets
        never exceed the cohort size, and event totals are conserved."""
        from caffeonspark_spark.operators.temporal import cohort_retention

        def d(day, hour=0):
            return datetime.datetime(2024, 1, 1 + day, hour)

        rows = [
            # cohort of Mon 2024-01-01 week: users 1,2 (day 0 = Monday)
            (1, d(0), 1, "view", 1.0),
            (2, d(0, 5), 2, "view", 1.0),
            (3, d(8), 1, "view", 1.0),   # user 1 returns in week 1
            (4, d(16), 1, "view", 1.0),  # and week 2
            # cohort of the next week: user 3 (first event day 7)
            (5, d(7), 3, "view", 1.0),
            (6, d(7, 9), 3, "view", 1.0),  # same week -> offset 0
        ]
        out = cohort_retention(_events(spark, rows)).collect()
        by = {(r["cohort_week"].date(), r["week_offset"]): r for r in out}
        w0 = datetime.date(2024, 1, 1)
        w1 = datetime.date(2024, 1, 8)
        assert by[(w0, 0)]["n_users"] == 2
        assert by[(w0, 1)]["n_users"] == 1
        assert by[(w0, 2)]["n_users"] == 1
        assert by[(w1, 0)]["n_users"] == 1
        assert (w1, 1) not in by
        # conservation + triangle shape
        assert sum(r["n_events"] for r in out) == len(rows)
        for (cw, off), r in by.items():
            assert r["n_users"] <= by[(cw, 0)]["n_users"]
            assert off >= 0


class TestCosineRangeSearch:
    def test_matches_topk_above_threshold(self, spark, sf_smoke):
        """Range search at tau must return exactly the brute-force top-k
        pairs whose similarity clears tau (k = corpus size)."""
        from caffeonspark_spark.operators.similarity import (
            cosine_range_search,
            cosine_topk,
        )
        from caffeonspark_spark.catalog import load_table

        emb = load_table(spark, sf_smoke, "embeddings")
        n = emb.count()
        tau = 0.25
        rng = cosine_range_search(
            emb, emb.where(F.col("vec_id") == 0), tau=tau
        ).collect()
        top = cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=n).collect()
        expected = {r["vec_id"]: r["cos_sim"] for r in top if r["cos_sim"] is not None and r["cos_sim"] >= tau}
        got = {r["vec_id"]: r["cos_sim"] for r in rng}
        assert got == expected
        assert all(v >= tau for v in got.values())

    def test_zero_vector_excluded(self, spark):
        """A zero-norm corpus vector has NULL similarity and must fall out
        of the radius set, not crash or rank."""
        from caffeonspark_spark.operators.similarity import cosine_range_search

        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.9, 0.1])],
            "vec_id long, embedding array<float>",
        )
        out = cosine_range_search(df, df.where(F.col("vec_id") == 0), tau=0.1).collect()
        assert {r["vec_id"] for r in out} == {2}


class TestEmbeddingGram:
    def test_gram_arrow_matches_exact(self, spark, sf_smoke):
        """The production Arrow partial-Gram path must agree with the
        exact decimal-grid query to float tolerance (they differ only in
        accumulation order and the bround(9) grid)."""
        import numpy as np

        from caffeonspark_spark.catalog import load_table
        from caffeonspark_spark.operators.vectorops import (
            embedding_gram,
            gram_matrix_arrow,
        )

        exact = embedding_gram(spark, sf_smoke).collect()
        G = gram_matrix_arrow(load_table(spark, sf_smoke, "embeddings"))
        assert G is not None and G.shape[0] == G.shape[1]
        # symmetric by construction
        assert np.allclose(G, G.T)
        for r in exact:
            assert abs(G[r["i"], r["j"]] - r["gram"]) <= 1e-6 * max(1.0, abs(r["gram"]))

    def test_gram_diag_is_norm_squared(self, spark):
        """Diagonal entries are the column-wise sums of squares."""
        from caffeonspark_spark.operators.vectorops import gram_matrix_arrow

        df = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [3.0, 4.0]), (2, None)],
            "vec_id long, embedding array<float>",
        )
        G = gram_matrix_arrow(df)
        assert G[0][0] == 10.0 and G[1][1] == 20.0 and G[0][1] == 14.0

    def test_gram_partial_on_sliced_batch(self):
        """A zero-copy sliced Arrow batch has offsets that do NOT start at
        0 while flatten() re-bases — the partial must index correctly."""
        import numpy as np
        import pyarrow as pa

        from caffeonspark_spark.operators.vectorops import _gram_batch_partial

        arr = pa.array(
            [[9.0, 9.0], [1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float32())
        )
        G = _gram_batch_partial(arr.slice(1, 2))
        X = np.array([[1.0, 2.0], [3.0, 4.0]])
        assert np.allclose(G, X.T @ X)


class TestGapfillHourly:
    """Semantic pins for the hourly gapfill + LOCF operator (round-8
    landing completed round 9): planted gaps, the all-NULL-bucket carry
    contract, and span edges."""

    def _run(self, spark, rows):
        from caffeonspark_spark.operators.temporal import gapfill_hourly_events

        out = gapfill_hourly_events(_events(spark, rows)).collect()
        return {(r["event_type"], r["hour"].hour): r for r in out}, out

    def test_planted_multi_hour_gap(self, spark):
        """Observed hours 0 and 4: hours 1-3 materialize with n_events=0,
        NULL sum_value, and the hour-0 value carried forward; hour 4 shows
        its own value."""

        def h(hour):
            return datetime.datetime(2024, 1, 1, hour)

        rows = [
            (1, h(0), 1, "view", 10.0),
            (2, h(0), 2, "view", 5.0),
            (3, h(4), 1, "view", 7.0),
        ]
        by, out = self._run(spark, rows)
        assert len(out) == 5  # dense grid hours 0..4
        assert by[("view", 0)]["n_events"] == 2
        assert by[("view", 0)]["sum_value"] == 15.0
        for g in (1, 2, 3):
            r = by[("view", g)]
            assert r["n_events"] == 0
            assert r["sum_value"] is None
            assert r["filled_value"] == 15.0  # LOCF from hour 0
        assert by[("view", 4)]["sum_value"] == 7.0
        assert by[("view", 4)]["filled_value"] == 7.0

    def test_locf_carries_across_all_null_observed_bucket(self, spark):
        """An observed bucket whose values are all NULL (n_events>0,
        sum_value NULL) keeps the PREVIOUS carry in filled_value — the
        documented contract: the carry is keyed on sum_value nullity, not
        on bucket emptiness."""

        def h(hour):
            return datetime.datetime(2024, 1, 1, hour)

        rows = [
            (1, h(0), 1, "view", 3.0),
            (2, h(1), 1, "view", None),  # observed, all-NULL values
            (3, h(2), 1, "view", 4.0),
        ]
        by, out = self._run(spark, rows)
        assert by[("view", 1)]["n_events"] == 1
        assert by[("view", 1)]["sum_value"] is None
        assert by[("view", 1)]["filled_value"] == 3.0  # carried across
        assert by[("view", 2)]["filled_value"] == 4.0

    def test_single_hour_span(self, spark):
        """One observed hour per type -> exactly one output row per type,
        no gap rows, filled == observed."""
        rows = [
            (1, datetime.datetime(2024, 1, 1, 9), 1, "view", 2.0),
            (2, datetime.datetime(2024, 3, 5, 17), 2, "click", 8.0),
        ]
        by, out = self._run(spark, rows)
        assert len(out) == 2
        assert by[("view", 9)]["filled_value"] == 2.0
        assert by[("click", 17)]["filled_value"] == 8.0

    def test_multi_gap_locf_updates_between_gaps(self, spark):
        """Two separate gaps: each gap carries the most recent preceding
        observation, not the first one (LOCF re-anchors at every non-null
        bucket)."""

        def h(hour):
            return datetime.datetime(2024, 1, 1, hour)

        rows = [
            (1, h(0), 1, "view", 1.0),
            (2, h(2), 1, "view", 9.0),
            (3, h(5), 1, "view", 4.0),
        ]
        by, out = self._run(spark, rows)
        assert len(out) == 6
        assert by[("view", 1)]["filled_value"] == 1.0
        assert by[("view", 3)]["filled_value"] == 9.0
        assert by[("view", 4)]["filled_value"] == 9.0
        assert by[("view", 5)]["filled_value"] == 4.0

    def test_leading_null_bucket_has_null_fill(self, spark):
        """A NULL-sum bucket with no prior observation keeps filled_value
        NULL — LOCF never invents a value."""
        rows = [
            (1, datetime.datetime(2024, 1, 1, 0), 1, "view", None),
            (2, datetime.datetime(2024, 1, 1, 1), 1, "view", 5.0),
        ]
        by, out = self._run(spark, rows)
        assert by[("view", 0)]["filled_value"] is None
        assert by[("view", 1)]["filled_value"] == 5.0

    def test_types_fill_independently(self, spark):
        """The grid and the carry are per event_type: a gap in one type
        never borrows another type's hours or values."""

        def h(hour):
            return datetime.datetime(2024, 1, 1, hour)

        rows = [
            (1, h(0), 1, "view", 1.0),
            (2, h(3), 1, "view", 2.0),
            (3, h(1), 2, "click", 100.0),
        ]
        by, out = self._run(spark, rows)
        views = [r for r in out if r["event_type"] == "view"]
        clicks = [r for r in out if r["event_type"] == "click"]
        assert len(views) == 4 and len(clicks) == 1
        assert all(r["filled_value"] != 100.0 for r in views)
