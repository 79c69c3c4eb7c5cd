#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is measured with the noop sink (full plan runs, nothing collected)
so the number reflects engine throughput, not driver-side result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from caffeonspark_spark.engine import Config, get_spark  # noqa: E402
from caffeonspark_spark.operators import bpe as BPE  # noqa: E402
from caffeonspark_spark.operators import dedup as D  # noqa: E402
from caffeonspark_spark.operators import relational as R  # noqa: E402
from caffeonspark_spark.operators import sampling as SA  # noqa: E402
from caffeonspark_spark.operators import similarity as S  # noqa: E402
from caffeonspark_spark.operators import temporal as TP  # noqa: E402
from caffeonspark_spark.operators import textops as TX  # noqa: E402
from caffeonspark_spark.operators import vectorops as V  # noqa: E402

from caffeonspark_spark import catalog as C  # noqa: E402
from caffeonspark_spark.streaming import windows as SW  # noqa: E402
from caffeonspark_spark.ml import dataflow as ML  # noqa: E402
from caffeonspark_spark.multimodal import av as AV  # noqa: E402
from caffeonspark_spark.multimodal import imagehash as IH  # noqa: E402
from caffeonspark_spark.sources import lmdb as LM  # noqa: E402
from caffeonspark_spark.sources import seqfile as SEQ  # noqa: E402


def _train_epoch_bench(spark, sf_dir):
    """One softmax-regression epoch over the embeddings table (the M1 train
    verb): mapInArrow batch assembly + NumPy trainer steps + per-partition
    state reduce. Returns a 1-row summary DataFrame; the epoch itself runs
    eagerly inside, so the bench timer captures the full wave."""
    emb = C.load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cfg = ML.TrainConfig(batch_size=64, max_iter=max(1, n // 64))
    state = ML.train(
        emb,
        ML.softmax_trainer(dim=64, n_classes=10, lr=1.0),
        ML.EMBED_SPECS,
        cfg,
        id_col="vec_id",
    )
    return spark.createDataFrame(
        [(int(state["iterations"]), float(state.get("loss", 0.0)))],
        "iterations long, loss double",
    )


_STREAM_SEQ = iter(range(10**6))


def _stream_tumbling_bench(spark, sf_dir):
    """Drive the watermarked tumbling-window aggregation over the events
    table through the Structured Streaming file source to completion
    (processAllAvailable), so the bench timer captures end-to-end stream
    throughput — micro-batch planning, state store updates, and append-mode
    finalization — not just a batch plan."""
    from caffeonspark_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        tumbling_counts,
    )

    prev = getattr(_stream_tumbling_bench, "_last", None)
    if prev:
        # memory-sink tables hold the whole result in driver memory; the
        # best-of-N loop must not accumulate one copy per timed run (the
        # same rule windows._run_parity enforces for the parity queries)
        try:
            spark.catalog.dropTempView(prev)
        except Exception:
            pass
    name = run_to_memory(
        tumbling_counts(read_events_stream(spark, sf_dir)),
        f"bench_tumbling_{next(_STREAM_SEQ)}",
    )
    _stream_tumbling_bench._last = name
    return spark.table(name)


# headline suite: the BASELINE.md classes + the LLM-pipeline extensions
BENCH_QUERIES = {
    "q1_pricing_summary": R.pricing_summary,
    "q_scan_filter_project": R.scan_filter_project,
    "q_inner_join": R.inner_equi_join,
    "q_broadcast_dim_join": R.broadcast_dim_join,
    "q_multiway_join": R.multiway_join,
    "q_topk": R.topk_orderby_limit,
    "q_window_rownum": R.row_numbering,
    "q_events_hourly": R.events_hourly,
    "q_vector_mean": V.vector_mean_embeddings,
    "q_cosine_topk": S.cosine_topk_query0,
    "q_minhash_lsh": D.minhash_lsh_pairs,
    "q_text_quality": TX.doc_quality,
    "q_asof_join": TP.asof_join_query,
    "q_sessionize": TP.sessionize_query,
    "q_ann_lsh": S.ann_lsh_topk_query0,
    "q_tfidf": TX.tfidf_topk,
    "q_ann_ivf": S.ann_ivf_topk_query0,
    "q_bpe_tokens": TX.bpe_token_stats,
    "q_time_rollup": TP.time_rollup,
    "q_clean_corpus": D.clean_corpus,
    "q3_shipping_priority": R.shipping_priority,
    "q18_large_volume": R.large_volume_customers,
    "q_decontaminate": D.decontaminate,
    # r2 additions: clean_corpus stages individually + packing/ranking ops
    "q_quality_filter": TX.quality_filter,
    "q_dedup_exact": D.dedup_exact_docs,
    "q_dedup_fingerprint": D.dedup_fingerprint_docs,
    "q_bm25": TX.bm25_rank,
    "q_pack_documents": TX.pack_documents,
    "q_repetition_stats": TX.repetition_stats,
    "q_ngram_jaccard_pruned": D.ngram_jaccard_pruned,
    # r2 dataset-composition additions
    "q_kmeans_assign": S.kmeans_assign_query,
    "q_dup_ngram_stats": D.dup_ngram_stats_docs,
    "q_source_quota": SA.source_quota_docs,
    "q_split_assign": SA.split_assign_docs,
    "q_minhash_signatures": D.minhash_signatures_portable_query,
    "q_clean_corpus_portable": D.clean_corpus_portable,
    "q_kmeans_fit": S.kmeans_fit_query,
    "q_semantic_dedup": S.semantic_dedup_query,
    # r5 addition: incremental cross-corpus dedup (bipartite banded LSH)
    "q_dedup_against_corpus": D.dedup_against_corpus_query,
    # r5 additions: heaviest of the newly added TPC-H classics — the
    # co-nation 6-way join and the double exists/not-exists shape
    "q5_local_supplier": R.local_supplier_volume,
    "q21_waiting_suppliers": R.waiting_suppliers,
    # r5 additions: the M1/M3 ML verbs — guards the Arrow batch path
    # (mapInArrow assembly + trainer feed) against per-row regressions
    "q_features": ML.features_identity_query,
    "q_train_epoch": _train_epoch_bench,
    # r5 additions: LM corpus-fit scoring (3 corpus scans by design),
    # keep-best dedup canonicalization, and the iterative BPE trainer
    "q_ngram_lm_score": TX.ngram_lm_score,
    "q_keep_best_duplicate": D.keep_best_duplicate,
    "q_bpe_train": BPE.bpe_train,
    "q_bpe_encode": BPE.bpe_encode,
    "q_remove_dup_passages": D.remove_dup_passages_docs,
    "q_stream_tumbling": _stream_tumbling_bench,
    # r6 additions: the remaining TPC-H classic shapes (Q2 correlated min,
    # Q9 profit rollup, Q11 global-threshold HAVING, Q16 distinct counts,
    # Q20 correlated half-sum), the large-k Arrow centroid assignment, and
    # the heaviest accuracy twin (exact-beside-sketch heavy hitters)
    "q2_min_cost_supplier": R.min_cost_supplier,
    "q9_product_profit": R.product_type_profit,
    "q11_important_stock": R.important_stock,
    "q16_parts_supplier": R.parts_supplier_counts,
    "q20_promotion": R.promotion_candidates,
    "q_heavy_hitter_check": TX.heavy_hitter_check,
    "q_neardup_clusters": D.neardup_clusters,
    # r6 late additions: streaming-batch parity trio (full stream-to-
    # completion runs), incremental partial-agg merge, interval-overlap
    # range join, hybrid RRF retrieval, forward as-of join
    "q_stream_parity_tumbling": SW.stream_tumbling_parity,
    "q_stream_parity_sliding": SW.stream_sliding_parity,
    "q_stream_parity_session": SW.stream_session_parity,
    "q_incremental_rollup": R.incremental_rollup_merge,
    "q_interval_overlap": TP.interval_overlap_sessions,
    # r7: the scale twin — hour-bucket equi-join, no broadcast range probe
    "q_interval_overlap_bucketized": TP.interval_overlap_bucketized,
    # r7: winnowing positional fingerprints + df-pruned overlap join
    "q_winnow_fingerprints": D.winnow_fingerprints_docs,
    "q_winnow_overlap_pairs": D.winnow_overlap_pairs,
    "q_rrf_fusion": TX.rrf_fusion,
    "q_asof_forward": TP.asof_join_forward_query,
    # r7: stream-stream join parity, funnel/decay analytics, corpus-drift
    # KL, content-defined chunking, near-dup-graph PageRank
    "q_stream_parity_join": SW.stream_join_parity,
    "q_funnel_conversion": TP.funnel_conversion_query,
    "q_decayed_engagement": TP.decayed_engagement_query,
    "q_source_kl": TX.source_kl_divergence,
    "q_cdc_chunk": TX.cdc_chunk_documents,
    "q_cdc_dup_chunks": TX.cdc_dup_chunks,
    "q_neardup_pagerank": D.neardup_pagerank,
    "q_stream_parity_stateful": SW.stream_stateful_parity,
    # r7: cohort-retention triangle + exact cosine radius search + Gram
    "q_cohort_retention": TP.cohort_retention_query,
    "q_cosine_range": S.cosine_range_query,
    "q_embedding_gram": V.embedding_gram,
    "q_edit_distance_pairs": D.edit_distance_dup_pairs_docs,
    # r9: hourly gapfill + LOCF (single event scan; rollup-derived gaps)
    "q_gapfill_hourly": TP.gapfill_hourly,
    # r9: KMV cross-source overlap (portable sketch, WindowGroupLimit build)
    "q_kmv_overlap": SA.kmv_source_overlap,
    # r9: the xxhash64 production form (one JVM hash call per row)
    "q_kmv_overlap_native": SA.kmv_source_overlap_native,
    # r9: per-group top-k (map-side partial WindowGroupLimit)
    "q_topk_per_group": R.topk_per_group,
    # r10: contrastive-triplet mining (broadcast anchors, rank-1 limit)
    "q_hard_negatives": S.hard_negative_mining_query,
    # r10: next-event sequence examples (one user_id shuffle, lag window)
    "q_event_sequences": TP.event_sequence_examples_query,
    # r10: trailing z-score anomalies (single fused Window)
    "q_zscore_anomaly": TP.rolling_zscore_query,
    # r11: its calendar-bucketized scale twin (fine-keyed windows + carry)
    "q_zscore_bucketized": TP.rolling_zscore_bucketized_query,
    # r11: perceptual image dedup — portable banding/Hamming plumbing, and
    # the production decode path (PGM render -> from-spec decode -> dHash)
    "q_image_dhash": IH.image_dhash_pairs_portable,
    "q_image_dhash_native": IH.image_dhash_pairs_native,
    # r11: audio fingerprint invariance (synth + 2 encodes + 2 fingerprint
    # passes over the full decode -> log-mel path)
    "q_audio_fingerprint": AV.audio_fingerprint_invariance,
    # r11: image near-dup clusters + the cross-source duplication matrix
    "q_image_dhash_clusters": IH.image_dhash_clusters,
    "q_dup_source_matrix": D.dup_source_matrix,
    # r12: video near-dup — portable position-keyed banding, and the
    # production clip path (raw render -> sampling seam -> dHash -> pairs)
    "q_video_dup": AV.video_dup_pairs_portable,
    "q_video_dup_native": AV.video_dup_pairs_native,
    # r12: composed image dedup (exact pass -> banded survivors ->
    # components -> canonical map)
    "q_image_dedup_map": IH.image_dedup_map_query,
    # r12: clip clusters (components over the video pair set)
    "q_video_dup_clusters": AV.video_dup_clusters,
    # r12: audio near-dup — portable temporal-gradient banding, and the
    # production path (synth -> PCM16 -> decode -> log-mel -> fingerprint
    # -> band pairs); clusters over the portable pair set
    "q_audio_dup": AV.audio_dup_pairs_portable,
    "q_audio_dup_native": AV.audio_dup_pairs_native,
    "q_audio_dup_clusters": AV.audio_dup_clusters,
    # r10: cluster-balanced prototype selection (map-only assign + limit)
    "q_cluster_prototypes": S.cluster_prototypes_query,
    # r13: bipartite batch-vs-corpus image dedup (corpus-capped cross-side
    # band equi-joins over the split portable hash tables)
    "q_image_corpus_dedup": IH.image_dedup_against_corpus_query,
    # r13: composed video dedup map (exact sequence pass -> survivor-only
    # position-keyed banding -> components -> total map)
    "q_video_dedup_map": AV.video_dedup_map_query,
    # r13: composed audio dedup map (image_dedup composition on the
    # portable fingerprint table)
    "q_audio_dedup_map": AV.audio_dedup_map_query,
    # r13: bipartite batch-vs-corpus audio dedup
    "q_audio_corpus_dedup": AV.audio_dedup_against_corpus_query,
    # r13: bipartite batch-vs-corpus video dedup (position-keyed)
    "q_video_corpus_dedup": AV.video_dedup_against_corpus_query,
    # r14: from-spec LMDB scan (leaf-range planned partitions + Datum
    # decode + CHW→HWC) — includes the one-time fixture build on first run
    "q_lmdb_scan": LM.lmdb_scan_agg,
    # r14: planted-family recall+precision through the production xxhash64
    # MinHash-LSH path (Catalyst text synth -> shingle explode -> 64
    # min-aggs -> banded self-join)
    "q_minhash_native_planted": D.minhash_lsh_pairs_planted,
    # r14: key-range pruned LMDB lookup (pushdown plans only in-window
    # leaves) and the streaming-dedup parity run-to-completion
    "q_lmdb_pruned_lookup": LM.lmdb_pruned_lookup,
    # r15: from-spec Hadoop SequenceFile scan (sync-split byte-range
    # partitions + Java-serialization key decode, all 3 key encodings)
    "q_seqfile_scan": SEQ.seqfile_scan_agg,
    # r15: distributed SequenceFile export + read-back (K3 write path)
    # and the column-pruned metadata scan
    "q_seqfile_roundtrip": SEQ.seqfile_roundtrip_agg,
    "q_seqfile_pruned_meta": SEQ.seqfile_pruned_metadata,
    # r16: the from-spec Snappy decode path and the fsio file://-URI
    # (pyarrow RangeBuffer) path over the same content
    "q_seqfile_snappy_scan": SEQ.seqfile_snappy_scan,
    "q_seqfile_uri_scan": SEQ.seqfile_uri_scan,
    "q_stream_parity_dedup": SW.stream_dedup_parity,
    # r15: watermark late-data drop policy run-to-completion (3 phased
    # waves: on-time corpus, late straggler re-sends, sentinel flush)
    "q_stream_parity_late_data": SW.stream_late_data_parity,
    # r14: bipartite SemDeDup (cross-side cluster-local cosine pairs)
    "q_semantic_corpus_dedup": S.semantic_dedup_against_corpus_query,
}


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


_LINE_BUDGET = 1900


#: relative disagreement of the two best runs above which another
#: serialized repeat is taken (see runs_wanted)
NOISE_SPREAD = 0.35
#: hard cap on serialized repeats per row — bounds bench wall time even
#: when the host never settles
MAX_RUNS = 4


def runs_wanted(runs: list[float], want: int) -> int:
    """Noise-adaptive repeat count (r16): once `want` runs are recorded,
    take another iff the two BEST runs still disagree by more than
    NOISE_SPREAD (and the MAX_RUNS cap is not reached). Comparing the two
    best — not min vs max — means a one-time first-run cost (fixture
    build, codegen warm-up) plus two agreeing steady-state runs stops at
    three, while a genuine host-contention burst on either of the first
    two runs buys the row a corroborating repeat. The r16 baseline
    recorded same-code serialized repeats like [5.0, 6.7, 67.0] on this
    host; best-of-N only attributes honestly when N adapts to observed
    spread."""
    if want >= MAX_RUNS or len(runs) < 2:
        return want
    best2 = sorted(runs)[:2]
    if (best2[1] - best2[0]) / max(best2[0], 1e-3) > NOISE_SPREAD:
        return want + 1
    return want


def noise_summary(all_runs: dict[str, list[float]]) -> dict:
    """Compact in-line noise attribution (r16): per-row relative spread
    ``(max-min)/min`` over the serialized repeats, summarized as median /
    p90 / worst row. A high worst-spread row in the SAME artifact that
    shows a drifted best is host noise self-attributed, no re-run
    needed. Full per-row run lists live in bench_last_run.json."""
    spreads = {
        k: (max(rs) - min(rs)) / max(min(rs), 1e-3)
        for k, rs in all_runs.items()
        if rs
    }
    if not spreads:
        return {}
    vals = sorted(spreads.values())
    worst = max(spreads, key=spreads.get)
    return {
        "med": round(vals[len(vals) // 2], 2),
        "p90": round(vals[int(len(vals) * 0.9)], 2),
        "max": round(spreads[worst], 2),
        "max_row": worst[2:] if worst.startswith("q_") else worst,
    }


def _result_line(
    timings: dict[str, float], sf_val, noise: dict | None = None
) -> str:
    """The ONE printed JSON line, guaranteed <= _LINE_BUDGET chars.

    The driver captures only the LAST 2000 chars of stdout and parses the
    final line as JSON; a too-long line prints with its HEAD cut and the
    round's bench artifact records parsed:null (happened at 85 rows in r8
    and again at 92 rows in r11 — the old ladder stopped at decisecond
    rounding, 2,090 chars at 92 rows, still over the window). Degrade
    ladder, every rung keeping "value"/"sf" intact (full 3-decimal data is
    always in bench_last_run.json):

      1. full dict, q_-stripped names, centisecond rounding
      2. ... decisecond rounding
      3. drop the constant "metric"/"unit" keys
      4. keep only the N slowest rows (+ a "dropped" count), shrinking N
         until the line fits — terminates because the rowless line fits.
    """
    total = round(sum(timings.values()), 2)
    short = {(k[2:] if k.startswith("q_") else k): v for k, v in timings.items()}

    def enc(v: float, ndig: int):
        # r17: whole values print as integers ("2" not "2.0") — 2 chars
        # per such row, recovered for extra rows on the truncation rung
        r = round(v, ndig)
        return int(r) if r == int(r) else r

    extra = {"noise": noise} if noise else {}
    for ndig in (2, 1):
        line = json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": {k: enc(v, ndig) for k, v in short.items()},
                "sf": sf_val,
                **extra,
            },
            separators=(",", ":"),
        )
        if len(line) <= _LINE_BUDGET:
            return line
    # r17 (VERDICT r16 item 2): the noise summary is dropped BEFORE any
    # query row is — per-row data is what the driver's round-over-round
    # comparison consumes; the full noise record stays in
    # bench_last_run.json
    line = json.dumps(
        {
            "value": total,
            "queries": {k: enc(v, 1) for k, v in short.items()},
            "sf": sf_val,
        },
        separators=(",", ":"),
    )
    if len(line) <= _LINE_BUDGET:
        return line
    # last rung: keep the N SLOWEST rows + an honest dropped count. r17:
    # N is exact (the old n -= n//8 step overshot by up to 14 rows past
    # the first fitting prefix)
    rows = sorted(short.items(), key=lambda kv: (-kv[1], kv[0]))
    for n in range(len(rows), 0, -1):
        line = json.dumps(
            {
                "value": total,
                "queries": {k: enc(v, 1) for k, v in rows[:n]},
                "sf": sf_val,
                "dropped": len(rows) - n,
            },
            separators=(",", ":"),
        )
        if len(line) <= _LINE_BUDGET:
            return line
    return json.dumps(
        {"value": total, "sf": sf_val, "dropped": len(rows)},
        separators=(",", ":"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = get_spark(Config(master=f"local[{cpus}]", app_name="cos-bench"))

    # warm the JVM + parquet footers once so timings measure steady state
    _run(R.scan_filter_project(spark, sf_dir).limit(1))

    from caffeonspark_spark.operators.dedup import unpersist_cached

    # iterative drivers (N collect/merge rounds) expose many times more
    # wall-clock surface to a host-contention burst than one-shot queries;
    # BENCH_r06 recorded 2-4x one-off inflations on exactly these rows with
    # zero code change (BASELINE.md round-7 attribution). A third timed run
    # bounds a single burst's influence on the recorded minimum.
    _EXTRA_RUN = {"q_kmeans_fit", "q_bpe_train", "q_dedup_against_corpus"}
    # rows with a RECORDED single-sample inflation in a driver artifact
    # (code unchanged, healthy in sibling runs — BASELINE.md r7/r9/r10/r11
    # attributions, four consecutive rounds of this class): a third run
    # stops one burst from becoming the round's recorded number, ending
    # the per-round attribution chore for repeat offenders.
    _EXTRA_RUN |= {
        "q_clean_corpus", "q_time_rollup", "q_bpe_tokens", "q_ann_ivf",  # r8
        "q_clean_corpus_portable", "q3_shipping_priority",  # r10
        "q_minhash_signatures", "q_minhash_lsh",  # r10
        "q_stream_parity_join", "q_train_epoch",  # r10 builder runs
        # r11: the carry-plan's FIRST run pays ~10 s of Catalyst
        # analysis/codegen (measured [11.7, 2.3, 2.0, 2.1] serialized);
        # two runs under-amortize it
        "q_zscore_bucketized",
        # r11 driver artifact: bpe_encode 21.57 s (best-of-three 4.45) and
        # remove_dup_passages 5.87 (best-of-three 4.19) -- recorded
        # repeat-offender inflations, BASELINE.md r11/r12 attributions
        "q_bpe_encode", "q_remove_dup_passages",
        # r13 artifact: q5_local_supplier 3.6 s vs a serialized r14
        # re-measurement of [1.19, 1.33, 1.27, 1.39] best-of-two across 4
        # separate processes with zero code change (BASELINE.md r14
        # attribution) — host variance on a 6-way join's short runtime
        "q5_local_supplier",
    }

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    # r16: the host this bench runs on shares CPUs with other tenants;
    # the r16 baseline recorded multi-second whole-machine stalls (same
    # code, serialized repeats of [5.0, 6.7, 67.0] on one row with an
    # idle-looking guest). When the first two runs of a row disagree by
    # more than this, at least one was hit by a burst — take a third so
    # a single burst cannot become the row's recorded number. This keeps
    # the methodology (noop sink, serialized repeats, min) and only makes
    # the repeat count noise-adaptive; every run is still recorded in
    # bench_last_run.json and summarized on the printed line.
    for name, fn in BENCH_QUERIES.items():
        # two runs, keep the best: the first pays per-query codegen/JVM JIT
        # warm-up and host-VM timing noise (observed 2-3x run-to-run); min
        # of two approximates steady-state engine throughput. Caches are
        # dropped BETWEEN the runs so the second run recomputes data (the
        # dedup module memoizes persisted intermediates by plan — without
        # the release, run 2 of those queries would time warm block reads,
        # not engine compute).
        runs = []
        want = 3 if name in _EXTRA_RUN else 2
        while len(runs) < want:
            t0 = time.perf_counter()
            _run(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            unpersist_cached()
            spark.catalog.clearCache()
            # measurement-hygiene fix (r16, documented in
            # OPTIMIZATION_r16.md): ContextCleaner only cleans released
            # shuffle/broadcast state when the JVM GCs, which a 48g heap
            # may never do across 115 queries — the backlog degraded
            # LATER rows cumulatively (clean_corpus measured 6.4 -> 12.7 s
            # across its own serialized repeats; a forced GC between runs
            # restored and held ~4 s). The GC runs OUTSIDE the timed
            # region; every timed run still computes from parquet with
            # cold caches.
            try:
                spark._jvm.System.gc()
            except Exception:  # pragma: no cover - non-classic backend
                pass
            if len(runs) == want:
                want = runs_wanted(runs, want)
        timings[name] = min(runs)
        all_runs[name] = runs

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # full-precision record for local studies / BASELINE.md attribution —
    # r16: includes EVERY serialized repeat per row ("runs"), so a
    # drifted row in a round's BENCH artifact is attributable from the
    # committed record itself (code identity + in-run spread) instead of
    # via post-hoc re-runs (r15 VERDICT 3)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_last_run.json"), "w") as f:
        json.dump({"metric": "headline_suite_wall_seconds",
                   "value": round(sum(timings.values()), 3), "unit": "sec",
                   "queries": timings, "runs": all_runs, "sf": sf_val},
                  f, indent=1)

    print(_result_line(timings, sf_val, noise_summary(all_runs)))


if __name__ == "__main__":
    main()
