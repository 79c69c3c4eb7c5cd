#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline queries.

Run after any plan-affecting change so the committed plans stay honest:
    python tools_gen_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

# anchor to the repo root, not the caller's cwd: '.' made the import grab
# whatever caffeonspark_spark was reachable from elsewhere and wrote
# PLANS.md into the wrong directory
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from caffeonspark_spark.engine import Config, get_spark
from caffeonspark_spark.operators import dedup as D  # noqa: F401
from caffeonspark_spark.operators import relational as R
from caffeonspark_spark.operators import sampling as SA  # noqa: F401
from caffeonspark_spark.operators import textops as TX  # noqa: F401
from caffeonspark_spark.operators import similarity as S
from caffeonspark_spark.multimodal import av as AV  # noqa: E402
from caffeonspark_spark.multimodal import imagehash as IH  # noqa: E402
from caffeonspark_spark.sources import lmdb as LM  # noqa: E402
from caffeonspark_spark.sources import seqfile as SEQ  # noqa: E402
from caffeonspark_spark.operators import temporal as TP

HEADER = """# PLANS — formatted physical plans of the headline queries

Captured with `.explain("formatted")` at sf0.001 on the engine session
(`local[8]`, AQE on). What to look for, per the 100 TB contract: narrow
`ReadSchema`, populated `PushedFilters`, `BroadcastHashJoin` on every dim
join, partial (`HashAggregate` x2) aggregation around single exchanges, and
`TakeOrderedAndProject` for top-k. Regenerate with
`python tools_gen_plans.py` after plan-affecting changes.
"""

SHOW = {
    "pricing_summary (TPC-H Q1 class)": R.pricing_summary,
    "scan_filter_project": R.scan_filter_project,
    "broadcast_dim_join": R.broadcast_dim_join,
    "multiway_join (5-table, ASIA)": R.multiway_join,
    "topk_orderby_limit": R.topk_orderby_limit,
    "cosine_topk_bruteforce": S.cosine_topk_query0,
    "shipping_priority (TPC-H Q3 class)": R.shipping_priority,
    "large_volume_customers (TPC-H Q18 class)": R.large_volume_customers,
    "decontaminate (benchmark n-gram screen)": D.decontaminate,
    "kmeans_assign (centroid plan literals, map-only argmin)": S.kmeans_assign_query,
    "source_quota_sample (broadcast counts, prefilter before rank)": SA.source_quota_docs,
    "local_supplier_volume (TPC-H Q5 class, co-nation 6-way)": R.local_supplier_volume,
    "waiting_suppliers (TPC-H Q21 class, semi+anti)": R.waiting_suppliers,
    "semantic_dedup (k∝N clusters, float pre-rank + exact re-rank)": S.semantic_dedup_query,
    "ngram_lm_score (vocab-sized count tables re-joined by equi-key)": TX.ngram_lm_score,
    "keep_best_duplicate (fp-partitioned ranking window)": D.keep_best_duplicate,
    "min_cost_supplier (TPC-H Q2 class, window-min decorrelation)": R.min_cost_supplier,
    "important_stock (TPC-H Q11 class, global-scalar HAVING)": R.important_stock,
    "incremental_rollup_merge (mergeable decimal partials)": R.incremental_rollup_merge,
    "interval_overlap_bucketized (hour-bucket equi-join scale twin)": (
        TP.interval_overlap_bucketized
    ),
    "winnow_fingerprints (shuffle-free nested-array winnowing)": (
        D.winnow_fingerprints_docs
    ),
    "funnel_conversion (chained conditional aggs, one user_id exchange)": (
        TP.funnel_conversion_query
    ),
    "decayed_engagement (1-row max-ts broadcast, single hash agg)": (
        TP.decayed_engagement_query
    ),
    "source_kl_divergence (one explode, vocab-sized re-aggs)": (
        TX.source_kl_divergence
    ),
    "cdc_chunk_documents (staged array projections, outer generate)": (
        TX.cdc_chunk_documents
    ),
    "cdc_dup_chunks (chunker + one duplicate-group hash agg)": (
        TX.cdc_dup_chunks
    ),
    "cohort_retention (user_id window min, partial-deduped distinct)": (
        TP.cohort_retention_query
    ),
    "cosine_range_search (broadcast probe BNLJ, tau filter, no shuffle)": (
        S.cosine_range_query
    ),
    "gapfill_hourly (single event scan; gaps derived from the rollup)": (
        TP.gapfill_hourly
    ),
    "edit_distance_dup_pairs (8-char blocking, broadcast hot-block anti)": (
        D.edit_distance_dup_pairs_docs
    ),
    "kmv_source_overlap (WindowGroupLimit sketch build, sketch-sized rest)": (
        SA.kmv_source_overlap
    ),
    "topk_per_group (partial WindowGroupLimit below the exchange)": (
        R.topk_per_group
    ),
    "hard_negatives (broadcast anchors, rank-1 WindowGroupLimit)": (
        S.hard_negative_mining_query
    ),
    "event_sequences (one user_id shuffle, lag window, pruned scan)": (
        TP.event_sequence_examples_query
    ),
    "zscore_anomaly (one exchange, single fused Window for both frames)": (
        TP.rolling_zscore_query
    ),
    "zscore_anomaly_bucketized (fine-keyed windows + broadcast carry map)": (
        TP.rolling_zscore_bucketized_query
    ),
    "image_dhash_pairs (band equi-joins + Hamming filter, cached hash table)": (
        IH.image_dhash_pairs_portable
    ),
    "image_dedup_map (exact full-hash pass -> survivor-only banding -> canonical map)": (
        IH.image_dedup_map_query
    ),
    "image_dedup_against_corpus (bipartite corpus-capped band equi-joins)": (
        IH.image_dedup_against_corpus_query
    ),
    "video_dedup_map (exact sequence pass -> survivor-only banding -> total map)": (
        AV.video_dedup_map_query
    ),
    "audio_dedup_map (image_dedup composition on audio fingerprints)": (
        AV.audio_dedup_map_query
    ),
    "audio_dedup_against_corpus (bipartite corpus-capped band equi-joins)": (
        AV.audio_dedup_against_corpus_query
    ),
    "video_dedup_against_corpus (position-keyed bipartite banding, clip gate)": (
        AV.video_dedup_against_corpus_query
    ),
    "video_dup_pairs (position-keyed band equi-joins, cached frame-hash table, clip gate)": (
        AV.video_dup_pairs_portable
    ),
    "audio_dup_pairs (staged gradient seeds -> band equi-joins, cached fingerprint table)": (
        AV.audio_dup_pairs_portable
    ),
    "dup_source_matrix (banded pairs x two source equi-joins, tiny agg)": (
        D.dup_source_matrix
    ),
    "cluster_prototypes (map-only assign, per-cluster WindowGroupLimit)": (
        S.cluster_prototypes_query
    ),
    "lmdb_scan_agg (leaf-range planned Python source, Arrow checksums, one agg)": (
        LM.lmdb_scan_agg
    ),
    "minhash_lsh_pairs_native (planted families, xxhash64 band equi-join)": (
        D.minhash_lsh_pairs_planted
    ),
    "lmdb_pruned_lookup (key-range planned-partition pruning, global agg)": (
        LM.lmdb_pruned_lookup
    ),
    "seqfile_scan_agg (sync-split byte-range planned source, Arrow checksums)": (
        SEQ.seqfile_scan_agg
    ),
    "seqfile_pruned_metadata (source-pruned scan: 4-column schema, no data bytes)": (
        SEQ.seqfile_pruned_metadata
    ),
    "seqfile_snappy_scan (from-spec Snappy record-compressed scan)": (
        SEQ.seqfile_snappy_scan
    ),
    "seqfile_uri_scan (fsio file:// URI via pyarrow RangeBuffer)": (
        SEQ.seqfile_uri_scan
    ),
    "semantic_dedup_against_corpus (cross-side cluster-local, shared centroid index)": (
        S.semantic_dedup_against_corpus_query
    ),
}


def main() -> None:
    spark = get_spark(Config(master="local[8]", shuffle_partitions=8, app_name="plans"))
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    out = [HEADER]
    for name, fn in SHOW.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf).explain("formatted")
        out.append(f"## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    with open(os.path.join(_HERE, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md regenerated")


if __name__ == "__main__":
    main()
