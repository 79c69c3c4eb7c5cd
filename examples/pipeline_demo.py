#!/usr/bin/env python
"""End-to-end demo: the LLM-training-data pipeline on the synthetic tables.

Mirrors the reference's examples/ role (notebook flows like DLDemo.ipynb,
MyMLPipeline.scala) for the rebuilt engine:

    corpus -> quality gate -> dedup (exact + MinHash near-dup) ->
    LM corpus-fit filter -> decontaminate vs a held-out set ->
    boilerplate heavy hitters -> cross-corpus dedup of an incoming
    batch -> BPE tokenizer training -> chunk -> shuffle-shard export ->
    (toy) train/validate on embeddings -> similarity lookup

Run:  python examples/pipeline_demo.py [sf_dir]        (default sf0.001)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from caffeonspark_spark.engine import Config, Engine
from caffeonspark_spark.ml.dataflow import (
    TrainConfig,
    average_states,
    softmax_model,
    softmax_trainer,
    train_with_validation,
)
from caffeonspark_spark.multimodal.columns import ColumnSpec
from caffeonspark_spark.operators.dedup import clean_corpus
from caffeonspark_spark.operators.similarity import cosine_topk
from caffeonspark_spark.operators.textops import chunk_documents
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    engine = Engine(config=Config(master="local[8]", app_name="pipeline-demo"))
    engine.attach_catalog(sf_dir)
    spark = engine.spark
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = engine.table("documents").count()
    print(f"corpus: {n_docs} documents")

    # 1-2. quality gate + dedup (exact + near) in one declarative plan
    cleaned = clean_corpus(spark, sf_dir)
    n_clean = cleaned.count()
    print(f"after quality gate + dedup: {n_clean} documents "
          f"({n_docs - n_clean} removed)")

    # 2b. LM corpus-fit filter: drop the most out-of-distribution docs
    # (lowest smoothed-bigram evidence — the perplexity-filter stage).
    # Anti-join against the BELOW-cutoff set so docs with no score (fewer
    # than 2 tokens — no bigrams) are kept, and persist the scores: the
    # 3-scan scoring plan feeds both the quantile and the filter.
    from caffeonspark_spark.operators.textops import ngram_lm_score

    lm = ngram_lm_score(spark, sf_dir).persist()
    quantiles = lm.approxQuantile("lm_fit", [0.02], 0.001)
    if quantiles:
        cutoff = quantiles[0]
        low = lm.where(F.col("lm_fit") < cutoff).select("doc_id")
        cleaned = cleaned.join(low, "doc_id", "left_anti")
        print(f"after LM corpus-fit filter (cutoff {cutoff:.4f}): "
              f"{cleaned.count()} documents")
    lm.unpersist()

    # 3. benchmark decontamination: drop survivors sharing 5-grams with the
    # held-out set (source 'src0' stands in for an eval benchmark)
    from caffeonspark_spark.operators.dedup import decontaminate

    contaminated = decontaminate(spark, sf_dir).select("doc_id")
    cleaned = cleaned.join(contaminated, "doc_id", "left_anti")
    print(f"after decontamination: {cleaned.count()} documents")

    # 4. corpus diagnostics: most frequent tokens (boilerplate candidates)
    from caffeonspark_spark.operators.textops import heavy_hitter_tokens

    hh = heavy_hitter_tokens(spark, sf_dir, k=5).collect()
    print("top tokens:", [(r["token"], r["n"]) for r in hh])

    # 5. incremental ingest: dedup the "new batch" (sources src10+) against
    # the kept corpus (src0-9) — bipartite LSH, no within-side pairs
    from caffeonspark_spark.operators.dedup import (
        dedup_against_corpus_df,
        split_corpus_by_source,
    )

    new_docs, ref_docs = split_corpus_by_source(engine.table("documents"))
    cross = dedup_against_corpus_df(new_docs, ref_docs, threshold=0.35)
    print(f"new-batch docs near-duplicating the kept corpus: "
          f"{cross.select('new_id').distinct().count()}")

    # 5b. train the tokenizer on the corpus (BPE merge table)
    from caffeonspark_spark.operators.bpe import bpe_train

    merges = bpe_train(spark, sf_dir, n_merges=5).collect()
    print("BPE merges:", [(r["lhs"], r["rhs"], r["pair_count"]) for r in merges])

    # 6. context-window chunking of the survivors
    chunks = chunk_documents(spark, sf_dir).join(
        cleaned.select("doc_id"), "doc_id"
    )
    print(f"chunks for training: {chunks.count()}")

    # 6b. positional overlap audit: winnowing (MOSS) fingerprints catch
    # shared passages the order-free MinHash pass scores low on Jaccard
    from caffeonspark_spark.operators.dedup import winnow_overlap_pairs

    wpairs = winnow_overlap_pairs(spark, sf_dir).count()
    print(f"winnowing overlap candidates (>=2 shared fingerprints): {wpairs}")

    # 6b2. content-defined chunk audit: CDC boundaries make duplicated
    # passages chunk identically at ANY offset — report spans shared
    # across documents (the offset-robust complement of 6b)
    from caffeonspark_spark.operators.textops import cdc_dup_chunks

    shared = cdc_dup_chunks(spark, sf_dir).count()
    print(f"cross-doc duplicate CDC chunks (>=16 chars, >=2 docs): {shared}")

    # 6b3. canonical-pick scoring: PageRank over the near-dup graph ranks
    # the most-connected member of each duplicate cluster (the document
    # every variant derives from) highest — keep that one
    from caffeonspark_spark.operators.dedup import neardup_pagerank

    top_canon = neardup_pagerank(spark, sf_dir).orderBy(
        F.desc("pagerank")
    ).limit(3).collect()
    print("top canonical picks:", [(r["node"], round(r["pagerank"], 6)) for r in top_canon])

    # 6c. leakage-safe split: near-dup clusters share one split, so eval
    # never scores a document whose twin was trained on
    from caffeonspark_spark.operators.sampling import leakage_safe_split

    splits = leakage_safe_split(spark, sf_dir)
    split_sizes = splits.groupBy("split").count().orderBy("split").collect()
    print("leakage-safe splits:", [(r["split"], r["count"]) for r in split_sizes])

    # 7. deterministic shuffle-shard export: fix the training order
    from caffeonspark_spark.operators.sampling import shuffle_shards

    sharded = shuffle_shards(cleaned.select("doc_id"), "doc_id", n_shards=4, seed=42)
    sizes = sharded.groupBy("shard").count().orderBy("shard").collect()
    print("shard sizes:", [(r["shard"], r["count"]) for r in sizes])

    # 8. toy training with interleaved validation on the embeddings table
    emb = engine.table("embeddings")
    specs = [ColumnSpec("embedding", "float_array", channels=64),
             ColumnSpec("label", "int")]
    cfg = TrainConfig(batch_size=50, max_iter=20, test_interval=10, test_iter=4)
    state, metrics = train_with_validation(
        emb, emb,
        trainer=softmax_trainer(dim=64, n_classes=10, lr=1.0),
        model_from_state=softmax_model,
        specs=specs, cfg=cfg,
        val_blobs=["accuracy", "loss"],
        order_cols=["vec_id"], id_col="vec_id",
        merge_states=average_states,
    )
    for mrow in metrics:
        print(f"iter {mrow['iteration']:>3}: accuracy={mrow['accuracy'][0]:.3f} "
              f"loss={mrow['loss'][0]:.4f}")

    # 9. similarity lookup: nearest neighbours of vector 0
    top = cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=5).collect()
    print("top-5 neighbours of vec 0:",
          [(r["vec_id"], round(r["cos_sim"], 4)) for r in top])

    # 9b. radius search: everything within cosine >= 0.25 of the probe —
    # the threshold sibling of top-k (what a dedup pass actually asks)
    from caffeonspark_spark.operators.similarity import cosine_range_search

    radius = cosine_range_search(
        emb, emb.where(F.col("vec_id") == 0), tau=0.25
    ).count()
    print(f"corpus vectors within cosine 0.25 of vec 0: {radius}")

    # 9c. embedding-space curation (r10): a mode-balanced prototype subset
    # and contrastive triplets mined from the same embeddings
    from caffeonspark_spark.operators.similarity import (
        cluster_prototypes,
        hard_negative_mining,
    )

    protos = cluster_prototypes(
        emb, emb.where(F.col("vec_id") < 8), per_cluster=3
    )
    print(f"cluster-balanced prototypes: {protos.count()} rows "
          "(3 most-central per cluster)")
    trip = hard_negative_mining(emb, emb.where(F.col("vec_id") < 3)).collect()
    print("mined triplets:",
          [(r["anchor_id"], r["positive_id"], r["negative_id"]) for r in trip])

    # 9d. ingest data-quality tripwire (r10): trailing-window z-score
    # anomalies on the event stream feeding the pipeline
    from caffeonspark_spark.operators.temporal import rolling_zscore_anomaly

    anomalies = rolling_zscore_anomaly(engine.table("events")).count()
    print(f"trailing-window |z|>2 anomalies in events: {anomalies}")

    # 10. hybrid retrieval: fuse the dense ranking with BM25 by
    # reciprocal rank (no score normalization needed)
    from caffeonspark_spark.operators.textops import rrf_fusion

    fused = rrf_fusion(spark, sf_dir).collect()
    print("hybrid (RRF) top docs:",
          [(r["doc_id"], round(r["rrf"], 4)) for r in fused[:5]])

    # 11. corpus observability: the reports a pretraining pipeline watches
    from caffeonspark_spark.operators.textops import (
        packing_efficiency,
        tokenizer_fertility,
    )

    for r in tokenizer_fertility(spark, sf_dir).collect():
        print(f"fertility[{r['lang']}]: {r['chars_per_token']:.2f} chars/token, "
              f"{r['tokens_per_doc']:.1f} tokens/doc")
    pe = packing_efficiency(spark, sf_dir).collect()[0]
    print(f"packing: {pe['n_packs']} packs, "
          f"{pe['mean_tokens_per_pack']:.1f} tokens/pack, "
          f"overflow {pe['overflow_frac']:.2%}")

    # 11b. engagement observability: the weekly cohort-retention triangle
    from caffeonspark_spark.operators.temporal import cohort_retention

    cohorts = cohort_retention(engine.table("events")).orderBy(
        "cohort_week", "week_offset"
    ).collect()
    for r in cohorts[:4]:
        print(f"cohort {r['cohort_week']:%Y-%m-%d} +{r['week_offset']}w: "
              f"{r['n_users']} users, {r['n_events']} events")

    # 12. streaming the same pipeline: the hourly window agg driven through
    # a real Structured Streaming source equals the batch rollup exactly
    from caffeonspark_spark.streaming.windows import stream_tumbling_parity

    stream_rows = stream_tumbling_parity(spark, sf_dir).count()
    print(f"stream-to-completion hourly windows: {stream_rows} "
          "(bit-identical to the batch rollup — see stream_tumbling_parity)")

    spark.stop()


if __name__ == "__main__":
    main()
