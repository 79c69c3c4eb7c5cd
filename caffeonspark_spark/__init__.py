"""caffeonspark_spark — a PySpark-native analytics + ML-dataflow engine.

A from-scratch rebuild of the query and data-processing capabilities of
yahoo/CaffeOnSpark (reference at /root/reference), re-expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, Arrow-batched Python only where
built-ins can't express the semantics, Structured Streaming for streams.

Layout:
    engine        — SparkSession factory + Config (the reference's Config.scala knobs)
    catalog       — named-table catalog over the parquet testdata layout
    sources/      — source registry (parquet/json/csv/text/binaryFile/images)
    functions/    — scalar/agg function library (arrays, text, vocab)
    operators/    — relational query surface, dedup, similarity, partitioning
    multimodal/   — binary/struct image columns + mapInArrow batch assembly
    ml/           — dataflow verbs: features / test / train orchestration
    streaming/    — Structured Streaming windows + stateful ops
    etl/          — ETL tools (Binary2DataFrame, vocab, caption<->embedding)
"""

__version__ = "0.1.0"

from caffeonspark_spark.engine import Config, Engine, get_spark

__all__ = ["Config", "Engine", "get_spark", "__version__"]
