from caffeonspark_spark.sources.registry import read_source, write_sink, SOURCE_FORMATS

__all__ = ["read_source", "write_sink", "SOURCE_FORMATS"]
