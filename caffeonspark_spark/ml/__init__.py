from caffeonspark_spark.ml.dataflow import features, test_model, train

__all__ = ["features", "test_model", "train"]
