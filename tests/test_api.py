"""Reference-shaped API facade tests: the CaffeOnSpark verb surface
(train / trainWithValidation / features / test) driven end-to-end on the
embeddings table — the PythonApiTest.py:35-59 flow without Caffe."""

from __future__ import annotations

import pytest

from caffeonspark_spark.api import CaffeOnSpark, DataSource
from caffeonspark_spark.catalog import load_table
from caffeonspark_spark.ml.dataflow import softmax_model, softmax_trainer
from caffeonspark_spark.multimodal.columns import ColumnSpec


@pytest.fixture(scope="module")
def source(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    return DataSource(
        df=emb,
        specs=[ColumnSpec("embedding", "float_array", channels=64), ColumnSpec("label", "int")],
        id_col="vec_id",
        order_cols=["vec_id"],
        trainer=softmax_trainer(dim=64, n_classes=10, lr=1.0),
        model_from_state=softmax_model,
        batch_size=50,
        max_iter=20,
        test_interval=10,
        test_iter=4,
    )


def test_train_then_test(spark, source):
    cos = CaffeOnSpark(spark)
    state = cos.train(source)
    assert "W" in state and state["iterations"] >= 20
    summary = cos.test(source, ["accuracy", "loss"])
    assert set(summary) == {"accuracy", "loss"}
    assert summary["loss"][0] < 2.3025  # beats untrained NLL baseline


def test_train_with_validation_metrics_df(spark, source):
    cos = CaffeOnSpark(spark)
    mdf = cos.trainWithValidation(source, source, ["accuracy", "loss"])
    assert mdf.columns == ["iteration", "accuracy", "loss"]
    rows = mdf.orderBy("iteration").collect()
    assert [r["iteration"] for r in rows] == [10, 20]
    assert rows[-1]["loss"][0] < 2.3025


def test_features_after_train(spark, source):
    cos = CaffeOnSpark(spark)
    cos.train(source)
    feats = cos.features(source, ["accuracy", "loss"])
    assert feats.columns == ["SampleID", "accuracy", "loss"]
    assert feats.count() == 500
