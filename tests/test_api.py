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


def test_lang_id_prediction_consistent_with_scores(spark):
    """Scores and prediction must count the SAME token stream: a tab/
    double-space-separated text used to score one language but predict
    another in the same row (r7 self-review finding)."""
    from pyspark.sql import functions as F

    from caffeonspark_spark.functions.text import lang_id_score, predict_lang

    df = spark.createDataFrame(
        [("the\tthe\tthe und der ist",), ("le la   les et  oui",)], "text string"
    )
    rows = df.select(
        *[lang_id_score(F.col("text"), lg).alias(lg) for lg in ("en", "de", "fr", "es")],
        predict_lang(F.col("text")).alias("pred"),
    ).collect()
    for r in rows:
        scores = {lg: r[lg] for lg in ("en", "de", "fr", "es")}
        if sum(scores.values()) == 0:
            assert r["pred"] == "und"
        else:
            best = max(scores.values())
            winners = [lg for lg in ("en", "de", "fr", "es") if scores[lg] == best]
            assert r["pred"] == winners[0], (scores, r["pred"])
    # single-space semantics: the tab-joined "the\tthe\tthe" is ONE
    # non-marker token, so German's 3 space-separated markers win — and
    # crucially the prediction now AGREES with the scores
    assert rows[0]["en"] == 0 and rows[0]["de"] == 3 and rows[0]["pred"] == "de"


def test_vector_mean_ragged_arrays(spark):
    """Per-position semantics on ragged input: each position averages the
    rows that actually have it (the deliberate generalization of the
    reference's fixed-length VectorMean — documented in arrays.py)."""
    from caffeonspark_spark.functions.arrays import vector_mean_long

    df = spark.createDataFrame(
        [([1.0],), ([3.0, 5.0],)], "v array<float>"
    )
    out = {r["pos"]: r["mean_val"] for r in vector_mean_long(df, "v").collect()}
    assert out == {0: 2.0, 1: 5.0}
