"""Reference-shaped top-level API.

The reference's root object is ``CaffeOnSpark(sc)`` with the verbs
``train / trainWithValidation / features / test`` over a config-described
data source (``CaffeOnSpark.scala:36-82``; Python mirror
``CaffeOnSpark.py:18-60``). This module gives migrating users the same
verbs with the same shapes — natively on PySpark, no py4j reflection:

    cos = CaffeOnSpark(spark)
    src = DataSource(df=train_df, specs=[...], id_col="vec_id",
                     trainer=softmax_trainer(64, 10),
                     model_from_state=softmax_model,
                     batch_size=50, max_iter=30)
    cos.train(src)                       # -> final state (M1)
    cos.trainWithValidation(src, vsrc)   # -> validation-metrics DataFrame (M2)
    feats = cos.features(src, ["ip1"])   # -> DataFrame SampleID, ip1 (M3)
    summary = cos.test(src, ["accuracy"])# -> {blob: [means...]} (M4)

Differences from the reference, by design: the model is a pluggable Python
callable instead of a Caffe prototxt (the engine is ML-framework-agnostic),
and snapshots are ``save_state``/``load_state`` JSON artifacts (M5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from caffeonspark_spark.ml.dataflow import (
    TrainConfig,
    TrainerFn,
    ModelFn,
    average_states,
    features as _features,
    test_model as _test_model,
    train as _train,
    train_with_validation as _twv,
)
from caffeonspark_spark.multimodal.columns import ColumnSpec


@dataclass
class DataSource:
    """The rebuild of the reference's config-described source
    (``DataSource.scala:133-166`` + the surviving ``Config.scala`` knobs):
    a DataFrame, its declared column schema ("tops"), and the training
    knobs that still make sense."""

    df: DataFrame
    specs: list[ColumnSpec]
    id_col: str = "id"
    order_cols: list[str] = field(default_factory=list)
    trainer: TrainerFn | None = None
    model_from_state: "Callable[[dict], ModelFn] | None" = None
    batch_size: int = 64
    max_iter: int = 100
    test_interval: int = 0
    test_iter: int = 1

    def config(self) -> TrainConfig:
        return TrainConfig(
            batch_size=self.batch_size,
            max_iter=self.max_iter,
            test_interval=self.test_interval,
            test_iter=self.test_iter,
        )


class CaffeOnSpark:
    """The reference's driver object, Spark-native (``CaffeOnSpark.scala:36-82``)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.state: dict = {}

    def train(self, source: DataSource, init_state: dict | None = None) -> dict:
        """M1: data-parallel training; returns (and stores) final state."""
        self.state = _train(
            source.df, source.trainer, source.specs, source.config(),
            id_col=source.id_col,
            init_state=init_state if init_state is not None else self.state,
            merge_states=average_states,
        )
        return self.state

    def trainWithValidation(
        self, source: DataSource, validation: DataSource, val_blobs: list[str]
    ) -> DataFrame:
        """M2: interleaved train/validation; returns the validation-metrics
        DataFrame (schema ``iteration, <blob>: array<double>`` — the
        reference's ``CaffeOnSpark.scala:356-357`` contract)."""
        self.state, metrics = _twv(
            source.df, validation.df, source.trainer, source.model_from_state,
            source.specs, source.config(), val_blobs,
            order_cols=source.order_cols or [source.id_col],
            id_col=source.id_col, init_state=self.state,
            merge_states=average_states,
        )
        schema = "iteration long, " + ", ".join(f"{b} array<double>" for b in val_blobs)
        rows = [
            tuple([mrow["iteration"]] + [mrow[b] for b in val_blobs]) for mrow in metrics
        ]
        return self.spark.createDataFrame(rows, schema)

    def features(self, source: DataSource, output_blobs: list[str]) -> DataFrame:
        """M3: forward-pass feature extraction → ``SampleID, <blob>...``."""
        model = source.model_from_state(self.state)
        return _features(
            source.df, model, source.specs, output_blobs,
            batch_size=source.batch_size, id_col=source.id_col,
        )

    def test(self, source: DataSource, val_blobs: list[str]) -> dict:
        """M4: validation summary ``{blob: [element-wise means]}``."""
        model = source.model_from_state(self.state)
        return _test_model(
            source.df, model, source.specs, val_blobs,
            batch_size=source.batch_size, id_col=source.id_col,
        )
