from caffeonspark_spark.multimodal.columns import (
    ColumnSpec,
    IMAGE_STRUCT_SCHEMA,
    image_struct_col,
)
from caffeonspark_spark.multimodal.batch import assemble_batches

__all__ = ["ColumnSpec", "IMAGE_STRUCT_SCHEMA", "image_struct_col", "assemble_batches"]
