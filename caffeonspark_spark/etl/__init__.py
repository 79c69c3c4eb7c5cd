from caffeonspark_spark.etl.tools import (
    Vocab,
    binary_to_dataframe,
    caption_to_embedding,
    embedding_to_caption,
)

__all__ = ["Vocab", "binary_to_dataframe", "caption_to_embedding", "embedding_to_caption"]
