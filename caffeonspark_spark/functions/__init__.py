from caffeonspark_spark.functions.arrays import (
    dsum,
    davg,
    vector_mean_long,
    cosine_similarity,
    l2_norm,
    dot_product,
)
from caffeonspark_spark.functions.text import (
    tokenize,
    sentence_to_words,
    ngrams,
    token_count,
    quality_score_cols,
    lang_id_score,
    doc_fingerprint,
)

__all__ = [
    "dsum",
    "davg",
    "vector_mean_long",
    "cosine_similarity",
    "l2_norm",
    "dot_product",
    "tokenize",
    "sentence_to_words",
    "ngrams",
    "token_count",
    "quality_score_cols",
    "lang_id_score",
    "doc_fingerprint",
]
