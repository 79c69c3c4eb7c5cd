"""Python UDTF surface (table functions).

The reference has no UDTF (SURVEY §2 "UDF/UDAF/UDTF surface"); the rebuild
covers the API two ways:

1. **Preferred, scale path**: explode-of-array Catalyst plans — see
   ``textops.chunk_documents`` (chunking), ``textops.bigram_topk``
   (n-grams). These stay inside codegen.
2. **Python UDTFs** (this module): the genuine-Python table-function cases —
   logic that needs arbitrary Python per input row and a variable number of
   output rows. Row-at-a-time by nature, so keep them OFF the hot path; at
   scale, prefer (1) or a ``mapInPandas`` batch operator.

Register with ``register_udtfs(spark)`` → usable via
``LATERAL token_counts(text)`` in SQL.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, n int")
class TokenCountsUDTF:
    """Per-document token histogram: one output row per distinct token.
    Deterministic (tokens sorted). Single-space split — the codebase's
    ``space_tokens`` contract — so the histogram counts the same token
    stream as ``ChunkUDTF`` and every oracle-checked text operator."""

    def eval(self, text: str):
        from collections import Counter

        counts = Counter(t for t in (text or "").lower().split(" ") if t)
        for tok, n in sorted(counts.items()):
            yield tok, n


@udtf(returnType="chunk_idx int, chunk_text string")
class ChunkUDTF:
    """UDTF twin of ``textops.chunk_documents`` (40-token windows, stride
    30) — exists to pin that the explode-form and UDTF-form agree; use the
    explode form in pipelines."""

    def eval(self, text: str):
        toks = [t for t in (text or "").lower().split(" ") if t]
        stride, width = 30, 40
        for idx, start in enumerate(range(0, len(toks), stride)):
            chunk = " ".join(toks[start : start + width])
            if chunk:
                yield idx, chunk


def register_udtfs(spark) -> None:
    spark.udtf.register("token_counts", TokenCountsUDTF)
    spark.udtf.register("chunk_text", ChunkUDTF)
