"""Python UDTF surface tests (and UDTF-vs-explode-form agreement)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from caffeonspark_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)


def test_token_counts_udtf(spark):
    rows = spark.sql(
        "SELECT tc.* FROM VALUES ('the cat the hat') AS t(txt), "
        "LATERAL token_counts(txt) tc ORDER BY token"
    ).collect()
    assert [(r["token"], r["n"]) for r in rows] == [("cat", 1), ("hat", 1), ("the", 2)]


def test_chunk_udtf_agrees_with_explode_form(spark, sf_smoke):
    """The UDTF chunker and the codegen explode-form chunker must emit the
    identical (doc_id, chunk_idx, chunk_text) set."""
    from caffeonspark_spark.catalog import load_table
    from caffeonspark_spark.operators.textops import chunk_documents

    load_table(spark, sf_smoke, "documents").createOrReplaceTempView("docs_v")
    udtf_rows = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_idx, c.chunk_text "
            "FROM docs_v d, LATERAL chunk_text(d.text) c"
        ).collect()
    }
    explode_rows = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(spark, sf_smoke).collect()
    }
    assert udtf_rows == explode_rows
