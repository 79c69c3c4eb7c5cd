"""ETL tool tests — the reference's ToolTest tier (``ToolTest.scala:84-134``):
vocab ranking, encode/decode ROUND-TRIP equality up to captionLength-1, and
binary+label-file ingest."""

from __future__ import annotations

import numpy as np
import pytest

from caffeonspark_spark.etl.tools import (
    NO_TOKEN,
    START_END_ID,
    UNKNOWN_ID,
    Vocab,
    binary_to_dataframe,
    caption_to_embedding,
    embedding_to_caption,
)

CAPTIONS = [
    (1, "a cat sat on the mat"),
    (2, "the cat ate the fish"),
    (3, "a dog barked at the cat"),
]


@pytest.fixture(scope="module")
def caption_df(spark):
    return spark.createDataFrame(CAPTIONS, "id long, caption string")


@pytest.fixture(scope="module")
def vocab(spark, caption_df):
    return Vocab(spark).gen_from_data(caption_df, "caption")


def test_vocab_ranking(vocab):
    w2i = vocab.word2index()
    assert w2i["UNK"] == 0
    assert w2i["the"] == 1  # most frequent word gets index 1
    assert w2i["cat"] == 2
    assert len(w2i) == len(set(w2i.values()))


def test_vocab_save_load_roundtrip(spark, vocab, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vocab") / "v")
    vocab.save(path)
    loaded = Vocab(spark).load(path)
    assert loaded.word2index() == vocab.word2index()


def test_encode_layout(spark, caption_df, vocab):
    L = 8
    out = {
        r["id"]: r
        for r in caption_to_embedding(caption_df, vocab, L).collect()
    }
    row = out[1]  # "a cat sat on the mat" -> 6 words
    inp, cont, tgt = row["input_sentence"], row["cont_sentence"], row["target_sentence"]
    assert len(inp) == len(cont) == len(tgt) == L
    assert inp[0] == START_END_ID
    w2i = vocab.word2index()
    words = ["a", "cat", "sat", "on", "the", "mat"]
    assert inp[1:7] == [w2i[w] for w in words]
    assert inp[7] == NO_TOKEN
    assert cont == [0, 1, 1, 1, 1, 1, 1, NO_TOKEN]
    assert tgt[:6] == [w2i[w] for w in words]
    assert tgt[6] == START_END_ID
    assert tgt[7] == NO_TOKEN


def test_encode_unknown_word(spark, vocab):
    df = spark.createDataFrame([(9, "a zebra sat")], "id long, caption string")
    row = caption_to_embedding(df, vocab, 6).collect()[0]
    w2i = vocab.word2index()
    assert row["input_sentence"][1] == w2i["a"]
    assert row["input_sentence"][2] == UNKNOWN_ID  # zebra unseen
    assert row["input_sentence"][3] == w2i["sat"]


def test_encode_truncation(spark, vocab):
    df = spark.createDataFrame(
        [(7, "the cat the cat the cat the cat")], "id long, caption string"
    )
    L = 4
    row = caption_to_embedding(df, vocab, L).collect()[0]
    assert len(row["input_sentence"]) == L  # truncated to captionLength-1 tokens
    assert NO_TOKEN not in row["input_sentence"]


def test_decode_roundtrip(spark, caption_df, vocab):
    """decode(encode(x)) == tokenized x up to captionLength-1 (ToolTest.scala:122-133)."""
    L = 16
    emb = caption_to_embedding(caption_df, vocab, L)
    decoded = {
        r["id"]: r["caption"]
        for r in embedding_to_caption(emb, vocab, "input_sentence").collect()
    }
    for cid, caption in CAPTIONS:
        assert decoded[cid] == caption  # captions are lowercase already


def test_coco_converter_roundtrip(spark, tmp_path):
    """E5 composed tool vs the reference CocoTest (``ToolTest.scala:84-134``):
    COCO JSON + real JPEGs → caption DF → vocab (save/load) → embedding DF;
    decode(input_sentence) and decode(target_sentence) reproduce the source
    captions up to captionLength-1."""
    import os

    from caffeonspark_spark.etl.tools import coco_convert
    from caffeonspark_spark.functions.text import sentence_to_words_py

    root = "/root/reference/caffe-grid/src/test/resources"
    caption_length = 10
    df_ic, vocab, emb = coco_convert(
        spark,
        f"{root}/coco.json",
        root,
        caption_length=caption_length,
        vocab_size=23,
        vocab_path=str(tmp_path / "vocab"),
    )
    rows = {r["id"]: r for r in df_ic.collect()}
    assert len(rows) == 2 and rows[3]["file"] == "COCO_train2014_000000057870.jpg"

    w2i = vocab.word2index()
    assert len(w2i) > 10
    assert w2i["butterfly"] > 1  # Vocab.VALID_TOKEN_INDEX

    erows = {r["id"]: r for r in emb.collect()}
    assert set(erows) == {"2", "3"}
    for r in erows.values():
        # real image payloads, matching the on-disk file size (ToolTest:75-82)
        fname = [v["file"] for v in rows.values() if str(v["id"]) == r["id"]][0]
        assert len(bytes(r["data"]["image"])) == os.path.getsize(f"{root}/{fname}")
        assert r["label"] == 0
        assert len(r["input_sentence"]) == caption_length
        assert r["input_sentence"][0] == START_END_ID

    for col in ("input_sentence", "target_sentence"):
        dec = {
            r["id"]: r["caption"]
            for r in embedding_to_caption(emb, vocab, embedding_col=col).collect()
        }
        for cid, row in rows.items():
            words = sentence_to_words_py(row["caption"])
            cutoff = min(len(words), caption_length - 1)
            assert sentence_to_words_py(dec[str(cid)]) == words[:cutoff], (col, cid)


def test_binary_to_dataframe(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    (d / "img0.bin").write_bytes(b"\x01\x02")
    (d / "img1.bin").write_bytes(b"\x03\x04")
    (d / "labels.txt").write_text("img0.bin 0 s0\nimg1.bin 1\n")
    df = binary_to_dataframe(spark, f"{d}/*.bin", str(d / "labels.txt"))
    rows = {r["SampleID"]: r for r in df.collect()}
    assert rows["s0"]["label"] == 0 and bytes(rows["s0"]["data"]) == b"\x01\x02"
    assert rows["img1"]["label"] == 1  # id defaults to the filename STEM
    # (matches imagedir.parse_label_file so ids join across ingest paths)


def test_heavy_hitters_match_exact_counts(spark, sf_smoke):
    """At test scale the top-k sketch is effectively exact: every reported
    heavy hitter carries its true count, and the true most-common token is
    reported first."""
    from pyspark.sql import functions as F
    from caffeonspark_spark.catalog import load_table
    from caffeonspark_spark.operators.textops import _toks, heavy_hitter_tokens

    got = heavy_hitter_tokens(spark, sf_smoke, k=10).collect()
    assert len(got) == 10
    exact = {
        r["token"]: r["n"]
        for r in load_table(spark, sf_smoke, "documents")
        .select(F.explode(_toks()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in got:
        assert exact[r["token"]] == r["n"], r
    assert got[0]["n"] == max(exact.values())


def test_redact_pii_planted(spark, tmp_path):
    """Planted emails/phones/IPs are replaced with typed tags; clean text
    passes through byte-identical."""
    import os
    from caffeonspark_spark.operators.textops import redact_pii

    rows = [
        (1, "contact alice.smith+x@example.co.uk for details", "en", "s", 0),
        (2, "call +1-555-123-4567 or 555.987.6543 now", "en", "s", 0),
        (3, "server at 192.168.0.1 responded", "en", "s", 0),
        (4, "perfectly clean sentence here", "en", "s", 0),
        # digit runs embedded in longer numbers/identifiers must NOT get a
        # partial [PHONE] substitution (boundary-guard regression)
        (5, "card 1234567890123456 and order 99887766554433", "en", "s", 0),
        (6, "sha bf90a1234567890c and id X12345678901", "en", "s", 0),
    ]
    d = tmp_path / "pii"
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = {r["doc_id"]: r for r in redact_pii(spark, str(d)).collect()}
    assert out[1]["clean_text"] == "contact [EMAIL] for details"
    assert out[1]["was_redacted"] == 1
    assert out[2]["clean_text"] == "call [PHONE] or [PHONE] now"
    assert out[3]["clean_text"] == "server at [IP] responded"
    assert out[4]["clean_text"] == "perfectly clean sentence here"
    assert out[4]["was_redacted"] == 0
    assert out[5]["clean_text"] == "card 1234567890123456 and order 99887766554433"
    assert out[5]["was_redacted"] == 0
    assert out[6]["clean_text"] == "sha bf90a1234567890c and id X12345678901"
    assert out[6]["was_redacted"] == 0


def test_caption_encode_oracle_parity_on_punctuated_text(spark, tmp_path):
    """The caption oracle reproduces the REAL reference tokenizer
    (word/punct runs), so punctuated / multi-space text must still
    hash-match — the old single-space oracle only agreed on clean
    fixtures (r7 self-review finding)."""
    import os

    import duckdb

    from caffeonspark_spark.etl.tools import ORACLE_CAPTION_ENCODE, caption_encode_docs

    rows = [
        (1, "Hello, world. This is A-B test text!", "en", "s", 37),
        (2, "the  quick   brown fox. over, under & through", "en", "s", 46),
        (3, "...", "en", "s", 3),  # tokenizes to nothing (bare periods)
    ]
    d = tmp_path / "punct"
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    got = sorted(map(tuple, caption_encode_docs(spark, str(d)).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(ORACLE_CAPTION_ENCODE).fetchall()))
    con.close()
    assert got == want, (got, want)
