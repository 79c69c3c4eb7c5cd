"""ETL conversion tools (SURVEY.md §2 E1-E7, F2/F3).

Reference parity, re-expressed as DataFrame transforms:

* ``Vocab`` — ``tools/Vocab.scala:28-59``: ranked vocabulary from a text
  column (word count desc, top-N cutoff), file format = one word per line
  with the ``UNK`` sentinel first; word index = line number after load.
  Sentinels (``Vocab.scala:12-18``): START_END_ID=0, UNKNOWN_ID=1, pad
  NO_TOKEN=-1.
* ``caption_to_embedding`` — F2 (``tools/Conversions.scala:146-207``):
  caption → fixed-length int arrays ``input_sentence`` / ``cont_sentence`` /
  ``target_sentence`` with the exact sentinel/pad layout of the reference
  (input[0]=START, len = min(|words|, L-1), target[len]=START, rest pad).
* ``embedding_to_caption`` — F3 (``Conversions.scala:209-229``): indices →
  words, skipping START/NO_TOKEN sentinels.
* ``binary_to_dataframe`` — E2 (``tools/Binary2DataFrame.scala:20-88``):
  whole-binary-file ingest + label-file join → ``(SampleID, label, data)``.

Scale: encode/decode run as broadcast-joined explode/collect pipelines — the
vocab (small dim) broadcasts, captions never leave executors; the reference
instead collected the vocab map to the driver (``Vocab.scala:55-57``) and
closure-captured it, which is the same physical plan Spark picks here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from caffeonspark_spark.functions.text import sentence_to_words

START_END_ID = 0
UNKNOWN_ID = 1
NO_TOKEN = -1
UNKNOWN_TOKEN = "UNK"


class Vocab:
    """Ranked vocabulary over a text column (A2/O1/O2 pipeline:
    groupBy-count → sort desc → limit).

    Layout quirk preserved FROM THE REFERENCE: the vocab file is
    ["UNK", top word, ...] and load() maps word → line index, so UNK
    sits at index 0 (colliding with START_END_ID=0) while UNKNOWN_ID=1
    is the top-ranked word's index — an OOV token therefore encodes as
    the most frequent word. The reference intended a +2 shift ("Number 0
    is not used", ``Vocab.scala:36-38``) but never implemented it, and
    its encoder hard-codes the same ``UNKNOWN_ID`` fallback
    (``Conversions.scala:173``); the rebuild reproduces the observable
    behavior bit-for-bit rather than silently diverging from the
    reference's artifacts."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.words: DataFrame | None = None  # (word string, index int)

    def gen_from_data(self, df: DataFrame, column: str, vocab_size: int = -1) -> "Vocab":
        words = df.select(F.explode(sentence_to_words(F.col(column))).alias("word"))
        ranked = (
            words.groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("word"))  # stable tiebreak (reference relies on sort order)
        )
        if vocab_size > 0:
            ranked = ranked.limit(vocab_size)
        unk = self.spark.createDataFrame([(UNKNOWN_TOKEN, -1)], "word string, n long")
        # UNK first, then ranked words; index = position (load-time zipWithIndex)
        w = Window.orderBy(F.desc("is_unk"), F.desc("n"), F.asc("word"))
        self.words = (
            unk.withColumn("is_unk", F.lit(1))
            .unionByName(ranked.withColumn("is_unk", F.lit(0)))
            .withColumn("index", F.row_number().over(w) - F.lit(1))
            .select("word", "index")
        )
        return self

    def save(self, path: str) -> None:
        """One word per line, rank order, single file (``coalesce(1)``
        contract of ``Vocab.scala:45-49``)."""
        self.words.orderBy("index").select("word").coalesce(1).write.mode(
            "overwrite"
        ).text(path)

    def load(self, path: str) -> "Vocab":
        lines = self.spark.read.text(path)
        w = Window.orderBy(F.monotonically_increasing_id())
        # single-file text preserves line order within the one partition
        self.words = lines.coalesce(1).withColumn(
            "index", F.row_number().over(w) - F.lit(1)
        ).select(F.col("value").alias("word"), "index")
        return self

    def word2index(self) -> dict[str, int]:
        """Driver-side map (small dim table by construction)."""
        return {r["word"]: r["index"] for r in self.words.collect()}


def caption_to_embedding(
    df: DataFrame,
    vocab: Vocab,
    caption_length: int,
    id_col: str = "id",
    caption_col: str = "caption",
) -> DataFrame:
    """Encode captions to the reference's three fixed-length int arrays.

    Pure Catalyst: tokenize → broadcast-join vocab per token → re-assemble
    in position order → sentinel/pad layout via array expressions.
    """
    L = caption_length
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.slice(sentence_to_words(F.col(caption_col)), 1, L - 1)
        ).alias("pos", "word"),
    )
    v = F.broadcast(vocab.words)
    embedded = (
        toks.join(v, toks.word == v.word, "left_outer")
        .select(
            F.col(id_col),
            "pos",
            F.coalesce(F.col("index"), F.lit(UNKNOWN_ID)).cast("int").alias("emb"),
        )
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("emb")))
            ).alias("pairs")
        )
        .select(
            F.col(id_col), F.transform(F.col("pairs"), lambda p: p["emb"]).alias("emb_arr")
        )
    )
    # captions with zero tokens never appear in `toks`; restore them with empty arrays
    base = df.select(F.col(id_col)).join(embedded, id_col, "left_outer").select(
        F.col(id_col),
        F.coalesce(F.col("emb_arr"), F.array().cast("array<int>")).alias("emb_arr"),
    )
    n = F.size(F.col("emb_arr"))  # = min(|words|, L-1)
    pad = lambda k: F.array_repeat(F.lit(NO_TOKEN).cast("int"), k)  # noqa: E731
    start = F.array(F.lit(START_END_ID).cast("int"))
    return base.select(
        F.col(id_col),
        F.concat(start, F.col("emb_arr"), pad(F.lit(L - 1) - n)).alias("input_sentence"),
        F.concat(
            F.array(F.lit(0).cast("int")),
            F.array_repeat(F.lit(1).cast("int"), n),
            pad(F.lit(L - 1) - n),
        ).alias("cont_sentence"),
        F.concat(F.col("emb_arr"), start, pad(F.lit(L - 1) - n)).alias("target_sentence"),
    )


def embedding_to_caption(
    df: DataFrame,
    vocab: Vocab,
    embedding_col: str = "input_sentence",
    caption_col: str = "caption",
    id_col: str = "id",
) -> DataFrame:
    """Decode an index array back to a caption, skipping sentinels (F3)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.col(embedding_col)).alias("pos", "idx"),
    ).where((F.col("idx") != START_END_ID) & (F.col("idx") != NO_TOKEN))
    v = F.broadcast(vocab.words)
    return (
        toks.join(v, toks.idx == v.index, "left_outer")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "word"))).alias("pairs")
        )
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(F.col("pairs"), lambda p: p["word"]), " "
            ).alias(caption_col),
        )
    )


def binary_to_dataframe(
    spark: SparkSession, data_dir: str, label_file: str
) -> DataFrame:
    """E2: image dir + label file → DF ``(SampleID string, label int, data
    binary)`` (schema of ``Binary2DataFrame.scala:32-34``).

    Label lines: ``<filename> <label> [<id>]`` (``Binary2DataFrame.scala:53-61``);
    missing id defaults to the filename STEM, matching the imagedir
    source's parser of the same grammar (the reference requires all three
    fields, ``Binary2DataFrame.scala:55-61``; the default is a rebuild
    extension and the two ingest paths must agree so ids join across
    them — r7 self-review finding). Files come in through the
    ``binaryFile`` source (S8) and join the parsed labels on filename.
    """
    labels = (
        spark.read.text(label_file)
        .select(F.split(F.trim(F.col("value")), r"\s+").alias("parts"))
        .where(F.size("parts") >= 2)
        .select(
            F.element_at("parts", 1).alias("filename"),
            F.element_at("parts", 2).cast("int").alias("label"),
            F.when(F.size("parts") >= 3, F.element_at("parts", 3))
            .otherwise(F.regexp_replace(F.element_at("parts", 1), r"\.[^.]*$", ""))
            .alias("SampleID"),
        )
    )
    files = spark.read.format("binaryFile").load(data_dir).select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("filename"),
        F.col("content").alias("data"),
    )
    return files.join(F.broadcast(labels), "filename", "inner").select(
        "SampleID", "label", "data"
    )


# --- E5: COCO dataset converter (composed tool) ---------------------------

def coco_to_image_caption(spark: SparkSession, json_path: str) -> DataFrame:
    """COCO annotation JSON → per-caption DataFrame
    ``(id, height, width, file, url, caption)`` — the rebuild of
    ``Conversions.Coco2ImageCaptionFile`` (``Conversions.scala:31-87``):
    explode ``images`` and ``annotations``, join on ``image_id``, one row
    per caption id. Without an ``annotations`` field, returns images only
    (``coco_url`` instead of ``flickr_url``), like the reference.
    """
    df = spark.read.option("multiLine", "true").json(json_path)
    has_ann = "annotations" in df.columns
    url_col = "flickr_url" if has_ann else "coco_url"
    images = df.select(F.explode("images").alias("img")).select(
        F.col("img.id").alias("image_id"),
        F.col("img.height").cast("int").alias("height"),
        F.col("img.width").cast("int").alias("width"),
        F.col("img.file_name").alias("file"),
        F.col(f"img.{url_col}").alias("url"),
    )
    if not has_ann:
        return images.withColumnRenamed("image_id", "id")
    captions = df.select(F.explode("annotations").alias("a")).select(
        F.col("a.image_id").alias("image_id"),
        F.col("a.id").alias("id"),
        F.col("a.caption").alias("caption"),
    )
    return images.join(captions, "image_id").select(
        "id", "height", "width", "file", "url", "caption"
    )


def _image_payloads(spark: SparkSession, image_root: str) -> DataFrame:
    """binaryFile scan of the image root → (file, image bytes) — the S8
    whole-file ingest standing in for the reference's per-row
    ``image2innerRow`` FS loop (``Conversions.scala:94-105``)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.jpg")
        .load(image_root)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file"),
            F.col("content").alias("image"),
        )
    )


def _with_image_struct(df: DataFrame, payloads: DataFrame) -> DataFrame:
    """Attach the nested ``data: {height, width, image}`` struct
    (INNER_DATA_FIELD_SCHEMA, ``Conversions.scala:89-92``) + ``label = 0``."""
    return df.join(F.broadcast(payloads), "file").withColumn(
        "data",
        F.struct(
            F.col("height").alias("height"),
            F.col("width").alias("width"),
            F.col("image").alias("image"),
        ),
    ).withColumn("label", F.lit(0).cast("int"))


def image_to_embedding(image_root: str, image_caption_df: DataFrame) -> DataFrame:
    """``Image2Embedding`` (``Conversions.scala:107-144``): images only →
    ``(id string, data struct, label int)``."""
    payloads = _image_payloads(image_caption_df.sparkSession, image_root)
    return _with_image_struct(image_caption_df, payloads).select(
        F.col("id").cast("string").alias("id"), "data", "label"
    )


def image_caption_to_embedding(
    image_root: str, image_caption_df: DataFrame, vocab: Vocab, caption_length: int
) -> DataFrame:
    """``ImageCaption2Embedding`` (``Conversions.scala:148-207``): caption
    rows + image payloads → ``(id string, data struct, label int,
    input/cont/target_sentence array<int>)`` with the exact sentinel
    layout of F2 (START=0 prefix, UNK=1, pad=-1)."""
    enc = caption_to_embedding(
        image_caption_df, vocab, caption_length, id_col="id", caption_col="caption"
    )
    payloads = _image_payloads(image_caption_df.sparkSession, image_root)
    base = _with_image_struct(image_caption_df, payloads)
    return base.join(enc, "id").select(
        F.col("id").cast("string").alias("id"),
        "data",
        "label",
        "input_sentence",
        "cont_sentence",
        "target_sentence",
    )


def coco_convert(
    spark: SparkSession,
    caption_file: str,
    image_root: str,
    caption_length: int = 10,
    vocab_size: int = -1,
    vocab_path: str | None = None,
) -> tuple[DataFrame, Vocab | None, DataFrame]:
    """E5 composed tool (``CocoDataSetConverter.scala:14-49``): COCO JSON +
    image dir → caption DataFrame, ranked vocab (generated, optionally
    saved+reloaded like the reference's HDFS round trip), and the embedding
    DataFrame. Returns ``(image_caption_df, vocab, embedding_df)``; write
    the frames with ``df.write.format(...)`` as the CLI did."""
    df_ic = coco_to_image_caption(spark, caption_file)
    if "caption" in df_ic.columns:
        vocab = Vocab(spark).gen_from_data(df_ic, "caption", vocab_size)
        if vocab_path is not None:
            vocab.save(vocab_path)
            vocab = Vocab(spark).load(vocab_path)
        return df_ic, vocab, image_caption_to_embedding(
            image_root, df_ic, vocab, caption_length
        )
    return df_ic, None, image_to_embedding(image_root, df_ic)


def caption_encode_docs(spark: SparkSession, sf_dir: str, caption_length: int = 12,
                        vocab_size: int = 30) -> DataFrame:
    """Declared query: build a ranked vocab over documents.text and encode
    every document with the reference sentinel layout (F2 over the shared
    testdata; oracle-checked end-to-end including the vocab ranking)."""
    from caffeonspark_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab = Vocab(spark).gen_from_data(docs, "text", vocab_size=vocab_size)
    enc = caption_to_embedding(
        docs, vocab, caption_length, id_col="doc_id", caption_col="text"
    )

    def joined(col):
        # comma-joined string form: engine-agnostic hashing for the oracle
        # (list cell representations differ between client libraries)
        return F.array_join(F.transform(F.col(col), lambda x: x.cast("string")), ",").alias(col)

    return enc.select(
        "doc_id", joined("input_sentence"), joined("cont_sentence"), joined("target_sentence")
    ).orderBy("doc_id")


ORACLE_CAPTION_ENCODE = r"""
    WITH toks AS (
        -- the reference tokenizer (sentence_to_words: word/punct runs,
        -- trim, drop '' and bare '.'), reproduced in DuckDB so the oracle
        -- checks the REAL token stream — the old single-space split only
        -- agreed on punctuation-free fixtures (r7 self-review finding)
        SELECT doc_id,
               list_filter(list_transform(
                   regexp_extract_all(lower(text),
                                      '([a-z0-9_]+|[^a-z0-9_\s]+)', 1),
                   t -> trim(t)), t -> t <> '' AND t <> '.') AS ts
        FROM documents
    ),
    vocab AS (
        SELECT word, CAST(row_number() OVER (ORDER BY n DESC, word ASC) AS INT) AS idx
        FROM (SELECT token AS word, COUNT(*) AS n
              FROM (SELECT unnest(ts) AS token FROM toks)
              GROUP BY token ORDER BY n DESC, word ASC LIMIT 30)
    ),
    ex AS (
        SELECT doc_id, generate_subscripts(ts[1:11], 1) AS pos, unnest(ts[1:11]) AS token
        FROM toks
    ),
    emb AS (
        SELECT ex.doc_id, ex.pos, CAST(COALESCE(v.idx, 1) AS INT) AS e
        FROM ex LEFT JOIN vocab v ON ex.token = v.word
    ),
    arr AS (SELECT doc_id, list(e ORDER BY pos) AS ea FROM emb GROUP BY doc_id)
    SELECT t.doc_id,
           array_to_string([CAST(0 AS INT)] || COALESCE(ea, []) ||
             list_transform(range(1, 12 - len(COALESCE(ea, []))), i -> CAST(-1 AS INT)), ',')
             AS input_sentence,
           array_to_string([CAST(0 AS INT)] ||
             list_transform(range(1, len(COALESCE(ea, [])) + 1), i -> CAST(1 AS INT)) ||
             list_transform(range(1, 12 - len(COALESCE(ea, []))), i -> CAST(-1 AS INT)), ',')
             AS cont_sentence,
           array_to_string(COALESCE(ea, []) || [CAST(0 AS INT)] ||
             list_transform(range(1, 12 - len(COALESCE(ea, []))), i -> CAST(-1 AS INT)), ',')
             AS target_sentence
    FROM toks t LEFT JOIN arr ON t.doc_id = arr.doc_id
    ORDER BY t.doc_id
"""
