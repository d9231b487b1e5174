"""Corpus sources — the reference's scans as Spark readers.

S1 (`build_corpus`, my_ner.py:62-116): CoNLL-style token-per-line text,
blank line = sentence boundary, `word[0]` char extraction with
whitespace fallback, optional <END> sentinel, length ordering.

S3 (Unihan scan, my_ner.py:137-149) and S4 (CHISE IDS scan,
my_ner.py:203-210): dictionary file parsers.

All are pure DataFrame plans over `spark.read.text` — the sentence
grouping uses a running count of blank lines, which is the standard
relational encoding of "blank-line-delimited groups".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ner_spark.functions.text import strip_annotations, unicode_decode


def read_conll_tokens(spark: SparkSession, path: str) -> DataFrame:
    """S1: token-grain frame (sent_id, pos, surface, char, tag).

    Reference quirks reproduced exactly:
      - `word[0]` drops positional digit suffixes (科0 -> 科,
        my_ner.py:77)
      - a line that fails to split into (surface, tag) is treated as
        char=' ' with the first field as tag (my_ner.py:79-85)
      - blank lines delimit sentences (my_ner.py:88-96)

    NOTE the line-order window is a single global sort at dictionary
    build time only; corpora are small relative to the engine's data
    (they are label dictionaries, not the 100 TB corpus).
    """
    lines = (
        spark.read.text(path)
        .select(F.col("value").alias("line"))
        .withColumn("line_id", F.monotonically_increasing_id())
    )
    w = Window.orderBy("line_id")
    marked = lines.withColumn(
        "sent_id",
        F.sum(F.when(F.trim("line") == "", 1).otherwise(0)).over(w),
    ).filter(F.trim("line") != "")
    # strip edges first: python's argless split() ignores leading
    # whitespace, Spark's regex split would emit a leading empty field
    # for the reference's whitespace-token lines (' \tO'). F.trim only
    # strips spaces, so use a regex that covers tabs too.
    parts = F.split(F.regexp_replace(F.col("line"), r"^\s+|\s+$", ""), r"\s+")
    sent_w = Window.partitionBy("sent_id").orderBy("line_id")
    return (
        marked.withColumn("pos", F.row_number().over(sent_w) - 1)
        .select(
            "sent_id",
            "pos",
            F.element_at(parts, 1).alias("surface"),
            F.when(F.size(parts) >= 2, F.substring(F.element_at(parts, 1), 1, 1))
            .otherwise(F.lit(" "))
            .alias("char"),
            F.when(F.size(parts) >= 2, F.element_at(parts, 2))
            .otherwise(F.element_at(parts, 1))
            .alias("tag"),
        )
    )


def sentences_from_tokens(tokens: DataFrame, add_end_sentinel: bool = False) -> DataFrame:
    """Sentence-grain frame (sent_id, chars, tags) — the reference's
    (char_list, tag_list) shape; optional <END> append (my_ner.py:89-91).

    Within-sentence order is guaranteed by the EXPRESSION
    (collect_list(struct(pos, ...)) + array_sort), not by physical row
    order: Spark does not promise collect_list preserves a prior sort
    across the aggregation exchange (partial buffers merge in shuffle-
    fetch order), so the orderBy-then-collect idiom corrupts sentences
    on a real cluster even though it happens to hold on local mode.
    """
    agg = tokens.groupBy("sent_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "char", "tag"))).alias("_toks")
    ).select(
        "sent_id",
        F.transform("_toks", lambda s: s["char"]).alias("chars"),
        F.transform("_toks", lambda s: s["tag"]).alias("tags"),
    )
    if add_end_sentinel:
        agg = agg.select(
            "sent_id",
            F.concat("chars", F.array(F.lit("<END>"))).alias("chars"),
            F.concat("tags", F.array(F.lit("<END>"))).alias("tags"),
        )
    return agg


def read_unihan_radicals(spark: SparkSession, path: str) -> DataFrame:
    """S3: Unihan kRSUnicode rows -> (char, radical, stroke).

    Parses `U+XXXX\\tkRSUnicode\\tradical.stroke`, strips the
    traditional-form apostrophe, decodes the codepoint
    (my_ner.py:137-149).
    """
    parts = F.split(F.col("value"), "\t")
    rs = F.split(F.element_at(parts, 3), r"\.")
    return (
        spark.read.text(path)
        .filter(~F.col("value").startswith("#"))
        .filter(F.element_at(parts, 2) == "kRSUnicode")
        .select(
            unicode_decode(F.element_at(parts, 1)).alias("char"),
            F.regexp_replace(F.element_at(rs, 1), "'", "").cast("int").alias("radical"),
            F.element_at(rs, 2).cast("int").alias("stroke"),
        )
    )


def read_radical_index(spark: SparkSession, path: str) -> DataFrame:
    """S5: radindex_rad.txt -> (rad_index, radical).

    Reference quirk reproduced exactly (withW2V.py:279-287
    `radindex_and_rad`): the key is the **1-based line number**, the
    value is the line's FIRST whitespace field. Dictionary files are
    tiny, so the line-order window is a single global sort at build
    time only (same note as read_conll_tokens).
    """
    lines = (
        spark.read.text(path)
        .select(F.col("value").alias("line"))
        .withColumn("line_id", F.monotonically_increasing_id())
    )
    w = Window.orderBy("line_id")
    parts = F.split(F.regexp_replace(F.col("line"), r"^\s+|\s+$", ""), r"\s+")
    return (
        lines.filter(F.trim("line") != "")
        .withColumn("rad_index", F.row_number().over(w))
        .select(
            F.col("rad_index").cast("int"),
            F.element_at(parts, 1).alias("radical"),
        )
    )


# basic wiki-markup cleanup: templates, link syntax, refs, entities.
# The reference delegates to gensim.WikiCorpus (wiki_process.py:35-45);
# this reproduces the article-extraction stage as native regexes so the
# 100 TB dump never leaves the JVM.
_WIKI_CLEANUPS: list[tuple[str, str]] = [
    (r"(?s)\{\{[^{}]*\}\}", " "),          # flat templates
    (r"\[\[(?:[^\[\]|]*\|)?([^\[\]|]*)\]\]", r"$1"),  # [[A|B]] -> B, [[A]] -> A
    (r"(?s)<ref[^>]*>.*?</ref>", " "),
    (r"<[^>]+>", " "),                      # residual tags
    (r"&(?:amp|lt|gt|quot|nbsp);", " "),
    (r"\s+", " "),
]


def read_wiki_articles(spark: SparkSession, path: str) -> DataFrame:
    """S7: MediaWiki XML dump -> (title, text) article rows.

    The dump is split on ``</page>`` at scan time (``lineSep`` — Spark
    parallelizes the split across input blocks), then title/body are
    one regexp_extract each and the markup cleanup is a fixed regex
    chain. Redirects and empty pages are dropped, mirroring what
    gensim's WikiCorpus iterator yields to the reference
    (wiki_process.py:35-45).
    """
    pages = spark.read.option("lineSep", "</page>").text(path)
    title = F.regexp_extract("value", r"<title>([^<]*)</title>", 1)
    body = F.regexp_extract("value", r"(?s)<text[^>]*>(.*)</text>", 1)
    out = pages.select(title.alias("title"), body.alias("text")).filter(
        (F.col("title") != "") & (F.col("text") != "")
    )
    out = out.filter(~F.col("text").startswith("#REDIRECT"))
    cleaned = F.col("text")
    for pat, repl in _WIKI_CLEANUPS:
        cleaned = F.regexp_replace(cleaned, pat, repl)
    return out.select("title", F.trim(cleaned).alias("text"))


def read_span_corpus(spark: SparkSession, path: str) -> DataFrame:
    """S16: span-annotated JSON-lines corpus
    (Dataset/Multimodal/valid.json: ``{"sentence": ..., "audio": ...,
    "entity": [[begin, end, surface, type], ...], "speaker_info"}``)
    -> mention-grain rows matching operators.mentions.MENTION_SCHEMA
    (file_key, begin, end, surface, entity, ent_type, score).

    The per-row invariant holds the sentence alongside each span so
    downstream eval can re-derive surface == sentence[begin:end].
    """
    raw = spark.read.json(path)
    span = F.explode("entity").alias("span")
    return (
        raw.select(
            F.col("audio").alias("file_key"),
            F.col("sentence"),
            span,
        )
        .select(
            "file_key",
            "sentence",
            F.element_at("span", 1).cast("int").alias("begin"),
            F.element_at("span", 2).cast("int").alias("end"),
            F.element_at("span", 3).alias("surface"),
            F.element_at("span", 3).alias("entity"),
            F.element_at("span", 4).alias("ent_type"),
            F.lit(1.0).alias("score"),
        )
    )


def read_w2v_text(spark: SparkSession, path: str) -> DataFrame:
    """S6: word2vec text-format vectors -> (w2v_id, token, vector).

    The format gensim writes with ``save_word2vec_format(binary=False)``
    (the public interchange form of the reference's ``Word60.model``,
    withW2V.py:61-65): a ``"<count> <dim>"`` header line, then one
    ``"<token> <v1> ... <vdim>"`` line per word, line order == gensim's
    ``wv.index_to_key`` order. ``w2v_id`` reproduces that order (it is
    the id `build_new_map` assigns, withW2V.py:133-141).

    The header is dropped structurally (fewer than 3 fields), not by
    position, so the filter is order-independent; the line-order window
    is the same dictionary-size-only global sort as the other readers.

    Line order: within one file, monotonically_increasing_id follows
    split order (partition index tracks byte offset), so ids are
    correct for the canonical single-file case. If `path` is a
    directory/glob of several files the order window sorts by
    (file name, offset) — i.e. files contribute ids in LEXICOGRAPHIC
    file-name order, which is deterministic but only matches the
    intended vector order if the file names sort that way (gensim
    writes a single file; shard readers should name shards
    zero-padded).
    """
    lines = (
        spark.read.text(path)
        .select(F.col("value").alias("line"))
        .withColumn("src_file", F.input_file_name())
        .withColumn("line_id", F.monotonically_increasing_id())
    )
    parts = F.split(F.regexp_replace(F.col("line"), r"^\s+|\s+$", ""), r"\s+")
    w = Window.orderBy("src_file", "line_id")
    return (
        lines.withColumn("_parts", parts)
        .filter(F.size("_parts") >= 3)
        .withColumn("w2v_id", (F.row_number().over(w) - 1).cast("long"))
        .select(
            "w2v_id",
            F.element_at("_parts", 1).alias("token"),
            F.transform(F.slice("_parts", 2, 1_000_000), lambda s: s.cast("float")).alias(
                "vector"
            ),
        )
    )


def read_chise_ids(spark: SparkSession, path: str) -> DataFrame:
    """S4: CHISE IDS rows -> (char, decomposition) with []GTJKVH'
    annotations stripped (my_ner.py:203-210)."""
    parts = F.split(F.col("value"), "\t")
    return (
        spark.read.text(path)
        .filter(~F.col("value").startswith(";"))
        .filter(F.size(parts) >= 3)
        .select(
            F.element_at(parts, 2).alias("char"),
            strip_annotations(F.element_at(parts, 3)).alias("decomposition"),
        )
    )
