"""Unit tests for ner_spark.functions.text — reference per-line
transform parity (SURVEY §2.2), pinned on tiny hand-computed frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.functions import text as X


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "v string").select(col("v").alias("out")).first()["out"]


def test_char_extract_strips_positional_suffix(spark):
    # my_ner.py:77 — `word[0]` turns Weibo's 科0 into 科
    assert _one(spark, X.char_extract, "科0") == "科"
    assert _one(spark, X.char_extract, "a") == "a"


def test_cjk_only_filter(spark):
    # clean_corpus.py:39-48 — keep only 一..龥
    assert _one(spark, X.cjk_only, "abc中文123龥!") == "中文龥"
    assert _one(spark, X.cjk_only, "latin only") == ""


def test_unicode_decode(spark):
    # my_ner.py:142 — U+hex -> char
    assert _one(spark, X.unicode_decode, "U+4E2D") == "中"


def test_is_idc_range(spark):
    # my_ner.py:302-312 — U+2FF0..U+2FFB
    df = spark.createDataFrame([("⿰",), ("⿻",), ("中",)], "v string")
    got = [r["p"] for r in df.select(X.is_idc("v").alias("p")).collect()]
    assert got == [True, True, False]


def test_strip_annotations(spark):
    # my_ner.py:209 — strip []GTJKVH'
    assert _one(spark, X.strip_annotations, "[G]⿰亻壬'") == "⿰亻壬"


def test_tokens_identifier_grain(spark):
    got = _one(spark, X.tokens, "import numpy as np # 42")
    assert got == ["import", "numpy", "as", "np"]


def test_token_counts(spark):
    row = (
        spark.createDataFrame([("hello world, 42!",)], "v string")
        .select(
            X.ws_token_count("v").alias("ws"),
            X.bpe_ish_token_count("v").alias("bpe"),
        )
        .first()
    )
    assert row["ws"] == 3
    # hello, world, ',', '4', '2', '!'
    assert row["bpe"] == 6


def test_lang_id_rules(spark):
    rows = [
        ("the cat is on the mat and that is fine",),  # en
        ("der hund ist nicht mit der katze",),  # de
        ("这是一个中文句子这是一个中文句子",),  # zh
        ("zzz qqq 12345",),  # unk
    ]
    df = spark.createDataFrame(rows, "v string")
    got = [r["l"] for r in df.select(X.lang_id("v").alias("l")).collect()]
    assert got == ["en", "de", "zh", "unk"]


def test_normalized_text_and_md5_fingerprint(spark):
    a = _one(spark, X.fingerprint_md5, "  Hello   WORLD ")
    b = _one(spark, X.fingerprint_md5, "hello world")
    assert a == b


def test_shingles_and_winnow(spark):
    got = _one(spark, lambda c: X.shingles(c, 3), "a b c d")
    assert got == ["a b c", "b c d"]
    # short doc: single shingle = whole text
    got1 = _one(spark, lambda c: X.shingles(c, 5), "a b")
    assert got1 == ["a b"]
    fp = _one(spark, lambda c: X.winnow_fingerprint(c, 3), "a b c d")
    import hashlib

    expected = min(hashlib.md5(b"a b c").hexdigest(), hashlib.md5(b"b c d").hexdigest())
    assert fp == expected


def test_content_sha256_row_invariant(spark):
    import hashlib

    val = "def f(x):\n    return x\n"
    got = _one(spark, X.content_sha256, val)
    assert got == hashlib.sha256(val.encode()).hexdigest()


def test_quality_features_short_doc_zero_score(spark):
    df = spark.createDataFrame([("short",)], "v string")
    feats = X.quality_features("v")
    row = df.select(*[c.alias(n) for n, c in feats.items()]).first()
    assert row["quality_score"] == 0.0
