"""S1/S3/S4 source readers against fixture files reproducing the
reference's formats and quirks."""

from __future__ import annotations

from ner_spark.sources import catalog, corpus


def test_read_conll_tokens_quirks(spark, tmp_path):
    # Weibo-style positional suffixes, a whitespace-token line, two sentences
    f = tmp_path / "demo.train"
    f.write_text(
        "科0\tO\n技1\tB-ORG\n\n \tO\nx\tB-PER\n",
        encoding="utf-8",
    )
    rows = corpus.read_conll_tokens(spark, str(f)).orderBy("sent_id", "pos").collect()
    got = [(r["sent_id"], r["pos"], r["char"], r["tag"]) for r in rows]
    assert got == [
        (0, 0, "科", "O"),       # suffix stripped (my_ner.py:77)
        (0, 1, "技", "B-ORG"),
        (1, 0, " ", "O"),        # whitespace fallback (my_ner.py:79-85)
        (1, 1, "x", "B-PER"),
    ]


def test_sentences_from_tokens_with_sentinel(spark, tmp_path):
    f = tmp_path / "d.train"
    f.write_text("a\tO\nb\tB-X\n\nc\tO\n", encoding="utf-8")
    toks = corpus.read_conll_tokens(spark, str(f))
    sents = {
        r["sent_id"]: (r["chars"], r["tags"])
        for r in corpus.sentences_from_tokens(toks, add_end_sentinel=True).collect()
    }
    assert sents[0] == (["a", "b", "<END>"], ["O", "B-X", "<END>"])
    assert sents[1] == (["c", "<END>"], ["O", "<END>"])


def test_sentences_order_survives_repartition(spark):
    """Within-sentence order must come from the expression, not the
    physical row order: a forced repartition(7) scrambles rows before
    the aggregation, exactly like a real cluster's shuffle-fetch order
    would (the round-1 orderBy-before-collect_list hazard)."""
    rows = [
        (s, p, f"c{s}_{p}", f"t{s}_{p}") for s in range(10) for p in range(30)
    ]
    toks = spark.createDataFrame(
        rows, "sent_id long, pos long, char string, tag string"
    ).repartition(7)
    got = {
        r["sent_id"]: (r["chars"], r["tags"])
        for r in corpus.sentences_from_tokens(toks).collect()
    }
    for s in range(10):
        assert got[s][0] == [f"c{s}_{p}" for p in range(30)]
        assert got[s][1] == [f"t{s}_{p}" for p in range(30)]


def test_read_unihan_radicals(spark, tmp_path):
    f = tmp_path / "unihan.txt"
    f.write_text(
        "# comment\n"
        "U+4E2D\tkRSUnicode\t2.3\n"
        "U+4E2D\tkTotalStrokes\t4\n"
        "U+4E2E\tkRSUnicode\t4'.1\n",
        encoding="utf-8",
    )
    got = {r["char"]: (r["radical"], r["stroke"]) for r in corpus.read_unihan_radicals(spark, str(f)).collect()}
    assert got["中"] == (2, 3)
    assert got["丮"] == (4, 1)  # apostrophe stripped (my_ner.py:148)


def test_read_chise_ids(spark, tmp_path):
    f = tmp_path / "chise.txt"
    f.write_text(
        "; comment line\n"
        "U+4EEC\t们\t⿰亻门[GT]\n"
        "U+4E00\t一\t一\n",
        encoding="utf-8",
    )
    got = {r["char"]: r["decomposition"] for r in corpus.read_chise_ids(spark, str(f)).collect()}
    assert got["们"] == "⿰亻门"  # annotations stripped (my_ner.py:209)
    assert got["一"] == "一"


def test_write_table_parquet_fallback(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, grp string")
    fmt = catalog.write_table(df, str(tmp_path / "t"), partition_by=["grp"])
    assert fmt == "parquet"
    back = catalog.read_table(spark, str(tmp_path / "t"))
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted({"id": 1, "grp": "a"}.items())),
        tuple(sorted({"id": 2, "grp": "b"}.items())),
    }
