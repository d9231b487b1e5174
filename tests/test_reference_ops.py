"""Round-2 reference-parity operators: S5 radindex scan, D7 chained
radical-name map, D8 w2v-backed radical table, P6 transliteration,
P4 t2s, S7 wiki XML articles, S16 span-JSON corpus.

Each test pins the reference quirk the operator must reproduce
(file:line citations in the operator docstrings).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ner_spark.functions import text as X
from ner_spark.operators import dictionary as D
from ner_spark.sources import corpus as S


# --------------------------------------------------------------------------
# S5: radindex reader (withW2V.py:279-287)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def radindex_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("rad") / "radindex_rad.txt"
    # line format: "<radical> <name...>"; the 1-BASED line number is the key
    p.write_text("一 one\n丨 line\n丶 dot\n丿 slash\n", encoding="utf-8")
    return str(p)


def test_radindex_reader_one_based(spark, radindex_file):
    got = {r["rad_index"]: r["radical"] for r in S.read_radical_index(spark, radindex_file).collect()}
    assert got == {1: "一", 2: "丨", 3: "丶", 4: "丿"}  # 1-based, first field


# --------------------------------------------------------------------------
# D7: chained radical-name lookup (withW2V.py:289-294)
# --------------------------------------------------------------------------

def _rad_vocab(spark):
    # a tiny "w2v radical vocabulary": token -> id, with <notZh> appended
    rows = [("一", 0), ("丨", 1), ("丶", 2), ("<notZh>", 3)]
    return spark.createDataFrame(rows, "token string, id long")


def test_radical_name_map_chains_lookups(spark, radindex_file):
    radindex = S.read_radical_index(spark, radindex_file)
    got = {
        r["rad_index"]: r["rad_vocab_id"]
        for r in D.radical_name_map(radindex, _rad_vocab(spark)).collect()
    }
    # index 4 ('丿') is NOT in the vocab -> dropped (reference KeyErrors)
    assert got == {1: 0, 2: 1, 3: 2}


# --------------------------------------------------------------------------
# D8: w2v-backed radical table (withW2V.py:214-276)
# --------------------------------------------------------------------------

def test_build_radical_map_w2v_default_and_dense(spark, radindex_file):
    # char vocab: two CJK chars + one latin + <UNK>, ids 0..3
    vocab = spark.createDataFrame(
        [("中", 0), ("丙", 1), ("x", 2), ("<UNK>", 3)], "token string, id long"
    )
    # Unihan: 中 -> radical index 2 ('丨'), 丙 -> radical index 1 ('一')
    unihan = spark.createDataFrame(
        [("中", 2, 3), ("丙", 1, 4)], "char string, radical int, stroke int"
    )
    radindex = S.read_radical_index(spark, radindex_file)
    got = {
        r["id"]: r["rad_vocab_id"]
        for r in D.build_radical_map_w2v(
            vocab, unihan, radindex, _rad_vocab(spark)
        ).collect()
    }
    # dense over ALL ids; unresolvable chars ('x', <UNK>) -> <notZh> id 3
    assert got == {0: 1, 1: 0, 2: 3, 3: 3}


# --------------------------------------------------------------------------
# P6: transliteration (word_to_radical.py:46-68)
# --------------------------------------------------------------------------

def test_transliterate_string_rewrite(spark, radindex_file):
    unihan = spark.createDataFrame(
        [("中", 2, 3), ("丙", 1, 4)], "char string, radical int, stroke int"
    )
    radindex = S.read_radical_index(spark, radindex_file)
    mapping = D.char_to_radical_mapping(unihan, radindex)
    docs = spark.createDataFrame(
        [(0, "中丙"), (1, "a中b")], "doc_id long, text string"
    ).repartition(5)
    got = {
        r["doc_id"]: r["radical_text"]
        for r in D.transliterate(docs, mapping).collect()
    }
    # 中 -> 丨, 丙 -> 一; unmapped chars pass through (ref would KeyError)
    assert got == {0: "丨一", 1: "a丨b"}


def test_transliterate_partitioning_invariant(spark, radindex_file):
    unihan = spark.createDataFrame(
        [("中", 2, 3), ("丙", 1, 4)], "char string, radical int, stroke int"
    )
    mapping = D.char_to_radical_mapping(
        unihan, S.read_radical_index(spark, radindex_file)
    )
    docs = spark.createDataFrame(
        [(i, "中丙" * 10) for i in range(20)], "doc_id long, text string"
    )
    a = sorted(map(tuple, D.transliterate(docs, mapping).collect()))
    b = sorted(map(tuple, D.transliterate(docs.repartition(7), mapping).collect()))
    assert a == b
    assert a[0][2] == "丨一" * 10


# --------------------------------------------------------------------------
# P4: t2s (chinese_t2s.py:41-50)
# --------------------------------------------------------------------------

def test_t2s_converts_common_chars(spark):
    df = spark.createDataFrame([("萬國車馬x",), ("學習簡體",)], "s string")
    got = [r["t"] for r in df.select(X.t2s("s").alias("t")).collect()]
    assert got[0] == "万国车马x"
    assert got[1].startswith("学")  # 學 -> 学
    assert "简" in got[1]           # 簡 -> 简


def test_t2s_phrase_layer_and_protection(spark):
    """OpenCC TSPhrases semantics: protective phrases shield trad chars
    the char table would convert; compositional phrases convert chars
    the table doesn't carry; everything else goes through the table."""
    cases = {
        "乾燥的乾隆年間": "干燥的乾隆年间",   # 乾->干 EXCEPT inside 乾隆
        "狼藉的藉口": "狼藉的借口",           # 藉->借 EXCEPT inside 狼藉
        "瞭望塔使人瞭解": "瞭望塔使人了解",   # 瞭->了 EXCEPT inside 瞭望
        "盪鞦韆": "荡秋千",                   # all three chars table-mapped (r4)
        "頭髮與發展": "头发与发展",           # 髮/發 both -> 发
    }
    df = spark.createDataFrame([(k,) for k in cases], "s string")
    got = {r["s"]: r["t"] for r in df.select("s", X.t2s("s").alias("t")).collect()}
    assert got == cases


def test_t2s_extension_table(spark):
    """Round-4 extension coverage: glyph-variant forms, radical-family
    series and high-frequency singles outside the original 805-pair
    table, plus the new phrase entries (甚麼 compositional, 慰藉
    protective)."""
    cases = {
        "戰爭中的兩隻鳥": "战争中的两只鸟",
        "陰陽沒有分別": "阴阳没有分别",
        "臺灣的靜夜": "台湾的静夜",
        "你說甚麼": "你说什么",          # phrase: 甚麼 -> 什么 (not 甚么)
        "心靈的慰藉": "心灵的慰藉",      # protective: 藉 survives in 慰藉
        "鍛鍊身體": "锻鍊身体",          # 鍛 mapped; 鍊 (ambiguous) kept
        "彷彿在彷徨": "仿佛在彷徨",      # phrase: 彷->仿 only inside 彷彿
        "佔領盃賽": "占领杯赛",          # batch-2 singles
    }
    df = spark.createDataFrame([(k,) for k in cases], "s string")
    got = {r["s"]: r["t"] for r in df.select("s", X.t2s("s").alias("t")).collect()}
    assert got == cases


def test_t2s_round5_table_and_phrases(spark):
    """Round-5 extension: chars OUTSIDE the former 1430-pair table
    (radical-family completions and variant forms), the contextual
    著->着 word layer (著 itself stays by default, like OpenCC), the
    瀋陽 compositional phrase, and the 徵-as-zhǐ protection."""
    cases = {
        "持續發展": "持续发展",            # 續 was missing pre-r5
        "關係範圍": "关系范围",            # 係 / 範 new
        "準確的韻律": "准确的韵律",        # 準 / 韻 new
        "鬍鬚與頭髮": "胡须与头发",        # 鬚 new
        "鋼鐵鑄錠鍍鉻": "钢铁铸锭镀铬",    # 金-series (錠/鍍/鉻 pre-r5, sanity)
        "詡詮誥謾": "诩诠诰谩",            # 言-series new
        "顯著的執著": "显著的执著",        # 著 defaults to 著
        "他著急地穿著衣著": "他着急地穿着衣着",  # word contexts -> 着
        "瀋陽的瀋水": "沈阳的瀋水",        # phrase converts, bare 瀋 stays
        "宮商角徵羽與徵兵": "宫商角徵羽与征兵",  # zhǐ protected, zhēng converts
        "蘊藉與藉口": "蕴藉与借口",        # protective 蘊藉
    }
    df = spark.createDataFrame([(k,) for k in cases], "s string")
    got = {r["s"]: r["t"] for r in df.select("s", X.t2s("s").alias("t")).collect()}
    assert got == cases


def test_t2s_sql_matches_spark(spark):
    """The generated DuckDB expression is the bit-exact twin of the
    Spark conversion over a table-spanning sample."""
    import duckdb

    sample = [
        "乾坤狼藉瞭望鞦韆",
        "".join(p[0] for p in X._T2S_PAIRS[::7]),
        "plain ascii stays",
    ]
    df = spark.createDataFrame([(s,) for s in sample], "s string")
    got_spark = [r["t"] for r in df.select(X.t2s("s").alias("t")).orderBy("s").collect()]
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {X.t2s_sql('s')} AS t FROM (SELECT unnest(?) AS s) ORDER BY s",
            [sample],
        ).fetchall()
    ]
    assert got_spark == got_duck


# --------------------------------------------------------------------------
# S7: wiki XML article source (wiki_process.py:35-45)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wiki_xml(tmp_path_factory):
    p = tmp_path_factory.mktemp("wiki") / "dump.xml"
    p.write_text(
        """<mediawiki>
  <page>
    <title>Apache Spark</title>
    <revision><text xml:space="preserve">'''Apache Spark''' is an engine.
{{Infobox software|name=Spark}}
See [[MapReduce|map reduce]] and [[Hadoop]].<ref>cite</ref></text></revision>
  </page>
  <page>
    <title>Redirect page</title>
    <revision><text>#REDIRECT [[Apache Spark]]</text></revision>
  </page>
  <page>
    <title>Empty</title>
    <revision><text></text></revision>
  </page>
</mediawiki>
""",
        encoding="utf-8",
    )
    return str(p)


def test_wiki_corpus_stats_shape(spark, wiki_xml):
    """E12-style corpus stats over the ingested wiki shape — the first
    stage of the reference's ETL chain (§3.4) feeding the stats op."""
    arts = S.read_wiki_articles(spark, wiki_xml)
    row = arts.agg(
        F.count(F.lit(1)).alias("n_articles"),
        F.sum(F.length("text")).alias("n_chars"),
        F.countDistinct("title").alias("n_titles"),
    ).collect()[0]
    assert row["n_articles"] == 1 and row["n_titles"] == 1
    assert row["n_chars"] > 20


def test_wiki_articles_parse_and_clean(spark, wiki_xml):
    rows = S.read_wiki_articles(spark, wiki_xml).collect()
    by_title = {r["title"]: r["text"] for r in rows}
    assert list(by_title) == ["Apache Spark"]  # redirect + empty dropped
    text = by_title["Apache Spark"]
    assert "map reduce" in text and "Hadoop" in text  # link targets kept
    assert "Infobox" not in text and "<ref>" not in text and "[[" not in text


# --------------------------------------------------------------------------
# S16: span-annotated JSON corpus (Dataset/Multimodal/valid.json shape)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def span_json(tmp_path_factory):
    p = tmp_path_factory.mktemp("spans") / "valid.json"
    rows = [
        {"sentence": "分别下降五点一", "audio": "A0", "entity": [], "speaker_info": "F"},
        {
            "sentence": "其在出行成都打车",
            "audio": "A1",
            "entity": [[4, 6, "成都", "LOC"]],
            "speaker_info": "M",
        },
        {
            "sentence": "央视和中超合作",
            "audio": "A2",
            "entity": [[0, 2, "央视", "ORG"], [3, 5, "中超", "ORG"]],
            "speaker_info": "F",
        },
    ]
    p.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in rows), encoding="utf-8")
    return str(p)


def test_span_corpus_reader(spark, span_json):
    rows = S.read_span_corpus(spark, span_json).collect()
    assert len(rows) == 3  # empty-entity sentence contributes no spans
    by_key = {}
    for r in rows:
        by_key.setdefault(r["file_key"], []).append(r)
    assert set(by_key) == {"A1", "A2"}
    a1 = by_key["A1"][0]
    assert (a1["begin"], a1["end"], a1["surface"], a1["ent_type"]) == (4, 6, "成都", "LOC")
    # span invariant: surface == sentence[begin:end]
    for r in rows:
        assert r["sentence"][r["begin"]:r["end"]] == r["surface"]


# --------------------------------------------------------------------------
# S6: word2vec text-format reader + D3 build_new_map (withW2V.py:61-65,
# 110-141)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def w2v_text_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("w2v") / "vectors.txt"
    # gensim save_word2vec_format(binary=False): "count dim" header,
    # then "<token> <v1> ... <vdim>" in index_to_key order
    p.write_text(
        "4 3\n"
        "的 0.1 0.2 0.3\n"
        "一 0.4 0.5 0.6\n"
        "是 -0.7 0.8 0.9\n"
        "了 1.0 -1.1 1.2\n",
        encoding="utf-8",
    )
    return str(p)


def test_read_w2v_text_order_and_vectors(spark, w2v_text_file):
    rows = S.read_w2v_text(spark, w2v_text_file).orderBy("w2v_id").collect()
    assert [r["token"] for r in rows] == ["的", "一", "是", "了"]  # file order
    assert [r["w2v_id"] for r in rows] == [0, 1, 2, 3]           # 0-based ids
    assert rows[2]["vector"] == pytest.approx([-0.7, 0.8, 0.9])
    assert all(len(r["vector"]) == 3 for r in rows)               # header dropped


def test_build_new_map_w2v_order_then_corpus_then_sentinels(spark, w2v_text_file):
    w2v = (
        S.read_w2v_text(spark, w2v_text_file)
        .select("token", F.col("w2v_id").alias("id"))
    )
    corpus = spark.createDataFrame(
        [("是",), ("新",), ("字",)], "token string"
    )
    got = {r["token"]: r["id"] for r in D.build_new_map(w2v, corpus).collect()}
    # pretrained tokens keep their w2v ids (是 NOT re-assigned)
    assert {got[t] for t in ("的", "一", "是", "了")} == {0, 1, 2, 3}
    assert got["是"] == 2
    # fresh corpus tokens appended next, sorted: 字 < 新 in codepoint order
    assert {got["字"], got["新"]} == {4, 5}
    assert got["字"] < got["新"]
    # sentinels come last, in list order (withW2V.py:114-117)
    assert got["<UNK>"] == 6 and got["<PAD>"] == 7


def test_read_w2v_text_multi_file_lexicographic(spark, tmp_path):
    """A directory of shard files yields ids in lexicographic file-name
    order (zero-padded shards), each header dropped structurally."""
    d = tmp_path / "w2v_shards"
    d.mkdir()
    (d / "part-00.txt").write_text("2 2\naa 1.0 2.0\nbb 3.0 4.0\n")
    (d / "part-01.txt").write_text("1 2\ncc 5.0 6.0\n")
    rows = S.read_w2v_text(spark, str(d)).orderBy("w2v_id").collect()
    assert [(r["w2v_id"], r["token"]) for r in rows] == [
        (0, "aa"), (1, "bb"), (2, "cc")
    ]
