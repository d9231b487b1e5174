"""D1–D9 dictionary builder semantics (SURVEY §2.3) pinned against the
reference's insert-order-dict behavior (my_ner.py:119-183)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_spark.operators import dictionary as D


def _tokens_df(spark):
    # sentences: ["b","a","b"], ["c","a"] -> first occurrence order b,a,c
    rows = [
        (0, 0, "b"),
        (0, 1, "a"),
        (0, 2, "b"),
        (1, 0, "c"),
        (1, 1, "a"),
    ]
    return spark.createDataFrame(rows, "sent_id long, pos long, token string")


def test_build_map_first_occurrence_order(spark):
    vocab = D.build_map(_tokens_df(spark)).orderBy("id").collect()
    assert [(r["token"], r["id"]) for r in vocab] == [("b", 0), ("a", 1), ("c", 2)]


def test_build_map_partitioning_invariant(spark):
    df = _tokens_df(spark)
    a = D.build_map(df).orderBy("id").collect()
    b = D.build_map(df.repartition(7)).orderBy("id").collect()
    assert a == b


def test_with_sentinels_appended_after_vocab(spark):
    vocab = D.build_map(_tokens_df(spark))
    full = D.with_sentinels(vocab).orderBy("id").collect()
    assert [r["token"] for r in full[-3:]] == [D.UNK, D.PAD, D.START]
    assert [r["id"] for r in full] == list(range(6))


def test_apply_map_unk_fallback(spark):
    vocab = D.with_sentinels(D.build_map(_tokens_df(spark)))
    data = spark.createDataFrame([("a",), ("zzz",)], "token string")
    got = {
        r["token"]: r["tid"]
        for r in D.apply_map(data, vocab, "token", "tid").collect()
    }
    assert got["a"] == 1
    assert got["zzz"] == 3  # <UNK> id


def test_union_vocab_preserves_old_ids(spark):
    old = D.build_map(_tokens_df(spark))
    new = spark.createDataFrame([("a",), ("d",), ("e",)], "token string")
    merged = {r["token"]: r["id"] for r in D.union_vocab(old, new).collect()}
    assert merged["b"] == 0 and merged["a"] == 1 and merged["c"] == 2
    assert sorted([merged["d"], merged["e"]]) == [3, 4]


def test_build_radical_map_default_zero(spark):
    # my_ner.py:168-176 — chars without a radical get 0
    vocab = spark.createDataFrame([("中", 0), ("a", 1)], "token string, id long")
    unihan = spark.createDataFrame([("中", 2, 3)], "char string, radical int, stroke int")
    got = {r["char"]: r["radical"] for r in D.build_radical_map(vocab, unihan).collect()}
    assert got == {"中": 2, "a": 0}


def test_build_components_map_rules(spark):
    # my_ner.py:249-281 — 1 IDC + 2 DCs, self x3 for non-decomposable,
    # single DC duplicated
    vocab = spark.createDataFrame(
        [("们", 0), ("一", 1), ("回", 2)], "token string, id long"
    )
    chise = spark.createDataFrame(
        [("们", "⿰亻门"), ("一", "一"), ("回", "⿴口口")],
        "char string, decomposition string",
    )
    got = {r["char"]: r["components"] for r in D.build_components_map(vocab, chise).collect()}
    assert got["们"] == ["⿰", "亻", "门"]
    assert got["一"] == ["一", "一", "一"]  # non-decomposable -> self x3
    assert got["回"] == ["⿴", "口", "口"]


def test_dummy_radical_all_zero(spark):
    vocab = D.build_map(_tokens_df(spark))
    got = D.dummy_radical_map(vocab).agg(F.sum("radical")).first()[0]
    assert got == 0


def test_union_vocab_empty_old_starts_at_zero(spark):
    """Empty old vocab: fresh ids start at 0 (not silent nulls from a
    null max(id) — ADVICE r2)."""
    old = spark.createDataFrame([], "token string, id long")
    new = spark.createDataFrame([("b",), ("a",)], "token string")
    got = {r["token"]: r["id"] for r in D.union_vocab(old, new).collect()}
    assert got == {"a": 0, "b": 1}


def test_apply_map_is_lazy_no_job(spark):
    """apply_map must not trigger a driver collect: building the plan
    registers zero jobs (the UNK id rides as a broadcast crossJoin)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    vocab = spark.createDataFrame([("x", 0), ("<UNK>", 1)], "token string, id long")
    df = spark.createDataFrame([("x",), ("zz",)], "token string")
    out = D.apply_map(df, vocab, "token", "tid")  # plan only
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert before == after
    got = {r["token"]: r["tid"] for r in out.collect()}
    assert got == {"x": 0, "zz": 1}


def test_apply_map_missing_default_leaves_null(spark):
    vocab = spark.createDataFrame([("x", 0)], "token string, id long")
    df = spark.createDataFrame([("zz",)], "token string")
    got = D.apply_map(df, vocab, "token", "tid").collect()[0]
    assert got["tid"] is None
