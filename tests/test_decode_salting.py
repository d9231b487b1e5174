"""Viterbi/argmax decode kernels (M2/M7/M9 parity), salting utilities,
Spark ML Word2Vec (W1/S6 parity)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ner_spark.operators import decode, salting


# --------------------------------------------------------------------------
# decode kernels
# --------------------------------------------------------------------------

def test_log_sum_exp_matches_naive():
    x = np.array([[1.0, 2.0, 3.0], [1000.0, 1000.0, 1000.0]])
    got = decode.log_sum_exp(x, axis=-1)
    assert np.isclose(got[0], np.log(np.exp(1) + np.exp(2) + np.exp(3)))
    assert np.isclose(got[1], 1000.0 + np.log(3.0))  # stable at large magnitudes


def test_viterbi_hand_computed():
    """3-token, 2-state worked example (the my_ner.py:733-825 semantics,
    same shape as the reference's single-sentence tutorial case)."""
    # states: 0, 1. Emissions favor 0,0,1; transition 0->1 is expensive.
    em = np.array([[[2.0, 0.0], [2.0, 0.0], [0.0, 3.0]]])
    trans = np.array([[0.0, -2.5], [0.0, 0.0]])
    # paths: 0,0,1 scores 2+2+(−2.5)+3 = 4.5 ; 0,0,0 scores 2+2+0 = 4.0
    assert decode.viterbi(em, trans)[0].tolist() == [0, 0, 1]
    # make the transition prohibitive -> stays in state 0
    trans2 = np.array([[0.0, -10.0], [0.0, 0.0]])
    assert decode.viterbi(em, trans2)[0].tolist() == [0, 0, 0]


def test_viterbi_batched_matches_per_sequence():
    rng = np.random.default_rng(7)
    em = rng.standard_normal((5, 9, 4))
    trans = rng.standard_normal((4, 4))
    batched = decode.viterbi(em, trans)
    for b in range(5):
        single = decode.viterbi(em[b : b + 1], trans)
        assert (batched[b] == single[0]).all()


def test_bio_transitions_validity():
    tags = ["O", "B-LIB", "I-LIB", "B-DB", "I-DB"]
    tr = decode.bio_transitions(tags)
    i = {t: k for k, t in enumerate(tags)}
    assert tr[i["O"], i["I-LIB"]] == decode.NEG  # I- after O forbidden
    assert tr[i["B-LIB"], i["I-LIB"]] == 0.0
    assert tr[i["I-LIB"], i["I-LIB"]] == 0.0
    assert tr[i["B-DB"], i["I-LIB"]] == decode.NEG  # cross-type forbidden
    assert tr[i["B-LIB"], i["B-DB"]] == 0.0


def test_viterbi_tags_dataframe_operator(spark):
    tags = ["O", "B-LIB", "I-LIB"]
    # token 2 weakly prefers I-LIB but follows O -> constraint forces O
    rows = [
        ("f1", [[5.0, 0.0, 0.0], [0.0, 0.0, 1.0], [5.0, 0.0, 0.0]]),
        ("f2", [[0.0, 4.0, 0.0], [0.0, 0.0, 4.0]]),
        ("f3", []),
    ]
    df = spark.createDataFrame(rows, "file_key string, emissions array<array<double>>")
    got = {r["file_key"]: r["tags"] for r in decode.viterbi_tags(df, tags).collect()}
    assert got["f1"] == ["O", "O", "O"]
    assert got["f2"] == ["B-LIB", "I-LIB"]
    assert got["f3"] == []
    # unconstrained decode keeps the orphan I-LIB
    free = {r["file_key"]: r["tags"] for r in decode.viterbi_tags(df, tags, constrained=False).collect()}
    assert free["f1"] == ["O", "I-LIB", "O"]


def test_argmax_decode():
    em = np.array([[[1.0, 2.0], [3.0, 0.0]]])
    assert decode.argmax_decode(em)[0].tolist() == [1, 0]


# --------------------------------------------------------------------------
# salting
# --------------------------------------------------------------------------

def test_salted_count_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot",)] * 500 + [("a",)] * 3 + [("b",)] * 7, "k string"
    )
    got = {r["k"]: r["n"] for r in salting.salted_count(df, ["k"], n_salt=8).collect()}
    assert got == {"hot": 500, "a": 3, "b": 7}


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i, "hot" if i % 2 == 0 else f"k{i % 5}") for i in range(400)],
        "id long, k string",
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k3", "B")], "k string, v string"
    )
    plain = {(r["id"], r["v"]) for r in left.join(right, "k").collect()}
    salted = {(r["id"], r["v"]) for r in salting.salted_join(left, right, ["k"]).collect()}
    assert salted == plain
    assert len(plain) == 200 + 40 + 40  # hot + k1 + k3 matches


def test_top_keys_reports_skew(spark):
    df = spark.createDataFrame([("mega",)] * 50 + [("x",)] * 2, "repo string")
    top = salting.top_keys(df, ["repo"], k=1).collect()
    assert top[0]["repo"] == "mega" and top[0]["n"] == 50


# --------------------------------------------------------------------------
# Word2Vec (W1 — wiki-corpus/w2v.ipynb; S6 model load withW2V.py:61-65)
# --------------------------------------------------------------------------

def test_spark_ml_word2vec_roundtrip(spark, tmp_path):
    from pyspark.ml.feature import Word2Vec

    from ner_spark.functions.text import tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    sents = docs.select(tokens("text").alias("toks"))
    model = Word2Vec(
        vectorSize=16, minCount=1, seed=42, inputCol="toks", outputCol="vec"
    ).fit(sents)
    vecs = model.getVectors()  # (word, vector) — the wv.vectors analog
    assert vecs.count() > 10
    assert len(vecs.first()["vector"]) == 16
    # save/load round-trip (S6: model persistence)
    path = str(tmp_path / "w2v_model")
    model.write().overwrite().save(path)
    from pyspark.ml.feature import Word2VecModel

    loaded = Word2VecModel.load(path)
    assert loaded.getVectors().count() == vecs.count()
