"""W1: end-to-end Word2Vec TRAINING properties (w2v.ipynb cells 2-4).

The oracle-checked query (`w2v_train_vocab`) proves the trained model
selects the exact minCount vocabulary; these tests pin the vector-side
training properties that SQL cannot express: seed-determinism, finite
non-zero embeddings, and that training actually learned distributional
structure (tokens sharing contexts embed closer than tokens that never
co-occur).
"""

from __future__ import annotations

import math

import pytest
from pyspark.ml.feature import Word2Vec
from pyspark.sql import functions as F


def _fit(df, **kw):
    params = dict(
        vectorSize=16, windowSize=5, minCount=1, maxIter=10, seed=42,
        numPartitions=1, inputCol="toks", outputCol="v",
    )
    params.update(kw)
    return Word2Vec(**params).fit(df)


@pytest.fixture(scope="module")
def sentences(spark):
    # two disjoint context families, many repetitions: {cat, dog}
    # always co-occur with animal words, {car, bus} with road words
    rows = []
    for i in range(60):
        rows.append((2 * i, "cat dog fur paw tail".split()))
        rows.append((2 * i + 1, "car bus road wheel lane".split()))
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_w2v_training_is_seed_deterministic(sentences):
    v1 = {r["word"]: list(r["vector"]) for r in _fit(sentences).getVectors().collect()}
    v2 = {r["word"]: list(r["vector"]) for r in _fit(sentences).getVectors().collect()}
    assert v1 == v2


def test_w2v_vectors_finite_nonzero_right_size(sentences):
    vecs = {r["word"]: list(r["vector"]) for r in _fit(sentences).getVectors().collect()}
    assert set(vecs) == {"cat", "dog", "fur", "paw", "tail",
                         "car", "bus", "road", "wheel", "lane"}
    for w, v in vecs.items():
        assert len(v) == 16
        assert all(math.isfinite(x) for x in v), w
        assert math.sqrt(sum(x * x for x in v)) > 0, w


def test_w2v_learns_context_structure(sentences):
    """Convergence: after training, a within-family pair is closer than
    a cross-family pair (the two families never co-occur)."""
    vecs = {r["word"]: list(r["vector"]) for r in _fit(sentences).getVectors().collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    within = cos(vecs["cat"], vecs["dog"])
    across = cos(vecs["cat"], vecs["bus"])
    assert within > across


def test_w2v_vocab_respects_min_count(spark):
    rows = [(0, ["common"] * 5 + ["rare"]), (1, ["common"] * 5)]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    model = _fit(df, minCount=5, maxIter=1)
    assert {r["word"] for r in model.getVectors().collect()} == {"common"}


def test_w2v_transform_averages_token_vectors(sentences):
    """The model's doc embedding is the mean of its token vectors —
    the contract downstream doc-similarity ops rely on."""
    model = _fit(sentences)
    vecs = {r["word"]: list(r["vector"]) for r in model.getVectors().collect()}
    out = model.transform(
        sentences.limit(1).select("doc_id", "toks")
    ).collect()[0]
    want = [sum(vecs[t][i] for t in out["toks"]) / len(out["toks"]) for i in range(16)]
    assert all(abs(a - b) < 1e-6 for a, b in zip(out["v"], want))
