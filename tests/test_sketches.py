"""Property tests for the sketch operators (operators/sketches.py) and
DSIR selection (operators/selection.py): the invariants each sketch
GUARANTEES by construction, checked on real data — one-sided CMS error,
zero Bloom false negatives, HLL within its standard-error envelope,
exact-integer DSIR sums invariant to partitioning.

(Exact cross-engine equality of every register/cell/bit is covered by
tests/test_oracle_parity.py via the driver oracle gate.)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ner_spark.functions import text as X
from ner_spark.operators import selection, sketches


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hll_within_standard_error(spark, docs):
    items = docs.select(
        "lang", F.explode(F.array_distinct(X.shingles("text", 3))).alias("sh")
    )
    est = sketches.hll_estimate(
        sketches.hll_registers(items, ["lang"], "sh"), ["lang"]
    )
    exact = items.groupBy("lang").agg(F.countDistinct("sh").alias("n"))
    rows = est.join(exact, "lang").collect()
    assert rows, "no groups"
    # sigma = 1.04/sqrt(m) ~ 6.5%; allow 4 sigma — a failure here means
    # broken registers, not bad luck.
    for r in rows:
        assert abs(r.hll_estimate - r.n) <= max(4 * 1.04 / math.sqrt(256) * r.n, 8), (
            r.lang,
            r.hll_estimate,
            r.n,
        )
        assert 1 <= r.registers_used <= 256


def test_hll_registers_partitioning_invariant(spark, docs):
    items = docs.select("lang", F.explode(X.shingles("text", 3)).alias("sh"))
    a = sketches.hll_registers(items.repartition(1), ["lang"], "sh")
    b = sketches.hll_registers(items.repartition(7), ["lang"], "sh")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_cms_never_underestimates(spark, docs):
    toks = docs.select(F.explode(X.tokens("text")).alias("token"))
    sk = sketches.cms_sketch(toks, "token")
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    est = sketches.cms_estimate(exact.select("token"), sk, "token")
    bad = exact.join(est, "token").where(F.col("cms_estimate") < F.col("n"))
    assert bad.isEmpty(), bad.limit(5).collect()


def test_cms_sketch_state_is_constant_size(spark, docs):
    toks = docs.select(F.explode(X.tokens("text")).alias("token"))
    assert sketches.cms_sketch(toks, "token").count() <= sketches.CMS_D * sketches.CMS_W


def test_bloom_no_false_negatives(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    members = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    bloom = sketches.bloom_build(members, "c_custkey")
    probed = sketches.bloom_probe(cust.select("c_custkey"), bloom, "c_custkey")
    missed = probed.join(members, "c_custkey", "left_semi").where(
        ~F.col("bloom_positive")
    )
    assert missed.isEmpty(), missed.limit(5).collect()


def test_bloom_detects_nonmembers(spark, sf_dir):
    # a synthetic key far outside the custkey range must probe negative
    # (with 3 random bits of 2^16 set per key and a sparse filter the
    # chance of a false positive on one fixed key is ~(fill)^3 << 1;
    # deterministic here because md5 is fixed).
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    members = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    bloom = sketches.bloom_build(members, "c_custkey")
    probe = spark.range(1).select(F.lit(10**15).alias("c_custkey"))
    row = sketches.bloom_probe(probe, bloom, "c_custkey").collect()[0]
    assert row.bloom_positive is False


def test_dsir_sum_partitioning_invariant_and_integer(spark, docs):
    stream = docs.select("doc_id", "lang", F.explode(X.tokens("text")).alias("tok"))
    a = selection.dsir_logweights(stream.repartition(1), F.col("lang") == "en")
    b = selection.dsir_logweights(stream.repartition(7), F.col("lang") == "en")
    assert a.schema["logweight_e6"].dataType.simpleString() == "bigint"
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_semdedup_earliest_cluster_member_always_kept(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = selection.semdedup(emb, k=8, tau=0.35)
    firsts = out.groupBy("cluster_id").agg(F.min("vec_id").alias("vec_id"))
    bad = out.join(firsts, ["cluster_id", "vec_id"]).where(~F.col("kept"))
    assert bad.isEmpty(), bad.collect()
    # every vector is assigned and decided exactly once
    assert out.count() == emb.count()


def test_semdedup_partitioning_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = selection.semdedup(emb.repartition(1), k=8, tau=0.35)
    b = selection.semdedup(emb.repartition(7), k=8, tau=0.35)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_dsir_english_docs_score_higher(spark, docs):
    """The point of DSIR: target-language docs should, in aggregate,
    carry higher importance weights than non-target docs."""
    stream = docs.select("doc_id", "lang", F.explode(X.tokens("text")).alias("tok"))
    scored = selection.dsir_logweights(stream, F.col("lang") == "en")
    j = docs.select("doc_id", "lang").join(scored, "doc_id")
    means = {
        r.grp: r.m
        for r in j.groupBy((F.col("lang") == "en").alias("grp"))
        .agg(F.avg("logweight_e6").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means
