"""Bucketed co-located join: the storage-level shuffle eliminator.

At 100 TB the dominant cost of a recurring fact-fact join is the shuffle
of both sides on the join key, paid on EVERY run. Writing both tables
bucketed by that key (same bucket count) moves the partitioning into the
storage layout: every subsequent shuffle-grade join reads co-located
buckets and the physical plan contains ZERO shuffle Exchange operators —
the shuffle is paid once at write time, amortized over every downstream
consumer. (Broadcast is disabled in these asserts: at real fact-fact
scale neither side fits a broadcast, which is exactly when bucketing is
the tool.)

These tests prove the claim mechanically from the physical plan, not by
assertion: the bucketed join's plan has no shuffle, the identical
unbucketed join's plan has two, and the results are value-identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 101).alias("a")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 13 % 97).alias("b")
    )
    for name, df in (("t_bleft", left), ("t_bright", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(base / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "t_bleft", "t_bright", left, right
    for name in ("t_bleft", "t_bright"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_shuffles(plan: str) -> int:
    # shuffle exchanges only; BroadcastExchange is not a shuffle
    return plan.count("Exchange hashpartitioning")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables, no_broadcast):
    lname, rname, _, _ = bucketed_tables
    j = spark.table(lname).join(spark.table(rname), "k")
    plan = _plan(j)
    assert _n_shuffles(plan) == 0, plan
    assert "Bucketed: true" in plan, plan
    assert j.count() == 5_000


def test_unbucketed_join_pays_two_shuffles(spark, bucketed_tables, no_broadcast):
    # the SMJ control: same data from plain frames shuffles both sides
    _, _, left, right = bucketed_tables
    plan = _plan(left.join(right, "k"))
    assert _n_shuffles(plan) >= 2, plan


def test_bucketed_join_values_match_unbucketed(spark, bucketed_tables):
    lname, rname, left, right = bucketed_tables
    bucketed = (
        spark.table(lname).join(spark.table(rname), "k").select("k", "a", "b")
    )
    plain = left.join(right, "k").select("k", "a", "b")
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucketed_groupby_skips_shuffle(spark, bucketed_tables):
    # bucketing helps aggregation too: groupBy on the bucket key reads
    # pre-clustered data — no shuffle before the final agg
    lname, _, _, _ = bucketed_tables
    g = spark.table(lname).groupBy("k").agg(F.sum("a").alias("s"))
    plan = _plan(g)
    assert _n_shuffles(plan) == 0, plan
    assert g.count() == 10_000
