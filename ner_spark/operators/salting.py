"""Explicit skew handling: salted aggregation and salted joins
(north rule: "Skew from giant repos is handled with salted keys and
AQE skew-join hints").

AQE skew-join splitting (enabled in session.py) handles sort-merge
join skew at runtime; these utilities handle the two cases AQE does
not: (a) a hot *aggregation* key whose single reducer becomes the
stage tail, and (b) an exploded blocking join whose hot key multiplies
before AQE can see it (e.g. a stop-gram in a similarity join).

Pattern (a) — two-phase salted aggregation:
    partial = groupBy(key, salt) agg(partial_aggs)   # spreads hot key
    final   = groupBy(key)       agg(merge_partials)

Pattern (b) — replicated salted equi-join:
    left:  salt = pmod(hash(distributing_col), n)    # deterministic
    right: replicate each row n times, one per salt value
    join on (key, salt) — the hot key's rows land on n reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], n_salt: int, out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salt) from a hash of `cols` —
    content-derived, so results stay partitioning-invariant."""
    return df.withColumn(out, F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salt)))


def salted_count(
    df: DataFrame, key_cols: list[str], n_salt: int = 16, count_col: str = "n"
) -> DataFrame:
    """groupBy(key).count() that survives a key owning half the data.

    Phase 1 reduces (key, salt) partitions — at most 1/n_salt of the
    hot key per reducer; phase 2 merges n_salt tiny partials per key.
    """
    salted = with_salt(df, key_cols, n_salt)
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*key_cols).agg(F.sum("_pc").alias(count_col))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salt: int = 8,
    left_distributing_cols: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join on `on`, salted against hot join keys.

    The left side gets a deterministic salt from
    `left_distributing_cols` (default: all non-join columns, which
    spreads a hot key's rows evenly); the right side is replicated
    n_salt times via a literal-array explode (cheap when right is the
    smaller/dictionary side). Output columns = left ⋈ right as usual,
    salt dropped.
    """
    dist = left_distributing_cols or [c for c in left.columns if c not in on]
    if not dist:
        dist = on
    l_s = with_salt(left, dist, n_salt)
    r_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l_s.join(r_s, [*on, "_salt"]).drop("_salt")


def top_keys(df: DataFrame, key_cols: list[str], k: int = 10) -> DataFrame:
    """Diagnostic: the k heaviest keys with their row counts — the
    skew report an operator chooses its n_salt from."""
    return (
        salted_count(df, key_cols)
        .orderBy(F.col("n").desc(), *key_cols)
        .limit(k)
    )
