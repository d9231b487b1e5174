"""Probabilistic sketches — the sublinear-state operators a 100 TB
pipeline runs where exact state would not fit: HyperLogLog distinct
counting, Count-Min frequency estimation, and Bloom-filter semi-join
pruning.

Design rule (same as dedup.py): every hash is md5 over a canonical
string, decoded with integer hex arithmetic, so the DuckDB oracle
reproduces each register/cell/bit EXACTLY — the gate checks the
sketch contents and estimates bit-for-bit, not "approximately".
All register math is BIGINT (shifts, not pow doubles): HLL's
sum(2^(49-rho)) stays exact because every term and every partial sum
is an integer < 2^57 held in a BIGINT, never a double.

Scale shape:
  - HLL: one explode + groupBy(group, bucket) max — state is
    m=256 registers per group regardless of input size; the exact
    count(DISTINCT) companion column is validation-only and would be
    dropped at 100 TB (that is the whole point of the sketch).
  - CMS: groupBy(depth, cell) — state is d*w = 4*256 cells total;
    probes join a broadcast of the 1024-row sketch.
  - Bloom: the bit-set is a distinct-position table (<= k * |members|
    rows, <= 2^16 rows total), broadcast to the probe side; a probe is
    positive iff all k of its positions are set. False negatives are
    impossible by construction (tested).

The reference has no sketches; these are the corpus-hygiene analog of
its dictionary cardinality bookkeeping (my_ner.py vocab sizing) when
the vocabulary no longer fits on one node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HyperLogLog (p = 8, m = 256 registers, 48-bit rho stream)
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256
# alpha_256 * m^2 * 2^49 — written as the same literal arithmetic in the
# DuckDB oracle so both engines derive the identical double constant.
HLL_NUM_SQL = "(0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 562949953421312.0"


def _hll_rho(hex12: Column) -> Column:
    """rho = 1 + count of leading zero BITS of the 48-bit value whose hex
    form is `hex12` (12 hex chars) — computed with string/integer ops
    only (no float log2, whose off-by-one at exact powers of two would
    corrupt registers silently).
    """
    zeros = F.length(F.regexp_extract(hex12, "^0*", 0))
    first = F.substring(hex12, zeros + F.lit(1), F.lit(1))
    nib_lz = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (
        F.when(zeros == 12, F.lit(49))
        .otherwise(zeros * 4 + nib_lz + 1)
        .cast("int")
    )


def hll_registers(items: DataFrame, group_cols: list[str], item_col: str) -> DataFrame:
    """(group_cols..., bucket, rho): the m=256 HLL registers per group.

    One md5 per row, then groupBy max — register state is 256 rows per
    group no matter how many input rows, the textbook sketch shape.
    """
    h = F.md5(F.col(item_col))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    rho = _hll_rho(F.substring(h, 3, 12))
    return (
        items.select(*group_cols, bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., hll_estimate, registers_used): the HLL-with-
    small-range-correction estimate from exact BIGINT register sums.

    sum(2^(49-rho)) over set registers + 2^49 per empty register is the
    2^49-scaled harmonic denominator; all of it BIGINT-exact, so the
    only doubles are the final constant division and (in the
    small-range branch) one ln of an integer ratio.
    """
    per_group = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n_set"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 49 - rho)")).alias("_sum_set"),
    )
    v = F.lit(HLL_M) - F.col("_n_set")  # empty registers
    raw_sum = F.col("_sum_set") + v * F.lit(1 << 49)
    e_raw = F.expr(HLL_NUM_SQL) / raw_sum
    corrected = F.when(
        (e_raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(e_raw)
    return per_group.select(
        *group_cols,
        F.round(corrected, 0).cast("long").alias("hll_estimate"),
        F.col("_n_set").alias("registers_used"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (d = 4 rows, w = 256 cells)
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 256


def _cms_cell(item: Column, depth: int) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{depth}:"), item)), 1, 2), 16, 10
    ).cast("long")


def cms_sketch(items: DataFrame, item_col: str) -> DataFrame:
    """(depth, cell, cnt): the d x w count matrix. One explode by depth
    then ONE groupBy over a (depth, cell) key space of 1024 — the
    reduce state is constant-size regardless of corpus size."""
    it = F.col(item_col)
    rows = items.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("depth"), _cms_cell(it, d).alias("cell"))
                for d in range(CMS_D)
            ])
        ).alias("dc")
    )
    return rows.groupBy(
        F.col("dc.depth").alias("depth"), F.col("dc.cell").alias("cell")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(probes: DataFrame, sketch: DataFrame, item_col: str) -> DataFrame:
    """(item_col, cms_estimate): min over the d cells each probe hashes
    to. The sketch is 1024 rows — broadcast; probes never shuffle."""
    it = F.col(item_col)
    hashed = probes.select(
        item_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("depth"), _cms_cell(it, d).alias("cell"))
                for d in range(CMS_D)
            ])
        ).alias("dc"),
    ).select(item_col, "dc.depth", "dc.cell")
    return (
        hashed.join(F.broadcast(sketch), ["depth", "cell"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (m = 2^16 bits, k = 3 hashes) as a semi-join pruner
# ---------------------------------------------------------------------------

BLOOM_K = 3
BLOOM_BITS = 16  # positions in [0, 65536)


def _bloom_pos(key: Column, j: int) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, 4), 16, 10
    ).cast("long")


def _positions(df: DataFrame, key_col: str) -> DataFrame:
    key = F.col(key_col).cast("string")
    return df.select(
        df[key_col],
        F.explode(
            F.array(*[_bloom_pos(key, j) for j in range(BLOOM_K)])
        ).alias("pos"),
    )


def bloom_build(members: DataFrame, key_col: str) -> DataFrame:
    """(pos): the set bit positions — at most min(k * |members|, 2^16)
    rows, the broadcast-able representation of the bit array."""
    return _positions(members, key_col).select("pos").distinct()


def bloom_probe(probes: DataFrame, bloom: DataFrame, key_col: str) -> DataFrame:
    """(key_col..., bloom_positive): positive iff all k positions are
    set. The bloom table is broadcast; the probe side never shuffles —
    exactly how a bloom pre-filter cheapens a 100 TB semi-join."""
    hits = (
        _positions(probes.select(key_col).distinct(), key_col)
        .join(F.broadcast(bloom), "pos", "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return probes.join(F.broadcast(hits), key_col, "left").withColumn(
        "bloom_positive", F.coalesce(F.col("_hits"), F.lit(0)) == BLOOM_K
    ).drop("_hits")
